package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * bounded-memory "approximate top-k frequent items" every corpus-stats
  * pass wants at 100 TB, where an exact token groupBy would shuffle the
  * full vocabulary. State is at most `capacity` counters regardless of
  * input size.
  *
  * Guarantees (Misra & Gries 1982; merge per the mergeable-summaries
  * construction of Agarwal et al., PODS'12):
  *   - any item with true frequency > n / (capacity + 1) is present in
  *     the summary, under ANY partitioning of the input;
  *   - each reported count is an UNDER-estimate by at most
  *     n / (capacity + 1).
  *
  * Determinism note: which sub-threshold items survive depends on
  * stream order, so the sketch is only registered under the driver
  * oracle in its exact regime — `capacity` ≥ distinct items means no
  * counter is ever evicted and the summary IS the exact count map
  * (LlmQueries `text_top_terms`). The approximate regime is pinned by
  * the guarantee spec instead (SearchSpec).
  *
  * The merge adds counters pointwise and then, if over capacity,
  * subtracts the (capacity+1)-th largest combined count from everything
  * (dropping ≤0) — the same "decrement by the evicted weight" step the
  * streaming update applies, which is what makes the bound hold across
  * partitions.
  */
final case class MisraGries(capacity: Int)
  extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
    b.get(t) match {
      case Some(c) => b.updated(t, c + 1)
      case None if b.size < capacity => b.updated(t, 1L)
      case None => // full: decrement every counter, drop zeros
        b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  override def merge(x: Map[String, Long],
                     y: Map[String, Long]): Map[String, Long] = {
    val combined = y.foldLeft(x) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (combined.size <= capacity) combined
    else {
      // (capacity+1)-th largest count = the weight to spill
      val d = combined.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)
        .apply(capacity)
      combined.flatMap { case (k, c) =>
        if (c > d) Some(k -> (c - d)) else None
      }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
