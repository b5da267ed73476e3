package graft.sources

import org.apache.spark.sql.{DataFrame, GraftStreamingFrames, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("graft")` — the generational change feed
  * as a NATIVE Structured Streaming source (r16 verdict #5): the
  * reference's consumer loop
  * (transaction_consumer.py:72-103 — poll, decode, apply, commit
  * offset) becomes one `readStream → transform → writeStream` with the
  * engine's own offset/checkpoint machinery doing the cursor work.
  *
  * The mapping is exact:
  *  - an OFFSET IS A GENERATION NUMBER — `getOffset` returns the
  *    current published generation; nothing new published means no new
  *    batch (the poll-returns-None edge of [[Compaction.changeFeedNext]]);
  *  - batch (None, g] = the INITIAL SNAPSHOT of generation g (every
  *    row `op='c'`, Debezium convention) — [[Compaction.feedSnapshot]];
  *  - batch (a, b] = the Debezium-shaped diff between the two retained
  *    snapshots — [[Compaction.generationDiff]];
  *  - the CHECKPOINT IS THE DURABLE CURSOR: offsets commit to the
  *    stream's WAL, so restart resumes from the last committed
  *    generation, and a crash between process and commit re-delivers
  *    the SAME window (at-least-once with idempotent redelivery — the
  *    r16 feed-cursor contract, inherited from the engine instead of
  *    re-implemented);
  *  - a resume whose generation left the retention window fails LOUDLY
  *    through [[Compaction.readTableAt]]'s message (re-snapshot or
  *    lease the cursor generation), never a silent wrong diff.
  *
  * This is deliberately a V1 `Source`, not a `MicroBatchStream`: each
  * batch is a COMPUTED plan (a key-partitioned full-outer diff join of
  * two parquet snapshots), and V1's `getBatch` is the API that accepts
  * a driver-composed DataFrame — the same choice Delta's streaming
  * source makes publicly. A MicroBatchStream's InputPartitions would
  * have to re-implement that join inside partition readers. The plan
  * stays fully distributed; only offset arithmetic happens here.
  *
  * Scale: one generationDiff per published generation window — the
  * consumer pays O(changed snapshots), never O(history); with
  * maxOffsetsPerTrigger-style pacing unnecessary (a batch is bounded
  * by two snapshots regardless of how many generations landed, since
  * offsets coalesce to the latest).
  */
final class GraftChangeFeedSource(sqlContext: SQLContext, path: String,
                                  keyCols: Seq[String]) extends Source {

  private val spark = sqlContext.sparkSession
  require(Compaction.generations(spark, path).nonEmpty,
    s"readStream.format(\"graft\"): $path is not a generational graft " +
      "table — publish a generation (writeGen / INSERT INTO) first")

  override val schema: StructType = Compaction.feedSchema(spark, path, keyCols)

  private def genOf(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => sys.error(s"graft feed: unexpected offset $other")
  }

  override def getOffset: Option[OffsetV1] =
    Compaction.generations(spark, path).maxOption.map(LongOffset(_))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endGen = genOf(end)
    val startGen = start.map(genOf)
    // Retention check DEFERRED to execution, not construction: at
    // every restart MicroBatchExecution re-requests the last COMMITTED
    // batch to restore V1-source state and DISCARDS the frame — that
    // replay may legitimately name generations that aged out of
    // retention, and an eager require here bricked every such restart
    // (observed). A real redelivery of an UNCOMMITTED batch executes
    // its frame and fails loudly with the same message readTableAt
    // would have raised.
    val retained = Compaction.generations(spark, path).toSet
    val gone = (startGen.toList :+ endGen).filterNot(retained)
    if (gone.nonEmpty)
      GraftStreamingFrames.deferredError(spark, schema,
        s"generation(s) ${gone.mkString(",")} of $path are not " +
          s"readable — never published or outside the retention window " +
          s"(readable: ${retained.toSeq.sorted.mkString(",")}); the " +
          "stream's checkpointed cursor lagged past retention — " +
          "re-snapshot (fresh checkpoint) or lease the cursor " +
          "generation to widen retention")
    else {
      val frame = startGen match {
        case None => Compaction.feedSnapshot(spark, path, endGen, keyCols)
        case Some(s) => Compaction.generationDiff(spark, path, s, endGen, keyCols)
      }
      GraftStreamingFrames.asStreaming(frame, schema)
    }
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftChangeFeed[$path keyed ${keyCols.mkString(",")}]"
}
