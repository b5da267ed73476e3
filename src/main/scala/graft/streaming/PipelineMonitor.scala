package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Monitoring for streaming pipelines (O23): the reference's consumer
  * surfaces throughput by logging per-message processing
  * (transaction_consumer.py's processed-count prints); the Spark-native
  * re-expression is a [[StreamingQueryListener]] that turns every
  * micro-batch's `StreamingQueryProgress` into a queryable row —
  * input rows, rates, batch duration, stateful-operator row counts —
  * instead of log lines.
  *
  * The buffer is BOUNDED (ring of `maxBatches`): a listener on a
  * long-lived production stream must never grow with stream lifetime.
  * Progress rows are tiny (one per micro-batch, not per record), so
  * monitoring cost is independent of data scale; the driver-side
  * buffer is the correct home because progress events are already
  * driver-side in Spark's listener bus.
  *
  * Usage: `spark.streams.addListener(monitor)` before starting the
  * query, then [[toDF]] / [[totalInputRows]] at any point — including
  * from a separate observability query writing [[toDF]] out per
  * interval.
  */
object PipelineMonitor {
  /** Top-level (not inner) so Spark can derive an Encoder for [[PipelineMonitor.toDF]]. */
  case class BatchProgress(queryId: String, runId: String, batchId: Long,
                           timestamp: String, numInputRows: Long,
                           inputRowsPerSecond: Double,
                           processedRowsPerSecond: Double,
                           batchDurationMs: Long, stateRows: Long,
                           observed: Map[String, String])
}

class PipelineMonitor(maxBatches: Int = 1024) extends StreamingQueryListener {
  import PipelineMonitor.BatchProgress

  private val buf =
    new java.util.concurrent.ConcurrentLinkedDeque[BatchProgress]()
  private val started = new java.util.concurrent.atomic.AtomicInteger
  private val terminated = new java.util.concurrent.atomic.AtomicInteger

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit =
    started.incrementAndGet()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val stateRows =
      if (p.stateOperators == null) 0L
      else p.stateOperators.map(_.numRowsTotal).sum
    def finite(d: Double) = if (d.isNaN || d.isInfinite) 0.0 else d
    // Dataset.observe metrics ride on the same progress event — the
    // engine's hook for caller-defined per-batch data quality counters
    // (e.g. malformed-row counts) with no extra pass over the data
    val observed: Map[String, String] = {
      import scala.jdk.CollectionConverters._
      p.observedMetrics.asScala.toSeq.flatMap { case (name, row) =>
        row.schema.fieldNames.toSeq.map(f =>
          s"$name.$f" -> String.valueOf(row.getAs[Any](f)))
      }.toMap
    }
    buf.addLast(BatchProgress(
      p.id.toString, p.runId.toString, p.batchId, p.timestamp,
      p.numInputRows, finite(p.inputRowsPerSecond),
      finite(p.processedRowsPerSecond), p.batchDuration, stateRows, observed))
    while (buf.size > maxBatches) buf.pollFirst() // ring: drop oldest
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    terminated.incrementAndGet()

  def batches: Seq[BatchProgress] = {
    import scala.jdk.CollectionConverters._
    buf.iterator.asScala.toSeq
  }

  def totalInputRows: Long = batches.map(_.numInputRows).sum
  def startedCount: Int = started.get()
  def terminatedCount: Int = terminated.get()

  /** The captured progress as a DataFrame — the monitoring "table" a
    * dashboard or alerting query reads (and can write out as parquet,
    * closing the loop with the engine's own file sinks).
    */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    batches.toDF()
  }
}
