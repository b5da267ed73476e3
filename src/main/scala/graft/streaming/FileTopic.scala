package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A file-backed topic log with Kafka's exact record contract.
  *
  * The reference's transport IS Kafka (transaction_producer.py:41-54 →
  * transaction_consumer.py:72-103), but this sandbox has no broker and no
  * Kafka jars, so [[CdcPipeline.kafkaSource]] can only ever be plan-only
  * here. This transport closes the testability gap without faking
  * anything: records are appended as parquet segments carrying the SAME
  * columns Spark's Kafka source produces —
  * `key binary, value binary, topic string, partition int, offset long,
  * timestamp, timestampType` — with Kafka's semantics:
  *
  *  - keyed partitioning: `partition = pmod(hash(key), nPartitions)`,
  *    so all records of one key land in one partition in produce order
  *    (the property the reference's keyed produce relies on for per-key
  *    ordering, transaction_producer.py:44);
  *  - per-partition monotone offsets, persisted in a `_graft_next_offsets`
  *    sidecar and continued across produce calls (single-writer per
  *    topic, like a partition leader);
  *  - at-least-once delivery: a replayed produce appends duplicates
  *    rather than losing data — downstream must dedup, exactly as with
  *    a real broker.
  *
  * A consumer built on [[source]] is byte-for-byte the consumer you would
  * run on [[CdcPipeline.kafkaSource]]: same schema, same
  * `CAST(value AS STRING)` → envelope parse → materialize pipeline.
  * Swapping transports changes one `readStream` call. Pacing maps to the
  * file source's `maxFilesPerTrigger` (one segment-file ≈ one offset
  * range) standing in for `maxOffsetsPerTrigger` (O10), and checkpoint
  * resume (O9) works identically because the file source commits consumed
  * files to the same WAL/commit-log machinery the Kafka source uses for
  * offsets.
  */
object FileTopic {

  /** Spark's Kafka source schema (kafka-0-10-sql KafkaRecordToRowConverter). */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private def offsetsPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_graft_next_offsets")

  /** Append a batch of (key, value) records — e.g. the output of
    * [[CdcPipeline.toKafkaRecords]] — to the topic log as one segment per
    * partition. Offsets continue from the previous produce; within a
    * produce, records are ordered by (key, value) — deterministic, and
    * order per key is what Kafka guarantees, not order across keys.
    *
    * The sidecar read/update is driver-side but bounded at nPartitions
    * lines; the data path is one narrow shuffle on `partition` (the same
    * exchange a Kafka producer's partitioner implies) and one file per
    * partition per produce — segment granularity, not row granularity.
    */
  def produce(records: DataFrame, dir: String, topic: String,
              nPartitions: Int = 4): Unit = {
    val spark = records.sparkSession
    val fs = offsetsPath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base: Map[Int, Long] =
      if (!fs.exists(offsetsPath(dir))) Map.empty
      else {
        val in = fs.open(offsetsPath(dir))
        try new String(in.readAllBytes,
          java.nio.charset.StandardCharsets.UTF_8)
          .linesIterator.filter(_.nonEmpty).map { l =>
            val Array(p, o) = l.split("=", 2); p.toInt -> o.toLong
          }.toMap
        finally in.close()
      }
    val baseCol = base.foldLeft(lit(0L)) { case (acc, (p, o)) =>
      when(col("partition") === p, lit(o)).otherwise(acc)
    }
    val framed = records
      .select(col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"))
      .withColumn("topic", lit(topic))
      .withColumn("partition",
        pmod(hash(col("key")), lit(nPartitions)).cast("int"))
      .withColumn("offset",
        baseCol + row_number().over(
          Window.partitionBy("partition").orderBy("key", "value")) - 1)
      .withColumn("timestamp", current_timestamp())
      .withColumn("timestampType", lit(0)) // CreateTime
    // directory-partitioned by `partition` (like a broker's per-partition
    // segment dirs): exactly one segment FILE per partition per produce
    // regardless of shuffle-task collisions, and consumers of a single
    // partition prune at the directory level
    framed.repartition(col("partition"))
      .write.mode("append").partitionBy("partition").parquet(dir)
    // advance the sidecar: next offset per partition (≤ nPartitions rows)
    val next = framed.groupBy("partition").agg(max("offset").as("m"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1) + 1)).toMap
    val merged = base ++ next
    val out = fs.create(offsetsPath(dir), true)
    try out.write(merged.toSeq.sorted.map { case (p, o) => s"$p=$o" }
      .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Streaming consumer over the topic log. Drop-in for
    * [[CdcPipeline.kafkaSource]]: same columns, same downstream code.
    * `maxFilesPerTrigger` is the O10 pacing knob (segment-granular, as
    * `maxOffsetsPerTrigger` is offset-granular); the checkpoint the
    * caller sets on the query makes consumption resumable (O9).
    */
  def source(spark: SparkSession, dir: String,
             maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(recordSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }
}
