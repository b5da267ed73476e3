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
    * partition. Offsets continue from the previous produce. Within a
    * produce, `ordering` (e.g. a sequence/LSN column from the caller's
    * DataFrame) decides per-partition offset order — the Kafka contract is
    * produce order per key, and only the caller knows it; without an
    * `ordering`, byte order on (key, value) is the documented
    * deterministic fallback (order per key across DISTINCT values is then
    * arbitrary-but-stable, fine for redelivery, wrong for intra-batch
    * key updates — pass `ordering` for those).
    *
    * Crash safety: base offsets are RESERVED in the sidecar before the
    * data is appended, so a produce that dies mid-write leaves an offset
    * gap, never a duplicate (partition, offset) pair — the same contract
    * a Kafka log keeps (gaps exist there too, e.g. aborted transactions;
    * consumers track positions, they never assume density). If the
    * sidecar itself is lost, the next produce rebuilds it from
    * max(offset) actually present in the log — the sidecar is a cache,
    * the log is the truth — paying one offset-column scan only in that
    * repair case, never per produce.
    *
    * The sidecar read/update is driver-side but bounded at nPartitions
    * lines; the data path is one narrow shuffle on `partition` (the same
    * exchange a Kafka producer's partitioner implies) and one file per
    * partition per produce — segment granularity, not row granularity.
    */
  def produce(records: DataFrame, dir: String, topic: String,
              nPartitions: Int = 4,
              ordering: Seq[org.apache.spark.sql.Column] = Nil): Unit = {
    val spark = records.sparkSession
    val fs = offsetsPath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // keep the caller's columns until the offset window has run, so
    // `ordering` can reference any of them; cache so the reserve-count,
    // the write and nothing else ever re-evaluate a non-deterministic
    // source differently
    val prepared = records
      .withColumn("__graft_key", col("key").cast("binary"))
      .withColumn("__graft_part",
        pmod(hash(col("__graft_key")), lit(nPartitions)).cast("int"))
      .persist()
    try {
      val counts: Map[Int, Long] = prepared.groupBy("__graft_part").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val base = readBaseOffsets(spark, fs, dir)
      // reserve BEFORE the append: crash between here and the data write
      // costs an offset gap, never a reused offset
      val reserved = base ++ counts.map { case (p, c) =>
        p -> (base.getOrElse(p, 0L) + c)
      }
      writeSidecar(fs, dir, reserved)
      val baseCol = base.foldLeft(lit(0L)) { case (acc, (p, o)) =>
        when(col("__graft_part") === p, lit(o)).otherwise(acc)
      }
      val ord =
        if (ordering.nonEmpty) ordering
        else Seq(col("__graft_key"), col("value").cast("binary"))
      val framed = prepared
        .withColumn("__graft_off",
          baseCol + row_number().over(
            Window.partitionBy("__graft_part").orderBy(ord: _*)) - 1)
        .select(col("__graft_key").as("key"),
          col("value").cast("binary").as("value"),
          lit(topic).as("topic"),
          col("__graft_part").as("partition"),
          col("__graft_off").as("offset"),
          current_timestamp().as("timestamp"),
          lit(0).as("timestampType")) // CreateTime
      // directory-partitioned by `partition` (like a broker's per-partition
      // segment dirs): exactly one segment FILE per partition per produce
      // regardless of shuffle-task collisions, and consumers of a single
      // partition prune at the directory level
      framed.repartition(col("partition"))
        .write.mode("append").partitionBy("partition").parquet(dir)
    } finally prepared.unpersist()
  }

  /** Next offset per partition: the sidecar when present (cache), else —
    * sidecar lost/deleted — rebuilt from max(offset) in the log itself
    * (truth). An empty/absent log means a fresh topic: all zeros.
    */
  private def readBaseOffsets(spark: SparkSession,
                              fs: org.apache.hadoop.fs.FileSystem,
                              dir: String): Map[Int, Long] = {
    if (fs.exists(offsetsPath(dir))) {
      val in = fs.open(offsetsPath(dir))
      try new String(in.readAllBytes,
        java.nio.charset.StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).map { l =>
          val Array(p, o) = l.split("=", 2); p.toInt -> o.toLong
        }.toMap
      finally in.close()
    } else {
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      val hasSegments = fs.exists(dirPath) && fs.listStatus(dirPath)
        .exists(_.getPath.getName.startsWith("partition="))
      if (!hasSegments) Map.empty
      else spark.read.parquet(dir)
        .groupBy("partition").agg(max("offset").as("m"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1) + 1)).toMap
    }
  }

  private def writeSidecar(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                           next: Map[Int, Long]): Unit = {
    val out = fs.create(offsetsPath(dir), true)
    try out.write(next.toSeq.sorted.map { case (p, o) => s"$p=$o" }
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
