package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders + determinism helpers shared by every query in the engine.
  *
  * Determinism discipline: the driver hash-compares our results against a
  * DuckDB oracle. Floating-point SUM/AVG over a shuffled dataset is
  * order-dependent, so every money/quantity aggregate goes through exact
  * DECIMAL arithmetic (associative + commutative ⇒ partition-order
  * independent) and is cast back to DOUBLE only at the end. The oracle SQL
  * mirrors the same casts.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations, so branch on the
    * scanned type instead of assuming either. NANOS: Spark's vectorized
    * reader rejects it outright (PARQUET_TYPE_ILLEGAL), so read raw
    * nanos (legacy long mode) and truncate to microseconds — the same
    * floor DuckDB applies when casting TIMESTAMP_NS → TIMESTAMP.
    * MICROS: plain scan, normalised to TimestampNTZ. Either way both
    * engines stay in naive wall-clock land (no tz shifts on either side).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case TimestampNTZType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  /** Spread a narrow source across all cores before per-row-heavy work
    * (JSON serde, codecs, O(n²) similarity probes). The testdata files
    * are single-row-group parquet, so the scan yields ONE partition and
    * an expensive map pipeline would otherwise run on one core of 32.
    *
    * Guard is metadata-only — file listing the plan already holds, plus
    * driver-side FileStatus calls for the (few) files — never `df.rdd`,
    * which would force an RDD-lineage conversion per call and bypass AQE.
    * On a real cluster this is a no-op two ways: many files ⇒ already
    * wide; few LARGE files ⇒ the parquet scan splits them at
    * maxPartitionBytes, so repartitioning would shuffle data that is
    * already parallel. Only a genuinely small input gets the exchange.
    */
  def spread(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val p = sc.defaultParallelism
    val files = try df.inputFiles catch { case _: Exception => Array.empty[String] }
    if (files.isEmpty || files.length >= p) df
    else {
      // byteStringAsBytes handles every legal form (134217728, 128m,
      // 1g, …) — a bare .toLong would crash on unit suffixes
      val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        df.sparkSession.conf
          .get("spark.sql.files.maxPartitionBytes", "134217728"))
      val bytes = files.map { f =>
        // resolve the filesystem PER PATH: FileSystem.get(conf) returns
        // the default FS, so an s3a://… or file:// input under an HDFS
        // default would throw on every stat and silently disable the
        // repartition via the Long.MaxValue fallback
        try {
          val path = new org.apache.hadoop.fs.Path(f)
          path.getFileSystem(sc.hadoopConfiguration).getFileStatus(path).getLen
        } catch { case _: Exception => Long.MaxValue / files.length }
      }.sum
      if (bytes < p.toLong * maxPart) df.repartition(p) else df
    }
  }
}

object Det {
  /** Exact decimal view of a 2-decimal-valued double column. */
  def dec(c: Column, p: Int = 18, s: Int = 2): Column = c.cast(DecimalType(p, s))

  /** Order-independent sum of a money-like double column, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent avg (exact decimal sum / count), as double. */
  def davg(c: Column): Column = (sum(dec(c)).cast("double") / count(c))

  /** (1 - discount) as an exact decimal factor. */
  def oneMinus(c: Column): Column = (lit(1.0) - c).cast(DecimalType(4, 2))
  def onePlus(c: Column): Column = (lit(1.0) + c).cast(DecimalType(4, 2))
}

/** One engine query: a DataFrame program over the testdata tables plus an
  * optional DuckDB-dialect oracle equivalent (None ⇒ driver does a weaker
  * rows-only check).
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
