package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. The dump
  * helpers are shared with the dev-only subset tool
  * [[graft.tools.VerifySome]] so the two paths cannot drift.
  */
object Verify {

  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // pin dumped timestamps to µs: the INT96 default reads back as
      // timestamp[ns] in pyarrow and the driver's hasher canonicalizes
      // ns differently from DuckDB's µs rendering (r2 gen_transactions)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config(graft.util.Tuning.sqlDefaults.toMap)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Canonicalize dumped timestamps to NAIVE µs (timestamp_ntz):
    * tz-less values are what DuckDB's oracle produces, and the session
    * tz is UTC so the cast is an identity on the rendered value. Raw
    * TimestampType would write either INT96 (pyarrow: ns) or µs-with-
    * UTC-flag (pyarrow: tz-aware) — both hash differently from the
    * oracle in the driver's compare.
    */
  def canonicalize(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampType =>
          d.withColumn(f.name,
            org.apache.spark.sql.functions.col(f.name)
              .cast(org.apache.spark.sql.types.TimestampNTZType))
        case _ => d
      }
    }

  def dumpQuery(spark: SparkSession, sfDir: String, outDir: String,
                name: String, fn: (SparkSession, String) => DataFrame): Boolean =
    try {
      canonicalize(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      true
    } catch { case e: Throwable =>
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      false
    } finally {
      // release operator-owned persists (graft.util.Caches contract) so
      // the 190-query dump doesn't accumulate pinned corpus-sized entries
      graft.util.Caches.sweep()
    }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def writeOracleJson(outDir: String, oracles: Map[String, String]): Unit = {
    val json = oracles
      .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = session()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      dumpQuery(spark, sfDir, outDir, name, fn)
    }
    writeOracleJson(outDir, SparkEntry.oracleSql)
    spark.stop()
  }
}
