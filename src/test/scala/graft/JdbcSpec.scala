package graft

import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc

/** JDBC adapter (O5 scan+limit, O14 idempotent sink) against a LIVE
  * embedded Derby database — not plan-only: the scans execute and the
  * pushdown assertions read the actual physical plan of a DSv2 JDBC scan.
  * Derby runs in-memory in this JVM; in local[*] mode executors share the
  * JVM so the executor-side sink writes land in the same database.
  */
class JdbcSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def exec(sqls: String*): Unit = {
    val c = DriverManager.getConnection(url)
    try sqls.foreach { s =>
      val st = c.createStatement()
      try st.execute(s) finally st.close()
    } finally c.close()
  }

  private def setupSource(): Unit = {
    try exec("DROP TABLE TRANSACTIONS") catch { case _: Exception => () }
    exec(
      """CREATE TABLE TRANSACTIONS (
        |  TRANSACTION_ID VARCHAR(64) PRIMARY KEY,
        |  AMOUNT DOUBLE,
        |  CURRENCY VARCHAR(8))""".stripMargin)
    val c = DriverManager.getConnection(url)
    try {
      val ps = c.prepareStatement("INSERT INTO TRANSACTIONS VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setString(1, f"t$i%03d")
        ps.setDouble(2, i * 10.0)
        ps.setString(3, if (i % 2 == 0) "EUR" else "USD")
        ps.addBatch()
      }
      ps.executeBatch()
    } finally c.close()
  }

  test("O5 scan + LIMIT against a live JDBC database") {
    setupSource()
    // the reference's only query: select * from transactions limit n
    // (transaction_producer.py:33-39)
    val got = Jdbc.scanLimit(spark, url, "TRANSACTIONS", 50)
    assert(got.count() == 50)
    assert(got.columns.toSeq == Seq("TRANSACTION_ID", "AMOUNT", "CURRENCY"))
  }

  test("DSv2 catalog scan pushes filters AND limit into the database") {
    setupSource()
    Jdbc.registerCatalog(spark, "graftjdbc", url)
    val df = spark.table("graftjdbc.APP.TRANSACTIONS")
      .filter(col("AMOUNT") > 500.0)
      .select(col("TRANSACTION_ID"), col("AMOUNT"))
      .limit(5)
    val plan = df.queryExecution.executedPlan.toString
    // predicate reached the scan, not a post-scan Filter over a full fetch
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.replaceAll("\\s", "").matches("(?s).*PushedFilters:.*AMOUNT.*"),
      plan)
    // and the LIMIT is in the pushed scan too (LimitPushDown → DSv2)
    assert(plan.contains("PushedLimit"), plan)
    assert(df.collect().length == 5)
    // column pruning: only the two selected columns in the read schema
    assert(!plan.replaceAll("\\s", "")
      .matches("(?s).*ReadSchema:.*CURRENCY.*"), plan)
  }

  test("O14 idempotent keyed JDBC sink: first write wins across batches") {
    try exec("DROP TABLE SINK") catch { case _: Exception => () }
    exec(
      """CREATE TABLE SINK (
        |  K VARCHAR(16) PRIMARY KEY, V VARCHAR(16))""".stripMargin)
    val b1 = Seq(("k1", "v1"), ("k2", "v2")).toDF("K", "V")
    val b2 = Seq(("k2", "DUP"), ("k3", "v3"), ("k3", "also-dup")).toDF("K", "V")
    Jdbc.upsertBatch(b1, url, "SINK", Seq("K"))
    Jdbc.upsertBatch(b2, url, "SINK", Seq("K"))
    // replay batch 2 entirely (at-least-once redelivery) — no effect
    Jdbc.upsertBatch(b2, url, "SINK", Seq("K"))
    val got = Jdbc.read(spark, url, "SINK")
      .as[(String, String)].collect().toMap
    assert(got("k1") == "v1" && got("k2") == "v2" && got.size == 3)
  }

  test("postgres URLs get the native ON CONFLICT DO NOTHING form") {
    // the reference's exact sink statement (transaction_consumer.py:85-88)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("K",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("V",
        org.apache.spark.sql.types.StringType)))
    val pg = Jdbc.insertIgnoreSql("jdbc:postgresql://host/db", "SINK",
      Seq("K"), schema)
    assert(pg.contains("ON CONFLICT (K) DO NOTHING"), pg)
    val derby = Jdbc.insertIgnoreSql(url, "SINK", Seq("K"), schema)
    assert(derby.contains("WHERE NOT EXISTS"), derby)
  }

  test("streaming foreachBatch JDBC sink (E2 consumer path end-to-end)") {
    try exec("DROP TABLE STREAMSINK") catch { case _: Exception => () }
    exec(
      """CREATE TABLE STREAMSINK (
        |  K VARCHAR(16) PRIMARY KEY, V VARCHAR(16))""".stripMargin)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = input.toDF().toDF("K", "V").writeStream
      .foreachBatch(Jdbc.foreachBatchSink(url, "STREAMSINK", Seq("K")))
      .start()
    try {
      input.addData(("a", "1"), ("b", "2"))
      q.processAllAvailable()
      input.addData(("b", "REDELIVERED"), ("c", "3"))
      q.processAllAvailable()
      val got = Jdbc.read(spark, url, "STREAMSINK")
        .as[(String, String)].collect().toMap
      assert(got == Map("a" -> "1", "b" -> "2", "c" -> "3"))
    } finally q.stop()
  }
}
