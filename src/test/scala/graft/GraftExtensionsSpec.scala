package graft

import org.scalatest.funsuite.AnyFunSuite

/** The engine's native expressions exposed to SQL via
  * SparkSessionExtensions / FunctionRegistry (same injection list).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  import GraftSpark.spark

  GraftExtensions.registerAll(spark)

  test("debezium_decimal is callable from SQL (README wire example)") {
    // AAAB9A== = 0x01F4 = 500 unscaled, at scale 2 → 5.00
    // (reference README.md:269-287; see DebeziumDecimalSpec on why the
    // README's 459.38 prose pairing is illustrative only)
    val got = spark.sql(
      "SELECT CAST(debezium_decimal(unbase64('AAAB9A=='), 2) AS DOUBLE) v")
      .collect().head.getDouble(0)
    assert(got == 5.0)
  }

  test("encode/decode round-trip from SQL") {
    val got = spark.sql(
      """SELECT CAST(debezium_decimal(
        |  debezium_decimal_encode(CAST(-123.45 AS DECIMAL(10,2))), 2)
        |  AS DOUBLE) v""".stripMargin)
      .collect().head.getDouble(0)
    assert(got == -123.45)
  }

  test("cosine_similarity is callable from SQL") {
    val got = spark.sql(
      """SELECT cosine_similarity(
        |  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) v""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("squared_distance is callable from SQL, codegen'd, null on mismatch") {
    val got = spark.sql(
      """SELECT squared_distance(
        |  CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |  CAST(array(4.0, 6.0) AS ARRAY<FLOAT>)) v""".stripMargin)
      .collect().head.getDouble(0)
    assert(got == 25.0)                           // 3² + 4²
    val mismatch = spark.sql(
      """SELECT squared_distance(
        |  CAST(array(1.0) AS ARRAY<FLOAT>),
        |  CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)) v""".stripMargin)
      .collect().head
    assert(mismatch.isNullAt(0))
  }

  test("change_diff is callable from SQL (Trigger-2 shape)") {
    val got = spark.sql(
      """SELECT change_diff(
        |  named_struct('amount', '10.00', 'city', 'Paris'),
        |  named_struct('amount', '12.50', 'city', 'Paris')) v""".stripMargin)
      .collect().head.getString(0)
    assert(got == """{"amount":{"old":"10.00","new":"12.50"}}""")
  }

  test("zorder is callable from SQL and matches the kernel") {
    val got = spark.sql("SELECT zorder(3, 3) a, zorder(1, 0) b, zorder(0, 1) c")
      .collect().head
    assert(got.getLong(0) == 15L && got.getLong(1) == 1L &&
      got.getLong(2) == 2L)
  }
}
