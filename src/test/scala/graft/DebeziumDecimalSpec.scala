package graft

import java.math.BigInteger

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.Decimal
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DebeziumDecimal, DebeziumDecimalDecode, DebeziumDecimalEncode}

class DebeziumDecimalSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  test("decodes the README wire example AAAB9A== at scale 2") {
    // reference README.md:269-287 shows {"scale": 2, "value": "AAAB9A=="}.
    // 0x01F4 = 500 unscaled at scale 2 = 5.00 under Debezium's documented
    // encoding (BigDecimal(BigInteger(bytes), scale)); the README's prose
    // pairs it with 459.38, which is illustrative, not the actual decode
    // (459.38 would be "s7I=" = 0xB3B2 = 45938).
    val bytes = java.util.Base64.getDecoder.decode("AAAB9A==")
    val dec = DebeziumDecimalDecode.decode(bytes, 2, 2)
    assert(dec.toJavaBigDecimal == new java.math.BigDecimal("5.00"))
    val b45938 = java.util.Base64.getEncoder.encodeToString(
      java.math.BigInteger.valueOf(45938).toByteArray)
    assert(DebeziumDecimalDecode.decode(
      java.util.Base64.getDecoder.decode(b45938), 2, 2)
      .toJavaBigDecimal == new java.math.BigDecimal("459.38"))
  }

  test("decode matches java BigDecimal(BigInteger(bytes), scale) incl. negatives") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val unscaled = rnd.nextLong()
      val scale = rnd.nextInt(11)
      val bytes = BigInteger.valueOf(unscaled).toByteArray
      val expected = new java.math.BigDecimal(BigInteger.valueOf(unscaled), scale)
      val got = DebeziumDecimalDecode.decode(bytes, scale, scale)
      assert(got.toJavaBigDecimal.compareTo(expected) == 0,
        s"unscaled=$unscaled scale=$scale")
    }
  }

  test("decode handles wide (>64-bit) unscaled values") {
    val big = new BigInteger("-123456789012345678901234567890")
    val got = DebeziumDecimalDecode.decode(big.toByteArray, 5, 5)
    assert(got.toJavaBigDecimal.compareTo(
      new java.math.BigDecimal(big, 5)) == 0)
  }

  test("encode is the exact inverse of decode") {
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val unscaled = rnd.nextLong() % 1000000000000L
      val dec = Decimal(new java.math.BigDecimal(BigInteger.valueOf(unscaled), 2))
      val bytes = DebeziumDecimalEncode.encode(dec)
      assert(DebeziumDecimalDecode.decode(bytes, 2, 2)
        .toJavaBigDecimal.compareTo(dec.toJavaBigDecimal) == 0,
        s"unscaled=$unscaled")
    }
  }

  test("expression round-trips through a DataFrame plan (codegen path)") {
    val df = Seq("500.00", "-0.01", "999999.99", "0.00", "-123456.78")
      .toDF("s")
      .select(col("s").cast("decimal(18,2)").as("d"))
      .select(col("d"),
        DebeziumDecimal.debeziumDecimalBinary(
          DebeziumDecimal.debeziumDecimalEncode(col("d")), lit(2), 2).as("rt"))
    assert(df.filter(not(col("d") <=> col("rt"))).count() == 0)
  }

  test("base64 string path decodes like the wire format") {
    val df = Seq(("AAAB9A==", 2)).toDF("value", "scale")
      .select(DebeziumDecimal.debeziumDecimal(col("value"), col("scale"), 2).as("amt"))
    assert(df.head().getDecimal(0) == new java.math.BigDecimal("5.00"))
  }

  test("fromMode: string and double modes (README.md:342-346)") {
    val df = Seq("459.38").toDF("amount")
    val s = df.select(DebeziumDecimal.fromMode("string", col("amount"), 2).as("v"))
    assert(s.head().getDecimal(0).compareTo(new java.math.BigDecimal("459.38")) == 0)
    val d = df.select(DebeziumDecimal.fromMode("double", col("amount")).as("v"))
    assert(d.head().getDouble(0) == 459.38)
  }

  test("nulls propagate (null-intolerant expression)") {
    val df = Seq[(Option[String], Option[Int])]((None, Some(2)), (Some("AAAB9A=="), None))
      .toDF("value", "scale")
      .select(DebeziumDecimal.debeziumDecimal(col("value"), col("scale"), 2).as("amt"))
    assert(df.filter(col("amt").isNull).count() == 2)
  }
}
