package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroFiles

class AvroSpec extends AnyFunSuite {
  import GraftSpark.spark

  test("avro container round-trips nulls and every supported scalar type") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("x", DoubleType)))
    val rows = Seq(
      Row(1L, "alpha", 1.5),
      Row(2L, null, -0.25),
      Row(3L, "gamma", null),
      Row(null, "delta", 4.0),
      Row(5L, "", 0.0))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val dir = java.nio.file.Files.createTempDirectory("avro_nulls").toString
    AvroFiles.write(df, dir)
    val back = AvroFiles.read(spark, dir, schema).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    val want = rows
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(back == want)
  }

  test("unsupported column types fail loudly, not silently") {
    val df = spark.range(3).selectExpr("id", "array(id) AS a")
    intercept[IllegalArgumentException] {
      AvroFiles.write(df, java.nio.file.Files
        .createTempDirectory("avro_bad").toString)
    }
  }
}
