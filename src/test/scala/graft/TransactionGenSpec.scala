package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TransactionGen
import graft.model.Schemas

class TransactionGenSpec extends AnyFunSuite {
  import GraftSpark.spark

  test("schema matches the reference's 12 columns (main.py:32-45)") {
    val df = TransactionGen.batch(spark, 10)
    assert(df.schema.fieldNames.toSeq == Schemas.transaction.fieldNames.toSeq)
  }

  test("deterministic: same seed → identical rows; new seed → different") {
    val a = TransactionGen.batch(spark, 500, seed = 42).collect()
    val b = TransactionGen.batch(spark, 500, seed = 42).collect()
    val c = TransactionGen.batch(spark, 500, seed = 43).collect()
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
  }

  test("field domains follow main.py:12-25") {
    val df = TransactionGen.batch(spark, 2000).cache()
    try {
      assert(df.select("transaction_id").distinct().count() == 2000) // uuid4-unique
      assert(df.filter(!col("currency").isin("EUR", "USD")).count() == 0)
      assert(df.filter(!col("payment_method").isin(
        "credit_card", "debit_card", "online_transfer")).count() == 0)
      assert(df.filter(!col("voucher_code").isin("", "DISCOUNT10")).count() == 0)
      // voucher ~⅔ empty (choice of ["","DISCOUNT10",""], main.py:23)
      val emptyFrac = df.filter(col("voucher_code") === "").count().toDouble / 2000
      assert(emptyFrac > 0.5 && emptyFrac < 0.8)
      // amount in [10, 1000] with 2 decimals (main.py:16)
      val amtBad = df.filter(col("amount") < 10 || col("amount") > 1001).count()
      assert(amtBad == 0)
      // uuid shape 8-4-4-4-12
      assert(df.filter(!col("transaction_id")
        .rlike("^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"))
        .count() == 0)
    } finally df.unpersist()
  }
}
