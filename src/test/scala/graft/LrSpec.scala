package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Lr
import graft.util.Tables

/** Unit coverage for the fixed-point LR trainer — the driver's DuckDB
  * gate checks the full train/score queries; these pin the local
  * invariants the gate can't see.
  */
class LrSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}
  import spark.implicits._

  test("trainAndScore: hard-sigmoid probabilities stay in [0, 1e6] and pred thresholds at 1/2") {
    val out = Lr.trainAndScore(Tables(spark, sfDir, "embeddings"),
      "vec_id", "embedding", "label", labelGe = 5, iters = 2)
    val bad = out.filter(col("p_u") < 0L || col("p_u") > 1000000L ||
      (col("pred") === 1) =!= (col("p_u") >= 500000L)).count()
    assert(bad === 0L)
    assert(out.count() > 0L)
  }

  test("training reduces misclassifications vs the zero-weight model") {
    val out = Lr.trainAndScore(Tables(spark, sfDir, "embeddings"),
      "vec_id", "embedding", "label", labelGe = 5, iters = 3)
    val n = out.count().toDouble
    val wrong = out.filter(col("pred") =!= col("y")).count().toDouble
    // zero weights ⇒ p = 0.5 exactly ⇒ pred = 1 for every row; any
    // useful fit must beat predict-all-positive on this labeled set
    val allPosWrong = out.filter(col("y") === 0).count().toDouble
    assert(wrong < allPosWrong, s"wrong=$wrong allPos=$allPosWrong n=$n")
  }

  test("AUC beats chance and the rank-sum identity is internally consistent") {
    val r = Lr.queries.find(_.name == "embed_lr_auc").get
      .fn(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    val (nPos, nNeg) = (row.getAs[Long]("n_pos"), row.getAs[Long]("n_neg"))
    val (num2, den2) = (row.getAs[Long]("auc_num2"), row.getAs[Long]("auc_den2"))
    val auc = row.getAs[Double]("auc")
    assert(nPos > 0L && nNeg > 0L)
    assert(den2 === 2L * nPos * nNeg)
    // num2/den2 is the tie-averaged AUC: must be a valid probability
    assert(num2 >= 0L && num2 <= den2, s"num2=$num2 den2=$den2")
    // the trained scorer must discriminate better than chance
    assert(auc > 0.5, s"auc=$auc")
    assert(math.abs(auc - num2.toDouble / den2) <= 1e-6)
  }

  test("fit refuses ragged embedding lengths") {
    val ragged = Seq(
      (1L, 1, Array(1000L, 2000L)),
      (2L, 0, Array(1000L))).toDF("id", "y", "xq")
    val e = intercept[IllegalArgumentException](Lr.fit(ragged, 1))
    assert(e.getMessage.contains("ragged"))
  }

  test("single-iteration oracle SQL is syntactically valid (no trailing comma)") {
    // fitCtes(1) used to emit `w1 AS (...),` followed by nothing —
    // regression guard: every clause must be followed by a clause
    val sql = Lr.fitCtesForTest(1)
    assert(!sql.trim.endsWith(","), sql.takeRight(80))
    assert(!sql.matches("(?s).*,\\s*"), sql.takeRight(80))
  }
}
