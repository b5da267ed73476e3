package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.KMeansStep
import graft.util.Tables

class KMeansSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}
  import spark.implicits._

  private def vecs: Map[Long, Array[Float]] =
    Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap

  private def d2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
    }
    s
  }

  test("assignment is the argmin over the seeded centroids") {
    val every = 50
    val all = vecs
    val cents = all.filter(_._1 % every == 0)
    val got = KMeansStep.assign(Tables(spark, sfDir, "embeddings"),
        "vec_id", "embedding", every)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(got.size == all.size)
    // the cross-engine ranking key is the floor-quantized micro-unit
    // BIGINT (floor acts on the binary double identically in Spark and
    // DuckDB — round() does not; see KMeansStep.assign)
    def q6(x: Double): Long = math.floor(x * 1e6).toLong
    for ((vid, v) <- all) {
      // the operator's contract: argmin on the micro-unit quantization
      // with cluster-id tie-break (the cross-engine oracle ranking),
      // which must also BE a true raw-distance argmin up to a quantum
      val byContract = cents.toSeq.map { case (cid, c) => (q6(d2(v, c)), cid) }.min
      assert(got(vid) == byContract._2,
        s"vec $vid assigned ${got(vid)}, contract argmin ${byContract._2}")
      val rawBest = cents.toSeq.map { case (_, c) => d2(v, c) }.min
      assert(q6(d2(v, cents(got(vid)))) <= q6(rawBest),
        s"vec $vid assigned a centroid farther than the true argmin by > a quantum")
    }
  }

  test("one Lloyd iteration does not increase within-cluster SSE") {
    val every = 50
    val all = vecs
    val cents0 = all.filter(_._1 % every == 0)
    // SSE under the seed centroids
    val sse0 = all.values.map(v => cents0.values.map(d2(v, _)).min).sum
    // updated centroids from the engine's step output
    val upd = KMeansStep.update(Tables(spark, sfDir, "embeddings"),
        "vec_id", "embedding", every)
      .select("cluster", "dim", "mean").as[(Long, Int, Double)]
      .collect().groupBy(_._1).map { case (c, rows) =>
        c -> rows.sortBy(_._2).map(_._3.toFloat)
      }
    assert(upd.keySet == cents0.keySet)
    assert(upd.values.forall(_.length == 64))
    val sse1 = all.values.map(v => upd.values.map(d2(v, _)).min).sum
    assert(sse1 <= sse0, s"Lloyd step increased SSE: $sse0 -> $sse1")
  }
}
