package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics expressed as DataFrame joins — PageRank as
  * the representative fixed-iteration algorithm (connected components,
  * the other staple, lives in [[Cluster]]).
  *
  * Determinism discipline: ranks are carried as BIGINT units of 1e-12
  * (micro-micro "probability mass"), every step is integer division and
  * integer sums — exact, commutative, partition-order independent — so
  * the result is bit-identical across engines and runs, unlike float
  * PageRank whose per-node incoming sums depend on reduction order. The
  * final rank is one exact double division for display.
  *
  * Scale: each iteration is (edges ⋈ ranks) on src + a partial-agg'd
  * groupBy on dst + a left join back onto the node set — all
  * shuffle-on-key plans, nothing driver-side but the iteration counter.
  * High-out-degree hubs cost |edges(src)| rows like any join; high
  * IN-degree hubs are absorbed map-side by the partial sum. For deep
  * iteration counts, persist + localCheckpoint every few rounds exactly
  * as [[Cluster.connectedComponents]] does (at the 3–10 iterations
  * PageRank needs for ranking stability, plain lineage is fine).
  *
  * Dangling nodes (no out-edges) drop their mass — the standard
  * simplification; callers who need mass conservation add a self-loop.
  */
object Graph {

  val TotalUnits: Long = 1000000000000L // 1.0 of probability mass

  /** @param nodes one column `node`
    * @param edges columns `src`, `dst` (directed)
    * @return (`node`, `u` BIGINT rank units, `rank` DOUBLE = u/1e12)
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
               dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    // node count: a metadata-scale aggregate (the rank vector itself is
    // n rows); the uniform init and teleport term need it
    val n = nodes.count()
    val init = TotalUnits / n
    val base = TotalUnits * (dampDen - dampNum) / dampDen / n
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesWithDeg = edges.join(deg, "src")
    var rank = nodes.select(col("node"), lit(init).as("u"))
    for (_ <- 1 to iters) {
      val contrib = edgesWithDeg
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("u DIV deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      rank = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(expr(s"(s * $dampNum) DIV $dampDen"), lit(0L)))
            .as("u"))
    }
    rank.withColumn("rank", col("u").cast("double") / lit(1e12))
  }
}
