package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-duplicate pair list — the step that
  * turns pairwise dedup verdicts ([[Dedup.jaccardPairs]], MinHash/SimHash
  * candidates) into per-document cluster assignments so a pipeline can
  * keep ONE canonical document per duplicate cluster. Pairs alone can't
  * do that: {A~B, B~C} must collapse to one cluster {A,B,C} even though
  * (A,C) was never scored.
  *
  * Algorithm: hash-min label propagation. Every node starts labeled with
  * its own id; each round, a node's label becomes the min of its own and
  * its neighbors' labels; fixpoint = every node carries the min id of its
  * component. Each round is one equi-join (edges × labels) + one partial
  * agg'd groupBy-min — pure shuffle-on-key plans, nothing driver-side but
  * the convergence counter. Rounds needed = component diameter; dup
  * clusters are near-cliques (diameter ≤ ~3), so 3–5 rounds close real
  * corpora. The per-round changed-label count is a cheap action on the
  * (tiny) label frame, and labels are persisted + localCheckpointed every
  * few rounds so lineage doesn't grow with iterations — the standard
  * Spark iterative-graph discipline (GraphFrames' CC does the same).
  *
  * At 100 TB: edges ∝ verified near-dup pairs (already candidate-bounded
  * by LSH), labels ∝ distinct docs in any pair — both orders of magnitude
  * smaller than the corpus. A giant component (spam template cluster)
  * skews one key's neighbor list; the groupBy-min is partial-agg'd so
  * even that collapses map-side.
  */
object Cluster {

  /** Assign every node appearing in `edges` (columns `i`, `j`) the min
    * node id of its connected component. Returns (`node`, `cluster`).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    // undirected: propagate both ways
    val sym = edges.select(col("i").as("src"), col("j").as("dst"))
      .union(edges.select(col("j").as("src"), col("i").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("cluster", col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // handle to the previous round's checkpointed frame, so its blocks
    // can be released once the next round no longer reads them
    var prevCp: DataFrame = labels
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("dst"), col("cluster").as("c")), "dst")
        .groupBy(col("src").as("node")).agg(min(col("c")).as("nc"))
      // ONE materialization per round: the eager localCheckpoint runs the
      // join (and truncates its lineage — without that, round k would
      // replay rounds 1..k-1 and the plan would grow quadratically); the
      // convergence count then reads the checkpointed blocks instead of
      // re-executing the join.
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("cluster").as("old"),
          least(col("cluster"), col("nc")).as("cluster"))
        .localCheckpoint(eager = true)
      changed = next.filter(col("cluster") < col("old")).count()
      prevCp.unpersist(blocking = false)
      prevCp = next
      labels = next.select("node", "cluster")
      iter += 1
    }
    sym.unpersist(blocking = false)
    labels
  }

  /** Cluster assignment + canonical-document choice over near-dup pairs:
    * (`doc_id`, `cluster`, `keep`) where keep=1 marks the cluster's
    * canonical (min-id) member — the row a dedup pipeline retains.
    */
  def dedupClusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("cluster"),
        (col("node") === col("cluster")).cast("int").as("keep"))
}
