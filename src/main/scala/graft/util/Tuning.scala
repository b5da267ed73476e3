package graft.util

import org.apache.spark.sql.SparkSession

/** Engine-wide session tuning (round 17, guide §2.2/§2.4): make AQE's
  * partition coalescing reach EVERY post-shuffle stage, including the
  * materialization of operator-owned persists.
  *
  * Why each knob exists — measured on the r17 baseline
  * (bench_r17_baseline.json, steal 0.02%):
  *
  *  - `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true`
  *    The dedup/similarity operators persist their shared kernels
  *    (Caches.own) so three consumers pay one shingling. With the
  *    default `false`, a cached plan is compiled WITHOUT AQE, so its
  *    build runs at the raw `spark.sql.shuffle.partitions` fan-out and
  *    every downstream stage inherits that partition count. Measured
  *    (DiagQ, sf0.1): dedup_jaccard ran 267 tasks / 12.96 s task CPU
  *    for a 12.8 MB shuffle — ~40 ms of fixed per-task cost (closure
  *    deser, hadoop-conf gzip, codegen class lookup) dwarfing the
  *    per-byte work; with AQE allowed on the cached plan it is 39
  *    tasks / 3.85 s. The conf defaults to false only because a
  *    cached plan's output partitioning becomes advisory-size-
  *    dependent — no consumer here assumes a cache's partitioning.
  *
  *  - `spark.sql.adaptive.coalescePartitions.parallelismFirst=false`
  *    The default `true` deliberately over-splits small shuffles down
  *    to `minPartitionSize` (1 MB) "to maximize parallelism", which
  *    recreates the tiny-task problem AQE coalescing exists to solve;
  *    the guide (§2.2) says to size partitions by
  *    `advisoryPartitionSizeInBytes` instead. Measured on top of the
  *    cache conf: dedup_jaccard 39 → 15 tasks, task CPU 3.85 → 2.01 s;
  *    dedup_containment 3.40 → 1.40 s. At scale the advisory size
  *    (64 MB default, overridable per deployment) keeps reduce
  *    parallelism ∝ data, so this is NOT a local[32] tune: a 100 TB
  *    shuffle still fans out to ~1.6 M partitions.
  *
  * Applied by every engine main (Bench/Verify/EntrySmoke and the dev
  * tools); library embedders get the same defaults from
  * [[tuned(SparkSession.Builder)]] but can override any key AFTER
  * `getOrCreate()` — both are plain SQLConf entries.
  */
object Tuning {

  val sqlDefaults: Seq[(String, String)] = Seq(
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false")

  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    sqlDefaults.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
