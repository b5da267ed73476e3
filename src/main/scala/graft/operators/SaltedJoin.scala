package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join (SURVEY.md §2B / 100 TB toolbox).
  *
  * A hot join key sends its entire probe-side volume to ONE reducer in a
  * shuffled join; at 100 TB a single viral key stalls the stage. AQE's
  * skew-join split handles this for sort-merge joins it can see, but not
  * for every shape (e.g. stream-static joins, or when the skew hides
  * behind a downstream aggregation). Explicit salting is the portable
  * fix: spread each probe key over `salts` sub-keys, replicate the
  * (smaller) build side once per salt, join on (key, salt), drop the
  * salt. Result set is EXACTLY the plain join's (oracle-checked in
  * q44_salted_join) — the salt only changes the partitioning.
  *
  * Cost model: build side is duplicated `salts`× (choose salts ≈ skew
  * factor, not core count) while the probe side's hottest key now spans
  * `salts` reducers. The probe salt is a hash of the probe row, not
  * rand(): deterministic under task retry, so the join stays
  * exactly-once under speculative execution.
  */
object SaltedJoin {

  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKeys: Seq[String], buildKeys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename the input column")
    val p = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val b = build.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    val cond = probeKeys.zip(buildKeys)
      .map { case (pk, bk) => p(pk) === b(bk) }
      .reduce(_ && _) && p("__salt") === b("__salt")
    p.join(b, cond).drop("__salt")
  }
}
