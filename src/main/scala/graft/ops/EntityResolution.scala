package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** Entity resolution / record linkage: find records that refer to the
  * same real-world entity despite textual drift (typos, truncations) —
  * the structured-data sibling of document dedup, and the same
  * scale discipline: NEVER an all-pairs compare.
  *
  * Candidate generation is deletion-neighborhood blocking (the
  * SymSpell construction): two strings within Levenshtein distance 1
  * ALWAYS share a string obtained by deleting at most one character
  * from each — so candidates are an EQUI-JOIN on (block, variant)
  * derived keys, and the variant join is provably recall-complete for
  * distance ≤ 1 (unlike LSH banding there is no recall loss, which is
  * why the oracle can verify against the plain within-block compare).
  * A conjunctive block key (here: nation) models the deterministic
  * attributes a linkage pass trusts.
  *
  * Scale shape: variants are a map-only explode (L+1 keys per record);
  * the candidate join is an equi-join whose fan-out is bounded by
  * variant-key collisions, not block size² — the nation-block
  * quadratic a naive blocker pays is exactly what this avoids. The
  * verify is a per-candidate levenshtein (codegen'd, both engines
  * implement plain unit-cost edit distance). Entity ids come from
  * [[Cluster.dedupClusters]]'s hash-min propagation.
  */
object EntityResolution {

  /** The deletion neighborhood of `s`: s itself plus every string with
    * one character deleted, de-duplicated (repeated characters yield
    * identical variants).
    */
  def deletionVariants(s: Column): Column =
    array_distinct(concat(
      array(s),
      transform(sequence(lit(1), length(s)), i =>
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))))

  /** Matched pairs (i < j) within the same `blockCol` whose `nameCol`
    * Levenshtein distance ≤ 1, via the deletion-variant equi-join.
    * Returns (i, j, dist).
    */
  def matchPairs(df: DataFrame, idCol: String, nameCol: String,
                 blockCol: String): DataFrame = {
    val recs = df.select(col(idCol).as("id"), col(nameCol).as("nm"),
      col(blockCol).as("blk"))
    // the join key is the HASH of the variant, not the string: 8-byte
    // shuffle keys instead of ~name-length strings, and a collision
    // can only ADD a candidate the levenshtein verify then rejects —
    // the result set is provably unchanged
    val variants = recs
      .select(col("id"), col("nm"), col("blk"),
        explode(deletionVariants(col("nm"))).as("v0"))
      .select(col("id"), col("nm"), col("blk"), xxhash64(col("v0")).as("v"))
    variants.as("a").join(variants.as("b"),
        col("a.blk") === col("b.blk") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        col("a.nm").as("ni"), col("b.nm").as("nj"))
      .distinct()
      .withColumn("dist", levenshtein(col("ni"), col("nj")))
      .filter(col("dist") <= 1)
      .select("i", "j", "dist")
  }

  /** Entity assignment: connected components over the match pairs —
    * every record tagged with its entity's minimum member id.
    */
  def entities(df: DataFrame, idCol: String, nameCol: String,
               blockCol: String): DataFrame =
    Cluster.dedupClusters(matchPairs(df, idCol, nameCol, blockCol)
      .select("i", "j"))

  val queries: Seq[GQuery] = Seq(

    // The oracle verifies recall-completeness of the deletion-variant
    // equi-join: it computes the SAME result by the plain within-block
    // quadratic compare (fine at oracle scale; the point is that the
    // engine-side equi-join provably finds every distance-≤1 pair).
    GQuery("er_match_pairs",
      (s, d) => matchPairs(Tables(s, d, "customer"),
          "c_custkey", "c_name", "c_nationkey")
        .orderBy(col("i"), col("j")),
      Some("""SELECT a.c_custkey AS i, b.c_custkey AS j,
          CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
        ORDER BY i, j""")),

    GQuery("er_entities",
      (s, d) => entities(Tables(s, d, "customer"),
          "c_custkey", "c_name", "c_nationkey")
        .orderBy(col("doc_id")),
      Some("""WITH RECURSIVE e0 AS (
          SELECT a.c_custkey AS i, b.c_custkey AS j
          FROM customer a JOIN customer b
            ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
          WHERE levenshtein(a.c_name, b.c_name) <= 1),
        e AS (SELECT i AS a, j AS b FROM e0 UNION SELECT j, i FROM e0),
        reach(node, r) AS (
          SELECT a, b FROM e
          UNION
          SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a)
        SELECT node AS doc_id, least(node, min(r)) AS cluster,
               CAST(least(node, min(r)) = node AS INT) AS keep
        FROM reach GROUP BY node ORDER BY doc_id"""))
  )
}
