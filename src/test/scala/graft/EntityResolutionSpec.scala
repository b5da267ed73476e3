package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EntityResolution

class EntityResolutionSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  test("deletion-variant blocking finds exactly the distance-≤1 pairs") {
    val recs = Seq(
      (1L, "acme corp", 7),     // 1–2: substitution (dist 1)
      (2L, "acme c0rp", 7),
      (3L, "acme cor", 7),      // 1–3: deletion (dist 1)
      (4L, "acme corporation", 7), // dist > 1 from all
      (5L, "acme corp", 9),     // same name, DIFFERENT block → no pair
      (6L, "zenith llc", 7))
      .toDF("id", "name", "blk")
    val got = EntityResolution.matchPairs(recs, "id", "name", "blk")
      .select("i", "j").as[(Long, Long)].collect().toSet
    // 2–3 ("acme c0rp" vs "acme cor") is distance 2 — correctly absent
    assert(got == Set((1L, 2L), (1L, 3L)))
    // and the engine's set must equal the quadratic ground truth
    val truth = (for {
      a <- recs.collect(); b <- recs.collect()
      if a.getInt(2) == b.getInt(2) && a.getLong(0) < b.getLong(0)
      d = levDist(a.getString(1), b.getString(1)) if d <= 1
    } yield (a.getLong(0), b.getLong(0))).toSet
    assert(got == truth)
  }

  test("entities cluster transitively through chains of near-matches") {
    val recs = Seq(
      (10L, "smith", 1), (11L, "smyth", 1), (12L, "smythe", 1), // chain
      (20L, "jones", 1))
      .toDF("id", "name", "blk")
    val ent = EntityResolution.entities(recs, "id", "name", "blk")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
      .toMap
    // smith–smyth dist 1, smyth–smythe dist 1, smith–smythe dist 2:
    // transitivity must still put all three in entity 10
    assert(ent(10L) == 10L && ent(11L) == 10L && ent(12L) == 10L)
    assert(!ent.contains(20L) || ent(20L) == 20L) // singleton drops or self
  }

  test("randomized: variant blocking ≡ quadratic reference on dense collisions") {
    // short strings over a 3-letter alphabet force many true distance-1
    // pairs and many near-misses; seeded, deterministic
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val recs = (0 until 60).map { i =>
        val len = 3 + rnd.nextInt(4)
        val s = (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        (i.toLong, s, rnd.nextInt(2))
      }
      val df = recs.toDF("id", "name", "blk")
      val got = EntityResolution.matchPairs(df, "id", "name", "blk")
        .select("i", "j").as[(Long, Long)].collect().toSet
      val truth = (for {
        a <- recs; b <- recs
        if a._3 == b._3 && a._1 < b._1 && levDist(a._2, b._2) <= 1
      } yield (a._1, b._1)).toSet
      assert(got == truth,
        s"trial $trial: ${(got diff truth).take(3)} extra, " +
          s"${(truth diff got).take(3)} missing")
    }
  }

  test("depth-2 neighborhood finds exactly the distance-≤2 pairs") {
    val recs = Seq(
      (1L, "acme corp", 7),
      (2L, "acme c0rp", 7),        // 1–2 dist 1
      (3L, "acme cor", 7),         // 1–3 dist 1; 2–3 dist 2
      (4L, "acme co", 7),          // 3–4 dist 1; 1–4 dist 2; 2–4 dist 3
      (5L, "acme corporation", 7), // ≥ 3 from everything
      (6L, "acme corp", 9))        // other block
      .toDF("id", "name", "blk")
    val got = EntityResolution.matchPairs(recs, "id", "name", "blk",
        maxDist = 2)
      .select("i", "j", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 2),
      (3L, 4L, 1), (1L, 4L, 2)))
  }

  test("randomized: depth-2 blocking ≡ quadratic reference") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val recs = (0 until 50).map { i =>
        val len = 4 + rnd.nextInt(4)
        val s = (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        (i.toLong, s, rnd.nextInt(2))
      }
      val df = recs.toDF("id", "name", "blk")
      val got = EntityResolution.matchPairs(df, "id", "name", "blk",
          maxDist = 2)
        .select("i", "j").as[(Long, Long)].collect().toSet
      val truth = (for {
        a <- recs; b <- recs
        if a._3 == b._3 && a._1 < b._1 && levDist(a._2, b._2) <= 2
      } yield (a._1, b._1)).toSet
      assert(got == truth,
        s"trial $trial: ${(got diff truth).take(3)} extra, " +
          s"${(truth diff got).take(3)} missing")
    }
  }

  test("df-cap drops only hot-variant candidates; capped result is a subset") {
    // 30 records sharing the template "aaaN" collide on 2-delete
    // variants like "aa"; a planted distinct pair survives the cap
    // because its shared variants are cold
    val recs = ((0 until 30).map(i => (i.toLong, s"aa${('a' + i % 26).toChar}x", 1)) ++
      Seq((100L, "zqwerty", 1), (101L, "zqwertu", 1))) // dist 1, cold keys
      .toDF("id", "name", "blk")
    val uncapped = EntityResolution.matchPairs(recs, "id", "name", "blk",
        maxDist = 2)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val capped = EntityResolution.matchPairs(recs, "id", "name", "blk",
        maxDist = 2, maxDf = 8)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped), "cap must never ADD pairs")
    assert(capped.contains((100L, 101L)), "cold pair lost to the cap")
    // the hot template block really was pruned — the cap did something
    assert(capped.size < uncapped.size)
  }

  test("linkPairs: two-table linkage ≡ quadratic reference, dirty twins at dist 1") {
    val master = Seq(
      (1L, "acme corp", 7), (2L, "zenith labs", 7),
      (3L, "acme corp", 8), (4L, "nadir inc", 8))
      .toDF("id", "name", "blk")
    val feed = Seq(
      (101L, "acme cor", 7),    // deletion of master 1 → dist 1
      (102L, "zenith labz", 7), // substitution → dist 1
      (103L, "completely different", 7),
      (104L, "acme corp", 8),   // exact copy of master 3 → dist 0
      (105L, "acme cor", 8))    // also links master 3 at dist 1
      .toDF("id", "name", "blk")
    val got = EntityResolution.linkPairs(master, "id", "name", "blk",
        feed, "id", "name", "blk", maxDist = 1)
      .select("i", "j", "dist").as[(Long, Long, Int)].collect().toSet
    // quadratic reference within blocks
    val m = master.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val f = feed.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val ref = (for {
      a <- m; b <- f
      if a._3 == b._3 && levDist(a._2, b._2) <= 1
    } yield (a._1, b._1, levDist(a._2, b._2))).toSet
    assert(got == ref, s"blocked linkage must equal the quadratic compare: $got vs $ref")
    assert(got.contains((1L, 101L, 1)) && got.contains((3L, 104L, 0)) &&
      got.contains((3L, 105L, 1)) && !got.exists(_._2 == 103L))
    // blocks are respected: master 1 never links feed 105 (other block)
    assert(!got.contains((1L, 105L, 1)))
  }

  test("variant index: probe ≡ linkPairs over master ∪ appended segment; replay idempotent; forget + rebuild") {
    import graft.ops.Forget
    import graft.util.Tables
    val cust = Tables(spark, GraftSpark.sfDir, "customer")
      .filter(col("c_nationkey") < 3)
    val baseM = cust.filter(col("c_custkey") % 2 === 0)
    val segM = cust.filter(col("c_custkey") % 2 === 1)
    // dirty feed: every master name with one deterministic char deleted
    val p = (pmod(conv(substring(md5(
        concat(lit("crm:"), col("c_custkey").cast("string"))),
        1, 8), 16, 10).cast("long"),
      length(col("c_name")).cast("long")) + 1).cast("int")
    val crm = cust.select(
      (col("c_custkey") + 1000000L).as("crm_id"),
      concat(col("c_name").substr(lit(1), p - 1),
        col("c_name").substr(p + 1, length(col("c_name"))))
        .as("crm_name"),
      col("c_nationkey").as("crm_nation"))
    val idx = java.nio.file.Files
      .createTempDirectory("graft_eridx_spec").toString + "/index"
    EntityResolution.writeVariantIndex(baseM,
      "c_custkey", "c_name", "c_nationkey", idx)
    EntityResolution.appendToVariantIndex(spark, idx, segM,
      "c_custkey", "c_name", "c_nationkey", "b0")
    def probe() = EntityResolution.linkAgainstIndex(spark, idx, crm,
        "crm_id", "crm_name", "crm_nation", maxDist = 1)
      .select("i", "j", "dist").as[(Long, Long, Int)].collect().toSet
    val got = probe()
    val direct = EntityResolution.linkPairs(
        cust, "c_custkey", "c_name", "c_nationkey",
        crm, "crm_id", "crm_name", "crm_nation", maxDist = 1)
      .select("i", "j", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == direct,
      "index probe must equal direct linkage over the full master table")
    assert(got.nonEmpty)
    // at-least-once replay: byte-identical index, identical probe
    def rows() = spark.read.parquet(
        graft.sources.IndexLifecycle.resolveDir(spark, idx))
      .select("id", "nm", "blk", "v").collect().map(_.toString).sorted.toSeq
    val before = rows()
    EntityResolution.appendToVariantIndex(spark, idx, segM,
      "c_custkey", "c_name", "c_nationkey", "b0")
    assert(rows() == before, "replayed append must be a no-op")
    // RTBF: forgotten masters stop linking; survivors untouched
    val victims = got.map(_._1).toSeq.sorted.take(5)
    assert(Forget.fromVariantIndex(spark, idx, victims) > 0L)
    val afterForget = probe()
    assert(afterForget == got.filterNot(t => victims.contains(t._1)),
      "forget must remove exactly the victims' links")
    // fenced segment-merge rebuild: segments collapse, probe unchanged
    EntityResolution.rebuildVariantIndex(spark, idx)
    assert(probe() == afterForget, "rebuild changed probe results")
    val dir = graft.sources.IndexLifecycle.resolveDir(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.sources.IndexLifecycle.segmentsOf(fs,
      new org.apache.hadoop.fs.Path(dir)) == Seq("base"))
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
