package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderValue
import graft.sources.Layout
import graft.util.Tables

class LayoutSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}

  test("z-value kernel: bit interleave, monotone locality, codegen") {
    // hand-checked interleaves
    assert(ZOrderValue.compute(0, 0) == 0L)
    assert(ZOrderValue.compute(1, 0) == 1L)          // a → even bits
    assert(ZOrderValue.compute(0, 1) == 2L)          // b → odd bits
    assert(ZOrderValue.compute(3, 3) == 15L)
    assert(ZOrderValue.compute(0xffffffff >>> 1, 0) == 0x1555555555555555L)
    // recover both dims from the z-value on random inputs
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val (a, b) = (rnd.nextInt(Int.MaxValue), rnd.nextInt(Int.MaxValue))
      val z = ZOrderValue.compute(a, b)
      var (ra, rb) = (0L, 0L)
      for (i <- 0 until 31) {
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra == a && rb == b)
    }
    // negative input is a loud error, not a silent null
    intercept[IllegalArgumentException](ZOrderValue.compute(-1, 0))
    // the expression stays inside whole-stage codegen
    val df = Tables(spark, sfDir, "events")
      .select(ZOrderValue.zOrderValue(
        col("user_id").cast("int"), floor(col("value")).cast("int")).as("z"))
    val exec = df.queryExecution.executedPlan
    assert(exec.find(_.isInstanceOf[
      org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined,
      exec.toString)
    // the z projection itself sits INSIDE the codegen region
    assert(exec.toString.linesIterator.next().startsWith("*"), exec.toString)
    assert(df.count() > 0)
  }

  /** Rows the parquet scan actually materialized (after row-group
    * pruning) for a count over `filter`. */
  private def scannedRows(df: DataFrame): Long = {
    val agg = df.agg(count(lit(1)))
    agg.collect()
    // dig through AQE wrappers (adaptive root + query stages) to the scans
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      }.flatten
    val found = scans(agg.queryExecution.executedPlan)
    assert(found.nonEmpty,
      "no parquet scan in the plan:\n" + agg.queryExecution.executedPlan)
    found.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes row groups in BOTH dimensions") {
    // sf0.01 (10k rows) and 64 files: z-order locality is a statement
    // about many row groups — at 16 groups the curve's top level is all
    // the resolution there is and boundary-straddling files dominate
    val events = Tables(spark, "/root/testdata/sf0.01", "events")
      .select(col("event_id"),
        col("user_id").cast("int").as("a"),
        floor(col("value")).cast("int").as("b"))
    val total = events.count()
    val dir = Files.createTempDirectory("graft_layout").toString
    val zDir = s"$dir/zorder"
    val linDir = s"$dir/linear"
    val nFiles = 64
    Layout.writeZOrdered(events, col("a"), col("b"), zDir, nFiles)
    Layout.writeLinear(events, col("a"), linDir, nFiles)

    val zTab = spark.read.parquet(zDir)
    val linTab = spark.read.parquet(linDir)
    // identical content, layout aside
    assert(zTab.count() == total && linTab.count() == total)

    // selective range on b — the dimension the linear layout is NOT
    // clustered on: z-order must prune hard, linear reads EVERYTHING
    // (b >= 200 is ~4% of the data mass; b is skewed low, which is
    // exactly what the rank normalization is for)
    val bBox = (d: DataFrame) => d.filter(col("b") >= 200)
    val zScanB = scannedRows(bBox(zTab))
    val linScanB = scannedRows(bBox(linTab))
    assert(bBox(zTab).count() == bBox(linTab).count())
    assert(linScanB * 5 >= total * 4,
      s"linear layout should scan ~everything for a b-filter, got $linScanB/$total")
    assert(zScanB * 4 <= total,
      s"z-order should skip 3/4+ of the rows for a selective b-range, scanned $zScanB/$total")

    // a 20%-mass box on a still prunes (z-order trades a little of the
    // single-key locality for coverage of both dimensions)
    val aBox = (d: DataFrame) => d.filter(col("a") >= 10 && col("a") < 40)
    val zScanA = scannedRows(aBox(zTab))
    assert(zScanA * 2 <= total,
      s"z-order should skip at least half the rows for an a-box, scanned $zScanA/$total")

    // don't leak layout dirs across test runs
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(dir)).iterator.asScala.toSeq
      .reverse.foreach(Files.deleteIfExists(_))
  }

  test("curriculum layout: balanced bands, band-major total order, hash-shuffled within") {
    import spark.implicits._
    val scored = graft.ops.TextAnalysis
      .quality(Tables(spark, sfDir, "documents"), "text")
      .select(col("doc_id"), col("quality_score"))
    val out = Layout.curriculumOrder(scored, "doc_id", "quality_score",
        buckets = 10, salt = "curr")
      .as[(Long, Int, Long)].collect().sortBy(_._3)
    val n = out.length
    assert(n == scored.count())
    // pos is a 1-based permutation, band-major (deciles ascend with pos)
    assert(out.map(_._3).toSeq == (1L to n).toSeq)
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq)
    // equal-mass bands: sizes differ by at most 1
    val sizes = out.groupBy(_._2).view.mapValues(_.length).values
    assert(sizes.max - sizes.min <= 1, s"unbalanced bands: $sizes")
    // band k's worst quality is no worse than band k+1's best (rank
    // cut on the micro-unit key; ties may straddle, so non-strict)
    val qu = scored.select(col("doc_id"),
        floor(col("quality_score") * 1e6).cast("long"))
      .as[(Long, Long)].collect().toMap
    val byBand = out.groupBy(_._2).view
      .mapValues(_.map(r => qu(r._1))).toMap
    for (k <- 0 until 9)
      assert(byBand(k).min >= byBand(k + 1).max,
        s"band $k not uniformly better than band ${k + 1}")
    // within a band, position order IS the salted md5 order
    def h(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"curr:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    out.groupBy(_._2).values.foreach { band =>
      val hs = band.sortBy(_._3).map(r => h(r._1)).toSeq
      assert(hs == hs.sorted, "within-band order must be the salted hash order")
    }
  }

  test("writeShards: one sorted file per shard dir, readback replays the permutation") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val dir = Files.createTempDirectory("graft_shards").toString + "/export"
    graft.ops.Sampling.writeShards(docs, "doc_id", "shuf", 4, dir)
    val expect = graft.ops.Sampling.shuffleShards(docs, "doc_id", "shuf", 4)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    (0 until 4).foreach { k =>
      val d = new java.io.File(s"$dir/shard=$k")
      val files = d.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $k must be exactly one file")
      // a single small file reads as one partition in file order: the
      // trainer's top-to-bottom stream must BE the pos order
      val rows = spark.read.parquet(files.head.toString)
        .select("doc_id", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.map(_._2).toSeq == (0L until rows.length).toSeq,
        s"shard $k in-file order is pos order, dense from 0")
      val exp = expect.filter(_._2 == k).sortBy(_._3).map(_._1).toSeq
      assert(rows.map(_._1).toSeq == exp,
        s"shard $k content replays the shuffleShards permutation")
    }
  }
}
