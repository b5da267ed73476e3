package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cluster

/** Randomized correctness guard for connected components against an
  * in-memory union-find reference — the property that would have
  * caught the r2–r4 diameter-cap bug (hash-min propagation silently
  * reporting a non-fixpoint on chain graphs) on day one. Seeded, so
  * deterministic run to run; shapes chosen adversarially: long chains
  * (diameter ≫ any plausible round cap), dense blobs, stars, and mixed
  * sparse graphs.
  */
class CcPropertySpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min node of the component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }.toMap
  }

  private def check(edges: Seq[(Long, Long)], tag: String): Unit = {
    val expect = unionFind(0, edges)
    val got = Cluster.connectedComponents(edges.toDF("i", "j"))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("cluster"))
      .toMap
    assert(got == expect, s"$tag: engine CC != union-find reference " +
      s"(${got.size} vs ${expect.size} nodes; " +
      s"diff=${(got.toSet diff expect.toSet).take(5)})")
  }

  test("long chains: diameter far beyond any round cap") {
    // a 500-node path with shuffled ids so the min sits mid-chain
    val rnd = new Random(7)
    val ids = rnd.shuffle((0L until 500L).toVector)
    check(ids.sliding(2).map(p => (p(0), p(1))).toSeq, "chain-500")
    // two disjoint chains plus a bridge
    val a = (1000L until 1200L).map(i => (i, i + 1))
    val b = (2000L until 2200L).map(i => (i, i + 1))
    check(a ++ b :+ (1100L, 2100L), "bridged-chains")
  }

  test("tail contraction schedule (rejected experiment knob): correct on the oriented-chain counterexample class") {
    // Round-13 experiment: smallStar-only tail rounds once the edge
    // count stops shrinking — measured strictly worse (the mandatory
    // full-alternation verify round adds a round everywhere, PLANS.md
    // table) and REJECTED as default, but the knob stays reproducible,
    // so its correctness must stay pinned: a smallStar fixpoint is NOT
    // the CC fixpoint on oriented chains, and the verify round is what
    // makes the schedule sound. Chains + mixed shapes, both schedules,
    // identical labels.
    val rnd = new Random(11)
    val ids = rnd.shuffle((0L until 300L).toVector)
    val chain = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val mixed = chain ++ (500L until 540L).map(i => (i, i + 1)) :+
      (ids.head, 520L)
    Cluster.tailScheduleForTest = true
    try {
      check(chain, "tail-chain-300")
      check(mixed, "tail-mixed")
    } finally Cluster.tailScheduleForTest = false
  }

  test("random sparse, dense and star graphs match union-find") {
    val rnd = new Random(42)
    for (trial <- 1 to 8) {
      val n = 50 + rnd.nextInt(200)
      val m = n / 2 + rnd.nextInt(2 * n)
      val edges = (0 until m).map { _ =>
        val a = rnd.nextInt(n).toLong
        var b = rnd.nextInt(n).toLong
        if (a == b) b = (b + 1) % n
        (a, b)
      }.filter(e => e._1 != e._2)
      check(edges, s"random-$trial(n=$n,m=$m)")
    }
    // stars: hub larger than every leaf, and hub smaller
    check((1L to 60L).map(i => (1000L, 1000L + i)), "star-big-hub")
    check((1L to 60L).map(i => (0L, 100L + i)), "star-small-hub")
  }

  test("incrementalComponents ≡ full recompute on random edge splits") {
    val rnd = new Random(77)
    for (trial <- 0 until 5) {
      val n = 60 + rnd.nextInt(120)
      val edges = (0 until n * 2).map { _ =>
        val a = rnd.nextInt(n).toLong
        var b = rnd.nextInt(n).toLong
        if (a == b) b = (b + 1) % n
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      // split: ~70% historical, rest arrives as the new batch (plus a
      // bridge chain through brand-new node ids to force merges across
      // components AND nodes the old labeling never saw)
      val (oldE, newE0) = edges.partition(_ => rnd.nextInt(10) < 7)
      val newE = newE0 ++ Seq((edges.head._1, 9000L), (9000L, 9001L),
        (9001L, edges.last._2))
      val oldLabels = Cluster.connectedComponents(oldE.toDF("i", "j"))
      val inc = Cluster.incrementalComponents(oldLabels, newE.toDF("i", "j"))
        .as[(Long, Long)].collect().toMap
      val full = Cluster.connectedComponents((oldE ++ newE).toDF("i", "j"))
        .as[(Long, Long)].collect().toMap
      assert(inc == full, s"trial $trial: incremental diverged from one-shot")
    }
  }

  test("spark.graft.checkpointDir toggles RELIABLE checkpointing: identical labels, files actually land in the dir") {
    // the 100-TB deployment knob (round-12): localCheckpoint blocks die
    // with their executor, so long CC loops opt into reliable
    // checkpoints by conf — results must be byte-identical either way
    val rnd = new Random(42)
    val n = 150
    val edges = ((0 until n * 2).map { _ =>
      val a = rnd.nextInt(n).toLong
      var b = rnd.nextInt(n).toLong
      if (a == b) b = (b + 1) % n
      (math.min(a, b), math.max(a, b))
    } ++ (0 until 40).map(k => (k.toLong + 500L, k.toLong + 501L)))
      .filter(e => e._1 != e._2).distinct
    val local = Cluster.connectedComponents(edges.toDF("i", "j"))
      .as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ccckpt").toString
    spark.conf.set(Cluster.CheckpointDirConf, dir)
    try {
      val reliable = Cluster.connectedComponents(edges.toDF("i", "j"))
        .as[(Long, Long)].collect().toMap
      assert(reliable == local,
        "reliable-checkpoint CC diverged from the localCheckpoint path")
      // the incremental merge loop runs through the same materializer
      val inc = Cluster.incrementalComponents(
          edges.take(edges.size / 2).toDF("i", "j")
            .transform(df => Cluster.connectedComponents(df)),
          edges.drop(edges.size / 2).toDF("i", "j"))
        .as[(Long, Long)].collect().toMap
      assert(inc == local, "reliable-path incremental merge diverged")
      // and the checkpoints really were RELIABLE ones: RDD checkpoint
      // files landed under the configured dir
      import scala.jdk.CollectionConverters._
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .iterator.asScala.filter(java.nio.file.Files.isRegularFile(_))
        .take(1).toSeq
      assert(files.nonEmpty,
        s"no checkpoint files under $dir — the conf did not take effect")
    } finally spark.conf.unset(Cluster.CheckpointDirConf)
  }
}
