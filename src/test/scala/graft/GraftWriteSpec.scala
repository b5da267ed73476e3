package graft

import java.util.concurrent.CyclicBarrier

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

/** The generation-publishing WRITE face (r16 verdict #1): INSERT INTO
  * / df.writeTo / df.write.format("graft") must publish NEW
  * generations atomically — never mutate a published dir, never land
  * loose part-files — with the same fencing writeGen has, append cost
  * O(new data) (carried files hard-linked, not rewritten), and
  * concurrent readers pinned to old-or-new, never a mix.
  */
class GraftWriteSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, i * 2L, s"s$i")).toDF("k", "v", "s")

  spark.conf.set("spark.sql.catalog.gwr", "graft.sources.GraftCatalog")

  test("INSERT INTO publishes a new generation; INSERT OVERWRITE replaces the snapshot") {
    val t = tmp("graft_ins") + "/tbl"
    Compaction.writeGen(rows(0, 10), t) // g1
    spark.sql(s"INSERT INTO gwr.`$t` VALUES (100, 200, 's100'), (101, 202, 's101')")
    assert(Compaction.generations(spark, t) == Seq(1L, 2L))
    assert(Compaction.readTable(spark, t).count() == 12L)
    // bit-equality with the Scala append route on a twin table
    val twin = tmp("graft_ins_twin") + "/tbl"
    Compaction.writeGen(rows(0, 10), twin)
    Compaction.appendGen(Seq((100L, 200L, "s100"), (101L, 202L, "s101"))
      .toDF("k", "v", "s"), twin)
    assert(Compaction.readTable(spark, t).orderBy("k").collect().toSeq ==
      Compaction.readTable(spark, twin).orderBy("k").collect().toSeq)
    // the old snapshot is still time-travel readable (retention window)
    assert(Compaction.readTableAt(spark, t, 1L).count() == 10L)
    // INSERT OVERWRITE = the replacement snapshot, as a generation
    spark.sql(s"INSERT OVERWRITE gwr.`$t` VALUES (7, 7, 's7')")
    assert(Compaction.readTable(spark, t).count() == 1L)
    assert(Compaction.generations(spark, t) == Seq(2L, 3L))
  }

  test("df.writeTo(catalog table).append() and bootstrap via first INSERT") {
    val t = tmp("graft_wto") + "/tbl"
    Compaction.writeGen(rows(0, 5), t)
    rows(5, 9).writeTo(s"gwr.`$t`").append()
    assert(Compaction.readTable(spark, t).count() == 9L)
    // fresh root: the first INSERT bootstraps generation 1
    val fresh = tmp("graft_boot") + "/tbl"
    spark.sql(s"INSERT INTO gwr.`$fresh` VALUES (1, 2, 'a'), (3, 4, 'b')")
    assert(Compaction.generations(spark, fresh) == Seq(1L))
    assert(Compaction.readTable(spark, fresh).count() == 2L)
    // and the bootstrapped table keeps appending normally
    spark.sql(s"INSERT INTO gwr.`$fresh` VALUES (5, 6, 'c')")
    assert(Compaction.readTable(spark, fresh).count() == 3L)
  }

  test("append is O(new data): carried files are hard links, not rewrites") {
    val t = tmp("graft_link") + "/tbl"
    Compaction.writeGen(rows(0, 1000).repartition(4), t) // g1: 4 files
    Compaction.appendGen(rows(1000, 1002), t)            // g2
    val g1 = new java.io.File(t, "g000000001")
    val g2 = new java.io.File(t, "g000000002")
    val dataFiles = (d: java.io.File) => d.listFiles.toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    val carried = dataFiles(g1).map(_.getName).toSet
      .intersect(dataFiles(g2).map(_.getName).toSet)
    assert(carried.size == 4, s"all 4 g1 part files must carry: $carried")
    carried.foreach { n =>
      assert(java.nio.file.Files.isSameFile(
          new java.io.File(g1, n).toPath, new java.io.File(g2, n).toPath),
        s"$n must be a hard link (same inode), not a byte copy")
    }
    assert(dataFiles(g2).size > 4, "the fresh rows land as new part files")
    assert(Compaction.readTable(spark, t).count() == 1002L)
    // pruning g1 later must not damage g2's linked bytes
    Compaction.writeGen(rows(0, 1).toDF("k", "v", "s"), t) // g3: g1 prunes
    assert(!g1.exists, "g1 left the retention window")
    assert(Compaction.readTableAt(spark, t, 2L).count() == 1002L,
      "g2's hard-linked files must survive g1's deletion")
  }

  test("a reader resolved before an INSERT keeps its snapshot; a new read sees the append") {
    val t = tmp("graft_iso") + "/tbl"
    Compaction.writeGen(rows(0, 10), t)
    val before = spark.read.format("graft").load(t) // resolves g1 NOW
    spark.sql(s"INSERT INTO gwr.`$t` VALUES (999, 0, 'x')")
    assert(before.count() == 10L,
      "a pre-insert reader scans the generation it resolved — old, not mixed")
    assert(spark.read.format("graft").load(t).count() == 11L)
  }

  test("two concurrent appends: one winner, loser fenced loudly, retry lands") {
    val t = tmp("graft_race") + "/tbl"
    Compaction.writeGen(rows(0, 10), t)
    val barrier = new CyclicBarrier(2)
    @volatile var fenced = 0
    def appendOnce(lo: Int): Unit = {
      barrier.await()
      try Compaction.appendGen(rows(lo, lo + 5), t)
      catch {
        case _: Compaction.FencedWriteException =>
          synchronized { fenced += 1 }
          Compaction.appendGen(rows(lo, lo + 5), t) // retry on new current
      }
    }
    val t1 = new Thread(() => appendOnce(100))
    val t2 = new Thread(() => appendOnce(200))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(fenced <= 1, "at most one append loses the race")
    assert(Compaction.readTable(spark, t).count() == 20L,
      "after the fenced retry BOTH appends' rows are present exactly once")
  }

  test("schema gates and flat-dir guards are loud") {
    val t = tmp("graft_schema") + "/tbl"
    Compaction.writeGen(rows(0, 5), t)
    val bad = Seq((1L, "wrong-type")).toDF("k", "v")
    val e = intercept[Exception](Compaction.appendGen(bad, t))
    assert(e.getMessage.contains("schema mismatch"), e.getMessage)
    // column ORDER is free (select-reordered before write)
    Compaction.appendGen(
      Seq(("z9", 9L, 18L)).toDF("s", "k", "v").select("s", "k", "v"), t)
    assert(Compaction.readTable(spark, t).count() == 6L)
    assert(Compaction.readTable(spark, t)
      .filter($"k" === 9L).select("s").head().getString(0) == "z9")
  }

  test("append to a partitioned snapshot falls back to rewrite (no mixed layout)") {
    val t = tmp("graft_part") + "/tbl"
    (0 until 100).map(i => (i % 4, i.toLong)).toDF("part", "v")
      .write.partitionBy("part").parquet(t)
    Compaction.toGenerational(spark, t)
    Compaction.appendGen(Seq((5, 1000L)).toDF("part", "v"), t)
    assert(Compaction.readTable(spark, t).count() == 101L)
    assert(Compaction.readTable(spark, t)
      .filter($"part" === 5).count() == 1L)
  }
}
