package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

/** The native streaming face of the change feed (r16 verdict #5):
  * `readStream.format("graft")` must deliver exactly what the
  * poll-loop ([[Compaction.changeFeedNext]]) delivers — snapshot then
  * per-publish diffs — with the CHECKPOINT as the durable cursor
  * (restart = resume), and the same loud failure when the cursor
  * generation leaves retention.
  */
class GraftStreamFeedSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("3-drain walk == poll-loop feed; checkpoint resumes; retention lag is loud") {
    val root = tmp("graft_sfeed_spec")
    val t = root + "/tbl"; val ckpt = root + "/ckpt"
    def drain(step: Int): Seq[(Long, String, Option[Long], Option[Long])] = {
      val out = root + s"/out$step"
      // foreachBatch, not the parquet file sink: its _spark_metadata
      // log is per-path while batch ids are per-checkpoint (see the
      // cdc_stream_feed scaladoc)
      val q = spark.readStream.format("graft")
        .option("keyColumns", "k").load(t)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(out); ()
        }
        .start()
      q.awaitTermination(180000L)
      assert(!q.isActive)
      spark.read.parquet(out)
        .select(col("k"), col("op"), col("before.v"), col("after.v"))
        .collect().toSeq.map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
    }
    Compaction.writeGen((0 to 4).map(n => (n.toLong, n * 2L)).toDF("k", "v"), t) // g1
    val d1 = drain(1)
    assert(d1.toSet == (0 to 4).map(n =>
      (n.toLong, "c", None, Some(n * 2L))).toSet,
      s"drain 1 is the initial snapshot, every row a create: $d1")
    // g2: update k=1, delete k=2, insert k=9
    Compaction.writeGen(Seq((0L, 0L), (1L, 99L), (3L, 6L), (4L, 8L),
      (9L, 18L)).toDF("k", "v"), t)
    val d2 = drain(2)
    assert(d2.toSet == Set(
      (1L, "u", Some(2L), Some(99L)),
      (2L, "d", Some(4L), None),
      (9L, "c", None, Some(18L))),
      s"drain 2 is the g1->g2 window, resumed from the checkpoint: $d2")
    // the stream and the poll-loop are the SAME feed: replay the walk
    // with changeFeedNext on a fresh cursor and compare window 2
    val cursor = root + "/cursor"
    val s1 = Compaction.changeFeedNext(spark, t, cursor, Seq("k")).get
    Compaction.advanceFeedCursor(spark, cursor, s1.fromGen, s1.toGen)
    // poll-loop's first window is the CURRENT snapshot (g2), not g1 —
    // it started late; the stream's drain-1 snapshot was g1. The
    // equivalence assert is on the diff window shape below.
    Compaction.writeGen((0 to 3).map(n => (n.toLong, n * 5L)).toDF("k", "v"), t) // g3
    val d3 = drain(3).toSet
    val s2 = Compaction.changeFeedNext(spark, t, cursor, Seq("k")).get
    val polled = s2.changes
      .select(col("k"), col("op"), col("before.v"), col("after.v"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(d3 == polled,
      s"stream drain and poll-loop must deliver the identical window:\n$d3\nvs $polled")
    // mis-use is loud: missing keyColumns, pins on a stream
    val e1 = intercept[Exception](spark.readStream.format("graft").load(t))
    assert(e1.getMessage.contains("keyColumns"), e1.getMessage)
    val e2 = intercept[Exception](spark.readStream.format("graft")
      .option("keyColumns", "k").option("generation", "1").load(t))
    assert(e2.getMessage.contains("do not apply to a stream"), e2.getMessage)
    // lag past retention: two more publishes retire g3 (the
    // checkpointed cursor); the next drain must fail LOUDLY through
    // readTableAt's contract, never silently re-snapshot
    Compaction.writeGen((0 to 1).map(n => (n.toLong, n * 7L)).toDF("k", "v"), t)
    Compaction.writeGen((0 to 2).map(n => (n.toLong, n * 9L)).toDF("k", "v"), t)
    assert(!Compaction.generations(spark, t).contains(3L))
    val e3 = intercept[Throwable](drain(4))
    def chain(x: Throwable): Seq[Throwable] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(e3).exists(c => Option(c.getMessage)
        .exists(_.contains("not readable"))),
      s"a lagged checkpoint must fail with the retention message: $e3")
  }
}
