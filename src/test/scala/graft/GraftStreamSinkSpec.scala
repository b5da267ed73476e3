package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Compaction, GraftStreamSink}

/** The streaming WRITE face ([[graft.sources.GraftStreamSink]]):
  * writeStream.format("graft") must publish one generation per batch,
  * skip redelivered batches (effectively-once via the in-generation
  * sidecar), survive an interleaved non-sink append without losing the
  * dedup memory, and publish replacement snapshots in Complete mode.
  */
class GraftStreamSinkSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("append sink: generation per batch, checkpoint resume, redelivery skipped, sidecar survives INSERT INTO") {
    val root = tmp("graft_ssink")
    val t = root + "/tbl"; val ckpt = root + "/ckpt"
    val input = MemoryStream[(Long, Long)]
    def drainTo(hi: Int): Unit = {
      val q = input.toDF().toDF("k", "v")
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(t)
      q.awaitTermination(120000L)
      assert(!q.isActive && q.exception.isEmpty, s"${q.exception}")
    }
    input.addData((0 until 5).map(i => (i.toLong, i * 2L)))
    drainTo(5)
    assert(Compaction.generations(spark, t) == Seq(1L))
    assert(Compaction.readTable(spark, t).count() == 5L)
    // batch 2 resumes from the checkpoint and APPENDS a generation
    input.addData(Seq((100L, 1L), (101L, 2L)))
    drainTo(7)
    assert(Compaction.generations(spark, t) == Seq(1L, 2L))
    assert(Compaction.readTable(spark, t).count() == 7L)
    // REDELIVERY: calling the sink again with an already-published
    // batch id is a no-op (crash between sink commit and offset commit)
    val sink = new GraftStreamSink(spark, t,
      org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(1L, Seq((100L, 1L), (101L, 2L)).toDF("k", "v"))
    assert(Compaction.readTable(spark, t).count() == 7L,
      "a redelivered batch must not re-apply")
    assert(Compaction.generations(spark, t) == Seq(1L, 2L))
    // a NON-sink append in between must carry the sink's batch marker
    // forward, or the next redelivery would double-apply
    Compaction.appendGen(Seq((500L, 0L)).toDF("k", "v"), t)
    sink.addBatch(1L, Seq((100L, 1L), (101L, 2L)).toDF("k", "v"))
    assert(Compaction.readTable(spark, t).count() == 8L,
      "redelivery after an interleaved INSERT must still be skipped")
    // ... while a genuinely NEW batch applies
    sink.addBatch(2L, Seq((200L, 9L)).toDF("k", "v"))
    assert(Compaction.readTable(spark, t).count() == 9L)
    // the streamed table is a first-class graft table: time travel
    assert(Compaction.readTableAt(spark, t,
      Compaction.generations(spark, t).min).count() == 8L)
  }

  test("complete sink: each batch is the replacement snapshot (streaming aggregation)") {
    val root = tmp("graft_ssinkc")
    val t = root + "/tbl"; val ckpt = root + "/ckpt"
    val input = MemoryStream[(String, Long)]
    def drain(): Unit = {
      val q = input.toDF().toDF("g", "v")
        .groupBy("g").agg(sum("v").as("total"))
        .writeStream.format("graft").outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(t)
      q.awaitTermination(120000L)
      assert(!q.isActive && q.exception.isEmpty, s"${q.exception}")
    }
    input.addData(Seq(("a", 1L), ("b", 2L)))
    drain()
    assert(Compaction.readTable(spark, t).orderBy("g").as[(String, Long)]
      .collect().toSeq == Seq(("a", 1L), ("b", 2L)))
    input.addData(Seq(("a", 10L), ("c", 5L)))
    drain()
    assert(Compaction.readTable(spark, t).orderBy("g").as[(String, Long)]
      .collect().toSeq == Seq(("a", 11L), ("b", 2L), ("c", 5L)),
      "Complete mode publishes the whole aggregation state as the snapshot")
    assert(Compaction.generations(spark, t).size == 2)
  }

  test("misuse is loud: partitionBy and Update mode are rejected") {
    val input = MemoryStream[(Long, Long)]
    val e1 = intercept[Exception](input.toDF().toDF("k", "v")
      .writeStream.format("graft").partitionBy("k")
      .option("checkpointLocation", tmp("ck1"))
      .start(tmp("graft_ssink_bad") + "/t"))
    assert(e1.getMessage.contains("partitionBy"), e1.getMessage)
    val e2 = intercept[Exception](input.toDF().toDF("k", "v")
      .writeStream.format("graft").outputMode("update")
      .option("checkpointLocation", tmp("ck2"))
      .start(tmp("graft_ssink_bad2") + "/t"))
    assert(e2.getMessage.contains("keyed upsert"), e2.getMessage)
  }
}
