package graft.ops

import org.apache.spark.sql.functions._

/** Throwaway diagnostic: stage sizes of pipeline_train_export_at. */
object FunnelDebug {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    
    val docs = graft.util.Tables(s, d, "documents")
    val batch = docs.filter(col("doc_id") % 10 === 0)
    println(s"batch=${batch.count()}")
    val scored = TextAnalysis.quality(batch, "text")
      .withColumn("score_u", floor(col("quality_score") * 1e6).cast("long"))
    val gated = Sampling.qualityGate(scored, "doc_id", "source",
      col("score_u"), keepBps = 7000)
    println(s"gated=${gated.count()}")
    val tIdx = LlmShared.jaccardAtIndexFor(s, d)
    val pIdx = LlmShared.exportPhashIndexFor(s, d)
    val textDrop = Dedup.jaccardAgainstIndexAt(s, tIdx, version = 2L,
        batch, "doc_id", "text", n = 3, threshold = 0.8)
      .select(col("i").as("doc_id")).distinct()
    println(s"textDrop=${textDrop.count()}")
    val imgDrop = Multimodal.phashAgainstIndexAt(s, pIdx, version = 2L,
        Multimodal.asPhashImageTable(batch), maxDist = 1)
      .select(col("j").as("doc_id")).distinct()
    println(s"imgDrop=${imgDrop.count()}")
    val kept = gated.join(textDrop, Seq("doc_id"), "left_anti")
      .join(imgDrop, Seq("doc_id"), "left_anti")
    println(s"kept=${kept.count()}")
  }
}
