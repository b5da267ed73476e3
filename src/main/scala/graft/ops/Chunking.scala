package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.{GQuery, Tables}

/** RAG-style document chunking: split each document into fixed-size
  * character windows with overlap, keeping per-chunk provenance
  * (doc id, chunk index, char offsets). The dual of
  * [[Packing.concatChunk]] — packing concatenates docs into model-sized
  * sequences for pretraining; chunking splits docs into retrieval units.
  *
  * Map-only by construction: `sequence` generates chunk starts per row,
  * `posexplode` fans them out, `substring` slices — pure codegen'd
  * column expressions, zero shuffles, so a 100 TB corpus chunks at scan
  * speed and the output partitioning inherits the input's.
  *
  * Stride contract: chunks start every `size - overlap` chars; the last
  * chunk may be short but is never empty; a document shorter than
  * `size` yields exactly one chunk. Offsets are 1-based (SQL substring
  * convention) so the oracle is a verbatim twin.
  */
object Chunking {

  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < size, s"need 0 <= overlap < size")
    val stride = size - overlap
    val t = col(textCol)
    // last start: the largest k*stride+1 that still begins inside the
    // text AND is not fully covered by the previous chunk; an empty
    // document yields NO chunks (the never-empty-chunk contract)
    val starts = sequence(lit(1),
      greatest(lit(1), length(t) - lit(size) + lit(stride)), lit(stride))
    docs
      .filter(length(t) > 0)
      .select(col(idCol).as("doc_id"), t.as("__t"), explode(starts).as("start"))
      .select(
        col("doc_id"),
        ((col("start") - 1) / stride).cast("int").as("chunk_id"),
        col("start"),
        least(col("start") + (size - 1), length(col("__t"))).as("end"),
        substring(col("__t"), col("start"), lit(size)).as("chunk"))
    // NO ordering here: chunking is map-only and must stay shuffle-free
    // (the registered query adds its own deterministic ORDER BY)
  }

  def chunkOracleSql(size: Int, overlap: Int): String = {
    val stride = size - overlap
    s"""SELECT doc_id,
        CAST((start - 1) / $stride AS INT) AS chunk_id,
        CAST(start AS INT) AS start,
        CAST(least(start + ${size - 1}, length(text)) AS INT) AS "end",
        substring(text, CAST(start AS INT), $size) AS chunk
      FROM (
        SELECT doc_id, text,
               unnest(range(1, greatest(1, length(text) - $size + $stride) + 1, $stride)) AS start
        FROM documents WHERE length(text) > 0)
      ORDER BY doc_id, chunk_id"""
  }

  val queries: Seq[GQuery] = Seq(
    GQuery("text_chunk_overlap",
      (s, d) => chunk(Tables(s, d, "documents"), "doc_id", "text", 120, 20)
        .orderBy(col("doc_id"), col("chunk_id")),
      Some(chunkOracleSql(120, 20))))
}
