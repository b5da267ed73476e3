package graft.ops

import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** Driver registry for the LLM-data-pipeline operators (dedup,
  * similarity search, text analysis, multimodal) over the `documents`
  * and `embeddings` tables.
  *
  * Oracle notes: cosine is recomputed in DuckDB with explicit
  * per-element DOUBLE casts (list_sum is sequential) so scores are
  * bit-identical to the native CosineSimilarity kernel; DuckDB's own
  * list_cosine_similarity accumulates in float32 and drifts ~1e-7.
  * MinHash-LSH and SimHash are approximate-by-construction → rows-only
  * here, recall-tested in DedupSpec.
  */
object LlmQueries {

  /** The aggregate registry — the domain split (round 10) keeps this
    * object as the single stable entry point SparkEntry concatenates.
    */
  val queries: Seq[GQuery] =
    LlmDedupQueries.queries ++
      LlmEmbedQueries.queries ++
      LlmSampleQueries.queries ++
      LlmTextQueries.queries ++
      LlmMultimodalQueries.queries ++
      LlmPipelineQueries.queries
}
