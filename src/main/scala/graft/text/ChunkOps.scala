package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size document chunking with overlap — the
  * retrieval/embedding-pipeline step (RAG corpora, long-document
  * embedding, context-window packing for encoders): every document
  * is cut into windows of `chunkTokens` tokens starting every
  * `stride` tokens, so consecutive chunks overlap by
  * chunkTokens − stride. The tail chunk is ragged (shorter than
  * `chunkTokens`); tokenless documents emit nothing. Chunk identity
  * is (doc id, chunk_idx), deterministic on any partitioning —
  * downstream embedding jobs can re-derive it forever.
  *
  * Scale shape: one narrow pass — the token array is STAGED once
  * (the winnowFingerprints contract: a materialized projection the
  * explode and slices index into, instead of re-tokenizing per
  * chunk), then a `sequence` explode and per-chunk `slice`. No
  * shuffle, no join; the chunk stream rides the scan, and output
  * volume is input tokens × (chunkTokens/stride) by construction.
  *
  * Reference scope: the reference pipeline has no chunking (it is a
  * flux-tower ETL); this extends the engine for the large-scale
  * training-data use cases in the build brief.
  */
object ChunkOps {

  /** Chunk `textCol` into overlapping token windows. Output: one row
    * per chunk — (idCol, chunk_idx, n_tokens, chunk_text). The chunk
    * count per doc is floor((n−1)/stride)+1, so every token is
    * covered and the last window starts before position n.
    *
    * All windows are assembled per DOC inside the fused
    * [[graft.functions.ChunkWindowsExpr]] kernel and only the small
    * chunk structs are exploded (the relational alternatives carry
    * the whole token array through the Generate or re-enter HOF
    * interpretation — measured 3–10× slower; see the kernel doc). */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), posexplode(
        graft.functions.ChunkKernel.windows(col("__tk"), chunkTokens,
          stride)))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        col("col.n").as("n_tokens"), col("col.t").as("chunk_text"))
}
