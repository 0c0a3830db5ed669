package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size document chunking with overlap — the
  * retrieval/embedding-pipeline step (RAG corpora, long-document
  * embedding, context-window packing for encoders): every document
  * is cut into windows of `chunkTokens` tokens starting every
  * `stride` tokens, so consecutive chunks overlap by
  * chunkTokens − stride; windows stop at the first one that reaches
  * the doc end (no suffix-duplicate tail chunks). The tail chunk is
  * ragged (shorter than `chunkTokens`); tokenless documents emit
  * nothing. Chunk identity is (doc id, chunk_idx), deterministic on
  * any partitioning — downstream embedding jobs can re-derive it
  * forever.
  *
  * Scale shape: one narrow pass — all of a doc's windows are
  * assembled inside the fused [[graft.functions.ChunkWindowsExpr]]
  * kernel and only the small chunk structs explode. No shuffle, no
  * join; the chunk stream rides the scan, and output volume is
  * input tokens × (chunkTokens/stride) by construction. (The
  * measured alternatives and their defect classes are in the kernel
  * scaladoc and BENCH_NOTES.)
  *
  * Reference scope: the reference pipeline has no chunking (it is a
  * flux-tower ETL); this extends the engine for the large-scale
  * training-data use cases in the build brief.
  */
object ChunkOps {

  /** Chunk `textCol` into overlapping token windows. Output: one row
    * per chunk — (idCol, chunk_idx, n_tokens, chunk_text). Chunk
    * count per doc: 1 when n ≤ chunkTokens, else
    * ceil((n−chunkTokens)/stride)+1 — every token covered, no
    * suffix-duplicate tails (see the kernel scaladoc). */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), posexplode(
        graft.functions.ChunkKernel.windows(col("__tk"), chunkTokens,
          stride)))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        col("col.n").as("n_tokens"), col("col.t").as("chunk_text"))
}
