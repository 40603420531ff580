package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window document chunking — the restructuring step between a raw
  * corpus and a context-window-bounded training set: each document becomes
  * ceil(max(len-size,0)/stride)+1 overlapping windows of `size` tokens,
  * starting every `stride` tokens (overlap = size - stride preserves
  * cross-boundary context; the final window is the only short one).
  *
  * Purely map-side: tokenize → per-row window-start list → explode →
  * slice. No shuffle, no state — the operator scales with scan bandwidth,
  * and chunk rows inherit the input partitioning (a downstream
  * repartition, if any, is the caller's packing/shuffling decision —
  * compose with `Mixing.packSequences` / `q_epoch_shuffle`). Chunk
  * identity is (doc_id, chunk_id) with chunk_id dense from 0, so chunking
  * is deterministic and re-runs land identical rows (idempotent appends
  * compose the same way as the weather dedup path).
  */
object Chunking {

  /** Number of sliding windows over `len` tokens: one when len ≤ size,
    * else ceil((len - size) / stride) + 1 — every token is covered and
    * the last window starts within stride of len - size. */
  def nChunks(len: Column, size: Int, stride: Int): Column = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size: size=$size stride=$stride")
    when(len <= size, lit(1L))
      .otherwise(ceil((len - size).cast("double") / stride) + 1L)
      .cast("long")
  }

  /** Explode `df` into one row per chunk: (keep..., chunk_id, chunk —
    * the token-array slice). `tokens` must be an array<string> column. */
  def chunkTokens(df: DataFrame, tokens: Column, size: Int, stride: Int,
                  keep: Seq[Column]): DataFrame = {
    val n = nChunks(coalesce(org.apache.spark.sql.functions.size(tokens), lit(0)),
      size, stride)
    df.select(keep :+ tokens.as("_toks") :+
        explode(sequence(lit(0L), n - 1L)).as("chunk_id"): _*)
      .withColumn("chunk",
        slice(col("_toks"), (col("chunk_id") * stride + 1L).cast("int"),
          lit(size)))
      .drop("_toks")
  }
}
