package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level pipeline operators a training-data pipeline needs
  * beyond dedup: deterministic sampling (train/eval splits that are
  * reproducible across engines, runs, and repartitioning — no `rand()`)
  * and vocabulary extraction. All hashing is md5-derived like the rest
  * of the engine, so every operator has an exact DuckDB oracle. */
object CorpusOps {

  /** Salted per-row hash in [0, 100) deciding sample membership. */
  private def samplePct(idCol: String, salt: String) =
    pmod(h64(concat_ws("-", lit(salt), col(idCol).cast("string"))), lit(100))

  /** Keep ~`percent`% of rows, chosen by id hash: a pure filter (no
    * shuffle, no state), pushed to the scan at any scale. */
  def hashSample(df: DataFrame, idCol: String, percent: Int,
      salt: String = "graft-sample"): DataFrame =
    df.filter(samplePct(idCol, salt) < percent)

  /** Per-stratum sampling rates (e.g. languages at different budgets);
    * strata not in `rates` fall back to `defaultPercent`. Same pure-
    * filter shape as [[hashSample]]. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultPercent: Int = 0,
      salt: String = "graft-sample"): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPercent)) { case (acc, (stratum, p)) =>
      when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(samplePct(idCol, salt) < pct)
  }

  /** Fixed-size deterministic per-group sample: the `n` rows of each
    * group with the smallest salted id-hash (id tiebreak). Unlike
    * [[stratifiedSample]] (rate-based, pure filter) this guarantees an
    * exact per-group count — the eval-set builder. One shuffle on the
    * group column; the window is a plain ROW_NUMBER over (hash, id), no
    * global sort. */
  def groupSample(df: DataFrame, idCol: String, groupCol: String, n: Int,
      salt: String = "graft-sample"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(h64(concat_ws("-", lit(salt), col(idCol).cast("string"))),
        col(idCol))
    df.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") <= n)
      .drop("graft_rn")
  }

  /** Fixed-window token chunking with overlap — the pass that turns
    * documents into training-sized pieces. Chunks start every `stride`
    * tokens (stride = size - overlap) and take `size` tokens each; the
    * final partial chunk is kept. Pure per-row explode — no shuffle, no
    * state, parallel at any scale; emits (id, chunk_id, n_chunk_tokens,
    * chunk_text). Empty documents yield one empty chunk. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    val toks = tokens(col(textCol))
    val starts = sequence(lit(1), greatest(org.apache.spark.sql.functions.size(toks), lit(1)), lit(stride))
    df.select(col(idCol), posexplode(transform(starts,
        st => slice(toks, st, lit(size)))).as(Seq("chunk_id", "graft_chunk")))
      .select(col(idCol), col("chunk_id"),
        org.apache.spark.sql.functions.size(col("graft_chunk")).as("n_chunk_tokens"),
        concat_ws(" ", col("graft_chunk")).as("chunk_text"))
  }

  /** Smoothed TF-IDF weights per (doc, token):
    * `tf * (ln((1 + N) / (1 + df)) + 1)`. Single explode; the
    * (doc, token) pre-aggregate is materialized by localCheckpoint (not
    * persist — the caller owns the action, so a pinned cache entry could
    * never be unpersisted) because it feeds both the doc-frequency
    * aggregate and the final join. Spec-verified only: `ln` is not
    * bit-portable across engines, so this op deliberately has no exact
    * SQL oracle — [[tfIdfScaled]] is the gate-checkable variant. */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perDoc = df
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val nDocs = df.select(col(idCol)).distinct().count()
    val docFreq = perDoc.groupBy("token").agg(count(lit(1)).as("df"))
    perDoc.join(docFreq, Seq("token"))
      .select(col("doc"), col("token"),
        (col("tf") * (log(lit(nDocs + 1.0) / (col("df") + 1.0)) + 1.0)).as("tf_idf"))
  }

  /** Fixed-point TF-IDF surrogate with an EXACT cross-engine oracle:
    * `tf * ((scale * (N + 1)) div (df + 1))` — all-integer arithmetic,
    * so unlike the `ln`-based [[tfIdf]] it hash-compares across engines.
    * Per token it is a strictly decreasing function of df, so per-token
    * rankings (and any df-threshold filter) match the smoothed-idf
    * ordering; only the absolute scale differs. Same physical shape as
    * [[tfIdf]]. */
  def tfIdfScaled(df: DataFrame, idCol: String, textCol: String,
      scale: Long = 1000000L): DataFrame = {
    val perDoc = df
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val nDocs = df.select(col(idCol)).distinct().count()
    val docFreq = perDoc.groupBy("token").agg(count(lit(1)).as("df"))
    // true integer division (DIV), not double-divide-then-cast: the
    // rounded double quotient can land one above the floor, and the
    // oracle's `//` is floor division
    perDoc.join(docFreq, Seq("token"))
      .select(col("doc"), col("token"), col("tf"), col("df"),
        (col("tf") * expr(s"${scale * (nDocs + 1)}L DIV (df + 1)"))
          .as("tf_idf_scaled"))
  }

  /** Token vocabulary with global occurrence and document frequencies.
    * One explode feeding two hash aggregates — the (doc, token) pre-
    * aggregate gives exact doc frequencies WITHOUT a count-distinct
    * expand, and its map-side combine bounds the shuffle by the distinct
    * (doc, token) pairs, not the token stream. Top-k is a distributed
    * TakeOrdered, tiebroken by token for determinism. */

  def vocabulary(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val perDoc = df
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
    perDoc.groupBy("token")
      .agg(sum("tf").as("n_occurrences"), count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)
  }
}
