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

  /** Token vocabulary with global occurrence and document frequencies.
    * One explode feeding two hash aggregates — the (doc, token) pre-
    * aggregate gives exact doc frequencies WITHOUT a count-distinct
    * expand, and its map-side combine bounds the shuffle by the distinct
    * (doc, token) pairs, not the token stream. Top-k is a distributed
    * TakeOrdered, tiebroken by token for determinism. */
  /** Smoothed TF-IDF weights per (doc, token):
    * `tf * (ln((1 + N) / (1 + df)) + 1)`. Same single-explode shape as
    * [[vocabulary]]; the (doc, token) pre-aggregate is persisted because
    * it feeds both the doc-frequency aggregate and the final join.
    * Spec-verified only: `ln` is not bit-portable across engines, so
    * this op deliberately has no exact SQL oracle. */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perDoc = df
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = df.select(col(idCol)).distinct().count()
    val docFreq = perDoc.groupBy("token").agg(count(lit(1)).as("df"))
    perDoc.join(docFreq, Seq("token"))
      .select(col("doc"), col("token"),
        (col("tf") * (log(lit(nDocs + 1.0) / (col("df") + 1.0)) + 1.0)).as("tf_idf"))
  }

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
