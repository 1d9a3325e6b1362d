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
