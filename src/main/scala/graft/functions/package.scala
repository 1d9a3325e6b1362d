package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

package object functions {

  /** 60-bit SimHash of a token array (custom codegen'd expression). */
  def simhash60(tokens: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(tokens)))

  /** Distinct word-shingle 60-bit hashes of a token array (custom
    * codegen'd expression; value-identical to
    * `transform(array_distinct(shinglesFromTokens(toks, n)), h64)`). */
  def shingleHash64(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHash64(ColumnBridge.expression(tokens), n))

  /** Positional (order-preserving, duplicate-keeping) word-shingle 60-bit
    * hashes — the sequence winnowing's sliding window slides over
    * (value-identical to `transform(shinglesFromTokens(toks, n), h64)`). */
  def shingleHashSeq64(tokens: Column, n: Int): Column =
    ColumnBridge.column(
      ShingleHash64(ColumnBridge.expression(tokens), n, distinct = false))

  /** MinHash signature over an array<long> of shingle hashes: per seed,
    * min of hash XOR seed — one codegen'd k×n primitive loop
    * (value-identical to
    * `transform(seeds, s -> array_min(transform(h, x -> x ^ s)))`). */
  def minhashSig(hashes: Column, seeds: Seq[Long]): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), seeds))

  /** Sequential-fold dot product of two array<double> columns (custom
    * codegen'd expression; bit-identical to aggregate(zip_with(...))). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Per-row term frequencies (array<string> → array<struct<token,tf>>,
    * one codegen'd pass) — deletes the per-doc exchange from tf
    * pipelines. See [[TokenCounts]]. */
  def tokenCounts(tokens: Column): Column =
    ColumnBridge.column(TokenCounts(ColumnBridge.expression(tokens)))

  /** Jaro–Winkler similarity (DuckDB/RapidFuzz-pinned semantics,
    * codegen'd). See [[JaroWinkler]]. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Bounded-heap top-k aggregate over a struct column (largest-first;
    * struct field order is the sort order). See [[TopKStructs]]. */
  def topK(sortStruct: Column, k: Int): Column =
    ColumnBridge.column(
      TopKStructs(ColumnBridge.expression(sortStruct), k).toAggregateExpression())

  /** Unicode normalization (`nfc` | `nfkc` | `strip_accents`) as one
    * codegen'd pass; `strip_accents` matches utf8proc/DuckDB semantics. */
  def normalizeText(s: Column, mode: String): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(s), mode))

  /** Distinct sliding-window minima of an array<long> column (custom
    * codegen'd expression; value-identical to
    * `array_distinct(transform(sequence(...), i => array_min(slice(h, i, w))))`). */
  def windowMin64(hashes: Column, w: Int): Column =
    ColumnBridge.column(WindowMin64(ColumnBridge.expression(hashes), w))
}
