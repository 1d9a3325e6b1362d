package graft

import graft.ops.Dedup

/** DuckDB SQL fragments mirroring the graft text/hash operators exactly
  * (same md5-derived hashing, same fold order, same seeds — see
  * TextFunctions/Dedup scaladoc). Used to assemble `SparkEntry.oracleSql`
  * entries for the non-trivial extension operators.
  */
object OracleSql {

  /** lower + collapse-whitespace normalization of a text expression. */
  def norm(e: String): String =
    s"lower(regexp_replace(trim($e), '\\s+', ' ', 'g'))"

  /** whitespace tokens of normalized text. */
  def toks(e: String): String =
    s"regexp_split_to_array(${norm(e)}, ' ')"

  /** portable 60-bit md5 hash of a string expression. */
  def h64(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** word n-gram shingles (space-joined) — mirrors TextFunctions.wordShingles. */
  def shingles(e: String, n: Int): String =
    s"""list_transform(
       |  range(0, greatest(len(${toks(e)}) - ${n - 1}, 1)),
       |  i -> array_to_string((${toks(e)})[(i+1):(i+$n)], ' '))""".stripMargin

  /** minhash signature as a DuckDB list literal-seeded expression. */
  def minhashSig(e: String, k: Int, n: Int): String = {
    val seeds = Dedup.minhashSeeds(k)
    val hashes = s"list_transform(${shingles(e, n)}, s -> ${h64("s")})"
    val sigs = seeds.map(seed =>
      s"list_aggregate(list_transform($hashes, h -> xor(h, ${seed}::BIGINT)), 'min')")
    sigs.mkString("[", ",\n ", "]")
  }

  /** 60-bit simhash over whitespace tokens — mirrors SimHash60.compute. */
  def simhash(e: String): String = {
    val hashes = s"list_transform(${toks(e)}, t -> ${h64("t")})"
    s"""list_reduce(list_transform(range(0, 60), j ->
       |  CASE WHEN 2 * len(list_filter($hashes, h -> (h >> j) & 1 = 1))
       |            > len($hashes)
       |       THEN (1::BIGINT << j) ELSE 0::BIGINT END),
       |  (a, b) -> a | b)""".stripMargin
  }

  /** exact word-shingle jaccard between two text expressions. */
  def jaccard(a: String, b: String, n: Int): String = {
    val sa = s"list_distinct(${shingles(a, n)})"
    val sb = s"list_distinct(${shingles(b, n)})"
    s"""(CAST(len(list_intersect($sa, $sb)) AS DOUBLE) /
       | CAST(len(list_distinct($sa || $sb)) AS DOUBLE))""".stripMargin
  }

  /** sequential-fold dot product of two DOUBLE[] expressions — mirrors
    * Similarity.dot (left fold; leading +0.0 is exact). */
  def dot(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |  i -> ($a)[i] * ($b)[i]), (x, y) -> x + y)""".stripMargin

  def cosine(a: String, b: String): String =
    s"""(CASE WHEN sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}) = 0.0 THEN 0.0
       |  ELSE ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))
       |  END)""".stripMargin

  /** stopword-hit count for one language over normalized tokens. */
  def stopwordHits(e: String, lang: String): String = {
    val words = graft.functions.TextFunctions.stopwords(lang)
      .map(w => s"'${w}'").mkString("[", ",", "]")
    s"len(list_filter(${toks(e)}, t -> list_contains($words, t)))"
  }
}
