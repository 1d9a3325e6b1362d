package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + dedup for web-scraped corpora (SURVEY.md §7).
  *
  * A crawl sees the same page under many spellings — scheme/host case,
  * `www.` prefixes, default ports, tracking query parameters, parameter
  * order, fragments, trailing slashes. Canonicalizing before dedup is
  * the first collapse a web-scale pipeline runs (cheaper than any
  * content hash: it needs only the URL string) and typically removes a
  * double-digit share of fetches before text processing starts.
  *
  * Scale shape: [[canonicalizeUrl]] is a pure projection (regex chain +
  * one bounded array sort over the query params — all codegen'd
  * built-ins, no UDF); [[urlDedup]] adds ONE hash-shuffle carrying
  * (canonical_url, id) pairs. Page content never moves.
  */
object Urls {

  /** Query parameters that never change page identity. */
  private val Tracking = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="

  /** Canonical form of an absolute http(s) URL:
    *   - fragment removed
    *   - scheme + authority lowercased (path/query case preserved —
    *     paths are case-sensitive per RFC 3986)
    *   - leading `www.` stripped
    *   - default ports (`:80` http, `:443` https) stripped
    *   - tracking params (utm_*, fbclid, gclid, ref) dropped
    *   - remaining query params sorted for order-independence
    *   - trailing slashes on the path stripped
    * Non-URL strings pass through with only the generic steps (trim,
    * fragment/query handling) applied — the authority regex simply
    * fails to match and the string is treated as all-path. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*", "")
    val path0 = regexp_replace(noFrag, "\\?.*", "")
    val qs = when(instr(noFrag, "?") > 0,
      noFrag.substr(instr(noFrag, "?") + 1, length(noFrag))).otherwise(lit(""))
    val auth0 = regexp_extract(path0, "^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?]*", 0)
    val rest = path0.substr(length(auth0) + 1, length(path0))
    val auth = regexp_replace(
      regexp_replace(
        regexp_replace(lower(auth0), "^(https?://)www\\.", "$1"),
        "^(http://[^:/]+):80$", "$1"),
      "^(https://[^:/]+):443$", "$1")
    val p = regexp_replace(rest, "/+$", "")
    val q2 = array_join(
      array_sort(filter(split(qs, "&"),
        t => t =!= lit("") && !t.rlike(Tracking))), "&")
    concat(auth, p, when(q2 === "", lit("")).otherwise(concat(lit("?"), q2)))
  }

  /** Collapse rows to one representative per canonical URL: smallest id
    * wins, copy count kept for audit. One projection + one hash-shuffle
    * of (canonical_url, id) with map-side partial aggregation. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(canonicalizeUrl(col(urlCol)).as("canonical_url"), col(idCol))
      .groupBy("canonical_url")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
}
