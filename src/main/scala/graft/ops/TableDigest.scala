package graft.ops

import graft.functions.TextFunctions.h64
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-insensitive table digest: the exact sum of per-row 60-bit md5
  * hashes plus the row count. Comparing two tables costs one pruned
  * scan each (map-side partial sums, no shuffle of rows) and exchanges
  * a single number — the cheap pre-check before a full row-level diff
  * at 100 TB. Row encoding matches the diff engine's synthesized key
  * (`md5(concat_ws("|", cols AS string))`).
  *
  * Cross-engine (DuckDB-oracle) parity holds for integer / string /
  * boolean columns; double→string and timestamp→string formatting is
  * engine-specific, so hash such columns via an explicit portable
  * encoding (e.g. `unix_micros`) before digesting across engines.
  * Within Spark any column set digests consistently. */
object TableDigest {

  /** 1-row DataFrame (n_rows, digest) over the given columns (all
    * columns when empty). */
  def digest(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val use = if (cols.nonEmpty) cols else df.schema.fieldNames.toSeq
    val rowHash = h64(concat_ws("|", use.map(c => col("`" + c + "`").cast("string")): _*))
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(rowHash.cast("decimal(38,0)")).as("digest"))
  }
}
