package graft.ops

import graft.functions.TextFunctions.h64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency/cardinality sketches with EXACT cross-engine
  * oracles.
  *
  * At 100 TB you don't count exactly — you sketch: a count-min table or
  * an HLL register file is a few KB per partition, merges with a plain
  * `sum`/`max` aggregation (associative + commutative, so map-side
  * combine applies and the final exchange carries sketch cells, not
  * keys), and answers heavy-hitter / cardinality questions within known
  * error. The usual objection to testing sketches — implementation-
  * defined hashing — is dissolved by building them on the same
  * md5-derived `h64` used across this engine: every cell value is
  * integer arithmetic on a replayable hash, so DuckDB reproduces the
  * sketch bit-for-bit (gates q54/q55).
  */
object Sketch {

  /** salted row hash: h_r(key) = h64("salt-r-key") */
  private def rowHash(keyCol: Column, row: Column, salt: String): Column =
    h64(concat_ws("-", lit(salt), row.cast("string"), keyCol.cast("string")))

  /** Count-min sketch of key frequencies: `depth` hash rows × `width`
    * buckets, cell (r, b) = Σ count of keys hashing to b under h_r.
    * Built from the per-key pre-aggregate (one shuffle bounded by the
    * distinct keys), then `depth` cells per distinct key fold into the
    * tiny (depth·width) table — the explode happens AFTER the count,
    * never on the raw stream. */
  def countMin(df: DataFrame, keyCol: String, depth: Int, width: Int,
      salt: String = "graft-cms"): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth/$width")
    val counts = df.groupBy(col(keyCol).as("graft_key"))
      .agg(count(lit(1)).as("graft_n"))
    counts
      .select(col("graft_key"), col("graft_n"),
        explode(array((0 until depth).map(lit): _*)).as("row"))
      .select(col("row"),
        pmod(rowHash(col("graft_key"), col("row"), salt), lit(width)).as("bucket"),
        col("graft_n"))
      .groupBy("row", "bucket").agg(sum("graft_n").as("cnt"))
  }

  /** Point estimates from a count-min sketch: est(key) = min over rows
    * of the key's cell — an overestimate by at most the collision mass,
    * never an underestimate. `keys` is a (small) DataFrame of probe
    * keys; the probe joins on (row, bucket) against the tiny sketch. */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int, salt: String = "graft-cms"): DataFrame = {
    val probes = keys
      .select(col(keyCol).as("graft_key"))
      .select(col("graft_key"),
        explode(array((0 until depth).map(lit): _*)).as("row"))
      .select(col("graft_key"), col("row"),
        pmod(rowHash(col("graft_key"), col("row"), salt), lit(width)).as("bucket"))
    probes.join(sketch, Seq("row", "bucket"))
      .groupBy("graft_key")
      .agg(min("cnt").as("est"))
      .withColumnRenamed("graft_key", keyCol)
  }

  /** HyperLogLog register file over 2^p buckets: bucket = low p bits of
    * the 60-bit key hash, register = max over the bucket's keys of
    * ρ(v) = leading-zero count of the remaining 50-bit field + 1,
    * computed portably as 51 − len(bin(v)) (both engines' `bin` drops
    * leading zeros). One hash-aggregate whose shuffle carries at most
    * 2^p rows per partition. */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int,
      salt: String = "graft-hll"): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val h = h64(concat_ws("-", lit(salt), col(keyCol).cast("string")))
    val v = shiftright(h, p).as("graft_v") // 60-p bit field (h is non-negative)
    df.select(pmod(h, lit(m)).as("bucket"), v)
      .select(col("bucket"),
        when(col("graft_v") === 0, lit(60 - p + 1))
          .otherwise(lit(60 - p + 1) - length(bin(col("graft_v")))).as("rho"))
      .groupBy("bucket").agg(max("rho").as("max_rho"))
  }

  /** Per-group HLL register files — the "distinct users per domain over
    * 100 TB" shape: one hash-aggregate keyed (group, bucket), so the
    * exchange carries at most |groups| × 2^p rows regardless of input
    * size, with map-side combine folding each partition's registers
    * before anything shuffles. Same hash/rho arithmetic as
    * [[hllRegisters]], so DuckDB replays the file bit-for-bit. */
  def hllRegistersByGroup(df: DataFrame, groupCol: String, keyCol: String,
      p: Int, salt: String = "graft-hll"): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val h = h64(concat_ws("-", lit(salt), col(keyCol).cast("string")))
    df.select(col(groupCol), pmod(h, lit(m)).as("bucket"),
        shiftright(h, p).as("graft_v"))
      .select(col(groupCol), col("bucket"),
        when(col("graft_v") === 0, lit(60 - p + 1))
          .otherwise(lit(60 - p + 1) - length(bin(col("graft_v")))).as("rho"))
      .groupBy(groupCol, "bucket").agg(max("rho").as("max_rho"))
  }

  /** Merge grouped register files by (group, bucket) MAX. Registers are
    * FIRST-CLASS STATE: max is associative, commutative, and idempotent,
    * so slices may arrive in any order, any partitioning, and may
    * OVERLAP (reprocessed days, at-least-once ingest) — the merged file
    * still equals the file the union of inputs would have produced,
    * bit-exactly. This is what makes per-group distinct counting
    * incrementally maintainable at 100 TB: yesterday's registers + one
    * register file per new batch, never a re-scan. */
  def hllMergeByGroup(registers: Seq[DataFrame], groupCol: String): DataFrame = {
    require(registers.nonEmpty, "hllMergeByGroup needs at least one register file")
    registers.reduce(_.unionAll(_))
      .groupBy(groupCol, "bucket").agg(max("max_rho").as("max_rho"))
  }

  /** Cardinality estimate from the register file (standard HLL formula,
    * with the small-range linear-counting correction). The indicator
    * sum uses exact powers of two folded as scaled integers, so the
    * only floating-point steps are one division chain at the end. */
  def hllEstimate(registers: DataFrame, p: Int): Double = {
    val m = 1 << p
    val maxRho = 60 - p + 1
    // Σ 2^-rho scaled by 2^maxRho: integers, order-independent
    val row = registers
      .agg(sum(expr(s"shiftleft(1L, $maxRho - max_rho)")).as("s"),
        count(lit(1)).as("used"))
      .collect()(0)
    val used = row.getAs[Long]("used")
    val zeros = m - used // absent buckets carry rho = 0 → 2^maxRho each
    val s = row.getAs[Long]("s") + zeros * (1L << maxRho)
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / (s.toDouble / (1L << maxRho).toDouble)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
