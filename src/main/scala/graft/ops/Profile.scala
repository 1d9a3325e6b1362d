package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiling: per-column null counts, distinct counts and
  * min/max. Null/extreme stats for ALL columns fuse into ONE aggregate
  * pass. Exact distinct counts run as one single-column job per column —
  * a pruned columnar scan with ordinary two-phase distinct aggregation,
  * fired concurrently. That deliberately avoids the multi-countDistinct
  * Expand plan, which multiplies every scanned row by #columns through
  * the aggregate (at 100 TB: N pruned scans stream N columns once,
  * the Expand streams the full width N times). `exact = false` keeps
  * everything in the single fused pass using HyperLogLog++ — the scale
  * default when ±2% distinct estimates suffice.
  *
  * Numeric and timestamp extremes surface as doubles (timestamps as
  * epoch seconds), strings as strings — engine-portable representations
  * so the profile is DuckDB-oracle-checkable (double→string formatting
  * is NOT portable; never cast extremes to string).
  */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  def profile(
      df: DataFrame,
      exact: Boolean = true,
      maxConcurrentJobs: Int = 4,
      timeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(1, "hour")): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.toSeq
    def quoted(n: String): Column = col("`" + n + "`")

    val aggs = Seq(count(lit(1)).as("graft_total")) ++ fields.flatMap { f =>
      val c = quoted(f.name)
      val (minE, maxE) = f.dataType match {
        case dt if isNumeric(dt) =>
          (min(c).cast("double"), max(c).cast("double"))
        case _: TimestampType | _: TimestampNTZType =>
          (min(unix_timestamp(c)).cast("double"), max(unix_timestamp(c)).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      val (minS, maxS) = f.dataType match {
        case StringType => (min(c), max(c))
        case _ => (lit(null).cast("string"), lit(null).cast("string"))
      }
      Seq(
        count(c).as(s"${f.name}__nonnull"),
        minE.as(s"${f.name}__min_num"), maxE.as(s"${f.name}__max_num"),
        minS.as(s"${f.name}__min_str"), maxS.as(s"${f.name}__max_str")) ++
        (if (exact) Nil
         else Seq(approx_count_distinct(c).as(s"${f.name}__distinct")))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = row.getAs[Long]("graft_total")

    val distincts: Map[String, Long] =
      if (!exact) fields.map(f => f.name -> row.getAs[Long](s"${f.name}__distinct")).toMap
      else {
        // a fixed-size pool, not ExecutionContext.global: a 500-column
        // schema must not flood the scheduler with 500 simultaneous
        // jobs, and a hung job must surface as a timeout, not block the
        // caller forever
        import scala.concurrent.{Await, ExecutionContext, Future}
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.max(1, math.min(maxConcurrentJobs, fields.size)))
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        try {
          val jobs = fields.map { f =>
            Future(f.name ->
              df.select(quoted(f.name)).agg(countDistinct(quoted(f.name)))
                .collect()(0).getLong(0))
          }
          Await.result(Future.sequence(jobs), timeout).toMap
        } finally pool.shutdownNow()
      }

    def nullableAt[T](idx: Int, get: Int => T): Any =
      if (row.isNullAt(idx)) null else get(idx)
    val out = fields.map { f =>
      Row(f.name, total,
        total - row.getAs[Long](s"${f.name}__nonnull"),
        distincts(f.name),
        nullableAt(row.fieldIndex(s"${f.name}__min_num"), row.getDouble),
        nullableAt(row.fieldIndex(s"${f.name}__max_num"), row.getDouble),
        nullableAt(row.fieldIndex(s"${f.name}__min_str"), row.getString),
        nullableAt(row.fieldIndex(s"${f.name}__max_str"), row.getString))
    }
    val schema = StructType(Seq(
      StructField("col_name", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("n_nulls", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("min_num", DoubleType),
      StructField("max_num", DoubleType),
      StructField("min_str", StringType),
      StructField("max_str", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }

  /** Equi-width histogram of a numeric column — the profiler's
    * distribution view (null-rate and extremes alone hide skew, and
    * skew is what decides salting/AQE settings at 100 TB).
    *
    * One pruned scan, one `nbins`-row aggregate; bin ids come from
    * INTEGER arithmetic on a centi-unit fixed-point view of the value
    * (`decimal(18,2)` ⇒ exact ×100), so bin edges are engine-exact —
    * no float boundary flake. Values outside [lo, hi) clamp into the
    * first/last bin (standard profiler semantics: extremes are visible
    * in the edge bins, not dropped). Empty bins appear with n = 0 via
    * the driver-side bin spine (nbins rows — trivially broadcastable).
    */
  def histogram(
      df: DataFrame,
      column: String,
      lo: BigDecimal,
      hi: BigDecimal,
      nbins: Int): DataFrame = {
    require(nbins > 0, s"nbins must be positive, got $nbins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val spark = df.sparkSession
    val loC = (lo * 100).toLongExact
    val hiC = (hi * 100).toLongExact
    val span = hiC - loC
    val counts = df
      .filter(col(column).isNotNull)
      .select(col(column).cast("decimal(18,2)").as("v"))
      .select(expr(s"cast(v * 100 as bigint)").as("cents"))
      .select(least(lit(nbins - 1), greatest(lit(0),
        expr(s"cast(((cents - ${loC}L) * $nbins) div ${span}L as int)")))
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val spine = spark.range(0, nbins).select(col("id").cast("int").as("bin"))
    spine.join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"),
        // edges via integer div (exact on both engines), then ONE
        // int→double conversion and /100 — IEEE-identical everywhere
        (expr(s"cast(${loC}L + (cast(bin as bigint) * ${span}L) div $nbins as double)") / 100)
          .as("bin_lo"),
        (expr(s"cast(${loC}L + (cast(bin + 1 as bigint) * ${span}L) div $nbins as double)") / 100)
          .as("bin_hi"))
  }

  /** Per-group quantile ESTIMATES from an integer-cent equi-width
    * histogram — percentile monitoring at scale without a per-group
    * sort: one (group, bin) hash aggregate (≤ groups × nbins rows on
    * the wire, map-side combined) plus a bin-spine window, and each
    * estimate is the LOWER EDGE of the first bin whose cumulative
    * count reaches ⌈q·n⌉. Quantiles arrive as PERMILLE integers so the
    * threshold is exact integer arithmetic (`(n·q + 999) div 1000`);
    * bin mapping and edges reuse [[histogram]]'s cent arithmetic, so
    * the result is deterministic and engine-exact, with error bounded
    * by one bin width. The histogram rows are mergeable state (counts
    * sum), so the same estimate is maintainable incrementally. */
  def histogramQuantiles(
      df: DataFrame,
      groupCol: String,
      column: String,
      lo: BigDecimal,
      hi: BigDecimal,
      nbins: Int,
      qsPermille: Seq[Int]): DataFrame = {
    require(nbins > 0, s"nbins must be positive, got $nbins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    require(qsPermille.nonEmpty && qsPermille.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be permille in [1, 1000], got $qsPermille")
    val loC = (lo * 100).toLongExact
    val hiC = (hi * 100).toLongExact
    val span = hiC - loC
    val binned = df
      .filter(col(column).isNotNull)
      .select(col(groupCol).as("grp"),
        col(column).cast("decimal(18,2)").as("v"))
      .select(col("grp"), expr("cast(v * 100 as bigint)").as("cents"))
      .select(col("grp"), least(lit(nbins - 1), greatest(lit(0),
        expr(s"cast(((cents - ${loC}L) * $nbins) div ${span}L as int)")))
        .as("bin"))
      .groupBy("grp", "bin").agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy("grp").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned
      .withColumn("cum", sum("n").over(wCum))
      .withColumn("total", sum("n").over(Window.partitionBy("grp")))
    val qSpine = explode(array(qsPermille.map(lit): _*)).as("q")
    cum.select(col("grp"), col("bin"), col("cum"), col("total"), qSpine)
      .filter(col("cum") >= expr("(total * q + 999L) div 1000L"))
      .groupBy("grp", "q").agg(min("bin").as("bin"))
      .select(col("grp"), col("q"),
        (expr(s"cast(${loC}L + (cast(bin as bigint) * ${span}L) div $nbins as double)") / 100)
          .as("est"))
  }
}
