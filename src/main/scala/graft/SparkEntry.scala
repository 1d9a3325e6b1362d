package graft

import graft.diff.{DatasetComparator, DiffOptions}
import graft.schema.{Flattener, SchemaUtils}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] exercises an operator from SURVEY.md §2 (or
  * a §7 extension); every SQL-expressible entry has a DuckDB oracle in
  * [[oracleSql]] with IDENTICAL output column names and deterministic
  * values (decimal-exact arithmetic, explicit final casts, stable sorts
  * with unique tiebreaks).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; read nanos as long and floor-divide to microseconds — the
    * same truncation DuckDB applies (its timestamps are µs-precision). */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- A1/A2 aggregation (TPC-H Q1 shape) --------------------------
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- J1-style joins: fact ⋈ dims, dims broadcast -----------------
    "q2_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name")
    }),

    // ---- X1 symmetric set difference (except, DISTINCT semantics) ----
    "q3_except" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      o.except(o.filter(col("o_orderkey") % 10 < 8))
        .orderBy("o_orderkey")
    }),

    // ---- P7/A2 duplicate-key detection -------------------------------
    "q4_dupkeys" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .orderBy("o_custkey")
    }),

    // ---- P3 synthesized md5 row key ----------------------------------
    "q5_key_md5" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          md5(concat_ws("|",
            col("c_custkey").cast("string"),
            col("c_name"),
            col("c_mktsegment"))).as("row_key"))
        .orderBy("c_custkey")
    }),

    // ---- The diff engine end-to-end (keyed compare of perturbed orders)
    "q6_diff" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val actual = orders
        .filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 89 === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")))
      val result = new DatasetComparator(orders, actual,
        DiffOptions(keys = Seq("o_orderkey"))).compare()
      result.resultDF.get
        .select(
          col("expected_o_orderkey"), col("actual_o_orderkey"),
          col("expected_o_totalprice"), col("actual_o_totalprice"),
          concat_ws(",", col("errCol")).as("err"))
        .orderBy("expected_o_orderkey")
    }),

    // ---- F1/F2 flattening (struct + positional array expansion) ------
    "q7_flatten" -> ((s, dir) => {
      val nested = t(s, dir, "part").select(
        col("p_partkey"),
        struct(col("p_brand").as("brand"), col("p_type").as("type")).as("info"),
        array(col("p_size"), col("p_size") + 1).as("sizes"))
      Flattener.flattenDataFrame(nested).orderBy("p_partkey")
    }),

    // ---- P1 canonical selector + pushed-down filter -------------------
    "q8_selector" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.select(SchemaUtils.dataFrameSelector(li.schema): _*)
        .filter(col("l_quantity") <= 2 && col("l_returnflag") === "R")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- Time-bucketed aggregation over events ------------------------
    "q9_events_window" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,3)")).cast("double").as("total"))
        .orderBy("hour", "event_type")
    }),

    // ---- Window function: top event per user by value -----------------
    "q10_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "value")
        .orderBy("user_id")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q2_join" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q3_except" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |EXCEPT
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey % 10 < 8
        |ORDER BY o_orderkey""".stripMargin,

    "q4_dupkeys" ->
      """SELECT o_custkey, COUNT(*) AS n FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) >= 2 ORDER BY o_custkey""".stripMargin,

    "q5_key_md5" ->
      """SELECT c_custkey,
        |  md5(concat_ws('|', CAST(c_custkey AS VARCHAR), c_name, c_mktsegment)) AS row_key
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q6_diff" ->
      """WITH actual AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 <> 0)
        |SELECT r.o_orderkey AS expected_o_orderkey,
        |  a.o_orderkey AS actual_o_orderkey,
        |  r.o_totalprice AS expected_o_totalprice,
        |  a.o_totalprice AS actual_o_totalprice,
        |  CASE WHEN a.o_orderkey IS NULL THEN
        |    'o_totalprice,o_orderstatus,o_orderpriority,o_orderkey,o_orderdate,o_custkey'
        |  ELSE 'o_totalprice' END AS err
        |FROM orders r FULL OUTER JOIN actual a ON r.o_orderkey = a.o_orderkey
        |WHERE a.o_orderkey IS NULL OR r.o_totalprice <> a.o_totalprice
        |ORDER BY expected_o_orderkey""".stripMargin,

    "q7_flatten" ->
      """SELECT p_partkey, p_brand AS info_brand, p_type AS info_type,
        |  p_size AS sizes_0, p_size + 1 AS sizes_1
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q8_selector" ->
      """SELECT l_discount, l_extendedprice, l_linenumber, l_linestatus,
        |  l_orderkey, l_partkey, l_quantity, l_returnflag, l_shipdate,
        |  l_suppkey, l_tax
        |FROM lineitem WHERE l_quantity <= 2 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q9_events_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q10_window_rank" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin
  )
}
