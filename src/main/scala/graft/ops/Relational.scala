package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 Tier-A relational corpus, expressed Spark-first with the
  * DataFrame API (broadcast hints on the small dimension tables; Catalyst
  * handles pushdown/pruning/join selection). Each query carries the ANSI SQL
  * the DuckDB oracle executes over the same parquet files.
  *
  * Determinism rules (SURVEY §2.9): total ORDER BY, ROUND on float
  * aggregates, explicit casts so Spark and DuckDB result types agree
  * (e.g. FLOOR/LENGTH/EXTRACT return BIGINT on one engine, not the other).
  */
object Relational {

  private def t(s: SparkSession, d: String)(name: String): DataFrame =
    Tables.load(s, d, name)

  /** a36 argmin/argmax ordering key: exact BIGINT packing of
    * (price-cents, orderkey, linenumber). All-integer arithmetic, so —
    * unlike the original double packing — the tie-break terms can never
    * collide with the price granularity: cents × 10^11 leaves 10^11 of
    * headroom, enough for orderkey < 10^10 (TPC-H SF ~100k) with no
    * overflow below price 92M cents. Integer keys also keep min_by on the
    * fast numeric-buffer aggregation path (a zero-padded string key was
    * exact too, but cost 3.7x: per-row string building + a SortAggregate,
    * since string aggregation buffers can't hash-aggregate).
    * Prices carry exactly 2 decimals, so ROUND(x*100) is an integral
    * double on both engines and the BIGINT cast is exact.
    */
  private[ops] val a36Key: Column =
    round(col("l_extendedprice") * 100).cast("long") * lit(100000000000L) +
      col("l_orderkey") * lit(10) + col("l_linenumber")

  private[ops] val a36KeySql: String =
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 100000000000 + " +
      "l_orderkey * 10 + l_linenumber"

  val defs: Seq[Q] = Seq(

    Q("a01_scan_project",
      (s, d) => t(s, d)("region")
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey"),
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    Q("a02_filter",
      (s, d) => t(s, d)("lineitem")
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("SELECT l_orderkey, l_linenumber FROM lineitem " +
        "WHERE l_quantity > 30 AND l_returnflag = 'R' " +
        "ORDER BY l_orderkey, l_linenumber")),

    Q("a03_inner_join",
      (s, d) => t(s, d)("nation")
        .join(broadcast(t(s, d)("region")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_name", "r_name")
        .orderBy("n_name"),
      Some("SELECT n_name, r_name FROM nation JOIN region " +
        "ON n_regionkey = r_regionkey ORDER BY n_name")),

    Q("a04_join_agg",
      (s, d) => t(s, d)("customer")
        .join(broadcast(t(s, d)("nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal"), 2).as("bal"))
        .orderBy("n_name"),
      Some("SELECT n_name, COUNT(*) AS cnt, ROUND(SUM(c_acctbal), 2) AS bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name")),

    Q("a05_left_join_agg",
      (s, d) => t(s, d)("customer")
        .join(t(s, d)("orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM customer " +
        "LEFT JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_custkey ORDER BY c_custkey")),

    Q("a06_semi_join",
      (s, d) => t(s, d)("customer")
        .join(t(s, d)("orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey"),
      Some("SELECT c_custkey FROM customer WHERE c_custkey IN " +
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 100000) " +
        "ORDER BY c_custkey")),

    Q("a07_anti_join",
      (s, d) => t(s, d)("customer")
        .join(t(s, d)("orders"), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey"),
      Some("SELECT c_custkey FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "ORDER BY c_custkey")),

    Q("a08_agg_having",
      (s, d) => t(s, d)("lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("cnt"))
        .filter(col("cnt") > 10)
        .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT l_returnflag, l_linestatus, " +
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "HAVING COUNT(*) > 10 ORDER BY l_returnflag, l_linestatus")),

    Q("a09_distinct_agg",
      (s, d) => t(s, d)("lineitem")
        .agg(
          countDistinct(col("l_suppkey")).as("suppliers"),
          countDistinct(col("l_partkey")).as("parts")),
      Some("SELECT COUNT(DISTINCT l_suppkey) AS suppliers, " +
        "COUNT(DISTINCT l_partkey) AS parts FROM lineitem")),

    Q("a10_rollup",
      (s, d) => t(s, d)("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")),
      Some("SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt FROM lineitem " +
        "GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")),

    Q("a11_grouping_sets",
      (s, d) => {
        // GROUPING SETS is SQL-only surface in Spark; Catalyst plans it as a
        // single Expand + one aggregate (one pass over orders).
        t(s, d)("orders").createOrReplaceTempView("orders")
        s.sql("SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt " +
          "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), " +
          "(o_orderpriority)) ORDER BY o_orderstatus NULLS FIRST, " +
          "o_orderpriority NULLS FIRST")
      },
      Some("SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt " +
        "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), " +
        "(o_orderpriority)) ORDER BY o_orderstatus NULLS FIRST, " +
        "o_orderpriority NULLS FIRST")),

    Q("a12_rank_window",
      (s, d) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, d)("customer")
          .select(col("c_custkey"), rank().over(w).cast("bigint").as("rnk"))
          .filter(col("rnk") <= 3)
          .orderBy("c_custkey")
      },
      Some("SELECT c_custkey, rnk FROM (SELECT c_custkey, RANK() OVER " +
        "(PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) " +
        "AS rnk FROM customer) t WHERE rnk <= 3 ORDER BY c_custkey")),

    Q("a13_running_window",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d)("orders")
          .select(col("o_custkey"), col("o_orderkey"),
            round(sum("o_totalprice").over(w), 2).as("running"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("SELECT o_custkey, o_orderkey, ROUND(SUM(o_totalprice) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running " +
        "FROM orders ORDER BY o_custkey, o_orderkey")),

    Q("a14_lag_window",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
        t(s, d)("orders")
          .select(col("o_orderkey"),
            lag(col("o_orderkey"), 1).over(w).as("prev_key"))
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, LAG(o_orderkey) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey) AS prev_key FROM orders " +
        "ORDER BY o_orderkey")),

    Q("a15_topk",
      (s, d) => t(s, d)("orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")),

    Q("a16_union",
      (s, d) => t(s, d)("customer").select(col("c_nationkey").as("k"))
        .union(t(s, d)("supplier").select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy("k"),
      Some("SELECT c_nationkey AS k FROM customer UNION " +
        "SELECT s_nationkey AS k FROM supplier ORDER BY k")),

    Q("a16_intersect",
      (s, d) => t(s, d)("customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, d)("supplier").select(col("s_nationkey").as("k")))
        .orderBy("k"),
      Some("SELECT c_nationkey AS k FROM customer INTERSECT " +
        "SELECT s_nationkey AS k FROM supplier ORDER BY k")),

    Q("a16_except",
      (s, d) => t(s, d)("customer").select(col("c_nationkey").as("k"))
        .except(t(s, d)("supplier").select(col("s_nationkey").as("k")))
        .orderBy("k"),
      Some("SELECT c_nationkey AS k FROM customer EXCEPT " +
        "SELECT s_nationkey AS k FROM supplier ORDER BY k")),

    Q("a17_string_funcs",
      (s, d) => t(s, d)("customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("u"),
          length(col("c_name")).cast("bigint").as("l"),
          substring(col("c_name"), 1, 8).as("pre"),
          concat(col("c_mktsegment"), lit("-"), col("c_name")).as("cc"))
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, UPPER(c_name) AS u, LENGTH(c_name) AS l, " +
        "SUBSTRING(c_name, 1, 8) AS pre, " +
        "CONCAT(c_mktsegment, '-', c_name) AS cc " +
        "FROM customer ORDER BY c_custkey")),

    Q("a18_date_funcs",
      (s, d) => t(s, d)("orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("bigint").as("y"),
          month(col("o_orderdate")).cast("bigint").as("m"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, EXTRACT(YEAR FROM o_orderdate) AS y, " +
        "EXTRACT(MONTH FROM o_orderdate) AS m, " +
        "CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d " +
        "FROM orders ORDER BY o_orderkey")),

    Q("a19_math_funcs",
      (s, d) => t(s, d)("lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_discount") - col("l_tax")), 4).as("a"),
          floor(col("l_quantity")).as("f"),
          ceil(col("l_extendedprice") / 100).as("c"),
          round(sqrt(col("l_quantity")), 4).as("s"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("SELECT l_orderkey, l_linenumber, " +
        "ROUND(ABS(l_discount - l_tax), 4) AS a, " +
        "CAST(FLOOR(l_quantity) AS BIGINT) AS f, " +
        "CAST(CEIL(l_extendedprice / 100) AS BIGINT) AS c, " +
        "ROUND(SQRT(l_quantity), 4) AS s " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber")),

    Q("a20_case_agg",
      (s, d) => t(s, d)("orders")
        .groupBy("o_orderstatus")
        .agg(
          sum(when(col("o_totalprice") > 150000, 1).otherwise(0))
            .cast("bigint").as("big"),
          count(lit(1)).as("total"))
        .orderBy("o_orderstatus"),
      Some("SELECT o_orderstatus, CAST(SUM(CASE WHEN o_totalprice > 150000 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS big, COUNT(*) AS total " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")),

    Q("a21_corr_subquery",
      (s, d) => {
        // Correlated scalar subquery decorrelated by hand: the per-nation
        // average as a window — one shuffle on c_nationkey, no join.
        val w = Window.partitionBy("c_nationkey")
        t(s, d)("customer")
          .withColumn("nat_avg", avg("c_acctbal").over(w))
          .filter(col("c_acctbal") > col("nat_avg"))
          .select("c_custkey")
          .orderBy("c_custkey")
      },
      Some("SELECT c_custkey FROM customer c WHERE c_acctbal > " +
        "(SELECT AVG(c_acctbal) FROM customer WHERE c_nationkey = " +
        "c.c_nationkey) ORDER BY c_custkey")),

    Q("a22_theta_join",
      (s, d) => t(s, d)("part").filter(col("p_partkey") <= 20)
        .join(broadcast(t(s, d)("supplier")),
          col("p_retailprice") > col("s_acctbal"))
        .select("p_partkey", "s_suppkey")
        .orderBy("p_partkey", "s_suppkey"),
      Some("SELECT p_partkey, s_suppkey FROM part JOIN supplier " +
        "ON p_retailprice > s_acctbal WHERE p_partkey <= 20 " +
        "ORDER BY p_partkey, s_suppkey")),

    Q("a23_events_time_agg",
      (s, d) => t(s, d)("events")
        .groupBy(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sv"))
        .orderBy("event_type", "day"),
      Some("SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, " +
        "COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sv FROM events " +
        "GROUP BY event_type, CAST(ts AS DATE) ORDER BY event_type, day")),

    Q("a24_asof_join",
      // As-of join composed from built-ins (no custom operator needed):
      // for every error event, the latest click of the same user at or
      // before it. One shuffle on user_id; the running last() is a
      // window, so no self-join materializes. The oracle uses DuckDB's
      // native ASOF JOIN — semantics must line up exactly.
      (s, d) => {
        val ev = t(s, d)("events")
          .filter(col("event_type").isin("error", "click"))
        // Tie-break: clicks sort BEFORE errors at equal ts, so an
        // exact-tie click is inside the error's frame — matching the
        // oracle's ASOF condition e.ts >= l.ts (inclusive).
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"),
            when(col("event_type") === "click", 0).otherwise(1),
            col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("last_click_us",
          last(when(col("event_type") === "click",
            expr("unix_micros(ts)")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "error")
          .select(col("event_id"), col("last_click_us"))
          .orderBy("event_id")
      },
      Some("SELECT e.event_id, CAST(epoch_us(l.ts) AS BIGINT) " +
        "AS last_click_us " +
        "FROM (SELECT * FROM events WHERE event_type = 'error') e " +
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') l " +
        "ON e.user_id = l.user_id AND e.ts >= l.ts ORDER BY e.event_id")),

    Q("a25_session_window",
      // Sessionization via Spark's native session_window (10-minute
      // inactivity gap); the oracle rebuilds sessions with the classic
      // gaps-and-islands window SQL.
      (s, d) => t(s, d)("events")
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"),
          expr("unix_micros(session_window.start)").as("session_start"),
          col("cnt"))
        .orderBy("user_id", "session_start"),
      Some("WITH o AS (SELECT user_id, ts, CASE WHEN " +
        "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR " +
        "ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= " +
        "INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk FROM events), " +
        "g AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id " +
        "ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS grp FROM o) " +
        "SELECT user_id, CAST(epoch_us(MIN(ts)) AS BIGINT) AS " +
        "session_start, COUNT(*) AS cnt FROM g GROUP BY user_id, grp " +
        "ORDER BY user_id, session_start")),

    Q("a26_pivot",
      // PIVOT with an explicit value list (deterministic columns; the raw
      // priority strings contain spaces, illegal in parquet column names).
      (s, d) => {
        val vals = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
          "5-LOW")
        val renames = vals.zipWithIndex
          .map { case (v, i) => v -> s"p${i + 1}" }.toMap
        t(s, d)("orders")
          .groupBy("o_orderstatus")
          .pivot("o_orderpriority", vals)
          .count()
          .withColumnsRenamed(renames)
          .na.fill(0L, renames.values.toSeq)
          .orderBy("o_orderstatus")
      },
      Some("SELECT o_orderstatus, " +
        "CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS p1, " +
        "CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS p2, " +
        "CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS p3, " +
        "CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 " +
        "ELSE 0 END) AS BIGINT) AS p4, " +
        "CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS p5 " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")),

    Q("a28_percentiles",
      // Exact percentiles with linear interpolation, grouped: Spark's
      // `percentile` and DuckDB's `quantile_cont` share the
      // p*(n-1)-position definition, so results hash-match after ROUND.
      // (At 100 TB one switches to approx_percentile — a27 shows the
      // sketch side; this is the exact counterpart.)
      (s, d) => t(s, d)("lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 2).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 2).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 2).as("p75"),
          round(expr("percentile(l_extendedprice, 0.9)"), 2).as("price_p90"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, " +
        "ROUND(quantile_cont(l_quantity, 0.25), 2) AS p25, " +
        "ROUND(quantile_cont(l_quantity, 0.5), 2) AS p50, " +
        "ROUND(quantile_cont(l_quantity, 0.75), 2) AS p75, " +
        "ROUND(quantile_cont(l_extendedprice, 0.9), 2) AS price_p90 " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    Q("a28b_approx_percentile",
      // The 100 TB percentile path: approx_percentile's mergeable GK
      // sketch (one pass, bounded memory, partial-aggregable) instead of
      // a28's per-group exact sort. The sketch value itself isn't
      // oracle-comparable (DuckDB has no GK), so — a27's pattern — the
      // gate emits EXACT rank bands (DuckDB recomputes those) plus the
      // accuracy contract as booleans: the sketch value must land inside
      // the exact [p-0.05, p+0.05] quantile band, far looser than the
      // 1/accuracy = 1e-4 rank-error guarantee, so it never flaps, but a
      // broken sketch (wrong rank math, lost merge) blows it instantly.
      // the four exact bounds share ONE percentile buffer (array form)
      // — four scalar percentile aggs would each hold their own value
      // map per group (measured 4.7s vs 1.6s at sf0.1)
      (s, d) => t(s, d)("lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)")
            .as("ap"),
          expr("percentile(l_extendedprice, " +
            "array(0.45, 0.55, 0.85, 0.95))").as("ex"))
        .select(col("l_returnflag"),
          round(col("ex")(0), 2).as("lo50"),
          round(col("ex")(1), 2).as("hi50"),
          round(col("ex")(2), 2).as("lo90"),
          round(col("ex")(3), 2).as("hi90"),
          (col("ap")(0) >= col("ex")(0) && col("ap")(0) <= col("ex")(1))
            .as("p50_in_band"),
          (col("ap")(1) >= col("ex")(2) && col("ap")(1) <= col("ex")(3))
            .as("p90_in_band"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, " +
        "ROUND(quantile_cont(l_extendedprice, 0.45), 2) AS lo50, " +
        "ROUND(quantile_cont(l_extendedprice, 0.55), 2) AS hi50, " +
        "ROUND(quantile_cont(l_extendedprice, 0.85), 2) AS lo90, " +
        "ROUND(quantile_cont(l_extendedprice, 0.95), 2) AS hi90, " +
        "true AS p50_in_band, true AS p90_in_band " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    Q("a29_salted_join",
      // Skew-mitigation pattern: the probe side is salted N ways and the
      // build side replicated per salt, so one hot join key spreads over N
      // shuffle partitions instead of hot-spotting one. Results are
      // identical to the unsalted join (the oracle runs the plain SQL) —
      // the salt only changes the partitioning. At fixture scale AQE's
      // skew-join handles this automatically; explicit salting is the
      // portable fallback when a key exceeds what one executor can hold.
      (s, d) => {
        val salts = 8
        val li = t(s, d)("lineitem")
          .withColumn("salt",
            pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(salts)))
        val supp = t(s, d)("supplier")
          .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
        li.join(supp,
            col("l_suppkey") === col("s_suppkey") &&
              li("salt") === supp("salt"))
          .groupBy("s_nationkey")
          .agg(count(lit(1)).cast("bigint").as("cnt"),
            round(sum("l_extendedprice"), 2).as("rev"))
          .orderBy("s_nationkey")
      },
      Some("SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        "ROUND(SUM(l_extendedprice), 2) AS rev " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "GROUP BY s_nationkey ORDER BY s_nationkey")),

    Q("a30_latest_per_key",
      // Keep-latest-record-per-key: the standard CDC/compaction shape
      // (row_number over a per-key descending-time window, keep rn=1).
      // One hash-shuffle on the key; at scale the window sort is
      // per-partition, never global.
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id"))
        t(s, d)("events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"),
            round(col("value"), 2).as("value"))
          .orderBy("user_id")
      },
      Some("SELECT user_id, event_id, event_type, ROUND(value, 2) AS value " +
        "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id " +
        "ORDER BY ts DESC, event_id) AS rn FROM events) " +
        "WHERE rn = 1 ORDER BY user_id")),

    Q("a31_window_suite",
      // The distribution-window family in one pass: ntile buckets,
      // percent_rank, cume_dist over per-nation account balances. One
      // shuffle on the partition key; all four functions share a single
      // window sort.
      (s, d) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, d)("customer")
          .select(col("c_custkey"),
            ntile(4).over(w).cast("bigint").as("quartile"),
            round(percent_rank().over(w), 4).as("pr"),
            round(cume_dist().over(w), 4).as("cd"))
          .orderBy("c_custkey")
      },
      Some("SELECT c_custkey, " +
        "CAST(NTILE(4) OVER w AS BIGINT) AS quartile, " +
        "ROUND(PERCENT_RANK() OVER w, 4) AS pr, " +
        "ROUND(CUME_DIST() OVER w, 4) AS cd " +
        "FROM customer WINDOW w AS (PARTITION BY c_nationkey " +
        "ORDER BY c_acctbal, c_custkey) ORDER BY c_custkey")),

    Q("a32_range_frame",
      // RANGE (value-based) window frame: sum of all orders within
      // 10 000 of the current order's price, per customer — value frames
      // are the window shape ROWS can't express. Same single shuffle on
      // the partition key.
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice"))
          .rangeBetween(-10000L, 0L)
        t(s, d)("orders")
          .select(col("o_orderkey"),
            round(sum("o_totalprice").over(w), 2).as("nearby_sum"))
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, ROUND(SUM(o_totalprice) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_totalprice " +
        "RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW), 2) " +
        "AS nearby_sum FROM orders ORDER BY o_orderkey")),

    Q("a33_string_suite",
      // Wider string surface: regexp_replace, split_part, translate,
      // lpad, reverse, levenshtein — all codegen'd built-ins, per-row
      // map work with no shuffle before the output sort.
      (s, d) => t(s, d)("customer")
        .select(col("c_custkey"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
          split_part(col("c_name"), lit("#"), lit(2)).as("num_part"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tr"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
          reverse(col("c_name")).as("rev"),
          levenshtein(col("c_mktsegment"), lit("MACHINERY")).cast("bigint")
            .as("lev"))
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, " +
        "regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked, " +
        "split_part(c_name, '#', 2) AS num_part, " +
        "translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr, " +
        "lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded, " +
        "reverse(c_name) AS rev, " +
        "levenshtein(c_mktsegment, 'MACHINERY') AS lev " +
        "FROM customer ORDER BY c_custkey")),

    Q("a34_date_suite",
      // Wider date surface: month truncation, end-of-month, day/week
      // extraction, day arithmetic against a fixed anchor. Dialect
      // function names differ (Spark datediff vs DuckDB date_diff) but
      // outputs align; dates emitted as ISO strings for hash parity.
      (s, d) => t(s, d)("orders")
        .select(col("o_orderkey"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
            .as("month_end"),
          dayofweek(col("o_orderdate")).cast("bigint").as("dow"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
            .cast("bigint").as("days_since"))
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, " +
        "CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) " +
        "AS month_start, " +
        "CAST(last_day(o_orderdate) AS VARCHAR) AS month_end, " +
        "CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow, " +
        "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) " +
        "AS days_since FROM orders ORDER BY o_orderkey")),

    Q("a35_full_outer_join",
      // FULL OUTER of two per-nation aggregates: customers vs suppliers.
      // Both sides pre-aggregate BEFORE the join (map-side partial then
      // one shuffle each), so the outer join runs on nation-cardinality
      // inputs, not fact tables — the aggregate-then-join shape that
      // keeps outer joins cheap at scale.
      (s, d) => {
        val c = t(s, d)("customer").groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_cust"))
        val su = t(s, d)("supplier").groupBy(col("s_nationkey").as("snk"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(su, col("nk") === col("snk"), "full_outer")
          .select(coalesce(col("nk"), col("snk")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("SELECT COALESCE(c.nk, s.snk) AS nationkey, " +
        "COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp " +
        "FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer " +
        "GROUP BY 1) c FULL OUTER JOIN (SELECT s_nationkey AS snk, " +
        "COUNT(*) AS n_supp FROM supplier GROUP BY 1) s ON c.nk = s.snk " +
        "ORDER BY nationkey")),

    Q("a36_stats_agg",
      // Statistical aggregates: stddev/variance/correlation/covariance
      // plus argmin/argmax — all single-pass, mergeable (map-side
      // partial) aggregates, the statistics a data-quality pass computes
      // per group at scale.
      (s, d) => t(s, d)("lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_extendedprice")), 2).as("var_price"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4)
            .as("corr_qp"),
          // + 0.0 normalizes IEEE negative zero: ROUND can yield -0.0 in
          // one engine and +0.0 in the other (numerically equal, but the
          // gate hashes the sign bit); (-0.0) + 0.0 = +0.0 in both.
          (round(covar_pop(col("l_discount"), col("l_tax")), 6) + lit(0.0))
            .as("cov_dt"),
          // composite ordering key as a zero-padded string: exact at any
          // scale (no double-packing granularity collisions), unique per
          // row, and portable to DuckDB's ARG_MIN (struct order keys are
          // not). Price has exactly 2 decimals, so cents are integral.
          min_by(col("l_orderkey"), Relational.a36Key)
            .as("cheapest_order"),
          max_by(col("l_orderkey"), Relational.a36Key)
            .as("dearest_order"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, " +
        "ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty, " +
        "ROUND(VAR_SAMP(l_extendedprice), 2) AS var_price, " +
        "ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qp, " +
        "ROUND(COVAR_POP(l_discount, l_tax), 6) + 0.0 AS cov_dt, " +
        "ARG_MIN(l_orderkey, " + Relational.a36KeySql + ") AS cheapest_order, " +
        "ARG_MAX(l_orderkey, " + Relational.a36KeySql + ") AS dearest_order " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    Q("a37_null_funcs",
      // NULL-handling surface over the nullable side of a left join:
      // COALESCE, NULLIF, null-aware CASE, and count/sum behavior over
      // nulls — the semantics every pipeline join depends on.
      (s, d) => t(s, d)("customer")
        .join(t(s, d)("orders").filter(col("o_totalprice") > 250000),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_big"),
          coalesce(round(sum("o_totalprice"), 2), lit(0.0)).as("sum_big"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0))
            .as("null_rows"))
        .select(col("c_custkey"), col("n_big"),
          col("sum_big"),
          nullif(col("null_rows"), lit(0L)).as("null_marker"))
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, COUNT(o_orderkey) AS n_big, " +
        "COALESCE(ROUND(SUM(o_totalprice), 2), 0.0) AS sum_big, " +
        "NULLIF(CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) " +
        "AS BIGINT), 0) AS null_marker " +
        "FROM customer LEFT JOIN (SELECT * FROM orders WHERE " +
        "o_totalprice > 250000) o ON c_custkey = o_custkey " +
        "GROUP BY c_custkey ORDER BY c_custkey")),

    Q("a38_set_ops_all",
      // Duplicate-preserving set ops (EXCEPT ALL / INTERSECT ALL): bag
      // semantics that plain EXCEPT/INTERSECT (a16) can't express —
      // planned as a single hash-shuffle on the value with per-key
      // count arithmetic, no join.
      (s, d) => {
        val c = t(s, d)("customer").select(col("c_nationkey").as("k"))
        val su = t(s, d)("supplier").select(col("s_nationkey").as("k"))
        c.exceptAll(su).groupBy("k").agg(count(lit(1)).as("surplus"))
          .orderBy("k")
      },
      Some("SELECT k, COUNT(*) AS surplus FROM " +
        "(SELECT c_nationkey AS k FROM customer " +
        "EXCEPT ALL SELECT s_nationkey FROM supplier) " +
        "GROUP BY k ORDER BY k")),

    Q("a39_lateral_join",
      // Correlated LATERAL subquery (SQL-only surface in both engines):
      // top-2 orders per customer — the lateral runs per outer row
      // logically, but both planners rewrite it to a window/join, so no
      // per-row execution survives in the physical plan.
      (s, d) => {
        t(s, d)("customer").createOrReplaceTempView("customer")
        t(s, d)("orders").createOrReplaceTempView("orders")
        s.sql("SELECT c.c_custkey, o.o_orderkey, o.o_totalprice " +
          "FROM customer c, LATERAL (SELECT o_orderkey, o_totalprice " +
          "FROM orders WHERE o_custkey = c.c_custkey " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o " +
          "ORDER BY c_custkey, o_orderkey")
      },
      Some("SELECT c.c_custkey, o.o_orderkey, o.o_totalprice " +
        "FROM customer c, LATERAL (SELECT o_orderkey, o_totalprice " +
        "FROM orders WHERE o_custkey = c.c_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o " +
        "ORDER BY c_custkey, o_orderkey")),

    Q("a40_recursive_cte",
      // WITH RECURSIVE (new SQL surface in Spark 4): a 1995 month spine
      // generated by recursion, left-joined to per-month order counts —
      // months with zero orders appear, which a plain GROUP BY cannot
      // produce. The recursion is 12 driver-side rows; the scan+agg side
      // is the usual partial-agg shuffle.
      (s, d) => {
        t(s, d)("orders").createOrReplaceTempView("orders")
        s.sql("WITH RECURSIVE m(mon) AS (" +
          "SELECT DATE'1995-01-01' " +
          "UNION ALL SELECT add_months(mon, 1) FROM m " +
          "WHERE mon < DATE'1995-12-01'), " +
          "o AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) " +
          "AS mon, COUNT(*) AS n FROM orders " +
          "WHERE o_orderdate >= '1995-01-01' AND " +
          "o_orderdate < '1996-01-01' GROUP BY 1) " +
          "SELECT CAST(m.mon AS STRING) AS month_start, " +
          "COALESCE(o.n, CAST(0 AS BIGINT)) AS n_orders " +
          "FROM m LEFT JOIN o ON m.mon = o.mon ORDER BY month_start")
      },
      Some("WITH RECURSIVE m(mon) AS (" +
        "SELECT DATE '1995-01-01' " +
        "UNION ALL SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM m " +
        "WHERE mon < DATE '1995-12-01'), " +
        "o AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) " +
        "AS mon, COUNT(*) AS n FROM orders " +
        "WHERE o_orderdate >= '1995-01-01' AND " +
        "o_orderdate < '1996-01-01' GROUP BY 1) " +
        "SELECT CAST(m.mon AS VARCHAR) AS month_start, " +
        "COALESCE(o.n, 0) AS n_orders " +
        "FROM m LEFT JOIN o ON m.mon = o.mon ORDER BY month_start")),

    Q("a27_approx_distinct",
      // HyperLogLog++ approximate distinct counts — the sketch every
      // 100 TB pipeline reaches for before an exact COUNT(DISTINCT).
      // DuckDB's approx sketch differs, so the raw estimate can't be
      // hash-compared; instead the gate emits the EXACT counts (DuckDB
      // recomputes those) plus the HLL accuracy contract as booleans:
      // |approx - exact| <= 15% of exact — 3x the default 5% rsd, the
      // same bound SketchAccuracySpec asserts. A broken sketch flips a
      // boolean and the hash check goes red.
      (s, d) => t(s, d)("lineitem")
        .agg(
          approx_count_distinct(col("l_partkey")).as("apd_parts"),
          approx_count_distinct(col("l_suppkey")).as("apd_supps"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_suppkey")).as("exact_supps"))
        .select(col("exact_parts"), col("exact_supps"),
          (abs(col("apd_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.15).as("parts_within_3rsd"),
          (abs(col("apd_supps") - col("exact_supps")) <=
            col("exact_supps") * 0.15).as("supps_within_3rsd")),
      Some("SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) " +
        "AS exact_parts, " +
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps, " +
        "true AS parts_within_3rsd, true AS supps_within_3rsd " +
        "FROM lineitem"))
  )
}
