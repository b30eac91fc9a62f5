package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The `spark.sql` entry point: every dialect-portable oracle statement
  * from the relational corpus must run VERBATIM through Spark SQL over
  * the fixture temp views and produce the same rows as the DataFrame
  * implementation — users of the engine get the full SQL surface, not
  * just the DataFrame API. (The DuckDB gate already proves
  * DataFrame == DuckDB; this closes the triangle.)
  */
class SqlParitySpec extends AnyFunSuite with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  // Oracle statements written in DuckDB-only dialect (ASOF JOIN,
  // epoch_us, quantile_cont, 4-arg regexp_replace, dayofweek offset,
  // ARG_MIN/ARG_MAX, bare VARCHAR casts) — their Spark form is the
  // DataFrame implementation.
  private val duckOnly = Set("a24_asof_join", "a25_session_window",
    "a28_percentiles", "a28b_approx_percentile", "a33_string_suite",
    "a34_date_suite", "a36_stats_agg", "a18_date_funcs",
    "a23_events_time_agg", "a40_recursive_cte")

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Tables.views(s, sfDir)
    s
  }

  private def norm(v: Any): String = v match {
    case null => "null"
    case d: java.lang.Double => f"${math.rint(d * 1e6) / 1e6}%.6f"
    case f: java.lang.Float => f"${math.rint(f.toDouble * 1e6) / 1e6}%.6f"
    case b: java.math.BigDecimal => f"${b.doubleValue()}%.6f"
    case other => other.toString
  }

  for {
    q <- ops.Relational.defs
    sql <- q.oracle
    if !duckOnly(q.name)
  } test(s"${q.name}: the oracle SQL runs verbatim via spark.sql") {
    val viaSql = spark.sql(sql).collect()
      .map(_.toSeq.map(norm))
    val viaDf = q.run(spark, sfDir).collect()
      .map(_.toSeq.map(norm))
    viaSql.length shouldBe viaDf.length
    // column order can differ between the two forms only if aliases
    // diverge — they don't, by the gate's own column-name contract
    viaSql.zip(viaDf).zipWithIndex.foreach { case ((a, b), i) =>
      withClue(s"row $i: ")(a shouldBe b)
    }
  }
}
