package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access (TESTDATA.md / FIXTURES.md).
  *
  * Small dimension tables (`region` 5 rows, `nation` 25, `supplier` ~100)
  * are broadcast-join candidates; the fact tables (`lineitem`, `orders`,
  * `events`) are the scale-out side. Nothing is cached here: every query
  * plans its own scan so Catalyst can push filter/column pruning into the
  * parquet reader (visible as PushedFilters / ReadSchema in explain).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) (which Spark 4
      // rejects by default — read as long via the legacy conf, then convert
      // to microsecond TimestampType) and plain timestamp[us] (pass through).
      // Guard on the loaded dataType so either fixture generation works.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema.find(_.name == "ts").map(_.dataType) match {
        case Some(org.apache.spark.sql.types.LongType) =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case Some(org.apache.spark.sql.types.TimestampNTZType) =>
          // Surface the one TimestampType every operator was built
          // against (unix_micros etc. reject NTZ). Session TZ is UTC in
          // every entry point, so the cast preserves wall time.
          df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view (for SQL-form queries). */
  def views(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

/** One engine query: a Spark plan plus (when SQL-expressible) the ANSI SQL
  * the DuckDB oracle runs on the same parquet tables. Column names and
  * result types must match between the two (the driver compares column-wise
  * hashes after sorting columns by name).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
