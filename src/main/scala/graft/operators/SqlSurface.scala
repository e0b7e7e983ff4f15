package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The reference's SQL-STRING surface, first-class: its batch interface
  * is literal SQL (`batch_stream.sql` CTAS statements over the
  * warehouse tables), so a user switching engines brings SQL text, not
  * DataFrame code. These queries run the reference's batch analytics as
  * `spark.sql(...)` strings over registered temp views — same results,
  * same DuckDB oracles as their DataFrame twins (TrafficAnalytics),
  * proving the engine's SQL-text and DataFrame paths are
  * interchangeable (they compile to the same Catalyst plans; Spark
  * parses SQL into the identical logical operators the DataFrame API
  * builds).
  *
  * Reference: batch_stream.sql:57-74 (engagement), :27-50 (session
  * categories), :80-91 (quarterly trend), :95-101 (bounce), :107-113
  * (conversion), comparision.sql:65-79 (accuracy rollup),
  * spark_streaming_new.py:227-239 (hourly patterns).
  *
  * Scale: identical to the DataFrame twins — one hash aggregate over a
  * low-cardinality (window × enum) key, decimal-exact means per the
  * Tables.dsum discipline (spelled inline in SQL). The accuracy rollup
  * reads the mismatch TABLE (as the reference's SQL does) — the
  * single-fact-scan shape of the DataFrame pipeline carries over
  * unchanged because the SQL only sees the already-materialized view.
  *
  * View hygiene: every registration is a PER-DIR-UNIQUE name
  * (`<base>_<md5(dir)>`), never a shared session-global `events` — two
  * SqlSurface queries over different input dirs running concurrently in
  * one session each read their own view (each query stays a pure
  * function of (session, dir); a shared name would race and could serve
  * the other dir's data). The view is DROPPED as soon as the query is
  * built (ADVICE r8: per-dir views otherwise accumulate without bound
  * in a long-lived session iterating many dirs, each pinning a resolved
  * plan) — safe because `spark.sql` analyzes eagerly, so the returned
  * DataFrame's resolved plan no longer references the catalog entry.
  * The create→build→drop window is synchronized on this object so two
  * concurrent SAME-dir calls cannot drop each other's view
  * mid-analysis; different dirs never collide by naming.
  */
object SqlSurface {

  private def dirHash(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Register `df` under a per-dir-unique `name`, build the query
    * against it, drop the view (see "View hygiene" above). */
  private def withView(spark: SparkSession, name: String, df: DataFrame)(
      body: String => DataFrame): DataFrame = synchronized {
    df.createOrReplaceTempView(name)
    try body(name)
    finally spark.catalog.dropTempView(name)
  }

  /** Build a query against the per-dir events view. Goes through
    * [[Tables.events]] so the ts type-dispatch (nanos-long vs micros
    * timestamp parquet generations) applies to the SQL path too. */
  private def withEventsView(spark: SparkSession, dir: String)(
      body: String => DataFrame): DataFrame =
    withView(spark, s"events_${dirHash(dir)}", Tables.events(spark, dir))(body)

  private val davgSql =
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)"
  private val dsumSql =
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"

  def sqlEngagement(spark: SparkSession, dir: String): DataFrame = withEventsView(spark, dir) { v =>
    spark.sql(
      s"""SELECT w.start AS window_start, w.end AS window_end,
         |       $davgSql AS avg_score,
         |       min(value) AS min_score,
         |       max(value) AS max_score
         |FROM (SELECT window(ts, '5 minutes') AS w, value FROM $v)
         |GROUP BY w ORDER BY window_start""".stripMargin)
  }

  def sqlSessionCategories(spark: SparkSession, dir: String): DataFrame = withEventsView(spark, dir) { v =>
    spark.sql(
      s"""WITH b AS (
         |  SELECT window(ts, '5 minutes') AS w,
         |         CASE WHEN value < ${TrafficAnalytics.SHORT_MAX} THEN 'Short'
         |              WHEN value <= ${TrafficAnalytics.MEDIUM_MAX} THEN 'Medium'
         |              ELSE 'Long' END AS session_category
         |  FROM $v)
         |SELECT w.start AS window_start, w.end AS window_end,
         |       session_category, count(*) AS cnt,
         |       -- CAST: Spark (like DuckDB) parses a bare decimal literal
         |       -- as DECIMAL, and decimal division rounds differently
         |       -- than the DataFrame twin's double arithmetic
         |       count(*) * CAST(100.0 AS DOUBLE)
         |         / sum(count(*)) OVER (PARTITION BY w) AS percentage
         |FROM b GROUP BY w, session_category
         |ORDER BY window_start, session_category""".stripMargin)
  }

  def sqlHourlyPatterns(spark: SparkSession, dir: String): DataFrame = withEventsView(spark, dir) { v =>
    spark.sql(
      s"""SELECT hour(ts) AS hour_of_day,
         |       count(*) AS visit_count,
         |       $davgSql AS avg_value,
         |       min(value) AS min_value,
         |       max(value) AS max_value,
         |       count(DISTINCT user_id) AS unique_users
         |FROM $v GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  // batch_stream.sql:80-91 — 15-min trend with the formatted bucket label
  def sqlQuarterlyTrend(spark: SparkSession, dir: String): DataFrame = withEventsView(spark, dir) { v =>
    spark.sql(
      s"""SELECT date_format(w.start, 'yyyy-MM-dd HH:mm:00') AS quarter_window,
         |       count(*) AS total_sessions,
         |       $dsumSql AS total_value,
         |       $davgSql AS avg_value_per_session
         |FROM (SELECT window(ts, '15 minutes') AS w, value FROM $v)
         |GROUP BY w ORDER BY quarter_window""".stripMargin)
  }

  // batch_stream.sql:95-101 — global conditional-ratio aggregate
  def sqlBounceRate(spark: SparkSession, dir: String): DataFrame = withEventsView(spark, dir) { v =>
    spark.sql(
      s"""SELECT sum(CASE WHEN value < 1 THEN 1 ELSE 0 END) * CAST(100.0 AS DOUBLE)
         |       / count(*) AS bounce_rate_percentage
         |FROM $v""".stripMargin)
  }

  // batch_stream.sql:107-113 — conjunctive-predicate ratio
  def sqlConversionRate(spark: SparkSession, dir: String): DataFrame = withEventsView(spark, dir) { v =>
    spark.sql(
      s"""SELECT sum(CASE WHEN event_type = 'purchase' AND value > 100 THEN 1 ELSE 0 END)
         |       * CAST(100.0 AS DOUBLE) / count(*) AS conversion_rate_percentage
         |FROM $v""".stripMargin)
  }

  /** comparision.sql:65-79 as literal SQL text. The reference's rollup
    * reads the `session_categories_comparison` TABLE (not raw events) —
    * so does this: the mismatch table registers as a per-dir view (its
    * single-fact-scan materialized pipeline unchanged) and the SQL is
    * the reference's rollup verbatim in shape: COALESCE'd ±10 tolerance
    * over the full-outer mismatch rows. */
  def sqlComparisonAccuracy(spark: SparkSession, dir: String): DataFrame =
    withView(spark, s"session_categories_comparison_${dirHash(dir)}",
             TrafficAnalytics.sessionCatMismatch(spark, dir)) { name =>
    spark.sql(
      s"""SELECT 'session_categories_comparison' AS table_name,
         |       count(*) AS total_records,
         |       sum(CASE WHEN abs(coalesce(stream_count, 0) - coalesce(batch_count, 0)) <= 10
         |                THEN 1 ELSE 0 END) AS matching_records,
         |       sum(CASE WHEN abs(coalesce(stream_count, 0) - coalesce(batch_count, 0)) <= 10
         |                THEN 1 ELSE 0 END) * CAST(100.0 AS DOUBLE) / count(*)
         |         AS accuracy_percentage
         |FROM $name""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_engagement"          -> sqlEngagement _,
    "q_sql_session_categories"  -> sqlSessionCategories _,
    "q_sql_hourly_patterns"     -> sqlHourlyPatterns _,
    "q_sql_quarterly_trend"     -> sqlQuarterlyTrend _,
    "q_sql_bounce_rate"         -> sqlBounceRate _,
    "q_sql_conversion_rate"     -> sqlConversionRate _,
    "q_sql_comparison_accuracy" -> sqlComparisonAccuracy _)

  /** Same oracles as the DataFrame twins — the whole point: two engine
    * surfaces, one answer. */
  val oracles: Map[String, String] = Map(
    "q_sql_engagement"          -> TrafficAnalytics.engagementWindowedSql,
    "q_sql_session_categories"  -> TrafficAnalytics.sessionCategoriesSql,
    "q_sql_hourly_patterns"     -> TrafficAnalytics.hourlyPatternsSql,
    "q_sql_quarterly_trend"     -> TrafficAnalytics.quarterlyTrendSql,
    "q_sql_bounce_rate"         -> TrafficAnalytics.bounceRateSql,
    "q_sql_conversion_rate"     -> TrafficAnalytics.conversionRateSql,
    "q_sql_comparison_accuracy" -> TrafficAnalytics.comparisonAccuracySql)
}
