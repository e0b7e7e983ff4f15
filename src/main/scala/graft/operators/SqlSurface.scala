package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The reference's SQL-STRING surface, first-class: its batch interface
  * is literal SQL (`batch_stream.sql` CTAS statements over the
  * warehouse tables), so a user switching engines brings SQL text, not
  * DataFrame code. These queries run the reference's three headline
  * batch analytics as `spark.sql(...)` strings over a registered
  * `events` temp view — same results, same DuckDB oracles as their
  * DataFrame twins (`TrafficAnalytics.engagementWindowed` /
  * `sessionCategories` / `hourlyPatterns`), proving the engine's
  * SQL-text and DataFrame paths are interchangeable (they compile to
  * the same Catalyst plans; Spark parses SQL into the identical logical
  * operators the DataFrame API builds).
  *
  * Reference: batch_stream.sql:57-74 (engagement), :27-50 (session
  * categories), spark_streaming_new.py:227-239 (hourly patterns).
  *
  * Scale: identical to the DataFrame twins — one hash aggregate over a
  * low-cardinality (window × enum) key, decimal-exact means per the
  * Tables.dsum discipline (spelled inline in SQL).
  */
object SqlSurface {

  /** Register the session-local view the SQL strings read. Goes through
    * [[Tables.events]] so the ts type-dispatch (nanos-long vs micros
    * timestamp parquet generations) applies to the SQL path too. */
  private def withEventsView(spark: SparkSession, dir: String): Unit =
    Tables.events(spark, dir).createOrReplaceTempView("events")

  private val davgSql =
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)"

  def sqlEngagement(spark: SparkSession, dir: String): DataFrame = {
    withEventsView(spark, dir)
    spark.sql(
      s"""SELECT w.start AS window_start, w.end AS window_end,
         |       $davgSql AS avg_score,
         |       min(value) AS min_score,
         |       max(value) AS max_score
         |FROM (SELECT window(ts, '5 minutes') AS w, value FROM events)
         |GROUP BY w ORDER BY window_start""".stripMargin)
  }

  def sqlSessionCategories(spark: SparkSession, dir: String): DataFrame = {
    withEventsView(spark, dir)
    spark.sql(
      """WITH b AS (
        |  SELECT window(ts, '5 minutes') AS w,
        |         CASE WHEN value < 50.0 THEN 'Short'
        |              WHEN value <= 150.0 THEN 'Medium'
        |              ELSE 'Long' END AS session_category
        |  FROM events)
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

  def sqlHourlyPatterns(spark: SparkSession, dir: String): DataFrame = {
    withEventsView(spark, dir)
    spark.sql(
      s"""SELECT hour(ts) AS hour_of_day,
         |       count(*) AS visit_count,
         |       $davgSql AS avg_value,
         |       min(value) AS min_value,
         |       max(value) AS max_value,
         |       count(DISTINCT user_id) AS unique_users
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_engagement"         -> sqlEngagement _,
    "q_sql_session_categories" -> sqlSessionCategories _,
    "q_sql_hourly_patterns"    -> sqlHourlyPatterns _)

  /** Same oracles as the DataFrame twins — the whole point: two engine
    * surfaces, one answer. */
  val oracles: Map[String, String] = Map(
    "q_sql_engagement"         -> TrafficAnalytics.engagementWindowedSql,
    "q_sql_session_categories" -> TrafficAnalytics.sessionCategoriesSql,
    "q_sql_hourly_patterns"    -> TrafficAnalytics.hourlyPatternsSql)
}
