package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Declarative data-quality gates and dimension-history building — the
  * admission control a 100 TB ingest runs before anything downstream is
  * allowed to read a batch.
  *
  * [[dqConstraints]] is a Deequ-style constraint suite (completeness,
  * uniqueness, accepted values, ranges, referential integrity) evaluated
  * in ONE conditional-aggregation pass per table plus key-level anti-joins
  * for the FKs, emitting one row per constraint. [[scd2Intervals]] builds
  * a type-2 slowly-changing-dimension history (versioned validity
  * intervals) from an append-only event log with two window passes.
  *
  * Reference scope: the reference validates nothing before load
  * (`spark_streaming_new.py` writes straight to MySQL); these are the
  * scale-path guardrails its pipeline implies but never implements.
  *
  * Scale posture: constraint evaluation is a full scan with map-side
  * partial aggregation (one shuffle of ONE row per table); FK checks
  * aggregate the fact side to DISTINCT keys first so the anti-join
  * shuffles keys, not rows. SCD2 shuffles once on the entity key; both
  * window passes reuse that single partitioning (same partition keys →
  * no second exchange).
  */
object DataQuality {

  // --------------------------------------------- constraint audit
  /** One row per declared constraint: (constraint_id, tbl, n_rows,
    * violations, viol_ppm, passed). `viol_ppm` uses the one-rounding
    * micro-unit convention (exact in IEEE for counts < 2^53); `passed`
    * is BIGINT 0/1 so both engines hash identically.
    *
    * Each table contributes ONE aggregate job evaluating all its
    * row-local predicates as conditional sums (single scan, single
    * 1-row shuffle); the two referential checks reduce the fact side
    * to distinct keys before the anti-join, which is the posture that
    * survives a 100 TB fact table (the shuffle carries |keys|, and at
    * 100 TB you'd additionally bucket both sides on the key).
    */
  def dqConstraints(spark: SparkSession, dir: String): DataFrame = {
    // ONE aggregate pass per table (round 14): the row-local violation
    // sums, the uniqueness check (n − countDistinct(pk)), and the row
    // count the FK rows reuse all come out of the same scan — the
    // separate unique()/fk-count scans re-read lineitem/orders/
    // documents/customer 4 extra times for numbers one pass already
    // had. `uniqueKey` folds the pk check in as a countDistinct
    // (two-phase agg, still a single scan); the emitted struct rows are
    // unchanged. coalesce like the oracle's CASE..ELSE 0: an all-NULL
    // checked column (or an empty table) must report 0 violations, not
    // a NULL that flips `passed` to 0 in one engine only.
    def suite(tbl: String, df: DataFrame, uniqueKey: Option[String],
              checks: (String, Column)*): DataFrame = {
      val vSums = checks.map { case (id, bad) =>
        coalesce(sum(bad.cast("long")), lit(0L)).as(s"v_$id") }
      val uniq = uniqueKey.map(k =>
        (count(lit(1)) - countDistinct(col(k))).as(s"v_pk_${k}_unique")).toSeq
      val aggs = vSums ++ uniq
      val agg = df.agg(count(lit(1)).as("n"), aggs: _*)
      val rows = checks.map { case (id, _) =>
        struct(lit(id).as("constraint_id"), lit(tbl).as("tbl"),
          col("n").as("n_rows"), col(s"v_$id").as("violations"))
      } ++ uniqueKey.map(k =>
        struct(lit(s"pk_${k}_unique").as("constraint_id"), lit(tbl).as("tbl"),
          col("n").as("n_rows"), col(s"v_pk_${k}_unique").as("violations")))
      agg.select(explode(array(rows: _*)).as("r")).select("r.*")
    }

    val li = lineitem(spark, dir)
    val ord = orders(spark, dir)
    val cust = customer(spark, dir)
    val ev = events(spark, dir)
    val doc = documents(spark, dir)

    val rowLocal = Seq(
      suite("lineitem", li, None,
        "vals_returnflag" -> !col("l_returnflag").isin("A", "N", "R"),
        "vals_linestatus" -> !col("l_linestatus").isin("F", "O"),
        "range_quantity_pos" -> (col("l_quantity").isNull || col("l_quantity") <= 0.0),
        "range_discount_unit" -> (col("l_discount") < 0.0 || col("l_discount") > 1.0)),
      suite("orders", ord, Some("o_orderkey"),
        "vals_orderstatus" -> !col("o_orderstatus").isin("F", "O", "P"),
        "range_totalprice_pos" -> (col("o_totalprice").isNull || col("o_totalprice") <= 0.0),
        "complete_orderdate" -> col("o_orderdate").isNull),
      suite("events", ev, None,
        "vals_event_type" -> !col("event_type").isin("click", "view", "purchase", "signup", "error"),
        "range_value_nonneg" -> (col("value").isNull || col("value") < 0.0),
        "range_ts_window" -> (col("ts").isNull ||
          col("ts") < to_timestamp(lit("2020-01-01 00:00:00")) ||
          col("ts") >= to_timestamp(lit("2030-01-01 00:00:00")))),
      suite("documents", doc, Some("doc_id"),
        "complete_text" -> (col("text").isNull || trim(col("text")) === ""),
        "complete_lang" -> (col("lang").isNull || col("lang") === "")),
      suite("customer", cust, Some("c_custkey")))

    // referential integrity: distinct fact keys anti-join the dimension,
    // violation count = rows carried by the missing keys. The fact's
    // total row count comes from the keyed aggregate itself (sum of
    // per-key counts) — not a second full scan of the fact table.
    def fk(id: String, tbl: String, fact: DataFrame, factKey: String,
           dim: DataFrame, dimKey: String): DataFrame = {
      val keys = fact.groupBy(col(factKey)).agg(count(lit(1)).as("key_rows"))
      val nRows = keys.agg(coalesce(sum(col("key_rows")), lit(0L)).as("n_rows"))
      val missing = keys.join(dim.select(col(dimKey)),
        col(factKey) === col(dimKey), "left_anti")
      missing.agg(coalesce(sum(col("key_rows")), lit(0L)).as("violations"))
        .crossJoin(broadcast(nRows))
        .select(lit(id).as("constraint_id"), lit(tbl).as("tbl"),
          col("n_rows"), col("violations"))
    }

    val all = (rowLocal ++ Seq(
      fk("fk_orders_custkey", "orders", ord, "o_custkey", cust, "c_custkey"),
      fk("fk_lineitem_orderkey", "lineitem", li, "l_orderkey", ord, "o_orderkey")))
      .reduce(_ unionByName _)

    all.select(col("constraint_id"), col("tbl"),
        col("n_rows").cast("long").as("n_rows"),
        col("violations").cast("long").as("violations"),
        when(col("n_rows") === 0L, 0L)          // empty table: 0/0 guard
          .otherwise(floor(col("violations").cast("double") * 1000000.0 /
            col("n_rows").cast("double")).cast("long")).as("viol_ppm"),
        when(col("violations") === 0L, 1L).otherwise(0L).as("passed"))
      .orderBy("constraint_id")
  }

  val dqConstraintsSql: String = {
    def row(id: String, tbl: String, bad: String, from: String) =
      s"""SELECT '$id' AS constraint_id, '$tbl' AS tbl,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(coalesce(sum(CASE WHEN $bad THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations
         |FROM $from""".stripMargin
    val parts = Seq(
      row("vals_returnflag", "lineitem", "l_returnflag NOT IN ('A','N','R')", "lineitem"),
      row("vals_linestatus", "lineitem", "l_linestatus NOT IN ('F','O')", "lineitem"),
      row("range_quantity_pos", "lineitem", "l_quantity IS NULL OR l_quantity <= 0.0", "lineitem"),
      row("range_discount_unit", "lineitem", "l_discount < 0.0 OR l_discount > 1.0", "lineitem"),
      row("vals_orderstatus", "orders", "o_orderstatus NOT IN ('F','O','P')", "orders"),
      row("range_totalprice_pos", "orders", "o_totalprice IS NULL OR o_totalprice <= 0.0", "orders"),
      row("complete_orderdate", "orders", "o_orderdate IS NULL", "orders"),
      row("vals_event_type", "events",
        "event_type NOT IN ('click','view','purchase','signup','error')", "events"),
      row("range_value_nonneg", "events", "value IS NULL OR value < 0.0", "events"),
      row("range_ts_window", "events",
        "ts IS NULL OR ts < TIMESTAMP '2020-01-01 00:00:00' OR ts >= TIMESTAMP '2030-01-01 00:00:00'",
        "events"),
      row("complete_text", "documents", "text IS NULL OR trim(text) = ''", "documents"),
      row("complete_lang", "documents", "lang IS NULL OR lang = ''", "documents"),
      """SELECT 'pk_c_custkey_unique' AS constraint_id, 'customer' AS tbl,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS violations
        |FROM customer""".stripMargin,
      """SELECT 'pk_o_orderkey_unique' AS constraint_id, 'orders' AS tbl,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
        |FROM orders""".stripMargin,
      """SELECT 'pk_doc_id_unique' AS constraint_id, 'documents' AS tbl,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS violations
        |FROM documents""".stripMargin,
      """SELECT 'fk_orders_custkey' AS constraint_id, 'orders' AS tbl,
        |  CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows,
        |  CAST(coalesce((SELECT count(*) FROM orders o
        |    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)), 0) AS BIGINT) AS violations""".stripMargin,
      """SELECT 'fk_lineitem_orderkey' AS constraint_id, 'lineitem' AS tbl,
        |  CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows,
        |  CAST(coalesce((SELECT count(*) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)), 0) AS BIGINT) AS violations""".stripMargin)
    s"""WITH raw AS (
       |${parts.mkString("\nUNION ALL\n")})
       |SELECT constraint_id, tbl, n_rows, violations,
       |  CAST(CASE WHEN n_rows = 0 THEN 0
       |            ELSE floor(CAST(violations AS DOUBLE) * 1000000.0
       |                       / CAST(n_rows AS DOUBLE)) END AS BIGINT) AS viol_ppm,
       |  CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
       |FROM raw ORDER BY constraint_id""".stripMargin
  }

  // --------------------------------------------- SCD2 history build
  /** Sampled-entity modulus: SCD2 output is per-version rows; the audit
    * emits full histories for a deterministic 1-in-25 user sample so the
    * result stays review-sized at any SF while the plan shape (full
    * shuffle on the entity key, two same-key window passes) is the one
    * that runs over all entities in production. */
  private val SCD2_USER_MOD = 25L

  /** Type-2 slowly-changing dimension from the event log: each run of
    * consecutive identical `event_type` states per user becomes one
    * version row with [valid_from, valid_to) validity, `is_current` on
    * the open tail, and exact micro-second duration. The classic
    * gaps-and-islands build: lag() marks state changes, a running sum
    * numbers the islands, groupBy collapses them, lead() closes the
    * intervals. Ties broken by event_id so ordering is total.
    *
    * Both window passes and the groupBy share `user_id` as the leading
    * partition key — one exchange feeds all three operators. */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val sentinel = to_timestamp(lit("2100-01-01 00:00:00"))
    val ev = events(spark, dir)
      .filter(col("user_id") % SCD2_USER_MOD === 0L)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val marked = ev
      .withColumn("prev_state", lag(col("event_type"), 1).over(wOrd))
      .withColumn("chg",
        when(col("prev_state").isNull || col("prev_state") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = marked.groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("state"),       // constant within island
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
    islands
      .withColumn("next_from", lead(col("valid_from"), 1).over(wVer))
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"),
        coalesce(col("next_from"), sentinel).as("valid_to"),
        when(col("next_from").isNull, 1L).otherwise(0L).as("is_current"),
        when(col("next_from").isNull, -1L)
          .otherwise(unix_micros(col("next_from")) - unix_micros(col("valid_from")))
          .as("dur_us"),
        col("n_events"))
      .orderBy("user_id", "version")
  }

  val scd2IntervalsSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_id, event_type
       |  FROM events WHERE user_id % $SCD2_USER_MOD = 0),
       |marked AS (
       |  SELECT *,
       |    CASE WHEN lag(event_type) OVER w IS NULL
       |              OR lag(event_type) OVER w <> event_type
       |         THEN 1 ELSE 0 END AS chg
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |numbered AS (
       |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
       |  FROM marked),
       |islands AS (
       |  SELECT user_id, version, min(event_type) AS state,
       |         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
       |  FROM numbered GROUP BY 1, 2),
       |closed AS (
       |  SELECT *, lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS next_from
       |  FROM islands)
       |SELECT user_id, CAST(version AS BIGINT) AS version, state, valid_from,
       |  coalesce(next_from, TIMESTAMP '2100-01-01 00:00:00') AS valid_to,
       |  CAST(CASE WHEN next_from IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current,
       |  CAST(CASE WHEN next_from IS NULL THEN -1
       |            ELSE epoch_us(next_from) - epoch_us(valid_from) END AS BIGINT) AS dur_us,
       |  n_events
       |FROM closed ORDER BY user_id, version""".stripMargin

  // --------------------------------------------- A/B experiment readout
  /** Hash-based A/B assignment + two-proportion z-test — the experiment
    * readout every product pipeline runs: users split into arms by
    * engine-neutral modular hashing (same family as the split
    * assignments — deterministic, join-free, re-derivable anywhere),
    * conversion = at least one purchase event, and the pooled
    * two-proportion z-statistic in micro-units. Every input to the
    * float math is an exact integer count, so both engines evaluate the
    * identical expression tree (sqrt is correctly rounded in IEEE —
    * safe, unlike ln/exp). One scan + one per-user aggregate + a 2-row
    * rollup; nothing here grows with event volume except the scan.
    *
    * CONTRACT: an EMPTY arm yields an EMPTY readout (the 1-row × 1-row
    * combine vanishes — there is no experiment to read out without both
    * arms; the z-test is undefined with n=0 anyway). Callers alerting
    * on experiment health should treat zero rows as "assignment broken",
    * not "no significance". The SQL oracle has the identical shape, and
    * `DataQualitySpec` pins the empty-arm behavior. */
  def abTestReadout(spark: SparkSession, dir: String): DataFrame = {
    // odd Knuth multiplier, mod-first so intermediates stay < 2^63 at
    // any id scale; an even multiplier would send every id to one arm
    val arm = when((col("user_id") % 1000003L) * 2654435761L % 1000003L % 2L === 0L,
      "A").otherwise("B")
    // conversion = at least one HIGH-VALUE purchase (>200): a metric
    // with real variance at every SF — plain "any purchase" saturates
    // to p=1 on the uniformly-active synthetic users, which degenerates
    // the pooled variance to 0 (and ANSI mode rightly refuses the 0/0)
    val perUser = events(spark, dir)
      .select(col("user_id"),
        (col("event_type") === "purchase" && col("value") > 200.0)
          .cast("long").as("p"))
      .groupBy(col("user_id")).agg(max(col("p")).as("converted"))
    val arms = perUser.select(arm.as("arm"), col("converted"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("conv"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n_users").as("n_a"), col("conv").as("conv_a"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n_users").as("n_b"), col("conv").as("conv_b"))
    val (na, nb, ca, cb) = (col("n_a").cast("double"), col("n_b").cast("double"),
      col("conv_a").cast("double"), col("conv_b").cast("double"))
    val pPool = (ca + cb) / (na + nb)
    val z = (ca / na - cb / nb) /
      sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / na + lit(1.0) / nb))
    a.crossJoin(broadcast(b)).select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      floor(ca * 1000000.0 / na).cast("long").as("cr_a_ppm"),
      floor(cb * 1000000.0 / nb).cast("long").as("cr_b_ppm"),
      floor(z * 1000000.0 + lit(0.5)).cast("long").as("z_mu"),
      when(abs(z) > 1.959964, 1L).otherwise(0L).as("significant_95"))
  }

  val abTestReadoutSql: String =
    """WITH pu AS (
      |  SELECT user_id, max(CASE WHEN event_type = 'purchase' AND value > 200.0
      |                           THEN 1 ELSE 0 END) AS converted
      |  FROM events GROUP BY 1),
      |arms AS (
      |  SELECT CASE WHEN (user_id % 1000003) * 2654435761 % 1000003 % 2 = 0
      |              THEN 'A' ELSE 'B' END AS arm,
      |         CAST(count(*) AS BIGINT) AS n_users,
      |         CAST(sum(converted) AS BIGINT) AS conv
      |  FROM pu GROUP BY 1),
      |a AS (SELECT n_users AS n_a, conv AS conv_a FROM arms WHERE arm = 'A'),
      |b AS (SELECT n_users AS n_b, conv AS conv_b FROM arms WHERE arm = 'B'),
      |j AS (SELECT *,
      |        (CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
      |          / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS p_pool
      |      FROM a, b),
      |zc AS (SELECT *,
      |        (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      |          - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
      |        / sqrt(p_pool * (1.0 - p_pool)
      |               * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS z
      |      FROM j)
      |SELECT n_a, conv_a, n_b, conv_b,
      |  CAST(floor(CAST(conv_a AS DOUBLE) * 1000000.0 / CAST(n_a AS DOUBLE)) AS BIGINT) AS cr_a_ppm,
      |  CAST(floor(CAST(conv_b AS DOUBLE) * 1000000.0 / CAST(n_b AS DOUBLE)) AS BIGINT) AS cr_b_ppm,
      |  CAST(floor(z * 1000000.0 + 0.5) AS BIGINT) AS z_mu,
      |  CAST(CASE WHEN abs(z) > 1.959964 THEN 1 ELSE 0 END AS BIGINT) AS significant_95
      |FROM zc""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_constraints" -> dqConstraints _,
    "q_ab_test" -> abTestReadout _,
    "q_scd2_intervals" -> scd2Intervals _)

  val oracles: Map[String, String] = Map(
    "q_dq_constraints" -> dqConstraintsSql,
    "q_ab_test" -> abTestReadoutSql,
    "q_scd2_intervals" -> scd2IntervalsSql)
}
