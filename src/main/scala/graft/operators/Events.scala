package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.Parity._

/** Event-table operators: the reference's idempotency/latest-version
  * semantics (README.md:114, main.yml:136-141) plus batch equivalents of
  * the event-time operations SURVEY §2.10 maps to Structured Streaming.
  *
  * Time arithmetic is done on the exact nanosecond long (`ts_ns`) so gap
  * math is engine-independent; calendar bucketing uses the µs timestamp.
  */
object Events {

  /** Q20: latest record per key (A7/W4, main.yml:137 `sort -V | tail -1`
    * analog — the window row_number idiom). */
  def latestPerUser(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("date").as("event_day"),
        dec2(money(col("value"))).as("value"))
      .orderBy(col("user_id"))
  }

  val latestPerUserSql: String =
    """SELECT user_id, event_id, event_type,
      |  CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_day,
      |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Q21: tumbling event-time window as a batch aggregation (§2.10;
    * streaming form lives in graft.streaming.EventStream). */
  def tumblingHour(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.withColumn("event_day", col("ts").cast("date"))
      .withColumn("hr", hour(col("ts")).cast("bigint"))
      .groupBy(col("event_day"), col("hr"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        dec2(sum(money(col("value")))).as("sum_value"))
      .orderBy(col("event_day"), col("hr"), col("event_type"))
  }

  val tumblingHourSql: String =
    """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_day,
      |  CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
      |  event_type, COUNT(*) AS n,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2, 3 ORDER BY event_day, hr, event_type""".stripMargin

  /** Q57: sliding event-time window (1 h size / 30 min slide) as a batch
    * aggregation — each event contributes to exactly 2 overlapping
    * windows. Spark's `window()` generates the window set natively; the
    * oracle mirrors it by unioning the two epoch-aligned bucket
    * assignments. Complements q21 (tumbling) and q38 (streaming). */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dec2(sum(money(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val slidingWindowSql: String =
    """WITH assigned AS (
      |  SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000) * 1800000000) AS window_start,
      |    event_type, value
      |  FROM events
      |  UNION ALL
      |  SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000) * 1800000000) - INTERVAL 30 MINUTE AS window_start,
      |    event_type, value
      |  FROM events)
      |SELECT window_start, event_type, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      |FROM assigned GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Q22: gap-based sessionization — two stacked windows (lag to flag
    * session starts, running sum to number sessions). Gap math on exact
    * nanos; 30-minute gap. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    ev.withColumn("prev_ns", lag(col("ts_ns"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > gapNs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"))
      .agg(
        max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id,
      |    CASE WHEN LAG(epoch_ns(ts)) OVER w IS NULL
      |           OR epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > 30*60*1000000000::BIGINT
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id))
      |SELECT user_id,
      |  CAST(SUM(new_session) AS BIGINT) AS n_sessions,
      |  COUNT(*) AS n_events
      |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Q23: dedup by key (A6, README.md:114 idempotent re-delivery) —
    * exact duplicate drop on a business key, keeping the earliest. */
  def dedupEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ns"), col("event_id"))
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_first_events"))
      .orderBy(col("event_type"))
  }

  val dedupEventsSql: String =
    """SELECT event_type, COUNT(*) AS n_first_events FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY epoch_ns(ts), event_id) AS rn
      |  FROM events)
      |WHERE rn = 1 GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q54: as-of join — each purchase matched to the user's latest click
    * at-or-before it (the canonical event-attribution shape; named in
    * the brief as an operator Spark lacks natively).
    *
    * Implementation follows the brief's preference (a), composition:
    * union the two tagged streams, ONE window pass per user carries the
    * last-seen click forward (last_value ignoreNulls over an unbounded
    * preceding frame), keep purchase rows. One shuffle on user_id —
    * same cost as a plain window — vs a range-join's quadratic
    * per-user pair space. Ties (click.ts == purchase.ts) match, with
    * event_id as the deterministic inner tiebreak; the oracle mirrors
    * this with an ordered LATERAL LIMIT 1. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    // all comparisons in µs space: the oracle only sees µs-truncated
    // timestamps, so ordering/gaps on exact nanos could diverge inside
    // a microsecond
    val ev = Tables.events(spark, dir).withColumn("ts_us", expr("ts_ns div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"), lit(0).as("side"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"), lit(1).as("side"))
    // clicks sort before same-ts purchases (side 0 < 1) => "<=" semantics
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn("click_id",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts_us",
        last(when(col("side") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("user_id"), col("event_id").as("purchase_id"), col("click_id"),
        (col("ts_us") - col("click_ts_us")).as("gap_us"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  val asofJoinSql: String =
    """SELECT b.user_id, b.event_id AS purchase_id, a.event_id AS click_id,
      |  epoch_us(b.ts) - a.us AS gap_us
      |FROM events b
      |LEFT JOIN LATERAL (
      |  SELECT c.event_id, epoch_us(c.ts) AS us
      |  FROM events c
      |  WHERE c.event_type = 'click' AND c.user_id = b.user_id
      |    AND epoch_us(c.ts) <= epoch_us(b.ts)
      |  ORDER BY epoch_us(c.ts) DESC, c.event_id DESC
      |  LIMIT 1) a ON TRUE
      |WHERE b.event_type = 'purchase'
      |ORDER BY b.user_id, purchase_id""".stripMargin

  /** Q55: band (range) join — same-user error/click pairs within ±1
    * hour. The scalable shape for big-big range joins: bucketize time
    * to the band width, explode one side into its 3 candidate buckets
    * ({b-1, b, b+1}), EQUI-join on (user, bucket), then verify the
    * exact band predicate — candidate space is O(rows in adjacent
    * buckets), not the O(n_a x n_b) a raw theta-join (BNLJ) scans.
    * All in µs (oracle's truncated-timestamp domain). */
  def bandJoin(spark: SparkSession, dir: String): DataFrame = {
    val bandUs = 3600L * 1000 * 1000
    val ev = Tables.events(spark, dir).withColumn("ts_us", expr("ts_ns div 1000"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        col("ts_us").as("err_us"))
      .withColumn("bucket",
        explode(array((-1 to 1).map(d => expr(s"err_us div $bandUs + $d")): _*)))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_us").as("click_us"))
      .withColumn("bucket", expr(s"click_us div $bandUs"))
    errors.join(clicks, Seq("user_id", "bucket"))
      .filter(abs(col("err_us") - col("click_us")) <= bandUs)
      .select(col("user_id"), col("error_id"), col("click_id"),
        // no distinct needed: the 3 exploded error buckets are distinct
        // values and each click has exactly one bucket, so a given
        // (error, click) pair matches in at most one bucket
        (col("err_us") - col("click_us")).as("delta_us"))
      .orderBy(col("user_id"), col("error_id"), col("click_id"))
  }

  val bandJoinSql: String =
    """SELECT e.user_id, e.event_id AS error_id, c.event_id AS click_id,
      |  epoch_us(e.ts) - epoch_us(c.ts) AS delta_us
      |FROM events e JOIN events c
      |  ON e.user_id = c.user_id
      | AND e.event_type = 'error' AND c.event_type = 'click'
      | AND ABS(epoch_us(e.ts) - epoch_us(c.ts)) <= 3600000000
      |ORDER BY e.user_id, error_id, click_id""".stripMargin

  /** Q65: skew-mitigated aggregation — the event_type key is genuinely
    * hot (a handful of distinct values over the whole corpus, so a plain
    * groupBy funnels everything through ~5 reducers no matter how many
    * executors exist). [[graft.functions.Skew.saltedAgg]] splits each
    * hot group into 8 deterministic salt buckets for the partial
    * aggregate, then combines per key — two small shuffles instead of
    * one skewed one. Result-identical to the plain aggregation BY
    * CONSTRUCTION for algebraic aggregates; the oracle is the plain
    * GROUP BY. All aggregates here are order-independent (counts, exact
    * decimal sums, min/max) so the salted regrouping cannot perturb
    * values — a double sum would repartition the fp addition order. */
  def saltedHotKeyAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), col("ts_ns"))
    graft.functions.Skew.saltedAgg(ev, "event_type", salt = 8)(
      Seq(
        count(lit(1)).as("n"),
        sum(money(col("value"))).as("sv"),
        min(col("ts_ns")).as("mn"),
        max(col("ts_ns")).as("mx")),
      Seq(
        sum(col("n")).as("n_events"),
        dec2(sum(col("sv"))).as("total_value"),
        expr("min(mn) div 1000").as("first_us"),
        expr("max(mx) div 1000").as("last_us")))
      .orderBy(col("event_type"))
  }

  val saltedHotKeyAggSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_value,
      |  MIN(epoch_ns(ts)) // 1000 AS first_us,
      |  MAX(epoch_ns(ts)) // 1000 AS last_us
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q67: funnel analysis — first-touch sequential conversion
    * view -> click -> purchase per user: the first view, the first click
    * AT OR AFTER that view, the first purchase at or after that click.
    * Each stage is a (filter -> join on user -> min) chain, so the
    * sequential dependency is expressed as equi-joins + hash aggregates
    * on user_id (high cardinality — even reducers at scale), never a
    * window over the full event stream. All time math on exact integer
    * MICROSECONDS: DuckDB's parquet reader floors TIMESTAMP(NANOS) to µs
    * on read — an ENGINE property that holds regardless of the data.
    * (Today's testdata happens to be µs-aligned with zero sub-µs rows,
    * Tables.scala µs-alignment contract, so ns- and µs-granularity
    * comparisons agree — but flooring BEFORE the min/compare, which
    * commute, keeps both engines on identical integers even if a future
    * corpus carries real sub-µs components.) q83's struct sort leans on
    * the same contract. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"))
    def stage(evType: String, after: DataFrame, afterCol: String, outCol: String) =
      ev.filter(col("event_type") === evType)
        .join(after, Seq("user_id"))
        .filter(col("ts_us") >= col(afterCol))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as(outCol))
    val viewed = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_view"))
    val clicked = stage("click", viewed, "t_view", "t_click")
    val purchased = stage("purchase", clicked, "t_click", "t_purchase")
    viewed
      .join(clicked.select(col("user_id"), col("t_click")), Seq("user_id"), "left")
      .join(purchased.select(col("user_id"), col("t_purchase")), Seq("user_id"), "left")
      .agg(
        count(col("t_view")).as("n_viewed"),
        count(col("t_click")).as("n_clicked_after_view"),
        count(col("t_purchase")).as("n_purchased_after_click"))
  }

  val funnelSql: String =
    """WITH v AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS t_view
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t_view
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t_click
      |  GROUP BY e.user_id)
      |SELECT COUNT(v.t_view) AS n_viewed,
      |  COUNT(c.t_click) AS n_clicked_after_view,
      |  COUNT(p.t_purchase) AS n_purchased_after_click
      |FROM v
      |LEFT JOIN c ON v.user_id = c.user_id
      |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin

  /** Q70: native session windows — Spark's `session_window` primitive
    * (the idiomatic form of q22's hand-rolled lag/sum sessionizer and
    * q40's flatMapGroupsWithState; unlike those, this one runs
    * unchanged in batch AND streaming). Semantics pinned exactly: each
    * event spans [ts, ts+gap) and overlapping spans merge, so two
    * events split sessions iff their gap is >= 30 min — the oracle
    * mirrors that boundary (q22's custom sessionizer uses strictly->,
    * a deliberate semantic difference documented here). All boundary
    * math lands in µs on both engines. */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))
  }

  val sessionWindowSql: String =
    """WITH flagged AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 30*60*1000000::BIGINT
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
      |numbered AS (
      |  SELECT user_id, us,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(us) AS session_start_us,
      |  MAX(us) + 30*60*1000000 AS session_end_us,
      |  COUNT(*) AS n_events
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  /** Q77: time-series gap filling — materialize the dense per-user
    * hourly grid between each user's first and last active hour,
    * zero-filling event counts and carrying the last known hourly
    * value forward across gaps (`last(..., ignoreNulls)` over an
    * explicit ROWS frame; IGNORE NULLS is the semantics regression
    * tests usually miss). The grid generates from each user's own
    * span (`sequence` + explode), so grid size is activity-bounded,
    * not calendar-bounded.
    *
    * Scale: span aggregation and grid join both partition by
    * user_id (high cardinality); the generated grid is O(active
    * span), never a calendar cross-join. The user_id < 5 bound only
    * sizes harness output. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .filter(col("user_id") < 5)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(
        count(lit(1)).as("n_events"),
        dec2(sum(money(col("value")))).as("sum_value"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(
        col("user_id"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("sum_value"), ignoreNulls = true).over(w).as("carried_value"))
      .orderBy(col("user_id"), col("hour"))
  }

  val gapFillSql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu, value FROM events WHERE user_id < 5),
      |hourly AS (
      |  SELECT user_id, date_trunc('hour', tsu) AS hour, COUNT(*) AS n_events,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      |  FROM ev GROUP BY 1, 2),
      |spans AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1),
      |grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM spans)
      |SELECT g.user_id, g.hour, COALESCE(h.n_events, 0) AS n_events,
      |  LAST_VALUE(h.sum_value IGNORE NULLS)
      |    OVER (PARTITION BY g.user_id ORDER BY g.hour
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_value
      |FROM grid g LEFT JOIN hourly h USING (user_id, hour)
      |ORDER BY user_id, hour""".stripMargin

  /** Q78: event-time RANGE frame — rolling trailing-hour count and sum
    * per user where the frame is defined by VALUE distance (epoch
    * seconds within 3599 of the current row), not row count: sparse
    * users get small frames, bursts get large ones, and same-second
    * peers share one frame — semantics a ROWS frame (q9) cannot
    * express. One shuffle on user_id; the frame scan is a moving
    * pointer over each partition's sort, same cost class as q9. */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
      .rangeBetween(-3599, 0)
    Tables.events(spark, dir)
      .withColumn("epoch_s", expr("ts_ns div 1000000000"))
      .select(
        col("user_id"), col("event_id"), col("epoch_s"),
        count(lit(1)).over(w).as("n_1h"),
        dec2(sum(money(col("value"))).over(w)).as("sum_1h"))
      .orderBy(col("user_id"), col("epoch_s"), col("event_id"))
  }

  val rangeFrameSql: String =
    """SELECT user_id, event_id, epoch_s,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DECIMAL(38,2)) AS DOUBLE) AS sum_1h
      |FROM (SELECT user_id, event_id, value, epoch_ns(ts) // 1000000000 AS epoch_s FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, epoch_s, event_id""".stripMargin

  /** Q83: behavioral sequence assembly — each user's ordered
    * event-type trail as one string, the per-entity sequence a
    * training pipeline feeds a behavioral model. `collect_list` alone
    * is NOT deterministic under parallelism (arrival order differs per
    * shuffle); determinism comes from collecting (ts_us, event_id,
    * type) structs and `array_sort`ing them post-agg — the struct
    * comparator orders by field position, and event_id breaks ts
    * ties. The sort key is ts FLOORED TO µs, not raw ns: DuckDB reads
    * TIMESTAMP(NANOS) parquet µs-floored (see q67's contract), so its
    * ORDER BY engages the event_id tiebreak at µs granularity — sorting
    * here at the same granularity keeps the two engines' tiebreaks
    * identical even for a corpus with real sub-µs components. One hash
    * agg on user_id; per-group memory is bounded by a user's own
    * activity (cap with `slice` after the sort if a pathological
    * entity needs it). */
  def userSequences(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .filter(col("user_id") < 10)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              expr("ts_ns div 1000").as("ts_us"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          ">").as("seq"))
      .orderBy(col("user_id"))
  }

  val userSequencesSql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  string_agg(event_type, '>' ORDER BY epoch_ns(ts), event_id) AS seq
      |FROM events WHERE user_id < 10
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Q98: SCD TYPE-2 dimension build — turn each user's change stream
    * into versioned rows with half-open validity intervals
    * [valid_from, valid_to), the standard warehouse shape for
    * point-in-time attribute lookup (q54's as-of join is its read
    * side). A version OPENS only when the tracked attribute actually
    * changes (lag compare — raw parquet doubles compared bit-for-bit,
    * no arithmetic, so both engines see identical change points);
    * valid_to is the next version's valid_from, NULL for the current
    * row.
    *
    * Scale shape: two windows over the same high-cardinality
    * (user_id) key — Catalyst plans them into ONE shuffle+sort pass
    * (PlanAudit: the second exchange is the output sort) — and
    * timestamps ride as µs BIGINTs end-to-end. Unlike q83's struct
    * sort, this is µs-exact for ANY data: Spark floors real ns to µs
    * here, and DuckDB's µs-floored read then divides to the same µs
    * (q67's engine-floor contract) — so ordering ties engage the
    * event_id tiebreak at identical granularity on both engines. */
  def scd2Build(spark: SparkSession, dir: String): DataFrame =
    scd2Of(Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("ts_us"), col("value")))

  /** The SCD2 core over any (user_id, event_id, ts_us, value) change
    * frame; exposed for the spec's synthetic NULL-run cases. */
  private[graft] def scd2Of(ev: DataFrame): DataFrame =
    scd2Versions(ev).orderBy(col("user_id"), col("version"))

  /** [[scd2Of]] without the presentation sort — the consumer shape
    * (q144 re-shuffles by user immediately, so a global sort between
    * build and consume would be pure wasted work). */
  private[graft] def scd2Versions(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    // null-safe change test (<=>): a plain <> would DROP a NULL-valued
    // transition (prev <> NULL is null-falsey) and then open a spurious
    // duplicate version on the next non-null row (its lag IS NULL) — an
    // A -> NULL -> A run must yield three versions, not two equal ones.
    // Oracle twin: IS DISTINCT FROM. Latent on this corpus (no null
    // values) but load-bearing for any real change stream.
    ev.withColumn("prev_value", lag(col("value"), 1).over(byUser))
      .withColumn("first_row", row_number().over(byUser) === 1)
      .filter(col("first_row") || !(col("prev_value") <=> col("value")))
      .withColumn("version", row_number().over(byUser).cast("bigint"))
      .withColumn("valid_from_us", col("ts_us"))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(byUser))
      .withColumn("is_current",
        when(col("valid_to_us").isNull, 1L).otherwise(0L))
      .select(col("user_id"), col("version"), col("valid_from_us"),
        col("valid_to_us"), col("value"), col("is_current"))
  }

  val scd2BuildSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, value,
      |    LAG(value) OVER w AS prev_value,
      |    ROW_NUMBER() OVER w AS rn
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)),
      |changes AS (
      |  SELECT user_id, event_id, ts_us, value FROM ev
      |  WHERE rn = 1 OR prev_value IS DISTINCT FROM value)
      |SELECT user_id,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
      |  ts_us AS valid_from_us,
      |  LEAD(ts_us) OVER w AS valid_to_us,
      |  value,
      |  CAST(CASE WHEN LEAD(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM changes
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** Q144: POINT-IN-TIME SCD2 LOOKUP — q98's consumer and the
    * correctness contract every versioned warehouse dim exists for:
    * each purchase reads the dimension version that was VALID AT ITS
    * TIMESTAMP (`valid_from <= ts < valid_to`, open tail = +inf), the
    * join auditors call "PIT correctness" because an accidental
    * latest-version join silently leaks the future into training
    * features.
    *
    * Two genuinely different algorithms must agree here, and that IS
    * the check: the oracle runs the textbook interval join, while the
    * Spark side runs the merge shape — union the version-open rows
    * with the facts, one per-user ordered window carries the latest
    * version struct forward, keep facts. The merge is the high-churn-
    * safe plan: ONE user-colocating shuffle and O(timeline log) work,
    * with NO per-user versions×facts expansion (an interval equi-join
    * explodes quadratically per key when the dim churns fast, as this
    * one does — for a truly slow dim with bounded versions per key the
    * join form is fine and q55's bucketing handles the in-between).
    * Same-µs convention: a version opening at the fact's exact µs IS
    * visible (dim side sorts first), and of same-µs version runs only
    * the last survives — exactly the empty-interval semantics
    * `from <= ts < to` gives the oracle. The carried struct (not bare
    * columns) keeps NULL-valued versions honest: the struct is
    * non-null whenever a version row is, so `last_value ignoreNulls`
    * can never skip a NULL-valued version and resurrect stale state. */
  def pitLookup(spark: SparkSession, dir: String): DataFrame =
    pitOf(Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"), col("value")))

  /** The PIT core over any (user_id, event_id, event_type, ts_us,
    * value) frame; exposed for the spec's synthetic NULL-version
    * cases (the struct-carry guard is unreachable on this corpus). */
  private[graft] def pitOf(ev: DataFrame): DataFrame = {
    val dimSide = scd2Versions(ev.select(col("user_id"), col("event_id"),
        col("ts_us"), col("value")))
      .select(col("user_id"), col("valid_from_us").as("ts_us"),
        lit(0).as("side"), col("version"),
        struct(col("version").as("v"), col("value").as("x")).as("packed"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("fact_value"))
    val factSide = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), lit(1).as("side"),
        lit(null).cast("long").as("version"),
        lit(null).cast("struct<v:bigint,x:double>").as("packed"),
        col("event_id"), col("value").as("fact_value"))
    // fact rows tie arbitrarily among themselves at the same µs, which
    // cannot matter: they contribute NULL to the carried struct, so
    // every fact reads a value determined solely by the dim prefix
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"), col("version"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dimSide.unionByName(factSide)
      .withColumn("state", last(col("packed"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("user_id"), col("event_id"), col("ts_us").as("purchase_us"),
        dec2(money(col("fact_value"))).as("value"),
        col("state.v").as("state_version"),
        dec2(money(col("state.x"))).as("state_value"))
      .orderBy(col("user_id"), col("purchase_us"), col("event_id"))
  }

  val pitLookupSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS ts_us, value,
      |    LAG(value) OVER w AS prev_value,
      |    ROW_NUMBER() OVER w AS rn
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)),
      |changes AS (
      |  SELECT user_id, event_id, ts_us, value FROM ev
      |  WHERE rn = 1 OR prev_value IS DISTINCT FROM value),
      |scd2 AS (
      |  SELECT user_id,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
      |    ts_us AS valid_from_us,
      |    LEAD(ts_us) OVER w AS valid_to_us,
      |    value
      |  FROM changes
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |p AS (SELECT user_id, event_id, ts_us, value FROM ev
      |      WHERE event_type = 'purchase')
      |SELECT p.user_id, p.event_id, p.ts_us AS purchase_us,
      |  CAST(CAST(p.value AS DECIMAL(18,2)) AS DOUBLE) AS value,
      |  s.version AS state_version,
      |  CAST(CAST(s.value AS DECIMAL(18,2)) AS DOUBLE) AS state_value
      |FROM p JOIN scd2 s ON p.user_id = s.user_id
      |  AND s.valid_from_us <= p.ts_us
      |  AND (s.valid_to_us IS NULL OR p.ts_us < s.valid_to_us)
      |ORDER BY p.user_id, purchase_us, event_id""".stripMargin

  /** Q123: RETENTION COHORTS — the classic cohort-retention triangle:
    * users are cohorted by their first-active day; each (cohort_day,
    * day_offset) cell counts the cohort members active that many days
    * later, with retention as the fraction of the cohort's day-0 size.
    * Day arithmetic runs on the exact nanosecond long (ns div
    * 86_400_000_000_000), so both engines bucket identically with no
    * calendar/timezone surface at all.
    *
    * Scale shape: ONE row-scale shuffle — each user's distinct active
    * days collapse into a single map-side-combining `collect_set`
    * (bounded by the calendar span, not by event volume: a user has at
    * most |days| entries), and cohort/offset cells explode from that
    * per-user set, so the naive distinct -> first-seen agg -> activity
    * self-join chain (6 exchanges) becomes aggregate -> explode ->
    * bounded-cell agg (4). The cell frame is bounded by |days|²; the
    * day-0 denominator is a window over each cohort's bounded row
    * group — never a second scan. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("day"))).as("ds"))
    val w = Window.partitionBy(col("cohort_day"))
    perUser
      .select(element_at(col("ds"), 1).as("cohort_day"),
        explode(transform(col("ds"), d => d - element_at(col("ds"), 1)))
          .as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users")) // per-user days distinct already
      .withColumn("retention", dec6(col("n_users").cast("decimal(18,0)")
        / max(when(col("day_offset") === 0, col("n_users"))).over(w)))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val retentionCohortsSql: String =
    """WITH e AS (SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
      |           FROM events),
      |f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1),
      |a AS (SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
      |        COUNT(DISTINCT e.user_id) AS n_users
      |      FROM e JOIN f USING (user_id) GROUP BY 1, 2)
      |SELECT cohort_day, day_offset, CAST(n_users AS BIGINT) AS n_users,
      |  CAST((2 * n_users * 1000000
      |      + MAX(CASE WHEN day_offset = 0 THEN n_users END)
      |          OVER (PARTITION BY cohort_day))
      |    // (2 * MAX(CASE WHEN day_offset = 0 THEN n_users END)
      |          OVER (PARTITION BY cohort_day)) AS DOUBLE) / 1000000 AS retention
      |FROM a ORDER BY cohort_day, day_offset""".stripMargin

  /** Q124: BURST DETECTION — time-series anomaly flagging over the
    * event stream: hourly counts per event type, compared against the
    * trailing 6-hour window, flagging hours whose count exceeds 1.5x
    * the trailing mean with at least 3 hours of history. The flag test
    * is cross-multiplied to pure BIGINT (2·n·hours_prev > 3·sum_prev),
    * so no float boundary can disagree between engines; the reported
    * ratio is the one dec6 division, computed after the flag.
    *
    * Hour bucketing is exact ns-long division (ts_ns div 3.6e12) —
    * zero calendar surface, like q123. Scale shape: one shuffle into
    * the (event_type, hour) aggregation (map-side combining, frame
    * bounded by |types| x |hours|); the trailing comparison is a
    * RANGE window within each type's bounded, already-partitioned
    * group. Event volume only affects the first aggregation's input. */
  def burstDetection(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rangeBetween(-6, -1)
    Tables.events(spark, dir)
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hours_prev", count(col("n")).over(w))
      .withColumn("sum_prev", coalesce(sum(col("n")).over(w), lit(0L)))
      .filter(col("hours_prev") >= 3 &&
        lit(2L) * col("n") * col("hours_prev") > lit(3L) * col("sum_prev"))
      .withColumn("burst_ratio", dec6(
        (col("n") * col("hours_prev")).cast("decimal(18,0)") / col("sum_prev")))
      .select(col("event_type"), col("hr"), col("n"),
        col("hours_prev"), col("sum_prev"), col("burst_ratio"))
      .orderBy(col("event_type"), col("hr"))
  }

  val burstDetectionSql: String =
    """WITH h AS (SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
      |             COUNT(*) AS n
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, hr, n,
      |    COUNT(n) OVER (PARTITION BY event_type ORDER BY hr
      |                   RANGE BETWEEN 6 PRECEDING AND 1 PRECEDING) AS hours_prev,
      |    COALESCE(SUM(n) OVER (PARTITION BY event_type ORDER BY hr
      |                          RANGE BETWEEN 6 PRECEDING AND 1 PRECEDING), 0) AS sum_prev
      |  FROM h)
      |SELECT event_type, hr, CAST(n AS BIGINT) AS n,
      |  CAST(hours_prev AS BIGINT) AS hours_prev,
      |  CAST(sum_prev AS BIGINT) AS sum_prev,
      |  CAST((2 * n * hours_prev * 1000000 + sum_prev) // (2 * sum_prev) AS DOUBLE)
      |    / 1000000 AS burst_ratio
      |FROM w
      |WHERE hours_prev >= 3 AND 2 * n * hours_prev > 3 * sum_prev
      |ORDER BY event_type, hr""".stripMargin

  /** Q127: EVENT TRIGRAM MINING — sequential-pattern mining over the
    * event stream: each user's time-ordered event-type sequence is
    * slid into consecutive trigrams (lead/lead2 over the per-user
    * window, ties broken by event_id — the q83/q67 ordering contract),
    * and the global top-20 patterns are reported with counts and a
    * dense rank. The behavioral-motif report (view→click→purchase vs
    * view→view→error) that funnel analysis (q67) fixes a priori —
    * here the patterns are DISCOVERED.
    *
    * Scale shape: one shuffle into the per-user window (the sequence
    * never leaves its partition), one map-side-combining aggregation
    * over a frame bounded by |types|³, and a TakeOrdered top-20 —
    * never a global sort. */
  def eventTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    val ranked = Window.orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3")).limit(20)
      .withColumn("rnk", row_number().over(ranked).cast("bigint")) // 20 rows
      .select(col("rnk"), col("e1"), col("e2"), col("e3"), col("n"))
      .orderBy(col("rnk"))
  }

  val eventTrigramsSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type AS e1,
      |    LEAD(event_type, 1) OVER w AS e2,
      |    LEAD(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
      |g AS (SELECT e1, e2, e3, COUNT(*) AS n FROM s WHERE e3 IS NOT NULL
      |      GROUP BY 1, 2, 3)
      |SELECT rnk, e1, e2, e3, n FROM (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, e1, e2, e3) AS BIGINT) AS rnk,
      |    e1, e2, e3, CAST(n AS BIGINT) AS n
      |  FROM g)
      |WHERE rnk <= 20 ORDER BY rnk""".stripMargin

  /** Q128: APPROXIMATE QUANTILES — the quantile member of the sketch
    * family (q49 HLL distinct, q107 count-min, q119/q31 MinHash, q32
    * SimHash): per-type p50/p95/p99 of the value stream via Spark's
    * GK-style `percentile_approx` with accuracy 10000, the mergeable
    * bounded-memory path where the exact rank machinery (q51/q91/q94)
    * is the audit tool. No oracle (sketch internals are
    * engine-specific — the q49 rule); EventsSpec pins the GK rank-error
    * contract against exact percentiles: at sf0.001 n < accuracy, so
    * the sketch must be EXACT, and the quantile chain must be
    * monotone.
    *
    * Scale shape: one map-side-combining aggregation; sketch size is
    * O(accuracy) per (type) group regardless of row count — the whole
    * point vs q51's full-width rank pass. */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        percentile_approx(col("value"),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("qs"))
      .select(col("event_type"), col("n"),
        get(col("qs"), lit(0)).as("p50_approx"),
        get(col("qs"), lit(1)).as("p95_approx"),
        get(col("qs"), lit(2)).as("p99_approx"))
      .orderBy(col("event_type"))
  }

  /** Q132: SEASONAL-NAIVE FORECAST BACKTEST — forecast evaluation over
    * the event stream: for every (type, hour) cell, the seasonal-naive
    * forecast (same hour last week, lag-168) and the persistence
    * baseline (previous hour, lag-1) are scored by exact integer
    * absolute error, restricted to hours where BOTH forecasts exist so
    * the comparison is apples-to-apples. The report answers the
    * capacity-planning question "does weekly seasonality beat
    * persistence here" with sum-of-absolute-errors both engines compute
    * identically; the two dec6 divisions (MAE, skill = sae_persist /
    * sae_seasonal) happen after all membership is integer-decided, and
    * skill is NULL when the seasonal error is zero.
    *
    * Lags are VALUE-offset RANGE windows (exactly hr-168 / hr-1, absent
    * hours yield NULL), not row offsets — gap hours can't silently
    * shift the forecast. Scale shape: identical to q124 — one shuffle
    * into the bounded (type, hour) frame, windows within each type's
    * group. */
  def seasonalBacktest(spark: SparkSession, dir: String): DataFrame = {
    def at(off: Int) = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rangeBetween(-off, -off)
    Tables.events(spark, dir)
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lag168", max(col("n")).over(at(168)))
      .withColumn("lag1", max(col("n")).over(at(1)))
      .filter(col("lag168").isNotNull && col("lag1").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("eval_hours"),
        sum(abs(col("n") - col("lag168"))).cast("bigint").as("sae_seasonal"),
        sum(abs(col("n") - col("lag1"))).cast("bigint").as("sae_persist"))
      .withColumn("mae_seasonal", dec6(
        col("sae_seasonal").cast("decimal(18,0)") / col("eval_hours")))
      .withColumn("skill", when(col("sae_seasonal") > 0, dec6(
        col("sae_persist").cast("decimal(18,0)") / col("sae_seasonal"))))
      .orderBy(col("event_type"))
  }

  val seasonalBacktestSql: String =
    """WITH h AS (SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
      |             COUNT(*) AS n
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, n,
      |    MAX(n) OVER (PARTITION BY event_type ORDER BY hr
      |                 RANGE BETWEEN 168 PRECEDING AND 168 PRECEDING) AS lag168,
      |    MAX(n) OVER (PARTITION BY event_type ORDER BY hr
      |                 RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS lag1
      |  FROM h)
      |SELECT event_type, COUNT(*) AS eval_hours,
      |  CAST(SUM(ABS(n - lag168)) AS BIGINT) AS sae_seasonal,
      |  CAST(SUM(ABS(n - lag1)) AS BIGINT) AS sae_persist,
      |  CAST((2 * SUM(ABS(n - lag168)) * 1000000 + COUNT(*)) // (2 * COUNT(*))
      |    AS DOUBLE) / 1000000 AS mae_seasonal,
      |  CASE WHEN SUM(ABS(n - lag168)) > 0 THEN
      |    CAST((2 * SUM(ABS(n - lag1)) * 1000000 + SUM(ABS(n - lag168)))
      |      // (2 * SUM(ABS(n - lag168))) AS DOUBLE) / 1000000
      |  END AS skill
      |FROM w WHERE lag168 IS NOT NULL AND lag1 IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q134: JOIN-KEY SKEW PROFILE — the diagnostic that DECIDES when
    * q65's salting is worth its extra shuffle: for each join/agg key a
    * pipeline shuffles on, the cardinality, heaviest key, and the
    * skew ratio max_key_rows · n_keys / n_rows (1.0 = perfectly
    * uniform; the factor by which the hottest reducer exceeds the
    * mean). The heaviest key is reported deterministically (max key
    * string among count-ties — never arg_max, whose tie choice is
    * engine-dependent); the single dec6 division happens after all
    * integer accounting.
    *
    * Scale shape: per profiled key, one map-side-combining count
    * aggregation (the same shuffle the production join would pay, paid
    * once at audit time), a 1-row stats frame, and an equi-join of
    * the count frame against the broadcast max to pick the top key.
    * The 1-row crossJoins are the allowlisted scalar BNLJs. */
  def skewProfile(spark: SparkSession, dir: String): DataFrame = {
    def profile(df: DataFrame, keyCol: String, name: String): DataFrame = {
      val g = df.select(col(keyCol).cast("string").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
      val stats = g.agg(count(lit(1)).as("n_keys"),
        sum(col("c")).cast("bigint").as("n_rows"),
        max(col("c")).as("max_key_rows"))
      val top = g.join(broadcast(stats.select(col("max_key_rows").as("mx"))),
          col("c") === col("mx"))
        .agg(max(col("k")).as("top_key"))
      stats.crossJoin(broadcast(top))
        .select(lit(name).as("profile"), col("n_rows"), col("n_keys"),
          col("max_key_rows"), col("top_key"),
          dec6((col("max_key_rows") * col("n_keys")).cast("decimal(18,0)")
            / col("n_rows")).as("skew_ratio"))
    }
    val li = Tables.lineitem(spark, dir)
    profile(li, "l_suppkey", "lineitem.l_suppkey")
      .unionByName(profile(li, "l_orderkey", "lineitem.l_orderkey"))
      .unionByName(profile(Tables.events(spark, dir), "user_id", "events.user_id"))
      .orderBy(col("profile"))
  }

  val skewProfileSql: String =
    """WITH g1 AS (SELECT CAST(l_suppkey AS VARCHAR) AS k, COUNT(*) AS c
      |            FROM lineitem GROUP BY 1),
      |s1 AS (SELECT COUNT(*) AS n_keys, SUM(c) AS n_rows, MAX(c) AS mx FROM g1),
      |t1 AS (SELECT MAX(k) AS tk FROM g1, s1 WHERE c = mx),
      |g2 AS (SELECT CAST(l_orderkey AS VARCHAR) AS k, COUNT(*) AS c
      |            FROM lineitem GROUP BY 1),
      |s2 AS (SELECT COUNT(*) AS n_keys, SUM(c) AS n_rows, MAX(c) AS mx FROM g2),
      |t2 AS (SELECT MAX(k) AS tk FROM g2, s2 WHERE c = mx),
      |g3 AS (SELECT CAST(user_id AS VARCHAR) AS k, COUNT(*) AS c
      |            FROM events GROUP BY 1),
      |s3 AS (SELECT COUNT(*) AS n_keys, SUM(c) AS n_rows, MAX(c) AS mx FROM g3),
      |t3 AS (SELECT MAX(k) AS tk FROM g3, s3 WHERE c = mx),
      |u AS (
      |  SELECT 'lineitem.l_suppkey' AS profile, n_rows, n_keys, mx, tk FROM s1, t1
      |  UNION ALL
      |  SELECT 'lineitem.l_orderkey', n_rows, n_keys, mx, tk FROM s2, t2
      |  UNION ALL
      |  SELECT 'events.user_id', n_rows, n_keys, mx, tk FROM s3, t3)
      |SELECT profile, CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(n_keys AS BIGINT) AS n_keys,
      |  CAST(mx AS BIGINT) AS max_key_rows, tk AS top_key,
      |  CAST((2 * mx * n_keys * 1000000 + n_rows) // (2 * n_rows) AS DOUBLE)
      |    / 1000000 AS skew_ratio
      |FROM u ORDER BY profile""".stripMargin

  /** Q136: TIME-WEIGHTED AVERAGE — the sensor/pricing semantics every
    * time-series store ships (kdb/Timescale `time_weight`): an event's
    * value HOLDS until the same user's next event, so averages must
    * weight by holding duration, not event count (a value held for an
    * hour counts 3600x one held a second — plain AVG over-weights
    * bursts). Per event type: interval count, total held time, the
    * duration-weighted mean, and the unweighted mean for contrast.
    *
    * Exactness: durations are exact integer µs from `ts_ns` (lead over a
    * (ts, event_id)-ordered per-user window — the id tiebreak makes
    * same-µs pairs deterministic on both engines); values are exact
    * cents; the weighted sum Σ(cents·µs) accumulates in DECIMAL(38,0)
    * (a 3.8e17 max per-row product would overflow no sooner than 1e20
    * rows of BIGINT sum — the decimal sum is the 100 TB-safe shape).
    * One dec6 division each for the two means.
    *
    * Scale shape: one shuffle to co-locate users for the lead window,
    * one map-side-combined aggregation into the bounded per-type frame,
    * bounded sort. A user's timeline lives in one partition — the same
    * partitioning q22/q83 already rely on. */
  def timeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("decimal(18,0)").as("cents"))
      .withColumn("dur_us", (lead(col("ts_ns"), 1).over(w) - col("ts_ns"))
        .cast("long"))
      .filter(col("dur_us").isNotNull)
      .withColumn("dur_us", expr("dur_us div 1000"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dur_us")).cast("bigint").as("held_us"),
        sum(col("cents") * col("dur_us").cast("decimal(19,0)")).as("wsum"),
        sum(col("cents")).cast("decimal(28,0)").as("csum"))
      .select(col("event_type"), col("n_intervals"), col("held_us"),
        when(col("held_us") > 0,
          dec6(col("wsum") / (col("held_us").cast("decimal(19,0)") * 100)))
          .as("twa_value"),
        dec6(col("csum") / (col("n_intervals").cast("decimal(19,0)") * 100))
          .as("mean_value"))
      .orderBy(col("event_type"))
  }

  val timeWeightedAvgSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id, epoch_ns(ts) AS ts_ns,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |i AS (
      |  SELECT event_type, cents,
      |    (LEAD(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id)
      |      - ts_ns) // 1000 AS dur_us
      |  FROM e)
      |SELECT event_type, COUNT(*) AS n_intervals,
      |  CAST(SUM(dur_us) AS BIGINT) AS held_us,
      |  CASE WHEN SUM(dur_us) > 0 THEN
      |    CAST((2 * SUM(cents * dur_us) * 1000000 + SUM(dur_us) * 100)
      |      // (2 * SUM(dur_us) * 100) AS DOUBLE) / 1000000 END AS twa_value,
      |  CAST((2 * SUM(cents) * 10000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
      |    / 1000000 AS mean_value
      |FROM i WHERE dur_us IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q138: LAST-TOUCH ATTRIBUTION — the sequence-join every product
    * analytics stack ships: each purchase is credited to the same
    * user's most recent preceding marketing touch (click or view)
    * within a 1-hour lookback, else counted as direct. One per-user
    * ordered window pass carries the latest touch forward (an as-of
    * join against the user's own timeline — no self-join): the touch
    * is packed as a fixed-width `ts·event_id·type` string so the
    * running MAX is the latest touch AND deterministic under same-µs
    * ties (event_id tiebreak); ROWS … 1 PRECEDING keeps a purchase
    * from attributing to itself under a shared timestamp. Exact cents
    * for revenue, one dec6 share division against the broadcast total.
    *
    * Scale shape: one shuffle to co-locate each user's timeline (the
    * q22/q83/q136 partitioning), one map-side-combined aggregation to
    * the bounded channel frame; the share denominator is an
    * unpartitioned window over that <= 3-row frame (single-task on
    * bounded data by design — never a crossJoin, which would recompute
    * the attribution subtree). */
  def lastTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = when(col("event_type").isin("click", "view"),
      concat(lpad(col("ts_ns").cast("string"), 20, "0"),
        lpad(col("event_id").cast("string"), 12, "0"), col("event_type")))
    val attributed = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("decimal(18,0)").as("cents"))
      .withColumn("touch", max(packed).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("touch").isNotNull &&
          col("ts_ns") - substring(col("touch"), 1, 20).cast("long") <=
            3600L * 1000 * 1000 * 1000,
          substring(col("touch"), 33, 8)).otherwise("direct"))
    attributed.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).cast("decimal(28,0)").as("cents"))
      // global total via an unpartitioned window over the BOUNDED
      // channel frame (<= 3 rows) — not a crossJoin, which would
      // recompute the whole attribution subtree for the scalar
      .withColumn("total",
        sum(col("n_purchases")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("channel"), col("n_purchases"),
        dec2(col("cents") / 100).as("revenue"),
        dec6(col("n_purchases").cast("decimal(19,0)") / col("total"))
          .as("share"))
      .orderBy(col("channel"))
  }

  val lastTouchAttributionSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id, epoch_ns(ts) AS ts_ns,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |t AS (
      |  SELECT *,
      |    MAX(CASE WHEN event_type IN ('click', 'view') THEN
      |      lpad(CAST(ts_ns AS VARCHAR), 20, '0')
      |        || lpad(CAST(event_id AS VARCHAR), 12, '0') || event_type END)
      |    OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      |  FROM e),
      |p AS (
      |  SELECT CASE WHEN touch IS NOT NULL
      |      AND ts_ns - CAST(touch[1:20] AS BIGINT) <= 3600000000000
      |    THEN touch[33:40] ELSE 'direct' END AS channel, cents
      |  FROM t WHERE event_type = 'purchase'),
      |c AS (SELECT channel, COUNT(*) AS n_purchases, SUM(cents) AS cents
      |      FROM p GROUP BY 1)
      |SELECT channel, n_purchases,
      |  CAST(CAST(ROUND(cents / 100, 2) AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
      |  CAST((2 * n_purchases * 1000000 + (SELECT SUM(n_purchases) FROM c))
      |    // (2 * (SELECT SUM(n_purchases) FROM c)) AS DOUBLE) / 1000000 AS share
      |FROM c ORDER BY channel""".stripMargin

  /** Q152: NELSON-AALEN CUMULATIVE HAZARD — the survival-analysis
    * companion to q123's retention cohorts: user lifetime = days
    * between first and last event (last-seen as the churn proxy),
    * risk set n_t = users with lifetime ≥ t, discrete hazard
    * h_t = d_t/n_t, and the Nelson-Aalen cumulative hazard
    * H_t = Σ_{s≤t} h_s.
    *
    * Exactness convention (pinned, both engines): each h_t is rounded
    * HALF_UP to 6 decimals FIRST, and H_t is the exact decimal sum of
    * those rounded terms — order-independent, no float accumulation.
    *
    * Scale shape: one row-scale (user) aggregation to lifetimes, one
    * map-side-combined count to the ≤|days|-row lifetime histogram;
    * both windows (reverse cumsum for the risk set, forward cumsum
    * for H) move only that bounded frame — single-task on ~30 rows
    * by design, the q146 marginal-window argument. */
  def nelsonAalen(spark: SparkSession, dir: String): DataFrame = {
    val life = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(datediff(max(col("ts").cast("date")), min(col("ts").cast("date")))
        .as("t"))
    val d = life.groupBy(col("t")).agg(count(lit(1)).as("churned"))
    val wAtRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    d.withColumn("n_at_risk", sum(col("churned")).over(wAtRisk))
      .withColumn("h6", (col("churned").cast("decimal(19,0)")
          / col("n_at_risk").cast("decimal(19,0)"))
        .cast("decimal(38,6)"))
      .select(col("t").cast("int").as("lifetime_days"),
        col("n_at_risk").cast("bigint").as("n_at_risk"),
        col("churned").cast("bigint").as("churned"),
        col("h6").cast("double").as("hazard"),
        sum(col("h6")).over(wCum).cast("double").as("cum_hazard"))
      .orderBy(col("lifetime_days"))
  }

  val nelsonAalenSql: String =
    """WITH life AS (
      |  SELECT user_id,
      |    datediff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) AS t
      |  FROM events GROUP BY 1),
      |d AS (SELECT t, COUNT(*) AS churned FROM life GROUP BY 1),
      |rk AS (SELECT t, churned,
      |         SUM(churned) OVER (ORDER BY t DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_risk
      |       FROM d),
      |h AS (SELECT t, churned, n_at_risk,
      |        (2 * churned * 1000000 + n_at_risk) // (2 * n_at_risk) AS h6
      |      FROM rk)
      |SELECT CAST(t AS INT) AS lifetime_days,
      |  CAST(n_at_risk AS BIGINT) AS n_at_risk,
      |  CAST(churned AS BIGINT) AS churned,
      |  CAST(h6 AS DOUBLE) / 1000000 AS hazard,
      |  CAST(SUM(h6) OVER (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000
      |    AS cum_hazard
      |FROM h ORDER BY lifetime_days""".stripMargin

  /** EWMA lookback (hours) for [[ewmaTrend]] — dyadic half-life-1h
    * weights 2^(11−age) over a 12-hour window. */
  val EwmaWindowHours = 12

  /** Q153: EWMA TREND — per event type and hour, the exponentially
    * weighted moving average of hourly value totals with halving
    * weights (age i hours → weight 2^(11−i)), over ONLY the hours
    * that exist (gap hours neither contribute nor shift the window —
    * q132's both-defined discipline on a weighted frame).
    *
    * Exactness: weights are integer powers of two via shiftleft —
    * no float pow; numerator Σv·2^(11−i) and denominator Σ2^(11−i)
    * are exact BIGINTs and the EWMA is one dec6 division.
    *
    * Scale shape: window functions cannot weight by distance, and a
    * banded self-join re-shuffles the frame per probe; instead each
    * hourly row EXPLODES into the ≤12 future anchor hours it
    * contributes to (map-side ×12 on the already-bounded hourly
    * frame), one aggregation reassembles the weighted sums, and an
    * inner join back to the hourly frame keeps only real anchors.
    * Row-scale data pays exactly ONE aggregation (the hourly
    * rollup); everything after moves the |types|×|hours| frame. */
  def ewmaTrend(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("ts_ns div 3600000000000").as("hr"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100)
        .cast("decimal(18,0)").cast("long")).as("v"))
    val contrib = hourly
      .select(col("event_type"), col("hr"), col("v"),
        explode(sequence(col("hr"), col("hr") + (EwmaWindowHours - 1)))
          .as("t"))
      .withColumn("w", expr(s"shiftleft(1L, cast(${EwmaWindowHours - 1} - (t - hr) as int))"))
    val ew = contrib.groupBy(col("event_type"), col("t"))
      .agg(sum(col("v") * col("w")).as("num"), sum(col("w")).as("den"))
      .withColumnRenamed("event_type", "et2")
    hourly.join(ew, col("event_type") === col("et2")
        && col("hr") === col("t"))
      .select(col("event_type"), col("hr").as("hour_idx"),
        dec2(col("v").cast("decimal(19,0)") / 100).as("hour_value"),
        dec6(col("num").cast("decimal(38,0)")
          / (col("den").cast("decimal(19,0)") * 100)).as("ewma_value"))
      .orderBy(col("event_type"), col("hour_idx"))
  }

  val ewmaTrendSql: String =
    """WITH h AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
      |    SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
      |  FROM events GROUP BY 1, 2)
      |SELECT a.event_type, a.hr AS hour_idx,
      |  CAST(CAST(ROUND(a.v / 100, 2) AS DECIMAL(38,2)) AS DOUBLE) AS hour_value,
      |  CAST((2 * SUM(b.v * (1::BIGINT << CAST(11 - (a.hr - b.hr) AS INT))) * 1000000
      |      + SUM(1::BIGINT << CAST(11 - (a.hr - b.hr) AS INT)) * 100)
      |    // (2 * SUM(1::BIGINT << CAST(11 - (a.hr - b.hr) AS INT)) * 100)
      |    AS DOUBLE) / 1000000 AS ewma_value
      |FROM h a JOIN h b
      |  ON a.event_type = b.event_type AND b.hr BETWEEN a.hr - 11 AND a.hr
      |GROUP BY a.event_type, a.hr, a.v
      |ORDER BY a.event_type, hour_idx""".stripMargin

  /** Idle timeout appended to every session interval in
    * [[sessionOverlap]] (ns) — a session counts as active until its
    * timeout expires, which is what makes single-event sessions
    * non-degenerate intervals. */
  val SessionTailNs: Long = 30L * 60 * 1000 * 1000 * 1000

  /** Q154: INTERVAL-OVERLAP JOIN — cross-activity concurrency: for
    * each user, sessionize each event type separately (30-min gap
    * rule, q22's convention), extend every session by the 30-min idle
    * timeout, and measure how long sessions of DIFFERENT types
    * overlap for the same user; report per type pair the overlapping
    * session-pair count, users involved, and total/mean overlap.
    *
    * Exactness: all interval arithmetic in exact ns longs; overlap =
    * (min(end) − max(start)) div 1e9 seconds (floor, positive by the
    * join predicate); only the final mean divides.
    *
    * Scale shape: the overlap join is EQUI on user_id — the interval
    * predicate is a post-join filter within one user's sessions, so
    * pair expansion is bounded per user (sessions/user/type is
    * gap-bounded), never corpus-quadratic; at 100 TB a hot user is
    * q65-salting territory, the join motif is unchanged. Output
    * aggregates to the ≤C(|types|,2) frame. */
  def sessionOverlap(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ns"), col("event_id"))
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    val sessions = Tables.events(spark, dir)
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(byKey))
      .withColumn("new_session",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("event_type"), col("session_id"))
      .agg(min(col("ts_ns")).as("s"), max(col("ts_ns")).as("e"))
      .withColumn("e", col("e") + SessionTailNs)
      // round-12: both sides of the self-join read `sessions` — without
      // materialization the session window+agg chain evaluated twice;
      // checkpoint the narrow (user, type, s, e) frame once
      .localCheckpoint()
    val a = sessions.select(col("user_id"), col("event_type").as("type_a"),
      col("s").as("sa"), col("e").as("ea"))
    val b = sessions.select(col("user_id"), col("event_type").as("type_b"),
      col("s").as("sb"), col("e").as("eb"))
    a.join(b, Seq("user_id"))
      .filter(col("type_a") < col("type_b")
        && col("sa") < col("eb") && col("sb") < col("ea"))
      .withColumn("ov_s",
        expr("(least(ea, eb) - greatest(sa, sb)) div 1000000000"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("ov_s")).cast("bigint").as("total_overlap_s"),
        (sum(col("ov_s")).cast("decimal(19,0)")
          / count(lit(1)).cast("decimal(19,0)")).cast("decimal(38,6)")
          .cast("double").as("avg_overlap_s"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val sessionOverlapSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_type, event_id, epoch_ns(ts) AS ns,
      |    CASE WHEN LAG(epoch_ns(ts)) OVER w IS NULL
      |           OR epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > 30*60*1000000000::BIGINT
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id, event_type
      |               ORDER BY epoch_ns(ts), event_id)),
      |sid AS (SELECT user_id, event_type, ns,
      |          SUM(new_session) OVER (PARTITION BY user_id, event_type
      |            ORDER BY ns, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |        FROM flagged),
      |sess AS (SELECT user_id, event_type, session_id,
      |           MIN(ns) AS s, MAX(ns) + 30*60*1000000000::BIGINT AS e
      |         FROM sid GROUP BY 1, 2, 3),
      |pairs AS (SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
      |            (LEAST(a.e, b.e) - GREATEST(a.s, b.s)) // 1000000000 AS ov_s
      |          FROM sess a JOIN sess b ON a.user_id = b.user_id
      |          WHERE a.event_type < b.event_type
      |            AND a.s < b.e AND b.s < a.e)
      |SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(ov_s) AS BIGINT) AS total_overlap_s,
      |  CAST((2 * SUM(ov_s) * 1000000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
      |    / 1000000 AS avg_overlap_s
      |FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q159: CONVERSION LATENCY QUANTILES — the funnel-timing companion
    * to q138's attribution: for every purchase with an attributable
    * click (latest click by the same user within the 1-hour lookback,
    * q138's rule), the click→purchase latency in whole seconds, and
    * the conversion-latency distribution: count, exact p50/p90 by
    * pinned integer-rank convention, and mean.
    *
    * Scale shape: attribution is one per-user window (running
    * last-click max with the ROWS …1 PRECEDING self-exclusion guard —
    * never a click×purchase join); p50/p90 come from the shared
    * [[TwoPass.groupRankLookup]] kernel (single group — no global
    * sort); the summary agg is one map-side-combined pass over the
    * conversions frame. */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lookbackNs = 3600L * 1000 * 1000 * 1000
    // round-12: the attribution window (shuffle + sort on user_id) ran
    // once per kernel pass plus once for the summary agg; checkpoint
    // the 1-column latency frame so the window runs exactly once
    val lat = Tables.events(spark, dir)
      .filter(col("event_type").isInCollection(Seq("click", "purchase")))
      .withColumn("last_click_ns",
        max(when(col("event_type") === "click", col("ts_ns"))).over(w))
      .filter(col("event_type") === "purchase"
        && col("last_click_ns").isNotNull
        && col("ts_ns") - col("last_click_ns") <= lookbackNs)
      .select(expr("(ts_ns - last_click_ns) div 1000000000").as("lat_s"))
      .localCheckpoint()
    val lookup = TwoPass.groupRankLookup(spark,
      lat.select(lit("all").as("k"), col("lat_s").as("c")),
      n => Seq((n + 1) / 2, (9 * n + 9) / 10))
    // a slice with zero conversions degrades to (0, NULL, NULL, NULL)
    // on BOTH engines — the oracle COALESCEs its empty-frame MAX(n) to
    // match Spark's count-over-empty 0 (round-5 advisor finding) —
    // never a crash (latent-but-load-bearing hardening discipline)
    val gr = lookup.getOrElse("all", TwoPass.GroupRanks(0L, Map.empty))
    def rankLit(r: Long) =
      gr.at.get(r).map(lit(_)).getOrElse(lit(null)).cast("bigint")
    lat.agg(count(lit(1)).cast("bigint").as("n_conversions"),
        sum(col("lat_s")).cast("decimal(19,0)").as("s"))
      .select(col("n_conversions"),
        rankLit((gr.n + 1) / 2).as("p50_s"),
        rankLit((9 * gr.n + 9) / 10).as("p90_s"),
        when(col("n_conversions") === 0, lit(null).cast("double"))
          .otherwise(dec6(col("s") / col("n_conversions").cast("decimal(19,0)")))
          .as("mean_s"))
  }

  val conversionLatencySql: String =
    """WITH f AS (
      |  SELECT user_id, event_type, event_id, epoch_ns(ts) AS ns
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |att AS (SELECT event_type, ns,
      |          MAX(CASE WHEN event_type = 'click' THEN ns END) OVER (
      |            PARTITION BY user_id ORDER BY ns, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc
      |        FROM f),
      |conv AS (SELECT (ns - lc) // 1000000000 AS lat_s FROM att
      |         WHERE event_type = 'purchase' AND lc IS NOT NULL
      |           AND ns - lc <= 3600000000000),
      |r AS (SELECT lat_s, ROW_NUMBER() OVER (ORDER BY lat_s) AS rn,
      |        COUNT(*) OVER () AS n
      |      FROM conv)
      |SELECT CAST(COALESCE(MAX(n), 0) AS BIGINT) AS n_conversions,
      |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN lat_s END) AS BIGINT) AS p50_s,
      |  CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN lat_s END) AS BIGINT) AS p90_s,
      |  CAST((2 * SUM(lat_s) * 1000000 + MAX(n)) // (2 * MAX(n)) AS DOUBLE)
      |    / 1000000 AS mean_s
      |FROM r""".stripMargin

  /** Trailing window (days) for [[rollingActiveUsers]]. */
  val RollingWindowDays = 7

  /** Q167: ROLLING 7-DAY ACTIVE USERS — the analytics staple whose
    * naive form does NOT scale: "distinct users active in the trailing
    * week, per day" as a day×window join pays a COUNT(DISTINCT) over
    * users×7 exploded rows, and sliding distinct cannot map-side
    * combine. The scalable identity: a user contributes to day d iff
    * some active day lies in (d−6..d], i.e. the user COVERS the union
    * of intervals [a, a+6] over their active days a — so merge each
    * user's intervals (per-user gap-merge, the q22 sessionize trick
    * with gap = window), explode only the MERGED spans into days, and
    * count plain rows per day: after the merge, each (user, day) pair
    * exists at most once, so no distinct is ever needed.
    *
    * Reported days are clamped to the observed corpus day range (a
    * trailing window at the edge reports over what exists — both
    * engines clamp identically).
    *
    * Scale shape: one plain (user, day) input dedup, one per-user
    * window (merge), one explode bounded by span×users, ONE
    * map-side-combined count per day — the SLIDING distinct (the
    * thing that can't combine) never exists. The corpus max day is a
    * 1-value driver scalar (bounded control flow — keeps the clamp
    * out of a single-row BNLJ). */
  def rollingActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    val w = RollingWindowDays
    val days = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
      .withColumn("dn", datediff(col("d"), lit("1970-01-01").cast("date"))
        .cast("long"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("dn"))
    val merged = days
      .withColumn("prev", lag(col("dn"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev").isNull || col("dn") - col("prev") > w - 1, 1L)
          .otherwise(0L))
      .withColumn("span", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("span"))
      .agg(min(col("dn")).as("s"), (max(col("dn")) + (w - 1)).as("e"))
    val maxd: Long = Tables.events(spark, dir)
      .agg(datediff(max(col("ts").cast("date")),
        lit("1970-01-01").cast("date")).cast("long").as("maxd"))
      .head().getLong(0)
    val perDay = merged
      .select(col("user_id"),
        explode(sequence(col("s"), least(col("e"), lit(maxd)))).as("dn"))
      .groupBy(col("dn")).agg(count(lit(1)).as("active_users"))
    perDay
      .select(date_add(lit("1970-01-01").cast("date"),
          col("dn").cast("int")).as("day"),
        col("active_users").cast("bigint").as("active_users"))
      .orderBy(col("day"))
  }

  /** Oracle: the NAIVE day×window COUNT(DISTINCT) — an independent
    * formulation; identity with the interval-merge plan is the
    * correctness proof of the no-distinct rewrite. */
  val rollingActiveUsersSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |cal AS (SELECT DISTINCT d FROM ud),
      |allday AS (SELECT DISTINCT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
      |           FROM (SELECT MIN(d) AS mn, MAX(d) AS mx FROM cal))
      |SELECT a.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_users
      |FROM allday a JOIN ud u
      |  ON u.d <= a.day AND u.d > a.day - INTERVAL 7 DAY
      |GROUP BY a.day
      |ORDER BY a.day""".stripMargin

  /** Q168: DAILY PERCENTILE BANDS — per-day p10/p50/p90 of event value
    * (the latency-band / SLO chart): the shared
    * [[TwoPass.groupRankLookup]] kernel generalized to MANY ranks per
    * group (three per day), proving the kernel's cost is per-PASS, not
    * per-quantile: one histogram + one pruned fetch serve all three
    * bands for every day. Exact integer-rank convention
    * (⌈q·n⌉ = (q·n + 9)/10 pinned), exact cents.
    *
    * Scale shape: identical to q141/q147 — never a per-day sort
    * window; thresholds return as a broadcast |days|×3 frame joined
    * to nothing (they ARE the answer) plus one count agg for n. */
  def dailyPercentileBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def rows = Tables.events(spark, dir).select(
      col("ts").cast("date").cast("string").as("k"),
      (col("value").cast("decimal(18,2)") * 100).cast("decimal(18,0)")
        .cast("long").as("c"))
    val lookup = TwoPass.groupRankLookup(spark, rows,
      n => Seq((n + 9) / 10, (5 * n + 9) / 10, (9 * n + 9) / 10))
    val bands = lookup.toSeq.map { case (day, gr) =>
      (day, gr.n, gr.at((gr.n + 9) / 10), gr.at((5 * gr.n + 9) / 10),
        gr.at((9 * gr.n + 9) / 10))
    }.toDF("k", "n", "p10c", "p50c", "p90c")
    import graft.functions.Parity._
    bands.select(col("k").cast("date").as("day"),
        col("n").cast("bigint").as("n_events"),
        dec2(col("p10c").cast("decimal(18,0)") / 100).as("p10"),
        dec2(col("p50c").cast("decimal(18,0)") / 100).as("p50"),
        dec2(col("p90c").cast("decimal(18,0)") / 100).as("p90"))
      .orderBy(col("day"))
  }

  val dailyPercentileBandsSql: String =
    """WITH e AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |r AS (SELECT day, c,
      |        ROW_NUMBER() OVER (PARTITION BY day ORDER BY c) AS rn,
      |        COUNT(*) OVER (PARTITION BY day) AS n
      |      FROM e)
      |SELECT day, CAST(MAX(n) AS BIGINT) AS n_events,
      |  CAST(CAST(ROUND(MAX(CASE WHEN rn = (n + 9) // 10 THEN c END) / 100, 2)
      |    AS DECIMAL(38,2)) AS DOUBLE) AS p10,
      |  CAST(CAST(ROUND(MAX(CASE WHEN rn = (5 * n + 9) // 10 THEN c END) / 100, 2)
      |    AS DECIMAL(38,2)) AS DOUBLE) AS p50,
      |  CAST(CAST(ROUND(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN c END) / 100, 2)
      |    AS DECIMAL(38,2)) AS DOUBLE) AS p90
      |FROM r GROUP BY day ORDER BY day""".stripMargin

  /** Q174: LINEAR-INTERPOLATION GAP REPAIR — the numeric sibling of
    * q77's carry-forward fill: per event type, the dense hourly grid
    * over the type's observed span, with missing hours repaired by
    * exact linear interpolation between the nearest observed
    * neighbours. The interpolated value is computed as the SINGLE
    * rational (pv·(nh−hr) + nv·(hr−ph)) / (nh−ph) — symmetric form,
    * one dec6 division, never prev + rounded-fraction (the stacked-
    * rounding discipline). Edge hours are always observed (the grid
    * spans min..max of real data), so interior gaps always have both
    * neighbours.
    *
    * Scale shape: one hourly rollup (the only row-scale exchange),
    * a per-type grid explode, and two IGNORE-NULLS windows over the
    * |types|×|hours| frame. */
  def linearInterpolation(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity._
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ns div 3600000000000").as("hr"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100)
        .cast("decimal(18,0)").cast("long")).as("v"))
    val grid = hourly.groupBy(col("event_type"))
      .agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("hr"))
    val joined = grid.join(hourly, Seq("event_type", "hr"), "left")
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(1, Window.unboundedFollowing)
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    joined
      .withColumn("ph", last(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wPrev))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("nh", first(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wNext))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .select(col("event_type"), col("hr").as("hour_idx"),
        col("v").isNotNull.as("is_observed"),
        when(col("v").isNotNull, dec6(d(col("v")) / 100))
          .otherwise(dec6(
            (d(col("pv")) * (col("nh") - col("hr"))
              + d(col("nv")) * (col("hr") - col("ph")))
            / (d(col("nh") - col("ph")) * 100)))
          .as("value_dollars"))
      .orderBy(col("event_type"), col("hour_idx"))
  }

  val linearInterpolationSql: String =
    """WITH h AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
      |    SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT event_type, unnest(range(mn, mx + 1)) AS hr
      |  FROM (SELECT event_type, MIN(hr) AS mn, MAX(hr) AS mx FROM h GROUP BY 1)),
      |j AS (SELECT g.event_type, g.hr, h.v
      |      FROM grid g LEFT JOIN h ON g.event_type = h.event_type AND g.hr = h.hr),
      |w AS (SELECT event_type, hr, v,
      |        LAST_VALUE(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER
      |          (PARTITION BY event_type ORDER BY hr
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ph,
      |        LAST_VALUE(v IGNORE NULLS) OVER
      |          (PARTITION BY event_type ORDER BY hr
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
      |        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER
      |          (PARTITION BY event_type ORDER BY hr
      |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nh,
      |        FIRST_VALUE(v IGNORE NULLS) OVER
      |          (PARTITION BY event_type ORDER BY hr
      |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
      |      FROM j)
      |SELECT event_type, hr AS hour_idx, v IS NOT NULL AS is_observed,
      |  CASE WHEN v IS NOT NULL
      |       THEN CAST(CAST(ROUND(v / 100, 6) AS DECIMAL(38,6)) AS DOUBLE)
      |       ELSE CAST((2 * (pv * (nh - hr) + nv * (hr - ph)) * 1000000
      |           + (nh - ph) * 100) // (2 * (nh - ph) * 100) AS DOUBLE) / 1000000
      |  END AS value_dollars
      |FROM w ORDER BY event_type, hour_idx""".stripMargin

  /** Q177: PEAK CONCURRENCY (sweep line) — capacity planning over
    * q154's session intervals: per event type, the maximum number of
    * simultaneously-active sessions and the first hour it occurs.
    * Sweep convention pinned: at equal timestamps, ends (−1) process
    * before starts (+1) — ORDER BY (ns, delta), so touching intervals
    * never double-count.
    *
    * Scale shape: a global per-type running sum is a single task per
    * type, so the sweep is bucketized (the q94 offset idea in-plan):
    * per (type, hour) net deltas → prefix offsets via a window over
    * the BOUNDED bucket frame → within-bucket running sums (each
    * bucket's slice only) → per-bucket local peaks → final max/argmax
    * over the bounded frame. Running-sum values are tie-order
    * invariant (equal (ns, delta) rows are interchangeable), so the
    * peak and its hour are deterministic at any parallelism. */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ns"), col("event_id"))
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    val sessions = Tables.events(spark, dir)
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(byKey))
      .withColumn("new_session",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("event_type"), col("session_id"))
      .agg(min(col("ts_ns")).as("s"),
        (max(col("ts_ns")) + SessionTailNs).as("e"))
    // round-12: the previous unionAll of two projections evaluated the
    // whole session window+agg subtree TWICE (Catalyst does not fuse
    // common union branches above an exchange); emitting both sweep
    // deltas from ONE pass via explode halves the heavy stage — plan:
    // 2 window/agg evaluations -> 1 (guide §2.4, remove repeated work)
    val deltas = sessions.select(col("event_type"),
        explode(array(
          struct(col("s").as("ns"), lit(1L).as("d")),
          struct(col("e").as("ns"), lit(-1L).as("d")))).as("sw"))
      .select(col("event_type"), col("sw.ns").as("ns"), col("sw.d").as("d"))
      .withColumn("hb", expr("ns div 3600000000000"))
      // deltas feeds both the per-hour net agg and the within-hour sweep
      // join — checkpoint the narrow (type, ns, d, hb) stream so the
      // session window runs exactly once however many consumers follow
      .localCheckpoint()
    val net = deltas.groupBy(col("event_type"), col("hb"))
      .agg(sum(col("d")).as("net"))
    val wOff = Window.partitionBy(col("event_type")).orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = net
      .withColumn("off", coalesce(sum(col("net")).over(wOff), lit(0L)))
      .select(col("event_type"), col("hb"), col("off"))
    val wIn = Window.partitionBy(col("event_type"), col("hb"))
      .orderBy(col("ns"), col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val bstats = deltas.join(offsets, Seq("event_type", "hb"))
      .withColumn("rs", col("off") + sum(col("d")).over(wIn))
      .groupBy(col("event_type"), col("hb"))
      .agg(max(col("rs")).as("bpeak"),
        sum(when(col("d") === 1, 1L).otherwise(0L)).as("starts"))
    val wT = Window.partitionBy(col("event_type"))
    bstats
      .withColumn("peak", max(col("bpeak")).over(wT))
      .groupBy(col("event_type"))
      .agg(sum(col("starts")).cast("bigint").as("n_sessions"),
        max(col("bpeak")).cast("bigint").as("peak_concurrent"),
        min(when(col("bpeak") === col("peak"), col("hb"))).cast("bigint")
          .as("peak_hour_idx"))
      .orderBy(col("event_type"))
  }

  val peakConcurrencySql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_type, event_id, epoch_ns(ts) AS ns,
      |    CASE WHEN LAG(epoch_ns(ts)) OVER w IS NULL
      |           OR epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > 30*60*1000000000::BIGINT
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id, event_type
      |               ORDER BY epoch_ns(ts), event_id)),
      |sid AS (SELECT user_id, event_type, ns,
      |          SUM(new_session) OVER (PARTITION BY user_id, event_type
      |            ORDER BY ns, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |        FROM flagged),
      |sess AS (SELECT user_id, event_type, session_id,
      |           MIN(ns) AS s, MAX(ns) + 30*60*1000000000::BIGINT AS e
      |         FROM sid GROUP BY 1, 2, 3),
      |deltas AS (
      |  SELECT event_type, s AS ns, 1 AS d FROM sess
      |  UNION ALL
      |  SELECT event_type, e, -1 FROM sess),
      |rs AS (SELECT event_type, ns, d,
      |         SUM(d) OVER (PARTITION BY event_type ORDER BY ns, d
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
      |       FROM deltas),
      |p AS (SELECT event_type, MAX(rs) AS peak FROM rs GROUP BY 1)
      |SELECT r.event_type,
      |  CAST(SUM(CASE WHEN r.d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |  CAST(MAX(p.peak) AS BIGINT) AS peak_concurrent,
      |  CAST(MIN(CASE WHEN r.rs = p.peak THEN r.ns // 3600000000000 END) AS BIGINT)
      |    AS peak_hour_idx
      |FROM rs r JOIN p ON r.event_type = p.event_type
      |GROUP BY r.event_type
      |ORDER BY r.event_type""".stripMargin

  /** Q178: MIN-MAX FEATURE SCALING — the feature-store normalization
    * pass: per event type, scale value cents to integer permille of
    * the type's [min, max] span (floor division — the pinned integer
    * convention; a constant column scales to 0). Reported as the
    * per-type accounting (n, min, max, exact scaled sum and mean) so
    * the full scaled column never needs to round-trip the harness.
    *
    * Scale shape: TWO map-side-combined aggregations (min/max, then
    * the scaled rollup against the broadcast |types|-row bounds) —
    * the scaled value itself is a pure per-row map, usable as a
    * column in any downstream feature pipeline. */
  def minmaxScaling(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity._
    def rows = Tables.events(spark, dir).select(col("event_type"),
      (col("value").cast("decimal(18,2)") * 100).cast("decimal(18,0)")
        .cast("long").as("c"))
    val bounds = rows.groupBy(col("event_type"))
      .agg(min(col("c")).as("mn"), max(col("c")).as("mx"))
    rows.join(broadcast(bounds), Seq("event_type"))
      .withColumn("scaled",
        when(col("mx") === col("mn"), 0L)
          .otherwise(expr("((c - mn) * 1000) div (mx - mn)")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("mn")).as("mnc"), max(col("mx")).as("mxc"),
        sum(col("scaled")).cast("bigint").as("sum_scaled"))
      .select(col("event_type"), col("n"),
        dec2(col("mnc").cast("decimal(18,0)") / 100).as("min_value"),
        dec2(col("mxc").cast("decimal(18,0)") / 100).as("max_value"),
        col("sum_scaled"),
        dec6(col("sum_scaled").cast("decimal(19,0)")
          / col("n").cast("decimal(19,0)")).as("mean_scaled"))
      .orderBy(col("event_type"))
  }

  val minmaxScalingSql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |b AS (SELECT event_type, MIN(c) AS mn, MAX(c) AS mx FROM e GROUP BY 1),
      |s AS (SELECT e.event_type, e.c, b.mn, b.mx,
      |        CASE WHEN b.mx = b.mn THEN 0
      |             ELSE ((e.c - b.mn) * 1000) // (b.mx - b.mn) END AS scaled
      |      FROM e JOIN b ON e.event_type = b.event_type)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(CAST(ROUND(MAX(mn) / 100, 2) AS DECIMAL(38,2)) AS DOUBLE) AS min_value,
      |  CAST(CAST(ROUND(MAX(mx) / 100, 2) AS DECIMAL(38,2)) AS DOUBLE) AS max_value,
      |  CAST(SUM(scaled) AS BIGINT) AS sum_scaled,
      |  CAST((2 * SUM(scaled) * 1000000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
      |    / 1000000 AS mean_scaled
      |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q181: RFM SEGMENTATION — the classic customer-value grid: per
    * user, Recency (days since last event, against the corpus max
    * day), Frequency (events), Monetary (exact cents), each cut into
    * quintiles by the pinned rank convention (threshold k = value at
    * rank ⌈k·n/5⌉; quintile = smallest k with value ≤ threshold_k, so
    * ties share a quintile deterministically). Output is the
    * aggregated ≤125-cell grid — the per-user segment assignment is a
    * pure map against six broadcast threshold literals.
    *
    * Scale shape: ONE row-scale events pass total — the per-user
    * aggregate is localCheckpoint-materialized (|users| rows of four
    * small columns, executor-local blocks), and everything downstream
    * (the corpus max day, the three single-group
    * [[TwoPass.groupRankLookup]] threshold passes, the final
    * assignment) re-reads the materialized frame instead of
    * re-aggregating events per pass (the round-5 judge's 4×-recompute
    * cost finding); the final binning is one map-side-combined count
    * into the bounded grid. Recency is derived from the stored
    * per-user last day, so even the corpus max day comes from the
    * user frame, not a separate events scan. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Parity._
    val base = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(col("ts").cast("date")).as("last_day"),
        count(lit(1)).as("f"),
        sum((col("value").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long")).as("m"))
      .localCheckpoint()
    val maxDay: String =
      base.agg(max(col("last_day")).cast("string")).head().getString(0)
    val users = base.withColumn("r",
      datediff(lit(maxDay).cast("date"), col("last_day")).cast("long"))
    def thresholds(dim: String): Seq[Long] = {
      val gr = TwoPass.groupRankLookup(spark,
        users.select(lit("all").as("k"), col(dim).as("c")),
        n => (1 to 4).map(k => (k * n + 4) / 5))("all")
      (1 to 4).map(k => gr.at((k * gr.n + 4) / 5))
    }
    def quintile(c: org.apache.spark.sql.Column,
        th: Seq[Long]): org.apache.spark.sql.Column =
      when(c <= th(0), 1).when(c <= th(1), 2).when(c <= th(2), 3)
        .when(c <= th(3), 4).otherwise(5)
    val (rt, ft, mt) = (thresholds("r"), thresholds("f"), thresholds("m"))
    users
      .withColumn("r_quintile", quintile(col("r"), rt))
      .withColumn("f_quintile", quintile(col("f"), ft))
      .withColumn("m_quintile", quintile(col("m"), mt))
      .groupBy(col("r_quintile"), col("f_quintile"), col("m_quintile"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("r")).as("sr"), sum(col("f")).as("sf"), sum(col("m")).as("sm"))
      .select(col("r_quintile").cast("int").as("r_quintile"),
        col("f_quintile").cast("int").as("f_quintile"),
        col("m_quintile").cast("int").as("m_quintile"),
        col("n_users").cast("bigint").as("n_users"),
        dec6(col("sr").cast("decimal(19,0)")
          / col("n_users").cast("decimal(19,0)")).as("avg_recency_days"),
        dec6(col("sf").cast("decimal(19,0)")
          / col("n_users").cast("decimal(19,0)")).as("avg_frequency"),
        dec6(col("sm").cast("decimal(19,0)")
          / (col("n_users").cast("decimal(19,0)") * 100)).as("avg_monetary"))
      .orderBy(col("r_quintile"), col("f_quintile"), col("m_quintile"))
  }

  val rfmSegmentsSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    datediff('day', MAX(CAST(ts AS DATE)),
      |      (SELECT MAX(CAST(ts AS DATE)) FROM events)) AS r,
      |    COUNT(*) AS f,
      |    SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS m
      |  FROM events GROUP BY 1),
      |rr AS (SELECT r AS v, ROW_NUMBER() OVER (ORDER BY r) AS rn,
      |         COUNT(*) OVER () AS n FROM u),
      |rt AS (SELECT MAX(CASE WHEN rn = (1*n+4)//5 THEN v END) AS t1,
      |         MAX(CASE WHEN rn = (2*n+4)//5 THEN v END) AS t2,
      |         MAX(CASE WHEN rn = (3*n+4)//5 THEN v END) AS t3,
      |         MAX(CASE WHEN rn = (4*n+4)//5 THEN v END) AS t4 FROM rr),
      |fr AS (SELECT f AS v, ROW_NUMBER() OVER (ORDER BY f) AS rn,
      |         COUNT(*) OVER () AS n FROM u),
      |ft AS (SELECT MAX(CASE WHEN rn = (1*n+4)//5 THEN v END) AS t1,
      |         MAX(CASE WHEN rn = (2*n+4)//5 THEN v END) AS t2,
      |         MAX(CASE WHEN rn = (3*n+4)//5 THEN v END) AS t3,
      |         MAX(CASE WHEN rn = (4*n+4)//5 THEN v END) AS t4 FROM fr),
      |mr AS (SELECT m AS v, ROW_NUMBER() OVER (ORDER BY m) AS rn,
      |         COUNT(*) OVER () AS n FROM u),
      |mt AS (SELECT MAX(CASE WHEN rn = (1*n+4)//5 THEN v END) AS t1,
      |         MAX(CASE WHEN rn = (2*n+4)//5 THEN v END) AS t2,
      |         MAX(CASE WHEN rn = (3*n+4)//5 THEN v END) AS t3,
      |         MAX(CASE WHEN rn = (4*n+4)//5 THEN v END) AS t4 FROM mr),
      |q AS (SELECT u.*,
      |        CASE WHEN r <= rt.t1 THEN 1 WHEN r <= rt.t2 THEN 2
      |             WHEN r <= rt.t3 THEN 3 WHEN r <= rt.t4 THEN 4
      |             ELSE 5 END AS r_quintile,
      |        CASE WHEN f <= ft.t1 THEN 1 WHEN f <= ft.t2 THEN 2
      |             WHEN f <= ft.t3 THEN 3 WHEN f <= ft.t4 THEN 4
      |             ELSE 5 END AS f_quintile,
      |        CASE WHEN m <= mt.t1 THEN 1 WHEN m <= mt.t2 THEN 2
      |             WHEN m <= mt.t3 THEN 3 WHEN m <= mt.t4 THEN 4
      |             ELSE 5 END AS m_quintile
      |      FROM u CROSS JOIN rt CROSS JOIN ft CROSS JOIN mt)
      |SELECT CAST(r_quintile AS INT) AS r_quintile,
      |  CAST(f_quintile AS INT) AS f_quintile,
      |  CAST(m_quintile AS INT) AS m_quintile,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST((2 * SUM(r) * 1000000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
      |    / 1000000 AS avg_recency_days,
      |  CAST((2 * SUM(f) * 1000000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
      |    / 1000000 AS avg_frequency,
      |  CAST((2 * SUM(m) * 1000000 + COUNT(*) * 100) // (2 * COUNT(*) * 100)
      |    AS DOUBLE) / 1000000 AS avg_monetary
      |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Q193: EXACT GROUPED MODE — the one classical location statistic
    * the profiling family was missing (q82 mean/variance, q147
    * median/MAD, q51/q128 quantiles): per event type, the most
    * frequent exact cent value, its frequency, and the multimodality
    * count (how many values tie at the max — an honest mode report
    * says when the mode is not unique; the REPORTED mode is the
    * smallest tied value, a deterministic convention both engines
    * pin).
    *
    * Scale shape: one map-side-combined (type, cents) count — the
    * only row-scale exchange — then two aggregations over the bounded
    * distinct-value frame (max count per type; tie count + min-tied
    * pick via conditional aggregation). No window over the raw rows,
    * no sort. */
  def groupedMode(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long").as("c"))
      .groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("n"))
    val top = counts.groupBy(col("event_type"))
      .agg(max(col("n")).as("mode_n"))
    counts.join(broadcast(top), Seq("event_type"))
      .filter(col("n") === col("mode_n"))
      .groupBy(col("event_type"), col("mode_n"))
      .agg(min(col("c")).as("mc"), count(lit(1)).cast("bigint").as("n_modes"))
      .select(col("event_type"),
        dec2(col("mc").cast("decimal(18,0)") / 100).as("mode_value"),
        col("mode_n").cast("bigint").as("mode_n"), col("n_modes"))
      .orderBy(col("event_type"))
  }

  val groupedModeSql: String =
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, MAX(n) AS mode_n FROM c GROUP BY 1)
      |SELECT c.event_type,
      |  CAST(CAST(ROUND(MIN(c.c) / 100, 2) AS DECIMAL(38,2)) AS DOUBLE)
      |    AS mode_value,
      |  CAST(t.mode_n AS BIGINT) AS mode_n,
      |  CAST(COUNT(*) AS BIGINT) AS n_modes
      |FROM c JOIN t ON c.event_type = t.event_type AND c.n = t.mode_n
      |GROUP BY c.event_type, t.mode_n ORDER BY c.event_type""".stripMargin

  /** Q194: OHLC BARS — the time-bucketed open/high/low/close
    * aggregation every monitoring/trading surface runs: per
    * (event type, day): first value, max, min, last value, event
    * count, exact sum. First/last are `min_by`/`max_by` under the
    * TOTAL (ts, event_id) order — the deterministic-argmin rule
    * (q134's lesson): ts alone could tie, and an engine-dependent
    * winner would flip open/close between runs.
    *
    * Scale shape: ONE map-side-combined aggregation — min_by/max_by
    * combine associatively, so open/close never need a window or a
    * sort over the raw events; the output is the bounded
    * types × days grid. */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_type"), col("ts").cast("date").as("day"),
      col("ts"), col("event_id"),
      (col("value").cast("decimal(18,2)") * 100)
        .cast("decimal(18,0)").cast("long").as("c"))
    ev.groupBy(col("event_type"), col("day"))
      .agg(
        min_by(col("c"), struct(col("ts"), col("event_id"))).as("o"),
        max(col("c")).as("h"),
        min(col("c")).as("l"),
        max_by(col("c"), struct(col("ts"), col("event_id"))).as("cl"),
        count(lit(1)).as("n_events"),
        sum(col("c")).as("s"))
      .select(col("event_type"), col("day").cast("string").as("day"),
        dec2(col("o").cast("decimal(18,0)") / 100).as("open"),
        dec2(col("h").cast("decimal(18,0)") / 100).as("high"),
        dec2(col("l").cast("decimal(18,0)") / 100).as("low"),
        dec2(col("cl").cast("decimal(18,0)") / 100).as("close"),
        col("n_events").cast("bigint").as("n_events"),
        dec2(col("s").cast("decimal(18,0)") / 100).as("volume"))
      .orderBy(col("event_type"), col("day"))
  }

  val ohlcBarsSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, ts, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |r AS (SELECT *,
      |        ROW_NUMBER() OVER (PARTITION BY event_type, day
      |          ORDER BY ts, event_id) AS rf,
      |        ROW_NUMBER() OVER (PARTITION BY event_type, day
      |          ORDER BY ts DESC, event_id DESC) AS rl
      |      FROM e)
      |SELECT event_type, day,
      |  CAST(CAST(ROUND(MAX(CASE WHEN rf = 1 THEN c END) / 100, 2)
      |    AS DECIMAL(38,2)) AS DOUBLE) AS open,
      |  CAST(CAST(ROUND(MAX(c) / 100, 2) AS DECIMAL(38,2)) AS DOUBLE) AS high,
      |  CAST(CAST(ROUND(MIN(c) / 100, 2) AS DECIMAL(38,2)) AS DOUBLE) AS low,
      |  CAST(CAST(ROUND(MAX(CASE WHEN rl = 1 THEN c END) / 100, 2)
      |    AS DECIMAL(38,2)) AS DOUBLE) AS close,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(CAST(ROUND(SUM(c) / 100, 2) AS DECIMAL(38,2)) AS DOUBLE) AS volume
      |FROM r GROUP BY event_type, day ORDER BY event_type, day""".stripMargin

  /** Q197: SESSION FLOW MATRIX — the landing/exit web-analytics
    * readout on top of q22's sessionization: for every session (the
    * same 30-minute-gap rule), its ENTRY and EXIT event types under
    * the total (ts_ns, event_id) order, rolled into the bounded
    * (entry, exit) matrix with bounce accounting (single-event
    * sessions) and mean session length (integer micro-unit half-up).
    *
    * Scale shape: ONE per-user window pass assigns session ids; the
    * per-session aggregate needs NO new exchange (hash(user_id)
    * already clusters (user_id, session_id) — grouping keys that
    * extend the window's partition key reuse its shuffle); min_by/
    * max_by pick entry/exit associatively; the matrix is the bounded
    * ≤ types² grid. */
  def sessionFlows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    val per = ev
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        min_by(col("event_type"), struct(col("ts_ns"), col("event_id")))
          .as("entry_type"),
        max_by(col("event_type"), struct(col("ts_ns"), col("event_id")))
          .as("exit_type"),
        count(lit(1)).as("ne"))
    per.groupBy(col("entry_type"), col("exit_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("ne") === 1, 1L).otherwise(0L)).cast("bigint")
          .as("n_bounce"),
        sum(col("ne")).as("se"))
      .select(col("entry_type"), col("exit_type"),
        col("n_sessions").cast("bigint").as("n_sessions"), col("n_bounce"),
        (expr("(2 * se * 1000000 + n_sessions) div (2 * n_sessions)")
          .cast("double") / 1000000).as("avg_events"))
      .orderBy(col("entry_type"), col("exit_type"))
  }

  val sessionFlowsSql: String =
    """WITH f AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS ns,
      |    CASE WHEN LAG(epoch_ns(ts)) OVER w IS NULL
      |           OR epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w
      |              > 30*60*1000000000::BIGINT
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
      |s AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id
      |        ORDER BY ns, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM f),
      |r AS (SELECT *,
      |        ROW_NUMBER() OVER (PARTITION BY user_id, sid
      |          ORDER BY ns, event_id) AS rf,
      |        ROW_NUMBER() OVER (PARTITION BY user_id, sid
      |          ORDER BY ns DESC, event_id DESC) AS rl,
      |        COUNT(*) OVER (PARTITION BY user_id, sid) AS ne
      |      FROM s),
      |per AS (SELECT user_id, sid,
      |          MAX(CASE WHEN rf = 1 THEN event_type END) AS entry_type,
      |          MAX(CASE WHEN rl = 1 THEN event_type END) AS exit_type,
      |          MAX(ne) AS ne
      |        FROM r GROUP BY 1, 2)
      |SELECT entry_type, exit_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
      |  CAST((2 * SUM(ne) * 1000000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
      |    / 1000000 AS avg_events
      |FROM per GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q209: ACTIVITY STREAKS (gaps-and-islands) — the classic consecutive-
    * run surface this suite had not yet exposed (q22/q70 sessionize by
    * time gap; q77 fills gaps; none detect RUNS): per user, the longest
    * streak of consecutive ACTIVE DAYS, plus total active days and
    * streak count. Island key is the constant-difference trick:
    * day_number − row_number is invariant within a consecutive run.
    * Engagement streaks are a standard retention feature and the same
    * shape computes "days a document source kept shipping" in a
    * curation ledger.
    *
    * Exactness: all-integer (dates → epoch-day ints, counts); the only
    * non-integers are the DATE outputs, a proven parity type (q20).
    * Tie pin: equal-length streaks resolve to the EARLIEST start.
    *
    * Scale shape: one shuffle on user_id; the distinct, both windows
    * and the island aggregation all reuse that single exchange
    * (partial_distinct combines map-side first). Output is one row per
    * user. At 100× nothing changes — no global ordering anywhere. */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
      .withColumn("day_n", datediff(col("day"), lit("1970-01-01").cast("date")))
    val byDay = Window.partitionBy(col("user_id")).orderBy(col("day_n"))
    val streaks = days
      .withColumn("grp", col("day_n") - row_number().over(byDay))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"),
        min(col("day")).as("streak_start"), max(col("day")).as("streak_end"))
    val perUser = Window.partitionBy(col("user_id"))
    val pick = Window.partitionBy(col("user_id"))
      .orderBy(col("len").desc, col("streak_start"))
    streaks
      .withColumn("active_days", sum(col("len")).over(perUser))
      .withColumn("n_streaks", count(lit(1)).over(perUser))
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("user_id"),
        col("active_days").cast("bigint").as("active_days"),
        col("n_streaks").cast("bigint").as("n_streaks"),
        col("len").cast("bigint").as("longest_streak"),
        col("streak_start"), col("streak_end"))
      .orderBy(col("user_id"))
  }

  val activityStreaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events),
      |d AS (SELECT user_id, day, day - DATE '1970-01-01' AS day_n FROM days),
      |i AS (SELECT *, day_n - ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY day_n) AS grp
      |      FROM d),
      |s AS (SELECT user_id, grp, COUNT(*) AS len,
      |        MIN(day) AS streak_start, MAX(day) AS streak_end
      |      FROM i GROUP BY 1, 2),
      |r AS (SELECT *,
      |        SUM(len) OVER (PARTITION BY user_id) AS active_days,
      |        COUNT(*) OVER (PARTITION BY user_id) AS n_streaks,
      |        ROW_NUMBER() OVER (PARTITION BY user_id
      |          ORDER BY len DESC, streak_start) AS rn
      |      FROM s)
      |SELECT user_id, CAST(active_days AS BIGINT) AS active_days,
      |  CAST(n_streaks AS BIGINT) AS n_streaks,
      |  CAST(len AS BIGINT) AS longest_streak, streak_start, streak_end
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Q210: INTERVAL UNION (merge-overlaps coverage) — the set-union
    * complement of q154's pairwise overlap join: per user, merge ALL
    * session intervals (per-type 30-min-gap sessions extended by the
    * 30-min idle tail, q154's exact frame) into disjoint busy islands
    * and report covered time, busy-island count, span and utilization.
    * Touching intervals (gap = 0) MERGE — an island break requires a
    * strictly positive gap. This is the "active wall-clock time"
    * utilization metric sessionization alone cannot give, because
    * per-type sessions of one user overlap.
    *
    * Exactness: interval math in exact µs longs (ns are µs·1000 here,
    * so `div 1000` is lossless; µs keeps every value < 2⁵³ where the
    * long→double cast is exact). Utilization is ONE division of two
    * exact-integer doubles — correctly rounded identically in both
    * engines (q199 rule), so it is emitted raw, unrounded.
    *
    * Scale shape: everything — sessionize windows, the running-max-end
    * sweep, the island and user aggregations — partitions by user_id;
    * one exchange feeds all five steps and output is one row per user.
    * The sweep is per-user (bounded), never global: the q177 global-
    * sweep bucketization problem does not arise. */
  def intervalUnion(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ns"), col("event_id"))
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    val sessions = Tables.events(spark, dir)
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(byKey))
      .withColumn("new_session",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("event_type"), col("session_id"))
      .agg(expr("min(ts_ns) div 1000").as("s_us"),
        expr(s"(max(ts_ns) + $SessionTailNs) div 1000").as("e_us"))
    val sweep = Window.partitionBy(col("user_id"))
      .orderBy(col("s_us"), col("e_us"), col("event_type"), col("session_id"))
    val islands = sessions
      .withColumn("prev_max_e",
        max(col("e_us")).over(sweep.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s_us") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        sweep.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("n_sess"),
        min(col("s_us")).as("is_s"), max(col("e_us")).as("is_e"))
    islands.groupBy(col("user_id"))
      .agg(sum(col("n_sess")).cast("bigint").as("n_sessions"),
        count(lit(1)).cast("bigint").as("n_islands"),
        sum(col("is_e") - col("is_s")).cast("bigint").as("covered_us"),
        (max(col("is_e")) - min(col("is_s"))).cast("bigint").as("span_us"),
        max(col("is_e") - col("is_s")).cast("bigint").as("busiest_us"))
      .withColumn("utilization",
        col("covered_us").cast("double") / col("span_us").cast("double"))
      .orderBy(col("user_id"))
  }

  val intervalUnionSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_type, event_id, epoch_ns(ts) AS ns,
      |    CASE WHEN LAG(epoch_ns(ts)) OVER w IS NULL
      |           OR epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > 30*60*1000000000::BIGINT
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id, event_type
      |               ORDER BY epoch_ns(ts), event_id)),
      |sid AS (SELECT user_id, event_type, ns,
      |          SUM(new_session) OVER (PARTITION BY user_id, event_type
      |            ORDER BY ns, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |        FROM flagged),
      |sess AS (SELECT user_id, event_type, session_id,
      |           MIN(ns) // 1000 AS s_us,
      |           (MAX(ns) + 30*60*1000000000::BIGINT) // 1000 AS e_us
      |         FROM sid GROUP BY 1, 2, 3),
      |sw AS (SELECT *,
      |         MAX(e_us) OVER (PARTITION BY user_id
      |           ORDER BY s_us, e_us, event_type, session_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
      |       FROM sess),
      |fl AS (SELECT *,
      |         CASE WHEN prev_max_e IS NULL OR s_us > prev_max_e
      |              THEN 1 ELSE 0 END AS new_island
      |       FROM sw),
      |isl AS (SELECT *,
      |          SUM(new_island) OVER (PARTITION BY user_id
      |            ORDER BY s_us, e_us, event_type, session_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |        FROM fl),
      |g AS (SELECT user_id, island, COUNT(*) AS n_sess,
      |        MIN(s_us) AS is_s, MAX(e_us) AS is_e
      |      FROM isl GROUP BY 1, 2)
      |SELECT user_id,
      |  CAST(SUM(n_sess) AS BIGINT) AS n_sessions,
      |  CAST(COUNT(*) AS BIGINT) AS n_islands,
      |  CAST(SUM(is_e - is_s) AS BIGINT) AS covered_us,
      |  CAST(MAX(is_e) - MIN(is_s) AS BIGINT) AS span_us,
      |  CAST(MAX(is_e - is_s) AS BIGINT) AS busiest_us,
      |  CAST(CAST(SUM(is_e - is_s) AS BIGINT) AS DOUBLE)
      |    / CAST(CAST(MAX(is_e) - MIN(is_s) AS BIGINT) AS DOUBLE) AS utilization
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Q214: CUSUM CHANGEPOINT — single most-likely level-shift locator
    * per event type over the daily count series, the offline
    * complement to q124's online burst flagger (burst = "this hour is
    * anomalous NOW"; changepoint = "WHERE did the regime change").
    * The statistic is the scaled CUSUM max_k |D·S_k − k·S_D| — the
    * integer cross-multiplied form of max_k |S_k − (k/D)·S_D|, i.e.
    * the day at which cumulative volume deviates most from a uniform
    * pace — with the normalized deviation and the pace ratio
    * before/after the located changepoint.
    *
    * Exactness: prefix sums, day indexes and the argmax statistic are
    * all BIGINT (D·S_k ≤ 1e3·1e9 at 100× — deep inside int64); ties
    * pin to the EARLIEST day; the two emitted ratios are single
    * exact-integer divisions (q199 rule, raw doubles).
    *
    * Scale shape: one map-side-combined daily count, then windows
    * partitioned per event_type over the |days|-bounded series frame
    * (calendar-bounded, like q213); one output row per type. */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val perType = Window.partitionBy(col("event_type"))
    val sweep = daily
      .withColumn("k", row_number().over(byDay).cast("long"))
      .withColumn("s_k", sum(col("cnt")).over(
        byDay.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("d_days", count(lit(1)).over(perType).cast("long"))
      .withColumn("s_d", sum(col("cnt")).over(perType))
      .withColumn("stat",
        abs(col("d_days") * col("s_k") - col("k") * col("s_d")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("stat").desc, col("day"))))
      .filter(col("rn") === 1)
    sweep.select(col("event_type"),
        col("d_days").cast("bigint").as("n_days"),
        col("s_d").cast("bigint").as("total_events"),
        col("day").as("cp_day"), col("k").cast("bigint").as("cp_index"),
        col("stat").cast("bigint").as("cusum_num"),
        (col("stat").cast("double")
          / (col("d_days") * col("s_d")).cast("double")).as("cusum_norm"),
        // events/day before (≤ cp) vs after the changepoint, each one
        // exact division; "after" guards the cp == last-day edge
        (col("s_k").cast("double") / col("k").cast("double")).as("rate_before"),
        when(col("d_days") > col("k"),
          (col("s_d") - col("s_k")).cast("double")
            / (col("d_days") - col("k")).cast("double"))
          .otherwise(lit(null).cast("double")).as("rate_after"))
      .orderBy(col("event_type"))
  }

  val cusumChangepointSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |sweep AS (
      |  SELECT event_type, day,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
      |    CAST(SUM(cnt) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS BIGINT) AS s_k,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS d_days,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS s_d
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |ranked AS (
      |  SELECT *, ABS(d_days * s_k - k * s_d) AS stat,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY ABS(d_days * s_k - k * s_d) DESC, day) AS rn
      |  FROM sweep)
      |SELECT event_type, d_days AS n_days, s_d AS total_events,
      |  day AS cp_day, k AS cp_index, CAST(stat AS BIGINT) AS cusum_num,
      |  CAST(stat AS DOUBLE) / CAST(d_days * s_d AS DOUBLE) AS cusum_norm,
      |  CAST(s_k AS DOUBLE) / CAST(k AS DOUBLE) AS rate_before,
      |  CASE WHEN d_days > k
      |    THEN CAST(s_d - s_k AS DOUBLE) / CAST(d_days - k AS DOUBLE)
      |    ELSE NULL END AS rate_after
      |FROM ranked WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** q217 match tolerance: a click farther than this from the purchase
    * (either direction) does not attribute. */
  private val NearestTolUs = 3600L * 1000 * 1000

  /** Q217: NEAREST AS-OF JOIN — q54's as-of join generalized to
    * direction = nearest (the pandas `merge_asof` surface this suite
    * exposed only half of): each purchase matches the user's click
    * CLOSEST IN TIME, before or after, within a 1-hour tolerance.
    * Backward-only as-of mis-attributes the common "purchase lands
    * first, confirmation click arrives seconds later" ordering jitter;
    * nearest is the standard repair. Tie pins follow pandas: equal
    * distance prefers BACKWARD; equal timestamps within a direction
    * pin to the highest event_id backward (the last at-or-before in
    * q54's total order) and the lowest forward.
    *
    * Exactness: all comparisons in exact µs longs (the q54 domain);
    * the emitted gap is SIGNED (negative = click precedes purchase);
    * unmatched purchases emit with NULL click/gap/direction — the
    * LEFT-join contract, so attribution coverage is auditable.
    *
    * Scale shape: identical to q54 — ONE union + ONE window exchange
    * on user_id carries both directions (last-click-before via an
    * unbounded-preceding frame, first-click-after via an unbounded-
    * following frame over the same sort); no range join, no per-user
    * pair space. At 100× the cost is exactly one sort per user. */
  def nearestAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("ts_us", expr("ts_ns div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"), lit(0).as("side"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"), lit(1).as("side"))
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"), col("event_id"))
    val back = order.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = order.rowsBetween(1, Window.unboundedFollowing)
    val picked = clicks.unionByName(purchases)
      .withColumn("b_id",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true).over(back))
      .withColumn("b_ts",
        last(when(col("side") === 0, col("ts_us")), ignoreNulls = true).over(back))
      .withColumn("f_id",
        first(when(col("side") === 0, col("event_id")), ignoreNulls = true).over(fwd))
      .withColumn("f_ts",
        first(when(col("side") === 0, col("ts_us")), ignoreNulls = true).over(fwd))
      .filter(col("side") === 1)
    val okB = col("b_id").isNotNull &&
      (col("ts_us") - col("b_ts")) <= NearestTolUs
    val okF = col("f_id").isNotNull &&
      (col("f_ts") - col("ts_us")) <= NearestTolUs
    val useB = okB && (!okF ||
      (col("ts_us") - col("b_ts")) <= (col("f_ts") - col("ts_us")))
    picked.select(
        col("user_id"), col("event_id").as("purchase_id"),
        when(useB, col("b_id")).when(okF, col("f_id")).as("click_id"),
        when(useB, col("b_ts") - col("ts_us"))
          .when(okF, col("f_ts") - col("ts_us")).as("gap_us"),
        when(useB, "backward").when(okF, "forward").as("direction"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  /** Oracle: ordered LATERAL LIMIT 1 — distance, then direction
    * preference, then the per-direction event_id pin (negated for
    * backward so DESC-within-backward and ASC-within-forward share one
    * ORDER BY). */
  val nearestAsofSql: String =
    s"""SELECT b.user_id, b.event_id AS purchase_id, a.event_id AS click_id,
       |  a.gap_us, a.direction
       |FROM events b
       |LEFT JOIN LATERAL (
       |  SELECT c.event_id,
       |    epoch_us(c.ts) - epoch_us(b.ts) AS gap_us,
       |    CASE WHEN epoch_us(c.ts) <= epoch_us(b.ts)
       |         THEN 'backward' ELSE 'forward' END AS direction
       |  FROM events c
       |  WHERE c.event_type = 'click' AND c.user_id = b.user_id
       |    AND ABS(epoch_us(c.ts) - epoch_us(b.ts)) <= $NearestTolUs
       |  ORDER BY ABS(epoch_us(c.ts) - epoch_us(b.ts)),
       |    CASE WHEN epoch_us(c.ts) <= epoch_us(b.ts) THEN 0 ELSE 1 END,
       |    CASE WHEN epoch_us(c.ts) <= epoch_us(b.ts)
       |         THEN -c.event_id ELSE c.event_id END
       |  LIMIT 1) a ON TRUE
       |WHERE b.event_type = 'purchase'
       |ORDER BY b.user_id, purchase_id""".stripMargin

  /** q218 maximum autocorrelation lag (days). */
  private val AcfMaxLag = 7

  /** Q218: DAILY AUTOCORRELATION FUNCTION — lag-1..7 sample ACF of
    * each event type's daily-count series, the periodicity detector
    * the time-series family lacked (q124 flags bursts, q132 assumes
    * weekly seasonality, q153 smooths, q213/q214 test trend/shift —
    * none MEASURE the correlation structure; a lag-7 peak is the
    * evidence q132's seasonal-naive backtest presupposes). Series =
    * observed daily counts in day order (the corpus is daily-dense;
    * absent days would shift row lags, so n_days is emitted for the
    * density audit).
    *
    * Exactness: r_k is published as the ratio of two exact BIGINTs —
    * the n²-scaled forms num_k = n²·Σx_t·x_{t+k} − n·S·(a_k + b_k) +
    * m_k·S², den = n²·Σx² − n·S² (the q82 sufficient-statistics
    * expansion, partition-invariant) — divided once (q199 rule, raw
    * double). Headroom: n²·Σx² ≤ 1e3²·1e3·1e10 ≈ 1e19 needs the
    * decimal path past ~1e7 events/day·type; fine at every test SF.
    *
    * Scale shape: one map-side-combined daily rollup; the lag columns
    * are 7 LEADs over ONE window on the |days|-bounded per-type frame
    * (q214's argument); posexplode multiplies the BOUNDED frame by 7,
    * never the corpus; per-type totals ride a 5-row broadcast join.
    * Output = types × lags. */
  def dailyAcf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).cast("long").as("x"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val leads = daily.withColumn("y",
      array((1 to AcfMaxLag).map(k => lead(col("x"), k).over(byDay)): _*))
    val pairs = leads
      .select(col("event_type"), col("x"), posexplode(col("y")).as(Seq("p", "y")))
      .filter(col("y").isNotNull)
      .groupBy(col("event_type"), (col("p") + 1).as("lag"))
      .agg(count(lit(1)).cast("long").as("m"),
        sum(col("x") * col("y")).cast("long").as("pxy"),
        sum(col("x")).cast("long").as("ax"),
        sum(col("y")).cast("long").as("sy"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("long").as("s"),
        sum(col("x") * col("x")).cast("long").as("ss"))
    pairs.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("lag").cast("bigint").as("lag"),
        col("n").cast("bigint").as("n_days"),
        col("m").cast("bigint").as("m_pairs"),
        ((col("n") * col("n") * col("pxy")
          - col("n") * col("s") * (col("ax") + col("sy"))
          + col("m") * col("s") * col("s")).cast("double")
          / (col("n") * col("n") * col("ss")
            - col("n") * col("s") * col("s")).cast("double")).as("acf"))
      .orderBy(col("event_type"), col("lag"))
  }

  val dailyAcfSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |r AS (SELECT event_type, x,
       |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
       |      FROM daily),
       |ks AS (SELECT unnest(generate_series(1, $AcfMaxLag)) AS lag),
       |pr AS (SELECT a.event_type, k.lag,
       |         CAST(COUNT(*) AS BIGINT) AS m,
       |         CAST(SUM(a.x * b.x) AS BIGINT) AS pxy,
       |         CAST(SUM(a.x) AS BIGINT) AS ax,
       |         CAST(SUM(b.x) AS BIGINT) AS sy
       |       FROM r a CROSS JOIN ks k
       |       JOIN r b ON b.event_type = a.event_type AND b.rn = a.rn + k.lag
       |       GROUP BY 1, 2),
       |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS ss
       |       FROM daily GROUP BY 1)
       |SELECT p.event_type, CAST(p.lag AS BIGINT) AS lag, n AS n_days,
       |  m AS m_pairs,
       |  CAST(n * n * pxy - n * s * (ax + sy) + m * s * s AS DOUBLE)
       |    / CAST(n * n * ss - n * s * s AS DOUBLE) AS acf
       |FROM pr p JOIN st USING (event_type)
       |ORDER BY event_type, lag""".stripMargin

  /** Q221: SEGMENTED REGRESSION (interrupted time series) — the
    * follow-through on q214: CUSUM locates the most likely level
    * shift; q221 QUANTIFIES the regime change by fitting separate
    * OLS lines (daily count vs day index) before and at-or-after the
    * located changepoint and reporting both slopes, both intercepts
    * and the slope change — the interrupted-time-series readout
    * ("did the trend bend, or just step?") that a changepoint alone
    * cannot answer.
    *
    * Exactness: the changepoint is q214's exact integer argmax
    * (earliest-day tie pin); each side's slope and intercept are
    * single divisions of exact-BIGINT sufficient statistics
    * (m·Σky−Σk·Σy over m·Σk²−(Σk)², the q135 closed form; k is the
    * 1-based day index so Σk² ≤ n³ ≈ 1e9 at decade scale — deep in
    * int64), q199-rule raw doubles. A side with < 2 points (cp on
    * the first/last day) emits NULL slope/intercept, never a 0/0.
    *
    * Scale shape: q214's chain — one map-side-combined daily rollup,
    * windows on the |days|-bounded per-type frame — plus one
    * broadcast join of the 1-row-per-type changepoint back onto the
    * bounded daily frame and a conditional-sum aggregation to one
    * row per type. Nothing row-scale past the first rollup. */
  def segmentedRegression(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val perType = Window.partitionBy(col("event_type"))
    val indexed = daily
      .withColumn("k", row_number().over(byDay).cast("long"))
      .withColumn("s_k", sum(col("cnt")).over(
        byDay.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("d_days", count(lit(1)).over(perType).cast("long"))
      .withColumn("s_d", sum(col("cnt")).over(perType))
    val cp = indexed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(
          abs(col("d_days") * col("s_k") - col("k") * col("s_d")).desc,
          col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("k").as("cp_k"), col("day").as("cp_day"))
    val sided = indexed.select(col("event_type"), col("k"), col("cnt"))
      .join(broadcast(cp), Seq("event_type"))
      .withColumn("pre", (col("k") <= col("cp_k")).cast("long"))
    val g = sided.groupBy(col("event_type"), col("cp_k"), col("cp_day"))
      .agg(
        sum(col("pre")).cast("long").as("m_b"),
        sum(when(col("pre") === 1L, col("k")).otherwise(0L)).cast("long").as("st_b"),
        sum(when(col("pre") === 1L, col("cnt")).otherwise(0L)).cast("long").as("sy_b"),
        sum(when(col("pre") === 1L, col("k") * col("k")).otherwise(0L)).cast("long").as("stt_b"),
        sum(when(col("pre") === 1L, col("k") * col("cnt")).otherwise(0L)).cast("long").as("sty_b"),
        sum(lit(1L) - col("pre")).cast("long").as("m_a"),
        sum(when(col("pre") === 0L, col("k")).otherwise(0L)).cast("long").as("st_a"),
        sum(when(col("pre") === 0L, col("cnt")).otherwise(0L)).cast("long").as("sy_a"),
        sum(when(col("pre") === 0L, col("k") * col("k")).otherwise(0L)).cast("long").as("stt_a"),
        sum(when(col("pre") === 0L, col("k") * col("cnt")).otherwise(0L)).cast("long").as("sty_a"))
    def slope(m: String, st: String, sy: String, stt: String, sty: String) = {
      val den = col(m) * col(stt) - col(st) * col(st)
      when(den > 0,
        (col(m) * col(sty) - col(st) * col(sy)).cast("double") / den.cast("double"))
    }
    def icept(m: String, st: String, sy: String, stt: String, sty: String) = {
      val den = col(m) * col(stt) - col(st) * col(st)
      when(den > 0,
        (col(sy) * col(stt) - col(st) * col(sty)).cast("double") / den.cast("double"))
    }
    val sb = slope("m_b", "st_b", "sy_b", "stt_b", "sty_b")
    val sa = slope("m_a", "st_a", "sy_a", "stt_a", "sty_a")
    g.select(col("event_type"), col("cp_day"),
        col("cp_k").cast("bigint").as("cp_index"),
        col("m_b").as("n_before"), col("m_a").as("n_after"),
        sb.as("slope_before"),
        icept("m_b", "st_b", "sy_b", "stt_b", "sty_b").as("intercept_before"),
        sa.as("slope_after"),
        icept("m_a", "st_a", "sy_a", "stt_a", "sty_a").as("intercept_after"),
        (sa - sb).as("slope_change"))
      .orderBy(col("event_type"))
  }

  val segmentedRegressionSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |ix AS (
      |  SELECT event_type, day, cnt,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
      |    CAST(SUM(cnt) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS BIGINT) AS s_k,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS d_days,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS s_d
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |cp AS (
      |  SELECT event_type, k AS cp_k, day AS cp_day FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY ABS(d_days * s_k - k * s_d) DESC, day) AS rn
      |    FROM ix) WHERE rn = 1),
      |g AS (
      |  SELECT i.event_type, cp.cp_k, cp.cp_day,
      |    CAST(SUM(CASE WHEN i.k <= cp.cp_k THEN 1 ELSE 0 END) AS BIGINT) AS m_b,
      |    CAST(SUM(CASE WHEN i.k <= cp.cp_k THEN i.k ELSE 0 END) AS BIGINT) AS st_b,
      |    CAST(SUM(CASE WHEN i.k <= cp.cp_k THEN i.cnt ELSE 0 END) AS BIGINT) AS sy_b,
      |    CAST(SUM(CASE WHEN i.k <= cp.cp_k THEN i.k * i.k ELSE 0 END) AS BIGINT) AS stt_b,
      |    CAST(SUM(CASE WHEN i.k <= cp.cp_k THEN i.k * i.cnt ELSE 0 END) AS BIGINT) AS sty_b,
      |    CAST(SUM(CASE WHEN i.k > cp.cp_k THEN 1 ELSE 0 END) AS BIGINT) AS m_a,
      |    CAST(SUM(CASE WHEN i.k > cp.cp_k THEN i.k ELSE 0 END) AS BIGINT) AS st_a,
      |    CAST(SUM(CASE WHEN i.k > cp.cp_k THEN i.cnt ELSE 0 END) AS BIGINT) AS sy_a,
      |    CAST(SUM(CASE WHEN i.k > cp.cp_k THEN i.k * i.k ELSE 0 END) AS BIGINT) AS stt_a,
      |    CAST(SUM(CASE WHEN i.k > cp.cp_k THEN i.k * i.cnt ELSE 0 END) AS BIGINT) AS sty_a
      |  FROM ix i JOIN cp ON i.event_type = cp.event_type
      |  GROUP BY 1, 2, 3)
      |SELECT event_type, cp_day, CAST(cp_k AS BIGINT) AS cp_index,
      |  m_b AS n_before, m_a AS n_after,
      |  CASE WHEN m_b * stt_b - st_b * st_b > 0
      |    THEN CAST(m_b * sty_b - st_b * sy_b AS DOUBLE)
      |       / CAST(m_b * stt_b - st_b * st_b AS DOUBLE) END AS slope_before,
      |  CASE WHEN m_b * stt_b - st_b * st_b > 0
      |    THEN CAST(sy_b * stt_b - st_b * sty_b AS DOUBLE)
      |       / CAST(m_b * stt_b - st_b * st_b AS DOUBLE) END AS intercept_before,
      |  CASE WHEN m_a * stt_a - st_a * st_a > 0
      |    THEN CAST(m_a * sty_a - st_a * sy_a AS DOUBLE)
      |       / CAST(m_a * stt_a - st_a * st_a AS DOUBLE) END AS slope_after,
      |  CASE WHEN m_a * stt_a - st_a * st_a > 0
      |    THEN CAST(sy_a * stt_a - st_a * sty_a AS DOUBLE)
      |       / CAST(m_a * stt_a - st_a * st_a AS DOUBLE) END AS intercept_after,
      |  (CASE WHEN m_a * stt_a - st_a * st_a > 0
      |    THEN CAST(m_a * sty_a - st_a * sy_a AS DOUBLE)
      |       / CAST(m_a * stt_a - st_a * st_a AS DOUBLE) END)
      |  - (CASE WHEN m_b * stt_b - st_b * st_b > 0
      |    THEN CAST(m_b * sty_b - st_b * sy_b AS DOUBLE)
      |       / CAST(m_b * stt_b - st_b * st_b AS DOUBLE) END) AS slope_change
      |FROM g ORDER BY event_type""".stripMargin

  /** Q227: KAPLAN–MEIER SURVIVAL CURVE — time-to-event analysis with
    * RIGHT CENSORING, the readout q159's conversion-latency quantiles
    * silently bias: quantiles over CONVERTED users only ignore the
    * users still waiting, overstating conversion speed. The estimator
    * companion to q152's Nelson–Aalen: N-A SUMS discrete hazards into
    * cumulative hazard H(t) (uncensored lifetimes there); K-M
    * MULTIPLIES survival factors into S(t) with explicit censoring —
    * same risk-set machinery, different estimand and a genuinely
    * different numeric discipline (a pinned product fold vs an exact
    * rational sum). KM handles censoring correctly: duration = whole days from a user's first click
    * to their first purchase AFTER it; users with no such purchase are
    * censored at the corpus horizon (max event ts). At each event day
    * t: n_t = users still at risk, d_t = conversions, and
    * S(t) = Π_{t'≤t}(1 − d_t'/n_t') — the probability of remaining
    * unconverted past t.
    *
    * Exactness: durations, risk counts, event and censor counts are
    * exact integers. S(t) is a RUNNING PRODUCT of IEEE doubles —
    * order-sensitive, so it is computed as an explicit LEFT FOLD over
    * the day-sorted factor list on BOTH engines (Spark `aggregate`
    * HOF / DuckDB `list_reduce`), never as a float aggregation whose
    * combine order floats free. Each factor is one correctly-rounded
    * division + subtraction; the fold order is pinned by the sort, so
    * the products replay bit-for-bit (q199 dag rule, iterated).
    *
    * Scale shape: one user_id window exchange carries first-click,
    * the conditional first-purchase reuses it (same partitioning, no
    * second exchange); the corpus horizon is a 1-row aggregate joined
    * on a constant key (BroadcastHashJoin, not a cartesian). Everything
    * after the per-user reduce lives on the |days|-bounded duration
    * histogram: reverse-cumulative risk counts on a single-task window
    * over that bounded frame (the q212 argument), then ONE collected
    * array (≤ |days| structs) for the fold — the O(|days|²) slice-fold
    * is driver-free and bounded by the calendar, not the corpus. */
  def kaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"))
    val horizon = ev.agg(max(col("ts_us")).as("mt")).withColumn("k", lit(1))
    val byUser = Window.partitionBy(col("user_id"))
    val perUser = ev
      .withColumn("c", min(when(col("event_type") === "click",
        col("ts_us"))).over(byUser))
      .filter(col("c").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("c")).as("c"),
        min(when(col("event_type") === "purchase" && col("ts_us") > col("c"),
          col("ts_us"))).as("p"))
      .withColumn("k", lit(1))
      .join(broadcast(horizon), Seq("k"))
      .select(
        when(col("p").isNotNull, expr("(p - c) div 86400000000"))
          .otherwise(expr("(mt - c) div 86400000000")).as("dur"),
        col("p").isNotNull.cast("long").as("ev"))
    val days = perUser.groupBy(col("dur"))
      .agg(sum(col("ev")).cast("long").as("d"),
        sum(lit(1L) - col("ev")).cast("long").as("cens"))
    val revCum = Window.partitionBy().orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val curve = days
      .withColumn("n", sum(col("d") + col("cens")).over(revCum))
      .filter(col("d") > 0)
    curve
      .agg(sort_array(collect_list(struct(col("dur"), col("d"),
        col("cens"), col("n")))).as("xs"))
      .select(explode(expr(
        """transform(xs, (x, i) -> struct(
          |  x.dur AS duration_days, x.n AS n_risk, x.d AS n_event,
          |  x.cens AS n_censored,
          |  aggregate(slice(xs, 1, i + 1), CAST(1.0 AS DOUBLE),
          |    (acc, e) -> acc * (CAST(1.0 AS DOUBLE)
          |      - CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE)))
          |    AS survival))""".stripMargin)).as("r"))
      .select(col("r.duration_days"), col("r.n_risk"), col("r.n_event"),
        col("r.n_censored"), col("r.survival"))
      .orderBy(col("duration_days"))
  }

  /** Oracle: identical KM chain; the fold is `list_reduce` over the
    * same day-sorted factor list (1-based `list_slice`/lambda index
    * mirroring Spark's 0-based `slice(…, i + 1)`). */
  val kaplanMeierSql: String =
    """WITH mx AS (SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS mt
      |            FROM events),
      |u AS (SELECT user_id,
      |        MIN(epoch_us(CAST(ts AS TIMESTAMP)))
      |          FILTER (WHERE event_type = 'click') AS c
      |      FROM events GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS p
      |      FROM events e JOIN u ON u.user_id = e.user_id
      |      WHERE e.event_type = 'purchase'
      |        AND epoch_us(CAST(e.ts AS TIMESTAMP)) > u.c
      |      GROUP BY 1),
      |d AS (SELECT CASE WHEN p.p IS NOT NULL
      |          THEN (p.p - u.c) // 86400000000
      |          ELSE (mx.mt - u.c) // 86400000000 END AS dur,
      |        CASE WHEN p.p IS NOT NULL THEN 1 ELSE 0 END AS ev
      |      FROM u LEFT JOIN p USING (user_id) CROSS JOIN mx
      |      WHERE u.c IS NOT NULL),
      |day AS (SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
      |          CAST(SUM(1 - ev) AS BIGINT) AS cens
      |        FROM d GROUP BY 1),
      |r AS (SELECT dur, d, cens,
      |        CAST(SUM(d + cens) OVER (ORDER BY dur DESC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n
      |      FROM day),
      |lst AS (SELECT list(struct_pack(dur := dur, d := d, cens := cens, n := n)
      |          ORDER BY dur) AS xs
      |        FROM r WHERE d > 0)
      |SELECT x.dur AS duration_days, x.n AS n_risk, x.d AS n_event,
      |  x.cens AS n_censored,
      |  list_reduce(
      |    list_transform(list_slice(xs, 1, x.i),
      |      e -> CAST(1.0 AS DOUBLE) - CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE)),
      |    (a, b) -> a * b) AS survival
      |FROM (SELECT unnest(list_transform(xs, (x, i) ->
      |        struct_pack(dur := x.dur, d := x.d, cens := x.cens,
      |          n := x.n, i := i))) AS x, xs
      |      FROM lst)
      |ORDER BY duration_days""".stripMargin

  /** Q234: ROLLING CORRELATION — 7-day rolling Pearson r between the
    * daily click and purchase counts: the lead-indicator diagnostic
    * that pairs with q218 (ACF = a series against its own past; this
    * is two series against each other) and q221 (did the relationship
    * itself drift, not just the level). Windows shorter than 7 days
    * (the series head) emit with their actual m — the consumer sees
    * the support, nothing is silently dropped.
    *
    * Exactness: the five sufficient statistics are exact BIGINT sums
    * over the ROWS frame; r is ONE fixed IEEE dag
    * (m·Σxy − ΣxΣy) / (√(m·Σx²−(Σx)²) · √(m·Σy²−(Σy)²)) on their
    * exact double images (all ≤ 7·(counts ≤ ~1e6)² — far below 2⁵³),
    * NULL when either side is constant (zero variance), never a 0/0.
    *
    * Scale shape: one map-side-combined daily rollup collapses row
    * scale; the five window sums share ONE ROWS-7 frame over the
    * |days|-bounded series (single-task, the q212 boundedness
    * argument); the dag is per-row scalar math. */
  def rollingCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .cast("long").as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast("long").as("y"))
    val w = Window.partitionBy().orderBy(col("day")).rowsBetween(-6, 0)
    val s = daily
      .withColumn("m", count(lit(1)).over(w).cast("long"))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
    val varx = col("m") * col("sxx") - col("sx") * col("sx")
    val vary = col("m") * col("syy") - col("sy") * col("sy")
    s.select(col("day"), col("m"), col("x"), col("y"),
        when(varx > 0 && vary > 0,
          (col("m") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt(varx.cast("double")) * sqrt(vary.cast("double"))))
          .as("rolling_r"))
      .orderBy(col("day"))
  }

  val rollingCorrelationSql: String =
    """WITH daily AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1),
      |s AS (
      |  SELECT day, x, y,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS m,
      |    CAST(SUM(x) OVER w AS BIGINT) AS sx,
      |    CAST(SUM(y) OVER w AS BIGINT) AS sy,
      |    CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) OVER w AS BIGINT) AS syy
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT day, m, x, y,
      |  CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
      |    THEN CAST(m * sxy - sx * sy AS DOUBLE)
      |      / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
      |         * sqrt(CAST(m * syy - sy * sy AS DOUBLE)))
      |  END AS rolling_r
      |FROM s ORDER BY day""".stripMargin

  /** Q236: LOG-RANK TEST — do two cohorts share a survival curve?
    * The inference half of the q152/q227 survival family: q227 DRAWS
    * the click→purchase conversion curve; the log-rank test says
    * whether the curve differs between high-activity and low-activity
    * users (split at the exact lower-median per-user event count,
    * fetched through the audited [[TwoPass.groupRankLookup]] kernel —
    * no magic constant, no driver sort). At each conversion day t:
    * O−E contribution d₁ₜ − dₜ·n₁ₜ/nₜ and hypergeometric variance
    * dₜ·(n₁ₜ/nₜ)·(n₀ₜ/nₜ)·(nₜ−dₜ)/(nₜ−1); z = Σ(O−E)/√ΣV. Censoring
    * identical to q227 (horizon = corpus max ts).
    *
    * Exactness: risk/event/censor counts are exact integers computed
    * on the |days|-bounded frame; each day's two terms are fixed IEEE
    * dags on those exact values; the two Σs are LEFT FOLDS over the
    * day-sorted term list (q227's pinned-order discipline — a float
    * aggregation's combine order would float free), and √ is correctly
    * rounded. The split threshold is an exact order statistic.
    *
    * Scale shape: q227's chain with a group axis — one user_id window
    * exchange (first click + conditional first purchase + event count
    * in the same pass), the bounded count-histogram kernel for the
    * median, the (dur × 2 groups) bounded day frame with two
    * reverse-cumulative risk counts, one collected ≤|days| array for
    * the folds. 1-row horizon broadcast as in q227 (allowlisted). */
  def logRankTest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"))
    val horizon = ev.agg(max(col("ts_us")).as("mt")).withColumn("k", lit(1))
    val byUser = Window.partitionBy(col("user_id"))
    // round-12: the user window + per-user agg lineage fed the kernel's
    // three passes and the duration derivation — checkpoint it once
    val perUser = ev
      .withColumn("c", min(when(col("event_type") === "click",
        col("ts_us"))).over(byUser))
      .filter(col("c").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("c")).as("c"),
        min(when(col("event_type") === "purchase" && col("ts_us") > col("c"),
          col("ts_us"))).as("p"),
        count(lit(1)).cast("long").as("n_ev"))
      .localCheckpoint()
    val thr = TwoPass.groupRankLookup(spark,
      perUser.select(lit("all").as("k"), col("n_ev").as("c")),
      n => Seq((n + 1) / 2))("all").at.values.head
    val rows = perUser
      .withColumn("k", lit(1))
      .join(broadcast(horizon), Seq("k"))
      .select(
        when(col("p").isNotNull, expr("(p - c) div 86400000000"))
          .otherwise(expr("(mt - c) div 86400000000")).as("dur"),
        col("p").isNotNull.cast("long").as("ev"),
        (col("n_ev") > thr).cast("long").as("g"))
    val days = rows.groupBy(col("dur"))
      .agg(sum(col("ev") * col("g")).cast("long").as("d1"),
        sum((lit(1L) - col("ev")) * col("g")).cast("long").as("c1"),
        sum(col("ev") * (lit(1L) - col("g"))).cast("long").as("d0"),
        sum((lit(1L) - col("ev")) * (lit(1L) - col("g"))).cast("long")
          .as("c0"))
    val revCum = Window.partitionBy().orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val curve = days
      .withColumn("n1", sum(col("d1") + col("c1")).over(revCum))
      .withColumn("n0", sum(col("d0") + col("c0")).over(revCum))
      .withColumn("d", col("d1") + col("d0"))
      .withColumn("n", col("n1") + col("n0"))
      .withColumn("oe_t",
        col("d1").cast("double")
          - col("d").cast("double") * col("n1").cast("double")
            / col("n").cast("double"))
      .withColumn("v_t",
        when(col("n") > 1,
          ((col("d").cast("double")
            * (col("n1").cast("double") / col("n").cast("double")))
            * (col("n0").cast("double") / col("n").cast("double")))
            * ((col("n") - col("d")).cast("double")
              / (col("n") - 1).cast("double")))
          .otherwise(lit(0.0d)))
    // group totals sum over ALL days (censor-only days included);
    // the fold list keeps only event days — when() nulls are skipped
    // by collect_list, so both ride one aggregation
    curve
      .agg(
        sum(when(col("d") > 0, 1L).otherwise(0L)).cast("long")
          .as("n_event_days"),
        sum(col("d1") + col("c1")).cast("long").as("x1"),
        sum(col("d0") + col("c0")).cast("long").as("x0"),
        sort_array(collect_list(when(col("d") > 0,
          struct(col("dur"), col("oe_t"), col("v_t"))))).as("xs"))
      .select(lit(thr).as("split_threshold"),
        col("x1").as("n_users_hi"), col("x0").as("n_users_lo"),
        col("n_event_days"),
        expr("aggregate(xs, CAST(0.0 AS DOUBLE), (a, e) -> a + e.oe_t)")
          .as("o_minus_e"),
        expr("aggregate(xs, CAST(0.0 AS DOUBLE), (a, e) -> a + e.v_t)")
          .as("var_lr"))
      .withColumn("z_lr",
        when(col("var_lr") > 0, col("o_minus_e") / sqrt(col("var_lr"))))
  }

  /** Oracle: identical chain; the exact lower-median threshold is
    * recomputed from the count histogram, and the two Σs are
    * `list_reduce` folds over the same day-sorted term list. */
  val logRankTestSql: String =
    """WITH ev AS (SELECT user_id, event_type,
      |              epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |mx AS (SELECT MAX(us) AS mt FROM ev),
      |u AS (SELECT user_id, MIN(CASE WHEN event_type = 'click' THEN us END) AS c,
      |        CAST(COUNT(*) AS BIGINT) AS n_ev
      |      FROM ev GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(e.us) AS p
      |      FROM ev e JOIN u ON u.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND e.us > u.c GROUP BY 1),
      |thr AS (SELECT MIN(n_ev) AS t FROM (
      |    SELECT n_ev,
      |      SUM(cnt) OVER (ORDER BY n_ev ROWS UNBOUNDED PRECEDING) AS cum,
      |      SUM(cnt) OVER () AS tot
      |    FROM (SELECT n_ev, COUNT(*) AS cnt FROM u WHERE c IS NOT NULL
      |          GROUP BY 1))
      |  WHERE 2 * cum >= tot),
      |rows_ AS (
      |  SELECT CASE WHEN p.p IS NOT NULL THEN (p.p - u.c) // 86400000000
      |         ELSE (mx.mt - u.c) // 86400000000 END AS dur,
      |    CASE WHEN p.p IS NOT NULL THEN 1 ELSE 0 END AS ev,
      |    CASE WHEN u.n_ev > thr.t THEN 1 ELSE 0 END AS g
      |  FROM u LEFT JOIN p USING (user_id) CROSS JOIN mx CROSS JOIN thr
      |  WHERE u.c IS NOT NULL),
      |day AS (SELECT dur,
      |    CAST(SUM(ev * g) AS BIGINT) AS d1,
      |    CAST(SUM((1 - ev) * g) AS BIGINT) AS c1,
      |    CAST(SUM(ev * (1 - g)) AS BIGINT) AS d0,
      |    CAST(SUM((1 - ev) * (1 - g)) AS BIGINT) AS c0
      |  FROM rows_ GROUP BY 1),
      |r AS (SELECT dur, d1, c1, d0, c0,
      |    CAST(SUM(d1 + c1) OVER w AS BIGINT) AS n1,
      |    CAST(SUM(d0 + c0) OVER w AS BIGINT) AS n0
      |  FROM day
      |  WINDOW w AS (ORDER BY dur DESC ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW)),
      |t AS (SELECT dur, d1, c1, d0, c0, n1, n0,
      |    d1 + d0 AS d, n1 + n0 AS n FROM r),
      |terms AS (SELECT dur, d1, c1, d0, c0, d,
      |    CAST(d1 AS DOUBLE) - CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)
      |      / CAST(n AS DOUBLE) AS oe_t,
      |    CASE WHEN n > 1 THEN
      |      ((CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)))
      |        * (CAST(n0 AS DOUBLE) / CAST(n AS DOUBLE)))
      |        * (CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE))
      |      ELSE 0.0 END AS v_t
      |  FROM t),
      |lst AS (SELECT
      |    CAST(COUNT(*) FILTER (WHERE d > 0) AS BIGINT) AS n_event_days,
      |    CAST(SUM(d1 + c1) AS BIGINT) AS x1,
      |    CAST(SUM(d0 + c0) AS BIGINT) AS x0,
      |    list(oe_t ORDER BY dur) FILTER (WHERE d > 0) AS oes,
      |    list(v_t ORDER BY dur) FILTER (WHERE d > 0) AS vs
      |  FROM terms)
      |SELECT (SELECT CAST(t AS BIGINT) FROM thr) AS split_threshold,
      |  x1 AS n_users_hi, x0 AS n_users_lo, n_event_days,
      |  list_reduce(oes, (a, b) -> a + b) AS o_minus_e,
      |  list_reduce(vs, (a, b) -> a + b) AS var_lr,
      |  CASE WHEN list_reduce(vs, (a, b) -> a + b) > 0 THEN
      |    list_reduce(oes, (a, b) -> a + b)
      |      / sqrt(list_reduce(vs, (a, b) -> a + b)) END AS z_lr
      |FROM lst""".stripMargin

  /** Q239: SEASONAL DECOMPOSITION (classical additive) — each event
    * type's daily-count series split into trend + day-of-week seasonal
    * + residual: trend = centered 7-day moving average, seasonal =
    * the mean DETRENDED value of each weekday, residual = the rest.
    * The analysis-side complement of the series family: q132 FORECASTS
    * assuming weekly seasonality, q218 DETECTS it (lag-7 ACF), q153
    * smooths through it — this one QUANTIFIES each component so a
    * consumer can see how much of the signal is calendar. Edge days
    * without a full 7-day window are excluded (no padded
    * half-averages) — the decomposition telescopes exactly on every
    * emitted row: x = trend + seasonal + residual at full precision.
    *
    * Exactness: everything is a rational of exact BIGINTs — trend =
    * S₇/7, seasonal = Σ(7x−S₇)/(7·c_dow), residual =
    * (c_dow·(7x−S₇) − Σ(7x−S₇))/(7·c_dow) — published via the
    * sign-aware micro-unit division (detrended values go negative).
    * Day-of-week is computed as (day − 1996-01-01) mod 7 on BOTH
    * engines — never the engines' dayofweek(), whose weekday origin
    * differs (Spark 1=Sunday, DuckDB 0=Sunday).
    *
    * Scale shape: one map-side-combined daily rollup; the ROWS-7
    * window and the (type × 7) seasonal aggregation live on the
    * |days|-bounded frame; seasonal means broadcast back. */
  def seasonalDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).cast("long").as("x"))
      .withColumn("dow", pmod(datediff(col("day"), lit("1996-01-01")), lit(7))
        .cast("long"))
    val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val trended = daily
      .withColumn("c7", count(lit(1)).over(w7))
      .withColumn("s7", sum(col("x")).over(w7))
      .filter(col("c7") === 7)
      .withColumn("dnum", lit(7L) * col("x") - col("s7")) // detrended × 7
    val seasonal = trended.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("dnum")).cast("long").as("snum"),
        count(lit(1)).cast("long").as("scnt"))
    trended.join(broadcast(seasonal), Seq("event_type", "dow"))
      .withColumn("rnum", col("scnt") * col("dnum") - col("snum"))
      .withColumn("sden", lit(7L) * col("scnt"))
      .select(col("event_type"), col("day"), col("x"),
        (expr("(2 * CAST(s7 AS DECIMAL(38,0)) * 1000000 + 7) div 14")
          .cast("double") / 1000000).as("trend"),
        (expr("""cast(sign(snum) as bigint)
               * ((2 * CAST(abs(snum) AS DECIMAL(38,0)) * 1000000 + sden)
                  div (2 * sden))""").cast("double") / 1000000).as("seasonal"),
        (expr("""cast(sign(rnum) as bigint)
               * ((2 * CAST(abs(rnum) AS DECIMAL(38,0)) * 1000000 + sden)
                  div (2 * sden))""").cast("double") / 1000000).as("residual"))
      .orderBy(col("event_type"), col("day"))
  }

  val seasonalDecompositionSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |d2 AS (SELECT *,
      |    CAST(((day - DATE '1996-01-01') % 7 + 7) % 7 AS BIGINT) AS dow
      |  FROM daily),
      |t AS (SELECT *,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS c7,
      |    CAST(SUM(x) OVER w AS BIGINT) AS s7
      |  FROM d2
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |full_ AS (SELECT *, 7 * x - s7 AS dnum FROM t WHERE c7 = 7),
      |seas AS (SELECT event_type, dow,
      |    CAST(SUM(dnum) AS BIGINT) AS snum,
      |    CAST(COUNT(*) AS BIGINT) AS scnt
      |  FROM full_ GROUP BY 1, 2),
      |j AS (SELECT f.event_type, f.day, f.x, f.s7, f.dnum,
      |    s.snum, s.scnt, s.scnt * f.dnum - s.snum AS rnum,
      |    7 * s.scnt AS sden
      |  FROM full_ f JOIN seas s
      |    ON f.event_type = s.event_type AND f.dow = s.dow)
      |SELECT event_type, day, x,
      |  CAST((2 * CAST(s7 AS HUGEINT) * 1000000 + 7) // 14 AS DOUBLE)
      |    / 1000000 AS trend,
      |  CAST(SIGN(snum) * ((2 * CAST(ABS(snum) AS HUGEINT) * 1000000 + sden)
      |    // (2 * sden)) AS DOUBLE) / 1000000 AS seasonal,
      |  CAST(SIGN(rnum) * ((2 * CAST(ABS(rnum) AS HUGEINT) * 1000000 + sden)
      |    // (2 * sden)) AS DOUBLE) / 1000000 AS residual
      |FROM j ORDER BY event_type, day""".stripMargin

  /** Q243: RUNS TEST (Wald–Wolfowitz) — is each event type's daily
    * count series RANDOM around its median, or does it clump? The
    * randomness gate the trend/shift family presupposes: q213 tests
    * monotone trend, q214 locates a level shift, q218 measures
    * autocorrelation — the runs test is the model-free "is there ANY
    * serial structure" screen that says whether those analyses have
    * something to explain. Signs are vs the per-type exact lower
    * median; days AT the median are discarded (the standard
    * treatment); R = number of maximal same-sign runs in day order;
    * z = (R − μ)/σ with μ = 2n₊n₋/n + 1 and
    * σ² = 2n₊n₋(2n₊n₋ − n)/(n²(n−1)).
    *
    * Exactness: the median is an order statistic over the
    * |days|-bounded per-type frame (the q212 boundedness argument —
    * counts live on a bounded daily frame, so a per-type rank window
    * is NOT the q224 hazard); runs and sign counts are exact
    * integers; μ, σ², z are one fixed IEEE dag (·, /, √) on their
    * exact double images.
    *
    * Scale shape: one map-side-combined daily rollup; every later
    * stage (rank window, median pick, lag window, final aggregation)
    * lives on the bounded (type × days) frame. */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).cast("long").as("x"))
    val byX = Window.partitionBy(col("event_type")).orderBy(col("x"), col("day"))
    val perT = Window.partitionBy(col("event_type"))
    val med = daily
      .withColumn("rn", row_number().over(byX))
      .withColumn("nd", count(lit(1)).over(perT))
      .filter(col("rn") === expr("(nd + 1) div 2"))
      .select(col("event_type"), col("x").as("med"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val signed = daily.join(broadcast(med), Seq("event_type"))
      .filter(col("x") =!= col("med"))
      .withColumn("s", when(col("x") > col("med"), 1L).otherwise(-1L))
      .withColumn("prev", lag(col("s"), 1).over(byDay))
      .withColumn("run_start",
        when(col("prev").isNull || col("prev") =!= col("s"), 1L)
          .otherwise(0L))
    val cells = signed.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("s") === 1L, 1L).otherwise(0L)).cast("long").as("np"),
        sum(when(col("s") === -1L, 1L).otherwise(0L)).cast("long").as("nm"),
        sum(col("run_start")).cast("long").as("r"))
    val nD = col("n").cast("double")
    val twoPN = (lit(2L) * col("np") * col("nm")).cast("double")
    val mu = twoPN / nD + lit(1.0d)
    val varR = (twoPN * (lit(2L) * col("np") * col("nm") - col("n"))
      .cast("double")) / ((nD * nD) * (col("n") - 1).cast("double"))
    cells.select(col("event_type"), col("n").as("n_days_used"),
        col("np").as("n_above"), col("nm").as("n_below"),
        col("r").as("n_runs"),
        mu.as("expected_runs"),
        when(varR > 0, (col("r").cast("double") - mu) / sqrt(varR))
          .as("z_runs"))
      .orderBy(col("event_type"))
  }

  val runsTestSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |med AS (SELECT event_type, x AS med FROM (
      |    SELECT event_type, x,
      |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, day)
      |        AS rn,
      |      COUNT(*) OVER (PARTITION BY event_type) AS nd
      |    FROM daily)
      |  WHERE rn = (nd + 1) // 2),
      |signed AS (
      |  SELECT d.event_type, d.day,
      |    CASE WHEN d.x > m.med THEN 1 ELSE -1 END AS s
      |  FROM daily d JOIN med m ON d.event_type = m.event_type
      |  WHERE d.x <> m.med),
      |runs AS (
      |  SELECT event_type, s,
      |    CASE WHEN LAG(s) OVER w IS NULL OR LAG(s) OVER w <> s
      |         THEN 1 ELSE 0 END AS run_start
      |  FROM signed WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |cells AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
      |    CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS nm,
      |    CAST(SUM(run_start) AS BIGINT) AS r
      |  FROM runs GROUP BY 1),
      |e AS (
      |  SELECT *, CAST(n AS DOUBLE) AS nd,
      |    CAST(2 * np * nm AS DOUBLE) AS twopn
      |  FROM cells)
      |SELECT event_type, n AS n_days_used, np AS n_above, nm AS n_below,
      |  r AS n_runs,
      |  twopn / nd + 1.0 AS expected_runs,
      |  CASE WHEN (twopn * CAST(2 * np * nm - n AS DOUBLE))
      |        / ((nd * nd) * CAST(n - 1 AS DOUBLE)) > 0 THEN
      |    (CAST(r AS DOUBLE) - (twopn / nd + 1.0))
      |      / sqrt((twopn * CAST(2 * np * nm - n AS DOUBLE))
      |        / ((nd * nd) * CAST(n - 1 AS DOUBLE))) END AS z_runs
      |FROM e ORDER BY event_type""".stripMargin

  /** Q254: HAAR MULTIRESOLUTION ENERGY — per event type, the
    * unnormalized Haar wavelet decomposition of the first 64 days'
    * daily-count series, reporting the detail ENERGY at each of the 6
    * dyadic scales (level 1 = day-to-day, level 6 = 32-day halves).
    * The burst-SCALE detector the family lacked: q124 flags WHEN a
    * burst happens and q218/q239 assume a known (weekly) period —
    * the Haar energy profile says at WHICH TIME SCALE the variance
    * lives, with no period assumption (a daily-noise type concentrates
    * in e1/e2, a regime shift in e5/e6).
    *
    * Exactness: unnormalized Haar (pair sum/difference, NO √2
    * normalization) keeps every coefficient an exact BIGINT; energies
    * are integer sums of squares (≤ 64·(2⁶·max_daily)² — tiny). The
    * zero-fill to a dense 64-day grid is part of the operator: a
    * missing day is a real zero of the counting process. The TYPE
    * AXIS is types with ≥ 1 event INSIDE the 64-day window (pinned
    * convention, both engines): a type whose events all arrive after
    * day0+63 has no analyzable series and emits no row — the oracle's
    * types CTE applies the identical window filter, so the convention
    * cannot drift even on a fixture whose types start late.
    *
    * Scale shape: one row-scale map-side-combined (type, day) count;
    * everything after lives on the |types|×64 bounded grid — the
    * 6-level pyramid runs IN-EXPRESSION per type over the collected
    * 64-array (the q213 pattern); the 1-row day-origin aggregate
    * rides a broadcast crossJoin (q66 rationale). */
  def haarEnergy(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
    val org = ev.agg(min(col("day")).as("day0"))
    val daily = ev.crossJoin(broadcast(org))
      .withColumn("off", col("day") - col("day0"))
      .filter(col("off") < 64)
      .groupBy(col("event_type"), col("off"))
      .agg(count(lit(1)).cast("long").as("c"))
    var df = daily.groupBy(col("event_type"))
      .agg(map_from_entries(collect_list(struct(col("off"), col("c")))).as("m"))
      .withColumn("a0", expr(
        "transform(sequence(0, 63), i -> coalesce(m[CAST(i AS BIGINT)], CAST(0 AS BIGINT)))"))
    (1 to 6).foreach { k =>
      val half = 64 >> k
      df = df
        .withColumn(s"d$k", expr(
          s"transform(sequence(1, $half), i -> element_at(a${k - 1}, 2*i - 1) - element_at(a${k - 1}, 2*i))"))
        .withColumn(s"a$k", expr(
          s"transform(sequence(1, $half), i -> element_at(a${k - 1}, 2*i - 1) + element_at(a${k - 1}, 2*i))"))
        .withColumn(s"e$k", expr(
          s"aggregate(d$k, CAST(0 AS BIGINT), (acc, v) -> acc + v * v)"))
    }
    df.select(col("event_type") +: lit(64L).as("n_days") +:
        expr("element_at(a6, 1)").as("total_sum") +:
        (1 to 6).map(k => col(s"e$k")): _*)
      .orderBy(col("event_type"))
  }

  val haarEnergySql: String = {
    val levels = (1 to 6).map { k =>
      s"""lv$k AS (SELECT event_type, idx // 2 AS idx,
         |    CAST(SUM(CASE WHEN idx % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d,
         |    CAST(SUM(s) AS BIGINT) AS s
         |  FROM lv${k - 1} GROUP BY 1, 2),
         |en$k AS (SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS e
         |  FROM lv$k GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day
       |  FROM events),
       |o AS (SELECT MIN(day) AS day0 FROM ev),
       |f AS (SELECT event_type, day - day0 AS off FROM ev, o
       |  WHERE day - day0 < 64),
       |-- type axis = types seen INSIDE the window (engine convention):
       |-- a late-starting type (all events >= day0+64) emits no row
       |types AS (SELECT DISTINCT event_type FROM f),
       |grid AS (SELECT t.event_type, g.i AS off
       |  FROM types t, generate_series(0, 63) g(i)),
       |lv0 AS (SELECT g.event_type, g.off AS idx,
       |    CAST(COUNT(f.off) AS BIGINT) AS s
       |  FROM grid g LEFT JOIN f ON f.event_type = g.event_type AND f.off = g.off
       |  GROUP BY 1, 2),
       |$levels
       |SELECT l.event_type, CAST(64 AS BIGINT) AS n_days, l.s AS total_sum,
       |  en1.e AS e1, en2.e AS e2, en3.e AS e3, en4.e AS e4, en5.e AS e5, en6.e AS e6
       |FROM lv6 l
       |JOIN en1 USING (event_type) JOIN en2 USING (event_type)
       |JOIN en3 USING (event_type) JOIN en4 USING (event_type)
       |JOIN en5 USING (event_type) JOIN en6 USING (event_type)
       |ORDER BY l.event_type""".stripMargin
  }

  /** Q255: CUPED VARIANCE REDUCTION (Deng et al., WSDM 2013) — the
    * experimentation-platform preprocessor: adjust each user's
    * post-period metric by their PRE-period behavior, y' = y −
    * θ(x − x̄) with θ = cov(x,y)/var(x), shrinking metric variance by
    * exactly the squared correlation ρ² and making every downstream
    * test (q211, q223) proportionally more sensitive at the same
    * sample size. Pre-period = the corpus' first 15 days, post = the
    * rest; users absent from a period carry an exact 0 (the standard
    * zero-fill — the covariate must exist for everyone).
    *
    * Exactness: per-user cent totals are exact; the six sufficient
    * sums accumulate in BIGINT/DECIMAL(38); θ, ρ² and the variance
    * cut are fixed dags on those exact values (the q135 OLS
    * discipline), with the integer witnesses published alongside so
    * the oracle verifies the sums, not just the dag. den = 0 (no
    * pre-period variance) or var_y = 0 degrade to NULL both engines.
    *
    * Scale shape: one row-scale (user, period) conditional rollup
    * (map-side combined), one user-keyed reduce to the six sums, one
    * 1-row output. The day-origin scalar rides a broadcast crossJoin
    * (q66 rationale). */
  def cupedAdjustment(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("decimal(18,0)")
          .cast("long").as("cents"))
    val org = ev.agg(min(col("day")).as("day0"))
    val perUser = ev.crossJoin(broadcast(org))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("day") - col("day0") < 15, col("cents")).otherwise(0L))
          .cast("long").as("x"),
        sum(when(col("day") - col("day0") >= 15, col("cents")).otherwise(0L))
          .cast("long").as("y"))
    def d38(c: Column) = c.cast("decimal(38,0)")
    val sums = perUser.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("bigint").as("sx"),
      sum(col("y")).cast("bigint").as("sy"),
      sum(d38(col("x")) * col("x")).cast("decimal(38,0)").as("sxx"),
      sum(d38(col("x")) * col("y")).cast("decimal(38,0)").as("sxy"),
      sum(d38(col("y")) * col("y")).cast("decimal(38,0)").as("syy"))
    val den = (d38(col("n")) * col("sxx") - d38(col("sx")) * col("sx"))
    val num = (d38(col("n")) * col("sxy") - d38(col("sx")) * col("sy"))
    val vy = (d38(col("n")) * col("syy") - d38(col("sy")) * col("sy"))
    sums
      .withColumn("den", den).withColumn("num", num).withColumn("vy", vy)
      .select(col("n").as("n_users"), col("sx"), col("sy"),
        // STRING witnesses: cent-squared sums exceed 2^53 and DECIMAL
        // outputs break the driver hash (ContractSpec) — exact digits
        col("sxx").cast("string").as("sxx"),
        col("sxy").cast("string").as("sxy"),
        col("syy").cast("string").as("syy"),
        when(col("den") > 0,
          col("num").cast("double") / col("den").cast("double")).as("theta"),
        when(col("den") > 0 && col("vy") > 0,
          (col("num").cast("double") * col("num").cast("double"))
            / (col("den").cast("double") * col("vy").cast("double")))
          .as("rho_sq"),
        when(col("den") > 0 && col("vy") > 0,
          col("vy").cast("double") / (col("n").cast("double") * col("n"))
            * (lit(1.0d) - (col("num").cast("double") * col("num").cast("double"))
              / (col("den").cast("double") * col("vy").cast("double"))))
          .as("var_adjusted"))
  }

  val cupedAdjustmentSql: String =
    """WITH ev AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |o AS (SELECT MIN(day) AS day0 FROM ev),
      |pu AS (SELECT user_id,
      |    CAST(SUM(CASE WHEN day - day0 < 15 THEN cents ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN day - day0 >= 15 THEN cents ELSE 0 END) AS BIGINT) AS y
      |  FROM ev, o GROUP BY 1),
      |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |  FROM pu),
      |t AS (SELECT *,
      |    n * sxx - CAST(sx AS HUGEINT) * sx AS den,
      |    n * sxy - CAST(sx AS HUGEINT) * sy AS num,
      |    n * syy - CAST(sy AS HUGEINT) * sy AS vy
      |  FROM s)
      |SELECT n AS n_users, sx, sy,
      |  CAST(sxx AS VARCHAR) AS sxx,
      |  CAST(sxy AS VARCHAR) AS sxy,
      |  CAST(syy AS VARCHAR) AS syy,
      |  -- num/den/vy are n·Σxy-class witnesses past 2^53: VARCHAR-route
      |  -- every exact-integer→DOUBLE conversion (the q286 finding —
      |  -- DuckDB 1.0.0's direct HUGEINT→DOUBLE is not correctly rounded)
      |  CASE WHEN den > 0 THEN CAST(CAST(num AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(den AS VARCHAR) AS DOUBLE) END AS theta,
      |  CASE WHEN den > 0 AND vy > 0 THEN
      |    (CAST(CAST(num AS VARCHAR) AS DOUBLE) * CAST(CAST(num AS VARCHAR) AS DOUBLE))
      |      / (CAST(CAST(den AS VARCHAR) AS DOUBLE)
      |         * CAST(CAST(vy AS VARCHAR) AS DOUBLE)) END AS rho_sq,
      |  CASE WHEN den > 0 AND vy > 0 THEN
      |    CAST(CAST(vy AS VARCHAR) AS DOUBLE) / (CAST(n AS DOUBLE) * n)
      |      * (1.0 - (CAST(CAST(num AS VARCHAR) AS DOUBLE)
      |                * CAST(CAST(num AS VARCHAR) AS DOUBLE))
      |        / (CAST(CAST(den AS VARCHAR) AS DOUBLE)
      |           * CAST(CAST(vy AS VARCHAR) AS DOUBLE))) END AS var_adjusted
      |FROM t""".stripMargin

  def queries: Map[String, Relational.Q] = Map(
    "q255_cuped_adjustment" -> (cupedAdjustment _),
    "q254_haar_energy" -> (haarEnergy _),
    "q243_runs_test" -> (runsTest _),
    "q239_seasonal_decomposition" -> (seasonalDecomposition _),
    "q236_log_rank" -> (logRankTest _),
    "q234_rolling_correlation" -> (rollingCorrelation _),
    "q227_kaplan_meier" -> (kaplanMeier _),
    "q221_segmented_regression" -> (segmentedRegression _),
    "q217_nearest_asof" -> (nearestAsof _),
    "q218_daily_acf" -> (dailyAcf _),
    "q214_cusum_changepoint" -> (cusumChangepoint _),
    "q209_activity_streaks" -> (activityStreaks _),
    "q210_interval_union" -> (intervalUnion _),
    "q197_session_flows" -> (sessionFlows _),
    "q193_grouped_mode" -> (groupedMode _),
    "q194_ohlc_bars" -> (ohlcBars _),
    "q181_rfm_segments" -> (rfmSegments _),
    "q177_peak_concurrency" -> (peakConcurrency _),
    "q178_minmax_scaling" -> (minmaxScaling _),
    "q174_linear_interpolation" -> (linearInterpolation _),
    "q167_rolling_active_users" -> (rollingActiveUsers _),
    "q168_percentile_bands" -> (dailyPercentileBands _),
    "q159_conversion_latency" -> (conversionLatency _),
    "q152_nelson_aalen" -> (nelsonAalen _),
    "q153_ewma_trend" -> (ewmaTrend _),
    "q154_session_overlap" -> (sessionOverlap _),
    "q127_event_trigrams" -> (eventTrigrams _),
    "q136_time_weighted_avg" -> (timeWeightedAvg _),
    "q138_attribution" -> (lastTouchAttribution _),
    "q128_approx_quantiles" -> (approxQuantiles _),
    "q132_seasonal_backtest" -> (seasonalBacktest _),
    "q134_skew_profile" -> (skewProfile _),
    "q124_burst_detection" -> (burstDetection _),
    "q123_retention_cohorts" -> (retentionCohorts _),
    "q98_scd2_build" -> (scd2Build _),
    "q144_pit_lookup" -> (pitLookup _),
    "q20_latest_per_user" -> (latestPerUser _),
    "q77_gap_fill" -> (gapFill _),
    "q78_range_frame" -> (rangeFrame _),
    "q83_user_sequences" -> (userSequences _),
    "q54_asof_join" -> (asofJoin _),
    "q55_band_join" -> (bandJoin _),
    "q21_tumbling_hour" -> (tumblingHour _),
    "q22_sessionize" -> (sessionize _),
    "q23_dedup_events" -> (dedupEvents _),
    "q57_sliding_window" -> (slidingWindow _),
    "q65_salted_hotkey_agg" -> (saltedHotKeyAgg _),
    "q67_funnel" -> (funnel _),
    "q70_session_window" -> (sessionWindow _),
  )

  def oracles: Map[String, String] = Map(
    "q243_runs_test" -> runsTestSql,
    "q239_seasonal_decomposition" -> seasonalDecompositionSql,
    "q254_haar_energy" -> haarEnergySql,
    "q255_cuped_adjustment" -> cupedAdjustmentSql,
    "q236_log_rank" -> logRankTestSql,
    "q234_rolling_correlation" -> rollingCorrelationSql,
    "q227_kaplan_meier" -> kaplanMeierSql,
    "q221_segmented_regression" -> segmentedRegressionSql,
    "q217_nearest_asof" -> nearestAsofSql,
    "q218_daily_acf" -> dailyAcfSql,
    "q214_cusum_changepoint" -> cusumChangepointSql,
    "q209_activity_streaks" -> activityStreaksSql,
    "q210_interval_union" -> intervalUnionSql,
    "q197_session_flows" -> sessionFlowsSql,
    "q193_grouped_mode" -> groupedModeSql,
    "q194_ohlc_bars" -> ohlcBarsSql,
    "q181_rfm_segments" -> rfmSegmentsSql,
    "q177_peak_concurrency" -> peakConcurrencySql,
    "q178_minmax_scaling" -> minmaxScalingSql,
    "q174_linear_interpolation" -> linearInterpolationSql,
    "q167_rolling_active_users" -> rollingActiveUsersSql,
    "q168_percentile_bands" -> dailyPercentileBandsSql,
    "q159_conversion_latency" -> conversionLatencySql,
    "q152_nelson_aalen" -> nelsonAalenSql,
    "q153_ewma_trend" -> ewmaTrendSql,
    "q154_session_overlap" -> sessionOverlapSql,
    "q124_burst_detection" -> burstDetectionSql,
    "q136_time_weighted_avg" -> timeWeightedAvgSql,
    "q138_attribution" -> lastTouchAttributionSql,
    "q127_event_trigrams" -> eventTrigramsSql,
    "q132_seasonal_backtest" -> seasonalBacktestSql,
    "q134_skew_profile" -> skewProfileSql,
    "q123_retention_cohorts" -> retentionCohortsSql,
    "q98_scd2_build" -> scd2BuildSql,
    "q144_pit_lookup" -> pitLookupSql,
    "q20_latest_per_user" -> latestPerUserSql,
    "q77_gap_fill" -> gapFillSql,
    "q78_range_frame" -> rangeFrameSql,
    "q83_user_sequences" -> userSequencesSql,
    "q54_asof_join" -> asofJoinSql,
    "q55_band_join" -> bandJoinSql,
    "q57_sliding_window" -> slidingWindowSql,
    "q21_tumbling_hour" -> tumblingHourSql,
    "q22_sessionize" -> sessionizeSql,
    "q23_dedup_events" -> dedupEventsSql,
    "q65_salted_hotkey_agg" -> saltedHotKeyAggSql,
    "q67_funnel" -> funnelSql,
    "q70_session_window" -> sessionWindowSql,
  )
}
