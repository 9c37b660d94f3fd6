package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.cnt

/** Window-function operators (SURVEY §2.5 north-star additions): ranking,
  * lag/lead analytics, running frames, and gap-based sessionization — the
  * standard event-stream toolkit.
  *
  * Scale shape: every window partitions on a real key (priority, user_id,
  * month), so work distributes across partitions; nothing windows over an
  * unpartitioned ORDER BY (which would serialize onto one reducer at
  * 100 TB). Sessionization is the classic two-window pass: a lag to flag
  * gaps, a running sum to number sessions — both over the same
  * (user_id, ts) sort, which Catalyst executes with a single shuffle+sort.
  */
object WindowQueries extends QueryModule {

  // ------------------------------------------------------------- win_topn
  /** Top-3 orders by price within each priority class (deterministic
    * tie-break on the key). */
  private def winTopn(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn").cast("int").as("rn"),
        col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy("o_orderpriority", "rn")
  }

  private val winTopnSql =
    """SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey,
      |  round(o_totalprice, 2) AS price
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
      |        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |      FROM orders) t
      |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin

  // -------------------------------------------------------------- win_lag
  /** Inter-event gap analytics per user (lag over (user_id, ts)), rolled
    * up by event type: how long after the previous user action does each
    * type of event arrive. */
  private def winLag(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_sec",
        (unix_micros(col("ts")) - unix_micros(col("prev_ts")))
          .cast("double") / 1e6)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        cnt(col("gap_sec").isNotNull).as("n_with_prev"),
        round(avg("gap_sec"), 3).as("avg_gap_sec"),
        round(max("gap_sec"), 3).as("max_gap_sec"))
      .orderBy("event_type")
  }

  private val winLagSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(count(gap_sec) AS BIGINT) AS n_with_prev,
      |  round(avg(gap_sec), 3) AS avg_gap_sec,
      |  round(max(gap_sec), 3) AS max_gap_sec
      |FROM (SELECT event_type,
      |        date_diff('microsecond',
      |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      |          ts) / 1e6 AS gap_sec
      |      FROM events) t
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------------------- win_frames
  /** Running + moving frames over the monthly revenue series, partitioned
    * by priority class: cumulative revenue (unbounded preceding) and a
    * 3-month moving average (2 preceding .. current). */
  private def winFrames(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val monthly = o.groupBy(
        col("o_orderpriority").as("prio"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(sum("o_totalprice").as("rev"))
    val wCum = Window.partitionBy("prio").orderBy("month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = Window.partitionBy("prio").orderBy("month")
      .rowsBetween(-2, Window.currentRow)
    monthly
      .withColumn("cum_rev", sum("rev").over(wCum))
      .withColumn("mov_avg", avg("rev").over(wMov))
      // checksum roll-up keeps the verified result small at any SF
      .groupBy("prio")
      .agg(
        count(lit(1)).as("n_months"),
        round(max("cum_rev"), 2).as("total_rev"),
        round(avg("mov_avg"), 2).as("avg_mov_avg"))
      .orderBy("prio")
  }

  private val winFramesSql =
    """SELECT prio, count(*) AS n_months,
      |  round(max(cum_rev), 2) AS total_rev,
      |  round(avg(mov_avg), 2) AS avg_mov_avg
      |FROM (
      |  SELECT prio, month,
      |    sum(rev) OVER (PARTITION BY prio ORDER BY month
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
      |    avg(rev) OVER (PARTITION BY prio ORDER BY month
      |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg
      |  FROM (SELECT o_orderpriority AS prio,
      |          CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |          sum(o_totalprice) AS rev
      |        FROM orders GROUP BY 1, 2) m) w
      |GROUP BY prio ORDER BY prio""".stripMargin

  // ---------------------------------------------------------- win_session
  private val SessionGapSec = 1800

  /** Gap-based sessionization (30-min idle closes a session): lag flags
    * session starts, a running sum numbers them — the canonical
    * two-window plan over one (user_id, ts) sort. */
  private def winSession(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val wOrd = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = ev
      .withColumn("gap_sec",
        (unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(wOrd))).cast("double") / 1e6)
      .withColumn("new_sess",
        when(col("gap_sec").isNull || col("gap_sec") > SessionGapSec, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(wRun))
      .groupBy("user_id", "sess_id")
      .agg(
        count(lit(1)).as("n_events"),
        ((unix_micros(max("ts")) - unix_micros(min("ts")))
          .cast("double") / 1e6).as("dur_sec"))
    sessions.agg(
      count(lit(1)).as("n_sessions"),
      countDistinct("user_id").as("n_users"),
      round(avg("n_events"), 6).as("avg_events_per_session"),
      max("n_events").as("max_session_events"),
      round(avg("dur_sec"), 3).as("avg_session_dur_sec"))
  }

  private val winSessionSql =
    s"""WITH gaps AS (
       |  SELECT user_id, ts, event_id,
       |    date_diff('microsecond',
       |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
       |      ts) / 1e6 AS gap_sec
       |  FROM events),
       |flagged AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN gap_sec IS NULL OR gap_sec > $SessionGapSec
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM gaps),
       |numbered AS (
       |  SELECT user_id, ts,
       |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
       |  FROM flagged),
       |sessions AS (
       |  SELECT user_id, sess_id, count(*) AS n_events,
       |    date_diff('microsecond', min(ts), max(ts)) / 1e6 AS dur_sec
       |  FROM numbered GROUP BY 1, 2)
       |SELECT count(*) AS n_sessions,
       |  count(DISTINCT user_id) AS n_users,
       |  round(avg(n_events), 6) AS avg_events_per_session,
       |  max(n_events) AS max_session_events,
       |  round(avg(dur_sec), 3) AS avg_session_dur_sec
       |FROM sessions""".stripMargin

  // --------------------------------------------------------- win_rankdist
  /** The rank-DISTRIBUTION window family (percent_rank / cume_dist /
    * ntile) the other window queries don't exercise: per order-priority
    * class, summarize the price distribution's quartile structure.
    * Windows partition on the priority key with a deterministic
    * (price, key) order, so both engines rank identical sequences;
    * output is per-(priority, quartile) counts plus the rounded
    * average percent_rank/cume_dist — aggregated AFTER ranking so the
    * comparison covers the rank values themselves. */
  private def winRankdist(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.select(col("o_orderpriority"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).as("quartile"))
      .groupBy("o_orderpriority", "quartile")
      .agg(
        count(lit(1)).as("n"),
        round(avg("pr"), 6).as("avg_percent_rank"),
        round(avg("cd"), 6).as("avg_cume_dist"))
      .orderBy("o_orderpriority", "quartile")
  }

  private val winRankdistSql =
    """SELECT o_orderpriority, quartile, count(*) AS n,
      |  round(avg(pr), 6) AS avg_percent_rank,
      |  round(avg(cd), 6) AS avg_cume_dist
      |FROM (
      |  SELECT o_orderpriority,
      |    percent_rank() OVER w AS pr,
      |    cume_dist() OVER w AS cd,
      |    ntile(4) OVER w AS quartile
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority
      |               ORDER BY o_totalprice, o_orderkey)) t
      |GROUP BY 1, 2 ORDER BY o_orderpriority, quartile""".stripMargin

  // ----------------------------------------------------------- ts_anomaly
  private val AnomalyBucketSecs = 21600L // 6 hours
  private val AnomalyLookback = 4
  private val AnomalyZ = 2.0
  // the exact integer flag compare embeds Z² as a LONG on both engines
  // ((AnomalyZ * AnomalyZ).toLong) — a non-integral Z² would silently
  // truncate in BOTH twins, a drift the oracle gate can never surface,
  // so reject it at class-load instead
  require(AnomalyZ * AnomalyZ == (AnomalyZ * AnomalyZ).toLong.toDouble,
    s"AnomalyZ² must be integral for the exact flag compare, got Z=$AnomalyZ")

  /** Time-series anomaly scan — the data-quality monitor a standing
    * ingestion pipeline runs over its own arrival counts: bucket events
    * into 6-hour cells per type, score each cell against the rolling
    * mean/σ of the previous [[AnomalyLookback]] OBSERVED cells (a frame
    * ending before the current row, so a spike never masks itself), and
    * flag |z| > [[AnomalyZ]]. Cells without a full lookback or with σ=0
    * are unscored, not silently z=0.
    *
    * Scale shape: the corpus-sized work is one (type, bucket) partial-agg
    * shuffle; the rolling window runs over the BUCKET table (types ×
    * buckets rows, bounded by calendar time, not event volume) partitioned
    * on event_type.
    *
    * Cross-engine exactness: engine-level stddev_samp/avg use different
    * float summation orders, so a z at a rounding or threshold boundary
    * could flip n_flagged between engines. Instead both sides build z
    * from EXACT INTEGER window sums (S=Σn, SS=Σn², n a count): every
    * double then derives from identical integers through identical IEEE
    * ops (one divide, one sqrt), so round(z,4) is bit-equal; and the
    * FLAG decision never touches floats at all —
    * |z| > Z  ⟺  (k·n−S)²·(k−1) > Z²·k·(k·SS−S²), compared in
    * decimal(38,0) (hugeint on the oracle side) so it cannot overflow
    * at 100 TB bucket counts. */
  private def tsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val k = AnomalyLookback
    val buckets = ev
      .select(col("event_type"),
        // `div` = exact long division (Column `/` would round through double)
        expr(s"unix_micros(ts) div ${AnomalyBucketSecs * 1000000L}")
          .as("bkt"))
      .groupBy("event_type", "bkt")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("bkt")
      .rowsBetween(-AnomalyLookback, -1)
    val dec = "decimal(38,0)"
    val scored = buckets
      .withColumn("cw", count(lit(1)).over(w))
      // decimal(38,0) sums: Σn² in long overflows once bucket counts
      // pass ~3e9 (and Spark 4's ANSI mode makes that a runtime error,
      // not a wrap) — decimal keeps the algebra exact at any scale
      .withColumn("s1", sum(col("n").cast(dec)).over(w))
      .withColumn("s2", sum(col("n").cast(dec) * col("n")).over(w))
      .withColumn("varnum", col("s2") * k - col("s1") * col("s1"))
      .withColumn("ok", col("cw") === k && col("varnum") > 0)
      .withColumn("znum", col("n").cast(dec) * k - col("s1"))
      .withColumn("z",
        when(col("ok"),
          round(col("znum").cast("double") / k /
            sqrt(col("varnum").cast("double") / (k * (k - 1))), 4)))
      .withColumn("flag", col("ok") &&
        col("znum") * col("znum") * (k - 1) >
          lit((AnomalyZ * AnomalyZ).toLong) * k * col("varnum"))
    scored.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_buckets"),
        cnt(col("z").isNotNull).as("n_scored"),
        cnt(col("flag")).as("n_flagged"),
        round(max(abs(col("z"))), 4).as("max_abs_z"))
      .orderBy("event_type")
  }

  private val tsAnomalySql = {
    val k = AnomalyLookback
    val z2 = (AnomalyZ * AnomalyZ).toLong
    // identical integer-sum algebra AND identical IEEE op order as the
    // Spark side (see tsAnomaly's exactness note): hugeint sums, one
    // divide-by-k, one sqrt; flag compared in exact hugeint
    s"""WITH buckets AS (
       |  SELECT event_type,
       |    epoch_us(ts) // ${AnomalyBucketSecs * 1000000L} AS bkt,
       |    CAST(count(*) AS HUGEINT) AS n
       |  FROM events GROUP BY 1, 2),
       |sums AS (
       |  SELECT event_type, n,
       |    count(*) OVER w AS cw,
       |    sum(n) OVER w AS s1,
       |    sum(n * n) OVER w AS s2
       |  FROM buckets
       |  WINDOW w AS (PARTITION BY event_type ORDER BY bkt
       |               ROWS BETWEEN $k PRECEDING AND 1 PRECEDING)),
       |scored AS (
       |  SELECT event_type,
       |    cw = $k AND s2 * $k - s1 * s1 > 0 AS ok,
       |    n * $k - s1 AS znum,
       |    s2 * $k - s1 * s1 AS varnum
       |  FROM sums),
       |z AS (
       |  SELECT event_type, ok,
       |    CASE WHEN ok THEN
       |      round(CAST(znum AS DOUBLE) / $k /
       |        sqrt(CAST(varnum AS DOUBLE) / ${k * (k - 1)}), 4)
       |    END AS z,
       |    ok AND znum * znum * ${k - 1} > $z2 * $k * varnum AS flag
       |  FROM scored)
       |SELECT event_type,
       |  count(*) AS n_buckets,
       |  count(*) FILTER (z IS NOT NULL) AS n_scored,
       |  count(*) FILTER (flag) AS n_flagged,
       |  round(max(abs(z)), 4) AS max_abs_z
       |FROM z
       |GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  // -------------------------------------------------------- funnel_stages
  /** Ordered conversion funnel (view → click → purchase): a user reaches
    * stage k at the FIRST qualifying event at-or-after their stage-k−1
    * time — the standard product-analytics sequence query, which a naive
    * per-stage min(ts) gets wrong (a click before the first view must
    * not count). Expressed as three chained conditional window minima
    * over ONE (user_id) partition: Catalyst plans a single shuffle+sort
    * and stacks the window projections on it, so the corpus-sized work
    * is one exchange at any scale. Census: users reaching each stage +
    * conversion from the previous. */
  private val FunnelStages = Seq("view", "click", "purchase")

  private def funnelStages(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val w = Window.partitionBy("user_id")
    val staged = ev
      .withColumn("t1",
        min(when(col("event_type") === FunnelStages(0), col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === FunnelStages(1)
          && col("ts") >= col("t1"), col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === FunnelStages(2)
          && col("ts") >= col("t2"), col("ts"))).over(w))
    val users = staged.groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
    val counts = users.agg(
      count(lit(1)).as("n_users"),
      cnt(col("t1").isNotNull).as("s1"),
      cnt(col("t2").isNotNull).as("s2"),
      cnt(col("t3").isNotNull).as("s3"))
    import s.implicits._
    val stages = Seq((1, FunnelStages(0)), (2, FunnelStages(1)),
      (3, FunnelStages(2))).toDF("stage", "event_type")
    counts.crossJoin(stages)
      .select(col("stage"), col("event_type"),
        when(col("stage") === 1, col("s1"))
          .when(col("stage") === 2, col("s2"))
          .otherwise(col("s3")).as("n_reached"),
        round(
          when(col("stage") === 1, try_divide(col("s1"), col("n_users")))
            .when(col("stage") === 2, try_divide(col("s2"), col("s1")))
            .otherwise(try_divide(col("s3"), col("s2"))), 6)
          .as("conv_from_prev"))
      .orderBy("stage")
  }

  private val funnelStagesSql =
    s"""WITH staged AS (
       |  SELECT user_id, event_type, ts,
       |    min(CASE WHEN event_type = '${FunnelStages(0)}' THEN ts END)
       |      OVER (PARTITION BY user_id) AS t1
       |  FROM events),
       |st2 AS (
       |  SELECT *,
       |    min(CASE WHEN event_type = '${FunnelStages(1)}' AND ts >= t1
       |             THEN ts END) OVER (PARTITION BY user_id) AS t2
       |  FROM staged),
       |st3 AS (
       |  SELECT *,
       |    min(CASE WHEN event_type = '${FunnelStages(2)}' AND ts >= t2
       |             THEN ts END) OVER (PARTITION BY user_id) AS t3
       |  FROM st2),
       |users AS (
       |  SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
       |  FROM st3 GROUP BY user_id),
       |c AS (
       |  SELECT count(*) AS n_users,
       |    count(t1) AS s1, count(t2) AS s2, count(t3) AS s3
       |  FROM users)
       |SELECT stage, event_type,
       |  CASE stage WHEN 1 THEN s1 WHEN 2 THEN s2 ELSE s3 END AS n_reached,
       |  round(CASE stage
       |    WHEN 1 THEN s1 * 1.0 / n_users
       |    WHEN 2 THEN s2 * 1.0 / s1
       |    ELSE s3 * 1.0 / s2 END, 6) AS conv_from_prev
       |FROM c CROSS JOIN (VALUES (1, '${FunnelStages(0)}'),
       |  (2, '${FunnelStages(1)}'), (3, '${FunnelStages(2)}'))
       |  s(stage, event_type)
       |ORDER BY stage""".stripMargin

  // ------------------------------------------------------ latest_snapshot
  /** CDC compaction — "latest record per key": collapse the event log to
    * each user's most recent event via max_by over a deterministic
    * (ts, event_id) order, then census the snapshot by event type. This
    * is log-compaction / changelog-materialization: ONE partial-agg'd
    * shuffle keyed on user_id (max_by combines map-side), never a sort
    * of the full log — the shape that replaces the row_number()-
    * over-everything anti-pattern at 100 TB. */
  private def latestSnapshot(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val latest = ev.groupBy("user_id")
      .agg(max_by(
        struct(col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id"), col("last.event_type").as("event_type"),
        col("last.value").as("value"))
    latest.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_users"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type")
  }

  private val latestSnapshotSql =
    """WITH latest AS (
      |  SELECT user_id, event_type, value FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events) r
      |  WHERE rn = 1)
      |SELECT event_type, count(*) AS n_users,
      |  round(sum(value), 2) AS sum_value
      |FROM latest GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------- ts_resample
  /** Time-series resampling to hourly OHLC bars — the downsample every
    * metrics/market pipeline runs before charting or modeling: per
    * (event_type, hour) the opening and closing value (first/last by
    * the deterministic (ts, event_id) order), the high/low, the event
    * count and the volume sum. Output is calendar-bounded (hours ×
    * types), independent of corpus size.
    *
    * Scale shape: ONE partial-agg'd shuffle on the bucket key — open/
    * close are min_by/max_by over the in-bucket order (combine
    * map-side), never a sort or window over the raw series (the
    * row_number-per-bucket anti-pattern serializes each bucket at
    * 100 TB). Values pass through untouched (no float summation except
    * the 2 dp volume sum). */
  private def tsResample(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val ord = struct(col("ts"), col("event_id"))
    ev
      .withColumn("hour", expr("unix_micros(ts) div 3600000000"))
      .groupBy("event_type", "hour")
      .agg(
        min_by(col("value"), ord).as("open"),
        max_by(col("value"), ord).as("close"),
        max("value").as("high"),
        min("value").as("low"),
        count(lit(1)).as("n"),
        round(sum("value"), 2).as("volume"))
      .orderBy("event_type", "hour")
  }

  private val tsResampleSql =
    """SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
      |  first(value ORDER BY ts, event_id) AS open,
      |  last(value ORDER BY ts, event_id) AS close,
      |  max(value) AS high, min(value) AS low,
      |  count(*) AS n, round(sum(value), 2) AS volume
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------------------- scd2_build
  /** SCD type-2 dimension build — turn the event log into validity
    * intervals: for each user the tracked attribute (event_type) opens a
    * new interval whenever it CHANGES (lag-compare), and each interval
    * closes when the next change arrives (lead over the change rows);
    * the last interval per user stays open. This is the standard
    * slowly-changing-dimension materialization a warehouse runs over a
    * CDC feed, complementing `cdc_merge` (apply a batch) and
    * `latest_snapshot` (keep only the current row) with the full
    * validity-history form (Kimball SCD2).
    *
    * Census: per attribute value, intervals opened, still-open count,
    * and the mean closed-interval duration — computed from an EXACT
    * integer millisecond sum (float summation order can drift the last
    * ulp between engines; a long sum cannot).
    *
    * Scale shape: ONE hash exchange on user_id; the lag window, the
    * post-filter lead window, and the change-row filter all share the
    * same (user_id; ts, event_id) sort, so Catalyst plans a single
    * shuffle+sort for the whole history pass; the census agg partials
    * map-side onto the bounded attribute domain. */
  private def scd2Build(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val changes = Tables.load(s, dir, "events")
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
    val intervals = changes
      .withColumn("end_ts", lead(col("ts"), 1).over(w))
      .select(col("event_type"),
        (unix_millis(col("end_ts")) - unix_millis(col("ts"))).as("dur_ms"))
    intervals.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(when(col("dur_ms").isNull, 1L).otherwise(0L)).as("n_open"),
        round(sum("dur_ms") / (lit(3600000.0) *
          cnt(col("dur_ms").isNotNull)), 4).as("avg_closed_hours"))
      .orderBy("event_type")
  }

  private val scd2BuildSql =
    """WITH changes AS (
      |  SELECT * FROM (
      |    SELECT user_id, ts, event_id, event_type,
      |      lag(event_type) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS prev_type
      |    FROM events) l
      |  WHERE prev_type IS NULL OR prev_type <> event_type),
      |intervals AS (
      |  SELECT event_type,
      |    epoch_ms(lead(ts) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id)) - epoch_ms(ts) AS dur_ms
      |  FROM changes)
      |SELECT event_type, count(*) AS n_intervals,
      |  CAST(sum(CASE WHEN dur_ms IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_open,
      |  round(sum(dur_ms) / (3600000.0 * count(dur_ms)), 4)
      |    AS avg_closed_hours
      |FROM intervals GROUP BY event_type ORDER BY event_type""".stripMargin

  override val qs: Seq[Q] = Seq(
    Q("ts_resample", tsResample, Some(tsResampleSql)),
    Q("scd2_build", scd2Build, Some(scd2BuildSql)),
    Q("win_rankdist", winRankdist, Some(winRankdistSql)),
    Q("win_topn", winTopn, Some(winTopnSql)),
    Q("win_lag", winLag, Some(winLagSql)),
    Q("win_frames", winFrames, Some(winFramesSql)),
    Q("win_session", winSession, Some(winSessionSql)),
    Q("ts_anomaly", tsAnomaly, Some(tsAnomalySql)),
    Q("funnel_stages", funnelStages, Some(funnelStagesSql)),
    Q("latest_snapshot", latestSnapshot, Some(latestSnapshotSql)))
}
