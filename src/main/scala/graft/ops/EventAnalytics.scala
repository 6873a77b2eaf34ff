package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-analytics operators over (user, ts, event_type) streams: ordered
  * conversion funnels and cohort retention — the query shapes an
  * events-table owner runs daily at warehouse scale.
  *
  * Scale shape: every stage is a filtered aggregate or join keyed on the
  * user — no windows over the full event stream, no per-user collect, no
  * driver-side loops; the whole funnel is ONE lazy plan whose per-stage
  * state is a fixed-width row per user. */
object EventAnalytics {

  /** Output-column label for a quantile rank — shared by the exact and
    * sketch rolling-quantile variants (and the stored
    * [[graft.serve.RollingQuantileService]] tier) so all validate
    * identically. */
  private[graft] def qLabel(p: Double): String =
    "p" + math.round(p * 100).toInt

  /** Labels round to the percent ("p50", "p95"), so ranks closer than
    * 0.005 — or 0.995 vs 1.0 — would collide into DUPLICATE column
    * names and hand downstream an ambiguous-column frame that fails
    * only on first reference. Validate at call time, loudly. */
  private[graft] def requireDistinctLabels(ps: Seq[Double]): Unit = {
    val labels = ps.map(qLabel)
    require(labels.distinct.size == labels.size,
      "quantile ranks collide at percent resolution — labels " +
        s"${labels.mkString(", ")} from ranks ${ps.mkString(", ")} are " +
        "not distinct; space ranks at least 0.01 apart (column names " +
        "round to whole percents)")
  }

  /** Volume-anomaly detection: hourly event counts per type, flagging
    * hours whose count exceeds that type's mean by `sigma` standard
    * deviations — the pager-rule shape (traffic spike, error burst) run
    * as one declarative plan. Returns the anomalous
    * (event_type, window_start, n_events) rows.
    *
    * Scale shape: the raw stream collapses to (type, hour) counts in one
    * map-side-partial aggregate — from then on everything is
    * |types| × |hours| rows; per-type stats are a second tiny aggregate
    * broadcast back onto the counts. A type with a single active hour has
    * NULL sample-stddev and flags nothing (no baseline, no alert). */
  def hourlyAnomalies(events: DataFrame, typeCol: String, tsCol: String,
                      sigma: Double = 2.0): DataFrame = {
    require(sigma > 0, s"sigma must be positive, got $sigma")
    val counts = events
      .groupBy(col(typeCol).as("event_type"),
        date_trunc("hour", col(tsCol)).as("window_start"))
      .agg(count(lit(1)).as("n_events"))
    val stats = counts.groupBy("event_type")
      .agg(avg(col("n_events")).as("__mu"), stddev_samp(col("n_events")).as("__sd"))
    counts.join(broadcast(stats), "event_type")
      .filter(col("n_events") > col("__mu") + lit(sigma) * col("__sd"))
      .select(col("event_type"), col("window_start"), col("n_events"))
  }

  /** DAU/MAU engagement: distinct active users per calendar day and per
    * calendar month, with stickiness = dau/mau per day — the standard
    * product-health metric. Calendar months (not trailing-30d windows)
    * keep the distinct-count a plain aggregate; a trailing window needs a
    * sketch (HLL union per day) at scale, which is a different
    * fidelity/cost contract.
    *
    * Scale shape: two exact distinct aggregates (each a two-phase
    * hash-aggregate, map-side partial on (bucket, user)), joined on the
    * month — the month side is |months| rows, broadcast. */
  /** TRAILING rolling-window hourly metrics per event type — the
    * operational "last 24 h volume" series every monitoring pipeline
    * draws: per (type, hour) on the ZERO-FILLED hour spine, the count,
    * the trailing `window`-hour sum, the number of periods actually in
    * frame (< `window` during warm-up at the series head — reported,
    * not hidden), and their ratio at ROUND 6. Returns
    * (hour_us, event_type, n, rolling_n, n_periods, rolling_avg).
    *
    * Scale shape: raw events COLLAPSE to (type, hour) counts first —
    * the window runs over the spine (hours × types rows), never raw
    * events; zero-filling makes ROWS frames genuinely temporal (a
    * missing hour would otherwise silently stretch the window's time
    * span). Per-type partitions are hour-count-sized, so the sort
    * inside the window is bounded and partition-parallel. Integer sums
    * ⇒ hash-portable; the avg divides two integers as doubles with a
    * fixed literal shape. */
  def rollingHourlyCounts(events: DataFrame, typeCol: String,
                          tsCol: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val counts = events
      .groupBy(date_trunc("hour", col(tsCol)).as("h"),
        col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n"))
    val bounds = events.agg(date_trunc("hour", min(col(tsCol))).as("lo"),
      date_trunc("hour", max(col(tsCol))).as("hi"))
    val types = events.select(col(typeCol).as("event_type")).distinct()
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("h"))
      .crossJoin(types)
    val filled = spine.join(counts, Seq("h", "event_type"), "left")
      .select(col("h"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("h")
      .rowsBetween(-(window - 1).toLong, 0L)
    filled.select(unix_micros(col("h")).as("hour_us"), col("event_type"),
      col("n"),
      sum(col("n")).over(w).as("rolling_n"),
      count(lit(1)).over(w).cast(org.apache.spark.sql.types.LongType)
        .as("n_periods"))
      .withColumn("rolling_avg",
        round(expr("CAST(rolling_n AS DOUBLE) / CAST(n_periods AS DOUBLE)"),
          6))
  }

  /** Trailing `window`-hour EXACT quantiles of a numeric column per
    * event type over the zero-filled hour spine — the observability
    * staple ("rolling p95 latency per endpoint") the count-based
    * [[rollingHourlyCounts]] cannot answer. Quantiles are not mergeable
    * exactly, so the trailing window genuinely needs every value in its
    * range; the scale-honest exact plan REPLICATES each value to the ≤
    * `window` target hours it participates in (a bounded `window`×
    * amplification that shuffles ONCE into (target_hour, type) groups —
    * versus a naive windowed-percentile over raw rows, which re-sorts
    * every window per row) and takes one exact interpolated
    * `percentile` per group. Interpolation is the quantile_cont
    * definition both engines share bit-for-bit at ROUND 6 (the
    * pr4_quantiles precedent) ⇒ hash-green. Hours with no samples in
    * range carry NULL quantiles and n_samples = 0 — absence of data is
    * the signal, not a zero.
    *
    * At 100 TB the `window`× replication of raw values is the exact
    * form's honest cost; the production path is
    * [[rollingHourlyQuantilesSketch]], which replicates per-hour KLL
    * SKETCHES (constant-size) instead and merges — the entire reason
    * the mergeable-sketch family exists. */
  def rollingHourlyQuantiles(events: DataFrame, typeCol: String,
                             tsCol: String, valueCol: String, window: Int,
                             ps: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile ranks must be in [0, 1], got $ps")
    requireDistinctLabels(ps)
    val vals = events
      .select(date_trunc("hour", col(tsCol)).as("h"),
        col(typeCol).as("event_type"), col(valueCol).as("v"))
      .filter(col("v").isNotNull)
    val bounds = events.agg(date_trunc("hour", min(col(tsCol))).as("lo"),
      date_trunc("hour", max(col(tsCol))).as("hi"))
    val rep = vals.crossJoin(broadcast(bounds))
      .select(explode(sequence(col("h"),
          least(col("h") + expr(s"INTERVAL ${window - 1} HOURS"), col("hi")),
          expr("INTERVAL 1 HOUR"))).as("h"),
        col("event_type"), col("v"))
    val pArr = ps.map(p => s"${p}D").mkString(", ")
    val agg = rep.groupBy("h", "event_type")
      .agg(count(lit(1)).as("n_samples"),
        expr(s"percentile(v, array($pArr))").as("__p"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("h"))
      .crossJoin(events.select(col(typeCol).as("event_type")).distinct())
    val qCols = ps.zipWithIndex.map { case (p, i) =>
      round(element_at(col("__p"), i + 1), 6).as(qLabel(p))
    }
    spine.join(agg, Seq("h", "event_type"), "left")
      .select(Seq(unix_micros(col("h")).as("hour_us"), col("event_type"),
        coalesce(col("n_samples"), lit(0L)).as("n_samples")) ++ qCols: _*)
  }

  /** The KLL-sketch scale path of [[rollingHourlyQuantiles]]: one
    * constant-size KLL sketch per (hour, type) — the only pass over the
    * raw values — then the trailing window merges ≤ `window` SKETCHES
    * per output row ([[graft.functions.KllAgg]], Karnin-Lang-Liberty's
    * mergeability being the entire point), so the rolling stage moves
    * sketch-sized rows, not values: the 100 TB shape. Quantile answers
    * are rank-error approximations with engine-local randomness
    * (rows-only by the KLL contract; [[rollingHourlyQuantiles]] is the
    * exact twin, and the spec pins sketch ≈ exact within the k = 200
    * rank-error envelope). */
  def rollingHourlyQuantilesSketch(events: DataFrame, typeCol: String,
                                   tsCol: String, valueCol: String,
                                   window: Int,
                                   ps: Seq[Double] = Seq(0.5, 0.95),
                                   k: Int = 200): DataFrame =
    trailingSketchWindow(
      hourlySketches(events, typeCol, tsCol, valueCol, k), window, ps, k)

  /** One KLL sketch row per (hour, type) — the shared derivation of
    * [[rollingHourlyQuantilesSketch]], the stored
    * [[graft.serve.RollingQuantileService]] layout, and every streamed
    * delta: (h, event_type, n, sk), where n counts NON-NULL values and
    * the sketch skips nulls, but the GROUP rows themselves cover every
    * event — a type or hour whose values are all null still lands in
    * the frame (n = 0, empty sketch), so spines derived from this
    * frame match spines derived from the raw events (the stored tier
    * and the in-query face answer the same row set by construction).
    * ONE pass over the events, map-side partial sketch buffers,
    * constant size per group out. `kll_*` come from GraftExtensions
    * (spark.sql.extensions) — the session contract every graft entry
    * point already sets. */
  def hourlySketches(events: DataFrame, typeCol: String, tsCol: String,
                     valueCol: String, k: Int): DataFrame =
    events
      .select(date_trunc("hour", col(tsCol)).as("h"),
        col(typeCol).as("event_type"), col(valueCol).as("v"))
      .groupBy("h", "event_type")
      .agg(count(col("v")).as("n"),
        expr(s"kll_sketch_agg(v, $k)").as("sk"))

  /** The trailing-window merge stage over an hourly-sketch frame
    * ((h, event_type, n, sk) — [[hourlySketches]]' shape): replicate
    * each sketch row to its ≤ `window` target hours (constant-size
    * payloads, hours×types rows), merge per (hour, type), join onto
    * the zero-filled spine. ONE implementation shared by the in-query
    * face and the stored tier's [[graft.serve.RollingQuantileService
    * .trailingSeries]], so the two cannot drift. */
  private[graft] def trailingSketchWindow(hourly: DataFrame, window: Int,
                                          ps: Seq[Double],
                                          k: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile ranks must be in [0, 1], got $ps")
    requireDistinctLabels(ps)
    val bounds = hourly.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val rep = hourly.crossJoin(broadcast(bounds))
      .select(explode(sequence(col("h"),
          least(col("h") + expr(s"INTERVAL ${window - 1} HOURS"), col("hi")),
          expr("INTERVAL 1 HOUR"))).as("h"),
        col("event_type"), col("n"), col("sk"))
    val merged = rep.groupBy("h", "event_type")
      .agg(sum(col("n")).as("n_samples"),
        expr(s"kll_merge_agg(sk, $k)").as("__m"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("h"))
      .crossJoin(hourly.select("event_type").distinct())
    val qCols = ps.map { p =>
      round(expr(s"kll_quantile(__m, ${p}D)"), 6).as(qLabel(p))
    }
    spine.join(merged, Seq("h", "event_type"), "left")
      .select(Seq(unix_micros(col("h")).as("hour_us"), col("event_type"),
        coalesce(col("n_samples"), lit(0L)).as("n_samples")) ++ qCols: _*)
  }

  def stickiness(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val dau = events
      .groupBy(date_trunc("day", col(tsCol)).as("day"))
      .agg(count_distinct(col(userCol)).as("dau"))
    val mau = events
      .groupBy(date_trunc("month", col(tsCol)).as("month"))
      .agg(count_distinct(col(userCol)).as("mau"))
    dau.withColumn("month", date_trunc("month", col("day")))
      .join(broadcast(mau), "month")
      .select(col("day"), col("dau"), col("mau"),
        round(col("dau").cast(org.apache.spark.sql.types.DoubleType) / col("mau"), 6)
          .as("stickiness"))
  }

  /** Ordered funnel with a per-step conversion window: a user reaches step
    * k if they performed `steps(k)` at-or-after their step-(k−1) conversion
    * time and within `windowExpr` of it (a step REPEATED consecutively
    * requires a strictly later event — one purchase cannot satisfy
    * "purchase, purchase"); the user's step-k time is the EARLIEST such
    * qualifying occurrence (step 1: the user's earliest `steps(0)` event,
    * unconditionally). Returns one row per step:
    * (stage, step, n_users), monotonically non-increasing.
    *
    * Plan shape: step k is a left join of the per-user state (one row per
    * surviving user) against the type-`steps(k)` slice of the events,
    * re-aggregated to one row per user — k user-keyed shuffles of
    * type-filtered slices; the event stream itself is never windowed or
    * replicated. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             windowExpr: Column): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
      col(typeCol).as("et"))
    var cur = ev.filter(col("et") === steps.head)
      .groupBy("u").agg(min(col("ts")).as("t1"))
    steps.indices.drop(1).foreach { i =>
      val prev = s"t$i"
      // qualifying step-(i+1) event: within [t_i, t_i + window]; null
      // t_i propagates (condition is null → q null → t_{i+1} null)
      val stepEv = ev.filter(col("et") === steps(i))
        .select(col("u"), col("ts").as("__ts2"))
      val carry = (1 to i).map(j => min(col(s"t$j")).as(s"t$j")) // constant per u
      // a REPEATED step must be a strictly later event: with >= the very
      // occurrence that established t_i would also qualify for step i+1,
      // letting one purchase satisfy "purchase, purchase". Distinct
      // consecutive steps keep the at-or-after semantics (a different
      // event type at the same timestamp legitimately converts).
      val lower =
        if (steps(i) == steps(i - 1)) col("__ts2") > col(prev)
        else col("__ts2") >= col(prev)
      cur = cur.join(stepEv, Seq("u"), "left")
        .withColumn("__q", when(
          lower && col("__ts2") <= col(prev) + windowExpr,
          col("__ts2")))
        .groupBy("u")
        .agg(carry.head, carry.tail :+ min(col("__q")).as(s"t${i + 1}"): _*)
    }
    val stageStructs = steps.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).as("stage"), lit(st).as("step"),
        col(s"t${i + 1}").isNotNull.as("r"))
    }
    val counts = cur.select(explode(array(stageStructs: _*)).as("s"))
      .groupBy(col("s.stage").as("stage"), col("s.step").as("step"))
      .agg(count(when(col("s.r"), 1)).as("n_users"))
    // "one row per step" holds even when NO user performs the first step
    // (empty day, typo'd event name): join the counts back onto the
    // static step list so missing stages surface as explicit zeros, not
    // an empty frame indistinguishable from a query error
    val spark = events.sparkSession
    import spark.implicits._
    val allSteps = steps.zipWithIndex
      .map { case (st, i) => (i + 1, st) }.toDF("stage", "step")
    allSteps.join(counts, Seq("stage", "step"), "left")
      .select(col("stage"), col("step"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /** Per-user INTER-EVENT GAP profile — the cadence signal behind bot
    * and scripted-traffic detection: humans produce ragged gap
    * distributions, schedulers produce tight ones, and replayed logs
    * produce zero gaps. Per user with ≥ 2 events: event count, the
    * minimum gap, and the exact median gap (microseconds).
    *
    * Scale shape: the lag window is keyed BY USER (partition-local sort
    * of each user's own events — never a global window), and the gap
    * rows collapse immediately into a per-user aggregate with map-side
    * partials. Ordering ties on equal timestamps break by the event id,
    * so the gaps — and the report — are deterministic. Returns
    * (user_id, n_events, min_gap_us, med_gap_us). */
  def interEventGaps(events: DataFrame, userCol: String, tsCol: String,
                     idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("__t"), col("__eid"))
    events.select(col(userCol).as("user_id"),
        unix_micros(col(tsCol)).as("__t"), col(idCol).as("__eid"))
      .withColumn("__prev", lag(col("__t"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("__gap", col("__t") - col("__prev"))
      .groupBy("user_id").agg(
        (count(lit(1)) + 1).as("n_events"),
        min(col("__gap")).as("min_gap_us"),
        round(expr("percentile(__gap, 0.5D)"), 6).as("med_gap_us"))
  }

  /** Per-user activity segmentation — the RFM-style report behind
    * "power user / regular / occasional / dormant" splits: per user,
    * total events (frequency), distinct active days (consistency), the
    * last event's epoch-micros (recency), and the frequency QUARTILE.
    *
    * Scale shape: the per-user aggregate collapses the event stream
    * first (map-side partials on the user key — the only corpus-sized
    * shuffle); the quartile assignment then BROADCASTS three exact
    * percentile cutpoints back and buckets map-side. The tempting
    * alternative — `ntile(4)` over a global window — funnels EVERY user
    * through one partition (Spark warns "No Partition Defined"), which
    * at billions of users is a straight OOM; three cutpoints cost one
    * tiny aggregate over the already-collapsed per-user frame.
    * Bucketing is strict-greater on each cutpoint, so ties at a
    * cutpoint land in the lower quartile deterministically. Returns
    * (user_id, n_events, n_days, last_us, freq_quartile 1..4). */
  def activitySegments(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val per = events.groupBy(col(userCol).as("user_id")).agg(
      count(lit(1)).as("n_events"),
      count_distinct(to_date(col(tsCol))).as("n_days"),
      max(unix_micros(col(tsCol))).as("last_us"))
    val cuts = per
      .agg(expr("percentile(n_events, array(0.25D, 0.5D, 0.75D))").as("q"))
      .select(element_at(col("q"), 1).as("__q1"),
        element_at(col("q"), 2).as("__q2"),
        element_at(col("q"), 3).as("__q3"))
    per.crossJoin(broadcast(cuts))
      .withColumn("freq_quartile",
        (lit(1) + when(col("n_events") > col("__q1"), 1).otherwise(0)
          + when(col("n_events") > col("__q2"), 1).otherwise(0)
          + when(col("n_events") > col("__q3"), 1).otherwise(0))
          .cast(org.apache.spark.sql.types.IntegerType))
      .select(col("user_id"), col("n_events"), col("n_days"),
        col("last_us"), col("freq_quartile"))
  }

  /** Cohort retention: users are cohorted by the day of their first event;
    * a cohort member is "retained at offset d" if they have any event d
    * days after their cohort day. Returns (cohort_day, day_offset,
    * n_users). Two user-keyed shuffles: the first-event aggregate and the
    * distinct (user, day) activity set; the cohort dim then joins back on
    * the user key (broadcast-sized at any realistic user count relative
    * to events). */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstDay = events.groupBy(col(userCol).as("u"))
      .agg(date_trunc("day", min(col(tsCol))).as("cohort_day"))
    val activity = events.select(col(userCol).as("u"),
      date_trunc("day", col(tsCol)).as("active_day")).distinct()
    activity.join(firstDay, "u")
      .select(col("cohort_day"),
        datediff(col("active_day"), col("cohort_day")).as("day_offset"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
