package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("stickiness: dau/mau per day within the calendar month") {
    def day(d: String) = Timestamp.valueOf(s"2024-0$d 09:00:00")
    val events = Seq(
      // January: day 1 actives {1,2}, day 2 actives {2,3} → mau 3
      (1L, day("1-01")), (2L, day("1-01")),
      (2L, day("1-02")), (3L, day("1-02")), (3L, day("1-02")),
      // February: one day, one user → stickiness 1.0
      (9L, day("2-10")))
      .toDF("user_id", "ts")
    val out = EventAnalytics.stickiness(events, "user_id", "ts")
      .orderBy("day")
      .select("dau", "mau", "stickiness").as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((2L, 3L, 0.666667), (2L, 3L, 0.666667), (1L, 1L, 1.0)))
  }

  test("activitySegments: hand-computed quartile cutpoints, cutpoint ties " +
      "land low, n_days and last_us exact") {
    def day(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // per-user event counts 1,1,2,3,4,5,6,8 → interpolated cutpoints
    // q25 = 1.75, q50 = 3.5, q75 = 5.25
    val counts = Seq(1, 1, 2, 3, 4, 5, 6, 8)
    val events = counts.zipWithIndex.flatMap { case (n, u) =>
      (0 until n).map(i => (u.toLong, day(1 + i % 3, 6 + i)))
    }.toDF("user_id", "ts")
    val out = EventAnalytics.activitySegments(events, "user_id", "ts")
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(out.map(_._2).toSeq === counts.map(_.toLong))
    assert(out.map(_._5).toSeq === Seq(1, 1, 2, 2, 3, 3, 4, 4),
      s"quartiles: ${out.map(_._5).toSeq}")
    // user 7 (8 events over days 1..3): 3 distinct days; the latest
    // TIMESTAMP is day 3 11:00 (i = 5), not the latest hour (day 2 13:00)
    val u7 = out.find(_._1 == 7L).get
    assert(u7._3 === 3L)
    assert(u7._4 === day(3, 11).getTime * 1000L)
  }

  test("interEventGaps: hand-computed min and median gaps; single-event " +
      "users excluded; equal timestamps tie-break by event id") {
    // user 1: events at minutes 0, 1, 3, 10 → gaps 60s, 120s, 420s
    //   (min 60s, median 120s); user 2: one event → excluded;
    // user 3: two events at the SAME timestamp → one gap of 0
    val events = Seq(
      (1L, ts(0), 100L), (1L, ts(1), 101L), (1L, ts(3), 102L),
      (1L, ts(10), 103L),
      (2L, ts(5), 200L),
      (3L, ts(7), 301L), (3L, ts(7), 300L))
      .toDF("user_id", "ts", "event_id")
    val out = EventAnalytics.interEventGaps(events, "user_id", "ts", "event_id")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((4L, 60000000L, 120000000.0)))
    assert(!out.contains(2L), "a single-event user has no gap row")
    assert(out(3L) === ((2L, 0L, 0.0)), "duplicate timestamps give a 0 gap")
  }

  test("hourlyAnomalies: flags only the burst hour; constant and single-hour types stay quiet") {
    def hr(h: Int, m: Int) = new Timestamp((h * 60L + m) * 60000L)
    val rows =
      // 'burst': 10 events/hour for hours 0..9, then 100 in hour 10
      (for (h <- 0 until 10; _ <- 0 until 10) yield ("burst", hr(h, 15))) ++
      (0 until 100).map(_ => ("burst", hr(10, 15))) ++
      // 'flat': identical count every hour → sd = 0 → nothing exceeds mean
      (for (h <- 0 until 5; _ <- 0 until 7) yield ("flat", hr(h, 30))) ++
      // 'lone': one active hour → NULL sample stddev → no baseline, no alert
      Seq(("lone", hr(3, 0)))
    val df = rows.toDF("event_type", "ts")
    val out = EventAnalytics.hourlyAnomalies(df, "event_type", "ts")
      .select("event_type", "n_events").as[(String, Long)].collect()
    assert(out.toSeq === Seq(("burst", 100L)))
    intercept[IllegalArgumentException] {
      EventAnalytics.hourlyAnomalies(df, "event_type", "ts", sigma = 0)
    }
  }

  test("funnel: order matters, window bounds, first qualifying occurrence") {
    val events = Seq(
      // u1 completes A→B→C in order, within windows
      (1L, ts(0), "A"), (1L, ts(10), "B"), (1L, ts(20), "C"),
      // u2 does B BEFORE A — never reaches stage 2
      (2L, ts(0), "B"), (2L, ts(10), "A"),
      // u3 does B too late (window is 30 min)
      (3L, ts(0), "A"), (3L, ts(45), "B"),
      // u4 has two Bs: the first qualifying one (t=25) anchors C's window,
      // so C at t=30 qualifies (25+30≥30)
      (4L, ts(0), "A"), (4L, ts(25), "B"), (4L, ts(28), "B"), (4L, ts(30), "C"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("A", "B", "C"), expr("INTERVAL 30 MINUTES"))
      .orderBy("stage").select("stage", "step", "n_users")
      .as[(Int, String, Long)].collect()
    assert(out.sameElements(Array(
      (1, "A", 4L),   // u1..u4 all did A
      (2, "B", 2L),   // u1, u4 (u2 out of order, u3 out of window)
      (3, "C", 2L)))) // u1, u4
  }

  test("funnel counts are monotonically non-increasing on real-shaped data") {
    val events = (0 until 500).map { i =>
      (i % 37L, ts(i % 97), Seq("A", "B", "C")(i % 3))
    }.toDF("user_id", "ts", "event_type")
    val n = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("A", "B", "C"), expr("INTERVAL 10 MINUTES"))
      .orderBy("stage").select("n_users").as[Long].collect()
    assert(n.length === 3 && n(0) >= n(1) && n(1) >= n(2))
  }

  test("retention: cohort by first day, offsets count distinct active users") {
    def day(d: Int, h: Int = 3) = new Timestamp((d * 24L + h) * 3600000L)
    val events = Seq(
      (1L, day(0)), (1L, day(0, 9)), (1L, day(2)),   // cohort d0, active 0 & 2
      (2L, day(0)), (2L, day(1)),                    // cohort d0, active 0 & 1
      (3L, day(1)), (3L, day(2)))                    // cohort d1, active 1 & 2
      .toDF("user_id", "ts")
    val out = EventAnalytics.retention(events, "user_id", "ts")
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("c"),
        col("day_offset"), col("n_users"))
      .orderBy("c", "day_offset")
      .as[(String, Int, Long)].collect()
    assert(out.sameElements(Array(
      ("1970-01-01", 0, 2L), ("1970-01-01", 1, 1L), ("1970-01-01", 2, 1L),
      ("1970-01-02", 0, 1L), ("1970-01-02", 1, 1L))))
  }

  test("rollingHourlyCounts: trailing frame over the zero-filled spine — " +
      "gap hours count as zero, warm-up frames report their true size") {
    def hr(h: Int) = new Timestamp(h * 3600000L + 60000L)
    // type a: hours 0 (2 events) and 2 (1 event); hour 1 is EMPTY but
    // must enter the window as zero; type b: hour 1 only
    val ev = Seq(("a", hr(0)), ("a", hr(0)), ("a", hr(2)), ("b", hr(1)))
      .toDF("event_type", "ts")
    val out = graft.ops.EventAnalytics
      .rollingHourlyCounts(ev, "event_type", "ts", window = 2)
      .select("event_type", "hour_us", "n", "rolling_n", "n_periods",
        "rolling_avg")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2 / 3600000000L) -> ((r._3, r._4, r._5, r._6)))
      .toMap
    assert(out(("a", 0L)) === ((2L, 2L, 1L, 2.0)))  // warm-up: 1 period
    assert(out(("a", 1L)) === ((0L, 2L, 2L, 1.0)))  // zero hour in frame
    assert(out(("a", 2L)) === ((1L, 1L, 2L, 0.5)))  // the zero rolls in
    assert(out(("b", 0L)) === ((0L, 0L, 1L, 0.0)))  // full spine per type
    assert(out(("b", 1L)) === ((1L, 1L, 2L, 0.5)))
    assert(out(("b", 2L)) === ((0L, 1L, 2L, 0.5)))
    intercept[IllegalArgumentException] {
      graft.ops.EventAnalytics.rollingHourlyCounts(ev, "event_type", "ts", 0)
    }
  }

  test("rollingHourlyQuantiles: hand-computed trailing-window medians; " +
      "no-sample hours carry NULL; null values excluded; guards") {
    def hr(h: Int) = new Timestamp(h * 3600000L + 60000L)
    // type a: hour 0 values {10, 20}, hour 2 value {40}; hour 1 empty.
    // window 2: h0 sees {10,20} → p50 15; h1 sees h0..h1 = {10,20} → 15;
    // h2 sees h1..h2 = {40} → 40. A null value must not contribute.
    val ev = Seq(("a", hr(0), Some(10.0)), ("a", hr(0), Some(20.0)),
      ("a", hr(2), Some(40.0)), ("a", hr(2), None),
      ("b", hr(1), Some(7.0)))
      .toDF("event_type", "ts", "value")
    val out = graft.ops.EventAnalytics
      .rollingHourlyQuantiles(ev, "event_type", "ts", "value", window = 2,
        ps = Seq(0.5))
      .select("event_type", "hour_us", "n_samples", "p50")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2 / 3600000000L) -> ((r._3, r._4))).toMap
    assert(out(("a", 0L)) === ((2L, Some(15.0))))
    assert(out(("a", 1L)) === ((2L, Some(15.0))))
    assert(out(("a", 2L)) === ((1L, Some(40.0))))
    assert(out(("b", 0L)) === ((0L, None)), "no-sample hour → NULL, not 0")
    assert(out(("b", 1L)) === ((1L, Some(7.0))))
    assert(out(("b", 2L)) === ((1L, Some(7.0))))
    intercept[IllegalArgumentException] {
      graft.ops.EventAnalytics.rollingHourlyQuantiles(ev, "event_type",
        "ts", "value", window = 2, ps = Seq(1.5))
    }
  }

  test("rollingHourlyQuantilesSketch: sketch quantiles track the exact " +
      "twin within the KLL rank-error envelope; identical spine shape") {
    def hr(h: Int) = new Timestamp(h * 3600000L)
    // 3 hours × 400 values per hour, shifting distribution per hour
    val rows = for {
      h <- 0 until 3; i <- 0 until 400
    } yield ("a", new Timestamp(hr(h).getTime + i * 1000L),
      (h * 100 + (i % 100)).toDouble)
    val ev = rows.toDF("event_type", "ts", "value")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select("hour_us", "n_samples", "p50", "p95")
        .as[(Long, Long, Option[Double], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val exact = asMap(graft.ops.EventAnalytics.rollingHourlyQuantiles(
      ev, "event_type", "ts", "value", window = 2))
    val sk = asMap(graft.ops.EventAnalytics.rollingHourlyQuantilesSketch(
      ev, "event_type", "ts", "value", window = 2))
    assert(exact.keySet === sk.keySet, "same spine")
    exact.foreach { case (h, (n, ep50, ep95)) =>
      val (sn, sp50, sp95) = sk(h)
      assert(sn === n, "sample counts are exact on both paths")
      // k = 200 ⇒ normalized rank error ~1.6%; the value span per
      // window is ≤ 300, so a generous ±5% of the SPAN bounds both
      for ((e, a) <- Seq((ep50, sp50), (ep95, sp95))) {
        assert(e.isDefined === a.isDefined)
        assert(math.abs(e.get - a.get) <= 15.0,
          s"hour $h: sketch ${a.get} too far from exact ${e.get}")
      }
    }
  }

  test("rolling quantile label collisions fail at call time, not as an " +
      "ambiguous-column frame downstream (both exact and sketch paths)") {
    def hr(h: Int) = new Timestamp(h * 3600000L)
    val ev = Seq(("a", hr(0), 1.0)).toDF("event_type", "ts", "value")
    // 0.995 and 1.0 both label "p100"; 0.95 and 0.954 both "p95"
    for (ps <- Seq(Seq(0.995, 1.0), Seq(0.95, 0.954))) {
      val e1 = intercept[IllegalArgumentException] {
        graft.ops.EventAnalytics.rollingHourlyQuantiles(ev, "event_type",
          "ts", "value", window = 2, ps = ps)
      }
      assert(e1.getMessage.contains("collide"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        graft.ops.EventAnalytics.rollingHourlyQuantilesSketch(ev,
          "event_type", "ts", "value", window = 2, ps = ps)
      }
      assert(e2.getMessage.contains("collide"), e2.getMessage)
    }
    // distinct-at-percent ranks still pass
    val ok = graft.ops.EventAnalytics.rollingHourlyQuantiles(ev,
      "event_type", "ts", "value", window = 2, ps = Seq(0.5, 0.95, 1.0))
    assert(ok.columns.count(_.startsWith("p")) === 3)
  }
}
