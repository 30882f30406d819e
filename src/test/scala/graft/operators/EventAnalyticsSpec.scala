package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // hand-checkable fixture: u1 completes the funnel, u2 stalls after
  // click (purchase BEFORE click doesn't count), u3 views only, u4's
  // click is outside the 1-hour gap
  private lazy val fixture = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:10:00"), "purchase"),
    (2L, ts("2024-01-01 09:00:00"), "purchase"),
    (2L, ts("2024-01-01 10:00:00"), "view"),
    (2L, ts("2024-01-01 10:05:00"), "click"),
    (3L, ts("2024-01-01 10:00:00"), "view"),
    (4L, ts("2024-01-01 10:00:00"), "view"),
    (4L, ts("2024-01-01 11:30:00"), "click")
  ).toDF("user_id", "ts", "event_type")

  test("funnel: ordered within-gap conversion, earliest event per step") {
    val got = EventAnalytics.funnel(fixture, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGapSeconds = 3600)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, "view", 4L), (1L, "click", 2L),
      (2L, "purchase", 1L)))
  }

  test("funnel: same-timestamp step does not convert (strictly after)") {
    val df = Seq(
      (9L, ts("2024-01-01 10:00:00"), "view"),
      (9L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click"), maxGapSeconds = 3600)
      .orderBy("step").collect().map(_.getLong(2))
    assert(got.toSeq == Seq(1L, 0L))
  }

  test("transitions: counts per consecutive pair, ties broken by id") {
    // u1: view->click->purchase; u2: view->view (same ts — id order
    // decides which is first) ->click. Pairs: (v,c)x2, (c,p), (v,v)
    val df = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 11L, ts("2024-01-01 10:05:00"), "click"),
      (1L, 12L, ts("2024-01-01 10:10:00"), "purchase"),
      (2L, 20L, ts("2024-01-01 09:00:00"), "view"),
      (2L, 21L, ts("2024-01-01 09:00:00"), "view"),
      (2L, 22L, ts("2024-01-01 09:30:00"), "click")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = EventAnalytics.transitions(df, "user_id", "ts",
        "event_id", "event_type")
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("click", "purchase", 1L, 1.0),
      ("view", "click", 2L, 0.6667),
      ("view", "view", 1L, 0.3333)),
      got.mkString(","))
  }

  test("retention: cohort = first-event week, offsets count distinct users") {
    val df = Seq(
      // u1 active in weeks 0 and 1; u2 only week 0; u3 joins week 1
      (1L, ts("2024-01-01 10:00:00")), // Mon, week of 2024-01-01
      (1L, ts("2024-01-03 10:00:00")), // same week — one activity row
      (1L, ts("2024-01-09 10:00:00")), // next week
      (2L, ts("2024-01-02 10:00:00")),
      (3L, ts("2024-01-10 10:00:00"))
    ).toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val got = EventAnalytics.retention(df, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("peak concurrency: closed intervals, midnight split, no transient overcount") {
    // u1 09:00–10:00, u2 09:30–09:45 (overlap => 2), u3 a point
    // session at 10:00 — u1 is still active AT 10:00 (closed
    // interval), so 10:00 also holds 2 concurrent; the day's peak is 2
    val df = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 09:30:00")), (2L, ts("2024-01-01 09:45:00")),
      (3L, ts("2024-01-01 10:00:00")),
      // session crossing midnight: active on BOTH days
      (4L, ts("2024-01-02 23:50:00")), (4L, ts("2024-01-03 00:10:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.peakConcurrency(df, "user_id", "ts", 3600L)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 2L), ("2024-01-02", 1L), ("2024-01-03", 1L)))
  }

  test("peak concurrency: end-then-start at the same second counts both") {
    // closed intervals: a session ending at t and one starting at t
    // are simultaneously active at t — peak must be 2, and the sweep's
    // -1-first tie order must not make it 3 via transient overcount
    val df = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-01 09:30:00")),
      (2L, ts("2024-01-01 09:30:00")), (2L, ts("2024-01-01 09:50:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.peakConcurrency(df, "user_id", "ts", 1800L)
      .collect().map(r => r.getLong(1))
    assert(got.toSeq == Seq(2L))
  }

  test("funnel over the events table is monotone non-increasing") {
    val ev = Tables(spark, sf, "events")
    val counts = EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGapSeconds = 7L * 86400)
      .orderBy("step").collect().map(_.getLong(2))
    assert(counts.length == 3)
    assert(counts.sliding(2).forall(p => p(0) >= p(1)), counts.mkString(","))
    assert(counts(0) > 0)
  }
}
