package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Behavior

class BehaviorSpec extends SparkSpec {

  private def ts(m: Int): Timestamp = new Timestamp(m * 60000L)

  private def ev = df(
    "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE",
    Seq(
      // user 1: full ordered funnel
      R(1L, 1L, ts(0), "view", 1.0),
      R(2L, 1L, ts(5), "click", 2.0),
      R(3L, 1L, ts(9), "purchase", 3.0),
      // user 2: click BEFORE first view — click must not count
      R(4L, 2L, ts(1), "click", 1.0),
      R(5L, 2L, ts(2), "view", 1.0),
      R(6L, 2L, ts(3), "purchase", 4.0),
      // user 3: view only
      R(7L, 3L, ts(0), "view", 5.0)))

  test("funnel: strict ordering, first-occurrence semantics, conversion vs step 1") {
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // step1: users 1,2,3 viewed; step2: only user 1 clicked after a view
    // (user 2's click precedes their view); step3: user 1 purchased after
    assert(out.toSeq == Seq(
      (1, "view", 3L, 1.0),
      (2, "click", 1L, 0.333333),
      (3, "purchase", 1L, 0.333333)))
  }

  test("funnel: empty first step yields zero conversions, not a division error") {
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type",
        Seq("signup", "purchase"))
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1, 0L, 0.0), (2, 0L, 0.0)))
  }

  test("cohortRetention: offsets measured from each user's first day") {
    val e = df(
      "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE",
      Seq(
        R(1L, 1L, ts(0), "view", 1.0),          // day 0 cohort
        R(2L, 1L, ts(24 * 60), "view", 1.0),    // active day 1
        R(3L, 2L, ts(10), "view", 1.0),         // day 0 cohort, day 0 only
        R(4L, 3L, ts(24 * 60 + 5), "view", 1.0))) // day 1 cohort
    val out = Behavior.cohortRetention(e, "user_id", "ts")
      .orderBy(col("cohort"), col("day_offset")).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("1970-01-01", 0, 2L, 1.0),   // both day-0 users active on day 0
      ("1970-01-01", 1, 1L, 0.5),   // one of them returns on day 1
      ("1970-01-02", 0, 1L, 1.0)))
  }

  test("ewma: head normalization, exact 2^-j weights, per-key isolation") {
    val e = df(
      "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE",
      Seq(
        R(1L, 1L, ts(0), "view", 4.0),
        R(2L, 1L, ts(1), "view", 8.0),
        R(3L, 1L, ts(2), "view", 2.0),
        R(4L, 2L, ts(0), "view", 100.0))) // other key: untouched by user 1
    val out = Behavior.ewma(e, "user_id", "ts", "event_id", "value",
        alpha = 0.5, lags = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == 4.0)                            // single obs = itself
    assert(out(2L) == r6((8.0 + 0.5 * 4.0) / 1.5))    // adjust=True head
    assert(out(3L) == r6((2.0 + 0.5 * 8.0 + 0.25 * 4.0) / 1.75))
    assert(out(4L) == 100.0)
  }
}
