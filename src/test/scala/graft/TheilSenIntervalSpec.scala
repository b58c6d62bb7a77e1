package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Stats, Windows}

/** Semantics of the round-11 second-wave operators: Theil–Sen shrugs off
  * outliers that wreck OLS, and interval coverage merges overlaps exactly.
  */
class TheilSenIntervalSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private def unixEpochOf(t: Timestamp): Long = t.getTime / 1000L

  test("theilSen recovers a planted slope under 25% gross outliers; OLS does not") {
    import spark.implicits._
    // y = 2x + 1 at x = 0..19 minutes, with every 4th point blasted to 500
    val rows = (0 until 20).map { i =>
      val y = if (i % 4 == 3) 500.0 else 2.0 * (i * 60) + 1.0
      (1L, ts(i), i.toLong, y)
    }
    val df = rows.toDF("user_id", "ts", "event_id", "value")
      .withColumn("x", unix_timestamp(col("ts")))
    val sen = Stats.theilSen(df, "user_id", "x", "event_id", "value")
      .head()
    assert(sen.getLong(1) == 20 && sen.getLong(2) > 0)
    assert(math.abs(sen.getDouble(3) - 2.0) < 0.05,
      s"Theil-Sen slope ${sen.getDouble(3)}, want ~2.0")
    // OLS squares x, so give it a small-origin copy (epoch² overflows the
    // decimal accumulator by design — Theil-Sen only ever differences x)
    val df0 = df.withColumn("x", col("x") - lit(unixEpochOf(ts(0))))
    val ols = Stats.groupedOls(df0, "user_id", "x", "value").head()
    assert(math.abs(ols.getDouble(2) - 2.0) > 0.5,
      s"OLS should be wrecked by the outliers, got ${ols.getDouble(2)}")
  }

  test("theilSen median interpolation: even pair count averages the middle two") {
    import spark.implicits._
    // 3 points, all pairs valid → 3 slopes (odd); 4 points → 6 slopes (even)
    val odd = Seq((1L, ts(0), 1L, 0.0), (1L, ts(1), 2L, 60.0), (1L, ts(3), 3L, 60.0))
      .toDF("user_id", "ts", "event_id", "value")
      .withColumn("x", unix_timestamp(col("ts")))
    // slopes: (60-0)/60=1, (60-0)/180=1/3, (60-60)/120=0 → median 1/3
    val m1 = Stats.theilSen(odd, "user_id", "x", "event_id", "value").head().getDouble(3)
    assert(math.abs(m1 - 1.0 / 3.0) < 1e-12, s"odd median $m1")
    val even = Seq((1L, ts(0), 1L, 0.0), (1L, ts(1), 2L, 120.0),
      (1L, ts(2), 3L, 120.0), (1L, ts(4), 4L, 120.0))
      .toDF("user_id", "ts", "event_id", "value")
      .withColumn("x", unix_timestamp(col("ts")))
    // slopes: 2, 1, 0.5, 0, 0, 0 → sorted 0,0,0,0.5,1,2 → median (0+0.5)/2
    val m2 = Stats.theilSen(even, "user_id", "x", "event_id", "value").head().getDouble(3)
    assert(m2 == 0.25, s"even median $m2")
  }

  test("intervalCoverage merges overlapping and touching intervals into islands") {
    import spark.implicits._
    def T(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    // key 1: [00:00,00:10] + [00:05,00:12] overlap; [00:12,00:15] TOUCHES
    //        (merges); [00:30,00:40] is its own island
    // key 2: three disjoint 1-minute intervals
    val rows = Seq(
      (1L, T("10:00:00"), T("10:10:00"), 1L),
      (1L, T("10:05:00"), T("10:12:00"), 2L),
      (1L, T("10:12:00"), T("10:15:00"), 3L),
      (1L, T("10:30:00"), T("10:40:00"), 4L),
      (2L, T("10:00:00"), T("10:01:00"), 5L),
      (2L, T("10:02:00"), T("10:03:00"), 6L),
      (2L, T("10:04:00"), T("10:05:00"), 7L))
      .toDF("k", "s", "e", "id")
    val out = Windows.intervalCoverage(rows, "k", "s", "e", "id")
      .orderBy(col("k")).collect()
    val k1 = out(0)
    assert(k1.getLong(1) == 4 && k1.getLong(2) == 2,
      s"k1: ${k1.getLong(1)} intervals, ${k1.getLong(2)} islands")
    assert(k1.getLong(3) == (15 + 10) * 60, s"k1 covered ${k1.getLong(3)}")
    assert(k1.getLong(4) == 15 * 60)
    val k2 = out(1)
    assert(k2.getLong(2) == 3 && k2.getLong(3) == 3 * 60)
  }

  test("intervalCoverage: an interval fully contained in its predecessor does not split the island") {
    import spark.implicits._
    def T(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    // [00:00,00:20] contains [00:05,00:06]; next [00:07,00:25] still
    // overlaps the running max (00:20) even though it starts after the
    // CONTAINED interval's end — the running-max (not lag-end) test
    val rows = Seq(
      (1L, T("10:00:00"), T("10:20:00"), 1L),
      (1L, T("10:05:00"), T("10:06:00"), 2L),
      (1L, T("10:07:00"), T("10:25:00"), 3L))
      .toDF("k", "s", "e", "id")
    val out = Windows.intervalCoverage(rows, "k", "s", "e", "id").head()
    assert(out.getLong(2) == 1, s"islands ${out.getLong(2)}, want 1")
    assert(out.getLong(3) == 25 * 60)
  }
}
