package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Behavior, Stats}

/** Semantics of the round-11 behavioral/time-series operators: CUSUM finds
  * a planted mean shift, attribution credits are conservative (they sum to
  * the conversion count), and length-3 pattern support agrees with a
  * brute-force subsequence enumeration.
  */
class CusumAttributionSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("cusumChangePoint finds a planted mean shift at its boundary") {
    import spark.implicits._
    // user 1: 20 points at level 0, then 20 at level 5 — CUSUM |S| peaks
    // at the last pre-shift point; user 2: constant series, statistic 0
    val rows =
      (0 until 40).map(i => (1L, ts(i), i.toLong, if (i < 20) 0.0 else 5.0)) ++
      (0 until 10).map(i => (2L, ts(i), (100 + i).toLong, 3.0))
    val out = Stats.cusumChangePoint(rows.toDF("user_id", "ts", "event_id", "value"),
      "user_id", "ts", "event_id", "value").orderBy(col("user_id")).collect()
    assert(out.length == 2)
    val u1 = out(0)
    assert(u1.getLong(1) == 40)
    assert(u1.getLong(3) == 19L, s"change point at event ${u1.getLong(3)}, want 19")
    // |S| at the boundary = 20 · mean = 20 · 2.5 = 50
    assert(math.abs(u1.getDouble(5) - 50.0) < 1e-6)
    assert(u1.getDouble(4) < 0) // pre-shift sums run below the mean
    val u2 = out(1)
    assert(u2.getDouble(5) == 0.0, s"constant series must have |S| 0, got ${u2.getDouble(5)}")
    // tie-break: all |S| equal (0) → earliest (ts, id)
    assert(u2.getLong(3) == 100L)
  }

  test("attribution: linear credit is conservative and last-touch picks the latest") {
    import spark.implicits._
    // user 1: click@1, view@2, purchase@3  → linear 0.5/0.5, last → view
    // user 2: purchase@0 with no touches   → direct
    // user 3: click@1, purchase@2, purchase@40d-later (outside window) → direct
    val rows = Seq(
      (1L, ts(1), 1L, "click"), (1L, ts(2), 2L, "view"), (1L, ts(3), 3L, "purchase"),
      (2L, ts(0), 4L, "purchase"),
      (3L, ts(1), 5L, "click"), (3L, ts(2), 6L, "purchase"),
      (3L, Timestamp.valueOf("2024-03-01 10:00:00"), 7L, "purchase"))
    val out = Behavior.attribution(rows.toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type", "purchase",
      Seq("click", "view"), windowDays = 7)
      .orderBy(col("channel")).collect()
    val byCh = out.map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(byCh("click") == ((2L, 1.5, 1L)))  // 0.5 (u1) + 1.0 (u3); last for u3
    assert(byCh("view") == ((1L, 0.5, 1L)))   // last touch for u1
    assert(byCh("direct") == ((2L, 2.0, 2L))) // u2 + u3's out-of-window purchase
    // conservation: linear credit over all channels = total conversions
    val totalLinear = out.map(_.getDouble(2)).sum
    assert(math.abs(totalLinear - 4.0) < 1e-9, s"linear credits sum to $totalLinear, want 4")
    assert(out.map(_.getLong(3)).sum == 4L, "last-touch credits must also sum to 4")
  }

  test("sequencePatternSupport agrees with brute-force subsequence enumeration") {
    import spark.implicits._
    // small alphabet, deterministic pseudo-random sequences
    val types = Array("a", "b", "c")
    val rows = for {
      u <- 0L until 12L
      i <- 0 until 9
    } yield (u, ts(i), u * 100 + i, types(((u * 7 + i * i + 3) % 3).toInt))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.sequencePatternSupport(df, "user_id", "ts",
      "event_id", "event_type", minSupport = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    // brute force: enumerate every i<j<k per user
    val byUser = rows.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._4).toArray)
    val expected = scala.collection.mutable.Map.empty[(String, String, String), Set[Long]]
    byUser.foreach { case (u, seq) =>
      for {
        i <- seq.indices; j <- (i + 1) until seq.length; k <- (j + 1) until seq.length
      } {
        val key = (seq(i), seq(j), seq(k))
        expected(key) = expected.getOrElse(key, Set.empty) + u
      }
    }
    val expectedCounts = expected.view.mapValues(_.size.toLong).toMap
    assert(got == expectedCounts,
      s"diff: ${(got.toSet diff expectedCounts.toSet) ++ (expectedCounts.toSet diff got.toSet)}")
  }
}
