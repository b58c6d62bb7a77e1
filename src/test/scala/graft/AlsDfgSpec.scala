package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ml.Als
import graft.operators.Behavior

/** Fit quality of the deterministic ALS factorization and exactness of
  * the process-map medians.
  */
class AlsDfgSpec extends SparkSpec {

  test("factorize2 recovers a rank-2 rating matrix: RMSE tiny and decreasing in iters") {
    import spark.implicits._
    // ratings from a true rank-2 model: r(u,p) = a_u*c_p + b_u*d_p
    val rows = for { u <- 0L until 30L; p <- 0L until 20L; if (u + p) % 3 != 0 }
      yield {
        val (au, bu) = (1.0 + (u % 5) * 0.5, 0.5 + (u % 7) * 0.25)
        val (cp, dp) = (1.0 + (p % 4) * 0.75, 2.0 - (p % 6) * 0.2)
        (u, p, au * cp + bu * dp)
      }
    val df = rows.toDF("u", "p", "r")
    val rmse1 = Als.fitRmse(df, "u", "p", "r", iters = 1, lambda = 0.05)
      .head().getDouble(1)
    val rmse3 = Als.fitRmse(df, "u", "p", "r", iters = 3, lambda = 0.05)
      .head().getDouble(1)
    assert(rmse3 <= rmse1 + 1e-9, s"RMSE rose with iterations: $rmse1 -> $rmse3")
    assert(rmse3 < 0.15, s"rank-2 data should fit nearly exactly, rmse $rmse3")
    // and far below the trivial constant predictor's error
    val vals = rows.map(_._3)
    val mean = vals.sum / vals.size
    val sdev = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / vals.size)
    assert(rmse3 < sdev / 4, s"rmse $rmse3 vs baseline sd $sdev")
  }

  test("processDfg: edge counts and exact counted medians on a hand-computed trace") {
    import spark.implicits._
    val T = (sec: Int) => new Timestamp(1704103200000L + sec * 1000L)
    // user 1: a→b (10s), b→a (20s), a→b (30s); user 2: a→b (50s)
    val rows = Seq(
      (1L, T(0), 1L, "a"), (1L, T(10), 2L, "b"), (1L, T(30), 3L, "a"),
      (1L, T(60), 4L, "b"),
      (2L, T(100), 5L, "a"), (2L, T(150), 6L, "b"))
    val out = Behavior.processDfg(rows.toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type")
      .orderBy(col("from_type"), col("to_type")).collect()
    val byEdge = out.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // a→b gaps: 10, 30, 50 → median 30; b→a gaps: 20
    assert(byEdge(("a", "b")) == ((3L, 10L, 50L, 30.0)), s"${byEdge(("a", "b"))}")
    assert(byEdge(("b", "a")) == ((1L, 20L, 20L, 20.0)))
    assert(byEdge.size == 2)
  }

  test("processDfg median interpolates between the two middle counted values") {
    import spark.implicits._
    val T = (sec: Int) => new Timestamp(1704103200000L + sec * 1000L)
    // one edge a→b with gaps 10, 10, 20, 40 → median (10+20)/2 = 15
    val rows = Seq(
      (1L, T(0), 1L, "a"), (1L, T(10), 2L, "b"),
      (2L, T(0), 3L, "a"), (2L, T(10), 4L, "b"),
      (3L, T(0), 5L, "a"), (3L, T(20), 6L, "b"),
      (4L, T(0), 7L, "a"), (4L, T(40), 8L, "b"))
    val out = Behavior.processDfg(rows.toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type").head()
    assert(out.getLong(2) == 4 && out.getDouble(5) == 15.0,
      s"n ${out.getLong(2)}, median ${out.getDouble(5)}")
  }
}
