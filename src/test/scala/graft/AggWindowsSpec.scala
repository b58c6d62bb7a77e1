package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Agg, AsOf, Windows}

class AggWindowsSpec extends SparkSpec {

  test("denseGroupIdScalable: oracle-identical ids, broadcast join back, no full-table global sort") {
    import spark.implicits._
    val d = (1 to 500).map(i => (i, s"t${i % 7}")).toDF("id", "k")
    val naive = Windows.denseGroupId(d, Seq("k"))
      .select("id", "k", "group_id").collect()
      .map(r => (r.getInt(0), r.getInt(2))).toMap
    val scalable = Windows.denseGroupIdScalable(d, Seq("k"))
      .select("id", "k", "group_id").collect()
      .map(r => (r.getInt(0), r.getInt(2))).toMap
    assert(naive == scalable)
    val plan = Windows.denseGroupIdScalable(d, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // the only single-partition exchange allowed is the one ranking the tiny
    // DISTINCT key set; the 500-row table itself must never be globally sorted
    assert("Exchange SinglePartition".r.findAllIn(plan).size <= 1, plan)
  }

  test("denseGroupIdScalable keeps NULL-key rows and ranks the null group like denseGroupId") {
    val d = df("id INT, k STRING",
      Seq(R(1, "a"), R(2, null), R(3, "b"), R(4, null)))
    val naive = Windows.denseGroupId(d, Seq("k"))
      .select("id", "group_id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toMap
    val scalable = Windows.denseGroupIdScalable(d, Seq("k"))
      .select("id", "group_id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(scalable.size == 4) // null-key rows survive the join back
    assert(naive == scalable)
  }

  test("summaryStats short-circuits an all-null column to NaN instead of fake zeros") {
    val d = df("full DOUBLE, empty DOUBLE",
      Seq(R(1.0, null), R(2.0, null), R(3.0, null)))
    val out = Agg.summaryStats(d, Seq("full", "empty")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("full").getLong(1) == 3 && out("full").getDouble(2) == 2.0)
    val e = out("empty")
    assert(e.getLong(1) == 0)
    // every stat of a column with no data is NaN — not min=max=0.0
    assert((2 to 8).forall(i => e.getDouble(i).isNaN))
  }

  test("summaryStats: terms past the long-split range fail LOUD; fast path stays finite") {
    // exact path: 1e10 squares to 1e20 >= 2^62 — the in-plan assert must
    // reject it (Spark's floor raw-converts past 2^63, silently clamping;
    // the old decimal(32,14) accumulator capped x^2 near 1e18 too)
    val big = df("v DOUBLE", Seq(R(1.0), R(1.0e10)))
    val e = intercept[Exception](Agg.summaryStats(big, Seq("v")).collect())
    assert(e.getMessage.contains("long-split") ||
      Option(e.getCause).exists(_.getMessage.contains("long-split")),
      s"expected the loud per-term guard, got: ${e.getMessage}")
    // a finite 1e200 squares to +Inf: the fast path NULLs the square (the
    // shared finite() guard) instead of poisoning sum2 with Infinity
    val huge = df("v DOUBLE", Seq(R(1.0), R(2.0), R(1.0e200)))
    val fp = Agg.summaryStats(huge, Seq("v"), fast = true).collect()(0)
    assert(!fp.getDouble(3).isNaN && !fp.getDouble(3).isInfinite,
      s"fast std poisoned: ${fp.getDouble(3)}")
    assert(fp.getDouble(8) == 1.0e200) // max still reports the value
  }

  test("summaryStats fast path: double moments within FP tolerance, exact quantiles") {
    import scala.util.Random
    val rnd = new Random(11)
    import spark.implicits._
    val d = (1 to 4000).map(_ => rnd.nextGaussian() * 10.0).toDF("v")
    val exact = Agg.summaryStats(d, Seq("v")).collect()(0)
    val fp = Agg.summaryStats(d, Seq("v"), fast = true).collect()(0)
    // n/min/max identical; quantiles are the SAME exact selection
    assert(fp.getLong(1) == exact.getLong(1))
    assert(fp.getDouble(4) == exact.getDouble(4))
    assert(fp.getDouble(8) == exact.getDouble(8))
    Seq(5, 6, 7).foreach(i => assert(fp.getDouble(i) == exact.getDouble(i)))
    // double-summed mean/std: equal to the decimal path up to FP
    // accumulation order (NOT bit-pinned — that's the documented trade)
    Seq(2, 3).foreach { i =>
      assert(math.abs(fp.getDouble(i) - exact.getDouble(i)) < 1e-6,
        s"col $i: ${fp.getDouble(i)} vs ${exact.getDouble(i)}")
    }
  }

  test("exactPercentilesMulti matches the sorted path on ties, both bracket modes") {
    import scala.util.Random
    val rnd = new Random(7)
    // heavy ties (value % 13) + a continuous column + nulls
    val rows = (1 to 5000).map(i =>
      R((i % 13).toDouble, rnd.nextDouble() * 1000.0,
        if (i % 7 == 0) null else rnd.nextGaussian()))
    val d = df("tied DOUBLE, uni DOUBLE, gaps DOUBLE", rows)
    val ns = Map("tied" -> 5000L, "uni" -> 5000L,
                 "gaps" -> d.filter(col("gaps").isNotNull).count())
    val ps = Seq(0.25, 0.5, 0.75)
    val viaSort = Seq("tied", "uni", "gaps").map(c =>
      c -> Agg.exactPercentiles(d, c, ps, knownN = Some(ns(c)))).toMap
    val viaSample = Agg.exactPercentilesMulti(d, Seq("tied", "uni", "gaps"), ps, ns)
    val viaSketch = Agg.exactPercentilesMulti(d, Seq("tied", "uni", "gaps"), ps, ns,
      sketchFrom = 0L)
    assert(viaSample == viaSort, s"sample-bracket path diverged: $viaSample vs $viaSort")
    assert(viaSketch == viaSort, s"sketch-bracket path diverged: $viaSketch vs $viaSort")
    // degenerate maxWindow: every window breaches -> sorted fallback, same
    // result (sketchFrom=0 forces the bracket path — at this size the
    // sample path would short-circuit to the full-column direct resolution
    // and never consult maxWindow)
    val viaFallback = Agg.exactPercentilesMulti(d, Seq("tied"), ps,
      Map("tied" -> 5000L), maxWindow = 1L, sketchFrom = 0L)
    assert(viaFallback("tied") == viaSort("tied"))
  }

  test("exactPercentilesMulti rand-sampled branch (n > sample target) stays exact") {
    // sampleFloor forced under n: the Bernoulli-coin bracket path must
    // analyze (coin projected BELOW the aggregate, pre-filtered relation)
    // and stay exact; the default floor would short-circuit to the
    // full-column direct resolution at this size
    val d = spark.range(0, 60001).selectExpr("CAST(id AS DOUBLE) AS v")
    val ps = Seq(0.25, 0.5, 0.75)
    val out = Agg.exactPercentilesMulti(d, Seq("v"), ps, Map("v" -> 60001L),
      sampleFloor = 50000L)
    assert(out("v") == Seq(15000.0, 30000.0, 45000.0), out)
  }

  test("exactPercentilesMulti: heavy NaN mass stays exact on every bracket path") {
    // 40% NaN (Spark sorts NaN greatest): p75/p90 land inside the NaN run,
    // so their sample bracket endpoints are NaN. countInBracket's
    // total-order comparisons must see the tail's true mass (IEEE
    // comparisons with a NaN endpoint are all-false → ~0 estimate while the
    // scan-side `v <= NaN` admits every value — the fused-collect memory
    // guard this regression pins). Both the fused-window route (default
    // maxWindow: the NaN window fits and ranks resolve inside it) and the
    // fallback route (tiny maxWindow) must agree with the sorted path.
    val d = spark.range(0, 60000).selectExpr(
      "CAST(CASE WHEN id % 5 < 2 THEN 'NaN' ELSE CAST(id AS STRING) END AS DOUBLE) AS v")
    val ps = Seq(0.25, 0.5, 0.75, 0.9)
    val viaSort = Agg.exactPercentiles(d, "v", ps, knownN = Some(60000L))
    def same(a: Seq[Double], b: Seq[Double]): Boolean =
      a.zip(b).forall { case (x, y) => (x.isNaN && y.isNaN) || x == y }
    // sampleFloor below n forces the Bernoulli bracket path (the default
    // floor would short-circuit to full-column direct resolution)
    val fused = Agg.exactPercentilesMulti(d, Seq("v"), ps, Map("v" -> 60000L),
      sampleFloor = 50000L)
    val fallback = Agg.exactPercentilesMulti(d, Seq("v"), ps, Map("v" -> 60000L),
      sampleFloor = 50000L, maxWindow = 4000L)
    assert(same(fused("v"), viaSort), s"fused: ${fused("v")} vs $viaSort")
    assert(same(fallback("v"), viaSort), s"fallback: ${fallback("v")} vs $viaSort")
    assert(viaSort(3).isNaN && !viaSort.head.isNaN) // NaN run genuinely hit
  }

  test("dbMean equals plain value for constant input, exceeds mean otherwise") {
    val d = df("g STRING, v DOUBLE", Seq(R("a", 30.0), R("a", 30.0)))
    val m = d.groupBy(col("g")).agg(Agg.dbMean(col("v")).as("m"))
      .collect().head.getDouble(1)
    assert(math.abs(m - 30.0) < 1e-9)
    val d2 = df("g STRING, v DOUBLE", Seq(R("a", 10.0), R("a", 30.0)))
    val m2 = d2.groupBy(col("g")).agg(Agg.dbMean(col("v")).as("m"))
      .collect().head.getDouble(1)
    assert(m2 > 20.0) // dB-domain mean is dominated by the larger value
  }

  test("aggregateMulti dispatches mean/dbmean/sum per column code") {
    val d = df("g STRING, a DOUBLE, b DOUBLE, c DOUBLE",
      Seq(R("x", 1.0, 10.0, 2.0), R("x", 3.0, 10.0, 5.0)))
    val out = Agg.aggregateMulti(d, Seq("g"), Seq(("a", 0), ("b", 1), ("c", 2)))
      .collect().head
    assert(out.getDouble(out.fieldIndex("a_mean")) == 2.0)
    assert(math.abs(out.getDouble(out.fieldIndex("b_dbmean")) - 10.0) < 1e-9)
    assert(out.getDouble(out.fieldIndex("c_sum")) == 7.0)
  }

  test("weightedMean ignores null features in both numerator and denominator") {
    val d = df("g STRING, f DOUBLE, w DOUBLE",
      Seq(R("x", 10.0, 1.0), R("x", null, 99.0), R("x", 20.0, 3.0)))
    val out = Agg.weightedMean(d, Seq("g"), col("w"), Seq("f")).collect().head
    assert(math.abs(out.getDouble(1) - (10.0 * 1 + 20.0 * 3) / 4.0) < 1e-9)
  }

  test("meanMaxMinBy returns the value at the extreme of the by-column") {
    val d = df("g STRING, v DOUBLE, zh DOUBLE",
      Seq(R("x", 100.0, 5.0), R("x", 200.0, 9.0), R("x", 300.0, 1.0)))
    val out = Agg.meanMaxMinBy(d, Seq("g"), Seq("v"), "zh").collect().head
    assert(out.getDouble(out.fieldIndex("v_max")) == 200.0) // at max zh
    assert(out.getDouble(out.fieldIndex("v_min")) == 300.0) // at min zh
  }

  test("pairMean is null-aware") {
    val d = df("a DOUBLE, b DOUBLE", Seq(R(1.0, 3.0), R(null, 4.0), R(5.0, null)))
    val out = d.select(Agg.pairMean(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(2.0, 4.0, 5.0))
  }

  test("weightedAccumulate computes sum(v*w)/sum(w) across unioned parts") {
    val p1 = df("x INT, v DOUBLE, w DOUBLE", Seq(R(1, 10.0, 1.0)))
    val p2 = df("x INT, v DOUBLE, w DOUBLE", Seq(R(1, 20.0, 3.0)))
    val out = Agg.weightedAccumulate(Seq(p1, p2), Seq("x"), "v", "w").collect().head
    assert(math.abs(out.getDouble(out.fieldIndex("estimate")) - 17.5) < 1e-9)
  }

  test("sessionize splits on gaps greater than the threshold") {
    val rows = Seq(
      R("u", Timestamp.valueOf("2024-01-01 10:00:00")),
      R("u", Timestamp.valueOf("2024-01-01 10:10:00")),
      R("u", Timestamp.valueOf("2024-01-01 14:00:00")), // > 1h gap → new session
      R("v", Timestamp.valueOf("2024-01-01 10:00:00")))
    val d = df("u STRING, ts TIMESTAMP", rows)
    val out = Windows.sessionize(d, "u", "ts", 3600L)
      .select("u", "session_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("u", 1L), ("u", 2L), ("v", 1L)))
  }

  test("cumulativeSum orders within partition") {
    val d = df("k STRING, r INT, v DOUBLE",
      Seq(R("a", 2, 1.0), R("a", 1, 10.0), R("a", 3, 100.0)))
    val out = Windows.cumulativeSum(d, Seq("k"), "r", col("v"))
      .orderBy("r").collect().map(_.getDouble(3))
    assert(out.toSeq == Seq(10.0, 11.0, 111.0))
  }

  test("rollingSlope recovers the slope of an exact line") {
    val d = df("k STRING, r INT, y DOUBLE",
      (1 to 9).map(i => R("a", i, 3.0 * i + 7.0)))
    val out = Windows.rollingSlope(d, Seq("k"), "r", col("r").cast("double"), col("y"), 2)
    assert(out.collect().forall(r => math.abs(r.getDouble(3) - 3.0) < 1e-9))
  }

  test("asofJoin attaches the most recent right value at-or-before each left ts") {
    val left = df("id INT, k STRING, ts TIMESTAMP", Seq(
      R(1, "u", Timestamp.valueOf("2024-01-01 10:00:00")),
      R(2, "u", Timestamp.valueOf("2024-01-01 12:00:00")),
      R(3, "u", Timestamp.valueOf("2024-01-01 09:00:00"))))
    val right = df("k STRING, ts TIMESTAMP, v DOUBLE", Seq(
      R("u", Timestamp.valueOf("2024-01-01 09:30:00"), 1.0),
      R("u", Timestamp.valueOf("2024-01-01 11:00:00"), 2.0)))
    val out = AsOf.asofJoin(left, right, "k", "ts", Seq("v"))
      .collect().map(r => (r.getInt(0), Option(r.get(3)))).toMap
    assert(out(1).contains(1.0))
    assert(out(2).contains(2.0))
    assert(out(3).isEmpty) // nothing at or before 09:00
  }

  test("interpolateJoin blends hourly anchors linearly") {
    val pts = df("id INT, k STRING, ts TIMESTAMP", Seq(
      R(1, "u", Timestamp.valueOf("2024-01-01 10:30:00"))))
    val hourly = df("k STRING, hour_e BIGINT, v DOUBLE", Seq(
      R("u", Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000, 10.0),
      R("u", Timestamp.valueOf("2024-01-01 11:00:00").getTime / 1000, 20.0)))
    val out = AsOf.interpolateJoin(pts, hourly, "k", "ts", "hour_e", "v")
      .collect().head
    assert(math.abs(out.getDouble(out.fieldIndex("v_interp")) - 15.0) < 1e-9)
  }

  test("histogram: adaptive bounds, max in last bucket, constant column safe") {
    val d = df("v DOUBLE", (0 until 100).map(i => R(i.toDouble)))
    val out = Agg.histogram(d, "v", nbins = 10).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out.keySet == (0 until 10).toSet)
    assert(out.values.map(_._2).sum == 100L)
    assert(out(0)._1 == 0.0)            // first bucket starts at the min
    // v = 99 (the max) must land in bucket 9, not a phantom bucket 10
    assert(out(9)._2 >= 10L)
    val const = Agg.histogram(df("v DOUBLE", Seq(R(5.0), R(5.0))), "v", 10)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(const.toSeq == Seq((0, 2L)))  // width 0 → everything in bucket 0
  }

  test("histogram: one NaN row cannot poison the bounds") {
    // pre-fix: max = NaN under Spark's NaN-greatest ordering, width NaN,
    // NaN > 0 passes the width guard, and every finite row collapsed into
    // one NaN-bounded bucket
    val d = df("v DOUBLE", (0 until 100).map(i => R(i.toDouble)) :+ R(Double.NaN))
    val out = Agg.histogram(d, "v", nbins = 10).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out.keySet == (0 until 10).toSet)
    assert(out.values.map(_._2).sum == 100L) // the NaN row is excluded
    assert(out.values.forall(!_._1.isNaN))
  }

  test("summaryStats: an all-NaN column reports NaN mean/std, not unboxed zeros") {
    val d = df("full DOUBLE, nan DOUBLE",
      Seq(R(1.0, Double.NaN), R(2.0, Double.NaN), R(3.0, Double.NaN)))
    val out = Agg.summaryStats(d, Seq("full", "nan")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("full").getDouble(2) == 2.0)
    val e = out("nan")
    assert(e.getLong(1) == 3) // NaN rows are non-null, so n counts them
    assert(e.getDouble(2).isNaN && e.getDouble(3).isNaN,
      s"mean/std must be NaN for an all-NaN column: $e")
  }

  test("weightedProportions: a group with zero weight mass yields NULL, not 0/0") {
    val d = df("g STRING, cat STRING, w DOUBLE", Seq(
      R("ok", "a", 2.0), R("ok", "b", 2.0),
      R("dead", "other", 5.0),          // cat outside the pivot values
      R("dead2", "a", Double.NaN)))     // only a NaN weight
    val out = Agg.weightedProportions(d, Seq("g"), col("w"), "cat",
        Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("ok").getDouble(1) == 0.5 && out("ok").getDouble(2) == 0.5)
    Seq("dead", "dead2").foreach { g =>
      assert(out(g).isNullAt(1) && out(g).isNullAt(2),
        s"zero-mass group $g must be NULL: ${out(g)}")
    }
  }

  test("rollingZScore: abstains under minN and on zero variance, flags spikes") {
    val rows = Seq(1.0, 1.0, 1.0, 1.0, 100.0).zipWithIndex.map { case (v, i) =>
      R(i.toLong, 1L, new java.sql.Timestamp(i * 1000L), "t", v)
    }
    val d = df("event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE", rows)
    val out = graft.operators.Windows.rollingZScore(d, "user_id", "ts",
        "event_id", "value", lags = 8, minN = 3)
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(out(0L).isEmpty && out(1L).isEmpty && out(2L).isEmpty) // n < minN
    assert(out(3L).isEmpty)   // window all-1.0 → zero variance → abstain
    assert(out(4L).isEmpty)   // still constant baseline before the spike
    val rows2 = Seq(1.0, 2.0, 3.0, 100.0).zipWithIndex.map { case (v, i) =>
      R(i.toLong, 1L, new java.sql.Timestamp(i * 1000L), "t", v)
    }
    val out2 = graft.operators.Windows.rollingZScore(
        df("event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE", rows2),
        "user_id", "ts", "event_id", "value", lags = 8, minN = 3)
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    // baseline 1,2,3: mean 2, std 1 → z(100) = 98
    assert(out2(3L).contains(98.0))
  }

  test("madOutliers: flags the planted spike; zero-MAD group degrades honestly") {
    import spark.implicits._
    // group a: 1..9 (median 5, deviations 0..4 → MAD 2) plus a spike 1000:
    // with the spike, n=10, median 5.5, MAD 2.5 — z(1000) = 0.6745*994.5/2.5
    // group b: nine 5s and one 7 — >50% identical, MAD 0, no defined scale
    val rows = (1 to 9).map(v => ("a", v.toDouble)) ++ Seq(("a", 1000.0)) ++
      Seq.fill(9)(("b", 5.0)) ++ Seq(("b", 7.0))
    val d = rows.toDF("g", "v")
    val out = graft.operators.Agg.madOutliers(d, "g", "v", zThresh = 3.5)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n") == 10L)
    assert(a.getAs[Double]("med") == 5.5)
    assert(a.getAs[Double]("mad") == 2.5)
    assert(a.getAs[Long]("n_outliers") == 1L, "only the spike crosses 3.5")
    assert(math.abs(a.getAs[Double]("max_abs_z") - 0.6745 * 994.5 / 2.5) < 1e-6)
    val b = out("b")
    assert(b.getAs[Double]("mad") == 0.0)
    assert(b.isNullAt(b.fieldIndex("max_abs_z")), "zero MAD has no z-score")
    assert(b.getAs[Long]("n_outliers") == 1L, "the lone v != median row flags")
  }

  test("madOutliers: even-count median averages the two middle values") {
    import spark.implicits._
    val d = Seq(("g", 1.0), ("g", 2.0), ("g", 10.0), ("g", 20.0)).toDF("g", "v")
    val out = graft.operators.Agg.madOutliers(d, "g", "v").collect().head
    assert(out.getAs[Double]("med") == 6.0) // (2+10)/2
    // deviations: 5, 4, 4, 14 → sorted 4,4,5,14 → MAD (4+5)/2
    assert(out.getAs[Double]("mad") == 4.5)
  }
}
