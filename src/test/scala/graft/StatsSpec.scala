package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Behavior, Stats}
import graft.llm.TextAnalysis

class StatsSpec extends SparkSpec {

  private def ts(m: Int): Timestamp = new Timestamp(m * 60000L)

  test("groupedOls: exact fit, degenerate-x group, constant-y group") {
    val d = df("g STRING, x DOUBLE, y DOUBLE", Seq(
      // perfect line y = 2x + 1
      R("a", 0.0, 1.0), R("a", 1.0, 3.0), R("a", 2.0, 5.0),
      // zero x-variance: no regression
      R("b", 4.0, 1.0), R("b", 4.0, 9.0),
      // zero y-variance: slope 0, R^2 undefined (0/0)
      R("c", 0.0, 7.0), R("c", 2.0, 7.0)))
    val out = Stats.groupedOls(d, "g", "x", "y").orderBy(col("g")).collect()
    val a = out(0); val b = out(1); val c = out(2)
    assert(a.getLong(1) == 3L && a.getDouble(2) == 2.0 &&
      a.getDouble(3) == 1.0 && a.getDouble(4) == 1.0)
    assert(b.isNullAt(2) && b.isNullAt(3) && b.isNullAt(4))
    assert(c.getDouble(2) == 0.0 && c.getDouble(3) == 7.0 && c.isNullAt(4))
  }

  test("groupedOls: noisy fit matches the closed form") {
    // y = x + e with e = (+1, -1, 0, 0): slope from the normal equations
    val d = df("g STRING, x DOUBLE, y DOUBLE", Seq(
      R("g", 0.0, 1.0), R("g", 1.0, 0.0), R("g", 2.0, 2.0), R("g", 3.0, 3.0)))
    val r = Stats.groupedOls(d, "g", "x", "y").collect()(0)
    // n=4 sx=6 sy=6 sxx=14 sxy=13 syy=14; cov=4*13-36=16; varx=vary=20
    assert(r.getDouble(2) == 0.8)           // 16/20
    assert(r.getDouble(3) == 0.3)           // (6 - 0.8*6)/4
    assert(r.getDouble(4) == 0.64)          // 256/(20*20)
  }

  test("skyline2d: dominance, both-axis ties survive, equal-cost pruning") {
    val d = df("id BIGINT, cost DOUBLE, gain INT", Seq(
      R(1L, 1.0, 5), // frontier
      R(2L, 1.0, 3), // dominated: same cost, smaller gain
      R(3L, 2.0, 5), // dominated: costlier, same gain as id 1
      R(4L, 2.0, 7), // frontier
      R(5L, 3.0, 7), // dominated by id 4 (costlier, equal gain)
      R(6L, 4.0, 9), // frontier
      R(7L, 4.0, 9))) // tie on BOTH axes with id 6: neither dominates
    val out = Stats.skyline2d(d, "id", "cost", "gain")
      .orderBy(col("cost"), col("id")).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 4L, 6L, 7L))
  }

  test("skyline2d equals the quadratic dominance definition on random data") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 200).map(i =>
      R(i.toLong, (rng.nextInt(40) / 4.0), rng.nextInt(30)))
    val d = df("id BIGINT, cost DOUBLE, gain INT", rows)
    val fast = Stats.skyline2d(d, "id", "cost", "gain")
      .select("id").collect().map(_.getLong(0)).toSet
    val l = d.select(col("id"), col("cost"), col("gain"))
    val r = d.select(col("id").as("qid"), col("cost").as("qc"), col("gain").as("qg"))
    val dominated = l.join(r,
        col("qc") <= col("cost") && col("qg") >= col("gain") &&
        (col("qc") < col("cost") || col("qg") > col("gain")), "leftsemi")
      .select("id").collect().map(_.getLong(0)).toSet
    val brute = d.select("id").collect().map(_.getLong(0)).toSet -- dominated
    assert(fast == brute)
  }

  test("markovTransitions: per-user sequencing and per-src normalization") {
    val e = df("event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING",
      Seq(
        R(1L, 1L, ts(0), "a"), R(2L, 1L, ts(1), "b"), R(3L, 1L, ts(2), "a"),
        R(4L, 2L, ts(0), "a"), R(5L, 2L, ts(1), "c")))
    val out = Stats.markovTransitions(e, "user_id", "ts", "event_id", "event_type")
      .orderBy(col("src"), col("dst")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // from 'a': a->b (u1), a->c (u2); from 'b': b->a (u1); u2's c is terminal
    assert(out.toSeq == Seq(
      ("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5), ("b", "a", 1L, 1.0)))
  }

  test("pathTopK: short paths kept, count ties broken by path") {
    val e = df("event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING",
      Seq(
        R(1L, 1L, ts(0), "x"), R(2L, 1L, ts(1), "y"), R(3L, 1L, ts(2), "z"),
        R(4L, 1L, ts(3), "q"), // 4th event must not extend the path
        R(5L, 2L, ts(0), "x"), R(6L, 2L, ts(1), "y"), R(7L, 2L, ts(2), "z"),
        R(8L, 3L, ts(0), "x"), // single-event user: path "x"
        R(9L, 4L, ts(0), "a"), R(10L, 4L, ts(1), "b")))
    val out = Behavior.pathTopK(e, "user_id", "ts", "event_id", "event_type",
        len = 3, k = 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1, "x>y>z", 2L), (2, "a>b", 1L), (3, "x", 1L)))
  }

  test("chi2Terms: the class-exclusive token outranks the shared one") {
    val docs = df("doc_id BIGINT, lang STRING, text STRING", Seq(
      R(1L, "en", "shared shared only_en only_en only_en"),
      R(2L, "de", "shared shared only_de only_de only_de")))
    val out = TextAnalysis.chi2Terms(docs, "lang", "text", minCount = 1, k = 2)
      .orderBy(col("class"), col("rank")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    // a token ABSENT from a class has no (class, token) row — it can be
    // distinctive of the other class, never of this one; the runner-up
    // here is the zero-association shared token
    assert(out.toSeq == Seq(
      ("de", 1, "only_de"), ("de", 2, "shared"),
      ("en", 1, "only_en"), ("en", 2, "shared")))
    // shared token has zero association: chi2 = 0
    val full = TextAnalysis.chi2Terms(docs, "lang", "text", minCount = 1, k = 10)
      .filter(col("token") === "shared").collect()
    assert(full.forall(_.getDouble(5) == 0.0))
  }

  test("winsorize: exact interpolated bounds, tail counts, clipped sum") {
    // g: values 1..10 → p05 = 1.45, p95 = 9.55 (rank = p·(n−1) interp)
    val d = df("g STRING, v DOUBLE",
      (1 to 10).map(i => R("g", i.toDouble)))
    val r = graft.operators.Stats.winsorize(d, "g", "v").collect()(0)
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 1.45 && r.getDouble(3) == 9.55)
    assert(r.getLong(4) == 1L && r.getLong(5) == 1L) // v=1 low, v=10 high
    // winsorized sum: 1.45 + (2..9).sum + 9.55 = 55.0
    assert(r.getDouble(6) == 55.0)
  }

  test("winsorize: single-row group degenerates to the value itself") {
    val d = df("g STRING, v DOUBLE", Seq(R("a", 42.0)))
    val r = graft.operators.Stats.winsorize(d, "g", "v").collect()(0)
    assert(r.getDouble(2) == 42.0 && r.getDouble(3) == 42.0)
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L && r.getDouble(6) == 42.0)
  }

  test("neighborPairs: matches the quadratic definition, incl. cross-cell pairs") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 120).map(i =>
      R(i.toLong, rng.nextInt(100) / 10.0, rng.nextInt(100) / 10.0))
    val d = df("id BIGINT, x DOUBLE, y DOUBLE", rows)
    val radius = 1.5
    val fast = graft.operators.Spatial.neighborPairs(d, "id", "x", "y", radius)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val l = d.select(col("id").as("a"), col("x").as("xa"), col("y").as("ya"))
    val r2 = d.select(col("id").as("b"), col("x").as("xb"), col("y").as("yb"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    val brute = l.join(r2, col("a") < col("b"))
      .filter(d2 <= radius * radius)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == brute && brute.nonEmpty)
  }

  test("phraseTopK: counts overlapping occurrences, ranks by count then id") {
    val docs = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "Big data big data big data"),   // "big data" ×3 (case-folded)
      R(2L, "big data once"),
      R(3L, "data big no phrase here"),
      R(4L, "big data and big data")))       // ×2
    val out = TextAnalysis.phraseTopK(docs, "doc_id", "text", "big data", k = 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 1L, 3L), (2, 4L, 2L), (3, 2L, 1L)))
  }

  test("madOutliers multi-key: buckets are independent") {
    val d = df("g STRING, hr INT, v DOUBLE",
      (1 to 9).map(i => R("a", 0, i.toDouble)) ++   // median 5, spike below
        Seq(R("a", 0, 1000.0)) ++
        (1 to 5).map(i => R("a", 1, 50.0)))          // constant bucket
    val out = graft.operators.Agg.madOutliers(d, Seq("g", "hr"), "v", 3.5)
      .orderBy(col("hr")).collect()
    assert(out(0).getLong(2) == 10L && out(0).getLong(5) == 1L) // spike flagged
    assert(out(1).getDouble(4) == 0.0 && out(1).getLong(5) == 0L) // zero-MAD, no flags
  }

  test("abWelchZ: hand-computed z, degenerate arms give NULL") {
    val d = df("g STRING, variant INT, v DOUBLE", Seq(
      // arm0: 1,2,3 (mean 2, var 1); arm1: 4,6 (mean 5, var 2)
      R("a", 0, 1.0), R("a", 0, 2.0), R("a", 0, 3.0),
      R("a", 1, 4.0), R("a", 1, 6.0),
      // zero variance in both arms → se2 = 0 → NULL z
      R("b", 0, 5.0), R("b", 0, 5.0), R("b", 1, 7.0), R("b", 1, 7.0),
      // n1 = 1 → NULL z
      R("c", 0, 1.0), R("c", 0, 2.0), R("c", 1, 9.0)))
    val out = graft.operators.Stats.abWelchZ(d, "g", "variant", "v")
      .orderBy(col("g")).collect()
    val a = out(0)
    assert(a.getLong(1) == 3L && a.getLong(2) == 2L)
    assert(a.getDouble(3) == 2.0 && a.getDouble(4) == 5.0)
    // z = 3 / sqrt(1/3 + 2/2) = 3 / sqrt(4/3)
    assert(math.abs(a.getDouble(5) - 3.0 / math.sqrt(4.0 / 3.0)) < 1e-6)
    assert(out(1).isNullAt(5) && out(2).isNullAt(5))
  }

  test("snapshotDiff: classifies added/removed/changed/unchanged with columns") {
    val v1 = df("k BIGINT, p DOUBLE, s STRING", Seq(
      R(1L, 10.0, "x"), R(2L, 20.0, "y"), R(3L, 30.0, "z"), R(4L, null, "w")))
    val v2 = df("k BIGINT, p DOUBLE, s STRING", Seq(
      R(1L, 10.0, "x"),          // unchanged
      R(2L, 21.0, "y2"),         // changed: p and s
      R(4L, null, "w"),          // unchanged (null-safe compare)
      R(5L, 50.0, "v")))         // added; 3 removed
    val out = graft.operators.Relational.snapshotDiff(v1, v2, "k", Seq("p", "s"))
      .orderBy(col("status"), col("changed_cols")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("added", "", 1L), ("changed", "p,s", 1L),
      ("removed", "", 1L), ("unchanged", "", 2L)))
  }

  test("bfsLayers: hop census on a path graph with an unreachable component") {
    // path 1-2-3-4-5-6 plus isolated edge 10-11; seed at node 1
    val edges = df("a BIGINT, b BIGINT", Seq(
      R(1L, 2L), R(2L, 3L), R(3L, 4L), R(4L, 5L), R(5L, 6L), R(10L, 11L)))
    val seeds = df("node BIGINT", Seq(R(1L), R(99L))) // 99 not in graph
    val out = graft.llm.Graph.bfsLayers(edges, seeds, maxHops = 3)
      .orderBy(col("hop")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    // hops: 0→{1} 1→{2} 2→{3} 3→{4}; unreached: 5, 6, 10, 11
    assert(out.toSeq == Seq((-1, 4L), (0, 1L), (1, 1L), (2, 1L), (3, 1L)))
  }

  test("longestStreak: islands split on gaps, duplicates within a day collapse") {
    def d(n: Int) = new Timestamp(n * 86400000L)
    val e = df("event_id BIGINT, user_id BIGINT, ts TIMESTAMP", Seq(
      R(1L, 1L, d(0)), R(2L, 1L, d(0)),  // same day twice
      R(3L, 1L, d(1)), R(4L, 1L, d(2)),  // streak 0-2 (len 3)
      R(5L, 1L, d(5)), R(6L, 1L, d(6)),  // streak 5-6 (len 2)
      R(7L, 2L, d(10))))                 // single day
    val out = graft.operators.Behavior.longestStreak(e, "user_id", "ts")
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 5L, 2L, 3L), (2L, 1L, 1L, 1L)))
  }

  test("hits: the item bought by every customer tops the authorities") {
    val e = df("u BIGINT, i BIGINT", Seq(
      R(1L, 100L), R(2L, 100L), R(3L, 100L),  // 100 bought by all
      R(1L, 200L), R(2L, 200L),               // 200 by two
      R(3L, 300L)))                           // 300 by one
    val out = graft.llm.Graph.hits(e, iters = 2, k = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(out.head == ((1, 100L)))
    assert(out.map(_._2).toSeq == Seq(100L, 200L, 300L))
  }

  test("knBigramPerplexity: seen, backed-off, and OOV bigrams behave") {
    // train: "a b a b a c"; held out: "a b", "z b" (unseen ctx), "a q" (OOV)
    val docs = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "a b a b a c"),
      R(10L, "a b"), R(20L, "z b"), R(30L, "a q")))
    val out = TextAnalysis.knBigramPerplexity(docs, "doc_id", "text",
        col("doc_id") < 10, d = 0.75)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc10: "a b" seen → scored; doc20: ctx z unseen, backoff to
    // p_cont(b) > 0 → scored; doc30: continuation q unseen → p = 0, OOV
    assert(out.toSeq == Seq((10L, 1L, 1L), (20L, 1L, 1L), (30L, 1L, 0L)))
    // KN with D<1 must score the seen bigram better than the backoff
    val scored = TextAnalysis.knBigramPerplexity(docs, "doc_id", "text",
        col("doc_id") < 10).orderBy(col("doc_id")).collect()
    assert(scored(0).getDouble(3) < scored(1).getDouble(3))
  }

  test("corrPairs: perfect, anti, and degenerate correlations") {
    val d = df("x DOUBLE, y DOUBLE, z DOUBLE", Seq(
      R(1.0, 2.0, 5.0), R(2.0, 4.0, 5.0), R(3.0, 6.0, 5.0)))
    val out = graft.operators.Stats.corrPairs(d, Seq("x", "y", "z"))
      .orderBy(col("col_a"), col("col_b")).collect()
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(m(("x", "y")) == Some(1.0))   // y = 2x exactly
    assert(m(("x", "z")) == None)        // z constant: zero variance
    assert(m(("y", "z")) == None)
    val anti = df("x DOUBLE, y DOUBLE", Seq(R(1.0, 3.0), R(2.0, 2.0), R(3.0, 1.0)))
    assert(graft.operators.Stats.corrPairs(anti, Seq("x", "y"))
      .collect()(0).getDouble(3) == -1.0)
  }

  test("kaplanMeier: textbook small cohort with censoring") {
    // durations (obs): 1+, 2+, 2c, 3+ ; classic KM:
    // t=1: n=4 d=1 → S=0.75; t=2: n=3 d=1 c=1 → S=0.75·(2/3)=0.5
    // t=3: n=1 d=1 → S=0
    val d = df("dur BIGINT, obs BOOLEAN", Seq(
      R(1L, true), R(2L, true), R(2L, false), R(3L, true)))
    val out = graft.operators.Stats.kaplanMeier(d, "dur", "obs")
      .orderBy(col("dur")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.length == 3)
    assert(out(0) == ((1L, 4L, 1L, 0L, 0.75)))
    assert(out(1)._1 == 2L && out(1)._2 == 3L && out(1)._3 == 1L &&
      out(1)._4 == 1L && math.abs(out(1)._5 - 0.5) < 1e-6)
    assert(out(2) == ((3L, 1L, 1L, 0L, 0.0))) // d=n → exact zero, no ln(0)
  }

  test("eventuallyFollows: counts first-occurrence ordering per user") {
    val e = df("event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING",
      Seq(
        R(1L, 1L, ts(0), "a"), R(2L, 1L, ts(1), "b"), R(3L, 1L, ts(2), "a"),
        R(4L, 2L, ts(0), "b"), R(5L, 2L, ts(1), "a")))
    val out = graft.operators.Behavior.eventuallyFollows(e, "user_id", "ts",
        "event_type")
      .orderBy(col("a"), col("b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // user1: a<b; user2: b<a; the repeat 'a' at t2 must not flip anything
    assert(out.toSeq == Seq(("a", "b", 1L), ("b", "a", 1L)))
  }

  test("rollingMedian: warm-up frames and even/odd window medians") {
    val e = df("event_id BIGINT, user_id BIGINT, ts TIMESTAMP, value DOUBLE",
      Seq(R(1L, 1L, ts(0), 1.0), R(2L, 1L, ts(1), 9.0), R(3L, 1L, ts(2), 5.0),
        R(4L, 1L, ts(3), 3.0)))
    val out = graft.operators.Windows.rollingMedian(e, "user_id", "ts",
        "event_id", "value", lags = 2)
      .orderBy(col("event_id")).collect().map(_.getDouble(4))
    // frames: [1]→1; [1,9]→5; [1,9,5]→5; [9,5,3]→5
    assert(out.toSeq == Seq(1.0, 5.0, 5.0, 5.0))
  }

  test("dqFreshness: per-day max gap, day boundaries excluded") {
    val e = df("event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING",
      Seq(
        R(1L, 1L, ts(0), "a"), R(2L, 1L, ts(10), "a"), R(3L, 1L, ts(15), "a"),
        R(4L, 1L, ts(24 * 60 + 1), "a"), R(5L, 1L, ts(24 * 60 + 31), "a")))
    val out = graft.operators.Relational.dqFreshness(e, "ts", "event_id")
      .orderBy(col("day")).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((3L, 600L), (2L, 1800L)))
  }

  test("entropyKl: uniform two-token class has entropy ln 2; lone class has KL 0") {
    val docs = df("doc_id BIGINT, lang STRING, text STRING", Seq(
      R(1L, "en", "aa bb aa bb")))
    val r = TextAnalysis.entropyKl(docs, "lang", "text").collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 4L)
    assert(math.abs(r.getDouble(3) - math.log(2.0)) < 1e-6)
    assert(r.getDouble(4) == 0.0)
  }

  test("acf: alternating series has closed-form lags; constant series NULLs") {
    import spark.implicits._
    val n = 100
    // v_t = (-1)^t, mean 0 exactly (n even): r(l) = (-1)^l (n-l)/n
    val alt = (1 to n).map(i => ("a", i, i, if (i % 2 == 0) 1.0 else -1.0))
    val const = (1 to 10).map(i => ("c", i, i, 5.0))
    val short3 = Seq(("s", 1, 1, 1.0), ("s", 2, 2, 2.0), ("s", 3, 3, 6.0))
    val d = (alt ++ const ++ short3).toDF("g", "t", "id", "v")
    val out = Stats.acf(d, "g", "t", "id", "v", maxLag = 4).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    for (l <- 1 to 4) {
      val (np, acf) = out(("a", l))
      assert(np == n - l)
      val expect = math.pow(-1.0, l) * (n - l).toDouble / n
      assert(math.abs(acf.get - expect) < 1e-6,
        s"lag $l: ${acf.get} vs $expect")
    }
    // constant series: zero variance -> NULL acf, pairs still counted
    assert(out(("c", 1)) == ((9L, None)))
    // series shorter than the lag: zero pairs -> NULL acf
    assert(out(("s", 3))._2.isEmpty && out(("s", 3))._1 == 0L)
    assert(out(("s", 1))._2.nonEmpty)
    intercept[IllegalArgumentException] {
      Stats.acf(d, "g", "t", "id", "v", maxLag = 0)
    }
  }

  test("degenerate guards are exact: NON-DYADIC constants still yield NULL") {
    // 0.1 is binary-inexact: n·Σx² − (Σx)² leaves a tiny positive double
    // residue on a constant column, which a `var > 0` guard would pass —
    // emitting a slope/z/corr made of rounding noise. The min<max guards
    // must return the documented NULLs instead.
    val ols = Stats.groupedOls(
      df("g STRING, x DOUBLE, y DOUBLE",
        Seq(R("g", 0.1, 1.0), R("g", 0.1, 2.0), R("g", 0.1, 3.0))),
      "g", "x", "y").collect()(0)
    assert(ols.isNullAt(2) && ols.isNullAt(3) && ols.isNullAt(4))
    val z = Stats.abWelchZ(
      df("g STRING, arm INT, v DOUBLE",
        Seq(R("g", 0, 0.1), R("g", 0, 0.1), R("g", 1, 0.3), R("g", 1, 0.3))),
      "g", "arm", "v").collect()(0)
    assert(z.isNullAt(5), s"constant arms must give NULL z, got $z")
    val corr = Stats.corrPairs(
      df("a DOUBLE, b DOUBLE",
        Seq(R(0.1, 1.0), R(0.1, 2.0), R(0.1, 3.0))), Seq("a", "b"))
      .collect()(0)
    assert(corr.isNullAt(3))
    val acf1 = Stats.acf(
      df("g STRING, t INT, id INT, v DOUBLE",
        Seq(R("g", 1, 1, 0.1), R("g", 2, 2, 0.1), R("g", 3, 3, 0.1))),
      "g", "t", "id", "v", maxLag = 1).collect()(0)
    assert(acf1.isNullAt(3))
  }

  test("corrPairs works for underscore-bearing column names (alias collision)") {
    // pairs (x, y_z) and (x_y, z) would both alias sp_x_y_z under
    // name-concatenation; positional aliases must keep them distinct
    val out = Stats.corrPairs(
      df("x DOUBLE, y_z DOUBLE, x_y DOUBLE, z DOUBLE",
        Seq(R(1.0, 2.0, 3.0, 4.0), R(2.0, 4.0, 5.0, 1.0),
          R(3.0, 6.0, 7.0, -2.0))),
      Seq("x", "y_z", "x_y", "z")).collect()
    assert(out.length == 6)
    val m = out.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(m(("x", "y_z")) == 1.0)   // y_z = 2x exactly
    assert(m(("x_y", "z")) == -1.0)  // z = -linear in x_y
  }
}
