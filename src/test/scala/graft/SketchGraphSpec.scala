package graft

import org.apache.spark.sql.functions._

import graft.llm.{Graph, WordPiece}
import graft.operators.Sketch

/** Round-8 widening: count-min sketch, TextRank, WordPiece greedy encode. */
class SketchGraphSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.toDF("text")
  }

  test("cmsTopK: estimate is an upper bound on the exact count, top-k ordered") {
    val corpus = docs(
      "alpha alpha alpha beta beta gamma",
      "alpha beta delta epsilon",
      "zeta eta theta iota kappa")
    val out = Sketch.cmsTopK(corpus, "text", d = 3, width = 256, k = 10).collect()
    assert(out.nonEmpty && out.length <= 10)
    out.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"),
        s"CMS must never underestimate: $r")
    }
    // exact counts are small and the stream is tiny: with width 256 the
    // heavy hitter is recovered exactly at rank 1
    val first = out.head
    assert(first.getAs[Int]("rank") == 1)
    assert(first.getAs[String]("tok") == "alpha")
    assert(first.getAs[Long]("exact_cnt") == 4L)
    // ranks are contiguous and est-descending
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to out.length))
    val ests = out.map(_.getAs[Long]("est_cnt")).toSeq
    assert(ests == ests.sorted.reverse)
  }

  test("cmsTopK: tiny width forces collisions but never drops below exact") {
    val corpus = docs("a b c d e f g h i j k l m n o p q r s t u v w x y z")
    val out = Sketch.cmsTopK(corpus, "text", d = 2, width = 4, k = 26).collect()
    assert(out.length == 26)
    // 26 singletons into 2×4 cells: pigeonhole guarantees inflated cells
    assert(out.exists(r => r.getAs[Long]("est_cnt") > r.getAs[Long]("exact_cnt")))
    out.foreach(r => assert(r.getAs[Long]("est_cnt") >= 1L))
  }

  test("textRank: hub token outranks leaves; rank mass is conserved") {
    // star graph: hub adjacent to every leaf -> hub collects the leaves'
    // full contribution each iteration and must rank first
    val corpus = docs("hub l1", "hub l2", "hub l3", "hub l4", "l5 hub")
    val out = Graph.textRank(corpus, "text", iters = 3, k = 10).collect()
    assert(out.head.getAs[String]("tok") == "hub")
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.head > scores.tail.max * 2,
      s"hub should dominate the leaves: ${scores.mkString(",")}")
    // fixed point conservation: with row-normalized out-weights the total
    // rank stays at |V| (up to the per-step rounding)
    assert(math.abs(scores.sum - 6.0) < 1e-3, s"sum ${scores.sum}")
  }

  test("textRank: path-graph stationary ordering and symmetry") {
    // path graph a-b-c-d-e. The endpoint neighbors b/d receive the
    // endpoints' FULL contribution (a and e have out-degree 1) plus half
    // of c's, while c receives only halves — so b = d > c > a = e is the
    // correct ordering, NOT a center peak.
    val corpus = docs("a b c d e")
    val out = Graph.textRank(corpus, "text", iters = 3, k = 5)
      .collect().map(r => r.getAs[String]("tok") -> r.getAs[Double]("score")).toMap
    assert(out("b") > out("c") && out("d") > out("c"))
    assert(out("c") > out("a") && out("c") > out("e"))
    // symmetry of the path graph: b/d and a/e are automorphic pairs
    assert(math.abs(out("b") - out("d")) < 1e-9)
    assert(math.abs(out("a") - out("e")) < 1e-9)
  }

  test("bloomPrune: no false negatives ever; tiny filters do false-positive") {
    import spark.implicits._
    val build = (1 to 40).map(i => s"key$i").toDF("k")
    val probe = (21 to 80).map(i => s"key$i").toDF("k")
    val out = Sketch.bloomPrune(build, "k", probe, "k", mBits = 16, d = 2)
      .collect()
    assert(out.length == 60)
    out.foreach { r =>
      if (r.getAs[Boolean]("is_member"))
        assert(r.getAs[Boolean]("maybe_member"),
          s"false negative is a contract violation: $r")
    }
    // 40 keys × 2 bits into 16 cells: the filter is saturated, so some
    // non-member must collide into a false positive
    assert(out.exists(r =>
      r.getAs[Boolean]("maybe_member") && !r.getAs[Boolean]("is_member")))
    // a roomy filter keeps the same members and sheds the false positives
    val roomy = Sketch.bloomPrune(build, "k", probe, "k", mBits = 65536, d = 3)
      .collect()
    roomy.foreach { r =>
      assert(r.getAs[Boolean]("maybe_member") == r.getAs[Boolean]("is_member"), r.toString)
    }
  }

  test("bloomPrune: member keys whose d hashes collide mod mBits are still found") {
    import spark.implicits._
    // mBits = 4 with d = 3 forces position collisions on most keys: a
    // member with only 1-2 distinct positions must still be maybe_member
    // (the verdict compares against the key's OWN distinct-position count,
    // not the literal d — comparing to d was a false negative exactly here)
    val keys = (1 to 200).map(i => s"ck$i").toDF("k")
    val out = Sketch.bloomPrune(keys, "k", keys, "k", mBits = 4, d = 3)
      .collect()
    assert(out.length == 200)
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_member"))
      assert(r.getAs[Boolean]("maybe_member"),
        s"false negative under position collision: $r")
    }
  }

  test("hllDistinct: small register counts (m = 16, 32) estimate correctly") {
    import spark.implicits._
    // the rank constant must move with m (suffix width 60 − log2 m): a
    // 55-hardcode understates every m = 16 register by 2 and the estimate
    // by ~4× — these bounds catch any constant/scale mismatch
    val df = (1 to 2000).map(i => ("g", s"v${i % 500}")).toDF("g", "v")
    Seq(16, 32).foreach { m =>
      val r = Sketch.hllDistinct(df, "g", "v", m = m).collect()(0)
      val est = r.getAs[Double]("est_distinct")
      // std error 1.04/√m (26 % at m=16); allow ~3σ
      assert(math.abs(est - 500.0) <= 0.8 * 500.0,
        s"m=$m estimate $est too far from 500")
    }
  }

  test("hllDistinct: estimate lands near truth and never needs the exact pass") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"v${i % (250 * (i % 3 + 1))}"))
      .toDF("g", "v")
    val out = Sketch.hllDistinct(df, "g", "v", m = 64).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct")
      // m = 64 → theoretical std error 1.04/√64 ≈ 13 %; allow 3σ
      assert(math.abs(est - exact) <= 0.4 * exact + 10,
        s"HLL estimate $est too far from exact $exact: $r")
    }
    intercept[IllegalArgumentException] {
      Sketch.hllDistinct(df, "g", "v", m = 48)
    }
  }

  test("wordpiece encode: greedy longest-match-first with ## continuations") {
    // 'under' and 'stand' both frequent enough to enter the vocabulary as
    // start pieces isn't possible for 'stand' mid-word: continuation
    // pieces are tracked separately (here 4-char max pieces)
    val corpus = docs(
      Seq.fill(5)("unde rsta nd").mkString(" "),
      Seq.fill(5)("understa").mkString(" "))
    val out = WordPiece.encode(corpus, "text", maxPiece = 4, maxLen = 8,
      minCount = 3L).collect()
      .map(r => r.getAs[String]("word") -> r).toMap
    val u = out("understa")
    assert(!u.getAs[Boolean]("is_unk"))
    // greedy takes the longest start piece first: "unde" (seen 5× as a
    // word => its prefixes/substrings counted), then continuations
    val seg = u.getAs[String]("seg")
    assert(seg.startsWith("unde"), seg)
    assert(seg.split('|').tail.forall(_.startsWith("##")), seg)
    assert(u.getAs[Int]("n_pieces") == seg.split('|').length)
  }

  test("wordpiece encode: unmatchable words surface as UNK, not dropped") {
    // 'qqq' appears twice < minCount 3, and no other word shares its
    // characters, so no piece of it enters the vocabulary
    val corpus = docs(
      Seq.fill(4)("solid").mkString(" ") + " qqq qqq")
    val out = WordPiece.encode(corpus, "text", maxPiece = 4, maxLen = 8,
      minCount = 3L).collect()
      .map(r => r.getAs[String]("word") -> r).toMap
    assert(out.contains("qqq"), "UNK words must still be output rows")
    val q = out("qqq")
    assert(q.getAs[Boolean]("is_unk"))
    assert(q.isNullAt(q.fieldIndex("seg")))
    assert(q.isNullAt(q.fieldIndex("n_pieces")))
    assert(!out("solid").getAs[Boolean]("is_unk"))
    assert(out("solid").getAs[Long]("freq") == 4L)
  }

  test("kmvSetOps: sketches smaller than k degrade to exact counts") {
    import spark.implicits._
    // 30 distinct keys per side, overlap 10 — with k = 256 every sketch
    // holds its whole domain, so all four estimates must equal truth
    val l = (0 until 30).toDF("id")
    val r = (20 until 50).toDF("id")
    val out = Sketch.kmvSetOps(l, r, "id", k = 256).collect()
      .map(row => row.getAs[String]("side") -> row).toMap
    assert(out.keySet == Set("left", "right", "union", "intersect"))
    assert(out("left").getAs[Double]("est_distinct") == 30.0)
    assert(out("left").getAs[Long]("exact_distinct") == 30L)
    assert(out("right").getAs[Double]("est_distinct") == 30.0)
    assert(out("union").getAs[Double]("est_distinct") == 50.0)
    assert(out("union").getAs[Long]("exact_distinct") == 50L)
    assert(out("intersect").getAs[Double]("est_distinct") == 10.0)
    assert(out("intersect").getAs[Long]("exact_distinct") == 10L)
  }

  test("kmvSetOps: k-bounded sketches estimate within the 3/sqrt(k) band") {
    import spark.implicits._
    val k = 64
    val l = (0 until 3000).toDF("id")
    val r = (1000 until 4000).toDF("id")
    val out = Sketch.kmvSetOps(l, r, "id", k = k).collect()
      .map(row => row.getAs[String]("side") -> row).toMap
    for (side <- Seq("left", "right", "union")) {
      val row = out(side)
      assert(row.getAs[Long]("n_sketch") == k.toLong, s"$side sketch not full")
      val est = row.getAs[Double]("est_distinct")
      val exact = row.getAs[Long]("exact_distinct").toDouble
      val relErr = math.abs(est - exact) / exact
      assert(relErr <= 3.0 / math.sqrt(k),
        s"$side: est $est vs exact $exact (relErr $relErr)")
    }
    // the intersection estimate inherits union noise; allow a wider band
    val i = out("intersect")
    val relErr = math.abs(i.getAs[Double]("est_distinct") - 2000.0) / 2000.0
    assert(relErr <= 6.0 / math.sqrt(k), s"intersect off: $i")
  }

  test("triangleCount: counts a known graph exactly") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, every vertex in 3) plus a pendant
    // edge 4-5 (vertex 5 in no triangle)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = Graph.triangleCount(edges, k = 10).collect()
    val byNode = out.map(r => r.getAs[Long]("part") -> r.getAs[Long]("n_triangles")).toMap
    assert(byNode == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4 credits each corner 3 triangles, pendant none: $byNode")
    // total triangle count: each triangle credits 3 corners
    assert(byNode.values.sum == 3 * 4)
  }

  test("labelPropagation: two cliques joined by a bridge resolve to two communities") {
    import spark.implicits._
    // K3 {1,2,3} + K3 {10,11,12} + bridge 3-10: labels collapse to each
    // clique's minimum; the bridge endpoints keep their clique majority
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("a", "b")
    val out = Graph.labelPropagation(edges, iters = 3, k = 10).collect()
      .map(r => r.getAs[Long]("community") -> r.getAs[Long]("size")).toMap
    assert(out.values.sum == 6L, s"every node belongs somewhere: $out")
    assert(out.size == 2, s"expected exactly two communities: $out")
    assert(out.keySet.min == 1L, s"min-label tie-break anchors at 1: $out")
  }

  test("labelPropagation: deterministic across input row order") {
    import spark.implicits._
    val edges = (for (i <- 1L to 30L) yield (i, i % 7 + 100L)).toDF("a", "b")
    val a = Graph.labelPropagation(edges, iters = 3, k = 50).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("community"), r.getAs[Long]("size"))).toSeq
    val b = Graph.labelPropagation(edges.orderBy(col("a").desc), iters = 3, k = 50)
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("community"), r.getAs[Long]("size"))).toSeq
    assert(a == b)
  }

  test("associationRules: known baskets produce the textbook measures") {
    import spark.implicits._
    // 4 baskets: {m,b}, {m,b}, {m,e}, {b}  (m=milk, b=bread, e=eggs)
    val d = Seq((1L, "m"), (1L, "b"), (2L, "m"), (2L, "b"),
      (3L, "m"), (3L, "e"), (4L, "b")).toDF("ok", "item")
    val out = Graph.associationRules(d, "ok", "item", minCount = 1L, k = 10)
      .collect().map(r => (r.getAs[String]("ante"), r.getAs[String]("cons")) -> r).toMap
    // m→b: n_ab=2, support 2/4, confidence 2/3, lift 2·4/(3·3)
    val mb = out(("m", "b"))
    assert(mb.getAs[Long]("n_ab") == 2L)
    assert(mb.getAs[Double]("support") == 0.5)
    assert(mb.getAs[Double]("confidence") == 0.666667)
    assert(mb.getAs[Double]("lift") == 0.888889)
    // b→m mirrors the count but not the confidence (3 bread baskets)
    assert(out(("b", "m")).getAs[Double]("confidence") == 0.666667)
    // m→e and e→m tie on lift 1·4/(3·1) = 1.333333 — the (ante, cons)
    // tie-break puts e→m first
    assert(out(("m", "e")).getAs[Double]("lift") == 1.333333)
    assert(out(("e", "m")).getAs[Int]("rank") == 1)
    assert(out(("m", "e")).getAs[Int]("rank") == 2)
    // duplicate items within one basket must not inflate counts
    val dup = d.unionAll(Seq((1L, "m")).toDF("ok", "item"))
    assert(Graph.associationRules(dup, "ok", "item", 1L, 10)
      .filter(col("ante") === "m" && col("cons") === "b")
      .head().getAs[Long]("n_ab") == 2L)
  }

  test("triangleCount: triangle-free bipartite graph yields no rows") {
    import spark.implicits._
    // K2,3: plenty of wedges, zero triangles
    val edges = (for (a <- Seq(1L, 2L); b <- Seq(10L, 11L, 12L))
      yield (a, b)).toDF("a", "b")
    assert(Graph.triangleCount(edges, k = 10).collect().isEmpty)
  }

  test("histQuantiles: estimate within the hit bin of the true rank") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // skewed values across many sqrt bins, two groups
    val d = (1 to 1000).map(i => ("a", (i * i % 997).toDouble)) ++
      (1 to 500).map(i => ("b", (i % 30).toDouble))
    val df = d.toDF("g", "v")
    val est = graft.operators.Sketch.histQuantiles(df, "g", "v",
        Seq(0.5, 0.9, 0.99)).collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = d.groupBy(_._1).map { case (g, rows) =>
      val vs = rows.map(_._2).sorted
      g -> Map(0.5 -> vs(math.ceil(0.5 * vs.size).toInt - 1),
        0.9 -> vs(math.ceil(0.9 * vs.size).toInt - 1),
        0.99 -> vs(math.ceil(0.99 * vs.size).toInt - 1))
    }
    for (g <- Seq("a", "b"); p <- Seq(0.5, 0.9, 0.99)) {
      val (e, lo, hi) = est((g, p))
      val x = exact(g)(p)
      assert(x >= lo && x < hi, s"$g p=$p: exact $x outside hit bin [$lo,$hi)")
      assert(math.abs(e - x) <= hi - lo,
        s"$g p=$p: |$e - $x| exceeds bin width ${hi - lo}")
    }
    // a whole group inside ONE bin resolves exactly to that bin's span
    val one = Seq(("c", 10.1), ("c", 10.2), ("c", 10.3)).toDF("g", "v")
    val r = graft.operators.Sketch.histQuantiles(one, "g", "v", Seq(0.5))
      .head()
    assert(r.getDouble(3) <= 10.1 && r.getDouble(4) > 10.3,
      "single-bin group must hit the covering bin")
  }

  test("histQuantiles: out-of-domain inputs clamp/skip instead of crashing") {
    import spark.implicits._
    // 1e18 would overflow the int bin cast if clamping ran after the
    // narrowing; Double.MaxValue would overflow even a long floor. Both
    // must clamp into the top bin and raise the saturation flag.
    val d = Seq(("a", 1.0), ("a", 4.0), ("a", 1e18),
      ("a", Double.MaxValue), ("a", Double.NaN), ("a", -3.0),
      ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val out = graft.operators.Sketch.histQuantiles(d, "g", "v",
        Seq(0.5, 1.0)).collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getDouble(4), r.getBoolean(5))).toMap
    // group a: NaN and -3.0 skipped -> n=4; p=1.0 hits the clamp bin
    val (estTop, hiTop, satA) = out(("a", 1.0))
    assert(satA, "clamped values must set saturated")
    assert(hiTop === 1024.0 && estTop <= 1024.0,
      s"top-bin estimate stays at the domain edge, got $estTop / $hiTop")
    // median of (1, 4, 1e18, MaxValue) is rank 2 -> 4.0's bin, in-domain
    val (estMed, _, _) = out(("a", 0.5))
    assert(estMed < 16.0, s"median must resolve below 4.0's bin edge: $estMed")
    // group b has no clamped values -> saturated false
    assert(!out(("b", 0.5))._3 && !out(("b", 1.0))._3)
    // shape guards fail fast instead of emitting bin -1 garbage
    intercept[IllegalArgumentException] {
      graft.operators.Sketch.histQuantiles(d, "g", "v", Seq(0.5), bins = 0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Sketch.histQuantiles(d, "g", "v", Seq(0.5),
        binsPerUnit = 0.0)
    }
  }
}
