package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Agg, Windows}
import graft.llm.Dedup

/** Property tests for the algebraic operators (SURVEY §5): aggregation
  * identities, sessionization invariants, Jaccard bounds, quantile-map
  * monotonicity. Spark jobs per case are expensive, so generators are small
  * and minSuccessful is kept low — the properties, not the sample count,
  * carry the value.
  */
class PropertiesSpec extends SparkSpec {

  /** scalatestplus is not in the offline cache, so drive scalacheck Gens
    * directly with fixed seeds — deterministic and dependency-free.
    */
  private def forAll[A](gen: Gen[A], cases: Int = 5)(body: A => Unit): Unit =
    (1 to cases).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    (1 to 5).foreach { i =>
      body(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
           gb.pureApply(Gen.Parameters.default, Seed(i.toLong + 100)))
    }

  private val values = Gen.nonEmptyListOf(Gen.choose(0.0, 60.0))

  test("property: dB-mean ≥ arithmetic mean (Jensen, convex 10^(x/10))") {
    forAll(values) { vs =>
      val d = df("v DOUBLE", vs.map(R(_)))
      val row = d.agg(Agg.dbMean(col("v")).as("db"), avg(col("v")).as("m"))
        .collect().head
      assert(row.getDouble(0) >= row.getDouble(1) - 1e-9)
    }
  }

  test("property: weighted mean with equal weights = plain mean") {
    forAll(values) { vs =>
      val d = df("g INT, f DOUBLE", vs.map(v => R(1, v)))
      val wm = Agg.weightedMean(d, Seq("g"), lit(7.0), Seq("f"))
        .collect().head.getDouble(1)
      val m = vs.sum / vs.length
      assert(math.abs(wm - m) < 1e-9)
    }
  }

  test("property: sessionize produces contiguous ids starting at 1, count = gaps + 1") {
    val gaps = Gen.listOfN(6, Gen.choose(1L, 5000L))
    forAll(gaps) { deltas =>
      val times = deltas.scanLeft(1699999200L)(_ + _)
      val d = df("u STRING, ts TIMESTAMP",
        times.map(t => R("u", new java.sql.Timestamp(t * 1000))))
      val sessions = Windows.sessionize(d, "u", "ts", 1800L)
        .select("session_id").collect().map(_.getLong(0))
      val expected = 1 + deltas.count(_ > 1800L)
      assert(sessions.max == expected)
      assert(sessions.min == 1)
      assert(sessions.toSet == (1L to expected).toSet)
    }
  }

  test("property: jaccard pairs are within (0, 1] and symmetric in the pair key") {
    val words = Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
    forAll2(words, words) { (w1, w2) =>
      val d = df("doc_id BIGINT, text STRING",
        Seq(R(1L, w1.mkString(" ")), R(2L, w2.mkString(" "))))
      val pairs = Dedup.jaccardPairs(d, "doc_id", "text", n = 2, minJaccard = 0.0)
        .collect()
      pairs.foreach { r =>
        assert(r.getLong(0) < r.getLong(1)) // canonical ordering
        val j = r.getDouble(2)
        assert(j > 0.0 && j <= 1.0)
      }
    }
  }

  test("property: weighted quantile is monotone in q and bounded by the data") {
    import spark.implicits._
    forAll(values) { vs =>
      val ds = vs.map(v => (v, 1.0 + v % 3)).toDS()
      val qs = Seq(0.1, 0.5, 0.9).map { q =>
        ds.select(new graft.functions.Aggregators.WeightedQuantile(q).toColumn)
          .collect().head
      }
      assert(qs(0) <= qs(1) && qs(1) <= qs(2))
      assert(qs(0) >= vs.min && qs(2) <= vs.max)
    }
  }

  test("property: quantizeInt8 codes bounded by ±127, reconstruction within scale/2") {
    val vecs = Gen.listOfN(8, Gen.choose(-100.0f, 100.0f))
    forAll(vecs, cases = 8) { xs =>
      val d = df("id BIGINT, v ARRAY<FLOAT>", Seq(R(1L, xs)))
      val r = graft.llm.Similarity.quantizeInt8(d, "id", "v").collect().head
      val scale = r.getDouble(1)
      val q = r.getSeq[Int](2)
      assert(q.forall(c => c >= -127 && c <= 127), s"codes $q")
      q.zip(xs).foreach { case (c, x) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-9,
          s"x=$x code=$c scale=$scale")
      }
    }
  }

  test("property: windowDupStats — fraction in [0,1], dups ≤ windows, copies fully flagged") {
    val words = Gen.listOfN(10, Gen.oneOf("a", "b", "c", "d", "e"))
    forAll2(words, words) { (w1, w2) =>
      // docs 1 and 3 are copies: every window of theirs must flag
      val d = df("doc_id BIGINT, text STRING", Seq(
        R(1L, w1.mkString(" ")), R(2L, w2.mkString(" ")), R(3L, w1.mkString(" "))))
      val out = Dedup.windowDupStats(d, "doc_id", "text", n = 3).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      out.values.foreach { case (nw, nd, f) =>
        assert(nd <= nw && f >= 0.0 && f <= 1.0, out)
      }
      assert(out(1L) == out(3L))
      assert(out(1L)._1 == 0 || out(1L)._3 == 1.0, out) // verbatim copy ⇒ all dup
    }
  }

  test("property: simhash of a doc equals simhash of itself shuffled (order-free)") {
    val words = Gen.listOfN(10, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    forAll(words) { ws =>
      val d = df("doc_id BIGINT, text STRING",
        Seq(R(1L, ws.mkString(" ")), R(2L, ws.reverse.mkString(" "))))
      val out = Dedup.simhash16(d, "doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(out(1L) == out(2L))
    }
  }

  test("property: zorderKey is a decodable bijection on the bucket grid") {
    val pairs = Gen.listOfN(40, for {
      x <- Gen.choose(0L, 31L); y <- Gen.choose(0L, 31L)
    } yield (x, y))
    forAll(pairs) { ps =>
      val uniq = ps.distinct
      val d = df("x BIGINT, y BIGINT", uniq.map { case (x, y) => R(x, y) })
      val rows = d.select(col("x"), col("y"),
          graft.functions.Layout.zorderKey(Seq(col("x"), col("y")), 5).as("z"))
        .collect()
      assert(rows.map(_.getLong(2)).distinct.length == uniq.length)
      rows.foreach { r =>
        val z = r.getLong(2)
        def de(off: Int): Long =
          (0 until 5).map(b => ((z >> (2 * b + off)) & 1L) << b).sum
        assert(de(0) == r.getLong(0) && de(1) == r.getLong(1))
      }
    }
  }

  test("property: prefix filtering is lossless vs the uncapped inverted index") {
    // heavy-overlap corpora (tiny vocabulary) and NON-DYADIC thresholds —
    // 0.3/0.7 have inexact binary τ·|d| products, exactly the case the
    // retain-only ceil slack in prefixJaccardPairs guards
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val docGen = Gen.listOfN(8,
      Gen.choose(5, 12).flatMap(len =>
        Gen.listOfN(len, Gen.choose(0, vocab.length - 1))))
    forAll(docGen, cases = 3) { docs =>
      val d = df("doc_id BIGINT, text STRING",
        docs.zipWithIndex.map { case (ws, i) =>
          R(i.toLong, ws.map(vocab).mkString(" "))
        })
      Seq(0.3, 0.7).foreach { tau =>
        val byPrefix = Dedup.prefixJaccardPairs(d, "doc_id", "text",
            n = 2, minJaccard = tau)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val exact = Dedup.jaccardPairs(d, "doc_id", "text",
            n = 2, minJaccard = tau, maxDf = 1000000)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(byPrefix == exact,
          s"tau=$tau: ${exact.diff(byPrefix)} missing, ${byPrefix.diff(exact)} extra")
      }
    }
  }

  test("property: ewma stays inside its trailing window's value range") {
    val vals = Gen.listOfN(12, Gen.choose(-50.0, 50.0))
    forAll(vals) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) =>
        R(i.toLong, 1L, new java.sql.Timestamp(i * 1000L), "t", v)
      }
      val d = df(
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE",
        rows)
      val out = graft.operators.Behavior
        .ewma(d, "user_id", "ts", "event_id", "value", alpha = 0.5, lags = 8)
        .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
      vs.indices.foreach { i =>
        val win = vs.slice(math.max(0, i - 7), i + 1)
        assert(out(i.toLong) >= win.min - 1e-6 && out(i.toLong) <= win.max + 1e-6,
          s"row $i: ${out(i.toLong)} outside [${win.min}, ${win.max}]")
      }
    }
  }

  test("property: both as-of joins equal brute force on random data with ties") {
    import graft.operators.AsOf
    import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}
    val prev = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = prev :+ AsOfJoinStrategy
    try {
      // tiny domains on purpose: key ∈ {a,b}, ts ∈ 0..6 s — collisions and
      // exact (key, ts) ties are near-certain, exercising the tie contract
      val side = Gen.nonEmptyListOf(Gen.zip(
        Gen.oneOf("a", "b"), Gen.choose(0, 6), Gen.choose(0.0, 9.0)))
      forAll2(side, side) { (ls, rs) =>
        val lrows = ls.zipWithIndex.map { case ((k, t, _), i) =>
          R(i.toLong, k, new java.sql.Timestamp(t * 1000L)) }
        val left = df("lid BIGINT, k STRING, ts TIMESTAMP", lrows)
        val right = df("k STRING, ts TIMESTAMP, v DOUBLE",
          rs.map { case (k, t, v) => R(k, new java.sql.Timestamp(t * 1000L), v) })
          .repartition(3) // only the contract may decide tie winners
        // brute force: latest right ts <= left ts per key; max v on ties
        val expect = ls.zipWithIndex.map { case ((k, t, _), i) =>
          val cand = rs.filter(r => r._1 == k && r._2 <= t)
          i.toLong -> (if (cand.isEmpty) None
                       else { val mt = cand.map(_._2).max
                              Some(cand.filter(_._2 == mt).map(_._3).max) })
        }.toMap
        val composed = AsOf.asofJoin(left, right, "k", "ts", Seq("v"))
          .select(col("lid"), col("v"))
          .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
        assert(composed == expect, "asofJoin != brute force")
        val exec = AsOfJoinPlan.asofJoinExec(left, right, "k", "ts")
          .select(col("lid"), col("v_r"))
          .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
        assert(exec == expect, "AsOfJoinExec != brute force")
      }
    } finally spark.experimental.extraStrategies = prev
  }

  test("property: histQuantiles honors its a-priori bin-width error bound") {
    import graft.operators.Sketch
    val vals = Gen.nonEmptyListOf(Gen.choose(0.0, 50.0)) // < (128/4)² → unsaturated
    val ps = Seq(0.25, 0.5, 0.9, 1.0)
    forAll(vals) { vs =>
      val d = df("g STRING, v DOUBLE", vs.map(R("g", _)))
      val out = Sketch.histQuantiles(d, "g", "v", ps)
        .collect().map(r => (r.getDouble(1),
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
      val sorted = vs.sorted
      ps.foreach { p =>
        val (est, lo, hi, sat) = out(p)
        assert(!sat)
        val exact = sorted(math.ceil(p * vs.size).toInt - 1) // lower order stat
        assert(exact >= lo - 1e-9 && exact <= hi + 1e-9,
          s"p=$p: exact $exact outside hit bin [$lo, $hi]")
        assert(math.abs(est - exact) <= (hi - lo) + 1e-9,
          s"p=$p: |$est - $exact| > bin width ${hi - lo}")
      }
    }
  }

  test("property: saltedJoin equals the plain join on skewed random data") {
    import graft.operators.Relational
    val rows = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("hot", "hot", "hot", "a", "b"), Gen.choose(0, 99)))
    forAll2(rows, rows) { (ls, rs) =>
      val left = df("k STRING, lv INT", ls.map { case (k, v) => R(k, v) })
      val right = df("k STRING, rv INT", rs.map { case (k, v) => R(k, v) })
      Seq("inner", "left", "left_semi", "left_anti").foreach { jt =>
        val plain = left.join(right, Seq("k"), jt)
          .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
        val salted = Relational.saltedJoin(left, right, Seq("k"), nSalts = 3, jt)
          .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
        assert(salted == plain, s"joinType=$jt")
      }
    }
  }

  test("property: wordpiece segments reassemble to the word unless [UNK]") {
    val docs = Core.table(spark, "/root/testdata/sf0.001", "documents")
    val out = graft.llm.WordPiece.encode(docs, "text").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val word = r.getString(0)
      if (!r.getBoolean(2)) {
        val seg = r.getString(4)
        val rebuilt = seg.split('|').map(_.stripPrefix("##")).mkString
        assert(rebuilt == word, s"$seg !~ $word")
        assert(r.getInt(3) == seg.split('|').length)
      }
    }
  }

  test("property: interpolateJoin is exact at anchors and linear between them") {
    import graft.operators.AsOf
    val anchorVals = Gen.listOfN(4, Gen.choose(-10.0, 10.0))
    forAll(anchorVals) { vs =>
      val hourly = df("k STRING, h BIGINT, v DOUBLE",
        vs.zipWithIndex.map { case (v, i) => R("s", 1699999200L + 3600L * i, v) })
      // probe exactly at anchors and at half past each hour
      val probes = (0 until vs.size).flatMap(i =>
        Seq(1699999200L + 3600L * i, 1699999200L + 3600L * i + 1800L))
      val pts = df("k STRING, ts TIMESTAMP",
        probes.map(t => R("s", new java.sql.Timestamp(t * 1000L))))
      val out = AsOf.interpolateJoin(pts, hourly, "k", "ts", "h", "v")
        .collect().map(r => (r.getTimestamp(1).getTime / 1000L, r.getDouble(2))).toMap
      vs.indices.foreach { i =>
        val t0 = 1699999200L + 3600L * i
        assert(math.abs(out(t0) - vs(i)) < 1e-9, s"anchor $i")
        val expectedMid =
          if (i + 1 < vs.size) (vs(i) + vs(i + 1)) / 2.0 // linear midpoint
          else vs(i)                                     // one-sided: coalesce
        assert(math.abs(out(t0 + 1800L) - expectedMid) < 1e-9, s"mid $i")
      }
    }
  }

  test("property: packSequences offsets are a contiguous exact tiling per shard") {
    import graft.llm.Curation
    val docs = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf(0, 1), Gen.choose(1, 9)))
    forAll(docs) { ds =>
      val rows = ds.zipWithIndex.map { case ((shard, nWords), i) =>
        R(i.toLong, s"s$shard", Seq.fill(nWords)("w").mkString(" "))
      }
      val d = df("doc_id BIGINT, shard STRING, text STRING", rows)
      val out = Curation.packSequences(d, "doc_id", "text", "shard", maxTokens = 5)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      // per shard in id order: start offsets are the exact running sum,
      // and bin/off_in_bin are its div/mod by maxTokens
      out.groupBy(_._1).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._2)
        var cum = 0L
        sorted.foreach { case (_, _, nTok, start, bin, off) =>
          assert(start == cum, s"start $start != cum $cum")
          assert(bin == start / 5 && off == start % 5)
          cum += nTok
        }
      }
    }
  }

  test("property: cdcScd2 equals a sequential fold of the changelog") {
    import graft.operators.Relational
    // random op streams over 2 keys: collisions, re-inserts after deletes,
    // consecutive tombstones, null-valued updates all arise by volume
    val opsGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf(1L, 2L), Gen.oneOf("I", "U", "D"),
      Gen.oneOf("gold", "silver", null: String)))
    forAll(opsGen) { raw =>
      val ops = raw.zipWithIndex.map { case ((k, op, attr), i) =>
        (k, i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L),
         if (op == "D") null else attr, op)
      }
      val d = df("uid BIGINT, eid BIGINT, ts TIMESTAMP, tier STRING, op STRING",
        ops.map { case (k, e, t, a, o) => R(k, e, t, a, o) })
      val got = Relational.cdcScd2(d, "uid", "tier", "ts", "eid", "op")
        .collect().map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2)),
          r.getTimestamp(3), Option(r.getTimestamp(4)))).toSet

      // driver fold: per key in (ts, eid) order, (alive, attr) change points
      // open/close intervals; alive boundaries become versions
      val expect = ops.groupBy(_._1).flatMap { case (k, rows) =>
        val sorted = rows.sortBy(r => (r._3.getTime, r._2))
        val states = sorted.map(r => (r._3, r._5 != "D",
          if (r._5 == "D") None else Option(r._4)))
        val bounds = states.zipWithIndex.filter { case ((_, al, at), i) =>
          i == 0 || (al, at) != (states(i - 1)._2, states(i - 1)._3) }
        val withTo = bounds.zipWithIndex.map { case (((t, al, at), _), bi) =>
          (t, al, at, bounds.lift(bi + 1).map(_._1._1)) }
        withTo.filter(_._2).zipWithIndex.map { case ((t, _, at, to), vi) =>
          (k, vi + 1, at, t, to) }
      }.toSet
      assert(got == expect, s"ops=$ops")
    }
  }

  test("property: the MinHash bucket cap is the identity when no bucket exceeds it") {
    // random small corpora with duplicated sentences: bucket populations
    // stay far below the cap, so the capped pipeline must equal the
    // effectively-uncapped one pair for pair (the flood spec covers the
    // firing case; this pins that a non-firing cap changes NOTHING)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docGen = Gen.nonEmptyListOf(
      Gen.listOfN(8, Gen.oneOf(words)).map(_.mkString(" ")))
    forAll(docGen, cases = 3) { texts =>
      val d = df("doc_id BIGINT, text STRING",
        texts.zipWithIndex.map { case (t, i) => R(i.toLong, t) })
      val capped = Dedup.minhashDedup(d, "doc_id", "text",
          minJaccard = 0.3, maxBucket = texts.length + 1)
        .collect().map(_.toString).toSet
      val open = Dedup.minhashDedup(d, "doc_id", "text",
          minJaccard = 0.3, maxBucket = 1000000)
        .collect().map(_.toString).toSet
      assert(capped == open, s"non-firing cap changed pairs on $texts")
    }
  }

  test("property: every bitemporal era equals cdcScd2 of the ops known at its record time") {
    import graft.operators.Relational
    // random op streams over 2 keys with a SMALL record-time domain (3
    // batch times) so late arrivals, rewrites, and multi-op eras all
    // arise by volume; the semantic definition of cdcScd2Bitemporal is
    // checked DIRECTLY: for each (key, era), the era's rows must equal
    // the plain cdcScd2 of the sub-log recorded up to that era
    val opsGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf(1L, 2L), Gen.oneOf("I", "U", "D"),
      Gen.oneOf("gold", "silver"), Gen.choose(0, 2)))
    forAll(opsGen) { raw =>
      val ops = raw.zipWithIndex.map { case ((k, op, attr, lag), i) =>
        (k, i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L),
         new java.sql.Timestamp(1700000000000L + lag * 86400000L),
         if (op == "D") null else attr, op)
      }
      val d = df(
        "uid BIGINT, eid BIGINT, vts TIMESTAMP, tts TIMESTAMP, tier STRING, op STRING",
        ops.map { case (k, e, v, t, a, o) => R(k, e, v, t, a, o) })
      val hist = Relational.cdcScd2Bitemporal(d, "uid", "tier", "vts",
        "tts", "eid", "op").collect()
      val byEra = hist.groupBy(r => (r.getLong(0), r.getTimestamp(1)))
      // eras are exactly each key's distinct record times
      val eraKeys = ops.map(o => (o._1, o._4)).toSet
      assert(byEra.keySet == eraKeys,
        s"eras ${byEra.keySet} != record times $eraKeys")
      eraKeys.foreach { case (k, tt) =>
        val sub = ops.filter(o => o._1 == k && !o._4.after(tt))
        val subDf = df(
          "uid BIGINT, eid BIGINT, vts TIMESTAMP, tier STRING, op STRING",
          sub.map { case (kk, e, v, _, a, o) => R(kk, e, v, a, o) })
        val expect = Relational.cdcScd2(subDf, "uid", "tier", "vts", "eid", "op")
          .collect().map(r => (r.getInt(1), Option(r.getString(2)),
            r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
          .toSet
        val got = byEra((k, tt)).map(r => (r.getInt(3), Option(r.getString(4)),
          r.getTimestamp(5), Option(r.getTimestamp(6)), r.getBoolean(7))).toSet
        assert(got == expect, s"era ($k, $tt) diverged: $got vs $expect\nops=$ops")
      }
      // open-tx rows are exactly the rows of each key's LAST era
      hist.filter(_.getBoolean(8)).foreach { r =>
        val k = r.getLong(0)
        val last = ops.filter(_._1 == k).map(_._4).maxBy(_.getTime)
        assert(r.getTimestamp(1) == last, s"is_latest off-era for key $k")
      }
      // the pushed-down log point read equals probing the materialized
      // history, at a probe inside the generated domain
      val vProbe = new java.sql.Timestamp(1700000000000L + 90000L)
      val tProbe = new java.sql.Timestamp(1700000000000L + 86400000L)
      val viaLog = Relational.snapshotAsOfLog(d, "uid", "tier", "vts",
          "tts", "eid", "op", lit(vProbe), lit(tProbe))
        .collect().map(r => (r.getLong(0), Option(r.getString(2)))).toSet
      val histDf = Relational.cdcScd2Bitemporal(d, "uid", "tier", "vts",
        "tts", "eid", "op")
      val viaHist = Relational.snapshotAsOf(histDf, lit(vProbe), lit(tProbe))
        .collect().map(r => (r.getLong(0), Option(r.getString(4)))).toSet
      assert(viaLog == viaHist,
        s"pushdown diverged: $viaLog vs $viaHist\nops=$ops")
    }
  }

  test("property: bucketized range join equals the naive theta join") {
    import graft.operators.AsOf
    val points = Gen.nonEmptyListOf(Gen.choose(0, 120))
    val ivals = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 100), Gen.choose(0, 40)))
    forAll2(points, ivals) { (pts, ivs) =>
      val left = df("pid BIGINT, ts TIMESTAMP", pts.zipWithIndex.map {
        case (t, i) => R(i.toLong, new java.sql.Timestamp(t * 1000L)) })
      val right = df("iid BIGINT, lo TIMESTAMP, hi TIMESTAMP", ivs.zipWithIndex.map {
        case ((s, len), i) =>
          R(i.toLong, new java.sql.Timestamp(s * 1000L),
            new java.sql.Timestamp((s + len) * 1000L)) })
      val got = AsOf.rangeJoin(left, right, "ts", "lo", "hi", bucketSeconds = 30L)
        .select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (for {
        (t, i) <- pts.zipWithIndex
        ((s, len), j) <- ivs.zipWithIndex
        if t >= s && t <= s + len
      } yield (i.toLong, j.toLong)).toSet
      assert(got == expect)
    }
  }
}
