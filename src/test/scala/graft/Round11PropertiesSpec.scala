package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Layout
import graft.llm.Coreset
import graft.operators.{Behavior, Stats, Windows}

/** Brute-force parity properties for the round-11 operators: the
  * distributed form of each must agree with a direct driver-side
  * computation carrying the same tie semantics, on random data.
  */
class Round11PropertiesSpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], cases: Int = 5)(body: A => Unit): Unit =
    (1 to cases).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def T(sec: Long) = new Timestamp(1704103200000L + sec * 1000L)

  test("property: intervalCoverage equals the brute-force interval union") {
    val gen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(1, 3); s <- Gen.choose(0L, 500L); len <- Gen.choose(0L, 120L)
    } yield (k.toLong, s, s + len))
    forAll(gen) { ivs =>
      val rows = ivs.zipWithIndex.map { case ((k, s, e), i) =>
        R(k, T(s), T(e), i.toLong)
      }
      val got = Windows.intervalCoverage(
        df("k BIGINT, s TIMESTAMP, e TIMESTAMP, id BIGINT", rows),
        "k", "s", "e", "id")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val expected = ivs.groupBy(_._1).map { case (k, is) =>
        val sorted = is.map(t => (t._2, t._3)).sortBy(identity)
        val islands = sorted.tail.foldLeft(List((sorted.head._1, sorted.head._2))) {
          case (acc @ (a, b) :: rest, (s, e)) =>
            if (s > b) (s, e) :: acc else (a, math.max(b, e)) :: rest
          case (Nil, _) => Nil
        }
        k -> ((is.size.toLong, islands.size.toLong,
          islands.map { case (a, b) => b - a }.sum,
          islands.map { case (a, b) => b - a }.max))
      }
      assert(got == expected, s"got $got\nexpected $expected")
    }
  }

  test("property: theilSen equals the brute-force median of pairwise slopes") {
    val gen = Gen.listOfN(12, Gen.zip(Gen.choose(0, 50), Gen.choose(-10.0, 10.0)))
    forAll(gen) { pts =>
      val rows = pts.zipWithIndex.map { case ((x, y), i) =>
        R(1L, x.toDouble, i.toLong, y)
      }
      val got = Stats.theilSen(df("g BIGINT, x DOUBLE, t BIGINT, y DOUBLE", rows),
        "g", "x", "t", "y").head()
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
        if pts(i)._1 != pts(j)._1
      } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1.toDouble - pts(i)._1.toDouble))
        .sorted
      if (slopes.isEmpty) assert(got.isNullAt(3))
      else {
        val m = slopes.length
        val expected =
          if (m % 2 == 1) slopes(m / 2)
          else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
        assert(got.getLong(2) == m && got.getDouble(3) == expected,
          s"slope ${got.getDouble(3)} vs $expected over $m pairs")
      }
    }
  }

  test("property: cusumChangePoint equals the brute-force peak of centered sums") {
    val gen = Gen.nonEmptyListOf(Gen.choose(-5.0, 5.0)).map(_.take(40))
    forAll(gen) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => R(1L, T(i.toLong), i.toLong, v) }
      val got = Stats.cusumChangePoint(
        df("g BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", rows),
        "g", "ts", "id", "v").head()
      // brute force with the SAME decimal quantization: terms round to
      // 10 dp half-up before the running sum
      val mean = {
        val s = vs.map(v => BigDecimal(v).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
        (s.toDouble / vs.length)
      }
      val cum = vs.scanLeft(BigDecimal(0)) { (acc, v) =>
        acc + BigDecimal(v - mean).setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }.tail
      val peakIdx = cum.indices.maxBy(i => (cum(i).abs, -i))
      assert(got.getLong(3) == peakIdx.toLong,
        s"cp ${got.getLong(3)} vs $peakIdx (cum $cum)")
      assert(math.abs(got.getDouble(5) - cum(peakIdx).abs.toDouble) < 1e-6)
    }
  }

  test("property: kCenterSelect equals the driver-side greedy with identical tie-breaks") {
    val dim = 4
    val gen = Gen.listOfN(25, Gen.listOfN(dim, Gen.choose(-4.0, 4.0)))
    forAll(gen) { vecs =>
      val rows = vecs.zipWithIndex.map { case (v, i) =>
        (i.toLong, v.map(_.toFloat).toArray)
      }
      import spark.implicits._
      val got = Coreset.kCenterSelect(rows.toDF("id", "v"), "id", "v", dim, k = 4)
        .orderBy(col("sel_order")).collect().map(_.getLong(1)).toSeq
      // driver greedy, floats widened exactly as the engine does
      val vd = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
      def dot(a: Array[Double], b: Array[Double]) =
        a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val seed = vd.toSeq.map { case (id, v) => (id, dot(v, v)) }
        .maxBy { case (id, n) => (n, -id) }._1
      var chosen = List(seed)
      for (_ <- 2 to 4) {
        val next = vd.toSeq.filterNot(kv => chosen.contains(kv._1))
          .map { case (id, v) =>
            val d = chosen.map { c =>
              val cv = vd(c); dot(v, v) + dot(cv, cv) - 2.0 * dot(v, cv)
            }.min
            (id, d)
          }.maxBy { case (id, d) => (d, -id) }._1
        chosen = chosen :+ next
      }
      assert(got == chosen, s"got $got vs driver $chosen")
    }
  }

  test("property: processDfg equals brute-force consecutive-pair statistics") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 3), Gen.choose(0, 2)))
      .map(_.take(30))
    forAll(gen) { evs =>
      val types = Array("a", "b", "c")
      val rows = evs.zipWithIndex.map { case ((u, t), i) =>
        R(u.toLong, T(i.toLong * 7), i.toLong, types(t))
      }
      val got = Behavior.processDfg(
        df("u BIGINT, ts TIMESTAMP, id BIGINT, ty STRING", rows),
        "u", "ts", "id", "ty")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      val edges = evs.zipWithIndex.groupBy(_._1._1).values.flatMap { tr =>
        tr.sortBy(_._2).sliding(2).collect {
          case Seq(((_, t1), i1), ((_, t2), i2)) =>
            ((types(t1), types(t2)), (i2 - i1) * 7L)
        }
      }.toSeq
      val expected = edges.groupBy(_._1).map { case (e, gs) =>
        val sorted = gs.map(_._2).sorted
        val m = sorted.length
        val med =
          if (m % 2 == 1) sorted(m / 2).toDouble
          else (sorted(m / 2 - 1) + sorted(m / 2)).toDouble / 2.0
        e -> ((m.toLong, sorted.min, sorted.max, med))
      }
      assert(got == expected, s"got $got\nexpected $expected")
    }
  }

  test("property: compactionPlan — every file binned once, offsets respected") {
    val gen = Gen.nonEmptyListOf(Gen.choose(1L, 300L)).map(_.take(30))
    forAll(gen) { sizes =>
      val target = 250L
      val rows = sizes.zipWithIndex.map { case (s, i) => R("p", i.toLong, s) }
      val plan = Layout.compactionPlan(
        df("part STRING, file BIGINT, size BIGINT", rows),
        "part", "file", "size", target)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(plan.map(_._1).toSet == sizes.indices.map(_.toLong).toSet,
        "every file exactly once")
      val bins = plan.map(_._3)
      // bins start at 0; an index CAN be skipped when an oversized file
      // spans a whole bin (its successor's start jumps two boundaries),
      // so contiguity is deliberately NOT asserted
      assert(bins.min == 0)
      // next-fit-by-offset: the bytes in bins strictly below b must be at
      // least b·target (a file lands in bin b only when its start ≥ b·target)
      (1L to bins.max).foreach { b =>
        val below = plan.filter(_._3 < b).map(_._2).sum
        assert(below >= b * target,
          s"bin $b starts before offset ${b * target} (below=$below)")
      }
    }
  }

  test("property: poissonBootstrapCi — CI ordered and replicate count bounded") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.choose(0.0, 100.0)).map(_.take(60))
    forAll(gen, cases = 3) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      val out = Stats.poissonBootstrapCi(rows.toDF("g", "id", "v"),
        "g", "id", "v", reps = 16, tailK = 2).head()
      assert(out.getLong(2) <= 16)
      if (!out.isNullAt(4) && !out.isNullAt(5))
        assert(out.getDouble(4) <= out.getDouble(5), "ci_lo > ci_hi")
      // replicate means are convex combinations up to the 6-dp sum rounds
      assert(out.getDouble(3) >= vs.min - 1e-5 && out.getDouble(3) <= vs.max + 1e-5,
        "boot mean outside the data range")
    }
  }
}
