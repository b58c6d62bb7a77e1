package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** Custom typed Aggregators (SURVEY.md §2.10): the two scores whose exact
  * semantics need the (weighted) value multiset — weighted quantile (the
  * scatter score) and energy distance (reference: common/utils.py:294-369
  * weighted quantile; utils.py:148 energy distance via scipy).
  *
  * Buffers hold a bounded sample: exact below `maxExact` values, reservoir
  * sampling above — per SURVEY §7.4 ("bounded sample buffer + exact fallback
  * for small groups"). Deterministic reservoir (LCG keyed on count) so results
  * are reproducible run-to-run.
  */
object Aggregators {

  final case class WQBuffer(values: ArrayBuffer[Double], weights: ArrayBuffer[Double],
                            seen: Long)

  /** Weighted quantile at `q`: smallest value whose cumulative normalized
    * weight reaches q (the crossing rule used by Scores.perfscores, matching
    * the reference's weighted-percentile semantics on sorted values).
    *
    * EXACTNESS CONTRACT: the result is exact while the group holds at most
    * `maxExact` values (the gate's groups are far below the 2^20 default).
    * Past that, the buffer degrades to a deterministic (LCG-keyed,
    * weight-agnostic) reservoir — a documented heuristic: overflow
    * replacement ignores weights, so extreme-weight outliers beyond the
    * capacity can be under-represented.
    */
  class WeightedQuantile(q: Double, maxExact: Int = 1 << 20)
      extends Aggregator[(Double, Double), WQBuffer, Double] {

    override def zero: WQBuffer = WQBuffer(ArrayBuffer.empty, ArrayBuffer.empty, 0L)

    private def lcg(x: Long): Long = x * 6364136223846793005L + 1442695040888963407L

    private def admit(b: WQBuffer, v: Double, w: Double, seen: Long): Unit = {
      if (b.values.length < maxExact) { b.values += v; b.weights += w }
      else {
        // deterministic reservoir replacement
        val j = math.abs(lcg(seen)) % (seen + 1)
        if (j < maxExact) { b.values(j.toInt) = v; b.weights(j.toInt) = w }
      }
    }

    override def reduce(b: WQBuffer, in: (Double, Double)): WQBuffer = {
      val (v, w) = in
      if (w <= 0 || v.isNaN) return b.copy(seen = b.seen)
      admit(b, v, w, b.seen)
      b.copy(seen = b.seen + 1)
    }

    override def merge(a: WQBuffer, c: WQBuffer): WQBuffer = {
      // stream the incoming buffer through the same reservoir rule instead of
      // silently dropping its remainder once `a` is full: every incoming
      // element gets a chance at admission keyed on the running seen count
      var seen = a.seen
      var i = 0
      while (i < c.values.length) {
        admit(a, c.values(i), c.weights(i), seen)
        seen += 1
        i += 1
      }
      a.copy(seen = a.seen + c.seen)
    }

    override def finish(b: WQBuffer): Double = {
      if (b.values.isEmpty) return Double.NaN
      val idx = b.values.indices.toArray.sortBy(b.values)
      val total = b.weights.sum
      var cum = 0.0
      var i = 0
      while (i < idx.length) {
        cum += b.weights(idx(i))
        if (cum >= q * total) return b.values(idx(i))
        i += 1
      }
      b.values(idx.last)
    }

    override def bufferEncoder: Encoder[WQBuffer] = Encoders.product[WQBuffer]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  final case class EDBuffer(xs: ArrayBuffer[Double], ys: ArrayBuffer[Double])

  /** Energy distance between the est and ref samples:
    * D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'|, D = sqrt(max(D², 0)).
    * Exact O(n log n) via the sorted-prefix-sum identity for pairwise mean
    * absolute differences (not O(n²) double loops).
    */
  class EnergyDistance(maxExact: Int = 1 << 20)
      extends Aggregator[(Double, Double), EDBuffer, Double] {

    override def zero: EDBuffer = EDBuffer(ArrayBuffer.empty, ArrayBuffer.empty)

    override def reduce(b: EDBuffer, in: (Double, Double)): EDBuffer = {
      if (b.xs.length < maxExact && !in._1.isNaN && !in._2.isNaN) {
        b.xs += in._1; b.ys += in._2
      }
      b
    }

    // exact below maxExact; past capacity the tail is truncated (documented
    // heuristic — the gate's groups stay far below the 2^20 default)
    override def merge(a: EDBuffer, c: EDBuffer): EDBuffer = {
      c.xs.indices.foreach { i =>
        if (a.xs.length < maxExact) { a.xs += c.xs(i); a.ys += c.ys(i) }
      }
      a
    }

    /** mean |a_i − b_j| over all pairs of two sorted arrays in O(n+m). */
    private def meanAbsCross(aSorted: Array[Double], bSorted: Array[Double]): Double = {
      // merge walk: for each a_i, sum over b of |a_i−b| using prefix sums of b
      val prefix = new Array[Double](bSorted.length + 1)
      var i = 0
      while (i < bSorted.length) { prefix(i + 1) = prefix(i) + bSorted(i); i += 1 }
      var total = 0.0
      var j = 0
      var k = 0
      while (k < aSorted.length) {
        val a = aSorted(k)
        while (j < bSorted.length && bSorted(j) <= a) j += 1
        // j = count of b ≤ a
        total += a * j - prefix(j) + (prefix(bSorted.length) - prefix(j)) - a * (bSorted.length - j)
        k += 1
      }
      total / (aSorted.length.toDouble * bSorted.length)
      // note: requires aSorted ascending; the inner pointer j is monotone
    }

    override def finish(b: EDBuffer): Double = {
      if (b.xs.isEmpty) return Double.NaN
      val xs = b.xs.toArray.sorted
      val ys = b.ys.toArray.sorted
      val exy = meanAbsCross(xs, ys)
      val exx = meanAbsCross(xs, xs)
      val eyy = meanAbsCross(ys, ys)
      math.sqrt(math.max(2 * exy - exx - eyy, 0.0))
    }

    override def bufferEncoder: Encoder[EDBuffer] = Encoders.product[EDBuffer]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  final case class Hit(score: Double, id: Long)
  final case class TopKBuffer(scores: ArrayBuffer[Double], ids: ArrayBuffer[Long])

  /** Bounded top-k by (score DESC, id ASC): the scale path for per-group
    * ranking. A window `row_number() ... <= k` shuffles EVERY scored row to
    * rank it; this aggregator keeps at most k candidates per partial buffer,
    * so the exchange carries |groups|·k rows however large the scored
    * relation is — the difference between shuffling |Q|×|C| similarity pairs
    * and |Q|×k. Exact and partitioning-independent (deterministic id
    * tie-break in both admit and merge).
    */
  class TopK(k: Int) extends Aggregator[(Double, Long), TopKBuffer, Seq[Hit]] {
    require(k > 0, "k must be positive")

    override def zero: TopKBuffer = TopKBuffer(ArrayBuffer.empty, ArrayBuffer.empty)

    /** a strictly better than b under (score DESC, id ASC). Total order via
      * java.lang.Double.compare, so NaN ranks ABOVE every finite score —
      * exactly where a descending window sort (Spark and DuckDB both order
      * NaN greatest) would put it — and NaN ties break on id instead of
      * being unordered under IEEE ==.
      */
    private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val cmp = java.lang.Double.compare(s1, s2)
      cmp > 0 || (cmp == 0 && i1 < i2)
    }

    private def admit(b: TopKBuffer, s: Double, id: Long): Unit = {
      if (b.scores.length < k) { b.scores += s; b.ids += id }
      else {
        // replace the current worst if the candidate beats it (k is small —
        // the linear scan is cheaper than heap bookkeeping at these sizes)
        var worst = 0
        var i = 1
        while (i < b.scores.length) {
          if (better(b.scores(worst), b.ids(worst), b.scores(i), b.ids(i))) worst = i
          i += 1
        }
        if (better(s, id, b.scores(worst), b.ids(worst))) {
          b.scores(worst) = s; b.ids(worst) = id
        }
      }
    }

    override def reduce(b: TopKBuffer, in: (Double, Long)): TopKBuffer = {
      admit(b, in._1, in._2)
      b
    }

    override def merge(a: TopKBuffer, c: TopKBuffer): TopKBuffer = {
      var i = 0
      while (i < c.scores.length) { admit(a, c.scores(i), c.ids(i)); i += 1 }
      a
    }

    override def finish(b: TopKBuffer): Seq[Hit] = {
      val hits = b.scores.indices.map(i => Hit(b.scores(i), b.ids(i)))
      hits.sortWith((x, y) => better(x.score, x.id, y.score, y.id)).toSeq
    }

    override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
    override def outputEncoder: Encoder[Seq[Hit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
  }

  final case class LongHit(key: Long, id: Long)
  final case class BottomKLongBuffer(keys: ArrayBuffer[Long], ids: ArrayBuffer[Long])

  /** Bounded bottom-k by (key ASC, id ASC) over EXACT Long keys — the
    * integer-ordered sibling of [[TopK]]. Exists because a 60-bit hash key
    * does not survive TopK's Double score (53-bit mantissa): two hashes
    * differing only below bit 53 would compare equal and tie-break on id,
    * silently reordering the sample. Long comparison keeps the full order.
    * Same scale shape: at most k candidates per partial buffer, |groups|·k
    * exchange rows however large the scored relation is, deterministic and
    * partitioning-independent.
    */
  class BottomKLong(k: Int)
      extends Aggregator[(Long, Long), BottomKLongBuffer, Seq[LongHit]] {
    require(k > 0, "k must be positive")

    /** (k1,i1) strictly before (k2,i2) under (key ASC, id ASC). */
    private def before(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
      k1 < k2 || (k1 == k2 && i1 < i2)

    private def admit(b: BottomKLongBuffer, key: Long, id: Long): Unit = {
      if (b.keys.length < k) { b.keys += key; b.ids += id }
      else {
        var worst = 0
        var i = 1
        while (i < b.keys.length) {
          if (before(b.keys(worst), b.ids(worst), b.keys(i), b.ids(i))) worst = i
          i += 1
        }
        if (before(key, id, b.keys(worst), b.ids(worst))) {
          b.keys(worst) = key; b.ids(worst) = id
        }
      }
    }

    override def zero: BottomKLongBuffer =
      BottomKLongBuffer(ArrayBuffer.empty, ArrayBuffer.empty)

    override def reduce(b: BottomKLongBuffer, in: (Long, Long)): BottomKLongBuffer = {
      admit(b, in._1, in._2)
      b
    }

    override def merge(a: BottomKLongBuffer, c: BottomKLongBuffer): BottomKLongBuffer = {
      var i = 0
      while (i < c.keys.length) { admit(a, c.keys(i), c.ids(i)); i += 1 }
      a
    }

    override def finish(b: BottomKLongBuffer): Seq[LongHit] = {
      val hits = b.keys.indices.map(i => LongHit(b.keys(i), b.ids(i)))
      hits.sortWith((x, y) => before(x.key, x.id, y.key, y.id)).toSeq
    }

    override def bufferEncoder: Encoder[BottomKLongBuffer] =
      Encoders.product[BottomKLongBuffer]
    override def outputEncoder: Encoder[Seq[LongHit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[LongHit]]()
  }

  final case class StrHit(score: Double, id: String)
  final case class TopKStrBuffer(scores: ArrayBuffer[Double],
                                 ids: ArrayBuffer[String])

  /** Bounded top-k by (score DESC, id ASC) with a STRING identity — the
    * [[TopK]] sibling for rankings whose tie-break/payload is text (path
    * strings, tokens, canonical names). Same scale shape: at most k
    * candidates per partial buffer, so the exchange carries
    * |partitions|·k rows however large the ranked relation is — the
    * replacement for a global `ROW_NUMBER() OVER (ORDER BY score DESC,
    * id)` window, which single-partition-sorts the WHOLE relation. The
    * string comparison is Java lexicographic (UTF-16 code units) ==
    * DuckDB's binary collation for the ASCII identities every caller
    * ranks.
    */
  class TopKStr(k: Int)
      extends Aggregator[(Double, String), TopKStrBuffer, Seq[StrHit]] {
    require(k > 0, "k must be positive")

    // NOTE: the four bounded-ranking aggregators (TopK, BottomKLong,
    // TopKStr, BottomKPair) deliberately repeat the admit/worst-scan/
    // merge machinery on CONCRETE primitive buffers instead of sharing an
    // Ordering-parameterized core: a generic comparator would box every
    // Double/Long per admit in the per-row hot path, and the Encoders
    // need concrete product types anyway. A fix to the selection logic
    // must be applied to all four.

    /** Total order via Double.compare, NaN above every finite score like
      * a descending sort (see [[TopK.better]]); string ties in UTF-16
      * code-unit order == DuckDB binary collation for ASCII ids.
      */
    private def better(s1: Double, i1: String, s2: Double, i2: String): Boolean = {
      val cmp = java.lang.Double.compare(s1, s2)
      cmp > 0 || (cmp == 0 && i1.compareTo(i2) < 0)
    }

    private def admit(b: TopKStrBuffer, s: Double, id: String): Unit = {
      if (b.scores.length < k) { b.scores += s; b.ids += id }
      else {
        var worst = 0
        var i = 1
        while (i < b.scores.length) {
          if (better(b.scores(worst), b.ids(worst), b.scores(i), b.ids(i))) worst = i
          i += 1
        }
        if (better(s, id, b.scores(worst), b.ids(worst))) {
          b.scores(worst) = s; b.ids(worst) = id
        }
      }
    }

    override def zero: TopKStrBuffer =
      TopKStrBuffer(ArrayBuffer.empty, ArrayBuffer.empty)

    override def reduce(b: TopKStrBuffer, in: (Double, String)): TopKStrBuffer = {
      admit(b, in._1, in._2)
      b
    }

    override def merge(a: TopKStrBuffer, c: TopKStrBuffer): TopKStrBuffer = {
      var i = 0
      while (i < c.scores.length) { admit(a, c.scores(i), c.ids(i)); i += 1 }
      a
    }

    override def finish(b: TopKStrBuffer): Seq[StrHit] = {
      val hits = b.scores.indices.map(i => StrHit(b.scores(i), b.ids(i)))
      hits.sortWith((x, y) => better(x.score, x.id, y.score, y.id)).toSeq
    }

    override def bufferEncoder: Encoder[TopKStrBuffer] =
      Encoders.product[TopKStrBuffer]
    override def outputEncoder: Encoder[Seq[StrHit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[StrHit]]()
  }

  final case class PairHit(score: Double, a: Long, b: Long)
  final case class BottomKPairBuffer(scores: ArrayBuffer[Double],
                                     as: ArrayBuffer[Long],
                                     bs: ArrayBuffer[Long])

  /** Bounded bottom-k by (score ASC, a ASC, b ASC) — the closest-pairs
    * ranking (edit-distance pairs, spatial radius pairs): score is the
    * distance, (a, b) the pair identity, and the whole pair survives in
    * the buffer so no packing/recovery join is needed for the ids. Same
    * scale contract as [[TopK]]: k candidates per partial buffer,
    * |partitions|·k exchange rows, however many pairs the blocked join
    * emits. Replaces `ROW_NUMBER() OVER (ORDER BY dist, a, b)` over a
    * pair relation that GROWS with data — the shape that
    * single-partition-sorts billions of pairs at 100 TB.
    */
  class BottomKPair(k: Int)
      extends Aggregator[(Double, Long, Long), BottomKPairBuffer, Seq[PairHit]] {
    require(k > 0, "k must be positive")

    /** (s1,a1,b1) strictly before (s2,a2,b2) under (score ASC, a ASC,
      * b ASC); total order via Double.compare, NaN last like an ASC sort.
      */
    private def before(s1: Double, a1: Long, b1: Long,
                       s2: Double, a2: Long, b2: Long): Boolean = {
      val cmp = java.lang.Double.compare(s1, s2)
      cmp < 0 || (cmp == 0 && (a1 < a2 || (a1 == a2 && b1 < b2)))
    }

    private def admit(buf: BottomKPairBuffer, s: Double, a: Long, b: Long): Unit = {
      if (buf.scores.length < k) { buf.scores += s; buf.as += a; buf.bs += b }
      else {
        var worst = 0
        var i = 1
        while (i < buf.scores.length) {
          if (before(buf.scores(worst), buf.as(worst), buf.bs(worst),
              buf.scores(i), buf.as(i), buf.bs(i))) worst = i
          i += 1
        }
        if (before(s, a, b, buf.scores(worst), buf.as(worst), buf.bs(worst))) {
          buf.scores(worst) = s; buf.as(worst) = a; buf.bs(worst) = b
        }
      }
    }

    override def zero: BottomKPairBuffer =
      BottomKPairBuffer(ArrayBuffer.empty, ArrayBuffer.empty, ArrayBuffer.empty)

    override def reduce(buf: BottomKPairBuffer,
                        in: (Double, Long, Long)): BottomKPairBuffer = {
      admit(buf, in._1, in._2, in._3)
      buf
    }

    override def merge(x: BottomKPairBuffer,
                       y: BottomKPairBuffer): BottomKPairBuffer = {
      var i = 0
      while (i < y.scores.length) { admit(x, y.scores(i), y.as(i), y.bs(i)); i += 1 }
      x
    }

    override def finish(buf: BottomKPairBuffer): Seq[PairHit] = {
      val hits = buf.scores.indices.map(i =>
        PairHit(buf.scores(i), buf.as(i), buf.bs(i)))
      hits.sortWith((x, y) => before(x.score, x.a, x.b, y.score, y.a, y.b)).toSeq
    }

    override def bufferEncoder: Encoder[BottomKPairBuffer] =
      Encoders.product[BottomKPairBuffer]
    override def outputEncoder: Encoder[Seq[PairHit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[PairHit]]()
  }
}
