package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Probabilistic counting sketches with DETERMINISTIC cross-engine hashes
  * (the md5Long pair), so the whole sketch — build and probe — sits under
  * the exact DuckDB hash gate rather than a rows-only check.
  */
object Sketch {

  /** Count-min sketch heavy hitters over a token stream (Cormode &
    * Muthukrishnan 2005): d independent hash rows × `width` buckets; a
    * token's estimate is the MIN over its d bucket counters, an upper
    * bound on the true count (never under — collisions only inflate).
    *
    * Scale shape: this variant carries the exact vocabulary counts
    * ALONGSIDE the sketch (to exhibit the overestimate bound under the
    * oracle gate), so the token stream contracts through ONE keyed
    * count — a |vocab|-sized map-combinable shuffle — and both the
    * d·width sketch cells and the probe derive from that relation (the
    * d-way explode and the d md5 evaluations run per distinct token, not
    * per occurrence). A pure-sketch build with NO exact ride-along is the
    * raw-stream form: explode the occurrences directly into (j, b) pairs
    * and aggregate — the shuffle then carries ≤ d·width partial cells
    * however large the corpus, with a sampled/heuristic candidate set fed
    * to the probe. Both shapes produce identical cell counts; pick by
    * whether the vocabulary relation is needed anyway.
    *
    * Output: top-`k` candidates by (estimate DESC, token) with the
    * estimate and the exact count (est_cnt ≥ exact_cnt always).
    */
  def cmsTopK(df: DataFrame, textCol: String, d: Int = 3, width: Int = 256,
              k: Int = 20): DataFrame = {
    require(d > 0 && width > 0 && k > 0, s"cmsTopK: bad shape d=$d w=$width k=$k")
    val toks = df.select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    def bucket(j: Int): Column =
      TextAnalysis.md5Long(concat(lit(s"cms$j:"), col("tok"))) % width
    // ONE pass over the raw token stream (the keyed count), then both the
    // sketch cells and the probe derive from the |vocab|-sized count
    // relation: cell counts are Σ exact_cnt over the tokens hashing there —
    // identical integers to counting raw occurrences, but the d-way pair
    // explode and the d md5 evaluations run over distinct tokens instead
    // of every occurrence (the same restructure the DuckDB mirror got)
    val cand = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      .persist() // consumed by cells AND the probe — one final action, so
                 // the lazy in-job cache reuses without an eager extra job
    val cells = cand
      .select(col("exact_cnt"),
        posexplode(array((0 until d).map(bucket): _*)).as(Seq("j", "b")))
      .groupBy(col("j"), col("b")).agg(sum(col("exact_cnt")).as("cnt"))
    val probe = cand
      .select(col("tok"), col("exact_cnt"),
        posexplode(array((0 until d).map(bucket): _*)).as(Seq("j", "b")))
      .join(broadcast(cells), Seq("j", "b"))
      .groupBy(col("tok")).agg(
        first(col("exact_cnt")).as("exact_cnt"),
        min(col("cnt")).as("est_cnt"))
    probe
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("est_cnt").desc, col("tok"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("tok"), col("est_cnt"), col("exact_cnt"))
  }

  /** Bloom-filter membership pruning (Bloom 1970), the join-pruning
    * structure: the build side's keys set d bit positions each; a probe
    * key is "maybe present" iff ALL d of its positions are set — no false
    * negatives ever, false positives at the usual 1-bit-density rate.
    *
    * Relational form with deterministic md5 positions: the bit set is a
    * ≤ `mBits`-row relation however large the build side (the distinct
    * aggregation collapses it), broadcast into the probe's match count.
    * At cluster scale you'd pack the bits into a long[] inside a custom
    * Expression and skip the join; the SEMANTICS gated here are identical,
    * and the bounded bit relation is already the scale-safe shape.
    *
    * Output: one row per distinct probe key with `maybe_member` (bloom
    * verdict) and `is_member` (exact semi-join truth riding along to pin
    * the no-false-negative contract).
    */
  def bloomPrune(build: DataFrame, buildKey: String,
                 probe: DataFrame, probeKey: String,
                 mBits: Int = 1024, d: Int = 3): DataFrame = {
    require(mBits > 0 && d > 0, s"bloomPrune: bad shape m=$mBits d=$d")
    def positions(key: Column): Column =
      array((0 until d).map(j =>
        TextAnalysis.md5Long(concat(lit(s"bloom$j:"), key)) % mBits): _*)
    val bits = build
      .select(explode(positions(col(buildKey))).as("bit")).distinct()
    // a key's d hashes can COLLIDE mod mBits (a member key then sets fewer
    // than d distinct bits), so the verdict compares matched distinct bits
    // against the key's OWN distinct-position count — comparing against the
    // literal d would be a false negative exactly there
    val probeKeys = probe.select(col(probeKey).as("k")).distinct()
      .withColumn("__npos", size(array_distinct(positions(col("k")))).cast("long"))
    val matched = probeKeys
      .select(col("k"), explode(positions(col("k"))).as("bit")).distinct()
      .join(broadcast(bits), Seq("bit"))
      .groupBy(col("k")).agg(count(lit(1)).as("hits"))
    val exact = build.select(col(buildKey).as("k")).distinct()
      .withColumn("is_member", lit(true))
    probeKeys
      .join(matched, Seq("k"), "left")
      .join(exact, Seq("k"), "left")
      .select(col("k").as(probeKey),
        (coalesce(col("hits"), lit(0L)) === col("__npos")).as("maybe_member"),
        coalesce(col("is_member"), lit(false)).as("is_member"))
  }

  /** HyperLogLog distinct estimation (Flajolet et al. 2007) per group,
    * with the md5 hash so both engines see identical register values:
    * bucket = h mod m, rank = leading-zero count of the remaining
    * (60 − log2 m)-bit suffix + 1 (via the length of the minimal binary
    * string — a pure string op, no float log), registers = per-bucket
    * max rank.
    *
    * The harmonic denominator Σ 2^(−M_b) is accumulated as SCALED
    * INTEGERS — Σ 2^(maxRho−M_b) via bit shifts, exact and order-free in
    * 64-bit (≤ m·2^maxRho = 2^61) — because a double-sum of tiny powers mixes
    * magnitudes across 55 binades and becomes partition-order-dependent
    * in the last bit. Empty buckets contribute rank 0 (the generate-
    * series left join). Exact COUNT(DISTINCT) rides along for comparison.
    *
    * Scale shape: one map-side hash projection + one (group, bucket) agg
    * bounded at |groups|·m rows + one |groups|-row rollup — the entire
    * point of HLL at 100 TB; the exact column is the thing you'd DROP at
    * scale, kept here to exhibit the estimate against truth.
    */
  def hllDistinct(df: DataFrame, groupCol: String, valCol: String,
                  m: Int = 64): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"hllDistinct: m must be a power of two, got $m")
    // alpha_m for m = 64 per the HLL paper; the two smaller constants
    // cover the spec's tiny-m cases
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    // h is 60-bit; the suffix must come off via a SHIFT, not double
    // division (h exceeds double's 53-bit mantissa, so h/m-then-cast
    // silently corrupts low bits)
    val shiftBits = java.lang.Integer.numberOfTrailingZeros(m)
    // the suffix is (60 - shiftBits) bits, so the max rank (all-zero
    // suffix) is 60 - shiftBits + 1 — for m = 64 that is the historical
    // constant 55; smaller m widens the suffix and the constant MUST move
    // with it or every register (and the scaled-integer harmonic sum)
    // is off by log2(64/m)
    val maxRho = 60 - shiftBits + 1
    val h = TextAnalysis.md5Long(concat(lit("hll:"), col(valCol).cast("string")))
    val regs = df
      .select(col(groupCol).as("g"), (h % m).as("b"),
        shiftright(h, shiftBits).as("suffix"))
      .withColumn("rho",
        when(col("suffix") > 0, lit(maxRho) - length(bin(col("suffix"))))
          .otherwise(lit(maxRho)))
      .groupBy(col("g"), col("b")).agg(max(col("rho")).as("mb"))
    val groups = df.select(col(groupCol).as("g")).distinct()
    val full = groups
      .crossJoin(bucketDomain(df, m))
      .join(regs, Seq("g", "b"), "left")
      .withColumn("mb", coalesce(col("mb"), lit(0)))
    val scale = math.pow(2.0, maxRho) * alpha * m * m
    val est = full
      .groupBy(col("g"))
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - mb)")).as("s"))
      .select(col("g"),
        round(lit(scale) / col("s").cast("double"), 6).as("est_distinct"))
    val exact = df.groupBy(col(groupCol).as("g"))
      .agg(countDistinct(col(valCol)).as("exact_distinct"))
    est.join(exact, Seq("g")).withColumnRenamed("g", groupCol)
  }

  /** 0..m−1 as a one-column relation (bucket domain for the empty-bucket
    * join). */
  private def bucketDomain(df: DataFrame, m: Int): DataFrame =
    df.sparkSession.range(0, m).select(col("id").cast("long").as("b"))

  /** KMV (k-minimum-values) distinct sketch with SET OPERATIONS (Beyer et
    * al., "On synopses for distinct-value estimation under multiset
    * operations", SIGMOD 2007) — the piece CMS/Bloom/HLL don't give you:
    * two sketches built independently can be MERGED, so union and
    * intersection cardinalities come from the k-row synopses alone.
    *
    * A side's sketch is the k smallest 60-bit md5 hashes of its distinct
    * keys. With U(k) the k-th smallest hash, est = (k−1)·2⁶⁰ / U(k); a
    * sketch holding fewer than k hashes saw the whole domain, so its
    * estimate is its exact size. The union sketch is the k smallest of the
    * merged hash sets; the intersection estimate scales the union estimate
    * by the fraction of the union synopsis present in BOTH sides
    * (Jaccard-via-KMV).
    *
    * Determinism: hashes are the shared md5Long; the estimate divides two
    * exactly-representable doubles ((k−1)·2⁶⁰ needs 8+60 < 64 mantissa
    * bits only after the cast rounds, identically on both engines) in one
    * IEEE op, then rounds to 6 dp — identical bits on both engines.
    *
    * Scale shape: per side, one distinct-hash projection then a k-row
    * TakeOrdered (per-partition top-k, merged on the driver — never a full
    * sort); every later step joins k-row relations. The exact
    * COUNT(DISTINCT)s ride along to exhibit estimate-vs-truth; at 100 TB
    * they are the columns you'd drop while the sketch path is unchanged.
    *
    * Output: 4 rows (left / right / union / intersect) × (n_sketch,
    * est_distinct, exact_distinct).
    */
  def kmvSetOps(left: DataFrame, right: DataFrame, keyCol: String,
                k: Int = 256): DataFrame = {
    require(k > 1, s"kmvSetOps: k must be > 1, got $k")
    val spark = left.sparkSession
    val numer = (k - 1).toDouble * math.pow(2.0, 60)
    def hashes(df: DataFrame): DataFrame = df
      .select(TextAnalysis.md5Long(
        concat(lit("kmv:"), col(keyCol).cast("string"))).as("h"))
      .distinct()
    // TakeOrderedAndProject: per-partition top-k + driver merge, k rows out
    def kmin(h: DataFrame): DataFrame = h.orderBy(col("h")).limit(k)
    // LAZY persist, not localCheckpoint: every consumer feeds the ONE
    // final unionAll action, so the in-job cache gives the same reuse
    // without three up-front materialization jobs (the dsirWeights
    // lesson: eager checkpoints are for iterative lineage-cutting)
    val lh = hashes(left).persist()   // consumed: own kmin + 2 probes
    val rh = hashes(right).persist()
    val lk = kmin(lh)
    val rk = kmin(rh)
    val uk = kmin(lh.unionAll(rh).distinct()).persist()
    def est(sk: DataFrame): DataFrame = sk.agg(
      count(lit(1)).as("n_sketch"),
      when(count(lit(1)) < k, count(lit(1)).cast("double"))
        .otherwise(round(lit(numer) / max(col("h")).cast("double"), 6))
        .as("est_distinct"))
    // union-synopsis rows present in BOTH sides (semi-joins against the
    // full distinct-hash sets — at scale these are shuffle joins on h)
    val both = uk.join(lh, Seq("h"), "left_semi").join(rh, Seq("h"), "left_semi")
    val interEst = uk.agg(
      count(lit(1)).as("n_u"),
      max(col("h")).cast("double").as("uk"))
      .crossJoin(both.agg(count(lit(1)).as("n_b")))
      .select(col("n_b").as("n_sketch"),
        when(col("n_u") < k, col("n_b").cast("double"))
          .otherwise(round((col("n_b").cast("double") / k) *
            (lit(numer) / col("uk")), 6))
          .as("est_distinct"))
    def exact(df: DataFrame): DataFrame =
      df.agg(countDistinct(col(keyCol)).as("exact_distinct"))
    val keys = (d: DataFrame) => d.select(col(keyCol)).distinct()
    val exInter = keys(left).join(keys(right), Seq(keyCol), "left_semi")
      .agg(count(lit(1)).as("exact_distinct"))
    def row(side: String, e: DataFrame, x: DataFrame): DataFrame =
      e.crossJoin(x).select(lit(side).as("side"), col("n_sketch").cast("long"),
        col("est_distinct"), col("exact_distinct").cast("long"))
    row("left", est(lk), exact(left))
      .unionAll(row("right", est(rk), exact(right)))
      .unionAll(row("union", est(uk), exact(left.unionAll(right))))
      .unionAll(row("intersect", interEst, exInter))
  }

  /** Mergeable histogram quantile sketch — the missing quantile member of
    * the sketch family, and the shape that actually computes a percentile
    * over 100 TB: per group, O(`bins`) map-side-combinable counters
    * (merge = cell-wise add, like CMS), never a sort of the data. The
    * per-p estimate walks the bin CDF to the lower-quantile rank
    * r = ceil(p·n) and interpolates linearly inside the hit bin.
    *
    * Error bound: when `saturated` is false (no value clamped into the
    * top bin from above, i.e. all values < (bins/binsPerUnit)²), the true
    * rank-r order statistic lies inside the hit bin, so
    * |est − exact| ≤ bin width holds a priori — the oracle query asserts
    * both the bound and non-saturation per row. When a group saturates,
    * high quantiles can sit arbitrarily far beyond the top edge and the
    * flag is the caller's signal to widen `bins`/shrink `binsPerUnit`.
    *
    * Binning is sqrt-scaled (value-domain [0, (bins/binsPerUnit)²)):
    * IEEE-754 REQUIRES sqrt to be exactly rounded, so the bin of a value
    * is bit-identical on every engine — a log-binned variant would hang
    * the cross-engine gate on 1-ulp transcendental differences. The clamp
    * into [0, bins−1] happens in DOUBLE space BEFORE the narrowing cast
    * (floor of an unbounded double overflows int/long under ANSI), and
    * NaN is excluded explicitly — it passes `v >= 0` on both engines
    * (NaN sorts above every number) and would poison the cast.
    *
    * Output: (group, p, est_q, bin_lo, bin_hi, saturated) per requested
    * quantile. All ps are answered in ONE pass over the histogram
    * (conditional aggregation + stack), not one plan replay per p.
    */
  def histQuantiles(df: DataFrame, groupCol: String, valCol: String,
                    ps: Seq[Double], bins: Int = 128,
                    binsPerUnit: Double = 4.0): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      "quantiles must be in (0, 1]")
    require(bins > 0 && binsPerUnit > 0.0,
      s"bins and binsPerUnit must be positive, got $bins / $binsPerUnit")
    import org.apache.spark.sql.expressions.Window
    val v = col(valCol).cast("double")
    val scaled = sqrt(v) * lit(binsPerUnit)
    val bin = greatest(floor(least(scaled, lit((bins - 1).toDouble))),
      lit(0L)).cast("int")
    val counts = df.filter(v.isNotNull && !isnan(v) && v >= 0.0)
      .select(col(groupCol), bin.as("__bin"),
        (scaled >= lit(bins.toDouble)).cast("int").as("__cl"))
      .groupBy(col(groupCol), col("__bin"))
      .agg(count(lit(1)).as("__cnt"), max(col("__cl")).as("__clb"))
    // both windows are PARTITIONED (by group, over <= bins rows) — the
    // contracted-histogram shape, never a global sort
    val cum = counts
      .withColumn("__cum",
        sum(col("__cnt")).over(
          Window.partitionBy(col(groupCol)).orderBy(col("__bin"))))
      .withColumn("__n",
        sum(col("__cnt")).over(Window.partitionBy(col(groupCol))))
      .withColumn("__sat",
        max(col("__clb")).over(Window.partitionBy(col(groupCol))))
    val edge = (b: Column) => (b / lit(binsPerUnit)) * (b / lit(binsPerUnit))
    // one groupBy (partition-local: the windows above already hashed by
    // group) with a conditional aggregate per p, then stack — the
    // histogram build runs once for all ps instead of once per p
    val lo = edge(col("__bin").cast("double"))
    val hi = edge(col("__bin").cast("double") + lit(1.0))
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      val r = ceil(lit(p) * col("__n")).cast("double")
      val hit = col("__cum").cast("double") >= r &&
        (col("__cum") - col("__cnt")).cast("double") < r
      val frac = (r - (col("__cum") - col("__cnt")).cast("double")) /
        col("__cnt").cast("double")
      Seq(max(when(hit, lo + (hi - lo) * frac)).as(s"__e$i"),
        max(when(hit, lo)).as(s"__lo$i"),
        max(when(hit, hi)).as(s"__hi$i"))
    } :+ max(col("__sat")).as("__satg")
    val aggd = cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val stackArgs = ps.zipWithIndex.map { case (p, i) =>
      s"CAST(${p} AS DOUBLE), __e$i, __lo$i, __hi$i"
    }.mkString(", ")
    aggd.select(col(groupCol),
        expr(s"stack(${ps.size}, $stackArgs) AS (p, est_q, bin_lo, bin_hi)"),
        (col("__satg") === lit(1)).as("saturated"))
      .select(col(groupCol), col("p"), col("est_q"),
        col("bin_lo"), col("bin_hi"), col("saturated"))
  }
}
