package graft

/** Plan-variation invariance: partitioning independence
  * (PartitionInvarianceSpec) is necessary but not sufficient for the
  * "same answer on any cluster" claim — the optimizer also varies JOIN
  * STRATEGY (broadcast vs sort-merge), ADAPTIVE re-planning, and the
  * EVALUATION PATH (whole-stage codegen vs interpreted). This spec
  * re-runs a representative query slice in sibling sessions with each of
  * those knobs flipped and demands bit-identical rows:
  *
  *  - AQE disabled: no runtime coalescing/skew re-plan.
  *  - autoBroadcastJoinThreshold = -1: every equi-join the planner chose
  *    to broadcast becomes a shuffle join (explicit broadcast() hints
  *    survive — those are part of the declared plan, not a size guess).
  *  - whole-stage codegen off + codegenFactory fallback: every custom
  *    Expression (ArrayDot/ArrayCosine/SearchSorted/NfcNormalize/PQ
  *    kernels) runs its INTERPRETED eval instead of doGenCode — a
  *    divergence between the two implementations is a real bug class
  *    this is the only local way to catch.
  */
class PlanVariationInvarianceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // chosen to cover the custom expressions (fused cosine/dot kernels,
  // SearchSorted, NFC normalize, PQ encode/ADC), the decimal-sum and
  // rank/TopK families, joins of every flavor, and an iterative fit
  private val picked = Seq(
    "simsearch_bruteforce_topk", // ArrayCosine + TopK window
    "simsearch_ivfpq_rerank",    // PQ kernels + broadcast probes
    "o4_searchsorted",           // native SearchSorted expression
    "text_normalize",            // NfcNormalize expression
    "q7_nation_volume",          // multi-join decimal aggregates
    "j7_asof_join_exec",         // the native as-of SparkPlan
    "j5_lut_gather",             // broadcast LUT join
    "dedup_minhash",             // LSH banding + bucket join
    "a21_grouped_ols",           // decimal sufficient statistics
    "w15_rolling_median",        // window + array_sort
    "als_factorize_2f",          // fixed-point kernel, 6 half-steps
    "pca_anomaly_topk",          // gram memo + fixed-point + TopK agg
    "m21_poisson_bootstrap",     // md5-uniform + rank selection
    "sketch_quantile_hist",      // sqrt-binned sketch
    "simsearch_hnsw",            // multi-layer descent + beam rounds (r12)
    "bitemporal_snapshot")       // tx-era join + (key, era) windows (r12)

  /** The NO_CODEGEN variation cannot run queries built on the custom
    * Aggregators: Spark's INTERPRETED encoder path fails to construct
    * their ArrayBuffer-field buffer case classes
    * (EXPRESSION_DECODING_FAILED on newInstance(TopKBuffer)) — a Spark
    * encoder limitation independent of our expressions' values, and
    * unreachable in production (factoryMode defaults to FALLBACK, which
    * only drops to interpreted per-projection when codegen itself
    * fails). The variation swaps them for window/kernel-based covers of
    * the same custom expressions.
    */
  private val udafBased = Set("simsearch_ivfpq_rerank", "pca_anomaly_topk",
    "simsearch_hnsw")
  private val interpretedPick =
    picked.filterNot(udafBased) :+ "dedup_embedding_cosine"

  private def runAll(s: org.apache.spark.sql.SparkSession,
                     names: Seq[String]): Map[String, Seq[String]] =
    names.map { n =>
      n -> SparkEntry.queries(n)(s, sfDir).collect().map(_.toString).sorted.toSeq
    }.toMap

  private def assertSame(names: Seq[String], base: Map[String, Seq[String]],
                         other: Map[String, Seq[String]], tag: String): Unit =
    names.foreach { n =>
      assert(base(n).nonEmpty, s"$n returned no rows")
      assert(base(n) == other(n),
        s"$n diverged under $tag: " +
          base(n).zip(other(n)).find { case (a, b) => a != b }
            .map { case (a, b) => s"$a != $b" }
            .getOrElse(s"row counts ${base(n).size} vs ${other(n).size}"))
    }

  test("representative queries are bit-identical without AQE and without auto-broadcast") {
    val base = runAll(spark, picked)
    val alt = spark.newSession()
    alt.conf.set("spark.sql.adaptive.enabled", "false")
    alt.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    alt.conf.set("spark.sql.shuffle.partitions", "17")
    assertSame(picked, base, runAll(alt, picked),
      "AQE off + broadcast off + partitions 17")
  }

  test("representative queries are bit-identical under interpreted (non-codegen) evaluation") {
    val base = runAll(spark, interpretedPick)
    val alt = spark.newSession()
    alt.conf.set("spark.sql.codegen.wholeStage", "false")
    alt.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    assertSame(interpretedPick, base, runAll(alt, interpretedPick),
      "interpreted evaluation")
  }

  test("every custom expression's interpreted eval matches its codegen output") {
    import org.apache.spark.sql.functions._
    // the PQ ranking queries cannot run without the TopK udaf, so the PQ
    // kernels (and the other native expressions) get a direct
    // expression-level interpreted-vs-codegen check instead
    val cb = Array(Array(0.5, -1.0, 2.0, 0.25), Array(-0.75, 1.5, 0.0, 3.0))
    def frame(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      Seq(
        (1L, Array(0.4f, -0.9f, 1.7f, 0.3f), Array(0.1, 0.5, 2.5), "Café́ ﬁn"),
        (2L, Array(-0.8f, 1.6f, -0.2f, 2.9f), Array(-1.0, 0.0, 1.0), "ＡＢＣ  x"))
        .toDF("id", "v", "bounds", "txt")
        .select(col("id"),
          graft.plans.ArrayDot.arrayDot(col("v"), col("v")).as("dot"),
          graft.plans.ArrayCosine.arrayCosine(col("v"), col("v")).as("cos"),
          graft.plans.PqEncode.pqEncode(col("v"), cb, 2).as("codes"),
          graft.plans.PqEncode.pqAdcLut(col("v"), cb, 2).as("lut"),
          graft.plans.SearchSorted.searchsorted(col("bounds"),
            col("v").getItem(0).cast("double")).as("ss"),
          graft.plans.NfcNormalize.nfcNormalize(col("txt")).as("nfc"))
        .collect().map(_.toString).sorted.toSeq
    }
    val base = frame(spark)
    val alt = spark.newSession()
    alt.conf.set("spark.sql.codegen.wholeStage", "false")
    alt.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    assert(base == frame(alt),
      s"custom expressions diverge interpreted vs codegen:\n$base\nvs\n${frame(alt)}")
  }
}
