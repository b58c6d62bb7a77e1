package graft

/** Partitioning-invariance guard: the repo-wide determinism claim is that
  * every gated result is independent of physical parallelism (decimal
  * accumulators, explicit tie-breaks, fixed-order scalar arithmetic).
  * This spec re-runs a representative slice of the declared queries in a
  * sibling session with a DIFFERENT (and prime) shuffle partition count
  * and demands bit-identical rows — the local stand-in for "same answer
  * on a 1000-executor cluster".
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // one representative per determinism-sensitive family: decimal sums,
  // sufficient-statistics fits, log-space products, iterative graph
  // rounds, LSH/minhash, windows, rank selections, LM scoring
  private val picked = Seq(
    "q1_pricing_summary", "a21_grouped_ols", "text_entropy_kl",
    "m13_auc_roc", "survival_km", "ml_logreg_irls", "graph_hits",
    "dedup_minhash", "text_kn_perplexity", "w16_longest_streak",
    "a22_winsorize", "er_entity_resolution",
    // round-9 families: DSIR's decimal-truncated ln-ratio sums, the
    // Lloyd-trained PQ codebook (per-subspace decimal means feeding the
    // fused encode), and the threshold-scored RFM quartiles
    "curation_dsir", "simsearch_pq_learned", "b8_rfm_segments",
    // round-10 families: counting-selection percentile threshold, the
    // bounded TopKStr/BottomKPair rankings (admit/merge order must not
    // leak partitioning), beam-search graph ANN, the frozen-forest
    // scorer's decimal rollup, and the per-group fixed-range classifier
    "b9_power_users", "b6_path_topk", "f22_edit_distance",
    "simsearch_graph_beam", "m1_rf_predict_frozen",
    "j10_nearest_centroid_iso", "cdc_scd2_e2e", "sketch_quantile_hist",
    // prefix-Jaccard: the canonical (df ASC, sh ASC) prefix order and the
    // positional-filter candidate set must not depend on partitioning;
    // ts_acf: decimal sufficient-statistics sums per (group, lag);
    // the persisted dedup index: a DISK roundtrip (save→append→query)
    // written with 13 shuffle partitions must read back the same flags
    "dedup_prefix_jaccard", "ts_acf", "dedup_index_incremental",
    // round-11 families: the decimal Gram + unrolled power iteration
    // (matvec sums must not see partition order), greedy k-center's
    // argmax-of-min selection, the Theil-Sen boundary-rank median, the
    // CUSUM decimal ranking, and the interval-union island windows
    "pca_deflation_top2", "sample_kcenter", "ts_theil_sen",
    "ts_cusum_changepoint", "interval_coverage",
    // the hash-bootstrap replicate ranking and the alternating
    // ridge-solve fit (round6 decimal sums through six half-steps)
    "m21_poisson_bootstrap", "als_factorize_2f")

  test("representative queries are bit-identical under a different shuffle partitioning") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "13")
    picked.foreach { name =>
      val base = SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted
      val other = SparkEntry.queries(name)(alt, sfDir)
        .collect().map(_.toString).sorted
      assert(base.sameElements(other),
        s"$name diverged across partitionings: " +
          base.zip(other).find { case (a, b) => a != b }
            .map { case (a, b) => s"$a != $b" }.getOrElse("row counts differ"))
      assert(base.nonEmpty, s"$name returned no rows at $sfDir")
    }
  }
}
