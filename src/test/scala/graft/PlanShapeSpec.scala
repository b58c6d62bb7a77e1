package graft

/** Physical-plan shape assertions for the round-8 operators — the scale
  * contracts stated in the scaladocs, pinned so a refactor that silently
  * reintroduces a cartesian product or drops a broadcast fails CI, not a
  * cluster run.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("spatial grid join: blocked equi-join, never a cartesian product") {
    val p = planOf("j11_spatial_grid_join")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(12).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("skyline: per-cost contraction joins broadcast, no quadratic join") {
    val p = planOf("skyline_pareto")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("chi2 terms: vocabulary totals broadcast into the scoring join") {
    val p = planOf("text_chi2_terms")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("grouped OLS: one aggregation, no window, no join") {
    val p = planOf("a21_grouped_ols")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
    assert(!p.contains("Window") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastHashJoin"))
  }

  test("AUC: the rank window runs on the contracted per-score relation") {
    val p = planOf("m13_auc_roc")
    // the window input must be an aggregate (per-score contraction), and
    // the corpus-side scan feeds an aggregate, not the window directly
    assert(p.contains("Window") &&
      (p.contains("HashAggregate") || p.contains("ObjectHashAggregate")))
    assert(!p.contains("SortMergeJoin"))
  }

  test("eventually-follows: the self-join is on the contracted firsts") {
    val p = planOf("b7_eventually_follows")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("RFM segments: threshold scoring, no single-partition NTILE window") {
    val p = planOf("b8_rfm_segments")
    // quartile thresholds are broadcast literals (exactPercentilesMulti),
    // so the per-user relation is never globally sorted
    assert(!p.contains("Window"),
      "b8_rfm_segments must not contain any window:\n" +
        p.linesIterator.take(15).mkString("\n"))
  }

  test("bucketed tables join WITHOUT a shuffle") {
    import org.apache.spark.sql.functions._
    // run the query once so the bucketed tables exist in the catalog
    SparkEntry.queries("j13_bucketed_join")(spark, sfDir).count()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_bkt_counts")
        .join(spark.table("graft_bkt_types"), Seq("user_id"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucketed co-located join must not shuffle:\n" +
          plan.linesIterator.take(15).mkString("\n"))
      assert(plan.contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dynamic partition pruning fires on a day-partitioned fact join") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Core.table(spark, sfDir, "events")
      .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
      .write.mode("overwrite").partitionBy("day").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    val dim = fact.select(col("day")).distinct()
      .filter(col("day") <= "20240103") // selective dim: 3 of ~30 partitions
    val joined = fact.join(dim, Seq("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "day-partitioned fact join must carry a dynamic partition pruning " +
        "subquery:\n" + plan.linesIterator.take(20).mkString("\n"))
  }
}
