package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 6: F6 — the ZPHI attenuation correction as a declared query with an
  * exact DuckDB oracle. Synthetic rays are built from the events table
  * (ray = user, range order = event time); all window integrals go through
  * DECIMAL accumulators because DuckDB computes window sums with a segment
  * tree (different summation order than Spark's running accumulation).
  */
object QueriesF {
  import Queries.QueryDef

  private val B = 0.64884
  private val Alpha = 0.08
  private val Dr = 0.5
  // pre-folded scalar constants, embedded identically in both engines
  private val Cz = 0.1 * B          // zb exponent coefficient
  private val Ca = 0.1 * B * Alpha  // C exponent coefficient
  private val Ci = 0.46 * B * Dr    // integral step weight
  private val C2 = 2.0 * Dr         // two-way PIA step

  private def dwin(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast("decimal(27,10)")).over(w).cast("double")

  val f6Zphi: QueryDef = QueryDef(
    "f6_zphi_attenuation",
    (s, dir) => {
      val byRay = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val base = Core.table(s, dir, "events")
        .withColumn("rng", row_number().over(byRay))
        .select(col("user_id"), col("rng"),
                (col("value") / 10.0).as("zh"),
                (col("value") / 200.0).as("dphi_step"))
      val cum = Window.partitionBy(col("user_id")).orderBy(col("rng"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val full = Window.partitionBy(col("user_id")).orderBy(col("rng"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val withPhi = base.withColumn("phidp", dwin(col("dphi_step"), cum))
      val withZb = withPhi.withColumn("z_b", pow(lit(10.0), col("zh") * Cz))
      val staged = withZb
        .withColumn("itot", dwin(col("z_b"), full) * Ci)
        .withColumn("icum", dwin(col("z_b"), cum) * Ci)
        .withColumn("p0", first(col("phidp")).over(full))
        .withColumn("pm", last(col("phidp")).over(full))
        .withColumn("c", pow(lit(10.0), (col("pm") - col("p0")) * Ca) - 1.0)
        .withColumn("iend", col("itot") - col("icum") + col("z_b") * Ci)
        .withColumn("ah",
          when(col("c") > 0 && col("itot") > 0,
            col("z_b") * col("c") / (col("itot") + col("c") * col("iend")))
            .otherwise(lit(0.0)))
      staged
        .withColumn("pia", dwin(col("ah"), cum) * C2)
        .select(col("user_id"), col("rng"), round(col("ah"), 6).as("ah"),
                round(col("pia"), 6).as("pia"),
                round(col("zh") + col("pia"), 6).as("zh_corr"))
        .orderBy(col("user_id"), col("rng"))
    },
    Some(s"""WITH base AS (
        SELECT user_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rng,
               value / 10.0 AS zh, value / 200.0 AS dphi_step
        FROM events),
      phi AS (SELECT *, CAST(SUM(CAST(dphi_step AS DECIMAL(27,10)))
               OVER cum AS DOUBLE) AS phidp
              FROM base
              WINDOW cum AS (PARTITION BY user_id ORDER BY rng ROWS UNBOUNDED PRECEDING)),
      zb AS (SELECT *, POW(10.0, zh * $Cz) AS z_b FROM phi),
      sums AS (SELECT *,
        CAST(SUM(CAST(z_b AS DECIMAL(27,10))) OVER ray AS DOUBLE) * $Ci AS itot,
        CAST(SUM(CAST(z_b AS DECIMAL(27,10))) OVER cum AS DOUBLE) * $Ci AS icum,
        FIRST_VALUE(phidp) OVER ray AS p0,
        LAST_VALUE(phidp) OVER ray AS pm
        FROM zb
        WINDOW ray AS (PARTITION BY user_id ORDER BY rng
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
               cum AS (PARTITION BY user_id ORDER BY rng ROWS UNBOUNDED PRECEDING)),
      ahs AS (SELECT *,
        POW(10.0, (pm - p0) * $Ca) - 1.0 AS c,
        itot - icum + z_b * $Ci AS iend
        FROM sums),
      ah2 AS (SELECT user_id, rng, zh,
        CASE WHEN c > 0 AND itot > 0
             THEN z_b * c / (itot + c * iend) ELSE 0.0 END AS ah
        FROM ahs)
      SELECT user_id, rng, ROUND(ah, 6) AS ah,
        ROUND(CAST(SUM(CAST(ah AS DECIMAL(27,10)))
          OVER (PARTITION BY user_id ORDER BY rng ROWS UNBOUNDED PRECEDING)
          AS DOUBLE) * $C2, 6) AS pia,
        ROUND(zh + CAST(SUM(CAST(ah AS DECIMAL(27,10)))
          OVER (PARTITION BY user_id ORDER BY rng ROWS UNBOUNDED PRECEDING)
          AS DOUBLE) * $C2, 6) AS zh_corr
      FROM ah2 ORDER BY user_id, rng"""))

  /** Within-document repetition ratio (duplicate word 2-grams share) —
    * the Gopher-style repetition quality filter.
    */
  val textRepetition: QueryDef = QueryDef(
    "text_repetition",
    (s, dir) => Core.table(s, dir, "documents")
      // staged token split (the Dedup.shingles lambda rule)
      .select(col("doc_id"),
        graft.llm.TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id"),
        graft.llm.TextAnalysis.repetitionRatioOfTokens(col("__toks"), 2)
          .as("rep_ratio"))
      .orderBy(col("doc_id")),
    Some("""WITH g AS (
        SELECT doc_id,
          [array_to_string(w[i : i + 1], ' ')
           for i in generate_series(1, len(w) - 1)] AS grams
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
              FROM documents))
      SELECT doc_id,
        CASE WHEN len(grams) > 0
             THEN ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
             ELSE 0.0 END AS rep_ratio
      FROM g ORDER BY doc_id"""))

  /** A12: the deterministic `df.summary()` surface — exact percentiles
    * (Spark `percentile` ↔ DuckDB `quantile_cont`, both exact interpolated)
    * and mean/std through the integer/fraction LONG-SPLIT kernel
    * ([[graft.operators.Agg.summaryStats]]): floor(x) and the 8-dp
    * floor-quantized fraction summed as BIGINTs (order-independent,
    * primitive speed — replaced the 5.6×-slower BigDecimal accumulators),
    * reconstructed int + frac/1e8 on emit; int64→double is correctly
    * rounded on both engines, so the values pin exactly.
    */
  val a12Summary: QueryDef = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    // the long-split moment sums, mirrored token for token: DuckDB
    // SUM(BIGINT) returns HUGEINT, so the inner CAST(... AS BIGINT) pins
    // the int64 value (loud on overflow) before the double cast
    def splitSum(e: String): String =
      s"""CAST(CAST(SUM(CAST(FLOOR($e) AS BIGINT)) AS BIGINT) AS DOUBLE)
        + CAST(CAST(SUM(CAST(FLOOR(($e - FLOOR($e)) * 1.0E8) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1.0E8"""
    QueryDef(
      "a12_summary",
      (s, dir) => graft.operators.Agg.summaryStats(
          Core.table(s, dir, "lineitem"), cols)
        .orderBy(col("column")),
      Some(cols.map { c =>
        val v = s"CAST($c AS DOUBLE)"
        s"""SELECT "column", n,
          ROUND(s1 / n, 6) AS mean,
          ROUND(SQRT(GREATEST(0.0, (s2 - s1 * s1 / n) / (n - 1))), 6) AS std,
          min, p25, p50, p75, max
        FROM (SELECT '$c' AS "column", COUNT($c) AS n,
          ${splitSum(v)} AS s1,
          ${splitSum(s"($v * $v)")} AS s2,
          ROUND(MIN($v), 6) AS min,
          ROUND(quantile_cont($v, 0.25), 6) AS p25,
          ROUND(quantile_cont($v, 0.5), 6) AS p50,
          ROUND(quantile_cont($v, 0.75), 6) AS p75,
          ROUND(MAX($v), 6) AS max
        FROM lineitem)"""
      }.mkString("", " UNION ALL ", " ORDER BY \"column\"")))
  }

  /** M9: the model-intercomparison rollup (K-fold CV of an RF config vs a
    * reference-product column, solid/liquid split at 2 °C, 10/60-min agg) —
    * model output, rows-only check; the score math itself is oracled via
    * m6_perfscores / m6_energy_distance and spec'd in IntercomparisonSpec.
    */
  val m9Intercomparison: QueryDef = QueryDef(
    "m9_intercomparison",
    (s, dir) => {
      import graft.ml.Intercomparison
      // demonstration scale: the orchestration shape is what M9 is about —
      // a 5% sample keeps the K RF fits out of the bench's critical path
      // (the full-data path is the same code with the filter dropped)
      val li = Core.table(s, dir, "lineitem")
        .filter(col("l_orderkey") % 20 === 0)
        .withColumn("ref", col("l_quantity") / 10.0)
        .withColumn("rzc_proxy", col("l_extendedprice") / 10000.0)
        .withColumn("temp", col("l_discount") * 100.0 - 5.0)
        .withColumn("fold", (col("l_partkey") % 2).cast("int")) // independent of the sampling key
        .withColumn("hour", (col("l_partkey") % 50).cast("int"))
        .withColumn("f1", col("l_extendedprice") / 9500.0)
        .withColumn("f2", col("l_tax") * 100.0)
      Intercomparison.run(li,
        configs = Seq(Intercomparison.ModelConfig("RF_small", Seq("f1", "f2"),
          numTrees = 3, maxDepth = 5)),
        refProducts = Map("RZC_proxy" -> "rzc_proxy"),
        labelCol = "ref", tempCol = "temp", foldCol = "fold", k = 2,
        hourCol = Some("hour"))
    },
    None)

  val all: Seq[QueryDef] = Seq(f6Zphi, textRepetition, a12Summary,
    m9Intercomparison)
}
