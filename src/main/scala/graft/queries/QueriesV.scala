package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.operators.{Behavior, Stats}

/** Batch 22 (round 8): statistical modelling + sequence analytics —
  * per-group OLS trend fits, Pareto frontier, Markov transition matrix,
  * top-k entry paths, and chi-squared distinctive terms. Every mirror is
  * the step-for-step DuckDB transliteration of the Spark plan (decimal
  * sufficient statistics, explicit double casts before any product that
  * could overflow int64, rounded outputs).
  */
object QueriesV {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Per-event-type OLS trend of value on time (days since epoch day
    * 20000, i.e. 2024-10-04): slope/intercept/R² from decimal-exact
    * sufficient statistics. The fixed x-offset is load-bearing for the
    * cross-engine gate: with raw epoch days (mean ≈ 20600, spread a few
    * hundred) the normal-equation cancellation n·Σx² − (Σx)² amplifies
    * double ULP noise past the 6-dp round (observed: intercept off by
    * 5e-6); centering cuts the mean/spread ratio ~50× and the amplified
    * error ~2500×.
    */
  val a21GroupedOls: QueryDef = {
    val sums = Seq("x" -> "sx", "y" -> "sy", "x * x" -> "sxx",
      "x * y" -> "sxy", "y * y" -> "syy")
      .map { case (e, n) =>
        s"CAST(SUM(CAST(($e) AS DECIMAL(27,10))) AS DOUBLE) AS $n" }
      .mkString(",\n          ")
    QueryDef(
      "a21_grouped_ols",
      (s, dir) => Stats.groupedOls(
          t(s, dir, "events")
            .select(col("event_type"),
              (unix_timestamp(col("ts")) / lit(86400.0) - lit(20000.0)).as("x"),
              col("value").as("y")),
          "event_type", "x", "y")
        .orderBy(col("event_type")),
      Some(s"""WITH b AS (SELECT event_type,
          CAST(FLOOR(EPOCH(ts)) AS BIGINT) / 86400.0 - 20000.0 AS x,
          value AS y
          FROM events),
        s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          $sums,
          MIN(x) AS mnx, MAX(x) AS mxx, MIN(y) AS mny, MAX(y) AS mxy
          FROM b WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY 1)
      SELECT event_type, n,
        CASE WHEN mxx > mnx THEN
          ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) /
            (CAST(n AS DOUBLE) * sxx - sx * sx), 6) END AS slope,
        CASE WHEN mxx > mnx THEN
          ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) /
              (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) /
            CAST(n AS DOUBLE), 6) END AS intercept,
        CASE WHEN mxx > mnx AND mxy > mny THEN
          ROUND(((CAST(n AS DOUBLE) * sxy - sx * sy) *
              (CAST(n AS DOUBLE) * sxy - sx * sy)) /
            ((CAST(n AS DOUBLE) * sxx - sx * sx) *
              (CAST(n AS DOUBLE) * syy - sy * sy)), 6) END AS r2
      FROM s ORDER BY event_type"""))
  }

  /** Pareto frontier of the part catalogue under (minimize retail price,
    * maximize size) — per-price contraction + running max, never the
    * quadratic dominance join.
    */
  val skylinePareto: QueryDef = QueryDef(
    "skyline_pareto",
    (s, dir) => Stats.skyline2d(t(s, dir, "part"),
        "p_partkey", "p_retailprice", "p_size")
      .orderBy(col("p_retailprice"), col("p_partkey")),
    Some("""WITH pm AS (SELECT p_retailprice AS cost, MAX(p_size) AS maxg
        FROM part GROUP BY 1),
      r AS (SELECT cost, maxg, MAX(maxg) OVER (ORDER BY cost
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax FROM pm)
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p JOIN r ON p.p_retailprice = r.cost
    WHERE p.p_size = r.maxg AND (r.prevmax IS NULL OR r.maxg > r.prevmax)
    ORDER BY p_retailprice, p_partkey"""))

  /** First-order Markov transition matrix over per-user event sequences. */
  val markovTransitions: QueryDef = QueryDef(
    "markov_transitions",
    (s, dir) => Stats.markovTransitions(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
      .orderBy(col("src"), col("dst")),
    Some("""WITH pr AS (SELECT event_type AS src,
        LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS dst FROM events),
      c AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM pr WHERE dst IS NOT NULL GROUP BY 1, 2)
    SELECT src, dst, n_trans,
      ROUND(CAST(n_trans AS DOUBLE) /
        CAST(SUM(n_trans) OVER (PARTITION BY src) AS DOUBLE), 6) AS prob
    FROM c ORDER BY src, dst"""))

  /** Top-15 three-step entry paths by user count. */
  val pathTopK: QueryDef = {
    val len = 3; val k = 15
    QueryDef(
      "b6_path_topk",
      (s, dir) => Behavior.pathTopK(t(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type", len = len, k = k)
        .orderBy(col("rank")),
      Some(s"""WITH f AS (SELECT user_id, event_type, ROW_NUMBER() OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events),
        p AS (SELECT user_id,
          ${(1 to len).map(i =>
            s"MAX(CASE WHEN rn = $i THEN event_type END) AS p$i")
            .mkString(",\n          ")}
          FROM f WHERE rn <= $len GROUP BY 1),
        c AS (SELECT CONCAT_WS('>', ${(1 to len).map("p" + _).mkString(", ")})
            AS path, CAST(COUNT(*) AS BIGINT) AS n_users FROM p GROUP BY 1),
        r AS (SELECT path, n_users, ROW_NUMBER() OVER
          (ORDER BY n_users DESC, path) AS rank FROM c)
      SELECT CAST(rank AS INT) AS rank, path, n_users
      FROM r WHERE rank <= $k ORDER BY rank"""))
  }

  /** Chi-squared distinctive terms per language over documents. */
  val chi2Terms: QueryDef = {
    val minCount = 20; val k = 10
    QueryDef(
      "text_chi2_terms",
      (s, dir) => graft.llm.TextAnalysis.chi2Terms(
          t(s, dir, "documents"), "lang", "text", minCount = minCount, k = k)
        .orderBy(col("class"), col("rank")),
      Some(s"""WITH occ AS (SELECT lang AS class,
          unnest(${Ora.toksSql}) AS token FROM documents),
        a AS (SELECT class, token, CAST(COUNT(*) AS BIGINT) AS a
          FROM occ GROUP BY 1, 2),
        tt AS (SELECT token, CAST(SUM(a) AS BIGINT) AS tt FROM a
          GROUP BY 1 HAVING CAST(SUM(a) AS BIGINT) >= $minCount),
        ct AS (SELECT class, CAST(SUM(a) AS BIGINT) AS ct FROM a GROUP BY 1),
        nn AS (SELECT CAST(SUM(a) AS BIGINT) AS nn FROM a),
        x AS (SELECT class, token, a, tt,
          ROUND(CAST(nn AS DOUBLE) *
              (CAST(a AS DOUBLE) * CAST(nn AS DOUBLE) -
                CAST(tt AS DOUBLE) * CAST(ct AS DOUBLE)) *
              (CAST(a AS DOUBLE) * CAST(nn AS DOUBLE) -
                CAST(tt AS DOUBLE) * CAST(ct AS DOUBLE)) /
            (CAST(tt AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(tt AS DOUBLE)) *
              CAST(ct AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(ct AS DOUBLE))),
            6) AS chi2
          FROM a JOIN tt USING (token) JOIN ct USING (class) CROSS JOIN nn),
        rk AS (SELECT class, token, a, tt, chi2, ROW_NUMBER() OVER
          (PARTITION BY class ORDER BY chi2 DESC, token) AS rank FROM x)
      SELECT class, CAST(rank AS INT) AS rank, token, a AS n_in_class,
        tt AS n_total, chi2
      FROM rk WHERE rank <= $k ORDER BY class, rank"""))
  }

  /** Per-language unigram entropy + KL divergence vs the pooled corpus. */
  val entropyKl: QueryDef = QueryDef(
    "text_entropy_kl",
    (s, dir) => graft.llm.TextAnalysis.entropyKl(
        t(s, dir, "documents"), "lang", "text")
      .orderBy(col("class")),
    Some(s"""WITH occ AS (SELECT lang AS class,
        unnest(${Ora.toksSql}) AS token FROM documents),
      a AS (SELECT class, token, CAST(COUNT(*) AS BIGINT) AS a
        FROM occ GROUP BY 1, 2),
      tt AS (SELECT token, CAST(SUM(a) AS BIGINT) AS tt FROM a GROUP BY 1),
      ct AS (SELECT class, CAST(SUM(a) AS BIGINT) AS ct FROM a GROUP BY 1),
      nn AS (SELECT CAST(SUM(a) AS BIGINT) AS nn FROM a),
      j AS (SELECT class, ct,
        CAST(a AS DOUBLE) / CAST(ct AS DOUBLE) AS p,
        CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE) AS q
        FROM a JOIN tt USING (token) JOIN ct USING (class) CROSS JOIN nn)
    SELECT class, CAST(COUNT(*) AS BIGINT) AS vocab,
      ANY_VALUE(ct) AS n_tokens,
      ROUND(CAST(SUM(CAST(-p * LN(p) AS DECIMAL(27,10))) AS DOUBLE), 6)
        AS entropy_nats,
      ROUND(CAST(SUM(CAST(p * LN(p / q) AS DECIMAL(27,10))) AS DOUBLE), 6)
        AS kl_vs_corpus
    FROM j GROUP BY class ORDER BY class"""))

  val all: Seq[QueryDef] =
    Seq(a21GroupedOls, skylinePareto, markovTransitions, pathTopK,
      chi2Terms, entropyKl)
}
