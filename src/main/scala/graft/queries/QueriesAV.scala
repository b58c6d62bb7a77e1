package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.functions.Layout
import graft.ml.Pca
import graft.llm.Coreset
import graft.operators.{Behavior, Stats}

/** Batch 48 (round 11 depth): distributed PCA by power iteration, greedy
  * k-center coreset selection, CUSUM change-point detection, length-3
  * sequential-pattern mining, multi-touch attribution, and the small-file
  * compaction planner — analytics/curation capabilities none of the
  * existing 246 queries cover.
  */
object QueriesAV {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  private val pcaIters = 6
  private val pcaDim = 64

  /** The unrolled w/n/v CTE chain of [[Pca.powerIteration]] over the
    * NORMALIZED Gram — one decimal matvec + one decimal norm per round,
    * both rounded 6 dp in decimal before the cast, token-identical
    * arithmetic.
    */
  private def pcaRoundsSql(iters: Int): String =
    (1 to iters).map { r =>
      s"""w$r AS (SELECT g.i, CAST(ROUND(SUM(CAST(g.g * v.v AS DECIMAL(27,10))), 6) AS DOUBLE) AS w
          FROM gn g JOIN v${r - 1} v ON g.j = v.i GROUP BY g.i),
        n$r AS (SELECT CAST(ROUND(SUM(CAST(w * w AS DECIMAL(27,10))), 6) AS DOUBLE) AS n2 FROM w$r),
        v$r AS (SELECT i, w / SQRT(n2) AS v FROM w$r CROSS JOIN n$r)"""
    }.mkString(",\n        ")

  /** Top principal component of the embedding corpus ([[Pca.topComponent]]):
    * one distributed Gram pass (d² decimal sums, map-side combinable — the
    * ONLY stage that touches the corpus) + 6 relational power-iteration
    * rounds on the 64×64 Gram + sign normalization + Rayleigh lambda. The
    * mirror unrolls the identical rounds as CTEs.
    */
  /** The corpus Gram, built + checkpointed ONCE per session — shared by
    * pca_power_iteration and pca_deflation_top2 (the graph-family memo
    * pattern; the Gram pass is both queries' only corpus-touching stage).
    */
  private[queries] def gramShared(s: SparkSession, dir: String): DataFrame =
    Queries.memoRel(s, dir, s"pca_gram_$pcaDim") {
      Pca.gram(t(s, dir, "embeddings"), "embedding", pcaDim)
    }

  val pcaPowerIteration: QueryDef = QueryDef(
    "pca_power_iteration",
    (s, dir) => {
      Pca.powerIteration(gramShared(s, dir), pcaDim, pcaIters)
        .orderBy(col("comp"))
    },
    Some(s"""WITH g AS MATERIALIZED (
        SELECT gi.i, gj.j,
          CAST(CAST(SUM(CAST(FLOOR((CAST(e.embedding[gi.i] AS DOUBLE) * CAST(e.embedding[gj.j] AS DOUBLE))
            * 1.0E8) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1.0E8 AS g
        FROM embeddings e, generate_series(1, $pcaDim) gi(i), generate_series(1, $pcaDim) gj(j)
        WHERE e.embedding IS NOT NULL AND len(e.embedding) = $pcaDim
        GROUP BY gi.i, gj.j),
      sc AS (SELECT MAX(ABS(g)) AS s FROM g),
      gn AS MATERIALIZED (SELECT i, j, g / s AS g FROM g CROSS JOIN sc),
      v0 AS (SELECT t.i, 1.0 / SQRT(${pcaDim.toDouble}) AS v
        FROM generate_series(1, $pcaDim) t(i)),
      ${pcaRoundsSql(pcaIters)},
      lam AS (SELECT CAST(ROUND(SUM(CAST(vi.v * g.g * vj.v AS DECIMAL(27,10))), 6) AS DOUBLE) AS lamhat
        FROM gn g JOIN v$pcaIters vi ON g.i = vi.i JOIN v$pcaIters vj ON g.j = vj.i),
      sgn AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sg
        FROM v$pcaIters ORDER BY ABS(v) DESC, i LIMIT 1)
      SELECT v.i AS comp, ROUND(v.v * sg, 6) AS loading,
        ROUND(lamhat * s, 6) AS lambda
      FROM v$pcaIters v CROSS JOIN sgn CROSS JOIN lam CROSS JOIN sc
      ORDER BY comp"""))

  /** PCA anomaly detection ([[Pca.projectAnomalies]]) — the APPLY side of
    * the trained component: project every embedding onto the gated
    * loadings and rank by reconstruction error through the bounded TopK
    * aggregator. Train and apply share the one memoized session Gram.
    * recon_err is emitted RAW: both operands are 1e-10-quantized
    * rationals, so the error can terminate on a 6-dp half boundary — the
    * one case engines round differently; the unrounded doubles are
    * bit-identical by construction.
    */
  val pcaAnomalyTopk: QueryDef = QueryDef(
    "pca_anomaly_topk",
    (s, dir) => {
      val comps = Pca.powerIteration(gramShared(s, dir), pcaDim, pcaIters)
      Pca.projectAnomalies(t(s, dir, "embeddings"), "vec_id", "embedding",
        pcaDim, comps, k = 20)
        .orderBy(col("rank"))
    },
    Some(s"""WITH g AS MATERIALIZED (
        SELECT gi.i, gj.j,
          CAST(CAST(SUM(CAST(FLOOR((CAST(e.embedding[gi.i] AS DOUBLE) * CAST(e.embedding[gj.j] AS DOUBLE))
            * 1.0E8) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1.0E8 AS g
        FROM embeddings e, generate_series(1, $pcaDim) gi(i), generate_series(1, $pcaDim) gj(j)
        WHERE e.embedding IS NOT NULL AND len(e.embedding) = $pcaDim
        GROUP BY gi.i, gj.j),
      sc AS (SELECT MAX(ABS(g)) AS s FROM g),
      gn AS MATERIALIZED (SELECT i, j, g / s AS g FROM g CROSS JOIN sc),
      v0 AS (SELECT t.i, 1.0 / SQRT(${pcaDim.toDouble}) AS v
        FROM generate_series(1, $pcaDim) t(i)),
      ${pcaRoundsSql(pcaIters)},
      sgn AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sg
        FROM v$pcaIters ORDER BY ABS(v) DESC, i LIMIT 1),
      ldg AS (SELECT v.i AS comp, ROUND(v.v * sg, 6) AS loading
        FROM v$pcaIters v CROSS JOIN sgn),
      expl AS (SELECT e.vec_id AS id, t.i AS comp,
          CAST(e.embedding[t.i] AS DOUBLE) AS x
        FROM embeddings e, generate_series(1, $pcaDim) t(i)
        WHERE e.embedding IS NOT NULL AND len(e.embedding) = $pcaDim),
      pr AS (SELECT id,
          CAST(CAST(SUM(CAST(FLOOR((x * loading) * 1.0E10) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1.0E10 AS score,
          CAST(CAST(SUM(CAST(FLOOR((x * x) * 1.0E10) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1.0E10 AS n2
        FROM expl JOIN ldg USING (comp) GROUP BY id),
      er AS (SELECT id, n2 - score * score AS err FROM pr)
      SELECT CAST(rank AS INT) AS rank, id, err AS recon_err FROM (
        SELECT id, err, ROW_NUMBER() OVER (ORDER BY err DESC, id) AS rank
        FROM er)
      WHERE rank <= 20 ORDER BY rank"""))

  private val kcK = 5
  private val kcDim = 64

  /** The per-round CTE chain of [[Coreset.kCenterSelect]]: each round
    * scores every not-yet-chosen candidate by its min squared-L2 distance
    * to the chosen set and takes the argmax (ties → smallest id) — the
    * structural not-chosen test is the same join-cardinality count the
    * Scala side uses.
    */
  private def kcRoundsSql(k: Int, dim: Int): String = {
    val nb = Ora.normArrSql("b.v", dim)
    val nc = Ora.normArrSql("c.v", dim)
    val dbc = Ora.dotArrSql("b.v", "c.v", dim)
    (2 to k).map { r =>
      s"""r$r AS (SELECT $r AS sel_order, id, v, dist FROM (
          SELECT b.id, b.v, MIN(($nb) + ($nc) - 2.0 * ($dbc)) AS dist,
            COUNT(*) AS nc
          FROM base b JOIN c${r - 1} c ON b.id <> c.id
          GROUP BY b.id, b.v)
        WHERE nc = ${r - 1} ORDER BY dist DESC, id LIMIT 1),
        c$r AS (SELECT * FROM c${r - 1} UNION ALL SELECT * FROM r$r)"""
    }.mkString(",\n        ")
  }

  /** Greedy k-center (farthest-point) coreset selection over the embedding
    * corpus ([[Coreset.kCenterSelect]]): max-norm seed, then k−1 rounds of
    * argmax-of-min-distance, each one broadcast pass over the corpus.
    */
  val sampleKCenter: QueryDef = QueryDef(
    "sample_kcenter",
    (s, dir) => {
      Coreset.kCenterSelect(t(s, dir, "embeddings"), "vec_id", "embedding",
        kcDim, kcK).orderBy(col("sel_order"))
    },
    Some(s"""WITH base AS (SELECT vec_id AS id, embedding AS v FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) = $kcDim),
      c1 AS (SELECT 1 AS sel_order, id, v, CAST(NULL AS DOUBLE) AS dist FROM (
        SELECT id, v FROM base
        ORDER BY (${Ora.normArrSql("v", kcDim)}) DESC, id LIMIT 1)),
      ${kcRoundsSql(kcK, kcDim)}
      SELECT sel_order, id, ROUND(dist, 6) AS dist FROM c$kcK
      ORDER BY sel_order"""))

  /** Per-user CUSUM change point ([[Stats.cusumChangePoint]]): the peak of
    * the running centered sum over each user's value series, exact decimal
    * cumsum, argmax tie-broken by earliest (ts, event_id).
    */
  val tsCusum: QueryDef = QueryDef(
    "ts_cusum_changepoint",
    (s, dir) => {
      Stats.cusumChangePoint(t(s, dir, "events"), "user_id", "ts",
        "event_id", "value").orderBy(col("user_id"))
    },
    Some("""WITH c AS (SELECT user_id, ts, event_id, value,
          CAST(SUM(CAST(value AS DECIMAL(27,10))) OVER (PARTITION BY user_id) AS DOUBLE)
            / CAST(COUNT(*) OVER (PARTITION BY user_id) AS DOUBLE) AS m
        FROM events
        WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL),
      s AS (SELECT user_id, ts, event_id,
          SUM(CAST(value - m AS DECIMAL(27,10))) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sdec,
          COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM c),
      r AS (SELECT user_id, n, ts, event_id, sdec,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY ABS(sdec) DESC, ts, event_id) AS rn
        FROM s)
      SELECT user_id, CAST(n AS BIGINT) AS n, ts AS cp_ts, event_id AS cp_id,
        CAST(ROUND(sdec, 6) AS DOUBLE) AS cusum_stat,
        CAST(ROUND(ABS(sdec), 6) AS DOUBLE) AS cusum_abs
      FROM r WHERE rn = 1 ORDER BY user_id"""))

  /** Length-3 sequential-pattern support over per-user event sequences
    * ([[Behavior.sequencePatternSupport]]): (ta,tb,tc) is supported when
    * some tb event sits strictly between the user's first ta and last tc.
    */
  val seqPatternTriples: QueryDef = QueryDef(
    "seq_pattern_triples",
    (s, dir) => {
      Behavior.sequencePatternSupport(t(s, dir, "events"), "user_id", "ts",
        "event_id", "event_type", minSupport = 10L)
        .orderBy(col("ta"), col("tb"), col("tc"))
    },
    Some("""WITH pos AS (SELECT user_id AS u, event_type AS ty,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
        FROM events WHERE ts IS NOT NULL),
      ext AS (SELECT u, ty, MIN(p) AS mnp, MAX(p) AS mxp FROM pos GROUP BY u, ty),
      sup AS (SELECT DISTINCT m.u, a.ty AS ta, m.ty AS tb, c.ty AS tc
        FROM pos m
        JOIN ext a ON a.u = m.u AND a.mnp < m.p
        JOIN ext c ON c.u = m.u AND m.p < c.mxp)
      SELECT ta, tb, tc, CAST(COUNT(*) AS BIGINT) AS support
      FROM sup GROUP BY ta, tb, tc
      HAVING COUNT(*) >= 10
      ORDER BY ta, tb, tc"""))

  /** Multi-touch attribution ([[Behavior.attribution]]): purchases credit
    * click/view touches within the prior 7 days — linear 1/n shares
    * (decimal-exact) and last-touch — plus the 'direct' remainder.
    */
  val attributionCredit: QueryDef = QueryDef(
    "attribution_credit",
    (s, dir) => {
      Behavior.attribution(t(s, dir, "events"), "user_id", "ts", "event_id",
        "event_type", convType = "purchase",
        touchTypes = Seq("click", "view"), windowDays = 7)
        .orderBy(col("channel"))
    },
    Some("""WITH conv AS (SELECT user_id AS u, ts AS cts, event_id AS cid
          FROM events WHERE event_type = 'purchase'),
      tch AS (SELECT user_id AS u, ts AS tts, event_id AS tid,
          event_type AS channel
        FROM events WHERE event_type IN ('click', 'view')),
      j AS (SELECT c.u, c.cid, t.channel, t.tts, t.tid
        FROM conv c JOIN tch t ON c.u = t.u
        WHERE t.tts < c.cts AND t.tts >= c.cts - INTERVAL 7 DAY),
      cr AS (SELECT channel, u, cid,
          1.0 / CAST(COUNT(*) OVER (PARTITION BY u, cid) AS DOUBLE) AS lin,
          CASE WHEN ROW_NUMBER() OVER (PARTITION BY u, cid
              ORDER BY tts DESC, tid DESC) = 1
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS lst
        FROM j),
      pc AS (SELECT channel, u, cid,
          SUM(CAST(lin AS DECIMAL(27,10))) AS lin, MAX(lst) AS lst
        FROM cr GROUP BY channel, u, cid),
      att AS (SELECT channel, CAST(COUNT(*) AS BIGINT) AS conversions,
          CAST(ROUND(SUM(lin), 6) AS DOUBLE) AS linear_credit,
          CAST(SUM(lst) AS BIGINT) AS last_touch_credit
        FROM pc GROUP BY channel),
      direct AS (SELECT 'direct' AS channel,
          CAST(COUNT(*) AS BIGINT) AS conversions,
          CAST(COUNT(*) AS DOUBLE) AS linear_credit,
          CAST(COUNT(*) AS BIGINT) AS last_touch_credit
        FROM conv WHERE NOT EXISTS (SELECT 1 FROM j
          WHERE j.u = conv.u AND j.cid = conv.cid)
        HAVING COUNT(*) > 0)
      SELECT * FROM att UNION ALL SELECT * FROM direct ORDER BY channel"""))

  /** Small-file compaction plan ([[Layout.compactionPlan]]) over a manifest
    * derived from orders (one "file" per (month, orderkey%50), sized by its
    * decimal-exact price sum): largest-first next-fit-by-offset binning to
    * a 1 MB target — pure window arithmetic over the manifest.
    */
  val layoutCompactionPlan: QueryDef = QueryDef(
    "layout_compaction_plan",
    (s, dir) => {
      val manifest = t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("part"),
          pmod(col("o_orderkey"), lit(50)).as("file"))
        .agg(round(sum(col("o_totalprice").cast("decimal(27,10)")), 0)
          .cast("long").as("size"))
      Layout.compactionPlan(manifest, "part", "file", "size", 1000000L)
        .orderBy(col("part"), col("bin"), col("file"))
    },
    Some("""WITH manifest AS (SELECT strftime(o_orderdate, '%Y-%m') AS part,
          o_orderkey % 50 AS file,
          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,10))), 0) AS BIGINT) AS size
        FROM orders GROUP BY 1, 2),
      pl AS (SELECT part, file, size,
          COALESCE(SUM(size) OVER (PARTITION BY part
            ORDER BY size DESC, file
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
        FROM manifest)
      SELECT part, file, size,
        CAST((strt - (strt % 1000000)) / 1000000 AS BIGINT) AS bin
      FROM pl ORDER BY part, bin, file"""))

  val all: Seq[QueryDef] = Seq(pcaPowerIteration, pcaAnomalyTopk, sampleKCenter, tsCusum,
    seqPatternTriples, attributionCredit, layoutCompactionPlan)
}
