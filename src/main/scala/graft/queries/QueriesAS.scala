package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.ml.HydroClass

/** Batch 36 (round 10): the ISO0-height hydrometeor-classification variant
  * (per-group static centroid tables, fixed-range standardization, weighted
  * Minkowski — the `hydroClass_single_over_iso` analog the database_5min
  * ETL path uses).
  */
object QueriesAS {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** J10-iso fixture: per-"radar" (event_type) centroid tables in RAW
    * feature space, standardized by the same fixed ranges as the data —
    * exactly how the reference standardizes constants.HYDRO_CENTROIDS
    * per radar before cdist (radarprocessing.py:755-761).
    */
  private val isoFeatures = Seq("zh", "hr", "hoi")
  private val isoRanges = Seq((0.0, 100.0), (0.0, 23.0), (-25.0, 100.0))
  private val isoWeights = Seq(1.0, 0.75, 0.5)
  private val isoCentroids: Seq[(String, Seq[(String, Seq[Double])])] = Seq(
    "click" -> Seq("LR" -> Seq(20.0, 8.0, 10.0),
      "RN" -> Seq(55.0, 14.0, 40.0), "WS" -> Seq(35.0, 19.0, -10.0)),
    "error" -> Seq("LR" -> Seq(18.0, 6.0, 12.0),
      "RN" -> Seq(58.0, 15.0, 42.0), "WS" -> Seq(32.0, 20.0, -12.0)),
    "purchase" -> Seq("LR" -> Seq(22.0, 9.0, 9.0),
      "RN" -> Seq(52.0, 13.0, 38.0), "WS" -> Seq(37.0, 18.0, -8.0)),
    "signup" -> Seq("LR" -> Seq(19.0, 7.0, 11.0),
      "RN" -> Seq(56.0, 16.0, 41.0), "WS" -> Seq(33.0, 21.0, -11.0)),
    "view" -> Seq("LR" -> Seq(21.0, 8.5, 10.5),
      "RN" -> Seq(54.0, 14.5, 39.0), "WS" -> Seq(36.0, 19.5, -9.0)))

  // ---- SQL mirror generators: the SAME arithmetic, token for token ----
  // Double.toString: shortest round-trip repr, locale-independent (the
  // f"%.1f" interpolator renders "0,5" under comma-decimal locales and
  // would silently change the variadic LEAST/GREATEST arity in the SQL)
  private def fmt(d: Double): String = d.toString
  private def stdSql(e: String, mn: Double, mx: Double): String =
    s"2.0 * (LEAST(GREATEST($e, ${fmt(mn)}), ${fmt(mx)}) - ${fmt(mn)}) / " +
      s"${fmt(mx - mn)} - 1.0"
  private def distSql(cvals: Seq[Double]): String =
    isoFeatures.indices.map { i =>
      val (mn, mx) = isoRanges(i)
      val d = s"(${stdSql(isoFeatures(i), mn, mx)} - " +
        s"(${stdSql(fmt(cvals(i)), mn, mx)}))"
      s"${fmt(isoWeights(i))} * $d * $d"
    }.mkString(" + ")
  private def groupCaseSql(cs: Seq[(String, Seq[Double])]): String = {
    val Seq((n1, v1), (n2, v2), (n3, v3)) = cs
    val (d1, d2, d3) = (distSql(v1), distSql(v2), distSql(v3))
    s"""CASE WHEN ($d1) <= ($d2) AND ($d1) <= ($d3) THEN '$n1'
        WHEN ($d2) <= ($d3) THEN '$n2' ELSE '$n3' END"""
  }

  /** Per-radar nearest-centroid classification with the height-over-ISO0
    * feature — `hydroClass_single_over_iso`
    * (common/radarprocessing.py:707-779; called from
    * database_5min/retrieve_radar_data_5min.py:767 with
    * height_over_iso0 as the 5th feature). Static per-group centroids,
    * pyart fixed-range standardization of BOTH gates and centroids,
    * weighted squared-Euclidean argmin — all compiled into one codegen'd
    * projection (no join, no shuffle; see
    * [[graft.ml.HydroClass.classifyPerGroup]]).
    */
  val j10CentroidIso: QueryDef = QueryDef(
    "j10_nearest_centroid_iso",
    (s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type").as("radar"),
          col("value").as("zh"),
          hour(col("ts")).cast("double").as("hr"),
          (col("value") - hour(col("ts")).cast("double")).as("hoi"))
      val cents = isoCentroids.map { case (g, cs) =>
        g -> cs.map { case (n, vs) => HydroClass.Centroid(n, vs) }
      }.toMap
      HydroClass.classifyPerGroup(ev, "radar", isoFeatures, isoRanges,
          cents, isoWeights)
        .select(col("event_id"), col("radar"), col("hydro_class"))
        .orderBy(col("event_id"))
    },
    Some {
      val radarCase = isoCentroids.map { case (g, cs) =>
        s"WHEN radar = '$g' THEN (${groupCaseSql(cs)})"
      }.mkString("\n        ")
      s"""WITH ev AS (SELECT event_id, event_type AS radar, value AS zh,
          CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS hr,
          value - CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS hoi
        FROM events WHERE value IS NOT NULL)
      SELECT event_id, radar,
        CASE $radarCase END AS hydro_class
      FROM ev ORDER BY event_id"""
    })

  /** M1/M4 frozen-model replay: the predict + bias-correction + clamp
    * stage of the RF pipeline on FIXED trees
    * ([[graft.ml.FrozenRf]] — extracted once from the seeded fit by
    * graft.tools.FreezeRf, MLlib-parity-verified at freeze time), scored
    * as native `when`-chain expressions and mirrored as the identical
    * nested CASE SQL. This puts everything downstream of the RNG under
    * the exact cross-engine hash gate — only `fit` itself remains
    * spec-gated (reference ml/rfdefinitions.py:205-242 predict:
    * forest mean → 'cdf' BC → max(·, 0)).
    */
  val m1PredictFrozen: QueryDef = QueryDef(
    "m1_rf_predict_frozen",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_quantity").as("f1"), col("l_discount").as("f2"),
        col("l_tax").as("f3"))
      li.withColumn("pred", graft.ml.FrozenRf.frozenColumn(
          Seq(col("f1"), col("f2"), col("f3"))))
        .withColumn("pred_bc",
          greatest(lit(0.0), col("pred") * lit(graft.ml.FrozenRf.bcSlope)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          Ora.dsum6(col("pred")).as("sum_pred"),
          Ora.dsum6(col("pred_bc")).as("sum_pred_bc"))
        .orderBy(col("l_returnflag"))
    },
    Some {
      val forest = graft.ml.FrozenRf.frozenSql(Seq("f1", "f2", "f3"))
      s"""WITH li AS (SELECT l_returnflag, l_quantity AS f1,
          l_discount AS f2, l_tax AS f3 FROM lineitem),
        sc AS (SELECT l_returnflag, $forest AS pred FROM li),
        bc AS (SELECT l_returnflag, pred,
          GREATEST(0.0, pred * ${graft.ml.FrozenRf.bcSlope}) AS pred_bc
          FROM sc)
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        ${Ora.dsum6Sql("pred")} AS sum_pred,
        ${Ora.dsum6Sql("pred_bc")} AS sum_pred_bc
      FROM bc GROUP BY l_returnflag ORDER BY l_returnflag"""
    })

  /** Graph ANN (NSW/HNSW family) under the deterministic fixed-seed
    * quantizer: cells from [[graft.llm.Similarity.assignCells]] (the
    * simsearch_ivf_fixed precedent), a navigable edge list (within-cell
    * kNN + hub backbone, [[graft.llm.GraphAnn.nswEdges]]), entry at the
    * query's own cell hub, then 2 beam-search rounds — the whole
    * build→navigate→rank path against the exact unrolled DuckDB mirror.
    */
  /** The fixed-seed cell assignment + m=4 navigable edge list the graph-ANN
    * family shares (simsearch_graph_beam's single-layer search and
    * simsearch_hnsw's layer 0 are the SAME relation) — built + shuffled once
    * per session via [[Queries.memoRel]], the co-purchase/Gram precedent.
    */
  private[queries] def nswCellsShared(s: SparkSession, dir: String): DataFrame =
    Queries.memoRel(s, dir, "nsw_cells_seed8") {
      val emb = t(s, dir, "embeddings")
      val seeds = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell"), col("embedding").as("cv"))
      graft.llm.Similarity.assignCells(emb, "vec_id", "embedding",
        seeds, "cell", "cv", dim = 64)
    }

  /** The graph-ANN pair's ONE edge build: every HNSW layer's edge list
    * (src, dst, lvl for lvl 0..2) from a single
    * [[graft.llm.GraphAnn.nswEdgesLayered]] pass. simsearch_graph_beam's
    * single-layer list IS the lvl=0 slice (bit-identical to
    * [[graft.llm.GraphAnn.nswEdges]] — spec-pinned), and simsearch_hnsw
    * reads all three, so the suite pays the within-cell kNN build exactly
    * once for the whole family.
    */
  private[queries] val NswMaxLevel = 2
  private[queries] def nswEdgesLayeredShared(s: SparkSession,
                                             dir: String): DataFrame = {
    // resolve the cells memo BEFORE entering the edges memo closure:
    // computeIfAbsent nested inside computeIfAbsent on the same map is a
    // documented ConcurrentHashMap recursive-update hazard
    val cells = nswCellsShared(s, dir)
    Queries.memoRel(s, dir, "nsw_edges_layered_m4_L2") {
      graft.llm.GraphAnn.nswEdgesLayered(
        cells.withColumn("lvl",
          graft.llm.GraphAnn.hnswLevelCol(col("vec_id"), NswMaxLevel)),
        "vec_id", "embedding", "ivf_cell", "lvl", dim = 64, m = 4,
        minLevel = 0, maxLevel = NswMaxLevel)
    }
  }

  private[queries] def nswEdgesShared(s: SparkSession, dir: String): DataFrame =
    nswEdgesLayeredShared(s, dir).filter(col("lvl") === 0)
      .select(col("src"), col("dst"))

  val simsearchGraphBeam: QueryDef = {
    val m = 4; val beam = 3; val rounds = 2; val k = 5
    QueryDef(
      "simsearch_graph_beam",
      (s, dir) => {
        import graft.llm.GraphAnn
        val emb = t(s, dir, "embeddings")
        val cells = nswCellsShared(s, dir)
        val edges = nswEdgesShared(s, dir)
        val hubs = GraphAnn.hubs(cells, "vec_id", "ivf_cell")
        val entries = cells.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("ivf_cell"))
          .join(hubs, Seq("ivf_cell"))
          .select(col("qid"), col("hub").as("node"))
        GraphAnn.beamSearch(emb, edges, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", dim = 64, entries,
            k = k, beam = beam, rounds = rounds)
          .orderBy(col("qid"), col("rank"))
      },
      Some {
        import Ora.{dotArrSql, normArrSql}
        def scoreSql(cand: String): String =
          s"""SELECT c.qid, c.node,
              ROUND((${dotArrSql("qe.embedding", "ne.embedding", 64)}) /
                (SQRT(${normArrSql("qe.embedding", 64)}) *
                 SQRT(${normArrSql("ne.embedding", 64)})), 6) AS cos
            FROM $cand c JOIN embeddings qe ON qe.vec_id = c.qid
            JOIN embeddings ne ON ne.vec_id = c.node
            WHERE SQRT(${normArrSql("qe.embedding", 64)}) *
              SQRT(${normArrSql("ne.embedding", 64)}) > 0"""
        // the frontier EXCLUDES already-expanded nodes exactly like
        // GraphAnn.beamSearch's explored-set anti-join — without the
        // NOT EXISTS the mirror re-selects the entry hub into the round-2
        // beam and the two engines search different node sets
        def beamSql(scored: String, explored: Seq[String]): String = {
          val excl = explored.map(f =>
            s"""AND NOT EXISTS (SELECT 1 FROM $f
                WHERE $f.qid = x.qid AND $f.node = x.node)""").mkString(" ")
          s"""SELECT qid, node FROM (SELECT x.qid, x.node, ROW_NUMBER() OVER
              (PARTITION BY x.qid ORDER BY x.cos DESC, x.node) AS rn
              FROM $scored x WHERE 1 = 1 $excl)
            WHERE rn <= $beam"""
        }
        s"""WITH ${QueriesI.fixedAsnCtes},
          pr AS (SELECT a.vec_id AS src, b.vec_id AS dst,
              ROUND((${dotArrSql("ea.embedding", "eb.embedding", 64)}) /
                (SQRT(${normArrSql("ea.embedding", 64)}) *
                 SQRT(${normArrSql("eb.embedding", 64)})), 6) AS cos
            FROM asn a JOIN asn b ON a.ivf_cell = b.ivf_cell
              AND a.vec_id <> b.vec_id
            JOIN embeddings ea ON ea.vec_id = a.vec_id
            JOIN embeddings eb ON eb.vec_id = b.vec_id
            WHERE SQRT(${normArrSql("ea.embedding", 64)}) *
              SQRT(${normArrSql("eb.embedding", 64)}) > 0),
          knn AS (SELECT src, cos, dst FROM (SELECT src, cos, dst,
              ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos DESC, dst)
                AS rn FROM pr)
            WHERE rn <= $m),
          sym AS (SELECT src, cos, dst FROM knn
            UNION SELECT dst, cos, src FROM knn),
          knn2 AS (SELECT src, dst FROM (SELECT src, dst, ROW_NUMBER() OVER
              (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM sym)
            WHERE rn <= ${2 * m}),
          hubs AS (SELECT ivf_cell, MIN(vec_id) AS hub FROM asn GROUP BY 1),
          nodehub AS (SELECT a.vec_id AS src, h.hub AS dst
            FROM asn a JOIN hubs h USING (ivf_cell) WHERE a.vec_id <> h.hub),
          edges AS MATERIALIZED (SELECT src, dst FROM knn2
            UNION SELECT src, dst FROM nodehub
            UNION SELECT h1.hub, h2.hub FROM hubs h1 JOIN hubs h2
              ON h1.hub <> h2.hub),
          ent AS (SELECT a.vec_id AS qid, h.hub AS node
            FROM asn a JOIN hubs h USING (ivf_cell) WHERE a.vec_id < 5),
          s0 AS (${scoreSql("ent")}),
          f1 AS (${beamSql("s0", Seq())}),
          c1 AS (SELECT qid, node FROM s0
            UNION SELECT f.qid, e.dst FROM f1 f JOIN edges e ON e.src = f.node),
          s1 AS (${scoreSql("c1")}),
          f2 AS (${beamSql("s1", Seq("f1"))}),
          c2 AS (SELECT qid, node FROM s1
            UNION SELECT f.qid, e.dst FROM f2 f JOIN edges e ON e.src = f.node),
          s2 AS (${scoreSql("c2")})
        SELECT qid, CAST(rank AS INT) AS rank, vb, cos FROM (
          SELECT qid, node AS vb, cos, ROW_NUMBER() OVER
            (PARTITION BY qid ORDER BY cos DESC, node) AS rank
          FROM s2 WHERE node <> qid)
        WHERE rank <= $k ORDER BY qid, rank"""
      })
  }

  /** CDC changelog → SCD2 dimension history, composed under ONE oracle
    * (s16's op mapping + scd2's versioned intervals with real delete
    * semantics — [[graft.operators.Relational.cdcScd2]]): signup inserts,
    * error deletes, the rest update the tracked attribute. A delete
    * closes the open version; a later op re-opens a new one.
    */
  val cdcScd2E2e: QueryDef = QueryDef(
    "cdc_scd2_e2e",
    (s, dir) => {
      val ops = t(s, dir, "events").filter(col("user_id") < 40)
        .withColumn("op",
          when(col("event_type") === "signup", lit("I"))
            .when(col("event_type") === "error", lit("D"))
            .otherwise(lit("U")))
      graft.operators.Relational.cdcScd2(ops, "user_id", "event_type",
          "ts", "event_id", "op")
        .orderBy(col("user_id"), col("version"))
    },
    Some("""WITH ops AS (SELECT user_id, event_id, ts,
          CASE WHEN event_type = 'signup' THEN 'I'
               WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
          event_type
        FROM events WHERE user_id < 40),
      st AS (SELECT user_id, ts, event_id,
          CASE WHEN op = 'D' THEN NULL ELSE event_type END AS s,
          LAG(CASE WHEN op = 'D' THEN NULL ELSE event_type END) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
          ROW_NUMBER() OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM ops),
      ch AS (SELECT user_id, ts, event_id, s FROM st
        WHERE rn = 1 OR s IS DISTINCT FROM prev),
      iv AS (SELECT user_id, ts, event_id, s, LEAD(ts) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM ch)
      SELECT user_id, CAST(ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS INT) AS version,
        s AS event_type, ts AS valid_from, valid_to,
        valid_to IS NULL AS is_current
      FROM iv WHERE s IS NOT NULL
      ORDER BY user_id, version"""))

  /** Mergeable histogram quantile sketch ([[graft.operators.Sketch
    * .histQuantiles]]) — the quantile member of the sketch family,
    * estimate + exact + a-priori error bound all under one hash gate.
    * sqrt-binned (IEEE sqrt is exactly rounded → bins are bit-identical
    * cross-engine), O(bins) map-combinable state per group; the exact
    * side is the at-rank order statistic via PARTITIONED windows, one
    * sort for all ps (conditional aggregates + stack, not one replay
    * per p); within_bound asserts |est − exact| ≤ the hit bin's width,
    * valid a priori because `saturated` (also gated) is false — no value
    * clamped past the top bin edge (bins/bpu)² = 1024.
    */
  val sketchQuantileHist: QueryDef = {
    val ps = Seq(0.5, 0.9, 0.99)
    val bins = 128; val bpu = 4.0
    QueryDef(
      "sketch_quantile_hist",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, dir, "events")
          .filter(col("value").isNotNull &&
            !isnan(col("value").cast("double")) &&
            col("value").cast("double") >= 0.0)
        val est = graft.operators.Sketch.histQuantiles(
          ev, "event_type", "value", ps, bins = bins, binsPerUnit = bpu)
        val ranked = ev
          .select(col("event_type"), col("value").cast("double").as("v"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("v"))))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("event_type"))))
        val exAggs = ps.zipWithIndex.map { case (p, i) =>
          max(when(col("rn") === ceil(lit(p) * col("n")), col("v")))
            .as(s"__x$i")
        }
        val exAggd = ranked.groupBy(col("event_type"))
          .agg(exAggs.head, exAggs.tail: _*)
        val stackArgs = ps.zipWithIndex.map { case (p, i) =>
          s"CAST(${p} AS DOUBLE), __x$i"
        }.mkString(", ")
        val exacts = exAggd.select(col("event_type"),
          expr(s"stack(${ps.size}, $stackArgs) AS (p, exact_q)"))
        est.join(exacts, Seq("event_type", "p"))
          .select(col("event_type"), col("p"),
            round(col("est_q"), 6).as("est_q"), col("exact_q"),
            round(abs(col("est_q") - col("exact_q")), 6).as("abs_err"),
            (abs(col("est_q") - col("exact_q")) <=
              (col("bin_hi") - col("bin_lo"))).as("within_bound"),
            col("saturated"))
          .orderBy(col("event_type"), col("p"))
      },
      Some {
        def estP(p: Double): String =
          s"""SELECT event_type, CAST($p AS DOUBLE) AS p,
            (CAST(bin AS DOUBLE) / $bpu) * (CAST(bin AS DOUBLE) / $bpu) +
            (((CAST(bin AS DOUBLE) + 1.0) / $bpu) *
               ((CAST(bin AS DOUBLE) + 1.0) / $bpu) -
             (CAST(bin AS DOUBLE) / $bpu) * (CAST(bin AS DOUBLE) / $bpu)) *
            ((CAST(CEIL($p * n) AS DOUBLE) - CAST(cum - cnt AS DOUBLE)) /
              CAST(cnt AS DOUBLE)) AS est_q,
            (CAST(bin AS DOUBLE) / $bpu) * (CAST(bin AS DOUBLE) / $bpu)
              AS bin_lo,
            ((CAST(bin AS DOUBLE) + 1.0) / $bpu) *
              ((CAST(bin AS DOUBLE) + 1.0) / $bpu) AS bin_hi,
            sat AS sat
          FROM cum
          WHERE CAST(cum AS DOUBLE) >= CAST(CEIL($p * n) AS DOUBLE)
            AND CAST(cum - cnt AS DOUBLE) < CAST(CEIL($p * n) AS DOUBLE)"""
        def exP(p: Double): String =
          s"""SELECT event_type, CAST($p AS DOUBLE) AS p,
            MAX(CASE WHEN rn = CEIL($p * n) THEN v END) AS exact_q
          FROM ranked GROUP BY 1"""
        s"""WITH ev AS (SELECT event_type, CAST(value AS DOUBLE) AS v
            FROM events WHERE value IS NOT NULL
              AND NOT isnan(CAST(value AS DOUBLE))
              AND CAST(value AS DOUBLE) >= 0.0),
          b AS (SELECT event_type,
              CAST(GREATEST(FLOOR(LEAST(SQRT(v) * $bpu,
                ${(bins - 1).toDouble})), 0) AS INT) AS bin,
              CASE WHEN SQRT(v) * $bpu >= ${bins.toDouble}
                THEN 1 ELSE 0 END AS cl
            FROM ev),
          cnts AS (SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS cnt,
              MAX(cl) AS clb
            FROM b GROUP BY 1, 2),
          cum AS (SELECT event_type, bin, cnt,
              SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
              SUM(cnt) OVER (PARTITION BY event_type) AS n,
              MAX(clb) OVER (PARTITION BY event_type) AS sat
            FROM cnts),
          est AS (${ps.map(estP).mkString("\n            UNION ALL ")}),
          ranked AS (SELECT event_type, v,
              ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
              COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM ev),
          ex AS (${ps.map(exP).mkString("\n            UNION ALL ")})
        SELECT e.event_type, e.p, ROUND(e.est_q, 6) AS est_q, x.exact_q,
          ROUND(ABS(e.est_q - x.exact_q), 6) AS abs_err,
          ABS(e.est_q - x.exact_q) <= (e.bin_hi - e.bin_lo) AS within_bound,
          e.sat = 1 AS saturated
        FROM est e JOIN ex x ON x.event_type = e.event_type AND x.p = e.p
        ORDER BY e.event_type, e.p"""
      })
  }

  val all: Seq[QueryDef] = Seq(j10CentroidIso, m1PredictFrozen,
    simsearchGraphBeam, cdcScd2E2e, sketchQuantileHist)
}
