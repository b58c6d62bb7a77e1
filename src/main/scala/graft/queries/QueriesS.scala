package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 19 (round 8): mergeable-sketch set operations (KMV), triangle
  * counting (the degree-ordered orientation at MapReduce scale), SCD
  * Type-2 dimension builds, the bucketed interval join (converting the
  * spec-only AsOf.rangeJoin to the exact DuckDB gate), and MMR
  * diversified rerank — each the canonical member of a workload family
  * the engine had not yet gated.
  */
object QueriesS {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** KMV sketch set operations over the two lineitem halves' order-key
    * domains (heavily overlapping — the interesting intersection case).
    * All four rows (left/right/union/intersect estimates + exact truths)
    * under one hash gate.
    */
  val sketchKmvSetops: QueryDef = {
    val k = 256
    val numer = (k - 1).toDouble * math.pow(2.0, 60)
    val numSql = s"CAST(${numer.toString} AS DOUBLE)"
    val hSql = Ora.md5LongSql("'kmv:' || CAST(l_orderkey AS VARCHAR)")
    def sideSql(tag: String, sk: String, pred: String): String =
      s"""SELECT '$tag' AS side, CAST(n AS BIGINT) AS n_sketch,
        CASE WHEN n < $k THEN CAST(n AS DOUBLE)
             ELSE ROUND($numSql / CAST(mx AS DOUBLE), 6) END AS est_distinct,
        (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
           FROM lineitem WHERE $pred) AS exact_distinct
      FROM (SELECT COUNT(*) AS n, MAX(h) AS mx FROM $sk)"""
    QueryDef(
      "sketch_kmv_setops",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        graft.operators.Sketch.kmvSetOps(
            li.filter(col("l_linenumber") % 2 === 1),
            li.filter(col("l_linenumber") % 2 === 0),
            "l_orderkey", k = k)
          .orderBy(col("side"))
      },
      Some(s"""WITH lh AS MATERIALIZED (SELECT DISTINCT $hSql AS h
          FROM lineitem WHERE l_linenumber % 2 = 1),
        rh AS MATERIALIZED (SELECT DISTINCT $hSql AS h
          FROM lineitem WHERE l_linenumber % 2 = 0),
        lk AS (SELECT h FROM lh ORDER BY h LIMIT $k),
        rk AS (SELECT h FROM rh ORDER BY h LIMIT $k),
        uk AS MATERIALIZED (SELECT h FROM
          (SELECT h FROM lh UNION SELECT h FROM rh) ORDER BY h LIMIT $k),
        bth AS (SELECT u.h FROM uk u JOIN lh USING (h) JOIN rh USING (h)),
        inter AS (SELECT 'intersect' AS side, CAST(nb AS BIGINT) AS n_sketch,
          CASE WHEN nu < $k THEN CAST(nb AS DOUBLE)
               ELSE ROUND((CAST(nb AS DOUBLE) / $k) *
                          ($numSql / CAST(mxu AS DOUBLE)), 6) END AS est_distinct,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM
            (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_linenumber % 2 = 1) a
            JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                  WHERE l_linenumber % 2 = 0) b USING (l_orderkey))
            AS exact_distinct
          FROM (SELECT COUNT(*) AS nu, MAX(h) AS mxu FROM uk)
          CROSS JOIN (SELECT COUNT(*) AS nb FROM bth))
      ${sideSql("left", "lk", "l_linenumber % 2 = 1")}
      UNION ALL ${sideSql("right", "rk", "l_linenumber % 2 = 0")}
      UNION ALL SELECT 'union' AS side, CAST(n AS BIGINT) AS n_sketch,
        CASE WHEN n < $k THEN CAST(n AS DOUBLE)
             ELSE ROUND($numSql / CAST(mx AS DOUBLE), 6) END AS est_distinct,
        (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem)
          AS exact_distinct
      FROM (SELECT COUNT(*) AS n, MAX(h) AS mx FROM uk)
      UNION ALL SELECT * FROM inter
      ORDER BY side"""))
  }

  /** Triangle counting on the co-purchase graph (parts sharing an order):
    * top-20 parts by triangle participation, pure integer counting under
    * the hash gate; the engine's degree-ordered orientation and the
    * mirror's are the same construction, so the join fan-out cap is
    * exercised, not just the final counts.
    */
  val graphTriangleCount: QueryDef = {
    val k = 20
    QueryDef(
      "graph_triangle_count",
      (s, dir) => graft.llm.Graph.triangleCount(
          // the memoized pair relation's key set IS coPurchaseEdges's
          // distinct (a, b) — the count column just drops
          Queries.coPurchasePairs(s, dir).select(col("a"), col("b")),
          k = k)
        .orderBy(col("rank")),
      Some(s"""WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
          FROM lineitem),
        e0 AS MATERIALIZED (SELECT DISTINCT l.item AS a, r.item AS b
          FROM b l JOIN b r USING (ok) WHERE l.item < r.item),
        deg AS MATERIALIZED (SELECT v, COUNT(*) AS deg FROM
          (SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0) GROUP BY v),
        e AS MATERIALIZED (SELECT
          CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e0.a < e0.b)
               THEN e0.a ELSE e0.b END AS src,
          CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e0.a < e0.b)
               THEN e0.b ELSE e0.a END AS dst
          FROM e0 JOIN deg da ON da.v = e0.a JOIN deg db ON db.v = e0.b),
        tri AS (SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
          FROM e e1 JOIN e e2 ON e2.src = e1.dst
          JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        per AS (SELECT part, COUNT(*) AS n_triangles FROM
          (SELECT unnest([x, y, z]) AS part FROM tri) GROUP BY part),
        r AS (SELECT part, n_triangles, ROW_NUMBER() OVER
          (ORDER BY n_triangles DESC, part) AS rank FROM per)
      SELECT CAST(rank AS INT) AS rank, part, n_triangles
      FROM r WHERE rank <= $k ORDER BY rank"""))
  }

  /** SCD Type-2 versioned dimension from the event stream: per-user
    * event_type runs with validity intervals, version numbers, and the
    * is_current flag; bounded to user_id < 30 on BOTH sides (a
    * partition-key predicate — pushed below the windows identically).
    */
  val scd2Dimension: QueryDef = QueryDef(
    "scd2_dimension",
    (s, dir) => graft.operators.Relational.scd2(
        t(s, dir, "events").filter(col("user_id") < 30),
        "user_id", "event_type", "ts", "event_id")
      .orderBy(col("user_id"), col("version")),
    Some("""WITH o AS (SELECT user_id, event_type, ts, event_id,
          LAG(event_type) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events WHERE user_id < 30),
      ch AS (SELECT user_id, event_type, ts, event_id FROM o
        WHERE prev IS NULL OR prev <> event_type),
      v AS (SELECT user_id, event_type, ts AS valid_from,
          CAST(ROW_NUMBER() OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version,
          LEAD(ts) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM ch)
      SELECT user_id, version, event_type, valid_from, valid_to,
        valid_to IS NULL AS is_current
      FROM v ORDER BY user_id, version"""))

  /** Bucketed interval join (AsOf.rangeJoin, previously spec-only):
    * per-user daily activity windows [first event, +4 h] probed by the
    * whole stream — who was active while the anchor users were. The
    * engine's day-bucket explode + residual-predicate equi-join against
    * the mirror's raw theta join: same rows or the hash breaks.
    */
  val intervalJoinBucketed: QueryDef = QueryDef(
    "interval_join_bucketed",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val iv = ev.filter(col("user_id") % 10 === 0)
        .groupBy(col("user_id").as("i_user"),
          to_date(date_trunc("DAY", col("ts"))).as("d"))
        .agg(min(col("ts")).as("i_start"))
        .withColumn("i_end", col("i_start") + expr("INTERVAL 4 HOURS"))
      graft.operators.AsOf.rangeJoin(
          ev.select(col("ts"), col("user_id"), col("value")), iv,
          "ts", "i_start", "i_end", bucketSeconds = 86400L)
        .groupBy(col("i_user"), col("d"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          Ora.dsum6(col("value")).as("sum_v"))
        .orderBy(col("i_user"), col("d"))
    },
    Some(s"""WITH iv AS MATERIALIZED (SELECT user_id AS i_user,
          CAST(date_trunc('day', ts) AS DATE) AS d, MIN(ts) AS i_start,
          MIN(ts) + INTERVAL 4 HOUR AS i_end
        FROM events WHERE user_id % 10 = 0 GROUP BY 1, 2),
      m AS (SELECT iv.i_user, iv.d, e.user_id, e.value
        FROM iv JOIN events e ON e.ts >= iv.i_start AND e.ts <= iv.i_end)
      SELECT i_user, d, CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        ${Ora.dsum6Sql("value")} AS sum_v
      FROM m GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** MMR diversified rerank: query vec 0, top-32 candidates, 8 greedy
    * picks at λ = 0.7, mirrored as 8 unrolled selection steps (the
    * wordpiece precedent). Both engines iterate on identical rounded
    * cosines, so the pick SEQUENCE — not just the final set — is gated.
    */
  val mmrRerank: QueryDef = {
    val dim = 64; val nCand = 32; val k = 8; val lambda = 0.7
    val oml = 1.0 - lambda
    val lSql = s"CAST(${lambda.toString} AS DOUBLE)"
    val omlSql = s"CAST(${oml.toString} AS DOUBLE)"
    val steps = (2 to k).map { i =>
      s"""s$i AS MATERIALIZED (SELECT $i AS rank, cid, rel, score FROM (
          SELECT c.cid, c.rel,
            ROUND($lSql * c.rel - $omlSql * COALESCE(m.ms, 0.0), 10) AS score
          FROM cand c LEFT JOIN (SELECT s.ai AS cid, MAX(s.s) AS ms
            FROM sims s JOIN p${i - 1} p ON s.bi = p.cid GROUP BY 1) m
            USING (cid)
          WHERE c.cid NOT IN (SELECT cid FROM p${i - 1}))
        ORDER BY score DESC, cid LIMIT 1),
        p$i AS (SELECT cid FROM p${i - 1} UNION ALL SELECT cid FROM s$i)"""
    }.mkString(",\n        ")
    val unions = (1 to k).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    QueryDef(
      "mmr_rerank",
      (s, dir) => graft.llm.Similarity.mmrRerank(
          t(s, dir, "embeddings"), "vec_id", "embedding", dim = dim,
          queryId = 0L, nCand = nCand, k = k, lambda = lambda)
        .orderBy(col("rank")),
      Some(s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        r0 AS (SELECT c.vec_id AS cid,
            ROUND(${Ora.cosineSql("c", "q", dim)}, 6) AS rel, c.embedding
          FROM embeddings c, q WHERE c.vec_id <> 0),
        cand AS MATERIALIZED (SELECT cid, rel, embedding FROM r0
          WHERE rel IS NOT NULL ORDER BY rel DESC, cid LIMIT $nCand),
        sims AS MATERIALIZED (SELECT a.cid AS ai, b.cid AS bi,
            ROUND(${Ora.cosineSql("a", "b", dim)}, 6) AS s
          FROM cand a JOIN cand b ON a.cid <> b.cid
          WHERE ${Ora.cosineSql("a", "b", dim)} IS NOT NULL),
        s1 AS MATERIALIZED (SELECT 1 AS rank, cid, rel,
            ROUND($lSql * rel - $omlSql * 0.0, 10) AS score
          FROM cand ORDER BY score DESC, cid LIMIT 1),
        p1 AS (SELECT cid FROM s1),
        $steps
      SELECT CAST(rank AS INT) AS rank, cid AS vec_id, rel, score
      FROM ($unions) ORDER BY rank"""))
  }

  val all: Seq[QueryDef] =
    Seq(sketchKmvSetops, graphTriangleCount, scd2Dimension,
      intervalJoinBucketed, mmrRerank)
}
