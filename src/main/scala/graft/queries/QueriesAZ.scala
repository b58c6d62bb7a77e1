package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 38 (round 12): multi-layer HNSW — the hierarchy member of the
  * graph-ANN family ([[graft.llm.GraphAnn.hnswSearch]]) under the exact
  * cross-engine hash gate, and the bitemporal snapshot companion to the
  * SCD2/CDC machinery.
  */
object QueriesAZ {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Multi-layer HNSW search against the exact unrolled DuckDB mirror:
    * deterministic md5-coin levels (4^-l occupancy,
    * [[graft.llm.GraphAnn.hnswLevels]]), per-layer navigable graphs
    * (within-cell kNN + hub backbone over the layer members), descent from
    * the apex entry point with the ef-carry (top-`beam` of each upper
    * layer's visited set seeds the next layer), full beam search at layer
    * 0 — the whole hierarchy build → descend → search path mirrored CTE
    * for CTE (the simsearch_graph_beam precedent, reference HNSW role:
    * the scale path next to IVF for embedding near-neighbor retrieval).
    */
  val simsearchHnsw: QueryDef = {
    val m = 4; val beam = 3; val rounds = 2; val k = 5; val maxLevel = 2
    QueryDef(
      "simsearch_hnsw",
      (s, dir) => {
        import graft.llm.GraphAnn
        val emb = t(s, dir, "embeddings")
        // EVERY edge list (all three layers) comes from the one memoized
        // layered build the graph-ANN pair shares — this query adds zero
        // build jobs of its own; only the descent + search run here
        val cells = QueriesAS.nswCellsShared(s, dir)
        val allEdges = QueriesAS.nswEdgesLayeredShared(s, dir)
        def layerE(l: Int) = allEdges.filter(col("lvl") === l)
          .select(col("src"), col("dst"))
        val queries = emb.filter(col("vec_id") < 5)
        // apex = smallest top-layer member, as a LAZY 1-row broadcast
        // cross (no driver collect job); assert_true keeps the
        // empty-apex contract loud and un-prunable (it guards the value)
        val apex = cells
          .withColumn("lvl", GraphAnn.hnswLevelCol(col("vec_id"), maxLevel))
          .filter(col("lvl") >= maxLevel)
          .agg(min(col("vec_id")).as("node"))
          .select(when(assert_true(col("node").isNotNull,
            lit("simsearch_hnsw: empty apex layer")).isNull,
            col("node")).as("node"))
        val entries = queries.select(col("vec_id").as("qid"))
          .crossJoin(broadcast(apex))
        GraphAnn.hnswSearchPrebuilt(emb, queries, "vec_id", "embedding",
            dim = 64, (maxLevel to 1 by -1).map(layerE), layerE(0),
            entries, k = k, beam = beam, rounds = rounds)
          .orderBy(col("qid"), col("rank"))
      },
      Some {
        import Ora.{dotArrSql, normArrSql, md5LongSql}
        val h = md5LongSql("CAST(vec_id AS VARCHAR)")
        // the navigable-graph block over a member CTE — the same
        // pr→knn→sym→knn2→hubs→nodehub→edges chain as the
        // simsearch_graph_beam mirror, suffixed per layer
        def edgeCtes(x: String, mem: String): String =
          s"""pr$x AS (SELECT a.vec_id AS src, b.vec_id AS dst,
              ROUND((${dotArrSql("ea.embedding", "eb.embedding", 64)}) /
                (SQRT(${normArrSql("ea.embedding", 64)}) *
                 SQRT(${normArrSql("eb.embedding", 64)})), 6) AS cos
            FROM $mem a JOIN $mem b ON a.ivf_cell = b.ivf_cell
              AND a.vec_id <> b.vec_id
            JOIN embeddings ea ON ea.vec_id = a.vec_id
            JOIN embeddings eb ON eb.vec_id = b.vec_id
            WHERE SQRT(${normArrSql("ea.embedding", 64)}) *
              SQRT(${normArrSql("eb.embedding", 64)}) > 0),
          knn$x AS (SELECT src, cos, dst FROM (SELECT src, cos, dst,
              ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos DESC, dst)
                AS rn FROM pr$x)
            WHERE rn <= $m),
          sym$x AS (SELECT src, cos, dst FROM knn$x
            UNION SELECT dst, cos, src FROM knn$x),
          knn2$x AS (SELECT src, dst FROM (SELECT src, dst, ROW_NUMBER()
              OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
              FROM sym$x)
            WHERE rn <= ${2 * m}),
          hubs$x AS (SELECT ivf_cell, MIN(vec_id) AS hub FROM $mem
            GROUP BY 1),
          nodehub$x AS (SELECT a.vec_id AS src, h.hub AS dst
            FROM $mem a JOIN hubs$x h USING (ivf_cell)
            WHERE a.vec_id <> h.hub),
          edges$x AS MATERIALIZED (SELECT src, dst FROM knn2$x
            UNION SELECT src, dst FROM nodehub$x
            UNION SELECT h1.hub, h2.hub FROM hubs$x h1 JOIN hubs$x h2
              ON h1.hub <> h2.hub)"""
        def scoreSql(cand: String): String =
          s"""SELECT c.qid, c.node,
              ROUND((${dotArrSql("qe.embedding", "ne.embedding", 64)}) /
                (SQRT(${normArrSql("qe.embedding", 64)}) *
                 SQRT(${normArrSql("ne.embedding", 64)})), 6) AS cos
            FROM $cand c JOIN embeddings qe ON qe.vec_id = c.qid
            JOIN embeddings ne ON ne.vec_id = c.node
            WHERE SQRT(${normArrSql("qe.embedding", 64)}) *
              SQRT(${normArrSql("ne.embedding", 64)}) > 0"""
        def beamSql(scored: String, b: Int, explored: Seq[String]): String = {
          val excl = explored.map(f =>
            s"""AND NOT EXISTS (SELECT 1 FROM $f
                WHERE $f.qid = x.qid AND $f.node = x.node)""").mkString(" ")
          s"""SELECT qid, node FROM (SELECT x.qid, x.node, ROW_NUMBER() OVER
              (PARTITION BY x.qid ORDER BY x.cos DESC, x.node) AS rn
              FROM $scored x WHERE 1 = 1 $excl)
            WHERE rn <= $b"""
        }
        // one upper-layer descent block: beamSearch(k = beam, beam = 1,
        // rounds = 1) — score entries, top-1 frontier, expand, rescore,
        // carry top-`beam` (self-matches excluded) down as next entries
        def upperCtes(x: String, ent: String): String =
          s"""su${x}0 AS (${scoreSql(ent)}),
          fu$x AS (${beamSql(s"su${x}0", 1, Seq())}),
          cu$x AS (SELECT qid, node FROM su${x}0
            UNION SELECT f.qid, e.dst FROM fu$x f JOIN edges$x e
              ON e.src = f.node),
          su${x}1 AS (${scoreSql(s"cu$x")}),
          ent${if (x == "2") "1" else "0"} AS (SELECT qid, node FROM (
            SELECT qid, node, ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cos DESC, node) AS rn
            FROM su${x}1 WHERE node <> qid) WHERE rn <= $beam)"""
        s"""WITH ${QueriesI.fixedAsnCtes},
          lvl AS (SELECT vec_id,
              CASE WHEN ($h) % 16 = 0 THEN 2
                   WHEN ($h) % 4 = 0 THEN 1 ELSE 0 END AS lvl
            FROM embeddings),
          mem2 AS (SELECT a.vec_id, a.ivf_cell FROM asn a
            JOIN lvl l USING (vec_id) WHERE l.lvl >= 2),
          mem1 AS (SELECT a.vec_id, a.ivf_cell FROM asn a
            JOIN lvl l USING (vec_id) WHERE l.lvl >= 1),
          ${edgeCtes("2", "mem2")},
          ${edgeCtes("1", "mem1")},
          ${edgeCtes("0", "asn")},
          ent2 AS (SELECT a.vec_id AS qid,
              (SELECT MIN(vec_id) FROM mem2) AS node
            FROM asn a WHERE a.vec_id < 5),
          ${upperCtes("2", "ent2")},
          ${upperCtes("1", "ent1")},
          s0 AS (${scoreSql("ent0")}),
          f1 AS (${beamSql("s0", beam, Seq())}),
          c1 AS (SELECT qid, node FROM s0
            UNION SELECT f.qid, e.dst FROM f1 f JOIN edges0 e
              ON e.src = f.node),
          s1 AS (${scoreSql("c1")}),
          f2 AS (${beamSql("s1", beam, Seq("f1"))}),
          c2 AS (SELECT qid, node FROM s1
            UNION SELECT f.qid, e.dst FROM f2 f JOIN edges0 e
              ON e.src = f.node),
          s2 AS (${scoreSql("c2")})
        SELECT qid, CAST(rank AS INT) AS rank, vb, cos FROM (
          SELECT qid, node AS vb, cos, ROW_NUMBER() OVER
            (PARTITION BY qid ORDER BY cos DESC, node) AS rank
          FROM s2 WHERE node <> qid)
        WHERE rank <= $k ORDER BY qid, rank"""
      })
  }

  /** Bitemporal SCD2 over the CDC changelog
    * ([[graft.operators.Relational.cdcScd2Bitemporal]]): the cdc_scd2_e2e
    * op mapping with a RECORD time derived from the op itself — the
    * event's day plus an (event_id % 3)-day recording lag, so a third of
    * the log arrives late and rewrites earlier beliefs. Each per-key
    * transaction era carries the valid-time history known at that record
    * time; the latest era equals plain cdcScd2. The mirror unrolls the
    * same era join + boundary windows partitioned by (key, era).
    */
  val bitemporalSnapshot: QueryDef = QueryDef(
    "bitemporal_snapshot",
    (s, dir) => {
      val ops = t(s, dir, "events").filter(col("user_id") < 40)
        .withColumn("op",
          when(col("event_type") === "signup", lit("I"))
            .when(col("event_type") === "error", lit("D"))
            .otherwise(lit("U")))
        .withColumn("tt", expr(
          "timestampadd(DAY, CAST(event_id % 3 AS INT), date_trunc('DAY', ts))"))
      graft.operators.Relational.cdcScd2Bitemporal(ops, "user_id",
          "event_type", "ts", "tt", "event_id", "op")
        .orderBy(col("user_id"), col("tx_from"), col("version"))
    },
    Some("""WITH ops AS (SELECT user_id, event_id, ts,
          date_trunc('day', ts) + (event_id % 3) * INTERVAL 1 DAY AS tt,
          CASE WHEN event_type = 'signup' THEN 'I'
               WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
          event_type
        FROM events WHERE user_id < 40 AND ts IS NOT NULL),
      eras AS (SELECT user_id, tx_from,
          LEAD(tx_from) OVER (PARTITION BY user_id ORDER BY tx_from) AS tx_to
        FROM (SELECT DISTINCT user_id, tt AS tx_from FROM ops)),
      kn AS (SELECT o.user_id, o.event_id, o.ts, o.op, o.event_type,
          e.tx_from, e.tx_to
        FROM ops o JOIN eras e ON o.user_id = e.user_id
          AND o.tt <= e.tx_from),
      st AS (SELECT user_id, tx_from, tx_to, ts, event_id,
          CASE WHEN op = 'D' THEN NULL ELSE event_type END AS s,
          LAG(CASE WHEN op = 'D' THEN NULL ELSE event_type END) OVER
            (PARTITION BY user_id, tx_from ORDER BY ts, event_id) AS prev,
          ROW_NUMBER() OVER
            (PARTITION BY user_id, tx_from ORDER BY ts, event_id) AS rn
        FROM kn),
      ch AS (SELECT user_id, tx_from, tx_to, ts, event_id, s FROM st
        WHERE rn = 1 OR s IS DISTINCT FROM prev),
      iv AS (SELECT user_id, tx_from, tx_to, ts, event_id, s,
          LEAD(ts) OVER (PARTITION BY user_id, tx_from
            ORDER BY ts, event_id) AS valid_to
        FROM ch)
      SELECT user_id, tx_from, tx_to,
        CAST(ROW_NUMBER() OVER (PARTITION BY user_id, tx_from
          ORDER BY ts, event_id) AS INT) AS version,
        s AS event_type, ts AS valid_from, valid_to,
        valid_to IS NULL AS is_current,
        tx_to IS NULL AS is_latest
      FROM iv WHERE s IS NOT NULL
      ORDER BY user_id, tx_from, version"""))

  val all: Seq[QueryDef] = Seq(simsearchHnsw, bitemporalSnapshot)
}
