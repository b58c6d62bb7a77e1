package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 43 (round 9): learned PQ codebooks — the per-subspace Lloyd
  * k-means fit slotted into the existing pqTopK seam, fully hash-gated
  * (the verdict's depth-over-breadth candidate).
  */
object QueriesAQ {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Left-associated squared-L2 between subspace j of two array columns
    * (the QueriesL twin, local so the batch is self-contained).
    */
  private def l2SubSql(a: String, b: String, j: Int, sub: Int): String =
    (1 to sub).map { d =>
      val i = j * sub + d
      s"(CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE)) * " +
        s"(CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE))"
    }.mkString(" + ")

  /** PQ/ADC search under a LEARNED codebook: init = first 16 vectors
    * (the training-free codebook), one Lloyd round of per-subspace L2
    * assignment + decimal-exact element-wise mean recompute
    * ([[graft.llm.Similarity.pqLearnCodebook]]), then the standard
    * encode + ADC ranking. RNG-free end to end, so codebook TRAINING
    * itself sits under the exact hash gate — the mirror unrolls the
    * round: assignment CTE (the pq_adc codes shape against cb0),
    * per-subspace mean CTEs, empty-cell COALESCE back to the seed slice,
    * then the search chain against the learned cb.
    */
  val simsearchPqLearned: QueryDef = {
    val m = 4; val sub = 16; val ks = 16
    // assignment of every vector's subspace j to its nearest cb0 codeword
    val codes0Sql = (0 until m).map { j =>
      s"""SELECT vec_id, $j AS j, cw FROM (
          SELECT e.vec_id, c.cw, ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY (${l2SubSql("e.embedding", "c.cv", j, sub)}) ASC, c.cw) AS rn
          FROM embeddings e CROSS JOIN cb0 c) WHERE rn = 1"""
    }.mkString("\n        UNION ALL\n        ")
    // per-(subspace, codeword) decimal element-wise means
    val meanCtes = (0 until m).map { j =>
      val meanCols = (j * sub + 1 to (j + 1) * sub).map(i =>
        s"CAST(SUM(CAST(CAST(e.embedding[$i] AS DOUBLE) AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS c$i")
        .mkString(", ")
      s"""mn$j AS MATERIALIZED (SELECT cd.cw, $meanCols
          FROM codes0 cd JOIN embeddings e USING (vec_id)
          WHERE cd.j = $j GROUP BY cd.cw)"""
    }.mkString(",\n        ")
    // learned codebook: per codeword, each element from its subspace's
    // mean, COALESCE back to the seed slice when the (j, cw) cell emptied
    val cbElems = (1 to m * sub).map { i =>
      val j = (i - 1) / sub
      s"COALESCE(mn$j.c$i, CAST(c0.cv[$i] AS DOUBLE))"
    }.mkString(", ")
    val cbJoins = (0 until m).map(j => s"LEFT JOIN mn$j ON mn$j.cw = c0.cw")
      .mkString(" ")
    // search chain against the learned cb (the pq_adc shapes)
    val codesSql = (0 until m).map { j =>
      s"""SELECT vec_id, $j AS j, cw FROM (
          SELECT e.vec_id, c.cw, ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY (${l2SubSql("e.embedding", "c.cv", j, sub)}) ASC, c.cw) AS rn
          FROM embeddings e CROSS JOIN cb c) WHERE rn = 1"""
    }.mkString("\n        UNION ALL\n        ")
    val djSql = (0 until m).map { j =>
      s"WHEN $j THEN (${l2SubSql("q.qv", "c.cv", j, sub)})"
    }.mkString(" ")
    QueryDef(
      "simsearch_pq_learned",
      (s, dir) => {
        import graft.llm.Similarity
        val emb = t(s, dir, "embeddings")
        val cb = Similarity.pqLearnCodebook(emb, "vec_id", "embedding",
          dim = 64, m = m, ks = ks, iters = 1)
        Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", dim = 64, m = m, codewords = cb, k = 10)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""WITH cb0 AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cw,
            embedding AS cv FROM embeddings WHERE vec_id < $ks),
        codes0 AS MATERIALIZED (
        $codes0Sql),
        $meanCtes,
        cb AS MATERIALIZED (SELECT c0.cw, [$cbElems] AS cv
          FROM cb0 c0 $cbJoins),
        codes AS MATERIALIZED (
        $codesSql),
        q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
          WHERE vec_id < 5),
        pd AS (SELECT q.qid, cd.vec_id AS vb,
            CASE cd.j $djSql END AS dj
          FROM q CROSS JOIN codes cd
          JOIN cb c ON c.cw = cd.cw
          WHERE cd.vec_id <> q.qid),
        dist AS (SELECT qid, vb,
            CAST(ROUND(SUM(CAST(dj AS DECIMAL(27,10))), 6) AS DOUBLE) AS dist
          FROM pd GROUP BY qid, vb),
        r AS (SELECT qid, vb, dist, ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY dist ASC, vb) AS rank FROM dist)
        SELECT qid, CAST(rank AS INT) AS rank, vb, dist
        FROM r WHERE rank <= 10 ORDER BY qid, rank"""))
  }

  val all: Seq[QueryDef] = Seq(simsearchPqLearned)
}
