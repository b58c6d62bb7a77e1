package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Core, Database}

/** Batch 18 (round 8): sink-roundtrip gating — the S3 query sink and S1
  * suffix-dispatch reader composed under the exact DuckDB hash gate, per
  * the round-7 verdict (every prior spec-only→oracle conversion held).
  */
object QueriesR {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** S3 + S1 + S2/P1 end to end: register the events table through the
    * user-facing [[Database]] API, run the aggregate through its SQL
    * gateway, sink to csv.gz (header + gzip — the delicate text path:
    * type-erasing, null-erasing, shortest-roundtrip double formatting),
    * read it back via the suffix dispatcher, re-assert the csv-erased
    * types, sink THAT to the gzip-parquet path and read it back again.
    * The oracle computes the same aggregate from the source table, so any
    * corruption in either sink or reader (schema, header, compression,
    * double formatting, null encoding) breaks the hash.
    *
    * Double round-trip is exact because the sink writes
    * `Double.toString`'s shortest-roundtrip form and the reader parses it
    * back to the identical bits (Java guarantees toString→parseDouble
    * identity); counts are re-cast to long because csv inference narrows
    * in-range integers to int.
    */
  val s3SinkRoundtrip: QueryDef = QueryDef(
    "s3_sink_roundtrip",
    (s, dir) => {
      val db = new Database(s)
      db.addTable("ev_sink_rt", s"$dir/events.parquet")
      val base = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_sink_roundtrip")
      val csvPath = new java.io.File(base, "agg.csv.gz").getAbsolutePath
      val pqPath = new java.io.File(base, "agg.parquet").getAbsolutePath
      db.queryTo(
        """SELECT event_type, COUNT(*) AS n_events,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(27,10))), 6) AS DOUBLE)
               AS sum_v
           FROM ev_sink_rt GROUP BY event_type""",
        csvPath)
      val fromCsv = Core.readAny(s, csvPath)
        .select(col("event_type"), col("n_events").cast("long"),
          col("sum_v").cast("double"))
      Core.writeResult(fromCsv, pqPath)
      Core.readAny(s, pqPath).orderBy(col("event_type"))
    },
    Some(s"""SELECT event_type, COUNT(*) AS n_events,
        ${Ora.dsum6Sql("value")} AS sum_v
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Count-min sketch heavy hitters: the d×w cell build AND the min-over-
    * rows probe both under the hash gate; exact counts ride along to pin
    * the overestimate bound (est ≥ exact by construction).
    */
  val sketchCmsTopk: QueryDef = {
    val d = 3; val w = 256; val k = 20
    val js = (0 until d).mkString("[", ", ", "]")
    def bSql(tokExpr: String): String =
      s"${Ora.md5LongSql(s"'cms' || CAST(j AS VARCHAR) || ':' || $tokExpr")} % $w"
    QueryDef(
      "sketch_cms_topk",
      (s, dir) => graft.operators.Sketch.cmsTopK(
          t(s, dir, "documents"), "text", d = d, width = w, k = k)
        .orderBy(col("rank")),
      Some(s"""WITH tok AS (SELECT unnest(${Ora.toksSql}) AS tok FROM documents),
        cand AS MATERIALIZED (SELECT tok, COUNT(*) AS exact_cnt
          FROM tok GROUP BY tok),
        js AS (SELECT unnest($js) AS j),
        pr AS MATERIALIZED (SELECT tok, exact_cnt, j, ${bSql("tok")} AS b
          FROM cand CROSS JOIN js),
        cells AS (SELECT j, b, CAST(SUM(exact_cnt) AS BIGINT) AS cnt
          FROM pr GROUP BY 1, 2),
        est AS (SELECT p.tok, ANY_VALUE(p.exact_cnt) AS exact_cnt,
            MIN(c.cnt) AS est_cnt
          FROM pr p JOIN cells c USING (j, b) GROUP BY p.tok),
        r AS (SELECT tok, est_cnt, exact_cnt,
            ROW_NUMBER() OVER (ORDER BY est_cnt DESC, tok) AS rank FROM est)
      SELECT CAST(rank AS INT) AS rank, tok, est_cnt, exact_cnt
      FROM r WHERE rank <= $k ORDER BY rank"""))
  }

  /** TextRank keyword scores: 3 damped iterations over the symmetrized
    * adjacent-token graph, mirrored as unrolled MATERIALIZED steps (the
    * bpe_train precedent for iterative algorithms — each step feeds
    * exactly one next step). The (1−d) constant is interpolated from the
    * ENGINE's double arithmetic (1.0 − 0.85 ≠ the literal 0.15 in the
    * last bit) so both engines iterate on identical bits.
    */
  val graphTextrank: QueryDef = {
    val iters = 3; val k = 20; val damping = 0.85
    val dSql = s"CAST(${damping.toString} AS DOUBLE)"
    val omdSql = s"CAST(${(1.0 - damping).toString} AS DOUBLE)"
    val steps = (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (
        SELECT n.tok, ROUND($omdSql + $dSql * CAST(COALESCE(s.s, 0) AS DOUBLE), 10)
            AS rank_v
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS tok,
            SUM(CAST(ROUND(r.rank_v * (CAST(e.w AS DOUBLE) / CAST(e.outw AS DOUBLE)), 10)
                AS DECIMAL(27,10))) AS s
          FROM ed e JOIN r${i - 1} r ON r.tok = e.src GROUP BY e.dst) s
          USING (tok))"""
    }.mkString(",\n        ")
    QueryDef(
      "graph_textrank",
      (s, dir) => graft.llm.Graph.textRank(
          t(s, dir, "documents"), "text", iters = iters,
          damping = damping, k = k)
        .orderBy(col("rank")),
      Some(s"""WITH tk AS (SELECT ${Ora.toksSql} AS w FROM documents),
        ap AS (SELECT [{'src': w[i], 'dst': w[i + 1]}
                       for i in generate_series(1, len(w) - 1)] AS ps FROM tk),
        e0 AS (SELECT unnest(ps, recursive := true) FROM ap),
        eu AS (SELECT src, dst FROM e0
               UNION ALL SELECT dst AS src, src AS dst FROM e0),
        eg AS (SELECT src, dst, COUNT(*) AS w FROM eu GROUP BY 1, 2),
        ed AS MATERIALIZED (SELECT src, dst, w,
            CAST(SUM(w) OVER (PARTITION BY src) AS BIGINT) AS outw FROM eg),
        nodes AS MATERIALIZED (SELECT DISTINCT src AS tok FROM ed),
        r0 AS (SELECT tok, CAST(1.0 AS DOUBLE) AS rank_v FROM nodes),
        $steps,
        fin AS (SELECT tok, rank_v, ROW_NUMBER() OVER
            (ORDER BY rank_v DESC, tok) AS rank FROM r$iters)
      SELECT CAST(rank AS INT) AS rank, tok, ROUND(rank_v, 6) AS score
      FROM fin WHERE rank <= $k ORDER BY rank"""))
  }

  /** WordPiece greedy encode (third tokenizer family): position-aware
    * vocabulary + longest-match-first scan, mirrored as maxLen unrolled
    * greedy steps — state is ONE row per word (position + segmentation so
    * far), done rows carried through, unmatchable words fall out of the
    * chain and surface as [UNK] via the final left join.
    */
  val wordpieceEncode: QueryDef = {
    val maxPiece = 4; val maxLen = 8; val minCount = 3
    val steps = (1 to maxLen).map { i =>
      s"""g$i AS MATERIALIZED (
        SELECT word, freq, pos, seg FROM (
          SELECT g.word, g.freq, g.pos + LENGTH(v.piece) AS pos,
            CASE WHEN g.pos = 0 THEN v.piece
                 ELSE g.seg || '|' || '##' || v.piece END AS seg,
            ROW_NUMBER() OVER (PARTITION BY g.word
              ORDER BY LENGTH(v.piece) DESC, v.piece) AS rn
          FROM g${i - 1} g JOIN voc v
            ON v.is_start = (g.pos = 0)
           AND v.piece = substr(g.word, g.pos + 1, LENGTH(v.piece))
          WHERE g.pos < LENGTH(g.word))
        WHERE rn = 1
        UNION ALL
        SELECT word, freq, pos, seg FROM g${i - 1}
        WHERE pos >= LENGTH(word))"""
    }.mkString(",\n        ")
    QueryDef(
      "wordpiece_encode",
      (s, dir) => graft.llm.WordPiece.encode(
          t(s, dir, "documents"), "text", maxPiece = maxPiece,
          maxLen = maxLen, minCount = minCount.toLong)
        .orderBy(col("word")),
      Some(s"""WITH wf AS MATERIALIZED (SELECT w AS word, COUNT(*) AS freq
          FROM (SELECT unnest(${Ora.toksSql}) AS w FROM documents)
          WHERE LENGTH(w) <= $maxLen GROUP BY 1),
        pc AS (SELECT word, freq,
            unnest(generate_series(1, LENGTH(word))) AS s FROM wf),
        pc2 AS (SELECT word, freq, s,
            unnest(generate_series(1, LEAST($maxPiece, LENGTH(word) - s + 1)))
              AS l FROM pc),
        voc AS MATERIALIZED (SELECT substr(word, s, l) AS piece,
            s = 1 AS is_start, CAST(SUM(freq) AS BIGINT) AS cnt
          FROM pc2 GROUP BY 1, 2 HAVING SUM(freq) >= $minCount),
        g0 AS (SELECT word, freq, 0 AS pos, '' AS seg FROM wf),
        $steps,
        done AS (SELECT word, freq, seg FROM g$maxLen
          WHERE pos >= LENGTH(word))
      SELECT w.word, w.freq, (d.word IS NULL) AS is_unk,
        CAST(CASE WHEN d.word IS NOT NULL
             THEN len(string_split(d.seg, '|')) END AS INT) AS n_pieces,
        d.seg
      FROM wf w LEFT JOIN done d USING (word) ORDER BY w.word"""))
  }

  /** Bloom-filter pruning: blocklist slice (doc_id % 7 = 0) builds the
    * bit set; every other document's vocabulary probes it. The exact
    * membership column rides along, pinning the no-false-negative
    * contract under the hash gate (and the false positives that DO occur
    * at 1024 bits are pinned too — same hashes, same collisions).
    */
  val sketchBloomPrune: QueryDef = {
    val mBits = 1024; val d = 3
    val js = (0 until d).mkString("[", ", ", "]")
    def bitSql(tokExpr: String): String =
      s"${Ora.md5LongSql(s"'bloom' || CAST(j AS VARCHAR) || ':' || $tokExpr")} % $mBits"
    QueryDef(
      "sketch_bloom_prune",
      (s, dir) => {
        val dd = t(s, dir, "documents")
        def toks(p: DataFrame) =
          p.select(explode(graft.llm.TextAnalysis.tokens(col("text"))).as("tok"))
        graft.operators.Sketch.bloomPrune(
            toks(dd.filter(col("doc_id") % 7 === 0)), "tok",
            toks(dd.filter(col("doc_id") % 7 =!= 0)), "tok",
            mBits = mBits, d = d)
          .orderBy(col("tok"))
      },
      Some(s"""WITH ex AS MATERIALIZED (SELECT DISTINCT tok FROM
          (SELECT unnest(${Ora.toksSql}) AS tok
           FROM documents WHERE doc_id % 7 = 0)),
        pt AS MATERIALIZED (SELECT DISTINCT tok FROM
          (SELECT unnest(${Ora.toksSql}) AS tok
           FROM documents WHERE doc_id % 7 <> 0)),
        js AS (SELECT unnest($js) AS j),
        bits AS MATERIALIZED (SELECT DISTINCT ${bitSql("tok")} AS bit
          FROM ex CROSS JOIN js),
        pm AS MATERIALIZED (SELECT DISTINCT tok, ${bitSql("tok")} AS bit
          FROM pt CROSS JOIN js),
        np AS (SELECT tok, COUNT(*) AS npos FROM pm GROUP BY tok),
        hits AS (SELECT tok, COUNT(*) AS nh
          FROM pm JOIN bits USING (bit) GROUP BY tok)
      SELECT p.tok, COALESCE(h.nh, 0) = np.npos AS maybe_member,
        (e.tok IS NOT NULL) AS is_member
      FROM pt p JOIN np USING (tok) LEFT JOIN hits h USING (tok)
      LEFT JOIN ex e ON e.tok = p.tok ORDER BY p.tok"""))
  }

  /** HyperLogLog per-group distinct estimate (m = 64 registers) with the
    * exact count alongside; the register ranks come from the md5 hash's
    * minimal binary string (identical on both engines) and the harmonic
    * sum accumulates as exact shifted integers.
    */
  val sketchHllDistinct: QueryDef = {
    val m = 64
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val scale = math.pow(2.0, 55) * alpha * m * m
    val hSql = Ora.md5LongSql("'hll:' || CAST(user_id AS VARCHAR)")
    QueryDef(
      "sketch_hll_distinct",
      (s, dir) => graft.operators.Sketch.hllDistinct(
          t(s, dir, "events"), "event_type", "user_id", m = m)
        .orderBy(col("event_type")),
      Some(s"""WITH du AS MATERIALIZED (
          SELECT DISTINCT event_type, user_id FROM events),
        h AS (SELECT event_type, $hSql AS h FROM du),
        regs AS (SELECT event_type, h % $m AS b,
            CASE WHEN (h >> 6) > 0 THEN 55 - LENGTH(bin(h >> 6))
                 ELSE 55 END AS rho
          FROM h),
        mx AS MATERIALIZED (SELECT event_type, b, MAX(rho) AS mb
          FROM regs GROUP BY 1, 2),
        dom AS (SELECT unnest(generate_series(0, ${m - 1})) AS b),
        gs AS (SELECT DISTINCT event_type FROM du),
        filled AS (SELECT g.event_type, d.b, COALESCE(mx.mb, 0) AS mb
          FROM gs g CROSS JOIN dom d
          LEFT JOIN mx ON mx.event_type = g.event_type AND mx.b = d.b),
        sm AS (SELECT event_type,
            CAST(SUM(CAST(1 AS BIGINT) << (55 - mb)) AS BIGINT) AS s
          FROM filled GROUP BY 1),
        ex AS (SELECT event_type, CAST(COUNT(user_id) AS BIGINT) AS exact_distinct
          FROM du GROUP BY 1)
      SELECT sm.event_type,
        ROUND(CAST(${scale.toString} AS DOUBLE) / CAST(sm.s AS DOUBLE), 6)
          AS est_distinct,
        ex.exact_distinct
      FROM sm JOIN ex USING (event_type) ORDER BY event_type"""))
  }

  val all: Seq[QueryDef] =
    Seq(s3SinkRoundtrip, sketchCmsTopk, graphTextrank, wordpieceEncode,
      sketchBloomPrune, sketchHllDistinct)
}
