package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 46: time-series depth — per-group autocorrelation. The one
  * classical series diagnostic the engine lacked next to EWMA/rolling
  * z-score/seasonal decomposition: ACF at lags 1..k per event_type,
  * single-window single-aggregation shape (operators/Stats.acf).
  */
object QueriesAT {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Sample ACF at lags 1..4 of `value` per event_type in (ts, event_id)
    * order ([[graft.operators.Stats.acf]]). The estimator's numerator is
    * expanded to sufficient statistics (Σvₜvₜ₋ℓ, Σvₜ, Σvₜ₋ℓ, nℓ) so ONE
    * partitioned lag window + ONE map-combinable groupBy answer all lags
    * — no mean-first second pass over the data, no global window. Sums
    * accumulate in DECIMAL(27,10) (dsum rule) making the statistics
    * partition- and merge-order-independent; the closed form then runs
    * on exact scalars in the identical expression tree on both engines.
    */
  val tsAcf: QueryDef = {
    val maxLag = 4
    QueryDef(
      "ts_acf",
      (s, dir) => graft.operators.Stats.acf(t(s, dir, "events"),
          "event_type", "ts", "event_id", "value", maxLag)
        .orderBy(col("event_type"), col("lag")),
      Some {
        val lagCols = (1 to maxLag)
          .map(l => s"LAG(v, $l) OVER w AS v$l").mkString(",\n            ")
        val lagAggs = (1 to maxLag).map { l =>
          s"""CAST(COUNT(v$l) AS BIGINT) AS n$l,
            ${Ora.dsumSql(s"CASE WHEN v$l IS NOT NULL THEN v * v$l END")} AS sxy$l,
            ${Ora.dsumSql(s"CASE WHEN v$l IS NOT NULL THEN v END")} AS sx$l,
            ${Ora.dsumSql(s"v$l")} AS sy$l"""
        }.mkString(",\n          ")
        val branches = (1 to maxLag).map { l =>
          s"""SELECT event_type, CAST($l AS INT) AS lag, n$l AS n_pairs,
            CASE WHEN mx > mn AND n$l > 0
              THEN ROUND((sxy$l - m * sx$l - m * sy$l +
                CAST(n$l AS DOUBLE) * m * m) / den, 6) END AS acf
          FROM c"""
        }.mkString("\n          UNION ALL ")
        s"""WITH ev AS (SELECT event_type, ts, event_id,
              CAST(value AS DOUBLE) AS v
            FROM events WHERE value IS NOT NULL
              AND NOT isnan(CAST(value AS DOUBLE))),
          l AS (SELECT event_type, v,
            $lagCols
          FROM ev WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
          a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
            ${Ora.dsumSql("v")} AS s, ${Ora.dsumSql("v * v")} AS ss,
            MIN(v) AS mn, MAX(v) AS mx,
          $lagAggs
          FROM l GROUP BY 1),
          b AS (SELECT *, s / CAST(n AS DOUBLE) AS m FROM a),
          c AS (SELECT *, ss - CAST(n AS DOUBLE) * m * m AS den FROM b)
        SELECT event_type, lag, n_pairs, acf FROM (
          $branches)
        ORDER BY event_type, lag"""
      })
  }

  /** Exact Jaccard-threshold self-join via PREFIX FILTERING
    * ([[graft.llm.Dedup.prefixJaccardPairs]]) — the no-false-negative,
    * no-cap member of the dedup family: global (df ASC, shingle ASC)
    * canonical order, per-doc prefix of |d| − ceil(τ|d|) + 1 rarest
    * shingles, prefix⋈prefix candidates under the size-ratio bound,
    * exact verify. Candidate fan-out per token is its PREFIX frequency
    * (hot tokens are pushed out of prefixes by the ordering), so the
    * Σ df² blowup of an uncapped inverted index never materializes.
    * Same output contract as dedup_ngram_jaccard, different (exact)
    * candidate machinery — both engines replicate the prefix selection
    * deterministically (ties broken by shingle string).
    */
  val dedupPrefixJaccard: QueryDef = QueryDef(
    "dedup_prefix_jaccard",
    (s, dir) => graft.llm.Dedup.prefixJaccardPairs(
        t(s, dir, "documents"), "doc_id", "text", n = 3, minJaccard = 0.5)
      .orderBy(col("da"), col("db")),
    Some(s"""WITH sh AS (${Ora.shinglesSql(3)}),
      dfc AS (SELECT sh, COUNT(*) AS dfc FROM sh GROUP BY 1),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      ord AS (SELECT s.doc_id, s.sh,
          ROW_NUMBER() OVER (PARTITION BY s.doc_id
            ORDER BY d.dfc, s.sh) AS pos
        FROM sh s JOIN dfc d USING (sh)),
      pref AS (SELECT o.doc_id, o.sh, z.sz
        FROM ord o JOIN sizes z USING (doc_id)
        WHERE o.pos <= z.sz - CEIL(0.5 * CAST(z.sz AS DOUBLE) - 1e-9) + 1),
      cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM pref a JOIN pref b ON a.sh = b.sh AND a.doc_id < b.doc_id
        WHERE CAST(b.sz AS DOUBLE) >= 0.5 * CAST(a.sz AS DOUBLE)
          AND CAST(a.sz AS DOUBLE) >= 0.5 * CAST(b.sz AS DOUBLE)),
      inter AS (SELECT cand.da, cand.db, COUNT(*) AS c
        FROM cand JOIN sh x ON x.doc_id = cand.da
                  JOIN sh y ON y.doc_id = cand.db AND y.sh = x.sh
        GROUP BY 1, 2),
      j AS (SELECT da, db, ROUND(c / (sa.sz + sb.sz - c), 6) AS jac
        FROM inter JOIN sizes sa ON da = sa.doc_id
                   JOIN sizes sb ON db = sb.doc_id)
      SELECT da, db, jac FROM j WHERE jac >= 0.5 ORDER BY da, db"""))

  /** Persisted dedup-index lifecycle under ONE oracle
    * ([[graft.llm.DedupIndex]]): build the LSH band + docset index from
    * the %5∈{1,2} slice, APPEND the %5∈{3,4} slice (write-only, schema-
    * and hash-probe-guarded), then probe the %5=0 slice against the
    * persisted state. The mirror computes the direct cross-corpus form
    * (probe × full reference) with no index at all — hash equality
    * proves the save→append→query disk roundtrip changes nothing, the
    * s3_sink_roundtrip precedent applied to incremental dedup state.
    */
  val dedupIndexIncremental: QueryDef = QueryDef(
    "dedup_index_incremental",
    (s, dir) => {
      import graft.llm.DedupIndex
      val docs = t(s, dir, "documents")
      val base = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_dedup_index").getAbsolutePath
      // a previous run's index must not leak into this one: append is
      // append — stale bands would double every candidate
      val hPath = new org.apache.hadoop.fs.Path(base)
      hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(hPath, true)
      DedupIndex.save(docs.filter(col("doc_id") % 5 === 1 ||
          col("doc_id") % 5 === 2), "doc_id", "text", base)
      DedupIndex.append(s, base, docs.filter(col("doc_id") % 5 === 3 ||
          col("doc_id") % 5 === 4), "doc_id", "text")
      DedupIndex.query(s, base, docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", minJaccard = 0.5)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH sh AS (${Ora.shinglesSql(3)}),
      hm AS (SELECT doc_id, sh,
          ${Ora.md5LongSql("sh")} % 1000000007 AS hm FROM sh),
      params AS (SELECT g AS i, (654435747 * (g + 1)) % 1000000007 AS a,
                        (654602297 * (g + 1)) % 1000000007 AS b
                 FROM generate_series(0, 15) t(g)),
      mh AS (SELECT doc_id, i, MIN((a * hm + b) % 1000000007) AS mh
             FROM hm CROSS JOIN params GROUP BY 1, 2),
      sig AS (SELECT doc_id, i // 4 AS band,
                     string_agg(CAST(mh AS VARCHAR), '-' ORDER BY i) AS sig
              FROM mh GROUP BY 1, 2),
      sigp AS (SELECT doc_id, band, sig FROM (
            SELECT doc_id, band, sig,
              COUNT(*) OVER (PARTITION BY band, sig) AS n
            FROM sig WHERE doc_id % 5 = 0) WHERE n <= 1000),
      sigi AS (SELECT doc_id, band, sig FROM (
            SELECT doc_id, band, sig,
              COUNT(*) OVER (PARTITION BY band, sig) AS n
            FROM sig WHERE doc_id % 5 <> 0) WHERE n <= 1000),
      cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
               FROM sigp a JOIN sigi b ON a.band = b.band AND a.sig = b.sig),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      common AS (SELECT c.da, c.db, COUNT(*) AS c
                 FROM cand c JOIN sh a ON a.doc_id = c.da
                             JOIN sh b ON b.doc_id = c.db AND b.sh = a.sh
                 GROUP BY 1, 2),
      j AS (SELECT da, db, ROUND(c / (sa.sz + sb.sz - c), 6) AS jac
            FROM common JOIN sizes sa ON da = sa.doc_id
                        JOIN sizes sb ON db = sb.doc_id),
      per AS (SELECT da, MIN(db) AS dup_of, MAX(jac) AS best_jac
              FROM j WHERE jac >= 0.5 GROUP BY da)
      SELECT d.doc_id, per.dup_of, per.best_jac, per.dup_of IS NULL AS keep
      FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
      LEFT JOIN per ON d.doc_id = per.da
      ORDER BY d.doc_id"""))

  val all: Seq[QueryDef] =
    Seq(tsAcf, dedupPrefixJaccard, dedupIndexIncremental)
}
