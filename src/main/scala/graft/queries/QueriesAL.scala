package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.llm.Dedup

/** Batch 38 (round 8): sketch calibration, distribution-drift scoring,
  * and graph assortativity.
  */
object QueriesAL {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** MinHash estimator calibration: for every LSH-verified near-dup pair,
    * the k=16 signature agreement (the Jaccard ESTIMATE the sketch
    * offers) against the exact Jaccard — the error column is the number
    * that justifies (or indicts) a chosen k at scale.
    */
  val minhashError: QueryDef = {
    val k = 16
    QueryDef(
      "sketch_minhash_error",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Queries.minhashPairsShared(s, dir)
        val sig = Dedup.minhashSignature(
          Dedup.shingles(docs, "doc_id", "text", 3), "doc_id", k)
        val sa = sig.toDF(sig.columns.map(c =>
          if (c == "doc_id") "da" else s"a_$c"): _*)
        val sb = sig.toDF(sig.columns.map(c =>
          if (c == "doc_id") "db" else s"b_$c"): _*)
        val agree = (0 until k).map(i =>
            when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
          .reduceLeft(_ + _)
        val est = round(agree.cast("double") / lit(k.toDouble), 6)
        pairs.join(sa, Seq("da")).join(sb, Seq("db"))
          .select(col("da"), col("db"), col("jac"), est.as("jac_est"),
            round(abs(col("jac") - est), 6).as("abs_err"))
          .orderBy(col("da"), col("db"))
      },
      Some(s"""WITH sh AS MATERIALIZED (${Ora.shinglesSql(3)}),
        hm AS (SELECT doc_id, sh, ${Ora.md5LongSql("sh")} % 1000000007 AS hm
          FROM sh),
        params AS (SELECT g AS i, (654435747 * (g + 1)) % 1000000007 AS a,
          (654602297 * (g + 1)) % 1000000007 AS b
          FROM generate_series(0, ${k - 1}) t(g)),
        mh AS MATERIALIZED (SELECT doc_id, i,
          MIN((a * hm + b) % 1000000007) AS mh
          FROM hm CROSS JOIN params GROUP BY 1, 2),
        sig AS (SELECT doc_id, i // 4 AS band,
          string_agg(CAST(mh AS VARCHAR), '-' ORDER BY i) AS sig
          FROM mh GROUP BY 1, 2),
        cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
            AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        common AS (SELECT c.da, c.db, COUNT(*) AS c
          FROM cand c JOIN sh a ON a.doc_id = c.da
            JOIN sh b ON b.doc_id = c.db AND b.sh = a.sh
          GROUP BY 1, 2),
        j AS (SELECT da, db, ROUND(c / (sa.sz + sb.sz - c), 6) AS jac
          FROM common JOIN sizes sa ON da = sa.doc_id
            JOIN sizes sb ON db = sb.doc_id),
        keep AS MATERIALIZED (SELECT da, db, jac FROM j WHERE jac >= 0.5),
        est AS (SELECT kp.da, kp.db,
          ROUND(CAST(SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)
            AS DOUBLE) / ${k}.0, 6) AS jac_est
          FROM keep kp JOIN mh ma ON ma.doc_id = kp.da
            JOIN mh mb ON mb.doc_id = kp.db AND mb.i = ma.i
          GROUP BY 1, 2)
      SELECT k.da, k.db, k.jac, e.jac_est,
        ROUND(ABS(k.jac - e.jac_est), 6) AS abs_err
      FROM keep k JOIN est e ON e.da = k.da AND e.db = k.db
      ORDER BY k.da, k.db"""))
  }

  /** Population Stability Index per feature between the even/odd
    * event-id halves (add-one-smoothed bins, decimal-truncated ln terms)
    * — the model-monitoring drift score.
    */
  val psiDrift: QueryDef = QueryDef(
    "m19_psi_drift",
    (s, dir) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(27,10)")
      def psiOf(bin: org.apache.spark.sql.Column, feature: String): DataFrame = {
        val b = t(s, dir, "events").filter(col("value").isNotNull)
          .select((col("event_id") % 2 === 0).as("half_a"), bin.as("bin"))
          .groupBy(col("bin"))
          .agg(sum(when(col("half_a"), 1L).otherwise(0L)).as("ca"),
            sum(when(!col("half_a"), 1L).otherwise(0L)).as("cb"))
        val tot = b.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          count(lit(1)).as("nbins"))
        val w = b.crossJoin(broadcast(tot))
          .select(((col("ca") + 1).cast("double") /
              (col("na") + col("nbins")).cast("double")).as("pa"),
            ((col("cb") + 1).cast("double") /
              (col("nb") + col("nbins")).cast("double")).as("pb"),
            col("nbins"))
        w.agg(first(col("nbins")).as("n_bins"),
            round(sum(dec((col("pa") - col("pb")) * log(col("pa") / col("pb"))))
              .cast("double"), 6).as("psi"))
          .select(lit(feature).as("feature"), col("n_bins"), col("psi"))
      }
      psiOf(floor(col("value") / 100.0).cast("long"), "value_bin100")
        .unionAll(psiOf(hour(col("ts")).cast("long"), "hour"))
        .orderBy(col("feature"))
    },
    Some(s"""WITH ev AS (SELECT event_id, (event_id % 2 = 0) AS half_a,
        CAST(value AS DOUBLE) AS v, ts FROM events WHERE value IS NOT NULL),
      b1 AS (SELECT CAST(FLOOR(v / 100.0) AS BIGINT) AS bin,
        CAST(SUM(CASE WHEN half_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        CAST(SUM(CASE WHEN NOT half_a THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM ev GROUP BY 1),
      t1 AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
        CAST(SUM(cb) AS BIGINT) AS nb, CAST(COUNT(*) AS BIGINT) AS nbins
        FROM b1),
      p1 AS (SELECT 'value_bin100' AS feature, t1.nbins AS n_bins,
        ROUND(CAST(SUM(CAST((
          (CAST(ca + 1 AS DOUBLE) / CAST(na + nbins AS DOUBLE) -
           CAST(cb + 1 AS DOUBLE) / CAST(nb + nbins AS DOUBLE)) *
          LN((CAST(ca + 1 AS DOUBLE) / CAST(na + nbins AS DOUBLE)) /
             (CAST(cb + 1 AS DOUBLE) / CAST(nb + nbins AS DOUBLE)))
          ) AS DECIMAL(27,10))) AS DOUBLE), 6) AS psi
        FROM b1 CROSS JOIN t1 GROUP BY t1.nbins),
      b2 AS (SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS bin,
        CAST(SUM(CASE WHEN half_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        CAST(SUM(CASE WHEN NOT half_a THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM ev GROUP BY 1),
      t2 AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
        CAST(SUM(cb) AS BIGINT) AS nb, CAST(COUNT(*) AS BIGINT) AS nbins
        FROM b2),
      p2 AS (SELECT 'hour' AS feature, t2.nbins AS n_bins,
        ROUND(CAST(SUM(CAST((
          (CAST(ca + 1 AS DOUBLE) / CAST(na + nbins AS DOUBLE) -
           CAST(cb + 1 AS DOUBLE) / CAST(nb + nbins AS DOUBLE)) *
          LN((CAST(ca + 1 AS DOUBLE) / CAST(na + nbins AS DOUBLE)) /
             (CAST(cb + 1 AS DOUBLE) / CAST(nb + nbins AS DOUBLE)))
          ) AS DECIMAL(27,10))) AS DOUBLE), 6) AS psi
        FROM b2 CROSS JOIN t2 GROUP BY t2.nbins)
    SELECT * FROM p1 UNION ALL SELECT * FROM p2 ORDER BY feature"""))

  /** Degree assortativity of the repeat co-purchase graph: Pearson
    * correlation of endpoint degrees over the symmetrized edge list —
    * whether hubs connect to hubs. Decimal sufficient statistics over
    * the edge relation; degrees from one keyed agg.
    */
  val assortativity: QueryDef = QueryDef(
    "graph_assortativity",
    (s, dir) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(27,10)")
      val e0 = Queries.coPurchasePairs(s, dir)
        .filter(col("n_ab") >= 2).select(col("a"), col("b"))
      val ed = e0.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(e0.select(col("b").as("src"), col("a").as("dst")))
      val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val pairs = ed
        .join(deg.select(col("src"), col("deg").as("dx")), Seq("src"))
        .join(deg.select(col("src").as("dst"), col("deg").as("dy")), Seq("dst"))
        .select(col("dx").cast("double").as("x"), col("dy").cast("double").as("y"))
      val m = pairs.agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).cast("double").as("sx"),
        sum(dec(col("y"))).cast("double").as("sy"),
        sum(dec(col("x") * col("x"))).cast("double").as("sxx"),
        sum(dec(col("x") * col("y"))).cast("double").as("sxy"),
        sum(dec(col("y") * col("y"))).cast("double").as("syy"))
      val n = col("n").cast("double")
      val cov = n * col("sxy") - col("sx") * col("sy")
      val vx = n * col("sxx") - col("sx") * col("sx")
      val vy = n * col("syy") - col("sy") * col("sy")
      m.select((col("n") / 2).cast("long").as("n_edges"),
        when(vx > 0 && vy > 0, round(cov / sqrt(vx * vy), 6))
          .as("assortativity"))
    },
    Some("""WITH bk AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
        FROM lineitem),
      e0 AS (SELECT l.item AS a, r.item AS b FROM bk l JOIN bk r USING (ok)
        WHERE l.item < r.item GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      ed AS (SELECT a AS src, b AS dst FROM e0
        UNION ALL SELECT b, a FROM e0),
      deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
      pr AS (SELECT CAST(da.deg AS DOUBLE) AS x, CAST(db.deg AS DOUBLE) AS y
        FROM ed e JOIN deg da ON da.src = e.src JOIN deg db ON db.src = e.dst),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(y AS DECIMAL(27,10))) AS DOUBLE) AS sy,
        CAST(SUM(CAST((x * x) AS DECIMAL(27,10))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST((x * y) AS DECIMAL(27,10))) AS DOUBLE) AS sxy,
        CAST(SUM(CAST((y * y) AS DECIMAL(27,10))) AS DOUBLE) AS syy
        FROM pr)
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
      CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
        AND CAST(n AS DOUBLE) * syy - sy * sy > 0 THEN
        ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) /
          SQRT((CAST(n AS DOUBLE) * sxx - sx * sx) *
            (CAST(n AS DOUBLE) * syy - sy * sy)), 6) END AS assortativity
    FROM m"""))

  val all: Seq[QueryDef] = Seq(minhashError, psiDrift, assortativity)
}
