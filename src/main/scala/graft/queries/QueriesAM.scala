package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 39 (round 8): item-based collaborative-filtering
  * recommendations and Benford's-law auditing.
  */
object QueriesAM {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Item-CF recommendations end-to-end: customer baskets → item-item
    * Jaccard neighborhood (pairs sharing ≥ 2 order-baskets) → per-user
    * candidate scores Σ jac over owned neighbors → anti-join owned →
    * top-3 per customer (customers < 50). The whole recommender as one
    * gated dataflow; every stage rides the basket-keyed inverted index
    * or a keyed agg — never an all-pairs join.
    */
  val itemCfRecs: QueryDef = {
    val minShared = 2; val nRecs = 3; val maxCust = 50
    QueryDef(
      "recsys_item_cf",
      (s, dir) => {
        // r13: the degree counts read the memoized basket relation the
        // pair memo is built from, instead of re-running the lineitem
        // distinct per query
        val bk = Queries.basketItems(s, dir)
        val deg = bk.groupBy(col("item")).agg(count(lit(1)).as("nb"))
        val pairs = Queries.coPurchasePairs(s, dir)
          .filter(col("n_ab") >= minShared)
        val sims = pairs
          .join(deg.select(col("item").as("a"), col("nb").as("na")), Seq("a"))
          .join(deg.select(col("item").as("b"), col("nb").as("nbb")), Seq("b"))
          .select(col("a"), col("b"),
            round(col("n_ab").cast("double") /
              (col("na") + col("nbb") - col("n_ab")).cast("double"), 6)
              .as("jac"))
        val simSym = sims.select(col("a").as("owned"), col("b").as("cand"),
            col("jac"))
          .unionAll(sims.select(col("b").as("owned"), col("a").as("cand"),
            col("jac")))
        val owned = t(s, dir, "orders")
          .filter(col("o_custkey") < maxCust)
          .select(col("o_orderkey"), col("o_custkey").as("cust"))
          .join(t(s, dir, "lineitem")
            .select(col("l_orderkey").as("o_orderkey"),
              col("l_partkey").as("item")), Seq("o_orderkey"))
          .select(col("cust"), col("item")).distinct()
        val scored = owned.join(simSym,
            owned("item") === simSym("owned"))
          .groupBy(col("cust"), col("cand"))
          .agg(round(sum(col("jac").cast("decimal(27,10)")), 6).cast("double")
            .as("score"), count(lit(1)).as("n_neighbors"))
          .join(owned.select(col("cust"), col("item").as("cand")),
            Seq("cust", "cand"), "left_anti")
        val w = Window.partitionBy(col("cust"))
          .orderBy(col("score").desc, col("cand"))
        scored.withColumn("rank", row_number().over(w).cast("int"))
          .filter(col("rank") <= nRecs)
          .select(col("cust"), col("rank"), col("cand"), col("score"),
            col("n_neighbors"))
          .orderBy(col("cust"), col("rank"))
      },
      Some(s"""WITH bk AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
          FROM lineitem),
        deg AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS nb FROM bk
          GROUP BY 1),
        pr AS (SELECT l.item AS a, r.item AS b,
          CAST(COUNT(*) AS BIGINT) AS n_ab
          FROM bk l JOIN bk r USING (ok) WHERE l.item < r.item
          GROUP BY 1, 2 HAVING COUNT(*) >= $minShared),
        sims AS (SELECT p.a, p.b,
          ROUND(CAST(p.n_ab AS DOUBLE) /
            CAST(da.nb + db.nb - p.n_ab AS DOUBLE), 6) AS jac
          FROM pr p JOIN deg da ON da.item = p.a JOIN deg db ON db.item = p.b),
        ss AS (SELECT a AS owned, b AS cand, jac FROM sims
          UNION ALL SELECT b, a, jac FROM sims),
        owned AS (SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS item
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          WHERE o.o_custkey < $maxCust),
        sc AS (SELECT ow.cust, ss.cand,
          CAST(ROUND(SUM(CAST(ss.jac AS DECIMAL(27,10))), 6) AS DOUBLE)
            AS score,
          CAST(COUNT(*) AS BIGINT) AS n_neighbors
          FROM owned ow JOIN ss ON ss.owned = ow.item
          GROUP BY 1, 2),
        flt AS (SELECT sc.* FROM sc
          ANTI JOIN owned ow2 ON ow2.cust = sc.cust AND ow2.item = sc.cand),
        rk AS (SELECT cust, cand, score, n_neighbors, ROW_NUMBER() OVER
          (PARTITION BY cust ORDER BY score DESC, cand) AS rank FROM flt)
      SELECT cust, CAST(rank AS INT) AS rank, cand, score, n_neighbors
      FROM rk WHERE rank <= $nRecs ORDER BY cust, rank"""))
  }

  /** Benford's-law first-digit audit of order totals: observed digit
    * shares vs the log10(1 + 1/d) expectation with per-digit chi²
    * contributions — the forensic-accounting screen.
    */
  val benford: QueryDef = QueryDef(
    "dq_benford",
    (s, dir) => {
      val d = substring(col("o_totalprice").cast("string"), 1, 1).cast("int")
      val counts = t(s, dir, "orders")
        .filter(col("o_totalprice") > 0)
        .select(d.as("digit"))
        .filter(col("digit").between(1, 9))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("tn"))
      counts.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("tn").cast("double"), 6)
            .as("observed"),
          round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
            .as("expected"),
          round(
            (col("n").cast("double") / col("tn").cast("double") -
              log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))) *
            (col("n").cast("double") / col("tn").cast("double") -
              log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))) /
            log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
            .as("chi2_term"))
        .orderBy(col("digit"))
    },
    Some("""WITH c AS (SELECT CAST(SUBSTRING(CAST(o_totalprice AS VARCHAR), 1, 1)
          AS INT) AS digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders WHERE o_totalprice > 0
          AND CAST(SUBSTRING(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT)
            BETWEEN 1 AND 9
        GROUP BY 1),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn FROM c)
    SELECT digit, n,
      ROUND(CAST(n AS DOUBLE) / CAST(tn AS DOUBLE), 6) AS observed,
      ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected,
      ROUND((CAST(n AS DOUBLE) / CAST(tn AS DOUBLE) -
          LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE))) *
        (CAST(n AS DOUBLE) / CAST(tn AS DOUBLE) -
          LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE))) /
        LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS chi2_term
    FROM c CROSS JOIN t ORDER BY digit"""))

  val all: Seq[QueryDef] = Seq(itemCfRecs, benford)
}
