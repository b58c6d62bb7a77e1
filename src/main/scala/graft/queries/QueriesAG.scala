package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 33 (round 8): RFM segmentation, item-item Jaccard similarity
  * (the collaborative-filtering neighborhood), and OHLC time bars.
  */
object QueriesAG {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** RFM segmentation over purchase events: recency (days before the
    * fixed 2024-02-01 reference), frequency, monetary per user, scored
    * into VALUE-defined quartiles (score = 1 + #thresholds passed, best
    * quartile = 1) and concatenated into the classic segment code.
    *
    * Scale shape: the three quartile thresholds come from
    * [[graft.operators.Agg.exactPercentilesMulti]] — shuffle-free
    * counting selection, never a global sort — and are broadcast back as
    * literals, so no `NTILE OVER (ORDER BY …)` single-partition window
    * exists at ANY table size (a billion-customer RFM stays distributed).
    * Value-defined buckets also mean ties share a score, the semantics a
    * marketer actually wants; rank-split NTILE would separate equal
    * spenders by user id.
    */
  val rfmSegments: QueryDef = {
    val refEpoch = 1706745600L // 2024-02-01T00:00:00Z
    QueryDef(
      "b8_rfm_segments",
      (s, dir) => {
        val base = t(s, dir, "events")
          .filter(col("event_type") === "purchase" && col("value").isNotNull)
          .groupBy(col("user_id"))
          .agg(floor((lit(refEpoch) - max(unix_timestamp(col("ts")))) /
              lit(86400.0)).cast("long").as("recency_days"),
            count(lit(1)).as("frequency"),
            Ora.dsum6(col("value")).as("monetary"))
          .localCheckpoint() // threshold passes + final scan read it 3×
        val n = base.count()
        val cols3 = Seq("recency_days", "frequency", "monetary")
        val qs = graft.operators.Agg.exactPercentilesMulti(
          base, cols3, Seq(0.25, 0.5, 0.75), cols3.map(_ -> n).toMap)
        // ascending metric (lower = better): score 1 below q25, 4 above q75
        def asc(c: Column, th: Seq[Double]): Column =
          th.map(q => when(c.cast("double") > lit(q), 1).otherwise(0))
            .foldLeft(lit(1))(_ + _).cast("int")
        // descending metric (higher = better): score 1 at/above q75
        def desc(c: Column, th: Seq[Double]): Column =
          th.map(q => when(c.cast("double") < lit(q), 1).otherwise(0))
            .foldLeft(lit(1))(_ + _).cast("int")
        base.select(col("user_id"), col("recency_days"), col("frequency"),
            col("monetary"),
            asc(col("recency_days"), qs("recency_days")).as("r_score"),
            desc(col("frequency"), qs("frequency")).as("f_score"),
            desc(col("monetary"), qs("monetary")).as("m_score"))
          .withColumn("segment",
            concat(col("r_score"), col("f_score"), col("m_score")))
          .orderBy(col("user_id"))
      },
      Some {
        def ascSql(v: String, q: String): String =
          s"""CAST(1 + (CASE WHEN CAST($v AS DOUBLE) > $q[1] THEN 1 ELSE 0 END)
                + (CASE WHEN CAST($v AS DOUBLE) > $q[2] THEN 1 ELSE 0 END)
                + (CASE WHEN CAST($v AS DOUBLE) > $q[3] THEN 1 ELSE 0 END) AS INT)"""
        def descSql(v: String, q: String): String =
          s"""CAST(1 + (CASE WHEN CAST($v AS DOUBLE) < $q[1] THEN 1 ELSE 0 END)
                + (CASE WHEN CAST($v AS DOUBLE) < $q[2] THEN 1 ELSE 0 END)
                + (CASE WHEN CAST($v AS DOUBLE) < $q[3] THEN 1 ELSE 0 END) AS INT)"""
        s"""WITH base AS MATERIALIZED (SELECT user_id,
          CAST(FLOOR(($refEpoch - MAX(${Ora.epochSql("ts")})) / 86400.0)
            AS BIGINT) AS recency_days,
          CAST(COUNT(*) AS BIGINT) AS frequency,
          ${Ora.dsum6Sql("value")} AS monetary
          FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
          GROUP BY 1),
        th AS (SELECT
          quantile_cont(CAST(recency_days AS DOUBLE), [0.25, 0.5, 0.75]) AS rq,
          quantile_cont(CAST(frequency AS DOUBLE), [0.25, 0.5, 0.75]) AS fq,
          quantile_cont(CAST(monetary AS DOUBLE), [0.25, 0.5, 0.75]) AS mq
          FROM base),
        sc AS (SELECT user_id, recency_days, frequency, monetary,
          ${ascSql("recency_days", "rq")} AS r_score,
          ${descSql("frequency", "fq")} AS f_score,
          ${descSql("monetary", "mq")} AS m_score
          FROM base CROSS JOIN th)
      SELECT user_id, recency_days, frequency, monetary, r_score, f_score,
        m_score, CONCAT(r_score, f_score, m_score) AS segment
      FROM sc ORDER BY user_id"""
      })
  }

  /** Item-item Jaccard similarity over purchase baskets — the
    * collaborative-filtering neighborhood: for item pairs sharing ≥ 2
    * baskets, J = |B_a ∩ B_b| / |B_a ∪ B_b|, top-25 by (J desc, a, b).
    * The pair counts ride the basket-keyed inverted index (fan-out
    * bounded by basket size), item degrees are one keyed agg — never
    * an all-pairs item join.
    */
  val itemJaccard: QueryDef = {
    val minShared = 2; val k = 25
    QueryDef(
      "graph_item_jaccard",
      (s, dir) => {
        // r13: degree counts from the memoized basket relation (see
        // Queries.basketItems) instead of a per-query lineitem distinct
        val b = Queries.basketItems(s, dir)
        val deg = b.groupBy(col("item")).agg(count(lit(1)).as("nb"))
        val pairs = Queries.coPurchasePairs(s, dir)
          .filter(col("n_ab") >= minShared)
        val scored = pairs
          .join(deg.select(col("item").as("a"), col("nb").as("na")), Seq("a"))
          .join(deg.select(col("item").as("b"), col("nb").as("nbb")), Seq("b"))
          .select(col("a"), col("b"), col("n_ab"),
            round(col("n_ab").cast("double") /
              (col("na") + col("nbb") - col("n_ab")).cast("double"), 6)
              .as("jaccard"))
        val w = Window.orderBy(col("jaccard").desc, col("a"), col("b"))
        scored.withColumn("rank", row_number().over(w).cast("int"))
          .filter(col("rank") <= k)
          .select(col("rank"), col("a"), col("b"), col("n_ab"), col("jaccard"))
          .orderBy(col("rank"))
      },
      Some(s"""WITH bk AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
          FROM lineitem),
        deg AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS nb FROM bk
          GROUP BY 1),
        pr AS (SELECT l.item AS a, r.item AS b,
          CAST(COUNT(*) AS BIGINT) AS n_ab
          FROM bk l JOIN bk r USING (ok) WHERE l.item < r.item
          GROUP BY 1, 2 HAVING COUNT(*) >= $minShared),
        sc AS (SELECT p.a, p.b, p.n_ab,
          ROUND(CAST(p.n_ab AS DOUBLE) /
            CAST(da.nb + db.nb - p.n_ab AS DOUBLE), 6) AS jaccard
          FROM pr p JOIN deg da ON da.item = p.a JOIN deg db ON db.item = p.b),
        r AS (SELECT a, b, n_ab, jaccard, ROW_NUMBER() OVER
          (ORDER BY jaccard DESC, a, b) AS rank FROM sc)
      SELECT CAST(rank AS INT) AS rank, a, b, n_ab, jaccard
      FROM r WHERE rank <= $k ORDER BY rank"""))
  }

  /** OHLC bars: per (user, 6-hour bar) open/high/low/close of value with
    * (ts, event_id)-ordered first/last — the time-bar aggregation of
    * every market-data pipeline, via min/max_by on the composite order
    * key.
    */
  val ohlcBars: QueryDef = QueryDef(
    "w18_ohlc_bars",
    (s, dir) => {
      val bar = (floor(unix_timestamp(col("ts")) / lit(21600L)) * 21600)
        .cast("long").as("bar_start")
      // composite BIGINT order key instead of a struct: DuckDB's
      // min_by/max_by take no struct ordering. The key only has to order
      // WITHIN a bar, so the epoch term is the in-bar offset (< 21600) —
      // offset·10^12 + event_id is exact in int64 with event_id headroom
      // to 10^12 (a full-epoch·10^7 key would alias at event_id = 10^7)
      val ord = ((unix_timestamp(col("ts")) -
          floor(unix_timestamp(col("ts")) / lit(21600L)) * 21600) *
        lit(1000000000000L) + col("event_id")).as("ord")
      t(s, dir, "events").filter(col("value").isNotNull && col("user_id") < 60)
        .select(col("user_id"), bar, ord, col("value"))
        .groupBy(col("user_id"), col("bar_start"))
        .agg(count(lit(1)).as("n"),
          min_by(col("value"), col("ord")).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), col("ord")).as("close"))
        .orderBy(col("user_id"), col("bar_start"))
    },
    Some(s"""SELECT user_id,
        CAST(FLOOR(${Ora.epochSql("ts")} / 21600) * 21600 AS BIGINT)
          AS bar_start,
        CAST(COUNT(*) AS BIGINT) AS n,
        MIN_BY(value, (${Ora.epochSql("ts")}
          - CAST(FLOOR(${Ora.epochSql("ts")} / 21600) * 21600 AS BIGINT))
          * 1000000000000 + event_id) AS open,
        MAX(value) AS high, MIN(value) AS low,
        MAX_BY(value, (${Ora.epochSql("ts")}
          - CAST(FLOOR(${Ora.epochSql("ts")} / 21600) * 21600 AS BIGINT))
          * 1000000000000 + event_id) AS close
      FROM events WHERE value IS NOT NULL AND user_id < 60
      GROUP BY 1, 2 ORDER BY user_id, bar_start"""))

  val all: Seq[QueryDef] = Seq(rfmSegments, itemJaccard, ohlcBars)
}
