package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 32 (round 8): point-in-time feature snapshots, bucketed
  * co-located joins, and blocked string-similarity joins.
  */
object QueriesAF {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Point-in-time-correct training features: at each purchase event, the
    * user's STRICTLY-PRIOR activity (count + last value of non-purchase
    * events) under the (ts, event_id) total order — the feature-store
    * primitive that prevents label leakage. One per-user window over the
    * merged stream; label rows filter out at the end, so the features
    * for every label come from a single pass however many labels a user
    * has.
    */
  val pitFeatures: QueryDef = QueryDef(
    "m18_pit_features",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val np = col("event_type") =!= "purchase"
      t(s, dir, "events").filter(col("user_id") < 60)
        .withColumn("n_prior",
          coalesce(sum(when(np, 1L).otherwise(0L)).over(w), lit(0L)))
        .withColumn("last_prior_value",
          last(when(np, col("value")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("n_prior"), round(col("last_prior_value"), 6).as("last_prior_value"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""WITH b AS (SELECT event_id, user_id, ts, event_type, value,
        COALESCE(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_prior,
        LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN value END
          IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS last_prior_value
        FROM events WHERE user_id < 60)
    SELECT event_id, user_id, ts, CAST(n_prior AS BIGINT) AS n_prior,
      ROUND(last_prior_value, 6) AS last_prior_value
    FROM b WHERE event_type = 'purchase'
    ORDER BY user_id, ts, event_id"""))

  /** Bucketed co-located join: two per-user aggregates written as
    * 8-bucket sorted tables, then joined WITHOUT a shuffle (the plan
    * assertion lives in PlanShapeSpec). The gate compares the bucketed
    * join's result to the mirror's plain join — bucketing must change
    * the physics, never the answer.
    */
  val bucketedJoin: QueryDef = QueryDef(
    "j13_bucketed_join",
    (s, dir) => {
      val base = new java.io.File(sys.props("java.io.tmpdir"), "graft_bkt")
      val ev = t(s, dir, "events")
      val counts = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          Ora.dsum6(col("value")).as("sum_v"))
      val types = ev.groupBy(col("user_id"))
        .agg(countDistinct(col("event_type")).as("n_types"))
      def writeBucketed(df: DataFrame, name: String): Unit =
        df.write.bucketBy(8, "user_id").sortBy("user_id")
          .option("path", new java.io.File(base, name).getAbsolutePath)
          .mode("overwrite").saveAsTable(name)
      writeBucketed(counts, "graft_bkt_counts")
      writeBucketed(types, "graft_bkt_types")
      s.table("graft_bkt_counts").join(s.table("graft_bkt_types"), Seq("user_id"))
        .orderBy(col("user_id"))
    },
    Some(s"""WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        ${Ora.dsum6Sql("value")} AS sum_v FROM events GROUP BY 1),
      t AS (SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT)
        AS n_types FROM events GROUP BY 1)
    SELECT c.user_id, c.n_events, c.sum_v, t.n_types
    FROM c JOIN t USING (user_id) ORDER BY user_id"""))

  /** Blocked string-similarity join: 20 closest part-name pairs with
    * edit distance ≤ 10 WITHIN a (brand, size) block — the composite
    * block key bounds pair fan-out ~50× tighter than brand alone
    * (13 → ~1 s at sf0.1; at 100 TB the block key IS the scalability
    * dial). The |length difference| ≤ 10 lower bound prunes before the
    * quadratic-cost levenshtein — lossless under the dist ≤ 10
    * definition the mirror states directly.
    */
  val editDistancePairs: QueryDef = {
    val k = 20; val maxDist = 10
    QueryDef(
      "f22_edit_distance",
      (s, dir) => {
        val p = t(s, dir, "part")
          .select(col("p_brand"), col("p_size"), col("p_partkey"), col("p_name"))
        val pairs = p.select(col("p_brand"), col("p_size"),
            col("p_partkey").as("id_a"), col("p_name").as("name_a"))
          .join(p.select(col("p_brand"), col("p_size"),
            col("p_partkey").as("id_b"), col("p_name").as("name_b")),
            Seq("p_brand", "p_size"))
          .filter(col("id_a") < col("id_b") &&
            abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
          // 2-arg levenshtein: the 3-arg banded variant measured 2x SLOWER
          // in Spark 4.1 (interpreted path); the length lower bound plus
          // the dist cutoff do the pruning instead
          .select(col("p_brand"), col("id_a"), col("id_b"),
            levenshtein(col("name_a"), col("name_b")).as("dist"))
          .filter(col("dist") <= maxDist)
        // bounded closest-k by (dist ASC, id_a, id_b): k pairs per partial
        // buffer instead of a global single-partition sort of the pair
        // relation (which grows with data); the block brand of the k
        // winners is recovered from `part` via a broadcast join of k rows
        val botk = udaf(new graft.functions.Aggregators.BottomKPair(k))
        val top = pairs.agg(botk(col("dist").cast("double"),
            col("id_a"), col("id_b")).as("hits"))
          .select(posexplode(col("hits")))
          .select((col("pos") + 1).cast("int").as("rank"),
            col("col.a").as("id_a"), col("col.b").as("id_b"),
            col("col.score").cast("int").as("dist"))
        broadcast(top)
          .join(p.select(col("p_partkey").as("id_a"), col("p_brand")),
            Seq("id_a"))
          .select(col("rank"), col("p_brand"), col("id_a"), col("id_b"),
            col("dist"))
          .orderBy(col("rank"))
      },
      Some(s"""WITH pr AS (SELECT a.p_brand, a.p_partkey AS id_a,
          b.p_partkey AS id_b,
          CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
          FROM part a JOIN part b ON a.p_brand = b.p_brand
            AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey),
        r AS (SELECT p_brand, id_a, id_b, dist, ROW_NUMBER() OVER
          (ORDER BY dist, id_a, id_b) AS rank
          FROM pr WHERE dist <= $maxDist)
      SELECT CAST(rank AS INT) AS rank, p_brand, id_a, id_b, dist
      FROM r WHERE rank <= $k ORDER BY rank"""))
  }

  val all: Seq[QueryDef] = Seq(pitFeatures, bucketedJoin, editDistancePairs)
}
