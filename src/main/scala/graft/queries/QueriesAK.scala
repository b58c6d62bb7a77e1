package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 37 (round 8): entity resolution end-to-end and type-run
  * analytics.
  */
object QueriesAK {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Entity resolution over the part catalogue: (brand, size)-blocked
    * candidate pairs at edit distance ≤ 8 (the threshold that yields
    * real matches at every test scale — ≤ 3 found zero pairs at
    * sf0.001 and failed the rows>0 smoke), clustered by 3 synchronous
    * min-label rounds (fixed rounds — the mirror runs the identical
    * algorithm, so even an unconverged labeling matches), canonical
    * survivor = smallest key. Top-15 merged entities by size.
    *
    * The full ER pipeline shape: block → match → cluster → survive, each
    * stage bounded (block key caps the pair fan-out; clustering touches
    * only matched nodes).
    */
  val entityResolution: QueryDef = {
    val maxDist = 8; val rounds = 3; val k = 15
    val steps = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (SELECT n.node,
          LEAST(n.label, COALESCE(m.ml, n.label)) AS label
          FROM l${i - 1} n LEFT JOIN (
            SELECT e.dst AS node, MIN(l.label) AS ml
            FROM ed e JOIN l${i - 1} l ON l.node = e.src GROUP BY 1) m
          ON m.node = n.node)"""
    }.mkString(",\n        ")
    QueryDef(
      "er_entity_resolution",
      (s, dir) => {
        val p = t(s, dir, "part")
          .select(col("p_brand"), col("p_size"), col("p_partkey"), col("p_name"))
        val pairs = p.select(col("p_brand"), col("p_size"),
            col("p_partkey").as("a"), col("p_name").as("na"))
          .join(p.select(col("p_brand"), col("p_size"),
            col("p_partkey").as("b"), col("p_name").as("nb")),
            Seq("p_brand", "p_size"))
          .filter(col("a") < col("b") &&
            abs(length(col("na")) - length(col("nb"))) <= maxDist &&
            levenshtein(col("na"), col("nb")) <= maxDist)
          .select(col("a"), col("b"))
        // r13: fanOut AFTER the checkpoint (frozen-coalesced-layout
        // rule — each min-label round joins broadcast labels against ed,
        // and only the RDD-backed probe sees the true partition count)
        val ed = Core.fanOut(
          pairs.select(col("a").as("src"), col("b").as("dst"))
            .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
            .distinct().localCheckpoint())
        var lab = ed.select(col("src").as("node")).distinct()
          .withColumn("label", col("node"))
        for (_ <- 1 to rounds) {
          val m = ed.join(lab.withColumnRenamed("node", "src"), Seq("src"))
            .groupBy(col("dst").as("node")).agg(min(col("label")).as("ml"))
          lab = lab.join(m, Seq("node"), "left")
            .select(col("node"),
              least(col("label"), coalesce(col("ml"), col("label"))).as("label"))
            .localCheckpoint()
        }
        val sizes = lab.groupBy(col("label").as("canonical"))
          .agg(count(lit(1)).as("n_members"))
        // bounded top-k by (n_members DESC, canonical ASC): k rows per
        // partial buffer instead of a global single-partition sort of the
        // cluster relation (which grows with data)
        val topk = udaf(new graft.functions.Aggregators.TopK(k))
        sizes.agg(topk(col("n_members").cast("double"), col("canonical"))
            .as("hits"))
          .select(posexplode(col("hits")))
          .select((col("pos") + 1).cast("int").as("rank"),
            col("col.id").as("canonical"),
            col("col.score").cast("long").as("n_members"))
          .orderBy(col("rank"))
      },
      Some(s"""WITH pr AS (SELECT a.p_partkey AS a, b.p_partkey AS b
          FROM part a JOIN part b ON a.p_brand = b.p_brand
            AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
            AND abs(len(a.p_name) - len(b.p_name)) <= $maxDist
            AND levenshtein(a.p_name, b.p_name) <= $maxDist),
        ed AS MATERIALIZED (SELECT a AS src, b AS dst FROM pr
          UNION SELECT b, a FROM pr),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM ed),
        $steps,
        sz AS (SELECT label AS canonical, CAST(COUNT(*) AS BIGINT)
          AS n_members FROM l$rounds GROUP BY 1),
        r AS (SELECT canonical, n_members, ROW_NUMBER() OVER
          (ORDER BY n_members DESC, canonical) AS rank FROM sz)
      SELECT CAST(rank AS INT) AS rank, canonical, n_members
      FROM r WHERE rank <= $k ORDER BY rank"""))
  }

  /** Run-length encoding of event-type runs per user (the
    * rn − rn-per-type islands trick): runs, longest run, switches.
    */
  val typeRuns: QueryDef = QueryDef(
    "w19_type_runs",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wt = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val runs = t(s, dir, "events").filter(col("user_id") < 60)
        .withColumn("__grp", row_number().over(w) - row_number().over(wt))
        .groupBy(col("user_id"), col("event_type"), col("__grp"))
        .agg(count(lit(1)).as("len"))
      runs.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_runs"),
          max(col("len")).as("longest_run"),
          sum(col("len")).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""WITH r AS (SELECT user_id, event_type,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) -
        ROW_NUMBER() OVER (PARTITION BY user_id, event_type
          ORDER BY ts, event_id) AS grp
        FROM events WHERE user_id < 60),
      runs AS (SELECT user_id, event_type, grp,
        CAST(COUNT(*) AS BIGINT) AS len FROM r GROUP BY 1, 2, 3)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
      CAST(MAX(len) AS BIGINT) AS longest_run,
      CAST(SUM(len) AS BIGINT) AS n_events
    FROM runs GROUP BY 1 ORDER BY user_id"""))

  val all: Seq[QueryDef] = Seq(entityResolution, typeRuns)
}
