package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.functions.Phys
import graft.operators.{Agg, AsOf, Relational, Windows}

/** One declared query per implemented operator (SURVEY.md §2), runnable on the
  * driver-provided TPC-H-ish testdata and hash-verifiable against a DuckDB
  * oracle.
  *
  * Determinism discipline (double arithmetic is order-dependent, and Spark and
  * DuckDB will sum in different orders):
  *   - every SUM/AVG over doubles goes through an exact DECIMAL accumulator
  *     (`dsum`) — decimal addition is associative, so both engines produce the
  *     identical value regardless of partitioning;
  *   - scalar double math applied afterwards is the same IEEE ops on identical
  *     inputs on both sides;
  *   - computed columns get a final round(6) and an explicit alias matching
  *     the oracle SQL column name;
  *   - every query ends in a total ORDER BY on its key columns.
  */
object Queries {
  import Ora._

  final case class QueryDef(name: String,
                            build: (SparkSession, String) => DataFrame,
                            oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Session-scoped memo for relations several queries rebuild identically
    * (an in-memory analogue of a persisted shared index). The outer map is
    * a WeakHashMap keyed on the SparkSession INSTANCE: identity semantics
    * mean a sibling session with different partitioning
    * (PartitionInvarianceSpec) can never collide with another session's
    * checkpointed blocks (an identityHashCode string key could). The inner
    * map is held through a SoftReference: a cached Dataset strongly
    * references its SparkSession (via QueryExecution), so storing it as a
    * plain WeakHashMap VALUE would resurrect the key and pin every
    * session's entries for the JVM lifetime. With the soft indirection an
    * abandoned session is at most softly reachable from this cache, so the
    * GC clears the entry under memory pressure (always before OOM), and
    * the ContextCleaner then unpersists the collected RDDs' checkpoint
    * blocks. The builder result is localCheckpoint-ed: built once per
    * (session, dir), read by every consumer.
    */
  private val relCache = new java.util.WeakHashMap[
    SparkSession, java.lang.ref.SoftReference[
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]]()
  private[queries] def memoRel(s: SparkSession, dir: String, key: String)
                              (build: => DataFrame): DataFrame = {
    val perSession = relCache.synchronized {
      val ref = relCache.get(s)
      val live = if (ref == null) null else ref.get()
      if (live == null) {
        val m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        relCache.put(s, new java.lang.ref.SoftReference(m))
        m
      } else live
    }
    // protectRdds: memo blocks must survive Core.releaseTransientBlocks
    // (the between-queries checkpoint release) — every consumer after the
    // first reads this materialized RDD, and a released localCheckpoint is
    // unrecomputable
    perSession.computeIfAbsent(s"$dir|$key",
      _ => Core.protectRdds(build.localCheckpoint()))
  }

  /** The distinct (ok, item) basket relation under [[coPurchasePairs]] —
    * memoized separately (r13) because three consumers re-built the same
    * lineitem distinct: the pair build, recsys_item_cf's degree counts,
    * and assoc_rules' item marginals.
    */
  private[queries] def basketItems(s: SparkSession, dir: String): DataFrame =
    memoRel(s, dir, "basket_items") {
      t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
        .distinct()
    }

  /** The weighted co-purchase pair relation (a < b item pairs sharing a
    * basket, with the shared-basket count) — the common input of SEVEN
    * graph queries (triangle count, BFS, k-core, label propagation,
    * assortativity, item-Jaccard, item-CF recommender). Built + shuffled
    * ONCE per session via [[memoRel]]; each consumer applies its own
    * support filter / projection. In the bench this removes six rebuilds
    * of the basket self-join (the graph family's shared dominant cost).
    */
  private[queries] def coPurchasePairs(s: SparkSession, dir: String): DataFrame =
    memoRel(s, dir, "copurchase_pairs") {
      val bk = basketItems(s, dir)
      bk.select(col("ok"), col("item").as("a"))
        .join(bk.select(col("ok"), col("item").as("b")), Seq("ok"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    }

  /** The verified n=3 Jaccard near-dup pair relation over `documents`
    * (minJaccard 0.5, maxDf 1000) — shared input of dedup_ngram_jaccard,
    * dedup_clusters, and dedup_canonicalize; the shingle inverted-index
    * join builds once per session instead of three times.
    */
  private[queries] def jaccardPairsShared(s: SparkSession, dir: String): DataFrame =
    memoRel(s, dir, "jaccard_pairs_n3_j05_df1000") {
      graft.llm.Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDf = 1000)
    }

  /** The verified MinHash+LSH near-dup pair relation over `documents`
    * (n=3, k=16, r=4, minJaccard 0.5) — shared by dedup_minhash and the
    * sketch_minhash_error calibration.
    */
  private[queries] def minhashPairsShared(s: SparkSession, dir: String): DataFrame =
    memoRel(s, dir, "minhash_pairs_n3_k16_r4_j05") {
      graft.llm.Dedup.minhashDedup(t(s, dir, "documents"), "doc_id", "text",
        n = 3, k = 16, r = 4, minJaccard = 0.5)
    }

  /** Exact, order-independent sum of a double expression (see header). */



  // epoch seconds, truncated — Spark unix_timestamp() truncates sub-second

  // ---------------------------------------------------------------- queries

  /** Flagship (SURVEY §7.2 slice): pricing summary — grouped sums/means over
    * the fact table (A4 codes 0/2, F8-style arithmetic). TPC-H Q1 shape.
    */
  val q1PricingSummary: QueryDef = QueryDef(
    "q1_pricing_summary",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy($"l_returnflag", $"l_linestatus").agg(
          dsum6($"l_quantity").as("sum_qty"),
          dsum2($"l_extendedprice").as("sum_price"),
          dsum2($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
          r6(dmean($"l_discount")).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${dsum6Sql("l_quantity")} AS sum_qty,
      ${dsum2Sql("l_extendedprice")} AS sum_price,
      ${dsum2Sql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      ROUND(${dmeanSql("l_discount")}, 6) AS avg_disc,
      COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** S1/P5: pruned scan — projection + pushed predicate on the fact table. */
  val s1Scan: QueryDef = QueryDef(
    "s1_scan_prune",
    (s, dir) => t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .filter($"l_quantity" > 45.0)
      .orderBy($"l_orderkey", $"l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem WHERE l_quantity > 45.0
      ORDER BY l_orderkey, l_linenumber"""))

  /** S4/O5/P6: daily upsert — overlapping old+new slices, union, dedup on key
    * (identical payloads on the overlap, as in the reference's re-run case).
    */
  val s4Upsert: QueryDef = QueryDef(
    "s4_daily_upsert",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val old = o.filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      val nw = o.filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp"))
      Relational.upsert(old, nw, Seq("o_orderkey"))
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
        SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        UNION
        SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
      ORDER BY o_orderkey"""))

  /** S5/O7: incremental merge — append only events not already present. */
  val s5Merge: QueryDef = QueryDef(
    "s5_incremental_merge",
    (s, dir) => {
      val e = t(s, dir, "events")
      val existing = e.filter($"ts" < lit("2024-01-15").cast("timestamp"))
      val incoming = e.filter($"ts" >= lit("2024-01-10").cast("timestamp"))
      Relational.incrementalMerge(existing, incoming, Seq("event_id"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), dsum6($"value").as("sum_value"))
        .orderBy($"event_type")
    },
    Some(s"""WITH existing AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-15'),
      incoming AS (SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-10'),
      merged AS (SELECT * FROM existing
                 UNION ALL
                 SELECT * FROM incoming WHERE event_id NOT IN (SELECT event_id FROM existing))
      SELECT event_type, COUNT(*) AS n, ${dsum6Sql("value")} AS sum_value
      FROM merged GROUP BY event_type ORDER BY event_type"""))

  /** P1/P2: SQL gateway with the `UT(` → `UNIX_TIMESTAMP(` macro rewrite. */
  val p2UtMacro: QueryDef = QueryDef(
    "p2_ut_macro",
    (s, dir) => {
      Core.table(s, dir, "events").createOrReplaceTempView("events")
      Core.query(s,
        """SELECT event_type, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(27,10))) AS DOUBLE), 6) AS sum_value
           FROM events WHERE UT(ts) >= 1704412800
           GROUP BY event_type ORDER BY event_type""")
    },
    Some(s"""SELECT event_type, COUNT(*) AS n,
      ${dsum6Sql("value")} AS sum_value
      FROM events WHERE ${epochSql("ts")} >= 1704412800
      GROUP BY event_type ORDER BY event_type"""))

  /** P3/F14: time-range filter + cadence floor bucketing. */
  val p3TimeRange: QueryDef = QueryDef(
    "p3_time_range_bucket",
    (s, dir) => t(s, dir, "events")
      .filter($"ts".between(lit("2024-01-05").cast("timestamp"),
                            lit("2024-01-12").cast("timestamp")))
      .withColumn("bucket", Phys.floorToCadence(epochS($"ts"), 600L))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), dsum6($"value").as("sum_value"))
      .orderBy($"bucket"),
    Some(s"""SELECT (${epochSql("ts")} - ${epochSql("ts")} % 600) AS bucket,
      COUNT(*) AS n, ${dsum6Sql("value")} AS sum_value
      FROM events
      WHERE ts BETWEEN TIMESTAMP '2024-01-05' AND TIMESTAMP '2024-01-12'
      GROUP BY 1 ORDER BY 1"""))

  /** P6: deterministic dedup on a key subset (first by tie-break order). */
  val p6Dedup: QueryDef = QueryDef(
    "p6_dedup_subset",
    (s, dir) => Relational.dedupKeepFirst(
        t(s, dir, "events"), Seq("user_id", "event_type"), "event_id")
      .select($"user_id", $"event_type", $"event_id", $"value")
      .orderBy($"user_id", $"event_type"),
    Some("""SELECT user_id, event_type, event_id, value FROM (
        SELECT user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        FROM events) WHERE rn = 1
      ORDER BY user_id, event_type"""))

  /** P7/P12: blocklist + prefix exclusion filters. */
  val p7Blocklist: QueryDef = QueryDef(
    "p7_blocklist_prefix",
    (s, dir) => {
      val c = t(s, dir, "customer")
      Relational.excludePrefix(
          Relational.blocklist(c, "c_mktsegment", Seq("MACHINERY", "FURNITURE")),
          "c_name", "Customer#00000001")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE c_mktsegment NOT IN ('MACHINERY', 'FURNITURE')
        AND c_name NOT LIKE 'Customer#00000001%'
      ORDER BY c_custkey"""))

  /** P8: physics-constraint compound filter (shape of ml/rf.py:411-420). */
  val p8Constraint: QueryDef = QueryDef(
    "p8_physics_constraint",
    (s, dir) => Relational.physicsConstraint(
        t(s, dir, "lineitem"),
        !(($"l_quantity" > 40.0) && ($"l_extendedprice" < 20000.0)) &&
        !(($"l_quantity" < 5.0) && ($"l_extendedprice" > 80000.0)))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), dsum6($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag"),
    Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${dsum6Sql("l_quantity")} AS sum_qty
      FROM lineitem
      WHERE NOT (l_quantity > 40.0 AND l_extendedprice < 20000.0)
        AND NOT (l_quantity < 5.0 AND l_extendedprice > 80000.0)
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** J1: the canonical composite-key equi-join + aggregation. */
  val j1JoinAgg: QueryDef = QueryDef(
    "j1_key_join_agg",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
             dsum2($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"o_orderpriority")
    },
    Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
      ${dsum2Sql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** J2/J5: broadcast dimension enrichment (small dims explicitly broadcast). */
  val j2Broadcast: QueryDef = QueryDef(
    "j2_broadcast_enrich",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val su = t(s, dir, "supplier")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n"),
             dsum2($"l_extendedprice").as("sum_price"),
             dsum6($"p_retailprice" * $"l_quantity").as("retail_value"))
        .orderBy($"p_brand")
    },
    Some(s"""SELECT p_brand, COUNT(*) AS n,
      ${dsum2Sql("l_extendedprice")} AS sum_price,
      ${dsum6Sql("p_retailprice * l_quantity")} AS retail_value
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY p_brand ORDER BY p_brand"""))

  /** J3/O6: three-way semi-join — keys present in all three tables. */
  val j3Semi: QueryDef = QueryDef(
    "j3_three_way_semi",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select($"o_custkey".as("c_custkey"))
      val asiaNations = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter($"r_name" === "ASIA")),
              $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey".as("c_nationkey"))
      // threeWaySemi is for a shared composite key; here the two semi-joins
      // use different keys so compose the same shape directly:
      c.join(o, Seq("c_custkey"), "left_semi")
        .join(asiaNations, Seq("c_nationkey"), "left_semi")
        .select($"c_custkey", $"c_name", $"c_nationkey")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_nationkey FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders)
        AND c_nationkey IN (SELECT n_nationkey FROM nation JOIN region
                            ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
      ORDER BY c_custkey"""))

  /** A1: wet-period filter — keep (user, hour) groups over a sum threshold. */
  val a1WetHour: QueryDef = QueryDef(
    "a1_wet_hour",
    (s, dir) => Relational.wetPeriodFilter(
        t(s, dir, "events"), "user_id", "ts", "value", 200.0)
      .groupBy($"user_id", Phys.floorToCadence(epochS($"ts"), 3600L).as("hour_e"))
      .agg(count(lit(1)).as("n"), dsum6($"value").as("sum_value"))
      .orderBy($"user_id", $"hour_e"),
    Some(s"""SELECT user_id, (${epochSql("ts")} - ${epochSql("ts")} % 3600) AS hour_e,
      COUNT(*) AS n, ${dsum6Sql("value")} AS sum_value
      FROM events GROUP BY 1, 2 HAVING SUM(value) >= 200.0
      ORDER BY user_id, hour_e"""))

  /** A2/W2: full-period filter — groups with exactly n rows, via window count. */
  val a2FullHour: QueryDef = QueryDef(
    "a2_full_hour",
    (s, dir) => Relational.fullPeriodFilter(
        t(s, dir, "events"), "user_id", "ts", 2L)
      .groupBy($"user_id", Phys.floorToCadence(epochS($"ts"), 3600L).as("hour_e"))
      .agg(count(lit(1)).as("n"), dsum6($"value").as("sum_value"))
      .orderBy($"user_id", $"hour_e"),
    Some(s"""SELECT user_id, (${epochSql("ts")} - ${epochSql("ts")} % 3600) AS hour_e,
      COUNT(*) AS n, ${dsum6Sql("value")} AS sum_value
      FROM events GROUP BY 1, 2 HAVING COUNT(*) = 2
      ORDER BY user_id, hour_e"""))

  /** A4/F1/F2: per-column aggregation codes — mean, dB-domain mean, sum. */
  val a4DbMean: QueryDef = QueryDef(
    "a4_aggregate_multi",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(r6(dmean($"l_quantity")).as("qty_mean"),
           r6(log10(dmean(pow(lit(10.0), $"l_quantity" * 0.1))) * 10.0).as("qty_dbmean"),
           dsum6($"l_tax").as("tax_sum"))
      .orderBy($"l_returnflag"),
    Some(s"""SELECT l_returnflag,
      ROUND(${dmeanSql("l_quantity")}, 6) AS qty_mean,
      ROUND(LOG10(${dmeanSql("POW(10.0, l_quantity * 0.1)")}) * 10.0, 6) AS qty_dbmean,
      ${dsum6Sql("l_tax")} AS tax_sum
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** A3: vertical aggregation — weighted means + weighted one-hot proportions
    * of a categorical column, one shuffle.
    */
  val a3VertAgg: QueryDef = QueryDef(
    "a3_vert_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val w = $"l_quantity"
      li.groupBy($"l_returnflag").agg(
          r6(dsum($"l_extendedprice" * w) / dsum(w)).as("wmean_price"),
          r6(dsum(when($"l_linestatus" === "F", w).otherwise(0.0)) / dsum(w)).as("prop_F"),
          r6(dsum(when($"l_linestatus" === "O", w).otherwise(0.0)) / dsum(w)).as("prop_O"))
        .orderBy($"l_returnflag")
    },
    Some(s"""SELECT l_returnflag,
      ROUND(${dsumSql("l_extendedprice * l_quantity")} / ${dsumSql("l_quantity")}, 6) AS wmean_price,
      ROUND(${dsumSql("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END")} / ${dsumSql("l_quantity")}, 6) AS prop_F,
      ROUND(${dsumSql("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END")} / ${dsumSql("l_quantity")}, 6) AS prop_O
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** A5/O3: argmax semantics — value at the row of max/min ordering column. */
  val a5MaxBy: QueryDef = QueryDef(
    "a5_max_by",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      // tie-break on the selected value itself: rows tying on quantity AND
      // price produce the same output either way, so the argmax is deterministic
      val ord = $"l_quantity" * 1000000000.0 + $"l_extendedprice"
      li.groupBy($"l_orderkey")
        .agg(r6(dmean($"l_extendedprice")).as("price_mean"),
             max_by($"l_extendedprice", ord).as("price_at_maxq"),
             min_by($"l_extendedprice", ord).as("price_at_minq"))
        .orderBy($"l_orderkey")
    },
    Some(s"""SELECT l_orderkey,
      ROUND(${dmeanSql("l_extendedprice")}, 6) AS price_mean,
      ARG_MAX(l_extendedprice, l_quantity * 1000000000.0 + l_extendedprice) AS price_at_maxq,
      ARG_MIN(l_extendedprice, l_quantity * 1000000000.0 + l_extendedprice) AS price_at_minq
      FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))

  /** A6: scatter-add grid aggregation — sum/count/mean/any-valid per cell
    * (same plan shape as Agg.gridScatterAgg, with decimal-exact internals for
    * the oracle hash).
    */
  val a6GridScatter: QueryDef = QueryDef(
    "a6_grid_scatter",
    (s, dir) => t(s, dir, "events")
      .withColumn("x", ($"user_id" % 16).cast("int"))
      .withColumn("y", ($"event_id" % 7).cast("int"))
      .withColumn("v", when($"value" > 10.0, $"value"))
      .groupBy($"x", $"y")
      .agg(dsum6($"v").as("sum_v"),
           count($"v").as("n_v"),
           r6(dsum($"v") / count($"v")).as("mean_v"),
           max($"v".isNotNull).as("any_valid"))
      .orderBy($"x", $"y"),
    Some(s"""SELECT CAST(user_id % 16 AS INT) AS x, CAST(event_id % 7 AS INT) AS y,
      ${dsum6Sql("CASE WHEN value > 10.0 THEN value END")} AS sum_v,
      COUNT(CASE WHEN value > 10.0 THEN value END) AS n_v,
      ROUND(${dsumSql("CASE WHEN value > 10.0 THEN value END")} / COUNT(CASE WHEN value > 10.0 THEN value END), 6) AS mean_v,
      MAX(value > 10.0) AS any_valid
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** A7: hourly rollup of sub-hourly values. */
  val a7Hourly: QueryDef = QueryDef(
    "a7_hourly_mean",
    (s, dir) => t(s, dir, "events")
      .groupBy($"user_id", Phys.floorToCadence(epochS($"ts"), 3600L).as("hour_e"))
      .agg(r6(dmean($"value")).as("value_hmean"))
      .orderBy($"user_id", $"hour_e"),
    Some(s"""SELECT user_id, (${epochSql("ts")} - ${epochSql("ts")} % 3600) AS hour_e,
      ROUND(${dmeanSql("value")}, 6) AS value_hmean
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** A10: distinct projection. */
  val a10Distinct: QueryDef = QueryDef(
    "a10_distinct",
    (s, dir) => t(s, dir, "events")
      .select($"user_id", $"event_type").distinct()
      .orderBy($"user_id", $"event_type"),
    Some("""SELECT DISTINCT user_id, event_type FROM events
      ORDER BY user_id, event_type"""))

  /** A14: statistics rollup — mean/std/min/max/n with decimal-exact moments
    * (std from Σx, Σx² so both engines agree bit-for-bit).
    */
  val a14Stats: QueryDef = QueryDef(
    "a14_stats_rollup",
    (s, dir) => {
      val e = t(s, dir, "events")
      val n = count($"value")
      val sx = dsum($"value")
      val sxx = dsum($"value" * $"value")
      e.groupBy($"event_type").agg(
          r6(sx / n).as("mean"),
          r6(sqrt((sxx - sx * sx / n) / (n - lit(1)))).as("std"),
          r6(min($"value")).as("min_v"),
          r6(max($"value")).as("max_v"),
          n.as("n"))
        .orderBy($"event_type")
    },
    Some(s"""SELECT event_type,
      ROUND(${dsumSql("value")} / COUNT(value), 6) AS mean,
      ROUND(SQRT((${dsumSql("value * value")} - ${dsumSql("value")} * ${dsumSql("value")} / COUNT(value)) / (COUNT(value) - 1)), 6) AS std,
      ROUND(MIN(value), 6) AS min_v, ROUND(MAX(value), 6) AS max_v,
      COUNT(value) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** W1: sessionization — gap > 30 min starts a new session; session stats. */
  val w1Sessionize: QueryDef = QueryDef(
    "w1_sessionize",
    (s, dir) => Windows.sessionize(t(s, dir, "events"), "user_id", "ts", 1800L)
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
           (max(epochS($"ts")) - min(epochS($"ts"))).as("duration_s"),
           min(epochS($"ts")).as("start_e"))
      .orderBy($"user_id", $"session_id"),
    Some(s"""WITH g AS (
        SELECT user_id, ts, ${epochSql("ts")} AS e,
               LAG(${epochSql("ts")}) OVER (PARTITION BY user_id ORDER BY ts) AS pe
        FROM events),
      s AS (SELECT user_id, ts, e,
                   CASE WHEN pe IS NULL OR e - pe > 1800 THEN 1 ELSE 0 END AS ns
            FROM g),
      t AS (SELECT user_id, e,
                   CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM s)
      SELECT user_id, session_id, COUNT(*) AS n_events,
             MAX(e) - MIN(e) AS duration_s, MIN(e) AS start_e
      FROM t GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** J10/O3: nearest-centroid theta-join — argmin distance over a broadcast
    * centroid table (hydrometeor-classification shape).
    */
  val j10Centroid: QueryDef = QueryDef(
    "j10_nearest_centroid",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val centroids = c.groupBy($"c_mktsegment".as("seg"))
        .agg(dmean($"c_acctbal").as("cavg"))
      c.crossJoin(broadcast(centroids))
        .groupBy($"c_custkey")
        .agg(min_by($"seg", abs($"c_acctbal" - $"cavg")).as("nearest_seg"))
        .orderBy($"c_custkey")
    },
    Some(s"""WITH centroids AS (
        SELECT c_mktsegment AS seg, ${dmeanSql("c_acctbal")} AS cavg
        FROM customer GROUP BY c_mktsegment)
      SELECT c.c_custkey, ARG_MIN(ct.seg, ABS(c.c_acctbal - ct.cavg)) AS nearest_seg
      FROM customer c CROSS JOIN centroids ct
      GROUP BY c.c_custkey ORDER BY c.c_custkey"""))

  // ------------------------------------------------------------ registry

  val all: Seq[QueryDef] = Seq(
    q1PricingSummary, s1Scan, s4Upsert, s5Merge, p2UtMacro, p3TimeRange,
    p6Dedup, p7Blocklist, p8Constraint, j1JoinAgg, j2Broadcast, j3Semi,
    a1WetHour, a2FullHour, a4DbMean, a3VertAgg, a5MaxBy, a6GridScatter,
    a7Hourly, a10Distinct, a14Stats, w1Sessionize, j10Centroid)

  // sugar so query bodies read like `$"col"`
  import org.apache.spark.sql.ColumnName
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
