package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Core
import graft.functions.Phys

/** Batch 5: the remaining §2 operator IDs as explicit declared queries —
  * hourly left-join enrichment (J4), first-per-group (A11), intersect (O6),
  * derived physics columns + clamp (F9/F10/P11), DN scale decode (S8),
  * per-group count transform (W2).
  */
object QueriesE {
  import Ora._
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)


  /** J4: hourly product left-joined back onto sub-hourly rows
    * (reference: retrieve_reference_data.py:428-431 CPC.CV onto 10-min rows).
    */
  val j4HourlyJoin: QueryDef = QueryDef(
    "j4_left_join_hourly",
    (s, dir) => {
      val e = t(s, dir, "events")
      val hourly = e.groupBy($"user_id",
          Phys.floorToCadence(epochS($"ts"), 3600L).as("hour_e"))
        .agg(dsum6($"value").as("hv"))
      e.withColumn("hour_e", Phys.floorToCadence(epochS($"ts"), 3600L))
        .join(hourly, Seq("user_id", "hour_e"), "left")
        .select($"event_id", $"user_id", $"hour_e", $"hv")
        .orderBy($"event_id")
    },
    Some(s"""WITH hourly AS (
        SELECT user_id, (${epochSql("ts")} - ${epochSql("ts")} % 3600) AS hour_e,
               ${dsum6Sql("value")} AS hv
        FROM events GROUP BY 1, 2)
      SELECT e.event_id, e.user_id,
             (${epochSql("e.ts")} - ${epochSql("e.ts")} % 3600) AS hour_e, h.hv
      FROM events e LEFT JOIN hourly h
        ON e.user_id = h.user_id
       AND h.hour_e = ${epochSql("e.ts")} - ${epochSql("e.ts")} % 3600
      ORDER BY e.event_id"""))

  /** A11: first-per-group (reference: ml/rf.py:1172-1173 groupby().first()). */
  val a11First: QueryDef = QueryDef(
    "a11_first_per_group",
    (s, dir) => {
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"user_id", $"event_type".as("first_type"),
                epochS($"ts").as("first_e"))
        .orderBy($"user_id")
    },
    Some(s"""SELECT user_id, event_type AS first_type, ${epochSql("ts")} AS first_e
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS rn FROM events)
      WHERE rn = 1 ORDER BY user_id"""))

  /** O6: set intersection on key projections
    * (reference: ml/rf.py:202-205 s-tstamp set intersection).
    */
  val o6Intersect: QueryDef = QueryDef(
    "o6_intersect",
    (s, dir) => t(s, dir, "orders").select($"o_custkey".as("k"))
      .intersect(t(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("k")))
      .orderBy($"k"),
    Some("""SELECT o_custkey AS k FROM orders
      INTERSECT
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      ORDER BY k"""))

  /** F9/F10/P11: derived physics columns — iso height from the lapse rate,
    * clamped height-above-ground, minutes-in-hour, validity-floor clamp.
    */
  val f9Derived: QueryDef = QueryDef(
    "f9_derived_columns",
    (s, dir) => {
      val e = t(s, dir, "events")
      val temp = $"value" / 20.0 - 5.0
      // `+ 0.0` after round: IEEE -0.0 + 0.0 = +0.0, so both engines agree on
      // the sign of zero (DuckDB keeps -0.0 through ROUND, Spark's BigDecimal
      // round does not — one sf0.01 row hits value=100.0 → temp=0 → hiso=-0.0)
      e.select($"event_id",
          (r6(Phys.isoHeight(temp)) + 0.0).as("hiso"),
          r6(Phys.heightAboveGround($"value" * 10.0, lit(500.0))).as("hag"),
          r6((epochS($"ts") % 3600) / 60.0).as("min_in_hour"),
          r6(Phys.clampBelow($"value" / 1000.0, 0.04)).as("clamped"))
        .orderBy($"event_id")
    },
    Some(s"""SELECT event_id,
      ROUND(-(value / 20.0 - 5.0) / 0.7 * 100.0, 6) + 0.0 AS hiso,
      ROUND(GREATEST(0.0, value * 10.0 - 500.0), 6) AS hag,
      ROUND((${epochSql("ts")} % 3600) / 60.0, 6) AS min_in_hour,
      ROUND(CASE WHEN value / 1000.0 < 0.04 THEN 0.0 ELSE value / 1000.0 END, 6) AS clamped
      FROM events ORDER BY event_id"""))

  /** S8/S13: DN byte ↔ physical value decode through a scale array. */
  val s8DnDecode: QueryDef = {
    val scale = (0 until 10).map(i => i * 0.5)
    QueryDef(
      "s8_dn_decode",
      (s, dir) => t(s, dir, "events")
        .withColumn("dn", least(floor($"value" / 20.0).cast("int"), lit(9)))
        .withColumn("decoded", Phys.dnDecode($"dn", scale))
        .groupBy($"dn", $"decoded")
        .agg(count(lit(1)).as("n"))
        .orderBy($"dn"),
      Some(s"""SELECT dn, ([${scale.mkString(", ")}])[dn + 1] AS decoded, COUNT(*) AS n
        FROM (SELECT LEAST(CAST(FLOOR(value / 20.0) AS INT), 9) AS dn FROM events)
        GROUP BY dn ORDER BY dn"""))
  }

  /** W2: per-group count transform broadcast back to rows. */
  val w2Count: QueryDef = QueryDef(
    "w2_count_transform",
    (s, dir) => graft.operators.Windows.countTransform(
        t(s, dir, "events").select($"event_id", $"user_id"), Seq("user_id"))
      .orderBy($"event_id"),
    Some("""SELECT event_id, user_id,
      COUNT(*) OVER (PARTITION BY user_id) AS group_count
      FROM events ORDER BY event_id"""))

  /** S9/W4: distributed (2k+1)² neighborhood statistics over a sparse grid —
    * the scatter-join pattern of Grid.boxStats with decimal-exact internals
    * (the scale path for the reference's 3×3 wet-radome mean and 7×7 outlier
    * window when the grid doesn't fit one node).
    */
  val w4BoxStats: QueryDef = QueryDef(
    "w4_box_stats",
    (s, dir) => {
      val cells = t(s, dir, "events")
        .groupBy(($"user_id" % 16).cast("int").as("chx"),
                 ($"event_id" % 7).cast("int").as("chy"))
        .agg(dsum6($"value").as("v"))
      val off = lit((-1 to 1).toArray)
      val n = count($"v")
      val sx = dsum($"v")
      // v carries 6 decimals, so v*v needs up to 12 — a 10-decimal accumulator
      // rounds it and the near-zero variance subtraction amplifies the
      // boundary-rounding difference between engines; 14 decimals is exact
      val sxx = sum(($"v" * $"v").cast("decimal(32,14)")).cast("double")
      cells
        .withColumn("dx", explode(off))
        .withColumn("dy", explode(off))
        .groupBy(($"chx" + $"dx").as("chx"), ($"chy" + $"dy").as("chy"))
        .agg(r6(sx / n).as("box_mean"),
             r6(sqrt(greatest(lit(0.0), (sxx - sx * sx / n) / n))).as("box_std"),
             n.as("box_n"))
        .orderBy($"chx", $"chy")
    },
    Some(s"""WITH cells AS (
        SELECT CAST(user_id % 16 AS INT) AS chx, CAST(event_id % 7 AS INT) AS chy,
               ${dsum6Sql("value")} AS v
        FROM events GROUP BY 1, 2),
      scattered AS (
        SELECT c.chx + dx.g AS chx, c.chy + dy.g AS chy, c.v
        FROM cells c
        CROSS JOIN generate_series(-1, 1) dx(g)
        CROSS JOIN generate_series(-1, 1) dy(g))
      SELECT chx, chy,
        ROUND(${dsumSql("v")} / COUNT(v), 6) AS box_mean,
        ROUND(SQRT(GREATEST(0.0, (CAST(SUM(CAST((v * v) AS DECIMAL(32,14))) AS DOUBLE) - ${dsumSql("v")} * ${dsumSql("v")} / COUNT(v)) / COUNT(v))), 6) AS box_std,
        COUNT(v) AS box_n
      FROM scattered GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** W5: distributed separable NaN-aware Gaussian smoothing over the same
    * sparse cell grid as w4 — Grid.gaussianSmoothCells (scatter + semi-join
    * per axis), previously spec-only. The tap weights are Scala double
    * literals embedded verbatim in the mirror, and every accumulation is
    * decimal, so the hash gate sees bit-identical values.
    */
  val w5Gauss: QueryDef = {
    val sigma = 0.5
    val radius = math.max(1, math.ceil(3 * sigma).toInt)
    val taps = (-radius to radius).map(d =>
      d -> math.exp(-0.5 * math.pow(d / sigma, 2)))
    val tapValues = taps.map { case (d, w) => s"($d, $w)" }.mkString(", ")
    def passSql(src: String, onX: Boolean): String = {
      val (tx, ty) = if (onX) ("s.chx + t.d", "s.chy") else ("s.chx", "s.chy + t.d")
      s"""SELECT chx, chy, v FROM (
           SELECT $tx AS chx, $ty AS chy,
             CAST(SUM(CAST(s.v * t.w AS DECIMAL(32,14))) AS DOUBLE)
             / CAST(SUM(CAST(t.w AS DECIMAL(22,16))) AS DOUBLE) AS v,
             MAX(CASE WHEN t.d = 0 THEN 1 ELSE 0 END) AS orig
           FROM $src s CROSS JOIN taps t GROUP BY 1, 2)
           WHERE orig = 1"""
    }
    QueryDef(
      "w5_gauss_smooth",
      (s, dir) => {
        val cells = t(s, dir, "events")
          .groupBy(($"user_id" % 16).cast("int").as("chx"),
                   ($"event_id" % 7).cast("int").as("chy"))
          .agg(dsum6($"value").as("v"))
        graft.qpe.Grid.gaussianSmoothCells(cells, sigma)
          .select($"chx", $"chy", r6($"v").as("smoothed"))
          .orderBy($"chx", $"chy")
      },
      Some(s"""WITH cells AS (
          SELECT * FROM (
            SELECT CAST(user_id % 16 AS INT) AS chx, CAST(event_id % 7 AS INT) AS chy,
                   ${dsum6Sql("value")} AS v
            FROM events GROUP BY 1, 2)
          -- mirror of gaussianSmoothCells' NULL/NaN-cell pre-filter: an
          -- invalid cell must not scatter tap weight into neighbours
          WHERE v IS NOT NULL AND NOT isnan(v)),
        taps(d, w) AS (VALUES $tapValues),
        p1 AS (${passSql("cells", onX = true)}),
        p2 AS (${passSql("p1", onX = false)})
        SELECT chx, chy, ROUND(v, 6) AS smoothed FROM p2 ORDER BY chx, chy"""))
  }

  /** A9: weighted accumulation across sweeps — Agg.weightedAccumulate over
    * three event-id-split parts (exercising the union path; the union of
    * the parts is exactly the events table, which is what the mirror
    * reads), previously spec-only. Weights are a deterministic per-row
    * harmonic bucket; sums are decimal-exact end to end.
    */
  val a9Weighted: QueryDef = QueryDef(
    "a9_weighted_accumulate",
    (s, dir) => {
      val ev = t(s, dir, "events").select(
        ($"user_id" % 16).cast("int").as("cx"),
        ($"value" / 1000.0).as("v"),
        (lit(1.0) / (lit(1L) + $"event_id" % 5)).as("w"),
        ($"event_id" % 3).as("sweep"))
      val parts = (0 until 3).map(i => ev.filter($"sweep" === i).drop("sweep"))
      // estimate emitted UNROUNDED: it divides two 6-dp-decimal sums that
      // are bit-identical doubles on both engines, so the raw ratio is
      // already deterministic — while a final ROUND would sit on exact
      // half boundaries whenever the ratio terminates (sum_w is often an
      // integer), where Spark (shortest-repr HALF_UP) and DuckDB (binary
      // value) legitimately disagree
      graft.operators.Agg.weightedAccumulate(parts, Seq("cx"), "v", "w")
        .select($"cx", $"sum_vw", $"sum_w", $"estimate")
        .orderBy($"cx")
    },
    Some("""WITH src AS (
        SELECT * FROM (
          SELECT CAST(user_id % 16 AS INT) AS cx, value / 1000.0 AS v,
                 CAST(1.0 AS DOUBLE) / (1 + event_id % 5) AS w
          FROM events)
        -- mirror of weightedAccumulate's valid-contribution filter
        WHERE v IS NOT NULL AND NOT isnan(v) AND w IS NOT NULL AND NOT isnan(w))
      -- sums round in DECIMAL space before the double cast (dsum6 rule):
      -- the raw scale-14 sum's unscaled value passes 2^53 and DuckDB's
      -- decimal->double cast double-rounds there
      SELECT cx,
        CAST(ROUND(SUM(CAST(v * w AS DECIMAL(32,14))), 6) AS DOUBLE) AS sum_vw,
        CAST(ROUND(SUM(CAST(w AS DECIMAL(32,14))), 6) AS DOUBLE) AS sum_w,
        CAST(ROUND(SUM(CAST(v * w AS DECIMAL(32,14))), 6) AS DOUBLE)
          / CAST(ROUND(SUM(CAST(w AS DECIMAL(32,14))), 6) AS DOUBLE) AS estimate
      FROM src GROUP BY cx ORDER BY cx"""))

  /** J5/J6/J9: the polar→Cartesian LUT broadcast join + grid gather,
    * previously spec-only. The LUT here is integer-derived (the trig
    * geometry is separately oracle-gated via f15_*; what J5/J6/J9 add is
    * the JOIN mechanics: broadcast the coefficient-sized LUT, inner-join
    * membership — gates outside the partial LUT drop, the J9 COSMO
    * membership shape — then one keyed accumulation into cells). Mirror
    * builds the identical LUT from generate_series; all sums decimal.
    */
  val j5LutGather: QueryDef = QueryDef(
    "j5_lut_gather",
    (s, dir) => {
      // LUT: id → (sweep, az_idx, rng_idx) with rng_idx < 80 only (partial
      // coverage: membership filter), cell + weight from integer arithmetic
      val lut = s.range(3L * 360 * 100).selectExpr(
        "CAST(id % 3 AS INT) AS sweep",
        "CAST((id DIV 3) % 360 AS INT) AS az_idx",
        "CAST(id DIV 1080 AS INT) AS rng_idx")
        .filter($"rng_idx" < 80)
        .selectExpr("sweep", "az_idx", "rng_idx",
          "(az_idx * 7 + rng_idx * 3 + sweep * 11) % 64 AS chx",
          "(az_idx * 5 + rng_idx * 13 + sweep * 3) % 48 AS chy",
          "CAST(1.0 AS DOUBLE) / (1 + sweep) AS w")
      val polar = t(s, dir, "events").selectExpr(
        "CAST(event_id % 3 AS INT) AS sweep",
        "CAST(user_id % 360 AS INT) AS az_idx",
        "CAST((event_id DIV 3) % 100 AS INT) AS rng_idx",
        "value / 100.0 AS v")
      // value emitted UNROUNDED (the a9 rationale: bit-identical 6-dp
      // operands make the raw ratio deterministic; a final ROUND sits on
      // exact half boundaries whenever the ratio terminates)
      graft.qpe.Grid.accumulate(
          graft.qpe.Grid.lutJoin(polar, lut).select($"chx", $"chy", $"v", $"w"))
        .select($"chx", $"chy", $"value")
        .orderBy($"chx", $"chy")
    },
    Some("""WITH lut AS (
        SELECT sweep, az_idx, rng_idx,
               (az_idx * 7 + rng_idx * 3 + sweep * 11) % 64 AS chx,
               (az_idx * 5 + rng_idx * 13 + sweep * 3) % 48 AS chy,
               CAST(1.0 AS DOUBLE) / (1 + sweep) AS w
        FROM (SELECT CAST(g.generate_series % 3 AS INT) AS sweep,
                     CAST((g.generate_series // 3) % 360 AS INT) AS az_idx,
                     CAST(g.generate_series // 1080 AS INT) AS rng_idx
              FROM generate_series(0, 107999) g)
        WHERE rng_idx < 80),
      polar AS (
        SELECT * FROM (
          SELECT CAST(event_id % 3 AS INT) AS sweep,
                 CAST(user_id % 360 AS INT) AS az_idx,
                 CAST((event_id // 3) % 100 AS INT) AS rng_idx,
                 value / 100.0 AS v
          FROM events)
        -- mirror of Grid.accumulate's valid-contribution filter (w is a
        -- LUT constant, never NULL/NaN)
        WHERE v IS NOT NULL AND NOT isnan(v))
      SELECT chx, chy,
        CAST(ROUND(SUM(CAST(v * w AS DECIMAL(32,14))), 6) AS DOUBLE)
          / CAST(ROUND(SUM(CAST(w AS DECIMAL(32,14))), 6) AS DOUBLE) AS value
      FROM polar JOIN lut USING (sweep, az_idx, rng_idx)
      GROUP BY chx, chy ORDER BY chx, chy"""))

  /** M11: the reference's prepare_input feature pipeline composed END TO END
    * from library operators — dedupKeepFirst → naReplace → threeWaySemi →
    * fullPeriodFilter → dB→linear → weightedMean + weightedProportions —
    * previously proven only on fixtures (PrepareInputSpec). Every stage is
    * individually oracle-gated elsewhere; this gates the COMPOSITION (the
    * part the reference does in pandas and we keep as one Spark plan).
    * Deterministic sentinel injection (event_id % 11) exercises the
    * null-feature discipline: a null zh contributes neither value nor
    * weight to the vertical aggregation.
    */
  val m11Prepare: QueryDef = QueryDef(
    "m11_prepare_input",
    (s, dir) => {
      import graft.operators.{Agg, Relational}
      val radar = t(s, dir, "events").selectExpr(
        "event_id",
        "CAST(user_id % 50 AS INT) AS station",
        "ts",
        "CAST(event_id % 2 AS INT) AS sweep",
        "CASE WHEN event_id % 11 = 0 THEN -9999.0 ELSE value / 10.0 END AS zh",
        "500.0 * (1 + event_id % 2) AS height",
        "CAST(40 + user_id % 60 AS DOUBLE) AS visib")
        .withColumn("hts", Phys.floorToCadence(epochS($"ts"), 3600L))
      val dedup = Relational.dedupKeepFirst(radar,
        Seq("station", "hts", "sweep"), "event_id")
      val clean = Relational.naReplace(dedup, -9999.0, Seq("zh"))
      val keys = Seq("station", "hts")
      val gauge = radar.filter($"event_id" % 3 === 0).select(keys.map(col): _*)
      val ref = radar.filter($"event_id" % 4 === 0).select(keys.map(col): _*)
      val joined = Relational.threeWaySemi(clean, gauge, ref, keys)
      val full = Relational.fullPeriodFilter(joined, "station", "ts", 2L)
      val feat = full
        .withColumn("zh_lin", Phys.dbToLin($"zh"))
        .withColumn("w", $"visib" / 100.0 * pow(lit(10.0), -$"height" / 2000.0))
        .withColumn("sweepc", $"sweep".cast("string"))
      Agg.weightedMean(feat, keys, $"w", Seq("zh_lin"))
        .join(Agg.weightedProportions(feat, keys, $"w", "sweepc", Seq("0", "1"))
                .withColumnRenamed("sweepc_prop_0", "prop_lo")
                .withColumnRenamed("sweepc_prop_1", "prop_hi"),
              keys)
        .select($"station", $"hts", r6($"zh_lin").as("zh_lin"),
                r6($"prop_lo").as("prop_lo"), r6($"prop_hi").as("prop_hi"))
        .orderBy($"station", $"hts")
    },
    Some(s"""WITH radar AS (
        SELECT event_id, CAST(user_id % 50 AS INT) AS station,
               (${epochSql("ts")} - ${epochSql("ts")} % 3600) AS hts,
               ${epochSql("ts")} AS ets,
               CAST(event_id % 2 AS INT) AS sweep,
               CASE WHEN event_id % 11 = 0 THEN -9999.0 ELSE value / 10.0 END AS zh,
               500.0 * (1 + event_id % 2) AS height,
               CAST(40 + user_id % 60 AS DOUBLE) AS visib
        FROM events),
      dedup AS (
        SELECT * FROM (SELECT *, ROW_NUMBER() OVER
            (PARTITION BY station, hts, sweep ORDER BY event_id) AS rn FROM radar)
        WHERE rn = 1),
      clean AS (SELECT station, hts, ets, sweep,
               CASE WHEN zh = -9999.0 THEN NULL ELSE zh END AS zh, height, visib
        FROM dedup),
      gauge AS (SELECT DISTINCT station, hts FROM radar WHERE event_id % 3 = 0),
      ref AS (SELECT DISTINCT station, hts FROM radar WHERE event_id % 4 = 0),
      joined AS (
        SELECT c.* FROM clean c
        SEMI JOIN gauge g USING (station, hts)
        SEMI JOIN ref r USING (station, hts)),
      fullh AS (
        SELECT * FROM (SELECT *, COUNT(*) OVER
            (PARTITION BY station, ets - ets % 3600) AS pc FROM joined)
        WHERE pc = 2),
      feat AS (
        SELECT station, hts, sweep, POW(10.0, zh * 0.1) AS zh_lin,
               visib / 100.0 * POW(10.0, -height / 2000.0) AS w
        FROM fullh)
      SELECT station, hts,
        ROUND(CAST(SUM(CAST(CASE WHEN zh_lin IS NOT NULL AND NOT isnan(zh_lin) THEN zh_lin * w END
                  AS DECIMAL(32,14))) AS DOUBLE)
              / CAST(SUM(CAST(CASE WHEN zh_lin IS NOT NULL AND NOT isnan(zh_lin) THEN w END
                  AS DECIMAL(32,14))) AS DOUBLE), 6) AS zh_lin,
        ROUND(COALESCE(CAST(SUM(CAST(CASE WHEN sweep = 0 AND NOT isnan(w) THEN w END
                  AS DECIMAL(32,14))) AS DOUBLE), 0.0)
              / (COALESCE(CAST(SUM(CAST(CASE WHEN sweep = 0 AND NOT isnan(w) THEN w END
                  AS DECIMAL(32,14))) AS DOUBLE), 0.0)
                 + COALESCE(CAST(SUM(CAST(CASE WHEN sweep = 1 AND NOT isnan(w) THEN w END
                  AS DECIMAL(32,14))) AS DOUBLE), 0.0)), 6) AS prop_lo,
        ROUND(COALESCE(CAST(SUM(CAST(CASE WHEN sweep = 1 AND NOT isnan(w) THEN w END
                  AS DECIMAL(32,14))) AS DOUBLE), 0.0)
              / (COALESCE(CAST(SUM(CAST(CASE WHEN sweep = 0 AND NOT isnan(w) THEN w END
                  AS DECIMAL(32,14))) AS DOUBLE), 0.0)
                 + COALESCE(CAST(SUM(CAST(CASE WHEN sweep = 1 AND NOT isnan(w) THEN w END
                  AS DECIMAL(32,14))) AS DOUBLE), 0.0)), 6) AS prop_hi
      FROM feat GROUP BY station, hts ORDER BY station, hts"""))

  val all: Seq[QueryDef] = Seq(
    j4HourlyJoin, a11First, o6Intersect, f9Derived, s8DnDecode, w2Count,
    w4BoxStats, w5Gauss, a9Weighted, j5LutGather, m11Prepare)

  import org.apache.spark.sql.ColumnName
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
