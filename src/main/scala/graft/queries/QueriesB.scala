package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Core
import graft.functions.Phys
import graft.ml.{BiasCorrection, Scores}
import graft.operators.{AsOf, Windows}

/** Batch 2: window functions, as-of / interpolation joins, scalar-function
  * and ML-evaluation operators (SURVEY.md §2.5–§2.9). Same determinism
  * discipline as [[Queries]].
  */
object QueriesB {
  import Ora._
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)


  /** O1/O2: multi-key sort + limit (display-n). */
  val o1Sort: QueryDef = QueryDef(
    "o1_multikey_sort",
    (s, dir) => t(s, dir, "lineitem")
      // (orderkey, linenumber) is NOT unique in the synthetic data; adding
      // l_quantity makes ties carry identical output projections
      .orderBy($"l_returnflag", $"l_shipdate".desc, $"l_orderkey", $"l_linenumber", $"l_quantity")
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber", $"l_quantity")
      .limit(100),
    Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity
      FROM lineitem
      ORDER BY l_returnflag, l_shipdate DESC, l_orderkey, l_linenumber, l_quantity
      LIMIT 100"""))

  /** W3/A8: contiguous dense group ids — scale-safe construction: the global
    * sort only touches the distinct key set, broadcast-joined back (the naive
    * whole-table dense_rank survives only package-private as the reference
    * semantics the spec compares against). Oracle-identical output.
    */
  val w3DenseRank: QueryDef = QueryDef(
    "w3_dense_rank",
    (s, dir) => Windows.denseGroupIdScalable(
        t(s, dir, "events").select($"event_id", $"event_type"),
        Seq("event_type"))
      .select($"event_id", $"event_type", $"group_id")
      .orderBy($"event_id"),
    Some("""SELECT event_id, event_type,
      CAST(DENSE_RANK() OVER (ORDER BY event_type) AS INT) - 1 AS group_id
      FROM events ORDER BY event_id"""))

  /** W6: rolling least-squares slope over ±3 rows per key (KDP-fit shape),
    * with decimal-exact window sums.
    */
  val w6Slope: QueryDef = QueryDef(
    "w6_rolling_slope",
    (s, dir) => {
      val byU = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val base = t(s, dir, "events")
        .select($"user_id", $"ts", $"event_id", $"value")
        .withColumn("x", row_number().over(byU))
      val w = Window.partitionBy($"user_id").orderBy($"x").rowsBetween(-3, 3)
      def ws(c: Column) = sum(c.cast("decimal(27,10)")).over(w).cast("double")
      val n = count(lit(1)).over(w)
      val sx = ws($"x".cast("double"))
      val sy = ws($"value")
      val sxy = ws($"x" * $"value")
      val sxx = ws($"x".cast("double") * $"x")
      base.withColumn("slope",
          when(n > 1, r6((n * sxy - sx * sy) / (n * sxx - sx * sx))))
        .select($"user_id", $"x", $"slope")
        // output bound (partition-aligned, so the window math is untouched
        // for surviving keys): keeps the checker's cumulative result-set
        // footprint small — 10k-row dumps were the DuckDB-OOM-flake class
        .filter($"user_id" < 40)
        .orderBy($"user_id", $"x")
    },
    Some(s"""WITH b AS (
        SELECT user_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
        FROM events),
      w AS (SELECT user_id, x,
        COUNT(*) OVER fr AS n,
        CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(27,10))) OVER fr AS DOUBLE) AS sx,
        CAST(SUM(CAST(value AS DECIMAL(27,10))) OVER fr AS DOUBLE) AS sy,
        CAST(SUM(CAST((x * value) AS DECIMAL(27,10))) OVER fr AS DOUBLE) AS sxy,
        CAST(SUM(CAST((CAST(x AS DOUBLE) * x) AS DECIMAL(27,10))) OVER fr AS DOUBLE) AS sxx
        FROM b
        WINDOW fr AS (PARTITION BY user_id ORDER BY x ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
      SELECT user_id, x,
             CASE WHEN n > 1
                  THEN ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END AS slope
      FROM w WHERE user_id < 40 ORDER BY user_id, x"""))

  /** W7/A13: lag state + null-aware pair mean (temporal smoothing). */
  val w7Lag: QueryDef = QueryDef(
    "w7_lag_pair_mean",
    (s, dir) => {
      val byU = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .select($"event_id", $"user_id", $"ts", $"value")
        .withColumn("prev", lag($"value", 1).over(byU))
        .withColumn("delta", r6($"value" - $"prev"))
        .withColumn("smoothed", r6(graft.operators.Agg.pairMean($"value", $"prev")))
        .select($"event_id", $"user_id", $"delta", $"smoothed")
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id,
      ROUND(value - prev, 6) AS delta,
      ROUND(CASE WHEN value IS NULL THEN prev
                 WHEN prev IS NULL THEN value
                 ELSE (value + prev) / 2.0 END, 6) AS smoothed
      FROM (SELECT event_id, user_id, value,
                   LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events)
      ORDER BY event_id"""))

  /** J7: as-of join — most recent purchase value at-or-before each click,
    * via the union+sort technique (one shuffle; see AsOf.asofJoin).
    */
  val j7Asof: QueryDef = QueryDef(
    "j7_asof_join",
    (s, dir) => {
      val e = t(s, dir, "events")
      val clicks = e.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value")
      AsOf.asofJoin(clicks, purchases, "user_id", "ts", Seq("value"))
        .select($"event_id", $"user_id", $"value".as("purchase_value"))
        .orderBy($"event_id")
    },
    Some("""WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      p AS (SELECT user_id, ts, MAX(value) AS value FROM events
        WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT c.event_id, c.user_id, p.value AS purchase_value
      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
      ORDER BY c.event_id"""))

  /** J8: temporal interpolation join — hourly anchor values linearly
    * interpolated to each point's timestamp.
    */
  val j8Interp: QueryDef = QueryDef(
    "j8_interp_join",
    (s, dir) => {
      val e = t(s, dir, "events")
      val hourly = e
        .groupBy($"user_id",
          Phys.floorToCadence(epochS($"ts"), 3600L).as("hour_e"))
        .agg(dsum($"value").as("hv"))
      val points = e.filter($"event_type" === "view")
        .select($"event_id", $"user_id", $"ts")
      AsOf.interpolateJoin(points, hourly, "user_id", "ts", "hour_e", "hv")
        .select($"event_id", $"user_id", r6($"hv_interp").as("hv_interp"))
        .orderBy($"event_id")
    },
    Some(s"""WITH hourly AS (
        SELECT user_id, (${epochSql("ts")} - ${epochSql("ts")} % 3600) AS hour_e,
               ${dsumSql("value")} AS hv
        FROM events GROUP BY 1, 2),
      pts AS (SELECT event_id, user_id, ${epochSql("ts")} AS e
              FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id,
        ROUND(CASE WHEN h0.hv IS NOT NULL AND h1.hv IS NOT NULL
                   THEN h0.hv * (1.0 - (p.e - (p.e - p.e % 3600)) / 3600.0)
                        + h1.hv * ((p.e - (p.e - p.e % 3600)) / 3600.0)
                   ELSE COALESCE(h0.hv, h1.hv) END, 6) AS hv_interp
      FROM pts p
      LEFT JOIN hourly h0 ON p.user_id = h0.user_id AND h0.hour_e = p.e - p.e % 3600
      LEFT JOIN hourly h1 ON p.user_id = h1.user_id AND h1.hour_e = p.e - p.e % 3600 + 3600
      ORDER BY p.event_id"""))

  /** O4/S13: searchsorted DN-encode against a sorted boundary scale. */
  val o4SearchSorted: QueryDef = QueryDef(
    "o4_searchsorted",
    (s, dir) => t(s, dir, "events")
      .withColumn("dn", Phys.searchSorted($"value", Seq(10.0, 25.0, 50.0, 100.0, 150.0)))
      .groupBy($"dn")
      .agg(count(lit(1)).as("n"), dsum6($"value").as("sum_value"))
      .orderBy($"dn"),
    Some(s"""SELECT (CASE WHEN value >= 10.0 THEN 1 ELSE 0 END
        + CASE WHEN value >= 25.0 THEN 1 ELSE 0 END
        + CASE WHEN value >= 50.0 THEN 1 ELSE 0 END
        + CASE WHEN value >= 100.0 THEN 1 ELSE 0 END
        + CASE WHEN value >= 150.0 THEN 1 ELSE 0 END) AS dn,
      COUNT(*) AS n, ${dsum6Sql("value")} AS sum_value
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** F7: Kochendorfer catch-efficiency wind adjustment (regime-split CE).
    * The compared aggregate is the per-group MEAN, not the sum: EXP differs
    * between the JVM and libm by 1 ULP on some inputs, and under a SUM those
    * per-row discrepancies ACCUMULATE linearly with row count (measured
    * 2e-6 on the exact decimal sum at sf0.1 — past any rounding). Under a
    * mean they shrink with the divisor, so the comparison is scale-stable.
    */
  val f7CatchEff: QueryDef = QueryDef(
    "f7_catch_efficiency",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val temp = $"l_discount" * 100.0 - 5.0
      val wind = $"l_quantity" / 5.0
      val adj = Phys.windAdjustedPrecip($"l_extendedprice", temp, wind)
      li.groupBy($"l_returnflag")
        .agg(r6(dsum(adj) / count(lit(1))).as("mean_adj"),
             count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },
    Some(s"""SELECT l_returnflag,
      ROUND(${dsumSql("""l_extendedprice / (CASE
        WHEN (l_discount * 100.0 - 5.0) < -2.0
          THEN 0.865 * EXP(-0.298 * LEAST(l_quantity / 5.0, 9.0)) + 0.225
        WHEN (l_discount * 100.0 - 5.0) <= 2.0
          THEN 0.624 * EXP(-0.185 * LEAST(l_quantity / 5.0, 9.0)) + 0.364
        ELSE 1.0 END)""")} / COUNT(*), 6) AS mean_adj,
      COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** F13: regex field extraction from a string payload. */
  val f13Regexp: QueryDef = QueryDef(
    "f13_regexp_extract",
    (s, dir) => t(s, dir, "events")
      .withColumn("k", regexp_extract($"props", "([0-9]+)", 1).cast("int"))
      .groupBy(($"k" % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"))
      .orderBy($"k_mod"),
    Some("""SELECT CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) % 10 AS k_mod,
      COUNT(*) AS n,
      CAST(SUM(CAST(regexp_extract(props, '([0-9]+)', 1) AS INT)) AS BIGINT) AS sum_k
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** F15/F17: WGS84→CH1903 polynomial transform + planar distance. */
  val f15Ch1903: QueryDef = QueryDef(
    "f15_ch1903_dist",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val lon = lit(6.0) + ($"c_custkey" % 100) / 50.0
      val lat = lit(46.0) + ($"c_custkey" % 50) / 50.0
      val (east, north) = Phys.wgs84ToCh1903(lon, lat)
      c.select($"c_custkey",
          round(east, 4).as("east"),
          round(north, 4).as("north"),
          r6(Phys.distKm(east, north, 600000.0, 200000.0)).as("dist_km"))
        .orderBy($"c_custkey")
    },
    Some("""WITH g AS (SELECT c_custkey,
        ((46.0 + (c_custkey % 50) / 50.0) * 3600.0 - 169028.66) / 10000.0 AS phi,
        ((6.0 + (c_custkey % 100) / 50.0) * 3600.0 - 26782.5) / 10000.0 AS lam
        FROM customer),
      xy AS (SELECT c_custkey,
        600072.37 + 211455.93 * lam - 10938.51 * lam * phi
          - 0.36 * lam * phi * phi - 44.54 * lam * lam * lam AS east,
        200147.07 + 308807.95 * phi + 3745.25 * lam * lam
          + 76.63 * phi * phi - 194.56 * lam * lam * phi
          + 119.79 * phi * phi * phi AS north
        FROM g)
      SELECT c_custkey, ROUND(east, 4) AS east, ROUND(north, 4) AS north,
        ROUND(SQRT(POW(east - 600000.0, 2.0) + POW(north - 200000.0, 2.0)) / 1000.0, 6) AS dist_km
      FROM xy ORDER BY c_custkey"""))

  /** F15 rest: CH1903→WGS84 inverse polynomial + COSMO rotated-pole
    * transform and its exact inverse (pollat=43, pollon=−170, the
    * MeteoSwiss COSMO-1 rotation). Every trig constant is pre-folded in
    * Scala and interpolated into the SQL so both engines evaluate the
    * identical expression tree; `+ 0.0` after ROUND normalizes the sign of
    * zero (rlat crosses 0 inside the Swiss domain).
    */
  val f15Inverse: QueryDef = {
    val sp = math.sin(math.toRadians(43.0))
    val cp = math.cos(math.toRadians(43.0))
    QueryDef(
      "f15_inverse_rotated",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val lon = lit(6.0) + ($"c_custkey" % 100) / 50.0
        val lat = lit(46.0) + ($"c_custkey" % 50) / 50.0
        val (east, north) = Phys.wgs84ToCh1903(lon, lat)
        val (lon2, lat2) = Phys.ch1903ToWgs84(east, north)
        val (rlon, rlat) = Phys.geoToRotatedPole(lon, lat, 43.0, -170.0)
        val (lonRt, latRt) = Phys.rotatedPoleToGeo(rlon, rlat, 43.0, -170.0)
        c.select($"c_custkey",
            (r6(lon2) + 0.0).as("lon2"), (r6(lat2) + 0.0).as("lat2"),
            (r6(rlon) + 0.0).as("rlon"), (r6(rlat) + 0.0).as("rlat"),
            (r6(lonRt) + 0.0).as("lon_rt"), (r6(latRt) + 0.0).as("lat_rt"))
          .orderBy($"c_custkey")
      },
      Some(s"""WITH g AS (SELECT c_custkey,
          6.0 + (c_custkey % 100) / 50.0 AS lon,
          46.0 + (c_custkey % 50) / 50.0 AS lat
        FROM customer),
      aux AS (SELECT *, (lat * 3600.0 - 169028.66) / 10000.0 AS phi,
          (lon * 3600.0 - 26782.5) / 10000.0 AS lam FROM g),
      ch AS (SELECT *,
          600072.37 + 211455.93 * lam - 10938.51 * lam * phi
            - 0.36 * lam * phi * phi - 44.54 * lam * lam * lam AS east,
          200147.07 + 308807.95 * phi + 3745.25 * lam * lam
            + 76.63 * phi * phi - 194.56 * lam * lam * phi
            + 119.79 * phi * phi * phi AS north
        FROM aux),
      inv AS (SELECT *, (east - 600000.0) / 1000000.0 AS yy,
          (north - 200000.0) / 1000000.0 AS xx FROM ch),
      wgs AS (SELECT *,
          (2.6779094 + 4.728982 * yy + 0.791484 * yy * xx
            + 0.1306 * yy * xx * xx - 0.0436 * yy * yy * yy) * 10000.0 / 3600.0 AS lon2,
          (16.9023892 + 3.238272 * xx - 0.270978 * yy * yy
            - 0.002528 * xx * xx - 0.0447 * yy * yy * xx
            - 0.0140 * xx * xx * xx) * 10000.0 / 3600.0 AS lat2
        FROM inv),
      rr AS (SELECT *, RADIANS(lon - -170.0) AS rl, RADIANS(lat) AS rp FROM wgs),
      rot AS (SELECT *,
          DEGREES(ATAN2(-COS(rp) * SIN(rl),
            -($sp * COS(rp) * COS(rl) - $cp * SIN(rp)))) AS rlon,
          DEGREES(ASIN($cp * COS(rp) * COS(rl) + $sp * SIN(rp))) AS rlat
        FROM rr),
      bk AS (SELECT *, RADIANS(rlat) AS brp, RADIANS(rlon) AS brl FROM rot),
      back AS (SELECT *,
          ((-170.0 + DEGREES(ATAN2(-COS(brp) * SIN(brl),
            $sp * (-COS(brp) * COS(brl)) + $cp * SIN(brp)))
            + 180.0) % 360.0 + 360.0) % 360.0 - 180.0 AS lon_rt,
          DEGREES(ASIN(-($cp) * (-COS(brp) * COS(brl)) + $sp * SIN(brp))) AS lat_rt
        FROM bk)
      SELECT c_custkey,
        ROUND(lon2, 6) + 0.0 AS lon2, ROUND(lat2, 6) + 0.0 AS lat2,
        ROUND(rlon, 6) + 0.0 AS rlon, ROUND(rlat, 6) + 0.0 AS rlat,
        ROUND(lon_rt, 6) + 0.0 AS lon_rt, ROUND(lat_rt, 6) + 0.0 AS lat_rt
      FROM back ORDER BY c_custkey"""))
  }

  /** F16/F1: Z-R proxy rain-rate inversion over dB-domain input. */
  val f16Zr: QueryDef = QueryDef(
    "f16_zr_proxy",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(dsum6(Phys.zrProxy(Phys.dbToLin($"l_quantity"))).as("sum_rproxy"),
           count(lit(1)).as("n"))
      .orderBy($"l_returnflag"),
    Some(s"""SELECT l_returnflag,
      ${dsum6Sql("POW(POW(10.0, l_quantity * 0.1) / 316.0, 1.0 / 1.5)")} AS sum_rproxy,
      COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** S6: manifest-pruned scan — day manifest filtered by range + pattern,
    * then a semi-join restricts the fact scan to surviving days.
    */
  val s6Manifest: QueryDef = QueryDef(
    "s6_manifest_prune",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val manifest = o.select($"o_orderdate").distinct()
        .filter($"o_orderdate".between(lit("1996-01-01").cast("timestamp"),
                                       lit("1996-12-31").cast("timestamp")))
        .filter(dayofmonth($"o_orderdate") <= 7)
      o.join(manifest, Seq("o_orderdate"), "left_semi")
        .groupBy(month($"o_orderdate").as("m"))
        .agg(count(lit(1)).as("n"), dsum6($"o_totalprice").as("sum_price"))
        .orderBy($"m")
    },
    Some(s"""WITH manifest AS (
        SELECT DISTINCT o_orderdate FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
          AND EXTRACT(day FROM o_orderdate) <= 7)
      SELECT CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
        COUNT(*) AS n, ${dsum6Sql("o_totalprice")} AS sum_price
      FROM orders WHERE o_orderdate IN (SELECT o_orderdate FROM manifest)
      GROUP BY 1 ORDER BY 1"""))

  /** M2: bias-correction 'cdf' quantile mapping — zero-intercept slope on
    * independently sorted (pred, obs).
    */
  val m2BiasCdf: QueryDef = QueryDef(
    "m2_bias_cdf",
    (s, dir) => BiasCorrection.cdfSlope(
        t(s, dir, "lineitem").filter($"l_returnflag" === "A")
          .withColumn("pred", $"l_extendedprice" / 1000.0)
          .withColumn("obs", $"l_quantity"),
        "pred", "obs")
      .select(r6($"slope").as("slope")),
    Some("""WITH src AS (SELECT l_extendedprice / 1000.0 AS pred, l_quantity AS obs
               FROM lineitem WHERE l_returnflag = 'A'),
      p AS (SELECT pred, ROW_NUMBER() OVER (ORDER BY pred) AS rn FROM src),
      o AS (SELECT obs, ROW_NUMBER() OVER (ORDER BY obs) AS rn FROM src)
      SELECT ROUND(
        CAST(SUM(CAST((p.pred * o.obs) AS DECIMAL(30,8))) AS DOUBLE) /
        CAST(SUM(CAST((p.pred * p.pred) AS DECIMAL(30,8))) AS DOUBLE), 6) AS slope
      FROM p JOIN o ON p.rn = o.rn"""))

  /** M5: CV fold assignment from sessionized events. */
  val m5Folds: QueryDef = QueryDef(
    "m5_fold_assign",
    (s, dir) => Windows.sessionize(t(s, dir, "events"), "user_id", "ts", 1800L)
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n"))
      .groupBy(($"session_id" % 5).as("fold"))
      .agg(count(lit(1)).as("n_sessions"), sum($"n").as("n_events"))
      .orderBy($"fold"),
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
            FROM s),
      sess AS (SELECT user_id, session_id, COUNT(*) AS n FROM t GROUP BY 1, 2)
      SELECT session_id % 5 AS fold, COUNT(*) AS n_sessions,
             CAST(SUM(n) AS BIGINT) AS n_events
      FROM sess GROUP BY 1 ORDER BY 1"""))

  /** M6: perfscores — N, logBias, conditional RMSE, weighted-quantile
    * scatter per group.
    */
  val m6Perfscores: QueryDef = QueryDef(
    "m6_perfscores",
    (s, dir) => Scores.perfscores(
        t(s, dir, "lineitem")
          .select($"l_returnflag".as("g"),
                  ($"l_extendedprice" / 10000.0).as("est"),
                  ($"l_quantity" / 10.0).as("ref")),
        "g", "est", "ref")
      .orderBy($"g"),
    Some(s"""WITH v AS (SELECT l_returnflag AS g, l_extendedprice / 10000.0 AS est,
               l_quantity / 10.0 AS ref FROM lineitem),
      base AS (SELECT g, COUNT(*) AS n,
        ROUND(LOG10(${dsumSql("est")} / ${dsumSql("ref")}) * 10.0, 6) AS logbias_db,
        ROUND(SQRT(${dsumSql("CASE WHEN est > 0.1 AND ref > 0.1 THEN (est - ref) * (est - ref) END")} /
          COUNT(CASE WHEN est > 0.1 AND ref > 0.1 THEN 1 END)), 6) AS rmse_cond
        FROM v GROUP BY g),
      cond AS (SELECT g, LOG10(est / ref) * 10.0 AS ratio_db, ref AS w
               FROM v WHERE est > 0.1 AND ref > 0.1),
      cum AS (SELECT g, ratio_db,
        CAST(SUM(CAST(w AS DECIMAL(27,10))) OVER (PARTITION BY g ORDER BY ratio_db
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cumw,
        CAST(SUM(CAST(w AS DECIMAL(27,10))) OVER (PARTITION BY g) AS DOUBLE) AS totw
        FROM cond),
      q AS (SELECT g,
        MIN(CASE WHEN cumw >= totw * 0.16 THEN ratio_db END) AS q16,
        MIN(CASE WHEN cumw >= totw * 0.84 THEN ratio_db END) AS q84
        FROM cum GROUP BY g)
      SELECT base.g, base.n, base.logbias_db, base.rmse_cond,
             ROUND((q.q84 - q.q16) / 2.0, 6) AS scatter_db
      FROM base LEFT JOIN q ON base.g = q.g ORDER BY base.g"""))

  /** M7: contingency table + POD/FAR/CSI at threshold events. */
  val m7Contingency: QueryDef = QueryDef(
    "m7_contingency",
    (s, dir) => Scores.contingency(
        t(s, dir, "lineitem"),
        "l_returnflag",
        $"l_quantity" > 25.0,
        $"l_extendedprice" > 40000.0)
      .orderBy($"l_returnflag"),
    Some("""SELECT l_returnflag,
      COUNT(CASE WHEN l_quantity > 25.0 AND l_extendedprice > 40000.0 THEN 1 END) AS hits,
      COUNT(CASE WHEN l_quantity > 25.0 AND NOT l_extendedprice > 40000.0 THEN 1 END) AS misses,
      COUNT(CASE WHEN NOT l_quantity > 25.0 AND l_extendedprice > 40000.0 THEN 1 END) AS false_alarms,
      COUNT(CASE WHEN NOT l_quantity > 25.0 AND NOT l_extendedprice > 40000.0 THEN 1 END) AS correct_negatives,
      ROUND(COUNT(CASE WHEN l_quantity > 25.0 AND l_extendedprice > 40000.0 THEN 1 END)
        / (COUNT(CASE WHEN l_quantity > 25.0 AND l_extendedprice > 40000.0 THEN 1 END)
           + COUNT(CASE WHEN l_quantity > 25.0 AND NOT l_extendedprice > 40000.0 THEN 1 END)), 6) AS pod,
      ROUND(COUNT(CASE WHEN NOT l_quantity > 25.0 AND l_extendedprice > 40000.0 THEN 1 END)
        / (COUNT(CASE WHEN l_quantity > 25.0 AND l_extendedprice > 40000.0 THEN 1 END)
           + COUNT(CASE WHEN NOT l_quantity > 25.0 AND l_extendedprice > 40000.0 THEN 1 END)), 6) AS far,
      ROUND(COUNT(CASE WHEN l_quantity > 25.0 AND l_extendedprice > 40000.0 THEN 1 END)
        / (COUNT(CASE WHEN l_quantity > 25.0 AND l_extendedprice > 40000.0 THEN 1 END)
           + COUNT(CASE WHEN l_quantity > 25.0 AND NOT l_extendedprice > 40000.0 THEN 1 END)
           + COUNT(CASE WHEN NOT l_quantity > 25.0 AND l_extendedprice > 40000.0 THEN 1 END)), 6) AS csi
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val all: Seq[QueryDef] = Seq(
    o1Sort, w3DenseRank, w6Slope, w7Lag, j7Asof, j8Interp, o4SearchSorted,
    f7CatchEff, f13Regexp, f15Ch1903, f15Inverse, f16Zr, s6Manifest,
    m2BiasCdf, m5Folds, m6Perfscores, m7Contingency)

  import org.apache.spark.sql.ColumnName
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
