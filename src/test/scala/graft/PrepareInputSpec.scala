package graft

import org.apache.spark.sql.functions._

import graft.operators.{Agg, Relational}

/** M11 / SURVEY §3.2: the reference's `prepare_input` + `fit_models` feature
  * pipeline composed end-to-end from library operators on domain-shaped
  * fixtures (FIXTURES.md schemas): dedup → −9999→null → finite-precip filter
  * → 3-way semi-join on (STATION, TIMESTAMP) → full-hour filter → derived
  * features → weighted vertical aggregation — all one Spark plan, no driver
  * round-trips (the reference drops to pandas here; we don't).
  */
class PrepareInputSpec extends SparkSpec {

  // 10-min cadence; TIMESTAMP labels the END of the interval
  private val h = 3600
  private def ts(i: Int) = 1699999200 + i * 600 // base divisible by 3600

  private def gauge = df("STATION STRING, TIMESTAMP INT, RRE150Z0 FLOAT", {
    // OTL: one full wet hour (6 steps) + one partial hour (2 steps)
    (1 to 6).map(i => R("OTL", ts(i), 0.5f)) ++
      (7 to 8).map(i => R("OTL", ts(i), 0.7f)) ++
      // GVE: full hour but missing from radar (semi-join must drop it)
      (1 to 6).map(i => R("GVE", ts(i), 0.3f))
  })

  private def radar = df(
    "STATION STRING, TIMESTAMP INT, RADAR STRING, SWEEP INT, ZH FLOAT, HEIGHT FLOAT, VISIB FLOAT", {
    val rows = for {
      i <- 1 to 8
      sweep <- Seq(1, 2)
      radar <- Seq("A", "D")
    } yield R("OTL", ts(i), radar, sweep, 30.0f + sweep, 1000.0f * sweep, 100.0f)
    // a duplicated row the dedup must collapse
    rows :+ R("OTL", ts(1), "A", 1, 30.0f + 1, 1000.0f, 100.0f)
  })

  private def reference = df("STATION STRING, TIMESTAMP INT, RZC FLOAT",
    (1 to 8).map(i => R("OTL", ts(i), -9999.0f)) ++
      (1 to 6).map(i => R("GVE", ts(i), 1.0f)))

  test("prepare_input pipeline: dedup → semi-join → full-hour → vert agg") {
    val keys = Seq("STATION", "TIMESTAMP")

    // P6: dedup on the radar composite key
    val radarDedup = radar.dropDuplicates(Seq("STATION", "TIMESTAMP", "RADAR", "SWEEP"))
    assert(radarDedup.count() == 8 * 2 * 2)

    // P4: sentinel → null, P10: finite precip
    val refClean = Relational.naReplace(reference, -9999.0, Seq("RZC"))
    val gaugeValid = gauge.filter(col("RRE150Z0").isNotNull)

    // J3: keep only (STATION, TIMESTAMP) present in all three tables
    val joined = Relational.threeWaySemi(radarDedup, gaugeValid, refClean, keys)
    assert(joined.select("STATION").distinct().collect().map(_.getString(0)).toSeq == Seq("OTL"))

    // A2: full hours only — 10-min stamps label interval END, so shift −600 s
    // before hour bucketing (SURVEY §7.4)
    val withHour = joined.withColumn("hour",
      (col("TIMESTAMP") - 600) - pmod(col("TIMESTAMP") - 600, lit(h)))
    val fullHours = graft.operators.Relational.fullPeriodFilter(
      withHour.withColumn("ts_t", timestamp_seconds(col("TIMESTAMP") - 600)),
      "STATION", "ts_t", 6 * 4) // 6 steps × 2 radars × 2 sweeps
    assert(fullHours.count() == 24)

    // F1 + A3: dB→linear, visibility/height weights, weighted vertical agg
    val withFeatures = fullHours
      .withColumn("zh_lin", graft.functions.Phys.dbToLin(col("ZH")))
      .withColumn("w", pow(lit(10.0), col("HEIGHT") / 1000.0 * -0.5) * col("VISIB") / 100.0)
    val vert = Agg.weightedMean(withFeatures, keys, col("w"), Seq("zh_lin"))
    assert(vert.count() == 6) // one row per kept 10-min step
    val first = vert.orderBy("TIMESTAMP").collect().head
    // weights favor the lower sweep: result sits between the two sweep values
    val lo = math.pow(10, 3.1); val hi = math.pow(10, 3.2)
    val v = first.getDouble(first.fieldIndex("zh_lin"))
    assert(v > lo && v < hi)

    // NaN feature rows are excluded from numerator AND denominator — a NaN
    // zh_lin with a huge weight must not deflate the mean via the decimal
    // cast's silent NaN→NULL skip
    val withNaN = withFeatures.withColumn("zh_lin",
      when(col("SWEEP") === 2, lit(Double.NaN)).otherwise(col("zh_lin")))
    val vertNaN = Agg.weightedMean(withNaN, keys, col("w"), Seq("zh_lin"))
    val fNaN = vertNaN.orderBy("TIMESTAMP").collect().head
    val vOnlyLow = fNaN.getDouble(fNaN.fieldIndex("zh_lin"))
    // only sweep-1 gates survive: the mean equals their (single) value
    assert(math.abs(vOnlyLow - lo) < 1e-6)

    // A3 categorical: weighted one-hot proportions of the RADAR column
    val props = Agg.weightedProportions(withFeatures, keys, col("w"), "RADAR", Seq("A", "D"))
    val p0 = props.orderBy("TIMESTAMP").collect().head
    val pa = p0.getDouble(p0.fieldIndex("RADAR_prop_A"))
    val pd = p0.getDouble(p0.fieldIndex("RADAR_prop_D"))
    assert(math.abs(pa + pd - 1.0) < 1e-9)
    assert(math.abs(pa - 0.5) < 1e-9) // symmetric fixture

    // A7: hourly rollup of the gauge target, F8 mm/10min → mm/h
    val hourly = gaugeValid
      .withColumn("ts_t", timestamp_seconds(col("TIMESTAMP") - 600))
      .groupBy(col("STATION"), window(col("ts_t"), "1 hour"))
      .agg(avg(graft.functions.Phys.toRate(col("RRE150Z0"))).as("R_mmh"))
    val otl = hourly.filter(col("STATION") === "OTL").collect()
    assert(otl.exists(r => math.abs(r.getDouble(r.fieldIndex("R_mmh")) - 3.0) < 1e-6))
  }
}
