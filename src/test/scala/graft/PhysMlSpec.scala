package graft

import org.apache.spark.sql.functions._

import graft.functions.Phys
import graft.ml.{BiasCorrection, Scores}

class PhysMlSpec extends SparkSpec {

  test("dB round-trip: linToDb(dbToLin(x)) = x") {
    val d = df("x DOUBLE", Seq(R(10.0), R(35.5), R(-5.0)))
    val out = d.select(col("x"), Phys.linToDb(Phys.dbToLin(col("x"))).as("y")).collect()
    assert(out.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("visibCorrect masks below minVisib and caps the correction") {
    val d = df("z DOUBLE, vis DOUBLE", Seq(R(100.0, 30.0), R(100.0, 50.0), R(100.0, 100.0)))
    val out = d.select(Phys.visibCorrect(col("z"), col("vis"), 40.0, 1.5)).collect()
    assert(out(0).isNullAt(0))               // below minVisib
    assert(out(1).getDouble(0) == 150.0)     // 100/50=2 capped at 1.5
    assert(out(2).getDouble(0) == 100.0)     // no correction
  }

  test("snrMask nulls low-SNR gates") {
    val d = df("zh DOUBLE, nh DOUBLE", Seq(R(10.0, 9.0), R(30.0, 9.0)))
    val out = d.select(Phys.snrMask(col("zh"), col("nh"), 3.0)).collect()
    assert(out(0).isNullAt(0) && out(1).getDouble(0) == 30.0)
  }

  test("F5 noisedBZ: range-dependent floor feeds snrMask") {
    // noise_ref −31 dB at 100 km: at 100 km the floor IS the reference; at
    // 10 km it is 20 dB lower; at 0 range it is undefined (NULL)
    val d = df("r DOUBLE, zh DOUBLE",
      Seq(R(100000.0, -20.0), R(10000.0, -20.0), R(0.0, -20.0)))
    val noise = Phys.noisedBZ(col("r"), lit(-31.0))
    val floors = d.select(noise).collect()
    assert(math.abs(floors(0).getDouble(0) - (-31.0)) < 1e-9)
    assert(math.abs(floors(1).getDouble(0) - (-51.0)) < 1e-9)
    assert(floors(2).isNullAt(0))
    // masked exactly like the reference: SNR = zh − noisedBZ(r) vs threshold.
    // zh=−20: SNR 11 dB at 100 km (< 23 → masked), 31 dB at 10 km (kept)
    val masked = d.select(Phys.snrMask(col("zh"), noise, 23.0)).collect()
    assert(masked(0).isNullAt(0) && masked(1).getDouble(0) == -20.0)
    // a gate with an UNDEFINED noise floor (r ≤ 0 → NULL) is masked, not
    // passed through: a NULL SNR comparison must never count as "above"
    assert(masked(2).isNullAt(0))
    // companion: noisedBADU = 10·log10(power) + rconst (status-file path)
    val badu = df("p DOUBLE, rc DOUBLE", Seq(R(0.01, 75.0)))
      .select(Phys.noiseDbAdu(col("p"), col("rc"))).collect()
    assert(math.abs(badu(0).getDouble(0) - 55.0) < 1e-9)
  }

  test("catchEfficiency regimes: liquid=1, mixed and solid < 1, wind clamped") {
    val d = df("t DOUBLE, w DOUBLE",
      Seq(R(10.0, 5.0), R(0.0, 5.0), R(-5.0, 5.0), R(-5.0, 50.0)))
    val out = d.select(Phys.catchEfficiency(col("t"), col("w"))).collect().map(_.getDouble(0))
    assert(out(0) == 1.0)
    assert(out(1) < 1.0 && out(1) > out(2)) // solid catches less than mixed
    val clamped = 0.865 * math.exp(-0.298 * 9.0) + 0.225
    assert(math.abs(out(3) - clamped) < 1e-12)
  }

  test("F15 CH1903 forward∘inverse ≈ identity within 1 m over the Swiss domain") {
    val pts = for (lon <- Seq(6.0, 7.44, 8.5, 10.0); lat <- Seq(45.9, 46.95, 47.6))
      yield R(lon, lat)
    val d = df("lon DOUBLE, lat DOUBLE", pts)
    val (e, n) = Phys.wgs84ToCh1903(col("lon"), col("lat"))
    val (lon2, lat2) = Phys.ch1903ToWgs84(e, n)
    val out = d.select(col("lon"), col("lat"), lon2.as("lon2"), lat2.as("lat2"))
      .collect()
    out.foreach { r =>
      // the swisstopo polynomial pair is ~1 m accurate near Bern and a few
      // metres at the domain corners; 5e-5° ≈ 4 m bounds the whole domain
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 5e-5, r.toString)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 5e-5, r.toString)
    }
    // within 1 m at the projection origin (Bern)
    val bern = d.filter(col("lon") === 7.44 && col("lat") === 46.95)
      .select(col("lon"), col("lat"), lon2.as("lon2"), lat2.as("lat2")).collect()(0)
    assert(math.abs(bern.getDouble(0) - bern.getDouble(2)) < 1.4e-5)
    assert(math.abs(bern.getDouble(1) - bern.getDouble(3)) < 1e-5)
  }

  test("F15 CH1903 inverse hits the published Bern origin") {
    val d = df("e DOUBLE, n DOUBLE", Seq(R(600000.0, 200000.0)))
    val (lon, lat) = Phys.ch1903ToWgs84(col("e"), col("n"))
    val r = d.select(lon, lat).collect()(0)
    assert(math.abs(r.getDouble(0) - 7.438632) < 1e-4) // Bern lon
    assert(math.abs(r.getDouble(1) - 46.951083) < 1e-4) // Bern lat
  }

  test("F15 rotated pole: exact inverse and near-equator mapping of the Swiss domain") {
    val pts = for (lon <- Seq(5.5, 7.44, 10.5); lat <- Seq(45.5, 47.0, 48.0))
      yield R(lon, lat)
    val d = df("lon DOUBLE, lat DOUBLE", pts)
    val (rlon, rlat) = Phys.geoToRotatedPole(col("lon"), col("lat"), 43.0, -170.0)
    val (lonRt, latRt) = Phys.rotatedPoleToGeo(rlon, rlat, 43.0, -170.0)
    val out = d.select(col("lon"), col("lat"), rlat.as("rlat"),
      lonRt.as("lon_rt"), latRt.as("lat_rt")).collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(3)) < 1e-9, r.toString) // roundtrip
      assert(math.abs(r.getDouble(1) - r.getDouble(4)) < 1e-9, r.toString)
      assert(math.abs(r.getDouble(2)) < 5.0, r.toString) // COSMO-1 pole → |rlat| small
    }
  }

  test("searchSorted matches numpy side='right' semantics") {
    val d = df("v DOUBLE", Seq(R(5.0), R(10.0), R(99.0), R(200.0)))
    val out = d.select(Phys.searchSorted(col("v"), Seq(10.0, 50.0, 100.0))).collect()
      .map(_.getInt(0))
    assert(out.toSeq == Seq(0, 1, 2, 3))
  }

  test("dnDecode maps DN bytes through the scale array") {
    val d = df("dn INT", Seq(R(0), R(2)))
    val out = d.select(Phys.dnDecode(col("dn"), Seq(0.0, 0.1, 0.4))).collect()
      .map(_.getDouble(0))
    assert(out.toSeq == Seq(0.0, 0.4))
  }

  test("wgs84ToCh1903 maps Bern to ~(600000, 200000)") {
    val d = df("lon DOUBLE, lat DOUBLE", Seq(R(7.438632, 46.951082)))
    val (e, n) = Phys.wgs84ToCh1903(col("lon"), col("lat"))
    val row = d.select(e.as("e"), n.as("n")).collect().head
    assert(math.abs(row.getDouble(0) - 600000.0) < 300)
    assert(math.abs(row.getDouble(1) - 200000.0) < 300)
  }

  test("zrProxy inverts Marshall-Palmer at Z = A") {
    val d = df("z DOUBLE", Seq(R(316.0)))
    assert(math.abs(d.select(Phys.zrProxy(col("z"))).collect().head.getDouble(0) - 1.0) < 1e-12)
  }

  test("cdfSlope recovers an exact linear quantile map") {
    val d = df("pred DOUBLE, obs DOUBLE",
      (1 to 50).map(i => R(i.toDouble, 2.0 * i)))
    val slope = BiasCorrection.cdfSlope(d, "pred", "obs").collect().head.getDouble(0)
    assert(math.abs(slope - 2.0) < 1e-9)
  }

  test("applyCdf clamps negatives at zero") {
    val d = df("p DOUBLE", Seq(R(-3.0), R(4.0)))
    val out = d.select(BiasCorrection.applyCdf(col("p"), 2.0)).collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(0.0, 8.0))
  }

  test("perfscores: perfect estimates give zero bias, zero RMSE, zero scatter") {
    val d = df("g STRING, est DOUBLE, ref DOUBLE",
      (1 to 20).map(i => R("a", i * 0.5, i * 0.5)))
    val out = Scores.perfscores(d, "g", "est", "ref").collect().head
    assert(out.getDouble(out.fieldIndex("logbias_db")) == 0.0)
    assert(out.getDouble(out.fieldIndex("rmse_cond")) == 0.0)
    assert(out.getDouble(out.fieldIndex("scatter_db")) == 0.0)
  }

  test("perfscores logBias reflects a constant multiplicative bias") {
    val d = df("g STRING, est DOUBLE, ref DOUBLE",
      (1 to 20).map(i => R("a", i * 2.0, i * 1.0)))
    val out = Scores.perfscores(d, "g", "est", "ref").collect().head
    assert(math.abs(out.getDouble(out.fieldIndex("logbias_db")) - 10 * math.log10(2)) < 1e-4)
  }

  test("contingency computes POD/FAR/CSI from the four cells") {
    val d = df("g STRING, o BOOLEAN, p BOOLEAN", Seq(
      R("a", true, true), R("a", true, false), R("a", false, true), R("a", false, false)))
    val out = Scores.contingency(d, "g", col("o"), col("p")).collect().head
    assert(out.getLong(out.fieldIndex("hits")) == 1)
    assert(out.getDouble(out.fieldIndex("pod")) == 0.5)
    assert(out.getDouble(out.fieldIndex("far")) == 0.5)
    assert(math.abs(out.getDouble(out.fieldIndex("csi")) - 1.0 / 3) < 1e-6)
  }

  test("fitIsotonic produces a monotone quantile map") {
    val d = df("pred DOUBLE, obs DOUBLE",
      (1 to 30).map(i => R(i.toDouble, i * i * 0.1)))
    val model = BiasCorrection.fitIsotonic(d, "pred", "obs")
    val preds = model.predictions.toArray
    assert(preds.sliding(2).forall(p => p(0) <= p(1)))
  }
}
