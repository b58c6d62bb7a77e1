package graft

import org.apache.spark.sql.functions._

import graft.functions.Zphi

class ZphiSpec extends SparkSpec {

  // a ray of 200 gates, 0.5 km spacing, uniform 35 dBZ, φdp ramping 0→40°
  private def ray = df("az INT, rng INT, zh DOUBLE, phidp DOUBLE",
    (0 until 200).map(i => R(1, i, 35.0, 40.0 * i / 199.0)))

  test("ZPHI: AH positive, PIA monotone, corrected ZH >= ZH") {
    val out = Zphi.attenuation(ray, Seq("az"), "rng", "zh", "phidp", drKm = 0.5)
      .orderBy("rng").collect()
    assert(out.forall(_.getDouble(out.head.fieldIndex("ah")) >= 0))
    val pias = out.map(r => r.getDouble(r.fieldIndex("pia")))
    assert(pias.sliding(2).forall(p => p(0) <= p(1) + 1e-12))
    assert(out.forall { r =>
      r.getDouble(r.fieldIndex("zh_corr")) >= r.getDouble(r.fieldIndex("zh")) - 1e-12
    })
  }

  test("ZPHI closed-form identity: total two-way PIA = alpha * delta-phidp") {
    // 2·∫AH dr = ln(1+C)/(0.23·b) · ... reduces analytically to α·ΔΦdp
    val alpha = 0.08
    val out = Zphi.attenuation(ray, Seq("az"), "rng", "zh", "phidp",
        drKm = 0.5, alpha = alpha)
      .orderBy("rng").collect()
    val totalPia = out.last.getDouble(out.last.fieldIndex("pia"))
    val expected = alpha * 40.0
    // discrete integration error only (200 gates): within 2%
    assert(math.abs(totalPia - expected) / expected < 0.02, s"pia=$totalPia expected≈$expected")
  }

  test("ZPHI: uniform reflectivity spreads AH uniformly; zero dphi → zero AH") {
    val flat = df("az INT, rng INT, zh DOUBLE, phidp DOUBLE",
      (0 until 100).map(i => R(1, i, 30.0, 5.0)))
    val out = Zphi.attenuation(flat, Seq("az"), "rng", "zh", "phidp", drKm = 0.5)
      .select("ah").collect().map(_.getDouble(0))
    assert(out.forall(_ == 0.0)) // ΔΦdp = 0 → C = 0 → no attenuation
    // uniform Z + linear φ: AH grows along the ray (less remaining integral)
    val outRay = Zphi.attenuation(ray, Seq("az"), "rng", "zh", "phidp", drKm = 0.5)
      .orderBy("rng").select("ah").collect().map(_.getDouble(0))
    assert(outRay.last > outRay.head)
  }

  test("ZPHI: rays are independent (per-key partitioning)") {
    val twoRays = df("az INT, rng INT, zh DOUBLE, phidp DOUBLE",
      (0 until 50).flatMap(i => Seq(
        R(1, i, 35.0, 20.0 * i / 49.0),
        R(2, i, 35.0, 0.0)))) // second ray: no phase shift
    val out = Zphi.attenuation(twoRays, Seq("az"), "rng", "zh", "phidp", drKm = 0.5)
    assert(out.filter(col("az") === 2 && col("ah") =!= 0.0).count() == 0)
    assert(out.filter(col("az") === 1 && col("ah") > 0.0).count() > 0)
  }
}
