package graft

import org.apache.spark.sql.functions._

import graft.functions.Kdp
import graft.ml.HydroClass

class KdpHydroSpec extends SparkSpec {

  test("Kdp recovers half the phase slope of a linear ΨDP ramp") {
    // ΨDP rises 2 deg/km → KDP = 1 deg/km; dr = 0.5 km
    val ray = df("az INT, rng INT, psidp DOUBLE",
      (0 until 100).map(i => R(1, i, 2.0 * (i * 0.5))))
    val out = Kdp.compute(ray, Seq("az"), "rng", "psidp", drKm = 0.5)
      .orderBy("rng").collect()
    // interior gates (full windows) must be exact
    out.slice(20, 80).foreach { r =>
      assert(math.abs(r.getDouble(r.fieldIndex("kdp")) - 1.0) < 1e-9)
    }
  }

  test("Kdp smoothing suppresses single-gate phase noise") {
    val noisy = (0 until 100).map { i =>
      val base = 2.0 * (i * 0.5)
      R(1, i, if (i == 50) base + 40.0 else base) // one spike
    }
    val ray = df("az INT, rng INT, psidp DOUBLE", noisy)
    val out = Kdp.compute(ray, Seq("az"), "rng", "psidp", drKm = 0.5)
      .filter(col("rng").between(45, 55)).select("kdp").collect()
      .map(_.getDouble(0))
    // spike of 40° over one gate would be ~40 deg/km unsmoothed; windowed
    // least squares keeps it within a few deg/km
    assert(out.forall(k => k > -5 && k < 5))
  }

  test("HydroClass assigns gates to the nearest standardized centroid") {
    // two separated clusters in (zh, zdr)
    val rows = (1 to 50).map(i => R(s"g$i", 20.0 + i % 3, 0.5 + (i % 3) * 0.01)) ++
      (1 to 50).map(i => R(s"h$i", 45.0 + i % 3, 3.0 + (i % 3) * 0.01))
    val d = df("gate STRING, zh DOUBLE, zdr DOUBLE", rows)
    // centroids in standardized space: cluster means map to ±~1 z-score
    val cents = Seq(
      HydroClass.Centroid("rain", Seq(-1.0, -1.0)),
      HydroClass.Centroid("hail", Seq(1.0, 1.0)))
    val out = HydroClass.classify(d, Seq("zh", "zdr"), cents)
    val byPrefix = out.collect()
      .map(r => (r.getString(0).head, r.getString(r.fieldIndex("hydro_class"))))
    assert(byPrefix.filter(_._1 == 'g').forall(_._2 == "rain"))
    assert(byPrefix.filter(_._1 == 'h').forall(_._2 == "hail"))
    assert(out.filter(col("hydro_dist") < 0).count() == 0)
  }

  test("HydroClass Minkowski p=1 changes the metric but stays deterministic") {
    val d = df("gate STRING, x DOUBLE, y DOUBLE",
      Seq(R("a", 0.0, 0.0), R("b", 10.0, 10.0)))
    val cents = Seq(
      HydroClass.Centroid("lo", Seq(-0.9, -0.9)),
      HydroClass.Centroid("hi", Seq(0.9, 0.9)))
    val out = HydroClass.classify(d, Seq("x", "y"), cents, p = 1.0)
      .collect().map(r => (r.getString(0), r.getString(r.fieldIndex("hydro_class")))).toMap
    assert(out == Map("a" -> "lo", "b" -> "hi"))
  }

  test("classifyPerGroup dispatches to the group's OWN centroid table") {
    // the same gate (zh=30, hoi=5) is 'rain' under radar A's centroids and
    // 'snow' under radar B's — per-group dispatch, the over_iso semantics
    val d = df("gate STRING, radar STRING, zh DOUBLE, hoi DOUBLE",
      Seq(R("g1", "A", 30.0, 5.0), R("g2", "B", 30.0, 5.0),
        R("g3", "C", 30.0, 5.0))) // C has no table → null class
    val ranges = Seq((0.0, 60.0), (-10.0, 20.0))
    val cents = Map(
      "A" -> Seq(HydroClass.Centroid("rain", Seq(32.0, 6.0)),
        HydroClass.Centroid("snow", Seq(5.0, -8.0))),
      "B" -> Seq(HydroClass.Centroid("rain", Seq(55.0, 18.0)),
        HydroClass.Centroid("snow", Seq(28.0, 4.0))))
    val out = HydroClass.classifyPerGroup(d, "radar", Seq("zh", "hoi"),
        ranges, cents, weights = Seq(1.0, 0.5))
      .collect().map(r => r.getString(0) ->
        Option(r.getString(r.fieldIndex("hydro_class")))).toMap
    assert(out == Map("g1" -> Some("rain"), "g2" -> Some("snow"),
      "g3" -> None))
  }

  test("classifyPerGroup: weights steer the argmin, clamps saturate") {
    // point equidistant per-feature from both centroids in standardized
    // space; the weight on feature 1 decides the winner
    val d = df("gate STRING, radar STRING, x DOUBLE, y DOUBLE",
      Seq(R("g", "A", 0.0, 10.0),
        R("ov", "A", 999.0, -999.0))) // out of range: clamps to (1, -1)
    val ranges = Seq((-10.0, 10.0), (-10.0, 10.0))
    val cents = Map("A" -> Seq(
      HydroClass.Centroid("cx", Seq(10.0, 10.0)),  // matches y, off in x
      HydroClass.Centroid("cy", Seq(0.0, -10.0)))) // matches x, off in y
    def cls(w: Seq[Double]) = HydroClass.classifyPerGroup(
        d, "radar", Seq("x", "y"), ranges, cents, w)
      .collect().map(r => r.getString(0) ->
        r.getString(r.fieldIndex("hydro_class"))).toMap
    // heavy x-weight punishes cx's x-offset → cy wins; heavy y-weight → cx
    assert(cls(Seq(1.0, 0.1))("g") == "cy")
    assert(cls(Seq(0.1, 1.0))("g") == "cx")
    // the clamped point sits at standardized (1, -1): nearer cy=(1, -1)
    assert(cls(Seq(1.0, 1.0))("ov") == "cy")
  }
}
