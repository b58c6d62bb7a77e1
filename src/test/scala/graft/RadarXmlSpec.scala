package graft

import org.apache.spark.sql.functions._

import graft.sources.RadarXml

/** S9/S10 XML ingestion: status parse (+wet-radome fallback wiring) and the
  * VPR clamped interpolator, against inline fixtures shaped like the
  * reference's files (io_data.py:65-114, 332-380).
  */
class RadarXmlSpec extends SparkSpec {

  private val statusXml =
    """<status>
      |  <sweep name="1">
      |    <RADAR><STAT>
      |      <VOLTAGE value="280.5"/>
      |      <TX-P/>malformed</TX-P/>
      |    </STAT></RADAR>
      |  </sweep>
      |  <sweep name="20">
      |    <RADAR><STAT>
      |      <VOLTAGE value="281.25"/>
      |      <WET_RADOME><wetradome_mmh value="1.75"/></WET_RADOME>
      |    </STAT></RADAR>
      |  </sweep>
      |</status>""".stripMargin

  test("status parse: per-sweep STAT maps, -P/ sanitization, wet radome from last sweep") {
    val st = RadarXml.parseStatus(statusXml)
    assert(st.sweeps.length == 2)
    assert(st.sweeps.head("VOLTAGE") == "280.5")
    assert(st.sweeps.head("TX-P_") == "malformed") // reference's replace('-P/','-P_')
    assert(st.sweeps(1)("VOLTAGE") == "281.25")
    assert(st.wetRadomeMmh.contains(1.75))
  }

  test("wet-radome fallback: 3x3 RZC mean with sub-validity snap, None when dry") {
    import spark.implicits._
    val noWet = RadarXml.parseStatus(statusXml.replaceAll("(?s)<WET_RADOME>.*</WET_RADOME>", ""))
    assert(noWet.wetRadomeMmh.isEmpty)
    // 3x3 block around (10,10): two wet cells, one sub-validity (0.02 -> 0),
    // plus an out-of-window cell that must be ignored
    val rzc = Seq((9, 9, 0.9), (10, 10, 0.02), (11, 11, 0.3), (50, 50, 99.0))
      .toDF("chx", "chy", "value")
    val filled = RadarXml.withWetRadome(noWet, rzc, 10, 10)
    assert(filled.wetRadomeMmh.isDefined)
    assert(math.abs(filled.wetRadomeMmh.get - (0.9 + 0.0 + 0.3) / 3.0) < 1e-12)
    // all-dry block -> mean 0 -> None (reference assigns WET_RADOME = None)
    val dry = Seq((10, 10, 0.01)).toDF("chx", "chy", "value")
    assert(RadarXml.withWetRadome(noWet, dry, 10, 10).wetRadomeMmh.isEmpty)
    // a file that already has the value never touches the grid
    val untouched = RadarXml.withWetRadome(
      RadarXml.parseStatus(statusXml),
      sys.error("must not evaluate"), sys.error("no"), sys.error("no"))
    assert(untouched.wetRadomeMmh.contains(1.75))
  }

  private val vprXml =
    """<VPR>
      |  <HEADER><vpr_res>300</vpr_res><vpr_uuid>x</vpr_uuid></HEADER>
      |  <DATA>
      |    <slice><value>0.10</value></slice>
      |    <slice><value>0.40</value></slice>
      |    <slice><value>0.80</value></slice>
      |    <slice><value>1.00</value></slice>
      |    <slice><value>1.20</value></slice>
      |    <slice><value>0.90</value></slice>
      |    <slice><value>0.001</value></slice>
      |    <slice><value>0.30</value></slice>
      |  </DATA>
      |</VPR>""".stripMargin

  test("VPR parse: normalization at the radar reference height and ±4.77 dB clamp") {
    val p = RadarXml.parseVpr(vprXml, 'A') // ref height 1500 -> slice 5 (0.90)
    assert(p.res == 300.0)
    assert(p.corr.length == 8)
    val corrMax = math.pow(10.0, 0.477)
    // corr = vpr(ref)/vpr clamped: slice 5 is the reference -> exactly 1
    assert(math.abs(p.corr(5) - 1.0) < 1e-12)
    assert(math.abs(p.corr(4) - 0.9 / 1.2) < 1e-12)
    // 0.9/0.1 = 9 and 0.9/0.001 = 900 both clamp to the +4.77 dB cap
    assert(math.abs(p.corr(0) - corrMax) < 1e-12)
    assert(math.abs(p.corr(6) - corrMax) < 1e-12)
    // 0.9/0.3 = 3.0 barely exceeds corrMax ~ 2.9992 -> clamped
    assert(math.abs(p.corr(7) - corrMax) < 1e-12)
  }

  test("VPR correction column: linear between slices, max-correction fill out of range") {
    import spark.implicits._
    val p = RadarXml.parseVpr(vprXml, 'A')
    val corrMax = math.pow(10.0, 0.477)
    val hs = Seq(0.0, 300.0, 450.0, 1500.0, 2100.0, 2101.0, -5.0, 99999.0)
    val out = hs.toDF("h")
      .select(RadarXml.vprCorrection(p)(col("h")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(out(0) - p.corr(0)) < 1e-12)            // exact slice
    assert(math.abs(out(1) - p.corr(1)) < 1e-12)
    assert(math.abs(out(2) - (p.corr(1) + p.corr(2)) / 2.0) < 1e-12) // midpoint
    assert(math.abs(out(3) - p.corr(5)) < 1e-12)            // reference height
    assert(math.abs(out(4) - p.corr(7)) < 1e-12)            // last slice
    assert(math.abs(out(5) - corrMax) < 1e-12)              // past the top
    assert(math.abs(out(6) - corrMax) < 1e-12)              // below ground
    assert(math.abs(out(7) - corrMax) < 1e-12)
  }

  test("VPR anchors table feeds the generic interpolation join") {
    import spark.implicits._
    val p = RadarXml.parseVpr(vprXml, 'A')
    val tbl = RadarXml.vprTable(spark, p)
    assert(tbl.count() == 8)
    val mid = tbl.orderBy("alt").collect()
    assert(mid(5).getDouble(0) == 1500.0)
    assert(math.abs(mid(5).getDouble(1) - 1.0) < 1e-12)
  }
}
