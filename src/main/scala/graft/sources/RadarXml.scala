package graft.sources

import java.io.ByteArrayInputStream

import javax.xml.parsers.DocumentBuilderFactory

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.w3c.dom.Element

import graft.functions.Phys

/** S9/S10: radar status-XML and VPR-profile-XML ingestion
  * (reference: common/io_data.py:65-114 read_status — xmltodict parse with
  * the `-P/` tag sanitization, wet-radome fallback as a 3×3 RZC mean;
  * io_data.py:332-380 read_vpr — slice values → normalized, ±4.77 dB-clamped
  * height interpolator; constants.py:104-110 VPR_REF_HEIGHTS /
  * MAX_VPR_CORRECTION_DB).
  *
  * Parsing uses the JDK DOM parser (no external XML dependency). The parsed
  * profile becomes a literal-array Column interpolator so the correction
  * stays inside whole-stage codegen — no UDF, no join for the uniform-grid
  * profile case (the generic anchors-join path is
  * [[graft.operators.AsOf.interpolateJoin]]).
  */
object RadarXml {

  // ---------------------------------------------------------------- status

  /** Parsed radar status: per-sweep RADAR/STAT name→value maps (attribute
    * `value` preferred, text content otherwise) plus the wet-radome precip
    * of the LAST sweep if the file carries it.
    */
  final case class RadarStatus(sweeps: Seq[Map[String, String]],
                               wetRadomeMmh: Option[Double])

  private def childElems(e: Element): Seq[Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).map(nl.item).collect { case el: Element => el }
  }

  /** DOM builder with DTDs disabled: status/VPR files never carry one, and a
    * hostile file's external entities must not reach the filesystem (XXE).
    */
  private def secureBuilder() = {
    val f = DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder()
  }

  /** Parse a status XML string. Mirrors the reference's pre-parse
    * sanitization of malformed `-P/` tag fragments (io_data.py:83).
    */
  def parseStatus(xml: String): RadarStatus = {
    val cleaned = xml.replace("-P/", "-P_")
    val doc = secureBuilder()
      .parse(new ByteArrayInputStream(cleaned.getBytes("UTF-8")))
    val root = doc.getDocumentElement // <status>
    val sweeps = childElems(root).filter(_.getTagName == "sweep").map { sweep =>
      val stats = for {
        radar <- childElems(sweep).filter(_.getTagName == "RADAR")
        stat <- childElems(radar).filter(_.getTagName == "STAT")
        entry <- childElems(stat)
      } yield {
        val v = Option(entry.getAttribute("value")).filter(_.nonEmpty)
          .getOrElse(entry.getTextContent.trim)
        entry.getTagName -> v
      }
      stats.toMap
    }
    // WET_RADOME carries a nested <wetradome_mmh value="..."/> element
    val wet = for {
      sweep <- childElems(root).filter(_.getTagName == "sweep").lastOption
      radar <- childElems(sweep).find(_.getTagName == "RADAR")
      stat <- childElems(radar).find(_.getTagName == "STAT")
      wr <- childElems(stat).find(_.getTagName == "WET_RADOME")
      mmh <- childElems(wr).find(_.getTagName == "wetradome_mmh")
      v <- Option(mmh.getAttribute("value")).filter(_.nonEmpty)
    } yield v.toDouble
    RadarStatus(sweeps, wet)
  }

  /** Older files carry no WET_RADOME: estimate it as the 3×3 mean of the RZC
    * product around the radar's grid cell, with sub-validity values snapped
    * to 0 first (reference: io_data.py:90-114; MIN_RZC_VALID=0.04). Returns
    * None when the mean is 0 (the reference assigns WET_RADOME = None then).
    * Distributed: one filtered aggregation over the cell relation — the same
    * math as Grid.boxStats specialised to one centre.
    */
  def wetRadomeFallback(rzcCells: DataFrame, chx: Int, chy: Int,
                        minValid: Double = 0.04): Option[Double] = {
    val nine = rzcCells
      .filter(col("chx").between(chx - 1, chx + 1) &&
              col("chy").between(chy - 1, chy + 1))
      .agg(avg(Phys.clampBelow(col("value"), minValid)).as("m"))
      .collect()(0)
    if (nine.isNullAt(0)) None
    else Some(nine.getDouble(0)).filter(_ != 0.0)
  }

  /** Attach the wet-radome estimate to a parsed status, preferring the
    * file's own value (reference read_status(add_wet_radome=True) flow).
    */
  def withWetRadome(status: RadarStatus, rzcCells: => DataFrame,
                    chx: => Int, chy: => Int): RadarStatus =
    if (status.wetRadomeMmh.isDefined) status
    else status.copy(wetRadomeMmh = wetRadomeFallback(rzcCells, chx, chy))

  // ------------------------------------------------------------------- VPR

  /** Reference heights per radar and the correction clamp
    * (constants.py:104, 110).
    */
  val VprRefHeights: Map[Char, Double] =
    Map('A' -> 1500.0, 'D' -> 2000.0, 'L' -> 2000.0, 'P' -> 1500.0, 'W' -> 1500.0)
  val MaxVprCorrectionDb = 4.77

  /** Parsed VPR: uniform altitude grid `i*res` with the clamped normalized
    * multiplicative correction per slice.
    */
  final case class VprProfile(res: Double, corr: Array[Double]) {
    def alt(i: Int): Double = i * res
  }

  /** Parse a VPR XML string for `radar`: slice values → vpr(ref)/vpr(h),
    * clamped into [10^-0.477, 10^0.477] (±4.77 dB), ref = slice nearest the
    * radar's reference height (io_data.py:360-377).
    */
  def parseVpr(xml: String, radar: Char): VprProfile = {
    val doc = secureBuilder()
      .parse(new ByteArrayInputStream(xml.getBytes("UTF-8")))
    val root = doc.getDocumentElement // <VPR>
    val header = childElems(root).find(_.getTagName == "HEADER")
      .getOrElse(sys.error("VPR xml: no HEADER"))
    val res = childElems(header).find(_.getTagName == "vpr_res")
      .map(_.getTextContent.trim.toDouble)
      .getOrElse(sys.error("VPR xml: no vpr_res"))
    val data = childElems(root).find(_.getTagName == "DATA")
      .getOrElse(sys.error("VPR xml: no DATA"))
    val vpr = childElems(data).filter(_.getTagName == "slice").map { s =>
      childElems(s).find(_.getTagName == "value")
        .map(_.getTextContent.trim.toDouble)
        .getOrElse(s.getTextContent.trim.toDouble)
    }.toArray
    val refHeight = VprRefHeights.getOrElse(radar,
      sys.error(s"unknown radar '$radar'"))
    val ref = vpr.indices.minBy(i => math.abs(i * res - refHeight))
    val corrMax = math.pow(10.0, 0.1 * MaxVprCorrectionDb)
    val corr = vpr.map { v =>
      val c = vpr(ref) / v
      math.min(math.max(c, 1.0 / corrMax), corrMax)
    }
    VprProfile(res, corr)
  }

  /** The profile as a Column interpolator: linear between slices on the
    * uniform grid, out-of-range → the max correction (the reference
    * interp1d fill_value). Literal-array arithmetic only — codegen'd, no
    * shuffle, broadcast-free (the profile is ~100 doubles).
    */
  def vprCorrection(profile: VprProfile)(height: Column): Column = {
    val arr = lit(profile.corr)
    val n = profile.corr.length
    val corrMax = math.pow(10.0, 0.1 * MaxVprCorrectionDb)
    val pos = height / profile.res
    val i0 = floor(pos).cast("int")
    val frac = pos - i0
    val c0 = element_at(arr, i0 + 1)
    val c1 = element_at(arr, least(i0 + 2, lit(n)))
    when(height < 0 || pos > n - 1, lit(corrMax))
      .otherwise(c0 * (lit(1.0) - frac) + c1 * frac)
  }

  /** The profile as an anchors DataFrame (alt, vpr_corr) for the generic
    * interpolation-join path (J8/S10 composition).
    */
  def vprTable(spark: org.apache.spark.sql.SparkSession,
               profile: VprProfile): DataFrame = {
    import spark.implicits._
    profile.corr.zipWithIndex
      .map { case (c, i) => (profile.alt(i), c) }.toSeq
      .toDF("alt", "vpr_corr")
  }
}
