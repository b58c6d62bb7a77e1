package graft.qpe

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** S12: ODIM-convention gridded product writer/reader — the metadata
  * assembly of the reference's `write_odim_grid_h5` export
  * (reference: qpe/qpe.py:299-308 write call with time_ref="end",
  * odim_convention="ODIM_H5/V2_3"; qpe/qpe_utils.py:152-230 qpe_to_chgrid:
  * somerc projection string, 5-minute accumulation window, quality string
  * with '-' for missing radars, WMO node list, mm/hr RATE field, data
  * rounded to `precision` decimals).
  *
  * The container is a self-describing single file (one-line JSON header +
  * raw little-endian float32 payload) rather than HDF5 — the JVM has no
  * built-in HDF5 codec and the dependency set is fixed; every ODIM
  * group/attribute the reference emits is carried in the header verbatim,
  * so a downstream HDF5 shim is a pure re-serialization. Driver-side on the
  * collected grid, like the reference's writer.
  */
object Odim {

  val Magic = "GRAFTODIM1"

  /** The five Swiss radars and their WMO station ids
    * (reference: qpe_utils.py:222-228).
    */
  val AllRadars = "ADLPW"
  val WmoNodes: Seq[String] =
    Seq("WMO:06661", "WMO:06699", "WMO:06768", "WMO:06726", "WMO:06776")

  final case class OdimMeta(
      startEpochS: Long,
      endEpochS: Long,
      quality: String,
      nodes: String,
      product: String = "RR",
      quantity: String = "RATE",
      unit: String = "mm/hr",
      longName: String = "Rainforest estimated rain rate",
      prodName: String = "CHRFO",
      projdef: String = "+proj=somerc +lat_0=46.95240555555556 " +
        "+lon_0=7.439583333333333 +k_0=1 +x_0=600000 +y_0=200000 " +
        "+ellps=bessel +towgs84=674.4,15.1,405.3,0,0,0,0 +units=m +no_defs",
      originLat: Double = 46.9524,
      originLon: Double = 7.43958333,
      source: String = "ORG:215, CTY:644, CMT:MeteoSwiss (Switzerland)",
      version: String = "H5rad 2.3",
      convention: String = "ODIM_H5/V2_3",
      undetect: Double = 0.0,
      precision: Int = 2)

  /** Metadata for a Swiss-grid QPE product ending at `tEndEpochS`: 5-minute
    * accumulation window, quality string with '-' substituted for each
    * missing radar, node list filtered to the radars present
    * (reference: qpe_utils.py:205-230).
    */
  def chMeta(tEndEpochS: Long, missingRadars: Set[Char] = Set.empty): OdimMeta = {
    val quality = AllRadars.map(c => if (missingRadars.contains(c)) '-' else c)
    val nodes =
      if (!quality.contains('-')) WmoNodes.mkString(",")
      else AllRadars.zip(WmoNodes).collect {
        case (r, wmo) if !missingRadars.contains(r) => wmo
      }.mkString(",")
    OdimMeta(startEpochS = tEndEpochS - 5 * 60, endEpochS = tEndEpochS,
      quality = quality, nodes = nodes)
  }

  /** Bridge from the streaming completeness quality string
    * ([[graft.streaming.RT.quality]], '-' marks a missing radar) straight to
    * the product metadata — the RT daemon's degraded-emit path feeds the
    * writer without re-deriving the missing set.
    */
  def chMetaFromQuality(tEndEpochS: Long, quality: String): OdimMeta = {
    require(quality.length == AllRadars.length, s"quality '$quality' must be 5 chars")
    val missing = AllRadars.zip(quality).collect { case (r, q) if q == '-' => r }.toSet
    chMeta(tEndEpochS, missing)
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Write grid(x)(y) + metadata. Values are rounded to `meta.precision`
    * decimals (reference default 0.01 mm/hr); NaN cells stay NaN (the
    * reference's nodata).
    */
  def write(path: String, grid: Array[Array[Double]], meta: OdimMeta): Unit = {
    val nx = grid.length
    val ny = grid(0).length
    val header =
      s"""{"convention":${jstr(meta.convention)},"object":"IMAGE",""" +
        s""""version":${jstr(meta.version)},"source":${jstr(meta.source)},""" +
        s""""startEpochS":${meta.startEpochS},"endEpochS":${meta.endEpochS},""" +
        s""""timeRef":"end","projdef":${jstr(meta.projdef)},""" +
        s""""originLat":${meta.originLat},"originLon":${meta.originLon},""" +
        s""""nx":$nx,"ny":$ny,"product":${jstr(meta.product)},""" +
        s""""quantity":${jstr(meta.quantity)},"unit":${jstr(meta.unit)},""" +
        s""""longName":${jstr(meta.longName)},"prodName":${jstr(meta.prodName)},""" +
        s""""radar":${jstr(meta.quality)},"nodes":${jstr(meta.nodes)},""" +
        s""""nodata":"NaN","undetect":${meta.undetect},""" +
        s""""precision":${meta.precision}}"""
    val headerBytes = (Magic + "\n" + header + "\n").getBytes("UTF-8")
    val buf = ByteBuffer.allocate(headerBytes.length + nx * ny * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(headerBytes)
    val p = math.pow(10.0, meta.precision)
    grid.foreach(_.foreach { v =>
      buf.putFloat(if (v.isNaN) Float.NaN else (math.round(v * p) / p).toFloat)
    })
    Files.write(Paths.get(path), buf.array())
  }

  /** Read back (grid, header fields). The header is our own flat JSON — a
    * minimal field scanner suffices (strings have no raw control chars).
    */
  def read(path: String): (Array[Array[Double]], Map[String, String]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val nl1 = bytes.indexOf('\n'.toByte)
    val nl2 = bytes.indexOf('\n'.toByte, nl1 + 1)
    require(new String(bytes, 0, nl1, "UTF-8") == Magic, s"not a $Magic file")
    val header = new String(bytes, nl1 + 1, nl2 - nl1 - 1, "UTF-8")
    val fields = """"([A-Za-z]+)":(?:"((?:[^"\\]|\\.)*)"|([-0-9.eE]+))""".r
      .findAllMatchIn(header).map { m =>
        m.group(1) -> Option(m.group(2))
          .map(_.replace("\\\"", "\"").replace("\\\\", "\\"))
          .getOrElse(m.group(3))
      }.toMap
    val nx = fields("nx").toInt
    val ny = fields("ny").toInt
    val buf = ByteBuffer.wrap(bytes, nl2 + 1, nx * ny * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    val grid = Array.tabulate(nx, ny)((_, _) => buf.getFloat.toDouble)
    (grid, fields)
  }
}
