package graft.qpe

/** S12: ODIM-convention gridded product writer/reader — the metadata
  * assembly of the reference's `write_odim_grid_h5` export
  * (reference: qpe/qpe.py:299-308 write call with time_ref="end",
  * odim_convention="ODIM_H5/V2_3"; qpe/qpe_utils.py:152-230 qpe_to_chgrid:
  * somerc projection string, 5-minute accumulation window, quality string
  * with '-' for missing radars, WMO node list, mm/hr RATE field, data
  * rounded to `precision` decimals).
  *
  * The container is REAL HDF5 (classic v0 superblock, symbol-table groups,
  * contiguous float32 dataset — [[Hdf5]], pure JVM, no external library)
  * with the ODIM group layout the reference emits: root `Conventions`
  * attribute, `/what` `/where` `/how` metadata groups,
  * `/dataset1/what` + `/dataset1/data1/data`. Driver-side on the collected
  * grid, like the reference's writer.
  */
object Odim {

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

  private def dateStr(epochS: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(epochS))

  private def timeStr(epochS: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("HHmmss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(epochS))

  /** Write grid(x)(y) + metadata as an ODIM_H5/V2_3 HDF5 file. Values are
    * rounded to `meta.precision` decimals (reference default 0.01 mm/hr);
    * NaN cells stay NaN (the reference's nodata). Group layout mirrors the
    * reference's writer: root Conventions attr, `/what` `/where` `/how`,
    * `/dataset1/what`, `/dataset1/data1/data` (reference: qpe/qpe.py:302-308
    * write_odim_grid_h5 with odim_convention="ODIM_H5/V2_3").
    */
  def write(path: String, grid: Array[Array[Double]], meta: OdimMeta): Unit = {
    import Hdf5.{Data, Dbl, Group, Lng, Str}
    val nx = grid.length
    val ny = grid(0).length
    val p = math.pow(10.0, meta.precision)
    val data = grid.map(_.map(v =>
      if (v.isNaN) Float.NaN else (math.round(v * p) / p).toFloat))
    val root = Group(
      attrs = Seq("Conventions" -> Str(meta.convention)),
      children = Seq(
        "what" -> Group(Seq(
          "object" -> Str("IMAGE"),
          "version" -> Str(meta.version),
          "date" -> Str(dateStr(meta.endEpochS)),
          "time" -> Str(timeStr(meta.endEpochS)),
          "source" -> Str(meta.source))),
        "where" -> Group(Seq(
          "projdef" -> Str(meta.projdef),
          "xsize" -> Lng(ny),
          "ysize" -> Lng(nx),
          "lat_0" -> Dbl(meta.originLat),
          "lon_0" -> Dbl(meta.originLon))),
        "how" -> Group(Seq(
          "startepochs" -> Lng(meta.startEpochS),
          "endepochs" -> Lng(meta.endEpochS),
          "time_ref" -> Str("end"),
          "radar" -> Str(meta.quality),
          "nodes" -> Str(meta.nodes))),
        "dataset1" -> Group(children = Seq(
          "what" -> Group(Seq(
            "product" -> Str(meta.product),
            "quantity" -> Str(meta.quantity),
            "units" -> Str(meta.unit),
            "prodname" -> Str(meta.prodName),
            "longname" -> Str(meta.longName),
            "startdate" -> Str(dateStr(meta.startEpochS)),
            "starttime" -> Str(timeStr(meta.startEpochS)),
            "enddate" -> Str(dateStr(meta.endEpochS)),
            "endtime" -> Str(timeStr(meta.endEpochS)),
            "gain" -> Dbl(1.0),
            "offset" -> Dbl(0.0),
            "nodata" -> Dbl(Double.NaN),
            "undetect" -> Dbl(meta.undetect),
            "precision" -> Lng(meta.precision))),
          "data1" -> Group(children = Seq(
            // chunked + deflate: the libhdf5-default product shape (and
            // ~10x smaller for grids dominated by repeated nodata)
            "data" -> Data(data, Seq(
              "CLASS" -> Str("IMAGE"),
              "IMAGE_VERSION" -> Str("1.2")), chunkRows = 64)))))))
    Hdf5.write(path, root)
  }

  /** Read back (grid, flat metadata fields). Parses the real HDF5 container
    * structurally ([[Hdf5.read]]) and flattens the ODIM groups to the same
    * field names the pre-HDF5 container exposed, so downstream consumers
    * (QPE E2E, RT product checks) are unchanged.
    */
  def read(path: String): (Array[Array[Double]], Map[String, String]) = {
    val root = Hdf5.read(path)
    def str(a: Hdf5.Attr): String = a match {
      case Hdf5.Str(v) => v
      case Hdf5.Dbl(v) => if (v.isNaN) "NaN" else v.toString
      case Hdf5.Lng(v) => v.toString
    }
    val what = root.children("what").attrs
    val where = root.children("where").attrs
    val how = root.children("how").attrs
    val dsWhat = root.children("dataset1").children("what").attrs
    val data = root.children("dataset1").children("data1").children("data")
    val grid = data.data.getOrElse(sys.error(s"$path: no /dataset1/data1/data"))
      .map(_.map(_.toDouble))
    val fields = Map(
      "convention" -> str(root.attrs("Conventions")),
      "object" -> str(what("object")),
      "version" -> str(what("version")),
      "source" -> str(what("source")),
      "projdef" -> str(where("projdef")),
      "originLat" -> str(where("lat_0")),
      "originLon" -> str(where("lon_0")),
      "nx" -> grid.length.toString,
      "ny" -> (if (grid.isEmpty) "0" else grid(0).length.toString),
      "startEpochS" -> str(how("startepochs")),
      "endEpochS" -> str(how("endepochs")),
      "timeRef" -> str(how("time_ref")),
      "radar" -> str(how("radar")),
      "nodes" -> str(how("nodes")),
      "product" -> str(dsWhat("product")),
      "quantity" -> str(dsWhat("quantity")),
      "unit" -> str(dsWhat("units")),
      "longName" -> str(dsWhat("longname")),
      "prodName" -> str(dsWhat("prodname")),
      "nodata" -> str(dsWhat("nodata")),
      "undetect" -> str(dsWhat("undetect")),
      "precision" -> str(dsWhat("precision")))
    (grid, fields)
  }
}
