package graft

import java.nio.file.Files

import graft.qpe.{Gif, Odim}
import org.scalatest.funsuite.AnyFunSuite

/** S12/S13 product sinks: ODIM-convention grid writer (metadata assembly per
  * qpe_utils.py:152-230) and AQC palette GIF (io_data.py:231-291) — golden
  * roundtrip coverage, no Spark session needed (driver-side writers).
  */
class ProductSinkSpec extends AnyFunSuite {

  private def tmpFile(suffix: String): String =
    Files.createTempFile("graft-sink", suffix).toString

  test("ODIM metadata: full quality string and node list when nothing is missing") {
    val m = Odim.chMeta(tEndEpochS = 1700000000L)
    assert(m.quality == "ADLPW")
    assert(m.nodes == "WMO:06661,WMO:06699,WMO:06768,WMO:06726,WMO:06776")
    assert(m.endEpochS - m.startEpochS == 300)
  }

  test("ODIM metadata: missing radars become '-' and drop out of the node list") {
    val m = Odim.chMeta(1700000000L, missingRadars = Set('D', 'W'))
    assert(m.quality == "A-LP-")
    assert(m.nodes == "WMO:06661,WMO:06768,WMO:06726")
  }

  test("ODIM metadata from an RT quality string (degraded-emit bridge)") {
    val m = Odim.chMetaFromQuality(1700000300L, "A-LP-")
    assert(m.quality == "A-LP-")
    assert(m.nodes == "WMO:06661,WMO:06768,WMO:06726")
  }

  test("ODIM grid roundtrip: values at precision, NaN preserved, header faithful") {
    val grid = Array.tabulate(6, 9)((x, y) =>
      if ((x + y) % 7 == 0) Double.NaN else x * 1.2345 + y * 0.0789)
    val meta = Odim.chMeta(1700000300L, Set('P'))
    val path = tmpFile(".h5")
    Odim.write(path, grid, meta)
    val (back, fields) = Odim.read(path)
    assert(back.length == 6 && back(0).length == 9)
    for (x <- 0 until 6; y <- 0 until 9) {
      if (grid(x)(y).isNaN) assert(back(x)(y).isNaN)
      else {
        // rounded to 2 decimals then float32: agree within 1e-4
        val expected = math.round(grid(x)(y) * 100.0) / 100.0
        assert(math.abs(back(x)(y) - expected) < 1e-4,
          s"($x,$y): ${back(x)(y)} vs $expected")
      }
    }
    assert(fields("radar") == "ADL-W")
    assert(fields("nodes") == "WMO:06661,WMO:06699,WMO:06768,WMO:06776")
    assert(fields("projdef").startsWith("+proj=somerc"))
    assert(fields("unit") == "mm/hr")
    assert(fields("prodName") == "CHRFO")
    assert(fields("startEpochS").toLong == 1700000000L)
    assert(fields("convention") == "ODIM_H5/V2_3")
  }

  test("GIF DN scale: power law on 2..250, zero below, masked above") {
    assert(Gif.Scale(0) == 0.0 && Gif.Scale(1) == 0.0)
    val v100 = math.pow(math.pow(10.0, (100 - 71.5) / 20.0) / 316.0, 2.0 / 3.0)
    assert(math.abs(Gif.Scale(100) - v100) < 1e-12)
    assert(Gif.Scale(255).isNaN && Gif.Scale(251).isNaN)
    // strictly increasing over the defined range
    (3 to 250).foreach(i => assert(Gif.Scale(i) > Gif.Scale(i - 1)))
  }

  test("GIF DN encode is the exact inverse of decode on every defined DN") {
    (2 to 250).foreach { dn =>
      assert(Gif.encodeDn(Gif.decodeDn(dn)) == dn, s"dn=$dn")
    }
    assert(Gif.encodeDn(0.0) == 0)
    assert(Gif.encodeDn(Double.NaN) == 255)
    assert(Gif.encodeDn(-1.0) == 255)
    assert(Gif.encodeDn(1e9) == 250) // clamped at the scale top
  }

  test("GIF file roundtrip: write → read recovers the quantized grid") {
    val grid = Array.tabulate(5, 7)((x, y) =>
      if (x == 0 && y == 0) Double.NaN
      else if (x == 0 && y == 1) 0.0
      else Gif.decodeDn(2 + (x * 7 + y) * 3)) // exact scale values → lossless
    val path = tmpFile(".gif")
    Gif.saveGif(path, grid)
    val back = Gif.readGif(path)
    assert(back.length == 5 && back(0).length == 7)
    for (x <- 0 until 5; y <- 0 until 7) {
      if (grid(x)(y).isNaN) assert(back(x)(y).isNaN, s"($x,$y)")
      else assert(math.abs(back(x)(y) - grid(x)(y)) < 1e-12, s"($x,$y)")
    }
  }

  test("GIF reader rejects an undecodable payload loudly, not with an NPE") {
    val path = tmpFile(".gif")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "definitely not a gif".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] { Gif.readGif(path) }
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("GIF roundtrip quantization error is bounded by one scale step") {
    val vals = Seq(0.1, 0.5, 1.0, 2.5, 10.0, 42.0, 120.0)
    vals.foreach { v =>
      val dn = Gif.encodeDn(v)
      val back = Gif.decodeDn(dn)
      // side='left': back is the smallest scale value >= v, one step above
      assert(back >= v - 1e-12)
      assert(back / v < math.pow(10.0, 1.0 / 20.0 * 2.0 / 3.0) + 1e-9,
        s"v=$v dn=$dn back=$back") // one DN step in the power-law domain
    }
  }
}
