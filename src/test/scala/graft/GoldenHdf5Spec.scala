package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.qpe.Odim

/** S12 interop-drift guard: a CHECKED-IN product fixture + a golden hash.
  *
  * No independent HDF5 implementation exists in this environment (no
  * libhdf5/h5py/h5dump), so true third-party conformance can't run here —
  * what CAN be pinned is the byte format itself: (a) writing the pinned
  * input must reproduce the committed fixture bit-for-bit, so any format
  * change fails loudly and regenerating the fixture is a conscious,
  * reviewed act; (b) the READER must parse the committed bytes — a frozen
  * artifact of a past writer — so a correlated writer+reader drift (both
  * sides changing in the same broken way, the failure mode self-roundtrips
  * can't see) still trips the spec. Foreign SHAPES (raw-stored masked
  * chunks, continuation blocks, non-f32 elements, shuffle filter) are
  * covered byte-surgically in Hdf5ForeignSpec.
  */
object GoldenHdf5 {

  /** Pinned product input: 2025-01-01T00:00Z, radar W missing, a 24×20 grid
    * mixing NaN (nodata) cells with values exercising the 2-decimal rounding.
    */
  val meta: Odim.OdimMeta = Odim.chMeta(1735689600L, Set('W'))
  def grid: Array[Array[Double]] = Array.tabulate(24, 20) { (x, y) =>
    if ((x + y) % 7 == 0) Double.NaN else x * 0.37 + y * 0.113
  }

  def writeTo(path: String): Unit = Odim.write(path, grid, meta)

  def sha256(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** SHA-256 of the committed src/test/resources/golden_qpe.h5. Regenerate
    * with `Test/runMain graft.GenGoldenHdf5 src/test/resources/golden_qpe.h5`
    * ONLY for an intentional format change, and say why in the commit.
    * (Deflate bytes come from the JRE's zlib: stable in this container;
    * a different zlib build would need one regeneration, which the
    * reader-side assertions below would survive unchanged.)
    */
  val GoldenSha = "38c429abd3c1ed166ea4917cc1926b7c9410805c5871453cb8bda3d9ae3c1c68"
}

/** One-shot fixture generator (test scope). */
object GenGoldenHdf5 {
  def main(args: Array[String]): Unit = GoldenHdf5.writeTo(args(0))
}

class GoldenHdf5Spec extends AnyFunSuite {

  private def fixtureBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/golden_qpe.h5")
    assert(in != null, "golden_qpe.h5 missing from test resources")
    try in.readAllBytes() finally in.close()
  }

  test("writer reproduces the committed fixture bit-for-bit") {
    val tmp = Files.createTempFile("graft-golden", ".h5")
    try {
      GoldenHdf5.writeTo(tmp.toString)
      val fresh = Files.readAllBytes(tmp)
      assert(GoldenHdf5.sha256(fresh) == GoldenHdf5.GoldenSha,
        "Odim.write output changed — if intentional, regenerate the fixture " +
          "and update GoldenSha (see GoldenHdf5 scaladoc)")
      assert(java.util.Arrays.equals(fresh, fixtureBytes),
        "fixture on disk does not match GoldenSha's writer output")
    } finally Files.deleteIfExists(tmp)
  }

  test("reader parses the committed fixture field-for-field") {
    val tmp = Files.createTempFile("graft-golden-read", ".h5")
    try {
      Files.write(tmp, fixtureBytes)
      val (g, fields) = Odim.read(tmp.toString)
      // grid: writer rounds to 2 decimals and narrows to float32
      assert(g.length == 24 && g(0).length == 20)
      val want = GoldenHdf5.grid
      for (x <- 0 until 24; y <- 0 until 20) {
        if (want(x)(y).isNaN) assert(g(x)(y).isNaN, s"($x,$y) not nodata")
        else {
          val rounded = math.round(want(x)(y) * 100.0) / 100.0
          assert(math.abs(g(x)(y) - rounded) < 1e-6, s"($x,$y): ${g(x)(y)}")
        }
      }
      assert(fields("convention") == "ODIM_H5/V2_3")
      assert(fields("object") == "IMAGE")
      assert(fields("version") == "H5rad 2.3")
      assert(fields("source") == "ORG:215, CTY:644, CMT:MeteoSwiss (Switzerland)")
      assert(fields("projdef").startsWith("+proj=somerc"))
      assert(fields("startEpochS") == "1735689300")
      assert(fields("endEpochS") == "1735689600")
      assert(fields("timeRef") == "end")
      assert(fields("radar") == "ADLP-")       // W missing
      assert(fields("nodes") ==
        "WMO:06661,WMO:06699,WMO:06768,WMO:06726") // W's node dropped
      assert(fields("product") == "RR")
      assert(fields("nx") == "24" && fields("ny") == "20")
    } finally Files.deleteIfExists(tmp)
  }
}
