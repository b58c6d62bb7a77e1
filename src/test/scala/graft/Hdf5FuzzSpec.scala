package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.qpe.Hdf5

/** Corrupt-input robustness for the HDF5 reader: truncated or bit-flipped
  * product files are a fact of life in real archives (partial transfers,
  * disk rot), and an ingest path must reject them as PARSE ERRORS — never a
  * JVM-level NegativeArraySizeException / OutOfMemoryError from an
  * unvalidated length-field allocation, and never an unbounded recursion on
  * a cyclic link. The original probe of this spec found six
  * NegativeArraySizeException crashes (signed-short attribute name sizes);
  * the reader now validates every file-derived length against the file
  * bound and every tree walk against a depth cap.
  */
class Hdf5FuzzSpec extends AnyFunSuite {

  private val golden: Array[Byte] = {
    val in = getClass.getResourceAsStream("/golden_qpe.h5")
    try in.readAllBytes() finally in.close()
  }

  /** Run the reader on `bytes`; None = parsed, Some(t) = threw t. Catches
    * Throwable, NOT Try/NonFatal: OutOfMemoryError and StackOverflowError
    * are exactly the fatal classes this spec exists to flag with position
    * context — Try would let them escape unlabeled.
    */
  private def attempt(bytes: Array[Byte]): Option[Throwable] = {
    val tmp = Files.createTempFile("graft-fuzz", ".h5")
    try {
      Files.write(tmp, bytes)
      try { Hdf5.read(tmp.toString); None }
      catch { case t: Throwable => Some(t) }
    } finally Files.deleteIfExists(tmp)
  }

  private def assertNonFatal(e: Throwable, ctx: String): Unit =
    assert(!e.isInstanceOf[NegativeArraySizeException] &&
           !e.isInstanceOf[OutOfMemoryError] &&
           !e.isInstanceOf[StackOverflowError],
      s"$ctx: fatal ${e.getClass.getName}: ${e.getMessage}")

  test("truncated files fail as parse errors, never allocation blowups") {
    for (n <- 8 until golden.length by 23)
      attempt(golden.take(n)).foreach(assertNonFatal(_, s"truncation at $n bytes"))
  }

  test("single-bit corruptions fail as parse errors, never allocation blowups") {
    // the six positions are the attribute-name-size high bytes where the
    // original probe crashed with NegativeArraySizeException — kept as
    // explicit regression anchors alongside the strided sweep
    val anchors = Seq(2470, 2574, 2678, 4550, 4654, 6422)
    val positions = (0 until golden.length by 7) ++ anchors
    for (p <- positions; bit <- Seq(0x01, 0x80)) {
      val b = golden.clone()
      b(p) = (b(p) ^ bit).toByte
      attempt(b).foreach(assertNonFatal(_, s"bit $bit flipped at byte $p"))
    }
  }
}
