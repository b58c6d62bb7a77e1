package graft

import org.apache.spark.sql.functions._

import graft.plans.NfcNormalize
import graft.llm.TextAnalysis

/** The native [[graft.plans.NfcNormalize]] expression and the
  * [[TextAnalysis.normalizeText]] pipeline on top of it: NFC recomposition
  * must match `java.text.Normalizer` exactly (which is what DuckDB's
  * `nfc_normalize` also implements), with NULL passthrough and the
  * already-normalized identity fast path. All non-ASCII content is built
  * from explicit \\u escapes so source-encoding normalization can never
  * silently rewrite what the test feeds the engine.
  */
class NfcNormalizeSpec extends SparkSpec {

  // Café naïve Ångström  (decomposed)
  private val decomposed = "Cafe\u0301 nai\u0308ve A\u030Angstro\u0308m"
  // Café naïve Ångström       (precomposed NFC)
  private val composed = "Caf\u00E9 na\u00EFve \u00C5ngstr\u00F6m"

  test("recomposes decomposed sequences; identity on NFC input; null passthrough") {
    assert(decomposed != composed) // the fixture itself must be denormalized
    val d = df("s STRING", Seq(R(decomposed), R(composed), R("plain ascii"), R(null)))
    val out = d.select(NfcNormalize.nfcNormalize(col("s")).as("n")).collect()
    assert(out(0).getString(0) == composed)
    assert(out(1).getString(0) == composed)
    assert(out(2).getString(0) == "plain ascii")
    assert(out(3).isNullAt(0))
  }

  test("matches java.text.Normalizer on random combining-mark soup; kernel agrees with plan") {
    val rnd = new scala.util.Random(11)
    // letters + combining acute/diaeresis/ring: random interleavings hit
    // compose, already-composed, and bare-mark edge cases
    val pool = "aeozAEOZ\u0301\u0308\u030A\u00E9\u00C5"
    val rows = (1 to 100).map(_ =>
      R(Seq.fill(12)(pool(rnd.nextInt(pool.length))).mkString))
    val d = df("s STRING", rows)
    val native = d.select(NfcNormalize.nfcNormalize(col("s"))).collect().map(_.getString(0))
    val expected = d.collect().map(r =>
      java.text.Normalizer.normalize(r.getString(0), java.text.Normalizer.Form.NFC))
    assert(native.toSeq == expected.toSeq)
    // the static kernel (what generated code calls) agrees with the plan path
    rows.map(_.getString(0)).zip(native).foreach { case (in, out) =>
      assert(NfcNormalize.nfc(
        org.apache.spark.unsafe.types.UTF8String.fromString(in)).toString == out)
    }
  }

  test("usable as a SQL function (the GraftExtensions registration shape)") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "scala_udf")
    val out = spark.sql("SELECT nfc_normalize('Cafe\u0301') AS n")
      .collect().head.getString(0)
    assert(out == "Caf\u00E9")
  }

  test("normalizeText: NFC + lowercase + whitespace collapse + trim") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "  Cafe\u0301\t\tDU  Monde \n"),
      R(2L, "already clean"),
      R(3L, "")))
    val out = TextAnalysis.normalizeText(d, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq(
      ("caf\u00E9 du monde", 13), ("already clean", 13), ("", 0)))
  }
}
