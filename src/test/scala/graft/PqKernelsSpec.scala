package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity
import graft.plans.PqEncode

class PqKernelsSpec extends SparkSpec {

  private val m = 2
  private val sub = 2
  // codewords engineered for a distance TIE in subspace 0 (cw1 and cw2
  // equidistant from (1,1)) — first codeword must win in both forms
  private val cb: Array[Array[Double]] = Array(
    Array(0.0, 0.0, 0.0, 0.0),
    Array(2.0, 2.0, 1.0, 0.5),
    Array(-1.0, 3.0, 0.25, 0.125))

  private def vecs = df("vec_id BIGINT, v ARRAY<DOUBLE>", Seq(
    R(1L, Seq(1.0, 1.0, 0.3, 0.2)),     // subspace-0 tie between cw 1 and 2
    R(2L, Seq(2.0, 2.0, 1.0, 0.5)),     // exact codeword hit
    R(3L, Seq(-0.5, 0.7, Double.NaN, 0.1)), // NaN distance ranks greatest
    R(4L, Seq(0.1, -0.2, 0.9, 1.7))))

  test("PqEncode/PqAdcLut are bit-identical to the composed expression forms") {
    val kc = vecs.select(col("vec_id"),
      PqEncode.pqEncode(col("v"), cb, m).as("codes"),
      PqEncode.pqAdcLut(col("v"), cb, m).as("lut"))
    val cc = vecs.select(col("vec_id"),
      Similarity.pqCodesComposed(col("v"), cb, m, sub).as("codes"),
      Similarity.pqLutComposed(col("v"), cb, m, sub).as("lut"))
    def read(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      r.getLong(0) -> (r.getSeq[Int](1).toList,
        r.getSeq[Any](2).map(_.asInstanceOf[scala.collection.Seq[Double]]
          .map(java.lang.Double.doubleToRawLongBits).toList).toList)
    }.toMap
    val k = read(kc.collect())
    val c = read(cc.collect())
    assert(k == c)
    // and the tie really exercises first-wins: vector 1's subspace-0 code
    // is codeword 1, not 2
    assert(k(1L)._1.head == 1)
  }

  test("PqEncode float input, null semantics, and codebook validation") {
    val f = df("vec_id BIGINT, v ARRAY<FLOAT>", Seq(
      R(1L, Seq(1.0f, 1.0f, 0.3f, 0.2f)),
      R(2L, null),
      R(3L, Seq(1.0f, 2.0f)),            // wrong length
      R(4L, Seq(1.0f, null, 0.3f, 0.2f)))) // null element
    val out = f.select(col("vec_id"),
        PqEncode.pqEncode(col("v"), cb, m).as("codes"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
    intercept[IllegalArgumentException] {
      PqEncode.pqEncode(col("v"), Array(Array(1.0, 2.0, 3.0)), 2)
    }
  }
}
