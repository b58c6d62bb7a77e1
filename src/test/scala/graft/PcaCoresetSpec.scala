package graft

import org.apache.spark.sql.functions._

import graft.ml.Pca
import graft.llm.Coreset

/** Numeric contracts for the round-11 embedding-selection operators:
  * power-iteration PCA recovers a planted dominant direction, and greedy
  * k-center covers well-separated clusters one-per-cluster.
  */
class PcaCoresetSpec extends SparkSpec {

  private val dim = 8

  test("powerIteration recovers a planted dominant direction, unit-norm, sign-fixed") {
    import spark.implicits._
    // planted direction u (unnormalized); rows are t·u plus a small
    // deterministic off-direction wiggle, so the top component is u
    val u = Array.tabulate(dim)(d => math.cos(d * 0.9) + 1.5)
    val rows = (0 until 200).map { i =>
      val t = (i % 17) - 8.0 // zero-mean-ish spread along u
      (i.toLong, Array.tabulate(dim)(d =>
        (t * u(d) + math.sin(i * 2.3 + d * 1.7) * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Pca.topComponent(rows, "embedding", dim, iters = 12)
      .orderBy(col("comp")).collect()
    assert(out.length == dim)
    val v = out.map(_.getDouble(1))
    val lambda = out.head.getDouble(2)
    // unit norm (up to the 6-dp output rounding)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-4, s"norm ${v.map(x => x * x).sum}")
    // alignment with the planted direction
    val un = math.sqrt(u.map(x => x * x).sum)
    val cos = v.zip(u).map { case (a, b) => a * b / un }.sum
    assert(math.abs(cos) > 0.999, s"|cos(v,u)| = ${math.abs(cos)}")
    // sign convention: the largest-|loading| component is positive
    val maxAbs = v.maxBy(math.abs)
    assert(maxAbs > 0, s"sign convention violated: $maxAbs")
    // lambda is the captured variance along u — strictly positive and
    // large against the off-direction noise
    assert(lambda > 100.0, s"lambda = $lambda")
  }

  test("powerIteration is invariant to input partitioning") {
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(dim)(d => math.sin(i * 1.1 + d * 0.7).toFloat))
    }
    val a = Pca.topComponent(rows.toDF("vec_id", "embedding").repartition(7),
      "embedding", dim, iters = 6).orderBy(col("comp")).collect().toSeq
    val b = Pca.topComponent(rows.toDF("vec_id", "embedding").repartition(3),
      "embedding", dim, iters = 6).orderBy(col("comp")).collect().toSeq
    assert(a == b)
  }

  test("projectAnomalies ranks planted off-component outliers first") {
    import spark.implicits._
    // 95 vectors on one line, 5 with MODERATE off-direction energy — small
    // enough that the line still dominates the variance (an off energy
    // rivaling the line's would steal the top component and invert the
    // ranking), large enough to own the reconstruction error
    val u = Array.tabulate(dim)(d => math.cos(d * 1.1) + 1.2)
    val rows = (0 until 100).map { i =>
      val t = (i % 9) - 4.0
      val off = if (i % 20 == 7) 3.0 else 0.0
      (i.toLong, Array.tabulate(dim)(d =>
        (t * u(d) + (if (d % 2 == 0) off else -off)).toFloat))
    }.toDF("vec_id", "embedding")
    val comps = graft.ml.Pca.topComponent(rows, "embedding", dim, iters = 10)
    val top = graft.ml.Pca.projectAnomalies(rows, "vec_id", "embedding",
      dim, comps, k = 5).orderBy(col("rank")).collect()
    assert(top.length == 5)
    assert(top.map(_.getLong(1) % 20).toSet == Set(7L),
      s"top anomalies ${top.map(_.getLong(1)).toSeq} are not the planted outliers")
    // errors non-increasing down the ranking
    val errs = top.map(_.getDouble(2))
    assert(errs.zip(errs.tail).forall { case (a, b) => a >= b })
  }

  test("topComponents: deflation recovers two planted orthogonal directions in variance order") {
    import spark.implicits._
    // two orthogonal planted directions; u1 carries ~3x the variance of u2
    val u1 = Array.tabulate(dim)(d => if (d % 2 == 0) 1.0 else 0.0)
    val u2 = Array.tabulate(dim)(d => if (d % 2 == 1) 1.0 else 0.0)
    val rows = (0 until 300).map { i =>
      val t1 = ((i % 13) - 6.0) * 3.0
      val t2 = (i % 7) - 3.0
      (i.toLong, Array.tabulate(dim)(d =>
        (t1 * u1(d) + t2 * u2(d) + math.sin(i * 2.9 + d) * 0.02).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Pca.topComponents(rows, "embedding", dim, nComponents = 2, iters = 14)
      .orderBy(col("pc"), col("comp")).collect()
    assert(out.length == 2 * dim)
    val v1 = out.filter(_.getInt(0) == 1).map(_.getDouble(2))
    val v2 = out.filter(_.getInt(0) == 2).map(_.getDouble(2))
    val l1 = out.find(_.getInt(0) == 1).get.getDouble(3)
    val l2 = out.find(_.getInt(0) == 2).get.getDouble(3)
    def cosTo(v: Array[Double], u: Array[Double]): Double = {
      val un = math.sqrt(u.map(x => x * x).sum)
      math.abs(v.zip(u).map { case (a, b) => a * b }.sum) / un
    }
    assert(cosTo(v1, u1) > 0.999, s"pc1 alignment ${cosTo(v1, u1)}")
    assert(cosTo(v2, u2) > 0.999, s"pc2 alignment ${cosTo(v2, u2)}")
    assert(l1 > l2 && l2 > 0, s"variance order: $l1 vs $l2")
    // the two loading vectors are (near-)orthogonal
    val dot12 = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot12) < 1e-3, s"components not orthogonal: $dot12")
  }

  test("kCenterSelect: seed is the max-norm point and clusters are covered one-per-cluster") {
    import spark.implicits._
    // 3 tight, well-separated clusters; cluster 2 carries the largest norms
    val centers = Seq(
      Array.fill(dim)(0.0), Array.tabulate(dim)(d => if (d == 0) 40.0 else 0.0),
      Array.tabulate(dim)(d => if (d == 1) 80.0 else 0.0))
    val rows = (0 until 90).map { i =>
      val c = i % 3
      (i.toLong, Array.tabulate(dim)(d =>
        (centers(c)(d) + math.sin(i * 3.7 + d) * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val sel = Coreset.kCenterSelect(rows, "vec_id", "embedding", dim, k = 3)
      .orderBy(col("sel_order")).collect()
    assert(sel.length == 3)
    // the seed has the corpus-max norm, so it lives in cluster 2
    assert(sel(0).getLong(1) % 3 == 2, s"seed ${sel(0).getLong(1)} not in the far cluster")
    assert(sel(0).isNullAt(2), "seed dist must be null")
    // farthest-point traversal must then pick the other two clusters
    assert(sel.map(_.getLong(1) % 3).toSet == Set(0L, 1L, 2L),
      s"clusters covered: ${sel.map(_.getLong(1) % 3).toSeq}")
    // recorded min-distances decrease (weakly) as coverage improves
    val d2 = sel(1).getDouble(2); val d3 = sel(2).getDouble(2)
    assert(d2 >= d3, s"k-center distances must be non-increasing: $d2 < $d3")
  }

  test("kCenterSelect never re-selects an id even under duplicate vectors") {
    import spark.implicits._
    val v = Array.tabulate(dim)(_.toFloat)
    val rows = Seq((1L, v), (2L, v), (3L, v), (4L, v))
      .toDF("vec_id", "embedding")
    val sel = Coreset.kCenterSelect(rows, "vec_id", "embedding", dim, k = 3)
      .collect().map(_.getLong(1)).toSeq
    assert(sel.distinct.size == 3, s"re-selected an id: $sel")
  }
}
