package graft

import org.apache.spark.sql.functions._

import graft.ml.RF
import graft.llm.Similarity

/** The RNG-gated fits (m1/m9 RF, simsearch_ivf_kmeans) can never have a
  * DuckDB oracle — MLlib's sampling is not SQL-expressible — but a fixed
  * seed makes each fit deterministic within a Spark version. These specs
  * pin that: two same-seed fits must produce BIT-identical outputs (raw
  * double bits, not epsilon), upgrading the rows-only gate to
  * "reproducible rows-only". A failure here means a nondeterminism crept
  * into the fit path (unseeded RNG, order-dependent reduction), which the
  * rows-only driver check would never catch.
  */
class SeededDeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rawBits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("RF.fit with a fixed seed is bit-identical across fits (predictions and BC slope)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_quantity").as("f1"), col("l_discount").as("f2"),
              col("l_tax").as("f3"), (col("l_extendedprice") / 1000.0).as("label"))
    val train = li.filter(pmod(col("l_orderkey"), lit(10)) === 0)
    def fitPredict(): (Double, Array[(Long, Long)]) = {
      val m = RF.fit(train, Seq("f1", "f2", "f3"), "label",
        numTrees = 3, maxDepth = 6, seed = 42L)
      val preds = RF.predict(m, li)
        .select((col("l_orderkey") * 100 + col("l_linenumber")).cast("long"), col("prediction_bc"))
        .collect()
        .map(r => (r.getLong(0), rawBits(r.getDouble(1))))
        .sortBy(_._1)
      (m.bcSlope, preds)
    }
    val (slope1, p1) = fitPredict()
    val (slope2, p2) = fitPredict()
    assert(rawBits(slope1) == rawBits(slope2),
      s"BC slope drifted between same-seed fits: $slope1 vs $slope2")
    assert(p1.length == p2.length && p1.nonEmpty)
    val mismatches = p1.zip(p2).filter { case (a, b) => a != b }
    assert(mismatches.isEmpty,
      s"${mismatches.length}/${p1.length} predictions differ between same-seed fits; " +
        s"first: ${mismatches.headOption}")
  }

  test("KMeans IVF quantizer with a fixed seed is bit-identical across fits (centroids and cells)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def fit(): (Array[Array[Long]], Array[(Long, Int)]) = {
      val (assigned, model) = Similarity.kmeansIndex(emb, "vec_id", "embedding", nlist = 4, seed = 42L)
      val centers = model.clusterCenters.map(_.toArray.map(rawBits))
      val cells = assigned.select(col("vec_id").cast("long"), col("ivf_cell").cast("int"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      (centers, cells)
    }
    val (c1, a1) = fit()
    val (c2, a2) = fit()
    assert(c1.length == c2.length)
    c1.zip(c2).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x.sameElements(y), s"centroid $i drifted between same-seed fits")
    }
    assert(a1.nonEmpty && a1.sameElements(a2),
      "cell assignments differ between same-seed KMeans fits")
  }
}
