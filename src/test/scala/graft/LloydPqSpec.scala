package graft

import org.apache.spark.sql.functions._

import graft.llm.{Curation, Similarity, TextAnalysis}

/** Unit edges for the round-9 RNG-free training machinery: Lloyd
  * assignment, learned PQ codebooks, DSIR weighting, the Zipf fit — and
  * the streaming-compatibility of the map-side assignment (the vector
  * ingest shape).
  */
class LloydPqSpec extends SparkSpec {

  private def emb = {
    import spark.implicits._
    (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def seeds = emb.filter(col("vec_id") < 4)
    .select(col("vec_id").as("cell"), col("embedding").as("cv"))

  test("lloydAssign with iters=1 IS assignCells on the seed centroids") {
    val a = Similarity.lloydAssign(emb, "vec_id", "embedding",
        seeds, "cell", "cv", dim = 8, iters = 1)
      .select("vec_id", "ivf_cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Similarity.assignCells(emb, "vec_id", "embedding",
        seeds, "cell", "cv", dim = 8)
      .select("vec_id", "ivf_cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("lloydAssign round 2 re-assigns against recomputed decimal centroids") {
    val a1 = Similarity.lloydAssign(emb, "vec_id", "embedding",
      seeds, "cell", "cv", dim = 8, iters = 1)
    val cent = Similarity.cellCentroids(a1, "ivf_cell", "embedding")
      .select(col("ivf_cell").as("cell"), col("cvec").as("cv"))
    val byHand = Similarity.assignCells(emb, "vec_id", "embedding",
        cent, "cell", "cv", dim = 8)
      .select("vec_id", "ivf_cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = Similarity.lloydAssign(emb, "vec_id", "embedding",
        seeds, "cell", "cv", dim = 8, iters = 2)
      .select("vec_id", "ivf_cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a2 == byHand)
  }

  test("pqLearnCodebook iters=0 returns exactly the seed codebook") {
    val cb = Similarity.pqLearnCodebook(emb, "vec_id", "embedding",
      dim = 8, m = 2, ks = 4, iters = 0)
    val got = cb.orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toSeq)
    val want = emb.filter(col("vec_id") < 4).orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("pqLearnCodebook: a learned round moves codewords, ks rows survive") {
    val cb0 = Similarity.pqLearnCodebook(emb, "vec_id", "embedding",
      dim = 8, m = 2, ks = 4, iters = 0).collect()
    val cb1 = Similarity.pqLearnCodebook(emb, "vec_id", "embedding",
      dim = 8, m = 2, ks = 4, iters = 1).collect()
    assert(cb1.length == 4)
    val moved = cb0.map(_.getSeq[Double](1)).zip(cb1.map(_.getSeq[Double](1)))
      .exists { case (a, b) => a != b }
    assert(moved, "one Lloyd round on non-degenerate data must move codewords")
  }

  test("dsirWeights: featureless docs keep weight 0 and are not selected") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta gamma alpha beta"),
      (2L, "x"), // single token: no bigram features
      (3L, "totally different words here")).toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta gamma alpha beta delta")).toDF("doc_id", "text")
    val out = Curation.dsirWeights(corpus, target, "doc_id", "text",
        n = 2, nBuckets = 100)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out(2L) == ((0L, 0.0, false)), s"featureless doc: ${out(2L)}")
    assert(out(1L)._3, "target-overlapping doc must be selected")
    assert(!out(3L)._3, "disjoint doc must not be selected")
  }

  test("zipfFit reproduces the closed-form OLS on a constructed corpus") {
    import spark.implicits._
    // token frequencies 8, 4, 2, 1 → ranks 1..4
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val out = graft.llm.TextAnalysis.zipfFit(
      Seq(Tuple1(text)).toDF("text"), "text", topN = 10).collect()(0)
    val xs = Seq(1.0, 2.0, 3.0, 4.0).map(math.log)
    val ys = Seq(8.0, 4.0, 2.0, 1.0).map(math.log)
    val n = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(out.getLong(0) == 4)
    assert(math.abs(out.getDouble(1) - slope) < 1e-5,
      s"slope ${out.getDouble(1)} vs closed-form $slope")
  }

  test("ivfTopKFiltered keeps the index layout and honors the fewer-than-k shape") {
    import spark.implicits._
    // two well-separated clusters as cells (label 0 on the x-axis, label 1
    // on the y-axis); the query sits in cluster 0
    val rows = (0 until 20).map { i =>
      val base =
        if (i % 2 == 0) Array(10f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
        else Array(0f, 10f, 0f, 0f, 0f, 0f, 0f, 0f)
      (i.toLong,
        base.zipWithIndex.map { case (x, d) => x + 0.01f * ((i + d) % 3) },
        (i % 2).toLong)
    }.toDF("vec_id", "embedding", "label")
    val q = rows.filter(col("vec_id") === 0)
    // layout invariance: with nprobe=1 the query probes ITS OWN cell
    // (centroids from the FULL corpus), whose members all fail the
    // label=1 predicate → zero results. A buggy filter-before-centroids
    // implementation would see only cluster 1, probe it, and return k hits.
    val strict = Similarity.ivfTopKFiltered(rows, q, "vec_id", "embedding",
      "label", dim = 8, k = 3, nprobe = 1, candidateFilter = col("label") === 1)
    assert(strict.count() == 0,
      "a fully-filtered probed cell must yield nothing — the predicate " +
        "must not move centroids or probe sets")
    // widening the probe reaches the surviving cell: hits exist and ALL
    // satisfy the predicate
    val wide = Similarity.ivfTopKFiltered(rows, q, "vec_id", "embedding",
        "label", dim = 8, k = 3, nprobe = 2, candidateFilter = col("label") === 1)
      .collect()
    assert(wide.length == 3 && wide.forall(_.getLong(2) % 2 == 1))
    // a predicate leaving fewer than k survivors returns fewer than k rows
    val tiny = Similarity.ivfTopKFiltered(rows, q, "vec_id", "embedding",
        "label", dim = 8, k = 3, nprobe = 2, candidateFilter = col("vec_id") === 1)
      .collect()
    assert(tiny.length == 1 && tiny(0).getLong(2) == 1L)
  }

  test("appendToIndex: new vectors land in the model's own cells, old cells untouched") {
    import spark.implicits._
    import org.apache.spark.ml.functions.array_to_vector
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    val (assigned, model) = Similarity.kmeansIndex(emb, "vec_id", "embedding",
      nlist = 4)
    Similarity.saveIndex(assigned, model, dir)
    val before = spark.read.parquet(s"$dir/cells").count()
    val newVecs = (1000 until 1010).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin((i - 1000) * 0.9 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val asn = Similarity.appendToIndex(spark, dir, newVecs,
      "vec_id", "embedding", dim = 8)
    val got = asn.select("vec_id", "ivf_cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // parity with the fitted model's OWN predictions (the layout metric)
    val pred = model.transform(
        newVecs.withColumn("__features", array_to_vector(col("embedding"))))
      .select(col("vec_id"), col("__cluster").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == pred, s"$got vs model.transform $pred")
    val after = spark.read.parquet(s"$dir/cells")
    assert(after.count() == before + 10)
    assert(after.filter(col("vec_id") < 1000).count() == before,
      "existing rows must be untouched by the append")
    // schema guard: a frame with an extra column must be REJECTED, not
    // appended — mixed parquet schemas in the index read back
    // footer-dependent (columns silently dropped or nulled)
    val widened = newVecs.withColumn("extra", lit(1))
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToIndex(spark, dir, widened, "vec_id", "embedding",
        dim = 8)
    }
    assert(e.getMessage.contains("does not match the saved index"))
    assert(spark.read.parquet(s"$dir/cells").count() == before + 10,
      "rejected append must not write")
  }

  test("assignCells works UNCHANGED on a streaming frame (vector ingest)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val stream = input.toDS().toDF("vec_id", "embedding")
    // assignCells is one map-side projection (centroids baked as
    // literals), so the same call compiles into a streaming plan
    val q = Similarity.assignCells(stream, "vec_id", "embedding",
        seeds, "cell", "cv", dim = 8)
      .writeStream.format("memory").queryName("stream_asn")
      .outputMode("append").start()
    try {
      input.addData((100L, Array.tabulate(8)(d => math.sin(100 * 0.7 + d).toFloat)))
      input.addData((101L, Array.tabulate(8)(d => math.sin(101 * 0.7 + d).toFloat)))
      q.processAllAvailable()
      val streamed = spark.table("stream_asn").collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      val batch = Similarity.assignCells(
          Seq((100L, Array.tabulate(8)(d => math.sin(100 * 0.7 + d).toFloat)),
            (101L, Array.tabulate(8)(d => math.sin(101 * 0.7 + d).toFloat)))
            .toDF("vec_id", "embedding"),
          "vec_id", "embedding", seeds, "cell", "cv", dim = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(streamed == batch, s"$streamed vs $batch")
    } finally q.stop()
  }
}
