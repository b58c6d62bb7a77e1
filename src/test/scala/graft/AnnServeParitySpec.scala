package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.Similarity
import graft.streaming.RT

/** Streaming ANN serve-and-grow parity: a file-source stream drives
  * [[RT.annServeBatch]] against a persisted IVF layout while a
  * driver-side sequential fold of [[Similarity.probeIndex]] +
  * [[Similarity.appendToIndex]] over the same batches — on an
  * identically-built twin index — is the oracle. Agreement proves the
  * serve-before-append ordering and that appended vectors are
  * retrievable by later batches.
  */
class AnnServeParitySpec extends SparkSpec {

  private val dim = 8

  private def tmp(name: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"), name)
    val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    f.getAbsolutePath
  }

  private def vec(cluster: Int, i: Int): Array[Float] =
    Array.tabulate(dim)(d =>
      (math.sin(cluster * 2.1 + d) * 3.0 + math.sin(i * 1.7 + d * 0.9) * 0.1).toFloat)

  test("streamed serve agrees with the sequential probe/append fold; appends become retrievable") {
    import spark.implicits._
    // corpus: 4 clusters × 25 vectors, ids 0..99
    val corpus = (0 until 100).map(i => (i.toLong, vec(i % 4, i)))
      .toDF("vec_id", "embedding")
    val (assigned, model) = Similarity.kmeansIndex(corpus, "vec_id",
      "embedding", nlist = 4)
    val idxStream = tmp("graft_ann_serve_idx")
    val idxFold = tmp("graft_ann_fold_idx")
    Similarity.saveIndex(assigned, model, idxStream)
    Similarity.saveIndex(assigned, model, idxFold)

    // batch 1: new vectors 200/201 (cluster-2 flavored) + 202 (cluster 0);
    // batch 2: query 300 carries the IDENTICAL embedding to 200 — cosine
    //          exactly 1.0, so after the append it MUST rank 200 first
    //          (no corpus vector is parallel to it)
    val batches = Seq(
      Seq((200L, vec(2, 1000)), (201L, vec(2, 2000)), (202L, vec(0, 3000))),
      Seq((300L, vec(2, 1000)), (301L, vec(1, 4000))))
    val srcDir = Files.createTempDirectory("graft_ann_serve_src").toString
    batches.foreach { b =>
      b.toDF("vec_id", "embedding").coalesce(1).write.mode("append").parquet(srcDir)
      Thread.sleep(1100) // distinct mtimes: oldest-first, one file per trigger
    }

    val outPath = tmp("graft_ann_serve_out")
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch(RT.annServeBatch(idxStream, "vec_id", "embedding",
        dim, k = 3, nprobe = 2, outPath, growIndex = true))
      .option("checkpointLocation", tmp("graft_ann_serve_ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(outPath).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    // driver-side fold on the twin index
    val expected = scala.collection.mutable.Map
      .empty[(Long, Int), (Long, Double)]
    batches.foreach { b =>
      val bdf = b.toDF("vec_id", "embedding")
      Similarity.probeIndex(spark, idxFold, bdf, "vec_id", "embedding",
        dim, k = 3, nprobe = 2).collect().foreach { r =>
        expected((r.getLong(0), r.getInt(1))) = (r.getLong(2), r.getDouble(3))
      }
      Similarity.appendToIndex(spark, idxFold, bdf, "vec_id", "embedding", dim)
    }
    assert(streamed == expected.toMap,
      s"streamed ${streamed.toSeq.sortBy(_._1)}\nvs fold ${expected.toSeq.sortBy(_._1)}")

    // growth is visible: query 300's embedding IS vector 200's, so the
    // appended 200 must come back rank 1 at cosine 1.0
    assert(streamed((300L, 1)) == ((200L, 1.0)),
      s"batch-2 query did not retrieve the batch-1 append first: ${streamed.get((300L, 1))}")
    // the serve-before-append ordering: a batch-1 query must NOT retrieve
    // its own batch's vectors
    val got200 = (1 to 3).flatMap(r => streamed.get((200L, r))).map(_._1)
    assert(!got200.exists(v => v >= 200L),
      s"batch-1 query retrieved its own batch: $got200")

    // CRASH-replay idempotence: a direct batch applied once, marker
    // deleted, re-invoked with the same batchId — audit log and index
    // cells must come out bit-identical (the probe excludes the batch's
    // own ids, the grow step anti-joins against persisted ids)
    def stateOf(path: String): Seq[String] =
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    val markerP = new org.apache.hadoop.fs.Path(s"$idxStream/_serve_batch")
    val mfs = markerP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lastApplied = {
      val in = mfs.open(markerP)
      try new String(in.readAllBytes()).trim.toLong finally in.close()
    }
    val novel = Seq((400L, vec(1, 77))).toDF("vec_id", "embedding")
    val fn = RT.annServeBatch(idxStream, "vec_id", "embedding", dim,
      k = 3, nprobe = 2, outPath, growIndex = true)
    fn(novel, lastApplied + 1)
    val preOut = stateOf(outPath)
    val preCells = stateOf(s"$idxStream/cells")
    mfs.delete(markerP, false)
    fn(novel, lastApplied + 1)
    assert(stateOf(outPath) == preOut,
      "crash-replay duplicated or altered serve results")
    assert(stateOf(s"$idxStream/cells") == preCells,
      "crash-replay duplicated vectors in the index")
  }
}
