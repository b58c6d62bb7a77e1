package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.GraphAnnIndex
import graft.streaming.RT

/** Streaming serve-and-grow parity for the persisted HNSW layout: a
  * file-source stream drives [[RT.graphAnnServeBatch]] while a
  * driver-side sequential fold of [[GraphAnnIndex.probe]] +
  * [[GraphAnnIndex.append]] over the same batches — on an
  * identically-built twin index — is the oracle. Agreement proves the
  * serve-before-append ordering and that appended vectors are
  * searchable by later batches through the incrementally-rebuilt graph.
  */
class GraphAnnServeParitySpec extends SparkSpec {

  private val dim = 8
  private val (k, beam, rounds) = (3, 8, 3)

  private def tmp(name: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"), name)
    val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    f.getAbsolutePath
  }

  private def vec(cluster: Int, i: Int): Array[Float] =
    Array.tabulate(dim)(d =>
      (math.sin(cluster * 2.1 + d) * 3.0 + math.sin(i * 1.7 + d * 0.9) * 0.1).toFloat)

  test("streamed graph serve agrees with the sequential probe/append fold") {
    import spark.implicits._
    val corpus = (0 until 100).map(i => (i.toLong, vec(i % 4, i)))
      .toDF("vec_id", "embedding")
    val cents = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    val idxStream = tmp("graft_gann_serve_idx")
    val idxFold = tmp("graft_gann_fold_idx")
    GraphAnnIndex.save(spark, corpus, cents, "vec_id", "embedding",
      "cell", "cv", dim, m = 4, maxLevel = 1, path = idxStream)
    GraphAnnIndex.save(spark, corpus, cents, "vec_id", "embedding",
      "cell", "cv", dim, m = 4, maxLevel = 1, path = idxFold)

    // batch 2's query 300 carries batch 1's vector 200 exactly — after the
    // incremental append it MUST come back rank 1 at cosine 1.0
    val batches = Seq(
      Seq((200L, vec(2, 1000)), (201L, vec(2, 2000)), (202L, vec(0, 3000))),
      Seq((300L, vec(2, 1000)), (301L, vec(1, 4000))))
    val srcDir = Files.createTempDirectory("graft_gann_serve_src").toString
    batches.foreach { b =>
      b.toDF("vec_id", "embedding").coalesce(1).write.mode("append").parquet(srcDir)
      Thread.sleep(1100)
    }

    val outPath = tmp("graft_gann_serve_out")
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch(RT.graphAnnServeBatch(idxStream, "vec_id", "embedding",
        k, beam, rounds, outPath, growIndex = true))
      .option("checkpointLocation", tmp("graft_gann_serve_ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(outPath).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    val expected = scala.collection.mutable.Map
      .empty[(Long, Int), (Long, Double)]
    batches.foreach { b =>
      val bdf = b.toDF("vec_id", "embedding")
      GraphAnnIndex.probe(spark, idxFold, bdf, "vec_id", "embedding",
        k, beam, rounds).collect().foreach { r =>
        expected((r.getLong(0), r.getInt(1))) = (r.getLong(2), r.getDouble(3))
      }
      GraphAnnIndex.append(spark, idxFold, bdf, "vec_id", "embedding")
    }
    assert(streamed == expected.toMap,
      s"streamed ${streamed.toSeq.sortBy(_._1)}\nvs fold ${expected.toSeq.sortBy(_._1)}")
    assert(streamed((300L, 1)) == ((200L, 1.0)),
      s"batch-2 query did not retrieve the batch-1 append first: ${streamed.get((300L, 1))}")
    // serve-before-append: a batch-1 query must not retrieve its own batch
    val got200 = (1 to k).flatMap(r => streamed.get((200L, r))).map(_._1)
    assert(!got200.exists(_ >= 200L),
      s"batch-1 query retrieved its own batch: $got200")

    // replaying an applied batchId is a no-op
    val n = spark.read.parquet(outPath).count()
    RT.graphAnnServeBatch(idxStream, "vec_id", "embedding", k, beam,
      rounds, outPath, growIndex = true)(
      batches.last.toDF("vec_id", "embedding"), 1L)
    assert(spark.read.parquet(outPath).count() == n, "replay duplicated rows")
  }
}
