package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ml.Pca
import graft.streaming.RT

/** Streaming PCA-model maintenance: the maintained Gram after N
  * micro-batches must equal the batch Gram of the union EXACTLY (the
  * decimal fold is associative), so the principal component computed from
  * the maintained state matches the batch-trained one bit for bit —
  * model freshness without ever rescanning the corpus.
  */
class GramMaintainSpec extends SparkSpec {

  private val dim = 6

  private def tmp(name: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"), name)
    val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    f.getAbsolutePath
  }

  test("maintained Gram == batch Gram exactly; eigenvector matches bit for bit") {
    import spark.implicits._
    val mk = (lo: Int, hi: Int) => (lo until hi).map(i =>
      (i.toLong, Array.tabulate(dim)(d => (math.sin(i * 1.3 + d * 0.7) * 2.0).toFloat)))
    val batches = Seq(mk(0, 40), mk(40, 70), mk(70, 100))

    val srcDir = Files.createTempDirectory("graft_gram_src").toString
    batches.foreach { b =>
      b.toDF("vec_id", "embedding").coalesce(1).write.mode("append").parquet(srcDir)
      Thread.sleep(1100)
    }
    val statePath = tmp("graft_gram_state")
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch(RT.gramMaintainBatch(statePath, "embedding", dim))
      .option("checkpointLocation", tmp("graft_gram_ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()

    val all = batches.flatten.toDF("vec_id", "embedding")
    val maintained = RT.readGramState(spark, statePath)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val direct = Pca.gram(all, "embedding", dim)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(maintained == direct,
      s"gram drift: ${maintained.toSeq.diff(direct.toSeq).take(3)}")

    val fromState = Pca.powerIteration(RT.readGramState(spark, statePath), dim, 8)
      .orderBy(col("comp")).collect().toSeq
    val fromBatch = Pca.powerIteration(Pca.gram(all, "embedding", dim), dim, 8)
      .orderBy(col("comp")).collect().toSeq
    assert(fromState == fromBatch)

    // replaying an already-applied batchId is a no-op (at-least-once guard)
    val before = RT.readGramState(spark, statePath).collect().toSet
    RT.gramMaintainBatch(statePath, "embedding", dim)(
      batches.last.toDF("vec_id", "embedding"), 2L)
    val after = RT.readGramState(spark, statePath).collect().toSet
    assert(before == after, "replayed batch mutated the state")
  }
}
