package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.llm.Dedup
import graft.streaming.RT

/** End-to-end streaming dedup over a RATE-LIMITED FILE SOURCE — the ingest
  * shape a production corpus pipeline actually runs (files land, one per
  * micro-batch), with the BATCH dedup of the same corpus as the parity
  * oracle: replaying the stream must converge to exactly the batch
  * survivor set. This is the streaming analogue of the CdcParitySpec
  * contract applied to [[RT.streamingDedup]].
  */
class StreamingDedupE2ESpec extends SparkSpec {

  private def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("file-source streaming dedup converges to the batch exactByDigest survivors") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sdedup").toString
    // arrival order == doc_id order; duplicates both within and across files
    val files = Seq(
      Seq((1L, t(0), "alpha"), (2L, t(1), "beta"), (3L, t(2), "alpha")),
      Seq((4L, t(10), "beta"), (5L, t(11), "gamma"), (6L, t(12), "gamma")),
      Seq((7L, t(20), "alpha"), (8L, t(21), "delta")))
    files.foreach { b =>
      b.toDF("doc_id", "ts", "text").coalesce(1)
        .write.mode("append").parquet(dir)
      Thread.sleep(1100) // distinct mtimes: the file source replays oldest-first
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // rate limit: one file per micro-batch
      .parquet(dir)
    val q = RT.streamingDedup(stream, "ts", "text", watermark = "1 hour")
      .writeStream.format("memory").queryName("sdedup_e2e")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sdedup_e2e")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val batchDf = files.flatten.toDF("doc_id", "ts", "text")
    val batch = Dedup.exactByDigest(batchDf, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    // parity 1: the surviving id set equals the batch winners (first
    // arrival == min id here, so the representative matches too)
    assert(streamed.map(_._1).toSet == batch,
      s"streamed ${streamed.toSeq.sortBy(_._1)} vs batch $batch")
    // parity 2: exactly one survivor per distinct content
    assert(streamed.map(_._2).toSet == Set("alpha", "beta", "gamma", "delta"))
    assert(streamed.length == 4)
    // (dropDuplicatesWithinWatermark rejects batch frames outright, so the
    // anomalyStream same-function-on-batch trick doesn't apply here; the
    // batch reference is exactByDigest above)
  }
}
