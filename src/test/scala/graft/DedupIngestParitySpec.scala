package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Dedup, DedupIndex}
import graft.streaming.RT

/** Streaming serve-and-grow parity for the persisted dedup index: a
  * rate-limited file source drives [[RT.dedupIngestBatch]] (probe each
  * micro-batch against everything accepted so far, append the
  * survivors), and a driver-side sequential fold of
  * [[Dedup.crossCorpusDedup]] over the same batches is the oracle —
  * the streamed audit log must agree flag-for-flag, which proves both
  * the probe-before-append ordering and that appends from earlier
  * batches are visible to later ones.
  */
class DedupIngestParitySpec extends SparkSpec {

  private def tmp(name: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"), name)
    val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    f.getAbsolutePath
  }

  test("streamed ingest against the index agrees with the sequential batch fold") {
    import spark.implicits._
    val idxPath = tmp("graft_dedup_ingest_idx")
    val outPath = tmp("graft_dedup_ingest_out")
    val srcDir = Files.createTempDirectory("graft_dedup_ingest_src").toString

    val seed = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different content with no overlap whatsoever here today"))
      .toDF("doc_id", "text")
    DedupIndex.save(seed, "doc_id", "text", idxPath)

    // batch 1: 10 near-dups seed doc 1 (flag decided by banding — the
    //          fold is the oracle either way), 11 is novel (kept+appended);
    // batch 2: 20 EXACT-dups the BATCH-1 SURVIVOR 11 — an exact dup has
    //          identical signatures, so banding provably hits; flagging it
    //          proves the append happened and is visible; 21 novel;
    // batch 3: 30 exact-dups seed doc 2, 31 exact-dups batch-2 survivor 21
    val batches = Seq(
      Seq((10L, "the quick brown fox jumps over the lazy dog near the river bend"),
          (11L, "a wholly new document about spark shuffles and parquet row groups")),
      Seq((20L, "a wholly new document about spark shuffles and parquet row groups"),
          (21L, "yet another novel text mentioning catalyst rules and codegen spans")),
      Seq((30L, "completely different content with no overlap whatsoever here today"),
          (31L, "yet another novel text mentioning catalyst rules and codegen spans")))
    batches.foreach { b =>
      b.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
      Thread.sleep(1100) // distinct mtimes: oldest-first replay, one per trigger
    }

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch(RT.dedupIngestBatch(idxPath, "doc_id", "text", 0.5, outPath))
      .option("checkpointLocation", tmp("graft_dedup_ingest_ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(outPath).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)).map(_.toString.toLong),
        r.getBoolean(3))).toMap

    // driver-side fold: accepted starts at the seed; each batch is probed
    // against accepted (never against itself), survivors join accepted
    var accepted: DataFrame = seed
    val expected = scala.collection.mutable.Map.empty[Long, (Option[Long], Boolean)]
    batches.foreach { b =>
      val bdf = b.toDF("doc_id", "text")
      val flags = Dedup.crossCorpusDedup(bdf, accepted, "doc_id", "text")
        .collect()
      flags.foreach { r =>
        expected(r.getLong(0)) =
          (Option(r.get(1)).map(_.toString.toLong), r.getBoolean(3))
      }
      val keptIds = flags.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
      accepted = accepted.unionByName(
        bdf.filter(col("doc_id").isin(keptIds.toSeq: _*)))
    }
    assert(streamed == expected.toMap,
      s"streamed $streamed\nvs fold ${expected.toMap}")
    // the load-bearing cross-batch cases (exact dups: banding provably hits)
    assert(streamed(20L) == ((Some(11L), false))) // dup of a batch-1 survivor
    assert(streamed(31L) == ((Some(21L), false))) // dup of a batch-2 survivor
    assert(streamed(30L) == ((Some(2L), false)))  // dup of the seed
    assert(streamed(11L)._2 && streamed(21L)._2)  // the survivors themselves

    // CRASH-replay idempotence: apply a fresh KEPT batch directly, delete
    // the marker (simulating a failure just before it), re-invoke with
    // the same batchId — audit log, bands, and docsets must all come out
    // bit-identical (no duplicate rows, no duplicate bands)
    def stateOf(path: String): Seq[String] =
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    val markerP = new org.apache.hadoop.fs.Path(s"$idxPath/_ingest_batch")
    val mfs = markerP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lastApplied = {
      val in = mfs.open(markerP)
      try new String(in.readAllBytes()).trim.toLong finally in.close()
    }
    val novel = Seq((40L,
        "a closing paragraph about join reordering and dynamic pruning"))
      .toDF("doc_id", "text")
    val fn = RT.dedupIngestBatch(idxPath, "doc_id", "text", 0.5, outPath)
    fn(novel, lastApplied + 1)
    assert(spark.read.parquet(outPath).filter(col("doc_id") === 40L)
      .collect().head.getBoolean(3), "crash-replay fixture doc must be KEPT")
    val preOut = stateOf(outPath)
    val preBands = stateOf(s"$idxPath/bands")
    val preSets = stateOf(s"$idxPath/docsets")
    mfs.delete(markerP, false)
    fn(novel, lastApplied + 1)
    assert(stateOf(outPath) == preOut,
      "crash-replay duplicated or altered audit rows")
    assert(stateOf(s"$idxPath/bands") == preBands &&
      stateOf(s"$idxPath/docsets") == preSets,
      "crash-replay duplicated bands/docsets")
  }
}
