package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Curation, Dedup, DedupIndex, Similarity}
import graft.streaming.RT

/** The composed streaming LLM ingest pipeline
  * (file source → [[RT.streamingDedup]] → [[RT.llmIngestBatch]]:
  * quality → near-dup vs accepted → index growth → ANN serve/grow)
  * against a sequential driver-side fold of the same batch operators:
  * every audit relation must agree row for row across ≥3 micro-batches,
  * cross-batch state (digest dedup, index growth, vector growth) must be
  * visible downstream, and a replayed batch must be a full no-op.
  */
class LlmIngestE2ESpec extends SparkSpec {

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

  test("composed pipeline == sequential batch fold over 3 micro-batches; replay is a no-op") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)

    // persisted state: a seeded dedup index and a seeded ANN layout
    val dedupIdx = tmp("graft_llm_e2e_dedup_idx")
    val annIdx = tmp("graft_llm_e2e_ann_idx")
    val annIdxFold = tmp("graft_llm_e2e_ann_fold")
    val seed = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different content with no overlap whatsoever here today"))
      .toDF("doc_id", "text")
    DedupIndex.save(seed, "doc_id", "text", dedupIdx)
    val corpus = (0 until 80).map(i => (100L + i, vec(i % 4, i)))
      .toDF("doc_id", "embedding")
    val (assigned, model) = Similarity.kmeansIndex(corpus, "doc_id",
      "embedding", nlist = 4)
    Similarity.saveIndex(assigned, model, annIdx)
    Similarity.saveIndex(assigned, model, annIdxFold)

    // b1: 10 novel good; 11 too short (quality-dropped, embedding never
    //     indexed); 12 exact-dups seed doc 1 (near-dup stage drops it);
    // b2: 20 carries doc 10's EXACT text (the upstream digest stage must
    //     drop it before the batch function ever sees it); 21 novel good;
    // b3: 30 is b2 survivor 21's text UPPER-CASED — a different md5
    //     digest (so the upstream exact stage passes it) but an identical
    //     lower-cased shingle set (banding provably hits), so the
    //     near-dup stage flags it iff the index grew; 31 novel good, with
    //     an embedding IDENTICAL to 10's so the grown ANN state must
    //     return 10 at cosine 1.0 rank 1.
    val longA = "a wholly new document about spark shuffles and parquet row groups arriving now"
    val longB = "yet another novel text mentioning catalyst rules and codegen spans in detail"
    val longC = "fresh prose describing watermarks state stores and checkpoint recovery paths"
    val batches = Seq(
      Seq((10L, t(0), longA, vec(0, 500)),
        (11L, t(1), "too short", vec(1, 501)),
        (12L, t(2), "the quick brown fox jumps over the lazy dog near the river bank", vec(2, 502))),
      Seq((20L, t(10), longA, vec(3, 503)),
        (21L, t(11), longB, vec(1, 504))),
      Seq((30L, t(20), longB.toUpperCase, vec(2, 505)),
        (31L, t(21), longC, vec(0, 500))))

    val srcDir = Files.createTempDirectory("graft_llm_e2e_src").toString
    batches.foreach { b =>
      b.toDF("doc_id", "ts", "text", "embedding").coalesce(1)
        .write.mode("append").parquet(srcDir)
      Thread.sleep(1100) // distinct mtimes: oldest-first, one per trigger
    }

    val qualityOut = tmp("graft_llm_e2e_quality")
    val dedupOut = tmp("graft_llm_e2e_dedup")
    val annOut = tmp("graft_llm_e2e_ann")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("ts", TimestampType), StructField("text", StringType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val fn = RT.llmIngestBatch(dedupIdx, annIdx, "doc_id", "text",
      "embedding", dim, minJaccard = 0.5, k = 3, nprobe = 2,
      qualityOut, dedupOut, annOut, minTokens = 5)
    val q = RT.streamingDedup(stream, "ts", "text").writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", tmp("graft_llm_e2e_ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()

    // audit relations carry their applied_batch provenance partition —
    // dropped here so the comparison stays against the bare operator rows
    def rowsOf(path: String): Seq[String] =
      spark.read.parquet(path).drop("applied_batch")
        .collect().map(_.toString).sorted.toSeq

    // ---- sequential driver-side fold of the same batch operators ----
    val seenDigests = scala.collection.mutable.Set.empty[String]
    var accepted: DataFrame = seed
    val foldQuality = scala.collection.mutable.Buffer.empty[String]
    val foldDedup = scala.collection.mutable.Buffer.empty[String]
    val foldAnn = scala.collection.mutable.Buffer.empty[String]
    batches.foreach { b =>
      // the upstream exact-digest stage (all rows inside the horizon)
      val fresh = b.filter { case (_, _, text, _) =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8")).map(x => f"$x%02x").mkString
        seenDigests.add(d)
      }
      val bdf = fresh.toDF("doc_id", "ts", "text", "embedding")
      val flags = Curation.qualityFilter(bdf, "doc_id", "text",
        minTokens = 5).localCheckpoint()
      foldQuality ++= flags.collect().map(_.toString)
      val keptQ = bdf.join(flags.filter(col("keep")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val dflags = Dedup.crossCorpusDedup(keptQ, accepted, "doc_id", "text")
        .localCheckpoint()
      foldDedup ++= dflags.collect().map(_.toString)
      val kept = keptQ.join(dflags.filter(col("keep")).select("doc_id"),
        Seq("doc_id"), "left_semi").localCheckpoint()
      accepted = accepted.unionByName(kept.select("doc_id", "text"))
      val kv = kept.select(col("doc_id"), col("embedding"))
      foldAnn ++= Similarity.probeIndex(spark, annIdxFold, kv, "doc_id",
        "embedding", dim, k = 3, nprobe = 2).collect().map(_.toString)
      Similarity.appendToIndex(spark, annIdxFold, kv, "doc_id",
        "embedding", dim)
    }
    assert(rowsOf(qualityOut) == foldQuality.sorted.toSeq,
      s"quality audit diverged:\n${rowsOf(qualityOut)}\nvs\n${foldQuality.sorted}")
    assert(rowsOf(dedupOut) == foldDedup.sorted.toSeq,
      s"dedup audit diverged:\n${rowsOf(dedupOut)}\nvs\n${foldDedup.sorted}")
    assert(rowsOf(annOut) == foldAnn.sorted.toSeq,
      s"ann results diverged:\n${rowsOf(annOut)}\nvs\n${foldAnn.sorted}")

    // targeted cross-batch facts
    val qIds = spark.read.parquet(qualityOut).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!qIds.contains(20L),
      "digest-dup must be dropped upstream, before the quality stage")
    val dmap = spark.read.parquet(dedupOut).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)).map(_.toString.toLong),
        r.getBoolean(3))).toMap
    assert(dmap(12L) == ((Some(1L), false)), "seed near-dup must drop")
    assert(dmap(30L) == ((Some(21L), false)),
      "dup of a b2 survivor proves the dedup index grew")
    assert(!dmap.contains(11L), "quality-dropped doc must never reach dedup")
    val amap = spark.read.parquet(annOut).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(amap((31L, 1)) == ((10L, 1.0)),
      s"b3 query must retrieve the b1 survivor's identical vector first: ${amap.get((31L, 1))}")
    val got10 = (1 to 3).flatMap(r => amap.get((10L, r))).map(_._1)
    assert(got10.nonEmpty && got10.forall(v => v >= 100L && v <= 179L),
      s"b1 survivor must retrieve only the seeded corpus (probe before append): $got10")

    // replaying an applied batch is a FULL no-op across all three audits
    val applied = {
      val p = new org.apache.hadoop.fs.Path(s"$dedupIdx/_pipeline_batch")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      try new String(in.readAllBytes()).trim.toLong finally in.close()
    }
    val (nq, nd, na) = (rowsOf(qualityOut).size, rowsOf(dedupOut).size,
      rowsOf(annOut).size)
    fn(batches.last.toDF("doc_id", "ts", "text", "embedding"), applied)
    assert(rowsOf(qualityOut).size == nq &&
      rowsOf(dedupOut).size == nd && rowsOf(annOut).size == na,
      "replay of an applied batch wrote audit rows")

    // a batch where EVERY stage drops everything (quality kills both
    // docs) must not crash any append path, and the pipeline must keep
    // working afterwards: indexes unchanged, next batch still probes
    val allDropped = Seq(
      (90L, t(30), "nope", vec(0, 600)),
      (91L, t(31), "also no", vec(1, 601)))
      .toDF("doc_id", "ts", "text", "embedding")
    fn(allDropped, applied + 1)
    assert(rowsOf(dedupOut).size == nd && rowsOf(annOut).size == na,
      "a fully-dropped batch must write no dedup/ann rows")
    val qAfter = spark.read.parquet(qualityOut)
      .filter(col("doc_id") >= 90L).collect()
    assert(qAfter.length == 2 && qAfter.forall(!_.getAs[Boolean]("keep")),
      "the quality audit must still record the dropped docs")
    val next = Seq((95L, t(40), longC.toUpperCase, vec(2, 602)))
      .toDF("doc_id", "ts", "text", "embedding")
    fn(next, applied + 2)
    val d95 = spark.read.parquet(dedupOut).filter(col("doc_id") === 95L)
      .collect().head
    assert(!d95.getAs[Boolean]("keep") && d95.getLong(1) == 31L,
      s"post-empty-batch probe must still see the grown index: $d95")

    // CRASH-replay: a failure between the last write and the marker
    // re-enters the function with the SAME batchId and data while the
    // marker still names the previous batch — simulated by deleting the
    // marker after a fully-applied batch whose document was KEPT (so the
    // replay exercises both index-append guards, not just the audit
    // writes). Every stage must be idempotent: audit relations and BOTH
    // index states come out bit-identical — no duplicate audit rows,
    // bands, docsets, or vectors.
    val novel = Seq((96L, t(50),
        "an entirely different closing paragraph about join reordering and"
          + " dynamic partition pruning strategies", vec(3, 700)))
      .toDF("doc_id", "ts", "text", "embedding")
    fn(novel, applied + 3)
    def stateOf(path: String): Seq[String] =
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(spark.read.parquet(dedupOut).filter(col("doc_id") === 96L)
      .collect().head.getAs[Boolean]("keep"),
      "the crash-replay fixture doc must be KEPT (it must grow both indexes)")
    val preQ = stateOf(qualityOut); val preD = stateOf(dedupOut)
    val preA = stateOf(annOut)
    val preCells = stateOf(s"$annIdx/cells")
    val preBands = stateOf(s"$dedupIdx/bands")
    val preSets = stateOf(s"$dedupIdx/docsets")
    val markerP = new org.apache.hadoop.fs.Path(s"$dedupIdx/_pipeline_batch")
    markerP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(markerP, false)
    fn(novel, applied + 3)
    assert(stateOf(qualityOut) == preQ && stateOf(dedupOut) == preD &&
      stateOf(annOut) == preA,
      "crash-replay duplicated or altered audit rows")
    assert(stateOf(s"$annIdx/cells") == preCells,
      "crash-replay duplicated vectors in the ANN index")
    assert(stateOf(s"$dedupIdx/bands") == preBands &&
      stateOf(s"$dedupIdx/docsets") == preSets,
      "crash-replay duplicated bands/docsets in the dedup index")
  }
}
