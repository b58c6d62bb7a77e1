package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, DedupIndex}

/** Flood guard for the MinHash family: a boilerplate signature shared by
  * more members than `maxBucket` must be dropped from the candidate stage
  * (never joined quadratically), while genuine near-dup pairs outside the
  * flooded bucket keep their exact results — the
  * [[graft.llm.Multimodal.nearDupByHash64]] discipline applied to
  * minhashDedup, crossCorpusDedup and the persisted DedupIndex probe.
  */
class DedupFloodSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"), name)
    val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    f.getAbsolutePath
  }

  private val boiler =
    "this page is intentionally left blank see the terms of service for details"

  /** 20 identical boilerplate docs (ids 100..119) — every band key
    * collides, bucket population 20 — plus one genuine near-dup pair
    * (1, 2) and an unrelated doc 3.
    */
  private def corpus = df("doc_id BIGINT, text STRING",
    Seq(
      R(1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      R(2L, "the quick brown fox jumps over the lazy dog near the river bend"),
      R(3L, "completely different content with no overlap whatsoever here today")) ++
      (100L until 120L).map(i => R(i, boiler)))

  test("minhashDedup: flooded bucket drops, genuine pair survives, cap-off finds the flood") {
    val capped = Dedup.minhashDedup(corpus, "doc_id", "text",
        minJaccard = 0.5, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 2L)), "genuine near-dup lost to the cap")
    assert(!capped.exists(p => p._1 >= 100L || p._2 >= 100L),
      "flooded-bucket members must report no pairs under the cap")
    // with the cap above the flood size the same pipeline DOES pair them —
    // proving the cap (not the LSH) is what removed the flood
    val uncapped = Dedup.minhashDedup(corpus, "doc_id", "text",
        minJaccard = 0.5, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count(p => p._1 >= 100L && p._2 >= 100L) == 20 * 19 / 2)
    assert(uncapped.contains((1L, 2L)))
  }

  test("crossCorpusDedup: a ref-side flood is capped independently of the probe side") {
    val ref = corpus.filter(col("doc_id") =!= 2L)
    // probe: an exact copy of the boilerplate and a near-dup of ref doc 1 —
    // probe-side buckets all have population 1; only the REF side floods
    val fresh = df("doc_id BIGINT, text STRING", Seq(
      R(200L, boiler),
      R(201L, "the quick brown fox jumps over the lazy dog near the river bend")))
    val capped = DedupFloodSpec.keepMap(
      Dedup.crossCorpusDedup(fresh, ref, "doc_id", "text",
        minJaccard = 0.5, maxBucket = 8))
    assert(capped(200L), "flooded ref bucket must yield no match (keep)")
    assert(!capped(201L), "near-dup of an unflooded ref doc must still drop")
    val uncapped = DedupFloodSpec.keepMap(
      Dedup.crossCorpusDedup(fresh, ref, "doc_id", "text",
        minJaccard = 0.5, maxBucket = 1000))
    assert(!uncapped(200L) && !uncapped(201L))
  }

  test("DedupIndex.query: an index-side flood accumulated over appends is capped at probe time") {
    val path = tmp("graft_dedup_flood_index")
    val ref = corpus.filter(col("doc_id") =!= 2L)
    DedupIndex.save(ref.filter(col("doc_id") < 110L), "doc_id", "text", path)
    DedupIndex.append(spark, path,
      ref.filter(col("doc_id") >= 110L), "doc_id", "text")
    val probe = df("doc_id BIGINT, text STRING", Seq(
      R(200L, boiler),
      R(201L, "the quick brown fox jumps over the lazy dog near the river bend")))
    val capped = DedupFloodSpec.keepMap(
      DedupIndex.query(spark, path, probe, "doc_id", "text", maxBucket = 8))
    assert(capped(200L), "flooded index bucket must yield no match (keep)")
    assert(!capped(201L), "near-dup of an unflooded index doc must still drop")
    val uncapped = DedupFloodSpec.keepMap(
      DedupIndex.query(spark, path, probe, "doc_id", "text"))
    assert(!uncapped(200L) && !uncapped(201L))
  }
}

object DedupFloodSpec {
  /** doc_id -> keep from the crossCorpusDedup/DedupIndex.query contract. */
  def keepMap(out: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
    out.select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
}
