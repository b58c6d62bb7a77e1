package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, DedupIndex, TextAnalysis}

/** Persisted dedup-index lifecycle: disk roundtrip parity with the direct
  * in-memory cross-corpus computation, append semantics, and the guards
  * (hash-probe fingerprint, id column, minJaccard domain).
  */
class DedupIndexSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"), name)
    val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    f.getAbsolutePath
  }

  private def corpus = df("doc_id BIGINT, text STRING", Seq(
    R(1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    R(2L, "the quick brown fox jumps over the lazy dog near the river bend"),
    R(3L, "completely different content with no overlap whatsoever here today"),
    R(4L, "another unrelated document about spark shuffles and parquet files"),
    R(5L, "the quick brown fox jumps over the lazy dog near the river bank"),
    R(6L, "totally novel text that matches nothing else in the whole corpus")))

  test("save + append + query reproduces crossCorpusDedup exactly") {
    val path = tmp("graft_dedup_index_spec")
    val built = corpus.filter(col("doc_id") <= 2)
    val added = corpus.filter(col("doc_id") === 3 || col("doc_id") === 4)
    val probe = corpus.filter(col("doc_id") >= 5)
    DedupIndex.save(built, "doc_id", "text", path)
    DedupIndex.append(spark, path, added, "doc_id", "text")
    val viaIndex = DedupIndex.query(spark, path, probe, "doc_id", "text")
      .collect().map(_.toString).sorted
    val direct = Dedup.crossCorpusDedup(probe,
        corpus.filter(col("doc_id") <= 4), "doc_id", "text")
      .collect().map(_.toString).sorted
    assert(viaIndex.sameElements(direct),
      s"index path diverged:\n${viaIndex.mkString("\n")}\nvs\n${direct.mkString("\n")}")
    // doc 5 is an exact dup of indexed doc 1; doc 6 matches nothing
    val byId = DedupIndex.query(spark, path, probe, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2), r.getBoolean(3))).toMap
    assert(byId(5L) == ((false, 1.0, false)))
    assert(byId(6L) == ((true, -1.0, true)))
  }

  test("append extends the searchable state (pre-append probe misses it)") {
    val path = tmp("graft_dedup_index_spec2")
    DedupIndex.save(corpus.filter(col("doc_id") === 3), "doc_id", "text", path)
    val probe = corpus.filter(col("doc_id") === 5)
    assert(DedupIndex.query(spark, path, probe, "doc_id", "text")
      .head().getBoolean(3)) // keep: nothing similar indexed yet
    DedupIndex.append(spark, path,
      corpus.filter(col("doc_id") === 1), "doc_id", "text")
    val after = DedupIndex.query(spark, path, probe, "doc_id", "text").head()
    assert(!after.getBoolean(3) && after.getLong(1) == 1L)
  }

  test("guards: hash-probe fingerprint, id column, minJaccard domain, self-match") {
    val path = tmp("graft_dedup_index_spec3")
    DedupIndex.save(corpus.filter(col("doc_id") <= 2), "doc_id", "text", path)
    val m = DedupIndex.readMeta(spark, path)
    assert(m.n == 3 && m.k == 16 && m.r == 4 && m.idCol == "doc_id")
    val otherHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => TextAnalysis.md5Long(concat(c, lit("salt")))
    intercept[IllegalArgumentException] {
      DedupIndex.query(spark, path, corpus, "doc_id", "text", hash = otherHash)
    }
    intercept[IllegalArgumentException] {
      DedupIndex.append(spark, path,
        corpus.withColumnRenamed("doc_id", "id"), "id", "text")
    }
    intercept[IllegalArgumentException] {
      DedupIndex.query(spark, path, corpus, "doc_id", "text", minJaccard = 0.0)
    }
    // a probe id already present in the index never matches itself: doc 2
    // is indexed; probing it must surface only its near-dup doc 1
    val self = DedupIndex.query(spark, path,
        corpus.filter(col("doc_id") === 2), "doc_id", "text").head()
    assert(self.getLong(1) == 1L && !self.getBoolean(3))
  }
}
