package graft

import org.apache.spark.sql.functions._

import graft.llm.{Curation, Dedup, Multimodal, Similarity, TextAnalysis}

class LlmSpec extends SparkSpec {

  private def docs = df("doc_id BIGINT, text STRING", Seq(
    R(1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    R(2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
    R(3L, "completely different content with no overlap whatsoever here today"),
    R(4L, "the quick brown fox jumps over the lazy dog near the river bank"))) // exact dup of 1

  test("exact dedup groups identical texts under the min id") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(1L) == 2L) // docs 1 and 4
    assert(out(2L) == 1L)
    assert(out(3L) == 1L)
  }

  test("shingles: n-grams count = tokens - n + 1; short docs yield none") {
    val d = df("doc_id BIGINT, text STRING", Seq(R(1L, "a b c d"), R(2L, "a b")))
    val sh = Dedup.shingles(d, "doc_id", "text", 3)
    assert(sh.filter(col("doc_id") === 1).count() == 2) // "a b c", "b c d"
    assert(sh.filter(col("doc_id") === 2).count() == 0)
  }

  test("jaccardPairs finds near and exact duplicates above threshold") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 4L)) == 1.0) // exact dup
    assert(pairs((1L, 2L)) > 0.7 && pairs((1L, 2L)) < 1.0)
    assert(pairs((2L, 4L)) > 0.7)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("prefixJaccardPairs: exact parity with the uncapped inverted index") {
    // richer corpus: exact dup, near dup, subset-ish, unrelated, and a
    // shared-rare-token pair below threshold that prefix candidates must
    // still generate-and-reject
    val d = docs.unionByName(df("doc_id BIGINT, text STRING", Seq(
      R(5L, "alpha beta gamma delta epsilon zeta eta theta"),
      R(6L, "alpha beta gamma delta epsilon zeta eta iota"),
      R(7L, "alpha beta gamma completely unrelated tail of words here"))))
    val byPrefix = Dedup.prefixJaccardPairs(d, "doc_id", "text",
        n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // ground truth: the capped index with a cap no shingle reaches = exact
    val exact = Dedup.jaccardPairs(d, "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDf = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(byPrefix == exact,
      s"prefix filter must be lossless: ${byPrefix.diff(exact)} extra, " +
        s"${exact.diff(byPrefix)} missing")
    assert(byPrefix.exists(p => p._1 == 5L && p._2 == 6L))
    assert(!byPrefix.exists(p => p._1 == 7L || p._2 == 7L))
    intercept[IllegalArgumentException] {
      Dedup.prefixJaccardPairs(d, "doc_id", "text", minJaccard = 0.0)
    }
  }

  test("minhashDedup finds the same high-similarity pairs as exact Jaccard") {
    val mh = Dedup.minhashDedup(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.contains((1L, 4L)))
    assert(mh.contains((1L, 2L)))
    assert(!mh.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("fastHash64 path: same verified pairs, simhash/fingerprint invariants hold") {
    val fast = TextAnalysis.fastHash64 _
    // the exact-Jaccard verify step is hash-independent: the fast-hash LSH
    // must surface the same above-threshold pairs with identical scores
    val md5Pairs = Dedup.minhashDedup(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fastPairs = Dedup.minhashDedup(docs, "doc_id", "text", minJaccard = 0.5,
        hash = fast)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fastPairs == md5Pairs)
    // non-negative hashes keep the simhash bit tests valid
    val sh = Dedup.simhash16(docs, "doc_id", "text", hash = fast).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sh(1L) == sh(4L) && sh(1L) != sh(3L))
    assert(sh.values.forall(v => v >= 0 && v < 65536))
    val fp = TextAnalysis.fingerprint(docs, "doc_id", "text", hash = fast)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fp(1L) == fp(4L) && fp(1L) != fp(3L))
    assert(fp.values.forall(_ >= 0))
  }

  test("resolveClusters: chains merge transitively, min id wins, isolated pairs stay apart") {
    // chain 1-2-3-4-5 (needs multiple propagation rounds) + isolated 10-11
    val pairs = df("da BIGINT, db BIGINT", Seq(
      R(1L, 2L), R(2L, 3L), R(3L, 4L), R(4L, 5L), R(10L, 11L)))
    val out = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(out(_) == 1L))
    assert(out(10L) == 10L && out(11L) == 10L)
    assert(out.size == 7)
  }

  test("resolveClusters: pointer doubling resolves a 200-deep chain within 10 iterations") {
    // a path graph 1-2-...-200: plain min-label propagation needs ~199
    // iterations; pointer doubling must finish in ceil(log2(199))+O(1)
    val pairs = df("da BIGINT, db BIGINT",
      (1L until 200L).map(i => R(i, i + 1)))
    val out = Dedup.resolveClusters(pairs, maxIter = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 200)
    assert(out.values.forall(_ == 1L))
  }

  test("resolveClusters throws on non-convergence instead of returning partial labels") {
    val pairs = df("da BIGINT, db BIGINT",
      (1L until 200L).map(i => R(i, i + 1)))
    assertThrows[IllegalStateException] {
      Dedup.resolveClusters(pairs, maxIter = 2)
    }
  }

  test("canonicalize keeps one doc per cluster and all unclustered docs") {
    val pairs = df("da BIGINT, db BIGINT", Seq(R(1L, 2L), R(2L, 3L)))
    val clusters = Dedup.resolveClusters(pairs)
    val kept = Dedup.canonicalize(docs, clusters, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // cluster {1,2,3} → keep 1; doc 4 is unclustered → kept
    assert(kept == Set(1L, 4L))
  }

  test("IVF index save/load: partition-pruned cells + reusable quantizer") {
    val emb = df("vec_id BIGINT, embedding ARRAY<FLOAT>",
      (0 until 40).map(i => R(i.toLong,
        Seq.tabulate(8)(d => (math.sin(i / 10 * 8 + d + 1.0) + 0.01 * i).toFloat))))
    val (assigned, model) = Similarity.kmeansIndex(emb, "vec_id", "embedding", nlist = 4)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.saveIndex(assigned, model, path)
    val (cells, model2) = Similarity.loadIndex(spark, path)
    assert(cells.count() == 40)
    assert(model2.clusterCenters.length == 4)
    // probe-shaped read: filtering one cell prunes partitions before IO
    val probed = cells.filter(col("ivf_cell") === 0)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ivf_cell"), plan)
    // assignments survive the roundtrip
    val orig = assigned.select("vec_id", "ivf_cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val back = cells.select("vec_id", "ivf_cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(orig == back)
  }

  test("vocabulary: occurrence + doc frequency, top-n without a global sort") {
    val v = TextAnalysis.vocabulary(docs, "doc_id", "text", n = 3)
    val rows = v.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "the" appears 3x in docs 1/2/4 each = 9 total across 3 docs
    assert(rows.head == (("the", 9L, 3L)))
    assert(rows.length == 3)
    // n_total descending, token ascending on ties
    assert(rows.map(-_._2).toSeq == rows.map(-_._2).sorted.toSeq)
    val plan = v.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("simhash16: identical docs hash equal, disjoint docs differ") {
    val out = Dedup.simhash16(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(1L) == out(4L))
    assert(out(1L) != out(3L))
    assert(out.values.forall(v => v >= 0 && v < 65536))
  }

  test("embeddingNearDup finds the planted near-identical vector pair") {
    val d = df("vec_id BIGINT, label INT, embedding ARRAY<FLOAT>", Seq(
      R(1L, 0, Seq(1.0f, 0.0f, 0.0f)),
      R(2L, 0, Seq(0.99f, 0.1f, 0.0f)),   // cos ≈ 0.995 with 1
      R(3L, 0, Seq(0.0f, 1.0f, 0.0f)),    // orthogonal to 1
      R(4L, 1, Seq(1.0f, 0.0f, 0.0f))))   // same as 1 but different block
    val out = Dedup.embeddingNearDup(d, "vec_id", "embedding", "label", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L))) // blocking excludes (1,4); threshold excludes (1,3)
  }

  test("semanticDedup: drops within-cell near-dups keeping the smallest id; never compares across cells") {
    val d = df("vec_id BIGINT, ivf_cell INT, embedding ARRAY<FLOAT>", Seq(
      R(1L, 0, Seq(1.0f, 0.0f, 0.0f)),
      R(2L, 0, Seq(0.99f, 0.1f, 0.0f)),   // near-dup of 1, same cell → dropped
      R(3L, 0, Seq(0.0f, 1.0f, 0.0f)),    // orthogonal → survives
      R(4L, 1, Seq(1.0f, 0.0f, 0.0f)),    // near-dup of 1 but OTHER cell → survives
      R(5L, 1, Seq(0.995f, 0.05f, 0.0f)), // near-dup of 4, same cell → dropped
      R(6L, 1, Seq(0.0f, 0.0f, 1.0f))))   // survives
    val out = Dedup.semanticDedup(d, "vec_id", "embedding", "ivf_cell", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // one representative (the smallest id) per within-cell near-dup set;
    // the cross-cell duplicate 4 survives — the method's documented tradeoff
    assert(out == Set((1L, 0), (3L, 0), (4L, 1), (6L, 1)))
  }

  test("chunkDocuments: overlap windows, offsets, truncated tail, empty doc keeps one chunk") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "abcdefghij"),   // 10 chars, size 4 stride 3 -> starts 1,4,7,10
      R(2L, "ab"),           // shorter than size -> one truncated chunk
      R(3L, "")))            // empty -> one empty chunk
    val out = Curation.chunkDocuments(d, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy(col("doc_id"), col("chunk_idx"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4)))
    assert(out.toSeq == Seq(
      (1L, 0, 1, "abcd", 4), (1L, 1, 4, "defg", 4),
      (1L, 2, 7, "ghij", 4), (1L, 3, 10, "j", 1),
      (2L, 0, 1, "ab", 2),
      (3L, 0, 1, "", 0)))
    // consecutive chunks overlap by exactly `overlap` characters
    assert(out(1)._4.take(1) == out(0)._4.takeRight(1))
  }

  test("chunkDocuments plan: filter pushes to the scan; no shuffle beyond the fanOut respread") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    spark.range(0, 200).selectExpr("id AS doc_id", "repeat('x', 300) AS text")
      .write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir).filter(col("doc_id") < 100)
    val c = Curation.chunkDocuments(docs, "doc_id", "text", 120, 40)
    val plan = c.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(doc_id,100)"), plan)
    // at most the single fanOut round-robin respread — never a hash exchange
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(c.count() == 400) // 300 chars, stride 80 -> 4 chunks per doc
  }

  test("mixtureWeights: alpha=1 keeps natural shares, small alpha upsamples the tail, weights sum to 1") {
    val d = df("doc_id BIGINT, source STRING",
      (1L to 90L).map(i => R(i, "big")) ++ (91L to 100L).map(i => R(i, "small")))
    def w(alpha: Double): Map[String, (Long, Double, Double)] =
      Curation.mixtureWeights(d, "source", alpha).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val natural = w(1.0)
    assert(natural("big") == ((90L, 0.9, 0.9)) && natural("small") == ((10L, 0.1, 0.1)))
    val smoothed = w(0.3)
    // alpha < 1 moves weight from the head to the tail, order preserved
    assert(smoothed("small")._3 > 0.1 && smoothed("big")._3 < 0.9)
    assert(smoothed("big")._3 > smoothed("small")._3)
    assert(math.abs(smoothed("big")._3 + smoothed("small")._3 - 1.0) < 1e-6)
  }

  test("containmentPairs: subset doc clears containment where Jaccard misses; directions correct") {
    val small = "alpha beta gamma delta epsilon zeta"   // 4 distinct 3-grams
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, small),                    // fully contained in 2
      R(2L, small + " " + filler),     // superset
      R(3L, "unrelated text entirely different words here")))
    val cont = Dedup.containmentPairs(d, "doc_id", "text", n = 3,
      minContainment = 0.8, maxDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // cont_ab = |A∩B|/|A| with A = doc 1 (da < db): the small side is fully contained
    assert(cont.toSeq == Seq((1L, 2L, 1.0, 0.090909))) // 4/4 and 4/44
    // the same pair is invisible to Jaccard at any usable threshold
    val jac = Dedup.jaccardPairs(d, "doc_id", "text", n = 3,
      minJaccard = 0.5, maxDf = 1000).collect()
    assert(jac.isEmpty)
  }

  test("bigramPerplexity: add-one smoothing, held-out scoring, short docs surface NULL") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "a b a b"),  // train: bigrams (a,b)x2, (b,a)
      R(2L, "a b"),      // train: (a,b)  => cb(a,b)=3, cb(b,a)=1; cw(a)=3, cw(b)=1; V=2
      R(5L, "a b c"),    // held out: (a,b) seen, (b,c) unseen
      R(10L, "x")))      // held out, 1 token: no bigrams
    val out = TextAnalysis.bigramPerplexity(d, "doc_id", "text",
        isTrain = col("doc_id") % 5 =!= 0)
      .orderBy(col("doc_id")).collect()
    def row(i: Int) = (out(i).getLong(0), out(i).getLong(1))
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 5L, 10L))
    // P(b|a) = (3+1)/(3+2), P(a|b) = (1+1)/(1+2), P(c|b) = (0+1)/(1+2)
    val sAB = -math.log10(4.0 / 5); val sBA = -math.log10(2.0 / 3)
    val sBC = -math.log10(1.0 / 3)
    def r6d(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row(0) == ((1L, 3L)) && out(0).getDouble(2) == r6d((2 * sAB + sBA) / 3))
    assert(row(1) == ((2L, 1L)) && out(1).getDouble(2) == r6d(sAB))
    assert(row(2) == ((5L, 2L)) && out(2).getDouble(2) == r6d((sAB + sBC) / 2))
    // perplexity derives from the already-rounded mean
    assert(math.abs(out(2).getDouble(3) - math.pow(10, out(2).getDouble(2))) < 1e-6)
    assert(row(3) == ((10L, 0L)) && out(3).isNullAt(2) && out(3).isNullAt(3))
  }

  test("bpeTrain: merge order, lexicographic ties, overlap scan; encode replays merges") {
    import graft.llm.Bpe
    val d = df("doc_id BIGINT, text STRING", Seq(R(1L, "low lower lowest")))
    val merges = Bpe.train(d, "text", numMerges = 3).orderBy(col("step"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // (l,o) and (o,w) tie at 3 -> lexicographic left wins; then (lo,w); then (low,e)
    assert(merges.toSeq == Seq(
      (1, "l", "o", "lo", 3L), (2, "lo", "w", "low", 3L), (3, "low", "e", "lowe", 2L)))

    // overlapping pairs count both, merge applies left-to-right: "a a a" -> "aa a"
    val aaa = df("doc_id BIGINT, text STRING", Seq(R(1L, "aaa")))
    val m2 = Bpe.train(aaa, "text", numMerges = 2).orderBy(col("step"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(m2(0) == (("a", "a", 2L)))
    // after "aa a </w>": ties at 1 -> lexicographic smallest left "a" beats "aa"
    assert(m2(1) == (("a", "</w>", 1L)))

    // exact greedy scan on runs: BOTH (a,a) occurrences of "aaaa" merge in
    // one pass ("aa aa", the Sennrich order) — single-space literal replace
    // would under-merge to "aa a a" because the occurrences share a space
    val run = df("doc_id BIGINT, text STRING", Seq(R(1L, "aaaa")))
    val encRun = Bpe.encode(run, "doc_id", "text", Seq(("a", "a")))
      .collect().map(_.getSeq[String](3).toList)
    assert(encRun.toSeq == Seq(List("aa", "aa", "</w>")))
    // and train's second step sees the merged runs: pairs of "aa aa </w>"
    val mRun = Bpe.train(run, "text", numMerges = 2).orderBy(col("step"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(mRun(0) == (("a", "a", 3L)))
    assert(mRun(1) == (("aa", "</w>", 1L))) // lex tie-break: '<' sorts before 'a'

    // encode replays the learned merges in order, map-side
    val enc = Bpe.encode(d, "doc_id", "text",
        merges.map(m => (m._2, m._3)).toSeq)
      .orderBy(col("tok_idx")).collect()
      .map(r => (r.getString(2), r.getSeq[String](3).toList))
    assert(enc.toSeq == Seq(
      ("low", List("low", "</w>")),
      ("lower", List("lowe", "r", "</w>")),
      ("lowest", List("lowe", "s", "t", "</w>"))))
  }

  test("crossCorpusDedup: new near-dup of ref drops, unique keeps, ref never self-pairs") {
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val ref = df("doc_id BIGINT, text STRING", Seq(
      R(10L, base),
      R(11L, base + " extra"),             // ref-internal near-dups must NOT pair
      R(12L, "completely different reference content about spark shuffles and joins here")))
    val fresh = df("doc_id BIGINT, text STRING", Seq(
      R(1L, base + " again"),              // near-dup of refs 10/11
      R(2L, "entirely novel new-snapshot document with its own unique vocabulary set")))
    val out = graft.llm.Dedup.crossCorpusDedup(fresh, ref, "doc_id", "text",
        n = 3, k = 16, r = 4, minJaccard = 0.5)
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(!out(0).getBoolean(out(0).fieldIndex("keep")))
    assert(out(0).getLong(out(0).fieldIndex("dup_of")) == 10L) // smallest matching ref id
    assert(out(0).getDouble(out(0).fieldIndex("best_jac")) >= 0.5)
    assert(out(1).getBoolean(out(1).fieldIndex("keep")))
    assert(out(1).isNullAt(out(1).fieldIndex("dup_of")))
  }

  test("stripMarkup: tags drop, entities decode AFTER stripping, &amp; decodes last") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, """<div id="a"><p>hello <b>world</b></p></div>"""),
      R(2L, "a &lt;b&gt; c &amp;lt; d &#39;q&#39;"), // decoded tags stay literal text
      R(3L, "plain"),
      R(4L, "<br/>")))
    val out = TextAnalysis.stripMarkup(d, "doc_id", "text")
      .orderBy(col("doc_id")).collect().map(r => (r.getString(1), r.getInt(2)))
    assert(out(0) == (("hello world", 11)))
    // &lt;b&gt; -> <b> literally (not stripped); &amp;lt; -> &lt; (amp last)
    assert(out(1) == (("a <b> c &lt; d 'q'", 18)))
    assert(out(2) == (("plain", 5)))
    assert(out(3) == (("", 0)))
  }

  test("shuffleShards: deterministic replay, full coverage, dense per-shard positions") {
    val d = df("doc_id BIGINT, text STRING", (1L to 200L).map(i => R(i, "x")))
    val a = Curation.shuffleShards(d, "doc_id", numShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val b = Curation.shuffleShards(d, "doc_id", numShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq) // same salt = same epoch
    assert(a.map(_._1).toSet == (1L to 200L).toSet)      // every doc exactly once
    // positions are dense 0..n-1 within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.size).toSeq)
    }
    // a different salt is a different permutation (some assignment moves)
    val c = Curation.shuffleShards(d, "doc_id", numShards = 8, salt = "epoch2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(c.sortBy(_._1).toSeq != a.sortBy(_._1).toSeq)
  }

  test("embeddingNearDupLsh: high recall on planted near-dup clusters, no sub-threshold pairs") {
    // 20 clusters of 3 near-identical 16-dim vectors (cos > 0.99 within a
    // cluster) + deterministic pseudo-random noise vectors between clusters
    def vec(c: Int, j: Int): Seq[Float] = (0 until 16).map { i =>
      val base = math.sin(c * 16 + i + 1.0)
      (base + 0.01 * math.sin((c * 3 + j) * 16 + i + 7.0)).toFloat
    }
    val rows = for (c <- 0 until 20; j <- 0 until 3)
      yield R((c * 3 + j).toLong, vec(c, j))
    val d = df("vec_id BIGINT, embedding ARRAY<FLOAT>", rows)
    val lsh = Dedup.embeddingNearDupLsh(d, "vec_id", "embedding", dim = 16,
        nBits = 32, r = 8, minCos = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exact verify step: nothing below the threshold can survive
    assert(lsh.forall(_._3 >= 0.95))
    // ground truth = brute force: ALL pairs at cos >= 0.95 (distinct clusters
    // can collide by chance; the LSH must only ever report true pairs)
    val truth = Dedup.embeddingNearDup(
        d.withColumn("blk", lit(0)), "vec_id", "embedding", "blk", 16, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = lsh.map(p => (p._1, p._2)).toSet
    assert(found.subsetOf(truth))
    // all 60 planted in-cluster pairs are part of the truth set
    val planted = (for (c <- 0 until 20; a <- 0 until 3; b <- a + 1 until 3)
      yield (c * 3 + a).toLong -> (c * 3 + b).toLong).toSet
    assert(planted.subsetOf(truth))
    val recall = (found & truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall (${found.size}/${truth.size})")
  }

  test("bruteForceTopK ranks by cosine desc with deterministic tie-break") {
    val d = df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(
      R(1L, Seq(1.0f, 0.0f)),
      R(2L, Seq(0.9f, 0.1f)),
      R(3L, Seq(0.0f, 1.0f)),
      R(4L, Seq(-1.0f, 0.0f))))
    val out = Similarity.bruteForceTopK(d, d.filter(col("vec_id") === 1),
        "vec_id", "embedding", 2, 3)
      .collect().map(r => (r.getInt(r.fieldIndex("rank")), r.getLong(r.fieldIndex("vb"))))
    assert(out.toSeq.sortBy(_._1).map(_._2) == Seq(2L, 3L, 4L))
  }

  test("bruteForceTopKAgg: identical to the window variant, no Window in the plan") {
    val d = df("vec_id BIGINT, embedding ARRAY<FLOAT>",
      (1 to 30).map(i => R(i.toLong,
        Seq((math.cos(i / 5.0)).toFloat, (math.sin(i / 5.0)).toFloat))))
    val q = d.filter(col("vec_id") <= 3)
    val win = Similarity.bruteForceTopK(d, q, "vec_id", "embedding", 2, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val aggDf = Similarity.bruteForceTopKAgg(d, q, "vec_id", "embedding", 2, 4)
    val agg = aggDf
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(agg == win)
    // the scale property: ranking happens in a partial aggregation, never a
    // per-group window sort over the full scored relation
    val plan = aggDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("degenerate vectors (zero-norm, null) are unscoreable in BOTH top-k variants") {
    // Spark 4 ANSI mode turns the 0/0 of a zero-norm cosine into a
    // DIVIDE_BY_ZERO job failure without the guard; vec 8's null embedding
    // would crash the typed aggregator's non-nullable encoder unfiltered
    val d = df("vec_id BIGINT, embedding ARRAY<FLOAT>",
      (1 to 7).map(i => R(i.toLong,
        Seq(math.cos(i / 3.0).toFloat, math.sin(i / 3.0).toFloat))) ++
      Seq(R(8L, null), R(9L, Seq(0.0f, 0.0f))))
    val q = d.filter(col("vec_id") === 1)
    val agg = Similarity.bruteForceTopKAgg(d, q, "vec_id", "embedding", 2, 5)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    val win = Similarity.bruteForceTopK(d, q, "vec_id", "embedding", 2, 5)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(agg.toSeq == win.toSeq, s"agg ${agg.toSeq} vs win ${win.toSeq}")
    // the unscoreable vectors are excluded, every scoreable one is ranked
    assert(!agg.exists(h => h._2 == 8L || h._2 == 9L))
    assert(agg.length == 5 && agg.map(_._2).forall((2L to 7L).contains), agg.toSeq)
  }

  test("ivfTopK and bruteForceTopKAgg reject non-integral id/cell columns loudly") {
    // a string cell label would cast(long) to null on both join sides and
    // silently return an EMPTY result — fail fast per the Long-keyed contract
    val d = df("vec_id BIGINT, cell STRING, embedding ARRAY<FLOAT>",
      Seq(R(1L, "a", Seq(1.0f, 0.0f))))
    val q = d.select(col("vec_id"), col("embedding"))
    assert(intercept[IllegalArgumentException] {
      Similarity.ivfTopK(d, q, "vec_id", "embedding", "cell", 2, 1, 1)
    }.getMessage.contains("integral"))
    val ds = df("sid STRING, embedding ARRAY<FLOAT>", Seq(R("x", Seq(1.0f, 0.0f))))
    assert(intercept[IllegalArgumentException] {
      Similarity.bruteForceTopKAgg(ds, ds, "sid", "embedding", 2, 1)
    }.getMessage.contains("integral"))
  }

  test("ivfTopK with nprobe = nlist equals brute force") {
    val d = df("vec_id BIGINT, label INT, embedding ARRAY<FLOAT>", Seq(
      R(1L, 0, Seq(1.0f, 0.0f)), R(2L, 0, Seq(0.9f, 0.1f)),
      R(3L, 1, Seq(0.0f, 1.0f)), R(4L, 1, Seq(0.1f, 0.9f))))
    val q = d.filter(col("vec_id") === 1)
    val bf = Similarity.bruteForceTopK(d, q, "vec_id", "embedding", 2, 3)
      .collect().map(r => r.getLong(r.fieldIndex("vb"))).toSet
    val ivf = Similarity.ivfTopK(d, q, "vec_id", "embedding", "label", 2, 3, nprobe = 2)
      .collect().map(r => r.getLong(r.fieldIndex("vb"))).toSet
    assert(ivf == bf)
  }

  test("ivfTopK ranks through the bounded aggregator: no Window in the plan") {
    val d = df("vec_id BIGINT, label INT, embedding ARRAY<FLOAT>",
      (1 to 30).map(i => R(i.toLong, i % 3,
        Seq(math.cos(i / 5.0).toFloat, math.sin(i / 5.0).toFloat))))
    val q = d.filter(col("vec_id") <= 3)
    val ivfDf = Similarity.ivfTopK(d, q, "vec_id", "embedding", "label",
      dim = 2, k = 4, nprobe = 3)
    // nprobe = nlist ⇒ exhaustive ⇒ must equal the brute-force window ranking
    val win = Similarity.bruteForceTopK(d, q, "vec_id", "embedding", 2, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val ivf = ivfDf
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ivf == win)
    // the scale property, for BOTH stages (probe assignment + in-cell
    // search): ranking happens in partial aggregation, never a per-group
    // window sort over the probed candidate pairs
    val plan = ivfDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("kmeansPartitions + ivfTopK: learned cells recover true neighbors") {
    val d = df("vec_id BIGINT, embedding ARRAY<FLOAT>",
      // two tight clusters around (1,0) and (0,1)
      (1 to 20).map(i => R(i.toLong, Seq(1.0f + (i % 5) * 0.01f, (i % 3) * 0.01f))) ++
      (21 to 40).map(i => R(i.toLong, Seq((i % 3) * 0.01f, 1.0f + (i % 5) * 0.01f))))
    val cells = Similarity.kmeansPartitions(d, "vec_id", "embedding", nlist = 2)
    assert(cells.select("ivf_cell").distinct().count() == 2)
    val q = cells.filter(col("vec_id") === 1)
    val ivf = Similarity.ivfTopK(cells, q, "vec_id", "embedding", "ivf_cell",
        dim = 2, k = 5, nprobe = 1)
      .collect().map(_.getLong(2))
    // with nprobe=1 the probed cell is the query's own cluster
    assert(ivf.forall(_ <= 20))
    assert(ivf.length == 5)
  }

  test("repetitionRatio: repeated phrases raise the ratio, unique text is 0") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "one two three four five six"),
      R(2L, "spam ham spam ham spam ham spam ham")))
    val out = d.select(col("doc_id"),
        TextAnalysis.repetitionRatio(col("text"), 2).as("r"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out(1L) == 0.0)
    assert(out(2L) > 0.5)
  }

  test("qualityFeatures computes deterministic ratios") {
    val d = df("doc_id BIGINT, text STRING", Seq(R(1L, "The cat, the hat!")))
    val out = TextAnalysis.qualityFeatures(d, "doc_id", "text").collect().head
    assert(out.getInt(out.fieldIndex("n_chars")) == 17)
    assert(out.getInt(out.fieldIndex("n_tokens")) == 4)
    assert(out.getDouble(out.fieldIndex("punct_ratio")) == math.rint(2.0 / 17 * 1e6) / 1e6)
    assert(out.getDouble(out.fieldIndex("stopword_ratio")) == 0.5) // "the" twice
  }

  test("langId votes by marker words with deterministic tie-break") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "the cat and the dog"),       // en markers
      R(2L, "der hund und die katze"),    // de markers
      R(3L, "xyzzy plugh")))              // no markers → und
    val out = TextAnalysis.langId(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("fingerprint: identical docs share it, different docs do not") {
    val out = TextAnalysis.fingerprint(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(1L) == out(4L))
    assert(out(1L) != out(3L))
  }

  test("multimodal resize plumbing: stride sampling through mapPartitions") {
    // 4×4 "raster" 0..15 → 2×2 nearest-neighbor = corners of each 2×2 block
    val raster = Array.tabulate(16)(_.toByte)
    assert(Multimodal.resizeStub(raster, 4, 4, 2, 2).toSeq ==
      Seq[Byte](0, 2, 8, 10))
    val withPayload = Multimodal.attachPayload(docs, "doc_id", "text")
    val out = Multimodal.resizeFeatures(withPayload, "doc_id", 8, 8, 4, 4)
      .collect().sortBy(_.id)
    assert(out.length == 4)
    assert(out.forall(r => r.w == 4 && r.h == 4 && r.pixels.length == 16))
    // deterministic: identical docs produce identical resized payloads
    assert(out(0).pixels.toSeq == out(3).pixels.toSeq)
  }

  test("multimodal chunkWindows: overlapped windows, single truncated window for short docs") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "a" * 200), R(2L, "short")))
    val byId = Multimodal.chunkWindows(d, "doc_id", "text", 64, 48).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2), r.getString(3)))).toMap
    // starts 1, 49, 97 (137 > 200-63); 3 windows of 64
    assert(byId(1L)._1 == 3)
    assert(byId(1L)._2.length == 64 && byId(1L)._3.length == 64)
    assert(byId(2L) == ((1, "short", "short")))
  }

  test("multimodal decodeImages: REAL PNG decode through the batch plumbing") {
    import java.awt.image.BufferedImage
    // render two tiny PNGs in-process: a 6×4 mid-gray and a 3×3 white
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      R(1L, png(6, 4, 0x808080), "a"),
      R(2L, png(3, 3, 0xffffff), "b"),
      R(3L, "not an image".getBytes("UTF-8"), "c"))
    val d = df("doc_id BIGINT, payload BINARY, text STRING", rows)
    assert(Multimodal.sniffFormat(rows.head.getAs[Array[Byte]](1))
      .contains("image/png"))
    val out = Multimodal.decodeImages(d, "doc_id").collect().sortBy(_.id)
    assert(out.length == 2) // the text payload is filtered, not crashed on
    assert(out(0).format == "image/png" && out(0).width == 6 && out(0).height == 4)
    assert(math.abs(out(0).meanLuma - 128.0) < 1.0)
    assert(out(1).width == 3 && math.abs(out(1).meanLuma - 255.0) < 1e-9)
  }

  test("multimodal decodeImages drops corrupt payloads that pass the magic sniff") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(6, 4, BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val whole = bos.toByteArray
    // truncated mid-stream: sniffs as PNG, decoder throws/returns null —
    // the row must be dropped, never fail the job
    val rows = Seq(R(1L, whole, "ok"), R(2L, whole.take(20), "truncated"))
    val d = df("doc_id BIGINT, payload BINARY, text STRING", rows)
    val out = Multimodal.decodeImages(d, "doc_id").collect()
    assert(out.map(_.id).toSet == Set(1L))
  }

  /** Render a mono 16-bit little-endian PCM WAV of a pure sine in-process
    * (javax.sound writes the container; no external fixture needed).
    */
  private def sineWav(sampleRate: Float, nFrames: Int, amp: Double,
                      freqHz: Double): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = (amp * math.sin(2 * math.Pi * freqHz * i / sampleRate) * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("multimodal decodeAudios: REAL WAV decode through the batch plumbing") {
    // 1 s of 440 Hz at amplitude 0.5 → RMS = 0.5/√2; plus a half-second clip
    val rows = Seq(
      R(1L, sineWav(8000f, 8000, 0.5, 440.0), "a"),
      R(2L, sineWav(16000f, 8000, 0.25, 440.0), "b"),
      R(3L, "not audio at all".getBytes("UTF-8"), "c"))
    val d = df("doc_id BIGINT, payload BINARY, text STRING", rows)
    assert(Multimodal.sniffAudioFormat(rows.head.getAs[Array[Byte]](1))
      .contains("audio/wav"))
    val out = Multimodal.decodeAudios(d, "doc_id").collect().sortBy(_.id)
    assert(out.length == 2) // the text payload is filtered, not crashed on
    assert(out(0).format == "audio/wav" && out(0).sampleRate == 8000.0 &&
      out(0).channels == 1 && out(0).nFrames == 8000L)
    assert(math.abs(out(0).durationS - 1.0) < 1e-9)
    assert(math.abs(out(0).rms - 0.5 / math.sqrt(2.0)) < 1e-3)
    assert(math.abs(out(1).durationS - 0.5) < 1e-9)
    assert(math.abs(out(1).rms - 0.25 / math.sqrt(2.0)) < 1e-3)
  }

  test("multimodal decodeAudios drops corrupt payloads that pass the magic sniff") {
    val whole = sineWav(8000f, 2000, 0.5, 440.0)
    // truncated mid-header: sniffs as RIFF/WAVE, codec throws — row dropped
    val rows = Seq(R(1L, whole, "ok"), R(2L, whole.take(16), "truncated"))
    val d = df("doc_id BIGINT, payload BINARY, text STRING", rows)
    val out = Multimodal.decodeAudios(d, "doc_id").collect()
    assert(out.map(_.id).toSet == Set(1L))
  }

  test("multimodal perceptual hash: near-dup images pair up, distinct ones do not") {
    import java.awt.image.BufferedImage
    def gradient(w: Int, h: Int, invert: Boolean, noise: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val base = (x * 255) / (w - 1)
        val v0 = if (invert) 255 - base else base
        // deterministic tiny perturbation: must not flip 8x8 cell means
        val v = math.max(0, math.min(255, v0 + (if (noise > 0) ((x * 7 + y * 13) % (2 * noise + 1)) - noise else 0)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      R(1L, gradient(64, 48, invert = false, noise = 0), "a"),
      R(2L, gradient(64, 48, invert = false, noise = 3), "near-dup of 1"),
      R(3L, gradient(64, 48, invert = true, noise = 0), "inverted"),
      R(4L, "not an image".getBytes("UTF-8"), "undecodable"))
    val d = df("doc_id BIGINT, payload BINARY, text STRING", rows)
    val hashes = Multimodal.imageHashes(d, "doc_id")
    val hmap = hashes.collect().map(ih => ih.id -> ih.phash).toMap
    assert(hmap.keySet == Set(1L, 2L, 3L)) // undecodable row dropped
    assert(java.lang.Long.bitCount(hmap(1L) ^ hmap(2L)) <= 3)
    assert(java.lang.Long.bitCount(hmap(1L) ^ hmap(3L)) > 10)
    val pairs = Multimodal.nearDupImages(hashes.toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  /** AM-modulated sine WAV: `beatHz` shapes the RMS envelope the audio
    * fingerprint hashes; `noise` adds a small deterministic perturbation.
    */
  private def beatWav(beatHz: Double, noise: Double): Array[Byte] = {
    val sr = 8000f
    val n = 8000
    val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val t = i / sr.toDouble
      val amp = 0.2 + 0.3 * math.abs(math.sin(2 * math.Pi * beatHz * t))
      val nz = noise * math.sin(2 * math.Pi * 1931.0 * t)
      val s = ((amp * math.sin(2 * math.Pi * 440.0 * t) + nz) * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("multimodal audio fingerprint: same beat pattern pairs up, different beat does not") {
    val rows = Seq(
      R(1L, beatWav(2.0, 0.0), "a"),
      R(2L, beatWav(2.0, 0.01), "noisy near-dup of 1"),
      R(3L, beatWav(5.0, 0.0), "different rhythm"),
      R(4L, "not audio".getBytes("UTF-8"), "undecodable"))
    val d = df("doc_id BIGINT, payload BINARY, text STRING", rows)
    val hashes = Multimodal.audioHashes(d, "doc_id")
    val hmap = hashes.collect().map(h => h.id -> h.afp).toMap
    assert(hmap.keySet == Set(1L, 2L, 3L)) // undecodable row dropped
    assert(java.lang.Long.bitCount(hmap(1L) ^ hmap(2L)) <= 3,
      s"near-dup hamming ${java.lang.Long.bitCount(hmap(1L) ^ hmap(2L))}")
    assert(java.lang.Long.bitCount(hmap(1L) ^ hmap(3L)) > 10,
      s"distinct hamming ${java.lang.Long.bitCount(hmap(1L) ^ hmap(3L))}")
    val pairs = Multimodal.nearDupAudio(hashes.toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("nearDupByHash64 caps hot buckets: a degenerate hash-0 flood stays bounded") {
    // 50 degenerate items (flat images / silent audio all hash to 0) plus one
    // genuine near-dup pair. Uncapped, the hash-0 bucket alone emits
    // C(50,2) = 1225 candidate pairs in EVERY band — the quadratic shape the
    // maxBucket guard exists to cut off.
    val rows = (1L to 50L).map(i => R(i, 0L)) ++
      Seq(R(100L, 0x0f0f0f0f0f0f0f0fL), R(101L, 0x0f0f0f0f0f0f0f0eL)) // hamming 1
    val hashes = df("id BIGINT, h BIGINT", rows)
    val capped = Multimodal.nearDupByHash64(hashes, "h", maxHamming = 3,
        maxBucket = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // flooded buckets drop from the candidate stage (documented recall trade);
    // the genuine pair lives in four 2-member buckets and survives
    assert(capped == Set((100L, 101L)))
    // under the cap the degenerate cluster still pairs up exhaustively
    val uncapped = Multimodal.nearDupByHash64(hashes, "h", maxHamming = 3,
      maxBucket = 1000)
    assert(uncapped.count() == 50L * 49 / 2 + 1)
  }

  test("nearDupByHash64 honors a non-default id column name") {
    val hashes = df("img_id BIGINT, h BIGINT",
      Seq(R(7L, 123L), R(9L, 122L))) // hamming 1
    val pairs = Multimodal.nearDupByHash64(hashes, "h", maxHamming = 3,
        idCol = "img_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((7L, 9L)))
  }

  test("windowDupStats: exact-dup docs fully flagged, unique docs untouched") {
    // docs 1 and 4 are verbatim copies (every window cross-doc duplicated);
    // doc 3 shares no 3-gram with anything; doc 2 differs from 1 only in
    // the final token, so exactly the one window containing it is unique
    val out = Dedup.windowDupStats(docs, "doc_id", "text", n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L)._1 == 11 && out(1L)._2 == 11 && out(1L)._3 == 1.0)
    assert(out(4L) == out(1L))
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0)
    assert(out(2L)._1 == 11 && out(2L)._2 == 10)
    // a doc shorter than n tokens has no windows
    val short = df("doc_id BIGINT, text STRING", Seq(R(9L, "a b")))
    val s = Dedup.windowDupStats(short, "doc_id", "text", n = 3).collect()(0)
    assert(s.getLong(1) == 0 && s.getDouble(3) == 0.0)
  }

  test("removeDupSpans: shared segments deleted, order kept, edges surface") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "a b c x y z p q r"),  // segs: "a b c" "x y z" "p q r"
      R(2L, "x y z u v w"),        // shares "x y z" with 1
      R(3L, "a b c"),              // single segment, shared with 1
      R(4L, "m n"),                // one short unique segment
      R(5L, "")))                  // token-less
    val out = Dedup.removeDupSpans(d, "doc_id", "text", n = 3, maxDocs = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((3L, 2L, "p q r")))   // both shared segs removed
    assert(out(2L) == ((2L, 1L, "u v w")))
    assert(out(3L) == ((1L, 1L, "")))        // fully boilerplate
    assert(out(4L) == ((1L, 0L, "m n")))     // short tail segment kept
    assert(out(5L) == ((0L, 0L, "")))        // no tokens, no segments
  }

  test("nbTrainScore: separable vocab classified, OOV docs fall to the prior") {
    val d = df("doc_id BIGINT, text STRING, lang STRING", Seq(
      R(1L, "apfel birne kirsche apfel", "de"),
      R(2L, "apfel birne birne apfel kirsche", "de"),
      R(3L, "apple pear cherry apple", "en"),
      R(10L, "birne apfel apfel", "de"),     // held out, de vocab
      R(15L, "pear apple cherry", "en"),     // held out, en vocab
      R(20L, "zzz qqq www", "de")))          // held out, fully OOV
    val out = graft.llm.Classify.nbTrainScore(d, "doc_id", "text", "lang",
        col("doc_id") < 10).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(5), r.getLong(4))).toMap
    assert(out(10L) == (("de", true, 3L)))
    assert(out(15L) == (("en", true, 3L)))
    // OOV doc: no token evidence — argmax is the prior-heaviest class (de,
    // 2 of 3 train docs), n_used 0
    assert(out(20L) == (("de", true, 0L)))
    assert(out.keySet == Set(10L, 15L, 20L))
  }

  test("quantizeInt8: exact codes, bounded reconstruction error, zero-vector guard") {
    val d = df("id BIGINT, v ARRAY<FLOAT>", Seq(
      R(1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      R(2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))))
    val out = Similarity.quantizeInt8(d, "id", "v").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2)))).toMap
    val (s1, q1) = out(1L)
    assert(math.abs(s1 - 1.0 / 127.0) < 1e-15)
    assert(q1 == Seq(127, -63, 32, 0)) // floor(x/s + .5): -63.5→-63, 31.75→32
    // reconstruction error bounded by scale/2
    val orig = Seq(1.0, -0.5, 0.25, 0.0)
    q1.zip(orig).foreach { case (q, x) =>
      assert(math.abs(q * s1 - x) <= s1 / 2 + 1e-12) }
    val (s2, q2) = out(2L)
    assert(s2 == 0.0 && q2.forall(_ == 0)) // no division on zero vectors
  }

  test("quantizeInt8 plan: filter pushes to the scan, projection is shuffle-free") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quant").toString
    spark.range(0, 200).selectExpr("id AS vec_id",
        "transform(sequence(1, 8), i -> CAST(id * i AS FLOAT)) AS embedding")
      .write.mode("overwrite").parquet(dir)
    val emb = spark.read.parquet(dir).filter(col("vec_id") < 100)
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    val plan = q.queryExecution.executedPlan.toString
    // the quantize projection must not block scan pruning or add an exchange
    assert(plan.contains("LessThan(vec_id,100)"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(q.count() == 100)
  }

  test("assignCells: nearest-centroid by (cos desc, cell asc), zero shuffles") {
    val corpus = spark.range(0, 50).selectExpr("id AS vec_id",
      "array(CAST(id % 7 AS FLOAT), CAST(1 AS FLOAT)) AS embedding")
    val cents = df("cell BIGINT, cv ARRAY<DOUBLE>", Seq(
      R(0L, Seq(0.0, 1.0)),    // "vertical" centroid
      R(1L, Seq(1.0, 0.0)),    // "horizontal" centroid
      R(2L, Seq(0.0, 1.0))))   // duplicate of cell 0: ties must pick cell 0
    val out = Similarity.assignCells(corpus, "vec_id", "embedding",
      cents, "cell", "cv", dim = 2)
    val cells = out.collect().map(r =>
      r.getLong(0) -> r.getLong(r.fieldIndex("ivf_cell"))).toMap
    // id % 7 == 0 → (0,1): exactly vertical, ties between cells 0 and 2 → 0
    assert(cells(0L) == 0L && cells(7L) == 0L)
    // large first component → nearer horizontal
    assert(cells(6L) == 1L && cells(13L) == 1L)
    assert(cells.size == 50) // every vector scoreable → none dropped
    // the assignment is map-side: no KEYED shuffle at any size (the only
    // permissible exchange is fanOut's conditional round-robin spread)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), plan)
    // a corrupted centroid (null element) is unscoreable, never binned:
    // without the guard it would unbox to 0.0 and could WIN the argmax
    val corrupt = df("cell BIGINT, cv ARRAY<DOUBLE>", Seq(
      R(0L, Seq(null, 1.0)), R(1L, Seq(1.0, 0.0))))
    val out2 = Similarity.assignCells(corpus, "vec_id", "embedding",
        corrupt, "cell", "cv", dim = 2)
      .collect().map(_.getLong(2)).toSet
    assert(out2 == Set(1L)) // only the intact centroid ever wins
  }

  test("pqTopK: exact ADC on a codeword-aligned corpus, tie and plan shape") {
    // dim 4, m 2, sub 2; codewords are axis vectors, corpus rows sit ON
    // codewords so every subspace quantizes with zero error and the ADC
    // distance is exactly the full L2²
    val cb = df("vec_id BIGINT, embedding ARRAY<DOUBLE>", Seq(
      R(0L, Seq(0.0, 0.0, 0.0, 0.0)),
      R(1L, Seq(2.0, 0.0, 2.0, 0.0))))
    val corpus = df("vec_id BIGINT, embedding ARRAY<DOUBLE>", Seq(
      R(10L, Seq(0.0, 0.0, 0.0, 0.0)),   // code (1,1)
      R(11L, Seq(2.0, 0.0, 2.0, 0.0)),   // code (2,2)
      R(12L, Seq(2.0, 0.0, 0.0, 0.0)))) // mixed (2,1)
    val q = df("vec_id BIGINT, embedding ARRAY<DOUBLE>", Seq(
      R(99L, Seq(0.0, 0.0, 0.0, 0.0))))
    val out = Similarity.pqTopK(corpus, q, "vec_id", "embedding",
      dim = 4, m = 2, codewords = cb, k = 3)
    val rows = out.collect().map(r =>
      (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // ADC from the zero query: vb 10 → 0, vb 12 → 4 (one subspace on cw2),
    // vb 11 → 8 (both subspaces on cw2); ranks follow ascending dist
    assert(rows.toSeq == Seq((1, 10L, 0.0), (2, 12L, 4.0), (3, 11L, 8.0)))
    // encode+score is map-side up to the bounded TopK agg: the only keyed
    // exchange is the |Q|-keyed aggregator one — never the corpus scored
    // pairs — so the scan side shows no hashpartitioning of corpus rows
    // before the aggregate
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan) // queries ride a broadcast
  }

  test("pqTopK recall: far above chance @10 vs exact L2 on sf0.001 embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 5)
    val approx = Similarity.pqTopK(emb, qs, "vec_id", "embedding",
      dim = 64, m = 4, codewords = emb.filter(col("vec_id") < 16), k = 10)
    // exact-L2 top-10 baseline (PQ approximates L2, not cosine)
    val l2 = (1 to 64).map { i =>
      val x = element_at(col("qv"), i).cast("double") -
        element_at(col("eb"), i).cast("double")
      x * x
    }.reduceLeft(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d"), col("vb"))
    val exact = broadcast(qs.select(col("vec_id").as("qid"), col("embedding").as("qv")))
      .join(emb.select(col("vec_id").as("vb"), col("embedding").as("eb")),
        col("qid") =!= col("vb"))
      .withColumn("d", l2).withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10).select(col("qid"), col("vb"))
    // a 16-codeword training-free codebook is coarse by design: measured
    // mean recall here is 0.34 (numpy cross-check) vs ~0.02 for random
    // ranking — the floor below catches a broken encode/LUT, not codebook
    // quality
    val rec = Similarity.recallAtK(approx, exact)
      .agg(avg(col("recall"))).head.getDouble(0)
    assert(rec >= 0.2, s"mean recall@10 $rec")
  }

  test("ivfPqTopK: candidates only from probed cells; recall above chance") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    val qs = emb.filter(col("vec_id") < 5)
    val out = Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding",
      dim = 64, m = 4, seeds = seeds, cellCol = "cell", cvecCol = "cv",
      isCodeword = col("vec_id") >= 8 && col("vec_id") < 24,
      k = 10, nprobe = 2).cache()
    // structural: every candidate's assigned cell is one of its query's
    // two coarse-probed cells (the IVF contract — the corpus was never
    // scored outside the probe set)
    val asn = Similarity.assignCells(emb, "vec_id", "embedding",
      seeds, "cell", "cv", dim = 64)
    val cellOf = asn.select(col("vec_id"), col("ivf_cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qSeeds = seeds.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val qVecs = qs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cosd(a: Array[Double], b: Array[Double]): Double = {
      val num = a.zip(b).map { case (x, y) => x * y }.sum
      num / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val probed = qVecs.map { case (qid, qv) =>
      qid -> qSeeds.toSeq.map { case (c, cv) => (cosd(qv, cv), c) }
        .sortBy { case (cs, c) => (-cs, c) }.take(2).map(_._2).toSet
    }
    out.collect().foreach { r =>
      val (qid, vb) = (r.getLong(0), r.getLong(2))
      assert(probed(qid).contains(cellOf(vb)),
        s"candidate $vb of query $qid is outside the probed cells")
    }
    // recall floor: measured 0.24 vs exact L2 (numpy cross-check) — the
    // nprobe-2-of-8 restriction plus the 16-codeword codebook; the floor
    // catches broken residual/LUT plumbing (~0.02 at random), not quality
    val l2 = (1 to 64).map { i =>
      val x = element_at(col("qv"), i).cast("double") -
        element_at(col("eb"), i).cast("double")
      x * x
    }.reduceLeft(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d"), col("vb"))
    val exact = broadcast(qs.select(col("vec_id").as("qid"), col("embedding").as("qv")))
      .join(emb.select(col("vec_id").as("vb"), col("embedding").as("eb")),
        col("qid") =!= col("vb"))
      .withColumn("d", l2).withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10).select(col("qid"), col("vb"))
    val rec = Similarity.recallAtK(out, exact)
      .agg(avg(col("recall"))).head.getDouble(0)
    assert(rec >= 0.1, s"mean recall@10 $rec")
  }

  test("unigram trainSegment: frequent pieces win Viterbi; words reconstruct") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "ab ab ab abab")))
    val out = graft.llm.Unigram.trainSegment(d, "text",
        maxPiece = 4, maxLen = 8, emRounds = 0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getString(4))).toMap
    // hand-computed init model: cnt(ab)=5, cnt(abab)=1, total=20 →
    // [ab|ab] scores 25/400 > [abab] 1/20 — the frequent piece wins
    assert(out("abab") == ((1L, 2, "ab|ab")))
    assert(out("ab") == ((3L, 1, "ab")))
    // segmentation is a partition of the word
    out.foreach { case (w, (_, _, seg)) =>
      assert(seg.split("\\|").mkString == w)
    }
    // EM refinement keeps reconstructing and never widens the piece count
    val em = graft.llm.Unigram.trainSegment(d, "text",
        maxPiece = 4, maxLen = 8, emRounds = 1)
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    em.foreach { case (w, seg) => assert(seg.split("\\|").mkString == w) }
    assert(em("abab") == "ab|ab") // EM reinforces the chosen pieces
  }

  test("unigram trainEncode: held-out words segment under the frozen model; OOV drops") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "ab ab abab"),   // train
      R(2L, "ab ab"),        // train
      R(5L, "abab xy")))     // held out: abab segmentable, xy has unseen chars
    val out = graft.llm.Unigram.trainEncode(d, "text",
        isTrain = col("doc_id") < 5, maxPiece = 4, maxLen = 8, emRounds = 1)
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(out.keySet == Set("abab")) // xy is OOV under the trained pieces
    assert(out("abab").split("\\|").mkString == "abab")
  }

  test("typoPairs: deletion blocking finds sub/ins/del neighbors, nothing else") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "cat car cart scat chat dog")))
    val pairs = Dedup.typoPairs(d, "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // cat↔car substitution, cat↔cart insertion, cat↔scat / cat↔chat
    // insertions; dog is isolated; car↔cart also lev 1
    assert(pairs.contains(("car", "cat", 1)))
    assert(pairs.contains(("cat", "cart", 1)) || pairs.contains(("cart", "cat", 1)))
    assert(pairs.contains(("cat", "scat", 1)) || pairs.contains(("scat", "cat", 1)))
    assert(!pairs.exists(p => p._1 == "dog" || p._2 == "dog"))
    assert(pairs.forall(_._3 <= 1))
  }

  test("unigramSurprisal: rare tokens score higher; token-less docs surface NULL") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "common common common common"),
      R(2L, "common rareword"),
      R(3L, "")))
    val out = TextAnalysis.unigramSurprisal(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    // corpus unigrams: common ×5, rareword ×1, total 6
    val sCommon = -math.log10(5.0 / 6.0)
    val sRare = -math.log10(1.0 / 6.0)
    assert(out(1L).getLong(1) == 4)
    assert(math.abs(out(1L).getDouble(2) - sCommon) < 1e-6)
    assert(math.abs(out(2L).getDouble(2) - (sCommon + sRare) / 2) < 1e-6)
    assert(out(2L).getDouble(2) > out(1L).getDouble(2)) // rare doc ranks higher
    assert(out(3L).getLong(1) == 0 && out(3L).isNullAt(2))
  }

  test("recallAtK: per-query intersection over exact; absent queries score 0") {
    val exact = df("qid BIGINT, vb BIGINT", Seq(
      R(1L, 10L), R(1L, 11L), R(2L, 20L), R(2L, 21L), R(3L, 30L)))
    val approx = df("qid BIGINT, vb BIGINT", Seq(
      R(1L, 10L), R(1L, 99L), R(2L, 20L), R(2L, 21L)))
    val out = Similarity.recallAtK(approx, exact).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 2L, 1.0)))
    assert(out(3L) == ((1L, 0L, 0.0))) // query absent from approx entirely
  }

  test("fake-codec video injection: one init per partition, corrupt rows drop") {
    // seeded frame-generator "codec" standing in for the video decoder no
    // JVM codec exists for: deterministic features from the payload bytes,
    // refuses payloads without the magic header. Accumulators observe the
    // plumbing: mkCodec fires once per PARTITION (init amortization), the
    // decode fn once per ROW, and None rows vanish without killing the job.
    val inits = spark.sparkContext.longAccumulator("codec_inits")
    val calls = spark.sparkContext.longAccumulator("codec_calls")
    val rows = (1L to 100L).map { i =>
      val magic = if (i % 10 == 0) "BAD!" else "VID0"
      R(i, (magic + "frame" * i.toInt).getBytes("UTF-8"), s"clip $i")
    }
    val d = df("doc_id BIGINT, payload BINARY, text STRING", rows)
    val out = Multimodal.decodeFeaturesWith(d, "doc_id") { () =>
      inits.add(1)
      (id, payload) => {
        calls.add(1)
        if (payload.length >= 4 &&
            new String(payload.take(4), "UTF-8") == "VID0")
          Some(Multimodal.MediaFeatures(id, payload.length, "video/fake",
            payload.foldLeft(0L)((a, b) => a + (b & 0xff)), payload.take(8)))
        else None
      }
    }
    val feats = out.collect()
    assert(feats.map(_.id).toSet == (1L to 100L).filterNot(_ % 10 == 0).toSet)
    assert(feats.forall(_.format == "video/fake"))
    assert(calls.value == 100)                       // every row reached the codec
    assert(inits.value == out.rdd.getNumPartitions)  // exactly one init per partition
    assert(inits.value < calls.value)                // init amortizes across the batch
  }

  test("multimodal decodeFeatures stub preserves batch plumbing") {
    val d = Multimodal.attachPayload(docs, "doc_id", "text")
    val feats = Multimodal.decodeFeatures(d, "doc_id").collect()
      .map(f => f.id -> f).toMap
    assert(feats(1L).n_bytes == docs.filter(col("doc_id") === 1)
      .select(length(col("text"))).collect().head.getInt(0))
    assert(feats(1L).checksum == feats(4L).checksum) // same content
    assert(feats(1L).head.length == 8)
  }

  test("mmrRerank: demotes the near-duplicate of an already-selected hit") {
    // c1 and c2 are identical (sim = 1.0); c3 is less relevant but novel.
    // Pure relevance (λ = 1) orders [c1, c2, c3]; at λ = 0.5 the duplicate's
    // redundancy penalty pushes the novel c3 ahead of it.
    val emb = df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(
      R(0L, Seq(1.0f, 0.0f, 0.0f)),          // query
      R(1L, Seq(0.9f, 0.1f, 0.0f)),
      R(2L, Seq(0.9f, 0.1f, 0.0f)),          // exact duplicate of 1
      R(3L, Seq(0.8f, 0.0f, 0.3f))))
    def order(lambda: Double): Seq[Long] =
      Similarity.mmrRerank(emb, "vec_id", "embedding", dim = 3, queryId = 0L,
          nCand = 3, k = 3, lambda = lambda)
        .orderBy("rank").collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(order(1.0) == Seq(1L, 2L, 3L), "λ=1 is pure relevance order")
    assert(order(0.5) == Seq(1L, 3L, 2L), "λ=0.5 must interleave the novel hit")
  }

  test("mmrRerank: scores are the rounded greedy recurrence; ranks contiguous") {
    val emb = df("vec_id BIGINT, embedding ARRAY<FLOAT>", Seq(
      R(0L, Seq(1.0f, 0.0f)), R(1L, Seq(0.6f, 0.8f)),
      R(2L, Seq(0.8f, 0.6f)), R(3L, Seq(0.0f, 1.0f))))
    val out = Similarity.mmrRerank(emb, "vec_id", "embedding", dim = 2,
        queryId = 0L, nCand = 3, k = 3, lambda = 0.7)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    // step 1 is λ·rel with an empty penalty term
    val first = out.head
    assert(first.getAs[Long]("vec_id") == 2L)
    assert(math.abs(first.getAs[Double]("score")
      - 0.7 * first.getAs[Double]("rel")) < 1e-9)
    // every later score carries a strictly positive redundancy penalty here
    out.tail.foreach { r =>
      assert(r.getAs[Double]("score") < 0.7 * r.getAs[Double]("rel"))
    }
  }
}
