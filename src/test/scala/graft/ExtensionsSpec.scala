package graft

import org.apache.spark.sql.functions._

import graft.plans.{SearchSorted, UTMacroParser}

class ExtensionsSpec extends SparkSpec {

  test("SearchSorted expression: binary search matches the CASE-chain variant") {
    val bounds = Seq(0.0, 0.1, 0.4, 1.0, 5.0, 20.0, 100.0)
    val d = df("v DOUBLE", Seq(R(-1.0), R(0.0), R(0.25), R(3.0), R(150.0)))
    val native = d.select(SearchSorted.searchsorted(
        lit(bounds.toArray), col("v")).as("b")).collect().map(_.getInt(0))
    val chain = d.select(graft.functions.Phys.searchSorted(col("v"), bounds).as("b"))
      .collect().map(_.getInt(0))
    assert(native.toSeq == chain.toSeq)
    assert(native.toSeq == Seq(0, 1, 2, 4, 7))
  }

  test("SearchSorted registered as a SQL function") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "searchsorted", exprs => SearchSorted(exprs.head, exprs(1)), "scala_udf")
    val out = spark.sql(
      "SELECT searchsorted(array(0.0D, 1.0D, 5.0D), 2.5D) AS b").collect().head.getInt(0)
    assert(out == 2)
  }

  test("PushdownUnixTimestamp rewrites the predicate and restores parquet pushdown") {
    import graft.plans.PushdownUnixTimestamp
    val events = Core.table(spark, "/root/testdata/sf0.001", "events")
    val original = events.filter(unix_timestamp(col("ts")) >= 1704412800L)

    // semantic equivalence at exact-second boundaries
    val boundary = df("ts TIMESTAMP", Seq(
      R(java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),          // == v
      R(new java.sql.Timestamp(1704412800L * 1000 + 500)),           // v + 0.5s
      R(new java.sql.Timestamp(1704412799L * 1000 + 999))))          // v − 1ms
    Seq[(org.apache.spark.sql.Column, Long)](
      (unix_timestamp(col("ts")) >= 1704412800L, 2L),
      (unix_timestamp(col("ts")) > 1704412800L, 0L),
      (unix_timestamp(col("ts")) <= 1704412800L, 3L),
      (unix_timestamp(col("ts")) < 1704412800L, 1L),
      (unix_timestamp(col("ts")) === 1704412800L, 2L)).foreach { case (pred, expected) =>
      val plainCount = boundary.filter(pred).count()
      assert(plainCount == expected)
      val rewritten = PushdownUnixTimestamp(boundary.filter(pred)
        .queryExecution.analyzed)
      // execute the rewritten plan through a fresh Dataset
      val rewrittenCount = org.apache.spark.sql.graftbridge.ColumnBridge
        .ofRows(spark, rewritten).count()
      assert(rewrittenCount == expected, s"rewrite changed semantics for $pred")
    }

    // the rewritten plan exposes a pushable filter on the bare ts column
    val rewrittenPlan = PushdownUnixTimestamp(original.queryExecution.analyzed)
    assert(!rewrittenPlan.toString.toLowerCase.contains("unix_timestamp"))
  }

  test("PushdownUnixTimestamp leaves non-positive literals alone (toward-zero truncation)") {
    import graft.plans.PushdownUnixTimestamp
    // unix_timestamp truncates toward zero: ts = −0.5 s has trunc 0, so
    // `trunc(ts) >= 0` must KEEP it — a floor-style rewrite to `ts >= 0`
    // would drop it. The rule only fires for literals >= 1.
    val preEpoch = df("ts TIMESTAMP", Seq(
      R(new java.sql.Timestamp(-500)),     // 1969-12-31 23:59:59.5 → trunc 0
      R(new java.sql.Timestamp(500))))     // 1970-01-01 00:00:00.5 → trunc 0
    val pred = unix_timestamp(col("ts")) >= 0L
    assert(preEpoch.filter(pred).count() == 2L)
    val rewritten = PushdownUnixTimestamp(
      preEpoch.filter(pred).queryExecution.analyzed)
    assert(rewritten.toString.toLowerCase.contains("unix_timestamp"),
      "v = 0 must not be rewritten")
    assert(org.apache.spark.sql.graftbridge.ColumnBridge
      .ofRows(spark, rewritten).count() == 2L)
  }

  test("UTMacroParser rewrites UT( before delegating to the real parser") {
    val parser = new UTMacroParser(spark.sessionState.sqlParser)
    val plan = parser.parsePlan("SELECT UT(ts) FROM tbl")
    assert(plan.toString.toLowerCase.contains("unix_timestamp"))
    // identifiers untouched
    assert(parser.parseTableIdentifier("tbl").table == "tbl")
  }

  test("LLM operators as table-valued functions: SQL round-trips equal the Scala API") {
    import graft.plans.TableFunctions
    // the GraftExtensions registration shape, applied to the live session
    TableFunctions.descriptors.foreach { case (ident, _, builder) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "scala_udf")
    }
    val docs = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      R(2L, "the quick brown fox jumps over the lazy dog near the river bend"),
      R(3L, "completely different content with no overlap whatsoever here today"),
      R(4L, "the quick brown fox jumps over the lazy dog near the river bank"),
      R(5L, "tiny")))
    docs.createOrReplaceTempView("tvf_docs")
    val fresh = df("doc_id BIGINT, text STRING", Seq(
      R(10L, "the quick brown fox jumps over the lazy dog near the river bend"),
      R(11L, "a wholly new document about spark shuffles and parquet files")))
    fresh.createOrReplaceTempView("tvf_fresh")
    def rows(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.collect().map(_.toString).sorted.toSeq

    assert(rows(spark.sql("SELECT * FROM dedup_exact('tvf_docs', 'doc_id', 'text')"))
      == rows(graft.llm.Dedup.exact(docs, "doc_id", "text")))
    assert(rows(spark.sql(
        "SELECT * FROM dedup_minhash('tvf_docs', 'doc_id', 'text', 0.5)"))
      == rows(graft.llm.Dedup.minhashDedup(docs, "doc_id", "text",
        minJaccard = 0.5)))
    assert(rows(spark.sql(
        "SELECT * FROM dedup_cross_corpus('tvf_fresh', 'tvf_docs', 'doc_id', 'text')"))
      == rows(graft.llm.Dedup.crossCorpusDedup(fresh, docs, "doc_id", "text")))
    assert(rows(spark.sql(
        "SELECT * FROM quality_filter('tvf_docs', 'doc_id', 'text', 5)"))
      == rows(graft.llm.Curation.qualityFilter(docs, "doc_id", "text",
        minTokens = 5)))
    assert(rows(spark.sql("SELECT * FROM text_features('tvf_docs', 'doc_id', 'text')"))
      == rows(graft.llm.TextAnalysis.qualityFeatures(docs, "doc_id", "text")))

    val emb = {
      import spark.implicits._
      (0 until 20).map(i => (i.toLong,
        Array.tabulate(8)(d => math.sin(i * 1.3 + d).toFloat)))
        .toDF("vec_id", "embedding")
    }
    emb.createOrReplaceTempView("tvf_emb")
    emb.filter(col("vec_id") < 3).createOrReplaceTempView("tvf_q")
    assert(rows(spark.sql(
        "SELECT * FROM simsearch_topk('tvf_emb', 'tvf_q', 'vec_id', 'embedding', 8, 4)"))
      == rows(graft.llm.Similarity.bruteForceTopKAgg(emb,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding", 8, 4)))

    // the relation COMPOSES: a TVF inside a CTE, filtered and joined
    val composed = spark.sql(
      """WITH pairs AS (SELECT * FROM dedup_minhash('tvf_docs', 'doc_id', 'text', 0.5))
        SELECT p.da, p.db, d.text FROM pairs p
        JOIN tvf_docs d ON d.doc_id = p.db WHERE p.jac >= 0.9""")
    assert(composed.count() >= 1)

    // loud failures: non-literal table argument, wrong arity
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM dedup_exact(doc_id, 'doc_id', 'text')").collect())
    assert(e1.getMessage.contains("string literal") ||
      e1.getMessage.toLowerCase.contains("unresolved"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM dedup_exact('tvf_docs')").collect())
    assert(e2.getMessage.contains("3 to 3") ||
      e2.getMessage.toLowerCase.contains("argument"), e2.getMessage)
  }

  test("widened TVF gateway: curation/text/sampling/CDC operators round-trip the Scala API") {
    import graft.plans.TableFunctions
    import graft.llm.{Curation, Dedup, TextAnalysis}
    import graft.operators.Relational
    TableFunctions.descriptors.foreach { case (ident, _, builder) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "scala_udf")
    }
    def rows(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.collect().map(_.toString).sorted.toSeq
    val docs = df("doc_id BIGINT, dom STRING, score DOUBLE, text STRING", Seq(
      R(1L, "a.com", 0.9, "the quick brown fox jumps over the lazy dog near the river bank"),
      R(2L, "a.com", 0.7, "the quick brown fox jumps over the lazy dog near the river bend"),
      R(3L, "b.org", 0.8, "completely different content with no overlap whatsoever here today"),
      R(4L, "a.com", 0.6, "the quick brown fox jumps over the lazy dog near the river bank"),
      R(5L, "b.org", 0.5, "Visit https://x.io or mail me at a@b.com <b>now</b> today!")))
    docs.createOrReplaceTempView("tvf_w_docs")

    assert(rows(spark.sql(
        "SELECT * FROM chunk_documents('tvf_w_docs', 'doc_id', 'text', 20, 5)"))
      == rows(Curation.chunkDocuments(docs, "doc_id", "text", 20, 5)))
    assert(rows(spark.sql("SELECT * FROM text_langid('tvf_w_docs', 'doc_id', 'text')"))
      == rows(TextAnalysis.langId(docs, "doc_id", "text")))
    assert(rows(spark.sql(
        "SELECT * FROM text_normalize('tvf_w_docs', 'doc_id', 'text')"))
      == rows(TextAnalysis.normalizeText(docs, "doc_id", "text")))
    assert(rows(spark.sql(
        "SELECT * FROM text_strip_markup('tvf_w_docs', 'doc_id', 'text')"))
      == rows(TextAnalysis.stripMarkup(docs, "doc_id", "text")))
    assert(rows(spark.sql("SELECT * FROM text_tfidf('tvf_w_docs', 'doc_id', 'text')"))
      == rows(TextAnalysis.tfidf(docs, "doc_id", "text")))
    assert(rows(spark.sql(
        "SELECT * FROM text_bm25('tvf_w_docs', 'doc_id', 'text', 'fox,river', 1.2, 0.75)"))
      == rows(TextAnalysis.bm25(docs, "doc_id", "text", Seq("fox", "river"))))
    assert(rows(spark.sql(
        "SELECT * FROM text_fingerprint('tvf_w_docs', 'doc_id', 'text', 5)"))
      == rows(TextAnalysis.fingerprint(docs, "doc_id", "text", 5)))
    assert(rows(spark.sql("SELECT * FROM pii_redact('tvf_w_docs', 'doc_id', 'text')"))
      == rows(Curation.redactPii(docs, "doc_id", "text")))
    assert(rows(spark.sql(
        "SELECT * FROM dedup_exact_digest('tvf_w_docs', 'doc_id', 'text')"))
      == rows(Dedup.exactByDigest(docs, "doc_id", "text")))
    assert(rows(spark.sql(
        "SELECT * FROM curation_domain_cap('tvf_w_docs', 'doc_id', 'dom', 'score', 2)"))
      == rows(Curation.domainCap(docs, "doc_id", "dom", "score", 2)))
    assert(rows(spark.sql(
        "SELECT * FROM curation_wordlist_screen('tvf_w_docs', 'doc_id', 'text', 'fox,dog', 0.2)"))
      == rows(Curation.wordlistScreen(docs, "doc_id", "text",
        Seq("fox", "dog"), 0.2)))
    assert(rows(spark.sql(
        "SELECT * FROM curation_pack_sequences('tvf_w_docs', 'doc_id', 'text', 'dom', 16)"))
      == rows(Curation.packSequences(docs, "doc_id", "text", "dom", 16)))
    assert(rows(spark.sql(
        "SELECT * FROM sample_split_assign('tvf_w_docs', 'doc_id', 'train:0.8,val:0.1,test:0.1')"))
      == rows(Curation.splitAssign(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))))
    assert(rows(spark.sql(
        "SELECT * FROM sample_stratified('tvf_w_docs', 'doc_id', 'dom', 'a.com:0.9', 0.5, 's')"))
      == rows(Curation.stratifiedSample(docs, "doc_id", "dom",
        Map("a.com" -> 0.9), 0.5, "s")))

    // CDC / dimension history
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val ops = df("uid BIGINT, tier STRING, vts TIMESTAMP, tts TIMESTAMP, eid BIGINT, op STRING",
      Seq(
        R(1L, "gold", t(1), t(2), 1L, "I"),
        R(1L, "silver", t(5), t(6), 2L, "U"),
        R(2L, "gold", t(2), t(3), 3L, "I"),
        R(2L, null, t(4), t(5), 4L, "D")))
    ops.createOrReplaceTempView("tvf_w_ops")
    assert(rows(spark.sql(
        "SELECT * FROM cdc_apply('tvf_w_ops', 'uid', 'vts', 'eid', 'op')"))
      == rows(Relational.cdcApply(ops, "uid", "vts", "eid", "op")))
    assert(rows(spark.sql(
        "SELECT * FROM scd2('tvf_w_ops', 'uid', 'tier', 'vts', 'eid', 'op')"))
      == rows(Relational.cdcScd2(ops, "uid", "tier", "vts", "eid", "op")))
    Relational.cdcScd2(ops, "uid", "tier", "vts", "eid", "op")
      .createOrReplaceTempView("tvf_w_hist")
    assert(rows(spark.sql(
        "SELECT * FROM scd2_snapshot_at('tvf_w_hist', '2024-01-03 10:00:00')"))
      == rows(Relational.snapshotAt(spark.table("tvf_w_hist"),
        lit("2024-01-03 10:00:00").cast("timestamp"))))
    assert(rows(spark.sql(
        "SELECT * FROM scd2_bitemporal('tvf_w_ops', 'uid', 'tier', 'vts', 'tts', 'eid', 'op')"))
      == rows(Relational.cdcScd2Bitemporal(ops, "uid", "tier", "vts",
        "tts", "eid", "op")))
    val viaLog = rows(spark.sql(
      """SELECT * FROM snapshot_as_of_log('tvf_w_ops', 'uid', 'tier', 'vts',
        'tts', 'eid', 'op', '2024-01-03 10:00:00', '2024-01-04 10:00:00')"""))
    assert(viaLog == rows(Relational.snapshotAsOfLog(ops, "uid", "tier",
      "vts", "tts", "eid", "op",
      lit("2024-01-03 10:00:00").cast("timestamp"),
      lit("2024-01-04 10:00:00").cast("timestamp"))))
    assert(viaLog.nonEmpty)

    // list-literal failures stay loud
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM sample_split_assign('tvf_w_docs', 'doc_id', 'train0.8')")
      .collect())
    assert(e1.getMessage.contains("name:weight"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM text_bm25('tvf_w_docs', 'doc_id', 'text', '')").collect())
    assert(e2.getMessage.contains("list literal"), e2.getMessage)
    // an unparseable timestamp literal must fail at analysis, never
    // silently return an empty snapshot (cast-to-NULL filter)
    val e3 = intercept[Exception](spark.sql(
      "SELECT * FROM scd2_snapshot_at('tvf_w_hist', '03/01/2024')").collect())
    assert(e3.getMessage.contains("timestamp literal"), e3.getMessage)
    // ≥20-TVF gateway contract (the reference's P1 exposes every operator
    // via SQL; this pins the Spark gateway's breadth)
    assert(TableFunctions.descriptors.size >= 20,
      s"TVF gateway shrank: ${TableFunctions.descriptors.size}")
  }

  test("second TVF wave: dedup variants / vocab / sampling / sessionize / sketches round-trip") {
    import graft.plans.TableFunctions
    import graft.llm.{Curation, Dedup, TextAnalysis}
    import graft.operators.{Sketch, Windows}
    TableFunctions.descriptors.foreach { case (ident, _, builder) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "scala_udf")
    }
    def rows(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.collect().map(_.toString).sorted.toSeq
    val docs = df("doc_id BIGINT, src STRING, wt DOUBLE, text STRING", Seq(
      R(1L, "web", 2.0, "the quick brown fox jumps over the lazy dog near the river bank"),
      R(2L, "web", 1.0, "the quick brown fox jumps over the lazy dog near the river bend"),
      R(3L, "book", 3.0, "completely different content with no overlap whatsoever here today"),
      R(4L, "web", 0.5, "the quick brown fox jumps over the lazy dog near the river bank"),
      R(5L, "book", 1.5, "more words about rivers and foxes in the quiet green valley")))
    docs.createOrReplaceTempView("tvf2_docs")

    assert(rows(spark.sql("SELECT * FROM dedup_simhash('tvf2_docs', 'doc_id', 'text')"))
      == rows(Dedup.simhash16(docs, "doc_id", "text")))
    assert(rows(spark.sql(
        "SELECT * FROM dedup_prefix_jaccard('tvf2_docs', 'doc_id', 'text', 3, 0.5)"))
      == rows(Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.5)))
    assert(rows(spark.sql(
        "SELECT * FROM dedup_containment('tvf2_docs', 'doc_id', 'text', 3, 0.8, 1000)"))
      == rows(Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8, 1000)))
    val pairs = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    pairs.createOrReplaceTempView("tvf2_pairs")
    assert(rows(spark.sql("SELECT * FROM dedup_clusters('tvf2_pairs')"))
      == rows(Dedup.resolveClusters(pairs)))
    Dedup.resolveClusters(pairs).createOrReplaceTempView("tvf2_clusters")
    assert(rows(spark.sql(
        "SELECT * FROM dedup_canonicalize('tvf2_docs', 'tvf2_clusters', 'doc_id')"))
      == rows(Dedup.canonicalize(docs,
        spark.table("tvf2_clusters"), "doc_id")))
    assert(rows(spark.sql("SELECT * FROM text_vocabulary('tvf2_docs', 'doc_id', 'text', 10)"))
      == rows(TextAnalysis.vocabulary(docs, "doc_id", "text", 10)))
    assert(rows(spark.sql("SELECT * FROM text_zipf_fit('tvf2_docs', 'text', 20)"))
      == rows(TextAnalysis.zipfFit(docs, "text", 20)))
    assert(rows(spark.sql(
        "SELECT * FROM sample_reservoir('tvf2_docs', 'doc_id', 'src', 1, 's')"))
      == rows(Curation.hashReservoir(docs, "doc_id", "src", 1, "s")))
    assert(rows(spark.sql(
        "SELECT * FROM sample_weighted('tvf2_docs', 'doc_id', 'wt', 2, 's')"))
      == rows(Curation.weightedSample(docs, "doc_id", "wt", 2, "s")))
    assert(rows(spark.sql("SELECT * FROM corpus_mixture('tvf2_docs', 'src', 0.5)"))
      == rows(Curation.mixtureWeights(docs, "src", 0.5)))
    assert(rows(spark.sql("SELECT * FROM corpus_shuffle('tvf2_docs', 'doc_id', 2, 'x')"))
      == rows(Curation.shuffleShards(docs, "doc_id", 2, "x")))
    val ev = df("uid BIGINT, ts TIMESTAMP", Seq(
      R(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      R(1L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00")),
      R(1L, java.sql.Timestamp.valueOf("2024-01-01 13:00:00")),
      R(2L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"))))
    ev.createOrReplaceTempView("tvf2_events")
    assert(rows(spark.sql("SELECT * FROM sessionize('tvf2_events', 'uid', 'ts', 3600)"))
      == rows(Windows.sessionize(ev, "uid", "ts", 3600L)))
    assert(rows(spark.sql(
        "SELECT * FROM sketch_hll_distinct('tvf2_docs', 'src', 'text', 64)"))
      == rows(Sketch.hllDistinct(docs, "src", "text", 64)))
    assert(rows(spark.sql("SELECT * FROM sketch_cms_topk('tvf2_docs', 'text', 3, 256, 5)"))
      == rows(Sketch.cmsTopK(docs, "text", 3, 256, 5)))
    assert(TableFunctions.descriptors.size >= 40,
      s"TVF gateway shrank: ${TableFunctions.descriptors.size}")
  }

  test("serve-path TVFs: persisted dedup/IVF/HNSW indexes probed from SQL") {
    import graft.plans.TableFunctions
    import graft.llm.{DedupIndex, GraphAnnIndex, Similarity}
    TableFunctions.descriptors.foreach { case (ident, _, builder) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "scala_udf")
    }
    def tmp(name: String): String = {
      val f = new java.io.File(sys.props("java.io.tmpdir"), name)
      val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      f.getAbsolutePath
    }
    // dedup index
    val ref = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      R(2L, "completely different content with no overlap whatsoever here today")))
    val dPath = tmp("graft_tvf_dedup_idx")
    DedupIndex.save(ref, "doc_id", "text", dPath)
    df("doc_id BIGINT, text STRING", Seq(
      R(10L, "the quick brown fox jumps over the lazy dog near the river bend"),
      R(11L, "a wholly new document about spark shuffles and row groups")))
      .createOrReplaceTempView("tvf_probe_docs")
    def rows(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.collect().map(_.toString).sorted.toSeq
    assert(rows(spark.sql(
        s"SELECT * FROM dedup_index_probe('$dPath', 'tvf_probe_docs', 'doc_id', 'text')"))
      == rows(DedupIndex.query(spark, dPath,
        spark.table("tvf_probe_docs"), "doc_id", "text")))

    // IVF + HNSW layouts over one vector corpus
    val vecs = {
      import spark.implicits._
      (0 until 40).map(i => (i.toLong,
        Array.tabulate(8)(d => math.sin(i % 4 * 2.1 + d).toFloat)))
        .toDF("vec_id", "embedding")
    }
    val cents = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    vecs.filter(col("vec_id") >= 36).createOrReplaceTempView("tvf_q_vecs")
    val (assigned, model) = Similarity.kmeansIndex(vecs, "vec_id",
      "embedding", nlist = 4)
    val aPath = tmp("graft_tvf_ann_idx")
    Similarity.saveIndex(assigned, model, aPath)
    assert(rows(spark.sql(
        s"SELECT * FROM ann_probe('$aPath', 'tvf_q_vecs', 'vec_id', 'embedding', 8, 3, 2)"))
      == rows(Similarity.probeIndex(spark, aPath,
        spark.table("tvf_q_vecs"), "vec_id", "embedding", 8, 3, 2)))
    val gPath = tmp("graft_tvf_gann_idx")
    GraphAnnIndex.save(spark, vecs, cents, "vec_id", "embedding",
      "cell", "cv", dim = 8, m = 3, maxLevel = 1, gPath)
    val viaSql = rows(spark.sql(
      s"SELECT * FROM graph_ann_probe('$gPath', 'tvf_q_vecs', 'vec_id', 'embedding', 3, 4, 2)"))
    assert(viaSql == rows(GraphAnnIndex.probe(spark, gPath,
      spark.table("tvf_q_vecs"), "vec_id", "embedding", 3, 4, 2)))
    assert(viaSql.nonEmpty)
  }
}
