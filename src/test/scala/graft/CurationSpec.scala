package graft

import org.apache.spark.sql.functions._

import graft.llm.{Curation, TextAnalysis}

class CurationSpec extends SparkSpec {

  private def corpus = df("doc_id BIGINT, text STRING, lang STRING", Seq(
    R(1L, "the quick brown fox jumps over the lazy dog", "en"),
    R(2L, "pack my box with five dozen liquor jugs today", "en"),
    R(3L, "the quick brown fox jumps over the lazy dog", "de"), // = bench doc
    R(4L, "tiny", "en"), // shorter than n tokens: no shingles
    R(5L, "half overlap here the quick brown fox sits still", "fr")))

  private def bench = df("doc_id BIGINT, text STRING", Seq(
    R(100L, "the quick brown fox jumps over the lazy dog")))

  test("contaminationScore: exact bench copy flagged, short doc scores 0/0") {
    val out = Curation.contaminationScore(corpus, bench, "doc_id", "text",
        n = 3, threshold = 0.2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(3L) == ((7L, 7L, 1.0, true)))      // identical to the bench doc
    assert(out(2L)._2 == 0L && !out(2L)._4)       // disjoint
    assert(out(4L) == ((0L, 0L, 0.0, false)))     // no shingles, present, unflagged
    assert(out(5L)._2 > 0L && out(5L)._2 < out(5L)._1) // partial overlap
    assert(out.size == 5)                         // every corpus doc surfaces
  }

  test("stratifiedSample: deterministic, rate-monotone, honors strata rates") {
    val many = spark.range(0, 2000).selectExpr("id AS doc_id",
      "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END AS lang")
    def run(rates: Map[String, Double], dflt: Double) =
      Curation.stratifiedSample(many, "doc_id", "lang", rates, dflt)
    val a = run(Map("en" -> 0.5), 0.1).collect().map(_.getLong(0)).toSet
    val b = run(Map("en" -> 0.5), 0.1).collect().map(_.getLong(0)).toSet
    assert(a == b)                                     // no RNG state
    assert(run(Map("en" -> 1.0), 1.0).count() == 2000) // rate 1 keeps all
    assert(run(Map("en" -> 0.0), 0.0).count() == 0)    // rate 0 keeps none
    // smaller rate ⊂ larger rate within a stratum (same hash, lower cut)
    val small = run(Map("en" -> 0.2), 0.0).collect().map(_.getLong(0)).toSet
    val large = run(Map("en" -> 0.6), 0.0).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
    // en sampled at ~50%, de at ~10% of 1000 each
    val n = run(Map("en" -> 0.5), 0.1)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("en") > 400 && n("en") < 600, n)
    assert(n("de") > 50 && n("de") < 160, n)
  }

  test("qualityFilter: flags attribute the drop; keep needs every rule green") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "the quick brown fox jumps over a lazy dog near the river bank"),
      R(2L, "tiny"),
      R(3L, "spam spam spam spam spam spam spam spam"),
      R(4L, "")))
    val out = Curation.qualityFilter(d, "doc_id", "text",
        minTokens = 5, maxTokens = 100, maxRepetition = 0.3,
        minStopRatio = 0.05)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 13 tokens, stopwords the/a/the → ratio ≈ 0.23, no repetition
    assert(out(1L).getAs[Boolean]("keep"))
    // doc 2: one token → short
    assert(out(2L).getAs[Boolean]("flag_short") && !out(2L).getAs[Boolean]("keep"))
    // doc 3: "spam spam" ×7 grams, 1 distinct → rep ≈ 0.857; zero stopwords
    assert(out(3L).getAs[Boolean]("flag_repetitive"))
    assert(out(3L).getAs[Boolean]("flag_no_stopwords"))
    assert(!out(3L).getAs[Boolean]("keep"))
    // doc 4: zero tokens — short, stop ratio defined as 0 (no divide), flagged
    assert(out(4L).getLong(1) == 0)
    assert(out(4L).getAs[Boolean]("flag_short") && !out(4L).getAs[Boolean]("keep"))
  }

  test("hashReservoir rejects a non-integral id column loudly") {
    // a string/uuid id would cast to null and silently return an EMPTY
    // sample — the documented integral contract must fail fast instead
    val d = df("uuid STRING, lang STRING", Seq(R("a-1", "de"), R("b-2", "fr")))
    val e = intercept[IllegalArgumentException] {
      Curation.hashReservoir(d, "uuid", "lang", k = 1)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("hashReservoir accepts byte/short ids (type-based check, not simpleString)") {
    // regression: the old name-based whitelist compared against "byte"/"short"
    // but Spark spells those simpleStrings "tinyint"/"smallint" — valid
    // narrow integral ids were falsely rejected
    val d = spark.range(0, 40).selectExpr(
      "CAST(id AS SMALLINT) AS doc_id",
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS lang")
    val out = Curation.hashReservoir(d, "doc_id", "lang", k = 3)
    assert(out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("a" -> 3L, "b" -> 3L))
  }

  test("hashReservoir: exactly k per stratum, deterministic, order-independent") {
    val many = spark.range(0, 300).selectExpr("id AS doc_id",
      "CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS lang")
    val out = Curation.hashReservoir(many, "doc_id", "lang", k = 7)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("a" -> 7L, "b" -> 7L))
    val ids1 = out.collect().map(r => (r.getString(1), r.getInt(2), r.getLong(0))).toSet
    // input order must not matter: reverse the input, same sample + ranks
    val ids2 = Curation.hashReservoir(
        many.orderBy(col("doc_id").desc), "doc_id", "lang", k = 7)
      .collect().map(r => (r.getString(1), r.getInt(2), r.getLong(0))).toSet
    assert(ids1 == ids2)
    // scale shape: selection is a bounded partial aggregation (|strata|·k
    // exchange rows), never a per-stratum window sort of the whole stratum
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("domainCap: keeps top-cap per domain by (score DESC, id ASC); NULL never ranks") {
    val d = df("doc_id BIGINT, source STRING, score DOUBLE", Seq(
      R(1L, "hot", 9.0), R(2L, "hot", 7.0), R(3L, "hot", 8.0),
      R(4L, "hot", 7.0),               // ties doc 2 on score → loses on id
      R(5L, "hot", null),              // unscored: must not displace a scored doc
      R(6L, "cold", 1.0)))             // under-cap domain keeps everything
    val out = Curation.domainCap(d, "doc_id", "source", "score", cap = 2)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Int]), r.getBoolean(3)))).toMap
    assert(out(1L) == ((Some(1), true)))   // 9.0 ranks first
    assert(out(3L) == ((Some(2), true)))   // 8.0 second
    assert(out(2L) == ((None, false)))     // 7.0 past the cap
    assert(out(4L) == ((None, false)))
    assert(out(5L) == ((None, false)))     // NULL score: surfaces, never ranks
    assert(out(6L) == ((Some(1), true)))
    assert(out.size == 6)                  // every input doc surfaces
  }

  test("domainCap: order-independent under skew; bounded agg, no window sort") {
    // one maximally hot domain (the scenario the operator exists for)
    val many = spark.range(0, 500).selectExpr("id AS doc_id",
      "CASE WHEN id < 490 THEN 'hot' ELSE concat('d', id) END AS source",
      "CAST(id % 7 AS DOUBLE) AS score")
    val out = Curation.domainCap(many, "doc_id", "source", "score", cap = 3)
    val kept = out.filter(col("keep")).collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(0))).toSet
    assert(kept.count(_._1 == "hot") == 3)
    // hot winners: score 6 (ids 6, 13, 20 after DESC-score, ASC-id ranking)
    assert(kept.filter(_._1 == "hot").map(x => (x._2, x._3)) ==
      Set((1, 6L), (2, 13L), (3, 20L)))
    val kept2 = Curation.domainCap(
        many.orderBy(col("doc_id").desc), "doc_id", "source", "score", cap = 3)
      .filter(col("keep")).collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(0))).toSet
    assert(kept == kept2)
    // scale shape: ranking is a bounded partial aggregation (|domains|·cap
    // exchange rows), never a per-domain window sort of the hot domain
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("redactPii: counts and masks email/phone spans; clean text untouched") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "reach me at alice.smith@mail.example.org or 555-0199 thanks"),
      R(2L, "no personal data in this row at all"),
      R(3L, "two mails a@b.co c.d@e.org and numbers 123-4567 890-1234")))
    val out = Curation.redactPii(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L)._1 == 1L && out(1L)._2 == 1L)
    assert(out(1L)._3 == "reach me at <EMAIL> or <PHONE> thanks")
    assert(out(2L) == ((0L, 0L, "no personal data in this row at all")))
    assert(out(3L)._1 == 2L && out(3L)._2 == 2L)
    assert(out(3L)._3 == "two mails <EMAIL> <EMAIL> and numbers <PHONE> <PHONE>")
  }

  test("tfidf: rare term outranks common term; smoothed idf exact on a hand case") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "alpha alpha beta"), R(2L, "alpha gamma"), R(3L, "alpha beta")))
    val out = TextAnalysis.tfidf(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // alpha: df=3 of N=3 → idf = ln(4/4)+1 = 1; doc1 tf=2 → tfidf 2.0
    assert(out((1L, "alpha")) == ((2L, 3L, 2.0)))
    // gamma: df=1 → idf = ln(4/2)+1; tf=1
    val expGamma = BigDecimal(math.log(2.0) + 1.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((2L, "gamma"))._3 == expGamma)
    // rarer term scores higher than the ubiquitous one at equal tf
    assert(out((2L, "gamma"))._3 > out((2L, "alpha"))._3)
  }

  test("bm25: doc with more query-term hits and shorter length ranks higher") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "hash hash merge"),                      // dense in query terms
      R(2L, "hash filler filler filler filler pad"), // one hit, long
      R(3L, "nothing relevant here")))
    val out = TextAnalysis.bm25(d, "doc_id", "text", Seq("hash", "merge"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out.contains(1L) && out.contains(2L) && !out.contains(3L))
    assert(out(1L)._2 == 2L && out(2L)._2 == 1L)
    assert(out(1L)._1 > out(2L)._1)
  }

  test("packSequences: offsets/bins follow the concat-per-shard token stream") {
    val d = df("doc_id BIGINT, text STRING, source STRING", Seq(
      R(1L, "a b c", "s1"),            // 3 tokens, start 0, bin 0
      R(2L, "d e f g h", "s1"),        // 5 tokens, start 3, bin 0
      R(3L, "i j k l", "s1"),          // 4 tokens, start 8, bin 2 (maxTokens=4)
      R(10L, "x y", "s2")))            // other shard restarts at 0
    val out = Curation.packSequences(d, "doc_id", "text", "source", maxTokens = 4)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == ((3L, 0L, 0L, 0L)))
    assert(out(2L) == ((5L, 3L, 0L, 3L)))  // starts inside bin 0, overflows
    assert(out(3L) == ((4L, 8L, 2L, 0L)))
    assert(out(10L) == ((2L, 0L, 0L, 0L))) // shard-local stream
    // the window is partitioned by shard — no single-partition global sort
    val plan = Curation.packSequences(d, "doc_id", "text", "source", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("vocabulary + bm25 plans: top-n is TakeOrderedAndProject, no global sort") {
    val plan = TextAnalysis.bm25(corpus, "doc_id", "text", Seq("the", "fox"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("contaminationScore plan: bench set broadcasts, no sort-merge join") {
    val plan = Curation.contaminationScore(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("tfidf top-k plan: WindowGroupLimit bounds the window shuffle") {
    import org.apache.spark.sql.expressions.Window
    val scored = TextAnalysis.tfidf(corpus, "doc_id", "text")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
    val plan = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("wordlistScreen: counts, fraction, flag; zero-shuffle plan") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      R(1L, "bad bad word fine ok"),      // 2/5 hits, one distinct
      R(2L, "all clean tokens here"),
      R(3L, "")))
    val out = Curation.wordlistScreen(d, "doc_id", "text",
      Seq("bad", "worse"), maxFraction = 0.2)
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(rows(1L) == ((5L, 2L, 1L, 0.4, true)))
    assert(rows(2L) == ((4L, 0L, 0L, 0.0, false)))
    assert(rows(3L) == ((0L, 0L, 0L, 0.0, false)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), plan) // pure projection
  }

  test("splitAssign: partition is total, deterministic, ~weights at volume") {
    val d = spark.range(0, 2000).selectExpr("id AS doc_id")
    val out = Curation.splitAssign(d, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L)
    assert(counts("train") > 1500 && counts("train") < 1700)
    assert(counts("val") > 120 && counts("val") < 280)
    assert(counts("test") > 120 && counts("test") < 280)
    // same salt, same rows → identical assignment
    val again = Curation.splitAssign(d, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first == again)
    // bad weights refuse loudly
    intercept[IllegalArgumentException] {
      Curation.splitAssign(d, "doc_id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("zorderKey: exact interleave, locality, range-partitioned layout") {
    import graft.functions.Layout
    val d = df("x BIGINT, y BIGINT", Seq(
      R(1L, 0L), R(0L, 1L), R(3L, 3L), R(2L, 1L)))
    val z = d.select(col("x"), col("y"),
        Layout.zorderKey(Seq(col("x"), col("y")), 2).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // bit b of col i at position b*2+i: z(1,0)=1, z(0,1)=2, z(3,3)=15,
    // z(2,1)=x bit1<<2 | y bit0<<1 = 4+2 = 6
    assert(z == Map((1L, 0L) -> 1L, (0L, 1L) -> 2L, (3L, 3L) -> 15L,
      (2L, 1L) -> 6L))
    val laid = Layout.repartitionZOrdered(
      spark.range(0, 1000).selectExpr("id % 32 AS a", "(id / 32) AS bqt")
        .selectExpr("a", "CAST(bqt AS BIGINT) AS b"),
      Seq(col("a"), col("b")), bits = 5, partitions = 4)
    val plan = laid.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
  }

  test("weightedSample: heavy weights dominate; non-positive weights never sample") {
    import spark.implicits._
    // 50 heavy (w=1000) + 450 light (w=1) + 10 invalid (w=0 / negative):
    // with total heavy mass 50000 vs light 450, a k=40 A-ES draw should be
    // nearly all heavy items under ANY uniform coin
    val rows = (0 until 50).map(i => (i.toLong, 1000.0)) ++
      (50 until 500).map(i => (i.toLong, 1.0)) ++
      (500 until 510).map(i => (i.toLong, if (i % 2 == 0) 0.0 else -3.0))
    val d = rows.toDF("doc_id", "w")
    val out = Curation.weightedSample(d, "doc_id", "w", k = 40).collect()
    assert(out.length == 40)
    assert(out.map(_.getAs[Int]("sample_rank")).toSeq == (1 to 40))
    val heavy = out.count(_.getAs[Long]("doc_id") < 50)
    assert(heavy >= 35, s"expected a heavy-dominated draw, got $heavy/40")
    assert(out.forall(_.getAs[Long]("doc_id") < 500), "w<=0 must never sample")
    // deterministic: the same call draws the same sample in the same order
    val again = Curation.weightedSample(d, "doc_id", "w", k = 40).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ==
      again.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("weightedSample: equal weights reduce to the uniform hash reservoir order") {
    import spark.implicits._
    val d = (0 until 200).map(i => (i.toLong, 7.5)).toDF("doc_id", "w")
    val out = Curation.weightedSample(d, "doc_id", "w", k = 20).collect()
    // with equal w, key order is u order — i.e. the ids with the LARGEST
    // hash-u win, independent of the weight's value
    val expected = (0 until 200)
      .map(i => i.toLong -> graft.llm.TextAnalysis
        .md5LongOf(s"wrsgraft:$i"))
      .sortBy { case (id, h) => (-h, id) }.take(20).map(_._1)
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == expected)
  }
}
