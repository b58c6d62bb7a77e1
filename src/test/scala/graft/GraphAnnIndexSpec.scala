package graft

import org.apache.spark.sql.functions._

import graft.llm.{GraphAnn, GraphAnnIndex, Similarity}

/** Persisted HNSW layout: disk roundtrip parity with the in-memory
  * search, the EXACT append contract (appended index == from-scratch
  * rebuild on the union, probe-for-probe), growth visibility, and the
  * guards (duplicate id, empty apex, missing index).
  */
class GraphAnnIndexSpec extends SparkSpec {

  private val dim = 8
  private val m = 4
  private val maxLevel = 1
  private val (k, beam, rounds) = (5, 8, 3)

  private def tmp(name: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"), name)
    val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    f.getAbsolutePath
  }

  private def vec(cluster: Int, i: Int): Array[Float] =
    Array.tabulate(dim)(d =>
      (math.sin(cluster * 2.1 + d) * 2.0 +
        math.sin(i * i * 1.3 + d * (1.0 + i % 5)) * 0.2).toFloat)

  private lazy val corpus = {
    import spark.implicits._
    (0 until 120).map(i => (i.toLong, vec(i % 4, i)))
      .toDF("vec_id", "embedding")
  }
  private lazy val centroids = corpus.filter(col("vec_id") < 4)
    .select(col("vec_id").as("cell"), col("embedding").as("cv"))

  private def probeRows(path: String,
                        queries: org.apache.spark.sql.DataFrame): Seq[String] =
    GraphAnnIndex.probe(spark, path, queries, "vec_id", "embedding",
        k, beam, rounds)
      .collect().map(_.toString).sorted.toSeq

  test("save + probe reproduces the in-memory hnswSearch exactly") {
    val path = tmp("graft_gann_idx")
    GraphAnnIndex.save(spark, corpus, centroids, "vec_id", "embedding",
      "cell", "cv", dim, m, maxLevel, path)
    val queries = corpus.filter(col("vec_id") < 8)
    val viaIndex = probeRows(path, queries)
    val cells = Similarity.assignCells(corpus, "vec_id", "embedding",
      centroids, "cell", "cv", dim).localCheckpoint()
    val direct = GraphAnn.hnswSearch(corpus, cells, queries, "vec_id",
        "embedding", "ivf_cell", dim, m, maxLevel, k, beam, rounds)
      .collect().map(_.toString).sorted.toSeq
    assert(viaIndex == direct,
      s"index probe diverged from in-memory search:\n$viaIndex\nvs\n$direct")
    assert(viaIndex.nonEmpty)
  }

  test("append == from-scratch rebuild on the union, and appends are retrievable") {
    import spark.implicits._
    val grown = tmp("graft_gann_grow")
    val scratch = tmp("graft_gann_scratch")
    GraphAnnIndex.save(spark, corpus, centroids, "vec_id", "embedding",
      "cell", "cv", dim, m, maxLevel, grown)
    // two appended batches (cluster-2- and cluster-0-flavored new ids)
    val b1 = (200L until 210L).map(i => (i, vec(2, i.toInt))).toDF("vec_id", "embedding")
    val b2 = (300L until 306L).map(i => (i, vec(0, i.toInt))).toDF("vec_id", "embedding")
    GraphAnnIndex.append(spark, grown, b1, "vec_id", "embedding")
    GraphAnnIndex.append(spark, grown, b2, "vec_id", "embedding")
    GraphAnnIndex.save(spark, corpus.unionByName(b1).unionByName(b2),
      centroids, "vec_id", "embedding", "cell", "cv", dim, m, maxLevel,
      scratch)
    // the persisted STATE agrees, not just one probe: edge sets and node
    // sets are identical
    def edgeSet(p: String) = spark.read.parquet(s"$p/edges")
      .select("lvl", "cell", "src", "dst").collect().map(_.toString).toSet
    def nodeSet(p: String) = spark.read.parquet(s"$p/nodes")
      .select("id", "lvl", "cell").collect().map(_.toString).toSet
    assert(nodeSet(grown) == nodeSet(scratch), "node sets diverged")
    assert(edgeSet(grown) == edgeSet(scratch),
      s"appended edge slices != from-scratch rebuild: " +
        s"${edgeSet(grown).diff(edgeSet(scratch)).take(5)} extra, " +
        s"${edgeSet(scratch).diff(edgeSet(grown)).take(5)} missing")
    def bbSet(p: String) = spark.read.parquet(s"$p/backbone")
      .collect().map(_.toString).toSet
    assert(bbSet(grown) == bbSet(scratch), "backbones diverged")
    // probe parity on external queries (ids disjoint from the corpus)
    val queries = Seq((900L, vec(2, 205)), (901L, vec(0, 17)))
      .toDF("vec_id", "embedding")
    assert(probeRows(grown, queries) == probeRows(scratch, queries))
    // growth visibility: an identical-vector query retrieves its append
    val hit = GraphAnnIndex.probe(spark, grown,
        Seq((902L, vec(2, 205))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k, beam, rounds)
      .filter(col("rank") === 1).head()
    assert(hit.getLong(2) == 205L && hit.getDouble(3) == 1.0,
      s"appended vector not retrieved first: $hit")
  }

  test("a degenerate one-vector-per-cell corpus still saves and probes (no edge files)") {
    import spark.implicits._
    val path = tmp("graft_gann_degenerate")
    // 4 vectors, 4 cells: every cell has one member, every layer graph is
    // edgeless except the backbone — the search degrades to hub hopping
    val tiny = corpus.filter(col("vec_id") < 4)
    GraphAnnIndex.save(spark, tiny, centroids, "vec_id", "embedding",
      "cell", "cv", dim, m, maxLevel, path)
    val out = GraphAnnIndex.probe(spark, path,
        Seq((900L, vec(1, 17))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k, beam, rounds)
      .collect()
    assert(out.nonEmpty, "degenerate index must still answer queries")
    assert(out.map(_.getLong(2)).toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
  }

  test("a crash at every append stage is repaired to the from-scratch state; chunked rebuilds are identical") {
    import spark.implicits._
    val b1 = (200L until 210L).map(i => (i, vec(2, i.toInt)))
      .toDF("vec_id", "embedding")
    val scratch = tmp("graft_gann_crash_scratch")
    GraphAnnIndex.save(spark, corpus.unionByName(b1), centroids, "vec_id",
      "embedding", "cell", "cv", dim, m, maxLevel, scratch)
    def stateOf(p: String): (Set[String], Set[String], Set[String]) = (
      spark.read.parquet(s"$p/nodes").select("id", "lvl", "cell")
        .collect().map(_.toString).toSet,
      spark.read.parquet(s"$p/edges").select("lvl", "cell", "src", "dst")
        .collect().map(_.toString).toSet,
      spark.read.parquet(s"$p/backbone").collect().map(_.toString).toSet)
    val want = stateOf(scratch)
    val queries = Seq((900L, vec(2, 205)), (901L, vec(0, 17)))
      .toDF("vec_id", "embedding")
    val wantProbe = probeRows(scratch, queries)
    // stage 1 = after the intent write (nodes not yet appended),
    // stage 2 = after the node append (edge slices stale — the frozen-
    // corruption scenario the repair exists for), stage 3 = after the
    // edge rebuild (backbone stale)
    Seq(1, 2, 3).foreach { stage =>
      val path = tmp(s"graft_gann_crash_$stage")
      GraphAnnIndex.save(spark, corpus, centroids, "vec_id", "embedding",
        "cell", "cv", dim, m, maxLevel, path)
      intercept[IllegalStateException] {
        GraphAnnIndex.append(spark, path, b1, "vec_id", "embedding",
          failpointAfter = stage)
      }
      // a PROBE on the crashed index repairs first — it must never search
      // slices that predate the nodes (and for stage 1 must simply serve
      // the pre-append index; either way, deterministic correct answers)
      if (stage == 2)
        assert(probeRows(path, queries) == wantProbe,
          "probe after a stage-2 crash served stale edge slices")
      // the serve loop's crash-replay: anti-join the batch against the
      // persisted node ids (RT.graphAnnServeBatch's fresh guard), then
      // append whatever is genuinely new — the repair completes the
      // half-applied write either way
      val fresh = b1.join(spark.read.parquet(s"$path/nodes")
        .select(col("id").as("vec_id")), Seq("vec_id"), "left_anti")
      GraphAnnIndex.append(spark, path, fresh, "vec_id", "embedding")
      assert(stateOf(path) == want,
        s"stage-$stage crash did not repair to the from-scratch state")
      assert(probeRows(path, queries) == wantProbe)
    }
    // an oversized append self-chunks (maxSlicesPerWrite=1 forces one
    // dynamic overwrite per touched slice) and still lands bit-identical
    val chunked = tmp("graft_gann_chunked")
    GraphAnnIndex.save(spark, corpus, centroids, "vec_id", "embedding",
      "cell", "cv", dim, m, maxLevel, chunked)
    GraphAnnIndex.append(spark, chunked, b1, "vec_id", "embedding",
      maxSlicesPerWrite = 1)
    assert(stateOf(chunked) == want,
      "slice-chunked append diverged from the from-scratch state")

    // a CORRUPT intent file (crash mid-intent-write) must not wedge the
    // repair: the fallback rebuilds every slice from current nodes —
    // same bit-identical end state
    val corrupt = tmp("graft_gann_corrupt_intent")
    GraphAnnIndex.save(spark, corpus, centroids, "vec_id", "embedding",
      "cell", "cv", dim, m, maxLevel, corrupt)
    intercept[IllegalStateException] {
      GraphAnnIndex.append(spark, corrupt, b1, "vec_id", "embedding",
        failpointAfter = 2) // nodes written, edges stale, intent present
    }
    val ip = new org.apache.hadoop.fs.Path(s"$corrupt/_append_intent")
    val ifs = ip.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = ifs.create(ip, true)
    out.write("0,".getBytes("UTF-8")) // truncated line: no cell id
    out.close()
    GraphAnnIndex.repairIfNeeded(spark, corrupt)
    assert(stateOf(corrupt) == want,
      "corrupt-intent repair diverged from the from-scratch state")
    assert(!ifs.exists(ip), "repair must clear the intent")
  }

  test("an Int-cell centroid table saves, appends, and probes (cell pinned LONG)") {
    import spark.implicits._
    val path = tmp("graft_gann_intcell")
    val intCents = centroids.select(col("cell").cast("int").as("cell"),
      col("cv"))
    GraphAnnIndex.save(spark, corpus, intCents, "vec_id", "embedding",
      "cell", "cv", dim, m, maxLevel, path)
    val b1 = (200L until 206L).map(i => (i, vec(2, i.toInt)))
      .toDF("vec_id", "embedding")
    GraphAnnIndex.append(spark, path, b1, "vec_id", "embedding")
    val longPath = tmp("graft_gann_longcell")
    GraphAnnIndex.save(spark, corpus, centroids, "vec_id", "embedding",
      "cell", "cv", dim, m, maxLevel, longPath)
    GraphAnnIndex.append(spark, longPath, b1, "vec_id", "embedding")
    val queries = Seq((900L, vec(2, 203))).toDF("vec_id", "embedding")
    assert(probeRows(path, queries) == probeRows(longPath, queries),
      "Int-cell index diverged from the Long-cell index")
  }

  test("guards: duplicate append id, missing index, empty apex") {
    import spark.implicits._
    val path = tmp("graft_gann_guard")
    GraphAnnIndex.save(spark, corpus, centroids, "vec_id", "embedding",
      "cell", "cv", dim, m, maxLevel, path)
    intercept[IllegalArgumentException] {
      GraphAnnIndex.append(spark, path,
        Seq((5L, vec(0, 5))).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
    }
    intercept[IllegalArgumentException] { // duplicate WITHIN one batch
      GraphAnnIndex.append(spark, path,
        Seq((700L, vec(0, 700)), (700L, vec(1, 701)))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding")
    }
    // an EMPTY batch is a no-op, never an empty-reduce crash (the
    // serve-loop wedge): index state unchanged, probes still answer
    val before = spark.read.parquet(s"$path/edges").count()
    GraphAnnIndex.append(spark, path,
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    assert(spark.read.parquet(s"$path/edges").count() == before)
    intercept[IllegalArgumentException] {
      GraphAnnIndex.readMeta(spark, tmp("graft_gann_nowhere"))
    }
    intercept[IllegalArgumentException] {
      // 3 ids: P(level >= 6) = 4^-6 each — apex empty, loud at save time
      GraphAnnIndex.save(spark, corpus.filter(col("vec_id") < 3),
        centroids, "vec_id", "embedding", "cell", "cv", dim, m,
        maxLevel = 6, tmp("graft_gann_empty_apex"))
    }
  }
}
