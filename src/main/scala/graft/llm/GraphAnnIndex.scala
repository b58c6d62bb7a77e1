package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED multi-layer HNSW layout — the graph member of the persisted
  * ANN family, next to [[Similarity.saveIndex]] (IVF) and [[DedupIndex]]
  * (MinHash bands): build once, serve forever, grow incrementally.
  *
  * Layout under `path/`:
  *   - `meta.json`               — m, maxLevel, dim (probe/append guards)
  *   - `centroids/` (cell, cv)   — the quantizer, for appending
  *   - `nodes/` (id, vec, lvl), partitioned by `cell`
  *   - `edges/` (src, dst), partitioned by (`lvl`, `cell`) — the
  *     CELL-LOCAL layer graphs ([[GraphAnn.cellEdges]]: within-cell kNN +
  *     node→hub), one slice per (layer, cell)
  *   - `backbone/` (src, dst, lvl), unpartitioned — the cross-cell hub
  *     backbone per layer (|cells|² rows, rebuilt whole on every append;
  *     unpartitioned so a legitimately empty backbone stays readable)
  *
  * The append contract is EXACT, not approximate: [[GraphAnn.cellEdges]]
  * decomposes per cell (every non-backbone edge stays inside one cell),
  * so appending vectors rebuilds only the touched (layer, cell) slices —
  * via dynamic partition overwrite, the
  * [[graft.streaming.RT.writeDayPartitioned]] move — plus the tiny
  * backbones, and the resulting index is BIT-IDENTICAL to one built from
  * scratch on the union (GraphAnnIndexSpec pins it). Deterministic level
  * assignment ([[GraphAnn.hnswLevels]], a pure function of the id) is
  * what makes this possible: an appended node lands on exactly the
  * layers a from-scratch build would put it on.
  *
  * Query ids must be disjoint from node ids (or equal-id means "find
  * neighbors of this indexed node" — the self-match is excluded), the
  * same contract as the in-memory search.
  */
object GraphAnnIndex {

  final case class Meta(m: Int, maxLevel: Int, dim: Int)

  private def writeMeta(spark: SparkSession, path: String, m: Meta): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      s"""{"m": ${m.m}, "maxLevel": ${m.maxLevel}, "dim": ${m.dim}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readMeta(spark: SparkSession, path: String): Meta = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no graph-ANN index at $path")
    val in = fs.open(p)
    val s = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    def f(k: String): Int =
      s""""$k"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(s)
        .getOrElse(sys.error(s"meta.json missing $k")).group(1).toInt
    Meta(f("m"), f("maxLevel"), f("dim"))
  }

  /** One layer's member nodes with canonical (id, vec, cell) names. */
  private def members(nodes: DataFrame, lvl: Int): DataFrame =
    nodes.filter(col("lvl") >= lvl)

  /** Assign + level a vector batch into canonical (id, vec, cell, lvl)
    * node rows — the one build save and append share, checkpointed
    * (read once per layer downstream). `cell` is pinned to LONG here so
    * every path that touches it — the partition column round-trip in
    * [[loadNodes]], the centroid table whatever integral type the caller
    * used, and [[append]]'s touched-slice collect (getAs[Long]) — shares
    * one type instead of whichever width the quantizer table happened to
    * carry.
    */
  private def nodesOf(vectors: DataFrame, centroids: DataFrame,
                      idCol: String, vecCol: String, cellCol: String,
                      cvCol: String, dim: Int, maxLevel: Int): DataFrame = {
    val assigned = Similarity.assignCells(vectors, idCol, vecCol,
      centroids, cellCol, cvCol, dim, outCol = "cell")
    assigned
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        col("cell").cast("long").as("cell"),
        GraphAnn.hnswLevelCol(col(idCol), maxLevel).as("lvl"))
      .localCheckpoint()
  }

  /** The cell-local edge slices for every layer a member set spans,
    * stacked with their `lvl` tag — the relation `edges/` persists. One
    * [[GraphAnn.cellEdgesLayered]] pass, slice-identical to per-layer
    * [[GraphAnn.cellEdges]] builds (which [[append]]'s touched-slice
    * rebuild still uses — the bit-identity spec pins the two paths to
    * each other).
    */
  private def layerCellEdges(nodes: DataFrame, meta: Meta): DataFrame =
    GraphAnn.cellEdgesLayered(nodes, "id", "vec", "cell", "lvl",
      meta.dim, meta.m, 0, meta.maxLevel)

  private def layerBackbones(nodes: DataFrame, meta: Meta): DataFrame = {
    val hubsL = GraphAnn.hubsLayered(nodes, "id", "cell", "lvl", 0,
      meta.maxLevel)
    hubsL.select(col("lvl"), col("hub").as("src"))
      .join(hubsL.select(col("lvl"), col("hub").as("dst")), Seq("lvl"))
      .filter(col("src") =!= col("dst"))
  }

  /** Build + persist the full layout. `vectors` is the corpus
    * (idCol, vecCol); `centroids` the quantizer (cellCol, cvCol) —
    * assignment uses [[Similarity.assignCells]]' cosine argmax, the same
    * metric the probe's graphs encode.
    */
  def save(spark: SparkSession, vectors: DataFrame, centroids: DataFrame,
           idCol: String, vecCol: String, cellCol: String, cvCol: String,
           dim: Int, m: Int, maxLevel: Int, path: String): Unit = {
    require(maxLevel >= 1 && maxLevel <= 8, s"bad maxLevel=$maxLevel")
    val meta = Meta(m, maxLevel, dim)
    val nodes = nodesOf(vectors, centroids, idCol, vecCol, cellCol,
      cvCol, dim, maxLevel)
    require(members(nodes, maxLevel).limit(1).count() > 0,
      s"save: layer $maxLevel is empty — lower maxLevel for this corpus")
    nodes.select("id", "vec", "lvl", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/nodes")
    // cell pinned LONG on disk (the nodesOf contract): the caller's
    // centroid table may carry any integral width
    centroids.select(col(cellCol).cast("long").as("cell"),
        col(cvCol).as("cv"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    layerCellEdges(nodes, meta)
      .select("src", "dst", "lvl", "cell")
      .write.mode("overwrite").partitionBy("lvl", "cell")
      .parquet(s"$path/edges")
    // unpartitioned on purpose: the backbone is |cells|²-tiny and can be
    // legitimately EMPTY (single-cell layers) — an all-empty partitioned
    // write leaves a schema-less directory the probe could not read
    layerBackbones(nodes, meta).select("src", "dst", "lvl")
      .write.mode("overwrite").parquet(s"$path/backbone")
    writeMeta(spark, path, meta)
  }

  private def loadNodes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/nodes")
      .select(col("id").cast("long"), col("vec"),
        col("lvl").cast("int").as("lvl"), col("cell").cast("long").as("cell"))

  // ---- append intent: crash-repairable multi-write appends ---------------

  /** An [[append]] is three separate parquet writes (nodes append, edge
    * slice dynamic overwrite, backbone overwrite) — not a transaction. A
    * crash between them would leave new ids in `nodes/` whose (layer,
    * cell) edge slices are stale, and a serve loop's replay guard (the
    * fresh anti-join in [[graft.streaming.RT.graphAnnServeBatch]]) would
    * then skip the re-append entirely, freezing the corruption in place.
    * So every append records its touched slice set in an INTENT file
    * BEFORE the first write and deletes it after the last; any entry
    * point that finds a leftover intent re-runs the slice + backbone
    * rebuild from the CURRENT node state first. Edges are a pure function
    * of the node relation, so the repair is idempotent at every crash
    * point: before the node append it rewrites identical slices, after
    * it it completes exactly the missing rebuild — either way the layout
    * ends bit-identical to a from-scratch build.
    */
  private def intentPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_append_intent")

  private def writeIntent(spark: SparkSession, path: String,
                          touched: Set[(Int, Long)]): Unit = {
    val p = intentPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(touched.toSeq.sorted.map { case (l, c) => s"$l,$c" }
      .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def clearIntent(spark: SparkSession, path: String): Unit = {
    val p = intentPath(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
  }

  /** Complete a half-applied [[append]] if an intent file is present —
    * called on entry by both [[probe]] and [[append]], so neither a serve
    * nor the next grow step can ever read/extend a layout whose edge
    * slices predate its nodes. No intent → one fs.exists, no jobs.
    */
  def repairIfNeeded(spark: SparkSession, path: String): Unit = {
    val p = intentPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val body = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val meta = readMeta(spark, path)
      // a truncated/corrupt intent (crash DURING the intent write) must
      // not wedge the repair loop forever: fall back to rebuilding EVERY
      // slice the node relation spans — more work, same bit-identical
      // result (edges are a pure function of nodes)
      val touched = scala.util.Try {
        body.split("\n").iterator.filter(_.nonEmpty).map { s =>
          val Array(l, c) = s.split(",", 2)
          (l.toInt, c.toLong)
        }.toSet
      }.getOrElse {
        loadNodes(spark, path)
          .select(explode(sequence(lit(0),
              least(col("lvl"), lit(meta.maxLevel)))).as("l"), col("cell"))
          .distinct().collect()
          .map(r => (r.getAs[Int]("l"), r.getAs[Long]("cell"))).toSet
      }
      if (touched.nonEmpty)
        rebuildSlices(spark, path, meta, touched)
      clearIntent(spark, path)
    }
  }

  /** Rebuild the given (layer, cell) edge slices plus every layer's
    * backbone from the CURRENT node state. Slices are rebuilt in
    * `maxSlicesPerWrite`-bounded chunks — each chunk is an independent
    * dynamic partition overwrite and slices are disjoint, so any chunking
    * yields the same layout (the union property); an append touching more
    * slices than one write comfortably plans simply takes several writes
    * instead of failing.
    */
  private def rebuildSlices(spark: SparkSession, path: String, meta: Meta,
                            touched: Set[(Int, Long)],
                            maxSlicesPerWrite: Int = 65536,
                            failpointAfter: Int = 0): Unit = {
    require(maxSlicesPerWrite > 0, s"bad maxSlicesPerWrite=$maxSlicesPerWrite")
    val all = loadNodes(spark, path).localCheckpoint()
    touched.toSeq.sorted.grouped(maxSlicesPerWrite).foreach { chunk =>
      val rebuilt = chunk.groupBy(_._1).toSeq.map { case (l, cs) =>
        val cells = cs.map(_._2)
        GraphAnn.cellEdges(
            members(all, l).filter(col("cell").isin(cells: _*)),
            "id", "vec", "cell", meta.dim, meta.m)
          .withColumn("lvl", lit(l))
      }.reduce(_ unionByName _)
      rebuilt.select("src", "dst", "lvl", "cell")
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("lvl", "cell").parquet(s"$path/edges")
    }
    if (failpointAfter == 3)
      throw new IllegalStateException("injected crash after stage 3")
    layerBackbones(all, meta).select("src", "dst", "lvl")
      .write.mode("overwrite").parquet(s"$path/backbone")
  }

  /** Serve queries from the persisted layout: load each layer's graph
    * (cell slices ∪ backbone, partition-pruned by `lvl`), seed at the
    * apex entry, run the [[GraphAnn.hnswSearchPrebuilt]] descent + layer-0
    * beam search. Output (qid, rank, vb, cos).
    */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
            idCol: String, vecCol: String, k: Int, beam: Int,
            rounds: Int): DataFrame = {
    val meta = readMeta(spark, path)
    repairIfNeeded(spark, path) // never search stale slices after a crash
    val nodes = loadNodes(spark, path).localCheckpoint()
    val corpus = nodes.select(col("id").as(idCol), col("vec").as(vecCol))
    // explicit schemas: a degenerate corpus (one vector per cell) writes
    // ZERO edge files, and a schema-less directory would fail inference
    val edges = spark.read
      .schema("src LONG, dst LONG, lvl INT, cell LONG")
      .parquet(s"$path/edges")
    val backbone = spark.read
      .schema("src LONG, dst LONG, lvl INT")
      .parquet(s"$path/backbone")
    def layerEdges(l: Int): DataFrame =
      edges.filter(col("lvl") === l).select(col("src").cast("long"),
          col("dst").cast("long"))
        .unionByName(backbone.filter(col("lvl") === l)
          .select(col("src").cast("long"), col("dst").cast("long")))
        .distinct()
    val apexRow = members(nodes, meta.maxLevel)
      .agg(min(col("id")).as("node")).head()
    require(!apexRow.isNullAt(0),
      s"probe: empty apex layer at $path (corrupt index?)")
    // reuse the collected apex as a literal — the require already paid
    // for the aggregation job; re-aggregating inside the search would
    // run it a second time per probe call
    val entries = queries.select(col(idCol).as("qid"))
      .withColumn("node", lit(apexRow.getLong(0)))
    GraphAnn.hnswSearchPrebuilt(corpus, queries, idCol, vecCol, meta.dim,
      (meta.maxLevel to 1 by -1).map(layerEdges),
      layerEdges(0).localCheckpoint(), entries, k, beam, rounds)
  }

  /** Incremental append: assign the new vectors with the saved quantizer,
    * level them with the md5 coin, append their node rows, then rebuild
    * EXACTLY the touched (layer, cell) edge slices — a slice is touched
    * iff a new node joins that layer in that cell — via dynamic partition
    * overwrite, plus every layer's (tiny) hub backbone, since a new
    * smallest id can re-seat a hub. The result equals a from-scratch
    * [[save]] on the union, bit for bit.
    *
    * Crash safety: the touched set is recorded as an intent file before
    * the first write and cleared after the last, so a crash anywhere
    * inside the three-write sequence is REPAIRED (not frozen) by the next
    * probe/append — see [[repairIfNeeded]]. Oversized appends never fail
    * on slice count: the rebuild chunks itself (`maxSlicesPerWrite` per
    * dynamic overwrite), each chunk independently correct by slice
    * disjointness.
    *
    * `failpointAfter` is a TEST-ONLY crash injector (0 = off): throw after
    * the Nth write (1 = intent, 2 = nodes, 3 = edges) so the repair path
    * is provable without process murder.
    */
  def append(spark: SparkSession, path: String, newVectors: DataFrame,
             idCol: String, vecCol: String,
             maxSlicesPerWrite: Int = 65536,
             failpointAfter: Int = 0): Unit = {
    val meta = readMeta(spark, path)
    repairIfNeeded(spark, path)
    def crash(stage: Int): Unit =
      if (failpointAfter == stage)
        throw new IllegalStateException(s"injected crash after stage $stage")
    val cents = spark.read.parquet(s"$path/centroids")
    val newNodes = nodesOf(newVectors, cents, idCol, vecCol, "cell",
      "cv", meta.dim, meta.maxLevel)
    // an empty batch (everything upstream dropped, or a filtered replay)
    // is a NO-OP, never an empty-reduce crash that wedges a serve loop
    if (newNodes.limit(1).count() > 0) {
      // duplicate ids — against the index OR within the batch — would
      // silently shadow rows at probe time
      val existingIds = loadNodes(spark, path).select("id")
      require(newNodes.join(existingIds, Seq("id"), "left_semi")
        .limit(1).count() == 0,
        "append: a new id already exists in the index")
      require(newNodes.groupBy(col("id")).count()
        .filter(col("count") > 1).limit(1).count() == 0,
        "append: duplicate ids within the batch")
      // touched slices: (layer l, cell c) where a new node has lvl >= l —
      // contracted distributively to the DISTINCT pairs (bounded by
      // (maxLevel+1)·|cells| — the assignCells quantizer bound keeps this
      // driver-small) before the driver sees them
      val touched = newNodes
        .select(explode(sequence(lit(0),
            least(col("lvl"), lit(meta.maxLevel)))).as("l"), col("cell"))
        .distinct().collect()
        .map(r => (r.getAs[Int]("l"), r.getAs[Long]("cell"))).toSet
      writeIntent(spark, path, touched)
      crash(1)
      newNodes.select("id", "vec", "lvl", "cell")
        .write.mode("append").partitionBy("cell").parquet(s"$path/nodes")
      crash(2)
      rebuildSlices(spark, path, meta, touched, maxSlicesPerWrite,
        failpointAfter)
      clearIntent(spark, path)
    }
  }
}
