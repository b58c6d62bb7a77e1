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
    * (read once per layer downstream).
    */
  private def nodesOf(vectors: DataFrame, centroids: DataFrame,
                      idCol: String, vecCol: String, cellCol: String,
                      cvCol: String, dim: Int, maxLevel: Int): DataFrame = {
    val assigned = Similarity.assignCells(vectors, idCol, vecCol,
      centroids, cellCol, cvCol, dim, outCol = "cell")
    assigned
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("cell"))
      .join(GraphAnn.hnswLevels(
          assigned.select(col(idCol).as("id")), "id", maxLevel), Seq("id"))
      .localCheckpoint()
  }

  /** The cell-local edge slices for every layer a member set spans,
    * stacked with their `lvl` tag — the relation `edges/` persists.
    */
  private def layerCellEdges(nodes: DataFrame, meta: Meta,
                             layers: Seq[Int]): DataFrame =
    layers.map { l =>
      GraphAnn.cellEdges(members(nodes, l), "id", "vec", "cell",
          meta.dim, meta.m)
        .withColumn("lvl", lit(l))
    }.reduce(_ unionByName _)

  private def layerBackbones(nodes: DataFrame, meta: Meta): DataFrame =
    (0 to meta.maxLevel).map { l =>
      GraphAnn.hubBackbone(members(nodes, l), "id", "cell")
        .withColumn("lvl", lit(l))
    }.reduce(_ unionByName _)

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
    centroids.select(col(cellCol).as("cell"), col(cvCol).as("cv"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    layerCellEdges(nodes, meta, 0 to maxLevel)
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

  /** Serve queries from the persisted layout: load each layer's graph
    * (cell slices ∪ backbone, partition-pruned by `lvl`), seed at the
    * apex entry, run the [[GraphAnn.hnswSearchPrebuilt]] descent + layer-0
    * beam search. Output (qid, rank, vb, cos).
    */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
            idCol: String, vecCol: String, k: Int, beam: Int,
            rounds: Int): DataFrame = {
    val meta = readMeta(spark, path)
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
    */
  def append(spark: SparkSession, path: String, newVectors: DataFrame,
             idCol: String, vecCol: String): Unit = {
    val meta = readMeta(spark, path)
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
      newNodes.select("id", "vec", "lvl", "cell")
        .write.mode("append").partitionBy("cell").parquet(s"$path/nodes")
      // touched slices: (layer l, cell c) where a new node has lvl >= l —
      // contracted distributively to the DISTINCT pairs (bounded by
      // (maxLevel+1)·|cells|) before the driver sees them
      val touched = newNodes
        .select(explode(sequence(lit(0),
            least(col("lvl"), lit(meta.maxLevel)))).as("l"), col("cell"))
        .distinct().collect()
        .map(r => (r.getAs[Int]("l"), r.getAs[Long]("cell"))).toSet
      require(touched.size <= 65536,
        s"append touches ${touched.size} (layer, cell) slices — batch smaller")
      val all = loadNodes(spark, path).localCheckpoint() // post-append state
      val rebuilt = touched.groupBy(_._1).toSeq.map { case (l, cs) =>
        val cells = cs.map(_._2).toSeq
        GraphAnn.cellEdges(
            members(all, l).filter(col("cell").isin(cells: _*)),
            "id", "vec", "cell", meta.dim, meta.m)
          .withColumn("lvl", lit(l))
      }.reduce(_ unionByName _)
      rebuilt.select("src", "dst", "lvl", "cell")
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("lvl", "cell").parquet(s"$path/edges")
      layerBackbones(all, meta).select("src", "dst", "lvl")
        .write.mode("overwrite").parquet(s"$path/backbone")
    }
  }
}
