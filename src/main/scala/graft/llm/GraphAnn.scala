package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph-based ANN (the HNSW/NSW family, next to the IVF family in
  * [[Similarity]]): a single-layer navigable small-world index — per-node
  * kNN edges inside each coarse cell plus a fully-connected hub backbone
  * (one hub per cell) — searched by iterative BEAM SEARCH expressed as
  * bounded BSP rounds.
  *
  * Spark-first shape, in contrast to the pointer-chasing sequential HNSW:
  *   - index build: one blocked self-join per cell (never all-pairs) with
  *     the bounded [[graft.functions.Aggregators.TopK]] aggregator picking
  *     each node's M edges — |nodes|·M exchange rows;
  *   - out-degrees are BOUNDED BY CONSTRUCTION: ≤ 2M pruned kNN edges
  *     (+1 hub edge) per node, ≤ 2M + (#cells − 1) for hubs — the HNSW
  *     Mmax cap applied after symmetrization. Node→hub edges are NOT
  *     reversed — a hub's out-edges are its own pruned list plus the
  *     other hubs, so expanding a frontier never pulls in a whole cell;
  *   - search: R synchronous rounds; each round expands the current
  *     per-query beam through the edge list (one join), rescores the
  *     visited set, and re-selects the beam with TopK — |Q|·beam·degree
  *     candidate rows per round, deterministic (cosine rounded to 6 dp,
  *     ties by id) and therefore exactly mirrorable in SQL.
  *
  * Approximation contract: like HNSW, recall depends on graph
  * connectivity (M, beam, rounds); the result is the exact top-k OF THE
  * VISITED SET, which the oracle mirror reproduces row for row.
  */
object GraphAnn {

  /** One hub per cell: the smallest node id (deterministic). */
  def hubs(cells: DataFrame, idCol: String, cellCol: String): DataFrame =
    cells.groupBy(col(cellCol)).agg(min(col(idCol)).as("hub"))

  /** The navigable edge list (src, dst), distinct: symmetric within-cell
    * kNN edges, directed node→hub edges, and the symmetric hub backbone.
    */
  def nswEdges(cells: DataFrame, idCol: String, vecCol: String,
               cellCol: String, dim: Int, m: Int): DataFrame =
    cellEdges(cells, idCol, vecCol, cellCol, dim, m).select("src", "dst")
      .unionByName(hubBackbone(cells, idCol, cellCol))
      .distinct()

  /** The CELL-LOCAL part of the navigable graph — symmetric pruned
    * within-cell kNN plus node→hub edges, tagged with the owning cell.
    * Every edge here stays inside one cell, so the relation decomposes
    * per cell: rebuilding one cell's membership rebuilds exactly its
    * slice, which is what makes the persisted index's incremental append
    * ([[GraphAnnIndex]]) equal to a from-scratch rebuild.
    * [[nswEdges]] = this (projected) ∪ [[hubBackbone]].
    */
  def cellEdges(cells: DataFrame, idCol: String, vecCol: String,
                cellCol: String, dim: Int, m: Int): DataFrame = {
    require(m > 0, "m must be positive")
    val topm = udaf(new graft.functions.Aggregators.TopK(m))
    val a = cells.select(col(cellCol).as("__cell"), col(idCol).as("src"),
      col(vecCol).as("va"))
    val b = cells.select(col(cellCol).as("__cell"), col(idCol).as("dst"),
      col(vecCol).as("vb"))
    val knn = a.join(b, Seq("__cell")).filter(col("src") =!= col("dst"))
      .select(col("__cell"), col("src"),
        round(Similarity.cosine("va", "vb", dim), 6).as("cos"), col("dst"))
      .filter(col("cos").isNotNull)
      .groupBy(col("__cell"), col("src"))
      .agg(topm(col("cos"), col("dst")).as("hits"))
      .select(col("__cell"), col("src"), explode(col("hits")).as("h"))
      .select(col("__cell"), col("src"), col("h.score").as("cos"),
        col("h.id").as("dst"))
    // symmetrize, then PRUNE to 2m per node (the HNSW Mmax = 2M
    // neighbor-select step): without the cap a popular node's out-degree
    // grows with its reverse-kNN in-degree, which nothing bounds; capping
    // at m alone cuts the reverse edges navigability depends on
    val sym = knn
      .unionByName(knn.select(col("__cell"), col("dst").as("src"),
        col("cos"), col("src").as("dst")))
      .distinct()
    val top2m = udaf(new graft.functions.Aggregators.TopK(2 * m))
    val pruned = sym.groupBy(col("__cell"), col("src"))
      .agg(top2m(col("cos"), col("dst")).as("hits"))
      .select(col("__cell"), col("src"), explode(col("hits")).as("h"))
      .select(col("__cell"), col("src"), col("h.id").as("dst"))
    val hb = hubs(cells, idCol, cellCol)
    val nodeHub = cells.select(col(cellCol), col(idCol).as("src"))
      .join(hb, Seq(cellCol)).filter(col("src") =!= col("hub"))
      .select(col(cellCol).as("__cell"), col("src"), col("hub").as("dst"))
    pruned.unionByName(nodeHub).distinct()
      .withColumnRenamed("__cell", cellCol)
  }

  /** The fully-connected hub backbone (one hub per cell, smallest id) —
    * the only cross-cell edges in the graph; |cells|² rows per layer.
    */
  def hubBackbone(cells: DataFrame, idCol: String,
                  cellCol: String): DataFrame = {
    val hb = hubs(cells, idCol, cellCol)
    hb.select(col("hub").as("src"))
      .crossJoin(hb.select(col("hub").as("dst")))
      .filter(col("src") =!= col("dst"))
  }

  // ---- all-layers-in-one-job builds -----------------------------------
  //
  // A node at level L is a member of layers minLevel..L, so every layer's
  // graph can come out of ONE aggregation pass: tag each within-cell
  // candidate pair with the layers BOTH endpoints belong to (explode up
  // to min(lvl_a, lvl_b) — an avg fan-out of Σ4^-l ≈ 4/3 rows, since
  // occupancy is geometric) and run the same kNN→symmetrize→prune
  // selection per (layer, cell, node). Bit-identical to building each
  // layer separately ([[cellEdges]] over the lvl >= l members): the
  // per-layer candidate multisets and the deterministic TopK selections
  // are the same — only the orchestration collapses from one
  // build-and-materialize job per layer to one shuffle for all layers
  // (the fixed ~1 s/layer cost that dominated the in-memory HNSW build
  // regardless of member count).

  /** Every layer's [[hubs]] from leveled nodes: (lvl, cellCol, hub). */
  def hubsLayered(nodes: DataFrame, idCol: String, cellCol: String,
                  lvlCol: String, minLevel: Int, maxLevel: Int): DataFrame =
    nodes.filter(col(lvlCol) >= minLevel)
      .select(explode(sequence(lit(minLevel),
          least(col(lvlCol), lit(maxLevel)))).as("lvl"),
        col(cellCol), col(idCol).as("id"))
      .groupBy(col("lvl"), col(cellCol))
      .agg(min(col("id")).as("hub"))

  /** Every layer's [[cellEdges]] in one pass over leveled nodes
    * (idCol, vecCol, cellCol, lvlCol): (cellCol, src, dst, lvl) for each
    * lvl in [minLevel, maxLevel], slice-for-slice identical to the
    * per-layer build.
    */
  def cellEdgesLayered(nodes: DataFrame, idCol: String, vecCol: String,
                       cellCol: String, lvlCol: String, dim: Int, m: Int,
                       minLevel: Int, maxLevel: Int): DataFrame = {
    require(m > 0, "m must be positive")
    require(minLevel >= 0 && maxLevel >= minLevel,
      s"bad layer range [$minLevel, $maxLevel]")
    val topm = udaf(new graft.functions.Aggregators.TopK(m))
    val top2m = udaf(new graft.functions.Aggregators.TopK(2 * m))
    // the minLevel membership filter sits BELOW the pair join: a pair
    // only reaches any layer >= minLevel when BOTH endpoints do, and at
    // minLevel=1 (the layer-0-prebuilt path) each filtered side is 4x
    // smaller, the pair relation 16x — filtering after the join would
    // re-pay the full layer-0 join for layers that never see those rows
    val mem = nodes.filter(col(lvlCol) >= minLevel)
    val a = mem.select(col(cellCol).as("__cell"), col(idCol).as("src"),
      col(vecCol).as("va"), col(lvlCol).as("__la"))
    val b = mem.select(col(cellCol).as("__cell"), col(idCol).as("dst"),
      col(vecCol).as("vb"), col(lvlCol).as("__lb"))
    val knn = a.join(b, Seq("__cell")).filter(col("src") =!= col("dst"))
      .withColumn("__ml", least(col("__la"), col("__lb"), lit(maxLevel)))
      .filter(col("__ml") >= minLevel) // sequence(hi, lo) would DESCEND
      .select(explode(sequence(lit(minLevel), col("__ml"))).as("lvl"),
        col("__cell"), col("src"),
        round(Similarity.cosine("va", "vb", dim), 6).as("cos"), col("dst"))
      .filter(col("cos").isNotNull)
      .groupBy(col("lvl"), col("__cell"), col("src"))
      .agg(topm(col("cos"), col("dst")).as("hits"))
      .select(col("lvl"), col("__cell"), col("src"),
        explode(col("hits")).as("h"))
      .select(col("lvl"), col("__cell"), col("src"),
        col("h.score").as("cos"), col("h.id").as("dst"))
    val sym = knn
      .unionByName(knn.select(col("lvl"), col("__cell"),
        col("dst").as("src"), col("cos"), col("src").as("dst")))
      .distinct()
    val pruned = sym.groupBy(col("lvl"), col("__cell"), col("src"))
      .agg(top2m(col("cos"), col("dst")).as("hits"))
      .select(col("lvl"), col("__cell"), col("src"),
        explode(col("hits")).as("h"))
      .select(col("lvl"), col("__cell"), col("src"), col("h.id").as("dst"))
    val hubsL = hubsLayered(nodes, idCol, cellCol, lvlCol, minLevel,
        maxLevel)
      .withColumnRenamed(cellCol, "__cell")
    val nodeHub = nodes.filter(col(lvlCol) >= minLevel)
      .select(explode(sequence(lit(minLevel),
          least(col(lvlCol), lit(maxLevel)))).as("lvl"),
        col(cellCol).as("__cell"), col(idCol).as("src"))
      .join(hubsL, Seq("lvl", "__cell")).filter(col("src") =!= col("hub"))
      .select(col("lvl"), col("__cell"), col("src"), col("hub").as("dst"))
    pruned.unionByName(nodeHub).distinct()
      .withColumnRenamed("__cell", cellCol)
  }

  /** Every layer's [[nswEdges]] in one pass: (src, dst, lvl), each lvl
    * slice identical to `nswEdges` over that layer's members.
    */
  def nswEdgesLayered(nodes: DataFrame, idCol: String, vecCol: String,
                      cellCol: String, lvlCol: String, dim: Int, m: Int,
                      minLevel: Int, maxLevel: Int): DataFrame = {
    val hubsL = hubsLayered(nodes, idCol, cellCol, lvlCol, minLevel,
      maxLevel)
    val backbone = hubsL.select(col("lvl"), col("hub").as("src"))
      .join(hubsL.select(col("lvl"), col("hub").as("dst")), Seq("lvl"))
      .filter(col("src") =!= col("dst"))
    cellEdgesLayered(nodes, idCol, vecCol, cellCol, lvlCol, dim, m,
        minLevel, maxLevel)
      .select(col("src"), col("dst"), col("lvl"))
      .unionByName(backbone.select(col("src"), col("dst"), col("lvl")))
      .distinct()
  }

  /** Beam search from per-query entry nodes over the edge list: R rounds
    * of expand → rescore → reselect, then the exact top-k of the visited
    * set (self-matches excluded). Output (qid, rank, vb, cos) like the
    * other simsearch rankings.
    */
  def beamSearch(corpus: DataFrame, edges: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, dim: Int,
                 entries: DataFrame, k: Int, beam: Int,
                 rounds: Int): DataFrame = {
    require(k > 0 && beam > 0 && rounds >= 1)
    val topb = udaf(new graft.functions.Aggregators.TopK(beam))
    val topk = udaf(new graft.functions.Aggregators.TopK(k))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("node"), col(vecCol).as("nv"))
    def score(cand: DataFrame): DataFrame =
      cand.join(q, Seq("qid")).join(c, Seq("node"))
        .select(col("qid"), col("node"),
          round(Similarity.cosine("qv", "nv", dim), 6).as("cos"))
        .filter(col("cos").isNotNull)
    // visited starts as the scored entry points; each round is bounded by
    // |Q|·beam·maxDegree new candidates. Each node is EXPANDED AT MOST
    // ONCE (the explored set): without the exclusion the frontier
    // re-selects the same stable top-beam every round and the search
    // stalls at the entry neighborhood instead of advancing through the
    // graph. For MULTI-round searches `visited` is localCheckpoint-ed per
    // round — it is referenced TWICE by the next round (frontier +
    // candidate union), so an un-cut lineage duplicates the whole
    // previous-round subtree per reference (O(2^rounds) plan text;
    // measured SLOWER than the eager checkpoint job even at 2 rounds, and
    // the plan census unreadable) — and frontier is persist()-ed
    // (referenced by both the explored union and the expansion join).
    // A SINGLE-round search skips all of it: the duplication is one extra
    // score(entries) subtree, and staying lazy collapses the search into
    // the consumer's one job — the HNSW descent calls this per layer, and
    // the eager-per-layer barriers were the dominant fixed cost there.
    // Every intermediate cached/checkpointed handle is released before
    // returning — the final round's checkpoint, the only relation the
    // returned ranking reads, is the one kept — so repeated searches in
    // one session don't accumulate blocks.
    val eager = rounds > 1
    val toFree = scala.collection.mutable.Buffer.empty[DataFrame]
    var visited = {
      val v0 = score(entries.select(col("qid"), col("node")))
      if (eager) v0.persist() else v0
    }
    var explored = visited.select(col("qid"), col("node")).limit(0)
    (1 to rounds).foreach { _ =>
      if (eager) toFree += visited
      val frontier = {
        val f = visited
          .join(explored, Seq("qid", "node"), "left_anti")
          .groupBy(col("qid"))
          .agg(topb(col("cos"), col("node")).as("h"))
          .select(col("qid"), explode(col("h")).as("x"))
          .select(col("qid"), col("x.id").as("node"))
        if (eager) f.persist() else f
      }
      if (eager) toFree += frontier
      explored = explored.unionByName(frontier)
      val expanded = frontier.join(edges, col("node") === col("src"))
        .select(col("qid"), col("dst").as("node"))
      val cand = visited.select(col("qid"), col("node"))
        .unionByName(expanded).distinct()
      val scored = score(cand)
      visited = if (eager) scored.localCheckpoint() else scored
    }
    toFree.foreach(_.unpersist())
    visited.filter(col("node") =!= col("qid"))
      .groupBy(col("qid")).agg(topk(col("cos"), col("node")).as("h"))
      .select(col("qid"), posexplode(col("h")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("vb"), col("col.score").as("cos"))
  }

  // ---- multi-layer HNSW -----------------------------------------------

  /** Deterministic HNSW level per node from the md5 coin: level l with
    * probability 4^{-l} (the geometric level draw of HNSW, Malkov &
    * Yashunin 2016 §4 alg. 1, with p = 1/4 ≈ exp(−1/mL) — but from the
    * node id's content hash instead of an RNG, so the hierarchy is a pure
    * function of the id set and exactly mirrorable cross-engine).
    * Returns (idCol, lvl).
    */
  def hnswLevels(nodes: DataFrame, idCol: String, maxLevel: Int): DataFrame =
    nodes.select(col(idCol), hnswLevelCol(col(idCol), maxLevel).as("lvl"))

  /** The level draw as a bare COLUMN — a pure function of the id, so
    * leveling a relation is a projection (`withColumn`), never a join
    * back against [[hnswLevels]]: the id-keyed self-join it replaces was
    * a full extra shuffle of the corpus for a value computable in the
    * scan's own codegen stage.
    */
  def hnswLevelCol(id: Column, maxLevel: Int): Column = {
    require(maxLevel >= 1 && maxLevel <= 8, s"bad maxLevel=$maxLevel")
    val h = TextAnalysis.md5Long(id.cast("string"))
    // fold LOW level first so the HIGHEST level's test ends up outermost:
    // h % 16 == 0 implies h % 4 == 0, so a level-2 node must hit the
    // level-2 branch before the level-1 branch can swallow it
    (1 to maxLevel).foldLeft(lit(0)) { (els, l) =>
      when(h % lit(1L << (2 * l)) === 0, lit(l)).otherwise(els)
    }.cast("int")
  }

  /** Multi-layer HNSW search — the hierarchy over [[nswEdges]]/
    * [[beamSearch]]: each layer l ≥ 1 is the sub-corpus at [[hnswLevels]]
    * ≥ l with its OWN navigable graph (within-cell kNN + hub backbone over
    * the members), descended from the top layer's global entry point
    * (smallest member id) down to layer 1. Each upper layer runs one
    * beam-1 expansion round and carries its top-`beam` visited nodes down
    * as the next layer's entries — the ef-carry of HNSW (ef = beam > 1 on
    * descent), which is what makes the hierarchy robust to a DECEPTIVE
    * best-so-far: a greedy top-1 descent can park in a cluster whose hub
    * happens to outscore the true cluster's hub, and a sparse upper layer
    * gives it no edge to climb back out; carrying the runner-ups keeps the
    * true cluster's representative alive for layer 0 to expand. Layer 0
    * (everyone) then runs the full beam search. The zoom-out property is
    * the classic one: upper layers are 4^l-sparser uniform samples, so a
    * few cheap hops land the layer-0 search near the true neighborhood
    * instead of at a fixed per-cell hub.
    *
    * Scale shape: level assignment is one codegen'd projection; layer-l
    * graph build works on a 4^l-smaller relation (the layer-0 build, the
    * expensive one, is exactly [[nswEdges]]); the descent adds L bounded
    * beam-1 rounds. Every layer's search is deterministic (6-dp cosine,
    * id tie-breaks), so the whole hierarchy unrolls into an exact SQL
    * mirror. Upper layers must be non-empty — with 4^{-l} occupancy this
    * holds for any real corpus; a corpus too small for the hierarchy
    * should lower maxLevel (loud require, never a silent engine-divergent
    * skip).
    */
  def hnswSearch(corpus: DataFrame, cells: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, cellCol: String, dim: Int,
                 m: Int, maxLevel: Int, k: Int, beam: Int,
                 rounds: Int,
                 prebuiltEdges0: Option[DataFrame] = None): DataFrame = {
    // leveling is a projection (no join, no checkpoint): `cells` is
    // typically already materialized by the caller (memoized assignment
    // or a persisted index), and the two consumers below — the apex
    // aggregate and the one layered edge build — each fold the level
    // column into their own scan
    val layered = cells.withColumn("lvl", hnswLevelCol(col(idCol), maxLevel))
    val top = layered.filter(col("lvl") >= maxLevel)
      .agg(min(col(idCol))).head()
    require(!top.isNullAt(0),
      s"hnswSearch: layer $maxLevel is empty — lower maxLevel for this corpus")
    // the require already collected the apex — seed it as a literal
    // instead of re-running the min aggregation inside the search job
    val entries = queries.select(col(idCol).as("qid"))
      .withColumn("node", lit(top.get(0)))
    // ALL layers' edge lists come out of one [[nswEdgesLayered]] job,
    // checkpointed once — each layer's slice is then a cheap filter over
    // the materialized relation, read as often as the beam rounds need.
    // The per-layer orchestration this replaces paid a fixed build-and-
    // materialize job per layer regardless of member count, which was
    // the dominant cost of the whole search. (Folding the build lazily
    // into the descent job via persist() was measured SLOWER — the two
    // slice consumers re-plan the whole build subtree and the descent
    // job's plan doubles; the eager checkpoint is the right barrier
    // here, exactly one job for all layers.) Layer 0 is everyone, so its
    // slice equals nswEdges over the bare cell assignment — a caller
    // that already built it (e.g. for a single-layer beam search over
    // the same corpus and m) passes it in and the layered build skips
    // layer 0 entirely (its pairs dominate the pass).
    val lo = if (prebuiltEdges0.isDefined) 1 else 0
    val allEdges = nswEdgesLayered(layered, idCol, vecCol, cellCol, "lvl",
      dim, m, lo, maxLevel).localCheckpoint()
    def layerE(l: Int): DataFrame =
      allEdges.filter(col("lvl") === l).select(col("src"), col("dst"))
    val upperEdges = (maxLevel to 1 by -1).map(layerE)
    val edges0 = prebuiltEdges0.getOrElse(layerE(0))
    hnswSearchPrebuilt(corpus, queries, idCol, vecCol, dim, upperEdges,
      edges0, entries, k, beam, rounds)
  }

  /** The descent + layer-0 search over PREBUILT layer graphs — the shared
    * tail of [[hnswSearch]] (in-memory build) and [[GraphAnnIndex.probe]]
    * (persisted layout). `upperEdges` lists the layer edge relations TOP
    * layer first; `entries` seeds every query at the apex entry point
    * (qid, node). Identical semantics to the in-memory path by
    * construction — the same beamSearch calls over the same relations.
    */
  def hnswSearchPrebuilt(corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, dim: Int,
                         upperEdges: Seq[DataFrame], edges0: DataFrame,
                         entries0: DataFrame, k: Int, beam: Int,
                         rounds: Int): DataFrame = {
    var entries = entries0
    upperEdges.foreach { edgesL =>
      entries = beamSearch(corpus, edgesL, queries, idCol, vecCol, dim,
          entries, k = beam, beam = 1, rounds = 1)
        .select(col("qid"), col("vb").as("node"))
    }
    // ONE checkpoint between the descent and the layer-0 search. The
    // descent stays lazy per layer (an eager barrier per layer was
    // measured slower), but each lazy layer references its predecessor's
    // plan several times, so L layers multiply the subtree into the
    // layer-0 rounds — measured: a 2-layer descent left ~600 exchanges /
    // ~900 KB of plan text in round 2, and Catalyst planning (not
    // compute) dominated the whole search. The materialization is
    // |Q|·beam rows.
    val seed =
      if (upperEdges.isEmpty) entries else entries.localCheckpoint()
    beamSearch(corpus, edges0, queries, idCol, vecCol, dim, seed,
      k = k, beam = beam, rounds = rounds)
  }
}
