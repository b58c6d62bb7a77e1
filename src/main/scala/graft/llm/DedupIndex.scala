package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH dedup index — the dedup-family analog of
  * [[Similarity.saveIndex]]/[[Similarity.appendToIndex]]: a refreshed
  * crawl is checked against everything already accepted WITHOUT
  * re-shingling or re-signing the accepted corpus each day. (The
  * in-memory form of the same check is [[Dedup.crossCorpusDedup]]; this
  * is its incremental-state form — at 100 TB the reference corpus'
  * signatures are the thing you cannot afford to recompute per batch.)
  *
  * On disk under `path`:
  *   - `bands/`   (id, sig) partitioned by `band` — the LSH buckets a
  *     probe's bands equi-join against; the only relation the candidate
  *     step reads.
  *   - `docsets/` (id, set: array<string>, sz) — each document's sorted
  *     distinct shingle array, read ONLY for verified candidates (semi-
  *     join pushdown) and intersected with [[Dedup.prefixJaccardPairs]]'s
  *     array-verify shape: |cand| rows, never an exploded inverted index.
  *   - `meta/`    one-line JSON with (n, k, r, idCol) plus a HASH PROBE —
  *     the configured hash function applied to a fixed sentinel at build
  *     time. Append/query re-evaluate the probe and refuse on mismatch,
  *     so an index built with md5 can never be silently extended or
  *     queried with a different hash family (parameters can be persisted;
  *     a function cannot — the probe value is its observable fingerprint).
  *
  * Append is write-only amortization: new documents' bands/docsets land
  * next to the old (schema-guarded like appendToIndex); nothing existing
  * is rewritten. The caller owns id uniqueness across appends — duplicate
  * ids would double-count themselves as their own near-dups.
  */
object DedupIndex {

  private val Sentinel = "graft-dedup-index-hash-probe"

  final case class Meta(n: Int, k: Int, r: Int, idCol: String, hashProbe: Long)

  /** One shared default-hash function VALUE: a `hash: Column => Column =
    * TextAnalysis.md5Long` default argument would allocate a fresh lambda
    * per call and defeat the probe memo below.
    */
  private val DefaultHash: Column => Column = TextAnalysis.md5Long

  // the probe depends only on the hash FUNCTION (a deterministic expression
  // over a literal), not on any session or data — evaluate each distinct
  // function instance once per JVM instead of one tiny job per
  // save/append/query call. Keys are INSTANCE identities: only a stable
  // function value (like DefaultHash) actually hits; a caller passing an
  // inline lambda or eta-expanded def pays the job each time, so the map
  // is size-capped against per-call-lambda callers in long-lived drivers.
  private val probeMemo =
    new java.util.concurrent.ConcurrentHashMap[AnyRef, java.lang.Long]()

  private def probeValue(spark: SparkSession, hash: Column => Column): Long = {
    if (probeMemo.size > 64) probeMemo.clear()
    probeMemo.computeIfAbsent(hash, _ =>
      spark.range(1).select(hash(lit(Sentinel)).cast("long")).head().getLong(0)
    ).longValue()
  }

  private def bandsOf(sh: DataFrame, idCol: String, k: Int, r: Int,
                      hash: Column => Column): DataFrame =
    Dedup.lshBands(Dedup.minhashSignature(sh, idCol, k, hash), idCol, k, r)
      .select(col(idCol), col("sig"), col("band"))

  private def docsetsOf(sh: DataFrame, idCol: String): DataFrame =
    sh.groupBy(col(idCol)).agg(
      sort_array(collect_list(col("sh"))).as("set"),
      count(lit(1)).as("sz"))

  /** Build the index from scratch (overwrites `path`). */
  def save(df: DataFrame, idCol: String, textCol: String, path: String,
           n: Int = 3, k: Int = 16, r: Int = 4,
           hash: Column => Column = DefaultHash): Unit = {
    require(k > 0 && r > 0 && k % r == 0, s"k=$k must be a multiple of r=$r")
    // idCol lands verbatim in the one-line meta JSON: a quote or newline
    // would write an index whose meta can never be parsed back
    require(!idCol.exists(c => c == '"' || c == '\n' || c == '\r'),
      s"idCol must not contain quotes or newlines: $idCol")
    val spark = df.sparkSession
    val sh = Dedup.shingles(df, idCol, textCol, n).cache()
    try {
      bandsOf(sh, idCol, k, r, hash).write.mode("overwrite")
        .partitionBy("band").parquet(s"$path/bands")
      docsetsOf(sh, idCol).write.mode("overwrite").parquet(s"$path/docsets")
    } finally sh.unpersist()
    val meta = s"""{"n":$n,"k":$k,"r":$r,"idCol":"$idCol",""" +
      s""""hashProbe":${probeValue(spark, hash)}}"""
    import spark.implicits._
    // a 1-row text write instead of java.nio so the index lives on any
    // Hadoop-visible filesystem, not only local disk
    Seq(meta).toDS().coalesce(1).write.mode("overwrite").text(s"$path/meta")
    // a rebuilt index starts a fresh ingest history: a stale streaming
    // batch marker (RT.dedupIngestBatch) from a previous index at the
    // same path would silently skip the new stream's early batches
    val marker = new org.apache.hadoop.fs.Path(s"$path/_ingest_batch")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(marker, false)
  }

  private val MetaRe =
    ("""\{"n":(\d+),"k":(\d+),"r":(\d+),"idCol":"([^"]*)",""" +
      """"hashProbe":(-?\d+)\}""").r

  def readMeta(spark: SparkSession, path: String): Meta =
    spark.read.text(s"$path/meta").head().getString(0) match {
      case MetaRe(n, k, r, idCol, hp) =>
        Meta(n.toInt, k.toInt, r.toInt, idCol, hp.toLong)
      case other => throw new IllegalStateException(
        s"unreadable dedup index meta at $path/meta: $other")
    }

  private def requireSameHash(spark: SparkSession, m: Meta,
                              hash: Column => Column): Unit = {
    val p = probeValue(spark, hash)
    require(p == m.hashProbe,
      s"hash function mismatch: index was built with probe ${m.hashProbe}, " +
        s"caller's hash evaluates the sentinel to $p")
  }

  private def requireAligned(appended: DataFrame, existing: DataFrame,
                             what: String): Unit = {
    // the appendToIndex precedent: compare via dataType.sql (nullability
    // round-trips lossily through parquet); band is the partition column,
    // presence-only
    val ex = existing.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val ap = appended.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    require(ap.keySet == ex.keySet,
      s"$what append columns ${ap.keySet.toSeq.sorted.mkString(",")} do not " +
        s"match the saved index ${ex.keySet.toSeq.sorted.mkString(",")}")
    ex.foreach { case (c, dt) =>
      require(c == "band" || ap(c) == dt,
        s"$what append column $c has type ${ap(c)}, saved index has $dt")
    }
  }

  /** Append new documents' bands and docsets (no rewrite of the existing
    * index). The new frame must use the same id column, parameters and
    * hash function the index was built with.
    */
  def append(spark: SparkSession, path: String, newDf: DataFrame,
             idCol: String, textCol: String,
             hash: Column => Column = DefaultHash): Unit = {
    val m = readMeta(spark, path)
    require(idCol == m.idCol,
      s"index id column is ${m.idCol}, append called with $idCol")
    requireSameHash(spark, m, hash)
    val sh = Dedup.shingles(newDf, idCol, textCol, m.n).cache()
    try {
      val nb = bandsOf(sh, idCol, m.k, m.r, hash)
      requireAligned(nb, spark.read.parquet(s"$path/bands"), "bands")
      nb.write.mode("append").partitionBy("band").parquet(s"$path/bands")
      val nd = docsetsOf(sh, idCol)
      requireAligned(nd, spark.read.parquet(s"$path/docsets"), "docsets")
      nd.write.mode("append").parquet(s"$path/docsets")
    } finally sh.unpersist()
  }

  /** Probe documents against the index: for each probe id, `keep` (no
    * verified near-dup in the index), `dup_of` (smallest matching index
    * id) and `best_jac` (highest verified Jaccard) — the
    * [[Dedup.crossCorpusDedup]] output contract, computed from persisted
    * state. A probe id present in the index never matches itself.
    * Both the probe bands and the loaded index bands go through
    * [[Dedup.capBuckets]] — a boilerplate signature accumulated in the
    * index over many appends would otherwise make every probe of that
    * bucket quadratic; the index-side count window rides the same
    * (band, sig) exchange the probe join needs.
    */
  def query(spark: SparkSession, path: String, probe: DataFrame,
            idCol: String, textCol: String, minJaccard: Double = 0.5,
            hash: Column => Column = DefaultHash,
            maxBucket: Int = 1000,
            excludeIds: Option[DataFrame] = None): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0, 1], got $minJaccard")
    val m = readMeta(spark, path)
    requireSameHash(spark, m, hash)
    val shP = Dedup.shingles(probe, idCol, textCol, m.n).cache()
    try {
      val bp = Dedup.capBuckets(bandsOf(shP, idCol, m.k, m.r, hash), maxBucket)
        .select(col(idCol).as("da"), col("band"), col("sig"))
      // excludeIds drops index entries BEFORE the cap — the crash-retry
      // guard for ingest loops: a batch replayed after a partial append
      // excludes its OWN ids, so the probe sees exactly the index state
      // the first run saw and flags identically
      val idxRaw = spark.read.parquet(s"$path/bands")
        .select(col(m.idCol).as("id"), col("band"), col("sig"))
      val idxFiltered = excludeIds.fold(idxRaw)(ex =>
        idxRaw.join(ex.select(col(ex.columns.head).as("id")),
          Seq("id"), "left_anti"))
      val idx = Dedup.capBuckets(idxFiltered, maxBucket)
        .select(col("id").as("db"), col("band"), col("sig"))
      val cand = bp.join(idx, Seq("band", "sig"))
        .filter(col("da") =!= col("db"))
        .select(col("da"), col("db")).distinct()
        .localCheckpoint() // tiny by LSH construction; subtree is the whole
                           // probe signature pipeline + an index scan
      val idxSets = spark.read.parquet(s"$path/docsets")
        .select(col(m.idCol).as("db"), col("set").as("setb"),
          col("sz").as("szb"))
        .join(Dedup.maybeBroadcast(cand.select(col("db")).distinct()),
          Seq("db"), "left_semi")
      val probeSets = docsetsOf(shP, idCol)
        .select(col(idCol).as("da"), col("set").as("seta"),
          col("sz").as("sza"))
      val per = cand
        .join(probeSets, "da")
        .join(idxSets, "db")
        .withColumn("c",
          size(array_intersect(col("seta"), col("setb"))).cast("long"))
        .withColumn("jac",
          round(col("c") / (col("sza") + col("szb") - col("c")), 6))
        .filter(col("jac") >= minJaccard)
        .groupBy(col("da"))
        .agg(min(col("db")).as("dup_of"), max(col("jac")).as("best_jac"))
        .localCheckpoint() // eager: release the probe shingle cache
      probe.select(col(idCol))
        .join(per.withColumnRenamed("da", idCol), Seq(idCol), "left")
        .withColumn("keep", col("dup_of").isNull)
    } finally shP.unpersist()
  }
}
