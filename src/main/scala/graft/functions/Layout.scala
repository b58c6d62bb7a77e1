package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional locality — the OPTIMIZE ZORDER
  * technique of lakehouse table formats as first-class expressions: files
  * range-partitioned and sorted by an interleaved-bit key keep rows close
  * in EVERY keyed dimension, so min/max row-group statistics prune scans
  * on any of the interleaved columns, not just the leading sort column.
  */
object Layout {

  /** Z-order (Morton) key: interleave the low `bits` bits of each column —
    * bit b of column i lands at position b·n+i. Pure integer bit ops in
    * one codegen'd projection; columns must already be bucketed to
    * non-negative values below 2^bits (the caller picks the bucketing —
    * modulo, quantile bucket, epoch-day…).
    */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n > 0 && bits > 0 && n * bits <= 63,
      s"zorderKey needs 0 < cols*bits <= 63; got $n cols x $bits bits")
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduceLeft(_ bitwiseOR _)
  }

  /** Range-partition and sort a frame by its z-order key — the write-side
    * layout pass. The range exchange samples key quantiles so output files
    * carry contiguous z-ranges (= small per-file bounding boxes in every
    * interleaved dimension); downstream scans filtered on ANY of the
    * keyed columns prune files by min/max stats. The key column is kept
    * (`keyCol`) so readers and tests can see the layout.
    */
  def repartitionZOrdered(df: DataFrame, cols: Seq[Column], bits: Int,
                          partitions: Int,
                          keyCol: String = "zkey"): DataFrame =
    df.withColumn(keyCol, zorderKey(cols, bits))
      .repartitionByRange(partitions, col(keyCol))
      .sortWithinPartitions(col(keyCol))

  /** Small-file compaction plan (the OPTIMIZE bin-packing pass of lakehouse
    * formats): assign each file to an output bin so bins approach
    * `targetBytes`. Within a partition, files are laid out largest-first
    * (size desc, then file id — deterministic) and each file's bin is the
    * one its running-total START offset falls in — next-fit by offset, so
    * a file never splits and every bin except a partition's last holds at
    * least `targetBytes` of input. Pure window arithmetic over the file
    * MANIFEST (one row per file — a 100 TB table is ~10⁵ manifest rows),
    * never the data.
    *
    * Input columns: `partCol` (partition key), `fileCol` (file id),
    * `sizeCol` (bytes, long). Output: one row per file —
    * (part, file, size, bin, n_files/bin_bytes via [[compactionBins]]).
    */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
                     sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"compactionPlan needs targetBytes > 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol))
      .orderBy(col(sizeCol).desc, col(fileCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files.select(col(partCol), col(fileCol), col(sizeCol))
      .withColumn("__start", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      // long-typed floor division: sizes are exact integers, so the bin
      // index is exact integer arithmetic on both engines (no double round)
      .withColumn("bin", (col("__start") - pmod(col("__start"), lit(targetBytes)))
        / targetBytes)
      .withColumn("bin", col("bin").cast("long"))
      .drop("__start")
  }

  /** Contract a [[compactionPlan]] to its bin summary: one row per output
    * bin with the file count and total bytes — what the compaction
    * executor materializes, and the relation a scheduler sizes tasks by.
    */
  def compactionBins(plan: DataFrame, partCol: String, sizeCol: String): DataFrame =
    plan.groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col(sizeCol)).as("bin_bytes"))

  /** Execute a compaction over a parquet directory: list the data files,
    * plan bins with [[compactionPlan]] (single partition — directory-level
    * compaction), then rewrite in ONE distributed job: read everything,
    * map each row to its file's bin through a broadcast manifest join on
    * `input_file_name()`, and write partitioned by bin — each bin lands as
    * its own output task's file(s). Returns the plan used. No driver-side
    * per-bin loop: a million-file table compacts in one pass.
    */
  def compactDirectory(spark: org.apache.spark.sql.SparkSession,
                       inDir: String, outDir: String,
                       targetBytes: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
    require(files.nonEmpty, s"compactDirectory: no parquet files under $inDir")
    import spark.implicits._
    val manifest = files.toSeq.toDF("file", "size")
      .withColumn("part", org.apache.spark.sql.functions.lit(0))
    val plan = compactionPlan(manifest, "part", "file", "size", targetBytes)
      .localCheckpoint() // consumed by the join below and returned
    // join on the BASENAME: input_file_name() and FileStatus render the
    // same path with different scheme spellings (file:/ vs file:///);
    // within one directory the basename is unique either way
    val base = (c: Column) =>
      element_at(split(c, "/"), -1)
    spark.read.parquet(inDir)
      .withColumn("__f", base(org.apache.spark.sql.functions.input_file_name()))
      .join(org.apache.spark.sql.functions.broadcast(
        plan.select(base(col("file")).as("__f"), col("bin"))), Seq("__f"))
      .drop("__f")
      .repartition(col("bin"))
      .write.mode("overwrite").partitionBy("bin").parquet(outDir)
    plan
  }
}
