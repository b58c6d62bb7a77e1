package graft

import org.apache.spark.sql.functions._

import graft.functions.Layout

/** Executed small-file compaction: [[Layout.compactDirectory]] must
  * rewrite a many-small-files directory into approximately-target-sized
  * bins in ONE distributed job, preserving the data exactly.
  */
class CompactionSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"), name)
    val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    f.getAbsolutePath
  }

  test("compactionPlan: next-fit-by-offset bins, largest-first, per partition") {
    import spark.implicits._
    val files = Seq(
      ("p1", 1L, 70L), ("p1", 2L, 50L), ("p1", 3L, 40L), ("p1", 4L, 10L),
      ("p2", 5L, 200L), ("p2", 6L, 5L))
      .toDF("part", "file", "size")
    val plan = Layout.compactionPlan(files, "part", "file", "size", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // p1 order: 70, 50, 40, 10 → starts 0, 70, 120, 160 → bins 0, 0, 1, 1
    assert(plan(("p1", 1L)) == 0L && plan(("p1", 2L)) == 0L)
    assert(plan(("p1", 3L)) == 1L && plan(("p1", 4L)) == 1L)
    // p2: 200 starts at 0 (bin 0, oversized files never split), 5 at bin 2
    assert(plan(("p2", 5L)) == 0L && plan(("p2", 6L)) == 2L)
    val bins = Layout.compactionBins(
      Layout.compactionPlan(files, "part", "file", "size", 100L), "part", "size")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(bins(("p1", 0L)) == ((2L, 120L)) && bins(("p1", 1L)) == ((2L, 50L)))
  }

  test("compactDirectory rewrites many small files into few bins, data intact") {
    import spark.implicits._
    val inDir = tmp("graft_compact_in")
    val outDir = tmp("graft_compact_out")
    val data = (0 until 5000).map(i => (i.toLong, s"row_$i", i * 0.5))
      .toDF("id", "name", "v")
    // 40 deliberately tiny input files
    data.repartition(40).write.parquet(inDir)
    val fs = new org.apache.hadoop.fs.Path(inDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) { val s = it.next(); if (s.getPath.getName.endsWith(".parquet")) out += s }
      out.toSeq
    }
    val inFiles = parquetFiles(inDir)
    assert(inFiles.size == 40)
    val totalBytes = inFiles.map(_.getLen).sum
    val target = totalBytes / 4 // aim for ~4 bins
    val plan = Layout.compactDirectory(spark, inDir, outDir, target)
    val nBins = plan.select(col("bin")).distinct().count()
    assert(nBins <= 6, s"expected ~4 bins, planned $nBins")
    val outFiles = parquetFiles(outDir)
    assert(outFiles.size < 40 && outFiles.size >= nBins,
      s"compaction produced ${outFiles.size} files from 40 (bins: $nBins)")
    // data unchanged, row for row
    val back = spark.read.parquet(outDir).select(col("id"), col("name"), col("v"))
    assert(back.count() == 5000)
    assert(back.exceptAll(data).isEmpty && data.exceptAll(back).isEmpty)
  }
}
