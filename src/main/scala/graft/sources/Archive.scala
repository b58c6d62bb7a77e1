package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Path}
import java.util.zip.ZipFile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** S6: zip-archive pruned scan (reference: common/retrieve_data.py:496-579
  * _retrieve_prod_daily) — list members as a manifest DataFrame, prune by
  * time range / name pattern / sweep list relationally, extract ONLY the
  * surviving members, then hand the paths to the columnar reader. The
  * manifest is metadata-sized, so pruning happens before any byte of payload
  * moves — the archive analogue of partition pruning.
  */
object Archive {

  /** Manifest of archive members: (name, size_bytes, mtime_epoch). */
  def manifest(spark: SparkSession, zipPath: String): DataFrame = {
    import spark.implicits._
    val zf = new ZipFile(zipPath)
    try {
      zf.entries().asScala
        .filterNot(_.isDirectory)
        .map(e => (e.getName, e.getSize, e.getTime / 1000))
        .toSeq.toDF("name", "size_bytes", "mtime_epoch")
    } finally zf.close()
  }

  /** Extract the named members to a directory, returning their paths —
    * called with an already-pruned name list (driver-side IO, like the
    * reference's member extraction; payloads can also be streamed to memory).
    */
  def extract(zipPath: String, names: Seq[String], destDir: Path): Seq[String] = {
    val zf = new ZipFile(zipPath)
    try {
      names.map { n =>
        val entry = zf.getEntry(n)
        require(entry != null, s"member $n not in $zipPath")
        val dest = destDir.resolve(n.replace('/', '_'))
        val in = zf.getInputStream(entry)
        val out = new BufferedOutputStream(new FileOutputStream(dest.toFile))
        try in.transferTo(out) finally { in.close(); out.close() }
        dest.toString
      }
    } finally zf.close()
  }

  /** The full pruned-scan flow: manifest → relational pruning (pattern +
    * time range) → extract survivors → read.
    */
  def prunedScan(spark: SparkSession, zipPath: String, namePattern: String,
                 minMtimeEpoch: Long, destDir: Path)
                (read: Seq[String] => DataFrame): DataFrame = {
    val picked = manifest(spark, zipPath)
      .filter(col("name").rlike(namePattern) && col("mtime_epoch") >= minMtimeEpoch)
      .select("name").collect().map(_.getString(0)).toSeq
    read(extract(zipPath, picked, destDir))
  }
}
