package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.operators.AsOf
import graft.qpe.Grid
import graft.sources.Archive

class ArchiveRangeSpec extends SparkSpec {

  test("rangeJoin equals the naive theta-join, without a cartesian plan") {
    val left = df("id INT, ts TIMESTAMP",
      (0 until 200).map(i => R(i, Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00"))))
    val right = df("tag STRING, start TIMESTAMP, end TIMESTAMP", Seq(
      R("morning", Timestamp.valueOf("2024-01-01 06:00:00"), Timestamp.valueOf("2024-01-01 11:59:00")),
      R("evening", Timestamp.valueOf("2024-01-01 18:00:00"), Timestamp.valueOf("2024-01-01 22:00:00"))))
    val naive = left.crossJoin(right)
      .filter(col("ts") >= col("start") && col("ts") <= col("end"))
      .select("id", "tag").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val ranged = AsOf.rangeJoin(left, right, "ts", "start", "end", 3600L)
      .select("id", "tag").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(ranged == naive)
    assert(naive.nonEmpty)
    val plan = AsOf.rangeJoin(left, right, "ts", "start", "end", 3600L)
      .queryExecution.executedPlan.toString
    withClue(plan) {
      assert(!plan.contains("CartesianProduct"))
      assert(!plan.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("zip manifest scan prunes members before extraction") {
    val dir = Files.createTempDirectory("graft_zip")
    val zipPath = dir.resolve("day.zip").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(zipPath))
    Seq("radar_A_0005.csv" -> "k,v\n1,10\n", "radar_B_0005.csv" -> "k,v\n2,20\n",
        "status_A.xml" -> "<x/>").foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(1700000000000L)
      zos.putNextEntry(e)
      zos.write(content.getBytes)
      zos.closeEntry()
    }
    zos.close()

    val man = Archive.manifest(spark, zipPath)
    assert(man.count() == 3)
    val out = Archive.prunedScan(spark, zipPath, "radar_.*\\.csv", 0L, dir) { paths =>
      assert(paths.length == 2) // xml pruned before any extraction
      spark.read.option("header", "true").option("inferSchema", "true").csv(paths: _*)
    }
    assert(out.agg(sum("v")).collect().head.getLong(0) == 30)
  }

  test("raw DN sink round-trips through the scale array") {
    val scale = Array(0.1, 0.5, 1.0, 2.0, 5.0)
    val grid = Array(
      Array(0.05, 0.7, Double.NaN),
      Array(3.0, 10.0, 0.1))
    val path = Files.createTempDirectory("graft_dn").resolve("g.raw").toString
    Grid.writeRawDN(grid, scale, path)
    val back = Grid.readRawDN(path, 2, 3, scale)
    assert(back(0)(2).isNaN)
    // values snap to the scale step at-or-below (DN encode is lossy by design)
    assert(back(0)(1) == 0.5)  // 0.7 → dn 2 → 0.5
    assert(back(1)(0) == 2.0)  // 3.0 → dn 4 → 2.0
    assert(back(1)(1) == 5.0)  // 10.0 → dn 5 → 5.0
  }
}
