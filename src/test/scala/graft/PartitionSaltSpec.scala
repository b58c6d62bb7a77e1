package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.streaming.RT

class PartitionSaltSpec extends SparkSpec {

  test("saltedJoin equals the plain join") {
    val left = df("k INT, v INT", (1 to 100).map(i => R(i % 3, i)))
    val right = df("k INT, name STRING", Seq(R(0, "zero"), R(1, "one"), R(2, "two")))
    val plain = left.join(right, Seq("k")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val salted = Relational.saltedJoin(left, right, Seq("k"), nSalts = 4).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("writeDayPartitioned: dynamic overwrite replaces only the rewritten day") {
    val dir = Files.createTempDirectory("graft_days").toString
    val v1 = df("ts TIMESTAMP, v INT", Seq(
      R(Timestamp.valueOf("2024-01-01 10:00:00"), 1),
      R(Timestamp.valueOf("2024-01-02 10:00:00"), 2)))
    RT.writeDayPartitioned(v1, "ts", dir)
    // re-run day 2 with a corrected value; day 1 must survive untouched
    val v2 = df("ts TIMESTAMP, v INT", Seq(
      R(Timestamp.valueOf("2024-01-02 10:00:00"), 99)))
    RT.writeDayPartitioned(v2, "ts", dir)
    val back = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Any]("day").toString, r.getInt(r.fieldIndex("v")))).toSet
    assert(back == Set(("20240101", 1), ("20240102", 99)))
  }
}
