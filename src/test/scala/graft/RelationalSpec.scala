package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("naReplace maps the sentinel to null on float/double columns only") {
    val d = df("s STRING, v DOUBLE", Seq(R("a", -9999.0), R("b", 1.5)))
    val out = Relational.naReplace(d).collect().map(r => (r.getString(0), r.isNullAt(1)))
    assert(out.toSet == Set(("a", true), ("b", false)))
  }

  test("dedupKeepFirst keeps the row with the smallest tie-break key") {
    val d = df("k STRING, ord INT, v STRING",
      Seq(R("x", 2, "late"), R("x", 1, "early"), R("y", 5, "only")))
    val out = Relational.dedupKeepFirst(d, Seq("k"), "ord")
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(out == Set(("x", "early"), ("y", "only")))
  }

  test("incrementalMerge appends only missing keys; overwrite flips precedence") {
    val old = df("k INT, v STRING", Seq(R(1, "old1"), R(2, "old2")))
    val inc = df("k INT, v STRING", Seq(R(2, "new2"), R(3, "new3")))
    val keep = Relational.incrementalMerge(old, inc, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(keep == Set((1, "old1"), (2, "old2"), (3, "new3")))
    val over = Relational.incrementalMerge(old, inc, Seq("k"), overwrite = true)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(over == Set((1, "old1"), (2, "new2"), (3, "new3")))
  }

  test("upsert dedups on the key") {
    val old = df("k INT, v STRING", Seq(R(1, "a"), R(2, "b")))
    val nw = df("k INT, v STRING", Seq(R(2, "b"), R(3, "c")))
    assert(Relational.upsert(old, nw, Seq("k")).count() == 3)
  }

  test("wetPeriodFilter keeps whole qualifying hours") {
    val rows = Seq(
      R("s1", Timestamp.valueOf("2024-01-01 10:05:00"), 0.2),
      R("s1", Timestamp.valueOf("2024-01-01 10:25:00"), 0.3), // hour sum 0.5 >= 0.5
      R("s1", Timestamp.valueOf("2024-01-01 11:05:00"), 0.1)) // hour sum 0.1 < 0.5
    val d = df("sta STRING, ts TIMESTAMP, v DOUBLE", rows)
    val out = Relational.wetPeriodFilter(d, "sta", "ts", "v", 0.5)
    assert(out.count() == 2)
  }

  test("fullPeriodFilter keeps only groups with exactly n rows") {
    val rows = (0 until 6).map(i =>
      R("s1", Timestamp.valueOf(f"2024-01-01 10:${i * 10}%02d:00"), 1.0)) ++
      Seq(R("s1", Timestamp.valueOf("2024-01-01 11:10:00"), 1.0))
    val d = df("sta STRING, ts TIMESTAMP, v DOUBLE", rows)
    assert(Relational.fullPeriodFilter(d, "sta", "ts", 6).count() == 6)
  }

  test("threeWaySemi keeps keys present in all three tables") {
    val m = df("k INT, v STRING", Seq(R(1, "a"), R(2, "b"), R(3, "c")))
    val o1 = df("k INT", Seq(R(1), R(2)))
    val o2 = df("k INT", Seq(R(2), R(3)))
    val out = Relational.threeWaySemi(m, o1, o2, Seq("k")).collect().map(_.getInt(0))
    assert(out.toSeq == Seq(2))
  }
}
