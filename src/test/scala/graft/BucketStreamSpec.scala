package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Relational
import graft.streaming.RT

class BucketStreamSpec extends SparkSpec {

  test("co-bucketed tables join without a shuffle exchange") {
    // a fresh in-memory catalog + a persistent warehouse dir from an earlier
    // JVM = LOCATION_ALREADY_EXISTS; clear both before writing
    Seq("b_facts", "b_dims").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val facts = df("k INT, v DOUBLE", (1 to 500).map(i => R(i % 50, i * 1.0)))
    val dims = df("k INT, name STRING", (1 to 50).map(i => R(i, s"n$i")))
    Relational.writeBucketed(facts, "b_facts", Seq("k"), 8)
    Relational.writeBucketed(dims, "b_dims", Seq("k"), 8)
    val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
    // co-bucketed layout: the sort-merge join must read buckets directly
    val plan = joined.queryExecution.executedPlan.toString
    withClue(plan) {
      assert(!plan.contains("Exchange hashpartitioning"))
    }
    assert(joined.count() == 490) // k=0 has no dim row
  }

  test("streaming windowAgg: tumbling event-time windows with watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val events = input.toDF().toDF("k", "ts", "v")
    val q = RT.windowAgg(events, "k", "ts", "v", "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("winagg").outputMode("complete").start()
    try {
      input.addData(
        ("a", Timestamp.valueOf("2024-01-01 10:01:00"), 1.0),
        ("a", Timestamp.valueOf("2024-01-01 10:04:00"), 2.0),
        ("a", Timestamp.valueOf("2024-01-01 10:06:00"), 10.0))
      q.processAllAvailable()
      val rows = spark.table("winagg").orderBy("window").collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(rows(0).fieldIndex("n")) == 2)   // 10:00–10:05
      assert(rows(0).getDouble(rows(0).fieldIndex("sum_v")) == 3.0)
      assert(rows(1).getDouble(rows(1).fieldIndex("sum_v")) == 10.0)
    } finally q.stop()
  }

  test("streaming sessionAgg: session_window splits on the inactivity gap") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val events = input.toDF().toDF("k", "ts")
    val q = RT.sessionAgg(events, "k", "ts", gap = "1 hour", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessagg").outputMode("complete").start()
    try {
      input.addData(
        ("u", Timestamp.valueOf("2024-01-01 10:00:00")),
        ("u", Timestamp.valueOf("2024-01-01 10:30:00")), // same session
        ("u", Timestamp.valueOf("2024-01-01 14:00:00"))) // gap > 1h → new
      q.processAllAvailable()
      val rows = spark.table("sessagg").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getLong(rows.head.fieldIndex("n"))).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }
}
