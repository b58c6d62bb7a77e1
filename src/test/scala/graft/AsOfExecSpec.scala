package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf
import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

/** The custom physical as-of join (LogicalPlan + Strategy + SparkPlan) must
  * agree with the composed union+sort implementation on real data, and its
  * plan must show the declared exchange/sort requirements being satisfied
  * by Catalyst.
  */
class AsOfExecSpec extends SparkSpec {

  private def withStrategy[T](body: => T): T = {
    val prev = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = prev :+ AsOfJoinStrategy
    try body finally spark.experimental.extraStrategies = prev
  }

  test("AsOfJoinExec equals the union+sort as-of join on the events table") {
    withStrategy {
      val e = Core.table(spark, "/root/testdata/sf0.001", "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))

      val composed = AsOf.asofJoin(clicks, purchases, "user_id", "ts", Seq("value"))
        .select(col("event_id"), col("value"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

      val physical = AsOfJoinPlan.asofJoinExec(clicks, purchases, "user_id", "ts")
      // exec output carries both sides' columns; project the probe + value
      val out = physical.select(col("event_id"), col("value_r"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

      assert(out.size == composed.size)
      assert(out == composed)
      assert(out.values.exists(_.isDefined))  // some matches
      assert(out.values.exists(_.isEmpty))    // some leading nulls
    }
  }

  test("AsOfJoinExec plan shows the custom node with exchanges and sorts") {
    withStrategy {
      val e = Core.table(spark, "/root/testdata/sf0.001", "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val physical = AsOfJoinPlan.asofJoinExec(clicks, purchases, "user_id", "ts")
      physical.collect() // finalize the adaptive plan before inspecting it
      val plan = physical.queryExecution.executedPlan.toString
      withClue(plan) {
        assert(plan.contains("AsOfJoin")) // TreeNode.nodeName strips "Exec"
        assert(plan.contains("Exchange hashpartitioning"))
        assert(plan.contains("Sort ["))
      }
    }
  }

  test("AsOfJoinExec handles duplicate-heavy keys and exact-tie timestamps") {
    withStrategy {
      val left = df("k STRING, ts TIMESTAMP, lid INT", Seq(
        R("u", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1),
        R("u", java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2),
        R("v", java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 3)))
      val right = df("k STRING, ts TIMESTAMP, v DOUBLE", Seq(
        R("u", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0), // exact tie
        R("u", java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 2.0),
        R("w", java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 9.0)))
      val out = AsOfJoinPlan.asofJoinExec(left, right, "k", "ts")
        .select(col("lid"), col("v_r"))
        .collect().map(r => (r.getInt(0), Option(r.get(1)))).toMap
      assert(out(1).contains(1.0)) // same-instant right row is visible (<=)
      assert(out(2).contains(2.0))
      assert(out(3).isEmpty)       // key v has no right rows
    }
  }

  test("AsOfJoinExec resolves duplicate right rows at a tied (key, ts) to the max") {
    withStrategy {
      val left = df("k STRING, ts TIMESTAMP, lid INT", Seq(
        R("u", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1)))
      // three right rows at the SAME (key, ts): the tie contract says the
      // lexicographic max of the remaining columns attaches, not an
      // arbitrary shuffle survivor
      val right = df("k STRING, ts TIMESTAMP, v DOUBLE", Seq(
        R("u", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 2.0),
        R("u", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7.0),
        R("u", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5.0)))
        .repartition(4) // scatter the tied rows so only the contract, not
                        // input order, can make the result deterministic
      val out = AsOfJoinPlan.asofJoinExec(left, right, "k", "ts")
        .select(col("lid"), col("v_r"))
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
      assert(out(1) == 7.0)

      // and the composed asofJoin agrees (its struct-max reduction)
      val composed = AsOf.asofJoin(left, right, "k", "ts", Seq("v"))
        .select(col("lid"), col("v"))
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
      assert(composed(1) == 7.0)
    }
  }
}
