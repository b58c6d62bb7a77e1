package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: one-line physical-plan census per query — exchange count,
  * join strategies, cartesian detection, codegen spans — for the plan
  * documentation (PLANS_r*.md). Run:
  * `sbt "runMain graft.PlanAudit <sfDir> <name1,name2,...>"` (no names =
  * every declared query).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def count(hay: String, needle: String): Int =
      needle.r.findAllMatchIn(hay).length
    println("query|exchanges|bhj|smj|cartesian|codegen_spans")
    names.foreach { n =>
      try {
        val p = SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.executedPlan.toString
        // shuffle exchanges only: a bare "Exchange " also matches inside
        // BroadcastExchange/ReusedExchange nodes and overcounts. The
        // alternation lists the EXACT partitioning toStrings Spark 4.1
        // prints after "Exchange ": lowercase expression-style
        // hashpartitioning/rangepartitioning, and case-class-style
        // SinglePartition/RoundRobinPartitioning (the latter covers
        // repartition(n) and REBALANCE_* origins, which print a
        // RoundRobinPartitioning or hashpartitioning node plus an origin
        // suffix — so rebalance needs no token of its own)
        val ex = count(p,
          "Exchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)")
        val bhj = count(p, "BroadcastHashJoin")
        val smj = count(p, "SortMergeJoin")
        val cart = count(p, "CartesianProduct") +
          count(p, "BroadcastNestedLoopJoin")
        // executedPlan.toString marks codegen stages as "*(n)" prefixes
        val wsc = count(p, "\\*\\(")
        println(s"$n|$ex|$bhj|$smj|$cart|$wsc")
      } catch {
        case e: Throwable => println(s"$n|ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
