package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.streaming.RT

/** Streaming materialized-aggregate maintenance ([[RT.aggMaintainBatch]]):
  * change micro-batches fold into a persisted per-key state; the final
  * state must equal direct recomputation of the surviving multiset, a
  * replayed batchId must be a no-op (retractions never applied twice —
  * foreachBatch is at-least-once), and superseded snapshot versions are
  * pruned after the marker flip.
  */
class IvmStreamSpec extends SparkSpec {

  test("aggMaintainBatch: batches fold to the recomputed state; replay is a no-op") {
    val statePath = Files.createTempDirectory("graft_ivm_state").toString
    val apply = RT.aggMaintainBatch(statePath, Seq("k"), "v", "op")

    // batch 0: inserts only (cold start — empty prior state)
    apply(df("k STRING, v DOUBLE, op INT", Seq(
      R("a", 1.0, 1), R("a", 5.0, 1), R("b", 2.0, 1))), 0L)
    // batch 1: more inserts
    val b1 = df("k STRING, v DOUBLE, op INT", Seq(
      R("a", 3.0, 1), R("b", 7.0, 1), R("c", 4.0, 1)))
    apply(b1, 1L)
    // replay of batch 1 (at-least-once delivery) must not double-apply
    apply(b1, 1L)
    // batch 2: retract a's strictly-interior row (no staleness) and b's
    // current max (stale — the stored extreme may be gone)
    apply(df("k STRING, v DOUBLE, op INT", Seq(
      R("a", 3.0, -1), R("b", 7.0, -1))), 2L)

    val state = RT.readAggState(spark, statePath)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue(), Option(r.get(3)),
         Option(r.get(4)), r.getBoolean(5))).toMap
    // survivors: a = {1,5}, b = {2}, c = {4}
    assert(state("a") == ((2L, 6.0, Some(1.0), Some(5.0), false)))
    assert(state("b")._1 == 1L && state("b")._2 == 2.0 && state("b")._5) // stale
    assert(state("c") == ((1L, 4.0, Some(4.0), Some(4.0), false)))

    // offline extremes repair against the current base restores b
    val base = df("k STRING, v DOUBLE", Seq(
      R("a", 1.0), R("a", 5.0), R("b", 2.0), R("c", 4.0)))
    val repaired = Relational.rescanExtremes(
        RT.readAggState(spark, statePath), base, Seq("k"), "v")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(3)), Option(r.get(4)), r.getBoolean(5))).toMap
    assert(repaired("b") == ((Some(2.0), Some(2.0), false)))

    // only the active snapshot version survives pruning
    val dirs = new java.io.File(statePath).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("v2"), dirs.mkString(", "))
  }

  test("aggMaintainBatch: a group retracted to zero rows disappears from the state") {
    val statePath = Files.createTempDirectory("graft_ivm_state2").toString
    val apply = RT.aggMaintainBatch(statePath, Seq("k"), "v", "op")
    apply(df("k STRING, v DOUBLE, op INT", Seq(R("x", 1.0, 1), R("y", 2.0, 1))), 0L)
    apply(df("k STRING, v DOUBLE, op INT", Seq(R("x", 1.0, -1))), 1L)
    val keys = RT.readAggState(spark, statePath)
      .collect().map(_.getString(0)).toSet
    assert(keys == Set("y"))
  }
}
