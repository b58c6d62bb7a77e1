package graft

import org.apache.spark.sql.functions._

/** Pins the between-queries checkpoint release (round 14, VERDICT item 3):
  * query-private localCheckpoint blocks are dropped, memo-protected blocks
  * survive AND stay readable — a released localCheckpoint would be
  * unrecomputable, so protection is correctness, not just performance.
  */
class ReleaseBlocksSpec extends SparkSpec {

  test("releaseTransientBlocks drops unprotected checkpoints, keeps protected readable") {
    val sc = spark.sparkContext
    // query-private checkpoint: must be released
    val transientDf = df("v INT", (1 to 100).map(R(_))).localCheckpoint()
    // memo-like checkpoint: protected, must survive and stay readable
    val memoDf = Core.protectRdds(
      df("v INT", (1 to 50).map(R(_))).localCheckpoint())
    assert(transientDf.count() == 100)
    assert(memoDf.count() == 50)

    val persistedBefore = sc.getPersistentRDDs.keySet
    Core.releaseTransientBlocks(spark)
    // unpersist(blocking = false) is async on the block side but removes
    // the RDD from persistentRdds synchronously
    val persistedAfter = sc.getPersistentRDDs.keySet
    assert(persistedAfter.size < persistedBefore.size,
      s"release removed nothing: before=$persistedBefore after=$persistedAfter")

    // the protected memo's backing blocks are still scannable end-to-end
    assert(memoDf.agg(sum(col("v"))).collect().head.getLong(0) == 1275L)
    // and a fresh plan over the memo (the consumer pattern) also works
    assert(memoDf.filter(col("v") <= 10).count() == 10)
  }

  test("release between builds leaves a later query's fresh checkpoint usable") {
    // the Bench pattern: query N checkpoints, release, query N+1 checkpoints
    val a = df("v INT", (1 to 10).map(R(_))).localCheckpoint()
    assert(a.count() == 10)
    Core.releaseTransientBlocks(spark)
    val b = df("v INT", (1 to 20).map(R(_))).localCheckpoint()
    assert(b.count() == 20)
    Core.releaseTransientBlocks(spark)
  }
}
