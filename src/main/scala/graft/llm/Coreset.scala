package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.ArrayDot.arrayDot

/** Diversity-driven data selection: greedy k-center (farthest-point
  * traversal) over an embedding column — the coreset primitive behind
  * "pick a maximally diverse subset of the corpus" curation passes.
  * Classic 2-approximation to the k-center objective (Gonzalez 1985).
  */
object Coreset {

  /** Greedy k-center selection: the seed is the vector with the largest
    * squared norm (ties → smallest id — a deterministic, data-dependent
    * start that needs no RNG); each subsequent round adds the candidate
    * maximizing its minimum squared-L2 distance to everything already
    * chosen (ties → smallest id). Returns (sel_order, id, dist) where
    * dist is the candidate's min-distance at selection time (null for
    * the seed).
    *
    * Scale shape: k−1 rounds, each ONE broadcast-join pass over the
    * corpus (the chosen set is ≤ k rows) feeding a per-candidate min and
    * a TakeOrdered(1) — never a candidate×candidate pair join. The
    * chosen relation is localCheckpointed per round (iterative
    * lineage-cutting; it is consumed by both the next round's join and
    * the final union). Squared L2 is composed as ‖a‖² + ‖b‖² − 2·a·b
    * from the exact left-associated [[graft.plans.ArrayDot]] folds, so
    * the distances (and hence the selection) are bit-identical across
    * engines and partitionings.
    */
  def kCenterSelect(df: DataFrame, idCol: String, vecCol: String,
                    dim: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= 1024, s"kCenterSelect needs 1 <= k <= 1024; got $k")
    graft.Core.requireIntegral(df, idCol, "kCenterSelect")
    // lazy, EVICTABLE persist — the corpus projection is re-read by every
    // round's job, but pinning a corpus-sized localCheckpoint would trade
    // a cheap columnar re-scan for executor storage at 100 TB; persist
    // gives the reuse when memory allows and degrades to the re-scan when
    // it doesn't (released before return — the chosen set is materialized)
    val base = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .persist()
    val seed = base
      .withColumn("n2", arrayDot(col("v"), col("v")))
      .orderBy(col("n2").desc, col("id"))
      .limit(1)
      .select(lit(1).as("sel_order"), col("id"), col("v"),
        lit(null).cast("double").as("dist"))
    val chosen = (2 to k).foldLeft(seed.localCheckpoint()) { (ch, r) =>
      val next = base
        .join(broadcast(ch.select(col("id").as("cid"), col("v").as("cv"))),
          col("id") =!= col("cid"))
        .withColumn("d2",
          arrayDot(col("v"), col("v")) + arrayDot(col("cv"), col("cv")) -
            lit(2.0) * arrayDot(col("v"), col("cv")))
        .groupBy(col("id"), col("v"))
        .agg(min(col("d2")).as("dist"), count(lit(1)).as("__nc"))
        // candidates already chosen pair with k−1 others, not k; their
        // min-distance is 0 anyway, but exclude them structurally so a
        // duplicate vector in the corpus cannot re-select a chosen id
        .filter(col("__nc") === r - 1)
        .orderBy(col("dist").desc, col("id"))
        .limit(1)
        .select(lit(r).as("sel_order"), col("id"), col("v"), col("dist"))
      ch.unionByName(next).localCheckpoint()
    }
    base.unpersist()
    chosen.select(col("sel_order"), col("id"), round(col("dist"), 6).as("dist"))
  }
}
