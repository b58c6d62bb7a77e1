package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional locality — the OPTIMIZE ZORDER
  * technique of lakehouse table formats as first-class expressions: files
  * range-partitioned and sorted by an interleaved-bit key keep rows close
  * in EVERY keyed dimension, so min/max row-group statistics prune scans
  * on any of the interleaved columns, not just the leading sort column.
  */
object Layout {

  /** Z-order (Morton) key: interleave the low `bits` bits of each column —
    * bit b of column i lands at position b·n+i. Pure integer bit ops in
    * one codegen'd projection; columns must already be bucketed to
    * non-negative values below 2^bits (the caller picks the bucketing —
    * modulo, quantile bucket, epoch-day…).
    */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n > 0 && bits > 0 && n * bits <= 63,
      s"zorderKey needs 0 < cols*bits <= 63; got $n cols x $bits bits")
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduceLeft(_ bitwiseOR _)
  }

  /** Range-partition and sort a frame by its z-order key — the write-side
    * layout pass. The range exchange samples key quantiles so output files
    * carry contiguous z-ranges (= small per-file bounding boxes in every
    * interleaved dimension); downstream scans filtered on ANY of the
    * keyed columns prune files by min/max stats. The key column is kept
    * (`keyCol`) so readers and tests can see the layout.
    */
  def repartitionZOrdered(df: DataFrame, cols: Seq[Column], bits: Int,
                          partitions: Int,
                          keyCol: String = "zkey"): DataFrame =
    df.withColumn(keyCol, zorderKey(cols, bits))
      .repartitionByRange(partitions, col(keyCol))
      .sortWithinPartitions(col(keyCol))
}
