package graft.typed

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

import graft.Core

/** Typed Dataset API surface — case-class rows with compile-time field
  * checks for the pipelines where schema is static (the engine's DataFrame
  * operators stay schema-dynamic; this is the `Dataset[T]` face over the
  * same tables).
  */
final case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                          l_linenumber: Int, l_quantity: Double,
                          l_extendedprice: Double, l_discount: Double,
                          l_tax: Double, l_returnflag: String,
                          l_linestatus: String, l_shipdate: java.sql.Timestamp)

final case class PricingRow(flag: String, status: String, sumQty: Double,
                            revenue: Double, n: Long)

object TypedOps {

  def lineitems(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Core.table(spark, dir, "lineitem").as[Lineitem]
  }

  /** Typed pricing-summary aggregator: one pass, tuple buffer, no Row
    * access — the Encoder checks every field at compile time.
    */
  private object PricingAgg
      extends Aggregator[Lineitem, (Double, Double, Long), (Double, Double, Long)] {
    override def zero: (Double, Double, Long) = (0.0, 0.0, 0L)
    override def reduce(b: (Double, Double, Long), l: Lineitem): (Double, Double, Long) =
      (b._1 + l.l_quantity,
       b._2 + l.l_extendedprice * (1.0 - l.l_discount),
       b._3 + 1)
    override def merge(a: (Double, Double, Long), b: (Double, Double, Long)): (Double, Double, Long) =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    override def finish(r: (Double, Double, Long)): (Double, Double, Long) = r
    override def bufferEncoder: Encoder[(Double, Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[(Double, Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaLong)
  }

  /** The flagship q1 shape through the typed API. */
  def pricingSummary(ds: Dataset[Lineitem]): Dataset[PricingRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(l => (l.l_returnflag, l.l_linestatus))
      .agg(PricingAgg.toColumn)
      .map { case ((flag, status), (sumQty, revenue, n)) =>
        PricingRow(flag, status, sumQty, revenue, n)
      }
  }
}
