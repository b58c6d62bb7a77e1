package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Core
import graft.ml.RF

/** Batch 4: mode aggregation (F20) and the MLlib RandomForest+BC pipeline
  * (M1/M4) as a declared query.
  */
object QueriesD {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** F20: MODE with a deterministic tie-break (count desc, value asc) —
    * the reference guards all-NaN groups (constants.py:298-302); built-in
    * `mode()` is tie-nondeterministic, so the rank construction is used.
    */
  val f20Mode: QueryDef = QueryDef(
    "f20_mode",
    (s, dir) => {
      val counts = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("n").desc, col("user_id"))
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_type"), col("user_id").as("modal_user"), col("n"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, user_id AS modal_user, n FROM (
        SELECT event_type, user_id, COUNT(*) AS n,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY COUNT(*) DESC, user_id) AS rn
        FROM events GROUP BY event_type, user_id)
      WHERE rn = 1 ORDER BY event_type"""))

  /** M1/M4: MLlib RandomForest + cdf bias correction, trained and applied on
    * the fact table. Model output depends on MLlib's internal sampling, so
    * the driver records a rows-only check (no SQL oracle) — behavioral
    * assertions live in the spec suite.
    */
  val m1Rf: QueryDef = QueryDef(
    "m1_rf_train_predict",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_quantity").as("f1"),
                col("l_discount").as("f2"), col("l_tax").as("f3"),
                (col("l_extendedprice") / 1000.0).as("label"))
      // deterministic 10% training sample; prediction runs on the full table
      val train = li.filter(pmod(col("l_orderkey"), lit(10)) === 0)
      val model = RF.fit(train, Seq("f1", "f2", "f3"), "label",
        numTrees = 5, maxDepth = 8)
      RF.predict(model, li)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             round(avg(col("prediction_bc")), 2).as("mean_pred"),
             count(when(col("prediction_bc") < 0, lit(1))).as("n_negative"))
        .orderBy(col("l_returnflag"))
    },
    None)

  val all: Seq[QueryDef] = Seq(f20Mode, m1Rf)
}
