package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Queries, QueriesB, QueriesC, QueriesD, QueriesE, QueriesF, QueriesG, QueriesH, QueriesI, QueriesJ, QueriesK, QueriesL, QueriesM, QueriesN, QueriesO, QueriesP, QueriesQ, QueriesR, QueriesS, QueriesT, QueriesU, QueriesV, QueriesW, QueriesX, QueriesY, QueriesZ, QueriesAA, QueriesAB, QueriesAC, QueriesAD, QueriesAE, QueriesAF, QueriesAG, QueriesAH, QueriesAI, QueriesAJ, QueriesAK, QueriesAL, QueriesAM, QueriesAN, QueriesAO, QueriesAP, QueriesAQ, QueriesAR, QueriesAS, QueriesAT, QueriesAU, QueriesAV, QueriesAW, QueriesAX, QueriesAY, QueriesAZ}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY §7.2 slice) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1PricingSummary.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Queries.all ++ QueriesB.all ++ QueriesC.all ++ QueriesD.all ++ QueriesE.all ++ QueriesF.all ++ QueriesG.all ++ QueriesH.all ++ QueriesI.all ++ QueriesJ.all ++ QueriesK.all ++ QueriesL.all ++ QueriesM.all ++ QueriesN.all ++ QueriesO.all ++ QueriesP.all ++ QueriesQ.all ++ QueriesR.all ++ QueriesS.all ++ QueriesT.all ++ QueriesU.all ++ QueriesV.all ++ QueriesW.all ++ QueriesX.all ++ QueriesY.all ++ QueriesZ.all ++ QueriesAA.all ++ QueriesAB.all ++ QueriesAC.all ++ QueriesAD.all ++ QueriesAE.all ++ QueriesAF.all ++ QueriesAG.all ++ QueriesAH.all ++ QueriesAI.all ++ QueriesAJ.all ++ QueriesAK.all ++ QueriesAL.all ++ QueriesAM.all ++ QueriesAN.all ++ QueriesAO.all ++ QueriesAP.all ++ QueriesAQ.all ++ QueriesAR.all ++ QueriesAS.all ++ QueriesAT.all ++ QueriesAU.all ++ QueriesAV.all ++ QueriesAW.all ++ QueriesAX.all ++ QueriesAY.all ++ QueriesAZ.all).map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    (Queries.all ++ QueriesB.all ++ QueriesC.all ++ QueriesD.all ++ QueriesE.all ++ QueriesF.all ++ QueriesG.all ++ QueriesH.all ++ QueriesI.all ++ QueriesJ.all ++ QueriesK.all ++ QueriesL.all ++ QueriesM.all ++ QueriesN.all ++ QueriesO.all ++ QueriesP.all ++ QueriesQ.all ++ QueriesR.all ++ QueriesS.all ++ QueriesT.all ++ QueriesU.all ++ QueriesV.all ++ QueriesW.all ++ QueriesX.all ++ QueriesY.all ++ QueriesZ.all ++ QueriesAA.all ++ QueriesAB.all ++ QueriesAC.all ++ QueriesAD.all ++ QueriesAE.all ++ QueriesAF.all ++ QueriesAG.all ++ QueriesAH.all ++ QueriesAI.all ++ QueriesAJ.all ++ QueriesAK.all ++ QueriesAL.all ++ QueriesAM.all ++ QueriesAN.all ++ QueriesAO.all ++ QueriesAP.all ++ QueriesAQ.all ++ QueriesAR.all ++ QueriesAS.all ++ QueriesAT.all ++ QueriesAU.all ++ QueriesAV.all ++ QueriesAW.all ++ QueriesAX.all ++ QueriesAY.all ++ QueriesAZ.all).flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
