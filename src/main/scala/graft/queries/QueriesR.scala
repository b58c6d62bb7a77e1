package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Core, Database}

/** Batch 18 (round 8): sink-roundtrip gating — the S3 query sink and S1
  * suffix-dispatch reader composed under the exact DuckDB hash gate, per
  * the round-7 verdict (every prior spec-only→oracle conversion held).
  */
object QueriesR {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** S3 + S1 + S2/P1 end to end: register the events table through the
    * user-facing [[Database]] API, run the aggregate through its SQL
    * gateway, sink to csv.gz (header + gzip — the delicate text path:
    * type-erasing, null-erasing, shortest-roundtrip double formatting),
    * read it back via the suffix dispatcher, re-assert the csv-erased
    * types, sink THAT to the gzip-parquet path and read it back again.
    * The oracle computes the same aggregate from the source table, so any
    * corruption in either sink or reader (schema, header, compression,
    * double formatting, null encoding) breaks the hash.
    *
    * Double round-trip is exact because the sink writes
    * `Double.toString`'s shortest-roundtrip form and the reader parses it
    * back to the identical bits (Java guarantees toString→parseDouble
    * identity); counts are re-cast to long because csv inference narrows
    * in-range integers to int.
    */
  val s3SinkRoundtrip: QueryDef = QueryDef(
    "s3_sink_roundtrip",
    (s, dir) => {
      val db = new Database(s)
      db.addTable("ev_sink_rt", s"$dir/events.parquet")
      val base = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_sink_roundtrip")
      val csvPath = new java.io.File(base, "agg.csv.gz").getAbsolutePath
      val pqPath = new java.io.File(base, "agg.parquet").getAbsolutePath
      db.queryTo(
        """SELECT event_type, COUNT(*) AS n_events,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(27,10))), 6) AS DOUBLE)
               AS sum_v
           FROM ev_sink_rt GROUP BY event_type""",
        csvPath)
      val fromCsv = Core.readAny(s, csvPath)
        .select(col("event_type"), col("n_events").cast("long"),
          col("sum_v").cast("double"))
      Core.writeResult(fromCsv, pqPath)
      Core.readAny(s, pqPath).orderBy(col("event_type"))
    },
    Some(s"""SELECT event_type, COUNT(*) AS n_events,
        ${Ora.dsum6Sql("value")} AS sum_v
      FROM events GROUP BY event_type ORDER BY event_type"""))

  val all: Seq[QueryDef] = Seq(s3SinkRoundtrip)
}
