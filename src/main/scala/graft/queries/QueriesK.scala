package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.llm.Curation

/** Batch 11: corpus-curation scale ops — per-domain capping through the
  * bounded TopK aggregator (no hot-domain sort), and friends.
  */
object QueriesK {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Per-source document cap (Gopher-style domain balancing): keep the 10
    * longest documents per source, rank NULL past the cap. The ranking
    * runs through the bounded TopK aggregator — |domains|·cap exchange
    * rows, never a hot-domain window sort.
    */
  val curationDomainCap: QueryDef = QueryDef(
    "curation_domain_cap",
    (s, dir) => Curation.domainCap(t(s, dir, "documents"),
        "doc_id", "source", "n_chars", cap = 10)
      .orderBy(col("doc_id")),
    Some("""WITH r AS (SELECT doc_id, source,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents)
      SELECT doc_id, source, CAST(CASE WHEN rk <= 10 THEN rk END AS INT) AS rank,
        rk <= 10 AS keep
      FROM r ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(curationDomainCap)
}
