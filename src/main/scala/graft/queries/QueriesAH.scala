package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 34 (round 8): tokenizer evaluation, embedding-distribution
  * drift, and the one-row corpus dataset card.
  */
object QueriesAH {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Tokenizer fertility: pieces per word and characters per piece for
    * the fixed-merge BPE encoder, per document — the metric that decides
    * whether a tokenizer suits a corpus.
    */
  val tokenizerFertility: QueryDef = {
    val merges = Seq(("e", "r"), ("t", "h"), ("th", "e"))
    val replayed = merges.foldLeft("sym0") { case (s, (l, r)) =>
      s"trim(replace(replace(' ' || replace($s, ' ', '  ') || ' ', " +
        s"' $l  $r ', ' $l$r '), '  ', ' '))"
    }
    QueryDef(
      "tokenizer_fertility",
      (s, dir) => graft.llm.Bpe.encode(
          t(s, dir, "documents").filter(col("doc_id") < 100),
          "doc_id", "text", merges)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(length(col("w"))).as("n_chars"))
        .select(col("doc_id"), col("n_words"), col("n_pieces"),
          round(col("n_pieces").cast("double") /
            col("n_words").cast("double"), 6).as("fertility"),
          round(col("n_chars").cast("double") /
            col("n_pieces").cast("double"), 6).as("chars_per_piece"))
        .orderBy(col("doc_id")),
      Some(s"""WITH tok AS (
          SELECT doc_id, unnest([{'tok_idx': CAST(j - 1 AS INT), 'w': t[j]}
                                 for j in generate_series(1, len(t))],
                                recursive := true)
          FROM (SELECT doc_id, ${Ora.toksSql} AS t FROM documents
                WHERE doc_id < 100)),
        sym AS (SELECT doc_id, tok_idx, w,
            array_to_string([w[j] for j in generate_series(1, len(w))], ' ')
              || ' </w>' AS sym0
          FROM tok),
        enc AS (SELECT doc_id, w,
            string_split(trim($replayed), ' ') AS pieces
          FROM sym),
        agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
            CAST(SUM(len(pieces)) AS BIGINT) AS n_pieces,
            CAST(SUM(len(w)) AS BIGINT) AS n_chars
          FROM enc GROUP BY 1)
      SELECT doc_id, n_words, n_pieces,
        ROUND(CAST(n_pieces AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
          AS fertility,
        ROUND(CAST(n_chars AS DOUBLE) / CAST(n_pieces AS DOUBLE), 6)
          AS chars_per_piece
      FROM agg ORDER BY doc_id"""))
  }

  /** Embedding-distribution drift between the even/odd vec_id halves:
    * per-dimension decimal-exact centroids, then centroid cosine and L2
    * distance — the shift monitor a production embedding pipeline runs
    * between corpus snapshots.
    */
  val embDrift: QueryDef = {
    val dim = 64
    QueryDef(
      "emb_drift",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select((col("vec_id") % 2 === 0).as("half_a"),
            posexplode(col("embedding")).as(Seq("d", "v")))
          .select(col("half_a"), col("d"), col("v").cast("double").as("v"))
        val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(27,10)")
        val perDim = e.groupBy(col("d"))
          .agg(sum(when(col("half_a"), dec(col("v")))).cast("double").as("sa"),
            sum(when(!col("half_a"), dec(col("v")))).cast("double").as("sb"),
            sum(when(col("half_a"), 1L).otherwise(0L)).as("na"),
            sum(when(!col("half_a"), 1L).otherwise(0L)).as("nb"))
          .select(col("d"), (col("sa") / col("na").cast("double")).as("ca"),
            (col("sb") / col("nb").cast("double")).as("cb"),
            col("na"), col("nb"))
        perDim.agg(
          first(col("na")).as("n_dims_a"),
          sum(dec(col("ca") * col("cb"))).cast("double").as("dot"),
          sum(dec(col("ca") * col("ca"))).cast("double").as("n2a"),
          sum(dec(col("cb") * col("cb"))).cast("double").as("n2b"),
          sum(dec((col("ca") - col("cb")) * (col("ca") - col("cb"))))
            .cast("double").as("l2s"))
          .select(col("n_dims_a").as("n_vecs_a"),
            round(col("dot") / sqrt(col("n2a") * col("n2b")), 6)
              .as("centroid_cosine"),
            round(sqrt(col("l2s")), 6).as("centroid_l2"))
      },
      Some(s"""WITH e AS (SELECT (vec_id % 2 = 0) AS half_a,
          unnest([{'d': i, 'v': CAST(embedding[i] AS DOUBLE)}
                  for i in generate_series(1, len(embedding))],
                 recursive := true)
          FROM embeddings),
        pd AS (SELECT d,
          CAST(SUM(CASE WHEN half_a THEN CAST(v AS DECIMAL(27,10)) END)
            AS DOUBLE) AS sa,
          CAST(SUM(CASE WHEN NOT half_a THEN CAST(v AS DECIMAL(27,10)) END)
            AS DOUBLE) AS sb,
          CAST(SUM(CASE WHEN half_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
          CAST(SUM(CASE WHEN NOT half_a THEN 1 ELSE 0 END) AS BIGINT) AS nb
          FROM e GROUP BY 1),
        c AS (SELECT d, sa / CAST(na AS DOUBLE) AS ca,
          sb / CAST(nb AS DOUBLE) AS cb, na, nb FROM pd),
        f AS (SELECT ANY_VALUE(na) AS n_vecs_a,
          CAST(SUM(CAST((ca * cb) AS DECIMAL(27,10))) AS DOUBLE) AS dot,
          CAST(SUM(CAST((ca * ca) AS DECIMAL(27,10))) AS DOUBLE) AS n2a,
          CAST(SUM(CAST((cb * cb) AS DECIMAL(27,10))) AS DOUBLE) AS n2b,
          CAST(SUM(CAST(((ca - cb) * (ca - cb)) AS DECIMAL(27,10)))
            AS DOUBLE) AS l2s
          FROM c)
      SELECT n_vecs_a, ROUND(dot / SQRT(n2a * n2b), 6) AS centroid_cosine,
        ROUND(SQRT(l2s), 6) AS centroid_l2
      FROM f"""))
  }

  /** One-row corpus dataset card: the headline numbers a dataset README
    * carries, each a single-pass aggregate combined by broadcast.
    */
  val datasetCard: QueryDef = QueryDef(
    "corpus_dataset_card",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val basic = docs.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        Ora.r6(Ora.dmean(col("n_chars").cast("double"))).as("mean_chars"))
      val toks = docs.select(explode(graft.llm.TextAnalysis.tokens(col("text")))
          .as("tok"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("vocab"))
      val dup = docs.groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("c"))
        .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_docs"))
      basic.crossJoin(broadcast(toks)).crossJoin(broadcast(dup))
        .select(col("n_docs"), col("n_langs"), col("n_sources"),
          col("mean_chars"), col("n_tokens"), col("vocab"), col("dup_docs"))
    },
    Some(s"""WITH basic AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        ROUND(${Ora.dmeanSql("CAST(n_chars AS DOUBLE)")}, 6)
          AS mean_chars FROM documents),
      tk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab FROM
        (SELECT unnest(${Ora.toksSql}) AS tok
         FROM documents)),
      dp AS (SELECT CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        AS dup_docs FROM
        (SELECT md5(text) AS h, COUNT(*) AS c FROM documents GROUP BY 1))
    SELECT n_docs, n_langs, n_sources, mean_chars, n_tokens, vocab, dup_docs
    FROM basic CROSS JOIN tk CROSS JOIN dp"""))

  val all: Seq[QueryDef] = Seq(tokenizerFertility, embDrift, datasetCard)
}
