package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents` / `embeddings`:
  * dedup, similarity search, text analysis, multimodal plumbing.
  * Filled out incrementally; see graft.pipeline.* for the operator
  * implementations.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // exact duplicate groups by content hash
    ("dd_exact_groups",
      ((s: SparkSession, d: String) =>
        pipeline.Dedup.exactGroups(Tables.documents(s, d))
          .orderBy("content_hash")): Q,
      Some("""SELECT md5(text) AS content_hash,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(min(doc_id) AS BIGINT) AS keeper
             |FROM documents GROUP BY 1 HAVING count(*) > 1
             |ORDER BY content_hash""".stripMargin)),

    // exact dedup: keep lowest doc_id per hash
    ("dd_exact_dedup",
      ((s, d) =>
        pipeline.Dedup.exactDedup(Tables.documents(s, d))
          .select("doc_id").orderBy("doc_id")): Q,
      Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id FROM (
             |  SELECT doc_id, row_number() OVER (
             |    PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |  FROM documents) WHERE rn = 1
             |ORDER BY doc_id""".stripMargin)),

    // whitespace token count + char classes (text quality features)
    ("tx_token_count",
      ((s, d) =>
        pipeline.TextAnalysis.tokenStats(Tables.documents(s, d))
          .orderBy("doc_id")): Q,
      Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             |  CAST(len(text) AS BIGINT) AS n_chars_actual,
             |  round(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
             |        / greatest(len(text), 1), 6) AS tokens_per_char
             |FROM documents ORDER BY doc_id""".stripMargin))
  )

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
