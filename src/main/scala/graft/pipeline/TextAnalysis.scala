package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators: token counting, quality scoring, language ID,
  * fingerprinting. All pure column expressions (codegen'd, no UDFs). */
object TextAnalysis {

  /** Whitespace token count and density features. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = size(split(trim(col("text")), "\\s+"))
    docs.select(
      col("doc_id"),
      toks.cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_actual"),
      round(toks.cast("double") / greatest(length(col("text")), lit(1)), 6)
        .as("tokens_per_char"))
  }
}
