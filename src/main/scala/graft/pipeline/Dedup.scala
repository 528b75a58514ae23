package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale document corpora.
  *
  * Scale notes: everything here is a hash-partitioned groupBy/join on a
  * derived key — no operator compares all pairs. Exact dedup shuffles on
  * the content hash (uniform by construction); MinHash/SimHash bucket
  * first so candidate verification only runs within buckets.
  */
object Dedup {

  /** Exact duplicate groups by md5(text): groups with >1 member, with the
    * lowest doc_id as the designated keeper. NULL-text rows (failed
    * extraction, metadata-only) are never a duplicate group: md5(NULL)
    * is NULL and grouping would lump every such row together. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .filter(col("n_docs") > 1)

  /** Exact dedup: keep the lowest doc_id per content hash. Implemented
    * with row_number over the hash partition (not a self-join), so it is
    * a single shuffle on the hash key. NULL-text rows all survive —
    * without the split, the null-hash partition would silently keep
    * only one of them. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val withText = docs.filter(col("text").isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
    withText.unionByName(docs.filter(col("text").isNull))
  }
}
