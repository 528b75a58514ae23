package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Shared release helper for `localCheckpoint`-backed frames — the
  * deterministic twin of the GC-based reclaim the eager-checkpoint
  * paths rely on. Frees the blocks behind the frame's `LogicalRDD`
  * through [[org.apache.spark.sql.GraftBridge.unpersistRddQuietly]]
  * (the public `RDD.unpersist` would WARN about the truncated lineage
  * on every release — known-safe noise under the iterative operators'
  * release-after-last-consuming-action contract, spec-pinned in
  * PropertySpec's quiet-release case). After `free` the frame is dead:
  * the checkpoint blocks were its only copy. */
private[graft] object Ckpt {
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        org.apache.spark.sql.GraftBridge.unpersistRddQuietly(
          df.sparkSession.sparkContext, lr.rdd.id)
      case _ => df.unpersist(); ()
    }

  /** `persist()` unless an equivalent plan is already in the cache —
    * CacheManager reuses the existing entry either way, but the
    * unguarded call logs `Asked to cache already cached data` per hit,
    * and two operators sharing a fixture plan in one session (e.g.
    * dd_minhash_pairs then dd_dedup_keep, both persisting the same
    * collapseExact membership frame) flood the bench/verify tail with
    * it. `storageLevel` is a CacheManager lookup by plan equivalence,
    * so the guard sees the earlier operator's entry. */
  def persistOnce(df: DataFrame): DataFrame = {
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist()
    df
  }
}
