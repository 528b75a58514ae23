package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions,
  * the sanctioned extension-point shim for libraries that ship native
  * Catalyst expressions (Spark 4 moved `Column` onto ColumnNode and
  * made the direct constructors package-private). This is the ONLY
  * file outside the `graft` package; everything it exposes is two
  * one-line delegations. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the storage behind a materialized RDD WITHOUT tripping
    * `RDD.unpersist`'s locally-checkpointed lineage-truncation WARN.
    * `SparkContext.unpersistRDD` is the exact body of `RDD.unpersist`
    * minus that warning and the (moot — the frame is dead to callers)
    * storageLevel reset: blocks drop, `persistentRdds` updates, the
    * unpersist listener event posts. For the deliberate
    * release-after-last-action pattern on lazy `localCheckpoint`
    * frames, where the warning is known-safe noise that would flood a
    * production log on every iterative-operator release. */
  def unpersistRddQuietly(sc: org.apache.spark.SparkContext,
      rddId: Int): Unit =
    sc.unpersistRDD(rddId, blocking = false)
}
