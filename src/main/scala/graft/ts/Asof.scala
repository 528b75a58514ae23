package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the most recent right row with
  * `right.ts ≤ left.ts` in the same key group (the quote-to-trade /
  * feature-to-label alignment join). Spark has no native as-of join;
  * the naive range-join formulation explodes to |L|·|R| per key before
  * filtering. This implementation is the scalable union form:
  *
  *   1. tag left (1) and right (0) rows and union them;
  *   2. one window per key, ordered by (ts, side) — right rows sort
  *      before left rows at equal ts, giving INCLUSIVE at-or-before;
  *   3. forward-fill the right payload with `last(_, ignoreNulls)`
  *      over an unbounded-preceding row frame;
  *   4. keep the left rows.
  *
  * Cost: ONE shuffle on the key columns and a per-key sort — the same
  * price as any keyed window, independent of how many right rows
  * precede each left row. No broadcast, no range explosion, no skew
  * beyond the key distribution itself.
  *
  * Preconditions: right rows are unique per (key, ts) — pre-aggregate
  * duplicates upstream, or the fill picks an arbitrary one; genuinely
  * NULL right values read as "no observation yet" (the fill skips
  * them, `last(ignoreNulls)`).
  *
  * DuckDB states the same operator natively (`ASOF LEFT JOIN … ON
  * l.k = r.k AND l.ts >= r.ts`), which is exactly how the oracle
  * checks it. */
object Asof {

  /** @param left      left frame; all its columns survive
    * @param right     right frame; must contain `keys`, `ts`, `rightVals`
    * @param keys      equi-join key columns (both sides)
    * @param ts        ordering column name (both sides, any orderable type)
    * @param rightVals right payload columns, emitted as `asof_<name>`;
    *        an `asof_ts` column with the matched right timestamp is
    *        ALWAYS emitted too (rename it upstream before chaining a
    *        second as-of join over the output)
    * @param tolerance optional max staleness: matches older than this
    *        are nulled out. Units: MICROSECONDS when `ts` is a
    *        timestamp column, else the integer value of the ts column
    *        itself (numeric ts compares as `cast(ts as long)`). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
      rightVals: Seq[String], tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
    val r = right.select((keys :+ ts).map(col) ++
      rightVals.map(c => col(c).as(s"__r_$c")) :+ col(ts).as("__r_ts"): _*)
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = (rightVals.map(c => s"__r_$c") :+ "__r_ts")
      .foldLeft(u)((df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
    // type-aware tick extraction: cast("long") on a TimestampType
    // column yields epoch SECONDS in Spark — use unix_micros there so
    // the tolerance really is microseconds
    def ticks(c: Column): Column = left.schema(ts).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }
    val stale: Column = tolerance match {
      case Some(tol) => ticks(col(ts)) - ticks(col("__r_ts")) > tol
      case None => lit(false)
    }
    filled.select(leftCols.map(col) ++
      rightVals.map(c =>
        when(stale, lit(null)).otherwise(col(s"__r_$c")).as(s"asof_$c")) :+
      when(stale, lit(null)).otherwise(col("__r_ts")).as("asof_ts"): _*)
  }
}
