package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is Zipfian — the
  * 100 TB failure mode where one hot key (a boilerplate shingle, a
  * default ident, a null-ish bucket) lands an entire join on one task.
  *
  * [[saltedJoin]] implements the classic salt/explode scheme: the skewed
  * (large) side gets a random-but-deterministic salt in [0, n); the
  * small side is replicated n times with every salt value; the join key
  * becomes (key, salt), spreading each hot key over n tasks. Results are
  * row-identical to the plain join — only the partitioning changes.
  * AQE's skew-join splitting handles moderate skew on its own
  * (`spark.sql.adaptive.skewJoin`); explicit salting is for the extreme
  * tail where a single key exceeds what one split can hold, or when a
  * deterministic layout is required.
  */
object Skew {

  /** Inner-join `big` with `small` on `key`, salting `big` into
    * `nSalts` partitions per key. Salt is a hash of the big side's full
    * row content (deterministic, no RNG — replayable plans). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      nSalts: Int): DataFrame = {
    require(nSalts > 0)
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(nSalts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-n key histogram — the diagnostic that decides whether to salt:
    * returns (key, count) for the heaviest keys. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key)).limit(topN)
}
