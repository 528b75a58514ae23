package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for document corpora: MinHash+LSH, SimHash,
  * and exact n-gram Jaccard via an inverted index.
  *
  * Design for 100 TB:
  *   - Nothing compares all pairs. MinHash candidates come from LSH
  *     band-bucket self-joins (shuffle keyed on band hash — uniform by
  *     construction); SimHash candidates from byte-band joins; exact
  *     Jaccard from an inverted shingle index with a document-frequency
  *     cap ([[DfCap]]) that drops degenerate hot shingles — the skew
  *     guard that keeps the bucket join from producing quadratic blowup
  *     on boilerplate n-grams.
  *   - All hashing is md5-prefix arithmetic, portable bit-for-bit to the
  *     DuckDB oracle (builders below share the constants), and all
  *     expressions are Catalyst built-ins — whole-stage codegen, no UDFs.
  */
object NearDup {

  /** 31-bit hash domain: products a·x + b stay < 2^62, so the modular
    * hash family never overflows int64 in either engine (DuckDB raises
    * on BIGINT overflow; Spark wraps silently — neither is acceptable). */
  val P: Long = 2147483647L // 2^31 − 1
  val X: Long = 2147483648L // 2^31 — shingle-hash domain (public: the
  // SQL registration binds it, like P and the hash family)

  /** Deterministic MinHash family (a_k, b_k), k = 0..15: splitmix-style
    * LCG from a fixed seed, frozen here so Spark and oracle agree. */
  val NumHashes = 16
  val BandRows = 4
  val NumBands: Int = NumHashes / BandRows
  val hashParams: Seq[(Long, Long)] = {
    var s = 42L
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % (P - 2)) + 1
    }
    Seq.fill(NumHashes)((next(), next()))
  }

  /** Shingles appearing in more than this many documents are dropped
    * from the inverted index (both engines). */
  val DfCap = 50

  /** Word n-gram size for shingling. */
  val ShingleN = 3

  // ---- Spark side ----

  /** md5-prefix 60-bit hash of a string column — computed natively
    * from the digest bytes ([[graft.functions.Md5Prefix60Expr]]);
    * value-identical to `conv(substring(md5(c), 1, 15), 16, 10)`,
    * which the DuckDB oracles still state (PropertySpec pins the
    * equivalence). */
  def h64(c: Column): Column =
    graft.functions.TextExprs.md5Prefix60(c)

  /** The hex-string formulation of [[h64]], kept for the PropertySpec
    * equivalence check. */
  def h64Hex(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Distinct (doc_id, xh) word-3-gram shingle hashes, xh < 2^31.
    * Documents shorter than n words contribute their whole text.
    * Derived by exploding the per-doc SET — already distinct, so no
    * `.distinct()` shuffle; like [[shingleSets]] this is map-side. */
  def shingles(docs: DataFrame): DataFrame =
    shingleSets(docs).select(col("doc_id"), explode(col("hs")).as("xh"))

  /** Per-document shingle-hash set, built MAP-SIDE in one fused native
    * pass ([[graft.functions.ShingleSetExpr]]): each input row IS one
    * document, so the set is a per-row array computation and the
    * MinHash/SimHash paths pay ZERO shuffles up to the band join
    * (signatures and verification are map-side over the compact per-doc
    * array). The former explode→`collect_set` formulation shuffled the
    * whole exploded occurrence stream only to reassemble rows that were
    * never apart. Element order is first occurrence; every consumer is
    * order-free (min fold, `array_intersect`, explode). Null-text docs
    * contribute no set row, as before (their exploded stream was
    * empty). */
  def shingleSets(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextExprs.shingleSet(col("text"), ShingleN, X).as("hs"))

  /** Declarative (higher-order-function) formulation of [[shingleSets]],
    * kept as the reference the native expression is property-tested
    * against (PropertySpec): three interpreted passes — n-gram
    * transform, hash transform, array_distinct. */
  def shingleSetsHof(docs: DataFrame): DataFrame = {
    val tokens = split(trim(lower(col("text"))), "\\s+")
    val idx = sequence(lit(0), greatest(size(tokens) - ShingleN, lit(0)))
    val sh = transform(idx, i => concat_ws(" ", slice(tokens, i + 1, lit(ShingleN))))
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        array_distinct(transform(sh, g => pmod(h64(g), lit(X)))).as("hs"))
  }

  /** 16-hash MinHash signature per document: one map-side-combinable
    * aggregate over the exploded shingles. */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val mins = hashParams.zipWithIndex.map { case ((a, b), k) =>
      min((col("xh") * a + b) % P).as(s"h$k")
    }
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** The same signatures computed over [[shingleSets]] — zero shuffle
    * (the set frame already paid it) — via the native one-pass
    * [[graft.functions.MinHashSigExpr]]: all 16 minima in a single
    * codegen'd loop instead of 16 interpreted `aggregate` folds. */
  def signaturesFromSets(sets: DataFrame): DataFrame = {
    val sig = graft.functions.HashExprs.minhashSig(
      col("hs"), hashParams.map(_._1), hashParams.map(_._2), P)
    val withSig = sets.select(col("doc_id"), sig.as("__sig"))
    val cols = (0 until NumHashes).map(k => col("__sig").getItem(k).as(s"h$k"))
    withSig.select(col("doc_id") +: cols: _*)
  }

  /** Higher-order-function formulation of [[signaturesFromSets]], kept
    * as the reference implementation the native expression is
    * property-tested against (PropertySpec). */
  def signaturesFromSetsHof(sets: DataFrame): DataFrame = {
    val mins = hashParams.zipWithIndex.map { case ((a, b), k) =>
      aggregate(col("hs"), lit(Long.MaxValue),
        (acc, x) => least(acc, (x * a + b) % P)).as(s"h$k")
    }
    sets.select(col("doc_id") +: mins: _*)
  }

  /** LSH band keys: [[NumBands]] rows per doc, key = the band's hash
    * concat. Equal key in any band ⇒ candidate pair. */
  def bands(sigs: DataFrame): DataFrame = {
    val keys = (0 until NumBands).map { j =>
      concat_ws(":", (0 until BandRows).map(r => col(s"h${j * BandRows + r}")): _*)
    }
    sigs.select(col("doc_id"), posexplode(array(keys: _*)).as(Seq("band", "key")))
  }

  /** Candidate pairs (doc_a < doc_b) sharing any LSH band bucket.
    *
    * Round 16: pairs come from ONE bucket aggregate (collect the
    * bucket's sorted doc list, emit its ordered 2-combinations with
    * two chained generators) instead of the band self-join — the join
    * shuffled and SORTED the band stream twice and needed a third
    * exchange for the pair distinct; the aggregate is one object-hash
    * pass with map-side partials and the pair stream is map-side.
    * Per-row memory is bounded by the bucket's doc LIST (the slice
    * generator re-slices it), never the pair count; a bucket of N docs
    * emits the same C(N,2) pairs either way, and the self-join put
    * them in one partition too (same key). Output is identical:
    * sorted list ⇒ doc_a < doc_b, same global distinct. */
  def candidates(bandsDf: DataFrame): DataFrame =
    bucketPairs(bandsDf.groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2))

  /** Ordered 2-combinations (doc_a < doc_b) of each bucket's ASCENDING
    * `ds` doc-id list, as two chained generators (row memory stays
    * list-sized, the C(n,2) stream is never materialized per row). */
  private def bucketPairs(buckets: DataFrame): DataFrame =
    buckets
      .select(col("ds"), posexplode(col("ds")).as(Seq("__i", "doc_a")))
      .select(col("doc_a"), explode(slice(col("ds"), col("__i") + lit(2),
        greatest(size(col("ds")) - col("__i") - lit(1), lit(0)))).as("doc_b"))
      .select("doc_a", "doc_b").distinct()

  /** Exact Jaccard over shingle-hash sets for a candidate-pair frame;
    * keeps pairs with jaccard ≥ `minJ`. Computed by joining each side's
    * per-doc shingle-hash SET (one map-side-combined aggregate) onto the
    * candidate pairs and intersecting arrays in place — versus exploding
    * candidates × shingles through two shuffle joins and re-aggregating
    * at pair grain, this moves set-sized payloads only for actual
    * candidates. Per-doc sets are bounded by document length, so the
    * array payload stays small at any corpus scale; the jaccard itself
    * is an exact integer ratio (no float-order hazard). */
  def verifyJaccard(cand: DataFrame, sets: DataFrame, minJ: Double): DataFrame =
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("ha")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ha"), col("hb"))).cast("double") /
          (size(col("ha")) + size(col("hb")) -
            size(array_intersect(col("ha"), col("hb")))).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= minJ)

  /** Exact-duplicate collapse ahead of any LSH stage. Byte-identical
    * texts share EVERY band, so a bucket of N identical documents
    * (ubiquitous in a real crawl) makes the band self-join quadratic —
    * the one skew case the band-hash key cannot spread. Collapsing to
    * one representative (min doc_id) per distinct text bounds every
    * bucket by the number of *distinct* texts; [[expandExactDups]]
    * restores the full pair set afterward, so the operator's output is
    * unchanged. Returns (members: (doc_id, rep), reps: (doc_id, text)).
    */
  def collapseExact(docs: DataFrame): (DataFrame, DataFrame) = {
    val fp = docs.select(col("doc_id"), col("text"), md5(col("text")).as("__fp"))
    val repByFp = fp.groupBy(col("__fp")).agg(min(col("doc_id")).as("rep"))
    val joined = fp.join(repByFp, "__fp")
    val members = Ckpt.persistOnce(joined.select(col("doc_id"), col("rep")))
    val reps = joined.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("text"))
    (members, reps)
  }

  /** Inverse of [[collapseExact]] for a representative-level pair frame
    * `(doc_a, doc_b, <valueCol>)`: cross-group pairs inherit the reps'
    * value (identical texts ⇒ identical signatures/sets), within-group
    * pairs get `selfValue` (Jaccard 1.0 / Hamming 0). Linear in the size
    * of the final answer — no quadratic intermediate. */
  private[graft] def expandExactDups(pairs: DataFrame, members: DataFrame,
      valueCol: String, selfValue: Column): DataFrame = {
    val ma = members.select(col("rep").as("doc_a"), col("doc_id").as("xa"))
    val mb = members.select(col("rep").as("doc_b"), col("doc_id").as("xb"))
    val cross = pairs.join(ma, "doc_a").join(mb, "doc_b")
      .select(least(col("xa"), col("xb")).as("doc_a"),
        greatest(col("xa"), col("xb")).as("doc_b"), col(valueCol))
    val within = members.select(col("rep"), col("doc_id").as("xa"))
      .join(members.select(col("rep"), col("doc_id").as("xb")), "rep")
      .filter(col("xa") < col("xb"))
      .select(col("xa").as("doc_a"), col("xb").as("doc_b"),
        selfValue.as(valueCol))
    cross.unionByName(within)
  }

  /** MinHash+LSH near-dup pipeline: exact-dup collapse → shingle-set →
    * sign → band → bucket-join → exact-Jaccard verify → dup
    * re-expansion. The persisted per-doc SET frame feeds both the
    * signature fold (map-only) and the verification joins, so the whole
    * pipeline pays exactly one corpus-wide shuffle (building the sets)
    * plus the candidate-sized band join.
    *
    * Cache lifetime: the shared set/membership caches live until the
    * session drops them — a long-running caller that runs MANY of these
    * in one session should use [[minhashPairsScoped]] and release after
    * consuming the pairs, or cached partitions accumulate (same
    * contract as [[minhashIncrement]]'s returned `sets`). */
  def minhashPairs(docs: DataFrame, minJ: Double): DataFrame =
    minhashPairsScoped(docs, minJ)._1

  /** [[minhashPairs]] plus a release handle that unpersists the shared
    * shingle-set and membership caches; call it after the final action
    * that consumes the returned pairs. */
  def minhashPairsScoped(docs: DataFrame, minJ: Double): (DataFrame, () => Unit) = {
    val (members, reps) = collapseExact(docs)
    val sets = Ckpt.persistOnce(shingleSets(reps))
    val repPairs = verifyJaccard(candidates(bands(signaturesFromSets(sets))), sets, minJ)
    val pairs = expandExactDups(repPairs, members, "jaccard", lit(1.0))
    (pairs, () => { sets.unpersist(); members.unpersist(); () })
  }

  /** LSH recall GAUGE — the dedup sibling of
    * [[graft.pipeline.Similarity.ivfRecall]]: the fraction of the
    * EXACT ≥ minJ pair set that the banded candidate generation
    * recovers (verification is exact Jaccard on both tiers, so found ⊆
    * exact and precision is 1 by construction; what banding costs is
    * recall, 1−(1−J^r)^b per pair). The exact baseline enumerates
    * candidates through an UNCAPPED inverted shingle index — complete
    * for minJ > 0, since any overlapping pair shares a shingle — and
    * is guarded by `maxRows`: run the gauge on a SAMPLE at a
    * maintenance cadence, not on the corpus (a hot shingle makes the
    * uncapped index quadratic, which is exactly why the production
    * pair path df-caps). Returns one row (n_exact, n_found, recall). */
  def minhashRecall(docs: DataFrame, minJ: Double,
      maxRows: Long = 100000L): DataFrame = {
    require(minJ > 0,
      "recall gauge needs minJ > 0 (zero-overlap pairs share no shingle)")
    val n = docs.count()
    require(n <= maxRows,
      s"exact baseline refuses $n docs > $maxRows — gauge a sample")
    val sets = Ckpt.persistOnce(shingleSets(docs))
    try {
      val sh = sets.select(col("doc_id"), explode(col("hs")).as("xh"))
      val ecand = sh.select(col("xh"), col("doc_id").as("doc_a"))
        .join(sh.select(col("xh"), col("doc_id").as("doc_b")), Seq("xh"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      val exact = verifyJaccard(ecand, sets, minJ)
      val found = verifyJaccard(
        candidates(bands(signaturesFromSets(sets))), sets, minJ)
      val ne = exact.agg(count(lit(1)).as("n_exact"))
      val nf = found.agg(count(lit(1)).as("n_found"))
      val out = ne.crossJoin(nf).select(col("n_exact"), col("n_found"),
        when(col("n_exact") === 0, lit(1.0))
          .otherwise(col("n_found").cast("double") / col("n_exact"))
          .as("recall"))
      // 1-row result: materialize before releasing the shared sets
      val row = out.collect().head
      docs.sparkSession.createDataFrame(
        java.util.List.of(row), out.schema)
    } finally { sets.unpersist(); () }
  }

  /** DuckDB twin of [[minhashRecall]] over the `documents` table:
    * composes after [[minhashPairsSql]]'s CTE chain (which defines
    * `sh`, `szs`, and the banded `out`); defines
    * `rec(n_exact, n_found, recall)`. */
  def minhashRecallSql(minJ: Double): String =
    s"""einter AS (
       |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS i
       |  FROM sh sa JOIN sh sb ON sb.xh = sa.xh AND sa.doc_id < sb.doc_id
       |  GROUP BY 1, 2
       |), eout AS (
       |  SELECT i.doc_a, i.doc_b FROM einter i
       |  JOIN szs za ON za.doc_id = i.doc_a
       |  JOIN szs zb ON zb.doc_id = i.doc_b
       |  WHERE CAST(i.i AS DOUBLE) / (za.sz + zb.sz - i.i) >= $minJ
       |), rec AS (
       |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM eout) AS n_exact,
       |         (SELECT CAST(count(*) AS BIGINT) FROM out) AS n_found,
       |         CASE WHEN (SELECT count(*) FROM eout) = 0 THEN 1.0
       |              ELSE (SELECT CAST(count(*) AS DOUBLE) FROM out)
       |                   / (SELECT count(*) FROM eout) END AS recall
       |)""".stripMargin

  /** Append-only near-dup state: the four frames a production stream
    * persists (e.g. parquet dirs appended per micro-batch).
    *  - `fps`     (fp, rep): one row per distinct text fingerprint
    *  - `sets`    (doc_id, hs): shingle set per REPRESENTATIVE only
    *  - `bands`   (band, key, doc_id): LSH index over representatives
    *  - `members` (doc_id, rep): every ingested doc → its representative
    */
  final case class NearDupState(fps: DataFrame, sets: DataFrame,
      bands: DataFrame, members: DataFrame) {
    /** Append another state's frames (batch appends → running state). */
    def union(o: NearDupState): NearDupState = NearDupState(
      fps.unionByName(o.fps), sets.unionByName(o.sets),
      bands.unionByName(o.bands), members.unionByName(o.members))
  }

  /** Build [[NearDupState]] from an initial corpus — the batch-0 shape
    * of [[minhashIncrement]]'s appends. NULL texts are excluded: they
    * cannot near-dup anything (mirrors [[Dedup.exactDedup]], which
    * keeps them all). */
  def indexCorpus(docs: DataFrame): NearDupState = {
    val fp = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), md5(col("text")).as("fp"))
    val repByFp = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("rep"))
    val withRep = fp.join(repByFp, "fp")
    val reps = withRep.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("text"))
    val sets = shingleSets(reps)
    NearDupState(repByFp, sets, bands(signaturesFromSets(sets)),
      withRep.select(col("doc_id"), col("rep")))
  }

  /** Incremental near-dup for an append-only corpus — the form a
    * production pipeline actually runs: documents arrive in batches and
    * each batch must dedup against everything already ingested without
    * rescanning it.
    *
    * Exact-duplicate collapse is STRUCTURAL here, not a caller
    * convention: the stores only ever index one representative per
    * distinct text (fingerprint map `fps`), so a crawl batch of 1 000
    * byte-identical documents adds ONE shingle set and ONE row per band
    * bucket — the degenerate-bucket blowup cannot occur no matter how
    * the operator is called. A batch doc whose fingerprint matches a
    * stored rep creates no new index entries at all; it inherits the
    * rep's pairs (identical text ⇒ identical similarity) through the
    * membership expansion, which is linear in the reported answer.
    *
    * Work per batch: one fingerprint join against `fps`, band-bucket
    * joins keyed on (band, key) touching only the batch's buckets, and
    * set fetches for actual candidates — nothing rescans the corpus.
    * Returns (pairs involving ≥1 batch doc, appends); callers
    * `state.union(appends)` or append each frame to its parquet dir —
    * the `foreachBatch` shape, same as
    * [[graft.streaming.Ingest.mergePiecesIntoArchive]]'s merge.
    *
    * Cache lifetime: the returned `appends.sets` frame is persisted (it
    * feeds the band index and verification); a long-running caller must
    * `unpersist()` it after appending to its stores, or cached
    * partitions accumulate across micro-batches. */
  def minhashIncrement(newDocs: DataFrame, st: NearDupState,
      minJ: Double): (DataFrame, NearDupState) = {
    val fpB = newDocs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), md5(col("text")).as("fp"))
    val hit = fpB.join(st.fps.withColumnRenamed("rep", "orep"), Seq("fp"), "left")
    val newFpRep = hit.filter(col("orep").isNull)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("nrep"))
    val assigned = hit.join(newFpRep, Seq("fp"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("orep"), col("nrep")).as("rep"),
        col("orep").isNotNull.as("dupOfStored"))
    val memberAppend = assigned.select(col("doc_id"), col("rep"))
    val newReps = assigned.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("text"))
    val newSets = shingleSets(newReps).persist()
    val newBands = bands(signaturesFromSets(newSets))

    // rep-level candidates: new×new, stored×new, and stored×touched-
    // stored (a pure exact-dup arrival re-activates its stored rep's
    // band buckets, so the new copy's pairs to OTHER stored docs are
    // re-derived without rescanning anything else)
    val touched = assigned.filter(col("dupOfStored"))
      .select(col("rep").as("doc_id")).distinct()
    val a = st.bands.select(col("band"), col("key"), col("doc_id").as("doc_a"))
    val bNew = newBands.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    val bTouch = st.bands.join(touched, "doc_id")
      .select(col("band"), col("key"), col("doc_id").as("doc_b"))
    val candCross = a.join(bNew.unionByName(bTouch), Seq("band", "key"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
    val cand = candidates(newBands).unionByName(candCross).distinct()
    val repPairs = verifyJaccard(cand, st.sets.unionByName(newSets), minJ)

    // expand rep pairs through membership, keeping only pairs that
    // involve this batch (older pairs were reported by older batches)
    val all = st.members.withColumn("nw", lit(false))
      .unionByName(memberAppend.withColumn("nw", lit(true)))
    val cross = repPairs
      .join(all.select(col("rep").as("doc_a"), col("doc_id").as("xa"),
        col("nw").as("na")), "doc_a")
      .join(all.select(col("rep").as("doc_b"), col("doc_id").as("xb"),
        col("nw").as("nb")), "doc_b")
      .filter(col("na") || col("nb"))
      .select(least(col("xa"), col("xb")).as("doc_a"),
        greatest(col("xa"), col("xb")).as("doc_b"), col("jaccard"))
    val within = memberAppend.select(col("rep"), col("doc_id").as("xa"))
      .join(all.select(col("rep"), col("doc_id").as("xb")), "rep")
      .filter(col("xa") =!= col("xb"))
      .select(least(col("xa"), col("xb")).as("doc_a"),
        greatest(col("xa"), col("xb")).as("doc_b"),
        lit(1.0).as("jaccard"))
      .distinct()
    (cross.unionByName(within),
      NearDupState(newFpRep.select(col("fp"), col("nrep").as("rep")),
        newSets, newBands, memberAppend))
  }

  /** Exact n-gram Jaccard via the inverted shingle index (df-capped).
    * Exact duplicates are collapsed first, as in [[minhashPairs]]: a
    * mass-duplicated document would otherwise (a) go quadratic in the
    * index join and (b) push its shingles' document frequency past
    * [[DfCap]], dropping them from the index entirely and silently
    * LOSING the duplicate pairs. Collapse bounds df at the number of
    * distinct texts and restores the full pair set afterward. */
  def ngramJaccardPairs(docs: DataFrame, minJ: Double): DataFrame = {
    val (members, reps) = collapseExact(docs)
    // one map-side set build feeds BOTH the inverted index (exploded)
    // and verification — no re-collect shuffle of the exploded stream
    val sets = Ckpt.persistOnce(shingleSets(reps))
    val sh = sets.select(col("doc_id"), explode(col("hs")).as("xh"))
    val rare = sh.groupBy(col("xh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= DfCap).select("xh")
    val shR = sh.join(rare, "xh")
    val a = shR.select(col("xh"), col("doc_id").as("doc_a"))
    val b = shR.select(col("xh"), col("doc_id").as("doc_b"))
    val cand = a.join(b, "xh").filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // verification runs on the UNCAPPED sets: the cap bounds candidate
    // generation, not the reported similarity
    val repPairs = verifyJaccard(cand, sets, minJ)
    expandExactDups(repPairs, members, "jaccard", lit(1.0))
  }

  /** Shared-substring (windowed-fingerprint) pairs — the substring-level
    * duplication signal whole-document dedup misses: two documents
    * sharing one long boilerplate passage can sit far below any
    * document Jaccard threshold yet still leak the passage into
    * training data many times over. Every `window`-token span starting
    * at each token position (stride 1; a coarser `stride` trades
    * recall of offset-misaligned repeats for index size) is hashed,
    * and pairs sharing at least `minShared` DISTINCT window hashes are
    * reported with the exact shared count — documents shorter than
    * `window` tokens contribute nothing (whole-document dedup owns
    * them).
    *
    * Scale shape is [[ngramJaccardPairs]]'s, unchanged: exact-dup
    * collapse bounds the bucket join, the window-hash inverted index
    * is df-capped ([[DfCap]] — hot boilerplate windows are precisely
    * the degenerate keys), candidates come from the capped index
    * self-join, and the reported count is verified on the UNCAPPED
    * per-doc window sets (one `array_intersect` per candidate pair,
    * map-side). The window stream is ~n_tokens hashes per document —
    * the same cardinality as the shingle stream every other dedup path
    * already pays.
    *
    * SCOPE: the cap means this operator enumerates pairs only among
    * passages carried by ≤ [[DfCap]] distinct texts. A passage pasted
    * into MORE carriers than that is a frequency phenomenon, not a
    * pair phenomenon — its pair set alone is quadratic in the carrier
    * count — and is surfaced by [[hotWindows]] (linear output), which
    * is exactly the set of windows this operator's index drops.
    *
    * Cache lifetime: the shared window-set and membership caches live
    * until the session drops them — a long-running caller that runs
    * MANY of these in one session should use [[windowFpPairsScoped]]
    * and release after consuming the pairs, or cached partitions
    * accumulate (same contract as [[minhashPairs]]). */
  def windowFpPairs(docs: DataFrame, window: Int, minShared: Int,
      stride: Int = 1): DataFrame =
    windowFpPairsScoped(docs, window, minShared, stride)._1

  /** Corpus-frequent windows — the boilerplate detector complementing
    * [[windowFpPairs]]: every `window`-token span carried by at least
    * `minDf` DISTINCT texts, with its carrier count. Linear output
    * (one row per hot window, not per carrier pair); `minDf = DfCap+1`
    * is exactly the set the pair path's index dropped (the pair index
    * KEEPS df ≤ DfCap). One representative per distinct text (no
    * membership map needed — the count is over distinct texts), then
    * map-side window hashing and one uniformly-keyed count. */
  def hotWindows(docs: DataFrame, window: Int, minDf: Int,
      stride: Int = 1): DataFrame = {
    require(window > 0 && stride > 0 && minDf > 0,
      "window, stride, minDf must be positive")
    val reps = docs.filter(col("text").isNotNull)
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val wh = windowSets(reps, window, stride)
      .select(explode(col("ws")).as("wh"))
    wh.groupBy(col("wh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
  }

  /** DuckDB twin of [[hotWindows]] — reuses [[windowFpPairsSql]]'s
    * exact CTE prefix; defines CTE `hotw(wh, df)`. */
  def hotWindowsSql(window: Int, minDf: Int, stride: Int = 1): String =
    s"""WITH ${windowCtePrefix(window, stride)},
       |hotw AS (
       |  SELECT wh, CAST(count(*) AS BIGINT) AS df
       |  FROM dw GROUP BY wh HAVING count(*) >= $minDf
       |)""".stripMargin

  /** Boilerplate REMOVAL — the action step [[hotWindows]] detects for:
    * every token covered by a corpus-frequent window (df ≥ `minDf`
    * distinct texts, same hashing/df rule as the detector) is struck
    * from its document and the survivors re-join into the cleaned
    * text. This is the span-removal half of exact-substring dedup
    * (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499 §4 — theirs via suffix arrays; here
    * windows are the span alphabet, which bounds spans to `window`
    * tokens but keeps every step a uniform-key DataFrame op).
    *
    * Scale shape: work is per DISTINCT text (exact-dup members reuse
    * their representative's cleaning); the window stream is ~n_tokens
    * rows per doc (the cardinality every dedup path already pays);
    * `hot` is an aggregate on the uniform window-hash key; only HOT
    * matches explode into covered positions (window-factor bounded);
    * one doc_id shuffle reassembles. No collected state, no skewed
    * key: boilerplate with millions of carriers is one `wh` group and
    * its per-doc expansion lands on the carriers' own partitions.
    *
    * Output: (doc_id, clean_text, n_removed) for EVERY input doc —
    * cleaned text is the lowercased token stream re-joined with single
    * spaces (the pipeline's token normalization, cross-engine stable);
    * null text stays null, fully-boilerplate docs come back empty. */
  def stripBoilerplate(docs: DataFrame, window: Int, minDf: Int,
      stride: Int = 1): DataFrame =
    stripBoilerplateScoped(docs, window, minDf, stride)._1

  /** [[stripBoilerplate]] plus a release handle for its shared caches
    * (the token frame feeds two branches, the window stream three —
    * uncached they would re-tokenize and re-hash the corpus per
    * branch); call it after the final action that consumes the
    * cleaned frame (same contract as [[windowFpPairsScoped]]; the
    * no-handle form above leaves the caches to the session). */
  def stripBoilerplateScoped(docs: DataFrame, window: Int, minDf: Int,
      stride: Int = 1): (DataFrame, () => Unit) = {
    require(window > 0 && stride > 0 && minDf > 0,
      "window, stride, minDf must be positive")
    val toksCol = split(trim(lower(col("text"))), "\\s+")
    val reps = docs.filter(col("text").isNotNull)
      .groupBy(col("text")).agg(min(col("doc_id")).as("rep"))
    val base = Ckpt.persistOnce(reps.select(col("rep"), toksCol.as("ts")))
    val wins0 = base.filter(size(col("ts")) >= window)
      .select(col("rep"), col("ts"), explode(sequence(lit(0L),
        (size(col("ts")) - window).cast("long"),
        lit(stride.toLong))).as("st"))
      .select(col("rep"), col("st"), pmod(h64(concat_ws(" ",
        slice(col("ts"), (col("st") + 1).cast("int"), lit(window)))),
        lit(X)).as("wh"))
    val wins = Ckpt.persistOnce(wins0)
    val hot = wins.select(col("rep"), col("wh")).distinct()
      .groupBy("wh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select("wh")
    val covered = wins.join(hot, "wh")
      .select(col("rep"),
        explode(sequence(col("st"), col("st") + (window - 1))).as("p"))
      .distinct()
      .transform(Ckpt.persistOnce) // feeds the anti-join AND the n_removed count
    val tokRows = base.select(col("rep"),
      posexplode(col("ts")).as(Seq("p", "tok")))
    val cleaned = tokRows
      .join(covered, Seq("rep", "p"), "left_anti")
      .groupBy("rep")
      .agg(concat_ws(" ",
        array_sort(collect_list(struct(col("p"), col("tok"))))
          .getField("tok")).as("clean_text"))
    val removed = covered.groupBy("rep")
      .agg(count(lit(1)).as("n_removed"))
    val repMap = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).join(reps, "text")
      .select(col("doc_id"), col("rep"))
    val out = docs.select(col("doc_id"), col("text"))
      .join(repMap, Seq("doc_id"), "left")
      .join(cleaned, Seq("rep"), "left")
      .join(removed, Seq("rep"), "left")
      .select(col("doc_id"),
        when(col("text").isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("clean_text"), lit(""))).as("clean_text"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
    (out, () => { base.unpersist(); wins.unpersist(); covered.unpersist(); () })
  }

  /** DuckDB twin of [[stripBoilerplate]] — reuses the shared window
    * CTE prefix (its `wins` carries the 0-based window index `i`);
    * defines CTE `stripw(doc_id, clean_text, n_removed)`. */
  def stripBoilerplateSql(window: Int, minDf: Int, stride: Int = 1): String =
    s"""WITH ${windowCtePrefix(window, stride)},
       |hotws AS (SELECT wh FROM dw GROUP BY wh HAVING count(*) >= $minDf),
       |covp AS (
       |  SELECT DISTINCT w.doc_id, ip AS p
       |  FROM wins w JOIN hotws USING (wh),
       |       unnest(generate_series(w.i*$stride, w.i*$stride + $window - 1)) AS t(ip)
       |), tokp AS (
       |  SELECT doc_id, i - 1 AS p, ts[i] AS tok
       |  FROM tokw, unnest(generate_series(1, len(ts))) AS t(i)
       |), keptw AS (
       |  SELECT t.doc_id, t.p, t.tok FROM tokp t
       |  LEFT JOIN covp c ON c.doc_id = t.doc_id AND c.p = t.p
       |  WHERE c.p IS NULL
       |), cleanw AS (
       |  SELECT doc_id, array_to_string(list(tok ORDER BY p), ' ') AS clean_text
       |  FROM keptw GROUP BY doc_id
       |), remw AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
       |  FROM covp GROUP BY doc_id
       |), stripw AS (
       |  SELECT d.doc_id,
       |    CASE WHEN d.text IS NULL THEN NULL
       |         ELSE coalesce(c.clean_text, '') END AS clean_text,
       |    coalesce(r.n_removed, CAST(0 AS BIGINT)) AS n_removed
       |  FROM documents d
       |  LEFT JOIN mem m ON m.doc_id = d.doc_id
       |  LEFT JOIN cleanw c ON c.doc_id = m.rep
       |  LEFT JOIN remw r ON r.doc_id = m.rep
       |)""".stripMargin

  /** Per-representative DISTINCT window-hash set, map-side (the
    * windowed analogue of [[shingleSets]]). */
  private def windowSets(reps: DataFrame, window: Int,
      stride: Int): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    val starts = sequence(lit(0L), (size(toks) - window).cast("long"),
      lit(stride.toLong))
    val ws = array_distinct(transform(starts, st => pmod(
      h64(concat_ws(" ", slice(toks, (st + 1).cast("int"), lit(window)))),
      lit(X))))
    reps.filter(col("text").isNotNull && size(toks) >= window)
      .select(col("doc_id"), ws.as("ws"))
  }

  /** [[windowFpPairs]] plus a release handle that unpersists the shared
    * window-set and membership caches; call it after the final action
    * that consumes the pairs (same contract as
    * [[minhashPairsScoped]]). */
  def windowFpPairsScoped(docs: DataFrame, window: Int, minShared: Int,
      stride: Int = 1): (DataFrame, () => Unit) = {
    require(window > 0 && stride > 0 && minShared > 0,
      "window, stride, minShared must be positive")
    val (members, reps) = collapseExact(docs)
    val wsets = Ckpt.persistOnce(windowSets(reps, window, stride))
    val wh = wsets.select(col("doc_id"), explode(col("ws")).as("wh"))
    // round 16: one bucket aggregate replaces the previous
    // groupBy(df)→join(rare)→self-join chain — the df cap and the
    // pair generation both read the SAME per-wh doc list, so the
    // token-grain stream crosses one exchange instead of three
    // ([[candidates]] has the same reshape; outputs are identical).
    // Round 17: the aggregate is the BOUNDED min-list ([[graft
    // .functions.SketchExprs.boundedMinList]]) — over-cap buckets are
    // DROPPED by the df filter anyway (hot boilerplate windows are
    // precisely the fat ones), so the buffer keeps at most DfCap+1
    // ids and one degenerate window can no longer materialize a
    // bucket-sized unspillable array row; for surviving buckets
    // (df ≤ DfCap) the list is complete and ascending — identical to
    // sort_array(collect_list).
    val cand = bucketPairs(wh.groupBy(col("wh"))
      .agg(graft.functions.SketchExprs
        .boundedMinList(col("doc_id"), DfCap + 1).as("bl"))
      .filter(col("bl.df").between(2, DfCap))
      .select(col("bl.ds").as("ds")))
    val repPairs = cand
      .join(wsets.select(col("doc_id").as("doc_a"), col("ws").as("wsa")), "doc_a")
      .join(wsets.select(col("doc_id").as("doc_b"), col("ws").as("wsb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("wsa"), col("wsb"))).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
    // expand: [[expandExactDups]] carries a constant self value, but a
    // within-group pair here shares the rep's WHOLE window set — so the
    // expansion is inlined with the rep's set size as the count
    val ma = members.select(col("rep").as("doc_a"), col("doc_id").as("xa"))
    val mb = members.select(col("rep").as("doc_b"), col("doc_id").as("xb"))
    val cross = repPairs.join(ma, "doc_a").join(mb, "doc_b")
      .select(least(col("xa"), col("xb")).as("doc_a"),
        greatest(col("xa"), col("xb")).as("doc_b"), col("n_shared"))
    val within = members.select(col("rep"), col("doc_id").as("xa"))
      .join(members.select(col("rep"), col("doc_id").as("xb")), "rep")
      .filter(col("xa") < col("xb"))
      .join(wsets.select(col("doc_id").as("rep"),
        size(col("ws")).cast("long").as("n_shared")), "rep")
      .filter(col("n_shared") >= minShared)
      .select(col("xa").as("doc_a"), col("xb").as("doc_b"), col("n_shared"))
    (cross.unionByName(within),
      () => { wsets.unpersist(); members.unpersist(); () })
  }

  /** Shared CTE prefix for the window-fingerprint twins: exact-dup
    * collapse (fp/repby/mem/reps), tokenization, window hashing, and
    * the distinct (doc_id, wh) frame `dw` — ONE statement of the
    * collapse + hashing idiom so [[windowFpPairsSql]] and
    * [[hotWindowsSql]] cannot drift apart. */
  private def windowCtePrefix(window: Int, stride: Int): String =
    s"""fp AS (SELECT doc_id, text, md5(text) AS h FROM documents),
       |repby AS (SELECT h, min(doc_id) AS rep FROM fp GROUP BY h),
       |mem AS (SELECT f.doc_id, r.rep FROM fp f JOIN repby r USING (h)),
       |reps AS (SELECT doc_id, text FROM fp WHERE doc_id IN (SELECT rep FROM repby)),
       |tokw AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
       |  FROM reps WHERE text IS NOT NULL
       |), wins AS (
       |  SELECT doc_id, i,
       |    CAST('0x' || substr(md5(array_to_string(
       |      ts[i*$stride+1 : i*$stride+$window], ' ')), 1, 15) AS BIGINT) % $X AS wh
       |  FROM (SELECT doc_id, ts,
       |          unnest(generate_series(0,
       |            CAST(floor((len(ts) - $window) / $stride) AS BIGINT))) AS i
       |        FROM tokw WHERE len(ts) >= $window)
       |), dw AS (SELECT DISTINCT doc_id, wh FROM wins)""".stripMargin

  /** DuckDB twin of [[windowFpPairs]] incl. the exact-dup collapse;
    * the final pair CTE is `outw(doc_a, doc_b, n_shared)`. */
  def windowFpPairsSql(window: Int, minShared: Int, stride: Int = 1): String =
    s"""WITH ${windowCtePrefix(window, stride)},
       |wsets AS (SELECT doc_id, list(DISTINCT wh) AS ws FROM wins GROUP BY doc_id),
       |rare AS (SELECT wh FROM dw GROUP BY wh HAVING count(*) <= $DfCap),
       |dwr AS (SELECT d.* FROM dw d JOIN rare USING (wh)),
       |candw AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM dwr a JOIN dwr b ON a.wh = b.wh WHERE a.doc_id < b.doc_id
       |), verw AS (
       |  SELECT c.doc_a, c.doc_b,
       |         CAST(len(list_intersect(wa.ws, wb.ws)) AS BIGINT) AS n_shared
       |  FROM candw c JOIN wsets wa ON wa.doc_id = c.doc_a
       |               JOIN wsets wb ON wb.doc_id = c.doc_b
       |  WHERE len(list_intersect(wa.ws, wb.ws)) >= $minShared
       |), outw AS (
       |  SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
       |         greatest(ma.doc_id, mb.doc_id) AS doc_b, v.n_shared
       |  FROM verw v JOIN mem ma ON ma.rep = v.doc_a JOIN mem mb ON mb.rep = v.doc_b
       |  UNION ALL
       |  SELECT a.doc_id, b.doc_id, CAST(len(w.ws) AS BIGINT) AS n_shared
       |  FROM mem a JOIN mem b ON a.rep = b.rep AND a.doc_id < b.doc_id
       |  JOIN wsets w ON w.doc_id = a.rep
       |  WHERE len(w.ws) >= $minShared
       |)""".stripMargin

  /** 32-bit SimHash per document over distinct shingle hashes (shingles,
    * not unigrams: a corpus with a small shared vocabulary makes every
    * unigram set near-identical and the signature degenerate): bit i of
    * the signature = sign of Σ(±1) over shingle-hash bit i. */
  def simhashSigs(docs: DataFrame): DataFrame =
    shingleSets(docs).select(col("doc_id"),
      graft.functions.HashExprs.simhashSig(col("hs")).as("simhash"))

  /** Higher-order-function formulation of the SimHash fold, kept as
    * the reference implementation the native expression is
    * property-tested against (PropertySpec). */
  def simhashFromSetsHof(sets: DataFrame): DataFrame =
    sets.select(col("doc_id"), expr(
      """aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, i) -> acc +
        |  IF(aggregate(hs, CAST(0 AS BIGINT),
        |       (a2, x) -> a2 + IF((shiftright(x, i) & 1) = 1,
        |                          CAST(1 AS BIGINT), CAST(-1 AS BIGINT))) > 0,
        |     shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""".stripMargin)
      .as("simhash"))

  /** SimHash near-dup pairs: byte-band candidates (equal byte j of the
    * signature for any j) verified by Hamming distance ≤ maxHamming.
    * Same exact-dup collapse/expand guard as [[minhashPairs]] — identical
    * texts have identical signatures and would flood the byte-band
    * buckets. */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val (members, reps) = collapseExact(docs)
    val repPairs = simhashPairsRaw(reps, maxHamming)
    expandExactDups(repPairs, members, "hamming", lit(0L))
  }

  private def simhashPairsRaw(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = simhashSigs(docs)
    val bytes = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("simhash"), j * 8).bitwiseAND(lit(255L))): _*))
        .as(Seq("bix", "byte")))
    val a = bytes.select(col("bix"), col("byte"),
      col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = bytes.select(col("bix"), col("byte"),
      col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("bix", "byte")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sig_a ^ sig_b)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over a near-dup pair graph: iterative min-label
    * propagation (each node adopts the smallest doc_id reachable), the
    * Pregel-style loop bounded by component diameter — near-dup clusters
    * are shallow (pairs/triples), so convergence is 2-3 rounds. Each
    * round is one join + aggregate; the driver only checks the
    * convergence counter, never the data. Returns (doc_id, cluster).
    *
    * Checkpoint hygiene: each round's localCheckpoint supersedes the
    * previous round's — the superseded blocks (and the graph's, at
    * return) are unpersisted deterministically instead of waiting on
    * the ContextCleaner, so a long propagation never holds more than
    * two rounds of labels in storage. Only the FINAL labels' blocks
    * stay alive: they back the returned frame. */
  def clusters(pairs: DataFrame): DataFrame = {
    // unpersist the blocks behind a localCheckpoint()'d frame: its plan
    // is a LogicalRDD over the materialized blocks, which
    // DataFrame.unpersist (CacheManager entries only) never touches.
    // Quiet form (GraftBridge): RDD.unpersist's truncated-lineage WARN
    // is known-safe noise under the release-after-last-action contract
    def releaseCkpt(df: DataFrame): Unit = Ckpt.free(df)
    // symmetrize in ONE pass: a union of two selects over the same
    // `pairs` plan would evaluate the whole upstream pipeline (band
    // join + verify) twice inside the checkpoint job
    val sym = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // checkpoint: each round re-reads the graph and the prior labels
      // as fresh scans — truncated lineage keeps the iterative plan from
      // compounding and sidesteps self-join ambiguity. LAZY (round 17):
      // the size-gate count below is the first action and materializes
      // it — an eager checkpoint here was one whole extra job per
      // clustering (the bpeCore gate-probe pattern).
      .localCheckpoint(false)
    // SIZE-GATED driver path (the k-means-centroid pattern): the pair
    // graph is corpus-METADATA-sized — near-dup pairs, not documents —
    // and in every realistic dedup it is tiny next to the corpus. When
    // it fits a bounded driver budget (count is a scan of the blocks
    // the checkpoint just materialized), union–find replaces the
    // 2-3-round propagation loop's per-iteration checkpoint jobs with
    // one collect — the profiled round-15 win that cut cu_pipeline's
    // dominant stage. Result is IDENTICAL (cluster = min doc_id of the
    // component) and the distributed loop below remains the path for
    // graphs past the gate.
    val driverMax = sys.env.get("GRAFT_CC_DRIVER_MAX")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption).filter(_ >= 0)
      .getOrElse(1L << 21) // ~2M directed edges ≈ 32 MB of longs
    if (sym.count() <= driverMax) {
      val spark = pairs.sparkSession
      // collect as FLAT PRIMITIVE long arrays (one per partition,
      // [src0,dst0,src1,dst1,…]) — a Row collect would hold every edge
      // as a GenericRow of boxed Longs (100+ B/edge, hundreds of MB at
      // the gate boundary); primitive chunks are 16 B/edge, so the
      // 2 M-edge budget really is the ~32 MB the gate assumes
      import spark.implicits._
      val chunks: Array[Array[Long]] =
        sym.select(col("src"), col("dst")).as[(Long, Long)].rdd
          .mapPartitions { it =>
            val b = scala.collection.mutable.ArrayBuilder.make[Long]
            it.foreach { case (s, d) => b += s; b += d }
            Iterator.single(b.result())
          }.collect()
      releaseCkpt(sym)
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      chunks.foreach { ch =>
        var i = 0
        while (i < ch.length) {
          val a = ch(i); val b = ch(i + 1); i += 2
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val ra = find(a); val rb = find(b)
          // union by MIN root: every component's root stays its minimum
          // element, so find() below IS the min-label the loop computes
          if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
        }
      }
      // result frame from two primitive arrays shipped once via
      // broadcast — no driver-side Row/tuple materialization
      val n = parent.size()
      val nodes = new Array[Long](n)
      val roots = new Array[Long](n)
      var i = 0
      parent.keySet().forEach { k =>
        nodes(i) = k; roots(i) = find(k); i += 1
      }
      val nParts = math.max(1, math.min(32, n / 50000 + 1))
      val bcNodes = spark.sparkContext.broadcast(nodes)
      val bcRoots = spark.sparkContext.broadcast(roots)
      val per = (n + nParts - 1) / nParts
      return spark.sparkContext.parallelize(0 until nParts, nParts)
        .flatMap { p =>
          val nd = bcNodes.value; val rt = bcRoots.value
          val s = p * per; val e = math.min(nd.length, s + per)
          (s until e).iterator.map(j => (nd(j), rt(j)))
        }.toDF("doc_id", "cluster")
    }
    var ckpt = sym.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id")).localCheckpoint()
    var labels = ckpt
    var iter = 0
    var converged = false
    while (!converged && iter < 20) {
      val prop = sym.join(labels, sym("dst") === labels("doc_id"))
        .groupBy(col("src")).agg(min(col("cluster")).as("nbr"))
        .withColumnRenamed("src", "doc_id")
      // carry the changed flag inside the checkpointed frame: the
      // convergence test is then a scan of the already-materialized
      // blocks, not a second join job per round
      val next = labels.withColumnRenamed("cluster", "prev")
        .join(prop, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("prev"), coalesce(col("nbr"), col("prev"))).as("cluster"),
          (least(col("prev"), coalesce(col("nbr"), col("prev"))) =!= col("prev"))
            .as("__chg"))
        .localCheckpoint() // eager: materialized before the old round goes
      converged = next.filter(col("__chg")).isEmpty
      releaseCkpt(ckpt)
      ckpt = next
      labels = next.select(col("doc_id"), col("cluster"))
      iter += 1
    }
    releaseCkpt(sym)
    labels
  }

  /** End-to-end near-dup dedup: keep the lowest doc_id of every MinHash
    * cluster plus every unpaired document. */
  def dedupKeep(docs: DataFrame, minJ: Double): DataFrame = {
    val cl = clusters(minhashPairs(docs, minJ))
    val losers = cl.filter(col("doc_id") =!= col("cluster")).select("doc_id")
    docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(losers, Seq("doc_id"), "left_anti")
  }

  // ---- DuckDB oracle builders (formula-identical, same constants) ----

  private def h64Sql(e: String) =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** CTE `sh(doc_id, xh)` — distinct shingle hashes over any relation
    * with (doc_id, text). */
  def shinglesSql: String = shinglesSqlFrom("documents")

  def shinglesSqlFrom(from: String): String =
    s"""tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
       |  FROM $from
       |), sh AS (
       |  SELECT DISTINCT doc_id,
       |    ${h64Sql(s"array_to_string(ts[i + 1 : i + $ShingleN], ' ')")} % $X AS xh
       |  FROM (SELECT doc_id, ts,
       |          unnest(generate_series(0, greatest(len(ts) - $ShingleN, 0))) AS i
       |        FROM tok)
       |)""".stripMargin

  /** CTE `sigs(doc_id, h0..h15)`. */
  def minhashSigsSql: String = {
    val mins = hashParams.zipWithIndex.map { case ((a, b), k) =>
      s"min((xh * $a + $b) % $P) AS h$k"
    }.mkString(", ")
    s"sigs AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id)"
  }

  /** CTEs `bands` + `cand` from `sigs`. */
  def candSql: String = {
    val keys = (0 until NumBands).map { j =>
      val parts = (0 until BandRows)
        .map(r => s"CAST(h${j * BandRows + r} AS VARCHAR)")
        .mkString(" || ':' || ")
      s"SELECT doc_id, $j AS band, $parts AS key FROM sigs"
    }.mkString(" UNION ALL ")
    s"""bands AS ($keys),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
       |  WHERE a.doc_id < b.doc_id
       |)""".stripMargin
  }

  /** CTE `out(doc_a, doc_b, jaccard)` verifying `cand` at `minJ`.
    * MATERIALIZED: downstream restatements reference `out` (directly
    * or through CTEs built on it) several times, and DuckDB's default
    * inlining re-evaluates the whole shingle→minhash→band→verify
    * chain per reference — measured 5.06→0.47 s on cu_pipeline's
    * oracle at sf0.01, and the difference between 45 MINUTES and
    * 0.46 s on cu_stream_pipeline's (the round-15 gate wedge). */
  def verifySql(minJ: Double): String =
    s"""szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS i
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.xh = sa.xh
       |  GROUP BY c.doc_a, c.doc_b
       |), out AS MATERIALIZED (
       |  SELECT i.doc_a, i.doc_b,
       |         CAST(i.i AS DOUBLE) / (za.sz + zb.sz - i.i) AS jaccard
       |  FROM inter i
       |  JOIN szs za ON za.doc_id = i.doc_a
       |  JOIN szs zb ON zb.doc_id = i.doc_b
       |  WHERE CAST(i.i AS DOUBLE) / (za.sz + zb.sz - i.i) >= $minJ
       |)""".stripMargin

  def minhashPairsSql(minJ: Double): String =
    s"WITH $shinglesSql, $minhashSigsSql, $candSql, ${verifySql(minJ)}"

  /** Recursive-CTE connected components over the `out(doc_a, doc_b)`
    * pair CTE; UNION dedup bounds the recursion. Defines
    * `comp(doc_id, cluster)`. */
  val clustersSql: String =
    """sym AS MATERIALIZED (
      |  SELECT doc_a AS src, doc_b AS dst FROM out
      |  UNION SELECT doc_b, doc_a FROM out
      |), reach AS (
      |  SELECT src, dst FROM sym UNION SELECT src, src FROM sym
      |  UNION
      |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
      |), comp AS MATERIALIZED (
      |  SELECT src AS doc_id, min(dst) AS cluster FROM reach GROUP BY src
      |)""".stripMargin

  /** Restates [[ngramJaccardPairs]] incl. the exact-dup collapse:
    * pairs computed over representatives, then expanded back — cross
    * pairs inherit the reps' jaccard, within-group pairs are 1.0. The
    * final pair CTE is `outx(doc_a, doc_b, jaccard)`. */
  def ngramPairsSql(minJ: Double): String =
    s"""WITH fp AS (SELECT doc_id, text, md5(text) AS h FROM documents),
       |repby AS (SELECT h, min(doc_id) AS rep FROM fp GROUP BY h),
       |mem AS (SELECT f.doc_id, r.rep FROM fp f JOIN repby r USING (h)),
       |reps AS (SELECT doc_id, text FROM fp WHERE doc_id IN (SELECT rep FROM repby)),
       |${shinglesSqlFrom("reps")},
       |rare AS (SELECT xh FROM sh GROUP BY xh HAVING count(*) <= $DfCap),
       |shr AS (SELECT s.* FROM sh s JOIN rare USING (xh)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM shr a JOIN shr b ON a.xh = b.xh WHERE a.doc_id < b.doc_id
       |), ${verifySql(minJ)},
       |outx AS (
       |  SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
       |         greatest(ma.doc_id, mb.doc_id) AS doc_b, o.jaccard
       |  FROM out o
       |  JOIN mem ma ON ma.rep = o.doc_a
       |  JOIN mem mb ON mb.rep = o.doc_b
       |  UNION ALL
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 1.0 AS jaccard
       |  FROM mem a JOIN mem b ON a.rep = b.rep AND a.doc_id < b.doc_id
       |)""".stripMargin

  /** CTE `sigs2(doc_id, simhash)` (requires [[shinglesSql]]'s `sh`). */
  def simhashSigsSql: String =
    s"""hsets AS (SELECT doc_id, list(xh) AS hs FROM sh GROUP BY doc_id),
       |sigs2 AS (
       |  SELECT doc_id, list_sum([
       |    CASE WHEN list_sum([
       |      CASE WHEN ((x >> i) & 1) = 1 THEN 1 ELSE -1 END for x in hs
       |    ]) > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END
       |    for i in generate_series(0, 31)]) AS simhash
       |  FROM hsets
       |)""".stripMargin

  def simhashPairsSql(maxHamming: Int): String =
    s"""WITH $shinglesSql, $simhashSigsSql,
       |bytes AS (
       |  SELECT doc_id, simhash, j AS bix, (simhash >> (j * 8)) & 255 AS byte
       |  FROM sigs2, (SELECT unnest(generate_series(0, 3)) AS j)
       |), out AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         bit_count(xor(a.simhash, b.simhash)) AS hamming
       |  FROM bytes a JOIN bytes b ON a.bix = b.bix AND a.byte = b.byte
       |  WHERE a.doc_id < b.doc_id
       |    AND bit_count(xor(a.simhash, b.simhash)) <= $maxHamming
       |)""".stripMargin
}
