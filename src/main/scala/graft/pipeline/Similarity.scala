package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two tiers, as a 100 TB pipeline needs both:
  *   - [[topKExact]] / [[pairsExact]]: brute-force cosine — the
  *     correctness baseline. Top-k broadcasts the (small) query set
  *     against the corpus, so the big side streams map-side with no
  *     shuffle; all-pairs is quadratic by nature and only the baseline.
  *   - [[pairsLsh]]: random-hyperplane LSH — signatures are integer
  *     dot-product signs, vectors bucket by signature bands, and only
  *     within-bucket candidates get exact verification. The shuffle key
  *     is the band hash; candidate count ≈ pairs sharing a band, not n².
  *
  * Portability: cosine is computed in double with a sequential
  * element-order fold on both engines (DuckDB's `list_cosine_similarity`
  * computes in float32 — NOT used). LSH sign bits are computed on
  * integer-quantized vectors (`floor(x·10⁴+0.5)`) against ±1 planes, so
  * the signatures are bit-exact across engines with no float sign-flip
  * risk at the hyperplane boundary.
  */
object Similarity {

  /** Deterministic ±1 (Rademacher) hyperplanes, [[NumPlanes]]×dim,
    * from a fixed LCG — frozen for oracle parity. */
  val NumPlanes = 16
  val Dim = 64
  /** Band shape is the recall/candidate-volume knob: r-bit bands give a
    * candidate probability of 1−(1−pʳ)^b at angular similarity p. 4×4
    * suits this corpus (max pairwise cos ≈ 0.5); a 100 TB corpus with a
    * tighter dup threshold wants more planes and wider bands (e.g.
    * 64 planes, 8×8) to keep bucket volumes sub-quadratic. */
  val BandBits = 4
  val NumBands: Int = NumPlanes / BandBits
  val planes: Seq[Seq[Int]] = {
    var s = 7L
    Seq.fill(NumPlanes)(Seq.fill(Dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      if (((s >>> 33) & 1L) == 1L) 1 else -1
    })
  }

  private val emb = col("embedding")

  /** Double-precision cosine between two embedding array columns,
    * sequential element order — computed by the fused native
    * [[graft.functions.DotProductExpr]] (bit-identical to the
    * `aggregate∘zip_with` fold it replaces; PropertySpec asserts it). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosine(a, b)

  /** The HOF fold formulation, kept as the reference implementation
    * the native expression is property-tested against. */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Integer-quantized copy of an embedding (exact cross-engine) —
    * public because every operator that must sum embeddings
    * order-independently (k-means updates, the Rocchio centroid in
    * [[TextAnalysis.semanticExpand]]) goes through this projection:
    * long sums are exact, so the aggregation order Spark and DuckDB
    * don't share can never show up in the result. */
  def qvec(c: Column): Column =
    transform(c, e => floor(e.cast("double") * 10000d + 0.5d).cast("long"))

  /** LSH signature: bit k = sign of ⟨quantized vec, plane_k⟩ — all 16
    * plane dots fused into one native pass over the vector
    * ([[graft.functions.LshSignExpr]]; integer arithmetic, bit-exact). */
  def lshSig(c: Column): Column =
    graft.functions.VectorExprs.lshSign(qvec(c),
      planes.map(_.map(_.toLong)))

  /** Per-plane HOF formulation of [[lshSig]], kept for the
    * PropertySpec equivalence check. */
  def lshSigHof(c: Column): Column = {
    val q = qvec(c)
    val bits = planes.zipWithIndex.map { case (p, k) =>
      val planeLit = array(p.map(v => lit(v.toLong)): _*)
      val d = aggregate(zip_with(q, planeLit, (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
      when(d >= 0, lit(1L << k)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Brute-force cosine top-k: the query set (small — broadcast) against
    * the whole corpus; rank by (cos desc, vec_id) for determinism. */
  def topKExact(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), emb.as("qemb")))
    val scored = corpus.select(col("vec_id"), emb).crossJoin(q)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("qemb"), emb).as("cos"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("vec_id"), col("cos"))
  }

  /** Hard-negative mining for contrastive training — per query, the k
    * highest-cosine corpus vectors with a DIFFERENT label: the
    * nearest WRONG answers, which is exactly the negative set a
    * contrastive or reranker training run wants (random negatives are
    * too easy to teach a margin). Exact tier: same broadcast-query
    * corpus scan as [[topKExact]] with the label-mismatch predicate
    * fused into it — use [[hardNegativesIvf]] when the corpus is big
    * enough to want an index. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), emb.as("qemb"),
      col("label").as("qlabel")))
    corpus.select(col("vec_id"), emb, col("label")).crossJoin(q)
      .filter(col("vec_id") =!= col("qid") && col("label") =!= col("qlabel"))
      .select(col("qid"), col("vec_id"), cosine(col("qemb"), emb).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998)
    * — the diversity-aware top-k a few-shot / eval-set / RAG-context
    * builder wants: greedily pick `k` items trading relevance to the
    * query against redundancy with what is already picked,
    * `next = argmax  wRel·rel(d) − wDiv·max_{s∈picked} sim(d, s)`
    * (the first pick is pure relevance). Plain relevance top-k hands
    * back k near-duplicates of the best hit; MMR hands back k
    * DIFFERENT good hits.
    *
    * Scale shape: relevance scoring is the distributed part — one
    * map-side quantized-dot scan of the corpus, TakeOrdered into a
    * `poolN`-row candidate pool. The selection loop is inherently
    * sequential (each pick reshapes every survivor's score) and runs
    * on the POOL ONLY: ≤ poolN·Dim longs of driver state and
    * O(k·poolN·Dim) integer ops — the k-means centroid-bounce class,
    * require-bounded.
    *
    * Determinism contract (the kmeans idiom): rel and sim are EXACT
    * integer dots over [[qvec]]-quantized vectors, the weights are
    * integers, so every score is an exact BIGINT both engines compute
    * identically; ties break by (score desc, vec_id asc) and the pool
    * cutoff by (rel desc, vec_id asc). Returns (rank, vec_id, score)
    * with `score` in the exact integer domain. */
  def mmrSelect(corpus: DataFrame, queryVec: Seq[Double], k: Int,
      poolN: Int = 256, wRel: Long = 7L, wDiv: Long = 3L): DataFrame = {
    require(k >= 1 && poolN >= 1, "k, poolN >= 1")
    require(poolN <= 100000,
      s"poolN $poolN exceeds the driver-state bound of the MMR pool " +
        "(poolN x Dim longs bounce through the driver)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val qq = queryVec.map(x => math.floor(x * 10000d + 0.5d).toLong)
    val qqLit = array(qq.map(lit(_)): _*)
    val rel = aggregate(zip_with(qvec(emb), qqLit, (x, y) => x * y),
      lit(0L), (a, x) => a + x)
    // distributed: score + TakeOrdered pool (orderBy+limit, no
    // single-partition window), then the bounded driver bounce
    val pool = corpus.select(col("vec_id").cast("long").as("vec_id"),
        qvec(emb).as("qv"), rel.as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(poolN)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
      .sortBy(_._1) // vec_id frame: first-wins argmax == lowest vec_id
    val n = pool.length
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val pickedFlag = Array.fill(n)(false)
    val maxSim = Array.fill(n)(Long.MinValue) // exact once >= 1 pick made
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var round = 0
    while (round < math.min(k, n)) {
      var bi = -1; var best = Long.MinValue
      var i = 0
      while (i < n) {
        if (!pickedFlag(i)) {
          val s =
            if (round == 0) wRel * pool(i)._3
            else wRel * pool(i)._3 - wDiv * maxSim(i)
          if (s > best) { best = s; bi = i } // first wins ties
        }
        i += 1
      }
      pickedFlag(bi) = true
      out += (((round + 1).toLong, pool(bi)._1, best))
      i = 0
      while (i < n) {
        if (!pickedFlag(i))
          maxSim(i) = math.max(maxSim(i), dot(pool(i)._2, pool(bi)._2))
        i += 1
      }
      round += 1
    }
    out.toSeq.toDF("rank", "vec_id", "score")
  }

  /** Scale tier of [[mmrSelect]]: the relevance pool comes from the
    * IVF index (nProbe nearest buckets) instead of a full corpus scan
    * — approximate on the same axis every IVF read is (out-of-bucket
    * candidates are invisible), while the greedy selection over the
    * pool stays EXACT integer math. Converges on [[mmrSelect]] when
    * probing covers the corpus and poolN admits it (spec-pinned with
    * kmK ≤ [[IvfProbe]] and poolN ≥ |corpus| — every bucket probed,
    * both pools are then the whole corpus). The query joins the index
    * as a one-row frame; everything after the pool is the bounded
    * driver bounce. */
  def mmrSelectIvf(corpus: DataFrame, queryVec: Seq[Double], k: Int,
      poolN: Int = 256, wRel: Long = 7L, wDiv: Long = 3L,
      kmK: Int = KmK, iters: Int = KmIters): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qdf = Seq((-1L, queryVec.map(_.toFloat)))
      .toDF("vec_id", "embedding")
    val poolIds = topKIvfWith(corpus, kmeansCentroids(corpus, kmK, iters),
        qdf, poolN)
      .select(col("vec_id"))
    mmrSelect(corpus.join(broadcast(poolIds), Seq("vec_id"), "left_semi"),
      queryVec, k, poolN, wRel, wDiv)
  }

  /** Scale tier of [[hardNegatives]]: over-fetch `k·overFetch`
    * candidates from the k-means IVF index, drop same-label rows,
    * keep the k nearest survivors. Approximate on two axes a
    * production miner accepts — IVF probing misses out-of-bucket
    * candidates, and a label-dense neighborhood can eat the
    * over-fetch — in exchange for the probe touching ~nProbe/K of the
    * corpus instead of all of it. The label re-join broadcasts the
    * (|queries|·k·overFetch)-row candidate list against the corpus
    * label projection, so the scan stays map-side. */
  def hardNegativesIvf(corpus: DataFrame, queries: DataFrame, k: Int,
      overFetch: Int = 4): DataFrame = {
    val labels = corpus.select(col("vec_id"), col("label"))
    val ql = broadcast(queries.select(col("vec_id").as("qid"),
      col("label").as("qlabel")))
    broadcast(topKIvfKmeans(corpus, queries, k * overFetch))
      .join(labels, Seq("vec_id"))
      .join(ql, Seq("qid"))
      .filter(col("label") =!= col("qlabel"))
      .withColumn("nrank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rank"))))
      .filter(col("nrank") <= k)
      .select(col("qid"), col("nrank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }

  /** Threshold pairs — the production entry point. Delegates to the
    * LSH-bucketed tier ([[pairsLsh]]); the O(N²) [[pairsExact]] tier is
    * the oracle baseline and refuses corpora it cannot survive. */
  def pairs(corpus: DataFrame, minCos: Double): DataFrame =
    pairsLsh(corpus, minCos)

  /** Brute-force threshold pairs — the ORACLE/BASELINE tier, O(N²) in
    * the corpus. Guarded: refuses a corpus past `maxRows` (the count is
    * one cheap action against quadratic work it prevents) so the
    * all-pairs join cannot be reached from a production path by
    * accident — at scale use [[pairsLsh]] (the [[pairs]] default). */
  def pairsExact(corpus: DataFrame, minCos: Double,
      maxRows: Long = 1L << 16): DataFrame = {
    val n = corpus.count()
    require(n <= maxRows,
      s"pairsExact is the O(N^2) oracle tier: corpus has $n rows " +
        s"(max $maxRows). Use pairsLsh/pairs for production corpora.")
    val a = corpus.select(col("vec_id").as("vec_a"), emb.as("ea"))
    val b = corpus.select(col("vec_id").as("vec_b"), emb.as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** LSH-bucketed threshold pairs: candidates share ≥1 signature band,
    * then exact cosine verification. The band self-join carries ONLY
    * (band, vec_id) — at 100 TB shipping the embedding ×NumBands through
    * that exchange would dominate the shuffle, so the distinct candidate
    * id pairs are generated first and the embeddings joined back once
    * for verification. */
  def pairsLsh(corpus: DataFrame, minCos: Double): DataFrame = {
    val vecs = corpus.select(col("vec_id"), emb)
    val bands = corpus.select(col("vec_id"),
        lshSig(emb).as("sig"))
      .select(col("vec_id"),
        posexplode(array((0 until NumBands).map(j =>
          shiftright(col("sig"), j * BandBits)
            .bitwiseAND(lit((1L << BandBits) - 1))): _*)).as(Seq("bix", "bkey")))
    val a = bands.select(col("bix"), col("bkey"), col("vec_id").as("vec_a"))
    val b = bands.select(col("bix"), col("bkey"), col("vec_id").as("vec_b"))
    val cand = a.join(b, Seq("bix", "bkey")).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
    cand
      .join(vecs.select(col("vec_id").as("vec_a"), emb.as("ea")), Seq("vec_a"))
      .join(vecs.select(col("vec_id").as("vec_b"), emb.as("eb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Semantic benchmark contamination — the embedding-space
    * complement of the n-gram decontamination ops
    * ([[Curation]]): corpus vectors within `minCos` of ANY eval
    * vector, with hit count and closest-eval cosine per contaminated
    * vector (paraphrased eval leakage that shares no 3-grams still
    * sits next to its source in embedding space). Same LSH-bucket
    * shape as [[pairsLsh]], cross-frame: the band join carries ONLY
    * (band, id) pairs — at 100 TB the corpus embeddings never ride
    * the candidate exchange — and the embeddings join back once for
    * the exact cosine verify. Eval-side bands are |eval|-sized
    * (benchmarks are small); candidates are band-collision-bounded,
    * never |corpus|·|eval|. Returns (vec_id, n_hits, max_cos). */
  def semanticContamination(corpus: DataFrame, evalVecs: DataFrame,
      minCos: Double): DataFrame = {
    val cb = corpus.select(col("vec_id"), lshSig(emb).as("sig"))
    val ebv = evalVecs.select(col("vec_id"), lshSig(emb).as("sig"))
    def bands(df: DataFrame, idAs: String) = df
      .select(col("vec_id").as(idAs),
        posexplode(array((0 until NumBands).map(j =>
          shiftright(col("sig"), j * BandBits)
            .bitwiseAND(lit((1L << BandBits) - 1))): _*)).as(Seq("bix", "bkey")))
      .select(col(idAs), col("bix"), col("bkey"))
    val cand = bands(cb, "vec_id").join(bands(ebv, "eid"), Seq("bix", "bkey"))
      .select(col("vec_id"), col("eid")).distinct()
    cand
      .join(corpus.select(col("vec_id"), emb.as("ea")), Seq("vec_id"))
      .join(evalVecs.select(col("vec_id").as("eid"), emb.as("eb")), Seq("eid"))
      .select(col("vec_id"), cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= minCos)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_hits"),
        graft.ts.Round6.r6(max(col("cos"))).as("max_cos"))
  }

  /** IVF (inverted-file) ANN: assign every vector to its nearest
    * centroid once (the "index build" — one broadcast pass over the
    * corpus), then answer queries by probing only the `nProbe` nearest
    * centroid buckets. At 100 TB: centroids are always broadcastable
    * (K ≪ corpus), the assignment is a map-side pass, queries touch
    * ~nProbe/K of the data. Centroid choice here is a deterministic
    * sample (first K vec_ids) so the oracle can replay it — a
    * production build would k-means those seeds; the partitioning,
    * probing, and ranking machinery is identical either way. */
  val IvfK = 16
  val IvfProbe = 4

  /** Collect a K×dim centroid frame to the driver-side (cid, cent)
    * list the native assignment expression takes — centroids are
    * always tiny by contract, and the k-means rounds bounce them
    * through the driver anyway. */
  private def collectCentroidSeq(centroids: DataFrame, idCol: String,
      vecCol: String): Seq[(Long, Seq[Double])] =
    centroids.select(col(idCol).cast("long"),
        transform(col(vecCol), _.cast("double")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)

  /** (vec_id, embedding, cid) — nearest-centroid assignment, one
    * map-side pass per vector (same native expression as the k-means
    * rounds). */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val centSeq = collectCentroidSeq(centroids, "vec_id", "embedding")
    corpus.select(col("vec_id"), emb,
      graft.functions.VectorExprs.nearestCentroid(emb, centSeq)
        .getField("cid").as("cid"))
  }

  /** IVF top-k with first-K-ids centroid seeds (oracle-replayable). */
  def topKIvf(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    topKIvfWith(corpus,
      corpus.filter(col("vec_id") < IvfK)
        .select(col("vec_id").cast("long").as("cid"), emb.as("cent")),
      queries, k)

  /** IVF top-k seeded by [[kmeansCentroids]] — the production index
    * build: k-means buckets are tighter than arbitrary seeds, so the
    * same nProbe recalls more. Still fully oracle-replayable since the
    * k-means itself is. */
  def topKIvfKmeans(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    topKIvfWith(corpus, kmeansCentroids(corpus), queries, k)

  /** IVF top-k against an arbitrary centroid frame (cid, cent): assign
    * every corpus vector to its nearest centroid once, answer queries
    * by probing the nProbe nearest buckets, exact cosine rank within. */
  def topKIvfWith(corpus: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    // centroids are K×dim — collect once; they feed (a) the corpus
    // assignment as plan-time constants of the native expression (one
    // map-side pass, no N·K row materialization) and (b) the tiny
    // query-probe cross join below
    val centSeq = collectCentroidSeq(centroids, "cid", "cent")
    val assigned = corpus.select(col("vec_id"), emb,
      graft.functions.VectorExprs.nearestCentroid(emb, centSeq)
        .getField("cid").as("cid"))
    probeAssigned(assigned, centroids, queries, k)
  }

  /** The serve half of IVF: probe a PRECOMPUTED (vec_id, embedding,
    * cid) assignment with the centroid frame — the path a published
    * index takes, where the build pass already paid for assignment. */
  def probeAssigned(assigned: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val cents = broadcast(centroids.select(col("cid"), col("cent")))
    // per query: nProbe nearest centroid ids
    val q = queries.select(col("vec_id").as("qid"), emb.as("qemb"))
    val probes = q.crossJoin(cents)
      .select(col("qid"), col("qemb"), col("cid"),
        cosine(col("qemb"), col("cent")).as("ccos"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid"))))
      .filter(col("__r") <= IvfProbe)
      .select(col("qid"), col("qemb"), col("cid"))
    // candidates: corpus vectors in probed buckets; rank exact.
    // probes is |queries|·nProbe rows — ALWAYS broadcastable — but sits
    // behind window+crossJoin lineage the planner can't size, so left
    // alone this becomes a SortMergeJoin that shuffles the whole
    // assigned corpus on cid (skew-prone: bucket sizes are uneven).
    // Broadcasting keeps the corpus-side pass map-side at any scale.
    broadcast(probes).join(assigned.withColumnRenamed("vec_id", "cand"), Seq("cid"))
      .filter(col("cand") =!= col("qid"))
      .select(col("qid"), col("cand").as("vec_id"),
        cosine(col("qemb"), emb).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }

  /** Build and atomically publish an IVF index: k-means centroids and
    * the centroid-assigned corpus land as ONE [[Snapshot]] version
    * (tables `centroids`, `assigned`), so a serving reader can never
    * pair new centroids with an old assignment. This is the
    * build-once/serve-many split every ANN deployment runs: the
    * expensive passes (k-means rounds + corpus assignment) happen once
    * per index build; [[topKIvfServe]] then pays only the ~nProbe/K
    * probe per query batch. Returns the committed version. */
  def publishIvfIndex(corpus: DataFrame, dir: String, k: Int = KmK,
      iters: Int = KmIters): Long = {
    val cents = kmeansCentroids(corpus, k, iters)
    val centSeq = collectCentroidSeq(cents, "cid", "cent")
    val assigned = corpus.select(col("vec_id"), emb,
      graft.functions.VectorExprs.nearestCentroid(emb, centSeq)
        .getField("cid").as("cid"))
    Snapshot.publishTables(Seq("centroids" -> cents, "assigned" -> assigned), dir)
  }

  /** Serve top-k queries from a published IVF index (latest version,
    * or pinned). Result-identical to [[topKIvfKmeans]] over the corpus
    * the index was built from — the spec pins that equality. The
    * version resolves ONCE for both tables (per-read latest
    * resolution could pair new centroids with an old assignment when
    * a rebuild lands mid-serve). */
  def topKIvfServe(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(Snapshot.latestVersion(spark, dir))
    probeAssigned(Snapshot.readTable(spark, dir, "assigned", v),
      Snapshot.readTable(spark, dir, "centroids", v), queries, k)
  }

  /** Incremental index update: assign `newVecs` with the PUBLISHED
    * centroids and publish (old assignment ∪ new) as the next version.
    * The standard IVF freshness trade — appends reuse the existing
    * quantizer, so only the delta pays an assignment pass (the old
    * corpus is not rescanned; its parquet is re-linked through the
    * union scan), at the cost of centroid drift as the appended
    * distribution diverges; rebuild with [[publishIvfIndex]] when the
    * [[ivfRecall]] gauge says so. Serving sees old+new atomically. */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession,
      newVecs: DataFrame, dir: String): Long = {
    // pin ONE version for both inputs — same torn-version guard as
    // [[appendToPqIndex]]
    val v = Snapshot.latestVersion(spark, dir)
    val cents = Snapshot.readTable(spark, dir, "centroids", v)
    val centSeq = collectCentroidSeq(cents, "cid", "cent")
    val fresh = newVecs.select(col("vec_id"), emb,
      graft.functions.VectorExprs.nearestCentroid(emb, centSeq)
        .getField("cid").as("cid"))
    val merged = Snapshot.readTable(spark, dir, "assigned", v)
      .unionByName(fresh)
    Snapshot.publishTables(Seq("centroids" -> cents, "assigned" -> merged), dir)
  }

  /** Lloyd's k-means over the embedding column — the clustering
    * primitive a training-data pipeline needs for corpus curation
    * (cluster-balanced sampling, semantic cohorts) and the production
    * seeding path for [[topKIvf]] centroids (whose deterministic
    * first-K seeding the oracle replays; this IS the k-means those
    * seeds feed at 100 TB).
    *
    * Cross-engine determinism: vectors are integer-quantized
    * (floor(x·10⁴+0.5), as [[lshSig]]), so per-cluster element sums are
    * exact integers; the only floats — centroid means (exact-int ÷
    * count) and cosines (index-order folds) — are computed by the
    * identical expression in both engines. Assignment ranks by
    * (cos desc, cid) so ties break deterministically; the iteration
    * count is FIXED (no convergence test) so the DuckDB oracle unrolls
    * the loop as CTEs.
    *
    * Scale shape: centroids are K×dim — always broadcast; assignment is
    * a map-side pass over the corpus; the update shuffles only K·dim
    * map-side-combined (cid, element) partial sums, independent of
    * corpus size; centroids round-trip through the driver between
    * rounds (K×dim doubles — the same "driver touches only tiny state"
    * rule as [[NearDup.clusters]]). */
  val KmK = 8
  val KmIters = 3

  /** Contract bound of the FLAT k-means/SemDeDup tier. The flat tier
    * bounces K×dim doubles through the driver every Lloyd round and
    * scans all K centroids per corpus row ([[kmeansCentroidsSeq]],
    * [[kmeansAssign]]) — legitimate to ~tens of thousands of clusters
    * (64 k × 64 dims ≈ 34 MB driver state, the same order as the
    * broadcast gates here), and quietly catastrophic at the K ≈ 10⁶ a
    * 10⁹-vector corpus needs. Flat entries `require` K ≤ this and
    * point at the two-level tier; [[kmeansAuto]]/[[semDedupAuto]]
    * dispatch on it so callers need not pick a tier at all. */
  val FlatKMax = 65536

  /** Nearest-centroid assignment of quantized vectors:
    * (vec_id, qv, cid, cos) — one map-side pass per vector via
    * [[graft.functions.NearestCentroidExpr]] (centroids are K×dim,
    * always driver-held between Lloyd rounds anyway). The expression
    * computes the self-norm once per vector and each dot in index
    * order, so cos values (and the oracle's) are bit-identical to the
    * crossJoin→window formulation it replaces — which it also beats by
    * never materializing or sort-ranking the N·K pair rows. */
  private def kmeansAssign(qv: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame = {
    val nc = graft.functions.VectorExprs.nearestCentroid(
      col("qv"), cents.sortBy(_._1))
    qv.select(col("vec_id"), col("qv"), nc.as("__nc"))
      .select(col("vec_id"), col("qv"),
        col("__nc").getField("cid").as("cid"),
        col("__nc").getField("cos").as("cos"))
  }

  /** Driver-side centroid list (cid, cent) after `iters` Lloyd rounds
    * from first-K seeds — K×dim doubles, the state the rounds bounce
    * through the driver regardless.
    *
    * FLAT TIER: contract-bounded at K ≤ [[FlatKMax]] (throws past it).
    * For larger K use [[twoLevelIndex]], or let [[kmeansAuto]] /
    * [[semDedupAuto]] dispatch the tier for you. */
  def kmeansCentroidsSeq(corpus: DataFrame, k: Int = KmK,
      iters: Int = KmIters): Seq[(Long, Seq[Double])] = {
    require(k <= FlatKMax,
      s"flat k-means is contract-bounded at K <= $FlatKMax (K x dim driver " +
        "state per Lloyd round, K-wide scan per row); at larger K use the " +
        "two-level tier (twoLevelIndex / semDedupScalable) or the " +
        "kmeansAuto / semDedupAuto dispatchers")
    val spark = corpus.sparkSession
    import spark.implicits._
    // every Lloyd round must rescan the corpus by nature; a LAZY
    // localCheckpoint means each rescan reads the blocks instead of
    // re-paying the upstream lineage (parquet scan + quantize — or
    // worse, a constructed corpus's whole build).
    // Storage is MEMORY_AND_DISK (localCheckpoint's default), so an
    // over-memory corpus spills instead of failing.
    val qv = corpus.select(col("vec_id"), qvec(emb).as("qv"))
      .localCheckpoint(false)
    try {
      var cents: Seq[(Long, Seq[Double])] = qv.filter(col("vec_id") < k)
        .select(col("vec_id").cast("long").as("cid"),
          transform(col("qv"), x => x.cast("double")).as("cent"))
        .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
      if (iters > 0 && cents.nonEmpty) {
        // The training rounds run at the RDD level (the classic
        // distributed-Lloyd shape: broadcast centroids + one
        // treeAggregate of exact per-centroid long sums per round).
        // The per-round DATA movement is identical to the
        // groupBy-on-cid form this replaces — one map-side-combined
        // K×dim reduction — but a round costs ZERO driver-side
        // Catalyst work: the deserializer plan below is analyzed once,
        // and each round is just a broadcast + one job on the same RDD
        // (profiled: the iterative sim_* queries' wall−jobs gap was
        // per-round plan analysis, not executor time). Assignment math
        // is the [[graft.functions.NearestCentroidExpr]] twin op for
        // op, and long sums are exact, so the centroids — and every
        // oracle row downstream — are bit-identical to the plan form.
        val vecs = qv.select(col("qv")).as[Array[Long]].rdd
        (1 to iters).foreach { _ => cents = lloydRoundRdd(vecs, cents) }
      }
      cents
    } finally { freeCheckpoint(qv) }
  }

  /** One flat-tier Lloyd round: broadcast the (cid-ascending) centroid
    * matrix, assign each vector by double-precision cosine — the exact
    * op order, strict-improvement tie-break and NaN-first rule of
    * [[graft.functions.NearestCentroidExpr]] — and treeAggregate the
    * per-centroid element sums (exact longs) and counts. Division
    * matches the plan form's `cast("double") / n` bit for bit. Empty
    * centroids drop, like the groupBy that emitted no row. Malformed
    * vectors (wrong length) fail loudly, like the null-cid encoder
    * crash of the plan form. */
  private def lloydRoundRdd(vecs: org.apache.spark.rdd.RDD[Array[Long]],
      cents: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double])] = {
    val k = cents.length
    val dim = cents.head._2.length
    val cidArr = cents.map(_._1).toArray
    val flat = cents.flatMap(_._2).toArray
    val norms = cents.map { c =>
      var a = 0.0; var i = 0
      while (i < c._2.length) { a += c._2(i) * c._2(i); i += 1 }
      math.sqrt(a)
    }.toArray
    val bc = vecs.sparkContext.broadcast((flat, norms))
    try {
      val (sums, counts) = vecs.treeAggregate(
        (new Array[Long](k * dim), new Array[Long](k)))(
        seqOp = { case ((s, n), v) =>
          require(v != null && v.length == dim,
            s"malformed quantized vector (dim ${if (v == null) -1 else v.length} != $dim)")
          val (fl, nm) = bc.value
          var qacc = 0.0
          var i = 0
          while (i < dim) { val x = v(i).toDouble; qacc += x * x; i += 1 }
          val qn = math.sqrt(qacc)
          var best = 0
          var bestCos = 0.0
          var c = 0
          while (c < k) {
            var dacc = 0.0
            i = 0
            while (i < dim) { dacc += v(i).toDouble * fl(c * dim + i); i += 1 }
            val cos = dacc / (qn * nm(c))
            val better =
              if (c == 0) true
              else if (cos.isNaN != bestCos.isNaN) cos.isNaN
              else cos > bestCos
            if (better) { best = c; bestCos = cos }
            c += 1
          }
          i = 0
          while (i < dim) { s(best * dim + i) += v(i); i += 1 }
          n(best) += 1
          (s, n)
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var i = 0
          while (i < s1.length) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < n1.length) { n1(i) += n2(i); i += 1 }
          (s1, n1)
        })
      (0 until k).iterator.filter(counts(_) > 0).map { c =>
        val n = counts(c)
        (cidArr(c),
          (0 until dim).map(i => sums(c * dim + i).toDouble / n.toDouble)
            : Seq[Double])
      }.toSeq
    } finally { bc.destroy(); () }
  }

  /** Centroid frame (cid, cent: array<double>) after `iters` Lloyd
    * rounds from first-K seeds. FLAT TIER: K ≤ [[FlatKMax]] (throws
    * past it) — see [[kmeansAuto]] for the K-dispatched entry. */
  def kmeansCentroids(corpus: DataFrame, k: Int = KmK,
      iters: Int = KmIters): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    kmeansCentroidsSeq(corpus, k, iters).toDF("cid", "cent")
  }

  /** (vec_id, cid, cos) assignment after `iters` Lloyd rounds.
    * FLAT TIER: K ≤ [[FlatKMax]] (throws past it) — callers that
    * cannot bound K should use [[kmeansAuto]], which routes larger K
    * to the √K two-level substrate. */
  def kmeans(corpus: DataFrame, k: Int = KmK, iters: Int = KmIters): DataFrame =
    kmeansAssign(corpus.select(col("vec_id"), qvec(emb).as("qv")),
      kmeansCentroidsSeq(corpus, k, iters))
      .select(col("vec_id"), col("cid"), col("cos"))

  /** √K factorization for the two-level tier: (coarseK, fineK) with
    * coarseK·fineK ≥ k — cluster capacity, like flat K where some of
    * the K clusters may end up empty. */
  private def twoLevelFactor(k: Int): (Int, Int) = {
    val coarseK = math.ceil(math.sqrt(k.toDouble)).toInt
    (coarseK, math.ceil(k.toDouble / coarseK).toInt)
  }

  /** K-DISPATCHED clustering entry — callers that just want "cluster
    * into ~k groups" without picking a tier. K ≤ [[FlatKMax]] runs the
    * flat tier (one centroid list, exact K); past it the flat
    * contract breaks (see [[FlatKMax]]) and the corpus routes to the
    * two-level substrate at the √k factorization, whose cid space is
    * a CAPACITY ≥ k (empty cells allowed, exactly as flat K allows
    * empty clusters). Returns (vec_id, cid). */
  def kmeansAuto(corpus: DataFrame, k: Int, iters: Int = KmIters): DataFrame =
    if (k <= FlatKMax)
      kmeans(corpus, k, iters).select(col("vec_id"), col("cid"))
    else {
      val (coarseK, fineK) = twoLevelFactor(k)
      // Same eager/leak-free contract as [[twoLevelAssign]], but
      // checkpoint only the NARROW (vec_id, cid) frame this entry
      // returns: at the large-K regime this dispatcher exists for, the
      // corpus is huge and pinning the full embedding matrix (~dim·8
      // bytes/row, ~30× the needed width) in executor block storage
      // just to drop the column immediately would be the real cost.
      val (assigned, release) = twoLevelAssignScoped(corpus, coarseK,
        fineK, coarseIters = iters, fineIters = math.max(1, iters - 1))
      val eager = assigned.select(col("vec_id"), col("cid"))
        .localCheckpoint(true)
      release()
      eager
    }

  /** K-dispatched [[semDedup]]: flat at K ≤ [[FlatKMax]], the
    * hash-capped two-level [[semDedupScalable]] past it — so "dedup
    * this corpus at the K its size needs" never lands on the tier
    * whose contract its K breaks. Returns survivors (vec_id, cid). */
  def semDedupAuto(corpus: DataFrame, eps: Double, k: Int = KmK,
      iters: Int = KmIters, capTarget: Int = 1024,
      levels: Int = 2): DataFrame =
    if (k <= FlatKMax) semDedup(corpus, eps, k, iters)
    else {
      val (coarseK, fineK) = twoLevelFactor(k)
      semDedupScalable(corpus, eps, coarseK, fineK, coarseIters = iters,
        fineIters = math.max(1, iters - 1), capTarget, levels)
    }

  /** Per-dimension int8 scales over a corpus: max|x|/127, unit scale
    * for all-zero dimensions. One dim-bounded aggregate (posexplode →
    * groupBy(dim) partial-aggregates map-side; the shuffle carries
    * ≤ dim rows per partition) + driver bounce, the contract-bounded
    * K×dim pattern k-means uses — shared by [[quantizeInt8]],
    * [[topKQuantized]] and [[topKIvfQ8]] via their `scales` parameter,
    * so an index build that quantizes AND serves pays it once. */
  def int8Scales(vecs: DataFrame): Seq[Double] =
    vecs.select(posexplode(emb.cast("array<double>")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(max(abs(col("x"))).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
      .map { case (_, m) => if (m == 0.0) 1.0 else m / 127.0 }.toSeq

  /** One quantized element: `floor(x/s + 0.5)` (the cross-engine-
    * deterministic rounding idiom, [[graft.ts.Round6]]) clamped to
    * [−127, 127]. NULL-STRICT: a null x or s (zip_with's padding when
    * a vector's length mismatches the corpus dimensionality) yields
    * null, not a clamped 127 — Spark's least/greatest SKIP nulls, so
    * the naive clamp would fabricate max-magnitude elements for
    * missing dimensions. The null-on-mismatch convention is a LIBRARY
    * contract pinned by PropertySpec; the DuckDB twins assume the
    * embeddings table's uniform dimensionality (their per-vector
    * generate_series never pads), which the fixtures guarantee. */
  private def q8Elem(x: Column, s: Column): Column =
    when(x.isNotNull && s.isNotNull,
      greatest(lit(-127L), least(lit(127L),
        floor(x.cast("double") / s + 0.5d).cast("long"))))

  /** Clamped int8 quantization of an embedding column against a
    * per-dimension scales literal ([[int8Scales]]). */
  private def q8Arr(c: Column, sc: Column): Column =
    zip_with(c, sc, q8Elem)

  /** Exact integer dot product of two quantized vectors. */
  private def q8Dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Symmetric int8 scalar quantization of the embedding column — the
    * memory step a serving-scale ANN index runs before anything else
    * (4× smaller vectors, integer dot products). Scales per
    * [[int8Scales]] (or pass precomputed ones); rounding per
    * [[q8Elem]], exact in both engines.
    *
    * Returns (vec_id, q, qnorm2, mse): `q` the int8-domain array,
    * `qnorm2 = Σq²` an exact integer invariant of the whole vector,
    * `mse` the per-vector dequantization error (array-order fold).
    * A vector whose length differs from the corpus dimensionality
    * yields null elements AND null invariants (zip_with null-pads and
    * [[q8Elem]] is null-strict) rather than silently truncating — the
    * same null-on-mismatch convention as
    * [[graft.functions.NearestCentroidExpr]]. */
  def quantizeInt8(vecs: DataFrame,
      scales: Option[Seq[Double]] = None): DataFrame = {
    val sc = typedlit(scales.getOrElse(int8Scales(vecs)))
    val q = q8Arr(emb, sc)
    val err = zip_with(emb, sc,
      (x, s) => pow(x.cast("double") - q8Elem(x, s) * s, 2))
    vecs.select(col("vec_id"), q.as("q"),
      aggregate(q, lit(0L), (acc, v) => acc + v * v).as("qnorm2"),
      (aggregate(err, lit(0.0), (acc, v) => acc + v) /
        size(emb).cast("double")).as("mse"))
  }

  /** Top-k over the QUANTIZED tier: rank by the symmetric int8×int8
    * dot product — what a serving index actually scans (4× less
    * memory traffic than float32, and the score is an exact integer,
    * so ranking is bit-deterministic on any engine with no float
    * tie-break hazards). Scales come from the CORPUS (the index-build
    * invariant); queries quantize against them at probe time. Same
    * plan shape as [[topKExact]]: the query side broadcasts, the
    * corpus streams map-side, `TakeOrdered` per query — no shuffle of
    * the big side. Returns (qid, rank, vec_id, qdot). */
  def topKQuantized(corpus: DataFrame, queries: DataFrame, k: Int,
      scales: Option[Seq[Double]] = None): DataFrame = {
    val sc = typedlit(scales.getOrElse(int8Scales(corpus)))
    def q8(c: Column): Column = q8Arr(c, sc)
    val q = broadcast(queries.select(col("vec_id").as("qid"), q8(emb).as("qq")))
    val scored = corpus.select(col("vec_id"), q8(emb).as("cq")).crossJoin(q)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        q8Dot(col("qq"), col("cq")).as("qdot"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("qdot").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("qdot"))
  }

  /** IVF over the QUANTIZED tier — the production serving configuration
    * (FAISS's IVF+SQ8 shape): the index build assigns every vector to
    * its nearest centroid AND stores it int8-quantized; queries probe
    * the nProbe nearest buckets (float centroid cosine — index
    * metadata, K-bounded) and scan only those buckets with the exact
    * integer int8×int8 dot. Composes [[topKIvfWith]]'s bucket
    * machinery with [[topKQuantized]]'s scan: per-query work drops to
    * ~nProbe/K of the corpus AND each scanned vector is 4× cheaper,
    * with bit-deterministic ranking. First-K centroid seeds, like
    * [[topKIvf]], so the oracle replays the whole index build.
    * Returns (qid, rank, vec_id, qdot). */
  def topKIvfQ8(corpus: DataFrame, queries: DataFrame, k: Int,
      scales: Option[Seq[Double]] = None): DataFrame = {
    val centroids = corpus.filter(col("vec_id") < IvfK)
      .select(col("vec_id").cast("long").as("cid"), emb.as("cent"))
    val centSeq = collectCentroidSeq(centroids, "cid", "cent")
    val cents = broadcast(centroids)
    val sc = typedlit(scales.getOrElse(int8Scales(corpus)))
    val assigned = corpus.select(col("vec_id"), q8Arr(emb, sc).as("cq"),
      graft.functions.VectorExprs.nearestCentroid(emb, centSeq)
        .getField("cid").as("cid"))
    val probes = queries.select(col("vec_id").as("qid"), emb.as("qemb"))
      .crossJoin(cents)
      .select(col("qid"), col("qemb"), col("cid"),
        cosine(col("qemb"), col("cent")).as("ccos"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid"))))
      .filter(col("__r") <= IvfProbe)
      .select(col("qid"), q8Arr(col("qemb"), sc).as("qq"), col("cid"))
    broadcast(probes).join(assigned.withColumnRenamed("vec_id", "cand"), Seq("cid"))
      .filter(col("cand") =!= col("qid"))
      .select(col("qid"), col("cand").as("vec_id"),
        q8Dot(col("qq"), col("cq")).as("qdot"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("qdot").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("qdot"))
  }

  // ---- DuckDB oracle builders ----

  /** DuckDB twin of [[topKQuantized]] (requires [[quantizeInt8Sql]]'s
    * `dims`); defines `rankedq(qid, rank, vec_id, qdot)`. */
  def topKQuantizedSql(queryPred: String): String =
    s"""q8 AS (
       |  SELECT vec_id, list(
       |    greatest(-127, least(127,
       |      CAST(floor(CAST(embedding[d.i] AS DOUBLE) / d.s + 0.5) AS BIGINT)))
       |    ORDER BY d.i) AS qv
       |  FROM embeddings, dims d GROUP BY vec_id
       |), scoredq AS (
       |  SELECT q.vec_id AS qid, e.vec_id,
       |    CAST(list_sum([q.qv[i] * e.qv[i]
       |      for i in generate_series(1, len(q.qv))]) AS BIGINT) AS qdot
       |  FROM q8 e, (SELECT * FROM q8 WHERE $queryPred) q
       |  WHERE e.vec_id <> q.vec_id
       |), rankedq AS (
       |  SELECT qid, vec_id, qdot,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY qdot DESC, vec_id) AS rank
       |  FROM scoredq
       |)""".stripMargin

  /** DuckDB twin of [[topKIvfQ8]] (requires [[quantizeInt8Sql]]'s
    * `dims` and [[topKQuantizedSql]]'s `q8`); defines
    * `rankedivq(qid, rank, vec_id, qdot)`. */
  def topKIvfQ8Sql(queryPred: String): String =
    s"""centsq AS (
       |  SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < $IvfK
       |), assignedq AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosineSql("e.embedding", "c.cemb")} DESC, c.cid) AS r
       |    FROM embeddings e, centsq c)
       |  WHERE r = 1
       |), probesq AS (
       |  SELECT qid, cid FROM (
       |    SELECT q.vec_id AS qid, c.cid,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${cosineSql("q.embedding", "c.cemb")} DESC, c.cid) AS r
       |    FROM embeddings q, centsq c WHERE $queryPred)
       |  WHERE r <= $IvfProbe
       |), rankedivq AS (
       |  SELECT qid, vec_id, qdot,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY qdot DESC, vec_id) AS rank
       |  FROM (
       |    SELECT p.qid, a.vec_id,
       |      CAST(list_sum([qv.qv[i] * cv.qv[i]
       |        for i in generate_series(1, len(qv.qv))]) AS BIGINT) AS qdot
       |    FROM probesq p
       |    JOIN assignedq a USING (cid)
       |    JOIN q8 qv ON qv.vec_id = p.qid
       |    JOIN q8 cv ON cv.vec_id = a.vec_id
       |    WHERE a.vec_id <> p.qid)
       |)""".stripMargin

  /** DuckDB twin of [[quantizeInt8]]; defines
    * `outq(vec_id, qnorm2, mse)` (the q array itself is pinned through
    * qnorm2 — an exact integer functional of every element). */
  def quantizeInt8Sql: String =
    s"""ex AS (
       |  SELECT vec_id, t.i, CAST(embedding[t.i] AS DOUBLE) AS x
       |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
       |), dims AS (
       |  SELECT i, CASE WHEN max(abs(x)) = 0 THEN 1.0
       |                 ELSE max(abs(x)) / 127.0 END AS s
       |  FROM ex GROUP BY i
       |), qe AS (
       |  SELECT vec_id, x, s,
       |    greatest(-127, least(127, CAST(floor(x / s + 0.5) AS BIGINT))) AS qv
       |  FROM ex JOIN dims USING (i)
       |), outq AS (
       |  SELECT vec_id, CAST(sum(qv * qv) AS BIGINT) AS qnorm2,
       |    sum((x - qv * s) * (x - qv * s)) / count(*) AS mse
       |  FROM qe GROUP BY vec_id
       |)""".stripMargin

  // ---- Product quantization (PQ): the ANN memory tier past SQ8 ----
  //
  // SQ8 shrinks vectors 4x; a 100 TB corpus (10^9-10^10 vectors) wants
  // the next step: PQ (Jégou et al. 2011, "Product Quantization for
  // Nearest Neighbor Search") splits each vector into PqM subvectors
  // and stores only each subvector's nearest-codeword id — PqM·log2
  // (PqKsub) bits per vector (here 8 codes x 4 bits = 4 BYTES against
  // Dim x 4 = 256 float bytes, a 64x reduction), which is what lets a
  // serving tier hold the whole index in executor memory. Queries
  // score candidates ASYMMETRICALLY (ADC): one M x Ksub lookup table
  // of <query subvector, codeword> dots per query, then each
  // candidate's score is M table lookups — no decode, no float vector
  // traffic.

  /** Subspace count (Dim/PqM dims each). */
  val PqM = 8
  /** Codewords per subspace (4-bit codes). */
  val PqKsub = 16
  /** Dims per subspace. */
  val PqDsub: Int = Dim / PqM
  /** Lloyd rounds per subspace codebook. */
  val PqIters = 2

  /** Squared L2 between an integer-quantized subvector and a double
    * codeword — sequential element-order fold (cross-engine exact). */
  private def pqL2(sv: Column, cent: Column): Column =
    aggregate(zip_with(sv, cent,
      (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (a, v) => a + v)

  /** Driver-held codebooks as one nested literal:
    * books[sub] = array<struct<cid, cent>> (M·Ksub·Dsub doubles —
    * exactly the K x dim driver-state contract k-means already has). */
  private def pqBooksLit(books: Seq[Seq[(Long, Seq[Double])]]): Column =
    array(books.map(sub => array(sub.map { case (cid, cent) =>
      struct(lit(cid).as("cid"), typedlit(cent).as("cent")) }: _*)): _*)

  /** Nearest codeword of one subspace: struct(d, cid) via `array_min`
    * over (distance asc, cid asc) — the same deterministic tie-break
    * as the k-means SQL twins' `ORDER BY d ASC, cid` window. */
  private def pqNearestFull(sv: Column, cands: Column): Column =
    array_min(transform(cands, c => struct(
      pqL2(sv, c.getField("cent")).as("d"),
      c.getField("cid").as("cid"))))

  /** HOF reference formulation of the fused
    * [[graft.functions.VectorExprs.pqEncode]] — array<struct<d, cid>>
    * over the M subspaces. Kept (like [[cosineHof]]/[[lshSigHof]]) as
    * the formulation the native expression is spec-tested
    * bit-identical against; the production paths use the native
    * expression (HOFs are CodegenFallback and materialize a
    * Ksub-struct array per subspace per row). */
  def pqBestHof(qv: Column,
      books: Seq[Seq[(Long, Seq[Double])]]): Column = {
    val m = books.size; val dsub = Dim / m
    val bl = pqBooksLit(books)
    array((0 until m).map(s =>
      pqNearestFull(slice(qv, s * dsub + 1, dsub),
        element_at(bl, lit(s + 1)))): _*)
  }

  /** The PQ code array of one integer-quantized vector — one fused
    * native pass over all M subspaces. */
  private def pqCodeCol(qv: Column,
      books: Seq[Seq[(Long, Seq[Double])]]): Column =
    graft.functions.VectorExprs.pqEncode(qv, books).getField("code")

  /** Train the PQ codebooks: per subspace, `ksub` codewords after
    * `iters` Lloyd rounds (squared-L2 metric in the integer-quantized
    * domain, first-ksub seeds, empty codewords dropped — exactly the
    * flat k-means conventions, so [[pqSql]] replays bit-identically).
    * One corpus scan per round covers ALL subspaces: the subvector
    * explode is map-side, the update one map-side-combined
    * (sub, code, dim) aggregate, and the driver bounce is
    * M·Ksub·Dsub doubles — same contract as [[kmeansCentroidsSeq]]
    * at a fraction of the width. Returns books(sub) = (cid, cent)
    * sorted by cid. */
  def pqCodebooks(corpus: DataFrame, m: Int = PqM, ksub: Int = PqKsub,
      iters: Int = PqIters): Seq[Seq[(Long, Seq[Double])]] =
    pqCodebooksQv(corpus.select(col("vec_id"), qvec(emb).as("qv")),
      m, ksub, iters)

  /** [[pqCodebooks]] over an ALREADY-QUANTIZED (vec_id, qv) frame —
    * the entry the residual tier trains through (its qv is a long
    * DIFFERENCE, not a fresh quantization; the Lloyd machinery is
    * domain-agnostic). */
  def pqCodebooksQv(qvFrame: DataFrame, m: Int = PqM, ksub: Int = PqKsub,
      iters: Int = PqIters): Seq[Seq[(Long, Seq[Double])]] = {
    // lazy localCheckpoint of the NARROW quantized frame (N×Dim
    // longs), not the ×M subvector explode: each round re-derives its
    // view from the blocks AND plans against an RDD leaf instead of
    // re-analyzing the corpus construction per Lloyd round (the
    // kmeansCentroidsSeq lesson — the residual tier's qv embeds a
    // whole coarse-assignment build)
    val qvf = qvFrame.select(col("vec_id"), col("qv"))
      .localCheckpoint(false)
    try pqCodebooksQvOn(qvf, m, ksub, iters)
    finally freeCheckpoint(qvf)
  }

  /** [[pqCodebooksQv]] over a frame whose rescans are ALREADY cheap
    * (checkpointed/cached by the caller, who owns its lifecycle) — the
    * residual tier trains AND encodes from one shared checkpoint
    * instead of rebuilding the coarse-assignment pipeline twice
    * (round 17). */
  private def pqCodebooksQvOn(qvf: DataFrame, m: Int, ksub: Int,
      iters: Int): Seq[Seq[(Long, Seq[Double])]] = {
    require(Dim % m == 0, s"PqM must divide Dim=$Dim")
    val dsub = Dim / m
    val spark = qvf.sparkSession
    import spark.implicits._
    def regroup(rows: Seq[(Int, Long, Seq[Double])])
        : Seq[Seq[(Long, Seq[Double])]] =
      rows.groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.map(t => (t._2, t._3)).sortBy(_._1))
    var books = regroup(qvf.filter(col("vec_id") < ksub)
      .select(col("vec_id"), posexplode(array((0 until m).map(s =>
        slice(col("qv"), s * dsub + 1, dsub)): _*)).as(Seq("sub", "sv")))
      .select(col("sub"), col("vec_id").cast("long").as("cid"),
        transform(col("sv"), x => x.cast("double")).as("cent"))
      .as[(Int, Long, Seq[Double])].collect().toSeq)
    // training rounds at the RDD level, like [[lloydRoundRdd]]: a
    // round is one broadcast of the M·Ksub·Dsub codebooks + one
    // treeAggregate of exact per-codeword long sums — zero per-round
    // Catalyst work, same data movement as the explode+groupBy form
    // this replaces. Assignment math is the
    // [[graft.functions.PqEncodeExpr]] twin op for op (squared-L2 in
    // index order, strict improvement, cid-ascending candidates), so
    // the books — and the oracle rows downstream — are bit-identical.
    if (iters > 0) {
      val vecs = qvf.select(col("qv")).as[Array[Long]].rdd
      (1 to iters).foreach { _ =>
        books = pqLloydRoundRdd(vecs, books, m, dsub)
      }
    }
    books
  }

  /** One PQ-codebook Lloyd round over the quantized-vector RDD: all M
    * subspace argmins per row with the exact op order, strict
    * improvement and cid-ascending candidate scan of
    * [[graft.functions.PqEncodeExpr]]; per-codeword element sums are
    * exact longs, division matches the plan form's
    * `cast("double") / n`. Empty codewords drop (the groupBy that
    * emitted no row); rows whose vector is malformed are SKIPPED, as
    * the explode-of-null they replace was. Returns books(sub) =
    * cid-ascending (cid, cent). */
  private def pqLloydRoundRdd(vecs: org.apache.spark.rdd.RDD[Array[Long]],
      books: Seq[Seq[(Long, Seq[Double])]], m: Int, dsub: Int)
      : Seq[Seq[(Long, Seq[Double])]] = {
    val offs = books.map(_.length).scanLeft(0)(_ + _).toArray
    val cidArr = books.flatMap(_.map(_._1)).toArray
    val flat = books.flatMap(_.flatMap(_._2)).toArray
    val total = offs(m)
    val dim = m * dsub
    val bc = vecs.sparkContext.broadcast((offs, flat))
    try {
      val (sums, counts) = vecs.treeAggregate(
        (new Array[Long](total * dsub), new Array[Long](total)))(
        seqOp = { case (acc @ (s, n), v) =>
          if (v != null && v.length == dim) {
            val (of, fl) = bc.value
            var sub = 0
            while (sub < m) {
              var bestIdx = of(sub)
              var bestD = 0.0
              var first = true
              var c = of(sub)
              while (c < of(sub + 1)) {
                var dacc = 0.0
                var i = 0
                while (i < dsub) {
                  val diff = v(sub * dsub + i).toDouble - fl(c * dsub + i)
                  dacc += diff * diff
                  i += 1
                }
                if (first || dacc < bestD) { bestIdx = c; bestD = dacc }
                first = false
                c += 1
              }
              var i = 0
              while (i < dsub) {
                s(bestIdx * dsub + i) += v(sub * dsub + i)
                i += 1
              }
              n(bestIdx) += 1
              sub += 1
            }
          }
          acc
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var i = 0
          while (i < s1.length) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < n1.length) { n1(i) += n2(i); i += 1 }
          (s1, n1)
        })
      (0 until m).map { sub =>
        (offs(sub) until offs(sub + 1)).iterator.filter(counts(_) > 0)
          .map { c =>
            val n = counts(c)
            (cidArr(c),
              (0 until dsub).map(i => sums(c * dsub + i).toDouble / n.toDouble)
                : Seq[Double])
          }.toSeq
      }
    } finally { bc.destroy(); () }
  }

  /** PQ-encode the corpus: (vec_id, code array<long>, code_key, rerr).
    * `code_key` packs the code array into one exact BIGINT
    * (Σ code·ksubˢ — the oracle-comparable functional of every code;
    * `ksub` must be the codebook-training bound so the packing is a
    * bijection, and ksub^(m-1) must stay inside double-exact range);
    * `rerr` is the per-dim squared reconstruction error in the
    * original embedding units (the PQ quality gauge — falls as
    * M or Ksub rise). One map-side pass; nothing shuffles. */
  def pqEncode(corpus: DataFrame,
      books: Seq[Seq[(Long, Seq[Double])]],
      ksub: Int = PqKsub): DataFrame = {
    val m = books.size
    require(math.pow(ksub.toDouble, (m - 1).toDouble) <= 4.5e15,
      s"code_key packing base $ksub^${m - 1} exceeds exact-integer range")
    val base = lit(ksub.toDouble)
    val best = graft.functions.VectorExprs.pqEncode(col("qv"), books)
    corpus.select(col("vec_id"), qvec(emb).as("qv"))
      .select(col("vec_id"), best.as("best"))
      .select(col("vec_id"),
        col("best").getField("code").as("code"),
        aggregate(zip_with(
            col("best").getField("code"),
            sequence(lit(0), lit(m - 1)),
            (c, s) => c * pow(base, s.cast("double")).cast("long")),
          lit(0L), (a, v) => a + v).as("code_key"),
        (aggregate(col("best").getField("d"),
          lit(0.0), (a, v) => a + v) / lit(Dim.toDouble) / lit(1e8))
          .as("rerr"))
  }

  /** Per-query ADC lookup table: flat array of M·Ksub
    * <query subvector, codeword> dots (dead codeword slots hold 0.0 —
    * no live code ever indexes them). Computed on the (small,
    * broadcast) query side only — one fused native pass
    * ([[graft.functions.PqLutExpr]]). */
  private def pqLut(qq: Column,
      books: Seq[Seq[(Long, Seq[Double])]], ksub: Int): Column =
    graft.functions.VectorExprs.pqLut(qq, books, ksub)

  /** HOF reference formulation of [[pqLut]] — kept (like [[pqBestHof]])
    * as the composed form the native expression is spec-tested
    * bit-identical against; production serve paths use the native
    * expression (the M·Ksub per-slot HOF stack is a ~2000-node
    * projection whose per-query analysis + compile dominated the ADC
    * serve paths' driver time, and HOFs are CodegenFallback besides). */
  def pqLutHof(qq: Column,
      books: Seq[Seq[(Long, Seq[Double])]], ksub: Int): Column = {
    val m = books.size; val dsub = Dim / m
    array((0 until m).flatMap { s =>
      val live = books(s).toMap
      (0 until ksub).map { c =>
        live.get(c.toLong) match {
          case Some(cent) =>
            aggregate(zip_with(slice(qq, s * dsub + 1, dsub),
              typedlit(cent), (x, y) => x.cast("double") * y),
              lit(0.0), (a, v) => a + v)
          case None => lit(0.0)
        }
      }
    }: _*)
  }

  /** Undivided ADC sum: M lookups into the query's table, folded in
    * subspace order — still in the x10⁴·x10⁴ quantized domain, so a
    * caller can add an exact bucket term BEFORE the one rescaling
    * division (the residual tier's `(bdot + Σdq)/1e8` must be that
    * exact expression to match the oracle bit-for-bit). */
  private def adcSum(code: Column, lut: Column, m: Int,
      ksub: Int): Column =
    aggregate(zip_with(code, sequence(lit(0), lit(m - 1)),
      (c, s) => element_at(lut, (s * ksub + c + 1).cast("int"))),
      lit(0.0), (a, v) => a + v)

  /** ADC score: [[adcSum]] rescaled out of the quantized domain. */
  private def adcScore(code: Column, lut: Column, m: Int,
      ksub: Int): Column =
    adcSum(code, lut, m, ksub) / lit(1e8)

  /** Top-k over the PQ tier (asymmetric distance): queries broadcast
    * their M x Ksub LUTs, the corpus's 4-byte codes stream map-side,
    * each score is M array lookups, `WindowGroupLimit` keeps only k
    * rows per (partition, query) ahead of the rank shuffle — the scan
    * a memory-resident 100 TB serving tier actually runs. Returns
    * (qid, rank, vec_id, adot); rank by (adot desc, vec_id). */
  def topKPqAdc(corpus: DataFrame, queries: DataFrame, k: Int,
      books: Seq[Seq[(Long, Seq[Double])]],
      ksub: Int = PqKsub): DataFrame = {
    val m = books.size
    val codes = corpus.select(col("vec_id"), qvec(emb).as("qv"))
      .select(col("vec_id"), pqCodeCol(col("qv"), books).as("code"))
    val q = broadcast(queries.select(col("vec_id").as("qid"),
      pqLut(qvec(emb), books, ksub).as("lut")))
    codes.crossJoin(q).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        adcScore(col("code"), col("lut"), m, ksub).as("adot"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adot").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adot"))
  }

  /** IVF-PQ — the FAISS workhorse configuration for corpora whose
    * float vectors cannot be memory-resident: coarse IVF buckets
    * bound per-query work to ~nProbe/K of the corpus AND each
    * candidate costs M lookups on a 4-byte code. Index build = one
    * pass producing (bucket, code); first-[[IvfK]] centroid seeds so
    * the oracle replays the build. Returns (qid, rank, vec_id, adot). */
  def topKIvfPq(corpus: DataFrame, queries: DataFrame, k: Int,
      books: Seq[Seq[(Long, Seq[Double])]],
      ksub: Int = PqKsub): DataFrame = {
    val centroids = corpus.filter(col("vec_id") < IvfK)
      .select(col("vec_id").cast("long").as("cid"), emb.as("cent"))
    val centSeq = collectCentroidSeq(centroids, "cid", "cent")
    val coded = corpus.select(col("vec_id"), emb, qvec(emb).as("qv"))
      .select(col("vec_id"),
        graft.functions.VectorExprs.nearestCentroid(emb, centSeq)
          .getField("cid").as("bcid"),
        pqCodeCol(col("qv"), books).as("code"))
    adcProbeCoded(coded, centroids, queries, k, books, ksub)
  }

  /** RESIDUAL IVF-PQ build (the FAISS IVFADC form): codebooks train
    * on `x − c(x)` — each vector minus its coarse centroid — instead
    * of raw vectors. With any real clustering the residuals span only
    * the WITHIN-bucket spread, so the same M×Ksub codebook budget
    * resolves far finer structure than raw-vector PQ, whose codewords
    * must cover the global spread (PqSpec demonstrates the recall
    * gap on a clustered corpus). Everything stays in the exact
    * integer domain: the residual is a LONG difference of the
    * quantized vector and the quantized centroid, so training and
    * codes replay bit-identically in the oracle. Coarse tier is the
    * first-[[IvfK]]-seeds convention of [[topKIvfPq]]. Returns
    * (coded(vec_id, bcid, code), books, centroids(cid, cent)). */
  def residualPqBuild(corpus: DataFrame, m: Int = PqM,
      ksub: Int = PqKsub, iters: Int = PqIters)
      : (DataFrame, Seq[Seq[(Long, Seq[Double])]], DataFrame) = {
    val centroids = corpus.filter(col("vec_id") < IvfK)
      .select(col("vec_id").cast("long").as("cid"), emb.as("cent"))
    val centSeq = collectCentroidSeq(centroids, "cid", "cent")
    val qcents = broadcast(centroids.select(col("cid").as("bcid"),
      qvec(col("cent")).as("qcent")))
    // ONE lazy checkpoint of the residual frame (vec_id, bcid, qv)
    // feeds BOTH codebook training and the encode (round 17): the
    // previous shape re-derived the coarse-assignment pipeline for
    // `coded` after training had already checkpointed an identical
    // frame — one redundant corpus pass plus a full re-analysis of the
    // assignment tree in the serve plan. Blocks are GC-reclaimed with
    // the returned frame (the eager-checkpoint contract — this entry
    // point has no release handle).
    val resid = corpus.select(col("vec_id"), emb, qvec(emb).as("qv"))
      .select(col("vec_id"), col("qv"),
        graft.functions.VectorExprs.nearestCentroid(emb, centSeq)
          .getField("cid").as("bcid"))
      .join(qcents, Seq("bcid"))
      .select(col("vec_id"), col("bcid"),
        zip_with(col("qv"), col("qcent"), (a, b) => a - b).as("qv"))
      .localCheckpoint(false)
    val books = pqCodebooksQvOn(resid.select(col("vec_id"), col("qv")),
      m, ksub, iters)
    val coded = resid.select(col("vec_id"), col("bcid"),
      pqCodeCol(col("qv"), books).as("code"))
    (coded, books, centroids)
  }

  /** Residual IVF-PQ top-k: probe the coarse buckets, score each
    * candidate as `(⟨q, c_b⟩ + ⟨q, r̃⟩) / 1e8` — the bucket term is an
    * EXACT integer dot carried on the broadcast probe row (one per
    * (query, probed bucket), K-bounded), the residual term is the
    * same M-lookup ADC sum as [[topKIvfPq]], and the one division
    * happens after the sum so the oracle's expression is
    * bit-identical. Same serving shape as the raw tier: LUTs + bucket
    * dots broadcast, 4-byte codes stream map-side. */
  def topKIvfPqResidual(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = PqM, ksub: Int = PqKsub,
      iters: Int = PqIters): DataFrame = {
    val (coded, books, centroids) = residualPqBuild(corpus, m, ksub, iters)
    adcProbeCodedResidual(coded, centroids, queries, k, books, ksub)
  }

  /** The serve kernel of the residual tier — probe + bucket-dot +
    * residual ADC against an already-coded corpus; shared by
    * [[topKIvfPqResidual]] (fused) and [[topKPqResServe]]
    * (published index). */
  private def adcProbeCodedResidual(coded: DataFrame,
      centroids: DataFrame, queries: DataFrame, k: Int,
      books: Seq[Seq[(Long, Seq[Double])]], ksub: Int): DataFrame = {
    val cents = broadcast(centroids.select(col("cid"), col("cent")))
    val probes = queries.select(col("vec_id").as("qid"), emb.as("qemb"))
      .crossJoin(cents)
      .select(col("qid"), col("qemb"), col("cid"), col("cent"),
        cosine(col("qemb"), col("cent")).as("ccos"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid"))))
      .filter(col("__r") <= IvfProbe)
      .select(col("qid"), col("cid").as("bcid"),
        pqLut(qvec(col("qemb")), books, ksub).as("lut"),
        aggregate(zip_with(qvec(col("qemb")), qvec(col("cent")),
            (x, y) => x * y), lit(0L), (a, v) => a + v)
          .cast("double").as("bdot"))
    broadcast(probes).join(coded, Seq("bcid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        ((col("bdot") + adcSum(col("code"), col("lut"), books.size, ksub))
          / lit(1e8)).as("adot"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adot").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adot"))
  }

  /** Probe + ADC-rank against an already-coded corpus — the shared
    * serve kernel of [[topKIvfPq]] (fused build) and [[topKPqServe]]
    * (published index). `coded` is (vec_id, bcid, code); `centroids`
    * is the coarse (cid, cent) frame — both K-bounded/broadcastable
    * on the probe side, corpus-side pass stays map-side. */
  private def adcProbeCoded(coded: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int, books: Seq[Seq[(Long, Seq[Double])]],
      ksub: Int): DataFrame = {
    val m = books.size
    val cents = broadcast(centroids.select(col("cid"), col("cent")))
    val probes = queries.select(col("vec_id").as("qid"), emb.as("qemb"))
      .crossJoin(cents)
      .select(col("qid"), col("qemb"), col("cid"),
        cosine(col("qemb"), col("cent")).as("ccos"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid"))))
      .filter(col("__r") <= IvfProbe)
      .select(col("qid"), pqLut(qvec(col("qemb")), books, ksub).as("lut"),
        col("cid").as("bcid"))
    broadcast(probes).join(coded, Seq("bcid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        adcScore(col("code"), col("lut"), m, ksub).as("adot"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adot").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adot"))
  }

  /** Build and atomically publish a PQ index: codebooks, coarse
    * centroids, and the bucket-assigned CODE table land as ONE
    * [[Snapshot]] version (tables `books`, `centroids`, `coded`,
    * `meta`), so a serving reader can never pair new books with old
    * codes. This is the deployment PQ exists for: the publish pays
    * the train + encode passes once, and the serving tier then holds
    * only 4-byte codes + K-bounded metadata — the float corpus never
    * ships to the servers at all. Returns the committed version. */
  def publishPqIndex(corpus: DataFrame, dir: String, m: Int = PqM,
      ksub: Int = PqKsub, iters: Int = PqIters): Long = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val books = pqCodebooks(corpus, m, ksub, iters)
    val booksDf = books.zipWithIndex.flatMap { case (sub, s) =>
      sub.map { case (cid, cent) => (s, cid, cent) } }
      .toDF("sub", "cid", "cent")
    val centroids = corpus.filter(col("vec_id") < IvfK)
      .select(col("vec_id").cast("long").as("cid"), emb.as("cent"))
    val centSeq = collectCentroidSeq(centroids, "cid", "cent")
    val coded = corpus.select(col("vec_id"), emb, qvec(emb).as("qv"))
      .select(col("vec_id"),
        graft.functions.VectorExprs.nearestCentroid(emb, centSeq)
          .getField("cid").as("bcid"),
        pqCodeCol(col("qv"), books).as("code"))
    val meta = Seq((m, ksub)).toDF("m", "ksub")
    Snapshot.publishTables(Seq("books" -> booksDf,
      "centroids" -> centroids, "coded" -> coded, "meta" -> meta), dir)
  }

  /** A published version's driver-side codebooks + its declared ksub
    * (the LUT/packing base — NOT derivable from the books, which may
    * have dropped empty codewords). */
  private def loadPqBooks(spark: org.apache.spark.sql.SparkSession,
      dir: String, version: Option[Long])
      : (Seq[Seq[(Long, Seq[Double])]], Int) = {
    val rows = Snapshot.readTable(spark, dir, "books", version)
      .select(col("sub").cast("int"), col("cid").cast("long"),
        transform(col("cent"), _.cast("double")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .toSeq
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(t => (t._2, t._3)).sortBy(_._1))
    val ksub = Snapshot.readTable(spark, dir, "meta", version)
      .select(col("ksub").cast("int")).collect().head.getInt(0)
    (books, ksub)
  }

  /** Serve ADC top-k from a published PQ index (latest version, or
    * pinned). Result-identical to [[topKIvfPq]] over the corpus the
    * index was built from — the spec pins that equality. The serve
    * reads ONLY codes + K-bounded metadata. The version is resolved
    * ONCE and every table reads it: with per-read latest resolution a
    * publish landing between the books load and the code scan would
    * pair new books with old codes. */
  def topKPqServe(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(Snapshot.latestVersion(spark, dir))
    val (books, ksub) = loadPqBooks(spark, dir, v)
    adcProbeCoded(Snapshot.readTable(spark, dir, "coded", v),
      Snapshot.readTable(spark, dir, "centroids", v),
      queries, k, books, ksub)
  }

  /** Incremental PQ index update: encode `newVecs` with the PUBLISHED
    * books + coarse centroids and publish (old codes ∪ new) as the
    * next version — the [[appendToIvfIndex]] freshness trade, PQ
    * flavor: appends reuse the frozen quantizers, so reconstruction
    * drift accumulates until [[pqRecall]] on a probe set says
    * rebuild ([[publishPqIndex]] from the full corpus). Serving sees
    * old+new atomically. */
  def appendToPqIndex(spark: org.apache.spark.sql.SparkSession,
      newVecs: DataFrame, dir: String): Long = {
    // pin ONE version for every input table — a publish racing this
    // append must not mix quantizer generations (the semDedupAppend
    // torn-version lesson)
    val v = Snapshot.latestVersion(spark, dir)
    val (books, _) = loadPqBooks(spark, dir, v)
    val centroids = Snapshot.readTable(spark, dir, "centroids", v)
    val centSeq = collectCentroidSeq(centroids, "cid", "cent")
    val fresh = newVecs.select(col("vec_id"), emb, qvec(emb).as("qv"))
      .select(col("vec_id"),
        graft.functions.VectorExprs.nearestCentroid(emb, centSeq)
          .getField("cid").as("bcid"),
        pqCodeCol(col("qv"), books).as("code"))
    val merged = Snapshot.readTable(spark, dir, "coded", v)
      .unionByName(fresh)
    Snapshot.publishTables(Seq(
      "books" -> Snapshot.readTable(spark, dir, "books", v),
      "centroids" -> centroids, "coded" -> merged,
      "meta" -> Snapshot.readTable(spark, dir, "meta", v)), dir)
  }

  /** Build and atomically publish a RESIDUAL PQ index — same
    * four-table snapshot contract as [[publishPqIndex]] (books,
    * centroids, coded, meta in ONE version; the serving tier holds
    * 4-byte codes + K-bounded metadata only), with the books trained
    * on long residuals and the codes encoding them. Returns the
    * committed version. */
  def publishResidualPqIndex(corpus: DataFrame, dir: String,
      m: Int = PqM, ksub: Int = PqKsub, iters: Int = PqIters): Long = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (coded, books, centroids) = residualPqBuild(corpus, m, ksub, iters)
    val booksDf = books.zipWithIndex.flatMap { case (sub, s) =>
      sub.map { case (cid, cent) => (s, cid, cent) } }
      .toDF("sub", "cid", "cent")
    val meta = Seq((m, ksub)).toDF("m", "ksub")
    Snapshot.publishTables(Seq("books" -> booksDf,
      "centroids" -> centroids, "coded" -> coded, "meta" -> meta), dir)
  }

  /** Serve residual-ADC top-k from a [[publishResidualPqIndex]]
    * version (latest, or pinned) — result-identical to
    * [[topKIvfPqResidual]] over the corpus the index was built from
    * (spec-pinned). One version resolution covers every table read,
    * the torn-version guard all serve/append entries share. */
  def topKPqResServe(spark: org.apache.spark.sql.SparkSession,
      dir: String, queries: DataFrame, k: Int,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(Snapshot.latestVersion(spark, dir))
    val (books, ksub) = loadPqBooks(spark, dir, v)
    adcProbeCodedResidual(Snapshot.readTable(spark, dir, "coded", v),
      Snapshot.readTable(spark, dir, "centroids", v), queries, k,
      books, ksub)
  }

  /** Recall@k of the flat ADC tier against the exact top-k — the PQ
    * sibling of [[ivfRecall]] (compression quality, not probe
    * coverage: what the 64x memory reduction costs in ranking
    * fidelity; rises with M/Ksub). Exact tier is one brute pass per
    * evaluation batch — run on a sampled probe set. */
  def pqRecall(corpus: DataFrame, queries: DataFrame, k: Int,
      books: Seq[Seq[(Long, Seq[Double])]]): DataFrame =
    recallJoin(topKExact(corpus, queries, k),
      topKPqAdc(corpus, queries, k, books))

  /** Unrolled-CTE DuckDB restatement of [[pqCodebooks]] + the final
    * assignment: `pqvecs`/`pqsubv`, `pb0` seeds, paN/pbN per round,
    * `pcode(vec_id, sub, cid, d)` the final per-subspace codes. */
  def pqSql(m: Int = PqM, ksub: Int = PqKsub,
      iters: Int = PqIters): String =
    s"""pqvecs AS (
       |  SELECT vec_id,
       |    [CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |     for e in embedding] AS qv
       |  FROM embeddings
       |), ${pqSqlOverQv("pqvecs", m, ksub, iters)}""".stripMargin

  /** The codebook-train + encode CTE chain of [[pqSql]] over an
    * arbitrary source CTE `srcQv(vec_id, qv)` — the residual tier
    * trains through this with its long-difference qv. Defines
    * `pqsubv`, `pb0..pb<iters>`, and `pcode(vec_id, sub, cid, d)`. */
  def pqSqlOverQv(srcQv: String, m: Int = PqM, ksub: Int = PqKsub,
      iters: Int = PqIters): String = {
    val dsub = Dim / m
    def l2(sv: String, cent: String) =
      s"list_sum([(CAST($sv[i] AS DOUBLE) - $cent[i]) * " +
        s"(CAST($sv[i] AS DOUBLE) - $cent[i]) " +
        s"for i in generate_series(1, $dsub)])"
    def assign(name: String, cents: String, last: Boolean) =
      s"""$name AS (
         |  SELECT vec_id, sub, ${if (last) "cid, d" else "sv, cid"} FROM (
         |    SELECT v.vec_id, v.sub, v.sv, c.cid,
         |           ${l2("v.sv", "c.cent")} AS d,
         |           row_number() OVER (PARTITION BY v.vec_id, v.sub
         |             ORDER BY ${l2("v.sv", "c.cent")} ASC, c.cid) AS r
         |    FROM pqsubv v JOIN $cents c USING (sub))
         |  WHERE r = 1
         |)""".stripMargin
    def update(name: String, assigned: String) =
      s"""$name AS (
         |  SELECT sub, cid, list(sx / n ORDER BY i) AS cent FROM (
         |    SELECT a.sub, a.cid, t.i, sum(a.sv[t.i]) AS sx, count(*) AS n
         |    FROM $assigned a
         |    CROSS JOIN (SELECT unnest(generate_series(1, $dsub)) AS i) t
         |    GROUP BY a.sub, a.cid, t.i)
         |  GROUP BY sub, cid
         |)""".stripMargin
    val rounds = (1 to iters).map(r =>
      assign(s"pa$r", s"pb${r - 1}", last = false) + ",\n" +
        update(s"pb$r", s"pa$r")).mkString(",\n")
    s"""pqsubv AS (
       |  SELECT vec_id, s.sub,
       |         list_slice(qv, s.sub * $dsub + 1, s.sub * $dsub + $dsub) AS sv
       |  FROM $srcQv, (SELECT unnest(generate_series(0, ${m - 1})) AS sub) s
       |), pb0 AS (
       |  SELECT sub, CAST(vec_id AS BIGINT) AS cid,
       |         [CAST(x AS DOUBLE) for x in sv] AS cent
       |  FROM pqsubv WHERE vec_id < $ksub
       |),
       |$rounds,
       |${assign("pcode", s"pb$iters", last = true)}""".stripMargin
  }

  /** DuckDB twin of [[pqEncode]]'s scalar outputs (requires [[pqSql]]);
    * defines `pqout(vec_id, code_key, rerr)`. */
  def pqEncodeSql: String =
    s"""pqout AS (
       |  SELECT vec_id,
       |    CAST(sum(cid * CAST(power($PqKsub, sub) AS BIGINT)) AS BIGINT)
       |      AS code_key,
       |    list_sum(list(d ORDER BY sub)) / $Dim / 1e8 AS rerr
       |  FROM pcode GROUP BY vec_id
       |)""".stripMargin

  /** DuckDB twin of [[topKPqAdc]] (requires [[pqSql]]); defines
    * `pqlut(qid, sub, cid, dq)` and `pqranked(qid, rank, vec_id, adot)`.
    * `queryPred` filters `q` over `pqvecs`. */
  def topKPqSql(queryPred: String): String =
    s"""pqlut AS (
       |  SELECT q.vec_id AS qid, c.sub, c.cid,
       |    list_sum([CAST(q.qv[c.sub * $PqDsub + i] AS DOUBLE) * c.cent[i]
       |      for i in generate_series(1, $PqDsub)]) AS dq
       |  FROM pqvecs q, pb$PqIters c WHERE $queryPred
       |), pqadc AS (
       |  SELECT qid, vec_id, list_sum(list(dq ORDER BY sub)) / 1e8 AS adot
       |  FROM (
       |    SELECT l.qid, p.vec_id, p.sub, l.dq
       |    FROM pcode p JOIN pqlut l ON l.sub = p.sub AND l.cid = p.cid
       |    WHERE p.vec_id <> l.qid)
       |  GROUP BY qid, vec_id
       |), pqranked AS (
       |  SELECT qid, vec_id, adot,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY adot DESC, vec_id) AS rank
       |  FROM pqadc
       |)""".stripMargin

  /** DuckDB twin of [[topKIvfPq]] (requires [[pqSql]] + [[topKPqSql]]'s
    * `pqlut`); defines `pqivfranked(qid, rank, vec_id, adot)`.
    * `queryPred` filters `q` over `embeddings` (probe side). */
  def topKIvfPqSql(queryPred: String): String =
    s"""pqcents AS (
       |  SELECT vec_id AS cid, embedding AS cemb FROM embeddings
       |  WHERE vec_id < $IvfK
       |), pqbuckets AS (
       |  SELECT vec_id, cid AS bcid FROM (
       |    SELECT e.vec_id, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosineSql("e.embedding", "c.cemb")} DESC, c.cid) AS r
       |    FROM embeddings e, pqcents c)
       |  WHERE r = 1
       |), pqprobes AS (
       |  SELECT qid, cid AS bcid FROM (
       |    SELECT q.vec_id AS qid, c.cid,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${cosineSql("q.embedding", "c.cemb")} DESC, c.cid) AS r
       |    FROM embeddings q, pqcents c WHERE $queryPred)
       |  WHERE r <= $IvfProbe
       |), pqivfadc AS (
       |  SELECT qid, vec_id, list_sum(list(dq ORDER BY sub)) / 1e8 AS adot
       |  FROM (
       |    SELECT pr.qid, p.vec_id, p.sub, l.dq
       |    FROM pqprobes pr
       |    JOIN pqbuckets b ON b.bcid = pr.bcid
       |    JOIN pcode p ON p.vec_id = b.vec_id
       |    JOIN pqlut l ON l.qid = pr.qid AND l.sub = p.sub AND l.cid = p.cid
       |    WHERE b.vec_id <> pr.qid)
       |  GROUP BY qid, vec_id
       |), pqivfranked AS (
       |  SELECT qid, vec_id, adot,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY adot DESC, vec_id) AS rank
       |  FROM pqivfadc
       |)""".stripMargin

  /** DuckDB twin of [[topKIvfPqResidual]] — self-contained CTE chain
    * (bucket assignment, long-difference residuals, codebook train
    * over them via [[pqSqlOverQv]], probe with exact bucket dots, ADC
    * with the bucket term added BEFORE the one rescaling division).
    * Defines `rranked(qid, rank, vec_id, adot)`. `queryPred` filters
    * alias `q`. */
  def residualPqSql(queryPred: String, m: Int = PqM, ksub: Int = PqKsub,
      iters: Int = PqIters): String = {
    val dsub = Dim / m
    s"""rqvecs AS (
       |  SELECT vec_id, embedding,
       |    [CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |     for e in embedding] AS qv
       |  FROM embeddings
       |), rcents AS (
       |  SELECT vec_id AS cid, embedding AS cemb,
       |    [CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |     for e in embedding] AS qcent
       |  FROM embeddings WHERE vec_id < $IvfK
       |), rbuckets AS (
       |  SELECT vec_id, cid AS bcid FROM (
       |    SELECT e.vec_id, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosineSql("e.embedding", "c.cemb")} DESC, c.cid) AS r
       |    FROM embeddings e, rcents c)
       |  WHERE r = 1
       |), resvecs AS (
       |  SELECT v.vec_id,
       |         [v.qv[i] - c.qcent[i] for i in generate_series(1, $Dim)] AS qv
       |  FROM rqvecs v JOIN rbuckets b USING (vec_id)
       |  JOIN rcents c ON c.cid = b.bcid
       |),
       |${pqSqlOverQv("resvecs", m, ksub, iters)},
       |rprobes AS (
       |  SELECT qid, bcid, bdot FROM (
       |    SELECT q.vec_id AS qid, c.cid AS bcid,
       |      list_sum([CAST(q.qv[i] AS DOUBLE) * CAST(c.qcent[i] AS DOUBLE)
       |        for i in generate_series(1, $Dim)]) AS bdot,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosineSql("q.embedding", "c.cemb")} DESC, c.cid) AS r
       |    FROM rqvecs q, rcents c WHERE $queryPred)
       |  WHERE r <= $IvfProbe
       |), rlut AS (
       |  SELECT q.vec_id AS qid, c.sub, c.cid,
       |    list_sum([CAST(q.qv[c.sub * $dsub + i] AS DOUBLE) * c.cent[i]
       |      for i in generate_series(1, $dsub)]) AS dq
       |  FROM rqvecs q, pb$iters c WHERE $queryPred
       |), radc AS (
       |  SELECT qid, vec_id,
       |         (max(bdot) + list_sum(list(dq ORDER BY sub))) / 1e8 AS adot
       |  FROM (
       |    SELECT pr.qid, pr.bdot, b.vec_id, p.sub, l.dq
       |    FROM rprobes pr
       |    JOIN rbuckets b ON b.bcid = pr.bcid
       |    JOIN pcode p ON p.vec_id = b.vec_id
       |    JOIN rlut l ON l.qid = pr.qid AND l.sub = p.sub AND l.cid = p.cid
       |    WHERE b.vec_id <> pr.qid)
       |  GROUP BY qid, vec_id
       |), rranked AS (
       |  SELECT qid, vec_id, adot,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY adot DESC, vec_id) AS rank
       |  FROM radc
       |)""".stripMargin
  }

  /** DuckDB twin of [[pqRecall]] for queries `vec_id < 5`; composes
    * after [[topKPqSql]] (which defines `pqranked`) and defines
    * `prec(qid, n_hits, recall)`. */
  def pqRecallSql(k: Int): String =
    s"""pxq AS (
       |  SELECT vec_id AS qid, embedding AS qemb FROM embeddings WHERE vec_id < 5
       |), pxrk AS (
       |  SELECT qid, vec_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
       |  FROM (
       |    SELECT q.qid, e.vec_id, ${cosineSql("q.qemb", "e.embedding")} AS cos
       |    FROM embeddings e, pxq q WHERE e.vec_id <> q.qid)
       |), prec AS (
       |  SELECT x.qid, CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |    sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) AS recall
       |  FROM (SELECT qid, vec_id FROM pxrk WHERE rank <= $k) x
       |  LEFT JOIN (SELECT qid, vec_id FROM pqranked WHERE rank <= $k) i
       |    ON x.qid = i.qid AND x.vec_id = i.vec_id
       |  GROUP BY x.qid
       |)""".stripMargin

  /** Unrolled-CTE DuckDB restatement of [[kmeans]]: `qvecs`, `c0`
    * seeds, then aN/cN per round; defines `outk(vec_id, cid, cos)`. */
  def kmeansSql(k: Int = KmK, iters: Int = KmIters): String = {
    def dot(x: String, y: String) =
      s"list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) for i in generate_series(1, $Dim)])"
    def cos(q: String, c: String) =
      s"(${dot(q, c)} / (sqrt(${dot(q, q)}) * sqrt(${dot(c, c)})))"
    def assign(name: String, cents: String, last: Boolean) = {
      val keep = if (last) s"${cos("q.qv", "c.cent")} AS cos" else "q.qv"
      s"""$name AS (
         |  SELECT vec_id, cid${if (last) ", cos" else ", qv"} FROM (
         |    SELECT q.vec_id, c.cid, $keep,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${cos("q.qv", "c.cent")} DESC, c.cid) AS r
         |    FROM qvecs q, $cents c)
         |  WHERE r = 1
         |)""".stripMargin
    }
    def update(name: String, assigned: String) =
      s"""$name AS (
         |  SELECT cid, list(sx / n ORDER BY i) AS cent FROM (
         |    SELECT a.cid, t.i, sum(a.qv[t.i]) AS sx, count(*) AS n
         |    FROM $assigned a
         |    CROSS JOIN (SELECT unnest(generate_series(1, $Dim)) AS i) t
         |    GROUP BY a.cid, t.i)
         |  GROUP BY cid
         |)""".stripMargin
    val rounds = (1 to iters).map(r =>
      assign(s"a$r", s"c${r - 1}", last = false) + ",\n" +
        update(s"c$r", s"a$r")).mkString(",\n")
    s"""qvecs AS (
       |  SELECT vec_id,
       |    [CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |     for e in embedding] AS qv
       |  FROM embeddings
       |), c0 AS (
       |  SELECT CAST(vec_id AS BIGINT) AS cid,
       |         [CAST(x AS DOUBLE) for x in qv] AS cent
       |  FROM qvecs WHERE vec_id < $k
       |),
       |$rounds,
       |${assign("outk", s"c$iters", last = true)}""".stripMargin
  }


  /** CTEs `assigned(vec_id, embedding, cid)` + `probes(qid, qemb, cid)`
    * replaying [[ivfAssign]]/probe selection for queries `vec_id < 5`. */
  def ivfSql(k: Int): String =
    s"""cents AS (
       |  SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < $IvfK
       |), assigned AS (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosineSql("e.embedding", "c.cemb")} DESC, c.cid) AS r
       |    FROM embeddings e, cents c)
       |  WHERE r = 1
       |), probes AS (
       |  SELECT qid, qemb, cid FROM (
       |    SELECT q.vec_id AS qid, q.embedding AS qemb, c.cid,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${cosineSql("q.embedding", "c.cemb")} DESC, c.cid) AS r
       |    FROM embeddings q, cents c WHERE q.vec_id < 5)
       |  WHERE r <= $IvfProbe
       |), ranked AS (
       |  SELECT qid, vec_id, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
       |  FROM (
       |    SELECT p.qid, a.vec_id, ${cosineSql("p.qemb", "a.embedding")} AS cos
       |    FROM probes p JOIN assigned a USING (cid)
       |    WHERE a.vec_id <> p.qid)
       |)""".stripMargin

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the
    * embedding space, then within each cluster drop every vector that
    * has a more-senior (lower vec_id) epsilon-neighbor — cosine ≥
    * `eps` — keeping one representative per semantic-duplicate ball.
    * Returns the survivors (vec_id, cid).
    *
    * Scale shape: the pair search is CONFINED to k-means buckets —
    * the paper's own trick for avoiding N² (cluster count grows with
    * the corpus so Σ|cluster|² stays ≪ N²; they use 11 k clusters for
    * LAION). Here the assignment is the one map-side
    * nearest-centroid pass the IVF tier uses (centroids are K×dim
    * driver state regardless), and the within-cluster self-join
    * shuffles on cid once — both sides co-partitioned, no global
    * pairing. The min-id keeper rule matches [[Dedup]]'s exact-dup
    * semantics, so exact dups collapse to the same keeper either way.
    *
    * FLAT TIER: K ≤ [[FlatKMax]] (throws past it, via
    * [[kmeansCentroidsSeq]]). At larger K use [[semDedupScalable]] or
    * the K-dispatched [[semDedupAuto]]. */
  def semDedup(corpus: DataFrame, eps: Double, k: Int = KmK,
      iters: Int = KmIters): DataFrame = {
    val cents = kmeansCentroidsSeq(corpus, k, iters)
    val nc = graft.functions.VectorExprs.nearestCentroid(
      col("qv"), cents.sortBy(_._1))
    val assigned = corpus.select(col("vec_id"), emb, qvec(emb).as("qv"))
      .select(col("vec_id"), emb, nc.getField("cid").as("cid"))
    val a = assigned.select(col("cid"), col("vec_id").as("vec_a"), emb.as("ea"))
    val b = assigned.select(col("cid"), col("vec_id").as("vec_b"), emb.as("eb"))
    val dropped = a.join(b, Seq("cid"))
      .filter(col("vec_a") < col("vec_b") &&
        cosine(col("ea"), col("eb")) >= eps)
      .select(col("vec_b").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("cid"))
      .join(dropped, Seq("vec_id"), "left_anti")
  }

  /** DuckDB twin of [[semDedup]]: [[kmeansSql]]'s final `outk`
    * assignment joined back to the embeddings, within-cluster senior
    * neighbors dropped. Defines `sdkeep(vec_id, cid)`. */
  def semDedupSql(eps: Double): String =
    s"""sdass AS (
       |  SELECT o.vec_id, o.cid, e.embedding
       |  FROM outk o JOIN embeddings e USING (vec_id)
       |), sddrop AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM sdass a JOIN sdass b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= $eps
       |), sdkeep AS (
       |  SELECT vec_id, cid FROM sdass
       |  WHERE vec_id NOT IN (SELECT vec_id FROM sddrop)
       |)""".stripMargin

  // ---- Two-level (coarse → fine) k-means: the K ≈ 10⁶ substrate ----

  /** Two-level k-means assignment — the clustering substrate that
    * reaches the cluster counts 100-TB SemDeDup needs (10⁹ vectors ⇒
    * K ≈ 10⁶ for the paper's Σ|cluster|² ≪ N² bound), which the flat
    * [[kmeansCentroidsSeq]] cannot: flat K = 10⁶ means a ~GB centroid
    * array bounced through the driver into every task and a 10⁶-wide
    * linear scan per row. Here (the FAISS IVF coarse-quantizer shape):
    *
    *  1. COARSE: `coarseK ≈ √K` centroids via the existing
    *     driver-bounded Lloyd rounds — coarse state is √K×dim, MBs at
    *     any scale, so the driver bounce stays legitimate.
    *  2. FINE, fully distributed: each coarse cell gets `fineK` seed
    *     centroids (its lowest vec_ids — `WindowGroupLimit` keeps the
    *     seed pick map-side); Lloyd rounds then run as plain
    *     join + aggregate plans: vectors join their OWN cell's
    *     centroid array on ccid ([[graft.functions.NearestInCellExpr]]
    *     scans fineK, not K, per row — codegen'd, zero UDFs), and the
    *     update is one map-side-combined per-(ccid, fcid, dim)
    *     aggregate. No centroid state ever visits the driver; each
    *     round materializes a √K-row cell frame (persisted, previous
    *     round released), so lineage stays one round deep.
    *
    * The cells frame broadcasts while total centroid bytes fit
    * comfortably (≤ 64 MB — deterministic plan choice, not a stats
    * guess); past that the join degrades gracefully to a shuffle on
    * ccid, which the corpus-side already keys. Global cluster id
    * `cid = ccid·fineK + fcid`. Quantized-vector math and (cos desc,
    * id asc, NaN-first) tie-breaks are exactly the flat tier's, so the
    * DuckDB twin ([[twoLevelSql]]) replays bit-identically.
    *
    * Returns (vec_id, embedding, ccid, cid). This convenience form is
    * EAGER and leak-free: it materializes the result
    * (`localCheckpoint`), releases the build caches immediately, and
    * the checkpoint blocks are GC-reclaimed with the returned frame.
    * The materialized copy is corpus-sized — scale callers that want
    * a lazy plan use [[twoLevelAssignScoped]] and release after their
    * final consuming action. */
  def twoLevelAssign(corpus: DataFrame, coarseK: Int, fineK: Int,
      coarseIters: Int = KmIters, fineIters: Int = 1): DataFrame = {
    val (out, release) =
      twoLevelAssignScoped(corpus, coarseK, fineK, coarseIters, fineIters)
    val eager = out.localCheckpoint(true)
    release()
    eager
  }

  /** [[twoLevelAssign]] plus a release handle for the assignment-side
    * caches (the coarse-assigned corpus feeds every fine round). */
  def twoLevelAssignScoped(corpus: DataFrame, coarseK: Int, fineK: Int,
      coarseIters: Int = KmIters, fineIters: Int = 1)
      : (DataFrame, () => Unit) = {
    val ix = twoLevelIndex(corpus, coarseK, fineK, coarseIters, fineIters)
    (ix.assigned, ix.release)
  }

  /** The full two-level build artifact: the assigned corpus, the
    * distributed fine-centroid cell frame, and the driver-held coarse
    * tier — everything [[topKIvfTwoLevel]] serving needs. */
  final case class TwoLevelIndex(assigned: DataFrame, cells: DataFrame,
      coarse: Seq[(Long, Seq[Double])], release: () => Unit)

  /** Build the [[TwoLevelIndex]]; see [[twoLevelAssign]] for the
    * algorithm and scale contract. */
  def twoLevelIndex(corpus: DataFrame, coarseK: Int, fineK: Int,
      coarseIters: Int = KmIters, fineIters: Int = 1): TwoLevelIndex = {
    require(coarseK > 0 && fineK > 0 && coarseIters >= 0 && fineIters >= 0,
      "coarseK, fineK must be positive; iteration counts non-negative")
    val spark = corpus.sparkSession
    val coarse = kmeansCentroidsSeq(corpus, coarseK, coarseIters)
    val nc = graft.functions.VectorExprs.nearestCentroid(
      col("qv"), coarse.sortBy(_._1))
    // LAZY localCheckpoint, not persist: same block storage and the
    // same first-action materialization, but it also TRUNCATES the
    // logical plan to an RDD scan. Every fine round, chunk level and
    // serve path downstream re-embeds this frame's lineage; with a
    // bare persist Catalyst re-analyzes the whole corpus-construction
    // tree (Dim-wide aggregates, unrolled Lloyd rounds) at every plan
    // build — measured as 3-4 s of pure DRIVER time per semdedup pass
    // at sf0.1 while the actual jobs sum to well under 1 s.
    val ac = corpus.select(col("vec_id"), emb, qvec(emb).as("qv"))
      .select(col("vec_id"), emb, col("qv"), nc.getField("cid").as("ccid"))
      .localCheckpoint(false)
    def assignF(cells: DataFrame): DataFrame = {
      val rhs = // deterministic broadcast-vs-shuffle choice, see scaladoc
        if (coarseK.toLong * fineK * Dim * 8 <= (64L << 20)) broadcast(cells)
        else cells
      ac.join(rhs, Seq("ccid"))
        .select(col("vec_id"), emb, col("qv"), col("ccid"),
          graft.functions.VectorExprs.nearestInCell(col("qv"), col("cents"))
            .getField("fcid").as("fcid"))
    }
    // TIERED fine training, same dispatch expression as the assignF
    // broadcast gate. Under the 64 MB cells budget (the common case,
    // and every caller in this repo) the seed pick and Lloyd updates
    // run as RDD treeAggregates with the cells held on the driver
    // between rounds — the [[lloydRoundRdd]] playbook: a round costs
    // ONE job and zero per-round Catalyst work, where the plan form
    // paid a window shuffle plus two aggregate+persist+count chains
    // (profiled as the dominant driver cost of the iterative sim_*
    // queries at toy scale). Past the budget the fine tier trains
    // distributed exactly as before — cells stay a DataFrame end to
    // end, the shape K ≈ 10⁶ requires.
    val cellsFinal: DataFrame =
      if (coarseK.toLong * fineK * Dim * 8 <= (64L << 20)) {
        import spark.implicits._
        val rows = ac.select(col("vec_id"), col("qv"), col("ccid"))
          .filter(col("ccid").isNotNull)
          .as[(Long, Array[Long], Long)].rdd
        var cellsLocal = fineSeedsRdd(rows, fineK)
        (1 to fineIters).foreach { _ =>
          cellsLocal = fineRoundRdd(rows, cellsLocal, fineK)
        }
        val cellRows = cellsLocal.toSeq.sortBy(_._1).map { case (ccid, cs) =>
          (ccid, cs.map { case (fcid, cent) =>
            FineCell(fcid, cent.toSeq) }.toSeq)
        }
        // a LocalRelation — driver-held rows; broadcasting it later is
        // a local collect, so persisting would only add cache traffic
        spark.createDataset(cellRows).toDF("ccid", "cents")
      } else {
        val seeds = ac
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col("ccid")).orderBy(col("vec_id"))))
          .filter(col("__rn") <= fineK)
          .select(col("ccid"), (col("__rn") - 1).cast("long").as("fcid"),
            transform(col("qv"), x => x.cast("double")).as("cent"))
        def toCells(cents: DataFrame): DataFrame =
          cents.groupBy(col("ccid"))
            .agg(sort_array(collect_list(struct(col("fcid"), col("cent"))))
              .as("cents"))
        var cells = toCells(seeds).persist()
        cells.count() // materialize: truncates per-round lineage
        (1 to fineIters).foreach { _ =>
          // per-dim sums as one native aggregate — see kmeansCentroidsSeq
          val newCents = assignF(cells).groupBy(col("ccid"), col("fcid"))
            .agg(count(lit(1)).as("n"),
              graft.functions.VectorExprs.arraySumLong(col("qv")).as("s"))
            .select(col("ccid"), col("fcid"),
              transform(col("s"), x => x.cast("double") / col("n")).as("cent"))
          val nxt = toCells(newCents).persist()
          nxt.count()
          cells.unpersist()
          cells = nxt
        }
        cells
      }
    val assigned = assignF(cellsFinal)
    val out = assigned.select(col("vec_id"), emb, col("ccid"),
      (col("ccid") * fineK + col("fcid")).as("cid"))
    TwoLevelIndex(out, cellsFinal, coarse,
      () => { freeCheckpoint(ac); cellsFinal.unpersist(); () })
  }

  /** Inner element of the driver-built cells frame — field names must
    * match the plan-form `struct(fcid, cent)` exactly (the
    * [[graft.functions.NearestInCellExpr]] input contract). */
  private[pipeline] case class FineCell(fcid: Long, cent: Seq[Double])

  /** Fine-tier seed pick as ONE treeAggregate: per coarse cell, the
    * `fineK` LOWEST vec_ids with their quantized vectors widened to
    * double — exactly the `row_number over (partition by ccid order by
    * vec_id) <= fineK` seed rule of the plan form. Driver state is
    * ≤ coarseK·fineK·(dim+1) numbers, inside the same 64 MB budget
    * that gates this path. Returns ccid → fcid-ascending cells. */
  private def fineSeedsRdd(
      rows: org.apache.spark.rdd.RDD[(Long, Array[Long], Long)],
      fineK: Int): collection.Map[Long, Array[(Long, Array[Double])]] = {
    type Acc = collection.mutable.HashMap[Long,
      collection.mutable.ArrayBuffer[(Long, Array[Long])]]
    def insert(acc: Acc, ccid: Long, vecId: Long, qv: Array[Long]): Acc = {
      val buf = acc.getOrElseUpdate(ccid,
        new collection.mutable.ArrayBuffer[(Long, Array[Long])](fineK + 1))
      if (buf.size < fineK || buf.last._1 > vecId) {
        val at = buf.indexWhere(_._1 > vecId)
        if (at < 0) buf.append((vecId, qv)) else buf.insert(at, (vecId, qv))
        if (buf.size > fineK) buf.remove(fineK)
      }
      acc
    }
    val seeds = rows.treeAggregate(new Acc)(
      seqOp = { case (acc, (vecId, qv, ccid)) => insert(acc, ccid, vecId, qv) },
      combOp = { (a, b) =>
        b.foreach { case (ccid, buf) =>
          buf.foreach { case (vecId, qv) => insert(a, ccid, vecId, qv) } }
        a
      })
    seeds.map { case (ccid, buf) =>
      ccid -> buf.zipWithIndex.map { case ((_, qv), i) =>
        (i.toLong, qv.map(_.toDouble)) }.toArray
    }
  }

  /** One fine-tier Lloyd round as ONE treeAggregate: assign each row
    * within its coarse cell by the EXACT op order of
    * [[graft.functions.NearestInCellExpr]] (self-norm once, cells in
    * fcid order, dot and cell-norm in one index loop, strict
    * improvement, NaN above numbers), and accumulate exact per-(ccid,
    * fcid) long sums and counts. Means divide as double(sum)/double(n)
    * — bit-identical to the plan form's
    * `arraySumLong(qv) cast double / count`. Cells that lose all
    * members emit nothing, like the groupBy that produced no row. */
  private def fineRoundRdd(
      rows: org.apache.spark.rdd.RDD[(Long, Array[Long], Long)],
      cells: collection.Map[Long, Array[(Long, Array[Double])]],
      fineK: Int): collection.Map[Long, Array[(Long, Array[Double])]] = {
    val bc = rows.sparkContext.broadcast(cells)
    // per-ccid dense fineK slots (fcids are always in [0, fineK));
    // sparse across ccids, like the plan form's map-side combine
    type Acc = collection.mutable.HashMap[Long, (Array[Long], Array[Long])]
    try {
      val agg = rows.treeAggregate(new Acc)(
        seqOp = { case (acc, (_, qv, ccid)) =>
          bc.value.get(ccid) match {
            case Some(cs) if cs.nonEmpty =>
              val dim = qv.length
              var qacc = 0.0
              var i = 0
              while (i < dim) {
                val x = qv(i).toDouble; qacc += x * x; i += 1
              }
              val qn = math.sqrt(qacc)
              var bestFcid = 0L
              var bestCos = 0.0
              var c = 0
              var ok = true
              while (ok && c < cs.length) {
                val cent = cs(c)._2
                if (cent.length != dim) ok = false
                else {
                  var dacc = 0.0
                  var cacc = 0.0
                  i = 0
                  while (i < dim) {
                    val y = cent(i)
                    dacc += qv(i).toDouble * y
                    cacc += y * y
                    i += 1
                  }
                  val cos = dacc / (qn * math.sqrt(cacc))
                  val better =
                    if (c == 0) true
                    else if (cos.isNaN != bestCos.isNaN) cos.isNaN
                    else cos > bestCos
                  if (better) { bestFcid = cs(c)._1; bestCos = cos }
                  c += 1
                }
              }
              if (ok) {
                val (sums, ns) = acc.getOrElseUpdate(ccid,
                  (new Array[Long](fineK * dim), new Array[Long](fineK)))
                val off = bestFcid.toInt * dim
                i = 0
                while (i < dim) { sums(off + i) += qv(i); i += 1 }
                ns(bestFcid.toInt) += 1
              }
              acc
            case _ => acc // no cells for this ccid — row unassignable
          }
        },
        combOp = { (a, b) =>
          b.foreach { case (ccid, (s2, n2)) =>
            a.get(ccid) match {
              case Some((s1, n1)) =>
                var i = 0
                while (i < s1.length) { s1(i) += s2(i); i += 1 }
                i = 0
                while (i < n1.length) { n1(i) += n2(i); i += 1 }
              case None => a.put(ccid, (s2, n2))
            }
          }
          a
        })
      agg.map { case (ccid, (sums, ns)) =>
        val dim = sums.length / fineK
        ccid -> (0 until fineK).iterator
          .filter(f => ns(f) > 0)
          .map { f =>
            val cent = new Array[Double](dim)
            var i = 0
            while (i < dim) {
              cent(i) = sums(f * dim + i).toDouble / ns(f).toDouble; i += 1
            }
            (f.toLong, cent)
          }.toArray
      }
    } finally bc.destroy()
  }

  /** Release the blocks behind a [[org.apache.spark.sql.Dataset
    * .localCheckpoint]]-backed frame (falls back to `unpersist` for
    * anything else). Deterministic twin of the GC-based reclaim the
    * eager-checkpoint paths rely on; after this the frame is dead —
    * checkpoint blocks are its only copy — so callers keep the
    * release-after-last-consuming-action contract the persist-based
    * handles already had. Released through
    * [[org.apache.spark.sql.GraftBridge.unpersistRddQuietly]]: the
    * public `RDD.unpersist` WARNs that a truncated lineage cannot
    * recompute — true, intended, and (spec-pinned in PropertySpec's
    * post-free case) unreachable here, so the per-release warning is
    * pure log flood at production scale. */
  private def freeCheckpoint(df: DataFrame): Unit = Ckpt.free(df)

  /** SemDeDup over the [[twoLevelAssign]] substrate with a HARD
    * per-self-join-cell bound — the degenerate-corpus guard the flat
    * [[semDedup]] lacks (an all-near-identical corpus puts ~N vectors
    * in one cluster and its within-cluster join degrades to all-pairs).
    *
    * After assignment, each cluster is hash-partitioned into
    * `ceil(|cluster| / capTarget)` chunks on a portable integer hash
    * of vec_id — NO per-cluster rank window (a rank over a 50 %-of-
    * corpus cluster would itself be the skew bottleneck); expected
    * chunk size is capTarget with multinomial concentration, and the
    * in-chunk ε-ball dedup runs exactly [[semDedup]]'s senior-keeper
    * rule. Chunk boundaries lose cross-chunk pairs, so `levels`
    * REFINEMENT passes re-chunk the SURVIVORS (dups collapse chunk
    * populations, so each pass shrinks dup-heavy clusters
    * geometrically — the degenerate cluster's chunk keepers meet each
    * other at the next level and collapse further). Work per level is
    * ≤ N·capTarget pairs; cluster-confinement semantics (cross-CLUSTER
    * dups invisible, as published) are unchanged. Returns survivor
    * (vec_id, cid). */
  def semDedupScalable(corpus: DataFrame, eps: Double, coarseK: Int = 4,
      fineK: Int = 4, coarseIters: Int = 2, fineIters: Int = 1,
      capTarget: Int = 1024, levels: Int = 2): DataFrame = {
    // Eager + leak-free, like [[twoLevelAssign]]: the survivor frame
    // is (vec_id, cid) — tiny relative to the corpus — so the
    // materialize-then-release trade is clearly right here.
    val (out, release) = semDedupScalableScoped(corpus, eps, coarseK,
      fineK, coarseIters, fineIters, capTarget, levels)
    val eager = out.localCheckpoint(true)
    release()
    eager
  }

  /** [[semDedupScalable]] plus a release handle for the per-level
    * survivor caches (each level's frame feeds both the next level's
    * chunking and its anti-join). */
  def semDedupScalableScoped(corpus: DataFrame, eps: Double,
      coarseK: Int = 4, fineK: Int = 4, coarseIters: Int = 2,
      fineIters: Int = 1, capTarget: Int = 1024, levels: Int = 2)
      : (DataFrame, () => Unit) = {
    val (assigned, releaseAssign) =
      twoLevelAssignScoped(corpus, coarseK, fineK, coarseIters, fineIters)
    val (out, releaseDedup) =
      semDedupChunkedScoped(assigned, eps, capTarget, levels)
    (out, () => { releaseAssign(); releaseDedup(); () })
  }

  /** Per-cluster chunk count for the CURRENT survivor census — the
    * hash-cap law [[semDedupChunkedScoped]] applies each level;
    * exposed so probes/specs can assert the realized chunk bound on
    * the operator's own frames. Returns (cid, __nch). */
  def chunkCounts(survivors: DataFrame, capTarget: Int): DataFrame =
    survivors.groupBy(col("cid"))
      .agg(ceil(count(lit(1)).cast("double") / capTarget)
        .cast("long").as("__nch"))

  /** Portable per-vector chunk id given the cluster's chunk count —
    * `(vec_id · 2654435761) mod 1000003 mod nch` (exact in BIGINT for
    * vec_id < 3.4·10⁹ on both engines). */
  def chunkOf(vecId: Column, nch: Column): Column =
    (vecId * lit(2654435761L)) % lit(1000003L) % nch

  /** The dedup half of [[semDedupScalable]], over a PRECOMPUTED
    * (vec_id, embedding, cid) assignment — the path a published
    * cluster index takes, and the piece probes exercise with in-stage
    * bound asserts. See [[semDedupScalable]] for the chunk-cap and
    * refinement-level semantics. */
  def semDedupChunkedScoped(assigned: DataFrame, eps: Double,
      capTarget: Int, levels: Int): (DataFrame, () => Unit) = {
    require(capTarget > 0 && levels >= 1, "capTarget > 0, levels >= 1")
    val handles = scala.collection.mutable.ListBuffer[DataFrame]()
    // lazy localCheckpoint per level, not persist: each level's plan
    // otherwise embeds every previous level's join/anti-join tree (and
    // the whole assignment build below that), and Catalyst re-analyzes
    // that growing tree at every broadcast, action and cache lookup —
    // the measured cost was driver time, not executor time. Block
    // storage and materialization timing are unchanged.
    var survivors = assigned.select(col("vec_id"), emb, col("cid"))
      .localCheckpoint(false)
    handles += survivors
    (1 to levels).foreach { _ =>
      // chunk count per cluster from the CURRENT survivor census —
      // K-bounded rows of two longs, broadcast by construction
      val chunked = survivors
        .join(broadcast(chunkCounts(survivors, capTarget)), Seq("cid"))
        .withColumn("chunk", chunkOf(col("vec_id"), col("__nch")))
      // ONE shuffle per level: collect each (cid, chunk) cell —
      // capTarget-bounded in expectation, the bound the probe asserts —
      // and run the senior-keeper rule as a tight in-memory kernel
      // ([[graft.functions.ChunkKeepersExpr]]). The join formulation
      // this replaces shuffled up to k² pair rows per cell (each
      // carrying two embeddings), then a `distinct` shuffle and an
      // anti-join shuffle back against the survivors; the kernel is
      // the same k²/2 cosines with early exit, kept set identical
      // (bit-equal cosine math — PropertySpec pins it).
      survivors = chunked
        .groupBy(col("cid"), col("chunk"))
        .agg(sort_array(collect_list(struct(col("vec_id"), emb))).as("__xs"))
        .select(col("cid"), explode(
          graft.functions.VectorExprs.chunkKeepers(col("__xs"), eps)).as("__e"))
        .select(col("__e.vec_id").as("vec_id"),
          col("__e.embedding").as("embedding"), col("cid"))
        .localCheckpoint(false)
      handles += survivors
    }
    val out = survivors.select(col("vec_id"), col("cid"))
    (out, () => { handles.foreach(freeCheckpoint); () })
  }

  /** DuckDB twin of [[twoLevelAssign]] over source CTE/table `src`
    * (vec_id, embedding): coarse Lloyd rounds unrolled (the
    * [[kmeansSql]] pattern), per-cell fine seeds, fine rounds as
    * join-on-ccid windows. Defines `tfin(vec_id, ccid, fcid, cid)`.
    * Every CTE is MATERIALIZED: the chain is deep (tlq→tc*→tca→tg*→
    * tfin) with multi-reference fan-out at each stage, and DuckDB's
    * default inlining re-evaluates the whole prefix per reference —
    * exponential in chain depth (sim_semdedup_auto's sf0.1 row OOM'd
    * on 4 000 vectors; materialized it runs in ~10 s under a 12 GB
    * cap, row-identical at sf0.01). */
  def twoLevelSql(src: String, coarseK: Int, fineK: Int,
      coarseIters: Int, fineIters: Int): String = {
    def dot(x: String, y: String) =
      s"list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) for i in generate_series(1, $Dim)])"
    def cos(q: String, c: String) =
      s"(${dot(q, c)} / (sqrt(${dot(q, q)}) * sqrt(${dot(c, c)})))"
    def cassign(name: String, cents: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, cid, qv FROM (
         |    SELECT q.vec_id, c.cid, q.qv,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${cos("q.qv", "c.cent")} DESC, c.cid) AS r
         |    FROM tlq q, $cents c)
         |  WHERE r = 1
         |)""".stripMargin
    def cupdate(name: String, assigned: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT cid, list(sx / n ORDER BY i) AS cent FROM (
         |    SELECT a.cid, t.i, sum(a.qv[t.i]) AS sx, count(*) AS n
         |    FROM $assigned a
         |    CROSS JOIN (SELECT unnest(generate_series(1, $Dim)) AS i) t
         |    GROUP BY a.cid, t.i)
         |  GROUP BY cid
         |)""".stripMargin
    def fassign(name: String, cents: String, last: Boolean) =
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, ccid, fcid${if (last) s", ccid * $fineK + fcid AS cid" else ", qv"} FROM (
         |    SELECT a.vec_id, a.ccid, c.fcid, a.qv,
         |           row_number() OVER (PARTITION BY a.vec_id
         |             ORDER BY ${cos("a.qv", "c.cent")} DESC, c.fcid) AS r
         |    FROM tca a JOIN $cents c USING (ccid))
         |  WHERE r = 1
         |)""".stripMargin
    def fupdate(name: String, assigned: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT ccid, fcid, list(sx / n ORDER BY i) AS cent FROM (
         |    SELECT a.ccid, a.fcid, t.i, sum(a.qv[t.i]) AS sx, count(*) AS n
         |    FROM $assigned a
         |    CROSS JOIN (SELECT unnest(generate_series(1, $Dim)) AS i) t
         |    GROUP BY a.ccid, a.fcid, t.i)
         |  GROUP BY ccid, fcid
         |)""".stripMargin
    val coarseRounds = (1 to coarseIters).map(r =>
      cassign(s"ta$r", s"tc${r - 1}") + ",\n" +
        cupdate(s"tc$r", s"ta$r")).mkString(",\n")
    val fineRounds = (1 to fineIters).map(r =>
      fassign(s"tfa$r", s"tg${r - 1}", last = false) + ",\n" +
        fupdate(s"tg$r", s"tfa$r")).mkString(",\n")
    s"""tlq AS MATERIALIZED (
       |  SELECT vec_id,
       |    [CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |     for e in embedding] AS qv
       |  FROM $src
       |), tc0 AS MATERIALIZED (
       |  SELECT CAST(vec_id AS BIGINT) AS cid,
       |         [CAST(x AS DOUBLE) for x in qv] AS cent
       |  FROM tlq WHERE vec_id < $coarseK
       |),
       |$coarseRounds,
       |${cassign("tcaq", s"tc$coarseIters")},
       |tca AS MATERIALIZED (SELECT vec_id, cid AS ccid, qv FROM tcaq),
       |tg0 AS MATERIALIZED (
       |  SELECT ccid, CAST(rn - 1 AS BIGINT) AS fcid,
       |         [CAST(x AS DOUBLE) for x in qv] AS cent
       |  FROM (SELECT ccid, qv,
       |          row_number() OVER (PARTITION BY ccid ORDER BY vec_id) AS rn
       |        FROM tca)
       |  WHERE rn <= $fineK
       |),
       |$fineRounds,
       |${fassign("tfin", s"tg$fineIters", last = true)}""".stripMargin
  }

  /** Two-level IVF top-k — the PROBE side at real K. The flat
    * [[topKIvfWith]] cross-joins every query against ALL K centroids
    * (collected to the driver), which is exactly what stops working at
    * the K ≈ 10⁶ a 10⁹-vector index needs. Here probing mirrors the
    * build's hierarchy: rank the √K coarse tier per query (driver
    * state √K×dim — legitimate at any scale), descend into only the
    * `probeCoarse` best cells' fine centroids (|Q|·probeCoarse·fineK
    * rows — probe-batch-sized, never K-wide), keep the `probeFine`
    * best fine cells ACROSS the probed coarse cells jointly, and
    * exact-rank candidates from those cells only. Probe cosines run in
    * the quantized space the centroids were trained in; the final
    * candidate ranking is exact over the original embeddings.
    * Deterministic ties (cos desc, ccid, fcid / vec_id), oracle-
    * replayable ([[topKIvfTwoLevelSql]]). Probing everything
    * (probeCoarse = coarseK, probeFine = coarseK·fineK) degenerates to
    * the exact top-k — the spec's equivalence law. */
  def topKIvfTwoLevel(corpus: DataFrame, queries: DataFrame, k: Int,
      coarseK: Int = 4, fineK: Int = 4, coarseIters: Int = 2,
      fineIters: Int = 1, probeCoarse: Int = 2,
      probeFine: Int = IvfProbe): DataFrame =
    topKIvfTwoLevelScoped(corpus, queries, k, coarseK, fineK,
      coarseIters, fineIters, probeCoarse, probeFine)._1

  /** [[topKIvfTwoLevel]] plus the build-cache release handle. */
  def topKIvfTwoLevelScoped(corpus: DataFrame, queries: DataFrame, k: Int,
      coarseK: Int = 4, fineK: Int = 4, coarseIters: Int = 2,
      fineIters: Int = 1, probeCoarse: Int = 2,
      probeFine: Int = IvfProbe): (DataFrame, () => Unit) = {
    val ix = twoLevelIndex(corpus, coarseK, fineK, coarseIters, fineIters)
    (probeTwoLevel(ix, queries, k, fineK, probeCoarse, probeFine), ix.release)
  }

  /** The serve half of [[topKIvfTwoLevel]] over a prebuilt
    * [[TwoLevelIndex]] (the build-once/serve-many split). */
  def probeTwoLevel(ix: TwoLevelIndex, queries: DataFrame, k: Int,
      fineK: Int, probeCoarse: Int, probeFine: Int): DataFrame = {
    require(probeCoarse > 0 && probeFine > 0, "probe widths must be positive")
    val spark = queries.sparkSession
    import spark.implicits._
    val q = queries.select(col("vec_id").as("qid"), emb.as("qemb"),
      qvec(emb).as("qqv"))
    val coarseDf = ix.coarse.toDF("ccid", "ccent")
    val cprobe = q.crossJoin(broadcast(coarseDf))
      .select(col("qid"), col("qemb"), col("qqv"), col("ccid"),
        graft.functions.VectorExprs.cosine(col("qqv"), col("ccent")).as("ccos"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("ccid"))))
      .filter(col("__r") <= probeCoarse)
      .select(col("qid"), col("qemb"), col("qqv"), col("ccid"))
    // Same deterministic bound as the build side (assignWithQuantizer):
    // under 64 MB of total centroid bytes the cells frame broadcasts;
    // past it (real K ≈ 10⁶) the SMALL side is the probe batch
    // (|Q|·probeCoarse rows), so broadcast that and let cells stay
    // distributed — the probe is never K-wide on any single JVM.
    val cellsJoin =
      if (ix.coarse.size.toLong * fineK * Dim * 8 <= (64L << 20))
        cprobe.join(broadcast(ix.cells), Seq("ccid"))
      else broadcast(cprobe).join(ix.cells, Seq("ccid"))
    val fprobe = cellsJoin
      .select(col("qid"), col("qemb"), col("qqv"), col("ccid"),
        explode(col("cents")).as("ce"))
      .select(col("qid"), col("qemb"), col("ccid"), col("ce.fcid").as("fcid"),
        graft.functions.VectorExprs.cosine(col("qqv"), col("ce.cent")).as("fcos"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("fcos").desc, col("ccid"), col("fcid"))))
      .filter(col("__r") <= probeFine)
      .select(col("qid"), col("qemb"),
        (col("ccid") * fineK + col("fcid")).as("cid"))
    // candidates: corpus vectors in probed fine cells; exact rank.
    // fprobe is |Q|·probeFine rows — always broadcastable — so the
    // corpus side stays a map-side pass (same rationale as
    // [[probeAssigned]])
    broadcast(fprobe)
      .join(ix.assigned.select(col("vec_id").as("cand"), emb, col("cid")),
        Seq("cid"))
      .filter(col("cand") =!= col("qid"))
      .select(col("qid"), col("cand").as("vec_id"),
        cosine(col("qemb"), emb).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }

  /** Publish a [[TwoLevelIndex]] as ONE atomic snapshot version
    * (tables `assigned`, `cells`, `coarse`, `meta`) — the
    * build-once/serve-many split of [[publishIvfIndex]], at the K the
    * two-level tier reaches. The fine-cell frame stays a TABLE (never
    * driver-collected); only the √K coarse tier is collected at serve
    * time. `meta` pins fineK so the serve side composes cid the same
    * way the build did. Returns the committed version. */
  def publishTwoLevelIndex(corpus: DataFrame, dir: String, coarseK: Int,
      fineK: Int, coarseIters: Int = 2, fineIters: Int = 1): Long = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ix = twoLevelIndex(corpus, coarseK, fineK, coarseIters, fineIters)
    val coarseDf = ix.coarse.toDF("ccid", "ccent")
    val meta = Seq(("fineK", fineK.toLong)).toDF("key", "value")
    val v = Snapshot.publishTables(Seq("assigned" -> ix.assigned,
      "cells" -> ix.cells, "coarse" -> coarseDf, "meta" -> meta), dir)
    ix.release()
    v
  }

  /** Serve top-k from a published two-level index (latest version, or
    * pinned) — result-identical to the fused [[topKIvfTwoLevel]] over
    * the corpus the index was built from. */
  def topKIvfTwoLevelServe(spark: org.apache.spark.sql.SparkSession,
      dir: String, queries: DataFrame, k: Int, probeCoarse: Int = 2,
      probeFine: Int = IvfProbe, version: Option[Long] = None): DataFrame = {
    val coarse = Snapshot.readTable(spark, dir, "coarse", version)
      .select(col("ccid").cast("long"),
        transform(col("ccent"), _.cast("double")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)
    val fineK = Snapshot.readTable(spark, dir, "meta", version)
      .filter(col("key") === "fineK")
      .collect().head.getLong(1).toInt
    val ix = TwoLevelIndex(
      Snapshot.readTable(spark, dir, "assigned", version),
      Snapshot.readTable(spark, dir, "cells", version),
      coarse, () => ())
    probeTwoLevel(ix, queries, k, fineK, probeCoarse, probeFine)
  }

  /** Incremental update of a published two-level index: assign
    * `newVecs` with the PUBLISHED coarse tier + fine cells (only the
    * delta pays an assignment pass; the old corpus re-links through
    * the union scan) and publish old ∪ new as the next version — the
    * same freshness trade as [[appendToIvfIndex]], with the same
    * answer to drift: rebuild when [[servedRecallTwoLevel]] says so
    * ([[maintainTwoLevelIndex]]). */
  /** The published quantizer tables + driver-held coarse tier — what
    * every delta-assignment path (append, incremental dedup) loads. */
  private final case class PublishedQuantizer(coarseDf: DataFrame,
      coarse: Seq[(Long, Seq[Double])], cells: DataFrame,
      meta: DataFrame, fineK: Int)

  private def loadQuantizer(spark: org.apache.spark.sql.SparkSession,
      dir: String, version: Option[Long] = None): PublishedQuantizer = {
    val coarseDf = Snapshot.readTable(spark, dir, "coarse", version)
    val coarse = coarseDf
      .select(col("ccid").cast("long"),
        transform(col("ccent"), _.cast("double")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)
    val meta = Snapshot.readTable(spark, dir, "meta", version)
    val fineK = meta.filter(col("key") === "fineK")
      .collect().head.getLong(1).toInt
    PublishedQuantizer(coarseDf, coarse,
      Snapshot.readTable(spark, dir, "cells", version), meta, fineK)
  }

  /** Assign `vecs` with an existing quantizer (driver-held coarse tier
    * + distributed cells) — the delta pass every incremental path
    * pays: map-side coarse assignment, one cells join (broadcast under
    * the build-side bound), no state mutated. Package-visible for the
    * streaming lifecycle ([[graft.streaming.SemDedupStream]]). */
  private[graft] def assignWithQuantizer(coarse: Seq[(Long, Seq[Double])],
      cells: DataFrame, fineK: Int, vecs: DataFrame): DataFrame = {
    val nc = graft.functions.VectorExprs.nearestCentroid(col("qv"), coarse)
    val ac = vecs.select(col("vec_id"), emb, qvec(emb).as("qv"))
      .select(col("vec_id"), emb, col("qv"), nc.getField("cid").as("ccid"))
    val rhs = // same deterministic broadcast bound as the build side
      if (coarse.size.toLong * fineK * Dim * 8 <= (64L << 20))
        broadcast(cells)
      else cells
    ac.join(rhs, Seq("ccid"))
      .select(col("vec_id"), emb, col("ccid"),
        (col("ccid") * fineK +
          graft.functions.VectorExprs.nearestInCell(col("qv"), col("cents"))
            .getField("fcid")).as("cid"))
  }

  private def assignWithQuantizer(q: PublishedQuantizer,
      vecs: DataFrame): DataFrame =
    assignWithQuantizer(q.coarse, q.cells, q.fineK, vecs)

  def appendToTwoLevelIndex(spark: org.apache.spark.sql.SparkSession,
      newVecs: DataFrame, dir: String): Long = {
    val q = loadQuantizer(spark, dir)
    val fresh = assignWithQuantizer(q, newVecs)
    val merged = Snapshot.readTable(spark, dir, "assigned").unionByName(fresh)
    Snapshot.publishTables(Seq("assigned" -> merged, "cells" -> q.cells,
      "coarse" -> q.coarseDf, "meta" -> q.meta), dir)
  }

  /** INCREMENTAL SemDeDup against a published survivor index — the
    * semantic sibling of [[NearDup.minhashIncrement]]: a new crawl
    * increment dedups against the accumulated survivor set WITHOUT
    * rescanning it. The batch pays one delta assignment
    * ([[assignWithQuantizer]]); stored survivors are SENIOR
    * unconditionally (the store is immutable — same contract as the
    * MinHash increment), so a batch vector with a stored ε-neighbor in
    * its cluster drops first, and the remainder dedups among itself
    * with the chunk-capped [[semDedupChunkedScoped]] rule. The
    * store-side join is cluster-confined and the stored survivors are
    * an ε-packing by construction (pairwise dissimilar within chunks),
    * which bounds per-cluster store density. Returns surviving batch
    * rows (vec_id, cid); the read is version-pinned and mutates
    * nothing — [[semDedupAppend]] closes the loop. */
  def semDedupIncrementScoped(spark: org.apache.spark.sql.SparkSession,
      dir: String, batch: DataFrame, eps: Double, capTarget: Int,
      levels: Int = 1, version: Option[Long] = None)
      : (DataFrame, () => Unit) = {
    val q = loadQuantizer(spark, dir, version)
    val bAssigned = assignWithQuantizer(q, batch).persist()
    val stored = Snapshot.readTable(spark, dir, "assigned", version)
      .select(col("cid"), emb.as("se"))
    val vsStore = bAssigned
      .join(stored, Seq("cid"))
      .filter(cosine(emb, col("se")) >= eps)
      .select(col("vec_id")).distinct()
    val fresh = bAssigned.join(vsStore, Seq("vec_id"), "left_anti")
    val (kept, release) = semDedupChunkedScoped(fresh, eps, capTarget, levels)
    (kept, () => { release(); bAssigned.unpersist(); () })
  }

  /** [[semDedupIncrementScoped]] without a published index: the
    * quantizer and survivor set come from `store` directly (built
    * in-session via [[twoLevelIndex]]) — the oracle-replayable form,
    * and the shape a one-shot "dedupe increment B against corpus A"
    * job takes when no index is published yet. Store rows are senior
    * unconditionally; the surviving batch remainder dedups among
    * itself chunk-capped. Returns surviving batch (vec_id, cid). */
  def semDedupIncrementFromCorpusScoped(store: DataFrame, batch: DataFrame,
      eps: Double, coarseK: Int = 4, fineK: Int = 4, coarseIters: Int = 1,
      fineIters: Int = 1, capTarget: Int = 1024, levels: Int = 1)
      : (DataFrame, () => Unit) = {
    val ix = twoLevelIndex(store, coarseK, fineK, coarseIters, fineIters)
    val bAssigned = assignWithQuantizer(ix.coarse, ix.cells, fineK, batch)
      .persist()
    val stored = ix.assigned.select(col("cid"), emb.as("se"))
    val vsStore = bAssigned.join(stored, Seq("cid"))
      .filter(cosine(emb, col("se")) >= eps)
      .select(col("vec_id")).distinct()
    val fresh = bAssigned.join(vsStore, Seq("vec_id"), "left_anti")
    val (kept, release) = semDedupChunkedScoped(fresh, eps, capTarget, levels)
    (kept, () => { release(); bAssigned.unpersist(); ix.release(); () })
  }

  /** DuckDB twin of [[semDedupIncrementFromCorpusScoped]]: composes
    * after [[twoLevelSql]](`storesrc`, …) and a CTE `batchsrc(vec_id,
    * embedding)`; defines `sdikeep(vec_id, cid)`. */
  def semDedupIncrementSql(eps: Double, fineK: Int, coarseIters: Int,
      fineIters: Int, capTarget: Int, levels: Int): String = {
    def dot(x: String, y: String) =
      s"list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) for i in generate_series(1, $Dim)])"
    def cos(q: String, c: String) =
      s"(${dot(q, c)} / (sqrt(${dot(q, q)}) * sqrt(${dot(c, c)})))"
    val lvls = (1 to levels).map { l =>
      s"""bn$l AS (
         |  SELECT cid,
         |    CAST(ceil(CAST(count(*) AS DOUBLE) / $capTarget) AS BIGINT) AS nch
         |  FROM bv${l - 1} GROUP BY cid
         |), bch$l AS (
         |  SELECT s.vec_id, s.cid, s.embedding,
         |         ((s.vec_id * 2654435761) % 1000003) % n.nch AS chunk
         |  FROM bv${l - 1} s JOIN bn$l n USING (cid)
         |), bd$l AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM bch$l a JOIN bch$l b
         |    ON a.cid = b.cid AND a.chunk = b.chunk AND a.vec_id < b.vec_id
         |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= $eps
         |), bv$l AS (
         |  SELECT vec_id, cid, embedding FROM bv${l - 1}
         |  WHERE vec_id NOT IN (SELECT vec_id FROM bd$l)
         |)""".stripMargin
    }.mkString(",\n")
    s"""tbq AS (
       |  SELECT vec_id, embedding,
       |    [CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |     for e in embedding] AS qv
       |  FROM batchsrc
       |), tbc AS (
       |  SELECT vec_id, embedding, qv, ccid FROM (
       |    SELECT b.vec_id, b.embedding, b.qv, c.cid AS ccid,
       |           row_number() OVER (PARTITION BY b.vec_id
       |             ORDER BY ${cos("b.qv", "c.cent")} DESC, c.cid) AS r
       |    FROM tbq b, tc$coarseIters c)
       |  WHERE r = 1
       |), tba AS (
       |  SELECT vec_id, embedding, ccid * $fineK + fcid AS cid FROM (
       |    SELECT a.vec_id, a.embedding, a.ccid, g.fcid,
       |           row_number() OVER (PARTITION BY a.vec_id
       |             ORDER BY ${cos("a.qv", "g.cent")} DESC, g.fcid) AS r
       |    FROM tbc a JOIN tg$fineIters g USING (ccid))
       |  WHERE r = 1
       |), tbd AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM tba b JOIN (
       |    SELECT f.cid, s.embedding FROM tfin f JOIN storesrc s USING (vec_id)
       |  ) st ON b.cid = st.cid
       |  WHERE ${cosineSql("b.embedding", "st.embedding")} >= $eps
       |), bv0 AS (
       |  SELECT vec_id, cid, embedding FROM tba
       |  WHERE vec_id NOT IN (SELECT vec_id FROM tbd)
       |),
       |$lvls,
       |sdikeep AS (SELECT vec_id, cid FROM bv$levels)""".stripMargin
  }

  /** [[semDedupIncrementScoped]] + publish: surviving batch rows join
    * the stored survivor set as the next index version (same
    * quantizer, atomic flip). Returns (survivor count, new version). */
  def semDedupAppend(spark: org.apache.spark.sql.SparkSession,
      dir: String, batch: DataFrame, eps: Double, capTarget: Int,
      levels: Int = 1): (Long, Long) = {
    // Resolve "latest" ONCE: a publish landing mid-call must not split
    // this append across two versions (dedup against v, assign with
    // v+1's quantizer). Every read below is pinned to v0.
    val v0 = Snapshot.latestVersion(spark, dir)
    val (kept, release) = semDedupIncrementScoped(spark, dir, batch, eps,
      capTarget, levels, v0)
    val q = loadQuantizer(spark, dir, v0)
    val keptRows = assignWithQuantizer(q, batch)
      .join(kept.select(col("vec_id")), Seq("vec_id"))
    val merged = Snapshot.readTable(spark, dir, "assigned", v0)
      .unionByName(keptRows)
    val n = kept.count()
    val v = Snapshot.publishTables(Seq("assigned" -> merged,
      "cells" -> q.cells, "coarse" -> q.coarseDf, "meta" -> q.meta), dir)
    release()
    (n, v)
  }

  /** Recall@k of a published TWO-LEVEL index version against the
    * exact top-k over its own corpus — [[servedRecall]] at real K. */
  def servedRecallTwoLevel(spark: org.apache.spark.sql.SparkSession,
      dir: String, queries: DataFrame, k: Int, probeCoarse: Int = 2,
      probeFine: Int = IvfProbe, version: Option[Long] = None): DataFrame = {
    val corpus = Snapshot.readTable(spark, dir, "assigned", version)
      .select(col("vec_id"), emb)
    recallJoin(topKExact(corpus, queries, k),
      topKIvfTwoLevelServe(spark, dir, queries, k, probeCoarse,
        probeFine, version))
  }

  /** [[maintainIvfIndex]] for the two-level tier: measure recall@k on
    * a probe set; below `minRecall`, rebuild the full two-level index
    * from the published corpus and flip atomically. Returns
    * (measured mean recall, Some(newVersion) iff rebuilt). */
  def maintainTwoLevelIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, probeQueries: DataFrame, k: Int, minRecall: Double,
      coarseK: Int, fineK: Int, coarseIters: Int = 2, fineIters: Int = 1,
      probeCoarse: Int = 2, probeFine: Int = IvfProbe): (Double, Option[Long]) = {
    require(minRecall >= 0, "minRecall must be non-negative")
    val mean = servedRecallTwoLevel(spark, dir, probeQueries, k,
      probeCoarse, probeFine)
      .agg(avg(col("recall"))).collect().head match {
        case r if r.isNullAt(0) => 1.0
        case r => r.getDouble(0)
      }
    if (mean < minRecall) {
      val corpus = Snapshot.readTable(spark, dir, "assigned")
        .select(col("vec_id"), emb)
      (mean, Some(publishTwoLevelIndex(corpus, dir, coarseK, fineK,
        coarseIters, fineIters)))
    } else (mean, None)
  }

  /** DuckDB twin of [[topKIvfTwoLevel]] for queries `vec_id < 5`;
    * composes after [[twoLevelSql]] and defines
    * `tlranked(qid, rank, vec_id, cos)`. */
  def topKIvfTwoLevelSql(k: Int, coarseK: Int, fineK: Int,
      coarseIters: Int, fineIters: Int, probeCoarse: Int,
      probeFine: Int): String = {
    def dot(x: String, y: String) =
      s"list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) for i in generate_series(1, $Dim)])"
    def cos(q: String, c: String) =
      s"(${dot(q, c)} / (sqrt(${dot(q, q)}) * sqrt(${dot(c, c)})))"
    s"""tq AS (
       |  SELECT vec_id AS qid, embedding AS qemb,
       |    [CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |     for e in embedding] AS qqv
       |  FROM embeddings WHERE vec_id < 5
       |), tcp AS (
       |  SELECT qid, qemb, qqv, ccid FROM (
       |    SELECT q.qid, q.qemb, q.qqv, c.cid AS ccid,
       |           row_number() OVER (PARTITION BY q.qid
       |             ORDER BY ${cos("q.qqv", "c.cent")} DESC, c.cid) AS r
       |    FROM tq q, tc$coarseIters c)
       |  WHERE r <= $probeCoarse
       |), tfp AS (
       |  SELECT qid, qemb, ccid * $fineK + fcid AS cid FROM (
       |    SELECT p.qid, p.qemb, g.ccid, g.fcid,
       |           row_number() OVER (PARTITION BY p.qid
       |             ORDER BY ${cos("p.qqv", "g.cent")} DESC, g.ccid, g.fcid) AS r
       |    FROM tcp p JOIN tg$fineIters g USING (ccid))
       |  WHERE r <= $probeFine
       |), tlranked AS (
       |  SELECT qid, vec_id, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
       |  FROM (
       |    SELECT p.qid, a.vec_id, ${cosineSql("p.qemb", "e.embedding")} AS cos
       |    FROM tfp p JOIN tfin a USING (cid)
       |    JOIN embeddings e ON e.vec_id = a.vec_id
       |    WHERE a.vec_id <> p.qid)
       |)""".stripMargin
  }

  /** DuckDB twin of [[semDedupScalable]]: [[twoLevelSql]] composed
    * with `levels` chunked-dedup refinement passes. Defines
    * `sdskeep(vec_id, cid)`. */
  def semDedupScalableSql(src: String, eps: Double, coarseK: Int,
      fineK: Int, coarseIters: Int, fineIters: Int, capTarget: Int,
      levels: Int): String = {
    val lvls = (1 to levels).map { l =>
      s"""tn$l AS MATERIALIZED (
         |  SELECT cid,
         |    CAST(ceil(CAST(count(*) AS DOUBLE) / $capTarget) AS BIGINT) AS nch
         |  FROM tv${l - 1} GROUP BY cid
         |), tch$l AS MATERIALIZED (
         |  SELECT s.vec_id, s.cid, s.embedding,
         |         ((s.vec_id * 2654435761) % 1000003) % n.nch AS chunk
         |  FROM tv${l - 1} s JOIN tn$l n USING (cid)
         |), td$l AS MATERIALIZED (
         |  SELECT DISTINCT b.vec_id
         |  FROM tch$l a JOIN tch$l b
         |    ON a.cid = b.cid AND a.chunk = b.chunk AND a.vec_id < b.vec_id
         |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= $eps
         |), tv$l AS MATERIALIZED (
         |  SELECT vec_id, cid, embedding FROM tv${l - 1}
         |  WHERE vec_id NOT IN (SELECT vec_id FROM td$l)
         |)""".stripMargin
    }.mkString(",\n")
    s"""${twoLevelSql(src, coarseK, fineK, coarseIters, fineIters)},
       |tv0 AS MATERIALIZED (
       |  SELECT f.vec_id, f.cid, s.embedding FROM tfin f JOIN $src s USING (vec_id)
       |),
       |$lvls,
       |sdskeep AS (SELECT vec_id, cid FROM tv$levels)""".stripMargin
  }

  /** Deterministic SKEWED corpus — the degenerate-cluster stressor
    * for [[semDedupScalable]]'s cap: every EVEN vec_id becomes a tiny
    * perturbation of vec 0's embedding (base + 0.001·own), so ~50 % of
    * the corpus is near-identical and k-means must shove it into one
    * cluster family. Element-order double math both engines replay
    * ([[skewedCorpusSql]]). */
  def skewedCorpus(e: DataFrame): DataFrame = {
    val base = broadcast(e.filter(col("vec_id") === 0)
      .select(transform(emb, x => x.cast("double")).as("__base")))
    e.crossJoin(base).select(col("vec_id"),
      when(col("vec_id") % 2 === 0,
        zip_with(col("__base"), emb, (b, x) => b + x.cast("double") * lit(0.001)))
        .otherwise(transform(emb, x => x.cast("double"))).as("embedding"))
  }

  /** CTE `skewsrc(vec_id, embedding)` replaying [[skewedCorpus]]. */
  def skewedCorpusSql: String =
    s"""skewsrc AS (
       |  SELECT e.vec_id,
       |    CASE WHEN e.vec_id % 2 = 0
       |      THEN [CAST(b.embedding[i] AS DOUBLE) + CAST(e.embedding[i] AS DOUBLE) * CAST(0.001 AS DOUBLE)
       |            for i in generate_series(1, $Dim)]
       |      ELSE [CAST(x AS DOUBLE) for x in e.embedding] END AS embedding
       |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) b
       |)""".stripMargin

  /** Recall@k of the IVF tier against the exact top-k — the
    * index-quality gauge every ANN deployment watches (FAISS reports
    * the same number): per query, the fraction of the true top-k the
    * probed buckets recovered. Returns (qid, n_hits, recall).
    *
    * Scale shape: both tiers already confine their per-query work
    * (queries broadcast; IVF scans ~nProbe/K of the corpus), and the
    * comparison itself joins two |Q|·k frames — evaluation-set-sized,
    * never corpus-sized. The exact tier is the [[topKExact]] baseline,
    * so measuring recall costs one brute pass over the corpus per
    * evaluation batch; run it on a sampled query set, not per-query in
    * production. */
  def ivfRecall(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    recallJoin(topKExact(corpus, queries, k), topKIvf(corpus, queries, k))

  /** (qid, n_hits, recall) from an exact and an approximate top-k
    * frame — the comparison joins two |Q|·k frames, never
    * corpus-sized. */
  private[graft] def recallJoin(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select(col("qid"), col("vec_id"))
      .join(approx.select(col("qid"), col("vec_id"), lit(1L).as("__hit")),
        Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("__n"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .select(col("qid"), col("n_hits"),
        (col("n_hits").cast("double") / col("__n")).as("recall"))

  /** Recall@k of a PUBLISHED index version against the exact top-k
    * over the index's own corpus — [[ivfRecall]] for the serving tier.
    * The exact side is one brute pass over the published corpus per
    * probe batch: run it on a sampled probe set at a maintenance
    * cadence, not per production query. */
  def servedRecall(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, version: Option[Long] = None): DataFrame = {
    // one pinned version: the exact baseline and the served tier must
    // gauge the SAME index generation
    val v = version.orElse(Snapshot.latestVersion(spark, dir))
    val corpus = Snapshot.readTable(spark, dir, "assigned", v)
      .select(col("vec_id"), emb)
    recallJoin(topKExact(corpus, queries, k),
      topKIvfServe(spark, dir, queries, k, v))
  }

  /** The index HEALTH LOOP closing [[appendToIvfIndex]]'s freshness
    * trade: appends reuse the published quantizer, so centroid drift
    * accumulates until probed buckets stop covering the true
    * neighbors. Measure recall@k on a probe query set; below
    * `minRecall`, rebuild from the FULL published corpus
    * ([[publishIvfIndex]] — fresh k-means + reassignment) and publish
    * as the next version through the same atomic snapshot flip, so
    * serving readers pin either the old or the new index, never a
    * mix. Returns (measured mean recall, Some(newVersion) iff a
    * rebuild was triggered). */
  def maintainIvfIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, probeQueries: DataFrame, k: Int, minRecall: Double,
      kCentroids: Int = KmK, iters: Int = KmIters): (Double, Option[Long]) = {
    require(minRecall >= 0, "minRecall must be non-negative")
    val mean = servedRecall(spark, dir, probeQueries, k)
      .agg(avg(col("recall"))).collect().head match {
        case r if r.isNullAt(0) => 1.0 // no probes: nothing measurable
        case r => r.getDouble(0)
      }
    if (mean < minRecall) {
      val corpus = Snapshot.readTable(spark, dir, "assigned")
        .select(col("vec_id"), emb)
      (mean, Some(publishIvfIndex(corpus, dir, kCentroids, iters)))
    } else (mean, None)
  }

  /** DuckDB twin of [[ivfRecall]] for queries `vec_id < 5`; composes
    * after [[ivfSql]] (which defines the IVF `ranked`) and defines
    * `rec(qid, n_hits, recall)`. */
  def ivfRecallSql(k: Int): String =
    s"""xq AS (
       |  SELECT vec_id AS qid, embedding AS qemb FROM embeddings WHERE vec_id < 5
       |), xrk AS (
       |  SELECT qid, vec_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
       |  FROM (
       |    SELECT q.qid, e.vec_id, ${cosineSql("q.qemb", "e.embedding")} AS cos
       |    FROM embeddings e, xq q WHERE e.vec_id <> q.qid)
       |), rec AS (
       |  SELECT x.qid, CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |    sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) AS recall
       |  FROM (SELECT qid, vec_id FROM xrk WHERE rank <= $k) x
       |  LEFT JOIN (SELECT qid, vec_id FROM ranked WHERE rank <= $k) i
       |    ON x.qid = i.qid AND x.vec_id = i.vec_id
       |  GROUP BY x.qid
       |)""".stripMargin

  /** Double cosine between list columns `a` and `b` (dim [[Dim]]). */
  def cosineSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) for i in generate_series(1, $Dim)])"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** CTE `sigs(vec_id, embedding, sig)`. */
  def lshSigSql: String = {
    val bitTerms = planes.zipWithIndex.map { case (p, k) =>
      val planeLit = p.mkString("[", ", ", "]")
      s"""CASE WHEN list_sum([qv[i] * ($planeLit)[i]
         |  for i in generate_series(1, $Dim)]) >= 0
         |  THEN ${1L << k} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""qvecs AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    [CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |     for e in embedding] AS qv
       |  FROM embeddings
       |), sigs AS MATERIALIZED (
       |  SELECT vec_id, embedding, $bitTerms AS sig FROM qvecs
       |)""".stripMargin
  }
}
