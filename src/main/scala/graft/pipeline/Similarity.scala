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
    * sequential fold in element order. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Integer-quantized copy of an embedding (exact cross-engine). */
  private def qvec(c: Column): Column =
    transform(c, e => floor(e.cast("double") * 10000d + 0.5d).cast("long"))

  /** LSH signature: bit k = sign of ⟨quantized vec, plane_k⟩. */
  def lshSig(c: Column): Column = {
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

  /** Brute-force threshold pairs (embedding near-dup baseline). */
  def pairsExact(corpus: DataFrame, minCos: Double): DataFrame = {
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

  /** (vec_id, embedding, cid) — nearest-centroid assignment. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = broadcast(centroids.select(
      col("vec_id").as("cid"), emb.as("cemb")))
    val scored = corpus.select(col("vec_id"), emb).crossJoin(cents)
      .select(col("vec_id"), emb, col("cid"),
        cosine(emb, col("cemb")).as("ccos"))
    scored.withColumn("__r", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("cid"))))
      .filter(col("__r") === 1)
      .select(col("vec_id"), emb, col("cid"))
  }

  /** IVF top-k: probe the query's nearest nProbe buckets, exact cosine
    * rank within them. */
  def topKIvf(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val centroids = corpus.filter(col("vec_id") < IvfK)
    val assigned = ivfAssign(corpus, centroids)
    val cents = broadcast(centroids.select(
      col("vec_id").as("cid"), emb.as("cemb")))
    // per query: nProbe nearest centroid ids
    val q = queries.select(col("vec_id").as("qid"), emb.as("qemb"))
    val probes = q.crossJoin(cents)
      .select(col("qid"), col("qemb"), col("cid"),
        cosine(col("qemb"), col("cemb")).as("ccos"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid"))))
      .filter(col("__r") <= IvfProbe)
      .select(col("qid"), col("qemb"), col("cid"))
    // candidates: corpus vectors in probed buckets; rank exact
    probes.join(assigned.withColumnRenamed("vec_id", "cand"), Seq("cid"))
      .filter(col("cand") =!= col("qid"))
      .select(col("qid"), col("cand").as("vec_id"),
        cosine(col("qemb"), emb).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }

  // ---- DuckDB oracle builders ----

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
    s"""qvecs AS (
       |  SELECT vec_id, embedding,
       |    [CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |     for e in embedding] AS qv
       |  FROM embeddings
       |), sigs AS (
       |  SELECT vec_id, embedding, $bitTerms AS sig FROM qvecs
       |)""".stripMargin
  }
}
