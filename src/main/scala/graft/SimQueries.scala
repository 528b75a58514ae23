package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity
import graft.ts.Round6

/** Driver-checked queries for similarity search over the embeddings
  * table (brute-force baseline + LSH scale path — see
  * [[graft.pipeline.Similarity]]). */
object SimQueries {

  type Q = (SparkSession, String) => DataFrame

  private val K = 10
  private val MinCos = 0.35

  /** Cache unless an equivalent plan is already cached — the bench
    * runs every headline query three passes, and an unguarded
    * `.cache()` on the identical plan floods the tail with
    * `CacheManager: Asked to cache already cached data` warnings
    * (the driver tail-captures ~2.7 KB; warning spam once truncated
    * the bench line past parseability). `storageLevel` is a
    * CacheManager lookup by plan, so the second pass sees the first
    * pass's entry. */
  private[graft] def cacheOnce(df: DataFrame): Unit =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      df.cache(); ()
    }

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // brute-force cosine top-10 for 5 query vectors (broadcast side)
    ("sim_topk_exact",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        Similarity.topKExact(e, e.filter(col("vec_id") < 5), K)
          .select(col("qid").cast("long").as("qid"), col("rank"),
            col("vec_id").cast("long").as("vec_id"),
            Round6.r6(col("cos")).as("cos"))
          .orderBy("qid", "rank")
      }): Q,
      Some(
        s"""WITH q AS (
           |  SELECT vec_id AS qid, embedding AS qemb FROM embeddings WHERE vec_id < 5
           |), scored AS (
           |  SELECT q.qid, e.vec_id,
           |         ${Similarity.cosineSql("q.qemb", "e.embedding")} AS cos
           |  FROM embeddings e, q WHERE e.vec_id <> q.qid
           |), ranked AS (
           |  SELECT qid, vec_id, cos,
           |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
           |  FROM scored
           |)
           |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
           |       CAST(vec_id AS BIGINT) AS vec_id, ${Round6.r6Sql("cos")} AS cos
           |FROM ranked WHERE rank <= $K ORDER BY qid, rank""".stripMargin)),

    // hard-negative mining (exact tier): per query, nearest
    // different-label vectors — the contrastive-training negative set
    ("sim_hard_negatives",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        Similarity.hardNegatives(e, e.filter(col("vec_id") < 5), K)
          .select(col("qid").cast("long").as("qid"), col("rank"),
            col("vec_id").cast("long").as("vec_id"),
            Round6.r6(col("cos")).as("cos"))
          .orderBy("qid", "rank")
      }): Q,
      Some(
        s"""WITH q AS (
           |  SELECT vec_id AS qid, embedding AS qemb, label AS qlabel
           |  FROM embeddings WHERE vec_id < 5
           |), scored AS (
           |  SELECT q.qid, e.vec_id,
           |         ${Similarity.cosineSql("q.qemb", "e.embedding")} AS cos
           |  FROM embeddings e, q
           |  WHERE e.vec_id <> q.qid AND e.label <> q.qlabel
           |), ranked AS (
           |  SELECT qid, vec_id, cos,
           |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
           |  FROM scored
           |)
           |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
           |       CAST(vec_id AS BIGINT) AS vec_id, ${Round6.r6Sql("cos")} AS cos
           |FROM ranked WHERE rank <= $K ORDER BY qid, rank""".stripMargin)),

    // hard-negative mining (IVF scale tier): over-fetch 4K from the
    // k-means index, drop same-label, keep the K nearest survivors
    ("sim_hard_negatives_ivf",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        Similarity.hardNegativesIvf(e, e.filter(col("vec_id") < 5), K)
          .select(col("qid").cast("long").as("qid"), col("rank"),
            col("vec_id").cast("long").as("vec_id"),
            Round6.r6(col("cos")).as("cos"))
          .orderBy("qid", "rank")
      }): Q,
      Some(
        s"""WITH ${Similarity.kmeansSql()},
           |assignedk AS (
           |  SELECT vec_id, embedding, cid FROM (
           |    SELECT e.vec_id, e.embedding, c.cid,
           |           row_number() OVER (PARTITION BY e.vec_id
           |             ORDER BY ${Similarity.cosineSql("e.embedding", "c.cent")} DESC, c.cid) AS r
           |    FROM embeddings e, c${Similarity.KmIters} c)
           |  WHERE r = 1
           |), probesk AS (
           |  SELECT qid, qemb, cid FROM (
           |    SELECT q.vec_id AS qid, q.embedding AS qemb, c.cid,
           |           row_number() OVER (PARTITION BY q.vec_id
           |             ORDER BY ${Similarity.cosineSql("q.embedding", "c.cent")} DESC, c.cid) AS r
           |    FROM embeddings q, c${Similarity.KmIters} c WHERE q.vec_id < 5)
           |  WHERE r <= ${Similarity.IvfProbe}
           |), rankedk AS (
           |  SELECT qid, vec_id, cos,
           |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
           |  FROM (
           |    SELECT p.qid, a.vec_id, ${Similarity.cosineSql("p.qemb", "a.embedding")} AS cos
           |    FROM probesk p JOIN assignedk a USING (cid)
           |    WHERE a.vec_id <> p.qid)
           |), neg AS (
           |  SELECT r.qid, r.vec_id, r.cos,
           |         row_number() OVER (PARTITION BY r.qid ORDER BY r.rank) AS nrank
           |  FROM rankedk r
           |  JOIN embeddings e ON r.vec_id = e.vec_id
           |  JOIN embeddings q ON r.qid = q.vec_id
           |  WHERE r.rank <= ${K * 4} AND e.label <> q.label
           |)
           |SELECT CAST(qid AS BIGINT) AS qid, CAST(nrank AS BIGINT) AS rank,
           |       CAST(vec_id AS BIGINT) AS vec_id, ${Round6.r6Sql("cos")} AS cos
           |FROM neg WHERE nrank <= $K ORDER BY qid, rank""".stripMargin)),

    // brute-force threshold pairs — the exact near-dup baseline
    ("sim_pairs_exact",
      ((s, d) => Similarity.pairsExact(Tables.embeddings(s, d), MinCos)
        .select(col("vec_a").cast("long").as("vec_a"),
          col("vec_b").cast("long").as("vec_b"),
          Round6.r6(col("cos")).as("cos"))
        .orderBy("vec_a", "vec_b")): Q,
      Some(
        s"""SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b,
           |       ${Round6.r6Sql(Similarity.cosineSql("a.embedding", "b.embedding"))} AS cos
           |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           |WHERE ${Similarity.cosineSql("a.embedding", "b.embedding")} >= $MinCos
           |ORDER BY vec_a, vec_b""".stripMargin)),

    // semantic contamination: corpus vecs (id % 5 != 0) within 0.35
    // cosine of any eval vec (id % 5 == 0) — LSH cross-frame
    // candidates, exact verify, per-vector hit census
    ("sim_semantic_contam",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        Similarity.semanticContamination(
            e.filter(col("vec_id") % 5 =!= 0), e.filter(col("vec_id") % 5 === 0),
            MinCos)
          .select(col("vec_id").cast("long").as("vec_id"),
            col("n_hits").cast("long").as("n_hits"), col("max_cos"))
          .orderBy("vec_id")
      }): Q,
      Some(
        s"""WITH ${Similarity.lshSigSql},
           |bands AS (
           |  SELECT vec_id, j AS bix,
           |         (sig >> (j * ${Similarity.BandBits})) & ${(1L << Similarity.BandBits) - 1} AS bkey
           |  FROM sigs, (SELECT unnest(generate_series(0, ${Similarity.NumBands - 1})) AS j)
           |), cand AS (
           |  SELECT DISTINCT a.vec_id, b.vec_id AS eid
           |  FROM bands a JOIN bands b ON a.bix = b.bix AND a.bkey = b.bkey
           |  WHERE a.vec_id % 5 <> 0 AND b.vec_id % 5 = 0
           |), ver AS (
           |  SELECT c.vec_id, ${Similarity.cosineSql("ea.embedding", "eb.embedding")} AS cos
           |  FROM cand c
           |  JOIN embeddings ea ON ea.vec_id = c.vec_id
           |  JOIN embeddings eb ON eb.vec_id = c.eid
           |)
           |SELECT CAST(vec_id AS BIGINT) AS vec_id,
           |       CAST(count(*) AS BIGINT) AS n_hits,
           |       ${Round6.r6Sql("max(cos)")} AS max_cos
           |FROM ver WHERE cos >= $MinCos
           |GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // IVF ANN: nearest-centroid buckets, nProbe probing, exact rank
    ("sim_topk_ivf",
      ((s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.topKIvf(e, e.filter(col("vec_id") < 5), K)
          .select(col("qid").cast("long").as("qid"), col("rank"),
            col("vec_id").cast("long").as("vec_id"),
            Round6.r6(col("cos")).as("cos"))
          .orderBy("qid", "rank")
      }): Q,
      Some(
        s"""WITH ${Similarity.ivfSql(K)}
           |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
           |       CAST(vec_id AS BIGINT) AS vec_id, ${Round6.r6Sql("cos")} AS cos
           |FROM ranked WHERE rank <= $K ORDER BY qid, rank""".stripMargin)),

    // embedding near-dup clusters: components over the LSH pair graph
    ("sim_clusters",
      ((s, d) => pipeline.NearDup.clusters(
        Similarity.pairsLsh(Tables.embeddings(s, d), MinCos)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
        .select(col("doc_id").cast("long").as("vec_id"),
          col("cluster").cast("long").as("cluster"))
        .orderBy("vec_id")): Q,
      Some(
        s"""WITH RECURSIVE ${Similarity.lshSigSql},
           |bands AS MATERIALIZED (
           |  SELECT vec_id, embedding, j AS bix,
           |         (sig >> (j * ${Similarity.BandBits})) & ${(1L << Similarity.BandBits) - 1} AS bkey
           |  FROM sigs, (SELECT unnest(generate_series(0, ${Similarity.NumBands - 1})) AS j)
           |), out AS MATERIALIZED (
           |  SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
           |  FROM bands a JOIN bands b ON a.bix = b.bix AND a.bkey = b.bkey
           |  WHERE a.vec_id < b.vec_id
           |    AND ${Similarity.cosineSql("a.embedding", "b.embedding")} >= $MinCos
           |), ${pipeline.NearDup.clustersSql}
           |SELECT CAST(doc_id AS BIGINT) AS vec_id, CAST(cluster AS BIGINT) AS cluster
           |FROM comp ORDER BY vec_id""".stripMargin)),

    // IVF probing seeded by the k-means centroids — the production
    // index build, end-to-end oracle-replayed (kmeans CTEs + probe)
    ("sim_topk_ivf_km",
      ((s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.topKIvfKmeans(e, e.filter(col("vec_id") < 5), K)
          .select(col("qid").cast("long").as("qid"), col("rank"),
            col("vec_id").cast("long").as("vec_id"),
            Round6.r6(col("cos")).as("cos"))
          .orderBy("qid", "rank")
      }): Q,
      Some(
        s"""WITH ${Similarity.kmeansSql()},
           |assignedk AS (
           |  SELECT vec_id, embedding, cid FROM (
           |    SELECT e.vec_id, e.embedding, c.cid,
           |           row_number() OVER (PARTITION BY e.vec_id
           |             ORDER BY ${Similarity.cosineSql("e.embedding", "c.cent")} DESC, c.cid) AS r
           |    FROM embeddings e, c${Similarity.KmIters} c)
           |  WHERE r = 1
           |), probesk AS (
           |  SELECT qid, qemb, cid FROM (
           |    SELECT q.vec_id AS qid, q.embedding AS qemb, c.cid,
           |           row_number() OVER (PARTITION BY q.vec_id
           |             ORDER BY ${Similarity.cosineSql("q.embedding", "c.cent")} DESC, c.cid) AS r
           |    FROM embeddings q, c${Similarity.KmIters} c WHERE q.vec_id < 5)
           |  WHERE r <= ${Similarity.IvfProbe}
           |), rankedk AS (
           |  SELECT qid, vec_id, cos,
           |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
           |  FROM (
           |    SELECT p.qid, a.vec_id, ${Similarity.cosineSql("p.qemb", "a.embedding")} AS cos
           |    FROM probesk p JOIN assignedk a USING (cid)
           |    WHERE a.vec_id <> p.qid)
           |)
           |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
           |       CAST(vec_id AS BIGINT) AS vec_id, ${Round6.r6Sql("cos")} AS cos
           |FROM rankedk WHERE rank <= $K ORDER BY qid, rank""".stripMargin)),

    // k-means corpus clustering (3 unrolled Lloyd rounds, first-K seeds)
    ("sim_kmeans",
      ((s, d) => Similarity.kmeans(Tables.embeddings(s, d))
        .select(col("vec_id").cast("long").as("vec_id"),
          col("cid").cast("long").as("cid"),
          Round6.r6(col("cos")).as("cos"))
        .orderBy("vec_id")): Q,
      Some(
        s"""WITH ${Similarity.kmeansSql()}
           |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS BIGINT) AS cid,
           |       ${Round6.r6Sql("cos")} AS cos
           |FROM outk ORDER BY vec_id""".stripMargin)),

    // int8 scalar quantization: per-dim symmetric scales, exact integer
    // qnorm2 invariant + per-vector dequantization mse
    ("sim_quantize",
      ((s, d) => Similarity.quantizeInt8(Tables.embeddings(s, d))
        .select(col("vec_id").cast("long").as("vec_id"), col("qnorm2"),
          Round6.r6(col("mse")).as("mse"))
        .orderBy("vec_id")): Q,
      Some(
        s"""WITH ${Similarity.quantizeInt8Sql}
           |SELECT CAST(vec_id AS BIGINT) AS vec_id, qnorm2,
           |       ${Round6.r6Sql("mse")} AS mse
           |FROM outq ORDER BY vec_id""".stripMargin)),

    // quantized-tier top-10: exact integer int8×int8 dot ranking
    ("sim_topk_q8",
      ((s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.topKQuantized(e, e.filter(col("vec_id") < 5), K)
          .select(col("qid").cast("long").as("qid"), col("rank"),
            col("vec_id").cast("long").as("vec_id"), col("qdot"))
          .orderBy("qid", "rank")
      }): Q,
      Some(
        s"""WITH ${Similarity.quantizeInt8Sql},
           |${Similarity.topKQuantizedSql("vec_id < 5")}
           |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
           |       CAST(vec_id AS BIGINT) AS vec_id, qdot
           |FROM rankedq WHERE rank <= $K ORDER BY qid, rank""".stripMargin)),

    // IVF over the quantized tier (the production serving shape):
    // first-K centroid buckets, nProbe probing, exact int8 dot ranking
    ("sim_topk_ivf_q8",
      ((s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.topKIvfQ8(e, e.filter(col("vec_id") < 5), K)
          .select(col("qid").cast("long").as("qid"), col("rank"),
            col("vec_id").cast("long").as("vec_id"), col("qdot"))
          .orderBy("qid", "rank")
      }): Q,
      Some(
        s"""WITH ${Similarity.quantizeInt8Sql},
           |${Similarity.topKQuantizedSql("vec_id < 5")},
           |${Similarity.topKIvfQ8Sql("q.vec_id < 5")}
           |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
           |       CAST(vec_id AS BIGINT) AS vec_id, qdot
           |FROM rankedivq WHERE rank <= $K ORDER BY qid, rank""".stripMargin)),

    // product quantization: per-subspace codebooks (2 Lloyd rounds,
    // first-16 seeds), 4-byte codes — code_key pins every code element
    // exactly; rerr is the reconstruction-quality gauge
    ("sim_pq_encode",
      ((s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.pqEncode(e, Similarity.pqCodebooks(e))
          .select(col("vec_id").cast("long").as("vec_id"), col("code_key"),
            Round6.r6(col("rerr")).as("rerr"))
          .orderBy("vec_id")
      }): Q,
      Some(
        s"""WITH ${Similarity.pqSql()},
           |${Similarity.pqEncodeSql}
           |SELECT CAST(vec_id AS BIGINT) AS vec_id, code_key,
           |       ${Round6.r6Sql("rerr")} AS rerr
           |FROM pqout ORDER BY vec_id""".stripMargin)),

    // PQ asymmetric-distance top-10: per-query LUT of subvector-times-
    // codeword dots, candidates scored by M table lookups on the code
    ("sim_topk_pq",
      ((s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.topKPqAdc(e, e.filter(col("vec_id") < 5), K,
            Similarity.pqCodebooks(e))
          .select(col("qid").cast("long").as("qid"), col("rank"),
            col("vec_id").cast("long").as("vec_id"),
            Round6.r6(col("adot")).as("adot"))
          .orderBy("qid", "rank")
      }): Q,
      Some(
        s"""WITH ${Similarity.pqSql()},
           |${Similarity.topKPqSql("q.vec_id < 5")}
           |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
           |       CAST(vec_id AS BIGINT) AS vec_id, ${Round6.r6Sql("adot")} AS adot
           |FROM pqranked WHERE rank <= $K ORDER BY qid, rank""".stripMargin)),

    // IVF-PQ (the FAISS workhorse): coarse buckets bound candidate
    // volume, 4-byte codes bound per-candidate cost
    ("sim_topk_ivf_pq",
      ((s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.topKIvfPq(e, e.filter(col("vec_id") < 5), K,
            Similarity.pqCodebooks(e))
          .select(col("qid").cast("long").as("qid"), col("rank"),
            col("vec_id").cast("long").as("vec_id"),
            Round6.r6(col("adot")).as("adot"))
          .orderBy("qid", "rank")
      }): Q,
      Some(
        s"""WITH ${Similarity.pqSql()},
           |${Similarity.topKPqSql("q.vec_id < 5")},
           |${Similarity.topKIvfPqSql("q.vec_id < 5")}
           |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
           |       CAST(vec_id AS BIGINT) AS vec_id, ${Round6.r6Sql("adot")} AS adot
           |FROM pqivfranked WHERE rank <= $K ORDER BY qid, rank""".stripMargin)),

    // RESIDUAL IVF-PQ (FAISS IVFADC form): books train on x − c(x)
    // long differences; candidates score (⟨q,c_b⟩ + ⟨q,r̃⟩)/1e8 with
    // the exact integer bucket dot added before the one division
    ("sim_topk_ivf_pq_res",
      ((s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.topKIvfPqResidual(e, e.filter(col("vec_id") < 5), K)
          .select(col("qid").cast("long").as("qid"), col("rank"),
            col("vec_id").cast("long").as("vec_id"),
            Round6.r6(col("adot")).as("adot"))
          .orderBy("qid", "rank")
      }): Q,
      Some(
        s"""WITH ${Similarity.residualPqSql("q.vec_id < 5")}
           |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
           |       CAST(vec_id AS BIGINT) AS vec_id, ${Round6.r6Sql("adot")} AS adot
           |FROM rranked WHERE rank <= $K ORDER BY qid, rank""".stripMargin)),

    // PQ quality gauge: recall@10 of the 64x-compressed ADC ranking
    // vs the exact top-10 — what the memory reduction costs in
    // ranking fidelity (the number that sizes M/Ksub)
    ("sim_recall_pq",
      ((s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.pqRecall(e, e.filter(col("vec_id") < 5), K,
            Similarity.pqCodebooks(e))
          .select(col("qid").cast("long").as("qid"), col("n_hits"),
            Round6.r6(col("recall")).as("recall"))
          .orderBy("qid")
      }): Q,
      Some(
        s"""WITH ${Similarity.pqSql()},
           |${Similarity.topKPqSql("q.vec_id < 5")},
           |${Similarity.pqRecallSql(K)}
           |SELECT CAST(qid AS BIGINT) AS qid, n_hits,
           |       ${Round6.r6Sql("recall")} AS recall
           |FROM prec ORDER BY qid""".stripMargin)),

    // ANN quality gauge: per-query recall@10 of the IVF tier vs the
    // exact top-10 (the number FAISS-style deployments watch)
    ("sim_recall_ivf",
      ((s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.ivfRecall(e, e.filter(col("vec_id") < 5), K)
          .select(col("qid").cast("long").as("qid"), col("n_hits"),
            Round6.r6(col("recall")).as("recall"))
          .orderBy("qid")
      }): Q,
      Some(
        s"""WITH ${Similarity.ivfSql(K)},
           |${Similarity.ivfRecallSql(K)}
           |SELECT CAST(qid AS BIGINT) AS qid, n_hits,
           |       ${Round6.r6Sql("recall")} AS recall
           |FROM rec ORDER BY qid""".stripMargin)),

    // SemDeDup: k-means buckets, drop within-cluster epsilon-neighbors
    // of a more-senior vector, keep one representative per ball
    ("sim_semdedup",
      ((s, d) => Similarity.semDedup(Tables.embeddings(s, d), 0.4)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("cid").cast("long").as("cid"))
        .orderBy("vec_id")): Q,
      Some(
        s"""WITH ${Similarity.kmeansSql()},
           |${Similarity.semDedupSql(0.4)}
           |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS BIGINT) AS cid
           |FROM sdkeep ORDER BY vec_id""".stripMargin)),

    // two-level (coarse → fine) k-means: the K ≈ 10⁶-capable
    // clustering substrate — coarse driver-bounded, fine distributed
    ("sim_two_level_kmeans",
      ((s, d) => {
        val (out, release) = Similarity.twoLevelAssignScoped(
          Tables.embeddings(s, d), coarseK = 4, fineK = 4,
          coarseIters = 2, fineIters = 1)
        val res = out.select(col("vec_id").cast("long").as("vec_id"),
          col("ccid").cast("long").as("ccid"),
          col("cid").cast("long").as("cid"))
          .orderBy("vec_id")
        // the oracle dump is one action; release caches afterwards is
        // safe because orderBy output is what gets written
        SimQueries.cacheOnce(res); res.count(); release()
        res
      }): Q,
      Some(
        s"""WITH ${Similarity.twoLevelSql("embeddings", 4, 4, 2, 1)}
           |SELECT CAST(vec_id AS BIGINT) AS vec_id,
           |       CAST(ccid AS BIGINT) AS ccid, CAST(cid AS BIGINT) AS cid
           |FROM tfin ORDER BY vec_id""".stripMargin)),

    // two-level IVF serving: probe the coarse tier, descend into only
    // the probed cells' fine centroids, exact-rank candidates — the
    // probe side that survives K ≈ 10⁶ where flat probing cannot
    ("sim_topk_two_level",
      ((s, d) => {
        val e = Tables.embeddings(s, d)
        val (out, release) = Similarity.topKIvfTwoLevelScoped(
          e, e.filter(col("vec_id") < 5), K, coarseK = 4, fineK = 4,
          coarseIters = 2, fineIters = 1, probeCoarse = 2, probeFine = 4)
        val res = out.select(col("qid").cast("long").as("qid"), col("rank"),
          col("vec_id").cast("long").as("vec_id"),
          Round6.r6(col("cos")).as("cos"))
          .orderBy("qid", "rank")
        SimQueries.cacheOnce(res); res.count(); release()
        res
      }): Q,
      Some(
        s"""WITH ${Similarity.twoLevelSql("embeddings", 4, 4, 2, 1)},
           |${Similarity.topKIvfTwoLevelSql(K, 4, 4, 2, 1, 2, 4)}
           |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
           |       CAST(vec_id AS BIGINT) AS vec_id, ${Round6.r6Sql("cos")} AS cos
           |FROM tlranked WHERE rank <= $K ORDER BY qid, rank""".stripMargin)),

    // SemDeDup with the degenerate-cluster guard: ~50% of vectors made
    // near-identical (one giant cluster), hash-chunk cap bounds every
    // self-join cell, refinement levels collapse the chunk keepers
    ("sim_semdedup_skew",
      ((s, d) => {
        val skew = Similarity.skewedCorpus(Tables.embeddings(s, d))
        val (out, release) = Similarity.semDedupScalableScoped(
          skew, eps = 0.9, coarseK = 4, fineK = 4, coarseIters = 2,
          fineIters = 1, capTarget = 16, levels = 2)
        val res = out.select(col("vec_id").cast("long").as("vec_id"),
          col("cid").cast("long").as("cid")).orderBy("vec_id")
        SimQueries.cacheOnce(res); res.count(); release()
        res
      }): Q,
      Some(
        s"""WITH ${Similarity.skewedCorpusSql},
           |${Similarity.semDedupScalableSql("skewsrc", 0.9, 4, 4, 2, 1, 16, 2)}
           |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS BIGINT) AS cid
           |FROM sdskeep ORDER BY vec_id""".stripMargin)),

    // incremental SemDeDup: the odd half arrives as a batch and dedups
    // against the even half's published cluster state — store rows
    // senior, remainder chunk-capped among itself
    ("sim_semdedup_inc",
      ((s, d) => {
        val e = Tables.embeddings(s, d)
        val (out, release) = Similarity.semDedupIncrementFromCorpusScoped(
          e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
          eps = 0.4, coarseK = 4, fineK = 4, coarseIters = 1,
          fineIters = 1, capTarget = 16, levels = 1)
        val res = out.select(col("vec_id").cast("long").as("vec_id"),
          col("cid").cast("long").as("cid")).orderBy("vec_id")
        SimQueries.cacheOnce(res); res.count(); release()
        res
      }): Q,
      Some(
        s"""WITH storesrc AS (
           |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0
           |), batchsrc AS (
           |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1
           |),
           |${Similarity.twoLevelSql("storesrc", 4, 4, 1, 1)},
           |${Similarity.semDedupIncrementSql(0.4, 4, 1, 1, 16, 1)}
           |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS BIGINT) AS cid
           |FROM sdikeep ORDER BY vec_id""".stripMargin)),

    // the K-dispatched entry at a K past the flat tier's contract
    // bound: semDedupAuto(k = FlatKMax + 1) must route to the √k-
    // factored two-level substrate (the flat sibling throws at this
    // K). Corpus = embeddings ∪ exact copies (+10000 ids). At a
    // 65 537-way capacity over 1 000 rows every row seeds its own
    // fine cell, so only a QUANTIZED-IDENTICAL twin ties into its
    // senior's cell (cos 1 to both seeds, fcid tie-break) — the
    // planted copies must all collapse while everything else stays.
    ("sim_semdedup_auto",
      ((s, d) => {
        val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val doubled = e.unionByName(e.select(
          (col("vec_id") + 10000).as("vec_id"), col("embedding")))
        val res = Similarity.semDedupAuto(doubled, eps = 0.999,
            k = Similarity.FlatKMax + 1, iters = 1, capTarget = 16,
            levels = 2)
          .select(col("vec_id").cast("long").as("vec_id"),
            col("cid").cast("long").as("cid")).orderBy("vec_id")
        SimQueries.cacheOnce(res); res.count()
        res
      }): Q,
      Some(
        s"""WITH dblsrc AS (
           |  SELECT vec_id, embedding FROM embeddings
           |  UNION ALL
           |  SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings
           |),
           |${Similarity.semDedupScalableSql("dblsrc", 0.999, 257, 256, 1, 1, 16, 2)}
           |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS BIGINT) AS cid
           |FROM sdskeep ORDER BY vec_id""".stripMargin)),

    // LSH-bucketed pairs: random-hyperplane bands, exact verification
    ("sim_pairs_lsh",
      ((s, d) => Similarity.pairsLsh(Tables.embeddings(s, d), MinCos)
        .select(col("vec_a").cast("long").as("vec_a"),
          col("vec_b").cast("long").as("vec_b"),
          Round6.r6(col("cos")).as("cos"))
        .orderBy("vec_a", "vec_b")): Q,
      Some(
        s"""WITH ${Similarity.lshSigSql},
           |bands AS MATERIALIZED (
           |  SELECT vec_id, embedding, j AS bix,
           |         (sig >> (j * ${Similarity.BandBits})) & ${(1L << Similarity.BandBits) - 1} AS bkey
           |  FROM sigs, (SELECT unnest(generate_series(0, ${Similarity.NumBands - 1})) AS j)
           |), out AS (
           |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |         ${Similarity.cosineSql("a.embedding", "b.embedding")} AS cos
           |  FROM bands a JOIN bands b ON a.bix = b.bix AND a.bkey = b.bkey
           |  WHERE a.vec_id < b.vec_id
           |)
           |SELECT CAST(vec_a AS BIGINT) AS vec_a, CAST(vec_b AS BIGINT) AS vec_b,
           |       ${Round6.r6Sql("cos")} AS cos
           |FROM out WHERE cos >= $MinCos ORDER BY vec_a, vec_b""".stripMargin)),

    // Maximal Marginal Relevance: diversity-aware top-8 against vec 0's
    // embedding over a 16-candidate relevance pool — exact integer
    // scores (quantized dots, integer weights 7/3), so the greedy
    // selection replays bit-identically through the recursive CTE
    ("sim_mmr",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0)
          .selectExpr("transform(embedding, x -> cast(x as double)) AS q")
          .head.getSeq[Double](0)
        Similarity.mmrSelect(e.filter(col("vec_id") =!= 0), q,
            k = 8, poolN = 16)
          .orderBy("rank")
      }): Q,
      Some(
        """WITH RECURSIVE qv AS (
          |  SELECT vec_id, list_transform(embedding,
          |    e -> CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
          |  FROM embeddings
          |), qq AS (
          |  SELECT q FROM qv WHERE vec_id = 0
          |), relt AS (
          |  SELECT v.vec_id,
          |    list_reduce(list_transform(generate_series(1, len(v.q)),
          |      i -> v.q[i] * qq.q[i]), (a, b) -> a + b) AS rel,
          |    v.q
          |  FROM qv v, qq WHERE v.vec_id <> 0
          |), pool AS (
          |  SELECT vec_id, rel, q FROM relt ORDER BY rel DESC, vec_id LIMIT 16
          |), ppk AS (
          |  SELECT list(vec_id ORDER BY vec_id) AS ids,
          |         list(rel ORDER BY vec_id) AS rels,
          |         list(q ORDER BY vec_id) AS qs,
          |         CAST(count(*) AS BIGINT) AS n
          |  FROM pool
          |), msel AS (
          |  SELECT CAST(0 AS BIGINT) AS round, CAST([] AS BIGINT[]) AS picked,
          |         CAST(NULL AS BIGINT) AS pick, CAST(NULL AS BIGINT) AS score
          |  FROM ppk
          |  UNION ALL
          |  SELECT round + 1, list_append(picked, bi), bi,
          |         scores[CAST(bi AS INT)]
          |  FROM (
          |    SELECT round, picked, scores,
          |      CAST(list_position(scores, list_max(scores)) AS BIGINT) AS bi
          |    FROM (
          |      SELECT m.round, m.picked,
          |        list_transform(generate_series(1, CAST(p.n AS INT)), i ->
          |          CASE WHEN list_contains(m.picked, CAST(i AS BIGINT)) THEN NULL
          |               ELSE 7 * p.rels[i] -
          |                 CASE WHEN len(m.picked) = 0 THEN 0
          |                      ELSE 3 * list_max(list_transform(m.picked, j ->
          |                        list_reduce(list_transform(
          |                          generate_series(1, len(p.qs[i])),
          |                          dd -> p.qs[i][dd] * p.qs[CAST(j AS INT)][dd]),
          |                          (a, b) -> a + b)))
          |                 END
          |          END) AS scores
          |      FROM msel m, ppk p
          |      WHERE m.round < 8 AND len(m.picked) < p.n
          |    )
          |  )
          |)
          |SELECT m.round AS rank, p.ids[CAST(m.pick AS INT)] AS vec_id, m.score AS score
          |FROM msel m, ppk p WHERE m.round >= 1 ORDER BY rank""".stripMargin))
  )

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
