package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents` / `embeddings`:
  * dedup, similarity search, text analysis, multimodal plumbing.
  * Filled out incrementally; see graft.pipeline.* for the operator
  * implementations.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // exact duplicate groups by content hash
    ("dd_exact_groups",
      ((s: SparkSession, d: String) =>
        pipeline.Dedup.exactGroups(Tables.documents(s, d))
          .orderBy("content_hash")): Q,
      Some("""SELECT md5(text) AS content_hash,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(min(doc_id) AS BIGINT) AS keeper
             |FROM documents WHERE text IS NOT NULL
             |GROUP BY 1 HAVING count(*) > 1
             |ORDER BY content_hash""".stripMargin)),

    // exact dedup: keep lowest doc_id per hash
    ("dd_exact_dedup",
      ((s, d) =>
        pipeline.Dedup.exactDedup(Tables.documents(s, d))
          .select("doc_id").orderBy("doc_id")): Q,
      Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id FROM (
             |  SELECT doc_id, row_number() OVER (
             |    PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |  FROM documents WHERE text IS NOT NULL) WHERE rn = 1
             |UNION ALL
             |SELECT CAST(doc_id AS BIGINT) FROM documents WHERE text IS NULL
             |ORDER BY doc_id""".stripMargin)),

    // MinHash+LSH near-dup: shingle → 16-hash signature → 4 bands →
    // bucket join → exact-Jaccard verification at 0.8
    ("dd_minhash_pairs",
      ((s, d) => pipeline.NearDup.minhashPairs(Tables.documents(s, d), 0.8)
        .select(col("doc_a").cast("long").as("doc_a"),
          col("doc_b").cast("long").as("doc_b"),
          ts.Round6.r6(col("jaccard")).as("jaccard"))
        .orderBy("doc_a", "doc_b")): Q,
      Some(pipeline.NearDup.minhashPairsSql(0.8) +
        s""" SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
           |   ${ts.Round6.r6Sql("jaccard")} AS jaccard
           | FROM out ORDER BY doc_a, doc_b""".stripMargin)),

    // LSH recall gauge: banded candidates vs the uncapped-inverted-
    // index exact baseline, at a threshold in the corpus's low-J mass
    // where banding MEASURABLY misses (the planted 0.8+ pairs are all
    // recovered at any threshold; the quality number every LSH
    // deployment watches, as ivfRecall is for ANN)
    ("dd_minhash_recall",
      ((s, d) => pipeline.NearDup.minhashRecall(Tables.documents(s, d), 0.02)
        .select(col("n_exact"), col("n_found"),
          ts.Round6.r6(col("recall")).as("recall"))): Q,
      Some(
        s"""${pipeline.NearDup.minhashPairsSql(0.02)},
           |${pipeline.NearDup.minhashRecallSql(0.02)}
           |SELECT n_exact, n_found, ${ts.Round6.r6Sql("recall")} AS recall
           |FROM rec""".stripMargin)),

    // incremental near-dup: even doc_ids form the pre-existing store,
    // odd doc_ids arrive as the new batch — reported pairs are exactly
    // the full-corpus LSH pairs touching at least one new doc, which
    // the oracle states directly as a parity filter on the candidates
    ("dd_incremental",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        val st = pipeline.NearDup.indexCorpus(docs.filter(col("doc_id") % 2 === 0))
        val (pairs, _) = pipeline.NearDup.minhashIncrement(
          docs.filter(col("doc_id") % 2 === 1), st, 0.8)
        pairs.select(col("doc_a").cast("long").as("doc_a"),
          col("doc_b").cast("long").as("doc_b"),
          ts.Round6.r6(col("jaccard")).as("jaccard"))
          .orderBy("doc_a", "doc_b")
      }): Q,
      Some {
        val verify = pipeline.NearDup.verifySql(0.8)
          .replace("FROM cand c", "FROM candp c")
        s"""WITH ${pipeline.NearDup.shinglesSql}, ${pipeline.NearDup.minhashSigsSql},
           |${pipeline.NearDup.candSql},
           |candp AS (
           |  SELECT * FROM cand WHERE doc_a % 2 = 1 OR doc_b % 2 = 1
           |), $verify
           | SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
           |   ${ts.Round6.r6Sql("jaccard")} AS jaccard
           | FROM out ORDER BY doc_a, doc_b""".stripMargin
      }),

    // Bloom-prefiltered incremental exact dedup: even doc_ids are the
    // history, the batch is the odd docs plus planted copies of the
    // first 10 even texts — the bloom tier routes only candidates to
    // the exact confirm, so output is exact membership at any fpp
    ("dd_bloom_novel",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        val hist = docs.filter(col("doc_id") % 2 === 0)
        val batch = docs.filter(col("doc_id") % 2 === 1)
          .unionByName(hist.filter(col("doc_id") < 20)
            .withColumn("doc_id", col("doc_id") + 10000))
        pipeline.Dedup.bloomNovelty(hist, batch,
            expectedItems = 1000L, fpp = 0.01)
          .select(col("doc_id").cast("long").as("doc_id"), col("is_dup"))
          .orderBy("doc_id")
      }): Q,
      Some(
        """WITH hist AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
          |batch AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
          |  UNION ALL
          |  SELECT doc_id + 10000 AS doc_id, text FROM hist WHERE doc_id < 20)
          |SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
          |       (b.text IS NOT NULL AND EXISTS (
          |          SELECT 1 FROM hist h WHERE h.text = b.text)) AS is_dup
          |FROM batch b ORDER BY doc_id""".stripMargin)),

    // sharded membership tier — the path past one blob's bit budget:
    // per-hash-range blobs keep k calibrated at the true per-shard
    // count; output stays exact membership, same oracle semantics
    ("dd_bloom_shards",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        val hist = docs.filter(col("doc_id") % 2 === 0)
        val batch = docs.filter(col("doc_id") % 2 === 1)
          .unionByName(hist.filter(col("doc_id") >= 20 && col("doc_id") < 60)
            .withColumn("doc_id", col("doc_id") + 20000))
        pipeline.Dedup.bloomNoveltySharded(hist, batch, shards = 4,
            expectedItems = 1000L, fpp = 0.01)
          .select(col("doc_id").cast("long").as("doc_id"), col("is_dup"))
          .orderBy("doc_id")
      }): Q,
      Some(
        """WITH hist AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
          |batch AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
          |  UNION ALL
          |  SELECT doc_id + 20000 AS doc_id, text FROM hist
          |  WHERE doc_id >= 20 AND doc_id < 60)
          |SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
          |       (b.text IS NOT NULL AND EXISTS (
          |          SELECT 1 FROM hist h WHERE h.text = b.text)) AS is_dup
          |FROM batch b ORDER BY doc_id""".stripMargin)),

    // exact n-gram Jaccard via df-capped inverted shingle index
    ("dd_ngram_jaccard",
      ((s, d) => pipeline.NearDup.ngramJaccardPairs(Tables.documents(s, d), 0.5)
        .select(col("doc_a").cast("long").as("doc_a"),
          col("doc_b").cast("long").as("doc_b"),
          ts.Round6.r6(col("jaccard")).as("jaccard"))
        .orderBy("doc_a", "doc_b")): Q,
      Some(pipeline.NearDup.ngramPairsSql(0.5) +
        s""" SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
           |   ${ts.Round6.r6Sql("CAST(jaccard AS DOUBLE)")} AS jaccard
           | FROM outx ORDER BY doc_a, doc_b""".stripMargin)),

    // connected components over the near-dup graph (min-label clusters)
    ("dd_clusters",
      ((s, d) => pipeline.NearDup.clusters(
        pipeline.NearDup.minhashPairs(Tables.documents(s, d), 0.8))
        .select(col("doc_id").cast("long").as("doc_id"),
          col("cluster").cast("long").as("cluster"))
        .orderBy("doc_id")): Q,
      Some(pipeline.NearDup.minhashPairsSql(0.8)
        .replaceFirst("^WITH ", "WITH RECURSIVE ") +
        s", ${pipeline.NearDup.clustersSql}" +
        """ SELECT CAST(doc_id AS BIGINT) AS doc_id,
          |   CAST(cluster AS BIGINT) AS cluster
          | FROM comp ORDER BY doc_id""".stripMargin)),

    // end-to-end near-dup dedup: one keeper per cluster + all singletons
    ("dd_dedup_keep",
      ((s, d) => pipeline.NearDup.dedupKeep(Tables.documents(s, d), 0.8)
        .orderBy("doc_id")): Q,
      Some(pipeline.NearDup.minhashPairsSql(0.8)
        .replaceFirst("^WITH ", "WITH RECURSIVE ") +
        s", ${pipeline.NearDup.clustersSql}" +
        """ SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
          | WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster)
          | ORDER BY doc_id""".stripMargin)),

    // 32-bit SimHash signature per document
    ("dd_simhash_sigs",
      ((s, d) => pipeline.NearDup.simhashSigs(Tables.documents(s, d))
        .select(col("doc_id").cast("long").as("doc_id"),
          col("simhash").cast("long").as("simhash"))
        .orderBy("doc_id")): Q,
      Some(
        s"""WITH ${pipeline.NearDup.shinglesSql}, ${pipeline.NearDup.simhashSigsSql}
           | SELECT CAST(doc_id AS BIGINT) AS doc_id,
           | CAST(simhash AS BIGINT) AS simhash FROM sigs2 ORDER BY doc_id""".stripMargin)),

    // SimHash near-dup pairs: byte-band candidates, Hamming ≤ 3
    ("dd_simhash_pairs",
      ((s, d) => pipeline.NearDup.simhashPairs(Tables.documents(s, d), 3)
        .select(col("doc_a").cast("long").as("doc_a"),
          col("doc_b").cast("long").as("doc_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy("doc_a", "doc_b")): Q,
      Some(pipeline.NearDup.simhashPairsSql(3) +
        """ SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
          |   CAST(hamming AS BIGINT) AS hamming
          | FROM out ORDER BY doc_a, doc_b""".stripMargin)),

    // shared-substring pairs: 8-token window fingerprints, df-capped
    // inverted index, exact shared-window count ≥ 3 verified on the
    // uncapped per-doc window sets
    ("dd_window_fp",
      ((s, d) => pipeline.NearDup.windowFpPairs(Tables.documents(s, d),
          window = 8, minShared = 3)
        .select(col("doc_a").cast("long").as("doc_a"),
          col("doc_b").cast("long").as("doc_b"), col("n_shared"))
        .orderBy("doc_a", "doc_b")): Q,
      Some(pipeline.NearDup.windowFpPairsSql(8, 3) +
        """ SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
          |   n_shared
          | FROM outw ORDER BY doc_a, doc_b""".stripMargin)),

    // corpus-frequent windows: the boilerplate signal complementing
    // dd_window_fp — spans carried by ≥ 3 distinct texts, linear output
    ("dd_hot_windows",
      ((s, d) => pipeline.NearDup.hotWindows(Tables.documents(s, d),
          window = 8, minDf = 3)
        .select(col("wh"), col("df")).orderBy("wh")): Q,
      Some(pipeline.NearDup.hotWindowsSql(8, 3) +
        " SELECT wh, df FROM hotw ORDER BY wh")),

    // boilerplate removal: strike every token covered by a window the
    // detector above calls hot (same df rule), reassemble the
    // survivors — the action step of exact-substring dedup
    ("dd_strip_boilerplate",
      ((s, d) => pipeline.NearDup.stripBoilerplate(Tables.documents(s, d),
          window = 8, minDf = 3)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("clean_text"), col("n_removed"))
        .orderBy("doc_id")): Q,
      Some(pipeline.NearDup.stripBoilerplateSql(8, 3) +
        """ SELECT CAST(doc_id AS BIGINT) AS doc_id, clean_text, n_removed
          | FROM stripw ORDER BY doc_id""".stripMargin)),

    // quality scoring: punct/digit/upper/stopword ratios + composite
    ("tx_quality",
      ((s, d) => {
        val q = pipeline.TextAnalysis.qualityScore(Tables.documents(s, d))
        q.select((col("doc_id").cast("long").as("doc_id") +:
            col("n_tokens") +:
            Seq("punct_ratio", "digit_ratio", "upper_ratio", "mean_tok_len",
              "stopword_ratio", "quality").map(c => ts.Round6.r6(col(c)).as(c))): _*)
          .orderBy("doc_id")
      }): Q,
      Some {
        val r6cols = Seq("punct_ratio", "digit_ratio", "upper_ratio",
          "mean_tok_len", "stopword_ratio", "quality")
          .map(c => s"${ts.Round6.r6Sql(s"CAST($c AS DOUBLE)")} AS $c").mkString(", ")
        s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           | $r6cols FROM (${pipeline.TextAnalysis.qualityScoreSql})
           | ORDER BY doc_id""".stripMargin
      }),

    // language-ID heuristic: stopword profiles + CJK ratio, argmax
    ("tx_lang_id",
      ((s, d) => pipeline.TextAnalysis.languageId(Tables.documents(s, d))
        .select(col("doc_id").cast("long").as("doc_id"), col("lang_pred"),
          ts.Round6.r6(col("lang_score")).as("lang_score"))
        .orderBy("doc_id")): Q,
      Some(
        s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, lang_pred,
           | ${ts.Round6.r6Sql("CAST(lang_score AS DOUBLE)")} AS lang_score
           | FROM (${pipeline.TextAnalysis.languageIdSql})
           | ORDER BY doc_id""".stripMargin)),

    // document fingerprints: rolling hash + min 5-gram sketch
    ("tx_fingerprint",
      ((s, d) => pipeline.TextAnalysis.fingerprints(Tables.documents(s, d))
        .select(col("doc_id").cast("long").as("doc_id"),
          col("fp_rolling").cast("long").as("fp_rolling"),
          col("fp_min5gram").cast("long").as("fp_min5gram"))
        .orderBy("doc_id")): Q,
      Some(
        s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
           | CAST(fp_rolling AS BIGINT) AS fp_rolling,
           | CAST(fp_min5gram AS BIGINT) AS fp_min5gram
           | FROM (${pipeline.TextAnalysis.fingerprintsSql})
           | ORDER BY doc_id""".stripMargin)),

    // whitespace token count + char classes (text quality features)
    ("tx_token_count",
      ((s, d) =>
        pipeline.TextAnalysis.tokenStats(Tables.documents(s, d))
          .orderBy("doc_id")): Q,
      Some(s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             |  CAST(len(regexp_extract_all(text, '${pipeline.TextAnalysis.BpeTokenRe}')) AS BIGINT) AS n_tokens_bpe,
             |  CAST(len(text) AS BIGINT) AS n_chars_actual,
             |  round(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
             |        / greatest(len(text), 1), 6) AS tokens_per_char
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // BM25 lexical retrieval: per-term top-10 documents
    ("tx_bm25",
      ((s, d) => pipeline.TextAnalysis.bm25(Tables.documents(s, d),
          Seq("spark", "window", "hash"), 10)
        .select(col("term"), col("rank"),
          col("doc_id").cast("long").as("doc_id"), col("score"))
        .orderBy("term", "rank")): Q,
      Some(pipeline.TextAnalysis.bm25Sql(Seq("spark", "window", "hash"), 10))),

    // TF-IDF keyword extraction: per-doc top-5 distinguishing terms
    ("tx_keywords",
      ((s, d) => pipeline.TextAnalysis.keywords(Tables.documents(s, d), 5)
        .select(col("doc_id").cast("long").as("doc_id"), col("rank"),
          col("term"), col("score"))
        .orderBy("doc_id", "rank")): Q,
      Some(pipeline.TextAnalysis.keywordsSql(5))),

    // Rocchio pseudo-relevance feedback: per-term centroid of the
    // lexically-matching docs' embeddings, corpus ranked by cosine —
    // the semantic arm of hybrid retrieval
    ("tx_semantic_expand",
      ((s, d) => pipeline.TextAnalysis.semanticExpand(
          Tables.documents(s, d), Tables.embeddings(s, d),
          Seq("spark", "window", "hash"), 10)
        .orderBy("term", "rank")): Q,
      Some(pipeline.TextAnalysis.semanticExpandSql(
        Seq("spark", "window", "hash"), 10))),

    // hybrid retrieval: BM25 lexical arm + Rocchio semantic arm fused
    // by reciprocal rank (exact integer RRF mass)
    ("tx_hybrid_rrf",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        val vecs = Tables.embeddings(s, d)
        val terms = Seq("spark", "window", "hash")
        val lex = pipeline.TextAnalysis.bm25(docs, terms, 20)
          .select(col("term").as("qid"),
            col("doc_id").cast("long").as("doc_id"), col("rank"))
        val sem = pipeline.TextAnalysis.semanticExpand(docs, vecs, terms, 20)
          .select(col("term").as("qid"), col("vec_id").as("doc_id"), col("rank"))
        pipeline.TextAnalysis.rrfFuse(Seq(lex, sem), 10)
          .orderBy("qid", "rank")
      }): Q,
      Some({
        val terms = Seq("spark", "window", "hash")
        pipeline.TextAnalysis.rrfFuseSql(
          s"SELECT term AS qid, doc_id, rank FROM (${
            pipeline.TextAnalysis.bm25Sql(terms, 20)})",
          s"SELECT term AS qid, vec_id AS doc_id, rank FROM (${
            pipeline.TextAnalysis.semanticExpandSql(terms, 20)})",
          10)
      })),

    // blocklist filtering: broadcast Aho–Corasick pass vs a per-phrase
    // positional scan in the oracle — multi-word and overlapping-
    // capable phrases, threshold gate
    ("tx_blocklist",
      ((s, d) => pipeline.TextAnalysis.blocklist(Tables.documents(s, d),
          Seq("slow fast", "value table", "spark"), maxHits = 1L)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("n_blocked"), col("blocked"))
        .orderBy("doc_id")): Q,
      Some(
        s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, n_blocked, blocked
           |FROM (${pipeline.TextAnalysis.blocklistSql(
                     Seq("slow fast", "value table", "spark"), maxHits = 1L)})
           |ORDER BY doc_id""".stripMargin)),

    // PII scrub over text with synthesized emails/URLs/IPs (both
    // engines build the identical dirty text, then redact independently)
    ("tx_scrub",
      ((s, d) => {
        val dirty = Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com via "),
            lit("https://site"), pmod(col("doc_id"), lit(7)), lit(".com/a_b "),
            lit("from 10.0."), pmod(col("doc_id"), lit(256)), lit(".25")).as("text"))
        pipeline.TextAnalysis.scrub(dirty)
          .select(col("doc_id").cast("long").as("doc_id"), col("n_email"),
            col("n_url"), col("n_ip"), col("clean"))
          .orderBy("doc_id")
      }): Q,
      Some(
        s"""WITH docs AS (
           |  SELECT doc_id,
           |         text || ' contact user' || doc_id || '@example.com via ' ||
           |         'https://site' || (doc_id % 7) || '.com/a_b ' ||
           |         'from 10.0.' || (doc_id % 256) || '.25' AS text
           |  FROM documents
           |)
           |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_email, n_url, n_ip, clean
           |FROM (${pipeline.TextAnalysis.scrubSql})
           |ORDER BY doc_id""".stripMargin)),

    // Unicode normalization: NFC + zero-width strip + whitespace
    // collapse + trim. The corpus text is clean ASCII, so a second
    // column runs the chain over a CONSTRUCTED mixed string (combining
    // acute, ZWSP, NBSP, tab, pad spaces) — real non-ASCII coverage in
    // both engines, not just an identity pass
    ("tx_normalize",
      ((s, d) => {
        val norm = graft.functions.TextExprs.nfcClean(col("text"))
        val mixed = concat(lit("  "), substring(col("text"), 1, 16),
          lit("\te\u0301\u200Bx\u00A0"))
        Tables.documents(s, d)
          .select(col("doc_id").cast("long").as("doc_id"),
            norm.as("text_norm"), (norm =!= col("text")).as("changed"),
            graft.functions.TextExprs.nfcClean(mixed).as("mixed_norm"))
          .orderBy("doc_id")
      }): Q,
      Some {
        val mixedSql = "'  ' || substr(text, 1, 16) || chr(9) || 'e' || " +
          "chr(769) || chr(8203) || 'x' || chr(160)"
        s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |  ${pipeline.TextAnalysis.normalizeSql("text")} AS text_norm,
           |  (${pipeline.TextAnalysis.normalizeSql("text")} <> text) AS changed,
           |  ${pipeline.TextAnalysis.normalizeSql(mixedSql)} AS mixed_norm
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // bigram-LM perplexity: Laplace-smoothed model trained on the
    // even-doc half, every document scored (the CCNet filter shape)
    ("tx_perplexity",
      ((s, d) => pipeline.TextAnalysis.perplexity(Tables.documents(s, d))
        .select(col("doc_id").cast("long").as("doc_id"), col("n_bigrams"),
          ts.Round6.r6(col("ppl")).as("ppl"))
        .orderBy("doc_id")): Q,
      Some(
        s"""WITH ${pipeline.TextAnalysis.perplexitySql}
           |SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |  CAST(n_bigrams AS BIGINT) AS n_bigrams,
           |  ${ts.Round6.r6Sql("ppl")} AS ppl
           |FROM ppx ORDER BY doc_id""".stripMargin)),

    // character-entropy gibberish score (nats per char distribution)
    ("tx_entropy",
      ((s, d) => pipeline.TextAnalysis.charEntropy(Tables.documents(s, d))
        .select(col("doc_id").cast("long").as("doc_id"), col("n_chars"),
          ts.Round6.r6(col("entropy")).as("entropy"))
        .orderBy("doc_id")): Q,
      Some(
        s"""WITH ${pipeline.TextAnalysis.charEntropySql}
           |SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |  CAST(n_chars AS BIGINT) AS n_chars,
           |  ${ts.Round6.r6Sql("entropy")} AS entropy
           |FROM ent ORDER BY doc_id""".stripMargin)),

    // UniMax budget allocation: water-fill 1.35x the corpus's tokens
    // across sources at <= 1.5 epochs each, then realize the mixture —
    // small sources cap at 1.5 epochs, large ones share the level
    // leakage-robust split: near-dup clusters ride into one split
    // together (cluster-keyed bucketing; singletons by own id), so a
    // paraphrase of an eval doc cannot land in train
    ("sp_split_leakfree",
      ((s, d) => pipeline.Sampling.splitAssignLeakFree(
          Tables.documents(s, d),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), minJ = 0.8)
        .select(col("doc_id").cast("long").as("doc_id"), col("split"))
        .orderBy("doc_id")): Q,
      Some(pipeline.NearDup.minhashPairsSql(0.8)
        .replaceFirst("^WITH ", "WITH RECURSIVE ") +
        s", ${pipeline.NearDup.clustersSql}" +
        s""" SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           |   ${pipeline.Sampling.splitAssignSql(
                 "coalesce(c.cluster, d.doc_id)",
                 Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))} AS split
           | FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
           | ORDER BY doc_id""".stripMargin)),

    // temperature-smoothed mixture: p ∝ n^τ source shares realized as
    // mixtureSample epoch weights, then the sampled census proves the
    // weights drive the corpus pass identically in both engines
    ("sp_temperature",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        val cnt = docs.groupBy(col("source").as("stratum"))
          .agg(count(lit(1)).cast("long").as("c"))
        val alloc = pipeline.Sampling.temperatureAlloc(cnt,
          budget = 400.0, tau = 0.5)
        val sampled = pipeline.Sampling.mixtureSample(
          docs, col("source"), col("doc_id"),
          alloc.select(col("stratum"), col("weight")), 0.0)
        sampled.groupBy(col("source"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_copies"))
          .join(alloc.select(col("stratum").as("source"), col("c"),
            col("weight")), Seq("source"))
          .select(col("source"), col("c"),
            ts.Round6.r6(col("weight")).as("weight"),
            col("n_docs"), col("n_copies"))
          .orderBy("source")
      }): Q,
      Some(
        s"""WITH cnt AS (
           |  SELECT source AS stratum, CAST(count(*) AS BIGINT) AS c
           |  FROM documents GROUP BY 1
           |), ${pipeline.Sampling.temperatureAllocSql("400.0", 0.5)},
           |tdocs AS (
           |  SELECT d.doc_id, d.source,
           |    ${pipeline.Sampling.mixtureCopiesSql("t.weight", "d.doc_id")} AS n
           |  FROM documents d JOIN tma t ON d.source = t.stratum
           |)
           |SELECT d.source, t.c, ${ts.Round6.r6Sql("t.weight")} AS weight,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(d.n) AS BIGINT) AS n_copies
           |FROM tdocs d JOIN tma t ON d.source = t.stratum
           |WHERE d.n > 0
           |GROUP BY d.source, t.c, t.weight
           |ORDER BY d.source""".stripMargin)),

    ("sp_unimax",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        val ntok = size(filter(split(trim(lower(col("text"))), "\\s+"),
          t => length(t) > 0))
        val cnt = docs.groupBy(col("source").as("stratum"))
          .agg(sum(coalesce(ntok, lit(0))).cast("long").as("c"))
        // budget + water-fill from ONE S-row collect: bounded driver
        // bounce, same contract as the k-means centroid round-trip
        val (alloc, _) = pipeline.Sampling.unimaxAllocScaled(cnt,
          t => 1.35 * t, 1.5)
        val sampled = pipeline.Sampling.mixtureSample(
          docs, col("source"), col("doc_id"),
          alloc.select(col("stratum"), col("weight")), 0.0)
        sampled.groupBy(col("source"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_copies"))
          .join(alloc.select(col("stratum").as("source"), col("c"),
            col("weight")), Seq("source"))
          .select(col("source"), col("c"), ts.Round6.r6(col("weight")).as("weight"),
            col("n_docs"), col("n_copies"))
          .orderBy("source")
      }): Q,
      Some {
        val ntokSql = "len(list_filter(regexp_split_to_array(trim(lower(text)), " +
          "'\\s+'), t -> t <> ''))"
        s"""WITH cnt AS (
           |  SELECT source AS stratum, CAST(sum(coalesce($ntokSql, 0)) AS BIGINT) AS c
           |  FROM documents GROUP BY 1
           |), ${pipeline.Sampling.unimaxAllocSql("1.35 * (SELECT sum(c) FROM cnt)", 1.5)},
           |wdocs AS (
           |  SELECT d.source, d.doc_id,
           |         ${pipeline.Sampling.mixtureCopiesSql("u.weight", "d.doc_id")} AS n
           |  FROM documents d JOIN uma u ON d.source = u.stratum
           |)
           |SELECT w.source, u.c, ${ts.Round6.r6Sql("u.weight")} AS weight,
           |  CAST(sum(CASE WHEN w.n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
           |  CAST(sum(w.n) AS BIGINT) AS n_copies
           |FROM wdocs w JOIN uma u ON w.source = u.stratum
           |GROUP BY w.source, u.c, u.weight
           |HAVING sum(w.n) > 0
           |ORDER BY w.source""".stripMargin
      }),

    // deterministic uniform hash-sample at 20% on doc_id
    ("sp_hash_sample",
      ((s, d) => pipeline.Sampling.hashSample(
          Tables.documents(s, d), col("doc_id"), 0.2)
        .select(col("doc_id").cast("long").as("doc_id"),
          pipeline.Sampling.bucket(col("doc_id")).as("bucket"))
        .orderBy("doc_id")): Q,
      Some(
        s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |       ${pipeline.Sampling.bucketSql("doc_id")} AS bucket
           |FROM documents
           |WHERE ${pipeline.Sampling.bucketSql("doc_id")} < 2000
           |ORDER BY doc_id""".stripMargin)),

    // stratified sample: per-source rates, default for the rest
    ("sp_stratified",
      ((s, d) => {
        val sess = s; import sess.implicits._
        val rates = Seq(("src0", 0.5), ("src1", 0.25)).toDF("stratum", "rate")
        pipeline.Sampling.stratifiedSample(
            Tables.documents(s, d), col("source"), col("doc_id"), rates, 0.1)
          .select(col("source"), col("doc_id").cast("long").as("doc_id"))
          .orderBy("source", "doc_id")
      }): Q,
      Some(
        s"""WITH rated AS (
           |  SELECT source, doc_id,
           |         CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
           |              ELSE 0.1 END AS rate
           |  FROM documents
           |)
           |SELECT source, CAST(doc_id AS BIGINT) AS doc_id
           |FROM rated
           |WHERE ${pipeline.Sampling.bucketSql("doc_id")} < CAST(round(rate * 10000) AS BIGINT)
           |ORDER BY source, doc_id""".stripMargin)),

    // mixture re-weighting: per-source epoch weights (floor copies +
    // hash-decided fractional copy), explicit weights for two sources,
    // a fractional default for the rest
    ("sp_mixture",
      ((s, d) => {
        val sess = s; import sess.implicits._
        val w = Seq(("src0", 2.5), ("src1", 0.25)).toDF("stratum", "weight")
        pipeline.Sampling.mixtureSample(
            Tables.documents(s, d), col("source"), col("doc_id"), w, 1.0)
          .select(col("source"), col("doc_id").cast("long").as("doc_id"),
            col("copy"))
          .orderBy("source", "doc_id", "copy")
      }): Q,
      Some {
        val wt = "CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25 ELSE 1.0 END"
        s"""WITH wdocs AS (
           |  SELECT source, doc_id,
           |         ${pipeline.Sampling.mixtureCopiesSql(wt, "doc_id")} AS n
           |  FROM documents
           |)
           |SELECT source, CAST(doc_id AS BIGINT) AS doc_id, t.copy
           |FROM wdocs, unnest(generate_series(0, n - 1)) AS t(copy)
           |WHERE n > 0
           |ORDER BY source, doc_id, copy""".stripMargin
      }),

    // benchmark contamination: corpus-doc 3-gram overlap vs an eval
    // set (doc_id ≡ 0 mod 17 plays the benchmark; the rest the corpus)
    ("cu_contamination",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        pipeline.Curation.contamination(
            docs.filter(col("doc_id") % 17 =!= 0),
            docs.filter(col("doc_id") % 17 === 0))
          .select(col("doc_id").cast("long").as("doc_id"),
            col("n_grams"), col("n_hit"),
            ts.Round6.r6(col("contaminated_frac")).as("contaminated_frac"))
          .orderBy("doc_id")
      }): Q,
      Some(
        s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0),
           |bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
           |${pipeline.Curation.contaminationSql}
           |SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |  CAST(n_grams AS BIGINT) AS n_grams, CAST(n_hit AS BIGINT) AS n_hit,
           |  ${ts.Round6.r6Sql("contaminated_frac")} AS contaminated_frac
           |FROM conta ORDER BY doc_id""".stripMargin)),

    // cross-corpus contamination, large-reference path: Bloom-prefilter
    // (bits broadcast, reference grams stay distributed) + exact
    // verification join — output is EXACT, so the oracle is the same
    // overlap join as cu_contamination over the corpus/reference split
    ("cu_contamination_xl",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        pipeline.Curation.contaminationXl(
            docs.filter(col("doc_id") % 3 =!= 0),
            docs.filter(col("doc_id") % 3 === 0))
          .select(col("doc_id").cast("long").as("doc_id"),
            col("n_grams"), col("n_hit"),
            ts.Round6.r6(col("contaminated_frac")).as("contaminated_frac"))
          .orderBy("doc_id")
      }): Q,
      Some(
        s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
           |refc AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
           |${pipeline.Curation.contaminationXlSql}
           |SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |  CAST(n_grams AS BIGINT) AS n_grams, CAST(n_hit AS BIGINT) AS n_hit,
           |  ${ts.Round6.r6Sql("contaminated_frac")} AS contaminated_frac
           |FROM contx ORDER BY doc_id""".stripMargin)),

    // Gopher-style repetition signals: dup-token / dup-3-gram / top-2-gram
    ("cu_repetition",
      ((s, d) => pipeline.Curation.repetitionStats(Tables.documents(s, d))
        .select(col("doc_id").cast("long").as("doc_id"), col("n_tokens"),
          ts.Round6.r6(col("dup_token_frac")).as("dup_token_frac"),
          ts.Round6.r6(col("dup_3gram_frac")).as("dup_3gram_frac"),
          ts.Round6.r6(col("top_2gram_frac")).as("top_2gram_frac"))
        .orderBy("doc_id")): Q,
      Some(
        s"""WITH ${pipeline.Curation.repetitionSql}
           |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
           |  ${ts.Round6.r6Sql("dup_token_frac")} AS dup_token_frac,
           |  ${ts.Round6.r6Sql("dup_3gram_frac")} AS dup_3gram_frac,
           |  ${ts.Round6.r6Sql("top_2gram_frac")} AS top_2gram_frac
           |FROM rep ORDER BY doc_id""".stripMargin)),

    // token-budget sequence packing: concat-then-chunk at 256 tokens,
    // global offsets via the two-level distributed prefix sum
    ("cu_pack_sequences",
      ((s, d) => pipeline.Curation.packSequences(Tables.documents(s, d), 256)
        .select(col("doc_id").cast("long").as("doc_id"), col("n_tok"),
          col("tok_start"), col("seq_id"), col("seq_pos"))
        .orderBy("doc_id")): Q,
      Some(
        s"""WITH ${pipeline.Curation.packSequencesSql(256)}
           |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tok, tok_start,
           |  CAST(floor(tok_start / 256) AS BIGINT) AS seq_id,
           |  CAST(tok_start % 256 AS BIGINT) AS seq_pos
           |FROM packed ORDER BY doc_id""".stripMargin)),

    // per-source cap: keep ≤ 15 docs per source by salted-hash rank
    ("cu_source_cap",
      ((s, d) => pipeline.Curation.sourceCap(Tables.documents(s, d), 15, "mix1")
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          col("rn").cast("long").as("rn"))
        .orderBy("doc_id")): Q,
      Some(
        s"""WITH ${pipeline.Curation.sourceCapSql(15, "mix1")}
           |SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           |  CAST(rn AS BIGINT) AS rn
           |FROM capped ORDER BY doc_id""".stripMargin)),

    // corpus vocabulary: top-50 tokens by term frequency with doc freq
    ("cu_vocab",
      ((s, d) => pipeline.Curation.vocabStats(Tables.documents(s, d), 50)
        .select(col("tok"), col("tf"), col("df"))): Q,
      Some(pipeline.Curation.vocabStatsSql(50))),

    // Misra-Gries heavy hitters over the token stream: k=1024 exceeds
    // the fixture vocabulary, so the sketch runs in its exact regime
    // and the oracle is the plain count — the approximate regime's
    // bound guarantees live in SketchSpec
    ("cu_heavy_hitters",
      ((s, d) => pipeline.Curation
        .heavyHitters(Tables.documents(s, d), 1024)
        .orderBy(col("tf").desc, col("tok"))): Q,
      Some(
        """WITH toks AS (
          |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
          |  FROM documents
          |)
          |SELECT tok, CAST(count(*) AS BIGINT) AS tf
          |FROM toks GROUP BY tok
          |ORDER BY tf DESC, tok""".stripMargin)),

    // mergeable distinct-count tier: per-source HLL sketches built on
    // two disjoint increments, union-merged, estimated — checked
    // against BOTH engines' exact distinct counts (est_ok encodes the
    // ±5% tolerance; lgK=12 gives ~±1%, so a sketch regression trips
    // it). The exact column doubles as the hash-compared ground truth.
    ("cu_distinct_hll",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        val sketches = pipeline.Curation.tokenSketches(
            docs.filter(col("doc_id") % 2 === 0))
          .union(pipeline.Curation.tokenSketches(
            docs.filter(col("doc_id") % 2 === 1)))
        val est = pipeline.Curation.sketchDistinct(sketches)
        val exact = docs
          .select(col("source"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
          .groupBy("source")
          .agg(countDistinct(col("tok")).as("n_distinct"))
        exact.join(est, "source")
          .select(col("source"), col("n_distinct"),
            (abs(col("est_distinct") - col("n_distinct")) <=
              col("n_distinct") * 0.05).as("est_ok"))
          .orderBy("source")
      }): Q,
      Some(
        """SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct,
          |  TRUE AS est_ok
          |FROM (SELECT source,
          |        unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
          |      FROM documents)
          |GROUP BY source ORDER BY source""".stripMargin)),

    // mergeable quantile tier: per-source doc-length sketches built on
    // two disjoint increments, union-merged, read at four ranks —
    // k=8192 exceeds any per-source doc count at verify scale, so the
    // sketch runs in its exact regime and the oracle is the discrete
    // lower quantile (smallest value with cumulative rank >= ceil(q*n));
    // the compacted regime's error bounds live in SketchSpec
    ("cu_quantile_sketch",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        val sketches = pipeline.Curation.valueSketches(
            docs.filter(col("doc_id") % 2 === 0), "source", col("n_chars"))
          .union(pipeline.Curation.valueSketches(
            docs.filter(col("doc_id") % 2 === 1), "source", col("n_chars")))
        pipeline.Curation.sketchValueQuantiles(
            sketches, "source", Seq(0.25, 0.5, 0.9, 0.99))
          .orderBy("source")
      }): Q,
      Some(
        """WITH r AS (
          |  SELECT source, CAST(n_chars AS DOUBLE) AS v,
          |         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
          |         count(*) OVER (PARTITION BY source) AS n
          |  FROM documents
          |)
          |SELECT source,
          |  min(CASE WHEN rn >= greatest(1, CAST(ceil(0.25*n) AS BIGINT)) THEN v END) AS p25,
          |  min(CASE WHEN rn >= greatest(1, CAST(ceil(0.5*n) AS BIGINT)) THEN v END) AS p50,
          |  min(CASE WHEN rn >= greatest(1, CAST(ceil(0.9*n) AS BIGINT)) THEN v END) AS p90,
          |  min(CASE WHEN rn >= greatest(1, CAST(ceil(0.99*n) AS BIGINT)) THEN v END) AS p99
          |FROM r GROUP BY source ORDER BY source""".stripMargin)),

    // one-shot quantile read over the event stream: per-type value
    // quantiles through the same sketch (aggregate + scalar read in
    // one expression tree), k sized to stay exact at verify scale
    ("cu_value_quantiles",
      ((s, d) => {
        val qs = Seq(0.5, 0.9, 0.99)
        val q = graft.functions.SketchExprs.quantiles(
          col("value").cast("double"), 32768, qs)
        Tables.events(s, d).groupBy("event_type").agg(q.as("q"))
          .select(col("event_type"),
            col("q").getItem(0).as("p50"),
            col("q").getItem(1).as("p90"),
            col("q").getItem(2).as("p99"))
          .orderBy("event_type")
      }): Q,
      Some(
        """WITH r AS (
          |  SELECT event_type, CAST(value AS DOUBLE) AS v,
          |         row_number() OVER (PARTITION BY event_type ORDER BY CAST(value AS DOUBLE)) AS rn,
          |         count(*) OVER (PARTITION BY event_type) AS n
          |  FROM events
          |)
          |SELECT event_type,
          |  min(CASE WHEN rn >= greatest(1, CAST(ceil(0.5*n) AS BIGINT)) THEN v END) AS p50,
          |  min(CASE WHEN rn >= greatest(1, CAST(ceil(0.9*n) AS BIGINT)) THEN v END) AS p90,
          |  min(CASE WHEN rn >= greatest(1, CAST(ceil(0.99*n) AS BIGINT)) THEN v END) AS p99
          |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // BPE merge training: 10 rounds of most-frequent-pair fusion over
    // the frequency-weighted word vocabulary (10 > the 8-round
    // materialization epoch, so the oracle crosses that boundary)
    ("cu_bpe",
      ((s, d) => pipeline.Curation.bpeMerges(Tables.documents(s, d), 10)
        .select(col("round"), col("pair"), col("n"))
        .orderBy("round")): Q,
      Some(
        s"""WITH ${pipeline.Curation.bpeMergesSql(10)}
           |SELECT round, pr AS pair, CAST(n AS BIGINT) AS n
           |FROM outb ORDER BY round""".stripMargin)),

    // apply the learned merges back to the corpus: per-doc BPE token
    // sequences (</w>-terminated), the train→apply loop closed.
    // The array<string> is projected to a space-joined scalar on BOTH
    // engines — the driver's pandas comparator can't hash array cells.
    ("cu_bpe_tokenize",
      ((s, d) => pipeline.Curation.bpeTokenize(Tables.documents(s, d), 10)
        .select(col("doc_id").cast("long").as("doc_id"),
          concat_ws(" ", col("bpe")).as("bpe"))
        .orderBy("doc_id")): Q,
      Some(
        s"""WITH ${pipeline.Curation.bpeMergesSql(10)},
           |${pipeline.Curation.bpeTokenizeSql(10)}
           |SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |  array_to_string(bpe, ' ') AS bpe
           |FROM tokzd ORDER BY doc_id""".stripMargin)),

    // BPE transfer: train the merge table on the EVEN half of the
    // corpus, tokenize the ODD half with it — the deployment split
    // (merges are a vocabulary-sized driver bounce; unseen words fuse
    // only as far as the learned merges reach)
    ("cu_bpe_transfer",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        val merges = pipeline.Curation
          .bpeMerges(docs.filter(col("doc_id") % 2 === 0), 10)
          .orderBy("round").collect().map(_.getString(1)).toSeq
        pipeline.Curation
          .bpeTokenizeWith(docs.filter(col("doc_id") % 2 === 1), merges)
          .select(col("doc_id").cast("long").as("doc_id"),
            concat_ws(" ", col("bpe")).as("bpe"))
          .orderBy("doc_id")
      }): Q,
      Some(
        s"""WITH ${pipeline.Curation.bpeMergesSql(10,
                "(SELECT * FROM documents WHERE doc_id % 2 = 0)")},
           |${pipeline.Curation.bpeTransferSql(10,
                "(SELECT * FROM documents WHERE doc_id % 2 = 1)")}
           |SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |  array_to_string(bpe, ' ') AS bpe
           |FROM tokzt ORDER BY doc_id""".stripMargin)),

    // snapshot version diff: publish two constructed corpus versions
    // (drop %7s, then drop %5s and edit %3s), row-level change capture
    // between them — the oracle states the parity rules directly, no
    // filesystem needed on its side (a NULL text "edit" is a no-op on
    // both engines: concat(NULL, ..) stays NULL, hashes equal)
    ("cu_snapshot_diff",
      ((s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id").cast("long").as("doc_id"), col("text"), col("source"))
        val dir = java.nio.file.Files.createTempDirectory("snapdiff").toString
        val v1 = pipeline.Snapshot.publish(
          docs.filter(col("doc_id") % 7 =!= 0), dir)
        val v2 = pipeline.Snapshot.publish(
          docs.filter(col("doc_id") % 5 =!= 0)
            .withColumn("text", when(col("doc_id") % 3 === 0,
              concat(col("text"), lit(" edited"))).otherwise(col("text"))),
          dir)
        pipeline.Snapshot.diff(s, dir, Seq("doc_id"), v1, v2)
          .orderBy("doc_id")
      }): Q,
      Some(
        """SELECT * FROM (
          |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
          |    CASE WHEN doc_id % 7 = 0 AND doc_id % 5 <> 0 THEN 'added'
          |         WHEN doc_id % 5 = 0 AND doc_id % 7 <> 0 THEN 'removed'
          |         WHEN doc_id % 7 <> 0 AND doc_id % 5 <> 0
          |              AND doc_id % 3 = 0 AND text IS NOT NULL THEN 'changed'
          |    END AS change
          |  FROM documents)
          |WHERE change IS NOT NULL ORDER BY doc_id""".stripMargin)),

    // incremental re-scoring across the same version bump: score ONLY
    // the diff's added/changed docs, keep the rest of the v1 score
    // table — the result must equal a full re-score of v2, which is
    // what the oracle computes (per-doc scores over the shadowed v2
    // corpus CTE; main.documents is the base table underneath)
    ("cu_incremental_scores",
      ((s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id").cast("long").as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars"))
        val dir = java.nio.file.Files.createTempDirectory("incsc").toString
        val v1 = pipeline.Snapshot.publish(
          docs.filter(col("doc_id") % 7 =!= 0), dir)
        val v2 = pipeline.Snapshot.publish(
          docs.filter(col("doc_id") % 5 =!= 0)
            .withColumn("text", when(col("doc_id") % 3 === 0,
              concat(col("text"), lit(" edited"))).otherwise(col("text"))),
          dir)
        val oldScores = pipeline.Curation.docScores(
          pipeline.Snapshot.read(s, dir, Some(v1)))
        pipeline.Curation.incrementalDocScores(s, dir, v1, v2, oldScores)
          .select(col("doc_id"), col("source"), col("n_tokens"),
            ts.Round6.r6(col("quality")).as("quality"), col("lang_pred"),
            ts.Round6.r6(col("entropy")).as("entropy"))
          .orderBy("doc_id")
      }): Q,
      Some(
        s"""WITH documents AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 3 = 0 THEN text || ' edited'
           |         ELSE text END AS text,
           |    lang, source, n_chars
           |  FROM main.documents WHERE doc_id % 5 <> 0
           |),
           |${pipeline.TextAnalysis.charEntropySql},
           |qual AS (${pipeline.TextAnalysis.qualityScoreSql}),
           |lang AS (${pipeline.TextAnalysis.languageIdSql})
           |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source,
           |  CAST(q.n_tokens AS BIGINT) AS n_tokens,
           |  ${ts.Round6.r6Sql("CAST(q.quality AS DOUBLE)")} AS quality,
           |  l.lang_pred,
           |  ${ts.Round6.r6Sql("e.entropy")} AS entropy
           |FROM documents d
           |LEFT JOIN qual q USING (doc_id)
           |LEFT JOIN lang l USING (doc_id)
           |LEFT JOIN ent e USING (doc_id)
           |ORDER BY doc_id""".stripMargin)),

    // streaming curation scores (the batch/stream duality proof for
    // the curation family): the corpus arrives as FOUR micro-batches
    // through CurationStream.processBatch — with batch 2 REPLAYED
    // (the crash-recovery path: a replay rewrites its own bid
    // partition, never appends) — and the accumulated score store
    // must equal a whole-corpus docScores, which is what the oracle
    // computes per-doc over the full table
    ("cu_stream_scores",
      ((s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id").cast("long").as("doc_id"), col("source"),
          col("text"))
        val dir = java.nio.file.Files.createTempDirectory("strsc")
          .toString + "/scores"
        (0L until 4L).foreach(bid =>
          streaming.CurationStream.processBatch(
            docs.filter(col("doc_id") % 4 === bid), bid, dir))
        // replay bid 2 — the accumulated table must not change
        streaming.CurationStream.processBatch(
          docs.filter(col("doc_id") % 4 === 2L), 2L, dir)
        streaming.CurationStream.readScores(s, dir)
          .select(col("doc_id"), col("source"), col("n_tokens"),
            ts.Round6.r6(col("quality")).as("quality"), col("lang_pred"),
            ts.Round6.r6(col("entropy")).as("entropy"))
          .orderBy("doc_id")
      }): Q,
      Some(
        s"""WITH ${pipeline.TextAnalysis.charEntropySql},
           |qual AS (${pipeline.TextAnalysis.qualityScoreSql}),
           |lang AS (${pipeline.TextAnalysis.languageIdSql})
           |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source,
           |  CAST(q.n_tokens AS BIGINT) AS n_tokens,
           |  ${ts.Round6.r6Sql("CAST(q.quality AS DOUBLE)")} AS quality,
           |  l.lang_pred,
           |  ${ts.Round6.r6Sql("e.entropy")} AS entropy
           |FROM documents d
           |LEFT JOIN qual q USING (doc_id)
           |LEFT JOIN lang l USING (doc_id)
           |LEFT JOIN ent e USING (doc_id)
           |ORDER BY doc_id""".stripMargin)),

    // the COMPOSED streaming pipeline (dedup -> scores -> periodic
    // selection as one lifecycle): the corpus arrives as four
    // micro-batches through PipelineStream.processBatch — with batch 1
    // REPLAYED (the crash path that dies BETWEEN stages: both stores
    // rewrite their own bid partitions) — then ONE selection pass
    // composes the accumulated state: dedup survivors × the stored
    // entropy gate × select-time corpus-model scores. Must equal the
    // oracle's batch restatement: selectTraining over the
    // minhash-dedup survivor corpus.
    ("cu_stream_pipeline",
      ((s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id").cast("long").as("doc_id"), col("source"),
          col("text"))
        val dir = java.nio.file.Files.createTempDirectory("strpipe")
          .toString
        (0L until 4L).foreach(bid =>
          streaming.PipelineStream.processBatch(s,
            docs.filter(col("doc_id") % 4 === bid), bid, dir, 0.8))
        // replay bid 1 — the accumulated state must not change
        streaming.PipelineStream.processBatch(s,
          docs.filter(col("doc_id") % 4 === 1L), 1L, dir, 0.8)
        streaming.PipelineStream.select(s, docs, dir,
            maxPpl = 31.0, minEntropy = 2.7, budgetFrac = 0.8,
            maxEpochs = 2.0)
          .select(col("source"), col("doc_id").cast("long").as("doc_id"),
            col("copy"))
          .orderBy("source", "doc_id", "copy")
      }): Q,
      Some(
        s"""${pipeline.NearDup.minhashPairsSql(0.8)
               .replaceFirst("^WITH ", "WITH RECURSIVE ")},
           |${pipeline.NearDup.clustersSql},
           |keepers AS MATERIALIZED (
           |  SELECT doc_id FROM documents
           |  WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster)
           |), survcorp AS MATERIALIZED (
           |  SELECT d.doc_id, d.source, d.text
           |  FROM documents d JOIN keepers USING (doc_id)
           |),
           |${pipeline.Curation.selectTrainingSql(31.0, 2.7, 0.8, 2.0,
               "survcorp")}
           |SELECT source, CAST(doc_id AS BIGINT) AS doc_id, copy
           |FROM sel ORDER BY source, doc_id, copy""".stripMargin)),

    // Zipf-fit diagnostic: per-source ln(tf) ~ ln(rank) slope over the
    // top-100 vocabulary — the synthetic-content alarm next to
    // cu_drift's JS monitor
    ("cu_zipf",
      ((s, d) => pipeline.Curation.zipfFit(Tables.documents(s, d), 100)
        .orderBy("source")): Q,
      Some(pipeline.Curation.zipfFitSql(100))),

    // curriculum ordering: stage thresholds from the quantile sketch
    // (exact regime at verify scale — the oracle restates them with
    // the discrete-lower-quantile rank formula over non-null
    // qualities), then block-shuffled rank within each stage
    ("cu_curriculum",
      ((s, d) => pipeline.Curation.curriculumOrder(
          Tables.documents(s, d), 3, "cur1")
        .select(col("stage"), col("block"), col("rank"),
          col("doc_id").cast("long").as("doc_id"))
        .orderBy("stage", "block", "rank")): Q,
      Some {
        val blockOf = "('0x' || substr(hx, 1, 6))::BIGINT % 256"
        s"""WITH qual AS (${pipeline.TextAnalysis.qualityScoreSql}),
           |q6 AS (SELECT doc_id,
           |         ${ts.Round6.r6Sql("CAST(quality AS DOUBLE)")} AS q
           |       FROM qual),
           |rk AS (SELECT q, row_number() OVER (ORDER BY q) AS rn,
           |         count(*) OVER () AS n
           |       FROM q6 WHERE q IS NOT NULL),
           |thr AS (SELECT
           |  min(CASE WHEN rn >= greatest(1,
           |    CAST(ceil((CAST(1 AS DOUBLE)/3)*n) AS BIGINT)) THEN q END) AS t0,
           |  min(CASE WHEN rn >= greatest(1,
           |    CAST(ceil((CAST(2 AS DOUBLE)/3)*n) AS BIGINT)) THEN q END) AS t1
           |  FROM rk),
           |st AS (SELECT doc_id,
           |         CASE WHEN q <= t0 THEN 0 WHEN q <= t1 THEN 1 ELSE 2 END AS stage
           |       FROM q6, thr),
           |h AS (SELECT doc_id, stage,
           |        md5('cur1' || CAST(doc_id AS VARCHAR)) AS hx
           |      FROM st)
           |SELECT CAST(stage AS BIGINT) AS stage,
           |  CAST($blockOf AS BIGINT) AS block,
           |  CAST(row_number() OVER (PARTITION BY stage, $blockOf
           |    ORDER BY hx, CAST(doc_id AS VARCHAR)) AS BIGINT) AS rank,
           |  CAST(doc_id AS BIGINT) AS doc_id
           |FROM h ORDER BY stage, block, rank""".stripMargin
      }),

    // tokenizer quality metrics: per-source fertility (BPE tokens per
    // word) and chars-per-token compression over the learned merges —
    // the numbers a tokenizer run is judged by
    ("cu_bpe_fertility",
      ((s, d) => pipeline.Curation.bpeFertility(Tables.documents(s, d), 10)
        .orderBy("source")): Q,
      Some(
        s"""WITH ${pipeline.Curation.bpeMergesSql(10)},
           |${pipeline.Curation.bpeTokenizeSql(10)},
           |${pipeline.Curation.bpeFertilitySql}
           |SELECT source, n_docs, n_words, n_bpe_tokens, fertility,
           |  chars_per_token
           |FROM fert ORDER BY source""".stripMargin)),

    // per-source token-distribution drift: JS divergence vs the corpus
    // over the top-100 vocabulary
    ("cu_drift",
      ((s, d) => pipeline.Curation.sourceDrift(Tables.documents(s, d), 100)
        .select(col("source"), col("n_vocab_tokens"),
          ts.Round6.r6(col("js_div")).as("js_div"))
        .orderBy("source")): Q,
      Some(
        s"""WITH ${pipeline.Curation.sourceDriftSql(100)}
           |SELECT source, n_vocab_tokens,
           |  ${ts.Round6.r6Sql("js_div")} AS js_div
           |FROM outd ORDER BY source""".stripMargin)),

    // the materialized selection-score table: every model/surface
    // signal joined on doc_id in one frame (what a 100 TB pipeline
    // stores once and filters per experiment)
    // quality-threshold yield curve: survivors (docs + tokens) at each
    // decile cutoff — the gauge a pipeline reads before fixing its
    // minQuality gate; all ten thresholds emit even when empty
    ("cu_yield_curve",
      ((s, d) => pipeline.Curation.yieldCurve(Tables.documents(s, d))
        .select(col("threshold"), col("n_docs").cast("long").as("n_docs"),
          col("n_tokens").cast("long").as("n_tokens"))
        .orderBy("threshold")): Q,
      Some(
        s"""SELECT threshold, CAST(n_docs AS BIGINT) AS n_docs,
           |  CAST(n_tokens AS BIGINT) AS n_tokens
           |FROM (${pipeline.Curation.yieldCurveSql(
                     ts.Round6.r6Sql("CAST(quality AS DOUBLE)"))})
           |ORDER BY threshold""".stripMargin)),

    // trained quality filter: multinomial Naive Bayes seeded by a
    // trusted and an untrusted source slice, scored over the WHOLE
    // corpus (the CCNet/GPT-3 recipe) — log-odds per doc, hash-exact
    // via the sorted-fold determinism rule
    {
      // ONE pair of seed slices feeds both engines — a drift between
      // the Spark filter and the oracle's IN-list would only surface
      // as an opaque hash mismatch
      val goodSrcs = Seq("src0", "src1", "src2", "src3", "src4")
      val badSrcs = Seq("src15", "src16", "src17", "src18", "src19")
      ("cu_nb_quality",
        ((s, d) => {
          val docs = Tables.documents(s, d)
          val good = docs.filter(col("source").isin(goodSrcs: _*))
          val bad = docs.filter(col("source").isin(badSrcs: _*))
          pipeline.Curation.nbQualityScores(docs, good, bad)
            .select(col("doc_id").cast("long").as("doc_id"),
              ts.Round6.r6(col("score")).as("score"))
            .orderBy("doc_id")
        }): Q,
        Some(pipeline.Curation.nbQualitySql(goodSrcs, badSrcs)))
    },

    ("cu_scores",
      ((s, d) => pipeline.Curation.scoreTable(Tables.documents(s, d))
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          col("n_tokens"), ts.Round6.r6(col("quality")).as("quality"),
          col("lang_pred"), ts.Round6.r6(col("ppl")).as("ppl"),
          ts.Round6.r6(col("entropy")).as("entropy"),
          ts.Round6.r6(col("logw")).as("logw"))
        .orderBy("doc_id")): Q,
      Some(
        s"""WITH ${pipeline.TextAnalysis.perplexitySql},
           |${pipeline.TextAnalysis.charEntropySql},
           |${pipeline.Curation.dsirWeightsSql},
           |qual AS (${pipeline.TextAnalysis.qualityScoreSql}),
           |lang AS (${pipeline.TextAnalysis.languageIdSql})
           |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source,
           |  CAST(q.n_tokens AS BIGINT) AS n_tokens,
           |  ${ts.Round6.r6Sql("CAST(q.quality AS DOUBLE)")} AS quality,
           |  l.lang_pred,
           |  ${ts.Round6.r6Sql("p.ppl")} AS ppl,
           |  ${ts.Round6.r6Sql("e.entropy")} AS entropy,
           |  ${ts.Round6.r6Sql("w.logw")} AS logw
           |FROM documents d
           |LEFT JOIN qual q USING (doc_id)
           |LEFT JOIN lang l USING (doc_id)
           |LEFT JOIN ppx p USING (doc_id)
           |LEFT JOIN ent e USING (doc_id)
           |LEFT JOIN dsw w USING (doc_id)
           |ORDER BY doc_id""".stripMargin)),

    // DSIR importance weights: hashed-unigram log-likelihood ratio of
    // the target (even-doc) vs raw (odd-doc) bucket distributions
    ("cu_dsir",
      ((s, d) => pipeline.Curation.dsirWeights(Tables.documents(s, d))
        .select(col("doc_id").cast("long").as("doc_id"), col("n_tokens"),
          ts.Round6.r6(col("logw")).as("logw"))
        .orderBy("doc_id")): Q,
      Some(
        s"""WITH ${pipeline.Curation.dsirWeightsSql}
           |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
           |  ${ts.Round6.r6Sql("logw")} AS logw
           |FROM dsw ORDER BY doc_id""".stripMargin)),

    // end-to-end data selection: perplexity + entropy + DSIR gates,
    // survivors UniMax-sampled to 80% of their tokens at <= 2 epochs
    ("cu_select",
      ((s, d) => pipeline.Curation.selectTraining(
          Tables.documents(s, d), 31.0, 2.7, 0.8, 2.0)
        .select(col("source"), col("doc_id").cast("long").as("doc_id"),
          col("copy"))
        .orderBy("source", "doc_id", "copy")): Q,
      Some(
        s"""WITH ${pipeline.Curation.selectTrainingSql(31.0, 2.7, 0.8, 2.0)}
           |SELECT source, CAST(doc_id AS BIGINT) AS doc_id, copy
           |FROM sel ORDER BY source, doc_id, copy""".stripMargin)),

    // overlapping token-window chunking (embedding/retrieval prep):
    // 32-token chunks every 24 tokens, final partial kept
    ("cu_chunks",
      ((s, d) => pipeline.Curation.chunk(Tables.documents(s, d), 32, 24)
        .orderBy("doc_id", "chunk_ix")): Q,
      Some(
        s"""WITH ${pipeline.Curation.chunkSql(32, 24)}
           |SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |  CAST(chunk_ix AS BIGINT) AS chunk_ix,
           |  CAST(tok_start AS BIGINT) AS tok_start, chunk_text
           |FROM chunks ORDER BY doc_id, chunk_ix""".stripMargin)),

    // end-to-end curation capstone: near-dup dedup → quality floor →
    // decontamination → source cap → sequence packing, one composed
    // pipeline against one composed oracle
    ("cu_pipeline",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        pipeline.Curation.curate(docs, docs.filter(col("doc_id") % 17 === 0),
            minJ = 0.8, minQuality = 0.65, maxContamination = 0.10,
            cap = 15, salt = "mix1", budget = 512)
          .orderBy("doc_id")
      }): Q,
      Some(pipeline.Curation.curateSql(0.8, 0.65, 0.10, 15, "mix1", 512, 17))),

    // joint sampling consistency: documents and embeddings sampled
    // INDEPENDENTLY by the same key hash stay aligned — the property
    // that makes hash sampling usable across derived tables (sampling
    // then joining == joining then sampling)
    ("sp_joint_sample",
      ((s, d) => {
        val docs = pipeline.Sampling.hashSample(
            Tables.documents(s, d), col("doc_id"), 0.2)
          .select(col("doc_id").cast("long").as("doc_id"))
        val embs = pipeline.Sampling.hashSample(
            Tables.embeddings(s, d), col("vec_id"), 0.2)
          .select(col("vec_id").cast("long").as("doc_id"),
            ts.Round6.r6(graft.functions.VectorExprs.dot(
              col("embedding"), col("embedding"))).as("norm2"))
        docs.join(embs, "doc_id").orderBy("doc_id")
      }): Q,
      Some {
        val dotSelf =
          s"list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) " +
            s"for i in generate_series(1, ${pipeline.Similarity.Dim})])"
        s"""SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           |  ${ts.Round6.r6Sql(dotSelf)} AS norm2
           |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
           |WHERE ${pipeline.Sampling.bucketSql("d.doc_id")} < 2000
           |  AND ${pipeline.Sampling.bucketSql("e.vec_id")} < 2000
           |ORDER BY doc_id""".stripMargin
      }),

    // deterministic train/val/test split: 80/10/10 by stable key
    // hash — per-split census (consistent across derived tables)
    ("sp_split",
      ((s, d) => {
        val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
        pipeline.Sampling.splitAssign(
            Tables.documents(s, d), col("doc_id"), splits)
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("n_chars"))
          .orderBy("split")
      }): Q,
      Some({
        val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
        s"""SELECT ${pipeline.Sampling.splitAssignSql("doc_id", splits)} AS split,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS n_chars
           |FROM documents GROUP BY 1 ORDER BY split""".stripMargin
      })),

    // Efraimidis–Spirakis weighted sampling without replacement:
    // top-50 docs by ln(u)/n_chars — longer docs proportionally
    // likelier, selection engine-portable via the rounded log key
    ("sp_weighted",
      ((s, d) => pipeline.Sampling.weightedSample(
          Tables.documents(s, d), col("doc_id"),
          greatest(col("n_chars"), lit(1)), 50)
        .orderBy(col("es_key").desc, col("id"))): Q,
      Some(
        s"""SELECT CAST(doc_id AS BIGINT) AS id,
           |  ${pipeline.Sampling.esKeySql("doc_id", "greatest(n_chars, 1)")} AS es_key
           |FROM documents
           |ORDER BY es_key DESC, id LIMIT 50""".stripMargin)),

    // deterministic training-order shuffle: block-major (block, rank)
    ("sp_shuffle_rank",
      ((s, d) => pipeline.Sampling.shuffleRank(
          Tables.documents(s, d).select("doc_id"), col("doc_id"), "epoch1")
        .select(col("block"), col("rank").cast("long").as("rank"),
          col("doc_id").cast("long").as("doc_id"))
        .orderBy("block", "rank")): Q,
      Some(
        s"""WITH h AS (
           |  SELECT doc_id, md5('epoch1' || CAST(doc_id AS VARCHAR)) AS hx
           |  FROM documents
           |)
           |SELECT CAST(('0x' || substr(hx, 1, 6))::BIGINT % 256 AS BIGINT) AS block,
           |       CAST(row_number() OVER (
           |         PARTITION BY ('0x' || substr(hx, 1, 6))::BIGINT % 256
           |         ORDER BY hx, CAST(doc_id AS VARCHAR)) AS BIGINT) AS rank,
           |       CAST(doc_id AS BIGINT) AS doc_id
           |FROM h ORDER BY block, rank""".stripMargin)),

    // mergeable uniform-sample tier: per-source bottom-5 sketches over
    // two disjoint increments, union re-selected — bottom-k is
    // monotone, so the merge EQUALS the direct whole-corpus bottom-k
    // the oracle states
    ("sp_sample_sketch",
      ((s, d) => {
        val docs = Tables.documents(s, d)
        val sketches = pipeline.Sampling.sampleSketch(
            docs.filter(col("doc_id") % 2 === 0), "source", col("doc_id"),
            5, "smp1")
          .union(pipeline.Sampling.sampleSketch(
            docs.filter(col("doc_id") % 2 === 1), "source", col("doc_id"),
            5, "smp1"))
        pipeline.Sampling.mergeSampleSketches(sketches, "source", 5)
          .orderBy("source", "key")
      }): Q,
      Some(
        """SELECT source, key FROM (
          |  SELECT source, CAST(doc_id AS VARCHAR) AS key,
          |    row_number() OVER (PARTITION BY source
          |      ORDER BY md5('smp1' || CAST(doc_id AS VARCHAR)),
          |               CAST(doc_id AS VARCHAR)) AS rn
          |  FROM documents)
          |WHERE rn <= 5 ORDER BY source, key""".stripMargin))
  )

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
