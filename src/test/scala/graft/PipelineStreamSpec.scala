package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline.{Curation, NearDup}
import graft.streaming.{DedupStream, PipelineStream}

/** The COMPOSED streaming pipeline (VERDICT r14 task 6): dedup +
  * scoring accumulate through ONE lifecycle, the periodic selection
  * composes the accumulated state, and the whole thing equals the
  * batch restatement — selectTraining over the minhash-dedup survivor
  * corpus — including across a crash that dies BETWEEN the two stages
  * of a batch and across a checkpointed stream restart. */
class PipelineStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("pipeline-stream-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  // mixed corpus with PLANTED near-dup twins that straddle the batch
  // split (doc_id % 4): 2k is a 12-word doc, 2k+1 its one-word-edited
  // twin — the dedup stage must actually change the survivor set.
  // Vocabulary is SHARED across docs (word${..%9}) so the bigram LM
  // generalizes, and every 7th pair is low-entropy gibberish so the
  // stored-entropy gate actually splits the corpus.
  private def corpus: Seq[(Long, String, String)] =
    (0L until 20L).flatMap { k =>
      val base = (0 until 12).map(j => s"word${(k + j) % 9}")
      val twin = base.updated((k % 12).toInt, s"extra${k % 5}")
      // the even (DSIR-target) half reads distinctively so logw > 0
      // actually selects a subset instead of hovering at zero on a
      // symmetric vocabulary
      def body(ws: Seq[String], even: Boolean) =
        if (k % 7 == 3) "aa aa aa aa aa aa aa aa aa aa"
        else ws.mkString(" ") + ". A full sentence follows here." +
          (if (even) " target topic target topic" else " filler noise")
      Seq((2 * k, if (k % 2 == 0) "web" else "books",
          body(base, even = true)),
        (2 * k + 1, if (k % 2 == 0) "web" else "books",
          body(twin, even = false)))
    }

  private val (maxPpl, minEntropy, budgetFrac, maxEpochs) =
    (1e6, 2.0, 0.8, 2.0)
  private val minJ = 0.5

  private def docsDf: DataFrame = {
    val s = spark; import s.implicits._
    corpus.toDF("doc_id", "source", "text")
  }

  /** The batch restatement: selectTraining over the minhash-survivor
    * corpus. */
  private def batchSelect(): Seq[(String, Long, Long)] = {
    val docs = docsDf
    val losers = NearDup.clusters(NearDup.minhashPairs(docs, minJ))
      .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    val surv = docs.join(losers, Seq("doc_id"), "left_anti")
    norm(Curation.selectTraining(surv, maxPpl, minEntropy,
      budgetFrac, maxEpochs))
  }

  private def norm(df: DataFrame): Seq[(String, Long, Long)] =
    df.select(col("source"), col("doc_id").cast("long"),
        col("copy").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted

  test("stream-composed select == batch selectTraining over dedup " +
      "survivors; mid-run replay is a no-op") {
    val s = spark
    val docs = docsDf
    val dir = Files.createTempDirectory("pipestream").toString
    (0L until 4L).foreach(bid => PipelineStream.processBatch(s,
      docs.filter(col("doc_id") % 4 === bid), bid, dir, minJ))
    // replay batch 2 whole (crash after commit lost the offset): both
    // stages rewrite their own bid partitions
    PipelineStream.processBatch(s,
      docs.filter(col("doc_id") % 4 === 2L), 2L, dir, minJ)
    val streamed = norm(PipelineStream.select(s, docs, dir,
      maxPpl, minEntropy, budgetFrac, maxEpochs))
    val batch = batchSelect()
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // the dedup stage genuinely gated: some doc was dropped
    assert(PipelineStream.survivors(s, docs, dir).count() <
      docs.count())
  }

  test("crash BETWEEN stages: dedup landed, scores did not — the " +
      "replay rewrites both and nothing doubles") {
    val s = spark
    val docs = docsDf
    val dir = Files.createTempDirectory("pipestream-mid").toString
    (0L until 2L).foreach(bid => PipelineStream.processBatch(s,
      docs.filter(col("doc_id") % 4 === bid), bid, dir, minJ))
    // batch 2 dies between stages: ONLY the dedup stage ran
    DedupStream.processBatch(s,
      docs.filter(col("doc_id") % 4 === 2L)
        .select(col("doc_id").cast("long").as("doc_id"), col("text")),
      2L, s"$dir/dedup/state", s"$dir/dedup/pairs", minJ)
    // restart replays batch 2 through BOTH stages, then 3 proceeds
    Seq(2L, 3L).foreach(bid => PipelineStream.processBatch(s,
      docs.filter(col("doc_id") % 4 === bid), bid, dir, minJ))
    assert(norm(PipelineStream.select(s, docs, dir,
      maxPpl, minEntropy, budgetFrac, maxEpochs)) === batchSelect())
    // score rows: exactly one per doc (the half-done batch never
    // produced score rows to double; the dedup partitions rewrote)
    assert(graft.streaming.CurationStream.readScores(s, s"$dir/scores")
      .count() === docs.count())
  }

  test("MemoryStream lifecycle with a checkpointed RESTART mid-corpus") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("pipestream-mem").toString
    val mem = MemoryStream[(Long, String, String)]
    val q1 = PipelineStream.start(
      mem.toDF().toDF("doc_id", "source", "text"), dir, minJ)
    try {
      mem.addData(corpus.filter(_._1 < 20): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the SAME checkpoint tree (the supervised-lifecycle
    // crash path); the rest of the corpus lands post-restart
    val q2 = PipelineStream.start(
      mem.toDF().toDF("doc_id", "source", "text"), dir, minJ)
    try {
      mem.addData(corpus.filter(_._1 >= 20): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(norm(PipelineStream.select(s, docsDf, dir,
      maxPpl, minEntropy, budgetFrac, maxEpochs)) === batchSelect())
  }
}
