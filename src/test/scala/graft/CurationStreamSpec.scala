package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline.Curation
import graft.streaming.CurationStream

/** The curation family's batch/stream duality (VERDICT r13 task 6):
  * continuous doc-local scoring over a document stream must equal the
  * whole-corpus [[Curation.docScores]], batch replays must be no-ops
  * (bid-partition rewrite, the DedupStream exactly-once story), and
  * the composed stream-then-select path must match selecting over a
  * batch score table. */
class CurationStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("curation-stream-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  // small mixed corpus: varied lengths, two sources, some repetition
  private def corpus: Seq[(Long, String, String)] =
    (0L until 24L).map { i =>
      val words = (0 until (5 + (i % 7)).toInt)
        .map(j => s"word${(i * 3 + j) % 11}")
      val txt = if (i % 5 == 0) "THE the the. the the" // low quality
        else words.mkString(" ") + ". A sentence here."
      (i, if (i % 2 == 0) "web" else "books", txt)
    }

  private def norm(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      math.rint(r.getDouble(3) * 1e6) / 1e6, r.getString(4),
      math.rint(r.getDouble(5) * 1e6) / 1e6)).sortBy(_._1).toSeq

  private def scoreCols(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id").cast("long"), col("source"),
      col("n_tokens").cast("long"), col("quality"), col("lang_pred"),
      col("entropy"))

  test("batch-sliced streaming scores == whole-corpus docScores; " +
      "replay is a no-op") {
    val s = spark; import s.implicits._
    val docs = corpus.toDF("doc_id", "source", "text")
    val dir = Files.createTempDirectory("curstream").toString + "/scores"
    (0L until 3L).foreach(bid => CurationStream.processBatch(
      docs.filter(col("doc_id") % 3 === bid), bid, dir))
    val whole = norm(scoreCols(Curation.docScores(docs)).collect())
    val streamed = norm(scoreCols(
      CurationStream.readScores(s, dir)).collect())
    assert(streamed === whole)
    // replay batch 1 (crash recovery): rewrite, not append
    CurationStream.processBatch(
      docs.filter(col("doc_id") % 3 === 1L), 1L, dir)
    val replayed = norm(scoreCols(
      CurationStream.readScores(s, dir)).collect())
    assert(replayed === whole)
    assert(CurationStream.readScores(s, dir).count() === 24L)
  }

  test("MemoryStream lifecycle scores continuously; empty store reads") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("curstream-mem").toString
    assert(CurationStream.readScores(s, s"$dir/scores").count() === 0L)
    val mem = MemoryStream[(Long, String, String)]
    val q = CurationStream.start(
      mem.toDF().toDF("doc_id", "source", "text"),
      s"$dir/scores", s"$dir/ckpt")
    try {
      mem.addData(corpus.filter(_._1 < 10): _*)
      q.processAllAvailable()
      mem.addData(corpus.filter(_._1 >= 10): _*)
      q.processAllAvailable()
    } finally q.stop()
    val docs = corpus.toDF("doc_id", "source", "text")
    assert(norm(scoreCols(CurationStream.readScores(s, s"$dir/scores"))
        .collect()) ===
      norm(scoreCols(Curation.docScores(docs)).collect()))
  }
}
