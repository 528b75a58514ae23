package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic load generator (`blaster/blaster.go:16-146`): N series of
  * sinusoid-ish random-walk points at a fixed step — the reference uses
  * it to stress ingest; here it generates deterministic bench corpora
  * of arbitrary size from `spark.range` (no driver-side data, scales to
  * any row count the cluster can hold).
  *
  * Determinism: the "random" walk is a hash of (series, index), so any
  * slice of the output is reproducible independent of partitioning. */
object Blaster {

  /** @param nSeries  number of series (`blaster.n`)
    * @param nPoints  points per series
    * @param stepSec  spacing; timestamps start at `t0` */
  /** Live rate-controlled load generator — the reference's in-daemon
    * blaster (`blaster/blaster.go:34-146`): a background thread feeds
    * graphite lines into the ingest gateway at `rate` points/sec over
    * `nSeries` sinusoid series, both settable at runtime via the
    * `/blaster/set` HTTP route (`http/blaster.go:26-67`). Rate 0 (the
    * boot state) emits nothing, exactly like the reference's
    * zero-limit limiter. Names follow the reference's
    * `<prefix>.test.aNN.bNN.cNN.dNN` scheme and values its
    * span-periodic sinusoid of CURRENT time with the per-series
    * offset (`blaster/blaster.go:93-117`); the series pick is a
    * seeded PRNG so test runs are reproducible. */
  final class LiveBlaster(offer: String => Unit,
      prefix: String = "tgres.blaster", spanSec: Long = 600L,
      seed: Long = 42L) extends AutoCloseable {
    private val rate = new java.util.concurrent.atomic.AtomicInteger(0)
    private val nSer = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile private var running = true
    def setRate(r: Int): Unit = rate.set(r)
    def setNSeries(n: Int): Unit = nSer.set(n)

    private val t = new Thread(() => {
      val rnd = new java.util.Random(seed)
      var carry = 0.0 // fractional-point credit, so rate < 10/s paces
      // correctly instead of rounding every 100 ms tick up to 1
      while (running) {
        val r = rate.get(); val n = nSer.get()
        if (r <= 0 || n <= 0) { carry = 0.0; Thread.sleep(100L) }
        else {
          // ~100 ms batches paced to `rate` points/sec (the reference's
          // token limiter, `blaster/blaster.go:37` rate.Limiter). The
          // sleep credits generation time — a fixed post-batch sleep
          // would cap the effective rate at batch/(gen+100ms), ~35 %
          // under target at 20 k eps with a capture-callback consumer
          val t0n = System.nanoTime()
          val allow = r * 0.1 + carry
          val batch = allow.toInt
          carry = allow - batch
          val nowSec = System.currentTimeMillis() / 1000L
          var i = 0
          while (i < batch && running) {
            val s = rnd.nextInt(n)
            val shifted = nowSec + s * 10L
            val y = math.sin(
              2.0 * math.Pi * ((shifted % spanSec).toDouble / spanSec)) * 100.0
            val name = f"$prefix.test.a${(s % 10000000) / 100000}%02d" +
              f".b${(s % 100000) / 1000}%02d.c${(s % 1000) / 10}%02d.d${s % 10}%02d"
            offer(s"$name $y $nowSec")
            i += 1
          }
          val genMs = (System.nanoTime() - t0n) / 1000000L
          Thread.sleep(math.max(1L, 100L - genMs))
        }
      }
    }, "graft-blaster")
    t.setDaemon(true)
    t.start()

    override def close(): Unit = { running = false }
  }

  def generate(spark: SparkSession, nSeries: Int, nPoints: Long,
      stepSec: Long = 10L, t0: Long = 1704067200L): DataFrame = {
    val rows = spark.range(nSeries.toLong * nPoints)
    val series = (col("id") % nSeries).cast("int")
    val idx = (col("id") / nSeries).cast("long")
    // sinusoid base + hash-noise, mirroring the reference's
    // sin + rand walk shape (`blaster/blaster.go:102-117`)
    val phase = series.cast("double") * 0.7
    val noise = (pmod(hash(col("id")).cast("long"), lit(1000L)).cast("double") - 500.0) / 1000.0
    rows.select(
      concat(lit("blaster.series_"), series).as("name"),
      (lit(t0) + idx * stepSec).as("tsSec"),
      (sin(idx.cast("double") / 10.0 + phase) * 50.0 + 100.0 + noise).as("value"))
  }
}
