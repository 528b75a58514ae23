package graft.streaming

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Snapshot

/** MVCC manifest protocol for the archive slot stores — cross-process
  * serve/merge isolation.
  *
  * Round 9's [[Ingest.StoreLock]] isolates renders from a merge's
  * dynamic partition overwrite, but only inside ONE JVM: at production
  * scale the ingest daemon and the query tier are separate processes
  * (the reference runs one `tgres` process, but its postgres store
  * gives every reader MVCC snapshots for free — `serde/postgres` reads
  * never see a torn row). This gives the parquet store the same
  * property with the repo's own snapshot machinery
  * ([[graft.pipeline.Snapshot]]'s claim/rename/pointer protocol):
  *
  * {{{
  *   archiveDir/
  *     _latest                      -> "N"        (pointer; atomic swing)
  *     v=N/manifest                 pt -> data-dir lines (driver-tiny)
  *     data-<uuid>/pt=M/part-*.parquet            (immutable chunks)
  * }}}
  *
  * - A MERGE writes only its touched partitions into a fresh immutable
  *   `data-` dir, then commits a new manifest version mapping those
  *   pts at the new dir (everything else carries over) — incremental
  *   exactly like the dynamic overwrite it replaces, plus one tiny
  *   driver-side manifest write and one rename. No store-sized
  *   rewrite, ever.
  * - A READER resolves the pointer once ([[state]]) and then touches
  *   only the immutable files that version lists: consistent without
  *   any lock, from any process, for as long as retention grace keeps
  *   the version ([[vacuum]]). Store generation = the committed
  *   version number — durable and cross-process, so the render cache's
  *   invalidation survives a daemon restart too.
  * - RETENTION is a manifest edit (drop aged pts) + [[vacuum]], which
  *   deletes data dirs no retained version references — a pinned
  *   reader inside the grace window keeps every file it can see.
  *
  * Writer concurrency contract: ONE writer per store directory (the
  * daemon already keeps one store per ingest lifecycle; merge and
  * retention on the same store serialize on [[Ingest.StoreLock]]'s
  * write lock within the daemon JVM). Concurrent writers from
  * different processes would lose updates manifest-vs-manifest — the
  * snapshot slot claim makes the race loud (versions diverge), not
  * silent, but the contract is single-writer.
  */
object ArchiveStore {

  /** One committed version: its number and its pt → data-dir map.
    * Holding a `State` pins the version: every path it can reach is
    * immutable once committed. */
  final case class State(version: Long, manifest: Map[Long, String])

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True when `dir` holds the round-9 LEGACY layout: top-level
    * `pt=` partition dirs with no `_latest` pointer. Such a store
    * predates the manifest protocol — treating it as empty would
    * silently drop all its on-disk history (the first post-upgrade
    * merge would commit a manifest omitting it). */
  def isLegacyLayout(spark: SparkSession, dir: String): Boolean = {
    val f = fsOf(spark, dir)
    val base = new Path(dir)
    Snapshot.latestVersion(spark, dir).isEmpty && f.exists(base) &&
      f.listStatus(base).exists(_.getPath.getName.startsWith("pt="))
  }

  /** Migrate a legacy (pre-manifest) store in place: move the
    * top-level `pt=` dirs into one fresh immutable `data-` chunk and
    * commit them as the v1 manifest, so the existing history becomes
    * the store's initial version instead of silently vanishing.
    * Pure driver-side renames (same filesystem, no data rewrite).
    * Returns the committed version; None when there is nothing to
    * adopt (already versioned, or genuinely empty). Caller holds the
    * store's writer mutex. */
  def adoptLegacy(spark: SparkSession, dir: String): Option[Long] = {
    if (!isLegacyLayout(spark, dir)) return None
    val f = fsOf(spark, dir)
    val base = new Path(dir)
    val dd = newDataDir()
    val ddPath = new Path(base, dd)
    f.mkdirs(ddPath)
    val pts = f.listStatus(base).map(_.getPath.getName)
      .filter(_.startsWith("pt="))
      .flatMap(n => n.stripPrefix("pt=").toLongOption.map(n -> _))
    pts.foreach { case (n, _) =>
      if (!f.rename(new Path(base, n), new Path(ddPath, n)))
        throw new IllegalStateException(
          s"legacy-store adoption: rename of $dir/$n failed")
    }
    Some(commit(spark, dir, pts.map { case (n, pt) => pt -> dd }.toMap))
  }

  /** Resolve the latest committed state; None for a never-written
    * store. `version` pins an older (still-vacuum-retained) one.
    * FAILS LOUDLY on a legacy (pre-manifest) layout — a store with
    * on-disk `pt=` history but no pointer must be adopted
    * ([[adoptLegacy]], run automatically by the merge path) before
    * any read; returning None here would silently read it as empty. */
  def state(spark: SparkSession, dir: String,
      version: Option[Long] = None): Option[State] = {
    val v = version.orElse(Snapshot.latestVersion(spark, dir))
    if (v.isEmpty && isLegacyLayout(spark, dir))
      throw new IllegalStateException(
        s"archive store $dir has pre-manifest pt= history but no " +
          "_latest pointer; run ArchiveStore.adoptLegacy (the daemon " +
          "merge path does this automatically) before reading")
    v.flatMap { ver =>
      val f = fsOf(spark, dir)
      val mf = new Path(dir, s"v=$ver/manifest")
      // a pinned version may be a skipped slot number or already
      // vacuumed — absent, not an error
      if (!f.exists(mf)) None
      else {
        val in = f.open(mf)
        val text =
          try new String(
            org.apache.commons.io.IOUtils.toByteArray(in),
            StandardCharsets.UTF_8)
          finally in.close()
        val entries = text.split("\n").iterator.map(_.trim)
          .filter(_.nonEmpty)
          .map { line =>
            val Array(pt, dd) = line.split("\t", 2)
            pt.toLong -> dd
          }.toMap
        Some(State(ver, entries))
      }
    }
  }

  /** The store's generation — the committed version number (0 = never
    * written). Durable and process-independent; monotone per store. */
  def version(spark: SparkSession, dir: String): Long =
    Snapshot.latestVersion(spark, dir).getOrElse(0L)

  /** Commit `manifest` as the next version; returns it. The data dirs
    * it references must be fully written first (they are immutable
    * from the reader's point of view the instant the pointer swings). */
  def commit(spark: SparkSession, dir: String,
      manifest: Map[Long, String]): Long = {
    val f = fsOf(spark, dir)
    f.mkdirs(new Path(dir))
    val tmp = new Path(dir, s".tmp-${UUID.randomUUID()}")
    f.mkdirs(tmp)
    val out = f.create(new Path(tmp, "manifest"), true)
    try out.write(manifest.toSeq.sortBy(_._1)
      .map { case (pt, dd) => s"$pt\t$dd" }
      .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    Snapshot.commitStaged(f, dir, tmp)
  }

  /** A fresh immutable data-dir name for a merge to stage into. */
  def newDataDir(): String = s"data-${UUID.randomUUID()}"

  /** The raw partial-slot frame of a pinned state:
    * (name, t, vw, dur, pt, bid). One parquet scan per referenced data
    * dir, each filtered to the pts the manifest assigns it (a dir may
    * hold stale copies of pts later versions rewrote elsewhere — the
    * manifest filter is what makes the read versioned). The pt
    * predicates are hive-partition prunes, so each scan touches only
    * its live directories; Catalyst pushes any caller pt/t filter into
    * every branch of the union. */
  def readRaw(spark: SparkSession, dir: String, st: State): DataFrame = {
    val empty = spark.emptyDataFrame.select(lit("").as("name"),
      lit(0L).as("t"), lit(0.0).as("vw"), lit(0.0).as("dur"),
      lit(0L).as("pt"), lit("").as("bid")).limit(0)
    if (st.manifest.isEmpty) empty
    else st.manifest.groupBy(_._2).map { case (dd, entries) =>
      val pts = entries.keys.map(Long.box).toIndexedSeq
      val raw = spark.read.parquet(s"$dir/$dd")
        .filter(col("pt").isin(pts: _*))
      val withBid = if (raw.columns.contains("bid")) raw
        else raw.withColumn("bid", lit(""))
      withBid.select(col("name"), col("t"), col("vw"), col("dur"),
        col("pt").cast("long").as("pt"), col("bid"))
    }.reduce(_.unionByName(_))
  }

  /** [[readRaw]] at the latest committed version (empty frame for a
    * never-written store). */
  def readLatest(spark: SparkSession, dir: String): DataFrame =
    state(spark, dir) match {
      case Some(st) => readRaw(spark, dir, st)
      case None => spark.emptyDataFrame.select(lit("").as("name"),
        lit(0L).as("t"), lit(0.0).as("vw"), lit(0.0).as("dur"),
        lit(0L).as("pt"), lit("").as("bid")).limit(0)
    }

  /** SIZE-TIERED small-file compaction for a long-running merge
    * cadence. Each merge leaves its touched partitions in a fresh
    * chunk, so over time the manifest references up to one chunk per
    * surviving batch epoch and a read unions that many scans.
    *
    * A full-store rewrite would fix that at O(store) write
    * amplification per maintenance tick — years of settled history
    * rewritten to fold a day of fresh batch debris. Instead, live
    * chunks are bucketed into log₄ SIZE TIERS (everything under
    * `tierBytes`, default 4 MB, is tier 0) and only a tier holding at
    * least `fanout` chunks
    * folds, each such tier into one fresh chunk. Folded bytes
    * graduate upward until their tier has no `fanout` peers — a big
    * consolidated chunk is never rewritten again until enough equally
    * big siblings accumulate, so a byte is rewritten O(#tiers) times
    * over the store's life, not O(ticks). `fanout = 2` with
    * uniformly tiny chunks degenerates to full collapse (the test /
    * small-store mode); production cadences want 4+.
    *
    * Per-pt files are preserved by the partitioned write (partition
    * pruning unchanged) and the bid column rides the rewrite
    * row-for-row (replay idempotence survives). Runs under the
    * store's writer mutex, same single-writer contract as
    * merge/retention; readers are unaffected — pinned versions keep
    * their chunks until vacuum grace expires. Returns the committed
    * version (None when no tier is foldable — nothing rewritten). */
  def compact(spark: SparkSession, dir: String,
      keepVersions: Int = 8, fanout: Int = 2,
      tierBytes: Long = 4L * 1024 * 1024): Option[Long] = {
    require(fanout >= 2, "fanout must be >= 2")
    require(tierBytes >= 1, "tierBytes must be >= 1")
    Ingest.StoreLock.write(dir) {
      state(spark, dir).filter(_.manifest.nonEmpty).flatMap { st =>
        val f = fsOf(spark, dir)
        // live bytes per chunk: only the pts the manifest assigns it
        // (a chunk may hold stale copies of pts rewritten elsewhere)
        val sized = st.manifest.groupBy(_._2).toSeq.map {
          case (dd, entries) =>
            val pts = entries.keys.toSeq
            val bytes = pts.map { pt =>
              val p = new Path(s"$dir/$dd/pt=$pt")
              if (f.exists(p)) f.getContentSummary(p).getLength else 0L
            }.sum
            (dd, pts, bytes)
        }
        def tierOf(bytes: Long): Int =
          (math.log(math.max(1.0, bytes.toDouble / tierBytes)) /
            math.log(4.0)).toInt
        val foldable = sized.groupBy { case (_, _, b) => tierOf(b) }
          .filter(_._2.size >= fanout)
        if (foldable.isEmpty) None
        else {
          // each foldable tier → one fresh chunk; single commit
          val edits: Map[Long, String] = foldable.values.flatMap { tier =>
            val dd = newDataDir()
            val pts = tier.flatMap(_._2).toSet
            readRaw(spark, dir, State(st.version,
              st.manifest.filter(kv => pts(kv._1))))
              .write.partitionBy("pt").parquet(s"$dir/$dd")
            pts.map(_ -> dd)
          }.toMap
          val v = commit(spark, dir, st.manifest ++ edits)
          vacuum(spark, dir, keepVersions)
          Some(v)
        }
      }
    }
  }

  /** Reclaim storage: drop version dirs older than the newest
    * `keepVersions` (the reader grace window — a reader pinned at any
    * RETAINED version keeps every file its manifest lists), then drop
    * `data-` dirs referenced by NO retained version. Unreferenced data
    * dirs younger than `orphanGraceMs` survive — they may be an
    * in-flight merge's staged chunk whose commit hasn't landed yet.
    * Crash-safe: deleting is idempotent and only touches what no
    * retained reader can reach. */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int = 2,
      orphanGraceMs: Long = 3600L * 1000): Unit = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    val f = fsOf(spark, dir)
    val base = new Path(dir)
    if (!f.exists(base)) return
    val latest = Snapshot.latestVersion(spark, dir).getOrElse(return)
    val floor = latest - keepVersions + 1
    val now = System.currentTimeMillis()
    // old versions (and their slot locks) first, so the live set below
    // is computed over exactly the retained manifests. A v > latest
    // dir gets the same modification-time grace as staged data/.tmp
    // dirs: it may be ANOTHER process's commit racing between its
    // v=N rename and the pointer swing — deleting it inside the
    // window would silently destroy that committed data instead of
    // making the single-writer violation loud.
    f.listStatus(base).foreach { s =>
      val n = s.getPath.getName
      val stale =
        (n.startsWith("v=") &&
          n.drop(2).toLongOption.exists(v => v < floor ||
            (v > latest && now - s.getModificationTime > orphanGraceMs))) ||
        (n.startsWith(".lock-v=") &&
          n.stripPrefix(".lock-v=").toLongOption.exists(_ < floor))
      if (stale) { f.delete(s.getPath, true); () }
    }
    val live: Set[String] = (floor to latest).flatMap(v =>
      state(spark, dir, Some(v)).toSeq.flatMap(_.manifest.values)).toSet
    f.listStatus(base).foreach { s =>
      val n = s.getPath.getName
      val unreferenced = n.startsWith("data-") && !live.contains(n)
      val debris = n.startsWith(".tmp-")
      if ((unreferenced || debris) &&
          now - s.getModificationTime > orphanGraceMs) {
        f.delete(s.getPath, true); ()
      }
    }
  }
}
