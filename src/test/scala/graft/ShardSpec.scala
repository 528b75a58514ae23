package graft

import java.io.PrintWriter
import java.net.{ServerSocket, Socket}
import java.nio.file.Files

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.streaming.{Daemon, Ingest, Shard}

/** The ingest scale-out tier (SURVEY §2.1 cluster row;
  * `cluster/cluster.go:209-218` + `receiver/director.go:89-117`):
  * partition-rule parity with Spark SQL, the director's keep/forward/
  * marker semantics over real sockets, and the in-process two-shard
  * end-to-end — disjoint stores, union render bit-identical to a
  * single daemon fed the same stream. The FORKED-JVM twin (two real
  * daemon processes) runs in `graft.ClusterSmoke` (kept out of sbt
  * test with the other cross-process cases). */
class ShardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("shard-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  test("canonicalName: plain-JVM twin bit-equal to the Column form") {
    val s = spark; import s.implicits._
    // ownership is computed at the gateway from the plain twin while
    // the stored name comes from the Column form at parse — any
    // divergence splits a series across shards, so pin them equal on
    // the nasty cases: junk chars, spaces, tags unsorted/duplicated/
    // valueless, empty keys, trailing separators
    val raws = Seq(
      "plain.name", "with space.and/slash", "unicode.naïve.café",
      "semi;only", "t.m;b=2;a=1", "t.m;a=1;b=2", "t.m;a=1;a=2",
      "t.m;=v;k=", "t.m;novalue;k=v", "t.m;k=v;", "t.m;k=a=b",
      "t.m;k v=x y;z/w=q/r", "  lead.trail  ", "t;name=shadow;a=1",
      "a;b=c;b=d;b=e", "x.y;k2=v;k10=v", "")
    val plain = raws.map(Shard.canonicalName)
    val viaColumn = raws.toDF("n")
      .select(Ingest.sanitizeTagged(col("n")).as("c"))
      .as[String].collect().toSeq
    assert(plain === viaColumn)
  }

  test("owner: plain-JVM rule bit-equal to pmod(xxhash64(name), n)") {
    val s = spark; import s.implicits._
    val names = (0 until 200).map(i => s"srv$i.cpu.load") ++
      Seq("a", "a.b;k=v", "ünïcode.series", "x" * 300)
    for (n <- Seq(1, 2, 3, 16)) {
      val viaSql = names.toDF("name")
        .select(pmod(xxhash64(col("name")), lit(n.toLong)).cast("int"))
        .as[Int].collect().toSeq
      assert(names.map(Shard.owner(_, n)) === viaSql, s"shards=$n")
    }
    // ...and the rule actually spreads: no shard owns everything
    val spread = names.map(Shard.owner(_, 3)).toSet
    assert(spread === Set(0, 1, 2))
  }

  test("director: keep / forward / marker semantics over a real socket") {
    // stub peer: collect whatever the forwarder delivers
    val srv = new ServerSocket(0)
    val got = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      val c = srv.accept()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(c.getInputStream, "UTF-8"))
      Iterator.continually(in.readLine()).takeWhile(_ != null).foreach(got.put)
    })
    t.setDaemon(true); t.start()
    try {
      // find names owned by 0 and by 1 at shards=2
      val mine = (1 to 50).map(i => s"m$i.x").find(Shard.owner(_, 2) == 0).get
      val theirs = (1 to 50).map(i => s"t$i.x").find(Shard.owner(_, 2) == 1).get
      val d = new Shard.Director(0, 2,
        new Shard.Forwarder(Seq(0, srv.getLocalPort)))
      try {
        // owned: kept verbatim
        assert(d.route(s"$mine 1 100") === Some(s"$mine 1 100"))
        // foreign: forwarded (marked), dropped locally
        assert(d.route(s"$theirs 2 100") === None)
        val fwd = got.poll(5, java.util.concurrent.TimeUnit.SECONDS)
        assert(fwd === Shard.FwdMarker + s"$theirs 2 100")
        // a marked line ingests where it lands — never re-forwarded,
        // even when the rule says it belongs elsewhere (dp.Hops)
        assert(d.route(fwd) === Some(s"$theirs 2 100"))
        // malformed lines pass through for the local parse to drop
        assert(d.route("   ") === Some("   "))
        assert(d.kept.get === 1L && d.received.get === 1L)
      } finally d.close()
    } finally srv.close()
  }

  test("reroute: a marker is an old-count decision — stripped and " +
      "re-decided; a repl copy re-homes AND re-delivers its primary") {
    val srv = new ServerSocket(0)
    val got = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      val c = srv.accept()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(c.getInputStream, "UTF-8"))
      Iterator.continually(in.readLine()).takeWhile(_ != null).foreach(got.put)
    })
    t.setDaemon(true); t.start()
    try {
      val mine = (1 to 80).map(i => s"rm$i.x").find(Shard.owner(_, 3) == 0).get
      val theirs = (1 to 80).map(i => s"rt$i.x").find(Shard.owner(_, 3) == 1).get
      val replHere = new java.util.concurrent.LinkedBlockingQueue[String]()
      // a count-3 director standing in for the post-resize view; peer 1
      // is the stub, peer 2 unused here
      val d = new Shard.Director(0, 3,
        new Shard.Forwarder(Seq(0, srv.getLocalPort, 0)),
        copies = 2, replicaOffer = l => { replHere.put(l); () })
      try {
        // an OLD-count forward marker on a line this shard now owns:
        // reroute strips it and KEEPS the line (plain route would have
        // blindly ingested a foreign line under the marker)
        val keptLine = s"$mine 1 100"
        assert(d.reroute(Shard.FwdMarker + keptLine) === Some(keptLine))
        // ... and replicates it under the NEW placement (owner 0 ->
        // replica on 1, the stub)
        val repl = got.poll(5, java.util.concurrent.TimeUnit.SECONDS)
        assert(repl === Shard.ReplMarker + keptLine)
        // an old-count marker on a line now owned ELSEWHERE: re-forwarded
        // to owner 1 (the stub); its replica goes to holder 2, not here
        val fwdLine = s"$theirs 2 100"
        assert(d.reroute(Shard.FwdMarker + fwdLine) === None)
        assert(got.poll(5, java.util.concurrent.TimeUnit.SECONDS)
          === Shard.FwdMarker + fwdLine)
        // an old REPL copy re-homes to the new holders AND re-delivers
        // the primary as a no-fan Fwd1 (the copy that traveled as the
        // primary may have died with a departed member; when it did
        // not, the same-(name,ts) rejection self-heals the duplicate).
        // Here the owner is 1 (the stub — it gets the Fwd1) and the
        // holder is 2 (not this shard, so no local replica delivery).
        assert(d.reroute(Shard.ReplMarker + fwdLine) === None)
        assert(got.poll(5, java.util.concurrent.TimeUnit.SECONDS)
          === Shard.Fwd1Marker + fwdLine)
        assert(replHere.isEmpty)
        // a replica of a series owned by 2 lands HERE (0 = (2+1) mod 3)
        val ownedBy2 = (1 to 120).map(i => s"rz$i.x")
          .find(Shard.owner(_, 3) == 2).get
        assert(d.reroute(Shard.ReplMarker + s"$ownedBy2 3 100") === None)
        assert(replHere.poll(5, java.util.concurrent.TimeUnit.SECONDS)
          === s"$ownedBy2 3 100")
        // plain lines re-decide identically to route
        assert(d.reroute(keptLine) === Some(keptLine))
      } finally d.close()
    } finally srv.close()
  }

  test("gateway hold/release: lines park raw, re-admit through the " +
      "swapped route in order; listeners stay open") {
    val gw = new Daemon.LineGateway(0, 0, capacity = 64)
    try {
      gw.hold()
      // lines offered while held: parked, NOT routed, NOT fed
      (1 to 3).foreach(i => gw.offer(s"held$i"))
      assert(gw.heldSize === 3 && gw.queueSize === 0)
      // the listen socket still accepts while held
      val s = new Socket("127.0.0.1", gw.boundListenPort)
      val out = new PrintWriter(s.getOutputStream, true)
      out.println("held4")
      val d = System.currentTimeMillis() + 5000
      while (gw.heldSize < 4 && System.currentTimeMillis() < d)
        Thread.sleep(20)
      assert(gw.heldSize === 4)
      s.close()
      // release through a SWAPPED route: tag each line, keep order
      val seen = scala.collection.mutable.ArrayBuffer.empty[String]
      gw.setRoute(l => { seen += l; Some(s"re:$l") })
      gw.release()
      assert(seen.toSeq === Seq("held1", "held2", "held3", "held4"))
      assert(gw.queueSize === 4)
      // post-release lines route directly
      gw.offer("after")
      assert(seen.last === "after" && gw.heldSize === 0)
    } finally gw.close()
  }

  test("two in-process shards == one daemon: disjoint stores, union render") {
    val s = spark
    val root = Files.createTempDirectory("graft-shard").toString
    val base = (System.currentTimeMillis() / 1000L - 4000) / 10 * 10
    // series mix: plain names spread over both owners, plus one tagged
    // series spelled TWO ways that must canonicalize to one identity
    val plainNames = (1 to 12).map(i => s"srv$i.cpu")
    val spellA = "tag.m;zone=z;dc=east"
    val spellB = "tag.m;dc=east;zone=z" // same canonical series
    def linesOf(name: String): Seq[String] =
      (0 until 6).map(k => s"$name ${k + 1}.5 ${base + k * 10}")
    // entry daemon per series is FIXED (a collector's stable route):
    // per-series arrival order then survives the forwarding hop
    val entries: Seq[(String, Int)] =
      plainNames.zipWithIndex.map { case (n, i) => (n, i % 2) } ++
        Seq((spellA, 0), (spellB, 1))
    // shard gateways wired to each other through real directors
    val gwA0 = new ServerSocket(0); val pA = gwA0.getLocalPort; gwA0.close()
    val gwB0 = new ServerSocket(0); val pB = gwB0.getLocalPort; gwB0.close()
    val dirA = new Shard.Director(0, 2, new Shard.Forwarder(Seq(pA, pB)))
    val dirB = new Shard.Director(1, 2, new Shard.Forwarder(Seq(pA, pB)))
    val gA = new Daemon.LineGateway(pA, 0, route = dirA.route)
    val gB = new Daemon.LineGateway(pB, 0, route = dirB.route)
    val pkA = new Daemon.LineGateway(0, 0, framed = true)
    val pkB = new Daemon.LineGateway(0, 0, framed = true)
    // the single-daemon reference fed the identical stream
    val gC = new Daemon.LineGateway(0, 0)
    val pkC = new Daemon.LineGateway(0, 0, framed = true)
    def recv(g: Daemon.LineGateway, pk: Daemon.LineGateway, tag: String) =
      Daemon.startReceiver(s, g.boundFeedPort, pk.boundFeedPort,
        s"$root/$tag/points", stepSec = 10, heartbeatSec = 7200,
        checkpointDir = s"$root/$tag/ckpt")
    val qA = recv(gA, pkA, "a"); val qB = recv(gB, pkB, "b")
    val qC = recv(gC, pkC, "c")
    try {
      val sockA = new Socket("127.0.0.1", gA.boundListenPort)
      val sockB = new Socket("127.0.0.1", gB.boundListenPort)
      val sockC = new Socket("127.0.0.1", gC.boundListenPort)
      val outA = new PrintWriter(sockA.getOutputStream, true)
      val outB = new PrintWriter(sockB.getOutputStream, true)
      val outC = new PrintWriter(sockC.getOutputStream, true)
      entries.foreach { case (name, e) =>
        linesOf(name).foreach { l =>
          (if (e == 0) outA else outB).println(l)
          outC.println(l)
        }
      }
      Seq(outA, outB, outC).foreach(_.flush())
      // both directions of the forwarding hop must actually fire
      def rows(tag: String): Long =
        Try(Ingest.readArchive(s, s"$root/$tag/points").count())
          .getOrElse(0L)
      // n points per series consolidate to n-1 slots (the last point
      // opens the in-progress PDP interval, not a stored slot)
      val want = (plainNames.size + 1) * 5L
      val deadline = System.currentTimeMillis() + 120000
      while ((rows("a") + rows("b") < want || rows("c") < want) &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        Seq(qA, qB, qC).foreach(_.processAllAvailable())
      }
      Seq(qA, qB, qC).foreach(_.processAllAvailable())
      assert(dirA.kept.get > 0 && dirB.kept.get > 0)
      assert(dirA.received.get > 0 && dirB.received.get > 0,
        "forwarding must fire in BOTH directions")
      // disjoint ownership, asserted with the SQL form of the rule
      def names(tag: String, own: Int): (Long, Long) = {
        val df = Ingest.readArchive(s, s"$root/$tag/points")
          .select(col("name")).distinct()
          .withColumn("o", pmod(xxhash64(col("name")), lit(2L)).cast("int"))
        (df.count(), df.filter(col("o") === own).count())
      }
      val (na, oa) = names("a", 0); val (nb, ob) = names("b", 1)
      assert(na > 0 && na === oa, "shard A holds a series it does not own")
      assert(nb > 0 && nb === ob, "shard B holds a series it does not own")
      // the two tagged spellings converged on ONE canonical identity
      val tagged = Ingest.readArchives(s,
          Seq(s"$root/a/points", s"$root/b/points"))
        .select(col("name")).distinct()
        .filter(col("name").startsWith("tag.m"))
        .collect().map(_.getString(0)).toSeq
      assert(tagged === Seq("tag.m;dc=east;zone=z"))
      // union render == the single daemon, bit-identical
      def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Double)] =
        df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val union = rowsOf(Ingest.readArchives(s,
        Seq(s"$root/a/points", s"$root/b/points")))
      val single = rowsOf(Ingest.readArchive(s, s"$root/c/points"))
      assert(union === single,
        "sharded union render diverged from the single-daemon store")
      assert(union.size.toLong === want)
      sockA.close(); sockB.close(); sockC.close()
    } finally {
      Seq(qA, qB, qC).foreach(q => Try(q.stop()))
      Seq(gA, gB, gC, pkA, pkB, pkC).foreach(g => Try(g.close()))
      Seq(dirA, dirB).foreach(d => Try(d.close()))
    }
  }

  test("statsd directs too: single-owner aggregation, mass conserved") {
    val s = spark
    val root = Files.createTempDirectory("graft-shard-sd").toString
    val gwA0 = new ServerSocket(0); val pA = gwA0.getLocalPort; gwA0.close()
    val gwB0 = new ServerSocket(0); val pB = gwB0.getLocalPort; gwB0.close()
    // statsd ownership keys on the sanitized WIRE name
    val dirA = new Shard.Director(0, 2, new Shard.Forwarder(Seq(pA, pB)),
      parseName = Shard.statsdNameOf, canon = Shard.sanitizePlain)
    val dirB = new Shard.Director(1, 2, new Shard.Forwarder(Seq(pA, pB)),
      parseName = Shard.statsdNameOf, canon = Shard.sanitizePlain)
    val gA = new Daemon.LineGateway(pA, 0, route = dirA.route)
    val gB = new Daemon.LineGateway(pB, 0, route = dirB.route)
    def sd(g: Daemon.LineGateway, tag: String) =
      Daemon.startStatsdIngest(s, g.boundFeedPort, s"$root/$tag/statsd",
        flushSec = 10, checkpointDir = s"$root/$tag/ckpt")
    val qA = sd(gA, "a"); val qB = sd(gB, "b")
    try {
      // 8 counters, each sent from BOTH entry daemons (the worst case:
      // split aggregation would halve per-store mass but keep the
      // union's total — only single-owner aggregation puts each
      // series' WHOLE mass in one store)
      val names = (1 to 8).map(i => s"ctr$i")
      val sockA = new Socket("127.0.0.1", gA.boundListenPort)
      val sockB = new Socket("127.0.0.1", gB.boundListenPort)
      val outA = new PrintWriter(sockA.getOutputStream, true)
      val outB = new PrintWriter(sockB.getOutputStream, true)
      (1 to 5).foreach { _ =>
        names.foreach { n => outA.println(s"$n:2|c"); outB.println(s"$n:3|c") }
      }
      outA.flush(); outB.flush()
      def mass(tag: String): Map[String, Double] =
        Try(graft.streaming.ArchiveStore
            .readLatest(s, s"$root/$tag/statsd")
            .groupBy(col("name")).agg(sum(col("vw")).as("m"))
            .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)
          .getOrElse(Map.empty)
      val deadline = System.currentTimeMillis() + 120000
      while ((mass("a").size + mass("b").size < names.size ||
          (mass("a").values.sum + mass("b").values.sum) < 200.0 - 1e-6) &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        Seq(qA, qB).foreach(_.processAllAvailable())
      }
      Seq(qA, qB).foreach(_.processAllAvailable())
      val (ma, mb) = (mass("a"), mass("b"))
      // forwarding fired both ways and every series has ONE owner
      assert(dirA.received.get > 0 && dirB.received.get > 0)
      assert(ma.keySet.intersect(mb.keySet).isEmpty,
        s"split aggregation: ${ma.keySet.intersect(mb.keySet)}")
      // whole mass per series: 5 sends x (2+3) from the two entries
      val union = ma ++ mb
      assert(union.keySet === names.map(n => s"stats.$n").toSet)
      names.foreach { n =>
        assert(math.abs(union(s"stats.$n") - 25.0) < 1e-9,
          s"$n mass ${union.get(s"stats.$n")}")
      }
      sockA.close(); sockB.close()
    } finally {
      Seq(qA, qB).foreach(q => Try(q.stop()))
      Seq(gA, gB).foreach(g => Try(g.close()))
      Seq(dirA, dirB).foreach(d => Try(d.close()))
    }
  }

  test("pickle frames direct too: decode at the gateway, text-forward foreign points") {
    val s = spark
    import graft.streaming.Pickle
    val root = Files.createTempDirectory("graft-shard-pk").toString
    val base = (System.currentTimeMillis() / 1000L - 4000) / 10 * 10
    val gwA0 = new ServerSocket(0); val pA = gwA0.getLocalPort; gwA0.close()
    val gwB0 = new ServerSocket(0); val pB = gwB0.getLocalPort; gwB0.close()
    // graphite directors on the graphite gateways; the pickle director
    // forwards INTO the graphite ports (marked text)
    val dirA = new Shard.Director(0, 2, new Shard.Forwarder(Seq(pA, pB)))
    val dirB = new Shard.Director(1, 2, new Shard.Forwarder(Seq(pA, pB)))
    val pkDirA = new Shard.PickleDirector(0, 2, new Shard.Forwarder(Seq(pA, pB)))
    val pkDirB = new Shard.PickleDirector(1, 2, new Shard.Forwarder(Seq(pA, pB)))
    val gA = new Daemon.LineGateway(pA, 0, route = dirA.route)
    val gB = new Daemon.LineGateway(pB, 0, route = dirB.route)
    val pkA = new Daemon.LineGateway(0, 0, framed = true, route = pkDirA.route)
    val pkB = new Daemon.LineGateway(0, 0, framed = true, route = pkDirB.route)
    val gC = new Daemon.LineGateway(0, 0)
    val pkC = new Daemon.LineGateway(0, 0, framed = true)
    def recv(g: Daemon.LineGateway, pk: Daemon.LineGateway, tag: String) =
      Daemon.startReceiver(s, g.boundFeedPort, pk.boundFeedPort,
        s"$root/$tag/points", stepSec = 10, heartbeatSec = 7200,
        checkpointDir = s"$root/$tag/ckpt")
    val qA = recv(gA, pkA, "a"); val qB = recv(gB, pkB, "b")
    val qC = recv(gC, pkC, "c")
    try {
      // 8 series, values with awkward decimals (text round-trip must
      // be exact); per-series entry fixed: frames to A carry series
      // 1-4, frames to B carry 5-8 — ownership is hash-spread, so
      // frames split between local re-encode and text forwarding
      val names = (1 to 8).map(i => s"pk$i.m")
      def ptsOf(k: Int): Seq[Pickle.Point] =
        names.zipWithIndex.map { case (n, i) =>
          Pickle.Point(n, base + k * 10L, (i + 1) * 1.1 + k * 0.01) }
      def frameFor(entry: Int, k: Int): String =
        java.util.Base64.getEncoder.encodeToString(Pickle.encodeFrame(
          ptsOf(k).filter(p => (names.indexOf(p.name) < 4) == (entry == 0))))
      (0 until 6).foreach { k =>
        pkA.offer(frameFor(0, k)); pkB.offer(frameFor(1, k))
        pkC.offer(java.util.Base64.getEncoder.encodeToString(
          Pickle.encodeFrame(ptsOf(k))))
      }
      def rows(tag: String): Long =
        Try(Ingest.readArchive(s, s"$root/$tag/points").count())
          .getOrElse(0L)
      val want = 8L * 5L
      val deadline = System.currentTimeMillis() + 120000
      while ((rows("a") + rows("b") < want || rows("c") < want) &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        Seq(qA, qB, qC).foreach(_.processAllAvailable())
      }
      Seq(qA, qB, qC).foreach(_.processAllAvailable())
      assert(pkDirA.forwardedPoints.get > 0 && pkDirB.forwardedPoints.get > 0,
        "pickle text-forwarding must fire in both directions")
      def misOwned(tag: String, own: Int): Long =
        Ingest.readArchive(s, s"$root/$tag/points")
          .select(col("name")).distinct()
          .filter(pmod(xxhash64(col("name")), lit(2L)).cast("int") =!= own)
          .count()
      assert(misOwned("a", 0) === 0 && misOwned("b", 1) === 0)
      def rowsOf(dirs: Seq[String]): Set[(String, Long, Double)] =
        Ingest.readArchives(s, dirs).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val union = rowsOf(Seq(s"$root/a/points", s"$root/b/points"))
      val single = rowsOf(Seq(s"$root/c/points"))
      assert(union === single,
        "pickle-sharded union diverged from the single daemon")
      assert(union.size.toLong === want)
    } finally {
      Seq(qA, qB, qC).foreach(q => Try(q.stop()))
      Seq(gA, gB, gC, pkA, pkB, pkC).foreach(g => Try(g.close()))
      Seq(dirA, dirB).foreach(d => Try(d.close()))
      Seq(pkDirA, pkDirB).foreach(d => Try(d.close()))
    }
  }

  test("replication: copies=2 mirrors each shard's slice; owner-preferred render") {
    val s = spark
    val root = Files.createTempDirectory("graft-repl").toString
    val base = (System.currentTimeMillis() / 1000L - 4000) / 10 * 10
    val names = (1 to 10).map(i => s"rp$i.cpu")
    def linesOf(name: String): Seq[String] =
      (0 until 6).map(k => s"$name ${k + 1}.25 ${base + k * 10}")
    val gwA0 = new ServerSocket(0); val pA = gwA0.getLocalPort; gwA0.close()
    val gwB0 = new ServerSocket(0); val pB = gwB0.getLocalPort; gwB0.close()
    // replica traffic diverts into its own gateway + store per shard
    val replA = new Daemon.LineGateway(0, 0)
    val replB = new Daemon.LineGateway(0, 0)
    val dirA = new Shard.Director(0, 2, new Shard.Forwarder(Seq(pA, pB)),
      copies = 2, replicaOffer = replA.offer)
    val dirB = new Shard.Director(1, 2, new Shard.Forwarder(Seq(pA, pB)),
      copies = 2, replicaOffer = replB.offer)
    val gA = new Daemon.LineGateway(pA, 0, route = dirA.route)
    val gB = new Daemon.LineGateway(pB, 0, route = dirB.route)
    val pk = Seq.fill(4)(new Daemon.LineGateway(0, 0, framed = true))
    def recv(g: Daemon.LineGateway, pkg: Daemon.LineGateway, tag: String) =
      Daemon.startReceiver(s, g.boundFeedPort, pkg.boundFeedPort,
        s"$root/$tag/points", stepSec = 10, heartbeatSec = 7200,
        checkpointDir = s"$root/$tag/ckpt")
    val qs = Seq(recv(gA, pk(0), "a"), recv(gB, pk(1), "b"),
      recv(replA, pk(2), "ra"), recv(replB, pk(3), "rb"))
    try {
      // entry alternates independently of ownership: every placement
      // combination (entry=owner, entry=replica, both directions) fires
      val sockA = new Socket("127.0.0.1", gA.boundListenPort)
      val sockB = new Socket("127.0.0.1", gB.boundListenPort)
      val outA = new PrintWriter(sockA.getOutputStream, true)
      val outB = new PrintWriter(sockB.getOutputStream, true)
      names.zipWithIndex.foreach { case (n, i) =>
        linesOf(n).foreach(l => (if (i % 2 == 0) outA else outB).println(l))
      }
      outA.flush(); outB.flush()
      def rows(tag: String): Long =
        Try(Ingest.readArchive(s, s"$root/$tag/points").count())
          .getOrElse(0L)
      val want = names.size * 5L // 6 points -> 5 closed slots
      val deadline = System.currentTimeMillis() + 120000
      while ((rows("a") + rows("b") < want ||
          rows("ra") + rows("rb") < want) &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        qs.foreach(_.processAllAvailable())
      }
      qs.foreach(_.processAllAvailable())
      def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Double)] =
        df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val primA = rowsOf(Ingest.readArchive(s, s"$root/a/points"))
      val primB = rowsOf(Ingest.readArchive(s, s"$root/b/points"))
      val repA = rowsOf(Ingest.readArchive(s, s"$root/ra/points"))
      val repB = rowsOf(Ingest.readArchive(s, s"$root/rb/points"))
      // with N=2, copies=2: each shard's replica store mirrors the
      // OTHER shard's primary slice bit-identically
      assert(repA === primB, "A's replica store must mirror B's primary")
      assert(repB === primA, "B's replica store must mirror A's primary")
      assert(primA.nonEmpty && primB.nonEmpty)
      // owner-preferred render: all-up reads primaries only...
      val allUp = rowsOf(Shard.readClusterArchives(s,
        Seq(s"$root/a/points", s"$root/b/points"),
        Seq(s"$root/ra/points", s"$root/rb/points"), copies = 2))
      assert(allUp === primA ++ primB)
      // ...and with shard B down, A's replica serves B's slice —
      // render identical, nothing double-counted
      val bDown = rowsOf(Shard.readClusterArchives(s,
        Seq(s"$root/a/points", s"$root/b/points"),
        Seq(s"$root/ra/points", s"$root/rb/points"), copies = 2,
        down = Set(1)))
      assert(bDown === allUp,
        "owner-preferred render with a dead shard must equal the all-up render")
      assert(allUp.size.toLong === want)
      sockA.close(); sockB.close()
    } finally {
      qs.foreach(q => Try(q.stop()))
      (Seq(gA, gB, replA, replB) ++ pk).foreach(g => Try(g.close()))
      Seq(dirA, dirB).foreach(d => Try(d.close()))
    }
  }

  test("reshard 2->3: PDP state re-homes, straddling slot exact, no data moves") {
    val s = spark
    import graft.streaming.Reshard
    val root = Files.createTempDirectory("graft-reshard").toString
    val base = (System.currentTimeMillis() / 1000L - 4000) / 10 * 10
    val names = (1 to 8).map(i => s"rs$i.cpu")
    // epoch-1 points end MID-SLOT at base+55: slot [50,60) holds a
    // 5s partial and the in-progress interval [55, ?) is open — the
    // state the resize must hand to the new owner
    def e1Lines(n: String, v0: Int): Seq[String] =
      (Seq(0L, 10L, 20L, 30L, 40L, 55L).zipWithIndex).map { case (dt, k) =>
        s"$n ${v0 + k}.5 ${base + dt}" }
    // epoch-2 closes the straddle at base+58 and keeps going
    def e2Lines(n: String, v0: Int): Seq[String] =
      Seq(58L -> 6, 70L -> 7, 80L -> 8).map { case (dt, k) =>
        s"$n ${v0 + k}.5 ${base + dt}" }
    def gw(port: Int, route: String => Option[String]) =
      new Daemon.LineGateway(port, 0, route = route)
    def pkGw() = new Daemon.LineGateway(0, 0, framed = true)
    def recv(g: Daemon.LineGateway, tag: String,
        seed: Option[String] = None) =
      Daemon.startReceiver(s, g.boundFeedPort, pkGw().boundFeedPort,
        s"$root/$tag/points", stepSec = 10, heartbeatSec = 7200,
        checkpointDir = s"$root/$tag/ckpt",
        pdpSeed = seed.map(Reshard.readSeed(s, _)))
    def rows(tag: String): Long =
      Try(Ingest.readArchive(s, s"$root/$tag/points").count()).getOrElse(0L)
    def drainTo(want: Long, tags: Seq[String],
        qs: Seq[org.apache.spark.sql.streaming.StreamingQuery]): Unit = {
      val deadline = System.currentTimeMillis() + 120000
      while (tags.map(rows).sum < want &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(250); qs.foreach(_.processAllAvailable())
      }
      qs.foreach(_.processAllAvailable())
    }
    // ---- control: one daemon fed everything, never restarted ----
    val gC = new Daemon.LineGateway(0, 0)
    val qC = recv(gC, "ctl")
    // ---- epoch 1: two shards ----
    def freePort(): Int = {
      val ss = new ServerSocket(0); val p = ss.getLocalPort; ss.close(); p
    }
    val Seq(p1a, p1b) = Seq.fill(2)(freePort())
    val dir1a = new Shard.Director(0, 2, new Shard.Forwarder(Seq(p1a, p1b)))
    val dir1b = new Shard.Director(1, 2, new Shard.Forwarder(Seq(p1a, p1b)))
    val g1a = gw(p1a, dir1a.route); val g1b = gw(p1b, dir1b.route)
    val q1a = recv(g1a, "e1/a"); val q1b = recv(g1b, "e1/b")
    try {
      names.zipWithIndex.foreach { case (n, i) =>
        e1Lines(n, i * 10).foreach { l =>
          (if (i % 2 == 0) g1a else g1b).offer(l); gC.offer(l)
        }
      }
      // 6 slots per series land (slot 50 as a 5s partial)
      drainTo(names.size * 6L, Seq("e1/a", "e1/b"), Seq(q1a, q1b))
      drainTo(names.size * 6L, Seq("ctl"), Seq(qC))
      // graceful epoch stop: every accepted line committed, state
      // checkpointed at the final micro-batch
      q1a.stop(); q1b.stop()
      // ---- the remap: relinquished state -> seeds at M=3 ----
      val seeds = (0 until 3).map(i => s"$root/seed/$i")
      Reshard.writeSeeds(s, Seq(s"$root/e1/a/ckpt", s"$root/e1/b/ckpt"),
        3, seeds)
      // each seed holds exactly its owner's series, union = all live
      val seedNames = seeds.zipWithIndex.map { case (p, i) =>
        val df = s.read.parquet(p)
        val ns = df.select("name").collect().map(_.getString(0)).toSet
        assert(ns.forall(Shard.owner(_, 3) == i), s"seed $i mis-homed")
        // the handed-over state is the OPEN interval: lastTs = base+55
        df.collect().filter(r => r.getAs[String]("name").startsWith("rs"))
          .foreach(r => assert(r.getAs[Long]("lastTs") === base + 55))
        ns
      }.reduce(_ ++ _)
      assert(names.toSet.subsetOf(seedNames))
      // the CLI entry point writes the SAME seeds (and reuses this
      // suite's live session without stopping it)
      Reshard.main(Array("3", s"$root/seedcli",
        s"$root/e1/a/ckpt", s"$root/e1/b/ckpt"))
      assert(!s.sparkContext.isStopped, "Reshard.main stopped a live session")
      (0 until 3).foreach { i =>
        def rows(p: String) = s.read.parquet(p)
          .select("name", "lastTs", "lastVal").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
        assert(rows(s"$root/seedcli/$i") === rows(seeds(i)), s"cli seed $i")
      }
      intercept[IllegalArgumentException] { Reshard.main(Array("3")) }
      // ---- epoch 2: three shards, seeded, fresh checkpoints ----
      val Seq(p2a, p2b, p2c) = Seq.fill(3)(freePort())
      val ports2 = Seq(p2a, p2b, p2c)
      val dirs2 = (0 until 3).map(i =>
        new Shard.Director(i, 3, new Shard.Forwarder(ports2)))
      val gws2 = ports2.zip(dirs2).map { case (p, d) => gw(p, d.route) }
      val tags2 = Seq("e2/a", "e2/b", "e2/c")
      val qs2 = gws2.zip(tags2).zipWithIndex.map { case ((g, t), i) =>
        recv(g, t, seed = Some(seeds(i))) }
      try {
        names.zipWithIndex.foreach { case (n, i) =>
          e2Lines(n, i * 10).foreach { l =>
            gws2(i % 3).offer(l); gC.offer(l)
          }
        }
        // per series: e1 stores keep their 6 frozen rows (incl. the
        // 5s partial of slot 50); e2 stores gain slot 50's OTHER
        // partial plus slots 60 and 70 — 9 raw rows across stores,
        // 8 distinct slots after the (vw, dur) merge
        drainTo(names.size * 9L, Seq("e1/a", "e1/b") ++ tags2,
          qs2)
        drainTo(names.size * 8L, Seq("ctl"), Seq(qC))
        def setOf(dirs: Seq[String]): Set[(String, Long, Double)] =
          Ingest.readArchives(s, dirs)
            .filter(col("name").startsWith("rs"))
            .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
            .toSet
        val union = setOf(Seq(s"$root/e1/a/points", s"$root/e1/b/points",
          s"$root/e2/a/points", s"$root/e2/b/points", s"$root/e2/c/points"))
        val control = setOf(Seq(s"$root/ctl/points"))
        // bit-identical union: the straddling slot's pieces live in
        // TWO stores and recombine through the (vw, dur) merge to the
        // single-daemon value — zero gapped, zero double-counted slots
        assert(union === control,
          "resharded union diverged from the single-daemon control")
        assert(union.size.toLong === names.size * 8L)
        // the straddling slot specifically: [50,60) = 5s of the e1
        // value + 3s of the first e2 value + 2s of the next
        names.zipWithIndex.foreach { case (n, i) =>
          val v = union.find(r => r._1 == n && r._2 == base + 50).get._3
          val expect = (5 * (i * 10 + 5.5) + 3 * (i * 10 + 6.5) +
            2 * (i * 10 + 7.5)) / 10
          assert(v === expect, s"straddling slot of $n")
        }
        // epoch-2 primaries are disjoint at M=3
        tags2.zipWithIndex.foreach { case (t, i) =>
          val mis = Ingest.readArchive(s, s"$root/$t/points")
            .select(col("name")).distinct()
            .filter(pmod(xxhash64(col("name")), lit(3L)).cast("int") =!= i)
            .count()
          assert(mis === 0L, s"epoch-2 shard $i holds a foreign series")
        }
      } finally {
        qs2.foreach(q => Try(q.stop()))
        gws2.foreach(g => Try(g.close()))
        dirs2.foreach(d => Try(d.close()))
      }
    } finally {
      Seq(q1a, q1b, qC).foreach(q => Try(q.stop()))
      Seq(g1a, g1b, gC).foreach(g => Try(g.close()))
      Seq(dir1a, dir1b).foreach(d => Try(d.close()))
    }
  }

  // ---- forwarder fault model (receiver/director.go:55-66 channel
  // semantics: enqueue-and-move-on; a dead/slow peer costs the CHANNEL
  // its buffer, never the director its latency) ----

  test("forwarder: dead peer — sends stay O(µs), circuit drops fast") {
    // a port with nothing listening: connect fails. The OLD design
    // paid up to 2x2000ms connect timeout per line ON the caller; the
    // async forwarder must take 10k sends in well under a second and
    // let the drain thread account every line as dropped.
    val dead = { val ss = new ServerSocket(0); val p = ss.getLocalPort; ss.close(); p }
    val f = new Shard.Forwarder(Seq(dead), connectTimeoutMs = 100,
      cooldownMs = 200)
    try {
      val t0 = System.nanoTime()
      (1 to 10000).foreach(i => f.send(0, s"m$i.x 1 100"))
      val callerMs = (System.nanoTime() - t0) / 1000000
      assert(callerMs < 1000, s"gateway-side send took ${callerMs}ms for 10k lines")
      val deadline = System.currentTimeMillis() + 20000
      while (f.dropped.get < 10000L && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(f.dropped.get === 10000L, "every line must be accounted dropped")
      assert(f.forwarded.get === 0L)
    } finally f.close()
  }

  test("forwarder: slow-not-dead peer — bounded memory, caller unaffected") {
    // peer accepts but never reads: TCP backpressure blocks the DRAIN
    // thread mid-batch; the bounded queue fills and sheds, while the
    // caller's offer latency stays flat (this is the contract the
    // gateway reader threads rely on)
    val srv = new ServerSocket(0)
    srv.setReceiveBufferSize(4096)
    val f = new Shard.Forwarder(Seq(srv.getLocalPort), queueCap = 4096)
    try {
      val line = "slowpeer.metric.with.a.reasonably.long.name 123.456 1700000000"
      val t0 = System.nanoTime()
      (1 to 200000).foreach(_ => f.send(0, line))
      val callerMs = (System.nanoTime() - t0) / 1000000
      assert(callerMs < 5000, s"200k sends took ${callerMs}ms against a stalled peer")
      val deadline = System.currentTimeMillis() + 10000
      while (f.dropped.get === 0L && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(f.dropped.get > 0L, "full queue must shed with a counter")
    } finally { f.close(); Try(srv.close()); () }
  }

  test("forwarder: live peer — batched delivery, ordered, >=10k lines/s") {
    val srv = new ServerSocket(0)
    val got = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      val c = srv.accept()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(c.getInputStream, "UTF-8"))
      Iterator.continually(in.readLine()).takeWhile(_ != null).foreach(got.put)
    })
    t.setDaemon(true); t.start()
    val f = new Shard.Forwarder(Seq(srv.getLocalPort))
    try {
      val n = 50000
      val t0 = System.nanoTime()
      (1 to n).foreach(i => f.send(0, s"fast.m $i ${1700000000L + i}"))
      val lines = new scala.collection.mutable.ArrayBuffer[String](n)
      val deadline = System.currentTimeMillis() + 15000
      while (lines.size < n && System.currentTimeMillis() < deadline) {
        val l = got.poll(100, java.util.concurrent.TimeUnit.MILLISECONDS)
        if (l != null) lines += l
      }
      val secs = (System.nanoTime() - t0) / 1e9
      assert(lines.size === n, s"only ${lines.size}/$n delivered")
      // per-peer ordering survives the queue + single drainer
      assert(lines.toSeq === (1 to n).map(i => s"fast.m $i ${1700000000L + i}"))
      assert(f.dropped.get === 0L)
      assert(f.forwarded.get === n.toLong)
      assert(n / secs > 10000.0, f"forwarded at ${n / secs}%.0f lines/s")
    } finally { f.close(); Try(srv.close()); () }
  }

  test("readClusterArchivesRaw: resized+degraded render — raw merge, " +
      "filtered fallback, down primary never read") {
    val s = spark; import s.implicits._
    val root = Files.createTempDirectory("graft-clraw").toString
    def ownerOf(nm: String) = Shard.owner(Shard.canonicalName(nm), 3)
    val cands = (1 to 60).map(i => s"cr$i.cpu")
    val victim = cands.find(ownerOf(_) == 1).get
    val other0 = cands.find(ownerOf(_) == 0).get
    val bogus2 = cands.find(ownerOf(_) == 2).get
    def put(dir: String, pieces: Seq[Ingest.Piece]): Unit =
      Ingest.mergePiecesIntoArchive(s, pieces.toDF(), dir, stepSec = 10)
    // old epoch's primary: the straddle's first half + a full slot
    put(s"$root/old/points", Seq(
      Ingest.Piece(victim, 50L, 55L, 2.0),
      Ingest.Piece(other0, 50L, 60L, 1.0)))
    put(s"$root/p0/points", Seq(Ingest.Piece(other0, 60L, 70L, 3.0)))
    // shard 1 is DOWN: its primary must never be read — poison it
    put(s"$root/p1/points", Seq(
      Ingest.Piece(victim, 55L, 60L, 4.0),
      Ingest.Piece(victim, 60L, 70L, 99.0)))
    // shard 2's replica store: the fallback slice for owner 1, plus a
    // stale foreign row the ownership filter must strip
    put(s"$root/r2/points", Seq(
      Ingest.Piece(victim, 55L, 60L, 4.0),
      Ingest.Piece(bogus2, 50L, 60L, 7.0)))
    val out = Shard.readClusterArchivesRaw(s,
      extraDirs = Seq(s"$root/old/points"),
      shardPointDirs =
        Seq(s"$root/p0/points", s"$root/p1/points", s"$root/p2/points"),
      replicaPointDirs =
        Seq(s"$root/r0/points", s"$root/r1/points", s"$root/r2/points"),
      copies = 2, down = Set(1))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(out === Set(
      // 5 s @ 2.0 (old epoch) + 5 s @ 4.0 (replica fallback) recombine
      (victim, 50L, 3.0),
      (other0, 50L, 1.0),
      (other0, 60L, 3.0)))
  }

  test("replicatedBy is the exact inverse of the successor placement") {
    // the replica-seed slice at a resize depends on this inverse: a
    // replica receiver seeds with the shards whose series it HOLDS
    for (n <- Seq(2, 3, 5); copies <- 1 to math.min(3, n)) {
      def replicasOf(o: Int): Seq[Int] = (1 until copies).map(k => (o + k) % n)
      for (i <- 0 until n; o <- 0 until n) {
        assert(Shard.replicatedBy(i, n, copies).contains(o) ===
          replicasOf(o).contains(i),
          s"n=$n copies=$copies i=$i o=$o")
      }
    }
  }
}
