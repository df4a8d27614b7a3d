package graft.sink

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.connector.read.streaming.ReadLimit

import graft.SparkTestBase

/** Resharding FOLLOW: the source drains closed parents to their close
  * (end-of-shard) and then admits their children at TRIM_HORIZON —
  * the KCL consumer contract — instead of failing the query. The
  * reference never faces this (its consumer is a static-layout
  * integration test, /root/reference/integration_test.go:112-143);
  * production streams reshard whenever throughput grows, so this is the
  * difference between a blip and a paged operator.
  *
  * Ordering invariant under test: real Kinesis guarantees a parent
  * shard's records were all written before any child record for the
  * same partition key; the source preserves it by never planning a
  * child slice until every parent is retired (in the checkpointed
  * `done` set).
  */
class KinesisReshardingSpec extends SparkTestBase {

  private def put(fake: FakeKinesis, stream: String,
      keyed: Seq[(String, String)]): Unit =
    keyed.grouped(500).foreach { g =>
      fake.putRecords(stream,
        g.map { case (pk, m) => KinesisRecord(pk, m.getBytes("UTF-8")) })
    }

  private def opts(clientName: String, stream: String): KinesisSinkOptions =
    KinesisSinkOptions.fromMap(Map(
      "aws_region_name" -> "us-east-1", "stream" -> stream,
      "client" -> s"fake:$clientName"))

  // ----- FakeKinesis split/merge mechanics ----------------------------

  test("splitShard closes the parent (its log and latestSequence freeze) " +
      "and routes new writes to the children") {
    val fake = new FakeKinesis()
    fake.numShards.set(1)
    put(fake, "sp", (0 until 10).map(i => (s"k$i", s"pre$i")))
    val parent = "shardId-000000000000"
    assert(fake.latestSequence("sp", parent) == 10L)

    val (c1, c2) = fake.splitShard("sp", parent)
    assert(Set(c1, c2) == Set("shardId-000000000001", "shardId-000000000002"))
    put(fake, "sp", (0 until 20).map(i => (s"k$i", s"post$i")))

    // parent frozen at its close; all post-split records in the children
    assert(fake.latestSequence("sp", parent) == 10L)
    assert(fake.latestSequence("sp", c1) + fake.latestSequence("sp", c2) == 20L)

    val desc = fake.describeShards("sp").map(d => d.shardId -> d).toMap
    assert(!desc(parent).open && desc(parent).parentIds.isEmpty)
    assert(desc(c1).open && desc(c1).parentIds == Seq(parent))
    assert(desc(c2).open && desc(c2).parentIds == Seq(parent))
    // control plane lists only open shards once genuinely resharded
    assert(fake.listShards("sp").toSet == Set(c1, c2))
    // splitting a closed shard is rejected, like real Kinesis
    intercept[IllegalArgumentException] { fake.splitShard("sp", parent) }
  }

  test("mergeShards requires adjacency, closes both parents, and the " +
      "child owns the union range") {
    val fake = new FakeKinesis()
    fake.numShards.set(4)
    put(fake, "mg", (0 until 40).map(i => (s"k$i", s"pre$i")))
    // shards 1 and 3 are not adjacent
    intercept[IllegalArgumentException] {
      fake.mergeShards("mg", "shardId-000000000001", "shardId-000000000003")
    }
    val child = fake.mergeShards("mg",
      "shardId-000000000001", "shardId-000000000002")
    val pre0 = fake.latestSequence("mg", "shardId-000000000000")
    val pre1 = fake.latestSequence("mg", "shardId-000000000001")
    val pre2 = fake.latestSequence("mg", "shardId-000000000002")
    val pre3 = fake.latestSequence("mg", "shardId-000000000003")
    put(fake, "mg", (0 until 40).map(i => (s"k$i", s"post$i")))
    // parents frozen; child absorbed exactly the union of their key space
    assert(fake.latestSequence("mg", "shardId-000000000001") == pre1)
    assert(fake.latestSequence("mg", "shardId-000000000002") == pre2)
    val post0 = fake.latestSequence("mg", "shardId-000000000000") - pre0
    val post3 = fake.latestSequence("mg", "shardId-000000000003") - pre3
    assert(fake.latestSequence("mg", child) == 40L - post0 - post3)
    assert(fake.latestSequence("mg", child) == pre1 + pre2,
      "same keys, same ranges: the child's share equals its parents' share")
    val desc = fake.describeShards("mg").map(d => d.shardId -> d).toMap
    assert(desc(child).parentIds.toSet ==
      Set("shardId-000000000001", "shardId-000000000002"))
  }

  // ----- offset-walk: the follow protocol, trigger by trigger ---------

  private def walk(ms: KinesisGraftMicroBatchStream, cur: KinesisSourceOffset,
      cap: Long): KinesisSourceOffset =
    ms.latestOffset(cur,
      if (cap > 0) ReadLimit.maxRows(cap) else ReadLimit.allAvailable())
      .asInstanceOf[KinesisSourceOffset]

  test("children are not admitted until the closed parent drains to its " +
      "final sequence; the drain is admission-control bounded") {
    val fake = FakeKinesis.named("rs-walk")
    fake.clear()
    fake.numShards.set(1)
    put(fake, "w", (0 until 20).map(i => (s"k$i", s"pre$i")))
    val parent = "shardId-000000000000"
    val ms = new KinesisGraftMicroBatchStream(
      opts("rs-walk", "w"), "TRIM_HORIZON", 10000, 6)

    var cur = ms.initialOffset().asInstanceOf[KinesisSourceOffset]
    assert(cur.shardOffsets == Map(parent -> 0L) && cur.done.isEmpty)

    cur = walk(ms, cur, 6) // 6 of 20
    assert(cur.shardOffsets == Map(parent -> 6L))

    val (c1, c2) = fake.splitShard("w", parent)
    put(fake, "w", (0 until 5).map(i => (s"k$i", s"post$i")))

    // parent still draining: children must wait, cap still respected
    cur = walk(ms, cur, 6)
    assert(cur.shardOffsets == Map(parent -> 12L) && cur.done.isEmpty,
      s"children admitted before parent drained: $cur")
    cur = walk(ms, cur, 6)
    assert(cur.shardOffsets == Map(parent -> 18L))
    cur = walk(ms, cur, 6)
    assert(cur.shardOffsets == Map(parent -> 20L),
      "parent must drain exactly to its close")

    // parent at its close: next reconcile retires it and admits children
    cur = walk(ms, cur, 6)
    assert(cur.done == Set(parent), s"parent must retire: $cur")
    assert(cur.shardOffsets.keySet == Set(c1, c2))
    assert(cur.shardOffsets.values.sum == 5L,
      "children start at TRIM_HORIZON and drain their own logs")

    // stable thereafter
    val next = walk(ms, cur, 6)
    assert(next == cur, s"offsets must quiesce: $next vs $cur")
  }

  test("split-of-a-split follows the lineage chain level by level") {
    val fake = FakeKinesis.named("rs-chain")
    fake.clear()
    fake.numShards.set(1)
    put(fake, "c", (0 until 4).map(i => (s"k$i", s"pre$i")))
    val s0 = "shardId-000000000000"
    val (c1, c2) = fake.splitShard("c", s0)
    put(fake, "c", (0 until 4).map(i => (s"k$i", s"mid$i")))
    // split one child again before the query ever looks
    val (g1, g2) = fake.splitShard("c", c1)
    put(fake, "c", (0 until 4).map(i => (s"k$i", s"post$i")))

    val ms = new KinesisGraftMicroBatchStream(
      opts("rs-chain", "c"), "TRIM_HORIZON", 10000, 0)
    var cur = ms.initialOffset().asInstanceOf[KinesisSourceOffset]
    // only the root is admitted at start
    assert(cur.shardOffsets.keySet == Set(s0))

    cur = walk(ms, cur, 0) // drains s0 (4 records)
    assert(cur.shardOffsets == Map(s0 -> 4L))
    cur = walk(ms, cur, 0) // retire s0, admit c1+c2, drain them
    assert(cur.done == Set(s0))
    assert(cur.shardOffsets.keySet == Set(c1, c2),
      s"grandchildren must wait for $c1 to drain: $cur")
    cur = walk(ms, cur, 0) // retire c1 (closed), admit g1+g2, drain
    assert(cur.done == Set(s0, c1))
    assert(cur.shardOffsets.keySet == Set(c2, g1, g2))
    // every record accounted for exactly once across the walk:
    // 4 (s0) + mid/post split across c2,g1,g2 and c1's own slice
    val total = cur.shardOffsets.values.sum + 4L /* s0 */ +
      fake.latestSequence("c", c1)
    assert(total == 12L, s"12 records written, $total planned")
    assert(walk(ms, cur, 0) == cur)
  }

  test("restart mid-reshard resumes the drain exactly (offset JSON " +
      "round-trips the layout version)") {
    val fake = FakeKinesis.named("rs-resume")
    fake.clear()
    fake.numShards.set(1)
    put(fake, "r", (0 until 12).map(i => (s"k$i", s"pre$i")))
    val parent = "shardId-000000000000"
    val o = opts("rs-resume", "r")
    val ms1 = new KinesisGraftMicroBatchStream(o, "TRIM_HORIZON", 10000, 5)
    var cur = ms1.initialOffset().asInstanceOf[KinesisSourceOffset]
    cur = walk(ms1, cur, 5)
    val (c1, c2) = fake.splitShard("r", parent)
    put(fake, "r", (0 until 3).map(i => (s"k$i", s"post$i")))
    cur = walk(ms1, cur, 5) // parent at 10, still draining

    // "restart": a fresh stream object continues from the serialized form
    val ms2 = new KinesisGraftMicroBatchStream(o, "TRIM_HORIZON", 10000, 5)
    var resumed = ms2.deserializeOffset(cur.json())
      .asInstanceOf[KinesisSourceOffset]
    assert(resumed == cur, "offset must survive JSON round-trip")
    resumed = walk(ms2, resumed, 5)
    assert(resumed.shardOffsets == Map(parent -> 12L))
    resumed = walk(ms2, resumed, 5)
    assert(resumed.done == Set(parent) &&
      resumed.shardOffsets.keySet == Set(c1, c2) &&
      resumed.shardOffsets.values.sum == 3L)
  }

  test("v1 (flat map) offsets from a pre-resharding checkpoint still " +
      "deserialize; v2 json is canonical in both fields") {
    val v1 = KinesisSourceOffset.fromJson("""{"shardId-000000000000":3}""")
    assert(v1 == KinesisSourceOffset(Map("shardId-000000000000" -> 3L)))
    val a = KinesisSourceOffset(
      scala.collection.immutable.ListMap("b" -> 1L, "a" -> 2L),
      Set("d", "c"))
    val b = KinesisSourceOffset(
      scala.collection.immutable.ListMap("a" -> 2L, "b" -> 1L),
      Set("c", "d"))
    assert(a.json() == b.json())
    assert(KinesisSourceOffset.fromJson(a.json()) == b)
  }

  test("offset-walk fuzz: random put/split/merge/cap interleavings " +
      "deliver every record exactly once in per-key order (seeded, " +
      "60 scenarios, no Spark jobs)") {
    // Property form of the follow protocol, at the offset level: drive
    // latestOffset/planInputPartitions-equivalent walks directly
    // against FakeKinesis under adversarial schedules — resharding can
    // land between ANY two triggers, with or without admission caps,
    // including mid-drain splits of shards that are themselves
    // children. Invariants: nothing lost, nothing twice, and for every
    // partition key the delivered order equals the put order.
    val rnd = new scala.util.Random(0xF00D)
    for (scenario <- 0 until 60) {
      val clientName = s"rs-fuzz-$scenario"
      val fake = FakeKinesis.named(clientName)
      fake.clear()
      fake.numShards.set(1 + rnd.nextInt(3))
      val stream = "fz"
      val keys = (0 until 4 + rnd.nextInt(5)).map(i => s"k$i")
      val perKey = scala.collection.mutable.Map.empty[String, Int]
        .withDefaultValue(0)
      val sent = mutable.ArrayBuffer.empty[String]
      def putSome(): Unit = {
        val batch = (0 until 1 + rnd.nextInt(12)).map { _ =>
          val k = keys(rnd.nextInt(keys.size))
          val m = s"$k#${perKey(k)}"; perKey(k) += 1
          (k, m)
        }
        put(fake, stream, batch)
        sent ++= batch.map(_._2)
      }
      def reshard(): Unit = {
        val open = fake.describeShards(stream).filter(_.open).map(_.shardId)
        if (open.size > 1 && rnd.nextBoolean()) {
          open.combinations(2).find { case Seq(x, y) =>
            try { fake.mergeShards(stream, x, y); true }
            catch { case _: IllegalArgumentException => false }
          }
          ()
        } else fake.splitShard(stream, open(rnd.nextInt(open.size)))
      }
      val cap = if (rnd.nextBoolean()) 0L else (1 + rnd.nextInt(9)).toLong
      val ms = new KinesisGraftMicroBatchStream(
        opts(clientName, stream), "TRIM_HORIZON", 10000, cap)
      putSome()
      var cur = ms.initialOffset().asInstanceOf[KinesisSourceOffset]
      val received = mutable.ArrayBuffer.empty[String]
      def deliver(from: KinesisSourceOffset, to: KinesisSourceOffset): Unit =
        to.shardOffsets.toSeq.sortBy(_._1).foreach { case (sh, end) =>
          val start = from.shardOffsets.getOrElse(sh, 0L)
          if (end > start) {
            val it = fake.getShardIterator(stream, sh,
              "AT_SEQUENCE_NUMBER", start)
            received ++= fake.getRecords(it, 100000).records
              .takeWhile(_.sequenceNumber < end)
              .map(r => new String(r.record.data, "UTF-8"))
          }
        }
      // random schedule of puts/reshards with walks in between, then
      // walk to quiescence
      (0 until 6 + rnd.nextInt(8)).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 => putSome()
          case 1 => reshard()
          case _ => ()
        }
        val next = walk(ms, cur, cap)
        deliver(cur, next)
        cur = next
      }
      var next = walk(ms, cur, cap)
      while (next != cur) {
        deliver(cur, next); cur = next; next = walk(ms, cur, cap)
      }
      assert(received.sorted == sent.sorted,
        s"scenario $scenario: sent ${sent.size}, got ${received.size} " +
          s"(${received.size - received.distinct.size} dups)")
      keys.foreach { k =>
        val got = received.filter(_.startsWith(s"$k#"))
        val want = sent.filter(_.startsWith(s"$k#"))
        assert(got == want,
          s"scenario $scenario: per-key order broken for $k")
      }
      FakeKinesis.drop(clientName)
    }
  }

  // ----- AT_TIMESTAMP start ------------------------------------------

  test("at_timestamp replays from the instant: per-shard arrival seek, " +
      "records before the cut skipped, later records delivered") {
    val fake = FakeKinesis.named("rs-ts")
    fake.clear()
    fake.numShards.set(2)
    put(fake, "tsq", (0 until 20).map(i => (s"k$i", s"old$i")))
    val cut = fake.clock.get() + 1 // strictly after everything so far
    put(fake, "tsq", (0 until 15).map(i => (s"k$i", s"new$i")))

    val received = scala.collection.mutable.ArrayBuffer.empty[String]
    val ckpt = Files.createTempDirectory("ckpt-rs-ts").toString
    val q = spark.readStream.format("kinesis-graft")
      .option("aws_region_name", "us-east-1")
      .option("stream", "tsq")
      .option("client", "fake:rs-ts")
      .option("starting_position", "at_timestamp")
      .option("starting_timestamp_ms", cut.toString)
      .load()
      .select(col("data").cast("string").as("payload"))
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        received.synchronized { received ++= b.collect().map(_.getString(0)) }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable(); q.stop(); q.awaitTermination(30000)
    assert(received.sorted == (0 until 15).map(i => s"new$i").sorted,
      s"must deliver exactly the records after the instant: $received")
  }

  test("at_timestamp validation: missing/stray timestamp options fail " +
      "fast") {
    def read(opts: Map[String, String]) = {
      val r = spark.read.format("kinesis-graft")
        .option("aws_region_name", "us-east-1")
        .option("stream", "x").option("client", "fake:rs-tsv")
      opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load().collect()
    }
    val e1 = intercept[Exception] {
      read(Map("starting_position" -> "at_timestamp"))
    }
    def msgs(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs(e1).contains("starting_timestamp_ms"), msgs(e1))
    val e2 = intercept[Exception] {
      read(Map("starting_timestamp_ms" -> "5"))
    }
    assert(msgs(e2).contains("only valid with"), msgs(e2))
  }

  test("at_timestamp composes with resharding follow: a pre-split " +
      "instant drains the parent's post-instant tail, then the " +
      "children's — nothing earlier, nothing twice") {
    val fake = FakeKinesis.named("rs-ts2")
    fake.clear()
    fake.numShards.set(1)
    val parent = "shardId-000000000000"
    put(fake, "ts2", (0 until 10).map(i => (s"k$i", s"pre$i")))
    val cut = fake.clock.get() + 1
    put(fake, "ts2", (0 until 6).map(i => (s"k$i", s"mid$i")))
    val (c1, c2) = fake.splitShard("ts2", parent)
    put(fake, "ts2", (0 until 6).map(i => (s"k$i", s"post$i")))

    val ms = new KinesisGraftMicroBatchStream(
      opts("rs-ts2", "ts2"), "AT_TIMESTAMP", 10000, 0, cut)
    var cur = ms.initialOffset().asInstanceOf[KinesisSourceOffset]
    // root admitted at the instant's position, not 0
    assert(cur.shardOffsets == Map(parent -> 10L), s"seek must skip pre: $cur")
    cur = walk(ms, cur, 0) // drain parent's mid tail (6)
    assert(cur.shardOffsets == Map(parent -> 16L))
    cur = walk(ms, cur, 0) // retire parent; children at THEIR seek = 0
    assert(cur.done == Set(parent) &&
      cur.shardOffsets.keySet == Set(c1, c2) &&
      cur.shardOffsets.values.sum == 6L,
      s"children carry exactly the post-split records: $cur")
    assert(walk(ms, cur, 0) == cur)
  }

  test("at_timestamp with a PRE-instant split: children hold pre-instant " +
      "records, are admitted at their timestamp seek, and are PLANNED " +
      "from it — no pre-instant delivery, admission budget holds") {
    val fake = FakeKinesis.named("rs-ts3")
    fake.clear()
    fake.numShards.set(1)
    val parent = "shardId-000000000000"
    put(fake, "ts3", (0 until 10).map(i => (s"k$i", s"pre$i")))
    val (c1, c2) = fake.splitShard("ts3", parent)
    // children receive records BEFORE the instant — their timestamp seek
    // is therefore > 0, the case a 0-fallback planner mis-plans
    put(fake, "ts3", (0 until 8).map(i => (s"k$i", s"mid$i")))
    val cut = fake.clock.get() + 1
    put(fake, "ts3", (0 until 8).map(i => (s"k$i", s"post$i")))

    val cap = 5L
    val ms = new KinesisGraftMicroBatchStream(
      opts("rs-ts3", "ts3"), "AT_TIMESTAMP", 10000, cap, cut)
    val cur = ms.initialOffset().asInstanceOf[KinesisSourceOffset]
    // the closed parent is still listed, so it (not the children) is the
    // lineage root; its whole log predates the instant → starts at end
    assert(cur.shardOffsets == Map(parent -> 10L), s"root seek: $cur")
    val next = walk(ms, cur, cap) // parent retires; children admitted
    assert(next.done == Set(parent) &&
      next.shardOffsets.keySet == Set(c1, c2), s"follow: $next")

    // the (cur, next) batch: each child slice must START at its
    // per-shard timestamp seek, not 0 — and the batch must respect cap
    val parts = ms.planInputPartitions(cur, next)
      .map(_.asInstanceOf[KinesisInputPartition])
    parts.foreach { p =>
      val seek = fake.sequenceAtTimestamp("ts3", p.shardId, cut)
      assert(p.startSeq == seek,
        s"child ${p.shardId} planned from ${p.startSeq}, seek is $seek")
    }
    assert(parts.map(p => p.endSeq - p.startSeq).sum <= cap,
      s"admission budget exceeded: ${parts.toSeq}")

    // end-to-end: the engine delivers exactly the post-instant records
    val received = scala.collection.mutable.ArrayBuffer.empty[String]
    val ckpt = Files.createTempDirectory("ckpt-rs-ts3").toString
    val q = spark.readStream.format("kinesis-graft")
      .option("aws_region_name", "us-east-1")
      .option("stream", "ts3")
      .option("client", "fake:rs-ts3")
      .option("starting_position", "at_timestamp")
      .option("starting_timestamp_ms", cut.toString)
      .option("max_records_per_trigger", cap.toString)
      .load()
      .select(col("data").cast("string").as("payload"))
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        received.synchronized { received ++= b.collect().map(_.getString(0)) }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable(); q.stop(); q.awaitTermination(30000)
    assert(received.sorted == (0 until 8).map(i => s"post$i").sorted,
      s"must deliver exactly the post-instant records: $received")
    FakeKinesis.drop("rs-ts3")
  }

  test("at_timestamp with a PRE-instant MERGE: the merged child holds " +
      "pre-instant records and is planned from its timestamp seek — " +
      "the same admit-position rule as the split case") {
    val fake = FakeKinesis.named("rs-ts4")
    fake.clear()
    fake.numShards.set(2)
    val p1 = "shardId-000000000000"
    val p2 = "shardId-000000000001"
    put(fake, "ts4", (0 until 12).map(i => (s"k$i", s"pre$i")))
    val child = fake.mergeShards("ts4", p1, p2)
    put(fake, "ts4", (0 until 6).map(i => (s"k$i", s"mid$i")))
    val cut = fake.clock.get() + 1
    put(fake, "ts4", (0 until 6).map(i => (s"k$i", s"post$i")))

    val ms = new KinesisGraftMicroBatchStream(
      opts("rs-ts4", "ts4"), "AT_TIMESTAMP", 10000, 0, cut)
    val cur = ms.initialOffset().asInstanceOf[KinesisSourceOffset]
    // both closed parents are roots; their whole logs predate the
    // instant, so each starts at its end and retires on first reconcile
    assert(cur.shardOffsets.keySet == Set(p1, p2), s"roots: $cur")
    val next = walk(ms, cur, 0)
    assert(next.done == Set(p1, p2) &&
      next.shardOffsets.keySet == Set(child), s"merge follow: $next")
    val parts = ms.planInputPartitions(cur, next)
      .map(_.asInstanceOf[KinesisInputPartition])
    val seek = fake.sequenceAtTimestamp("ts4", child, cut)
    assert(seek > 0, "fixture must place pre-instant records in the child")
    assert(parts.forall(_.startSeq == seek),
      s"merged child planned from ${parts.map(_.startSeq).toSeq}, seek $seek")
    assert(parts.map(p => p.endSeq - p.startSeq).sum == 6,
      s"exactly the post-instant records: ${parts.toSeq}")
    FakeKinesis.drop("rs-ts4")
  }

  // ----- full engine loop through a reshard ---------------------------

  test("split + merge under a running query: exactly-once delivery and " +
      "per-key order across both transitions, surviving a checkpoint " +
      "restart") {
    val fake = FakeKinesis.named("rs-e2e")
    fake.clear()
    fake.numShards.set(2)
    val stream = "qs"
    val keys = (0 until 6).map(i => s"user-$i")
    var epoch = 0
    val sent = mutable.ArrayBuffer.empty[(String, String)]
    def send(): Unit = {
      val batch = keys.flatMap(k =>
        (0 until 5).map(i => (k, s"$k:${epoch * 5 + i}")))
      put(fake, stream, batch)
      sent ++= batch
      epoch += 1
    }

    val ckpt = Files.createTempDirectory("ckpt-rs-e2e").toString
    // (payload, batchId) so cross-batch order is checkable
    val received = mutable.ArrayBuffer.empty[(String, Long)]
    def run(): Unit = {
      val q = spark.readStream.format("kinesis-graft")
        .option("aws_region_name", "us-east-1")
        .option("stream", stream)
        .option("client", "fake:rs-e2e")
        .option("max_records_per_trigger", "17")
        .load()
        .select(col("data").cast("string").as("payload"))
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val rows = batch.collect().map(_.getString(0))
          received.synchronized { received ++= rows.map(_ -> id) }
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop(); q.awaitTermination(30000)
    }

    send()
    run()
    assert(received.size == 30, "pre-reshard delivery must complete")

    // SPLIT shard 0 under the (logically running) query
    val (c1, c2) = fake.splitShard(stream, "shardId-000000000000")
    send()
    run()
    assert(received.size == 60,
      s"split must be followed, not fatal: ${received.size} delivered")

    // MERGE the two children back under the query
    fake.mergeShards(stream, c1, c2)
    send()
    run()
    assert(received.size == 90,
      s"merge must be followed too: ${received.size} delivered")

    // restart from the same checkpoint after more traffic
    send()
    run()

    // exactly once
    assert(received.map(_._1).sorted == sent.map(_._2).sorted,
      s"sent ${sent.size}, received ${received.size} " +
        s"(${received.size - received.map(_._1).distinct.size} dups)")
    // per-key order: for every key, payloads arrive in write order
    // (Kinesis's per-key guarantee, preserved because child slices are
    // never planned before their parents retire)
    keys.foreach { k =>
      val got = received.filter(_._1.startsWith(s"$k:")).map(_._1)
      val want = sent.filter(_._1 == k).map(_._2)
      assert(got == want, s"per-key order broken for $k: $got")
    }

    // batch read over the resharded stream covers closed parents too
    val batchAll = spark.read.format("kinesis-graft")
      .option("aws_region_name", "us-east-1")
      .option("stream", stream)
      .option("client", "fake:rs-e2e")
      .load()
      .select(col("data").cast("string")).collect().map(_.getString(0))
    assert(batchAll.sorted.toSeq == sent.map(_._2).sorted,
      "batch scan must include closed parents' history")
  }

  test("randomized reshard soak: splits and merges interleaved with " +
      "traffic and restarts deliver exactly once in key order (seeded)") {
    val rnd = new scala.util.Random(0xD1CE)
    val fake = FakeKinesis.named("rs-soak")
    fake.clear()
    fake.numShards.set(2)
    val stream = "soakr"
    val keys = (0 until 8).map(i => s"k$i")
    val perKey = mutable.Map.empty[String, Int].withDefaultValue(0)
    val sent = mutable.ArrayBuffer.empty[String]
    val ckpt = Files.createTempDirectory("ckpt-rs-soak").toString
    val received = mutable.ArrayBuffer.empty[String]

    def send(n: Int): Unit = {
      val batch = (0 until n).map { _ =>
        val k = keys(rnd.nextInt(keys.size))
        val m = s"$k#${perKey(k)}"
        perKey(k) += 1
        (k, m)
      }
      put(fake, stream, batch)
      sent ++= batch.map(_._2)
    }

    def reshard(): Unit = {
      val open = fake.describeShards(stream).filter(_.open).map(_.shardId)
      if (open.size > 1 && rnd.nextBoolean()) {
        // merge the first adjacent open pair (mergeShards validates
        // adjacency; open shards tile the hash space, so one exists)
        val pairs = open.combinations(2).toSeq
        val ok = pairs.find { case Seq(a, b) =>
          try { fake.mergeShards(stream, a, b); true }
          catch { case _: IllegalArgumentException => false }
        }
        if (ok.isEmpty) fake.splitShard(stream, open(rnd.nextInt(open.size)))
      } else {
        fake.splitShard(stream, open(rnd.nextInt(open.size)))
      }
    }

    (0 until 5).foreach { round =>
      send(10 + rnd.nextInt(30))
      if (round > 0) reshard()
      send(5 + rnd.nextInt(10))
      val q = spark.readStream.format("kinesis-graft")
        .option("aws_region_name", "us-east-1")
        .option("stream", stream)
        .option("client", "fake:rs-soak")
        .option("max_records_per_trigger",
          if (round % 2 == 0) "13" else "0")
        .load()
        .select(col("data").cast("string").as("payload"))
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          received.synchronized { received ++= b.collect().map(_.getString(0)) }
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop(); q.awaitTermination(30000)
    }

    assert(received.sorted == sent.sorted,
      s"soak: sent ${sent.size}, got ${received.size} " +
        s"(${received.size - received.distinct.size} dups)")
    keys.foreach { k =>
      val got = received.filter(_.startsWith(s"$k#"))
      val want = sent.filter(_.startsWith(s"$k#"))
      assert(got == want, s"per-key order broken for $k under resharding")
    }
  }
}
