package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BlockRangeRpc, BurnEvents}

/** Injected fake JSON-RPC node (r10 VERDICT task 10): serves the
  * salt-7 forked chain — so its rows are provably DIFFERENT from the
  * built-in synthetic chain, proving the injected provider is the one
  * actually read — and fails the first `failFirst` getLogs calls to
  * exercise the transient-fault retry. Static state is JVM-wide,
  * which is exactly right under local mode where executors share the
  * JVM. */
class FakeFlakyRpc extends BlockRangeRpc {
  override def getLogs(lo: Long, hi: Long): Iterator[InternalRow] = {
    FakeFlakyRpc.calls.incrementAndGet()
    if (FakeFlakyRpc.failFirst.getAndDecrement() > 0)
      throw new RuntimeException("transient node fault (injected)")
    FakeFlakyRpc.ranges.add((lo, hi))
    (lo to hi).iterator.flatMap(b => BurnEvents.eventsInBlock(b, 7L))
  }
}

object FakeFlakyRpc {
  val calls = new AtomicInteger(0)
  val failFirst = new AtomicInteger(0)
  val ranges = new ConcurrentLinkedQueue[(Long, Long)]()
  def reset(fails: Int): Unit = {
    calls.set(0); failFirst.set(fails); ranges.clear()
  }
  def rangesSeen: Seq[(Long, Long)] = {
    val b = Seq.newBuilder[(Long, Long)]
    ranges.forEach(r => b += r)
    b.result()
  }
}

/** BurnEventSource's production JSON-RPC seam, driven end to end
  * WITHOUT network: an injected BlockRangeRpc proves the offsets /
  * admission-control / restart-resume machinery is node-agnostic and
  * that transient getLogs faults are retried inside the reader. */
class R11RpcSeamSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_rpc_$tag").toString

  private def expectedRows(lo: Long, hi: Long): Long =
    (lo to hi).map(b => BurnEvents.eventsInBlock(b, 7L).size.toLong).sum

  test("batch backfill reads through the injected rpc, with retries") {
    FakeFlakyRpc.reset(fails = 2)
    val df = spark.read.format("graft.sources.BurnEventSource")
      .option("startBlock", "0").option("endBlock", "49")
      .option("rpcClass", "graft.FakeFlakyRpc")
      .load()
    val rows = df.collect()
    assert(rows.length.toLong === expectedRows(0, 49))
    // provenance: the salt-7 chain's tx hashes are disjoint from the
    // canonical chain — the injected provider is what was read
    val canonical = (0L to 49L).flatMap(b => BurnEvents.eventsInBlock(b))
      .map(_.getUTF8String(0).toString).toSet
    val got = rows.map(_.getAs[String]("transactionHash")).toSet
    assert(got.size.toLong === expectedRows(0, 49))
    assert(got.intersect(canonical).isEmpty)
    // the 2 injected faults were absorbed by in-reader retries (calls
    // = successful range fetches + 2 retried failures), not task death
    assert(FakeFlakyRpc.calls.get() === FakeFlakyRpc.rangesSeen.size + 2)
  }

  test("streaming restart resumes from the committed offset through the injected rpc") {
    val out = tmp("out")
    val ckpt = tmp("ckpt")
    def run(end: Long): Unit =
      spark.readStream.format("graft.sources.BurnEventSource")
        .option("startBlock", "0").option("endBlock", end.toString)
        .option("blocksPerTrigger", "10")
        .option("rpcClass", "graft.FakeFlakyRpc")
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    FakeFlakyRpc.reset(fails = 0)
    run(end = 19) // first run drains blocks 0..19
    assert(spark.read.parquet(out).count() === expectedRows(0, 19))
    // restart with a longer chain AND a transient fault on the first
    // fetch: the resume must start AFTER the committed offset and the
    // fault must be retried, not replayed as duplicate data
    FakeFlakyRpc.reset(fails = 1)
    run(end = 29)
    val df = spark.read.parquet(out)
    assert(df.count() === expectedRows(0, 29))
    assert(df.select("transactionHash", "logIndex").distinct().count()
      === df.count(), "restart produced duplicates")
    assert(df.select("blockNumber").distinct().count() === 30)
    val resumed = FakeFlakyRpc.rangesSeen
    assert(resumed.nonEmpty && resumed.forall(_._1 >= 20L),
      s"resume re-fetched committed blocks: $resumed")
  }

  test("reorg within the confirmation depth: sink equals the straight-chain run") {
    // r11 VERDICT task 7 — A11 parity at the CONNECTOR level: the
    // injected node reorgs every block above height 14 between the
    // two runs (salt 7 → salt 11 content). With confirmations=5 the
    // first run (head 19) commits only blocks 0..14 — at or below the
    // reorg point — so the rewrite never touches committed data; the
    // resumed run (head 29) ingests 15..24 from the REORGED chain and
    // the final sink must equal one straight run over the final chain.
    val out = tmp("reorg_out")
    val ckpt = tmp("reorg_ckpt")
    def run(end: Long): Unit =
      spark.readStream.format("graft.sources.BurnEventSource")
        .option("startBlock", "0").option("endBlock", end.toString)
        .option("blocksPerTrigger", "10")
        .option("confirmations", "5")
        .option("rpcClass", "graft.ReorgRpc")
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    ReorgRpc.phase.set(1)
    run(end = 19) // commits 0..14 (head 19 − confirmations 5)
    val afterFirst = spark.read.parquet(out)
    assert(afterFirst.agg(max("blockNumber")).head.getLong(0) === 14L,
      "confirmation depth leaked unconfirmed blocks into the sink")
    ReorgRpc.phase.set(2) // the node reorgs blocks > 14 and grows to 29
    run(end = 29) // resumes at 15, commits 15..24 from the new chain
    val df = spark.read.parquet(out)
    val got = df.select("transactionHash", "logIndex")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    // straight-chain reference: one batch read of the FINAL chain
    // through the same rpc, blocks 0..24
    val straight = spark.read.format("graft.sources.BurnEventSource")
      .option("startBlock", "0").option("endBlock", "24")
      .option("rpcClass", "graft.ReorgRpc")
      .load()
      .select("transactionHash", "logIndex")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got === straight,
      s"sink diverged from the straight-chain run: " +
        s"extra=${(got -- straight).take(3)} missing=${(straight -- got).take(3)}")
    assert(df.count().toLong === got.size.toLong, "duplicates in the sink")
  }

  test("reorg x time travel: the pre-reorg snapshot stays readable via readAt while the live generation equals the straight-chain run") {
    // r12 VERDICT task 8 — the two r12 features composed: each ingest
    // run PUBLISHES its confirmed view as a staged-sink generation
    // (retain=2), so after the reorg the superseded chain view is the
    // retained prior snapshot — time travel IS the reorg audit trail.
    import graft.sinks.StagedCommitSink
    import org.apache.spark.sql.types._
    val out = tmp("ttreorg_out")
    val ckpt = tmp("ttreorg_ckpt")
    val table = tmp("ttreorg_table")
    val pubSchema = StructType(Seq(
      StructField("transactionHash", StringType),
      StructField("logIndex", IntegerType),
      StructField("blockNumber", LongType),
      StructField("valueWei", StringType)))
    def ingestAndPublish(end: Long): Unit = {
      spark.readStream.format("graft.sources.BurnEventSource")
        .option("startBlock", "0").option("endBlock", end.toString)
        .option("blocksPerTrigger", "10")
        .option("confirmations", "5")
        .option("rpcClass", "graft.ReorgRpc")
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      // snapshot publish: the accumulated confirmed view becomes the
      // table's next generation (sink types: cast decimal → string)
      spark.read.parquet(out)
        .select(col("transactionHash"), col("logIndex"),
          col("blockNumber"), col("valueWei").cast("string").as("valueWei"))
        .write.format("graft.sinks.StagedCommitSink")
        .option("path", table).option("retain", "2")
        .mode("overwrite").save()
    }
    def keys(df: org.apache.spark.sql.DataFrame): Set[(String, Int)] =
      df.select("transactionHash", "logIndex")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    ReorgRpc.phase.set(1)
    ingestAndPublish(end = 19) // generation 1 = confirmed blocks 0..14
    val preReorg = keys(StagedCommitSink.read(spark, table, pubSchema))
    ReorgRpc.phase.set(2)      // blocks > 14 rewritten, chain grows
    ingestAndPublish(end = 29) // generation 2 = confirmed blocks 0..24
    // live generation == one straight batch read of the final chain
    val live = keys(StagedCommitSink.read(spark, table, pubSchema))
    val straight = keys(spark.read.format("graft.sources.BurnEventSource")
      .option("startBlock", "0").option("endBlock", "24")
      .option("rpcClass", "graft.ReorgRpc").load())
    assert(live === straight,
      s"live generation diverged: extra=${(live -- straight).take(3)} " +
        s"missing=${(straight -- live).take(3)}")
    // the pre-reorg snapshot is byte-intact one step back
    val travelled = keys(StagedCommitSink.readAt(spark, table, pubSchema, 1))
    assert(travelled === preReorg, "time-travelled snapshot drifted")
    // and the audit trail is non-trivial: the live run added the
    // post-reorg blocks 15..24 that the snapshot lacks (the reorg
    // point 14 is above the phase-1 confirmation horizon, so the
    // snapshot itself is a prefix of the live view — blocks 0..14
    // were never rewritten)
    assert((live -- travelled).nonEmpty)
  }
}

/** Injected node that REORGS between phases: phase 1 serves the
  * salt-7 chain everywhere; phase 2 re-serves every block above
  * [[ReorgRpc.reorgAbove]] with salt-11 content (same heights, new
  * hashes) — a confirmation-depth rewind at the connector seam. */
class ReorgRpc extends BlockRangeRpc {
  override def getLogs(lo: Long, hi: Long): Iterator[InternalRow] =
    (lo to hi).iterator.flatMap { b =>
      val salt =
        if (ReorgRpc.phase.get() == 2 && b > ReorgRpc.reorgAbove) 11L else 7L
      BurnEvents.eventsInBlock(b, salt)
    }
}

object ReorgRpc {
  val reorgAbove = 14L
  val phase = new AtomicInteger(1)
}
