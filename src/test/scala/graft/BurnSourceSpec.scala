package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BurnEvents

/** The DSv2 burn-event MicroBatchStream: deterministic generation,
  * offset-exact restart (no duplicates, no loss), and the reference's
  * record invariants (identity key, >2^53 wei decimals). */
class BurnSourceSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_burn_$tag").toString

  private def readSource(end: Long) =
    spark.readStream.format("graft.sources.BurnEventSource")
      .option("startBlock", "0").option("endBlock", end.toString)
      .option("blocksPerTrigger", "25")
      .load()

  private def expectedRows(end: Long): Long =
    (0L to end).map(b => BurnEvents.eventsInBlock(b).size.toLong).sum

  test("source yields exactly the deterministic block contents") {
    val out = tmp("out")
    readSource(99).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", tmp("ckpt"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val df = spark.read.parquet(out)
    assert(df.count() === expectedRows(99))
    // identity key unique; blocks complete; wei exceeds 2^53 somewhere
    assert(df.select("transactionHash", "logIndex").distinct().count() === df.count())
    assert(df.select("blockNumber").distinct().count() === 100)
    val maxWei = df.agg(max("valueWei")).head().getDecimal(0)
    assert(maxWei.compareTo(new java.math.BigDecimal(2L << 53)) > 0)
    // txHash shape: 0x + 64 hex
    assert(df.filter(!col("transactionHash").rlike("^0x[0-9a-f]{64}$")).count() === 0)
  }

  test("restart with the same checkpoint replays nothing") {
    val out = tmp("out2")
    val ckpt = tmp("ckpt2")
    def run(): Unit =
      readSource(49).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    run()
    val n1 = spark.read.parquet(out).count()
    run() // restart: committed offset == endBlock, nothing new
    val n2 = spark.read.parquet(out).count()
    assert(n1 === expectedRows(49))
    assert(n2 === n1)
  }

  test("s_dsv2_burn_ingest query entry lands the decoded stream in the sink") {
    val df = graft.streaming.StreamOps.queries("s_dsv2_burn_ingest")(spark, sf)
    assert(df.count() === expectedRows(99))
    // div-decode of wei into whole tokens is exact
    assert(df.filter(col("tokenWhole") * lit(1000000000000000000L).cast("decimal(19,0)")
      > col("valueWei")).count() === 0)
  }

  test("admission control drains a 1000-block backlog in bounded micro-batches") {
    val out = tmp("out3")
    val ckpt = tmp("ckpt3")
    def run(): Unit =
      spark.readStream.format("graft.sources.BurnEventSource")
        .option("startBlock", "0").option("endBlock", "999")
        .option("blocksPerTrigger", "100")
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    run()
    // one offset log entry per micro-batch: 1000 blocks / 100 per
    // trigger => at least 10 bounded batches, not one catch-up batch
    val batches = new java.io.File(s"$ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 10, s"backlog drained in only $batches micro-batches")
    val df = spark.read.parquet(out)
    assert(df.count() === expectedRows(999))
    assert(df.select("transactionHash", "logIndex").distinct().count() === df.count())
    run() // restart after full drain: committed offset holds, no replay
    assert(spark.read.parquet(out).count() === expectedRows(999))
  }

  test("batch read equals the streamed contents over the same range") {
    val batch = spark.read.format("graft.sources.BurnEventSource")
      .option("startBlock", "0").option("endBlock", "99").load()
    assert(batch.count() === expectedRows(99))
    assert(batch.select("transactionHash", "logIndex").distinct().count() === batch.count())
  }

  test("blockNumber and address filters push into the source scan") {
    val addr = BurnEvents.eventsInBlock(5L).head.getUTF8String(3).toString
    val df = spark.read.format("graft.sources.BurnEventSource")
      .option("startBlock", "0").option("endBlock", "99").load()
      .filter(col("blockNumber") < 10 && col("fromAddress") === addr)
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head
    // the range narrowed at the SCAN (blocks 10..99 never generated)
    // and the address filter travels with it
    assert(scan.description().contains("blocks=[0,9]"), scan.description())
    assert(scan.description().contains(addr), scan.description())
    val expected = (0L to 9L).flatMap(BurnEvents.eventsInBlock)
      .count(_.getUTF8String(3).toString == addr)
    assert(df.count() === expected && expected >= 1)
  }

  test("generation is a pure function of block number") {
    val a = BurnEvents.eventsInBlock(42L).map(_.toString)
    val b = BurnEvents.eventsInBlock(42L).map(_.toString)
    assert(a === b && a.nonEmpty)
  }

  // A11 reorg tolerance (r5, VERDICT item 6): a chain reorg rewrites
  // blocks above height R with different contents. With confirmation
  // depth D such that R >= head - D, the stream never ingested the
  // retracted rows, so the rewritten delivery is invisible — the sink
  // stays a consistent snapshot of the winning chain.
  test("confirmation depth masks a reorg below the depth window") {
    val out = tmp("reorg_out")
    val ckpt = tmp("reorg_ckpt")
    def run(head: Long, salt: Long, reorgAbove: Long): Unit =
      spark.readStream.format("graft.sources.BurnEventSource")
        .option("startBlock", "0").option("endBlock", head.toString)
        .option("blocksPerTrigger", "25")
        .option("confirmations", "10")
        .option("reorgSalt", salt.toString).option("reorgAbove", reorgAbove.toString)
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // run 1: head at 60, depth 10 → only blocks 0..50 are committed
    run(head = 60, salt = 0, reorgAbove = Long.MaxValue)
    val ingested1 = spark.read.parquet(out)
    assert(ingested1.agg(max("blockNumber")).head().getLong(0) === 50)
    // reorg: blocks ABOVE 52 are replaced (reorg depth 8 < D=10) and
    // the head advances to 80; run 2 resumes from the same checkpoint
    // against the node's NEW view of the chain
    run(head = 80, salt = 7, reorgAbove = 52)
    val sink = spark.read.parquet(out)
    // the sink must equal the winning chain's blocks 0..70 exactly:
    // 0..52 canonical (untouched by the reorg), 53..70 forked
    val expected = ((0L to 52L).flatMap(BurnEvents.eventsInBlock(_)) ++
        (53L to 70L).flatMap(BurnEvents.eventsInBlock(_, 7L)))
      .map(r => (r.getUTF8String(0).toString, r.getInt(1)))
    val got = sink.select("transactionHash", "logIndex").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(got.toSet === expected.toSet)
    assert(got.length === expected.length, "duplicate identity keys in the sink")
    // and NO retracted row survived: the pre-reorg (canonical) contents
    // of the rewritten blocks 53..60 must be absent — the depth filter
    // masked the retraction by never committing those blocks in run 1
    val retracted = (53L to 60L).flatMap(BurnEvents.eventsInBlock(_))
      .map(_.getUTF8String(0).toString).toSet
    assert(sink.filter(col("transactionHash").isin(retracted.toSeq: _*)).count() === 0)
  }

  test("depth 0 control: the same reorg leaves stale retracted rows behind") {
    // the negative control documenting WHY the depth filter exists:
    // without it, run 1 commits blocks through the head, and the reorg
    // retracts rows that are already in the sink — an append-only sink
    // cannot un-write them, so the stale canonical rows survive
    val out = tmp("reorg0_out")
    val ckpt = tmp("reorg0_ckpt")
    def run(head: Long, salt: Long, reorgAbove: Long): Unit =
      spark.readStream.format("graft.sources.BurnEventSource")
        .option("startBlock", "0").option("endBlock", head.toString)
        .option("blocksPerTrigger", "25")
        .option("reorgSalt", salt.toString).option("reorgAbove", reorgAbove.toString)
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    run(head = 60, salt = 0, reorgAbove = Long.MaxValue)
    run(head = 80, salt = 7, reorgAbove = 52)
    val sink = spark.read.parquet(out)
    val retracted = (53L to 60L).flatMap(BurnEvents.eventsInBlock(_))
      .map(_.getUTF8String(0).toString).toSet
    assert(sink.filter(col("transactionHash").isin(retracted.toSeq: _*)).count()
      === retracted.size, "expected the stale pre-reorg rows to survive at depth 0")
  }
}
