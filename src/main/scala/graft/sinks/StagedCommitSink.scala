package graft.sinks

import java.util.{Map => JMap, UUID}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 BATCH WRITE with a staged-commit protocol (r5) — the
  * reference's A7 "idempotent transactional sink" as a first-class V2
  * writer instead of the foreachBatch approximation:
  *
  *  1. every task's `DataWriter` streams rows to its OWN file under a
  *     per-job staging dir (`.staging-<uuid>`) — executor-side, no
  *     driver data path;
  *  2. a task that fails/aborts deletes its file; speculative twins
  *     write distinct files and only the committed task's message
  *     reaches the driver (Spark's commit-coordinator contract);
  *  3. `BatchWrite.commit` moves ONLY the files named by the task
  *     commit messages into a new GENERATION dir (r6, ADVICE: a
  *     zombie/crashed attempt's file that never saw DataWriter.abort
  *     must not ride along) and atomically swaps the one-line
  *     `_current` pointer file to it — readers either see the whole
  *     old generation or the whole new one, never a mix;
  *  4. `BatchWrite.abort` removes the staging dir; the pointer never
  *     moved, so the previous generation stays live.
  *
  * MULTI-GENERATION (r11 VERDICT task 6): commits also append to a
  * `_log` commit log (oldest → newest, temp + atomic rename) and the
  * table retains the last `retain` generations (write option,
  * default 1) — the Delta/Iceberg snapshot-retention shape.
  * [[StagedCommitSink.readAt]] time-travels to any retained
  * generation (stepsBack commits before the live one) and fails
  * loudly past the horizon; GC deletes exactly the generations that
  * fell off the log, so an in-flight reader of a retained prior
  * snapshot finishes safely.
  * Files are CSV with Spark-reader-compatible quoting so the read
  * back is `spark.read.schema(...).csv(currentDir(path))` — the
  * format is deliberately boring; the SINK SEMANTICS (staging, task
  * commit messages, atomic pointer swap, abort) are the operator.
  * Supported column types: long/int/double/string (text timestamp
  * formats are a config surface, excluded as in q_io_roundtrip).
  *
  */
class StagedCommitSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "StagedCommitSink is write-only from SQL; read back via StagedCommitSink.read")
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val retain = Option(properties.get("retain")).map(_.toInt).getOrElse(1)
    require(retain >= 1, s"retain must be >= 1, got $retain")
    new StagedTable(schema, properties.get("path"), retain)
  }
}

object StagedCommitSink {
  /** Resolve the committed generation dir from the pointer file. */
  def currentDir(spark: SparkSession, path: String): String = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new Path(path, "_current")
    require(fs.exists(ptr), s"no committed generation under $path")
    val in = fs.open(ptr)
    val gen = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
    new Path(path, gen).toString
  }

  /** Read the committed generation with the given schema. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).csv(currentDir(spark, path))

  /** The `_log` commit log: retained generation names, oldest →
    * newest; empty if the table predates the log (old layout). */
  private[sinks] def readLog(fs: org.apache.hadoop.fs.FileSystem,
                             root: Path): List[String] = {
    val log = new Path(root, "_log")
    if (!fs.exists(log)) Nil
    else {
      val in = fs.open(log)
      try scala.io.Source.fromInputStream(in).getLines()
        .map(_.trim).filter(_.nonEmpty).toList
      finally in.close()
    }
  }

  /** Retained generations, oldest → newest (commit order). */
  def generations(spark: SparkSession, path: String): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readLog(fs, root)
  }

  /** TIME TRAVEL (r11 VERDICT task 6): read the generation
    * `stepsBack` commits before the live one — stepsBack = 0 is the
    * current generation, 1 is the previous. Requires the table to
    * have been written with option("retain", n > stepsBack); a
    * travel past the retention horizon fails loudly with what IS
    * retained rather than silently reading the wrong snapshot.
    */
  def readAt(spark: SparkSession, path: String, schema: StructType,
             stepsBack: Int): DataFrame = {
    val gens = generations(spark, path)
    require(stepsBack >= 0 && stepsBack < gens.size,
      s"time travel $stepsBack steps back, but only ${gens.size} " +
        s"generations are retained under $path: ${gens.mkString(", ")}")
    val gen = gens(gens.size - 1 - stepsBack)
    spark.read.schema(schema).csv(new Path(path, gen).toString)
  }

  /** Read the union of all committed STREAMING epochs (the `_epochs`
    * manifest — see [[StagedStreamingWrite]]). */
  def readEpochs(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val man = new Path(path, "_epochs")
    require(fs.exists(man), s"no committed epochs under $path")
    val in = fs.open(man)
    val dirs = try scala.io.Source.fromInputStream(in).getLines().toList
      finally in.close()
    require(dirs.nonEmpty, s"empty epoch manifest under $path")
    spark.read.schema(schema).csv(dirs.map(g => new Path(path, g).toString): _*)
  }
}

private class StagedTable(schema: StructType, path: String, retain: Int)
    extends Table with SupportsWrite {
  require(path != null, "StagedCommitSink requires option(\"path\", ...)")
  override def name(): String = s"staged_commit($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new StagedBatchWrite(path, info.schema(), retain)
        override def toStreaming: StreamingWrite =
          new StagedStreamingWrite(path, info.schema())
      }
    }
}

private case class StagedFileMessage(file: String) extends WriterCommitMessage

private class StagedBatchWrite(path: String, schema: StructType,
                               retain: Int) extends BatchWrite {
  // sanity-check the schema ONCE at planning, not per row
  schema.fields.foreach { f =>
    f.dataType match {
      case LongType | IntegerType | DoubleType | StringType => ()
      case other => throw new IllegalArgumentException(
        s"StagedCommitSink supports long/int/double/string; got $other for ${f.name}")
    }
  }
  private val stagingName = ".staging-" + UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new StagedWriterFactory(path, stagingName, schema,
      new graft.util.SerializableHadoopConf(
        org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val gen = "gen-" + stagingName.stripPrefix(".staging-")
    val genDir = new Path(root, gen)
    // move ONLY the files the commit coordinator vouched for — any
    // other file in staging is a zombie attempt (executor crash,
    // speculative twin that never reached abort) and must not commit
    if (!fs.mkdirs(genDir))
      throw new java.io.IOException(s"cannot create generation dir $genDir")
    messages.foreach { case StagedFileMessage(file) =>
      val src = new Path(file)
      if (!fs.rename(src, new Path(genDir, src.getName)))
        throw new java.io.IOException(s"commit rename failed: $src -> $genDir")
    }
    fs.delete(new Path(root, stagingName), true) // zombies + the empty dir
    // the pointer swap IS the commit: single-file replace via
    // write-temp + FileContext.rename(OVERWRITE) — atomic on
    // local/HDFS, no window where _current is absent (the old
    // delete-then-rename let a concurrent currentDir() throw)
    val tmp = new Path(root, "_current.tmp")
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    val ptr = new Path(root, "_current")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.makeQualified(root).toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(ptr),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // COMMIT LOG + retention (r11 VERDICT task 6): `_log` lists the
    // retained generations in commit order, oldest first — the
    // time-travel index. Append this commit, trim to the last
    // `retain`, GC every gen-* dir that fell off the log (with
    // retain=1 this is exactly the old swap-and-GC behavior; an
    // in-flight reader of a retained prior generation finishes
    // safely). The log write is temp + atomic rename like the
    // pointer, so readers never see a torn log.
    val priorLog = StagedCommitSink.readLog(fs, root)
    val newLog = (priorLog.filterNot(_ == gen) :+ gen).takeRight(retain)
    val logTmp = new Path(root, "_log.tmp")
    val lo = fs.create(logTmp, true)
    try lo.write(newLog.mkString("\n").getBytes("UTF-8")) finally lo.close()
    fc.rename(fs.makeQualified(logTmp), fs.makeQualified(new Path(root, "_log")),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // GC covers BOTH log-trimmed generations and any dir predating
    // the log (old single-generation layout)
    val keep = newLog.toSet
    fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("gen-") && !keep.contains(n))
      .foreach(stale => fs.delete(new Path(root, stale), true))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(
      org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration)
    fs.delete(new Path(root, stagingName), true)
  }
}

private class StagedWriterFactory(path: String, stagingName: String, schema: StructType,
                                  conf: graft.util.SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new StagedCsvWriter(path, stagingName, schema, partitionId, taskId, conf)
}

/** STREAMING write through the same staged-commit protocol, keyed by
  * EPOCH: each micro-batch stages under `.staging-epoch-<id>`, and
  * `commit(epochId)` moves the message-listed files to `epoch-<id>`
  * (deleting any prior dir of that name first — so a REPLAYED epoch
  * after restart overwrites its own output instead of duplicating it:
  * exactly-once at the sink without any key-based dedup), deletes any
  * HIGHER-numbered epoch dirs (r6, ADVICE: a fresh-checkpoint replay
  * that re-batches the input into fewer epochs must not leave the
  * prior run's tail epochs in the manifest — readEpochs would
  * double-count those rows), and rewrites the `_epochs` manifest
  * (temp + atomic FileContext rename) from the directories actually
  * present. Readers union the manifest's epochs. */
private class StagedStreamingWrite(path: String, schema: StructType)
    extends StreamingWrite {
  schema.fields.foreach { f =>
    f.dataType match {
      case LongType | IntegerType | DoubleType | StringType => ()
      case other => throw new IllegalArgumentException(
        s"StagedCommitSink supports long/int/double/string; got $other for ${f.name}")
    }
  }

  private def conf = org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration
  private def fs = new Path(path).getFileSystem(conf)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StagedStreamingWriterFactory(path, schema,
      new graft.util.SerializableHadoopConf(conf))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val f = fs
    val epochDir = new Path(root, s"epoch-$epochId")
    f.delete(epochDir, true) // replayed epoch: replace, never duplicate
    if (!f.mkdirs(epochDir))
      throw new java.io.IOException(s"cannot create epoch dir $epochDir")
    messages.foreach { case StagedFileMessage(file) =>
      val src = new Path(file)
      if (!f.rename(src, new Path(epochDir, src.getName)))
        throw new java.io.IOException(s"epoch commit rename failed: $src -> $epochDir")
    }
    f.delete(new Path(root, s".staging-epoch-$epochId"), true)
    // epochs above the one just committed can only be a prior run's
    // tail (commits are driver-sequential) — stale after a replay
    val present = f.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("epoch-"))
    present.filter(_.stripPrefix("epoch-").toLong > epochId)
      .foreach(stale => f.delete(new Path(root, stale), true))
    // manifest rebuilt from the dirs actually present (self-healing)
    val epochs = present.filter(_.stripPrefix("epoch-").toLong <= epochId)
      .sortBy(_.stripPrefix("epoch-").toLong)
    val tmp = new Path(root, "_epochs.tmp")
    val out = f.create(tmp, true)
    try out.write(epochs.mkString("\n").getBytes("UTF-8")) finally out.close()
    val man = new Path(root, "_epochs")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.makeQualified(root).toUri, conf)
    fc.rename(f.makeQualified(tmp), f.makeQualified(man),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    fs.delete(new Path(new Path(path), s".staging-epoch-$epochId"), true)
}

private class StagedStreamingWriterFactory(path: String, schema: StructType,
                                           conf: graft.util.SerializableHadoopConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new StagedCsvWriter(path, s".staging-epoch-$epochId", schema, partitionId, taskId, conf)
}

/** One staged CSV file per task attempt; distinct attempt ids write
  * distinct files, so a speculative twin can never corrupt the
  * winner's output. */
private class StagedCsvWriter(path: String, stagingName: String, schema: StructType,
                              partitionId: Int, taskId: Long,
                              conf: graft.util.SerializableHadoopConf)
    extends DataWriter[InternalRow] {

  private val file = new Path(new Path(path, stagingName),
    f"part-$partitionId%05d-$taskId.csv")
  private val fs = file.getFileSystem(conf.value)
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(file, true), "UTF-8"))

  // Spark csv reader defaults: quote = '"', escape = '\'. Quote every
  // string and escape its quote/backslash chars so the round-trip is
  // byte-exact for arbitrary content.
  private def csvString(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append(',')
      if (!row.isNullAt(i)) schema.fields(i).dataType match {
        case LongType    => sb.append(row.getLong(i))
        case IntegerType => sb.append(row.getInt(i))
        case DoubleType  => sb.append(row.getDouble(i))
        case StringType  => sb.append(csvString(row.getUTF8String(i).toString))
        case other       => throw new IllegalStateException(s"unreachable: $other")
      }
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    StagedFileMessage(file.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(file, false)
  }

  override def close(): Unit = ()
}
