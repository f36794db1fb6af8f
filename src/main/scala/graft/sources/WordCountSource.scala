package graft.sources

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 reader for the reference framework's own output
  * format: `word, count` lines, one file per job (the `.txt` files
  * under `output_compare/mr-wordc` — see /root/reference/test.sh and
  * mapreduce.h:155-167 for where the reducer writes it).
  *
  * This is the third Catalyst extension tier in the library (after
  * custom Expressions and custom aggregates): a connector, so the
  * reference's historical outputs are *queryable tables*, not
  * parse-it-yourself text. Usage:
  *
  * {{{
  *   spark.read.format("graft.sources.WordCountSource")
  *     .load("/root/reference/output_compare/mr-wordc")   // dir or file
  * }}}
  *
  * Scale shape: one `InputPartition` per file (the format has no
  * intra-file splits — a file is one reducer's sorted output), and
  * column pruning is pushed into the reader
  * (`SupportsPushDownRequiredColumns`), so `SELECT count(*)` or a
  * words-only projection never materializes the unused column —
  * visible as `ReadSchema` in the scan node like any built-in source.
  */
class WordCountSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WordCountSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WordCountTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object WordCountSource {
  val Schema: StructType = StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
}

private class WordCountTable(path: String)
    extends Table with SupportsRead with SupportsWrite {
  require(path != null && path.nonEmpty, "word-count source requires a path")

  override def name(): String = s"wordcount($path)"
  override def schema(): StructType = WordCountSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WordCountScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WordCountWriteBuilder(path, info.schema())
}

private class WordCountScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = WordCountSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new WordCountScan(path, required)
}

private class WordCountScan(path: String, required: StructType)
    extends Scan with Batch {

  // The SESSION's Hadoop conf, not `new Configuration()`: custom fs
  // settings (credentials, fs.* options) must reach both the
  // driver-side listing and the executor-side readers. Captured here
  // (driver, at plan time) and shipped serializable to the factory.
  private val hadoopConf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side listing only — the file CONTENTS stay on executors
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, hadoopConf.value)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        // skip hidden files: in-flight/crashed writers' `.tmp-*` spill
        // must never be readable data
        fs.listStatus(p).filter(s => s.isFile &&
            !s.getPath.getName.startsWith("."))
          .map(_.getPath.toString).sorted
      else Array(path)
    files.map(f => WordCountPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WordCountReaderFactory(required.fieldNames, hadoopConf)
}

private case class WordCountPartition(file: String) extends InputPartition

private class WordCountReaderFactory(columns: Array[String],
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WordCountReader(partition.asInstanceOf[WordCountPartition].file, columns,
      conf)
}

/** Streams one file's `word, count` lines as InternalRows holding
  * only the pruned columns. The split is on the LAST ", " so words
  * containing a comma (none in the reference corpus, but the format
  * doesn't forbid them) still parse. */
private class WordCountReader(file: String, columns: Array[String],
    conf: SerializableConfiguration) extends PartitionReader[InternalRow] {

  private val p = new Path(file)
  private val in = new java.io.BufferedReader(new java.io.InputStreamReader(
    FileSystem.get(p.toUri, conf.value).open(p), "UTF-8"))
  private var line: String = _

  override def next(): Boolean = {
    line = in.readLine()
    while (line != null && line.isEmpty) line = in.readLine()
    line != null
  }

  override def get(): InternalRow = {
    val sep = line.lastIndexOf(", ")
    require(sep >= 0, s"malformed word-count line in $file: '$line'")
    InternalRow.fromSeq(columns.toSeq.map {
      case "word" => UTF8String.fromString(line.substring(0, sep))
      case "cnt" => line.substring(sep + 2).trim.toLong
      case other => throw new IllegalArgumentException(s"unknown column $other")
    })
  }

  override def close(): Unit = in.close()
}

// --- write path ----------------------------------------------------

/** Write side of the connector: emits the reference framework's own
  * `word, count` line format, one file per task — the same
  * file-per-reducer layout the C framework produces
  * (/root/reference/mapreduce.h:155-167: the reducer owns the output
  * fd). `overwrite` maps to TRUNCATE.
  *
  * Commit protocol (safe under task retries AND speculation): each
  * task writes to a hidden `.tmp-<uuid>` file and reports it in its
  * commit message; only the driver-side job commit renames committed
  * tmp files to their final `part-NNNNN.txt` names (truncating the
  * previous contents first when requested). Uncommitted/aborted tmp
  * files are deleted, never renamed. */
private class WordCountWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    require(schema.fieldNames.toSeq == Seq("word", "cnt"),
      s"word-count sink expects (word, cnt), got ${schema.fieldNames.mkString(",")}")
    new WordCountWrite(path, doTruncate)
  }
}

private class WordCountWrite(path: String, doTruncate: Boolean)
    extends Write with BatchWrite {

  private val hadoopConf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  // one id per write job: final names are unique across jobs, so an
  // append can never rename onto an existing file (Hadoop rename onto
  // an existing destination fails — or on LocalFileSystem silently
  // clobbers it)
  private val jobId = java.util.UUID.randomUUID().toString.take(8)

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new WordCountWriterFactory(path, hadoopConf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = FileSystem.get(dir.toUri, hadoopConf.value)
    if (doTruncate && fs.exists(dir)) {
      fs.listStatus(dir).filter(s => s.isFile &&
          s.getPath.getName.endsWith(".txt"))
        .foreach(s => fs.delete(s.getPath, false))
    }
    fs.mkdirs(dir)
    messages.foreach { case WordCountCommit(tmp, part) =>
      val dst = new Path(dir, f"part-$part%05d-$jobId.txt")
      require(fs.rename(new Path(tmp), dst),
        s"word-count sink: failed to commit $tmp -> $dst")
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new Path(path).toUri, hadoopConf.value)
    messages.foreach {
      case WordCountCommit(tmp, _) => fs.delete(new Path(tmp), false)
      case _ =>
    }
  }
}

private case class WordCountCommit(tmpFile: String, partitionId: Int)
  extends WriterCommitMessage

private class WordCountWriterFactory(path: String,
    conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WordCountWriter(path, partitionId, taskId, conf)
}

private class WordCountWriter(path: String, partitionId: Int, taskId: Long,
    conf: SerializableConfiguration) extends DataWriter[InternalRow] {

  private val tmp = new Path(path, f".tmp-$partitionId%05d-$taskId")
  private val fs = FileSystem.get(tmp.toUri, conf.value)
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(tmp, true), "UTF-8"))

  override def write(row: InternalRow): Unit = {
    out.write(row.getUTF8String(0).toString)
    out.write(", ")
    out.write(row.getLong(1).toString)
    out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    WordCountCommit(tmp.toString, partitionId)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}
