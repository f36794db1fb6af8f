package graft.sources

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

private class WordCountTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "word-count source requires a path")

  override def name(): String = s"wordcount($path)"
  override def schema(): StructType = WordCountSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WordCountScanBuilder(path)
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
        fs.listStatus(p).filter(_.isFile).map(_.getPath.toString).sorted
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
