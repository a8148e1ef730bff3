package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for `//`-terminated flat-record files (the A7
  * family — enzyme.dat / KEGG / CDDF shapes; SURVEY.md §1.1 prescribes a
  * custom DSv2 reader for these). One input partition per file — the
  * reference's per-file parser parallelism — with records split on a
  * configurable separator inside the executor.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.v2.RecordDataSource")
  *   .option("path", dir).option("recordSep", "\n//\n").load()
  * }}}
  */
class RecordDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RecordDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RecordTable(properties.asScala.toMap)
}

object RecordDataSource {
  val schema: StructType = StructType(Seq(StructField("record", StringType)))
}

final class RecordTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"records(${props.getOrElse("path", "?")})"
  override def schema(): StructType = RecordDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RecordScanBuilder(
      options.asScala.toMap.getOrElse("path",
        props.getOrElse("path", sys.error("records source: path required"))),
      options.asScala.toMap.getOrElse("recordSep",
        props.getOrElse("recordSep", "\n//\n")))
}

final class RecordScanBuilder(path: String, sep: String)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = RecordDataSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath)
          .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      else Array(p)
    files.sortBy(_.toString)
      .map(f => RecordFilePartition(f.toString, sep): InputPartition)
  }

  // ship the session's Hadoop configuration to executors — a bare
  // `new Configuration()` there would drop defaultFS / object-store
  // credentials and break on any non-local filesystem
  override def createReaderFactory(): PartitionReaderFactory =
    new RecordReaderFactory(new org.apache.spark.util.SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration))
}

final case class RecordFilePartition(file: String, sep: String)
    extends InputPartition

final class RecordReaderFactory(
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rp = partition.asInstanceOf[RecordFilePartition]
    new PartitionReader[InternalRow] {
      private val fs = new Path(rp.file).getFileSystem(conf.value)
      private val in = fs.open(new Path(rp.file))
      private val content =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      private val records = content.split(java.util.regex.Pattern.quote(rp.sep))
        .iterator.map(_.trim).filter(_.nonEmpty)
      private var current: String = _

      override def next(): Boolean =
        if (records.hasNext) { current = records.next(); true } else false
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](UTF8String.fromString(current)))
      override def close(): Unit = ()
    }
  }
}
