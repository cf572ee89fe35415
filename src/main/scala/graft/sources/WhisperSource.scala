package graft.sources

import graft.store.WhisperFormat
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 for the reference's binary format: a graphite tree of
  * `.whisper`/`.hoard` ring files read as a DataFrame —
  * `spark.read.format("whisper").load(dir)` → one row per POPULATED
  * ring slot, schema (series_id, step, ts, value). This is the
  * migration-free query path next to [[graft.store.HoardImport]]'s
  * one-shot store load: point Spark at the live graphite data dir and
  * join/aggregate it like any table.
  *
  * Scale shape: one input partition per file (a graphite tree is
  * millions of small files — embarrassingly parallel, and Spark packs
  * partitions per task), executor-side ring decode linear in file
  * bytes, and SERIES-NAME FILTER PUSHDOWN: `where series_id = 'x'`
  * (or IN) prunes the FILE LIST at planning time — the graphite
  * convention names the file after the series, so equality filters
  * never open a non-matching file.
  */
class WhisperSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "whisper"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WhisperSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new WhisperTable(Option(properties.get("path")).toSeq ++
      Option(properties.get("paths")).toSeq.flatMap(p =>
        p.stripPrefix("[").stripSuffix("]").split(",").map(
          _.trim.stripPrefix("\"").stripSuffix("\""))))
}

object WhisperSource {
  val Schema: StructType = StructType(Seq(
    StructField("series_id", StringType),
    StructField("step", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  private[sources] def seriesName(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  /** Driver-side listing: expand dirs to their `.whisper`/`.hoard`
    * files via the Hadoop FS API (works on any supported filesystem).
    */
  private[sources] def listFiles(roots: Seq[String]): Seq[String] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    roots.flatMap { r =>
      val p = new HPath(r)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else if (fs.getFileStatus(p).isFile) Seq(p.toString)
      else {
        val it = fs.listFiles(p, true)
        val out = scala.collection.mutable.Buffer.empty[String]
        while (it.hasNext) {
          val f = it.next()
          val n = f.getPath.getName
          if (n.endsWith(".whisper") || n.endsWith(".hoard"))
            out += f.getPath.toString
        }
        out.toSeq
      }
    }
  }
}

final class WhisperTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"whisper(${paths.mkString(",")})"
  override def schema(): StructType = WhisperSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WhisperScanBuilder(paths)
}

final class WhisperScanBuilder(paths: Seq[String])
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = WhisperSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept series_id equality/IN — they prune the FILE LIST below;
    // everything else stays post-scan (returned = not fully handled;
    // we also return the accepted ones since a file can hold only one
    // series and Spark re-applying them is free)
    pushed = filters.filter {
      case EqualTo("series_id", _: String) => true
      case In("series_id", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new WhisperScan(WhisperSource.listFiles(paths).filter { p =>
      val s = WhisperSource.seriesName(p)
      pushed.forall {
        case EqualTo("series_id", v: String) => s == v
        case In("series_id", vs) => vs.contains(s)
        case _ => true
      }
    }, required)
}

final case class WhisperInputPartition(path: String) extends InputPartition

final class WhisperScan(files: Seq[String], required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WhisperScan[${files.size} files, cols=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    files.map(WhisperInputPartition(_): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new WhisperReaderFactory(required)
}

final class WhisperReaderFactory(required: StructType)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[WhisperInputPartition].path
    new PartitionReader[InternalRow] {
      // executor-side whole-file read through the Hadoop FS API: ring
      // files are small by construction (16 + 24N + 12·points bytes)
      private val bytes = {
        val p = new HPath(path)
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val in = fs.open(p)
        try {
          val len = fs.getFileStatus(p).getLen.toInt
          val buf = new Array[Byte](len)
          in.readFully(0, buf)
          buf
        } finally in.close()
      }
      private val series = UTF8String.fromString(
        WhisperSource.seriesName(path))
      private val it = WhisperFormat.slots(bytes)
      private var cur: WhisperFormat.Slot = _

      override def next(): Boolean = {
        if (it.hasNext) { cur = it.next(); true } else false
      }

      override def get(): InternalRow =
        InternalRow.fromSeq(required.fieldNames.toSeq.map {
          case "series_id" => series
          case "step" => cur.step.toLong
          case "ts" => cur.ts * 1000000L // epoch micros
          case "value" => cur.value
        })

      override def close(): Unit = ()
    }
  }
}
