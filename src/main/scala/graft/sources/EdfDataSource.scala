package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.edf.Edf

/** DataSource V2 reader for EDF/EDF+ files: `spark.read.format("edf")
  * .option("chunk_records", n).load(pathOrGlob)` — the polished form of the
  * S1 custom source (SURVEY §4.3; the `binaryFile` + `mapPartitions` path in
  * [[graft.ingest.Ingest]] remains the pipeline's workhorse).
  *
  * One output row per (file, channel, record-chunk):
  * `(path, channel, sfreq, chunk_idx, t0_sec, samples array<double>)`.
  * One InputPartition per file (a PSG night is tens of MB — a natural task);
  * column pruning is honored: when `samples` is not required the reader
  * parses only headers and skips signal decoding entirely, so
  * channel-inventory queries over a corpus never touch the waveforms.
  */
class EdfDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "edf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EdfDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new EdfTable(properties.asScala.toMap)
}

object EdfDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("channel", StringType, nullable = false),
    StructField("sfreq", DoubleType, nullable = false),
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("t0_sec", DoubleType, nullable = false),
    StructField("samples", ArrayType(DoubleType, containsNull = false),
      nullable = true)))
}

private class EdfTable(properties: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = "edf"
  override def schema(): StructType = EdfDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EdfScanBuilder(
      Option(options.get("path")).orElse(properties.get("path"))
        .orElse(properties.get("paths"))
        .getOrElse(throw new IllegalArgumentException("edf: no path given")),
      Option(options.get("chunk_records")).orElse(properties.get("chunk_records"))
        .map(_.toInt).getOrElse(3600))
}

private class EdfScanBuilder(pathSpec: String, chunkRecords: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = EdfDataSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val spark = org.apache.spark.sql.SparkSession.active
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new Path(pathSpec)
      val fs = p.getFileSystem(conf)
      val files: Seq[String] =
        if (fs.isDirectory(p))
          fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.toString)
            .filter(_.toLowerCase.endsWith(".edf"))
        else fs.globStatus(p) match {
          case null => Seq(pathSpec)
          case gs if gs.nonEmpty => gs.toSeq.map(_.getPath.toString)
          case _ => Seq(pathSpec)
        }
      files.map(f => EdfInputPartition(f): InputPartition).toArray
    }

    override def createReaderFactory(): PartitionReaderFactory = {
      val spark = org.apache.spark.sql.SparkSession.active
      new EdfReaderFactory(required,
        new SerializableConfiguration(spark.sparkContext.hadoopConfiguration),
        chunkRecords)
    }
  }
}

private case class EdfInputPartition(path: String) extends InputPartition

private class EdfReaderFactory(
    required: StructType,
    conf: SerializableConfiguration,
    chunkRecords: Int) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[EdfInputPartition].path
    new PartitionReader[InternalRow] {
      private val needSamples = required.fieldNames.contains("samples")
      private lazy val rows: Iterator[InternalRow] = {
        val p = new Path(path)
        val fs = FileSystem.get(p.toUri, conf.value)
        val in = fs.open(p)
        val bytes =
          try {
            val len = fs.getFileStatus(p).getLen.toInt
            val buf = new Array[Byte](len)
            in.readFully(0, buf)
            buf
          } finally in.close()
        // Header-only parse suffices when samples are pruned away.
        val edf = if (needSamples) Edf.parse(bytes) else Edf.parseHeader(bytes)
        edf.signalHeaders.filterNot(_.isAnnotation).iterator.flatMap { h =>
          val label = h.label.trim
          val sfreq = h.samplesPerRecord / edf.recordDurationSec
          val chunkSamples = chunkRecords * h.samplesPerRecord
          val total =
            if (needSamples) edf.signals(label).length
            else edf.nRecords.toLong.toInt * h.samplesPerRecord
          val nChunks = math.max(1, (total + chunkSamples - 1) / chunkSamples)
          (0 until nChunks).iterator.map { c =>
            val vals = new Array[Any](required.fields.length)
            required.fieldNames.zipWithIndex.foreach { case (f, i) =>
              vals(i) = f match {
                case "path" => UTF8String.fromString(path)
                case "channel" => UTF8String.fromString(label)
                case "sfreq" => sfreq
                case "chunk_idx" => c
                case "t0_sec" => c.toDouble * chunkSamples / sfreq
                case "samples" =>
                  val sig = edf.signals(label)
                  val start = c * chunkSamples
                  val end = math.min(start + chunkSamples, sig.length)
                  new org.apache.spark.sql.catalyst.util.GenericArrayData(
                    java.util.Arrays.copyOfRange(sig, start, end))
              }
            }
            InternalRow.fromSeq(vals.toSeq)
          }
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
