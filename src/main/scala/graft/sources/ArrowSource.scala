package graft.sources.arrow

import java.nio.ByteBuffer
import java.nio.channels.{Channels, SeekableByteChannel}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.{BufferAllocator, RootAllocator}
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.complex.impl.UnionListWriter
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch, ColumnVector}
import org.apache.spark.util.SerializableConfiguration

/** Arrow IPC file source/sink as a DataSource V2 (reference surface:
  * /root/reference/datafusion/core/src/datasource/file_format/arrow.rs and
  * physical_plan/arrow_file.rs — DataFusion reads/writes the Arrow IPC file
  * format as a first-class table format). Spark ships the Arrow Java
  * libraries (they power its pandas interop) but no Arrow FILE source, so
  * this provider is part of the engine.
  *
  * Read path is COLUMNAR: each IPC record batch's vectors are wrapped in
  * Spark's public `ArrowColumnVector` and handed to the scan as a
  * `ColumnarBatch` — zero per-row decode, the same vectorized entry the
  * built-in parquet reader uses, feeding whole-stage codegen's batch loop.
  * One InputPartition per file (IPC files carry a block index into their
  * record batches — per-batch splits are the documented scale-up, mirroring
  * the reference's per-batch FileStream). Column pruning selects which
  * vectors are wrapped and shipped up; batch bodies are read as written.
  *
  * Write path: one IPC file per task, record batches of [[ArrowConv.BatchRows]]
  * rows, written through the Hadoop FileSystem API (file:// and hdfs:// alike).
  *
  * Types: boolean, int, long, float, double, string, binary,
  * timestamp-micros (UTC and NTZ), and arrays of the numeric/string types —
  * everything the engine's tables use.
  */
class ArrowDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-arrow"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = ArrowDataSource.pathOf(options)
    val conf = new Configuration()
    val files = ArrowDataSource.listArrowFiles(path, conf)
    require(files.nonEmpty, s"graft-arrow: no .arrow files under $path")
    val alloc = new RootAllocator(Long.MaxValue)
    val ch = ArrowDataSource.openChannel(files.head, conf)
    val r = new ArrowFileReader(ch, alloc)
    try ArrowConv.toSparkSchema(r.getVectorSchemaRoot.getSchema)
    finally { r.close(); alloc.close() }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ArrowTable(properties.get("path"), schema)
}

object ArrowDataSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-arrow: 'path' option required")
    p
  }

  def listArrowFiles(path: String, conf: Configuration): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else if (fs.getFileStatus(p).isFile) Seq(path)
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".arrow"))
      .map(_.getPath.toString)
      .sorted
  }

  /** IPC file reads need random access (footer first); adapt Hadoop's
    * seekable stream to the NIO channel the Arrow reader wants. */
  def openChannel(file: String, conf: Configuration): SeekableByteChannel = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    new HadoopSeekableChannel(fs.open(p), len)
  }
}

class HadoopSeekableChannel(in: FSDataInputStream, fileSize: Long)
    extends SeekableByteChannel {
  private var open = true
  override def read(dst: ByteBuffer): Int = {
    val buf = new Array[Byte](dst.remaining())
    val n = in.read(buf, 0, buf.length)
    if (n > 0) dst.put(buf, 0, n)
    n
  }
  override def write(src: ByteBuffer): Int =
    throw new UnsupportedOperationException("read-only channel")
  override def position(): Long = in.getPos
  override def position(newPosition: Long): SeekableByteChannel = {
    in.seek(newPosition); this
  }
  override def size(): Long = fileSize
  override def truncate(size: Long): SeekableByteChannel =
    throw new UnsupportedOperationException("read-only channel")
  override def isOpen: Boolean = open
  override def close(): Unit = { open = false; in.close() }
}

class ArrowTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-arrow:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowScanBuilder(path, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ArrowWriteBuilder(path, info.schema())
}

// ------------------------------------------------------------------- read
class ArrowScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(full.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new ArrowScan(path, required)
}

class ArrowScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    ArrowDataSource.listArrowFiles(path, new Configuration())
      .map(f => ArrowFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowReaderFactory(required.json,
      new SerializableConfiguration(new Configuration()))
}

case class ArrowFilePartition(file: String) extends InputPartition

class ArrowReaderFactory(requiredJson: String, conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    throw new UnsupportedOperationException("graft-arrow is a columnar source")

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    new ArrowPartitionReader(
      partition.asInstanceOf[ArrowFilePartition].file, required, conf.value)
  }
}

class ArrowPartitionReader(file: String, required: StructType, conf: Configuration)
    extends PartitionReader[ColumnarBatch] {
  private val alloc: BufferAllocator = new RootAllocator(Long.MaxValue)
  private val reader = new ArrowFileReader(ArrowDataSource.openChannel(file, conf), alloc)
  private val root = reader.getVectorSchemaRoot
  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    if (!reader.loadNextBatch()) false
    else {
      // prune by selecting only the required vectors; the ArrowColumnVector
      // wrappers read the IPC buffers in place (no copy, no row pivot)
      val cols: Array[ColumnVector] = required.fields.map(f =>
        new ArrowColumnVector(root.getVector(f.name)): ColumnVector)
      batch = new ColumnarBatch(cols, root.getRowCount)
      true
    }
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    reader.close() // closes the channel and the loaded vectors
    alloc.close()
  }
}

// ------------------------------------------------------------------ write
class ArrowWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new ArrowBatchWrite(path, schema, doTruncate)
  }
}

class ArrowBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new Configuration()
    if (truncate) {
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
    }
    new Path(path).getFileSystem(conf).mkdirs(new Path(path))
    new ArrowWriterFactory(path, schema.json, new SerializableConfiguration(conf))
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class ArrowWriterFactory(path: String, schemaJson: String,
    conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    new ArrowDataWriter(
      s"$path/part-$partitionId-$taskId.arrow", schema, conf.value)
  }
}

class ArrowDataWriter(file: String, schema: StructType, conf: Configuration)
    extends DataWriter[InternalRow] {
  private val alloc: BufferAllocator = new RootAllocator(Long.MaxValue)
  private val root = VectorSchemaRoot.create(ArrowConv.toArrowSchema(schema), alloc)
  private val p = new Path(file)
  private val out = p.getFileSystem(conf).create(p, true)
  private val writer = new ArrowFileWriter(root, null, Channels.newChannel(out))
  writer.start()
  private val setters = ArrowConv.setters(schema, root)
  private var n = 0

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < setters.length) { setters(i)(row, n); i += 1 }
    n += 1
    if (n >= ArrowConv.BatchRows) flush()
  }

  private def flush(): Unit = {
    if (n > 0) {
      root.setRowCount(n)
      writer.writeBatch()
      root.getFieldVectors.asScala.foreach(_.reset()) // ready for next batch
      root.setRowCount(0)
      n = 0
    }
  }

  override def commit(): WriterCommitMessage = {
    flush()
    writer.end()
    writer.close()
    root.close()
    alloc.close()
    new WriterCommitMessage {}
  }
  override def abort(): Unit = {
    writer.close(); root.close(); alloc.close()
    p.getFileSystem(conf).delete(p, false)
  }
  override def close(): Unit = ()
}

// ------------------------------------------------------------- conversion
/** Schema + value mapping between Catalyst and Arrow vectors (the write
  * side; reads go through Spark's own ArrowColumnVector). */
object ArrowConv {

  val BatchRows = 4096

  def toArrowType(dt: DataType): ArrowType = dt match {
    case BooleanType => ArrowType.Bool.INSTANCE
    case IntegerType => new ArrowType.Int(32, true)
    case LongType => new ArrowType.Int(64, true)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case StringType => ArrowType.Utf8.INSTANCE
    case BinaryType => ArrowType.Binary.INSTANCE
    case TimestampType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
    case TimestampNTZType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, null)
    case t => throw new IllegalArgumentException(s"graft-arrow: unsupported Spark type $t")
  }

  def toArrowField(name: String, dt: DataType, nullable: Boolean): Field = dt match {
    case ArrayType(et, containsNull) =>
      new Field(name, new FieldType(nullable, ArrowType.List.INSTANCE, null),
        List(toArrowField("element", et, containsNull)).asJava)
    case _ =>
      new Field(name, new FieldType(nullable, toArrowType(dt), null),
        java.util.Collections.emptyList[Field]())
  }

  def toArrowSchema(schema: StructType): ArrowSchema =
    new ArrowSchema(schema.fields.map(f =>
      toArrowField(f.name, f.dataType, f.nullable)).toList.asJava)

  def toSparkType(f: Field): DataType = f.getType match {
    case _: ArrowType.Bool => BooleanType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Binary => BinaryType
    case ts: ArrowType.Timestamp if ts.getTimezone == null => TimestampNTZType
    case _: ArrowType.Timestamp => TimestampType
    case _: ArrowType.List => ArrayType(toSparkType(f.getChildren.get(0)))
    case t => throw new IllegalArgumentException(s"graft-arrow: unsupported Arrow type $t")
  }

  def toSparkSchema(s: ArrowSchema): StructType =
    StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.getName, toSparkType(f), f.isNullable)))

  /** Catalyst row value → Arrow vector cell, one closure per column. */
  def setters(schema: StructType, root: VectorSchemaRoot): Array[(InternalRow, Int) => Unit] =
    schema.fields.zipWithIndex.map { case (f, ord) =>
      setter(f.dataType, root.getVector(f.name), ord)
    }

  private def setter(dt: DataType, v: FieldVector, ord: Int): (InternalRow, Int) => Unit =
    dt match {
      case BooleanType =>
        val vec = v.asInstanceOf[BitVector]
        (r, i) => if (r.isNullAt(ord)) vec.setNull(i)
          else vec.setSafe(i, if (r.getBoolean(ord)) 1 else 0)
      case IntegerType =>
        val vec = v.asInstanceOf[IntVector]
        (r, i) => if (r.isNullAt(ord)) vec.setNull(i) else vec.setSafe(i, r.getInt(ord))
      case LongType =>
        val vec = v.asInstanceOf[BigIntVector]
        (r, i) => if (r.isNullAt(ord)) vec.setNull(i) else vec.setSafe(i, r.getLong(ord))
      case TimestampType =>
        val vec = v.asInstanceOf[TimeStampMicroTZVector]
        (r, i) => if (r.isNullAt(ord)) vec.setNull(i) else vec.setSafe(i, r.getLong(ord))
      case TimestampNTZType =>
        val vec = v.asInstanceOf[TimeStampMicroVector]
        (r, i) => if (r.isNullAt(ord)) vec.setNull(i) else vec.setSafe(i, r.getLong(ord))
      case FloatType =>
        val vec = v.asInstanceOf[Float4Vector]
        (r, i) => if (r.isNullAt(ord)) vec.setNull(i) else vec.setSafe(i, r.getFloat(ord))
      case DoubleType =>
        val vec = v.asInstanceOf[Float8Vector]
        (r, i) => if (r.isNullAt(ord)) vec.setNull(i) else vec.setSafe(i, r.getDouble(ord))
      case StringType =>
        val vec = v.asInstanceOf[VarCharVector]
        (r, i) => if (r.isNullAt(ord)) vec.setNull(i)
          else vec.setSafe(i, r.getUTF8String(ord).getBytes)
      case BinaryType =>
        val vec = v.asInstanceOf[VarBinaryVector]
        (r, i) => if (r.isNullAt(ord)) vec.setNull(i)
          else vec.setSafe(i, r.getBinary(ord))
      case ArrayType(et, _) =>
        val vec = v.asInstanceOf[ListVector]
        val writer = vec.getWriter
        val elem = listElemWriter(et, writer, vec)
        (r, i) => {
          writer.setPosition(i)
          if (!r.isNullAt(ord)) {
            writer.startList()
            val arr = r.getArray(ord)
            var j = 0
            while (j < arr.numElements()) { elem(arr, j); j += 1 }
            writer.endList()
          }
        }
      case t => throw new IllegalArgumentException(s"graft-arrow: unsupported Spark type $t")
    }

  private def listElemWriter(et: DataType, w: UnionListWriter,
      vec: ListVector): (org.apache.spark.sql.catalyst.util.ArrayData, Int) => Unit =
    et match {
      case IntegerType => (a, j) => w.integer().writeInt(a.getInt(j))
      case LongType => (a, j) => w.bigInt().writeBigInt(a.getLong(j))
      case FloatType => (a, j) => w.float4().writeFloat4(a.getFloat(j))
      case DoubleType => (a, j) => w.float8().writeFloat8(a.getDouble(j))
      case StringType => (a, j) => {
        val bytes = a.getUTF8String(j).getBytes
        val buf = vec.getAllocator.buffer(bytes.length)
        try {
          buf.setBytes(0, bytes)
          w.varChar().writeVarChar(0, bytes.length, buf)
        } finally buf.close()
      }
      case t => throw new IllegalArgumentException(s"graft-arrow: unsupported array elem $t")
    }
}
