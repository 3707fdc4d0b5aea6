package graft.sources.avro

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Avro container-file source/sink as a DataSource V2 (reference surface:
  * /root/reference/datafusion/datasource-avro/src/file_format.rs:90). The
  * image ships no spark-avro module jar, so this is a from-scratch provider
  * on the bundled Apache Avro Java library — the idiomatic Spark extension
  * point for a missing file format (TableProvider → Scan/Write), not a UDF
  * or driver-side shim.
  *
  * Read path: one InputPartition per container file; column pruning is
  * pushed to Avro schema resolution (the reader schema is the pruned subset,
  * so skipped fields are never decoded — real decode-level pruning, the
  * DSv2 analogue of parquet ReadSchema pruning). Write path: one container
  * file per task, written straight through the Hadoop FileSystem API (works
  * on file:// and hdfs:// alike), deflate-compressed.
  *
  * 100 TB notes: parallelism is file-granular — files are produced one per
  * write task, so a well-sized writer yields a well-parallelized reader
  * (Avro blocks have sync markers; sub-file splits would use them, noted as
  * the scale-up path). No shuffle anywhere on either path.
  *
  * Types covered (all the engine's tables need): boolean, int, long, float,
  * double, string, bytes, timestamp-micros, and arrays of these; nullable
  * via union[null, T].
  */
class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = AvroDataSource.pathOf(options)
    val conf = new Configuration()
    val files = AvroDataSource.listAvroFiles(path, conf)
    require(files.nonEmpty, s"graft-avro: no .avro files under $path")
    val in = new FsInput(new Path(files.head), conf)
    val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
    try AvroConv.toSparkSchema(r.getSchema)
    finally r.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new AvroTable(properties.get("path"), schema)
}

object AvroDataSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-avro: 'path' option required")
    p
  }

  def listAvroFiles(path: String, conf: Configuration): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else if (fs.getFileStatus(p).isFile) Seq(path)
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString)
      .sorted
  }
}

class AvroTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-avro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(path, info.schema())
}

// ------------------------------------------------------------------- read
class AvroScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve file field order; Spark may ask in any order
    required = StructType(full.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new AvroScan(path, required)
}

class AvroScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    AvroDataSource.listAvroFiles(path, new Configuration())
      .map(f => AvroFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required.json,
      new SerializableConfiguration(new Configuration()))
}

case class AvroFilePartition(file: String) extends InputPartition

class AvroReaderFactory(requiredJson: String, conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    new AvroPartitionReader(
      partition.asInstanceOf[AvroFilePartition].file, required, conf.value)
  }
}

class AvroPartitionReader(file: String, required: StructType, conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val reader = {
    val in = new FsInput(new Path(file), conf)
    // writer schema comes from the file; openReader with a datum reader that
    // has no expected schema yet, then re-open with the pruned projection so
    // Avro schema resolution SKIPS (never decodes) unused fields
    val probe = DataFileReader.openReader(in,
      new GenericDatumReader[GenericRecord]())
    val writerSchema = probe.getSchema
    probe.close()
    val projection = AvroConv.projectAvroSchema(writerSchema, required)
    DataFileReader.openReader(new FsInput(new Path(file), conf),
      new GenericDatumReader[GenericRecord](null, projection))
  }
  private val getters = AvroConv.readers(required)
  private var record: GenericRecord = _

  override def next(): Boolean = {
    if (!reader.hasNext) false
    else { record = reader.next(); true }
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < vals.length) {
      vals(i) = getters(i)(record.get(required.fields(i).name))
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = reader.close()
}

// ------------------------------------------------------------------ write
class AvroWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(path, schema, doTruncate)
  }
}

class AvroBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new Configuration()
    if (truncate) {
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
    }
    new Path(path).getFileSystem(conf).mkdirs(new Path(path))
    new AvroWriterFactory(path, schema.json, new SerializableConfiguration(conf))
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class AvroWriterFactory(path: String, schemaJson: String,
    conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    new AvroDataWriter(
      s"$path/part-$partitionId-$taskId.avro", schema, conf.value)
  }
}

class AvroDataWriter(file: String, schema: StructType, conf: Configuration)
    extends DataWriter[InternalRow] {
  private val avroSchema = AvroConv.toAvroSchema(schema)
  private val p = new Path(file)
  private val out = p.getFileSystem(conf).create(p, true)
  private val writer = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    w.create(avroSchema, out)
  }
  private val setters = AvroConv.writers(schema)

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < schema.length) {
      rec.put(i, if (row.isNullAt(i)) null else setters(i)(row, i))
      i += 1
    }
    writer.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    new WriterCommitMessage {}
  }
  override def abort(): Unit = {
    writer.close()
    p.getFileSystem(conf).delete(p, false)
  }
  override def close(): Unit = ()
}

// ------------------------------------------------------------- conversion
/** Schema + value mapping between Catalyst and Avro generic data. */
object AvroConv {

  private def isTimestampMicros(s: Schema): Boolean =
    s.getType == Schema.Type.LONG &&
      s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros]

  private def isLocalTimestampMicros(s: Schema): Boolean =
    s.getType == Schema.Type.LONG &&
      s.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros]

  /** Unwrap union[null, T] → (T, nullable). */
  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"graft-avro: unsupported union $s")
      (nonNull.head, true)
    } else (s, false)

  def toSparkType(s: Schema): DataType = {
    val (base, _) = unwrap(s)
    base.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG =>
        if (isTimestampMicros(base)) TimestampType
        else if (isLocalTimestampMicros(base)) TimestampNTZType
        else LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case Schema.Type.ARRAY => ArrayType(toSparkType(base.getElementType))
      case t => throw new IllegalArgumentException(s"graft-avro: unsupported Avro type $t")
    }
  }

  def toSparkSchema(record: Schema): StructType =
    StructType(record.getFields.asScala.toSeq.map { f =>
      StructField(f.name(), toSparkType(f.schema()), unwrap(f.schema())._2)
    })

  /** Reader-side projection: the writer's record schema restricted to the
    * required fields (schema resolution then skips everything else). */
  def projectAvroSchema(writer: Schema, required: StructType): Schema = {
    val keep = required.fieldNames.toSet
    val fields = writer.getFields.asScala.filter(f => keep(f.name())).map { f =>
      new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
    }
    Schema.createRecord(writer.getName, writer.getDoc, writer.getNamespace,
      false, fields.toList.asJava)
  }

  def toAvroType(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(et, _) => Schema.createArray(toAvroType(et))
    case t => throw new IllegalArgumentException(s"graft-avro: unsupported Spark type $t")
  }

  def toAvroSchema(schema: StructType): Schema = {
    val fields = schema.fields.map { f =>
      val base = toAvroType(f.dataType)
      val s = if (f.nullable)
        Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      else base
      new Schema.Field(f.name, s, null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord("row", null, "graft.avro", false, fields.toList.asJava)
  }

  /** Avro generic value → Catalyst value, one closure per column. */
  def readers(schema: StructType): Array[Any => Any] =
    schema.fields.map(f => reader(f.dataType))

  private def reader(dt: DataType): Any => Any = dt match {
    case StringType => v => if (v == null) null else UTF8String.fromString(v.toString)
    case BinaryType => v => if (v == null) null else {
      val bb = v.asInstanceOf[java.nio.ByteBuffer]
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    }
    case ArrayType(et, _) =>
      val elem = reader(et)
      v => if (v == null) null else {
        val it = v.asInstanceOf[java.util.Collection[Any]].asScala
        new GenericArrayData(it.map(elem).toArray)
      }
    // int/long/float/double/boolean/timestamp-micros arrive as the matching
    // java.lang boxes; Catalyst accepts them as-is
    case _ => v => v
  }

  /** Catalyst row value → Avro generic value, one closure per column. */
  def writers(schema: StructType): Array[(InternalRow, Int) => Any] =
    schema.fields.map(f => writer(f.dataType))

  private def writer(dt: DataType): (InternalRow, Int) => Any = dt match {
    case BooleanType => (r, i) => java.lang.Boolean.valueOf(r.getBoolean(i))
    case IntegerType => (r, i) => java.lang.Integer.valueOf(r.getInt(i))
    case LongType | TimestampType | TimestampNTZType =>
      (r, i) => java.lang.Long.valueOf(r.getLong(i))
    case FloatType => (r, i) => java.lang.Float.valueOf(r.getFloat(i))
    case DoubleType => (r, i) => java.lang.Double.valueOf(r.getDouble(i))
    case StringType => (r, i) => r.getUTF8String(i).toString
    case BinaryType => (r, i) => java.nio.ByteBuffer.wrap(r.getBinary(i))
    case ArrayType(et, _) =>
      val elemWriter = arrayElemWriter(et)
      (r, i) => {
        val arr = r.getArray(i)
        val out = new java.util.ArrayList[Any](arr.numElements())
        var j = 0
        while (j < arr.numElements()) { out.add(elemWriter(arr, j)); j += 1 }
        out
      }
    case t => throw new IllegalArgumentException(s"graft-avro: unsupported Spark type $t")
  }

  private def arrayElemWriter(et: DataType): (ArrayData, Int) => Any = et match {
    case BooleanType => (a, j) => java.lang.Boolean.valueOf(a.getBoolean(j))
    case IntegerType => (a, j) => java.lang.Integer.valueOf(a.getInt(j))
    case LongType | TimestampType | TimestampNTZType =>
      (a, j) => java.lang.Long.valueOf(a.getLong(j))
    case FloatType => (a, j) => java.lang.Float.valueOf(a.getFloat(j))
    case DoubleType => (a, j) => java.lang.Double.valueOf(a.getDouble(j))
    case StringType => (a, j) => a.getUTF8String(j).toString
    case t => throw new IllegalArgumentException(s"graft-avro: unsupported array elem $t")
  }
}
