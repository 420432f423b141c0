package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A read/write in-memory table on Spark's DataSource V2 SPI — the
  * engine's analog of the reference's memory connector
  * (presto-memory `MemoryConnectorFactory.java` / `MemoryPagesStore
  * .java`): named tables whose pages live off-disk, with full
  * insert/overwrite/read-back.
  *
  * Together with [[SequenceSource]] (generating read connector) this
  * closes SURVEY §2.1's source/sink SPI row: both directions of the
  * connector contract are exercised through Spark's public V2
  * interfaces, not a private API.
  *
  * Cluster-correctness, both directions:
  *  - WRITE: executors never touch the store. Each [[DataWriter]]
  *    buffers unsafe-row bytes and returns them in its
  *    [[WriterCommitMessage]]; only the driver's `BatchWrite.commit` —
  *    which receives each task's message exactly once after
  *    speculation/retry dedup — publishes them. A task that fails
  *    after buffering commits nothing. (Same message-passing shape as
  *    presto-memory's worker→coordinator page flow.)
  *  - READ: `planInputPartitions` embeds each chunk's row bytes in the
  *    [[InputPartition]] itself, which Spark serializes driver→
  *    executor — readers deserialize their own split and never reach
  *    back to driver state.
  *
  * The committed store is driver-JVM-local (like Spark's own V2 memory
  * sink — a cache/fixture connector); a production variant would back
  * `commit`/`planInputPartitions` with a shared service behind the
  * same SPI classes.
  *
  * Usage:
  * {{{
  *   df.write.format("graft_mem").option("name", "t").mode("overwrite").save()
  *   spark.read.format("graft_mem").option("name", "t").load()
  * }}}
  */
class MemorySource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft_mem"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemoryStore.schemaOf(MemorySource.tableName(options.asScala.toMap))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemoryTable(MemorySource.tableName(properties.asScala.toMap), schema)
}

object MemorySource {
  private[sources] def tableName(opts: Map[String, String]): String =
    opts.getOrElse("name",
      throw new IllegalArgumentException("graft_mem requires option 'name'"))
}

/** Driver-side named-table store: schema + committed unsafe-row bytes. */
object MemoryStore {
  private val tables =
    new ConcurrentHashMap[String, (StructType, Array[Array[Byte]])]()

  def schemaOf(name: String): StructType =
    Option(tables.get(name)).map(_._1).getOrElse(
      throw new IllegalArgumentException(s"graft_mem table not found: $name"))

  def rowsOf(name: String): Array[Array[Byte]] =
    Option(tables.get(name)).map(_._2).getOrElse(Array.empty)

  def publish(name: String, schema: StructType, rows: Array[Array[Byte]],
      truncate: Boolean): Unit =
    tables.compute(name, (_, prev) =>
      if (truncate || prev == null) (schema, rows)
      else {
        // appended row bytes are UnsafeRows serialized under the NEW
        // write's schema; reinterpreting them with a different stored
        // schema (column order/types) would silently corrupt reads.
        // Nullability and field metadata do NOT change UnsafeRow layout,
        // so a non-nullable Seq.toDF append onto a nullable parquet-read
        // table (or vice versa) is safe and accepted.
        require(normalize(prev._1) == normalize(schema),
          s"graft_mem append to '$name': schema ${schema.simpleString} does not " +
            s"match stored schema ${prev._1.simpleString}")
        // Layout-safe is not semantics-safe: if the appended batch is
        // nullable where the stored schema is not, readers trusting the
        // stored non-nullability could elide null checks and read the
        // null slot as 0/false. Widen to the union of both sides.
        (widen(prev._1, schema).asInstanceOf[StructType], prev._2 ++ rows)
      })

  /** Nullability union of two layout-identical schemas: a field (or
    * array element / map value) is nullable if either side says so.
    */
  private def widen(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
    (a, b) match {
      case (sa: StructType, sb: StructType) =>
        StructType(sa.fields.zip(sb.fields).map { case (fa, fb) =>
          fa.copy(dataType = widen(fa.dataType, fb.dataType),
            nullable = fa.nullable || fb.nullable)
        })
      case (aa: org.apache.spark.sql.types.ArrayType,
            ab: org.apache.spark.sql.types.ArrayType) =>
        org.apache.spark.sql.types.ArrayType(
          widen(aa.elementType, ab.elementType),
          aa.containsNull || ab.containsNull)
      case (ma: org.apache.spark.sql.types.MapType,
            mb: org.apache.spark.sql.types.MapType) =>
        org.apache.spark.sql.types.MapType(
          widen(ma.keyType, mb.keyType), widen(ma.valueType, mb.valueType),
          ma.valueContainsNull || mb.valueContainsNull)
      case _ => a
    }

  /** Strip nullability + field metadata recursively — neither affects
    * UnsafeRow layout, so schemas differing only there are append-compatible.
    */
  private def normalize(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f =>
        org.apache.spark.sql.types.StructField(f.name, normalize(f.dataType))))
    case a: org.apache.spark.sql.types.ArrayType =>
      org.apache.spark.sql.types.ArrayType(normalize(a.elementType))
    case m: org.apache.spark.sql.types.MapType =>
      org.apache.spark.sql.types.MapType(normalize(m.keyType), normalize(m.valueType))
    case other => other
  }

  def drop(name: String): Unit = tables.remove(name)

  def exists(name: String): Boolean = tables.containsKey(name)

  def names(): Seq[String] = tables.keySet().asScala.toSeq.sorted

  /** Register an empty table (TableCatalog.createTable). */
  def create(name: String, schema: StructType): Unit = {
    val prev = tables.putIfAbsent(name, (schema, Array.empty))
    require(prev == null, s"graft_mem table already exists: $name")
  }

  def rename(from: String, to: String): Unit = {
    val v = tables.remove(from)
    require(v != null, s"graft_mem table not found: $from")
    require(tables.putIfAbsent(to, v) == null,
      s"graft_mem table already exists: $to")
  }

  /** Atomically drop every committed row matching the predicate
    * (three-valued: rows where the predicate is NULL survive, like
    * every SQL DELETE).
    */
  def deleteWhere(name: String,
      matches: (StructType, UnsafeRow) => Option[Boolean]): Unit =
    tables.compute(name, (_, prev) => {
      require(prev != null, s"graft_mem table not found: $name")
      val (schema, rows) = prev
      val row = new UnsafeRow(schema.length)
      (schema, rows.filterNot { bytes =>
        row.pointTo(bytes, bytes.length)
        matches(schema, row).contains(true)
      })
    })
}

class MemoryTable(name: String, writeSchema: StructType) extends Table
    with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {
  override def name(): String = s"graft_mem($name)"
  override def schema(): StructType =
    if (writeSchema != null && writeSchema.nonEmpty) writeSchema
    else MemoryStore.schemaOf(name)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new MemoryScan(name)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemoryWriteBuilder(name, info.schema())

  // DELETE FROM ... WHERE ... (reference: DeleteOperator.java /
  // SqlBase.g4:51) — Spark's RewriteDeleteFromTable hands the
  // source-translatable predicate here; unsupported shapes are
  // rejected in canDeleteWhere so the analyzer raises the standard
  // "cannot translate" error instead of a silent wrong delete.
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter])
      : Boolean = filters.forall(MemoryFilterEval.supported)

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter])
      : Unit =
    MemoryStore.deleteWhere(name, (schema, row) =>
      // the filter array is a conjunction
      filters.foldLeft(Option(true)) { (acc, f) =>
        (acc, MemoryFilterEval.eval(f, schema, row)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      })
}

class MemoryWriteBuilder(name: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemoryBatchWrite(name, schema, doTruncate)
  }
}

case class MemoryCommit(rows: Array[Array[Byte]]) extends WriterCommitMessage

class MemoryBatchWrite(name: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemoryWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    MemoryStore.publish(name, schema,
      messages.flatMap { case MemoryCommit(bs) => bs }, truncate)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class MemoryWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val toUnsafe = UnsafeProjection.create(schema)
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      override def write(record: InternalRow): Unit =
        buf += toUnsafe(record).copy().getBytes
      override def commit(): WriterCommitMessage = MemoryCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

/** A read split carrying its own row bytes (serialized to executors). */
case class MemoryPartition(rowBytes: Array[Array[Byte]], numFields: Int)
  extends InputPartition

class MemoryScan(name: String) extends Scan with Batch {
  override def readSchema(): StructType = MemoryStore.schemaOf(name)
  override def toBatch: Batch = this
  override def description(): String = s"graft_mem($name)"

  override def planInputPartitions(): Array[InputPartition] = {
    val rows = MemoryStore.rowsOf(name)
    val nf = MemoryStore.schemaOf(name).length
    val n = rows.length
    val parts = math.max(1, math.min(8, n / 1024))
    Array.tabulate(parts) { i =>
      MemoryPartition(rows.slice(i * n / parts, (i + 1) * n / parts), nf)
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new MemoryReaderFactory
}

class MemoryReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val MemoryPartition(rows, nf) = p.asInstanceOf[MemoryPartition]
    new PartitionReader[InternalRow] {
      private var cur = -1
      private val row = new UnsafeRow(nf)
      override def next(): Boolean = { cur += 1; cur < rows.length }
      override def get(): InternalRow = {
        row.pointTo(rows(cur), rows(cur).length)
        row
      }
      override def close(): Unit = ()
    }
  }
}
