package graft

import java.util

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal in-memory DataSource-V2 `TableCatalog` for exercising the
  * REAL V2 write path (`writeTo(...).create()/append()/
  * overwritePartitions()` analyzes against V2 plans only — the built-in
  * session catalog creates V1 tables, which `append()` refuses). Test
  * scaffolding: single-JVM row store (fine under local[*] where
  * executors share the process), append + truncate + dynamic overwrite,
  * full-scan reads. Register with
  * `spark.conf.set("spark.sql.catalog.<name>", classOf[TestV2Catalog].getName)`. */
class TestV2Catalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    TestV2Catalog.tables.keys
      .filter(_._1 == catalogName)
      .map { case (_, ident) => ident }.toArray

  override def loadTable(ident: Identifier): Table =
    TestV2Catalog.tables.getOrElse((catalogName, ident),
      throw new NoSuchTableException(ident))

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (TestV2Catalog.tables.contains((catalogName, ident)))
      throw new TableAlreadyExistsException(ident)
    val t = new TestV2Catalog.MemTable(ident.toString, schema,
      properties.asScala.toMap)
    TestV2Catalog.tables.put((catalogName, ident), t)
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("alterTable")

  override def dropTable(ident: Identifier): Boolean =
    TestV2Catalog.tables.remove((catalogName, ident)).isDefined

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("renameTable")
}

object TestV2Catalog {
  /** (catalog, identifier) → table; JVM-wide so local-mode executors and
    * the driver see one store. */
  val tables: scala.collection.concurrent.TrieMap[(String, Identifier), MemTable] =
    scala.collection.concurrent.TrieMap.empty

  class MemTable(
      tableName: String,
      tableSchema: StructType,
      val props: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {

    val rows = new java.util.concurrent.CopyOnWriteArrayList[InternalRow]()

    override def name(): String = tableName
    override def schema(): StructType = tableSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE, TableCapability.OVERWRITE_DYNAMIC)

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new Scan with Batch {
          override def readSchema(): StructType = tableSchema
          override def toBatch: Batch = this
          override def planInputPartitions(): Array[InputPartition] =
            Array(RowsPartition(rows.asScala.toArray))
          override def createReaderFactory(): PartitionReaderFactory =
            new PartitionReaderFactory {
              override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
                val it = p.asInstanceOf[RowsPartition].rows.iterator
                new PartitionReader[InternalRow] {
                  private var cur: InternalRow = _
                  override def next(): Boolean =
                    if (it.hasNext) { cur = it.next(); true } else false
                  override def get(): InternalRow = cur
                  override def close(): Unit = ()
                }
              }
            }
        }
      }

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder with SupportsTruncate with SupportsDynamicOverwrite {
        private var clearFirst = false
        override def truncate(): WriteBuilder = { clearFirst = true; this }
        override def overwriteDynamicPartitions(): WriteBuilder = {
          // unpartitioned test table: one global partition → full replace
          clearFirst = true; this
        }
        override def build(): Write = new Write {
          override def toBatch: BatchWrite = new BatchWrite {
            override def createBatchWriterFactory(
                info: PhysicalWriteInfo): DataWriterFactory = new BufferingFactory
            override def commit(messages: Array[WriterCommitMessage]): Unit = {
              if (clearFirst) rows.clear()
              messages.foreach {
                case RowsMessage(rs) => rows.addAll(util.Arrays.asList(rs: _*))
                case other => throw new IllegalStateException(s"unexpected $other")
              }
            }
            override def abort(messages: Array[WriterCommitMessage]): Unit = ()
          }
        }
      }
  }

  case class RowsPartition(rows: Array[InternalRow]) extends InputPartition
  case class RowsMessage(rows: Array[InternalRow]) extends WriterCommitMessage

  class BufferingFactory extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new DataWriter[InternalRow] {
        private val buf = mutable.ArrayBuffer.empty[InternalRow]
        override def write(record: InternalRow): Unit = buf += record.copy()
        override def commit(): WriterCommitMessage = RowsMessage(buf.toArray)
        override def abort(): Unit = buf.clear()
        override def close(): Unit = ()
      }
  }
}
