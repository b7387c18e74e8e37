package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path with the two-phase task-commit protocol —
  * the part of a sink that matters at 1000 executors: every task
  * writes its partition to a task-unique temp file and reports it in a
  * `WriterCommitMessage`; only the DRIVER's `BatchWrite.commit`
  * publishes temp files to their final names, and `abort` deletes
  * them — so a failed/speculated/duplicate task attempt can never leave
  * a partial or double-published output (rename-on-commit is the same
  * contract FileOutputCommitter v1 provides on a DFS).
  *
  * Rows are written as CSV (longs and digit-safe strings only — no
  * quoting logic, this demonstrates the COMMIT protocol, not a codec).
  */
class GraftCsvSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // write-only: schema comes from the DataFrame

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CsvSinkTable(schema, properties.get("path"))
}

class CsvSinkTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null, "graft csv sink requires option(\"path\", ...)")
  override def name(): String = s"graft_csv_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new CsvBatchWrite(info.schema(), path)
      }
    }
}

case class CsvTmpFile(tmp: String, finalName: String)
  extends WriterCommitMessage

class CsvBatchWrite(schema: StructType, path: String) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new CsvWriterFactory(schema, path)

  /** Driver-side publish: temp → final, atomic per file. Runs once,
    * after every task has succeeded. */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case CsvTmpFile(tmp, finalName) =>
      Files.move(Paths.get(tmp), Paths.get(path, finalName),
        StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case CsvTmpFile(tmp, _) => Files.deleteIfExists(Paths.get(tmp))
      case _ =>
    }
}

class CsvWriterFactory(schema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] = {
    Files.createDirectories(Paths.get(path))
    // task-UNIQUE temp name: concurrent attempts of the same partition
    // (speculation, retries) never collide; only the committed one is
    // published under the partition-stable final name
    val tmp = Paths.get(path, f".tmp-$partitionId%05d-$taskId")
    val finalName = f"part-$partitionId%05d.csv"
    new DataWriter[InternalRow] {
      private val out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
      override def write(row: InternalRow): Unit = {
        val cells = schema.fields.indices.map { i =>
          schema.fields(i).dataType match {
            case LongType => row.getLong(i).toString
            case IntegerType => row.getInt(i).toString
            case StringType => row.getUTF8String(i).toString
            case DoubleType => row.getDouble(i).toString
            case dt => throw new IllegalArgumentException(dt.toString)
          }
        }
        out.write(cells.mkString(","))
        out.write("\n")
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        CsvTmpFile(tmp.toString, finalName)
      }
      override def abort(): Unit = {
        out.close()
        Files.deleteIfExists(tmp)
      }
      override def close(): Unit = ()
    }
  }
}
