package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path: an audited JSONL sink
  * (`format("graft-manifest")`) — the write-side twin of the
  * `graft-synth` read source. What it demonstrates is the two-phase
  * commit protocol a distributed sink needs so task retries and
  * speculative duplicates never publish twice:
  *
  *   - each task writes to a PRIVATE temp file and reports
  *     (temp path, row count, byte count) in its commit message —
  *     nothing is visible to readers yet;
  *   - the driver's `BatchWrite.commit` atomically publishes exactly
  *     one file per input partition (rename, not copy) and writes a
  *     `_MANIFEST.json` with per-file and total row/byte counts —
  *     the audit record a 100 TB ingest job reconciles against its
  *     source;
  *   - `abort` (driver) / task `abort` delete the temp files, so a
  *     failed job leaves no partial output behind.
  *
  * Readers treat `_MANIFEST.json` as the completeness marker (the
  * `_SUCCESS`-file pattern, but carrying counts instead of being
  * empty). Serialization covers the scalar types the test tables use;
  * wider types would route through Spark's own JSON machinery in a
  * production sink.
  */
class ManifestSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the query side
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ManifestTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-manifest requires option 'path'")),
      schema)
}

class ManifestTable(path: String, schema0: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-manifest($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // truncate-on-overwrite: drop previously-published files up front
      // (driver-side, before any task runs)
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new ManifestBatchWrite(path, info.schema(), doTruncate)
      }
    }
}

/** Task commit message: where the private temp file is and what it holds. */
case class ManifestTaskCommit(partitionId: Int, tempPath: String,
  rows: Long, bytes: Long) extends WriterCommitMessage

class ManifestBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new File(path)
    dir.mkdirs()
    new File(dir, "_temp").mkdirs()
    if (truncate) {
      Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
        if (f.getName.endsWith(".jsonl") || f.getName == "_MANIFEST.json")
          f.delete()
      }
    }
    new ManifestWriterFactory(path, schema)
  }

  /** Driver-side publish: one rename per task file + the manifest. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val commits = messages.map(_.asInstanceOf[ManifestTaskCommit])
      .sortBy(_.partitionId)
    val published = commits.map { c =>
      val dest = Paths.get(path, f"part-${c.partitionId}%05d.jsonl")
      Files.move(Paths.get(c.tempPath), dest,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      (dest.getFileName.toString, c.rows, c.bytes)
    }
    val files = published.map { case (f, r, b) =>
      s"""{"file":"$f","rows":$r,"bytes":$b}"""
    }.mkString("[", ",", "]")
    val manifest =
      s"""{"n_files":${published.length},"n_rows":${published.map(_._2).sum},
         |"n_bytes":${published.map(_._3).sum},"files":$files}""".stripMargin
        .replace("\n", "")
    Files.write(Paths.get(path, "_MANIFEST.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case c: ManifestTaskCommit => new File(c.tempPath).delete()
      case _ =>
    }
}

class ManifestWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(path, schema, partitionId, taskId)
}

class ManifestDataWriter(path: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  // taskId in the temp name isolates speculative/retried attempts of
  // the same partition from each other
  private val tempFile = new File(new File(path, "_temp"),
    f"part-$partitionId%05d-attempt-$taskId.jsonl")
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    new java.io.FileOutputStream(tempFile), StandardCharsets.UTF_8))
  private var rows = 0L
  private var bytes = 0L

  private def jsonValue(row: InternalRow, i: Int, dt: DataType): String = dt match {
    case _ if row.isNullAt(i) => "null"
    case LongType => row.getLong(i).toString
    case IntegerType => row.getInt(i).toString
    case DoubleType => row.getDouble(i).toString
    case FloatType => row.getFloat(i).toString
    case BooleanType => row.getBoolean(i).toString
    // timestamps travel as epoch MICROS (the InternalRow physical
    // value — lossless, reader-side cast is one integer op); dates as
    // epoch days. JSON has no temporal type, so integers beat strings
    // here: no timezone/format ambiguity across readers.
    case TimestampType | TimestampNTZType => row.getLong(i).toString
    case DateType => row.getInt(i).toString
    case StringType =>
      "\"" + row.getUTF8String(i).toString
        .replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
    case other => throw new UnsupportedOperationException(
      s"graft-manifest: unsupported type ${other.simpleString}")
  }

  override def write(row: InternalRow): Unit = {
    val line = schema.fields.zipWithIndex.map { case (f, i) =>
      "\"" + f.name + "\":" + jsonValue(row, i, f.dataType)
    }.mkString("{", ",", "}")
    out.write(line)
    out.newLine()
    rows += 1
    bytes += line.length + 1L
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    ManifestTaskCommit(partitionId, tempFile.getAbsolutePath, rows, bytes)
  }

  override def abort(): Unit = { out.close(); tempFile.delete() }
  override def close(): Unit = ()
}
