package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 read path: a deterministic synthetic `documents`
  * generator (`format("graft-synth")`) — the load-generator /
  * backfill-fixture source a 100 TB pipeline uses to soak-test plans
  * without touching real data. The interesting part is the engine
  * integration, all public DSv2 API:
  *
  *   - `SupportsPushDownRequiredColumns`: unreferenced columns are
  *     never generated (column pruning reaches the source);
  *   - `SupportsPushDownFilters`: doc_id range predicates narrow the
  *     generated key space — and whole input partitions whose range
  *     falls outside it are never planned (partition pruning);
  *   - `SupportsPushDownLimit`: a LIMIT clamps the generated range
  *     itself, so `synth.limit(5)` plans 5 generated rows, not
  *     `rows` generated + 5 kept;
  *   - `SupportsReportStatistics`: the scan reports POST-pushdown
  *     row count and byte size, so Catalyst auto-broadcasts a
  *     filtered synth side with no hint — the "stats make the
  *     join strategy" contract a real catalog source must honor;
  *   - `planInputPartitions`: the row space splits into `parts`
  *     contiguous ranges, each generated independently on its
  *     executor (no driver materialization, no skew).
  *
  * Generation is splitmix-style hashing of (doc_id, position), so any
  * row is reproducible from its id alone — two readers at different
  * parallelism produce identical tables.
  *
  * Options: `rows` (default 1000), `parts` (default 8).
  */
class SynthProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("parts")).map(_.toInt).getOrElse(8))
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val vocab = Array("data", "spark", "table", "query", "join",
    "scan", "filter", "merge", "batch", "stream", "row", "column",
    "the", "a", "of", "and", "to", "in", "fast", "slow")
  private val langs = Array("en", "de", "fr", "es", "zh")

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic row payload for one doc id. */
  def genText(id: Long): String = {
    val n = 10 + (mix(id) & 0x3F).toInt // 10..73 tokens
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab((mix(id * 131 + i) % vocab.length).toInt.abs))
      i += 1
    }
    sb.toString
  }
  def genLang(id: Long): String = langs((mix(id + 7) % langs.length).toInt.abs)
  def genSource(id: Long): String = "src" + (mix(id + 13) % 20).toInt.abs
}

class SynthTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft-synth($rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(
      Option(options.get("rows")).map(_.toLong).getOrElse(rows),
      Option(options.get("parts")).map(_.toInt).getOrElse(parts))
}

class SynthScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var lo = 0L                  // inclusive
  private var hi = rows - 1            // inclusive
  private var limited = false
  private var pushed = Array.empty[Filter]
  private var required = SynthSource.schema

  override def pushLimit(limit: Int): Boolean = {
    // the generator is ordered and dense, so "any `limit` rows" is
    // exactly the first `limit` ids of the (already filter-narrowed)
    // range — the limit becomes a range clamp and is FULLY consumed
    hi = math.min(hi, lo + limit - 1)
    limited = true
    true
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v - 1); true
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v); true
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v); true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-evaluates everything we did not accept
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch
      with SupportsReportStatistics {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-synth range=[$lo,$hi] limited=$limited " +
        s"cols=${required.fieldNames.mkString(",")}"
    // POST-pushdown estimate: filters/limit already narrowed [lo,hi],
    // and pruned columns do not count toward the width — a filtered
    // synth side under the broadcast threshold auto-broadcasts
    override def estimateStatistics(): Statistics = new Statistics {
      private val nRows = math.max(0L, hi - lo + 1)
      private val width = required.fieldNames.map {
        case "text" => 210L // 10..73 tokens × ~5 chars, mean ~42
        case "lang" => 2L
        case "source" => 5L
        case _ => 8L // long columns
      }.sum
      override def sizeInBytes(): util.OptionalLong =
        util.OptionalLong.of(nRows * math.max(width, 1L))
      override def numRows(): util.OptionalLong = util.OptionalLong.of(nRows)
    }
    override def planInputPartitions(): Array[InputPartition] = {
      val step = math.max(1L, (rows + parts - 1) / parts)
      (0 until parts).iterator
        .map { p =>
          val s = p * step; val e = math.min(rows - 1, s + step - 1)
          SynthRange(math.max(s, lo), math.min(e, hi))
        }
        .filter(r => r.lo <= r.hi) // partition pruning: empty ranges never run
        .map(_.asInstanceOf[InputPartition]).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = {
      val cols = required.fieldNames
      (partition: InputPartition) => {
        val r = partition.asInstanceOf[SynthRange]
        new PartitionReader[InternalRow] {
          private var id = r.lo - 1
          override def next(): Boolean = { id += 1; id <= r.hi }
          override def get(): InternalRow = {
            val text = if (cols.contains("text") || cols.contains("n_chars"))
              SynthSource.genText(id) else ""
            InternalRow.fromSeq(cols.toSeq.map {
              case "doc_id" => id
              case "text" => UTF8String.fromString(text)
              case "lang" => UTF8String.fromString(SynthSource.genLang(id))
              case "source" => UTF8String.fromString(SynthSource.genSource(id))
              case "n_chars" => text.length.toLong
            })
          }
          override def close(): Unit = ()
        }
      }
    }
  }
}

case class SynthRange(lo: Long, hi: Long) extends InputPartition
