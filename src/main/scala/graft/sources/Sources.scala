package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2): schema-explicit readers (never
  * infer on a 100 TB input — inference is a full extra scan) and
  * scale-aware writers.
  *
  * Layout guidance at scale:
  *  - `writePartitioned`: hive-style directory partitioning on a
  *    low-cardinality column → partition pruning turns predicate
  *    filters into directory skips.
  *  - `writeBucketed`: pre-shuffles into N buckets on the join/agg key
  *    → downstream joins/aggs on that key skip their Exchange entirely
  *    (verified in SourcesSpec by asserting a shuffle-free join plan).
  */
object Sources {

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** CSV with explicit schema + strict mode (malformed rows fail fast
    * rather than silently nulling — on a pipeline you want the alert). */
  def readCsv(s: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    s.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .csv(path)

  /** JSON-lines with explicit schema. */
  def readJsonLines(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("mode", "FAILFAST").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Directory-partitioned parquet: one dir per distinct value of
    * `partitionCols` — queries filtering on them prune whole dirs. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table: co-locates rows by `bucketCol` so
    * joins/aggregations on it are exchange-free. (Bucketed tables
    * require saveAsTable — path-based writes can't record bucket
    * metadata in the catalog.) */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
