package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-corpus read/write surface — "corpus as of version N",
  * the read-side contract incremental 100 TB pipelines live on (pp18
  * diffs two snapshots; this is where the snapshots come from).
  *
  * Layout under a root directory:
  * {{{
  *   root/_data/v3/part-*.parquet     immutable data files, one dir/version
  *   root/_versions/v3.json           atomically-published manifest
  * }}}
  *
  * The design carries the core idea of the table formats (Delta /
  * Iceberg) in miniature: the MANIFEST is the table. A version exists
  * iff its manifest file exists (written to a temp name and
  * atomic-renamed into `_versions/` — the graft-manifest sink's
  * two-phase discipline at the version level), data files are
  * immutable once published, and a read loads EXACTLY the files the
  * manifest lists — no directory listing of the data root, so reads
  * stay O(|version's files|) no matter how many versions accumulate,
  * and read-at-v1 is bit-exact forever because nothing ever rewrites
  * v1's files. A failed publish leaves an orphaned `_data` dir and no
  * manifest: invisible to readers, reclaimable by GC (mm09's audit
  * pattern).
  *
  * Single-writer version allocation (max+1, driver-side) — the same
  * assumption the local filesystem gives the manifest sink; a
  * production deployment would CAS the version number against a
  * catalog service.
  */
object VersionedCorpus {

  private def versionsDir(root: String) = new File(root, "_versions")

  /** All published versions, ascending. A version counts only once its
    * manifest is atomically in place. */
  def versions(root: String): Seq[Long] = {
    val files = Option(versionsDir(root).listFiles())
      .getOrElse(Array.empty[File])
    files.map(_.getName).collect {
      case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong
    }.sorted.toSeq
  }

  def latestVersion(root: String): Option[Long] = versions(root).lastOption

  /** Publish `df` as the next snapshot version; returns the version
    * number. Data lands first (private per-version dir), the manifest
    * publishes last and atomically. */
  def publish(df: DataFrame, root: String): Long = {
    val next = latestVersion(root).getOrElse(0L) + 1
    val dataDir = new File(new File(root, "_data"), s"v$next")
    df.write.parquet(dataDir.getAbsolutePath)
    val parts = Option(dataDir.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .sortBy(_.getName)
    // footer-only count: parquet row-group metadata, no data scan
    val nRows = df.sparkSession.read.parquet(dataDir.getAbsolutePath).count()
    val fileList = parts.map(f =>
      s"""{"file":"${f.getName}","bytes":${f.length}}""").mkString("[", ",", "]")
    val manifest =
      s"""{"version":$next,"n_files":${parts.length},"n_rows":$nRows,""" +
        s""""n_bytes":${parts.map(_.length).sum},"files":$fileList}"""
    versionsDir(root).mkdirs()
    val tmp = Paths.get(root, "_versions", s".v$next.json.tmp")
    Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(root, "_versions", s"v$next.json"),
      StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** Parsed manifest: (file names, n_rows). */
  private def manifest(spark: SparkSession, root: String,
      version: Long): (Seq[String], Long) = {
    val path = new File(versionsDir(root), s"v$version.json")
    require(path.isFile, s"version $version not published under $root")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("version", LongType), StructField("n_files", LongType),
      StructField("n_rows", LongType), StructField("n_bytes", LongType),
      StructField("files", ArrayType(StructType(Seq(
        StructField("file", StringType), StructField("bytes", LongType)))))))
    val row = spark.read.schema(schema).json(path.getAbsolutePath).head()
    val files = row.getSeq[org.apache.spark.sql.Row](4).map(_.getString(0))
    (files, row.getLong(2))
  }

  /** The corpus exactly as of `version`: loads only the files that
    * version's manifest lists. */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame = {
    val (files, _) = manifest(spark, root, version)
    val paths = files.map(f =>
      new File(new File(new File(root, "_data"), s"v$version"), f).getAbsolutePath)
    spark.read.parquet(paths: _*)
  }

  def readLatest(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, latestVersion(root).getOrElse(
      throw new IllegalArgumentException(s"no published versions under $root")))

  /** Audit row count a version's manifest promises (reconcile against
    * `readAt(...).count()` — the graft-manifest completeness pattern). */
  def manifestRows(spark: SparkSession, root: String, version: Long): Long =
    manifest(spark, root, version)._2
}
