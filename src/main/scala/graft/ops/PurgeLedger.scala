package graft.ops

import java.io.File
import java.util.concurrent.ConcurrentHashMap

import graft.Tables
import graft.sources.VersionedCorpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The REAL `_tombstones` ledger behind the purge-governance operators
  * (pp32, pp37–pp39) — closes the round-6 gap where pp32's tombstone
  * membership was an inline `doc_id % 97` rule that never touched the
  * VersionedCorpus machinery st29 already consumes.
  *
  * TWO roots, chosen per session:
  *
  *  - **Production**: `spark.graft.ledger.root` (SparkSession conf)
  *    points consumers at an EXISTING VersionedCorpus — the corpus
  *    whose own purge history IS the ledger. No fixture copy, no
  *    planted rule: `tombstoneKeys` of that root is authoritative.
  *  - **Test default**: a scratch VersionedCorpus under
  *    `java.io.tmpdir`, keyed by an md5 of the sf dir's CANONICAL
  *    path (basename alone collides across parallel checkouts / CI
  *    workers sharing /tmp). Per sf dir (memoized per session,
  *    idempotent across sessions): publish the documents table as v1,
  *    file a GDPR purge for the planted deletion batch (every doc_id
  *    ≡ 0 mod 97 — a deterministic stand-in for the week's deletion
  *    requests, chosen so the DuckDB oracle can replay membership
  *    without seeing the ledger), then read the batch BACK through
  *    [[VersionedCorpus.tombstoneKeys]]. The consumers therefore
  *    exercise the full production path — purge → ledger write →
  *    ledger read → broadcast membership.
  *
  * The scratch ledger is VALIDATED against the planted rule before
  * it is served: a corpus regenerated under the same path (or a crash
  * between publish and purge) leaves a stale ledger whose keys no
  * longer equal the planted batch — serving it would make every
  * pp37/38/39/40/mm15 consumer silently diverge from the oracle (or
  * purge the wrong docs). On mismatch the scratch root is rebuilt
  * from the current corpus.
  *
  * Scale shape: the batch `collect()` is ∝ deletion requests
  * (KBs/week — the same sanctioned-metadata class as `_RANGES.json`
  * reads), never corpus-sized; consumers apply the keys as a
  * broadcast semi/anti-join or an `isin` literal (both row-local on
  * the corpus side).
  */
object PurgeLedger {

  /** Conf key naming an existing VersionedCorpus root whose ledger is
    * authoritative — set it and the scratch fixture is never built. */
  val rootConf = "spark.graft.ledger.root"

  private val cache = new ConcurrentHashMap[String, Seq[Long]]()
  private val servedTo = new ConcurrentHashMap[(String, String), Boolean]()

  /** Tombstoned doc_ids for sf dir `d`, via the ledger round-trip. */
  def keys(s: SparkSession, d: String): Seq[Long] =
    s.conf.getOption(rootConf) match {
      case Some(prod) => // production: the corpus's own ledger
        val ks = cache.computeIfAbsent(new File(prod).getAbsolutePath,
          _ => VersionedCorpus.tombstoneKeys(prod))
        // The conf is GLOBAL to the session, so a session serving two
        // corpora would silently apply one corpus's deletion batch to
        // the other (ADVICE r8). Validate once per (root, dataset):
        // a nonempty ledger must tombstone docs the served corpus
        // actually contains — zero overlap is the wrong-corpus (or
        // pure-no-op) signature, and either way applying it is a bug.
        // One `isin` scan per pair, memoized; ∝ deletion requests.
        servedTo.computeIfAbsent(
          (new File(prod).getAbsolutePath, new File(d).getCanonicalPath),
          { case (pr, dc) =>
            if (ks.nonEmpty) {
              val present = Tables.documents(s, d)
                .filter(col("doc_id").isin(ks: _*)).limit(1).count()
              if (present == 0L) throw new IllegalStateException(
                s"ledger root $pr tombstones ${ks.size} keys, NONE of " +
                  s"which exist in corpus $dc — $rootConf points this " +
                  "session's ledger at a different corpus than it serves")
            }
            org.slf4j.LoggerFactory.getLogger(getClass)
              .info(s"PurgeLedger: root $pr serving dataset $dc " +
                s"(${ks.size} tombstoned keys)")
            true
          })
        ks
      case None =>
        cache.computeIfAbsent(root(d).getAbsolutePath, _ => build(s, d))
    }

  /** The scratch corpus root for `d` (exposed for the round-trip
    * spec): keyed on the canonical FULL path — basename alone makes
    * two corpora with the same dir name (parallel checkouts, CI
    * workers sharing one /tmp) collide on one ledger. */
  private[graft] def root(d: String): File = {
    val canon = new File(d).getCanonicalPath
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    new File(sys.props("java.io.tmpdir"),
      s"graft_ledger_${new File(d).getName}_$h")
  }

  /** Drop the session memo for `d`'s scratch root (spec hook: lets a
    * test simulate a NEW session revalidating an on-disk ledger). */
  private[graft] def invalidate(d: String): Unit = {
    cache.remove(root(d).getAbsolutePath): Unit
  }

  private def delete(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete(): Unit
  }

  private def build(s: SparkSession, d: String): Seq[Long] = {
    val r = root(d).getAbsolutePath
    // the planted deletion batch from the CURRENT corpus: ∝ requests,
    // not corpus (52 keys at sf0.1) — the one sanctioned driver-side
    // collect in this path. Deriving it first is also the validation
    // oracle for whatever ledger is already on disk.
    val expected = Tables.documents(s, d)
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val loaded = VersionedCorpus.tombstoneKeys(r)
    // serve the standing ledger only when it matches the planted rule
    // exactly; anything else (empty after a crash between publish and
    // purge, stale after a corpus regeneration at the same path) is
    // rebuilt — re-filing a purge is idempotent, serving a wrong
    // batch is not
    if (loaded == expected && expected.nonEmpty) loaded
    else {
      if (root(d).exists()) delete(root(d))
      VersionedCorpus.publish(Tables.documents(s, d), r, Some("doc_id"))
      if (expected.nonEmpty)
        VersionedCorpus.purgeKeys(s, r, "doc_id", expected)
      VersionedCorpus.tombstoneKeys(r)
    }
  }

  /** The ledger as a 1-column broadcastable frame (`doc_id`). */
  def table(s: SparkSession, d: String): DataFrame = {
    val ks = keys(s, d)
    s.createDataset(ks)(org.apache.spark.sql.Encoders.scalaLong)
      .toDF("doc_id")
  }
}
