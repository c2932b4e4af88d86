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
  * Per sf directory (memoized per session, idempotent across
  * sessions): publish the documents table as v1 of a scratch
  * VersionedCorpus, file a GDPR purge for the planted deletion batch
  * (every doc_id ≡ 0 mod 97 — a deterministic stand-in for the
  * week's deletion requests, chosen so the DuckDB oracle can replay
  * membership without seeing the ledger), then read the batch BACK
  * through [[VersionedCorpus.tombstoneKeys]]. The consumers therefore
  * exercise the full production path — purge → ledger write → ledger
  * read → broadcast membership — and a spec asserts the round-trip
  * returns exactly the planted batch and that v1's snapshot no longer
  * contains it.
  *
  * Scale shape: the batch `collect()` is ∝ deletion requests
  * (KBs/week — the same sanctioned-metadata class as `_RANGES.json`
  * reads), never corpus-sized; consumers apply the keys as a
  * broadcast semi/anti-join or an `isin` literal (both row-local on
  * the corpus side).
  */
object PurgeLedger {

  private val cache = new ConcurrentHashMap[String, Seq[Long]]()

  /** Tombstoned doc_ids for sf dir `d`, via the ledger round-trip. */
  def keys(s: SparkSession, d: String): Seq[Long] =
    cache.computeIfAbsent(root(d).getAbsolutePath, _ => build(s, d))

  /** The scratch corpus root for `d` (exposed for the round-trip
    * spec). */
  private[graft] def root(d: String): File =
    new File(sys.props("java.io.tmpdir"),
      s"graft_ledger_${new File(d).getName}")

  private def build(s: SparkSession, d: String): Seq[Long] = {
    val r = root(d).getAbsolutePath
    // recovery-keyed on the LEDGER, not the version: a crash between
    // publish and purge leaves a corpus with no tombstones, and
    // version-existence alone would then silently serve an EMPTY
    // batch to every consumer — re-filing the purge is the correct
    // (idempotent) recovery either way
    if (VersionedCorpus.tombstoneKeys(r).isEmpty) {
      if (VersionedCorpus.latestVersion(r).isEmpty)
        VersionedCorpus.publish(Tables.documents(s, d), r, Some("doc_id"))
      // the planted deletion batch: ∝ requests, not corpus (52 keys at
      // sf0.1) — the one sanctioned driver-side collect in this path
      val batch = Tables.documents(s, d)
        .filter(col("doc_id") % 97 === 0)
        .select(col("doc_id")).orderBy(col("doc_id"))
        .collect().map(_.getLong(0)).toSeq
      if (batch.nonEmpty) VersionedCorpus.purgeKeys(s, r, "doc_id", batch)
    }
    VersionedCorpus.tombstoneKeys(r)
  }

  /** The ledger as a 1-column broadcastable frame (`doc_id`). */
  def table(s: SparkSession, d: String): DataFrame = {
    val ks = keys(s, d)
    s.createDataset(ks)(org.apache.spark.sql.Encoders.scalaLong)
      .toDF("doc_id")
  }
}
