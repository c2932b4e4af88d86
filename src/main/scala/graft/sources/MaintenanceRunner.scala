package graft.sources

import org.apache.spark.sql.SparkSession

/** ONE operational entry point for the index-maintenance cadence
  * (VERDICT r9 #4): `reconcileLexicon`, `reconcileIndex`,
  * `publishDatasetCard` and the dedup fold were four separate calls a
  * user had to sequence correctly; [[tick]] runs one "ingest tick" in
  * the documented safe order, so an operator schedules exactly one
  * job.
  *
  * Order rationale:
  *  1. Arrival fold first (opt-in `foldArrival` — the arrival batch
  *     is an input the caller knows about; nothing driver-side can
  *     detect one without running a job): clusters+keepers advance
  *     together off one quotient-graph computation
  *     ([[IndexArtifacts.publishFoldedDedup]]), and safe_keepers is
  *     invalidated fail-closed BEFORE any reader could compose a
  *     fresh keeper line with a stale conservative one.
  *  2. Full-family purge reconcile ([[IndexArtifacts.reconcileIndex]])
  *     — drift-gated on the tombstone ledger; when it fires, all
  *     eight purge-patchable lines advance together off the shared
  *     pp39 computation, and `publishPurgedIndex`'s internal publish
  *     order keeps `cells` before `knn_edges` (st34's lesson: a graph
  *     reader must never see fresh edges over stale entry cells).
  *  3. Lexicon cadence ([[IndexArtifacts.reconcileLexicon]]) — a
  *     deliberate no-op right after step 2 fired (the full sweep
  *     advances the per-line lexicon marker too); it exists in the
  *     tick for the configuration where the cheap lexicon-only
  *     cadence runs at a tighter `maxDrift` than the full sweep.
  *  4. Dataset card last, and only when SOMETHING advanced: the card
  *     describes the corpus the artifacts now serve, so it must be
  *     the final publish of the tick — and an all-quiet tick
  *     publishes nothing (a below-drift tick runs ZERO Spark jobs;
  *     the drift check reads driver-side markers and the memoized
  *     ledger, the sanctioned metadata class).
  *
  * Returns what each step did, `None` = that step was a no-op. */
object MaintenanceRunner {

  final case class Tick(
      folded: Option[Map[String, Long]],
      reconciled: Option[Map[String, Long]],
      lexicon: Option[Long],
      card: Option[Long])

  def tick(s: SparkSession, d: String, root: String,
      foldArrival: Boolean = false): Tick = {
    val folded =
      if (foldArrival) Some(IndexArtifacts.publishFoldedDedup(s, d, root))
      else None
    val reconciled = IndexArtifacts.reconcileIndex(s, d, root)
    val lexicon = IndexArtifacts.reconcileLexicon(s, d, root)
    val card =
      if (folded.isEmpty && reconciled.isEmpty && lexicon.isEmpty) None
      else Some(IndexArtifacts.publishDatasetCard(s, d, root))
    Tick(folded, reconciled, lexicon, card)
  }
}
