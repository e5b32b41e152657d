package graft.api

/** Shared constants of the LSM index families (PostingsIndex,
  * IvfIndex, DedupIndex, FingerprintIndex). */
object Lsm {

  /** The extent batch_id the size-tiered compactors consolidate
    * into — negative so it can never collide with a caller-assigned
    * admission id (admission ids are expected non-negative; the
    * replay guards key on a batch's own partition, so reusing a live
    * admission id would alias a consolidation with a replay). */
  val ConsolidatedBatchId: Long = -1L
}
