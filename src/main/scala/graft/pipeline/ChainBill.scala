package graft.pipeline

import scala.collection.concurrent.TrieMap

/** Per-JVM ledger of session-staged chain BUILD time (the one-time
  * cost the memo objects pay on first consumption). Every chain memo
  * wraps its by-name build in [[time]], so whichever declared query
  * happens to trigger the build can be billed for it: Bench samples
  * [[totalMs]] before/after each query and emits the delta as
  * `meta.chain_build_ms` — the committed record then separates
  * build-carrier queries (alphabetically-first chain consumers like
  * corpus_filter) from marginal serve cost without hand-derivation
  * (r17 verdict #4). Lazy builds that defer work into the consumer's
  * first action (no eager checkpoint/collect inside the memo) bill
  * only their plan-construction time — the ledger is a lower bound
  * there, exact for the checkpointing chains that dominate.
  */
object ChainBill {

  private val bill = TrieMap.empty[String, Long]

  /** Run `f`, attributing its wall milliseconds to `chain`. */
  def time[T](chain: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally {
      val ms = (System.nanoTime() - t0) / 1000000L
      bill.updateWith(chain)(v => Some(v.getOrElse(0L) + ms))
    }
  }

  /** Total build milliseconds across all chains since the last reset. */
  def totalMs: Long = bill.values.sum

  /** Per-chain build milliseconds since the last reset. */
  def snapshot: Map[String, Long] = bill.toMap

  def reset(): Unit = bill.clear()
}
