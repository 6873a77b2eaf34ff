package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache-residency discipline for multi-consumer operators.
  *
  * Operators like MinHash-LSH dedup persist corpus-sized intermediate
  * frames because several downstream consumers (self-join sides,
  * verification joins) would otherwise each re-derive the whole upstream
  * pipeline. In a long-lived session (QueryService, a bench loop) those
  * persists must not accumulate: the residency contract is that an
  * operator releases every corpus-sized frame it persisted before it
  * returns, leaving at most its (much smaller) result cached. */
object Caching {

  /** Materialize `result` once through the persisted `intermediates`, then
    * release them — eagerly, at call time.
    *
    * The result is persisted (it is candidate/pair-sized — orders of
    * magnitude smaller than the corpus-sized intermediates) so downstream
    * consumers read the cached rows instead of re-deriving the whole
    * pipeline against now-unpersisted inputs; correctness survives block
    * eviction either way because the lineage is intact.
    *
    * Release mechanics:
    *   - intermediates are unpersisted with `blocking = true` in a
    *     `finally`: the operator has already run its materializing action,
    *     so blocking costs nothing meaningful, and the release is
    *     OBSERVABLE (an async unpersist can leave `getPersistentRDDs`
    *     non-deterministic for callers auditing residency) and happens
    *     even when the action fails;
    *   - if the action throws, the half-materialized result is unpersisted
    *     too — a failed call leaves NO new cached frames behind.
    *
    * CALLER OBLIGATION: the returned frame is persisted; callers that
    * invoke the operator repeatedly in one session should `unpersist()` it
    * when done. Callers that need lazy composition instead of an eager
    * pipeline run should assemble from the signature-level primitives
    * (e.g. `minHashSignatures`) which persist nothing. */
  def materializeAndRelease(result: DataFrame,
                            intermediates: DataFrame*): DataFrame = {
    val out = result.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      out.count()
      out
    } catch {
      case t: Throwable =>
        out.unpersist(blocking = true)
        throw t
    } finally {
      intermediates.foreach(_.unpersist(blocking = true))
    }
  }

  /** Re-persist a PROJECTION of a persisted operator result and release
    * the original. `Dataset.unpersist` only releases the exact cached
    * plan — a caller that selects/renames/casts on top of a returned
    * persisted frame and then unpersists the wrapper silently leaks the
    * original cache entry. Callers that must hand downstream a reshaped
    * frame use this instead: the projection is materialized through the
    * original's cache (one cheap pass, no recompute), the original is
    * released, and the RETURNED frame is the persisted one — so the
    * family's caller-unpersist contract keeps working. */
  def reshapeAndRelease(result: DataFrame)
                       (project: DataFrame => DataFrame): DataFrame =
    materializeAndRelease(project(result), result)

  /** Run `body`, unpersisting `intermediates` if it throws — for guard
    * checks that run between an operator's persist() calls and its
    * materializeAndRelease tail (whose own finally only covers the tail).
    * A failed operator call must leave NO cached frames behind; the
    * double-unpersist on the success path never happens (body's
    * materializeAndRelease already released them, and unpersist on an
    * unpersisted frame is a no-op anyway). */
  def releasingOnFailure[A](intermediates: DataFrame*)(body: => A): A =
    try body
    catch {
      case t: Throwable =>
        intermediates.foreach(_.unpersist(blocking = true))
        throw t
    }
}
