package graft.util

import org.apache.spark.sql.SparkSession

/** Overlap independent, blocking Spark driver actions (optimization-guide
  * §2.6: Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially). The train-heavy operators (PQ's m seeded codebook
  * fits, IVF-PQ's coarse + product quantizers, the per-column rank-map
  * builds) issue many short independent job chains whose wall time was
  * dominated by sequential scheduling gaps, not compute — overlapping
  * them lets the next chain's tasks back-fill cores freed by the current
  * chain's tail.
  *
  * Determinism: each thunk's RESULT is independent of scheduling (seeded
  * fits, persisted frames); only wall-clock overlaps. FIFO scheduling
  * gives earlier-submitted jobs resource priority, which is exactly the
  * back-fill behaviour wanted here. */
object Parallel {

  private lazy val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r, "graft-parallel")
      t.setDaemon(true)
      t
    })

  /** Run the thunks concurrently, return results in order. The active
    * SparkSession is re-pinned inside each task: pooled threads are
    * reused across callers, so the inheritable thread-local may hold a
    * stale (or no) session, and driver-side planning reads SQLConf
    * through it. Failures rethrow the ORIGINAL cause (fail-fast guard
    * exceptions must keep their types for callers and specs).
    *
    * Failure discipline: EVERY sibling future is awaited before the
    * first failure rethrows — an early rethrow would leave sibling Spark
    * jobs running (and their persisted frames materializing) behind the
    * caller's back, defeating the family's no-cached-frames-on-failure
    * residency guarantee. Callers whose thunks persist frames pass
    * `onAbandoned` to release the completed siblings' handles the throw
    * would otherwise orphan. */
  def all[A](session: SparkSession)(thunks: (() => A)*): Seq[A] =
    allCleaning[A](session, _ => ())(thunks: _*)

  /** [[all]] with a disposal hook: when any thunk fails, `onAbandoned`
    * runs on each sibling result that COMPLETED (so e.g. its persisted
    * frame can be unpersisted) before the first failure's cause is
    * rethrown. Never invoked on the success path. */
  def allCleaning[A](session: SparkSession, onAbandoned: A => Unit)
                    (thunks: (() => A)*): Seq[A] = {
    val futs = thunks.map { th =>
      pool.submit(new java.util.concurrent.Callable[A] {
        def call(): A = {
          SparkSession.setActiveSession(session)
          th()
        }
      })
    }
    val results: Seq[Either[Throwable, A]] = futs.map { f =>
      try Right(f.get())
      catch {
        case e: java.util.concurrent.ExecutionException =>
          Left(e.getCause)
        case e: Throwable => Left(e)
      }
    }
    results.collectFirst { case Left(t) => t } match {
      case Some(first) =>
        results.foreach {
          case Right(a) =>
            // best-effort disposal: a cleanup failure must not mask the
            // original cause
            try onAbandoned(a)
            catch { case scala.util.control.NonFatal(_) => () }
          case Left(_) => ()
        }
        throw first
      case None => results.collect { case Right(a) => a }
    }
  }

  /** Two differently-typed independent actions, concurrently. */
  def par2[A, B](session: SparkSession)(fa: () => A, fb: () => B): (A, B) = {
    val r = all[Any](session)(fa, fb)
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
