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
    * exceptions must keep their types for callers and specs). */
  def all[A](session: SparkSession)(thunks: (() => A)*): Seq[A] = {
    val futs = thunks.map { th =>
      pool.submit(new java.util.concurrent.Callable[A] {
        def call(): A = {
          SparkSession.setActiveSession(session)
          th()
        }
      })
    }
    futs.map { f =>
      try f.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw e.getCause
      }
    }
  }

  /** Two differently-typed independent actions, concurrently. */
  def par2[A, B](session: SparkSession)(fa: () => A, fb: () => B): (A, B) = {
    val r = all[Any](session)(fa, fb)
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
