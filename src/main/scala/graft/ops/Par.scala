package graft.ops

/** Overlap independent driver-side branch construction (guide §2.6).
  *
  * Several engine operators build DataFrame branches whose CONSTRUCTION is
  * eager on the driver — PrefixSum's per-partition totals collect, k-means /
  * classifier fits, bounded scalar reads. When a query assembles several
  * such branches (x174's three layout arms, rankEnsemble's per-signal rank
  * passes, x161's independent model fits), sequential construction leaves
  * the cluster idle between each branch's small jobs; Spark's scheduler
  * happily runs the jobs concurrently if the driver submits them from
  * separate threads, and FIFO scheduling back-fills the tail of one
  * branch's stages with the next branch's tasks.
  *
  * Values are unaffected: each branch computes exactly what it computed
  * sequentially (the engine's determinism contracts are per-branch), and
  * results return in ARGUMENT order, not completion order. Failures
  * propagate with the original exception.
  *
  * Use only for branches that are independent (no shared lazily-initialized
  * mutable state); branches may share read-only inputs and checkpointed
  * relations — the block manager serializes concurrent first-computation of
  * a cached block per its own locking, with identical values either way.
  */
object Par {

  def seq[A](thunks: (() => A)*): Seq[A] = {
    if (thunks.size <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(thunks.size, 8))
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = t()
        })
      }
      futs.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }

  /** Two-branch convenience with distinct result types. */
  def pair[A, B](a: () => A, b: () => B): (A, B) = {
    val rs = seq[Any](() => a(), () => b())
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B])
  }
}
