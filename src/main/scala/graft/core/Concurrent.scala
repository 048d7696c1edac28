package graft.core

/** Driver-side job overlap for INDEPENDENT actions (guide §2.6): Spark
  * happily runs several jobs at once inside one application — actions are
  * only sequential because driver code calls them sequentially. The
  * maintenance-cycle operators commit to MULTIPLE tables per feed (a fact
  * append and a rollup update, or several token-distinct appends to one
  * log); those commits are independent by construction — different tables,
  * or optimistic-retry commits with distinct tokens — so running them
  * serially leaves the machine idle through each commit's driver-side
  * phases (staging move, manifest write) while the next action's tasks
  * could already be back-filling the executor.
  *
  * `all` runs every thunk on its own driver thread, joins ALL of them
  * (never leaking a half-run action), shuts the pool down even when a join
  * throws, and propagates the FIRST failure with any later ones attached
  * via addSuppressed — the same failure discipline as the minhash replay's
  * warm-up pool. */
object Concurrent {
  def all(thunks: (() => Unit)*): Unit = {
    if (thunks.size <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futures = thunks.map(t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        }))
      var primary: Throwable = null
      futures.foreach { f =>
        try { f.get(); () }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            val cause = Option(e.getCause).getOrElse(e)
            if (primary == null) primary = cause
            else primary.addSuppressed(cause)
          case e: Throwable =>
            if (primary == null) primary = e else primary.addSuppressed(e)
        }
      }
      if (primary != null) throw primary
    } finally pool.shutdown()
  }
}
