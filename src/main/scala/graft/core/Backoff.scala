package graft.core

/** Retry backoff policy (reference hookdeck/outpost
  * `internal/backoff/backoff.go:12-66`, defaults
  * `internal/config/config.go:168-170,600-603`): exponential base-2 over a
  * base interval, capped attempt count. */
final case class Backoff(baseMillis: Long = 30000L, factor: Long = 2L, maxRetries: Int = 10) {
  /** Delay before retry #n (1-indexed). */
  def delayMillis(n: Int): Long = {
    require(n >= 1)
    var d = baseMillis
    var i = 1
    while (i < n) { d *= factor; i += 1 }
    d
  }
  def exhausted(attemptNumber: Int): Boolean = attemptNumber > maxRetries
}
