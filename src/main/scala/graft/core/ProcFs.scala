package graft.core

/** Tiny closed-read helpers for /proc sampling (a bench run samples
  * /proc/stat per timed pass; an unclosed scala.io.Source leaks its FD
  * until GC — the CommitLog.listDir lesson applied here). */
object ProcFs {
  def slurp(path: String): String = {
    val src = scala.io.Source.fromFile(path)
    try src.mkString finally src.close()
  }
  def firstLine(path: String): String = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().next() finally src.close()
  }
}
