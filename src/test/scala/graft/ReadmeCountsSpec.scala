package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r13 task #7: README gate/suite counts were hand-typed and
  * drifted twice (213/211 vs the tree's 214/212). This spec DERIVES the
  * counts from the single sources of truth — `SparkEntry.queries`,
  * `SparkEntry.oracleSql`, and the test tree — and fails the suite when
  * the README's stated numbers disagree, so the drift can't recur.
  */
class ReadmeCountsSpec extends AnyFunSuite {

  private def readmeText: String = {
    val src = scala.io.Source.fromFile("README.md", "UTF-8")
    try src.mkString finally src.close()
  }

  /** The ONLY gates allowed to lack a DuckDB oracle, each mapped to the
    * oracled contract gate that pins its semantics. A new unoracled gate
    * fails here until it documents its companion. */
  private val engineSpecific = Map(
    "approx_stats" -> "approx_stats_check",
    "dedup_minhash_lsh_fast" -> "dedup_lsh_check")

  test("README gate/oracle counts match SparkEntry") {
    val m = """(\d+) gate queries \((\d+) DuckDB-oracled""".r
      .findFirstMatchIn(readmeText)
      .getOrElse(fail("README no longer states 'N gate queries (M DuckDB-oracled' — update this spec's pattern"))
    assert(m.group(1).toInt === SparkEntry.queries.size,
      s"README says ${m.group(1)} gates; SparkEntry.queries has ${SparkEntry.queries.size}")
    assert(m.group(2).toInt === SparkEntry.oracleSql.size,
      s"README says ${m.group(2)} oracled; SparkEntry.oracleSql has ${SparkEntry.oracleSql.size}")
  }

  test("every oracle key names a gate query; unoracled gates have an oracled _check companion") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without a query: ${(os -- qs).toSeq.sorted}")
    val unoracled = (qs -- os).toSeq.sorted
    assert(unoracled.toSet === engineSpecific.keySet,
      s"unoracled gate set drifted: $unoracled vs documented ${engineSpecific.keySet.toSeq.sorted}")
    engineSpecific.foreach { case (q, companion) =>
      assert(os.contains(companion),
        s"engine-specific gate '$q' lost its oracled companion '$companion'")
    }
  }

  test("README suite count matches the test tree") {
    val suites = new java.io.File("src/test/scala/graft")
      .listFiles().count(_.getName.endsWith("Spec.scala"))
    val m = """(\d+) ScalaTest suites""".r.findFirstMatchIn(readmeText)
      .getOrElse(fail("README no longer states 'N ScalaTest suites' — update this spec's pattern"))
    assert(m.group(1).toInt === suites,
      s"README says ${m.group(1)} suites; the tree has $suites *Spec.scala files")
  }
}
