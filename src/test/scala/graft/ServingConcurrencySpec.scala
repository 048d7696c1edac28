package graft

/** Serving-path concurrency contract (VERDICT r10 task #4): 1000
  * concurrent `GET /events/{id}` + `/trace` requests against the live
  * stack — running delivery query committing trace spans, racing
  * events-table appends — must produce ZERO errors and NO file-
  * descriptor growth (the r10 FD-leak class — unclosed directory
  * streams on the snapshot/bloom path — showed up exactly here, as fd
  * growth proportional to requests). */
class ServingConcurrencySpec extends GraftSuite {

  test("1000 concurrent point lookups + traces with racing appends: " +
      "zero errors, bounded fds") {
    val json = Bench.pointLookupConcurrentRun(spark,
      "/root/testdata/sf0.001", threads = 4, requestsPerThread = 125)
    val r = graft.functions.JsonMatch.parse(json)
    assert(r.get("requests").asInt == 1000, json)
    assert(r.get("errors").asLong == 0L, s"request errors: $json")
    // fd ceiling: keep-alive sockets + transient parquet readers allow a
    // small delta; a leak on the per-request path would show hundreds
    // (1k requests × ≥1 leaked stream each)
    val growth = r.get("fd_growth").asInt
    assert(growth < 64, s"fd growth $growth across 1000 requests: $json")
    // the path stayed a point lookup under load: p99 in tens of ms, not
    // seconds (generous bound — this is a contract, not a benchmark)
    assert(r.get("event_p99_ms").asDouble < 5000.0, json)
    assert(r.get("trace_p99_ms").asDouble < 5000.0, json)
  }
}
