package graft

import java.time.Instant
import graft.core.Cursor
import graft.functions.Buckets
import graft.functions.Buckets._
import graft.functions.TopicMatch
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property suite (driven through plain scalacheck — no
  * scalatestplus bridge in the offline cache). */
class PropertySpec extends GraftSuite {

  // Buckets._ brings Buckets.Unit into scope — be explicit about scala.Unit
  private def check(p: Prop, name: String): scala.Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  private val genInstant: Gen[Instant] =
    Gen.choose(0L, 4102444800000L).map(Instant.ofEpochMilli)
  private val genGran: Gen[Granularity] = for {
    v <- Gen.choose(1, 12)
    u <- Gen.oneOf[Buckets.Unit](Second, Minute, Hour, Day, Week, Month)
  } yield Granularity(v, u)

  test("property: bucket truncation is idempotent, monotone, and partitions time") {
    check(Prop.forAll(genInstant, genGran) { (t, g) =>
      val b = truncate(t, g)
      !b.isAfter(t) && truncate(b, g) == b && !advance(b, g).isBefore(t)
    }, "truncate")
    check(Prop.forAll(genInstant, genInstant, genGran) { (t1, t2, g) =>
      // monotone: t1 <= t2 ⇒ trunc(t1) <= trunc(t2)
      val (lo, hi) = if (t1.isBefore(t2)) (t1, t2) else (t2, t1)
      !truncate(lo, g).isAfter(truncate(hi, g))
    }, "monotone")
  }

  test("property: cursor encode/decode round-trips; corruption fails closed") {
    val genKey = for {
      ms <- Gen.choose(0L, 1L << 60)
      id <- Gen.alphaNumStr.suchThat(_.nonEmpty)
    } yield Cursor.Key(ms, id)
    check(Prop.forAll(genKey) { k =>
      Cursor.decode("evt", Cursor.encode("evt", k)) == Right(k)
    }, "roundtrip")
    check(Prop.forAll(genKey) { k =>
      Cursor.decode("att", Cursor.encode("evt", k)).isLeft
    }, "wrong-resource")
  }

  test("property: SpanScrub equals the brute-force coverage model") {
    // the native expression is hand-written two-pointer code; pin it
    // against the obvious O(words × starts) model on random inputs
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val genDoc = for {
      nw <- Gen.choose(0, 40)
      words <- Gen.listOfN(nw, Gen.oneOf("a", "b", "cc", "", "dd"))
    } yield words.mkString(" ")
    val genCase = for {
      doc <- genDoc
      n <- Gen.choose(1, 12)
      k <- Gen.choose(0, 10)
      gps <- Gen.listOfN(k, Gen.choose(0, 45))
    } yield (doc, n, gps.distinct.sorted)
    check(Prop.forAll(genCase) { case (doc, n, gps) =>
      val words = doc.split(" ", -1)
      val covered = words.indices.filter(i =>
        gps.exists(p => p <= i && i < p + n)).toSet
      val expectKept = words.indices.filterNot(covered).map(words)
      val row = graft.plans.TextExprs.spanScrub(
        UTF8String.fromString(doc), new GenericArrayData(gps.toArray), n)
      row.getString(0) == expectKept.mkString(" ") &&
        row.getInt(1) == words.length &&
        row.getInt(2) == words.length - expectKept.length
    }, "span-scrub")
  }

  test("property: commit-log snapshot equals the add/remove model under random ops") {
    // the log is load-bearing for the log store AND the control-plane
    // store: replay (including across checkpoint boundaries every 10
    // commits) must equal the trivial in-memory model for ANY op sequence
    import graft.operators.CommitLog
    val genOps: Gen[List[(String, Int)]] = Gen.choose(5, 35).flatMap(n =>
      Gen.listOfN(n, Gen.zip(
        Gen.oneOf("add", "remove"), Gen.choose(0, 20))))
    // 40 sequences (not the default 200): each case is dozens of real
    // filesystem commits, and 40 random walks already cross several
    // checkpoint boundaries
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40),
      Prop.forAll(genOps) { ops =>
      val table = java.nio.file.Files
        .createTempDirectory("graft_cl_prop").toString + "/t"
      val model = scala.collection.mutable.LinkedHashMap[String, String]()
      ops.foreach { case (op, i) =>
        val path = s"data/month=2024-01/part-$i.parquet"
        op match {
          case "add" =>
            CommitLog.commit(table, "append",
              Seq(CommitLog.AddFile(path, "2024-01")))
            model(path) = "2024-01"
          case "remove" if model.contains(path) =>
            CommitLog.commit(table, "retain", Nil, removes = Seq(path))
            model.remove(path)
          case _ => () // removing a non-live file: the model skips it too
        }
      }
      val snap = CommitLog.snapshot(table).files.map(f => f.path -> f.month).toMap
      snap == model.toMap
    })
    assert(res.passed, s"commit-log-model: $res")
  }

  test("property: glob match agrees with regex compilation") {
    // BOUNDED sizes: an unbounded pattern like a*a*a*...a* against a long
    // non-matching topic is catastrophic backtracking in BOTH engines —
    // unlucky ScalaCheck seeds made this test run for minutes. Real topic
    // globs are short; ≤8 pattern chars × ≤20 topic chars keeps the
    // worst case trivially cheap while still covering the semantics.
    val genTopic = Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaLowerChar, Gen.const('.')))).map(_.mkString)
    val genPattern = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaLowerChar, Gen.const('.'), Gen.const('*'))))
      .map(_.mkString)
    check(Prop.forAll(genPattern, genTopic) { (p, t) =>
      TopicMatch.matchOne(p, t) == t.matches(TopicMatch.toRegex(p))
    }, "glob-vs-regex")
  }

  test("property: z-value interleave is a bijection on 16-bit pairs") {
    def brute(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    def inverse(z: Long): (Long, Long) =
      (0 until 16).foldLeft((0L, 0L)) { case ((x, y), i) =>
        (x | (((z >> (2 * i)) & 1L) << i), y | (((z >> (2 * i + 1)) & 1L) << i))
      }
    val gen16 = Gen.choose(0L, 65535L)
    check(Prop.forAll(gen16, gen16) { (x, y) =>
      val z = brute(x, y)
      z >= 0 && z <= 0xFFFFFFFFL && inverse(z) == ((x, y))
    }, "zvalue-bijection")
    // the distributed expression agrees with the reference implementation
    // on a pinned sample (SparkSession-free here; LayoutSpec pins the
    // Column form against the same brute force)
    assert(brute(0xFFFFL, 0L) == 0x55555555L && brute(0L, 0xFFFFL) == 0xAAAAAAAAL)
  }

  test("property: MG summaries — serialization round-trips, and the " +
      "deterministic bound survives arbitrary data and merge splits") {
    import graft.plans.FrequencyExprs
    import graft.plans.FrequencyExprs.MgSummary
    // skewed item stream: small alphabet ⊎ long-tail ids
    val genItems: Gen[List[String]] = Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf("a", "b", "c", "d"),
      4 -> Gen.choose(0, 5000).map(i => s"t$i")))
    val genK = Gen.choose(1, 24)

    check(Prop.forAll(genItems, genK) { (items, k) =>
      val s = new MgSummary(k); items.foreach(s.insert)
      val rt = FrequencyExprs.deserialize(FrequencyExprs.serialize(s))
      rt.k == s.k && rt.n == s.n && rt.counters.toMap == s.counters.toMap
    }, "mg-serde-roundtrip")

    def boundHolds(s: MgSummary, items: List[String]): Boolean = {
      val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong)
      val m = s.counters.values.sum
      val bound = (s.n - m) / (s.k + 1)
      s.n == items.size &&
        // every counter is an undercount within the bound
        s.counters.forall { case (i, est) =>
          val t = trueCounts.getOrElse(i, 0L)
          est <= t && t <= est + bound
        } &&
        // every guaranteed-heavy item is present
        trueCounts.forall { case (i, t) =>
          t <= bound || s.counters.contains(i)
        }
    }
    check(Prop.forAll(genItems, genK) { (items, k) =>
      val s = new MgSummary(k); items.foreach(s.insert)
      boundHolds(s, items)
    }, "mg-single-bound")
    // arbitrary 3-way split, merged in arbitrary nesting order
    check(Prop.forAll(genItems, genK, Gen.choose(0, 2), Gen.oneOf(true, false)) {
      (items, k, which, leftFirst) =>
        val parts = items.zipWithIndex.groupBy(_._2 % 3).view
          .mapValues(_.map(_._1)).toMap.withDefaultValue(Nil)
        val ss = (0 to 2).map { i =>
          val s = new MgSummary(k); parts(i).foreach(s.insert); s
        }
        val merged =
          if (leftFirst) ss(which).mergeIn(ss((which + 1) % 3)).mergeIn(ss((which + 2) % 3))
          else ss(which).mergeIn(ss((which + 1) % 3).mergeIn(ss((which + 2) % 3)))
        boundHolds(merged, items)
    }, "mg-merge-bound")
  }

  test("property: GK sketch wire format round-trips and the rank bound " +
      "holds after serialize/merge/deserialize") {
    import graft.plans.QuantileExprs
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    val genVals: Gen[List[Double]] =
      Gen.listOf(Gen.choose(-1e6, 1e6)).suchThat(_.nonEmpty)
    val eps = 0.05

    check(Prop.forAll(genVals) { vals =>
      var s = new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold, eps)
      vals.foreach(v => s = s.insert(v))
      val rt = QuantileExprs.deserialize(
        QuantileExprs.serialize(s.compress()))
      rt.count == vals.size && {
        val sorted = vals.sorted
        Seq(0.1, 0.5, 0.9).forall { p =>
          rt.query(p).forall { est =>
            val lt = sorted.count(_ < est); val le = sorted.count(_ <= est)
            // two-sided rank bound with merge headroom (2*eps)
            lt <= (p + 2 * eps) * vals.size + 1 &&
              le >= (p - 2 * eps) * vals.size - 1
          }
        }
      }
    }, "gk-serde-rank")
  }
}
