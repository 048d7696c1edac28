package graft

import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** PII detection/redaction and substring-level (word n-gram) dedup — the
  * curation passes the synthetic corpus can't exercise with nonzero hits,
  * pinned here on constructed rows. */
class TextCurationSpec extends GraftSuite {
  private val spark2 = spark
  import spark2.implicits._

  test("pii detection counts emails, ipv4s, phones, cards per class") {
    val df = Seq(
      "write to alice.smith+x@mail.example.org or bob@x.io now",
      "servers 192.168.1.10 and 10.0.0.1 responded",
      "call 415-555-2671 about card 4242 4242 4242 4242",
      "no pii here at all").toDF("text")
    val got = df.select(
      piiCount(col("text"), "email").as("e"),
      piiCount(col("text"), "ipv4").as("i"),
      piiCount(col("text"), "phone").as("p"),
      piiCount(col("text"), "card").as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == Seq((2, 0, 0, 0), (0, 2, 0, 0), (0, 0, 1, 1), (0, 0, 0, 0)))
  }

  test("pii scrub redacts every class and is idempotent") {
    val df = Seq("mail a@b.co ip 10.0.0.1 tel 555-123-4567 card 1111 2222 3333 4444")
      .toDF("text")
    val once = df.select(piiScrub(col("text")).as("t"))
    val first = once.head().getString(0)
    assert(first == "mail <EMAIL> ip <IPV4> tel <PHONE> card <CARD>")
    assert(once.select(piiScrub(col("t"))).head().getString(0) == first)
  }

  test("pii scrub precedence: email eats its digits before ipv4/phone see them") {
    // a dotted-quad-shaped local part must redact as ONE email, not leak
    // a phantom ipv4 match out of the local part
    val df = Seq("from 10.0.0.1@relay.example.net end").toDF("text")
    assert(df.select(piiScrub(col("text"))).head().getString(0)
      == "from <EMAIL> end")
    assert(df.select(piiCount(col("text"), "email")).head().getInt(0) == 1)
  }

  test("ngram spans: cross-doc duplicated grams counted, self-repeats ignored") {
    val run = (1 to 12).map(i => s"w$i").mkString(" ") // 12 tokens → 3 10-grams
    val docs = Seq(
      (1L, run + " x1 x2"),             // shares the 12-token run with doc 2
      (2L, run + " y1 y2"),
      (3L, ("r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 " * 2).trim), // repeats ITS OWN grams
      (4L, (101 to 140).map(i => s"z$i").mkString(" ")))  // unique
      .toDF("doc_id", "text")
    val got = Dedup.ngramSpanStats(docs, n = 10).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // docs 1/2: 14 tokens → 5 grams each; the 3 grams inside the shared
    // 12-token run are cross-doc dups, the 2 crossing into x*/y* are not.
    // doc 3's repeated grams live in ONE doc → zero. doc 4 unique → zero.
    assert(got == Seq((1L, 5L, 3L), (2L, 5L, 3L), (3L, 11L, 0L), (4L, 31L, 0L)))
  }

  test("graft_gram_hashes is bit-identical to xxhash64 over string shingles") {
    graft.plans.TextExprs.install(spark)
    // multiple spaces (empty tokens), fewer words than n, single word,
    // trailing space, unicode — every shingle edge the declarative form has
    val df = Seq(
      "one two three four five six",
      "a  b   c d e",       // consecutive spaces → empty tokens kept
      "short text",          // fewer than n words → whole-text gram
      "solo",
      "trailing space ",
      "héllo wörld ünïcode bytes go here",
      "").toDF("text")
    Seq(1, 3, 5).foreach { n =>
      val declarative = df.select(
        transform(shingles(col("text"), n), g => xxhash64(g)).as("h"))
        .collect().map(_.getSeq[Long](0)).toSeq
      val native = df.select(
        graft.plans.TextExprs.gramHashes(col("text"), n).as("h"))
        .collect().map(_.getSeq[Long](0)).toSeq
      assert(native == declarative, s"n=$n")
    }
  }

  test("ngram spans: hashed-key variant (the 100 TB shuffle form) agrees") {
    val docs = graft.core.Tables.documents(spark, sf).limit(50)
    val str = Dedup.ngramSpanStats(docs, n = 5, hashGrams = false)
      .orderBy("doc_id").collect().toSeq
    val hashed = Dedup.ngramSpanStats(docs, n = 5, hashGrams = true)
      .orderBy("doc_id").collect().toSeq
    assert(str == hashed)
  }

  test("bloom decontamination: superset of exact flags, bounded over-flagging") {
    val docs = graft.core.Tables.documents(spark, sf)
    val evalSet = docs.filter(col("doc_id") % 50 === 0)
    val trainSet = docs.filter(col("doc_id") % 50 =!= 0)
    val evalGrams = evalSet
      .select(explode(shingles(col("text"), 5)).as("g")).distinct()
    val exact = trainSet
      .select(col("doc_id"), explode(shingles(col("text"), 5)).as("g"))
      .join(evalGrams, Seq("g"), "left_semi")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val flagged = Dedup.bloomContaminated(trainSet, evalSet, n = 5)
      .filter(col("contaminated"))
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged), "bloom must never miss a contaminated doc")
    val extra = flagged.size - exact.size
    assert(extra * 100 <= trainSet.count(), s"doc-level FP rate too high: $extra extra flags")
  }

  test("bm25: distributed top-k matches a brute-force in-memory scorer") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = Seq(
      (1L, "hash join hash join hash"),
      (2L, "hash join"),
      (3L, "merge sort merge"),
      (4L, "scan filter scan filter scan filter scan filter scan filter"),
      (5L, "join"),
      (6L, "hash hash hash hash hash hash hash hash"))
    val docs = corpus.toDF("doc_id", "text")
    val queries = Seq("qa" -> "hash join", "qb" -> "merge scan")
    val got = graft.operators.Retrieval
      .bm25TopK(spark, docs, "doc_id", "text", queries, k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))

    // brute force: same formula, plain Scala
    val (k1, b) = (1.2, 0.75)
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    def score(qtext: String, id: Long): Double = {
      val dl = toks(id).size.toDouble
      val tfm = toks(id).groupBy(identity).map { case (w, g) => w -> g.size }
      val s = qtext.split(" ").distinct.map { term =>
        val df = toks.values.count(_.contains(term)).toDouble
        val tf = tfm.getOrElse(term, 0).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
          (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = queries.flatMap { case (qid, qtext) =>
      corpus.map(_._1).map(id => (qid, id, score(qtext, id)))
        .filter(_._3 > 0)
        .sortBy(t => (-t._3, t._2))
        .take(3).zipWithIndex
        .map { case ((q, id, s), i) => (q, i + 1, id, s) }
    }.sortBy(t => (t._1, t._2))
    assert(got == want, s"got $got, want $want")

    // the amortized path over a materialized postings table agrees
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    graft.operators.Retrieval.postings(docs, "doc_id", "text")
      .write.parquet(s"$dir/postings")
    val viaPostings = graft.operators.Retrieval.bm25FromPostings(spark,
        spark.read.parquet(s"$dir/postings"),
        graft.operators.Retrieval.corpusStats(docs, "text"), queries, k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(viaPostings == want, s"postings path diverged: $viaPostings")
  }

  test("rrf fusion: hand-computed reciprocal ranks, missing-list docs, top-k cut") {
    val spark2 = spark
    import spark2.implicits._
    // lex list: docs 1,2,3 at ranks 1..3; dense list: 3,4 at ranks 1..2.
    // rrf(3) = 1/63 + 1/61 (both lists), rrf(1) = 1/61 (lex only), etc.
    val lex = Seq(("q", 1, 1L), ("q", 2, 2L), ("q", 3, 3L)).toDF("qid", "rank", "doc_id")
    val den = Seq(("q", 1, 3L), ("q", 2, 4L)).toDF("qid", "rank", "doc_id")
    val got = graft.operators.Retrieval.rrfFuse(Seq(lex, den), k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
      .sortBy(_._1)
    def rr(rs: Int*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 3 fuses both lists and must rank first despite rank 3 in lex
    assert(got == Seq((1, 3L, rr(3, 1)), (2, 1L, rr(1)), (3, 2L, rr(2))), got)

    // multi-query dense retrieval matches per-query single-vector knn
    val vecs = (0L until 50L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11 - 5).toFloat)))
    val vdf = vecs.toDF("vec_id", "embedding")
    val queries = Seq("a" -> vecs(3)._2.toSeq, "b" -> vecs(17)._2.toSeq)
    val multi = graft.operators.Similarity.knnBruteMulti(vdf, queries, k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val single = queries.flatMap { case (qid, qv) =>
      graft.operators.Similarity.knnBrute(vdf, qv, k = 5)
        .collect().zipWithIndex.map { case (r, i) => (qid, i + 1, r.getLong(0)) }
    }.toSet
    assert(multi == single, s"multi $multi != single $single")
  }

  test("BPE training matches a naive single-machine reference, merge for merge") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = Seq(
      "low lower lowest low low",
      "new newer newest new newly",
      "wide wider widest new low",
      "slow slower slowest slowly slow")
    // naive reference: the textbook greedy loop over in-memory word lists
    def naiveBpe(texts: Seq[String], merges: Int): Seq[(String, String)] = {
      var words: Seq[Vector[String]] =
        texts.flatMap(_.split(" ")).filter(_.nonEmpty)
          .map(w => w.map(_.toString).toVector)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var r = 0
      while (r < merges) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        words.foreach(w => w.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
          case _ => ()
        })
        if (counts.isEmpty) return out.toSeq
        val (a, b) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }._1
        out += ((a, b))
        words = words.map { w =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          w.foreach { s =>
            if (acc.nonEmpty && acc.last == a && s == b)
              acc(acc.size - 1) = a + b
            else acc += s
          }
          acc.toVector
        }
        r += 1
      }
      out.toSeq
    }
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.operators.Vocab.bpeTrain(docs, merges = 8)
    val want = naiveBpe(corpus, 8)
    assert(got == want, s"\nspark: $got\nnaive: $want")
    // the overlapping-run scan semantics: "aaaa" + (a,a) -> [aa, aa]
    val runs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val m = graft.operators.Vocab.bpeTrain(runs, merges = 2)
    assert(m == naiveBpe(Seq("aaaa aaa"), 2) && m.head == (("a", "a")), m.toString)
  }

  test("BPE encode (rank loop) equals replaying the merge table in training order") {
    val spark2 = spark
    import spark2.implicits._
    val docs = graft.core.Tables.documents(spark, sf).limit(50)
    val merges = graft.operators.Vocab.bpeTrain(docs, merges = 8)
    assert(merges.size == 8)
    // sequential replay: merge table applied in order, one fold pass each,
    // per word — the definitional semantics the rank loop must reproduce
    def replay(text: String): Seq[String] =
      text.split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
        merges.foldLeft(w.map(_.toString).toVector) { case (syms, (a, b)) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { s =>
            if (acc.nonEmpty && acc.last == a && s == b)
              acc(acc.size - 1) = a + b
            else acc += s
          }
          acc.toVector
        }
      }
    val got = graft.operators.Vocab.encode(docs, merges)
      .select("text", "tokens").collect()
    got.foreach { r =>
      val (text, toks) = (r.getString(0), r.getSeq[String](1))
      assert(toks == replay(text),
        s"rank-loop and sequential replay diverged on: $text")
      assert(toks.mkString("") == text.replace(" ", ""), "lossless")
    }
  }
}
