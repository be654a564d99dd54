package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Text-analysis operators (X4, SURVEY §2.11). */
class TextAnalysisSpec extends SparkSuite {

  test("q62 stratified sample: rates tracked per stratum, rerun-stable") {
    val s = TextAnalysis.stratifiedSample(spark, Sf0001).cache()
    val perLang = Tables.documents(spark, Sf0001)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val joined = s.join(perLang, Seq("lang")).cache()
    // sampled counts within loose bounds of the per-stratum rate
    // (multiplicative-hash buckets are near-uniform over doc_id)
    val bad = joined.filter(
      (col("lang") === "en" &&
        (col("n_sampled") < col("n_docs") * 0.3 || col("n_sampled") > col("n_docs") * 0.7)) ||
      (col("lang") =!= "en" &&
        (col("n_sampled") > col("n_docs") * 0.3 || col("n_sampled") < 1)))
    assert(bad.count() === 0, bad.collect().mkString(","))
    // deterministic: identical on rerun
    val s2 = TextAnalysis.stratifiedSample(spark, Sf0001)
    assert(s.exceptAll(s2).count() === 0)
    joined.unpersist(); s.unpersist()
  }

  test("q26 quality scores: ratios bounded, type count <= token count") {
    val q = TextAnalysis.qualityScore(spark, Sf0001).cache()
    val total = q.count()
    assert(total === Tables.documents(spark, Sf0001).count())
    // complement form so NULL ratios can't slip past a negated filter
    assert(q.filter(col("ttr").isNotNull &&
      col("ttr") > 0 && col("ttr") <= 1).count() === total)
    assert(q.filter(col("stopword_ratio").isNotNull &&
      col("stopword_ratio") >= 0 && col("stopword_ratio") <= 1).count() === total)
    assert(q.filter(col("n_types") <= col("n_tokens")).count() === total)
    q.unpersist()
  }

  test("q25 token freq: descending counts, limit respected") {
    val rows = TextAnalysis.tokenFreq(spark, Sf0001).collect()
    assert(rows.length <= 20)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("q24 text stats partition the corpus by language") {
    val t = TextAnalysis.textStats(spark, Sf0001)
    val total = Tables.documents(spark, Sf0001).count()
    assert(t.agg(sum("n_docs")).head().getLong(0) === total)
    assert(t.filter(col("min_chars") > col("max_chars")).count() === 0)
  }

  test("q27 lang guess: counts bounded and corpus-complete") {
    // the synthetic corpus shares one vocabulary across all lang labels,
    // so discrimination accuracy is not assertable — structure is.
    val g = TextAnalysis.langGuess(spark, Sf0001)
    assert(g.filter(col("n_guessed_en") > col("n_docs")).count() === 0)
    assert(g.filter(col("n_guessed_en") < 0).count() === 0)
    val total = Tables.documents(spark, Sf0001).count()
    assert(g.agg(sum("n_docs")).head().getLong(0) === total)
  }

  test("q28 fingerprint groups match exact-text duplicate groups") {
    val rows = TextAnalysis.fingerprints(spark, Sf0001).collect()
    val ledger = rows.filter(_.getString(0) == "__ledger")
    val groups = rows.filterNot(_.getString(0) == "__ledger")
    val textDups = Tables.documents(spark, Sf0001)
      .groupBy("text").count().filter(col("count") > 1).count()
    assert(groups.length.toLong === textDups)
    // ledger self-evidences the group/doc counts
    assert(ledger.length === 1)
    assert(ledger(0).getLong(1) === textDups)
    assert(ledger(0).getLong(2) === groups.map(_.getLong(1)).sum)
  }

  test("q28 fingerprints: non-vacuity pin — duplicate texts form groups") {
    // the sf0.01 CORRECTNESS entry passes with 0 rows (no exact dups in
    // the generated corpus) — vacuously hash-equal; this fixture proves
    // the registered query emits groups when dups exist
    import spark.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_q28_fixture_" +
      ProcessHandle.current().pid()
    Scratch.deleteOnExit(dir)
    Seq((1L, "same text"), (2L, "same text"), (3L, "unique"), (4L, "same text"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.fingerprints(spark, dir).collect()
    assert(got.length === 2) // ledger + one group
    val ledger = got.filter(_.getString(0) == "__ledger")(0)
    assert(ledger.getLong(1) === 1L) // one dup group
    assert(ledger.getLong(2) === 3L) // three docs in dup groups
    val group = got.filterNot(_.getString(0) == "__ledger")(0)
    assert(group.getLong(1) === 3L) // n_copies
    assert(group.getLong(2) === 1L) // first_doc
  }

  test("q100 BPE merges match a driver-side reference trainer") {
    import spark.implicits._
    val got = TextAnalysis.bpeMergeLearning(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // reference trainer: same greedy left-to-right semantics over the
    // collected corpus (the query's own 20% training sample) —
    // independent code path, shared only in contract
    var docs = Tables.documents(spark, Sf0001)
      .filter(col("doc_id") % 5 === 0 && col("text").isNotNull)
      .select($"text").as[String].collect().toSeq
      .filterNot(_.contains(TextAnalysis.MergeJoiner)) // mirrors the query's reserved-joiner guard
      .map(_.split(" ", -1).toVector).filter(_.length >= 2)
    val expected = Seq.newBuilder[(Long, String, String, Long)]
    for (rank <- 1 to TextAnalysis.BpeMerges) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      docs.foreach(_.sliding(2).foreach {
        case Seq(a, b) => counts((a, b)) += 1
        case _ =>
      })
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        expected += ((rank.toLong, l, r, n))
        val m = l + TextAnalysis.MergeJoiner + r
        docs = docs.map(_.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ m
          else acc :+ x
        })
      }
    }
    assert(got === expected.result())
    // merges carry their own algebra: later merges may build on earlier
    // fused symbols; ranks are contiguous and counts non-increasing only
    // per symbol-pair availability (no global monotonicity claim) — but
    // the table must be exactly BpeMerges rows on this corpus
    assert(got.length === TextAnalysis.BpeMerges)
  }

  test("q100 reserved-joiner guard: U+001F-carrying docs are excluded from training") {
    import spark.implicits._
    // the second doc smuggles a raw token equal to a fused symbol;
    // without the guard it would inflate the (a,a) count and could
    // re-fuse against genuine merges
    val poison = "a" + TextAnalysis.MergeJoiner + "a"
    val corpus = Seq("a a b b", s"$poison a a a").toDF("text")
    val got = TextAnalysis.bpeMergeLearningOn(spark, corpus).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // only the clean doc trains: (a,a) n=1 and (b,b) n=1 appear with
    // count 1 — the poisoned doc's three extra 'a's never count
    assert(got.forall(_._3 <= 1L))
  }

  test("BpeApply kernel is bit-equal to the iterated aggregate-HOF fuse") {
    import spark.implicits._
    val joiner = TextAnalysis.MergeJoiner
    // corpus exercising runs, overlaps, cascading merges, empties
    val docs = (Seq("a a a a", "a b a b c", "b c b c b", "x", "",
      "a b c a b c a b", "c c c a a b") ++
      Tables.documents(spark, Sf0001).select("text")
        .na.drop().as[String].collect().toSeq).toDF("text")
      .select(split(col("text"), " ").as("t"))
    // merge 2 builds on merge 1's fused symbol (cascade): (a,b) then (a⊔b, c)
    val merges = Seq(("a", "b"), ("a" + joiner + "b", "c"), ("c", "c"))
    def sqlLit(s: String) =
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    // the round-4 trainer's HOF fuse, chained once per merge as SQL text
    def hofSql(inner: String, l: String, r: String): String = {
      val f = l + joiner + r
      s"""aggregate($inner, cast(array() as array<string>), (acc, x) ->
         |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = ${sqlLit(l)}
         |            AND x = ${sqlLit(r)}
         |       THEN concat(slice(acc, 1, size(acc) - 1), array(${sqlLit(f)}))
         |       ELSE concat(acc, array(x)) END)""".stripMargin
    }
    val chained = merges.foldLeft("t") { case (inner, (l, r)) => hofSql(inner, l, r) }
    val both = docs.select(
      graft.functions.TextFunctions.bpeApply(col("t"), merges, joiner).as("kernel"),
      org.apache.spark.sql.functions.expr(chained).as("hof"))
    assert(both.filter(not(col("kernel") <=> col("hof"))).count() === 0)
  }

  test("RollingMd5Min kernel is bit-equal to the array_min md5-HOF form") {
    import spark.implicits._
    // corpus + crafted edges: exact k-length, k+1, repeats, multi-byte
    // UTF-8 (char windows must hash the chars' byte spans, not bytes)
    val docs = (Seq("abcdefgh", "abcdefghi", "aaaaaaaaaa", "zzzzzzzz",
      "héllo wörld ünïcode", "ascii and then émoji 😀 tail pad") ++
      Tables.documents(spark, Sf0001).select("text")
        .na.drop().as[String].collect().toSeq)
      .filter(_.length >= 8).toDF("text")
    val both = docs.select(
      graft.functions.TextFunctions.rollingMd5Min(col("text"), 8).as("kernel"),
      expr("array_min(transform(sequence(1, length(text) - 7)," +
        " i -> md5(substr(text, i, 8))))").as("hof"))
    assert(both.filter(not(col("kernel") <=> col("hof"))).count() === 0)
  }

  test("RollingMd5Grams kernel is bit-equal to the transform md5-HOF form") {
    import spark.implicits._
    // the q265 build-path contract: same corpus-plus-edges fixture class
    // as the RollingMd5Min pin — exact k-length, repeats, multi-byte
    // UTF-8 (char windows hash the chars' byte spans, not raw bytes)
    val docs = (Seq("abcdefgh", "abcdefghi", "aaaaaaaaaa", "zzzzzzzz",
      "héllo wörld ünïcode", "ascii and then émoji 😀 tail pad") ++
      Tables.documents(spark, Sf0001).select("text")
        .na.drop().as[String].collect().toSeq)
      .filter(_.length >= 8).toDF("text")
    val both = docs.select(
      graft.functions.TextFunctions.rollingMd5Grams(col("text"), 8).as("kernel"),
      expr("transform(sequence(1, length(text) - 7), " +
        "p -> named_struct('pos', cast(p as bigint), " +
        "'h', md5(substr(text, p, 8))))").as("hof"))
    assert(both.filter(not(col("kernel") <=> col("hof"))).count() === 0)
  }

  test("BigramUnkPairs kernel equals the zip_with-slices HOF form") {
    import spark.implicits._
    val vocab = Seq("the", "a", "dog", "cat", "ran")
    // edges: all-in-vocab, all-OOV, length 2, repeated tokens, empty
    // strings as tokens (split can yield them), vocab word at both ends
    val docs = (Seq("the dog ran", "zz yy xx", "a cat", "the the the",
      " leading", "trailing ", "a", "onlyoov") ++
      Tables.documents(spark, Sf0001).select("text")
        .na.drop().as[String].collect().toSeq).toDF("text")
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
    val vocabList = vocab.map(v => s"'$v'").mkString(", ")
    val both = docs.select(
      graft.functions.TextFunctions.bigramUnkPairs(col("t"), vocab, "<unk>")
        .as("kernel"),
      expr(s"""zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),
              |  (x, y) -> struct(
              |    CASE WHEN x IN ($vocabList) THEN x ELSE '<unk>' END AS w1,
              |    CASE WHEN y IN ($vocabList) THEN y ELSE '<unk>' END AS w2))"""
        .stripMargin).as("hof"))
    assert(both.filter(not(col("kernel") <=> col("hof"))).count() === 0)
  }

  test("ArrayOrderedPairs preserves null elements like the HOF (ADVICE r12)") {
    import spark.implicits._
    val arrs = Seq(Seq("a", null, "c"), Seq(null, null), Seq("x", "y"))
      .toDF("ts")
    val both = arrs.select(
      graft.functions.TextFunctions.orderedPairs(col("ts")).as("kernel"),
      expr("""flatten(transform(ts, (x, i) ->
             |  transform(slice(ts, i + 2, size(ts)),
             |    y -> struct(x AS a, y AS b))))""".stripMargin).as("hof"))
    assert(both.filter(not(col("kernel") <=> col("hof"))).count() === 0)
  }

  test("ArrayOrderedPairs kernel equals the nested-transform HOF form") {
    import spark.implicits._
    val arrs = Seq(Seq("a", "b", "c", "d"), Seq("x"), Seq(),
      Seq("t1", "t2"), ('a' to 'z').map(_.toString)).toDF("ts")
    val both = arrs.select(
      graft.functions.TextFunctions.orderedPairs(col("ts")).as("kernel"),
      expr("""flatten(transform(ts, (x, i) ->
             |  transform(slice(ts, i + 2, size(ts)),
             |    y -> struct(x AS a, y AS b))))""".stripMargin).as("hof"))
    assert(both.filter(not(col("kernel") <=> col("hof"))).count() === 0)
  }

  test("q102 accounting: totals are conserved and merges only shrink") {
    val out = TextAnalysis.applyTokenizer(spark, Sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (before, after) = (r.getAs[Long]("tokens_before"), r.getAs[Long]("tokens_after"))
      assert(after <= before, r)
      assert(after >= before / 2, r) // K pairwise merges can at most halve
      assert(r.getAs[Long]("n_docs") > 0, r)
    }
    // per-doc export agrees with the aggregate the query returned
    val export = spark.read.parquet(TextAnalysis.tokenizedExportPath(Sf0001))
    val total = export.agg(sum("n_tokens_after")).head().getLong(0)
    assert(total === out.map(_.getAs[Long]("tokens_after")).sum)
  }

  test("q100 greedy fuse: overlapping runs pair left-to-right, fused symbols don't re-match") {
    import spark.implicits._
    // "a a a a" with merge (a,a) must become [a?a, a?a], not [a?a?a, a]
    val docs = Seq("a a a a", "b c b c").toDF("text")
    val fused = "a" + TextAnalysis.MergeJoiner + "a"
    val out = docs.select(split(col("text"), " ").as("t"))
      .select(expr(
        s"""aggregate(t, cast(array() as array<string>), (acc, x) ->
           |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = 'a' AND x = 'a'
           |       THEN concat(slice(acc, 1, size(acc) - 1), array('$fused'))
           |       ELSE concat(acc, array(x)) END)""".stripMargin).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq(fused, fused))
    assert(out(1) === Seq("b", "c", "b", "c"))
  }

  test("q150 lexical diversity: matches a driver-side Simpson replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .filter(_._2 != null)
    val got = operators.TextAnalysis.lexicalDiversity(spark, Sf0001).collect()
    assert(got.length === docs.length)
    val byId = docs.toMap
    got.foreach { r =>
      val toks = byId(r.getLong(0)).split(" ", -1)
      val counts = toks.groupBy(identity).values.map(_.length.toLong)
      val n = toks.length.toLong
      val s2 = counts.map(c => BigInt(c) * BigInt(c)).sum
      assert(r.getLong(1) === n, r)
      assert(r.getLong(2) === counts.size.toLong, r)
      val simpson = (BigDecimal(BigInt(n) * BigInt(n) - s2)
        / BigDecimal(BigInt(n) * BigInt(n)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === simpson, s"simpson $r")
      assert(r.getBoolean(4) === (simpson < 0.5), r)
    }
    // natural text at these lengths is diverse: most docs pass the cut
    assert(got.count(!_.getBoolean(4)) > got.length / 2)
  }

  test("q158 vocab growth: matches a driver-side prefix replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .filter(_._2 != null).sortBy(_._1)
    val n = docs.length.toLong
    val got = operators.TextAnalysis.vocabGrowth(spark, Sf0001).collect()
    assert(got.map(_.getInt(0)).toSeq === (1 to 10))
    got.foreach { r =>
      val k = r.getInt(0)
      val nd = ((k * n + 9) / 10).toInt
      val prefix = docs.take(nd)
      val toks = prefix.flatMap(_._2.split(" ", -1))
      assert(r.getLong(1) === nd.toLong, s"n_docs $r")
      assert(r.getLong(2) === toks.length.toLong, s"cum_tokens $r")
      assert(r.getLong(3) === toks.distinct.length.toLong, s"vocab $r")
    }
    // growth curves are monotone and sublinear at the tail: the last
    // decile adds fewer new types than the first
    val vocabs = got.map(_.getLong(3))
    assert(vocabs.zip(vocabs.tail).forall { case (a, b) => b >= a })
    assert(vocabs(9) - vocabs(8) < vocabs(0))
  }

  test("q163 Zipf audit: matches a driver-side rank-frequency replay") {
    import spark.implicits._
    val freqs = Tables.documents(spark, Sf0001)
      .select($"text").as[String].collect().filter(_ != null)
      .flatMap(_.split(" ", -1))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, f) => (-f, t) }
    val top = freqs.take(50)
    val f1 = top.head._2
    val got = operators.TextAnalysis.zipfDeviation(spark, Sf0001).collect()
    assert(got.length === math.min(50, freqs.length))
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) === i + 1, r)
      assert(r.getString(1) === top(i)._1, s"token $r")
      assert(r.getLong(2) === top(i)._2, s"freq $r")
      val ratio = (BigDecimal(BigInt(i + 1) * top(i)._2) / BigDecimal(f1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === ratio, s"zipf_ratio $r")
    }
    // rank 1 always scores exactly 1 by construction
    assert(got.head.getDouble(3) === 1.0)
  }

  test("q180 KWIC concordance: matches a driver-side window replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .filter(_._2 != null)
    val term = operators.TextAnalysis.KwicTerm
    val rad = operators.TextAnalysis.KwicRadius
    val expected = docs.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      t.zipWithIndex.collect { case (tok, i) if tok == term =>
        val lo = math.max(i - rad, 0); val hi = math.min(i + rad, t.length - 1)
        (id, (i + 1).toLong, t.slice(lo, hi + 1).mkString(" "))
      }
    }.sortBy(e => (e._1, e._2))
    val got = operators.TextAnalysis.kwicConcordance(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got === expected.toSeq)
    assert(got.nonEmpty, s"term '$term' absent at sf0.001 — degenerate")
    // every context actually contains the term
    got.foreach { case (_, _, ctx) => assert(ctx.split(" ").contains(term)) }
  }
}
