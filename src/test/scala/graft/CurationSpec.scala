package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Training-data curation operators (q71-q74). The DuckDB oracle is
  * the primary correctness gate; these tests pin the semantic
  * invariants the oracle's hash compare can't express.
  */
class CurationSpec extends SparkSuite {

  test("q71 decontamination: flagged docs share a verbatim 8-gram with the eval slice") {
    import spark.implicits._
    val flagged = Curation.decontamination(spark, Sf0001)
    val rows = flagged.collect()
    // every flagged doc is a train doc with a sane fraction
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 25 != 0)
      val frac = r.getAs[Double]("contaminated_frac")
      assert(frac > 0.0 && frac <= 1.0, r)
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_grams"), r)
    }
    // independent witness: brute-force token-8-gram intersection for
    // each flagged doc against the eval slice
    if (rows.nonEmpty) {
      val docs = Tables.documents(spark, Sf0001)
        .select($"doc_id", $"text").as[(Long, String)].collect().toMap
      // split limit -1: Java's split drops trailing empty tokens but
      // Spark's keeps them — the witness must tokenize identically
      def grams(text: String): Set[Seq[String]] =
        text.split(" ", -1).toSeq.sliding(8).filter(_.size == 8).toSet.map((s: Seq[String]) => s)
      val evalGrams = docs.filter(_._1 % 25 == 0).values.flatMap(grams).toSet
      rows.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        val shared = grams(docs(id)).count(evalGrams.contains)
        assert(shared.toLong == r.getAs[Long]("n_contaminated"), s"doc $id")
      }
    }
  }

  test("q72 denylist scrub: removals reconcile with a direct token count") {
    import spark.implicits._
    val res = Curation.denylistScrub(spark, Sf0001).collect()
    assert(res.nonEmpty)
    val direct = Tables.documents(spark, Sf0001)
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1)
      .map { case (src, rows) =>
        src -> rows.map(_._2.split(" ", -1).count(Curation.Denylist.contains)).map(_.toLong).sum
      }
    res.foreach { r =>
      assert(r.getAs[Long]("tokens_removed") == direct(r.getAs[String]("source")), r)
      assert(r.getAs[Long]("docs_affected") <= r.getAs[Long]("n_docs"), r)
    }
  }

  test("q73 repetition: flag threshold is integer-exact at the boundary") {
    val res = Curation.repetitionSignals(spark, Sf0001).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val share = r.getAs[Double]("max_top_share")
      assert(share > 0.0 && share <= 1.0, r)
      // if nothing is flagged, the max share must sit below the 8%
      // threshold (up to the dec6 rounding of the reported max)
      if (r.getAs[Long]("n_flagged") == 0) assert(share < 0.080001, r)
      else assert(share >= 0.08 - 1e-6, r)
    }
  }

  test("wordShingles kernel is bit-equal to the HOF formulation") {
    import spark.implicits._
    import graft.functions.TextFunctions.{tokens, wordShingles}
    val edge = Seq("", "one", "a b", "a  b", "trailing ", " leading",
      "héllo wörld ütf8 déjà vu", "a b c d e f g h i")
      .toDF("text")
    val d = Tables.documents(spark, Sf0001).select("text").unionByName(edge)
      .filter(col("text").isNotNull)
    for (w <- Seq(2, 3, 8)) {
      val toks = tokens(col("text"))
      val hof = when(size(toks) < w, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), size(toks) - w),
          i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
      val bad = d.select(wordShingles(col("text"), w).as("k"), hof.as("h"))
        .filter(!(col("k") <=> col("h"))).count()
      assert(bad === 0, s"w=$w")
    }
  }

  test("kernel SQL surface: graft_word_shingles / graft_top_shingle_stats") {
    Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .createOrReplaceTempView("docs_curation_sql")
    val bad = spark.sql(
      """SELECT count(*) AS bad FROM docs_curation_sql
        |WHERE ((graft_top_shingle_stats(text, 2) IS NULL) !=
        |       (cardinality(graft_word_shingles(text, 2)) = 0))
        |   OR (graft_top_shingle_stats(text, 2) IS NOT NULL AND (
        |        graft_top_shingle_stats(text, 2).total IS DISTINCT FROM
        |          cardinality(graft_word_shingles(text, 2))
        |     OR graft_top_shingle_stats(text, 2).top_c >
        |          graft_top_shingle_stats(text, 2).total))""".stripMargin)
      .head().getLong(0)
    assert(bad === 0)
  }

  test("TopShingleStats kernel equals the explode/groupBy formulation") {
    import spark.implicits._
    import graft.functions.TextFunctions.{topShingleStats, wordShingles}
    // corpus + adversarial shapes: empty, one token, all-same bigrams,
    // tie between two bigrams, trailing space (empty trailing token)
    val edge = Seq("", "one", "a b a b a b", "x y x y z w z w", "pad trail ")
      .toDF("text")
    val d = Tables.documents(spark, Sf0001).select("text").unionByName(edge)
      .withColumn("id", monotonically_increasing_id())
    val viaKernel = d.select($"id", topShingleStats($"text", 2).as("tb"))
      .filter($"tb".isNotNull)
      .select($"id", $"tb.top_c".as("top_c"), $"tb.total".as("total"))
    val viaExplode = d
      .select($"id", explode(wordShingles($"text", 2)).as("gram"))
      .groupBy($"id", $"gram").agg(count(lit(1)).as("c"))
      .groupBy($"id").agg(max($"c").as("top_c"), sum($"c").as("total"))
    assert(viaKernel.exceptAll(viaExplode).count() === 0)
    assert(viaExplode.exceptAll(viaKernel).count() === 0)
  }

  test("q87 pipeline: stage funnel is monotone and tokens reconcile") {
    import spark.implicits._
    val bins = Curation.curationPipeline(spark, Sf0001).collect()
    assert(bins.nonEmpty)
    // recompute the surviving doc set stage by stage, independently
    val docs = Tables.documents(spark, Sf0001)
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select($"doc_id", $"source", $"lang", $"text").as[(Long, String, String, String)]
      .collect()
    val deduped = docs.groupBy(_._4).map { case (_, g) => g.minBy(_._1) }.toSeq
    val survivors = deduped
      .map { case (id, src, lang, text) =>
        (id, src, lang, text.split(" ", -1).count(t => !Curation.Denylist.contains(t)).toLong)
      }
      .filter(_._4 >= 20)
      .filter { case (id, _, lang, _) =>
        ((id % 2147483648L) * 2654435761L) % 4294967296L % 100 <
          (if (lang == "en") 60 else 20)
      }
    assert(bins.map(_.getAs[Long]("n_docs")).sum === survivors.size.toLong)
    assert(bins.map(_.getAs[Long]("bin_tokens")).sum === survivors.map(_._4).sum)
  }

  test("q89 rarity: bounded below by 1 and token counts reconcile") {
    import spark.implicits._
    val res = Curation.tokenRarity(spark, Sf0001).collect()
    assert(res.nonEmpty)
    // rarity = N/tf >= 1 for every token, so the mean is >= 1
    res.foreach(r => assert(r.getAs[Double]("avg_rarity") >= 1.0, r))
    val direct = Tables.documents(spark, Sf0001)
      .filter($"doc_id" < 20)
      .select($"doc_id", size(split($"text", " ")).cast("bigint").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    res.foreach(r =>
      assert(r.getAs[Long]("n_tokens") === direct(r.getAs[Long]("doc_id")), r))
  }

  test("q92 redaction: counts reconcile with a driver-side regex sweep") {
    import spark.implicits._
    val bySource = Curation.regexRedaction(spark, Sf0001).collect()
    val docs = Tables.documents(spark, Sf0001)
      .select($"source", $"text").as[(String, String)].collect()
    val re = Curation.RedactPattern.r
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val hits = rows.map(r => re.findAllIn(r._2).length)
      src -> (rows.length.toLong, hits.count(_ > 0).toLong, hits.map(_.toLong).sum)
    }
    assert(bySource.length === expected.size)
    bySource.foreach { r =>
      val (nDocs, nRed, nHits) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === nDocs)
      assert(r.getAs[Long]("docs_redacted") === nRed)
      assert(r.getAs[Long]("n_redactions") === nHits)
      // every redacted match is >= 6 chars replaced by a 5-char token
      assert(r.getAs[Long]("chars_saved") >= r.getAs[Long]("n_redactions"))
    }
  }

  test("q93 mixture: full-rate sources keep everything, nothing upsampled, membership deterministic") {
    val out = Curation.mixtureResample(spark, Sf0001).collect()
    // recompute the max ratio the operator normalizes by — a source keeps
    // 100% iff its keep-rate is >= 1, i.e. w_s * n_max >= w_max * n_s
    // (with equal-size sources that is every heavy source, but the
    // contract is the RATIO, not the weight — an upweighted source larger
    // than the max-ratio one sheds rows)
    val wn = out.map(r => (r.getAs[Long]("target_w"), r.getAs[Long]("n_source")))
    val (wMax, nMax) = wn.maxBy { case (w, n) => w.toDouble / n }
    out.foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      val n = r.getAs[Long]("n_source")
      val w = r.getAs[Long]("target_w")
      assert(kept <= n, r) // downsampling only
      if (w * nMax >= wMax * n) assert(kept === n, s"rate>=1 source must keep all: $r")
      if (Curation.HeavySources.contains(r.getAs[String]("source")))
        assert(w === 4L, r)
      else assert(w === 1L, r)
    }
    // deterministic: a second run selects the identical per-source counts
    val again = Curation.mixtureResample(spark, Sf0001).collect()
    assert(out.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
    // pinned NUMBERS at sf0.001 (the q30-honesty discipline): the three
    // heavy sources (w=4) keep all 25 docs at kept_frac exactly 1.0;
    // every light source keeps 5-8 of 25 (the 4:1 target mixture over
    // equal-size sources => nominal 25% light keep-rate, +/- md5-bucket
    // granularity), total kept = 180 of 500
    val bySrc = out.map(r => r.getAs[String]("source") ->
      (r.getAs[Long]("n_kept"), r.getAs[Double]("kept_frac"))).toMap
    Curation.HeavySources.foreach { s =>
      assert(bySrc(s) === ((25L, 1.0)), s"$s: ${bySrc(s)}")
    }
    val lightKept = bySrc.view.filterKeys(!Curation.HeavySources.contains(_)).values.map(_._1)
    assert(lightKept.forall(k => k >= 5L && k <= 8L), bySrc)
    assert(out.map(_.getAs[Long]("n_kept")).sum === 180L)
  }

  test("q94 budget selection matches the literal single-window formulation") {
    import org.apache.spark.sql.expressions.Window
    // small budget so the boundary binds at sf0.001 (total ~2.7k tokens)
    val budget = 1500L
    val got = Curation.budgetedSelectionAt(spark, Sf0001, budget)
    val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("n_chars"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= budget)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("n_tokens")).cast("bigint").as("sel_tokens"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // and the selection actually binds: selected tokens within budget,
    // adding the next-best doc would exceed it
    val selTok = got.agg(sum(col("sel_tokens"))).head().getLong(0)
    assert(selTok <= budget)
  }

  test("q74 packing: bins are contiguous per source and conserve every token") {
    val bins = Curation.sequencePacking(spark, Sf0001).collect()
    val total = bins.map(_.getAs[Long]("bin_tokens")).sum
    val expected = Tables.documents(spark, Sf0001)
      .select(sum(size(split(col("text"), " ")).cast("bigint")))
      .collect()(0).getLong(0)
    assert(total == expected, s"packed $total of $expected tokens")
    bins.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val ids = rows.map(_.getAs[Long]("bin")).sorted
      assert(ids.head == 0L, src)
      assert(ids.zipWithIndex.forall { case (b, i) => b == i.toLong }, src)
      // doc ranges of consecutive bins do not overlap
      val sorted = rows.sortBy(_.getAs[Long]("bin"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"), src)
        case _ =>
      }
    }
  }

  test("q101 dup spans: brute-force witness on a handcrafted corpus") {
    import spark.implicits._
    val k = Curation.DupSpanMinTokens
    // crafted shapes: a 10-token span shared across docs 1/2 (at
    // different positions), an internal repeat within doc 3, a clean
    // doc 4, a doc 5 shorter than k, a NULL doc 6
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // 10-token boilerplate
    val corpus = Seq(
      (1L, s"u1 u2 $boiler u3 u4"),
      (2L, s"v1 $boiler"),
      (3L, s"w1 $boiler w2 w3 $boiler"),
      (4L, (1 to 20).map(i => s"c$i").mkString(" ")),
      (5L, "s1 s2 s3"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Curation.dupSpansOn(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // independent brute force: plain Scala collections, no Spark
    val docs = Seq(
      1L -> s"u1 u2 $boiler u3 u4", 2L -> s"v1 $boiler",
      3L -> s"w1 $boiler w2 w3 $boiler",
      4L -> (1 to 20).map(i => s"c$i").mkString(" "), 5L -> "s1 s2 s3")
      .map { case (id, t) => id -> t.split(" ", -1).toVector }
    val gramCounts = scala.collection.mutable.Map.empty[Seq[String], Int].withDefaultValue(0)
    docs.foreach { case (_, t) => t.sliding(k).filter(_.length == k).foreach(g => gramCounts(g) += 1) }
    val expected = docs.flatMap { case (id, t) =>
      val marked = (0 to t.length - k).filter(p => gramCounts(t.slice(p, p + k)) >= 2)
      if (marked.isEmpty) None
      else {
        // maximal runs of consecutive marked positions
        val runs = marked.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
          case (acc, p) => (p, p) :: acc
        }.map { case (s, e) => e - s + k }
        Some(id -> ((t.length.toLong, runs.length.toLong,
          runs.map(_.toLong).sum, runs.map(_.toLong).max)))
      }
    }.toMap
    assert(got === expected, s"got $got expected $expected")
    // and the crafted shapes behave as designed
    assert(got.contains(1L) && got.contains(2L) && got.contains(3L))
    assert(!got.contains(4L) && !got.contains(5L) && !got.contains(6L))
    // doc 2's only span is the boilerplate: 10 tokens
    assert(got(2L)._4 === 10L)
    // doc 3 (23 tokens) repeats the boilerplate twice -> 2 spans of 10
    assert(got(3L) === ((23L, 2L, 20L, 10L)))
  }

  test("q103 span scrub: keeps the globally-first occurrence, removes the rest") {
    // q101/q103 consistency at sf0.001: every scrubbed doc carries
    // spans, never loses more than q101 flagged, and keeps >= 0 tokens
    val flagged = Curation.dupSpans(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("dup_tokens")).toMap
    val scrubbed = Curation.spanScrub(spark, Sf0001).collect()
    assert(scrubbed.nonEmpty)
    scrubbed.foreach { r =>
      val id = r.getLong(0)
      assert(flagged.contains(id), s"scrubbed doc $id not flagged by q101")
      assert(r.getAs[Long]("removed_tokens") <= flagged(id), r)
      assert(r.getAs[Long]("kept_tokens") >= 0L, r)
      assert(r.getAs[Long]("kept_tokens") ===
        r.getAs[Long]("n_tokens") - r.getAs[Long]("removed_tokens"), r)
    }
    // handcrafted shapes: the boilerplate's first occurrence lives in
    // doc 1 (span_start 3), so doc 1 keeps everything while doc 2
    // loses its whole copy and doc 3 loses both of its copies
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, s"u1 u2 $boiler u3 u4"), (2L, s"v1 $boiler"),
      (3L, s"w1 $boiler w2 w3 $boiler")).toDF("doc_id", "text")
    val crafted = Curation.spanScrubOn(corpus).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed_spans"), r.getAs[Long]("removed_tokens"),
        r.getAs[Long]("kept_tokens"))).toMap
    assert(!crafted.contains(1L), s"keeper doc scrubbed: $crafted")
    assert(crafted(2L) === ((11L, 1L, 10L, 1L)), crafted)
    assert(crafted(3L) === ((23L, 2L, 20L, 3L)), crafted)
  }

  test("q111 batches match the literal single-window formulation; shape invariants hold") {
    import org.apache.spark.sql.expressions.Window
    val got = Curation.trainingBatches(spark, Sf0001)
    // literal twin: one global window in (shuffle-key, doc_id) order
    val key = ((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L)
    val expected = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"), key.as("k"))
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("k"), col("doc_id"))).cast("bigint") - 1)
      .withColumn("batch_id", floor(col("rnk") / Curation.BatchDocs).cast("bigint"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("batch_tokens"),
        count_distinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("min_doc"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // shape: contiguous batch ids, every batch full except possibly the
    // last, token conservation, and the shuffle actually mixes sources
    val rows = got.collect()
    val n = Tables.documents(spark, Sf0001).filter(col("text").isNotNull).count()
    assert(rows.map(_.getLong(0)).toSeq === (0L until rows.length).toSeq)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === n)
    rows.dropRight(1).foreach(r =>
      assert(r.getAs[Long]("n_docs") === Curation.BatchDocs.toLong, r))
    assert(rows.exists(_.getAs[Long]("n_sources") > 1L),
      "no batch mixes sources — shuffle key not permuting?")
  }

  test("q114: no duplicated 8-gram straddles a split; docs partition exactly") {
    import spark.implicits._
    val asg = Curation.leakageSplitAssignments(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val docs = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(asg.keySet === docs.map(_._1).toSet)
    assert(asg.values.forall(Set("train", "valid", "test")))
    // brute-force leakage witness: every 8-gram held by >= 2 docs has
    // ALL its holders in one split (split limit -1: tokenize like Spark)
    val byGram = scala.collection.mutable.Map
      .empty[Seq[String], scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, text) =>
      text.split(" ", -1).toSeq.sliding(8).filter(_.length == 8)
        .foreach { g =>
          byGram.getOrElseUpdate(g, scala.collection.mutable.Set.empty) += id
        }
    }
    val shared = byGram.values.filter(_.size >= 2).toSeq
    assert(shared.nonEmpty, "no cross-doc shared grams at sf0.001 — corpus changed?")
    shared.foreach { ids =>
      assert(ids.map(asg).size === 1, s"gram straddles splits: docs $ids")
    }
    // the aggregate view q114 exports is consistent with the assignments
    val agg = Curation.leakageSplit(spark, Sf0001).collect()
    assert(agg.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    val bySplit = asg.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    agg.foreach(r =>
      assert(r.getAs[Long]("n_docs") === bySplit(r.getAs[String]("split")), r))
  }

  test("q115 source overlap matches a brute-force per-source gram-set intersection") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .select($"source", $"text").as[(String, String)].collect()
    val bySource: Map[String, Set[Seq[String]]] = docs.groupBy(_._1).view
      .mapValues(_.flatMap { case (_, text) =>
        text.split(" ", -1).toSeq.sliding(8).filter(_.length == 8)
      }.toSet).toMap
    val expected = bySource.keys.toSeq.sorted.combinations(2).map { case Seq(a, b) =>
      (a, b, (bySource(a) & bySource(b)).size.toLong,
        bySource(a).size.toLong, bySource(b).size.toLong)
    }.filter(_._3 >= 1).toSeq
    val got = Curation.sourceOverlap(spark, Sf0001).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expected, "pair counts diverge from brute force")
    assert(expected.nonEmpty, "no cross-source shared grams at sf0.001 — corpus changed?")
  }

  test("q116 calibrated quality: per-source top-20% quota exact, threshold maximal") {
    import spark.implicits._
    val scores = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .select($"source", $"text").as[(String, String)].collect()
      .map { case (s, text) =>
        val toks = text.split(" ", -1)
        val score = toks.distinct.length.toLong * 1000L / toks.length
        (s, score, toks.length.toLong)
      }
    val rows = Curation.calibratedQuality(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === scores.map(_._1).toSet)
    rows.foreach { r =>
      val (src, nDocs, t, nKept, keptTok) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val mine = scores.filter(_._1 == src)
      assert(nDocs === mine.length.toLong, src)
      val kept = mine.filter(_._2 >= t)
      assert(nKept === kept.length.toLong, s"$src kept-count")
      assert(keptTok === kept.map(_._3).sum, s"$src kept-tokens")
      assert(nKept * 5 >= nDocs, s"$src quota missed")
      // maximality: the strictly-higher cut falls short of the quota
      assert(mine.count(_._2 > t).toLong * 5 < nDocs, s"$src threshold not maximal")
    }
  }

  test("q118 length batching: ledger matches brute force; tokens conserved") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
      .map { case (id, src, text) => (id, src, text.split(" ", -1).length.toLong) }
    val expected = docs
      .map { case (id, src, n) => (src, (n - 1) / Curation.BandTokens, id, n) }
      .groupBy { case (src, b, _, _) => (src, b) }
      .map { case ((src, b), members) =>
        val batches = members.sortBy(_._3).grouped(Curation.PadBatchDocs).toSeq
        val nDocs = members.length.toLong
        val tokens = members.map(_._4).sum
        val padded = batches.map(g => g.length.toLong * g.map(_._4).max).sum
        (src, b, nDocs, batches.length.toLong, tokens, padded)
      }.toSet
    val rows = Curation.lengthBucketBatches(spark, Sf0001).collect()
    val got = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === expected)
    // conservation + ceil-batch-count + waste sanity on the exported frame
    assert(rows.map(_.getLong(4)).sum === docs.map(_._3).sum)
    rows.foreach { r =>
      val (nd, nb) = (r.getLong(2), r.getLong(3))
      assert(nb === (nd + Curation.PadBatchDocs - 1) / Curation.PadBatchDocs, r)
      val wf = r.getDouble(6)
      assert(wf >= 0.0 && wf < 1.0, r)
    }
  }

  test("q112 rule battery: funnel arithmetic consistent and every rule discriminates") {
    val rows = Curation.gopherRules(spark, Sf0001).collect()
    val rules = Seq("pass_wordcount", "pass_wordlen", "pass_stopcount",
      "pass_stopratio", "pass_ttr")
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      rules.foreach { c =>
        assert(r.getAs[Long](c) >= 0L && r.getAs[Long](c) <= nDocs, s"$c in $r")
        assert(r.getAs[Long]("pass_all") <= r.getAs[Long](c), s"pass_all > $c in $r")
      }
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull).count())
    // thresholds were probed to split the corpus: corpus-wide, every
    // rule passes some docs and fails some docs
    rules.foreach { c =>
      val passed = rows.map(_.getAs[Long](c)).sum
      assert(passed > 0L && passed < total, s"$c does not discriminate: $passed/$total")
    }
  }

  test("q119 minhash overlap: full pair matrix, estimator tracks exact jaccard") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .select($"source", $"text").as[(String, String)].collect()
    val bySource: Map[String, Set[Seq[String]]] = docs.groupBy(_._1).view
      .mapValues(_.flatMap { case (_, text) =>
        text.split(" ", -1).toSeq.sliding(8).filter(_.length == 8)
      }.toSet).toMap
    val withGrams = bySource.filter(_._2.nonEmpty).keys.toSeq.sorted
    val exact: Map[(String, String), Double] =
      withGrams.combinations(2).map { case Seq(a, b) =>
        val inter = (bySource(a) & bySource(b)).size.toDouble
        (a, b) -> inter / (bySource(a).size + bySource(b).size - inter)
      }.toMap
    val rows = Curation.sourceOverlapMinHash(spark, Sf0001).collect()
    // every source pair appears exactly once — a zero estimate is a row
    assert(rows.length === withGrams.combinations(2).size, "pair matrix incomplete")
    rows.foreach { r =>
      val m = r.getAs[Long]("matching_perms")
      assert(m >= 0L && m <= Curation.OverlapPerms.toLong, r)
      assert(r.getAs[Double]("est_jaccard") === m.toDouble / Curation.OverlapPerms, r)
    }
    // estimator quality: mean |est - exact| across all pairs within the
    // MinHash sampling band for 32 permutations (per-pair sd ~ sqrt(J/32))
    val errs = rows.map { r =>
      val key = (r.getString(0), r.getString(1))
      math.abs(r.getAs[Double]("est_jaccard") - exact.getOrElse(key, 0.0))
    }
    assert(errs.sum / errs.length <= 0.08,
      f"mean estimator error ${errs.sum / errs.length}%.4f too large")
  }

  test("q122 snapshot diff matches a brute-force two-version comparison") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
    val old = docs.filter(_._1 % 17 != 3).map { case (id, s, t) => id -> (s, t) }.toMap
    val neu = docs.filter(_._1 % 13 != 5).map { case (id, s, t) =>
      id -> (s, if (id % 11 == 7) t + " [rev2]" else t)
    }.toMap
    val expected = (old.keySet ++ neu.keySet).toSeq.map { id =>
      val status =
        if (!old.contains(id)) "added"
        else if (!neu.contains(id)) "removed"
        else if (old(id)._2 == neu(id)._2) "unchanged"
        else "changed"
      (neu.get(id).orElse(old.get(id)).get._1, status, id)
    }.groupBy { case (s, st, _) => (s, st) }
      .map { case ((s, st), g) =>
        (s, st, g.length.toLong, g.map(_._3).min, g.map(_._3).max) }
      .toSet
    val got = Curation.snapshotDiff(spark, Sf0001).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    // the synthetic revision markers actually exercise every status
    assert(got.map(_._2) === Set("added", "removed", "changed", "unchanged"))
  }

  test("q126 version drift matches an exact brute-force two-snapshot recomputation") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
    val old = docs.filter(_._1 % 17 != 3)
      .map { case (_, s, t) => (s, t.split(" ", -1).toSeq) }
    val neu = docs.filter(_._1 % 13 != 5)
      .map { case (id, s, t) =>
        (s, (if (id % 11 == 7) t + " [rev2]" else t).split(" ", -1).toSeq) }
    val vocab = old.flatMap(_._2).groupBy(identity).view.mapValues(_.length)
      .toSeq.sortBy { case (tok, c) => (-c, tok) }
      .take(Curation.AnomalyVocab).map(_._1).toSet
    val sources = (old.map(_._1) ++ neu.map(_._1)).distinct.sorted
    val expected = sources.flatMap { s =>
      val ot = old.filter(_._1 == s).flatMap(_._2)
      val nt = neu.filter(_._1 == s).flatMap(_._2)
      val (no, nn) = (ot.length.toLong, nt.length.toLong)
      val l1 = vocab.toSeq.map { v =>
        math.abs(nt.count(_ == v).toLong * no - ot.count(_ == v).toLong * nn)
      }.sum
      // sources present in both snapshots only (inner-join semantics);
      // the synthetic slices keep every source on both sides
      if (no == 0 || nn == 0) None
      else Some((s, old.count(_._1 == s).toLong, neu.count(_._1 == s).toLong,
        no, nn, l1,
        BigDecimal(l1)./(BigDecimal(2L * no * nn))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = Curation.versionDrift(spark, Sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6))).toSeq
    assert(got === expected)
    // the revision markers actually move at least one distribution
    assert(got.exists(_._6 > 0L), "all drifts zero — revision slice inert?")
  }

  test("q129 pagerank matches a brute-force fixed-point iteration replay") {
    import spark.implicits._
    val pairs = Curation.dupStarPairs(spark, Sf0001)
      .as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "no dup-graph edges at sf0.001 — corpus changed?")
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r: Map[Long, Long] = outdeg.keys.map(_ -> 1000000L).toMap
    (1 to Curation.PrIters).foreach { _ =>
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => r(src) / outdeg(src) }.sum).toMap
      r = r.keys.map(n => n -> (150000L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    val expected = r.toSeq.map { case (n, rk) => (n, outdeg(n), rk) }
      .sortBy { case (n, _, rk) => (-rk, n) }.take(20)
    val got = Curation.dupPagerank(spark, Sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSeq
    assert(got === expected)
    // mass sanity: every rank >= the teleport floor, hubs above it
    assert(got.forall(_._3 >= 150000L))
    assert(got.head._3 > 150000L, "no node accumulated rank — graph degenerate?")
  }

  test("q130 co-occurrence lift matches a brute-force pair enumeration") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1).distinct.toSet }
    val df = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (tok, c) => (-c, tok) }
      .take(Curation.AnomalyVocab).toMap
    val n = docs.length.toLong
    val expected = df.keys.toSeq.sorted.combinations(2).map { case Seq(x, y) =>
      val cxy = docs.count { case (_, ts) => ts(x) && ts(y) }.toLong
      (x, y, cxy, df(x), df(y),
        BigDecimal(cxy * n)./(BigDecimal(df(x) * df(y)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.filter(_._3 >= Curation.CoocMinSupport).toSeq
      .sortBy { case (x, y, _, _, _, l) => (-l, x, y) }.take(20)
    val got = Curation.tokenCooccurrence(spark, Sf0001).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expected)
    // the statistic discriminates: both positive and negative association
    assert(got.head._6 > 1.0, "no positively associated pair in top-20")
  }

  test("q131 proportional allocation: exact budget, Hamilton quotas, quota filled") {
    import spark.implicits._
    val counts = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum
    val budget = 2L * n / 5L
    val base = counts.view.mapValues(c => budget * c / n).toMap
    val deficit = budget - base.values.sum
    val seats = counts.keys.toSeq
      .sortBy(s => (-(budget * counts(s) % n), s)).take(deficit.toInt).toSet
    val expectedQuota = counts.keys.map(s =>
      s -> (base(s) + (if (seats(s)) 1L else 0L))).toMap
    val rows = Curation.proportionalSample(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === counts.keySet)
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) === counts(s), s"$s n_docs")
      assert(r.getLong(2) === expectedQuota(s), s"$s quota")
      // every quota is fillable (quota <= n_docs) and actually filled
      assert(r.getLong(2) <= r.getLong(1), s"$s overfilled")
      assert(r.getLong(3) === r.getLong(2), s"$s picked != quota")
    }
    // the arithmetic identity the operator exists for
    assert(rows.map(_.getLong(2)).sum === budget)
    assert(deficit >= 0 && deficit < counts.size.toLong)
  }

  test("q120 distribution anomaly matches an exact brute-force recomputation") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
      .map { case (id, src, text) => (id, src, text.split(" ", -1).toSeq) }
    val corpus = docs.flatMap(_._3)
    val n = corpus.length.toLong
    val vocab: Seq[(String, Long)] = corpus.groupBy(identity).view
      .mapValues(_.length.toLong).toSeq
      .sortBy { case (tok, tf) => (-tf, tok) }.take(Curation.AnomalyVocab)
    val tf = vocab.toMap
    val t = vocab.map(_._2).sum
    val expected = docs.map { case (id, src, toks) =>
      val len = toks.length.toLong
      val score = vocab.map { case (v, f) =>
        math.abs(toks.count(_ == v).toLong * n - len * f)
      }.sum
      val anomaly = BigDecimal(score)
        .setScale(0)./(BigDecimal(2L * n * len))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, src, len, score, anomaly)
    }.sortBy { case (id, _, _, _, a) => (-a, id) }.take(20).toSeq
    val got = Curation.distributionalAnomaly(spark, Sf0001).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // sf0.001's synthetic corpus has < 64 distinct tokens, so the vocab
    // saturates at the full type inventory — still a valid background
    assert(tf.size === math.min(Curation.AnomalyVocab, corpus.distinct.length)
      && t > 0L, "vocab degenerate")
  }

  test("q140 dup triangles: matches a brute-force driver-side census") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .filter(_._2 != null)
    val grams = docs.flatMap { case (id, t) =>
      t.split(' ').sliding(8).withFilter(_.length == 8)
        .map(g => (id, g.mkString(" "))).toSeq.distinct
    }
    val edges = grams.groupBy(_._2).values
      .filter(g => g.size >= 2 && g.size <= Curation.TriangleMaxPostings)
      .flatMap { g =>
        val ids = g.map(_._1).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val deg = nodes.toSeq.map(n =>
      edges.count(e => e._1 == n || e._2 == n).toLong)
    val wedges = deg.map(d => d * (d - 1) / 2).sum
    val tris = (for {
      (a, b) <- edges.toSeq; (b2, c) <- edges.toSeq
      if b2 == b && edges((a, c))
    } yield (a, b, c)).size.toLong
    val r = Curation.dupTriangles(spark, Sf0001).head()
    assert(r.getLong(0) === nodes.size.toLong, "n_nodes")
    assert(r.getLong(1) === edges.size.toLong, "n_edges")
    assert(r.getLong(2) === tris, "n_triangles")
    assert(r.getLong(3) === wedges, "n_wedges")
    assert(tris > 0, "no triangles at sf0.001 — transitivity test degenerate")
    assert(r.getDouble(4) ===
      BigDecimal(3 * tris).setScale(6)./(BigDecimal(wedges))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q142 PPS sample: matches a driver-side systematic selection replay") {
    import spark.implicits._
    val orders = Tables.orders(spark, Sf0001)
      .select($"o_orderkey", $"o_totalprice").as[(Long, Double)].collect()
    def cents(d: Double): Long =
      BigDecimal.valueOf(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact
    def sk(id: Long): Long = ((id % 2147483648L) * 2654435761L) % 4294967296L
    val line = orders.map { case (k, p) => (sk(k), k, cents(p)) }
      .sortBy(t => (t._1, t._2))
    val total = line.map(_._3).sum
    val step = math.max(1L, total / Curation.PpsSampleTarget)
    var cum = 0L
    val expected = line.flatMap { case (_, k, w) =>
      val hits = (cum + w) / step - cum / step
      cum += w
      if (hits > 0) Some((k, w, hits)) else None
    }.sortBy(_._1).toSeq
    val got = Curation.ppsSample(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // exactly floor(W / step) selection points land on items
    assert(got.map(_._3).sum === total / step)
    // inclusion is size-biased: every selected item outweighs the
    // smallest unselected one... only guaranteed in aggregate, so pin
    // the weaker truth: any item heavier than step is ALWAYS selected
    val sel = got.map(_._1).toSet
    orders.filter(o => cents(o._2) > step)
      .foreach(o => assert(sel(o._1), s"heavy item ${o._1} missed"))
  }

  test("q149 RAG chunking: matches a driver-side chunker replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)]
      .collect().filter(_._3 != null)
    val w = Curation.ChunkTokens; val s = Curation.ChunkStride
    val chunks = docs.flatMap { case (_, src, text) =>
      val toks = text.split(" ", -1)
      val n = toks.length
      val k = (math.max(n - w, 0) + s - 1) / s
      (0 to k).map { i =>
        val st = i * s
        (src, toks.slice(st, st + w).mkString(" "), math.min(w, n - st))
      }
    }
    val expected = chunks.groupBy(_._1).map { case (src, cs) =>
      (src, docs.count(_._2 == src).toLong, cs.length.toLong,
        cs.map(_._2).distinct.length.toLong,
        (BigDecimal(cs.map(_._3).sum) / cs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Curation.ragChunking(spark, Sf0001).collect()
    assert(got.map(_.getString(0)).toSet === expected.map(_._1).toSet)
    got.foreach { r =>
      val e = expected.find(_._1 == r.getString(0)).get
      assert(r.getLong(1) === e._2, s"n_docs $r")
      assert(r.getLong(2) === e._3, s"n_chunks $r")
      assert(r.getLong(3) === e._4, s"distinct_chunks $r")
      assert(r.getDouble(5) === e._5, s"avg_chunk_tokens $r")
      // every doc yields at least one chunk
      assert(r.getLong(2) >= r.getLong(1), r)
    }
  }

  test("q151 importance weights: matches a driver-side hashed-bucket replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)]
      .collect().filter(_._3 != null)
    def bucket(tok: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .take(1).map(b => f"$b%02x").mkString
    val toks = docs.flatMap { case (id, lang, text) =>
      text.split(" ", -1).map(t => (id, lang, bucket(t)))
    }
    val tc = toks.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val rc = toks.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val tN = toks.count(_._2 == "en").toLong
    val rN = toks.length.toLong
    val wts = rc.keys.map { b =>
      b -> (BigDecimal(BigInt(tc.getOrElse(b, 0L) + 1) * BigInt(rN))
        / BigDecimal(BigInt(rc(b) + 1) * BigInt(tN)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.toMap
    val got = Curation.importanceWeights(spark, Sf0001).collect()
    assert(got.length === docs.length)
    val enScores = scala.collection.mutable.ArrayBuffer.empty[Double]
    val otherScores = scala.collection.mutable.ArrayBuffer.empty[Double]
    got.foreach { r =>
      val (id, lang, _) = docs.find(_._1 == r.getLong(0)).get
      val myToks = toks.filter(_._1 == id)
      val score = (myToks.groupBy(_._3).map { case (b, ts) =>
        wts(b) * ts.length
      }.sum / myToks.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getLong(2) === myToks.length.toLong, s"n_tokens $r")
      assert(r.getBoolean(3) === (lang == "en"), r)
      assert(r.getDouble(4) === score, s"importance $r")
      if (lang == "en") enScores += score else otherScores += score
    }
    // the weighting separates the slices: target docs score higher on average
    assert(enScores.sum / enScores.size > otherScores.sum / otherScores.size)
  }

  test("q160 waterfill: budget exactly spent, max-min fair, matches replay") {
    import spark.implicits._
    val avail = Tables.documents(spark, Sf0001)
      .filter($"text".isNotNull)
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(_._2.split(" ", -1).length.toLong).sum).toMap
    val total = avail.values.sum
    val b = total / 2
    // driver-side water-filling replay (iterative reference algorithm —
    // an INDEPENDENT formulation of the closed form)
    var uncapped = avail.keySet
    var alloc = Map.empty[String, Long]
    var budget = b
    var changed = true
    while (changed) {
      changed = false
      val share = if (uncapped.isEmpty) 0L else budget / uncapped.size
      uncapped.toSeq.sortBy(s => (avail(s), s)).foreach { s =>
        if (avail(s) <= share && uncapped(s)) {
          alloc += s -> avail(s); budget -= avail(s)
          uncapped -= s; changed = true
        }
      }
    }
    val sorted = uncapped.toSeq.sortBy(s => (avail(s), s))
    val base = if (sorted.isEmpty) 0L else budget / sorted.size
    val rem = if (sorted.isEmpty) 0L else budget % sorted.size
    sorted.zipWithIndex.foreach { case (s, i) =>
      alloc += s -> (base + (if (i < rem) 1L else 0L))
    }
    val got = Curation.waterfillMixture(spark, Sf0001).collect()
    assert(got.map(_.getString(0)).toSet === avail.keySet)
    assert(got.map(_.getLong(2)).sum === b, "budget not exactly spent")
    got.foreach { r =>
      assert(r.getLong(1) === avail(r.getString(0)), s"avail $r")
      assert(r.getLong(2) === alloc(r.getString(0)), s"allocated $r")
      assert(r.getLong(2) <= r.getLong(1), s"over-allocated $r")
    }
    // max-min fairness: every capped source is fully taken, and no
    // capped source has more availability than any uncapped allocation
    val capped = got.filter(_.getBoolean(3))
    val uncappedAlloc = got.filter(!_.getBoolean(3)).map(_.getLong(2))
    capped.foreach(r => assert(r.getLong(2) === r.getLong(1), r))
    if (uncappedAlloc.nonEmpty)
      capped.foreach(r => assert(r.getLong(1) <= uncappedAlloc.max + 1, r))
  }

  test("q179 containment matrix: matches a driver-side gram replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)]
      .collect()
    def grams(text: String): Set[String] =
      text.split(" ", -1).sliding(8).filter(_.length == 8)
        .map(_.mkString(" ")).toSet
    val evalGrams = docs.filter(_._1 % 25 == 0).flatMap(d => grams(d._3)).toSet
    val bySource = docs.filter(_._1 % 25 != 0).groupBy(_._2).view
      .mapValues(_.flatMap(d => grams(d._3)).toSet).toMap
    val got = Curation.containmentMatrix(spark, Sf0001).collect()
    assert(got.map(_.getString(0)).toSet === bySource.keySet)
    got.foreach { r =>
      val hits = bySource(r.getString(0)).intersect(evalGrams).size.toLong
      assert(r.getLong(1) === evalGrams.size.toLong, r)
      assert(r.getLong(2) === hits, s"hits $r")
      val c = (BigDecimal(hits) / BigDecimal(evalGrams.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === c, s"containment $r")
    }
    // the duplicated synthetic slices guarantee SOME containment
    assert(got.exists(_.getLong(2) > 0), "no containment anywhere — degenerate")
  }

  test("q183 bigram surprisal: matches a driver-side LM replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)]
      .collect().toSeq
    def toks(t: String): Seq[String] = t.split(" ", -1).toSeq
    // replay: vocab -> <unk> fold -> bigram/left counts -> micro scores
    val freq = docs.flatMap(d => toks(d._3)).groupBy(identity)
      .view.mapValues(_.size).toSeq
    val vocab = freq.sortBy { case (t, c) => (-c, t) }
      .take(Curation.SurprisalVocab).map(_._1).toSet
    def m(t: String) = if (vocab(t)) t else "<unk>"
    val pairs = docs.flatMap { case (id, src, t) =>
      val ts = toks(t); ts.zip(ts.drop(1)).map(p => (id, src, m(p._1), m(p._2)))
    }
    val c12 = pairs.groupBy(p => (p._3, p._4)).view.mapValues(_.size.toLong).toMap
    val c1 = pairs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    def half(nn: BigInt, dd: BigInt): BigInt = (2 * nn + dd) / (2 * dd)
    val s6 = c12.map { case (k, c) => k -> half(BigInt(c1(k._1)) * 1000000, BigInt(c)) }
    val mean6 = pairs.groupBy(p => (p._1, p._2)).view.mapValues { ps =>
      val ss = ps.map(p => s6((p._3, p._4))).sum
      half(ss, BigInt(ps.size))
    }.toMap
    val n = mean6.size.toLong
    val sorted = mean6.values.toSeq.sorted
    val v1 = sorted((math.max(n / 3, 1L) - 1).toInt)
    val v2 = sorted((math.max(2 * n / 3, 1L) - 1).toInt)
    def bucket(v: BigInt) =
      if (v <= v1) "head" else if (v <= v2) "middle" else "tail"
    val expect = mean6.toSeq.groupBy { case ((_, src), v) => (src, bucket(v)) }
      .view.mapValues { g =>
        val vs = g.map(_._2)
        (vs.size.toLong,
          (BigDecimal(half(vs.sum, BigInt(vs.size))) / 1000000).toDouble)
      }.toMap
    val got = Curation.bigramSurprisal(spark, Sf0001).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (en, eavg) = expect(k)
      assert(r.getLong(2) === en, s"n_docs $r")
      assert(r.getDouble(3) === eavg, s"avg $r")
    }
    // the terciles genuinely split the corpus (non-degenerate scoring)
    val byBucket = got.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(byBucket.keySet === Set("head", "middle", "tail"), byBucket.toMap)
  }

  test("q187 mirror matrix is exactly q185's pairs rolled up to source pairs") {
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.operators.Dedup.prefixJaccardJoin(spark, Sf0001)
      .select(col("doc_a"), col("doc_b"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = pairs.groupBy { case (a, b, _) =>
      val (sa, sb) = (docs(a), docs(b))
      (Seq(sa, sb).min, Seq(sa, sb).max)
    }.map { case (k, g) => k -> (g.size.toLong, g.map(_._3).max) }
    val got = Curation.mirrorMatrix(spark, Sf0001).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet === expected.keySet)
    got.foreach { r =>
      val (n, mj) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === n, s"n_pairs $r")
      assert(r.getDouble(3) === mj, s"max_jaccard $r")
    }
    // the mirror signal is real on this corpus: some pair crosses sources
    assert(got.exists(r => r.getString(0) != r.getString(1)),
      "no cross-source near-dup pair — mirror matrix degenerate")
  }

  test("q188 fuzzy decontam is exactly the boundary-crossing rollup of q185's pairs") {
    val pairs = graft.operators.Dedup.prefixJaccardJoin(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    val crossing = pairs.filter { case (a, b, _) => (a % 5 == 0) != (b % 5 == 0) }
      .map { case (a, b, j) => if (a % 5 == 0) (a, b, j) else (b, a, j) }
    val expected = crossing.groupBy(_._1).map { case (id, g) =>
      val best = g.minBy { case (_, cd, j) => (-j, cd) }
      id -> (g.size.toLong, best._2, best._3)
    }
    val got = Curation.fuzzyDecontam(spark, Sf0001).collect()
    assert(got.map(_.getLong(0)).toSet === expected.keySet)
    got.foreach { r =>
      val (n, bm, bj) = expected(r.getLong(0))
      assert(r.getLong(1) === n, s"n_matches $r")
      assert(r.getLong(2) === bm, s"best_match $r")
      assert(r.getDouble(3) === bj, s"best_jaccard $r")
    }
    // every flagged doc is a batch doc; the report is non-degenerate
    got.foreach(r => assert(r.getLong(0) % 5 === 0, r))
    assert(got.nonEmpty, "no boundary-crossing near-dups — degenerate")
  }

  test("q189 DSIR resample: Madow hit count on target, target language enriched") {
    val got = Curation.dsirResample(spark, Sf0001).collect()
    val totalHits = got.map(_.getLong(3)).sum
    // Madow systematic selection places floor(W/step) >= target points
    // on the line; slack is bounded by the rounding of step
    assert(totalHits >= Curation.DsirSampleTarget.toLong, s"hits=$totalHits")
    assert(totalHits <= Curation.DsirSampleTarget.toLong + 2, s"hits=$totalHits")
    // importance resampling must actually reshape toward the target
    // distribution: the en share of the SAMPLE exceeds the en share of
    // the corpus (q151's weights give en-like buckets > 1)
    val enHits = got.filter(_.getString(1) == "en").map(_.getLong(3)).sum
    val corpus = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull)
      .agg(count(lit(1)), sum(when(col("lang") === "en", 1L).otherwise(0L)))
      .head()
    val corpusShare = corpus.getLong(1).toDouble / corpus.getLong(0)
    assert(enHits.toDouble / totalHits > corpusShare,
      s"sample en=$enHits/$totalHits corpus=$corpusShare")
    // weights are positive and every emitted row was actually selected
    got.foreach { r =>
      assert(r.getLong(2) >= 1L, s"weight $r")
      assert(r.getLong(3) >= 1L, s"hits $r")
    }
  }
}
