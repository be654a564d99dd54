package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, StreamingQueries}

/** Behavior pins for the round-10 operator tail. Oracles are the
  * primary gate; these assert each operator's DEFINING property — the
  * invariant a hash compare can't name.
  */
class Round10Spec extends SparkSuite {

  test("q291 staging: duplicates live in their own part-file; stream drops exactly them") {
    // the fixture's precondition for cross-batch re-delivery under
    // maxFilesPerTrigger=1: >= 2 part-files, one carrying ONLY the
    // event_id % 5 == 0 re-deliveries
    val root = StreamingQueries.redeliveryRoot(spark, Sf0001)
    val staged = spark.read.parquet(root)
      .select(col("event_id"), input_file_name().as("f")).cache()
    val files = staged.select("f").distinct().collect().map(_.getString(0))
    assert(files.length >= 2, s"staged corpus must span >= 2 files: ${files.toSeq}")
    val byFile = staged.groupBy(col("f"))
      .agg(count(lit(1)).as("n"),
        sum(when(pmod(col("event_id"), lit(5)) === 0, 1L).otherwise(0L)).as("m5"))
      .collect()
    staged.unpersist()
    val dupFiles = byFile.filter(r => r.getAs[Long]("n") === r.getAs[Long]("m5"))
    val origFiles = byFile.filter(r => r.getAs[Long]("n") > r.getAs[Long]("m5"))
    assert(dupFiles.nonEmpty, "no all-duplicate part-file — re-delivery batch missing")
    assert(origFiles.nonEmpty, "no original part-file")
    // audit identity against a batch replay of the SOURCE table
    val expected = Tables.events(spark, Sf0001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("event_id")).as("uniq"),
        sum(when(pmod(col("event_id"), lit(5)) === 0, 1L).otherwise(0L)).as("re"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("uniq"), r.getAs[Long]("re"))).toMap
    val rows = StreamingQueries.streamRedelivery(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (uniq, re) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_unique_events") === uniq, s"$r")
      assert(r.getAs[Long]("n_redelivered") === re, s"$r")
      assert(re > 0, s"fixture degenerate — no re-deliveries for $r")
    }
  }

  test("q292: maximal => frequent and closed; flags re-derive from the published witnesses") {
    val maximal = Relational.maximalItemsets(spark, Sf0001).collect()
    assert(maximal.nonEmpty)
    val closed = Relational.closedItemsets(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("part_a"),
        Option(r.getAs[Any]("part_b")), Option(r.getAs[Any]("part_c"))) ->
        r.getAs[Boolean]("is_closed")).toMap
    maximal.foreach { r =>
      val minsup = r.getAs[Long]("minsup")
      val sup = r.getAs[Long]("support")
      val ext = Option(r.getAs[Any]("max_ext_support")).map(_.asInstanceOf[Long])
      // flags are pure functions of the published witnesses
      assert(r.getAs[Boolean]("is_frequent") === (sup >= minsup), s"$r")
      assert(r.getAs[Boolean]("is_maximal") ===
        (sup >= minsup && ext.forall(_ < minsup)), s"$r")
      // Bayardo containment: maximal => closed (max_ext < minsup <=
      // support is a STRICT support drop on every extension)
      if (r.getAs[Boolean]("is_maximal")) {
        val key = (r.getAs[Long]("level"), r.getAs[Long]("part_a"),
          Option(r.getAs[Any]("part_b")), Option(r.getAs[Any]("part_c")))
        assert(closed(key), s"maximal itemset not closed: $r")
      }
    }
    // the fixture exercises both branches
    assert(maximal.exists(_.getAs[Boolean]("is_maximal")))
    assert(maximal.exists(r => !r.getAs[Boolean]("is_maximal")))
  }

  test("q294/q295: fingerprints replay driver-side; banded pairs equal the exact quadratic set") {
    import graft.operators.Multimodal
    import graft.multimodal.Media
    // driver replay of the 56-bit block-luma fingerprint from raw bytes
    def fpOf(bytes: Array[Byte], w: Int): Option[(Long, Long, Long)] = {
      val rs = (3 * w + 3) / 4 * 4
      val h = bytes.length / rs
      val np = w.toLong * h
      if (h < 1 || np < 56) None
      else {
        val lumas = (0 until np.toInt).map { i =>
          val base = (i / w) * rs + 3 * (i % w)
          def u(c: Int) = java.lang.Byte.toUnsignedLong(bytes(base + c))
          299 * u(2) + 587 * u(1) + 114 * u(0)
        }
        val total = lumas.map(BigInt(_)).sum
        var fp = 0L
        (0 until 56).foreach { b =>
          val lo = (b * np / 56).toInt; val hi = ((b + 1) * np / 56).toInt
          val bs = lumas.slice(lo, hi).map(BigInt(_)).sum
          if (bs * np > total * (hi - lo)) fp |= 1L << b
        }
        Some((np, total.toLong, fp))
      }
    }
    val texts = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull && col("doc_id") < Media.BlobBatch)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val g1 = texts.flatMap { case (id, bs) =>
      fpOf(bs, (id % Media.BmpWidthMod + 1).toInt).map(id -> _)
    }.toMap
    val q294 = Multimodal.bmpFingerprint(spark, Sf0001).collect()
    assert(q294.nonEmpty && q294.length === g1.size)
    q294.foreach { r =>
      val (np, total, fp) = g1(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_pixels") === np, s"$r")
      assert(r.getAs[Long]("luma_sum") === total, s"$r")
      assert(r.getAs[Long]("fp") === fp, s"$r")
    }
    // gen-2 replay: the staged single-byte perturbation
    val g2 = texts.filter(_._1 % 7 == 0).flatMap { case (id, bs) =>
      val w = (id % Media.BmpWidthMod + 1).toInt
      val rs = (3 * w + 3) / 4 * 4
      val h = bs.length / rs
      if (h < 1) None
      else {
        val px = bs.take(h * rs)
        px(1) = ((java.lang.Byte.toUnsignedInt(px(1)) + 1) % 256).toByte
        fpOf(px, w).map(id -> _)
      }
    }.toMap
    // the banded result must equal the EXACT quadratic same-geometry
    // pair set (banding is lossless at radius 3 — pigeonhole over
    // 7 bands) — computed with no banding at all
    val all = g1.toSeq.map { case (id, (np, _, fp)) => (id, 1L, np, fp) } ++
      g2.toSeq.map { case (id, (np, _, fp)) => (id, 2L, np, fp) }
    val expect = (for {
      x <- all; y <- all
      if x._3 == y._3 && (x._1 < y._1 || (x._1 == y._1 && x._2 < y._2))
      if java.lang.Long.bitCount(x._4 ^ y._4) <= 3
    } yield (x._1, x._2, y._1, y._2)).toSet
    val got = Multimodal.bmpNearDup(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("gen_a"),
        r.getAs[Long]("id_b"), r.getAs[Long]("gen_b")))
    assert(got.toSet === expect, "banded pair set diverged from the exact sweep")
    assert(got.nonEmpty, "fixture degenerate — no near-dup pairs")
  }

  test("q296: box-filter downsample replays driver-side, edge blocks included") {
    import graft.operators.Multimodal
    import graft.multimodal.Media
    val texts = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull && col("doc_id") < Media.BlobBatch)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .toMap
    val rows = Multimodal.bmpDownsample(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    // fixture must exercise BOTH odd width and odd height (edge blocks)
    assert(rows.exists(_.getAs[Long]("width") % 2 === 1))
    assert(rows.exists(_.getAs[Long]("height") % 2 === 1))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bytes = texts(id).map(java.lang.Byte.toUnsignedLong)
      val w = (id % Media.BmpWidthMod + 1).toInt
      val rs = (3 * w + 3) / 4 * 4
      val h = bytes.length / rs
      val (ow, oh) = ((w + 1) / 2, (h + 1) / 2)
      def px(row: Int, c0: Int, ch: Int) = bytes(row * rs + 3 * c0 + ch)
      def block(rr: Int, cc: Int, ch: Int): Long = {
        val vs = for {
          dr <- 0 until math.min(2, h - 2 * rr)
          dc <- 0 until math.min(2, w - 2 * cc)
        } yield px(2 * rr + dr, 2 * cc + dc, ch)
        vs.sum / vs.length
      }
      def chan(ch: Int) =
        for (rr <- 0 until oh; cc <- 0 until ow) yield block(rr, cc, ch)
      assert(r.getAs[Long]("out_w") === ow.toLong && r.getAs[Long]("out_h") === oh.toLong, s"$r")
      assert(r.getAs[Long]("sum_b") === chan(0).sum, s"doc $id sum_b")
      assert(r.getAs[Long]("sum_g") === chan(1).sum, s"doc $id sum_g")
      assert(r.getAs[Long]("sum_r") === chan(2).sum, s"doc $id sum_r")
      assert(r.getAs[Long]("peak_r") === chan(2).max, s"doc $id peak_r")
    }
  }

  test("q293: exact-rational ranking agrees with a driver-side BigInt replay of all 40 rules") {
    val top = Relational.liftTopRules(spark, Sf0001).collect()
    assert(top.length === 10)
    // ranks are gap-free 0..9 in order
    assert(top.map(_.getAs[Long]("rank")).toSeq === (0L until 10L))
    // replay: rank EVERY rule from q259's published exact witnesses
    // with BigInt cross-multiplication — no floats anywhere
    val all = Relational.basketRules(spark, Sf0001).collect().map { r =>
      (r.getAs[Long]("ante"), r.getAs[Long]("cons"),
        BigInt(r.getAs[Long]("n_together")),
        BigInt(r.getAs[Long]("n_ante")), BigInt(r.getAs[Long]("n_cons")))
    }
    val ordered = all.sortWith { case ((a1, c1, n1, fa1, fb1), (a2, c2, n2, fa2, fb2)) =>
      val l = n1 * fa2 * fb2
      val rr = n2 * fa1 * fb1
      l > rr || (l == rr && (a1 < a2 || (a1 == a2 && c1 < c2)))
    }
    val expect = ordered.take(10).map(t => (t._1, t._2)).toSeq
    assert(top.map(r => (r.getAs[Long]("ante"), r.getAs[Long]("cons"))).toSeq
      === expect, "lift ranking diverged from the exact replay")
    // lift is direction-symmetric: each pair's two rules carry the
    // same published lift and leverage
    top.groupBy(r => {
      val a = r.getAs[Long]("ante"); val c = r.getAs[Long]("cons")
      (math.min(a, c), math.max(a, c))
    }).values.filter(_.length === 2).foreach { g =>
      assert(g(0).getAs[Double]("lift") === g(1).getAs[Double]("lift"))
      assert(g(0).getAs[Double]("leverage") === g(1).getAs[Double]("leverage"))
    }
  }
}
