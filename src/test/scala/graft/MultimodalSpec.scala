package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Media
import graft.operators.Multimodal

/** Multimodal binary-column plumbing ([EXT] driver brief). The decode
  * codec is stubbed; these tests pin the REAL parts: binary schema,
  * batch shape, determinism, frame arithmetic. */
class MultimodalSpec extends SparkSuite {

  test("assets table: binary content with stable modality assignment") {
    val a = Media.assets(spark, Sf0001).cache()
    assert(a.schema("content").dataType.typeName === "binary")
    assert(a.select("kind").distinct().count() === 3)
    // kind is a pure function of asset_id
    val clash = a.groupBy("asset_id")
      .agg(countDistinct("kind").as("k")).filter(col("k") > 1)
    assert(clash.count() === 0)
    a.unpersist()
  }

  test("decode stub: metadata present exactly for the matching modality") {
    val m = Media.DecodeStub.metadata(Media.assets(spark, Sf0001)).cache()
    assert(m.filter(col("kind") === "image" && col("meta.width").isNull).count() === 0)
    assert(m.filter(col("kind") =!= "image" && col("meta.width").isNotNull).count() === 0)
    assert(m.filter(col("kind") === "audio" && col("meta.sample_rate").isNull).count() === 0)
    assert(m.filter(col("kind") === "video" && col("meta.duration_ms").isNull).count() === 0)
    m.unpersist()
  }

  test("byte-histogram features: fixed dim, unit L1 norm, deterministic") {
    import spark.implicits._
    val a = Media.assets(spark, Sf0001).as[Media.Asset]
    val f1 = Media.byteHistogramFeatures(a, dim = 16, batchSize = 7).cache()
    assert(f1.filter(size(col("features")) =!= 16).count() === 0)
    val norms = f1.select(aggregate(col("features"), lit(0.0), (acc, x) => acc + x).as("s"))
    assert(norms.filter(abs(col("s") - 1.0) > 1e-9).count() === 0)
    // batch size must not affect results (mapInPandas-shape contract)
    val f2 = Media.byteHistogramFeatures(a, dim = 16, batchSize = 1000)
    assert(f1.toDF().exceptAll(f2.toDF()).count() === 0)
    f1.unpersist()
  }

  test("resize stub caps content size and flags resized rows") {
    val r = Media.resizeStub(Media.assets(spark, Sf0001), maxBytes = 100)
    assert(r.filter(octet_length(col("content")) > 100).count() === 0)
    assert(r.filter(col("resized") && octet_length(col("content")) =!= 100).count() === 0)
  }

  test("q244 blob staging: lang=<lang>/<doc_id>.bin layout; manifest reads ONLY the pruned lang dir") {
    val root = Media.stagedBlobRoot(spark, Sf0001)
    // layout: every staged file sits in a lang= directory, named <doc_id>.bin
    val langDirs = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(langDirs.nonEmpty && langDirs.forall(_.startsWith("lang=")), langDirs)
    assert(langDirs.contains("lang=en"))
    // ignore Hadoop hidden sidecars (LocalFileSystem .crc files) — the
    // binaryFile source skips dot/underscore-prefixed files by the same
    // convention
    val enFiles = new java.io.File(s"$root/lang=en").listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(enFiles.nonEmpty && enFiles.forall(_.matches("[0-9]+\\.bin")))
    // pruning: the manifest's file-scan covers ONLY lang=en paths and
    // exactly the en file count — other langs' files are never listed
    val m = Multimodal.blobManifest(spark, Sf0001).cache()
    assert(m.count() === enFiles.length.toLong)
    assert(m.filter(!col("rel_path").startsWith("lang=en/")).count() === 0)
    // staged bytes round-trip: n_bytes and md5 agree with the source table
    val expect = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull && col("doc_id") < Media.BlobBatch &&
        col("lang") === "en")
      .select(
        concat(lit("lang=en/"), col("doc_id"), lit(".bin")).as("rel_path"),
        octet_length(encode(col("text"), "UTF-8")).cast("bigint").as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("content_md5"))
    assert(m.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(m).count() === 0)
    m.unpersist()
  }

  test("q262 WAV parser: literal header identity and corrupted-magic rejection") {
    import spark.implicits._
    // a known WAV built by the SAME header builder the stager uses:
    // 3 channels (not in the staged universe — proves the parse reads
    // bytes, not the staging distribution), 22050 Hz, 16-bit, 13 data
    // bytes
    val good = Media.wavHeader(13, 3, 22050, 16) ++ Array.fill[Byte](13)(7)
    val bad = good.clone(); bad(8) = 'X'.toByte // corrupt the WAVE tag
    val df = Seq((1L, good), (2L, bad)).toDF("id", "content")
      .withColumn("n_bytes", octet_length(col("content")).cast("long"))
    val parsed = Multimodal.parseWavHeader(df).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    val g = parsed(1L)
    assert(g.getAs[Boolean]("header_ok"))
    assert(g.getAs[Long]("channels") === 3L)
    assert(g.getAs[Long]("sample_rate") === 22050L)
    assert(g.getAs[Long]("byte_rate") === 22050L * 3 * 2)
    assert(g.getAs[Long]("bits_per_sample") === 16L)
    assert(g.getAs[Long]("data_bytes") === 13L)
    assert(g.getAs[Long]("duration_us") === 13L * 1000000 / (22050L * 3 * 2))
    assert(!parsed(2L).getAs[Boolean]("header_ok"),
      "corrupted magic must fail header_ok")
    // integer fields still parse on the corrupted file (only the tag
    // check fails) — the operator reports, it does not throw
    assert(parsed(2L).getAs[Long]("sample_rate") === 22050L)
  }

  test("q262 staged corpus: every file decodes header_ok with in-range fields") {
    val out = graft.operators.Multimodal.wavDecode(spark, Sf0001).cache()
    assert(out.count() > 0)
    assert(out.filter(!col("header_ok")).count() === 0)
    assert(out.filter(!col("channels").isin(1L, 2L)).count() === 0)
    assert(out.filter(!col("sample_rate").isin(Media.WavRates.map(_.toLong): _*))
      .count() === 0)
    // RIFF size law: file = data + 44 on every staged blob
    assert(out.filter(col("n_bytes") =!= col("data_bytes") + 44).count() === 0)
    out.unpersist()
  }

  test("q264 PCM decode: literal signed samples, odd-tail convention, driver replay") {
    import spark.implicits._
    // payload: samples (100, -1, -32768) LE plus one dangling byte the
    // decoder must ignore — the staged ASCII corpus never exercises the
    // sign branch, so it is pinned HERE with real high bytes
    val payload = Array[Byte](100, 0, -1, -1, 0, -128, 9)
    val wav = Media.wavHeader(payload.length, 1, 8000, 16) ++ payload
    val df = Seq((1L, wav)).toDF("doc_id", "content")
    // drive the same in-expression decode the operator uses, on the
    // literal (the operator itself is path-bound to the staged corpus)
    val sgn = (v: String) => s"(CASE WHEN $v >= 32768 THEN $v - 65536 ELSE $v END)"
    val sample = sgn("CAST(conv(concat(substring(h, i * 4 + 3, 2), " +
      "substring(h, i * 4 + 1, 2)), 16, 10) AS BIGINT)")
    val r = df
      .withColumn("data_bytes", lit(payload.length.toLong))
      .withColumn("ns", expr("data_bytes div 2"))
      .withColumn("h", expr("hex(substring(content, 45, cast(ns * 2 as int)))"))
      .withColumn("xs", expr(
        s"transform(sequence(0, cast(ns as int) - 1), i -> $sample)"))
      .select("ns", "xs").head()
    assert(r.getAs[Long]("ns") === 3L)
    assert(r.getAs[Seq[Long]]("xs") === Seq(100L, -1L, -32768L))
  }

  test("q288 twin ≡ q42 kernel: bin-by-bin per asset, row-by-row on the rollup") {
    import spark.implicits._
    // per-asset: the expression histogram's normalized fractions must
    // equal the mapPartitions kernel's features EXACTLY (both are
    // integer-count / integer-total in double — the same IEEE value)
    val kernel = Media.byteHistogramFeatures(
      Media.assets(spark, Sf0001).as[Media.Asset]).toDF()
      .select(col("asset_id"), col("features"))
    val twin = Multimodal.byteHistogramExpr(Media.assets(spark, Sf0001))
      .select(col("asset_id"),
        expr("""CASE WHEN nb = 0 THEN transform(bins, c -> cast(c as double))
               |ELSE transform(bins, c -> cast(c as double) / cast(nb as double))
               |END""".stripMargin).as("features"))
    assert(kernel.count() > 0)
    assert(kernel.exceptAll(twin).count() === 0)
    assert(twin.exceptAll(kernel).count() === 0)
    // rollup: q288's mean columns are q42's, value-identical
    val k = Multimodal.mediaFeatures(spark, Sf0001)
      .select("kind", "n_assets", "mean_bin0", "mean_bin1")
    val t = Multimodal.mediaFeaturesTwin(spark, Sf0001)
      .select("kind", "n_assets", "mean_bin0", "mean_bin1")
    assert(k.exceptAll(t).count() === 0)
    assert(t.exceptAll(k).count() === 0)
  }

  test("q289 BMP parser: literal header identity and corrupted-magic rejection") {
    import spark.implicits._
    // a known BMP built by the SAME header builder the stager uses:
    // width 5 (stride 16, 1 pad byte per row — not a zero-pad width),
    // 2 rows, pixel bytes 0..31
    val w = 5; val rs = 16; val h = 2
    val good = Media.bmpHeader(w, h, rs) ++ Array.tabulate[Byte](h * rs)(_.toByte)
    val bad = good.clone(); bad(0) = 'X'.toByte // corrupt the BM magic
    val df = Seq((1L, good), (2L, bad)).toDF("id", "content")
      .withColumn("n_bytes", octet_length(col("content")).cast("long"))
    val parsed = Multimodal.parseBmpHeader(df).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    val g = parsed(1L)
    assert(g.getAs[Boolean]("header_ok"))
    assert(g.getAs[Long]("width") === w.toLong)
    assert(g.getAs[Long]("height") === h.toLong)
    assert(g.getAs[Long]("bpp") === 24L)
    assert(g.getAs[Long]("row_stride") === rs.toLong)
    assert(g.getAs[Long]("img_bytes") === (h * rs).toLong)
    assert(!parsed(2L).getAs[Boolean]("header_ok"),
      "corrupted magic must fail header_ok")
    // integer fields still parse on the corrupted file — report, not throw
    assert(parsed(2L).getAs[Long]("width") === w.toLong)
  }

  test("q289/q290 staged corpus: headers decode ok; channel sums replay; padding conserved") {
    val dec = graft.operators.Multimodal.bmpDecode(spark, Sf0001).cache()
    assert(dec.count() > 0)
    assert(dec.filter(!col("header_ok")).count() === 0)
    assert(dec.filter(col("n_bytes") =!= col("img_bytes") + 54).count() === 0)
    // every width class 1..6 staged — all four padding residues covered
    assert(dec.select("width").distinct().count() === Media.BmpWidthMod.toLong)
    dec.unpersist()
    val stats = graft.operators.Multimodal.bmpPixelStats(spark, Sf0001)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(stats.nonEmpty)
    // driver replay from the SOURCE TEXT (the staging input): per doc,
    // channel sums with padding skipped, plus the conservation identity
    // sum_b + sum_g + sum_r + pad_sum = Σ(whole pixel region)
    val texts = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull && col("doc_id") < Media.BlobBatch)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    stats.foreach { case (id, r) =>
      val bytes = texts(id).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(java.lang.Byte.toUnsignedLong)
      val w = (id % Media.BmpWidthMod + 1).toInt
      val rs = (3 * w + 3) / 4 * 4
      val h = bytes.length / rs
      val region = bytes.take(h * rs)
      def chanSum(c: Int) = (for (row <- 0 until h; j <- 0 until w)
        yield region(row * rs + 3 * j + c)).sum
      assert(r.getAs[Long]("width") === w.toLong && r.getAs[Long]("height") === h.toLong, s"$r")
      assert(r.getAs[Long]("sum_b") === chanSum(0), s"doc $id sum_b")
      assert(r.getAs[Long]("sum_g") === chanSum(1), s"doc $id sum_g")
      assert(r.getAs[Long]("sum_r") === chanSum(2), s"doc $id sum_r")
      assert(r.getAs[Long]("sum_b") + r.getAs[Long]("sum_g") +
        r.getAs[Long]("sum_r") + r.getAs[Long]("pad_sum") === region.sum,
        s"doc $id padding conservation")
    }
  }

  test("q297 Y4M parser: literal stream identity; magic, torn-frame and torn-marker rejection") {
    import spark.implicits._
    // a known stream built by the SAME header builder the stager uses:
    // 7×3 (width 7 not in the staged universe {2..5} — proves the parse
    // reads bytes, not the staging distribution), 2 frames of 21 bytes
    val w = 7; val h = 3; val fs = w * h
    val marker = Media.Y4mFrameMarker
    val plane1 = Array.tabulate[Byte](fs)(_.toByte)
    val plane2 = Array.tabulate[Byte](fs)(i => (i + 40).toByte)
    val good = Media.y4mHeader(w, h) ++ marker ++ plane1 ++ marker ++ plane2
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val torn = good.dropRight(1) // payload no longer divides into frames
    // corrupt the SECOND frame's marker: header and sizes stay intact,
    // only the per-frame structural validation can catch it
    val badMarker = good.clone(); badMarker(36 + 6 + fs) = 'G'.toByte
    val df = Seq((1L, good), (2L, badMagic), (3L, torn), (4L, badMarker))
      .toDF("id", "content")
      .withColumn("n_bytes", octet_length(col("content")).cast("long"))
    val parsed = Multimodal.parseY4mHeader(df).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    val g = parsed(1L)
    assert(g.getAs[Boolean]("header_ok"))
    assert(g.getAs[Long]("header_len") === 36L)
    assert(g.getAs[Long]("width") === w.toLong)
    assert(g.getAs[Long]("height") === h.toLong)
    assert(g.getAs[Long]("fps_num") === Media.Y4mFpsNum.toLong)
    assert(g.getAs[Long]("fps_den") === Media.Y4mFpsDen.toLong)
    assert(g.getAs[Long]("frame_bytes") === fs.toLong)
    assert(g.getAs[Long]("n_frames") === 2L)
    assert(!parsed(2L).getAs[Boolean]("header_ok"), "corrupt magic must fail")
    assert(!parsed(3L).getAs[Boolean]("header_ok"), "torn frame must fail")
    assert(!parsed(4L).getAs[Boolean]("header_ok"), "torn marker must fail")
    // geometry still parses on the torn-frame file — report, not throw
    assert(parsed(3L).getAs[Long]("width") === w.toLong)
  }

  test("q297/q299 staged corpus: streams decode ok; sampled frame lumas replay from source text") {
    val dec = graft.operators.Multimodal.y4mDecode(spark, Sf0001).cache()
    assert(dec.count() > 0)
    assert(dec.filter(!col("header_ok")).count() === 0)
    // stream-size law: file = header(36) + n · (marker(6) + plane)
    assert(dec.filter(col("n_bytes") =!=
      lit(36L) + col("n_frames") * (col("frame_bytes") + 6)).count() === 0)
    assert(dec.filter(!col("width").between(2, 1 + Media.Y4mWidthMod)).count() === 0)
    assert(dec.filter(col("duration_ms") =!= col("n_frames") * 40).count() === 0)
    dec.unpersist()
    val rows = graft.operators.Multimodal.y4mFrameLuma(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull && col("doc_id") < Media.BlobBatch)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // driver replay from the SOURCE TEXT (the staging input): frame f's
    // plane is text bytes [f·fs, (f+1)·fs); only every-3rd frame appears
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id"); val f = r.getAs[Long]("frame_idx")
      assert(f % 3 === 0, s"doc $id frame $f not on the sampling stride")
      val bytes = texts(id).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(java.lang.Byte.toUnsignedLong)
      val fs = (r.getAs[Long]("width") * r.getAs[Long]("height")).toInt
      val plane = bytes.slice(f.toInt * fs, f.toInt * fs + fs)
      assert(r.getAs[Long]("luma_sum") === plane.sum, s"doc $id frame $f sum")
      assert(r.getAs[Long]("luma_peak") === plane.max, s"doc $id frame $f peak")
    }
    // per-doc sampled-frame count = ceil(n_frames / 3)
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    perDoc.foreach { case (id, rs) =>
      val n = rs.head.getAs[Long]("n_frames")
      assert(rs.length.toLong === (n + 2) / 3, s"doc $id sampled count")
    }
  }

  test("q300 scene cuts: census replays from source text with the exact integer test") {
    val rows = graft.operators.Multimodal.y4mSceneCuts(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull && col("doc_id") < Media.BlobBatch)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val fs = r.getAs[Long]("frame_bytes").toInt
      val n = r.getAs[Long]("n_frames").toInt
      val bytes = texts(id).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(java.lang.Byte.toUnsignedLong)
      val sums = (0 until n).map(f => bytes.slice(f * fs, (f + 1) * fs).sum)
      val deltas = (1 until n).map(f => (sums(f) - sums(f - 1)).abs)
      val cuts = (1 until n).filter(f => deltas(f - 1) > 16L * fs)
      assert(r.getAs[Long]("n_cuts") === cuts.length.toLong, s"doc $id cuts")
      assert(Option(r.getAs[java.lang.Long]("first_cut_idx")).map(_.toLong)
        === cuts.headOption.map(_.toLong), s"doc $id first cut")
      assert(r.getAs[Long]("max_delta_sum")
        === (if (n >= 2) deltas.max else 0L), s"doc $id max delta")
    }
  }

  test("q301/q302: video fingerprints replay driver-side; banded pairs equal the exact quadratic set") {
    // driver replay of the 56-bit plane-luma fingerprint from the
    // CONCATENATED planes (what a correct marker-skipping demux yields)
    def fpOf(planes: Array[Byte]): Option[(Long, Long, Long)] = {
      val pb = planes.length
      if (pb < 56) None
      else {
        val lumas = planes.map(java.lang.Byte.toUnsignedLong)
        val total = lumas.map(BigInt(_)).sum
        var fp = 0L
        (0 until 56).foreach { b =>
          val lo = (b.toLong * pb / 56).toInt
          val hi = ((b + 1).toLong * pb / 56).toInt
          val bs = lumas.slice(lo, hi).map(BigInt(_)).sum
          if (bs * pb > total * (hi - lo)) fp |= 1L << b
        }
        Some((pb.toLong, total.toLong, fp))
      }
    }
    val texts = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull && col("doc_id") < Media.BlobBatch)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def planesOf(id: Long, bs: Array[Byte]): Option[Array[Byte]] = {
      val fs = ((id % Media.Y4mWidthMod + 2) * (id % Media.Y4mHeightMod + 2)).toInt
      val n = bs.length / fs
      if (n < 1) None else Some(bs.take(n * fs))
    }
    val g1 = texts.flatMap { case (id, bs) =>
      planesOf(id, bs).flatMap(fpOf).map(id -> _)
    }.toMap
    val q301 = graft.operators.Multimodal.y4mFingerprint(spark, Sf0001).collect()
    assert(q301.nonEmpty && q301.length === g1.size)
    q301.foreach { r =>
      val (pb, total, fp) = g1(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("plane_bytes") === pb, s"$r")
      assert(r.getAs[Long]("luma_sum") === total, s"$r")
      assert(r.getAs[Long]("fp") === fp, s"$r")
    }
    // gen-2 replay: the staged single-plane-byte perturbation
    val g2 = texts.filter(_._1 % 7 == 0).flatMap { case (id, bs) =>
      planesOf(id, bs).flatMap { px =>
        val p = px.clone()
        p(1) = ((java.lang.Byte.toUnsignedInt(p(1)) + 1) % 256).toByte
        fpOf(p)
      }.map(id -> _)
    }.toMap
    // the banded result must equal the EXACT quadratic same-length pair
    // set (banding lossless at radius 3 by pigeonhole over 7 bands)
    val all = g1.toSeq.map { case (id, (pb, _, fp)) => (id, 1L, pb, fp) } ++
      g2.toSeq.map { case (id, (pb, _, fp)) => (id, 2L, pb, fp) }
    val expect = (for {
      x <- all; y <- all
      if x._3 == y._3 && (x._1 < y._1 || (x._1 == y._1 && x._2 < y._2))
      if java.lang.Long.bitCount(x._4 ^ y._4) <= 3
    } yield (x._1, x._2, y._1, y._2)).toSet
    val got = graft.operators.Multimodal.y4mNearDup(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("gen_a"),
        r.getAs[Long]("id_b"), r.getAs[Long]("gen_b")))
    assert(got.toSet === expect, "banded pair set diverged from the exact sweep")
    assert(got.nonEmpty, "fixture degenerate — no near-dup pairs")
  }

  test("q303/q304: audio fingerprints replay driver-side; banded pairs equal the exact quadratic set") {
    // driver replay: signed LE int16 samples (q264 convention), abs,
    // 56 bands over sample-index space, majority bit vs stream mean
    def fpOf(data: Array[Byte]): Option[(Long, Long, Long)] = {
      val ns = data.length / 2
      if (ns < 56) None
      else {
        val xs = (0 until ns).map { i =>
          val v = java.lang.Byte.toUnsignedInt(data(2 * i)) +
            256 * java.lang.Byte.toUnsignedInt(data(2 * i + 1))
          math.abs(if (v >= 32768) v - 65536 else v).toLong
        }
        val total = xs.map(BigInt(_)).sum
        var fp = 0L
        (0 until 56).foreach { b =>
          val lo = (b.toLong * ns / 56).toInt
          val hi = ((b + 1).toLong * ns / 56).toInt
          val bs = xs.slice(lo, hi).map(BigInt(_)).sum
          if (bs * ns > total * (hi - lo)) fp |= 1L << b
        }
        Some((ns.toLong, total.toLong, fp))
      }
    }
    val texts = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull && col("doc_id") < Media.BlobBatch)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val g1 = texts.flatMap { case (id, bs) => fpOf(bs).map(id -> _) }.toMap
    val q303 = graft.operators.Multimodal.wavFingerprint(spark, Sf0001).collect()
    assert(q303.nonEmpty && q303.length === g1.size)
    q303.foreach { r =>
      val (ns, total, fp) = g1(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_samples") === ns, s"$r")
      assert(r.getAs[Long]("abs_sum") === total, s"$r")
      assert(r.getAs[Long]("fp") === fp, s"$r")
    }
    // gen-2 replay: +1 mod 256 on data byte 1 = sample 0's HIGH byte
    val g2 = texts.filter(_._1 % 7 == 0).flatMap { case (id, bs) =>
      if (bs.length < 2) None
      else {
        val px = bs.clone()
        px(1) = ((java.lang.Byte.toUnsignedInt(px(1)) + 1) % 256).toByte
        fpOf(px).map(id -> _)
      }
    }.toMap
    val all = g1.toSeq.map { case (id, (ns, _, fp)) => (id, 1L, ns, fp) } ++
      g2.toSeq.map { case (id, (ns, _, fp)) => (id, 2L, ns, fp) }
    val expect = (for {
      x <- all; y <- all
      if x._3 == y._3 && (x._1 < y._1 || (x._1 == y._1 && x._2 < y._2))
      if java.lang.Long.bitCount(x._4 ^ y._4) <= 3
    } yield (x._1, x._2, y._1, y._2)).toSet
    val got = graft.operators.Multimodal.wavNearDup(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("gen_a"),
        r.getAs[Long]("id_b"), r.getAs[Long]("gen_b")))
    assert(got.toSet === expect, "banded pair set diverged from the exact sweep")
    assert(got.nonEmpty, "fixture degenerate — no near-dup pairs")
  }

  test("q298 image datasource ≡ q290 expression decoder (two decoders, one truth)") {
    val ds = graft.operators.Multimodal.imageDatasourceDecode(spark, Sf0001).cache()
    assert(ds.count() > 0)
    // the datasource decodes every staged BMP as 3-channel CV_8UC3
    assert(ds.filter(col("n_channels") =!= 3 || col("mode") =!= 16).count() === 0)
    val ex = graft.operators.Multimodal.bmpPixelStats(spark, Sf0001)
      .select(col("doc_id"), col("width").as("x_w"), col("height").as("x_h"),
        col("sum_b").as("x_b"), col("sum_g").as("x_g"), col("sum_r").as("x_r"))
    // inner join must lose no rows on either side, and every geometry
    // and channel-sum must agree between ImageIO and the hand decoder
    val j = ds.join(ex, Seq("doc_id")).cache()
    assert(j.count() === ds.count())
    assert(j.count() === ex.count())
    assert(j.filter(col("width") =!= col("x_w") || col("height") =!= col("x_h") ||
      col("sum_b") =!= col("x_b") || col("sum_g") =!= col("x_g") ||
      col("sum_r") =!= col("x_r")).count() === 0)
    j.unpersist(); ds.unpersist()
  }

  test("q307 PNG datasource ≡ q290 BMP expression decoder (cross-format identity)") {
    val png = graft.operators.Multimodal.pngDatasourceDecode(spark, Sf0001).cache()
    assert(png.count() > 0)
    assert(png.filter(col("n_channels") =!= 3 || col("mode") =!= 16).count() === 0)
    val ex = graft.operators.Multimodal.bmpPixelStats(spark, Sf0001)
      .select(col("doc_id"), col("width").as("x_w"), col("height").as("x_h"),
        col("sum_b").as("x_b"), col("sum_g").as("x_g"), col("sum_r").as("x_r"))
    // inner join must lose no rows on either side: the PNG corpus stages
    // exactly the BMP corpus's docs, and every geometry and channel sum
    // must survive the DEFLATE round-trip bit-for-bit
    val j = png.join(ex, Seq("doc_id")).cache()
    assert(j.count() === png.count())
    assert(j.count() === ex.count())
    assert(j.filter(col("width") =!= col("x_w") || col("height") =!= col("x_h") ||
      col("sum_b") =!= col("x_b") || col("sum_g") =!= col("x_g") ||
      col("sum_r") =!= col("x_r")).count() === 0)
    j.unpersist(); png.unpersist()
    // the staged blobs really carry the compressed format: PNG magic,
    // not a renamed BMP — the decode above genuinely exercised inflate
    val root = Media.stagedPngRoot(spark, Sf0001)
    val f = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".png")).minBy(_.getName)
    val head = java.nio.file.Files.readAllBytes(f.toPath).take(8)
    val magic = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    assert(head.sameElements(magic), head.mkString(","))
  }

  test("q305 asset coverage: every staged doc has text+audio; absence follows the staging rules") {
    val rows = graft.operators.Multimodal.assetCoverage(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // text and audio stage unconditionally for every non-null doc
      assert(!r.isNullAt(r.fieldIndex("text_bytes")), s"doc $id text")
      assert(r.getAs[Long]("audio_bytes") === r.getAs[Long]("text_bytes") + 44,
        s"doc $id wav size law")
      val n = r.getAs[Long]("n_modalities")
      assert(n >= 2 && n <= 4, s"doc $id n_modalities $n")
      // image/bmp absence iff the doc is shorter than one padded row
      val w = (id % Media.BmpWidthMod + 1).toInt
      val rs = (3 * w + 3) / 4 * 4
      assert(r.isNullAt(r.fieldIndex("image_bytes"))
        === (r.getAs[Long]("text_bytes") < rs), s"doc $id image presence")
    }
    // the fixture must exercise at least one incomplete doc (the NULL
    // pattern is load-bearing) and at least one fully-covered doc
    assert(rows.exists(_.getAs[Long]("n_modalities") === 4L))
  }

  test("frame sampling: every 4th frame, bytes reassemble arithmetically") {
    val out = Multimodal.frameSample(spark, Sf0001).cache()
    // n_sampled = ceil(n_frames / 4)
    val bad = out.filter(col("n_sampled") =!= ceil(col("n_frames") / 4.0).cast("bigint"))
    assert(bad.count() === 0)
    // sampled bytes never exceed full frames, never undershoot by > 15
    val range = out.filter(col("sampled_bytes") > col("n_sampled") * 16 ||
      col("sampled_bytes") <= (col("n_sampled") - 1) * 16)
    assert(range.count() === 0)
    out.unpersist()
  }
}
