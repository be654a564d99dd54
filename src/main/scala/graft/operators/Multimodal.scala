package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Parity._
import graft.multimodal.Media

/** [EXT] Multimodal operators surfaced through the harness. The decode
  * stub's fake metadata is pure arithmetic on byte length, so q41/q43
  * carry full DuckDB oracles — the binary plumbing (encode, octet_length,
  * md5-of-blob, frame explode) is verified end-to-end; only the
  * codec call itself is faked (none exists in this container). */
object Multimodal {

  /** Q41: decoded-metadata rollup per modality. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val meta = Media.DecodeStub.metadata(Media.assets(spark, dir))
    meta.groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("fp")).as("n_distinct_contents"),
        max(col("meta.width")).as("max_width"),
        max(col("meta.sample_rate")).as("max_sample_rate"),
        max(col("meta.duration_ms")).as("max_duration_ms"))
      .orderBy(col("kind"))
  }

  val mediaMetaSql: String =
    """WITH m AS (
      |  SELECT doc_id AS asset_id,
      |    ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |    octet_length(encode(text)) AS n_bytes,
      |    md5(text) AS fp -- duckdb md5 hashes the UTF-8 string bytes = md5(BLOB content)
      |  FROM documents)
      |SELECT kind, COUNT(*) AS n_assets,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  COUNT(DISTINCT fp) AS n_distinct_contents,
      |  MAX(CASE WHEN kind='image' THEN n_bytes % 640 + 1 END) AS max_width,
      |  MAX(CASE WHEN kind='audio'
      |    THEN [16000,44100,48000][(n_bytes % 3) + 1] END) AS max_sample_rate,
      |  MAX(CASE WHEN kind='video' THEN n_bytes * 10 END) AS max_duration_ms
      |FROM m GROUP BY kind ORDER BY kind""".stripMargin

  /** Q42: batched feature extraction (mapPartitions) — per-modality mean
    * of the first histogram bins. No oracle (per-partition batch path is
    * not SQL); MultimodalSpec pins determinism and normalization. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = Media.assets(spark, dir).as[Media.Asset]
    Media.byteHistogramFeatures(a).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        dec6(avg(element_at(col("features"), 1))).as("mean_bin0"),
        dec6(avg(element_at(col("features"), 2))).as("mean_bin1"))
      .orderBy(col("kind"))
  }

  /** Q43: video frame sampling — every 4th 16-byte frame; counts are
    * pure arithmetic on byte length, so the explode is oracle-checked. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val vids = Media.assets(spark, dir).filter(col("kind") === "video")
    Media.sampleFrames(vids, frameBytes = 16, every = 4)
      .groupBy(col("asset_id"))
      .agg(
        max(col("n_frames")).as("n_frames"),
        count(lit(1)).as("n_sampled"),
        sum(octet_length(col("frame"))).as("sampled_bytes"))
      .orderBy(col("asset_id"))
  }

  val frameSampleSql: String =
    """WITH v AS (
      |  SELECT doc_id AS asset_id, octet_length(encode(text)) AS n_bytes
      |  FROM documents
      |  WHERE (doc_id % 3) + 1 = 3 AND octet_length(encode(text)) > 0),
      |f AS (
      |  SELECT asset_id, n_bytes,
      |    CAST(CEIL(n_bytes / 16.0) AS BIGINT) AS n_frames
      |  FROM v)
      |SELECT asset_id, n_frames,
      |  CAST((n_frames + 3) // 4 AS BIGINT) AS n_sampled,
      |  -- all sampled frames are full 16B except possibly the last slice
      |  CAST((n_frames + 3) // 4 * 16
      |    - CASE WHEN (n_frames - 1) % 4 = 0 AND n_bytes % 16 <> 0
      |           THEN 16 - n_bytes % 16 ELSE 0 END AS BIGINT) AS sampled_bytes
      |FROM f ORDER BY asset_id""".stripMargin

  /** Q244: BINARY-BLOB SOURCE MANIFEST — `spark.read.format
    * ("binaryFile")` over a staged loose-file blob directory
    * ([[Media.stagedBlobRoot]]: `lang=<lang>/<doc_id>.bin`, content =
    * the doc's UTF-8 bytes), the built-in source through which
    * image/audio corpora actually enter a 100 TB pipeline (one object
    * per asset; q41-q43 model the OTHER layout, binary columns inside
    * parquet). The load path targets ONE `lang=en` directory + a
    * `*.bin` glob — the blob-store analog of partition pruning: only
    * that directory is ever listed, the other langs' files are never
    * touched (MultimodalSpec pins the layout and the pruning). Output
    * is the (rel_path, n_bytes, content_md5) ingest manifest — the
    * q125/q169 digest discipline, which the oracle recomputes from the
    * documents table WITHOUT reading any file: path from (lang,
    * doc_id), length/md5 from the text bytes, so the hash compare
    * verifies the staged bytes round-tripped exactly.
    *
    * Scale shape: binaryFile parallelizes per file (each blob one
    * task-split; `content` is only hashed, never shuffled — the
    * manifest rows are 3 narrow columns); the only exchange is the
    * output sort. */
  def blobManifest(spark: SparkSession, dir: String): DataFrame = {
    val root = Media.stagedBlobRoot(spark, dir)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(s"$root/lang=en")
      .select(
        regexp_extract(col("path"), "(lang=[^/]+/[^/]+\\.bin)$", 1).as("rel_path"),
        col("length").cast("bigint").as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("rel_path"))
  }

  val blobManifestSql: String =
    s"""SELECT 'lang=' || lang || '/' || CAST(doc_id AS VARCHAR) || '.bin' AS rel_path,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |  md5(text) AS content_md5
       |FROM documents
       |WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch} AND lang = 'en'
       |ORDER BY rel_path""".stripMargin

  /** Shared binaryFile manifest scan of a staged blob root (all lang
    * dirs — recursive lookup; q244 demonstrates the pruned single-dir
    * form). */
  private def blobManifestAll(spark: SparkSession, root: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(
        regexp_extract(col("path"), "(lang=[^/]+/[^/]+\\.bin)$", 1).as("rel_path"),
        col("length").cast("bigint").as("n_bytes"),
        md5(col("content")).as("content_md5"))

  /** Q260: BLOB-CORPUS SYNC DIFF — the content-addressed diff between
    * two staged blob generations: per file, added / removed / changed
    * / unchanged by (path, md5), rolled up per status with byte
    * totals. This is the QUERY-ENGINE SEMANTICS of the reference's
    * rsync deploy step (SURVEY S10): what an incremental blob sync
    * must transfer is exactly the added+changed partition, and the
    * md5 comparison (not size — generation 2's changed files keep
    * their length by construction) is what rsync's delta detection
    * resolves to at file granularity. Generation 2 overlaps
    * generation 1 deterministically ([[Media.stagedBlobRootGen2]]):
    * ids below the overlap are removals, above it additions, and
    * every 7th overlapping doc carries reversed bytes (changed).
    *
    * Oracle: recomputes BOTH manifests from the documents table
    * (md5(text) vs md5(reverse(text)) — ASCII corpus, so codepoint
    * reversal is byte reversal on both engines) and classifies
    * identically — the hash compare therefore proves both staged
    * generations round-tripped and the diff logic agrees.
    *
    * Scale shape: two per-file-parallel binaryFile scans (content
    * hashed in-scan, never shuffled), one full-outer join on the
    * path-keyed 3-column manifests, one ≤4-row rollup. */
  def blobSyncDiff(spark: SparkSession, dir: String): DataFrame = {
    val a = blobManifestAll(spark, Media.stagedBlobRoot(spark, dir))
      .select(col("rel_path"), col("n_bytes").as("bytes_a"),
        col("content_md5").as("md5_a"))
    val b = blobManifestAll(spark, Media.stagedBlobRootGen2(spark, dir))
      .select(col("rel_path"), col("n_bytes").as("bytes_b"),
        col("content_md5").as("md5_b"))
    a.join(b, Seq("rel_path"), "full_outer")
      .withColumn("status",
        when(col("md5_a").isNull, "added")
          .when(col("md5_b").isNull, "removed")
          .when(col("md5_a") =!= col("md5_b"), "changed")
          .otherwise("unchanged"))
      .groupBy(col("status"))
      .agg(count(lit(1)).cast("bigint").as("n_files"),
        sum(coalesce(col("bytes_b"), col("bytes_a"))).cast("bigint").as("n_bytes"))
      .orderBy(col("status"))
  }

  val blobSyncDiffSql: String =
    s"""WITH ga AS (
       |  SELECT 'lang=' || lang || '/' || CAST(doc_id AS VARCHAR) || '.bin' AS rel_path,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS bytes_a, md5(text) AS md5_a
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}),
       |gb AS (
       |  SELECT 'lang=' || lang || '/' || CAST(doc_id AS VARCHAR) || '.bin' AS rel_path,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS bytes_b,
       |    md5(CASE WHEN doc_id % 7 = 0 THEN reverse(text) ELSE text END) AS md5_b
       |  FROM documents
       |  WHERE text IS NOT NULL
       |    AND doc_id >= ${Media.Gen2Lo} AND doc_id < ${Media.Gen2Hi}),
       |j AS (
       |  SELECT COALESCE(ga.rel_path, gb.rel_path) AS rel_path,
       |    bytes_a, md5_a, bytes_b, md5_b,
       |    CASE WHEN md5_a IS NULL THEN 'added'
       |         WHEN md5_b IS NULL THEN 'removed'
       |         WHEN md5_a <> md5_b THEN 'changed'
       |         ELSE 'unchanged' END AS status
       |  FROM ga FULL OUTER JOIN gb ON ga.rel_path = gb.rel_path)
       |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_files,
       |  CAST(SUM(COALESCE(bytes_b, bytes_a)) AS BIGINT) AS n_bytes
       |FROM j GROUP BY status ORDER BY status""".stripMargin

  /** Little-endian unsigned integer at 1-based byte `off` (width
    * `nBytes`) of the binaryFile `content` column — pure codegen'd
    * builtins (hex-slice → byte-pair reversal → conv), no UDF: the
    * whole parse stays inside whole-stage codegen. */
  private def leInt(off: Int, nBytes: Int): String = {
    val h = s"hex(substring(content, $off, $nBytes))"
    val pairs = (nBytes to 1 by -1)
      .map(i => s"substring($h, ${2 * i - 1}, 2)").mkString(", ")
    s"CAST(conv(concat($pairs), 16, 10) AS BIGINT)"
  }

  /** Q262: WAV HEADER DECODE — the multimodal family's first
    * CONTENT-AWARE operator (VERDICT r8 task 5): parse the canonical
    * 44-byte RIFF/WAVE PCM header (a fixed PUBLIC format: pure
    * little-endian integer fields, no codec) from REAL staged .wav
    * blobs ([[Media.stagedWavRoot]]) read through `binaryFile`. Every
    * published field — channels, sample rate, byte rate, bit depth,
    * data size, the derived duration — is DECODED FROM THE BYTES;
    * the DuckDB oracle recomputes the same integers from the
    * documents table (the staging derivations), so the hash compare
    * proves the byte-level parse end-to-end. `header_ok` pins the
    * four magic tags + PCM format word; `duration_us` is the exact
    * integer microsecond duration data·10⁶ div byte_rate.
    * MultimodalSpec additionally pins the parser against an in-test
    * literal WAV byte array (kernel/literal identity) and a
    * corrupted-magic rejection.
    *
    * Scale shape: binaryFile parallelizes per file; the header parse
    * reads the blob's FIRST 44 bytes inside the scan task as pure
    * codegen'd expressions ([[leInt]] — hex/substring/conv builtins,
    * no UDF, no shuffle of content); the manifest rows are 9 narrow
    * columns and the only exchange is the output sort. */
  /** Append the parsed RIFF/WAVE header fields to a frame carrying
    * (`content` BINARY, `n_bytes` BIGINT). Package-visible so
    * MultimodalSpec can drive it against literal byte arrays
    * (kernel/literal identity + corrupted-magic rejection). */
  private[graft] def parseWavHeader(df: DataFrame): DataFrame =
    df.withColumn("header_ok", expr(
        "cast(substring(content, 1, 4) as string) = 'RIFF' AND " +
          "cast(substring(content, 9, 4) as string) = 'WAVE' AND " +
          "cast(substring(content, 13, 4) as string) = 'fmt ' AND " +
          "cast(substring(content, 37, 4) as string) = 'data' AND " +
          leInt(21, 2) + " = 1 AND " + // PCM format word
          leInt(5, 4) + " = n_bytes - 8")) // RIFF chunk size spans the file
      .withColumn("channels", expr(leInt(23, 2)))
      .withColumn("sample_rate", expr(leInt(25, 4)))
      .withColumn("byte_rate", expr(leInt(29, 4)))
      .withColumn("bits_per_sample", expr(leInt(35, 2)))
      .withColumn("data_bytes", expr(leInt(41, 4)))
      .withColumn("duration_us",
        expr("data_bytes * 1000000 div byte_rate"))

  /** Q264: PCM SAMPLE STATISTICS — decode the DATA section, not just
    * the header: the staged WAVs' payloads are decoded as signed
    * little-endian int16 PCM samples and reduced to the loudness/
    * clipping gate an audio curation pipeline actually runs — sample
    * count, peak |amplitude| (clipping detector), Σ|s| and Σs²
    * (exact BIGINT witnesses), mean |s| (half-up micro-units) and RMS
    * (IEEE sqrt of the exact ratio, the q256 cast discipline). With
    * q262 this graduates the family from "hash the bytes" to "parse
    * the format AND decode the payload".
    *
    * Decode convention (pinned on both engines): only FULL samples
    * are decoded (a trailing odd byte is ignored — data_bytes div 2
    * samples); files with zero full samples are dropped. Sign: v ≥
    * 2¹⁵ ⇒ v − 2¹⁶ (two's complement int16) — the staged ASCII
    * payloads never exercise it, so MultimodalSpec pins the sign
    * branch against a literal high-byte sample.
    *
    * Scale shape: per-file-parallel binaryFile scan; the sample loop
    * is an in-expression aggregate over the file's OWN bytes (hex
    * slice → conv per sample — per-file work bounded by blob size,
    * the inherent decode cost; nothing row-scale shuffles); output is
    * 7 narrow columns, one exchange (the sort). */
  def wavSampleStats(spark: SparkSession, dir: String): DataFrame = {
    val root = Media.stagedWavRoot(spark, dir)
    val sgn = (v: String) => s"(CASE WHEN $v >= 32768 THEN $v - 65536 ELSE $v END)"
    // signed int16 at sample index i (0-based) of the hex-encoded data
    // section: low byte first (LE)
    val sample = sgn("CAST(conv(concat(substring(h, i * 4 + 3, 2), " +
      "substring(h, i * 4 + 1, 2)), 16, 10) AS BIGINT)")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.wav$", 1).cast("long").as("doc_id"),
        col("content"))
      .withColumn("data_bytes", expr(leInt(41, 4)))
      .withColumn("ns", expr("data_bytes div 2"))
      .filter(col("ns") >= 1)
      .withColumn("h",
        expr("hex(substring(content, 45, cast(ns * 2 as int)))"))
      .withColumn("st", expr(
        s"""aggregate(sequence(0, cast(ns as int) - 1),
           |  named_struct('sa', 0L, 'sq', 0L, 'pk', 0L),
           |  (a, i) -> named_struct(
           |    'sa', a.sa + abs($sample),
           |    'sq', a.sq + $sample * $sample,
           |    'pk', greatest(a.pk, abs($sample))))""".stripMargin))
      .select(col("doc_id"),
        col("ns").as("n_samples"),
        col("st.pk").as("peak_abs"),
        col("st.sa").as("sum_abs"),
        col("st.sq").as("sum_sq"),
        (expr("(2 * st.sa * 1000000 + ns) div (2 * ns)").cast("double") / 1000000)
          .as("mean_abs"),
        sqrt(col("st.sq").cast("double") / col("ns").cast("double")).as("rms"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the corpus is ASCII (the q260 byte≡codepoint argument),
    * so sample bytes recompute from the text's characters: sample i =
    * ascii(c_{2i+1}) + 256·ascii(c_{2i+2}), then the SIGNED int16 fold
    * (v ≥ 2¹⁵ ⇒ v − 2¹⁶) is applied EXPLICITLY — on the staged ASCII
    * payloads it is the identity, but q270's turning-point
    * classification is order-sensitive and unsigned-vs-signed is not
    * order-preserving, so the convention must live in the oracle text
    * rather than ride on the fixture's byte range (advisor r9). The
    * sign branch is additionally spec-pinned on a literal high-byte
    * sample. */
  val wavSampleStatsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, octet_length(encode(text)) // 2 AS ns
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}),
       |s AS (
       |  SELECT doc_id, ns,
       |    list_transform(list_transform(generate_series(0, CAST(ns AS INT) - 1),
       |        i -> ascii(substring(text, 2*i + 1, 1))
       |             + 256 * ascii(substring(text, 2*i + 2, 1))),
       |      v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS xs
       |  FROM d WHERE ns >= 1)
       |SELECT doc_id, CAST(ns AS BIGINT) AS n_samples,
       |  CAST(list_max(list_transform(xs, v -> abs(v))) AS BIGINT) AS peak_abs,
       |  CAST(list_sum(list_transform(xs, v -> abs(v))) AS BIGINT) AS sum_abs,
       |  CAST(list_sum(list_transform(xs, v -> v * v)) AS BIGINT) AS sum_sq,
       |  CAST((2 * list_sum(list_transform(xs, v -> abs(v))) * 1000000 + ns)
       |    // (2 * ns) AS DOUBLE) / 1000000 AS mean_abs,
       |  sqrt(CAST(list_sum(list_transform(xs, v -> v * v)) AS DOUBLE)
       |    / CAST(ns AS DOUBLE)) AS rms
       |FROM s ORDER BY doc_id""".stripMargin

  /** Q270: TURNING-POINTS RANDOMNESS TEST over the decoded PCM — the
    * classic signal-level randomness screen (Kendall's turning-point
    * test): a sample is a turning point when it is a STRICT local
    * max or min of its neighbor triple; for an i.i.d. series the
    * count concentrates at E = 2(n−2)/3 with Var = (16n−29)/90, so
    * the published z flags audio whose waveform is too smooth
    * (|z| large negative — speech/music structure, constant fill) or
    * too oscillatory (large positive — alternating/noise patterns)
    * for its length. Extends q264's amplitude gates (loudness,
    * clipping) with the SHAPE gate an audio curation pass runs, and
    * is the signal-domain sibling of q243's runs test (which
    * binarizes around a median; turning points use the full local
    * order structure). Tie convention (pinned on both engines): a
    * plateau edge is NOT a turning point — strict inequalities both
    * sides.
    *
    * Exactness: the decode is q264's (signed LE int16, full samples
    * only); the count is an exact integer filter over the sample
    * array; E and z are ONE fixed dag of IEEE ops on (tp, n) —
    * identical cross-engine (the q245 discipline).
    *
    * Scale shape: per-file-parallel binaryFile scan; ONE
    * array-build pass (transform) + one bounded filter per file —
    * all in-expression against the file's own bytes (inherent decode
    * cost, nothing row-scale shuffles); the only exchange is the
    * output sort. */
  def wavTurningPoints(spark: SparkSession, dir: String): DataFrame = {
    val root = Media.stagedWavRoot(spark, dir)
    val sgn = (v: String) => s"(CASE WHEN $v >= 32768 THEN $v - 65536 ELSE $v END)"
    val sample = sgn("CAST(conv(concat(substring(h, i * 4 + 3, 2), " +
      "substring(h, i * 4 + 1, 2)), 16, 10) AS BIGINT)")
    val nsd = col("n_samples").cast("double")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.wav$", 1).cast("long").as("doc_id"),
        col("content"))
      .withColumn("ns", expr(s"${leInt(41, 4)} div 2"))
      .filter(col("ns") >= 3)
      .withColumn("h",
        expr("hex(substring(content, 45, cast(ns * 2 as int)))"))
      .withColumn("xs", expr(
        s"transform(sequence(0, cast(ns as int) - 1), i -> $sample)"))
      .select(col("doc_id"), col("ns").as("n_samples"),
        expr("""CAST(size(filter(sequence(2, cast(ns as int) - 1), i ->
               |  (element_at(xs, i) > element_at(xs, i - 1)
               |    AND element_at(xs, i) > element_at(xs, i + 1)) OR
               |  (element_at(xs, i) < element_at(xs, i - 1)
               |    AND element_at(xs, i) < element_at(xs, i + 1)))) AS BIGINT)"""
          .stripMargin).as("n_turning"))
      .withColumn("e_turning", lit(2.0) * (nsd - lit(2.0)) / lit(3.0))
      .withColumn("z_turning",
        (col("n_turning").cast("double") - lit(2.0) * (nsd - lit(2.0)) / lit(3.0))
          / sqrt((lit(16.0) * nsd - lit(29.0)) / lit(90.0)))
      .orderBy(col("doc_id"))
  }

  /** Oracle: q264's sample recomputation from the text characters
    * (ASCII byte ≡ codepoint), with the identical strict-extremum
    * filter and the identical z dag. */
  val wavTurningPointsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, octet_length(encode(text)) // 2 AS ns
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}),
       |s AS (
       |  SELECT doc_id, ns,
       |    list_transform(list_transform(generate_series(0, CAST(ns AS INT) - 1),
       |        i -> ascii(substring(text, 2*i + 1, 1))
       |             + 256 * ascii(substring(text, 2*i + 2, 1))),
       |      v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS xs
       |  FROM d WHERE ns >= 3),
       |t AS (
       |  SELECT doc_id, CAST(ns AS BIGINT) AS n_samples,
       |    CAST(len(list_filter(generate_series(2, CAST(ns AS INT) - 1), i ->
       |      (xs[i] > xs[i - 1] AND xs[i] > xs[i + 1]) OR
       |      (xs[i] < xs[i - 1] AND xs[i] < xs[i + 1]))) AS BIGINT) AS n_turning
       |  FROM s)
       |SELECT doc_id, n_samples, n_turning,
       |  2.0 * (CAST(n_samples AS DOUBLE) - 2.0) / 3.0 AS e_turning,
       |  (CAST(n_turning AS DOUBLE)
       |     - 2.0 * (CAST(n_samples AS DOUBLE) - 2.0) / 3.0)
       |    / SQRT((16.0 * CAST(n_samples AS DOUBLE) - 29.0) / 90.0) AS z_turning
       |FROM t ORDER BY doc_id""".stripMargin

  /** Q278: STEREO CHANNEL DE-INTERLEAVE — per-channel sample
    * statistics for the 2-channel WAVs: q264 reduces the payload as
    * one mono stream, but a real stereo PCM frame interleaves
    * [L, R] samples, and channel-aware curation (dead-channel
    * detection, L/R imbalance) must DE-INTERLEAVE first. Stereo
    * files are selected BY THE DECODED HEADER FIELD (channels = 2
    * parsed from the bytes, not from the staging rule — the
    * content-aware discipline); sample i belongs to channel i mod 2.
    * Per (file, channel): sample count, Σ|s| and peak |s| — the
    * q264 gates, split by channel. Convention (pinned): a trailing
    * lone L sample (odd full-sample count) still counts for channel
    * 0 — de-interleave is per-sample parity, not per-complete-frame.
    *
    * Exactness: q264's decode (signed LE int16, full samples only);
    * all outputs exact BIGINTs.
    *
    * Scale shape: per-file-parallel binaryFile scan; ONE
    * in-expression fold carrying both channels' accumulators (the
    * file's own bytes — inherent decode cost), a 2-element explode,
    * output sort. */
  def wavChannelStats(spark: SparkSession, dir: String): DataFrame = {
    val root = Media.stagedWavRoot(spark, dir)
    val sgn = (v: String) => s"(CASE WHEN $v >= 32768 THEN $v - 65536 ELSE $v END)"
    val sample = sgn("CAST(conv(concat(substring(h, i * 4 + 3, 2), " +
      "substring(h, i * 4 + 1, 2)), 16, 10) AS BIGINT)")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.wav$", 1).cast("long").as("doc_id"),
        col("content"))
      .withColumn("channels", expr(leInt(23, 2)))
      .filter(col("channels") === 2)
      .withColumn("ns", expr(s"${leInt(41, 4)} div 2"))
      .filter(col("ns") >= 1)
      .withColumn("h",
        expr("hex(substring(content, 45, cast(ns * 2 as int)))"))
      .withColumn("st", expr(
        s"""aggregate(sequence(0, cast(ns as int) - 1),
           |  named_struct('sa0', 0L, 'pk0', 0L, 'sa1', 0L, 'pk1', 0L),
           |  (a, i) -> CASE WHEN i % 2 = 0 THEN named_struct(
           |      'sa0', a.sa0 + abs($sample),
           |      'pk0', greatest(a.pk0, abs($sample)),
           |      'sa1', a.sa1, 'pk1', a.pk1)
           |    ELSE named_struct('sa0', a.sa0, 'pk0', a.pk0,
           |      'sa1', a.sa1 + abs($sample),
           |      'pk1', greatest(a.pk1, abs($sample))) END)""".stripMargin))
      .select(col("doc_id"), col("ns"),
        explode(expr(
          """array(
            |  named_struct('channel', 0L, 'n_samples', (ns + 1) div 2,
            |    'sum_abs', st.sa0, 'peak_abs', st.pk0),
            |  named_struct('channel', 1L, 'n_samples', ns div 2,
            |    'sum_abs', st.sa1, 'peak_abs', st.pk1))""".stripMargin)).as("c"))
      .filter(col("c.n_samples") >= 1)
      .select(col("doc_id"), col("c.channel").as("channel"),
        col("c.n_samples").as("n_samples"),
        col("c.sum_abs").as("sum_abs"), col("c.peak_abs").as("peak_abs"))
      .orderBy(col("doc_id"), col("channel"))
  }

  /** Oracle: stereo files are exactly the staging rule's doc_id%2=1
    * (agreement with the engine's header-decoded channel count IS the
    * parse check); per-channel sums recompute from index parity over
    * the text characters (the q264 ASCII argument). */
  val wavChannelStatsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, octet_length(encode(text)) // 2 AS ns
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}
       |    AND doc_id % 2 = 1),
       |s AS (
       |  SELECT doc_id, ns,
       |    list_transform(list_transform(generate_series(0, CAST(ns AS INT) - 1),
       |        i -> ascii(substring(text, 2*i + 1, 1))
       |             + 256 * ascii(substring(text, 2*i + 2, 1))),
       |      v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS xs
       |  FROM d WHERE ns >= 1),
       |ch AS (
       |  SELECT doc_id, 0 AS channel, (ns + 1) // 2 AS n_samples,
       |    list_sum(list_transform(
       |      list_filter(generate_series(0, CAST(ns AS INT) - 1), i -> i % 2 = 0),
       |      i -> abs(xs[i + 1]))) AS sum_abs,
       |    list_max(list_transform(
       |      list_filter(generate_series(0, CAST(ns AS INT) - 1), i -> i % 2 = 0),
       |      i -> abs(xs[i + 1]))) AS peak_abs
       |  FROM s
       |  UNION ALL
       |  SELECT doc_id, 1 AS channel, ns // 2 AS n_samples,
       |    list_sum(list_transform(
       |      list_filter(generate_series(0, CAST(ns AS INT) - 1), i -> i % 2 = 1),
       |      i -> abs(xs[i + 1]))) AS sum_abs,
       |    list_max(list_transform(
       |      list_filter(generate_series(0, CAST(ns AS INT) - 1), i -> i % 2 = 1),
       |      i -> abs(xs[i + 1]))) AS peak_abs
       |  FROM s)
       |SELECT doc_id, CAST(channel AS BIGINT) AS channel,
       |  CAST(n_samples AS BIGINT) AS n_samples,
       |  CAST(sum_abs AS BIGINT) AS sum_abs,
       |  CAST(peak_abs AS BIGINT) AS peak_abs
       |FROM ch WHERE n_samples >= 1
       |ORDER BY doc_id, channel""".stripMargin

  def wavDecode(spark: SparkSession, dir: String): DataFrame = {
    val root = Media.stagedWavRoot(spark, dir)
    val scanned = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.wav$", 1).cast("long").as("doc_id"),
        col("length").cast("long").as("n_bytes"),
        col("content"))
    parseWavHeader(scanned)
      .select(col("doc_id"), col("header_ok"), col("channels"),
        col("sample_rate"), col("byte_rate"), col("bits_per_sample"),
        col("data_bytes"), col("n_bytes"), col("duration_us"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: recomputes every header field from the STAGING
    * derivations (channels/rate from doc_id, sizes from the text
    * bytes) — shares no parsing logic with the engine, so agreement
    * proves the byte-level decode. */
  val wavDecodeSql: String = {
    val rates = Media.WavRates.mkString("[", ",", "]")
    val bytesPerSample = Media.WavBits / 8 // exact in Scala, no SQL float div
    s"""SELECT doc_id, TRUE AS header_ok,
       |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
       |  CAST($rates[(doc_id % 3) + 1] AS BIGINT) AS sample_rate,
       |  CAST($rates[(doc_id % 3) + 1] * (doc_id % 2 + 1) * $bytesPerSample AS BIGINT)
       |    AS byte_rate,
       |  CAST(${Media.WavBits} AS BIGINT) AS bits_per_sample,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS data_bytes,
       |  CAST(octet_length(encode(text)) + 44 AS BIGINT) AS n_bytes,
       |  CAST(octet_length(encode(text)) * 1000000
       |    // ($rates[(doc_id % 3) + 1] * (doc_id % 2 + 1) * $bytesPerSample) AS BIGINT)
       |    AS duration_us
       |FROM documents
       |WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}
       |ORDER BY doc_id""".stripMargin
  }

  /** Per-asset 16-bin byte histogram as PURE codegen'd string
    * builtins (no UDF, no HOF fold): bin of a byte = byte mod 16 =
    * its LOW hex nibble, so the 16 bin counts are character counts
    * over the low-nibble projection of hex(content) — one
    * regexp_replace keeps each byte pair's second char, then
    * count(digit d) = len − len(replace(d)). O(16·n_bytes) linear
    * scans per asset, all inside whole-stage codegen. Package-visible
    * so MultimodalSpec can pin it bin-by-bin against the q42
    * mapPartitions kernel. */
  private[graft] def byteHistogramExpr(assets: DataFrame): DataFrame = {
    val bins = "0123456789ABCDEF".map { d =>
      (length(col("low")) - length(expr(s"replace(low, '$d', '')"))).cast("long")
    }
    assets
      .withColumn("nb", octet_length(col("content")).cast("long"))
      .withColumn("low", regexp_replace(hex(col("content")), ".(.)", "$1"))
      .withColumn("bins", array(bins: _*))
      .drop("low")
  }

  /** Q288: BYTE-HISTOGRAM FEATURES, EXPRESSION FORM — the fully-
    * oracled twin of q42 (VERDICT r9 task 2, the last un-twinned ⊙):
    * the SAME 16-bin byte histogram q42's mapPartitions kernel
    * computes, re-expressed as [[byteHistogramExpr]]'s codegen'd
    * column pipeline so DuckDB can replay it end-to-end. Publishes
    * q42's per-kind means (identical dag: per-asset count/total in
    * double, dec6(avg)) PLUS the exact BIGINT witnesses (Σ bin
    * counts, Σ bytes) the float means are derived from. q42 itself
    * stays in the registry as the batch-contract demonstration (the
    * mapInPandas shape); MultimodalSpec pins twin ≡ kernel bin-by-bin
    * per asset and row-by-row on the rollup.
    *
    * Scale shape: one narrow scan, per-asset work linear in blob
    * size (the inherent feature cost), map-side-combinable ≤3-group
    * rollup, output sort. */
  def mediaFeaturesTwin(spark: SparkSession, dir: String): DataFrame = {
    val b = byteHistogramExpr(Media.assets(spark, dir))
      .select(col("kind"), col("nb"),
        element_at(col("bins"), 1).as("c0"),
        element_at(col("bins"), 2).as("c1"))
      // zero-byte assets: q42's kernel leaves the all-zero histogram
      // unnormalized, so the feature is 0.0, never 0/0
      .withColumn("f0", when(col("nb") > 0,
        col("c0").cast("double") / col("nb").cast("double")).otherwise(lit(0.0)))
      .withColumn("f1", when(col("nb") > 0,
        col("c1").cast("double") / col("nb").cast("double")).otherwise(lit(0.0)))
    b.groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("c0")).cast("long").as("sum_bin0"),
        sum(col("c1")).cast("long").as("sum_bin1"),
        sum(col("nb")).cast("long").as("sum_bytes"),
        dec6(avg(col("f0"))).as("mean_bin0"),
        dec6(avg(col("f1"))).as("mean_bin1"))
      .orderBy(col("kind"))
  }

  /** Oracle: the identical nibble-projection trick — DuckDB's
    * regexp_replace needs the explicit 'g' flag and \\1 backrefs;
    * hex() is uppercase on both engines. */
  val mediaFeaturesTwinSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb,
      |    regexp_replace(hex(encode(text)), '.(.)', '\1', 'g') AS low
      |  FROM documents),
      |c AS (
      |  SELECT kind, nb,
      |    CAST(length(low) - length(replace(low, '0', '')) AS BIGINT) AS c0,
      |    CAST(length(low) - length(replace(low, '1', '')) AS BIGINT) AS c1
      |  FROM m)
      |SELECT kind, COUNT(*) AS n_assets,
      |  CAST(SUM(c0) AS BIGINT) AS sum_bin0,
      |  CAST(SUM(c1) AS BIGINT) AS sum_bin1,
      |  CAST(SUM(nb) AS BIGINT) AS sum_bytes,
      |  CAST(CAST(ROUND(AVG(CASE WHEN nb > 0
      |    THEN CAST(c0 AS DOUBLE) / nb ELSE 0.0 END), 6)
      |    AS DECIMAL(38,6)) AS DOUBLE) AS mean_bin0,
      |  CAST(CAST(ROUND(AVG(CASE WHEN nb > 0
      |    THEN CAST(c1 AS DOUBLE) / nb ELSE 0.0 END), 6)
      |    AS DECIMAL(38,6)) AS DOUBLE) AS mean_bin1
      |FROM c GROUP BY kind ORDER BY kind""".stripMargin

  /** Append the parsed 54-byte BMP header fields to a frame carrying
    * (`content` BINARY, `n_bytes` BIGINT). Package-visible so
    * MultimodalSpec can drive it against literal byte arrays
    * (kernel/literal identity + corrupted-magic rejection), mirroring
    * [[parseWavHeader]]. */
  private[graft] def parseBmpHeader(df: DataFrame): DataFrame =
    df.withColumn("width", expr(leInt(19, 4)))
      .withColumn("height", expr(leInt(23, 4)))
      .withColumn("bpp", expr(leInt(29, 2)))
      // 24-bit rows pad to the next 4-byte boundary
      .withColumn("row_stride", expr("(3 * width + 3) div 4 * 4"))
      .withColumn("img_bytes", expr(leInt(35, 4)))
      .withColumn("header_ok", expr(
        "cast(substring(content, 1, 2) as string) = 'BM' AND " +
          leInt(3, 4) + " = n_bytes AND " + // file size spans the file
          leInt(11, 4) + " = 54 AND " + // pixel-array offset
          leInt(15, 4) + " = 40 AND " + // BITMAPINFOHEADER
          leInt(27, 2) + " = 1 AND " + // planes
          "bpp = 24 AND " +
          leInt(31, 4) + " = 0 AND " + // BI_RGB: uncompressed
          "img_bytes = height * row_stride AND " +
          "img_bytes = n_bytes - 54"))

  /** Q289: BMP HEADER DECODE — the image twin of q262 (VERDICT r9
    * task 4): parse the canonical 54-byte uncompressed 24-bit BMP
    * header (BITMAPFILEHEADER + BITMAPINFOHEADER, a fixed PUBLIC
    * little-endian format) from REAL staged .bmp blobs
    * ([[Media.stagedBmpRoot]]) read through `binaryFile`. Every
    * published field — width, height, bpp, row stride, image size,
    * pixel count — is DECODED FROM THE BYTES; the DuckDB oracle
    * recomputes the same integers from the documents table (the
    * staging derivations), so the hash compare proves the byte-level
    * parse end-to-end. `header_ok` pins the magic, both size fields,
    * the fixed offsets, and the height·stride identity. Width is read
    * as unsigned ([[leInt]]) — a signed int32 field, but the fixture
    * widths are tiny positives and a top-down (negative-height) BMP
    * is out of scope by construction.
    *
    * Scale shape: per-file-parallel binaryFile scan; the header
    * parse reads the blob's first 54 bytes as codegen'd expressions;
    * the only exchange is the output sort. */
  def bmpDecode(spark: SparkSession, dir: String): DataFrame = {
    val root = Media.stagedBmpRoot(spark, dir)
    val scanned = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bmp")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.bmp$", 1).cast("long").as("doc_id"),
        col("length").cast("long").as("n_bytes"),
        col("content"))
    parseBmpHeader(scanned)
      .select(col("doc_id"), col("header_ok"), col("width"), col("height"),
        col("bpp"), col("row_stride"), col("img_bytes"), col("n_bytes"),
        (col("width") * col("height")).as("n_pixels"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: recomputes every header field from the STAGING
    * derivations (width from doc_id, height from the text length) —
    * shares no parsing logic with the engine. */
  val bmpDecodeSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(doc_id % ${Media.BmpWidthMod} + 1 AS BIGINT) AS w,
       |    CAST((3 * (doc_id % ${Media.BmpWidthMod} + 1) + 3) // 4 * 4 AS BIGINT) AS rs,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch})
       |SELECT doc_id, TRUE AS header_ok, w AS width, len // rs AS height,
       |  CAST(24 AS BIGINT) AS bpp, rs AS row_stride,
       |  (len // rs) * rs AS img_bytes,
       |  54 + (len // rs) * rs AS n_bytes,
       |  w * (len // rs) AS n_pixels
       |FROM d WHERE len >= rs
       |ORDER BY doc_id""".stripMargin

  /** Q290: BMP PIXEL-CHANNEL STATISTICS — decode the PIXEL ARRAY, not
    * just the header (the image q264): per staged image, exact per-
    * channel byte sums and peaks over the B, G, R planes plus the
    * half-up micro-unit channel means an image-curation gate
    * (black-frame detection, channel imbalance, over-exposure) runs.
    * Row PADDING IS LOAD-BEARING: each row of a 24-bit BMP pads to a
    * 4-byte boundary and the staged pad positions carry REAL text
    * bytes (not zeros), so a decoder that naively sums the whole
    * pixel region gets wrong answers — the published pad_sum witness
    * plus the conservation identity sum_b + sum_g + sum_r + pad_sum =
    * Σ(all pixel-region bytes) lets the oracle (and Round10Spec)
    * verify the skip logic exactly. Geometry (width → stride) comes
    * from the DECODED header fields, not the staging rule.
    *
    * Exactness: byte sums/peaks are exact BIGINTs; means use q264's
    * half-up micro-unit dag ((2·s·10⁶ + n) div (2n), integer-exact).
    *
    * Scale shape: per-file-parallel binaryFile scan; ONE in-expression
    * fold over pixel indices carrying all three channel accumulators
    * + the pad accumulator (per-file work linear in blob size — the
    * inherent decode cost; nothing row-scale shuffles); output sort
    * is the only exchange. */
  def bmpPixelStats(spark: SparkSession, dir: String): DataFrame = {
    val root = Media.stagedBmpRoot(spark, dir)
    // unsigned byte at 0-based offset `o` of the hex-encoded pixel array
    def byteAt(o: String) =
      s"CAST(conv(substring(hx, ($o) * 2 + 1, 2), 16, 10) AS BIGINT)"
    val px = (c: Int) => byteAt(s"(i div width) * row_stride + 3 * (i % width) + $c")
    val scanned = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bmp")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.bmp$", 1).cast("long").as("doc_id"),
        col("length").cast("long").as("n_bytes"),
        col("content"))
    parseBmpHeader(scanned)
      .filter(col("header_ok") && col("width") * col("height") >= 1)
      .withColumn("hx", expr("hex(substring(content, 55, cast(img_bytes as int)))"))
      .withColumn("st", expr(
        s"""aggregate(sequence(0, cast(width * height as int) - 1),
           |  named_struct('sb', 0L, 'sg', 0L, 'sr', 0L,
           |               'pb', 0L, 'pg', 0L, 'pr', 0L),
           |  (a, i) -> named_struct(
           |    'sb', a.sb + ${px(0)}, 'sg', a.sg + ${px(1)},
           |    'sr', a.sr + ${px(2)},
           |    'pb', greatest(a.pb, ${px(0)}),
           |    'pg', greatest(a.pg, ${px(1)}),
           |    'pr', greatest(a.pr, ${px(2)})))""".stripMargin))
      // padding witness: the row-tail positions [3·width, stride) of
      // every row, summed — conservation against the whole-region sum.
      // width ≡ 0 (mod 4) rows have NO padding: the CASE guard keeps
      // the fold's per-row modulus off zero (Spark's sequence(0, -1)
      // is a DESCENDING range, not empty — the lambda would run)
      .withColumn("pad_sum", expr(
        s"""CASE WHEN row_stride = 3 * width THEN 0L ELSE
           |  aggregate(sequence(0, cast(height * (row_stride - 3 * width) as int) - 1),
           |    0L, (a, i) -> a + ${byteAt(
             "(i div (row_stride - 3 * width)) * row_stride + 3 * width" +
               " + (i % (row_stride - 3 * width))")}) END""".stripMargin))
      .select(col("doc_id"), col("width"), col("height"),
        (col("width") * col("height")).as("n_pixels"),
        col("st.sb").as("sum_b"), col("st.sg").as("sum_g"),
        col("st.sr").as("sum_r"),
        col("st.pb").as("peak_b"), col("st.pg").as("peak_g"),
        col("st.pr").as("peak_r"), col("pad_sum"),
        (expr("(2 * st.sb * 1000000 + width * height) div (2 * width * height)")
          .cast("double") / 1000000).as("mean_b"),
        (expr("(2 * st.sg * 1000000 + width * height) div (2 * width * height)")
          .cast("double") / 1000000).as("mean_g"),
        (expr("(2 * st.sr * 1000000 + width * height) div (2 * width * height)")
          .cast("double") / 1000000).as("mean_r"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the corpus is ASCII (byte ≡ codepoint — the q264
    * argument), so pixel bytes recompute from the text's characters
    * at the SAME stride/padding index math, sharing no decode logic
    * with the engine. */
  val bmpPixelStatsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    CAST(doc_id % ${Media.BmpWidthMod} + 1 AS BIGINT) AS w,
       |    CAST((3 * (doc_id % ${Media.BmpWidthMod} + 1) + 3) // 4 * 4 AS BIGINT) AS rs,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}),
       |g AS (
       |  SELECT doc_id, text, w, rs, len // rs AS h, w * (len // rs) AS np
       |  FROM d WHERE len >= rs),
       |ch AS (
       |  SELECT doc_id, w, rs, h, np,
       |    list_transform(generate_series(0, CAST(np AS INT) - 1), i ->
       |      ascii(substring(text, CAST((i // w) * rs + 3 * (i % w) + 1 AS INT), 1))) AS bs,
       |    list_transform(generate_series(0, CAST(np AS INT) - 1), i ->
       |      ascii(substring(text, CAST((i // w) * rs + 3 * (i % w) + 2 AS INT), 1))) AS gs,
       |    list_transform(generate_series(0, CAST(np AS INT) - 1), i ->
       |      ascii(substring(text, CAST((i // w) * rs + 3 * (i % w) + 3 AS INT), 1))) AS rrs,
       |    CASE WHEN rs > 3 * w THEN
       |      list_sum(list_transform(
       |        generate_series(0, CAST(h * (rs - 3 * w) AS INT) - 1, 1), i ->
       |        ascii(substring(text,
       |          CAST((i // (rs - 3 * w)) * rs + 3 * w + (i % (rs - 3 * w)) + 1 AS INT),
       |          1))))
       |    ELSE 0 END AS pad_sum
       |  FROM g)
       |SELECT doc_id, w AS width, h AS height, np AS n_pixels,
       |  CAST(list_sum(bs) AS BIGINT) AS sum_b,
       |  CAST(list_sum(gs) AS BIGINT) AS sum_g,
       |  CAST(list_sum(rrs) AS BIGINT) AS sum_r,
       |  CAST(list_max(bs) AS BIGINT) AS peak_b,
       |  CAST(list_max(gs) AS BIGINT) AS peak_g,
       |  CAST(list_max(rrs) AS BIGINT) AS peak_r,
       |  CAST(pad_sum AS BIGINT) AS pad_sum,
       |  CAST((2 * list_sum(bs) * 1000000 + np) // (2 * np) AS DOUBLE) / 1000000
       |    AS mean_b,
       |  CAST((2 * list_sum(gs) * 1000000 + np) // (2 * np) AS DOUBLE) / 1000000
       |    AS mean_g,
       |  CAST((2 * list_sum(rrs) * 1000000 + np) // (2 * np) AS DOUBLE) / 1000000
       |    AS mean_r
       |FROM ch ORDER BY doc_id""".stripMargin

  /** Fingerprint geometry for q294/q295: 56 bits (7 bands × 8 bits —
    * bit 56+ would sign-wrap BIGINT shifts differently across
    * engines), each bit the mean-luma vote of one contiguous
    * pixel-index band; Hamming radius 3 ⇒ ≥ 4 of 7 bands intact on
    * any near-pair (pigeonhole), so band-collision candidate
    * generation is LOSSLESS at the radius. */
  private val FpBits = 56
  private val FpBands = 7
  private val FpHamming = 3

  /** Per-image 56-bit BLOCK-LUMA fingerprint from the REAL decoded
    * pixels: luma = 299R + 587G + 114B (integer ITU-R BT.601 ×1000),
    * pixel-index band b = [b·np/56, (b+1)·np/56), bit b = 1 iff the
    * band's mean luma exceeds the image mean — decided by EXACT
    * cross-multiplication in DECIMAL(38) (sum_band·np vs
    * sum_total·n_band; the products pass BIGINT at ~1e8-pixel files).
    * One in-expression pass over the pixel array (each pixel visited
    * by exactly one band fold); np ≥ 56 keeps every band non-empty
    * (and every sequence() ascending — the q290 lesson). */
  private[graft] def bmpFingerprints(spark: SparkSession, root: String,
      gen: Int): DataFrame = {
    def byteAt(o: String) =
      s"CAST(conv(substring(hx, ($o) * 2 + 1, 2), 16, 10) AS BIGINT)"
    val px = (c: Int) => byteAt(s"(i div width) * row_stride + 3 * (i % width) + $c")
    val luma = s"(299 * ${px(2)} + 587 * ${px(1)} + 114 * ${px(0)})"
    val scanned = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bmp")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.bmp$", 1).cast("long").as("doc_id"),
        col("length").cast("long").as("n_bytes"),
        col("content"))
    parseBmpHeader(scanned)
      .filter(col("header_ok"))
      .withColumn("np", col("width") * col("height"))
      .filter(col("np") >= FpBits)
      .withColumn("hx", expr("hex(substring(content, 55, cast(img_bytes as int)))"))
      .withColumn("bs", expr(
        s"""transform(sequence(0, ${FpBits - 1}), b ->
           |  aggregate(sequence(cast(b * np div $FpBits as int),
           |                     cast((b + 1) * np div $FpBits as int) - 1),
           |    0L, (a, i) -> a + $luma))""".stripMargin))
      .withColumn("luma_sum", expr("aggregate(bs, 0L, (a, x) -> a + x)"))
      .withColumn("fp", expr(
        s"""aggregate(sequence(0, ${FpBits - 1}), 0L, (f, b) ->
           |  f + CASE WHEN cast(element_at(bs, b + 1) as decimal(38,0)) * np
           |             > cast(luma_sum as decimal(38,0))
           |               * ((b + 1) * np div $FpBits - b * np div $FpBits)
           |           THEN shiftleft(1L, b) ELSE 0L END)""".stripMargin))
      .select(col("doc_id"), lit(gen.toLong).as("gen"),
        col("np").as("n_pixels"), col("luma_sum"), col("fp"))
  }

  /** Q294: PERCEPTUAL IMAGE FINGERPRINT — the image analog of the
    * text dedup family's SimHash (q201): a 56-bit block-luma hash
    * over the REAL decoded pixel array ([[bmpFingerprints]]), fully
    * DuckDB-oracled (the oracle recomputes luma, band sums, and every
    * majority bit from the text bytes with HUGEINT cross-
    * multiplication — no parse logic shared). The exact luma_sum
    * witness rides along.
    *
    * Scale shape: per-file-parallel binaryFile scan, one
    * in-expression pixel pass (the inherent decode cost), output sort
    * the only exchange. */
  def bmpFingerprint(spark: SparkSession, dir: String): DataFrame =
    bmpFingerprints(spark, Media.stagedBmpRoot(spark, dir), 1)
      .select(col("doc_id"), col("n_pixels"), col("luma_sum"), col("fp"))
      .orderBy(col("doc_id"))

  /** Oracle CTE chain recomputing the fingerprint from the documents
    * text. `perturb` replays the gen-2 single-byte edit (+1 mod 256
    * on pixel-array byte 1 = pixel 0's G channel). */
  private def bmpFingerprintSqlCte(tag: String, docFilter: String,
      perturb: Boolean): String = {
    def chan(c: Int, idx: String) =
      if (perturb && c == 1)
        s"(CASE WHEN i = 0 THEN (ascii(substring(text, $idx, 1)) + 1) % 256" +
          s" ELSE ascii(substring(text, $idx, 1)) END)"
      else s"ascii(substring(text, $idx, 1))"
    val idx = (c: Int) => s"CAST((i // w) * rs + 3 * (i % w) + ${c + 1} AS INT)"
    s"""d$tag AS (
       |  SELECT doc_id, text,
       |    CAST(doc_id % ${Media.BmpWidthMod} + 1 AS BIGINT) AS w,
       |    CAST((3 * (doc_id % ${Media.BmpWidthMod} + 1) + 3) // 4 * 4 AS BIGINT) AS rs,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}$docFilter),
       |g$tag AS (
       |  SELECT doc_id, text, w, rs, w * (len // rs) AS np
       |  FROM d$tag WHERE len >= rs AND w * (len // rs) >= $FpBits),
       |l$tag AS (
       |  SELECT doc_id, np,
       |    list_transform(generate_series(0, CAST(np AS INT) - 1), i ->
       |      299 * ${chan(2, idx(2))}
       |      + 587 * ${chan(1, idx(1))}
       |      + 114 * ${chan(0, idx(0))}) AS lumas
       |  FROM g$tag),
       |bb$tag AS (
       |  SELECT doc_id, np,
       |    list_transform(generate_series(0, ${FpBits - 1}), b ->
       |      list_sum(list_slice(lumas,
       |        CAST(b * np // $FpBits + 1 AS INT),
       |        CAST((b + 1) * np // $FpBits AS INT)))) AS bs
       |  FROM l$tag),
       |f$tag AS (
       |  SELECT doc_id, np, bs, list_sum(bs) AS total FROM bb$tag),
       |fp$tag AS (
       |  SELECT doc_id, CAST(np AS BIGINT) AS n_pixels,
       |    CAST(total AS BIGINT) AS luma_sum,
       |    CAST(list_sum(list_transform(generate_series(0, ${FpBits - 1}), b ->
       |      CASE WHEN CAST(bs[CAST(b + 1 AS INT)] AS HUGEINT) * np
       |             > CAST(total AS HUGEINT)
       |               * ((b + 1) * np // $FpBits - b * np // $FpBits)
       |           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS fp
       |  FROM f$tag)""".stripMargin
  }

  val bmpFingerprintSql: String =
    s"""WITH ${bmpFingerprintSqlCte("1", "", perturb = false)}
       |SELECT doc_id, n_pixels, luma_sum, fp FROM fp1
       |ORDER BY doc_id""".stripMargin

  /** Q295: IMAGE NEAR-DUP BY BANDED HAMMING — the multimodal × dedup
    * intersection the brief's near-dup family lacked: pairs of images
    * whose 56-bit perceptual fingerprints differ in ≤ 3 bits, found
    * by LSH BANDING (7 bands × 8 bits: a ≤3-bit difference leaves
    * ≥ 4 bands intact, so every true pair collides in ≥ 1 band —
    * candidate generation is LOSSLESS at the radius, the q31/q201
    * discipline on image content). The corpus is generation 1 plus
    * the gen-2 single-byte-perturbed renditions
    * ([[Media.stagedBmpRootV2]]): each planted (orig, variant) pair
    * shares geometry and all-but-one luma, so the fingerprint differs
    * in the few bands whose mean sits within one byte of the global
    * mean — real near-dups by construction. Verification is the
    * exact popcount of the XOR (bit_count — integer, both engines);
    * candidates additionally block on n_pixels (same-geometry
    * co-key, the q30 length-band analog).
    *
    * Oracle: banding is pure optimization (lossless at the radius),
    * so DuckDB verifies with the direct same-np pair join + exact
    * Hamming filter over its own fingerprint replay — agreement
    * proves decode, fingerprint, banding AND verification end-to-end.
    *
    * Scale shape: candidate-pairs-before-payload — the banded
    * self-join carries (band, value, np, id, gen, fp): the 8-byte
    * fingerprint IS the payload, nothing wider travels; at 100 TB the
    * fingerprint widens and the band count/width scale with corpus
    * cardinality (more selective buckets), the same knob family as
    * q31's band geometry. localCheckpoint: the union frame feeds both
    * sides of the self-join — one decode pass, not two (the q263
    * xOrders rule). */
  def bmpNearDup(spark: SparkSession, dir: String): DataFrame = {
    val fps = bmpFingerprints(spark, Media.stagedBmpRoot(spark, dir), 1)
      .unionByName(bmpFingerprints(spark, Media.stagedBmpRootV2(spark, dir), 2))
      .localCheckpoint()
    val banded = fps.select(col("doc_id"), col("gen"), col("n_pixels"), col("fp"),
      explode(expr(
        s"""transform(sequence(0, ${FpBands - 1}), b ->
           |  named_struct('b', b, 'v', shiftright(fp, b * 8) & 255))""".stripMargin))
        .as("bk"))
      .select(col("bk.b").as("b"), col("bk.v").as("v"), col("n_pixels"),
        col("doc_id"), col("gen"), col("fp"))
    val a = banded.select(col("b"), col("v"), col("n_pixels"),
      col("doc_id").as("id_a"), col("gen").as("gen_a"), col("fp").as("fp_a"))
    val bside = banded.select(col("b"), col("v"), col("n_pixels"),
      col("doc_id").as("id_b"), col("gen").as("gen_b"), col("fp").as("fp_b"))
    a.join(bside, Seq("b", "v", "n_pixels"))
      .filter(col("id_a") < col("id_b") ||
        (col("id_a") === col("id_b") && col("gen_a") < col("gen_b")))
      .select(col("id_a"), col("gen_a"), col("fp_a"),
        col("id_b"), col("gen_b"), col("fp_b"), col("n_pixels"))
      .distinct()
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)").cast("long"))
      .filter(col("hamming") <= FpHamming)
      .select(col("id_a"), col("gen_a"), col("id_b"), col("gen_b"),
        col("n_pixels"), col("hamming"))
      .orderBy(col("id_a"), col("gen_a"), col("id_b"), col("gen_b"))
  }

  val bmpNearDupSql: String =
    s"""WITH ${bmpFingerprintSqlCte("1", "", perturb = false)},
       |${bmpFingerprintSqlCte("2", " AND doc_id % 7 = 0", perturb = true)},
       |u AS (
       |  SELECT doc_id, 1 AS gen, n_pixels, fp FROM fp1
       |  UNION ALL
       |  SELECT doc_id, 2 AS gen, n_pixels, fp FROM fp2)
       |SELECT a.doc_id AS id_a, CAST(a.gen AS BIGINT) AS gen_a,
       |  b.doc_id AS id_b, CAST(b.gen AS BIGINT) AS gen_b,
       |  a.n_pixels,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
       |FROM u a JOIN u b ON a.n_pixels = b.n_pixels
       |  AND (a.doc_id < b.doc_id
       |       OR (a.doc_id = b.doc_id AND a.gen < b.gen))
       |WHERE bit_count(xor(a.fp, b.fp)) <= $FpHamming
       |ORDER BY id_a, gen_a, id_b, gen_b""".stripMargin

  /** Q296: BMP 2×2 BOX-FILTER DOWNSAMPLE — the brief's RESIZE step
    * made content-real for images (Media.resizeStub models only the
    * plumbing; this computes actual output pixels): each output pixel
    * is the integer-floor mean of its ≤2×2 source block (edge blocks
    * at odd width/height average the 1 or 2 pixels that exist —
    * count ∈ {1,2,4}, never zero-padded), per channel, from the REAL
    * decoded pixel array with row padding skipped. Published are the
    * output geometry and the exact per-channel sums and peaks of the
    * DOWNSAMPLED values, which the DuckDB oracle recomputes from the
    * text bytes with the same block index math — agreement proves
    * the resize kernel end-to-end, not just its shape.
    *
    * Convention (pinned both engines): floor division for the block
    * mean (the standard integer box filter); geometry out_w =
    * ⌈w/2⌉, out_h = ⌈h/2⌉ from the DECODED header fields.
    *
    * Scale shape: per-file-parallel binaryFile scan; ONE
    * in-expression fold over output pixels (≤12 byte reads each —
    * work linear in blob size, the inherent resize cost); output
    * sort the only exchange. */
  def bmpDownsample(spark: SparkSession, dir: String): DataFrame = {
    val root = Media.stagedBmpRoot(spark, dir)
    def byteAt(o: String) =
      s"CAST(conv(substring(hx, ($o) * 2 + 1, 2), 16, 10) AS BIGINT)"
    // downsampled channel value at output pixel j (R = j div ow,
    // C = j % ow): floor mean of the bh×bw source block
    def v(c: Int) = {
      def at(r: String, cc: String) =
        byteAt(s"($r) * row_stride + 3 * ($cc) + $c")
      s"""((${at("2 * (j div ow)", "2 * (j % ow)")}
         |  + CASE WHEN 2 * (j % ow) + 1 < width
         |      THEN ${at("2 * (j div ow)", "2 * (j % ow) + 1")} ELSE 0L END
         |  + CASE WHEN 2 * (j div ow) + 1 < height
         |      THEN ${at("2 * (j div ow) + 1", "2 * (j % ow)")} ELSE 0L END
         |  + CASE WHEN 2 * (j % ow) + 1 < width AND 2 * (j div ow) + 1 < height
         |      THEN ${at("2 * (j div ow) + 1", "2 * (j % ow) + 1")} ELSE 0L END)
         | div (least(2L, width - 2 * (j % ow))
         |      * least(2L, height - 2 * (j div ow))))""".stripMargin
    }
    val scanned = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bmp")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.bmp$", 1).cast("long").as("doc_id"),
        col("length").cast("long").as("n_bytes"),
        col("content"))
    parseBmpHeader(scanned)
      .filter(col("header_ok") && col("width") * col("height") >= 1)
      .withColumn("ow", expr("(width + 1) div 2"))
      .withColumn("oh", expr("(height + 1) div 2"))
      .withColumn("hx", expr("hex(substring(content, 55, cast(img_bytes as int)))"))
      .withColumn("st", expr(
        s"""aggregate(sequence(0, cast(ow * oh as int) - 1),
           |  named_struct('sb', 0L, 'sg', 0L, 'sr', 0L,
           |               'pb', 0L, 'pg', 0L, 'pr', 0L),
           |  (a, j) -> named_struct(
           |    'sb', a.sb + ${v(0)}, 'sg', a.sg + ${v(1)},
           |    'sr', a.sr + ${v(2)},
           |    'pb', greatest(a.pb, ${v(0)}),
           |    'pg', greatest(a.pg, ${v(1)}),
           |    'pr', greatest(a.pr, ${v(2)})))""".stripMargin))
      .select(col("doc_id"), col("width"), col("height"),
        col("ow").as("out_w"), col("oh").as("out_h"),
        (col("ow") * col("oh")).as("n_out_pixels"),
        col("st.sb").as("sum_b"), col("st.sg").as("sum_g"),
        col("st.sr").as("sum_r"),
        col("st.pb").as("peak_b"), col("st.pg").as("peak_g"),
        col("st.pr").as("peak_r"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the identical block index math over the text characters
    * (ASCII byte ≡ codepoint) — the staged FILE bytes vs the source
    * TEXT, sharing no decode logic. */
  val bmpDownsampleSql: String = {
    def ch(c: Int, r: String, cc: String) =
      s"ascii(substring(text, CAST(($r) * rs + 3 * ($cc) + ${c + 1} AS INT), 1))"
    def v(c: Int) =
      s"""(${ch(c, "2 * (j // ow)", "2 * (j % ow)")}
         |      + CASE WHEN 2 * (j % ow) + 1 < w
         |          THEN ${ch(c, "2 * (j // ow)", "2 * (j % ow) + 1")} ELSE 0 END
         |      + CASE WHEN 2 * (j // ow) + 1 < h
         |          THEN ${ch(c, "2 * (j // ow) + 1", "2 * (j % ow)")} ELSE 0 END
         |      + CASE WHEN 2 * (j % ow) + 1 < w AND 2 * (j // ow) + 1 < h
         |          THEN ${ch(c, "2 * (j // ow) + 1", "2 * (j % ow) + 1")} ELSE 0 END)
         |     // (least(2, w - 2 * (j % ow)) * least(2, h - 2 * (j // ow)))""".stripMargin
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    CAST(doc_id % ${Media.BmpWidthMod} + 1 AS BIGINT) AS w,
       |    CAST((3 * (doc_id % ${Media.BmpWidthMod} + 1) + 3) // 4 * 4 AS BIGINT) AS rs,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}),
       |g AS (
       |  SELECT doc_id, text, w, rs, len // rs AS h,
       |    (w + 1) // 2 AS ow, (len // rs + 1) // 2 AS oh
       |  FROM d WHERE len >= rs),
       |vals AS (
       |  SELECT doc_id, w, h, ow, oh,
       |    list_transform(generate_series(0, CAST(ow * oh AS INT) - 1), j ->
       |      ${v(0)}) AS vb,
       |    list_transform(generate_series(0, CAST(ow * oh AS INT) - 1), j ->
       |      ${v(1)}) AS vg,
       |    list_transform(generate_series(0, CAST(ow * oh AS INT) - 1), j ->
       |      ${v(2)}) AS vr
       |  FROM g)
       |SELECT doc_id, w AS width, h AS height, ow AS out_w, oh AS out_h,
       |  ow * oh AS n_out_pixels,
       |  CAST(list_sum(vb) AS BIGINT) AS sum_b,
       |  CAST(list_sum(vg) AS BIGINT) AS sum_g,
       |  CAST(list_sum(vr) AS BIGINT) AS sum_r,
       |  CAST(list_max(vb) AS BIGINT) AS peak_b,
       |  CAST(list_max(vg) AS BIGINT) AS peak_g,
       |  CAST(list_max(vr) AS BIGINT) AS peak_r
       |FROM vals ORDER BY doc_id""".stripMargin
  }

  /** Frame-sampling stride for q299 — every 3rd frame, the q43
    * semantics on real container content. Interpolated into BOTH the
    * engine plan and the DuckDB oracle. */
  private val FrameEvery = 3

  /** Append the parsed YUV4MPEG2 stream-header fields to a frame
    * carrying (`content` BINARY, `n_bytes` BIGINT). The header is one
    * newline-terminated ASCII parameter line (magic + geometry +
    * frame rate + interlacing + aspect + colorspace); under `Cmono`
    * each frame is a 6-byte `FRAME\n` marker + exactly width·height
    * luma bytes. `header_ok` pins the full parameter-line grammar,
    * that the payload divides into whole frames, and that EVERY
    * frame's marker bytes are intact (a forall over the frame index
    * space — structural validation of the whole stream, not just the
    * head). Package-visible so MultimodalSpec can drive it against
    * literal byte arrays (kernel/literal identity + corrupted-magic
    * + torn-frame rejection), mirroring [[parseWavHeader]]. */
  private[graft] def parseY4mHeader(df: DataFrame): DataFrame =
    df.withColumn("hdr_line", regexp_extract(
        expr("cast(substring(content, 1, 64) as string)"), "^([^\n]*)\n", 1))
      .withColumn("header_len", (length(col("hdr_line")) + 1).cast("long"))
      // try_cast: a corrupt header yields '' extracts — NULL fields and
      // header_ok=false, never an ANSI cast error (the q262 discipline)
      .withColumn("width", expr(
        "try_cast(regexp_extract(hdr_line, '^YUV4MPEG2 W([0-9]+) ', 1) as bigint)"))
      .withColumn("height", expr(
        "try_cast(regexp_extract(hdr_line, ' H([0-9]+) ', 1) as bigint)"))
      .withColumn("fps_num", expr(
        "try_cast(regexp_extract(hdr_line, ' F([0-9]+):', 1) as bigint)"))
      .withColumn("fps_den", expr(
        "try_cast(regexp_extract(hdr_line, ' F[0-9]+:([0-9]+) ', 1) as bigint)"))
      .withColumn("frame_bytes", col("width") * col("height"))
      .withColumn("frame_stride", col("frame_bytes") + lit(6L))
      .withColumn("n_frames", expr(
        """CASE WHEN frame_bytes >= 1 AND n_bytes > header_len
          |THEN (n_bytes - header_len) div frame_stride ELSE 0L END""".stripMargin))
      .withColumn("header_ok", coalesce(
        col("hdr_line").rlike(
          "^YUV4MPEG2 W[0-9]+ H[0-9]+ F[0-9]+:[0-9]+ Ip A1:1 Cmono$") &&
          col("frame_bytes") >= 1 && col("fps_num") >= 1 &&
          col("n_frames") >= 1 &&
          expr("(n_bytes - header_len) % frame_stride = 0") &&
          expr("""forall(sequence(0L, n_frames - 1), f ->
                 |  cast(substring(content,
                 |    cast(header_len + f * frame_stride + 1 as int), 6)
                 |    as string) = 'FRAME\n')""".stripMargin),
        lit(false)))

  /** Q297: Y4M VIDEO CONTAINER DECODE — the video leg of the
    * WAV/BMP content-decode program (VERDICT r10 task 2, retiring
    * [[Media.DecodeStub]]'s last content surface): parse the
    * YUV4MPEG2 stream header (a fixed PUBLIC format: one ASCII
    * parameter line, then `FRAME\n`-delimited raw planes) from REAL
    * staged .y4m blobs ([[Media.stagedY4mRoot]]) read through
    * `binaryFile`. Every published field — geometry, frame rate,
    * frame size, FRAME COUNT, the derived exact duration — is DECODED
    * FROM THE BYTES (the frame count from the stream length and the
    * marker grammar, validated marker-by-marker); the DuckDB oracle
    * recomputes the same integers from the documents table (the
    * staging derivations), so the hash compare proves the container
    * parse end-to-end.
    *
    * Scale shape: per-file-parallel binaryFile scan; the header parse
    * reads the first 64 bytes, the marker validation is one
    * in-expression pass over 6-byte slices (work linear in blob
    * size — the inherent demux cost); output sort the only
    * exchange. */
  def y4mDecode(spark: SparkSession, dir: String): DataFrame = {
    val root = Media.stagedY4mRoot(spark, dir)
    val scanned = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.y4m")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.y4m$", 1).cast("long").as("doc_id"),
        col("length").cast("long").as("n_bytes"),
        col("content"))
    parseY4mHeader(scanned)
      .select(col("doc_id"), col("header_ok"), col("width"), col("height"),
        col("fps_num"), col("fps_den"), col("frame_bytes"), col("n_frames"),
        col("n_bytes"),
        // exact integer milliseconds: n·1000·den div num (25 fps → 40 ms/frame).
        // Guarded like every other parsed field (try_cast discipline): a
        // corrupt parameter line reading `F0:...` parses fps_num=0 via
        // try_cast, and under ANSI an unguarded integral `div` would throw
        // DIVIDE_BY_ZERO and fail the whole scan instead of surfacing that
        // file's header_ok=false row with a NULL duration.
        expr("CASE WHEN fps_num >= 1 THEN n_frames * 1000 * fps_den div fps_num END")
          .as("duration_ms"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: recomputes every stream field from the STAGING
    * derivations (geometry from doc_id, frame count from the text
    * length, file size from the header-grammar arithmetic) — shares
    * no parsing logic with the engine. */
  val y4mDecodeSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(doc_id % ${Media.Y4mWidthMod} + 2 AS BIGINT) AS w,
       |    CAST(doc_id % ${Media.Y4mHeightMod} + 2 AS BIGINT) AS h,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch})
       |SELECT doc_id, TRUE AS header_ok, w AS width, h AS height,
       |  CAST(${Media.Y4mFpsNum} AS BIGINT) AS fps_num,
       |  CAST(${Media.Y4mFpsDen} AS BIGINT) AS fps_den,
       |  w * h AS frame_bytes, len // (w * h) AS n_frames,
       |  -- length() not octet_length(): DuckDB 1.0 has no VARCHAR
       |  -- octet_length, and the header is ASCII (chars ≡ bytes)
       |  CAST(length('YUV4MPEG2 W' || CAST(w AS VARCHAR)
       |      || ' H' || CAST(h AS VARCHAR)
       |      || ' F${Media.Y4mFpsNum}:${Media.Y4mFpsDen} Ip A1:1 Cmono'
       |      || chr(10)) AS BIGINT)
       |    + (len // (w * h)) * (6 + w * h) AS n_bytes,
       |  (len // (w * h)) * 1000 * ${Media.Y4mFpsDen}
       |    // ${Media.Y4mFpsNum} AS duration_ms
       |FROM d WHERE len >= w * h
       |ORDER BY doc_id""".stripMargin

  /** Q299: Y4M FRAME SAMPLING WITH LUMA STATISTICS — q43's
    * every-k-th-frame semantics on REAL container content: demux
    * every ${FrameEvery}rd frame of each staged Y4M stream (offsets
    * from the DECODED header fields and the marker grammar, never the
    * staging rule) and publish the frame's exact luma-plane byte sum,
    * peak, and half-up micro-unit mean — the per-frame statistics a
    * video-curation gate (black-frame detection, scene cut) runs. The
    * DuckDB oracle recomputes each sampled frame's statistics from
    * the text bytes at the same slice arithmetic, sharing no demux
    * logic with the engine.
    *
    * Scale shape: per-file-parallel binaryFile scan; frame explosion
    * is bounded by the sampling stride (output rows = n_frames/k);
    * each sampled frame's fold touches only ITS OWN ≤w·h plane bytes
    * (hex of the frame slice, not the whole blob); the only exchange
    * is the output sort. */
  def y4mFrameLuma(spark: SparkSession, dir: String): DataFrame = {
    val root = Media.stagedY4mRoot(spark, dir)
    def byteAt(o: String) =
      s"CAST(conv(substring(fhx, ($o) * 2 + 1, 2), 16, 10) AS BIGINT)"
    val scanned = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.y4m")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.y4m$", 1).cast("long").as("doc_id"),
        col("length").cast("long").as("n_bytes"),
        col("content"))
    parseY4mHeader(scanned)
      .filter(col("header_ok"))
      .withColumn("frame_idx",
        explode(expr(s"sequence(0L, n_frames - 1, ${FrameEvery}L)")))
      .withColumn("fhx", expr(
        """hex(substring(content,
          |  cast(header_len + frame_idx * frame_stride + 6 + 1 as int),
          |  cast(frame_bytes as int)))""".stripMargin))
      .withColumn("st", expr(
        s"""aggregate(sequence(0, cast(frame_bytes as int) - 1),
           |  named_struct('s', 0L, 'p', 0L),
           |  (a, i) -> named_struct('s', a.s + ${byteAt("i")},
           |                         'p', greatest(a.p, ${byteAt("i")})))""".stripMargin))
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("n_frames"), col("st.s").as("luma_sum"), col("st.p").as("luma_peak"),
        (expr("(2 * st.s * 1000000 + frame_bytes) div (2 * frame_bytes)")
          .cast("double") / 1000000).as("luma_mean"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Oracle: frame f's plane is text bytes [f·w·h, (f+1)·w·h) (ASCII
    * byte ≡ codepoint, the q264/q290 argument) — the same slice
    * arithmetic over the SOURCE text vs the engine's demux of the
    * staged FILE. */
  val y4mFrameLumaSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    CAST(doc_id % ${Media.Y4mWidthMod} + 2 AS BIGINT) AS w,
       |    CAST(doc_id % ${Media.Y4mHeightMod} + 2 AS BIGINT) AS h,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}),
       |g AS (
       |  SELECT doc_id, text, w, h, w * h AS fs, len // (w * h) AS n
       |  FROM d WHERE len >= w * h),
       |f AS (
       |  SELECT doc_id, text, w, h, fs, n,
       |    unnest(generate_series(0, CAST(n AS INT) - 1, $FrameEvery)) AS fi
       |  FROM g),
       |s AS (
       |  SELECT doc_id, fi, w, h, fs, n,
       |    list_transform(generate_series(1, CAST(fs AS INT)), j ->
       |      ascii(substring(text, CAST(fi * fs + j AS INT), 1))) AS bs
       |  FROM f)
       |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx, w AS width,
       |  h AS height, n AS n_frames,
       |  CAST(list_sum(bs) AS BIGINT) AS luma_sum,
       |  CAST(list_max(bs) AS BIGINT) AS luma_peak,
       |  CAST((2 * list_sum(bs) * 1000000 + fs) // (2 * fs) AS DOUBLE)
       |    / 1000000 AS luma_mean
       |FROM s ORDER BY doc_id, frame_idx""".stripMargin

  /** Scene-cut threshold for q300: a cut is a consecutive-frame mean-
    * luma jump > 16 luma units, decided EXACTLY as |Δ plane sum| >
    * 16·frame_bytes (same denominator — the comparison never leaves
    * integers). Interpolated into BOTH engines. */
  private val CutLumaJump = 16

  /** Q300: VIDEO SCENE-CUT DETECTION — the classic shot-boundary
    * screen over the REAL demuxed Y4M streams: per video, the number
    * of consecutive-frame mean-luma jumps beyond [[CutLumaJump]], the
    * largest jump (exact sum delta + half-up micro-unit mean delta),
    * and the first cut's frame index. ALL frames participate (stride
    * 1 — unlike q299's sampling, a cut between skipped frames must
    * not be missed); offsets come from the DECODED header and marker
    * grammar. The DuckDB oracle recomputes every per-frame sum and
    * every delta from the text slice arithmetic.
    *
    * Exactness: plane sums are exact longs; the cut test and the max
    * delta are pure integer comparisons (means share the frame-size
    * denominator, so |Δmean| > T ⟺ |Δsum| > T·fs exactly).
    *
    * Scale shape: per-file-parallel binaryFile scan; ONE hex of the
    * payload region and one fold per frame (work linear in blob size
    * — the inherent decode cost); per-video output is a single
    * bounded row; output sort the only exchange. */
  def y4mSceneCuts(spark: SparkSession, dir: String): DataFrame = {
    val root = Media.stagedY4mRoot(spark, dir)
    // unsigned byte at 0-based offset `o` of the hex-encoded PAYLOAD
    // region (everything after the parameter line)
    def byteAt(o: String) =
      s"CAST(conv(substring(hx, ($o) * 2 + 1, 2), 16, 10) AS BIGINT)"
    val scanned = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.y4m")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.y4m$", 1).cast("long").as("doc_id"),
        col("length").cast("long").as("n_bytes"),
        col("content"))
    parseY4mHeader(scanned)
      .filter(col("header_ok"))
      .withColumn("hx", expr(
        "hex(substring(content, cast(header_len + 1 as int), cast(n_bytes - header_len as int)))"))
      .withColumn("sums", expr(
        s"""transform(sequence(0, cast(n_frames as int) - 1), f ->
           |  aggregate(sequence(0, cast(frame_bytes as int) - 1), 0L,
           |    (a, i) -> a + ${byteAt("f * frame_stride + 6 + i")}))""".stripMargin))
      // guard every sequence over [1, n_frames-1]: at n_frames = 1 that
      // range is DESCENDING, not empty (the q290 lesson)
      .withColumn("cuts", expr(
        s"""CASE WHEN n_frames >= 2 THEN
           |  filter(sequence(1L, n_frames - 1), f ->
           |    abs(element_at(sums, cast(f + 1 as int))
           |        - element_at(sums, cast(f as int)))
           |      > $CutLumaJump * frame_bytes)
           |ELSE cast(array() as array<bigint>) END""".stripMargin))
      .withColumn("max_delta", expr(
        s"""CASE WHEN n_frames >= 2 THEN
           |  aggregate(sequence(1L, n_frames - 1), 0L, (a, f) ->
           |    greatest(a, abs(element_at(sums, cast(f + 1 as int))
           |                    - element_at(sums, cast(f as int)))))
           |ELSE 0L END""".stripMargin))
      .select(col("doc_id"), col("n_frames"), col("frame_bytes"),
        size(col("cuts")).cast("long").as("n_cuts"),
        expr("try_element_at(cuts, 1)").as("first_cut_idx"),
        col("max_delta").as("max_delta_sum"),
        (expr("(2 * max_delta * 1000000 + frame_bytes) div (2 * frame_bytes)")
          .cast("double") / 1000000).as("max_delta_mean"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: per-frame sums from the text slices (q299's arithmetic),
    * deltas and the exact integer cut test replayed over the sum list
    * (DuckDB lists are 1-indexed; generate_series(1, 0) is EMPTY
    * there, so only the list_max needs the n ≥ 2 guard). */
  val y4mSceneCutsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    CAST(doc_id % ${Media.Y4mWidthMod} + 2 AS BIGINT) AS w,
       |    CAST(doc_id % ${Media.Y4mHeightMod} + 2 AS BIGINT) AS h,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}),
       |g AS (
       |  SELECT doc_id, text, w * h AS fs, len // (w * h) AS n
       |  FROM d WHERE len >= w * h),
       |s AS (
       |  SELECT doc_id, fs, n,
       |    list_transform(generate_series(0, CAST(n AS INT) - 1), f ->
       |      list_sum(list_transform(generate_series(1, CAST(fs AS INT)), j ->
       |        ascii(substring(text, CAST(f * fs + j AS INT), 1))))) AS sums
       |  FROM g),
       |c AS (
       |  SELECT doc_id, fs, n, sums,
       |    list_filter(generate_series(1, CAST(n AS INT) - 1), f ->
       |      abs(sums[f + 1] - sums[f]) > $CutLumaJump * fs) AS cuts,
       |    CASE WHEN n >= 2 THEN list_max(
       |      list_transform(generate_series(1, CAST(n AS INT) - 1), f ->
       |        abs(sums[f + 1] - sums[f])))
       |    ELSE 0 END AS maxd
       |  FROM s)
       |SELECT doc_id, n AS n_frames, fs AS frame_bytes,
       |  CAST(len(cuts) AS BIGINT) AS n_cuts,
       |  CAST(cuts[1] AS BIGINT) AS first_cut_idx,
       |  CAST(maxd AS BIGINT) AS max_delta_sum,
       |  CAST((2 * maxd * 1000000 + fs) // (2 * fs) AS DOUBLE) / 1000000
       |    AS max_delta_mean
       |FROM c ORDER BY doc_id""".stripMargin

  /** Per-video 56-bit PLANE-LUMA fingerprint from the REAL demuxed
    * streams — the video analog of [[bmpFingerprints]]: plane-byte
    * index band b = [b·pb/56, (b+1)·pb/56) over the CONCATENATED luma
    * planes (pb = n_frames·frame_bytes — the demux must skip every
    * 6-byte frame marker, so the fingerprint is a genuine function of
    * the container parse, not of raw file bytes), bit b = 1 iff the
    * band's mean luma exceeds the stream mean — exact DECIMAL(38)
    * cross-multiplication, q294's discipline. pb ≥ 56 keeps every
    * band non-empty (and every sequence() ascending). */
  private[graft] def y4mFingerprints(spark: SparkSession, root: String,
      gen: Int): DataFrame = {
    def byteAt(o: String) =
      s"CAST(conv(substring(hx, ($o) * 2 + 1, 2), 16, 10) AS BIGINT)"
    // plane byte i lives at payload offset (i div fs)·(fs+6) + 6 + (i mod fs)
    val luma = byteAt(
      "(i div frame_bytes) * frame_stride + 6 + (i % frame_bytes)")
    val scanned = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.y4m")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.y4m$", 1).cast("long").as("doc_id"),
        col("length").cast("long").as("n_bytes"),
        col("content"))
    parseY4mHeader(scanned)
      .filter(col("header_ok"))
      .withColumn("pb", col("n_frames") * col("frame_bytes"))
      .filter(col("pb") >= FpBits)
      .withColumn("hx", expr(
        "hex(substring(content, cast(header_len + 1 as int), cast(n_bytes - header_len as int)))"))
      .withColumn("bs", expr(
        s"""transform(sequence(0, ${FpBits - 1}), b ->
           |  aggregate(sequence(cast(b * pb div $FpBits as int),
           |                     cast((b + 1) * pb div $FpBits as int) - 1),
           |    0L, (a, i) -> a + $luma))""".stripMargin))
      .withColumn("luma_sum", expr("aggregate(bs, 0L, (a, x) -> a + x)"))
      .withColumn("fp", expr(
        s"""aggregate(sequence(0, ${FpBits - 1}), 0L, (f, b) ->
           |  f + CASE WHEN cast(element_at(bs, b + 1) as decimal(38,0)) * pb
           |             > cast(luma_sum as decimal(38,0))
           |               * ((b + 1) * pb div $FpBits - b * pb div $FpBits)
           |           THEN shiftleft(1L, b) ELSE 0L END)""".stripMargin))
      .select(col("doc_id"), lit(gen.toLong).as("gen"),
        col("pb").as("plane_bytes"), col("luma_sum"), col("fp"))
  }

  /** Q301: TEMPORAL VIDEO FINGERPRINT — q294's perceptual-hash
    * discipline applied to the third modality: a 56-bit block-luma
    * hash over the demuxed plane stream ([[y4mFingerprints]] — band
    * sums must skip the frame markers, so agreement proves the demux
    * arithmetic, not just byte slicing), fully DuckDB-oracled: plane
    * byte i is text byte i by the staging construction, so the oracle
    * replays bands, majority bits, and the exact luma_sum witness
    * from the documents table with HUGEINT cross-multiplication — no
    * parse logic shared.
    *
    * Scale shape: per-file-parallel binaryFile scan, one
    * in-expression plane pass (the inherent decode cost), output sort
    * the only exchange. */
  def y4mFingerprint(spark: SparkSession, dir: String): DataFrame =
    y4mFingerprints(spark, Media.stagedY4mRoot(spark, dir), 1)
      .select(col("doc_id"), col("plane_bytes"), col("luma_sum"), col("fp"))
      .orderBy(col("doc_id"))

  /** Oracle CTE chain recomputing the video fingerprint from the
    * documents text (plane byte i ≡ text byte i). `perturb` replays
    * the gen-2 single-byte edit (+1 mod 256 on plane byte 1). */
  private def y4mFingerprintSqlCte(tag: String, docFilter: String,
      perturb: Boolean): String = {
    val lumaAt =
      if (perturb)
        "(CASE WHEN i = 1 THEN (ascii(substring(text, CAST(i + 1 AS INT), 1)) + 1) % 256" +
          " ELSE ascii(substring(text, CAST(i + 1 AS INT), 1)) END)"
      else "ascii(substring(text, CAST(i + 1 AS INT), 1))"
    s"""d$tag AS (
       |  SELECT doc_id, text,
       |    (CAST(doc_id % ${Media.Y4mWidthMod} + 2 AS BIGINT)
       |     * CAST(doc_id % ${Media.Y4mHeightMod} + 2 AS BIGINT)) AS fs,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}$docFilter),
       |g$tag AS (
       |  SELECT doc_id, text, (len // fs) * fs AS pb
       |  FROM d$tag WHERE len >= fs AND (len // fs) * fs >= $FpBits),
       |l$tag AS (
       |  SELECT doc_id, pb,
       |    list_transform(generate_series(0, CAST(pb AS INT) - 1), i ->
       |      $lumaAt) AS lumas
       |  FROM g$tag),
       |bb$tag AS (
       |  SELECT doc_id, pb,
       |    list_transform(generate_series(0, ${FpBits - 1}), b ->
       |      list_sum(list_slice(lumas,
       |        CAST(b * pb // $FpBits + 1 AS INT),
       |        CAST((b + 1) * pb // $FpBits AS INT)))) AS bs
       |  FROM l$tag),
       |f$tag AS (
       |  SELECT doc_id, pb, bs, list_sum(bs) AS total FROM bb$tag),
       |fp$tag AS (
       |  SELECT doc_id, CAST(pb AS BIGINT) AS plane_bytes,
       |    CAST(total AS BIGINT) AS luma_sum,
       |    CAST(list_sum(list_transform(generate_series(0, ${FpBits - 1}), b ->
       |      CASE WHEN CAST(bs[CAST(b + 1 AS INT)] AS HUGEINT) * pb
       |             > CAST(total AS HUGEINT)
       |               * ((b + 1) * pb // $FpBits - b * pb // $FpBits)
       |           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS fp
       |  FROM f$tag)""".stripMargin
  }

  val y4mFingerprintSql: String =
    s"""WITH ${y4mFingerprintSqlCte("1", "", perturb = false)}
       |SELECT doc_id, plane_bytes, luma_sum, fp FROM fp1
       |ORDER BY doc_id""".stripMargin

  /** Q302: VIDEO NEAR-DUP BY BANDED HAMMING — q295's multimodal ×
    * dedup intersection completed for the third modality: pairs of
    * videos whose temporal fingerprints differ in ≤ 3 bits, found by
    * the same 7-band × 8-bit LSH (lossless at the radius by
    * pigeonhole), co-keyed on plane_bytes (same-footage-length
    * blocking). The corpus is generation 1 plus gen-2 single-plane-
    * byte-perturbed renditions ([[Media.stagedY4mRootV2]]) — planted
    * near-dups by construction. Verification is the exact popcount of
    * the XOR; the oracle replays both generations' fingerprints from
    * the text (the +1 fold for gen 2) and verifies with the direct
    * same-length pair join — banding is pure optimization, so
    * agreement proves demux, fingerprint, banding AND verification.
    *
    * Scale shape: candidate-pairs-before-payload — the banded
    * self-join carries (band, value, plane_bytes, id, gen, fp); the
    * 8-byte fingerprint IS the payload. localCheckpoint: the union
    * frame feeds both sides — one decode pass. */
  def y4mNearDup(spark: SparkSession, dir: String): DataFrame = {
    val fps = y4mFingerprints(spark, Media.stagedY4mRoot(spark, dir), 1)
      .unionByName(y4mFingerprints(spark, Media.stagedY4mRootV2(spark, dir), 2))
      .localCheckpoint()
    val banded = fps.select(col("doc_id"), col("gen"), col("plane_bytes"),
      col("fp"),
      explode(expr(
        s"""transform(sequence(0, ${FpBands - 1}), b ->
           |  named_struct('b', b, 'v', shiftright(fp, b * 8) & 255))""".stripMargin))
        .as("bk"))
      .select(col("bk.b").as("b"), col("bk.v").as("v"), col("plane_bytes"),
        col("doc_id"), col("gen"), col("fp"))
    val a = banded.select(col("b"), col("v"), col("plane_bytes"),
      col("doc_id").as("id_a"), col("gen").as("gen_a"), col("fp").as("fp_a"))
    val bside = banded.select(col("b"), col("v"), col("plane_bytes"),
      col("doc_id").as("id_b"), col("gen").as("gen_b"), col("fp").as("fp_b"))
    a.join(bside, Seq("b", "v", "plane_bytes"))
      .filter(col("id_a") < col("id_b") ||
        (col("id_a") === col("id_b") && col("gen_a") < col("gen_b")))
      .select(col("id_a"), col("gen_a"), col("fp_a"),
        col("id_b"), col("gen_b"), col("fp_b"), col("plane_bytes"))
      .distinct()
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)").cast("long"))
      .filter(col("hamming") <= FpHamming)
      .select(col("id_a"), col("gen_a"), col("id_b"), col("gen_b"),
        col("plane_bytes"), col("hamming"))
      .orderBy(col("id_a"), col("gen_a"), col("id_b"), col("gen_b"))
  }

  val y4mNearDupSql: String =
    s"""WITH ${y4mFingerprintSqlCte("1", "", perturb = false)},
       |${y4mFingerprintSqlCte("2", " AND doc_id % 7 = 0", perturb = true)},
       |u AS (
       |  SELECT doc_id, 1 AS gen, plane_bytes, fp FROM fp1
       |  UNION ALL
       |  SELECT doc_id, 2 AS gen, plane_bytes, fp FROM fp2)
       |SELECT a.doc_id AS id_a, CAST(a.gen AS BIGINT) AS gen_a,
       |  b.doc_id AS id_b, CAST(b.gen AS BIGINT) AS gen_b,
       |  a.plane_bytes,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
       |FROM u a JOIN u b ON a.plane_bytes = b.plane_bytes
       |  AND (a.doc_id < b.doc_id
       |       OR (a.doc_id = b.doc_id AND a.gen < b.gen))
       |WHERE bit_count(xor(a.fp, b.fp)) <= $FpHamming
       |ORDER BY id_a, gen_a, id_b, gen_b""".stripMargin

  /** Per-file 56-bit ENERGY-ENVELOPE fingerprint from the decoded
    * signed PCM stream — the audio analog of [[bmpFingerprints]] /
    * [[y4mFingerprints]]: sample-index band b = [b·ns/56,
    * (b+1)·ns/56), bit b = 1 iff the band's mean |sample| exceeds the
    * stream mean |sample| — the coarse loudness envelope an audio
    * perceptual hash quantizes. The |sample| values ride q264's
    * SIGNED little-endian int16 decode (sign fold applied before
    * abs — unsigned-vs-signed changes |·| for high-byte samples, so
    * the convention is load-bearing). Exact DECIMAL(38)
    * cross-multiplication; ns ≥ 56 keeps every band non-empty. */
  private[graft] def wavFingerprints(spark: SparkSession, root: String,
      gen: Int): DataFrame = {
    val sgn = (v: String) => s"(CASE WHEN $v >= 32768 THEN $v - 65536 ELSE $v END)"
    val sample = sgn("CAST(conv(concat(substring(h, i * 4 + 3, 2), " +
      "substring(h, i * 4 + 1, 2)), 16, 10) AS BIGINT)")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(root)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.wav$", 1).cast("long").as("doc_id"),
        col("content"))
      .withColumn("data_bytes", expr(leInt(41, 4)))
      .withColumn("ns", expr("data_bytes div 2"))
      .filter(col("ns") >= FpBits)
      .withColumn("h", expr("hex(substring(content, 45, cast(ns * 2 as int)))"))
      .withColumn("bs", expr(
        s"""transform(sequence(0, ${FpBits - 1}), b ->
           |  aggregate(sequence(cast(b * ns div $FpBits as int),
           |                     cast((b + 1) * ns div $FpBits as int) - 1),
           |    0L, (a, i) -> a + abs($sample)))""".stripMargin))
      .withColumn("abs_sum", expr("aggregate(bs, 0L, (a, x) -> a + x)"))
      .withColumn("fp", expr(
        s"""aggregate(sequence(0, ${FpBits - 1}), 0L, (f, b) ->
           |  f + CASE WHEN cast(element_at(bs, b + 1) as decimal(38,0)) * ns
           |             > cast(abs_sum as decimal(38,0))
           |               * ((b + 1) * ns div $FpBits - b * ns div $FpBits)
           |           THEN shiftleft(1L, b) ELSE 0L END)""".stripMargin))
      .select(col("doc_id"), lit(gen.toLong).as("gen"),
        col("ns").as("n_samples"), col("abs_sum"), col("fp"))
  }

  /** Q303: AUDIO ENERGY-ENVELOPE FINGERPRINT — the perceptual-hash
    * discipline on the LAST modality (q294 image, q301 video): a
    * 56-bit loudness-envelope hash over the decoded signed PCM
    * samples, fully DuckDB-oracled (the oracle recomputes samples,
    * the sign fold, band |sample| sums, and every majority bit from
    * the text bytes with HUGEINT cross-multiplication — no parse
    * logic shared). The exact abs_sum witness rides along.
    *
    * Scale shape: per-file-parallel binaryFile scan, one
    * in-expression sample pass, output sort the only exchange. */
  def wavFingerprint(spark: SparkSession, dir: String): DataFrame =
    wavFingerprints(spark, Media.stagedWavRoot(spark, dir), 1)
      .select(col("doc_id"), col("n_samples"), col("abs_sum"), col("fp"))
      .orderBy(col("doc_id"))

  /** Oracle CTE chain recomputing the audio fingerprint from the
    * documents text (sample i = text bytes 2i, 2i+1 little-endian,
    * SIGNED fold, then abs). `perturb` replays the gen-2 single-byte
    * edit (+1 mod 256 on data byte 1 = sample 0's HIGH byte). */
  private def wavFingerprintSqlCte(tag: String, docFilter: String,
      perturb: Boolean): String = {
    val hi =
      if (perturb)
        "(CASE WHEN i = 0 THEN (ascii(substring(text, 2, 1)) + 1) % 256" +
          " ELSE ascii(substring(text, 2 * i + 2, 1)) END)"
      else "ascii(substring(text, 2 * i + 2, 1))"
    s"""d$tag AS (
       |  SELECT doc_id, text, octet_length(encode(text)) // 2 AS ns
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}$docFilter),
       |s$tag AS (
       |  SELECT doc_id, ns,
       |    list_transform(list_transform(
       |        list_transform(generate_series(0, CAST(ns AS INT) - 1),
       |          i -> ascii(substring(text, 2 * i + 1, 1)) + 256 * $hi),
       |        v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END),
       |      v -> abs(v)) AS xs
       |  FROM d$tag WHERE ns >= $FpBits),
       |bb$tag AS (
       |  SELECT doc_id, ns,
       |    list_transform(generate_series(0, ${FpBits - 1}), b ->
       |      list_sum(list_slice(xs,
       |        CAST(b * ns // $FpBits + 1 AS INT),
       |        CAST((b + 1) * ns // $FpBits AS INT)))) AS bs
       |  FROM s$tag),
       |f$tag AS (
       |  SELECT doc_id, ns, bs, list_sum(bs) AS total FROM bb$tag),
       |fp$tag AS (
       |  SELECT doc_id, CAST(ns AS BIGINT) AS n_samples,
       |    CAST(total AS BIGINT) AS abs_sum,
       |    CAST(list_sum(list_transform(generate_series(0, ${FpBits - 1}), b ->
       |      CASE WHEN CAST(bs[CAST(b + 1 AS INT)] AS HUGEINT) * ns
       |             > CAST(total AS HUGEINT)
       |               * ((b + 1) * ns // $FpBits - b * ns // $FpBits)
       |           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS fp
       |  FROM f$tag)""".stripMargin
  }

  val wavFingerprintSql: String =
    s"""WITH ${wavFingerprintSqlCte("1", "", perturb = false)}
       |SELECT doc_id, n_samples, abs_sum, fp FROM fp1
       |ORDER BY doc_id""".stripMargin

  /** Q304: AUDIO NEAR-DUP BY BANDED HAMMING — closes the multimodal ×
    * dedup matrix (q295 image, q302 video): pairs of audio files
    * whose energy-envelope fingerprints differ in ≤ 3 bits, via the
    * same 7-band × 8-bit LSH (lossless at the radius by pigeonhole),
    * co-keyed on n_samples. The corpus is generation 1 plus gen-2
    * one-sample-glitched renditions ([[Media.stagedWavRootV2]]) —
    * planted near-dups whose single ±256/sign-wrap sample edit the
    * envelope hash must absorb. Exact popcount verification; the
    * oracle replays both generations from the text and verifies with
    * the direct same-length pair join.
    *
    * Scale shape: candidate-pairs-before-payload; the 8-byte
    * fingerprint IS the payload on the banded self-join;
    * localCheckpoint: one decode pass feeds both sides. */
  def wavNearDup(spark: SparkSession, dir: String): DataFrame = {
    val fps = wavFingerprints(spark, Media.stagedWavRoot(spark, dir), 1)
      .unionByName(wavFingerprints(spark, Media.stagedWavRootV2(spark, dir), 2))
      .localCheckpoint()
    val banded = fps.select(col("doc_id"), col("gen"), col("n_samples"),
      col("fp"),
      explode(expr(
        s"""transform(sequence(0, ${FpBands - 1}), b ->
           |  named_struct('b', b, 'v', shiftright(fp, b * 8) & 255))""".stripMargin))
        .as("bk"))
      .select(col("bk.b").as("b"), col("bk.v").as("v"), col("n_samples"),
        col("doc_id"), col("gen"), col("fp"))
    val a = banded.select(col("b"), col("v"), col("n_samples"),
      col("doc_id").as("id_a"), col("gen").as("gen_a"), col("fp").as("fp_a"))
    val bside = banded.select(col("b"), col("v"), col("n_samples"),
      col("doc_id").as("id_b"), col("gen").as("gen_b"), col("fp").as("fp_b"))
    a.join(bside, Seq("b", "v", "n_samples"))
      .filter(col("id_a") < col("id_b") ||
        (col("id_a") === col("id_b") && col("gen_a") < col("gen_b")))
      .select(col("id_a"), col("gen_a"), col("fp_a"),
        col("id_b"), col("gen_b"), col("fp_b"), col("n_samples"))
      .distinct()
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)").cast("long"))
      .filter(col("hamming") <= FpHamming)
      .select(col("id_a"), col("gen_a"), col("id_b"), col("gen_b"),
        col("n_samples"), col("hamming"))
      .orderBy(col("id_a"), col("gen_a"), col("id_b"), col("gen_b"))
  }

  val wavNearDupSql: String =
    s"""WITH ${wavFingerprintSqlCte("1", "", perturb = false)},
       |${wavFingerprintSqlCte("2", " AND doc_id % 7 = 0", perturb = true)},
       |u AS (
       |  SELECT doc_id, 1 AS gen, n_samples, fp FROM fp1
       |  UNION ALL
       |  SELECT doc_id, 2 AS gen, n_samples, fp FROM fp2)
       |SELECT a.doc_id AS id_a, CAST(a.gen AS BIGINT) AS gen_a,
       |  b.doc_id AS id_b, CAST(b.gen AS BIGINT) AS gen_b,
       |  a.n_samples,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
       |FROM u a JOIN u b ON a.n_samples = b.n_samples
       |  AND (a.doc_id < b.doc_id
       |       OR (a.doc_id = b.doc_id AND a.gen < b.gen))
       |WHERE bit_count(xor(a.fp, b.fp)) <= $FpHamming
       |ORDER BY id_a, gen_a, id_b, gen_b""".stripMargin

  /** Q298: SPARK IMAGE-DATASOURCE DECODE — the idiomatic Spark
    * multimodal scan path (VERDICT r10 task 3): read the SAME staged
    * BMPs through the built-in `spark.read.format("image")` source
    * (ImageIO-backed, from spark-mllib) and publish its decoded
    * geometry (height, width, nChannels, OpenCV mode) plus exact
    * per-channel byte sums over the datasource's packed BGR `data`
    * buffer. Twin discipline: the DuckDB oracle recomputes everything
    * from the documents table, and MultimodalSpec pins
    * datasource-decode ≡ q290's hand-rolled expression decode
    * (sums/geometry equal per image) — two independent decoders, one
    * truth. Note the datasource's data buffer is PACKED (ImageIO
    * strips the BMP row padding) and row order is top-down (q290
    * reads the file's bottom-up rows) — whole-image channel sums are
    * invariant to both, which is what makes the pin exact.
    *
    * Scale shape: the image source parallelizes per file like
    * binaryFile; the channel fold is one in-expression pass over the
    * decoded buffer; output sort the only exchange. */
  def imageDatasourceDecode(spark: SparkSession, dir: String): DataFrame =
    imageSourceChannelSums(spark, Media.stagedBmpRoot(spark, dir), "bmp")

  /** Shared body of q298/q307: `format("image")` scan over one staged
    * corpus + the in-expression BGR channel fold over the decoded
    * packed buffer. The format is whatever ImageIO sniffs from the
    * bytes — the SAME code path decodes uncompressed BMP and
    * DEFLATE-compressed PNG, which is exactly the point of the q307
    * cross-format pin. */
  private def imageSourceChannelSums(spark: SparkSession, root: String,
      ext: String): DataFrame = {
    def byteAt(o: String) =
      s"CAST(conv(substring(hx, ($o) * 2 + 1, 2), 16, 10) AS BIGINT)"
    val px = (c: Int) => byteAt(s"3 * i + $c")
    spark.read.format("image")
      .option("dropInvalid", "true")
      .option("pathGlobFilter", s"*.$ext")
      .load(root)
      .select(
        regexp_extract(col("image.origin"), s"([0-9]+)\\.$ext$$", 1)
          .cast("long").as("doc_id"),
        col("image.height").cast("long").as("height"),
        col("image.width").cast("long").as("width"),
        col("image.nChannels").cast("long").as("n_channels"),
        col("image.mode").cast("long").as("mode"),
        col("image.data").as("data"))
      .withColumn("np", col("width") * col("height"))
      .withColumn("hx", expr("hex(data)"))
      .withColumn("st", expr(
        s"""aggregate(sequence(0, cast(np as int) - 1),
           |  named_struct('sb', 0L, 'sg', 0L, 'sr', 0L),
           |  (a, i) -> named_struct(
           |    'sb', a.sb + ${px(0)}, 'sg', a.sg + ${px(1)},
           |    'sr', a.sr + ${px(2)}))""".stripMargin))
      .select(col("doc_id"), col("height"), col("width"),
        col("n_channels"), col("mode"), col("np").as("n_pixels"),
        col("st.sb").as("sum_b"), col("st.sg").as("sum_g"),
        col("st.sr").as("sum_r"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: geometry from the staging derivations; channel sums via
    * q290's stride/padding index math over the text characters (the
    * padding bytes never enter a sum, matching the datasource's
    * packed buffer); nChannels/mode are the image schema's constants
    * for 24-bit color (3 channels, OpenCV CV_8UC3 = 16). */
  val imageDatasourceDecodeSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    CAST(doc_id % ${Media.BmpWidthMod} + 1 AS BIGINT) AS w,
       |    CAST((3 * (doc_id % ${Media.BmpWidthMod} + 1) + 3) // 4 * 4 AS BIGINT) AS rs,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}),
       |g AS (
       |  SELECT doc_id, text, w, rs, len // rs AS h, w * (len // rs) AS np
       |  FROM d WHERE len >= rs),
       |ch AS (
       |  SELECT doc_id, w, h, np,
       |    list_sum(list_transform(generate_series(0, CAST(np AS INT) - 1), i ->
       |      ascii(substring(text, CAST((i // w) * rs + 3 * (i % w) + 1 AS INT), 1)))) AS sb,
       |    list_sum(list_transform(generate_series(0, CAST(np AS INT) - 1), i ->
       |      ascii(substring(text, CAST((i // w) * rs + 3 * (i % w) + 2 AS INT), 1)))) AS sg,
       |    list_sum(list_transform(generate_series(0, CAST(np AS INT) - 1), i ->
       |      ascii(substring(text, CAST((i // w) * rs + 3 * (i % w) + 3 AS INT), 1)))) AS sr
       |  FROM g)
       |SELECT doc_id, h AS height, w AS width,
       |  CAST(3 AS BIGINT) AS n_channels, CAST(16 AS BIGINT) AS mode,
       |  np AS n_pixels,
       |  CAST(sb AS BIGINT) AS sum_b, CAST(sg AS BIGINT) AS sum_g,
       |  CAST(sr AS BIGINT) AS sum_r
       |FROM ch ORDER BY doc_id""".stripMargin

  /** Q307: COMPRESSED-CODEC (PNG) DECODE VIA CROSS-FORMAT IDENTITY —
    * extends the image program from raw containers to a REAL
    * compressed codec (VERDICT r11 task 3): [[Media.stagedPngRoot]]
    * encodes the BMP corpus's exact pixel grids through the JDK's
    * ImageIO PNG writer (DEFLATE + filter prediction — bytes on disk
    * share NOTHING with the pixel values), and this query decodes them
    * back through the idiomatic `format("image")` scan with the same
    * channel fold as q298. Content identity is the oracle trick: the
    * pixel grids equal the BMP corpus's by construction, so the
    * staging-derivation oracle that proves q298 proves this path with
    * zero compromise — a hash match here means inflate + unfilter +
    * channel extraction reproduced every pixel of every image exactly.
    * MultimodalSpec additionally pins PNG-datasource ≡ BMP-expression
    * decode (q290) per image, and that the staged blobs really carry
    * the PNG magic — three independent decoders (hand-rolled BMP
    * expressions, ImageIO-BMP, ImageIO-PNG-after-recompression), one
    * truth.
    *
    * Scale shape: identical to q298 — per-file-parallel image scan
    * (decompression runs inside the scan, the inherent codec cost),
    * one in-expression fold per decoded buffer, output sort the only
    * exchange. */
  def pngDatasourceDecode(spark: SparkSession, dir: String): DataFrame =
    imageSourceChannelSums(spark, Media.stagedPngRoot(spark, dir), "png")

  /** Oracle: byte-identical to q298's — content identity across the
    * two staged formats makes the BMP staging derivations exact for
    * the PNG path (and is the only exact oracle possible: no SQL could
    * recompute DEFLATE). */
  val pngDatasourceDecodeSql: String = imageDatasourceDecodeSql

  /** Q305: RENDITION-COMPLETENESS AUDIT — the pre-packing gate a
    * multimodal training pipeline runs over its blob store: one scan
    * of ALL FOUR staged corpora (text blobs, WAV, BMP, Y4M) unioned
    * into a single manifest, rolled up per document into a modality
    * coverage map — which renditions exist, each rendition's staged
    * byte cost, how many modalities, and the total footprint. Absence
    * is as load-bearing as presence: BMP/Y4M staging skips docs
    * shorter than one row/frame, so the NULL pattern is a real
    * derivation the oracle recomputes from the staging rules (file
    * sizes too: header + payload arithmetic per format).
    *
    * Scale shape: four per-file-parallel binaryFile LISTINGS (the
    * scans read metadata only — no content column is ever selected,
    * so blob bytes never enter the plan), one map-side-combinable
    * per-doc rollup, output sort. Two exchanges total at any corpus
    * size. */
  def assetCoverage(spark: SparkSession, dir: String): DataFrame = {
    def manifest(root: String, glob: String, recursive: Boolean,
        tag: String): DataFrame = {
      val rd = spark.read.format("binaryFile").option("pathGlobFilter", glob)
      val rd2 = if (recursive) rd.option("recursiveFileLookup", "true") else rd
      rd2.load(root).select(
        regexp_extract(col("path"), "([0-9]+)\\.[a-z0-9]+$", 1)
          .cast("long").as("doc_id"),
        col("length").cast("long").as("bytes"),
        lit(tag).as("modality"))
    }
    manifest(Media.stagedBlobRoot(spark, dir), "*.bin", recursive = true, "text")
      .unionByName(manifest(Media.stagedWavRoot(spark, dir), "*.wav",
        recursive = false, "audio"))
      .unionByName(manifest(Media.stagedBmpRoot(spark, dir), "*.bmp",
        recursive = false, "image"))
      .unionByName(manifest(Media.stagedY4mRoot(spark, dir), "*.y4m",
        recursive = false, "video"))
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("modality") === "text", col("bytes"))).as("text_bytes"),
        max(when(col("modality") === "audio", col("bytes"))).as("audio_bytes"),
        max(when(col("modality") === "image", col("bytes"))).as("image_bytes"),
        max(when(col("modality") === "video", col("bytes"))).as("video_bytes"))
      .withColumn("n_modalities",
        (col("text_bytes").isNotNull.cast("int") +
          col("audio_bytes").isNotNull.cast("int") +
          col("image_bytes").isNotNull.cast("int") +
          col("video_bytes").isNotNull.cast("int")).cast("long"))
      .withColumn("total_bytes",
        (coalesce(col("text_bytes"), lit(0L)) +
          coalesce(col("audio_bytes"), lit(0L)) +
          coalesce(col("image_bytes"), lit(0L)) +
          coalesce(col("video_bytes"), lit(0L))).cast("long"))
      .select(col("doc_id"), col("text_bytes"), col("audio_bytes"),
        col("image_bytes"), col("video_bytes"), col("n_modalities"),
        col("total_bytes"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: every presence flag and every file size recomputed from
    * the four staging rules — blob = the text bytes; WAV = 44-byte
    * header + text; BMP = 54 + full padded rows (absent below one
    * row); Y4M = 36-byte parameter line + per-frame (6 + w·h)
    * (absent below one frame). */
  val assetCoverageSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len,
       |    CAST((3 * (doc_id % ${Media.BmpWidthMod} + 1) + 3) // 4 * 4 AS BIGINT) AS brs,
       |    (CAST(doc_id % ${Media.Y4mWidthMod} + 2 AS BIGINT)
       |     * CAST(doc_id % ${Media.Y4mHeightMod} + 2 AS BIGINT)) AS vfs
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${Media.BlobBatch}),
       |m AS (
       |  SELECT doc_id, len AS text_bytes, 44 + len AS audio_bytes,
       |    CASE WHEN len >= brs THEN 54 + (len // brs) * brs END AS image_bytes,
       |    CASE WHEN len >= vfs THEN 36 + (len // vfs) * (6 + vfs) END AS video_bytes
       |  FROM d)
       |SELECT doc_id, text_bytes, audio_bytes,
       |  CAST(image_bytes AS BIGINT) AS image_bytes,
       |  CAST(video_bytes AS BIGINT) AS video_bytes,
       |  CAST(2 + CASE WHEN image_bytes IS NULL THEN 0 ELSE 1 END
       |         + CASE WHEN video_bytes IS NULL THEN 0 ELSE 1 END
       |    AS BIGINT) AS n_modalities,
       |  CAST(text_bytes + audio_bytes + COALESCE(image_bytes, 0)
       |       + COALESCE(video_bytes, 0) AS BIGINT) AS total_bytes
       |FROM m ORDER BY doc_id""".stripMargin

  def queries: Map[String, Relational.Q] = Map(
    "q305_asset_coverage" -> (assetCoverage _),
    "q297_y4m_decode" -> (y4mDecode _),
    "q300_y4m_scene_cuts" -> (y4mSceneCuts _),
    "q301_y4m_fingerprint" -> (y4mFingerprint _),
    "q302_y4m_neardup" -> (y4mNearDup _),
    "q303_wav_fingerprint" -> (wavFingerprint _),
    "q304_wav_neardup" -> (wavNearDup _),
    "q298_image_datasource" -> (imageDatasourceDecode _),
    "q307_png_decode" -> (pngDatasourceDecode _),
    "q299_y4m_frame_luma" -> (y4mFrameLuma _),
    "q296_bmp_downsample" -> (bmpDownsample _),
    "q288_media_features_twin" -> (mediaFeaturesTwin _),
    "q289_bmp_decode" -> (bmpDecode _),
    "q290_bmp_pixel_stats" -> (bmpPixelStats _),
    "q294_bmp_fingerprint" -> (bmpFingerprint _),
    "q295_bmp_neardup" -> (bmpNearDup _),
    "q270_wav_turning_points" -> (wavTurningPoints _),
    "q278_wav_channel_stats" -> (wavChannelStats _),
    "q262_wav_decode" -> (wavDecode _),
    "q264_wav_sample_stats" -> (wavSampleStats _),
    "q260_blob_sync_diff" -> (blobSyncDiff _),
    "q41_media_meta" -> (mediaMeta _),
    "q42_media_features" -> (mediaFeatures _),
    "q43_frame_sample" -> (frameSample _),
    "q244_blob_manifest" -> (blobManifest _),
  )

  def oracles: Map[String, String] = Map(
    "q41_media_meta" -> mediaMetaSql,
    // q42 omitted: mapPartitions batch path, spec-tested instead —
    // its feature math is fully oracled through the q288 twin.
    "q288_media_features_twin" -> mediaFeaturesTwinSql,
    "q297_y4m_decode" -> y4mDecodeSql,
    "q300_y4m_scene_cuts" -> y4mSceneCutsSql,
    "q301_y4m_fingerprint" -> y4mFingerprintSql,
    "q302_y4m_neardup" -> y4mNearDupSql,
    "q303_wav_fingerprint" -> wavFingerprintSql,
    "q304_wav_neardup" -> wavNearDupSql,
    "q305_asset_coverage" -> assetCoverageSql,
    "q298_image_datasource" -> imageDatasourceDecodeSql,
    "q307_png_decode" -> pngDatasourceDecodeSql,
    "q299_y4m_frame_luma" -> y4mFrameLumaSql,
    "q289_bmp_decode" -> bmpDecodeSql,
    "q290_bmp_pixel_stats" -> bmpPixelStatsSql,
    "q294_bmp_fingerprint" -> bmpFingerprintSql,
    "q295_bmp_neardup" -> bmpNearDupSql,
    "q296_bmp_downsample" -> bmpDownsampleSql,
    "q43_frame_sample" -> frameSampleSql,
    "q244_blob_manifest" -> blobManifestSql,
    "q260_blob_sync_diff" -> blobSyncDiffSql,
    "q262_wav_decode" -> wavDecodeSql,
    "q264_wav_sample_stats" -> wavSampleStatsSql,
    "q270_wav_turning_points" -> wavTurningPointsSql,
    "q278_wav_channel_stats" -> wavChannelStatsSql,
  )
}
