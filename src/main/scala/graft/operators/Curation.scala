package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Parity._
import graft.functions.TextFunctions._

/** [EXT] Training-data curation operators over the documents table —
  * the pipeline stages between raw-corpus dedup (Dedup.scala) and
  * training: benchmark decontamination, denylist scrubbing,
  * repetition-based quality signals, and sequence packing (driver
  * brief "operations a large-scale training-data pipeline would
  * need"; curation stages as published in the C4 and Gopher dataset
  * papers).
  *
  * Everything here is linear scans plus one hash aggregation per
  * stage; the only join (q71) is against a broadcast benchmark-gram
  * set, so nothing in this file shuffles the corpus payload.
  */
object Curation {

  /** Q71: benchmark decontamination — flag training documents that
    * share a token 8-gram with the held-out evaluation set (the
    * overlap rule used to decontaminate pretraining corpora against
    * benchmarks; n-gram membership, not similarity). The eval set is
    * the deterministic slice doc_id % 25 == 0, standing in for an
    * external benchmark table.
    *
    * Scale shape: grams travel as md5 hashes (fixed 32 bytes, never
    * the gram text); per-doc `distinct` happens BEFORE the join so
    * multiplicity can't amplify; the eval side collapses to its
    * distinct gram set and is broadcast — real benchmark suites are
    * a few million grams, far under broadcast limits, while the
    * train side streams map-side past them. One corpus-wide shuffle
    * total (the distinct), grouped by high-cardinality doc_id.
    */
  def decontamination(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val isEval = col("doc_id") % 25 === 0
    val grams = d
      .select(col("doc_id"), explode(wordShingles(col("text"), 8)).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gh"))
      .distinct()
    val evalGrams = grams.filter(isEval)
      .select(col("gh")).distinct()
      .withColumn("hit", lit(1))
    grams.filter(!isEval)
      .join(broadcast(evalGrams), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_contaminated"))
      .filter(col("n_contaminated") > 0)
      .withColumn("contaminated_frac",
        dec6(col("n_contaminated").cast("decimal(18,0)") / col("n_grams")))
      .orderBy(col("doc_id"))
  }

  val decontaminationSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-7)) AS g
      |        FROM toks WHERE len(t) >= 8),
      |grams AS (SELECT DISTINCT doc_id, md5(array_to_string(t[g:g+7], ' ')) AS gh FROM pos),
      |eval_grams AS (SELECT DISTINCT gh FROM grams WHERE doc_id % 25 = 0)
      |SELECT doc_id, COUNT(*) AS n_grams,
      |  CAST(COUNT(e.gh) AS BIGINT) AS n_contaminated,
      |  CAST((2 * COUNT(e.gh) * 1000000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
      |    / 1000000 AS contaminated_frac
      |FROM (SELECT * FROM grams WHERE doc_id % 25 != 0) t
      |LEFT JOIN eval_grams e USING (gh)
      |GROUP BY doc_id HAVING COUNT(e.gh) > 0
      |ORDER BY doc_id""".stripMargin

  /** Stand-in content denylist — the C4-style badword scrub; a real
    * deployment swaps in the published list, the operator shape is
    * identical. */
  val Denylist: Seq[String] = Seq("customer", "spark", "vector")

  /** Q72: denylist scrubbing — token-level removal of denylisted
    * terms with per-source accounting (docs touched, tokens removed,
    * chars saved). Token-set membership, not regex, so both engines
    * agree exactly and the scan stays a codegen'd array filter.
    * Pure per-row map + one aggregation; partitions trivially. */
  def denylistScrub(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val kept = filter(tokens(col("text")), t => !t.isInCollection(Denylist))
    d.select(
        col("source"), col("n_chars"),
        tokenCount(col("text")).as("n_tokens"),
        size(kept).cast("bigint").as("n_kept"),
        length(array_join(kept, " ")).cast("bigint").as("scrubbed_chars"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_kept") < col("n_tokens"), 1L).otherwise(0L)).cast("bigint").as("docs_affected"),
        sum(col("n_tokens") - col("n_kept")).cast("bigint").as("tokens_removed"),
        sum(col("n_chars") - col("scrubbed_chars")).cast("bigint").as("chars_saved"))
      .orderBy(col("source"))
  }

  val denylistScrubSql: String = {
    val deny = Denylist.map(s => s"'$s'").mkString(", ")
    s"""WITH per_doc AS (
       |  SELECT source, n_chars,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    len(list_filter(string_split(text, ' '), t -> t NOT IN ($deny))) AS n_kept,
       |    len(array_to_string(list_filter(string_split(text, ' '), t -> t NOT IN ($deny)), ' ')) AS scrubbed_chars
       |  FROM documents)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN n_kept < n_tokens THEN 1 ELSE 0 END) AS BIGINT) AS docs_affected,
       |  CAST(SUM(n_tokens - n_kept) AS BIGINT) AS tokens_removed,
       |  CAST(SUM(n_chars - scrubbed_chars) AS BIGINT) AS chars_saved
       |FROM per_doc GROUP BY source ORDER BY source""".stripMargin
  }

  /** Q73: repetition quality signal — the Gopher-style "fraction of
    * text in the most frequent n-gram" filter, here the top token
    * 2-gram's share per document, rolled up per source with a flag
    * count at the 8% threshold. The threshold compare is integer
    * cross-multiplication (top_c * 100 >= total * 8), never a float
    * ratio, so the flag cannot flip on a rounding boundary between
    * engines.
    *
    * The per-doc (top_c, total) pair is ONE compiled kernel pass per
    * row ([[graft.functions.TopShingleStats]]: shingle byte-spans
    * hashed in place, sort + run-length scan), so the whole query is a
    * narrow scan into a single per-source hash agg. The explode
    * formulation it replaces paid an interpreted per-gram lambda and
    * TWO extra shuffles — per-(doc,gram) and per-doc aggregates
    * (median-of-5 at sf0.1: 1.95 s → 0.40 s); kernel/explode equality is pinned
    * in CurationSpec, counting by 64-bit span hash ≡ by string up to
    * xxhash64 collision (the SimHashSig contract).
    *
    * Input contract: doc_id is unique (the table's primary key). The
    * replaced explode/groupBy formulation would MERGE two rows sharing
    * a doc_id into one per-doc count, as the DuckDB oracle still does;
    * the kernel treats each row as its own document. */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("source"),
        graft.functions.TextFunctions.topShingleStats(col("text"), 2).as("tb"))
      .filter(col("tb").isNotNull)
      .select(col("source"), col("tb.top_c").as("top_c"), col("tb.total").as("total"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("top_c") * 100 >= col("total") * 8, 1L).otherwise(0L))
          .cast("bigint").as("n_flagged"),
        max(dec6(col("top_c").cast("decimal(18,0)") / col("total"))).as("max_top_share"))
      .orderBy(col("source"))
  }

  val repetitionSignalsSql: String =
    """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |pos AS (SELECT doc_id, source, t, unnest(generate_series(1, len(t)-1)) AS g
      |        FROM toks WHERE len(t) >= 2),
      |per_gram AS (SELECT doc_id, source, array_to_string(t[g:g+1], ' ') AS gram, COUNT(*) AS c
      |             FROM pos GROUP BY 1, 2, 3),
      |per_doc AS (SELECT doc_id, source, MAX(c) AS top_c, SUM(c) AS total
      |            FROM per_gram GROUP BY 1, 2)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN top_c * 100 >= total * 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  MAX(CAST((2 * top_c * 1000000 + total) // (2 * total) AS DOUBLE) / 1000000)
      |    AS max_top_share
      |FROM per_doc GROUP BY source ORDER BY source""".stripMargin

  /** Token budget per packed training sequence (the fixed context
    * length documents are concatenated into). */
  val PackBudget = 512

  /** The deterministic [0,100) sampling bucket of a stable integer key
    * (q62's multiplicative hash — see stratifiedSample's scaladoc for
    * the overflow-proof reduction). ONE definition shared by every
    * sampling consumer (q62, q87): ADVICE.md round 2 flagged this
    * exact expression for an overflow remedy, and a fix must land in
    * one place, not drift across copies. [[sampleBucketSql]] is its
    * oracle-side twin. */
  private[graft] def sampleBucket(id: Column): Column =
    shuffleKey(id) % 100

  private[graft] def sampleBucketSql(idCol: String): String =
    s"(${shuffleKeySql(idCol)}) % 100"

  /** The full 32-bit deterministic hash [[sampleBucket]] reduces mod
    * 100 — q111 uses it undivided as a pseudo-random PERMUTATION key:
    * multiplication by an odd constant mod 2^32 is injective on
    * [0, 2^31) ids, so distinct doc_ids can never collide (the (key,
    * doc_id) order is total regardless). Same one-definition rule as
    * sampleBucket; [[shuffleKeySql]] is the oracle twin. */
  private[graft] def shuffleKey(id: Column): Column =
    ((id % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L)

  private[graft] def shuffleKeySql(idCol: String): String =
    s"((($idCol % 2147483648) * 2654435761) % 4294967296)"

  /** Shared packing tail for q74/q87: per-source running sum of
    * `tokCol` into PackBudget bins, aggregated per (source, bin).
    * Input must carry doc_id, source, and `tokCol`. */
  private[graft] def packBins(df: DataFrame, tokCol: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    df.withColumn("cum", sum(col(tokCol)).over(w))
      // floor, not a bare cast: Spark's double->bigint cast truncates
      // while DuckDB's rounds half-even; floor is identical in both
      // (all values non-negative, exact under 2^53)
      .withColumn("bin", floor((col("cum") - col(tokCol)) / PackBudget).cast("bigint"))
      .groupBy(col("source"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokCol)).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("bin"))
  }

  /** Q74: sequence packing — assign documents to fixed-budget
    * training bins by cumulative token count in stable (source,
    * doc_id) order: concatenate-and-split at the budget boundary,
    * the packing rule LLM pretraining actually uses (greedy bin
    * packing trades determinism for little gain). A document's bin is
    * where its first token lands: floor((cumsum - n_tokens) /
    * budget).
    *
    * Scale shape: the running sum partitions by source, so packing
    * parallelizes across sources with no global order. A single
    * giant source would serialize its window into one task; the
    * remedy at 100 TB is a two-pass distributed prefix sum
    * (per-partition subtotals broadcast back as offsets), same
    * result, which this operator's per-source contract makes a
    * drop-in replacement. Integer math throughout. */
  def sequencePacking(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    // NULL text would yield a NULL bin, and Spark sorts NULLs first while
    // DuckDB sorts them last — exclude untokenizable docs outright (a doc
    // with no text has no tokens to pack); the oracle mirrors the filter.
    packBins(
      d.filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"), tokenCount(col("text")).as("n_tokens")),
      "n_tokens")
  }

  val sequencePackingSql: String =
    s"""WITH d AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM documents WHERE text IS NOT NULL),
       |c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum FROM d)
       |SELECT source, CAST(FLOOR((cum - n_tokens) / $PackBudget) AS BIGINT) AS bin,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1, 2 ORDER BY source, bin""".stripMargin

  /** Q87: the END-TO-END curation pipeline as ONE Catalyst plan —
    * exact dedup (keep-first per content hash) → denylist scrub →
    * quality gate (≥ 20 surviving tokens) → deterministic stratified
    * sample ([[sampleBucket]], q62's rule) → sequence packing
    * ([[packBins]], q74's concatenate-and-split). The point is
    * composition: each stage is the operator family's own logic,
    * fused by Catalyst into three shuffles before the output sort
    * (content-hash window, per-source pack window, final agg) with
    * every narrow stage pipelined between them — no materialization
    * barriers, which is how the stages would actually be deployed
    * over 100 TB rather than as five jobs with five intermediate
    * tables.
    *
    * The text payload is REDUCED BEFORE THE FIRST EXCHANGE: the scan
    * projects (doc_id, source, lang, md5, n_kept) and drops the text,
    * so the dedup window shuffles fixed-width columns, never document
    * bodies (rows in a dup group share identical text, so computing
    * n_kept pre-dedup gives the same value — and the file-header
    * invariant that nothing here shuffles corpus payload holds).
    * Null-text docs exit at the top (they can't train; the hash
    * window would also conflate them into one fake dup group). */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val kept = filter(tokens(col("text")), t => !t.isInCollection(Denylist))
    val slim = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("lang"),
        md5(col("text")).as("h"),
        size(kept).cast("bigint").as("n_kept"))
    val dedupW = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val survivors = slim
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .filter(col("n_kept") >= 20)
      .filter(sampleBucket(col("doc_id"))
        < when(col("lang") === "en", 60).otherwise(20))
    packBins(survivors, "n_kept")
  }

  val curationPipelineSql: String = {
    val deny = Denylist.map(s => s"'$s'").mkString(", ")
    s"""WITH clean AS (SELECT * FROM documents WHERE text IS NOT NULL),
       |dedup AS (
       |  SELECT * FROM (
       |    SELECT doc_id, source, lang, text,
       |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |    FROM clean) WHERE rn = 1),
       |qual AS (
       |  SELECT doc_id, source, lang,
       |    len(list_filter(string_split(text, ' '), t -> t NOT IN ($deny))) AS n_kept
       |  FROM dedup
       |  WHERE len(list_filter(string_split(text, ' '), t -> t NOT IN ($deny))) >= 20),
       |samp AS (
       |  SELECT * FROM qual
       |  WHERE ${sampleBucketSql("doc_id")}
       |        < CASE WHEN lang = 'en' THEN 60 ELSE 20 END),
       |packed AS (
       |  SELECT *, SUM(n_kept) OVER (PARTITION BY source ORDER BY doc_id) AS cum FROM samp)
       |SELECT source, CAST(FLOOR((cum - n_kept) / $PackBudget) AS BIGINT) AS bin,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_kept) AS BIGINT) AS bin_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM packed GROUP BY 1, 2 ORDER BY source, bin""".stripMargin
  }

  /** Q89: token-rarity quality score — the unigram language-model
    * proxy corpus cleaning uses (documents whose tokens are rare in
    * the corpus score high; gibberish and boilerplate sit at the
    * extremes). Per token, rarity = N/tf as an EXACT rational decimal
    * (corpus size over the token's corpus frequency) instead of
    * -log p: monotone-equivalent for ranking/thresholds with zero
    * libm exposure, the same trick as q66's linear idf. Per doc, the
    * score is the mean token rarity.
    *
    * Scale shape: tf is the per-token corpus-frequency table, which
    * grows with the vocabulary — by Heaps' law a 100 TB corpus has
    * billions of distinct tokens, so it is NOT broadcast-safe (the
    * same argument that retired q30's dfreq hint). No hint: AQE
    * broadcasts when the measured size is small, shuffles otherwise.
    * The doc filter prunes the probe side BEFORE the join; corpus
    * size N rides a broadcast 1-row aggregate. */
  def tokenRarity(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = d.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
    val n = toks.agg(count(lit(1)).as("n_tok"))
    // doc_id < 20 stands in for "the shard being scored" (the harness's
    // bounded probe set) — NOT a semantic threshold of the operator; a
    // deployment scores every doc, tf/N stay corpus-wide either way
    toks.filter(col("doc_id") < 20)
      .join(tf, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("rarity",
        (col("n_tok").cast(org.apache.spark.sql.types.DecimalType(18, 0)) / col("tf"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 6)))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        dec6(sum(col("rarity")) / count(lit(1))).as("avg_rarity"))
      .orderBy(col("doc_id"))
  }

  val tokenRaritySql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT token, COUNT(*) AS tf FROM toks GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_tok FROM toks),
      |per_tok AS (
      |  SELECT t.doc_id,
      |    (2 * n.n_tok * 1000000 + tf.tf) // (2 * tf.tf) AS r6
      |  FROM toks t JOIN tf USING (token) CROSS JOIN n
      |  WHERE t.doc_id < 20)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST((2 * SUM(r6) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 1000000
      |    AS avg_rarity
      |FROM per_tok GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Stand-in PII-shaped redaction pattern — long alphabetic runs, the
    * only regex class this synthetic vocabulary can exercise. A real
    * deployment swaps in the published email/phone/id patterns; the
    * operator shape (codegen'd regexp scan + replace, per-source
    * accounting) is identical. Character-class + bounded-repetition
    * syntax only, so Java regex (Spark) and RE2 (DuckDB) agree. */
  val RedactPattern: String = "[a-z]{6,}"
  private val RedactToken = "<PII>"

  /** Q92: regex redaction scrub — replace every [[RedactPattern]] match
    * with a fixed token and account for the damage per source (docs
    * touched, matches redacted, chars saved). The PII-removal stage of
    * a curation pipeline, as match-count + rewrite in ONE linear scan.
    *
    * Scale shape: pure per-row map (two codegen'd regexp evaluations)
    * plus one map-side-combining aggregation keyed by source — no
    * payload shuffle, partitions trivially. */
  def regexRedaction(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.filter(col("text").isNotNull)
      .select(
        col("source"), col("n_chars"),
        size(regexp_extract_all(col("text"), lit(RedactPattern), lit(0)))
          .cast("bigint").as("n_hits"),
        length(regexp_replace(col("text"), RedactPattern, RedactToken))
          .cast("bigint").as("len_after"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).cast("bigint").as("docs_redacted"),
        sum(col("n_hits")).cast("bigint").as("n_redactions"),
        sum(col("n_chars") - col("len_after")).cast("bigint").as("chars_saved"))
      .orderBy(col("source"))
  }

  val regexRedactionSql: String =
    s"""WITH per_doc AS (
       |  SELECT source, n_chars,
       |    len(regexp_extract_all(text, '$RedactPattern')) AS n_hits,
       |    len(regexp_replace(text, '$RedactPattern', '$RedactToken', 'g')) AS len_after
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_redacted,
       |  CAST(SUM(n_hits) AS BIGINT) AS n_redactions,
       |  CAST(SUM(n_chars - len_after) AS BIGINT) AS chars_saved
       |FROM per_doc GROUP BY source ORDER BY source""".stripMargin

  /** Sources the mixture targets upweight (4x the default weight). */
  val HeavySources: Seq[String] = Seq("src0", "src1", "src2")

  /** Q93: mixture resampling — downsample each source toward a target
    * mixture weight (the domain-reweighting step training corpora
    * apply before packing). Per source, keep-rate is
    * (w_s/n_s) / max_t(w_t/n_t) — the max-RATIO source (weight over
    * actual size, not weight alone) keeps 100% and nothing is ever
    * upsampled; an upweighted source LARGER than the max-ratio one
    * still sheds its excess share — applied via the deterministic
    * [[sampleBucket]] hash, so membership is reproducible row-wise.
    *
    * Exactness: the keep test cross-multiplies the rate inequality to
    * pure BIGINT arithmetic (bucket * w_max * n_s < 100 * w_s * n_max)
    * — no double division anywhere, so both engines flag identical
    * rows. The max-ratio representative is chosen by (double ratio,
    * source) ordering; ANY representative of the same maximal rational
    * yields an equivalent inequality (both sides scale by a positive
    * rational), so double rounding in the argmax cannot change the
    * kept set.
    *
    * Scale shape: per-source counts are source-cardinality-bounded →
    * broadcast both them and the 1-row max; the corpus side is one
    * linear scan + one map-side-combining agg. */
  def mixtureResample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val w = when(col("source").isInCollection(HeavySources), lit(4L)).otherwise(lit(1L))
    val counts = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_s")).withColumn("w_s", w)
    val top = counts
      .orderBy((col("w_s").cast("double") / col("n_s")).desc, col("source"))
      .limit(1)
      .select(col("w_s").as("w_max"), col("n_s").as("n_max"))
    d.join(broadcast(counts), Seq("source"))
      .crossJoin(broadcast(top)) // single-row broadcast scalar (q66/q89 pattern)
      .filter(sampleBucket(col("doc_id")) * col("w_max") * col("n_s")
        < lit(100L) * col("w_s") * col("n_max"))
      .groupBy(col("source"), col("w_s"), col("n_s"))
      .agg(count(lit(1)).as("n_kept"))
      .select(
        col("source"), col("w_s").as("target_w"), col("n_s").as("n_source"),
        col("n_kept"),
        dec6(col("n_kept").cast(org.apache.spark.sql.types.DecimalType(18, 0))
          / col("n_s")).as("kept_frac"))
      .orderBy(col("source"))
  }

  val mixtureResampleSql: String = {
    val heavy = HeavySources.map(s => s"'$s'").mkString(", ")
    s"""WITH counts AS (
       |  SELECT source, COUNT(*) AS n_s,
       |    CAST(CASE WHEN source IN ($heavy) THEN 4 ELSE 1 END AS BIGINT) AS w_s
       |  FROM documents GROUP BY source),
       |top AS (
       |  SELECT w_s AS w_max, n_s AS n_max FROM counts
       |  ORDER BY CAST(w_s AS DOUBLE) / n_s DESC, source LIMIT 1)
       |SELECT d.source AS source, c.w_s AS target_w, c.n_s AS n_source,
       |  COUNT(*) AS n_kept,
       |  CAST((2 * COUNT(*) * 1000000 + c.n_s) // (2 * c.n_s) AS DOUBLE) / 1000000
       |    AS kept_frac
       |FROM documents d JOIN counts c USING (source) CROSS JOIN top
       |WHERE ${sampleBucketSql("d.doc_id")} * w_max * n_s < 100 * w_s * n_max
       |GROUP BY d.source, c.w_s, c.n_s ORDER BY source""".stripMargin
  }

  /** Token budget for q94's corpus selection. */
  val TokenBudget = 12000L

  /** Q94: token-budget corpus selection — take documents in quality
    * order (score = n_chars desc, a stand-in for a model-based quality
    * score; doc_id tiebreak) until the cumulative token count reaches
    * the budget: "select the best B tokens", the step that turns a
    * scored corpus into a training set of fixed size.
    *
    * The greedy rule needs a GLOBAL running sum in score order — the
    * single-window formulation is a one-task global sort at scale, so
    * this runs the same DISTRIBUTED two-pass prefix sum as q91's
    * rank: a sampled percentile sketch picks score-bucket boundaries
    * (balance only, never correctness); per-bucket token subtotals
    * come back as bounded driver-side control flow and turn into
    * broadcast offsets; one row-scale shuffle ranks within (bucket)
    * and offset + within-bucket running sum is the EXACT global
    * cumulative token count (the score bucketing is monotone and the
    * (score, doc_id) order is total, so no tie can straddle a
    * boundary decision). CurationSpec pins result-identity against
    * the literal single-window formulation. */
  def budgetedSelection(spark: SparkSession, dir: String): DataFrame =
    budgetedSelectionAt(spark, dir, TokenBudget)

  private[graft] def budgetedSelectionAt(spark: SparkSession, dir: String,
      budget: Long): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
    // sc = negated score: ascending (sc, doc_id) = descending quality
    def rows = d.select(col("doc_id"), col("source"),
      (-col("n_chars")).as("sc"), tokenCount(col("text")).as("n_tokens"))
    val nBuckets = spark.conf.get("spark.sql.shuffle.partitions").toInt.max(2)
    // shared first pass (TwoPass.scoreBuckets): sampled balance-only
    // boundaries, monotone CASE chain, null-sketch guarded
    val bucketOf = TwoPass.scoreBuckets(rows, col("sc"), nBuckets)
    // per-bucket token subtotals: bounded by bucket count — driver-side
    // control flow, not data
    val sub = rows.withColumn("b", bucketOf(col("sc")))
      .groupBy(col("b")).agg(sum(col("n_tokens")).as("t"))
      .collect().sortBy(_.getAs[Int]("b"))
    val cum = sub.scanLeft(0L)(_ + _.getAs[Long]("t"))
    val offsets = spark.createDataFrame(
      sub.zip(cum).map { case (r, off) => (r.getAs[Int]("b"), off) }.toSeq)
      .toDF("b", "off")
    val w = Window.partitionBy(col("b")).orderBy(col("sc"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rows.withColumn("b", bucketOf(col("sc")))
      .join(broadcast(offsets), Seq("b"))
      .withColumn("cum", col("off") + sum(col("n_tokens")).over(w))
      .filter(col("cum") <= budget)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_selected"),
        sum(col("n_tokens")).cast("bigint").as("sel_tokens"))
      .orderBy(col("source"))
  }

  val budgetedSelectionSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, n_chars, len(string_split(text, ' ')) AS n_tokens
       |  FROM documents WHERE text IS NOT NULL),
       |c AS (SELECT *, SUM(n_tokens) OVER (ORDER BY n_chars DESC, doc_id) AS cum FROM d)
       |SELECT source, COUNT(*) AS n_selected, CAST(SUM(n_tokens) AS BIGINT) AS sel_tokens
       |FROM c WHERE cum <= $TokenBudget
       |GROUP BY source ORDER BY source""".stripMargin

  /** Minimum duplicated-span length for q101, in tokens. Matches q71's
    * 8-gram decontamination convention. */
  val DupSpanMinTokens = 8

  /** Q101: SUBSTRING-LEVEL EXACT DEDUP (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"):
    * find the maximal spans of >= [[DupSpanMinTokens]] consecutive
    * tokens that occur more than once ANYWHERE in the corpus (across
    * docs or repeated within one), and account for them per document —
    * the one standard LLM-curation operator the document-level dedup
    * family (q28-q32) cannot express: q29 dedups whole docs, q30/q31
    * near-dup at doc granularity, q71 flags 8-gram overlap against an
    * eval slice, but none of them removes a long boilerplate span
    * repeated inside otherwise-distinct training docs.
    *
    * Distributed shape (NOT the paper's single-node suffix array,
    * which caps at what one machine holds): k-gram postings. Each doc
    * emits (doc_id, pos, md5(k-gram)); one map-side-combining count
    * marks the grams occurring >= 2 times; positions whose gram is
    * duplicated are marked, and a maximal run of consecutive marked
    * positions [p1..p2] is a maximal duplicated span of
    * p2-p1+k tokens (the standard island trick: pos - row_number per
    * doc is constant within a run). Any true repeated span of >= k
    * tokens marks ALL its k-gram positions, so spans are never missed;
    * a run can chimera-join two spans whose gram partners differ —
    * the documented over-approximation every postings-based
    * implementation shares (and k chars of slack in the paper).
    *
    * 100 TB: postings are (8B, 4B, 32B-md5) rows, O(corpus tokens) —
    * never pairs, never payload; the gram count is map-side
    * combinable; the only row-scale shuffles are the count's exchange,
    * the postings-side join against the duplicated-gram set (md5 keys,
    * fixed width), and the per-doc window. md5 rather than xxhash64
    * keeps it collision-free at corpus scale AND DuckDB-expressible —
    * the oracle recomputes spans from scratch with the identical
    * predicate (VERDICT r4: "span accounting is SQL-expressible"). */
  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    dupSpansOn(Tables.documents(spark, dir))

  private[graft] def dupSpansOn(corpus: DataFrame): DataFrame = {
    val d = corpus.filter(col("text").isNotNull)
    dupSpanRuns(d).groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("span_tokens")).cast("bigint").as("dup_tokens"),
        max(col("span_tokens")).cast("bigint").as("max_span_tokens"))
      .join(d.select(col("doc_id"), tokenCount(col("text")).as("n_tokens")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        col("dup_tokens"), col("max_span_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Shared q101/q103 core: the maximal duplicated-span frame
    * (doc_id, span_start, span_tokens), 1-based token positions.
    * Caller must pass the NULL-text-filtered corpus. */
  private def dupSpanRuns(d: DataFrame): DataFrame = {
    val k = DupSpanMinTokens
    // postings: 1-based gram start positions; the WordShingleStrings
    // kernel slices byte spans in place (no HOF, no per-gram alloc)
    val postings = d
      .select(col("doc_id"), posexplode(wordShingles(col("text"), k)).as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), md5(col("gram")).as("g"))
    val dupGrams = postings.groupBy(col("g"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2).select(col("g"))
    val marked = postings.join(dupGrams, Seq("g")).select(col("doc_id"), col("pos"))
    // island trick: consecutive marked positions share (pos - rank)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("grp", col("pos") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + lit(k)).cast("bigint").as("span_tokens"))
      .select(col("doc_id"), col("span_start"), col("span_tokens"))
  }

  /** Q103: EXACT SPAN SCRUB — q101's consumer, completing the Lee et
    * al. pipeline (q101 FINDS repeated spans; this decides what to
    * REMOVE): group the maximal duplicated spans by their exact
    * content (md5 of the span's tokens), keep the globally-first
    * occurrence of each distinct span (min (doc_id, span_start) — the
    * deterministic analog of the paper's "keep one copy"), and
    * account for the removal per document. Chimera runs (a maximal
    * run whose grams match DIFFERENT partners, so its full content
    * repeats nowhere) group alone and are kept — exact-substring
    * dedup removes only verbatim duplicates, never approximations.
    *
    * 100 TB: the span frame is the FLAGGED subset (sparse), so it is
    * the broadcastable side of the content join — token arrays are
    * materialized in place on the corpus scan and never shuffled
    * (candidate-before-payload again); the keeper window partitions
    * by content hash (high cardinality, no skew). Output is
    * integer-only accounting: docs that lose at least one span, with
    * before/removed/after token counts. */
  def spanScrub(spark: SparkSession, dir: String): DataFrame =
    spanScrubOn(Tables.documents(spark, dir))

  private[graft] def spanScrubOn(corpus: DataFrame): DataFrame = {
    val d = corpus.filter(col("text").isNotNull)
    val spans = dupSpanRuns(d)
    val withContent = spans
      .join(d.select(col("doc_id"), tokens(col("text")).as("t"),
        tokenCount(col("text")).as("n_tokens")), Seq("doc_id"))
      .withColumn("ch", md5(concat_ws(" ",
        slice(col("t"), col("span_start"), col("span_tokens").cast("int")))))
    val byContent = Window.partitionBy(col("ch"))
      .orderBy(col("doc_id"), col("span_start"))
    withContent
      .withColumn("rn", row_number().over(byContent))
      .filter(col("rn") > 1) // every occurrence but the globally-first
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(
        count(lit(1)).as("n_removed_spans"),
        sum(col("span_tokens")).cast("bigint").as("removed_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_removed_spans"),
        col("removed_tokens"),
        (col("n_tokens") - col("removed_tokens")).cast("bigint").as("kept_tokens"))
      .orderBy(col("doc_id"))
  }

  val spanScrubSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |  WHERE text IS NOT NULL),
       |pg AS (
       |  SELECT doc_id, unnest(generate_series(1, len(t) - ${DupSpanMinTokens - 1})) AS pos, t
       |  FROM toks),
       |postings AS (
       |  SELECT doc_id, pos,
       |    md5(array_to_string(t[pos:pos+${DupSpanMinTokens - 1}], ' ')) AS g
       |  FROM pg),
       |dup AS (SELECT g FROM postings GROUP BY g HAVING COUNT(*) >= 2),
       |marked AS (
       |  SELECT doc_id, pos,
       |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM postings JOIN dup USING (g)),
       |spans AS (
       |  SELECT doc_id, MIN(pos) AS span_start,
       |    MAX(pos) - MIN(pos) + $DupSpanMinTokens AS span_tokens
       |  FROM marked GROUP BY doc_id, grp),
       |content AS (
       |  SELECT s.doc_id, s.span_start, s.span_tokens, len(t.t) AS n_tokens,
       |    md5(array_to_string(t.t[s.span_start:s.span_start+s.span_tokens-1], ' ')) AS ch
       |  FROM spans s JOIN toks t USING (doc_id)),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY ch ORDER BY doc_id, span_start) AS rn
       |  FROM content)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  COUNT(*) AS n_removed_spans,
       |  CAST(SUM(span_tokens) AS BIGINT) AS removed_tokens,
       |  CAST(n_tokens - SUM(span_tokens) AS BIGINT) AS kept_tokens
       |FROM ranked WHERE rn > 1
       |GROUP BY doc_id, n_tokens
       |ORDER BY doc_id""".stripMargin

  val dupSpansSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |  WHERE text IS NOT NULL),
       |pg AS (
       |  SELECT doc_id, unnest(generate_series(1, len(t) - ${DupSpanMinTokens - 1})) AS pos, t
       |  FROM toks),
       |postings AS (
       |  SELECT doc_id, pos,
       |    md5(array_to_string(t[pos:pos+${DupSpanMinTokens - 1}], ' ')) AS g
       |  FROM pg),
       |dup AS (SELECT g FROM postings GROUP BY g HAVING COUNT(*) >= 2),
       |marked AS (
       |  SELECT doc_id, pos,
       |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM postings JOIN dup USING (g)),
       |spans AS (
       |  SELECT doc_id, MIN(pos) AS span_start,
       |    MAX(pos) - MIN(pos) + $DupSpanMinTokens AS span_tokens
       |  FROM marked GROUP BY doc_id, grp)
       |SELECT s.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
       |  COUNT(*) AS n_spans,
       |  CAST(SUM(s.span_tokens) AS BIGINT) AS dup_tokens,
       |  CAST(MAX(s.span_tokens) AS BIGINT) AS max_span_tokens
       |FROM spans s JOIN toks t ON t.doc_id = s.doc_id
       |GROUP BY s.doc_id, len(t.t)
       |ORDER BY s.doc_id""".stripMargin

  /** Documents per training batch for q111 (the fixed global batch
    * size the shuffled corpus is cut into). */
  val BatchDocs = 32

  /** Q111: TRAINING-BATCH ASSEMBLY — the step between curation and the
    * trainer: deterministically shuffle the corpus (so batches are
    * i.i.d.-ish across sources rather than source-ordered like q74's
    * packing), cut the shuffled order into fixed-size batches, and
    * report per-batch composition (docs, tokens, distinct sources).
    *
    * The shuffle is [[shuffleKey]] — a seedless multiplicative-hash
    * permutation, injective on the id domain — so the epoch order is
    * reproducible row-wise by BOTH engines (no rand(), the q62/q93
    * determinism rule). Batch id needs each doc's GLOBAL rank in
    * (key, doc_id) order: the single-window form is a one-task global
    * sort at scale, so this reuses the q91/q94 TwoPass distributed
    * prefix shape — sampled balance-only key buckets, per-bucket COUNT
    * subtotals back to the driver (bounded control flow), broadcast
    * offsets, one row-scale shuffle with a within-bucket row_number.
    * Exactness is independent of boundary quality: the bucket function
    * is monotone, so offset + within-bucket rank IS the global rank.
    * CurationSpec pins identity against the literal single-window form
    * plus the full-batches invariant. */
  def trainingBatches(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
    def rows = d.select(col("doc_id"), col("source"),
      tokenCount(col("text")).as("n_tokens"), shuffleKey(col("doc_id")).as("k"))
    val nBuckets = spark.conf.get("spark.sql.shuffle.partitions").toInt.max(2)
    val bucketOf = TwoPass.scoreBuckets(rows, col("k"), nBuckets)
    // per-bucket row counts: bounded by bucket count — driver control
    // flow, not data
    val sub = rows.withColumn("b", bucketOf(col("k")))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))
      .collect().sortBy(_.getAs[Int]("b"))
    val cum = sub.scanLeft(0L)(_ + _.getAs[Long]("n"))
    val offsets = spark.createDataFrame(
      sub.zip(cum).map { case (r, off) => (r.getAs[Int]("b"), off) }.toSeq)
      .toDF("b", "off")
    val w = Window.partitionBy(col("b")).orderBy(col("k"), col("doc_id"))
    rows.withColumn("b", bucketOf(col("k")))
      .join(broadcast(offsets), Seq("b"))
      .withColumn("rnk", col("off") + row_number().over(w) - 1)
      // floor, not a bare cast (the q74 rule): identical in both
      // engines for non-negative exact-under-2^53 values
      .withColumn("batch_id", floor(col("rnk") / BatchDocs).cast("bigint"))
      .groupBy(col("batch_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("batch_tokens"),
        count_distinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("min_doc"))
      .orderBy(col("batch_id"))
  }

  val trainingBatchesSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
       |    ${shuffleKeySql("doc_id")} AS k
       |  FROM documents WHERE text IS NOT NULL),
       |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY k, doc_id) - 1 AS rnk FROM d)
       |SELECT CAST(FLOOR(rnk / $BatchDocs) AS BIGINT) AS batch_id,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
       |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       |  MIN(doc_id) AS min_doc
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q112: RULE-BATTERY QUALITY GATE (the Gopher/C4 heuristic-filter
    * class): five independent exact-integer document rules with
    * per-source funnel accounting — the standard pre-model quality
    * pass a curation pipeline runs before anything expensive touches
    * the corpus. Rules (every threshold a cross-multiplied integer
    * comparison — no float boundary can flip a doc between engines):
    *   R1 word count in [20, 80];
    *   R2 mean token length in [4.2, 4.7] (tokchars*100 vs n*420/470,
    *      where tokchars = len(text) - (n-1) single-space separators);
    *   R3 at least 2 stopword hits (the Gopher "stop word" rule);
    *   R4 stopword ratio >= 5% (nstop*20 >= n);
    *   R5 type-token ratio >= 50% (nd*2 >= n — the repetition rule).
    *
    * One linear scan, one map-side-combining aggregate keyed by the
    * tiny source dimension — nothing here shuffles the corpus payload,
    * and a production threshold change is a constant edit that leaves
    * the plan untouched. Thresholds were probed to discriminate on the
    * synthetic corpus (each rule passes 40-80% of docs at sf0.01). */
  /** The q112 rule battery as ONE conjunction over the four exact
    * count columns — shared by q112's funnel and q184's streaming gate
    * so a threshold change can never drift between the two. */
  private[graft] def gopherPassAll(n: Column, tokchars: Column,
      nd: Column, nstop: Column): Column =
    n.between(20, 80) &&
      tokchars * 100 >= n * 420 && tokchars * 100 <= n * 470 &&
      nstop >= 2 && nstop * 20 >= n && nd * 2 >= n

  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val m = d.select(col("source"),
      tokenCount(col("text")).as("n"),
      (length(col("text")) - tokenCount(col("text")) + 1).as("tokchars"),
      size(distinctTokens(col("text"))).cast("bigint").as("nd"),
      stopwordCount(col("text")).as("nstop"))
    val rWc = col("n").between(20, 80)
    val rMwl = col("tokchars") * 100 >= col("n") * 420 &&
      col("tokchars") * 100 <= col("n") * 470
    val rStop = col("nstop") >= 2
    val rSrat = col("nstop") * 20 >= col("n")
    val rTtr = col("nd") * 2 >= col("n")
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L)).cast("bigint")
    m.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        cnt(rWc).as("pass_wordcount"),
        cnt(rMwl).as("pass_wordlen"),
        cnt(rStop).as("pass_stopcount"),
        cnt(rSrat).as("pass_stopratio"),
        cnt(rTtr).as("pass_ttr"),
        cnt(gopherPassAll(col("n"), col("tokchars"), col("nd"), col("nstop")))
          .as("pass_all"))
      .orderBy(col("source"))
  }

  val gopherRulesSql: String = {
    val stopList = graft.functions.TextFunctions.EnglishStopwords
      .map(s => s"'$s'").mkString(", ")
    s"""WITH d AS (
       |  SELECT source, string_split(text, ' ') AS t, len(text) AS L
       |  FROM documents WHERE text IS NOT NULL),
       |m AS (
       |  SELECT source, len(t) AS n, L - len(t) + 1 AS tokchars,
       |    len(list_distinct(t)) AS nd,
       |    len(list_filter(t, x -> x IN ($stopList))) AS nstop
       |  FROM d)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN n BETWEEN 20 AND 80 THEN 1 ELSE 0 END) AS BIGINT) AS pass_wordcount,
       |  CAST(SUM(CASE WHEN tokchars*100 >= n*420 AND tokchars*100 <= n*470 THEN 1 ELSE 0 END) AS BIGINT) AS pass_wordlen,
       |  CAST(SUM(CASE WHEN nstop >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_stopcount,
       |  CAST(SUM(CASE WHEN nstop*20 >= n THEN 1 ELSE 0 END) AS BIGINT) AS pass_stopratio,
       |  CAST(SUM(CASE WHEN nd*2 >= n THEN 1 ELSE 0 END) AS BIGINT) AS pass_ttr,
       |  CAST(SUM(CASE WHEN n BETWEEN 20 AND 80 AND tokchars*100 >= n*420 AND tokchars*100 <= n*470
       |    AND nstop >= 2 AND nstop*20 >= n AND nd*2 >= n THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
       |FROM m GROUP BY source ORDER BY source""".stripMargin
  }

  /** Per-document split assignment behind q114: (doc_id, source,
    * n_tokens, lbl, split) where lbl is the doc's gram-sharing
    * component (own id for singletons) and split is the deterministic
    * 80/10/10 bucket of the LABEL — so an entire component moves as
    * one unit and no duplicated 8-gram can straddle a split boundary.
    * Persisted `_SUCCESS`-guarded (the q63/q110 convention): the gram
    * scan + star-contraction loop run ONCE per (process, corpus);
    * q114's accounting and any downstream consumer read the landed
    * assignment table. */
  /** Distinct gram-star pairs of the shared-8-gram document graph:
    * every doc holding a cross-doc-duplicated gram connects to that
    * gram's MIN doc — linear in the posting list (never the per-gram
    * clique) and connectivity-preserving, so star-component labels
    * equal the full shared-gram graph's. Shared by q114 (components →
    * splits) and q129 (PageRank over the same graph). */
  /** Overlap unit of the shared-gram document graph (q71's gram size);
    * interpolated into the q114/q129 artifact fingerprints. */
  private[graft] val StarGramK = 8

  private[graft] def dupStarPairs(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), explode(wordShingles(col("text"), StarGramK)).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gh"))
      .distinct()
    val roots = grams.groupBy(col("gh"))
      .agg(min(col("doc_id")).as("root"), count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("gh"), col("root"))
    grams.join(roots, Seq("gh"))
      .filter(col("doc_id") =!= col("root"))
      .select(col("root").as("doc_a"), col("doc_id").as("doc_b"))
      .distinct()
  }

  /** 80/10/10 split boundaries (bucket < Train → train, < Valid →
    * valid, else test); part of the splits artifact fingerprint. */
  private val SplitTrainPct = 80
  private val SplitValidPct = 90

  private[graft] def leakageSplitAssignments(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.Scratch.artifactPath("splits", dir,
      s"_g${StarGramK}s${SplitTrainPct}_$SplitValidPct")
    if (!graft.Scratch.artifactComplete(path)) {
      graft.Scratch.prepareArtifact(path)
      val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
      val edges = dupStarPairs(spark, dir)
      val labels = Dedup.connectedComponents(edges) // (node, lbl = min of component)
      d.select(col("doc_id"), col("source"), tokenCount(col("text")).as("n_tokens"))
        .join(labels, col("doc_id") === col("node"), "left")
        .withColumn("lbl", coalesce(col("lbl"), col("doc_id")))
        .withColumn("split",
          when(sampleBucket(col("lbl")) < SplitTrainPct, "train")
            .when(sampleBucket(col("lbl")) < SplitValidPct, "valid")
            .otherwise("test"))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("lbl"), col("split"))
        .write.mode("overwrite").parquet(path)
    }
    spark.read
      .schema("doc_id BIGINT, source STRING, n_tokens BIGINT, lbl BIGINT, split STRING")
      .parquet(path)
  }

  /** Q114: LEAKAGE-FREE SPLIT ASSIGNMENT — the decontamination-aware
    * train/valid/test split: documents sharing ANY duplicated token
    * 8-gram (q71's overlap unit) must land in the SAME split, so no
    * verbatim passage can leak from train into evaluation. Components
    * of the shared-gram graph move as units; the split is the
    * deterministic [[sampleBucket]] of the component label (80/10/10),
    * reproducible row-wise by both engines — no rand().
    *
    * Scale shape: grams travel as md5 hashes with per-doc distinct
    * BEFORE any aggregation (the q71 rule); edges are gram-STAR pairs
    * (doc, min-doc-of-gram) — linear in postings where the naive
    * per-gram clique is quadratic — and components resolve through the
    * same O(log n)-round star contraction as q63/q110. The oracle
    * rebuilds grams, star edges, WITH RECURSIVE reachability, and the
    * bucket arithmetic exactly. */
  def leakageSplit(spark: SparkSession, dir: String): DataFrame =
    leakageSplitAssignments(spark, dir)
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("lbl")).as("n_components"),
        sum(col("n_tokens")).cast("bigint").as("split_tokens"),
        min(col("doc_id")).as("min_doc"))
      .orderBy(col("split"))

  val leakageSplitSql: String =
    s"""WITH RECURSIVE
       |toks AS (SELECT doc_id, string_split(text, ' ') AS t
       |         FROM documents WHERE text IS NOT NULL),
       |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-7)) AS g
       |        FROM toks WHERE len(t) >= 8),
       |grams AS (SELECT DISTINCT doc_id, md5(array_to_string(t[g:g+7], ' ')) AS gh FROM pos),
       |roots AS (SELECT gh, MIN(doc_id) AS root FROM grams
       |          GROUP BY gh HAVING COUNT(*) >= 2),
       |pairs AS (SELECT DISTINCT r.root AS doc_a, g.doc_id AS doc_b
       |          FROM grams g JOIN roots r USING (gh) WHERE g.doc_id != r.root),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |cc AS (SELECT DISTINCT src AS node, src AS lbl FROM edges
       |       UNION SELECT e.src, cc.lbl FROM edges e JOIN cc ON e.dst = cc.node),
       |lab AS (SELECT node, MIN(lbl) AS lbl FROM cc GROUP BY node),
       |d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
       |      FROM documents WHERE text IS NOT NULL),
       |a AS (SELECT d.doc_id, d.n_tokens, COALESCE(lab.lbl, d.doc_id) AS lbl
       |      FROM d LEFT JOIN lab ON d.doc_id = lab.node),
       |s AS (SELECT *, CASE WHEN ${sampleBucketSql("lbl")} < 80 THEN 'train'
       |                     WHEN ${sampleBucketSql("lbl")} < 90 THEN 'valid'
       |                     ELSE 'test' END AS split FROM a)
       |SELECT split, COUNT(*) AS n_docs,
       |  CAST(COUNT(DISTINCT lbl) AS BIGINT) AS n_components,
       |  CAST(SUM(n_tokens) AS BIGINT) AS split_tokens,
       |  MIN(doc_id) AS min_doc
       |FROM s GROUP BY split ORDER BY split""".stripMargin

  /** Q115: CROSS-SOURCE OVERLAP MATRIX — per source-pair count of
    * distinct duplicated token 8-grams (q71's overlap unit) plus each
    * side's distinct-gram total and the exact Jaccard of the two gram
    * sets. This is the corpus-level contamination report a curation
    * run opens with: which ingest feeds duplicate each other, and how
    * much — the pairwise view whose per-doc resolution is q114's
    * component split.
    *
    * Scale shape: grams travel as md5 hashes with per-(gram, source)
    * distinct BEFORE any aggregation (the q71 rule), so document
    * multiplicity can't amplify. The pair generator is NOT a self-join
    * of the posting list: grams collapse to their distinct source SET
    * (bounded by the source dimension, here 20, never by docs), and
    * pairs expand combinatorially from that tiny sorted array —
    * ≤ C(|S|,2) rows per gram. Totals are a source-cardinality frame
    * broadcast back. Three bounded shuffles; nothing quadratic in the
    * corpus. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
    // round-13: the dedup key is md5 as 16 RAW BYTES (unhex) instead of
    // the 32-char hex string — a bijection of the same digest, so every
    // distinct/group count is unchanged (oracle green) while the
    // distinct + group-by shuffles carry half the key bytes (guide
    // §2.3); and the source-pair expansion reuses the compiled
    // ArrayOrderedPairs kernel (same pairs, same order, same field
    // names — spec-pinned) instead of the two-level interpreted HOF.
    val gs = d
      .select(col("source"), explode(wordShingles(col("text"), 8)).as("gram"))
      .select(unhex(md5(col("gram"))).as("gh"), col("source"))
      .distinct()
    val tot = gs.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
    gs.groupBy(col("gh"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(graft.functions.TextFunctions.orderedPairs(col("ss")))
        .as("p"))
      .groupBy(col("p.a").as("source_a"), col("p.b").as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .join(broadcast(tot.select(
        col("source").as("source_a"), col("n_grams").as("grams_a"))), Seq("source_a"))
      .join(broadcast(tot.select(
        col("source").as("source_b"), col("n_grams").as("grams_b"))), Seq("source_b"))
      .withColumn("jaccard", dec6(col("shared_grams").cast("decimal(18,0)")
        / (col("grams_a") + col("grams_b") - col("shared_grams"))))
      .select(col("source_a"), col("source_b"), col("shared_grams"),
        col("grams_a"), col("grams_b"), col("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val sourceOverlapSql: String =
    """WITH toks AS (SELECT source, string_split(text, ' ') AS t
      |              FROM documents WHERE text IS NOT NULL),
      |pos AS (SELECT source, t, unnest(generate_series(1, len(t)-7)) AS g
      |        FROM toks WHERE len(t) >= 8),
      |gs AS (SELECT DISTINCT md5(array_to_string(t[g:g+7], ' ')) AS gh, source FROM pos),
      |tot AS (SELECT source, COUNT(*) AS n_grams FROM gs GROUP BY source),
      |sh AS (SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared_grams
      |       FROM gs a JOIN gs b ON a.gh = b.gh AND a.source < b.source
      |       GROUP BY 1, 2)
      |SELECT source_a, source_b, shared_grams,
      |  ta.n_grams AS grams_a, tb.n_grams AS grams_b,
      |  CAST((2 * shared_grams * 1000000
      |      + (ta.n_grams + tb.n_grams - shared_grams))
      |    // (2 * (ta.n_grams + tb.n_grams - shared_grams)) AS DOUBLE) / 1000000
      |    AS jaccard
      |FROM sh
      |JOIN tot ta ON sh.source_a = ta.source
      |JOIN tot tb ON sh.source_b = tb.source
      |ORDER BY source_a, source_b""".stripMargin

  /** Q116: PER-DOMAIN CALIBRATED QUALITY FILTERING — keep the top 20%
    * of each source by a quality score, with the per-source threshold
    * computed from an EXACT bounded-domain histogram instead of a
    * per-source sort. A single global quality cut biases the mix
    * toward whichever domain happens to score high (the reason
    * CCNet-class pipelines calibrate per domain); fixing the kept
    * QUANTILE per source keeps every domain represented.
    *
    * Score = type-token ratio in integer per-mille
    * (n_types * 1000 div n_tokens ∈ [0, 1000]) — the q26/q112 lexical-
    * diversity signal made exact-integer so both engines agree
    * bit-for-bit. Threshold t_s = the highest score with
    * cum_docs(score ≥ t_s) * 5 ≥ n_docs (ties at the threshold are all
    * kept — deterministic, no rand()).
    *
    * Scale shape: the score domain is BOUNDED (1001 values), so the
    * histogram groupBy(source, score) map-side-combines to at most
    * |sources| × 1001 rows no matter the corpus size; the cumulative
    * window and threshold argmax run on that tiny frame. ONE corpus
    * scan, one bounded shuffle — where the naive per-source
    * percentile would sort every document of the largest domain
    * through one task. */
  def calibratedQuality(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val scored = d.select(
        col("source"),
        tokenCount(col("text")).as("n_tokens"),
        size(distinctTokens(col("text"))).cast("bigint").as("n_types"))
      .withColumn("score", expr("n_types * 1000 div n_tokens"))
    val hist = scored.groupBy(col("source"), col("score"))
      .agg(count(lit(1)).as("c"), sum(col("n_tokens")).cast("bigint").as("tok"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    hist
      .withColumn("cum", sum(col("c")).over(wCum).cast("bigint"))
      .withColumn("cum_tok", sum(col("tok")).over(wCum).cast("bigint"))
      .withColumn("n_docs", sum(col("c")).over(wAll).cast("bigint"))
      .filter(col("cum") * 5 >= col("n_docs"))
      .groupBy(col("source"))
      .agg(
        max(col("n_docs")).as("n_docs"),
        max(col("score")).as("threshold"),
        max_by(col("cum"), col("score")).as("n_kept"),
        max_by(col("cum_tok"), col("score")).as("kept_tokens"))
      .withColumn("kept_frac",
        dec6(col("n_kept").cast("decimal(18,0)") / col("n_docs")))
      .select(col("source"), col("n_docs"), col("threshold"),
        col("n_kept"), col("kept_tokens"), col("kept_frac"))
      .orderBy(col("source"))
  }

  val calibratedQualitySql: String =
    """WITH d AS (SELECT source,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_distinct(string_split(text, ' '))) AS n_types
      |  FROM documents WHERE text IS NOT NULL),
      |s AS (SELECT source, n_tokens, (n_types * 1000) // n_tokens AS score FROM d),
      |h AS (SELECT source, score, COUNT(*) AS c, SUM(n_tokens) AS tok
      |      FROM s GROUP BY 1, 2),
      |c AS (SELECT source, score,
      |    SUM(c) OVER (PARTITION BY source ORDER BY score DESC
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(tok) OVER (PARTITION BY source ORDER BY score DESC
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok,
      |    SUM(c) OVER (PARTITION BY source) AS n_docs
      |  FROM h)
      |SELECT source, CAST(MAX(n_docs) AS BIGINT) AS n_docs, MAX(score) AS threshold,
      |  CAST(arg_max(cum, score) AS BIGINT) AS n_kept,
      |  CAST(arg_max(cum_tok, score) AS BIGINT) AS kept_tokens,
      |  CAST((2 * arg_max(cum, score) * 1000000 + MAX(n_docs))
      |    // (2 * MAX(n_docs)) AS DOUBLE) / 1000000 AS kept_frac
      |FROM c WHERE cum * 5 >= n_docs
      |GROUP BY source ORDER BY source""".stripMargin

  /** Documents per training micro-batch for q118. */
  val PadBatchDocs = 16

  /** Token width of one q118 length band. */
  val BandTokens = 64

  /** Q118: LENGTH-BUCKETED BATCHING — the padding-efficiency operator:
    * group documents into [[BandTokens]]-token length bands, cut each
    * band into [[BatchDocs]]-document micro-batches in stable doc_id
    * order, and account the padding waste (every batch member pads to
    * its batch's max length — the cost bucketing exists to minimize).
    * Output is the per-(source, band) padding ledger: docs, batches,
    * real tokens, padded tokens, waste fraction — the report that
    * tells a training job whether its bucketing is tight enough.
    *
    * Scale shape: banding is a per-row integer div; batch assignment
    * is a window keyed (source, band) — the same per-source
    * parallelism contract as q74, with the same documented remedy (a
    * TwoPass distributed prefix rank, drop-in because batch indices
    * only need within-partition order). Both aggregations reuse the
    * window's (source, band) partitioning — Catalyst plans ONE
    * exchange before the output sort. Integer math end to end; the
    * only division is the final dec6 waste ratio (padded > 0 always:
    * every batch has ≥ 1 doc of ≥ 1 token). */
  def lengthBucketBatches(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"), col("bucket")).orderBy(col("doc_id"))
    Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), tokenCount(col("text")).as("n_tokens"))
      .withColumn("bucket", expr(s"(n_tokens - 1) div $BandTokens"))
      .withColumn("bi", expr(s"(row_number() over (partition by source, bucket order by doc_id) - 1) div $PadBatchDocs"))
      .groupBy(col("source"), col("bucket"), col("bi"))
      .agg(count(lit(1)).as("c"), max(col("n_tokens")).as("mx"),
        sum(col("n_tokens")).as("s"))
      .groupBy(col("source"), col("bucket"))
      .agg(
        sum(col("c")).cast("bigint").as("n_docs"),
        count(lit(1)).as("n_batches"),
        sum(col("s")).cast("bigint").as("batch_tokens"),
        sum(col("c") * col("mx")).cast("bigint").as("padded_tokens"))
      .withColumn("waste_frac", dec6(
        (col("padded_tokens") - col("batch_tokens")).cast("decimal(18,0)")
          / col("padded_tokens")))
      .orderBy(col("source"), col("bucket"))
  }

  val lengthBucketBatchesSql: String =
    s"""WITH d AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
       |           FROM documents WHERE text IS NOT NULL),
       |b AS (SELECT *, (n_tokens - 1) // $BandTokens AS bucket FROM d),
       |r AS (SELECT *, (ROW_NUMBER() OVER (PARTITION BY source, bucket ORDER BY doc_id) - 1) // $PadBatchDocs AS bi
       |      FROM b),
       |g AS (SELECT source, bucket, bi, COUNT(*) AS c, MAX(n_tokens) AS mx,
       |             SUM(n_tokens) AS s
       |      FROM r GROUP BY 1, 2, 3)
       |SELECT source, bucket,
       |  CAST(SUM(c) AS BIGINT) AS n_docs,
       |  COUNT(*) AS n_batches,
       |  CAST(SUM(s) AS BIGINT) AS batch_tokens,
       |  CAST(SUM(c * mx) AS BIGINT) AS padded_tokens,
       |  CAST((2 * (SUM(c * mx) - SUM(s)) * 1000000 + SUM(c * mx))
       |    // (2 * SUM(c * mx)) AS DOUBLE) / 1000000 AS waste_frac
       |FROM g GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin

  /** MinHash permutations for q119's sketch estimate. */
  val OverlapPerms = 32

  /** Q119: SOURCE-OVERLAP MINHASH ESTIMATE — the sketch twin of q115's
    * exact cross-source Jaccard matrix, via ONE-PERMUTATION MinHash
    * (Li et al., NIPS 2012 class): each gram is hashed ONCE (md5), its
    * first two hex chars route it to one of [[OverlapPerms]] bins, and
    * the bin keeps the lexicographic min of the remaining 30 hex chars.
    * A source pair's Jaccard is estimated as the fraction of bins whose
    * minima agree; empty bins (possible only for near-empty sources)
    * score as non-matching. Unlike q115, EVERY pair appears (a zero
    * estimate is a result), which is what a recurring contamination
    * monitor wants: fixed-size output, fixed cost.
    *
    * Scale shape: this is the 100 TB path where q115's exact matrix is
    * the audit tool. One hash per gram — the first-cut K-independent-
    * permutation form cost 32 md5s per gram and benched 8.7s at sf0.1;
    * this form is ~1 because binning is two char lookups. No distinct
    * is needed (min is multiplicity-blind), so the corpus collapses in
    * ONE map-side-combining aggregate to |sources| x bins rows; the
    * bin grid, pair join and estimate all run on that bounded frame.
    * CurationSpec pins the estimator against q115's exact values. */
  def sourceOverlapMinHash(spark: SparkSession, dir: String): DataFrame = {
    val slotExpr = "((position(substring(gh, 1, 1) IN '0123456789abcdef') - 1) * 16" +
      s" + (position(substring(gh, 2, 1) IN '0123456789abcdef') - 1)) % $OverlapPerms"
    val sig = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("source"), explode(wordShingles(col("text"), 8)).as("gram"))
      .select(col("source"), md5(col("gram")).as("gh"))
      .select(col("source"), expr(slotExpr).as("p"),
        expr("substring(gh, 3)").as("v"))
      .groupBy(col("source"), col("p"))
      .agg(min(col("v")).as("h"))
    // full |sources| x bins grid so sparse sources can't drop pairs
    val grid = sig.select(col("source")).distinct()
      .withColumn("p", explode(sequence(lit(0), lit(OverlapPerms - 1))))
      .join(sig, Seq("source", "p"), "left")
    val a = grid.select(col("source").as("source_a"), col("p"), col("h").as("ha"))
    val b = grid.select(col("source").as("source_b"), col("p"), col("h").as("hb"))
    a.join(b, Seq("p"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(when(col("ha").isNotNull && (col("ha") === col("hb")), 1L)
        .otherwise(0L)).cast("bigint").as("matching_perms"))
      .withColumn("est_jaccard", dec6(
        col("matching_perms").cast("decimal(18,0)") / OverlapPerms))
      .orderBy(col("source_a"), col("source_b"))
  }

  val sourceOverlapMinHashSql: String =
    s"""WITH toks AS (SELECT source, string_split(text, ' ') AS t
       |              FROM documents WHERE text IS NOT NULL),
       |pos AS (SELECT source, t, unnest(generate_series(1, len(t)-7)) AS g
       |        FROM toks WHERE len(t) >= 8),
       |gr AS (SELECT source, md5(array_to_string(t[g:g+7], ' ')) AS gh FROM pos),
       |sig AS (SELECT source,
       |          ((position(substring(gh, 1, 1) IN '0123456789abcdef') - 1) * 16
       |           + (position(substring(gh, 2, 1) IN '0123456789abcdef') - 1)) % $OverlapPerms AS p,
       |          MIN(substring(gh, 3)) AS h
       |        FROM gr GROUP BY 1, 2),
       |gs AS (SELECT g.source, p.generate_series AS p
       |       FROM (SELECT DISTINCT source FROM gr) g,
       |            generate_series(0, ${OverlapPerms - 1}) p),
       |grid AS (SELECT gs.source, gs.p, sig.h
       |         FROM gs LEFT JOIN sig USING (source, p))
       |SELECT a.source AS source_a, b.source AS source_b,
       |  CAST(SUM(CASE WHEN a.h IS NOT NULL AND a.h = b.h THEN 1 ELSE 0 END) AS BIGINT) AS matching_perms,
       |  CAST(CAST(ROUND(CAST(SUM(CASE WHEN a.h IS NOT NULL AND a.h = b.h THEN 1 ELSE 0 END)
       |    AS DECIMAL(18,0)) / $OverlapPerms, 6) AS DECIMAL(38,6)) AS DOUBLE) AS est_jaccard
       |FROM grid a JOIN grid b ON a.p = b.p AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin

  /** Vocabulary size for q120's background distribution. */
  val AnomalyVocab = 64

  /** Q120: DISTRIBUTIONAL ANOMALY SCORE — rank documents by how far
    * their unigram distribution sits from the corpus background: the
    * exact L1 distance between the document's token distribution and
    * the corpus distribution, restricted to the top-[[AnomalyVocab]]
    * corpus tokens (ties broken by token text, so the vocabulary is
    * deterministic). Off-distribution documents — wrong language,
    * boilerplate, machine-generated filler — surface at the top; the
    * report returns the 20 most anomalous.
    *
    * Exactness: with o_v = in-doc count, len = doc tokens, tf_v =
    * corpus count, N = corpus tokens, the score is
    * sum_v |o_v*N - len*tf_v| — an INTEGER (the common-denominator
    * cross-multiplication of sum |o/len - tf/N|); the normalized form
    * divides by 2*N*len into [0,1] at dec6. Both engines compute it
    * bit-for-bit; no floats anywhere.
    *
    * Scale shape: only OBSERVED (doc, vocab-token) pairs materialize —
    * the |V|-dense sum folds the unobserved-token mass in
    * algebraically: sum_{o_v=0} len*tf_v = len*T - sum_{o_v>0} len*tf_v
    * with T = sum_V tf_v, so score = sum_{o_v>0}(|o*N - len*tf| -
    * len*tf) + len*T. The vocabulary (64 rows) and the (N, T) scalar
    * frame ride in as broadcasts; the only corpus-keyed exchange is
    * the per-(doc, token) count, grouped by high-cardinality doc_id.
    * The 1-row scalar crossJoin is the q89/q93 allowlisted BNLJ. */
  def distributionalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
      .withColumn("len", size(col("t")).cast("bigint"))
    val tok = d.select(col("doc_id"), col("len"), explode(col("t")).as("tok"))
    val vocab = tok.groupBy(col("tok"))
      .agg(count(lit(1)).cast("bigint").as("tf"))
      .orderBy(col("tf").desc, col("tok")).limit(AnomalyVocab)
    val scalars = tok.agg(count(lit(1)).cast("bigint").as("n_total"))
      .crossJoin(broadcast(
        vocab.agg(sum(col("tf")).cast("bigint").as("t_total"))))
    val part = tok.join(broadcast(vocab), Seq("tok"))
      .groupBy(col("doc_id"), col("len"), col("tok"), col("tf"))
      .agg(count(lit(1)).cast("bigint").as("o"))
      .crossJoin(broadcast(scalars))
      .groupBy(col("doc_id"))
      .agg(sum(
        abs(col("o") * col("n_total") - col("len") * col("tf"))
          - col("len") * col("tf")).cast("bigint").as("ps"))
    d.join(part, Seq("doc_id"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"), col("source"), col("len").as("n_tokens"),
        (coalesce(col("ps"), lit(0L)) + col("len") * col("t_total"))
          .as("l1_score"),
        col("n_total"))
      .withColumn("anomaly", dec6(col("l1_score").cast("decimal(18,0)")
        / (lit(2L) * col("n_total") * col("n_tokens"))))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("l1_score"), col("anomaly"))
      .orderBy(col("anomaly").desc, col("doc_id")).limit(20)
  }

  val distributionalAnomalySql: String =
    s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS t
       |           FROM documents WHERE text IS NOT NULL),
       |dl AS (SELECT doc_id, source, len(t) AS len, t FROM d),
       |tok AS (SELECT doc_id, len, unnest(t) AS tok FROM dl),
       |vocab AS (SELECT tok, COUNT(*) AS tf FROM tok
       |          GROUP BY tok ORDER BY tf DESC, tok LIMIT $AnomalyVocab),
       |scal AS (SELECT (SELECT COUNT(*) FROM tok) AS n_total,
       |                (SELECT SUM(tf) FROM vocab) AS t_total),
       |o AS (SELECT doc_id, len, v.tok, v.tf, COUNT(*) AS o
       |      FROM tok JOIN vocab v USING (tok) GROUP BY 1, 2, 3, 4),
       |part AS (SELECT doc_id,
       |           SUM(ABS(o * s.n_total - len * tf) - len * tf) AS ps
       |         FROM o, scal s GROUP BY doc_id),
       |sc AS (SELECT dl.doc_id, dl.source, dl.len AS n_tokens,
       |         COALESCE(p.ps, 0) + dl.len * s.t_total AS l1_score,
       |         s.n_total
       |       FROM dl LEFT JOIN part p USING (doc_id), scal s)
       |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(l1_score AS BIGINT) AS l1_score,
       |  CAST((2 * l1_score * 1000000 + 2 * n_total * n_tokens)
       |    // (2 * 2 * n_total * n_tokens) AS DOUBLE) / 1000000 AS anomaly
       |FROM sc ORDER BY anomaly DESC, doc_id LIMIT 20""".stripMargin

  /** Q187: NEAR-DUP MIRROR MATRIX — q185's consumer and the
    * source-level rollup global dedup planning needs: which SOURCE
    * PAIRS carry near-duplicate documents (J ≥ 0.8 on word-3-shingle
    * sets, q185's exact prefix-filtered join), including the
    * same-source diagonal (internal duplication). On this corpus the
    * duplication is overwhelmingly CROSS-source (24 of 25 verified
    * pairs at sf0.01) — exactly the mirror signal a per-source dedup
    * would miss entirely, and the reason dedup must shuffle globally
    * rather than per source.
    *
    * Scale shape: the verified pair list is q185's candidate-verify
    * output — small on THIS corpus, but NOT bounded in general: on a
    * mirror-heavy corpus (this operator's own motivating case) the
    * near-dup pair count grows with the square of cluster sizes, so no
    * broadcast hint on it — the doc→source joins shuffle on doc id
    * (AQE still broadcasts when the measured pair frame is small) and
    * the rollup aggregates into the ≤ |sources|² grid. A deployment
    * that must bound the pair frame caps cluster contribution first
    * (q63's cluster labels give the cap key). max_jaccard is an order
    * statistic over already-rounded dec6 values — no re-rounding (the
    * q151 layered-rounding rule). */
  def mirrorMatrix(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.prefixPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val src = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"),
        max(col("jaccard")).as("max_jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Oracle: the q185 brute-force chain (co-occurrence intersections —
    * completeness argument in Dedup.prefixJaccardJoinSql) rolled up to
    * source pairs. */
  val mirrorMatrixSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
      |           FROM documents WHERE text IS NOT NULL),
      |shl AS (SELECT doc_id,
      |         list_distinct(list_transform(generate_series(1, len(t) - 2),
      |           g -> array_to_string(t[g:g+2], ' '))) AS ts
      |       FROM d WHERE len(t) >= 3),
      |sz AS (SELECT doc_id, len(ts) AS s FROM shl),
      |grams AS (SELECT doc_id, unnest(ts) AS sh FROM shl),
      |co AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      |       FROM grams a JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2),
      |j AS (SELECT doc_a, doc_b, n_inter, sa.s + sb.s - n_inter AS n_union
      |      FROM co JOIN sz sa ON doc_a = sa.doc_id
      |      JOIN sz sb ON doc_b = sb.doc_id),
      |v AS (SELECT doc_a, doc_b,
      |        CAST((2 * n_inter * 1000000 + n_union) // (2 * n_union) AS DOUBLE)
      |          / 1000000 AS jaccard
      |      FROM j WHERE 5 * n_inter >= 4 * n_union),
      |ds AS (SELECT doc_id, source FROM documents WHERE text IS NOT NULL)
      |SELECT LEAST(da.source, db.source) AS source_a,
      |  GREATEST(da.source, db.source) AS source_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  MAX(jaccard) AS max_jaccard
      |FROM v JOIN ds da ON v.doc_a = da.doc_id
      |JOIN ds db ON v.doc_b = db.doc_id
      |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin

  /** Q188: FUZZY DECONTAMINATION — the GPT-3/Pile-style NEAR-DUP
    * admission check q71's exact-gram decontamination cannot express:
    * an incoming document (the doc_id % 5 batch, the q104/q108/q184
    * convention) is flagged when it is a ≥ 0.8-Jaccard near-duplicate
    * of some CORPUS document — catching lightly-edited copies whose
    * verbatim 8-grams were all perturbed. Per flagged doc: match
    * count, the best corpus match (max Jaccard, ties to the lowest
    * doc_id) and its score.
    *
    * Derivation: boundary-crossing pairs of the q185 verified-pair
    * artifact (exact by the prefix-filter theorem — no recall loss),
    * rolled up per batch doc. An INCREMENTAL deployment runs the
    * asymmetric form of the same machinery — the corpus side's
    * rare-first prefix index persists (q104's pattern applied to
    * near-dup), each batch builds prefixes under the corpus ordering
    * (unseen shingles rank rarest) and probes only the index buckets
    * its prefixes hit; candidates and verification are unchanged.
    *
    * Scale shape: everything here is bounded — the artifact read, the
    * orientation filter, the per-doc window over ≤ matches-per-doc
    * rows. 14 of 25 verified pairs cross the batch boundary at
    * sf0.01, so the report is non-degenerate by construction. */
  def fuzzyDecontam(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val crossing = Dedup.prefixPairs(spark, dir)
      .filter((col("doc_a") % 5 === 0) =!= (col("doc_b") % 5 === 0))
      .select(
        when(col("doc_a") % 5 === 0, col("doc_a")).otherwise(col("doc_b"))
          .as("doc_id"),
        when(col("doc_a") % 5 === 0, col("doc_b")).otherwise(col("doc_a"))
          .as("corpus_doc"),
        col("jaccard"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("corpus_doc"))
    crossing
      .withColumn("rn", row_number().over(w))
      .withColumn("n_matches", count(lit(1))
        .over(Window.partitionBy(col("doc_id"))).cast("bigint"))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n_matches"),
        col("corpus_doc").as("best_match"), col("jaccard").as("best_jaccard"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the q185 brute-force co-occurrence chain, restricted to
    * boundary-crossing pairs and rolled up per batch doc. */
  val fuzzyDecontamSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
      |           FROM documents WHERE text IS NOT NULL),
      |shl AS (SELECT doc_id,
      |         list_distinct(list_transform(generate_series(1, len(t) - 2),
      |           g -> array_to_string(t[g:g+2], ' '))) AS ts
      |       FROM d WHERE len(t) >= 3),
      |sz AS (SELECT doc_id, len(ts) AS s FROM shl),
      |grams AS (SELECT doc_id, unnest(ts) AS sh FROM shl),
      |co AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      |       FROM grams a JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2),
      |v AS (SELECT doc_a, doc_b, n_inter, sa.s + sb.s - n_inter AS n_union
      |      FROM co JOIN sz sa ON doc_a = sa.doc_id
      |      JOIN sz sb ON doc_b = sb.doc_id
      |      WHERE 5 * n_inter >= 4 * (sa.s + sb.s - n_inter)),
      |x AS (SELECT
      |        CASE WHEN doc_a % 5 = 0 THEN doc_a ELSE doc_b END AS doc_id,
      |        CASE WHEN doc_a % 5 = 0 THEN doc_b ELSE doc_a END AS corpus_doc,
      |        CAST((2 * n_inter * 1000000 + n_union) // (2 * n_union) AS DOUBLE)
      |          / 1000000 AS jaccard
      |      FROM v WHERE (doc_a % 5 = 0) != (doc_b % 5 = 0)),
      |r AS (SELECT doc_id, corpus_doc, jaccard,
      |        ROW_NUMBER() OVER (PARTITION BY doc_id
      |          ORDER BY jaccard DESC, corpus_doc) AS rn,
      |        COUNT(*) OVER (PARTITION BY doc_id) AS n_matches
      |      FROM x)
      |SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches,
      |  corpus_doc AS best_match, jaccard AS best_jaccard
      |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Vocabulary size for [[bigramSurprisal]] — the q120/q130 bounded
    * top-64 convention; everything outside it folds into `<unk>`. */
  val SurprisalVocab = 64

  /** Q183: BIGRAM-LM SURPRISAL SCORING — the CCNet perplexity-bucket
    * filter (q89's unigram rarity upgraded to a conditional model): fit
    * a bigram language model over a bounded vocabulary on the corpus
    * itself, score every document by its mean per-transition surprisal
    * proxy, and bucket the corpus into head/middle/tail thirds (CCNet's
    * split — head = most in-distribution text) with a per-(source,
    * bucket) report.
    *
    * No libm anywhere (the q66/q89 discipline): the per-transition
    * score is the exact INVERSE CONDITIONAL PROBABILITY c(w1)/c(w1,w2)
    * — monotone with -log p like every rarity proxy in this suite —
    * published at micro-unit integers via the (2N+D)//(2D) half-up
    * formula (q151), so per-pair scores, per-doc means, tercile
    * thresholds and bucket averages are ALL exact integer arithmetic
    * both engines replay bit-for-bit. Out-of-vocabulary tokens fold to
    * `<unk>` BEFORE counting (standard open-vocабulary backoff), and
    * since model counts and scored pairs come from the same corpus,
    * every scored transition has a count — no smoothing term to drift.
    *
    * Scale shape: one row-scale token aggregation bounds the
    * vocabulary (collected as 64 strings of driver control flow — the
    * q130 codebook convention); the bigram model is a bounded
    * ≤ (V+1)² frame built from one pair-stream aggregation and joined
    * back as a BROADCAST; the per-doc score is one map-side-combined
    * aggregation keyed by high-cardinality doc_id; terciles come from
    * [[TwoPass.groupRankLookup]] (never a global sort); the final
    * report aggregates to the bounded (source, bucket) grid. Integer
    * headroom: 2·c(w1)·10⁶ caps at ~5·10¹¹ at sf0.1 and holds to
    * ~10¹² transitions; beyond that the BOUNDED model frame's s6
    * arithmetic widens to DECIMAL(38,0) (ANSI mode throws, never
    * corrupts) — the row-scale passes carry only counts either way.
    * Documents with < 2 tokens have no transitions and drop from the
    * report on both engines (mirrored len >= 2). */
  /** The q183 per-document surprisal pipeline BEFORE the checkpoint —
    * extracted so PlanDump can capture the build-path plan (the
    * registered query's explain shows only the post-checkpoint
    * LogicalRDD). Identical logic, called exactly once by
    * [[bigramSurprisal]]. */
  private[graft] def bigramPerDoc(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
    val vocab: Seq[String] = d.select(explode(col("t")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(SurprisalVocab)
      .collect().map(_.getString(0)).toSeq
    // (round-12 note: checkpointing `pairs` measured flat locally and
    // would materialize a token-scale frame at 100 TB — recomputing the
    // tokenize+explode for the second consumer is the cheaper side of
    // the guide §5 trade, so the double evaluation stays.)
    // round-13: the pair stream was zip_with over two slice copies with
    // an interpreted lambda plus TWO 64-entry set-membership expressions
    // per pair (guide §4 — and pairs evaluates twice, so every cost
    // doubled). graft.functions.BigramUnkPairs emits the identical
    // (w1, w2) structs in one compiled pass, folding each token through
    // one hash set exactly once (pinned in TextAnalysisSpec).
    val pairs = d.filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(graft.functions.TextFunctions.bigramUnkPairs(
          col("t"), vocab, "<unk>")).as("p"))
      .select(col("doc_id"), col("source"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bigrams = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("bigint").as("c12"))
    val surp = bigrams
      .withColumn("c1", sum(col("c12"))
        .over(Window.partitionBy(col("w1"))).cast("bigint"))
      .withColumn("s6", expr("(2 * c1 * 1000000 + c12) div (2 * c12)"))
      .select(col("w1"), col("w2"), col("s6"))
    pairs.join(broadcast(surp), Seq("w1", "w2"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"),
        sum(col("s6")).cast("bigint").as("ssum"))
      .withColumn("mean6", expr("(2 * ssum + n_pairs) div (2 * n_pairs)"))
  }

  def bigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: the rank kernel makes two more passes (histogram
    // + pruned fetch) and the report a third — lazily each would replay
    // the whole explode->join->agg pipeline (the q129 trap; measured
    // 5.1 s -> 1.4 s at sf0.1). The materialized frame is |docs| rows
    // of four narrow columns, executor-local blocks.
    val perDoc = bigramPerDoc(spark, dir).localCheckpoint()
    val gr = TwoPass.groupRankLookup(spark,
      perDoc.select(lit("all").as("k"), col("mean6").as("c")),
      n => Seq(math.max(n / 3, 1L), math.max(2 * n / 3, 1L)))
      .getOrElse("all", TwoPass.GroupRanks(0L, Map.empty))
    val v1 = gr.at.getOrElse(math.max(gr.n / 3, 1L), Long.MaxValue)
    val v2 = gr.at.getOrElse(math.max(2 * gr.n / 3, 1L), Long.MaxValue)
    perDoc
      .withColumn("bucket",
        when(col("mean6") <= v1, "head")
          .when(col("mean6") <= v2, "middle").otherwise("tail"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("mean6")).cast("bigint").as("smean"))
      .select(col("source"), col("bucket"), col("n_docs"),
        (expr("(2 * smean + n_docs) div (2 * n_docs)").cast("double") / 1000000)
          .as("avg_surprisal"))
      .orderBy(col("source"), col("bucket"))
  }

  /** DuckDB twin: replays the whole chain — vocab, `<unk>` fold,
    * bigram/left-context counts, micro-unit scores, per-doc means,
    * tercile thresholds at the same GREATEST(n//3, 1) ranks, bucket
    * report — all in the same exact integer arithmetic. */
  val bigramSurprisalSql: String =
    s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS t
       |           FROM documents WHERE text IS NOT NULL),
       |tok AS (SELECT unnest(t) AS tok FROM d),
       |vocab AS (SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM tok
       |          GROUP BY tok ORDER BY c DESC, tok LIMIT $SurprisalVocab)),
       |ix AS (SELECT doc_id, source, t,
       |         unnest(generate_series(1, len(t) - 1)) AS i
       |       FROM d WHERE len(t) >= 2),
       |pr AS (SELECT doc_id, source,
       |         CASE WHEN t[i] IN (SELECT tok FROM vocab)
       |              THEN t[i] ELSE '<unk>' END AS w1,
       |         CASE WHEN t[i+1] IN (SELECT tok FROM vocab)
       |              THEN t[i+1] ELSE '<unk>' END AS w2
       |       FROM ix),
       |bg AS (SELECT w1, w2, COUNT(*) AS c12 FROM pr GROUP BY 1, 2),
       |sp AS (SELECT w1, w2, c12,
       |         SUM(c12) OVER (PARTITION BY w1) AS c1 FROM bg),
       |s6 AS (SELECT w1, w2,
       |         (2 * c1 * 1000000 + c12) // (2 * c12) AS s6 FROM sp),
       |pd AS (SELECT doc_id, source, COUNT(*) AS n_pairs, SUM(s6) AS ssum
       |       FROM pr JOIN s6 USING (w1, w2) GROUP BY 1, 2),
       |md AS (SELECT doc_id, source,
       |         (2 * ssum + n_pairs) // (2 * n_pairs) AS mean6 FROM pd),
       |rk AS (SELECT source, mean6, ROW_NUMBER() OVER (ORDER BY mean6) AS rn,
       |         COUNT(*) OVER () AS n FROM md),
       |th AS (SELECT MAX(CASE WHEN rn = GREATEST(n // 3, 1) THEN mean6 END) AS v1,
       |              MAX(CASE WHEN rn = GREATEST(2 * n // 3, 1) THEN mean6 END) AS v2
       |       FROM rk),
       |b AS (SELECT source,
       |        CASE WHEN mean6 <= t.v1 THEN 'head'
       |             WHEN mean6 <= t.v2 THEN 'middle' ELSE 'tail' END AS bucket,
       |        mean6
       |      FROM rk CROSS JOIN th t)
       |SELECT source, bucket, COUNT(*) AS n_docs,
       |  CAST((2 * SUM(mean6) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 1000000
       |    AS avg_surprisal
       |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q122: CORPUS SNAPSHOT DIFF — the incremental-ingest delta report
    * between two corpus versions: which documents were added, removed,
    * changed, or untouched, per source. The two snapshots are
    * deterministic derivations of the documents table (old = doc_id %
    * 17 != 3, new = doc_id % 13 != 5 with a text revision at doc_id %
    * 11 == 7), standing in for two warehouse partitions of the same
    * corpus — both engines derive them identically, so the oracle
    * replays the whole diff.
    *
    * Scale shape: content equality travels as md5 (fixed 16 bytes —
    * the text payload is hashed at scan time and never crosses an
    * exchange); the diff is ONE full-outer hash join keyed by
    * high-cardinality doc_id; the per-(source, status) ledger
    * map-side-combines to a bounded frame. This is the shape that
    * diffs two 100 TB snapshots with one row-scale shuffle of 24-byte
    * rows. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val old = d.filter(col("doc_id") % 17 =!= 3)
      .select(col("doc_id"), col("source").as("src_old"),
        md5(col("text")).as("h_old"))
    val neu = d.filter(col("doc_id") % 13 =!= 5)
      .select(col("doc_id"), col("source").as("src_new"),
        md5(when(col("doc_id") % 11 === 7,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
          .as("h_new"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") === col("h_new"), lit("unchanged"))
          .otherwise(lit("changed")))
      .withColumn("source", coalesce(col("src_new"), col("src_old")))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"), col("status"))
  }

  val snapshotDiffSql: String =
    """WITH d AS (SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL),
      |o AS (SELECT doc_id, source AS src_old, md5(text) AS h_old
      |      FROM d WHERE doc_id % 17 != 3),
      |n AS (SELECT doc_id, source AS src_new,
      |        md5(CASE WHEN doc_id % 11 = 7 THEN text || ' [rev2]' ELSE text END) AS h_new
      |      FROM d WHERE doc_id % 13 != 5),
      |j AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |        COALESCE(src_new, src_old) AS source,
      |        CASE WHEN h_old IS NULL THEN 'added'
      |             WHEN h_new IS NULL THEN 'removed'
      |             WHEN h_old = h_new THEN 'unchanged'
      |             ELSE 'changed' END AS status
      |      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      |SELECT source, status, COUNT(*) AS n_docs,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM j GROUP BY 1, 2 ORDER BY source, status""".stripMargin

  /** Q126: CORPUS VERSION DRIFT — q122's distributional companion:
    * per source, the exact L1 shift between the OLD and NEW snapshot's
    * token distributions over a deterministic top-[[AnomalyVocab]]
    * vocabulary (drawn from the old snapshot, so the yardstick doesn't
    * move with the data under test). q122 says WHICH documents changed;
    * q126 says whether the change MOVED the distribution — the check a
    * recurring ingest runs before promoting a new corpus version.
    *
    * Exactness: with per-source totals N_old/N_new (all tokens) and
    * per-(source, vocab-token) counts tf_old/tf_new, the drift is
    * sum_v |tf_new·N_old − tf_old·N_new| — the integer
    * cross-multiplication of sum_v |p_new − p_old|; normalized by
    * 2·N_old·N_new into [0, 1] at dec6.
    *
    * Scale shape: both snapshot token streams union into ONE
    * (source, token) aggregation with side-conditional sums (no
    * old-vs-new join anywhere); totals and doc counts are
    * source-bounded frames, the vocabulary is a 64-row broadcast, and
    * the drift sum runs on <= |sources| x 64 rows. */
  def versionDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val old = d.filter(col("doc_id") % 17 =!= 3)
      .select(col("source"), lit(0L).as("side"), tokens(col("text")).as("t"))
    val neu = d.filter(col("doc_id") % 13 =!= 5)
      .select(col("source"), lit(1L).as("side"),
        tokens(when(col("doc_id") % 11 === 7,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text"))).as("t"))
    val docs = old.unionByName(neu)
    val tok = docs.select(col("source"), col("side"), explode(col("t")).as("tok"))
    val tf = tok.groupBy(col("source"), col("tok"))
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("tf_old"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("tf_new"))
    val tot = tok.groupBy(col("source"))
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_old_tokens"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_new_tokens"))
    val nd = docs.groupBy(col("source"))
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_old_docs"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_new_docs"))
    val vocab = tok.filter(col("side") === 0).groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(AnomalyVocab)
      .select(col("tok"))
    tf.join(broadcast(vocab), Seq("tok"))
      .join(broadcast(tot), Seq("source"))
      .groupBy(col("source"))
      .agg(
        max(col("n_old_tokens")).as("n_old_tokens"),
        max(col("n_new_tokens")).as("n_new_tokens"),
        sum(abs(col("tf_new") * col("n_old_tokens")
          - col("tf_old") * col("n_new_tokens"))).as("l1_drift"))
      .join(broadcast(nd), Seq("source"))
      .withColumn("drift", dec6(col("l1_drift").cast("decimal(18,0)")
        / (lit(2L) * col("n_old_tokens") * col("n_new_tokens"))))
      .select(col("source"), col("n_old_docs"), col("n_new_docs"),
        col("n_old_tokens"), col("n_new_tokens"), col("l1_drift"), col("drift"))
      .orderBy(col("source"))
  }

  val versionDriftSql: String =
    s"""WITH d AS (SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL),
       |docs AS (
       |  SELECT source, 0 AS side, string_split(text, ' ') AS t
       |  FROM d WHERE doc_id % 17 != 3
       |  UNION ALL
       |  SELECT source, 1 AS side,
       |    string_split(CASE WHEN doc_id % 11 = 7 THEN text || ' [rev2]'
       |                      ELSE text END, ' ') AS t
       |  FROM d WHERE doc_id % 13 != 5),
       |tok AS (SELECT source, side, unnest(t) AS tok FROM docs),
       |tf AS (SELECT source, tok,
       |         SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS tf_old,
       |         SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS tf_new
       |       FROM tok GROUP BY 1, 2),
       |tot AS (SELECT source,
       |          SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS n_old_tokens,
       |          SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS n_new_tokens
       |        FROM tok GROUP BY 1),
       |nd AS (SELECT source,
       |         SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS n_old_docs,
       |         SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS n_new_docs
       |       FROM docs GROUP BY 1),
       |vocab AS (SELECT tok FROM (
       |    SELECT tok, COUNT(*) AS c FROM tok WHERE side = 0 GROUP BY tok
       |    ORDER BY c DESC, tok LIMIT $AnomalyVocab)),
       |dr AS (SELECT tf.source,
       |         MAX(tot.n_old_tokens) AS n_old_tokens,
       |         MAX(tot.n_new_tokens) AS n_new_tokens,
       |         SUM(ABS(tf.tf_new * tot.n_old_tokens
       |           - tf.tf_old * tot.n_new_tokens)) AS l1_drift
       |       FROM tf JOIN vocab USING (tok) JOIN tot ON tf.source = tot.source
       |       GROUP BY 1)
       |SELECT dr.source,
       |  CAST(nd.n_old_docs AS BIGINT) AS n_old_docs,
       |  CAST(nd.n_new_docs AS BIGINT) AS n_new_docs,
       |  CAST(dr.n_old_tokens AS BIGINT) AS n_old_tokens,
       |  CAST(dr.n_new_tokens AS BIGINT) AS n_new_tokens,
       |  CAST(dr.l1_drift AS BIGINT) AS l1_drift,
       |  CAST((2 * dr.l1_drift * 1000000 + 2 * dr.n_old_tokens * dr.n_new_tokens)
       |    // (2 * 2 * dr.n_old_tokens * dr.n_new_tokens) AS DOUBLE) / 1000000
       |    AS drift
       |FROM dr JOIN nd ON dr.source = nd.source
       |ORDER BY dr.source""".stripMargin

  /** PageRank iterations for q129. */
  val PrIters = 5

  /** Q129: PAGERANK OVER THE DUPLICATION GRAPH — graph centrality as
    * the companion to q63/q114's connected components: rank documents
    * by how central they sit in the shared-8-gram graph (q114's
    * gram-star edges, both directions), surfacing the HUB documents
    * whose content radiates through the corpus — the ones whose
    * removal or canonicalization pays most. Fixed [[PrIters]]-round
    * PageRank in exact fixed-point micro-units: r0 = 1e6, r_{t+1} =
    * 150000 + (85 · Σ_in (r_t div outdeg)) div 100 — every operation
    * BIGINT, so the DuckDB oracle replays all rounds as unrolled CTEs
    * (the q109 discipline) with zero tolerance. Simplified-PR
    * semantics (no dangling redistribution): every graph node has
    * outdeg >= 1 by construction, so no mass needs reflowing.
    *
    * Scale shape: standard distributed PR — per round, one
    * edges-by-src hash join against the node-bounded rank state and
    * one dst-keyed aggregation; edges are postings-bounded (the q114
    * star trick, never a clique). K is fixed, so the plan is K
    * repetitions of a 2-exchange motif over bounded frames — the
    * shuffle ceiling is pinned accordingly. The edge list is
    * materialized ONCE per (process, corpus) behind a _SUCCESS guard
    * (the q104-q106/q109 convention — and what GraphX's edge caching
    * does for the same reason): a lazy edges subtree would be replayed
    * by every round's join, multiplying the row-scale gram scan by
    * K+1 (measured 5.2s -> materialized ~1s at sf0.1). */
  def dupPagerank(spark: SparkSession, dir: String): DataFrame = {
    val edgePath = graft.Scratch.artifactPath("dupedges", dir, s"_g$StarGramK")
    if (!graft.Scratch.artifactComplete(edgePath)) {
      graft.Scratch.prepareArtifact(edgePath)
      dupStarPairs(spark, dir).write.mode("overwrite").parquet(edgePath)
    }
    val pairs = spark.read.schema("doc_a BIGINT, doc_b BIGINT").parquet(edgePath)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var state = deg.select(col("src").as("node"), col("outdeg"))
      .withColumn("r", lit(1000000L))
    for (_ <- 1 to PrIters) {
      val sums = edges
        .join(state.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("r div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      state = state.drop("r").join(sums, Seq("node"), "left")
        .withColumn("r", lit(150000L) + expr("85 * coalesce(s, 0L) div 100"))
        .drop("s")
    }
    state
      .select(col("node").as("doc_id"), col("outdeg").as("degree"),
        col("r").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("doc_id")).limit(20)
  }

  val dupPagerankSql: String = {
    val base =
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents WHERE text IS NOT NULL),
        |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-7)) AS g
        |        FROM toks WHERE len(t) >= 8),
        |grams AS (SELECT DISTINCT doc_id, md5(array_to_string(t[g:g+7], ' ')) AS gh FROM pos),
        |roots AS (SELECT gh, MIN(doc_id) AS root FROM grams
        |          GROUP BY gh HAVING COUNT(*) >= 2),
        |pairs AS (SELECT DISTINCT r.root AS doc_a, g.doc_id AS doc_b
        |          FROM grams g JOIN roots r USING (gh) WHERE g.doc_id != r.root),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        |r0 AS (SELECT src AS node, outdeg, CAST(1000000 AS BIGINT) AS r FROM deg)""".stripMargin
    val rounds = (1 to PrIters).map { i =>
      s"""r$i AS (SELECT p.node, p.outdeg,
         |  CAST(150000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
         |  FROM r${i - 1} p LEFT JOIN (
         |    SELECT e.dst AS node, SUM(q.r // q.outdeg) AS s
         |    FROM edges e JOIN r${i - 1} q ON e.src = q.node GROUP BY 1) s
         |  USING (node))""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$rounds
       |SELECT node AS doc_id, CAST(outdeg AS BIGINT) AS degree,
       |  r AS rank_micro
       |FROM r$PrIters
       |ORDER BY rank_micro DESC, doc_id LIMIT 20""".stripMargin
  }

  /** Minimum document co-occurrence support for q130. */
  val CoocMinSupport = 3

  /** Q130: TOKEN CO-OCCURRENCE LIFT — association mining (the
    * market-basket lift statistic) at the document level: for every
    * pair of top-[[AnomalyVocab]] vocabulary tokens, how much more
    * (or less) often they share a document than independence predicts:
    * lift = c_xy·N / (c_x·c_y) with c_x = documents containing x.
    * The collocation report q66's TF-IDF (term-vs-document) cannot
    * express — this is term-vs-term association. Pairs below
    * [[CoocMinSupport]] co-occurrences are dropped (rare-pair lift is
    * noise); top-20 by lift, ties broken by (x, y).
    *
    * Exactness: c_xy·N and c_x·c_y are BIGINT; the single dec6
    * division happens after the support filter, so membership in the
    * result is integer-decided.
    *
    * Scale shape: each doc's distinct vocabulary tokens collapse to a
    * sorted array (<= |vocab| entries) by intersecting against the
    * 64-token vocabulary collected as bounded driver control flow (the
    * q106-codebook convention) and riding back in as a plan literal —
    * so the ONLY row-scale shuffle is the document-frequency
    * aggregation; pairs then expand combinatorially from the bounded
    * array (the q115 pair-explosion trick, <= C(64, 2) rows per doc
    * and only 2016 possible groups), and the pair aggregation
    * map-side-combines to a constant-size frame no matter the corpus.
    * Document frequencies (64 rows) and the N scalar ride in as
    * broadcasts (allowlisted 1-row BNLJ). */
  def tokenCooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), distinctTokens(col("text")).as("ts"))
    val dt = d.select(col("doc_id"), explode(col("ts")).as("tok"))
    val df = dt.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(AnomalyVocab)
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val vocabLit = typedlit(df.select(col("tok")).collect()
      .map(_.getString(0))) // 64 rows: bounded driver control flow
    // round-12: compiled pair expansion (ArrayOrderedPairs) replaces the
    // interpreted nested transform — same pairs, q226's kernel
    d.select(array_sort(array_intersect(col("ts"), vocabLit)).as("vt"))
      .select(explode(graft.functions.TextFunctions.orderedPairs(col("vt"))).as("p"))
      .groupBy(col("p.a").as("x"), col("p.b").as("y"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= CoocMinSupport)
      .join(broadcast(df.select(col("tok").as("x"), col("c").as("c_x"))), Seq("x"))
      .join(broadcast(df.select(col("tok").as("y"), col("c").as("c_y"))), Seq("y"))
      .crossJoin(broadcast(nDocs))
      .withColumn("lift", dec6((col("c_xy") * col("n_docs"))
        .cast("decimal(18,0)") / (col("c_x") * col("c_y"))))
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        col("lift"))
      .orderBy(col("lift").desc, col("x"), col("y")).limit(20)
  }

  val tokenCooccurrenceSql: String =
    s"""WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
       |           FROM documents WHERE text IS NOT NULL),
       |dt AS (SELECT doc_id, unnest(ts) AS tok FROM d),
       |df AS (SELECT tok, COUNT(*) AS c FROM dt GROUP BY tok
       |       ORDER BY c DESC, tok LIMIT $AnomalyVocab),
       |dv AS (SELECT dt.doc_id, dt.tok FROM dt JOIN df USING (tok)),
       |p AS (SELECT a.tok AS x, b.tok AS y, COUNT(*) AS c_xy
       |      FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.tok < b.tok
       |      GROUP BY 1, 2),
       |n AS (SELECT COUNT(*) AS n_docs FROM d)
       |SELECT x, y, c_xy, c_x, c_y, lift FROM (
       |  SELECT p.x, p.y, CAST(p.c_xy AS BIGINT) AS c_xy,
       |    CAST(fa.c AS BIGINT) AS c_x, CAST(fb.c AS BIGINT) AS c_y,
       |    CAST((2 * p.c_xy * n.n_docs * 1000000 + fa.c * fb.c)
       |      // (2 * fa.c * fb.c) AS DOUBLE) / 1000000 AS lift
       |  FROM p JOIN df fa ON p.x = fa.tok JOIN df fb ON p.y = fb.tok, n
       |  WHERE p.c_xy >= $CoocMinSupport)
       |ORDER BY lift DESC, x, y LIMIT 20""".stripMargin

  /** Q131: PROPORTIONAL STRATIFIED ALLOCATION — draw EXACTLY B = 40%
    * of the corpus, allocated across sources proportionally to their
    * sizes via the largest-remainder (Hamilton) method: base quota
    * B·n_s div N per source, then the B − Σbase leftover seats go to
    * the largest remainders (ties by source name). Σ quota == B is an
    * arithmetic identity, not an approximation — the contract q62
    * (fixed RATE per stratum) and q93 (rate capping) cannot offer:
    * those land "about p%"; this lands an exact row budget. Membership
    * within a source is the deterministic [[shuffleKey]] permutation
    * order (injective, so no ties and no rand()).
    *
    * Scale shape: allocation runs entirely on the |sources|-bounded
    * count frame (two windows over that tiny frame compute N, the
    * seat deficit, and the remainder ranks); selection is ONE
    * per-source window over the corpus (the q74/q118 per-source
    * parallelism contract) against broadcast quotas. Integer-only —
    * both engines seat identical documents. */
  def proportionalSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), tokenCount(col("text")).as("n_tokens"))
    val wAll = Window.partitionBy() // |sources| rows: bounded
    val wRem = Window.orderBy(col("rem").desc, col("source"))
    val quotas = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("n_total", sum(col("n_docs")).over(wAll))
      .withColumn("budget", expr("2 * n_total div 5"))
      .withColumn("base", expr("budget * n_docs div n_total"))
      .withColumn("rem", expr("(budget * n_docs) % n_total"))
      .withColumn("deficit", col("budget") - sum(col("base")).over(wAll))
      .withColumn("seat_rank", row_number().over(wRem))
      .withColumn("quota",
        col("base") + when(col("seat_rank") <= col("deficit"), 1L).otherwise(0L))
      .select(col("source"), col("n_docs"), col("quota"))
    val wSel = Window.partitionBy(col("source"))
      .orderBy(shuffleKey(col("doc_id")), col("doc_id"))
    val sel = d.withColumn("rk", row_number().over(wSel))
      .join(broadcast(quotas.select(col("source"), col("quota"))), Seq("source"))
      .filter(col("rk") <= col("quota"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("picked"),
        sum(col("n_tokens")).cast("bigint").as("sel_tokens"))
    quotas.join(sel, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("quota"),
        coalesce(col("picked"), lit(0L)).as("picked"),
        coalesce(col("sel_tokens"), lit(0L)).as("sel_tokens"))
      .orderBy(col("source"))
  }

  val proportionalSampleSql: String =
    s"""WITH d AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
       |           FROM documents WHERE text IS NOT NULL),
       |c AS (SELECT source, COUNT(*) AS n_docs FROM d GROUP BY 1),
       |a AS (SELECT source, n_docs,
       |        SUM(n_docs) OVER () AS n_total,
       |        (2 * SUM(n_docs) OVER ()) // 5 AS budget
       |      FROM c),
       |b AS (SELECT *, budget * n_docs // n_total AS base,
       |        (budget * n_docs) % n_total AS rem FROM a),
       |q AS (SELECT source, n_docs,
       |        base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
       |                      <= budget - SUM(base) OVER () THEN 1 ELSE 0 END AS quota
       |      FROM b),
       |r AS (SELECT d.*, ROW_NUMBER() OVER (PARTITION BY source
       |        ORDER BY ${shuffleKeySql("doc_id")}, doc_id) AS rk FROM d),
       |s AS (SELECT r.source, COUNT(*) AS picked, SUM(r.n_tokens) AS sel_tokens
       |      FROM r JOIN q ON r.source = q.source WHERE r.rk <= q.quota
       |      GROUP BY 1)
       |SELECT q.source, CAST(q.n_docs AS BIGINT) AS n_docs,
       |  CAST(q.quota AS BIGINT) AS quota,
       |  CAST(COALESCE(s.picked, 0) AS BIGINT) AS picked,
       |  CAST(COALESCE(s.sel_tokens, 0) AS BIGINT) AS sel_tokens
       |FROM q LEFT JOIN s ON q.source = s.source
       |ORDER BY q.source""".stripMargin

  /** Frequent-gram posting cap for [[dupTriangles]]: grams shared by
    * more than this many documents are boilerplate (the LSH
    * hot-bucket guard) and are excluded from clique expansion. */
  val TriangleMaxPostings = 64

  /** Q140: DUP-GRAPH TRANSITIVITY (triangle census) — the structural
    * QA metric for the whole dedup family: q63/q114 TREAT gram-sharing
    * as an equivalence (connected components move as units), and the
    * triangle/wedge ratio MEASURES how true that is. Transitivity
    * near 1 = components are clique-like (safe to collapse); near 0 =
    * chains of weak links (component-level dedup over-merges). Over
    * the full co-membership graph (docs sharing any duplicated 8-gram,
    * per-gram postings capped at [[TriangleMaxPostings]] — the
    * boilerplate/hot-bucket guard, mirrored in the oracle), one
    * summary row: nodes, edges, triangles, wedges, transitivity =
    * 3·triangles/wedges.
    *
    * Scale shape — the standard distributed triangle count:
    * candidate edges come from per-gram buckets whose size the
    * postings cap bounds (pair expansion <= C(64,2) per gram, never an
    * unbounded clique); edges dedup on (a,b) before any join; the
    * triangle join is the two-hop wedge join (e1.b = e2.a keeps
    * a < b < c, each wedge built exactly once) closed against the
    * edge set on (a, c). Production refinements (degree-ordered
    * orientation for skew) are noted in SCALE.md; every aggregate here
    * is integer, the one dec6 division is the final ratio. */
  def dupTriangles(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), explode(wordShingles(col("text"), 8)).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gh"))
      .distinct()
    val shared = grams.groupBy(col("gh")).agg(count(lit(1)).as("c"))
      .filter(col("c").between(2, TriangleMaxPostings))
      .select(col("gh"))
    val members = grams.join(shared, Seq("gh"))
    val edges = members.select(col("gh"), col("doc_id").as("a"))
      .join(members.select(col("gh"), col("doc_id").as("b")), Seq("gh"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val deg = edges.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val wedgeStats = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(expr("d * (d - 1) div 2")).cast("bigint").as("n_wedges"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    val tri = edges.select(col("a").as("x"), col("b").as("y"))
      .join(edges.select(col("a").as("y"), col("b").as("z")), Seq("y"))
      .join(edges.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
      .agg(count(lit(1)).as("n_triangles"))
    wedgeStats.crossJoin(broadcast(nEdges)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("n_wedges"),
        when(col("n_wedges") > 0, dec6(
          (col("n_triangles") * 3).cast("decimal(19,0)") / col("n_wedges")))
          .as("transitivity"))
  }

  val dupTrianglesSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents WHERE text IS NOT NULL),
      |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-7)) AS g
      |        FROM toks WHERE len(t) >= 8),
      |grams AS (SELECT DISTINCT doc_id, md5(array_to_string(t[g:g+7], ' ')) AS gh
      |          FROM pos),
      |shared AS (SELECT gh FROM grams GROUP BY gh
      |           HAVING COUNT(*) BETWEEN 2 AND $TriangleMaxPostings),
      |m AS (SELECT g.doc_id, g.gh FROM grams g JOIN shared USING (gh)),
      |e AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |      FROM m x JOIN m y USING (gh) WHERE x.doc_id < y.doc_id),
      |deg AS (SELECT node, COUNT(*) AS d FROM (
      |          SELECT a AS node FROM e UNION ALL SELECT b FROM e)
      |        GROUP BY 1),
      |w AS (SELECT COUNT(*) AS n_nodes, SUM(d * (d-1) // 2) AS n_wedges
      |      FROM deg),
      |t AS (SELECT COUNT(*) AS n_triangles
      |      FROM e e1 JOIN e e2 ON e1.b = e2.a
      |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
      |SELECT CAST(w.n_nodes AS BIGINT) AS n_nodes,
      |  CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
      |  CAST(t.n_triangles AS BIGINT) AS n_triangles,
      |  CAST(w.n_wedges AS BIGINT) AS n_wedges,
      |  CASE WHEN w.n_wedges > 0 THEN
      |    CAST((2 * t.n_triangles * 3 * 1000000 + w.n_wedges)
      |      // (2 * w.n_wedges) AS DOUBLE) / 1000000 END AS transitivity
      |FROM w, t""".stripMargin

  /** Target sample size for [[ppsSample]]. */
  val PpsSampleTarget = 200

  /** Q142: SYSTEMATIC PPS SAMPLING (Madow) — probability-proportional-
    * to-size selection WITHOUT randomness: items are laid on a line in
    * deterministic [[shuffleKey]] order, each occupying its weight in
    * cents; selection points at step, 2·step, … (step = W div n) pick
    * whichever item covers them. Inclusion probability is exactly
    * proportional to weight, heavy items (> step) are picked multiple
    * times (`hits` is the replication count importance sampling
    * needs), and — unlike q62/q131's equal-probability buckets — the
    * sample targets SIZE-biased estimation (totals, revenue) rather
    * than uniform coverage. Fully reproducible: both engines derive
    * the identical sample row-for-row.
    *
    * Scale shape: the global cumulative weight is the q94 distributed
    * prefix sum (sampled [[TwoPass]] buckets over the shuffle key,
    * per-bucket subtotals as bounded driver control flow, broadcast
    * offsets + within-bucket running sum) — never a global sort or a
    * single-partition window. The hit test `cum div step` is
    * map-side arithmetic; output is n + slack rows. */
  def ppsSample(spark: SparkSession, dir: String): DataFrame =
    ppsSampleAt(spark, dir, PpsSampleTarget)

  /** Shared Madow systematic-selection machinery (q142/q189): lay
    * `rows` — columns `idCol`, `w` (long weight), `sk` (shuffle key) —
    * on the deterministic (sk, id) line via the q94 distributed prefix
    * sum and pick every `step`-th point. Returns the hit rows with a
    * `hits` replication count. Multiple passes over `rows` (boundary
    * sample, per-bucket subtotals, final) — pass a cheap or
    * materialized frame. */
  private[graft] def madowHits(spark: SparkSession, rows: => DataFrame,
      idCol: String, target: Int): DataFrame = {
    val nBuckets = spark.conf.get("spark.sql.shuffle.partitions").toInt.max(2)
    val bucketOf = TwoPass.scoreBuckets(rows, col("sk"), nBuckets)
    val sub = rows.withColumn("b", bucketOf(col("sk")))
      .groupBy(col("b")).agg(sum(col("w")).as("t"))
      .collect().sortBy(_.getAs[Int]("b"))
    val cum = sub.scanLeft(0L)(_ + _.getAs[Long]("t"))
    val step = math.max(1L, cum.last / target)
    val offsets = spark.createDataFrame(
      sub.zip(cum).map { case (r, off) => (r.getAs[Int]("b"), off) }.toSeq)
      .toDF("b", "off")
    val runW = Window.partitionBy(col("b")).orderBy(col("sk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    rows.withColumn("b", bucketOf(col("sk")))
      .join(broadcast(offsets), Seq("b"))
      .withColumn("cum", col("off") + sum(col("w")).over(runW))
      .withColumn("hits",
        expr(s"cum div ${step}L - (cum - w) div ${step}L").cast("bigint"))
      .filter(col("hits") > 0)
  }

  private[graft] def ppsSampleAt(spark: SparkSession, dir: String,
      n: Int): DataFrame = {
    def rows = Tables.orders(spark, dir).select(col("o_orderkey"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("decimal(18,0)")
        .cast("long").as("w"),
      shuffleKey(col("o_orderkey")).as("sk"))
    madowHits(spark, rows, "o_orderkey", n)
      .select(col("o_orderkey"), col("w").as("weight_cents"), col("hits"))
      .orderBy(col("o_orderkey"))
  }

  val ppsSampleSql: String =
    s"""WITH d AS (
       |  SELECT o_orderkey,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w,
       |    ${shuffleKeySql("o_orderkey")} AS sk
       |  FROM orders),
       |c AS (SELECT *, SUM(w) OVER (ORDER BY sk, o_orderkey) AS cum,
       |             SUM(w) OVER () AS tot FROM d),
       |p AS (SELECT *, GREATEST(1, tot // $PpsSampleTarget) AS step FROM c)
       |SELECT o_orderkey, w AS weight_cents,
       |  CAST(cum // step - (cum - w) // step AS BIGINT) AS hits
       |FROM p WHERE cum // step > (cum - w) // step
       |ORDER BY o_orderkey""".stripMargin

  /** Target sample size for [[dsirResample]]. */
  val DsirSampleTarget = 100

  /** Q189: DSIR IMPORTANCE RESAMPLING — the COMPOSED pipeline the DSIR
    * paper actually runs, assembled from this suite's own stages:
    * q151's hashed-bucket importance weights (how target-like is each
    * document) feed q142's Madow systematic PPS selection (pick
    * documents with probability proportional to importance, zero
    * randomness) — the data-selection step that reshapes a raw corpus
    * toward a target distribution before training. Heavy importance
    * docs replicate (`hits` > 1), exactly the with-replacement
    * semantics importance resampling wants.
    *
    * Everything is integer end-to-end: the per-bucket weight and the
    * per-doc importance both use the (2N+D)//(2D) micro-unit half-up
    * formula ON BOTH ENGINES (no decimal divide at all — one step
    * simpler than q151's decimal-internal form), and selection is the
    * q142 line arithmetic. Magnitude headroom: 2·(tc+1)·rn·10⁶ caps
    * near 10¹⁴ at sf0.1 and holds to ~10¹² corpus tokens; beyond that
    * the BOUNDED 256-row weight frame widens to DECIMAL (ANSI throws,
    * never corrupts).
    *
    * Scale shape: q151's two row-scale aggregations build the per-doc
    * weight frame, localCheckpoint-materialized (|docs| × 4 narrow
    * columns) because the Madow machinery makes three passes over it
    * (the q183 lesson); selection itself is the q94 distributed
    * prefix sum — never a global sort. */
  def dsirResample(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"),
        substring(md5(col("tok")), 1, 2).as("b"))
    val all = Window.partitionBy()
    val w6 = toks.groupBy(col("b"))
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc"),
        count(lit(1)).as("rc"))
      .withColumn("tn", sum(col("tc")).over(all))
      .withColumn("rn", sum(col("rc")).over(all))
      .withColumn("w6", expr(
        "(2 * (tc + 1) * rn * 1000000 + (rc + 1) * tn) div (2 * (rc + 1) * tn)"))
      .select(col("b"), col("w6"))
    val perDoc = toks.groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(w6), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("cnt")).as("n"), sum(col("cnt") * col("w6")).as("n6"))
      .select(col("doc_id"), col("lang"),
        greatest(expr("(2 * n6 + n) div (2 * n)"), lit(1L)).as("w"),
        shuffleKey(col("doc_id")).as("sk"))
      .localCheckpoint()
    madowHits(spark, perDoc, "doc_id", DsirSampleTarget)
      .select(col("doc_id"), col("lang"),
        col("w").cast("bigint").as("weight6"), col("hits"))
      .orderBy(col("doc_id"))
  }

  val dsirResampleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, substr(md5(unnest(string_split(text, ' '))), 1, 2) AS b
       |  FROM documents WHERE text IS NOT NULL),
       |bk AS (SELECT b, SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc,
       |         COUNT(*) AS rc
       |       FROM toks GROUP BY 1),
       |tot AS (SELECT SUM(tc) AS tn, SUM(rc) AS rn FROM bk),
       |w AS (SELECT b,
       |        (2 * (tc + 1) * rn * 1000000 + (rc + 1) * tn)
       |          // (2 * (rc + 1) * tn) AS w6
       |      FROM bk, tot),
       |pd AS (SELECT doc_id, lang, b, COUNT(*) AS cnt FROM toks GROUP BY 1, 2, 3),
       |sc AS (SELECT pd.doc_id, pd.lang, SUM(cnt) AS n, SUM(cnt * w.w6) AS n6
       |       FROM pd JOIN w ON pd.b = w.b
       |       GROUP BY 1, 2),
       |imp AS (SELECT doc_id, lang,
       |          GREATEST((2 * n6 + n) // (2 * n), 1) AS w,
       |          ${shuffleKeySql("doc_id")} AS sk
       |        FROM sc),
       |c AS (SELECT *, SUM(w) OVER (ORDER BY sk, doc_id) AS cum,
       |             SUM(w) OVER () AS tot FROM imp),
       |p AS (SELECT *, GREATEST(1, tot // $DsirSampleTarget) AS step FROM c)
       |SELECT doc_id, lang, CAST(w AS BIGINT) AS weight6,
       |  CAST(cum // step - (cum - w) // step AS BIGINT) AS hits
       |FROM p WHERE cum // step > (cum - w) // step
       |ORDER BY doc_id""".stripMargin

  /** Chunk geometry for [[ragChunking]]: window of [[ChunkTokens]]
    * tokens advancing by [[ChunkStride]] (8-token overlap between
    * neighbours — the retrieval-context overlap RAG chunkers keep so
    * no answer span straddles a boundary unseen). */
  val ChunkTokens = 32
  val ChunkStride = 24

  /** Q149: RAG CHUNKING — split every document into fixed-size
    * overlapping token windows (the indexing unit of a retrieval
    * corpus) and account for chunk-level duplication per source:
    * chunks, distinct chunks by content hash, the dup-chunk rate a
    * vector store would pay to index blindly, and mean chunk length.
    *
    * Start offsets are pinned arithmetic — k·stride for
    * k = 0 .. ceil(max(n−W,0)/stride) — so both engines derive the
    * identical chunk set; a short document yields exactly one chunk.
    *
    * Scale shape: the explode multiplies rows by ~n/stride but every
    * chunk immediately collapses to (source, md5, n_tokens) — 44-byte
    * rows, never chunk text — into a map-side-combined (source, hash)
    * aggregation, then a bounded per-source rollup. Distinct-chunk
    * counting is the count of that pre-aggregated frame, NOT a
    * COUNT(DISTINCT) over the exploded rows (no Expand rewrite, one
    * corpus-scale shuffle of fixed-width keys total). */
  def ragChunking(spark: SparkSession, dir: String): DataFrame = {
    val w = lit(ChunkTokens); val s = lit(ChunkStride)
    val docs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("bigint"))
    val lastStart = expr(
      s"((greatest(n - $ChunkTokens, 0L) + ${ChunkStride - 1}) div $ChunkStride) * $ChunkStride")
    val chunks = docs
      .select(col("doc_id"), col("source"), col("toks"), col("n"),
        explode(sequence(lit(0L), lastStart, lit(ChunkStride.toLong))).as("st"))
      .select(col("doc_id"), col("source"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("st") + 1).cast("int"), lit(ChunkTokens))))
          .as("ch"),
        least(w.cast("bigint"), col("n") - col("st")).as("ct"))
    val perHash = chunks.groupBy(col("source"), col("ch"))
      .agg(count(lit(1)).as("cnt"), sum(col("ct")).as("toks"))
    val nDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    perHash.groupBy(col("source"))
      .agg(sum(col("cnt")).cast("bigint").as("n_chunks"),
        count(lit(1)).as("distinct_chunks"),
        sum(col("toks")).as("tok_sum"))
      .join(nDocs, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_chunks"),
        col("distinct_chunks"),
        dec6(lit(1).cast("decimal(19,0)")
          - col("distinct_chunks").cast("decimal(19,0)")
            / col("n_chunks").cast("decimal(19,0)")).as("dup_chunk_rate"),
        dec6(col("tok_sum").cast("decimal(19,0)")
          / col("n_chunks").cast("decimal(19,0)")).as("avg_chunk_tokens"))
      .orderBy(col("source"))
  }

  val ragChunkingSql: String =
    """WITH t AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents WHERE text IS NOT NULL),
      |st AS (SELECT doc_id, source, toks, n,
      |         unnest(range(0, ((CASE WHEN n > 32 THEN n - 32 ELSE 0 END) + 23) // 24 * 24 + 1, 24)) AS st
      |       FROM t),
      |c AS (SELECT doc_id, source,
      |        md5(array_to_string(toks[st+1 : st+32], ' ')) AS ch,
      |        LEAST(32, n - st) AS ct
      |      FROM st),
      |ph AS (SELECT source, ch, COUNT(*) AS cnt, SUM(ct) AS toks
      |       FROM c GROUP BY 1, 2),
      |agg AS (SELECT source, SUM(cnt) AS n_chunks, COUNT(*) AS distinct_chunks,
      |          SUM(toks) AS tok_sum
      |        FROM ph GROUP BY 1),
      |nd AS (SELECT source, COUNT(*) AS n_docs FROM t GROUP BY 1)
      |SELECT agg.source, nd.n_docs, CAST(n_chunks AS BIGINT) AS n_chunks,
      |  CAST(distinct_chunks AS BIGINT) AS distinct_chunks,
      |  CAST((2 * (n_chunks - distinct_chunks) * 1000000 + n_chunks)
      |    // (2 * n_chunks) AS DOUBLE) / 1000000 AS dup_chunk_rate,
      |  CAST((2 * tok_sum * 1000000 + n_chunks) // (2 * n_chunks) AS DOUBLE)
      |    / 1000000 AS avg_chunk_tokens
      |FROM agg JOIN nd ON agg.source = nd.source
      |ORDER BY agg.source""".stripMargin

  /** Q151: DSIR-LITE IMPORTANCE WEIGHTING — rank raw documents by how
    * much they look like a target slice (here lang='en', standing in
    * for a curated high-quality set), the hashed-n-gram importance
    * scheme of Data Selection via Importance Resampling (Xie et al.
    * 2023), linearized: token features hash into 256 md5 buckets, a
    * bucket's weight is the smoothed frequency ratio
    * (tc+1)·rawN / ((rc+1)·tgtN), and a document scores the
    * count-weighted mean of its buckets' weights.
    *
    * Exactness: NO logarithm anywhere — weights are dec6-rounded
    * exact rationals of integer counts (the shared-literal discipline
    * without literals: both engines derive the same 256 decimals from
    * the same integers), the per-doc sum is exact decimal
    * arithmetic, and the final per-token mean is one dec6 division.
    *
    * Scale shape: the global 256-row bucket-count frame (map-side
    * combined, conditional sums for target vs raw in ONE pass), then
    * token rows join the broadcast 256-row weight table MAP-SIDE and
    * aggregate straight to per-doc scores — no per-(doc, bucket)
    * pre-aggregation (buckets ≈ tokens per doc, so it reduced nothing
    * and cost a full row-scale shuffle; audited 5 → 4 exchanges). The
    * corpus text never shuffles; (doc_id, lang) keys do. */
  def importanceWeights(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"),
        substring(md5(col("tok")), 1, 2).as("b"))
    val buckets = toks.groupBy(col("b"))
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc"),
        count(lit(1)).as("rc"))
    val w = buckets.select(col("b"),
      ((col("tc") + 1).cast("decimal(19,0)")
        * sum(col("rc")).over(Window.partitionBy()).cast("decimal(19,0)"))
        .divide((col("rc") + 1).cast("decimal(19,0)")
          * sum(col("tc")).over(Window.partitionBy()).cast("decimal(19,0)"))
        .cast("decimal(38,6)").as("w"))
    toks.join(broadcast(w), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).cast("bigint").as("n_tokens"),
        sum(col("w")).as("score"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("lang") === "en").as("is_target"),
        dec6(col("score") / col("n_tokens").cast("decimal(19,0)"))
          .as("importance"))
      .orderBy(col("doc_id"))
  }

  // Oracle discipline note: the importance is a LAYERED rounding — the
  // per-bucket weight is already a 6-decimal exact value, so the final
  // score/n quotient lands exactly on .0000005 boundaries whenever
  // 2·Σcnt·w6 ≡ n (mod 2n) — a ~1/n-per-doc event, not a freak case
  // (row 451 flipped at sf0.01). Both roundings are therefore done in
  // pure integer arithmetic: half-up(N/D) = (2N + D) // (2D) in
  // micro-units, matching Spark's exact decimal HALF_UP bit-for-bit.
  val importanceWeightsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, substr(md5(unnest(string_split(text, ' '))), 1, 2) AS b
      |  FROM documents WHERE text IS NOT NULL),
      |bk AS (SELECT b, SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc,
      |         COUNT(*) AS rc
      |       FROM toks GROUP BY 1),
      |tot AS (SELECT SUM(tc) AS tn, SUM(rc) AS rn FROM bk),
      |w AS (SELECT b,
      |        (2 * (tc + 1) * rn * 1000000 + (rc + 1) * tn)
      |          // (2 * (rc + 1) * tn) AS w6
      |      FROM bk, tot),
      |pd AS (SELECT doc_id, lang, b, COUNT(*) AS cnt FROM toks GROUP BY 1, 2, 3),
      |sc AS (SELECT pd.doc_id, pd.lang, SUM(cnt) AS n, SUM(cnt * w.w6) AS n6
      |       FROM pd JOIN w ON pd.b = w.b
      |       GROUP BY 1, 2)
      |SELECT doc_id, lang, CAST(n AS BIGINT) AS n_tokens,
      |  lang = 'en' AS is_target,
      |  CAST((2 * n6 + n) // (2 * n) AS DOUBLE) / 1000000 AS importance
      |FROM sc ORDER BY doc_id""".stripMargin

  /** Q160: WATER-FILLING MIXTURE ALLOCATION — the budgeted equal-share
    * mixture solver between q93 (fixed target proportions) and q131
    * (proportional quotas): given a token budget B (half the corpus),
    * give every source an EQUAL share, except sources with less
    * availability than their share contribute everything they have and
    * their unused share redistributes — the classic water-filling
    * solution to max-min fair allocation.
    *
    * Closed form, NOT an iterative loop: sort sources ascending by
    * (availability, source); a source is capped iff
    * avail·m ≤ B − cum_prev (m = sources from it onward, all exact
    * integers, cross-multiplied — and once false it stays false, so
    * cappedness is a prefix of the sorted order). Uncapped sources
    * split the residual R equally: base = R div m_K with the first
    * R mod m_K of them taking +1 (largest-remainder, q131's
    * convention). Σ allocated = B exactly — asserted in CurationSpec.
    *
    * Scale shape: ONE row-scale token-count aggregation into the
    * ≤|sources| frame; every window after moves only that bounded
    * frame (single-task by design, the q146 argument). */
  def waterfillMixture(spark: SparkSession, dir: String): DataFrame = {
    val avail = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .groupBy(col("source"))
      .agg(sum(tokenCount(col("text"))).cast("long").as("avail"))
    val ord = Window.orderBy(col("avail"), col("source"))
    val all = Window.partitionBy()
    val cumW = ord.rowsBetween(Window.unboundedPreceding, -1)
    val f = avail
      .withColumn("i", row_number().over(ord))
      .withColumn("s_cnt", count(lit(1)).over(all))
      .withColumn("total", sum(col("avail")).over(all))
      .withColumn("b", expr("total div 2"))
      .withColumn("cum_prev",
        coalesce(sum(col("avail")).over(cumW), lit(0L)))
      .withColumn("m", col("s_cnt") - col("i") + 1)
      .withColumn("capped",
        col("avail") * col("m") <= col("b") - col("cum_prev"))
    val g = f
      .withColumn("cum_k",
        coalesce(sum(when(col("capped"), col("avail"))).over(all), lit(0L)))
      .withColumn("m_k",
        sum(when(!col("capped"), 1L).otherwise(0L)).over(all))
      .withColumn("r", col("b") - col("cum_k"))
      .withColumn("urank",
        sum(when(!col("capped"), 1L).otherwise(0L))
          .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("allocated",
        when(col("capped"), col("avail"))
          .otherwise(expr("r div m_k")
            + when(col("urank") <= expr("r % m_k"), 1L).otherwise(0L)))
    g.select(col("source"), col("avail"),
        col("allocated").cast("bigint").as("allocated"),
        col("capped"),
        dec6(col("allocated").cast("decimal(19,0)")
          / col("avail").cast("decimal(19,0)")).as("fill_ratio"))
      .orderBy(col("source"))
  }

  val waterfillMixtureSql: String =
    """WITH avail AS (
      |  SELECT source, SUM(len(string_split(text, ' '))) AS avail
      |  FROM documents WHERE text IS NOT NULL GROUP BY 1),
      |f AS (SELECT source, avail,
      |        ROW_NUMBER() OVER (ORDER BY avail, source) AS i,
      |        COUNT(*) OVER () AS s_cnt,
      |        SUM(avail) OVER () // 2 AS b,
      |        COALESCE(SUM(avail) OVER (ORDER BY avail, source
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
      |      FROM avail),
      |c AS (SELECT *, s_cnt - i + 1 AS m,
      |        avail * (s_cnt - i + 1) <= b - cum_prev AS capped
      |      FROM f),
      |g AS (SELECT *,
      |        COALESCE(SUM(CASE WHEN capped THEN avail END) OVER (), 0) AS cum_k,
      |        SUM(CASE WHEN capped THEN 0 ELSE 1 END) OVER () AS m_k,
      |        SUM(CASE WHEN capped THEN 0 ELSE 1 END) OVER (ORDER BY avail, source
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS urank
      |      FROM c),
      |a2 AS (SELECT source, avail, capped,
      |         CASE WHEN capped THEN avail
      |              ELSE (b - cum_k) // m_k
      |                + CASE WHEN urank <= (b - cum_k) % m_k THEN 1 ELSE 0 END
      |         END AS allocated
      |       FROM g)
      |SELECT source, CAST(avail AS BIGINT) AS avail,
      |  CAST(allocated AS BIGINT) AS allocated, capped,
      |  CAST((2 * allocated * 1000000 + avail) // (2 * avail) AS DOUBLE) / 1000000
      |    AS fill_ratio
      |FROM a2 ORDER BY source""".stripMargin

  /** Q179: EVAL-CONTAINMENT MATRIX — the DIRECTIONAL overlap q115's
    * symmetric Jaccard cannot express and q71's per-doc flags do not
    * aggregate: per training source, what fraction of the evaluation
    * slice's distinct 8-grams the source CONTAINS. Containment is the
    * decontamination-relevant direction (a source covering 40% of the
    * benchmark is a leak even if the benchmark is a rounding error of
    * the source), and per-source attribution says WHERE the leak
    * lives.
    *
    * Scale shape: grams travel as md5 (q71's discipline); the eval
    * side collapses to its distinct gram set and broadcasts; the
    * train side dedups (source, gh) BEFORE the join so multiplicity
    * can't inflate containment; counts are map-side conditional sums
    * into the |sources| frame. */
  def containmentMatrix(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val isEval = col("doc_id") % 25 === 0
    val grams = d
      .select(col("doc_id"), col("source"),
        explode(wordShingles(col("text"), 8)).as("gram"))
      .select(col("doc_id"), col("source"), md5(col("gram")).as("gh"))
    val evalGrams = grams.filter(isEval).select(col("gh")).distinct()
    val nEval = evalGrams.count() // 1-value driver scalar
    grams.filter(!isEval)
      .select(col("source"), col("gh")).distinct()
      .join(broadcast(evalGrams.withColumn("hit", lit(1))), Seq("gh"), "left")
      .groupBy(col("source"))
      .agg(sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_eval_grams_hit"))
      .select(col("source"), lit(nEval).as("n_eval_grams"),
        col("n_eval_grams_hit"),
        dec6(col("n_eval_grams_hit").cast("decimal(19,0)")
          / lit(nEval).cast("decimal(19,0)")).as("containment"))
      .orderBy(col("source"))
  }

  val containmentMatrixSql: String =
    """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |pos AS (SELECT doc_id, source, t, unnest(generate_series(1, len(t)-7)) AS g
      |        FROM toks WHERE len(t) >= 8),
      |grams AS (SELECT DISTINCT doc_id, source,
      |            md5(array_to_string(t[g:g+7], ' ')) AS gh
      |          FROM pos),
      |eval_grams AS (SELECT DISTINCT gh FROM grams WHERE doc_id % 25 = 0),
      |ne AS (SELECT COUNT(*) AS n FROM eval_grams),
      |tr AS (SELECT DISTINCT source, gh FROM grams WHERE doc_id % 25 != 0)
      |SELECT tr.source, CAST(ne.n AS BIGINT) AS n_eval_grams,
      |  CAST(COUNT(e.gh) AS BIGINT) AS n_eval_grams_hit,
      |  CAST((2 * COUNT(e.gh) * 1000000 + ne.n) // (2 * ne.n) AS DOUBLE)
      |    / 1000000 AS containment
      |FROM tr
      |LEFT JOIN eval_grams e USING (gh)
      |CROSS JOIN ne
      |GROUP BY tr.source, ne.n
      |ORDER BY tr.source""".stripMargin

  /** Q202: BOILERPLATE PREFIX/SUFFIX DETECTION — the template-header/
    * footer signal web-corpus curation cuts on (CCNet/RefinedWeb strip
    * repeated page chrome before any quality scoring): per source, the
    * most common LEADING 3-token prefix and TRAILING 3-token suffix
    * across documents, with the share of docs carrying it. A source
    * whose docs overwhelmingly open or close with one fixed phrase is
    * templated; the gram itself tells the curator what to strip. This
    * is the cross-DOC template axis — orthogonal to q73 (within-doc
    * repetition) and q30/q185 (whole-doc near-dup): a thin boilerplate
    * header never clears a whole-document Jaccard threshold.
    *
    * Scale shape: one scan emitting two fixed-width (source, kind,
    * gram) rows per doc — never the document — into a map-side-
    * combined count; the top-1 window and share arithmetic run on the
    * bounded (source × distinct-gram) frame; doc totals broadcast. */
  def boilerplateDetection(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("source"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
    val grams = d.select(col("source"), lit("prefix").as("kind"),
        concat_ws(" ", slice(col("t"), 1, 3)).as("gram"))
      .unionByName(d.select(col("source"), lit("suffix").as("kind"),
        concat_ws(" ", slice(col("t"), -3, 3)).as("gram")))
    val counts = grams.groupBy(col("source"), col("kind"), col("gram"))
      .agg(count(lit(1)).as("c"))
    val tot = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("source"), col("kind"))
      .orderBy(col("c").desc, col("gram"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(tot), Seq("source"))
      .select(col("source"), col("kind"), col("gram").as("top_gram"),
        col("c").cast("bigint").as("n_docs_with_gram"),
        col("n_docs").cast("bigint").as("n_docs"),
        dec6(col("c").cast("decimal(19,0)")
          / col("n_docs").cast("decimal(19,0)")).as("share"))
      .orderBy(col("source"), col("kind"))
  }

  val boilerplateDetectionSql: String =
    """WITH d AS (
      |  SELECT source, string_split(text, ' ') AS t
      |  FROM documents WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 3),
      |g AS (
      |  SELECT source, 'prefix' AS kind, array_to_string(t[1:3], ' ') AS gram FROM d
      |  UNION ALL
      |  SELECT source, 'suffix', array_to_string(t[-3:], ' ') FROM d),
      |c AS (SELECT source, kind, gram, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
      |tot AS (SELECT source, COUNT(*) AS n_docs FROM d GROUP BY 1),
      |r AS (SELECT source, kind, gram, c,
      |        ROW_NUMBER() OVER (PARTITION BY source, kind
      |          ORDER BY c DESC, gram) AS rn
      |      FROM c)
      |SELECT r.source, r.kind, r.gram AS top_gram,
      |  CAST(r.c AS BIGINT) AS n_docs_with_gram,
      |  CAST(tot.n_docs AS BIGINT) AS n_docs,
      |  CAST((2 * r.c * 1000000 + tot.n_docs) // (2 * tot.n_docs) AS DOUBLE)
      |    / 1000000 AS share
      |FROM r JOIN tot ON r.source = tot.source
      |WHERE rn = 1 ORDER BY r.source, r.kind""".stripMargin

  def queries: Map[String, Relational.Q] = Map(
    "q202_boilerplate" -> (boilerplateDetection _),
    "q179_containment_matrix" -> (containmentMatrix _),
    "q160_waterfill_mixture" -> (waterfillMixture _),
    "q149_rag_chunking" -> (ragChunking _),
    "q151_importance_weights" -> (importanceWeights _),
    "q119_overlap_minhash" -> (sourceOverlapMinHash _),
    "q140_dup_triangles" -> (dupTriangles _),
    "q142_pps_sample" -> (ppsSample _),
    "q129_dup_pagerank" -> (dupPagerank _),
    "q130_token_cooccurrence" -> (tokenCooccurrence _),
    "q131_proportional_sample" -> (proportionalSample _),
    "q126_version_drift" -> (versionDrift _),
    "q122_snapshot_diff" -> (snapshotDiff _),
    "q120_distribution_anomaly" -> (distributionalAnomaly _),
    "q183_bigram_surprisal" -> (bigramSurprisal _),
    "q187_mirror_matrix" -> (mirrorMatrix _),
    "q188_fuzzy_decontam" -> (fuzzyDecontam _),
    "q189_dsir_resample" -> (dsirResample _),
    "q101_dup_spans" -> (dupSpans _),
    "q111_training_batches" -> (trainingBatches _),
    "q112_gopher_rules" -> (gopherRules _),
    "q114_leakage_split" -> (leakageSplit _),
    "q115_source_overlap" -> (sourceOverlap _),
    "q116_calibrated_quality" -> (calibratedQuality _),
    "q118_length_batching" -> (lengthBucketBatches _),
    "q103_span_scrub" -> (spanScrub _),
    "q71_decontamination" -> (decontamination _),
    "q89_token_rarity" -> (tokenRarity _),
    "q92_regex_redaction" -> (regexRedaction _),
    "q93_mixture_resample" -> (mixtureResample _),
    "q94_budget_selection" -> (budgetedSelection _),
    "q87_curation_pipeline" -> (curationPipeline _),
    "q72_denylist_scrub" -> (denylistScrub _),
    "q73_repetition_signals" -> (repetitionSignals _),
    "q74_sequence_packing" -> (sequencePacking _),
  )

  def oracles: Map[String, String] = Map(
    "q202_boilerplate" -> boilerplateDetectionSql,
    "q179_containment_matrix" -> containmentMatrixSql,
    "q160_waterfill_mixture" -> waterfillMixtureSql,
    "q149_rag_chunking" -> ragChunkingSql,
    "q151_importance_weights" -> importanceWeightsSql,
    "q119_overlap_minhash" -> sourceOverlapMinHashSql,
    "q140_dup_triangles" -> dupTrianglesSql,
    "q142_pps_sample" -> ppsSampleSql,
    "q122_snapshot_diff" -> snapshotDiffSql,
    "q126_version_drift" -> versionDriftSql,
    "q129_dup_pagerank" -> dupPagerankSql,
    "q130_token_cooccurrence" -> tokenCooccurrenceSql,
    "q131_proportional_sample" -> proportionalSampleSql,
    "q120_distribution_anomaly" -> distributionalAnomalySql,
    "q183_bigram_surprisal" -> bigramSurprisalSql,
    "q187_mirror_matrix" -> mirrorMatrixSql,
    "q188_fuzzy_decontam" -> fuzzyDecontamSql,
    "q189_dsir_resample" -> dsirResampleSql,
    "q101_dup_spans" -> dupSpansSql,
    "q111_training_batches" -> trainingBatchesSql,
    "q112_gopher_rules" -> gopherRulesSql,
    "q114_leakage_split" -> leakageSplitSql,
    "q115_source_overlap" -> sourceOverlapSql,
    "q116_calibrated_quality" -> calibratedQualitySql,
    "q118_length_batching" -> lengthBucketBatchesSql,
    "q103_span_scrub" -> spanScrubSql,
    "q71_decontamination" -> decontaminationSql,
    "q87_curation_pipeline" -> curationPipelineSql,
    "q89_token_rarity" -> tokenRaritySql,
    "q92_regex_redaction" -> regexRedactionSql,
    "q93_mixture_resample" -> mixtureResampleSql,
    "q94_budget_selection" -> budgetedSelectionSql,
    "q72_denylist_scrub" -> denylistScrubSql,
    "q73_repetition_signals" -> repetitionSignalsSql,
    "q74_sequence_packing" -> sequencePackingSql,
  )
}
