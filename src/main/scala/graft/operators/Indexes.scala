package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Parity._
import graft.functions.TextFunctions._

/** [EXT] Persisted corpus-index operators for INCREMENTAL workloads:
  * the shapes a 100 TB ingestion pipeline runs per-batch, where
  * rescanning the historical corpus per batch is the thing that cannot
  * happen. Both operators follow the q59 IVF discipline — build the
  * index artifact ONCE behind a `_SUCCESS` guard, probe it with a
  * broadcast join so dynamic partition pruning reads only the touched
  * buckets, and keep exactness independent of the probabilistic layer.
  *
  *  - q104: incremental cross-batch gram-overlap check (the q71
  *    decontamination rule at ingestion time) — a persisted corpus
  *    gram-hash index plus a bloom filter derived from it; the bloom
  *    prunes the batch side BEFORE any join, the exact index join
  *    removes its false positives, so results equal the bloom-free
  *    join by construction.
  *  - q105: inverted phrase index — exact-phrase audit lookup
  *    ("which documents contain this 3-token phrase") as posting
  *    lists partitioned by phrase-hash bucket.
  */
object Indexes {

  /** Overlap unit shared with q71/q101 (8-token grams). */
  private[operators] val GramK = 8
  /** Batch = doc_id % 5 == 0 (the "newly arrived" slice); corpus = rest. */
  private[operators] val BatchMod = 5

  /** Bloom geometry: m = 2^22 bits (512 KiB of longs), k = 3 probes.
    * At sf0.1's ~200k distinct corpus grams that is m/n ≈ 21, false
    * positives ≈ 0.2%. The filter is a PRUNE, never a truth source:
    * sizing only moves the candidate count, not the answer. */
  private[graft] val BloomBits: Long = 1L << 22
  private val BloomWords: Int = (BloomBits / 64L).toInt
  private val BloomHashes = 3

  /** Phrase-hash / gram-hash bucket count for the partitioned index
    * layouts (the unit dynamic partition pruning skips by). */
  private val IndexBuckets = 64

  /** Parameter fingerprints per index kind (the Scratch.artifactPath
    * durable-root cache-key discipline): gram index/bloom depend on
    * gram size + bucket/bloom geometry; phrase index on phrase length
    * + buckets. Interpolated from the constants themselves. */
  private def indexVariant(kind: String): String = kind match {
    // v2 (round-13): gh is md5 RAW BYTES (binary), not hex — a durable
    // artifact root must not serve a v1 string-keyed index to v2 code
    case "gram_index" => s"_g${GramK}b${IndexBuckets}v2"
    case "gram_bloom" => s"_g${GramK}m${BloomBits}k${BloomHashes}v2"
    case "phrase_index" => s"_p${PhraseLen}b$IndexBuckets"
    case _ => ""
  }

  private def artifactPath(dir: String, kind: String): String =
    graft.Scratch.artifactPath(kind, dir, indexVariant(kind))

  private def isComplete(path: String): Boolean =
    graft.Scratch.artifactComplete(path)

  private[operators] def bucketOf(gh: Column): Column =
    pmod(xxhash64(gh), lit(IndexBuckets.toLong)).cast("int")

  /** Distinct (doc_id, gh=unhex(md5(gram))) frame of 8-token grams —
    * the q71 shape: grams travel as hashes, never gram text; per-doc
    * distinct happens before any join so multiplicity can't amplify.
    * Round-13: gh is md5's 16 RAW BYTES (the comment above always said
    * "16-byte hashes"; the column was actually the 32-char hex string)
    * — a bijection of the same digest, so every distinct/join/group
    * count is unchanged while the distinct + index shuffles and the
    * persisted index itself carry half the key bytes (guide §2.3; the
    * q115 treatment). Bloom build/probe hash the binary value through
    * the same BloomKernel definition on both sides. */
  private def gramFrame(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(wordShingles(col("text"), GramK)).as("gram"))
      .select(col("doc_id"), unhex(md5(col("gram"))).as("gh"))
      .distinct()

  /** Build (once per sf dir, `_SUCCESS`-guarded) the corpus gram index:
    * distinct gram hashes of the NON-batch slice, parquet-partitioned
    * by hash bucket, plus the bloom bitset DERIVED from the persisted
    * index (so the two artifacts can never disagree). Returns
    * (indexPath, bloomWords). The bloom load is bounded driver control
    * flow: at most [[BloomWords]] = 65536 (word, bits) rows = 512 KiB,
    * independent of corpus size. */
  private[graft] def buildCorpusGramIndex(spark: SparkSession,
      dir: String): (String, Array[Long]) = {
    val indexPath = artifactPath(dir, "gram_index")
    val bloomPath = artifactPath(dir, "gram_bloom")
    if (!isComplete(indexPath) || !isComplete(bloomPath)) {
      graft.Scratch.prepareArtifact(indexPath, bloomPath)
      val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
      gramFrame(d.filter(col("doc_id") % BatchMod =!= 0))
        .select(col("gh")).distinct()
        .withColumn("bucket", bucketOf(col("gh")))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(indexPath)
      // bloom words from the persisted index: one scan of 16-byte
      // hashes, map-side-combining bit_or per 64-bit word; bit indices
      // come from the same kernel the probe uses (BloomKernel — the
      // build/probe hash definitions cannot drift apart)
      spark.read.parquet(indexPath)
        .select(explode(graft.functions.BloomFunctions
          .bloomIndices(col("gh"), BloomBits, BloomHashes)).as("idx"))
        .select((col("idx") / 64L).cast("int").as("word"),
          call_function("shiftleft", lit(1L), (col("idx") % 64L).cast("int")).as("mask"))
        .groupBy(col("word")).agg(bit_or(col("mask")).as("bits"))
        .write.mode("overwrite").parquet(bloomPath)
    }
    val words = new Array[Long](BloomWords)
    spark.read.parquet(bloomPath).collect() // bounded: <= 65536 rows
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    (indexPath, words)
  }

  /** Bloom membership test as one codegen'd kernel probe
    * ([[graft.functions.BloomProbe]] — the bitset rides as a reference
    * object, never a plan literal; see BloomExpressions for the
    * measured cost of the literal alternative). No false negatives by
    * construction — every indexed gram set its bits — so a gram that
    * fails the test is DEFINITELY new and skips the join entirely. */
  private[graft] def bloomMightContain(gh: Column, words: Array[Long]): Column =
    graft.functions.BloomFunctions.bloomProbe(gh, words, BloomBits, BloomHashes)

  /** Q104: INCREMENTAL DECONTAMINATION — check a newly-arrived batch
    * (doc_id % 5 == 0) against the historical corpus WITHOUT rescanning
    * the corpus: per batch doc, how many of its distinct 8-grams
    * already exist in the corpus (the q71 overlap rule, run at
    * ingestion time against a persisted artifact).
    *
    * 100 TB: the corpus is scanned exactly once ever (index build);
    * each arriving batch then costs O(batch). The bloom eliminates the
    * definitely-new grams (the vast majority in a healthy pipeline)
    * before ANY join, the surviving candidates broadcast into the
    * index with dynamic partition pruning (only candidate buckets are
    * read), and the exact join removes bloom false positives — output
    * is provably identical to the bloom-free join (IndexesSpec pins
    * the identity). If a pathological batch overlaps massively, the
    * candidate set grows toward the true overlap size and the
    * broadcast degrades to a shuffled join — correctness unchanged. */
  def incrementalDecontam(spark: SparkSession, dir: String): DataFrame = {
    val (indexPath, bloomWords) = buildCorpusGramIndex(spark, dir)
    val index = spark.read.parquet(indexPath) // (gh) under bucket= dirs
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val batchGrams = gramFrame(d.filter(col("doc_id") % BatchMod === 0))
    // distinct candidate ghs (doc_id dropped — the per-doc fan-in
    // happens once, in the single accounting aggregate below)
    val candidates = batchGrams
      .filter(bloomMightContain(col("gh"), bloomWords))
      .select(col("gh")).distinct()
      .withColumn("bucket", bucketOf(col("gh")))
    // gh-unique by construction: the index is distinct, candidates are
    // distinct, the equi-join can't amplify — safe as a left-join probe
    val confirmed = index.join(broadcast(candidates), Seq("bucket", "gh"))
      .select(col("gh")).withColumn("hit", lit(1))
    batchGrams.join(broadcast(confirmed), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_shared"))
      .filter(col("n_shared") > 0)
      .withColumn("shared_frac",
        dec6(col("n_shared").cast("decimal(18,0)") / col("n_grams")))
      .select(col("doc_id"), col("n_grams"), col("n_shared"), col("shared_frac"))
      .orderBy(col("doc_id"))
  }

  val incrementalDecontamSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |              WHERE text IS NOT NULL),
       |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${GramK - 1})) AS g
       |        FROM toks WHERE len(t) >= $GramK),
       |grams AS (SELECT DISTINCT doc_id, md5(array_to_string(t[g:g+${GramK - 1}], ' ')) AS gh
       |          FROM pos),
       |corpus AS (SELECT DISTINCT gh FROM grams WHERE doc_id % $BatchMod != 0),
       |batch AS (SELECT doc_id, gh FROM grams WHERE doc_id % $BatchMod = 0)
       |SELECT b.doc_id, COUNT(*) AS n_grams,
       |  CAST(COUNT(c.gh) AS BIGINT) AS n_shared,
       |  CAST((2 * COUNT(c.gh) * 1000000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
       |    / 1000000 AS shared_frac
       |FROM batch b LEFT JOIN corpus c USING (gh)
       |GROUP BY b.doc_id HAVING COUNT(c.gh) > 0
       |ORDER BY doc_id""".stripMargin

  /** The bloom-free twin of q104 (NOT registered): same split, same
    * accounting, plain distinct-gram join. IndexesSpec asserts q104's
    * output is bit-identical to this — the no-false-negative proof. */
  private[graft] def incrementalDecontamDirect(spark: SparkSession,
      dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val grams = gramFrame(d)
    val corpus = grams.filter(col("doc_id") % BatchMod =!= 0)
      .select(col("gh")).distinct().withColumn("hit", lit(1))
    grams.filter(col("doc_id") % BatchMod === 0)
      .join(broadcast(corpus), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_shared"))
      .filter(col("n_shared") > 0)
      .withColumn("shared_frac",
        dec6(col("n_shared").cast("decimal(18,0)") / col("n_grams")))
      .select(col("doc_id"), col("n_grams"), col("n_shared"), col("shared_frac"))
      .orderBy(col("doc_id"))
  }

  /** Phrase unit for the inverted index: word 3-grams. */
  private val PhraseLen = 3
  /** Probe phrases: the first five 3-gram phrases of doc 0 — a
    * deterministic stand-in for an external audit list ("find every
    * document containing this exact phrase"). */
  private val ProbeDocId = 0L
  private val ProbePhrases = 5

  /** Build (once, `_SUCCESS`-guarded) the inverted phrase index:
    * distinct (phrase, doc_id) postings partitioned by phrase-hash
    * bucket. At 100 TB the postings are fixed-width rows ~2 orders
    * smaller than the corpus text, and a probe reads only the buckets
    * its phrases hash to. */
  private[graft] def buildPhraseIndex(spark: SparkSession, dir: String): String = {
    val path = artifactPath(dir, "phrase_index")
    if (!isComplete(path)) {
      graft.Scratch.prepareArtifact(path)
      Tables.documents(spark, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          explode(wordShingles(col("text"), PhraseLen)).as("phrase"))
        .distinct()
        .withColumn("bucket", bucketOf(col("phrase")))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
    }
    path
  }

  /** Q105: EXACT-PHRASE AUDIT LOOKUP over the inverted index — every
    * (probe phrase, containing doc) pair. The tiny probe set is
    * broadcast into the index join, so dynamic partition pruning
    * limits the scan to the probed buckets (IndexesSpec asserts
    * `dynamicpruning` in the plan, the q59 discipline); the corpus
    * text itself is never read at probe time. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val path = buildPhraseIndex(spark, dir)
    val index = spark.read.parquet(path) // (doc_id, phrase) under bucket=
    val probes = Tables.documents(spark, dir)
      .filter(col("doc_id") === ProbeDocId && col("text").isNotNull)
      .select(posexplode(wordShingles(col("text"), PhraseLen))
        .as(Seq("pos0", "phrase")))
      .filter(col("pos0") < ProbePhrases)
      .select(col("phrase")).distinct()
      .withColumn("bucket", bucketOf(col("phrase")))
    index.join(broadcast(probes), Seq("bucket", "phrase"))
      .select(col("phrase"), col("doc_id"))
      .orderBy(col("phrase"), col("doc_id"))
  }

  val phraseSearchSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |              WHERE text IS NOT NULL),
       |g AS (SELECT doc_id, pos, array_to_string(t[pos:pos+${PhraseLen - 1}], ' ') AS phrase
       |      FROM toks, unnest(generate_series(1, len(t) - ${PhraseLen - 1})) AS u(pos)),
       |probes AS (SELECT DISTINCT phrase FROM g
       |           WHERE doc_id = $ProbeDocId AND pos <= $ProbePhrases)
       |SELECT phrase, d.doc_id
       |FROM (SELECT DISTINCT doc_id, phrase FROM g) d JOIN probes USING (phrase)
       |ORDER BY phrase, doc_id""".stripMargin

  /** q107 threshold: a gram is "heavy" at >= 3 corpus occurrences. */
  private val HeavyThreshold = 3L
  /** CMS geometry: eps 1e-4 / confidence 0.99 -> ~27k x 5 cells
    * (~1.1 MB) — sized so the expected per-cell load stays O(1)
    * against the corpus's distinct-gram count, keeping estimates
    * within ~1 of truth and the candidate set sharp. */
  private val CmsEps = 1e-4
  private val CmsConfidence = 0.99
  private val CmsSeed = 42

  /** Q107: FREQUENCY-THRESHOLD GRAM MINING ("which 8-gram spans repeat
    * >= 3 times corpus-wide?" — boilerplate discovery, the aggregate
    * view of what q101 finds per-document) with a count-min-sketch
    * prune: one pass builds the sketch (map-side-merged partial
    * sketches; only the ~1 MB sketch reaches the driver), a second
    * pass keeps the gram INSTANCES whose estimate clears the
    * threshold, and only those shuffle into the exact count.
    *
    * Exactness is structural, same proof as q104's bloom: CMS can
    * never underestimate, so the candidate set is a SUPERSET of the
    * true heavy grams; the exact count then discards the collisions —
    * output provably equals the sketch-free GROUP BY (IndexesSpec pins
    * the identity). At 100 TB the near-unique gram mass (the vast
    * majority, in any natural corpus) never reaches an exchange; the
    * sketch width scales with distinct-count/threshold and shards by
    * gram prefix if it outgrows one driver object, with the same
    * only-grows-candidates degrade as the bloom. */
  def heavyGrams(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(explode(wordShingles(col("text"), GramK)).as("gram"))
    val skBytes = grams
      .agg(count_min_sketch(col("gram"), lit(CmsEps), lit(CmsConfidence),
        lit(CmsSeed)).as("sk"))
      .collect()(0).getAs[Array[Byte]](0) // bounded: eps/confidence-sized
    grams
      .filter(graft.functions.CmsFunctions.cmsAtLeast(col("gram"), skBytes,
        HeavyThreshold))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= HeavyThreshold)
      .orderBy(col("n").desc, col("gram"))
  }

  val heavyGramsSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |              WHERE text IS NOT NULL),
       |g AS (SELECT array_to_string(t[pos:pos+${GramK - 1}], ' ') AS gram
       |      FROM toks, unnest(generate_series(1, len(t) - ${GramK - 1})) AS u(pos))
       |SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
       |FROM g GROUP BY gram HAVING COUNT(*) >= $HeavyThreshold
       |ORDER BY n DESC, gram""".stripMargin

  /** The sketch-free twin of q107 (NOT registered): plain GROUP BY over
    * all gram instances. IndexesSpec asserts identity. */
  private[graft] def heavyGramsDirect(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(explode(wordShingles(col("text"), GramK)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= HeavyThreshold)
      .orderBy(col("n").desc, col("gram"))

  def queries: Map[String, Relational.Q] = Map(
    "q104_incremental_decontam" -> (incrementalDecontam _),
    "q105_phrase_search" -> (phraseSearch _),
    "q107_heavy_grams" -> (heavyGrams _),
  )

  def oracles: Map[String, String] = Map(
    "q104_incremental_decontam" -> incrementalDecontamSql,
    "q105_phrase_search" -> phraseSearchSql,
    "q107_heavy_grams" -> heavyGramsSql,
  )
}
