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
    val fp = TextAnalysis.fingerprints(spark, Sf0001).count()
    val textDups = Tables.documents(spark, Sf0001)
      .groupBy("text").count().filter(col("count") > 1).count()
    assert(fp === textDups)
  }
}
