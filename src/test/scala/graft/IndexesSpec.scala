package graft

import org.apache.spark.sql.functions._
import graft.operators.Indexes
import graft.functions.TextFunctions._

/** Persisted-index operators (q104 incremental decontamination, q105
  * phrase audit lookup). The load-bearing claims: q104's bloom is a
  * prune with NO effect on the answer (identity with the bloom-free
  * join), and both probes read pruned index partitions, not the
  * corpus. */
class IndexesSpec extends SparkSuite {

  private def grams(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(wordShingles(col("text"), 8)).as("gram"))
      // round-13: gh is md5 raw bytes, mirroring Indexes.gramFrame
      .select(col("doc_id"), unhex(md5(col("gram"))).as("gh"))
      .distinct()

  test("q104: bit-identical to the bloom-free direct join (no false negatives)") {
    val viaIndex = Indexes.incrementalDecontam(spark, Sf0001).collect().toSeq
    val direct = Indexes.incrementalDecontamDirect(spark, Sf0001).collect().toSeq
    assert(viaIndex === direct)
    assert(viaIndex.nonEmpty, "split produced no overlap — test corpus changed?")
    viaIndex.foreach { r =>
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_grams"), r)
      assert(r.getAs[Long]("n_shared") >= 1L, r)
    }
  }

  test("q104 bloom: every truly-shared gram passes; pruning actually prunes") {
    val (_, words) = Indexes.buildCorpusGramIndex(spark, Sf0001)
    val d = Tables.documents(spark, Sf0001)
    val batch = grams(d.filter(col("doc_id") % 5 === 0)).cache()
    val corpus = grams(d.filter(col("doc_id") % 5 =!= 0)).select("gh").distinct()
    val pass = Indexes.bloomMightContain(col("gh"), words)
    // no false negatives: a shared gram failing the bloom would lose rows
    val sharedMissed = batch.join(corpus, Seq("gh"), "left_semi")
      .filter(!pass).count()
    assert(sharedMissed === 0L)
    // the prune is real: candidates are a strict subset of batch grams
    val total = batch.count()
    val candidates = batch.filter(pass).count()
    assert(candidates < total, s"bloom pruned nothing ($candidates of $total)")
    info(s"bloom pruning: $candidates of $total batch grams survive")
    batch.unpersist()
  }

  test("q104/q105 plans: dynamic partition pruning on the index probe") {
    for (q <- Seq(Indexes.incrementalDecontam _, Indexes.phraseSearch _)) {
      val df = q(spark, Sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), plan.take(2000))
    }
  }

  test("q107: bit-identical to the sketch-free GROUP BY; CMS never underestimates") {
    val viaSketch = Indexes.heavyGrams(spark, Sf0001).collect().toSeq
    val direct = Indexes.heavyGramsDirect(spark, Sf0001).collect().toSeq
    assert(viaSketch === direct)
    assert(viaSketch.nonEmpty, "no heavy grams at sf0.001 — test corpus changed?")
    // superset proof, driver-side: rebuild the sketch exactly as the
    // operator does and check estimate >= exact for EVERY distinct gram
    // (any ingestion/probe hash mismatch shows up as an underestimate)
    val grams = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .select(explode(wordShingles(col("text"), 8)).as("gram"))
    val skBytes = grams
      .agg(count_min_sketch(col("gram"), lit(1e-4), lit(0.99), lit(42)).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(skBytes)
    val exact = grams.groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    val under = exact.filter { case (g, n) =>
      sketch.estimateCount(g.getBytes("UTF-8")) < n
    }
    assert(under.isEmpty, s"CMS underestimated ${under.take(3).toSeq}")
    // the prune is real: candidate instances well under total instances
    val total = grams.count()
    val candidates = grams.filter(graft.functions.CmsFunctions
      .cmsAtLeast(col("gram"), skBytes, 3L)).count()
    assert(candidates < total / 10,
      s"CMS pruned too little ($candidates of $total instances)")
    info(s"CMS pruning: $candidates of $total gram instances survive")
  }

  test("q105: identical to a direct corpus scan; probe doc matches itself") {
    val viaIndex = Indexes.phraseSearch(spark, Sf0001).collect().toSeq
    // direct twin: no index, no bloom — scan all docs' phrases
    val d = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
    val all = d.select(col("doc_id"),
        posexplode(wordShingles(col("text"), 3)).as(Seq("pos0", "phrase")))
    val probes = all.filter(col("doc_id") === 0 && col("pos0") < 5)
      .select("phrase").distinct()
    val direct = all.select(col("doc_id"), col("phrase")).distinct()
      .join(probes, Seq("phrase"))
      .select(col("phrase"), col("doc_id"))
      .orderBy(col("phrase"), col("doc_id")).collect().toSeq
    assert(viaIndex === direct)
    // every probe phrase finds at least its own source document
    val probeCount = probes.count()
    assert(viaIndex.filter(_.getLong(1) == 0L).map(_.getString(0)).distinct.size
      === probeCount)
  }
}
