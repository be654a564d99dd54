package graft

import org.apache.spark.sql.functions._
import graft.functions.Skew

/** Skew mitigation utilities: salted join/agg must be result-identical
  * to their plain forms while splitting hot keys. */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  private lazy val skewedFact = {
    // hot key 1 carries 90% of rows
    val hot = (1 to 900).map(i => (1L, i.toLong))
    val rest = (1 to 100).map(i => ((i % 7 + 2).toLong, i.toLong))
    (hot ++ rest).toDF("k", "v")
  }
  private lazy val dim = (1L to 10L).map(k => (k, s"name$k")).toDF("k", "name")

  test("saltedJoin is row-identical to the plain join") {
    val plain = skewedFact.join(dim, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(skewedFact, dim, "k", salt = 8).select("k", "v", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("saltedJoin actually splits the hot key across salt buckets") {
    // uses Skew's own salt expression — an inline re-implementation
    // would keep passing if the production salt regressed to key-only
    val salted = skewedFact.withColumn("__salt", Skew.saltCol(skewedFact, 8))
    val buckets = salted.filter($"k" === 1L).select("__salt").distinct().count()
    assert(buckets >= 6, s"hot key spread over only $buckets buckets")
  }

  test("duplicate-row hot key: extra entropy spreads what row-hash can't") {
    // 900 IDENTICAL rows of hot key 1 — the documented saltCol blind spot
    val dupFact = ((1 to 900).map(_ => (1L, 7L)) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, i.toLong))).toDF("k", "v")
      .repartition(4) // several input splits so partition ids differ
    // row-hash alone: all duplicates land in ONE bucket
    val plainBuckets = dupFact.withColumn("__salt", Skew.saltCol(dupFact, 8))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(plainBuckets === 1, s"expected collapse, got $plainBuckets buckets")
    // with partition-id entropy: spreads, and the join stays row-identical
    val salted = Skew.saltedJoin(dupFact, dim, "k", salt = 8,
      extra = Some(spark_partition_id())).select("k", "v", "name")
    val plain = dupFact.join(dim, Seq("k")).select("k", "v", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    val entropic = dupFact.withColumn("__salt",
      Skew.saltCol(dupFact, 8, Some(spark_partition_id())))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(entropic > 1, s"partition-id entropy still collapsed to $entropic bucket")
  }

  test("saltedAgg matches the plain aggregation") {
    val plain = skewedFact.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val salted = Skew.saltedAgg(skewedFact, "k", salt = 8)(
      Seq(count(lit(1)).as("n"), sum($"v").as("s")),
      Seq(sum($"n").as("n"), sum($"s").as("s")))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("typed Dataset[NormalizedMatch] round-trips the normalized frame") {
    val raw = graft.soccer.Normalize.fromJsonStrings(spark,
      graft.operators.Soccer.sampleRecords)
    val df = graft.soccer.Normalize.normalize(raw, "sha")
    val ds = graft.soccer.Normalize.typed(df)
    assert(ds.count() === df.count())
    val m = ds.filter(_.team_home == "Arsenal FC").collect()
    assert(m.nonEmpty && m.forall(_.schema_version == "v1"))
    // unplayed match: no winner, no points (Option decodes null)
    assert(ds.collect().exists(r => r.winner == null && r.points_home.isEmpty))
  }
}
