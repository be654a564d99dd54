package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions._

/** Similarity search (X3, SURVEY §2.11). q34 has no oracle; its recall
  * is measured here against the brute-force q33 baseline. */
class SimilaritySpec extends SparkSuite {

  test("q33 brute-force top-k: dense ranks, monotone sims, no self-match") {
    val t = Similarity.cosineTopK(spark, Sf0001).cache()
    assert(t.filter(col("query_id") === col("vec_id")).count() === 0)
    // per query: ranks are 1..k and sim is non-increasing in rank
    val perQuery = t.groupBy("query_id").agg(
      count(lit(1)).as("k"),
      max("rnk").as("max_rnk"),
      min("rnk").as("min_rnk"))
    assert(perQuery.filter(col("max_rnk") =!= col("k") || col("min_rnk") =!= 1).count() === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("rnk")
    val monotone = t.withColumn("prev_sim", lag(col("sim"), 1).over(w))
      .filter(col("prev_sim").isNotNull && col("sim") > col("prev_sim"))
    assert(monotone.count() === 0)
    t.unpersist()
  }

  test("q34 ann-lsh: sims agree with brute force; bucket recall is useful") {
    val ann = Similarity.annLsh(spark, Sf0001)
      .select(col("query_id"), col("vec_id"), col("sim").as("ann_sim"))
    val bf = Similarity.cosineTopK(spark, Sf0001)
      .select(col("query_id"), col("vec_id"), col("sim").as("bf_sim"))
    // every (query, vec) pair ANN returns that brute force also ranked
    // must carry the identical cosine value (same math, same rounding)
    val joined = ann.join(bf, Seq("query_id", "vec_id"))
    assert(joined.filter(col("ann_sim") =!= col("bf_sim")).count() === 0)
    // the top-1 brute-force neighbor is found for most queries (identical/
    // near-identical vectors share the 4-bit hyperplane signature)
    val top1 = bf.join(Similarity.cosineTopK(spark, Sf0001).filter(col("rnk") === 1)
      .select(col("query_id"), col("vec_id")), Seq("query_id", "vec_id"), "left_semi")
    val found = top1.join(ann, Seq("query_id", "vec_id"), "left_semi").count()
    assert(found.toDouble / top1.count() >= 0.6, s"top-1 recall $found/${top1.count()}")
  }

  test("q59 ivf index probe: identical answer to q34, partition-pruned scan") {
    val ivf = Similarity.ivfAnn(spark, Sf0001)
    val ann = Similarity.annLsh(spark, Sf0001)
    // same signatures, same rerank => bit-identical result set
    assert(ivf.exceptAll(ann).count() === 0)
    assert(ann.exceptAll(ivf).count() === 0)
    // the probe must not scan the whole index: the broadcast signature
    // join prunes (tbl, bucket) partitions dynamically
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(2000))
  }

  test("q35 centroids: one pair per unordered label pair, sims in [-1,1]") {
    val labels = Tables.embeddings(spark, Sf0001).select("label").distinct().count()
    val c = Similarity.labelCentroids(spark, Sf0001).cache()
    val total = c.count()
    assert(total === labels * (labels - 1) / 2)
    // complement form: NaN/NULL sims fail a `sim NOT between` filter
    // silently, so count the VALID rows instead
    assert(c.filter(col("sim").isNotNull && !col("sim").isNaN &&
      col("sim") >= -1 && col("sim") <= 1).count() === total)
    c.unpersist()
  }

  test("HyperplaneBuckets kernel is bit-identical to per-table signatures") {
    val e = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), toDouble(col("embedding")).as("emb"))
    // both production geometries: q34/q59 (3,8) and q44 (4,6)
    for ((bits, tables, dims) <- Seq((3, 8, 64), (4, 6, 64))) {
      val fused = e.select(col("vec_id"),
          explode(graft.functions.VectorFunctions.hyperplaneBuckets(col("emb"), bits, tables, dims)).as("tb"))
        .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      val perTable = (0 until tables).map { t =>
        e.select(col("vec_id"), lit(t).as("tbl"),
          hyperplaneSignature(col("emb"), bits, dims, planeOffset = t * bits).as("bucket"))
      }.reduce(_ unionByName _)
      assert(fused.exceptAll(perTable).count() === 0, s"bits=$bits tables=$tables")
      assert(perTable.exceptAll(fused).count() === 0, s"bits=$bits tables=$tables")
    }
  }

  test("cosineSimilarity column function matches hand computation") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), 0.0),
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0), 1.0),
      (Array(1.0, 0.0, 0.0), Array(-1.0, 0.0, 0.0), -1.0),
    ).toDF("a", "b", "expected")
    val bad = df.withColumn("sim", cosineSimilarity(col("a"), col("b")))
      .filter(abs(col("sim") - col("expected")) > 1e-12)
    assert(bad.count() === 0)
  }

  test("DotProduct/L2Norm null and length semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0, 99.0))), // ragged: prefix
      (None, Some(Array(1.0))),                              // null left
      (Some(Array(1.0)), None),                              // null right
    ).toDF("a", "b")
      .withColumn("d", graft.functions.VectorFunctions.dotProduct(col("a"), col("b")))
      .withColumn("n", graft.functions.VectorFunctions.l2Norm(col("a")))
    val rows = df.collect()
    assert(rows(0).getDouble(rows(0).fieldIndex("d")) === 11.0) // shorter prefix
    assert(rows(1).isNullAt(rows(1).fieldIndex("d")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("d")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("n")))
  }

  test("graft_dot / graft_l2norm injected by GraftExtensions (no manual register)") {
    // SparkSuite's session carries spark.sql.extensions=graft.GraftExtensions
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_l2norm(array(3.0d, 4.0d)) AS n""".stripMargin).head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
  }

  test("q106 sq8: decode error bounded by one quantization step per coordinate") {
    val raw = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), toDouble(col("embedding")).as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dims = raw.values.head.length
    val mins = Array.tabulate(dims)(i => raw.values.map(_(i)).min)
    val maxs = Array.tabulate(dims)(i => raw.values.map(_(i)).max)
    val q = spark.read.parquet(Similarity.buildSq8(spark, Sf0001))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](2).toArray).toMap
    assert(q.keySet === raw.keySet)
    assert(q.values.forall(_.length === dims))
    q.foreach { case (id, codes) =>
      codes.zipWithIndex.foreach { case (c, i) =>
        val range = maxs(i) - mins(i)
        val step = if (range == 0d) 0d else range / 255d
        val decoded = mins(i) + (c.toInt + 128) * step
        assert(math.abs(decoded - raw(id)(i)) <= step + 1e-12,
          s"vec $id dim $i: decoded $decoded vs ${raw(id)(i)} (step $step)")
      }
    }
  }

  test("q106 sq8: reconstructed cosine tracks the exact q33 similarities") {
    val raw = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), toDouble(col("embedding")).as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dims = raw.values.head.length
    val mins = Array.tabulate(dims)(i => raw.values.map(_(i)).min)
    val maxs = Array.tabulate(dims)(i => raw.values.map(_(i)).max)
    val q = spark.read.parquet(Similarity.buildSq8(spark, Sf0001))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Byte](2).toArray.zipWithIndex.map { case (c, i) =>
          val range = maxs(i) - mins(i)
          mins(i) + (if (range == 0d) 0d else (c.toInt + 128) * range / 255d)
        }).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    val exact = Similarity.cosineTopK(spark, Sf0001).collect()
    assert(exact.nonEmpty)
    val errs = exact.map { r =>
      val qa = q(r.getAs[Long]("query_id")); val qb = q(r.getAs[Long]("vec_id"))
      math.abs(cos(qa, qb) - r.getAs[Double]("sim"))
    }
    val mean = errs.sum / errs.length
    assert(mean <= 0.05, s"mean |cos_sq8 - cos_exact| = $mean")
  }

  test("q33 plan: query side is broadcast (no corpus-x-corpus shuffle)") {
    val p = Similarity.cosineTopK(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q133 embedding drift matches a brute-force slice-centroid replay") {
    val codes = spark.read.parquet(Similarity.buildSq8(spark, Sf0001))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Byte](2).toArray.map(_.toLong + 128L)))
    def centroid(rows: Seq[Array[Long]]): Array[Long] = {
      val n = rows.length.toLong
      Array.tabulate(rows.head.length)(i => rows.map(_(i)).sum / n)
    }
    val expected = codes.map(_._2).distinct.sorted.flatMap { lbl =>
      val a = codes.filter(c => c._2 == lbl && c._1 % 7 != 2).map(_._3).toSeq
      val b = codes.filter(c => c._2 == lbl && c._1 % 5 != 3).map(_._3).toSeq
      if (a.isEmpty || b.isEmpty) None
      else {
        val (ca, cb) = (centroid(a), centroid(b))
        Some((lbl, a.length.toLong, b.length.toLong,
          ca.zip(cb).map { case (x, y) => math.abs(x - y) }.sum))
      }
    }.toSeq
    val got = Similarity.embeddingDrift(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("q121 rp-ann: rerank metric exact, ranks well-formed, recall vs full scan") {
    val rows = Similarity.rpAnn(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("rnk")).toSeq === (1L to 10L))
    // l2_code non-decreasing in rank; ties broken by vec_id
    val byRank = rows.sortBy(_.getAs[Long]("rnk"))
    byRank.sliding(2).foreach { case Array(a, b) =>
      val (ca, cb) = (a.getAs[Long]("l2_code"), b.getAs[Long]("l2_code"))
      assert(ca < cb || (ca == cb &&
        a.getAs[Long]("vec_id") < b.getAs[Long]("vec_id")), s"$a !<= $b")
    }
    // exact-rerank identity: recompute squared code L2 for every
    // returned id from the persisted artifact
    val codes = spark.read.parquet(Similarity.buildSq8(spark, Sf0001))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Byte](2).toArray.map(_.toLong + 128L)).toMap
    val probe = codes(0L)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    rows.foreach { r =>
      assert(r.getAs[Long]("l2_code") === l2(probe, codes(r.getAs[Long]("vec_id"))), r)
      assert(r.getAs[Long]("l2_proj") >= 0L, r)
    }
    // prefilter recall vs the exact full-scan top-10 (no projection):
    // a 16-dim JL draw on this corpus lands 5/10 — floor pinned at 4
    val exactTop = codes.view.filterKeys(_ != 0L).toSeq
      .map { case (id, c) => (l2(probe, c), id) }.sorted.take(10).map(_._2).toSet
    val recall = rows.map(_.getAs[Long]("vec_id")).count(exactTop)
    assert(recall >= 4, s"prefilter recall $recall/10 collapsed — sign family changed?")
  }
}
