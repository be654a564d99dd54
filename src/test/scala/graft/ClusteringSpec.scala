package graft

import graft.operators.Clustering

/** Embedding clustering (q109 integer k-means) and SemDeDup (q110).
  * The load-bearing claims: the distributed argmin assignment is the
  * true per-vector argmin (driver-side brute force agrees exactly),
  * Lloyd does not worsen inertia, and q110's clusters are bit-identical
  * to a driver-side union-find over the exact integer-threshold pairs. */
class ClusteringSpec extends SparkSuite {

  private def sqDist(x: Array[Long], c: Array[Long]): Long = {
    var s = 0L; var d = 0
    while (d < x.length) { val t = x(d) - c(d); s += t * t; d += 1 }
    s
  }

  private def argmin(x: Array[Long], cents: Array[Array[Long]]): Int =
    cents.indices.minBy(k => (sqDist(x, cents(k)), k))

  private lazy val codes: Map[Long, Array[Long]] =
    Clustering.codeVectors(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toArray).toMap

  private lazy val cents: Array[Array[Long]] =
    Clustering.lloyd(Clustering.codeVectors(spark, Sf0001))

  test("q109: distributed assignment IS the per-vector argmin; d is exact") {
    val asg = Clustering.kmeansAssignments(spark, Sf0001).collect()
    assert(asg.length === codes.size)
    asg.foreach { r =>
      val (id, cid, d) = (r.getLong(0), r.getInt(2), r.getLong(3))
      assert(cid === argmin(codes(id), cents), s"vec $id")
      assert(d === sqDist(codes(id), cents(cid)), s"vec $id")
    }
  }

  test("q109: accounting totals are consistent; Lloyd did not worsen inertia") {
    val out = Clustering.kmeansClusters(spark, Sf0001).collect()
    assert(out.map(_.getAs[Long]("n_vecs")).sum === codes.size)
    assert(out.length <= 8 && out.nonEmpty)
    // inertia equals the driver-side recomputation...
    val inertia = out.map(_.getAs[Long]("inertia")).sum
    val expected = codes.values.map(x => sqDist(x, cents(argmin(x, cents)))).sum
    assert(inertia === expected)
    // ...and fixed-round Lloyd at least matches the seed assignment
    val init = codes.toSeq.sortBy(_._1).take(8).map(_._2).toArray
    val initInertia = codes.values.map(x => sqDist(x, init(argmin(x, init)))).sum
    assert(inertia <= initInertia, s"$inertia > $initInertia")
  }

  test("q110: clusters bit-identical to driver-side union-find over exact pairs") {
    // brute-force witness: within-kmeans-cluster pairs, integer cosine
    // threshold dot>0 && 100*dot^2 >= 16*|a|^2*|b|^2 on centered codes
    val asg = Clustering.kmeansAssignments(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val centered = codes.map { case (id, x) => id -> x.map(_ - 128L) }
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var d = 0
      while (d < a.length) { s += a(d) * b(d); d += 1 }
      s
    }
    val ids = centered.keys.toSeq.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    var nPairs = 0
    for (i <- ids; j <- ids if i < j && asg(i) == asg(j)) {
      val d = dot(centered(i), centered(j))
      val (na, nb) = (dot(centered(i), centered(i)), dot(centered(j), centered(j)))
      if (d > 0 && d * d * 100L >= 16L * na * nb) { union(i, j); nPairs += 1 }
    }
    assert(nPairs > 0, "no semantic-dup pairs at sf0.001 — corpus changed?")
    val expected = ids.map(i => i -> find(i)).filter { case (i, r) =>
      ids.exists(j => j != i && find(j) == r) // non-singleton components only
    }.toMap
    val out = Clustering.semanticDedup(spark, Sf0001).collect()
    val got = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_kept") === (r.getLong(0) === r.getLong(1)))
      assert(r.getAs[Long]("cluster_size") >= 2L)
    }
    // exactly one keeper per cluster, and it is the minimum member
    out.groupBy(_.getLong(1)).foreach { case (lbl, rows) =>
      assert(rows.count(_.getAs[Boolean]("is_kept")) === 1)
      assert(rows.map(_.getLong(0)).min === lbl)
      assert(rows.length === rows.head.getAs[Long]("cluster_size"))
    }
  }

  test("q113: prototypes are exactly the 16 closest (d, vec_id) members per cluster") {
    val asg = Clustering.kmeansAssignments(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3))) // (vec_id, cid, d)
    val expected = asg.groupBy(_._2).toSeq.flatMap { case (cid, members) =>
      members.sortBy(m => (m._3, m._1)).take(16).zipWithIndex
        .map { case ((id, _, d), i) => (cid.toLong, (i + 1).toLong, id, d) }
    }.toSet
    val got = Clustering.prototypeSample(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
  }

  test("q117: outliers are exactly the 8 farthest per cluster; severity exact") {
    val asg = Clustering.kmeansAssignments(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3))) // (vec_id, cid, d)
    val expected = asg.groupBy(_._2).toSeq.flatMap { case (cid, members) =>
      val n = members.length.toLong
      val sumD = members.map(_._3).sum
      members.sortBy(m => (-m._3, m._1)).take(8).zipWithIndex
        .map { case ((id, _, d), i) =>
          val rel: Any = if (sumD == 0) null
          else (BigDecimal(d * n) / BigDecimal(sumD))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (cid.toLong, (i + 1).toLong, id, d, rel)
        }
    }.toSet
    val got = Clustering.clusterOutliers(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        (if (r.isNullAt(4)) null else r.getDouble(4)): Any)).toSet
    assert(got === expected)
    // the inspection slice and q113's coreset overlap only when a
    // cluster is too small to keep them apart
    val protos = Clustering.prototypeSample(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val sizes = asg.groupBy(_._2).view.mapValues(_.length).toMap
    got.foreach { case (cid, _, id, _, _) =>
      if (sizes(cid.toInt) >= 24)
        assert(!protos.contains((cid, id)), s"outlier $id is also a prototype")
    }
  }

  test("q109/q110: deterministic across invocations (persisted artifact reread)") {
    val a = Clustering.kmeansClusters(spark, Sf0001).collect().toSeq
    val b = Clustering.kmeansClusters(spark, Sf0001).collect().toSeq
    assert(a === b)
  }

  test("q155 silhouette: matches a driver-side all-centroid replay") {
    import spark.implicits._
    val cents = Clustering.kmeansCentroids(spark, Sf0001)
    assert(cents.nonEmpty)
    val codes = Clustering.codeVectors(spark, Sf0001)
      .select($"vec_id", $"codes").as[(Long, Seq[Long])].collect().toMap
    val got = Clustering.silhouette(spark, Sf0001).collect()
    assert(got.length === codes.size)
    got.foreach { r =>
      val cs = codes(r.getLong(0))
      val dists = cents.map(c =>
        cs.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      val cid = r.getLong(1).toInt
      val a = dists(cid)
      val b = dists.zipWithIndex.filter(_._2 != cid).map(_._1).min
      // assignment is argmin: a is the global min (first-min tiebreak)
      assert(a === dists.min, r)
      assert(r.getLong(2) === a, s"a_dist $r")
      assert(r.getLong(3) === b, s"b_dist $r")
      val s = if (math.max(a, b) == 0) 0.0
        else (BigDecimal(b - a) / BigDecimal(math.max(a, b)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) === s, s"silhouette $r")
      // a is the assigned (minimal) distance, so s is never negative
      // under argmin assignment — and bounded by 1
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, r)
    }
  }
}
