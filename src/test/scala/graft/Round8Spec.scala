package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** Behavior pins for the round-8 operator tail (q245-q248). Oracles are
  * the primary gate; these assert each operator's DEFINING property —
  * the invariant a hash compare can't name.
  */
class Round8Spec extends SparkSuite {

  test("q245 Spearman: Cauchy-Schwarz holds exactly; rho bounded and NULL only on zero variance") {
    Quality.spearmanMonthly(spark, Sf0001).collect().foreach { r =>
      val num = r.getAs[Long]("cov_num")
      val vx = r.getAs[Long]("v_x")
      val vy = r.getAs[Long]("v_y")
      // integer-exact Cauchy-Schwarz on the rank frame
      assert(num.toDouble * num <= vx.toDouble * vy + 1e-6, r)
      if (vx > 0 && vy > 0) {
        val rho = r.getAs[Double]("spearman_rho")
        assert(rho >= -1.0 - 1e-12 && rho <= 1.0 + 1e-12, r)
      } else assert(r.isNullAt(r.fieldIndex("spearman_rho")), r)
    }
  }

  test("q246 Brown-Forsythe: medians match a driver-side sorted replay; F and sums are consistent") {
    val row = Quality.brownForsythe(spark, Sf0001).collect()(0)
    // independent lower-median replay per priority group
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
      .cast("decimal(18,0)").cast("long")
    val byG = Tables.orders(spark, Sf0001)
      .select(col("o_orderpriority").as("g"), cents.as("c"))
      .collect().groupBy(_.getString(0)).map { case (g, rs) =>
        val sorted = rs.map(_.getLong(1)).sorted
        g -> sorted(((sorted.length + 1) / 2) - 1)
      }
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    prios.zipWithIndex.foreach { case (p, i) =>
      assert(row.getAs[Long](s"med${i + 1}") === byG(p), s"median of $p")
    }
    val ssb = row.getAs[Double]("ssb")
    val ssw = row.getAs[Double]("ssw")
    assert(ssb >= 0 && ssw >= 0, row)
    assert(row.getAs[Double]("f_stat") >= 0, row)
  }

  test("q247 Pettitt: k_stat matches a driver-side split sweep; t_star is the first argmax") {
    val got = Quality.pettittTest(spark, Sf0001).collect()
      .map(r => r.getAs[String]("nation") ->
        (r.getAs[Long]("k_stat"), r.getAs[Long]("t_star"), r.getAs[Long]("u_star")))
      .toMap
    // independent replay from the monthly frame
    val monthly = Tables.orders(spark, Sf0001)
      .join(Tables.customer(spark, Sf0001), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, Sf0001), col("c_nationkey") === col("n_nationkey"))
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy(col("n_name"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("m"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("decimal(18,0)").cast("long")).as("rev"))
      .collect().groupBy(_.getString(0))
    monthly.foreach { case (nation, rows) =>
      val xs = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).map(_._2)
      if (xs.length >= 2) {
        val us = (1 until xs.length).map { t =>
          (for (i <- 0 until t; j <- t until xs.length)
            yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
        }
        val k = us.map(math.abs).max
        val tStar = us.indexWhere(u => math.abs(u) == k) + 1
        assert(got(nation) === ((k, tStar.toLong, us(tStar - 1))), nation)
      } else assert(!got.contains(nation), nation)
    }
  }

  test("q249 PQ: every subspace assignment is argmin over its codebook (ties to smallest cid)") {
    val asg = graft.operators.Clustering.pqAssignments(spark, Sf0001).collect()
    val centsPath = Scratch.artifactPath("pq", Sf0001, "_m4k8i3d64") + "_cents"
    val books = spark.read.schema("sub INT, cid INT, cent ARRAY<BIGINT>")
      .parquet(centsPath).collect()
      .groupBy(_.getInt(0)).view.mapValues(_.sortBy(_.getInt(1))
        .map(_.getSeq[Long](2).toArray)).toMap
    asg.foreach { r =>
      val codes = r.getSeq[Long](r.fieldIndex("codes")).toArray
      (0 until 4).foreach { s =>
        val sub = codes.slice(s * 16, s * 16 + 16)
        val dists = books(s).map(c =>
          sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
        val best = dists.indexOf(dists.min)
        assert(r.getAs[Int](s"cid$s") === best,
          s"vec ${r.getLong(0)} sub $s: assignment must be the first argmin")
      }
    }
    val audit = graft.operators.Clustering.pqAdcRecall(spark, Sf0001).collect()
    audit.foreach { r =>
      val overlap = r.getAs[Long]("n_overlap")
      assert(overlap >= 0 && overlap <= 10, r)
      assert(r.getAs[Double]("recall_at_10") === overlap / 10.0, r)
    }
  }

  test("q248 isotonic: non-decreasing, in [0,1], and within 2 micro-units of exact-rational PAV") {
    val rows = Quality.isotonicCalibration(spark, Sf0001).collect()
      .sortBy(_.getAs[Int]("score_bin"))
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    iso.sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-12, "isotonic output must be monotone")
      case _ =>
    }
    assert(iso.forall(v => v >= 0 && v <= 1))
    // classic sequential pool-adjacent-violators on EXACT rationals —
    // independent algorithm (pooling loop, not the max-min closed form)
    val pools = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (e, n)
    rows.foreach { r =>
      pools += ((r.getAs[Long]("n_en"), r.getAs[Long]("n_docs")))
      // pool while the last rate <= previous rate (exact cross-multiply)
      while (pools.length >= 2 &&
          pools(pools.length - 1)._1 * pools(pools.length - 2)._2 <=
          pools(pools.length - 2)._1 * pools(pools.length - 1)._2) {
        val b = pools.remove(pools.length - 1)
        val a = pools.remove(pools.length - 1)
        pools += ((a._1 + b._1, a._2 + b._2))
      }
    }
    // rebuild the per-bin expected rates by walking pool sizes
    val perBin = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    pools.foreach { case (e, n) =>
      var covered = 0L
      while (covered < n) {
        covered += rows(i).getAs[Long]("n_docs")
        perBin += e.toDouble / n
        i += 1
      }
      assert(covered === n, "pool boundaries must align with bins")
    }
    iso.zip(perBin).foreach { case (got, exact) =>
      assert(math.abs(got - exact) <= 2e-6, s"micro-unit PAV vs exact: $got vs $exact")
    }
  }
}
