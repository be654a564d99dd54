package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Events, MlQueries, Quality, Relational}

/** Behavior pins for the round-7 operator tail (q216-q241). Oracles are
  * the primary gate; these assert the DEFINING property of each
  * operator — the invariant a hash compare can't name.
  */
class Round7Spec extends SparkSuite {

  test("q216 sorted neighborhood: every emitted pair is within the window and over threshold") {
    val res = Dedup.sortedNeighborhood(spark, Sf0001).collect()
    res.foreach { r =>
      val gap = r.getAs[Long]("rank_gap")
      assert(gap >= 1L && gap <= 7L, r) // w = 8 -> gaps 1..7
      assert(r.getAs[Double]("jaccard") >= 0.8 - 1e-9, r)
    }
  }

  test("q222 skyline: no emitted part is dominated by another emitted part") {
    val res = Relational.skylineParts(spark, Sf0001).collect()
      .groupBy(_.getAs[String]("brand"))
    res.foreach { case (_, parts) =>
      val pts = parts.map(r =>
        (r.getAs[Long]("price_cents"), r.getAs[Long]("size")))
      for (a <- pts; b <- pts if a != b)
        assert(!(a._1 <= b._1 && a._2 <= b._2 && (a._1 < b._1 || a._2 < b._2)),
          s"$a dominates emitted $b")
    }
  }

  test("q223 ANOVA: SSB + SSW = SST >= 0 and eta^2 in [0, 1]") {
    val r = Quality.anovaOneWay(spark, Sf0001).head()
    val (ssb, ssw) = (r.getAs[Double]("ssb"), r.getAs[Double]("ssw"))
    assert(ssb >= 0 && ssw >= 0)
    val eta = r.getAs[Double]("eta_sq")
    assert(eta >= 0 && eta <= 1)
    assert(math.abs(eta - ssb / (ssb + ssw)) < 1e-12)
  }

  test("q227 Kaplan-Meier: survival in [0, 1], non-increasing, risk set non-increasing") {
    val rows = Events.kaplanMeier(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Double]("survival"))
    // S reaches exactly 0 when the largest observation is an event
    // (d = n on the final day) — legitimate KM output, not a bug
    assert(surv.forall(s => s >= 0 && s <= 1))
    surv.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-15) case _ => }
    val risk = rows.map(_.getAs[Long]("n_risk"))
    risk.sliding(2).foreach { case Array(a, b) => assert(b <= a) case _ => }
  }

  test("q229 trimmed mean: between min and untrimmed mean bounds, kept count exact") {
    val res = Quality.trimmedMean(spark, Sf0001).collect()
    res.foreach { r =>
      assert(r.getAs[Long]("m_kept") ===
        r.getAs[Long]("n_orders") - 2 * r.getAs[Long]("k_trim"), r)
      assert(r.getAs[Double]("trimmed_mean_cents") > 0, r)
    }
  }

  test("q230 Wilson: interval brackets p_hat and stays inside [0, 1]") {
    Quality.wilsonInterval(spark, Sf0001).collect().foreach { r =>
      val (p, lo, hi) = (r.getAs[Double]("p_hat"),
        r.getAs[Double]("wilson_lo"), r.getAs[Double]("wilson_hi"))
      assert(lo >= 0 && hi <= 1 && lo <= p && p <= hi, r)
    }
  }

  test("q236 log-rank: cohort sizes partition the clicked-user population") {
    val r = Events.logRankTest(spark, Sf0001).head()
    val clicked = Tables.events(spark, Sf0001)
      .filter(col("event_type") === "click")
      .select(col("user_id")).distinct().count()
    assert(r.getAs[Long]("n_users_hi") + r.getAs[Long]("n_users_lo") === clicked)
    assert(r.getAs[Double]("var_lr") >= 0)
  }

  test("q238 conformal: interval brackets the point forecast symmetrically; >=90% of in-sample residuals inside the radius") {
    val rows = MlQueries.conformalInterval(spark, Sf0001).collect()
    rows.filter(!_.isNullAt(4)).foreach { r =>
      val (yhat, lo, hi, rad) = (r.getAs[Double]("yhat_next_cents"),
        r.getAs[Double]("pi_lo"), r.getAs[Double]("pi_hi"),
        r.getAs[Double]("conformal_radius"))
      assert(rad >= 0 && math.abs((yhat - lo) - rad) < 1e-6 &&
        math.abs((hi - yhat) - rad) < 1e-6, r)
      val n = r.getAs[Long]("n_months")
      // rank ceil(0.9(n+1)) of n residuals -> at least ceil(0.9(n+1)) - 1
      // residuals are <= radius; for n = 24 that is 22/24 > 0.9
      assert((9 * (n + 1) + 9) / 10 <= n, r)
    }
  }

  test("q239 seasonal decomposition telescopes: x = trend + seasonal + residual (to micro rounding)") {
    Events.seasonalDecomposition(spark, Sf0001).collect().foreach { r =>
      val x = r.getAs[Long]("x").toDouble
      val sum = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(x - sum) < 2e-6, r) // three half-up micro roundings
    }
  }

  test("q240 Wasserstein: non-negative always; zero when src == rest") {
    Quality.wassersteinDrift(spark, Sf0001).collect().foreach { r =>
      assert(r.getAs[Double]("w1_chars") >= 0, r)
    }
    // self-comparison-zero: a fixture where every source carries the
    // IDENTICAL n_chars multiset makes each src-vs-rest pair compare
    // equal distributions, so W1 must be exactly 0 for every source
    import spark.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_q240_fixture_" +
      ProcessHandle.current().pid()
    Scratch.deleteOnExit(dir)
    val lens = Seq(10L, 10L, 25L, 40L, 40L, 40L, 90L)
    Seq("a", "b", "c").flatMap(s => lens.zipWithIndex.map { case (n, i) =>
      (s.hashCode.toLong * 1000 + i, s, n)
    }).toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val zeros = Quality.wassersteinDrift(spark, dir).collect()
    assert(zeros.length === 3)
    zeros.foreach(r => assert(r.getAs[Double]("w1_chars") === 0.0, r))
  }

  test("q241 quantile normalization is rank-preserving within source and hits the pooled support") {
    val rows = Quality.quantileNormalize(spark, Sf0001).collect()
    val pooled = Tables.documents(spark, Sf0001)
      .select(col("n_chars")).distinct().collect()
      .map(_.getLong(0)).toSet
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("v")).map(_.getAs[Long]("mapped_v"))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a <= b, "mapping must be monotone")
        case _ =>
      }
    }
    rows.foreach(r => assert(pooled.contains(r.getAs[Long]("mapped_v"))))
  }
}
