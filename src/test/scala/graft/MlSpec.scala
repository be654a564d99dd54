package graft

import org.apache.spark.sql.functions._
import graft.ml.ChampionModel
import graft.operators.{MlQueries, Relational}

/** M1-M4 (SURVEY §2.9): champion classification over season standings. */
class MlSpec extends SparkSuite {

  private lazy val standings = Relational.standings(spark, Sf0001)
    .select(
      lit("tpch").as("league"),
      col("season").cast("string").as("season"),
      col("team"),
      col("points").cast("double").as("points"),
      col("goal_value").cast("double").as("goal_diff"),
      col("rank"),
      (col("rank") === 1).as("is_champion"))

  test("features: lag/rolling drop first season per team, keep schema") {
    val f = ChampionModel.features(standings)
    assert(f.columns.contains("prev_points") && f.columns.contains("roll_points"))
    val firstSeason = standings.agg(min("season")).head().getString(0)
    assert(f.filter(col("season") === firstSeason).count() === 0)
    // verify actual lag SEMANTICS, not the implementation's own filter:
    // prev_points of (team, season) must equal that team's points in
    // the immediately preceding season
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("league", "team").orderBy("season")
    val expectedLag = standings
      .withColumn("expected_prev", lag(col("points"), 1).over(w))
      .select(col("team"), col("season"), col("expected_prev"))
    val joined = f.join(expectedLag, Seq("team", "season"))
    assert(joined.filter(col("prev_points") =!= col("expected_prev")).count() === 0)
    assert(joined.count() === f.count())
  }

  test("temporal split is disjoint and ordered") {
    val f = ChampionModel.features(standings)
    val seasons = f.select("season").distinct().orderBy("season")
      .collect().map(_.getString(0))
    assert(seasons.length >= 3)
    val (train, valid, testDf) =
      ChampionModel.temporalSplit(f, seasons.last, seasons(seasons.length - 2))
    val maxTrain = train.agg(max("season")).head().getString(0)
    assert(maxTrain < seasons(seasons.length - 2))
    // pin WHICH season each split holds — symmetric count assertions
    // would not catch a (valid, test) swap (test-set leakage)
    assert(valid.select("season").distinct().collect().map(_.getString(0))
      === Array(seasons(seasons.length - 2)))
    assert(testDf.select("season").distinct().collect().map(_.getString(0))
      === Array(seasons.last))
  }

  test("walk-forward folds: train strictly precedes test season") {
    val f = ChampionModel.features(standings)
    val folds = ChampionModel.walkForwardFolds(f, minTrain = 2)
    assert(folds.nonEmpty)
    folds.foreach { case (s, train, testDf) =>
      assert(train.filter(col("season") >= s).count() === 0)
      assert(testDf.filter(col("season") =!= s).count() === 0)
    }
  }

  test("pipeline trains, evaluates, and beats coin-flip AUC") {
    val f = ChampionModel.features(standings).cache()
    val last = f.agg(max("season")).head().getString(0)
    val model = ChampionModel.fitServing(f.filter(col("season") < last))
    val preds = model.transform(f)
    val (auc, top1, top3) = ChampionModel.evaluate(preds)
    assert(auc > 0.5, s"auc=$auc")
    assert(top1 >= 0.0 && top3 >= top1)
  }

  test("q37_ml_champion: deterministic rank output, exactly one champion") {
    val out = MlQueries.championPrediction(spark, Sf0001)
    assert(out.count() > 0)
    assert(out.filter(col("actual_champion") === 1).count() === 1)
    val ranks = out.select("pred_rank").collect().map(_.getLong(0))
    assert(ranks.toSeq === (1L to ranks.length).toSeq)
  }

  test("previous-champion baseline is a valid probability") {
    val b = ChampionModel.previousChampionBaseline(standings)
    assert(b >= 0.0 && b <= 1.0)
  }

  test("q135 grouped OLS: matches an exact driver-side BigInt fit") {
    import spark.implicits._
    val rows = Tables.lineitem(spark, Sf0001)
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .as[(String, Double, Double)].collect()
    def cents(d: Double): BigInt =
      BigDecimal.valueOf(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toBigInt
    def div6(a: BigInt, b: BigInt): Double =
      (BigDecimal(a) / BigDecimal(b)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val expected = rows.groupBy(_._1).map { case (flag, rs) =>
      val x = rs.map(r => BigInt(r._2.toLong))
      val y = rs.map(r => cents(r._3))
      val n = BigInt(rs.length)
      val (sx, sy) = (x.sum, y.sum)
      val sxx = x.map(v => v * v).sum
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      val syy = y.map(v => v * v).sum
      val num = n * sxy - sx * sy
      val dx = n * sxx - sx * sx
      val dy = n * syy - sy * sy
      flag -> (div6(num, dx), div6(num * num, dx * dy))
    }
    val got = MlQueries.groupedOls(spark, Sf0001).collect()
    assert(got.map(_.getString(0)).toSet === expected.keySet)
    got.foreach { r =>
      val (slope, r2) = expected(r.getString(0))
      assert(r.getDouble(4) === slope, s"slope ${r}")
      assert(r.getDouble(6) === r2, s"r2 ${r}")
      assert(r2 >= 0.0 && r2 <= 1.0, r)
    }
  }

  test("q161 k-fold OLS: matches a driver-side train/eval replay") {
    import spark.implicits._
    val rows = Tables.lineitem(spark, Sf0001)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .as[(Long, Double, Double)].collect()
      .map { case (k, q, p) =>
        (k % 5,
          BigInt(BigDecimal.valueOf(q).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact),
          BigInt(BigDecimal.valueOf(p).setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact))
      }
    def halfAway(n: BigInt, d: BigInt): BigInt = {
      require(d > 0)
      if (n < 0) -((2 * -n + d) / (2 * d)) else (2 * n + d) / (2 * d)
    }
    val got = MlQueries.kfoldOls(spark, Sf0001).collect()
    assert(got.map(_.getInt(0)).toSeq === (0 to 4))
    got.foreach { r =>
      val f = r.getInt(0).toLong
      val tr = rows.filter(_._1 != f); val te = rows.filter(_._1 == f)
      val n = BigInt(tr.length)
      val sx = tr.map(_._2).sum; val sy = tr.map(_._3).sum
      val sxx = tr.map(t => t._2 * t._2).sum
      val sxy = tr.map(t => t._2 * t._3).sum
      val num = n * sxy - sx * sy
      val dx = n * sxx - sx * sx
      val numi = sy * sxx - sx * sxy
      val b6 = halfAway(num * 1000000, dx)
      val a6 = halfAway(numi * 1000000, dx)
      assert(r.getLong(1) === tr.length.toLong, s"n_train $r")
      assert(r.getLong(2) === te.length.toLong, s"n_test $r")
      assert(r.getDouble(3) === (BigDecimal(b6) / 1000000).toDouble, s"slope $r")
      assert(r.getDouble(4) ===
        (BigDecimal(halfAway(a6, BigInt(100))) / 1000000).toDouble, s"intercept $r")
      val sae = te.map(t => (t._3 * 1000000 - a6 - b6 * t._2).abs).sum
      val mae = (BigDecimal(halfAway(sae, BigInt(te.length) * 100)) / 1000000).toDouble
      assert(r.getDouble(5) === mae, s"mae $r")
      // held-out error stays in the same ballpark as the fit itself:
      // folds are exchangeable, so MAE is positive and finite
      assert(r.getDouble(5) > 0.0)
    }
  }

  test("q182: classifier separates the weak label well above the majority baseline") {
    val rows = MlQueries.qualityClassifier(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val pos = rows.map(_.getAs[Long]("n_label_pos")).sum
    val agree = rows.map(_.getAs[Long]("n_agree")).sum
    val kept = rows.map(_.getAs[Long]("n_pred_keep")).sum
    // the label rule must genuinely discriminate on this corpus (the
    // q112 probed-thresholds discipline) and the model must actually
    // restrict the corpus, not rubber-stamp everything
    assert(pos > 0 && pos < n, s"degenerate label: $pos/$n")
    assert(kept > 0 && kept < n, s"degenerate keep: $kept/$n")
    // separation witness: beat BOTH the majority-class baseline and a
    // fixed 80% bar — logistic regression on the very ratios the rule
    // thresholds must learn a useful boundary, else the export is noise
    val majority = math.max(pos, n - pos).toDouble / n
    assert(agree.toDouble / n > majority, s"agree=$agree/$n majority=$majority")
    assert(agree.toDouble / n > 0.80, s"agree=$agree/$n")
    // the exported coefficient row exists and is readable (the oracle's
    // read path), with the five serving columns
    val coefs = spark.read.parquet(MlQueries.qualityModelExportPath(Sf0001))
    assert(coefs.columns.toSeq ===
      Seq("w_n", "w_mwl", "w_ttr", "w_srat", "intercept"))
    assert(coefs.count() === 1)
  }
}
