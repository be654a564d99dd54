package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ml.ChampionModel

/** M1-M4 surfaced through the harness: the champion-classification path
  * run on the TPC-H-shaped standings (nation = team, order-year =
  * season). No oracle — model output isn't SQL — but fully
  * deterministic (LBFGS), so the rows-only check is stable; MlSpec
  * asserts quality floors.
  */
object MlQueries {

  /** Q37: train on all seasons but the last, predict the last season's
    * champion; emit per-team probability rank.
    *
    * Serving is a codegen'd Column expression over the fitted
    * coefficients (sigmoid of the linear form) — the production serving
    * pattern: `model.transform` drags the whole PipelineModel (and a
    * vector UDF) into every task closure, while the coefficient vector
    * is a handful of driver-side doubles. Training itself is the real
    * spark.ml path (M1); MlSpec exercises the full transform/evaluate
    * surface. */
  def championPrediction(spark: SparkSession, dir: String): DataFrame = {
    val standings = Relational.standings(spark, dir)
      .select(
        lit("tpch").as("league"),
        col("season").cast("string").as("season"),
        col("team"),
        col("points").cast("double").as("points"),
        col("goal_value").cast("double").as("goal_diff"),
        col("rank"),
        (col("rank") === 1).as("is_champion"))
    // the feature frame is tiny (teams x seasons, ~175 rows at sf0.1)
    // but downstream of a 32-partition shuffle: coalesce(1) makes every
    // LBFGS pass a single task instead of a 32-task job — training is
    // driver-coordinated iteration, so scheduling dominates at this size
    // (a genuinely large feature frame would keep its partitioning)
    val featured = ChampionModel.features(standings).coalesce(1).cache()
    val lastSeason = featured.agg(max(col("season"))).head().getString(0)
    def emptyResult() = {
      featured.unpersist()
      featured.select(col("season"), col("team"),
        lit(0L).as("pred_rank"), lit(0L).as("actual_champion")).limit(0)
    }
    // degenerate inputs: no featured rows at all, or featured rows in
    // only one season (no training data) — empty contract-schema frame,
    // not a fit crash
    if (lastSeason == null) return emptyResult()
    val train = featured.filter(col("season") < lastSeason)
    val test = featured.filter(col("season") === lastSeason)
    if (train.isEmpty) return emptyResult()
    val fitted = ChampionModel.pipeline().fit(train)
    // the cache existed for LBFGS's repeated passes over train; the
    // returned frame recomputes test once without it
    featured.unpersist()
    val lr = fitted.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    // features order matches ChampionModel.featureCols; VectorAssembler
    // with handleInvalid=keep maps null -> NaN, mirrored via coalesce
    val margin = ChampionModel.featureColumns.zipWithIndex.map { case (c, i) =>
      coalesce(col(c), lit(Double.NaN)) * lr.coefficients(i)
    }.reduce(_ + _) + lr.intercept
    val prob1 = lit(1.0) / (lit(1.0) + exp(-margin))
    val w = Window.partitionBy(col("league"), col("season")).orderBy(prob1.desc, col("team"))
    test
      .withColumn("pred_rank", row_number().over(w).cast("bigint"))
      .select(col("season"), col("team"), col("pred_rank"),
        col("label").cast("bigint").as("actual_champion"))
      .orderBy(col("pred_rank"))
  }

  def queries: Map[String, Relational.Q] = Map(
    "q37_ml_champion" -> (championPrediction _),
  )
}
