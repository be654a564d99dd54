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
    * champion; emit per-team probability rank. */
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
    val featured = ChampionModel.features(standings).cache()
    val lastSeason = featured.agg(max(col("season"))).head().getString(0)
    val train = featured.filter(col("season") < lastSeason)
    val test = featured.filter(col("season") === lastSeason)
    val model = ChampionModel.fitServing(train)
    val prob1 = element_at(org.apache.spark.ml.functions.vector_to_array(col("probability")), 2)
    val w = Window.partitionBy(col("league"), col("season")).orderBy(prob1.desc, col("team"))
    model.transform(test)
      .withColumn("champion_prob", round(prob1, 6))
      .withColumn("pred_rank", row_number().over(w).cast("bigint"))
      .select(col("season"), col("team"), col("pred_rank"),
        col("label").cast("bigint").as("actual_champion"))
      .orderBy(col("pred_rank"))
  }

  def queries: Map[String, Relational.Q] = Map(
    "q37_ml_champion" -> (championPrediction _),
  )
}
