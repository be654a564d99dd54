package graft.soccer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The season_results table (reference README.md:251-266) done right:
  * the reference's SQL sketch is acknowledged broken ("needs conditional
  * aggregation per team", README.md:268) — the fix is the home/away
  * unpivot (SO1) before grouping (A1-A3), then champion labeling
  * (A4/W1, README.md:276) with the classic tiebreak chain (T2).
  */
object Standings {

  /** Unpivot: one row per (match, participating team) — home and away
    * perspectives unioned (SO1). */
  def perTeam(normalized: DataFrame): DataFrame = {
    val home = normalized.select(
      col("league"), col("season"), col("team_home").as("team"),
      col("points_home").as("points"),
      col("ft_home").as("goals_for"), col("ft_away").as("goals_against"),
      col("winner"), lit("home").as("side"))
    val away = normalized.select(
      col("league"), col("season"), col("team_away").as("team"),
      col("points_away").as("points"),
      col("ft_away").as("goals_for"), col("ft_home").as("goals_against"),
      col("winner"), lit("away").as("side"))
    home.unionByName(away)
  }

  /** Full league table per (league, season): played/W/D/L/GF/GA/GD/points,
    * rank, champion flag. Unplayed matches (null winner/points) don't
    * count toward played/W/D/L/points, but still surface their teams as
    * zero-point rows, so a season's table lists every entered team. */
  def seasonResults(normalized: DataFrame): DataFrame = {
    val pt = perTeam(normalized)
    val won = (col("winner") === "home" && col("side") === "home") ||
      (col("winner") === "away" && col("side") === "away")
    val lost = (col("winner") === "home" && col("side") === "away") ||
      (col("winner") === "away" && col("side") === "home")
    val agg = pt.groupBy(col("league"), col("season"), col("team"))
      .agg(
        count(col("winner")).as("played"),
        sum(when(won, 1L).otherwise(0L)).as("wins"),
        sum(when(col("winner") === "draw", 1L).otherwise(0L)).as("draws"),
        sum(when(lost, 1L).otherwise(0L)).as("losses"),
        coalesce(sum(col("goals_for")), lit(0L)).as("goals_for"),
        coalesce(sum(col("goals_against")), lit(0L)).as("goals_against"),
        coalesce(sum(col("points")), lit(0L)).as("points"))
      .withColumn("goal_diff", col("goals_for") - col("goals_against"))
    val w = Window.partitionBy(col("league"), col("season"))
      .orderBy(col("points").desc, col("goal_diff").desc,
        col("goals_for").desc, col("team"))
    agg
      .withColumn("rank", row_number().over(w))
      .withColumn("is_champion", col("rank") === 1)
  }

  /** Previous-season points/champion features (J5/W2, README.md:143) —
    * lag over the per-team season series, for the ML baselines. */
  def withPreviousSeason(seasonResults: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("league"), col("team")).orderBy(col("season"))
    seasonResults
      .withColumn("prev_points", lag(col("points"), 1).over(w))
      .withColumn("prev_rank", lag(col("rank"), 1).over(w))
      .withColumn("prev_champion", lag(col("is_champion"), 1).over(w))
  }
}
