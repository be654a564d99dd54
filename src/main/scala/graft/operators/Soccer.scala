package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.soccer.{Normalize, Standings}

/** End-to-end soccer pipeline demo exposed through the harness: embedded
  * openfootball-shaped records (both layouts + dirt) -> normalize ->
  * alias-standardize -> season standings. No oracle (input is inline,
  * not an sfDir table); golden values are pinned by SoccerSpec.
  */
object Soccer {

  // Both openfootball layouts (SURVEY §1.2) plus reference-documented
  // dirt: ft-only scores, missing time, an unplayed match, an alias
  // team name (README.md:61-63).
  private[graft] val sampleRecords: Seq[String] = Seq(
    """{"name":"English Premier League 2011/12","matches":[
      |{"round":"Matchday 1","date":"2011-08-13","time":"15:00","team1":"Arsenal FC","team2":"Liverpool FC","score":{"ht":[0,0],"ft":[1,2]}},
      |{"round":"Matchday 1","date":"2011-08-13","team1":"Chelsea FC","team2":"Liverpool FC","score":{"ft":[0,0]}},
      |{"round":"Matchday 2","date":"2011-08-20","team1":"Arsenal FC","team2":"Chelsea FC","score":{"ht":[2,0],"ft":[3,1]}},
      |{"round":"Matchday 2","date":"2011-08-21","time":"17:30","team1":"Liverpool FC","team2":"Arsenal","score":{"ft":[2,2]}},
      |{"round":"Matchday 3","date":"2011-08-27","team1":"Liverpool FC","team2":"Chelsea FC","score":{"ft":[1,0]}},
      |{"round":"Matchday 3","date":"2011-08-28","team1":"Chelsea FC","team2":"Arsenal FC"}]}""".stripMargin.replaceAll("\n", ""),
    """{"name":"Bundesliga 2015/16","rounds":[
      |{"name":"Spieltag 1","matches":[
      |{"date":"2015-08-14","team1":"Bayern Munich","team2":"Borussia Dortmund","score":{"ft":[2,0]}},
      |{"date":"2015-08-15","team1":"Schalke 04","team2":"Hamburger SV","score":{"ht":[0,1],"ft":[1,1]}}]}]}""".stripMargin.replaceAll("\n", ""),
  )

  private[graft] val sampleAliases: Seq[(String, String)] =
    Seq(("Arsenal", "Arsenal FC"), ("Man Utd", "Manchester United FC"))

  /** Q36: the full reference pipeline in one plan. */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Normalize.fromJsonStrings(spark, sampleRecords)
    val aliases = sampleAliases.toDF("alias", "canonical")
    val normalized = Normalize.standardizeTeams(
      Normalize.normalize(raw, sourceCommit = "fixedsha"), aliases)
    Standings.seasonResults(normalized)
      .orderBy(col("league"), col("season"), col("rank"))
  }

  def queries: Map[String, Relational.Q] = Map(
    "q36_soccer_pipeline" -> (pipeline _),
  )
}
