package graft.soccer

import org.apache.spark.sql.functions._

import graft.SparkSuite

class StandingsSpec extends SparkSuite {
  import spark.implicits._

  lazy val normalized = {
    val raw = Normalize.readRaw(spark, fixturePath("2011-12") + "/*.json")
    val aliases = Seq(("Arsenal", "Arsenal FC")).toDF("alias", "canonical")
    Normalize.standardizeTeams(Normalize.normalize(raw, "sha1"), aliases)
  }
  lazy val table = Standings.seasonResults(normalized).cache()

  case class TRow(team: String, played: Long, wins: Long, draws: Long, losses: Long,
      gf: Long, ga: Long, points: Long, rank: Int, champ: Boolean)

  def epl: Map[String, TRow] =
    table.filter($"league" === "English Premier League")
      .select($"team", $"played", $"wins", $"draws", $"losses",
        $"goals_for", $"goals_against", $"points", $"rank", $"is_champion")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Int, Boolean)]
      .collect()
      .map(t => t._1 -> TRow(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9, t._10))
      .toMap

  test("golden EPL standings (SO1 + A1-A4 + T2; fixes README.md:268)") {
    val t = epl
    assert(t("Liverpool FC") === TRow("Liverpool FC", 4, 2, 2, 0, 5, 3, 8, 1, true))
    assert(t("Arsenal FC") === TRow("Arsenal FC", 3, 1, 1, 1, 6, 5, 4, 2, false))
    assert(t("Chelsea FC") === TRow("Chelsea FC", 3, 0, 1, 2, 1, 4, 1, 3, false))
  }

  test("golden Bundesliga standings with name tiebreak") {
    val de = table.filter($"league" === "Bundesliga")
      .orderBy($"rank").select($"team", $"points", $"rank", $"is_champion")
      .as[(String, Long, Int, Boolean)].collect()
    assert(de === Array(
      ("Bayern Munich", 3L, 1, true),
      ("Hamburger SV", 1L, 2, false),
      ("Schalke 04", 1L, 3, false),
      ("Borussia Dortmund", 0L, 4, false)))
  }

  test("points conservation: total = 3*decided + 2*draws (SO1 bookkeeping)") {
    val played = normalized.filter($"winner".isNotNull)
    val decided = played.filter($"winner" =!= "draw").count()
    val draws = played.filter($"winner" === "draw").count()
    val total = table.agg(sum($"points")).as[Long].head()
    assert(total === 3 * decided + 2 * draws)
  }

  test("per-team unpivot conserves matches: sum(played) = 2 * played matches") {
    val playedMatches = normalized.filter($"winner".isNotNull).count()
    val sumPlayed = table.agg(sum($"played")).as[Long].head()
    assert(sumPlayed === 2 * playedMatches)
  }

  test("exactly one champion per (league, season) (A4/W1)") {
    val champs = table.filter($"is_champion")
      .groupBy($"league", $"season").count()
    assert(champs.filter($"count" =!= 1).count() === 0)
    assert(champs.count() === 2)
  }

  test("previous-season lag features (J5/W2)") {
    val twoSeasons = normalized.union(
      normalized.withColumn("season", lit("2012/13")))
    val withPrev = Standings.withPreviousSeason(Standings.seasonResults(twoSeasons))
    val lfc = withPrev.filter($"team" === "Liverpool FC" && $"season" === "2012/13").head()
    assert(lfc.getAs[Long]("prev_points") === 8L)
    assert(lfc.getAs[Boolean]("prev_champion") === true)
    val first = withPrev.filter($"team" === "Liverpool FC" && $"season" === "2011/12").head()
    assert(first.isNullAt(first.fieldIndex("prev_points")))
  }
}
