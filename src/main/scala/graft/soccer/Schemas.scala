package graft.soccer

import org.apache.spark.sql.types._

/** Fixed, versioned schemas for the soccer pipeline (SURVEY §1.3-1.4).
  *
  * The reference validates records against an external schema and writes
  * Parquet with an explicit schema literal (/root/reference/README.md:107,
  * 231-243); its normalized table is README.md:66-84. Schemas here are
  * `StructType` constants — inputs are read with an explicit schema in
  * PERMISSIVE mode, never inferred at query time.
  */
object Schemas {
  val SchemaVersion = "v1"

  /** One match as it appears in openfootball JSON (both layouts). */
  val matchStruct: StructType = StructType(Seq(
    StructField("round", StringType),
    StructField("date", StringType),
    StructField("time", StringType),
    StructField("team1", StringType),
    StructField("team2", StringType),
    StructField("score", StructType(Seq(
      StructField("ht", ArrayType(LongType)),
      StructField("ft", ArrayType(LongType))))),
  ))

  /** Raw input: accepts layout B (top-level `matches`, README.md:208) and
    * layout A (`rounds[].matches[]`, main.yml:132) in one schema; a
    * `_corrupt_record` column captures invalid JSON (P6). */
  val rawSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("season", StringType),
    StructField("matches", ArrayType(matchStruct)),
    StructField("rounds", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("round", StringType),
      StructField("matches", ArrayType(matchStruct)))))),
    StructField("_corrupt_record", StringType),
  ))

  /** Normalized match record — README.md:66-84 verbatim (SURVEY §1.3).
    * `match_time` stays raw STRING ("raw if timezone unknown",
    * README.md:72); ht/ft columns are nullable LongType (missing ht is
    * semantic, README.md:61). */
  case class NormalizedMatch(
      league: String,
      season: String,
      round: String,
      match_date: java.sql.Date,
      match_time: String,
      team_home: String,
      team_away: String,
      ht_home: Option[Long],
      ht_away: Option[Long],
      ft_home: Option[Long],
      ft_away: Option[Long],
      winner: String,
      points_home: Option[Long],
      points_away: Option[Long],
      schema_version: String,
      source_commit: String,
      ingestion_ts: java.sql.Timestamp,
  )

  /** League code -> display name lookup row (config/leagues.json). */
  case class League(code: String, league: String)

  /** Team alias -> canonical name row (README.md:109 `team_aliases`). */
  case class TeamAlias(alias: String, canonical: String)
}
