package graft.soccer

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.TextFunctions.naturalSortKey

class IngestSpec extends SparkSuite {
  import spark.implicits._

  test("league map build: first-wins, season suffix stripped (D1-D3, D8)") {
    val raw = Normalize.readRaw(spark, fixturePath("2011-12") + "/*.json")
    val m = Ingest.buildLeagueMap(raw).as[(String, String)].collect().toMap
    assert(m("en") === "English Premier League")
    assert(m("de") === "Bundesliga")
  }

  test("natural sort key: sort -V semantics (A7 hard part)") {
    val names = Seq("en.1.json", "en.2.json", "en.10.json", "en.9.json")
    val sorted = names.toDF("f")
      .orderBy(naturalSortKey($"f"))
      .as[String].collect()
    assert(sorted === Array("en.1.json", "en.2.json", "en.9.json", "en.10.json"))
  }

  test("natural sort key property: order equals numeric order for vN") {
    val versions = (1 to 120).map(i => s"v$i")
    val sorted = new scala.util.Random(7).shuffle(versions).toDF("f")
      .orderBy(naturalSortKey($"f")).as[String].collect()
    assert(sorted === versions.toArray)
  }

  test("latest-version pick per key (A7/W4/T1, main.yml:136-141)") {
    val files = Seq(
      ("2011-12", "en", "en.1.json"),
      ("2011-12", "en", "en.2.json"),
      ("2011-12", "en", "en.10.json"),
      ("2011-12", "de", "de.3.json"),
    ).toDF("season_dir", "code", "file")
    val latest = Ingest.latestVersionPerKey(files, Seq("season_dir", "code"), "file")
      .select($"code", $"file").as[(String, String)].collect().toMap
    assert(latest("en") === "en.10.json")
    assert(latest("de") === "de.3.json")
  }

  test("season year extraction with fallback (D4)") {
    val df = Seq("2011-12", "archive").toDF("d")
      .select(Ingest.seasonYear($"d").as("y")).as[String].collect()
    assert(df === Array("2011", "archive"))
  }

  test("known-league whitelist skips unknown codes (P8)") {
    val files = Seq(("en", "a"), ("xx", "b")).toDF("code", "file")
    val lm = Seq(("en", "EPL")).toDF("code", "league")
    val kept = Ingest.filterKnownLeagues(files, lm).as[(String, String)].collect()
    assert(kept === Array(("en", "a")))
  }

  test("dedup against existing is idempotent (J3/A6, README.md:114)") {
    val existing = Seq(("sha1", "f1", 10L), ("sha1", "f2", 20L)).toDF("commit", "path", "v")
    val incoming = Seq(("sha1", "f2", 99L), ("sha2", "f2", 30L), ("sha2", "f2", 31L))
      .toDF("commit", "path", "v")
    val once = Ingest.dedupAgainst(incoming, existing, Seq("commit", "path"))
    assert(once.count() === 1) // only (sha2, f2), in-batch dup dropped
    val twice = Ingest.dedupAgainst(once, existing, Seq("commit", "path"))
    assert(twice.collect().toSet === once.collect().toSet)
    // after merging, a re-delivery of the same batch adds nothing
    val merged = existing.select($"commit", $"path").union(once.select($"commit", $"path"))
    assert(Ingest.dedupAgainst(incoming, merged, Seq("commit", "path")).count() === 0)
  }

  test("full ingest run: validates, picks sort -V latest, joins league names (§3.1)") {
    // fixtures/versions/2011-12 holds en.{1,2,10}.json; sort -V latest = en.10
    val root = fixturePath("versions")
    val out = Ingest.run(spark, root, sourceCommit = "shaX")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // only the latest version's matches survive (en.10: Matchday 10, ft 10-0)
    assert(rows.forall(_.getAs[String]("round") === "Matchday 10"))
    assert(rows.forall(_.getAs[Long]("ft_home") === 10L))
    // league name resolved through the built map (season suffix stripped)
    assert(rows.forall(_.getAs[String]("league") === "English Premier League"))
    assert(rows.forall(_.getAs[String]("source_commit") === "shaX"))
  }

  test("league config emit escapes JSON natively (D10, main.yml:87)") {
    val lm = Seq(("xx", """Liga "Especial" \ 2020""")).toDF("code", "league")
    val line = Ingest.leagueConfigJson(lm).as[String].head()
    assert(line === """{"code":"xx","league":"Liga \"Especial\" \\ 2020"}""")
    // and it parses back to the same value
    val back = spark.read.json(Seq(line).toDS).select($"league").as[String].head()
    assert(back === """Liga "Especial" \ 2020""")
  }

  test("partitioned clustered write round-trips (S5/S7)") {
    val raw = Normalize.readRaw(spark, fixturePath("2011-12") + "/*.json")
    val n = Normalize.normalize(raw, "sha1")
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    Ingest.writePartitioned(n, out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("league="))
    assert(dirs.toSet === Set("league=English Premier League", "league=Bundesliga"))
    val back = spark.read.parquet(out)
    assert(back.count() === n.count())
    // partition pruning: reading one league touches only its directory
    val pruned = back.filter($"league" === "Bundesliga")
    assert(pruned.count() === 2)
  }
}
