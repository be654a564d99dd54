package graft.soccer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions.naturalSortKey

/** The ingest workflow port (reference .github/workflows/main.yml):
  * league-map build (pass 1, main.yml:56-97), validate/reorganize with
  * latest-version pick (pass 2, main.yml:110-153), plus the dedup and
  * partitioned-write semantics the spec demands (README.md:86-87,114).
  */
object Ingest {

  /** League code from a file path: leading letters of the basename
    * (D1, main.yml:57,119). */
  def leagueCode(pathCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(element_at(split(pathCol, "/"), -1), "^[a-zA-Z]+", 0)

  /** Season year from a directory name: leading 4 digits, else the raw
    * name (D4, main.yml:111-115 — note the empty-string-vs-null trap). */
  def seasonYear(dirCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(nullif(regexp_extract(dirCol, "^([0-9]{4})", 1), lit("")), dirCol)

  /** Pass 1: build the league code -> display-name map from raw records
    * (first file wins per code, main.yml:60-63). `first()` is
    * non-deterministic under parallelism, so the engine pins file order
    * with min_by over the source path (SURVEY §7 risk 4); display name =
    * record name stripped of season suffix (D2) and trimmed (D3). */
  def buildLeagueMap(raw: DataFrame): DataFrame =
    raw.filter(col("name").isNotNull)
      .withColumn("code", leagueCode(col("source_file")))
      .withColumn("league", Normalize.stripSeasonSuffix(col("name")))
      .filter(col("code") =!= "")
      .groupBy(col("code"))
      .agg(min_by(col("league"), col("source_file")).as("league"))

  /** Pass 2 latest-version pick (A7/T1, main.yml:136-141): among files
    * sharing (season dir, league prefix), keep the `sort -V` max —
    * natural numeric-aware order, so en.10.json > en.2.json. */
  def latestVersionPerKey(files: DataFrame, keyCols: Seq[String], nameCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(naturalSortKey(col(nameCol)).desc)
    files.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Known-league whitelist filter (P8, main.yml:144-148): left-semi
    * against the (broadcast) league map; unknown codes are skipped. */
  def filterKnownLeagues(df: DataFrame, leagueMap: DataFrame): DataFrame =
    df.join(broadcast(leagueMap.select("code")), Seq("code"), "left_semi")

  /** Idempotent load dedup (J3/A6, README.md:114): drop rows whose
    * lineage key already exists in the target (left anti), then drop
    * in-batch duplicates. */
  def dedupAgainst(newRows: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    newRows
      .join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .dropDuplicates(keys)

  /** Partitioned + clustered write (S5/S7, README.md:86-87): partition by
    * league/season (the staging layout), cluster within files by the
    * reference's clustering keys so parquet row-group stats give the same
    * data skipping BigQuery clustering does. */
  def writePartitioned(normalized: DataFrame, root: String): Unit =
    normalized
      .repartition(col("league"), col("season"))
      .sortWithinPartitions(col("league"), col("team_home"), col("team_away"))
      .write.mode("overwrite")
      .partitionBy("league", "season")
      .parquet(root)

  /** Emit the league map as JSON config lines (D10, main.yml:80-97):
    * `to_json` handles quote/backslash escaping natively — the part the
    * workflow does by hand at main.yml:87. One `{"code":..,"league":..}`
    * object per row; collect-side assembly into a single config file is
    * a driver concern (48 rows). */
  def leagueConfigJson(leagueMap: DataFrame): DataFrame =
    leagueMap.select(to_json(struct(col("code"), col("league"))).as("json"))

  /** The full ingest job (SURVEY §3.1): both workflow passes composed as
    * ONE Spark plan over `repoRoot/<seasonDir>/<file>.json`.
    *
    *   pass 1  league map: prefix regex -> first-wins display name
    *   pass 2  validate (corrupt / missing-required side-outputs),
    *           latest-version-per-(season,prefix) via sort -V window,
    *           known-league whitelist, normalize, stage
    *
    * Returns the normalized, league-joined frame; callers stage it with
    * [[writePartitioned]]. Control flow the workflow does per-file
    * becomes set operations: one scan, one broadcast, one window
    * shuffle — the EP1 lifecycle traced in SURVEY §3.1. */
  def run(spark: SparkSession, repoRoot: String, sourceCommit: String): DataFrame = {
    // localCheckpoint, not .cache(): repeated run() calls in a long
    // session would each pin one cache entry forever, while checkpoint
    // blocks free via the ContextCleaner once the returned frame is
    // unreachable (the runToTable discipline). Eager is fine — raw is
    // the ingest sample, and two passes (league map + valid) follow.
    val raw = Normalize.readRaw(spark, repoRoot + "/*/*.json").localCheckpoint(true)
    val leagueMap = buildLeagueMap(raw)
    // valid = parseable rows passing the SAME required-fields rule the
    // warn side-output uses (shared predicate — the two can't diverge)
    val valid = raw
      .filter(col("_corrupt_record").isNull && !Normalize.missingRequiredCond)
      .withColumn("code", leagueCode(col("source_file")))
      .withColumn("season_dir",
        element_at(split(col("source_file"), "/"), -2))
    val latest = latestVersionPerKey(valid, Seq("season_dir", "code"), "source_file")
    val known = filterKnownLeagues(latest, leagueMap)
    Normalize.normalize(known, sourceCommit)
      .withColumn("code", leagueCode(col("source_file")))
      // season fallback chain ends at the directory-derived year
      // (main.yml:111-115): record field > name suffix > season dir
      .withColumn("season",
        coalesce(col("season"),
          seasonYear(element_at(split(col("source_file"), "/"), -2))))
      .join(broadcast(leagueMap.withColumnRenamed("league", "league_name")),
        Seq("code"), "left")
      .withColumn("league", coalesce(col("league_name"), col("league")))
      .drop("league_name", "code")
  }

  /** Run-level observability (A5, README.md:112): row/error counters
    * attached via observe() — read from a QueryExecutionListener or the
    * returned map after an action. */
  def withMetrics(df: DataFrame): DataFrame =
    df.observe("ingest_metrics",
      count(lit(1)).as("n_rows"),
      count(col("_corrupt_record")).as("n_corrupt"),
      count(when(col("matches").isNull && col("rounds").isNull, 1)).as("n_missing_required"))
}
