package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.operators.{Clustering, Curation, Dedup, Derivations, Events, Indexes, MlQueries, Multimodal, Quality, Relational, Similarity, Soccer, Storage, StreamingQueries, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named
  * query here; each SQL-expressible one ships a DuckDB oracle in
  * [[oracleSql]] with identical column names/types (exact decimals,
  * explicit ordering) so the driver's hash compare is deterministic.
  */
object SparkEntry {
  /** Flagship query (standings, SURVEY §7 step 1) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.standings(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Derivations.queries ++ Events.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Soccer.queries ++ MlQueries.queries ++ StreamingQueries.queries ++
      Multimodal.queries ++ Storage.queries ++ Curation.queries ++
      Quality.queries ++ Indexes.queries ++ Clustering.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Derivations.oracles ++ Events.oracles ++
      TextAnalysis.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      Soccer.oracles ++ MlQueries.oracles ++ StreamingQueries.oracles ++
      Multimodal.oracles ++ Storage.oracles ++ Curation.oracles ++
      Quality.oracles ++ Indexes.oracles ++ Clustering.oracles
}
