package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (100 TB design point, SURVEY §7 risk 6).
  *
  * AQE's skew-join split handles most runtime skew on sort-merge joins;
  * these are the STATIC fallbacks for the cases AQE can't rewrite —
  * broadcast-infeasible dimension joins against a hot key, and
  * heavy-buffer aggregations (collect_list/set, typed Aggregators) where
  * one reducer would hold a whole hot group.
  */
object Skew {

  /** Deterministic salt in [0, salt): hashes the whole row, so the same
    * input always lands in the same bucket (rerun-stable, unlike rand()),
    * while distinct rows of a hot key spread across buckets.
    *
    * LIMITATION: a hot key whose rows are EXACT duplicates (repeated
    * identical events — a common real skew shape) all hash to one salt
    * bucket, degrading to the unsalted plan. When duplicate-heavy hot
    * keys are expected, pass `extra = Some(spark_partition_id())` to
    * [[saltedJoin]]/[[saltedAgg]]: the partition id disambiguates
    * physical copies at the cost of salt assignment depending on input
    * split layout (still correct — only bucket balance varies). */
  private[graft] def saltCol(df: DataFrame, salt: Int,
      extra: Option[Column] = None): Column = {
    val cols = df.columns.map(col).toIndexedSeq ++ extra
    pmod(xxhash64(struct(cols: _*)), lit(salt))
  }

  /** Salted equi-join: scatter the (possibly skewed) fact side into
    * `salt` sub-keys and replicate the dimension side once per sub-key.
    * Row-identical to a plain inner join on `key`; dimension shuffle
    * volume grows by `salt`x, each fact hot key shrinks by `salt`x. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
      extra: Option[Column] = None): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltCol(fact, salt, extra))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation for algebraic aggregates: partial
    * aggregate on (key, salt) — each hot group split `salt` ways — then
    * final combine on key. `partial` builds the per-(key,salt) partial
    * values; `combine` merges them per key. Example:
    * {{{
    * saltedAgg(df, "user_id", 8)(
    *   Seq(count(lit(1)).as("n"), sum($"v").as("s")),
    *   Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}} */
  def saltedAgg(df: DataFrame, key: String, salt: Int,
      extra: Option[Column] = None)(
      partial: Seq[Column], combine: Seq[Column]): DataFrame =
    df.withColumn("__salt", saltCol(df, salt, extra))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(combine.head, combine.tail: _*)
}
