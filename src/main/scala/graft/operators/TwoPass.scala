package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared first pass of the distributed two-pass rank family
  * (q91 ntile, q94 budget selection, q51 targeted quantiles): sampled
  * percentile boundaries over a value column, returned as the monotone
  * CASE-chain bucket function.
  *
  * One definition on purpose — the q62 sampleBucket lesson
  * ([[Curation.sampleBucket]]): a boundary/guard fix must land in one
  * place, not drift across per-query copies (the null-sketch guard
  * below originally existed in two of the three call sites and not the
  * third). */
private[graft] object TwoPass {

  /** Bucket function for `value` with ~`nBuckets` balanced buckets.
    *
    *  - Boundaries come from `percentile_approx` over a seeded 5%
    *    sample — cheap, deterministic, and BALANCE-ONLY: every
    *    consumer's exactness is independent of boundary quality
    *    (offsets are computed from real per-bucket counts afterwards).
    *  - A null sketch (the sample can be EMPTY on a tiny corpus, and
    *    its percentile is then NULL) degrades to one bucket — slower,
    *    never wrong.
    *  - Assignment is the codegen'd [[graft.functions.BoundaryBucket]]
    *    binary search: smallest i with boundary(i) >= v (so EQUAL
    *    values can never straddle a boundary — rank ties stay in one
    *    group), O(log buckets) per row at ANY bucket count. The
    *    earlier literal CASE chain was O(buckets) deep — fine at
    *    local[32], codegen blowup at the thousands of partitions a
    *    100 TB deployment sizes shuffles to.
    *  - Long inputs ride through a double cast: monotone and
    *    tie-preserving, which is all the consumers need from a
    *    balance-only bucketing. */
  def scoreBuckets(df: DataFrame, value: Column, nBuckets: Int): Column => Column = {
    val fracs = (1 until nBuckets.max(2)).map(_.toDouble / nBuckets.max(2)).toArray
    val bnds: Array[Double] = Option(
      df.filter(value.isNotNull)
        .sample(withReplacement = false, 0.05, seed = 42L)
        .agg(percentile_approx(value, lit(fracs), lit(2000)).as("b"))
        .head().getSeq[Any](0)).getOrElse(Seq.empty)
      .map {
        case l: Long => l.toDouble
        case d: Double => d
        case other => other.toString.toDouble
      }.toArray.sorted
    c => org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.BoundaryBucket(
        org.apache.spark.sql.GraftSqlShim.expression(c.cast("double")), bnds))
  }
}
