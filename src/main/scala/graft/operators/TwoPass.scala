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
    *  - The chain compares with strict >=, so EQUAL values can never
    *    straddle a bucket boundary (rank ties stay inside one group).
    *  - A literal CASE chain, not an array HOF: interpreted HOFs get
    *    re-inlined into every downstream use by CollapseProject
    *    (NOTES trap) and fall out of whole-stage codegen. */
  def scoreBuckets(df: DataFrame, value: Column, nBuckets: Int): Column => Column = {
    val fracs = (1 until nBuckets.max(2)).map(_.toDouble / nBuckets.max(2)).toArray
    val bnds: Seq[Any] = Option(
      df.filter(value.isNotNull)
        .sample(withReplacement = false, 0.05, seed = 42L)
        .agg(percentile_approx(value, lit(fracs), lit(2000)).as("b"))
        .head().getSeq[Any](0)).getOrElse(Seq.empty)
    c => bnds.zipWithIndex.foldRight(lit(bnds.length): Column) {
      case ((b, i), rest) => when(lit(b) >= c, lit(i)).otherwise(rest)
    }
  }
}
