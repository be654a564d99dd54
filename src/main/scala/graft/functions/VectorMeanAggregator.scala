package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator for element-wise vector mean (SURVEY §2.12's
  * `Aggregator[IN, BUF, OUT]` slot): centroid of an embedding column in
  * ONE hash aggregate with map-side partial combine.
  *
  * The alternative pure-SQL shape (posexplode to (label, dim, value) ->
  * per-dim aggregate -> collect_list reassembly) shuffles `dims` rows
  * per input row and needs a second shuffle to reassemble; this buffer
  * carries a single running double[] + count, so the shuffle moves one
  * row per (group, partition) — the layout that survives a 100 TB
  * corpus with millions of groups.
  *
  * Buffer/row widening: input may be float or double arrays; sums are
  * exact double over float inputs, left-to-right within a partition and
  * combined in partition order — deterministic under AQE because merge
  * is associative on the partial sums and counts.
  */
object VectorMeanAggregator
    extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  /** Element-wise sum into the LONGER array (shorter inputs contribute
    * to their prefix; missing dims count as 0) so ragged inputs are
    * never silently truncated to whichever vector arrived first. */
  private def addInto(a: Array[Double], b: Array[Double]): Array[Double] = {
    val (long, short) = if (a.length >= b.length) (a, b) else (b.clone(), a)
    var i = 0
    while (i < short.length) { long(i) += short(i); i += 1 }
    long
  }

  override def reduce(b: (Array[Double], Long), v: Array[Double]): (Array[Double], Long) = {
    val (sum, n) = b
    if (v == null || v.isEmpty) b // empty rows contribute nothing, including to the count
    else if (sum.isEmpty) (v.clone(), n + 1)
    else (addInto(sum, v), n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else (addInto(a._1, b._1), a._2 + b._2)

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) Array.emptyDoubleArray else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
