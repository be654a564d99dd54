package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns ([EXT] X3, SURVEY
  * §2.11). The hot kernels (dot product, norm) are native Catalyst
  * expressions with `doGenCode` ([[graft.functions.DotProduct]]) — a
  * compiled primitive loop in whole-stage codegen, because the
  * higher-order-function formulation evaluates interpreted per element
  * and dominates run time when applied per candidate pair.
  *
  * Elements are widened float->double (exact) before any arithmetic so
  * results are reproducible across engines.
  */
object VectorFunctions {

  /** Cast array<float> -> array<double> (exact widening). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-to-right double dot product (codegen'd native expression). */
  def dotProduct(a: Column, b: Column): Column =
    GraftSqlShim.column(DotProduct(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** Euclidean norm (codegen'd native expression). */
  def l2Norm(v: Column): Column =
    GraftSqlShim.column(L2Norm(GraftSqlShim.expression(v)))

  /** Cosine similarity = dot(a,b) / (|a| * |b|). Inputs must be double
    * arrays (use [[toDouble]] for float embeddings). */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Random-hyperplane (SimHash) LSH signature for ANN bucketing: `bits`
    * pseudo-random hyperplanes, each derived deterministically from
    * xxhash64(plane, dim) — no RNG state, so executors agree on the
    * planes with no broadcast and re-runs are reproducible.
    * Signature = integer in [0, 2^bits). Vectors in the same bucket are
    * ANN candidates; cosine-rerank the bucket for the final answer.
    * `planeOffset` selects a disjoint plane set so multi-table LSH
    * (OR-amplification) can derive independent signatures. */
  def hyperplaneSignature(v: Column, bits: Int, dims: Int, planeOffset: Int = 0): Column = {
    require(bits <= 30, "signature must fit an int")
    // plane(p) . v  where plane(p)(d) = centered hash in [-0.5, 0.5)
    def planeDot(p: Int): Column =
      aggregate(
        zip_with(
          v,
          transform(sequence(lit(0), lit(dims - 1)),
            d => (pmod(xxhash64(lit(p), d), lit(1000000)).cast("double") / 1000000.0d) - 0.5d),
          (x, w) => x * w),
        lit(0.0d), (acc, x) => acc + x)
    (0 until bits).map(i => when(planeDot(planeOffset + i) >= 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)
  }
}
