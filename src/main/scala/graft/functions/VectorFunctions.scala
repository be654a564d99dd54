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

  /** Cast array<float> -> array<double> (exact widening) — a native
    * array cast, not a per-element HOF lambda. */
  def toDouble(v: Column): Column = v.cast("array<double>")

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

  /** Deterministic plane weight in [-0.5, 0.5): splitmix64 finalizer of
    * (plane, dim) — pure driver-side arithmetic, so every executor and
    * every run derives identical planes with no RNG state or broadcast.
    * Shared with [[HyperplaneBuckets]]' kernel, which must produce
    * bit-identical buckets. */
  private[functions] def planeWeight(p: Int, d: Int): Double = {
    var z = p.toLong * 0x9E3779B97F4A7C15L + d.toLong + 0x7F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (java.lang.Math.floorMod(z, 1000000L).toDouble / 1000000.0) - 0.5
  }

  /** Random-hyperplane (SimHash) LSH signature for ANN bucketing.
    * Signature = integer in [0, 2^bits); vectors in the same bucket are
    * ANN candidates; cosine-rerank the bucket for the final answer.
    * `planeOffset` selects a disjoint plane set so multi-table LSH
    * (OR-amplification) can derive independent signatures.
    *
    * The planes are CONSTANTS: computed once on the driver and embedded
    * as literal arrays, so each bit is one codegen'd [[dotProduct]]
    * against a foldable array — the earlier formulation rebuilt the
    * plane via interpreted HOF lambdas (64 hash evals) per row per bit. */
  def hyperplaneSignature(v: Column, bits: Int, dims: Int, planeOffset: Int = 0): Column = {
    require(bits <= 30, "signature must fit an int")
    (0 until bits).map { i =>
      val plane = Array.tabulate(dims)(d => planeWeight(planeOffset + i, d))
      when(dotProduct(v, lit(plane)) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Every table's bucket in one fused kernel pass —
    * array<struct<tbl,bucket>>, bit-identical to `tables` separate
    * [[hyperplaneSignature]] columns at planeOffset = tbl*bits
    * ([[HyperplaneBuckets]]). */
  def hyperplaneBuckets(v: Column, bits: Int, tables: Int, dims: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(HyperplaneBuckets(
      org.apache.spark.sql.GraftSqlShim.expression(v), bits, tables, dims))
}
