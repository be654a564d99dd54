package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** All multi-table hyperplane-LSH bucket assignments in ONE compiled
  * pass per row (q34/q44/q59's signature stage): for each of `tables`
  * tables, bit i of the bucket is the sign of the embedding's dot
  * product with deterministic plane `t*bits + i`. Bit-identical to
  * `tables` separate [[VectorFunctions.hyperplaneSignature]] columns
  * (same [[VectorFunctions.planeWeight]] planes; pinned in
  * SimilaritySpec) — but the plane matrix is walked as one cache-
  * friendly loop instead of `tables*bits` independent DotProduct
  * expressions each re-reading the array column.
  *
  * Ragged/short vectors use the shorter-prefix semantics of
  * [[DotProduct]]. Null embedding -> null result, which `explode`
  * drops — a DELIBERATE semantic upgrade over the per-table columns it
  * replaced (those swallowed the null dot product into bucket 0 of
  * every table, making a null embedding a candidate everywhere). */
case class HyperplaneBuckets(child: Expression, bits: Int, tables: Int, dims: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 30 && tables >= 1, s"bad params bits=$bits tables=$tables")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tbl", IntegerType, nullable = false),
    StructField("bucket", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_hyperplane_buckets"

  // resolved once per expression instance — NOT per row; pure function
  // of (bits, tables, dims), so executor-side re-derivation after
  // serialization yields identical planes
  @transient private lazy val planeMatrix: Array[Double] =
    HyperplaneKernel.planes(bits, tables, dims)

  override def nullSafeEval(v: Any): Any =
    HyperplaneKernel.buckets(v.asInstanceOf[ArrayData], planeMatrix, bits, tables, dims)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("hyperplanes", planeMatrix, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HyperplaneKernel.buckets($a, $planesRef, $bits, $tables, $dims);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneKernel {
  /** Plane matrix for (bits, tables, dims), flattened row-major:
    * plane p (= t*bits + i) occupies [p*dims, (p+1)*dims). Derived from
    * the pure planeWeight function, so caching per-JVM is just
    * memoization — executors and driver agree by construction. */
  private val planeCache = new ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private[functions] def planes(bits: Int, tables: Int, dims: Int): Array[Double] =
    planeCache.computeIfAbsent((bits, tables, dims), { case (b, t, d) =>
      val m = new Array[Double](t * b * d)
      var p = 0
      while (p < t * b) {
        var k = 0
        while (k < d) { m(p * d + k) = VectorFunctions.planeWeight(p, k); k += 1 }
        p += 1
      }
      m
    })

  def buckets(v: ArrayData, m: Array[Double], bits: Int, tables: Int, dims: Int): ArrayData = {
    val n = math.min(dims, v.numElements())
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var i = 0
      while (i < bits) {
        val base = (t * bits + i) * dims
        var s = 0.0
        var k = 0
        while (k < n) { s += v.getDouble(k) * m(base + k); k += 1 }
        if (s >= 0) bucket |= 1 << i
        i += 1
      }
      out(t) = new GenericInternalRow(Array[Any](t, bucket))
      t += 1
    }
    new GenericArrayData(out)
  }
}
