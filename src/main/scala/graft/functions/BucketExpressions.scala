package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Boundary-bucket assignment for the distributed two-pass rank family
  * ([[graft.operators.TwoPass]]): bucket(v) = smallest i with
  * boundaries(i) >= v, else boundaries.length — as ONE codegen'd binary
  * search instead of a literal CASE chain. The chain's depth equals the
  * bucket count, which is fine at local[32]'s 32 buckets but a
  * thousands-deep nested expression (codegen blowup, O(buckets)
  * comparisons per row) at the partition counts a 100 TB deployment
  * runs; the search is O(log buckets) per row at any count.
  *
  * Correctness contract (property-pinned in PropertySpec): boundaries
  * are SORTED ascending, so the function is monotone in `v` and equal
  * values always share a bucket — ties can never straddle a rank-group
  * boundary. Values arrive cast to double; for long inputs the cast is
  * monotone and tie-preserving, which is all the consumers need
  * (boundaries shape BALANCE only — exactness comes from real
  * per-bucket counts downstream). Null in -> null out. */
case class BoundaryBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(boundaries.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
    "boundaries must be sorted ascending")

  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_boundary_bucket"

  override def nullSafeEval(v: Any): Any =
    BoundaryBucketKernel.bucket(boundaries, v.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.BoundaryBucketKernel.bucket($ref, $x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BoundaryBucketKernel {
  /** Lower bound of (b >= v) over the sorted boundary array. */
  def bucket(b: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) >= v) hi = mid else lo = mid + 1
    }
    lo
  }
}
