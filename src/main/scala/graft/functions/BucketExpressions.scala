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

/** Compiled first-match CDF lookup for q241 (round-13, VERDICT r12
  * task 4): over `arr` = array<struct<v: long, cumall: long>> sorted
  * ascending by `v` with `cumall` STRICTLY INCREASING (a running sum of
  * positive counts), return the `v` of the FIRST element satisfying
  * n1 * cumall >= ntot * cums — exactly
  * `element_at(filter(arr, e -> CAST(n1 AS DECIMAL(38,0)) * e.cumall >=
  * CAST(ntot AS DECIMAL(38,0)) * cums), 1).v`, NULL when no element
  * matches (the HOF's element_at-on-empty under try semantics; by the
  * CDF algebra a match always exists at the array tail).
  *
  * Why compiled: the HOF `filter` dispatches an interpreted lambda with
  * a DECIMAL(38,0) multiply per ARRAY ELEMENT per row — |pooled CDF| ×
  * |(source, value)| interpreted big-decimal ops per pass (q241's 3.9 s
  * driver reading). The predicate is monotone along the array (cumall
  * ascending, n1 >= 0), so first-match IS the lower bound: one
  * O(log |arr|) binary search per row, with the product compare exact
  * in 128 bits (Math.multiplyHigh) — no decimal, no overflow.
  *
  * Null contract: NULL if any input is NULL (the HOF form propagates
  * nulls through the lambda/multiply the same way). Elements are
  * assumed non-null structs with non-null fields (they come from a
  * sort_array(collect_list(struct(...))) over non-null aggregates). */
case class CdfFirstAtLeast(arr: Expression, n1: Expression,
    ntot: Expression, cums: Expression) extends Expression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.LongType

  override def children: Seq[Expression] = Seq(arr, n1, ntot, cums)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "graft_cdf_first_at_least"

  override def eval(input: InternalRow): Any = {
    val a = arr.eval(input)
    val x1 = n1.eval(input)
    val xt = ntot.eval(input)
    val xc = cums.eval(input)
    if (a == null || x1 == null || xt == null || xc == null) null
    else {
      val ad = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val idx = CdfSearchKernel.firstAtLeast(ad,
        x1.asInstanceOf[Long], xt.asInstanceOf[Long], xc.asInstanceOf[Long])
      if (idx < 0) null else ad.getStruct(idx, 2).getLong(0)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val aG = arr.genCode(ctx)
    val n1G = n1.genCode(ctx)
    val ntG = ntot.genCode(ctx)
    val cuG = cums.genCode(ctx)
    val idx = ctx.freshName("cdfIdx")
    ev.copy(code = code"""
      ${aG.code}
      ${n1G.code}
      ${ntG.code}
      ${cuG.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${aG.isNull} && !${n1G.isNull} && !${ntG.isNull} && !${cuG.isNull}) {
        int $idx = graft.functions.CdfSearchKernel.firstAtLeast(
          ${aG.value}, ${n1G.value}, ${ntG.value}, ${cuG.value});
        if ($idx >= 0) {
          ${ev.value} = ${aG.value}.getStruct($idx, 2).getLong(0);
          ${ev.isNull} = false;
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(arr = newChildren(0), n1 = newChildren(1),
      ntot = newChildren(2), cums = newChildren(3))
}

object CdfSearchKernel {
  /** Exact a*b >= c*d for NON-NEGATIVE longs via the full 128-bit
    * products: high words via Math.multiplyHigh (non-negative operands
    * => the signed high word is the true high word), low words compared
    * unsigned. */
  def geProd(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) >= 0
  }

  /** Lower bound of (n1 * cumall >= ntot * cums) over the struct array
    * (field 1 = cumall, ascending), or -1 when no element satisfies. */
  def firstAtLeast(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      n1: Long, ntot: Long, cums: Long): Int = {
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (geProd(n1, arr.getStruct(mid, 2).getLong(1), ntot, cums)) hi = mid
      else lo = mid + 1
    }
    if (lo < arr.numElements()) lo else -1
  }
}
