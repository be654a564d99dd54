package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch threshold probe for q107 (frequency-threshold gram
  * mining): `estimate(value) >= threshold`, evaluated per row against a
  * driver-built sketch riding as a reference object (the BloomProbe
  * discipline — never a plan literal).
  *
  * The sketch field is the SERIALIZED bytes (stable Java serialization
  * surface); each task deserializes once into a transient lazy val.
  * Ingestion parity with Spark's `count_min_sketch` aggregate: the agg
  * feeds string inputs as UTF-8 bytes (`addBinary`), so the probe
  * estimates over the same bytes — CmsSpec/IndexesSpec assert
  * `estimate >= exact` for every value, which any hash-path mismatch
  * would break immediately (a mismatch UNDERestimates, and CMS can
  * never underestimate). */
case class CmsAtLeast(child: Expression, sketchBytes: Array[Byte], threshold: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(threshold >= 1, s"threshold must be >= 1, got $threshold")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_cms_at_least"

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(sketchBytes)

  override def nullSafeEval(s: Any): Any =
    sketch.estimateCount(s.asInstanceOf[UTF8String].getBytes) >= threshold

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // deserialize once per codegen'd operator instance (lazy null-check:
    // runs on the first row of each task, not per row)
    val sk = ctx.addMutableState(classOf[CountMinSketch].getName, "cmsSketch",
      forceInline = true)
    val bytesRef = ctx.addReferenceObj("cmsBytes", sketchBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"""if ($sk == null) {
         |  $sk = org.apache.spark.util.sketch.CountMinSketch.readFrom($bytesRef);
         |}
         |${ev.value} = $sk.estimateCount($t.getBytes()) >= ${threshold}L;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsFunctions {
  def cmsAtLeast(v: Column, sketchBytes: Array[Byte], threshold: Long): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      CmsAtLeast(org.apache.spark.sql.GraftSqlShim.expression(v), sketchBytes, threshold))
}
