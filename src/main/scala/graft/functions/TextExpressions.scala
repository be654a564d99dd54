package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling-fingerprint kernel for q46: min over the xxhash64 of
  * every `k`-char gram of the text.
  *
  * Why not the HOF formulation (`transform(sequence(...), i ->
  * xxhash64(substr(text, i, k)))` + explode + min): higher-order
  * functions evaluate interpreted — one lambda dispatch per gram, ~1000
  * per document — and the explode shape then shuffles a row per gram
  * into the per-doc min aggregate. This expression computes the same
  * min in one compiled loop per row inside whole-stage codegen (same
  * rationale as [[DotProduct]]), and the explode/agg pass disappears
  * from the plan entirely.
  *
  * Semantics are bit-identical to the HOF form (pinned in
  * TextAnalysisSpec): 1-based char windows, `max(numChars - k + 1, 1)`
  * windows (so texts shorter than `k` hash their whole content once),
  * Spark's xxhash64 seed 42 over the gram's UTF-8 bytes.
  */
case class RollingMinHash(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"gram size must be >= 1, got $k")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_minhash"

  override def nullSafeEval(s: Any): Any =
    RollingHashKernel.minGram(s.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.RollingHashKernel.minGram($t, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static kernel shared by interpreted eval and generated code.
  * Hashes each gram's byte slice IN PLACE (no per-gram UTF8String
  * allocation): one pass records the byte offset of every char, then
  * each window hashes `[charOff(i), charOff(i+k))` directly — the same
  * bytes `substr(text, i+1, k)` would copy, so the hash is identical
  * to `xxhash64(substr(...))` (pinned in StorageSpec, incl. the SQL
  * surface). */
object RollingHashKernel {
  def minGram(t: UTF8String, k: Int): Long = {
    val nBytes = t.numBytes()
    val bytes = t.getBytes // may copy if unaligned; one copy per row max
    // charOffs(i) = byte offset where char i starts; charOffs(n) = end
    val nChars = t.numChars()
    val charOffs = new Array[Int](nChars + 1)
    var b = 0
    var c = 0
    while (b < nBytes) {
      charOffs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    charOffs(nChars) = nBytes
    val windows = math.max(nChars - (k - 1), 1)
    var min = Long.MaxValue
    var i = 0
    while (i < windows) {
      val start = charOffs(i)
      val end = charOffs(math.min(i + k, nChars))
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
        end - start, 42L)
      if (h < min) min = h
      i += 1
    }
    min
  }
}
