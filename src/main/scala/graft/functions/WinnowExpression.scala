package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fps(text, k, w)` — the winnowing fingerprint selection
  * (Schleimer et al. 2003) as ONE native per-row expression returning
  * `array<struct<pos:int, hv:bigint>>`.
  *
  * Bit-identical by construction to the r15 column composition in
  * Dedup.winnowArray: per char position `i` (1-based, code points) the
  * k-gram hash is the first 8 md5 hex digits of
  * `cast(lower(substr(text, i, k)) as binary)` as an unsigned int
  * (computed here as the first 4 digest bytes big-endian over the same
  * UTF-8 bytes); each width-`w` hash window (one truncated window when
  * fewer than `w` hashes exist) selects its RIGHTMOST minimum; selected
  * `(pos, hv)` pairs deduplicate keeping first occurrence in start
  * order — exactly `array_distinct` over the transform's output.
  *
  * What it removes: the old chain ran an interpreted
  * md5→hex→substring→conv tree per CHARACTER of the corpus, then a
  * per-window-start lambda allocating a slice and folding an
  * `aggregate(sequence(...))` per start — measured 110 s cold for the
  * q156 match step at sf0.1. Here hashing and winnowing run as one
  * static call per row inside whole-stage codegen, with a rolling
  * rightmost-min scan instead of a per-start rescan.
  */
case class WinnowExpression(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k > 0 && w > 0, "k-gram size and window must be positive")

  override def dataType: DataType = WinnowExpression.schema
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowExpression.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowExpression.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpression {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("hv", LongType, nullable = false))), containsNull = false)

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code
    * (not named `eval`: the case class inherits Expression.eval, which
    * would suppress the static forwarder the generated code calls).
    */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    // one pass over the UTF-8 bytes collects code-point start offsets,
    // so gram i slices bytes directly — substringSQL(i, k) would
    // re-seek from the string start per gram, O(m²) byte scans on long
    // documents
    val len = text.numChars()
    val m = len - k + 1
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](len + 1)
    var b = 0
    var cp = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xC0) != 0x80) { off(cp) = b; cp += 1 }
      b += 1
    }
    off(len) = bytes.length
    val d = md5.get()
    val hv = new Array[Long](m)
    var i = 0
    while (i < m) {
      // lower(substr(text, i+1, k)) over code points, hashed as UTF-8
      // bytes — the exact operand chain of the old column form
      val gram = UTF8String.fromBytes(bytes, off(i), off(i + k) - off(i))
        .toLowerCase
      d.reset()
      d.update(gram.getBytes)
      val h = d.digest()
      hv(i) = ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
        ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
      i += 1
    }
    // windows start at p0 = 0..nw-1 (nw = max(m-w+1, 1)); each selects
    // the RIGHTMOST minimum of hv[p0, p0+w) clamped to m; dedup by
    // position (the hash is position-determined), keeping start order
    val nw = math.max(m - w + 1, 1)
    val taken = new Array[Boolean](m)
    val posOut = new Array[Int](nw)
    var nOut = 0
    var p0 = 0
    while (p0 < nw) {
      val end = math.min(p0 + w, m)
      var best = p0
      var j = p0 + 1
      while (j < end) {
        if (hv(j) <= hv(best)) best = j // rightmost on ties
        j += 1
      }
      if (!taken(best)) {
        taken(best) = true
        posOut(nOut) = best
        nOut += 1
      }
      p0 += 1
    }
    val out = new Array[Any](nOut)
    var o = 0
    while (o < nOut) {
      val p = posOut(o)
      out(o) = new GenericInternalRow(Array[Any](p + 1, hv(p)))
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: the winnowing fingerprint set. */
  def winnow_fps(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowExpression(Bridge.expression(text), k, w))
}
