package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `hashed_ngram_buckets(text, nBuckets)` — the DSIR featurizer
  * (lowercase → trim → whitespace split → unigrams + adjacent bigrams →
  * md5 bucket per feature) as ONE native Catalyst expression.
  *
  * Bit-identical by construction to the r15 column composition
  * `transform(concat(toks, zip_with(...)), f -> conv(substring(md5(f),
  * 1, 8), 16, 10) % n)`: the string pipeline uses the same UTF8String
  * `toLowerCase`/`trim`/`split` primitives the Lower / StringTrim /
  * StringSplit expressions call, and the first 8 md5 hex digits as an
  * unsigned int equal the first 4 digest bytes big-endian. What it
  * removes is the interpreted-HOF tax the measured profile showed
  * dominating q221 (guide §1 / item 4 of the round brief): per feature,
  * the old chain allocated a 32-char hex string, a substring, and ran a
  * 4-node interpreted expression tree inside a lambda — per-element
  * dispatch with no codegen. Here featurization and hashing run as one
  * static JVM call per ROW (whole-stage-codegen'd at the row level),
  * digesting token bytes directly with a thread-local MessageDigest.
  */
case class HashedNgramBucketsExpression(child: Expression, nBuckets: Int)
  extends UnaryExpression {

  require(nBuckets > 0, "nBuckets must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_ngram_buckets"

  override protected def nullSafeEval(input: Any): Any =
    HashedNgramExpression.buckets(input.asInstanceOf[UTF8String], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedNgramExpression.buckets($c, $nBuckets)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedNgramExpression {

  private val splitPattern = UTF8String.fromString("\\s+")

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 4 digest bytes big-endian as an unsigned int, mod n — equal
    * to `conv(substring(md5(f), 1, 8), 16, 10) % n` (both non-negative).
    */
  private def bucketOf(d: MessageDigest, n: Int): Long = {
    val h = d.digest()
    val v = ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
      ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
    v % n
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def buckets(text: UTF8String, nBuckets: Int): ArrayData = {
    // tokens(lower(text)): lower, then trim, then regex split — the
    // exact operator chain of TextAnalysis.tokens via the same
    // UTF8String primitives, so token boundaries cannot drift
    val t = text.toLowerCase.trim
    if (t.numBytes == 0) return new GenericArrayData(Array.emptyLongArray)
    val toks = t.split(splitPattern, -1)
    val n = toks.length
    val out = new Array[Long](if (n >= 2) 2 * n - 1 else n)
    val d = md5.get()
    var i = 0
    while (i < n) {
      d.reset()
      d.update(toks(i).getBytes)
      out(i) = bucketOf(d, nBuckets)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      d.reset()
      d.update(toks(i).getBytes)
      d.update(' '.toByte)
      d.update(toks(i + 1).getBytes)
      out(n + i) = bucketOf(d, nBuckets)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: array<long> of md5 feature buckets in [0, nBuckets). */
  def hashed_ngram_buckets(text: Column, nBuckets: Int): Column =
    Bridge.column(HashedNgramBucketsExpression(Bridge.expression(text), nBuckets))
}
