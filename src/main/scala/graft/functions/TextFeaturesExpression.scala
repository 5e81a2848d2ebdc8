package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_trigrams(text)` — the DISTINCT character trigrams of a string
  * as ONE native per-row expression (first-occurrence order; empty
  * array under 3 characters).
  *
  * Replaces the r16 q149 blocking-key derivation
  * `filter(length >= 3).select(explode(sequence(1, length-2)))
  *  .select(name.substr(i, 3)).distinct()`:
  * the per-position `substr` re-seeks code points from the string
  * start (O(n²) byte scans per row), the Generate carries the full
  * name once per position, and — the expensive part — the DISTINCT is
  * a corpus-grain SHUFFLE whose only job is within-row dedup (trigram
  * sets are per id; ids are unique). Here one pass builds a code-point
  * offset table, slices each trigram's bytes directly, dedups in a
  * per-row hash set, and the shuffle is gone. Code-point semantics
  * match SQL `substr` exactly, so the oracle agrees on non-ASCII.
  */
case class CharTrigramsExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"

  override protected def nullSafeEval(input: Any): Any =
    CharTrigramsExpression.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharTrigramsExpression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharTrigramsExpression {

  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val len = text.numChars()
    val m = len - 2
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](len + 1)
    var b = 0; var cp = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xC0) != 0x80) { off(cp) = b; cp += 1 }
      b += 1
    }
    off(len) = bytes.length
    val seen = new java.util.HashSet[UTF8String](math.min(m * 2, 64))
    val out = new java.util.ArrayList[Any](math.min(m, 32))
    var i = 0
    while (i < m) {
      val g = UTF8String.fromBytes(bytes, off(i), off(i + 3) - off(i))
      if (seen.add(g)) out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: array<string> of distinct character trigrams. */
  def char_trigrams(text: Column): Column =
    Bridge.column(CharTrigramsExpression(Bridge.expression(text)))
}

/** `token_counts(text)` — per-document term frequencies as ONE native
  * per-row expression: `array<struct<term string, tf long>>` over the
  * engine's whitespace tokenization (first-occurrence order).
  *
  * Replaces the wordcount head of the TF-IDF tier
  * (`explode(tokens(lower(text)))` → `groupBy(id, term).count()`):
  * per-document counting needs no cross-row state, so the (id, term)
  * SHUFFLE — corpus-token-grain, the biggest exchange of q105's plan —
  * is within-row work, and the Generate that follows emits one row per
  * DISTINCT term per doc instead of one per token occurrence.
  * Tokenization is the exact `tokens()` contract: trim, split on \s+,
  * whitespace-only text yields an empty array (no rows after explode).
  */
case class TokenCountsExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenCountsExpression.schema
  override def prettyName: String = "token_counts"

  override protected def nullSafeEval(input: Any): Any =
    TokenCountsExpression.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenCountsExpression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCountsExpression {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  private val splitPattern = UTF8String.fromString("\\s+")

  def compute(text: UTF8String): ArrayData = {
    val trimmed = text.trim()
    if (trimmed.numBytes == 0) return new GenericArrayData(Array.empty[Any])
    val toks = trimmed.split(splitPattern, -1)
    // first-occurrence order keeps the output deterministic per row;
    // downstream grouping is order-insensitive
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val c = counts.get(t)
      counts.put(t, if (c == null) 1L else c + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = new GenericInternalRow(Array[Any](e.getKey, e.getValue.longValue()))
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: array<struct<term, tf>> per-row term frequencies. */
  def token_counts(text: Column): Column =
    Bridge.column(TokenCountsExpression(Bridge.expression(text)))
}
