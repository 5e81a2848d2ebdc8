package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, k)` — word k-shingles of a text column as ONE
  * native per-row expression.
  *
  * Bit-identical by construction to the r15 column composition
  * `when(size(toks) < k, array(concat_ws(" ", toks)))
  *  .otherwise(transform(sequence(1, size-k+1),
  *                       i => concat_ws(" ", slice(toks, i, k))))`
  * over `toks = tokens(text)`: the same UTF8String `trim`/`split`
  * primitives tokenize (an all-whitespace text still yields the [""]
  * single-shingle case), shingles join with the same single-space
  * separator, and short documents still emit their whole run as one
  * shingle.
  *
  * What it removes: the convenience overload embedded the TOKENIZER
  * inside the per-position lambda, and Catalyst evaluates a lambda body
  * per element — the regex split ran once per shingle POSITION, O(n²)
  * work per row (the exact per-element re-evaluation bug BENCHNOTES
  * documents for the r13 DSIR featurizer, this time on the shingle
  * path). Measured at sf0.1 the shingle projection cost ~7.5 s per
  * corpus pass and the contrastive-triplet chain evaluated it four
  * times. Here tokenize + shingle assembly run as one static call per
  * row inside whole-stage codegen.
  */
case class WordShinglesExpression(child: Expression, k: Int)
  extends UnaryExpression {

  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesExpression.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShinglesExpression.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_kgrams(text, k)` — STRICT word k-grams: a text with fewer
  * than k tokens yields an EMPTY array (where [[WordShinglesExpression]]
  * emits its whole run as one short shingle). This is the bigram-LM
  * tier's pair emitter: `explode(word_kgrams(lower(text), 2))` yields
  * exactly the n−1 "w1 w2" pairs of an n≥2-token document and nothing
  * for shorter ones — replacing the r16 shape
  * `filter(size(toks) >= 2).select(explode(sequence(1, size−1)), toks)`
  * + two element_at lookups, whose Generate materialized the WHOLE
  * token array once per output row (O(n²) bytes per document through
  * the unsafe-row writer). Tokens are whitespace-split so they cannot
  * contain spaces: "w1 w2" ⇄ (w1, w2) is a bijection and
  * substring_index recovers the words exactly.
  */
case class WordKgramsExpression(child: Expression, k: Int)
  extends UnaryExpression {

  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_kgrams"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesExpression.computeStrict(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShinglesExpression.computeStrict($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesExpression {

  private val splitPattern = UTF8String.fromString("\\s+")
  private val space = UTF8String.fromString(" ")

  /** Static entry point shared by interpreted eval and generated code
    * (not named `eval` — the case class inherits Expression.eval, which
    * would suppress the static forwarder the generated code calls).
    */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val trimmed = text.trim()
    // tokens() maps whitespace-only text to an EMPTY token array, and
    // the size < k branch then emits one empty-string shingle — the
    // concat_ws(" ") of no tokens
    val toks: Array[UTF8String] =
      if (trimmed.numBytes == 0) Array.empty
      else trimmed.split(splitPattern, -1)
    val n = toks.length
    if (n < k) {
      return new GenericArrayData(
        Array[Any](UTF8String.concatWs(space, toks: _*)))
    }
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) =
        if (k == 1) toks(i)
        else {
          val win = new Array[UTF8String](k)
          System.arraycopy(toks, i, win, 0, k)
          UTF8String.concatWs(space, win: _*)
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[WordKgramsExpression]]'s kernel: empty under k tokens, else the
    * n−k+1 space-joined k-grams (identical token/join primitives to
    * [[compute]]).
    */
  def computeStrict(text: UTF8String, k: Int): ArrayData = {
    val trimmed = text.trim()
    val toks: Array[UTF8String] =
      if (trimmed.numBytes == 0) Array.empty
      else trimmed.split(splitPattern, -1)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) =
        if (k == 1) toks(i)
        else {
          val win = new Array[UTF8String](k)
          System.arraycopy(toks, i, win, 0, k)
          UTF8String.concatWs(space, win: _*)
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: array<string> word k-shingles. */
  def word_shingles(text: Column, k: Int): Column =
    Bridge.column(WordShinglesExpression(Bridge.expression(text), k))

  /** Column API: strict k-grams (empty under k tokens). */
  def word_kgrams(text: Column, k: Int): Column =
    Bridge.column(WordKgramsExpression(Bridge.expression(text), k))
}
