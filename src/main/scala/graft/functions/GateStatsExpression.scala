package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `gate_stats(text)` — the q97 quality-gate signals (token count, sum
  * of token lengths, punctuation count, stopword count, reasons
  * bitmask) as ONE native per-row expression.
  *
  * Bit-identical by construction to the r15 column composition in
  * [[graft.operators.TextAnalysis.filterGate]]: tokenization uses the
  * same UTF8String `trim`/`split("\\s+")` primitives StringTrim /
  * StringSplit call (so a leading tab still yields Java-split's empty
  * first token), token/char lengths count code points like `length()`,
  * the punctuation count replicates
  * `length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))` (code points
  * outside ASCII alnum and the six Java `\s` chars — non-ASCII never
  * matches the class), and the stopword test is the same case-sensitive
  * exact match over the same 10-word list.
  *
  * What it removes: the old chain ran TWO interpreted higher-order
  * functions per row (the sum-of-lengths `aggregate` and the stopword
  * `filter`, both CodegenFallback, the stopword one dispatching a
  * 10-branch In per token) plus a full `regexp_replace` that built a
  * new string just to measure it. Profiled at sf0.1 the gate scan cost
  * ~0.45 s per evaluation and the curate chains evaluate it up to four
  * times (brief item 4: eliminate non-codegen expressions in the hot
  * path).
  */
case class GateStatsExpression(child: Expression, minTokens: Int,
    minMeanLen: Int, maxMeanLen: Int, minStopwords: Int)
  extends UnaryExpression {

  override def dataType: DataType = GateStatsExpression.schema
  override def prettyName: String = "gate_stats"

  override protected def nullSafeEval(input: Any): Any =
    GateStatsExpression.compute(input.asInstanceOf[UTF8String],
      minTokens, minMeanLen, maxMeanLen, minStopwords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GateStatsExpression.compute($c, $minTokens, $minMeanLen, " +
        s"$maxMeanLen, $minStopwords)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GateStatsExpression {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("reasons", LongType, nullable = false)))

  private val splitPattern = UTF8String.fromString("\\s+")

  // the same 10 words as TextAnalysis.englishStopwords (asserted
  // against it in TextSpec); UTF8String keys for exact byte equality,
  // matching the old In(token, stopwords) comparison
  private[graft] val stopwords: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
      .foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Count of code points NOT matching `[a-zA-Z0-9\s]` (Java `\s` =
    * space, \t, \n, \x0B, \f, \r; non-ASCII code points never match).
    * Iterates UTF-8 bytes: each ASCII byte is one code point, each
    * non-ASCII LEAD byte (non-continuation) is one non-matching code
    * point.
    */
  private def punctCount(bytes: Array[Byte]): Long = {
    var i = 0
    var punct = 0L
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0) { // ASCII
        val c = b.toChar
        val isAlnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9')
        val isWs = c == ' ' || c == '\t' || c == '\n' || c == 0x0B.toChar ||
          c == '\f' || c == '\r'
        if (!isAlnum && !isWs) punct += 1
      } else if ((b & 0xC0) != 0x80) { // non-ASCII lead byte
        punct += 1
      }
      i += 1
    }
    punct
  }

  /** Static entry point shared by interpreted eval and generated code
    * (named `compute`, not `eval`: the case class inherits
    * Expression.eval, which would suppress the companion's static
    * forwarder and break the generated call). */
  def compute(text: UTF8String, minTokens: Int, minMeanLen: Int,
      maxMeanLen: Int, minStopwords: Int): InternalRow = {
    val trimmed = text.trim()
    var nTok = 0L
    var sumLen = 0L
    var nStop = 0L
    if (trimmed.numBytes != 0) {
      val toks = trimmed.split(splitPattern, -1)
      nTok = toks.length.toLong
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        sumLen += t.numChars()
        if (stopwords.contains(t)) nStop += 1
        i += 1
      }
    }
    val nPunct = punctCount(text.getBytes)
    val nChars = text.numChars().toLong
    var reasons = 0L
    if (nTok < minTokens) reasons += 1L
    if (nTok > 0 && (sumLen < nTok * minMeanLen || sumLen > nTok * maxMeanLen))
      reasons += 2L
    if (nPunct * 10 > nChars) reasons += 4L
    if (nStop < minStopwords) reasons += 8L
    new GenericInternalRow(Array[Any](nTok, sumLen, nPunct, nStop, reasons))
  }

  /** Column API: struct<n_tokens, sum_token_len, n_punct, n_stop,
    * reasons> of the gate signals.
    */
  def gate_stats(text: Column, minTokens: Int = 10, minMeanLen: Int = 3,
      maxMeanLen: Int = 10, minStopwords: Int = 2): Column =
    Bridge.column(GateStatsExpression(Bridge.expression(text),
      minTokens, minMeanLen, maxMeanLen, minStopwords))
}
