package graft.query

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** The ad-hoc JSON pattern DSL — a faithful generalization of the
  * reference's REST pattern-query language (reference rest.lisp:448-618:
  * `compile-pattern-query` builds goals from a closed set of safe
  * patterns; unknown types/ops are a client error). SURVEY.md §3.3
  * called this the cleanest spec for the v1 query surface.
  *
  * Shape:
  * {{{
  * { "motif": "(a:customer)-[placed price]->(o)",   // optional terse form
  *   "match": [ {"vertex":"a","type":"customer"},
  *              {"edge":"placed","from":"a","to":"o","weight":"price"} ],
  *   "where": [ {"slot":["a","c_mktsegment","seg"]},
  *              {"cmp":["seg","=","BUILDING"]},
  *              {"cmp":["price",">",{"var":"lo"}]},
  *              {"regex":["name",".*5$"]},
  *              {"param":["lo","min_price"]},
  *              {"not":{"match":[...],"where":[...]}} ],
  *   "select": ["a","seg"],
  *   "orderBy": ["seg","-a"],          // "-" prefix = descending
  *   "limit": 50, "skip": 0,
  *   "distinct": false, "count": false }
  * }}}
  *
  * Malformed input throws [[JsonQuery.BadQueryException]] — the 400
  * path of rest.lisp:420-433.
  */
object JsonQuery {

  final class BadQueryException(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new BadQueryException(msg)

  private val mapper = new ObjectMapper()

  def parse(json: String, params: Map[String, Any] = Map.empty): PatternQuery = {
    val root =
      try mapper.readTree(json)
      catch { case e: Exception => bad(s"malformed JSON: ${e.getMessage}") }
    if (root == null || !root.isObject) bad("query must be a JSON object")

    val goals = Seq.newBuilder[Goal]

    // "motif": the compact string notation, alternative to (or combined
    // with, motif first) the structured "match" array
    val motif = Option(root.get("motif")).map { m =>
      if (!m.isTextual) bad("'motif' must be a string")
      try Motif.goals(m.asText())
      catch { case e: IllegalArgumentException => bad(e.getMessage) }
    }
    motif.foreach(goals ++= _)

    val matches = Option(root.get("match")).getOrElse(
      if (motif.isDefined) mapper.createArrayNode() else bad("missing 'match' (or 'motif')"))
    if (!matches.isArray || (matches.isEmpty && motif.isEmpty))
      bad("'match' must be a non-empty array")
    matches.elements().asScala.foreach { m =>
      if (m.has("vertex")) {
        goals += IsA(str(m, "vertex"), str(m, "type"))
      } else if (m.has("edge")) {
        goals += EdgeGoal(str(m, "edge"), str(m, "from"), str(m, "to"),
          weightVar = optStr(m, "weight"))
      } else bad(s"match element must have 'vertex' or 'edge': $m")
    }

    Option(root.get("where")).foreach { wh =>
      if (!wh.isArray) bad("'where' must be an array")
      wh.elements().asScala.foreach { w =>
        if (w.has("slot")) {
          val a = args(w, "slot", 3)
          goals += Slot(a(0), a(1), a(2))
        } else if (w.has("cmp")) {
          val c = w.get("cmp")
          if (!c.isArray || c.size() != 3) bad(s"'cmp' needs [left, op, right]: $w")
          goals += Filter(compare(col(c.get(0).asText()), c.get(1).asText(), operand(c.get(2))))
        } else if (w.has("regex")) {
          val a = args(w, "regex", 2)
          goals += Regex(a(0), a(1))
        } else if (w.has("param")) {
          val a = args(w, "param", 2)
          goals += Param(a(0), a(1))
        } else if (w.has("not")) {
          val sub = parse(w.get("not").toString, params)
          goals += Not(sub.goals)
        } else bad(s"unknown where clause: $w")
      }
    }

    val select = Option(root.get("select")) match {
      case Some(s) if s.isArray && s.size() > 0 =>
        s.elements().asScala.map(v => v.asText() -> v.asText()).toSeq
      case _ => bad("missing or empty 'select'")
    }

    val orderBy: Seq[Column] = Option(root.get("orderBy")).map { o =>
      if (!o.isArray) bad("'orderBy' must be an array")
      o.elements().asScala.map { v =>
        val name = v.asText()
        if (name.startsWith("-")) col(name.drop(1)).desc else col(name).asc
      }.toSeq
    }.getOrElse(Nil)

    PatternQuery(
      goals = goals.result(),
      select = select,
      distinct = Option(root.get("distinct")).exists(_.asBoolean(false)),
      orderBy = orderBy,
      limit = Option(root.get("limit")).map(n => posInt(n, "limit")),
      skip = Option(root.get("skip")).map(n => posInt(n, "skip")),
      countOnly = Option(root.get("count")).exists(_.asBoolean(false)),
      params = params)
  }

  private def compare(left: Column, op: String, right: Column): Column = op match {
    case "=" | "==" => left === right
    case "!=" | "<>" => left =!= right
    case "<" => left < right
    case "<=" => left <= right
    case ">" => left > right
    case ">=" => left >= right
    case other => bad(s"unknown comparison operator: $other")
  }

  private def operand(n: JsonNode): Column =
    if (n.isObject && n.has("var")) col(n.get("var").asText())
    else if (n.isTextual) org.apache.spark.sql.functions.lit(n.asText())
    else if (n.isIntegralNumber) org.apache.spark.sql.functions.lit(n.asLong())
    else if (n.isFloatingPointNumber) org.apache.spark.sql.functions.lit(n.asDouble())
    else if (n.isBoolean) org.apache.spark.sql.functions.lit(n.asBoolean())
    else bad(s"unsupported operand: $n")

  private def str(n: JsonNode, field: String): String =
    Option(n.get(field)).filter(_.isTextual).map(_.asText())
      .getOrElse(bad(s"missing/invalid '$field' in $n"))
  private def optStr(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(_.isTextual).map(_.asText())
  private def args(n: JsonNode, field: String, arity: Int): IndexedSeq[String] = {
    val a = n.get(field)
    if (!a.isArray || a.size() != arity) bad(s"'$field' needs $arity args: $n")
    (0 until arity).map(i => a.get(i).asText())
  }
  private def posInt(n: JsonNode, field: String): Int = {
    if (!n.canConvertToInt || n.asInt() < 0) bad(s"'$field' must be a non-negative int")
    n.asInt()
  }
}
