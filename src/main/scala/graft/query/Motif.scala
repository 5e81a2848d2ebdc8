package graft.query

/** Compact motif notation for pattern queries — sugar over the
  * [[PatternQuery]] AST, mirroring the terseness of the reference's
  * Prolog clause syntax (`(select (?a ?o) (is-a ?a customer)
  * (placed ?a ?o))` — prologc.lisp:951-1037):
  *
  * {{{
  * Motif.goals("(a:customer)-[placed w]->(o), (a)-[located_in]->(n:nation)")
  * }}}
  *
  * Grammar per comma-separated clause:
  *   vertex  := ( name [: label] )
  *   edge    := -[ label [weightVar] ]->   |   <-[ label [weightVar] ]-
  *   clause  := vertex (edge vertex)*
  *
  * A typed vertex mention becomes an [[IsA]] goal at its FIRST typed
  * occurrence; each arrow becomes an [[EdgeGoal]] (reversed arrows swap
  * endpoints). Slots, filters, params etc. compose as ordinary goals
  * after the motif — the sugar only covers the topology.
  */
object Motif {

  private val Vertex = """\(\s*([A-Za-z_]\w*)\s*(?::\s*([A-Za-z_]\w*))?\s*\)""".r
  private val EdgeFwd = """-\[\s*([A-Za-z_]\w*)(?:\s+([A-Za-z_]\w*))?\s*\]->""".r
  private val EdgeRev = """<-\[\s*([A-Za-z_]\w*)(?:\s+([A-Za-z_]\w*))?\s*\]-""".r

  def goals(pattern: String): Seq[Goal] = {
    val out = Seq.newBuilder[Goal]
    val typed = collection.mutable.Set.empty[String]

    def vertexGoal(name: String, label: Option[String]): String = {
      // first typed mention generates; later ones are membership tests
      // (IsA's generator/test duality handles both)
      label.foreach { l => typed += name; out += IsA(name, l) }
      name
    }

    pattern.split(",").map(_.trim).filter(_.nonEmpty).foreach { clause =>
      var rest = clause
      def take(re: scala.util.matching.Regex): Option[scala.util.matching.Regex.Match] =
        re.findPrefixMatchOf(rest).map { m => rest = rest.substring(m.end).trim; m }

      val first = take(Vertex).getOrElse(
        throw new IllegalArgumentException(s"motif clause must start with (v[:label]): $clause"))
      var cur = vertexGoal(first.group(1), Option(first.group(2)))
      while (rest.nonEmpty) {
        val (label, weight, reversed) =
          take(EdgeFwd).map(m => (m.group(1), Option(m.group(2)), false))
            .orElse(take(EdgeRev).map(m => (m.group(1), Option(m.group(2)), true)))
            .getOrElse(throw new IllegalArgumentException(
              s"expected -[edge]-> or <-[edge]- at: '$rest' in: $clause"))
        val v = take(Vertex).getOrElse(throw new IllegalArgumentException(
          s"expected (v[:label]) after edge at: '$rest' in: $clause"))
        val next = vertexGoal(v.group(1), Option(v.group(2)))
        out += (if (reversed) EdgeGoal(label, next, cur, weight)
                else EdgeGoal(label, cur, next, weight))
        cur = next
      }
    }
    out.result()
  }
}
