package graft.service

/** Dependency-free SVG line chart — the reference's ops dashboard
  * (chart.lisp: an adw-charting 1600×900 line chart of per-second
  * "Writes" and "Reads" series with an RFC3339 time axis and a
  * "Count" y axis, rendered to a PNG). Re-expressed as a
  * self-contained SVG string: no raster libs in this stack, and SVG
  * serves straight to a browser from the REST tier.
  *
  * Input is named series of (epoch-second, count) points on a shared
  * time axis. The renderer is pure string building — deterministic
  * for a given input, so specs can pin exact fragments.
  */
object ChartSvg {

  private val palette = Seq("#1f6fb2", "#c25e1e", "#3a8c5c", "#8c3a7e")

  private def rfc3339(sec: Long): String =
    java.time.format.DateTimeFormatter.ISO_INSTANT.format(
      java.time.Instant.ofEpochSecond(sec))

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Render `series` (name → (second, count) points; seconds need not
    * align across series — the axis spans their union) at `w`×`h`.
    */
  def render(series: Seq[(String, Seq[(Long, Long)])],
      w: Int = 1600, h: Int = 900): String = {
    val nonEmpty = series.filter(_._2.nonEmpty)
    val sb = new StringBuilder
    sb.append(s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" """ +
      s"""viewBox="0 0 $w $h" font-family="sans-serif" font-size="14">""")
    sb.append(s"""<rect width="$w" height="$h" fill="white"/>""")
    if (nonEmpty.isEmpty) {
      sb.append(s"""<text x="${w / 2}" y="${h / 2}" text-anchor="middle">""" +
        "no data</text></svg>")
      return sb.toString
    }
    val (left, right, top, bottom) = (90, 30, 40, 110)
    val (pw, ph) = (w - left - right, h - top - bottom)
    val xs = nonEmpty.flatMap(_._2.map(_._1))
    val (x0, x1) = (xs.min, xs.max)
    val y1 = math.max(1L, nonEmpty.flatMap(_._2.map(_._2)).max)
    def px(sec: Long): Double =
      if (x1 == x0) left + pw / 2.0
      else left + pw.toDouble * (sec - x0) / (x1 - x0)
    def py(v: Long): Double = top + ph - ph.toDouble * v / y1
    // frame + y ticks ("Count" axis, 5 divisions)
    sb.append(s"""<rect x="$left" y="$top" width="$pw" height="$ph" """ +
      """fill="none" stroke="#999"/>""")
    (0 to 5).foreach { i =>
      val v = y1 * i / 5
      val y = py(v)
      sb.append(f"""<line x1="$left" y1="$y%.1f" x2="${left + pw}" y2="$y%.1f" """ +
        """stroke="#e5e5e5"/>""")
      sb.append(f"""<text x="${left - 8}" y="${y + 5}%.1f" """ +
        s"""text-anchor="end">$v</text>""")
    }
    sb.append(s"""<text x="20" y="${top + ph / 2}" transform="rotate(-90 20 """ +
      s"""${top + ph / 2})" text-anchor="middle">Count</text>""")
    // x ticks: up to 6 rotated RFC3339 labels (the reference's
    // :angle t + rfc3339 label formatter)
    val ticks = if (x1 == x0) Seq(x0)
      else (0 to 5).map(i => x0 + (x1 - x0) * i / 5).distinct
    ticks.foreach { s =>
      val x = px(s)
      sb.append(f"""<line x1="$x%.1f" y1="${top + ph}" x2="$x%.1f" """ +
        s"""y2="${top + ph + 6}" stroke="#999"/>""")
      sb.append(f"""<text x="$x%.1f" y="${top + ph + 20}" text-anchor="end" """ +
        f"""transform="rotate(-35 $x%.1f ${top + ph + 20})">${rfc3339(s)}</text>""")
    }
    sb.append(s"""<text x="${left + pw / 2}" y="${h - 12}" """ +
      """text-anchor="middle">Time</text>""")
    // series polylines + legend
    nonEmpty.zipWithIndex.foreach { case ((name, pts), i) =>
      val color = palette(i % palette.size)
      val path = pts.sortBy(_._1)
        .map { case (s, v) => f"${px(s)}%.1f,${py(v)}%.1f" }.mkString(" ")
      sb.append(s"""<polyline points="$path" fill="none" stroke="$color" """ +
        """stroke-width="2"/>""")
      val lx = left + 20 + i * 160
      sb.append(s"""<rect x="$lx" y="${top - 26}" width="14" height="14" """ +
        s"""fill="$color"/>""")
      sb.append(s"""<text x="${lx + 20}" y="${top - 14}">${esc(name)}</text>""")
    }
    sb.append("</svg>")
    sb.toString
  }
}
