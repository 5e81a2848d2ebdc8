package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.service.{ChartSvg, ReadStats}

/** Read-rate ring + SVG chart renderer (the stats.lisp read-report /
  * chart.lisp dashboard analogs) — pure units, pinned against an
  * injected clock so every number is exact.
  */
class ReadStatsSpec extends AnyFunSuite {

  test("lastAvg is the reference's inclusive 61-sample trailing window") {
    var now = 1000L
    val rs = new ReadStats(clock = () => now)
    (1 to 3).foreach(_ => rs.record())
    now = 1030L
    rs.record(); rs.record()
    now = 1060L
    assert(rs.lastAvg(60) == 5.0 / 61) // [1000..1060] holds all 5
    now = 1061L
    assert(rs.lastAvg(60) == 2.0 / 61) // 1000's three ticks age out
    now = 1090L
    assert(rs.lastAvg(60) == 2.0 / 61) // 1030 is exactly now-60: still in
    now = 1091L
    assert(rs.lastAvg(60) == 0.0)
  }

  test("ring slots re-zero on wrap — an old second never bleeds into " +
      "the one that reuses its slot") {
    var now = 5L
    val rs = new ReadStats(slots = 10, clock = () => now)
    rs.record(); rs.record()
    now = 15L // same slot (15 % 10 == 5), different second
    rs.record()
    assert(rs.series(3) == Seq((13L, 0L), (14L, 0L), (15L, 1L)),
      "the wrap must reset the slot, and gaps zero-fill")
    assert(rs.lastAvg(9) == 1.0 / 10, "aged-out seconds contribute nothing")
    intercept[IllegalArgumentException](rs.series(11)) // span > ring
    intercept[IllegalArgumentException](rs.lastAvg(10)) // window >= ring
  }

  test("chart renders both series, axes, and legend; degenerate inputs " +
      "stay well-formed") {
    val svg = ChartSvg.render(Seq(
      ("Writes", Seq((100L, 5L), (101L, 0L), (102L, 9L))),
      ("Reads", Seq((100L, 1L), (102L, 3L)))))
    assert(svg.startsWith("<svg") && svg.endsWith("</svg>"))
    assert("<polyline".r.findAllMatchIn(svg).size == 2)
    assert(svg.contains(">Writes</text>") && svg.contains(">Reads</text>"))
    assert(svg.contains(">Count</text>") && svg.contains(">Time</text>"))
    assert(svg.contains("1970-01-01T00:01:40Z"), "RFC3339 x labels")
    assert(svg.contains(""">9</text>"""), "y axis tops out at the max count")
    // a series name is attacker-adjacent text: it must be escaped
    val esc = ChartSvg.render(Seq(("<x>&\"", Seq((1L, 1L)))))
    assert(!esc.contains("<x>") && esc.contains("&lt;x&gt;&amp;&quot;"))
    // empty input renders a placeholder, not a broken document
    val empty = ChartSvg.render(Seq(("Writes", Seq.empty)))
    assert(empty.contains("no data") && empty.endsWith("</svg>"))
    // single-point series must not divide by a zero time range
    val single = ChartSvg.render(Seq(("W", Seq((50L, 2L)))))
    assert(single.contains("<polyline") && single.endsWith("</svg>"))
  }
}
