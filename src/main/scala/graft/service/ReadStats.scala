package graft.service

/** Per-second read-op telemetry — the reference's
  * `record-graph-read` / `graph-reads-report` family (stats.lisp:
  * 22-49, 99-105) at the service boundary.
  *
  * The reference increments a per-second hash entry inside every
  * graph read op and reports the trailing-minute average plus the
  * full (second, count) detail series. Here the equivalent op grain
  * is a served query request (`/query/...`, `/pattern`): Spark frames
  * are lazy, so "a read happened" is meaningful at the request that
  * triggers the job, not inside the scan — per-scan metrics already
  * belong to the Spark UI / listener bus. Embedded (non-REST) callers
  * drive Spark directly and read their metrics there; this counter is
  * the OPS view of the serving tier.
  *
  * A fixed ring of one-second slots (default 600 = the dashboard's
  * maximum lookback) keeps memory constant regardless of uptime; a
  * slot is lazily re-zeroed when its second comes around again, so
  * idle seconds cost nothing. All methods synchronize on the ring —
  * request dispatch is far coarser than this critical section.
  *
  * `clock` is injectable (seconds) so specs can pin exact rings.
  */
final class ReadStats(slots: Int = 600,
    clock: () => Long = () => System.currentTimeMillis() / 1000L) {
  require(slots > 1, s"need at least 2 slots, got $slots")
  private val counts = new Array[Long](slots)
  private val secs = new Array[Long](slots)

  /** Record one read op at the current second. */
  def record(): Unit = synchronized {
    val now = clock()
    val i = (now % slots).toInt
    if (secs(i) != now) { secs(i) = now; counts(i) = 0L }
    counts(i) += 1L
  }

  /** Average reads/second over the trailing `win` seconds including
    * the current one — `graph-reads-report-last-minute`'s inclusive
    * `now downto now-60` loop (61 samples for win=60), stats.lisp:36.
    */
  def lastAvg(win: Int = 60): Double = synchronized {
    require(win >= 0 && win < slots, s"window $win outside ring of $slots")
    val now = clock()
    var total = 0L
    var s = now - win
    while (s <= now) {
      val i = (s % slots).toInt
      if (secs(i) == s) total += counts(i)
      s += 1L
    }
    total.toDouble / (win + 1)
  }

  /** Trailing `span`-second detail as (second, count) points, zero-
    * filled over the whole range (the reference's `graph-rw-report`
    * collects every second from start to end with 0 defaults) —
    * chart-ready.
    */
  def series(span: Int): Seq[(Long, Long)] = synchronized {
    require(span > 0 && span <= slots, s"span $span outside ring of $slots")
    val now = clock()
    ((now - span + 1L) to now).map { s =>
      val i = (s % slots).toInt
      (s, if (secs(i) == s) counts(i) else 0L)
    }
  }
}
