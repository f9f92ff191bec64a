package graft.streaming

/** Prometheus text exposition (format 0.0.4) for the engine's K4
  * metric path — the final piece of the reference's metrics surface:
  * every reference service renders its counters/histograms/gauges
  * through prometheus_client's text format for the scraper
  * (kafka_consumer/app/metrics/metrics.py:41-136 defines the series;
  * the HTTP handler at kafka_consumer/app/main.py serves them). The
  * engine's counters come from `observe()` via
  * [[ObservedMetricsListener]]; this object renders a snapshot of
  * them in the same wire format. No HTTP server here — serving the
  * string is one handler away and out of engine scope (SURVEY §2.3
  * K4 export non-goal, closed to the formatter).
  *
  * Format notes (kept faithful to the Python client, whose output
  * the reference's scraper consumes):
  *  - `# HELP` / `# TYPE` header per family, series lines
  *    `name{label="v",…} value`;
  *  - label VALUES escape backslash, double-quote and newline; HELP
  *    text escapes backslash and newline only;
  *  - values render like Python floats: integral finite doubles as
  *    `N.0` (the client emits `1.0` for a counter at 1), +Inf as
  *    `+Inf`;
  *  - a histogram renders CUMULATIVE `name_bucket{…,le="…"}` series
  *    ending at `le="+Inf"`, then `name_sum` and `name_count`.
  */
object PrometheusExposition {

  final case class Series(labels: Seq[(String, String)], value: Double)

  sealed trait Family { def name: String; def help: String }

  final case class Counter(name: String, help: String,
                           series: Seq[Series]) extends Family

  final case class Gauge(name: String, help: String,
                         series: Seq[Series]) extends Family

  /** `cumBuckets`: ordered (le-label, cumulative count) ending at
    * "+Inf"; `valueSum` is the sum of observed values (the
    * histogram's `_sum` line).
    */
  final case class HistogramF(name: String, help: String,
                              labels: Seq[(String, String)],
                              cumBuckets: Seq[(String, Long)],
                              valueSum: Double) extends Family {
    require(cumBuckets.nonEmpty && cumBuckets.last._1 == "+Inf",
      "cumulative buckets must end at le=\"+Inf\"")
  }

  def escapeLabelValue(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  def escapeHelp(v: String): String =
    v.replace("\\", "\\\\").replace("\n", "\\n")

  /** Python-client value rendering: integral finite doubles print
    * with a trailing `.0`, infinities as +Inf/-Inf.
    */
  def renderValue(v: Double): String =
    if (v.isPosInfinity) "+Inf"
    else if (v.isNegInfinity) "-Inf"
    else if (v == math.rint(v) && math.abs(v) < 1e15) s"${v.toLong}.0"
    else v.toString

  private def seriesLine(name: String, s: Series): String = {
    val lbl =
      if (s.labels.isEmpty) ""
      else s.labels.map { case (k, v) =>
        s"""$k="${escapeLabelValue(v)}"""" }.mkString("{", ",", "}")
    s"$name$lbl ${renderValue(s.value)}"
  }

  /** Render a snapshot. Families and series render in the given
    * order — deterministic output for a deterministic input, so a
    * spec can compare strings exactly.
    */
  def render(families: Seq[Family]): String = {
    val sb = new StringBuilder
    def header(f: Family, typ: String): Unit = {
      sb.append(s"# HELP ${f.name} ${escapeHelp(f.help)}\n")
      sb.append(s"# TYPE ${f.name} $typ\n")
    }
    families.foreach {
      case c: Counter =>
        header(c, "counter")
        c.series.foreach(s => sb.append(seriesLine(c.name, s)).append('\n'))
      case g: Gauge =>
        header(g, "gauge")
        g.series.foreach(s => sb.append(seriesLine(g.name, s)).append('\n'))
      case h: HistogramF =>
        header(h, "histogram")
        h.cumBuckets.foreach { case (le, n) =>
          sb.append(seriesLine(s"${h.name}_bucket",
            Series(h.labels :+ ("le" -> le), n.toDouble))).append('\n')
        }
        sb.append(seriesLine(s"${h.name}_sum",
          Series(h.labels, h.valueSum))).append('\n')
        sb.append(seriesLine(s"${h.name}_count",
          Series(h.labels, h.cumBuckets.last._2.toDouble))).append('\n')
    }
    sb.toString
  }

  /** A counter family from [[ObservedMetricsListener]] totals: each
    * (column → labels) pair becomes one series whose value is the
    * listener's summed per-batch deltas for that column — the
    * scrape-time readout of the engine's A5/K4 counters.
    */
  def countersFrom(listener: ObservedMetricsListener, observedName: String,
                   name: String, help: String,
                   series: Seq[(String, Seq[(String, String)])]): Counter =
    Counter(name, help,
      series.map { case (column, labels) =>
        Series(labels, listener.total(observedName, column).toDouble)
      })
}
