package graft.eth

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A36: the Grafana dashboard macros ($timeFilter, $timeSeries,
  * /root/reference/grafana/dashboards/ethereum.json:520) as
  * parameterized Column builders — the reference's dashboards are
  * template SQL where Grafana substitutes the picker's time range;
  * here the "macro" is a function of (from, to).
  */
object Grafana {

  /** `$timeFilter`: half-open [from, to) range on an event-time
    * column; literals are 'yyyy-MM-dd[ HH:mm:ss]' UTC.
    */
  def timeFilter(ts: Column, from: String, to: String): Column =
    ts >= lit(from).cast("timestamp") && ts < lit(to).cast("timestamp")

  /** `$timeSeries`: the grouping bucket for a time-series panel —
    * event time truncated to the panel interval (hour/day/...).
    * Emitted as a formatted string so the result is dtype-stable
    * across engines/readers.
    */
  def timeSeries(ts: Column, unit: String = "hour"): Column =
    date_format(date_trunc(unit, ts), "yyyy-MM-dd HH:mm:ss")
}
