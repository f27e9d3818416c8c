package graft

import org.apache.spark.sql.Row

/** JVM-default-timezone independence: every production session pins
  * `spark.sql.session.timeZone=UTC` (SparkEntry/Bench/Verify), but on
  * a real cluster each executor JVM inherits whatever TZ its host
  * happens to have — and Spark has known leak paths where the JVM
  * default sneaks past the session setting (formatter defaults,
  * external java.sql conversions). This spec runs the date/time-heavy
  * queries with the driver JVM's default timezone swapped to offsets
  * with no UTC alignment (Kathmandu +05:45, Chatham +12:45/+13:45)
  * and requires identical ENGINE results — so the UTC convention
  * provably comes from the session config, not the test machine's
  * /etc/localtime.
  *
  * Collected values are normalized to TZ-stable forms at collect time
  * because the java.sql driver-side types are themselves TZ-entangled
  * BY DESIGN (not an engine leak): a DateType day materializes as
  * local-midnight millis under the collect-time default TZ, so the
  * stable identity is its rendered day string; a TimestampType value
  * is a fixed instant, so the stable identity is epoch micros via
  * getTime. Everything else compares raw. */
class TimezoneSpec extends SparkSpec {

  private val targets = Seq(
    "q_date_funcs", "q_date_arith", "q_win_tumbling", "q_weekday_profile",
    "q_cohort_retention", "q_sessionize", "q_activity_islands",
    "q_time_weighted_avg", "q_gapfill")

  private def normalize(v: Any): Any = v match {
    case d: java.sql.Date => d.toString // rendered under collect-time TZ
    case t: java.sql.Timestamp => t.getTime // the instant
    case r: Row => r.toSeq.map(normalize)
    case s: scala.collection.Seq[_] => s.map(normalize)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => (normalize(k), normalize(x)) }
    case x => x
  }

  private def run(name: String): Seq[Any] = {
    val r = SparkEntry.queries(name)(spark, sfDir).collect()
      .map(r => normalize(r)).toSeq
    spark.catalog.clearCache()
    r
  }

  test("date/time queries are invariant to the JVM default timezone") {
    val prevTz = java.util.TimeZone.getDefault
    val baseline = targets.map(n => n -> run(n))
    try {
      Seq("Asia/Kathmandu", "Pacific/Chatham").foreach { tz =>
        java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone(tz))
        baseline.foreach { case (name, want) =>
          assert(run(name) == want, s"$name differs under JVM default TZ $tz")
        }
      }
    } finally java.util.TimeZone.setDefault(prevTz)
  }
}
