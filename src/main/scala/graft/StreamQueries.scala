package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.streaming.EventStreams

/** Driver-gate entries for the event-stream operators, run in batch
  * mode (the same transforms serve readStream — StreamingSpec proves
  * the incremental path) and oracle-checked in DuckDB.
  */
object StreamQueries {

  type Q = (SparkSession, String) => DataFrame

  // Tumbling-window aggregate per event type.
  val ev1WindowedAgg: Q = (s, dir) =>
    EventStreams.windowedTypeAgg(Tables.load(s, dir, "events"))
      .orderBy("window_start", "event_type")
  val ev1Sql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Sessionization (30-minute inactivity gap), batch twin of the
  // stateful streaming sessionizer.
  val ev2Sessions: Q = (s, dir) =>
    EventStreams.sessionizeBatch(Tables.load(s, dir, "events"))
      .orderBy("user_id", "session_start")
  val ev2Sql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |      THEN 1 ELSE 0 END AS is_start
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM sess GROUP BY user_id, session_seq
      |ORDER BY user_id, session_start""".stripMargin

  // Event dedup (batch twin of the watermarked streaming dedup) over
  // a feed with replayed deliveries planted.
  val ev3Dedup: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val replayed = ev.filter(org.apache.spark.sql.functions.col("event_id") < 500)
    EventStreams.dedupEventsBatch(ev.unionByName(replayed))
      .orderBy("event_id")
  }
  val ev3Sql: String =
    """WITH feed AS (
      |  SELECT event_id, ts, user_id, event_type, value FROM events
      |  UNION ALL
      |  SELECT event_id, ts, user_id, event_type, value FROM events
      |  WHERE event_id < 500)
      |SELECT DISTINCT event_id, ts, user_id, event_type, value
      |FROM feed ORDER BY event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "ev1_windowed_agg" -> ev1WindowedAgg,
    "ev2_sessionize" -> ev2Sessions,
    "ev3_dedup" -> ev3Dedup,
  )

  val oracleSql: Map[String, String] = Map(
    "ev1_windowed_agg" -> ev1Sql,
    "ev2_sessionize" -> ev2Sql,
    "ev3_dedup" -> ev3Sql,
  )
}
