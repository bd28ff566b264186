package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Det._

/** SURVEY.md §2-I: streaming window semantics over `events`, in their
  * batch-equivalent formulations (the DuckDB oracle can check these; true
  * `readStream` + watermark behavior is covered in the streaming test
  * suite — `withWatermark` is a no-op in batch).
  *
  * The same `window`/`session_window` expressions run unchanged under
  * Structured Streaming: at scale these are keyed-state aggregations
  * partitioned by (window, key) / (user, session) — no global state.
  */
object Streaming {

  val stream_tumble: Q = (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("wstart", "event_type")

  val stream_slide: Q = (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("wstart", "event_type")

  /** session_window semantics: a session is [first_ts, last_ts + gap); an
    * event at exactly last_ts+gap starts a NEW session (end-exclusive) —
    * the oracle's lag/cumsum formulation uses `>= gap` to match. */
  val stream_session: Q = (s, d) =>
    events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .select(col("session_window.start").as("s_start"), col("user_id"),
        col("n_events"), col("last_ts"))
      .orderBy("user_id", "s_start")

  /** dedup keep-first — the batch twin of dropDuplicatesWithinWatermark;
    * deterministic survivor via (ts, event_id) ordering, not an arbitrary
    * dropDuplicates pick. */
  val stream_dedup: Q = (s, d) => {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(asc("ts"), asc("event_id"))
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
      .orderBy("user_id", "event_type")
  }

  val queries: Seq[(String, Q)] = Seq(
    "stream_tumble" -> stream_tumble,
    "stream_slide" -> stream_slide,
    "stream_session" -> stream_session,
    "stream_dedup" -> stream_dedup,
  )

  val oracle: Seq[(String, String)] = Seq(
    "stream_tumble" ->
      """SELECT date_trunc('hour', ts) AS wstart, event_type, count(1) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""",
    "stream_slide" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts) - o * INTERVAL '15 minutes' AS wstart,
             event_type, count(1) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events, (SELECT unnest([0, 1, 2, 3]) AS o) offs
         GROUP BY 1, 2 ORDER BY wstart, event_type""",
    "stream_session" ->
      """WITH flagged AS (
           SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS brk
           FROM events),
         sess AS (
           SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
           FROM flagged)
         SELECT min(ts) AS s_start, user_id, count(1) AS n_events,
             max(ts) AS last_ts
         FROM sess GROUP BY user_id, sid ORDER BY user_id, s_start""",
    "stream_dedup" ->
      """WITH ranked AS (
           SELECT user_id, event_type, event_id, ts,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts ASC, event_id ASC) AS rn
           FROM events)
         SELECT user_id, event_type, event_id, ts FROM ranked
         WHERE rn = 1 ORDER BY user_id, event_type""",
  )
}
