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

  /** stream-stream interval join (r8), batch-equivalent form: each click
    * joined to the same user's purchases inside [click_ts, click_ts+4h)
    * — the attribution join every event pipeline runs. The identical
    * join runs under Structured Streaming with watermarks on both sides;
    * the time-range predicate is what lets Spark bound each side's
    * keyed state (eviction window derived from the interval) — the unit
    * suite drives the watermarked left-outer variant; this row pins the
    * pairing semantics exactly. Equi key user_id (shuffle/SMJ; never a
    * theta join), range predicate as the post-match filter; lag emitted
    * as exact integer seconds (µs diff `div` 1e6 — no float). */
  val stream_join: Q = (s, d) => {
    val ev = events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val buys = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    clicks.join(buys, Seq("user_id"))
      .where(col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 4 HOURS"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000")
          .as("lag_sec"))
      .orderBy("click_id", "purchase_id")
  }

  val queries: Seq[(String, Q)] = Seq(
    "stream_tumble" -> stream_tumble,
    "stream_slide" -> stream_slide,
    "stream_session" -> stream_session,
    "stream_dedup" -> stream_dedup,
    "stream_join" -> stream_join,
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
    "stream_join" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
             p.event_id AS purchase_id,
             (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS lag_sec
         FROM events c JOIN events p
           ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '4 hours'
         ORDER BY click_id, purchase_id""",
  )
}
