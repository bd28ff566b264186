package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** True Structured Streaming semantics (SURVEY.md §2-I unit-test-only rows):
  * watermark late-data drop, AvailableNow file-source parity with batch,
  * and streaming dedup — the behaviors the batch oracle cannot check. */
class StreamingSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window with watermark drops late rows (update mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("w"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_tumble")
      .outputMode("update").start()
    try {
      // batch 1: two rows at 10:05 and 10:20 → watermark advances to 10:10
      mem.addData((ts("2024-01-01 10:05:00"), 1.0), (ts("2024-01-01 10:20:00"), 2.0))
      q.processAllAvailable()
      // batch 2: a row 2h older than the watermark → must be dropped
      mem.addData((ts("2024-01-01 08:00:00"), 9.0))
      q.processAllAvailable()
      // batch 3: an on-time row still lands
      mem.addData((ts("2024-01-01 10:40:00"), 3.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT w, n FROM wm_tumble").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toList
      assert(!rows.exists(_._1.startsWith("2024-01-01 08")),
        s"late row leaked into results: $rows")
      assert(rows.filter(_._1.startsWith("2024-01-01 10")).map(_._2).max == 3)
    } finally q.stop()
  }

  test("AvailableNow file-source stream equals the batch aggregation") {
    // the same window expression used by stream_tumble, executed as a real
    // readStream over the events parquet (ts normalized exactly as
    // Tables.events does — the fixture has shipped both NANOS-as-long and
    // native-µs encodings across driver generations)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val tsConv =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000"))
      else col("ts").cast("timestamp")
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sf)
      .withColumn("ts", tsConv)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))
    val q = stream.writeStream.format("memory").queryName("an_tumble")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT wstart, event_type, n FROM an_tumble")
      .orderBy("wstart", "event_type").collect().toSeq
    val batch = ops.Streaming.stream_tumble(spark, sf)
      .select("wstart", "event_type", "n")
      .orderBy("wstart", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("stream-stream interval join emits matches and expires late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // click-joins-impression inside 30 min: the canonical stream-stream
    // inner join with watermarks on both sides and a time-range condition
    val imps = MemoryStream[(Timestamp, String)]
    val clicks = MemoryStream[(Timestamp, String)]
    val l = imps.toDF().toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "10 minutes")
    val r = clicks.toDF().toDF("click_ts", "cad")
      .withWatermark("click_ts", "10 minutes")
    val joined = l.join(r,
      col("ad") === col("cad") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("ad"), col("imp_ts"), col("click_ts"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      imps.addData((ts("2024-01-01 10:00:00"), "a1"), (ts("2024-01-01 10:00:00"), "a2"))
      q.processAllAvailable()
      // in-range click joins; out-of-range (35 min later) click must not
      clicks.addData((ts("2024-01-01 10:10:00"), "a1"), (ts("2024-01-01 10:35:00"), "a2"))
      q.processAllAvailable()
      // advance both watermarks far past the interval end
      imps.addData((ts("2024-01-01 12:00:00"), "zz"))
      clicks.addData((ts("2024-01-01 12:00:00"), "zz"))
      q.processAllAvailable()
      // a click for a1 arriving with event-time far behind the watermark:
      // its matching state has been evicted, so no late duplicate appears
      clicks.addData((ts("2024-01-01 10:11:00"), "a1"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT ad, click_ts FROM ss_join").collect()
        .map(row => (row.getString(0), row.getTimestamp(1).toString)).toList
      assert(rows.contains(("a1", "2024-01-01 10:10:00.0")), s"missing in-range match: $rows")
      assert(!rows.exists(_._1 == "a2"), s"out-of-range click joined: $rows")
      assert(rows.count(_._1 == "a1") == 1, s"evicted-state late click re-joined: $rows")
    } finally q.stop()
  }

  test("stream_join's interval join runs unchanged under readStream and " +
      "equals the batch row") {
    // the oracle-checked stream_join is the BATCH formulation; this drives
    // the identical click→purchase interval join as a true stream-stream
    // self-join over the events parquet (watermarks on both sides, append
    // mode) and asserts exact parity with the batch result
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val tsConv =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000"))
      else col("ts").cast("timestamp")
    val ev = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sf)
      .withColumn("ts", tsConv)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val buys = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("b_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    val joined = clicks.join(buys,
      col("user_id") === col("b_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 4 HOURS"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000")
          .as("lag_sec"))
    val q = joined.writeStream.format("memory").queryName("ss_attr")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.sql(
        "SELECT user_id, click_id, purchase_id, lag_sec FROM ss_attr")
      .orderBy("click_id", "purchase_id").collect().toSeq
    val batch = ops.Streaming.stream_join(spark, sf)
      .orderBy("click_id", "purchase_id").collect().toSeq
    assert(batch.nonEmpty, "fixture must produce attribution pairs")
    assert(streamed == batch)
  }

  test("stream-stream LEFT OUTER join null-pads unmatched rows only after " +
      "the watermark closes their match window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the outer complement of the interval-join test: an impression with
    // no click must eventually emit (ad, null) — but ONLY once the
    // watermark proves no in-range click can still arrive; until then the
    // engine holds it in state and emits nothing for it
    val imps = MemoryStream[(Timestamp, String)]
    val clicks = MemoryStream[(Timestamp, String)]
    val l = imps.toDF().toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "10 minutes")
    val r = clicks.toDF().toDF("click_ts", "cad")
      .withWatermark("click_ts", "10 minutes")
    val joined = l.join(r,
      col("ad") === col("cad") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
      .select(col("ad"), col("imp_ts"), col("click_ts"))
    val q = joined.writeStream.format("memory").queryName("ss_left")
      .outputMode("append").start()
    try {
      imps.addData((ts("2024-01-01 10:00:00"), "a1"),
        (ts("2024-01-01 10:00:00"), "a2"))
      clicks.addData((ts("2024-01-01 10:10:00"), "a1"))
      q.processAllAvailable()
      val early = spark.sql("SELECT ad FROM ss_left WHERE click_ts IS NULL")
        .collect()
      assert(early.isEmpty,
        s"null-padded row emitted before the watermark closed: " +
          s"${early.toList}")
      // advance both watermarks far past a2's 30-min window + 10-min lag
      imps.addData((ts("2024-01-01 12:00:00"), "zz"))
      clicks.addData((ts("2024-01-01 12:00:00"), "zz"))
      q.processAllAvailable()
      // one more tick so the state store finalizes evictions
      imps.addData((ts("2024-01-01 13:00:00"), "zz2"))
      clicks.addData((ts("2024-01-01 13:00:00"), "zz2"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT ad, click_ts FROM ss_left").collect()
        .map(row => (row.getString(0), Option(row.getTimestamp(1))
          .map(_.toString).orNull)).toList
      assert(rows.contains(("a1", "2024-01-01 10:10:00.0")),
        s"matched row missing: $rows")
      assert(rows.contains(("a2", null)),
        s"unmatched impression never null-padded: $rows")
      assert(rows.count(_._1 == "a2") == 1,
        s"outer row emitted more than once: $rows")
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps per-key running state across batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    // custom-state aggregation (SURVEY §2-I): per-user running (count, sum)
    // that survives micro-batch boundaries via GroupState
    val mem = MemoryStream[(String, Long)]
    val counted = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: String, events: Iterator[(String, Long)],
            state: GroupState[(Long, Long)]) =>
          var (n, total) = state.getOption.getOrElse((0L, 0L))
          events.foreach { e => n += 1; total += e._2 }
          state.update((n, total))
          Iterator((user, n, total))
      }
      .toDF("user", "n", "total")
    val q = counted.writeStream.format("memory").queryName("fmgws")
      .outputMode("append").start()
    try {
      mem.addData(("u1", 5L), ("u1", 7L), ("u2", 1L))
      q.processAllAvailable()
      mem.addData(("u1", 3L))
      q.processAllAvailable()
      val last = spark.sql("SELECT user, n, total FROM fmgws").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      assert(last("u1") == ("u1", 3L, 15L), s"state lost across batches: $last")
      assert(last("u2") == ("u2", 1L, 1L))
    } finally q.stop()
  }

  test("event-time state timeout closes idle sessions when the " +
      "watermark passes") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    // per-user session via flatMapGroupsWithState with EventTimeTimeout:
    // the session closes (emits) only when the WATERMARK passes
    // last-event + 30 min — the state-expiry mechanism scale
    // sessionization relies on (NoTimeout state lives forever)
    val mem = MemoryStream[(String, Timestamp)]
    val sessions = mem.toDS().toDF("user", "ts")
      .withWatermark("ts", "10 minutes")
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Int), (String, Int, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: String, evs: Iterator[(String, Timestamp)],
            state: GroupState[(Long, Long, Int)]) =>
          if (state.hasTimedOut) {
            val (start, end, n) = state.get
            state.remove()
            Iterator((user, n, (end - start) / 1000))
          } else {
            val times = evs.map(_._2.getTime).toSeq
            val prev = state.getOption.getOrElse(
              (times.min, times.max, 0))
            val st = (math.min(prev._1, times.min),
              math.max(prev._2, times.max), prev._3 + times.size)
            state.update(st)
            state.setTimeoutTimestamp(st._2 + 30L * 60 * 1000)
            Iterator.empty
          }
      }
      .toDF("user", "n_events", "dur_s")
    val q = sessions.writeStream.format("memory").queryName("ett_sessions")
      .outputMode("append").start()
    try {
      mem.addData(("u1", ts("2024-01-01 10:00:00")),
        ("u1", ts("2024-01-01 10:05:00")),
        ("u1", ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // u1's state must still be open: watermark hasn't reached 10:40
      assert(spark.sql("SELECT * FROM ett_sessions").count() == 0)
      // a far-future event advances the watermark past u1's timeout
      mem.addData(("u2", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // timeouts fire on the batch AFTER the watermark advances
      mem.addData(("u2", ts("2024-01-01 12:00:01")))
      q.processAllAvailable()
      val closed = spark.sql(
        "SELECT user, n_events, dur_s FROM ett_sessions").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      assert(closed.contains(("u1", 3, 600L)),
        s"u1's 3-event 600 s session should have closed, got ${closed.toSeq}")
    } finally q.stop()
  }

  test("streaming funnel state machine reaches the batch win_funnel depths") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    // replay the REAL events table in global ts order across three
    // micro-batches; because the feed is time-sorted, the greedy
    // transition (take the first eligible event per stage) computes
    // exactly the batch semantics (min view; min click strictly after
    // it; min purchase strictly after that). Within a batch the
    // iterator is re-sorted — flatMapGroupsWithState guarantees no
    // intra-batch order.
    val rows = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect().sortBy(r => (r._3, r._2))
    val mem = MemoryStream[(Long, String, Long)]
    val depths = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Int)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[(Long, String, Long)],
            state: GroupState[(Long, Long, Long)]) =>
          var (fv, fc, fp) = state.getOption.getOrElse((0L, 0L, 0L))
          evs.toSeq.sortBy(_._3).foreach { case (_, typ, t) =>
            typ match {
              case "view" if fv == 0L => fv = t
              case "click" if fv != 0L && t > fv && fc == 0L => fc = t
              case "purchase" if fc != 0L && t > fc && fp == 0L => fp = t
              case _ => ()
            }
          }
          state.update((fv, fc, fp))
          val depth = if (fp != 0L) 3 else if (fc != 0L) 2 else 1
          if (fv == 0L) Iterator.empty else Iterator((user, depth))
      }
      .toDF("user_id", "depth")
    val q = depths.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1))
        .foreach { batch => mem.addData(batch.toSeq); q.processAllAvailable() }
      // depth is monotone per user, so the max emitted = the final state
      val streamed = spark.sql(
        "SELECT user_id, max(depth) FROM funnel_stream GROUP BY 1")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = ops.Windows.win_funnel(spark, sf)
        .select("user_id", "depth").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed == batch,
        s"stream/batch funnel drift: only-stream=${streamed.toSet -- batch.toSet}, " +
          s"only-batch=${batch.toSet -- streamed.toSet}")
    } finally q.stop()
  }

  test("streaming LOCF carries the last purchase value forward and " +
      "reaches the batch win_fill fills") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    // the streaming twin of win_fill: per-user last-purchase-value state
    // carried across micro-batches; the feed is (ts, event_id)-ordered
    // like the funnel test, so each event's emitted fill equals the
    // batch window's running last(ignoreNulls) at that row exactly
    val rows = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")))
      .as[(Long, Long, String, Double, Long)].collect()
      .sortBy(r => (r._5, r._2))
    val mem = MemoryStream[(Long, Long, String, Double, Long)]
    val filled = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Double, (Long, Option[Double])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, evs: Iterator[(Long, Long, String, Double, Long)],
            state: GroupState[Double]) =>
          var last = state.getOption
          val out = evs.toSeq.sortBy(e => (e._5, e._2)).map { e =>
            if (e._3 == "purchase") last = Some(e._4)
            (e._2, last)
          }
          last.foreach(state.update)
          out.iterator
      }
      .toDF("event_id", "v_fill")
    val q = filled.writeStream.format("memory").queryName("locf_stream")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1))
        .foreach { batch => mem.addData(batch.toSeq); q.processAllAvailable() }
      val streamed = spark.sql("SELECT event_id, v_fill FROM locf_stream")
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val batch = ops.Windows.win_fill(spark, sf)
        .select("event_id", "v_fill").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(streamed.size == batch.size, "row-count drift")
      val drift = batch.collect {
        case (id, v) if streamed.get(id).exists(_ != v) =>
          (id, v, streamed(id))
      }
      assert(drift.isEmpty, s"stream/batch LOCF drift (first 5): " +
        s"${drift.take(5)}")
    } finally q.stop()
  }

  test("streaming EMA: the mapGroupsWithState running value reaches the " +
      "batch win_ema fold bit-identically") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    // the streaming twin win_ema's scaladoc claims: per-user
    // (count, ema) state folded across micro-batches in the same
    // (ts, event_id) order and the same IEEE operand order as the batch
    // `aggregate` HOF — so the FINAL per-user value must equal the batch
    // row's double exactly, not approximately
    val rows = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")))
      .as[(Long, Long, Double, Long)].collect()
      .sortBy(r => (r._4, r._2))
    val mem = MemoryStream[(Long, Long, Double, Long)]
    val folded = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[(Long, Long, Double, Long)],
            state: GroupState[(Long, Double)]) =>
          var (n, ema) = state.getOption.getOrElse((0L, 0.0))
          evs.toSeq.sortBy(e => (e._4, e._2)).foreach { e =>
            ema = if (n == 0L) e._3 else ema * 0.75 + e._3 * 0.25
            n += 1
          }
          state.update((n, ema))
          Iterator((user, n, ema))
      }
      .toDF("user_id", "n_events", "ema")
    val q = folded.writeStream.format("memory").queryName("ema_stream")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1))
        .foreach { batch => mem.addData(batch.toSeq); q.processAllAvailable() }
      // the per-user row with the highest count is the final state
      val streamed = spark.sql(
          """SELECT user_id, n_events, ema FROM (
               SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY n_events DESC) AS rn FROM ema_stream) WHERE rn = 1""")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      val batch = ops.Windows.win_ema(spark, sf)
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getDouble(2))))
        .toMap
      assert(streamed.keySet == batch.keySet, "user-set drift")
      val drift = batch.collect {
        case (u, v) if streamed(u) != v => (u, v, streamed(u))
      }
      assert(drift.isEmpty,
        s"stream/batch EMA drift (first 5): ${drift.take(5)}")
    } finally q.stop()
  }

  test("streaming drawdown: O(1) running-max state reaches the batch " +
      "win_drawdown values bit-identically") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    // win_drawdown's streaming twin: per-user (n, run_max, max_dd, peak)
    // folded across micro-batches in the same (ts, event_id) order; the
    // deficit is the same single IEEE subtraction the batch window runs,
    // so the final row must equal the batch row EXACTLY (raw doubles)
    val rows = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")))
      .as[(Long, Long, Double, Long)].collect()
      .sortBy(r => (r._4, r._2))
    val mem = MemoryStream[(Long, Long, Double, Long)]
    val folded = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double, Double, Double),
          (Long, Long, Double, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[(Long, Long, Double, Long)],
            state: GroupState[(Long, Double, Double, Double)]) =>
          var (n, runMax, maxDd, peak) =
            state.getOption.getOrElse((0L, 0.0, 0.0, 0.0))
          evs.toSeq.sortBy(e => (e._4, e._2)).foreach { e =>
            runMax = if (n == 0L) e._3 else math.max(runMax, e._3)
            peak = runMax
            val dd = runMax - e._3
            maxDd = if (n == 0L) dd else math.max(maxDd, dd)
            n += 1
          }
          state.update((n, runMax, maxDd, peak))
          Iterator((user, n, maxDd, peak))
      }
      .toDF("user_id", "n_ticks", "max_drawdown", "peak_value")
    val q = folded.writeStream.format("memory").queryName("dd_stream")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1))
        .foreach { batch => mem.addData(batch.toSeq); q.processAllAvailable() }
      val streamed = spark.sql(
          """SELECT user_id, n_ticks, max_drawdown, peak_value FROM (
               SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY n_ticks DESC) AS rn FROM dd_stream) WHERE rn = 1""")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      val batch = ops.Windows.win_drawdown(spark, sf)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(3), r.getDouble(1), r.getDouble(2)))).toMap
      assert(streamed.keySet == batch.keySet, "user-set drift")
      val drift = batch.collect {
        case (u, v) if streamed(u) != v => (u, v, streamed(u))
      }
      assert(drift.isEmpty,
        s"stream/batch drawdown drift (first 5): ${drift.take(5)}")
    } finally q.stop()
  }

  test("streaming CUSUM: a single-long drift state reproduces every " +
      "batch dq_cusum row exactly across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    // dq_cusum's live form: the med2 reference is TRAINED (here: the
    // same per-type doubled median the batch op derives), then the
    // monitor folds S2 = max(0, S2 + d2) as each day closes — state is
    // ONE long per event type, never the history. All-integer
    // arithmetic, so stream == batch is exact equality on every
    // (type, day) row, proving the state carry across micro-batch
    // boundaries equals the batch closed form.
    val batchRows = ops.Quality.dq_cusum(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val med2 = batchRows.map(r => (r._1, r._4)).toMap
    // feed (type, day_ms, n) in global day order → per-type day order
    val feed = batchRows.map(r => (r._1, r._2, r._3)).sortBy(r => (r._2, r._1))
    val mem = MemoryStream[(String, Long, Long)]
    val folded = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long, Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (t: String, days: Iterator[(String, Long, Long)],
            state: GroupState[Long]) =>
          var s2 = state.getOption.getOrElse(0L)
          val m2 = med2(t)
          val out = days.toSeq.sortBy(_._2).map { case (_, day, n) =>
            s2 = math.max(0L, s2 + (2 * n - m2 - m2 / 5))
            (t, day, s2, s2 > 2 * m2)
          }
          state.update(s2)
          out.iterator
      }
      .toDF("event_type", "day_ms", "cusum2", "alarm")
    val q = folded.writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    try {
      feed.grouped(math.max(1, feed.length / 4 + 1))
        .foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
      val streamed = spark.table("cusum_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getBoolean(3)))).toMap
      val want = batchRows.map(r => (r._1, r._2) -> ((r._5, r._6))).toMap
      assert(streamed.size == want.size,
        s"row-count drift: ${streamed.size} vs ${want.size}")
      val drift = want.collect {
        case (k, v) if streamed.get(k) != Some(v) => (k, v, streamed.get(k))
      }
      assert(drift.isEmpty,
        s"stream/batch CUSUM drift (first 5): ${drift.take(5)}")
    } finally q.stop()
  }

  test("streaming interpolation: punctuated gap-fill state reaches the " +
      "batch win_interp values bit-identically") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    // the streaming form of win_interp: gap rows BUFFER per user until
    // the closing observation arrives (punctuation), then emit with the
    // identical IEEE div/mul/add the batch row runs; rows after the last
    // observation flush as LOCF on an end-of-stream sentinel (in
    // production: an event-time timeout). State is bounded by the gap
    // length between observations, never the history.
    val rows = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")))
      .as[(Long, Long, String, Double, Long)].collect()
      .sortBy(r => (r._5, r._2))
    val sentinels = rows.map(_._1).distinct
      .map(u => (u, -1L, "__end", 0.0, Long.MaxValue))
    val mem = MemoryStream[(Long, Long, String, Double, Long)]
    // state: (last obs (t, v) if any, pending gap rows (event_id, t))
    val filled = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[
        (Option[(Long, Double)], Seq[(Long, Long)]),
        (Long, Option[Double])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, evs: Iterator[(Long, Long, String, Double, Long)],
            state: GroupState[(Option[(Long, Double)], Seq[(Long, Long)])]) =>
          var (last, pending) = state.getOption.getOrElse(
            (Option.empty[(Long, Double)], Seq.empty[(Long, Long)]))
          val out = List.newBuilder[(Long, Option[Double])]
          evs.toSeq.sortBy(e => (e._5, e._2)).foreach {
            case (_, _, "__end", _, _) =>
              // after the last observation: LOCF (None before the first)
              pending.reverse.foreach { case (id, _) =>
                out += ((id, last.map(_._2)))
              }
              pending = Seq.empty
            case (_, id, "purchase", v, t) =>
              pending.reverse.foreach { case (gid, gt) =>
                out += ((gid, last match {
                  case Some((pt, pv)) if t != pt =>
                    Some(pv + (v - pv) *
                      ((gt - pt).toDouble / (t - pt).toDouble))
                  case Some((_, pv)) => Some(pv)
                  case None => None
                }))
              }
              pending = Seq.empty
              last = Some((t, v))
              out += ((id, Some(v)))
            case (_, id, _, _, t) =>
              pending = (id, t) +: pending
          }
          state.update((last, pending))
          out.result().iterator
      }
      .toDF("event_id", "v_interp")
    val q = filled.writeStream.format("memory").queryName("interp_stream")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1))
        .foreach { batch => mem.addData(batch.toSeq); q.processAllAvailable() }
      mem.addData(sentinels.toSeq); q.processAllAvailable()
      val streamed = spark.sql("SELECT event_id, v_interp FROM interp_stream")
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val batch = ops.Windows.win_interp(spark, sf)
        .select("event_id", "v_interp").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(streamed.size == batch.size,
        s"row-count drift: ${streamed.size} vs ${batch.size}")
      val drift = batch.collect {
        case (id, v) if streamed.get(id) != Some(v) => (id, v, streamed.get(id))
      }
      assert(drift.isEmpty,
        s"stream/batch interpolation drift (first 5): ${drift.take(5)}")
    } finally q.stop()
  }

  test("stories sessionization emits the batch answer under readStream via the connector") {
    import org.apache.spark.sql.streaming.Trigger
    // the same session_window the batch query uses, driven through the
    // connector's MicroBatchStream in append mode: sessions finalize when
    // the watermark passes, so a far-future sentinel page pushes every
    // real session out
    val work = java.nio.file.Files.createTempDirectory("asana_sess").toFile
    val pages = new java.io.File(work, "pages/stories")
    pages.mkdirs()
    java.nio.file.Files.copy(
      new java.io.File(s"${ops.Sources.fixtureDir}/stories.jsonl").toPath,
      new java.io.File(pages, "page_000.jsonl").toPath)
    val ckpt = new java.io.File(work, "ckpt").getPath
    val out = new java.io.File(work, "out").getPath
    def runOnce(): Unit = {
      val stream = spark.readStream.format("graft.asana.AsanaSource")
        .option("entity", "stories").option("fixtureDir", work.getPath).load()
        .withWatermark("created_at", "1 minute")
        .groupBy(col("target_gid"),
          session_window(col("created_at"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("target_gid"), col("n_events"))
      val q = stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      // a false return would leave the query running and the next runOnce
      // racing it on the same checkpoint — fail clearly instead
      assert(q.awaitTermination(120000), "AvailableNow run did not drain")
    }
    runOnce()
    // sentinel stories far in the future → watermark passes all real
    // sessions; append emits against the PREVIOUS batch's watermark, so a
    // second sentinel batch is what flushes sessions bordering the old max
    def sentinel(page: String, ts: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(pages, page))
      w.println(s"""{"gid": "sentinel_$page", "created_at": "$ts", "created_by": {"gid": "u0"}, "type": "system", "text": "x", "target": {"gid": "sentinel_task"}}""")
      w.close()
    }
    sentinel("page_001.jsonl", "2030-01-01T00:00:00.000Z")
    runOnce()
    sentinel("page_002.jsonl", "2031-01-01T00:00:00.000Z")
    runOnce()
    val streamed = spark.read.parquet(out)
      .select("target_gid", "n_events")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._1 != "sentinel_task").sorted.toSeq
    val batch = ops.Sources.asana_stories_sessions(spark, sf)
      .select(col("task_gid"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(streamed == batch,
      s"streaming sessions ${streamed.take(5)}... != batch ${batch.take(5)}...")
  }

  test("attachments stream incrementally with per-file offsets (no re-emission)") {
    import org.apache.spark.sql.streaming.Trigger
    // entity-generic streaming: the new attachments entity split across
    // two pages; the second page arrives after the first AvailableNow
    // drain and ONLY its rows are emitted on resume — same per-file
    // offset contract the tasks entity is tested under
    val work = java.nio.file.Files.createTempDirectory("asana_att").toFile
    val pages = new java.io.File(work, "pages/attachments")
    pages.mkdirs()
    import scala.jdk.CollectionConverters._
    // explicit UTF-8: the container's default charset is ASCII and the
    // fixture bytes are UTF-8
    val all = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"${ops.Sources.fixtureDir}/attachments.jsonl"),
      java.nio.charset.StandardCharsets.UTF_8).asScala.toSeq
    def writePage(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(new java.io.File(pages, name).toPath,
        lines.asJava, java.nio.charset.StandardCharsets.UTF_8)
    writePage("page_000.jsonl", all.take(8))
    val ckpt = new java.io.File(work, "ckpt").getPath
    val out = new java.io.File(work, "out").getPath
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.asana.AsanaSource")
        .option("entity", "attachments").option("fixtureDir", work.getPath)
        .load()
        .select("gid", "resource_subtype", "size")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "AvailableNow run did not drain")
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 8)
    writePage("page_001.jsonl", all.drop(8))
    runOnce()
    val streamed = spark.read.parquet(out).select("gid")
      .collect().map(_.getString(0)).sorted.toSeq
    val batch = spark.read.format("graft.asana.AsanaSource")
      .option("entity", "attachments")
      .option("fixtureDir", ops.Sources.fixtureDir).load()
      .select("gid").collect().map(_.getString(0)).sorted.toSeq
    assert(streamed == batch, s"stream/batch divergence: $streamed vs $batch")
  }

  test("incremental LSH dedup: streamed vectors join the persisted band table") {
    // the 100 TB incremental-ingest shape: the full corpus's band table
    // sits persisted (bucketed on band_key, pay-layout-once); an arriving
    // batch streams in, gets banded by the SAME deterministic hyperplanes,
    // and a stream-STATIC equi-join on band_key yields its near-dup
    // candidates against the whole corpus without reshuffling it. Replaying
    // the corpus itself as the stream must reproduce the batch candidate
    // set exactly.
    import spark.implicits._
    val bandTable = ops.Llm.lshBandTable(spark, sf)
    val schema = spark.read.parquet(s"$sf/embeddings.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(sf)
      .withColumn("emb", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("emb")).as[(Long, Array[Double])]
    val banded = ops.Llm.lshBandedVecs(stream,
      ops.Llm.LshBands, ops.Llm.LshRowsPerBand)
    val cand = banded
      .join(bandTable.select(col("band_key").as("bk"), col("vec_id").as("b")),
        col("band_key") === col("bk") && col("vec_id") < col("b"))
      .select(col("vec_id").as("a"), col("b"))
      .dropDuplicates("a", "b")
    val q = cand.writeStream.format("memory").queryName("lsh_inc")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "incremental LSH run did not drain")
    val streamed = spark.sql("SELECT a, b FROM lsh_inc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = ops.Llm.lshCandidates(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"streamed candidates diverge from batch: missing ${(batch -- streamed).take(5)}, extra ${(streamed -- batch).take(5)}")
  }

  test("incremental text dedup: micro-batches probe the persisted MinHash band table") {
    // the TEXT-side twin of the vector test above, driven through
    // foreachBatch because the MinHash signature is a per-doc
    // aggregation (a groupBy within the batch — not a stateless map, so
    // stream-static alone can't express it): the corpus's band table
    // sits persisted (bucketed, pay-layout-once); each arriving
    // micro-batch re-derives its docs' bands through the SAME shingle +
    // banding kernels and equi-joins the index for candidates against
    // the whole corpus. Replaying the corpus as the stream must
    // reproduce the batch candidate set exactly.
    import spark.implicits._
    val (band, _) = ops.Llm.dedupTextTables(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft_textinc")
      .toFile.getPath + "/cand"
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
      .select("doc_id", "text")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ops.Llm.minhashBandedOf(
            ops.Llm.shingleRowsOf(batch).select("doc_id", "sh"))
          .join(band.select(col("band_key").as("bk"), col("doc_id").as("b")),
            col("band_key") === col("bk") && col("doc_id") =!= col("b"))
          .select(least(col("doc_id"), col("b")).as("doc_a"),
            greatest(col("doc_id"), col("b")).as("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
          .write.mode("append").parquet(out)
      }
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "incremental text dedup did not drain")
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = ops.Llm.minhashCandidates(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"streamed text candidates diverge from batch: " +
        s"missing ${(batch -- streamed).take(5)}, " +
        s"extra ${(streamed -- batch).take(5)}")
  }

  test("incremental cross-batch dedup: THREE real micro-batches of new " +
      "docs against the persisted corpus ≡ the one-shot llm_dedup_incr " +
      "row (per-doc verdicts depend only on the corpus)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (band, sets) = ops.Llm.dedupIncrCorpus(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft_incr_par")
      .toFile.getPath + "/verdicts"
    val odd = graft.util.Tables.documents(spark, sf)
      .where(col("doc_id") % 2 === 1)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val mem = MemoryStream[(Long, String, String)]
    val q = mem.toDF().toDF("doc_id", "lang", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ops.Llm.dedupIncrBatch(batch, band, sets)
          .write.mode("append").parquet(out)
      }.start()
    try {
      // three genuinely separate micro-batches
      odd.grouped(math.max(1, odd.length / 3 + 1)).foreach { slice =>
        mem.addData(slice.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    val batch = ops.Llm.llm_dedup_incr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(streamed == batch,
      s"streamed verdicts diverge from the batch row: " +
        s"missing ${(batch -- streamed).take(3)}, " +
        s"extra ${(streamed -- batch).take(3)}")
  }

  test("incremental ANN ingest: THREE micro-batches of new embeddings " +
      "appended through the frozen quantizer ≡ the one-shot " +
      "llm_ann_incr row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the vector twin of the incremental-dedup parity: each micro-batch
    // encodes with the SAME persisted centroids and appends into the
    // cell layout — assignment is stateless per batch, so the
    // micro-batched index must probe identically to the one-shot one
    val cent = ops.Llm.trainIvfIncrCentroids(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_stream")
      .toFile.getPath + "/index"
    ops.Llm.ivfIncrWriteBase(spark, sf, dir)
    val odd = graft.util.Tables.embeddings(spark, sf)
      .withColumn("emb", col("embedding").cast("array<double>"))
      .where(col("vec_id") % 2 === 1)
      .select("vec_id", "emb").as[(Long, Array[Double])].collect()
    val mem = MemoryStream[(Long, Array[Double])]
    val q = mem.toDF().toDF("vec_id", "emb")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ops.Llm.ivfIncrAppend(batch, cent, dir)
      }.start()
    try {
      odd.grouped(math.max(1, odd.length / 3 + 1)).foreach { slice =>
        mem.addData(slice.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(desc("sim_raw"), asc("neighbor_id"))
    val streamed = ops.Llm.ivfIncrProbeDir(spark, sf, dir)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select(col("qid"), col("neighbor_id"), round(col("sim_raw"), 4),
        col("rn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val oneShot = ops.Llm.llm_ann_incr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(streamed == oneShot,
      s"micro-batched index probe diverges from the one-shot row: " +
        s"missing ${(oneShot -- streamed).take(3)}, " +
        s"extra ${(streamed -- oneShot).take(3)}")
  }

  test("foreachBatch + dynamic partition overwrite = incremental upsert sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the production incremental pattern: each micro-batch rewrites ONLY
    // the partitions it touches (dynamic overwrite), so a late re-emission
    // of an old partition replaces that partition's state without
    // disturbing the rest — the semantics sink_partition_overwrite proves
    // for batch, driven here from a real stream
    val work = java.nio.file.Files.createTempDirectory("graft_upsert").toFile
    val out = new java.io.File(work, "out").getPath
    val mem = MemoryStream[(Int, String, Double)]
    val q = mem.toDF().toDF("year", "k", "amount")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("year").parquet(out)
      }.start()
    try {
      mem.addData((1994, "a", 10.0), (1994, "b", 20.0), (1995, "c", 5.0))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 3)
      // batch 2 re-emits 1994 (corrected) and adds 1996; 1995 must survive
      mem.addData((1994, "a", 11.0), (1996, "d", 7.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(out)
        .select("year", "k", "amount").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows == Set((1994, "a", 11.0), (1995, "c", 5.0), (1996, "d", 7.0)),
        s"upsert state wrong: $rows")
    } finally q.stop()
  }

  test("foreachBatch into GraftTable: streaming ingest = snapshot history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // streaming ingest through the table format: each micro-batch is one
    // atomic append commit, so (a) a reader mid-stream sees a complete
    // snapshot, never a half-written batch, and (b) the snapshot history
    // IS the replay log — changesBetween hands a downstream consumer
    // exactly the per-batch increments
    val root = java.nio.file.Files
      .createTempDirectory("graft_stream_table").toFile
    graft.util.AppCleanup.onExit(s"graft_stream_table_${root.getName}")(
      graft.util.AppCleanup.recursiveDelete(root))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "payload")
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val t = graft.table.GraftTable
            if (t.latestSnapshot(root.getPath) == 0)
              t.create(spark, root.getPath, batch, Seq("id"), Seq("id"),
                numFiles = 1)
            else
              t.append(spark, root.getPath, batch, Seq("id"), Seq("id"),
                numFiles = 1)
            ()
          }
      }.start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      mem.addData((4L, "d"), (5L, "e"))
      q.processAllAvailable()
      val t = graft.table.GraftTable
      assert(t.latestSnapshot(root.getPath) == 3)
      assert(t.read(spark, root.getPath).count() == 5)
      // per-batch increments replay exactly
      val b2 = t.changesBetween(spark, root.getPath, 1, 2)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(b2 == Set(3L), s"batch-2 increment wrong: $b2")
      val b3 = t.changesBetween(spark, root.getPath, 2, 3)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(b3 == Set(4L, 5L), s"batch-3 increment wrong: $b3")
    } finally q.stop()
  }

  test("native graft-table sink: exactly-once ingest — one commit per " +
      "batch, watermark in the manifest, a crash-replayed batch lands " +
      "zero duplicate rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_sink_table").toFile.getPath
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sink_ckpt").toFile.getPath
    graft.util.AppCleanup.onExit(s"graft_sink_table_$root") {
      graft.util.AppCleanup.recursiveDelete(new java.io.File(root))
      graft.util.AppCleanup.recursiveDelete(new java.io.File(ckpt))
    }
    // the sink appends to an EXISTING table — create carries the schema
    t.create(spark, root,
      Seq((0L, "seed")).toDF("id", "payload"), Seq("id"), Seq("id"),
      numFiles = 1)
    val mem = MemoryStream[(Long, String)]
    def start() = mem.toDF().toDF("id", "payload")
      .writeStream.format("graft-table") // short name via META-INF
      .option("path", root)
      .option("stats", "id").option("cluster", "id")
      .option("num_files", "1")
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    val qid =
      try {
        mem.addData((1L, "a"), (2L, "b"))
        q1.processAllAvailable()
        mem.addData((3L, "c"))
        q1.processAllAvailable()
        q1.id.toString
      } finally q1.stop()
    assert(t.read(spark, root).count() == 4)
    val mLast = t.manifest(root, t.latestSnapshot(root))
    assert(mLast.stream.exists(_.get(qid).contains(1L)),
      s"manifest must record the query's batch watermark: ${mLast.stream}")
    // CRASH between the data commit and the engine's checkpoint commit:
    // erase the last checkpoint commit marker so the restarted query
    // REPLAYS batch 1 — the watermark guard must skip it, zero dupes
    val lastCommit = new java.io.File(s"$ckpt/commits/1")
    assert(lastCommit.exists, "fixture: expected checkpoint commit 1")
    assert(lastCommit.delete())
    // the local checksum FS refuses a rename onto a stale sidecar
    new java.io.File(s"$ckpt/commits/.1.crc").delete()
    val vBefore = t.latestSnapshot(root)
    val q2 = start()
    try {
      q2.processAllAvailable() // replays batch 1 (rows (3, c))
      assert(t.read(spark, root).count() == 4,
        "a replayed batch must land ZERO duplicate rows")
      assert(t.read(spark, root).where(col("id") === 3L).count() == 1)
      // the replay committed NOTHING (idempotent skip, not a re-write)
      assert(t.latestSnapshot(root) == vBefore,
        "the replayed batch must not add a snapshot")
      // and the stream keeps working past the replay
      mem.addData((4L, "d"))
      q2.processAllAvailable()
      assert(t.read(spark, root).count() == 5)
      assert(t.manifest(root, t.latestSnapshot(root)).stream
        .exists(_.get(qid).contains(2L)))
    } finally q2.stop()
    // non-streaming misuse is loud
    val e = intercept[Exception] {
      Seq((9L, "x")).toDF("id", "payload")
        .write.format("graft-table").save(root)
    }
    assert(e != null)
  }

  test("graft-table sink key option: batch-local dups, NULL keys and " +
      "clashes with live table keys are loud; clean batches land") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_sink_key").toFile.getPath
    val ckptBase = java.nio.file.Files
      .createTempDirectory("graft_sink_key_ck").toFile.getPath
    graft.util.AppCleanup.onExit(s"graft_sink_key_$root") {
      graft.util.AppCleanup.recursiveDelete(new java.io.File(root))
      graft.util.AppCleanup.recursiveDelete(new java.io.File(ckptBase))
    }
    t.create(spark, root, Seq((1L, "seed")).toDF("id", "payload"),
      Seq("id"), Seq("id"), numFiles = 1)
    var n = 0
    def run(rows: (Long, String)*): Either[String, Long] = {
      n += 1
      val mem = MemoryStream[(Long, String)]
      mem.addData(rows: _*)
      val q = mem.toDF().toDF("id", "payload")
        .writeStream.format("graft-table")
        .option("path", root).option("key", "id")
        .option("num_files", "1")
        .option("checkpointLocation", s"$ckptBase/$n").start()
      try { q.processAllAvailable(); Right(t.read(spark, root).count()) }
      catch { case e: Exception =>
        Left(Iterator.iterate[Throwable](e)(_.getCause)
          .takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
      } finally q.stop()
    }
    assert(run((2L, "a"), (3L, "b")) == Right(3L))
    val dup = run((4L, "x"), (4L, "y"))
    assert(dup.left.exists(_.contains("duplicate 'id' keys")), dup)
    val clash = run((2L, "again"))
    assert(clash.left.exists(_.contains("re-uses a 'id' key")), clash)
    assert(run((0L, "n")) == Right(4L),
      "a clean batch after rejected ones must land")
    // NULL key via an explicit null row
    val mem = MemoryStream[Long]
    mem.addData(9L)
    val qn = mem.toDF()
      .select(when(col("value") === 9L, lit(null)).otherwise(col("value"))
          .cast("long").as("id"),
        lit("p").as("payload"))
      .writeStream.format("graft-table")
      .option("path", root).option("key", "id")
      .option("checkpointLocation", s"$ckptBase/nul").start()
    val msgs =
      try { qn.processAllAvailable(); "" }
      catch { case e: Exception =>
        Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      } finally qn.stop()
    assert(msgs.contains("NULL 'id' key"), msgs)
    // failures landed nothing
    assert(t.read(spark, root).count() == 4) // seed + a + b + n(=0L ok)
  }

  test("graft-table sink mergeSchema: a batch with a NEW column widens " +
      "the manifest in the exactly-once commit; loud without the option") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_sink_evo").toFile.getPath
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sink_evo_ck").toFile.getPath
    graft.util.AppCleanup.onExit(s"graft_sink_evo_$root") {
      graft.util.AppCleanup.recursiveDelete(new java.io.File(root))
      graft.util.AppCleanup.recursiveDelete(new java.io.File(ckpt))
    }
    t.create(spark, root,
      Seq((0L, "seed")).toDF("id", "payload"), Seq("id"), Seq("id"),
      numFiles = 1)
    // the widened stream: upstream added `score` (and REORDERED the
    // old columns — alignment is part of the contract)
    val mem = MemoryStream[(String, Long, Double)]
    val wide = mem.toDF().toDF("payload", "id", "score")
    // loud without the opt-in: ingestion must not silently widen
    val q0 = wide.writeStream.format("graft-table")
      .option("path", root).option("num_files", "1")
      .option("checkpointLocation", ckpt + "0").start()
    try {
      mem.addData(("a", 1L, 0.1))
      val e = intercept[Exception] { q0.processAllAvailable() }
      val msgs = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("schema mismatch"),
        s"strict sink must reject the widened batch: $msgs")
    } finally q0.stop()
    assert(t.read(spark, root).count() == 1, "the rejected batch landed")
    val q = wide.writeStream.format("graft-table")
      .option("path", root).option("num_files", "1")
      .option("mergeSchema", "true")
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData(("b", 2L, 0.2))
      q.processAllAvailable()
    } finally q.stop()
    val v = t.latestSnapshot(root)
    assert(t.manifest(root, v).op == "append_evolve")
    val r = t.read(spark, root).orderBy("id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // pre-evolution rows read NULL for the new column; the aligned
    // batch lands its reordered values in the right columns
    assert(r(0).isNullAt(2) && r(2).getString(1) == "b" &&
      r(2).getDouble(2) == 0.2)
  }

  test("graft-table sink into a PARTITIONED table: micro-batch commits " +
      "honor the declared layout, partition pruning works on the result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_sink_part").toFile.getPath
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sink_part_ckpt").toFile.getPath
    graft.util.AppCleanup.onExit(s"graft_sink_part_$root") {
      graft.util.AppCleanup.recursiveDelete(new java.io.File(root))
      graft.util.AppCleanup.recursiveDelete(new java.io.File(ckpt))
    }
    // partitioning is a TABLE property — the sink must honor it with
    // zero sink-side configuration (partitionBy on the sink is loud)
    t.create(spark, root,
      Seq((0L, 0L, "seed")).toDF("id", "p", "payload"),
      Seq("id"), Seq("id"), numFiles = 1, partitionCols = Seq("p"))
    val mem = MemoryStream[(Long, Long, String)]
    val q = mem.toDF().toDF("id", "p", "payload")
      .writeStream.format("graft-table")
      .option("path", root).option("stats", "id")
      .option("cluster", "id").option("num_files", "1")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((1L, 1L, "a"), (2L, 2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, 1L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val m = t.manifest(root, t.latestSnapshot(root))
    assert(m.partitionCols.contains(List("p")),
      "stream commits must carry the partition declaration")
    assert(m.files.forall(f =>
      f.path.matches("data/p=\\d+/c-.+\\.parquet")), m.files)
    val r = t.read(spark, root)
    assert(r.count() == 4)
    assert(r.where(col("p") === 1L).count() == 2)
    val scans = r.where(col("p") === 1L)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scans.exists(_.partitionFilters.nonEmpty),
      "the stream-built table must partition-prune like a batch-built one")
  }

  test("maxSnapshotsPerTrigger rate-limits the GraftTable stream: a long " +
      "history drains in bounded batches, totals equal the batch read") {
    import spark.implicits._
    val t = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_table_rate").toFile
    graft.util.AppCleanup.onExit(s"graft_table_rate_${root.getName}")(
      graft.util.AppCleanup.recursiveDelete(root))
    def ids(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    t.create(spark, root.getPath, ids(1, 10), Seq("id"), Seq("id"),
      numFiles = 1)                                              // v1
    (1 to 5).foreach { k =>                                      // v2..v6
      t.append(spark, root.getPath, ids(10 * k + 1, 10 * k + 10),
        Seq("id"), Seq("id"), numFiles = 1)
    }
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    // default trigger + processAllAvailable: getOffset is re-polled per
    // batch so the cap advances two commits at a time (the AvailableNow
    // latch would stop at the first capped offset — documented caveat)
    val q = spark.readStream
      .format("graft.table.GraftTableStreamProvider")
      .option("path", root.getPath)
      .option("maxSnapshotsPerTrigger", "2")
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(_.getAs[Long]("id"))
        got.synchronized { got ++= rows; batchSizes += rows.length }; ()
      }
      .start()
    try {
      q.processAllAvailable()
      // 6 commits at cap 2: initial batch covers v1..v2 (full read at
      // snapshot 2), then (2,4], (4,6] — 3 non-empty batches minimum
      assert(batchSizes.count(_ > 0) >= 3,
        s"history not digested in capped batches: $batchSizes")
      assert(batchSizes.max <= 30,
        s"a batch exceeded the 2-commit bound: $batchSizes")
      assert(got.sorted == (1L to 60L).toList,
        s"rate-limited drain lost/duplicated rows: ${got.sorted}")
      assert(got.size == t.read(spark, root.getPath).count(),
        "stream totals must equal the batch read")
    } finally q.stop()
  }

  test("capped GraftTable stream restarted from its checkpoint " +
      "mid-history: the rate-limit floor re-seeds from committed " +
      "progress — no duplicates, no stall (round-7 ADVICE)") {
    import spark.implicits._
    val t = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_table_restart").toFile
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_table_restart_ckpt").toFile
    Seq(root, ckpt).foreach(f =>
      graft.util.AppCleanup.onExit(s"graft_table_restart_${f.getName}")(
        graft.util.AppCleanup.recursiveDelete(f)))
    def ids(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    t.create(spark, root.getPath, ids(1, 10), Seq("id"), Seq("id"),
      numFiles = 1)                                              // v1
    (1 to 5).foreach { k =>                                      // v2..v6
      t.append(spark, root.getPath, ids(10 * k + 1, 10 * k + 10),
        Seq("id"), Seq("id"), numFiles = 1)
    }
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    // AvailableNow latches its drain target from ONE getOffset, so with
    // cap 2 each run advances exactly two commits and stops — a
    // mid-history stop by construction. Every run builds a FRESH source
    // instance (servedThrough = 0): progress across runs exists only if
    // the engine replays the committed batch through getBatch before
    // asking for a new offset, re-seeding the floor — the exact
    // restart-reseed assumption this test pins. If that replay ever
    // vanished, the capped offset would regress to the committed one and
    // the run would re-serve or stall, failing the per-run assertions.
    def runOnce(): Unit = {
      val q = spark.readStream
        .format("graft.table.GraftTableStreamProvider")
        .option("path", root.getPath)
        .option("maxSnapshotsPerTrigger", "2")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt.getPath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect().map(_.getAs[Long]("id"))
          got.synchronized { got ++= rows }; ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
    }
    runOnce() // batch 0: full read at the capped snapshot 2 → ids 1..20
    assert(got.sorted.toList == (1L to 20L).toList,
      s"first capped run must serve snapshots 1..2 once: ${got.sorted}")
    runOnce() // restart: floor re-seeds to 2, batch covers (2, 4]
    assert(got.sorted.toList == (1L to 40L).toList,
      s"restart must resume at commit 3, no re-serve: ${got.sorted}")
    runOnce() // (4, 6] — history fully drained across three restarts
    assert(got.sorted.toList == (1L to 60L).toList,
      s"capped restarts lost or duplicated rows: ${got.sorted}")
    assert(got.size == t.read(spark, root.getPath).count(),
      "restarted drain totals must equal the batch read")
  }

  test("readStream over GraftTable: AvailableNow tail equals the batch " +
      "read; checkpoint resumes per commit; merge gated by ignoreChanges") {
    import spark.implicits._
    val t = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_table_read_stream").toFile
    graft.util.AppCleanup.onExit(s"graft_table_rs_${root.getName}")(
      graft.util.AppCleanup.recursiveDelete(root))
    val ckpt = new java.io.File(root, "_ckpt").getPath
    def ids(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    t.create(spark, root.getPath, ids(1, 10), Seq("id"), Seq("id"),
      numFiles = 2)                                              // v1
    t.append(spark, root.getPath, ids(11, 20), Seq("id"), Seq("id"),
      numFiles = 2)                                              // v2
    t.append(spark, root.getPath, ids(21, 30), Seq("id"), Seq("id"),
      numFiles = 1)                                              // v3
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def drain(ignoreChanges: Boolean = false): Unit = {
      val q = spark.readStream
        .format("graft.table.GraftTableStreamProvider")
        .option("path", root.getPath)
        .option("ignoreChanges", ignoreChanges.toString)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect()
            .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload")))
          got.synchronized { got ++= rows }; ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
    }
    // run 1: initial batch = the full latest snapshot
    drain()
    assert(got.toSet == (1 to 30).map(i => (i.toLong, s"v$i")).toSet &&
      got.size == 30, s"initial catch-up wrong: ${got.sorted}")
    // run 2 from the same checkpoint: only the new commit's rows arrive
    t.append(spark, root.getPath, ids(31, 40), Seq("id"), Seq("id"),
      numFiles = 1)                                              // v4
    drain()
    assert(got.size == 40 &&
      got.toSet == (1 to 40).map(i => (i.toLong, s"v$i")).toSet,
      s"incremental tail wrong after append: ${got.sorted}")
    assert(got.toSet == t.read(spark, root.getPath).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet,
      "stream-read total must equal the batch read")
    // a merge commit breaks the append-only tail: fail loudly...
    t.merge(spark, root.getPath,
      Seq((5L, "UPD5"), (6L, "UPD6")).toDF("id", "payload"),
      "id", Seq("id"), Seq("id"), numFiles = 1)                  // v5
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain())
    def rootCause(e: Throwable): Throwable =
      if (e.getCause == null || e.getCause == e) e else rootCause(e.getCause)
    assert(rootCause(ex).isInstanceOf[UnsupportedOperationException] &&
      rootCause(ex).getMessage.contains("ignoreChanges"),
      s"expected the ignoreChanges gate, got: ${rootCause(ex)}")
    // ...then opt in: rewritten files re-deliver; dedup-by-key equals batch
    drain(ignoreChanges = true)
    val lastByKey = got.groupBy(_._1).map { case (k, vs) => (k, vs.last._2) }
    assert(lastByKey == t.read(spark, root.getPath).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap,
      "ignoreChanges tail + keyed dedup must reproduce the merged table")
    assert(lastByKey(5L) == "UPD5" && lastByKey(6L) == "UPD6")
  }

  test("CDC readStream over GraftTable: row-level change rows stream " +
      "per commit and replay to the live table") {
    import spark.implicits._
    val t = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_table_cdc_stream").toFile
    graft.util.AppCleanup.onExit(s"graft_cdc_rs_${root.getName}")(
      graft.util.AppCleanup.recursiveDelete(root))
    val ckpt = new java.io.File(root, "_ckpt").getPath
    t.create(spark, root.getPath,
      (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
      Seq("id"), Seq("id"), numFiles = 2)                        // v1
    val got = scala.collection.mutable
      .ArrayBuffer.empty[(Long, String, String, Int)]
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft.table.GraftTableStreamProvider")
        .option("path", root.getPath)
        .option("readChanges", "true").option("keyCol", "id")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect().map(r => (r.getAs[Long]("id"),
            r.getAs[String]("payload"), r.getAs[String]("_change_type"),
            r.getAs[Int]("_commit_snapshot")))
          got.synchronized { got ++= rows }; ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
    }
    // run 1: the starting snapshot arrives as inserts
    drain()
    assert(got.toSet ==
      (1 to 10).map(i => (i.toLong, s"v$i", "insert", 1)).toSet)
    // commits: append, merge (update 3 + insert 100), delete 9, compact
    t.append(spark, root.getPath,
      (11 to 15).map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
      Seq("id"), Seq("id"), numFiles = 1)                        // v2
    t.merge(spark, root.getPath,
      Seq((3L, "UPD3"), (100L, "new")).toDF("id", "payload"),
      "id", Seq("id"), Seq("id"), numFiles = 1)                  // v3
    t.delete(spark, root.getPath, Seq(9L).toDF("id"), "id",
      Seq("id"), Seq("id"))                                      // v4
    t.compact(spark, root.getPath, minRows = Long.MaxValue,
      Seq("id"), Seq("id"), numFiles = 1)                        // v5
    // run 2 from the checkpoint: the streamed delta must equal the
    // batch row-level CDC over the same commit range, merge and delete
    // included — CDC mode needs no ignoreChanges escape
    val before = got.size
    drain()
    val streamed = got.drop(before).toSet
    val batchCdc = t.changesBetweenRows(spark, root.getPath, 1, 5, "id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
        r.getAs[String]("_change_type"), r.getAs[Int]("_commit_snapshot")))
      .toSet
    assert(streamed == batchCdc,
      s"streamed CDC != batch CDC:\n streamed=$streamed\n batch=$batchCdc")
    assert(streamed.exists(_._3 == "update_preimage") &&
      streamed.exists(_._3 == "update_postimage") &&
      streamed.exists(_._3 == "delete"), s"change types missing: $streamed")
    assert(!streamed.exists(_._4 == 5), "compact must stream no changes")
    // replaying every streamed change over the initial state rebuilds
    // the live table exactly
    val replayed = got.sortBy(_._4).foldLeft(Map.empty[Long, String]) {
      case (m, (id, p, "insert", _)) => m + (id -> p)
      case (m, (id, p, "update_postimage", _)) => m + (id -> p)
      case (m, (id, _, "delete", _)) => m - id
      case (m, _) => m // preimages carry no state
    }
    val live = t.read(spark, root.getPath).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(replayed == live, "CDC replay must rebuild the live table")
    // run 3: merge-on-read commits stream exactly too — a DV delete
    // emits only its doomed rows, a DV upsert emits update pairs + the
    // insert, with zero file rewrite behind them (the (path, dv) diff
    // identity in changesBetweenRows is what the stream leans on)
    t.deleteMor(spark, root.getPath, Seq(4L).toDF("id"), "id")     // v6
    t.mergeMor(spark, root.getPath,
      Seq((5L, "MOR5"), (300L, "new300")).toDF("id", "payload"),
      "id", Seq("id"), Seq("id"), numFiles = 1)                    // v7
    val beforeMor = got.size
    drain()
    val morStreamed = got.drop(beforeMor).toSet
    assert(morStreamed.filter(_._4 == 6) ==
      Set((4L, "v4", "delete", 6)),
      s"DV delete must stream exactly its doomed row: $morStreamed")
    assert(morStreamed.filter(_._4 == 7) ==
      Set((5L, "v5", "update_preimage", 7),
        (5L, "MOR5", "update_postimage", 7),
        (300L, "new300", "insert", 7)),
      s"DV upsert must stream update pair + insert: $morStreamed")
  }

  test("streaming IVM: the signed CDC fold maintains a live aggregate " +
      "equal to recompute after every commit batch") {
    // the streaming twin of the oracle-checked table_incr_agg row: each
    // micro-batch's change rows fold into a stored per-group aggregate
    // (insert/postimage add, preimage/delete subtract) and the
    // maintained state must equal a full recompute of the live table
    // after every drain — including across copy-on-write AND
    // merge-on-read commits. Cost per refresh is O(changed rows).
    import spark.implicits._
    val t = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_table_ivm").toFile
    graft.util.AppCleanup.onExit(s"graft_ivm_${root.getName}")(
      graft.util.AppCleanup.recursiveDelete(root))
    val ckpt = new java.io.File(root, "_ckpt").getPath
    def rows(r: Range, amt: Long => Long) =
      r.map(i => (i.toLong, s"g${i % 3}", amt(i.toLong)))
        .toDF("id", "grp", "amount")
    t.create(spark, root.getPath, rows(1 to 20, _ * 10), Seq("id"),
      Seq("id"), numFiles = 2)                                    // v1
    val state = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft.table.GraftTableStreamProvider")
        .option("path", root.getPath)
        .option("readChanges", "true").option("keyCol", "id")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // the distributed half of the fold: per-group SIGNED partial
          // aggregates — O(changed rows) shuffled to O(groups) rows —
          // then the tiny delta merges into the stored aggregate
          val delta = b.withColumn("sign",
              when(col("_change_type")
                .isin("insert", "update_postimage"), 1L).otherwise(-1L))
            .groupBy("grp")
            .agg(sum(col("sign")).as("dn"),
              sum(col("sign") * col("amount")).as("dsum"))
            .collect()
          state.synchronized {
            delta.foreach { r =>
              val (n0, s0) = state.getOrElse(r.getString(0), (0L, 0L))
              state(r.getString(0)) =
                (n0 + r.getLong(1), s0 + r.getLong(2))
            }
          }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
      val direct = t.read(spark, root.getPath)
        .groupBy("grp").agg(count(lit(1)).as("n"), sum("amount").as("s"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      assert(state.filter(_._2 != ((0L, 0L))).toMap == direct,
        s"maintained aggregate diverged:\n state=$state\n direct=$direct")
    }
    drain()                                                       // v1
    t.append(spark, root.getPath, rows(21 to 25, _ * 10), Seq("id"),
      Seq("id"), numFiles = 1)                                    // v2
    t.merge(spark, root.getPath, rows(3 to 3, _ * 1000), "id",
      Seq("id"), Seq("id"), numFiles = 1)                         // v3
    t.delete(spark, root.getPath, Seq(9L).toDF("id"), "id",
      Seq("id"), Seq("id"))                                       // v4
    drain()                                                       // v2..v4
    t.deleteMor(spark, root.getPath, Seq(12L).toDF("id"), "id")   // v5
    t.mergeMor(spark, root.getPath, rows(5 to 5, _ * 777), "id",
      Seq("id"), Seq("id"), numFiles = 1)                         // v6
    drain()                                                       // v5..v6
  }

  test("streaming SCD2: per-batch interval maintenance over the CDC " +
      "stream equals batch scd2Of after every commit wave") {
    // the streaming twin of the oracle-checked table_scd2 row: each
    // micro-batch's change rows advance an interval store (postimage /
    // delete close the key's open interval at their commit, insert /
    // postimage open a new one) in O(changed keys) per refresh, and
    // the maintained store must equal the full batch scd2Of rebuild
    // after every drain — across updates, deletes, resurrections and
    // 3-version chains.
    import spark.implicits._
    val t = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_scd2_stream").toFile
    graft.util.AppCleanup.onExit(s"graft_scd2_rs_${root.getName}")(
      graft.util.AppCleanup.recursiveDelete(root))
    val ckpt = new java.io.File(root, "_ckpt").getPath
    t.create(spark, root.getPath,
      (1 to 6).map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
      Seq("id"), Seq("id"), numFiles = 2)                          // v1
    val open = scala.collection.mutable.Map.empty[Long, (Int, String)]
    val closed =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int, String)]
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft.table.GraftTableStreamProvider")
        .option("path", root.getPath)
        .option("readChanges", "true").option("keyCol", "id")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val evs = b.collect().map(r => (r.getAs[Long]("id"),
            r.getAs[String]("payload"), r.getAs[String]("_change_type"),
            r.getAs[Int]("_commit_snapshot")))
            .filter(_._3 != "update_preimage").sortBy(_._4)
          open.synchronized {
            evs.foreach {
              case (id, p, "insert", c) => open += id -> ((c, p))
              case (id, p, "update_postimage", c) =>
                val (f, v) = open(id)
                closed += ((id, f, c, v)); open += id -> ((c, p))
              case (id, _, "delete", c) =>
                val (f, v) = open(id)
                closed += ((id, f, c, v)); open -= id
              case _ => ()
            }
          }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
      // parity against the batch rebuild over the full log
      val got = (closed.map(x =>
        (x._1, x._2, Option(x._3), false, x._4)) ++
        open.map { case (k, (f, v)) => (k, f, None, true, v) }).toSet
      val batch = ops.Table.scd2Of(
        t.changesBetweenRows(spark, root.getPath, 0,
          t.latestSnapshot(root.getPath), "id")
          .select(col("id").as("o_orderkey"),
            col("payload").as("o_totalprice"),
            col("_change_type"), col("_commit_snapshot")))
        .collect().map(r => (r.getLong(0), r.getInt(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          r.getBoolean(3), r.getString(4))).toSet
      assert(got == batch,
        s"maintained SCD2 diverged:\n stream=$got\n batch=$batch")
    }
    drain()                                                        // v1
    t.merge(spark, root.getPath,
      Seq((1L, "m1"), (7L, "n7")).toDF("id", "payload"), "id",
      Seq("id"), Seq("id"), numFiles = 1)                          // v2
    t.delete(spark, root.getPath, Seq(2L).toDF("id"), "id",
      Seq("id"), Seq("id"))                                        // v3
    drain()                                                        // v2..v3
    t.merge(spark, root.getPath,
      Seq((2L, "r2"), (1L, "m1b")).toDF("id", "payload"), "id",
      Seq("id"), Seq("id"), numFiles = 1)                          // v4
    drain()               // resurrection + a third version for key 1
    assert(closed.exists(c => c._1 == 2L && c._3 == 3) &&
      open.get(2L).exists(_._1 == 4),
      "key 2 must close at the delete and reopen at the resurrection")
    assert(closed.count(_._1 == 1L) == 2 && open(1L)._2 == "m1b",
      "key 1 must chain three versions")
  }

  test("closed loop: CDC stream replicates one GraftTable into another " +
      "through foreachBatch merge/delete") {
    import spark.implicits._
    val t = graft.table.GraftTable
    val src = java.nio.file.Files
      .createTempDirectory("graft_repl_src").toFile
    val dst = java.nio.file.Files
      .createTempDirectory("graft_repl_dst").toFile
    Seq(src, dst).foreach(f =>
      graft.util.AppCleanup.onExit(s"graft_repl_${f.getName}")(
        graft.util.AppCleanup.recursiveDelete(f)))
    val ckpt = new java.io.File(src, "_ckpt").getPath
    t.create(spark, src.getPath,
      (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
      Seq("id"), Seq("id"), numFiles = 2)                        // v1
    def replicate(): Unit = {
      val q = spark.readStream
        .format("graft.table.GraftTableStreamProvider")
        .option("path", src.getPath)
        .option("readChanges", "true").option("keyCol", "id")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // apply the change feed in commit order: upserts (insert +
          // update_postimage) then deletes, one pass per source commit
          // so the replica's history mirrors the source's semantics
          val commits = b.select("_commit_snapshot").distinct()
            .collect().map(_.getInt(0)).sorted
          commits.foreach { v =>
            val step = b.where(col("_commit_snapshot") === v).cache()
            try {
              val ups = step
                .where(col("_change_type").isin("insert", "update_postimage"))
                .select("id", "payload")
              val dels = step.where(col("_change_type") === "delete")
                .select("id")
              if (!ups.isEmpty) {
                if (t.latestSnapshot(dst.getPath) == 0)
                  t.create(spark, dst.getPath, ups, Seq("id"), Seq("id"),
                    numFiles = 2)
                else t.merge(spark, dst.getPath, ups, "id", Seq("id"),
                  Seq("id"), numFiles = 1)
              }
              if (!dels.isEmpty)
                t.delete(spark, dst.getPath, dels, "id", Seq("id"),
                  Seq("id"))
            } finally { step.unpersist(); () }
          }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
    }
    replicate() // initial snapshot lands as the replica's create
    def stateOf(root: String) = t.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stateOf(dst.getPath) == stateOf(src.getPath))
    // mixed source commits, then one catch-up run from the checkpoint
    t.append(spark, src.getPath,
      (21 to 25).map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
      Seq("id"), Seq("id"), numFiles = 1)                        // v2
    t.merge(spark, src.getPath,
      Seq((7L, "UPD7"), (30L, "new30")).toDF("id", "payload"),
      "id", Seq("id"), Seq("id"), numFiles = 1)                  // v3
    t.delete(spark, src.getPath, Seq(2L, 21L).toDF("id"), "id",
      Seq("id"), Seq("id"))                                      // v4
    replicate()
    val (s2, d2) = (stateOf(src.getPath), stateOf(dst.getPath))
    assert(d2 == s2, s"replica diverged:\n src=$s2\n dst=$d2")
    assert(s2(7L) == "UPD7" && !s2.contains(2L) && s2.contains(30L))
  }

  test("dropDuplicatesWithinWatermark suppresses replays inside the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val dedup = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("k")
    val q = dedup.writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 10:00:00"), "a"), (ts("2024-01-01 10:05:00"), "a"))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 10:10:00"), "a"), (ts("2024-01-01 10:10:00"), "b"))
      q.processAllAvailable()
      val ks = spark.sql("SELECT k FROM wm_dedup").collect().map(_.getString(0)).toList
      assert(ks.sorted == List("a", "b"), s"expected one a and one b, got $ks")
    } finally q.stop()
  }

  test("decontamination runs as a stream-static join with batch parity") {
    // the incremental-ingest shape of llm_decontaminate: new documents
    // arrive as a stream, the eval-gram set is the static (broadcastable)
    // side, and per-doc hit counts come out of the SAME typed 5-gram
    // kernel the batch query runs (gram5Of accepts either plan)
    val docs = graft.util.Tables.documents(spark, sf)
    val work = java.nio.file.Files.createTempDirectory("graft_decon").toFile
    try {
      docs.write.mode("overwrite").parquet(new java.io.File(work, "in").getPath)
      val stream = spark.readStream.schema(docs.schema)
        .parquet(new java.io.File(work, "in").getPath)
      val evalGrams = ops.Llm.gram5Of(docs)
        .where(col("doc_id") % 37 === 0).select("g").distinct()
      val hits = ops.Llm.gram5Of(stream)
        .where(col("doc_id") % 37 =!= 0)
        .join(evalGrams, "g")
        .groupBy("doc_id").count()
      val q = hits.writeStream.format("memory").queryName("decon_stream")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "AvailableNow run did not drain")
      val streamed = spark.table("decon_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = ops.Llm.llm_decontaminate(spark, sf).collect()
        .filter(_.getBoolean(2)).map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batch.nonEmpty, "fixture should contain contamination")
      assert(streamed == batch,
        s"stream-static decontamination diverged: $streamed vs $batch")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(work)
    }
  }

  test("graft-table sink mode=upsert: keyed micro-batches route through " +
      "the MERGE kernel (streamed upserts = one-shot MERGE of final " +
      "images), crash-replay applies NOTHING, guards loud") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_upsink_table").toFile.getPath
    val twin = java.nio.file.Files
      .createTempDirectory("graft_upsink_twin").toFile.getPath
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_upsink_ckpt").toFile.getPath
    graft.util.AppCleanup.onExit(s"graft_upsink_$root") {
      Seq(root, twin, ckpt).foreach(d =>
        graft.util.AppCleanup.recursiveDelete(new java.io.File(d)))
    }
    def seed = (1L to 6L).map(i => (i, s"v$i")).toDF("id", "payload")
    t.create(spark, root, seed, Seq("id"), Seq("id"), numFiles = 2)
    val mem = MemoryStream[(Long, String)]
    def start() = mem.toDF().toDF("id", "payload")
      .writeStream.format("graft-table")
      .option("path", root)
      .option("mode", "upsert").option("key", "id")
      .option("stats", "id").option("cluster", "id")
      .option("num_files", "1")
      .option("checkpointLocation", ckpt)
      .outputMode("update") // Update maps to upsert — accepted
      .start()
    val q1 = start()
    try {
      mem.addData((2L, "u2"), (7L, "n7")) // update a live key + insert
      q1.processAllAvailable()
      mem.addData((2L, "u2b"), (3L, "u3")) // re-update 2: cross-batch LWW
      q1.processAllAvailable()
    } finally q1.stop()
    // parity: streamed upserts == ONE MERGE of the per-key final images
    t.create(spark, twin, seed, Seq("id"), Seq("id"), numFiles = 2)
    t.merge(spark, twin,
      Seq((2L, "u2b"), (3L, "u3"), (7L, "n7")).toDF("id", "payload"),
      "id", Seq("id"), Seq("id"))
    def state(r: String) = t.read(spark, r).as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    val want = state(twin)
    assert(state(root) == want, s"streamed ${state(root)} vs merged $want")
    // each batch landed as ONE merge commit carrying the watermark
    val mLast = t.manifest(root, t.latestSnapshot(root))
    assert(mLast.op == "merge", mLast.op)
    val qid = mLast.stream.flatMap(_.keys.headOption).get
    assert(mLast.stream.exists(_(qid) == 1L), mLast.stream)
    // CRASH between the data commit and the checkpoint commit: the
    // restarted query replays batch 1 — the kernel's watermark guard
    // must apply NOTHING (no phantom snapshot, no re-fired CDC)
    assert(new java.io.File(s"$ckpt/commits/1").delete())
    new java.io.File(s"$ckpt/commits/.1.crc").delete()
    val vBefore = t.latestSnapshot(root)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(t.latestSnapshot(root) == vBefore,
        "a replayed upsert batch must not add a snapshot")
      assert(state(root) == want)
      // the stream keeps working past the replay
      mem.addData((7L, "u7"))
      q2.processAllAvailable()
      assert(t.read(spark, root).where(col("id") === 7L)
        .head().getString(1) == "u7")
    } finally q2.stop()
    // guards: Update output mode NEEDS mode=upsert; upsert NEEDS key;
    // in-batch duplicate keys are a cardinality violation
    val eU = intercept[Exception] {
      mem.toDF().toDF("id", "payload").writeStream.format("graft-table")
        .option("path", root)
        .option("checkpointLocation", s"${ckpt}_u")
        .outputMode("update").start()
    }
    assert(eU.getMessage.contains("upsert"), eU.getMessage)
    val eK = intercept[Exception] {
      mem.toDF().toDF("id", "payload").writeStream.format("graft-table")
        .option("path", root).option("mode", "upsert")
        .option("checkpointLocation", s"${ckpt}_k")
        .start()
    }
    assert(eK.getMessage.contains("key"), eK.getMessage)
    val q3 = start()
    try {
      mem.addData((9L, "a"), (9L, "b"))
      val eDup = intercept[Exception] { q3.processAllAvailable() }
      assert(eDup.getMessage.contains("duplicate") ||
        Option(eDup.getCause).exists(
          _.getMessage.contains("duplicate")), eDup.getMessage)
    } finally q3.stop()
  }
}
