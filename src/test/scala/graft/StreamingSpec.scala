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
    // readStream over the events parquet (nanos ts read as long + converted)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sf)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
}
