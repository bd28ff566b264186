package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataSource V2 connector behavior (SURVEY.md §7.4): pagination
  * partitioning, opt_fields-style pruning, modified_since pushdown, and
  * incremental-sync monotonicity. */
class AsanaConnectorSpec extends SparkTestBase {
  private val dir = ops.Sources.fixtureDir

  private def tasks: DataFrame =
    spark.read.format("graft.asana.AsanaSource")
      .option("entity", "tasks").option("fixtureDir", dir).load()

  test("retry policy: 429/5xx back off and recover, 4xx fail fast, budget bounded") {
    import graft.asana._
    val p = AsanaRetryPolicy(maxRetries = 4, baseMs = 100L, maxBackoffMs = 1000L)
    // exponential from baseMs, capped
    assert(p.backoffMs(0, None) == 100L)
    assert(p.backoffMs(1, None) == 200L)
    assert(p.backoffMs(10, None) == 1000L)
    // a server-provided Retry-After wins, still capped; negatives clamp
    assert(p.backoffMs(0, Some(2L)) == 1000L)
    assert(p.backoffMs(3, Some(0L)) == 0L)
    assert(p.backoffMs(0, Some(-5L)) == 0L)
    // classification: rate-limit + transient retry, client errors do not
    assert(p.shouldRetry(429, 0) && p.shouldRetry(503, 3))
    assert(!p.shouldRetry(404, 0) && !p.shouldRetry(401, 0))
    assert(!p.shouldRetry(429, 4), "budget must bound retries")
    // a flaky transport (two 429s, then success) drains with the policy's
    // sleeps — recorded via the injected sleeper, no wall-clock involved
    var sleeps = List.empty[Long]
    val lines = AsanaRetry.fetchWithRetry(p, ms => sleeps :+= ms) { attempt =>
      if (attempt < 2) AsanaHttpError(429, Some(1L)) else AsanaOk(Seq("x", "y"))
    }
    assert(lines == Seq("x", "y"))
    assert(sleeps == List(1000L, 1000L), s"sleeps: $sleeps")
    // exhaustion is loud, never a silently dropped page
    val e = intercept[java.io.IOException] {
      AsanaRetry.fetchWithRetry(p, _ => ()) { _ => AsanaHttpError(503, Some(0L)) }
    }
    assert(e.getMessage.contains("503"))
  }

  test("reads all pages (30 tasks over 3 page partitions)") {
    assert(tasks.count() == 30)
    assert(tasks.rdd.getNumPartitions == 3, "one partition per API page")
  }

  test("column pruning reaches the scan (opt_fields analogue)") {
    val df = tasks.select("gid")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("asana.tasks[gid"), s"scan not pruned:\n$scan")
    assert(df.collect().length == 30)
  }

  test("modified_since predicate is pushed and correct") {
    val cutoff = "2024-01-15 00:00:00"
    val got = tasks.where(col("modified_at") >= lit(cutoff).cast("timestamp"))
      .select("gid").collect().map(_.getString(0)).toSet
    // independent reference: Spark's own JSON reader over the same fixtures
    val want = spark.read.json(s"$dir/tasks.jsonl")
      .where(col("modified_at").cast("timestamp") >= lit(cutoff).cast("timestamp"))
      .select("gid").collect().map(_.getString(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("strict > pushdown excludes the boundary row that >= includes") {
    // task1000's modified_at is exactly 2024-01-05T08:00:00Z (fixture);
    // both filters are pushed (removed from Spark's post-scan plan), so
    // the reader's own inclusivity handling is what's under test
    val boundary = "2024-01-05 08:00:00"
    val ge = tasks.where(col("modified_at") >= lit(boundary).cast("timestamp"))
      .select("gid").collect().map(_.getString(0)).toSet
    val gt = tasks.where(col("modified_at") > lit(boundary).cast("timestamp"))
      .select("gid").collect().map(_.getString(0)).toSet
    assert(ge.contains("task1000") && !gt.contains("task1000"))
    assert(ge -- gt == Set("task1000"))
    // conjunction of two pushed cutoffs: the tighter one must win
    val both = tasks.where(
      col("modified_at") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("modified_at") >= lit("2024-01-20 00:00:00").cast("timestamp"))
      .select("gid").collect().map(_.getString(0)).toSet
    val tight = tasks.where(
      col("modified_at") >= lit("2024-01-20 00:00:00").cast("timestamp"))
      .select("gid").collect().map(_.getString(0)).toSet
    assert(both == tight)
  }

  test("incremental sync is monotone: later cutoff yields a subset") {
    def syncedAfter(c: String): Set[String] =
      tasks.where(col("modified_at") >= lit(c).cast("timestamp"))
        .select("gid").collect().map(_.getString(0)).toSet
    val t1 = syncedAfter("2024-01-10 00:00:00")
    val t2 = syncedAfter("2024-01-20 00:00:00")
    assert(t2.subsetOf(t1) && t2.size < t1.size)
  }

  test("all nine entities load with their schemas") {
    for ((e, n) <- Seq("tasks" -> 30L, "projects" -> 3L, "users" -> 6L,
        "tags" -> 5L, "stories" -> 60L, "attachments" -> 14L,
        "portfolios" -> 3L, "goals" -> 9L, "sections" -> 5L)) {
      val df = spark.read.format("graft.asana.AsanaSource")
        .option("entity", e).option("fixtureDir", dir).load()
      assert(df.count() == n, s"$e row count")
    }
  }

  test("attachments: parent gid extracted from object, external refs null-size") {
    val att = spark.read.format("graft.asana.AsanaSource")
      .option("entity", "attachments").option("fixtureDir", dir).load()
    // the fixture plants exactly one orphan (parent task deleted) so the
    // asana_attachments inner join provably drops it on both engines
    val orphans = att.join(tasks.select(col("gid").as("tg")),
      col("parent_gid") === col("tg"), "left_anti")
      .select("gid").collect().map(_.getString(0)).toSet
    assert(orphans == Set("att13"), s"unexpected orphan set: $orphans")
    // gdrive/external attachments carry no size (the API returns null);
    // native asana uploads always do — the reader must preserve both
    val nullSized = att.where(col("size").isNull)
      .select("resource_subtype").distinct()
      .collect().map(_.getString(0)).toSet
    assert(!nullSized.contains("asana"), "native upload lost its size")
    assert(att.where(col("size").isNotNull).count() > 0)
    assert(att.where(col("download_url").isNull).count() == 0)
  }

  test("unknown entity fails with a clear message") {
    val e = intercept[Exception] {
      spark.read.format("graft.asana.AsanaSource")
        .option("entity", "nope").option("fixtureDir", dir).load().count()
    }
    assert(e.getMessage.contains("unknown asana entity"))
  }

  test("streaming sync-token resume: restart continues from the checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    val work = java.nio.file.Files.createTempDirectory("asana_stream").toFile
    val pages = new java.io.File(work, "pages/tasks")
    pages.mkdirs()
    val src = new java.io.File(s"$dir/pages/tasks")
    def copy(name: String): Unit =
      java.nio.file.Files.copy(
        new java.io.File(src, name).toPath,
        new java.io.File(pages, name).toPath)
    copy("page_000.jsonl"); copy("page_001.jsonl")
    val ckpt = new java.io.File(work, "ckpt").getPath
    val out = new java.io.File(work, "out").getPath
    // file sink (memory sink cannot recover from a checkpoint)
    def runOnce(): Long = {
      val stream = spark.readStream.format("graft.asana.AsanaSource")
        .option("entity", "tasks").option("fixtureDir", work.getPath).load()
      val q = stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(out).count()
    }
    assert(runOnce() == 20, "first run drains pages 0-1")
    // "new events arrive at the API": a third page appears; a restarted
    // query with the same checkpoint must emit ONLY the new records
    copy("page_002.jsonl")
    assert(runOnce() == 30, "resume appends only page 2's 10 records")
  }

  test("streaming resume is per-file: a page sorting BEFORE committed ones adds only its rows") {
    import org.apache.spark.sql.streaming.Trigger
    val work = java.nio.file.Files.createTempDirectory("asana_stream_oo").toFile
    val pages = new java.io.File(work, "pages/tasks")
    pages.mkdirs()
    val src = new java.io.File(s"$dir/pages/tasks")
    def copy(name: String): Unit =
      java.nio.file.Files.copy(
        new java.io.File(src, name).toPath,
        new java.io.File(pages, name).toPath)
    copy("page_001.jsonl"); copy("page_002.jsonl")
    val ckpt = new java.io.File(work, "ckpt").getPath
    val out = new java.io.File(work, "out").getPath
    def runOnce(): Long = {
      val stream = spark.readStream.format("graft.asana.AsanaSource")
        .option("entity", "tasks").option("fixtureDir", work.getPath).load()
      val q = stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(out).count()
    }
    assert(runOnce() == 20, "first run drains pages 1-2")
    // page_000 arrives late and sorts FIRST: a global line-index token
    // would remap pages 1-2 under it and re-emit/skip; the per-file token
    // must emit exactly page_000's 10 records
    copy("page_000.jsonl")
    assert(runOnce() == 30, "resume adds only the out-of-order page's rows")
    // and the union is exactly the 30 distinct task gids, no dup/no skip
    assert(spark.read.parquet(out).select("gid").distinct().count() == 30)
  }

  test("rate limiter accounts per-minute windows") {
    val rl = new graft.asana.AsanaRateLimiter(150)
    val t0 = 0L
    assert((1 to 150).forall(_ => rl.acquire(t0)))
    assert(!rl.acquire(t0), "151st request in a minute must exceed the ceiling")
    assert(rl.acquire(t0 + 60001L), "new minute window resets the budget")
  }

  test("write-back round-trips through the fixture transport: every task " +
      "update journaled exactly once, fields intact") {
    import graft.asana.AsanaWriteBack
    val out = java.nio.file.Files
      .createTempDirectory("asana_writeback").toFile
    graft.util.AppCleanup.onExit(s"asana_wb_${out.getName}")(
      graft.util.AppCleanup.recursiveDelete(out))
    // the pipeline shape: read via the connector, transform, PUT back
    val updates = tasks
      .select(col("gid"), concat(lit("[synced] "), col("name")).as("name"),
        col("completed"))
    val stats = AsanaWriteBack.writeBack(updates, "tasks", "gid",
      Seq("name", "completed"),
      transport = AsanaWriteBack.fixtureTransport(out.getPath))
    assert(stats.rows == 30 && stats.requests == 30 && stats.retries == 0,
      s"expected 30 clean PUTs, got $stats")
    val sent = spark.read.json(s"${out.getPath}/*.jsonl")
      .select(col("url"), col("put.data.name").as("name"),
        col("put.data.completed").as("completed"))
      .collect()
    assert(sent.length == 30, "one journal line per task")
    val byGid = sent.map { r =>
      val url = r.getString(0)
      assert(url.startsWith("https://app.asana.com/api/1.0/tasks/"),
        s"REST shape broken: $url")
      url.split("/").last -> (r.getString(1), r.getBoolean(2))
    }.toMap
    val expected = updates.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(byGid == expected, "journaled PUT bodies must equal the updates")
  }

  test("write-back routes 429s through the retry policy and blocks at " +
      "the rate ceiling on injected time only") {
    import graft.asana._
    // deterministic fake time: the clock advances ONLY via sleep()
    var now = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sleep: Long => Unit = ms => { sleeps += ms; now += ms }
    // transport 429s (Retry-After: 2s) on every first attempt per gid,
    // then succeeds — the read path's policy must drive the recovery
    val attempts = scala.collection.mutable.Map.empty[String, Int]
    val flaky: AsanaWriteBack.Transport = (url, env, attempt) => {
      val k = url.split("/").last
      attempts(k) = attempts.getOrElse(k, 0) + 1
      if (attempts(k) == 1) AsanaHttpError(429, retryAfterSec = Some(2L))
      else AsanaOk(Seq(env))
    }
    val rows = (1 to 5).map(i => (s"gid$i", s"""{"name":"n$i"}""")).iterator
    val stats = AsanaWriteBack.putPartition(rows, "tasks",
      AsanaRetryPolicy(), maxPerMinute = 2, clock = () => now,
      sleep = sleep, transport = flaky)
    assert(stats.rows == 5 && stats.requests == 10 && stats.retries == 5,
      s"each gid: one 429 + one success, got $stats")
    // every retry slept exactly the server's Retry-After (capped policy)
    assert(sleeps.count(_ == 2000L) == 5,
      s"Retry-After backoffs wrong: $sleeps")
    // ceiling of 2/min: gid3 and gid5 must block until the next window;
    // the throttle slept in injected seconds, never wall time
    assert(stats.throttledMs > 0, "rate gate never engaged at 2/min")
    assert(now >= stats.throttledMs + 5 * 2000L,
      "clock must advance by throttle + backoff sleeps")
    // a 400 fails fast through the same seam: no retry, loud error
    val bad: AsanaWriteBack.Transport = (_, _, _) => AsanaHttpError(400)
    val e = intercept[java.io.IOException](
      AsanaWriteBack.putPartition(Iterator(("g", "{}")), "tasks",
        AsanaRetryPolicy(), 150, () => 0L, _ => (), bad))
    assert(e.getMessage.contains("400"))
  }

  test("loopback HTTP transport: pagination + retry policy + sync-token " +
      "resume over REAL sockets (injected 429/503), non-retryable loud") {
    import graft.asana._
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    // ---- an in-suite Asana-shaped server: /tasks pages with opaque
    // offset tokens, /events with a resumable sync token; the FIRST
    // /tasks hit answers 429 + Retry-After, the second 503 — the live
    // failure modes the retry policy exists for. No network egress:
    // loopback only.
    val srv = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val taskPages = Vector(
      (Seq("""{"gid":"t1"}""", """{"gid":"t2"}"""), Some("off_b")),
      (Seq("""{"gid":"t3"}"""), Some("off_c")),
      (Seq("""{"gid":"t4"}""", """{"gid":"t5"}"""), None))
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val events = new java.util.concurrent.CopyOnWriteArrayList[String]()
    def respond(x: HttpExchange, status: Int, body: String,
        headers: Map[String, String] = Map.empty): Unit = {
      headers.foreach { case (k, v) => x.getResponseHeaders.set(k, v) }
      val b = body.getBytes("UTF-8")
      x.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) x.getResponseBody.write(b)
      x.close()
    }
    srv.createContext("/api/1.0/tasks", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val n = hits.incrementAndGet()
        if (n == 1) respond(x, 429, "", Map("Retry-After" -> "1"))
        else if (n == 2) respond(x, 503, "")
        else {
          val q = Option(x.getRequestURI.getQuery).getOrElse("")
          val off = q.split('&').map(_.split('=')).collectFirst {
            case Array("offset", v) => v
          }
          val idx = off match {
            case None => 0
            case Some("off_b") => 1
            case Some("off_c") => 2
            case Some(other) => fail(s"unknown offset token $other")
          }
          val (rows, next) = taskPages(idx)
          val nextJson = next
            .map(t => s""","next_page":{"offset":"$t"}""").getOrElse("")
          respond(x, 200,
            s"""{"data":[${rows.mkString(",")}]$nextJson}""")
        }
      }
    })
    srv.createContext("/api/1.0/events", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val q = Option(x.getRequestURI.getQuery).getOrElse("")
        val sync = q.split('&').map(_.split('=')).collectFirst {
          case Array("sync", v) => v.toInt
        }.getOrElse(0)
        import scala.jdk.CollectionConverters._
        val pending = events.asScala.drop(sync)
        respond(x, 200,
          s"""{"data":[${pending.mkString(",")}],""" +
            s""""sync":"${events.size}"}""")
      }
    })
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}/api/1.0"
      // ---- the LIVE transport: one function at the documented seam —
      // HTTP status line → AsanaOk/AsanaHttpError, exactly what the
      // fixture transport fakes. Proves the seam's shape carries a
      // real-socket implementation unchanged.
      def httpFetch(url: String): AsanaFetch = {
        val c = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        c.setConnectTimeout(5000); c.setReadTimeout(5000)
        val status = c.getResponseCode
        if (status == 200) {
          val body = new String(c.getInputStream.readAllBytes(), "UTF-8")
          AsanaOk(Seq(body))
        } else {
          val retryAfter = Option(c.getHeaderField("Retry-After"))
            .flatMap(_.toLongOption)
          Option(c.getErrorStream).foreach(_.close())
          AsanaHttpError(status, retryAfter)
        }
      }
      val policy = AsanaRetryPolicy(maxRetries = 4, baseMs = 10L,
        maxBackoffMs = 1000L)
      var sleeps = List.empty[Long]
      def page(url: String): String =
        AsanaRetry.fetchWithRetry(policy, ms => sleeps :+= ms)(
          _ => httpFetch(url)).head
      // ---- pagination: walk opaque offset tokens to exhaustion
      def offsetOf(body: String): Option[String] =
        """"next_page":\{"offset":"([^"]+)"""".r
          .findFirstMatchIn(body).map(_.group(1))
      def gidsOf(body: String): Seq[String] =
        """"gid":"([^"]+)"""".r.findAllMatchIn(body)
          .map(_.group(1)).toSeq
      var got = Vector.empty[String]
      var url = s"$base/tasks?limit=2"
      var done = false
      while (!done) {
        val body = page(url)
        got ++= gidsOf(body)
        offsetOf(body) match {
          case Some(tok) => url = s"$base/tasks?limit=2&offset=$tok"
          case None => done = true
        }
      }
      assert(got == Vector("t1", "t2", "t3", "t4", "t5"),
        s"every page exactly once, in order: $got")
      // the injected failures went through the POLICY: Retry-After won
      // for the 429 (1s, attempt 0), exponential for the 503 (attempt 1
      // of the SAME page fetch → baseMs << 1 = 20ms)
      assert(sleeps == List(1000L, 20L), s"sleeps: $sleeps")
      // ---- sync-token resume over the same sockets: token t0 drains
      // the backlog, new events arrive, resuming WITH t0's successor
      // yields exactly the delta — the /events contract asana_incr_sync
      // replays from fixtures
      events.add("""{"gid":"e1"}"""); events.add("""{"gid":"e2"}""")
      val b1 = page(s"$base/events?sync=0")
      assert(gidsOf(b1) == Seq("e1", "e2"), b1)
      val tok1 = """"sync":"(\d+)"""".r.findFirstMatchIn(b1).get.group(1)
      events.add("""{"gid":"e3"}""")
      val b2 = page(s"$base/events?sync=$tok1")
      assert(gidsOf(b2) == Seq("e3"),
        s"resume must yield ONLY the delta: $b2")
      // ---- non-retryable status fails loudly through the same stack
      val e = intercept[java.io.IOException] {
        page(s"$base/nope")
      }
      assert(e.getMessage.contains("404"), e.getMessage)
    } finally srv.stop(0)
  }
}
