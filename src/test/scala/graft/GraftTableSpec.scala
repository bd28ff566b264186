package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.table.GraftTable

/** Contracts of the snapshot/manifest table format that the SQL oracle
  * cannot express: commit atomicity and conflict behavior, snapshot
  * isolation across a merge, manifest-over-listing orphan immunity,
  * stats pruning actually skipping files, and merge's
  * only-rewrite-affected-files cost bound. */
class GraftTableSpec extends SparkTestBase {

  private def freshRoot(): String = {
    val dir = Files.createTempDirectory("graft_table_spec").toFile
    graft.util.AppCleanup.onExit(s"graft_table_spec_${dir.getName}")(
      graft.util.AppCleanup.recursiveDelete(dir))
    dir.getAbsolutePath
  }

  private def idTable(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
  }

  test("create/append: latest read equals the union; history readable") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 4)
    GraftTable.append(spark, root,
      idTable(150).where(col("id") > 100), Seq("id"), Seq("id"),
      numFiles = 2)
    assert(GraftTable.latestSnapshot(root) == 2)
    assert(GraftTable.read(spark, root).count() == 150)
    assert(GraftTable.read(spark, root, Some(1)).count() == 100)
    val changed = GraftTable.changesBetween(spark, root, 1, 2)
    assert(changed.count() == 50)
    assert(changed.agg(min("id")).head().getLong(0) == 101L)
  }

  test("merge: upserts update + insert; only affected files rewritten") {
    val root = freshRoot()
    // 8 files clustered by id → each covers a ~125-wide band
    GraftTable.create(spark, root, idTable(1000), Seq("id"), Seq("id"),
      numFiles = 8)
    val v1Files = GraftTable.manifest(root, 1).files.map(_.path)
    import spark.implicits._
    // keys 1..10 (one band) updated, key 2000 (new) inserted
    val updates = ((1 to 10).map(i => (i.toLong, s"upd$i")) :+
      (2000L, "new")).toDF("id", "payload")
    GraftTable.merge(spark, root, updates, "id", Seq("id"), Seq("id"),
      numFiles = 1)
    val m2 = GraftTable.manifest(root, 2)
    val carried = m2.files.map(_.path).toSet.intersect(v1Files.toSet)
    assert(carried.size >= 6,
      s"merge should carry unaffected files by reference; kept $carried")
    val latest = GraftTable.read(spark, root)
    assert(latest.count() == 1001)
    assert(latest.where(col("id") <= 10 &&
      !col("payload").startsWith("upd")).count() == 0)
    assert(latest.where(col("id") === 2000).count() == 1)
    // snapshot isolation: v1 still shows pre-merge payloads
    val v1 = GraftTable.read(spark, root, Some(1))
    assert(v1.count() == 1000)
    assert(v1.where(col("payload").startsWith("upd")).count() == 0)
  }

  test("stats pruning skips files and loses no rows") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(1000), Seq("id"), Seq("id"),
      numFiles = 8)
    val (df, kept, total) =
      GraftTable.readWhere(spark, root, "id", 10d, 20d)
    assert(total == 8 && kept < total, s"pruning kept $kept of $total")
    assert(df.where(col("id").between(10, 20)).count() == 11)
  }

  test("reads plan from the manifest: orphan data files are invisible") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(50), Seq("id"), Seq("id"),
      numFiles = 2)
    // a failed job's leftover: a valid parquet file inside data/ that no
    // manifest references
    idTable(9999).where(col("id") > 9000)
      .write.mode("overwrite").parquet(s"$root/data/c-orphan")
    assert(GraftTable.read(spark, root).count() == 50)
  }

  test("commit conflict: second writer of a snapshot id loses atomically") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1)
    // simulate a racing writer that already published snapshot 2
    val stolen = GraftTable.manifest(root, 1).copy(snapshot = 2, parent = 1)
    Files.write(Paths.get(root, "_graft", "manifest-2.json"),
      org.json4s.jackson.Serialization.write(stolen)(
        org.json4s.DefaultFormats).getBytes("UTF-8"))
    // append rebases onto the thief's snapshot and commits as 3
    val v = GraftTable.append(spark, root,
      idTable(20).where(col("id") > 10), Seq("id"), Seq("id"), numFiles = 1)
    assert(v == 3)
    assert(GraftTable.read(spark, root).count() == 20)
  }

  test("two appends racing from real threads both land; union intact") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 2)
    import spark.implicits._
    // two writers, each landing a disjoint slice, started together: one
    // wins snapshot 2, the loser's optimistic retry rebases onto it and
    // commits 3 — nothing lost, nothing doubled, no torn manifest
    val slices = Seq((101L to 150L), (151L to 200L))
    val threads = slices.map { r =>
      new Thread(() => {
        GraftTable.append(spark, root, r.toDF("id")
          .select(col("id"), concat(lit("v"), col("id")).as("payload")),
          Seq("id"), Seq("id"), numFiles = 1)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(GraftTable.latestSnapshot(root) == 3)
    val latest = GraftTable.read(spark, root)
    assert(latest.count() == 200)
    assert(latest.select("id").distinct().count() == 200)
    // every retained snapshot is a consistent prefix of the history:
    // whichever writer won, snapshot 2 holds base + exactly one slice
    assert(GraftTable.read(spark, root, Some(1)).count() == 100)
    assert(GraftTable.read(spark, root, Some(2)).count() == 150)
  }

  test("merge from a stale snapshot fails loudly on commit") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1)
    import spark.implicits._
    val updates = Seq((1L, "upd")).toDF("id", "payload")
    // the caller derived its updates against snapshot 1, then a thief
    // published snapshot 2 before the merge committed: the pinned-base
    // merge must NOT silently rebase (its rewrite is stale)
    val stolen = GraftTable.manifest(root, 1).copy(snapshot = 2, parent = 1)
    Files.write(Paths.get(root, "_graft", "manifest-2.json"),
      org.json4s.jackson.Serialization.write(stolen)(
        org.json4s.DefaultFormats).getBytes("UTF-8"))
    intercept[java.util.ConcurrentModificationException] {
      GraftTable.merge(spark, root, updates, "id", Seq("id"), Seq("id"),
        baseSnapshot = Some(1))
    }
    // and the table is untouched: latest is still the thief's snapshot
    assert(GraftTable.latestSnapshot(root) == 2)
  }

  test("compact derived from a stale snapshot fails loudly — never " +
      "resurrects rows a concurrent merge rewrote") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 4)
    import spark.implicits._
    // a merge rewrites the file holding id=1 → snapshot 2; a compact
    // that planned its rewrite against snapshot 1's file set would copy
    // the PRE-merge row back in — the commit must reject it instead
    GraftTable.merge(spark, root, Seq((1L, "UPD1")).toDF("id", "payload"),
      "id", Seq("id"), Seq("id"), numFiles = 1)
    intercept[java.util.ConcurrentModificationException] {
      GraftTable.compact(spark, root, minRows = Long.MaxValue,
        statsCols = Seq("id"), clusterCols = Seq("id"), numFiles = 1,
        baseSnapshot = Some(1))
    }
    assert(GraftTable.latestSnapshot(root) == 2)
    val after = GraftTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after.size == 100 && after(1L) == "UPD1")
    // and an un-pinned compact derives from the live snapshot and lands
    assert(GraftTable.compact(spark, root, minRows = Long.MaxValue,
      statsCols = Seq("id"), clusterCols = Seq("id"), numFiles = 1) == 3)
    val c = GraftTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c.size == 100 && c(1L) == "UPD1")
  }

  test("merge-vs-merge race: exactly one winner per snapshot id; the " +
      "loser's retry re-derives from the new snapshot") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 4)
    import spark.implicits._
    // deterministic without sleeps: both writers PIN base snapshot 1, so
    // each derives a stale rewrite no matter how threads schedule; the
    // atomic createLink admits exactly one manifest-2 and the other
    // writer must surface ConcurrentModificationException — never a
    // silent rebase of a rewrite derived against the wrong file set
    val updA = Seq((1L, "A1"), (2L, "A2")).toDF("id", "payload")
    val updB = Seq((50L, "B50"), (101L, "B101")).toDF("id", "payload")
    val failures =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(updA, updB).map { u =>
      new Thread(() => {
        try {
          GraftTable.merge(spark, root, u, "id", Seq("id"), Seq("id"),
            numFiles = 1, baseSnapshot = Some(1)); ()
        } catch { case t: Throwable => failures.add(t); () }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(failures.size == 1,
      s"exactly one stale loser expected, got ${failures.size}: $failures")
    assert(failures.peek()
      .isInstanceOf[java.util.ConcurrentModificationException])
    assert(GraftTable.latestSnapshot(root) == 2)
    // snapshot 2 holds base + exactly ONE update set, whichever won
    val after2 = GraftTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val aWon = after2(1L) == "A1"
    val (winSet, loseSet) =
      if (aWon) (Map(1L -> "A1", 2L -> "A2"), updB)
      else (Map(50L -> "B50", 101L -> "B101"), updA)
    winSet.foreach { case (k, v) => assert(after2(k) == v) }
    assert(after2.size == (if (aWon) 100 else 101))
    // the loser re-derives from the CURRENT snapshot (no pin) and lands
    assert(GraftTable.merge(spark, root, loseSet, "id", Seq("id"),
      Seq("id"), numFiles = 1) == 3)
    val after3 = GraftTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after3.size == 101 && after3(1L) == "A1" && after3(2L) == "A2" &&
      after3(50L) == "B50" && after3(101L) == "B101",
      s"retry lost updates: ${after3.filterKeys(Set(1L, 2L, 50L, 101L))}")
  }

  test("merge racing an append: the append rebases, a stale merge " +
      "re-derives, no rows lost either way") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 4)
    import spark.implicits._
    // the merge pins base 1; the append's optimistic loop rebases itself.
    // Whichever order the commits land, the OUTCOME is deterministic:
    // both effects present at snapshot 3, snapshot isolation intact.
    val mergeFailed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val upd = Seq((5L, "UPD5")).toDF("id", "payload")
    val appender = new Thread(() => {
      GraftTable.append(spark, root,
        (101L to 120L).toDF("id")
          .select(col("id"), concat(lit("v"), col("id")).as("payload")),
        Seq("id"), Seq("id"), numFiles = 1); ()
    })
    val merger = new Thread(() => {
      try {
        GraftTable.merge(spark, root, upd, "id", Seq("id"), Seq("id"),
          numFiles = 1, baseSnapshot = Some(1)); ()
      } catch {
        case _: java.util.ConcurrentModificationException =>
          mergeFailed.set(true)
      }
    })
    Seq(appender, merger).foreach(_.start())
    Seq(appender, merger).foreach(_.join(120000))
    if (mergeFailed.get()) // append won 2: stale merge re-derives onto it
      assert(GraftTable.merge(spark, root, upd, "id", Seq("id"),
        Seq("id"), numFiles = 1) == 3)
    assert(GraftTable.latestSnapshot(root) == 3)
    val finalState = GraftTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(finalState.size == 120, s"rows lost: ${finalState.size}")
    assert(finalState(5L) == "UPD5")
    assert((101L to 120L).forall(i => finalState(i) == s"v$i"))
    // snapshot isolation: the pre-race snapshot still reads unmodified
    val v1 = GraftTable.read(spark, root, Some(1)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1.size == 100 && v1(5L) == "v5")
  }

  test("history lists retained commits newest-first; SQL view reads " +
      "a pinned snapshot") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(50), Seq("id"), Seq("id"),
      numFiles = 2)
    GraftTable.append(spark, root, idTable(80).where(col("id") > 50),
      Seq("id"), Seq("id"), numFiles = 2)
    val h = GraftTable.history(spark, root).collect()
    assert(h.map(_.getInt(0)).toSeq == Seq(2, 1), "newest first")
    assert(h.map(_.getString(2)).toSeq == Seq("append", "create"))
    assert(h.map(_.getLong(5)).toSeq == Seq(80L, 50L))
    assert(h.forall(!_.isNullAt(3)), "commits must carry timestamps")
    GraftTable.registerView(spark, "gt_hist_v1", root, Some(1))
    GraftTable.registerView(spark, "gt_hist_latest", root)
    assert(spark.sql("SELECT count(1) FROM gt_hist_v1").head().getLong(0)
      == 50L)
    assert(spark.sql(
      "SELECT count(1) FROM gt_hist_latest WHERE id > 50").head()
      .getLong(0) == 30L)
  }

  test("timestamp time travel: AS OF resolves to the newest eligible " +
      "snapshot; pre-table timestamps fail loudly") {
    val root = freshRoot()
    val t0 = System.currentTimeMillis() - 1
    GraftTable.create(spark, root, idTable(50), Seq("id"), Seq("id"),
      numFiles = 2)
    val afterCreate = System.currentTimeMillis()
    Thread.sleep(25) // commit stamps are ms-granular; separate them
    GraftTable.append(spark, root, idTable(80).where(col("id") > 50),
      Seq("id"), Seq("id"), numFiles = 2)
    assert(GraftTable.snapshotAsOf(root, afterCreate) == 1)
    assert(GraftTable.readAsOf(spark, root, afterCreate).count() == 50)
    assert(GraftTable.snapshotAsOf(root, System.currentTimeMillis()) == 2)
    assert(GraftTable.readAsOf(spark, root,
      System.currentTimeMillis()).count() == 80)
    intercept[IllegalArgumentException] {
      GraftTable.snapshotAsOf(root, t0)
    }
  }

  test("removeOrphans sweeps unreferenced files only; age gate holds") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(50), Seq("id"), Seq("id"),
      numFiles = 2)
    GraftTable.append(spark, root, idTable(80).where(col("id") > 50),
      Seq("id"), Seq("id"), numFiles = 2)
    // a failed write's leftover: parquet in data/ that no manifest lists
    idTable(9999).where(col("id") > 9990)
      .write.mode("overwrite").parquet(s"$root/data/c-orphan")
    // age gate: a "fresh" orphan (all files are fresh here) is an
    // in-flight writer's staging — must survive a guarded sweep
    assert(GraftTable.removeOrphans(root, olderThanMs = 3600L * 1000) == 0)
    assert(Files.isDirectory(Paths.get(root, "data", "c-orphan")))
    // unguarded sweep (no writer in flight): orphans go, live data stays
    val swept = GraftTable.removeOrphans(root, olderThanMs = 0L)
    assert(swept >= 1, s"expected the orphan files swept, got $swept")
    assert(!Files.exists(Paths.get(root, "data", "c-orphan")),
      "dead commit dir should be removed with its markers")
    assert(GraftTable.read(spark, root).count() == 80)
    assert(GraftTable.read(spark, root, Some(1)).count() == 50)
    // idempotent: nothing left to sweep
    assert(GraftTable.removeOrphans(root, olderThanMs = 0L) == 0)
  }

  test("delete: rows gone, unaffected files carried, old snapshot whole") {
    val root = freshRoot()
    // 8 files clustered by id → each covers a ~125-wide band
    GraftTable.create(spark, root, idTable(1000), Seq("id"), Seq("id"),
      numFiles = 8)
    val v1Files = GraftTable.manifest(root, 1).files.map(_.path)
    import spark.implicits._
    // one band of doomed keys → at most a couple of files affected
    val doomed = (101L to 140L).toDF("id")
    val v = GraftTable.delete(spark, root, doomed, "id",
      Seq("id"), Seq("id"), numFiles = 1)
    assert(v == 2)
    val m2 = GraftTable.manifest(root, 2)
    val carried = m2.files.map(_.path).toSet.intersect(v1Files.toSet)
    assert(carried.size >= 6,
      s"delete should carry unaffected files by reference; kept $carried")
    val latest = GraftTable.read(spark, root)
    assert(latest.count() == 960)
    assert(latest.where(col("id").between(101, 140)).count() == 0)
    // snapshot isolation: v1 still reads whole
    assert(GraftTable.read(spark, root, Some(1)).count() == 1000)
    // a delete matching nothing declines to commit
    assert(GraftTable.delete(spark, root, Seq(9999L).toDF("id"), "id",
      Seq("id"), Seq("id")) == 2)
    assert(GraftTable.latestSnapshot(root) == 2)
  }

  test("delete emptying every row of a file drops it from the manifest") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 4)
    import spark.implicits._
    // every key of one 25-wide band → its file rewrites to zero rows
    val v = GraftTable.delete(spark, root, (1L to 25L).toDF("id"), "id",
      Seq("id"), Seq("id"), numFiles = 1)
    assert(v == 2)
    val m2 = GraftTable.manifest(root, 2)
    // the rewrite had zero survivors: no replacement entries, and no
    // 0-row ghost files in the manifest
    assert(m2.files.size == 3 && m2.files.forall(_.rows > 0),
      s"expected 3 live files, got ${m2.files.map(f => f.path -> f.rows)}")
    assert(GraftTable.read(spark, root).count() == 75)
    assert(GraftTable.read(spark, root)
      .where(col("id") <= 25).count() == 0)
  }

  test("z-order: both dimensions prune files; content unchanged") {
    val root = freshRoot()
    import spark.implicits._
    // two independent dimensions: x walks 0..999, y is a decorrelated
    // permutation-ish mix — single-column range clustering on x would
    // leave every file's y range near-global
    val rows = (0L until 1000L)
      .map(i => (i, i * 997L % 1000L, s"p$i")).toDF("x", "y", "payload")
    GraftTable.create(spark, root, rows,
      statsCols = Seq("x", "y"), clusterCols = Nil,
      numFiles = 16, zorderCols = Seq("x", "y"))
    val (dx, keptX, totalX) = GraftTable.readWhere(spark, root, "x", 0d, 99d)
    val (dy, keptY, totalY) = GraftTable.readWhere(spark, root, "y", 0d, 99d)
    assert(totalX == 16 && totalY == 16)
    assert(keptX < totalX, s"x-pruning kept $keptX of $totalX")
    assert(keptY < totalY, s"y-pruning kept $keptY of $totalY")
    assert(dx.where(col("x") < 100).count() == 100)
    assert(dy.where(col("y") < 100).count() == 100)
    assert(GraftTable.read(spark, root).count() == 1000)
  }

  test("compact with zorderCols = OPTIMIZE ZORDER: reclusters in place") {
    val root = freshRoot()
    import spark.implicits._
    // y = the house prime-mod mixer of x: near-uniform and decorrelated
    // from contiguous x bands (y = 997x mod 1000 is NOT — its per-band
    // y-ranges vary), so x-only clustering leaves y-pruning truly blind
    val rows = (0L until 1000L)
      .map(i => (i, i % 1000003L * 2654435761L % 1000003L % 1000L, s"p$i"))
      .toDF("x", "y", "payload")
    GraftTable.create(spark, root, rows, Seq("x", "y"), Seq("x"),
      numFiles = 16)
    val (_, keptBefore, _) = GraftTable.readWhere(spark, root, "y", 0d, 99d)
    assert(keptBefore == 16, s"pre-zorder y-pruning should be blind")
    val v = GraftTable.compact(spark, root, Long.MaxValue, Seq("x", "y"),
      Nil, numFiles = 16, zorderCols = Seq("x", "y"))
    assert(v == 2)
    for (c <- Seq("x", "y")) {
      val (df, kept, total) = GraftTable.readWhere(spark, root, c, 0d, 99d)
      assert(total == 16 && kept < total,
        s"post-zorder $c-pruning kept $kept of $total")
      // pruning must lose no rows vs the source predicate (y is not a
      // permutation under the mixer, so derive the expected count)
      assert(df.where(col(c) < 100).count() ==
        rows.where(col(c) < 100).count())
    }
    // content-invariant, and the pre-optimize snapshot still reads
    assert(GraftTable.read(spark, root).count() == 1000)
    assert(GraftTable.read(spark, root, Some(1)).count() == 1000)
  }

  test("z-order generalizes to 3 columns: every dimension prunes") {
    val root = freshRoot()
    import spark.implicits._
    // three pairwise-decorrelated permutation mixes of 0..999
    val rows = (0L until 1000L)
      .map(i => (i, i * 997L % 1000L, i * 499L % 1000L, s"p$i"))
      .toDF("x", "y", "z", "payload")
    GraftTable.create(spark, root, rows,
      statsCols = Seq("x", "y", "z"), clusterCols = Nil,
      numFiles = 16, zorderCols = Seq("x", "y", "z"))
    for (c <- Seq("x", "y", "z")) {
      val (df, kept, total) = GraftTable.readWhere(spark, root, c, 0d, 99d)
      assert(total == 16 && kept < total, s"$c-pruning kept $kept of $total")
      assert(df.where(col(c) < 100).count() == 100)
    }
    // 5 columns is out of contract — loud, not silently unclustered
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, freshRoot(), rows.withColumn("w", col("x")),
        Seq("x"), Nil, zorderCols = Seq("x", "y", "z", "payload", "w"))
    }
  }

  test("add-only schema evolution: old files null-fill, old snapshots " +
      "keep their shape") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1)
    import spark.implicits._
    val evolved = Seq((11L, "v11", 0.5), (12L, "v12", 0.9))
      .toDF("id", "payload", "score")
    GraftTable.append(spark, root, evolved, Seq("id"), Seq("id"),
      numFiles = 1, allowEvolution = true)
    val latest = GraftTable.read(spark, root)
    assert(latest.columns.toSeq == Seq("id", "payload", "score"))
    assert(latest.where(col("score").isNull).count() == 10)
    assert(latest.where(col("score").isNotNull).count() == 2)
    // pre-evolution snapshot serves the pre-evolution shape
    assert(GraftTable.read(spark, root, Some(1)).columns.toSeq ==
      Seq("id", "payload"))
    // the table schema is now the 3-col shape: an un-flagged append of
    // the old 2-col shape mismatches...
    intercept[IllegalArgumentException] {
      GraftTable.append(spark, root, idTable(1), Seq("id"), Seq("id"))
    }
    // ...and stays loud even when flagged — dropping is not add-only
    intercept[IllegalArgumentException] {
      GraftTable.append(spark, root, idTable(1), Seq("id"), Seq("id"),
        allowEvolution = true)
    }
  }

  test("append with a mismatched schema fails loudly") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1)
    import spark.implicits._
    val wrong = Seq((11, "x")).toDF("id", "payload") // id INT, not BIGINT
    val e = intercept[IllegalArgumentException] {
      GraftTable.append(spark, root, wrong, Seq("id"), Seq("id"))
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("empty-updates merge commits a no-op snapshot") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1)
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "payload")
    val v = GraftTable.merge(spark, root, empty, "id", Seq("id"), Seq("id"))
    assert(v == 2)
    assert(GraftTable.read(spark, root).count() == 10)
  }

  test("row-level CDC: merge emits pre/post pairs + inserts, delete " +
      "emits deletes, survivors and compact stay silent") {
    val root = freshRoot()
    import spark.implicits._
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 4)                                             // v1
    // v2 merge: keys 1..5 updated, key 200 inserted — the rewritten
    // files also carry untouched survivor rows, which must emit nothing
    val updates = ((1 to 5).map(i => (i.toLong, s"upd$i")) :+
      (200L, "new")).toDF("id", "payload")
    GraftTable.merge(spark, root, updates, "id", Seq("id"), Seq("id"),
      numFiles = 1)
    // v3 delete: keys 90..95 removed
    GraftTable.delete(spark, root,
      (90 to 95).map(_.toLong).toDF("id"), "id", Seq("id"), Seq("id"))
    // v4 compact: layout-only, no change rows
    GraftTable.compact(spark, root, minRows = Long.MaxValue,
      Seq("id"), Seq("id"), numFiles = 2)
    val cdc = GraftTable.changesBetweenRows(spark, root, 1, 4, "id")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
        r.getAs[String]("_change_type"), r.getAs[Int]("_commit_snapshot")))
    val byType = cdc.groupBy(_._3).view.mapValues(_.toSet).toMap
    assert(byType("update_preimage") ==
      (1 to 5).map(i => (i.toLong, s"v$i", "update_preimage", 2)).toSet)
    assert(byType("update_postimage") ==
      (1 to 5).map(i => (i.toLong, s"upd$i", "update_postimage", 2)).toSet)
    assert(byType("insert") == Set((200L, "new", "insert", 2)))
    assert(byType("delete") ==
      (90 to 95).map(i => (i.toLong, s"v$i", "delete", 3)).toSet)
    assert(cdc.length == 5 + 5 + 1 + 6, s"unexpected extra change rows")
    assert(!cdc.exists(_._4 == 4), "compact must emit no change rows")
    // replaying the CDC over the v1 state reproduces the v3 (= v4) state
    val replayed = (1 to 100).map(i => i.toLong -> s"v$i").toMap ++
      byType("update_postimage").map(c => c._1 -> c._2).toMap ++
      byType("insert").map(c => c._1 -> c._2).toMap --
      byType("delete").map(_._1)
    val v4 = GraftTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v4 == replayed, "CDC replay must reproduce the latest snapshot")
    // full history (fromSnapshot = 0): the create commit's rows arrive
    // as inserts at snapshot 1, then the same deltas as above
    val full = GraftTable.changesBetweenRows(spark, root, 0, 4, "id")
      .groupBy("_commit_snapshot", "_change_type").count().collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(full((1, "insert")) == 100L, s"create step wrong: $full")
    assert(full((2, "update_preimage")) == 5L &&
      full((3, "delete")) == 6L, s"later steps wrong: $full")
  }

  test("merge/delete on a non-numeric or all-null key fail loudly") {
    // a string key casts its min/max to null, which read as "no matching
    // keys" — merge would append duplicates and delete would no-op
    // silently (ADVICE r6); both must refuse instead
    val root = freshRoot()
    import spark.implicits._
    val byGid = (1 to 20).map(i => (s"gid$i", i.toLong)).toDF("gid", "n")
    GraftTable.create(spark, root, byGid, Seq("n"), Seq("n"), numFiles = 2)
    val up = Seq(("gid3", 300L)).toDF("gid", "n")
    val eMerge = intercept[IllegalArgumentException](
      GraftTable.merge(spark, root, up, "gid", Seq("n"), Seq("n")))
    assert(eMerge.getMessage.contains("numeric"))
    val eDel = intercept[IllegalArgumentException](
      GraftTable.delete(spark, root, up.select("gid"), "gid",
        Seq("n"), Seq("n")))
    assert(eDel.getMessage.contains("numeric"))
    assert(GraftTable.latestSnapshot(root) == 1, "no commit must have landed")
    // numeric key but every key value null: joins match nothing — refuse
    val root2 = freshRoot()
    GraftTable.create(spark, root2, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1)
    val nullKeys = Seq((null.asInstanceOf[java.lang.Long], "x"))
      .toDF("id", "payload")
    val eNull = intercept[IllegalArgumentException](
      GraftTable.merge(spark, root2, nullKeys, "id", Seq("id"), Seq("id")))
    // the declared-schema NOT NULL enforcement (idTable's id is
    // non-nullable) fires first since r16 — either loud path refuses
    assert(eNull.getMessage.contains("null") ||
      eNull.getMessage.contains("NOT NULL(id)"), eNull.getMessage)
  }

  test("tags: named refs read their snapshot, survive expiry as " +
      "retention roots, release on removal, never silently re-point") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 2)
    GraftTable.append(spark, root,
      idTable(150).where(col("id") > 100), Seq("id"), Seq("id"),
      numFiles = 1)
    GraftTable.append(spark, root,
      idTable(200).where(col("id") > 150), Seq("id"), Seq("id"),
      numFiles = 1)
    GraftTable.tag(root, "baseline", 1)
    assert(GraftTable.tags(root) == Map("baseline" -> 1))
    assert(GraftTable.readTag(spark, root, "baseline").count() == 100)
    // a tag never silently re-points
    intercept[IllegalStateException] { GraftTable.tag(root, "baseline", 2) }
    // expiry keeps the tagged manifest AND its files
    GraftTable.expireSnapshots(root, keepFrom = 3)
    assert(GraftTable.readTag(spark, root, "baseline").count() == 100)
    assert(!Files.exists(Paths.get(root, "_graft", "manifest-2.json")),
      "untagged v2 should be expired")
    // history still lists the tagged snapshot
    assert(GraftTable.history(spark, root)
      .where(col("snapshot") === 1).count() == 1)
    // removing the tag releases it: the next expiry reclaims v1
    assert(GraftTable.removeTag(root, "baseline"))
    GraftTable.expireSnapshots(root, keepFrom = 3)
    assert(!Files.exists(Paths.get(root, "_graft", "manifest-1.json")))
    intercept[NoSuchElementException] {
      GraftTable.readTag(spark, root, "baseline")
    }
    // tagging an expired snapshot fails loudly
    intercept[IllegalArgumentException] { GraftTable.tag(root, "old", 1) }
    // the surviving table is intact
    assert(GraftTable.read(spark, root).count() == 200)
  }

  test("restore: rolls back bad commits as a new auditable snapshot; " +
      "bad history stays time-travelable; latest-target is a no-op") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 4)
    GraftTable.append(spark, root,
      idTable(150).where(col("id") > 100), Seq("id"), Seq("id"),
      numFiles = 2)
    import spark.implicits._
    GraftTable.merge(spark, root,
      Seq((5L, "corrupted")).toDF("id", "payload"), "id", Seq("id"),
      Seq("id"))
    // undo append+merge in one metadata-only commit
    val v = GraftTable.restore(root, 1)
    assert(v == 4)
    assert(GraftTable.latestSnapshot(root) == 4)
    val latest = GraftTable.read(spark, root)
    assert(latest.count() == 100)
    assert(latest.where(col("id") === 5).select("payload")
      .head().getString(0) == "v5")
    // restored file list IS snapshot 1's — zero data movement
    assert(GraftTable.manifest(root, 4).files.map(_.path).toSet ==
      GraftTable.manifest(root, 1).files.map(_.path).toSet)
    // the bad commits remain auditable history
    assert(GraftTable.read(spark, root, Some(3))
      .where(col("id") === 5).select("payload").head()
      .getString(0) == "corrupted")
    assert(GraftTable.history(spark, root)
      .where(col("op") === "restore(1)").count() == 1)
    // restoring to the current latest commits nothing
    assert(GraftTable.restore(root, 4) == 4)
    assert(GraftTable.latestSnapshot(root) == 4)
    // writes continue normally on top of the restored state
    GraftTable.append(spark, root,
      idTable(120).where(col("id") > 100), Seq("id"), Seq("id"),
      numFiles = 1)
    assert(GraftTable.read(spark, root).count() == 120)
    // a restore target whose manifest was expired fails loudly
    GraftTable.expireSnapshots(root, keepFrom = 4)
    intercept[Exception] { GraftTable.restore(root, 2) }
  }

  test("expireSnapshots with a smaller keepFrom after a larger one no-ops") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1)
    GraftTable.append(spark, root, idTable(20).where(col("id") > 10),
      Seq("id"), Seq("id"), numFiles = 1)
    GraftTable.append(spark, root, idTable(30).where(col("id") > 20),
      Seq("id"), Seq("id"), numFiles = 1)
    assert(GraftTable.expireSnapshots(root, 3) == 0) // appends share no files
    // snapshots 1 and 2 are gone; a retroactively-smaller keepFrom must
    // scan only the manifests that still exist, not NoSuchFileException
    assert(GraftTable.expireSnapshots(root, 2) == 0)
    assert(GraftTable.read(spark, root).count() == 30)
  }

  test("bloom point lookup: prunes where range stats cannot; never drops " +
      "a present key") {
    val root = freshRoot()
    // UNCLUSTERED layout: round-robin partitioning gives every file a
    // near-global id range, so min/max stats keep everything — the
    // worst case blooms exist for
    GraftTable.create(spark, root, idTable(4000), Seq("id"), Seq.empty,
      numFiles = 8, bloomCols = Seq("id"))
    val (_, rangeKept, total) = GraftTable.readWhere(spark, root, "id", 77d, 77d)
    assert(rangeKept == total, "unclustered ranges should not prune")
    val (df, bloomKept, _) =
      GraftTable.readWhereKeyIn(spark, root, "id", Seq(77L))
    assert(bloomKept < total,
      s"bloom should prune the unclustered layout: kept $bloomKept of $total")
    assert(df.where(col("id") === 77).count() == 1)
    // no false negatives: every probed present key is found through the
    // pruned read (50 scattered keys)
    (1 to 50).map(i => i * 79L % 4000 + 1).foreach { k =>
      val (d2, _, _) = GraftTable.readWhereKeyIn(spark, root, "id", Seq(k))
      assert(d2.where(col("id") === k).count() == 1, s"key $k lost")
    }
    // absent keys: usually zero files survive (false positives allowed,
    // wrong rows never) — spot-check the frame is empty either way
    val (dAbsent, _, _) =
      GraftTable.readWhereKeyIn(spark, root, "id", Seq(999999L))
    assert(dAbsent.where(col("id") === 999999L).count() == 0)
  }

  test("string-key bloom lookup: prunes files, never drops a present key") {
    val root = freshRoot()
    import spark.implicits._
    // gid-keyed entity shape: random-ish hex gids, clustered by a
    // numeric surrogate so the gid SET per file is sparse — the exact
    // layout where string range stats would be useless even if they
    // existed and only a bloom can skip
    val rows = (1 to 1000)
      .map(i => (i.toLong, f"gid-${i * 2654435761L % 100003L}%06x", s"v$i"))
      .toDF("seq", "gid", "payload")
    GraftTable.create(spark, root, rows, Seq("seq"), Seq("seq"),
      numFiles = 8, bloomCols = Seq("gid"))
    val m = GraftTable.manifest(root, 1)
    assert(m.files.forall(_.bloom.exists(_.contains("gid"))))
    // probe 5 present gids scattered across the table
    val probes = rows.where(col("seq") % 211 === 0)
      .select("gid").collect().map(_.getString(0)).toSeq
    assert(probes.size >= 4)
    val (df, kept, total) =
      GraftTable.readWhereKeyInStr(spark, root, "gid", probes)
    assert(total == 8 && kept < total,
      s"string bloom should prune: kept $kept of $total")
    assert(df.where(col("gid").isInCollection(probes)).count() ==
      probes.size, "bloom pruning must never drop a present key")
    // an absent gid prunes everything with high probability (5 files ×
    // ~4% fp rate); at worst it keeps a false-positive file or two
    val (_, keptAbsent, _) =
      GraftTable.readWhereKeyInStr(spark, root, "gid", Seq("gid-zzzzzz"))
    assert(keptAbsent <= 2, s"absent key kept $keptAbsent files")
    // string statsCols are rejected loudly, not silently mis-pruned
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, freshRoot(), rows, Seq("gid"), Seq("seq"))
    }
  }

  test("bloom build/probe identity: positions in range, deterministic") {
    val ks = Seq(Long.MinValue, -1L, 0L, 1L, 42L, Long.MaxValue, 987654321L)
    ks.foreach { k =>
      val p1 = GraftTable.bloomPositions(k)
      val p2 = GraftTable.bloomPositions(k)
      assert(p1.toSeq == p2.toSeq)
      assert(p1.length == GraftTable.BloomK)
      assert(p1.forall(p => p >= 0 && p < GraftTable.BloomBits), s"$k: ${p1.toSeq}")
    }
  }

  test("string bloom hash: in range, deterministic, keys disperse") {
    val ks = Seq("", "a", "gid-000001", "gid-000002", "héllo-ünïcode",
      "x" * 500)
    ks.foreach { k =>
      val p1 = GraftTable.bloomPositionsStr(k)
      assert(p1.toSeq == GraftTable.bloomPositionsStr(k).toSeq)
      assert(p1.length == GraftTable.BloomK)
      assert(p1.forall(p => p >= 0 && p < GraftTable.BloomBits),
        s"'$k': ${p1.toSeq}")
    }
    // distinct keys must not collapse onto one position set (the failure
    // mode of hashing the reference instead of the bytes)
    val sets = (1 to 200).map(i => GraftTable.bloomPositionsStr(s"gid-$i")
      .toSet).toSet
    assert(sets.size > 190, s"only ${sets.size} distinct position sets")
  }

  test("compact: small files merge, content invariant, old snapshot intact") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 1)
    // five tiny append commits — the streaming-ingest shape
    (1 to 5).foreach { i =>
      GraftTable.append(spark, root,
        idTable(100 + i * 10).where(col("id") > 100 + (i - 1) * 10),
        Seq("id"), Seq("id"), numFiles = 1)
    }
    val before = GraftTable.manifest(root, 6)
    assert(before.files.size == 6)
    val v = GraftTable.compact(spark, root, minRows = 50, Seq("id"),
      Seq("id"), numFiles = 1)
    val after = GraftTable.manifest(root, v)
    // the 100-row create file survives; the five 10-row appends collapse
    assert(after.files.size == 2, s"expected 2 files, got ${after.files}")
    assert(GraftTable.read(spark, root).count() == 150)
    assert(GraftTable.read(spark, root, Some(6)).count() == 150)
    // compacting an already-compact table is a no-op, not an empty commit
    assert(GraftTable.compact(spark, root, minRows = 50, Seq("id"),
      Seq("id")) == v)
  }

  test("expireSnapshots vacuums dead files; survivors stay readable") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 4)
    import spark.implicits._
    GraftTable.merge(spark, root,
      Seq((1L, "upd")).toDF("id", "payload"), "id", Seq("id"), Seq("id"),
      numFiles = 1)
    val deadCount = GraftTable.expireSnapshots(root, keepFrom = 2)
    // exactly the one rewritten v1 file is reclaimable
    assert(deadCount == 1, s"expected 1 dead file, got $deadCount")
    assert(GraftTable.read(spark, root).count() == 100)
    assert(GraftTable.read(spark, root)
      .where(col("payload") === "upd").count() == 1)
    intercept[Exception] { GraftTable.read(spark, root, Some(1)) }
  }

  test("incremental consumption: manifest-diff batches replay the table") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(40), Seq("id"), Seq("id"),
      numFiles = 2)
    (1 to 3).foreach { i =>
      GraftTable.append(spark, root,
        idTable(40 + i * 20).where(col("id") > 40 + (i - 1) * 20),
        Seq("id"), Seq("id"), numFiles = 1)
    }
    // a downstream consumer checkpointing its last-seen snapshot and
    // draining changesBetween per wake-up reconstructs the full table
    val drained = (0 to 3).map { v =>
      if (v == 0) GraftTable.read(spark, root, Some(1))
      else GraftTable.changesBetween(spark, root, v, v + 1)
    }
    // v0 batch is snapshot 1 itself; union of all batches == latest
    val replayed = drained.tail.foldLeft(drained.head)(_ unionByName _)
    assert(replayed.count() == 100)
    assert(replayed.select("id").distinct().count() ==
      GraftTable.read(spark, root).count())
  }

  test("fixture table: prune query reads fewer files than the snapshot") {
    val root = ops.Table.ordersTable(spark, sf)
    val (_, kept, total) =
      GraftTable.readWhere(spark, root, "o_year", 1996d, 1996d)
    // a year INSIDE the data range (1995–2001): the prune must keep
    // something (a 1994 probe would pass trivially by keeping nothing)
    assert(kept > 0 && kept < total,
      s"o_year=1996 should prune the clustered layout: $kept of $total")
  }

  test("deleteMor: rows vanish with ZERO data-file rewrite; DV commits " +
      "stack; every old snapshot pins its exact row set") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(1000), Seq("id"), Seq("id"),
      numFiles = 8)
    val v1Paths = GraftTable.manifest(root, 1).files.map(_.path).toSet
    GraftTable.deleteMor(spark, root,
      (1L to 50L by 2).toDF("id"), "id")
    val m2 = GraftTable.manifest(root, 2)
    // the merge-on-read bargain: the physical file set is UNTOUCHED
    assert(m2.files.map(_.path).toSet == v1Paths,
      "delete_mor must not rewrite or drop any data file")
    assert(m2.files.exists(_.dv.nonEmpty), "expected a deletion vector")
    assert(m2.files.map(_.liveRows).sum == 975L)
    val latest = GraftTable.read(spark, root)
    assert(latest.count() == 975)
    assert(latest.where(col("id") <= 50 && col("id") % 2 === 1)
      .count() == 0)
    // a second DV delete unions into fresh sidecars; snapshots 1 and 2
    // still read their own exact row sets through their own sidecars
    GraftTable.deleteMor(spark, root, (2L to 50L by 2).toDF("id"), "id")
    assert(GraftTable.read(spark, root).count() == 950)
    assert(GraftTable.read(spark, root, Some(2)).count() == 975)
    assert(GraftTable.read(spark, root, Some(1)).count() == 1000)
    // no-match delete declines to commit (no empty commit)
    assert(GraftTable.deleteMor(spark, root, Seq(9999L).toDF("id"),
      "id") == 3)
    // deleting every remaining row drops every entry from the manifest;
    // the read stays a correctly-typed empty frame
    GraftTable.deleteMor(spark, root, (1L to 1000L).toDF("id"), "id")
    assert(GraftTable.manifest(root, 4).files.isEmpty)
    assert(GraftTable.read(spark, root).count() == 0)
  }

  test("mergeMor: upsert appends only the update rows; base files " +
      "untouched; old versions DV-masked") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(1000), Seq("id"), Seq("id"),
      numFiles = 8)
    val v1Paths = GraftTable.manifest(root, 1).files.map(_.path).toSet
    val updates = ((1 to 10).map(i => (i.toLong, s"upd$i")) :+
      (2000L, "new")).toDF("id", "payload")
    GraftTable.mergeMor(spark, root, updates, "id", Seq("id"), Seq("id"),
      numFiles = 1)
    val m2 = GraftTable.manifest(root, 2)
    val m2Paths = m2.files.map(_.path).toSet
    // every base file carries over physically; exactly the appended
    // update file is new — the O(rows changed) commit-cost shape
    assert(v1Paths.subsetOf(m2Paths), "mergeMor must not drop base files")
    assert((m2Paths -- v1Paths).size == 1,
      s"expected exactly one appended file, got ${m2Paths -- v1Paths}")
    val latest = GraftTable.read(spark, root)
    assert(latest.count() == 1001)
    assert(latest.where(col("id") <= 10 &&
      !col("payload").startsWith("upd")).count() == 0,
      "old versions of matched keys must be DV-masked")
    assert(latest.where(col("id") === 2000).count() == 1)
    assert(GraftTable.read(spark, root, Some(1))
      .where(col("payload").startsWith("upd")).count() == 0)
  }

  test("compact materializes deletion vectors: DVs fold away, content " +
      "invariant, prior DV snapshot still exact") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(1000), Seq("id"), Seq("id"),
      numFiles = 4)
    GraftTable.deleteMor(spark, root, (1L to 100L by 2).toDF("id"), "id")
    val before = GraftTable.read(spark, root)
      .orderBy("id").collect().toSeq
    GraftTable.compact(spark, root, minRows = 0L, Seq("id"), Seq("id"),
      numFiles = 2, materializeDvs = true)
    val m3 = GraftTable.manifest(root, 3)
    assert(m3.op == "compact")
    assert(m3.files.forall(_.dv.isEmpty),
      "materializing compact must leave no deletion vectors")
    val after = GraftTable.read(spark, root).orderBy("id").collect().toSeq
    assert(after == before, "compaction must be content-invariant")
    // snapshot 2 still reads through its sidecar (950 rows), snapshot 1
    // pre-delete (1000)
    assert(GraftTable.read(spark, root, Some(2)).count() == 950)
    assert(GraftTable.read(spark, root, Some(1)).count() == 1000)
  }

  test("row-level CDC across DV commits: deletes and update pairs " +
      "emitted, untouched rows silent") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 2)
    GraftTable.deleteMor(spark, root, (1L to 5L).toDF("id"), "id")
    val del = GraftTable.changesBetweenRows(spark, root, 1, 2, "id")
    assert(del.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("delete" -> 5L),
      "a DV delete must emit exactly its doomed rows as deletes")
    val updates = Seq((6L, "upd6"), (7L, "upd7"), (200L, "new"))
      .toDF("id", "payload")
    GraftTable.mergeMor(spark, root, updates, "id", Seq("id"), Seq("id"),
      numFiles = 1)
    val upd = GraftTable.changesBetweenRows(spark, root, 2, 3, "id")
    assert(upd.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("update_preimage" -> 2L, "update_postimage" -> 2L,
        "insert" -> 1L),
      "a DV upsert must emit update pairs + the insert, nothing else")
  }

  test("DV sidecars are reference-counted: expiry reclaims superseded " +
      "ones, orphan sweep covers stranded ones") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 2)
    GraftTable.deleteMor(spark, root, (1L to 5L).toDF("id"), "id")
    GraftTable.deleteMor(spark, root, (6L to 10L).toDF("id"), "id")
    val dv2 = GraftTable.manifest(root, 2).files.flatMap(_.dv)
    val dv3 = GraftTable.manifest(root, 3).files.flatMap(_.dv)
    assert(dv2.nonEmpty && dv3.nonEmpty && dv2 != dv3)
    GraftTable.expireSnapshots(root, keepFrom = 3)
    dv2.foreach(p => assert(!Files.exists(Paths.get(root, p)),
      s"superseded sidecar $p should be vacuumed with its manifest"))
    dv3.foreach(p => assert(Files.exists(Paths.get(root, p)),
      s"live sidecar $p must survive expiry"))
    assert(GraftTable.read(spark, root).count() == 90)
    // a stranded sidecar (crashed writer) is an orphan like any data file
    val stray = Paths.get(root, "data/dv/dv-stray.bin")
    Files.write(stray, Array[Byte](0, 0, 0, 0, 0, 0, 0, 1))
    Thread.sleep(10)
    assert(GraftTable.removeOrphans(root, olderThanMs = 0) >= 1)
    assert(!Files.exists(stray))
    assert(GraftTable.read(spark, root).count() == 90)
  }

  test("deleteMor/mergeMor from a stale snapshot fail loudly — DVs " +
      "never blind-stack on a concurrent commit") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 2)
    GraftTable.append(spark, root,
      idTable(150).where(col("id") > 100), Seq("id"), Seq("id"),
      numFiles = 1)
    intercept[java.util.ConcurrentModificationException] {
      GraftTable.deleteMor(spark, root, (1L to 5L).toDF("id"), "id",
        baseSnapshot = Some(1))
    }
    intercept[java.util.ConcurrentModificationException] {
      GraftTable.mergeMor(spark, root,
        Seq((1L, "upd")).toDF("id", "payload"), "id", Seq("id"),
        Seq("id"), baseSnapshot = Some(1))
    }
    // table state untouched by the failed attempts
    assert(GraftTable.read(spark, root).count() == 150)
  }

  test("CoW merge/delete on a DV'd table apply the vectors: no " +
      "resurrection, and the rewrite materializes them") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 1)
    GraftTable.deleteMor(spark, root, (1L to 10L).toDF("id"), "id")
    // CoW delete on the same (single) file: must rewrite WITHOUT the
    // DV'd rows and without a dv on the new entry
    GraftTable.delete(spark, root, Seq(11L).toDF("id"), "id",
      Seq("id"), Seq("id"), numFiles = 1)
    val m3 = GraftTable.manifest(root, 3)
    assert(m3.files.forall(_.dv.isEmpty))
    val latest = GraftTable.read(spark, root)
    assert(latest.count() == 89)
    assert(latest.where(col("id") <= 11).count() == 0,
      "CoW rewrite must not resurrect DV-deleted rows")
  }

  test("graft_table / graft_table_changes TVFs: SQL time travel equals " +
      "the DSL read; literal-argument misuse fails loudly") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(100), Seq("id"), Seq("id"),
      numFiles = 4)
    GraftTable.append(spark, root,
      idTable(150).where(col("id") > 100), Seq("id"), Seq("id"),
      numFiles = 2)
    graft.functions.GraftTableFunctions.register(spark)

    // latest and snapshot-1 reads through pure SQL ≡ the DSL calls
    assert(spark.sql(s"SELECT count(1) FROM graft_table('$root')")
      .head().getLong(0) == 150)
    val sqlV1 = spark.sql(
      s"SELECT id, payload FROM graft_table('$root', 1) ORDER BY id")
      .collect().toSeq
    val dslV1 = GraftTable.read(spark, root, Some(1))
      .select("id", "payload").orderBy("id").collect().toSeq
    assert(sqlV1 == dslV1)

    // the spliced plan composes with outer SQL (filter + aggregate)
    assert(spark.sql(
      s"SELECT count(1) FROM graft_table('$root', 1) WHERE id > 90")
      .head().getLong(0) == 10)

    // TIMESTAMP AS OF: any instant between the two commits reads v1
    // (commit timestamps are wall-clock ms; the fixture's two commits
    // are more than 0 ms apart by construction of the assertion below)
    val t1 = GraftTable.manifest(root, 1).committedAtMs.get
    val t2 = GraftTable.manifest(root, 2).committedAtMs.get
    if (t2 > t1) // same-ms commits would make "between" empty — skip
      assert(spark.sql(
        s"SELECT count(1) FROM graft_table_asof('$root', ${t2 - 1})")
        .head().getLong(0) == 100)
    assert(spark.sql(
      s"SELECT count(1) FROM graft_table_asof('$root', $t2)")
      .head().getLong(0) == 150)

    // CDC: the v1→v2 delta is exactly the appended slice
    val delta = spark.sql(
      s"SELECT min(id) AS lo, max(id) AS hi, count(1) AS n " +
        s"FROM graft_table_changes('$root', 1, 2)").head()
    assert((delta.getLong(0), delta.getLong(1), delta.getLong(2)) ==
      (101L, 150L, 50L))

    // DESCRIBE HISTORY as a relation: newest first, composable
    val hist = spark.sql(
      s"SELECT snapshot, op FROM graft_table_history('$root') " +
        "ORDER BY snapshot").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(hist == Seq((1, "create"), (2, "append")), hist.toString)

    // misuse: non-literal or wrongly-typed arguments must fail at
    // analysis with the function's own message, not an obscure cast
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table('$root', id)").collect()
    }
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table('$root', 'one')").collect()
    }
    assert((e1.getMessage + e2.getMessage).contains("graft_table"))
  }

  test("table_scd2: intervals chain per key, exactly one current row, " +
      "updated keys carry the doubled price in their current version") {
    val sf = "/root/testdata/sf0.001"
    val rows = ops.Table.table_scd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getBoolean(3), r.getDouble(4)))
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, vs) =>
      val sorted = vs.sortBy(_._2)
      // exactly one current (open) interval, and it is the last one
      assert(sorted.count(_._4) == 1 && sorted.last._4, s"key $k")
      assert(sorted.last._3.isEmpty, s"key $k current must be open")
      // intervals chain: each closed row's valid_to = successor's from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2), s"key $k gap: ${a._3} vs ${b._2}")
        case _ =>
      }
      // versioned keys: exactly 2 rows, second price = 2x first
      if (sorted.length > 1) {
        assert(sorted.length == 2 && sorted.last._5 == 2 * sorted.head._5,
          s"key $k history $sorted")
      }
    }
    // the fixture's touched slice is non-trivial and matches the recipe
    val touched = byKey.filter(_._2.length > 1).keySet
    assert(touched.nonEmpty && touched.forall(_ % 3 == 0))
  }

  test("scd2Of: 3-version keys chain, a delete closes its interval " +
      "leaving NO current row, and a re-insert opens a fresh interval " +
      "(r9 latent-divergence audit — the production fixture caps at 2 " +
      "versions/key and never deletes)") {
    import spark.implicits._
    val root = freshRoot()
    def df(rows: (Long, Double)*) =
      rows.toSeq.toDF("o_orderkey", "o_totalprice")
    val k = Seq("o_orderkey")
    GraftTable.create(spark, root,
      df(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0), k, k,
      numFiles = 2)
    GraftTable.merge(spark, root, df(1L -> 100.0, 5L -> 50.0),
      "o_orderkey", k, k, 2)                       // v2: update + insert
    GraftTable.merge(spark, root, df(1L -> 300.0),
      "o_orderkey", k, k, 2)                       // v3: third version
    GraftTable.delete(spark, root, Seq(2L).toDF("o_orderkey"),
      "o_orderkey", k, k, 2)                       // v4: delete key 2
    GraftTable.merge(spark, root, df(2L -> 999.0),
      "o_orderkey", k, k, 2)                       // v5: resurrect key 2
    val got = ops.Table.scd2Of(
      GraftTable.changesBetweenRows(spark, root, 0, 5, "o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getBoolean(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 1, Some(2), false, 10.0),
      (1L, 2, Some(3), false, 100.0),
      (1L, 3, None, true, 300.0),
      (2L, 1, Some(4), false, 20.0),   // closed BY the delete commit
      (2L, 5, None, true, 999.0),      // fresh interval post-resurrection
      (3L, 1, None, true, 30.0),
      (4L, 1, None, true, 40.0),
      (5L, 2, None, true, 50.0)), got.toString)
  }

  // ---- SQL DML (graft.sql.GraftSql / GraftDmlRule) ----

  import graft.sql.{GraftSql, GraftSqlTables}

  private def sqlTable(name: String, n: Int = 10): String = {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(n), Seq("id"), Seq("id"),
      numFiles = 2)
    GraftSqlTables.register(name,
      GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id"), 2))
    root
  }

  private def state(root: String): Map[Long, String] =
    GraftTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("sql dml: MERGE classifies matched/not-matched/by-source and " +
      "applies first-matching-action per row") {
    val root = sqlTable("m_t")
    GraftSql.exec(spark,
      """MERGE INTO m_t t
         USING (SELECT id, concat('s', id) AS payload FROM range(6, 16)) s
         ON t.id = s.id
         WHEN MATCHED AND s.id % 2 = 0 THEN DELETE
         WHEN MATCHED THEN UPDATE SET payload = s.payload
         WHEN NOT MATCHED AND s.id <= 13 THEN INSERT *
         WHEN NOT MATCHED BY SOURCE AND t.id <= 2
           THEN UPDATE SET payload = 'old'""")
    val got = state(root)
    val want = Map(
      1L -> "old", 2L -> "old", 3L -> "v3", 4L -> "v4", 5L -> "v5",
      7L -> "s7", 9L -> "s9", 11L -> "s11", 12L -> "s12", 13L -> "s13")
    assert(got == want)
  }

  test("sql dml: INSERT positional + UPDATE WHERE + DELETE round-trip") {
    val root = sqlTable("d_t", n = 5)
    GraftSql.exec(spark,
      "INSERT INTO d_t SELECT id + 100, concat('p', id) FROM range(1, 4)")
    GraftSql.exec(spark,
      "UPDATE d_t SET payload = upper(payload) WHERE id > 100")
    GraftSql.exec(spark, "DELETE FROM d_t WHERE id = 102")
    val got = state(root)
    assert(got == Map(1L -> "v1", 2L -> "v2", 3L -> "v3", 4L -> "v4",
      5L -> "v5", 101L -> "P1", 103L -> "P3"))
  }

  test("upsertDelete: one commit applies updates, inserts and deletes " +
      "atomically; matching nothing with no updates declines to commit") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 2)
    val v = GraftTable.upsertDelete(spark, root,
      Seq((3L, "UPD"), (11L, "NEW")).toDF("id", "payload"),
      Seq(7L).toDF("id"), "id", Seq("id"), Seq("id"), 2)
    assert(v == 2 && GraftTable.latestSnapshot(root) == 2,
      "updates + deletes must land as ONE commit")
    val got = GraftTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == ((1 to 10).filter(_ != 7)
      .map(i => i.toLong -> s"v$i").toMap
      + (3L -> "UPD") + (11L -> "NEW")))
    // no-op: delete keys absent, no updates → no empty commit
    val v2 = GraftTable.upsertDelete(spark, root,
      spark.emptyDataset[(Long, String)].toDF("id", "payload"),
      Seq(999L).toDF("id"), "id", Seq("id"), Seq("id"), 2)
    assert(v2 == 2 && GraftTable.latestSnapshot(root) == 2)
  }

  test("sql dml: a 4-arm MERGE lands as exactly ONE snapshot commit " +
      "(update/insert AND delete arms together — no half-applied " +
      "statement window)") {
    val root = sqlTable("atomic_t")
    val v0 = GraftTable.latestSnapshot(root)
    GraftSql.exec(spark,
      """MERGE INTO atomic_t t
         USING (SELECT id, concat('s', id) AS payload
                FROM range(6, 14)) s
         ON t.id = s.id
         WHEN MATCHED AND s.id % 2 = 0 THEN DELETE
         WHEN MATCHED THEN UPDATE SET payload = s.payload
         WHEN NOT MATCHED THEN INSERT *
         WHEN NOT MATCHED BY SOURCE AND t.id = 1
           THEN UPDATE SET payload = 'one'""")
    assert(GraftTable.latestSnapshot(root) == v0 + 1,
      "a MERGE with both upsert and delete arms must be ONE commit")
    assert(state(root) == Map(1L -> "one", 2L -> "v2", 3L -> "v3",
      4L -> "v4", 5L -> "v5", 7L -> "s7", 9L -> "s9",
      11L -> "s11", 12L -> "s12", 13L -> "s13"))
  }

  test("sql dml: UPDATE SET * may never re-key a matched row — benign " +
      "under ON t.key = s.key, loud when the ON matches on a non-key") {
    val root = sqlTable("star_t", n = 5)
    // benign: the ON proves the key assignment is the identity
    GraftSql.exec(spark,
      """MERGE INTO star_t t
         USING (SELECT 5 AS id, 'starred' AS payload) s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *""")
    assert(state(root) == Map(1L -> "v1", 2L -> "v2", 3L -> "v3",
      4L -> "v4", 5L -> "starred"))
    // malicious: matched via old_id, star would write s.id = 99 over
    // key 5 — silent identity change, must fail loudly instead
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        """MERGE INTO star_t t
           USING (SELECT 99 AS id, 5 AS old_id, 'evil' AS payload) s
           ON t.id = s.old_id
           WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(state(root)(5L) == "starred" && !state(root).contains(99L),
      "the rejected statement must commit nothing")
  }

  test("sql dml: INSERT enforces the key contract — duplicate keys in " +
      "the batch and keys the table already holds both fail loudly") {
    val root = sqlTable("ins_t", n = 5)
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        """INSERT INTO ins_t
           SELECT id % 2 + 100, 'dup' FROM range(0, 4)""")
    }
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "INSERT INTO ins_t SELECT 3, 'clash'")
    }
    assert(state(root) == (1 to 5).map(i => i.toLong -> s"v$i").toMap,
      "failed INSERTs must commit nothing")
  }

  test("sql dml: registered names resolve inside an INSERT's source " +
      "query and inside subquery expressions, on the plain session") {
    val rootA = sqlTable("src_t", n = 4)
    val rootB = freshRoot()
    GraftTable.create(spark, rootB,
      { import spark.implicits._
        Seq((100L, "z")).toDF("id", "payload") },
      Seq("id"), Seq("id"), numFiles = 1)
    GraftSqlTables.register("dst_t",
      GraftSqlTables.Ref(rootB, "id", Seq("id"), Seq("id"), 1))
    // INSERT whose FROM reads another registered graft table
    GraftSql.exec(spark,
      "INSERT INTO dst_t SELECT id, payload FROM src_t WHERE id <= 2")
    assert(state(rootB) == Map(100L -> "z", 1L -> "v1", 2L -> "v2"))
    // DELETE whose predicate carries an IN-subquery over a registered
    // name (operator transforms never visit subquery plans)
    GraftSql.exec(spark,
      "DELETE FROM dst_t WHERE id IN (SELECT id FROM src_t)")
    assert(state(rootB) == Map(100L -> "z"))
    // a registered name nested TWO subquery levels deep (the outer
    // subquery has no registered name at operator level)
    GraftSql.exec(spark,
      """DELETE FROM dst_t WHERE id IN (
           SELECT x.id FROM range(1, 1000) x
           WHERE x.id IN (SELECT id + 99 FROM src_t))""")
    assert(state(rootB).isEmpty, state(rootB).toString)
  }

  test("sql dml: nondeterministic UPDATE/DELETE stay row-exact — the " +
      "persisted classification freezes rand() before the multi-pass " +
      "storage commit") {
    val root = sqlTable("rand_t")
    // without the persist, GraftTable.merge's pruning range, affected-
    // file semi-join and survivor rewrite would each re-roll the dice:
    // rows could vanish or duplicate. Frozen, exactly the classified
    // rows update and the table keeps all 10 keys.
    GraftSql.exec(spark,
      """UPDATE rand_t SET payload = concat('r', CAST(id AS STRING))
         WHERE rand(7) < 0.5""")
    val afterU = state(root)
    assert(afterU.keySet == (1L to 10L).toSet,
      s"no row may vanish or duplicate: ${afterU.keySet}")
    assert(afterU.forall { case (k, v) =>
      v == s"v$k" || v == s"r$k" }, afterU.toString)
    // nondeterministic DELETE: some subset vanishes, survivors intact,
    // and the two sides partition the key space exactly
    GraftSql.exec(spark, "DELETE FROM rand_t WHERE rand(11) < 0.5")
    val afterD = state(root)
    assert(afterD.keySet.subsetOf((1L to 10L).toSet) &&
      afterD.forall { case (k, v) => afterU(k) == v },
      s"survivors must be untouched: $afterD")
  }

  test("sql dml: nondeterministic MERGE arm conditions classify each " +
      "row exactly once — survivors are all updated, no duplicates " +
      "(the persisted tagged frame)") {
    val root = sqlTable("randm_t")
    GraftSql.exec(spark,
      """MERGE INTO randm_t t
         USING (SELECT id, concat('m', CAST(id AS STRING)) AS payload
                FROM range(1, 11)) s
         ON t.id = s.id
         WHEN MATCHED AND rand(13) < 0.5 THEN DELETE
         WHEN MATCHED THEN UPDATE SET payload = s.payload""")
    val rows = GraftTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == rows.map(_._1).distinct.length,
      s"a re-rolled condition duplicated a key: ${rows.toSeq}")
    // every survivor must be UPDATED (a neither-arm roll would leave
    // the original payload), every non-survivor deleted
    rows.foreach { case (k, v) =>
      assert(v == s"m$k", s"key $k fired no arm: payload $v") }
    assert(rows.map(_._1).toSet.subsetOf((1L to 10L).toSet))
  }

  test("sql dml: a nondeterministic MERGE source is materialized ONCE " +
      "— each source row classifies exactly once across the inner and " +
      "two anti joins (r10 ADVICE)") {
    val root = sqlTable("ndsrc_t")
    val calls = spark.sparkContext.longAccumulator("ndsrc_calls")
    val mark = udf { (id: Long) => calls.add(1L); id }.asNondeterministic()
    spark.udf.register("ndsrc_mark", mark)
    GraftSql.exec(spark,
      """MERGE INTO ndsrc_t t
         USING (SELECT ndsrc_mark(id) AS id,
                       concat('n', CAST(id AS STRING)) AS payload
                FROM range(6, 16)) s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET payload = s.payload
         WHEN NOT MATCHED THEN INSERT *""")
    // 10 source rows, ONE evaluation: without the persist+count freeze
    // the three classification joins each re-run the source plan (≈30
    // calls), and a rand()-style source could then classify a row as
    // both matched and not-matched, or neither
    assert(calls.value == 10L,
      s"source evaluated ${calls.value} times, expected exactly 10")
    assert(state(root) == ((1L to 5L).map(k => k -> s"v$k") ++
      (6L to 15L).map(k => k -> s"n$k")).toMap)
  }

  test("sql dml: INSERT rejects NULL keys (unaddressable forever under " +
      "key-equi-joined statements)") {
    val root = sqlTable("null_t", n = 3)
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        "INSERT INTO null_t SELECT CAST(NULL AS BIGINT), 'x'")
    }
    assert(state(root).keySet == Set(1L, 2L, 3L))
  }

  test("upsertDelete pins its base snapshot: a commit landing between " +
      "derivation and commit fails loudly, never silently rewrites") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(6), Seq("id"), Seq("id"),
      numFiles = 2)
    // a concurrent writer lands v2
    GraftTable.merge(spark, root, Seq((2L, "other")).toDF("id", "payload"),
      "id", Seq("id"), Seq("id"), 2)
    // our statement was derived against v1 — must not blind-commit
    intercept[java.util.ConcurrentModificationException] {
      GraftTable.upsertDelete(spark, root,
        Seq((3L, "mine")).toDF("id", "payload"),
        Seq(5L).toDF("id"), "id", Seq("id"), Seq("id"), 2,
        baseSnapshot = Some(1))
    }
    assert(state(root) == Map(1L -> "v1", 2L -> "other", 3L -> "v3",
      4L -> "v4", 5L -> "v5", 6L -> "v6"))
  }

  test("sql dml: MERGE sync — a NOT MATCHED BY SOURCE delete arm " +
      "drops every target row absent from the source (the archival " +
      "pattern; exercises the by-source DELETE classification)") {
    val root = sqlTable("sync_t")
    GraftSql.exec(spark,
      """MERGE INTO sync_t t
         USING (SELECT id, concat('s', id) AS payload
                FROM range(3, 7)) s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET payload = s.payload
         WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(state(root) == Map(3L -> "s3", 4L -> "s4",
      5L -> "s5", 6L -> "s6"))
  }

  test("sql dml: loud guards — key equality, key assignment, " +
      "cardinality, insert-key clash, width") {
    val root = sqlTable("g_t")
    // MERGE without target.key = <source expr> in the ON conjuncts
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        """MERGE INTO g_t t USING (SELECT 1 AS id, 'x' AS payload) s
           ON t.id < s.id WHEN MATCHED THEN DELETE""")
    }
    // UPDATE must not assign the key
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "UPDATE g_t SET id = 1")
    }
    // a target row matching two source rows
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        """MERGE INTO g_t t
           USING (SELECT 7 AS id, 'x' AS payload
                  UNION ALL SELECT 7, 'y') s
           ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET payload = s.payload""")
    }
    // insert arm resurrecting a live key (extra ON conjunct fails it
    // into the not-matched side)
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        """MERGE INTO g_t t
           USING (SELECT 5 AS id, 'x' AS payload) s
           ON t.id = s.id AND s.id > 100
           WHEN NOT MATCHED THEN INSERT *""")
    }
    // positional INSERT width mismatch
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "INSERT INTO g_t SELECT id FROM range(1, 2)")
    }
    // BY NAME insert naming a column the table lacks must fail loudly,
    // never silently drop it
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        """INSERT INTO g_t BY NAME
           SELECT 500 AS id, 'x' AS payload, 1 AS nonexistent""")
    }
    // nothing committed by any failed statement
    assert(state(root) == (1 to 10).map(i => i.toLong -> s"v$i").toMap)
  }

  test("sql dml: registered names are READ-addressable — SELECT / " +
      "self-join via GraftSql.sql on the plain session") {
    val root = sqlTable("r_t", n = 6)
    val got = GraftSql.sql(spark,
      "SELECT id, payload FROM r_t WHERE id % 2 = 0 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "v2"), (4L, "v4"), (6L, "v6")))
    val n = GraftSql.sql(spark,
      "SELECT count(1) AS n FROM r_t a JOIN r_t b ON a.id = b.id")
      .head().getLong(0)
    assert(n == 6L)
    // reads see DML immediately: delete then re-read by name
    GraftSql.exec(spark, "DELETE FROM r_t WHERE id <= 4")
    assert(GraftSql.sql(spark, "SELECT id FROM r_t").count() == 2L)
    assert(state(root).keySet == Set(5L, 6L))
  }

  test("sql dml: injected GraftExtensions collapse plain spark.sql DML " +
      "inside the analyzer") {
    val root = sqlTable("ext_t")
    val SS = org.apache.spark.sql.SparkSession
    SS.clearActiveSession(); SS.clearDefaultSession()
    val s2 = SS.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne spark) // a real second session, extensions applied
      s2.sql("DELETE FROM ext_t WHERE id % 2 = 0")
      s2.sql(
        """MERGE INTO ext_t t
           USING (SELECT 1 AS id, 'sql' AS payload) s
           ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET payload = s.payload""")
      // name-addressed READ through plain spark.sql on the same session
      assert(s2.sql("SELECT count(1) AS n FROM ext_t").head()
        .getLong(0) == 5L)
      // scalar subquery in SET must pass checkAnalysis (the UPDATE
      // projection is plan-typed, not a command expression field)
      s2.sql("UPDATE ext_t SET payload = (SELECT 'zz') WHERE id = 3")
      assert(s2.sql("SELECT payload FROM ext_t WHERE id = 3").head()
        .getString(0) == "zz")
    } finally {
      SS.setDefaultSession(spark); SS.setActiveSession(spark)
    }
    assert(state(root) == Map(1L -> "sql", 3L -> "zz", 5L -> "v5",
      7L -> "v7", 9L -> "v9"))
  }

  // ---- SQL DDL (graft.sql.GraftSqlDdl) ----

  test("sql ddl: CREATE TABLE ... USING graft / INSERT / SELECT / DROP " +
      "round-trip from pure SQL; every malformed statement fails loudly") {
    val dir = freshRoot()
    GraftSql.exec(spark,
      s"""CREATE TABLE ddl_t (id BIGINT, payload STRING) USING graft
          OPTIONS (key 'id', num_files '2') LOCATION '$dir'""")
    GraftSql.exec(spark,
      "INSERT INTO ddl_t SELECT id, concat('v', id) FROM range(1, 6)")
    assert(state(dir) == (1L to 5L).map(i => i -> s"v$i").toMap)
    assert(GraftSql.sql(spark, "SELECT count(1) AS n FROM ddl_t")
      .head().getLong(0) == 5L)
    // duplicate CREATE loud; IF NOT EXISTS no-op that keeps the binding
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, s"CREATE TABLE ddl_t (id BIGINT) USING graft " +
        s"OPTIONS (key 'id') LOCATION '${freshRoot()}'")
    }
    GraftSql.exec(spark, s"CREATE TABLE IF NOT EXISTS ddl_t (id BIGINT) " +
      s"USING graft OPTIONS (key 'id') LOCATION '${freshRoot()}'")
    assert(GraftSql.sql(spark, "SELECT count(1) AS n FROM ddl_t")
      .head().getLong(0) == 5L, "IF NOT EXISTS must keep the binding")
    // typo'd option, missing key, missing location, key not in schema
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, s"CREATE TABLE ddl_bad (id BIGINT) USING graft " +
        s"OPTIONS (key 'id', keyy 'id') LOCATION '${freshRoot()}'")
    }
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, s"CREATE TABLE ddl_bad (id BIGINT) USING graft " +
        s"LOCATION '${freshRoot()}'")
    }
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        "CREATE TABLE ddl_bad (id BIGINT) USING graft OPTIONS (key 'id')")
    }
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, s"CREATE TABLE ddl_bad (id BIGINT) USING graft " +
        s"OPTIONS (key 'nope') LOCATION '${freshRoot()}'")
    }
    assert(GraftSqlTables.lookup(Seq("ddl_bad")).isEmpty,
      "a failed CREATE must register nothing")
    // DROP unbinds the name; the files stay (external-table semantics)
    GraftSql.exec(spark, "DROP TABLE ddl_t")
    assert(GraftSqlTables.lookup(Seq("ddl_t")).isEmpty)
    intercept[Exception] {
      GraftSql.sql(spark, "SELECT 1 FROM ddl_t").collect()
    }
    assert(GraftTable.latestSnapshot(dir) == 2,
      "a non-PURGE DROP must leave the table files intact")
    // re-adopt the surviving files, then PURGE deletes them
    GraftSqlTables.register("ddl_t",
      GraftSqlTables.Ref(dir, "id", Seq("id"), Seq("id"), 2))
    GraftSql.exec(spark, "DROP TABLE ddl_t PURGE")
    assert(!new java.io.File(dir).exists(),
      "DROP PURGE must delete the storage root")
  }

  test("sql ddl: CTAS births the table from a query (registered names " +
      "resolve in its FROM) and enforces the key contract from birth") {
    sqlTable("ctas_src", n = 6)
    val dir = freshRoot()
    GraftSql.exec(spark,
      s"""CREATE TABLE ctas_t USING graft
          OPTIONS (key 'id', num_files '2') LOCATION '$dir'
          AS SELECT id, upper(payload) AS payload FROM ctas_src
             WHERE id <= 4""")
    assert(state(dir) == Map(1L -> "V1", 2L -> "V2", 3L -> "V3",
      4L -> "V4"))
    // and the born table is immediately DML-addressable
    GraftSql.exec(spark, "DELETE FROM ctas_t WHERE id = 2")
    assert(state(dir).keySet == Set(1L, 3L, 4L))
    // duplicate keys in the CTAS output: nothing created, nothing bound
    val dir2 = freshRoot()
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        s"""CREATE TABLE ctas_bad USING graft OPTIONS (key 'id')
            LOCATION '$dir2'
            AS SELECT id % 2 AS id, payload FROM ctas_src""")
    }
    assert(GraftSqlTables.lookup(Seq("ctas_bad")).isEmpty)
    assert(GraftTable.latestSnapshot(dir2) == 0,
      "a failed CTAS must write no table")
  }

  test("sql ddl: a nondeterministic CTAS query is materialized ONCE — " +
      "the created table holds exactly the rows the key guard checked") {
    val calls = spark.sparkContext.longAccumulator("ndctas_calls")
    val mark = udf { (id: Long) => calls.add(1L); id }.asNondeterministic()
    spark.udf.register("ndctas_mark", mark)
    val dir = freshRoot()
    GraftSql.exec(spark,
      s"""CREATE TABLE ndctas_t USING graft OPTIONS (key 'id')
          LOCATION '$dir'
          AS SELECT ndctas_mark(id) AS id, 'x' AS payload
             FROM range(0, 20)""")
    assert(calls.value == 20L,
      s"CTAS query evaluated ${calls.value} times, expected exactly 20 " +
        "(guard + write must read the one materialized frame)")
    assert(state(dir).keySet == (0L until 20L).toSet)
    GraftSql.exec(spark, "DROP TABLE ndctas_t PURGE")
  }

  test("sql ddl: duplicate column names fail loudly in declared schemas " +
      "and CTAS outputs") {
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        s"""CREATE TABLE dup_t (id BIGINT, payload STRING, ID STRING)
            USING graft OPTIONS (key 'id') LOCATION '${freshRoot()}'""")
    }
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        s"""CREATE TABLE dup_t USING graft OPTIONS (key 'id')
            LOCATION '${freshRoot()}'
            AS SELECT 1 AS id, 'a' AS payload, 'b' AS payload""")
    }
    assert(GraftSqlTables.lookup(Seq("dup_t")).isEmpty)
  }

  test("sql ddl: clauses graft cannot store are REJECTED, never " +
      "silently dropped — DEFAULT, GENERATED, TBLPROPERTIES, COMMENT, " +
      "and an ambiguous LOCATION + OPTIONS(root) pair") {
    def bad(sql: String): Unit =
      intercept[IllegalArgumentException] { GraftSql.exec(spark, sql) }
    bad(s"""CREATE TABLE loud_t (id BIGINT, v STRING DEFAULT 'x')
            USING graft OPTIONS (key 'id') LOCATION '${freshRoot()}'""")
    bad(s"""CREATE TABLE loud_t (id BIGINT GENERATED ALWAYS AS IDENTITY,
              v STRING)
            USING graft OPTIONS (key 'id') LOCATION '${freshRoot()}'""")
    bad(s"""CREATE TABLE loud_t (id BIGINT) USING graft
            OPTIONS (key 'id') LOCATION '${freshRoot()}'
            TBLPROPERTIES ('a' = 'b')""")
    bad(s"""CREATE TABLE loud_t (id BIGINT) USING graft
            OPTIONS (key 'id') LOCATION '${freshRoot()}'
            COMMENT 'lost forever'""")
    bad(s"""CREATE TABLE loud_t (id BIGINT) USING graft
            OPTIONS (key 'id', root '${freshRoot()}')
            LOCATION '${freshRoot()}'""")
    assert(GraftSqlTables.lookup(Seq("loud_t")).isEmpty,
      "no rejected statement may leave a binding behind")
  }

  test("sql ddl: two concurrent CREATEs of one name produce exactly ONE " +
      "success (atomic claim, loser fails loudly with no orphaned bind)") {
    val dirs = Seq(freshRoot(), freshRoot())
    val results =
      new java.util.concurrent.ConcurrentLinkedQueue[Either[String, String]]
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = dirs.map { dir =>
      new Thread(() => {
        gate.await()
        try {
          GraftSql.exec(spark,
            s"""CREATE TABLE race_t (id BIGINT, payload STRING)
                USING graft OPTIONS (key 'id') LOCATION '$dir'""")
          results.add(Right(dir))
        } catch {
          case e: IllegalArgumentException => results.add(Left(e.getMessage))
        }
      })
    }
    threads.foreach(_.start()); gate.countDown()
    threads.foreach(_.join(120000))
    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toList
    assert(rs.count(_.isRight) == 1, s"exactly one CREATE must win: $rs")
    val winner = rs.collectFirst { case Right(d) => d }.get
    assert(GraftSqlTables.lookup(Seq("race_t")).map(_.root)
      .contains(winner), "the binding must point at the WINNER's root")
    GraftSql.exec(spark, "DROP TABLE race_t PURGE")
  }

  test("sql ddl: multi-part names register, resolve and drop (ns.t)") {
    val dir = freshRoot()
    GraftSql.exec(spark,
      s"""CREATE TABLE graftns.ddl_mp (id BIGINT, payload STRING)
          USING graft OPTIONS (key 'id') LOCATION '$dir'""")
    GraftSql.exec(spark, "INSERT INTO graftns.ddl_mp SELECT 1, 'a'")
    assert(GraftSql.sql(spark,
      "SELECT payload FROM graftns.ddl_mp").head().getString(0) == "a")
    GraftSql.exec(spark, "DROP TABLE graftns.ddl_mp PURGE")
    assert(GraftSqlTables.lookup(Seq("graftns", "ddl_mp")).isEmpty)
  }

  test("sql ddl: ALTER TABLE ADD COLUMNS is metadata-only — same files, " +
      "old rows read NULL, the widened width binds INSERT positionally, " +
      "UPDATE backfills; unsupported clauses fail loudly") {
    val dir = freshRoot()
    GraftSql.exec(spark,
      s"""CREATE TABLE alt_t (id BIGINT, payload STRING) USING graft
          OPTIONS (key 'id', num_files '2') LOCATION '$dir'""")
    GraftSql.exec(spark,
      "INSERT INTO alt_t SELECT id, concat('v', id) FROM range(1, 4)")
    val preFiles =
      GraftTable.manifest(dir, GraftTable.latestSnapshot(dir)).files
    GraftSql.exec(spark, "ALTER TABLE alt_t ADD COLUMNS (score BIGINT)")
    val postM = GraftTable.manifest(dir, GraftTable.latestSnapshot(dir))
    assert(postM.files == preFiles, "alter must not touch data files")
    assert(postM.op == "alter_add(score)")
    // every pre-alter row reads the new column as NULL
    assert(GraftSql.sql(spark, "SELECT score FROM alt_t").collect()
      .forall(_.isNullAt(0)))
    // the positional width check now demands THREE columns
    intercept[Exception] {
      GraftSql.exec(spark, "INSERT INTO alt_t SELECT 9L, 'v9'")
    }
    GraftSql.exec(spark,
      "INSERT INTO alt_t SELECT 9L AS id, 'v9' AS p, 99L AS s")
    // UPDATE backfills a pre-alter row (copy-on-write rewrite carries
    // the widened schema); untouched old rows stay NULL
    GraftSql.exec(spark, "UPDATE alt_t SET score = 5 WHERE id = 2")
    val got = GraftSql.sql(spark,
      "SELECT id, score FROM alt_t ORDER BY id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> None, 2L -> Some(5L), 3L -> None,
      9L -> Some(99L)), got.toString)
    // duplicate name, NOT NULL, FIRST — all rejected loudly
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "ALTER TABLE alt_t ADD COLUMNS (score BIGINT)")
    }
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        "ALTER TABLE alt_t ADD COLUMNS (req STRING NOT NULL)")
    }
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        "ALTER TABLE alt_t ADD COLUMNS (head STRING FIRST)")
    }
    // an UNREGISTERED name passes through to Spark's own catalog (and
    // fails there) — the splice must not hijack foreign ALTERs
    intercept[Exception] {
      GraftSql.exec(spark,
        "ALTER TABLE no_such_graft ADD COLUMNS (x INT)")
    }
    // a multi-column clause is ONE commit: a concurrent reader sees
    // pre- or post-widening, never half
    val vBefore = GraftTable.latestSnapshot(dir)
    GraftSql.exec(spark,
      "ALTER TABLE alt_t ADD COLUMNS (c1 INT, c2 STRING)")
    assert(GraftTable.latestSnapshot(dir) == vBefore + 1,
      "multi-column ADD COLUMNS must land as a single commit")
    assert(GraftSql.sql(spark, "SELECT c1, c2 FROM alt_t LIMIT 1")
      .head().isNullAt(0))
    GraftSql.exec(spark, "DROP TABLE alt_t PURGE")
  }

  test("sql ddl: ALTER TABLE RENAME TO rebinds the name only — data " +
      "untouched, the old name unbinds, bound targets rejected") {
    val dir = freshRoot()
    GraftSql.exec(spark,
      s"""CREATE TABLE rn_t (id BIGINT, payload STRING) USING graft
          OPTIONS (key 'id') LOCATION '$dir'""")
    GraftSql.exec(spark,
      "INSERT INTO rn_t SELECT id, concat('v', id) FROM range(1, 4)")
    val snapBefore = GraftTable.latestSnapshot(dir)
    GraftSql.exec(spark, "ALTER TABLE rn_t RENAME TO rn_t2")
    assert(GraftTable.latestSnapshot(dir) == snapBefore,
      "rename must be pure catalog metadata — no table commit")
    assert(GraftSqlTables.lookup(Seq("rn_t")).isEmpty)
    assert(GraftSql.sql(spark, "SELECT count(1) AS n FROM rn_t2")
      .head().getLong(0) == 3L)
    // DML through the new name lands on the same root
    GraftSql.exec(spark, "DELETE FROM rn_t2 WHERE id = 2")
    assert(state(dir).keySet == Set(1L, 3L))
    // renaming onto a bound name fails loudly and changes nothing
    val dir2 = freshRoot()
    GraftSql.exec(spark, s"CREATE TABLE rn_other (id BIGINT) USING graft " +
      s"OPTIONS (key 'id') LOCATION '$dir2'")
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "ALTER TABLE rn_t2 RENAME TO rn_other")
    }
    assert(GraftSqlTables.lookup(Seq("rn_t2")).isDefined,
      "a failed rename must keep the old binding")
    GraftSql.exec(spark, "DROP TABLE rn_t2 PURGE")
    GraftSql.exec(spark, "DROP TABLE rn_other PURGE")
  }

  test("sql ddl: the injected parser handles CREATE / CTAS / DROP " +
      "through plain spark.sql on an extensions session") {
    val SS = org.apache.spark.sql.SparkSession
    SS.clearActiveSession(); SS.clearDefaultSession()
    val s2 = SS.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    val dir = freshRoot()
    try {
      s2.sql(s"""CREATE TABLE ext_ddl (id BIGINT, payload STRING)
                 USING graft OPTIONS (key 'id') LOCATION '$dir'""")
      s2.sql("INSERT INTO ext_ddl SELECT id, concat('e', id) " +
        "FROM range(1, 4)")
      assert(s2.sql("SELECT count(1) AS n FROM ext_ddl").head()
        .getLong(0) == 3L)
      // `SET key = key` is a provable no-op on BOTH session types
      s2.sql("UPDATE ext_ddl SET id = id, payload = 'ee' WHERE id = 2")
      assert(s2.sql("SELECT payload FROM ext_ddl WHERE id = 2").head()
        .getString(0) == "ee")
      // ALTER rides the same parser seam: widened schema visible at once
      s2.sql("ALTER TABLE ext_ddl ADD COLUMNS (score BIGINT)")
      assert(s2.sql("SELECT score FROM ext_ddl WHERE id = 2").head()
        .isNullAt(0), "pre-alter rows must read the new column as NULL")
      // RENAME TO through the injectParser seam too (not only the
      // GraftSql.exec resolve-side splice): old name unbinds, new reads
      s2.sql("ALTER TABLE ext_ddl RENAME TO ext_ddl_renamed")
      assert(s2.sql("SELECT count(1) AS n FROM ext_ddl_renamed").head()
        .getLong(0) == 3L)
      intercept[Exception] {
        s2.sql("SELECT count(1) FROM ext_ddl").collect()
      }
      s2.sql("DROP TABLE ext_ddl_renamed PURGE")
      assert(!new java.io.File(dir).exists())
    } finally {
      SS.setDefaultSession(spark); SS.setActiveSession(spark)
    }
  }

  // ---- r12: SQL maintenance verbs (VACUUM / OPTIMIZE / DESC HISTORY) ----

  test("sql maint: OPTIMIZE ... ZORDER BY from SQL reclusters in place " +
      "— both dimensions prune afterwards, 1-column ZORDER is loud") {
    val root = freshRoot()
    import spark.implicits._
    val rows = (0L until 1000L)
      .map(i => (i, i % 1000003L * 2654435761L % 1000003L % 1000L, s"p$i"))
      .toDF("x", "y", "payload")
    GraftTable.create(spark, root, rows, Seq("x", "y"), Seq("x"),
      numFiles = 16)
    GraftSqlTables.register("maint_zt",
      GraftSqlTables.Ref(root, "x", Seq("x", "y"), Seq("x"), 16))
    try {
      val (_, keptBefore, _) =
        GraftTable.readWhere(spark, root, "y", 0d, 99d)
      assert(keptBefore == 16, "pre-optimize y-pruning should be blind")
      val snap = GraftSql.sql(spark, "OPTIMIZE maint_zt ZORDER BY (x, y)")
        .collect()(0).getInt(0)
      assert(snap == 2)
      assert(GraftTable.history(spark, root).head().getString(2)
        == "compact")
      for (c <- Seq("x", "y")) {
        val (_, kept, total) = GraftTable.readWhere(spark, root, c, 0d, 99d)
        assert(total == 16 && kept < total,
          s"post-OPTIMIZE $c-pruning kept $kept of $total")
      }
      assert(GraftTable.read(spark, root).count() == 1000)
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark, "OPTIMIZE maint_zt ZORDER BY (x)")
      }
    } finally GraftSqlTables.unregister("maint_zt")
  }

  test("sql maint: VACUUM RETAIN expires history with tags as retention " +
      "roots, the receipt reports reclaims, RETAIN 0 is loud") {
    val root = sqlTable("maint_vt", n = 4) // v1
    try {
      GraftSql.exec(spark, "INSERT INTO maint_vt " +
        "SELECT id, concat('w', id) FROM range(100, 104)") // v2
      GraftTable.tag(root, "keep1", 1)
      GraftSql.exec(spark,
        "UPDATE maint_vt SET payload = 'u' WHERE id = 2") // v3
      GraftSql.exec(spark, "OPTIMIZE maint_vt") // v4 bin-pack
      val receipt = GraftSql
        .sql(spark, "VACUUM maint_vt RETAIN 1 SNAPSHOTS").collect()(0)
      assert(receipt.getInt(0) > 0,
        "expiry must reclaim the superseded files")
      // v4 survives (RETAIN 1), tagged v1 survives, v2/v3 expired
      assert(GraftTable.history(spark, root).select("snapshot").collect()
        .map(_.getInt(0)).toSet == Set(1, 4))
      intercept[Exception] {
        GraftTable.read(spark, root, Some(3)).collect()
      }
      assert(GraftTable.readTag(spark, root, "keep1").count() == 4)
      assert(state(root) == Map(1L -> "v1", 2L -> "u", 3L -> "v3",
        4L -> "v4", 100L -> "w100", 101L -> "w101", 102L -> "w102",
        103L -> "w103"),
        "VACUUM must be content-invariant on the surviving latest")
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark, "VACUUM maint_vt RETAIN 0 SNAPSHOTS")
      }
    } finally GraftSqlTables.unregister("maint_vt")
  }

  test("sql maint: the VACUUM orphan sweep honors the 7-day age gate — " +
      "an aged stray goes, a fresh stray (in-flight writer) stays") {
    val root = sqlTable("maint_ot", n = 3)
    try {
      val strayDir = Paths.get(root, "data", "zz_orphan")
      Files.createDirectories(strayDir)
      val fresh = strayDir.resolve("fresh.parquet")
      Files.write(fresh, Array[Byte](1))
      val aged = strayDir.resolve("aged.parquet")
      Files.write(aged, Array[Byte](2))
      Files.setLastModifiedTime(aged,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 8L * 24 * 3600 * 1000))
      val receipt =
        GraftSql.sql(spark, "VACUUM maint_ot").collect()(0)
      assert(receipt.getInt(0) == 0, "no RETAIN clause: nothing expires")
      assert(receipt.getInt(1) == 1, "exactly the aged stray is swept")
      assert(!Files.exists(aged) && Files.exists(fresh),
        "a fresh stray may belong to an in-flight writer — must survive")
    } finally GraftSqlTables.unregister("maint_ot")
  }

  test("sql maint: DESCRIBE HISTORY returns the commit log; unregistered " +
      "names fall through to Spark, VACUUM of one is loud") {
    val root = sqlTable("maint_ht", n = 5)
    try {
      GraftSql.exec(spark, "DELETE FROM maint_ht WHERE id = 5") // v2
      val hist = GraftSql.sql(spark, "DESCRIBE HISTORY maint_ht").collect()
      assert(hist.map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getLong(5))).toSeq ==
        Seq((2, 1, "delete", 4L), (1, 0, "create", 5L)))
      assert(hist.forall(!_.isNullAt(3)), "commit stamps must be present")
      // DESC shorthand rides the same splice
      assert(GraftSql.sql(spark, "DESC HISTORY maint_ht").count() == 2)
      // an unregistered name is NOT ours: Spark's own analyzer answers
      // (here: loudly, since no table `history` exists)
      intercept[Exception] {
        GraftSql.sql(spark, "DESCRIBE HISTORY no_such_graft_t").collect()
      }
      intercept[NoSuchElementException] {
        GraftSql.exec(spark, "VACUUM no_such_graft_t")
      }
    } finally GraftSqlTables.unregister("maint_ht")
  }

  test("sql maint: RESTORE and TAG verbs — tag defaults to latest and " +
      "is a retention root until dropped, restore to expired is loud, " +
      "duplicate tags never silently re-point") {
    val root = sqlTable("maint_rt", n = 3) // v1
    try {
      GraftSql.exec(spark, "INSERT INTO maint_rt " +
        "SELECT id, concat('w', id) FROM range(100, 103)") // v2
      GraftSql.exec(spark, "ALTER TABLE maint_rt CREATE TAG good") // = v2
      assert(GraftTable.tags(root) == Map("good" -> 2))
      // tags are immutable refs: re-pointing is a loud two-step
      intercept[IllegalStateException] {
        GraftSql.exec(spark,
          "ALTER TABLE maint_rt CREATE TAG good AS OF SNAPSHOT 1")
      }
      GraftSql.exec(spark,
        "UPDATE maint_rt SET payload = 'bad' WHERE id >= 100") // v3
      val restored = GraftSql
        .sql(spark, "RESTORE maint_rt TO SNAPSHOT 2").collect()(0).getInt(0)
      assert(restored == 4)
      assert(state(root) == Map(1L -> "v1", 2L -> "v2", 3L -> "v3",
        100L -> "w100", 101L -> "w101", 102L -> "w102"),
        "RESTORE must roll the live state back to the tagged good batch")
      // the tag holds v2 through VACUUM; dropping it releases retention
      GraftSql.exec(spark, "VACUUM maint_rt RETAIN 1 SNAPSHOTS")
      assert(GraftTable.history(spark, root).select("snapshot").collect()
        .map(_.getInt(0)).toSet == Set(2, 4))
      GraftSql.exec(spark, "ALTER TABLE maint_rt DROP TAG good")
      GraftSql.exec(spark, "VACUUM maint_rt RETAIN 1 SNAPSHOTS")
      assert(GraftTable.history(spark, root).select("snapshot").collect()
        .map(_.getInt(0)).toSet == Set(4),
        "dropping the tag must release the retention root")
      // restore to the now-expired snapshot fails loudly through SQL
      intercept[Exception] {
        GraftSql.sql(spark, "RESTORE maint_rt TO SNAPSHOT 3").collect()
      }
      // missing tag and unregistered name are loud too
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark, "ALTER TABLE maint_rt DROP TAG nope")
      }
      intercept[NoSuchElementException] {
        GraftSql.exec(spark, "RESTORE no_such_t TO SNAPSHOT 1")
      }
    } finally GraftSqlTables.unregister("maint_rt")
  }

  test("sql maint: DESCRIBE TABLE shows the manifest schema — widened " +
      "post-ALTER with the added column last; EXTENDED is loud, " +
      "unregistered names stay Spark's") {
    val root = sqlTable("maint_dt", n = 2)
    try {
      GraftSql.exec(spark,
        "ALTER TABLE maint_dt ADD COLUMNS (score BIGINT)")
      val rows = GraftSql.sql(spark, "DESCRIBE maint_dt").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getBoolean(3)))
      assert(rows.toSeq == Seq(
        (1, "id", "bigint", false),
        (2, "payload", "string", true),
        (3, "score", "bigint", true)), rows.mkString(", "))
      intercept[IllegalArgumentException] {
        GraftSql.sql(spark, "DESCRIBE EXTENDED maint_dt")
      }
      // views describe through the same surface (one namespace), and
      // the answer tracks the CURRENT resolved output — including base
      // ALTERs made after the view existed
      GraftSql.exec(spark,
        "CREATE VIEW maint_dt_v AS SELECT id, score FROM maint_dt")
      try {
        val vrows = GraftSql.sql(spark, "DESCRIBE maint_dt_v").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
        assert(vrows.toSeq ==
          Seq((1, "id", "bigint"), (2, "score", "bigint")),
          vrows.mkString(", "))
      } finally {
        graft.sql.GraftSqlViews.unregister(Seq("maint_dt_v")); ()
      }
      // not ours: Spark's own analyzer answers (loudly here)
      intercept[Exception] {
        GraftSql.sql(spark, "DESCRIBE no_such_graft_table").collect()
      }
    } finally GraftSqlTables.unregister("maint_dt")
  }

  // ---- r12: SQL views over graft names ----

  test("sql view: re-resolves to the latest snapshot per query, outer " +
      "predicates compose, OR REPLACE swaps the body, DROP unbinds") {
    val root = sqlTable("vt_base", n = 5)
    try {
      GraftSql.exec(spark,
        "CREATE VIEW vt_v AS SELECT id, payload FROM vt_base WHERE id >= 2")
      assert(GraftSql.sql(spark, "SELECT count(1) AS n FROM vt_v").head()
        .getLong(0) == 4L)
      // a commit AFTER the view exists must be visible through it
      GraftSql.exec(spark,
        "INSERT INTO vt_base SELECT id, concat('n', id) FROM range(10, 13)")
      assert(GraftSql.sql(spark, "SELECT count(1) AS n FROM vt_v").head()
        .getLong(0) == 7L,
        "the view must re-resolve to the latest snapshot, not freeze " +
          "the snapshot live at CREATE time")
      // outer predicate composes with the body's
      assert(GraftSql.sql(spark,
        "SELECT payload FROM vt_v WHERE id = 11").head()
        .getString(0) == "n11")
      // self-join through the view: each reference re-parses — fresh ids
      assert(GraftSql.sql(spark,
        """SELECT count(1) AS n FROM vt_v a JOIN vt_v b ON a.id = b.id""")
        .head().getLong(0) == 7L)
      GraftSql.exec(spark,
        "CREATE OR REPLACE VIEW vt_v AS SELECT id FROM vt_base WHERE id < 2")
      assert(GraftSql.sql(spark, "SELECT count(1) AS n FROM vt_v").head()
        .getLong(0) == 1L, "OR REPLACE must swap the body")
      GraftSql.exec(spark, "DROP VIEW vt_v")
      intercept[Exception] {
        GraftSql.sql(spark, "SELECT count(1) FROM vt_v").collect()
      }
      // a dropped name is no longer ours: both statements fall through
      // to Spark — IF EXISTS no-ops there, the bare DROP throws Spark's
      // own NoSuchTableException (loud either way, never a silent claim)
      intercept[Exception] {
        GraftSql.exec(spark, "DROP VIEW vt_v")
      }
    } finally {
      graft.sql.GraftSqlViews.unregister(Seq("vt_v"))
      GraftSqlTables.unregister("vt_base")
    }
  }

  test("sql view: guards — duplicate loud unless IF NOT EXISTS, " +
      "table-name collision loud, column list loud, cycles rejected, " +
      "views nest") {
    val root = sqlTable("vg_base", n = 4)
    try {
      // TEMP is rejected loudly: the registry is process-global and
      // cannot honor session-local semantics (review finding, r12 —
      // silently widening the scope is the droppable-clause bug)
      val temp = intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          "CREATE TEMP VIEW vg_v AS SELECT id FROM vg_base WHERE id > 1")
      }
      assert(temp.getMessage.contains("TEMP"))
      GraftSql.exec(spark,
        "CREATE VIEW vg_v AS SELECT id FROM vg_base WHERE id > 1")
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          "CREATE VIEW vg_v AS SELECT id FROM vg_base")
      }
      // IF NOT EXISTS: silently keeps the existing body
      GraftSql.exec(spark,
        "CREATE VIEW IF NOT EXISTS vg_v AS SELECT id FROM vg_base")
      assert(GraftSql.sql(spark, "SELECT count(1) AS n FROM vg_v").head()
        .getLong(0) == 3L)
      // ONE namespace, guarded BOTH ways: a view may not shadow a
      // registered graft TABLE name, and a table (CREATE or RENAME
      // target) may not take a view's — a doubly-bound name would read
      // as the view while DML hits the table, silently
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          "CREATE VIEW vg_base AS SELECT id FROM vg_v")
      }
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          s"""CREATE TABLE vg_v (id BIGINT) USING graft
              OPTIONS (key 'id') LOCATION '${freshRoot()}'""")
      }
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark, "ALTER TABLE vg_base RENAME TO vg_v")
      }
      assert(GraftSqlTables.lookup(Seq("vg_base")).isDefined,
        "a rejected rename must keep the old table binding")
      // column lists are not stored — loud, never silently dropped
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          "CREATE VIEW vg_cols (a) AS SELECT id FROM vg_base")
      }
      // views nest: a view over a view still re-resolves and pushes down
      GraftSql.exec(spark,
        "CREATE VIEW vg_v2 AS SELECT id FROM vg_v WHERE id > 2")
      assert(GraftSql.sql(spark, "SELECT count(1) AS n FROM vg_v2").head()
        .getLong(0) == 2L)
      // a cycle through OR REPLACE is rejected at CREATE time — the
      // expansion would otherwise loop the analyzer
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          "CREATE OR REPLACE VIEW vg_v AS SELECT id FROM vg_v2")
      }
      // the reject must not have clobbered the old body
      assert(GraftSql.sql(spark, "SELECT count(1) AS n FROM vg_v").head()
        .getLong(0) == 3L)
    } finally {
      graft.sql.GraftSqlViews.unregister(Seq("vg_v"))
      graft.sql.GraftSqlViews.unregister(Seq("vg_v2"))
      GraftSqlTables.unregister("vg_base")
    }
  }

  test("sql scoping: a CTE name shadows a registered graft table/view " +
      "in GraftSql.sql; DESCRIBE round-trips backticked view names; " +
      "DESCRIBE HISTORY over a view is loud") {
    val root = sqlTable("cte_shadow_t", n = 5)
    try {
      GraftSql.exec(spark,
        "CREATE VIEW cte_shadow_v AS SELECT id FROM cte_shadow_t")
      // SQL scoping: the CTE must win over the process-global registry
      // even on the GraftSql.resolve path, where the rule runs BEFORE
      // the analyzer's CTESubstitution (ADVICE, r12)
      assert(GraftSql.sql(spark,
        "WITH cte_shadow_t AS (SELECT 99 AS id) " +
          "SELECT id FROM cte_shadow_t").head().getInt(0) == 99,
        "a CTE named like a registered graft TABLE must resolve to the CTE")
      assert(GraftSql.sql(spark,
        "WITH cte_shadow_v AS (SELECT 42 AS id) " +
          "SELECT id FROM cte_shadow_v").head().getInt(0) == 42,
        "a CTE named like a registered graft VIEW must resolve to the CTE")
      // ...including inside a subquery expression
      assert(GraftSql.sql(spark,
        "WITH cte_shadow_t AS (SELECT 3 AS id) SELECT count(1) AS n " +
          "FROM cte_shadow_v WHERE id IN (SELECT id FROM cte_shadow_t)")
        .head().getLong(0) == 1L)
      // outside any CTE the registered names still splice as before
      assert(GraftSql.sql(spark,
        "SELECT count(1) AS n FROM cte_shadow_t").head().getLong(0) == 5L)
      // DESCRIBE HISTORY over a VIEW: loud one-namespace answer, not
      // the delegate's "table named history" confusion (ADVICE, r12)
      val e = intercept[IllegalArgumentException] {
        GraftSql.sql(spark, "DESCRIBE HISTORY cte_shadow_v").collect()
      }
      assert(e.getMessage.contains("no commit history"))
      // a view registered under a backticked name (embedded dot) must
      // DESCRIBE through the same surface — the rebuilt SELECT re-quotes
      GraftSql.exec(spark,
        "CREATE VIEW `dotted.view` AS SELECT id FROM cte_shadow_t")
      val cols = GraftSql.sql(spark, "DESCRIBE `dotted.view`").collect()
      assert(cols.map(_.getString(1)).toSeq == Seq("id"))
    } finally {
      graft.sql.GraftSqlViews.unregister(Seq("cte_shadow_v"))
      graft.sql.GraftSqlViews.unregister(Seq("dotted.view"))
      GraftSqlTables.unregister("cte_shadow_t")
    }
  }

  test("sql show: SHOW TABLES IN graft lists tables+views kind-tagged, " +
      "SHOW VIEWS only views, LIKE filters with Spark SHOW semantics, " +
      "and Spark's own SHOW stays untouched") {
    val root = sqlTable("show_t1", n = 3)
    val root2 = sqlTable("show_t2", n = 3)
    try {
      GraftSql.exec(spark,
        "CREATE VIEW show_v1 AS SELECT id FROM show_t1")
      val all = GraftSql.sql(spark, "SHOW TABLES IN graft LIKE 'show_*'")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(all == Seq("show_t1" -> "table", "show_t2" -> "table",
        "show_v1" -> "view"), s"got $all")
      val views = GraftSql.sql(spark, "SHOW VIEWS IN graft LIKE 'show_*'")
        .collect().map(_.getString(0)).toSeq
      assert(views == Seq("show_v1"))
      // '|' alternation, Spark SHOW pattern semantics (not SQL LIKE)
      val alt = GraftSql.sql(spark,
        "SHOW TABLES IN graft LIKE 'show_t1|show_v*'")
        .collect().map(_.getString(0)).toSeq
      assert(alt == Seq("show_t1", "show_v1"))
      // unfiltered SHOW over the graft namespace includes ours among
      // whatever else the process-global registry holds
      val names = GraftSql.sql(spark, "SHOW TABLES IN graft")
        .collect().map(_.getString(0)).toSet
      assert(Set("show_t1", "show_t2", "show_v1").subsetOf(names))
      // Spark's own SHOW TABLES (no namespace / its catalog) must keep
      // working and must NOT list graft registry names
      val sparkNames =
        spark.sql("SHOW TABLES").collect().map(_.getString(1)).toSet
      assert(!sparkNames.contains("show_t1"),
        "plain SHOW TABLES must stay Spark's, not leak graft names")
    } finally {
      graft.sql.GraftSqlViews.unregister(Seq("show_v1"))
      GraftSqlTables.unregister("show_t1")
      GraftSqlTables.unregister("show_t2")
    }
  }

  test("sql show create table: emitted DDL reflects evolution, " +
      "round-trips through re-execution, views answer their body, " +
      "AS SERDE and Spark's own names stay out") {
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val root = freshRoot()
    try {
      GraftSql.exec(spark,
        s"""CREATE TABLE sc_rt (id BIGINT, payload STRING)
            USING graft
            OPTIONS (key 'id', stats 'id', cluster 'id', bloom 'id',
                     num_files '2')
            LOCATION '$root'""")
      GraftSql.exec(spark, "ALTER TABLE sc_rt ADD COLUMNS (extra INT)")
      GraftSql.exec(spark, "INSERT INTO sc_rt SELECT 1, 'a', 7")
      val stmt = GraftSql.sql(spark, "SHOW CREATE TABLE sc_rt")
        .head().getString(0)
      assert(stmt.contains("extra INT"),
        "the emitted DDL must show the EVOLVED schema")
      assert(stmt.contains("USING graft") && stmt.contains("key 'id'") &&
        stmt.contains("num_files '2'") && stmt.contains(s"LOCATION '$root'"))
      // the round-trip: re-execute at a fresh location, identical shape
      val root2 = freshRoot()
      GraftSql.exec(spark, stmt
        .replace("`sc_rt`", "sc_rt2").replace(s"'$root'", s"'$root2'"))
      try {
        val d1 = GraftSql.sql(spark, "DESCRIBE sc_rt").collect().toSeq
        val d2 = GraftSql.sql(spark, "DESCRIBE sc_rt2").collect().toSeq
        assert(d1 == d2, "re-executed DDL must reproduce the schema")
        val r2 = GraftSqlTables.lookup(Seq("sc_rt2")).get
        assert(r2.keyCol == "id" && r2.bloomCols == Seq("id") &&
          r2.numFiles == 2)
      } finally GraftSqlTables.unregister("sc_rt2")
      // a view answers its stored body
      GraftSql.exec(spark,
        "CREATE VIEW sc_rtv AS SELECT id FROM sc_rt WHERE id > 0")
      try {
        val v = GraftSql.sql(spark, "SHOW CREATE TABLE sc_rtv")
          .head().getString(0)
        assert(v == "CREATE VIEW `sc_rtv` AS SELECT id FROM sc_rt " +
          "WHERE id > 0")
      } finally graft.sql.GraftSqlViews.unregister(Seq("sc_rtv"))
      intercept[IllegalArgumentException] {
        GraftSql.sql(spark, "SHOW CREATE TABLE sc_rt AS SERDE").collect()
      }
      // unregistered names fall through to Spark's own surface
      intercept[org.apache.spark.sql.AnalysisException] {
        GraftSql.sql(spark, "SHOW CREATE TABLE no_such_graft_name")
          .collect()
      }
    } finally GraftSqlTables.unregister("sc_rt")
  }

  test("rename column: metadata-only commit — pre-rename files read by " +
      "the NEW name, chained renames compose, time travel keeps the old " +
      "name, stats/bloom re-key, guards loud") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(50), Seq("id"), Seq("id"),
      numFiles = 2)
    val preFiles = GraftTable.manifest(root, 1).files.map(_.path).toSet
    assert(GraftTable.alterRenameColumn(root, "payload", "note") == 2)
    assert(GraftTable.manifest(root, 2).files.map(_.path).toSet == preFiles,
      "RENAME COLUMN must move zero data — same physical files")
    val renamed = GraftTable.read(spark, root)
    assert(renamed.schema.fieldNames.toSeq == Seq("id", "note"))
    assert(renamed.where(col("note") === "v7").select("id").head()
      .getLong(0) == 7L,
      "pre-rename files must resolve the renamed column's DATA, not NULL")
    assert(renamed.where(col("note").isNull).count() == 0)
    // post-rename append under the new name; both epochs read together
    GraftTable.append(spark, root,
      Seq((100L, "n100")).toDF("id", "note"), Seq("id"), Seq("id"))
    val both = GraftTable.read(spark, root)
    assert(both.count() == 51)
    assert(both.where(col("note").isin("v7", "n100")).count() == 2)
    // chained rename composes (write-time physical name survives)
    GraftTable.alterRenameColumn(root, "note", "memo")
    val chained = GraftTable.read(spark, root)
    assert(chained.schema.fieldNames.toSeq == Seq("id", "memo"))
    assert(chained.where(col("memo") === "v7").count() == 1)
    // time travel presents each snapshot's OWN schema and data
    assert(GraftTable.read(spark, root, Some(1)).schema.fieldNames.toSeq ==
      Seq("id", "payload"))
    assert(GraftTable.read(spark, root, Some(1))
      .where(col("payload") === "v7").count() == 1)
    // stats re-key: pruning by the NEW name still skips files
    GraftTable.alterRenameColumn(root, "id", "doc_id")
    val (_, kept, total) = GraftTable.readWhere(spark, root, "doc_id", 1, 5)
    assert(total >= 3 && kept < total,
      s"renamed-column stats must still prune ($kept of $total)")
    // guards: missing source, existing target, self
    intercept[NoSuchElementException] {
      GraftTable.alterRenameColumn(root, "payload", "x")
    }
    intercept[IllegalArgumentException] {
      GraftTable.alterRenameColumn(root, "memo", "doc_id")
    }
  }

  test("rename column: deletion vectors keep applying across the rename " +
      "(the DV-aware read resolves write-time names too)") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(50), Seq("id"), Seq("id"),
      numFiles = 2)
    GraftTable.deleteMor(spark, root, Seq(7L, 9L).toDF("id"), "id")
    GraftTable.alterRenameColumn(root, "payload", "note")
    val df = GraftTable.read(spark, root)
    assert(df.count() == 48)
    assert(df.where(col("id").isin(7L, 9L)).count() == 0,
      "DV positions must keep masking rows after the rename")
    assert(df.where(col("note") === "v8").count() == 1)
  }

  test("rename column vs CDC: the alter commit emits zero change rows, " +
      "the history reads in the TO-snapshot's names, and restore across " +
      "the rename row-diffs positionally") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1) // v1
    GraftTable.alterRenameColumn(root, "payload", "note") // v2
    GraftTable.append(spark, root,
      Seq((100L, "n100")).toDF("id", "note"), Seq("id"), Seq("id")) // v3
    val cdc = GraftTable.changesBetweenRows(spark, root, 0, 3, "id")
    assert(cdc.columns.toSeq ==
      Seq("id", "note", "_change_type", "_commit_snapshot"),
      "CDC must present the whole history in the LATEST names")
    assert(cdc.where(col("_commit_snapshot") === 2).count() == 0,
      "a metadata-only rename commit must emit zero change rows")
    // the pre-rename create rows carry their data under the NEW name —
    // a name split would leave 'note' null for them
    assert(cdc.where(col("_commit_snapshot") === 1 &&
      col("note").isNull).count() == 0)
    assert(cdc.count() == 11)
    // restore ACROSS the rename (v4 = back to v1's old-name schema):
    // the row diff relabels positionally, so the appended row reads as
    // a clean delete, nothing else changes
    GraftTable.restore(root, 1) // v4
    val r = GraftTable.changesBetweenRows(spark, root, 3, 4, "id")
    assert(r.select("_change_type").as[String].collect().toSeq ==
      Seq("delete"))
    assert(r.head().getLong(0) == 100L)
  }

  test("sql rename column: registered Ref follows a key rename so DML " +
      "keeps working; DROP/ALTER COLUMN stay loud") {
    val root = sqlTable("rencol_t", n = 5)
    try {
      GraftSql.exec(spark,
        "ALTER TABLE rencol_t RENAME COLUMN payload TO note")
      assert(GraftSql.sql(spark,
        "SELECT note FROM rencol_t WHERE id = 3").head().getString(0) == "v3")
      // key rename: the Ref must follow or every later verb breaks
      GraftSql.exec(spark, "ALTER TABLE rencol_t RENAME COLUMN id TO doc_id")
      assert(GraftSqlTables.lookup(Seq("rencol_t")).get.keyCol == "doc_id")
      GraftSql.exec(spark,
        "INSERT INTO rencol_t SELECT 100, 'n100'")
      GraftSql.exec(spark, "DELETE FROM rencol_t WHERE doc_id = 1")
      assert(GraftSql.sql(spark,
        "SELECT count(1) AS n FROM rencol_t").head().getLong(0) == 5L)
      // the KEY column is not droppable: every DML verb addresses rows
      // by it; type changes stay loudly rejected
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark, "ALTER TABLE rencol_t DROP COLUMN doc_id")
      }
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          "ALTER TABLE rencol_t ALTER COLUMN note TYPE BIGINT")
      }
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          "ALTER TABLE rencol_t RENAME COLUMN a.b TO c")
      }
    } finally GraftSqlTables.unregister("rencol_t")
  }

  test("drop column: metadata-only commit; a re-added namesake reads " +
      "pre-drop files as NULL (no resurrection); restore undoes it") {
    import spark.implicits._
    import org.apache.spark.sql.types.StringType
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1) // v1: (id, payload)
    val pathsBefore = GraftTable.manifest(root, 1).files.map(_.path)
    GraftTable.alterDropColumns(root, Seq("payload")) // v2
    val m2 = GraftTable.manifest(root, 2)
    assert(m2.files.map(_.path) == pathsBefore,
      "drop must move zero data")
    assert(m2.files.forall(f => !f.mins.contains("payload") &&
      !f.maxs.contains("payload")),
      "stale stats on a dropped name would prune a re-added namesake " +
        "against dead data")
    val v2 = GraftTable.read(spark, root)
    assert(v2.columns.toSeq == Seq("id") && v2.count() == 10)
    // time travel: each snapshot presents its OWN schema
    assert(GraftTable.read(spark, root, Some(1))
      .where(col("payload") === "v3").count() == 1)
    // the resurrection trap: re-ADD the same name — pre-drop files
    // physically still hold the bytes, and parquet reads by name
    GraftTable.alterAddColumn(root, "payload", StringType) // v3
    assert(GraftTable.read(spark, root)
      .where(col("payload").isNotNull).count() == 0,
      "a re-added namesake must NOT resurrect dropped data")
    GraftTable.append(spark, root,
      Seq((100L, "fresh")).toDF("id", "payload"), Seq("id"), Seq("id"))
    val latest = GraftTable.read(spark, root)
    assert(latest.count() == 11)
    assert(latest.where(col("payload").isNotNull).as[(Long, String)]
      .collect().toSeq == Seq((100L, "fresh")))
    // restore to v1 resurrects the column WHOLESALE (snapshot
    // semantics: the target's entries carry no deadness)
    GraftTable.restore(root, 1)
    assert(GraftTable.read(spark, root)
      .where(col("payload").isNotNull).count() == 10)
    // guards: unknown name loud, IF EXISTS quiet, dropping every
    // column loud
    intercept[NoSuchElementException] {
      GraftTable.alterDropColumns(root, Seq("ghost"))
    }
    assert(GraftTable.alterDropColumns(root, Seq("ghost"),
      ifExists = true) == GraftTable.latestSnapshot(root))
    intercept[IllegalArgumentException] {
      GraftTable.alterDropColumns(root, Seq("id", "payload"))
    }
  }

  test("rename then re-add of the old name: the namesake reads NULL in " +
      "pre-rename files, the renamed column keeps its data") {
    import spark.implicits._
    import org.apache.spark.sql.types.StringType
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(5), Seq("id"), Seq("id"),
      numFiles = 1) // v1: (id, payload)
    GraftTable.alterRenameColumn(root, "payload", "note") // v2
    // pre-fix, this sequence broke reads outright: the physical schema
    // carried TWO fields named 'payload' (note→payload plus the new
    // identity payload)
    GraftTable.alterAddColumn(root, "payload", StringType) // v3
    val df = GraftTable.read(spark, root)
    assert(df.where(col("note").isNull).count() == 0,
      "the renamed column must keep reading its write-time data")
    assert(df.where(col("payload").isNotNull).count() == 0,
      "the re-added namesake must not read the renamed column's bytes")
    GraftTable.append(spark, root,
      Seq((9L, "n9", "p9")).toDF("id", "note", "payload"),
      Seq("id"), Seq("id"))
    val both = GraftTable.read(spark, root)
      .where(col("id") === 9L).head()
    assert(both.getString(1) == "n9" && both.getString(2) == "p9")
  }

  test("drop column vs CDC: the alter commit emits zero change rows and " +
      "a drop-then-add history never mislabels columns") {
    import spark.implicits._
    import org.apache.spark.sql.types.StringType
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(5), Seq("id"), Seq("id"),
      numFiles = 1) // v1: (id, payload)
    GraftTable.alterDropColumns(root, Seq("payload")) // v2
    GraftTable.alterAddColumn(root, "note", StringType) // v3
    GraftTable.append(spark, root,
      Seq((9L, "n9")).toDF("id", "note"), Seq("id"), Seq("id")) // v4
    val cdc = GraftTable.changesBetweenRows(spark, root, 0, 4, "id")
    assert(cdc.columns.toSeq ==
      Seq("id", "note", "_change_type", "_commit_snapshot"))
    assert(cdc.where(col("_commit_snapshot").isin(2, 3)).count() == 0,
      "metadata-only drop/add commits must emit zero change rows")
    // the old positional-prefix relabel would have presented the v1
    // rows' PAYLOAD data under 'note' — column i of an old step is not
    // column i of the target once a middle column vanished
    assert(cdc.where(col("_commit_snapshot") === 1 &&
      col("note").isNotNull).count() == 0,
      "dropped-column data must not reappear under a later column name")
    assert(cdc.where(col("_commit_snapshot") === 4 &&
      col("note") === "n9").count() == 1)
    assert(cdc.count() == 6)
    // RESTORE back across the drop-then-add: same WIDTH at both ends,
    // but 'note' and 'payload' are unrelated columns — the old
    // positional relabel silently presented note data as payload
    // (r13 review finding); the op-derived map resurfaces payload as
    // itself and drops note
    GraftTable.restore(root, 1) // v5: back to (id, payload)
    val r = GraftTable.changesBetweenRows(spark, root, 4, 5, "id")
    assert(r.columns.toSeq ==
      Seq("id", "payload", "_change_type", "_commit_snapshot"))
    // the appended (9, n9) row is deleted by the restore; the original
    // 5 rows' payload values resurface as updates from NULL-projected
    // pre-images — crucially NOTHING presents note data under payload
    assert(r.where(col("_change_type") === "delete" &&
      col("id") === 9L).count() == 1)
    assert(r.where(col("_change_type") === "update_postimage" &&
      col("payload").startsWith("v")).count() == 5,
      "the restored payload values must resurface under their own name")
    assert(r.where(col("payload") === "n9").count() == 0,
      "note data must never appear under the payload column")
  }

  test("partitioned tables: k=v layout under data/, every verb carries " +
      "the declaration, PartitionFilters prune, guards loud, clone and " +
      "CDC read through") {
    import spark.implicits._
    val root = freshRoot()
    val df = (1 to 40).map(i => (i.toLong, (i % 4).toLong, s"v$i"))
      .toDF("id", "p", "payload")
    GraftTable.create(spark, root, df, Seq("id"), Seq("id"),
      numFiles = 2, partitionCols = Seq("p")) // v1
    val m1 = GraftTable.manifest(root, 1)
    assert(m1.partitionCols.contains(List("p")))
    assert(m1.files.nonEmpty && m1.files.forall(f =>
      f.path.matches("data/p=\\d+/c-[-a-f0-9]+\\.parquet")), m1.files)
    assert(m1.files.forall(f => f.parts.exists(pp =>
      pp.keySet == Set("p") &&
        f.path.contains(s"p=${pp("p")}"))),
      "every file must record its own partition tuple")
    val r = GraftTable.read(spark, root)
    assert(r.columns.toSeq == Seq("id", "p", "payload"),
      "partition columns must present in DECLARED schema position")
    assert(r.count() == 40)
    // real FileScan PartitionFilters + partition-wise row pruning
    val q = r.where(col("p") === 1L)
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty && scan.head.partitionFilters.nonEmpty,
      s"expected PartitionFilters in\n${q.queryExecution.executedPlan}")
    assert(q.count() == 10)
    assert(q.select("payload").distinct().count() == 10)
    // the full verb story keeps the declaration and the layout
    GraftTable.append(spark, root,
      Seq((100L, 9L, "x100")).toDF("id", "p", "payload"),
      Seq("id"), Seq("id")) // v2
    GraftTable.merge(spark, root,
      Seq((5L, 1L, "u5")).toDF("id", "p", "payload"),
      "id", Seq("id"), Seq("id")) // v3
    GraftTable.deleteMor(spark, root, Seq(6L).toDF("id"), "id") // v4
    GraftTable.compact(spark, root, Long.MaxValue, Seq("id"), Seq("id"),
      numFiles = 1, materializeDvs = true) // v5
    GraftTable.restore(root, GraftTable.latestSnapshot(root) - 1) // v6
    (1 to GraftTable.latestSnapshot(root)).foreach(v =>
      assert(GraftTable.manifest(root, v).partitionCols
        .contains(List("p")), s"commit $v dropped the declaration"))
    assert(GraftTable.manifest(root, GraftTable.latestSnapshot(root))
      .files.forall(f => f.path.matches("data/p=\\d+/c-.+\\.parquet")),
      "rewrites must keep the partitioned layout")
    val after = GraftTable.read(spark, root)
      .as[(Long, Long, String)].collect().map(t => t._1 -> t._3).toMap
    assert(after.size == 40 && after(5L) == "u5" &&
      !after.contains(6L) && after(100L) == "x100")
    // time travel presents v1 (pre-merge, pre-delete)
    assert(GraftTable.read(spark, root, Some(1)).count() == 40)
    // row-level CDC across the merge commit reads partitioned files
    val cdc = GraftTable.changesBetweenRows(spark, root, 2, 3, "id")
    assert(cdc.where(col("_change_type") === "update_postimage" &&
      col("payload") === "u5").count() == 1)
    // guards: NULL partition values, rename/drop of the partition col
    val eNull = intercept[IllegalArgumentException] {
      GraftTable.append(spark, root,
        Seq((101L, None: Option[Long], "n")).toDF("id", "p", "payload"),
        Seq("id"), Seq("id"))
    }
    // since r16 the declared-schema NOT NULL check (the create frame's
    // p was non-nullable) rejects BEFORE the staged-write dir guard —
    // both are loud, both land before any commit
    assert(eNull.getMessage.contains("non-null") ||
      eNull.getMessage.contains("NOT NULL(p)"), eNull.getMessage)
    val eRen = intercept[IllegalArgumentException] {
      GraftTable.alterRenameColumn(root, "p", "q")
    }
    assert(eRen.getMessage.contains("partition column"), eRen.getMessage)
    val eDrop = intercept[IllegalArgumentException] {
      GraftTable.alterDropColumns(root, Seq("p"))
    }
    assert(eDrop.getMessage.contains("partition column"), eDrop.getMessage)
    // shallow clone: borrowed absolute paths read through the SOURCE's
    // own basePath; partition filters still prune on the clone
    val dst = freshRoot()
    GraftTable.cloneTable(root, dst)
    assert(GraftTable.read(spark, dst).count() == 40)
    assert(GraftTable.read(spark, dst).where(col("p") === 1L)
      .count() ==
      GraftTable.read(spark, root).where(col("p") === 1L).count())
    // clone-side append lands OWNED partitioned files; the mixed
    // borrowed+owned read needs per-base scans
    GraftTable.append(spark, dst,
      Seq((200L, 2L, "c200")).toDF("id", "p", "payload"),
      Seq("id"), Seq("id"))
    assert(GraftTable.read(spark, dst).count() == 41)
    assert(GraftTable.read(spark, dst).where(col("p") === 2L).count() ==
      GraftTable.read(spark, root).where(col("p") === 2L).count() + 1)
  }

  test("sql partitioned tables: CREATE ... PARTITIONED BY lands in the " +
      "manifest, CTAS + INSERT route rows to partition dirs, non-" +
      "identity transforms loud") {
    val root = freshRoot()
    GraftSql.exec(spark,
      s"""CREATE TABLE pt_spec (id BIGINT, p BIGINT, s STRING)
          USING graft PARTITIONED BY (p)
          LOCATION '$root' OPTIONS (key 'id', stats 'id')""")
    try {
      assert(GraftTable.manifest(root, 1).partitionCols
        .contains(List("p")))
      GraftSql.exec(spark,
        "INSERT INTO pt_spec SELECT id, id % 3, concat('s', id) " +
          "FROM range(30)")
      val m = GraftTable.manifest(root, GraftTable.latestSnapshot(root))
      assert(m.files.nonEmpty && m.files.forall(f =>
        f.path.matches("data/p=\\d+/c-.+\\.parquet")), m.files)
      assert(GraftSql.sql(spark,
        "SELECT count(1) AS n FROM pt_spec WHERE p = 1").head()
        .getLong(0) == 10L)
      // transforms OUTSIDE the supported set stay loud (bucket/time
      // transforms are first-class since r15 — see the hidden-
      // partitioning tests)
      val eTr = intercept[Exception] {
        GraftSql.exec(spark,
          s"""CREATE TABLE pt_bad (id BIGINT, s STRING)
              USING graft PARTITIONED BY (truncate(4, s))
              LOCATION '${root}_bad' OPTIONS (key 'id')""")
      }
      assert(eTr.getMessage.contains(
          "years / months / days / hours / bucket"),
        eTr.getMessage)
      // SQL DML against the partitioned table: the CoW rewrite must
      // keep the k=v layout and the declaration
      GraftSql.exec(spark,
        "UPDATE pt_spec SET s = 'upd' WHERE id = 7")
      GraftSql.exec(spark, "DELETE FROM pt_spec WHERE id = 8")
      assert(GraftSql.sql(spark,
        "SELECT s FROM pt_spec WHERE id = 7").head().getString(0)
        == "upd")
      assert(GraftSql.sql(spark,
        "SELECT count(1) AS n FROM pt_spec").head().getLong(0) == 29L)
      val mDml = GraftTable.manifest(root, GraftTable.latestSnapshot(root))
      assert(mDml.partitionCols.contains(List("p")) &&
        mDml.files.forall(f =>
          f.path.matches("data/p=\\d+/c-.+\\.parquet")),
        s"SQL DML must keep the partitioned layout: ${mDml.files}")
      // SHOW CREATE TABLE emits PARTITIONED BY — omitting it would
      // round-trip into an unpartitioned table (silently lost layout)
      val ddl = GraftSql.sql(spark, "SHOW CREATE TABLE pt_spec")
        .head().getString(0)
      assert(ddl.contains("PARTITIONED BY (p)"), ddl)
      // DESCRIBE DETAIL surfaces the declaration
      assert(GraftSql.sql(spark, "DESCRIBE DETAIL pt_spec")
        .head().getString(9) == "p")
      // the emitted DDL re-executes into a PARTITIONED table
      val root2 = freshRoot()
      graft.util.AppCleanup.recursiveDelete(new java.io.File(root2))
      GraftSql.exec(spark, ddl
        .replace("`pt_spec`", "pt_spec_rt")
        .replace(s"LOCATION '$root'", s"LOCATION '$root2'"))
      try assert(GraftTable.manifest(root2, 1).partitionCols
        .contains(List("p")), "the round-tripped table lost partitioning")
      finally GraftSqlTables.unregister("pt_spec_rt")
    } finally GraftSqlTables.unregister("pt_spec")
  }

  test("partitioned tables x rename/drop epochs: pre-rename files read " +
      "by the new name per epoch, dropped namesakes stay dead, the " +
      "partition column rides every epoch") {
    import spark.implicits._
    import org.apache.spark.sql.types.StringType
    val root = freshRoot()
    GraftTable.create(spark, root,
      (1 to 10).map(i => (i.toLong, (i % 2).toLong, s"v$i"))
        .toDF("id", "p", "payload"),
      Seq("id"), Seq("id"), numFiles = 1, partitionCols = Seq("p")) // v1
    GraftTable.alterRenameColumn(root, "payload", "note") // v2
    GraftTable.append(spark, root,
      Seq((11L, 1L, "n11")).toDF("id", "p", "note"),
      Seq("id"), Seq("id")) // v3: post-rename epoch
    // both epochs read by the NEW name, partition values intact
    val r = GraftTable.read(spark, root)
    assert(r.columns.toSeq == Seq("id", "p", "note"))
    val got = r.as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(got.size == 11 && got.head == ((1L, 1L, "v1")) &&
      got.last == ((11L, 1L, "n11")),
      s"rename-epoch read over partitions broke: $got")
    // partition filter still prunes across MIXED epochs
    assert(r.where(col("p") === 1L).count() == 6)
    // drop + re-add of a DATA column: pre-drop bytes stay dead while
    // the partition dirs keep resolving
    GraftTable.alterDropColumns(root, Seq("note")) // v4
    GraftTable.alterAddColumn(root, "note", StringType) // v5
    val dead = GraftTable.read(spark, root)
    assert(dead.where(col("note").isNotNull).count() == 0,
      "dropped bytes must not resurrect under the partitioned layout")
    assert(dead.where(col("p") === 0L).count() == 5)
    // time travel presents v1's own names + values
    val tt = GraftTable.read(spark, root, Some(1))
    assert(tt.columns.toSeq == Seq("id", "p", "payload"))
    assert(tt.where(col("payload") === "v3").count() == 1)
  }

  test("OPTIMIZE ZORDER within partitions: recluster keeps the k=v " +
      "layout, both z-dims prune afterwards, partition columns are " +
      "not z-orderable") {
    import spark.implicits._
    val root = freshRoot()
    val rows = (0L until 1000L)
      .map(i => (i, i % 2,
        i % 1000003L * 2654435761L % 1000003L % 1000L, s"p$i"))
      .toDF("x", "p", "y", "payload")
    GraftTable.create(spark, root, rows, Seq("x", "y"), Seq("x"),
      numFiles = 16, partitionCols = Seq("p"))
    GraftSqlTables.register("maint_pzt",
      GraftSqlTables.Ref(root, "x", Seq("x", "y"), Seq("x"), 16))
    try {
      val (_, keptBefore, totalBefore) =
        GraftTable.readWhere(spark, root, "y", 0d, 99d)
      assert(keptBefore == totalBefore,
        "pre-optimize y-pruning should be blind")
      GraftSql.sql(spark, "OPTIMIZE maint_pzt ZORDER BY (x, y)").collect()
      val m = GraftTable.manifest(root, GraftTable.latestSnapshot(root))
      assert(m.op == "compact" && m.partitionCols.contains(List("p")))
      assert(m.files.forall(f =>
        f.path.matches("data/p=\\d+/c-.+\\.parquet")),
        s"ZORDER must keep the partitioned layout: ${m.files.map(_.path)}")
      for (c <- Seq("x", "y")) {
        val (_, kept, total) = GraftTable.readWhere(spark, root, c, 0d, 99d)
        assert(kept < total,
          s"post-OPTIMIZE $c-pruning kept $kept of $total")
      }
      assert(GraftTable.read(spark, root).count() == 1000)
      assert(GraftTable.read(spark, root).where(col("p") === 1L)
        .count() == 500, "partition reads must survive the recluster")
      val eP = intercept[IllegalArgumentException] {
        GraftSql.exec(spark, "OPTIMIZE maint_pzt ZORDER BY (x, p)")
      }
      assert(eP.getMessage.contains("partition column"), eP.getMessage)
    } finally GraftSqlTables.unregister("maint_pzt")
  }

  test("partitioned vacuum: expire reclaims replaced partitions' files, " +
      "orphan sweep cleans stranded stage dirs and uncommitted moves") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root,
      (1 to 20).map(i => (i.toLong, (i % 2).toLong, s"v$i"))
        .toDF("id", "p", "payload"),
      Seq("id"), Seq("id"), numFiles = 1, partitionCols = Seq("p")) // v1
    GraftTable.overwritePartitions(spark, root,
      Seq((100L, 1L, "n")).toDF("id", "p", "payload"),
      Seq("id"), Seq("id")) // v2: p=1 replaced
    val replaced = GraftTable.manifest(root, 1).files
      .filter(_.parts.exists(_("p") == "1")).map(_.path)
    assert(replaced.nonEmpty)
    // plant a crashed partitioned write: a stale stage dir + a moved
    // but never-committed file inside a partition dir
    val stage = new java.io.File(s"$root/.stage-deadbeef/p=1")
    stage.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(stage.getPath, "part-0.parquet"),
      Array[Byte](1, 2, 3))
    val orphan = java.nio.file.Paths.get(root,
      "data/p=0/c-orphan.parquet")
    java.nio.file.Files.write(orphan, Array[Byte](1))
    GraftTable.expireSnapshots(root, keepFrom = 2)
    assert(replaced.forall(p =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(root, p))),
      "expire must reclaim the replaced partition's files")
    val swept = GraftTable.removeOrphans(root, olderThanMs = 0)
    assert(swept >= 2, s"stage + orphan must both sweep, got $swept")
    assert(!new java.io.File(s"$root/.stage-deadbeef").exists)
    assert(!java.nio.file.Files.exists(orphan))
    // the table still reads exactly right after the cleanup
    assert(GraftTable.read(spark, root).count() == 11)
    assert(GraftTable.read(spark, root)
      .where(col("p") === 1L).count() == 1)
  }

  test("overwritePartitions: replaces exactly the batch's partitions, " +
      "declines empty commits, loud on flat tables, CDC diffs the " +
      "replacement, SQL guards survivors only") {
    import spark.implicits._
    val root = freshRoot()
    val df = (1 to 30).map(i => (i.toLong, (i % 3).toLong, s"v$i"))
      .toDF("id", "p", "payload")
    GraftTable.create(spark, root, df, Seq("id"), Seq("id"),
      numFiles = 1, partitionCols = Seq("p")) // v1
    // replace partition p=1 wholesale: new rows, some keys reused,
    // some keys dropped, one new key
    val repl = (Seq((1L, 1L, "r1"), (4L, 1L, "r4"), (100L, 1L, "r100")))
      .toDF("id", "p", "payload")
    val v2 = GraftTable.overwritePartitions(spark, root, repl,
      Seq("id"), Seq("id"))
    assert(v2 == 2)
    val after = GraftTable.read(spark, root)
      .as[(Long, Long, String)].collect()
    assert(after.count(_._2 == 1L) == 3, "p=1 must hold exactly the batch")
    assert(after.count(_._2 != 1L) == 20,
      "untouched partitions must carry over")
    assert(after.exists(t => t._1 == 1L && t._3 == "r1"))
    assert(!after.exists(t => t._1 == 7L), "old p=1 rows must be gone")
    // untouched partitions carried over BY REFERENCE (no rewrite)
    val f1 = GraftTable.manifest(root, 1).files.map(_.path).toSet
    val f2 = GraftTable.manifest(root, 2).files
    assert(f2.filter(f => f.parts.exists(_("p") != "1"))
      .forall(f => f1(f.path)), "untouched partitions must not rewrite")
    // row-level CDC across the overwrite: reused-key new values are
    // update pairs, dropped keys deletes, the new key an insert
    val cdc = GraftTable.changesBetweenRows(spark, root, 1, 2, "id")
    assert(cdc.where(col("_change_type") === "update_postimage" &&
      col("payload") === "r1").count() == 1)
    assert(cdc.where(col("_change_type") === "insert" &&
      col("id") === 100L).count() == 1)
    assert(cdc.where(col("_change_type") === "delete" &&
      col("id") === 7L).count() == 1)
    // empty batch: no commit
    assert(GraftTable.overwritePartitions(spark, root,
      repl.limit(0), Seq("id"), Seq("id")) == 2)
    // flat table: loud
    val flat = freshRoot()
    GraftTable.create(spark, flat, idTable(5), Seq("id"), Seq("id"),
      numFiles = 1)
    val eFlat = intercept[IllegalArgumentException] {
      GraftTable.overwritePartitions(spark, flat,
        idTable(3), Seq("id"), Seq("id"))
    }
    assert(eFlat.getMessage.contains("UNPARTITIONED"), eFlat.getMessage)
    // SQL: INSERT OVERWRITE re-using a SURVIVOR partition's key is
    // loud; re-using the replaced partition's own keys is fine (above)
    GraftSqlTables.register("ow_spec_t",
      GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id")))
    try {
      val eClash = intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          "INSERT OVERWRITE ow_spec_t SELECT 2, 1, 'steal'")
      }
      assert(eClash.getMessage.contains("partitions the batch does not"),
        eClash.getMessage)
      GraftSql.exec(spark,
        "INSERT OVERWRITE ow_spec_t SELECT 200, 2, 'sql200'")
      assert(GraftSql.sql(spark,
        "SELECT count(1) AS n FROM ow_spec_t WHERE p = 2").head()
        .getLong(0) == 1L, "SQL overwrite must replace p=2 wholesale")
      // flat table through SQL: loud
      GraftSqlTables.register("ow_flat_t",
        GraftSqlTables.Ref(flat, "id", Seq("id"), Seq("id")))
      val eSqlFlat = intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          "INSERT OVERWRITE ow_flat_t SELECT 9, 'x'")
      }
      assert(eSqlFlat.getMessage.contains("PARTITIONED"),
        eSqlFlat.getMessage)
    } finally {
      GraftSqlTables.unregister("ow_spec_t")
      GraftSqlTables.unregister("ow_flat_t")
    }
  }

  test("sql time travel on registered names: VERSION AS OF and " +
      "TIMESTAMP AS OF resolve snapshots, literals only, unregistered " +
      "names pass through, vacuumed gaps stay loud") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(5), Seq("id"), Seq("id"),
      numFiles = 1) // v1
    GraftTable.append(spark, root,
      Seq((10L, "x10")).toDF("id", "payload"), Seq("id"), Seq("id")) // v2
    GraftTable.append(spark, root,
      Seq((11L, "x11")).toDF("id", "payload"), Seq("id"), Seq("id")) // v3
    GraftSqlTables.register("tt_name_t",
      GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id")))
    try {
      def n(sql: String): Long =
        GraftSql.sql(spark, sql).head().getLong(0)
      assert(n("SELECT count(1) AS n FROM tt_name_t VERSION AS OF 1") == 5L)
      assert(n("SELECT count(1) AS n FROM tt_name_t VERSION AS OF 2") == 6L)
      assert(n("SELECT count(1) AS n FROM tt_name_t") == 7L)
      // TIMESTAMP AS OF: epoch-millis integer literal (the TVF
      // convention) and a session-tz string literal both resolve
      val v2ms = GraftTable.manifest(root, 2).committedAtMs.get
      assert(n(s"SELECT count(1) AS n FROM tt_name_t " +
        s"TIMESTAMP AS OF $v2ms") == 6L)
      val tz = java.time.ZoneId.of(
        spark.sessionState.conf.sessionLocalTimeZone)
      val v2str = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(v2ms), tz).format(
        java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      assert(n("SELECT count(1) AS n FROM tt_name_t " +
        s"TIMESTAMP AS OF '$v2str'") == 6L)
      // VERSION AS OF a NAMED REF (Iceberg semantics): tag pins its
      // snapshot, branch reads its head, unknown refs loud with both
      // namespaces listed
      GraftTable.tag(root, "v1tag", 1)
      GraftTable.createBranch(root, "wip", at = Some(2))
      assert(n("SELECT count(1) AS n FROM tt_name_t " +
        "VERSION AS OF 'v1tag'") == 5L)
      assert(n("SELECT count(1) AS n FROM tt_name_t " +
        "VERSION AS OF 'wip'") == 6L)
      val eRef = intercept[NoSuchElementException] {
        GraftSql.sql(spark, "SELECT count(1) AS n FROM tt_name_t " +
          "VERSION AS OF 'ghost'").collect()
      }
      assert(eRef.getMessage.contains("v1tag") &&
        eRef.getMessage.contains("wip"), eRef.getMessage)
      // release the refs: both are RETENTION ROOTS, and the vacuumed-
      // gap scenario below needs v2 genuinely expired
      assert(GraftTable.removeTag(root, "v1tag"))
      assert(GraftTable.dropBranch(root, "wip"))
      // non-literal timestamps rejected loudly (no silent clock phase)
      val e1 = intercept[IllegalArgumentException] {
        GraftSql.sql(spark, "SELECT count(1) AS n FROM tt_name_t " +
          "TIMESTAMP AS OF current_timestamp()").collect()
      }
      assert(e1.getMessage.contains("literal"), e1.getMessage)
      // unregistered names fall through to Spark's own resolution —
      // the rule must not claim them
      val e2 = intercept[Exception] {
        GraftSql.sql(spark,
          "SELECT * FROM no_such_graft_t VERSION AS OF 1").collect()
      }
      assert(!e2.getMessage.contains("graft table"),
        s"unregistered time travel must stay Spark's: ${e2.getMessage}")
      // a probe inside a vacuumed gap fails loudly through this path:
      // tag v1 (retention root), expire v2, probe strictly inside
      // (stamp(v1), stamp(v3)) — the historically-live state is
      // unknowable, never silently a neighbor
      GraftTable.tag(root, "keep1", 1)
      GraftTable.expireSnapshots(root, keepFrom = 3)
      val gapMs = GraftTable.manifest(root, 3).committedAtMs.get - 1
      assert(gapMs > GraftTable.manifest(root, 1).committedAtMs.get,
        "fixture: the gap probe must land strictly after v1")
      val e3 = intercept[IllegalStateException] {
        GraftSql.sql(spark, s"SELECT count(1) AS n FROM tt_name_t " +
          s"TIMESTAMP AS OF $gapMs").collect()
      }
      assert(e3.getMessage.contains("expired"), e3.getMessage)
    } finally GraftSqlTables.unregister("tt_name_t")
  }

  test("restore across drop + re-add of the SAME name: the resurrected " +
      "values emit change rows and replay stays complete") {
    import spark.implicits._
    import org.apache.spark.sql.types.StringType
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(5), Seq("id"), Seq("id"),
      numFiles = 1) // v1: (id, payload)
    GraftTable.alterDropColumns(root, Seq("payload")) // v2
    GraftTable.alterAddColumn(root, "payload", StringType) // v3: same name!
    GraftTable.restore(root, 1) // v4: pre-drop values resurrect
    // the name SEQUENCE is identical at v3 and v4 and the restore moves
    // no files — only the carried-over entries' deadPhys flips, so the
    // resurrected payload (NULL -> original bytes) is invisible to a
    // (path, dv) file identity (r14 ADVICE): the diff must treat the
    // deadness flip as removed + re-added and emit update pairs
    val step = GraftTable.changesBetweenRows(spark, root, 3, 4, "id")
    assert(step.where(col("_change_type") === "update_postimage" &&
      col("payload").startsWith("v")).count() == 5,
      "the resurrected payload values must surface as update postimages")
    assert(step.where(col("_change_type") === "update_preimage" &&
      col("payload").isNull).count() == 5)
    // completeness contract: replaying the FULL feed reproduces the
    // direct read, payload values included
    val replayed = ops.Table.replayOf(
      GraftTable.changesBetweenRows(spark, root, 0, 4, "id"), "id")
      .as[(Long, String)].collect().toMap
    val direct = GraftTable.read(spark, root)
      .as[(Long, String)].collect().toMap
    assert(replayed == direct,
      s"CDC replay diverged from the direct read: " +
        s"${replayed.toSeq.sorted} vs ${direct.toSeq.sorted}")
    assert(direct(3L) == "v3", "the restore must resurrect real values")
  }

  test("check constraint guards: subqueries rejected at definition " +
      "time; create rejects names differing only in case") {
    import spark.implicits._
    val root = freshRoot()
    // a subquery's inner column refs are invisible to checkRefs, so the
    // rename/drop guards could be silently bypassed — reject up front
    val e1 = intercept[IllegalArgumentException] {
      GraftTable.create(spark, root, idTable(3), Seq("id"), Seq("id"),
        numFiles = 1,
        checks = Map("sub" -> "id IN (SELECT id FROM somewhere)"))
    }
    assert(e1.getMessage.contains("subquery"), e1.getMessage)
    assert(GraftTable.latestSnapshot(root) == 0)
    val e2 = intercept[IllegalArgumentException] {
      GraftTable.create(spark, root, idTable(3), Seq("id"), Seq("id"),
        numFiles = 1,
        checks = Map("A" -> "id > 0", "a" -> "id < 100"))
    }
    assert(e2.getMessage.contains("case-insensitively"), e2.getMessage)
    GraftTable.create(spark, root, idTable(3), Seq("id"), Seq("id"),
      numFiles = 1) // guards reject before any table lands
    val e3 = intercept[IllegalArgumentException] {
      GraftTable.addCheck(spark, root, "sub",
        "EXISTS (SELECT 1 WHERE id > 0)")
    }
    assert(e3.getMessage.contains("subquery"), e3.getMessage)
  }

  test("sql drop column: one commit, Ref sheds stats/bloom names, " +
      "IF EXISTS quiet, writes keep working") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(6), Seq("id"), Seq("id"),
      numFiles = 2, bloomCols = Seq("payload"))
    GraftSqlTables.register("dropcol_t",
      GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id"), 2,
        bloomCols = Seq("payload")))
    try {
      GraftSql.exec(spark, "ALTER TABLE dropcol_t DROP COLUMN payload")
      val ref = GraftSqlTables.lookup(Seq("dropcol_t")).get
      assert(ref.statsCols == Seq("id") && ref.bloomCols.isEmpty,
        "the Ref must shed dropped names or later writes compute " +
          "stats on a ghost")
      // later DML works against the narrowed schema
      GraftSql.exec(spark, "INSERT INTO dropcol_t SELECT 100")
      assert(GraftSql.sql(spark,
        "SELECT count(1) AS n FROM dropcol_t").head().getLong(0) == 7L)
      intercept[NoSuchElementException] {
        GraftSql.exec(spark, "ALTER TABLE dropcol_t DROP COLUMN ghost")
      }
      GraftSql.exec(spark,
        "ALTER TABLE dropcol_t DROP COLUMN IF EXISTS ghost")
    } finally GraftSqlTables.unregister("dropcol_t")
  }

  test("sql describe detail: DV and clone counters live, views loud, " +
      "unregistered names fall through") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 2)
    GraftTable.deleteMor(spark, root, Seq(3L, 7L).toDF("id"), "id")
    GraftSqlTables.register("detail_t",
      GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id"), 2))
    try {
      val r = GraftSql.sql(spark, "DESCRIBE DETAIL detail_t").head()
      assert(r.getInt(0) == 2 && r.getString(1) == "delete_mor")
      assert(r.getLong(2) == 2 && r.getLong(3) == 8 && r.getLong(4) == 2,
        s"2 files, 8 live rows, 2 DV'd rows: $r")
      assert(!r.getBoolean(8))
      assert(r.getString(9) == "", "flat table: empty partition_cols")
      // a clone reports its borrow until materialized
      val dst = freshRoot() + "/c"
      GraftTable.cloneTable(root, dst)
      GraftSqlTables.register("detail_c",
        GraftSqlTables.Ref(dst, "id", Seq("id"), Seq("id"), 2))
      try {
        val c = GraftSql.sql(spark, "DESCRIBE DETAIL detail_c").head()
        assert(c.getBoolean(8), "borrowed files must flag is_clone")
        assert(c.getLong(3) == 8, "clone detail must be DV-aware")
        GraftTable.compact(spark, dst, Long.MaxValue, Seq("id"),
          Seq("id"), numFiles = 1)
        assert(!GraftSql.sql(spark, "DESCRIBE DETAIL detail_c")
          .head().getBoolean(8),
          "OPTIMIZE materialization must clear is_clone")
      } finally GraftSqlTables.unregister("detail_c")
      GraftSql.exec(spark,
        "CREATE VIEW detail_v AS SELECT id FROM detail_t")
      try intercept[IllegalArgumentException] {
        GraftSql.sql(spark, "DESCRIBE DETAIL detail_v").collect()
      } finally graft.sql.GraftSqlViews.unregister(Seq("detail_v"))
      intercept[Exception] {
        GraftSql.sql(spark, "DESCRIBE DETAIL no_such_name").collect()
      }
    } finally GraftSqlTables.unregister("detail_t")
  }

  test("cdc replay: folding the change feed reproduces the table " +
      "exactly, including delete-then-reinsert") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1) // v1
    GraftTable.merge(spark, root,
      Seq((3L, "u3"), (11L, "n11")).toDF("id", "payload"),
      "id", Seq("id"), Seq("id")) // v2: update + insert
    GraftTable.delete(spark, root, Seq(5L, 11L).toDF("id"), "id",
      Seq("id"), Seq("id")) // v3
    GraftTable.merge(spark, root, Seq((5L, "back")).toDF("id", "payload"),
      "id", Seq("id"), Seq("id")) // v4: reinsert a deleted key
    val cdc = GraftTable.changesBetweenRows(spark, root, 0, 4, "id")
    val replayed = ops.Table.replayOf(cdc, "id")
      .as[(Long, String)].collect().toMap
    val direct = GraftTable.read(spark, root)
      .as[(Long, String)].collect().toMap
    assert(replayed == direct,
      s"CDC replay must reproduce the table: ${replayed.toSeq.sorted} " +
        s"vs ${direct.toSeq.sorted}")
    assert(replayed(5L) == "back" && !replayed.contains(11L))
  }

  test("shallow clone: zero-copy borrow, independent divergence, DV " +
      "isolation, vacuum safety, OPTIMIZE materializes, checks travel") {
    import spark.implicits._
    val src = freshRoot()
    GraftTable.create(spark, src, idTable(20), Seq("id"), Seq("id"),
      numFiles = 2, checks = Map("id_pos" -> "id > 0"))
    GraftTable.deleteMor(spark, src, Seq(3L).toDF("id"), "id") // src v2: DV
    val dst = freshRoot()
    GraftTable.cloneTable(src, dst)
    // zero copy: the clone owns NO data yet; every entry is absolute
    val m1 = GraftTable.manifest(dst, 1)
    assert(m1.files.forall(_.path.startsWith("/")),
      "borrowed entries must store absolute paths")
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(dst, "data")),
      "a shallow clone must move zero bytes")
    // reads agree, including the borrowed DV
    assert(GraftTable.read(spark, dst).count() == 19)
    assert(GraftTable.read(spark, dst).where(col("id") === 3L).count() == 0,
      "the borrowed deletion vector must keep applying")
    // constraints travel
    intercept[IllegalArgumentException] {
      GraftTable.append(spark, dst, Seq((-5L, "bad")).toDF("id", "payload"),
        Seq("id"), Seq("id"))
    }
    // divergence: writes and MoR deletes on the clone leave src intact
    GraftTable.append(spark, dst, Seq((100L, "c")).toDF("id", "payload"),
      Seq("id"), Seq("id"))
    GraftTable.deleteMor(spark, dst, Seq(5L).toDF("id"), "id")
    assert(GraftTable.read(spark, dst).count() == 19)
    assert(GraftTable.read(spark, src).count() == 19,
      "clone writes/deletes must not touch the source")
    assert(GraftTable.read(spark, src).where(col("id") === 5L).count() == 1,
      "a clone-side MoR delete must not mask source rows")
    // vacuum on the clone never deletes borrowed files
    GraftTable.expireSnapshots(dst, GraftTable.latestSnapshot(dst))
    GraftTable.removeOrphans(dst, olderThanMs = 0)
    assert(GraftTable.read(spark, src).count() == 19,
      "clone-side vacuum must never reach the source's storage")
    assert(GraftTable.read(spark, dst).count() == 19)
    // OPTIMIZE materializes: a full compact rewrites borrowed files
    // into owned, root-relative entries
    GraftTable.compact(spark, dst, Long.MaxValue, Seq("id"), Seq("id"),
      numFiles = 1)
    val mAfter = GraftTable.manifest(dst, GraftTable.latestSnapshot(dst))
    assert(mAfter.files.forall(f => !f.path.startsWith("/")),
      "compact must materialize borrowed files into owned ones")
    assert(GraftTable.read(spark, dst).count() == 19)
    // clone-of-clone re-borrows; AS OF clones a pinned snapshot
    val dst2 = freshRoot()
    GraftTable.cloneTable(src, dst2, snapshot = Some(1))
    assert(GraftTable.read(spark, dst2).count() == 20,
      "AS OF SNAPSHOT 1 predates the MoR delete")
    intercept[IllegalArgumentException] {
      GraftTable.cloneTable(src, dst2)
    }
  }

  test("check constraints: enforced on every row-adding verb, carried " +
      "by every commit, SQL NULL semantics, add validates existing, " +
      "rename/drop guards loud") {
    import spark.implicits._
    val root = freshRoot()
    // create-time enforcement: a violating initial frame strands nothing
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, root,
        Seq((1L, -5L)).toDF("id", "qty"), Seq("id"), Seq("id"),
        numFiles = 1, checks = Map("qty_pos" -> "qty >= 0"))
    }
    assert(GraftTable.latestSnapshot(root) == 0,
      "a rejected CREATE must not land a table")
    // qty is declared NULLABLE (Option-typed frame) — the SQL-NULL-
    // semantics walk below needs a column where NULL is legal; a
    // non-nullable declaration would (correctly, since r16) reject the
    // NULL before the CHECK ever evaluated
    GraftTable.create(spark, root,
      Seq((1L, Some(5L)), (2L, Some(0L))).toDF("id", "qty"),
      Seq("id"), Seq("id"),
      numFiles = 1, checks = Map("qty_pos" -> "qty >= 0")) // v1
    // append: violation loud and nothing stranded
    intercept[IllegalArgumentException] {
      GraftTable.append(spark, root, Seq((3L, -1L)).toDF("id", "qty"),
        Seq("id"), Seq("id"))
    }
    assert(GraftTable.latestSnapshot(root) == 1)
    // SQL standard NULL semantics: CHECK (qty >= 0) ADMITS a NULL qty
    GraftTable.append(spark, root,
      Seq((3L, Some(7L)), (4L, None))
        .toDF("id", "qty"), Seq("id"), Seq("id")) // v2
    assert(GraftTable.read(spark, root).count() == 4)
    // ...while an IS NOT NULL constraint is how you exclude it: the
    // planted NULL row makes this add fail its existing-data validation
    intercept[IllegalArgumentException] {
      GraftTable.addCheck(spark, root, "qty_req", "qty IS NOT NULL")
    }
    // merge post-image enforcement (CoW and MoR)
    intercept[IllegalArgumentException] {
      GraftTable.merge(spark, root, Seq((1L, -9L)).toDF("id", "qty"),
        "id", Seq("id"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.mergeMor(spark, root, Seq((1L, -9L)).toDF("id", "qty"),
        "id", Seq("id"), Seq("id"))
    }
    // every verb carries the constraint set forward
    GraftTable.merge(spark, root, Seq((1L, 6L)).toDF("id", "qty"),
      "id", Seq("id"), Seq("id")) // v3
    GraftTable.delete(spark, root, Seq(4L).toDF("id"), "id",
      Seq("id"), Seq("id")) // v4
    GraftTable.compact(spark, root, Long.MaxValue, Seq("id"), Seq("id"),
      numFiles = 1) // v5
    val v5 = GraftTable.manifest(root, GraftTable.latestSnapshot(root))
    assert(v5.checks.contains(Map("qty_pos" -> "qty >= 0")),
      s"constraints must survive merge/delete/compact, got ${v5.checks}")
    intercept[IllegalArgumentException] {
      GraftTable.append(spark, root, Seq((9L, -2L)).toDF("id", "qty"),
        Seq("id"), Seq("id"))
    }
    // ADD CONSTRAINT validates EXISTING rows (qty 0 violates > 0)
    intercept[IllegalArgumentException] {
      GraftTable.addCheck(spark, root, "qty_strict", "qty > 0")
    }
    GraftTable.addCheck(spark, root, "qty_cap", "qty <= 100") // v6
    intercept[IllegalArgumentException] {
      GraftTable.append(spark, root, Seq((9L, 200L)).toDF("id", "qty"),
        Seq("id"), Seq("id"))
    }
    GraftTable.dropCheck(root, "qty_cap")
    GraftTable.append(spark, root, Seq((9L, Some(200L))).toDF("id", "qty"),
      Seq("id"), Seq("id"))
    // rename/drop of a referenced column stays loud
    intercept[IllegalArgumentException] {
      GraftTable.alterRenameColumn(root, "qty", "quantity")
    }
    intercept[IllegalArgumentException] {
      GraftTable.alterDropColumns(root, Seq("qty"))
    }
    GraftTable.dropCheck(root, "qty_pos")
    intercept[NoSuchElementException] {
      GraftTable.dropCheck(root, "qty_pos")
    }
    assert(GraftTable.dropCheck(root, "qty_pos", ifExists = true) ==
      GraftTable.latestSnapshot(root))
    GraftTable.alterRenameColumn(root, "qty", "quantity")
    // restore re-pins the TARGET's constraint set (snapshot semantics)
    GraftTable.restore(root, 1)
    val rm = GraftTable.manifest(root, GraftTable.latestSnapshot(root))
    assert(rm.checks.contains(Map("qty_pos" -> "qty >= 0")),
      "restore must resurrect the target snapshot's constraints")
  }

  test("check constraints on branches: a branch write is audited " +
      "against the branch head's constraint set") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root,
      Seq((1L, 5L)).toDF("id", "qty"), Seq("id"), Seq("id"),
      numFiles = 1, checks = Map("qty_pos" -> "qty >= 0"))
    GraftTable.createBranch(root, "audit")
    intercept[IllegalArgumentException] {
      GraftTable.appendToBranch(spark, root, "audit",
        Seq((2L, -1L)).toDF("id", "qty"), Seq("id"), Seq("id"))
    }
    GraftTable.appendToBranch(spark, root, "audit",
      Seq((2L, 9L)).toDF("id", "qty"), Seq("id"), Seq("id"))
    assert(GraftTable.publishBranch(root, "audit") == 2)
    assert(GraftTable.read(spark, root).count() == 2)
    // the published commit still carries the constraint set
    intercept[IllegalArgumentException] {
      GraftTable.append(spark, root, Seq((3L, -1L)).toDF("id", "qty"),
        Seq("id"), Seq("id"))
    }
  }

  test("sql check constraints: CREATE with CONSTRAINT, violating " +
      "INSERT/UPDATE loud, DROP CONSTRAINT, SHOW CREATE round-trip, " +
      "unnamed/unenforced/non-check loud") {
    val root = freshRoot()
    try {
      GraftSql.exec(spark,
        s"""CREATE TABLE con_t (id BIGINT, qty BIGINT,
              CONSTRAINT qty_pos CHECK (qty >= 0))
            USING graft OPTIONS (key 'id', num_files '1')
            LOCATION '$root'""")
      GraftSql.exec(spark, "INSERT INTO con_t SELECT 1, 5")
      val e1 = intercept[IllegalArgumentException] {
        GraftSql.exec(spark, "INSERT INTO con_t SELECT 2, -3")
      }
      assert(e1.getMessage.contains("qty_pos"))
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark, "UPDATE con_t SET qty = -1 WHERE id = 1")
      }
      GraftSql.exec(spark,
        "ALTER TABLE con_t ADD CONSTRAINT qty_cap CHECK (qty <= 100)")
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark, "INSERT INTO con_t SELECT 3, 200")
      }
      // the emitted DDL carries both constraints and round-trips
      val stmt = GraftSql.sql(spark, "SHOW CREATE TABLE con_t")
        .head().getString(0)
      assert(stmt.contains("CONSTRAINT qty_pos CHECK (qty >= 0)") &&
        stmt.contains("CONSTRAINT qty_cap CHECK (qty <= 100)"), stmt)
      val root2 = freshRoot()
      GraftSql.exec(spark, stmt
        .replace("`con_t`", "con_t2").replace(s"'$root'", s"'$root2'"))
      try intercept[IllegalArgumentException] {
        GraftSql.exec(spark, "INSERT INTO con_t2 SELECT 1, -1")
      } finally GraftSqlTables.unregister("con_t2")
      GraftSql.exec(spark, "ALTER TABLE con_t DROP CONSTRAINT qty_cap")
      GraftSql.exec(spark, "INSERT INTO con_t SELECT 3, 200")
      GraftSql.exec(spark,
        "ALTER TABLE con_t DROP CONSTRAINT IF EXISTS ghost")
      intercept[NoSuchElementException] {
        GraftSql.exec(spark, "ALTER TABLE con_t DROP CONSTRAINT ghost")
      }
      // guards: NOT ENFORCED (Spark's own grammar rejects it on CHECK
      // at parse; the toCheck guard stays as belt-and-braces) and
      // non-CHECK kinds
      intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        GraftSql.exec(spark,
          "ALTER TABLE con_t ADD CONSTRAINT c2 CHECK (qty > 0) " +
            "NOT ENFORCED")
      }
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          "ALTER TABLE con_t ADD CONSTRAINT pk1 PRIMARY KEY (id)")
      }
      assert(GraftSql.sql(spark,
        "SELECT count(1) AS n FROM con_t").head().getLong(0) == 2L)
    } finally GraftSqlTables.unregister("con_t")
  }

  test("branches: writes land on the branch only, publish fast-forwards " +
      "main, divergence is loud, retention roots hold") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1)
    GraftTable.createBranch(root, "audit")
    intercept[IllegalStateException] {
      GraftTable.createBranch(root, "audit")
    }
    // two branch commits; main must not move
    GraftTable.appendToBranch(spark, root, "audit",
      Seq((100L, "b100")).toDF("id", "payload"), Seq("id"), Seq("id"))
    GraftTable.appendToBranch(spark, root, "audit",
      Seq((101L, "b101")).toDF("id", "payload"), Seq("id"), Seq("id"))
    assert(GraftTable.latestSnapshot(root) == 1,
      "branch writes must not advance main")
    assert(GraftTable.read(spark, root).count() == 10)
    assert(GraftTable.readBranch(spark, root, "audit").count() == 12)
    assert(GraftTable.branchHead(root, "audit") == 3)
    // the branch's unpublished files survive an aggressive orphan sweep
    GraftTable.removeOrphans(root, olderThanMs = 0)
    assert(GraftTable.readBranch(spark, root, "audit").count() == 12,
      "orphan sweep must treat unpublished branch files as live")
    // publish: main fast-forwards onto the branch chain
    assert(GraftTable.publishBranch(root, "audit") == 3)
    assert(GraftTable.latestSnapshot(root) == 3)
    assert(GraftTable.read(spark, root).count() == 12)
    // published history is a plain linear chain
    val hist = GraftTable.history(spark, root).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(hist == Seq((3, 2), (2, 1), (1, 0)))
    assert(GraftTable.dropBranch(root, "audit"))
    // divergence: main moves past a new branch's fork point → loud
    GraftTable.createBranch(root, "late")
    GraftTable.appendToBranch(spark, root, "late",
      Seq((200L, "x")).toDF("id", "payload"), Seq("id"), Seq("id"))
    GraftTable.append(spark, root,
      Seq((300L, "main")).toDF("id", "payload"), Seq("id"), Seq("id"))
    val e = intercept[java.util.ConcurrentModificationException] {
      GraftTable.publishBranch(root, "late")
    }
    assert(e.getMessage.contains("diverged"))
    assert(GraftTable.read(spark, root).count() == 13,
      "a failed publish must leave main exactly as the concurrent " +
        "writer left it")
  }

  test("sql branches: write-audit-publish from pure SQL — INSERT INTO " +
      "t@b, audit via graft_table_branch, PUBLISH BRANCH; guards loud") {
    val root = sqlTable("wap_t", n = 5)
    graft.functions.GraftTableFunctions.register(spark)
    try {
      GraftSql.exec(spark, "ALTER TABLE wap_t CREATE BRANCH staged")
      GraftSql.exec(spark,
        "INSERT INTO wap_t@staged SELECT id + 100, concat('s', id) " +
          "FROM range(3) ")
      // main unchanged; the audit reads the branch head through the TVF
      assert(GraftSql.sql(spark,
        "SELECT count(1) AS n FROM wap_t").head().getLong(0) == 5L)
      assert(GraftSql.sql(spark,
        s"SELECT count(1) AS n FROM graft_table_branch('$root', 'staged')")
        .head().getLong(0) == 8L)
      // branch INSERT honors the key contract vs the BRANCH head
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          "INSERT INTO wap_t@staged SELECT id + 100, 'dup' FROM range(1)")
      }
      val pub = GraftSql.sql(spark,
        "ALTER TABLE wap_t PUBLISH BRANCH staged").head().getInt(0)
      assert(pub == 2)
      assert(GraftSql.sql(spark,
        "SELECT count(1) AS n FROM wap_t").head().getLong(0) == 8L,
        "publish must make the audited batch visible to main readers")
      // ref introspection: the published-then-kept branch lists with
      // fork + head; SHOW TAGS covers the whole ref namespace
      GraftSql.exec(spark, "ALTER TABLE wap_t CREATE TAG prod")
      val refs = GraftSql.sql(spark, "SHOW TAGS wap_t").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(refs == Seq("prod" -> "tag", "staged" -> "branch"))
      val brs = GraftSql.sql(spark, "SHOW BRANCHES wap_t").collect()
        .map(r => (r.getString(0), r.getInt(2), r.getInt(3))).toSeq
      assert(brs == Seq(("staged", 1, 2)),
        s"published branch must list fork=1 head=2, got $brs")
      GraftSql.exec(spark, "ALTER TABLE wap_t DROP BRANCH staged")
      intercept[IllegalArgumentException] {
        GraftSql.exec(spark, "ALTER TABLE wap_t DROP BRANCH staged")
      }
      assert(GraftSql.sql(spark, "SHOW BRANCHES wap_t").count() == 0)
      intercept[NoSuchElementException] {
        GraftSql.exec(spark, "INSERT INTO wap_t@nope SELECT 1, 'x'")
      }
      intercept[NoSuchElementException] {
        GraftSql.sql(spark, "SHOW TAGS no_such_graft_tbl").collect()
      }
    } finally GraftSqlTables.unregister("wap_t")
  }

  // ---- r11 DDL/registry surface: latent-divergence audits (r12 #5) ----

  test("alter vs time travel: a snapshot-1 read after ALTER ADD COLUMNS " +
      "presents the OLD schema, not the widened one") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(5), Seq("id"), Seq("id"),
      numFiles = 1)
    GraftTable.alterAddColumns(root,
      Seq("score" -> org.apache.spark.sql.types.LongType))
    assert(GraftTable.read(spark, root).schema.fieldNames.toSeq ==
      Seq("id", "payload", "score"))
    assert(GraftTable.read(spark, root, Some(1)).schema.fieldNames.toSeq ==
      Seq("id", "payload"),
      "time travel must present the schema AS OF that snapshot — the " +
        "manifest pins schema per commit, never just the latest")
  }

  test("vacuum vs AS OF: a probe inside a vacuumed gap fails loudly " +
      "instead of silently resolving the surviving neighbor") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1)
    GraftTable.append(spark, root, idTable(20).where(col("id") > 10),
      Seq("id"), Seq("id"), numFiles = 1)
    GraftTable.append(spark, root, idTable(30).where(col("id") > 20),
      Seq("id"), Seq("id"), numFiles = 1)
    def stamp(v: Int): Long =
      GraftTable.manifest(root, v).committedAtMs.get
    val t1 = stamp(1); val t2 = stamp(2)
    assert(GraftTable.snapshotAsOf(root, t2) == 2)
    GraftTable.tag(root, "keep1", 1)
    assert(GraftTable.expireSnapshots(root, keepFrom = 3) >= 0)
    // retained = {1 (tag), 3}; v2's manifest AND stamp are gone
    assert(GraftTable.history(spark, root).select("snapshot").collect()
      .map(_.getInt(0)).toSet == Set(1, 3))
    // the exact surviving stamp is still provably its own snapshot ...
    assert(GraftTable.snapshotAsOf(root, t1) == 1)
    // ... but anything later inside the gap is unknowable: v2 may have
    // been live then — resolving v1 would present superseded data
    intercept[IllegalStateException] {
      GraftTable.snapshotAsOf(root, t2)
    }
    intercept[IllegalStateException] {
      GraftTable.snapshotAsOf(root, t1 + 1)
    }
    // at/after the next retained stamp the ambiguity ends
    assert(GraftTable.snapshotAsOf(root, stamp(3)) == 3)
    assert(GraftTable.snapshotAsOf(root,
      System.currentTimeMillis() + 1000) == 3)
  }

  test("rename racing in-flight DML: a statement analyzed against the " +
      "old name still commits — data is root-addressed, the name is " +
      "only the catalog's") {
    val root = sqlTable("rn_race_t", n = 3)
    try {
      val rule = graft.sql.GraftDmlRule(spark)
      val pinned = rule(spark.sessionState.analyzer.execute(
        rule(spark.sessionState.sqlParser.parsePlan(
          "UPDATE rn_race_t SET payload = 'r' WHERE id = 2"))))
      GraftSql.exec(spark, "ALTER TABLE rn_race_t RENAME TO rn_race_t2")
      org.apache.spark.sql.graft.SqlShim.ofRows(spark, pinned).collect()
      assert(state(root) == Map(1L -> "v1", 2L -> "r", 3L -> "v3"),
        "the pinned command addresses the root, not the name")
      assert(GraftSql.sql(spark,
        "SELECT payload FROM rn_race_t2 WHERE id = 2").head()
        .getString(0) == "r")
      intercept[Exception] {
        GraftSql.sql(spark, "SELECT 1 AS x FROM rn_race_t").collect()
      }
    } finally GraftSqlTables.unregister("rn_race_t2")
  }

  test("drop purge racing an in-flight reader: the pinned plan fails " +
      "loudly on the deleted files, never returns silent empties") {
    val root = sqlTable("dp_race_t", n = 8)
    val df = GraftSql.sql(spark, "SELECT id, payload FROM dp_race_t")
    GraftSql.exec(spark, "DROP TABLE dp_race_t PURGE")
    assert(!new java.io.File(root).exists())
    intercept[Exception] { df.collect() }
  }

  // ---- r10 DML surface: latent-divergence audits (r11 directive #4) ----

  test("sql dml: positional INSERT binds by POSITION — source column " +
      "names, even swapped ones, are ignored (the SQL contract)") {
    val root = sqlTable("pos_t", n = 2)
    // position 1 (named 'payload') feeds id; position 2 (named 'id')
    // feeds payload — a by-name binding would cast 'p1' to BIGINT and
    // blow up, or worse silently transpose
    GraftSql.exec(spark,
      """INSERT INTO pos_t
         SELECT 100 + id AS payload, concat('p', id) AS id
         FROM range(1, 3)""")
    assert(state(root) == Map(1L -> "v1", 2L -> "v2",
      101L -> "p1", 102L -> "p2"))
  }

  test("sql dml: MERGE source rows with NULL keys match nothing — " +
      "benign without an insert arm, loud when an insert arm would " +
      "mint a NULL key") {
    val root = sqlTable("nk_t", n = 3)
    GraftSql.exec(spark,
      """MERGE INTO nk_t t
         USING (SELECT CAST(NULL AS BIGINT) AS id, 'x' AS payload
                UNION ALL SELECT CAST(NULL AS BIGINT), 'y') s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET payload = s.payload""")
    assert(state(root) == Map(1L -> "v1", 2L -> "v2", 3L -> "v3"),
      "NULL-key source rows must be no-ops, never matched")
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        """MERGE INTO nk_t t
           USING (SELECT CAST(NULL AS BIGINT) AS id, 'x' AS payload
                  UNION ALL SELECT CAST(NULL AS BIGINT), 'y') s
           ON t.id = s.id
           WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(state(root) == Map(1L -> "v1", 2L -> "v2", 3L -> "v3"),
      "the rejected statement must commit nothing")
  }

  test("sql dml: UPDATE SET key = key is a provable no-op and passes; " +
      "any other key assignment stays loud") {
    val root = sqlTable("kid_t", n = 3)
    GraftSql.exec(spark,
      "UPDATE kid_t SET id = id, payload = 'same' WHERE id = 2")
    assert(state(root) == Map(1L -> "v1", 2L -> "same", 3L -> "v3"))
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "UPDATE kid_t SET id = id + 0 WHERE id = 2")
    }
    assert(state(root) == Map(1L -> "v1", 2L -> "same", 3L -> "v3"))
  }

  test("sql dml: a commit landing between ANALYSIS and RUN fails " +
      "UPDATE, DELETE and INSERT loudly (the MERGE pin, extended to " +
      "every verb)") {
    import spark.implicits._
    val root = sqlTable("pin_t", n = 6)
    val rule = graft.sql.GraftDmlRule(spark)
    def analyzed(sql: String) =
      rule(spark.sessionState.analyzer.execute(
        rule(spark.sessionState.sqlParser.parsePlan(sql))))
    def bump(k: Long): Unit = GraftTable.merge(spark, root,
      Seq((k, "moved")).toDF("id", "payload"), "id", Seq("id"),
      Seq("id"), 2)
    def run(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      org.apache.spark.sql.graft.SqlShim.ofRows(spark, p).collect()

    val pU = analyzed("UPDATE pin_t SET payload = 'upd' WHERE id = 3")
    bump(1L)
    intercept[java.util.ConcurrentModificationException] { run(pU) }
    val pD = analyzed("DELETE FROM pin_t WHERE id = 4")
    bump(2L)
    intercept[java.util.ConcurrentModificationException] { run(pD) }
    val pI = analyzed("INSERT INTO pin_t SELECT 100, 'new'")
    bump(5L)
    intercept[java.util.ConcurrentModificationException] { run(pI) }
    // only the three concurrent bumps landed; no half-applied statement
    assert(state(root) == Map(1L -> "moved", 2L -> "moved", 3L -> "v3",
      4L -> "v4", 5L -> "moved", 6L -> "v6"))
  }

  test("sql tables: the registry is PROCESS-GLOBAL (shared-metastore " +
      "semantics) — a rebind is visible to every session, last " +
      "register wins") {
    import spark.implicits._
    val rootA = freshRoot()
    val rootB = freshRoot()
    GraftTable.create(spark, rootA, Seq((1L, "a")).toDF("id", "payload"),
      Seq("id"), Seq("id"), numFiles = 1)
    GraftTable.create(spark, rootB, Seq((1L, "b")).toDF("id", "payload"),
      Seq("id"), Seq("id"), numFiles = 1)
    GraftSqlTables.register("shared_t",
      GraftSqlTables.Ref(rootA, "id", Seq("id"), Seq("id"), 1))
    assert(GraftSql.sql(spark, "SELECT payload FROM shared_t").head()
      .getString(0) == "a")
    // a sibling session rebinds the SAME name; both sessions now see B
    val s2 = spark.newSession()
    GraftSqlTables.register("shared_t",
      GraftSqlTables.Ref(rootB, "id", Seq("id"), Seq("id"), 1))
    assert(GraftSql.sql(s2, "SELECT payload FROM shared_t").head()
      .getString(0) == "b")
    assert(GraftSql.sql(spark, "SELECT payload FROM shared_t").head()
      .getString(0) == "b",
      "the registry is one shared catalog: last register wins everywhere")
  }

  test("registry rollback is conditional: undoing a claim never deletes " +
      "a concurrent last-wins rebind of the same name") {
    val refA = GraftSqlTables.Ref("/tmp/cond_a", "id", Seq("id"), Seq("id"))
    val refB = GraftSqlTables.Ref("/tmp/cond_b", "id", Seq("id"), Seq("id"))
    assert(GraftSqlTables.registerIfAbsent("cond_t", refA))
    // a concurrent register() overwrites (documented last-wins) ...
    GraftSqlTables.register("cond_t", refB)
    // ... so the original claimant's rollback must be a NO-OP
    assert(!GraftSqlTables.unregisterIfBoundTo("cond_t", refA))
    assert(GraftSqlTables.lookup(Seq("cond_t")).contains(refB),
      "rollback of a stale claim must not delete the live rebind")
    assert(GraftSqlTables.unregisterIfBoundTo("cond_t", refB))
    assert(GraftSqlTables.lookup(Seq("cond_t")).isEmpty)
  }

  test("table_vacuum fixture: expired v2 fails loudly, tag-retained v1 " +
      "and latest stay readable, history lists exactly {1, 3}") {
    val sf = "/root/testdata/sf0.001"
    // building the fixture runs expire + orphan sweep (and REQUIREs both
    // reclaimed something); the row itself must produce both slices
    val rows = ops.Table.table_vacuum(spark, sf).collect()
    val srcs = rows.map(_.getString(0)).toSet
    assert(srcs == Set("archive", "latest"), srcs.toString)
    val root = ops.Sources.sinkDir(spark, sf, "graft_table_vacuum")
    // the expired middle snapshot is GONE — loud manifest miss, never a
    // silent partial read
    intercept[Exception] {
      GraftTable.read(spark, root, Some(2)).collect()
    }
    assert(GraftTable.history(spark, root).select("snapshot").collect()
      .map(_.getInt(0)).toSet == Set(1, 3))
    // the tag still resolves and equals the archive slice the row emits
    val tagN = GraftTable.readTag(spark, root, "archive").count()
    val archN = rows.filter(_.getString(0) == "archive")
      .map(_.getLong(2)).sum
    assert(tagN == archN, s"tag rows $tagN vs row sum $archN")
    // the planted stray is gone and its dead dir swept with it
    assert(!Files.exists(Paths.get(root, "data", "zz_orphan")))
  }

  // ----- hidden-partitioning transforms (r14 verdict #2) ------------------

  private def tsTable(n: Int) = {
    import spark.implicits._
    // 2024-01-15 .. onward, one row per day, wrapping months
    (1 to n).map { i =>
      (i.toLong,
        java.time.LocalDateTime.of(2024, 1, 1, 12, 0).plusDays(i.toLong),
        s"v$i")
    }.toDF("id", "ts", "payload")
  }

  test("months() transform: hidden dirs, manifest spec, logical reads, " +
      "append derives the same tuple, parts recorded") {
    val root = freshRoot()
    GraftTable.create(spark, root, tsTable(120), Seq("id"), Seq("id"),
      numFiles = 2, partitionSpec = Seq(
        GraftTable.PartField("ts_month", "months", "ts")))
    val m = GraftTable.manifest(root, 1)
    assert(m.partitionCols.contains(List("ts_month")))
    assert(m.partitionSpec.exists(_ ==
      List(GraftTable.PartField("ts_month", "months", "ts"))))
    // every file carries exactly one derived tuple and lives under it
    m.files.foreach { f =>
      val p = f.parts.getOrElse(fail(s"no parts on ${f.path}"))
      assert(p.keySet == Set("ts_month"), p.toString)
      assert(f.path.startsWith(s"data/ts_month=${p("ts_month")}/"), f.path)
      assert(p("ts_month").matches("\\d{4}-\\d{2}"), p.toString)
    }
    // the logical read presents ONLY the declared schema — the derived
    // column is a layout artifact, never a column
    val df = GraftTable.read(spark, root)
    assert(df.columns.toSeq == Seq("id", "ts", "payload"))
    assert(df.count() == 120)
    // append derives the identical tuple shape
    GraftTable.append(spark, root, tsTable(150).where(col("id") > 120),
      Seq("id"), Seq("id"), numFiles = 1)
    assert(GraftTable.read(spark, root).count() == 150)
    val m2 = GraftTable.manifest(root, 2)
    assert(m2.partitionSpec == m.partitionSpec)
    // rename/drop of the SOURCE column is loudly rejected
    val eRen = intercept[IllegalArgumentException] {
      GraftTable.alterRenameColumn(root, "ts", "ts2")
    }
    assert(eRen.getMessage.contains("transform source"), eRen.getMessage)
    val eDrop = intercept[IllegalArgumentException] {
      GraftTable.alterDropColumns(root, Seq("ts"))
    }
    assert(eDrop.getMessage.contains("transform source"), eDrop.getMessage)
  }

  test("transform guards: non-time source, derived-name collision, " +
      "unknown transform, bucket arity/type") {
    val root = freshRoot()
    import spark.implicits._
    val df = Seq((1L, "x", 3)).toDF("id", "name", "qty")
    def create(spec: GraftTable.PartField*) =
      GraftTable.create(spark, freshRoot(), df, Seq("id"), Seq("id"),
        numFiles = 1, partitionSpec = spec.toSeq)
    assert(intercept[IllegalArgumentException] {
      create(GraftTable.PartField("name_day", "days", "name"))
    }.getMessage.contains("DATE or TIMESTAMP_NTZ"))
    // session-zone-dependent TIMESTAMP sources shear the calendar
    // prefix between writer and reader sessions — loud at CREATE
    val ltz = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00")))
      .toDF("id", "ts")
    assert(intercept[IllegalArgumentException] {
      GraftTable.create(spark, freshRoot(), ltz, Seq("id"), Seq("id"),
        numFiles = 1, partitionSpec = Seq(
          GraftTable.PartField("ts_month", "months", "ts")))
    }.getMessage.contains("shear"))
    assert(intercept[IllegalArgumentException] {
      create(GraftTable.PartField("qty", "bucket", "qty", Some(4)))
    }.getMessage.contains("collides"))
    assert(intercept[IllegalArgumentException] {
      create(GraftTable.PartField("id_trunc", "truncate", "id"))
    }.getMessage.contains("unknown partition transform"))
    // hours is a first-class calendar transform; its dir value is the
    // zero-padded hour prefix (lexicographic == chronological)
    val hrRoot = freshRoot()
    GraftTable.create(spark, hrRoot, tsTable(30), Seq("id"), Seq("id"),
      numFiles = 1, partitionSpec = Seq(
        GraftTable.PartField("ts_hour", "hours", "ts")))
    GraftTable.manifest(hrRoot, 1).files.foreach(f =>
      assert(f.parts.get("ts_hour")
        .matches("\\d{4}-\\d{2}-\\d{2}-\\d{2}"), f.parts))
    assert(intercept[IllegalArgumentException] {
      create(GraftTable.PartField("name_bucket", "bucket", "name", Some(4)))
    }.getMessage.contains("integral"))
    assert(intercept[IllegalArgumentException] {
      create(GraftTable.PartField("id_bucket", "bucket", "id", Some(1)))
    }.getMessage.contains("n >= 2"))
    // identity shorthand still works and stores NO spec
    GraftTable.create(spark, root, df.withColumn("p", lit("a")),
      Seq("id"), Seq("id"), numFiles = 1, partitionCols = Seq("p"))
    assert(GraftTable.manifest(root, 1).partitionSpec.isEmpty)
  }

  test("bucket() transform: deterministic prime-reduced assignment, " +
      "equality predicate prunes to one bucket's files") {
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(400), Seq("id"), Seq("id"),
      numFiles = 2, partitionSpec = Seq(
        GraftTable.PartField("id_bucket", "bucket", "id", Some(4))))
    val m = GraftTable.manifest(root, 1)
    // dirs match the driver-side bucketValue exactly — the probe a
    // mapped predicate computes must agree with what the write laid out
    m.files.foreach { f =>
      val b = f.parts.get("id_bucket")
      assert(Set("0", "1", "2", "3").contains(b), b)
    }
    val want = GraftTable.bucketValue(37L, 4).toString
    // register + SQL equality predicate → PartitionFilters prunes
    graft.sql.GraftSqlTables.register("bkt_t",
      graft.sql.GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id")))
    try {
      val q = graft.sql.GraftSql.sql(spark,
        "SELECT id, payload FROM bkt_t WHERE id = 37")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(37L))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") &&
        plan.contains("id_bucket"),
        s"expected a mapped id_bucket partition filter in:\n$plan")
      // and the filter actually selects the right bucket
      assert(plan.contains(want), s"expected bucket $want in:\n$plan")
    } finally graft.sql.GraftSqlTables.unregister("bkt_t")
  }

  test("cross-PROCESS commit race: two JVMs append concurrently to one " +
      "root — linear snapshot chain, no lost update, every row exactly " +
      "once") {
    import spark.implicits._
    val root = freshRoot()
    val k = 6
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1)
    // spawn a SECOND JVM running the ordinary optimistic append path on
    // the same root: the in-JVM thread race (elsewhere in this suite)
    // certifies createLink's atomicity under java.nio on one runtime;
    // this one certifies it ACROSS PROCESSES — the multi-writer story a
    // shared table format must actually support.
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val workDir = Files.createTempDirectory("graft_race_jvm").toFile
    val log = new java.io.File(workDir, "child.log")
    graft.util.AppCleanup.onExit(s"graft_race_jvm_$workDir")(
      graft.util.AppCleanup.recursiveDelete(workDir))
    val pb = new ProcessBuilder(javaBin, "-Xmx2g", "-cp", cp,
      "graft.RaceAppendMain", root, "2000", k.toString)
    pb.directory(workDir)
    pb.redirectErrorStream(true)
    pb.redirectOutput(log)
    val proc = pb.start()
    try {
      // wait for the child's session, then race it at maximum overlap
      val ready = Paths.get(root, "_race_ready")
      val t0 = System.nanoTime()
      while (!Files.exists(ready) && proc.isAlive &&
          (System.nanoTime() - t0) < 180e9.toLong) Thread.sleep(50)
      assert(Files.exists(ready),
        s"child JVM never came up; log:\n" + (if (log.exists)
          new String(Files.readAllBytes(log.toPath)).takeRight(2000)
        else "<no log>"))
      (1 to k).foreach { i =>
        GraftTable.append(spark, root,
          Seq((1000L + i, s"p${1000 + i}")).toDF("id", "payload"),
          Seq("id"), Seq("id"), numFiles = 1)
      }
      assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM did not finish")
      assert(proc.exitValue() == 0,
        s"child JVM failed; log tail:\n" +
          new String(Files.readAllBytes(log.toPath)).takeRight(2000))
    } finally if (proc.isAlive) proc.destroyForcibly()
    // exactly one commit per append across BOTH writers: the loser of
    // every publish race must have rebased and retried, never silently
    // overwritten the winner (createLink is create-if-absent) nor
    // given up under the 20-attempt bound
    val v = GraftTable.latestSnapshot(root)
    assert(v == 1 + 2 * k, s"expected ${1 + 2 * k} snapshots, got $v")
    (2 to v).foreach { i =>
      val m = GraftTable.manifest(root, i)
      assert(m.parent == i - 1 && m.op == "append",
        s"snapshot $i: parent ${m.parent}, op ${m.op}")
    }
    val ids = GraftTable.read(spark, root).select("id")
      .as[Long].collect().sorted.toSeq
    val want = ((1L to 10L) ++ (1 to k).map(1000L + _) ++
      (1 to k).map(2000L + _)).sorted
    assert(ids == want,
      s"lost or duplicated rows across the race: got ${ids.size}, " +
        s"want ${want.size}")
  }

  test("MERGE autoMerge: source-only columns widen the table in one " +
      "commit; star arms populate them, untouched rows read NULL, " +
      "old snapshots keep the old schema; off by default") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 2)
    GraftSqlTables.register("am_t",
      GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id"), numFiles = 1))
    try {
      Seq((5L, "u5", 0.5), (6L, "u6", 0.6), (20L, "n20", 2.0))
        .toDF("id", "payload", "score").createOrReplaceTempView("am_src")
      // default: star expansion is by-target — extras ignored, schema
      // pinned (the classic SQL star contract)
      GraftSql.exec(spark,
        """MERGE INTO am_t t USING am_src s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
      assert(GraftTable.read(spark, root).columns.toSeq ==
        Seq("id", "payload"))
      // opt in: the same statement widens the schema in ONE commit
      spark.conf.set("spark.graft.schema.autoMerge", "true")
      try {
        Seq((5L, "u5b", 0.55), (21L, "n21", 2.1))
          .toDF("id", "payload", "score")
          .createOrReplaceTempView("am_src")
        GraftSql.exec(spark,
          """MERGE INTO am_t t USING am_src s ON t.id = s.id
             WHEN MATCHED THEN UPDATE SET *
             WHEN NOT MATCHED THEN INSERT *""")
      } finally spark.conf.unset("spark.graft.schema.autoMerge")
      val v = GraftTable.latestSnapshot(root)
      assert(GraftTable.manifest(root, v).op == "merge_evolve")
      val r = GraftTable.read(spark, root)
      assert(r.columns.toSeq == Seq("id", "payload", "score"))
      val byId = r.collect().map(x =>
        x.getLong(0) -> (x.getString(1),
          if (x.isNullAt(2)) null else x.getDouble(2))).toMap
      assert(byId(5L) == (("u5b", 0.55)) && byId(21L) == (("n21", 2.1)))
      // rows no arm touched — including rows in files the commit
      // carried by reference — read NULL for the new column
      assert(byId(1L) == (("v1", null)) && byId(20L) == (("n20", null)))
      assert(byId.size == 12)
      // snapshot isolation: the pre-evolution snapshot keeps its schema
      assert(GraftTable.read(spark, root, Some(v - 1)).columns.toSeq ==
        Seq("id", "payload"))
      // the DSL strict path stays loud without the opt-in
      val e = intercept[IllegalArgumentException] {
        GraftTable.merge(spark, root,
          Seq((1L, "x", 0.1, "extra2")).toDF("id", "payload", "score", "z"),
          "id", Seq("id"), Seq("id"))
      }
      assert(e.getMessage.contains("schema mismatch"), e.getMessage)
    } finally GraftSqlTables.unregister("am_t")
  }

  test("OPTIMIZE ... WHERE: rewrite bounded to matching partitions, " +
      "untouched files carried by reference, receipt counts, loud on " +
      "non-partition predicates") {
    import spark.implicits._
    val root = freshRoot()
    // identity-partitioned, many small files per partition value
    GraftTable.create(spark, root,
      (1 to 300).map(i => (i.toLong, (i % 3).toLong, s"v$i"))
        .toDF("id", "p", "payload"),
      Seq("id"), Seq("id"), numFiles = 4, partitionCols = Seq("p"))
    val before = GraftTable.manifest(root, 1).files
    val inP1 = before.filter(_.parts.get("p") == "1").map(_.path).toSet
    val outside = before.filterNot(f => inP1(f.path)).map(_.path).toSet
    assert(inP1.size >= 2, s"fixture needs >=2 files in p=1: $before")
    GraftSqlTables.register("ow_t",
      GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id"), numFiles = 1))
    try {
      val r = GraftSql.sql(spark, "OPTIMIZE ow_t WHERE p = 1").head()
      val m2 = GraftTable.manifest(root, 2)
      assert(m2.op == "compact_where")
      // every non-matching file carried BY REFERENCE; p=1's gone
      val after = m2.files.map(_.path).toSet
      assert(outside.subsetOf(after),
        s"untouched partitions must carry by reference: lost " +
          s"${outside -- after}")
      assert(inP1.intersect(after).isEmpty,
        s"matching partition files must be rewritten: kept " +
          s"${inP1.intersect(after)}")
      // receipt: exactly the touched partition's counts
      assert(r.getInt(1) == inP1.size && r.getInt(2) >= 1,
        s"receipt ${r} vs rewritten ${inP1.size}")
      // rewritten files still live under p=1 dirs; content invariant
      assert(m2.files.filter(f => f.parts.get("p") == "1")
        .forall(f => f.path.startsWith("data/p=1/")))
      assert(GraftTable.read(spark, root).count() == 300)
      // loud: data-column predicate never widens to a full rewrite
      val e = intercept[IllegalArgumentException] {
        GraftSql.sql(spark, "OPTIMIZE ow_t WHERE payload = 'v1'").collect()
      }
      assert(e.getMessage.contains("refusing to widen"), e.getMessage)
      // loud: OR is not a partition bound
      intercept[IllegalArgumentException] {
        GraftSql.sql(spark, "OPTIMIZE ow_t WHERE p = 1 OR p = 2").collect()
      }
    } finally GraftSqlTables.unregister("ow_t")
    // transform table: a raw-timestamp range bounds the rewrite to the
    // boundary-inclusive months
    val root2 = freshRoot()
    GraftTable.create(spark, root2, tsTable(200), Seq("id"), Seq("id"),
      numFiles = 3, partitionSpec = Seq(
        GraftTable.PartField("ts_month", "months", "ts")))
    GraftSqlTables.register("ow_tx",
      GraftSqlTables.Ref(root2, "id", Seq("id"), Seq("id"), numFiles = 1))
    try {
      val b2 = GraftTable.manifest(root2, 1).files
      val touched = b2.filter(f =>
        f.parts.get("ts_month") >= "2024-02" &&
          f.parts.get("ts_month") <= "2024-04").map(_.path).toSet
      val r2 = GraftSql.sql(spark,
        """OPTIMIZE ow_tx WHERE ts >= TIMESTAMP_NTZ '2024-02-10 00:00:00'
           AND ts < TIMESTAMP_NTZ '2024-04-01 00:00:00'""").head()
      assert(r2.getInt(1) == touched.size,
        s"transform-bounded rewrite: receipt $r2 vs touched " +
          s"${touched.size}")
      val a2 = GraftTable.manifest(root2,
        GraftTable.latestSnapshot(root2)).files.map(_.path).toSet
      assert(touched.intersect(a2).isEmpty)
      assert(b2.map(_.path).filterNot(touched).forall(a2))
      assert(GraftTable.read(spark, root2).count() == 200)
    } finally GraftSqlTables.unregister("ow_tx")
  }

  test("hidden-partition pruning: raw-timestamp range on a months() " +
      "table maps to PartitionFilters and skips non-matching files") {
    val root = freshRoot()
    GraftTable.create(spark, root, tsTable(300), Seq("id"), Seq("id"),
      numFiles = 2, partitionSpec = Seq(
        GraftTable.PartField("ts_month", "months", "ts")))
    graft.sql.GraftSqlTables.register("hp_t",
      graft.sql.GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id")))
    // plan-shape assertion: AQE off so the FileSourceScanExec is
    // reachable in the executed plan tree (the PlanShapeSpec discipline)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = graft.sql.GraftSql.sql(spark,
        """SELECT count(1) AS n FROM hp_t
           WHERE ts >= TIMESTAMP_NTZ '2024-03-01 00:00:00'
             AND ts < TIMESTAMP_NTZ '2024-05-01 00:00:00'""")
      // row-exactness: the mapped predicate only prunes, the raw
      // conjunct still filters rows (Mar 1 12:00 .. Apr 30 12:00)
      val expect = tsTable(300).where(
        col("ts") >= lit("2024-03-01").cast("timestamp_ntz") &&
          col("ts") < lit("2024-05-01").cast("timestamp_ntz")).count()
      assert(q.head().getLong(0) == expect)
      val exec = q.queryExecution.executedPlan.toString
      assert(exec.contains("PartitionFilters") && exec.contains("ts_month"),
        s"expected mapped ts_month partition filters in:\n$exec")
      // the scan plans strictly fewer files than the table holds: only
      // the 2024-03/2024-04 dirs survive the partition filter
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.selectedPartitions.totalNumberOfFiles }.sum
      val total = GraftTable.manifest(root, 1).files.size
      assert(scanned < total && scanned > 0,
        s"expected partition pruning: scanned $scanned of $total files")
      // the upper bound maps CONSERVATIVELY onto the boundary month
      // (`ts < 2024-05-01` keeps ts_month = 2024-05: that partition's
      // files could hold qualifying rows in general; the raw conjunct
      // filters them row-exactly) — so the planned set is {03, 04, 05}
      val touched = GraftTable.manifest(root, 1).files
        .filter(f => Set("2024-03", "2024-04", "2024-05")(
          f.parts.get("ts_month")))
        .size
      assert(scanned == touched,
        s"scanned $scanned files, expected the three boundary-inclusive " +
          s"months' $touched")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      graft.sql.GraftSqlTables.unregister("hp_t")
    }
  }

  test("DST-gap derivation: hours() dirs come from the pure wall clock " +
      "in a non-UTC session; pruning finds the gap-hour rows") {
    import spark.implicits._
    val root = freshRoot()
    // 02:30 on 2024-03-10 does not exist on the America/Los_Angeles
    // clock (spring-forward gap): date_format over NTZ would shear it
    // to hour 03 while the java.time pruning mirror says 02 — the
    // mapped partition conjunct would then prune the file that holds
    // the row. The CAST-to-STRING derivation is zone-independent.
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val rows = Seq(
        (1L, java.time.LocalDateTime.of(2024, 3, 10, 1, 30)),
        (2L, java.time.LocalDateTime.of(2024, 3, 10, 2, 30)),
        (3L, java.time.LocalDateTime.of(2024, 3, 10, 3, 30))
      ).toDF("id", "ts")
      GraftTable.create(spark, root, rows, Seq("id"), Seq("id"),
        numFiles = 1, partitionSpec = Seq(
          GraftTable.PartField("ts_hour", "hours", "ts")))
      val dirs = GraftTable.manifest(root, 1).files
        .flatMap(_.parts.get.get("ts_hour")).toSet
      assert(dirs == Set("2024-03-10-01", "2024-03-10-02",
        "2024-03-10-03"), dirs.toString)
      GraftSqlTables.register("dst_t",
        GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id")))
      try {
        val got = GraftSql.sql(spark,
          """SELECT id FROM dst_t
             WHERE ts = TIMESTAMP_NTZ '2024-03-10 02:30:00'""")
          .collect().map(_.getLong(0)).toSeq
        assert(got == Seq(2L),
          s"gap-hour row must survive partition pruning: $got")
      } finally GraftSqlTables.unregister("dst_t")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("OPTIMIZE ... WHERE on an identity DATE partition: literals " +
      "render to the catalog dir string; ranges compare lexicographic; " +
      "timestamp / mistyped literals stay loud") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root,
      (1 to 90).map(i => (i.toLong,
        java.sql.Date.valueOf(java.time.LocalDate
          .of(2024, 1, 1).plusDays(i % 3)), s"v$i"))
        .toDF("id", "d", "payload"),
      Seq("id"), Seq("id"), numFiles = 4, partitionCols = Seq("d"))
    val before = GraftTable.manifest(root, 1).files
    val inD2 = before.filter(_.parts.get("d") == "2024-01-02")
      .map(_.path).toSet
    assert(inD2.size >= 2, s"fixture needs >=2 files in d=2024-01-02")
    GraftSqlTables.register("owd_t",
      GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id"), numFiles = 1))
    try {
      // equality: the DateType literal must render '2024-01-02', never
      // its epoch-days toString (which matched zero files — a silent
      // no-op with a (v,0,0) receipt)
      val r = GraftSql.sql(spark,
        "OPTIMIZE owd_t WHERE d = DATE '2024-01-02'").head()
      assert(r.getInt(1) == inD2.size && r.getInt(2) >= 1,
        s"receipt $r vs rewritten ${inD2.size}")
      val after2 = GraftTable.manifest(root, 2).files.map(_.path).toSet
      assert(inD2.intersect(after2).isEmpty)
      assert(before.filterNot(f => inD2(f.path))
        .forall(f => after2(f.path)))
      // range: zero-padded ISO dirs compare lexicographically; only
      // d >= 2024-01-02 partitions rewrite
      val m2 = GraftTable.manifest(root, 2).files
      val hi = m2.filter(_.parts.get("d") >= "2024-01-02")
        .map(_.path).toSet
      val r2 = GraftSql.sql(spark,
        "OPTIMIZE owd_t WHERE d >= DATE '2024-01-02'").head()
      assert(r2.getInt(1) == hi.size, s"receipt $r2 vs ${hi.size}")
      val after3 = GraftTable.manifest(root, 3).files.map(_.path).toSet
      assert(hi.intersect(after3).isEmpty)
      assert(m2.filterNot(f => hi(f.path)).forall(f => after3(f.path)))
      assert(GraftTable.read(spark, root).count() == 90)
      // loud: timestamp literals have no faithful dir-string form
      val eTs = intercept[IllegalArgumentException] {
        GraftSql.sql(spark,
          "OPTIMIZE owd_t WHERE d = TIMESTAMP_NTZ '2024-01-02 00:00:00'")
          .collect()
      }
      assert(eTs.getMessage.contains("refusing to widen"), eTs.getMessage)
      // loud: a numeric range against date dirs is a type mismatch,
      // never the old forall-true full-table widening
      val eNum = intercept[Exception] {
        GraftSql.sql(spark, "OPTIMIZE owd_t WHERE d >= 5").collect()
      }
      assert(eNum.getMessage.contains("refusing to widen") ||
        Option(eNum.getCause).exists(
          _.getMessage.contains("refusing to widen")), eNum.getMessage)
    } finally GraftSqlTables.unregister("owd_t")
  }

  test("MERGE autoMerge: evolution applies ONLY to star-shaped arms — " +
      "explicit-assignment merges never widen the schema") {
    import spark.implicits._
    val root = freshRoot()
    // 3 data columns so a partial explicit arm is structurally
    // distinguishable from an analyzer-expanded star (a full by-name
    // assignment IS a star by the documented recovery rule)
    GraftTable.create(spark, root,
      (1 to 10).map(i => (i.toLong, s"v$i", i)).toDF("id", "payload", "qty"),
      Seq("id"), Seq("id"), numFiles = 1)
    GraftSqlTables.register("ams_t",
      GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id"), numFiles = 1))
    try {
      Seq((5L, "u5", 50, 0.5), (20L, "n20", 200, 2.0))
        .toDF("id", "payload", "qty", "score")
        .createOrReplaceTempView("ams_src")
      spark.conf.set("spark.graft.schema.autoMerge", "true")
      try {
        // arms assign a strict SUBSET of the target's columns — not
        // star-shaped; the conf must NOT widen the table with an
        // all-NULL `score` column
        GraftSql.exec(spark,
          """MERGE INTO ams_t t USING ams_src s ON t.id = s.id
             WHEN MATCHED THEN UPDATE SET t.payload = s.payload
             WHEN NOT MATCHED THEN INSERT (id, payload, qty)
               VALUES (s.id, s.payload, 0)""")
        assert(GraftTable.read(spark, root).columns.toSeq ==
          Seq("id", "payload", "qty"))
        val v = GraftTable.latestSnapshot(root)
        assert(GraftTable.manifest(root, v).op != "merge_evolve",
          GraftTable.manifest(root, v).op)
        // a star arm in the SAME session still evolves
        GraftSql.exec(spark,
          """MERGE INTO ams_t t USING ams_src s ON t.id = s.id
             WHEN MATCHED THEN UPDATE SET *""")
        assert(GraftTable.read(spark, root).columns.toSeq ==
          Seq("id", "payload", "qty", "score"))
      } finally spark.conf.unset("spark.graft.schema.autoMerge")
    } finally GraftSqlTables.unregister("ams_t")
  }

  test("durable catalog: CREATE in JVM-1 resolves by name in JVM-2 " +
      "(table, view, DML, cross-process collision); DROP removes the " +
      "entry; unset dir keeps the in-process behavior") {
    import spark.implicits._
    val catDir = Files.createTempDirectory("graft_catalog").toFile
    graft.util.AppCleanup.onExit(s"graft_catalog_${catDir.getName}")(
      graft.util.AppCleanup.recursiveDelete(catDir))
    val root = freshRoot()
    sys.props("graft.catalog.dir") = catDir.getAbsolutePath
    try {
      GraftSql.exec(spark,
        s"""CREATE TABLE cat_jvm_t (id BIGINT, payload STRING)
            USING graft LOCATION '$root' OPTIONS (key 'id', stats 'id')""")
      GraftSql.exec(spark,
        "INSERT INTO cat_jvm_t SELECT id, concat('v', id) FROM range(1, 6)")
      GraftSql.exec(spark,
        "CREATE VIEW cat_jvm_v AS SELECT id, payload FROM cat_jvm_t")
      // the durable entries exist where a second process will look
      assert(Files.exists(Paths.get(catDir.getAbsolutePath,
        "tables", "cat_jvm_t.entry")))
      assert(Files.exists(Paths.get(catDir.getAbsolutePath,
        "views", "cat_jvm_v.entry")))
      // in-process duplicate CREATE stays loud (unchanged guard)
      val eDup = intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          s"""CREATE TABLE cat_jvm_t (id BIGINT, payload STRING)
              USING graft LOCATION '${root}_x' OPTIONS (key 'id')""")
      }
      assert(eDup.getMessage.contains("already exists"), eDup.getMessage)
      // a SECOND JVM with an empty registry: duplicate CREATE must lose
      // the on-disk claim, then name-resolve the table AND the view
      // purely from the catalog files, and commit an INSERT through the
      // loaded Ref knobs
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      val workDir = Files.createTempDirectory("graft_cat_jvm").toFile
      val log = new java.io.File(workDir, "child.log")
      graft.util.AppCleanup.onExit(s"graft_cat_jvm_$workDir")(
        graft.util.AppCleanup.recursiveDelete(workDir))
      val pb = new ProcessBuilder(javaBin, "-Xmx2g", "-cp", cp,
        s"-Dgraft.catalog.dir=${catDir.getAbsolutePath}",
        "graft.CatalogSecondJvmMain", catDir.getAbsolutePath,
        "cat_jvm_t", "cat_jvm_v", "999")
      pb.directory(workDir)
      pb.redirectErrorStream(true)
      pb.redirectOutput(log)
      val proc = pb.start()
      try {
        assert(proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
          "catalog child JVM did not finish")
        assert(proc.exitValue() == 0,
          s"catalog child JVM failed; log tail:\n" +
            new String(Files.readAllBytes(log.toPath)).takeRight(3000))
      } finally if (proc.isAlive) proc.destroyForcibly()
      // the child's INSERT is visible here by name — one shared table
      val got = GraftSql.sql(spark,
        "SELECT id, payload FROM cat_jvm_t ORDER BY id")
        .as[(Long, String)].collect().toSeq
      assert(got.size == 6 && got.last == ((999L, "from_jvm2")), got)
      // DROP semantics: unregister removes the durable entry too
      assert(GraftSqlTables.unregister("cat_jvm_t"))
      assert(!Files.exists(Paths.get(catDir.getAbsolutePath,
        "tables", "cat_jvm_t.entry")))
      assert(graft.sql.GraftSqlViews.unregister(Seq("cat_jvm_v")))
      assert(!Files.exists(Paths.get(catDir.getAbsolutePath,
        "views", "cat_jvm_v.entry")))
    } finally {
      sys.props -= "graft.catalog.dir"
      GraftSqlTables.unregister("cat_jvm_t")
      graft.sql.GraftSqlViews.unregister(Seq("cat_jvm_v"))
    }
    // with no catalog configured, registration stays purely in-process
    // (no stray files anywhere) — the pre-r16 contract
    GraftSqlTables.register("cat_mem_t",
      GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id")))
    try {
      assert(Files.list(Paths.get(catDir.getAbsolutePath, "tables"))
        .count() == 0)
    } finally GraftSqlTables.unregister("cat_mem_t")
  }

  test("ALTER COLUMN TYPE safe widening: metadata-only commit, mixed-" +
      "epoch reads, stats/bloom survive, time travel keeps each " +
      "snapshot's type, outside-matrix loud") {
    import spark.implicits._
    val root = freshRoot()
    val v1rows = (1 to 50).map(i => (i.toLong, i, i.toFloat / 2, s"v$i"))
      .toDF("id", "n", "x", "payload")
    GraftTable.create(spark, root, v1rows, Seq("id", "n"), Seq("id"),
      numFiles = 2, bloomCols = Seq("n"))
    // widen n: INT -> BIGINT, one metadata-only commit, files untouched
    assert(GraftTable.alterWidenColumnType(root, "n",
      org.apache.spark.sql.types.LongType) == 2)
    val m2 = GraftTable.manifest(root, 2)
    assert(m2.op == "alter_widen(n:int->bigint)")
    assert(m2.files == GraftTable.manifest(root, 1).files,
      "widen must carry every file by reference")
    val r2 = GraftTable.read(spark, root)
    assert(r2.schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(r2.agg(sum(col("n"))).head().getLong(0) == (1 to 50).sum)
    // post-widen append holds values an INT cannot — the case the
    // widening exists for
    val big = Int.MaxValue.toLong + 7L
    GraftTable.append(spark, root,
      Seq((51L, big, 25.5f, "v51")).toDF("id", "n", "x", "payload"),
      Seq("id", "n"), Seq("id"), numFiles = 1)
    val mixed = GraftTable.read(spark, root)
    assert(mixed.where(col("n") === big).count() == 1)
    assert(mixed.agg(sum(col("n"))).head().getLong(0) ==
      (1 to 50).sum.toLong + big)
    // float -> double on the same table; mixed-epoch doubles exact
    assert(GraftTable.alterWidenColumnType(root, "x",
      org.apache.spark.sql.types.DoubleType) == 4)
    val rx = GraftTable.read(spark, root)
    assert(rx.schema("x").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(rx.where(col("id") === 4L).head().getDouble(2) == 2.0)
    // time travel presents each snapshot's OWN type
    assert(GraftTable.read(spark, root, Some(1)).schema("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(GraftTable.read(spark, root, Some(3)).schema("x").dataType ==
      org.apache.spark.sql.types.FloatType)
    // stats pruning still prunes on the widened column: the narrow-
    // epoch double-encoded min/max bounds are exact for both types
    val probe = GraftTable.read(spark, root).where(col("n") === 7L)
    assert(probe.count() == 1)
    // outside the matrix: loud, with the matrix named
    val eNarrow = intercept[IllegalArgumentException] {
      GraftTable.alterWidenColumnType(root, "n",
        org.apache.spark.sql.types.IntegerType)
    }
    assert(eNarrow.getMessage.contains("safe widening matrix"),
      eNarrow.getMessage)
    intercept[IllegalArgumentException] {
      GraftTable.alterWidenColumnType(root, "payload",
        org.apache.spark.sql.types.LongType)
    }
    intercept[IllegalArgumentException] {
      GraftTable.alterWidenColumnType(root, "id",
        org.apache.spark.sql.types.DoubleType)
    }
    // RESTORE across the widen resurrects the narrow schema wholesale
    // (snapshot semantics — restore copies the target's schemaJson)
    GraftTable.restore(root, 1)
    assert(GraftTable.read(spark, root).schema("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(GraftTable.read(spark, root).schema("x").dataType ==
      org.apache.spark.sql.types.FloatType)
    // the SQL verb: widen via ALTER TABLE; non-type alterations loud
    val root2 = freshRoot()
    GraftSql.exec(spark,
      s"""CREATE TABLE wt_sql (id BIGINT, n INT) USING graft
          LOCATION '$root2' OPTIONS (key 'id', stats 'id,n')""")
    try {
      GraftSql.exec(spark, "INSERT INTO wt_sql SELECT id, cast(id AS INT) " +
        "FROM range(1, 11)")
      GraftSql.exec(spark, "ALTER TABLE wt_sql ALTER COLUMN n TYPE BIGINT")
      assert(GraftSql.sql(spark, "SELECT sum(n) AS s FROM wt_sql")
        .head().getLong(0) == 55L)
      assert(GraftTable.read(spark, root2).schema("n").dataType ==
        org.apache.spark.sql.types.LongType)
      val eCmt = intercept[IllegalArgumentException] {
        GraftSql.exec(spark,
          "ALTER TABLE wt_sql ALTER COLUMN n COMMENT 'nope'")
      }
      assert(eCmt.getMessage.contains("TYPE widening"), eCmt.getMessage)
    } finally GraftSqlTables.unregister("wt_sql")
  }

  test("REBASE BRANCH: key-disjoint branch commits re-derive onto an " +
      "advanced main (pure metadata, per-commit chain kept); key clash " +
      "loud with main untouched; empty branch re-points; publish works " +
      "after rebase") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(10), Seq("id"), Seq("id"),
      numFiles = 1) // v1
    GraftTable.createBranch(root, "wap")
    // two branch commits (ids 2, 3 in main's sequence)
    GraftTable.appendToBranch(spark, root, "wap",
      Seq((101L, "b101")).toDF("id", "payload"), Seq("id"), Seq("id"),
      numFiles = 1)
    GraftTable.appendToBranch(spark, root, "wap",
      Seq((102L, "b102")).toDF("id", "payload"), Seq("id"), Seq("id"),
      numFiles = 1)
    // main advances past the fork with DISJOINT keys (ids 2, 3 on main)
    GraftTable.append(spark, root,
      Seq((201L, "m201")).toDF("id", "payload"), Seq("id"), Seq("id"),
      numFiles = 1)
    GraftTable.append(spark, root,
      Seq((202L, "m202")).toDF("id", "payload"), Seq("id"), Seq("id"),
      numFiles = 1) // main latest = 3
    // publish now fails loudly (divergence) — the pre-rebase world
    intercept[java.util.ConcurrentModificationException] {
      GraftTable.publishBranch(root, "wap")
    }
    // rebase: branch chain re-derives as ids 4, 5 on top of main's 3
    val head = GraftTable.rebaseBranch(spark, root, "wap", "id")
    assert(head == 5, s"rebased head: $head")
    assert(GraftTable.branches(root)("wap") == 3,
      "marker must re-point to main's latest")
    // the rebased branch reads main's rows AND the branch's — per-
    // commit granularity preserved (two branch manifests, ids 4 and 5)
    val ids = GraftTable.readBranch(spark, root, "wap")
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == ((1L to 10L) ++ Seq(101L, 102L, 201L, 202L)).sorted)
    assert(GraftTable.branchHead(root, "wap") == 5)
    // main itself never moved
    assert(GraftTable.latestSnapshot(root) == 3)
    assert(GraftTable.read(spark, root).count() == 12)
    // publish after rebase fast-forwards cleanly
    assert(GraftTable.publishBranch(root, "wap") == 5)
    assert(GraftTable.read(spark, root).count() == 14)
    GraftTable.dropBranch(root, "wap")

    // key clash: branch writes a key main also touched since the fork
    GraftTable.createBranch(root, "clash")
    GraftTable.appendToBranch(spark, root, "clash",
      Seq((300L, "b300")).toDF("id", "payload"), Seq("id"), Seq("id"),
      numFiles = 1)
    GraftTable.append(spark, root,
      Seq((300L, "m300")).toDF("id", "payload"), Seq("id"), Seq("id"),
      numFiles = 1)
    val vBefore = GraftTable.latestSnapshot(root)
    val headBefore = GraftTable.branchHead(root, "clash")
    val e = intercept[IllegalArgumentException] {
      GraftTable.rebaseBranch(spark, root, "clash", "id")
    }
    assert(e.getMessage.contains("300"), e.getMessage)
    // loud AND untouched: main, the branch chain, and the marker
    assert(GraftTable.latestSnapshot(root) == vBefore)
    assert(GraftTable.branchHead(root, "clash") == headBefore)
    assert(GraftTable.branches(root)("clash") == 5)
    GraftTable.dropBranch(root, "clash")

    // an unwritten branch rebases by marker re-point alone
    GraftTable.createBranch(root, "idle", Some(5))
    assert(GraftTable.rebaseBranch(spark, root, "idle", "id") ==
      GraftTable.latestSnapshot(root))
    assert(GraftTable.branches(root)("idle") ==
      GraftTable.latestSnapshot(root))
    GraftTable.dropBranch(root, "idle")

    // the SQL verb returns the rebased head as its receipt
    GraftSqlTables.register("rb_t",
      GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id"), numFiles = 1))
    try {
      GraftSql.exec(spark, "ALTER TABLE rb_t CREATE BRANCH sqlb")
      GraftSql.exec(spark,
        "INSERT INTO rb_t@sqlb VALUES (400, 'b400')")
      GraftSql.exec(spark, "INSERT INTO rb_t VALUES (500, 'm500')")
      val r = GraftSql.sql(spark, "ALTER TABLE rb_t REBASE BRANCH sqlb")
        .head()
      assert(r.getInt(0) == GraftTable.branchHead(root, "sqlb"))
      assert(GraftSql.sql(spark,
        "ALTER TABLE rb_t PUBLISH BRANCH sqlb").head().getInt(0) ==
        GraftTable.latestSnapshot(root))
    } finally GraftSqlTables.unregister("rb_t")
  }

  test("TRUNCATE TABLE: metadata-only clear — history/CDC/restore keep " +
      "working, empty no-op, re-insert may reuse keys") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, idTable(20), Seq("id"), Seq("id"),
      numFiles = 2) // v1
    assert(GraftTable.truncate(root) == 2)
    assert(GraftTable.read(spark, root).count() == 0)
    assert(GraftTable.manifest(root, 2).op == "truncate")
    assert(GraftTable.manifest(root, 2).files.isEmpty)
    // schema and key discipline survive; old KEYS are reusable (gone
    // by definition)
    GraftTable.append(spark, root,
      Seq((5L, "again5")).toDF("id", "payload"), Seq("id"), Seq("id"),
      numFiles = 1) // v3
    assert(GraftTable.read(spark, root).count() == 1)
    // time travel reads the pre-truncate world; restore resurrects it
    assert(GraftTable.read(spark, root, Some(1)).count() == 20)
    // CDC across the truncate: 20 deletes, nothing else
    val cdc = GraftTable.changesBetweenRows(spark, root, 1, 2, "id")
    assert(cdc.count() == 20 &&
      cdc.where(col("_change_type") =!= "delete").count() == 0)
    // truncating an empty snapshot declines to commit
    GraftTable.truncate(root) // v4: clears the re-insert
    val v = GraftTable.latestSnapshot(root)
    assert(GraftTable.truncate(root) == v, "empty truncate must no-op")
    GraftTable.restore(root, 1)
    assert(GraftTable.read(spark, root).count() == 20)
  }

  test("CREATE OR REPLACE TABLE: one versioned redefinition — schema/" +
      "rows/checks/partitioning swap wholesale, history intact; plain " +
      "REPLACE needs an existing name; root move loud") {
    import spark.implicits._
    val root = freshRoot()
    GraftSql.exec(spark,
      s"""CREATE TABLE rep_t (id BIGINT, payload STRING) USING graft
          LOCATION '$root' OPTIONS (key 'id', stats 'id')""")
    try {
      GraftSql.exec(spark,
        "INSERT INTO rep_t SELECT id, concat('v', id) FROM range(1, 21)")
      // redefine wholesale: different schema, different rows, a CHECK
      GraftSql.exec(spark,
        s"""CREATE OR REPLACE TABLE rep_t USING graft
            LOCATION '$root' OPTIONS (key 'grp')
            AS SELECT id % 4 AS grp, count(1) AS n
               FROM range(1, 21) GROUP BY 1""")
      val r = GraftSql.sql(spark,
        "SELECT grp, n FROM rep_t ORDER BY grp")
        .as[(Long, Long)].collect().toSeq
      assert(r == Seq((0L, 5L), (1L, 5L), (2L, 5L), (3L, 5L)), r)
      // ONE commit (op=replace) on the SAME chain; v2 still readable
      val v = GraftTable.latestSnapshot(root)
      assert(GraftTable.manifest(root, v).op == "replace")
      assert(GraftTable.read(spark, root, Some(2)).columns.toSeq ==
        Seq("id", "payload"))
      assert(GraftTable.read(spark, root, Some(2)).count() == 20)
      // DML against the new definition works under the new key
      GraftSql.exec(spark, "INSERT INTO rep_t VALUES (9, 0)")
      assert(GraftSql.sql(spark,
        "SELECT count(1) AS c FROM rep_t").head().getLong(0) == 5)
      // plain REPLACE of a MISSING name is loud; CREATE OR REPLACE of a
      // missing name creates
      val eMiss = intercept[Exception] {
        GraftSql.exec(spark,
          s"""REPLACE TABLE rep_missing USING graft
              LOCATION '${root}_m' OPTIONS (key 'id')
              AS SELECT 1L AS id""")
      }
      assert(eMiss.getMessage.contains("no such graft table") ||
        Option(eMiss.getCause).exists(
          _.getMessage.contains("no such graft table")), eMiss.getMessage)
      GraftSql.exec(spark,
        s"""CREATE OR REPLACE TABLE rep_new USING graft
            LOCATION '${root}_n' OPTIONS (key 'id')
            AS SELECT 1L AS id""")
      try assert(GraftSql.sql(spark,
        "SELECT count(1) AS c FROM rep_new").head().getLong(0) == 1)
      finally GraftSqlTables.unregister("rep_new")
      // moving the storage root through REPLACE is loud
      val eMove = intercept[Exception] {
        GraftSql.exec(spark,
          s"""CREATE OR REPLACE TABLE rep_t USING graft
              LOCATION '${root}_elsewhere' OPTIONS (key 'grp')
              AS SELECT 1L AS grp, 1L AS n""")
      }
      assert(eMove.getMessage.contains("cannot move the storage root") ||
        Option(eMove.getCause).exists(
          _.getMessage.contains("cannot move the storage root")),
        eMove.getMessage)
    } finally GraftSqlTables.unregister("rep_t")
  }

  test("NOT NULL columns are ENFORCED on every row-adding write (one " +
      "aggregate beside the CHECKs), not silently stored") {
    import spark.implicits._
    val root = freshRoot()
    GraftSql.exec(spark,
      s"""CREATE TABLE nn_t (id BIGINT, v INT NOT NULL, note STRING)
          USING graft LOCATION '$root' OPTIONS (key 'id')""")
    try {
      GraftSql.exec(spark, "INSERT INTO nn_t VALUES (1, 10, 'a')")
      // INSERT of a NULL into the non-nullable column is loud
      val eIns = intercept[Exception] {
        GraftSql.exec(spark, "INSERT INTO nn_t VALUES (2, NULL, 'b')")
      }
      assert(eIns.getMessage.contains("NOT NULL(v)") ||
        Option(eIns.getCause).exists(
          _.getMessage.contains("NOT NULL(v)")), eIns.getMessage)
      // UPDATE driving the column to NULL is the same violation
      val eUpd = intercept[Exception] {
        GraftSql.exec(spark, "UPDATE nn_t SET v = NULL WHERE id = 1")
      }
      assert(eUpd.getMessage.contains("NOT NULL(v)") ||
        Option(eUpd.getCause).exists(
          _.getMessage.contains("NOT NULL(v)")), eUpd.getMessage)
      // nullable columns stay nullable; nothing leaked into the table
      GraftSql.exec(spark, "INSERT INTO nn_t VALUES (3, 30, NULL)")
      assert(GraftSql.sql(spark, "SELECT count(1) AS c FROM nn_t")
        .head().getLong(0) == 2)
      assert(GraftSql.sql(spark,
        "SELECT v FROM nn_t WHERE id = 1").head().getInt(0) == 10)
      // the DSL append path enforces too
      val e3 = intercept[IllegalArgumentException] {
        GraftTable.append(spark, root,
          Seq((9L, None: Option[Int], Some("x")))
            .toDF("id", "v", "note"), Seq("id"), Seq("id"), numFiles = 1)
      }
      assert(e3.getMessage.contains("NOT NULL(v)"), e3.getMessage)
    } finally GraftSqlTables.unregister("nn_t")
  }

  test("row-level CDC across a REPLACE commit: deletes + inserts, never " +
      "update pairs; only name+type survivors carry values; full-history " +
      "read unions cleanly across the boundary") {
    import spark.implicits._
    val root = freshRoot()
    // v1: (id LONG, qty LONG, note STRING)
    GraftTable.create(spark, root,
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "qty", "note"),
      Seq("id"), Seq("id"), numFiles = 1)
    // v2: REPLACE — id survives (same type), qty changes TYPE (long ->
    // string: a new column wearing an old name), note dropped, score new
    GraftTable.replaceTable(spark, root,
      Seq((1L, "q1", 0.5), (3L, "q3", 0.7)).toDF("id", "qty", "score"),
      Seq("id"), Seq("id"), numFiles = 1)
    val cdc = GraftTable.changesBetweenRows(spark, root, 1, 2, "id")
    val rows = cdc.select("id", "qty", "score", "_change_type")
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.getString(3)))
      .toSet
    // deletes present old rows under the NEW schema: id carries, the
    // re-typed qty and the new score null-fill
    assert(rows == Set(
      (1L, null, null, "delete"), (2L, null, null, "delete"),
      (1L, "q1", 0.5, "insert"), (3L, "q3", 0.7, "insert")), rows)
    assert(cdc.where(col("_change_type").startsWith("update")).count() == 0,
      "a redefinition must never emit update pairs")
    // full history from 0 crosses the boundary without a type clash;
    // the v1 insert step presents only the name+type survivor (id)
    val full = GraftTable.changesBetweenRows(spark, root, 0, 2, "id")
    assert(full.count() == 6) // 2 creates + 2 deletes + 2 inserts
    val v1ins = full.where(col("_commit_snapshot") === 1)
      .select("id", "qty", "_change_type").collect()
      .map(r => (r.get(0), r.get(1), r.getString(2))).toSet
    assert(v1ins == Set((1L, null, "insert"), (2L, null, "insert")),
      s"pre-replace steps must null-fill the re-typed column: $v1ins")
  }
}
