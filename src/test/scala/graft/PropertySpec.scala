package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Engine-level invariants over generated inputs (SURVEY.md §5.3). Uses raw
  * ScalaCheck generators with a fixed seed (deterministic, and avoids the
  * scalatestplus bridge which isn't in the offline dependency cache);
  * Spark-touching properties sample few cases — each is a Spark job. */
class PropertySpec extends SparkTestBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val tokenGen = Gen.listOfN(8, Gen.oneOf("spark", "join", "sort",
    "batch", "window", "dup", "row", "key"))

  test("sample/split hash buckets are near-uniform and pairwise independent") {
    // guards the prime-reduction fix: without the inner `% p` both mixers
    // collapse to affine maps of id mod 100 — perfectly correlated, and
    // only 100/gcd distinct buckets. Checked over a contiguous id range
    // like real doc_ids, pure Scala mirror of the SQL arithmetic.
    val n = 10000
    def b1(id: Long) = id % 1000003L * 2654435761L % 1000003L % 100L
    def b2(id: Long) = id % 999983L * 2246822519L % 999983L % 100L
    val ids = (0L until n.toLong).toSeq
    // near-uniform: every bucket within ±35% of the expected 100
    for (bf <- Seq(b1 _, b2 _)) {
      val counts = ids.groupBy(bf).view.mapValues(_.size)
      assert(counts.size == 100, s"only ${counts.size} distinct buckets")
      assert(counts.values.forall(c => c > 65 && c < 135),
        s"bucket skew: min=${counts.values.min} max=${counts.values.max}")
    }
    // pairwise independent: P(kept by both) ≈ P(kept1)·P(kept2) — with
    // the collapsed mixers this lands at 0.40/0.50 instead of ~0.40/0.45
    val keptBoth = ids.count(i => b1(i) < 50 && b2(i) < 80).toDouble / n
    assert(math.abs(keptBoth - 0.5 * 0.8) < 0.02,
      s"joint keep rate $keptBoth != 0.40: assignments correlated")
  }

  test("weighted sampling: keep is monotone in quality, Column = mirror") {
    // monotonicity on the shared Scala mirror: a doc kept at bp stays
    // kept at every bp' >= bp — the defining property of rate ∝ score
    val cases = samples(for {
      id <- Gen.chooseNum(0L, 10000000L)
      a <- Gen.chooseNum(0L, 12000L)
      b <- Gen.chooseNum(0L, 12000L)
    } yield (id, math.min(a, b), math.max(a, b)), 2000)
    assert(cases.nonEmpty)
    for ((id, lo, hi) <- cases) {
      def kept(bp: Long) = ops.Llm.weightedBucket10k(id) < math.min(10000L, bp)
      assert(!kept(lo) || kept(hi), s"kept($id, $lo) but dropped at $hi")
    }
    // and the deployed Column computes the same function as the mirror
    // (shared constants, but prove it end-to-end on the fixture rows)
    ops.Llm.llm_sample_weighted(spark, sf)
      .select("doc_id", "bucket", "keep_bp", "kept").collect()
      .foreach { r =>
        assert(r.getLong(1) == ops.Llm.weightedBucket10k(r.getLong(0)))
        assert(r.getBoolean(3) == (r.getLong(1) < r.getLong(2)))
      }
  }

  test("BPE: deterministic merges, round-trip, monotone compression") {
    // hand-checkable training: (a,b) dominates the pair counts (25 vs 10
    // and 5), so it must be the first merge; input order must not matter
    val merges = ops.Llm.bpeTrain(Seq(("abab", 10L), ("abc", 5L)), 3)
    assert(merges.head == (("a", "b")), s"first merge: ${merges.head}")
    assert(merges == ops.Llm.bpeTrain(Seq(("abc", 5L), ("abab", 10L)), 3),
      "training must not depend on vocab input order")
    // properties over random words from the trained alphabet
    val wordGen = Gen.listOfN(12, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val corpus = samples(wordGen, 60).map(w => w -> 1L)
    val all = ops.Llm.bpeTrain(corpus, 30)
    assert(all.nonEmpty)
    for (w <- samples(wordGen, 100)) {
      val enc = ops.Llm.bpeEncode(w, all)
      assert(enc.mkString == w, s"round-trip broke: $w -> ${enc.toSeq}")
      // a longer merge prefix never inflates the token count
      val lens = (0 to all.length)
        .map(k => ops.Llm.bpeEncode(w, all.take(k)).length)
      assert(lens.zip(lens.tail).forall { case (a, b) => b <= a },
        s"token count not monotone in merges for $w: $lens")
    }
    // fixture-level sanity: every word yields >= 1 token, and trained
    // tokens can never be fewer than whole words
    ops.Llm.llm_bpe(spark, sf)
      .select("n_words", "n_bpe_tokens").collect()
      .foreach { r =>
        assert(r.getInt(1) >= r.getInt(0),
          s"fewer tokens than words: ${r.toSeq}")
      }
  }

  test("GraftTable model: random commit sequences read back as the model") {
    // Model-based check of the table format: drive GraftTable through
    // generated create/append/merge/compact sequences while maintaining a
    // pure Map[key -> payload] model, then require (a) the latest read to
    // equal the model after EVERY commit, and (b) time travel to every
    // recorded snapshot to equal that snapshot's model — i.e. snapshot
    // isolation holds across arbitrary histories, not just the
    // hand-written ones in GraftTableSpec. Appends draw globally fresh
    // keys (append is multiset; fresh keys keep the Map model exact) and
    // merges upsert a mix of existing and new keys, so rows stay unique
    // per key by construction. Compact must never change content and may
    // legitimately decline to commit (<2 small files).
    import spark.implicits._
    sealed trait Op
    case class Append(n: Int) extends Op
    case class Merge(nExisting: Int, nNew: Int) extends Op
    case object Compact extends Op
    case object Vacuum extends Op
    case object Restore extends Op
    case object Truncate extends Op
    case class Replace(n: Int) extends Op
    val opGen: Gen[Op] = Gen.frequency(
      4 -> Gen.choose(1, 25).map(Append(_)),
      4 -> Gen.zip(Gen.choose(0, 8), Gen.choose(0, 6))
        .map { case (e, n) => Merge(e, n) },
      2 -> Gen.const(Compact),
      2 -> Gen.const(Vacuum),
      2 -> Gen.const(Restore),
      1 -> Gen.const(Truncate),
      2 -> Gen.choose(1, 10).map(Replace(_)))
    def df(rows: Seq[(Long, String)]) = rows.toDF("id", "payload")
    def readBack(root: String, v: Option[Int]): Map[Long, String] =
      graft.table.GraftTable.read(spark, root, v).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((opsSeq, run) <- samples(Gen.listOfN(6, opGen), 2).zipWithIndex) {
      val dir = Files.createTempDirectory(s"graft_table_model$run").toFile
      graft.util.AppCleanup.onExit(s"graft_table_model_${dir.getName}")(
        graft.util.AppCleanup.recursiveDelete(dir))
      val root = dir.getAbsolutePath
      var nextKey = 101L
      def freshKeys(n: Int): Seq[Long] = {
        val ks = nextKey until (nextKey + n); nextKey += n; ks
      }
      var model = (1L to 100L).map(k => k -> s"v$k").toMap
      graft.table.GraftTable.create(spark, root, df(model.toSeq),
        Seq("id"), Seq("id"), numFiles = 3)
      // snapshot -> model at that snapshot (compact may not bump it)
      var history = Map(1 -> model)
      for ((op, step) <- opsSeq.zipWithIndex) {
        val v = op match {
          case Append(n) =>
            val rows = freshKeys(n).map(k => k -> s"a$step-$k")
            model ++= rows
            graft.table.GraftTable.append(spark, root, df(rows),
              Seq("id"), Seq("id"), numFiles = 2)
          case Merge(nExisting, nNew) =>
            val existing = model.keys.toSeq.sorted.take(nExisting)
            val rows = (existing ++ freshKeys(nNew)).map(k => k -> s"m$step-$k")
            if (rows.isEmpty) -1
            else {
              model ++= rows
              graft.table.GraftTable.merge(spark, root, df(rows), "id",
                Seq("id"), Seq("id"), numFiles = 2)
            }
          case Compact =>
            graft.table.GraftTable.compact(spark, root, minRows = 30,
              Seq("id"), Seq("id"), numFiles = 1)
          case Vacuum =>
            // expire all but the newest two snapshots; the surviving
            // content must be untouched (the shared assert below) and
            // every expired snapshot must fail LOUDLY for both read and
            // restore — a silent neighbor-read here is the data-loss bug
            // vacuum audits exist to catch (r12 interleaving audit)
            val latest = graft.table.GraftTable.latestSnapshot(root)
            val keepFrom = math.max(1, latest - 1)
            graft.table.GraftTable.expireSnapshots(root, keepFrom)
            val gone = history.keys.filter(_ < keepFrom).toSeq
            gone.foreach { ev =>
              intercept[Exception] { readBack(root, Some(ev)) }
              intercept[Exception] {
                graft.table.GraftTable.restore(root, ev)
              }
            }
            history --= gone
            -1
          case Restore =>
            // roll back to the OLDEST retained recorded snapshot as a
            // new auditable commit; the model rolls back with it
            val target = history.keys.min
            val v = graft.table.GraftTable.restore(root, target)
            model = history(target)
            v
          case Truncate =>
            // logical clear: one metadata commit, model empties; an
            // already-empty table declines to commit (returns latest,
            // whose recorded model is already the empty map)
            model = Map.empty
            graft.table.GraftTable.truncate(root)
          case Replace(n) =>
            // versioned redefinition: the table wholesale becomes the
            // replacement rows; prior snapshots stay in history and the
            // shared time-travel sweep below must still read them
            val rows = freshKeys(n).map(k => k -> s"r$step-$k")
            model = rows.toMap
            graft.table.GraftTable.replaceTable(spark, root, df(rows),
              Seq("id"), Seq("id"), numFiles = 2)
        }
        if (v > 0) history += (v -> model)
        assert(readBack(root, None) == model,
          s"run $run step $step ($op): latest read diverged from model")
      }
      // time travel: every recorded snapshot still reads as its model
      for ((v, m) <- history) {
        assert(readBack(root, Some(v)) == m,
          s"run $run: snapshot $v no longer reads as its model")
      }
    }
  }

  test("SQL DML model: random INSERT/UPDATE/DELETE/MERGE statement " +
      "sequences — with ALTER ADD COLUMNS and RENAME TO interleaved — " +
      "read back as a pure Map model") {
    // The graft.sql surface version of the commit-sequence model above:
    // arbitrary SQL statements through GraftSql.exec against a
    // registered table, a pure Map[id -> payload] model updated by the
    // same SQL semantics, and the latest read compared after EVERY
    // statement — so classification (matched / not-matched /
    // not-matched-by-source), first-matching-action dispatch and the
    // key-addressed commits hold across generated histories, not just
    // GraftTableSpec's hand-written ones. r11 adds the DDL verbs to the
    // histories: ALTER ADD COLUMNS widens the live table mid-sequence
    // (later INSERT/MERGE sources pad the new width with NULLs, and the
    // widened columns must stay NULL everywhere — nothing writes them),
    // and RENAME TO swaps the name every later statement addresses.
    import java.nio.file.Files
    sealed trait Op
    case class Insert(n: Int) extends Op
    case class Update(mod: Int, rem: Int) extends Op
    case class Delete(mod: Int, rem: Int) extends Op
    // MERGE over [lo, lo+w): matched → delete evens / update odds (del)
    // or update all (!del); not-matched → insert; plus a
    // not-matched-by-source arm re-tagging id % 7 = 1 survivors
    case class MergeW(off: Int, w: Int, del: Boolean) extends Op
    case object Alter extends Op
    case object Rename extends Op
    val opGen: Gen[Op] = Gen.frequency(
      3 -> Gen.choose(1, 15).map(Insert(_)),
      3 -> Gen.zip(Gen.choose(2, 5), Gen.choose(0, 1))
        .map { case (m, r) => Update(m, r) },
      2 -> Gen.zip(Gen.choose(3, 6), Gen.choose(0, 2))
        .map { case (m, r) => Delete(m, r) },
      4 -> Gen.zip(Gen.choose(-10, 30), Gen.choose(1, 20),
        Gen.oneOf(true, false))
        .map { case (o, w, d) => MergeW(o, w, d) },
      1 -> Gen.const(Alter),
      1 -> Gen.const(Rename))
    for ((opsSeq, run) <- samples(Gen.listOfN(6, opGen), 2).zipWithIndex) {
      val dir = Files.createTempDirectory(s"graft_sql_model$run").toFile
      graft.util.AppCleanup.onExit(s"graft_sql_model_${dir.getName}")(
        graft.util.AppCleanup.recursiveDelete(dir))
      val root = dir.getAbsolutePath
      val tbl = s"prop_sql_t$run"
      import spark.implicits._
      var model = (1L to 40L).map(k => k -> s"v$k").toMap
      var nextKey = 41L
      graft.table.GraftTable.create(spark, root,
        model.toSeq.toDF("id", "payload"), Seq("id"), Seq("id"),
        numFiles = 3)
      graft.sql.GraftSqlTables.register(tbl,
        graft.sql.GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id"), 2))
      var cur = tbl   // RENAME swaps the name later statements address
      var extra = 0   // ALTER-added columns; sources must pad this width
      def pad: String =
        (1 to extra).map(i => s", CAST(NULL AS STRING) AS x$i").mkString
      for ((op, step) <- opsSeq.zipWithIndex) {
        op match {
          case Insert(n) =>
            val (lo, hi) = (nextKey, nextKey + n); nextKey = hi
            graft.sql.GraftSql.exec(spark,
              s"""INSERT INTO $cur
                  SELECT id, concat('i$step-', CAST(id AS STRING))$pad
                  FROM range($lo, $hi)""")
            model ++= (lo until hi).map(k => k -> s"i$step-$k")
          case Update(m, r) =>
            graft.sql.GraftSql.exec(spark,
              s"""UPDATE $cur
                  SET payload = concat('u$step-', CAST(id AS STRING))
                  WHERE id % $m = $r""")
            model = model.map { case (k, v) =>
              k -> (if (k % m == r) s"u$step-$k" else v) }
          case Delete(m, r) =>
            graft.sql.GraftSql.exec(spark,
              s"DELETE FROM $cur WHERE id % $m = $r")
            model = model.filter { case (k, _) => k % m != r }
          case MergeW(off, w, del) =>
            val (lo, hi) = (math.max(0, off).toLong,
              math.max(0, off).toLong + w)
            nextKey = math.max(nextKey, hi)
            val matchedArms =
              if (del) """WHEN MATCHED AND s.id % 2 = 0 THEN DELETE
                          WHEN MATCHED THEN UPDATE SET payload = s.payload"""
              else "WHEN MATCHED THEN UPDATE SET payload = s.payload"
            graft.sql.GraftSql.exec(spark,
              s"""MERGE INTO $cur t
                  USING (SELECT id,
                           concat('m$step-', CAST(id AS STRING))
                             AS payload$pad
                         FROM range($lo, $hi)) s
                  ON t.id = s.id
                  $matchedArms
                  WHEN NOT MATCHED THEN INSERT *
                  WHEN NOT MATCHED BY SOURCE AND t.id % 7 = 1
                    THEN UPDATE SET payload =
                      concat('o$step-', CAST(t.id AS STRING))""")
            val src = (lo until hi).toSet
            model = model.flatMap { case (k, v) =>
              if (src(k))
                if (del && k % 2 == 0) None else Some(k -> s"m$step-$k")
              else if (k % 7 == 1) Some(k -> s"o$step-$k")
              else Some(k -> v)
            } ++ src.filterNot(model.contains).map(k => k -> s"m$step-$k")
          case Alter =>
            extra += 1
            graft.sql.GraftSql.exec(spark,
              s"ALTER TABLE $cur ADD COLUMNS (x$extra STRING)")
            // model unchanged: the widened column must stay NULL
          case Rename =>
            val next = s"${tbl}_r$step"
            graft.sql.GraftSql.exec(spark,
              s"ALTER TABLE $cur RENAME TO $next")
            cur = next
        }
        val rows = graft.table.GraftTable.read(spark, root).collect()
        val got = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got == model,
          s"run $run step $step ($op): SQL surface diverged from model " +
            s"(missing=${(model.keySet -- got.keySet).toSeq.sorted.take(5)}" +
            s" extra=${(got.keySet -- model.keySet).toSeq.sorted.take(5)})")
        assert(rows.forall(r =>
          (2 until 2 + extra).forall(r.isNullAt)),
          s"run $run step $step ($op): an ALTER-added column was written")
      }
    }
  }

  test("z-order Morton code: decodes back to its inputs (2, 3 and 4 dims)") {
    // the Column bit-interleave must be a bijection on 16-bit inputs —
    // a wrong shift would silently coarsen clustering (files still
    // write, stats still prune, just worse), so no behavioral test
    // catches it; the round-trip does. One Spark job evaluates the
    // deployed Column over random tuples; a pure Scala mirror decodes.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def decode(z: Long, n: Int, k: Int): Long =
      (0 until graft.table.GraftTable.zBits(n))
        .map(i => ((z >> (i * n + (n - 1 - k))) & 1L) << i).sum
    val pairs = samples(Gen.zip(Gen.chooseNum(0L, 65535L),
      Gen.chooseNum(0L, 65535L)), 200)
    val z2 = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.table.GraftTable.zValue(Seq(col("a"), col("b"))).as("z"))
      .collect()
    z2.foreach { r =>
      assert(decode(r.getLong(2), 2, 0) == r.getLong(0) &&
        decode(r.getLong(2), 2, 1) == r.getLong(1),
        s"2-dim z ${r.getLong(2)} did not decode to ${(r.getLong(0), r.getLong(1))}")
    }
    val triples = samples(Gen.zip(Gen.chooseNum(0L, 65535L),
      Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)), 200)
    val z3 = triples.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        graft.table.GraftTable.zValue(
          Seq(col("a"), col("b"), col("c"))).as("z"))
      .collect()
    z3.foreach { r =>
      (0 until 3).foreach { k =>
        assert(decode(r.getLong(3), 3, k) == r.getLong(k),
          s"3-dim z ${r.getLong(3)} slot $k decode mismatch")
      }
    }
    // 4 dims use 15 bits/dim: a 16-bit interleave would land column 0's
    // bit 15 on the SIGN bit and signed range partitioning would swap
    // the two halves of z-space (ADVICE r6) — so also assert the code
    // stays non-negative at the max input
    val quadMax = (1L << 15) - 1
    val quads = samples(Gen.zip(Gen.chooseNum(0L, quadMax),
      Gen.chooseNum(0L, quadMax), Gen.chooseNum(0L, quadMax),
      Gen.chooseNum(0L, quadMax)), 200) :+ ((quadMax, quadMax, quadMax, quadMax))
    val z4 = quads.toDF("a", "b", "c", "d")
      .select(col("a"), col("b"), col("c"), col("d"),
        graft.table.GraftTable.zValue(
          Seq(col("a"), col("b"), col("c"), col("d"))).as("z"))
      .collect()
    z4.foreach { r =>
      assert(r.getLong(4) >= 0L, s"4-dim z ${r.getLong(4)} hit the sign bit")
      (0 until 4).foreach { k =>
        assert(decode(r.getLong(4), 4, k) == r.getLong(k),
          s"4-dim z ${r.getLong(4)} slot $k decode mismatch")
      }
    }
  }

  test("PII scrub: idempotent, Luhn-selective, token-safe on generated " +
      "mixtures") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // strings interleaving clean words with every detector's true and
    // near-miss forms; one Spark pass scrubs 200 of them twice
    val word = Gen.oneOf("alpha", "bravo", "Carlo", "DE", "4111", "x99")
    val pii = Gen.oneOf(
      Gen.const("bob.smith@mail.example"),
      Gen.const("555-0199"),
      Gen.const("DE44000000000000123456"),
      Gen.oneOf(ops.Llm.PiiTestCards),        // Luhn-valid: must vanish
      Gen.const(ops.Llm.PiiBadCard),          // card-shaped, bad checksum
      Gen.const("555-12"),                    // phone near-miss
      Gen.const("DE1")                        // iban near-miss
    )
    val mix = Gen.listOfN(10, Gen.frequency(3 -> word, 2 -> pii))
      .map(_.mkString(" "))
    val inputs = samples(mix, 200)
    val out = inputs.toDF("s")
      .select(col("s"), ops.Llm.piiScrub(col("s")).as("once"))
      .select(col("s"), col("once"),
        ops.Llm.piiScrub(col("once")).as("twice"))
      .collect()
    out.foreach { r =>
      val (s, once, twice) =
        (r.getString(0), r.getString(1), r.getString(2))
      assert(once == twice, s"scrub not idempotent on: $s\n -> $once")
      ops.Llm.PiiTestCards.foreach(c =>
        assert(!once.contains(c), s"valid card $c survived in: $once"))
      assert(!once.contains("@"), s"email survived in: $once")
      assert(!s.contains(ops.Llm.PiiBadCard) ||
        once.contains(ops.Llm.PiiBadCard),
        s"Luhn-invalid number was wrongly redacted: $s -> $once")
    }
    // the near-misses must pass through untouched (no over-redaction)
    val misses = Seq("call 555-12 now", "DE1 is a code", "word alpha",
      "ref 41111111111111119 stays") // 17 digits: contains a valid card's
    val kept = misses.toDF("s")      // digits but is NOT a candidate
      .select(ops.Llm.piiScrub(col("s")).as("c")).collect().map(_.getString(0))
    assert(kept.toSeq == misses, s"near-misses altered: ${kept.toSeq}")
    // and a candidate NEXT TO a longer digit run redacts only itself
    val both = Seq("pay 4111111111111111 ref 41111111111111119").toDF("s")
      .select(ops.Llm.piiScrub(col("s")).as("c")).head().getString(0)
    assert(both == "pay <CARD> ref 41111111111111119",
      s"boundary-less card replace corrupted neighbors: $both")
  }

  test("length-bucketed packing: non-final bins are exactly full, fill " +
      "bounded by the bucket ladder, bin count monotone as the corpus " +
      "grows") {
    import spark.implicits._
    def L(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i).toString.toLong
    val lenGen = Gen.frequency(8 -> Gen.choose(1, 150),
      3 -> Gen.choose(151, 2048), 1 -> Gen.choose(2049, 3000))
    def pack(rows: Seq[(String, Long, Long, Long)]) =
      ops.Llm.packBucketsOf(rows.toDF("lang", "shard", "doc_id", "tok"))
        .collect()
        .map(r => ((r.getString(0), L(r, 1), L(r, 2)),
          (L(r, 3), L(r, 4), L(r, 5), L(r, 6))))
    for ((lens, run) <- samples(Gen.listOfN(120, lenGen), 2).zipWithIndex) {
      val base = lens.zipWithIndex.map { case (t, i) =>
        (if (i % 2 == 0) "en" else "de", (i / 40).toLong, i.toLong, t.toLong)
      }
      val packed = pack(base)
      assert(packed.map(_._2._2).sum == 120L,
        s"run $run: every doc lands in exactly one bin")
      for (((_, _, bucket), bins) <- packed.groupBy(_._1)) {
        val k = 2048L / bucket
        val byBin = bins.map(_._2).sortBy(_._1)
        // bins are contiguous from 0 and every non-final one is exactly
        // full — the closed-form BFD-within-bucket guarantee
        assert(byBin.map(_._1).toSeq == byBin.indices.map(_.toLong),
          s"run $run bucket $bucket: bins not contiguous")
        byBin.dropRight(1).foreach { case (bin, n, _, _) =>
          assert(n == k, s"run $run bucket $bucket bin $bin: $n != $k")
        }
        assert(byBin.last._2 <= k)
        if (bucket < 2048L) byBin.foreach { case (bin, _, sumTok, fill) =>
          assert(sumTok <= k * bucket && fill <= 10000L,
            s"run $run bucket $bucket bin $bin overfilled: " +
              s"$sumTok tok, $fill bp")
        }
      }
      // monotone fill: growing the corpus can only keep or add bins per
      // (lang, shard, bucket) — never repack into fewer
      val extra = (0 until 30).map { i =>
        (if (i % 2 == 0) "en" else "de", (i % 3).toLong, 1000L + i,
          (17L + i * 13L) % 900L + 1L)
      }
      val grown = pack(base ++ extra)
      def binCount(p: Array[((String, Long, Long), (Long, Long, Long, Long))])
          : Map[(String, Long, Long), Int] =
        p.groupBy(_._1).map { case (g, bs) => g -> bs.length }
      val before = binCount(packed)
      val after = binCount(grown)
      before.foreach { case (g, n) =>
        assert(after.getOrElse(g, 0) >= n,
          s"run $run: group $g lost bins when the corpus grew")
      }
    }
  }

  test("jaccard formula: symmetric, reflexive, bounded") {
    def jac(x: Set[String], y: Set[String]): Double =
      if (x.isEmpty && y.isEmpty) 1.0
      else x.intersect(y).size.toDouble / x.union(y).size
    for (Seq(a, b) <- samples(Gen.listOfN(2, tokenGen), 100)) {
      val (sa, sb) = (a.toSet, b.toSet)
      assert(jac(sa, sb) == jac(sb, sa))
      assert(jac(sa, sa) == 1.0)
      assert(jac(sa, sb) >= 0.0 && jac(sa, sb) <= 1.0)
    }
  }

  test("substr dedup conserves tokens: kept + 16·dropped == doc total; " +
      "a corpus with no repeated full window drops nothing") {
    import spark.implicits._
    val W = ops.Llm.SubstrW
    // random corpora from a tiny vocab: repeats of full 16-token windows
    // DO occur across docs (vocab^16 is huge but shared prefixes are
    // generated deliberately below); conservation must hold regardless
    val docGen = Gen.listOfN(40, Gen.oneOf("a", "b", "c", "d"))
    for ((docs, round) <- samples(Gen.listOfN(6, docGen), 8).zipWithIndex) {
      val planted = docs.zipWithIndex.map { case (toks, i) =>
        // plant a shared window in half the docs so dedup genuinely fires
        val t = if (i % 2 == 0) (0 until W).map(j => s"p$j") ++ toks else toks
        (i.toLong, t.mkString(" "))
      }
      val out = ops.Llm.substrDedupOf(planted.toDF("doc_id", "text"))
        .collect()
      assert(out.length == planted.size, s"round $round lost a doc")
      out.foreach { r =>
        val total = planted(r.getLong(0).toInt)._2.split(" ", -1).length
        assert(r.getLong(3) + W * r.getLong(2) == total,
          s"round $round doc ${r.getLong(0)}: kept ${r.getLong(3)} + " +
            s"$W*${r.getLong(2)} dropped != $total")
      }
      // the planted window survives exactly once (min doc_id = 0)
      val dropped = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(dropped(0L) == 0L || planted.size < 2,
        s"round $round: survivor doc 0 lost its own first occurrence")
    }
    // distinct-token corpus: no full window can repeat → zero drops
    val uniq = (0 until 4).map { i =>
      (i.toLong, (0 until 40).map(j => s"u${i}_$j").mkString(" "))
    }
    assert(ops.Llm.substrDedupOf(uniq.toDF("doc_id", "text"))
      .agg(org.apache.spark.sql.functions.sum("n_dup_win")).head()
      .getLong(0) == 0L)
  }

  test("semantic dedup kernel: planted duplicates dedup to the min id " +
      "within their cluster; pair set equals brute force per cell") {
    import spark.implicits._
    def unit(seedVals: Seq[Double]): Array[Double] = {
      val n = math.sqrt(seedVals.map(x => x * x).sum)
      seedVals.map(_ / n).toArray
    }
    // two well-separated centroids; members jittered around each, plus
    // exact duplicates planted in both clusters
    val c0 = unit(Seq(1, 0, 0, 0)); val c1 = unit(Seq(0, 1, 0, 0))
    val base = Seq(
      1L -> unit(Seq(1, 0.1, 0, 0)), 2L -> unit(Seq(1, -0.1, 0, 0)),
      3L -> unit(Seq(1, 0.1, 0, 0)), // dup of 1 (same cluster)
      10L -> unit(Seq(0.1, 1, 0, 0)), 11L -> unit(Seq(-0.1, 1, 0, 0)),
      12L -> unit(Seq(0.1, 1, 0, 0)), // dup of 10
      20L -> unit(Seq(0, 1, 0.9, 0))) // cluster-1 outlier, no dup
    val out = ops.Llm.semDedupOf(base.toDS(),
      Array(0L -> c0, 1L -> c1), tau = 0.999)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2)))
      .toMap
    assert(out(1L)._2 && !out(3L)._2, s"dup of 1 must drop: $out")
    assert(out(10L)._2 && !out(12L)._2, s"dup of 10 must drop: $out")
    assert(Seq(2L, 11L, 20L).forall(out(_)._2), s"non-dups must survive: $out")
    // cluster assignment is nearest-centroid
    assert(Seq(1L, 2L, 3L).forall(out(_)._1 == 0))
    assert(Seq(10L, 11L, 12L, 20L).forall(out(_)._1 == 1))
    // pair set ⊇/⊆ brute force: recompute within-cell cos pairs in memory
    def cos(x: Array[Double], y: Array[Double]): Double =
      x.zip(y).map { case (a, b) => a * b }.sum /
        (math.sqrt(x.map(a => a * a).sum) * math.sqrt(y.map(a => a * a).sum))
    val cells = base.groupBy { case (id, v) =>
      if (cos(v, c0) >= cos(v, c1)) 0 else 1 }
    val bruteVictims = cells.values.flatMap { members =>
      for {
        (a, va) <- members; (b, vb) <- members
        if a < b && cos(va, vb) >= 0.999
      } yield b
    }.toSet
    assert(out.filterNot(_._2._2).keySet == bruteVictims,
      s"kernel victims must equal brute force: $out vs $bruteVictims")
  }

  test("MinHashAgg: merge is commutative/associative; reduce order-free") {
    val agg = graft.functions.MinHashAgg
    for (shingles <- samples(Gen.listOfN(6, Gen.alphaStr.suchThat(_.nonEmpty)), 50)) {
      val left = shingles.foldLeft(agg.zero)((b, s) => agg.reduce(b, s))
      val right = shingles.reverse.foldLeft(agg.zero)((b, s) => agg.reduce(b, s))
      assert(left.toSeq == right.toSeq, "reduce must be order-insensitive")
      val (xs, ys) = shingles.splitAt(3)
      val merged = agg.merge(
        xs.foldLeft(agg.zero)((b, s) => agg.reduce(b, s)),
        ys.foldLeft(agg.zero)((b, s) => agg.reduce(b, s)))
      assert(merged.toSeq == left.toSeq, "merge(partials) == sequential")
    }
  }

  test("MinHashAgg: bases colliding mod P agree in at most one slot " +
      "(two-residue decorrelation)") {
    // r8 ADVICE regression pin: with a single base-mod-P residue, two
    // shingles colliding mod P produced IDENTICAL values in every one of
    // the 64 slots. The two-residue transform guarantees any distinct
    // (r1, r2) pair collides in at most one slot (the slot condition is
    // linear in the seed index — MinHashAgg scaladoc). Drive the worst
    // case directly: per-base slot values for base vs base + k·P (forced
    // r1 collision) must differ in ≥ 63 of 64 slots.
    val agg = graft.functions.MinHashAgg
    def slots(base: Long): Seq[Long] = (0 until agg.K).map { i =>
      val r1 = base % agg.P
      val r2 = base % agg.P2
      (((r1 * agg.aOf(i)) % agg.P + (r2 * agg.a2Of(i)) % agg.P +
        agg.bOf(i)) % agg.P + agg.P) % agg.P
    }
    val gen = for {
      b <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
      k <- Gen.chooseNum(1L, 1000L)
    } yield (b, b + k * agg.P)
    for ((a, b) <- samples(gen, 100)) {
      val same = slots(a).zip(slots(b)).count { case (x, y) => x == y }
      assert(same <= 1,
        s"bases $a/$b (both ≡ ${a % agg.P} mod P) agree in $same slots")
    }
  }

  test("MinHash similarity estimates Jaccard on controlled overlap") {
    val agg = graft.functions.MinHashAgg
    def sig(ts: Seq[String]) = ts.foldLeft(agg.zero)((b, s) => agg.reduce(b, s))
    val base = (0 until 100).map(i => s"sh$i")
    val near = (0 until 90).map(i => s"sh$i") ++ (100 until 110).map(i => s"sh$i")
    val far = (200 until 300).map(i => s"sh$i")
    def est(a: Array[Long], b: Array[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    val nearEst = est(sig(base), sig(near))
    val farEst = est(sig(base), sig(far))
    assert(nearEst > 0.6, s"near-dup estimate $nearEst should be ~0.82")
    assert(farEst < 0.2, s"disjoint estimate $farEst should be ~0")
  }

  test("set-op algebra on generated data: (A union B) except B is subset of A") {
    import spark.implicits._
    for (Seq(a, b) <- samples(Gen.listOfN(2, Gen.listOf(Gen.choose(0, 20))), 5)) {
      val left = a.toDF("v").union(b.toDF("v")).except(b.toDF("v"))
        .collect().map(_.getInt(0)).toSet
      assert(left.subsetOf(a.toSet))
    }
  }

  test("skew salting: salted two-phase aggregation equals direct aggregation") {
    // the 100 TB skew recipe (SURVEY.md §7.5): spread a hot key over N
    // salts, partially aggregate per (key, salt), then merge — results must
    // be identical to the direct group-by. DECIMAL accumulation keeps the
    // equality exact (doubles would differ in sum order by construction).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val skewed = (1 to 20000).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i.toDouble / 100))
      .toDF("k", "v")
    val direct = skewed.groupBy("k")
      .agg(graft.util.Det.moneySum(col("v")).as("s"), count(lit(1)).as("n"))
    val salted = skewed
      .withColumn("salt", pmod(hash(monotonically_increasing_id()), lit(8)))
      .groupBy("k", "salt")
      .agg(sum(graft.util.Det.dec2(col("v"))).as("ps"), count(lit(1)).as("pn"))
      .groupBy("k")
      .agg(sum(col("ps")).cast("double").as("s"), sum(col("pn")).as("n"))
    assert(direct.exceptAll(salted).count() == 0 &&
      salted.exceptAll(direct).count() == 0)
  }

  test("union-by-name is column-permutation safe") {
    import spark.implicits._
    val d1 = Seq((1, "x"), (2, "y")).toDF("id", "s")
    val d2 = Seq(("z", 3)).toDF("s", "id")
    val u = d1.unionByName(d2).collect().map(r => (r.getInt(0), r.getString(1)))
    assert(u.toSet == Set((1, "x"), (2, "y"), (3, "z")))
  }

  test("pointer jumping resolves random forests exactly like the naive walk") {
    // the asana_task_roots algorithm: k doubling rounds cover depth 2^k.
    // Generate random forests (parent = some lower-numbered node or none),
    // which bounds depth at n and guarantees acyclicity, then compare
    // against a direct per-node walk.
    val forestGen = for {
      n <- Gen.choose(1, 40)
      parents <- Gen.sequence[Seq[Option[Int]], Option[Int]](
        (0 until n).map(i =>
          if (i == 0) Gen.const(None)
          else Gen.option(Gen.choose(0, i - 1))))
    } yield parents
    def walk(par: Seq[Option[Int]], i: Int): Int =
      par(i) match { case Some(p) => walk(par, p); case None => i }
    for (par <- samples(forestGen, 50)) {
      // pointer jumping in plain Scala, mirroring the DataFrame joins
      var cur = par.indices.map(i => par(i).getOrElse(i)).toArray
      val rounds = math.max(1,
        math.ceil(math.log(par.size.toDouble) / math.log(2)).toInt)
      for (_ <- 1 to rounds) cur = cur.map(r => cur(r))
      par.indices.foreach { i =>
        assert(cur(i) == walk(par, i),
          s"node $i resolved to ${cur(i)}, walk says ${walk(par, i)}")
      }
    }
  }

  test("slugify is idempotent (UDF stays SQL-replicable)") {
    val slug: String => String = x =>
      x.toLowerCase.replaceAll("[^a-z0-9]+", "-").replaceAll("^-|-$", "")
    for (s0 <- samples(Gen.asciiPrintableStr, 100)) {
      assert(slug(slug(s0)) == slug(s0))
    }
  }

  test("win_interp kernel equals a plain Scala reference on random " +
      "series (ties, no-obs, all-obs, null-value purchases)") {
    // random per-user event series with deliberate same-µs ties, users
    // with zero observations, users that are all observations, AND
    // purchases carrying a NULL value (r8 ADVICE: such a row must be a
    // GAP to interpolate across, matching the oracle's count(v) grouping,
    // never an observation emitting NULL). The reference walks the sorted
    // series with the same IEEE arithmetic; equality is exact.
    import spark.implicits._
    import java.sql.Timestamp
    val seriesGen = for {
      n <- Gen.chooseNum(1, 12)
      evs <- Gen.listOfN(n, for {
        t <- Gen.chooseNum(0L, 5L) // tiny range forces ts ties
        purchase <- Gen.oneOf(true, false)
        v <- Gen.frequency(
          4 -> Gen.chooseNum(1, 999).map(x => Some(x / 100.0)),
          1 -> Gen.const(Option.empty[Double]))
      } yield (t, purchase, v))
    } yield evs
    val users = samples(seriesGen, 40).zipWithIndex
    val rows = users.flatMap { case (evs, u) =>
      evs.zipWithIndex.map { case ((t, p, v), i) =>
        (u.toLong * 100 + i, u.toLong,
          new Timestamp(t * 1000), // seconds → distinct µs instants
          if (p) "purchase" else "view", v)
      }
    }
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = ops.Windows.interpOf(df)
      .select("event_id", "v_interp").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // reference: per user in (ts, event_id) order; an observation is a
    // purchase WITH a value — null-value purchases interpolate like gaps
    val expected = rows.groupBy(_._2).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3.getTime, e._1))
      var last = Option.empty[(Long, Double)] // (µs, v)
      val obsTimes = sorted.collect {
        case (id, _, ts, "purchase", Some(v)) => (id, ts.getTime * 1000L, v)
      }
      sorted.map { case (id, _, ts, tpe, vOpt) =>
        val t = ts.getTime * 1000L
        if (tpe == "purchase" && vOpt.isDefined) {
          last = Some((t, vOpt.get)); id -> vOpt
        } else {
          val next = obsTimes.find { case (nid, nt, _) =>
            nt > t || (nt == t && nid > id) }
          id -> ((last, next) match {
            case (Some((pt, pv)), Some((_, nt, nv))) if nt != pt =>
              Some(pv + (nv - pv) *
                ((t - pt).toDouble / (nt - pt).toDouble))
            case (Some((_, pv)), _) => Some(pv)
            case _ => None
          })
        }
      }
    }
    val drift = expected.collect {
      case (id, v) if got.get(id) != Some(v) => (id, v, got.get(id))
    }
    assert(drift.isEmpty, s"kernel/reference drift (first 5): " +
      s"${drift.take(5)}")
  }

  test("sketch re-aggregation stays bounded as data GROWS: incremental " +
      "HLL unions and CMS merges track the exact union at every step") {
    // the 100 TB re-aggregation claim (r8 verdict #6): a sketch built
    // per ingest batch and MERGED must answer the running union within
    // its bound at every growth step — not just on the final corpus.
    // Batches are disjoint slices of sf0.01 (hash on the key), unioned
    // cumulatively: batch 1 ≈ an sf0.001-sized base, batches 2..5 the
    // deltas of a growing table.
    import org.apache.spark.sql.functions._
    val li = graft.util.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_orderkey")).cache()
    try {
      li.count()
      val slices = (0 until 5).map(i =>
        li.where(pmod(hash(col("l_orderkey")), lit(5)) === i))
      // HLL: per-batch sketches, cumulative union via hll_union_agg
      val batchSketches = slices.map(_
        .agg(expr("hll_sketch_agg(l_orderkey, 12)").as("sk")))
      (1 to 5).foreach { k =>
        val est = batchSketches.take(k).reduce(_ union _)
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))"))
          .head().getLong(0)
        val exact = slices.take(k).reduce(_ union _)
          .distinct().count()
        assert(math.abs(est - exact).toDouble / exact < 0.15,
          s"HLL after $k batches: est $est vs exact $exact")
      }
      // CMS: per-batch binary sketches merged incrementally driver-side
      // (the mergeable-buffer contract); one-sided bound at every step:
      // exact ≤ estimate ≤ exact + ε·N_union
      val cmsBytes = slices.map(_
        .agg(expr("count_min_sketch(l_orderkey, 0.001d, 0.99d, 42)"))
        .head().getAs[Array[Byte]](0))
      def cmsOf(b: Array[Byte]) = org.apache.spark.util.sketch
        .CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))
      val probeKeys = li.limit(8).collect().map(_.getLong(0)).distinct
      var merged = cmsOf(cmsBytes.head)
      (1 to 5).foreach { k =>
        if (k > 1) merged = merged.mergeInPlace(cmsOf(cmsBytes(k - 1)))
        val union = slices.take(k).reduce(_ union _).cache()
        val n = union.count()
        val exact = union.groupBy("l_orderkey").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        union.unpersist()
        probeKeys.foreach { key =>
          val e = exact.getOrElse(key, 0L)
          val est = merged.estimateCount(Long.box(key))
          assert(est >= e && est <= e + (0.001 * n).ceil.toLong + 1,
            s"CMS after $k batches, key $key: est $est exact $e n $n")
        }
      }
    } finally li.unpersist()
  }

  test("graph budget arms agree on random graphs (pagerank + bfs + lpa)") {
    // the fixture pins one topology; random graphs add cycles, stars and
    // disconnected pieces. Each sample runs the full distributed loop
    // (8 checkpointed rounds), so samples are few — each IS a Spark job
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.chooseNum(2, 9)
      pairs <- Gen.someOf(
        for { a <- 0 until n; b <- (a + 1) until n } yield (a.toLong, b.toLong))
    } yield pairs.toSeq
    val cycle = (0L to 4L).map(i => (i, (i + 1) % 5)) // plus a fixed ring
    for (edges <- samples(edgeGen, 3) :+ cycle) {
      val sym = (edges ++ edges.map(_.swap)).distinct
        .toDF("v", "u")
      val prDriver = ops.Graph.pagerankOnSym(spark, sym, Long.MaxValue)
        .as[(Long, Long)].collect().toSeq
      val prDist = ops.Graph.pagerankOnSym(spark, sym, 0L)
        .as[(Long, Long)].collect().toSeq
      assert(prDriver == prDist, s"pagerank arms diverged on $edges")
      val bfsDriver = ops.Graph.bfsOnSym(spark, sym, Long.MaxValue)
        .as[(Long, Int)].collect().toSeq
      val bfsDist = ops.Graph.bfsOnSym(spark, sym, 0L)
        .as[(Long, Int)].collect().toSeq
      assert(bfsDriver == bfsDist, s"bfs arms diverged on $edges")
      // kcore takes the a<b edge list; assert both arms equal the naive
      // full-recompute peel (not just each other)
      val eDf = edges.toDF("a", "b")
      def peel(es: Set[(Long, Long)]): Set[(Long, Long)] = {
        val deg = es.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val next = es.filter(p => deg(p._1) >= 2 && deg(p._2) >= 2)
        if (next == es) es else peel(next)
      }
      val core = peel(edges.toSet)
      val want = core.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (v, xs) => (v, xs.size.toLong) }
        .toSeq.sorted
      for (budget <- Seq(Long.MaxValue, 0L)) {
        val got = ops.Graph.kcoreOf(spark, eDf, budget)
          .as[(Long, Long)].collect().toSeq
        assert(got == want, s"kcore budget=$budget diverged on $edges")
      }
      // lpa: both arms must equal an INDEPENDENT naive reference of the
      // 4 synchronous rounds (groupBy-formulated, not the driver arm's
      // HashMap) — max neighbor-label count, min label on ties.
      // NB budget 0 on an EMPTY sample still routes to the driver arm
      // (0 <= 0) — the fixed nonempty ring appended to the samples is
      // what guarantees the distributed path runs every time
      val symPairs = (edges ++ edges.map(_.swap)).distinct
      var lbl = symPairs.map(_._1).distinct.map(v => v -> v).toMap
      for (_ <- 1 to ops.Graph.LpaRounds) {
        // NB: .toSeq before mapping to (-count, label) — mapping the
        // Map directly would key by -count and silently collapse
        // equal-count labels (keeping an arbitrary one), breaking the
        // min-label tie-break this reference exists to check
        lbl = symPairs.groupBy(_._1).map { case (v, es) =>
          v -> es.map(e => lbl(e._2)).groupBy(identity).toSeq
            .map { case (l, xs) => (-xs.size, l) }.min._2
        }
      }
      val lpaWant = lbl.toSeq.sorted
      for (budget <- Seq(Long.MaxValue, 0L)) {
        val got = ops.Graph.lpaOf(spark, sym, budget)
          .as[(Long, Long)].collect().toSeq.sorted
        assert(got == lpaWant, s"lpa budget=$budget diverged on $edges")
      }
    }
  }

  test("dq_cusum closed form equals the recursive fold on random series") {
    // QualitySpec pins ONE planted drift; this proves the window-algebra
    // identity S_i = max(0, S_{i-1} + d_i) == prefix - min(0, min-prefix)
    // on arbitrary count series (random medians hit both even/odd lengths,
    // so the exact doubled-median path is exercised too). All series ride
    // in one DataFrame as distinct event types — a single Spark job.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val seriesGen = for {
      len <- Gen.chooseNum(5, 25)
      ns <- Gen.listOfN(len, Gen.chooseNum(1, 60))
    } yield ns
    val series = samples(seriesGen, 6).zipWithIndex
      .map { case (ns, i) => (s"t$i", ns) }
    assert(series.size >= 4)
    val start = java.time.LocalDate.of(2024, 3, 1)
    val rows = series.flatMap { case (t, ns) =>
      ns.zipWithIndex.flatMap { case (n, i) =>
        val day = start.plusDays(i.toLong)
        (1 to n).map(_ => (s"$day 00:00:00", t))
      }
    }
    val df = rows.toDF("tss", "event_type")
      .select(to_timestamp(col("tss")).as("ts"), col("event_type"))
    val byType = ops.Quality.dqCusumOf(df).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
      .groupBy(_._1) // dqCusumOf output is already day-ordered within type
    for ((t, ns) <- series) {
      val out = byType(t)
      assert(out.length == ns.length)
      // exact doubled median of integer counts, the Scala mirror
      val s = ns.sorted
      val med2 = if (ns.length % 2 == 1) 2L * s(ns.length / 2)
                 else s(ns.length / 2 - 1).toLong + s(ns.length / 2)
      var acc = 0L
      out.zip(ns).foreach { case ((_, n, m2, c2, alarm), nExp) =>
        assert(n == nExp && m2 == med2, s"$t: n=$n m2=$m2 want med2=$med2")
        acc = math.max(0L, acc + (2 * n - med2 - med2 / 5))
        assert(c2 == acc, s"$t: closed-form $c2 vs fold $acc")
        assert(alarm == (c2 > 2 * med2))
      }
    }
  }
}
