package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** §2-N data-quality ops. The oracle rows prove fixture-level equality,
  * but two of dq_check's five constraints count ZERO violations on the
  * fixture (no FK orphans, no domain breaches) — a check that never
  * fires is indistinguishable from a check wired to the wrong column.
  * These tests plant one violation of every class on synthetic tables
  * and assert the exact counts through the same kernel the query runs.
  */
class QualitySpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("dq_check kernel: every constraint fires on planted violations") {
    import spark.implicits._
    val cust = Seq(1L, 2L).toDF("c_custkey")
    // order 30 is an FK orphan (custkey 99); order 20 predates line 20's
    // ship date, order 10 does not
    val od = Seq(
      (10L, 1L, ts("1995-01-01 00:00:00")),
      (20L, 2L, ts("1995-06-01 00:00:00")),
      (30L, 99L, ts("1995-01-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    // duplicate (orderkey, linenumber) pair; qty 0 and 51 breach the
    // [1, 50] domain; discount 0.5 breaches [0, 0.1]; line of order 20
    // ships BEFORE its order date
    val li = Seq(
      (10L, 1, 5.0, 0.05, ts("1995-02-01 00:00:00")),
      (10L, 1, 7.0, 0.00, ts("1995-02-02 00:00:00")),
      (10L, 2, 0.0, 0.10, ts("1995-02-03 00:00:00")),
      (20L, 1, 51.0, 0.50, ts("1995-05-01 00:00:00")),
      (30L, 1, 3.0, 0.02, ts("1995-03-01 00:00:00")))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_shipdate")
    val got = ops.Quality.dqCheckOf(li, od, cust)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("orders_fk_customer") == ((1L, 3L)), s"fk: $got")
    assert(got("lineitem_pk_unique") == ((1L, 5L)), s"pk: $got")
    assert(got("lineitem_qty_domain") == ((2L, 5L)), s"qty: $got")
    assert(got("lineitem_disc_domain") == ((1L, 5L)), s"disc: $got")
    assert(got("lineitem_ship_after_order") == ((1L, 5L)), s"temporal: $got")
  }

  test("dq_reconcile kernel: a reconciled book is clean, drift counts " +
      "in exact cents, headers without lines are flagged") {
    import spark.implicits._
    // order 10 reconciles exactly: 100.00·(1−0.10)·(1+0.05) = 94.50;
    // order 20 is off by 2.37 (header 100.00 vs roll-up 97.63);
    // order 30 has no lines at all
    val od = Seq(
      (10L, 94.50, "1-URGENT"),
      (20L, 100.00, "1-URGENT"),
      (30L, 55.00, "2-HIGH"))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    val li = Seq(
      (10L, 100.00, 0.10, 0.05),
      (20L, 97.63, 0.00, 0.00))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val got = ops.Quality.dqReconcileOf(od, li).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("1-URGENT") == ((2L, 0L, 1L, 237L)),
      s"urgent bucket: $got — order 10 must reconcile, order 20 must " +
        "drift exactly 237 cents")
    assert(got("2-HIGH") == ((1L, 1L, 0L, 0L)),
      s"high bucket: $got — a header without lines is n_no_lines, " +
        "not a mismatch")
  }

  test("dq_check kernel: a clean dataset reports zero violations " +
      "with full checked counts") {
    import spark.implicits._
    val cust = Seq(1L).toDF("c_custkey")
    val od = Seq((10L, 1L, ts("1995-01-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq((10L, 1, 5.0, 0.05, ts("1995-02-01 00:00:00")))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_shipdate")
    val got = ops.Quality.dqCheckOf(li, od, cust)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.values.forall(_ == 0L), s"clean data flagged: $got")
    assert(got.size == 5)
  }

  test("dq_anomaly: alert equals exact driver-side z-square test; a " +
      "planted 10x-volume day alerts and normal days do not") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = ops.Quality.dq_anomaly(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(4)))
    val byType = rows.groupBy(_._1)
    byType.foreach { case (_, rs) =>
      val ns = rs.map(_._2)
      val c = ns.length.toLong
      val s0 = ns.sum
      val m2 = ns.map(n => n * n).sum
      rs.foreach { case (t, n, alert) =>
        val lhs = (n * c - s0) * (n * c - s0) * (c - 1)
        val rhs = 9L * c * (c * m2 - s0 * s0)
        assert(alert == (lhs > rhs), s"$t n=$n alert=$alert")
      }
    }
    // planted outlier: flat 14-day series with one 10x day must alert
    // exactly on that day. The series must be ≥ 11 days: the outlier
    // inflates the sample std it is scored against, capping |z| at
    // (c-1)/sqrt(c), which only exceeds 3 for c ≥ 11 (at c=15:
    // mean 32, std sqrt(2160), z = 168/46.5 ≈ 3.61).
    import spark.implicits._
    val ev = (1 to 14).flatMap(day => (1 to 20).map(i =>
      (f"2024-01-$day%02d 00:00:00", i))) ++
      (1 to 200).map(i => ("2024-01-15 00:00:00", i))
    val df = ev.toDF("tss", "i")
      .select(to_timestamp(col("tss")).as("ts"),
        lit("click").as("event_type"))
    df.createOrReplaceTempView("spec_anom_events")
    val out = ops.Quality.dqAnomalyOf(
      spark.table("spec_anom_events")).collect()
      .map(r => (r.getTimestamp(1).toString, r.getBoolean(4))).toMap
    assert(out("2024-01-15 00:00:00.0"), s"outlier day must alert: $out")
    assert(out.count(_._2) == 1, s"only the planted day alerts: $out")
  }

  test("dq_anomaly: counts past the int64 m2 wrap stay EXACT (decimal " +
      "accumulation), and a DECIMAL(38,0) overflow raises loudly " +
      "instead of emitting NULL alerts (r10 ADVICE)") {
    import spark.implicits._
    // n = 4e9/day: n*n = 1.6e19 wraps a LongType sum(n*n) (Long.Max
    // 9.2e18) but is exact in DECIMAL(38,0). 14 flat days + one 10x day
    // must alert exactly like the small-count twin above.
    val big = 4_000_000_000L
    val cnt = ((1 to 14).map(d => ("click", f"2024-01-$d%02d", big)) :+
      (("click", "2024-01-15", big * 10)))
      .toDF("event_type", "ds", "n")
      .select(col("event_type"), to_timestamp(col("ds")).as("day"),
        col("n"))
    val out = ops.Quality.dqAnomalyOfCounts(cnt).collect()
      .map(r => (r.getTimestamp(1).toString, r.getBoolean(4))).toMap
    assert(out("2024-01-15 00:00:00.0"),
      s"10x day at 4e10 events must alert: $out")
    assert(out.count(_._2) == 1, s"only the planted day alerts: $out")
    // cross-check EVERY row against exact BigInt arithmetic
    val ns = (1 to 14).map(_ => BigInt(big)) :+ BigInt(big) * 10
    val (c, s0, m2) = (BigInt(15), ns.sum, ns.map(n => n * n).sum)
    ns.zipWithIndex.foreach { case (n, i) =>
      val want = (n * c - s0).pow(2) * (c - 1) > 9 * c * (c * m2 - s0 * s0)
      assert(out(f"2024-01-${i + 1}%02d 00:00:00.0") == want, s"day ${i + 1}")
    }
    // overflow: day counts near Long.Max make c*m2 exceed 38 digits.
    // Under ANSI (this project's sessions) the decimal product itself
    // errors; under non-ANSI it nulls and the coalesce(raise_error)
    // guard fires. Either way the statement must FAIL LOUDLY, never
    // return NULL-vs-boolean divergence from the HUGEINT oracle.
    val over = Seq(("click", "2024-01-01", 8_000_000_000_000_000_000L),
      ("click", "2024-01-02", 9_000_000_000_000_000L))
      .toDF("event_type", "ds", "n")
      .select(col("event_type"), to_timestamp(col("ds")).as("day"),
        col("n"))
    val e = intercept[Exception] {
      ops.Quality.dqAnomalyOfCounts(over).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("dq_anomaly") ||
      m.contains("NUMERIC_VALUE_OUT_OF_RANGE")),
      s"expected a loud overflow failure, got: $e")
    // and the guard itself, under an explicitly non-ANSI scope
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val e2 = intercept[Exception] {
        ops.Quality.dqAnomalyOfCounts(over).collect()
      }
      assert(msgs(e2).exists(_.contains("dq_anomaly")),
        s"non-ANSI overflow must trip the raise_error guard, got: $e2")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("dq_mad: flags the short-series outlier the z-score cannot (a " +
      "single 10x day caps |z| at (c-1)/sqrt(c)), and equals a " +
      "driver-side median/MAD recomputation on the fixture") {
    import spark.implicits._
    // the 7-day contaminated series: z-score provably silent (max |z|
    // = 6/sqrt(7) < 3), MAD must alert on exactly the planted day
    val ev = (1 to 6).flatMap(day => (1 to 20).map(_ =>
      (s"2024-01-0$day 00:00:00", 0))) ++
      (1 to 200).map(_ => ("2024-01-07 00:00:00", 0))
    val df = ev.toDF("tss", "i")
      .select(to_timestamp(col("tss")).as("ts"),
        lit("click").as("event_type"))
    val mad = ops.Quality.dqMadOf(df).collect()
      .map(r => (r.getTimestamp(1).toString, r.getBoolean(5))).toMap
    assert(mad("2024-01-07 00:00:00.0"), s"MAD must flag the 10x day: $mad")
    assert(mad.count(_._2) == 1, s"only the planted day: $mad")
    val z = ops.Quality.dqAnomalyOf(df).collect()
      .map(r => (r.getTimestamp(1).toString, r.getBoolean(4))).toMap
    assert(!z.values.exists(identity),
      s"the z-score is provably silent on this series: $z")
    // fixture equality against a driver-side exact recomputation
    def medianX4(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) * 4 else (s(n / 2 - 1) + s(n / 2)) * 2
    }
    val madRows = ops.Quality.dq_mad(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    madRows.groupBy(_._1).foreach { case (t, rs) =>
      val ns = rs.map(_._2).toSeq
      val med4 = medianX4(ns)
      rs.foreach { case (_, n, med2, mad4, alert) =>
        assert(med2 * 2 == med4, s"$t med2 $med2 vs ${med4 / 2.0}")
        // dev4 values are even integers, so medianX4 of them is always
        // divisible by 4 and mad4 = median(dev4s) exactly
        val dev4s = ns.map(x => math.abs(x * 4 - med4))
        assert(mad4 == medianX4(dev4s) / 4, s"$t mad4 $mad4")
        val dev4 = math.abs(n * 4 - med4)
        assert(alert == (dev4 > 3 * mad4), s"$t n=$n")
      }
    }
  }

  test("dq_mad: EVEN-count interpolation stays exact — both medians " +
      "land mid-pair and still produce integer med2/mad4 (r9 " +
      "latent-divergence audit of the exactness claim)") {
    import spark.implicits._
    // 4 days, counts 1/2/4/8: median interpolates (2+4)/2 = 3 → med2=6;
    // dev4 = |4n-12| = 8,4,4,20 (even ints), median interpolates
    // (4+8)/2 = 6 = mad4 (integer, as the claim requires); alert bound
    // 3*mad4 = 18 → only the 8-count day (dev4=20) flags
    val ev = Seq(1 -> 1, 2 -> 2, 3 -> 4, 4 -> 8).flatMap {
      case (day, cnt) => (1 to cnt).map(_ => (s"2024-02-0$day 00:00:00", 0))
    }
    val df = ev.toDF("tss", "i")
      .select(to_timestamp(col("tss")).as("ts"),
        lit("click").as("event_type"))
    val rows = ops.Quality.dqMadOf(df).collect()
      .map(r => (r.getTimestamp(1).toString.take(10), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    assert(rows.forall(r => r._3 == 6L && r._4 == 6L),
      s"med2/mad4 must be the exact interpolated integers: $rows")
    assert(rows.map(r => r._1 -> r._5).toMap == Map(
      "2024-02-01" -> false, "2024-02-02" -> false,
      "2024-02-03" -> false, "2024-02-04" -> true), rows.toString)
  }

  test("dq_freshness: a 30-hour-stale type alerts with the exact hour " +
      "lag, the freshest type reads zero") {
    import spark.implicits._
    // fresh ends 2024-05-10 12:30; stale ends 30h10m earlier (whole-hour
    // trunc → 30); mid ends 5h30m earlier (→ 5, no alert)
    val ev = Seq(
      ("2024-05-10 12:30:00", "fresh"), ("2024-05-09 01:00:00", "fresh"),
      ("2024-05-09 06:20:00", "stale"), ("2024-05-08 09:00:00", "stale"),
      ("2024-05-10 07:00:00", "mid"))
      .toDF("tss", "event_type")
      .select(to_timestamp(col("tss")).as("ts"), col("event_type"))
    val rows = ops.Quality.dqFreshnessOf(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(rows("fresh") == ((2L, 0L, false)), s"fresh: ${rows("fresh")}")
    assert(rows("stale") == ((2L, 30L, true)), s"stale: ${rows("stale")}")
    assert(rows("mid") == ((1L, 5L, false)), s"mid: ${rows("mid")}")
    // fixture sanity: the globally freshest type reads exactly zero
    val f = ops.Quality.dq_freshness(spark, sf).collect()
      .map(r => (r.getLong(3), r.getBoolean(4)))
    assert(f.map(_._1).min == 0L, s"no zero-lag type: ${f.toSeq}")
  }

  test("dq_benford: conforming data zeroes every deviation, uniform and " +
      "missing digits land the exact mirror basis points") {
    import spark.implicits._
    val ref = Seq(1 -> 3010L, 2 -> 1761L, 3 -> 1249L, 4 -> 969L,
      5 -> 792L, 6 -> 669L, 7 -> 580L, 8 -> 512L, 9 -> 458L)
    def run(vals: Seq[Double]) =
      ops.Quality.dqBenfordOf(spark, vals.toDF("o_totalprice")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
    // exactly exp_bp rows per digit out of 10000 → obs == exp, dev == 0
    val conforming = ref.flatMap { case (d, bp) =>
      Seq.fill(bp.toInt)(d + 0.11)
    }
    val c = run(conforming)
    assert(c.map(_._1).toSeq == (1 to 9), s"digit spine broke: ${c.toSeq}")
    c.foreach { case (d, n, obs, exp, dev) =>
      assert(n == ref(d - 1)._2 && obs == exp && dev == 0L,
        s"conforming digit $d: n=$n obs=$obs exp=$exp dev=$dev")
    }
    // uniform digits: every share is 10000 div 9 = 1111 bp
    val u = run((1 to 9).flatMap(d => Seq.fill(40)(d + 0.11)).map(_.toDouble))
    u.foreach { case (d, n, obs, exp, dev) =>
      assert(n == 40L && obs == 1111L && dev == 1111L - exp,
        s"uniform digit $d: ${(d, n, obs, exp, dev)}")
    }
    // digits 4..9 absent: emitted with n = 0, obs 0, dev = -exp; the
    // negative amount counts by its MAGNITUDE's first digit (abs before
    // the string image — a leading '-' would null on Spark and ERROR on
    // DuckDB)
    val m = run(Seq(1.11, -2.11, 2.11, 3.11))
    assert(m.length == 9)
    m.filter(_._1 >= 4).foreach { case (d, n, obs, _, dev) =>
      assert(n == 0L && obs == 0L && dev == -ref(d - 1)._2,
        s"missing digit $d: ${(d, n, obs, dev)}")
    }
    assert(m.filter(_._1 <= 3).map(_._2).toSeq == Seq(1L, 2L, 1L))
    // fixture sanity: nine rows, counts conserve the table size
    val f = ops.Quality.dq_benford(spark, sf).collect()
    assert(f.length == 9)
    val total = graft.util.Tables.orders(spark, sf).count()
    assert(f.map(_.getLong(1)).sum == total)
  }

  test("dq_cusum: a sustained +30% drift the level detectors provably " +
      "miss accumulates to an alarm, and the closed form equals the " +
      "recursive max(0, S + d) fold") {
    import spark.implicits._
    // 40 noisy head days alternating 45/55 (a flat head degenerates
    // MAD to 0 and everything alarms), then 15 drifted days at 75:
    // median 55, MAD 10 → dev 20 < 3·MAD (silent), z ≈ 1.6 (silent),
    // but CUSUM accumulates (150 − 110 − 22) = 18/day → 270 > 220
    val start = java.time.LocalDate.of(2024, 1, 1)
    val ev = (0 until 55).flatMap { i =>
      val n = if (i < 40) (if (i % 2 == 0) 45 else 55) else 75
      val date = start.plusDays(i.toLong)
      (1 to n).map(_ => (s"$date 00:00:00", 0))
    }
    val df = ev.toDF("tss", "i")
      .select(to_timestamp(col("tss")).as("ts"),
        lit("click").as("event_type"))
    val rows = ops.Quality.dqCusumOf(df).collect()
      .map(r => (r.getTimestamp(1).toString.take(10), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .sortBy(_._1)
    // level detectors silent on every drifted day
    val z = ops.Quality.dqAnomalyOf(df).collect()
      .map(r => r.getBoolean(4))
    val m = ops.Quality.dqMadOf(df).collect().map(r => r.getBoolean(5))
    assert(!z.exists(identity) && !m.exists(identity),
      "the +30% drift must stay under both level detectors' bounds")
    // CUSUM alarms by the end of the drift
    assert(rows.last._5, s"CUSUM must alarm on sustained drift: " +
      s"${rows.takeRight(3).toSeq}")
    assert(!rows.head._5, "no alarm on the flat head")
    // closed form == the recursive fold, day by day
    val med2 = rows.head._3
    var s2 = 0L
    rows.foreach { case (day, n, _, cusum2, _) =>
      s2 = math.max(0L, s2 + (2 * n - med2 - med2 / 5))
      assert(cusum2 == s2, s"$day closed-form $cusum2 vs fold $s2")
    }
  }

  test("dq_schema kernel: every drift class fires — added, dropped, " +
      "retyped, kept, null-rate drift in exact bp; empty side = NULL bp") {
    import spark.implicits._
    val a = Seq(
      (1L, Some("x"), Some(1.0), Some(7)),
      (2L, None, None, Some(8)),
      (3L, Some("z"), Some(3.0), None),
      (4L, None, Some(4.0), Some(9)))
      .toDF("id", "s", "v", "gone")
    val b = Seq(
      (1L, Some(10), None, Some("n")),
      (2L, Some(20), Some(2.0), None))
      .toDF("id", "s", "v", "fresh")
    val got = ops.Quality.dqSchemaOf(a, b).collect().map { r =>
      def oi(i: Int) = if (r.isNullAt(i)) None else Some(r.getInt(i))
      def os(i: Int) = if (r.isNullAt(i)) None else Some(r.getString(i))
      (r.getString(0), r.getString(1), os(2), os(3), oi(4), oi(5), oi(6))
    }.toSeq
    assert(got == Seq(
      ("fresh", "added", None, Some("string"), None, Some(5000), None),
      ("gone", "dropped", Some("int"), None, Some(2500), None, None),
      ("id", "kept", Some("bigint"), Some("bigint"),
        Some(0), Some(0), Some(0)),
      ("s", "retyped", Some("string"), Some("int"),
        Some(5000), Some(0), Some(-5000)),
      ("v", "kept", Some("double"), Some("double"),
        Some(2500), Some(5000), Some(2500))), got.mkString("\n"))
    // a zero-row side is "no evidence", never "0 bp clean": bp_a and
    // every drift must be NULL, statuses still classify from the schema
    val empty = ops.Quality.dqSchemaOf(a.limit(0), b).collect()
    assert(empty.forall(r => r.isNullAt(4) && r.isNullAt(6)),
      "empty side must report NULL bp and NULL drift")
    assert(empty.map(_.getString(1)).sorted.toSeq ==
      Seq("added", "dropped", "kept", "kept", "retyped"))
  }
}
