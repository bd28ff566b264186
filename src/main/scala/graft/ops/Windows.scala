package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Det._

/** SURVEY.md §2-E: window functions — ranking, offset, running frames,
  * range frames, per-group top-k.
  *
  * Determinism: rank/dense_rank windows may order by a tied key (same rank
  * for peers — deterministic output); row_number/ntile windows always carry
  * a unique tiebreak. Window sums over money accumulate in DECIMAL.
  *
  * 100 TB posture: window partitions (order status, user, customer, brand)
  * are the shuffle keys — state per partition is bounded; nothing requires a
  * single global window.
  */
object Windows {

  val win_rank: Q = (s, d) => {
    val wTies = Window.partitionBy("o_orderstatus").orderBy(desc("o_totalprice"))
    val wUniq = Window.partitionBy("o_orderstatus")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders(s, d)
      .select(
        col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        rank().over(wTies).as("rnk"),
        dense_rank().over(wTies).as("drnk"),
        row_number().over(wUniq).as("rn"),
        ntile(4).over(wUniq).as("quartile"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  /** Skew-safe two-phase variant of [[win_rank]]: o_orderstatus has 3
    * distinct values, so the direct window funnels the whole table through
    * 3 tasks — a skew cliff at 100×. This plan ranges the order key into
    * value buckets (equal prices can never straddle a bucket, so tie groups
    * stay intact), ranks locally within (status, bucket) — bounded state,
    * parallelism = statuses × buckets — then adds per-bucket offsets from a
    * tiny (status × bucket) stats table joined back via broadcast. Output
    * is provably identical to the direct window (equality-tested per row in
    * WindowSaltSpec; same oracle SQL as win_rank). ntile is reconstructed
    * from the global row_number with Spark's exact bucket-size rule
    * (earlier tiles get the remainder). */
  val win_rank_salted: Q = (s, d) => {
    val wLocalTies = Window.partitionBy("o_orderstatus", "bkt")
      .orderBy(desc("o_totalprice"))
    val wLocalUniq = Window.partitionBy("o_orderstatus", "bkt")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val wOff = Window.partitionBy("st").orderBy(desc("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = orders(s, d)
      .withColumn("bkt", floor(col("o_totalprice") / 10000.0))
    val local = base.select(
      col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"), col("bkt"),
      rank().over(wLocalTies).as("lrnk"),
      dense_rank().over(wLocalTies).as("ldrnk"),
      row_number().over(wLocalUniq).as("lrn"))
    val stats = base
      .groupBy(col("o_orderstatus").as("st"), col("bkt").as("b"))
      .agg(count(lit(1)).as("cnt"), countDistinct("o_totalprice").as("nd"))
      .withColumn("rows_before", coalesce(sum("cnt").over(wOff), lit(0L)))
      .withColumn("dist_before", coalesce(sum("nd").over(wOff), lit(0L)))
      .withColumn("n_part", sum("cnt").over(Window.partitionBy("st")))
      .drop("cnt", "nd")
    local
      .join(broadcast(stats),
        col("o_orderstatus") === col("st") && col("bkt") === col("b"))
      .withColumn("rnk", (col("lrnk") + col("rows_before")).cast("int"))
      .withColumn("drnk", (col("ldrnk") + col("dist_before")).cast("int"))
      .withColumn("rn", (col("lrn") + col("rows_before")).cast("int"))
      .withColumn("quartile", expr(
        """CAST(CASE WHEN rn <= (n_part div 4 + 1) * (n_part % 4)
               THEN (rn - 1) div (n_part div 4 + 1) + 1
               ELSE n_part % 4
                    + (rn - 1 - (n_part div 4 + 1) * (n_part % 4))
                      div (n_part div 4) + 1
             END AS INT)"""))
      .select("o_orderstatus", "o_orderkey", "o_totalprice",
        "rnk", "drnk", "rn", "quartile")
      .orderBy("o_orderstatus", "o_orderkey")
  }

  /** Navigation functions over a FULL frame — first/last/nth of each
    * customer's order history: the frame is pinned to the whole partition
    * (unbounded/unbounded) so last_value is the true last rather than the
    * running default, and the order key carries a unique tiebreak.
    * nth_value(2) is null for single-order customers on both engines. */
  val win_nav: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val win_lag: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    events(s, d)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w)))
          .as("gap_sec"),
        lead("event_type", 1).over(w).as("next_type"))
      .orderBy("event_id")
  }

  /** LOCF gap-fill (forward fill): sparsify `value` to purchase events
    * only, then carry the last non-null observation forward per user in
    * (ts, event_id) total order — the time-series densification every
    * sensor/price pipeline runs. `last(ignoreNulls)` over a running ROWS
    * frame; the filled value is a raw parquet double (no arithmetic), so
    * output is bit-exact cross-engine with no rounding. Scale: state per
    * partition is one value; the shuffle key is user_id like every other
    * events window. */
  val win_fill: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("v", when(col("event_type") === "purchase", col("value")))
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("v"),
        last(col("v"), ignoreNulls = true).over(w).as("v_fill"))
      .orderBy("event_id")
  }

  val win_run: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double")
          .as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Bounded-ROWS moving frame (2 PRECEDING..CURRENT — the moving-sum/
    * average form): the third frame shape alongside win_run's unbounded
    * ROWS and win_range's RANGE. The (date, orderkey) order is total, so
    * the frame contents — and the DECIMAL sum — are deterministic; the
    * window count is emitted instead of a float average so no division
    * crosses engines. */
  val win_moving: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double")
          .as("mv_sum"),
        count(lit(1)).over(w).cast("int").as("n_win"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** 7-day trailing sum per user: RANGE frame over epoch seconds — peers at
    * the same second share the frame, so ties are deterministic. */
  val win_range: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("sec"))
      .rangeBetween(-604800L, 0L)
    events(s, d)
      .withColumn("sec", unix_timestamp(col("ts")))
      .select(
        col("event_id"), col("user_id"), col("sec"),
        sum(dec2(col("value"))).over(w).cast("double").as("trailing_7d"))
      .orderBy("event_id")
  }

  val win_topk: Q = (s, d) => {
    val w = Window.partitionBy("p_brand")
      .orderBy(desc("revenue"), asc("p_partkey"))
    // aggregate BEFORE the join (opt guide §2.3/§3): p_brand is
    // functionally determined by p_partkey, so grouping by l_partkey
    // alone yields the identical groups while the partial agg hashes a
    // single bigint key and the exchange carries 20 k rows, not the
    // brand string per lineitem; the broadcast join then probes the
    // aggregated relation instead of every lineitem row. revenue is
    // DECIMAL-accumulated (moneySum6) — order-independent, so the sums
    // are bit-identical to the join-first form.
    lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(moneySum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_partkey"), col("revenue"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .orderBy("p_brand", "rn")
  }

  /** Gap-based batch sessionization — the batch twin of the streaming
    * session_window queries (stream_session, asana_stories_sessions),
    * expressed with pure window functions so the DuckDB oracle can prove
    * it row-for-row: a session breaks when the gap to the previous event
    * exceeds 30 minutes; session ids are the running sum of break flags.
    * The gap compares epoch MICROseconds (unix_micros / epoch_us) — a
    * seconds-truncated gap flips sessions at exact half-hour boundaries.
    * (event_id tiebreak: same-µs events order deterministically.) At
    * scale this is two window passes + one agg over the SAME
    * user-partitioned shuffle — Catalyst reuses one Exchange. */
  val win_session: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id")
      .orderBy(asc("ts"), asc("event_id"))
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("brk",
        when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk"))
        .over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  /** distribution functions: percent_rank/cume_dist are tie-stable (peers
    * share a value), so the tied window needs no synthetic tiebreak — and
    * both are single divisions of identical small integers in either
    * engine, so the raw doubles are bit-identical and need NO round()
    * (float round() on ratios is the half-boundary divergence class). */
  val win_dist: Q = (s, d) => {
    val w = Window.partitionBy("o_orderstatus").orderBy(asc("o_totalprice"))
    orders(s, d)
      .select(
        col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  /** [[win_dist]] under the same skew treatment as [[win_rank_salted]]:
    * percent_rank/cume_dist funnel the whole table through 3 status
    * partitions; bucketing by price decomposes each into ~hundreds of
    * independent bucket-windows plus a tiny broadcast stats join.
    * percent_rank = (global rank − 1)/(n_part − 1) from the bucket-local
    * rank + rows before the bucket; cume_dist = (rows_before + rows ≤
    * current within the bucket)/n_part, where the local ≤-count is
    * count(1) over the default RANGE frame (ties included) — buckets
    * partition the VALUE axis, so every earlier bucket is strictly below.
    * Bit-identical doubles to win_dist: both engines end at one IEEE
    * division of the same integers, so the oracle IS win_dist's. */
  val win_dist_salted: Q = (s, d) => {
    val wLocal = Window.partitionBy("o_orderstatus", "bkt")
      .orderBy(asc("o_totalprice"))
    val wOff = Window.partitionBy("st").orderBy(asc("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = orders(s, d)
      .withColumn("bkt", floor(col("o_totalprice") / 10000.0))
    val local = base.select(
      col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"), col("bkt"),
      rank().over(wLocal).as("lrnk"),
      count(lit(1)).over(wLocal).as("lle"))
    val stats = base
      .groupBy(col("o_orderstatus").as("st"), col("bkt").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rows_before", coalesce(sum("cnt").over(wOff), lit(0L)))
      .withColumn("n_part", sum("cnt").over(Window.partitionBy("st")))
      .drop("cnt")
    local
      .join(broadcast(stats),
        col("o_orderstatus") === col("st") && col("bkt") === col("b"))
      .withColumn("pct_rank",
        when(col("n_part") === 1, lit(0.0))
          .otherwise((col("rows_before") + col("lrnk") - 1).cast("double")
            / (col("n_part") - 1).cast("double")))
      .withColumn("cume",
        (col("rows_before") + col("lle")).cast("double")
          / col("n_part").cast("double"))
      .select("o_orderstatus", "o_orderkey", "o_totalprice",
        "pct_rank", "cume")
      .orderBy("o_orderstatus", "o_orderkey")
  }

  /** Ordered-stage funnel over the event stream: per user, the first
    * view, the first click strictly AFTER that view, and the first
    * purchase strictly after that click — depth = how far the user got,
    * in order (a purchase before any view does NOT count; that ordering
    * is what distinguishes a funnel from three filters). Stage-at-a-time
    * conditional min-aggregations, each a partial-agg shuffle on
    * user_id — per-user state is one timestamp per stage, bounded at any
    * scale, and every stage joins on the SAME key so the exchanges
    * reuse. Fixture timestamps are µs-exact in both engines (checked:
    * zero sub-µs components), so the strict > compares identically. */
  val win_funnel: Q = (s, d) => {
    val ev = events(s, d).select("user_id", "event_type", "ts")
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("first_view"))
    val c = ev.where(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .where(col("ts") > col("first_view"))
      .groupBy("user_id").agg(min("ts").as("first_click"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .where(col("ts") > col("first_click"))
      .groupBy("user_id").agg(min("ts").as("first_purchase"))
    v.join(c.select(col("user_id").as("cu"), col("first_click")),
        col("user_id") === col("cu"), "left")
      .join(p.select(col("user_id").as("pu"), col("first_purchase")),
        col("user_id") === col("pu"), "left")
      .select(col("user_id"),
        when(col("first_purchase").isNotNull, 3)
          .when(col("first_click").isNotNull, 2)
          .otherwise(1).as("depth"),
        col("first_view"))
      .orderBy("user_id")
  }

  /** Gaps-and-islands (r8): runs of CONSECUTIVE active calendar days per
    * user — the classic date-minus-row_number grouping (the anchor
    * `dt - rn` is constant exactly while days are consecutive). One
    * window on (user, date) + one group-by; shuffle key is the user —
    * nothing global, the 100 TB shape. DATE results cast to TIMESTAMP on
    * both engines (repo invariant: DuckDB DATE and Spark DATE hash
    * differently through the driver compare). */
  val dt_gaps_islands: Q = (s, d) => {
    val days = events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("dt")).distinct()
    val w = Window.partitionBy("user_id").orderBy("dt")
    days.withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"), date_sub(col("dt"), col("rn")).as("anchor"))
      .agg(min("dt").as("s"), max("dt").as("e"), count(lit(1)).as("days"))
      .select(col("user_id"),
        col("s").cast("timestamp").as("island_start"),
        col("e").cast("timestamp").as("island_end"), col("days"))
      .orderBy("user_id", "island_start")
  }

  /** Sequence-pattern matching (r8, MATCH_RECOGNIZE-lite): each user's
    * event history becomes an ordered symbol string (deterministic
    * (ts, event_id) order via array_sort over structs — collect_list
    * order alone is not reproducible across partitionings), then the
    * funnel pattern `v c+ p` counts non-overlapping regex matches — the
    * sequential-pattern op that per-row window functions can't express.
    * The pattern stays in the intersection of Java and DuckDB regex
    * semantics (literal symbols + greedy +, no backrefs). Per-user state
    * is one bounded string; the shuffle key is the user. */
  val win_pattern: Q = (s, d) => winPattern(s, d)

  /** symbol coding shared by both [[winPattern]] arms. */
  private def patternCoded(ev: org.apache.spark.sql.DataFrame) =
    ev.withColumn("sym",
      when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .when(col("event_type") === "purchase", "p")
        .when(col("event_type") === "signup", "s")
        .otherwise("e"))

  /** direct arm: the whole history as one string per user (bounded on
    * the fixtures — ≤ ~100 events/user). */
  private[graft] def patternArray(coded: org.apache.spark.sql.DataFrame) =
    coded.groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
        col("sym")))).as("seq"))
      .select(col("user_id"),
        concat_ws("", expr("transform(seq, x -> x.sym)")).as("sq"))
      .select(col("user_id"), length(col("sq")).as("seq_len"),
        regexp_count(col("sq"), lit("vc+p")).as("funnels"))
      .orderBy("user_id")

  /** escalated arm (r9 — the mega-key posture the r8 verdict asked
    * for): instead of materializing one giant symbol string per user,
    * secondary-sort the rows (repartition by user + external sort — no
    * per-key array ever exists) and run the `v c+ p` match as a 3-state
    * FSM with O(1) state per user, streaming over the sorted iterator —
    * the mapGroupsWithState twin's logic applied batch-side. The FSM
    * counts EXACTLY what `regexp_count(sq, 'vc+p')` counts: a
    * left-to-right non-overlapping match needs `v`, a maximal nonempty
    * `c` run, then `p` (greedy `c+` backtracks only into more `c`s, so
    * the only viable `p` is the one after the maximal run) — fuzzed
    * against java.util.regex in OperatorSpec, and the full operator is
    * arm-equality-tested on a synthetic mega-key fixture. */
  private[graft] def patternStreamed(coded: org.apache.spark.sql.DataFrame) = {
    val sp = coded.sparkSession
    import sp.implicits._
    coded.select(col("user_id"), col("ts"), col("event_id"), col("sym"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .repartition(col("user_id"))
      .sortWithinPartitions(asc("user_id"), asc("ts"), asc("event_id"))
      .mapPartitions { it =>
        val b = it.buffered
        new Iterator[(Long, Int, Int)] {
          def hasNext: Boolean = b.hasNext
          def next(): (Long, Int, Int) = {
            val u = b.head._1
            var len = 0; var funnels = 0
            var st = 0 // 0 idle, 1 seen-v, 2 in-c-run
            while (b.hasNext && b.head._1 == u) {
              val sym = b.next()._4
              len += 1
              st = sym match {
                case "v" => 1
                case "c" => if (st >= 1) 2 else 0
                case "p" => if (st == 2) { funnels += 1; 0 } else 0
                case _   => 0
              }
            }
            (u, len, funnels)
          }
        }
      }
      .toDF("user_id", "seq_len", "funnels")
      .orderBy("user_id")
  }

  /** [[win_pattern]] dispatch with the capSource-style count probe: the
    * max per-user history size (memoized per application × sfDir,
    * shared with [[winEma]] — same table, same key) picks the arm. */
  private[graft] def winPattern(s: org.apache.spark.sql.SparkSession,
      d: String, histThreshold: Long = ArrayHistThreshold)
      : org.apache.spark.sql.DataFrame = {
    val coded = patternCoded(events(s, d))
    if (maxUserHistory(s, d) <= histThreshold) patternArray(coded)
    else patternStreamed(coded)
  }

  /** Exponential moving average (r8): per-user EMA over the event value
    * series, α = 0.25 — the recursive smoother no fixed window frame can
    * express (each output depends on the ENTIRE prefix). Implemented as
    * a left fold with the `aggregate` HOF over the deterministically
    * ordered value array (array_sort on (ts, event_id, value) structs);
    * seeded DuckDB-style with the first element so both engines fold the
    * identical sequence. α and 1-α are exact binary fractions (0.25,
    * 0.75) and both engines execute the same IEEE double ops in the same
    * order, so the result is BIT-IDENTICAL — the oracle compares the raw
    * double, no rounding. Per-user state is one bounded array; at scale
    * the streaming twin is a mapGroupsWithState running value. */
  val win_ema: Q = (s, d) => winEma(s, d)

  /** direct arm: fold over the collected value array. */
  private[graft] def emaArray(ev: org.apache.spark.sql.DataFrame) =
    ev
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
        col("value")))).as("seq"))
      .select(col("user_id"),
        expr("transform(seq, x -> x.value)").as("vals"))
      .select(col("user_id"), size(col("vals")).as("n_events"),
        expr("aggregate(slice(vals, 2, size(vals) - 1), vals[0], " +
          "(acc, x) -> acc * 0.75D + x * 0.25D)").as("ema"))
      .orderBy("user_id")

  /** escalated arm (r9): secondary sort + one sequential pass per
    * partition with O(1) running state — no per-user array is ever
    * materialized, so one mega-key user cannot blow an executor at
    * 100×. The fold runs in EXACTLY the direct arm's order (seeded with
    * the first value, then acc·0.75 + x·0.25 per element over the same
    * (ts, event_id) total order), so the emitted doubles are
    * BIT-IDENTICAL to the array fold — asserted, not approximated, by
    * the arm-equality test. Values are non-null on this table (events
    * fixture; the array arm would null-poison the same user anyway). */
  private[graft] def emaStreamed(ev: org.apache.spark.sql.DataFrame) = {
    val sp = ev.sparkSession
    import sp.implicits._
    ev.select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .repartition(col("user_id"))
      .sortWithinPartitions(asc("user_id"), asc("ts"), asc("event_id"))
      .mapPartitions { it =>
        val b = it.buffered
        new Iterator[(Long, Int, Double)] {
          def hasNext: Boolean = b.hasNext
          def next(): (Long, Int, Double) = {
            val u = b.head._1
            var n = 0; var acc = 0.0
            while (b.hasNext && b.head._1 == u) {
              val v = b.next()._4
              acc = if (n == 0) v else acc * 0.75 + v * 0.25
              n += 1
            }
            (u, n, acc)
          }
        }
      }
      .toDF("user_id", "n_events", "ema")
      .orderBy("user_id")
  }

  /** Collected-array histories are fine into the ~10⁶ range (tens of MB
    * per key); past that the streamed arm must take over. */
  private[graft] val ArrayHistThreshold = 1000000L

  /** max events per user, memoized per application × sfDir (one probe
    * serves both [[winEma]] and [[winPattern]]). */
  private def maxUserHistory(s: org.apache.spark.sql.SparkSession,
      d: String): Long =
    graft.util.Probes.memoProbe(s, d, "win_user_hist") {
      val r = events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("__n")).agg(max("__n")).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }

  /** [[win_ema]] dispatch: count probe picks the arm (test seam —
    * `histThreshold = 0` forces the streamed path on fixtures). */
  private[graft] def winEma(s: org.apache.spark.sql.SparkSession,
      d: String, histThreshold: Long = ArrayHistThreshold)
      : org.apache.spark.sql.DataFrame = {
    val ev = events(s, d)
    if (maxUserHistory(s, d) <= histThreshold) emaArray(ev)
    else emaStreamed(ev)
  }

  /** Linear interpolation gap-fill (r8) — the counterpart to win_fill's
    * LOCF: sparsify `value` to purchase observations, then fill each gap
    * row from its straddling observations, weighted by time:
    * v = pv + (nv − pv) · (t − pt)/(nt − pt), over exact integer µs
    * epochs. The single IEEE division/multiply/add sequence is written
    * identically in both engines over identical integer operands, so the
    * doubles are BIT-IDENTICAL (raw compare, no rounding). Before the
    * first observation → NULL; after the last → LOCF; a same-µs-ts
    * neighbor pair (nt = pt) falls back to LOCF rather than divide by
    * zero. Spark side: last/first(ignoreNulls) over running/inverted
    * frames — one user-keyed shuffle, constant per-row state, the same
    * scale shape as win_fill. */
  val win_interp: Q = (s, d) => interpOf(events(s, d))

  /** kernel of [[win_interp]] — PropertySpec fuzzes it against a plain
    * Scala reference on random series (same-µs ties, observation-free
    * users, all-observation users) beyond the fixture's shapes. */
  private[graft] def interpOf(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev
      // the value guard matches the oracle's count(v)-style grouping,
      // which skips NULL v: a purchase row with a NULL value is a GAP to
      // interpolate across, not an observation emitting NULL (r8 ADVICE —
      // struct(t, null) is non-null, so without the guard it would become
      // a LOCF/interp boundary)
      .withColumn("obs",
        when(col("event_type") === "purchase" && col("value").isNotNull,
          struct(unix_micros(col("ts")).as("t"), col("value").as("v"))))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"), col("obs"),
        last(col("obs"), ignoreNulls = true).over(wPrev).as("p"),
        first(col("obs"), ignoreNulls = true).over(wNext).as("n"))
      .select(col("event_id"), col("user_id"),
        col("obs.v").as("v"),
        when(col("obs").isNotNull, col("obs.v"))
          .when(col("p").isNotNull && col("n").isNotNull &&
              col("n.t") =!= col("p.t"),
            col("p.v") + (col("n.v") - col("p.v")) *
              ((col("t") - col("p.t")).cast("double") /
                (col("n.t") - col("p.t")).cast("double")))
          .when(col("p").isNotNull, col("p.v"))
          .otherwise(lit(null).cast("double")).as("v_interp"))
      .orderBy("event_id")
  }

  /** Ratio-to-report (r8): each order's share of its customer's total
    * spend — the share-of-total analytic (budget attribution, revenue
    * mix). The ratio is emitted as INTEGER BASIS POINTS computed with
    * `div` over exact DECIMAL-derived cent amounts (`cents * 10000 div
    * sum(cents)`), per the repo invariant: a float round() on a
    * composite ratio flips at half boundaries between engines, integer
    * division cannot. Scale: one window over bounded o_custkey
    * partitions; under skew the same number decomposes into a per-key
    * total (two-phase agg) broadcast back — the win_rank_salted
    * pattern. */
  val win_share: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
    orders(s, d)
      .withColumn("cents", (dec2(col("o_totalprice")) * 100).cast("long"))
      .withColumn("tot", sum(col("cents")).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        expr("CAST(cents * 10000 div tot AS INT)").as("share_bp"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** The skew decomposition [[win_share]]'s scaladoc documents, as a
    * real row (r11 verdict residual nit): the per-customer total is a
    * TWO-PHASE aggregation — 8-way salted partials on the unique order
    * key, then a per-customer roll-up — joined back to the rows, so no
    * single window partition ever materializes a hot customer's full
    * row set (the win_rank_salted discipline applied to
    * ratio-to-report). The totals relation is |customers|-sized —
    * broadcast here; at a scale where even that side is big, drop the
    * hint and let the join shuffle (the arithmetic is unchanged).
    * Values are identical to win_share by construction (same integer
    * cents, ONE division at the end), so the oracle is the DIRECT
    * window replay — a green row proves decomposed ≡ direct. */
  val win_share_salted: Q = (s, d) => {
    val base = orders(s, d)
      .withColumn("cents", (dec2(col("o_totalprice")) * 100).cast("long"))
    val totals = base
      .groupBy(col("o_custkey").as("ck"), (col("o_orderkey") % 8).as("salt"))
      .agg(sum(col("cents")).as("part"))
      .groupBy("ck").agg(sum(col("part")).as("tot"))
    base.join(broadcast(totals), col("o_custkey") === col("ck"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        expr("CAST(cents * 10000 div tot AS INT)").as("share_bp"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Trailing 7-day rolling distinct-user count per day (rolling DAU /
    * WAU) — the distinct-over-frame no window function expresses
    * (COUNT(DISTINCT) OVER a moving frame exists in neither engine).
    * Formulated as the scalable fan-out: each distinct (user, day)
    * presence contributes to the CONSTANT 7 trailing windows it falls
    * in (explode of a 7-element day sequence — map-side, no range
    * join whose match width grows with the window), then one distinct
    * aggregation per day. Days are emitted exactly when some activity
    * occurred in their trailing week and never past the last observed
    * day (1-row broadcast clip); a silent 7+-day stretch yields no row
    * — both engines encode the identical rule. At 100 TB: 7× row
    * fan-out into a (day, user) distinct — partial-aggregates
    * map-side; window width w costs w×, never |days|×|users|. */
  val win_rolling_distinct: Q = (s, d) => {
    val ud = events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("aday"))
      .distinct()
    val mx = ud.agg(max(col("aday")).as("max_day"))
    ud.select(col("user_id"),
        explode(expr(
          "sequence(aday, aday + interval 6 days, interval 1 day)"))
          .as("day"))
      .crossJoin(broadcast(mx))
      .where(col("day") <= col("max_day"))
      .groupBy("day")
      .agg(countDistinct(col("user_id")).as("dau7"))
      .orderBy("day")
  }

  /** The SKETCH-scale path of [[win_rolling_distinct]] — at 100 TB an
    * exact 7-day distinct union re-shuffles every (user, day) presence
    * 7×; the mergeable-sketch form aggregates each day's users into ONE
    * HLL sketch (Spark's DataSketches hll_sketch_agg, lgK 14 ≈ 0.4 %
    * RSE), fans out only the TINY (day, sketch) relation 7×, and
    * hll_union_agg + estimate per target day — re-aggregation over
    * growing data without touching raw rows again, the same mergeable
    * property PropertySpec proves for the HLL/CMS family. NO ORACLE by
    * design (sketch internals are engine-specific — pre-declared like
    * agg_approx/agg_hll_merge); bounded instead by a unit test against
    * the exact twin (≤ 2 % at both fixture SFs). */
  val win_rolling_distinct_hll: Q = (s, d) => {
    val daySketch = events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("aday"))
      .groupBy("aday")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    val mx = daySketch.agg(max(col("aday")).as("max_day"))
    daySketch
      .select(col("sk"),
        explode(expr(
          "sequence(aday, aday + interval 6 days, interval 1 day)"))
          .as("day"))
      .crossJoin(broadcast(mx))
      .where(col("day") <= col("max_day"))
      .groupBy("day")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("dau7_est"))
      .orderBy("day")
  }

  /** Peak concurrent sessions per day — the sweep-line classic: each
    * gap-sessionized interval (the [[win_session]] derivation verbatim)
    * emits +1 at its start and −1 at its end, a running sum over the
    * (ts, delta DESC) order is the live concurrency, and the per-day
    * max is the peak. Ends are INCLUSIVE: at an equal timestamp the +1
    * sorts first (delta DESC), so a session starting exactly when
    * another ends counts as overlap — the pinned tie rule both engines
    * share. Peer rows (equal ts, delta) assign running values in
    * arbitrary peer order, but their multiset — hence the day max — is
    * deterministic.
    *
    * The GLOBAL running sum is decomposed exactly like llm_token_budget
    * so no single task serializes the corpus: per-day deltas cumulate
    * over the tiny day table (one window over |days| rows), and each
    * day's offset broadcasts back onto a day-partitioned local running
    * sum; (day, ts) order ≡ global ts order since day prefixes ts. A
    * day a session merely SPANS (no start/end event) emits no row —
    * documented, identical in the oracle. */
  private val sessBuilt =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The sessionized (user_id, session_id, start_ts, end_ts) relation,
    * persisted once per (application, sfDir) — the identical 30-minute-
    * gap derivation [[win_session]] demonstrates LIVE (that row stays a
    * live window plan; this table exists so consumers that merely need
    * the spans — [[win_concurrent]]'s sweep-line — don't re-pay the
    * events-sized window scan per invocation). Deterministic over
    * immutable inputs, so reuse cannot change an oracle row. */
  private[graft] def sessionSpans(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val tag = graft.util.AppCleanup.tagOf(
      s.sparkContext.applicationId + "_" + d)
    val t = s"graft_win_sessions_$tag"
    graft.util.AppCleanup.buildOnce(sessBuilt, tag) {
      graft.util.AppCleanup.registerWarehouseCleanup(s, "graft_win_sessions")
      graft.util.AppCleanup.resetTable(s, t)
      val byUser = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("gap_us",
          unix_micros(col("ts")) -
            lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("brk",
          when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("brk"))
          .over(byUser.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
        .write.mode("overwrite").saveAsTable(t)
    }
    s.table(t)
  }

  val win_concurrent: Q = (s, d) => {
    val sess = sessionSpans(s, d)
    // one scan, not a 2-branch union (r16: each union side re-read the
    // span table); explode emits the same (ts, ±1) multiset per span
    val sweep = sess.select(explode(array(
        struct(col("start_ts").as("ts"), lit(1L).as("delta")),
        struct(col("end_ts").as("ts"), lit(-1L).as("delta")))).as("x"))
      .select(col("x.ts").as("ts"), col("x.delta").as("delta"))
      .withColumn("day", date_trunc("day", col("ts")))
    val wDays = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sweep.groupBy("day")
      .agg(sum(col("delta")).as("day_delta"))
      .withColumn("offset",
        coalesce(sum(col("day_delta")).over(wDays), lit(0L)))
      .select("day", "offset")
    val wLocal = Window.partitionBy("day")
      .orderBy(asc("ts"), desc("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sweep.join(broadcast(offsets), "day")
      .withColumn("conc", col("offset") + sum(col("delta")).over(wLocal))
      .groupBy("day").agg(max(col("conc")).as("peak"))
      .orderBy("day")
  }

  /** OHLC time-bucket resample — the market-data downsampling staple
    * applied to the events stream: per (user, day), the first value by
    * time (open), max (high), min (low), last by time (close), and the
    * bar's tick count. Open/close pick via min_by/max_by on the UNIQUE
    * (ts, event_id) struct key — same-µs ties order deterministically,
    * the [[agg_minmax_by]] rule — and all four outputs are bit-exact
    * VALUE PICKS of raw parquet doubles (no arithmetic, raw compare, no
    * rounding). One hash aggregation, partial map-side; never a window
    * over raw events. */
  val win_ohlc: Q = (s, d) =>
    events(s, d)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id")))
          .as("px_open"),
        max(col("value")).as("px_high"),
        min(col("value")).as("px_low"),
        max_by(col("value"), struct(col("ts"), col("event_id")))
          .as("px_close"),
        count(lit(1)).as("n_ticks"))
      .orderBy("user_id", "day")

  /** Maximum drawdown per user — the quant-analytics staple: walk the
    * user's value series in the unique (ts, event_id) order, track the
    * running maximum, and report the deepest deficit `running_max −
    * value` along with the peak. BIT-EXACT, no rounding: running max
    * and final max are value picks, and the deficit is ONE IEEE
    * subtraction of identical operands in identical order on both
    * engines. NULL values pass through (max ignores them; a NULL tick
    * contributes no deficit) — identical semantics both engines. One
    * user-keyed shuffle; the window is a running-frame scan, state
    * O(1) per partition. The mapGroupsWithState streaming twin — the
    * same (n, run_max, max_dd) state folded across micro-batches — is
    * PROVEN bit-identical in StreamingSpec. */
  val win_drawdown: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("run_max", max(col("value")).over(w))
      .withColumn("dd", col("run_max") - col("value"))
      .groupBy("user_id")
      .agg(max(col("dd")).as("max_drawdown"),
        max(col("value")).as("peak_value"),
        count(lit(1)).as("n_ticks"))
      .orderBy("user_id")
  }

  val queries: Seq[(String, Q)] = Seq(
    "win_rank" -> win_rank,
    "win_rank_salted" -> win_rank_salted,
    "win_dist" -> win_dist,
    "win_dist_salted" -> win_dist_salted,
    "win_lag" -> win_lag,
    "win_nav" -> win_nav,
    "win_run" -> win_run,
    "win_range" -> win_range,
    "win_topk" -> win_topk,
    "win_session" -> win_session,
    "win_funnel" -> win_funnel,
    "win_moving" -> win_moving,
    "win_fill" -> win_fill,
    "dt_gaps_islands" -> dt_gaps_islands,
    "win_pattern" -> win_pattern,
    "win_ema" -> win_ema,
    "win_interp" -> win_interp,
    "win_share" -> win_share,
    "win_share_salted" -> win_share_salted,
    "win_rolling_distinct" -> win_rolling_distinct,
    "win_rolling_distinct_hll" -> win_rolling_distinct_hll,
    "win_concurrent" -> win_concurrent,
    "win_ohlc" -> win_ohlc,
    "win_drawdown" -> win_drawdown,
  )

  val oracle: Seq[(String, String)] = Seq(
    // identical running-max window + one IEEE subtraction → raw double
    // compare, no rounding
    "win_drawdown" ->
      """WITH w AS (
           SELECT user_id, value,
               max(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS run_max
           FROM events)
         SELECT user_id, max(run_max - value) AS max_drawdown,
             max(value) AS peak_value, count(1) AS n_ticks
         FROM w GROUP BY user_id ORDER BY user_id""",
    // open/close via rank-1 row_number over the unique (ts, event_id)
    // order (the agg_minmax_by composite-arg_min pattern); NULL values
    // at the picked row stay NULL on both engines
    "win_ohlc" ->
      """WITH b AS (
           SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               ts, event_id, value
           FROM events),
         r AS (
           SELECT user_id, day, value,
               row_number() OVER (PARTITION BY user_id, day
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY user_id, day
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
           FROM b),
         agg AS (
           SELECT user_id, day, max(value) AS px_high, min(value) AS px_low,
               count(1) AS n_ticks
           FROM b GROUP BY 1, 2)
         SELECT a.user_id, a.day, o.value AS px_open, a.px_high, a.px_low,
             c.value AS px_close, a.n_ticks
         FROM agg a
         JOIN r o ON o.user_id = a.user_id AND o.day = a.day AND o.rn_a = 1
         JOIN r c ON c.user_id = a.user_id AND c.day = a.day AND c.rn_d = 1
         ORDER BY a.user_id, a.day""",
    // constant 7-day fan-out + distinct agg, clipped at the last
    // observed day — the same relational formulation as the Spark side
    "win_rolling_distinct" ->
      """WITH ud AS (
           SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS aday
           FROM events),
         mx AS (SELECT max(aday) AS max_day FROM ud),
         contrib AS (
           SELECT user_id,
               CAST(CAST(aday AS DATE) + CAST(r.i AS INT) AS TIMESTAMP)
                 AS day
           FROM ud CROSS JOIN range(0, 7) r(i))
         SELECT day, count(DISTINCT user_id) AS dau7
         FROM contrib, mx WHERE day <= max_day
         GROUP BY day ORDER BY day""",
    // sweep-line over the win_session intervals; +1 before -1 at equal
    // ts (delta DESC) = inclusive ends; single global running sum (the
    // Spark side's two-phase decomposition is an exact regrouping of
    // the same integer prefix sums)
    "win_concurrent" ->
      """WITH f AS (
           SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > 1800000000
                    THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), g AS (
           SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
           FROM f
         ), sess AS (
           SELECT user_id, session_id, min(ts) AS start_ts,
               max(ts) AS end_ts
           FROM g GROUP BY 1, 2
         ), sweep AS (
           SELECT start_ts AS ts, 1 AS delta FROM sess
           UNION ALL SELECT end_ts, -1 FROM sess
         ), rs AS (
           SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               sum(delta) OVER (ORDER BY ts, delta DESC
                                ROWS UNBOUNDED PRECEDING) AS conc
           FROM sweep)
         SELECT day, CAST(max(conc) AS BIGINT) AS peak
         FROM rs GROUP BY day ORDER BY day""",
    // stage-at-a-time conditional mins, same strict-after semantics;
    // depth literal is 32-bit on both engines (CAST INT per convention)
    "win_funnel" ->
      """WITH v AS (
           SELECT user_id, min(ts) AS first_view
           FROM events WHERE event_type = 'view' GROUP BY 1),
         c AS (
           SELECT e.user_id, min(e.ts) AS first_click
           FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'click' AND e.ts > v.first_view
           GROUP BY 1),
         p AS (
           SELECT e.user_id, min(e.ts) AS first_purchase
           FROM events e JOIN c ON e.user_id = c.user_id
           WHERE e.event_type = 'purchase' AND e.ts > c.first_click
           GROUP BY 1)
         SELECT v.user_id,
             CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                       WHEN c.user_id IS NOT NULL THEN 2
                       ELSE 1 END AS INT) AS depth,
             v.first_view
         FROM v
         LEFT JOIN c ON v.user_id = c.user_id
         LEFT JOIN p ON v.user_id = p.user_id
         ORDER BY v.user_id""",
    "win_moving" ->
      """SELECT o_custkey, o_orderkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS mv_sum,
             CAST(count(1) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS INT)
               AS n_win
         FROM orders ORDER BY o_custkey, o_orderkey""",
    // same two-pass window formulation; the gap compares epoch_us on
    // both engines (seconds truncation flips exact half-hour boundaries)
    "win_session" ->
      """WITH f AS (
           SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > 1800000000
                    THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), g AS (
           SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
           FROM f
         )
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             count(1) AS n_events, min(ts) AS session_start,
             max(ts) AS session_end
         FROM g GROUP BY 1, 2 ORDER BY 1, 2""",
    "win_dist" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
             percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC) AS pct_rank,
             cume_dist() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC) AS cume
         FROM orders ORDER BY o_orderstatus, o_orderkey""",
    // the salted plan must produce exactly the direct window's answer,
    // so its oracle IS win_dist's
    "win_dist_salted" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
             percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC) AS pct_rank,
             cume_dist() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC) AS cume
         FROM orders ORDER BY o_orderstatus, o_orderkey""",
    "win_rank" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
             CAST(rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS INT) AS rnk,
             CAST(dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS INT) AS drnk,
             CAST(row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn,
             CAST(ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS quartile
         FROM orders ORDER BY o_orderstatus, o_orderkey""",
    // the salted plan must produce exactly the direct window's answer,
    // so its oracle IS the direct window
    "win_rank_salted" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
             CAST(rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS INT) AS rnk,
             CAST(dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS INT) AS drnk,
             CAST(row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn,
             CAST(ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS quartile
         FROM orders ORDER BY o_orderstatus, o_orderkey""",
    "win_lag" ->
      """SELECT event_id, user_id, ts,
             date_diff('second',
                 lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
                 ts) AS gap_sec,
             lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_type
         FROM events ORDER BY event_id""",
    "win_nav" ->
      """SELECT o_custkey, o_orderkey,
             first_value(o_orderkey) OVER w AS first_order,
             last_value(o_orderkey) OVER w AS last_order,
             nth_value(o_orderkey, 2) OVER w AS second_order
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",
    "win_run" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "win_range" ->
      """SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(sum(CAST(value AS DECIMAL(18,2)))
                 OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                       RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_7d
         FROM events ORDER BY event_id""",
    // IGNORE NULLS is the engine-native LOCF on both sides; the frame and
    // total order match Spark's exactly, values are raw parquet doubles
    "win_fill" ->
      """SELECT event_id, user_id, event_type,
             CASE WHEN event_type = 'purchase' THEN value END AS v,
             last_value(CASE WHEN event_type = 'purchase' THEN value END
                        IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS v_fill
         FROM events ORDER BY event_id""",
    "win_topk" ->
      """WITH rev AS (
           SELECT p_brand, p_partkey,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY p_brand, p_partkey),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY p_brand
                                        ORDER BY revenue DESC, p_partkey ASC) AS rn
           FROM rev)
         SELECT p_brand, p_partkey, revenue, CAST(rn AS INT) AS rn FROM ranked
         WHERE rn <= 3 ORDER BY p_brand, rn""",
    // date - row_number anchor grouping; DATE results through TIMESTAMP
    "dt_gaps_islands" ->
      """WITH d AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt FROM events),
         r AS (
           SELECT user_id, dt,
               row_number() OVER (PARTITION BY user_id ORDER BY dt) AS rn
           FROM d),
         g AS (
           SELECT user_id, dt - CAST(rn AS INT) AS anchor,
               min(dt) AS s, max(dt) AS e, count(1) AS days
           FROM r GROUP BY 1, 2)
         SELECT user_id, CAST(s AS TIMESTAMP) AS island_start,
             CAST(e AS TIMESTAMP) AS island_end, days
         FROM g ORDER BY user_id, island_start""",
    // ordered symbol string via string_agg(... ORDER BY) — the same
    // (ts, event_id) total order as Spark's array_sort; the regex stays
    // in the Java/DuckDB common subset. len()/match counts are BIGINT in
    // DuckDB, INT in Spark → CAST
    "win_pattern" ->
      """WITH seq AS (
           SELECT user_id,
               string_agg(CASE event_type WHEN 'view' THEN 'v'
                   WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
                   WHEN 'signup' THEN 's' ELSE 'e' END,
                   '' ORDER BY ts, event_id) AS sq
           FROM events GROUP BY user_id)
         SELECT user_id, CAST(len(sq) AS INT) AS seq_len,
             CAST(len(regexp_extract_all(sq, 'vc+p')) AS INT) AS funnels
         FROM seq ORDER BY user_id""",
    // list_reduce seeds the fold with the first element — the Spark side
    // mirrors that (slice from 2, init vals[0]), so both engines run the
    // identical IEEE double sequence: raw-double compare, no rounding
    "win_ema" ->
      """WITH seq AS (
           SELECT user_id,
               list(value ORDER BY ts, event_id) AS vals
           FROM events GROUP BY user_id)
         SELECT user_id, CAST(len(vals) AS INT) AS n_events,
             list_reduce(vals, (acc, x) -> acc * 0.75 + x * 0.25) AS ema
         FROM seq ORDER BY user_id""",
    // prev/next carried with the running-count group trick (each group
    // holds exactly one observation); the interpolation expression is
    // written in the same operand order as the Spark side so the single
    // IEEE divide/multiply/add sequence is bit-identical
    "win_interp" ->
      """WITH base AS (
           SELECT event_id, user_id, ts, epoch_us(ts) AS t,
               CASE WHEN event_type = 'purchase' THEN value END AS v
           FROM events),
         g AS (
           SELECT *,
               count(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS gp,
               count(v) OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                              ROWS UNBOUNDED PRECEDING) AS gn
           FROM base),
         f AS (
           SELECT event_id, user_id, t, v,
               max(v) OVER (PARTITION BY user_id, gp) AS pv,
               max(CASE WHEN v IS NOT NULL THEN t END)
                   OVER (PARTITION BY user_id, gp) AS pt,
               max(v) OVER (PARTITION BY user_id, gn) AS nv,
               max(CASE WHEN v IS NOT NULL THEN t END)
                   OVER (PARTITION BY user_id, gn) AS nt
           FROM g)
         SELECT event_id, user_id, v,
             CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt THEN
                    pv + (nv - pv) * (CAST(t - pt AS DOUBLE) /
                                      CAST(nt - pt AS DOUBLE))
                  WHEN pv IS NOT NULL THEN pv
                  ELSE NULL END AS v_interp
         FROM f ORDER BY event_id""",
    "win_share" ->
      """WITH c AS (
           SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents
           FROM orders)
         SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(cents * 10000 // sum(cents)
                  OVER (PARTITION BY o_custkey) AS INT) AS share_bp
         FROM c ORDER BY o_custkey, o_orderkey""",
    // decomposed ≡ direct: the salted two-phase totals must reproduce
    // the direct window's integer arithmetic exactly
    "win_share_salted" ->
      """WITH c AS (
           SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents
           FROM orders)
         SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(cents * 10000 // sum(cents)
                  OVER (PARTITION BY o_custkey) AS INT) AS share_bp
         FROM c ORDER BY o_custkey, o_orderkey""",
  )
}
