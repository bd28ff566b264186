package graft.ops

import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Det._

/** SURVEY.md §2-H: the scalar function surface — string, date/time, math,
  * array (+ higher-order), explode/posexplode, map, JSON, null-handling,
  * hashing. One query per family; oracle SQL is hand-authored DuckDB 1.0
  * dialect (names/arg orders differ — SURVEY.md §7.6.6).
  *
  * Cross-engine type rule: every date-typed output is cast to TIMESTAMP on
  * both sides (DuckDB's date_trunc returns DATE where Spark returns
  * TIMESTAMP; normalizing avoids dtype-level mismatches in the compare).
  * All expressions here are codegen'd built-ins — no UDFs in this file.
  */
object Scalars {

  val str_fns: Q = (s, d) =>
    part(s, d)
      .select(
        col("p_partkey"),
        substring(col("p_name"), 1, 6).as("name6"),
        upper(col("p_name")).as("name_up"),
        lower(col("p_brand")).as("brand_lo"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("name_mask"),
        size(split(col("p_name"), " ")).as("n_words"),
        levenshtein(col("p_name"), col("p_type")).as("lev_name_type"))
      .orderBy("p_partkey")

  val dt_fns: Q = (s, d) =>
    orders(s, d)
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        (expr("weekday(o_orderdate)") + 1).as("isodow"),
        datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate")))
          .as("days_to_2002"),
        date_add(to_date(col("o_orderdate")), 30).cast("timestamp")
          .as("plus30"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
        to_date(col("o_orderdate")).cast("timestamp").as("as_date"),
        unix_timestamp(col("o_orderdate")).as("epoch_sec"))
      .orderBy("o_orderkey")

  /** Calendar-spine gap filling: generate the June-2001 day spine
    * (sequence of dates — rows from a generator, not a table), left-join
    * the per-day order counts, and zero-fill the missing days — the
    * date-dimension pattern every reporting layer needs (a plain groupBy
    * silently DROPS empty days). At sf0.001 the month genuinely has
    * gaps, so the fill path is exercised, not just compiled; the spine
    * is 30 rows broadcast against the aggregated side. Dates cross
    * engines as TIMESTAMP per the house rule. */
  val dt_spine: Q = (s, d) => {
    val spine = s.range(1).select(explode(expr(
      """sequence(to_date('2001-06-01'), to_date('2001-06-30'),
           interval 1 day)""")).as("day"))
    val daily = orders(s, d)
      .where(col("o_orderdate").between("2001-06-01", "2001-06-30"))
      .groupBy(to_date(col("o_orderdate")).as("od"))
      .agg(count(lit(1)).as("cnt"))
    spine.join(daily, col("day") === col("od"), "left")
      .select(col("day").cast("timestamp").as("day"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .orderBy("day")
  }

  /** l_quantity is integer-valued (verified) so quantity+0.5 is an exact
    * binary .5 — bround (HALF_EVEN) is well-defined identically in both
    * engines. */
  val math_fns: Q = (s, d) =>
    lineitem(s, d)
      .where(col("l_orderkey") % 50 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r4(abs(col("l_discount") - 0.05)).as("abs_disc"),
        ceil(col("l_extendedprice") / 1000).as("price_ceil_k"),
        floor(col("l_extendedprice") / 1000).as("price_floor_k"),
        r4(pow(col("l_quantity"), 2)).as("qty_sq"),
        r4(log(col("l_extendedprice"))).as("ln_price"),
        r4(log10(col("l_extendedprice"))).as("log10_price"),
        pmod(col("l_orderkey"), lit(7)).as("mod7"),
        signum(col("l_discount") - 0.03).as("sign_disc"),
        // round(price/7, 2) computed as integer half-up cents via div —
        // float round() on a composite ratio is the half-boundary
        // divergence class CLAUDE.md bans (prices are cents-exact, so
        // round(price*100) recovers the exact integer on both engines)
        (expr("(2 * CAST(round(l_extendedprice * 100) AS BIGINT) + 7) div 14")
          / 100.0).as("seventh"),
        bround(col("l_quantity") + 0.5, 0).as("qty_banker"))
      .orderBy("l_orderkey", "l_linenumber")

  val arr_fns: Q = (s, d) =>
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        array_contains(col("toks"), "spark").as("has_spark"),
        concat_ws(" ", slice(sort_array(array_distinct(col("toks"))), 1, 3))
          .as("first3_sorted"),
        aggregate(transform(col("toks"), x => length(x)), lit(0),
          (acc, x) => acc + x).as("total_chars"),
        aggregate(zip_with(transform(col("toks"), x => length(x)),
            transform(col("toks"), x => length(x)), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("sumsq_chars"))
      .orderBy("doc_id")

  val arr_explode: Q = (s, d) =>
    documents(s, d)
      .where(col("doc_id") < 100)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "tok")
      .orderBy("doc_id", "pos")

  /** Builds a token→count map Spark-side (map_from_arrays over HOFs); the
    * oracle computes the same scalars directly — semantics, not plumbing,
    * are what hash-matches. */
  val map_fns: Q = (s, d) =>
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("keys", array_distinct(col("toks")))
      .withColumn("m", map_from_arrays(col("keys"),
        transform(col("keys"), k => size(filter(col("toks"), x => x === k)))))
      .select(
        col("doc_id"),
        size(col("m")).as("n_keys"),
        coalesce(try_element_at(col("m"), lit("spark")), lit(0)).as("spark_cnt"),
        coalesce(try_element_at(col("m"), lit("join")), lit(0)).as("join_cnt"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys_sorted"))
      .orderBy("doc_id")

  val json_fns: Q = (s, d) =>
    events(s, d)
      .withColumn("k1", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k2",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").cast("long"))
      .groupBy("event_type")
      .agg(
        sum(col("k1")).as("sum_k"),
        sum(when(col("k1") === col("k2"), 1).otherwise(0)).as("n_consistent"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  val null_fns: Q = (s, d) =>
    customer(s, d)
      .select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nulled"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(none)"))
          .as("seg_filled"),
        expr("nvl2(nullif(c_mktsegment, 'BUILDING'), 'kept', 'blanked')")
          .as("nvl2_tag"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_capped"))
      .orderBy("c_custkey")

  /** md5 + sha2-256 are oracle-checked (DuckDB has both); xxhash64 is
    * engine-specific → exercised but folded into a count, not emitted. */
  val hash_fns: Q = (s, d) =>
    documents(s, d)
      .select(
        col("doc_id"),
        md5(col("text")).as("text_md5"),
        sha2(col("text"), 256).as("text_sha256"),
        (length(hex(xxhash64(col("text")))) > 0).as("xxhash_nonempty"))
      .orderBy("doc_id")

  val queries: Seq[(String, Q)] = Seq(
    "str_fns" -> str_fns,
    "dt_fns" -> dt_fns,
    "dt_spine" -> dt_spine,
    "math_fns" -> math_fns,
    "arr_fns" -> arr_fns,
    "arr_explode" -> arr_explode,
    "map_fns" -> map_fns,
    "json_fns" -> json_fns,
    "null_fns" -> null_fns,
    "hash_fns" -> hash_fns,
  )

  val oracle: Seq[(String, String)] = Seq(
    // generate_series is end-inclusive like Spark's sequence; empty days
    // come back 0, not absent
    "dt_spine" ->
      """WITH spine AS (
           SELECT unnest(generate_series(DATE '2001-06-01',
               DATE '2001-06-30', INTERVAL 1 DAY)) AS day),
         daily AS (
           SELECT CAST(o_orderdate AS DATE) AS od, count(1) AS cnt
           FROM orders
           WHERE o_orderdate BETWEEN '2001-06-01' AND '2001-06-30'
           GROUP BY 1)
         SELECT CAST(spine.day AS TIMESTAMP) AS day,
             coalesce(cnt, 0) AS n_orders
         FROM spine LEFT JOIN daily ON CAST(spine.day AS DATE) = daily.od
         ORDER BY day""",
    "str_fns" ->
      """SELECT p_partkey,
             substring(p_name, 1, 6) AS name6,
             upper(p_name) AS name_up,
             lower(p_brand) AS brand_lo,
             CAST(length(p_name) AS INT) AS name_len,
             concat_ws('|', p_brand, p_type) AS brand_type,
             lpad(p_brand, 12, '*') AS brand_pad,
             trim('  ' || p_name || '  ') AS name_trim,
             coalesce(regexp_extract(p_brand, '#(\d+)', 1), '') AS brand_num,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_mask,
             CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
             CAST(levenshtein(p_name, p_type) AS INT) AS lev_name_type
         FROM part ORDER BY p_partkey""",
    "dt_fns" ->
      """SELECT o_orderkey,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mo,
             CAST(isodow(o_orderdate) AS INT) AS isodow,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
             CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30,
             CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
             CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS as_date,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_sec
         FROM orders ORDER BY o_orderkey""",
    "math_fns" ->
      """SELECT l_orderkey, l_linenumber,
             round(abs(l_discount - 0.05), 4) AS abs_disc,
             CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_ceil_k,
             CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_floor_k,
             round(pow(l_quantity, 2), 4) AS qty_sq,
             round(ln(l_extendedprice), 4) AS ln_price,
             round(log10(l_extendedprice), 4) AS log10_price,
             l_orderkey % 7 AS mod7,
             CAST(sign(l_discount - 0.03) AS DOUBLE) AS sign_disc,
             CAST((2 * CAST(round(l_extendedprice * 100) AS BIGINT) + 7) // 14 AS DOUBLE) / 100.0 AS seventh,
             round_even(l_quantity + 0.5, 0) AS qty_banker
         FROM lineitem WHERE l_orderkey % 50 = 0
         ORDER BY l_orderkey, l_linenumber""",
    "arr_fns" ->
      """SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
             list_contains(string_split(text, ' '), 'spark') AS has_spark,
             array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ' ') AS first3_sorted,
             CAST(list_aggregate(list_transform(string_split(text, ' '), x -> length(x)), 'sum') AS INT) AS total_chars,
             CAST(list_aggregate(list_transform(string_split(text, ' '), x -> length(x) * length(x)), 'sum') AS BIGINT) AS sumsq_chars
         FROM documents ORDER BY doc_id""",
    "arr_explode" ->
      """SELECT doc_id,
             CAST(unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS INT) AS pos,
             unnest(string_split(text, ' ')) AS tok
         FROM documents WHERE doc_id < 100
         ORDER BY doc_id, pos""",
    "map_fns" ->
      """SELECT doc_id,
             CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_keys,
             CAST(len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS INT) AS spark_cnt,
             CAST(len(list_filter(string_split(text, ' '), x -> x = 'join')) AS INT) AS join_cnt,
             array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS keys_sorted
         FROM documents ORDER BY doc_id""",
    "json_fns" ->
      """SELECT event_type,
             CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(sum(CASE WHEN CAST(props->>'$.k' AS BIGINT)
                             = CAST(TRY_CAST(props->>'$.k' AS INTEGER) AS BIGINT)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
             count(1) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "null_fns" ->
      """SELECT c_custkey,
             nullif(c_mktsegment, 'BUILDING') AS seg_nulled,
             coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg_filled,
             CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
                  THEN 'kept' ELSE 'blanked' END AS nvl2_tag,
             greatest(c_acctbal, 0.0) AS bal_pos,
             least(c_acctbal, 1000.0) AS bal_capped
         FROM customer ORDER BY c_custkey""",
    "hash_fns" ->
      """SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256,
             true AS xxhash_nonempty
         FROM documents ORDER BY doc_id""",
  )
}
