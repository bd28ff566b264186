package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixture-table readers (SURVEY.md §1.3, FIXTURES.md).
  *
  * 100 TB posture: every reader is a plain parquet scan, so Catalyst
  * pushes filters/projections into the vectorized reader; at scale the
  * same code reads a date-partitioned table with dynamic partition
  * pruning — nothing here assumes single files.
  */
object Tables {
  /** Resolved-scan cache: `spark.read.parquet` pays schema inference
    * (footer reads) plus an InMemoryFileIndex listing EVERY call, and a
    * 210-query bench pass calls each reader hundreds of times — a real
    * engine resolves a table once per catalog, not once per query. The
    * cached DataFrame is an immutable logical plan, so sharing it across
    * queries is safe; keyed on the session so Verify/tests/bench (each
    * its own session) never see another session's relation. Bounded:
    * sessions-per-JVM × tables — a few dozen entries. */
  private val readCache = new scala.collection.concurrent.TrieMap[
    (SparkSession, String, String), DataFrame]

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events MUST go through the ts-normalizing reader below (CLAUDE.md
    // invariant); a raw read cached under the same key would poison
    // every later events() call with un-normalized nanos
    require(name != "events", "read events via Tables.events, never t()")
    readCache.getOrElseUpdate((spark, sfDir, name),
      spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** events.parquet's `ts` encoding has varied across driver-generated
    * fixture generations: rounds 1–6 shipped INT64 TIMESTAMP(NANOS), which
    * Spark 4.x refuses to read natively (PARQUET_TYPE_ILLEGAL, verified —
    * SURVEY.md §1.4) and the runtime-settable legacy conf maps to LongType
    * epoch-nanos; the round-7 regeneration ships TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which reads natively as TIMESTAMP_NTZ. This
    * reader accepts BOTH by branching on the materialized schema and emits
    * the same column either way: a µs-precision TIMESTAMP_LTZ (session tz
    * is pinned UTC, so NTZ→LTZ preserves the wall-clock instant; for the
    * nanos form, integer `div 1000` — exact, no double rounding — then
    * timestamp_micros yields the µs-truncated instant DuckDB produces
    * natively for the same file). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    readCache.getOrElseUpdate((spark, sfDir, "events"), {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    })
}

/** Determinism combinators (SURVEY.md §7.6, FIXTURES.md §3).
  *
  * Cross-engine float policy: a double SUM over ~60k money values has
  * order-dependent error ~1e-5 at magnitude ~1e8 — rounding to 4 decimals
  * would flip at boundaries ~10% of the time. Money aggregates therefore
  * accumulate in DECIMAL (exact, order-independent; inputs are 2-decimal
  * money so DECIMAL(18,2)/(18,6) is lossless) and only the final scalar is
  * cast back to double — bit-identical across engines and partition orders.
  * Purely statistical doubles (corr, stddev) stay double + round(4): their
  * relative error ~1e-13 is far below the 5e-5 boundary.
  */
object Det {
  /** exact 2-decimal accumulator for raw money columns */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** exact 6-decimal accumulator for products of two/three 2-dec values */
  def dec6(c: Column): Column = c.cast(DecimalType(24, 6))
  /** order-independent money sum, emitted as double */
  def moneySum(c: Column): Column = sum(dec2(c)).cast("double")
  /** order-independent sum of a money product, emitted as double */
  def moneySum6(c: Column): Column = sum(dec6(c)).cast("double")
  /** exact-sum-based average, emitted as double (identical division both engines) */
  def moneyAvg(c: Column): Column =
    (sum(dec2(c)).cast("double") / count(lit(1))).cast("double")
  def r4(c: Column): Column = round(c, 4)
}
