package graft

import java.sql.Timestamp

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
}
