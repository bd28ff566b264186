package graft

import org.apache.spark.sql.DataFrame

/** SURVEY.md §4/§5.2: the *named* join/sort queries must provably exercise
  * the named physical algorithm — asserted on the executed plan, with AQE
  * disabled locally so the static plan is inspectable.
  */
class PlanShapeSpec extends SparkTestBase {

  private def planOf(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  private def withStaticPlan[A](f: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("join_bhj plans a BroadcastHashJoin") {
    withStaticPlan {
      assert(planOf(ops.Relational.join_bhj(spark, sf))
        .contains("BroadcastHashJoin"))
    }
  }

  test("join_smj plans a SortMergeJoin (merge hint honored)") {
    withStaticPlan {
      assert(planOf(ops.Relational.join_smj(spark, sf))
        .contains("SortMergeJoin"))
    }
  }

  test("join_theta keeps the equi component out of nested-loop") {
    withStaticPlan {
      val p = planOf(ops.Relational.join_theta(spark, sf))
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"theta join degenerated to BNLJ:\n$p")
    }
  }

  test("sort_topk plans TakeOrderedAndProject, not a global sort") {
    withStaticPlan {
      assert(planOf(ops.Relational.sort_topk(spark, sf))
        .contains("TakeOrderedAndProject"))
    }
  }

  test("scan_pruned pushes the shipdate filter into the parquet scan") {
    withStaticPlan {
      val p = planOf(ops.Relational.scan_pruned(spark, sf))
      assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
        s"no pushed filters in:\n$p")
      // column pruning: scanned schema is exactly the 4 projected columns
      assert(p.contains("l_extendedprice") && !p.contains("l_discount"))
    }
  }

  test("agg_pricing uses two-phase hash aggregation") {
    withStaticPlan {
      val p = planOf(ops.Relational.agg_pricing(spark, sf))
      assert(p.contains("HashAggregate"))
      assert(p.contains("partial_sum") || p.contains("partial"),
        s"no partial (map-side) aggregation in:\n$p")
    }
  }

  test("star join broadcasts the small dims") {
    withStaticPlan {
      val p = planOf(ops.Relational.join_star(spark, sf))
      assert(p.contains("BroadcastHashJoin"))
    }
  }
}
