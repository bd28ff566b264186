package graft.sql

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat,
  CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.table.GraftTable

/** Optimizer-statistics surface for registered graft names (r15 verdict
  * missing #4): the manifest knows the table's EXACT live row count for
  * free, and `ANALYZE TABLE` persists live-scaled byte size + column
  * NDV/min/max ([[GraftTable.analyzeStats]]) — this helper hands them
  * to Catalyst by attaching a `CatalogTable` carrying
  * `CatalogStatistics` onto the read plan's `LogicalRelation`, the same
  * channel a Hive-metastore table's ANALYZE stats ride. The plan SHAPE
  * is untouched (still a plain relation leaf — predicate pushdown,
  * column pruning and partition pruning see exactly the plan they saw
  * before), only its cost estimate changes: broadcast-vs-SMJ picks see
  * the analyzed size instead of raw file bytes (a DV-eaten table's
  * files overstate live data), and CBO/AQE see a real rowCount + NDVs.
  *
  * Attached ONLY when the read plan holds exactly one relation leaf: a
  * multi-epoch (rename) union splits rows across scans, and attributing
  * table totals to EACH leaf would overcount — those plans keep Spark's
  * own file-size estimates, conservative and correct. */
private[graft] object GraftStats {

  def attach(plan: LogicalPlan, root: String, name: String): LogicalPlan = {
    val v = GraftTable.latestSnapshot(root)
    if (v <= 0) return plan
    val m = GraftTable.manifest(root, v)
    val ts = m.tableStats.getOrElse(Map.empty)
    if (ts.isEmpty) return plan // stats are ANALYZE-opt-in, like Hive's
    val lrs = plan.collect { case lr: LogicalRelation => lr }
    if (lrs.length != 1) return plan
    val rows = BigInt(m.files.map(_.liveRows).sum) // live NOW, not
    // the analyzed snapshot's — the one stat the manifest keeps exact
    val size = ts.get("sizeInBytes").map(BigInt(_))
      .getOrElse(BigInt(lrs.head.relation.sizeInBytes))
    val colStats = lrs.head.schema.fieldNames.flatMap { c =>
      ts.get(s"ndv.$c").map { ndv =>
        c -> CatalogColumnStat(
          distinctCount = Some(BigInt(ndv)),
          min = ts.get(s"min.$c"),
          max = ts.get(s"max.$c"),
          nullCount = ts.get(s"nulls.$c").map(BigInt(_)))
      }
    }.toMap
    val ct = CatalogTable(
      identifier = TableIdentifier(name.replace('.', '_')),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty,
      schema = lrs.head.schema,
      provider = Some("graft"),
      stats = Some(CatalogStatistics(size, Some(rows), colStats)))
    plan.transform {
      case lr: LogicalRelation if lr.catalogTable.isEmpty =>
        lr.copy(catalogTable = Some(ct))
    }
  }
}
