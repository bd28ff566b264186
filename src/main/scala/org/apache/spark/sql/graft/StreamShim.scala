package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

/** The one `private[sql]` doorway the graft streaming source needs.
  *
  * A v1 streaming `Source.getBatch` must hand MicroBatchExecution a
  * DataFrame whose logical plan is flagged `isStreaming = true` (the
  * engine asserts it); the only way to stamp that flag on an
  * arbitrarily-planned batch read is `internalCreateDataFrame`, which
  * Spark scopes `private[sql]` — the same doorway Spark's own
  * FileStreamSource and Delta Lake's DeltaSource walk through. This
  * object lives under `org.apache.spark.sql` purely to be inside that
  * scope; it contains no other logic and nothing else in graft touches
  * non-public API surface.
  */
object StreamShim {

  /** Re-plan `df` (a normal batch DataFrame) as a streaming-flagged
    * DataFrame over the same rows: execute through `queryExecution.toRdd`
    * (the InternalRow RDD of the optimized batch plan — pushdown, pruning
    * and codegen intact) and wrap it in a streaming LogicalRDD. */
  def toStreaming(df: DataFrame): DataFrame = {
    val cds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cds.sparkSession.internalCreateDataFrame(
      cds.queryExecution.toRdd, cds.schema, isStreaming = true)
  }

  /** The inverse doorway, for the SINK side: the DataFrame a v1
    * `Sink.addBatch` receives is planned by IncrementalExecution and is
    * only safely consumable through its computed RDD — re-wrapping that
    * RDD as a plain batch frame (exactly what Spark's own
    * ForeachBatchSink does) lets [[graft.table.GraftTable.append]]
    * evaluate it like any deterministic batch input (the CHECK
    * validation aggregate may evaluate it a second time; an RDD-backed
    * frame re-evaluates to the same rows by construction). */
  def toBatch(df: DataFrame): DataFrame = {
    val cds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cds.sparkSession.internalCreateDataFrame(
      cds.queryExecution.toRdd, cds.schema, isStreaming = false)
  }
}
