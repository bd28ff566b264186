package graft

import org.apache.spark.sql.SparkSession

/** Second JVM for the durable-catalog certification (GraftTableSpec):
  * launched with `-Dgraft.catalog.dir=<dir>` and a FRESH process-global
  * registry, it must resolve a table and a view created by the parent
  * JVM purely from the file-backed catalog — the cross-session story a
  * durable name catalog exists for. Order matters: the duplicate-CREATE
  * probe runs FIRST, before any lookup warms the in-process cache, so
  * the collision it certifies is settled by the on-disk
  * create-if-absent claim, not by the TrieMap.
  *
  * args: catalogDir tableName viewName insertId
  * Exits non-zero on any failure; step names go to stdout for the
  * parent's log tail. */
object CatalogSecondJvmMain {
  def main(args: Array[String]): Unit = {
    val Array(catalogDir, tableName, viewName, insertIdStr) = args
    sys.props("graft.catalog.dir") = catalogDir
    val insertId = insertIdStr.toLong
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // 1. cross-process CREATE collision: a fresh location, so the
      // only thing that can (and must) reject it is the name claim
      val dup = java.nio.file.Files
        .createTempDirectory("graft_cat_dup").toString
      val failed =
        try {
          graft.sql.GraftSql.exec(spark,
            s"""CREATE TABLE $tableName (id BIGINT, payload STRING)
                USING graft LOCATION '$dup' OPTIONS (key 'id')""")
          false
        } catch {
          case e: Exception => e.getMessage.contains("already exists")
        }
      require(failed, "duplicate CREATE must fail on the durable claim")
      println("[jvm2] duplicate CREATE rejected")
      // 2. resolve the parent's table by NAME (load-on-miss from disk)
      val n = graft.sql.GraftSql.sql(spark,
        s"SELECT count(1) AS n FROM $tableName").head().getLong(0)
      require(n > 0, s"expected rows in $tableName, got $n")
      println(s"[jvm2] SELECT by name: $n rows")
      // 3. DML by name: the Ref knobs (key, stats) came off disk too
      graft.sql.GraftSql.exec(spark,
        s"INSERT INTO $tableName VALUES ($insertId, 'from_jvm2')")
      println("[jvm2] INSERT by name committed")
      // 4. the parent's VIEW resolves from the durable catalog as well
      val vn = graft.sql.GraftSql.sql(spark,
        s"SELECT count(1) AS n FROM $viewName").head().getLong(0)
      require(vn > 0, s"expected rows through $viewName, got $vn")
      println(s"[jvm2] view resolved: $vn rows")
    } finally spark.stop()
    sys.exit(0)
  }
}
