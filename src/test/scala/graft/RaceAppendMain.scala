package graft

import org.apache.spark.sql.SparkSession

/** Second-JVM writer for the cross-PROCESS commit-race certification
  * (GraftTableSpec): appends `k` single-row batches to an existing graft
  * table at `root` through the ordinary optimistic append path, racing
  * whatever the spawning test JVM is committing on the same root. Writes
  * `<root>/_race_ready` once its session is up so the parent can start
  * its own appends at maximum overlap, and exits non-zero on any failure
  * (a lost update would also surface as missing rows in the parent's
  * final read). */
object RaceAppendMain {
  def main(args: Array[String]): Unit = {
    val Array(root, offStr, kStr) = args
    val off = offStr.toLong
    val k = kStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import spark.implicits._
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, "_race_ready"),
        Array.emptyByteArray)
      (1 to k).foreach { i =>
        graft.table.GraftTable.append(spark, root,
          Seq((off + i, s"p${off + i}")).toDF("id", "payload"),
          Seq("id"), Seq("id"), numFiles = 1)
      }
    } finally spark.stop()
    sys.exit(0)
  }
}
