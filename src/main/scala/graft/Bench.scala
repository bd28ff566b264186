package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup at the smallest SF: compiles every query's code
    // paths cheaply so measured times reflect steady state, not which query
    // happened to run first (observed 8s→40s swings without this).
    val warmDir = {
      val small = "/root/testdata/sf0.001"
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    // drop warmup-phase broadcasts/shuffle state before measuring — without
    // this the measured phase inherits the warmup heap and the GC-heavy
    // pair joins regress 4×.
    spark.catalog.clearCache()
    System.gc()
    Thread.sleep(2000)
    // a failed query must be visible as -1, never as a (fast-looking)
    // time-to-failure folded into the total
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        -1.0
      }
    }
    // two full interleaved passes, min per query: single-pass totals swung
    // 39.6–63.5 s on identical code because major-GC placement taxes
    // whichever queries it lands on; per-query min removes that lottery
    // while every query still pays its own real cost (a failure in EITHER
    // pass marks the query failed)
    val pass1 = SparkEntry.queries.map { case (n, fn) => n -> once(n, fn) }
    val pass2 = SparkEntry.queries.map { case (n, fn) => n -> once(n, fn) }
    val results = pass1.zip(pass2).map { case ((n, a), (_, b)) =>
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    // a partial run must never read as a (smaller ⇒ faster) full run
    val total = if (failed > 0) -1.0 else results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}"""
    // the driver parses stdout, but sbt appends [success] noise after us
    // (BENCH_r01 came back "parsed": null) — so also persist the line where
    // a file read can't race log interleaving
    java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
    // print after spark.stop() so no executor-shutdown logging lands between
    // the metric line and end-of-stream
    println(line)
  }
}
