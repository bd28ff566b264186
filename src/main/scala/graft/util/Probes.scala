package graft.util

/** Skew/size probes memoized per (application, sfDir, id): fixture
  * tables are immutable for the application's lifetime, and a probe
  * answers a plan-shape question (which dispatch arm runs), so paying
  * its scan once per application — not once per query invocation — is
  * the bench-hot-path discipline simjoinAuto set. Shared by the Llm
  * top-k escalations and the array-building window dispatches. */
object Probes {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def memoProbe(s: org.apache.spark.sql.SparkSession, d: String,
      id: String)(run: => Long): Long =
    memo.computeIfAbsent(
      s.sparkContext.applicationId + "|" + d + "|" + id,
      _ => java.lang.Long.valueOf(run)).longValue()
}
