package graft.util

/** Process-exit cleanup for per-application scratch artifacts (sink
  * directories, bucketed warehouse tables). Each call site registers its
  * hook ONCE per JVM under a key, so repeated query invocations (bench
  * runs every query twice after a warmup pass) don't stack hooks. */
object AppCleanup {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def recursiveDelete(f: java.io.File): Unit = {
    val sub = f.listFiles(); if (sub != null) sub.foreach(recursiveDelete)
    f.delete(); ()
  }

  /** Run `body` at JVM shutdown; only the first registration per key wins. */
  def onExit(key: String)(body: => Unit): Unit =
    if (registered.add(key)) { sys.addShutdownHook(body); () }

  /** Resolve a Spark conf dir value (plain path OR file: URI — Spark
    * accepts both, and bare java.net.URI throws on unencoded spaces) to a
    * local File via Hadoop's Path parsing, the way Spark itself does. */
  def localFile(confValue: String): java.io.File =
    new java.io.File(new org.apache.hadoop.fs.Path(confValue).toUri.getPath)

  /** Drop a warehouse table AND its directory — the catalog of a fresh JVM
    * has no entry for a crash leftover, but the directory survives and
    * saveAsTable refuses the location. The catalog lowercases table names
    * on saveAsTable, so the on-disk delete must match that casing. */
  def resetTable(s: org.apache.spark.sql.SparkSession, t: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $t")
    recursiveDelete(new java.io.File(
      localFile(s.conf.get("spark.sql.warehouse.dir")), t.toLowerCase))
  }

  /** Collision-free readable tag for per-(application, sfDir) artifact
    * names: the sanitized form ALONE collapses raw strings that differ
    * only in punctuation (".../sf0.01" vs ".../sf0_01") into one tag, and
    * the second caller would silently read the first directory's persisted
    * artifact (round-7 ADVICE). A hex MurmurHash3 of the raw string
    * disambiguates; the sanitized prefix keeps names greppable. Hex is
    * lowercase-stable, so catalog lowercasing can't split the tag. */
  def tagOf(raw: String): String =
    raw.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(raw))

  /** Build-once memo shared by every persisted-artifact site (LSH band
    * tables, IVF index, dedup working set, victim list, binary fixture):
    * runs `build` the first time `tag` is seen in this JVM and records
    * the tag only AFTER build returns — a failed build retries on the
    * next call instead of poisoning every later invocation — under a
    * lock spanning the whole build so two concurrent first callers
    * cannot race a reset against an in-flight write. The subtle rules
    * live here once instead of being re-audited per call site. */
  def buildOnce(seen: java.util.Set[String], tag: String)(build: => Unit): Unit =
    seen.synchronized {
      if (!seen.contains(tag)) { build; seen.add(tag); () }
    }

  /** Register the once-per-application shutdown hook that removes every
    * warehouse entry carrying this application's id (lowercased, matching
    * the catalog's on-disk casing) — shared by all queries that persist
    * bucketed tables, so the casing/URI rules live in one place. */
  def registerWarehouseCleanup(s: org.apache.spark.sql.SparkSession,
      key: String): Unit = {
    val warehouse = localFile(s.conf.get("spark.sql.warehouse.dir"))
    val appTag = s.sparkContext.applicationId
      .replaceAll("[^a-zA-Z0-9]", "_").toLowerCase
    onExit(s"${key}_${s.sparkContext.applicationId}") {
      val entries = warehouse.listFiles()
      if (entries != null)
        entries.filter(_.getName.toLowerCase.contains(appTag))
          .foreach(recursiveDelete)
    }
  }
}
