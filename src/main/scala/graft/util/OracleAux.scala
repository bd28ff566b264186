package graft.util

/** Location of the deterministic engine-side intermediates that the
  * DuckDB oracle replays (LSH band table, trained centroids, BPE merge
  * list, …): one directory PER sfDir, so two verify runs on different
  * scale factors can never clobber each other's aux tables (round-8
  * verdict watch-item — the old fixed `/tmp/graft_oracle_aux/<name>`
  * path made the last writer win across sfDirs).
  *
  * The oracle SQL is emitted by `Verify` AFTER every query has run
  * against its one sfDir, so the path baked into the SQL is resolved at
  * EMISSION time from the last dump's sfDir (`lastSfDir`, recorded by
  * every `dumpForOracle` call — including memo hits, so a warm JVM still
  * points the SQL at the right directory). Dumps for different sfDirs
  * land in different directories and survive each other; only the SQL
  * string is per-run.
  */
object OracleAux {
  def dirFor(sfDir: String): String =
    s"/tmp/graft_oracle_aux/${AppCleanup.tagOf(sfDir)}"

  @volatile private var lastSfDir: String = "/root/testdata/sf0.01"

  def recordSfDir(sfDir: String): Unit = lastSfDir = sfDir

  /** The aux directory the NEXT emitted oracle SQL should read. */
  def currentDir: String = dirFor(lastSfDir)
}
