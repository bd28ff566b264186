package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.util.Tables._

/** Decoded-payload feature record for [[Sources.llm_mm_features]]. */
case class MMFeatures(doc_id: Long, width: Int, height: Int,
    mean_intensity: Double)

/** SURVEY.md §2-A sources beyond parquet: JSONL / CSV ingestion with
  * explicit schemas, the Asana DataSource V2 connector (fixture replay —
  * [[graft.asana.AsanaSource]]), and the multimodal binary-decode pipeline
  * stub. Fixtures live in-repo (deterministic, hand-authored to the public
  * Asana API shapes — FIXTURES.md §2).
  */
object Sources {

  val fixtureDir = "/root/repo/fixtures/asana"

  private val taskSchema = StructType.fromDDL(
    "gid STRING, name STRING, notes STRING, completed BOOLEAN, " +
      "num_likes LONG, created_at TIMESTAMP, modified_at TIMESTAMP, " +
      "assignee STRUCT<gid: STRING, name: STRING>, " +
      "tags ARRAY<STRUCT<gid: STRING, name: STRING>>, " +
      "memberships ARRAY<STRUCT<project: STRUCT<gid: STRING, name: STRING>, " +
      "section: STRUCT<gid: STRING, name: STRING>>>")

  /** nested-JSON ingestion with explicit schema (no inference in prod paths)
    * + struct/array flattening — the Asana task object shape. */
  val scan_jsonl: Q = (s, _) =>
    s.read.schema(taskSchema).json(s"$fixtureDir/tasks.jsonl")
      .select(
        col("gid"), col("name"), col("completed"), col("num_likes"),
        col("created_at"),
        col("assignee.name").as("assignee_name"),
        size(col("tags")).as("n_tags"),
        size(col("memberships")).as("n_memberships"))
      .orderBy("gid")

  private val csvSchema = StructType.fromDDL(
    "gid STRING, name STRING, completed BOOLEAN, num_likes LONG, " +
      "created_at TIMESTAMP, project_gid STRING")

  val scan_csv: Q = (s, _) =>
    s.read.option("header", "true").schema(csvSchema)
      .csv(s"$fixtureDir/tasks_export.csv")
      .orderBy("gid")

  /** the DSv2 connector end-to-end: prune columns (opt_fields) + push the
    * modified_since predicate; oracle replays the same page fixtures. */
  val asana_scan: Q = (s, _) =>
    s.read.format("graft.asana.AsanaSource")
      .option("entity", "tasks").option("fixtureDir", fixtureDir)
      .load()
      .where(col("modified_at") >= lit("2024-01-15 00:00:00").cast("timestamp"))
      .select("gid", "name", "completed", "num_likes", "modified_at")
      .orderBy("gid")

  /** multi-entity denormalization through the connector: tasks per assignee
    * (the task⋈user join every Asana ETL performs). */
  val asana_denorm: Q = (s, _) => {
    val tasks = s.read.format("graft.asana.AsanaSource")
      .option("entity", "tasks").option("fixtureDir", fixtureDir).load()
    val users = s.read.format("graft.asana.AsanaSource")
      .option("entity", "users").option("fixtureDir", fixtureDir).load()
    tasks.as("t").join(users.as("u"),
        col("t.assignee_gid") === col("u.gid"))
      .groupBy(col("u.name").as("user_name"))
      .agg(count(lit(1)).as("n_tasks"),
        sum(when(col("completed"), 1).otherwise(0)).as("n_done"),
        sum(col("num_likes")).as("likes"))
      .orderBy("user_name")
  }

  // per-sfDir sink roots so concurrent Verify runs at different scale
  // factors can't overwrite each other's read-backs mid-scan
  private def sinkDir(d: String, name: String): String =
    s"/tmp/graft_sink/${name}_" + d.replaceAll("[^a-zA-Z0-9]", "_")

  /** ORC round-trip — the second columnar format Spark ships natively
    * (predicate pushdown + column pruning work the same as parquet).
    * DuckDB has no ORC reader, so the oracle runs the identical predicate
    * over the source table — the round-trip is what's under test. */
  val scan_orc: Q = (s, d) => {
    val out = sinkDir(d, "orc_part")
    part(s, d).write.mode("overwrite").orc(out)
    s.read.orc(out)
      .where(col("p_size") <= 20)
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("p_retailprice"))
      .orderBy("p_partkey")
  }

  /** custom_fields EAV normalization — the Asana API's one genuinely
    * dynamic schema region (per-workspace field definitions) turned into
    * the long (task, field, type, value) table every downstream consumer
    * can query without knowing the workspace's field set. The typed value
    * slots collapse into one string via the union coalesce; at scale this
    * is a single explode + projection, no shuffle until the sink. */
  val asana_custom_fields: Q = (s, _) =>
    s.read.format("graft.asana.AsanaSource")
      .option("entity", "tasks").option("fixtureDir", fixtureDir).load()
      .select(col("gid").as("task_gid"), explode(col("custom_fields")).as("cf"))
      .select(
        col("task_gid"),
        col("cf.gid").as("field_gid"),
        col("cf.name").as("field_name"),
        col("cf.type").as("field_type"),
        // numbers render through DECIMAL(38,6): double→string formatting
        // diverges between engines at ≥1e7 (scientific vs plain notation);
        // fixed-scale decimal renders identically everywhere
        coalesce(col("cf.enum_name"),
          col("cf.number_value").cast("decimal(38,6)").cast("string"),
          col("cf.text_value")).as("value"))
      .orderBy("task_gid", "field_gid", "value")

  /** task⋈tags many-to-many denormalization: explode the nested tag array
    * into the per-tag rollup (the classic work-graph pivot). */
  val asana_tags_denorm: Q = (s, _) =>
    s.read.schema(taskSchema).json(s"$fixtureDir/tasks.jsonl")
      .select(col("gid"), col("completed"), col("num_likes"),
        explode(col("tags")).as("tag"))
      .groupBy(col("tag.name").as("tag_name"))
      .agg(count(lit(1)).as("n_tasks"),
        sum(when(col("completed"), 1).otherwise(0)).as("n_done"),
        sum(col("num_likes")).as("likes"))
      .orderBy("tag_name")

  /** comment-stream sessionization per task over the stories entity via the
    * connector: bursts of activity separated by >30 min become sessions
    * (session_window works identically in batch and streaming — the same
    * query runs under readStream). */
  val asana_stories_sessions: Q = (s, _) =>
    s.read.format("graft.asana.AsanaSource")
      .option("entity", "stories").option("fixtureDir", fixtureDir).load()
      .groupBy(col("target_gid").as("task_gid"),
        session_window(col("created_at"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("created_by_gid")).as("n_authors"))
      .select(col("task_gid"),
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("n_events"), col("n_authors"))
      .orderBy("task_gid", "session_start")

  /** The production ETL's primary sink as a first-class query: a
    * date-partitioned parquet write (the 100 TB layout — SURVEY.md §7.5:
    * fact tables partitioned by a date derivative so every incremental run
    * overwrites only its own partitions) followed by a read-back that
    * proves the layout works: the year predicate becomes a partition
    * filter at the scan (asserted in PlanShapeSpec), so a 1000-executor
    * read touches 2 years of files, not the whole history. */
  val sink_partitioned: Q = (s, d) => {
    import graft.util.Det._
    val out = sinkDir(d, "partitioned_orders")
    orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    s.read.parquet(out)
      .where(col("o_year").isin(1994, 1995))
      .groupBy("o_year", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_year", "o_orderstatus")
  }

  /** Subtask-hierarchy flattening: every task resolved to its ROOT task
    * (the `parent` chain — Asana nests subtasks arbitrarily deep), then a
    * per-tree rollup. Spark has no recursive CTE; the scale-correct
    * formulation is pointer jumping — each round joins the current
    * gid→root mapping with itself, DOUBLING resolved depth, so k rounds
    * cover depth 2^k (vs one join per level for the naive walk). The
    * bound is FIXED (4 rounds = depth 16, generous for Asana subtask
    * nesting), not a convergence loop: a depth beyond it would resolve to
    * a non-root ancestor — which the no-resolved-root-has-a-parent
    * invariant test and the oracle diff both catch, and which a driver
    * while-loop over count() would detect at the cost of an extra job per
    * round. The oracle is DuckDB's genuine WITH RECURSIVE — two totally
    * different evaluation strategies agreeing on the answer. */
  val asana_task_roots: Q = (s, _) => {
    val tasks = s.read.format("graft.asana.AsanaSource")
      .option("entity", "tasks").option("fixtureDir", fixtureDir).load()
      .select(col("gid"), col("parent"), col("name"), col("completed"),
        col("num_likes"))
    var cur = tasks.select(col("gid"),
      coalesce(col("parent"), col("gid")).as("root"))
    for (_ <- 1 to 4) {
      val hop = cur.select(col("gid").as("hg"), col("root").as("hr"))
      cur = cur.join(hop, col("root") === col("hg"))
        .select(col("gid"), col("hr").as("root"))
    }
    tasks.select(col("gid"), col("completed"), col("num_likes"))
      .join(cur, "gid")
      .groupBy("root")
      .agg(count(lit(1)).as("n_tasks"),
        sum(when(col("completed"), 1).otherwise(0)).as("n_done"),
        sum(col("num_likes")).as("likes"))
      .join(tasks.select(col("gid").as("root"), col("name").as("root_name")),
        "root")
      .select(col("root").as("root_gid"), col("root_name"),
        col("n_tasks"), col("n_done"), col("likes"))
      .orderBy("root_gid")
  }

  /** Dynamic partition overwrite — the incremental-rerun semantic a 100 TB
    * ETL depends on: re-running one day/year replaces ONLY that partition.
    * The query does a full load, then re-writes just 1995 with
    * partitionOverwriteMode=dynamic, and aggregates the read-back: if the
    * rewrite had appended, 1995 would double; if it had overwritten
    * statically, every other year would vanish — either way the oracle
    * (the same aggregate over the source table) catches it. */
  val sink_partition_overwrite: Q = (s, d) => {
    val out = sinkDir(d, "po_orders")
    val src = orders(s, d).withColumn("o_year", year(col("o_orderdate")))
    src.write.mode("overwrite").partitionBy("o_year").parquet(out)
    src.where(col("o_year") === 1995)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("o_year").parquet(out)
    s.read.parquet(out)
      .groupBy("o_year")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_year")
  }

  /** Multimodal decode pipeline stub: treats the utf-8 payload as an opaque
    * binary column and derives "image" features per partition via a typed
    * Dataset mapPartitions — the exact plumbing (schema, batch iteration,
    * partition-parallel decode) a real image/audio decode uses. The decode
    * itself is a STUB: this container has no codec libraries, so width/
    * height/mean_intensity are deterministic functions of the bytes. */
  val llm_mm_features: Q = (s, d) => {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          MMFeatures(id,
            64 + bytes.length % 64,
            64 + (bytes.length / 64) % 64,
            bytes.take(16).map(b => b & 0xff).sum / 16.0)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  val queries: Seq[(String, Q)] = Seq(
    "scan_jsonl" -> scan_jsonl,
    "scan_csv" -> scan_csv,
    "scan_orc" -> scan_orc,
    "asana_scan" -> asana_scan,
    "asana_denorm" -> asana_denorm,
    "asana_custom_fields" -> asana_custom_fields,
    "asana_tags_denorm" -> asana_tags_denorm,
    "asana_stories_sessions" -> asana_stories_sessions,
    "asana_task_roots" -> asana_task_roots,
    "sink_partitioned" -> sink_partitioned,
    "sink_partition_overwrite" -> sink_partition_overwrite,
    "llm_mm_features" -> llm_mm_features,
  )

  val oracle: Seq[(String, String)] = Seq(
    "scan_jsonl" ->
      s"""SELECT gid, name, completed, num_likes,
              CAST(created_at AS TIMESTAMP) AS created_at,
              assignee.name AS assignee_name,
              CAST(len(tags) AS INT) AS n_tags,
              CAST(len(memberships) AS INT) AS n_memberships
          FROM read_json_auto('$fixtureDir/tasks.jsonl', format='newline_delimited')
          ORDER BY gid""",
    "scan_csv" ->
      s"""SELECT gid, name, completed, num_likes,
              CAST(created_at AS TIMESTAMP) AS created_at, project_gid
          FROM read_csv_auto('$fixtureDir/tasks_export.csv', header=true)
          ORDER BY gid""",
    "scan_orc" ->
      """SELECT p_partkey, p_name, p_size, p_retailprice
         FROM part WHERE p_size <= 20 ORDER BY p_partkey""",
    "asana_scan" ->
      s"""SELECT gid, name, completed, num_likes,
              CAST(modified_at AS TIMESTAMP) AS modified_at
          FROM read_json_auto('$fixtureDir/pages/tasks/page_*.jsonl', format='newline_delimited')
          WHERE CAST(modified_at AS TIMESTAMP) >= TIMESTAMP '2024-01-15'
          ORDER BY gid""",
    "asana_denorm" ->
      s"""SELECT u.name AS user_name, count(1) AS n_tasks,
              CAST(sum(CASE WHEN t.completed THEN 1 ELSE 0 END) AS BIGINT) AS n_done,
              CAST(sum(t.num_likes) AS BIGINT) AS likes
          FROM read_json_auto('$fixtureDir/pages/tasks/page_*.jsonl', format='newline_delimited') t
          JOIN read_json_auto('$fixtureDir/users.jsonl', format='newline_delimited') u
            ON t.assignee.gid = u.gid
          GROUP BY u.name ORDER BY user_name""",
    "asana_custom_fields" ->
      s"""WITH t AS (
            SELECT gid AS task_gid, unnest(custom_fields) AS cf
            FROM read_json_auto('$fixtureDir/pages/tasks/page_*.jsonl', format='newline_delimited'))
          SELECT task_gid, cf.gid AS field_gid, cf.name AS field_name,
              cf.type AS field_type,
              coalesce(cf.enum_value.name,
                  CAST(CAST(cf.number_value AS DECIMAL(38,6)) AS VARCHAR),
                  cf.text_value) AS value
          FROM t ORDER BY task_gid, field_gid, value NULLS FIRST""",
    "asana_tags_denorm" ->
      s"""SELECT tag.name AS tag_name, count(1) AS n_tasks,
              CAST(sum(CASE WHEN completed THEN 1 ELSE 0 END) AS BIGINT) AS n_done,
              CAST(sum(num_likes) AS BIGINT) AS likes
          FROM (SELECT gid, completed, num_likes, unnest(tags) AS tag
                FROM read_json_auto('$fixtureDir/tasks.jsonl', format='newline_delimited'))
          GROUP BY tag.name ORDER BY tag_name""",
    "asana_stories_sessions" ->
      s"""WITH s AS (
            SELECT target.gid AS task_gid, CAST(created_at AS TIMESTAMP) AS ts,
                created_by.gid AS author
            FROM read_json_auto('$fixtureDir/stories.jsonl', format='newline_delimited')),
          marked AS (
            SELECT *, CASE WHEN ts - lag(ts) OVER (PARTITION BY task_gid ORDER BY ts)
                                <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s
            FROM s),
          sess AS (
            SELECT *, sum(new_s) OVER (PARTITION BY task_gid ORDER BY ts
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked)
          SELECT task_gid, min(ts) AS session_start,
              max(ts) + INTERVAL 30 MINUTE AS session_end,
              count(1) AS n_events, count(DISTINCT author) AS n_authors
          FROM sess GROUP BY task_gid, sid
          ORDER BY task_gid, session_start""",
    "asana_task_roots" ->
      s"""WITH RECURSIVE t AS (
            SELECT gid, parent, name, completed, num_likes
            FROM read_json_auto('$fixtureDir/pages/tasks/page_*.jsonl', format='newline_delimited')),
          up AS (
            SELECT gid AS start, gid AS cur, parent FROM t
            UNION ALL
            SELECT up.start, t.gid AS cur, t.parent
            FROM up JOIN t ON up.parent = t.gid),
          roots AS (SELECT start AS gid, cur AS root FROM up WHERE parent IS NULL),
          agg AS (
            SELECT r.root, count(1) AS n_tasks,
                CAST(sum(CASE WHEN t.completed THEN 1 ELSE 0 END) AS BIGINT) AS n_done,
                CAST(sum(t.num_likes) AS BIGINT) AS likes
            FROM roots r JOIN t ON r.gid = t.gid GROUP BY r.root)
          SELECT a.root AS root_gid, t.name AS root_name,
              a.n_tasks, a.n_done, a.likes
          FROM agg a JOIN t ON a.root = t.gid
          ORDER BY root_gid""",
    "sink_partitioned" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderstatus,
             count(1) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders WHERE year(o_orderdate) IN (1994, 1995)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "sink_partition_overwrite" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, count(1) AS n_orders
         FROM orders GROUP BY 1 ORDER BY 1""",
    "llm_mm_features" ->
      """SELECT doc_id,
             CAST(64 + length(text) % 64 AS INT) AS width,
             CAST(64 + (length(text) // 64) % 64 AS INT) AS height,
             list_aggregate(list_transform(range(1, 17), i -> ascii(text[i])), 'sum') / 16.0 AS mean_intensity
         FROM documents ORDER BY doc_id""",
  )
}
