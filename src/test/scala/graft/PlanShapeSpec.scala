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

  test("join_range joins on the (user_id, time-bucket) composite equi-key") {
    withStaticPlan {
      val df = ops.Relational.join_range(spark, sf)
      val p = planOf(df)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"range join degenerated:\n$p")
      // the shuffle key must carry the 30-min epoch bucket alongside
      // user_id — with user_id alone (15 distinct values) every user's
      // event list pairs quadratically inside one task (round-4 verdict
      // #3); the bucket bounds candidates per key at any scale
      // any EQUI join algorithm qualifies (tiny SFs broadcast; at scale
      // the same keys shuffle) — what matters is the composite key set
      val keys = df.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          j.leftKeys
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          j.leftKeys
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          j.leftKeys
      }
      assert(keys.exists(ks => ks.size >= 2 &&
        ks.exists(_.toString.contains("user_id")) &&
        ks.exists(_.toString.contains("tb"))),
        s"composite (user_id, bucket) equi-key missing:\n$p")
    }
  }

  test("join_nullsafe stays an equi join (EqualNullSafe key), never BNLJ") {
    withStaticPlan {
      // the whole point of <=> over the (a = b OR both-null) rewrite: the
      // null-safe comparison is hash-partitionable, so Catalyst keeps a
      // real equi algorithm; the rewrite forces BroadcastNestedLoopJoin
      val p = planOf(ops.Relational.join_nullsafe(spark, sf))
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"null-safe join degenerated:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"), s"no equi join present:\n$p")
    }
  }

  test("llm_dedup_substr and llm_dedup_semantic stay equi-shaped — " +
      "no cross product anywhere in either dedup plan") {
    withStaticPlan {
      // substr: window fan-out → hash agg on wtext → equi probe join →
      // doc_id reassembly; semantic: cell-key self-join. Neither may
      // degrade to CartesianProduct/BNLJ — that's the difference between
      // linear/n²-over-k and n² at corpus scale.
      for ((name, df) <- Seq(
          "llm_dedup_substr" -> ops.Llm.llm_dedup_substr(spark, sf),
          "llm_dedup_semantic" -> ops.Llm.llm_dedup_semantic(spark, sf))) {
        val p = planOf(df)
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"),
          s"$name degenerated to a cross product:\n$p")
      }
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

  test("sink_partitioned read-back applies the year as a partition filter") {
    withStaticPlan {
      val p = planOf(ops.Sources.sink_partitioned(spark, sf))
      val partFilters = p.linesIterator
        .find(_.contains("PartitionFilters")).getOrElse("")
      assert(partFilters.contains("o_year"),
        s"year predicate not a partition filter:\n$p")
    }
  }

  test("llm_dsir ends in TakeOrderedAndProject — the top-40 never " +
      "global-sorts the scored corpus") {
    withStaticPlan {
      val p = planOf(ops.Llm.llm_dsir(spark, sf))
      assert(p.contains("TakeOrderedAndProject"),
        s"top-40 not a partial top-k:\n$p")
    }
  }

  test("llm_hard_negatives streams the corpus against BROADCAST " +
      "anchors and never shuffles the vectors") {
    withStaticPlan {
      val p = planOf(ops.Llm.llm_hard_negatives(spark, sf))
      // r16: the BroadcastNestedLoopJoin + per-pair HOF cosine became
      // the typed primitive-array kernel (the rerankExact pattern) —
      // anchors ride an sc.broadcast into a flatMap, so the plan must
      // show the kernel (object boundary) and still no vector shuffle
      // or join node anywhere below the top-k window
      assert(p.contains("SerializeFromObject"),
        s"typed anchor kernel missing:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
          && !p.contains("CartesianProduct"),
        s"vector side got shuffled/joined:\n$p")
    }
  }

  test("a shallow clone's plain read keeps the owned-table plan shape " +
      "(no remap join), and only borrowed+DV reads add the remap") {
    import spark.implicits._
    withStaticPlan {
      val src = java.nio.file.Files
        .createTempDirectory("plan_clone_src").toString
      val dst = java.nio.file.Files
        .createTempDirectory("plan_clone_dst").toString + "/t"
      graft.table.GraftTable.create(spark, src,
        (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
        Seq("id"), Seq("id"), numFiles = 1)
      graft.table.GraftTable.cloneTable(src, dst)
      // a borrowed read WITHOUT DVs is one plain vectorized scan —
      // zero joins, the exact owned-table fast path
      val p0 = planOf(graft.table.GraftTable.read(spark, dst))
      assert(!p0.contains("Join"), s"clone fast path grew a join:\n$p0")
      // a DV'd read on the clone adds the DV anti-join AND the
      // suffix→stored-path remap join (borrowed absolute paths); the
      // same DV'd read on the OWNED source has only the anti-join
      graft.table.GraftTable.deleteMor(spark, dst,
        Seq(3L).toDF("id"), "id")
      graft.table.GraftTable.deleteMor(spark, src,
        Seq(4L).toDF("id"), "id")
      def joins(p: String): Int =
        p.linesIterator.count(_.contains("BroadcastHashJoin"))
      val pSrc = planOf(graft.table.GraftTable.read(spark, src))
      val pDst = planOf(graft.table.GraftTable.read(spark, dst))
      assert(joins(pSrc) == 1,
        s"owned DV read must keep exactly the anti-join:\n$pSrc")
      assert(joins(pDst) == 2,
        s"borrowed DV read must add exactly the remap join:\n$pDst")
    }
  }

  test("win_dist_salted joins its stats side as a broadcast") {
    // the skew-safe distribution plan must keep the per-bucket stats table
    // on the broadcast side — a shuffled join would reintroduce the very
    // exchange the salting exists to avoid
    withStaticPlan {
      val p = planOf(ops.Windows.win_dist_salted(spark, sf))
      assert(p.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$p")
    }
  }

  test("llm_corpus adds zero exchanges over llm_pipeline") {
    // the assembly tail (sampling + split) must stay map-side arithmetic:
    // any new Exchange means a predicate accidentally became a shuffle
    withStaticPlan {
      def exchanges(p: String): Int =
        p.linesIterator.count(_.contains("Exchange"))
      val pipeline = exchanges(planOf(ops.Llm.llm_pipeline(spark, sf)))
      val corpus = exchanges(planOf(ops.Llm.llm_corpus(spark, sf)))
      assert(corpus <= pipeline,
        s"llm_corpus has $corpus exchanges vs llm_pipeline's $pipeline")
    }
  }

  test("win_funnel aggregates partially and never nest-loops") {
    withStaticPlan {
      val p = planOf(ops.Windows.win_funnel(spark, sf))
      // every stage is a conditional min-agg on user_id: partial
      // aggregation must ride the map side (bounded shuffle payload at
      // any scale), and no stage join may degenerate to nested-loop
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"funnel degenerated:\n$p")
      assert(p.contains("partial_min") || p.contains("partial_"),
        s"funnel stage aggregation lost its map-side combine:\n$p")
    }
  }

  test("llm_cap_source shuffles once on the window partition key") {
    withStaticPlan {
      val p = planOf(ops.Llm.llm_cap_source(spark, sf))
      // one hash exchange on source feeds the rank window; the only
      // other exchange is the output-determinism range sort
      val hashEx = "Exchange hashpartitioning".r
        .findAllIn(p).length
      assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$p")
      assert(p.contains("RunningWindowFunction") || p.contains("Window"),
        s"rank window missing:\n$p")
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

  private def rmRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmRec)
    f.delete(); ()
  }

  test("date-partitioned writes enable partition pruning at the scan") {
    // the 100 TB layout (SURVEY.md §7.5): fact tables partitioned by a date
    // key; a year predicate must prune directories, not filter rows
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toFile
    try {
      graft.util.Tables.orders(spark, sf)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.partitionBy("o_year").mode("overwrite").parquet(dir.getPath)
      withStaticPlan {
        val df = spark.read.parquet(dir.getPath).where(col("o_year") === 1997)
        val p = planOf(df)
        assert(p.contains("PartitionFilters: [isnotnull(o_year"),
          s"year predicate not applied as a partition filter:\n$p")
        val expected = graft.util.Tables.orders(spark, sf)
          .where(year(col("o_orderdate")) === 1997).count()
        assert(df.count() == expected)
      }
    } finally rmRec(dir)
  }

  test("table_sql_partitioned: the partition filter reaches the FileScan " +
      "as PartitionFilters, and a dim join gets DPP on the graft table") {
    withStaticPlan {
      val df = ops.Table.table_sql_partitioned(spark, sf)
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty && scans.exists(_.partitionFilters.nonEmpty),
        s"no PartitionFilters on the graft partitioned read:\n" +
          df.queryExecution.executedPlan)
      // DPP: the dim-side predicate is invisible to the fact statically;
      // the graft read must accept a dynamicpruningexpression exactly
      // like a native partitioned parquet table (sink_dpp's contract)
      import org.apache.spark.sql.functions.{broadcast, col, lit, when}
      val fact = graft.sql.GraftSql.sql(spark,
        s"SELECT * FROM ${ops.Table.partOrdersName(spark, sf)}")
      val dim = graft.util.Tables.orders(spark, sf)
        .select(org.apache.spark.sql.functions.year(col("o_orderdate"))
          .as("d_year")).distinct()
        .withColumn("era",
          when(col("d_year") <= lit(1997), "early").otherwise("late"))
        .where(col("era") === "early")
      val joined = fact.join(broadcast(dim),
        col("o_year") === col("d_year"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruningexpression"),
        s"no dynamic partition pruning on the graft fact scan:\n$p")
    }
  }

  test("sink_dpp read-back prunes fact partitions dynamically") {
    // the dim-side era predicate is invisible to the fact statically — the
    // executed plan must carry a dynamicpruningexpression on the fact
    // scan's PartitionFilters (runtime pruning from the broadcast result),
    // or the scan reads every year of a 100 TB history
    withStaticPlan {
      val p = planOf(ops.Sources.sink_dpp(spark, sf))
      assert(p.contains("dynamicpruningexpression"),
        s"no dynamic partition pruning in:\n$p")
    }
  }

  test("bucketed tables join without a shuffle") {
    // pre-bucketing both sides on the join key removes the per-query
    // exchange — the co-located-join strategy for repeated 100 TB joins
    // DROP TABLE alone is not enough: the in-memory catalog of a fresh JVM
    // has no entry, but the previous run's warehouse directory survives and
    // saveAsTable refuses the location — remove both (at the configured
    // warehouse dir, not a cwd-relative guess).
    val warehouse = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    def reset(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(warehouse, t)
      if (loc.exists()) rmRec(loc)
    }
    reset("graft_cust_b")
    reset("graft_ord_b")
    graft.util.Tables.customer(spark, sf)
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("graft_cust_b")
    graft.util.Tables.orders(spark, sf)
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("graft_ord_b")
    withStaticPlan {
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("graft_cust_b").join(spark.table("graft_ord_b"),
          org.apache.spark.sql.functions.col("c_custkey") ===
            org.apache.spark.sql.functions.col("o_custkey"))
        val p = planOf(j)
        assert(p.contains("SortMergeJoin"))
        assert(!p.contains("Exchange"),
          s"bucketed join still shuffles:\n$p")
        assert(j.count() > 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevThreshold)
    }
  }

  test("join_salted shuffles on (key, salt) so a hot key spreads") {
    // broadcast suppressed: at fixture scale the dim would broadcast and
    // no exchange would exist to salt — the assertion pins the shuffled
    // shape the operator exists for
    withStaticPlan {
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p = planOf(ops.Relational.join_salted(spark, sf))
        assert("hashpartitioning\\(l_orderkey#\\d+L?, salt#".r
          .findFirstIn(p).isDefined,
          s"fact exchange does not partition on (l_orderkey, salt):\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevThreshold)
    }
  }

  test("persisted LSH band table self-joins with zero Exchange") {
    // pay the banding + bucketed layout once, then every candidate join
    // scans co-located buckets — the repeated-dedup strategy at 100 TB.
    // Broadcast disabled so the assertion pins the co-located SMJ, not a
    // fixture-size broadcast that would vanish at scale.
    withStaticPlan {
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val bt = ops.Llm.lshBandTable(spark, sf)
        val j = ops.Llm.bandSelfJoin(bt)
        val p = planOf(j)
        assert(p.contains("SortMergeJoin"))
        assert(!p.contains("Exchange"),
          s"bucketed band self-join still shuffles:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevThreshold)
    }
  }

  test("persisted MinHash band table self-joins with zero Exchange") {
    // llm_dedup_text's candidate join over the bucketed doc-side band
    // table — the same pay-layout-once contract as the vector band
    // table above, asserted on the same pre-distinct join shape
    withStaticPlan {
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val (band, _) = ops.Llm.dedupTextTables(spark, sf)
        val p = planOf(ops.Llm.minhashBandSelfJoin(band))
        assert(p.contains("SortMergeJoin"))
        assert(!p.contains("Exchange"),
          s"bucketed MinHash band self-join still shuffles:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevThreshold)
    }
  }

  test("llm_tfidf tokenizes the full corpus once; the tf pass reads " +
      "only the scored doc slice (pushed to the scan)") {
    // r5 pinned ONE full-corpus explode (the join-back form then planned
    // it twice and doubled the query). r16 keeps that bound — df is the
    // only full-corpus tokenize — but computes tf from the doc_id < 50
    // slice with the predicate pushed into the parquet scan, so the
    // second Generate runs over ~1% of the corpus and the corpus-wide
    // window sort (Exchange + Sort by term) is gone.
    withStaticPlan {
      val p = planOf(ops.Llm.llm_tfidf(spark, sf))
      val n = p.linesIterator.count(_.contains("Generate explode"))
      assert(n == 2, s"expected df + sliced-tf Generates, got $n in:\n$p")
      assert(p.contains("LessThan(doc_id,50)"),
        s"tf slice not pushed to the scan:\n$p")
    }
  }

  test("llm_ngram_freq expands pairs once and combines map-side") {
    withStaticPlan {
      val p = planOf(ops.Llm.llm_ngram_freq(spark, sf))
      // one Generate (the adjacent-pair explode) — a doubled expansion
      // subtree would double the dominant cost, the llm_tfidf lesson
      val gens = "Generate".r.findAllIn(p).length
      assert(gens == 1, s"expected 1 Generate, got $gens:\n$p")
      // the (lang, bigram) count must combine before its exchange so
      // the shuffle carries distinct-bigram volume, not corpus volume
      assert(p.contains("partial_count") || p.contains("partial_"),
        s"bigram count lost its map-side combine:\n$p")
    }
  }

  test("llm_decontaminate probes the eval grams via broadcast") {
    // the eval side is benchmark-suite-sized at any corpus scale — the
    // contamination probe must be a map-side BroadcastHashJoin so the
    // 100 TB corpus side is never shuffled for it
    withStaticPlan {
      val p = planOf(ops.Llm.llm_decontaminate(spark, sf))
      assert(p.contains("BroadcastHashJoin"),
        s"eval-gram probe is not broadcast:\n$p")
    }
  }

  test("llm_ann_ivf_indexed reads only the probed cells' partitions") {
    // the persisted index's point: a probe's IO is nprobe directories,
    // not the corpus — the scan must carry a PartitionFilters entry on
    // the cell column (partition pruning), mirroring sink_dpp's static
    // assertion
    withStaticPlan {
      val p = planOf(ops.Llm.ivfIndexProbe(spark, sf))
      assert(p.contains("PartitionFilters: ["), s"no partition filter:\n$p")
      assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
        s"partition filter does not prune on cell:\n$p")
    }
  }

  test("llm_ann_incr probes the merged index through partition pruning") {
    // the incremental index keeps the persisted-index IO contract: the
    // multi-query probe still reads only the union of probed cells
    withStaticPlan {
      val p = planOf(ops.Llm.ivfIncrProbe(spark, sf))
      assert(p.contains("PartitionFilters: ["), s"no partition filter:\n$p")
      assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
        s"partition filter does not prune on cell:\n$p")
    }
  }

  test("llm_ann_ivfpq_indexed probes the code index through partition " +
      "pruning") {
    // the persisted PQ index's point doubled: nprobe directories AND 16
    // bytes of codes per candidate — the scan must prune on cell and
    // must NOT read an emb column (the codes are the payload)
    withStaticPlan {
      val p = planOf(ops.Llm.ivfPqIndexShortlist(spark, sf))
      assert(p.contains("PartitionFilters: ["), s"no partition filter:\n$p")
      assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
        s"partition filter does not prune on cell:\n$p")
      assert(!"ReadSchema: [^\\n]*emb".r.findFirstIn(p).isDefined,
        s"the code-index scan must not read raw vectors:\n$p")
    }
  }

  test("AQE splits a skewed shuffle join at runtime (skew=true in plan)") {
    // join_salted / win_*_salted are the manual skew recipes; AQE's
    // OptimizeSkewedJoin is the zero-code path for 100 TB hot keys.
    // Prove the session config actually fires it: a hot-key SMJ whose
    // post-shuffle partition exceeds the (lowered, fixture-sized)
    // thresholds must come out of the adaptive re-plan with skew=true
    // on the join node.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // skew splits happen at per-MAPPER granularity — a single-partition
      // local Seq cannot be split, so build both sides with real map
      // parallelism (8 slices)
      val left = spark.range(0, 200000, 1, 8)
        .select(when(col("id") % 20 === 0, concat(lit("c"), col("id")))
          .otherwise(lit("HOT")).as("k"), col("id").as("v"))
      val right = spark.range(0, 101, 1, 2)
        .select(when(col("id") === 0, lit("HOT"))
          .otherwise(concat(lit("c"), col("id"))).as("k"),
          lit(1L).as("w"))
      // no same-key aggregate downstream: a groupBy("k") above the join
      // would REQUIRE the join's hash distribution, and AQE declines to
      // split a skewed partition when the split breaks a required
      // distribution (it would cost an extra shuffle)
      val j = left.join(right, "k").select(col("v"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the hot-key join as skewed:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("cap_source/ngram_freq escalate to the salted two-phase window " +
      "when the probe trips; direct single-window plan otherwise") {
    // the topKByKey dispatch (VERDICT r6 #4): under the threshold the
    // plan must be ONE window partitioned by the bare key; over it, a
    // local (key, __salt) window pruning to k before the global one
    withStaticPlan {
      def windowSpecs(p: String): Seq[String] =
        "(?m)^.*Window \\[.*$".r.findAllIn(p).toSeq
      val direct = planOf(ops.Llm.capSource(spark, sf))
      assert(!direct.contains("__salt"),
        s"unskewed fixture must not pay the salted path:\n$direct")
      val salted = planOf(ops.Llm.capSource(spark, sf, skewThreshold = 0L))
      val specs = windowSpecs(salted)
      assert(specs.exists(_.contains("__salt")),
        s"no (key, __salt) local window in:\n$salted")
      assert(specs.size >= 2,
        s"salted plan needs local + global windows, got:\n$salted")
      val saltedN = planOf(ops.Llm.ngramFreq(spark, sf, skewThreshold = 0L))
      assert(windowSpecs(saltedN).exists(_.contains("__salt")),
        s"ngram_freq salted path missing its local window:\n$saltedN")
    }
  }

  test("stream_join stays an equi join on user_id (range as post-filter)") {
    withStaticPlan {
      val p = planOf(ops.Streaming.stream_join(spark, sf))
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"interval join degenerated to a non-equi algorithm:\n$p")
    }
  }

  test("dq_check: referential check is an anti join") {
    withStaticPlan {
      val p = planOf(ops.Quality.dq_check(spark, sf))
      assert(p.contains("LeftAnti"), s"no anti join in:\n$p")
    }
  }

  test("runtime bloom-filter join: the selective dim side injects a " +
      "bloom probe into the fact scan side") {
    // Spark's InjectRuntimeFilter (the row-level runtime filter behind
    // big-shuffle-join pruning at scale): with broadcast suppressed and
    // the size thresholds at fixture scale, a selective filter on the
    // orders side must plant bloom_filter_might_contain on the lineitem
    // side — the optimizer surface that makes selective fact-fact joins
    // scan-bounded at 100 TB. Default thresholds (10 GB application
    // side) only trigger on real tables; the conf here scales them to
    // the fixture, nothing else changes.
    import org.apache.spark.sql.functions._
    val keep = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      val li = graft.util.Tables.lineitem(spark, sf)
      val od = graft.util.Tables.orders(spark, sf)
        .where(col("o_orderpriority") === "1-URGENT")
      val j = li.join(od, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      // Spark 4.x renders the probe as might_contain over a
      // bloom_filter_agg scalar subquery on the creation side
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n$p")
      assert(p.indexOf("might_contain") <
        p.indexOf("FileScan parquet [l_orderkey"),
        s"bloom probe must guard the fact (lineitem) side:\n$p")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("dq detectors window over the aggregated (type, day) relation, " +
      "never over raw events") {
    // the family's scale contract: one scan of the audited table, one
    // hash aggregation down to the tiny keyed relation (types x days /
    // nine digits / types), and every window sits ABOVE that
    // aggregate — so window input is constant-size at any corpus
    // size. Asserted structurally on the executed plan for the three
    // r9 detectors plus the benford and freshness screens (dq_drift
    // shares the kernel shape and is pinned by its oracle row).
    withStaticPlan {
      for ((name, q) <- Seq[(String, ops.Q)](
          "dq_anomaly" -> ops.Quality.dq_anomaly,
          "dq_mad" -> ops.Quality.dq_mad,
          "dq_cusum" -> ops.Quality.dq_cusum,
          "dq_benford" -> ops.Quality.dq_benford,
          "dq_freshness" -> ops.Quality.dq_freshness)) {
        val plan = q(spark, sf).queryExecution.executedPlan
        val scans = plan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }
        assert(scans.size == 1, s"$name: expected one events scan:\n$plan")
        val wins = plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
        assert(wins.nonEmpty, s"$name: no window node found:\n$plan")
        wins.foreach { w =>
          val aggBelow = w.child.collect {
            case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
          }
          assert(aggBelow.nonEmpty,
            s"$name: a window runs over raw events (no aggregate below):\n$plan")
        }
      }
    }
  }

  test("dq_profile is ONE scan: no per-column rescans") {
    withStaticPlan {
      val df = ops.Quality.dq_profile(spark, sf)
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size == 1,
        s"profile must not rescan per column:\n${planOf(df)}")
    }
  }

  test("graft_table TVF: outer predicate and projection reach the " +
      "parquet scan (pushdown through the spliced plan)") {
    // the SQL doorway must not cost plan quality: the TVF splices the
    // manifest-planned read as a plain FileScan, so a WHERE on the
    // outer query pushes into PushedFilters and an outer SELECT prunes
    // ReadSchema — the two properties that make the SQL surface usable
    // at 100 TB, asserted on the executed plan rather than assumed.
    withStaticPlan {
      val root = ops.Table.ordersTable(spark, sf)
      graft.functions.GraftTableFunctions.register(spark)
      val df = spark.sql(
        s"""SELECT o_orderkey FROM graft_table('$root', 1)
            WHERE o_orderkey = 42""")
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, planOf(df))
      val meta = scans.map(_.metadata).head
      assert(meta("PushedFilters").contains("EqualTo(o_orderkey,42)"),
        s"predicate must push into the scan: $meta")
      assert(meta("ReadSchema").contains("o_orderkey") &&
        !meta("ReadSchema").contains("o_comment"),
        s"projection must prune the read schema: ${meta("ReadSchema")}")
    }
  }

  test("llm_ann_pq plans its two stages as claimed: shortlist + rerank " +
      "top-ks are TakeOrderedAndProject, the rerank joins the 50-row " +
      "shortlist by broadcast — no shuffle carries vectors") {
    withStaticPlan {
      val plan = ops.Llm.llm_ann_pq(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), plan)
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("SortMergeJoin"), plan)
    }
  }

  test("registered-name SQL read (GraftSql): predicate and projection " +
      "push through the spliced snapshot plan like the TVF's") {
    // the write surface's read case must match the TVF's plan quality:
    // a registered name resolves to the same manifest-planned FileScan,
    // so WHERE pushes into PushedFilters and SELECT prunes ReadSchema
    withStaticPlan {
      val root = ops.Table.ordersTable(spark, sf)
      graft.sql.GraftSqlTables.register("psp_orders",
        graft.sql.GraftSqlTables.Ref(root, "o_orderkey",
          Seq("o_year", "o_orderkey"), Seq("o_year", "o_orderkey")))
      val df = graft.sql.GraftSql.sql(spark,
        "SELECT o_orderkey FROM psp_orders WHERE o_orderkey = 42")
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, planOf(df))
      val meta = scans.map(_.metadata).head
      assert(meta("PushedFilters").contains("EqualTo(o_orderkey,42)"),
        s"predicate must push into the scan: $meta")
      assert(meta("ReadSchema").contains("o_orderkey") &&
        !meta("ReadSchema").contains("o_comment"),
        s"projection must prune the read schema: ${meta("ReadSchema")}")
    }
  }

  test("win_share_salted is window-free: two-phase salted totals + " +
      "broadcast join, no per-customer WindowExec") {
    withStaticPlan {
      val p = planOf(ops.Windows.win_share_salted(spark, sf))
      assert(!p.contains("Window"),
        s"the decomposed form must not fall back to a window:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"totals must broadcast back:\n$p")
    }
  }

  test("sql view read: outer predicates push THROUGH the view body into " +
      "the manifest-planned parquet scan — no materialization fence") {
    // the view inlines its re-parsed body before optimization, so an
    // outer WHERE must land in PushedFilters alongside the body's own
    // filter, and an outer SELECT must prune ReadSchema — the properties
    // that make a view-heavy SQL deployment usable at 100 TB
    withStaticPlan {
      val root = ops.Table.ordersTable(spark, sf)
      graft.sql.GraftSqlTables.register("psp_v_orders",
        graft.sql.GraftSqlTables.Ref(root, "o_orderkey",
          Seq("o_year", "o_orderkey"), Seq("o_year", "o_orderkey")))
      try {
        graft.sql.GraftSql.exec(spark,
          """CREATE VIEW psp_view AS
             SELECT o_orderkey, o_year, o_totalprice
             FROM psp_v_orders WHERE o_year >= 1996""")
        val df = graft.sql.GraftSql.sql(spark,
          "SELECT o_orderkey FROM psp_view WHERE o_orderkey = 42")
        val scans = df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }
        assert(scans.nonEmpty, planOf(df))
        val meta = scans.map(_.metadata).head
        assert(meta("PushedFilters").contains("EqualTo(o_orderkey,42)"),
          s"outer predicate must push through the view: $meta")
        assert(meta("PushedFilters").contains("GreaterThanOrEqual(o_year,1996)"),
          s"the view body's own filter must push too: $meta")
        assert(meta("ReadSchema").contains("o_orderkey") &&
          !meta("ReadSchema").contains("o_totalprice"),
          s"outer projection must prune through the view: ${meta("ReadSchema")}")
      } finally {
        graft.sql.GraftSqlViews.unregister(Seq("psp_view"))
        graft.sql.GraftSqlTables.unregister("psp_v_orders")
      }
    }
  }

  test("r9 analytics ops keep their scale shapes: ohlc/gini/entropy " +
      "single-agg or window-then-agg, rolling_distinct join-free fan-out, " +
      "jaccard no cartesian") {
    withStaticPlan {
      // win_ohlc: ONE aggregation pass (partial+final HashAggregate over
      // one Exchange) — no window over raw events, no join
      val ohlc = planOf(ops.Windows.win_ohlc(spark, sf))
      assert(!ohlc.contains("Window") && !ohlc.contains("Join"), ohlc)
      // win_rolling_distinct: the 7-day fan-out must stay a projection
      // (explode), never an SMJ/range join; the only join is the 1-row
      // broadcast max-day clip
      val rd = planOf(ops.Windows.win_rolling_distinct(spark, sf))
      assert(!rd.contains("SortMergeJoin") && !rd.contains("CartesianProduct"),
        rd)
      assert(rd.contains("Generate explode"), rd)
      // agg_entropy/agg_gini: the window runs AFTER the shrinking agg /
      // over the same group-keyed shuffle — exactly one scan of events
      // or orders respectively
      def scanCount(p: String, token: String): Int =
        p.sliding(token.length).count(_ == token)
      val ent = planOf(ops.Relational.agg_entropy(spark, sf))
      assert(scanCount(ent, "FileScan parquet") == 1, ent)
      val gini = planOf(ops.Relational.agg_gini(spark, sf))
      assert(scanCount(gini, "FileScan parquet") == 1, gini)
      // graph_jaccard: wedge + anti + degree joins but never a cartesian
      val jac = planOf(ops.Graph.graph_jaccard(spark, sf))
      assert(!jac.contains("CartesianProduct") &&
        !jac.contains("BroadcastNestedLoopJoin"), jac)
    }
  }

  test("graph_modularity: label lookups broadcast onto the edge list, " +
      "no cartesian anywhere (the 1-row globals ride broadcast loops)") {
    withStaticPlan {
      val df = ops.Graph.graph_modularity(spark, sf)
      val p = planOf(df)
      assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
      val bhj = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          b
      }.size
      assert(bhj >= 2,
        s"expected the two label lookups as broadcast hash joins:\n$p")
    }
  }

  test("llm_rouge: overlap is an equi-join on (pair, n, gram) — no " +
      "cartesian, no join wider than the gram keys") {
    withStaticPlan {
      val df = ops.Llm.llm_rouge(spark, sf)
      val p = planOf(df)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), s"non-equi join crept in:\n$p")
    }
  }

  test("llm_dpo_pairs folds both pair sides in one pass: NO join node, " +
      "one (lang, source) shuffle feeds the windows") {
    withStaticPlan {
      val df = ops.Llm.llm_dpo_pairs(spark, sf)
      val p = planOf(df)
      // the chosen/rejected self-join formulation would re-execute the
      // scored+window subtree twice — the single-pass conditional
      // aggregation must keep the plan join-free
      assert(!p.contains("Join"), s"join node crept back in:\n$p")
      assert(p.contains("Window"), p)
    }
  }

  test("join_nearest is the linear merged-stream plan: window, NO join " +
      "node, one user-keyed shuffle") {
    withStaticPlan {
      val df = ops.Relational.join_nearest(spark, sf)
      val p = planOf(df)
      // the r9 form paid a |P_u|×|C_u| per-user pairwise join; the r10
      // plan must carry nearest-before/after through window frames only
      assert(!p.contains("Join"), s"join node crept back in:\n$p")
      assert(p.contains("Window"), p)
      // exactly one WindowExec: both frames share (user_id, (ts, id))
      // partition/order so Spark fuses them — a second WindowExec would
      // mean a second sort of the whole stream
      val winCount = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.size
      assert(winCount == 1, s"expected 1 WindowExec, got $winCount:\n$p")
      // shuffles: one hash exchange on user_id for the window + the
      // final ORDER BY range exchange — nothing else
      val exCount = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e
      }.size
      assert(exCount == 2, s"expected 2 exchanges, got $exCount:\n$p")
    }
  }

  test("ANALYZE statistics drive join planning: a DV-eaten registered " +
      "table broadcasts WITHOUT a hint only once its analyzed size is " +
      "on the manifest (raw file bytes pick SMJ)") {
    import spark.implicits._
    val t = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_stats_pin").toFile.getPath
    graft.util.AppCleanup.onExit(s"graft_stats_pin_$root")(
      graft.util.AppCleanup.recursiveDelete(new java.io.File(root)))
    // a table whose FILES overstate its live data: 20k rows of
    // incompressible payload in one file, then MOR-delete 999/1000 —
    // deletion vectors leave the bytes in place, so the file-size
    // heuristic sees ~1000× the live data
    t.create(spark, root,
      (1L to 20000L).map(i => (i, i)).toDF("id", "seed")
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.md5(
            org.apache.spark.sql.functions.col("seed").cast("string"))
            .as("pay")),
      Seq("id"), Seq("id"), numFiles = 1)
    t.deleteMor(spark, root, (1L to 20000L).filter(_ % 1000 != 0)
      .toDF("id"), "id")
    graft.sql.GraftSqlTables.register("stats_pin_t",
      graft.sql.GraftSqlTables.Ref(root, "id", Seq("id"), Seq("id")))
    // sized between the live-scaled analyzed estimate (~0.1% of the
    // ~700 KB file ≈ sub-KB) and BOTH sides' column-pruned raw
    // estimates (single-bigint prunes of ~100 KB+ files ≈ 10 KB+), so
    // pre-ANALYZE neither side may broadcast and post-ANALYZE only the
    // graft side may
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
    try {
      withStaticPlan {
        def plan() = graft.sql.GraftSql.sql(spark,
          s"""SELECT count(1) AS n
              FROM parquet.`$sf/lineitem.parquet` l
              JOIN stats_pin_t t ON l.l_orderkey = t.id""")
          .queryExecution.executedPlan.toString
        // BEFORE ANALYZE: no manifest stats → the leaf reports raw file
        // bytes (pruned, still > threshold) → the l_orderkey=id join
        // sort-merges (the DV anti-join's own hinted broadcast of the
        // tiny ordinal list is a DIFFERENT join — pin the KEYS)
        val before = plan()
        assert(before.contains("SortMergeJoin [l_orderkey"),
          s"pre-ANALYZE the raw-size estimate must refuse broadcast:\n" +
            before)
        // ANALYZE persists live-scaled bytes (~0.1% of the file) → the
        // SAME query now broadcasts, hint-free, driven by the stats
        graft.sql.GraftSql.exec(spark,
          "ANALYZE TABLE stats_pin_t COMPUTE STATISTICS")
        val after = plan()
        assert(after.contains("BroadcastHashJoin [l_orderkey"),
          s"post-ANALYZE the live-scaled size must broadcast:\n$after")
        // the stats changed the ESTIMATE, never the rows
        assert(graft.sql.GraftSql.sql(spark,
          "SELECT count(1) AS n FROM stats_pin_t").head().getLong(0)
          == 20L)
      }
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      graft.sql.GraftSqlTables.unregister("stats_pin_t")
    }
  }
}
