package graft

import org.apache.spark.sql.functions._

/** Graph-family cross-checks (SURVEY.md §2-M) beyond the SQL oracle:
  * algorithmic invariants the recursive-CTE oracle verifies only
  * end-to-end. Runs at sf0.01 — the sparse graph there has 13
  * components and the dense one ~100 triangles, so the properties bite
  * (sf0.001's graph is 1-2 edges). */
class GraphSpec extends SparkTestBase {
  val sf01 = "/root/testdata/sf0.01"

  test("graph_cc labels equal a driver-side union-find of the same edges") {
    import spark.implicits._
    val edges = ops.Graph.supplierEdges(spark, sf01, 59)
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b); if (ra != rb) parent(rb) = ra
    }
    val minOf = parent.keys.toSeq.groupBy(find).map { case (r, ns) =>
      r -> ns.min
    }
    val expect = parent.keys.map(n => n -> minOf(find(n))).toMap
    val got = ops.Graph.graph_cc(spark, sf01)
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
    assert(got.values.toSet.size >= 2, "fixture should have >1 component")
  }

  test("graph_bfs: seed at hops 0; every level-h node adjoins a level h-1 node") {
    import spark.implicits._
    val bfs = ops.Graph.graph_bfs(spark, sf01).as[(Long, Int)].collect()
    val level = bfs.toMap
    assert(level.valuesIterator.min == 0 && level.count(_._2 == 0) == 1)
    val sym = ops.Graph.supplierEdges(spark, sf01, 59).as[(Long, Long)]
      .collect().flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    bfs.filter(_._2 > 0).foreach { case (n, h) =>
      assert(sym(n).exists(u => level.get(u).contains(h - 1)),
        s"node $n at level $h has no neighbor at ${h - 1}")
    }
  }

  test("graph_triangles: total participation divisible by 3 and positive") {
    val total = ops.Graph.graph_triangles(spark, sf01)
      .agg(sum("tri_cnt")).head().getLong(0)
    assert(total > 0 && total % 3 == 0, s"total participation $total")
  }

  test("graph_pagerank: deterministic, teleport floor holds, mass bounded") {
    import spark.implicits._
    val a = ops.Graph.graph_pagerank(spark, sf01).as[(Long, Long)].collect()
    val b = ops.Graph.graph_pagerank(spark, sf01).as[(Long, Long)].collect()
    assert(a.toSeq == b.toSeq, "two invocations must be identical")
    assert(a.forall(_._2 >= 150000000000L), "teleport floor violated")
    // integer flooring only loses mass: total <= n * seed
    assert(a.map(_._2).sum <= a.length * 1000000000000L)
    assert(a.map(_._2).distinct.length > 1, "ranks should differentiate")
  }

  test("graph_pagerank: driver arm equals the distributed loop (budget 0)") {
    import spark.implicits._
    val driver = ops.Graph.graph_pagerank(spark, sf01)
      .as[(Long, Long)].collect().toSeq
    val dist = ops.Graph.pagerankOf(spark, sf01, 0L)
      .as[(Long, Long)].collect().toSeq
    assert(driver == dist, "budget arms must be value-identical")
  }

  test("graph_bfs: driver arm equals the distributed loop (budget 0)") {
    import spark.implicits._
    val driver = ops.Graph.graph_bfs(spark, sf01)
      .as[(Long, Int)].collect().toSeq
    val dist = ops.Graph.bfsOf(spark, sf01, 0L)
      .as[(Long, Int)].collect().toSeq
    assert(driver.nonEmpty, "sf0.01 sparse graph must reach nodes")
    assert(driver == dist, "budget arms must be value-identical")
  }

  test("graph_scc: driver Tarjan equals the distributed min-label " +
      "matching on the fixture, planted topologies, and a random graph") {
    import spark.implicits._
    // fixture: both arms, value-identical
    val driver = ops.Graph.graph_scc(spark, sf01)
      .as[(Long, Long)].collect().toSeq
    val dist = ops.Graph.sccOf(spark,
        ops.Graph.directedSupplierEdges(spark, sf01), 0L)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(driver.nonEmpty, "sf0.01 directed graph must have nodes")
    assert(driver == dist, "budget arms must be value-identical")
    // the fixture is non-trivial: singletons AND a multi-node SCC
    val sizes = driver.groupBy(_._2).map(_._2.size)
    assert(sizes.exists(_ > 1), "fixture must hold a multi-node SCC")
    assert(sizes.exists(_ == 1), "fixture must hold singleton SCCs")
    def both(es: Seq[(Long, Long)]): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
      val df = es.toDF("s", "t")
      (ops.Graph.sccOf(spark, df, Long.MaxValue)
         .orderBy("node").as[(Long, Long)].collect().toSeq,
       ops.Graph.sccOf(spark, df, 0L)
         .orderBy("node").as[(Long, Long)].collect().toSeq)
    }
    // planted: a 3-cycle feeding a 2-cycle through a one-way bridge,
    // plus an isolated chain (all singletons)
    val planted = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, // SCC {1,2,3}
      3L -> 10L, 10L -> 11L, 11L -> 10L, // bridge; SCC {10,11}
      20L -> 21L, 21L -> 22L) // chain: singletons
    val (pd, pp) = both(planted)
    assert(pd == pp)
    assert(pd.toMap == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L, 22L -> 22L))
    // random graph (fixed LCG, n=30, ~70 edges): arms agree exactly
    var x = 12345L
    def nxt(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x }
    val rnd = (1 to 70).map { _ =>
      (math.floorMod(nxt(), 30L), math.floorMod(nxt(), 30L))
    }.filter(e => e._1 != e._2).distinct
    val (rd, rp) = both(rnd)
    assert(rd == rp, "random-graph arms must be value-identical")
  }

  test("graph_sssp: hand-checked planted graph, arms value-identical " +
      "on fixture and random graphs, hop bound loud") {
    import spark.implicits._
    def both(es: Seq[(Long, Long, Long)])
        : (Seq[(Long, Option[Long])], Seq[(Long, Option[Long])]) = {
      val df = es.toDF("s", "t", "w")
      (ops.Graph.ssspOf(spark, df, Long.MaxValue)
         .orderBy("node").as[(Long, Option[Long])].collect().toSeq,
       ops.Graph.ssspOf(spark, df, 0L)
         .orderBy("node").as[(Long, Option[Long])].collect().toSeq)
    }
    // planted: source is min node 1. 1→2 (w5), 1→3 (w1), 3→2 (w1):
    // the 2-hop path beats the direct edge. 2→4 (w10); 5→1 unreachable
    // FROM 1 but puts 5 in the node set; a cycle 4→1 (w1) must not
    // loop the relaxation
    val planted = Seq((1L, 2L, 5L), (1L, 3L, 1L), (3L, 2L, 1L),
      (2L, 4L, 10L), (5L, 1L, 100L), (4L, 1L, 1L))
    val (pd, pp) = both(planted)
    assert(pd == pp, "budget arms must be value-identical")
    assert(pd == Seq(1L -> Some(0L), 2L -> Some(2L), 3L -> Some(1L),
      4L -> Some(12L), 5L -> None), s"hand-check failed: $pd")
    // fixture: both arms, value-identical, non-trivial
    val fx = ops.Graph.graph_sssp(spark, sf01)
      .as[(Long, Option[Long])].collect().toSeq
    val fxDist = ops.Graph.ssspOf(spark,
        ops.Graph.weightedDirectedEdges(spark, sf01), 0L)
      .orderBy("node").as[(Long, Option[Long])].collect().toSeq
    assert(fx == fxDist, "fixture arms must be value-identical")
    assert(fx.exists(_._2.exists(_ > 0)), "some node must be reached")
    assert(fx.count(_._2.isDefined) > 1, "fixture must reach > 1 node")
    // weighted edge tuples are unique by construction (the oracle
    // replays the relation without dedup — a duplicate would fork)
    val wes = ops.Graph.weightedDirectedEdges(spark, sf01)
      .select("s", "t").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(wes.distinct.length == wes.length,
      "weighted directed edges must be unique (s, t) tuples")
    // random weighted graph: arms agree exactly
    var x = 98765L
    def nxt(): Long = { x = (x * 6364136223846793005L +
      1442695040888963407L); x }
    val rnd = (1 to 80).map { _ =>
      (math.floorMod(nxt(), 25L), math.floorMod(nxt(), 25L),
        1L + math.floorMod(nxt(), 9L))
    }.filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
    val (rd, rp) = both(rnd)
    assert(rd == rp, "random-graph arms must be value-identical")
    // the unroll certification is loud: a 40-hop chain needs more
    // rounds than SsspUnrollRounds on BOTH arms
    val chain = (1L to 40L).map(i => (i, i + 1L, 1L))
    intercept[IllegalArgumentException] {
      ops.Graph.ssspOf(spark, chain.toDF("s", "t", "w"), Long.MaxValue)
        .collect()
    }
    intercept[IllegalArgumentException] {
      ops.Graph.ssspOf(spark, chain.toDF("s", "t", "w"), 0L).collect()
    }
  }

  test("graph_closeness: hand-checked planted graph, arms " +
      "value-identical on fixture and random graphs") {
    import spark.implicits._
    def both(es: Seq[(Long, Long, Long)])
        : (Seq[(Long, Long, Long)], Seq[(Long, Long, Long)]) = {
      val df = es.toDF("s", "t", "w")
      (ops.Graph.closenessOf(spark, df, Long.MaxValue)
         .orderBy("node").as[(Long, Long, Long)].collect().toSeq,
       ops.Graph.closenessOf(spark, df, 0L)
         .orderBy("node").as[(Long, Long, Long)].collect().toSeq)
    }
    // planted (sources = the 8 smallest ids = all 5 nodes here):
    // 1→2 (w5), 1→3 (w1), 3→2 (w1), 2→4 (w10), 4→1 (w1), 5→1 (w100).
    // From 1: d(2)=2, d(3)=1, d(4)=12 → h = 10000/2 + 10000/1
    //   + 10000 div 12 = 5000 + 10000 + 833 = 15833, n_reach 3.
    // From 2: d(4)=10, d(1)=11, d(3)=12 → 1000 + 909 + 833 = 2742.
    // From 3: d(2)=1, d(4)=11, d(1)=12 → 10000 + 909 + 833 = 11742.
    // From 4: d(1)=1, d(3)=2, d(2)=3 → 10000 + 5000 + 3333 = 18333.
    // From 5: d(1)=100, d(3)=101, d(2)=102, d(4)=112
    //   → 100 + 99 + 98 + 89 = 386, n_reach 4.
    val planted = Seq((1L, 2L, 5L), (1L, 3L, 1L), (3L, 2L, 1L),
      (2L, 4L, 10L), (5L, 1L, 100L), (4L, 1L, 1L))
    val (pd, pp) = both(planted)
    assert(pd == pp, "budget arms must be value-identical")
    assert(pd == Seq((1L, 3L, 15833L), (2L, 3L, 2742L),
      (3L, 3L, 11742L), (4L, 3L, 18333L), (5L, 4L, 386L)),
      s"hand-check failed: $pd")
    // fixture: both arms value-identical and non-trivial
    val fx = ops.Graph.graph_closeness(spark, sf01)
      .as[(Long, Long, Long)].collect().toSeq
    val fxDist = ops.Graph.closenessOf(spark,
        ops.Graph.weightedDirectedEdges(spark, sf01), 0L)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    assert(fx == fxDist, "fixture arms must be value-identical")
    assert(fx.size == ops.Graph.ClosenessSources)
    assert(fx.exists(_._3 > 0), "some source must reach something")
    // random weighted graph: arms agree exactly
    var x = 424242L
    def nxt(): Long = { x = (x * 6364136223846793005L +
      1442695040888963407L); x }
    val rnd = (1 to 80).map { _ =>
      (math.floorMod(nxt(), 25L), math.floorMod(nxt(), 25L),
        1L + math.floorMod(nxt(), 9L))
    }.filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
    val (rd, rp) = both(rnd)
    assert(rd == rp, "random-graph arms must be value-identical")
  }

  test("graph_reach: hand-checked on a chain, a cycle, and a " +
      "diamond with path multiplicity; k=3 cycle self-reach") {
    import spark.implicits._
    // chain a→b→c→d→e: within 2 steps a reaches {b,c}, e reaches {}
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "t")
    val rc = ops.Graph.reachOf(spark, chain, 2).orderBy("node")
      .as[(Long, Long)].collect().toSeq
    assert(rc == Seq((1L, 2L), (2L, 2L), (3L, 2L), (4L, 1L), (5L, 0L)),
      s"chain: $rc")
    // 3-cycle at k=2: each node reaches the other two, not yet itself;
    // at k=3 the cycle closes and self-reach appears (the kernel stays
    // generic in k — the query pins k=2 by measurement)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "t")
    val rcy = ops.Graph.reachOf(spark, cyc, 2).orderBy("node")
      .as[(Long, Long)].collect().toSeq
    assert(rcy == Seq((1L, 2L), (2L, 2L), (3L, 2L)), s"cycle: $rcy")
    val rcy3 = ops.Graph.reachOf(spark, cyc, 3).orderBy("node")
      .as[(Long, Long)].collect().toSeq
    assert(rcy3 == Seq((1L, 3L), (2L, 3L), (3L, 3L)), s"cycle k3: $rcy3")
    // diamond 1→{2,3}→4→5: two 2-step paths to 4 must count ONCE (the
    // per-level dedup — path multiplicity is the classic blow-up)
    val dia = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("s", "t")
    val rd = ops.Graph.reachOf(spark, dia, 2).orderBy("node")
      .as[(Long, Long)].collect().toSeq
    assert(rd == Seq((1L, 3L), (2L, 2L), (3L, 2L), (4L, 1L), (5L, 0L)),
      s"diamond: $rd")
  }

  test("graph_reach: driver arm ≡ forced-distributed walk (budget 0) " +
      "on the fixture graph and the hand-check topologies") {
    import spark.implicits._
    val fx = ops.Graph.directedSupplierEdges(spark, sf01)
    val planted = Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),          // chain
      Seq((1L, 2L), (2L, 3L), (3L, 1L)),                    // cycle
      Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L)) // diamond
    ).map(_.toDF("s", "t")) :+ fx
    for ((g, i) <- planted.zipWithIndex; k <- Seq(2, 3)) {
      val driver = ops.Graph.reachOf(spark, g, k).orderBy("node")
        .as[(Long, Long)].collect().toSeq
      val dist = ops.Graph.reachOf(spark, g, k, driverBudgetEdges = 0L)
        .orderBy("node").as[(Long, Long)].collect().toSeq
      assert(driver == dist, s"graph $i k=$k: $driver vs $dist")
      assert(driver.nonEmpty)
    }
  }

  test("graph_topo: layers hand-check on a planted condensation, both " +
      "arms agree on fixture and planted DAGs, cycles are loud") {
    import spark.implicits._
    // fixture: driver arm (graph_topo) vs forced-distributed layering
    val e = ops.Graph.directedSupplierEdges(spark, sf01).cache()
    val comp = ops.Graph.sccOf(spark, e, Long.MaxValue).cache()
    val labS = comp.select(col("node").as("s"), col("scc").as("cs"))
    val labT = comp.select(col("node").as("t"), col("scc").as("ct"))
    val ced = e.join(labS, "s").join(labT, "t")
      .where(col("cs") =!= col("ct")).select("cs", "ct").distinct()
    val comps = comp.select("scc").distinct()
    val driver = ops.Graph.topoLayersOf(spark, comps, ced, Long.MaxValue)
      .orderBy("scc").as[(Long, Int)].collect().toSeq
    val dist = ops.Graph.topoLayersOf(spark, comps, ced, 0L)
      .orderBy("scc").as[(Long, Int)].collect().toSeq
    e.unpersist(); comp.unpersist()
    assert(driver.nonEmpty && driver == dist,
      "layer arms must be value-identical")
    assert(driver.map(_._2).max >= 1, "fixture layering must be deep")
    // planted DAG: diamond 1→{2,3}→4 plus a long tail 4→5→6 and an
    // isolated node 9 — layers are the hand-computed longest paths
    def layers(es: Seq[(Long, Long)], cs: Seq[Long],
        budget: Long): Map[Long, Int] =
      ops.Graph.topoLayersOf(spark, cs.toDF("scc"),
        es.toDF("cs", "ct"), budget)
        .as[(Long, Int)].collect().toMap
    val des = Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L, 4L -> 5L,
      5L -> 6L)
    val cs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L)
    val want = Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3,
      6L -> 4, 9L -> 0)
    assert(layers(des, cs, Long.MaxValue) == want)
    assert(layers(des, cs, 0L) == want)
    // a cycle (impossible from a correct condensation) is loud, not a
    // hang, on BOTH arms
    intercept[IllegalArgumentException] {
      layers(Seq(1L -> 2L, 2L -> 1L), Seq(1L, 2L), Long.MaxValue)
    }
    intercept[IllegalArgumentException] {
      layers(Seq(1L -> 2L, 2L -> 1L), Seq(1L, 2L), 0L)
    }
  }

  test("graph_kcore: equals a driver-side peel; both arms agree; " +
      "adversarial path-into-cycle converges to exactly the cycle") {
    import spark.implicits._
    // fixture: driver arm vs distributed arm (budget 0)
    val driver = ops.Graph.graph_kcore(spark, sf01)
      .as[(Long, Long)].collect().toSeq
    val dist = ops.Graph.kcoreOf(spark,
        ops.Graph.supplierEdges(spark, sf01, 59), 0L)
      .as[(Long, Long)].collect().toSeq
    assert(driver.nonEmpty, "sf0.01 sparse graph must keep a 2-core")
    assert(driver == dist, "budget arms must be value-identical")
    assert(driver.forall(_._2 >= 2), "every core node has core degree >= 2")
    // adversarial: a 20-node path whose far end is free and whose near
    // end anchors in a 6-node cycle peels exactly ONE node per round
    // (single free end — the deepest cascade per edge count), 19 rounds,
    // inside the 24 bound, and must leave exactly the cycle at degree 2
    val path = (1L to 20L).sliding(2).map(p => (p.head, p.last)).toSeq
    val cycle = Seq((20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L),
      (24L, 25L), (20L, 25L))
    val edges = (path ++ cycle).toDF("a", "b")
    for (budget <- Seq(0L, 1000L)) {
      val core = ops.Graph.kcoreOf(spark, edges, budget)
        .as[(Long, Long)].collect().toSeq
      assert(core == (20L to 25L).map(_ -> 2L),
        s"budget=$budget core=$core")
    }
  }

  test("graph_triangles plan: no cartesian product, edge derivation reused") {
    val plan = ops.Graph.graph_triangles(spark, sf01)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("distributed CC at adversarial depth: a 600-node path converges " +
      "in O(log diameter) rounds, not O(diameter)") {
    // r8 verdict #7: the random-graph arm-equality tests exercise the
    // loop but never stress DEPTH. A path graph is the worst case for
    // label propagation — a hook-only algorithm needs ~diameter rounds
    // and would trip the 30-round require long before finishing. The
    // hook+pointer-jump loop must finish it in logarithmic rounds,
    // proving the convergence-counted loop (not the fixed bound) is
    // what terminates, and that 2^30-depth is the true ceiling.
    import spark.implicits._
    val n = 600
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1))
      .toDF("a", "b")
    val key = "spec_deep_path_cc"
    val comp = ops.Llm.connectedComponents(edges, key,
      driverBudgetEdges = 0L) // force the distributed loop
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comp.length == n, s"${comp.length} labeled nodes, want $n")
    assert(comp.forall(_._2 == 0L),
      "every node of the path must label to min id 0")
    val rounds = ops.Llm.ccRounds.get(key).toInt
    val logBound = 2 * math.ceil(math.log(n.toDouble) / math.log(2)).toInt
    assert(rounds <= logBound,
      s"$rounds rounds for diameter ${n - 1} — not logarithmic " +
        s"(bound $logBound)")
  }

  test("graph_jaccard equals a driver-side recomputation; predicted " +
      "pairs are non-adjacent with bp in (0, 10000)") {
    import spark.implicits._
    val edges = ops.Graph.supplierEdges(spark, sf01, 11)
      .as[(Long, Long)].collect().toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val expect = (for {
      i <- nodes.indices.iterator
      j <- (i + 1) until nodes.size
      a = nodes(i); b = nodes(j)
      if !edges((a, b))
      common = (adj(a) & adj(b)).size.toLong
      if common >= 2
    } yield {
      val bp = common * 10000L / (adj(a).size + adj(b).size - common)
      (a, b, common, bp)
    }).toSeq
      .sortBy { case (a, b, _, bp) => (-bp, a, b) }.take(20)
    val got = ops.Graph.graph_jaccard(spark, sf01)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expect, s"got=${got.take(5)} want=${expect.take(5)}")
    assert(got.nonEmpty, "fixture should predict at least one link")
    assert(got.forall { case (a, b, _, bp) =>
      a < b && !edges((a, b)) && bp > 0 && bp <= 10000
    })
  }

  test("graph_jaccard degree-cap arm: capped equals uncapped when no " +
      "node exceeds the cap; a planted hub loses only its own wedge " +
      "contribution and the fan-out is provably bounded") {
    val sp = spark
    import sp.implicits._
    // two tight clusters sharing a hub: 1,2 each adjacent to 3,4,5 and
    // to hub 6; hub 6 additionally fans to 7..11 (deg 7)
    val edges = (Seq((1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L), (2L, 4L),
      (2L, 5L), (1L, 6L), (2L, 6L)) ++ (7L to 11L).map(x => (6L, x)))
      .toDF("a", "b")
    def res(cap: Long): Seq[(Long, Long, Long, Long)] =
      ops.Graph.jaccardTopK(edges, cap)
        .as[(Long, Long, Long, Long)].collect().toSeq
    // cap above every degree: the anti-join is a no-op — identical to a
    // cap of "infinity"
    assert(res(7L) == res(Long.MaxValue))
    // hand-checked uncapped answer: (1,2) share {3,4,5,6}; each of
    // (3,4),(3,5),(4,5) shares {1,2}; each of (3,6),(4,6),(5,6) also
    // shares {1,2} but the hub's degree dilutes the union
    assert(res(7L) == Seq((1L, 2L, 4L, 10000L), (3L, 4L, 2L, 10000L),
      (3L, 5L, 2L, 10000L), (4L, 5L, 2L, 10000L), (3L, 6L, 2L, 2857L),
      (4L, 6L, 2L, 2857L), (5L, 6L, 2L, 2857L)))
    // cap 4 drops ONLY hub 6 (deg 7) as a wedge CENTER: (1,2)'s common
    // count loses exactly the hub's contribution (4 → 3, denominator
    // still the TRUE degrees 4+4); every pair whose wedges run through
    // non-hub centers — including the (x,6) pairs, whose centers are
    // 1 and 2 — is untouched
    assert(res(4L) == Seq((3L, 4L, 2L, 10000L), (3L, 5L, 2L, 10000L),
      (4L, 5L, 2L, 10000L), (1L, 2L, 3L, 6000L), (3L, 6L, 2L, 2857L),
      (4L, 6L, 2L, 2857L), (5L, 6L, 2L, 2857L)))
    // fan-out bound: capped wedge rows = sum of C(deg, 2) over centers
    // with deg <= cap — the hub's C(7,2)=21 wedges are gone
    def wedgeRows(cap: Long): Long =
      ops.Graph.jaccardCommon(edges, cap)
        .agg(org.apache.spark.sql.functions.sum("common")).as[Long].head()
    // degs: 1→4, 2→4, 3..5→2, 6→7, 7..11→1
    assert(wedgeRows(Long.MaxValue) == 2 * 6 + 3 * 1 + 21)
    assert(wedgeRows(4L) == 2 * 6 + 3 * 1)
    // the production fixture graph is hub-free at the production cap:
    // capped ≡ uncapped on it (the oracle-checked row is exact)
    val prod = ops.Graph.supplierEdges(spark, sf, 11).select($"a", $"b")
    assert(ops.Graph.jaccardTopK(prod, ops.Graph.JaccardDegreeCap)
      .as[(Long, Long, Long, Long)].collect().toSeq ==
      ops.Graph.jaccardTopK(prod, Long.MaxValue)
        .as[(Long, Long, Long, Long)].collect().toSeq)
  }

  test("graph_lpa: two bridged cliques settle on each clique's min " +
      "label by round 4 (hand-simulated); budget arms value-identical") {
    import spark.implicits._
    // K4 {1,2,3,4} + K4 {10,11,12,13} + bridge 4-10. Hand simulation of
    // the synchronous (max count, min label) rule: round 1 gives every
    // clique member its clique-min neighbor (1 itself briefly takes 2,
    // 10 takes 4 over the bridge); round 2 floods 1 and 10 back over
    // their cliques; round 3 reaches the fixpoint {1..4 → 1,
    // 10..13 → 10}; round 4 must hold it.
    def clique(ns: Seq[Long]) =
      for { a <- ns; b <- ns if a < b } yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((4L, 10L)))
      .toDF("a", "b")
    val sym = edges.select($"a".as("v"), $"b".as("u"))
      .union(edges.select($"b".as("v"), $"a".as("u")))
    val driver = ops.Graph.lpaOf(spark, sym, Long.MaxValue)
      .as[(Long, Long)].collect().toMap
    val dist = ops.Graph.lpaOf(spark, sym, 0L)
      .as[(Long, Long)].collect().toMap
    assert(driver == dist, "budget arms must be value-identical")
    assert(driver == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L), driver.toString)
  }

  test("graph_modularity: hand-computed on the two-clique bridge; " +
      "the all-in-one partition scores exactly 0; fixture row coheres") {
    import spark.implicits._
    def clique(ns: Seq[Long]) =
      for { a <- ns; b <- ns if a < b } yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((4L, 10L)))
      .toDF("a", "b")
    val twoComs = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L), (13L, 10L))
      .toDF("node", "label")
    // m = 13, per community e_in = 6, d_c = 13:
    // contrib = 4·13·6 − 169 = 143; Q = 286/676 → 4230 bp (floor)
    val rows = ops.Graph.modularityOf(edges, twoComs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows == Map(1L -> ((4L, 13L, 6L, 143L, 4230L)),
      10L -> ((4L, 13L, 6L, 143L, 4230L))), rows.toString)
    // trivial partition: e_in = m, d_c = 2m → numerator exactly 0
    val oneCom = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L))
      .map(_ -> 7L).toDF("node", "label")
    val one = ops.Graph.modularityOf(edges, oneCom).collect()
    assert(one.length == 1 && one.head.getLong(4) == 0L &&
      one.head.getLong(5) == 0L, one.mkString(","))
    // fixture: the emitted partition is the lpa partition, components
    // must be internally consistent (sum of d_c = 2m, sum of e_in <= m)
    val fix = ops.Graph.graph_modularity(spark, sf01).collect()
    val m = ops.Graph.supplierEdges(spark, sf01, 11).count()
    assert(fix.map(_.getLong(2)).sum == 2 * m)
    assert(fix.map(_.getLong(3)).sum <= m)
    assert(fix.map(_.getLong(5)).distinct.length == 1,
      "q_bp is a single global value on every row")
  }

  test("graph_lpa: production-fixture arms agree; labels are node ids") {
    import spark.implicits._
    val driver = ops.Graph.graph_lpa(spark, sf01)
      .as[(Long, Long)].collect().toSeq
    val e = ops.Graph.supplierEdges(spark, sf01, 11)
    val sym = e.select($"a".as("v"), $"b".as("u"))
      .union(e.select($"b".as("v"), $"a".as("u")))
    val dist = ops.Graph.lpaOf(spark, sym, 0L)
      .as[(Long, Long)].collect().toSeq
    assert(driver.nonEmpty, "dense fixture graph must have nodes")
    assert(driver == dist, "budget arms must be value-identical")
    val nodes = driver.map(_._1).toSet
    assert(driver.forall { case (_, l) => nodes(l) },
      "every label must be a participating node id")
    assert(driver.map(_._2).toSet.size < nodes.size,
      "propagation should merge at least one pair of labels")
  }
}
