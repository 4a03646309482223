package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts for representative queries: pushdown and
  * column pruning reach the parquet scans, small dims broadcast, pair
  * joins are keyed (never cartesian), and the hot paths stay inside
  * whole-stage codegen. A failing assertion here means a plan
  * regression even if results stay correct. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, SparkSpec.sfDir)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    df.queryExecution.executedPlan.toString
  }

  test("q02 star joins broadcast all three dims") {
    val p = plan("q02_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "customer/nation/region must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q01 aggregation runs inside whole-stage codegen with partial aggs") {
    val p = plan("q01_pricing_summary")
    // "*(n)" node prefixes mark whole-stage-codegen spans in plan strings
    assert(p.contains("*("), "expected whole-stage codegen spans")
    assert("HashAggregate\\(keys=.*functions=\\[partial_".r.findFirstIn(p).isDefined
      || p.contains("HashAggregate"),
      "map-side partial aggregation expected")
  }

  test("q05 parquet scan prunes to the needed columns only") {
    val p = plan("q05_log_returns")
    val scan = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(scan.contains("value"), s"scan schema: $scan")
    assert(!scan.contains("event_type"),
      s"q05 must not read unused columns: $scan")
  }

  test("banded near-dup joins are keyed, never cartesian") {
    for (q <- Seq("q24_embed_neardup_blocked", "s01_lsh_ann")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has a cartesian join")
    }
  }

  test("a01 as-of join compiles to union+window — no join operator at all") {
    val p = plan("a01_asof_join")
    assert(!p.contains("Join"),
      "as-of must be the one-shuffle union-align shape, not a range/sort-merge join")
    assert(!p.contains("CartesianProduct"))
  }

  test("q23 broadcasts the bounded query side over the streaming corpus") {
    val p = plan("q23_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side must broadcast")
  }

  test("q28 per-user stats shuffle on the user key, no single partition") {
    val p = plan("q28_regime_stats")
    assert(!p.contains("SinglePartition"),
      "per-user q28 must not funnel into one partition")
  }

  test("s02 IVF joins on the inverted-list id, never cartesian") {
    val p = plan("s02_ivf_ann")
    assert(!p.contains("CartesianProduct"), "IVF probe must join on cid")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "IVF probe should be a keyed join")
  }

  test("g01b per-series chain reuses one hash shuffle on the series key") {
    val p = plan("g01b_block_chain_per_user")
    // the window's Exchange on user_id is the ONLY data-sized hash
    // shuffle — the consecutive-run mapPartitions grouping must not
    // re-shuffle what the window already co-located. (AQE plan strings
    // repeat the tree under "== Initial Plan ==" — count the final
    // section only.)
    val finalPlan = p.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(exchanges <= 1, s"expected <=1 hash exchange, got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("g02b per-series fit keys every stage on the series column") {
    val p = plan("g02b_grasynda_fit_per_user")
    assert(!p.contains("CartesianProduct"))
    // no global (empty-key) data-sized window: every window/agg carries sid
    assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
      "found an un-partitioned window in the per-series fit")
  }

  test("g04tb per-series EM step: keyed shuffles only, no global window") {
    val p = plan("g04tb_hmm_em_step_per_user")
    assert(!p.contains("CartesianProduct"))
    assert(!"Window .*partitionBy=\\[\\]".r.findFirstIn(p).isDefined
      && !"Window \\[.*\\], \\[\\]".r.findFirstIn(p).isDefined,
      "found an un-partitioned data-sized window in the grouped EM step")
  }

  test("g04wb/g05wb per-series walks: keyed W2 window, no cartesian") {
    for (q <- Seq("g04wb_conditional_walk_per_user", "g05wb_garch_walk_per_user")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian join")
      assert("Window .*partitionBy".r.findFirstIn(p).isEmpty
        || !p.contains("partitionBy=[]"),
        s"$q price reconstruction must partition on the series")
    }
  }

  test("g02wb per-series Grasynda walk: keyed end-to-end") {
    val p = plan("g02wb_grasynda_walk_per_user")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("partitionBy=[]"),
      "per-series walk must not contain a global window")
  }

  test("c05 per-series ADF: one keyed pass, no second exchange after the window") {
    val p = plan("c05_adf_per_user")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("partitionBy=[]"),
      "ADF legs must key every window on (series, label)")
  }

  test("a03 hash split is map-only: no exchange, no shuffle at all") {
    val p = plan("a03_hash_split")
    val finalPlan = p.split("== Initial Plan ==")(0)
    // the split itself adds nothing — the only allowed exchange is the
    // final presentation orderBy's range partitioning
    assert(!finalPlan.contains("Exchange hashpartitioning"),
      s"hash split must not shuffle:\n$finalPlan")
  }

  test("a02 sessionize keys the window on the user, no single partition") {
    val p = plan("a02_sessionize")
    val finalPlan = p.split("== Initial Plan ==")(0)
    assert(!finalPlan.contains("SinglePartition"),
      "sessionize must partition by the series key")
  }

  test("s03/s04 PQ paths: corpus never cartesian-joins, scan side keyed or broadcast") {
    for (q <- Seq("s03_pq_ann", "s04_ivfpq_ann")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has a cartesian join")
      assert(p.contains("Broadcast") || p.contains("SortMergeJoin"),
        s"$q should broadcast the bounded query side or join keyed")
    }
  }

  test("g04b per-series features key every window on the series") {
    val p = plan("g04b_regime_features_per_user")
    val finalPlan = p.split("== Initial Plan ==")(0)
    assert(!finalPlan.contains("SinglePartition"),
      "per-series g04b must not funnel into one partition")
    assert(!p.contains("CartesianProduct"))
  }

  test("q30b per-series evaluator keys every window on the series") {
    val p = plan("q30b_dist_per_user")
    assert(!p.contains("CartesianProduct"))
    // every cumulative/lag window must carry the series key — a global
    // window here would funnel all series into one partition
    assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
      "found an un-partitioned window in the per-series evaluator")
  }

  test("c01b per-series FFT: keyed stages, bounded exchanges, no join") {
    val p = plan("c01b_spectral_per_user")
    assert(!p.contains("CartesianProduct"))
    assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
      "found an un-partitioned window in the per-series FFT")
    // the FFT shape is: one (sid, lab) window exchange for logReturns/t,
    // one repartition(sid) for the consecutive-run grouping, plus the
    // final global sort — no joins, no per-k exploded frame
    val finalPlan = p.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges")
    assert(!finalPlan.contains("Join"), "per-series FFT must not join")
  }

  test("g05b per-(series, regime) GARCH keys every stage, no single partition") {
    val p = plan("g05b_regime_garch_per_user")
    val finalPlan = p.split("== Initial Plan ==")(0)
    assert(!finalPlan.contains("SinglePartition"),
      "per-series g05b must not funnel into one partition")
    assert(!p.contains("CartesianProduct"))
  }

  test("q29b per-series GARCH grid reuses one hash shuffle on the series key") {
    val p = plan("q29b_garch_grid_per_user")
    val finalPlan = p.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(exchanges <= 1, s"expected <=1 hash exchange, got $exchanges")
    assert(!p.contains("CartesianProduct"))
  }

  test("q31b per-series composite keys every window on the series") {
    val p = plan("q31b_composite_per_user")
    assert(!p.contains("CartesianProduct"))
    assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
      "found an un-partitioned window in the per-series composite")
  }

  test("o01b per-series sweep fitness: keyed windows, no cartesian") {
    val p = plan("o01b_sweep_fitness_per_user")
    assert(!p.contains("CartesianProduct"))
    assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
      "found an un-partitioned window in the per-series sweep fitness")
  }

  test("c02b per-label MMD: keyed windows, no cartesian, no join after the exchange") {
    val p = plan("c02b_mmd_per_label")
    assert(!p.contains("CartesianProduct"))
    assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
      "found an un-partitioned window in the per-label MMD")
  }

  test("q31c FULL composite (hurst+spectral legs) keys every window on the series") {
    val p = plan("q31c_composite_full_per_user")
    assert(!p.contains("CartesianProduct"))
    assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
      "found an un-partitioned window in the full per-series composite")
  }

  test("q16b grouped hurst: one keyed exchange, no explode, no window") {
    // the in-partition R/S sweep (consecutive-run mapPartitions over a
    // repartition on the series key) replaced the O(n·maxLag) exploded
    // two-window formulation — the length-axis scale run measured the
    // old shape at ratio 9.6 for 10x-longer series vs 0.9-2.1 for the
    // rest of the family
    val p = plan("q16b_hurst_per_user")
    assert(!p.contains("Generate"), "grouped hurst must not explode rows")
    assert(!p.contains("Window"), "grouped hurst must not use window stages")
    assert(p.contains("hashpartitioning(user_id"),
      "expected the single exchange keyed on the series")
    assert(!p.contains("CartesianProduct"))
  }

  test("q14 exact ECDF has no un-partitioned data-sized window") {
    // the cumulative scan must run per range partition — a global
    // ordered window over the distinct support dies on continuous
    // columns at scale. (The one-row final agg's SinglePartition
    // exchange is fine; the checkpointed range-shuffle is upstream.)
    val p = plan("q14_ecdf_distance")
    val windows = "Window \\[[^\\n]*".r.findAllIn(p).toList
    assert(windows.nonEmpty, "expected window nodes in the ECDF plan")
    windows.foreach { w =>
      assert(w.contains("pid"),
        s"ECDF window must partition on the range-partition id: $w")
    }
  }

  test("q24/s01 dot products run inside whole-stage codegen (DotProduct)") {
    val p = plan("q23_ann_topk")
    assert(p.contains("*("), "expected codegen spans in the ANN plan")
    assert(p.contains("dot_product"), "expected the native DotProduct expr")
  }

  test("a05 range join is a bucketed EQUI-join — no cartesian, no nested loop") {
    // Spark's native plan for `p BETWEEN lo AND hi` is BroadcastNestedLoop
    // (or Cartesian) — the whole point of RangeJoin is that the quantized
    // bucket key turns it into a plain hash-shuffle equi-join
    val p = plan("a05_range_join")
    assert(!p.contains("CartesianProduct"), "range join must not be cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range join must not fall back to the nested-loop non-equi plan")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"expected an equi-join on (key, bucket): $p")
  }

  test("t03/t04 map-only text ops have ZERO exchanges before the output sort") {
    // redaction and chunking are embarrassingly parallel — any Exchange
    // in the pre-sort plan means a regression re-introduced a shuffle
    for (q <- Seq("t03_pii_redact", "t04_chunk")) {
      val df = SparkEntry.queries(q)(spark, SparkSpec.sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // the final orderBy is the query's presentation sort; strip its
      // range-partitioning exchange and demand no others
      val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toList
      // (AQE can print the sort's range exchange twice; what matters is
      // that no HASH exchange — i.e. no real shuffle — ever appears)
      assert(exchanges.forall(_.contains("rangepartitioning")),
        s"$q must be map-only up to the output sort: $exchanges")
      assert(!p.contains("SinglePartition"),
        s"$q must not funnel into one partition")
    }
  }

  test("a06 heavy hitters: sketch prune keeps the exact agg off the full universe") {
    val p = plan("a06_heavy_hitters")
    assert(!p.contains("CartesianProduct"))
    // the exact pass is a plain partial+final hash agg over the pruned rows
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      "expected a hash aggregation for the exact count pass")
  }

  test("t05 TF-IDF broadcasts the 1-row doc count, keyed joins otherwise") {
    val p = plan("t05_tfidf_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the N-docs scalar must broadcast, not shuffle")
    assert(!p.contains("CartesianProduct"))
    // the token→df join key is the Zipf head: under the vocab guard the
    // df side must BROADCAST (t08's c1 pattern), never shuffle on token
    assert(p.contains("BroadcastHashJoin"),
      "token→df join must be a broadcast hash join under the vocab guard")
  }

  test("t17 topic assign: one doc-keyed agg exchange, centroids stay " +
       "literal (no join), no cartesian") {
    val p = plan("t17_topic_assign")
    assert(!p.contains("CartesianProduct"))
    // the centroids are literals inside the PqEncode expression — the
    // assignment must NOT appear as a join against a centroid relation
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "centroid assignment must be map-side, not a join")
    assert(p.contains("pq_encode") || p.contains("PqEncode"),
      "assignment should run through the native argmin expression")
  }

  test("a07 k-per-key sample: one keyed window exchange, no single partition") {
    val p = plan("a07_sample_per_key")
    assert(p.contains("hashpartitioning(domain"),
      "the rank window must partition on the sample key")
    assert(!p.contains("SinglePartition"),
      "a07 must not funnel into one partition")
  }

  test("d04 semantic clusters: banded pair join + CC stay keyed, no cartesian") {
    val p = plan("d04_embed_dedup_clusters")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("d09 substring spans: gram join keyed on the digest, per-doc " +
       "windows keyed on the doc, no cartesian") {
    val p = plan("d09_substring_dedup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the duplicated-gram probe joins on gd (16-byte digest), never the
    // gram string — the string must not survive into the join keys
    val joins = p.linesIterator
      .filter(l => l.contains("HashJoin") || l.contains("SortMergeJoin"))
      .mkString("\n")
    assert(joins.contains("gd"), s"gram join must key on the digest:\n$joins")
    // every window is doc-partitioned — no un-keyed data-sized window
    assert(!p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("partitionBy=[]")),
      "no global window allowed")
  }

  test("q33 cube: ONE Expand feeds ONE keyed aggregation — all four " +
       "grouping sets in a single pass, dims broadcast") {
    val p = plan("q33_revenue_cube")
    val finalPlan = p.split("== Initial Plan ==")(0)
    assert("Expand".r.findAllIn(finalPlan).size >= 1 &&
      finalPlan.linesIterator.count(_.trim.startsWith("Expand")) <= 2,
      s"cube must plan as a single Expand, not one scan per set:\n" +
        finalPlan.linesIterator.filter(_.contains("Expand")).mkString("\n"))
    assert("BroadcastHashJoin".r.findAllIn(finalPlan).size >= 2,
      "customer/nation broadcast")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("Union"),
      "grouping sets must not union separate aggregations")
  }

  test("w15 seasonal decomposition: series-keyed windows, no cartesian, " +
       "the phase-mean join stays off the single-partition path") {
    val p = plan("w15_seasonal_decompose")
    assert(!p.contains("CartesianProduct"))
    assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
      "found an un-partitioned window in the per-series decomposition")
  }

  test("c03 Ljung-Box: series-keyed windows + one hash agg, no " +
       "cartesian, no global window") {
    val p = plan("c03_ljung_box")
    assert(!p.contains("CartesianProduct"))
    assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
      "found an un-partitioned window in the whiteness test")
  }

  test("c09 mann-kendall: one exchange on the series key feeding the " +
       "in-partition pair sweep — no window, no join, no cartesian") {
    val p = plan("c09_mann_kendall")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"))
    // the lag window building the returns is series-keyed; the MK pass
    // itself is mapPartitions after one hashpartitioning exchange
    assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
      "found an un-partitioned window in the trend test")
  }

  test("c10 kpss: series-keyed windows + one hash agg — no cartesian, " +
       "no global window") {
    val p = plan("c10_kpss")
    assert(!p.contains("CartesianProduct"))
    assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
      "found an un-partitioned window in the stationarity test")
  }

  test("c12/c13 new diagnostics: series-keyed windows + keyed agg — " +
       "no cartesian, no unpartitioned data-sized window") {
    for (q <- Seq("c12_pettitt", "c13_anderson_darling",
                  "c14_rank_sum_drift", "c15_decomp_strength")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian join")
      assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
        s"$q must not plan an un-partitioned window:\n$p")
    }
  }

  test("q37 transitions: the row-normalizing window runs on the " +
       "pair-totals frame keyed by prev_event, never the event stream") {
    val p = plan("q37_event_transitions")
    assert(!p.contains("CartesianProduct"))
    assert(!"Window .*\\[partitionBy=\\[\\]".r.findFirstIn(p).isDefined,
      s"q37 must not plan a global window:\n$p")
  }

  test("p04 triangles: top-64 cut via TakeOrderedAndProject, keyed " +
       "wedge/close joins, never cartesian") {
    val p = plan("p04_token_triangles")
    assert(!p.contains("CartesianProduct"))
    // triangleCounts checkpoints the edge frame, so the result plan
    // hides the cut — audit the collocation-graph builder directly
    val d = graft.core.Tables.documents(spark, SparkSpec.sfDir)
    val tok = graft.text.TextOps.tokens(d, "text")
      .select(col("doc_id"), col("token"))
    val top = tok.groupBy(col("token"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("f"))
      .orderBy(col("f").desc, col("token")).limit(64)
    top.collect()
    val tp = top.queryExecution.executedPlan.toString
    assert(tp.contains("TakeOrderedAndProject"),
      s"top-64 token cut must be a bounded take:\n$tp")
  }

  test("q38 session paths: keyed session/path aggs, the top-k cut is " +
       "TakeOrderedAndProject, the rank window sees <= topK rows") {
    val p = plan("q38_session_paths")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must compile to TakeOrderedAndProject:\n$p")
    val wi = p.indexOf("Window")
    val ti = p.indexOf("TakeOrderedAndProject")
    assert(wi < 0 || (ti >= 0 && wi < ti),
      s"the rank window must consume the bounded take:\n$p")
  }

  test("t34 winnowing: the whole pass is one in-task map — zero " +
       "exchanges, no window, no join (the charEntropy contract)") {
    val df = SparkEntry.queries("t34_winnowing")(spark, SparkSpec.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the entry's orderBy plans one global sort for display; everything
    // BELOW the sort must be exchange-free — assert on the un-ordered op
    val core = graft.text.TextOps.winnowFingerprints(
      graft.core.Tables.documents(spark, SparkSpec.sfDir), "doc_id", "text")
    core.collect()
    val cp = core.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!cp.contains("Exchange"), s"winnowing must not shuffle:\n$cp")
    assert(!cp.contains("Window") && !cp.contains("Join"))
    assert(!p.contains("CartesianProduct"))
  }

  test("t36 ngram overlap: the pair frame broadcasts; the intersection " +
       "join keys on the bigram — never cartesian") {
    val p = plan("t36_ngram_overlap")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      "the group-pair frame must broadcast")
  }

  test("a19 count-min: the probe-to-cell join broadcasts the d·w cell " +
       "table; sketch build is one keyed agg") {
    val p = plan("a19_countmin")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      "the sketch cell table must broadcast to the probes")
  }

  test("t06 bloom probe: the train-gram pre-filter is the codegen'd " +
       "BloomProbe expression, plan-visible and inside a codegen span") {
    // the t06 entry localCheckpoints its (small) result, so its own
    // executedPlan is just the checkpoint scan — audit the probe stage
    // as bloomContamination builds it
    val docs = graft.core.Tables.documents(spark, SparkSpec.sfDir)
    val bg = graft.text.TextOps.shingles(
      docs.filter(col("doc_id") < 20), "doc_id", "text", 8)
    val bloom = bg.stat.bloomFilter("shingle", 1000L, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val probed = graft.text.TextOps.shingles(docs, "doc_id", "text", 8)
      .filter(graft.functions.BloomProbe(col("shingle"), bc))
    probed.collect()
    val p = probed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("bloom_might_contain"),
      s"expected the native BloomProbe expr in the plan:\n$p")
    val line = p.linesIterator
      .find(_.contains("bloom_might_contain")).getOrElse("")
    // "*(n) Filter …" marks the codegen span (the line may carry a
    // "+- " tree prefix); the old Row-closure probe planned as a
    // bare non-codegen "Filter <function1>"
    assert("\\*\\(\\d+\\) Filter".r.findFirstIn(line).isDefined,
      s"the probe filter must sit inside a whole-stage-codegen span: $line")
    // the probe itself adds no shuffle: the only exchange below it is
    // the doc-keyed window that shingle construction always carries
    assert(!p.contains("Exchange SinglePartition"),
      s"the probe stage must not funnel into one partition:\n$p")
  }

  test("t31 zipf: the top-maxRank cut is TakeOrderedAndProject — the " +
       "full vocabulary never funnels through one global sort task") {
    val p = plan("t31_zipf_fit")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected orderBy+limit to compile to TakeOrderedAndProject:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the only window left ranks the <=maxRank survivors ABOVE the
    // bounded take — it must sit over the take in the tree, never under
    val wi = p.indexOf("Window")
    val ti = p.indexOf("TakeOrderedAndProject")
    assert(wi < 0 || (ti >= 0 && wi < ti),
      s"rank window must consume the TakeOrderedAndProject output:\n$p")
  }

  test("t33 heaps: the hash-mod doc sample reads only (doc_id, text) — " +
       "no unused columns reach the scan") {
    val df = graft.text.TextOps.heapsFit(
      graft.core.Tables.documents(spark, SparkSpec.sfDir),
      "doc_id", "text", maxDocs = 1000000L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val scan = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(scan.contains("doc_id") && scan.contains("text"),
      s"scan schema: $scan")
    assert(!scan.contains("lang") && !scan.contains("source"),
      s"t33 must not read unused columns: $scan")
  }

  test("b08/b09 trainers: the top-K piece cut is TakeOrderedAndProject " +
       "— the substring-candidate frame plans NO window at all (the " +
       "t31 zipfFit fix, applied to both tokenizer train paths)") {
    val docs = graft.core.Tables.documents(spark, SparkSpec.sfDir)
    val stages = Seq(
      "b08" -> graft.text.Unigram.selectedPieces(docs, "text", 64),
      "b09" -> graft.text.WordPiece.selectedPieces(docs, "text", 64))
    for ((name, sel) <- stages) {
      sel.collect()
      val p = sel.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p.contains("TakeOrderedAndProject"),
        s"$name top-K cut must compile to TakeOrderedAndProject:\n$p")
      assert(!p.contains("Window"),
        s"$name train path must plan no rank window:\n$p")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("q40/c16: day-keyed distinct aggs join day-sized frames with no " +
       "cartesian; the cvm rank windows all key on the series") {
    val p = plan("q40_active_ratios")
    assert(!p.contains("CartesianProduct"))
    val pc = plan("c16_cvm_drift")
    assert(!pc.contains("CartesianProduct"))
    val rn = pc.linesIterator.filter(_.contains("row_number")).toSeq
    assert(rn.nonEmpty && rn.forall(_.contains("user_id")),
      s"c16 rank windows must key on the series:\n${rn.mkString("\n")}")
  }

  test("q36/q42: bucketed two-phase rank — every row_number window " +
       "keys on (key, bucket), never the constant-cardinality key alone") {
    for (q <- Seq("q36_concentration", "q42_funnel_timing",
                  "q43_session_stats")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
      val rn = p.linesIterator
        .filter(_.contains("row_number")).toSeq
      assert(rn.nonEmpty, s"$q: expected the local-rank window:\n$p")
      rn.foreach(l => assert(l.contains("_b"),
        s"$q rank window must include the range-bucket key: $l"))
    }
  }

  test("b08 unigram viterbi encode: map-side after the model collect — " +
       "the encode stage itself plans no join and no window") {
    val docs = graft.core.Tables.documents(spark, SparkSpec.sfDir)
    val pieces = graft.text.Unigram.trainPieces(docs, "text", topK = 16)
    val df = graft.text.Unigram.encodeViterbi(docs, "text", pieces)
    df.collect()
    val enc = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!enc.contains("Exchange"), s"encode must not shuffle:\n$enc")
    assert(!enc.contains("Window") && !enc.contains("Join"))
  }
}
