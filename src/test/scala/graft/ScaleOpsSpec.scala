package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ScaleOps, Tables}

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("bucketed join plan has no shuffle exchange over the bucketed sides") {
    val li = Tables.lineitem(spark, SparkSpec.sfDir)
    val or = Tables.orders(spark, SparkSpec.sfDir)
    for (t <- Seq("li_bucketed", "or_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    ScaleOps.writeBucketed(li.select("l_orderkey", "l_quantity"),
      "li_bucketed", "l_orderkey", 8)
    ScaleOps.writeBucketed(or.select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "or_bucketed", "l_orderkey", 8)
    val joined = spark.table("li_bucketed")
      .join(spark.table("or_bucketed"), "l_orderkey")
    // disable broadcast so the co-located sort-merge path is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === li.count()) // all orderkeys resolve
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join splits hot keys and preserves join semantics") {
    val s = spark
    import s.implicits._
    // big side: one pathologically hot key
    val big = ((1 to 5000).map(i => (42L, i.toDouble)) ++
      (1 to 100).map(i => (i.toLong, i.toDouble))).toDF("k", "v")
    val right = (1 to 100).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = big.join(right, "k")
    val salted = ScaleOps.saltedJoin(big, right, "k", saltFactor = 8)
    assert(salted.count() === plain.count())
    assert(salted.filter(col("k") === 42L).count() === 5001) // 5000 hot + dim row
    // hot key spread across several salt partitions pre-join
    val saltSpread = big.withColumn("_salt",
      pmod(hash(col("k"), monotonically_increasing_id(), lit(42L)), lit(8)))
      .filter(col("k") === 42L)
      .select(countDistinct(col("_salt"))).first().getLong(0)
    assert(saltSpread >= 6, s"hot key only hit $saltSpread of 8 salts")
  }

  test("hash split: deterministic, exhaustive, near the requested proportions") {
    val s = spark
    import s.implicits._
    val df = (1 to 5000).map(_.toLong).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val counts = ScaleOps.hashSplit(df, "id", salt = 7, splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 5000L)
    assert(math.abs(counts("train") - 4000.0) / 4000.0 < 0.05)
    assert(math.abs(counts("val") - 500.0) / 500.0 < 0.25)
    // stable under reruns and repartitioning (the property sample() lacks)
    val a = ScaleOps.hashSplit(df, "id", salt = 7, splits)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = ScaleOps.hashSplit(df.repartition(13), "id", salt = 7, splits)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
  }

  test("stratified sample: per-stratum fractions hit, others untouched, deterministic") {
    val s = spark
    import s.implicits._
    val df = ((1 to 2000).map(i => (i.toLong, "a")) ++
      (2001 to 4000).map(i => (i.toLong, "b")) ++
      (4001 to 4500).map(i => (i.toLong, "c"))).toDF("id", "stratum")
    val kept = ScaleOps.stratifiedSample(df, "id", "stratum", salt = 11,
        fractions = Map("a" -> 0.5, "b" -> 0.1))
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("a") - 1000.0) / 1000.0 < 0.1)
    assert(math.abs(kept("b") - 200.0) / 200.0 < 0.3)
    assert(kept("c") === 500L) // default fraction 1.0 keeps everything
    val again = ScaleOps.stratifiedSample(df.repartition(7), "id", "stratum",
        salt = 11, fractions = Map("a" -> 0.5, "b" -> 0.1))
      .collect().map(_.getLong(0)).toSet
    val first = ScaleOps.stratifiedSample(df, "id", "stratum", salt = 11,
        fractions = Map("a" -> 0.5, "b" -> 0.1))
      .collect().map(_.getLong(0)).toSet
    assert(again === first)
  }

  // ── Skew resilience of the per-series consecutive-run families ──────
  // (g04tb/g0*wb/c01b shape): the groupers are only as balanced as the
  // series-key distribution, so the fit-prefix caps are the straggler
  // bound. This fixture gives ONE series ~100x the median rows and
  // crams everything into a single input partition; the caps must bind
  // PER SERIES — the straggler is truncated to the cap while its
  // co-partitioned small series keep every row.
  test("exact-N sample: exactly n rows, repartition-stable, plans as " +
       "TakeOrderedAndProject (never a full sort)") {
    val s = SparkSpec.spark
    import s.implicits._
    val df = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val out = graft.core.ScaleOps.sampleExactN(df, "id", n = 37, salt = 3)
    assert(out.count() === 37L)
    val ids = out.select("id").collect().map(_.getLong(0)).toSet
    val again = graft.core.ScaleOps.sampleExactN(df.repartition(11), "id",
      n = 37, salt = 3).select("id").collect().map(_.getLong(0)).toSet
    assert(again === ids)
    // different salt -> a different (deterministic) sample
    val other = graft.core.ScaleOps.sampleExactN(df, "id", n = 37, salt = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(other !== ids)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      plan.linesIterator.take(6).mkString("\n"))
  }

  test("mixture sample: output approaches the target mix, deterministic, " +
       "infeasible targets fail fast") {
    val s = SparkSpec.spark
    import s.implicits._
    // 1000/500/100 rows of a/b/c; target 1:1:1 -> binding key is c
    // (n=100, w=1/3 -> N=300), so keep fractions are .1/.2/1.0
    val df = ((0 until 1000).map(i => (i.toLong, "a")) ++
      (1000 until 1500).map(i => (i.toLong, "b")) ++
      (1500 until 1600).map(i => (i.toLong, "c")))
      .toDF("id", "src")
    val out = graft.core.ScaleOps.mixtureSample(df, "id", "src", salt = 5,
      target = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
    val by = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by("c") === 100L, "binding key keeps everything")
    // hash buckets are uniform-ish: ~100 from a (f=.1), ~100 from b (f=.2)
    assert(by("a") > 60 && by("a") < 140, by.toString)
    assert(by("b") > 60 && by("b") < 140, by.toString)
    // deterministic under rerun + repartition
    val again = graft.core.ScaleOps.mixtureSample(df.repartition(7), "id",
        "src", salt = 5, target = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === out.select("id").collect().map(_.getLong(0)).toSet)
    // a target key with no rows is an infeasible mixture
    val e = intercept[IllegalArgumentException] {
      graft.core.ScaleOps.mixtureSample(df, "id", "src", salt = 5,
        target = Map("a" -> 1.0, "zz" -> 1.0))
    }
    assert(e.getMessage.contains("zz"))
  }

  test("weighted sample without replacement: heavy rows dominate the " +
       "sample, exact n, no duplicates, deterministic, TakeOrdered plan") {
    val s = SparkSpec.spark
    import s.implicits._
    // 100 rows at weight 100 vs 900 at weight 1: heavy rows carry ~92%
    // of the total mass, so a 200-row A-ES sample should contain nearly
    // all of them
    val df = ((0L until 100L).map(i => (i, 100.0)) ++
      (100L until 1000L).map(i => (i, 1.0))).toDF("id", "w")
    val out = graft.core.ScaleOps.weightedSampleN(df, "id", col("w"),
      n = 200, salt = 11)
    val ids = out.select("id").collect().map(_.getLong(0))
    assert(ids.length === 200)
    assert(ids.distinct.length === 200, "without replacement")
    val nHeavy = ids.count(_ < 100L)
    assert(nHeavy >= 85, s"only $nHeavy/100 heavy rows sampled")
    // deterministic under repartition; re-salt re-draws
    val again = graft.core.ScaleOps.weightedSampleN(df.repartition(7),
      "id", col("w"), n = 200, salt = 11)
      .select("id").collect().map(_.getLong(0))
    assert(again.toSeq === ids.toSeq)
    val resalt = graft.core.ScaleOps.weightedSampleN(df, "id", col("w"),
      n = 200, salt = 12).select("id").collect().map(_.getLong(0))
    assert(resalt.toSet !== ids.toSet)
    // the global ordered limit must plan as TakeOrderedAndProject
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      plan.linesIterator.take(6).mkString("\n"))
  }

  test("curriculum order: easy-to-hard within every shard, strided " +
       "global index is a bijection, hard-first flips, no global sort") {
    val s = SparkSpec.spark
    import s.implicits._
    val df = (0L until 400L).map(i => (i, s"doc $i", (i * 7 % 100) + 1))
      .toDF("id", "v", "difficulty")
    val out = ScaleOps.curriculumOrder(df, "id", col("difficulty"),
      nShards = 8, salt = 5)
    val rows = out.select("id", "shard", "pos", "global_pos")
      .as[(Long, Int, Int, Long)].collect()
    // bijection: global_pos = pos*8+shard is collision-free by stride
    assert(rows.map(_._4).distinct.length === rows.length)
    // within every shard, difficulty is non-decreasing along pos
    val diff = df.select("id", "difficulty").as[(Long, Long)]
      .collect().toMap
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_._3).map(r => diff(r._1))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b })
    }
    // hard-first mode reverses the per-shard order
    val desc = ScaleOps.curriculumOrder(df, "id", col("difficulty"),
        nShards = 8, salt = 5, descending = true)
      .select("id", "shard", "pos").as[(Long, Int, Int)].collect()
    desc.groupBy(_._2).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_._3).map(r => diff(r._1))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
    }
    // plan contract: the window partitions on the shard key — never a
    // single-partition global sort
    out.collect()
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("SinglePartition"), p)
  }

  test("shard shuffle: bijective (shard,pos) cover, dense per-shard " +
       "positions, append-stable shards, never a single-partition sort") {
    val s = SparkSpec.spark
    import s.implicits._
    val df = (0L until 800L).map(i => (i, s"v$i")).toDF("id", "v")
    val out = graft.core.ScaleOps.shardShuffle(df, "id", salt = 3,
      nShards = 8)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    assert(rows.length === 800)
    assert(rows.map(_._1).distinct.length === 800, "must be a permutation")
    assert(rows.forall { case (_, sh, _) => sh >= 0 && sh < 8 })
    for ((sh, g) <- rows.groupBy(_._2)) {
      val ps = g.map(_._3).sorted
      assert(ps.toSeq === (1 to g.length), s"shard $sh positions not dense")
    }
    // deterministic under repartition
    val again = graft.core.ScaleOps.shardShuffle(df.repartition(7), "id",
        salt = 3, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).toSet
    assert(again === rows.toSet)
    // appending rows never moves an existing row's SHARD (pos may shift)
    val more = ((0L until 800L) ++ (800L until 900L)).map(i => (i, s"v$i"))
      .toDF("id", "v")
    val shards0 = rows.map(r => r._1 -> r._2).toMap
    val shards1 = graft.core.ScaleOps.shardShuffle(more, "id", salt = 3,
        nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(shards0.forall { case (id, sh) => shards1(id) == sh })
    // a different salt re-permutes (some doc changes shard)
    val resalted = graft.core.ScaleOps.shardShuffle(df, "id", salt = 4,
        nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(shards0.exists { case (id, sh) => resalted(id) != sh })
    // plan: per-shard windows, no global single-partition sort
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"shard shuffle must not serialize onto one partition:\n$plan")
  }

  test("temperature mixture: alpha=0.5 flattens a skewed corpus toward " +
       "the tail, alpha=1 is the identity, deterministic under rerun") {
    val s = SparkSpec.spark
    import s.implicits._
    // 1600/100 rows of head/tail: p = (16/17, 1/17); sqrt flattening
    // gives w ≈ (.8, .2) -> binding key is the TAIL (kept whole) and
    // the head is cut to w_h*N/n_h ≈ .25
    val df = ((0 until 1600).map(i => (i.toLong, "head")) ++
      (1600 until 1700).map(i => (i.toLong, "tail")))
      .toDF("id", "src")
    val out = graft.core.ScaleOps.temperatureMixtureSample(df, "id", "src",
      salt = 7, alpha = 0.5)
    val by = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by("tail") === 100L, "binding (tail) key keeps everything")
    // exact expectation: w_h = sqrt(16/17)/(sqrt(16/17)+sqrt(1/17)),
    // N = n_t/w_t, cut = round(w_h*N/n_h*1e4) -> ~2462 of 1e4 buckets
    assert(by("head") > 300 && by("head") < 500,
      s"head not flattened to ~0.25: $by")
    // output shares moved toward uniform but not past it
    val headShare = by("head").toDouble / (by("head") + by("tail"))
    assert(headShare < 1600.0 / 1700.0 && headShare > 0.5, s"$by")
    // alpha=1 keeps the corpus identical (w = p -> every fraction 1)
    val id1 = graft.core.ScaleOps.temperatureMixtureSample(df, "id", "src",
      salt = 7, alpha = 1.0)
    assert(id1.count() === 1700L)
    // deterministic under rerun + repartition
    val again = graft.core.ScaleOps.temperatureMixtureSample(
        df.repartition(7), "id", "src", salt = 7, alpha = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === out.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("tokenBudgetMixture: epoch upsampling hits token targets, splits stay leak-free") {
    val s = spark
    import s.implicits._
    // source a: 50 docs × 10 tokens = 500 tokens; b: 200 × 10 = 2000
    val mk = (src: String, n: Int, off: Long) => (0 until n).map { i =>
      (off + i, src, Seq.fill(10)("tok").mkString(" "))
    }
    val df = (mk("a", 50, 0L) ++ mk("b", 200, 1000L))
      .toDF("id", "src", "text")
    // budget 3000, weights 1:1 → a desires 1500 tokens = e 3.0 (3 full
    // epochs, no fractional), b desires 1500 = e 0.75 (hash-kept ~75%)
    val out = ScaleOps.tokenBudgetMixture(df, "id", "src", "text",
      salt = 31, target = Map("a" -> 1.0, "b" -> 1.0), budgetTokens = 3000L)
    val byEpoch = out.groupBy("src", "epoch").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a: every doc in epochs 0,1,2; NO epoch-3 fractional row
    assert(byEpoch(("a", 0L)) === 50L && byEpoch(("a", 1L)) === 50L &&
      byEpoch(("a", 2L)) === 50L, byEpoch.toString)
    assert(!byEpoch.contains(("a", 3L)), byEpoch.toString)
    // b: single fractional epoch at ~75% of 200 docs
    assert(!byEpoch.contains(("b", 1L)), byEpoch.toString)
    val bKept = byEpoch(("b", 0L))
    assert(bKept > 120L && bKept < 180L, s"b kept $bKept of 200")
    // output token mass tracks the 1:1 spec (a exactly 1500, b ~1500)
    val mass = out.groupBy("src").agg(sum("n_tokens").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mass("a") === 1500L)
    assert(mass("b") > 1200L && mass("b") < 1800L, mass.toString)
    // deterministic under rerun + repartition
    val again = ScaleOps.tokenBudgetMixture(df.repartition(7), "id", "src",
        "text", salt = 31, target = Map("a" -> 1.0, "b" -> 1.0),
        budgetTokens = 3000L)
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === out.select("id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    // maxEpochs caps runaway upsampling of a mis-weighted tiny key
    val capped = ScaleOps.tokenBudgetMixture(df, "id", "src", "text",
      salt = 31, target = Map("a" -> 1000.0, "b" -> 1.0),
      budgetTokens = 3000L, maxEpochs = 2)
    assert(capped.agg(max("epoch")).first().getLong(0) <= 2L)
    // leak-freedom: hashSplit on the same id puts EVERY epoch of a doc
    // in one split — upsampled copies cannot straddle train/val
    val split = ScaleOps.hashSplit(out, "id", salt = 7,
      splits = Seq("train" -> 0.8, "val" -> 0.2))
    val straddlers = split.groupBy("id")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(straddlers === 0L)
    // a target key with no rows is an infeasible mixture
    val e = intercept[IllegalArgumentException] {
      ScaleOps.tokenBudgetMixture(df, "id", "src", "text", salt = 31,
        target = Map("a" -> 1.0, "zz" -> 1.0), budgetTokens = 3000L)
    }
    assert(e.getMessage.contains("zz"))
  }

  test("skewed series: fit-prefix caps bound the straggler per series, not per partition") {
    val s = spark
    import s.implicits._
    def mkSeries(sid: Long, n: Int, seed: Long): Seq[(Long, Long, Double)] = {
      val rnd = new scala.util.Random(seed)
      var p = 100.0
      (1 to n).map { t => p *= math.exp(rnd.nextGaussian() * 0.01); (sid, t.toLong, p) }
    }
    val skewed = (mkSeries(0L, 20000, 1) ++ mkSeries(1L, 200, 2) ++
        mkSeries(2L, 170, 3))
      .toDF("user_id", "t", "price")
      .repartition(1) // worst case: straggler shares its partition
      .cache()
    skewed.count()

    // featuresGrouped: per-series prefix cap — straggler clipped to the
    // cap, co-partitioned small series complete (cap-1 returns / full)
    val feat = graft.gen.RegimeConditional.featuresGrouped(
        skewed, "user_id", Seq("t"), "price", maxRowsPerSeries = 500)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(feat(0L) <= 500L, s"straggler not capped: ${feat(0L)}")
    // (±1-2 rows: the NaN/first-return feature filters, not the cap)
    assert(feat(1L) >= 195L && feat(1L) <= 199L,
      s"small series truncated: ${feat(1L)}")
    assert(feat(2L) >= 165L && feat(2L) <= 169L)

    // emStepGrouped: the mapPartitions fit buffers at most n rows per
    // series — every series (straggler included) emits exactly one model
    val em = graft.gen.RegimeConditional.emStepGrouped(
        skewed, "user_id", Seq("t"), "price", k = 3, n = 100)
      .filter(col("param") === "ll")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(em === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))

    // Spectral.distanceGrouped: the straggler's spectrum is truncated to
    // maxPoints WITH the capped flag set; small series stay exact with
    // capped=0 even in the same partition
    val spec = graft.stats.Spectral.distanceGrouped(
        skewed.filter(col("t") % 2 === 0), skewed.filter(col("t") % 2 === 1),
        "user_id", Seq("t"), "price", maxPoints = 128)
      .groupBy("user_id")
      .agg(count(lit(1)).as("nk"), max(col("capped")).as("capped"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // series 0: halves have 9999+ returns -> capped 128-point prefix
    // series 1: halves have 99 returns -> full 99-point spectrum
    // series 2: halves have 84 returns -> full 84-point spectrum
    assert(spec === Set((0L, 128L, 1), (1L, 99L, 0), (2L, 84L, 0)))
  }
}
