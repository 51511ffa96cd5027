package graft

import graft.operators.{CoreQueries, Similarity}
import org.apache.spark.sql.functions._

/** Plan-shape assertions guarding the §4 parity claims: the reference's
  * physical ideas (predicate pushdown to storage, partial+final aggregation,
  * per-file parallelism) must be visible in the executed plan, not assumed.
  * These assertions are what keeps a future refactor from silently turning a
  * pushed filter into a post-scan filter at 100 TB.
  */
class PlanShapeSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2/q3/q6 push their predicates into the parquet scan") {
    // the actual comparison must be pushed, not just an IsNotNull residue —
    // that distinction is what turns row-group stats into skipped I/O
    val expectations = Seq(
      CoreQueries.q2TimeFilterCount(spark, sf0001) -> "GreaterThan(ts,",
      CoreQueries.q3FilterCount(spark, sf0001)     -> "EqualTo(event_type,",
      CoreQueries.q6PointFilter(spark, sf0001)     -> "EqualTo(event_id,"
    )
    for ((df, pushed) <- expectations) {
      val plan = executedPlan(df)
      assert(plan.contains(pushed), s"'$pushed' not pushed in:\n$plan")
    }
  }

  test("q5 aggregates partial+final (the reference's hand-rolled merge)") {
    val plan = executedPlan(CoreQueries.q5MaxBy(spark, sf0001))
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"), plan)
    // two aggregate nodes: partial before the exchange, final after
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q9 broadcasts the dimension side") {
    val plan = executedPlan(CoreQueries.q9StarJoin(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q30's band join is an equi hash probe, not a nested loop") {
    val plan = executedPlan(CoreQueries.q30ValueBandJoin(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("round-6 event reports prune their scans to the columns they use") {
    // u1/u2: one aggregation pass — the events scan must read ONLY
    // (ts, user_id); a full-width scan here would drag value/props through
    // a 100 TB read
    Seq(
      graft.operators.Retention.retentionCohorts(spark, sf0001),
      graft.operators.Retention.newVsReturning(spark, sf0001)
    ).foreach { df =>
      val plan = executedPlan(df)
      // ts reads as bigint (legacy nanos-as-long files) or timestamp_ntz
      // (µs files) depending on the testdata vintage — prune is what matters
      assert(
        "ReadSchema: struct<ts:(bigint|timestamp_ntz),user_id:bigint>".r.findFirstIn(plan).isDefined,
        plan
      )
    }
    // s10/d17: narrow profile scans
    val s10 = executedPlan(graft.operators.Similarity.normStats(spark, sf0001))
    assert(s10.contains("ReadSchema: struct<embedding:array<float>,label:int>"), s10)
    val d17 = executedPlan(graft.operators.Profile.sizeHistogram(spark, sf0001))
    assert(d17.contains("ReadSchema: struct<source:string,n_chars:bigint>"), d17)
  }

  test("t3 is a pure narrow scan: no Generate, one output-sort exchange") {
    val plan = executedPlan(graft.operators.TextAnalysis.phraseSearch(spark, sf0001))
    assert(!plan.contains("Generate"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") == 1, plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("q2/q3 read only the columns they need") {
    val plan = executedPlan(CoreQueries.q3FilterCount(spark, sf0001))
    // count + filter on event_type must not drag the whole 6-column schema
    assert(plan.contains("ReadSchema: struct<event_type:string>"), plan)
  }

  test("s3 grouped top-k aggregates partially before the exchange") {
    val df = graft.operators.Similarity.annBatchTopK(spark, sf0001)
    df.collect()
    val plan = executedPlan(df)
    // Aggregator-based top-k plans as ObjectHashAggregate with a partial
    // pass before the exchange — the property that bounds shuffle volume.
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("parquet aggregate pushdown: count/min/max answered from footer metadata") {
    // The reference's entire architecture is 'push the aggregate into the
    // storage service' (QO:361, QO:289). Spark's DSv2 parquet scan does the
    // same from row-group metadata when aggregate pushdown is on.
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val raw = spark.read.parquet(s"$sf0001/orders.parquet")
      val agg = raw.selectExpr("count(*) AS cnt", "min(o_orderkey) AS min_id", "max(o_orderkey) AS max_id")
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)"), plan)
      val r = agg.head()
      assert(r.getLong(0) == 1500L && r.getLong(1) >= 0L && r.getLong(2) > r.getLong(1))
    } finally {
      spark.conf.unset("spark.sql.sources.useV1SourceList")
      spark.conf.unset("spark.sql.parquet.aggregatePushdown")
    }
  }

  test("p1 prunes day directories (PartitionFilters) and matches q2's answer") {
    val p1   = CoreQueries.p1PartitionedTimeCount(spark, sf0001)
    val plan = executedPlan(p1)
    // directory-level pruning must be visible in the scan — an empty
    // "PartitionFilters: []" means the layout investment bought nothing
    assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(plan).isDefined, plan)
    assert(p1.head().getLong(0) == CoreQueries.q2TimeFilterCount(spark, sf0001).head().getLong(0))
  }

  test("d8 broadcasts the benchmark shingle index; corpus side never shuffles pre-join") {
    val df   = graft.operators.Curation.decontaminate(spark, sf0001)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the corpus side must reach the join without an Exchange: the only
    // exchanges allowed are the broadcast itself and the post-join
    // per-doc aggregate / final sort
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    val preJoin = plan.substring(joinIdx)
    assert(!preJoin.contains("Exchange hashpartitioning"), plan)
  }

  test("q24 pushes all three filters to their scans and top-ks without a global sort") {
    val df   = CoreQueries.q24ShippingPriority(spark, sf0001)
    val plan = executedPlan(df)
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"), plan)
    assert(plan.contains("LessThan(o_orderdate,"), plan)
    assert(plan.contains("GreaterThan(l_shipdate,"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q25 broadcasts every dimension; facts join by hash") {
    val df   = CoreQueries.q25LocalSupplierVolume(spark, sf0001)
    val plan = executedPlan(df)
    // supplier, nation, region all ride broadcast joins
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
  }

  test("a1/a3 self-asof reads the events table exactly once (fused tagged scan)") {
    for (df <- Seq(
        graft.operators.AsOf.purchaseAsofClick(spark, sf0001),
        graft.operators.AsOf.purchaseAsofClickWithin(spark, sf0001)
      )) {
      val plan  = executedPlan(df)
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
      // and the side filter reaches that single scan
      assert(plan.contains("In(event_type") || plan.contains("event_type IN"), plan)
    }
  }

  test("n8 build path reads documents exactly once: hoisted exchanges are reused, not recomputed") {
    val df = graft.operators.Dedup.redactSharedSpansLive(spark, sf0001)
    df.collect() // AQE reuses stages at runtime; the FINAL plan shows it
    // AdaptiveSparkPlan prints final plan then "== Initial Plan ==" (which
    // never shows runtime stage reuse) — assert on the final section only
    val plan  = executedPlan(df).split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 documents scan, got $scans:\n$plan")
    // the span explode (the dominant map cost) must also appear once, and
    // both hoisted exchanges must actually be reused
    val explodes = "Generate explode".r.findAllIn(plan).size
    assert(explodes == 1, s"expected 1 span explode, got $explodes:\n$plan")
    assert("ReusedExchange".r.findAllIn(plan).size >= 2, plan)
  }

  test("d16 build path reads documents exactly once (shared span_fp exchange)") {
    val df = graft.operators.Dedup.spanShareStatsLive(spark, sf0001)
    df.collect()
    val plan  = executedPlan(df).split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 documents scan, got $scans:\n$plan")
    assert("Generate explode".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("ReusedExchange"), plan)
  }

  test("layout-backed span queries never re-explode the corpus: n7/d16 read the span layout") {
    // n7 and d16 must be pure layout reads (plus the tiny final sort/ratio)
    // — no split/md5/explode over documents text in their executed plans.
    for (
      df <- Seq(
        graft.operators.Dedup.sharedSpans(spark, sf0001),
        graft.operators.Dedup.spanShareStats(spark, sf0001)
      )
    ) {
      df.collect()
      val plan = executedPlan(df).split("== Initial Plan ==")(0)
      assert(!plan.contains("Generate explode"), s"span query re-derived the stream:\n$plan")
      assert(!plan.contains("md5"), s"span query re-hashed text:\n$plan")
    }
    // n8/n11 still scan documents (the rebuild needs toks) but exactly once,
    // and without the span-window md5 pass.
    for (
      df <- Seq(
        graft.operators.Dedup.redactSharedSpans(spark, sf0001),
        graft.operators.Dedup.maxSharedSegments(spark, sf0001)
      )
    ) {
      df.collect()
      val plan  = executedPlan(df).split("== Initial Plan ==")(0)
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans == 2, s"expected documents + starts scans, got $scans:\n$plan")
      assert(!plan.contains("Generate explode"), s"span query re-derived the stream:\n$plan")
    }
  }

  test("a6 bucketed as-of runs its window with ZERO hash exchange, and equals a1") {
    val a6 = graft.operators.AsOf.purchaseAsofClickBucketed(spark, sf0001)
    a6.collect()
    val plan = executedPlan(a6).split("== Initial Plan ==")(0)
    // the bucketed scan satisfies the window's distribution; the only
    // allowed exchange is the final orderBy's range partitioning
    assert(
      !plan.contains("Exchange hashpartitioning"),
      s"window should ride the bucket partitioning:\n$plan"
    )
    assert(plan.contains("Bucketed: true"), plan)
    val a1 = graft.operators.AsOf.purchaseAsofClick(spark, sf0001)
    assert(a6.exceptAll(a1).isEmpty && a1.exceptAll(a6).isEmpty)
    assert(a6.count() > 0)
  }

  test("ann scoring stays in whole-stage codegen (no fallback)") {
    val df   = Similarity.annBruteForce(spark, sf0001)
    df.collect() // forces codegen; a CompileException fallback would log loudly
    val plan = executedPlan(df)
    // AQE plan strings mark whole-stage-codegen spans as "*(n)"; the scoring
    // projection must sit inside one.
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[vec_id.*cosine_sim.*"), plan)
  }

  test("q29 pushes every predicate of the scan-only aggregate (its entire cost model)") {
    // the default plan printer truncates PushedFilters at 100 chars — widen
    // it so the assertion sees the full pushed-filter list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan =
      try executedPlan(CoreQueries.q29DiscountRevenue(spark, sf0001))
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    for (p <- Seq(
        "GreaterThanOrEqual(l_shipdate,", "LessThan(l_shipdate,",
        "GreaterThanOrEqual(l_discount,", "LessThanOrEqual(l_discount,",
        "LessThan(l_quantity,"
      ))
      assert(plan.contains(p), s"'$p' not pushed in:\n$plan")
    // and partial aggregation before the single-row exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("z1 pushes BOTH rectangle predicates into the z-ordered layout scan") {
    // the z-order layout's whole value proposition is that user_id AND ts
    // row-group stats are simultaneously tight — which only pays off if
    // both predicates actually reach the parquet reader as pushed filters
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan =
      try executedPlan(CoreQueries.z1ZorderRange(spark, sf0001))
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    for (p <- Seq(
        "GreaterThanOrEqual(user_id,40)", "LessThanOrEqual(user_id,90)",
        "GreaterThanOrEqual(ts,", "LessThan(ts,"
      ))
      assert(plan.contains(p), s"'$p' not pushed in:\n$plan")
  }

  test("w3 funnel single-pass form: one events scan, event-type filter pushed, one wide exchange") {
    val plan  = executedPlan(graft.operators.Funnel.funnelStages(spark, sf0001))
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
    assert(plan.contains("In(event_type") || plan.contains("event_type IN"), plan)
    // the three window passes + per-user collapse all reuse ONE user_id
    // hash exchange; the only other exchange is the single-row final count
    val userExchanges = "hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(userExchanges == 1, s"expected 1 user_id exchange, got $userExchanges:\n$plan")
    // and no unspillable per-user array aggregation anywhere in the plan
    assert(!plan.contains("collect_list"), plan)
  }

  test("s8/s9 coarse pass physically reads only (vec_id, q8) from the stored int8 layout") {
    // the 4×-bandwidth claim is a plan property: the coarse scan's
    // ReadSchema must carry the tinyint copy and NOT the float embeddings
    val s8plan = executedPlan(Similarity.annQuantized(spark, sf0001))
    assert(s8plan.contains("ReadSchema: struct<vec_id:bigint,q8:array<tinyint>>"), s8plan)
    val s9plan = executedPlan(Similarity.annIvfQuantized(spark, sf0001))
    assert(s9plan.contains("ReadSchema: struct<vec_id:bigint,q8:array<tinyint>>"), s9plan)
    // the float fetch is a separate scan bounded to the shortlist probe,
    // and both s9 scans stay partition-pruned to the probed clusters
    assert(s9plan.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"), s9plan)
    assert("PartitionFilters: \\[[^\\]]*cl".r.findFirstIn(s9plan).isDefined, s9plan)
  }

  test("w6 auxiliary scans are column-pruned to one column each (bounds=ts, types=event_type)") {
    // Catalyst rewrites the counts-derived bounds/types branches into direct
    // scans (RemoveRedundantAggregates) — the guarantee that matters is that
    // those extra passes read ONE column each, not the full table width
    val df = CoreQueries.w6ResampleHourly(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // ts reads as bigint (legacy nanos-as-long files) or timestamp_ntz (µs
    // files) depending on the testdata vintage — prune is what matters
    assert("ReadSchema: struct<ts:(bigint|timestamp_ntz)>".r.findFirstIn(plan).isDefined, plan)
    assert(plan.contains("ReadSchema: struct<event_type:string>"), plan)
    // exactly one scan carries both columns (the counting pass)
    assert("ReadSchema: struct<ts:(bigint|timestamp_ntz),event_type:string>".r.findFirstIn(plan).isDefined, plan)
  }

  test("runtime bloom filter: a selective dim predicate prunes the fact side of a shuffle join") {
    // The 100 TB lever behind every selective dim ⋈ fact shuffle join:
    // Spark builds a bloom filter from the FILTERED side at runtime and
    // applies it to the fact scan, so most fact rows die before the
    // exchange. Size thresholds are tuned for clusters, not test corpora —
    // lower the application-side floor so the optimizer engages here.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled"                          -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold"                                     -> "-1" // force the shuffle join shape
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li  = graft.sources.Tables.lineitem(spark, sf0001)
      val ord = graft.sources.Tables.orders(spark, sf0001).where(col("o_orderpriority") === "1-URGENT")
      val j   = li.join(ord, col("l_orderkey") === col("o_orderkey")).groupBy("o_orderpriority").count()
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloom"), s"no runtime bloom filter injected:\n$plan")
      // and the filtered plan still answers correctly
      val n = j.collect().map(r => r.getLong(1)).sum
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val n2 = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == n2, s"bloom-filtered count $n != plain count $n2")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("s13 knn join: corpus broadcasts once, top-k aggregates partially, corpus never shuffles scored") {
    val df = Similarity.knnJoin(spark, sf0001)
    df.collect()
    val plan = executedPlan(df)
    // the neighbor side rides a broadcast nested-loop (the labeled brute
    // rung's cross product) — never a shuffled cartesian
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // and the per-vector top-k collapses map-side before the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("s14 knn join: candidates come from an equi hash join on cl, not any nested loop") {
    val df = Similarity.knnJoinIvf(spark, sf0001)
    df.collect()
    val plan = executedPlan(df)
    // probe-bounded candidate generation must be a key-equality join on the
    // cluster id — the shape whose per-task width is one cluster at 100 TB
    assert(
      plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("BroadcastHashJoin"),
      plan
    )
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q31 keeps the outer join outer (zero bucket) and pushes the priority filter") {
    val df = CoreQueries.q31CustomerOrderDistribution(spark, sf0001)
    df.collect()
    val plan = executedPlan(df)
    assert(plan.contains("LeftOuter") || plan.contains("RightOuter"), plan)
    // the predicate lives on the orders scan, not post-join (where it would
    // silently erase the zero bucket)
    assert(plan.contains("Not(EqualTo(o_orderpriority"), plan)
  }

  test("q33 aggregates lineitem before any dimension join and top-ks without a global sort") {
    val df = CoreQueries.q33LargeOrders(spark, sf0001)
    df.collect()
    val plan = executedPlan(df)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // partial+final over lineitem: the HAVING filter runs on aggregated
    // rows, so orders/customer join a hundreds-row side
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q35's nested-IN ladder is two semi joins — nothing duplicate-inflating") {
    val df = CoreQueries.q35ExcessShipments(spark, sf0001)
    df.collect()
    val plan = executedPlan(df)
    assert("LeftSemi".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    // both date bounds push to the lineitem scan
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") && plan.contains("LessThan(l_shipdate"), plan)
  }

  test("q40 top-ks without a global sort and joins dimensions after the per-customer collapse") {
    val df = CoreQueries.q40ReturnedItemRevenue(spark, sf0001)
    df.collect()
    val plan = executedPlan(df)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // both selective predicates pushed to their scans
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan)
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") && plan.contains("LessThan(o_orderdate"), plan)
  }

  test("q41's NOT IN runs as an anti join, never a nested loop") {
    val df = CoreQueries.q41SupplierDiversity(spark, sf0001)
    df.collect()
    val plan = executedPlan(df)
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    // the blacklist side is pruned at its scan
    assert(plan.contains("LessThan(s_acctbal,0"), plan)
  }

  test("q43's OR-of-ANDs stays a residual on ONE equi hash probe") {
    val df = CoreQueries.q43DisjunctiveRevenue(spark, sf0001)
    df.collect()
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
  }

  test("q42's pair disjunction never degrades the nation joins to a nested loop") {
    val df = CoreQueries.q42TradeVolume(spark, sf0001)
    df.collect()
    val plan = executedPlan(df)
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    // the ship-date range is pushed to the lineitem scan
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") && plan.contains("LessThan(l_shipdate"), plan)
  }

  test("q45/q46 never touch a fact table — the derived partsupp keeps the whole plan dim-sized") {
    for (df <- Seq(CoreQueries.q45MinCostSupplier(spark, sf0001), CoreQueries.q46ImportantStock(spark, sf0001))) {
      df.collect()
      val plan = executedPlan(df)
      assert(!plan.contains("lineitem.parquet") && !plan.contains("orders.parquet") &&
        !plan.contains("events"), plan)
      assert(plan.contains("BroadcastHashJoin"), plan)
    }
  }

  test("q45's LIMIT plans as a distributed top-k, not a global sort") {
    val df = CoreQueries.q45MinCostSupplier(spark, sf0001)
    df.collect()
    assert(executedPlan(df).contains("TakeOrderedAndProject"), executedPlan(df))
  }

  // AQE plan strings repeat every node under "== Initial Plan ==" — scan
  // counts must grade the FINAL section only or each scan double-counts.
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val s = executedPlan(df)
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("q47/q49 prune their single lineitem scan with both pushed date bounds") {
    for (df <- Seq(CoreQueries.q47TopSupplier(spark, sf0001), CoreQueries.q49ExcessAvailability(spark, sf0001))) {
      df.collect()
      val plan = finalPlan(df)
      assert("Scan parquet .*lineitem".r.findAllIn(plan).size == 1, plan)
      assert(plan.contains("GreaterThanOrEqual(l_shipdate") && plan.contains("LessThan(l_shipdate"), plan)
    }
  }

  test("q49's quantified memberships stay semi joins — no duplicate-inflating inner join") {
    val df = CoreQueries.q49ExcessAvailability(spark, sf0001)
    df.collect()
    val plan = executedPlan(df)
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q48 scans each fact once and broadcasts every dimension side") {
    val df = CoreQueries.q48ProductProfit(spark, sf0001)
    df.collect()
    val plan = finalPlan(df)
    assert("Scan parquet .*lineitem".r.findAllIn(plan).size == 1, plan)
    assert("Scan parquet .*orders".r.findAllIn(plan).size == 1, plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("t15 pushes the term equality filters into the token-clustered positions scan") {
    val df = graft.operators.TextAnalysis.phraseSearchIndexed(spark, sf0001)
    df.collect()
    val plan =
      try {
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
        executedPlan(df)
      } finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    // both terms' equality predicates must reach their layout scans — the
    // docstring's "query I/O = the two matched tokens' posting rows" claim
    graft.operators.TextAnalysis.PhraseTerms.take(2).foreach { t =>
      assert(plan.contains(s"EqualTo(token,$t)"), s"'$t' filter not pushed:\n$plan")
    }
  }

  // AQE's executedPlan.toString elides materialized stage subtrees; the
  // formatted explain (what PLANS.md records) prints the full final tree.
  private def formattedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
  }

  test("u3 buckets without a single-partition window (the global-ntile trap)") {
    val plan = formattedPlan(graft.operators.Retention.rfmSegments(spark, sf0001))
    // the quartile cut-points are a scalar aggregate broadcast back, never
    // a Window over SinglePartition — the docstring's core claim
    assert(!plan.contains("Window"), s"unexpected window node:\n$plan")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size >= 2, plan)
  }

  test("q51's island windows and aggregates all key on l_suppkey — no overlap self-join") {
    val plan = formattedPlan(CoreQueries.q51SupplierBusyDays(spark, sf0001))
    assert(plan.contains("Window"), plan)
    // no self-join of the interval frame: exactly one lineitem scan
    // (formatted mode puts the path on the scan's Location detail line)
    assert("Location.*lineitem".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("m7's windows and aggregate all hash-partition on media_id — never a single partition") {
    val plan = formattedPlan(graft.operators.Multimodal.audioActivitySegments(spark, sf0001))
    assert(plan.contains("hashpartitioning(media_id"), plan)
    // the segment windows must be keyed — a partition-less window here
    // would serialize every recording through one task
    assert(!plan.contains("SinglePartition"), s"single-partition stage found:\n$plan")
  }

  test("t8 candidate phase reads the trigram layout with the gram IN-list pushed; corpus untouched there") {
    val df = graft.operators.TextAnalysis.substringSearch(spark, sf0001)
    df.collect()
    val plan =
      try {
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
        executedPlan(df)
      } finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert(plan.contains("In(g, ["), s"gram IN-list not pushed:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
