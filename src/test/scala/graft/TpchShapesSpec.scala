package graft

import graft.operators.{CoreQueries, Dedup, Profile}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-10 decorrelation shapes (q31–q35: TPC-H Q13/Q17/Q18/Q21/Q20) plus
  * the corpus novelty (n15) and source-affinity (d26) operators. Each query
  * carries a full DuckDB oracle at the driver gate; these specs pin the
  * SEMANTIC invariants a hash compare can't articulate — the outer-join
  * zero bucket, plan-equivalence against an independently-shaped twin, and
  * planted fixtures with hand-computable answers.
  */
class TpchShapesSpec extends SparkSpec {

  test("q31: distribution accounts for every customer, and the zero bucket is the outer join's work") {
    val dist = CoreQueries.q31CustomerOrderDistribution(spark, sf001).collect()
    val nCustomers = Tables.customer(spark, sf001).count()
    assert(dist.map(_.getLong(1)).sum == nCustomers, "Σ custdist must equal |customer|")
    // the zero bucket = customers with no non-urgent order — recomputed by anti join
    val zero = dist.find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L)
    val expectedZero = Tables
      .customer(spark, sf001)
      .join(
        Tables.orders(spark, sf001).where(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"),
        "left_anti"
      )
      .count()
    assert(zero == expectedZero)
    // an INNER join would erase exactly that bucket — the Q13 signature
    assert(zero > 0, "fixture must exercise the outer-join bucket")
  }

  test("q32: window form ≡ independently-shaped agg+join twin") {
    val got = CoreQueries.q32SmallQuantityRevenue(spark, sf001).head()
    val lp = Tables
      .lineitem(spark, sf001)
      .join(
        Tables.part(spark, sf001).where(col("p_brand") === "Brand#4").select("p_partkey"),
        col("l_partkey") === col("p_partkey")
      )
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"), col("l_extendedprice"))
    val st = lp.groupBy("l_partkey").agg(count(lit(1)).as("n"), sum("qty").as("s"))
    val twin = lp
      .join(st, "l_partkey")
      .where(col("qty") * 5 * col("n") < col("s"))
      .agg(
        expr("cast(sum(cast(l_extendedprice as decimal(12,2)) * 10000) as bigint)").as("revenue_e4"),
        count(lit(1)).as("cnt")
      )
      .head()
    assert(got.getAs[Long]("revenue_e4") == twin.getAs[Long]("revenue_e4"))
    assert(got.getAs[Long]("cnt") == twin.getAs[Long]("cnt"))
    assert(got.getAs[Long]("cnt") > 0, "boundary rule must keep some rows at sf0.01")
  }

  test("q33: every kept order exceeds the threshold and the cut is the qty order") {
    val rows = CoreQueries.q33LargeOrders(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getAs[Long]("total_qty") > 250L))
    val qtys = rows.map(_.getAs[Long]("total_qty"))
    assert(qtys.zip(qtys.tail).forall { case (a, b) => a >= b }, "descending by total_qty")
    // spot-recompute the top order's quantity straight off lineitem
    val top = rows.head
    val recount = Tables
      .lineitem(spark, sf001)
      .where(col("l_orderkey") === top.getAs[Long]("o_orderkey"))
      .agg(sum(col("l_quantity").cast("long")))
      .head()
      .getLong(0)
    assert(recount == top.getAs[Long]("total_qty"))
  }

  test("q34: window decorrelation ≡ plain-Scala correlated replay (sf0.001)") {
    // independent replay of the EXISTS ∧ NOT EXISTS semantics, driver-side,
    // at the small sf where a correlated loop is cheap
    val lo = Tables
      .lineitem(spark, sf0001)
      .join(
        Tables.orders(spark, sf0001).where(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey")
      )
      .select(
        col("l_orderkey"),
        col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("interval 90 days")).as("late")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = lo.groupBy(_._1)
    val numwait = lo
      .filter { case (ok, sk, late) =>
        val lines = byOrder(ok)
        val otherSupp = lines.exists(_._2 != sk) // EXISTS
        val otherLate = lines.exists(l => l._2 != sk && l._3) // NOT EXISTS, negated
        late && otherSupp && !otherLate
      }
      .groupBy(_._2)
      .view
      .mapValues(_.size.toLong)
      .toMap
    val names = Tables
      .supplier(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[String]("s_name")))
      .toMap
    val expected = numwait.toSeq
      .map { case (sk, n) => (names(sk), n) }
      .sortBy { case (name, n) => (-n, name) }
      .take(100)
    val got = CoreQueries
      .q34WaitingSuppliers(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    assert(got == expected)
    assert(got.nonEmpty, "fixture must produce waiting suppliers")
  }

  test("q35: membership is exactly the grouped-HAVING set, and non-members are excluded") {
    val got = CoreQueries.q35ExcessShipments(spark, sf001).collect().map(_.getAs[Long]("s_suppkey")).toSet
    val qualifying = Tables
      .lineitem(spark, sf001)
      .where(
        col("l_shipdate") >= expr("timestamp_ntz'1997-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp_ntz'1998-01-01 00:00:00'")
      )
      .join(
        Tables.part(spark, sf001).where(col("p_type") === "PROMO").select("p_partkey"),
        col("l_partkey") === col("p_partkey")
      ) // inner join twin — duplicate-safe only because it feeds a grouped agg
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
      .where(col("qty") > 50)
      .select("l_suppkey")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(got == qualifying)
    assert(got.nonEmpty)
    val all = Tables.supplier(spark, sf001).count()
    assert(got.size < all, "threshold must actually exclude suppliers")
  }

  test("q36: the two CASE counts partition the late-shipped join exactly") {
    val rows = CoreQueries.q36LateShipmentPriority(spark, sf001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    val recount = Tables
      .lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("interval 90 days"))
      .count()
    assert(total == recount, "high + low must partition the late-shipped set")
    assert(rows.forall(r => r.getAs[Long]("high_line_count") > 0 && r.getAs[Long]("low_line_count") > 0))
  }

  test("q37: plain-Scala replay of both quantified predicates (sf0.001)") {
    val custs = Tables
      .customer(spark, sf0001)
      .selectExpr("c_custkey", "c_nationkey", "cast(cast(c_acctbal as decimal(12,2)) * 100 as bigint) as bal_cents")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val pos   = custs.map(_._3).filter(_ > 0)
    val total = pos.sum; val n = pos.length
    val recent = Tables
      .orders(spark, sf0001)
      .where(col("o_orderdate") >= expr("timestamp_ntz'2000-01-01 00:00:00'"))
      .select("o_custkey")
      .collect()
      .map(_.getLong(0))
      .toSet
    val expected = custs
      .filter { case (ck, _, bal) => bal * n > total && !recent.contains(ck) }
      .groupBy(_._2)
      .map { case (nk, cs) => (nk, cs.length.toLong, cs.map(_._3).sum) }
      .toSeq
      .sortBy(_._1)
    val got = CoreQueries
      .q37DormantRichCustomers(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("q38: the distinct IS the EXISTS — multi-late orders count once") {
    val rows  = CoreQueries.q38PriorityLateOrders(spark, sf001).collect()
    val total = rows.map(_.getAs[Long]("order_count")).sum
    // recount: distinct orders with >=1 late line inside the quarter
    val recount = Tables
      .orders(spark, sf001)
      .where(
        col("o_orderdate") >= expr("timestamp_ntz'1997-07-01 00:00:00'") &&
          col("o_orderdate") < expr("timestamp_ntz'1997-10-01 00:00:00'")
      )
      .join(Tables.lineitem(spark, sf001), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("interval 90 days"))
      .select(countDistinct("o_orderkey"))
      .head()
      .getLong(0)
    assert(total == recount && rows.nonEmpty)
    // and strictly fewer than the late LINE count — EXISTS semantics bite
    val lateLines = Tables
      .orders(spark, sf001)
      .where(
        col("o_orderdate") >= expr("timestamp_ntz'1997-07-01 00:00:00'") &&
          col("o_orderdate") < expr("timestamp_ntz'1997-10-01 00:00:00'")
      )
      .join(Tables.lineitem(spark, sf001), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("interval 90 days"))
      .count()
    assert(total < lateLines)
  }

  test("q39: one-pass CASE sums ≡ two independently filtered chains; share bounded") {
    val rows = CoreQueries.q39MarketShare(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("nation_e4") <= r.getAs[Long]("total_e4")))
    assert(rows.exists(_.getAs[Long]("nation_e4") > 0L), "numerator must be non-vacuous at sf0.01")
    // independent twin: run the chain filtered to the subject nation only
    // and compare against the CASE numerator
    val twin = {
      val nation = Tables.nation(spark, sf001)
      val demand = nation
        .join(
          Tables.region(spark, sf001).where(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey")
        )
        .select(col("n_nationkey").as("cust_nationkey"))
      Tables
        .lineitem(spark, sf001)
        .join(
          Tables
            .orders(spark, sf001)
            .where(
              col("o_orderdate") >= expr("timestamp_ntz'1996-01-01 00:00:00'") &&
                col("o_orderdate") < expr("timestamp_ntz'1998-01-01 00:00:00'")
            ),
          col("l_orderkey") === col("o_orderkey")
        )
        .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
        .join(demand, col("c_nationkey") === col("cust_nationkey"))
        .join(
          Tables.part(spark, sf001).where(col("p_type") === "ECONOMY").select("p_partkey"),
          col("l_partkey") === col("p_partkey")
        )
        .join(Tables.supplier(spark, sf001), col("l_suppkey") === col("s_suppkey"))
        .join(
          Tables.nation(spark, sf001).where(col("n_name") === "NATION_1").select(col("n_nationkey").as("sn")),
          col("s_nationkey") === col("sn")
        )
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          expr(
            "cast(sum(cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(12,2)))) * 10000 as bigint)"
          ).as("numer")
        )
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)))
        .toMap
    }
    rows.foreach { r =>
      assert(twin.getOrElse(r.getInt(0), 0L) == r.getAs[Long]("nation_e4"))
    }
  }

  test("d28: verdicts replay n15's profile; short docs keep") {
    import spark.implicits._
    val gate = Dedup.noveltyGate(spark, sf001).collect()
    assert(gate.length == Tables.documents(spark, sf001).count(), "one verdict per document")
    val novelty = Dedup
      .noveltyScores(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_seen_before"))))
      .toMap
    gate.foreach { r =>
      val (ns, nb) = novelty.getOrElse(r.getLong(0), (0L, 0L))
      assert(r.getAs[Long]("n_shingles") == ns && r.getAs[Long]("n_seen_before") == nb)
      val drop = ns > 0 && nb * Dedup.NoveltyGateDen >= ns * Dedup.NoveltyGateNum
      assert(r.getAs[String]("verdict") == (if (drop) "drop" else "keep"))
    }
    assert(gate.exists(_.getAs[String]("verdict") == "drop"), "the corpus's exact dups must drop")
    // planted short doc: no shingles → keep
    val dir = java.nio.file.Files.createTempDirectory("graft_d28").toString
    Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "xy")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val small = Dedup.noveltyGate(spark, dir).collect().map(r => (r.getLong(0), r.getAs[String]("verdict"))).toSeq
    assert(small == Seq((1L, "keep"), (2L, "drop"), (3L, "keep")))
  }

  test("q40: top-20 is revenue-ordered and a sampled customer's revenue recounts") {
    val rows = CoreQueries.q40ReturnedItemRevenue(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Long]("revenue_e4"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    val top = rows.head
    val recount = Tables
      .lineitem(spark, sf001)
      .where(col("l_returnflag") === "R")
      .join(
        Tables
          .orders(spark, sf001)
          .where(
            col("o_orderdate") >= expr("timestamp_ntz'1997-01-01 00:00:00'") &&
              col("o_orderdate") < expr("timestamp_ntz'1997-04-01 00:00:00'")
          )
          .where(col("o_custkey") === top.getAs[Long]("c_custkey")),
        col("l_orderkey") === col("o_orderkey")
      )
      .agg(
        (sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(12,2)"))) * 10000)
          .cast("long")
      )
      .head().getLong(0)
    assert(recount == top.getAs[Long]("revenue_e4"))
  }

  test("q41: the NOT-IN blacklist has teeth — adding it back changes the census") {
    val withBlacklist = CoreQueries.q41SupplierDiversity(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getAs[Long]("supplier_cnt"))).toMap
    // twin without the anti join: counts can only grow
    val without = Tables
      .lineitem(spark, sf001)
      .select("l_partkey", "l_suppkey")
      .join(
        Tables
          .part(spark, sf001)
          .where(col("p_brand") =!= "Brand#4" && col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
          .select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey")
      )
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("cnt"))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getAs[Long]("cnt"))).toMap
    assert(withBlacklist.forall { case (k, c) => c <= without(k) })
    assert(withBlacklist.exists { case (k, c) => c < without(k) }, "blacklist must exclude something")
  }

  test("q42: both trade directions present; totals match a direction-agnostic recount") {
    val rows = CoreQueries.q42TradeVolume(spark, sf001).collect()
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(dirs == Set(("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")))
    assert(rows.map(_.getAs[Int]("yr")).toSet == Set(1996, 1997))
  }

  test("q43: the OR residual equals the union of the three separately-filtered clauses") {
    val combined = CoreQueries.q43DisjunctiveRevenue(spark, sf001).head()
    val base = Tables
      .lineitem(spark, sf001)
      .join(Tables.part(spark, sf001).select("p_partkey", "p_brand", "p_size"), col("l_partkey") === col("p_partkey"))
    val clauses = Seq(
      col("p_brand") === "Brand#4" && col("p_size").between(1, 15) && col("l_quantity").between(1, 21),
      col("p_brand") === "Brand#9" && col("p_size").between(1, 25) && col("l_quantity").between(10, 30),
      col("p_brand") === "Brand#19" && col("p_size").between(1, 35) && col("l_quantity").between(20, 40)
    )
    // clauses are brand-disjoint, so counts/revenues ADD exactly
    val parts = clauses.map { c =>
      val r = base
        .where(c)
        .agg(
          (sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(12,2)"))) * 10000)
            .cast("long").as("rev"),
          count(lit(1)).as("n")
        )
        .head()
      (Option(r.getAs[Long]("rev")).getOrElse(0L), r.getAs[Long]("n"))
    }
    assert(parts.map(_._2).sum == combined.getAs[Long]("cnt"))
    assert(parts.map(_._1).sum == combined.getAs[Long]("revenue_e4"))
    assert(combined.getAs[Long]("cnt") > 0)
  }

  test("q44: promo share is bounded and the CASE pass equals two filtered aggregates") {
    val r = CoreQueries.q44PromoRevenue(spark, sf001).head()
    val promo = r.getAs[Long]("promo_e4"); val total = r.getAs[Long]("total_e4")
    assert(promo > 0 && promo < total)
    val month = Tables
      .lineitem(spark, sf001)
      .where(
        col("l_shipdate") >= expr("timestamp_ntz'1997-06-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp_ntz'1997-07-01 00:00:00'")
      )
      .join(Tables.part(spark, sf001).select("p_partkey", "p_type"), col("l_partkey") === col("p_partkey"))
    def rev(df: org.apache.spark.sql.DataFrame) = df
      .agg(
        (sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(12,2)"))) * 10000)
          .cast("long")
      )
      .head().getLong(0)
    assert(rev(month.where(col("p_type") === "PROMO")) == promo)
    assert(rev(month) == total)
  }

  test("n15: planted corpus — novelty counts by hand") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_n15").toString
    // doc 1: 4 distinct shingles, all first-seen. doc 2 repeats doc 1
    // verbatim (all 4 stale). doc 3 shares a 3-token suffix overlap plus
    // fresh content. doc 4 is too short for any shingle (absent from output).
    Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),
      (3L, "d e f g h"),
      (4L, "x y")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup
      .noveltyScores(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_shingles"), r.getAs[Long]("n_seen_before")))
      .toSeq
    // doc1: {abc,bcd,cde,def} all new; doc2: same 4, all seen; doc3:
    // {def,efg,fgh} — def seen (doc1), 2 new
    assert(got == Seq((1L, 4L, 0L), (2L, 4L, 4L), (3L, 3L, 1L)))
  }

  test("d26: planted sources — intersection and sizes by hand, symmetric bound holds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d26").toString
    // srcA and srcB share exactly the shingle "c d e"; srcC is disjoint
    Seq(
      (1L, "a b c d e", "srcA"),
      (2L, "c d e f g", "srcB"),
      (3L, "p q r s", "srcC")
    ).toDF("doc_id", "text", "source").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Profile.sourceAffinity(spark, dir).collect()
    assert(rows.length == 1, "only the overlapping pair appears")
    val r = rows.head
    assert(r.getAs[String]("src_a") == "srcA" && r.getAs[String]("src_b") == "srcB")
    assert(r.getAs[Long]("inter") == 1L && r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
  }

  test("d26: corpus run — inter ≤ min(n_a, n_b), sizes match the shingle census, ordering canonical") {
    val rows = Profile.sourceAffinity(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("inter") <= math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))))
    assert(rows.forall(r => r.getAs[String]("src_a") < r.getAs[String]("src_b")), "pairs canonically ordered")
    // n_a agrees with an independent per-source distinct-shingle census
    val census = Dedup
      .shinglesKeyed(Tables.documents(spark, sf001).select("source", "text"), "source")
      .distinct()
      .groupBy("source")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toMap
    assert(rows.forall(r => census(r.getAs[String]("src_a")) == r.getAs[Long]("n_a")))
    assert(rows.forall(r => census(r.getAs[String]("src_b")) == r.getAs[Long]("n_b")))
  }

  test("partsupp: a well-formed derived catalog at every SF (PK, per-part fanout, value ranges)") {
    for (d <- Seq(sf0001, sf001)) {
      val ps = Tables.partsupp(spark, d).collect()
      val s  = Tables.supplier(spark, d).count()
      val nP = Tables.part(spark, d).count()
      assert(ps.length == nP * Tables.PartSuppPerPart)
      // (partkey, suppkey) is a primary key — the consecutive-stagger
      // formula guarantees distinct suppliers per part for S ≥ 4
      assert(ps.map(r => (r.getLong(0), r.getLong(1))).distinct.length == ps.length)
      assert(ps.forall(r => r.getLong(1) >= 0 && r.getLong(1) < s))
      assert(ps.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= Tables.AvailQtyMod))
      assert(ps.forall(r =>
        r.getLong(3) >= Tables.CostCentsMin && r.getLong(3) < Tables.CostCentsMod + Tables.CostCentsMin))
    }
  }

  test("q45: each kept row's cost is the true regional minimum for its part, and the sort is total") {
    val rows = CoreQueries.q45MinCostSupplier(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // independent min per part over the same eligible frame
    val mins = Tables
      .partsupp(spark, sf001)
      .join(
        Tables.part(spark, sf001).where(col("p_size") <= 10 && col("p_type") === "STANDARD").select("p_partkey"),
        col("ps_partkey") === col("p_partkey")
      )
      .join(Tables.supplier(spark, sf001), col("ps_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf001), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf001).where(col("r_name") === "EUROPE"), col("n_regionkey") === col("r_regionkey"))
      .groupBy("ps_partkey")
      .agg(min("ps_cost_cents").as("m"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(rows.forall(r => mins(r.getAs[Long]("p_partkey")) == r.getAs[Long]("cost_c")))
    // (s_name, p_partkey) appears at most once → the LIMIT cut is total
    val keys = rows.map(r => (r.getAs[String]("s_name"), r.getAs[Long]("p_partkey")))
    assert(keys.distinct.length == keys.length)
  }

  test("q46: the mean-relative cut keeps exactly the above-K×mean parts") {
    val rows  = CoreQueries.q46ImportantStock(spark, sf001).collect()
    assert(rows.nonEmpty)
    val all = Tables
      .partsupp(spark, sf001)
      .join(
        Tables.supplier(spark, sf001)
          .join(Tables.nation(spark, sf001).where(col("n_name") === "NATION_3"), col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey"),
        col("ps_suppkey") === col("s_suppkey")
      )
      .groupBy("ps_partkey")
      .agg(sum(col("ps_cost_cents") * col("ps_availqty")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val total = all.values.sum
    val kept  = all.filter { case (_, v) => v * all.size > total * CoreQueries.Q46MeanMultiple }
    assert(rows.map(_.getLong(0)).toSet == kept.keySet)
    assert(rows.forall(r => kept(r.getLong(0)) == r.getAs[Long]("stock_value_c")))
  }

  test("q47: the winner's revenue equals the independently recomputed quarter maximum") {
    val rows = CoreQueries.q47TopSupplier(spark, sf001).collect()
    assert(rows.nonEmpty)
    val rev = Tables
      .lineitem(spark, sf001)
      .where(
        col("l_shipdate") >= expr("timestamp_ntz'1998-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp_ntz'1998-04-01 00:00:00'")
      )
      .groupBy("l_suppkey")
      .agg(
        expr("cast(sum(cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(12,2)))) * 10000 as bigint)")
          .as("r")
      )
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val mx = rev.values.max
    assert(rows.forall(_.getAs[Long]("total_revenue_e4") == mx))
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == rev.filter(_._2 == mx).keySet)
  }

  test("q48: grouped profit recounts as separate revenue and cost aggregates (one sampled group)") {
    val rows = CoreQueries.q48ProductProfit(spark, sf001).collect()
    assert(rows.nonEmpty)
    val top = rows.head
    val base = Tables
      .lineitem(spark, sf001)
      .join(Tables.part(spark, sf001).where(col("p_name").like("%red%")).select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .join(Tables.partsupp(spark, sf001), col("l_partkey") === col("ps_partkey") && col("l_suppkey") === col("ps_suppkey"))
      .join(Tables.orders(spark, sf001).select("o_orderkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sf001).select("s_suppkey", "s_nationkey"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf001), col("s_nationkey") === col("n_nationkey"))
      .where(col("n_name") === top.getAs[String]("nation") &&
        year(col("o_orderdate")) === top.getAs[Long]("o_year").toInt)
    val rev = base
      .agg(expr("cast(sum(cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(12,2))) * 10000) as bigint)"))
      .head().getLong(0)
    val cost = base.agg(sum(col("ps_cost_cents") * 100L * col("l_quantity").cast("long"))).head().getLong(0)
    assert(top.getAs[Long]("profit_e4") == rev - cost)
  }

  test("q49: every kept supplier is regional and holds at least one genuinely excess pair") {
    val rows = CoreQueries.q49ExcessAvailability(spark, sf001).collect()
    assert(rows.nonEmpty)
    val regional = Tables
      .supplier(spark, sf001)
      .join(Tables.nation(spark, sf001), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf001).where(col("r_name") === "EUROPE"), col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => regional(r.getAs[Long]("s_suppkey"))))
    // replay the excess rule for one kept supplier
    val sk = rows.head.getAs[Long]("s_suppkey")
    val shipped = Tables
      .lineitem(spark, sf001)
      .where(
        col("l_shipdate") >= expr("timestamp_ntz'1997-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp_ntz'1998-01-01 00:00:00'") && col("l_suppkey") === sk
      )
      .join(Tables.part(spark, sf001).where(col("p_name").like("small%")).select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val avail = Tables
      .partsupp(spark, sf001)
      .where(col("ps_suppkey") === sk)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    assert(shipped.exists { case (pk, qty) => avail.get(pk).exists(_ * 2 > qty) })
  }
}
