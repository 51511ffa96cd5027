package graft

import org.apache.spark.sql.functions._

/** The SQL façade ([[Sql]]) must be the same engine as the DataFrame
  * registry — mirroring the reference's two query surfaces (direct query vs
  * external-table SQL, `QueryOrchestration.cs:416-439`) answering
  * identically.
  */
class SqlSpec extends SparkSpec {

  test("sql facade ≡ dataframe registry on every ANSI-shared oracle query") {
    // every oracle string that is ANSI enough to parse on BOTH DuckDB and
    // Spark runs through the façade too — a three-way differential (Spark
    // DataFrame ≡ Spark SQL here; Spark ≡ DuckDB at the driver gate).
    // Excluded: DuckDB-dialect functions (string_split/list_*/json_extract_
    // string/regexp_matches/epoch_us/ASOF/quantile_cont), double-quoted
    // aliases (q20), and date_trunc-on-NTZ type drift (w1).
    val ansiShared = Seq(
      "q1_total_count", "q2_time_filter_count", "q3_filter_count", "q4_min_max",
      "q5_max_by", "q6_point_filter", "q7_distinct", "q8_dedup_exact",
      "q9_star_join", "q10_rollup", "q11_pricing_summary", "q12_window_topk",
      "q13_intersect", "q13e_except", "q14_anti_join", "q15_top_orders",
      "q16_outer_join_count", "q18_region_rollup", "q19_cube",
      "q21_part_brand_revenue", "d5_source_stats", "q3p_positional_filter_count",
      "q24_shipping_priority", "q25_local_supplier_volume",
      "q26_monthly_order_trend", "q27_semi_join", "d12_length_deciles",
      "g1_global_ids", "q28_above_nation_avg", "q29_discount_revenue",
      // round-6 adds whose oracle text parses on both engines
      "q30_value_band_join", "w8_event_transitions", "d17_size_histogram",
      "d19_dedup_rate_by_source",
      // the TPC-H canon (q31–q44 + q47): the oracles most likely to be
      // hand-typed by a SQL user — all parse on both engines, so the
      // three-way differential (DataFrame ≡ Spark SQL ≡ DuckDB) covers
      // them end to end. q45/q46/q48/q49 stay out: their partsupp CTE uses
      // DuckDB's UNNEST(range()) generator syntax.
      "q31_customer_order_distribution", "q32_small_qty_revenue", "q33_large_orders",
      "q34_waiting_suppliers", "q35_excess_shipments", "q36_late_shipment_priority",
      "q37_dormant_rich_customers", "q38_priority_late_orders", "q39_market_share",
      "q40_returned_item_revenue", "q41_supplier_diversity", "q42_trade_volume",
      "q43_disjunctive_revenue", "q44_promo_revenue", "q47_top_supplier",
      // round-11 second wave: q50's plain-semi-join oracle and u3's bucket
      // arithmetic both parse on Spark 4 (:: cast is shared syntax since
      // 3.4); u3 stays out only for quantile_cont/list-literal syntax.
      "q50_bloom_prefilter_join"
    )
    for (name <- ansiShared) {
      val viaDf  = SparkEntry.queries(name)(spark, sf0001).collect().map(_.toSeq).toSeq
      val viaSql = Sql.run(spark, sf0001, SparkEntry.oracleSql(name)).collect().map(_.toSeq).toSeq
      assert(viaDf == viaSql, name)
    }
  }

  test("sql facade serves every table and the vector function") {
    Sql.registerViews(spark, sf0001)
    for (t <- Sql.tableNames)
      assert(spark.sql(s"SELECT COUNT(*) AS c FROM $t").head().getLong(0) > 0L, t)
    // events arrives normalized: SQL users see TIMESTAMP_NTZ, not raw nanos
    assert(
      spark.sql("SELECT ts FROM events").schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType
    )
    val selfCos = spark
      .sql("SELECT cosine_sim(embedding, embedding) AS c FROM embeddings WHERE vec_id = 0")
      .head()
      .getDouble(0)
    assert(math.abs(selfCos - 1.0) < 1e-6)
  }

  test("catalog DDL: persistent tables ≡ temp views ≡ DataFrame (QO:413-424 parity)") {
    Sql.createTables(spark, sf0001)
    // temp views would shadow catalog resolution — drop them so unqualified
    // names genuinely hit the catalog tables
    Sql.tableNames.foreach(spark.catalog.dropTempView)
    spark.catalog.setCurrentDatabase("graft")
    try {
      for (name <- Seq("q2_time_filter_count", "q7_distinct", "q9_star_join")) {
        val viaCatalog = spark.sql(SparkEntry.oracleSql(name)).collect().map(_.toSeq).toSeq
        val viaDf      = SparkEntry.queries(name)(spark, sf0001).collect().map(_.toSeq).toSeq
        assert(viaCatalog == viaDf, name)
      }
      // the catalog `events` view serves the same normalized NTZ µs surface
      assert(
        spark.sql("SELECT ts FROM events").schema("ts").dataType ==
          org.apache.spark.sql.types.TimestampNTZType
      )
      // drop-if-exists makes the DDL re-runnable (reference re-creates on
      // every run, QO:413-415)
      Sql.createTables(spark, sf0001)
      assert(spark.sql("SELECT COUNT(*) AS c FROM events").head().getLong(0) > 0L)
    } finally spark.catalog.setCurrentDatabase("default")
  }

  test("sql facade pushes predicates like the dataframe path") {
    Sql.registerViews(spark, sf0001)
    val plan = spark
      .sql("SELECT COUNT(*) AS cnt FROM events WHERE event_type = 'error'")
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("EqualTo(event_type,"), plan)
  }
}
