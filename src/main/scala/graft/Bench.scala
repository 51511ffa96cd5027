package graft

/** Benchmark main — times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`,
  * which it also writes to `SPARK_GRAFT_BENCH_OUT` (default
  * `BENCH_FULL.json`) so the full per-query record survives any stdout
  * truncation.
  *
  * Methodology mirrors the reference's stopwatch instrumentation
  * (`QueryOrchestration.cs:425-439`): one JVM-warmup action first, then an
  * explicit LAYOUT PHASE ([[Layouts.buildAll]]) forcing every ingest-time
  * derived layout — each build separately timed and flagged built-vs-reused
  * in the JSON (`layout_phase_secs` / `layouts` / `late_builds`) — then each
  * query is timed end-to-end (plan + execute + collect) against warm
  * layouts. `collect()` rather than `count()` so column pruning cannot skip
  * the projected work; all query results are small (aggregates / top-k /
  * per-doc stats).
  *
  * A query that throws is NOT silently folded into the total: it reports
  * -1 in the queries map and is listed under "failed" — a broken operator
  * must never read as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()

    // JVM/codegen warmup on a trivial plan plus one 1-row touch of each
    // table family (parquet reader + vectorized decode init) — without the
    // latter, the first query in alphabetical order silently absorbs
    // one-time costs and reads ~3x slower than its steady state.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("events", "documents", "embeddings", "lineitem", "orders").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
      catch { case scala.util.control.NonFatal(_) => () } // fatal JVM errors must abort, not mislead
    }

    // Layout pre-build: force every ingest-time derived layout in an
    // explicit, separately-timed phase (the reference's cold/warm split,
    // QueryOrchestration.cs:425-439, applied at the layout level). Without
    // this, whichever query first touches a cold layout silently absorbs
    // its build — the round-7 149.8s-vs-76.8s discrepancy. The query
    // section below therefore measures warm layouts by construction, and
    // the JSON records what each build cost and whether it ran at all.
    val lt0     = System.nanoTime()
    val layouts = Layouts.buildAll(spark, sfDir)
    val layoutPhaseSecs = (System.nanoTime() - lt0) / 1e9

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).collect(); true }
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $name failed: $e"); false
        }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total  = results.map(_._2).filter(_ >= 0).sum
    // A build event DURING the query section means a layout the pre-build
    // phase missed — report it rather than let it hide in a query's time.
    val lateBuilds = graft.sources.LayoutCache
      .drainBuildLog()
      .map { case (n, s) => "\"" + n + "\":" + f"$s%.3f" }
      .mkString("{", ",", "}")
    val layoutJson = layouts
      .map(r =>
        "\"" + r.name + "\":{\"built\":" + r.built + ",\"secs\":" + f"${r.buildSecs}%.3f" + "}"
      )
      .mkString("{", ",", "}")
    // Explicit cold/warm tag so the headline `value` is never compared
    // across incompatible runs (ADVICE r8): "warm" = zero layout builds,
    // i.e. the query section measured reused layouts only; anything else
    // is "cold" and its total includes no build time either — builds live
    // exclusively in layout_phase_secs — but page/OS cache state differs.
    val mode = if (layouts.exists(_.built)) "cold" else "warm"
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","mode":"$mode","queries":$qs,"failed":${failed
          .mkString("[", ",", "]")},"layout_phase_secs":$layoutPhaseSecs%.3f,"layouts":$layoutJson,"late_builds":$lateBuilds,"sf":"$sfDir"}"""
    println(json)
    // Also WRITE the line: stdout capture has twice truncated the per-query
    // record (BENCH_r05/r06.json were tail fragments) — the round's
    // performance evidence must not depend on a pipe. Overridable so a
    // sweep can keep multiple records side by side.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
