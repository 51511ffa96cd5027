package graft

/** Reference-style console runner (mirrors `Program.cs` → `QueryOrchestration
  * .RunAsync`): execute named queries from the registry against a data
  * folder, printing each result and its cold/warm timings — the reference's
  * dual-run methodology (`QueryOrchestration.cs:425-439`) where cold is the
  * first action and warm an immediate repeat.
  *
  * Usage: `runMain graft.Runner <sfDir> [queryName ...]`
  * (no names → run every registered query).
  */
object Runner {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Runner <sfDir> [queryName ...]")
    val sfDir = args.head
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate()

    var unknown = 0
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None =>
          unknown += 1
          System.err.println(s"unknown query: $name (have: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
        case Some(fn) =>
          val df    = fn(spark, sfDir)
          val t0    = System.nanoTime()
          val rows  = df.collect()
          val cold  = (System.nanoTime() - t0) / 1e9
          val t1    = System.nanoTime()
          fn(spark, sfDir).collect()
          val warm = (System.nanoTime() - t1) / 1e9
          println(f"== $name: ${rows.length} rows, cold $cold%.3fs, warm $warm%.3fs")
          rows.take(5).foreach(r => println(s"   $r"))
      }
    }
    spark.stop()
    if (unknown > 0) sys.exit(2)
  }
}
