package graft

import graft.operators.Prep

/** Data-preparation CLI — the runnable counterpart of the reference's prep
  * phase (`Program.cs:35` → `DataPreparationOrchestration.RunAsync`).
  *
  * Usage:
  *   runMain graft.PrepJob compact <inDir> <outDir> [targetMb]
  *   runMain graft.PrepJob partition-by-day <sfDir> <outDir>
  */
object PrepJob {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    args.toList match {
      case "compact" :: in :: out :: rest =>
        val targetMb = rest.headOption.map(_.toInt).getOrElse(128)
        val s = Prep.compact(spark, in, out, targetMb)
        println(s"compacted ${s.inFiles} files (${s.inBytes} B) -> ${s.outFiles} files @ ~${targetMb}MB")
      case "partition-by-day" :: sfDir :: out :: Nil =>
        Prep.partitionEventsByDay(spark, sfDir, out)
        println(s"events partitioned by day under $out")
      case other =>
        System.err.println(s"unknown args: $other\nusage: compact <in> <out> [mb] | partition-by-day <sfDir> <out>")
        sys.exit(2)
    }
    spark.stop()
  }
}
