package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one lazy SparkSession per suite, engine-standard
  * config (nanosAsLong etc. — without it every events read throws). The
  * derived-layout root is a PER-RUN temp directory deleted on JVM exit, so
  * the suite never leaks `graft_*` layout dirs into the shared temp dir
  * (every planted temp corpus mints a fresh content key; a shared root
  * accretes them forever) and never reuses a layout from a previous run.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession
      .builder(master = "local[4]")
      .config("graft.layout.dir", SparkSpec.layoutRoot)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001  = "/root/testdata/sf0.01"
}

object SparkSpec {
  /** One layout root per forked test JVM, removed on exit. */
  lazy val layoutRoot: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_test_layouts")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles()
        if (cs != null) cs.foreach(rm)
        f.delete(): Unit
      }
      rm(d.toFile)
    }
    d.toString
  }
}
