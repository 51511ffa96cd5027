package graft

import graft.operators.{Dedup, Similarity}

/** The session tuning knobs must actually steer the physical plans — a
  * conf key that parses but changes nothing is worse than no knob.
  */
class GraftConfSpec extends SparkSpec {

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("graft.ann.nprobe widens the s6 partition pruning from 4 to 8 probed dirs") {
    def probedClusters(plan: String): Int = {
      // the probe restriction is directory-level: PartitionFilters [cl IN (…)]
      val in = "cl#\\d+ IN \\(([^)]*)\\)".r.findFirstMatchIn(plan)
        .orElse("cl IN \\(([^)]*)\\)".r.findFirstMatchIn(plan))
      assert(in.isDefined, s"no cl IN (...) partition filter in:\n$plan")
      in.get.group(1).split(",").length
    }
    val default = Similarity.annIvfPartitioned(spark, sf0001)
    assert(probedClusters(default.queryExecution.executedPlan.toString) == 4)
    withConf("graft.ann.nprobe" -> "8") {
      val widened = Similarity.annIvfPartitioned(spark, sf0001)
      assert(probedClusters(widened.queryExecution.executedPlan.toString) == 8)
      // wider probe = same-or-better recall; the top-k contract holds
      assert(widened.count() == 10L)
    }
  }

  test("probing more clusters than exist is a config error, not a silent full scan") {
    withConf("graft.ann.nprobe" -> "32") {
      intercept[IllegalArgumentException] {
        Similarity.annIvfPartitioned(spark, sf0001)
      }
    }
    withConf("graft.minhash.bands" -> "7") { // 64 hashes don't split into 7 bands
      intercept[IllegalArgumentException] {
        Dedup.minhashLshPairs(spark, sf0001)
      }
    }
  }

  test("graft.shingle.n reshapes the shingle stream (and the minhash layout key with it)") {
    import spark.implicits._
    val docs = Seq((0L, "a b c d")).toDF("doc_id", "text")
    // default 3-grams: "a b c", "b c d"
    assert(Dedup.shingles(docs).collect().map(_.getString(1)).sorted.toSeq == Seq("a b c", "b c d"))
    withConf("graft.shingle.n" -> "2") {
      assert(
        Dedup.shingles(docs).collect().map(_.getString(1)).sorted.toSeq ==
          Seq("a b", "b c", "c d")
      )
    }
    // an explicit argument beats the knob: the conf is deployment, not API
    withConf("graft.shingle.n" -> "2") {
      assert(Dedup.shingles(docs, n = 4).collect().map(_.getString(1)).toSeq == Seq("a b c d"))
    }
  }

  test("graft.span.tokens retunes n7 shared-span width") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_knob_span").toString
    // two docs sharing a 4-token run — invisible at the default width 8
    Seq((0L, "p q r s x1 y1"), (1L, "p q r s x2 y2"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(Dedup.sharedSpans(spark, dir).count() == 0L)
    withConf("graft.span.tokens" -> "4") {
      val got = Dedup.sharedSpans(spark, dir).count()
      assert(got == 1L, s"expected the planted 4-token run, got $got spans")
    }
  }

  test("invalid knob values fail loudly, naming the knob") {
    import spark.implicits._
    val docs = Seq((0L, "a b c d")).toDF("doc_id", "text")
    withConf("graft.shingle.n" -> "0") {
      val e = intercept[IllegalArgumentException] { Dedup.shingles(docs).collect() }
      assert(e.getMessage.contains("graft.shingle.n"))
    }
    withConf("graft.span.tokens" -> "0") {
      val e = intercept[IllegalArgumentException] { Dedup.sharedSpans(spark, sf0001).collect() }
      assert(e.getMessage.contains("graft.span.tokens"))
    }
    // a malformed value names the key and the raw text, not a bare NumberFormatException
    withConf("graft.ann.nprobe" -> "four") {
      val e = intercept[IllegalArgumentException] { GraftConf.int(spark, "ann.nprobe", 4) }
      assert(e.getMessage.contains("graft.ann.nprobe") && e.getMessage.contains("four"))
    }
    // the k-means trainer knobs carry the same discipline
    import org.apache.spark.sql.functions.col
    val vecs = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    withConf("graft.ann.kmeans.maxiters" -> "0") {
      val e = intercept[IllegalArgumentException] {
        graft.operators.Similarity.refinedCentroids(vecs, 2)
      }
      assert(e.getMessage.contains("graft.ann.kmeans.maxiters"))
    }
    withConf("graft.ann.kmeans.rounds" -> "0") {
      val e = intercept[IllegalArgumentException] {
        graft.operators.Similarity.kmeansParSeeds(vecs.select(col("vec_id"), col("embedding")), 2)
      }
      assert(e.getMessage.contains("graft.ann.kmeans.rounds"))
    }
  }

  test("Runner config files pass conf.* keys through to the session") {
    val f = java.nio.file.Files.createTempFile("graft_conf", ".properties")
    java.nio.file.Files.writeString(
      f,
      "data.dir = /tmp\nconf.graft.ann.nprobe = 8\nconf.graft.shingle.n = 2\n"
    )
    val cfg = Runner.loadConfig(f.toString)
    assert(cfg.conf == Map("graft.ann.nprobe" -> "8", "graft.shingle.n" -> "2"))
    // typo'd top-level keys still fail loudly
    val bad = java.nio.file.Files.createTempFile("graft_conf_bad", ".properties")
    java.nio.file.Files.writeString(bad, "data.dir = /tmp\nquries = q1\n")
    intercept[IllegalArgumentException] { Runner.loadConfig(bad.toString) }
  }
}
