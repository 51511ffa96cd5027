package graft

import graft.operators.{Dedup, Multimodal}

/** Pins the persisted band-occupancy stat (r15 review item): each
  * perceptual hash-ledger layout stores its level-0 max band occupancy at
  * build time, and the dhash rungs read THAT instead of running a
  * per-query occupancy-probe job.
  *   - the stored value must equal what the live probe would compute
  *     (same banding, same distinct-hash set);
  *   - constructing any dhash rung's DataFrame on a warm ledger must run
  *     ZERO Spark jobs (the probe used to be ~0.2 s × every rung × every
  *     call — at 100 TB that is a full ledger shuffle per query, for a
  *     number that is a property of the immutable layout).
  */
class BandStatSpec extends SparkSpec {

  test("persisted band bound equals the live level-0 occupancy probe, per modality") {
    val cases = Seq(
      ("image", Multimodal.imageDhashLedger(spark, sf0001), Multimodal.imageDhashBandBound(spark, sf0001)),
      ("audio", Multimodal.audioHashLedger(spark, sf0001), Multimodal.audioHashBandBound(spark, sf0001)),
      ("video", Multimodal.videoHashLedger(spark, sf0001), Multimodal.videoHashBandBound(spark, sf0001))
    )
    for ((name, ledger, stored) <- cases) {
      val live = Dedup.dhashLevel0MaxOccupancy(ledger)
      assert(stored == live, s"$name: stored=$stored live=$live")
      assert(stored > 0L, s"$name ledger is empty")
    }
  }

  test("dhash rung construction runs zero jobs on warm ledgers") {
    // warm every layout + the per-JVM bound cache (this pass may build)
    Dedup.imageDhashPairs(spark, sf0001)
    Dedup.imageDhashPairsCapped(spark, sf0001)
    Dedup.audioHashPairs(spark, sf0001)
    Dedup.audioHashPairsCapped(spark, sf0001)
    Dedup.videoHashPairs(spark, sf0001)
    Dedup.videoHashPairsCapped(spark, sf0001)
    Dedup.imageDhashPairsTombstoned(spark, sf0001)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      Dedup.imageDhashPairs(spark, sf0001)
      Dedup.imageDhashPairsCapped(spark, sf0001)
      Dedup.audioHashPairs(spark, sf0001)
      Dedup.audioHashPairsCapped(spark, sf0001)
      Dedup.videoHashPairs(spark, sf0001)
      Dedup.videoHashPairsCapped(spark, sf0001)
      Dedup.imageDhashPairsTombstoned(spark, sf0001)
      // marker job: listener delivery is ordered, so once the marker has
      // been counted every construction-time job would have been too.
      // RDD count = exactly ONE job (no AQE sub-jobs, unlike a SQL count)
      spark.sparkContext.parallelize(Seq(1)).count()
      val deadline = System.currentTimeMillis() + 15000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(jobs.get() == 1, s"expected only the marker job during construction, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("bound-fed fast path produces the same pairs as the live-probe path") {
    val ledger = Multimodal.imageDhashLedger(spark, sf0001)
    val bound  = Multimodal.imageDhashBandBound(spark, sf0001)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val withBound = Dedup.dhashPairsFromHashes(ledger, Some(bound)).collect().map(key).toSet
    val live      = Dedup.dhashPairsFromHashes(ledger).collect().map(key).toSet
    assert(withBound == live)
    assert(withBound.nonEmpty)
  }
}
