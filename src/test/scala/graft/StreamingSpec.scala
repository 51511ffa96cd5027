package graft

import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streaming windowed counts == batch windowed counts") {
    // file stream sources watch a directory: stage the single-file table
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet")
    )
    val q = EventStream.windowedCountsStream(spark, dir.toString, "stream_w1")
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark
      .table("stream_w1")
      .orderBy("ws", "event_type")
      .collect()
      .map(_.toSeq)
      .toSeq
    val batch = EventStream
      .windowedCountsBatch(spark, sf0001)
      .collect()
      .map(_.toSeq)
      .toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
