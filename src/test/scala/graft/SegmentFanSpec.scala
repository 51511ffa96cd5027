package graft

import graft.streaming.SegmentFan
import org.apache.spark.sql.functions._

/** Direct pins for the shared generation-fold machinery's CRASH WINDOWS —
  * the family specs (StreamingSpec's dedup/trigram/tokenizer boundary
  * tests) drive the happy path end-to-end; these drive the states a crash
  * can leave behind, each of which must be invisible to readers and
  * reclaimed by the next compact call.
  */
class SegmentFanSpec extends SparkSpec {

  private def mkFan(root: String, table: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.foreach { i =>
      Seq((i * 10, s"v$i")).toDF("k", "v")
        .write.mode("overwrite").parquet(s"$root/$table/batch_id=$i")
    }
  }

  private def rows(root: String, table: String, tables: Seq[String] = Nil): Set[(Long, String, Long)] =
    SegmentFan.tableRead(spark, root, if (tables.isEmpty) Seq(table) else tables, table)
      .select(col("k").cast("long"), col("v"), col("batch_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("fold moves rows exactly; newest segment stays live; GC bounds the fan") {
    val root = java.nio.file.Files.createTempDirectory("graft_sfan").toString
    mkFan(root, "tbl", Seq(0L, 1L, 2L))
    val before = rows(root, "tbl")
    assert(SegmentFan.compact(spark, root, Seq("tbl")) == 2L)
    assert(rows(root, "tbl") == before, "fold must be a pure row move")
    val fan = new java.io.File(s"$root/tbl").listFiles.map(_.getName).filter(_.startsWith("batch_id=")).toSeq
    assert(fan == Seq("batch_id=2"), s"fan not bounded: $fan")
    assert(new java.io.File(s"$root/gen=2/tbl.parquet/_SUCCESS").exists())
    // no-op below two live segments
    assert(SegmentFan.compact(spark, root, Seq("tbl")) == 0L)
  }

  test("a half-written generation (missing _SUCCESS on ANY table) is invisible to readers and latestGen") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sfan2").toString
    mkFan(root, "a", Seq(0L, 1L)); mkFan(root, "b", Seq(0L, 1L))
    val ts     = Seq("a", "b")
    val before = (rows(root, "a", ts), rows(root, "b", ts))
    // simulate a crash mid-fold: gen=1 written for table a only (Spark's
    // own write stamps a.parquet/_SUCCESS — the commit bar is ALL tables)
    Seq((99L, "x", 0L)).toDF("k", "v", "batch_id")
      .write.mode("overwrite").parquet(s"$root/gen=1/a.parquet")
    assert(SegmentFan.latestGen(spark, root, ts).isEmpty,
      "a generation without every table's _SUCCESS must not be committed")
    assert((rows(root, "a", ts), rows(root, "b", ts)) == before,
      "reads must come from the fan alone while the generation is torn")
    // the retried compaction overwrites the torn dir and commits both
    assert(SegmentFan.compact(spark, root, ts) == 1L)
    assert(rows(root, "a", ts) == before._1 && rows(root, "b", ts) == before._2)
  }

  test("crash between generation commit and fan GC: duplicate bytes, never duplicate rows; next call reclaims on the no-op path") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sfan3").toString
    mkFan(root, "tbl", Seq(0L, 1L, 2L))
    val before = rows(root, "tbl")
    assert(SegmentFan.compact(spark, root, Seq("tbl")) == 2L)
    // resurrect a folded fan segment and a superseded generation — the
    // exact on-disk state a crash after the gen commit leaves behind
    Seq((0L, "v0")).toDF("k", "v").write.mode("overwrite").parquet(s"$root/tbl/batch_id=0")
    Seq((0L, "v0", 0L)).toDF("k", "v", "batch_id")
      .write.mode("overwrite").parquet(s"$root/gen=1/tbl.parquet")
    assert(rows(root, "tbl") == before,
      "stale fan dirs below the cutoff must be excluded by filter, not by deletion")
    // only ONE live segment (batch 2) → the fold itself no-ops, but GC runs
    assert(SegmentFan.compact(spark, root, Seq("tbl")) == 0L)
    assert(!new java.io.File(s"$root/tbl/batch_id=0").exists(), "leftover fan dir not reclaimed")
    assert(!new java.io.File(s"$root/gen=1").exists(), "superseded generation not reclaimed")
    assert(rows(root, "tbl") == before)
  }

  test("cutoff spans EVERY table: a torn newest batch in a NON-head table is never folded, whatever the write order") {
    import spark.implicits._
    // crash mid-batch 2 in a family that writes table b BEFORE table a:
    // b carries the replay-target segment (batch_id=2), a does not
    val root = java.nio.file.Files.createTempDirectory("graft_sfan5").toString
    val ts   = Seq("a", "b")
    mkFan(root, "a", Seq(0L, 1L)); mkFan(root, "b", Seq(0L, 1L, 2L))
    // cutoff must be the GLOBAL newest (2), not head table a's newest (1)
    assert(SegmentFan.compact(spark, root, ts) == 2L)
    // b's torn segment stays live for the checkpoint replay to rewrite
    assert(new java.io.File(s"$root/b/batch_id=2").exists(), "replay-target segment was folded")
    val expectedB = rows(root, "b", ts)
    // the replay: batch 2 rewrites b's segment (overwrite, same rows) and
    // lands a's missing one — no doubles anywhere
    Seq((20L, "v2")).toDF("k", "v").write.mode("overwrite").parquet(s"$root/b/batch_id=2")
    Seq((20L, "v2")).toDF("k", "v").write.mode("overwrite").parquet(s"$root/a/batch_id=2")
    assert(rows(root, "b", ts) == expectedB, "replayed segment doubled rows")
    assert(rows(root, "a", ts) == Set((0L, "v0", 0L), (10L, "v1", 1L), (20L, "v2", 2L)))
  }

  test("tokenizer legacy count layout folds into the fan; replay-identical collisions resolve, divergent ones throw, strays stay put") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sfan6").toString
    // a pre-upgrade deployment: two legacy segments at root level, plus an
    // unparseable stray that every fan reader ignores — it must NOT move
    Seq(("alpha beta", 2L)).toDF("word", "freq")
      .write.mode("overwrite").parquet(s"$root/batch_id=0")
    Seq(("alpha beta", 3L)).toDF("word", "freq")
      .write.mode("overwrite").parquet(s"$root/batch_id=1")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/batch_id=copy"))
    assert(graft.streaming.TokenizerStream.foldLegacyCountSegments(spark, root) == 2)
    assert(!new java.io.File(s"$root/batch_id=0").exists())
    assert(new java.io.File(s"$root/counts/batch_id=0").exists())
    assert(new java.io.File(s"$root/counts/batch_id=1").exists())
    assert(new java.io.File(s"$root/batch_id=copy").exists(), "unparseable stray must not migrate")
    assert(!new java.io.File(s"$root/counts/batch_id=copy").exists())
    // idempotent once migrated
    assert(graft.streaming.TokenizerStream.foldLegacyCountSegments(spark, root) == 0)
    // the NORMAL collision — a post-upgrade checkpoint replay rewrote the
    // crashed batch into the fan, so both copies are row-identical — must
    // resolve silently (legacy copy deleted), never brick the read path
    Seq(("alpha beta", 3L)).toDF("word", "freq")
      .write.mode("overwrite").parquet(s"$root/batch_id=1")
    assert(graft.streaming.TokenizerStream.foldLegacyCountSegments(spark, root) == 1)
    assert(!new java.io.File(s"$root/batch_id=1").exists(), "replay-identical legacy copy not reclaimed")
    // a DIVERGENT collision is genuinely ambiguous and must throw
    Seq(("alpha beta", 9L)).toDF("word", "freq")
      .write.mode("overwrite").parquet(s"$root/batch_id=1")
    val e = intercept[IllegalStateException] {
      graft.streaming.TokenizerStream.foldLegacyCountSegments(spark, root)
    }
    assert(e.getMessage.contains("DIFFERENT ROWS"))
  }

  test("unparseable dir names (non-digits, >18-digit overflow) are skipped everywhere, never thrown on") {
    val root = java.nio.file.Files.createTempDirectory("graft_sfan4").toString
    mkFan(root, "tbl", Seq(0L, 1L))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/tbl/batch_id=copy"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/tbl/batch_id=20260816123456789012345"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/gen=stale_backup"))
    val before = rows(root, "tbl") // must not throw on the strays
    assert(SegmentFan.compact(spark, root, Seq("tbl")) == 1L)
    assert(rows(root, "tbl") == before)
    // strays are never deleted — retention only reasons about ids it can order
    assert(new java.io.File(s"$root/tbl/batch_id=copy").exists())
    assert(new java.io.File(s"$root/gen=stale_backup").exists())
  }
}
