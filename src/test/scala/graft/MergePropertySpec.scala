package graft

import org.scalacheck.Gen

/** Property tests for the partial/final merge invariants the reference
  * hand-implements client-side (SURVEY §2.2): whatever the file split, the
  * merged result equals the single-pass result. Spark guarantees these via
  * Partial/Final aggregation; the properties pin the *semantics* our queries
  * rely on. (Plain ScalaCheck generators sampled in-loop — the
  * scalatest/scalacheck bridge artifact is not available offline.)
  */
class MergePropertySpec extends SparkSpec {

  private val rowGen = for {
    level <- Gen.oneOf("Info", "Warning", "Error")
    ts    <- Gen.chooseNum(0L, 1000000L)
  } yield (level, ts)

  private val splitGen = for {
    rows <- Gen.listOfN(200, rowGen)
    k    <- Gen.chooseNum(1, 8)
  } yield (rows, k)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  private def splitInto[A](rows: List[A], k: Int): Seq[List[A]] =
    rows.zipWithIndex.groupBy(_._2 % k).values.map(_.map(_._1)).toSeq

  test("grouped-max merge (QO:258-265): max of per-file maxes == global max") {
    for ((rows, k) <- samples(splitGen, 50)) {
      val global = rows.groupBy(_._1).map { case (l, rs) => l -> rs.map(_._2).max }
      val perFile = splitInto(rows, k)
        .flatMap(f => f.groupBy(_._1).map { case (l, rs) => l -> rs.map(_._2).max })
      val merged = perFile.groupBy(_._1).map { case (l, ms) => l -> ms.map(_._2).max }
      assert(merged == global)
    }
  }

  test("count merge (QO:318/341/364): sum of per-file counts == global count") {
    for ((rows, k) <- samples(splitGen, 50)) {
      val filtered = (r: (String, Long)) => r._1 == "Warning"
      val global   = rows.count(filtered)
      val merged   = splitInto(rows, k).map(_.count(filtered)).sum
      assert(merged == global)
    }
  }

  test("distinct-of-distincts (QO:205-208): union of per-file distincts == global distinct") {
    for ((rows, k) <- samples(splitGen, 50)) {
      val global = rows.map(_._1).toSet
      val merged = splitInto(rows, k).flatMap(_.map(_._1).distinct).toSet
      assert(merged == global)
    }
  }

  test("spark reproduces the grouped-max merge on an actual multi-file table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (rows <- samples(Gen.listOfN(60, rowGen), 5) if rows.nonEmpty) {
      val df = rows.toDF("level", "ts").repartition(5) // 5 "files"
      val got = df.groupBy("level").agg(max("ts")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = rows.groupBy(_._1).map { case (l, rs) => l -> rs.map(_._2).max }
      assert(got == expect)
    }
  }
}
