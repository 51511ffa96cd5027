package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class SetFunctionsSpec extends SparkSpec {

  test("intersection_size == size(array_intersect) on random distinct string arrays") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    def randomSet(): Seq[String] =
      rnd.shuffle((0 until 60).map(i => s"tok$i")).take(rnd.nextInt(40) + 1).distinct
    val rows = Seq.fill(500)((randomSet(), randomSet())) :+
      ((Seq.empty[String], Seq("a"))) :+ ((Seq("a"), Seq.empty[String]))
    val df = rows
      .toDF("a", "b")
      .withColumn("fast", expr("intersection_size(a, b)"))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.where(col("fast") =!= col("ref")).count() == 0L)
    assert(df.where(col("fast") > 0).count() > 0L) // fixture isn't degenerate
  }

  test("intersection_size: null input gives null, asymmetric sizes probe correctly") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(
      (Seq("a", "b", "c", "d", "e"), Seq("c")),
      (Seq("x"), Seq("a", "b", "x", "y", "z"))
    ).toDF("a", "b").withColumn("n", expr("intersection_size(a, b)"))
    assert(df.collect().map(_.getLong(2)).toSeq == Seq(1L, 1L))
    val withNull = Seq((null.asInstanceOf[Seq[String]], Seq("a")))
      .toDF("a", "b")
      .withColumn("n", expr("intersection_size(a, b)"))
      .collect()
    assert(withNull(0).isNullAt(2))
  }

  test("intersection_size stays inside whole-stage codegen") {
    VectorFunctions.register(spark)
    // non-literal, non-higher-order input: literals constant-fold away and
    // `transform` lambdas are CodegenFallback — either would drag the
    // projection out of whole-stage codegen regardless of this expression.
    // A parquet scan + split keeps the whole pipeline codegen-eligible.
    val df = graft.sources.Tables
      .documents(spark, sf0001)
      .selectExpr("split(text, ' ') AS a", "split(text, ' ') AS b")
      .selectExpr("intersection_size(a, b) AS n")
    assert(df.collect().forall(_.getLong(0) > 0L)) // A ∩ A = distinct(A), non-empty
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project.*intersection_size.*"), plan)
  }

  test("intersection_size == size(array_intersect) on random distinct long arrays") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    // Includes 0 in the value domain: 0 is the open-address empty sentinel,
    // so its handling is a dedicated code path worth hitting.
    def randomSet(): Seq[Long] =
      rnd.shuffle((0L until 60L).toVector).take(rnd.nextInt(40) + 1).distinct
    val rows = Seq.fill(500)((randomSet(), randomSet())) :+
      ((Seq.empty[Long], Seq(0L))) :+ ((Seq(0L), Seq(0L, 7L))) :+
      ((Seq(1L), Seq.empty[Long]))
    val df = rows
      .toDF("a", "b")
      .withColumn("fast", expr("intersection_size(a, b)"))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.where(col("fast") =!= col("ref")).count() == 0L)
    assert(df.where(col("fast") > 0).count() > 0L)
  }

  test("intersection_size on dup-bearing inputs counts probe-side hits (documented divergence)") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // array_intersect dedups first (|{a}| = 1); the hash-probe counts every
    // probe-side hit (3). Dedup callers always pass collect_set outputs, so
    // the divergence is unreachable there — this pins the documented
    // contract for anyone reaching for the function on raw arrays.
    val df = Seq((Seq("a", "a", "b"), Seq("a", "a", "a"))).toDF("a", "b")
      .withColumn("fast", expr("intersection_size(a, b)"))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
      .head()
    assert(df.getLong(2) == 3L && df.getLong(3) == 1L)
  }

  test("intersection_size rejects mixed string/long inputs at analysis") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq((Seq("a"), Seq(1L))).toDF("a", "b")
    val e  = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("intersection_size(a, b)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("intersection_size"), e.getMessage)
  }
}
