package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join returns exactly the plain join's result on skewed keys") {
    import spark.implicits._
    // 90% of the big side hits one hot key — the pathological shape
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i.toLong)).toDF("k", "payload")
    val small = (0L to 99L).map(k => (k, s"dim_$k")).toDF("k2", "name")
    val plain  = big.join(small, col("k") === col("k2")).select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, "k", "k2").select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0L)
    assert(plain.exceptAll(salted).count() == 0L)
  }

  test("salt spreads the hot key over the full factor") {
    import spark.implicits._
    val big = (1 to 5000).map(i => (7L, i.toLong)).toDF("k", "payload")
    val salts = big
      .withColumn("__salt", pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts == 8L, s"hot key only spread over $salts salts")
  }
}
