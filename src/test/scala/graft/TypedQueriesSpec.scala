package graft

import graft.model._
import graft.operators.Dedup

class TypedQueriesSpec extends SparkSpec {

  test("typed facade returns the same values as the untyped plans") {
    assert(TypedQueries.totalCount(spark, sf0001).head() == CountResult(1000L))
    val mm = TypedQueries.minMax(spark, sf0001).head()
    assert(mm.min_ts == java.time.LocalDateTime.parse("2024-01-01T00:09:58.778549"))
    val byType = TypedQueries.countBy(spark, sf0001).collect()
    assert(byType.toSeq == Seq(
      CountByResult("click", 210L), CountByResult("error", 201L),
      CountByResult("purchase", 202L), CountByResult("signup", 199L),
      CountByResult("view", 188L)
    ))
    assert(TypedQueries.maxBy(spark, sf0001).collect().map(_.event_type).toSeq ==
      Seq("click", "error", "purchase", "signup", "view"))
  }

  test("dropNearDuplicates: lsh and exact rungs agree here; no surviving pair") {
    val exact = Dedup.dropNearDuplicates(spark, sf0001, exact = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lsh = Dedup.dropNearDuplicates(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact == lsh) // at this corpus's similarity gap, LSH is exact
    assert(exact.size < 500)
    val pairs = Dedup.ngramJaccardPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) => assert(!(exact.contains(a) && exact.contains(b))) }
  }
}
