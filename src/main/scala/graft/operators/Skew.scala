package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins — the manual fallback when AQE's runtime
  * skew-split (`spark.sql.adaptive.skewJoin`, on by default in
  * [[graft.GraftSession]]) can't help, e.g. a single hot key larger than any
  * split threshold, or a non-AQE environment.
  *
  * `left ⋈ right on key` becomes
  * `left × salt ⋈ (right + rand-salt) on (key, salt)`: the hot key's rows
  * scatter over `saltFactor` reducers instead of melting one. The replicated
  * side must be the *smaller* input — replication is the price paid for
  * balance.
  */
object Skew {

  /** Salted equi-join: `small` is replicated `saltFactor`×; `big` gets a
    * deterministic per-row salt (hash of all columns mod factor — stable
    * across retries, unlike `rand()`).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltFactor: Int = 8
  ): DataFrame = {
    require(saltFactor > 0)
    val saltedBig = big.withColumn(
      "__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(saltFactor)).cast("int")
    )
    val saltedSmall = small.withColumn(
      "__salt",
      explode(array((0 until saltFactor).map(lit): _*))
    )
    saltedBig
      .join(saltedSmall, saltedBig(bigKey) === saltedSmall(smallKey) && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
