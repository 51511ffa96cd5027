package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual fallback where AQE's
  * runtime skew-split (`spark.sql.adaptive.skewJoin`, on by default in
  * [[graft.GraftSession]]) cannot reach. The MEASURED rule (SkewSpec pins
  * each branch with reducer-balance evidence):
  *
  *  - skewed JOIN → AQE alone suffices: it splits the hot partition at
  *    runtime and replicates the matching build rows (`skew=true` in the
  *    final plan). The salted rewrite is a portability fallback (non-AQE
  *    engines), not a necessity.
  *  - skewed ALGEBRAIC aggregate (count/sum/min/max/avg) → nothing needed:
  *    partial aggregation emits one row per key per mapper, absorbing any
  *    key skew before the shuffle.
  *  - skewed HOLISTIC aggregate (collect_list-shaped state) → AQE cannot
  *    split it (correctness co-locates the whole key) and partial
  *    aggregation reduces nothing; salting the BUILD stage over
  *    `(key, salt)` is the remaining lever. The final per-key merge still
  *    co-locates — when that merge itself is the bottleneck, the fix is a
  *    flatter state shape, not more salt (the flat-pair-core precedent).
  *

  * `left ⋈ right on key` becomes
  * `left × salt ⋈ (right + rand-salt) on (key, salt)`: the hot key's rows
  * scatter over `saltFactor` reducers instead of melting one. The replicated
  * side must be the *smaller* input — replication is the price paid for
  * balance.
  */
object Skew {

  /** Salted equi-join: `small` is replicated `saltFactor`×; `big` gets a
    * deterministic per-row salt (hash of `saltCols` mod factor — stable
    * across retries, unlike `rand()`). `saltCols` defaults to ALL columns,
    * but hashing every column forces the scan to READ every column even
    * when the query uses two of them (the hash defeats column pruning —
    * guide §2.3); callers that know a narrow column set with per-row
    * entropy within a key (a line number, an event id) should pass it.
    * Salt VALUES never affect the join result — the replicated side
    * carries every salt — only how a hot key's rows spread over reducers.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltFactor: Int = 8,
      saltCols: Seq[String] = Nil
  ): DataFrame = {
    require(saltFactor > 0)
    val hashCols = if (saltCols.nonEmpty) saltCols else big.columns.toSeq
    val saltedBig = big.withColumn(
      "__salt",
      pmod(xxhash64(hashCols.map(col): _*), lit(saltFactor)).cast("int")
    )
    val saltedSmall = small.withColumn(
      "__salt",
      explode(array((0 until saltFactor).map(lit): _*))
    )
    // Pin a SHUFFLE hash join (r22): the planner otherwise broadcasts the
    // replicated side — a saltFactor-times-inflated driver-side hash build
    // (measured ~0.8 s of q22's wall at sf0.1), and a contradiction of the
    // technique: salting exists precisely for the scale where the small
    // side can NOT be broadcast (if it fits in a broadcast, you broadcast
    // and never salt). The hint keeps the demo a real shuffle join at any
    // scale; join output is unchanged (inner equi-join).
    saltedBig
      .join(
        saltedSmall.hint("shuffle_hash"),
        saltedBig(bigKey) === saltedSmall(smallKey) && saltedBig("__salt") === saltedSmall("__salt")
      )
      .drop("__salt")
  }
}
