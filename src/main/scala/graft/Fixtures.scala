package graft

/** Single JVM-level resolution of the committed-fixtures directory (the
  * planted-positive corpora under `fixtures/` — embdup, simdup, annplant,
  * bitextplant).
  *
  * Why JVM-level (sysprop/env) and NOT a SparkSession conf: the DuckDB
  * oracle SQL ([[SparkEntry.oracleSql]]) interpolates fixture paths into
  * static SQL strings with no session in scope, so a session-scoped knob
  * would let the engine read one fixture file while the oracle reads
  * another — the exact silent split ADVICE r18 flagged (engine resolved
  * `graft.fixtures.dir` from the spark conf, the b2p oracle hardcoded
  * `/root/repo/fixtures`, BitextSpec read a cwd-relative path). One
  * resolution consulted by engine, oracle, and specs closes every
  * combination: override with `-Dgraft.fixtures.dir=...` or
  * `GRAFT_FIXTURES_DIR=...` and both sides move together.
  */
object Fixtures {
  def dir: String =
    sys.props
      .get("graft.fixtures.dir")
      .orElse(sys.env.get("GRAFT_FIXTURES_DIR"))
      .getOrElse("/root/repo/fixtures")
}
