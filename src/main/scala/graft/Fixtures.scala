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
  * `/root/repo/fixtures`, BitextSpec read a cwd-relative path). The old
  * spark-conf knob is deliberately DEAD: `Verify` refuses a session that
  * sets it rather than silently ignoring it.
  *
  * `dir` is a val, resolved ONCE at object init: the oracle strings are
  * object-level vals that capture it at SparkEntry init, so a `def` here
  * would let a post-init sysprop mutation move the engine but not the
  * oracle — freezing both sides keeps them consistent by construction.
  * Override at JVM LAUNCH: `-Dgraft.fixtures.dir=...` or
  * `GRAFT_FIXTURES_DIR=...`; a programmatic `sys.props(...)` write after
  * anything has touched this object is a consistent no-op on both sides.
  *
  * The default is REPO-RELATIVE, not a compiled-in absolute path (ADVICE
  * r19): `<working dir>/fixtures`, absolutized so the interpolated oracle
  * SQL stays valid if the DuckDB process runs with a different cwd. The
  * resolved path is logged once to stderr at init (stderr, never stdout —
  * the bench digest contract requires the digest JSON to be the last
  * stdout line) so a silent-no-op sysprop override is visible in any run
  * log.
  */
object Fixtures {
  val dir: String = {
    val resolved = sys.props
      .get("graft.fixtures.dir")
      .orElse(sys.env.get("GRAFT_FIXTURES_DIR"))
      .getOrElse(
        new java.io.File(sys.props.getOrElse("user.dir", "."), "fixtures").getAbsolutePath
      )
    System.err.println(s"[graft] Fixtures.dir frozen at init: $resolved")
    resolved
  }
}
