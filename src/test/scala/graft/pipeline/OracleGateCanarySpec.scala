package graft.pipeline

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** CI assertion for the dev-only oracle gate's own canary
  * (`tools/oracle_check.py --selftest`): a deliberately un-cast `sum()`
  * (DuckDB HUGEINT) must be flagged by the declared-type gate, and the
  * cast BIGINT twin must pass. Guards the check that caught the class of
  * mismatch that shipped red three times (x51, x68, x75) — if a refactor
  * of the gate script ever drops it, this spec goes red.
  *
  * The gate is tooling, not engine code; the spec cancels (does not fail)
  * when python3/duckdb are not on the machine running the tests.
  */
class OracleGateCanarySpec extends AnyFunSuite {

  test("oracle_check --selftest flags an un-cast sum() and passes the cast twin") {
    val script = new java.io.File("tools/oracle_check.py")
    assume(script.isFile, "tools/oracle_check.py not present")
    val probe = try {
      Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ()))
    } catch { case _: java.io.IOException => -1 }
    assume(probe == 0, "python3 + duckdb not available on this machine")
    val outBuf = new StringBuilder
    val rc = Process(Seq("python3", script.getPath, "--selftest"))
      .!(ProcessLogger(l => outBuf.append(l).append('\n')))
    assert(rc == 0, s"selftest failed:\n$outBuf")
    assert(outBuf.toString.contains("selftest ok"))
  }
}
