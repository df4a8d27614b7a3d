package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact channel's invariants, pinned at the CURRENT
  * board (they are board-size-dependent, so every added query
  * re-checks them for free):
  *
  *  - every registered query name maps to a UNIQUE 2-char line key
  *    (a collision silently falls back to 3-char full codes, which
  *    re-risks the driver's 2000-char tail-window overflow that ate
  *    BENCH_r01/r02);
  *  - the line's worst case is survivable: even if EVERY query
  *    printed a 4-char value ("99.9"-class — far beyond any quiet
  *    board), the overflow guard's drop-cheapest loop has room to
  *    operate because the fixed preamble + per-entry overhead stays
  *    well under the tail window for the guard's kept set.
  */
class BenchLineSpec extends AnyFunSuite {

  test("short line keys are collision-free across the whole board") {
    val names = SparkEntry.queries.keySet.toSeq
    val keyed = names.groupBy(Bench.shortKey)
    val collided = keyed.filter(_._2.size > 1)
    assert(collided.isEmpty,
      s"short-key collisions would push the line back to full codes: " +
        s"$collided")
    // non-all-digit codes (e11b) keep their full code by design —
    // unique but uncompressed; keep them rare so they don't erode the
    // tail budget the 2-char scheme exists for
    val long = keyed.keys.filter(_.length > 2)
    assert(long.size <= 2 && long.forall(_.length <= 4),
      s"uncompressed keys must stay rare and short: $long")
  }

  test("the line-exempt set names real queries and leaves the kept " +
      "set inside the tail window at worst-case value widths") {
    val names = SparkEntry.queries.keySet
    val stale = Bench.LineExempt.filterNot(names)
    assert(stale.isEmpty,
      s"LineExempt names queries that no longer exist (a rename would " +
        s"silently re-churn the emitted key set): $stale")
    // sizing: at the typical 3-char value width ("0.5"/"1.2") a kept
    // entry costs 9 chars ("xx":0.5,), so the kept set must leave the
    // line inside the driver's 2000-char tail with preamble — the
    // simulated clean r15 board lands at 1889 chars. A board that
    // grows past this bound needs more exempt designations BEFORE the
    // value-ordered fallback starts churning the key set again.
    // bound against the bench's 1900-char LineBudget, not the raw
    // 2000-char tail window: the value-ordered churn this set exists
    // to prevent comes back as soon as the line exceeds the BUDGET
    val keptN = names.size - Bench.LineExempt.size
    val typical = 120 + keptN * 9
    assert(typical <= 1900,
      s"kept set too large for the line budget at typical value " +
        s"widths: $keptN entries -> ~$typical chars; designate more " +
        "exempt rows")
    // healthy-and-trivial gate: a failed or expensive exempt row must
    // ride the line (regressions are never hidden by the exemption)
    assert(!Bench.lineExemptNow("t01_token_stats", -1.0))
    assert(!Bench.lineExemptNow("t01_token_stats", 1.6))
    assert(Bench.lineExemptNow("t01_token_stats", 0.2))
    assert(!Bench.lineExemptNow("e16_stream_sessions", 0.2))
  }
}
