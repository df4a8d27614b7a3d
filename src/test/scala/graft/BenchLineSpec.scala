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
}
