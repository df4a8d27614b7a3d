package graft

import org.apache.spark.sql.functions._

import graft.ops.PrefixScan

/** Property proof of the two-phase prefix-scan helper: for seeded
  * random bucket frames (gaps, negative values, single bucket,
  * adversarial orderings), the exclusive prefix equals the sequential
  * left-fold reference — for both ops and both zero sentinels the
  * board uses. This is the decomposition e41/e42 rest on; proving it
  * here once means each query's spec only has to pin its own
  * semantics.
  */
class PrefixScanSpec extends SparkTestBase {

  private def randomFrames(seed: Long): Seq[List[(Long, Long)]] = {
    val rnd = new scala.util.Random(seed)
    (1 to 25).map { _ =>
      val n = 1 + rnd.nextInt(40)
      val buckets = List.fill(n)(rnd.nextLong() % 50).distinct
      buckets.map(b => b -> (rnd.nextLong() % 1000))
    } :+ List(7L -> -3L) // single-bucket edge
  }

  private def reference(rows: List[(Long, Long)], zero: Long,
      op: (Long, Long) => Long): Map[Long, Long] = {
    val sorted = rows.sortBy(_._1)
    sorted.indices.map { i =>
      sorted(i)._1 -> sorted.take(i).map(_._2).foldLeft(zero)(op)
    }.toMap
  }

  private def run(rows: List[(Long, Long)], op: PrefixScan.Op,
      zero: Long): Map[Long, Long] = {
    import spark.implicits._
    PrefixScan.exclusive(rows.toDF("b", "v"), $"b", $"v", op, zero)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("exclusive prefix MAX equals the sequential fold on seeded " +
      "random bucket frames") {
    randomFrames(41L).foreach { rows =>
      assert(run(rows, PrefixScan.MaxOp, -1L) ==
        reference(rows, -1L, math.max),
        s"MAX diverged on $rows")
    }
  }

  test("exclusive prefix SUM equals the sequential fold on seeded " +
      "random bucket frames (negative deltas included)") {
    randomFrames(42L).foreach { rows =>
      assert(run(rows, PrefixScan.SumOp, 0L) ==
        reference(rows, 0L, (a: Long, b: Long) => a + b),
        s"SUM diverged on $rows")
    }
  }

  test("first bucket's prefix is the zero sentinel; plan has no " +
      "WindowExec") {
    import spark.implicits._
    val df = PrefixScan.exclusive(
      Seq((5L, 10L), (7L, 20L)).toDF("b", "v"), $"b", $"v",
      PrefixScan.MaxOp, zero = -1L)
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(5L) == -1L && rows(7L) == 10L)
    import org.apache.spark.sql.execution.window.WindowExec
    assert(df.queryExecution.executedPlan.collect {
      case w: WindowExec => w
    }.isEmpty, "the helper must stay window-free")
  }

  test("segmented-scan chunk boundaries: every frame width around the " +
      "perfect squares (chunk size transitions, full/partial last " +
      "chunk, width 1) folds identically to the sequential reference") {
    // the r15 segmentation chunks the sorted array into ceil(sqrt(B))
    // slices; widths at n^2-1, n^2, n^2+1 exercise the chunk-size
    // transition, the exactly-full last chunk, and the 1-element
    // residual — the three places an off-by-one in the slice
    // arithmetic would hide
    val rnd = new scala.util.Random(4515L)
    val widths = Seq(1, 2, 3, 4, 5, 8, 9, 10, 15, 16, 17, 24, 25, 26,
      35, 36, 37, 48, 49, 50, 63, 64, 65, 99, 100, 101, 143, 144, 145)
    widths.foreach { n =>
      val rows = (0 until n).toList
        .map(i => i.toLong -> (rnd.nextLong() % 1000))
      assert(run(rows, PrefixScan.SumOp, 0L) ==
        reference(rows, 0L, (a: Long, b: Long) => a + b),
        s"SUM diverged at width $n")
      assert(run(rows, PrefixScan.MaxOp, -1L) ==
        reference(rows, -1L, math.max),
        s"MAX diverged at width $n")
      assert(run(rows, PrefixScan.MinOp, Long.MaxValue) ==
        reference(rows, Long.MaxValue, math.min),
        s"MIN diverged at width $n")
    }
  }

  test("the segmented scan is actually sub-quadratic: a 50k-bucket " +
      "frame (2.0e9 combine steps under the old per-bucket fold) " +
      "completes in seconds") {
    import spark.implicits._
    val wide = spark.range(50000)
      .select(col("id").as("b"), (col("id") % 7 - 3).as("v"))
    val t0 = System.nanoTime()
    val out = PrefixScan.exclusive(wide, $"b", $"v",
      PrefixScan.SumOp, 0L)
    // spot-check the closed form: prefix(i) = sum_{j<i} (j%7 - 3)
    val got = out.filter(col("bucket").isin(0L, 49999L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = (0L until 49999L).map(j => j % 7 - 3).sum
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got == Map(0L -> 0L, 49999L -> full))
    assert(secs < 60.0, s"segmented scan took ${secs}s at 50k buckets " +
      "- the quadratic is back")
  }

  test("exclusive prefix MIN equals the sequential fold on seeded " +
      "random bucket frames") {
    randomFrames(43L).foreach { rows =>
      assert(run(rows, PrefixScan.MinOp, Long.MaxValue) ==
        reference(rows, Long.MaxValue, math.min),
        s"MIN diverged on $rows")
    }
  }

  test("lindleyStats (the linear Lindley terminal fold) equals the " +
      "sequential max(0, b + v) queue recursion, per group") {
    import spark.implicits._
    randomFrames(44L).zipWithIndex.foreach { case (rows, gi) =>
      // two copies under different group keys in ONE frame: the
      // grouped fold must run each group against its own buckets
      val df = rows.flatMap { case (b, v) =>
        Seq(("ga", b, v), ("gb", b, v + 7L))
      }.toDF("g", "b", "v")
      val out = PrefixScan.lindleyStats(df, $"b", $"v", Seq("g"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      Seq("ga" -> 0L, "gb" -> 7L).foreach { case (g, off) =>
        // independent reference: the DIRECT recursion, not the
        // closed prefix form the implementation carries
        var b = 0L; var peak = 0L; var nb = 0L
        rows.sortBy(_._1).foreach { case (_, v) =>
          b = math.max(0L, b + v + off)
          peak = math.max(peak, b); if (b > 0) nb += 1
        }
        assert(out(g) == ((peak, nb, b)),
          s"group $g diverged from the direct recursion (frame $gi)")
      }
    }
  }

  test("the calendar-boundedness contract is ENFORCED: an over-cap " +
      "bucket frame fails loudly instead of folding quadratically") {
    import spark.implicits._
    withConfs("spark.graft.prefixscan.maxBuckets" -> "16") {
      val wide = spark.range(17)
        .select(col("id").as("b"), lit(1L).as("v"))
      val e = intercept[Exception] {
        PrefixScan.exclusive(wide, $"b", $"v",
          PrefixScan.SumOp, 0L).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("calendar-bounded")),
        s"wrong failure: $e")
      // at the cap, the scan still runs
      val ok = spark.range(16).select(col("id").as("b"), lit(1L).as("v"))
      assert(PrefixScan.exclusive(ok, $"b", $"v", PrefixScan.SumOp, 0L)
        .count() == 16L)
    }
  }
}
