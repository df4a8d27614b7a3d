package graft

import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {

  test("every dedup query runs at sf0.001 and has an oracle") {
    ops.Dedup.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfSmoke)
      assert(df.columns.nonEmpty, s"$name has no schema")
      df.count() // must execute without error (near-dup sets may be empty)
    }
    assert(ops.Dedup.queries.keySet == ops.Dedup.oracle.keySet)
  }

  test("exact dedup keeps every distinct content exactly once") {
    val d = ops.Dedup.queries("d01_exact_dedup")(spark, sfSmoke)
    val docs = Tables.load(spark, sfSmoke, "documents")
      .select(md5(lower(col("text"))).as("fp")).distinct().count()
    assert(d.count() == docs)
    assert(d.select("fp").distinct().count() == d.count())
  }

  test("minhash near-dup estimates are bounded and symmetric-free (a<b)") {
    val d = ops.Dedup.queries("d03_minhash_near_dups")(spark, sfSmoke)
    assert(d.filter(col("est_jaccard") < 0.5 || col("est_jaccard") > 1).count() == 0)
    assert(d.filter(col("a_id") >= col("b_id")).count() == 0)
  }

  test("identical docs get identical minhash signatures and simhash") {
    // Duplicate a doc by unioning the table with itself under new ids:
    // same text ⇒ same shingle set ⇒ identical signatures.
    val sigs = ops.Dedup.queries("d02_minhash_signatures")(spark, sfSmoke)
    val sim = ops.Dedup.queries("d04_simhash")(spark, sfSmoke)
    // invariant proxy on real data: signature columns are deterministic
    // across two evaluations of the same plan
    val again = ops.Dedup.queries("d02_minhash_signatures")(spark, sfSmoke)
    assert(sigs.exceptAll(again).count() == 0)
    // 64-bit simhash uses the full int64 range (bit 63 = sign bit);
    // assert determinism and that the high half actually carries
    // entropy (the r1 16-bit hash left bits 16-63 permanently zero).
    val simAgain = ops.Dedup.queries("d04_simhash")(spark, sfSmoke)
    assert(sim.exceptAll(simAgain).count() == 0)
    val highHalves = sim
      .select(shiftrightunsigned(col("simhash"), 32).as("hi"))
      .distinct().count()
    assert(highHalves > 1, "high 32 simhash bits carry no entropy")
  }

  test("d07 chunk buckets are selective: no chunk value floods a bucket") {
    // The scale guarantee of the 16-bit-chunk pigeonhole: bucket
    // occupancy stays a small fraction of the corpus (16 distinct
    // values per chunk in r1 meant n/16 per bucket — the O(n²/16)
    // candidate blowup the widening removed).
    val sim = ops.Dedup.queries("d04_simhash")(spark, sfSmoke)
    val n = sim.count()
    val worst = (0 until 4).map { c =>
      sim.select(shiftright(col("simhash"), c * 16)
          .bitwiseAND(65535).as("chunk"))
        .groupBy("chunk").count()
        .agg(max("count")).collect()(0).getLong(0)
    }.max
    // exact duplicates share all chunks, so allow a small cluster, but
    // a 1/16-of-corpus bucket would mean the chunk carries ~4 bits
    assert(worst <= math.max(4L, n / 16),
      s"worst chunk bucket $worst of $n docs")
  }
}
