package graft

import org.apache.spark.sql.functions._

/** The composed curation pipeline (quality → normalize → dedup →
  * report): gate parity is the driver's job; these are the structural
  * invariants a pipeline must keep regardless of fixture content.
  */
class PipelineSpec extends SparkTestBase {

  test("every pipeline query runs non-empty at sf0.001 and has an oracle") {
    ops.Pipeline.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfSmoke).count() > 0, s"$name empty")
    }
    assert(ops.Pipeline.queries.keySet == ops.Pipeline.oracle.keySet)
  }

  test("p01 accounting closes: kept + removed = passed, per source and " +
      "in total against the corpus") {
    val rows = ops.Pipeline.queries("p01_curation_pipeline")(spark, sfVerify)
      .collect()
    rows.foreach { r =>
      val (pass, kept, removed) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept + removed == pass && kept >= 0 && removed >= 0,
        s"${r.getString(0)}: $kept + $removed != $pass")
    }
    val totalPass = rows.map(_.getLong(1)).sum
    val corpus = Tables.load(spark, sfVerify, "documents").count()
    assert(totalPass <= corpus, "quality gate cannot pass more than exists")
  }

  test("p01 normalization dedups case/punctuation variants that the raw " +
      "fingerprint (d01) keeps apart") {
    // The fixture has no planted case-variants at sf0.001, so probe the
    // operator's normalization contract directly through its SQL parts:
    // two texts differing only in case + punctuation must collapse.
    val df = spark.createDataFrame(Seq(
      (1L, "Hello, World!  This is FINE."),
      (2L, "hello world this is fine"),
      (3L, "a genuinely different document"))).toDF("doc_id", "text")
    val fp = md5(trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
    val n = df.select(fp.as("fp")).distinct().count()
    assert(n == 2, s"normalization should collapse 1 and 2, got $n groups")
  }

  test("p02 funnel closes per source: kept + len_fail + rep_fail = docs, " +
      "and the gate actually splits the corpus") {
    val rows = ops.Pipeline.queries("p02_quality_filter")(spark, sfVerify)
      .collect()
    rows.foreach { r =>
      val (docs, kept, lenF, repF) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(kept + lenF + repF == docs,
        s"${r.getString(0)}: $kept + $lenF + $repF != $docs")
    }
    val corpus = Tables.load(spark, sfVerify, "documents").count()
    assert(rows.map(_.getLong(1)).sum == corpus,
      "every doc must be accounted for in exactly one source row")
    // a gate that keeps everything (or nothing) tests nothing
    val kept = rows.map(_.getLong(2)).sum
    assert(kept > 0 && kept < corpus,
      s"thresholds must split the fixture non-trivially (kept=$kept)")
  }

  test("curationWithAudit: observe() metrics match the gated result " +
      "with no extra job, and the result itself is unchanged") {
    val gate = org.apache.spark.sql.Observation("gate")
    val report = org.apache.spark.sql.Observation("report")
    val audited = ops.Pipeline
      .curationWithAudit(spark, sfVerify, gate, report).collect()
    val plain = ops.Pipeline.queries("p01_curation_pipeline")(spark, sfVerify)
      .collect()
    assert(audited.toSeq == plain.toSeq,
      "audit instrumentation must not change the result")
    // the audit numbers are computed on the SAME pass: they must equal
    // the result's own totals exactly
    val g = gate.get
    val r = report.get
    assert(g("n_pass_total") == plain.map(_.getLong(1)).sum)
    assert(r("n_sources") == plain.length.toLong)
    assert(r("n_kept_total") == plain.map(_.getLong(2)).sum)
    assert(g("tokens_pass_total").asInstanceOf[Long] >=
      plain.map(_.getLong(4)).sum,
      "tokens past the gate can only shrink at dedup")
  }
}
