package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {

  test("every multimodal query runs non-empty at sf0.001 and has an oracle") {
    Multimodal.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfSmoke).count() > 0, s"$name empty")
    }
    assert(Multimodal.queries.keySet == Multimodal.oracle.keySet)
  }

  test("media table has the full typed schema and covers all docs") {
    val m = Multimodal.mediaTable(spark, sfSmoke)
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "content", "format", "width", "height"))
    assert(m.count() == Tables.load(spark, sfSmoke, "documents").count())
    assert(m.select("format").distinct().count() == 4)
  }

  test("feature extraction is deterministic and bounded [0,1)") {
    val f1 = Multimodal.queries("m02_feature_extract")(spark, sfSmoke)
    val f2 = Multimodal.queries("m02_feature_extract")(spark, sfSmoke)
    assert(f1.exceptAll(f2).count() == 0, "codec must be deterministic")
    (0 until Multimodal.FakeCodec.NFeatures).foreach { j =>
      assert(f1.filter(col(s"f$j") < 0 || col(s"f$j") >= 1).count() == 0)
    }
  }

  test("modality-partitioned storage layout: a format predicate prunes " +
      "partitions at plan time (the 100 TB media-lake read path)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("media-part").toString
    Multimodal.mediaTable(spark, sfSmoke)
      .write.partitionBy("format").mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("format") === "png")
    // the predicate must land in PartitionFilters (directory pruning),
    // not as a per-row data filter
    val scan = back.queryExecution.executedPlan
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no file scan in plan"))
    assert(scan.partitionFilters.nonEmpty,
      "format predicate did not become a partition filter")
    assert(!scan.dataFilters.exists(_.references.exists(_.name == "format")),
      s"format leaked into data filters: ${scan.dataFilters}")
    // and the pruned read is the filtered full read
    val full = Multimodal.mediaTable(spark, sfSmoke)
      .filter(col("format") === "png").count()
    assert(back.count() == full)
  }

  test("frame sampling keeps every 4th 32-byte frame") {
    val frames = Multimodal.queries("m03_frame_sample")(spark, sfSmoke)
    // frame numbers per media are contiguous 0..k
    val bad = frames.groupBy("media_id")
      .agg(max("frame_no").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n") - 1).count()
    assert(bad == 0)
  }

  test("m05 dedup accounting: distinct ≤ total, pHash buckets bounded " +
      "by 2^8 and by media count, occupancy covers the corpus") {
    import spark.implicits._
    val rows = multimodal.Multimodal
      .queries("m05_media_dedup")(spark, sfVerify).collect()
    rows.foreach { r =>
      val (n, d, dups, bk, mx) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(d <= n && dups == n - d, s"${r.getString(0)}: counts")
      assert(bk <= 256 && bk <= n, s"${r.getString(0)}: bucket count")
      // the biggest bucket can't be smaller than the mean occupancy
      assert(mx * bk >= n, s"${r.getString(0)}: occupancy")
    }
    assert(rows.map(_.getLong(1)).sum ==
      Tables.load(spark, sfVerify, "documents").count())
  }
}
