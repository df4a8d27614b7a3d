package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ANN index LIFECYCLE the board queries deliberately compress into
  * one plan (SURVEY.md §2.4; SCALE.md round 9): at 100 TB the
  * train/assign/encode half runs ONCE and its artifacts are WRITTEN
  * tables; the recurring search job reads the artifacts, never the
  * vector corpus. This module is that split, made real and spec-proven
  * (AnnIndexSpec): [[build]] writes the four artifacts of the composed
  * raw-code IVF-PQ index (s19's model — Similarity's kmTrain/pqTrain,
  * so the index is bit-identical to the one the gated queries search),
  * and [[search]] reproduces s19's exact ranking from the artifacts
  * alone — its plan contains ZERO corpus scans.
  *
  * Artifact layout (all parquet under `indexDir`):
  *
  *  - `centroids/`  (cell, cv)            — KmK rows; broadcast at read.
  *  - `codebooks/`  (sub, code, cv)       — PqM×PqK rows; broadcast.
  *  - `invlists/`   cell=<c>/ (vec_id)    — the inverted lists,
  *    DIRECTORY-PARTITIONED by cell so a probe's `cell IN (...)` filter
  *    prunes to the probed cells' directories: the search reads
  *    |probed|/KmK of the list bytes, the on-disk form of IVF's whole
  *    point. (Hive-style partitioning, not file-level range metadata —
  *    pruning happens at listing time, before any footer is opened.)
  *  - `codes/`      (vec_id, sub, code)   — sorted by vec_id within
  *    shards so the per-candidate code lookup joins against
  *    min/max-tight row groups.
  *
  * Scale shape of [[search]]: centroid + codebook + the per-query
  * distance table stay broadcasts; candidates come from the pruned
  * inverted-list scan joined to the broadcast probe set; the ADC sum
  * partial-aggregates in task; the bounded-heap TopKPerKey cuts to K
  * before any sort — the same pinned shapes as s19, minus the build.
  */
object AnnIndex {

  /** Train on the corpus at `dir` and write the index artifacts.
    * Deterministic end-to-end (the s14/s16 rounding discipline), so
    * re-building overwrites byte-identical content — resumable like
    * the pack write.
    */
  def build(s: SparkSession, dir: String, indexDir: String): Unit = {
    import s.implicits._
    val e = Similarity.emb(s, dir)
    val (_, cents) = Similarity.kmTrain(s, e)
    cents.select($"cell", $"cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    val (_, cb) = Similarity.pqTrain(s, e)
    cb.select($"sub", $"cell".as("code"), $"cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebooks")
    Similarity.kmAssign(s, e.select($"vec_id", $"v"), cents)
      .select($"cell", $"vec_id")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/invlists")
    Similarity.pqAssign(s,
        Similarity.pqSubs(s, e.select($"vec_id", $"v")), cb)
      .select($"vec_id", $"sub", $"cell".as("code"))
      .repartitionByRange(4, $"vec_id")
      .sortWithinPartitions($"vec_id", $"sub")
      .write.mode("overwrite").parquet(s"$indexDir/codes")
  }

  /** Incremental maintenance: index a DELTA of new vectors against the
    * EXISTING trained model — no retrain, the production cadence
    * (upsert continuously, rebuild when s13's churn numbers say the
    * quantizer no longer fits). New vectors assign to the existing
    * cells and encode with the existing codebooks, then APPEND to the
    * artifact tables; vec_ids already indexed are skipped (anti-join),
    * so re-running the same upsert is a no-op — the same resumability
    * contract as the pack write. `delta` is (vec_id, v).
    *
    * Scale shape: two broadcast-join argmax passes over the delta only
    * (the existing index is touched just for the pre-image anti-join
    * on a narrow id column), appends land in the cell directories the
    * searches already prune on.
    */
  def upsert(s: SparkSession, indexDir: String, delta: DataFrame): Unit = {
    import s.implicits._
    val cents = s.read.parquet(s"$indexDir/centroids")
    val cb = s.read.parquet(s"$indexDir/codebooks")
      .select($"sub", $"code".as("cell"), $"cv")
    val existing = s.read.parquet(s"$indexDir/invlists")
      .select($"vec_id")
    // EAGERLY materialized: the anti-join must be evaluated against the
    // PRE-upsert inverted lists for both writes below — lazily, the
    // codes write would re-run it after the invlist append and see its
    // own delta as "already indexed", writing list entries with no
    // codes (silent index corruption; the spec's dup-codes check would
    // catch exactly this).
    val fresh = delta.select($"vec_id", $"v")
      .join(existing, Seq("vec_id"), "left_anti")
      .localCheckpoint()
    Similarity.kmAssign(s, fresh, cents)
      .select($"cell", $"vec_id")
      .write.mode("append").partitionBy("cell")
      .parquet(s"$indexDir/invlists")
    Similarity.pqAssign(s, Similarity.pqSubs(s, fresh), cb)
      .select($"vec_id", $"sub", $"cell".as("code"))
      .repartitionByRange(4, $"vec_id")
      .sortWithinPartitions($"vec_id", $"sub")
      .write.mode("append").parquet(s"$indexDir/codes")
  }

  /** Search the written index: top-`k` neighbors per query by the same
    * probe + ADC discipline as s19 (rounded-DECIMAL distance tables,
    * ties to the lowest id). `queries` is (q_id, qv) — the caller's
    * frame; nothing here touches the corpus. Returns
    * (q_id, n_id, adc DECIMAL, rnk).
    */
  def search(s: SparkSession, indexDir: String, queries: DataFrame,
      k: Int): DataFrame = {
    import s.implicits._
    val cents = s.read.parquet(s"$indexDir/centroids")
    val cb = s.read.parquet(s"$indexDir/codebooks")
    val wProbe = Window.partitionBy($"q_id").orderBy($"d2", $"cell")
    val probes = queries.join(broadcast(cents), lit(true))
      .withColumn("d2", Similarity.kmDist2($"qv", $"cv"))
      .withColumn("p_rnk", row_number().over(wProbe))
      .filter($"p_rnk" <= Similarity.NProbe)
      .select($"q_id", $"qv", $"cell")
    // the probed cells, resolved driver-side (NProbe×|queries| tiny
    // rows) into an IN-filter the partitioned invlist scan can PRUNE
    // on — this is the read-path payoff of the cell=<c>/ layout
    val probedCells = probes.select($"cell").distinct()
      .collect().map(_.getLong(0))
    // The IN-filter must hit the RAW partition column (inference may
    // read cell=<c> as int; a cast on the column side would demote the
    // partition filter to a post-scan filter and kill pruning) — so
    // match the literal type to the scan's, THEN normalize for joins.
    val inv = s.read.parquet(s"$indexDir/invlists")
    val cellLits: Seq[Any] =
      if (inv.schema("cell").dataType ==
          org.apache.spark.sql.types.IntegerType)
        probedCells.toSeq.map(_.toInt)
      else probedCells.toSeq
    val cand = inv.filter($"cell".isin(cellLits: _*))
      .withColumn("cell", $"cell".cast("long"))
      .join(broadcast(probes.select($"q_id", $"cell")), "cell")
      .filter($"q_id" =!= $"vec_id")
      .select($"q_id", $"vec_id".as("n_id"))
    val qtab = Similarity.pqSubs(s,
        queries.select($"q_id".as("vec_id"), $"qv".as("v")))
      .select($"vec_id".as("q_id"), $"sub", $"sv".as("qsv"))
      .join(broadcast(cb), "sub")
      .withColumn("qd2",
        Similarity.kmDist2($"qsv", $"cv").cast("decimal(12,6)"))
      .select($"q_id", $"sub", $"code", $"qd2")
    val enc = s.read.parquet(s"$indexDir/codes")
    val adc = enc.join(cand, enc("vec_id") === cand("n_id"))
      .join(broadcast(qtab), Seq("q_id", "sub", "code"))
      .groupBy($"q_id", $"n_id")
      .agg(sum($"qd2").as("adc"))
    val top = graft.plans.TopKPerKey(adc, Seq("q_id"),
      struct($"adc", $"n_id"), k)
    val w = Window.partitionBy($"q_id").orderBy($"adc", $"n_id")
    top.withColumn("rnk", row_number().over(w))
      .select($"q_id", $"n_id", $"adc", $"rnk")
  }
}
