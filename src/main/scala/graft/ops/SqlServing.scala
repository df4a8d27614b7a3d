package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DecimalType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.ServingScan

/** SQL-only entry points for the serving tier (SURVEY.md §2.4): the
  * index searches ([[TextIndex.search]], [[AnnIndex.search]],
  * [[AnnIndex.searchRefined]]) are table-valued functions, so a client
  * that only speaks SQL — a Thrift/Connect session, a BI tool, a
  * `spark.sql(...)`-only notebook — can query a written index with no
  * Scala in sight:
  *
  * {{{
  *   SELECT * FROM graft_bm25('/indexes/docs', 'spark window query', 10)
  *   SELECT * FROM graft_ann('/indexes/vecs', '0.25,0.5,...', 5)
  *   SELECT * FROM graft_ann_adc('/indexes/vecs', array(0.25d, ...), 5)
  * }}}
  *
  * Each builder validates its (literal) arguments at analysis time and
  * returns a [[graft.plans.ServingScan]] leaf that DEFERS building the
  * search plan to execution. Deferral is load-bearing (the round-12
  * advisory): the searches run bounded driver-side resolves while
  * constructing their plans, so analysis-time construction made even
  * an `EXPLAIN` (or a BI tool's schema probe, or each re-analysis of a
  * view over the TVF) pay full search cost, and an analyzed plan
  * pinned a pre-upsert index snapshot. Now analysis runs ZERO Spark
  * jobs (spec-pinned), and each EXECUTION reads the index artifacts as
  * of that run. At execution the deferred build calls the exact Scala
  * entry point, so the SQL surface still cannot drift from the Scala
  * one (GraftExtensionsSpec pins bit-equality on a `newSession()`
  * clone); the declared output schemas below are spec-pinned against
  * the Scala twins' and re-checked at every execution.
  *
  * Argument defects raise `INVALID_PARAMETER_VALUE` (SQLSTATE 22023)
  * naming the function and the argument — a parameter-oriented error
  * class, so SQL tooling that dispatches on class/SQLSTATE classifies
  * a bad TVF argument as what it is (not as an unsupported statement).
  *
  * Registration rides the same two seams as the scalar functions: the
  * shared table in [[graft.functions.sqlTableFunctions]] feeds both
  * `graft.GraftExtensions` (config-installed, survives `newSession()`)
  * and `functions.registerAll` (attach to an existing session); the
  * planner strategy for the deferred leaf installs through
  * `GraftExtensions.injectPlannerStrategy` and self-installs here for
  * the attach path (the TopKPerKey pattern).
  *
  * Query vectors arrive as either an `array<double>` literal or a
  * comma-separated string (friendlier to clients whose SQL dialect
  * can't build typed arrays). The internal query id is -1 — outside
  * the corpus id space, the HybridIndex discipline — so the search's
  * self-exclusion never drops a real corpus vector, and the constant
  * id column is dropped from the output.
  */
object SqlServing {

  // Declared TVF output schemas — the deferral trade (see class doc):
  // analysis can no longer read the schema off the built plan, so it
  // is declared here, pinned by spec against the Scala twins, and
  // re-checked by ServingScanExec at every execution.
  private[graft] val bm25Schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_terms", LongType),
    // sum over the exact DECIMAL(12,6) per-term scores
    StructField("bm25d", DecimalType(22, 6))))
  private[graft] val annSchema = StructType(Seq(
    StructField("n_id", LongType),
    StructField("d2", DecimalType(14, 6)),
    StructField("rnk", IntegerType)))
  private[graft] val annAdcSchema = StructType(Seq(
    StructField("n_id", LongType),
    StructField("adc", DecimalType(22, 6)),
    StructField("rnk", IntegerType)))
  private[graft] val hybridSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_sides", LongType),
    StructField("rrf", DoubleType)))
  private[graft] val dedupCheckSchema = StructType(Seq(
    StructField("fp_in_corpus", BooleanType),
    StructField("near_rej_corpus", BooleanType)))
  private[graft] val phraseSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("phrase_tf", LongType)))
  private[graft] val topkSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("ord", DoubleType),
    StructField("rnk", IntegerType)))
  private[graft] val skewSchema = StructType(Seq(
    StructField("axis", StringType),
    StructField("n_keys", LongType),
    StructField("total_rows", LongType),
    StructField("max_key_rows", LongType),
    StructField("max_share", DoubleType),
    StructField("skew_factor", DoubleType),
    StructField("target_task_rows", LongType),
    StructField("salt_n", LongType),
    StructField("post_salt_max_rows", LongType),
    StructField("decision", StringType)))

  /** graft_bm25(indexDir, query, k): BM25 top-k from the written
    * postings index; terms are the whitespace-split query words.
    * Returns (doc_id, n_terms, bm25d).
    */
  def bm25Plan(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_bm25"
    graft.functions.requireArity(fn, args, 3,
      "graft_bm25(indexDir, query, k)")
    val dir = str(fn, args(0), "indexDir")
    val terms = str(fn, args(1), "query").trim.split("\\s+").toSeq
      .filter(_.nonEmpty)
    val k = int(fn, args(2), "k")
    deferred(fn, s"$dir, ${terms.mkString(" ")}, $k", bm25Schema,
      s => TextIndex.search(s, dir, terms, k))
  }

  /** graft_ann(indexDir, queryVector, k): REFINED top-k (exact rerank
    * from the stored-vectors artifact — needs an index built with
    * storeVectors). Returns (n_id, d2, rnk).
    */
  def annPlan(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_ann"
    graft.functions.requireArity(fn, args, 3,
      "graft_ann(indexDir, queryVector, k)")
    val dir = str(fn, args(0), "indexDir")
    val qv = doubles(fn, args(1), "queryVector")
    val k = int(fn, args(2), "k")
    deferred(fn, s"$dir, <${qv.length}-dim>, $k", annSchema,
      s => AnnIndex.searchRefined(s, dir, oneQuery(s, qv), k)
        .select("n_id", "d2", "rnk"))
  }

  /** graft_ann_adc(indexDir, queryVector, k): ADC-final top-k (no
    * refine artifact needed). Returns (n_id, adc, rnk).
    */
  def annAdcPlan(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_ann_adc"
    graft.functions.requireArity(fn, args, 3,
      "graft_ann_adc(indexDir, queryVector, k)")
    val dir = str(fn, args(0), "indexDir")
    val qv = doubles(fn, args(1), "queryVector")
    val k = int(fn, args(2), "k")
    deferred(fn, s"$dir, <${qv.length}-dim>, $k", annAdcSchema,
      s => AnnIndex.search(s, dir, oneQuery(s, qv), k)
        .select("n_id", "adc", "rnk"))
  }

  /** graft_hybrid(textIndexDir, annIndexDir, query, queryVector, n, k):
    * RRF fusion of the BM25 and REFINED vector rankings, both from
    * written artifacts ([[HybridIndex.searchRefined]] — the quality
    * configuration s43 gates), top-`n` retrieved per side, fused
    * top-`k`. Returns (doc_id, n_sides, rrf). The serving knobs are
    * explicit arguments, so a SQL client reads them in the query text.
    */
  def hybridPlan(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_hybrid"
    graft.functions.requireArity(fn, args, 6,
      "graft_hybrid(textIndexDir, annIndexDir, query, queryVector, n, k)")
    val tDir = str(fn, args(0), "textIndexDir")
    val aDir = str(fn, args(1), "annIndexDir")
    val terms = str(fn, args(2), "query").trim.split("\\s+").toSeq
      .filter(_.nonEmpty)
    val qv = doubles(fn, args(3), "queryVector")
    val n = int(fn, args(4), "n")
    val k = int(fn, args(5), "k")
    deferred(fn,
      s"$tDir, $aDir, ${terms.mkString(" ")}, <${qv.length}-dim>, $n, $k",
      hybridSchema,
      s => HybridIndex.searchRefined(s, tDir, aDir, terms, qv, n, k))
  }

  /** graft_phrase(indexDir, phrase, k): exact consecutive-phrase
    * search over the written POSITIONAL postings index — top-k docs
    * by occurrence count (overlapping starts count, ties to the
    * lowest doc_id). The phrase is the whitespace-split words IN
    * ORDER (unlike graft_bm25's bag of words: "spark window" as a
    * phrase is NOT `spark AND window`). Returns (doc_id, phrase_tf).
    */
  def phrasePlan(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_phrase"
    graft.functions.requireArity(fn, args, 3,
      "graft_phrase(indexDir, phrase, k)")
    val dir = str(fn, args(0), "indexDir")
    val phrase = str(fn, args(1), "phrase").trim.split("\\s+").toSeq
      .filter(_.nonEmpty)
    if (phrase.isEmpty)
      bad(fn, "phrase", "must contain at least one word")
    val k = int(fn, args(2), "k")
    deferred(fn, s"$dir, ${phrase.mkString(" ")}, $k", phraseSchema,
      s => TextIndex.searchPhrase(s, dir, phrase, k))
  }

  /** graft_dedup_check(indexDir, text): single-document admission
    * check against the written dedup index — "would this text be
    * admitted?" as a SQL one-liner, the question an ingest reviewer or
    * a data-vendor acceptance pipeline asks ad hoc. Returns one row
    * (fp_in_corpus, near_rej_corpus): the exact-fingerprint and
    * verified-LSH rejection verdicts (d13/d17's corpus rules). The
    * internal doc_id is -1 (outside the corpus id space, the
    * HybridIndex discipline) and is dropped, along with the batch-rule
    * columns a singleton batch makes vacuous (rn = 1, batch-near =
    * false by construction).
    */
  def dedupCheckPlan(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_dedup_check"
    graft.functions.requireArity(fn, args, 2,
      "graft_dedup_check(indexDir, text)")
    val dir = str(fn, args(0), "indexDir")
    val text = str(fn, args(1), "text")
    deferred(fn, s"$dir, <${text.length}-char text>", dedupCheckSchema,
      s => {
        import s.implicits._
        DedupIndex.probe(s, dir,
            Seq((-1L, text)).toDF("doc_id", "text"))
          .select("fp_in_corpus", "near_rej_corpus")
      })
  }

  /** graft_skew(dataDir, table, keyCol, p): the shuffle-skew decision
    * card for ONE grouping axis of a raw fixture table — the question
    * a SQL-only client asks BEFORE writing a groupBy: "does this axis
    * need the two-phase salted rewrite at p reducers?". Returns the
    * e40 card row (n_keys, total_rows, max_key_rows, max_share,
    * skew_factor, target_task_rows, salt_n, post_salt_max_rows,
    * decision) computed by the exact Scala core the gated e40 row and
    * the live saltedAggAuto rewrite consume (Events.skewCardFor), so
    * the SQL surface cannot drift from either. Keys compare as
    * null-coalesced strings ('<null>'), the card's axis contract.
    */
  def skewPlan(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_skew"
    graft.functions.requireArity(fn, args, 4,
      "graft_skew(dataDir, table, keyCol, p)")
    val dir = str(fn, args(0), "dataDir")
    val table = str(fn, args(1), "table")
    val keyCol = str(fn, args(2), "keyCol")
    val p = int(fn, args(3), "p")
    if (p < 1) bad(fn, "p", "must be >= 1")
    deferred(fn, s"$dir, $table, $keyCol, p=$p", skewSchema,
      s => {
        // the dir/table/keyCol arguments can only be CHECKED against
        // storage at execution (deferral keeps analysis IO-free), but
        // the failure must still carry the module's parameter-oriented
        // framing, not a raw unresolved-column error (round-14 review
        // finding)
        val df = graft.Tables.load(s, dir, table)
        if (!df.columns.contains(keyCol))
          bad(fn, "keyCol", s"column '$keyCol' not in table " +
            s"'$table' (has: ${df.columns.mkString(", ")})")
        Events.skewCardFor(df,
          Seq(keyCol -> F.coalesce(F.col(keyCol).cast("string"),
            F.lit("<null>"))), p.toLong)
      })
  }

  /** graft_topk(dataDir, table, keyCol, orderCol, k): bounded-heap
    * per-key top-k over a raw fixture table — the SQL surface of the
    * TopKPerKey operator, and the sanctioned alternative the
    * flooded-window guard names when a SQL client writes the
    * rank-then-filter window shape (`row_number() OVER (PARTITION BY
    * key ORDER BY v DESC) <= k` sorts every key's FULL slice before
    * discarding all but k rows; the heap keeps k rows per key in one
    * pass, no sort). Returns (key, ord, rnk): keys compare as
    * null-coalesced strings ('<null>', the graft_skew axis contract),
    * ord is the order column as double (null ords excluded — they
    * cannot rank), rnk densifies 1..k per key by ord DESC. Rows tied
    * on (key, ord) are interchangeable at every stage (heap eviction,
    * rank assignment), so the OUTPUT MULTISET is deterministic even
    * though row identity among ties is not — the property the oracle
    * hash gate rides.
    */
  def topkPlan(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_topk"
    graft.functions.requireArity(fn, args, 5,
      "graft_topk(dataDir, table, keyCol, orderCol, k)")
    val dir = str(fn, args(0), "dataDir")
    val table = str(fn, args(1), "table")
    val keyCol = str(fn, args(2), "keyCol")
    val orderCol = str(fn, args(3), "orderCol")
    val k = int(fn, args(4), "k")
    if (k < 1) bad(fn, "k", "must be >= 1")
    deferred(fn, s"$dir, $table, $keyCol, $orderCol, k=$k", topkSchema,
      s => {
        val df = graft.Tables.load(s, dir, table)
        Seq("keyCol" -> keyCol, "orderCol" -> orderCol).foreach {
          case (what, c) =>
            if (!df.columns.contains(c))
              bad(fn, what, s"column '$c' not in table '$table' " +
                s"(has: ${df.columns.mkString(", ")})")
        }
        val narrow = df.select(
            F.coalesce(F.col(keyCol).cast("string"), F.lit("<null>"))
              .as("key"),
            F.col(orderCol).cast("double").as("ord"))
          .filter(F.col("ord").isNotNull)
        // heap cut FIRST (≤k rows per key survive), THEN the rank
        // window over the k-bounded frame — the q07/e06/e38 pattern.
        // The heap's ascending key is (nan-flag, -ord), NOT bare -ord:
        // SQL sorts NaN greater than every double, so the DESC window
        // ranks NaN rows first — but -NaN = NaN would be the LARGEST
        // ascending value and the heap would evict exactly the rows
        // the window keeps. The flag pins NaN rows to the front of
        // the ascending order (ties among them interchangeable, like
        // any equal ord).
        graft.plans.TopKPerKey(narrow, Seq("key"),
            F.struct(F.when(F.isnan(F.col("ord")), 0).otherwise(1)
              .as("nn"), (-F.col("ord")).as("no")), k)
          .withColumn("rnk", F.row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(F.col("key")).orderBy(F.col("ord").desc)))
      })
  }

  private def deferred(fn: String, argsDesc: String, schema: StructType,
      build: SparkSession => org.apache.spark.sql.DataFrame): LogicalPlan = {
    // self-install the planner strategy for the attach path (a
    // builder can only run on a session the TVF is registered on, so
    // physical planning always finds the strategy installed)
    ServingScan.install(SparkSession.active)
    ServingScan(fn, argsDesc, schema, build)
  }

  private def oneQuery(s: SparkSession,
      qv: Seq[Double]): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Seq((-1L, qv)).toDF("q_id", "qv")
  }

  /** Every argument defect — non-literal, wrong type, out-of-range —
    * must surface as an AnalysisException naming the function and the
    * argument (the requireArity principle): a SQL client's typo may
    * not leak a ClassCastException or silently truncate. The error
    * class is the parameter-oriented INVALID_PARAMETER_VALUE (SQLSTATE
    * 22023), so class/SQLSTATE-dispatching tooling classifies it
    * correctly.
    */
  private def bad(fn: String, what: String, msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
      messageParameters = Map(
        "parameter" -> s"`$what`",
        "functionName" -> s"`$fn`",
        "value" -> msg))

  private def lit(fn: String, e: Expression, what: String): Any = {
    if (!e.foldable)
      bad(fn, what, s"must be a literal argument, got: ${e.sql}")
    e.eval()
  }

  private def str(fn: String, e: Expression, what: String): String =
    lit(fn, e, what) match {
      case s: UTF8String => s.toString
      case other => bad(fn, what, s"must be a string literal, got: $other")
    }

  /** Every int argument here is a retrieval count (k, n): reject
    * non-positive values at ANALYSIS time with the parameter-oriented
    * error, instead of letting a deferred `limit(-5)` surface a
    * generic execution failure later.
    */
  private def int(fn: String, e: Expression, what: String): Int = {
    val l: Long = lit(fn, e, what) match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
      case other => bad(fn, what, s"must be an integer literal, got: $other")
    }
    if (l < 1 || l > Int.MaxValue)
      bad(fn, what, s"must be a positive count, got: $l")
    l.toInt
  }

  /** Vector decode accepts ANY numeric element type, because a plain
    * SQL literal `array(0.25, 0.5)` is array<decimal(3,2)> — only the
    * `d`-suffixed spelling is array<double> — and `toDoubleArray()` on
    * a non-double ArrayData leaks a ClassCastException, exactly the
    * internal-error class this surface promises never to surface for
    * an argument defect.
    */
  private def doubles(fn: String, e: Expression, what: String): Seq[Double] = {
    val decoded = lit(fn, e, what) match {
      case s: UTF8String =>
        try s.toString.split(",").map(_.trim).filter(_.nonEmpty)
          .map(_.toDouble).toSeq
        catch { case _: NumberFormatException =>
          bad(fn, what, s"has a non-numeric component: $s") }
      case a: ArrayData =>
        import org.apache.spark.sql.types._
        val et = e.dataType match {
          case ArrayType(t, _) => t
          case other => bad(fn, what,
            s"must be a numeric array or a comma-separated string, " +
              s"got type: ${other.sql}")
        }
        (0 until a.numElements()).map { i =>
          if (a.isNullAt(i))
            bad(fn, what, s"contains a NULL element at position $i")
          et match {
            case DoubleType => a.getDouble(i)
            case FloatType => a.getFloat(i).toDouble
            case LongType => a.getLong(i).toDouble
            case IntegerType => a.getInt(i).toDouble
            case ShortType => a.getShort(i).toDouble
            case ByteType => a.getByte(i).toDouble
            case dt: DecimalType =>
              a.getDecimal(i, dt.precision, dt.scale).toDouble
            case other => bad(fn, what,
              s"must have numeric elements, got element type ${other.sql}")
          }
        }
      case null => bad(fn, what, "must not be NULL")
      case other => bad(fn, what,
        s"must be a numeric array or a comma-separated string, got: $other")
    }
    if (decoded.isEmpty)
      bad(fn, what, "must contain at least one component")
    decoded
  }
}
