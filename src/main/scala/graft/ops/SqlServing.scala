package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

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
  * Each builder evaluates its (literal) arguments at analysis time and
  * returns the SAME analyzed plan the Scala call produces — one code
  * path, so the SQL surface can never drift from the Scala one
  * (GraftExtensionsSpec pins bit-equality on a `newSession()` clone).
  * Two consequences of that design, deliberate and worth knowing:
  * the ann builders run the search's bounded index probes AT ANALYSIS
  * time (the IN-literal candidate resolve is part of building the
  * plan), so even an EXPLAIN pays them — acceptable for a serving
  * call, wrong for a repeatedly re-analyzed view; and an analyzed
  * plan held across an index upsert serves the snapshot it was built
  * against — re-issue the query text for fresh results (the same
  * contract as holding any DataFrame across an external write).
  * Registration rides the same two seams as the scalar functions: the
  * shared table in [[graft.functions.sqlTableFunctions]] feeds both
  * `graft.GraftExtensions` (config-installed, survives `newSession()`)
  * and `functions.registerAll` (attach to an existing session).
  *
  * Query vectors arrive as either an `array<double>` literal or a
  * comma-separated string (friendlier to clients whose SQL dialect
  * can't build typed arrays). The internal query id is -1 — outside
  * the corpus id space, the HybridIndex discipline — so the search's
  * self-exclusion never drops a real corpus vector, and the constant
  * id column is dropped from the output.
  */
object SqlServing {

  /** graft_bm25(indexDir, query, k): BM25 top-k from the written
    * postings index; terms are the whitespace-split query words.
    * Returns (doc_id, n_terms, bm25d).
    */
  def bm25Plan(args: Seq[Expression]): LogicalPlan = {
    graft.functions.requireArity("graft_bm25", args, 3,
      "graft_bm25(indexDir, query, k)")
    val s = SparkSession.active
    val terms = str(args(1), "query").trim.split("\\s+").toSeq
      .filter(_.nonEmpty)
    TextIndex.search(s, str(args(0), "indexDir"), terms,
      int(args(2), "k")).queryExecution.analyzed
  }

  /** graft_ann(indexDir, queryVector, k): REFINED top-k (exact rerank
    * from the stored-vectors artifact — needs an index built with
    * storeVectors). Returns (n_id, d2, rnk).
    */
  def annPlan(args: Seq[Expression]): LogicalPlan = {
    graft.functions.requireArity("graft_ann", args, 3,
      "graft_ann(indexDir, queryVector, k)")
    val s = SparkSession.active
    AnnIndex.searchRefined(s, str(args(0), "indexDir"),
        oneQuery(s, args(1)), int(args(2), "k"))
      .select("n_id", "d2", "rnk").queryExecution.analyzed
  }

  /** graft_ann_adc(indexDir, queryVector, k): ADC-final top-k (no
    * refine artifact needed). Returns (n_id, adc, rnk).
    */
  def annAdcPlan(args: Seq[Expression]): LogicalPlan = {
    graft.functions.requireArity("graft_ann_adc", args, 3,
      "graft_ann_adc(indexDir, queryVector, k)")
    val s = SparkSession.active
    AnnIndex.search(s, str(args(0), "indexDir"),
        oneQuery(s, args(1)), int(args(2), "k"))
      .select("n_id", "adc", "rnk").queryExecution.analyzed
  }

  /** graft_hybrid(textIndexDir, annIndexDir, query, queryVector, n, k):
    * RRF fusion of the BM25 and REFINED vector rankings, both from
    * written artifacts ([[HybridIndex.searchRefined]] — the quality
    * configuration s43 gates), top-`n` retrieved per side, fused
    * top-`k`. Returns (doc_id, n_sides, rrf). The serving knobs are
    * explicit arguments, so a SQL client reads them in the query text.
    */
  def hybridPlan(args: Seq[Expression]): LogicalPlan = {
    graft.functions.requireArity("graft_hybrid", args, 6,
      "graft_hybrid(textIndexDir, annIndexDir, query, queryVector, n, k)")
    val s = SparkSession.active
    val terms = str(args(2), "query").trim.split("\\s+").toSeq
      .filter(_.nonEmpty)
    HybridIndex.searchRefined(s, str(args(0), "textIndexDir"),
        str(args(1), "annIndexDir"), terms,
        doubles(args(3), "queryVector"), int(args(4), "n"),
        int(args(5), "k"))
      .queryExecution.analyzed
  }

  private def oneQuery(s: SparkSession,
      e: Expression): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Seq((-1L, doubles(e, "queryVector"))).toDF("q_id", "qv")
  }

  /** Every argument defect — non-literal, wrong type, out-of-range —
    * must surface as an AnalysisException naming the argument (the
    * requireArity principle): a SQL client's typo may not leak a
    * ClassCastException or silently truncate.
    */
  private def bad(what: String, msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INVALID_SQL_SYNTAX.UNSUPPORTED_SQL_STATEMENT",
      messageParameters = Map("sqlText" ->
        s"graft serving functions: $what $msg"))

  private def lit(e: Expression, what: String): Any = {
    if (!e.foldable)
      bad(what, s"must be a literal argument, got: ${e.sql}")
    e.eval()
  }

  private def str(e: Expression, what: String): String =
    lit(e, what) match {
      case s: UTF8String => s.toString
      case other => bad(what, s"must be a string literal, got: $other")
    }

  private def int(e: Expression, what: String): Int = {
    val l: Long = lit(e, what) match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
      case other => bad(what, s"must be an integer literal, got: $other")
    }
    if (l < Int.MinValue || l > Int.MaxValue)
      bad(what, s"is out of Int range: $l")
    l.toInt
  }

  private def doubles(e: Expression, what: String): Seq[Double] =
    lit(e, what) match {
      case s: UTF8String =>
        try s.toString.split(",").map(_.trim).filter(_.nonEmpty)
          .map(_.toDouble).toSeq
        catch { case _: NumberFormatException =>
          bad(what, s"has a non-numeric component: $s") }
      case a: ArrayData => a.toDoubleArray().toSeq
      case other => bad(what,
        s"must be array<double> or a comma-separated string, got: $other")
    }
}
