package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCHEMA-DERIVED decoded-width model for the serving-memory card
  * (s53) — the round-13 verdict's "derive the widths from the written
  * artifacts" item. The card prices what each artifact costs DECODED
  * in serving RAM, which is a semantic model (a packed PQ code is
  * 1 B however parquet encodes it; a build-side helper column never
  * ships), so the widths cannot be a mechanical sum over parquet
  * physical types. What CAN and now does come from the written
  * artifacts:
  *
  *  - every component's field list is validated against the written
  *    parquet schema — a field added, removed or renamed by a future
  *    build fails the card LOUDLY with the drifted names instead of
  *    silently pricing a stale layout (this is how the card "tracks
  *    schema evolution automatically": evolution must be priced here
  *    before it can gate);
  *  - every data-dependent width (term bytes, positions, centroid /
  *    codebook vectors, fingerprint hex) is measured from the
  *    artifact rows, not assumed.
  *
  * Width vocabulary (the documented model, unchanged values —
  * SimilaritySpec asserts the derived widths equal the historical
  * constants once, as the migration proof):
  *  - [[Slot8]]: ids / cells / counts decode to 64-bit slots
  *    regardless of parquet storage width;
  *  - [[Packed1]]: a PQ sub-code packs to one byte;
  *  - [[DataBytes]]: a string's actual bytes (fp hex, terms);
  *  - [[DataArray8]]: 8 B per element of an array column (double
  *    vectors, position lists);
  *  - [[Canonical]]: a fixed serving slot whose width is the
  *    documented allocation, not the variable build-side string
  *    (band keys: the serving tier hashes them into 24 B slots);
  *  - [[Helper]]: build-side column that never ships to serving RAM
  *    (pre-hashed join keys, byte-count helpers, raw minhash slots).
  */
object ServingWidths {

  sealed trait FieldWidth
  case object Slot8 extends FieldWidth
  case object Packed1 extends FieldWidth
  case object DataBytes extends FieldWidth
  case object DataArray8 extends FieldWidth
  final case class Canonical(bytes: Long) extends FieldWidth
  case object Helper extends FieldWidth

  /** Field policy per component (artifact-relative path). */
  val policy: Map[String, Map[String, FieldWidth]] = Map(
    "ann/invlists" -> Map("vec_id" -> Slot8, "cell" -> Slot8),
    "ann/codes" -> Map("vec_id" -> Slot8, "sub" -> Slot8,
      "code" -> Packed1),
    "ann/centroids" -> Map("cell" -> Slot8, "cv" -> DataArray8),
    "ann/codebooks" -> Map("sub" -> Slot8, "code" -> Slot8,
      "cv" -> DataArray8),
    "text/postings" -> Map("doc_id" -> Slot8, "term" -> DataBytes,
      "tf" -> Slot8, "pos" -> DataArray8, "len" -> Slot8,
      "tb" -> Helper),
    "text/docs" -> Map("doc_id" -> Slot8, "len" -> Slot8,
      "db" -> Helper),
    "dedup/fps" -> Map("doc_id" -> Slot8, "fp" -> DataBytes,
      "fpb" -> Helper),
    "dedup/bands" -> Map("doc_id" -> Slot8, "band" -> Canonical(24L),
      "mh0" -> Helper, "mh1" -> Helper, "mh2" -> Helper,
      "mh3" -> Helper, "mh4" -> Helper, "mh5" -> Helper,
      "pb" -> Helper))

  /** (row count, decoded bytes) of one written component: one
    * metadata-sized aggregate per artifact (count + the variable-width
    * sums, coalesced so an EMPTY artifact prices as zero bytes and the
    * oracle gate reports the corpus mismatch instead of an NPE — the
    * round-13 advisory). Fails loudly on schema drift.
    */
  def measure(s: SparkSession, component: String,
      path: String): (Long, Long) = {
    val fields = policy.getOrElse(component,
      throw new IllegalStateException(
        s"no width policy for component '$component'"))
    val df = s.read.parquet(path)
    val written = df.schema.fieldNames.toSet
    val missing = fields.keySet -- written
    val unlisted = written -- fields.keySet
    if (missing.nonEmpty || unlisted.nonEmpty)
      throw new IllegalStateException(
        s"serving schema drift in '$component': missing=" +
          s"${missing.toSeq.sorted.mkString(",")} unlisted=" +
          s"${unlisted.toSeq.sorted.mkString(",")} - price the new " +
          "layout in ServingWidths.policy before gating it")
    val perRow = fields.valuesIterator.map {
      case Slot8 => 8L
      case Packed1 => 1L
      case Canonical(b) => b
      case _ => 0L
    }.sum
    val varAggs = fields.toSeq.sortBy(_._1).flatMap {
      case (f, DataBytes) =>
        Some(coalesce(sum(length(col(f)).cast("long")), lit(0L)))
      case (f, DataArray8) =>
        Some(coalesce(sum(size(col(f)).cast("long") * 8L), lit(0L)))
      case _ => None
    }
    val row = df.agg(count(lit(1)), varAggs: _*).head()
    val n = row.getLong(0)
    val varBytes = (1 until row.length).map(row.getLong(_)).sum
    (n, n * perRow + varBytes)
  }
}
