package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.4): media as opaque `binary`
  * content plus a typed metadata struct, with decode / feature-extract /
  * resize / frame-sample stages. The real Spark-side machinery — schema,
  * per-partition batched processing via `mapPartitions` over a typed
  * `Dataset`, metadata transforms, deterministic outputs — is genuine
  * and oracle-tested; only the *codec* is stubbed (no image/audio libs
  * in this container) with a deterministic md5-derived fake, clearly
  * marked in [[FakeCodec]]. Swapping in a real decoder changes one
  * function, not the pipeline.
  *
  * The media table is synthesized per-query from the `documents` fixture
  * (content = UTF-8 text bytes, metadata derived deterministically), so
  * both engines see identical bytes and DuckDB can replicate every
  * output.
  *
  * Scale posture (100 TB of media): content never leaves its partition —
  * decode runs inside `mapPartitions` (one codec instance per task, not
  * per row), features are fixed-width columns, and every stage is a
  * narrow map (no shuffle until the analytical groupBy at the end).
  */
object Multimodal {

  /** One media row: binary payload + typed metadata. */
  final case class Media(media_id: Long, content: Array[Byte],
      format: String, width: Int, height: Int)

  final case class MediaFeatures(media_id: Long, f0: Double, f1: Double,
      f2: Double, f3: Double, f4: Double, f5: Double, f6: Double, f7: Double)

  /** STUB CODEC — deterministic fake standing in for an image/audio
    * decoder (none available in this container). Feature j of a payload
    * is the first 7 md5 hex digits of (payload ++ "_j"), mod 1000,
    * scaled to [0, 1). A real implementation would decode pixels and
    * pool; the call shape (bytes in, fixed-width floats out, one
    * instance per partition) is the contract the pipeline tests.
    */
  object FakeCodec {
    val NFeatures = 8

    def features(md: MessageDigest, content: Array[Byte]): Array[Double] =
      features(md, content, NFeatures)

    def features(md: MessageDigest, content: Array[Byte],
        n: Int): Array[Double] =
      (0 until n).map { j =>
        md.reset()
        md.update(content)
        md.update(s"_$j".getBytes("UTF-8"))
        val hex = md.digest().map("%02x".format(_)).mkString.substring(0, 7)
        // /1024 (dyadic), NOT /1000: k/1024 is exact in binary, so
        // SUMS of features (k-means centroid averages in the m11
        // index training) are order-insensitive and engine-exact —
        // k/1000 doubles diverged between Spark and DuckDB in the
        // last ulps of avg() and flipped the 6-dp centroid rounding
        // (caught live by m11's ADC hash). Float32 embeddings get the
        // same property from their 24-bit mantissas.
        (java.lang.Long.parseLong(hex, 16) % 1000) / 1024.0
      }.toArray
  }

  /** The synthesized media catalog: deterministic metadata from doc
    * attributes (format cycles over 4 codecs; dims derived from length).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(
        $"doc_id".as("media_id"),
        $"text".cast("binary").as("content"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
          ($"doc_id" % 4 + 1).cast("int")).as("format"),
        ($"n_chars" % 640 + 16).cast("int").as("width"),
        ($"n_chars" % 480 + 16).cast("int").as("height"))
  }

  /** The media corpus as a VECTOR frame — (vec_id, v ARRAY<DOUBLE>),
    * 64 codec features per item, the image-embedding stand-in — shaped
    * for `AnnIndex.buildFrom`: media similarity indexes through the
    * SAME lifecycle as text embeddings (build once, search artifacts,
    * upsert deltas), it just plugs a different vector producer into the
    * front. Decode stays in `mapPartitions` (one codec per task); the
    * output is a narrow two-column frame, so the index build never
    * re-reads media bytes.
    */
  def mediaVectors(s: SparkSession, dir: String): DataFrame =
    mediaVectorsOf(s, {
      import s.implicits._
      mediaTable(s, dir).as[Media]
    })

  /** Feature extraction over a PRE-FILTERED media frame: callers that
    * need a few rows (m11's query side) must narrow BEFORE this typed
    * mapPartitions — Catalyst cannot push a predicate through the
    * deserialization barrier, so filtering the result decodes the
    * whole corpus to keep 10 rows (the m02 lesson; caught live as a
    * 4.2 s warm pass on m11's bounded query side).
    */
  def mediaVectorsOf(s: SparkSession, media: Dataset[Media]): DataFrame = {
    import s.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.map(m => (m.media_id, FakeCodec.features(md, m.content, 64)))
    }.toDF("vec_id", "v")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m11_media_ann_serving" -> { (s, dir) =>
      import s.implicits._
      // MEDIA similarity served from a written IVF-PQ index,
      // driver-gated: the codec feature vectors (the m02 pipeline at
      // 64 dims) index through `AnnIndex.buildFrom` — the same
      // trained lifecycle text embeddings use, seeded once per JVM by
      // ServingIndexes.media — and the search answers from artifacts.
      // The oracle re-derives the ENTIRE index (features from raw
      // bytes, count-bounded k-means, PQ codebooks, probes, ADC)
      // in SQL via the source-agnostic CTE builder — proving the
      // index machinery is genuinely modality-blind, not
      // embeddings-shaped. Queries are the first NQueries media items'
      // vectors, materialized to literals (the s33 discipline: any
      // fixture scan in the gated plan would be the index's fault).
      val qRows = mediaVectorsOf(s,
          mediaTable(s, dir).filter($"media_id" < 10).as[Media])
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      val queries = qRows.toSeq.toDF("q_id", "qv")
      graft.ops.AnnIndex.search(s,
          graft.ops.ServingIndexes.media(s, dir), queries, 5)
        .select($"q_id", $"n_id", $"adc".cast("double").as("adc"), $"rnk")
        .orderBy($"q_id", $"rnk")
    },

    "m06_chunk_plan" -> { (s, dir) =>
      import s.implicits._
      // Fixed-size chunk manifest — the blob → training-sample shaping
      // step: 256-byte chunks with offsets, lengths, and content
      // fingerprints, i.e. the manifest a sharded sample loader reads.
      // Chunk indices explode per row and the bytes are sliced with
      // codegen'd substring, so content never leaves its partition and
      // nothing shuffles until the presentation sort; a real sample
      // format (tokenized spans, image tiles) would replace only the
      // slicer expression.
      mediaTable(s, dir)
        .withColumn("blen", octet_length($"content").cast("long"))
        .filter($"blen" > 0)
        .withColumn("chunk_idx", explode(expr(
          "sequence(cast(0 as bigint), (blen - 1) div 256)")))
        .withColumn("chunk", expr(
          "substring(content, cast(chunk_idx * 256 + 1 as int), 256)"))
        .select($"media_id", $"chunk_idx",
          ($"chunk_idx" * 256 + 1).as("off"),
          octet_length($"chunk").cast("long").as("chunk_len"),
          md5($"chunk").as("chunk_md5"))
        .orderBy($"media_id", $"chunk_idx")
    },

    "m07_media_shard_plan" -> { (s, dir) =>
      import s.implicits._
      // WebDataset-style SHARD PLANNING: media blobs are atomic (no
      // mid-file splits), so training shards fill to a byte budget and
      // a shard may overflow by less than one blob. The assignment
      // APPROXIMATES tar-shard `maxsize` semantics via prefix-sum
      // binning (shard = bytes-before-me div budget within the
      // format's id order): unlike true greedy close-on-crossing, an
      // overflowing blob's carry eats the NEXT bin's capacity (budget
      // 100, blobs 150/60/40 → bins {150},{60},{40} where greedy packs
      // {150},{60,40}) and shard ids can skip when one blob spans
      // several bins — the trade for a pure per-row function that is
      // deterministic under any partitioning, parallelizes per format
      // with one windowed cumsum, and the oracle replays it
      // exactly. Shards are modality-homogeneous (per format) — the
      // layout dataloaders want. Output is the shard manifest: counts,
      // bytes, id range, an order-sensitive content digest (what a
      // writer verifies after the copy), and the overflow flag.
      // the per-format cumsum rides the distributed two-pass scan
      // (round 14): a format partition is a modality's whole corpus
      // slice at 100 TB, and the former window serialized it through
      // one task. The scan input is the NARROW (format, media_id,
      // nbytes) frame (GlobalRank materializes exactly this frame —
      // narrow in, cheap checkpoint); shard ids join back on the
      // unique media_id, and the heavy content column is scanned once
      // on the md5 leg.
      val base = mediaTable(s, dir)
        .withColumn("nbytes", octet_length($"content").cast("long"))
        .filter($"nbytes" > 0)
      val shards = graft.plans.GlobalRank.groupedCumsum(
          base.select($"format", $"media_id", $"nbytes"),
          Seq("format"), Seq($"media_id"), $"nbytes", "cum")
        .withColumn("shard", expr(s"(cum - nbytes) div $MediaShardBytes"))
        .select($"media_id", $"shard")
      base.join(shards, "media_id")
        .withColumn("m_md5", md5($"content"))
        .groupBy($"format", $"shard")
        .agg(count(lit(1)).as("n_media"),
          sum($"nbytes").as("shard_bytes"),
          min($"media_id").as("first_id"),
          max($"media_id").as("last_id"),
          md5(concat_ws(",", expr(
            "transform(array_sort(collect_list(struct(media_id, m_md5)))," +
              " p -> p.m_md5)"))).as("shard_md5"))
        .withColumn("overflow", $"shard_bytes" > MediaShardBytes)
        .orderBy($"format", $"shard")
    },

    "m09_frame_sample_plan" -> { (s, dir) =>
      import s.implicits._
      // VIDEO FRAME-SAMPLING MANIFEST — the plan a multimodal training
      // loader executes against raw video: for every mp4 blob, the
      // deterministic 1 Hz sample of frame indices (one frame per fps
      // frames), each with its timestamp, a keyframe flag on the 10 s
      // GOP grid (sampling keyframes is the cheap-decode path — a
      // seek + single-frame decode instead of decoding the GOP), and
      // the byte window a loader PREFETCHES for the seek (position-
      // proportional estimate — real containers would read the moov
      // index; the estimate is what you prefetch before you have it).
      // fps and duration derive deterministically from the fixture
      // metadata (24/30 by id parity; 40 ms of video per content
      // byte) — a real catalog carries both in the metadata struct and
      // only this derivation changes. Scale shapes: a pure per-row
      // explode (sequence with step fps) — content bytes never leave
      // their partition, nothing shuffles before the presentation
      // sort, and every output column is integer arithmetic (engine-
      // exact by construction).
      mediaTable(s, dir)
        .filter($"format" === "mp4")
        .withColumn("blen", octet_length($"content").cast("long"))
        .filter($"blen" > 0)
        .withColumn("fps", ($"media_id" % 2 * 6 + 24).cast("long"))
        .withColumn("n_frames", expr("(blen * 40 * fps) div 1000"))
        .filter($"n_frames" >= 1)
        .withColumn("frame_idx", explode(expr(
          "sequence(cast(0 as bigint), n_frames - 1, fps)")))
        .select($"media_id",
          expr("frame_idx div fps").as("sample_ord"),
          $"frame_idx",
          expr("(frame_idx * 1000) div fps").as("ts_ms"),
          ($"frame_idx" % ($"fps" * 10) === 0).as("keyframe"),
          expr("(frame_idx * blen) div n_frames").as("prefetch_off"),
          least(lit(256L),
            $"blen" - expr("(frame_idx * blen) div n_frames"))
            .as("prefetch_len"),
          $"n_frames")
        .orderBy($"media_id", $"frame_idx")
    },

    "m10_context_budget" -> { (s, dir) =>
      import s.implicits._
      // MULTIMODAL CONTEXT-BUDGET CARD — the table a mixed-modality
      // batch planner reads before p18-style budgeting, because media
      // tokens DOMINATE interleaved samples and each modality has its
      // own token model: images cost a ViT patch grid
      // (ceil(w/16)·ceil(h/16)), audio costs codec frames
      // (duration / 80 ms), video costs its 1 Hz sampled frames (m09's
      // schedule) times the patch grid, and the paired text costs its
      // whitespace tokens. Per format: item counts, text vs media
      // token totals, the media share, and the 2048-token context
      // windows the combined samples fill — at the fixture dims the
      // card reads ~99% media share for images and video, the
      // vision-dominance fact that makes text-only token budgeting
      // wrong for multimodal mixes. All integer arithmetic on the
      // deterministic metadata (m09's duration proxy), one narrow id
      // join for the text side, one per-format agg; engine-exact by
      // construction.
      tokenFrame(s, dir, Seq(16))
        .groupBy($"format")
        .agg(count(lit(1)).as("n_items"),
          sum($"text_toks").as("text_tokens"),
          sum($"media_toks").as("media_tokens"),
          round(sum($"media_toks").cast("double") /
            (sum($"media_toks") + sum($"text_toks")).cast("double"), 6)
            .as("media_share"),
          sum(expr("(text_toks + media_toks + 2047) div 2048"))
            .as("ctx_windows"))
        .orderBy($"format")
    },

    "m12_interleaved_pack" -> { (s, dir) =>
      import s.implicits._
      // INTERLEAVED MULTIMODAL SEQUENCE PACKING — p06's concat-and-
      // chunk accounting, run on COMBINED modality tokens: each sample
      // is a media item plus its paired text, costed by the m10 token
      // model (the card that shows media dominates ~99:1 on vision
      // formats — packing on text tokens alone would overflow vision
      // windows by orders of magnitude, which is exactly why a VLM
      // packer needs this row and not p06). Within each
      // (format, shard) cell samples concatenate in media_id order and
      // cut into 2048-token context windows; the per-format report
      // rolls shards up: windows yielded, samples straddling a window
      // boundary (they lose attention continuity), padding at shard
      // tails. Cells are modality-homogeneous (per format) because
      // samples of one modality share a collator. Scale shapes: the
      // running offset is a windowed sum partitioned by
      // (format, shard), never format alone — one dominant modality
      // would otherwise serialize its whole cumsum through a single
      // task (the p06 discipline); everything else is integer
      // arithmetic on the narrow token frame, exact by construction.
      val w = Window.partitionBy($"format", $"shard").orderBy($"media_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tokenFrame(s, dir, Seq(16))
        .withColumn("shard", expr(s"media_id div $MediaShardDocs"))
        .withColumn("n_toks", $"text_toks" + $"media_toks")
        .withColumn("cum", sum($"n_toks").over(w))
        .withColumn("split_sample", $"n_toks" > 0 &&
          expr(s"(cum - n_toks) div $CtxToks") =!=
          expr(s"(cum - 1) div $CtxToks"))
        .groupBy($"format", $"shard")
        .agg(count(lit(1)).as("s_n"),
          sum($"text_toks").as("s_tt"),
          sum($"media_toks").as("s_mt"),
          expr(s"(sum(n_toks) + $CtxToks - 1) div $CtxToks").as("s_win"),
          sum(when($"split_sample", 1L).otherwise(0L)).as("s_splits"),
          (expr(s"(sum(n_toks) + $CtxToks - 1) div $CtxToks") * CtxToks -
            sum($"n_toks")).as("s_pad"))
        .groupBy($"format")
        .agg(sum($"s_n").as("n_samples"),
          sum($"s_tt").as("text_tokens"),
          sum($"s_mt").as("media_tokens"),
          sum($"s_win").as("n_windows"),
          sum($"s_splits").as("n_split_samples"),
          sum($"s_pad").as("tail_pad"))
        .orderBy($"format")
    },

    "m13_patch_budget_curve" -> { (s, dir) =>
      import s.implicits._
      // PATCH-SIZE OPERATING CURVE — the resolution lever priced as a
      // gated number: the ViT patch size is the one knob that moves a
      // vision corpus's token bill quadratically (8 px is 4x the
      // tokens of 16 px, 32 px a quarter), and the decision "what
      // resolution can this context budget afford" is read off
      // exactly this table. Per (patch_px, format): the media token
      // bill, integer tokens-per-item, the media share against the
      // paired text, and the 2048-token windows the combined samples
      // fill. Audio rows are flat across the sweep — the lever
      // doesn't reach codec-frame tokenization, which is itself the
      // scope fact the card states. One corpus scan: the sweep fans
      // out per-row inside [[tokenFrame]], then one map-side-partial
      // agg over 12 groups; engine-exact integer/dyadic arithmetic.
      tokenFrame(s, dir, PatchSweep)
        .groupBy($"patch_px", $"format")
        .agg(count(lit(1)).as("n_items"),
          sum($"media_toks").as("media_tokens"),
          expr("sum(media_toks) div count(1)").as("toks_per_item"),
          round(sum($"media_toks").cast("double") /
            (sum($"media_toks") + sum($"text_toks")).cast("double"), 6)
            .as("media_share"),
          sum(expr(s"(text_toks + media_toks + ${CtxToks - 1})" +
            s" div $CtxToks")).as("ctx_windows"))
        .orderBy($"patch_px", $"format")
    },

    "m01_media_catalog" -> { (s, dir) =>
      import s.implicits._
      // Catalog stats per format: byte sizes + dimension aggregates over
      // the typed metadata.
      mediaTable(s, dir)
        .groupBy($"format")
        .agg(
          count(lit(1)).as("n_media"),
          sum(length($"content")).as("total_bytes"),
          round(avg($"width" * $"height"), 2).as("avg_pixels"),
          max($"width").as("max_width"))
        .orderBy($"format")
    },

    "m02_feature_extract" -> { (s, dir) =>
      import s.implicits._
      // Decode + feature extraction through mapPartitions: one codec
      // per partition, rows processed as a batch stream — the real
      // decode shape with the stub codec.
      // Filter BEFORE the typed mapPartitions: Catalyst cannot push a
      // predicate through the deserialization barrier, so filtering
      // after would decode the whole corpus to keep 100 rows.
      val media: Dataset[Media] =
        mediaTable(s, dir).filter($"media_id" < 100).as[Media]
      media.mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5") // per-task, reused
        rows.map { m =>
          val f = FakeCodec.features(md, m.content)
          MediaFeatures(m.media_id, f(0), f(1), f(2), f(3),
            f(4), f(5), f(6), f(7))
        }
      }.toDF()
        .orderBy($"media_id")
    },

    "m03_frame_sample" -> { (s, dir) =>
      import s.implicits._
      // Frame sampling: treat content as fixed-width 32-byte frames,
      // keep every 4th frame, fingerprint each — pure narrow map, the
      // shape of video keyframe extraction.
      mediaTable(s, dir)
        .filter($"format" === "mp4")
        .select($"media_id", $"content".cast("string").as("txt"))
        .select($"media_id", posexplode(expr(
          // greatest(...) guards empty text: sequence(0, -1, 4) throws
          "transform(sequence(0, greatest(int(floor((length(txt) - 1) / 32)), 0)," +
            " 4), i -> substring(txt, i * 32 + 1, 32))"))
          .as(Seq("frame_no", "frame")))
        .select($"media_id", $"frame_no", md5($"frame").as("frame_fp"))
        .orderBy($"media_id", $"frame_no")
    },

    "m04_thumbnail_plan" -> { (s, dir) =>
      import s.implicits._
      // Resize as metadata transform: halve dims (min 16), emit the
      // thumbnail cache key (content + target dims) — the bookkeeping
      // half of a resize stage, decode-free.
      mediaTable(s, dir)
        .filter($"format".isin("png", "jpeg"))
        .select(
          $"media_id", $"format",
          greatest(floor($"width" / 2), lit(16)).cast("int").as("thumb_w"),
          greatest(floor($"height" / 2), lit(16)).cast("int").as("thumb_h"),
          md5(concat($"content".cast("string"), lit("_"),
            greatest(floor($"width" / 2), lit(16)).cast("int"), lit("x"),
            greatest(floor($"height" / 2), lit(16)).cast("int")))
            .as("thumb_key"))
        .orderBy($"media_id")
    },

    "m05_media_dedup" -> { (s, dir) =>
      import s.implicits._
      // Media dedup accounting, the image-pipeline shape: exact dups by
      // content fingerprint, near-dup CANDIDATES by perceptual-hash
      // bucket (8 sign bits of the codec features vs their midpoint —
      // with a real decoder these are pooled-pixel signs, i.e. a real
      // pHash; the bucketing, join shape, and accounting are identical).
      // The bit test is pure integer (h % 1000 >= 500), so no float
      // parity risk. Per format: media count, distinct contents, exact
      // dups, pHash bucket count + the biggest bucket (the candidate-set
      // skew number a near-dup pass needs before it all-pairs a bucket).
      val base = mediaTable(s, dir)
        .select($"format", fpCol.as("fp"), phashCol.as("ph"))
      dedupStatsFromBase(s, base)
    },

    "m08_contrastive_pairs" -> { (s, dir) =>
      import s.implicits._
      // CONTRASTIVE PAIR ASSEMBLY — the CLIP-style training-set step:
      // each document pairs with its own media (the positive) plus K
      // deterministic negatives, drawn uniformly over the DENSE media
      // id space by pure per-row arithmetic (H(doc:k) mod N, +1 skip
      // when the draw hits the doc itself) — no rank materialization,
      // no RNG state, the p08-coin discipline applied to sampling ids
      // instead of buckets. The op's real content is the
      // FALSE-NEGATIVE GUARD contrastive training needs: a drawn
      // negative that is an exact or perceptual-hash twin of the
      // positive (m05's two dedup signals) is flagged excluded,
      // because pushing apart two copies of the same image teaches
      // the encoder noise — the published SemDeDup/CLIP-curation
      // failure mode, surfaced per pair instead of discovered in
      // training. Scale: the draw is a narrow map over ids; fp/ph
      // resolve through two equi-joins against the (media_id, fp, ph)
      // projection; nothing is all-pairs.
      val n = mediaTable(s, dir).agg(count(lit(1)).as("n_media"))
      val sig = mediaTable(s, dir)
        .select($"media_id", fpCol.as("fp"), phashCol.as("ph"))
      val draws = mediaTable(s, dir).select($"media_id".as("doc_id"))
        .crossJoin(broadcast(s.createDataset(Seq(0, 1)).toDF("k")))
        .crossJoin(broadcast(n))
        .withColumn("draw", expr(
          "cast(conv(substr(md5(concat(doc_id, ':', k)), 1, 8), 16, 10) " +
            "as bigint) % n_media"))
        .select($"doc_id", $"k",
          when($"draw" === $"doc_id", ($"draw" + 1) % $"n_media")
            .otherwise($"draw").as("neg_media_id"))
      draws
        .join(sig.select($"media_id".as("doc_id"),
          $"fp".as("fp_p"), $"ph".as("ph_p")), "doc_id")
        .join(sig.select($"media_id".as("neg_media_id"),
          $"fp".as("fp_n"), $"ph".as("ph_n")), "neg_media_id")
        .select($"doc_id", $"k", $"neg_media_id",
          ($"fp_p" === $"fp_n" || $"ph_p" === $"ph_n").as("excluded"),
          when($"fp_p" === $"fp_n", "exact_twin")
            .when($"ph_p" === $"ph_n", "phash_twin")
            .otherwise("none").as("reason"))
        .orderBy($"doc_id", $"k")
    })

  /** m05/m08's content fingerprint. Null content gets a per-row
    * sentinel: a NULL fp would vanish from m05's distinct count while
    * its row stays in n_media, silently booking every null-content row
    * as a "dup" — on BOTH engines, which is exactly the class of bug
    * the parity gate can never catch.
    */
  private def fpCol =
    coalesce(md5(col("content").cast("string")),
      concat(lit("null-"), col("media_id")))

  /** m05/m08's perceptual hash: 8 sign bits of the codec features vs
    * their midpoint (with a real decoder these are pooled-pixel signs,
    * i.e. a real pHash). The bit test is pure integer, so no float
    * parity risk. Null content hashes to all-zero bits on both
    * engines — null rows bucket together, same as m05's accounting.
    */
  private def phashCol = concat((0 until FakeCodec.NFeatures).map { j =>
    when(expr("cast(conv(substr(md5(concat(cast(content as string), " +
      s"'_$j')), 1, 7), 16, 10) as bigint)") % 1000 >= 500, "1")
      .otherwise("0")
  }: _*)

  /** m05 core on an injectable (format, fp, ph) frame — the skew spec
    * plants a flooded pHash bucket and asserts the near-dup candidate
    * count stays linear in bucket occupancy.
    *
    * ph is a function of content (hence of fp), so ONE scan grouped by
    * (format, fp, ph) yields every number: distinct contents = rows per
    * format, media = sum of counts, bucket census = re-agg of
    * already-aggregated rows by (format, ph). Near-dup CANDIDATES are
    * d09's star reduction (`Dedup.starCandidates`) applied to the pHash
    * buckets: every distinct content links to its bucket's minimum
    * fingerprint hub, so a flooded bucket contributes k−1 candidate
    * edges, never the k(k−1)/2 an all-pairs expansion would — the same
    * boundedness-for-recall trade, and (round 14) the hub min rides
    * Events.saltedAggAuto instead of a per-bucket window, so even the
    * flooded bucket itself never serializes through one task when the
    * sizing says to split it.
    *
    * CONTRACT: (format, ph) must be non-null — the hub join back is a
    * plain equi-join, which DROPS null-key rows the former per-bucket
    * window would have kept (r14 ADVICE). Both keys are md5-derived
    * here (non-null by construction); a caller with nullable keys must
    * coalesce them first.
    */
  private[graft] def dedupStatsFromBase(s: SparkSession,
      base: DataFrame): DataFrame = {
    import s.implicits._
    // four consumers fork from the per-content frame (buckets,
    // contents, the cands join side, the hub aggregation — round-14
    // review finding): materialized once, the d05 rationale, EAGER
    // like every checkpoint on the board
    val per = base.groupBy($"format", $"fp", $"ph")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val buckets = per.groupBy($"format", $"ph")
      .agg(sum($"c").as("bc"))
      .groupBy($"format")
      .agg(count(lit(1)).as("n_ph_buckets"),
        max($"bc").as("max_ph_bucket"))
    // hub = min(fp) per (format, ph) bucket, through the live
    // salted-agg auto path (round 14, same move as d09's star hubs):
    // the former per-bucket window sorted a flooded pHash bucket
    // inside ONE task — exactly the skew the spec below plants —
    // while min is decomposable, so saltedAggAuto can split a hot
    // bucket across reducers when its sizing says to (direct
    // single-shuffle otherwise; identical results either way)
    val hubs = graft.ops.Events.saltedAggAuto(s, per,
      Seq("format", "ph"), Seq(graft.ops.Events.SaltMin($"fp", "hub")))
    val cands = per.join(hubs, Seq("format", "ph"))
      .filter($"fp" =!= $"hub")
      .groupBy($"format")
      .agg(count(lit(1)).as("n_near_cands"))
    val contents = per.groupBy($"format")
      .agg(sum($"c").cast("long").as("n_media"),
        count(lit(1)).as("n_distinct"))
    contents.join(buckets, "format")
      .join(cands, Seq("format"), "left")
      .select($"format", $"n_media", $"n_distinct",
        ($"n_media" - $"n_distinct").as("n_exact_dups"),
        $"n_ph_buckets", $"max_ph_bucket",
        coalesce($"n_near_cands", lit(0L)).as("n_near_cands"))
      .orderBy($"format")
  }

  /** DuckDB media-catalog CTE mirroring [[mediaTable]] (content stays a
    * VARCHAR on the DuckDB side; the bytes are identical UTF-8).
    */
  /** m07's shard byte budget — small against real tar shards (100 MB+)
    * so the fixture yields multi-shard plans with occasional
    * single-blob overflows; the arithmetic is budget-agnostic.
    */
  private val MediaShardBytes = 4096L

  /** m12's packing-cell width in samples (the p06 ShardDocs analogue:
    * shards bound the windowed cumsum's partition so one dominant
    * modality never serializes its whole prefix sum through a single
    * task) and the shared context-window length (m10's 2048).
    */
  private val MediaShardDocs = 200L
  private val CtxToks = 2048L

  /** m13's ViT patch-size sweep: brackets the shipped 16 px one step
    * each way (8 px quadruples the image token bill, 32 px quarters
    * it).
    */
  private val PatchSweep = Seq(8, 16, 32)

  /** Per-item modality token frame under the m10 token model —
    * (media_id, format, patch_px, text_toks, media_toks) at each swept
    * ViT patch size: images cost the patch grid
    * ceil(w/p)*ceil(h/p), audio costs 80 ms codec frames
    * (patch-independent — the sweep rows are flat on wav, which is
    * itself the lever-scope fact), video costs m09's 1 Hz sampled
    * frames times the grid, and the paired text costs its whitespace
    * tokens. The sweep fans out PER ROW (explode over the patch list)
    * so any number of swept sizes still reads the corpus once; the
    * frame is narrow (5 columns) and shuffle-free.
    */
  private def tokenFrame(s: SparkSession, dir: String,
      patches: Seq[Int]): DataFrame = {
    import s.implicits._
    val text = Tables.load(s, dir, "documents")
      .select($"doc_id".as("media_id"),
        when($"text".isNull, lit(0L))
          .otherwise(size(split($"text", " ")).cast("long"))
          .as("text_toks"))
    val grid = "(((width + patch_px - 1) div patch_px) * " +
      "((height + patch_px - 1) div patch_px))"
    mediaTable(s, dir)
      .withColumn("blen", octet_length($"content").cast("long"))
      .withColumn("fps", ($"media_id" % 2 * 6 + 24).cast("long"))
      .withColumn("patch_px", explode(array(patches.map(lit(_)): _*)))
      .withColumn("media_toks",
        when($"format".isin("png", "jpeg"), expr(grid).cast("long"))
        .when($"format" === "wav", expr("(blen * 40) div 80"))
        .otherwise( // mp4: m09's 1 Hz samples x the patch grid
          when(expr("(blen * 40 * fps) div 1000") >= 1,
            (expr("(((blen * 40 * fps) div 1000) - 1) div fps") + 1) *
              expr(grid).cast("long"))
          .otherwise(lit(0L))))
      .join(text, "media_id")
      .select($"media_id", $"format", $"patch_px",
        $"text_toks", $"media_toks")
  }

  /** DuckDB twin of [[tokenFrame]]: CTEs ending in
    * `tok(media_id, format, patch_px, text_toks, media_toks)`.
    */
  private def tokSqlCtes(patches: Seq[Int]): String =
    s"""$mediaSql,
       |t AS (
       |  SELECT doc_id AS media_id,
       |    CAST(CASE WHEN text IS NULL THEN 0
       |      ELSE len(string_split(text, ' ')) END AS BIGINT)
       |      AS text_toks
       |  FROM documents),
       |mm AS (
       |  SELECT media_id, format,
       |    CAST(strlen(content) AS BIGINT) AS blen,
       |    CAST(media_id % 2 * 6 + 24 AS BIGINT) AS fps,
       |    width, height
       |  FROM media),
       |tok AS (
       |  SELECT media_id, format, patch_px, text_toks,
       |    CASE
       |      WHEN format IN ('png', 'jpeg') THEN
       |        CAST(((width + patch_px - 1) // patch_px) *
       |          ((height + patch_px - 1) // patch_px) AS BIGINT)
       |      WHEN format = 'wav' THEN (blen * 40) // 80
       |      WHEN (blen * 40 * fps) // 1000 >= 1 THEN
       |        ((((blen * 40 * fps) // 1000) - 1) // fps + 1) *
       |          CAST(((width + patch_px - 1) // patch_px) *
       |            ((height + patch_px - 1) // patch_px) AS BIGINT)
       |      ELSE 0
       |    END AS media_toks
       |  FROM mm JOIN t USING (media_id),
       |    unnest([${patches.mkString(", ")}]) AS pp(patch_px))"""
      .stripMargin

  private val mediaSql =
    """media AS (
      |  SELECT doc_id AS media_id, text AS content,
      |    ['png', 'jpeg', 'wav', 'mp4'][CAST(doc_id % 4 + 1 AS INT)] AS format,
      |    CAST(n_chars % 640 + 16 AS INT) AS width,
      |    CAST(n_chars % 480 + 16 AS INT) AS height
      |  FROM documents)""".stripMargin

  def oracle: Map[String, String] = Map(
    // m11: the media-vector base CTE (features from raw bytes, the
    // m02 construction at 64 dims) feeds the source-agnostic IVF-PQ
    // oracle builder — the identical trained-index SQL s19 gates over
    // embeddings, re-targeted at another modality
    "m11_media_ann_serving" -> {
      // ::DOUBLE before the divide (a bare BIGINT / N.0 is DECIMAL
      // division in DuckDB), and /1024 so every feature is DYADIC —
      // training-average sums are then exact and order-insensitive in
      // both engines (see FakeCodec.features)
      val fList = (0 until 64).map { j =>
        s"((('0x' || substr(md5(content || '_$j'), 1, 7))::BIGINT % 1000)" +
          "::DOUBLE / 1024.0)"
      }.mkString(",\n|    ")
      val baseE =
        s"""$mediaSql,
           |e AS (
           |  SELECT media_id AS vec_id, [$fList] AS v FROM media)"""
          .stripMargin
      graft.ops.Similarity.annTopkSqlFor(baseE, 10, 5)
    },

    "m10_context_budget" ->
      s"""WITH ${tokSqlCtes(Seq(16))}
         |SELECT format, count(*) AS n_items,
         |  CAST(sum(text_toks) AS BIGINT) AS text_tokens,
         |  CAST(sum(media_toks) AS BIGINT) AS media_tokens,
         |  round(CAST(sum(media_toks) AS DOUBLE)
         |    / CAST(sum(media_toks) + sum(text_toks) AS DOUBLE), 6)
         |    AS media_share,
         |  CAST(sum((text_toks + media_toks + ${CtxToks - 1})
         |    // $CtxToks) AS BIGINT) AS ctx_windows
         |FROM tok GROUP BY format ORDER BY format""".stripMargin,

    "m12_interleaved_pack" ->
      s"""WITH ${tokSqlCtes(Seq(16))},
         |d AS (
         |  SELECT media_id, format, media_id // $MediaShardDocs AS shard,
         |    text_toks, media_toks, text_toks + media_toks AS n_toks
         |  FROM tok),
         |c AS (
         |  SELECT *, sum(n_toks) OVER (PARTITION BY format, shard
         |    ORDER BY media_id ROWS BETWEEN UNBOUNDED PRECEDING AND
         |    CURRENT ROW) AS cum
         |  FROM d),
         |sh AS (
         |  SELECT format, shard, count(*) AS s_n,
         |    CAST(sum(text_toks) AS BIGINT) AS s_tt,
         |    CAST(sum(media_toks) AS BIGINT) AS s_mt,
         |    CAST((sum(n_toks) + ${CtxToks - 1}) // $CtxToks AS BIGINT)
         |      AS s_win,
         |    CAST(sum(CASE WHEN n_toks > 0 AND
         |        (cum - n_toks) // $CtxToks <> (cum - 1) // $CtxToks
         |      THEN 1 ELSE 0 END) AS BIGINT) AS s_splits,
         |    CAST(((sum(n_toks) + ${CtxToks - 1}) // $CtxToks) * $CtxToks
         |      - sum(n_toks) AS BIGINT) AS s_pad
         |  FROM c GROUP BY format, shard)
         |SELECT format,
         |  CAST(sum(s_n) AS BIGINT) AS n_samples,
         |  CAST(sum(s_tt) AS BIGINT) AS text_tokens,
         |  CAST(sum(s_mt) AS BIGINT) AS media_tokens,
         |  CAST(sum(s_win) AS BIGINT) AS n_windows,
         |  CAST(sum(s_splits) AS BIGINT) AS n_split_samples,
         |  CAST(sum(s_pad) AS BIGINT) AS tail_pad
         |FROM sh GROUP BY format ORDER BY format""".stripMargin,

    "m13_patch_budget_curve" ->
      s"""WITH ${tokSqlCtes(PatchSweep)}
         |SELECT patch_px, format, count(*) AS n_items,
         |  CAST(sum(media_toks) AS BIGINT) AS media_tokens,
         |  CAST(sum(media_toks) // count(*) AS BIGINT) AS toks_per_item,
         |  round(CAST(sum(media_toks) AS DOUBLE)
         |    / CAST(sum(media_toks) + sum(text_toks) AS DOUBLE), 6)
         |    AS media_share,
         |  CAST(sum((text_toks + media_toks + ${CtxToks - 1})
         |    // $CtxToks) AS BIGINT) AS ctx_windows
         |FROM tok GROUP BY patch_px, format
         |ORDER BY patch_px, format""".stripMargin,

    "m09_frame_sample_plan" ->
      s"""WITH $mediaSql,
         |v AS (
         |  SELECT media_id, CAST(strlen(content) AS BIGINT) AS blen,
         |    CAST(media_id % 2 * 6 + 24 AS BIGINT) AS fps
         |  FROM media WHERE format = 'mp4' AND strlen(content) > 0),
         |f AS (SELECT *, (blen * 40 * fps) // 1000 AS n_frames FROM v),
         |s AS (
         |  SELECT media_id, blen, fps, n_frames,
         |    CAST(i AS BIGINT) AS frame_idx
         |  FROM f, unnest(range(0, n_frames, fps)) AS t(i)
         |  WHERE n_frames >= 1)
         |SELECT media_id,
         |  frame_idx // fps AS sample_ord,
         |  frame_idx,
         |  (frame_idx * 1000) // fps AS ts_ms,
         |  frame_idx % (fps * 10) = 0 AS keyframe,
         |  (frame_idx * blen) // n_frames AS prefetch_off,
         |  least(256, blen - (frame_idx * blen) // n_frames)
         |    AS prefetch_len,
         |  n_frames
         |FROM s ORDER BY media_id, frame_idx""".stripMargin,

    "m06_chunk_plan" ->
      s"""WITH $mediaSql,
         |chunks AS (
         |  SELECT media_id, CAST(i AS BIGINT) AS chunk_idx,
         |    substr(content, CAST(i AS INT) * 256 + 1, 256) AS chunk
         |  FROM media,
         |    unnest(range(0, CAST(floor((strlen(content) - 1) / 256)
         |      AS BIGINT) + 1)) AS t(i)
         |  WHERE strlen(content) > 0)
         |SELECT media_id, chunk_idx, chunk_idx * 256 + 1 AS off,
         |  CAST(strlen(chunk) AS BIGINT) AS chunk_len,
         |  md5(chunk) AS chunk_md5
         |FROM chunks ORDER BY media_id, chunk_idx""".stripMargin,

    "m07_media_shard_plan" ->
      s"""WITH $mediaSql,
         |b AS (
         |  SELECT media_id, format, content,
         |    CAST(strlen(content) AS BIGINT) AS nbytes
         |  FROM media WHERE strlen(content) > 0),
         |c AS (
         |  SELECT *, sum(nbytes) OVER (
         |    PARTITION BY format ORDER BY media_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM b)
         |SELECT format,
         |  CAST((cum - nbytes) // $MediaShardBytes AS BIGINT) AS shard,
         |  count(*) AS n_media,
         |  CAST(sum(nbytes) AS BIGINT) AS shard_bytes,
         |  min(media_id) AS first_id, max(media_id) AS last_id,
         |  md5(string_agg(md5(content), ',' ORDER BY media_id))
         |    AS shard_md5,
         |  CAST(sum(nbytes) AS BIGINT) > $MediaShardBytes AS overflow
         |FROM c
         |GROUP BY format, CAST((cum - nbytes) // $MediaShardBytes AS BIGINT)
         |ORDER BY format, shard""".stripMargin,

    "m01_media_catalog" ->
      s"""WITH $mediaSql
         |SELECT format, count(*) AS n_media,
         |  CAST(sum(strlen(content)) AS BIGINT) AS total_bytes,
         |  round(avg(width * height), 2) AS avg_pixels,
         |  max(width) AS max_width
         |FROM media GROUP BY format ORDER BY format""".stripMargin,

    "m02_feature_extract" -> {
      val fCols = (0 until FakeCodec.NFeatures).map { j =>
        s"((('0x' || substr(md5(content || '_$j'), 1, 7))::BIGINT % 1000)" +
          s"::DOUBLE / 1024.0) AS f$j"
      }.mkString(", ")
      s"""WITH $mediaSql
         |SELECT media_id, $fCols
         |FROM media WHERE media_id < 100 ORDER BY media_id""".stripMargin
    },

    "m03_frame_sample" ->
      s"""WITH $mediaSql,
         |frames AS (
         |  SELECT media_id, CAST(i AS INT) AS idx,
         |    substr(content, CAST(i AS INT) * 32 + 1, 32) AS frame
         |  FROM media,
         |    unnest(range(0, greatest(
         |      CAST(floor((length(content) - 1) / 32) AS BIGINT), 0)
         |      + 1, 4)) AS t(i)
         |  WHERE format = 'mp4')
         |SELECT media_id,
         |  CAST(idx / 4 AS INT) AS frame_no, md5(frame) AS frame_fp
         |FROM frames ORDER BY media_id, frame_no""".stripMargin,

    "m04_thumbnail_plan" ->
      s"""WITH $mediaSql
         |SELECT media_id, format,
         |  CAST(greatest(floor(width / 2), 16) AS INT) AS thumb_w,
         |  CAST(greatest(floor(height / 2), 16) AS INT) AS thumb_h,
         |  md5(content || '_' ||
         |      CAST(greatest(floor(width / 2), 16) AS INT) || 'x' ||
         |      CAST(greatest(floor(height / 2), 16) AS INT)) AS thumb_key
         |FROM media WHERE format IN ('png', 'jpeg')
         |ORDER BY media_id""".stripMargin,

    "m08_contrastive_pairs" -> {
      val bits = (0 until FakeCodec.NFeatures).map { j =>
        s"CASE WHEN ('0x' || substr(md5(content || '_$j'), 1, 7))::BIGINT" +
          " % 1000 >= 500 THEN '1' ELSE '0' END"
      }.mkString(" || ")
      s"""WITH $mediaSql,
         |sig AS (
         |  SELECT media_id,
         |    coalesce(md5(content), 'null-' || media_id) AS fp,
         |    $bits AS ph FROM media),
         |n AS (SELECT count(*) AS n_media FROM media),
         |draws AS (
         |  SELECT m.media_id AS doc_id, k.k,
         |    ('0x' || substr(md5(CAST(m.media_id AS VARCHAR) || ':' ||
         |        CAST(k.k AS VARCHAR)), 1, 8))::BIGINT % n.n_media AS draw,
         |    n.n_media
         |  FROM media m
         |  CROSS JOIN (SELECT unnest([0, 1]) AS k) k CROSS JOIN n),
         |d2 AS (
         |  SELECT doc_id, k,
         |    CASE WHEN draw = doc_id THEN (draw + 1) % n_media
         |         ELSE draw END AS neg_media_id
         |  FROM draws)
         |SELECT d2.doc_id, d2.k, d2.neg_media_id,
         |  (p.fp = q.fp OR p.ph = q.ph) AS excluded,
         |  CASE WHEN p.fp = q.fp THEN 'exact_twin'
         |       WHEN p.ph = q.ph THEN 'phash_twin'
         |       ELSE 'none' END AS reason
         |FROM d2 JOIN sig p ON d2.doc_id = p.media_id
         |JOIN sig q ON d2.neg_media_id = q.media_id
         |ORDER BY doc_id, k""".stripMargin
    },

    "m05_media_dedup" -> {
      val bits = (0 until FakeCodec.NFeatures).map { j =>
        s"CASE WHEN ('0x' || substr(md5(content || '_$j'), 1, 7))::BIGINT" +
          " % 1000 >= 500 THEN '1' ELSE '0' END"
      }.mkString(" || ")
      s"""WITH $mediaSql,
         |base AS (
         |  SELECT format,
         |    coalesce(md5(content), 'null-' || media_id) AS fp,
         |    $bits AS ph FROM media),
         |buckets AS (
         |  SELECT format, ph, count(*) AS bc
         |  FROM base GROUP BY format, ph),
         |perfmt AS (
         |  SELECT format, CAST(sum(bc) AS BIGINT) AS n_media,
         |    count(*) AS n_ph_buckets, max(bc) AS max_ph_bucket
         |  FROM buckets GROUP BY format),
         |contents AS (
         |  SELECT format, count(DISTINCT fp) AS n_distinct
         |  FROM base GROUP BY format),
         |members AS (SELECT DISTINCT format, ph, fp FROM base),
         |cands AS (
         |  SELECT format, count(*) AS n_near_cands FROM (
         |    SELECT format, fp,
         |      min(fp) OVER (PARTITION BY format, ph) AS hub
         |    FROM members) WHERE fp <> hub GROUP BY format)
         |SELECT p.format, n_media, n_distinct,
         |  n_media - n_distinct AS n_exact_dups,
         |  n_ph_buckets, max_ph_bucket,
         |  coalesce(n_near_cands, 0) AS n_near_cands
         |FROM perfmt p JOIN contents c ON p.format = c.format
         |LEFT JOIN cands ca ON p.format = ca.format
         |ORDER BY p.format""".stripMargin
    })
}
