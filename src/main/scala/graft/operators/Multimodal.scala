package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder prompt): media as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted in
  * partition-local batches.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked DETERMINISTIC STUB ([[FakeCodec]]); everything Spark-
  * side — binary schema, partition-batched decode shape, metadata
  * struct, pushdown-friendly projections — is real and tested. On a
  * real cluster the stub body is replaced by a JNI/codec call; the plan
  * shape (mapPartitions over binary, no shuffle) is unchanged, which is
  * what matters at 100 TB: decode is pure map-side work that scales
  * with executors and never touches the driver.
  */
object Multimodal {

  /** One media row: payload + typed metadata, the schema a media lake
    * table would carry. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class DecodedRow(media_id: Long, kind: String, n_bytes: Long,
                              width: Int, height: Int, n_frames: Int,
                              payload_sha: String)

  /** ======= STUB ======= Deterministic fake codec: derives "decoded"
    * properties purely from payload bytes. Replace `decode` with a real
    * codec (e.g. libjpeg/ffmpeg via JNI) in production — signature and
    * batch shape stay identical. */
  object FakeCodec extends Serializable {
    /** Header-derived dimension rule — the single source of truth
      * shared by decode, resize, and the mm_media_meta oracle. */
    def dimOf(headerByte: Int): Int = 16 * (1 + headerByte % 64)

    def decode(r: MediaRow): DecodedRow = {
      val n = r.payload.length
      val b0 = if (n > 0) r.payload(0) & 0xff else 0
      val b1 = if (n > 1) r.payload(1) & 0xff else 0
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(r.payload).take(8).map("%02x".format(_)).mkString
      DecodedRow(r.media_id, r.kind, n.toLong,
        width = dimOf(b0), height = dimOf(b1),
        n_frames = if (r.kind == "video") 1 + n % 300 else 1,
        payload_sha = sha)
    }

    /** STUB perceptual hash — aHash's exact structure over the raw
      * payload: "downscale" to 64 cells (the mean byte value of 64
      * equal spans — the 1-D analog of aHash's 8×8 pixel grid), bit i
      * set iff cell i exceeds the global cell mean. A real pipeline
      * computes the cells from decoded pixels (or the DCT, for pHash
      * proper); the bit-vector contract downstream is identical:
      * similar payloads ⟹ small Hamming distance, identical payloads
      * ⟹ identical hash.
      *
      * POSITIONAL cells matter for banding health: a first cut used a
      * global byte HISTOGRAM, and natural-language payloads share
      * letter frequencies corpus-wide, so hashes collapsed onto a few
      * values, band buckets went quadratic, and the sf0.1 query took
      * 17 s. Span means vary with each document's content, so the
      * hash space spreads and bucket sizes stay near-uniform — the
      * same diversity argument real image pHashes rely on. */
    def phash(payload: Array[Byte]): Long = {
      val n = payload.length
      if (n == 0) return 0L
      val cell = new Array[Double](64)
      var i = 0
      while (i < 64) {
        val s = (i.toLong * n / 64).toInt
        val e = ((i + 1).toLong * n / 64).toInt
        var sum = 0L
        var j = s
        while (j < e) { sum += payload(j) & 0xff; j += 1 }
        cell(i) = if (e > s) sum.toDouble / (e - s) else 0.0
        i += 1
      }
      val mean = cell.sum / 64.0
      var h = 0L
      i = 0
      while (i < 64) { if (cell(i) > mean) h |= (1L << i); i += 1 }
      h
    }
  }

  /** Synthesize a media table from `documents` (no binary fixture table
    * exists): payload = UTF-8 bytes of text, kind cycles image/audio/
    * video. Deterministic, schema-faithful. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("kind"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Ingest a DIRECTORY of raw media files as [[MediaRow]]s via
    * Spark's built-in `binaryFile` source — the real media-lake
    * landing shape (one object per file; payload/path/length come
    * from the source, kind derives from the extension; pass
    * `pathGlobFilter`/`recursiveFileLookup` options for selective or
    * nested layouts). media_id is the path hash: deterministic across
    * runs, no driver-side numbering. Everything downstream
    * ([[decodeAll]], [[extractFeatures]], [[phashDedup]]'s hash) is
    * source-agnostic, so the synthetic table and a real file lake
    * share every operator. */
  def mediaFromFiles(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    s.read.format("binaryFile").load(dir)
      .select(xxhash64($"path").as("media_id"),
        lower(element_at(split($"path", "\\."), -1)).as("ext"),
        $"content".as("payload"))
      .withColumn("kind",
        when($"ext".isin("jpg", "jpeg", "png", "gif"), "image")
          .when($"ext".isin("wav", "mp3", "flac"), "audio")
          .when($"ext".isin("mp4", "webm", "mkv"), "video")
          .otherwise("binary"))
      .select($"media_id", $"kind", $"payload").as[MediaRow]
  }

  /** Partition-batched decode: the Scala twin of a `mapInPandas` batch
    * UDF — one codec instance per partition, streaming through rows
    * without materializing the partition. */
  def decodeAll(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(FakeCodec.decode) }
  }

  final case class MediaFeatures(media_id: Long, kind: String,
                                 features: Array[Double])

  /** Feature extraction: payload → fixed-width feature vector, one
    * codec instance per partition. The STUB computes a 16-bin byte
    * histogram (deterministic, unit-normalized); a real pipeline swaps
    * in an image/audio encoder producing an embedding — identical
    * signature, identical plan (map-side, fixed output width, ready
    * for the ANN operators downstream). */
  def extractFeatures(media: Dataset[MediaRow], bins: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val hist = new Array[Double](bins)
        r.payload.foreach(b => hist((b & 0xff) * bins / 256) += 1.0)
        val n = math.max(r.payload.length, 1).toDouble
        MediaFeatures(r.media_id, r.kind, hist.map(_ / n))
      }
    }
  }

  /** STUB media encoder: payload → unit-normalized `dim`-cell span-mean
    * vector (the real-valued generalization of [[FakeCodec.phash]]'s
    * positional cells, so embeddings vary with content and the cosine
    * geometry is non-degenerate). A real pipeline swaps in a CLIP-style
    * encoder — identical signature (map-side, fixed width, unit norm),
    * identical plan. Zero-byte payloads embed as the zero vector. */
  private[graft] def spanEmbed(payload: Array[Byte], dim: Int = 64): Array[Double] = {
    val n = payload.length
    val cell = new Array[Double](dim)
    if (n == 0) return cell
    var i = 0
    while (i < dim) {
      val s = (i.toLong * n / dim).toInt
      val e = ((i + 1).toLong * n / dim).toInt
      var sum = 0L
      var j = s
      while (j < e) { sum += payload(j) & 0xff; j += 1 }
      cell(i) = if (e > s) sum.toDouble / (e - s) else 0.0
      i += 1
    }
    val norm = math.sqrt(cell.map(x => x * x).sum)
    if (norm == 0.0) cell else cell.map(_ / norm)
  }

  final case class MediaEmbedding(media_id: Long, embedding: Array[Double])

  /** Media → embedding column: the bridge from the multimodal plumbing
    * into the ANN family (map-side, fixed width — the exact frame the
    * Similarity operators consume). */
  def embedMedia(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => MediaEmbedding(r.media_id, spanEmbed(r.payload, dim))))
  }

  /** Embedding-similarity search OVER MEDIA (`mm_embed_ann`) — the
    * cross-family composition a multimodal lake actually runs:
    * stub-encode every payload ([[spanEmbed]]), then exact cosine
    * top-k with the fused [[graft.functions.CosineSim]] kernel, the
    * same brute-force shape as `ann_brute_topk` (broadcast bounded
    * probes, WindowGroupLimit rank prune). At scale the shortlist/
    * bucketing variants (LSH/IVF/PQ/MRL) slot in unchanged — the
    * embedding column is the contract. Rows-only in the driver
    * contract (the stub encoder isn't ANSI-expressible); gated in
    * MultimodalSpec: kernel scores ≡ driver-side encode + cosine. */
  def embedAnnTopK(s: SparkSession, dir: String, dim: Int = 64,
                   numQueries: Int = 10, topK: Int = 5): DataFrame = {
    import s.implicits._
    val emb = embedMedia(mediaTable(s, dir), dim).toDF()
    // probes filter BEFORE the encode map: only probe payloads are
    // encoded twice, and the id bound pushes through the projection to
    // the scan itself — which is also what lets the registry-wide
    // broadcast guard PROVE this side bounded (a filter above the
    // typed mapPartitions boundary breaks attribute lineage to the
    // scan, so the guard would reject it)
    val queries = embedMedia(
        mediaTable(s, dir).filter($"media_id" < numQueries), dim).toDF()
      .select($"media_id".as("query_id"), $"embedding".as("q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos_sim".desc, $"media_id")
    emb.join(broadcast(queries), $"media_id" =!= $"query_id")
      .select($"query_id", $"media_id",
        round(graft.functions.VectorFunctions.cosineSim($"q", $"embedding"), 6)
          .as("cos_sim"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= topK)
      .select($"query_id", $"media_id", $"cos_sim", $"rk")
      .orderBy($"query_id", $"rk")
  }

  /** Resize: re-target the fake decode dimensions and subsample the
    * payload proportionally (STUB for a real scaler — the plan shape,
    * a pure map with bounded output size, is what carries over). Reads
    * only the header byte it needs (a real scaler parses the header,
    * not the whole payload — running the full decode incl. a payload
    * SHA per row just to learn the width is the wasteful shape). */
  def resize(media: Dataset[MediaRow], targetWidth: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val b0 = if (r.payload.length > 0) r.payload(0) & 0xff else 0
      val width = FakeCodec.dimOf(b0) // header-only, no full decode
      val scale = math.min(targetWidth.toDouble / width, 1.0)
      val keep = math.max((r.payload.length * scale).toInt, 1)
      r.copy(payload = r.payload.take(keep))
    }
  }

  /** Oracle-checkable [[resize]] summary — runs the REAL partition-
    * batched resize (header-byte width read, proportional payload
    * subsample) and reports the kept byte count per media. The stub's
    * arithmetic is closed-form (width = 16·(1 + b0 mod 64), kept =
    * min(max(⌊n·min(target/width, 1)⌋, 1), n)), so DuckDB verifies the
    * typed mapPartitions pipeline end-to-end from the same source
    * column — the mm_frame_sample discipline applied to resize. */
  def resizeSummary(s: SparkSession, dir: String, targetWidth: Int = 64): DataFrame = {
    import s.implicits._
    resize(mediaTable(s, dir), targetWidth)
      .map(r => (r.media_id, r.kind, r.payload.length.toLong))
      .toDF("media_id", "kind", "kept_bytes")
      .orderBy($"media_id")
  }

  /** Frame sampling: keep every `stride`-th 1 KiB chunk of the payload
    * — the plan shape of video frame-sampling (explode to frames,
    * filter by stride, re-group) with the stub codec. */
  def frameSample(media: Dataset[MediaRow], stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(1024).zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 =>
          (r.media_id, i, chunk.length)
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Oracle-checkable frame-sampling summary: per media, the number of
    * kept frames and total bytes kept by [[frameSample]] (stride-4 over
    * 1 KiB chunks). The chunk arithmetic is closed-form, so DuckDB can
    * verify the real mapPartitions pipeline end-to-end: kept frames =
    * ceil(ceil(n/1024) / 4), kept bytes = 1024·(kept-1) + size of the
    * last kept chunk (short iff it is the payload's final chunk). */
  def frameSampleSummary(s: SparkSession, dir: String, stride: Int = 4): DataFrame = {
    import s.implicits._
    frameSample(mediaTable(s, dir), stride)
      .groupBy($"media_id")
      .agg(count(lit(1)).as("n_frames_kept"),
        sum($"frame_bytes").as("bytes_kept"))
      .orderBy($"media_id")
  }

  /** Perceptual-hash near-duplicate detection over the media table —
    * the image-dedup stage of a multimodal pipeline: decode →
    * 64-bit average-hash ([[FakeCodec.phash]], STUB histogram in
    * place of decoded pixels) in the partition-batched codec pass,
    * then Hamming≤`maxHamming` partners via the SAME 16-bit pigeonhole
    * banding as the text-side `dd_simhash` (4 bands of 16 bits: any
    * pair within Hamming 3 shares at least one intact band — candidate
    * generation is a bucket equi-join, never all-pairs, exactly the
    * 100 TB shape). Emits one row per media with its hash and a dup
    * flag, so identical payloads (Hamming 0) always flag. Rows-only
    * in the driver contract (the hash lives behind the codec
    * boundary); MultimodalSpec pins the hash against an independent
    * recompute and the banding against a brute-force Hamming scan
    * (complete by pigeonhole). */
  def phashDedup(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    import s.implicits._
    // 4 bands of 16 bits are pigeonhole-complete ONLY for Hamming ≤ 3;
    // a larger radius would silently lose pairs that differ in every band
    require(maxHamming <= 3, s"4x16-bit banding is complete only for maxHamming <= 3, got $maxHamming")
    val hashed = mediaTable(s, dir)
      .mapPartitions(it => it.map(r => (r.media_id, FakeCodec.phash(r.payload))))
      .toDF("media_id", "phash")
    val banded = hashed.select($"media_id", $"phash",
      posexplode(array((0 until 4).map(b =>
        shiftright($"phash", b * 16).bitwiseAND(0xffffL)): _*)).as(Seq("band", "chunk")))
    val dupIds = banded.as("x").join(banded.as("y"), Seq("band", "chunk"))
      .where($"x.media_id" < $"y.media_id")
      .select($"x.media_id".as("id1"), $"y.media_id".as("id2"),
        $"x.phash".as("h1"), $"y.phash".as("h2"))
      .distinct()
      .filter(bit_count($"h1".bitwiseXOR($"h2")) <= maxHamming)
      .select(explode(array($"id1", $"id2")).as("media_id")).distinct()
    hashed.join(dupIds.withColumn("dup", lit(1L)), Seq("media_id"), "left")
      .select($"media_id", $"phash", coalesce($"dup", lit(0L)).as("is_dup"))
      .orderBy($"media_id")
  }

  /** Oracle-checkable projection of the binary plumbing: byte length +
    * first-byte-derived fake dimensions, all expressible on the SQL
    * side from the same source column. */
  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("kind"),
        length(encode($"text", "UTF-8")).cast("long").as("n_bytes"),
        (lit(16) * (lit(1) + ascii($"text") % 64)).cast("long").as("fake_width"))
      .orderBy($"media_id")
  }
}
