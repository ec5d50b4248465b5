package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table carries binary payload with cycling kinds") {
    val media = Multimodal.mediaTable(spark, sfDir).collect()
    assert(media.length == 500)
    media.foreach { r =>
      assert(Seq("image", "audio", "video").contains(r.kind))
      assert(r.kind == Seq("image", "audio", "video")((r.media_id % 3).toInt))
      assert(r.payload.nonEmpty)
    }
  }

  test("partition-batched decode is deterministic and byte-derived") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val decoded = Multimodal.decodeAll(media).collect().map(d => d.media_id -> d).toMap
    val raw = media.collect().map(m => m.media_id -> m).toMap
    assert(decoded.keySet == raw.keySet)
    decoded.values.foreach { d =>
      val payload = raw(d.media_id).payload
      assert(d.n_bytes == payload.length.toLong)
      assert(d.width == 16 * (1 + (payload(0) & 0xff) % 64))
      assert(d.height == 16 * (1 + (payload(1) & 0xff) % 64))
      if (d.kind != "video") assert(d.n_frames == 1)
      assert(d.payload_sha.length == 16)
    }
    // decode twice -> identical (stub is deterministic)
    val again = Multimodal.decodeAll(media).collect().map(d => d.media_id -> d).toMap
    assert(again == decoded)
  }

  test("feature extraction yields unit-normalized fixed-width vectors") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val feats = Multimodal.extractFeatures(media, bins = 16).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0) < 1e-9, f.media_id)
      assert(f.features.forall(_ >= 0.0))
    }
    // deterministic
    val again = Multimodal.extractFeatures(media, bins = 16).collect()
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("resize bounds payloads to the target scale") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val orig = media.collect().map(m => m.media_id -> m.payload.length).toMap
    val small = Multimodal.resize(media, targetWidth = 64).collect()
    small.foreach { r =>
      assert(r.payload.length <= orig(r.media_id))
      assert(r.payload.nonEmpty)
      // prefix subsample: content is a prefix of the original
      val d = Multimodal.FakeCodec.decode(r)
      assert(d.n_bytes == r.payload.length.toLong)
    }
  }

  test("frame sampling keeps every stride-th chunk") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val frames = Multimodal.frameSample(media, stride = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(frames.nonEmpty)
    assert(frames.forall { case (_, frameNo, _) => frameNo % 2 == 0 })
    val raw = media.collect().map(m => m.media_id -> m.payload.length).toMap
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val expected = (0 until (raw(id) + 1023) / 1024).count(_ % 2 == 0)
      assert(fs.length == expected, s"media $id")
    }
  }

  test("phash ≡ independent recompute; identical payloads collide; bit flips track edits") {
    // independent reference: slice-based functional recompute of the
    // 64 span means — shares the span-bounds CONTRACT with the codec
    // but none of its accumulation code
    def ref(payload: Array[Byte]): Long = {
      if (payload.isEmpty) return 0L
      val cells = (0 until 64).map { i =>
        val s = (i.toLong * payload.length / 64).toInt
        val e = ((i + 1).toLong * payload.length / 64).toInt
        val span = payload.slice(s, e).map(_ & 0xff)
        if (span.isEmpty) 0.0 else span.sum.toDouble / span.length
      }
      val mean = cells.sum / 64.0
      cells.zipWithIndex.foldLeft(0L) { case (h, (c, i)) =>
        if (c > mean) h | (1L << i) else h
      }
    }
    val payloads = Multimodal.mediaTable(spark, sfDir).collect().map(_.payload) ++
      Seq(Array.empty[Byte], Array[Byte](0), Array.fill[Byte](4096)(42))
    payloads.foreach { p =>
      assert(Multimodal.FakeCodec.phash(p) == ref(p))
    }
    // identical payloads always collide at Hamming 0
    val a = "shared payload bytes".getBytes("UTF-8")
    assert(Multimodal.FakeCodec.phash(a) == Multimodal.FakeCodec.phash(a.clone()))
  }

  test("phash dedup banding ≡ brute-force Hamming scan (complete by pigeonhole)") {
    // 4 bands × 16 bits: any pair within Hamming ≤ 3 differs in at most
    // 3 bands, so at least one band matches exactly — candidate recall
    // for the verify step is 1.0 BY CONSTRUCTION, and the query's dup
    // set must equal the all-pairs scan exactly
    val hashed = Multimodal.mediaTable(spark, sfDir).collect()
      .map(r => r.media_id -> Multimodal.FakeCodec.phash(r.payload))
    val brute = (for {
      (i1, h1) <- hashed; (i2, h2) <- hashed
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield Seq(i1, i2)).flatten.toSet
    val got = Multimodal.phashDedup(spark, sfDir).collect()
      .filter(_.getLong(2) == 1L).map(_.getLong(0)).toSet
    assert(got == brute, "banded dup set must equal the brute-force Hamming scan")
  }

  test("phash dedup flags planted exact and near-dup payloads, not clean ones") {
    val dir = java.nio.file.Files.createTempDirectory("phash").toString
    // VARIED content (mixed case + digits), not repeated boilerplate:
    // repetitive text puts every span mean at the global mean, where
    // any perturbation flips many bits — the degenerate fixture the
    // first draft of this test tripped on
    val rnd = new scala.util.Random(7)
    val words = ("alpha bravo Charlie DELTA echo foxtrot 1234 golf HOTEL " +
      "india juliet kilo lima MIKE november oscar 9876 papa QUEBEC romeo " +
      "sierra tango uniform victor WHISKEY xray yankee zulu 42").split(" ")
    val base = Seq.fill(150)(words(rnd.nextInt(words.length))).mkString(" ")
    // the aHash-survivable edit is IN-PLACE (local cell perturbation);
    // a length change shifts every span boundary — the 1-D analog of
    // cropping, which average-hashing famously does not survive
    val edited = base.substring(0, 100) + ("Z" * 15) + base.substring(115)
    val rows = Seq(
      (0L, base), (1L, base), (2L, edited),
      (3L, "completely different content about catalyst query planners " +
        "and the physical operators they choose under adaptive execution"),
      (4L, "yet another unrelated document on parquet footer statistics"))
    import spark.implicits._
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val flags = Multimodal.phashDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(flags(0L) == 1L && flags(1L) == 1L, "exact payload copies must flag")
    assert(flags(2L) == 1L, "in-place-edited payload must flag")
    assert(flags(3L) == 0L && flags(4L) == 0L, "unrelated payloads must not flag")
  }

  test("embedMedia ≡ driver-side span-mean encode; embedAnnTopK scores are true cosines") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sfDir).collect()
      .map(r => r.media_id -> r.payload).toMap
    // embedding kernel ≡ driver recompute (same span-mean + unit-norm)
    val got = Multimodal.embedMedia(Multimodal.mediaTable(spark, sfDir))
      .collect().map(e => e.media_id -> e.embedding.toSeq).toMap
    media.foreach { case (id, payload) =>
      assert(got(id) == Multimodal.spanEmbed(payload).toSeq, s"media $id")
    }
    // unit norm for non-empty payloads (the encoder contract the ANN
    // cosine relies on)
    got.values.foreach { e =>
      val n = math.sqrt(e.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9 || n == 0.0)
    }
    // every returned top-k score is the exact cosine of the two stub
    // embeddings, recomputed driver-side
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val topk = Multimodal.embedAnnTopK(spark, sfDir, numQueries = 5, topK = 3).collect()
    assert(topk.nonEmpty)
    topk.foreach { r =>
      val expected = BigDecimal(cos(got(r.getLong(0)), got(r.getLong(1))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - expected) < 1e-9,
        s"(${r.getLong(0)},${r.getLong(1)})")
    }
    // ranks are dense 1..k per query with the declared tie-break
    topk.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length))
    }
  }

  test("binaryFile ingest round-trips payload bytes and feeds the codec chain") {
    val dir = java.nio.file.Files.createTempDirectory("media-lake")
    val files = Map(
      "cat.jpg" -> Array[Byte](1, 2, 3, 4, 5),
      "song.mp3" -> "audio bytes here".getBytes("UTF-8"),
      "clip.mp4" -> Array.tabulate(2048)(i => (i % 251).toByte),
      "notes.bin" -> "opaque".getBytes("UTF-8"))
    files.foreach { case (name, bytes) =>
      java.nio.file.Files.write(dir.resolve(name), bytes)
    }
    // camera-style UPPERCASE extension must classify, not fall through
    java.nio.file.Files.write(dir.resolve("photo.JPG"),
      Array[Byte](9, 9, 9))
    val media = Multimodal.mediaFromFiles(spark, dir.toString).collect()
    assert(media.length == 5)
    assert(media.count(_.kind == "image") == 2, "JPG (uppercase) must be image")
    val mediaLower = media.filterNot(r =>
      java.util.Arrays.equals(r.payload, Array[Byte](9, 9, 9)))
    assert(mediaLower.length == 4)
    // payload bytes round-trip exactly; kind derives from extension
    val byKind = mediaLower.map(r => r.kind -> r.payload).toMap
    assert(java.util.Arrays.equals(byKind("image"), files("cat.jpg")))
    assert(java.util.Arrays.equals(byKind("audio"), files("song.mp3")))
    assert(java.util.Arrays.equals(byKind("video"), files("clip.mp4")))
    assert(java.util.Arrays.equals(byKind("binary"), files("notes.bin")))
    // deterministic ids: same directory, same ids
    val again = Multimodal.mediaFromFiles(spark, dir.toString).collect()
    assert(media.map(_.media_id).sorted.sameElements(again.map(_.media_id).sorted))
    // file-ingested media runs the same decode + hash chain
    val decoded = Multimodal.decodeAll(
      Multimodal.mediaFromFiles(spark, dir.toString)).collect()
    assert(decoded.length == 5)
    decoded.foreach(d => assert(d.n_bytes > 0))
    mediaLower.foreach(r =>
      assert(Multimodal.FakeCodec.phash(r.payload) ==
        Multimodal.FakeCodec.phash(files.values.find(
          java.util.Arrays.equals(_, r.payload)).get)))
  }
}
