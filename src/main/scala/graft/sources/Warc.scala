package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/WET ingestion — the web crawl's landing container, and the
  * reference domain's real-world source shape: the Go engine word
  * counts Gutenberg text files (`main.go:25,130`), a production
  * crawl pipeline word counts WET extractions. WET is Common
  * Crawl's extracted-text member of the WARC/1.0 family (ISO
  * 28500): a `warcinfo` header record, then one `conversion` record
  * per page whose body is the page's plain text — exactly the
  * `documents` table in container form, which is why `src_warc`
  * can share a FULL DuckDB oracle with it.
  *
  * Scale shape: a crawl lands as many shard files; the scan
  * parallelizes ACROSS shards (binaryFile, one task per file), and
  * record parsing is one linear pass per shard, map-side, no
  * shuffle. The `.warc.gz` convention compresses EVERY RECORD AS
  * ITS OWN GZIP MEMBER (Common Crawl's layout — the reason a cdx
  * index entry's (offset, length) can be range-read and inflated
  * without touching the rest of the file). [[parseWarcGzParallel]]
  * makes that splittability executed code, the JPEG-restart /
  * FLAC-frame pattern applied to the crawl container: member
  * candidates are located by a byte scan, inflated CONCURRENTLY,
  * and a chain walk keeps exactly the members that tile the file —
  * gated bit-identical to the sequential path. */
/** The session's Hadoop `Configuration`, carried to executors.
  * `Configuration` is not `Serializable`, so task closures that open
  * a `FileSystem` (the crawl sink, the cdx range-read fetch) would
  * otherwise default-construct one on the executor — and on any
  * cluster whose target FS needs session conf (object-store
  * credentials, `fs.defaultFS`) the write would fail or land on the
  * wrong filesystem. Java-serialization hooks delegate to
  * `Configuration.write`/`readFields` (the standard pattern — Spark's
  * own equivalent is `private[spark]`). Each task deserializes its
  * own copy, so no cross-task sharing of the non-thread-safe conf. */
final class SerializableHadoopConf(
    @transient private var conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}

object Warc {

  /** One parsed record: WARC headers (original case-insensitive
    * names lower-cased) + raw body bytes. */
  final case class WarcRecord(headers: Map[String, String], body: Array[Byte])

  private val CRLF = "\r\n"

  /** Serialize WARC/1.0 records: for each (headers, body), the
    * version line, the given headers, a byte-exact Content-Length,
    * the body, and the spec's closing blank CRLF pair. The shared
    * record grammar under [[encodeWet]] / [[encodeRawWarc]], public
    * so tests can plant record types the fixture encoders never
    * emit (`request`/`revisit`/`metadata`, `WARC-Truncated`). */
  def encodeRecords(records: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    records.foreach { case (headers, body) =>
      out.write(s"WARC/1.0$CRLF".getBytes("US-ASCII"))
      headers.foreach { case (k, v) => out.write(s"$k: $v$CRLF".getBytes("US-ASCII")) }
      out.write(s"Content-Length: ${body.length}$CRLF$CRLF".getBytes("US-ASCII"))
      out.write(body, 0, body.length)
      out.write(s"$CRLF$CRLF".getBytes("US-ASCII"))
    }
    out.toByteArray
  }

  /** `sha1:<RFC 4648 base32>` of the payload — the digest convention
    * Common Crawl stamps on every record (ISO 28500 §5.9, the
    * `WARC-Payload-Digest` value grammar). SHA-1 is 160 bits ⇒
    * exactly 32 base32 characters, no padding. */
  def payloadDigest(body: Array[Byte]): String = {
    val sha = java.security.MessageDigest.getInstance("SHA-1").digest(body)
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder(38)
    sb.append("sha1:")
    var acc = 0L; var nbits = 0
    sha.foreach { b =>
      acc = (acc << 8) | (b & 0xff); nbits += 8
      while (nbits >= 5) { nbits -= 5; sb.append(alphabet(((acc >> nbits) & 31).toInt)) }
    }
    sb.toString
  }

  /** Deterministic WET-style bytes for (id, uri, text) docs: one
    * `warcinfo` record then one `conversion` record per doc, CRLF
    * headers, Content-Length in BYTES of the UTF-8 body, a
    * `WARC-Payload-Digest` over those bytes (the CC convention —
    * verified on ingest), records separated by a blank CRLF pair
    * per the spec. */
  def encodeWet(docs: Seq[(Long, String, String)]): Array[Byte] =
    encodeRecords(wetRecords(docs).toSeq)

  /** The WET record stream behind [[encodeWet]], one (headers, body)
    * at a time — the per-member form [[writeCrawlLake]] streams so a
    * write task's peak memory is one record, not its whole shard. */
  private def wetRecords(
      docs: Seq[(Long, String, String)]): Iterator[(Seq[(String, String)], Array[Byte])] = {
    val info = "software: graft-wet-fixture/1.0\r\nformat: WARC File Format 1.0\r\n"
      .getBytes("UTF-8")
    Iterator.single(Seq(
        "WARC-Type" -> "warcinfo",
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000000>",
        "Content-Type" -> "application/warc-fields") -> info) ++
      docs.iterator.map { case (id, uri, text) =>
        val body = text.getBytes("UTF-8")
        Seq(
          "WARC-Type" -> "conversion",
          "WARC-Target-URI" -> uri,
          "WARC-Date" -> "2026-01-01T00:00:00Z",
          "WARC-Record-ID" -> f"<urn:uuid:00000000-0000-0000-0000-${id}%012d>",
          "WARC-Payload-Digest" -> payloadDigest(body),
          "Content-Type" -> "text/plain") -> body
      }
  }

  /** `.warc.gz` the way crawls actually ship it: EVERY record its
    * own gzip member, members concatenated — so a (offset, length)
    * range read inflates independently. `java.util.zip` emits one
    * member per record here; readers that treat the file as a single
    * stream still work because GZIPInputStream walks concatenated
    * members. */
  def gzipPerRecord(warc: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(warc.length / 2 + 64)
    recordSlices(warc).foreach { case (off, len) =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(warc, off, len)
      gz.close() // finish the member AND free the deflater (BAOS close is a no-op)
    }
    out.toByteArray
  }

  /** (offset, length) of each record's bytes inside a plain WARC —
    * header block through the trailing blank pair. Used by the
    * per-record gzip writer and by tests that pin member
    * independence. Throws on malformation (fixture-side helper). */
  private def recordSlices(warc: Array[Byte]): Seq[(Int, Int)] = {
    val slices = Seq.newBuilder[(Int, Int)]
    var pos = 0
    while (pos < warc.length) {
      val start = pos
      val (headers, bodyStart) = parseHeaderBlock(warc, pos)
      val len = headers.getOrElse("content-length",
        throw new IllegalArgumentException("missing Content-Length")).toInt
      pos = bodyStart + len
      require(pos + 4 <= warc.length && warc(pos) == '\r' && warc(pos + 1) == '\n' &&
        warc(pos + 2) == '\r' && warc(pos + 3) == '\n', "record must end with CRLF CRLF")
      pos += 4
      slices += ((start, pos - start))
    }
    slices.result()
  }

  /** Header block at `pos`: version line + `Name: value` lines up to
    * the blank CRLF. Returns (lower-cased headers, body offset).
    * Throws IllegalArgumentException on any malformation — callers
    * that need totality catch at the file boundary. */
  private def parseHeaderBlock(b: Array[Byte], pos: Int): (Map[String, String], Int) = {
    def lineEnd(from: Int): Int = {
      var p = from
      while (p + 1 < b.length && !(b(p) == '\r' && b(p + 1) == '\n')) p += 1
      require(p + 1 < b.length, "unterminated header line")
      p
    }
    var p = lineEnd(pos)
    val version = new String(b, pos, p - pos, "US-ASCII")
    require(version == "WARC/1.0" || version == "WARC/1.1", s"bad version line '$version'")
    p += 2
    val headers = Map.newBuilder[String, String]
    while (!(p + 1 < b.length && b(p) == '\r' && b(p + 1) == '\n')) {
      val e = lineEnd(p)
      val line = new String(b, p, e - p, "UTF-8")
      val colon = line.indexOf(':')
      require(colon > 0, s"malformed header line '$line'")
      headers += line.substring(0, colon).trim.toLowerCase -> line.substring(colon + 1).trim
      p = e + 2
    }
    (headers.result(), p + 2)
  }

  /** Strict sequential parse of a plain WARC byte array into records.
    * Content-Length is authoritative (the spec's rule — bodies are
    * binary-safe); every record must close with CRLF CRLF and the
    * file must end exactly at a record boundary. Throws on
    * malformation. */
  def parseWarc(b: Array[Byte]): Vector[WarcRecord] = {
    val records = Vector.newBuilder[WarcRecord]
    var pos = 0
    while (pos < b.length) {
      val (headers, bodyStart) = parseHeaderBlock(b, pos)
      val lenStr = headers.getOrElse("content-length",
        throw new IllegalArgumentException("missing Content-Length"))
      val len = lenStr.toLong
      require(len >= 0 && bodyStart + len + 4 <= b.length, s"Content-Length $len overruns file")
      val end = bodyStart + len.toInt
      require(b(end) == '\r' && b(end + 1) == '\n' && b(end + 2) == '\r' && b(end + 3) == '\n',
        "record must end with CRLF CRLF")
      records += WarcRecord(headers, java.util.Arrays.copyOfRange(b, bodyStart, end))
      pos = end + 4
    }
    records.result()
  }

  /** Inflate a whole `.warc.gz` (GZIPInputStream walks concatenated
    * members) then [[parseWarc]]. The 2³⁰ output ceiling guards the
    * decompression-bomb shape (the codec output-ceiling precedent);
    * a crawl shard is hundreds of MB compressed, ~1 GB inflated. */
  def parseWarcGz(b: Array[Byte]): Vector[WarcRecord] =
    parseWarc(gunzipAll(b, 1 << 30))

  /** Sniff-dispatching parse: gzip magic → member walk, else plain. */
  def parseWarcAuto(b: Array[Byte]): Vector[WarcRecord] =
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) parseWarcGz(b)
    else parseWarc(b)

  private def gunzipAll(b: Array[Byte], ceiling: Int): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b), 1 << 16)
    val out = new java.io.ByteArrayOutputStream(math.min(b.length.toLong * 4, 1 << 20).toInt)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      require(out.size() <= ceiling, s"inflated size exceeds the $ceiling ceiling")
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** Deflate a whole payload in either `Content-Encoding: deflate`
    * framing (fixture side): zlib-wrapped (RFC 1950, the spec's
    * meaning) or the bare RFC 1951 stream confused servers ship —
    * both arms of [[inflateWhole]]'s sniff. */
  private def deflateWhole(b: Array[Byte], zlibWrap: Boolean): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, !zlibWrap)
    d.setInput(b)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val buf = new Array[Byte](1 << 14)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Single-member gzip of a whole payload — the HTTP
    * `Content-Encoding: gzip` body shape (one member per entity,
    * unlike the per-RECORD members of the container itself). */
  private def gzipWhole(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(b)
    gz.close()
    out.toByteArray
  }

  /** Segment-parallel `.warc.gz` decode — the cdx-splittability
    * claim as executed code (the JPEG-restart / FLAC-frame pattern):
    * scan for gzip member magics (1f 8b 08), inflate every candidate
    * CONCURRENTLY as a single member (an Inflater stops at its
    * member's end, reporting how many input bytes it consumed), then
    * chain-walk from offset 0 keeping exactly the members that tile
    * the file. False candidates (magic bytes inside compressed data)
    * inflate to garbage or fail — either way the chain never visits
    * them, because member ends are authoritative. Falls back to the
    * strict sequential walk when the bytes are not a clean member
    * chain, when a magic spray floods the candidate scan, or when
    * cumulative RETAINED inflated bytes across in-flight candidates
    * pass `retainedBudget` (the decodeFlacParallel size-bound
    * precedent — without it, overlapping high-ratio candidates could
    * hold cands × 1 GiB before the chain walk prunes them). */
  def parseWarcGzParallel(b: Array[Byte], retainedBudget: Long = 1L << 31): Vector[WarcRecord] = {
    val cands = scala.collection.mutable.ArrayBuffer[Int]()
    var p = 0
    while (p + 2 < b.length) {
      if ((b(p) & 0xff) == 0x1f && (b(p + 1) & 0xff) == 0x8b && (b(p + 2) & 0xff) == 0x08)
        cands += p
      p += 1
    }
    // flood guard (the FLAC precedent): a crafted every-offset magic
    // spray routes to the sequential path rather than N² inflates
    if (cands.isEmpty || cands.length > (b.length >> 6) + 64) return parseWarcGz(b)
    // (inflated bytes, input bytes consumed) per candidate; null = failed
    val results = new Array[(Array[Byte], Int)](cands.length)
    // retained-size budget: successful candidates keep their inflated
    // bytes until the chain walk; failures refund their count. A
    // budget trip aborts every remaining inflate and defers to the
    // sequential walk (whose own 2³⁰ ceiling is authoritative).
    val retained = new java.util.concurrent.atomic.AtomicLong(0)
    val aborted = new java.util.concurrent.atomic.AtomicBoolean(false)
    def one(i: Int): Unit =
      results(i) =
        if (aborted.get) null
        else inflateMember(b, cands(i), retained, retainedBudget, aborted)
    val idx = new java.util.concurrent.atomic.AtomicInteger(0)
    val nThreads = math.min(Runtime.getRuntime.availableProcessors(), cands.length)
    val threads = Array.tabulate(nThreads) { _ =>
      new Thread(() => {
        var i = idx.getAndIncrement()
        while (i < cands.length) { one(i); i = idx.getAndIncrement() }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    if (aborted.get) return parseWarcGz(b)
    // chain walk: members must tile [0, length) exactly
    val byOffset = cands.zipWithIndex.toMap
    val out = new java.io.ByteArrayOutputStream(
      math.min(b.length.toLong * 2, 1 << 30).toInt) // clamped hint: *2 overflows Int past 1 GiB
    var pos = 0
    while (pos < b.length) {
      val i = byOffset.getOrElse(pos, -1)
      if (i < 0 || results(i) == null) return parseWarcGz(b) // not a clean chain
      out.write(results(i)._1, 0, results(i)._1.length)
      if (out.size() > (1 << 30)) return parseWarcGz(b) // ceiling: defer to the strict path
      pos += results(i)._2
    }
    parseWarc(out.toByteArray)
  }

  /** Inflate exactly ONE gzip member starting at `off`: returns
    * (inflated bytes, total input bytes consumed including the
    * 10-byte header and 8-byte trailer), or null if the bytes do not
    * form a complete valid member. Hand-walks the member header
    * (java.util.zip has no single-member cursor API), then raw
    * deflate via Inflater(nowrap), then CRC32+ISIZE trailer
    * verification — a member that lies about either is rejected.
    * Inflated bytes are charged against the caller's shared
    * `retained` budget as they materialize; a failed candidate
    * refunds its charge, a budget trip sets `aborted` for every
    * sibling. */
  private def inflateMember(b: Array[Byte], off: Int,
      retained: java.util.concurrent.atomic.AtomicLong, retainedBudget: Long,
      aborted: java.util.concurrent.atomic.AtomicBoolean): (Array[Byte], Int) = {
    var charged = 0L
    def refund(): Null = { retained.addAndGet(-charged); null }
    try {
      if (off + 10 > b.length) return null
      if ((b(off) & 0xff) != 0x1f || (b(off + 1) & 0xff) != 0x8b ||
          (b(off + 2) & 0xff) != 0x08) return null
      val flg = b(off + 3) & 0xff
      if ((flg & 0xe0) != 0) return null // reserved bits must be zero
      var p = off + 10
      if ((flg & 0x04) != 0) { // FEXTRA
        if (p + 2 > b.length) return null
        val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 0x08) != 0) { while (p < b.length && b(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 0x10) != 0) { while (p < b.length && b(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 0x02) != 0) p += 2 // FHCRC
      if (p >= b.length) return null
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(b, p, b.length - p)
      val out = new java.io.ByteArrayOutputStream(1 << 12)
      val buf = new Array[Byte](1 << 14)
      while (!inf.finished()) {
        if (aborted.get) { inf.end(); return refund() }
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) { inf.end(); return refund() }
        out.write(buf, 0, n)
        charged += n
        if (retained.addAndGet(n) > retainedBudget) {
          aborted.set(true); inf.end(); return refund()
        }
        if (out.size() > (1 << 30)) { inf.end(); return refund() }
      }
      val consumed = p + (b.length - p - inf.getRemaining)
      inf.end()
      val data = out.toByteArray
      if (consumed + 8 > b.length) return refund()
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      def u32(q: Int): Long = (b(q) & 0xffL) | ((b(q + 1) & 0xffL) << 8) |
        ((b(q + 2) & 0xffL) << 16) | ((b(q + 3) & 0xffL) << 24)
      if (u32(consumed) != crc.getValue) return refund()
      if (u32(consumed + 4) != (data.length.toLong & 0xffffffffL)) return refund()
      (data, consumed + 8 - off)
    } catch {
      case _: Exception => refund()
    }
  }

  // ------------------------------------------------------------ query

  /** The shared sharded-lake writer under [[writeWetLake]] /
    * [[rawLakeDir]] / [[revisitLakeDir]]: one hash Exchange routes
    * (doc_id, text) rows to `nShards` tasks, each task sorts its
    * docs and writes exactly ONE shard file — the shard-naming and
    * collision-avoidance invariants live here once. The caller
    * supplies the shard's RECORD STREAM; each record is encoded and
    * gzipped as its own member STRAIGHT TO the shard's output stream
    * (r16 verdict note: the one-shot whole-shard encode held the
    * shard's bytes in memory twice — per-member streaming caps the
    * task's encode buffer at one record), producing byte-identical
    * shards to the one-shot form since per-record members are
    * independent by construction. */
  private def writeCrawlLake(df: DataFrame, out: String, nShards: Int,
      prefix: String,
      records: Seq[(Long, String)] => Iterator[(Seq[(String, String)], Array[Byte])]): Unit = {
    val s = df.sparkSession
    import s.implicits._
    // capture the SESSION Hadoop conf on the driver (credentials,
    // fs.defaultFS, scheme impls) — a default-constructed executor
    // conf would miss all of it on a real cluster
    val hadoopConf = new SerializableHadoopConf(s.sparkContext.hadoopConfiguration)
    df.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .repartition(nShards, col("doc_id"))
      .foreachPartition { (it: Iterator[(Long, String)]) =>
        // shard file named by PARTITION id (unique by construction —
        // naming by a doc-derived value could collide two tasks on
        // one filename and silently overwrite a shard); callers that
        // append batches distinguish them via `prefix`
        val docs = it.toSeq.sortBy(_._1)
        if (docs.nonEmpty) {
          val shard = org.apache.spark.TaskContext.getPartitionId()
          val path = new org.apache.hadoop.fs.Path(out, f"$prefix%s-$shard%05d.warc.gz")
          // newInstance, NOT the process-wide FileSystem cache:
          // setWriteChecksum on the cached instance would silently
          // disable .crc sidecars for every OTHER Hadoop write in
          // the JVM (streaming checkpoint logs included)
          val fs = org.apache.hadoop.fs.FileSystem.newInstance(
            path.toUri, hadoopConf.value)
          try {
            fs.setWriteChecksum(false) // a lake of shards, not shards + .crc sidecars
            val os = fs.create(path, true) // overwrite: task retries fully replace partials
            try {
              // close-shielded view of the shard stream: each member's
              // GZIPOutputStream.close() must finish the member AND
              // free its Deflater without closing the shard itself
              val shield = new java.io.FilterOutputStream(os) {
                override def write(b: Array[Byte], off: Int, len: Int): Unit =
                  os.write(b, off, len)
                override def close(): Unit = flush()
              }
              records(docs).foreach { rec =>
                val gz = new java.util.zip.GZIPOutputStream(shield)
                val bytes = encodeRecords(Seq(rec))
                gz.write(bytes, 0, bytes.length)
                gz.close()
              }
            } finally os.close()
          } finally fs.close()
        }
      }
  }

  /** O9-family crawl-container SINK: write (doc_id, text) rows as a
    * sharded WET `.warc.gz` lake — per-record gzip members (the
    * Common Crawl layout), rows routed to `nShards` shard files by
    * hash(doc_id) and sorted by doc_id inside each shard. One hash
    * Exchange then a map-side write: each task owns exactly one
    * shard file, the reference's `mr-out-<bucket>` layout
    * (worker.go:225-239) at crawl-container grain. Files go through
    * the Hadoop FileSystem API with the SESSION's Hadoop conf
    * carried to the write tasks ([[SerializableHadoopConf]]), so
    * `out` may be any supported scheme — local path here, HDFS or an
    * object store whose credentials live in the session conf on a
    * cluster. */
  def writeWetLake(df: DataFrame, out: String, nShards: Int,
                   prefix: String = "wet"): Unit =
    writeCrawlLake(df, out, nShards, prefix,
      docs => wetRecords(docs.map { case (id, text) => (id, docUri(id), text) }))

  /** Session-scoped staging of the documents table as a sharded WET
    * crawl via [[writeWetLake]]. Test scaffolding under the same
    * local-master guard as the media lake — a production crawl
    * already sits in object storage. Cache key includes `nShards`
    * so two callers asking for different layouts never share a
    * lake. */
  private val wetLakeDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def wetLakeDir(s: SparkSession, dir: String, nShards: Int = 8): String =
    wetLakeDirs.computeIfAbsent(s"$dir#$nShards", _ => {
      require(s.sparkContext.isLocal,
        "wetLakeDir stages fixture files and requires a local master; " +
          "production crawls are read directly via srcWarcDocs on their own paths")
      val out = java.nio.file.Files.createTempDirectory("graft-wet-lake").toString
      // the staged lake ALSO plants a `metadata` record for docs
      // ≡ 4 (mod 9) (r18, the raw lake's non-200/truncated/request
      // rule applied to WET): real WET files interleave warcinfo /
      // conversion / metadata members, and every consumer's
      // conversion-only filter — the document ingests, the cdx
      // builder (a metadata member is walked and tiled but never
      // indexed), the streaming ingest — is absence-visible through
      // seven shared oracles. The SINK lakes stay pure
      // ([[writeWetLake]] unchanged): their byte-identity gates
      // compare against encodeWet's exact output.
      writeCrawlLake(graft.Tables.documents(s, dir).select(col("doc_id"), col("text")),
        out, nShards, "wet",
        docs => wetRecords(docs.map { case (id, text) => (id, docUri(id), text) }) ++
          docs.iterator.filter(_._1 % 9 == 4).map { case (id, _) =>
            Seq(
              "WARC-Type" -> "metadata",
              "WARC-Target-URI" -> docUri(id),
              "WARC-Date" -> "2026-01-01T00:00:00Z",
              "WARC-Concurrent-To" -> f"<urn:uuid:00000000-0000-0000-0000-${id}%012d>",
              "Content-Type" -> "application/warc-fields") ->
              s"fetchTimeMs: ${10 + id % 90}\r\ncharset-detected: utf-8\r\n".getBytes("US-ASCII")
          })
      out
    })

  /** The fixture URI rule — mirrored closed-form by the oracle. */
  def docUri(id: Long): String = s"https://example.org/doc/$id"

  /** The raw crawl's id-keyed SECOND PARAGRAPH (r18, the r17
    * verdict's top item): the `documents` fixture contains no
    * newlines at all, so without this arm the multi-block wrap —
    * and with it [[extractText]]'s block-separator flush, the
    * highest-traffic extraction path — would never occur in any
    * oracle query. Even doc_ids get a constant appendix paragraph
    * appended after a newline; [[htmlWrap]] splits there into two
    * `<p>` blocks and the extractor's lazy join reconstructs the
    * two-paragraph page exactly. CONSTANT (not id-derived) so
    * duplicate texts stay duplicates under the prep pipeline's
    * digest dedup. Mirrored closed-form by the src_warc_html /
    * src_warc_wat / pipe_crawl_e2e oracles (the snk_wet_roundtrip
    * transformed-corpus precedent). */
  val crawlAppendix = "Crawl appendix: a second fixture paragraph."

  /** The raw-crawl page text for a doc — the transform the oracles
    * rebuild: `text || chr(10) || appendix` on even ids. */
  def crawlPageText(id: Long, text: String): String =
    if (id % 2 == 0) text + "\n" + crawlAppendix else text

  /** NON-200 capture records for the staged raw lake (r18, the r17
    * verdict's #2): real crawls are ~15-25% non-200, and until this
    * arm the fixture envelope was always `200 OK` — so the ingest's
    * status filter and WAT's status column were exercised by exactly
    * one value. Id-keyed: docs ≡ 3 (mod 10) also get a 404 re-fetch
    * of the SAME target URI (a page that vanished between two crawl
    * visits — body `gone`, text/plain), docs ≡ 8 (mod 10) a 301 with
    * a Location and an empty body. Both are COUNTED by `src_warc_wat`
    * (status finally polymorphic, rows closed-form in the id cycle)
    * and EXCLUDED by the document ingests (the 2xx filter becomes
    * oracle-visible: if it broke, src_warc_html would emit extra rows
    * and hash-mismatch). Two more planted shapes are excluded by
    * EVERY reader and therefore absence-visible through every crawl
    * oracle: docs ≡ 5 (mod 10) a `WARC-Truncated` capture whose body
    * is an envelope PREFIX (the header, not the stump, must drive the
    * skip), and docs ≡ 0 (mod 10, nonzero) the paired `request`
    * record real raw crawls store next to each response. */
  /** The windows-1252 envelope arm (r18, the r17 verdict's #3): docs
    * ≡ 1 (mod 4) whose page text is pure ASCII declare
    * `charset=windows-1252` and encode the page in it. The arm's
    * title is `fixturÃ©` — chosen because its windows-1252 bytes
    * (`C3 A9`) are ALSO valid UTF-8 (for `é`, ONE code point where
    * windows-1252 reads TWO), so a decoder that ignored the declared
    * charset and fell back to UTF-8 would count one fewer code point
    * and hash-mismatch `src_warc_wat`'s entity_chars — the declared-
    * charset decode is genuinely oracle-visible, not just a column
    * value. Pure-ASCII gate because ASCII page bytes are identical
    * in both encodings (extraction stays byte-exact under the shared
    * oracle) and because the gate itself is closed-form in SQL:
    * `strlen(text) = length(text)` (UTF-8 gives one byte per char
    * exactly for code points < 128). */
  val win1252Title = "fixturÃ©" // U+00C3 U+00A9: windows-1252 bytes C3 A9

  def isWin1252Arm(id: Long, pageText: String): Boolean =
    id % 4 == 1 && pageText.forall(_ < 128)

  private def non200Records(
      docs: Seq[(Long, String)]): Iterator[(Seq[(String, String)], Array[Byte])] =
    docs.iterator.flatMap { case (id, _) =>
      def record(http: String, body: Array[Byte]) =
        Seq(
          "WARC-Type" -> "response",
          "WARC-Target-URI" -> docUri(id),
          "WARC-Date" -> "2026-01-02T00:00:00Z",
          "Content-Type" -> "application/http; msgtype=response") ->
          (http.getBytes("US-ASCII") ++ body)
      if (id % 10 == 3) {
        val body = "gone".getBytes("US-ASCII")
        Iterator.single(record(
          s"HTTP/1.1 404 Not Found${CRLF}Content-Type: text/plain$CRLF" +
            s"Content-Length: ${body.length}$CRLF$CRLF", body))
      } else if (id % 10 == 8)
        Iterator.single(record(
          s"HTTP/1.1 301 Moved Permanently${CRLF}Location: https://example.org/moved/$id$CRLF" +
            s"Content-Length: 0$CRLF$CRLF", Array.empty[Byte]))
      else if (id % 10 == 5)
        // a TRUNCATED capture (ISO 28500 §5.13): the fetch was cut
        // short, the stored body is a PREFIX of an envelope — every
        // reader must skip on the header, not try to decode the stump.
        // Absence-visible: if the warc-truncated filter broke, WAT and
        // the document ingests would emit rows for it and hash-mismatch
        Iterator.single((Seq(
          "WARC-Type" -> "response",
          "WARC-Target-URI" -> docUri(id),
          "WARC-Date" -> "2026-01-02T00:00:00Z",
          "WARC-Truncated" -> "length",
          "Content-Type" -> "application/http; msgtype=response") ->
          s"HTTP/1.1 200 OK${CRLF}Content-Type: text".getBytes("US-ASCII")))
      else if (id % 10 == 0 && id > 0)
        // the paired REQUEST record real raw crawls store next to each
        // response (CC's request member) — not a capture, excluded by
        // the response filter in WAT and the ingests, absence-visible
        // the same way
        Iterator.single((Seq(
          "WARC-Type" -> "request",
          "WARC-Target-URI" -> docUri(id),
          "WARC-Date" -> "2026-01-01T00:00:00Z",
          "Content-Type" -> "application/http; msgtype=request") ->
          (s"GET /doc/$id HTTP/1.1${CRLF}Host: example.org${CRLF}" +
            s"User-Agent: graftbot$CRLF$CRLF").getBytes("US-ASCII")))
      else Iterator.empty
    }

  /** `snk_wet_roundtrip`: the sink proven on NON-fixture content —
    * a filtered + transformed corpus (even doc_ids, a deterministic
    * suffix appended) written through [[writeWetLake]] and read
    * back through the same ingest as `src_warc`. The oracle rebuilds
    * the transform in SQL, so a divergence anywhere in
    * encode→gzip→write→scan→parse is a hash mismatch — and because
    * the content differs from the staged fixture lake, the sink
    * cannot pass by accidentally reading `src_warc`'s files. */
  def snkWetRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = wetLakeDirs.computeIfAbsent(s"$dir#snk", _ => {
      require(s.sparkContext.isLocal,
        "snkWetRoundtrip stages fixture files and requires a local master")
      val o = java.nio.file.Files.createTempDirectory("graft-wet-sink").toString
      writeWetLake(
        graft.Tables.documents(s, dir)
          .filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), concat(col("text"), lit("\n-- sunk")).as("text")),
        o, 4)
      o
    })
    docsFromWarcFiles(s, out)
  }

  // --------------------------------------------- raw crawl (response)

  /** Deterministic RAW-crawl bytes for (id, uri, text) docs: one
    * `warcinfo` record then one `response` record per doc whose body
    * is a full HTTP/1.1 envelope (status line + headers + blank
    * line) around an HTML page wrapping the text — the shape a crawl
    * lands in BEFORE extraction (WET is its post-extraction twin).
    * The entity body cycles the six envelope shapes real crawls
    * are dominated by, keyed on doc id: identity, chunked
    * transfer-coding (with a chunk extension and a trailer field —
    * both legal and both ignored), gzip content-coding,
    * chunked-around-gzip (the layering RFC 9112 prescribes:
    * transfer-coding is removed first, content-coding second),
    * zlib-framed deflate (what the spec means by `deflate`), and
    * chunked-around-RAW-deflate (what confused servers actually
    * ship — the sniff's other arm). The
    * HTML wrap is LOSSLESS by construction ([[htmlWrap]] escapes
    * the three markup characters and adds structure-only tags), so
    * [[extractText]] inverts it exactly and the raw-crawl query can
    * share the WET query's oracle across ALL envelope shapes. */
  def encodeRawWarc(docs: Seq[(Long, String, String)]): Array[Byte] =
    encodeRecords(rawRecords(docs).toSeq)

  /** The raw-crawl record stream behind [[encodeRawWarc]] — the
    * per-member form the sharded writer streams. */
  private def rawRecords(
      docs: Seq[(Long, String, String)]): Iterator[(Seq[(String, String)], Array[Byte])] =
    Iterator.single(Seq(
        "WARC-Type" -> "warcinfo",
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "Content-Type" -> "application/warc-fields") ->
        "software: graft-warc-fixture/1.0\r\n".getBytes("UTF-8")) ++
      docs.iterator.map { case (id, uri, text) =>
        // the windows-1252 arm (r18): declared charset + page bytes
        // both switch; the title's C3 A9 makes a UTF-8 fallback
        // decode COUNT differently, so the arm is oracle-visible
        val win = isWin1252Arm(id, text)
        val pageCharset = if (win) "windows-1252" else "utf-8"
        val html = htmlWrap(text, if (win) win1252Title else "fixture")
          .getBytes(if (win) "windows-1252" else "UTF-8")
        val (bodyHeaders, entity) = (id % 6) match {
          case 0 => (s"Content-Length: ${html.length}$CRLF", html)
          case 1 =>
            (s"Transfer-Encoding: chunked$CRLF", chunkEncode(html, 13))
          case 2 =>
            val gz = gzipWhole(html)
            (s"Content-Encoding: gzip${CRLF}Content-Length: ${gz.length}$CRLF", gz)
          case 3 =>
            (s"Content-Encoding: gzip${CRLF}Transfer-Encoding: chunked$CRLF",
              chunkEncode(gzipWhole(html), 32))
          case 4 =>
            val df = deflateWhole(html, zlibWrap = true)
            (s"Content-Encoding: deflate${CRLF}Content-Length: ${df.length}$CRLF", df)
          case _ =>
            (s"Content-Encoding: deflate${CRLF}Transfer-Encoding: chunked$CRLF",
              chunkEncode(deflateWhole(html, zlibWrap = false), 21))
        }
        val http = (s"HTTP/1.1 200 OK$CRLF" +
          s"Content-Type: text/html; charset=$pageCharset$CRLF" +
          bodyHeaders + CRLF).getBytes("US-ASCII")
        Seq(
          "WARC-Type" -> "response",
          "WARC-Target-URI" -> uri,
          "WARC-Date" -> "2026-01-01T00:00:00Z",
          "Content-Type" -> "application/http; msgtype=response") -> (http ++ entity)
      }

  /** HTTP/1.1 chunked transfer-coding encoder (fixture side): hex
    * size lines, `chunkSize`-byte chunks, a chunk extension on the
    * first chunk and a trailer field after the last — the legal
    * decorations a strict decoder must ignore. */
  private def chunkEncode(payload: Array[Byte], chunkSize: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 64)
    var p = 0
    var first = true
    while (p < payload.length) {
      val n = math.min(chunkSize, payload.length - p)
      val ext = if (first) ";fixture=1" else ""
      out.write(f"$n%x$ext$CRLF".getBytes("US-ASCII"))
      out.write(payload, p, n)
      out.write(CRLF.getBytes("US-ASCII"))
      p += n
      first = false
    }
    out.write(s"0${CRLF}X-Fixture-Trailer: 1$CRLF$CRLF".getBytes("US-ASCII"))
    out.toByteArray
  }

  /** Decode an HTTP/1.1 response envelope over raw bytes: split the
    * head block at the first blank CRLF line, parse the status line
    * and lower-cased headers (repeated fields combine into one
    * comma-separated value per RFC 9110 §5.2 — last-wins would let a
    * second `Content-Encoding: identity` mask a first `gzip` and
    * ship compressed bytes through as document text), then undo
    * `Transfer-Encoding: chunked` framing and the `Content-Encoding`
    * chain in that order (RFC 9112 §6.1: transfer-codings are a
    * message property and come off first; content-codings are an
    * entity property, undone in reverse of the order applied).
    * Supported content-codings: gzip/x-gzip and deflate (both the
    * RFC 1950 zlib framing the spec means and the bare RFC 1951
    * stream real servers ship — sniffed). Returns (status code,
    * headers, entity bytes). Throws on malformation or any coding it
    * cannot fully undo — callers catch at the record boundary (the
    * quarantine contract). */
  def decodeHttpResponse(body: Array[Byte]): (Int, Map[String, String], Array[Byte]) = {
    var at = -1
    var p = 0
    while (at < 0 && p + 3 < body.length) {
      if (body(p) == '\r' && body(p + 1) == '\n' && body(p + 2) == '\r' && body(p + 3) == '\n')
        at = p
      else p += 1
    }
    require(at >= 0, "HTTP response has no header/entity blank line")
    val lines = new String(body, 0, at, "ISO-8859-1").split("\r\n", -1)
    val status = lines.head.split(" ")
    require(status.length >= 2 && status(0).startsWith("HTTP/"),
      s"bad HTTP status line '${lines.head}'")
    val code = status(1).toInt
    val headers = lines.tail.foldLeft(Map.empty[String, String]) { (m, l) =>
      val c = l.indexOf(':')
      require(c > 0, s"malformed HTTP header line '$l'")
      val k = l.substring(0, c).trim.toLowerCase
      val v = l.substring(c + 1).trim
      m.updated(k, m.get(k).fold(v)(_ + ", " + v))
    }
    // a coding list: comma-split, parameters after ';' dropped,
    // `identity` (a no-op by definition) filtered out
    def codings(header: String): List[String] =
      headers.get(header).toList
        .flatMap(_.toLowerCase.split(","))
        .map(_.split(";")(0).trim)
        .filter(c => c.nonEmpty && c != "identity")
    var entity = java.util.Arrays.copyOfRange(body, at + 4, body.length)
    codings("transfer-encoding") match {
      case Nil => ()
      case List("chunked") => entity = dechunk(entity)
      case other =>
        // `Transfer-Encoding: gzip, chunked` dechunked-only would pass
        // a still-TE-gzip'd body downstream as entity bytes — reject
        // the whole chain unless it is exactly `chunked`
        throw new IllegalArgumentException(
          s"unsupported transfer-encoding chain '${other.mkString(", ")}'")
    }
    codings("content-encoding").reverse.foreach {
      case "gzip" | "x-gzip" => entity = gunzipAll(entity, 1 << 30)
      case "deflate" => entity = inflateWhole(entity, 1 << 30)
      case other =>
        // br/zstd etc.: passing the still-compressed bytes through as
        // "decoded" would silently corrupt the corpus — throw so the
        // record SKIPS (the quarantine contract), never emits
        // mojibake as document text
        throw new IllegalArgumentException(s"unsupported content-encoding '$other'")
    }
    (code, headers, entity)
  }

  /** Undo `Content-Encoding: deflate` — the web's third coding,
    * shipped in BOTH framings (RFC 9110 §8.4.1.2 notes the long-lived
    * server confusion): the zlib wrapper the spec means (RFC 1950)
    * and the bare deflate stream (RFC 1951). Sniffed by the zlib
    * header contract — CM=8 in the low CMF nibble and
    * (CMF·256 + FLG) ≡ 0 (mod 31); a raw stream's first byte carries
    * BFINAL/BTYPE in its low bits and cannot satisfy both. Strict:
    * truncation, a preset-dictionary demand, or bytes after the
    * stream end all throw (→ record-level skip). */
  private def inflateWhole(b: Array[Byte], ceiling: Int): Array[Byte] = {
    val zlib = b.length >= 2 && (b(0) & 0x0f) == 8 &&
      ((((b(0) & 0xff) << 8) | (b(1) & 0xff)) % 31 == 0)
    val inf = new java.util.zip.Inflater(!zlib)
    inf.setInput(b)
    val out = new java.io.ByteArrayOutputStream(math.min(b.length.toLong * 4, 1 << 20).toInt)
    val buf = new Array[Byte](1 << 16)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(n > 0 || !(inf.needsInput() || inf.needsDictionary()),
          "truncated or dictionary-requiring deflate stream")
        out.write(buf, 0, n)
        require(out.size() <= ceiling, s"inflated size exceeds the $ceiling ceiling")
      }
      require(inf.getRemaining == 0, "trailing bytes after the deflate stream")
    } finally inf.end()
    out.toByteArray
  }

  /** Charset named by a Content-Type header value (`text/html;
    * charset=ISO-8859-1`), resolved through the JVM charset registry
    * — covers the web's legacy staples (latin-1, windows-1252) and
    * every UTF variant. UTF-8 when the parameter is absent, quoted
    * oddly, or names an unknown charset: the conservative crawl
    * default (HTML5's own fallback chain starts from the declared
    * value and lands on UTF-8-compatible handling for the ASCII
    * structure this extractor keys on). */
  def charsetOf(contentType: String): java.nio.charset.Charset =
    "(?i)charset=\"?([A-Za-z0-9._:\\-]+)\"?".r.findFirstMatchIn(contentType)
      .flatMap { m =>
        try Some(java.nio.charset.Charset.forName(m.group(1)))
        catch { case _: Exception => None }
      }
      .getOrElse(java.nio.charset.StandardCharsets.UTF_8)

  /** Undo HTTP/1.1 chunked framing (RFC 9112 §7.1): hex chunk-size
    * line (extensions after `;` ignored), chunk data, CRLF, repeated;
    * a zero-size chunk then optional trailer fields then a blank
    * line terminate. Strict: short chunks, missing CRLFs, bad hex or
    * trailing bytes all throw; cumulative output is ceiling-bounded
    * like every other inflate in this file. */
  def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(b.length, 1 << 16))
    var p = 0
    def line(): String = {
      val s = p
      while (p + 1 < b.length && !(b(p) == '\r' && b(p + 1) == '\n')) p += 1
      require(p + 1 < b.length, "unterminated chunk line")
      val l = new String(b, s, p - s, "ISO-8859-1")
      p += 2
      l
    }
    var done = false
    while (!done) {
      val l = line()
      val semi = l.indexOf(';')
      val sizeStr = (if (semi >= 0) l.substring(0, semi) else l).trim
      val size = Integer.parseInt(sizeStr, 16)
      require(size >= 0, s"negative chunk size in '$l'")
      if (size == 0) {
        var t = line() // zero or more trailer fields, then a blank line
        while (t.nonEmpty) t = line()
        done = true
      } else {
        require(p + size + 2 <= b.length, "chunk data overruns entity")
        require(out.size().toLong + size <= (1 << 30), "dechunked size exceeds ceiling")
        out.write(b, p, size)
        p += size
        require(b(p) == '\r' && b(p + 1) == '\n', "chunk data must end with CRLF")
        p += 2
      }
    }
    require(p == b.length, "trailing bytes after the final chunk")
    out.toByteArray
  }

  /** Escape `& < >` then wrap in structure-only boilerplate (head,
    * title, a nav block — the parts an extractor must DROP, not just
    * strip). Lossless: [[extractText]](htmlWrap(t)) == t for any t.
    *
    * MULTI-BLOCK (r17 verdict #1): real pages are multi-block, and a
    * single-block wrap never flushes [[extractText]]'s pending block
    * separator — so when the text contains an INTERIOR newline (one
    * with a non-empty prefix and suffix), the wrap splits at the
    * first such newline into TWO `<p>` blocks. The extractor's lazy
    * `\n` join then reconstructs the original exactly
    * (`<p>a</p><p>b</p>` → `a\nb`), which is what keeps the
    * src_warc_html / pipe_crawl_e2e oracles unchanged while the
    * separator path finally rides through them. A LEADING or
    * TRAILING newline cannot split (the join emits nothing for an
    * empty block — `a\n` would extract as `a`), so those stay
    * literal text inside a single block; losslessness holds for
    * every placement. Length contract (the src_warc_wat oracle's
    * arithmetic): a split removes the newline from content (+−1) and
    * adds `</p><p>` (+7), so wrapped length = 241 + escaped-length
    * + 6 iff an interior newline exists — spec-pinned next to the
    * 241 constant. */
  def htmlWrap(text: String, title: String = "fixture"): String = {
    def esc(t: String) =
      t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    // first INTERIOR newline: index in [1, length-2] — both blocks
    // must be non-empty for the extractor's join to re-insert it
    val nl = text.indexOf('\n', 1)
    val blocks =
      if (nl >= 1 && nl < text.length - 1)
        s"<p>${esc(text.substring(0, nl))}</p><p>${esc(text.substring(nl + 1))}</p>"
      else s"<p>${esc(text)}</p>"
    s"<!DOCTYPE html><html><head><title>$title</title>" +
      "<style>body { color: #000 }</style>" +
      "<script>var tracker = '<ignore me>';</script></head>" +
      "<body><nav><a href=\"/\">home</a></nav>" +
      s"<article>$blocks</article>" +
      "<footer>&copy; 2026</footer></body></html>"
  }

  /** HTML → text, the boilerplate-strip every training pipeline
    * runs: drops `script`/`style`/`nav`/`footer`/`header`/`aside`
    * subtrees wholesale (same-name nesting tracked, so an inner
    * `</nav>` cannot leak the outer nav's tail), strips remaining
    * tags, decodes the five standard entities (+ numeric), keeps
    * ONLY `article`/`main`/`section`/`p` content — deliberately the
    * conservative content-block heuristic (keep what is marked as
    * content) rather than a statistical one, so the transform is
    * deterministic and, on [[htmlWrap]] pages, exactly inverse.
    *
    * Real-crawl hardening (r16): comments scan to `-->` (a `>`
    * inside a comment never leaks its tail), CDATA sections skip to
    * `]]>`, quoted attribute values may contain `>` (the tag-end
    * scan honors `"`/`'` spans), `script`/`style` are RAWTEXT — only
    * their own case-insensitive close tag ends them, so markup-like
    * strings inside code never terminate an enclosing drop early —
    * self-closing tags touch no depth, an unpaired `<p>` is
    * implicitly closed by the next `<p>` (the HTML5 rule that keeps
    * keep-depth from drifting open), and a keep close pops through
    * any unclosed inner keeps. Malformed markup never throws:
    * unclosed constructs consume to end of input, stray `<` is
    * literal text.
    *
    * Block boundaries (r16 verdict #3): closing a keep block marks a
    * PENDING `\n` separator that is emitted lazily before the next
    * text — `<p>a</p><p>b</p>` extracts `a\nb`, adjacent paragraphs
    * never concatenate into one token and downstream token statistics
    * stay honest. Lazy (join semantics, not terminator semantics) so
    * no stray trailing newline is appended and the [[htmlWrap]]
    * inverse stays exact — and since r18 the wrap SPLITS at an
    * interior newline, so the separator path is exercised by the
    * crawl oracles themselves, not only by these fixtures. */
  def extractText(html: String): String = {
    val sb = new StringBuilder
    // set when a keep block closes; flushed as '\n' before the next
    // emitted text (never at the very start or end of the output)
    var pendingSep = false
    def emit(s: String): Unit = {
      if (pendingSep) { if (sb.nonEmpty) sb.append('\n'); pendingSep = false }
      sb.append(s)
    }
    val drop = Set("nav", "footer", "header", "aside", "head")
    val raw = Set("script", "style") // RAWTEXT elements, always dropped
    val keep = Set("article", "main", "section", "p")
    val keepStack = scala.collection.mutable.ArrayBuffer[String]()
    var dropName: String = null
    var dropDepth = 0
    var i = 0
    def inText: Boolean = dropName == null && keepStack.nonEmpty
    // (name, isClose, isSelfClose, index just past '>') — the tag-end
    // scan skips quoted attribute values, so href="x>y" never
    // truncates the tag
    def tagAt(j: Int): (String, Boolean, Boolean, Int) = {
      var p = j + 1
      var close = false
      if (p < html.length && html(p) == '/') { close = true; p += 1 }
      val start = p
      while (p < html.length && (html(p).isLetterOrDigit || html(p) == '!' || html(p) == '-')) p += 1
      val name = html.substring(start, p).toLowerCase
      var quote: Char = 0
      var prev: Char = 0
      while (p < html.length && (quote != 0 || html(p) != '>')) {
        val c = html(p)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') { quote = c; prev = 0 }
        else if (!c.isWhitespace) prev = c
        p += 1
      }
      val selfClose = prev == '/'
      (name, close, selfClose, if (p < html.length) p + 1 else html.length)
    }
    // RAWTEXT skip: consume through the matching `</name[\s/>]` close
    // tag (HTML5's rule — nothing else, including nested-looking
    // markup in string literals, can end a script/style element)
    def skipRawText(name: String, from: Int): Int = {
      var p = from
      while (p < html.length) {
        val q = html.indexOf("</", p)
        if (q < 0) return html.length
        val e = q + 2 + name.length
        if (e <= html.length && html.regionMatches(true, q + 2, name, 0, name.length) &&
            (e == html.length || html(e) == '>' || html(e) == '/' || html(e).isWhitespace)) {
          var r = e
          while (r < html.length && html(r) != '>') r += 1
          return if (r < html.length) r + 1 else html.length
        }
        p = q + 2
      }
      html.length
    }
    while (i < html.length) {
      val c = html(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) html.length else e + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) html.length else e + 3
        } else {
          val (name, close, selfClose, end) = tagAt(i)
          if (name.isEmpty) { if (inText) emit("<"); i += 1 }
          else {
            i = end
            if (raw.contains(name) && !close) {
              // HTML5 ignores a '/' on non-void start tags, so
              // <script src="x"/> OPENS a script element — treating
              // it as self-closing would leak the code as text
              i = skipRawText(name, i) // content + close tag consumed; never emitted
            } else if (dropName != null) {
              if (name == dropName) {
                if (close) { dropDepth -= 1; if (dropDepth == 0) dropName = null }
                else if (!selfClose) dropDepth += 1
              }
            } else if (drop.contains(name) && !close && !selfClose) {
              dropName = name; dropDepth = 1
            } else if (keep.contains(name)) {
              if (close) {
                val at = keepStack.lastIndexOf(name)
                if (at >= 0) {
                  keepStack.remove(at, keepStack.length - at)
                  pendingSep = true // a block ended: separate what follows
                }
              } else if (!selfClose) {
                if (name == "p" && keepStack.nonEmpty && keepStack.last == "p") {
                  keepStack.remove(keepStack.length - 1) // implicit </p> before <p>
                  pendingSep = true
                }
                keepStack += name
              }
            }
          }
        }
      } else if (c == '&' && inText) {
        val semi = html.indexOf(';', i)
        val ent = if (semi > i && semi - i <= 8) html.substring(i + 1, semi) else ""
        val dec = ent match {
          case "amp" => "&"; case "lt" => "<"; case "gt" => ">"
          case "quot" => "\""; case "apos" => "'"
          case e if e.startsWith("#") =>
            try new String(Character.toChars(
              if (e.startsWith("#x") || e.startsWith("#X")) Integer.parseInt(e.substring(2), 16)
              else Integer.parseInt(e.substring(1))))
            catch { case _: Exception => null }
          case _ => null
        }
        if (dec != null) { emit(dec); i = semi + 1 }
        else { emit("&"); i += 1 }
      } else {
        if (inText) emit(c.toString)
        i += 1
      }
    }
    sb.toString
  }

  /** `src_warc_html`: the RAW-crawl twin of [[srcWarcDocs]] — parse
    * `response` records, decode the HTTP envelope (status line,
    * headers, chunked/gzip entity codings — [[decodeHttpResponse]]),
    * keep 2xx responses only, run [[extractText]] over the HTML,
    * emit document rows. Shares the WET query's oracle because the
    * fixture wrap is lossless — divergence in container framing,
    * HTTP decoding OR extraction is a hash mismatch. */
  def srcWarcHtmlDocs(s: SparkSession, dir: String): DataFrame =
    htmlDocsFromWarcFiles(s, rawLakeDir(s, dir))

  /** The raw-crawl ingest body over ANY directory of `.warc`/
    * `.warc.gz` files — split from [[srcWarcHtmlDocs]] so tests can
    * point it at hand-staged lakes (corrupt shards, non-200
    * responses, truncated records, envelope edge cases). */
  def htmlDocsFromWarcFiles(s: SparkSession, lake: String): DataFrame = {
    import s.implicits._
    htmlDocRows(s, lake)
      .select($"doc_id", $"uri", length($"text").cast("long").as("n_chars"), $"text")
      .orderBy($"doc_id")
  }

  /** The un-ordered (doc_id, uri, text) rows of [[htmlDocsFromWarcFiles]]
    * — the composition entry: a downstream pipeline that immediately
    * shuffles (dedup window, aggregation) must not inherit the
    * registry query's contractual ORDER BY as a useless mid-plan
    * range Exchange. */
  def htmlDocRows(s: SparkSession, lake: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").load(lake)
      .select($"content")
      .as[Array[Byte]]
      .flatMap { bytes =>
        val rows = try {
          parseWarcAuto(bytes).iterator
            .filter(r => r.headers.get("warc-type").contains("response") &&
              !r.headers.contains("warc-truncated")) // a cut-short body is not a document
            .flatMap { r =>
              // RECORD-level totality: real crawls carry occasional
              // malformed envelopes — one must not cost its whole
              // shard (file-level quarantine stays for CONTAINER
              // malformation, via the outer catch)
              try {
                val uri = r.headers.getOrElse("warc-target-uri", "")
                val id = uri.substring(uri.lastIndexOf('/') + 1).toLong
                val (status, hh, entity) = decodeHttpResponse(r.body)
                // a 404 next to a 200 must not cost the 200 either
                if (status < 200 || status > 299) Iterator.empty
                else {
                  // honor the declared charset (legacy latin-1 /
                  // windows-1252 pages are a real crawl's long tail);
                  // UTF-8 when absent or unknown
                  val cs = charsetOf(hh.getOrElse("content-type", ""))
                  Iterator.single((id, uri, extractText(new String(entity, cs))))
                }
              } catch { case _: Exception => Iterator.empty }
            }
            .toVector
        } catch { case _: Exception => Vector.empty }
        rows.iterator
      }
      .toDF("doc_id", "uri", "text")
  }

  /** `src_warc_wat`: the crawl family's METADATA member — Common
    * Crawl ships WARC (raw capture) / WAT (per-record metadata) /
    * WET (extracted text), and with raw and WET covered read- and
    * write-side this is the remaining member's extraction verb: for
    * every intact `response` record, the envelope FACTS a crawl
    * audit reads — status, media type, declared charset, the coding
    * chain, header count, decoded entity size — WITHOUT keeping the
    * content. Same shard-grain map-side walk as the document
    * ingests (parse, decode, measure, drop the bytes); record-level
    * totality unchanged. Full oracle: every column is closed-form in
    * the fixture id (the six-shape envelope cycle) and the text —
    * decoded entity chars are the lossless wrap's escape arithmetic,
    * anchored by the boilerplate constant a spec pins against
    * `htmlWrap("")` so the SQL mirror cannot drift from the wrap. */
  def srcWarcWat(s: SparkSession, dir: String): DataFrame =
    watFromWarcFiles(s, rawLakeDir(s, dir))

  /** The metadata-extraction body over ANY directory of `.warc`/
    * `.warc.gz` files — split from [[srcWarcWat]] for hand-staged
    * lakes (the htmlDocsFromWarcFiles rule). */
  def watFromWarcFiles(s: SparkSession, lake: String): DataFrame = {
    import s.implicits._
    watRowsFromShardBytes(
        s.read.format("binaryFile").load(lake).select($"content").as[Array[Byte]])
      // status tiebreaks: a re-fetched target (the 404 arm) yields two
      // rows per doc_id, and the contractual order must be total
      .orderBy($"doc_id", $"status")
  }

  /** The envelope-facts walk over a relation of shard payloads — the
    * SHARED body of the batch extraction ([[watFromWarcFiles]]) and
    * its ingestion-time streaming twin (`src_stream_wat`), the
    * [[docRowsFromShardBytes]] rule: one walk, two deployments, no
    * way to diverge. Stateless per-shard flatMap, works unchanged
    * over a streaming Dataset. */
  def watRowsFromShardBytes(shards: org.apache.spark.sql.Dataset[Array[Byte]]): DataFrame = {
    val s = shards.sparkSession
    import s.implicits._
    shards
      .flatMap { bytes =>
        val rows = try {
          parseWarcAuto(bytes).iterator
            .filter(r => r.headers.get("warc-type").contains("response") &&
              !r.headers.contains("warc-truncated"))
            .flatMap { r =>
              try {
                val uri = r.headers.getOrElse("warc-target-uri", "")
                val id = uri.substring(uri.lastIndexOf('/') + 1).toLong
                val (status, hh, entity) = decodeHttpResponse(r.body)
                val ct = hh.getOrElse("content-type", "")
                val cs = charsetOf(ct)
                val text = new String(entity, cs)
                Iterator.single((id, uri, status.toLong,
                  ct.split(";")(0).trim,
                  cs.name,
                  hh.getOrElse("transfer-encoding", ""),
                  hh.getOrElse("content-encoding", ""),
                  hh.size.toLong,
                  // code points, not UTF-16 units — the unit DuckDB's
                  // length() counts
                  text.codePointCount(0, text.length).toLong))
              } catch { case _: Exception => Iterator.empty }
            }
            .toVector
        } catch { case _: Exception => Vector.empty }
        rows.iterator
      }
      .toDF("doc_id", "uri", "status", "media_type", "charset",
        "transfer_encoding", "content_encoding", "n_headers", "entity_chars")
  }

  private val rawLakeDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Raw-crawl staging twin of [[wetLakeDir]]: `response`-record
    * `.warc.gz` shards under the same local-master guard. Cache key
    * includes `nShards` (the wetLakeDir rule). */
  def rawLakeDir(s: SparkSession, dir: String, nShards: Int = 8): String =
    rawLakeDirs.computeIfAbsent(s"$dir#$nShards", _ => {
      require(s.sparkContext.isLocal,
        "rawLakeDir stages fixture files and requires a local master")
      val out = java.nio.file.Files.createTempDirectory("graft-raw-lake").toString
      writeCrawlLake(graft.Tables.documents(s, dir).select(col("doc_id"), col("text")),
        out, nShards, "crawl",
        // the staged lake applies the two-paragraph page transform
        // ([[crawlPageText]]) — a FIXTURE-content rule, so it lives at
        // the staging layer, not inside the pure [[encodeRawWarc]]
        // record encoder hand-staged spec lakes also go through
        docs => rawRecords(docs.map { case (id, text) =>
          (id, docUri(id), crawlPageText(id, text)) }) ++
          // non-200 captures ride in the same shards (r18): counted by
          // WAT, excluded by the 2xx document filter — both closed-form
          non200Records(docs))
      out
    })

  // ------------------------------------------------- revisit records

  /** Staging twin with `revisit` records (ISO 28500 §6.7.2 /
    * WARC 1.1): every doc with doc_id ≡ 2 (mod 3) is written NOT as
    * a conversion but as a revisit of the PREVIOUS doc's capture —
    * the identical-payload-digest profile a crawler emits when a
    * re-fetched page hasn't changed, with an empty body and a
    * `WARC-Refers-To-Target-URI` naming the original. Since docs
    * shard by hash(doc_id), a revisit and its original usually land
    * in DIFFERENT shards — resolution is a genuine cross-shard
    * join, the crawl-real shape. */
  private val revisitLakeDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def revisitLakeDir(s: SparkSession, dir: String, nShards: Int = 8): String =
    revisitLakeDirs.computeIfAbsent(s"$dir#$nShards", _ => {
      require(s.sparkContext.isLocal,
        "revisitLakeDir stages fixture files and requires a local master")
      val out = java.nio.file.Files.createTempDirectory("graft-revisit-lake").toString
      writeCrawlLake(graft.Tables.documents(s, dir).select(col("doc_id"), col("text")),
        out, nShards, "crawl",
        docs => docs.iterator.map { case (id, text) =>
          if (id % 3 == 2)
            Seq(
              "WARC-Type" -> "revisit",
              "WARC-Target-URI" -> docUri(id),
              "WARC-Refers-To-Target-URI" -> docUri(id - 1),
              "WARC-Profile" -> "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
              "WARC-Date" -> "2026-01-01T00:00:00Z",
              "Content-Type" -> "text/plain") -> Array.empty[Byte]
          else
            Seq(
              "WARC-Type" -> "conversion",
              "WARC-Target-URI" -> docUri(id),
              "WARC-Date" -> "2026-01-01T00:00:00Z",
              "WARC-Payload-Digest" -> payloadDigest(text.getBytes("UTF-8")),
              "Content-Type" -> "text/plain") -> text.getBytes("UTF-8")
        })
      out
    })

  /** `src_warc_revisit`: revisit-record RESOLUTION — the crawl's
    * dedup reference chain made whole. `conversion` records carry
    * their own text; `revisit` records (an unchanged re-fetch,
    * stored body-less against the original capture) resolve their
    * text by JOINING `WARC-Refers-To-Target-URI` back to the
    * original conversion — across shards, since the two captures
    * land wherever their fetches landed. A revisit whose referent
    * is missing from the lake drops (an unresolvable reference is
    * not a document). The parse MATERIALIZES ONCE (localCheckpoint —
    * the CC parse-then-join shape): both join sides read the
    * materialized relation instead of re-gunzipping and re-parsing
    * every shard per side. At 100 TB the join shuffles on uri — the
    * honest shape: both sides are crawl-scale, AQE handles skew,
    * and nothing driver-side grows with the corpus. Full oracle:
    * DuckDB rebuilds the resolution as a self-join on `documents`
    * via the fixture's id arithmetic. */
  def srcWarcRevisitDocs(s: SparkSession, dir: String): DataFrame =
    revisitDocsFromWarcFiles(s, revisitLakeDir(s, dir))

  /** The revisit-resolving ingest body over ANY directory of
    * `.warc`/`.warc.gz` files — split from [[srcWarcRevisitDocs]] so
    * tests can point it at hand-staged lakes (dangling referents,
    * corrupt shards). */
  def revisitDocsFromWarcFiles(s: SparkSession, lake: String): DataFrame = {
    import s.implicits._
    val parsed = s.read.format("binaryFile").load(lake)
      .select($"content")
      .as[Array[Byte]]
      .flatMap { bytes =>
        val rows = try {
          parseWarcAuto(bytes).iterator
            .filter(r => r.headers.get("warc-type").exists(t =>
              t == "conversion" || t == "revisit") &&
              !r.headers.contains("warc-truncated"))
            .flatMap { r =>
              // RECORD-level totality (the htmlDocs rule): one record
              // with a malformed uri tail or undecodable body must
              // not cost its whole shard — the outer catch stays for
              // CONTAINER malformation
              try {
                // same bit-rot guard as the WET ingest: a conversion
                // record whose payload digest does not match its body
                // quarantines record-level (a revisit's digest names
                // the ORIGINAL capture's payload, not its empty body,
                // so only conversions are checked)
                if (r.headers.get("warc-type").contains("conversion") &&
                    r.headers.get("warc-payload-digest")
                      .exists(_ != payloadDigest(r.body))) Iterator.empty
                else {
                  val uri = r.headers.getOrElse("warc-target-uri", "")
                  val id = uri.substring(uri.lastIndexOf('/') + 1).toLong
                  Iterator.single((id, uri, r.headers("warc-type"),
                    new String(r.body, "UTF-8"),
                    r.headers.getOrElse("warc-refers-to-target-uri", "")))
                }
              } catch { case _: Exception => Iterator.empty }
            }
            .toVector
        } catch { case _: Exception => Vector.empty }
        rows.iterator
      }
      .toDF("doc_id", "uri", "warc_type", "text", "refers_to")
      // materialize the parse ONCE: without this, the self-join's two
      // sides each re-execute the binaryFile scan + gunzip + WARC
      // parse of every shard — the dominant cost at crawl scale
      .localCheckpoint()
    val conv = parsed.filter($"warc_type" === "conversion")
    val resolved = parsed.filter($"warc_type" === "revisit")
      .select($"doc_id", $"uri", $"refers_to")
      .join(conv.select($"uri".as("o_uri"), $"text",
        $"doc_id".as("revisit_of")), $"refers_to" === $"o_uri")
      .select($"doc_id", $"uri", $"text", $"revisit_of")
    conv.select($"doc_id", $"uri", $"text",
        lit(null).cast("long").as("revisit_of"))
      .unionByName(resolved)
      .select($"doc_id", $"uri", length($"text").cast("long").as("n_chars"),
        $"text", $"revisit_of")
      .orderBy($"doc_id")
  }

  /** Inflate the single gzip member at `off` with no shared-budget
    * bookkeeping — the sequential member-walk entry ([[srcWarcCdx]]).
    * Returns (inflated bytes, input bytes consumed) or null. */
  private def inflateMemberAt(b: Array[Byte], off: Int): (Array[Byte], Int) =
    inflateMember(b, off, new java.util.concurrent.atomic.AtomicLong(0), Long.MaxValue,
      new java.util.concurrent.atomic.AtomicBoolean(false))

  /** `src_warc_cdx`: build the crawl's RANGE-READ INDEX — the cdx
    * convention: for every conversion record, which shard holds it,
    * at what byte offset its gzip member starts, how many compressed
    * bytes it spans, and its payload digest. This index is what
    * makes `(offset, length)` range requests possible at all — the
    * property `parseWarcGzParallel` consumes is the property this
    * query PRODUCES. The walk is inherently sequential per shard (a
    * member's start IS the previous member's end — offsets are a
    * chain fact), but still one task per shard, map-side, and the
    * chain is verified as it is measured (CRC32+ISIZE per member).
    * Rows-only BY NATURE: offset/length are facts about the deflate
    * encoder's output, not reproducible in SQL — the SourcesSpec
    * gate EXECUTES the contract instead: every emitted
    * (offset, length) slice range-reads back to exactly its own
    * record, members tile each shard, and the index covers every
    * document. */
  def srcWarcCdx(s: SparkSession, dir: String): DataFrame =
    cdxFromWarcFiles(s, wetLakeDir(s, dir))

  /** The index builder over ANY directory of per-record-gzip
    * `.warc.gz` shards — split from [[srcWarcCdx]] for hand-staged
    * lakes. Totality is per-FILE here, deliberately stricter than
    * the document ingests' record-level skip: an index with holes
    * is worse than no index (a broken chain makes every offset
    * after the break unverifiable), so a shard whose member chain
    * fails anywhere indexes as zero rows. */
  def cdxFromWarcFiles(s: SparkSession, lake: String): DataFrame =
    cdxRows(s, lake).orderBy(col("doc_id"))

  /** The un-ordered rows of [[cdxFromWarcFiles]] — the composition
    * entry (the htmlDocRows rule): a consumer that immediately
    * shuffles on shard ([[fetchByCdx]]) must not inherit the registry
    * query's contractual ORDER BY as a dead mid-plan range Exchange. */
  def cdxRows(s: SparkSession, lake: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").load(lake)
      .select($"path", $"content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        val rows = try {
          val out = Vector.newBuilder[(Long, String, String, Long, Long, String)]
          var pos = 0
          while (pos < bytes.length) {
            val m = inflateMemberAt(bytes, pos)
            require(m != null, s"broken member chain at $pos")
            val recs = parseWarc(m._1)
            require(recs.length == 1, "a member must hold exactly one record")
            val r = recs.head
            if (r.headers.get("warc-type").contains("conversion")) {
              val uri = r.headers.getOrElse("warc-target-uri", "")
              val id = uri.substring(uri.lastIndexOf('/') + 1).toLong
              out += ((id, uri, shard, pos.toLong, m._2.toLong,
                r.headers.getOrElse("warc-payload-digest", "")))
            }
            pos += m._2
          }
          out.result()
        } catch { case _: Exception => Vector.empty }
        rows.iterator
      }
      .toDF("doc_id", "uri", "shard", "offset", "length", "digest")
  }

  /** `src_warc_fetch`: the crawl's point-lookup verb — the first
    * CONSUMER of the cdx index ([[srcWarcCdx]] PRODUCES the
    * (shard, offset, length) facts; this query spends them). Given a
    * bounded doc_id predicate (the fixture's is `doc_id % 7 == 0`),
    * resolve each hit through the index and RANGE-READ only its gzip
    * member — open(shard), seek(offset), readFully(length) — instead
    * of scanning whole shards. At 100 TB this is the difference
    * between touching hits × mean-member-size bytes and re-reading
    * the corpus. Full oracle: the fetched rows hash-match `documents`
    * under the same predicate; the bytes-discipline gate is EXECUTED
    * in SourcesSpec — fetching against a lake whose bytes OUTSIDE the
    * indexed ranges are garbage still returns every document, which
    * no whole-shard read could survive. */
  def srcWarcFetch(s: SparkSession, dir: String): DataFrame = {
    val lake = wetLakeDir(s, dir)
    fetchByCdx(s, lake, cdxRows(s, lake).filter(col("doc_id") % 7 === 0))
  }

  /** Session-scoped PERSISTED cdx artifact: the index built ONCE over
    * the staged lake and written as parquet — the production shape
    * (the pipe_ivf_serve precedent): a crawl's cdx is built by one
    * batch job and then amortized over every point lookup forever;
    * rebuilding it per fetch would BE the corpus re-scan the index
    * exists to avoid. Test scaffolding under the local-master guard —
    * a real crawl's cdx already sits next to its shards. */
  private val cdxIndexDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def cdxIndexDir(s: SparkSession, dir: String): String =
    cdxIndexDirs.computeIfAbsent(dir, _ => {
      require(s.sparkContext.isLocal,
        "cdxIndexDir stages a fixture artifact and requires a local master")
      val out = java.nio.file.Files.createTempDirectory("graft-cdx-index").toString
      // range-partitioned AND sorted on doc_id (r17 verdict note #2):
      // parquet row-group MIN/MAX pruning of a served doc_id range is
      // a CONTRACT of this artifact, not an accident of write order —
      // range partitioning makes the files' doc_id envelopes pairwise
      // disjoint (a served range touches only its own files), the
      // within-partition sort keeps each row group's envelope tight.
      // SourcesSpec gates the per-file disjointness structurally.
      cdxRows(s, wetLakeDir(s, dir))
        .repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(out)
      out
    })

  /** `src_warc_serve`: the point lookup at its PRODUCTION shape — the
    * cdx read back from its persisted parquet artifact (built once by
    * [[cdxIndexDir]], amortized over every fetch) with the doc_id
    * predicate PUSHED INTO the artifact scan (a range here — "fetch
    * this crawl segment" — PlanSpec pins the PushedFilters), then the
    * same member range reads as [[srcWarcFetch]]. The serving plan
    * never touches a whole shard: no binaryFile scan anywhere — the
    * lake contributes ONLY the range-read bytes, the index only its
    * pruned parquet row groups. Full oracle: `documents` under the
    * same range. */
  def srcWarcServe(s: SparkSession, dir: String): DataFrame = {
    val lake = wetLakeDir(s, dir)
    val idx = s.read.parquet(cdxIndexDir(s, dir))
      .filter(col("doc_id") >= 100 && col("doc_id") < 150)
    fetchByCdx(s, lake, idx)
  }

  /** Range-read fetch over ANY per-record-gzip lake driven by cdx
    * index rows (shard, offset, length). ONE hash Exchange routes
    * index rows to their shard, each task opens its shard once and
    * reads members in offset order (sequential I/O within the file),
    * and exactly `length` bytes are read per member — nothing else of
    * the shard is touched, no whole-file gunzip anywhere. The session
    * Hadoop conf rides to the tasks ([[SerializableHadoopConf]]), so
    * the lake may live on any configured filesystem. A member whose
    * bytes no longer inflate to their indexed record (bit rot since
    * indexing, digest mismatch included) skips record-level — the
    * quarantine contract at point-lookup grain. */
  def fetchByCdx(s: SparkSession, lake: String, idx: DataFrame): DataFrame = {
    import s.implicits._
    val hadoopConf = new SerializableHadoopConf(s.sparkContext.hadoopConfiguration)
    idx.select(col("shard"), col("offset"), col("length"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard: String, members: Iterator[(String, Long, Long)]) =>
        val path = new org.apache.hadoop.fs.Path(lake, shard)
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(path.toUri, hadoopConf.value)
        try {
          val in = fs.open(path)
          // a fetch set is bounded by contract (point lookups, not a
          // scan), so materializing the rows before closing the
          // stream costs hits × record size, never shard size
          try {
            members.toArray.sortBy(_._2).iterator.flatMap { case (_, off, len) =>
              // loud, not quarantined (r17 ADVICE #3): a member length
              // that cannot be buffered is an INDEX fault, not record
              // bit rot — len.toInt on a >= 2³¹ value would wrap
              // negative and the NegativeArraySizeException would be
              // silently absorbed by the record-level catch below
              if (len <= 0 || len > Int.MaxValue)
                throw new IllegalStateException(
                  s"cdx member length $len at offset $off is outside the bufferable range")
              try {
                val buf = new Array[Byte](len.toInt)
                in.seek(off)
                in.readFully(buf)
                val m = inflateMemberAt(buf, 0)
                require(m != null && m._2 == len, s"member at $off does not span $len bytes")
                val recs = parseWarc(m._1)
                require(recs.length == 1, "a member must hold exactly one record")
                val r = recs.head
                if (r.headers.get("warc-payload-digest")
                      .exists(_ != payloadDigest(r.body))) Iterator.empty
                else {
                  val uri = r.headers.getOrElse("warc-target-uri", "")
                  val id = uri.substring(uri.lastIndexOf('/') + 1).toLong
                  Iterator.single((id, uri, new String(r.body, "UTF-8")))
                }
              } catch { case _: Exception => Iterator.empty }
            }.toVector
          } finally in.close()
        } finally fs.close()
      }
      .toDF("doc_id", "uri", "text")
      .select(col("doc_id"), col("uri"),
        length(col("text")).cast("long").as("n_chars"), col("text"))
      .orderBy(col("doc_id"))
  }

  /** `src_warc`: parse the staged WET shards back into document
    * rows. binaryFile gives one task per shard; record parsing is
    * map-side (flatMap over payloads — the whole-file grain is the
    * crawl's own: CC names the unit "one WET file"), `conversion`
    * records only (the warcinfo header row is container metadata,
    * not data). A malformed shard contributes zero rows through the
    * per-file totality catch instead of killing the scan — the
    * landing-zone contract. Full oracle: doc_id (the Target-URI's
    * path tail), uri, n_chars and the text itself must hash-match
    * `documents` rebuilt in DuckDB. */
  def srcWarcDocs(s: SparkSession, dir: String): DataFrame =
    docsFromWarcFiles(s, wetLakeDir(s, dir))

  /** The ingest body over ANY directory of `.warc`/`.warc.gz` files —
    * split from [[srcWarcDocs]] so tests can point it at hand-staged
    * lakes (corrupt shards, plain-WARC shards, mixed record types).
    * Non-`conversion` records (`request`/`response`/`revisit`/
    * `metadata`) and records flagged `WARC-Truncated` (a cut-short
    * body is not a document) filter out record-level. */
  def docsFromWarcFiles(s: SparkSession, lake: String): DataFrame = {
    import s.implicits._
    docRowsFromShardBytes(
        s.read.format("binaryFile").load(lake).select($"content").as[Array[Byte]])
      .select($"doc_id", $"uri", length($"text").cast("long").as("n_chars"), $"text")
      .orderBy($"doc_id")
  }

  /** The conversion-record parse over a relation of shard payloads —
    * the SHARED body of the batch ingest ([[docsFromWarcFiles]]) and
    * its ingestion-time streaming twin (`src_stream_warc`), so the
    * two record walks cannot diverge. Works unchanged over a
    * streaming Dataset: the parse is a stateless per-shard flatMap. */
  def docRowsFromShardBytes(shards: org.apache.spark.sql.Dataset[Array[Byte]]): DataFrame = {
    val s = shards.sparkSession
    import s.implicits._
    shards
      .flatMap { bytes =>
        // CONTAINER malformation quarantines the FILE (outer catch);
        // a single bad record — malformed uri tail, or a
        // WARC-Payload-Digest that does not match its body (bit rot
        // between capture and ingest, the reason CC stamps digests) —
        // skips RECORD-level like the html/revisit paths
        val rows = try {
          parseWarcAuto(bytes).iterator
            .filter(r => r.headers.get("warc-type").contains("conversion") &&
              !r.headers.contains("warc-truncated"))
            .flatMap { r =>
              try {
                if (r.headers.get("warc-payload-digest")
                      .exists(_ != payloadDigest(r.body))) Iterator.empty
                else {
                  val uri = r.headers.getOrElse("warc-target-uri", "")
                  val id = uri.substring(uri.lastIndexOf('/') + 1).toLong
                  Iterator.single((id, uri, new String(r.body, "UTF-8")))
                }
              } catch { case _: Exception => Iterator.empty }
            }
            .toVector
        } catch { case _: Exception => Vector.empty }
        rows.iterator
      }
      .toDF("doc_id", "uri", "text")
  }
}
