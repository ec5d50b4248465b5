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
object Warc {

  /** One parsed record: WARC headers (original case-insensitive
    * names lower-cased) + raw body bytes. */
  final case class WarcRecord(headers: Map[String, String], body: Array[Byte])

  private val CRLF = "\r\n"

  /** Deterministic WET-style bytes for (id, uri, text) docs: one
    * `warcinfo` record then one `conversion` record per doc, CRLF
    * headers, Content-Length in BYTES of the UTF-8 body, records
    * separated by a blank CRLF pair per the spec. */
  def encodeWet(docs: Seq[(Long, String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    def record(headers: Seq[(String, String)], body: Array[Byte]): Unit = {
      out.write(s"WARC/1.0$CRLF".getBytes("US-ASCII"))
      headers.foreach { case (k, v) => out.write(s"$k: $v$CRLF".getBytes("US-ASCII")) }
      out.write(s"Content-Length: ${body.length}$CRLF$CRLF".getBytes("US-ASCII"))
      out.write(body, 0, body.length)
      out.write(s"$CRLF$CRLF".getBytes("US-ASCII"))
    }
    val info = "software: graft-wet-fixture/1.0\r\nformat: WARC File Format 1.0\r\n"
      .getBytes("UTF-8")
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000000>",
      "Content-Type" -> "application/warc-fields"), info)
    docs.foreach { case (id, uri, text) =>
      record(Seq(
        "WARC-Type" -> "conversion",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "WARC-Record-ID" -> f"<urn:uuid:00000000-0000-0000-0000-${id}%012d>",
        "Content-Type" -> "text/plain"), text.getBytes("UTF-8"))
    }
    out.toByteArray
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

  /** Segment-parallel `.warc.gz` decode — the cdx-splittability
    * claim as executed code (the JPEG-restart / FLAC-frame pattern):
    * scan for gzip member magics (1f 8b 08), inflate every candidate
    * CONCURRENTLY as a single member (an Inflater stops at its
    * member's end, reporting how many input bytes it consumed), then
    * chain-walk from offset 0 keeping exactly the members that tile
    * the file. False candidates (magic bytes inside compressed data)
    * inflate to garbage or fail — either way the chain never visits
    * them, because member ends are authoritative. Returns null when
    * the bytes are not a clean member chain (the sequential entry is
    * the arbiter then). */
  def parseWarcGzParallel(b: Array[Byte]): Vector[WarcRecord] = {
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
    def one(i: Int): Unit = results(i) = inflateMember(b, cands(i))
    val idx = new java.util.concurrent.atomic.AtomicInteger(0)
    val nThreads = math.min(Runtime.getRuntime.availableProcessors(), cands.length)
    val threads = Array.tabulate(nThreads) { _ =>
      new Thread(() => {
        var i = idx.getAndIncrement()
        while (i < cands.length) { one(i); i = idx.getAndIncrement() }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // chain walk: members must tile [0, length) exactly
    val byOffset = cands.zipWithIndex.toMap
    val out = new java.io.ByteArrayOutputStream(b.length * 2)
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
    * verification — a member that lies about either is rejected. */
  private def inflateMember(b: Array[Byte], off: Int): (Array[Byte], Int) = {
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
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) { inf.end(); return null }
        out.write(buf, 0, n)
        if (out.size() > (1 << 30)) { inf.end(); return null }
      }
      val consumed = p + (b.length - p - inf.getRemaining)
      inf.end()
      val data = out.toByteArray
      if (consumed + 8 > b.length) return null
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      def u32(q: Int): Long = (b(q) & 0xffL) | ((b(q + 1) & 0xffL) << 8) |
        ((b(q + 2) & 0xffL) << 16) | ((b(q + 3) & 0xffL) << 24)
      if (u32(consumed) != crc.getValue) return null
      if (u32(consumed + 4) != (data.length.toLong & 0xffffffffL)) return null
      (data, consumed + 8 - off)
    } catch {
      case _: Exception => null
    }
  }

  // ------------------------------------------------------------ query

  /** Session-scoped staging of the documents table as a sharded WET
    * crawl: `nShards` `.warc.gz` files (per-record gzip members),
    * docs routed by doc_id % nShards. Test scaffolding under the
    * same local-master guard as the media lake — a production crawl
    * already sits in object storage. */
  private val wetLakeDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def wetLakeDir(s: SparkSession, dir: String, nShards: Int = 8): String =
    wetLakeDirs.computeIfAbsent(dir, d => {
      require(s.sparkContext.isLocal,
        "wetLakeDir stages fixture files and requires a local master; " +
          "production crawls are read directly via srcWarcDocs on their own paths")
      val out = java.nio.file.Files.createTempDirectory("graft-wet-lake").toString
      import s.implicits._
      graft.Tables.documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .repartition(nShards, col("doc_id"))
        .foreachPartition { (it: Iterator[(Long, String)]) =>
          // shard file named by PARTITION id (unique by construction —
          // naming by a doc-derived value could collide two tasks on
          // one filename and silently overwrite a shard)
          val docs = it.toSeq.sortBy(_._1)
          if (docs.nonEmpty) {
            val shard = org.apache.spark.TaskContext.getPartitionId()
            val wet = encodeWet(docs.map { case (id, text) => (id, docUri(id), text) })
            java.nio.file.Files.write(
              java.nio.file.Paths.get(out, f"wet-$shard%05d.warc.gz"),
              gzipPerRecord(wet))
            ()
          }
        }
      out
    })

  /** The fixture URI rule — mirrored closed-form by the oracle. */
  def docUri(id: Long): String = s"https://example.org/doc/$id"

  // --------------------------------------------- raw crawl (response)

  /** Deterministic RAW-crawl bytes for (id, uri, text) docs: one
    * `warcinfo` record then one `response` record per doc whose body
    * is a full HTTP/1.1 envelope (status line + headers + blank
    * line) around an HTML page wrapping the text — the shape a crawl
    * lands in BEFORE extraction (WET is its post-extraction twin).
    * The HTML wrap is LOSSLESS by construction ([[htmlWrap]] escapes
    * the three markup characters and adds structure-only tags), so
    * [[extractText]] inverts it exactly and the raw-crawl query can
    * share the WET query's oracle. */
  def encodeRawWarc(docs: Seq[(Long, String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    def record(headers: Seq[(String, String)], body: Array[Byte]): Unit = {
      out.write(s"WARC/1.0$CRLF".getBytes("US-ASCII"))
      headers.foreach { case (k, v) => out.write(s"$k: $v$CRLF".getBytes("US-ASCII")) }
      out.write(s"Content-Length: ${body.length}$CRLF$CRLF".getBytes("US-ASCII"))
      out.write(body, 0, body.length)
      out.write(s"$CRLF$CRLF".getBytes("US-ASCII"))
    }
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "Content-Type" -> "application/warc-fields"),
      "software: graft-warc-fixture/1.0\r\n".getBytes("UTF-8"))
    docs.foreach { case (id, uri, text) =>
      val html = htmlWrap(text).getBytes("UTF-8")
      val http = (s"HTTP/1.1 200 OK$CRLF" +
        s"Content-Type: text/html; charset=utf-8$CRLF" +
        s"Content-Length: ${html.length}$CRLF$CRLF").getBytes("US-ASCII")
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "Content-Type" -> "application/http; msgtype=response"),
        http ++ html)
    }
    out.toByteArray
  }

  /** Escape `& < >` then wrap in structure-only boilerplate (head,
    * title, a nav block — the parts an extractor must DROP, not just
    * strip). Lossless: [[extractText]](htmlWrap(t)) == t for any t. */
  def htmlWrap(text: String): String = {
    val esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    "<!DOCTYPE html><html><head><title>fixture</title>" +
      "<style>body { color: #000 }</style>" +
      "<script>var tracker = '<ignore me>';</script></head>" +
      "<body><nav><a href=\"/\">home</a></nav>" +
      s"<article><p>$esc</p></article>" +
      "<footer>&copy; 2026</footer></body></html>"
  }

  /** HTML → text, the boilerplate-strip every training pipeline
    * runs: drops `script`/`style`/`nav`/`footer`/`header`/`aside`
    * subtrees wholesale, strips remaining tags, decodes the five
    * standard entities (+ numeric), keeps ONLY `article`/`p` content
    * — deliberately the conservative content-block heuristic (keep
    * what is marked as content) rather than a statistical one, so
    * the transform is deterministic and, on [[htmlWrap]] pages,
    * exactly inverse. Malformed markup never throws: unclosed tags
    * consume to end, stray `<` is literal text. */
  def extractText(html: String): String = {
    val sb = new StringBuilder
    val drop = Set("script", "style", "nav", "footer", "header", "aside", "head")
    val keep = Set("article", "main", "section", "p")
    var i = 0
    var keepDepth = 0 // inside at least one keep-marked content block
    var dropUntil: String = null
    def tagAt(j: Int): (String, Boolean, Int) = { // (name, isClose, endIdx) or null via name==""
      var p = j + 1
      var close = false
      if (p < html.length && html(p) == '/') { close = true; p += 1 }
      val start = p
      while (p < html.length && (html(p).isLetterOrDigit || html(p) == '!' || html(p) == '-')) p += 1
      val name = html.substring(start, p).toLowerCase
      while (p < html.length && html(p) != '>') p += 1
      (name, close, if (p < html.length) p else html.length - 1)
    }
    while (i < html.length) {
      val c = html(i)
      if (c == '<') {
        val (name, close, end) = tagAt(i)
        if (name.isEmpty) { if (keepDepth > 0 && dropUntil == null) sb.append(c); i += 1 }
        else {
          if (dropUntil != null) { if (close && name == dropUntil) dropUntil = null }
          else if (drop.contains(name) && !close) dropUntil = name
          else if (keep.contains(name)) keepDepth = math.max(0, keepDepth + (if (close) -1 else 1))
          i = end + 1
        }
      } else if (c == '&' && dropUntil == null && keepDepth > 0) {
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
        if (dec != null) { sb.append(dec); i = semi + 1 }
        else { sb.append(c); i += 1 }
      } else {
        if (dropUntil == null && keepDepth > 0) sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** `src_warc_html`: the RAW-crawl twin of [[srcWarcDocs]] — parse
    * `response` records, skip the HTTP envelope (payload begins
    * after the header block's blank CRLF line), run [[extractText]]
    * over the HTML, emit document rows. Shares the WET query's
    * oracle because the fixture wrap is lossless — divergence in
    * container framing, HTTP skipping OR extraction is a hash
    * mismatch. */
  def srcWarcHtmlDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lake = rawLakeDir(s, dir)
    s.read.format("binaryFile").load(lake)
      .select($"content")
      .as[Array[Byte]]
      .flatMap { bytes =>
        val rows = try {
          parseWarcAuto(bytes).iterator
            .filter(_.headers.get("warc-type").contains("response"))
            .map { r =>
              val uri = r.headers.getOrElse("warc-target-uri", "")
              val id = uri.substring(uri.lastIndexOf('/') + 1).toLong
              val body = new String(r.body, "UTF-8")
              val payloadAt = body.indexOf("\r\n\r\n")
              val html = if (payloadAt < 0) body else body.substring(payloadAt + 4)
              (id, uri, extractText(html))
            }
            .toVector
        } catch { case _: Exception => Vector.empty }
        rows.iterator
      }
      .toDF("doc_id", "uri", "text")
      .select($"doc_id", $"uri", length($"text").cast("long").as("n_chars"), $"text")
      .orderBy($"doc_id")
  }

  private val rawLakeDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Raw-crawl staging twin of [[wetLakeDir]]: `response`-record
    * `.warc.gz` shards under the same local-master guard. */
  def rawLakeDir(s: SparkSession, dir: String, nShards: Int = 8): String =
    rawLakeDirs.computeIfAbsent(dir, d => {
      require(s.sparkContext.isLocal,
        "rawLakeDir stages fixture files and requires a local master")
      val out = java.nio.file.Files.createTempDirectory("graft-raw-lake").toString
      import s.implicits._
      graft.Tables.documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .repartition(nShards, col("doc_id"))
        .foreachPartition { (it: Iterator[(Long, String)]) =>
          val docs = it.toSeq.sortBy(_._1)
          if (docs.nonEmpty) {
            val shard = org.apache.spark.TaskContext.getPartitionId()
            val warc = encodeRawWarc(docs.map { case (id, text) => (id, docUri(id), text) })
            java.nio.file.Files.write(
              java.nio.file.Paths.get(out, f"crawl-$shard%05d.warc.gz"),
              gzipPerRecord(warc))
            ()
          }
        }
      out
    })

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
    * lakes (corrupt shards, plain-WARC shards). */
  def docsFromWarcFiles(s: SparkSession, lake: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").load(lake)
      .select($"content")
      .as[Array[Byte]]
      .flatMap { bytes =>
        // the WHOLE per-file chain sits inside the totality catch —
        // a malformed uri tail throwing from the lazy map after a
        // clean parse would still kill the task otherwise
        val rows = try {
          parseWarcAuto(bytes).iterator
            .filter(_.headers.get("warc-type").contains("conversion"))
            .map { r =>
              val uri = r.headers.getOrElse("warc-target-uri", "")
              val id = uri.substring(uri.lastIndexOf('/') + 1).toLong
              (id, uri, new String(r.body, "UTF-8"))
            }
            .toVector
        } catch { case _: Exception => Vector.empty }
        rows.iterator
      }
      .toDF("doc_id", "uri", "text")
      .select($"doc_id", $"uri", length($"text").cast("long").as("n_chars"), $"text")
      .orderBy($"doc_id")
  }
}
