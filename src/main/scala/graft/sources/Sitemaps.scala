package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sitemap XML — the crawl's DISCOVERY surface, closing the loop the
  * robots plane opens: robots.txt ANNOUNCES sitemaps
  * ([[Robots.srcRobotsSitemaps]]), sitemap files LIST fetchable URLs
  * with freshness hints (`lastmod`), and a polite crawler turns that
  * into a priority-ordered, crawl-delay-spaced fetch frontier. Verbs:
  * [[srcSitemapUrls]] walks announced sitemaps across the capture
  * lake — urlset files emit their URLs; sitemapindex files emit their
  * child sitemaps, which are then resolved against the SAME lake (one
  * level, per the sitemaps.org protocol: an index must not reference
  * another index) — and [[pipeSitemapSchedule]] orders each host's
  * discovered URLs by freshness (parsed `lastmod` DESC, undated last)
  * and spaces them by the host's robots crawl-delay in millisecond
  * slots.
  *
  * Scope and tolerances: only sitemaps REACHABLE from a resolved
  * robots announcement are read (an unannounced capture is not part
  * of the host's declared discovery surface — the decoy arm pins
  * this); only 2xx captures parse; the XML walk is a tolerant tag
  * scan (`<urlset>`/`<sitemapindex>` roots, `<loc>` required,
  * `<lastmod>` optional — a malformed entry skips, never fails the
  * job). `lastmod` ordering uses the PARSED instant (W3C datetime;
  * date-only forms parse at UTC midnight) — the robots plane's
  * string-order-breaks-on-mixed-precision lesson, applied here from
  * the start and planted as a fixture trap. Multiple captures of one
  * sitemap URL resolve latest-capture-wins with the same
  * (instant, fingerprint) ranking as robots captures.
  *
  * Scale shape: announcements and captures are both host-proportional
  * and join on the normalized URL key — both sides shuffle at crawl
  * scale, AQE broadcasts at fixture scale (the compliance-join
  * posture). The index walk is ONE extra equi-join, not an iteration:
  * the protocol's single-level nesting bounds it by construction. The
  * announcement side normalizes through the SAME hand parser as the
  * capture side (a typed map at rules grain — tiny next to the
  * corpus), so the two key spellings cannot drift.
  *
  * Reference scope: the Go engine has no discovery plane (its corpus
  * is Gutenberg files, `main.go:25`); this extends the crawl family
  * alongside the robots verbs. */
object Sitemaps {

  private val SchemeRest = "(?s)^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*).*$".r

  /** Normalized (authority key, path) of a URL: the authority through
    * [[Robots.robotsHostKey]]'s contract (lowercased scheme/host,
    * default ports elided, userinfo stripped, malformed ports
    * rejected), the path percent-normalized (RFC 3986 §6.2.2.2).
    * Announcements and capture URIs key through THIS one function. */
  private[graft] def splitUrlKey(uri: String): Option[(String, String)] =
    uri match {
      case SchemeRest(sch, auth, path) if auth.nonEmpty =>
        Robots.robotsHostKey(s"$sch://$auth/robots.txt").map { hostKey =>
          (hostKey,
            graft.functions.UriFunctions.percentNormalize(
              org.apache.spark.unsafe.types.UTF8String.fromString(
                if (path.isEmpty) "/" else path)).toString)
        }
      case _ => None
    }

  /** The full normalized URL key, or None for unkeyable spellings. */
  def sitemapUrlKey(uri: String): Option[String] =
    splitUrlKey(uri).map { case (h, p) => h + p }

  /** One parsed sitemap body: `kind` is `urlset` or `sitemapindex`,
    * entries are (loc, lastmod) with `""` for a missing lastmod.
    * Tolerant tag scan — an entry without a `<loc>` skips; a body
    * with neither root returns no entries. */
  private val EntryRx = "(?s)<(url|sitemap)>(.*?)</\\1>".r
  private val LocRx = "(?s)<loc>\\s*(.*?)\\s*</loc>".r
  private val LastmodRx = "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>".r

  def parseSitemap(body: String): (String, Vector[(String, String)]) = {
    val kind =
      if (body.contains("<sitemapindex")) "sitemapindex"
      else if (body.contains("<urlset")) "urlset"
      else return ("", Vector.empty)
    val entries = EntryRx.findAllMatchIn(body).flatMap { m =>
      val inner = m.group(2)
      LocRx.findFirstMatchIn(inner).map { loc =>
        (loc.group(1), LastmodRx.findFirstMatchIn(inner).map(_.group(1)).getOrElse(""))
      }
    }.toVector
    (kind, entries)
  }

  /** W3C datetime → epoch micros for freshness ranking; date-only
    * forms parse at UTC midnight; unparseable/missing → -1 (ranks
    * LAST under DESC — an undated URL is the weakest freshness
    * claim). String order is NOT a substitute: a sub-second stamp
    * sorts below its own whole-second spelling ('.' < 'Z') while the
    * instant is later — the fixture plants exactly that tie. */
  private[graft] def lastmodOrd(s: String): Long =
    if (s.isEmpty) -1L
    else try {
      val inst =
        if (s.length == 10) java.time.LocalDate.parse(s).atStartOfDay(java.time.ZoneOffset.UTC).toInstant
        else java.time.OffsetDateTime.parse(s).toInstant
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    } catch { case _: Exception => -1L }

  /** Every sitemap capture in the lake, latest-capture-wins per URL
    * key, one exploded row per entry: (url_key, kind, loc, lastmod,
    * lastmod_ord) — the shard-grain map-side walk of every other
    * crawl ingest. Robots locations belong to the compliance parse
    * and are excluded here. */
  private[graft] def sitemapCapturesFromLake(s: SparkSession, lake: String): DataFrame = {
    import s.implicits._
    val raw = s.read.format("binaryFile").load(lake).select($"content").as[Array[Byte]]
      .flatMap { bytes =>
        val rows = try {
          Warc.parseWarcAuto(bytes).iterator
            .filter(r => r.headers.get("warc-type").contains("response") &&
              !r.headers.contains("warc-truncated"))
            .flatMap { r =>
              try {
                val uri = r.headers.getOrElse("warc-target-uri", "")
                splitUrlKey(uri) match {
                  case Some((hostKey, path)) if path != "/robots.txt" =>
                    val key = hostKey + path
                    val at = r.headers.getOrElse("warc-date", "")
                    val ord = try {
                      val inst = java.time.Instant.parse(at)
                      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
                    } catch { case _: Exception => -1L }
                    val fp = Robots.captureFp(r.body)
                    val (status, hh, entity) = Warc.decodeHttpResponse(r.body)
                    if (status < 200 || status > 299) Iterator.empty
                    else {
                      val cs = Warc.charsetOf(hh.getOrElse("content-type", ""))
                      val (kind, entries) = parseSitemap(new String(entity, cs))
                      if (kind.isEmpty) Iterator.empty
                      else entries.iterator.map(e =>
                        (key, kind, e._1, e._2, lastmodOrd(e._2), ord, fp))
                    }
                  case _ => Iterator.empty
                }
              } catch { case _: Exception => Iterator.empty }
            }
            .toVector
        } catch { case _: Exception => Vector.empty }
        rows.iterator
      }
      .toDF("url_key", "kind", "loc", "lastmod", "lastmod_ord", "fetched_ord", "capture_fp")
    // latest capture of each sitemap URL wins — same (instant,
    // fingerprint) ranking as robots captures; the planted OLDER
    // poison capture of h3's sitemap must lose wholesale
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"url_key")
    raw
      .withColumn("latest", max(struct($"fetched_ord", $"capture_fp")).over(w))
      .filter($"fetched_ord" === $"latest.fetched_ord" &&
        $"capture_fp" === $"latest.capture_fp")
      .select($"url_key", $"kind", $"loc", $"lastmod", $"lastmod_ord")
  }

  /** `src_sitemap_urls`: the discovery walk — resolved robots
    * announcements joined against the captured sitemap files; urlset
    * entries emit, sitemapindex entries resolve ONE more level
    * against the same captures. Output: (host, sitemap, url, lastmod)
    * where `sitemap` is the urlset FILE (normalized key) that listed
    * the URL and `lastmod` is null when absent. An announced-but-
    * uncaptured sitemap contributes nothing; an unannounced capture
    * (the h9 decoy) must never appear. */
  def srcSitemapUrls(s: SparkSession, dir: String): DataFrame =
    sitemapUrlRowsOn(s, dir,
      Robots.robotsFromWarcFiles(s, Robots.robotsLakeDir(s, dir)))
      .select(col("host"), col("sitemap"), col("url"), col("lastmod"))
      .orderBy(col("host"), col("sitemap"), col("url"))

  /** The walk with the freshness ord kept — shared by the source verb
    * and the priority schedule, over an ALREADY-RESOLVED directive
    * table (so [[pipeSitemapSchedule]] pays the robots-lake parse
    * ONCE for announcements and delays together). The captures table
    * materializes once (localCheckpoint) because the index walk reads
    * it from two join positions. */
  private def sitemapUrlRowsOn(s: SparkSession, dir: String,
                               rules: DataFrame): DataFrame = {
    import s.implicits._
    val lake = Robots.robotsLakeDir(s, dir)
    val caps = sitemapCapturesFromLake(s, lake).localCheckpoint()
    // announcements normalize through the SAME hand parser as capture
    // URIs (typed map at rules grain — host-proportional, tiny)
    val announced = rules.filter($"directive" === "sitemap")
      .select($"host", $"value")
      .as[(String, String)]
      .flatMap { case (host, url) => sitemapUrlKey(url).map(k => (host, k)) }
      .toDF("host", "url_key")
    val level0 = announced.join(caps, Seq("url_key"))
    val direct = level0.filter($"kind" === "urlset")
      .select($"host", $"url_key".as("sitemap"), $"loc", $"lastmod", $"lastmod_ord")
    val children = level0.filter($"kind" === "sitemapindex")
      .select($"host", $"loc".as("child_url"))
      .as[(String, String)]
      .flatMap { case (host, url) => sitemapUrlKey(url).map(k => (host, k)) }
      .toDF("host", "url_key")
    val viaIndex = children
      .join(caps, Seq("url_key"))
      // one level only (sitemaps.org: an index must not reference
      // another index) — a nested index entry drops here
      .filter($"kind" === "urlset")
      .select($"host", $"url_key".as("sitemap"), $"loc", $"lastmod", $"lastmod_ord")
    direct.unionByName(viaIndex)
      .select($"host", $"sitemap", $"loc".as("url"),
        when($"lastmod" === "", lit(null)).otherwise($"lastmod").as("lastmod"),
        $"lastmod_ord")
  }

  /** `pipe_sitemap_schedule`: the discovery frontier under the robots
    * politeness contract — per host, discovered URLs order by
    * freshness (parsed `lastmod` DESC; undated URLs last; URL string
    * breaks exact ties) and slot at `rank × crawl-delay` milliseconds
    * under the SAME group-selected delay the fetch schedules use.
    * This is the executable robots → discovery → politeness
    * composition the plane was built toward: announcements from
    * resolved robots, freshness from the sitemap walk, spacing from
    * crawl-delay. */
  def pipeSitemapSchedule(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ONE robots parse serves both consumers (the scheduleInputs
    // discipline): announcements read the resolved table directly,
    // delays group-select over the same checkpoint
    val rules = Robots.robotsFromWarcFiles(s, Robots.robotsLakeDir(s, dir))
      .localCheckpoint()
    val urls = sitemapUrlRowsOn(s, dir, rules)
    val delays = Robots.crawlDelays(rules, Robots.fixtureUa)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"host").orderBy($"lastmod_ord".desc, $"url")
    urls
      .join(delays, Seq("host"), "left")
      .select($"host", $"url",
        ((row_number().over(win) - 1).cast("long") * coalesce($"delay_ms", lit(0L)))
          .as("fetch_slot"))
      .orderBy($"host", $"fetch_slot", $"url")
  }
}
