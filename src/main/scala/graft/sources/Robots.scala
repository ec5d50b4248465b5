package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt — the crawl's COMPLIANCE surface (RFC 9309). Common
  * Crawl captures robots responses as their own WARC member family,
  * and a training-data pipeline that re-fetches or filters by
  * crawlability needs the rules queryable next to the corpus: which
  * host allows which path prefixes for which user agent. Two verbs:
  * [[srcWarcRobots]] parses robots captures from a `.warc.gz` lake
  * into a DIRECTIVE table (one row per allow/disallow/crawl-delay
  * line, group-attributed), and [[compliance]] joins a corpus
  * against that table under the RFC's evaluation rules —
  * most-specific group per user agent, LONGEST-MATCH rule per path,
  * allow wins length ties, no match means allowed.
  *
  * Scale shape: the rules table is host-proportional (tens of bytes
  * per host — ~10 GB at 10⁸ hosts), so the compliance join shuffles
  * BOTH sides on host rather than assuming a broadcastable dimension;
  * the corpus side carries only (doc_id, host, path), never bodies.
  * Parsing is the usual shard-grain map-side walk with the two-level
  * totality contract of every other crawl ingest.
  *
  * Reference scope: the Go engine has no compliance plane (its corpus
  * is Gutenberg files, `main.go:25`); this extends the crawl family
  * the way the WAT/cdx verbs do — same container, same oracles
  * discipline. */
object Robots {

  /** One parsed directive: which host's robots, which user-agent
    * group it sits in, the directive name (`allow` / `disallow` /
    * `crawl-delay`), and its value (a path prefix, or the delay). */
  final case class RobotsDirective(host: String, userAgent: String,
                                   directive: String, value: String)

  /** Parse ONE robots.txt body per RFC 9309 §2: `field: value` lines,
    * `#` comments stripped, field names case-insensitive, groups
    * formed by consecutive `User-agent` lines followed by their
    * rules — a rule line CLOSES the user-agent accumulation (a later
    * `User-agent` starts a new group), and a group may name several
    * agents (each gets every rule of its group). Unknown fields and
    * rules outside any group are ignored (the RFC's error tolerance);
    * `crawl-delay` is widely shipped though not in the RFC, and rides
    * the same group grammar. Returns directives in file order. */
  def parseRobots(host: String, body: String): Vector[RobotsDirective] = {
    val out = Vector.newBuilder[RobotsDirective]
    var agents = Vector.empty[String]  // the OPEN group's user agents
    var accumulating = false           // still collecting User-agent lines?
    body.linesIterator.foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val field = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          field match {
            case "user-agent" =>
              if (accumulating) agents :+= value.toLowerCase
              else { agents = Vector(value.toLowerCase); accumulating = true }
            case "allow" | "disallow" | "crawl-delay" =>
              accumulating = false
              agents.foreach(a => out += RobotsDirective(host, a, field, value))
            case _ => () // sitemap etc.: not group rules, ignored
          }
        }
      }
    }
    out.result()
  }

  /** Parse every robots capture in a `.warc.gz` lake into the
    * directive table. A robots capture is a `response` record whose
    * target URI path is `/robots.txt`; the host is the URI up to that
    * path. Same envelope decode and two-level totality as the
    * document ingests (non-2xx robots responses are SKIPPED — the
    * RFC's 4xx rule means "no rules", which is exactly what emitting
    * nothing yields). */
  def robotsFromWarcFiles(s: SparkSession, lake: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").load(lake)
      .select($"content")
      .as[Array[Byte]]
      .flatMap { bytes =>
        val rows = try {
          Warc.parseWarcAuto(bytes).iterator
            .filter(r => r.headers.get("warc-type").contains("response") &&
              !r.headers.contains("warc-truncated"))
            .flatMap { r =>
              try {
                val uri = r.headers.getOrElse("warc-target-uri", "")
                if (!uri.endsWith("/robots.txt")) Iterator.empty
                else {
                  val host = uri.stripSuffix("/robots.txt")
                  val (status, hh, entity) = Warc.decodeHttpResponse(r.body)
                  if (status < 200 || status > 299) Iterator.empty
                  else {
                    val cs = Warc.charsetOf(hh.getOrElse("content-type", ""))
                    parseRobots(host, new String(entity, cs)).iterator
                      .map(d => (d.host, d.userAgent, d.directive, d.value))
                  }
                }
              } catch { case _: Exception => Iterator.empty }
            }
            .toVector
        } catch { case _: Exception => Vector.empty }
        rows.iterator
      }
      .toDF("host", "user_agent", "directive", "value")
  }

  /** `src_warc_robots`: the directive table, contractually ordered.
    * Full oracle: the fixture's 16 hosts each ship the same id-keyed
    * group grammar, so DuckDB rebuilds every row from `range(16)`. */
  def srcWarcRobots(s: SparkSession, dir: String): DataFrame =
    robotsFromWarcFiles(s, robotsLakeDir(s, dir))
      .orderBy(col("host"), col("user_agent"), col("directive"), col("value"))

  /** RFC 9309 compliance of a (doc_id, host, path) corpus against a
    * directive table, for one user agent:
    *  1. GROUP SELECTION (§2.2.1): a host's applicable group is the
    *     exact user-agent match when one exists, else `*`.
    *  2. RULE MATCH (§2.2.2): a rule matches when the path STARTS
    *     WITH its value; the LONGEST match wins; an `allow`/`disallow`
    *     tie at equal length resolves to allow; an empty-value rule
    *     matches nothing.
    *  3. No matching rule (or no group at all) means ALLOWED.
    * Shape: one equi-join on host (both sides shuffle — the rules
    * table is host-proportional, not a broadcastable dim at crawl
    * scale), a map-side prefix test, and a max_by aggregation keyed
    * (match length, is-allow) — no window, no second shuffle beyond
    * the doc_id grouping. */
  def compliance(docs: DataFrame, rules: DataFrame, userAgent: String): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val ua = userAgent.toLowerCase
    // materialize the directive table ONCE (the srcWarcRevisit rule):
    // group selection reads it from three positions (exact side, star
    // side, and the star side's anti-join probe), and without this
    // each position re-executes the whole robots-lake parse — the
    // dominant cost at crawl scale. PlanSpec pins the zero-rescan
    // shape on the registry query.
    val paths = rules.filter($"directive".isin("allow", "disallow"))
      .localCheckpoint()
    val exact = paths.filter($"user_agent" === ua)
    val star = paths.filter($"user_agent" === "*")
      .join(exact.select($"host").distinct(), Seq("host"), "left_anti")
    val applicable = exact.unionByName(star)
      .filter(length($"value") > 0) // an empty rule value matches nothing (§2.2.2)
      .select($"host", $"directive", $"value")
    docs
      .join(applicable, Seq("host"), "left")
      .withColumn("matches", $"value".isNotNull && $"path".startsWith($"value"))
      .groupBy($"doc_id", $"host")
      .agg(coalesce(
        max_by($"directive" === "allow",
          when($"matches", struct(length($"value"), ($"directive" === "allow").cast("int")))),
        lit(true)).as("allowed"))
  }

  /** `pipe_robots_filter`: the corpus × robots compliance join for
    * the fixture crawler UA. Hosts are assigned closed-form
    * (`doc_id % 16`), paths are the crawl's `/doc/<id>`, and each
    * host's rules are decimal-prefix arithmetic — so DuckDB rebuilds
    * the verdict per doc without reimplementing the RFC: blocked iff
    * the id string starts with the host digit k but not with kk (the
    * longer `allow` wins), everything else allowed. The fixture's
    * `*` group disallows `/` entirely, so group selection is
    * oracle-visible too: resolving the wrong group flips every
    * verdict. */
  def pipeRobotsFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables.documents(s, dir).select(
      $"doc_id",
      concat(lit("https://h"), ($"doc_id" % 16).cast("string"),
        lit(".example.org")).as("host"),
      concat(lit("/doc/"), $"doc_id".cast("string")).as("path"))
    compliance(docs, robotsFromWarcFiles(s, robotsLakeDir(s, dir)), fixtureUa)
      .orderBy($"doc_id")
  }

  /** `pipe_fetch_schedule`: the compliance plane's CLOSING verb —
    * politeness scheduling. Allowed fetches to one host must be
    * spaced by that host's `crawl-delay`, so each doc's fetch SLOT is
    * `(rank of the doc among its host's allowed fetches) × delay`
    * seconds (0-based; hosts without a delay fetch immediately).
    * One shuffle: the per-host window IS the crawler's frontier
    * queue — partitioned by host, ordered by doc_id. At crawl scale
    * the skew is hot hosts (a million-page host is one partition);
    * a production frontier shards hot hosts by time bucket on top of
    * this — the window form is the semantics layer it shards. Full
    * oracle: allowed-set arithmetic (the filter's closed form) × the
    * fixture delay `k % 5` × ROW_NUMBER, all in SQL. */
  def pipeFetchSchedule(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables.documents(s, dir).select(
      $"doc_id",
      concat(lit("https://h"), ($"doc_id" % 16).cast("string"),
        lit(".example.org")).as("host"),
      concat(lit("/doc/"), $"doc_id".cast("string")).as("path"))
    // parse once for BOTH consumers (compliance re-checkpoints its
    // filtered subset — a read of this materialization, not a rescan)
    val rules = robotsFromWarcFiles(s, robotsLakeDir(s, dir)).localCheckpoint()
    val delays = rules
      .filter($"user_agent" === fixtureUa && $"directive" === "crawl-delay")
      .select($"host", $"value".cast("long").as("delay"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"host").orderBy($"doc_id")
    compliance(docs, rules, fixtureUa)
      .filter($"allowed")
      .join(delays, Seq("host"), "left")
      .select($"doc_id", $"host",
        ((row_number().over(win) - 1).cast("long") * coalesce($"delay", lit(0L)))
          .as("fetch_slot"))
      .orderBy($"doc_id")
  }

  /** The fixture crawler's user-agent token. */
  val fixtureUa = "graftbot"

  /** The fixture robots body for host k — the id-keyed grammar the
    * oracles mirror: a `*` group that disallows everything (group
    * selection must NOT fall through to it for [[fixtureUa]]), and a
    * graftbot group whose disallow/allow pair exercises longest-match
    * (`/doc/k` vs the longer `/doc/kk`), plus a crawl-delay and the
    * RFC's tolerated noise (comments, a sitemap line, mixed case). */
  def fixtureRobotsBody(k: Int): String =
    s"""# graft fixture robots for host h$k
       |Sitemap: https://h$k.example.org/sitemap.xml
       |
       |User-Agent: *
       |Disallow: /
       |
       |User-Agent: $fixtureUa
       |Disallow: /doc/$k
       |Allow: /doc/$k$k
       |Crawl-Delay: ${k % 5}
       |""".stripMargin

  private val robotsLakeDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staged robots lake: one `.warc.gz` shard holding the 16 hosts'
    * robots captures as `response` records (text/plain envelopes,
    * the shape real robots fetches land in). Test scaffolding under
    * the local-master guard like every other staged lake; 16 records
    * need no Spark job to write. */
  def robotsLakeDir(s: SparkSession, dir: String): String =
    robotsLakeDirs.computeIfAbsent(dir, _ => {
      require(s.sparkContext.isLocal,
        "robotsLakeDir stages fixture files and requires a local master")
      val out = java.nio.file.Files.createTempDirectory("graft-robots-lake")
      val records = (0 until 16).map { k =>
        val body = fixtureRobotsBody(k).getBytes("UTF-8")
        val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
        Seq(
          "WARC-Type" -> "response",
          "WARC-Target-URI" -> s"https://h$k.example.org/robots.txt",
          "WARC-Date" -> "2026-01-01T00:00:00Z",
          "Content-Type" -> "application/http; msgtype=response") -> (http ++ body)
      }
      java.nio.file.Files.write(out.resolve("robots-00000.warc.gz"),
        Warc.gzipPerRecord(Warc.encodeRecords(records)))
      out.toString
    })
}
