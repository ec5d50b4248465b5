package graft

/** SQL registration of the custom expressions. */
class ExtensionsSpec extends SparkSpec {

  test("graft functions callable from plain SQL after register()") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_fnv1a32('a') AS h32, graft_fnv1a64('a') AS h64,
        |  graft_simhash64('hello world') AS sh,
        |  size(graft_minhash('hello world hello')) AS sig_len,
        |  graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos_same,
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot
        |""".stripMargin).collect().head
    assert(r.getInt(0) == 0xe40c292c)
    assert(r.getLong(1) == 0xaf63dc4c8601ec8cL)
    assert(r.getInt(3) == 16)
    assert(r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == 11.0)
  }

  test("text kernels callable from plain SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_token_bigrams('a b  c') AS bg,
        |  graft_token_count('  a b  c ') AS n,
        |  graft_jaccard(array('x', 'y'), array('y', 'z')) AS j
        |""".stripMargin).collect().head
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 1.0 / 3.0) < 1e-12)
  }

  test("zvalue callable from plain SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_zvalue(5L, 3L) AS z, graft_zvalue(CAST(NULL AS BIGINT), 3L) AS zn")
      .collect().head
    assert(r.getLong(0) == 27L) // 101 ⨝ 011 = 011011
    assert(r.isNullAt(1))
  }

  test("token n-grams and rolling fingerprint callable from plain SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_token_ngrams('a b c d', 3) AS g, " +
        "graft_rolling_mink('abcdef', 3, 2) AS fp").collect().head
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    // reference: bottom-2 of the 4 rolling 3-byte window hashes
    val hashes = "abcdef".getBytes("UTF-8").sliding(3)
      .map(_.foldLeft(0L)((h, b) => h * 257L + (b & 0xff))).toSeq
    assert(r.getSeq[Long](1) == hashes.distinct.sorted.take(2))
  }

  test("token segments and deflate length callable from plain SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_token_segments('a b c d e', 2) AS seg, " +
        "graft_deflate_len('hello hello hello hello') AS dl").collect().head
    assert(r.getSeq[String](0) == Seq("a b", "c d", "e"))
    // reference: a direct Deflater recompute at the kernel's pinned level
    val d = new java.util.zip.Deflater(graft.functions.DeflatedLen.Level)
    d.setInput("hello hello hello hello".getBytes("UTF-8"))
    d.finish()
    val buf = new Array[Byte](256)
    var ref = 0L
    while (!d.finished()) ref += d.deflate(buf)
    d.end()
    assert(r.getLong(1) == ref)
  }

  test("gopher counts callable from plain SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_gopher_counts('the cat\n- bullet...\n# x') AS g").collect().head
    // tokens = [the, cat, -, bullet..., #, x] = 6 words, 18 chars;
    // alpha words 4; stop distinct {the} = 1; symbols '#' = 1; 3 lines;
    // 1 bullet line; 1 ellipsis line
    assert(r.getSeq[Long](0) == Seq(6L, 18L, 4L, 1L, 1L, 3L, 1L, 1L))
  }

  // Derived, not a golden: a hardcoded name-set went stale in round 5
  // when two builders landed without a test update. Both registration
  // routes (class injection + register()) iterate the SAME builders
  // map, so asserting the live registry against builders.keySet covers
  // them together, and adding a builder can't silently red the suite.
  test("shingle hashes and overlap coefficient callable from plain SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_overlap_coeff(graft_shingle_hashes('abcde', 3),
        |  graft_shingle_hashes('abcdx', 3)) AS c,
        |  graft_shingle_hashes('ab', 3) AS short""".stripMargin).collect().head
    // {abc,bcd,cde} vs {abc,bcd,cdx}: |A∩B| = 2, min(|A|,|B|) = 3
    assert(math.abs(r.getDouble(0) - 2.0 / 3.0) < 1e-12)
    assert(r.getSeq[Long](1).length == 1) // shorter-than-k → one shingle
  }

  test("percent normalization callable from plain SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_percent_normalize('/doc/%31%34%2f%2A%zz%C3%a9') AS n").collect().head
    assert(r.getString(0) == "/doc/14%2F%2A%zz%C3%A9")
    // RFC 3986 HEXDIG is ASCII-only: fullwidth digits are NOT a valid
    // escape and must stay literal (Character.digit would decode them)
    val fw = spark.sql("SELECT graft_percent_normalize('/doc/%\uFF13\uFF11') AS n")
      .collect().head.getString(0)
    assert(fw == "/doc/%\uFF13\uFF11")
  }

  test("register() exposes exactly the builders map, all resolvable") {
    GraftExtensions.register(spark)
    val registered = spark.sessionState.functionRegistry.listFunction()
      .map(_.funcName).filter(_.startsWith("graft_")).toSet
    assert(registered == GraftExtensions.builders.keySet)
    // every builder resolves and carries usage docs through the SQL front door
    GraftExtensions.builders.keySet.foreach { n =>
      val desc = spark.sql(s"DESCRIBE FUNCTION $n").collect().map(_.getString(0))
      assert(desc.exists(_.contains(n)), s"$n not describable")
    }
  }
}
