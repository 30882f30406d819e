package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  private def docs(rows: (Long, String)*) = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)
  }

  test("wordCounts ignores empty segments from double spaces") {
    val r = TextOps.wordCounts(docs(1L -> "a b  b c", 2L -> "b"), "text")
      .orderBy(desc("c"), col("word")).collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("b", 3L), ("a", 1L), ("c", 1L)))
  }

  test("qualityFeatures on a known sentence") {
    val r = TextOps.qualityFeatures(
      docs(1L -> "the cat sat, on a mat!"), "doc_id", "text").collect().head
    assert(r.getLong(1) == 6L)            // n_words
    assert(r.getLong(2) == 22L)           // nchars
    // words: the(3) cat(3) sat,(4) on(2) a(1) mat!(4) => 17/6
    assert(r.getDouble(3) == math.rint(17.0 / 6 * 10000) / 10000)
    assert(r.getDouble(4) == math.rint(3.0 / 6 * 10000) / 10000) // the,on,a
    assert(r.getDouble(5) == math.rint(2.0 / 22 * 10000) / 10000) // , !
  }

  test("langId picks marker-majority language; no markers => und") {
    val r = TextOps.langId(docs(
      1L -> "the cat and the dog of it",
      2L -> "der hund und die katze ist",
      3L -> "xyzzy plugh"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.map(_.getString(1)).toSeq == Seq("en", "de", "und"))
  }

  test("rolling fingerprint matches a reference fold") {
    val text = "abc"
    def roll(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 2147483647L)
    val r = TextOps.fingerprints(docs(1L -> text), "doc_id", "text").collect().head
    assert(r.getLong(3) == roll(text)) // roll_fp is 4th column
    assert(r.getString(1).length == 32) // md5 hex
  }

  test("repetitionFeatures on crafted strings") {
    val r = TextOps.repetitionFeatures(docs(
      1L -> "a a a a",        // 1 distinct of 4 words; bigram 'a a' x3
      2L -> "a b c d",        // no repetition
      3L -> "solo"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getDouble(1) == 0.75 && r(0).getDouble(2) ==
      math.rint((1.0 - 1.0 / 3) * 10000) / 10000)
    assert(r(1).getDouble(1) == 0.0 && r(1).getDouble(2) == 0.0)
    assert(r(2).getDouble(1) == 0.0 && r(2).getDouble(2) == 0.0) // no bigrams
  }

  test("piiFeatures counts emails, urls, digit runs") {
    val r = TextOps.piiFeatures(docs(
      1L -> "mail me at a.b@example.com or c@d.org see https://x.y/z id 1234567890"),
      "doc_id", "text").collect().head
    assert(r.getLong(1) == 2L) // emails
    assert(r.getLong(2) == 1L) // urls
    assert(r.getLong(3) == 1L) // long digit runs
  }

  test("regexTokens lowercases and splits on non-alphanumerics") {
    val r = docs(1L -> "Hello, World!42 foo_bar")
      .select(TextOps.regexTokens(col("text"))).collect().head
    assert(r.getSeq[String](0) == Seq("hello", "world", "42", "foo", "bar"))
  }

  test("bm25Search ranks higher-tf shorter docs first, drops non-matches") {
    val corpus = docs(
      1L -> "data data spark",          // tf(data)=2, short
      2L -> "data engine",              // tf(data)=1
      3L -> "other words entirely",     // no query terms => absent
      4L -> "data data data data data data data data filler pad pad pad")
    val r = TextOps.bm25Search(corpus, "doc_id", "text",
        terms = Seq("data"), topN = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1))
    assert(r.map(_._1).toSet == Set(1L, 2L, 4L), "only matching docs score")
    val byId = r.toMap
    // saturating tf: doc4 (tf 8) beats doc1 (tf 2) beats doc2 (tf 1)
    assert(byId(4L) > byId(1L) && byId(1L) > byId(2L), r.mkString(","))
    assert(r.forall(_._2 > 0))
    // output already ordered: rounded score desc, id tiebreak
    assert(r.map(_._1).toSeq == Seq(4L, 1L, 2L))
  }

  test("chunk windows words by size/stride with overlap, short tail kept") {
    // 70 words, size 8, stride 6 => ceil((70-8)/6)+1 = 12 chunks;
    // chunk i = words [6i, 6i+8); last chunk starts at 66, holds 4
    val text = (0 until 70).map(i => s"w$i").mkString(" ")
    val r = TextOps.chunk(docs(1L -> text), "doc_id", "text",
        size = 8, stride = 6)
      .orderBy("chunk_idx").collect()
    assert(r.length == 12)
    r.zipWithIndex.foreach { case (row, i) =>
      val ws = row.getString(2).split(" ").toSeq
      assert(ws.head == s"w${6 * i}", s"chunk $i start")
      assert(ws.length == math.min(8, 70 - 6 * i), s"chunk $i len")
      assert(row.getLong(3) == ws.length)
    }
    // consecutive chunks overlap by size - stride = 2 words
    assert(r(0).getString(2).split(" ").takeRight(2).toSeq ==
      r(1).getString(2).split(" ").take(2).toSeq)
    // short doc: one chunk, intact
    val one = TextOps.chunk(docs(2L -> "a b c"), "doc_id", "text", 8, 6)
      .collect()
    assert(one.length == 1 && one.head.getString(2) == "a b c")
  }

  test("tfidfTopTerms ranks a doc-specific term above corpus-wide ones") {
    // "zebra" appears only in doc 1; "common" appears in all three docs
    // (idf = ln(1) = 0, so it can never outrank a distinctive term)
    val corpus = docs(
      1L -> "common zebra zebra apple",
      2L -> "common apple banana",
      3L -> "common banana banana banana")
    val r = TextOps.tfidfTopTerms(corpus, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rn").collect()
    val top1 = r.filter(_.getLong(0) == 1L).map(_.getString(1)).toSeq
    assert(top1.head == "zebra", r.mkString(","))
    // hand-check the top score: tf=2, df=1, N=3 -> 2*ln(3)
    val z = r.filter(x => x.getLong(0) == 1L && x.getString(1) == "zebra").head
    assert(z.getDouble(2) == math.rint(2 * math.log(3.0) * 10000) / 10000)
    // "common" (df = N) scores zero everywhere => ranked by term asc last
    assert(r.forall(x =>
      x.getString(1) != "common" || x.getDouble(2) == 0.0))
    // every doc gets exactly k rows with rn 1..k
    assert(r.groupBy(_.getLong(0)).forall(_._2.map(_.getInt(3)).sorted
      .toSeq == Seq(1, 2)))
  }

  test("qualityScore: clean prose above punctuation soup; gate at 0.5") {
    val r = TextOps.qualityScore(docs(
      1L -> "the cat sat on a mat and the dog sat on the log for a while",
      2L -> "!!! ??? ;;; ... !!! ??? ;;; buy now !!! ??? ;;;"),
      "doc_id", "text").orderBy("doc_id").collect()
    val clean = r(0).getDouble(1); val spam = r(1).getDouble(1)
    assert(clean > spam, s"clean=$clean spam=$spam")
    assert(r(0).getLong(2) == 1L) // clean prose passes the 0.5 gate
    assert(r(1).getLong(2) == 0L) // punctuation soup fails it
    assert(r.forall(x => x.getDouble(1) >= 0.0 && x.getDouble(1) <= 1.0))
  }

  test("unigramLogProb matches the hand-computed model; rare text scores lower") {
    import spark.implicits._
    // corpus counts: a:3 (docs 1+2), b:1, z:2 -> total 6
    val docs = Seq((1L, "a a b"), (2L, "a"), (3L, "z z"))
      .toDF("doc_id", "text")
    val r = TextOps.unigramLogProb(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2))))
      .toMap
    def lp(c: Long) = math.log(c / 6.0)
    assert(r(1L)._1 == 3L)
    assert(math.abs(r(1L)._2 - (2 * lp(3) + lp(1)) / 3) < 1e-3, r(1L))
    assert(math.abs(r(2L)._2 - lp(3)) < 1e-3)
    assert(math.abs(r(3L)._2 - lp(2)) < 1e-3)
    // the common-word doc is "less surprising" than the rare-word one
    assert(r(2L)._2 > r(1L)._2 && r(1L)._2 > r(3L)._2)
  }

  test("normalizeText collapses case/punct/whitespace variants to one key") {
    val variants = docs(
      1L -> "The quick  brown fox!",
      2L -> "the QUICK brown-fox",
      3L -> "  the quick brown... FOX  ",
      4L -> "a genuinely different document")
    val keys = variants.select(TextOps.normalizeText(col("text")))
      .collect().map(_.getString(0))
    assert(keys.take(3).toSet == Set("the quick brown fox"))
    assert(keys(3) == "a genuinely different document")
  }

  test("gopherFilter: violating docs are rejected, clean doc passes") {
    import spark.implicits._
    val good = "the cat and the dog run fast to the park and play in sun"
    val docs = Seq(
      1L -> good,                                   // passes all rules
      2L -> "too few words here",                   // n_words < 10
      3L -> ("x " * 100).trim,                      // mean word len < 3
      4L -> ("the quick brown fox jumps over lazy dogs " +
             "#### $$$$ %%%% @@@@ &&&& !!!! ^^^^ ****"), // symbols > 10%
      5L -> ("the " + ("12345 9876 " * 5) + "and end of it now"), // alpha < 0.8
      6L -> "cats dogs birds fish mice run jump swim fly crawl quickly today")
      .toDF("doc_id", "text")                       // 6: no stopword hits
    val out = TextOps.gopherFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(out(1L) == 1L, "baseline doc must pass")
    assert(out(2L) == 0L, "short doc must fail word-count rule")
    assert(out(3L) == 0L, "1-char words must fail mean-length rule")
    assert(out(4L) == 0L, "symbol-heavy doc must fail symbol rule")
    assert(out(5L) == 0L, "digit-word doc must fail alpha-word rule")
    assert(out(6L) == 0L, "stopword-free doc must fail stop-hits rule")
  }

  test("phraseSearch counts overlapping and repeated n-word matches") {
    val d = docs(
      1L -> "big hash join and hash join again",   // 2 hits
      2L -> "hash only join here",                 // adjacency broken: 0
      3L -> "a a a")                               // overlap probe below
    val r = TextOps.phraseSearch(d, "doc_id", "text", Seq("hash", "join"))
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((1L, 2L)))
    // overlapping occurrences each count: "a a a" has two "a a" starts
    val o = TextOps.phraseSearch(d, "doc_id", "text", Seq("a", "a"))
      .collect().head
    assert((o.getLong(0), o.getLong(1)) == (3L, 2L))
    // 3-word phrase uses two leads
    val t3 = TextOps.phraseSearch(d, "doc_id", "text",
      Seq("hash", "join", "again")).collect()
    assert(t3.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((1L, 1L)))
  }

  test("proximitySearch counts in-window co-occurrences, either order") {
    val d = docs(
      1L -> "hash x x x x join",        // distance 5: 1 hit
      2L -> "hash x x x x x join",      // distance 6: 0 hits
      3L -> "join then the hash",       // reversed order, distance 3: 1
      4L -> "hash join hash",           // pairs (0,1) and (2,1): 2 hits
      5L -> "no terms here")
    val r = TextOps.proximitySearch(d, "doc_id", "text", "hash", "join",
        window = 5)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r == Seq((1L, 1L), (3L, 1L), (4L, 2L)))
  }

  test("rrfFuse matches hand computation and handles single-list ids") {
    import spark.implicits._
    val l1 = Seq(10L -> 1L, 20L -> 2L, 30L -> 3L).toDF("doc_id", "rank")
    val l2 = Seq(20L -> 1L, 40L -> 2L).toDF("doc_id", "rank")
    val r = TextOps.rrfFuse(Seq(l1, l2), "doc_id", topN = 10)
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getLong(2)))
    val byId = r.map(x => x._1 -> x).toMap
    // 20 appears in both lists: 1/62 + 1/61
    assert(byId(20L)._2 == BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(byId(20L)._3 == 2L)
    assert(byId(40L)._3 == 1L)               // single-list id still scored
    assert(r.head._1 == 20L)                 // both-lists id wins the fusion
    assert(r.map(_._1).toSet == Set(10L, 20L, 30L, 40L))
  }

  test("gopherFilter features match hand computation") {
    import spark.implicits._
    val docs = Seq(1L -> "the cat is on the mat").toDF("doc_id", "text")
    val r = TextOps.gopherFilter(docs, "doc_id", "text").collect().head
    assert(r.getLong(1) == 6L)                       // n_words
    assert(r.getDouble(2) == 2.6667)                 // mean word len, round 4
    assert(r.getDouble(3) == 0.0)                    // symbol_frac
    assert(r.getDouble(4) == 1.0)                    // alpha_word_frac
    assert(r.getLong(5) == 4L)                       // the, is, on, the
    assert(r.getLong(6) == 0L)                       // fails min word count
  }

  test("jsonProfile recovers presence and type histogram per key") {
    import spark.implicits._
    val docs = Seq(
      """{"a": 1, "b": "x", "c": true}""",
      """{"a": -42, "b": "7up"}""",           // "7up" is str (not digit-only)
      """{"b": "y", "c": false}""",
      """{"a": 3}""").toDF("j")
    val got = TextOps.jsonProfile(docs, "j").orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("a", 3L, 3L, 0L, 0L, 750000L),
      ("b", 3L, 0L, 0L, 3L, 750000L),
      ("c", 2L, 0L, 2L, 0L, 500000L)))
    // partitioning-invariant (pure aggregation)
    val again = TextOps.jsonProfile(docs.repartition(5), "j")
      .orderBy("key").collect().map(_.toString).toSeq
    assert(again == got.map(t => s"[${t.productIterator.mkString(",")}]").toSeq)
  }

  test("canonicalUrl applies every normalization rule") {
    import spark.implicits._
    val cases = Seq(
      // case + default port + tracking param + unsorted query + fragment
      ("HTTP://Ex.COM:80/P/1?b=2&utm_source=f&a=1#x", "http://ex.com/P/1?a=1&b=2"),
      // https default port; non-default port preserved
      ("https://A.b:443/x", "https://a.b/x"),
      ("https://a.b:8443/x", "https://a.b:8443/x"),
      // http keeps :443 (not its default)
      ("http://a.b:443/x", "http://a.b:443/x"),
      // empty path -> "/", root slash kept
      ("http://a.b", "http://a.b/"),
      ("http://a.b/", "http://a.b/"),
      // one trailing slash collapsed on a non-root path
      ("http://a.b/p/q/", "http://a.b/p/q"),
      // all params tracking -> no query at all
      ("http://a.b/p?utm_x=1&gclid=2&fbclid=3&ref=4", "http://a.b/p"),
      ("http://a.b/p?ref=4&z=9&fbclid=3", "http://a.b/p?z=9"))
    val got = cases.map(_._1).toDF("u")
      .select(TextOps.canonicalUrl(col("u"))).collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalUrl($in) = $g, want $want")
    }
  }

  test("htmlToText strips hazards and decodes entities exactly once") {
    import spark.implicits._
    val cases = Seq(
      // script containing '<' and a fake tag; style; comment
      ("<script>if(1<2){var x=\"<p>\";}</script><style>p{}</style>" +
        "<!-- hi --><p>a b</p>", "a b"),
      // block closers become newlines, inline tags become spaces
      ("<h1>T</h1><p>x <b>y</b> z</p><ul><li>i1</li><li>i2</li></ul>",
        "T\nx y z\ni1\ni2"),
      // &amp;lt; decodes ONCE to "&lt;", never to "<"
      ("<p>a &amp;lt; b &lt; c &nbsp;d &#39;e&#39; &quot;f&quot;</p>",
        "a &lt; b < c d 'e' \"f\""),
      // whitespace collapse + trim
      ("  <div>  a   b  </div>  \n <p> c </p> ", "a b\nc"),
      // case-insensitive tags, attributes on closers
      ("<P CLASS=\"x\">A</P  ><BR/>B", "A\nB"))
    val got = cases.map(_._1).toDF("h")
      .select(TextOps.htmlToText(col("h"))).collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"htmlToText($in) = ${g.replace("\n", "\\n")}")
    }
  }

  test("htmlLinks extracts hrefs; scriptCount + dominantScript classify") {
    import spark.implicits._
    val links = Seq("<a href=\"http://a.b/x\">1</a> text " +
      "<A HREF=\"https://c.d/y?q=1\">2</A> <a class=\"z\" " +
      "href=\"http://e.f/\">3</a> <a name=\"no-href\">4</a>")
      .toDF("h").select(TextOps.htmlLinks(col("h")))
      .collect().head.getSeq[String](0)
    assert(links == Seq("http://a.b/x", "https://c.d/y?q=1", "http://e.f/"))
    val df = Seq(("abc привет мир xyz", 1L), ("数据处理 ab", 2L)).toDF("t", "id")
      .select(col("id"),
        TextOps.scriptCount(col("t"), "A-Za-z").as("lat"),
        TextOps.scriptCount(col("t"), "\\x{0400}-\\x{04FF}").as("cyr"),
        TextOps.scriptCount(col("t"), "\\x{0370}-\\x{03FF}").as("grk"),
        TextOps.scriptCount(col("t"), "\\x{4E00}-\\x{9FFF}").as("cjk"))
      .orderBy("id").collect()
    assert(df(0).getLong(1) == 6 && df(0).getLong(2) == 9) // abcxyz, приветмир
    assert(df(1).getLong(1) == 2 && df(1).getLong(4) == 4)
    val dom = Seq((10L, 2L, 0L, 0L), (3L, 9L, 0L, 0L), (0L, 0L, 2L, 1L),
      (0L, 0L, 0L, 5L), (2L, 2L, 2L, 2L))
      .toDF("l", "c", "g", "j")
      .select(TextOps.dominantScript(col("l"), col("c"), col("g"), col("j")))
      .collect().map(_.getString(0)).toSeq
    assert(dom == Seq("latin", "cyrillic", "greek", "cjk", "latin"))
  }

  test("html table extraction recovers (row, col, cell) with cleanup") {
    import spark.implicits._
    val h = "<table><TR><th> Name </th><th>N</th></TR>" +
      "<tr class=\"d\"><td><b>alpha</b>&nbsp;x</td><td>1</td></tr>" +
      "<tr><td>b&amp;c</td><td> 2 </td></tr></table>"
    val got = Seq(h).toDF("h")
      .select(posexplode(TextOps.htmlTableRows(col("h"))).as(Seq("r", "row")))
      .select((col("r") + 1).as("row_idx"),
        posexplode(TextOps.htmlRowCells(col("row"))).as(Seq("c", "cell0")))
      .select(col("row_idx"), (col("c") + 1).as("col_idx"),
        TextOps.cellText(col("cell0")).as("cell"))
      .orderBy("row_idx", "col_idx")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((1, 1, "Name"), (1, 2, "N"), (2, 1, "alpha x"),
      (2, 2, "1"), (3, 1, "b&c"), (3, 2, "2")))
  }

  test("domainSuffixes expands the dot-boundary chain, longest first") {
    import spark.implicits._
    val got = Seq("a.b.com", "com", "x.y").toDF("h")
      .select(TextOps.domainSuffixes(col("h")))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("a.b.com", "b.com", "com"), List("com"),
      List("x.y", "y")))
  }

  test("blocklistMatch: subdomain semantics, most-specific rule wins") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ads.bad.com"),   // matches bad.com via suffix
      (2L, "bad.com"),       // exact
      (3L, "notbad.com"),    // must NOT match (dot boundary)
      (4L, "deep.ads.bad.com"), // matches both ads.bad.com and bad.com
      (5L, "clean.org")).toDF("doc_id", "host")
    val rules = Seq("bad.com", "ads.bad.com").toDF("rule")
    val got = TextOps.blocklistMatch(docs, "doc_id", "host", rules, "rule")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(got == Seq((1L, "ads.bad.com"), (2L, "bad.com"), (3L, null),
      (4L, "ads.bad.com"), (5L, null)))
    // doc 1: its own first matching suffix is ads.bad.com (pos 1 of its
    // chain) — the most specific rule; doc 4's chain hits ads.bad.com
    // before bad.com too
    // plan pin: the rule join is a broadcast equi-join on the suffix
    // column, never a LIKE theta join
    val plan = TextOps.blocklistMatch(docs, "doc_id", "host", rules, "rule")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("parseRobots: UA-run groups, comments, empty-Disallow idiom") {
    import spark.implicits._
    val body =
      """# top comment
        |User-agent: gptbot
        |Disallow: /only-gpt
        |
        |User-agent: bingbot
        |User-agent: *
        |Disallow: /private  # trailing comment
        |Allow: /private/ok
        |Disallow:
        |
        |User-agent: otherbot
        |Disallow: /only-other""".stripMargin
    val rules = TextOps.parseRobots(
        Seq(("h.com", body)).toDF("host", "body"), "host", "body")
      .orderBy("prefix")
      .collect().map(r => (r.getBoolean(1), r.getString(2))).toSeq
    // only the *-group's non-empty rules survive
    assert(rules == Seq((false, "/private"), (true, "/private/ok")))
  }

  test("robotsVerdict: longest prefix wins, tie -> allow, no rule -> allow") {
    import spark.implicits._
    val rules = Seq(
      ("h.com", false, "/private"),
      ("h.com", true, "/private/ok"),
      ("h.com", false, "/dup"),
      ("h.com", true, "/dup")) // same length: allow wins
      .toDF("host", "allow", "prefix")
    val urls = Seq(
      (1L, "h.com", "/private/x"),    // blocked
      (2L, "h.com", "/private/ok/x"), // longer allow wins
      (3L, "h.com", "/privateer"),    // raw prefix: blocked
      (4L, "h.com", "/free"),         // no match
      (5L, "h.com", "/dup/x"),        // tie -> allow
      (6L, "no-robots.org", "/private/x")) // host without rules
      .toDF("doc_id", "host", "path")
    val got = TextOps.robotsVerdict(urls, "doc_id", "host", "path", rules)
      .orderBy("doc_id").collect().map(_.getBoolean(3)).toSeq
    assert(got == Seq(false, true, false, true, true, true))
  }

  test("chunkTokens: stride, overlap, and lossless coverage") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val out = TextOps.chunkTokens(docs(1L -> text, 2L -> "a b c",
        3L -> "", 4L -> "  "), "doc_id", "text",
        maxTokens = 10, overlap = 3)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // stride 7: starts 0,7,...,98; last chunk short
    assert(d1.map(_.getLong(2)).toSeq == (0L to 98L by 7L))
    assert(d1.forall(_.getLong(3) <= 10L))
    assert(d1.last.getLong(3) == 2L) // tokens 99..100
    // every chunk's text is exactly its token window
    d1.foreach { r =>
      val start = r.getLong(2).toInt
      val want = (start + 1 to math.min(start + 10, 100))
        .map(i => s"t$i").mkString(" ")
      assert(r.getString(4) == want)
    }
    // consecutive chunks share exactly `overlap` tokens (the tail
    // chunk may be shorter than the overlap; its window-exactness is
    // already pinned above)
    d1.sliding(2).foreach { case Array(a, b) =>
      val at = a.getString(4).split(" ")
      val bt = b.getString(4).split(" ")
      if (bt.length >= 3) assert(at.takeRight(3).sameElements(bt.take(3)))
    case _ => ()
    }
    // a short doc is one whole chunk; empty/whitespace docs vanish
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getString(4) == "a b c")
    assert(!out.exists(r => r.getLong(0) == 3L || r.getLong(0) == 4L))
    // coverage: dropping each chunk's first `overlap` tokens (except
    // chunk 0) and concatenating reconstructs the token stream
    val recon = d1.zipWithIndex.flatMap { case (r, i) =>
      val ts = r.getString(4).split(" ").toSeq
      if (i == 0) ts else ts.drop(3)
    }
    assert(recon.toSeq == (1 to 100).map(i => s"t$i"))
    intercept[IllegalArgumentException] {
      TextOps.chunkTokens(docs(1L -> "x"), "doc_id", "text", 5, 5)
    }
    ()
  }
}
