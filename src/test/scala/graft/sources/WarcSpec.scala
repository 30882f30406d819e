package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WarcSpec extends SparkSpec {

  private val entries = Seq(
    ("response", "http://ex/en/0", "plain body".getBytes("UTF-8")),
    // CRLFs and a fake version line INSIDE the payload must not
    // confuse the walk — Content-Length framing, not delimiters
    ("response", "http://ex/fr/1",
      "line1\r\n\r\nWARC/1.0\r\nsneaky".getBytes("UTF-8")),
    ("response", "http://ex/de/2", Array.emptyByteArray),
    ("metadata", "", "k: v".getBytes("UTF-8")))

  test("WARC write/read round-trips records bit-exactly") {
    val file = Warc.write(entries)
    val recs = Warc.read(file)
    // warcinfo preamble + the four entries
    assert(recs.head.warcType == "warcinfo")
    val body = recs.tail
    assert(body.map(r => (r.warcType, r.targetUri)) ==
      entries.map(e => (e._1, e._2)))
    assert(body.zip(entries).forall { case (r, e) =>
      java.util.Arrays.equals(r.payload, e._3) })
  }

  test("gzip shards decode transparently; whole-file == per-record members") {
    val file = Warc.write(entries)
    val whole = Warc.read(Warc.gzip(file))
    assert(whole.map(_.targetUri) == Warc.read(file).map(_.targetUri))
    // Common Crawl-style: each record its own gzip member, concatenated
    val members = entries.map(e => Warc.gzip(Warc.write(Seq(e))))
    val concat = members.foldLeft(Array.emptyByteArray)(_ ++ _)
    val recs = Warc.read(concat)
    // each member carries its own warcinfo preamble: 2 records/member
    assert(recs.count(_.warcType == "warcinfo") == entries.size)
    assert(recs.filter(_.warcType != "warcinfo")
      .map(_.targetUri) == entries.map(_._2))
  }

  test("truncated and malformed shards yield the valid prefix, no crash") {
    val file = Warc.write(entries)
    val cut = java.util.Arrays.copyOfRange(file, 0, file.length - 40)
    val recs = Warc.read(cut)
    assert(recs.nonEmpty && recs.size < entries.size + 1)
    assert(Warc.read("not a warc at all".getBytes("UTF-8")).isEmpty)
    assert(Warc.read(null).isEmpty)
    assert(Warc.read(Array.emptyByteArray).isEmpty)
  }

  test("ingest explodes shard records scan-side with shard attribution") {
    val dir = java.nio.file.Files.createTempDirectory("warc-spec-").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/a.warc"), Warc.write(entries.take(2)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/b.warc.gz"),
      Warc.gzip(Warc.write(entries.drop(2))))
    val got = Warc.ingest(spark, dir)
      .filter(col("warc_type") === "response")
      .select(col("shard"), col("target_uri"),
        col("content").cast("string").as("body"))
      .orderBy("target_uri")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq
    assert(got == Seq(
      ("b", "http://ex/de/2", ""),
      ("a", "http://ex/en/0", "plain body"),
      ("a", "http://ex/fr/1", "line1\r\n\r\nWARC/1.0\r\nsneaky")))
  }
}
