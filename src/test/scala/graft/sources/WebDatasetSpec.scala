package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WebDatasetSpec extends SparkSpec {

  private val entries = Seq(
    "0.txt" -> "doc-0".getBytes("UTF-8"),
    "0.png" -> Array.tabulate[Byte](700)(i => (i % 251).toByte), // >512: pads
    "1.txt" -> "doc-1".getBytes("UTF-8"),
    "1.png" -> Array.emptyByteArray)                             // zero-length

  test("ustar writeTar/readTar round-trip bit-exactly; layout is valid") {
    val tar = WebDataset.writeTar(entries)
    assert(tar.length % 512 == 0)
    // end-of-archive: two zero blocks
    assert(tar.takeRight(1024).forall(_ == 0))
    // header checksum recomputes (the field itself counted as spaces)
    val hdr = tar.slice(0, 512).clone()
    val stored = java.lang.Long.parseLong(
      new String(hdr, 148, 6, "US-ASCII"), 8)
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    assert(hdr.foldLeft(0L)((a, b) => a + (b & 0xff)) == stored)
    assert(new String(tar, 257, 5, "US-ASCII") == "ustar")
    val back = WebDataset.readTar(tar)
    assert(back.map(_._1) == entries.map(_._1))
    assert(back.zip(entries).forall { case ((_, a), (_, b)) =>
      java.util.Arrays.equals(a, b) })
  }

  test("system tar lists the same members (interop with real archives)") {
    val tarBin = new java.io.File("/usr/bin/tar")
    assume(tarBin.exists() || new java.io.File("/bin/tar").exists())
    val f = java.nio.file.Files.createTempFile("graft-wds-", ".tar")
    java.nio.file.Files.write(f, WebDataset.writeTar(entries))
    val p = new ProcessBuilder("tar", "-tf", f.toString).start()
    val names = scala.io.Source.fromInputStream(p.getInputStream)
      .getLines().toList
    assert(p.waitFor() == 0)
    assert(names == entries.map(_._1).toList)
  }

  test("truncated shard yields the readable prefix, no throw") {
    val tar = WebDataset.writeTar(entries)
    val cut = java.util.Arrays.copyOfRange(tar, 0, tar.length - 1400)
    val back = WebDataset.readTar(cut)
    assert(back.nonEmpty && back.length < entries.length)
    assert(back.head._1 == "0.txt")
  }

  test("ingest explodes shard members with shard names, binaryFile-parallel") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wds-dir-")
    java.nio.file.Files.write(dir.resolve("shard-00000.tar"),
      WebDataset.writeTar(entries.take(2)))
    java.nio.file.Files.write(dir.resolve("shard-00001.tar"),
      WebDataset.writeTar(entries.drop(2)))
    val got = WebDataset.ingest(spark, dir.toString)
      .select(col("shard"), col("name"), length(col("content")).as("len"))
      .orderBy("shard", "name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq == Seq(
      ("shard-00000", "0.png", 700), ("shard-00000", "0.txt", 5),
      ("shard-00001", "1.png", 0), ("shard-00001", "1.txt", 5)))
  }
}
