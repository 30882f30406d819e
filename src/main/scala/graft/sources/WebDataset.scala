package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar-shard ingestion — the de-facto layout for
  * web-scale multimodal training corpora: a directory of `.tar` shards,
  * each holding per-sample member files that share a key and differ by
  * extension (`000017.txt`, `000017.png`, ...). The reader pairs
  * Spark's `binaryFile` source (shard-parallel scan) with a pure-JDK
  * ustar walk, so samples stream out of archives without any external
  * tar dependency and without ever shuffling the archive bytes — one
  * shard is one task, members explode scan-side.
  *
  * The ustar layout is the public POSIX.1-1988 format: 512-byte
  * headers (name at 0/100, octal size at 124/12, checksum at 148/8,
  * magic "ustar" at 257), payload padded to 512, two zero blocks at
  * the end. [[writeTar]] emits it and [[readTar]] walks it; the two
  * round-trip bit-exactly (pinned in WebDatasetSpec) and real
  * `tar`-created archives of regular files parse the same way.
  *
  * Scale notes: shard files are the parallelism unit (the WebDataset
  * contract — shards are sized for one worker); `binaryFile` holds a
  * whole shard in memory per task, so shard size is bounded by the
  * writer (the usual 100 MB–1 GB). Nothing crosses a shuffle until
  * members are reduced to per-sample scalars.
  */
object WebDataset {

  /** Serialize (name, payload) members as a POSIX ustar archive. */
  def writeTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      require(name.getBytes("UTF-8").length <= 100, s"name too long: $name")
      val hdr = new Array[Byte](512)
      def putStr(off: Int, s: String): Unit = {
        val b = s.getBytes("UTF-8"); System.arraycopy(b, 0, hdr, off, b.length)
      }
      def putOctal(off: Int, len: Int, v: Long): Unit =
        putStr(off, ("%0" + (len - 1) + "o").format(v))
      putStr(0, name)
      putOctal(100, 8, 420)           // mode 0644
      putOctal(108, 8, 0)             // uid
      putOctal(116, 8, 0)             // gid
      putOctal(124, 12, data.length.toLong)
      putOctal(136, 12, 0)            // mtime: fixed for determinism
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte) // chksum spaces
      hdr(156) = '0'                  // typeflag: regular file
      putStr(257, "ustar")            // magic (NUL-terminated via zero fill)
      putStr(263, "00")               // version
      val sum = hdr.foldLeft(0L)((a, b) => a + (b & 0xff))
      putStr(148, "%06o".format(sum)); hdr(154) = 0; hdr(155) = ' '
      out.write(hdr)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // end-of-archive blocks
    out.toByteArray
  }

  /** Walk a ustar archive, returning regular-file (name, payload)
    * members. Stops at the end-of-archive zero block; tolerates
    * truncation by returning the members read so far.
    */
  def readTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    if (bytes == null) return out.toSeq
    var off = 0
    while (off + 512 <= bytes.length) {
      if (bytes(off) == 0) return out.toSeq // end-of-archive
      val nameEnd = {
        var i = off; while (i < off + 100 && bytes(i) != 0) i += 1; i
      }
      val name = new String(bytes, off, nameEnd - off, "UTF-8")
      val sizeStr = new String(bytes, off + 124, 12, "US-ASCII")
        .takeWhile(c => c >= '0' && c <= '7')
      val size = if (sizeStr.isEmpty) 0L else java.lang.Long.parseLong(sizeStr, 8)
      val typeflag = bytes(off + 156)
      val dataOff = off + 512
      if (dataOff + size > bytes.length) return out.toSeq
      if (typeflag == '0' || typeflag == 0)
        out += ((name, java.util.Arrays.copyOfRange(bytes, dataOff,
          (dataOff + size).toInt)))
      off = dataOff + ((size + 511) / 512).toInt * 512
    }
    out.toSeq
  }

  /** Scan a directory of `.tar` shards into (shard, name, content)
    * member rows: `binaryFile` parallelizes over shards, the ustar
    * walk explodes members scan-side. `shard` is the archive's file
    * name without extension.
    */
  def ingest(spark: SparkSession, dir: String): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("shard", StringType),
      StructField("name", StringType),
      StructField("content", BinaryType))))
    // directory + pathGlobFilter, not a `dir/*.tar` glob (the per-root-
    // path driver listing trap — see q277): shard counts reach 10k+ in
    // real WebDataset dumps. recursiveFileLookup pinned false — the
    // contract is a FLAT shard directory (see Warc.ingest's note on
    // why the directory form differs from the glob under subdirs).
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "false")
      .option("pathGlobFilter", "*.tar")
      .load(dir)
      .select(col("path"), col("content"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val path = r.getString(0)
          val shard = path.substring(path.lastIndexOf('/') + 1)
            .stripSuffix(".tar")
          readTar(r.getAs[Array[Byte]](1)).iterator
            .map { case (n, b) => Row(shard, n, b) }
        }
      }(enc)
  }
}
