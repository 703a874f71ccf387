package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.curation.Curation

/** WebDataset-style tar shards — the interchange format multimodal
  * training loaders actually consume: each sample is a pair of
  * adjacent tar entries `<id>.json` (metadata) + `<id>.bin` (payload
  * bytes), `shards` POSIX tar files per corpus. The container is
  * written and parsed here in pure JVM (ustar is 512-byte headers +
  * padded data — no codec, no dependency), so the Spark-side shape is
  * fully real: content-keyed deterministic shard assignment (same
  * md5-derived key as [[graft.curation.Curation.shuffleShards]]),
  * ascending-id order inside each shard, streaming single-pass writes
  * from executors (never a driver collect), and a `binaryFile` read
  * back that parses each shard where it lands.
  *
  * Determinism: mtime/uid/gid are zeroed and entries are id-sorted, so
  * the SAME corpus produces byte-identical shards on every run and any
  * cluster size — shards can be content-addressed and diffed.
  *
  * Scale notes: one exchange on the shard key; each shard streams
  * through one task. `binaryFile` materializes a whole shard per row
  * on read — by construction shards are sized for exactly that (a
  * loader work item, typically ≤ 1 GB); size `shards` accordingly.
  */
object TarShards {

  private val BlockSize = 512

  /** One ustar header block. Deterministic: mode 0644, uid/gid 0,
    * mtime 0. Names are ASCII-checked and must fit the classic
    * 100-byte field (ids here are content hashes or numeric keys).
    */
  private[multimodal] def header(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](BlockSize)
    def put(s: String, off: Int, max: Int): Unit = {
      val b = s.getBytes(StandardCharsets.US_ASCII)
      require(b.length <= max, s"tar field overflow at $off: '$s'")
      System.arraycopy(b, 0, h, off, b.length)
    }
    require(name.nonEmpty && name.length <= 100 &&
      name.forall(c => c >= 0x20 && c < 0x7f),
      s"tar entry name must be 1-100 printable ASCII chars: '$name'")
    require(size >= 0 && size <= 0x1FFFFFFFFFFL, // 11 octal digits
      s"tar entry too large for a classic header: $size")
    put(name, 0, 100)
    put("0000644", 100, 8)
    put("0000000", 108, 8)
    put("0000000", 116, 8)
    put(f"$size%011o", 124, 12)
    put("00000000000", 136, 12)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0' // regular file
    put("ustar", 257, 6) // NUL-terminated by the zero fill
    h(263) = '0'; h(264) = '0'
    val sum = h.iterator.map(_ & 0xff).sum
    put(f"$sum%06o", 148, 7)
    h(154) = 0 // "NNNNNN\0 " checksum form
    h
  }

  private def pad(n: Long): Int =
    ((BlockSize - (n % BlockSize)) % BlockSize).toInt

  /** Write `(id, payload, meta)` rows as `shard-NNNNN.tar` files under
    * `path` (replaced wholesale). Returns the per-shard summary
    * `(shard, n_docs, payload_bytes)` — bounded by the shard count.
    *
    * Task-side durability: executors rebuild the DRIVER's Hadoop
    * configuration from a broadcast (runtime-set credentials /
    * endpoints included — a bare `new Configuration()` would see only
    * the classpath defaults), and each shard streams to an
    * attempt-unique hidden temp renamed into place on completion — so
    * a retried or speculative task can never collide with (or corrupt)
    * another attempt's output; whichever attempt renames first wins
    * and the loser discards its temp.
    */
  def write(
      df: DataFrame, idCol: String, payloadCol: String, metaCol: String,
      path: String, shards: Int): DataFrame = {
    require(shards > 0, "need at least one shard")
    val spark = df.sparkSession
    import spark.implicits._
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) require(fs.delete(root, true), s"cannot replace $path")
    fs.mkdirs(root)
    val dirStr = root.toString
    val confMap: Map[String, String] = {
      import scala.jdk.CollectionConverters._
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toMap
    }
    val confBc = spark.sparkContext.broadcast(confMap)
    val summaries = df
      .select(
        pmod(Curation.hashSampleKey(col(idCol)), lit(shards.toLong))
          .cast("int").as("shard"),
        col(idCol).cast("string").as("id"),
        col(payloadCol).cast("binary").as("payload"),
        col(metaCol).cast("string").as("meta"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Int, String, Array[Byte], String)]
      .mapPartitions { rows =>
        // One streaming pass: a partition holds whole shard groups
        // (hash-partitioned on the shard id), sorted (shard, id); each
        // row is written out as soon as it arrives — per-row memory.
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        val fsx = new Path(dirStr).getFileSystem(conf)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val done = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
        var cur = -1
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        var tmp: Path = null
        var n = 0L
        var bytes = 0L
        def closeShard(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * BlockSize)) // end-of-archive
          out.close()
          val dest = new Path(dirStr, f"shard-$cur%05d.tar")
          // attempt-unique temp → rename: first finisher wins, a
          // racing speculative attempt discards its own temp
          if (!fsx.rename(tmp, dest)) {
            require(fsx.exists(dest),
              s"rename of $tmp to $dest failed with no winner present")
            fsx.delete(tmp, false)
          }
          done += ((cur, n, bytes))
          out = null; tmp = null
        }
        def entry(name: String, data: Array[Byte]): Unit = {
          out.write(header(name, data.length.toLong))
          out.write(data)
          out.write(new Array[Byte](pad(data.length.toLong)))
        }
        var prevId: String = null
        rows.foreach { case (shard, id, payload, meta) =>
          if (shard != cur) {
            closeShard()
            cur = shard; n = 0L; bytes = 0L
            tmp = new Path(dirStr, f".shard-$shard%05d.tar.attempt-$attempt")
            out = fsx.create(tmp, true)
            prevId = null
          }
          // rows arrive sorted (shard, id), so a duplicate id is
          // ADJACENT — refuse it at write time: two entries sharing a
          // name inside one tar would silently collapse to a single
          // row on read-back, violating the round-trip contract
          require(id != prevId,
            s"duplicate id '$id' in shard $shard — tar entry names must " +
              "be unique; dedup the id column before sharding")
          prevId = id
          entry(s"$id.json",
            (if (meta == null) "" else meta).getBytes(StandardCharsets.UTF_8))
          entry(s"$id.bin", if (payload == null) Array.emptyByteArray else payload)
          n += 1
          bytes += (if (payload == null) 0 else payload.length)
        }
        closeShard()
        done.iterator
      }
      .collect() // shard-count-sized; also the action that runs the write
    spark.createDataFrame(summaries.toSeq.sortBy(_._1))
      .toDF("shard", "n_docs", "payload_bytes")
  }

  /** Parse one tar archive's bytes into (entryName, data) pairs. */
  private[multimodal] def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
    var off = 0
    while (off + BlockSize <= bytes.length) {
      if (bytes(off) == 0) return out.toSeq // end-of-archive zero block
      var end = off
      while (end < off + 100 && bytes(end) != 0) end += 1
      val name = new String(bytes, off, end - off, StandardCharsets.US_ASCII)
      val sizeStr = new String(bytes, off + 124, 12, StandardCharsets.US_ASCII)
        .takeWhile(c => c >= '0' && c <= '7')
      val size = java.lang.Long.parseLong(sizeStr, 8)
      val data = java.util.Arrays.copyOfRange(
        bytes, off + BlockSize, off + BlockSize + size.toInt)
      out += ((name, data))
      off += BlockSize + size.toInt + pad(size)
    }
    out.toSeq
  }

  /** Read a [[write]] directory back as `(shard, id, payload, meta)`.
    * Each shard parses where its bytes land; nothing driver-sized.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val shardRe = ".*shard-(\\d+)\\.tar$".r
    spark.read.format("binaryFile").load(s"$path/shard-*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val shard = p match {
          case shardRe(d) => d.toInt
          case _ => sys.error(s"unexpected shard file name: $p")
        }
        val entries = parseTar(bytes)
        val byBase = entries.groupBy(_._1.replaceAll("\\.(json|bin)$", ""))
        byBase.toSeq.map { case (base, es) =>
          // exactly one .json + one .bin per id: a foreign writer's tar
          // with repeated entry names would otherwise silently collapse
          // to one row here (write() refuses duplicates, but read()
          // must hold the contract on its own)
          require(es.size == 2,
            s"sample $base in $p has ${es.size} tar entries " +
              s"(${es.map(_._1).mkString(", ")}) — expected exactly one " +
              ".json and one .bin; duplicate ids violate the round-trip " +
              "contract")
          val m = es.collectFirst { case (n, d) if n.endsWith(".json") =>
            new String(d, StandardCharsets.UTF_8) }
          val b = es.collectFirst { case (n, d) if n.endsWith(".bin") => d }
          require(m.isDefined && b.isDefined,
            s"sample $base in $p is missing its ${if (m.isEmpty) "json" else "bin"} entry")
          (shard, base, b.get, m.get)
        }
      }
      .toDF("shard", "id", "payload", "meta")
  }
}
