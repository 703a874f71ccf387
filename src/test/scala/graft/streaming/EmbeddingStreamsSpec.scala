package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.similarity.Similarity

/** The embedding-plane ingestion loop: cell-local semantic dedup
  * against the frozen-centroid IVF index, batch over batch.
  */
class EmbeddingStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toDF("c_id", "c_emb")

  test("ingestBatch: cross-cell admission, within-batch collapse, replay idempotency") {
    spark.catalog.clearCache()
    val root = Files.createTempDirectory("embingest").toString
    val (idx, out) = (s"$root/idx", s"$root/out")
    Similarity.writeIvfIndex(
      vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0)), idx, nlist = 2)

    // 101 near-dups admitted 1 (same cell, cos~0.9999); 102 lands in
    // 2's cell at cos 0.8 < tau (kept); 103/104 are an identical
    // within-batch pair (min 103 keeps)
    EmbeddingStreams.ingestBatch(
      vecs(101L -> Seq(0.999, 0.01), 102L -> Seq(0.6, 0.8),
        103L -> Seq(0.707, 0.707), 104L -> Seq(0.707, 0.707)),
      0L, idx, out, tau = 0.95)
    assert(spark.read.parquet(s"$out/batch_id=0").select("c_id")
      .as[Long].collect().toSet === Set(102L, 103L))

    // 201 duplicates ADMITTED 102 (dropped via the index — proves the
    // append landed); 202 points away from everything (kept)
    EmbeddingStreams.ingestBatch(
      vecs(201L -> Seq(0.6, 0.8), 202L -> Seq(-1.0, 0.0)),
      1L, idx, out, tau = 0.95)
    assert(spark.read.parquet(s"$out/batch_id=1").select("c_id")
      .as[Long].collect().toSet === Set(202L))

    val indexIds = spark.read.parquet(idx).select("c_id").as[Long].collect().toSet
    assert(indexIds === Set(1L, 2L, 102L, 103L, 202L))

    // replaying batch 1 is a no-op (marker short-circuit)
    EmbeddingStreams.ingestBatch(
      vecs(201L -> Seq(0.6, 0.8), 202L -> Seq(-1.0, 0.0)),
      1L, idx, out, tau = 0.95)
    assert(spark.read.parquet(idx).count() === 5L)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "per-batch operator caches must release with the bracket")
  }

  test("semDedupIngest: end-to-end streaming loop over a vector file source") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("embingeststream").toString
    val (in, idx, out, ckpt) = (s"$root/vecs", s"$root/idx", s"$root/out", s"$root/ckpt")
    Similarity.writeIvfIndex(vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0)), idx, nlist = 2)
    vecs(10L -> Seq(0.999, -0.02), 11L -> Seq(0.6, 0.8))
      .coalesce(1).write.mode("append").parquet(in)
    vecs(20L -> Seq(0.6, 0.8), 21L -> Seq(-1.0, 0.0))
      .coalesce(1).write.mode("append").parquet(in)

    val q = EmbeddingStreams.semDedupIngest(
        spark.readStream.schema(spark.read.parquet(in).schema)
          .option("maxFilesPerTrigger", 1).parquet(in),
        idx, out, tau = 0.95)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // 10 drops vs seed 1; 11 keeps; 20 drops vs admitted 11; 21 keeps
    val admitted = spark.read.parquet(out).select("c_id").as[Long].collect().toSet
    assert(admitted === Set(11L, 21L))
    assert(spark.read.parquet(idx).select("c_id").as[Long].collect().toSet
      === Set(1L, 2L, 11L, 21L))
  }
}
