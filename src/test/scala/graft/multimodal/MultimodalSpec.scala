package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {

  test("FakeCodec stub decode is deterministic and shape-correct") {
    val payload = "abcdef".getBytes("UTF-8")
    val m1 = FakeCodec.decode("image", payload)
    val m2 = FakeCodec.decode("image", payload)
    assert(m1 === m2)
    assert(m1.nBytes === 6L)
    assert(m1.width === 16 + ('a'.toInt << 4) + 'b'.toInt)
    assert(m1.height === 16 + ('c'.toInt << 4) + 'd'.toInt)
    assert(m1.nFrames === 1)
    assert(m1.sha.length === 32)
  }

  test("resize and frame-sample stubs preserve partition-safe shapes") {
    val payload = Array.fill[Byte](4096)(7)
    assert(FakeCodec.resize(payload, 8, 8).length === 1)
    assert(FakeCodec.resize(payload, 64, 64).length === 64)
    val frames = FakeCodec.sampleFrames(payload, stride = 2)
    assert(frames.length === 2) // slices 0 and 2 of 4
    assert(frames.forall(_.length == 1024))
  }

  test("withMediaMeta decodes one row per input inside mapPartitions") {
    val s = spark
    import s.implicits._
    val ds = Seq(
      MediaRow(1L, "image", "hello".getBytes("UTF-8")),
      MediaRow(2L, "audio", Array.emptyByteArray))
      .toDS().repartition(2)
    val got = withMediaMeta(ds).collect().sortBy(_.media_id)
    assert(got.length === 2)
    assert(got(0).meta.nBytes === 5L)
    assert(got(1).meta.nBytes === 0L)
    assert(got(1).meta.width === 16) // empty payload: all bytes read as 0
  }

  test("synthesizeFromText + mediaMetaTable round-trips byte lengths") {
    val s = spark
    import s.implicits._
    val docs = Seq((7L, "some text body")).toDF("doc_id", "text")
    val got = mediaMetaTable(s, synthesizeFromText(docs, "doc_id", "text")).head()
    assert(got.getLong(0) === 7L)
    assert(got.getString(1) === "audio") // 7 % 3 == 1
    assert(got.getLong(2) === "some text body".length.toLong)
  }
}
