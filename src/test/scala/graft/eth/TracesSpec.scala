package graft.eth

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Trace dataflow semantics, cases ported from the reference's
  * internal-transaction tests (tests/internal_transactions_tests.py):
  * struct flatten + hex conversion, id assignment, parent-error
  * propagation over a failure subtree.
  */
class TracesSpec extends SparkSpec {

  private val rawSchema = StructType(Seq(
    StructField("blockNumber", LongType),
    StructField("transactionHash", StringType),
    StructField("blockHash", StringType),
    StructField("type", StringType),
    StructField("error", StringType),
    StructField("traceAddress", ArrayType(IntegerType, containsNull = false)),
    StructField("action", StructType(Seq(
      StructField("from", StringType),
      StructField("to", StringType),
      StructField("value", StringType)))),
    StructField("result", StructType(Seq(
      StructField("gasUsed", StringType))))))

  private def raw(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), rawSchema)

  test("flatten splices action/result and hex-converts value and gasUsed") {
    val df = raw(Seq(Row(
      1L, "0xt1", "0xb1", "call", null, Seq(0),
      Row("0xa", "0xb", "0xde0b6b3a7640000"), // 1 ETH in wei
      Row("0x5208")))) // 21000
    val got = Traces.flatten(df).select("value", "gasUsed", "from", "to").head()
    assert(got.getDouble(0) === 1.0)
    assert(got.getLong(1) === 21000L)
    assert(got.getString(2) === "0xa" && got.getString(3) === "0xb")
  }

  test("flatten keeps the reference's gasUsed double round-trip exactly") {
    // int(int(hex,0)/1e18*1e18): the double division loses low bits for
    // values beyond 2^53 * 1e-18... the roundtrip must match Python.
    val df = raw(Seq(Row(
      1L, "0xt1", "0xb1", "call", null, Seq(0),
      Row(null, null, null), Row("0x1b1b1b1b1b1b1b1")))) // 122074041664254385
    val got = Traces.flatten(df).select("gasUsed").head()
    // Python: int(int("0x1b1b1b1b1b1b1b1",0)/1e18*1e18) == 122074041664254384
    assert(got.getLong(0) === 122074041664254384L)
  }

  test("assignIds numbers traces per tx in traceAddress order") {
    val df = raw(Seq(
      Row(1L, "0xt1", "0xb1", "call", null, Seq(0, 1), Row(null, null, null), Row(null)),
      Row(1L, "0xt1", "0xb1", "call", null, Seq.empty[Int], Row(null, null, null), Row(null)),
      Row(1L, "0xt1", "0xb1", "call", null, Seq(0), Row(null, null, null), Row(null)),
      Row(1L, "0xt2", "0xb1", "call", null, Seq.empty[Int], Row(null, null, null), Row(null)),
      Row(1L, null, "0xb1", "reward", null, Seq.empty[Int], Row(null, null, null), Row(null))))
    val got = Traces.assignIds(Traces.flatten(df))
      .select("id", "traceAddress").collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(got("0xt1.0") === Seq.empty[Int])
    assert(got("0xt1.1") === Seq(0))
    assert(got("0xt1.2") === Seq(0, 1))
    assert(got("0xt2.0") === Seq.empty[Int])
    assert(got("0xb1.0") === Seq.empty[Int]) // reward row falls back to blockHash
  }

  test("parent-error marks strict descendants of a failed trace only") {
    val df = raw(Seq(
      Row(1L, "0xt1", "0xb1", "call", null, Seq.empty[Int], Row(null, null, null), Row(null)), // root ok
      Row(1L, "0xt1", "0xb1", "call", "Out of gas", Seq(0), Row(null, null, null), Row(null)), // failed
      Row(1L, "0xt1", "0xb1", "call", null, Seq(0, 0), Row(null, null, null), Row(null)), // child -> flagged
      Row(1L, "0xt1", "0xb1", "call", null, Seq(0, 0, 1), Row(null, null, null), Row(null)), // grandchild -> flagged
      Row(1L, "0xt1", "0xb1", "call", null, Seq(1), Row(null, null, null), Row(null)), // sibling ok
      Row(1L, "0xt1", "0xb1", "call", null, Seq(1, 0), Row(null, null, null), Row(null)), // nephew ok
      Row(1L, "0xt2", "0xb1", "call", null, Seq(0), Row(null, null, null), Row(null)))) // other tx ok
    val got = Traces.propagateParentErrors(Traces.flatten(df))
      .select(col("transactionHash"), col("traceAddress"), col("parent_error"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Int](1)) ->
        (if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toMap
    assert(got(("0xt1", Seq(0, 0))) === Some(true))
    assert(got(("0xt1", Seq(0, 0, 1))) === Some(true))
    assert(got(("0xt1", Seq(0))) === None) // the failed node itself is NOT flagged
    assert(got(("0xt1", Seq.empty[Int])) === None)
    assert(got(("0xt1", Seq(1))) === None)
    assert(got(("0xt1", Seq(1, 0))) === None)
    assert(got(("0xt2", Seq(0))) === None)
  }

  test("genesis allocations become GENESIS_ pseudo-transactions") {
    val s = spark
    import s.implicits._
    val alloc = Seq(("0xaaa", 1000.5), ("0xbbb", 2.0)).toDF("address", "value")
    val got = Traces.genesisTransactions(alloc).orderBy("to").collect()
    assert(got.map(_.getAs[String]("id")).toSeq === Seq("GENESIS_0xaaa", "GENESIS_0xbbb"))
    assert(got.map(_.getAs[Long]("blockNumber")).toSeq === Seq(0L, 0L))
    assert(got.head.getAs[Double]("value") === 1000.5)
  }
}
