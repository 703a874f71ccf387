package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ZOps

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches a bit-by-bit reference and is order-monotone per quadrant") {
    def ref(x: Long, y: Long): Long =
      (0 until 31).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (123456789L, 987654L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (0xFFFFFFFFFFL, 5L)) // >31 bits masks down
    cases.foreach { case (x, y) =>
      assert(ZOps.interleave(x, y) === ref(x & 0x7FFFFFFFL, y & 0x7FFFFFFFL),
        s"($x, $y)")
    }
    // strictly positive (sign-safe on engines with checked int64 shifts)
    assert(ZOps.interleave(0x7FFFFFFFL, 0x7FFFFFFFL) > 0L)
  }

  test("z-ordered layout yields tight 2-D file boxes; single-dim sort does not prune the other dim") {
    // 64x64 grid of (x, y) points, shuffled-ish order by construction
    val rows = (0 until 4096).map { i =>
      val x = (i * 2654435761L) % 64
      val y = (i * 40503L) % 64
      (i.toLong, x, y)
    }
    val df = rows.toDF("id", "x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString + "/z"
    val xDir = java.nio.file.Files.createTempDirectory("zorder").toString + "/x"
    Layout.writeZOrdered(df, zDir, col("x"), col("y"), files = 16)
    // baseline: same file count, sorted on x only
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)
    val zBoxes = Layout.fileBoxes(spark, zDir, "x", "y")
    val xBoxes = Layout.fileBoxes(spark, xDir, "x", "y")
    // predicate on the NON-sorted dimension: y in [8,15], x anything.
    // x-sorted files each span all of y -> nothing prunes (all 16
    // files touched); z-ordered files bound both dims -> only the
    // y-low band of curve blocks matches
    val zt = Layout.filesTouched(zBoxes, 0, 63, 8, 15)
    val xt = Layout.filesTouched(xBoxes, 0, 63, 8, 15)
    assert(xt >= 12L, s"x-sorted layout should touch nearly every file, got $xt")
    assert(zt <= 8, s"z-ordered should prune to the y-band blocks, got $zt")
    assert(zt * 2 <= xt, s"z-order should at least halve files touched: $zt vs $xt")
    // and a tight 2-D box still prunes well under z-order
    assert(Layout.filesTouched(zBoxes, 8, 15, 8, 15) <= 4)
    // and the layout loses no rows
    assert(spark.read.parquet(zDir).count() === 4096L)
  }
}
