package graft.sources

import graft.SparkSpec
import graft.functions.ZOrderFunctions
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("morton kernel interleaves bits; bucketize binary-searches bounds") {
    assert(ZOrderFunctions.mortonCode(0, 0) === 0L)
    assert(ZOrderFunctions.mortonCode(1, 0) === 1L)
    assert(ZOrderFunctions.mortonCode(0, 1) === 2L)
    assert(ZOrderFunctions.mortonCode(3, 3) === 15L)
    assert(ZOrderFunctions.mortonCode(0xffffffffL, 0) === 0x5555555555555555L)
    assert(ZOrderFunctions.bucketOf(0.5, Array(1.0, 10.0)) === 0)
    assert(ZOrderFunctions.bucketOf(5.0, Array(1.0, 10.0)) === 1)
    assert(ZOrderFunctions.bucketOf(99.0, Array(1.0, 10.0)) === 2)
    // expression route agrees with the driver-side kernel
    import spark.implicits._
    val viaExpr = Seq((3L, 5L)).toDF("a", "b")
      .select(ZOrderFunctions.morton(col("a"), col("b"))).head().getLong(0)
    assert(viaExpr === ZOrderFunctions.mortonCode(3, 5))
  }

  test("morton order preserves quadrant locality") {
    // all points of a 2^k-aligned quadrant occupy one contiguous morton
    // range — the property that makes file-level min/max stats selective
    val pts = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val coded = pts.map { case (a, b) =>
      (a, b, ZOrderFunctions.mortonCode(a, b))
    }.sortBy(_._3)
    // quadrant = (a/8, b/8); each of the 4 quadrants must be contiguous
    val quadrantsInOrder = coded.map { case (a, b, _) => (a / 8, b / 8) }
    val changes = quadrantsInOrder.zip(quadrantsInOrder.tail)
      .count { case (x, y) => x != y }
    assert(changes === 3, s"quadrants interleave in morton order: $changes")
  }

  test("z-ordered files cover rectangles: BOTH dims stay narrow per file") {
    val ev = graft.Tables.load(spark, sf("sf0.001"), "events")
      .select("user_id", "event_id", "event_type")
    val base = java.nio.file.Files.createTempDirectory("graft_z").toString
    SnapshotStore.writeZOrdered(ev, s"$base/z", "user_id", "event_id",
      numFiles = 8, buckets = 256)
    // the single-dimension alternative: range-sorted by user_id only
    ev.repartitionByRange(8, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.parquet(s"$base/naive")

    def meanExtent(path: String, c: String): Double = {
      val exts = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c).cast("long")) - min(col(c).cast("long")))
          .as("ext"))
        .collect().map(_.getAs[Long]("ext").toDouble)
      exts.sum / exts.length
    }
    val zU = meanExtent(s"$base/z", "user_id")
    val zE = meanExtent(s"$base/z", "event_id")
    val nU = meanExtent(s"$base/naive", "user_id")
    val nE = meanExtent(s"$base/naive", "event_id")
    // naive clusters user_id tightly but leaves event_id at ~full range;
    // z-order must cut the event_id extent substantially while keeping
    // user_id far below full range
    assert(zE < nE * 0.6, s"event_id extent not clustered: z=$zE naive=$nE")
    val fullU = ev.agg(max("user_id").cast("long") -
      min("user_id").cast("long")).head().getLong(0).toDouble
    assert(zU < fullU * 0.6, s"user_id extent degenerate: z=$zU full=$fullU")
    // row set round-trips exactly
    assert(spark.read.parquet(s"$base/z").count() === ev.count())
    val _ = nU // naive user extent: tight by construction, not asserted
  }
}
