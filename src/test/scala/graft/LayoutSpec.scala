package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.functions.zorder_key
import org.scalatest.funsuite.AnyFunSuite

/** Why q75's layout key exists: writing 100 TB range-partitioned + sorted
  * by a SINGLE column gives parquet min/max pruning on that column only —
  * every file spans the full range of every OTHER column, so a filter on a
  * second dimension still reads everything. The Morton key interleaves two
  * dimensions, so each file covers a small tile of the (x, y) plane and
  * zone maps prune filters on EITHER column.
  *
  * This spec measures exactly that, with files modeled as range partitions
  * (what a sorted write produces): on a uniform grid, a narrow y-band query
  * must touch every x-sorted partition but only a bounded fraction of the
  * z-ordered ones.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("layout-spec")
    .getOrCreate()

  /** Per-"file" (range partition) zone maps: (min x, max x, min y, max y). */
  private def zoneMaps(df: DataFrame, key: String): Array[(Int, Int, Int, Int)] =
    df.repartitionByRange(16, col(key)).sortWithinPartitions(col(key))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))

  test("z-order layout prunes a second-dimension filter that a single-column sort cannot") {
    // 64×64 uniform grid — each partition holds ~256 rows either way; only
    // the SHAPE of its bounding box differs between the two layouts
    val pts = spark.range(4096).select(
      (col("id") % 64).cast("int").as("x"),
      expr("id DIV 64").cast("int").as("y"))
    val byX = zoneMaps(pts.withColumn("k", col("x").cast("long")), "k")
    val byZ = zoneMaps(pts.withColumn("k", zorder_key(col("x"), col("y"), 6)), "k")
    assert(byX.length == 16 && byZ.length == 16)

    // zone-map pruning for `y BETWEEN 8 AND 11`: a partition is read iff
    // its [y0, y1] intersects the band
    def touched(zm: Array[(Int, Int, Int, Int)], lo: Int, hi: Int): Int =
      zm.count { case (_, _, y0, y1) => y1 >= lo && y0 <= hi }
    val xTouched = touched(byX, 8, 11)
    val zTouched = touched(byZ, 8, 11)
    assert(xTouched == 16,
      s"x-sorted files each span all y values — no pruning possible (got $xTouched/16)")
    assert(zTouched <= 8,
      s"z-ordered files tile the plane — a 1/16-height band must prune most files (got $zTouched/16)")

    // and the FIRST dimension still prunes fine under z-order
    def touchedX(zm: Array[(Int, Int, Int, Int)], lo: Int, hi: Int): Int =
      zm.count { case (x0, x1, _, _) => x1 >= lo && x0 <= hi }
    assert(touchedX(byZ, 8, 11) <= 8, "x-band filters must also prune under z-order")
  }

  test("zorderWrite: REAL written parquet files tile both dimensions where an " +
      "x-sorted write leaves every file spanning all of y") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-write")
    val pts = spark.range(4096).select(
      (col("id") % 64).cast("int").as("x"),
      expr("id DIV 64").cast("int").as("y"))
    graft.operators.LayoutOps.zorderWrite(pts, "x", "y", 16, dir.resolve("z").toString, bits = 6)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(dir.resolve("x").toString)
    // per-FILE bounding boxes — what parquet footer min/max stats expose
    def fileBoxes(path: String): Array[(Int, Int, Int, Int)] =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val z = fileBoxes(dir.resolve("z").toString)
    val xs = fileBoxes(dir.resolve("x").toString)
    assert(z.length >= 8 && xs.length >= 8, s"${z.length} z-files, ${xs.length} x-files")
    def touched(b: Array[(Int, Int, Int, Int)], lo: Int, hi: Int): Int =
      b.count { case (_, _, y0, y1) => y1 >= lo && y0 <= hi }
    assert(touched(xs, 8, 11) == xs.length,
      "every x-sorted file must span the y band — zone maps prune nothing")
    assert(touched(z, 8, 11) <= z.length / 2,
      s"z-ordered files must prune the y band (${touched(z, 8, 11)} of ${z.length})")
    java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("q75's tile rollup reflects the key's locality: every tile's key range is disjoint") {
    // tiles are zkey >> 12 — contiguity of tiles in key space is what makes
    // range-partitioned writes cluster them; verify tiles partition the key
    // range without overlap on real data
    val tiles = SparkEntry.queries("q75_zorder_layout")(spark, "/root/testdata/sf0.001")
      .orderBy("tile_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))) // tile, min_zkey, max_zkey
    assert(tiles.nonEmpty)
    tiles.foreach { case (t, lo, hi) =>
      assert(lo >= t * 4096 && hi < (t + 1) * 4096, s"tile $t keys outside its range")
    }
    tiles.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }
}
