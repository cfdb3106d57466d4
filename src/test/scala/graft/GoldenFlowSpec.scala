package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.SQLFlow
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file lineage corpus, mirroring the reference's SQL-file harness
  * (SQLFlowTestSuite): each SQL file under `flow-tests/inputs` is a ;-separated
  * script of temp-view definitions; the catalog lineage dot snapshot is
  * compared as a SORTED LINE SET (layout-insensitive, exactly the
  * reference's edge-set normalization idea — our uids are deterministic, so
  * no id scrubbing is needed). Regenerate with
  * `SPARK_GENERATE_GOLDEN_FILES=1 sbt "testOnly graft.GoldenFlowSpec"`.
  */
class GoldenFlowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("golden-flow-spec")
    .getOrCreate()

  private val base = new File("src/test/resources/flow-tests")
  private val regenerate = sys.env.contains("SPARK_GENERATE_GOLDEN_FILES")

  private def dropAllTempViews(): Unit = {
    val cat = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
    cat.getTempViewNames().foreach(spark.catalog.dropTempView)
  }

  new File(base, "inputs").listFiles((_, n) => n.endsWith(".sql")).sortBy(_.getName)
    .foreach { input =>
      val name = input.getName.stripSuffix(".sql")
      test(s"golden lineage: $name") {
        dropAllTempViews()
        try {
          Files.readString(input.toPath).split(";").map(_.trim).filter(_.nonEmpty)
            .foreach(spark.sql(_))
          // plain and contracted snapshots, like the reference's corpus
          Seq(false -> s"results/$name.dot",
              true -> s"results/$name.contracted.dot").foreach { case (contracted, rel) =>
            val dot = SQLFlow.printAsSQLFlow(spark, contracted = contracted)
            val goldenFile = new File(base, rel)
            val normalized = dot.linesIterator.map(_.trim).filter(_.nonEmpty)
              .toSeq.sorted.mkString("\n")
            if (regenerate) {
              Files.writeString(goldenFile.toPath, normalized)
            } else {
              assert(goldenFile.exists(), s"golden missing: $goldenFile " +
                "(regenerate with SPARK_GENERATE_GOLDEN_FILES=1)")
              val expected = Files.readString(goldenFile.toPath)
              assert(normalized === expected,
                s"lineage snapshot drifted for $rel")
            }
          }
        } finally dropAllTempViews()
      }
    }
}
