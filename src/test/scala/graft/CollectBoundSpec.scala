package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Inventory-wide plan invariant #3 (r11 verdict item 7): every
  * driver-side collect in an operator's build path must be size-bounded
  * BY CONSTRUCTION — sketch cells (d·w), trained centroids (k), an
  * explicit limit(), a guarded pair count. The first two invariants
  * (no payload on a shuffle, no unbounded nested-loop join) are plan
  * walks in OptimizationSpec; this one is a SOURCE walk, because the
  * hazard is the call site itself: a raw `.collect()` added anywhere in
  * an operator file is a silent driver OOM at 100 TB regardless of what
  * the plan looks like at sf0.01.
  *
  * Mechanism: all of src/main/scala is scanned for empty-arg
  * `.collect()` / `.collectAsList()` / `.toLocalIterator` (the Dataset/
  * RDD driver-materializing calls — Scala collections' `collect` takes a
  * partial function, so the empty-arg form cannot be one; DataFrame
  * `.take(n)` is not scanned because it is bounded by its own argument,
  * and boundedCollect itself materializes through take(limit + 1), never
  * an unbounded collect). Every occurrence must BOTH sit in an
  * allowlisted file within that file's occurrence budget AND carry a
  * `// bounded:` marker on the same line stating the construction bound
  * — a budget alone would let a NEW unbounded collect silently replace
  * the allowlisted one (r12 review). Adding a site means either calling
  * boundedCollect or writing the bound claim on the line itself.
  */
class CollectBoundSpec extends AnyFunSuite {

  private val root = Paths.get("src/main/scala")

  /** file-basename -> (max allowed marked occurrences, the documented
    * bound). Everything else must route through QueryDsl.boundedCollect. */
  private val allowlist: Map[String, (Int, String)] = Map(
    // RDD-API site: exactly one (count, sums) row per partition, pinned by
    // a require right after the collect (boundedCollect is DataFrame-only)
    "GlobalOrderOps.scala" -> (1, "P per-partition stat rows, require()d == numPartitions"),
    // JVM/codegen warmup probe: sum over range(1000) -> 1 row
    "Bench.scala" -> (1, "warmup sum, 1 row by aggregation"))

  private def scalaFiles(p: Path): Seq[Path] =
    Files.walk(p).iterator().asScala.filter(_.toString.endsWith(".scala")).toSeq

  test("every driver-materializing call in src/main is bounded by construction") {
    val pattern = "\\.(collect\\(\\)|collectAsList\\(\\)|toLocalIterator\\b)".r
    val hits: Seq[(String, Int, String)] = scalaFiles(root).flatMap { f =>
      Files.readAllLines(f).asScala.zipWithIndex.collect {
        case (line, i) if pattern.findFirstIn(line).isDefined &&
            !line.trim.startsWith("//") && !line.trim.startsWith("*") =>
          (f.getFileName.toString, i + 1, line.trim)
      }
    }
    val byFile = hits.groupBy(_._1)
    val violations = byFile.flatMap { case (file, occ) =>
      // per-SITE check, not a bare budget: every occurrence must carry the
      // bound claim on its own line, so replacing an allowlisted collect
      // with a new unbounded one cannot slip inside the old count
      val unmarked = occ.filterNot(_._3.contains("// bounded:"))
      allowlist.get(file) match {
        case Some((maxN, _)) if occ.size <= maxN && unmarked.isEmpty => None
        case Some((maxN, bound)) => Some(
          s"$file: ${occ.size} raw driver-materializing calls " +
            s"(${unmarked.size} without a '// bounded:' line marker), " +
            s"allowlist admits $maxN marked ($bound):\n" +
            occ.map(o => s"  L${o._2}: ${o._3}").mkString("\n"))
        case None => Some(
          s"$file: raw driver-materializing call outside the allowlist — " +
            "route it through QueryDsl.boundedCollect(df, <construction " +
            "bound>, <what>) or allowlist it WITH a named bound and a " +
            "'// bounded:' line marker:\n" +
            occ.map(o => s"  L${o._2}: ${o._3}").mkString("\n"))
      }
    }
    assert(violations.isEmpty, violations.mkString("\n\n"))
    // and the allowlist itself must not go stale: every allowlisted file
    // still has at least one occurrence (drop the row when the site goes)
    val stale = allowlist.keySet.diff(byFile.keySet)
    assert(stale.isEmpty, s"allowlist rows with no remaining site: $stale")
  }

  test("boundedCollect enforces its declared bound at runtime") {
    // unit-level proof the gate's runtime half actually fires: a DataFrame
    // exceeding its declared bound must throw, one within it must pass
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("collect-bound-spec")
      .getOrCreate()
    val df = spark.range(10).toDF("id")
    val ok = graft.queries.QueryDsl.boundedCollect(df, 10, "ten rows")
    assert(ok.length == 10)
    val e = intercept[IllegalArgumentException] {
      graft.queries.QueryDsl.boundedCollect(df, 9, "nine rows claimed")
    }
    assert(e.getMessage.contains("nine rows claimed"))
    assert(e.getMessage.contains("exceeded declared construction bound 9"))
  }
}
