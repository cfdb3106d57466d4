package graft.tools

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.vectorized.ColumnarArray

/** Dev tool (not shipped surface): demonstrate, in isolation, the JIT
  * receiver-profile mechanism behind the d18 cpu_s bimodality (r15; driver
  * r14 ran d18 at 57.5 cpu_s vs the committed 25.8 with bit-identical work
  * counters, and a 4× burner dose left it flat — so not contention).
  *
  * OLD kernel shape (`dotShared` below = LongVecOps.dot before r15): one
  * static method whose `a.getLong(i)` receiver is the ArrayData BASE type.
  * That virtual call site accumulates a single JVM-wide type profile across
  * every caller for the life of the JVM. Phase 1 times it monomorphic
  * (UnsafeArrayData only — the post-join hot-path type). Phase 2 pollutes
  * the profile with GenericArrayData (what `transform(sequence(...))`
  * produces during d18's tfv build) and ColumnarArray (what a columnar
  * cache scan produces). Phase 3 re-times the EXACT phase-1 workload: if
  * the re-run is materially slower, the C2 recompilation triggered by the
  * polluted profile has de-inlined the accessor for everyone — the
  * mechanism by which the SAME bench entry, same plan, same counters can
  * run 2-3× more cpu_s depending on which pass tier-up won the race.
  *
  * NEW kernel (LongVecOps.dot, typed arms): the same three phases should
  * stay flat, because the hot loop's receiver is statically UnsafeArrayData
  * and inlines via class-hierarchy analysis no matter what the dispatcher
  * has seen.
  *
  * Run: `sbt "Test/runMain graft.tools.DotProfilePollutionProbe"`.
  * Numbers go in BUILD_NOTES; this probe has no assertions by design (JIT
  * thresholds are wall-clock sensitive — a CI assert would flake).
  */
object DotProfilePollutionProbe {
  private val Dim = 31 // d18's fixture vocabulary size at sf0.1

  // the pre-r15 kernel shape: virtual receiver in the hot loop
  private def dotShared(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  private def mkUnsafe(seed: Int): UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(Array.tabulate[Long](Dim)(i => (seed + i).toLong))
  private def mkGeneric(seed: Int): GenericArrayData =
    new GenericArrayData(Array.tabulate[Long](Dim)(i => (seed + i).toLong))
  private def mkColumnar(seed: Int): ColumnarArray = {
    val vec = new OnHeapColumnVector(Dim, LongType)
    var i = 0
    while (i < Dim) { vec.putLong(i, (seed + i).toLong); i += 1 }
    new ColumnarArray(vec, 0, Dim)
  }

  private def timeIt(label: String, iters: Int)(body: Int => Long): Double = {
    val bean = java.lang.management.ManagementFactory.getThreadMXBean
    var sink = 0L
    val t0 = bean.getCurrentThreadCpuTime
    var i = 0
    while (i < iters) { sink += body(i); i += 1 }
    val sec = (bean.getCurrentThreadCpuTime - t0) / 1e9
    println(f"  $label%-34s $sec%7.3f s  (sink ${sink & 0xffffL})")
    sec
  }

  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(20000000)
    val ua = Array.tabulate(64)(mkUnsafe)
    val ub = Array.tabulate(64)(i => mkUnsafe(i + 7))
    val ga = Array.tabulate(64)(mkGeneric)
    val ca = Array.tabulate(64)(mkColumnar)

    def phases(name: String, dot: (ArrayData, ArrayData) => Long): Unit = {
      println(s"== $name ==")
      timeIt("warmup (unsafe only)", iters)(i => dot(ua(i & 63), ub(i & 63)))
      val mono = timeIt("monomorphic (unsafe only)", iters)(i => dot(ua(i & 63), ub(i & 63)))
      timeIt("pollute (generic + columnar)", iters) { i =>
        dot(ga(i & 63), ga((i + 1) & 63)) + dot(ca(i & 63), ca((i + 1) & 63)) +
          dot(ua(i & 63), ga(i & 63))
      }
      val post = timeIt("re-run phase-1 (unsafe only)", iters)(i => dot(ua(i & 63), ub(i & 63)))
      println(f"  post/mono cpu ratio: ${post / mono}%.2f×")
    }

    phases("OLD shape: shared virtual-receiver loop", dotShared)
    phases("NEW kernel: LongVecOps.dot typed arms",
      (a, b) => org.apache.spark.sql.graft.LongVecOps.dot(a, b))
  }
}
