package graft.tools

/** Kept as the documented entry point from the round-12 BUILD_NOTES
  * investigation (the s11 fallback-threshold find); the harness itself was
  * generalized into [[EntryStageProbe]], which this delegates to so the
  * probe recipe has exactly one implementation.
  * Run with `sbt "Test/runMain graft.tools.S11StageProbe"`. */
object S11StageProbe {
  def main(args: Array[String]): Unit =
    EntryStageProbe.main(if (args.nonEmpty) args else Array("s11_knn_graph_ivf"))
}
