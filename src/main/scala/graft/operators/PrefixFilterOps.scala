package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointUtils.SummarizedCheckpointOps

/** Exact set-similarity self-join with PREFIX FILTERING — the AllPairs /
  * PPJoin candidate rule (Bayardo, Ma & Srikant, WWW'07 "Scaling up all
  * pairs similarity search"; Xiao, Wang, Lin & Yu, WWW'08 "Efficient
  * similarity joins for near duplicate detection").
  *
  * The naive exact Jaccard join generates a candidate pair for every
  * co-occurring element (Σ df² pairs over the full inverted index — d08's
  * shape, which needs a df-stoplist to tame heavy hitters, trading a
  * documented soundness caveat for the cut). Prefix filtering keeps
  * exactness AND cuts candidates with a theorem instead of a heuristic:
  *
  *   order every set by one GLOBAL canonical element order (rarest-first
  *   df order — ties by element), and call the first
  *   |x| − ⌈τ·|x|⌉ + 1 elements the PREFIX of x. If J(a,b) ≥ τ, then
  *   prefix(a) ∩ prefix(b) ≠ ∅.
  *
  *   Proof sketch: J(a,b) ≥ τ forces |a∩b| ≥ ⌈τ·max(|a|,|b|)⌉. A set
  *   shares NO prefix element with the other only if every common element
  *   sits in its suffix, but a suffix holds at most ⌈τ·|x|⌉ − 1 < ⌈τ·|x|⌉
  *   elements of any common subset ordered canonically — contradiction.
  *
  * So the inverted index is built over PREFIX positions only, heavy
  * hitters sort last (largest df) and fall out of most prefixes
  * naturally, and the length filter τ·|a| ≤ |b| ≤ |a|/τ (a second exact
  * necessary condition) prunes the rest. Verification then counts the
  * true intersection for surviving candidates only.
  *
  * Scale shape at 100 TB:
  *   - the df table and every join key are 8-byte hashes — no set, array
  *     or text ever rides a shuffle;
  *   - candidate generation shuffles prefix postings (a τ-fraction of the
  *     full posting list) keyed by element — the Σ df_prefix² work is the
  *     algorithm's known cost, minimized by the rarest-first order;
  *   - verification co-locates each candidate pair's two hash sets (two
  *     id-keyed joins, one fixed-size set per row — the canonical PPJoin
  *     verify) and counts the true intersection in one codegen'd
  *     zero-allocation sorted-merge scan per pair (SortedIntersectOps);
  *   - skew: a degenerate heavy hitter inflates one prefix bucket only if
  *     it appears in a prefix at all — rarest-first ordering makes that
  *     the LAST element to enter any prefix.
  *
  * Measured trade-off vs d08's direct inverted-index counting (10× bench
  * tier, df-FLAT synthetic corpus): the prefix machinery (df aggregate +
  * df join + per-set ranking window over the full posting list) is pure
  * overhead there — d08's Σ df² is already tiny when every element is
  * rare, so d08 wins by an order of magnitude on that corpus. The prefix
  * pays off exactly where d08 breaks: Zipfian element frequencies, where
  * Σ df² is dominated by head elements that prefix ordering excludes and
  * d08 must stoplist away (giving up completeness). Pick per corpus
  * shape; both are exact on their admitted candidates.
  */
object PrefixFilterOps {

  /** All unordered pairs (id_a < id_b) of `sets` with Jaccard ≥ tauNum /
    * tauDen, computed exactly via prefix filtering. `sets` must have an
    * integral id column `idCol` and a column `setCol` of ARRAY<LONG>
    * element hashes; the SET semantics are self-enforced — elements pass
    * through one map-side `array_distinct` at entry, so a duplicate-
    * bearing input cannot skew |a∩b| vs the size terms (the precondition
    * used to be documentation-only — r10 advice). Returns
    * (id_a, id_b, jaccard_milli) where
    * jaccard_milli = (1000·|a∩b|) DIV |a∪b| — integer floor-milli, so the
    * τ cut (milli ≥ 1000·tauNum DIV tauDen) is exact for any rational τ
    * whose 1000·num/den is integral (e.g. 3/5 → 600).
    *
    * `assumeDistinct = true` lets a trusted caller whose arrays are
    * ASCENDING-SORTED DISTINCT **AND NULL-FREE** BY CONSTRUCTION (d22's
    * shingle hashes: sorted + deduped inside the expression —
    * ShingleOps.shingleHashes) skip the enforcement pass AND its
    * full-corpus materialization (the entry localCheckpoint exists only
    * to amortize the normalization across the three consuming subtrees;
    * with no normalization pass the subtrees read the caller's —
    * typically already cached — table directly). Null-free is part of
    * the same trust contract as sortedness: a null is not an element
    * hash, and the sorted-merge verify reads primitive slots. A trusted
    * input whose SCHEMA merely says `containsNull = true` (e.g.
    * Option-encoded) is narrowed zero-cost (`known_elements_not_null` —
    * no scan, no copy) so it still analyzes against the verify kernel's
    * r18 containsNull rejection (r18 advice). External callers keep the
    * default enforcement, which now SORTS as well as dedupes AND
    * compacts nulls away: since r17 the verification step counts
    * intersections with the zero-allocation sorted-merge kernel
    * ([[org.apache.spark.sql.graft.SortedIntersectOps]]), which needs
    * order the way the old `array_intersect` needed distinctness — an
    * unsorted input would silently UNDERCOUNT |a∩b|. (r11 advice;
    * strengthened r17) */
  def jaccardSelfJoin(sets: DataFrame, idCol: String, setCol: String,
      tauNum: Int, tauDen: Int, assumeDistinct: Boolean = false): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen, "need 0 < tau <= 1")
    require((1000L * tauNum) % tauDen == 0,
      s"tau=$tauNum/$tauDen has no exact milli threshold — the output cut " +
        "would disagree with the candidate rule at boundary pairs")
    val milliTau = 1000L * tauNum / tauDen
    // enforce SET semantics once at entry: every downstream size/
    // intersection count assumes distinct elements. Materialized
    // (localCheckpoint, the same shared-subtree pattern as `prefix`
    // below) because THREE subtrees consume it — the posting build and
    // both sides of the verification join — and without it Catalyst
    // re-runs the full-corpus array_distinct pass per consumer, on the
    // operator's measured dominant path (the verify join)
    val distinctSets =
      if (assumeDistinct) {
        // a trusted caller promises sorted-distinct NULL-FREE arrays; when
        // the column's SCHEMA still says containsNull = true (Option
        // encoding), narrow it schema-only — zero cost, unlike the
        // untrusted branch's array_compact scan — so the sorted-merge
        // verify's containsNull rejection doesn't fail a valid trusted
        // input at analysis (r18 advice)
        val trusted = sets.schema(setCol).dataType match {
          case org.apache.spark.sql.types.ArrayType(_, true) =>
            org.apache.spark.sql.graft.functions.known_elements_not_null(col(setCol))
          case _ => col(setCol)
        }
        sets.select(col(idCol).as("id"), trusted.as("hs_set"))
      } else {
        // a nullable-element input additionally passes through
        // array_compact: null is not an element hash (SET semantics), and
        // sorted_intersect_count REJECTS containsNull arrays at analysis
        // (r17 advice — a null slot would silently undercount; compact
        // also narrows the column type to containsNull = false, which is
        // what lets the verify step below analyze)
        val elemNullable = sets.schema(setCol).dataType match {
          case org.apache.spark.sql.types.ArrayType(_, cn) => cn
          case _ => false
        }
        val cleaned = if (elemNullable) array_compact(col(setCol)) else col(setCol)
        sets.select(col(idCol).as("id"),
          array_sort(array_distinct(cleaned)).as("hs_set"))
          .summarizedCheckpoint()
      }
    val posting = distinctSets.select(col("id"),
      size(col("hs_set")).as("sz"), explode(col("hs_set")).as("h"))
    // materialize the prefix posting list ONCE (the shared-subtree
    // localCheckpoint pattern): both sides of the candidate self-join
    // consume it, and without the checkpoint Catalyst rebuilds the
    // df-count + per-set ranking window separately per side — at corpus
    // scale that doubles the two most expensive passes of the algorithm
    val prefix = prefixPostings(posting, tauNum, tauDen).summarizedCheckpoint()
    // candidate rule = prefix match + length filter + PPJoin's POSITIONAL
    // upper bound (Xiao et al., WWW'08 §3.1): a meeting at prefix
    // positions (i, j) can contribute at most 1 + min(|a|-i, |b|-j)
    // common elements, and J >= tau needs overlap
    // alpha = ceil(tau/(1+tau) * (|a|+|b|)) — so meetings below that
    // bound are dropped BEFORE the distinct and the verify joins.
    // Sound: for a qualifying pair, its canonically-FIRST common element
    // is in both prefixes (any shared prefix element sorts at-or-after
    // it in both sets) and every common element sits at-or-after that
    // meeting in both sets, so that meeting's bound >= the true overlap
    // >= alpha and the pair survives. Integer form of ubound >= alpha
    // (ubound integral makes >= ceil(x) ⟺ >= x):
    //   (1 + min(sz_a - pos_a, sz_b - pos_b)) * (tauNum + tauDen)
    //     >= tauNum * (sz_a + sz_b)
    // At tau = 0.6 this is the filter that discharges near-miss pairs
    // whose single shared element sits deep in both prefixes — measured
    // on the 10x bench corpus it cuts surviving candidates (and so the
    // array payload entering the verify joins) beyond what prefix +
    // length filtering admit.
    val cand = prefix.as("a").join(prefix.as("b"), candidateCond(tauNum, tauDen))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // VERIFICATION = the canonical AllPairs/PPJoin verify step: co-locate
    // each surviving candidate pair's two hash SETS and count the true
    // intersection in one codegen'd sorted-merge scan per pair (r17:
    // sorted_intersect_count replaced size(array_intersect(..)) — the
    // built-in allocates an OpenHashSet + result array PER CANDIDATE
    // PAIR, the allocation churn that made this stage's cpu 2-6x
    // heap-geometry-sensitive; the merge scan allocates nothing). The earlier
    // formulation verified through the inverted index instead (cand ⋈
    // posting ⋈ posting + groupBy) — per candidate that expands to
    // |set_a| skinny rows through a shuffled aggregation, and on the 10×
    // bench tier (1.8M candidates × ~100-element sets ⇒ 180M rows) it was
    // 33 s of the operator's 44 s. Two id-keyed joins carrying one array
    // per row replace it (measured 4×+ faster end to end). The array
    // payload on a keyed shuffle is the same deliberate, bounded
    // exemption class as d18/s10's pairwise kernels: each set travels
    // once per candidate pair it survived INTO — prefix filtering has
    // already cut that to the theorem-admitted pairs, and the per-row
    // payload is one document's fixed set, never a corpus-sized artifact.
    val setsById = distinctSets.select(col("id"), col("hs_set").as("hs"))
    cand
      .join(setsById.withColumnsRenamed(Map("id" -> "id_a", "hs" -> "hs_a")), "id_a")
      .join(setsById.withColumnsRenamed(Map("id" -> "id_b", "hs" -> "hs_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        org.apache.spark.sql.graft.functions
          .sorted_intersect_count(col("hs_a"), col("hs_b")).as("ni"),
        (size(col("hs_a")) + size(col("hs_b"))).as("szsum"))
      .withColumn("jaccard_milli",
        expr("(1000 * ni) DIV (szsum - ni)"))
      .filter(col("jaccard_milli") >= milliTau)
      .select(col("id_a"), col("id_b"), col("jaccard_milli"))
  }

  /** The candidate-admission predicate over two prefix-posting sides
    * aliased "a"/"b": prefix match, length filter, and the positional
    * upper bound above. Exposed so the candidate-reduction spec binds to
    * THIS condition rather than a private re-derivation (r13 review). */
  /** Prefix match + length filter WITHOUT the positional bound — the
    * counterfactual baseline the positional-cut spec and the Zipfian
    * corpus probe measure against. Exposed so both sites bind to the
    * operator's own arithmetic instead of private re-derivations that
    * drift when the filter form changes (r14 review: the spec and probe
    * copies had already diverged on int-vs-long arithmetic). */
  private[graft] def prefixLengthCond(tauNum: Int, tauDen: Int): org.apache.spark.sql.Column = {
    // all predicate arithmetic in LongType: sz is an int column, and under
    // ANSI mode an int product like (sz_a + sz_b) * tauNum would THROW on
    // overflow for pathological set sizes (sums past ~2^31/tauNum) instead
    // of comparing — cast once, every derived term stays long (r13 advice)
    val szA = col("a.sz").cast("long")
    val szB = col("b.sz").cast("long")
    col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
      szB * tauDen >= szA * tauNum &&
      szA * tauDen >= szB * tauNum
  }

  private[graft] def candidateCond(tauNum: Int, tauDen: Int): org.apache.spark.sql.Column = {
    val szA = col("a.sz").cast("long")
    val szB = col("b.sz").cast("long")
    prefixLengthCond(tauNum, tauDen) &&
      (lit(1L) + least(szA - col("a.pos"), szB - col("b.pos"))) *
        (tauNum + tauDen) >= (szA + szB) * tauNum
  }

  /** The prefix posting list: each set's first |x| − ⌈τ·|x|⌉ + 1 elements
    * in the global rarest-first (df asc, hash asc) canonical order.
    * Exposed for the candidate-reduction spec. Columns (id, sz, h, pos) —
    * pos is the element's 1-based rank within its set's canonical order,
    * carried for the PPJoin positional upper bound above. */
  private[graft] def prefixPostings(posting: DataFrame,
      tauNum: Int, tauDen: Int): DataFrame = {
    val df_ = posting.groupBy("h").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("id").orderBy("df", "h")
    posting.join(df_, "h")
      .withColumn("pos", row_number().over(wDoc))
      .filter(col("pos") <=
        col("sz") - expr(s"($tauNum * sz + ${tauDen - 1}) DIV $tauDen") + 1)
      .select(col("id"), col("sz"), col("h"), col("pos"))
  }
}
