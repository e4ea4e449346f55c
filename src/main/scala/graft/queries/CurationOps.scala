package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._
import graft.ops.{Components, MinHashDedup, Similarity, TextOps}

/** Round-5 corpus-curation additions (q94–q99): the operations that sit
  * between "near-dup pairs exist" and "a training mix ships" — duplicate
  * CLUSTERS (transitive closure), TF-IDF term salience, sequence packing
  * into fixed token budgets, mixture rebalancing to target language
  * shares, int8 embedding quantization, and Z-order layout keys for
  * multi-dimensional file skipping. All oracle-gated against DuckDB.
  */
object CurationOps {

  /** Q94 — near-dup CLUSTERS: TRUE connected components of the q86
    * n-gram Jaccard pair graph — quotient-graph contraction with path
    * halving ([[graft.ops.Components.contractComponents]], the production
    * path; `minLabelFixpoint` survives as the property-test cross-check),
    * so duplicate chains of ANY diameter collapse in O(log d) rounds.
    * q87's keeper is one hop; this is the closure — every member of a
    * duplicate cluster maps to the cluster's minimum doc_id, plus the
    * cluster size a dedup report ships.
    *
    * The DuckDB oracle unrolls exactly 3 rounds: a valid gate because
    * CurationSpec asserts fixpoint == unrolled-3 on this corpus
    * (near-dup graphs are unions of near-cliques, diameter ≤ 3 here);
    * on a deeper graph the fixpoint keeps going where the unrolled SQL
    * would stop.
    *
    * Cache note: the returned frame projects over the ONE persisted
    * labels frame `clustersWithSize` hands back (eagerly materialised;
    * all intermediates already released). That frame is registered with
    * [[graft.core.CacheScope]], so the consumer's `releaseAll()` after
    * the action frees it; ops-level callers use
    * `Components.clustersWithSize` + `Components.release` directly —
    * OpsSpec proves that pairing leaves the CacheManager empty.
    */
  def q94(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents")
    val pairs = MinHashDedup.ngramJaccardPairs(docs, "doc_id", "text",
      gramN = 5, rowsPerBand = 2, minJaccard = 0.5)
    graft.core.CacheScope.adopt(Components.clustersWithSize(
        pairs.select($"d1".as("a"), $"d2".as("b")),
        docs.select($"doc_id".as("id"))))
      .select($"id".as("doc_id"), $"cluster", $"cluster_size")
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** One unrolled min-label round over the named symmetrised-edge CTE
    * and `lab{n-1}` — shared by the q94 and q125 oracles so the
    * unrolling can never diverge between the two cluster queries.
    */
  /** MATERIALIZED: each round consumes the previous one TWICE (the node
    * side and the neighbor side) — inlined, round n re-evaluates round
    * n−1 twice, so lab0 and the pair pipeline under it re-run 2^n times
    * (measured: DuckDB OOM/80 GB spills on the q94/q168 oracles at
    * sf0.1); materializing keeps every round a one-shot over its
    * predecessor. Result-identical.
    */
  private[queries] def labRound(n: Int, edges: String = "e"): String =
    s"""lab$n AS MATERIALIZED (
       |  SELECT l.id, least(l.cluster, coalesce(MIN(nb.cluster), l.cluster)) AS cluster
       |  FROM lab${n - 1} l
       |  LEFT JOIN $edges ON $edges.a = l.id
       |  LEFT JOIN lab${n - 1} nb ON nb.id = $edges.b
       |  GROUP BY l.id, l.cluster)""".stripMargin

  val q94Sql: String =
    s"""${LlmOps.ngramPairCtes},
       |e AS MATERIALIZED (SELECT d1 AS a, d2 AS b FROM pairs
       |      UNION ALL SELECT d2 AS a, d1 AS b FROM pairs),
       |lab0 AS (SELECT doc_id AS id, doc_id AS cluster FROM documents),
       |${labRound(1)},
       |${labRound(2)},
       |${labRound(3)},
       |sz AS (SELECT cluster, COUNT(*) AS n FROM lab3 GROUP BY cluster)
       |SELECT l.id AS doc_id, l.cluster, s.n AS cluster_size
       |FROM lab3 l JOIN sz s ON s.cluster = l.cluster
       |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Q125 — EMBEDDING near-dup CLUSTERS: the q94 closure over q69's
    * banded-LSH cosine pair graph instead of the n-gram Jaccard graph —
    * semantic duplicate GROUPS from the embedding space, the decision
    * unit an embedding-dedup pipeline ships (q69 lists pairs; this
    * collapses them into clusters with sizes). Same production path as
    * q94 (true components via `clustersWithSize`); the DuckDB oracle is
    * a RECURSIVE transitive closure over the IDENTICAL pair CTEs as q69
    * ([[LlmOps.q69PairCtes]]) — see [[q125Sql]] for why closure, not
    * unrolling. CurationSpec additionally pins the result to an
    * in-memory union-find ground truth.
    */
  def q125(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val pairs = Similarity.lshBandedPairs(emb, "vec_id", "embedding",
      planes = LlmOps.q69Planes, bands = LlmOps.q69Bands, minCos6 = 0.4)
    graft.core.CacheScope.adopt(Components.clustersWithSize(
        pairs.select($"d1".as("a"), $"d2".as("b")),
        emb.select($"vec_id".as("id"))))
      .select($"id".as("vec_id"), $"cluster", $"cluster_size")
      .orderBy($"vec_id".asc_nulls_first)
  }

  /** q125's oracle computes TRUE components via a recursive transitive
    * closure (`WITH RECURSIVE` reach + MIN over reachable ids) rather
    * than q94's unrolled rounds: the cosine graph is chain-shaped
    * (measured diameter 12 at sf0.1), so a fixed unrolling would only
    * gate small scale factors while the closure is valid at ANY sf —
    * exactly the property the fixpoint production path has.
    */
  val q125Sql: String =
    s"""${LlmOps.q69PairCtes},
       |adj AS (SELECT d1 AS a, d2 AS b FROM vpairs
       |        UNION ALL SELECT d2 AS a, d1 AS b FROM vpairs),
       |reach(a, b) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN adj e2 ON e2.a = r.b),
       |lab AS (SELECT a AS id, MIN(b) AS cluster FROM reach GROUP BY a),
       |sz AS (SELECT cluster, COUNT(*) AS n FROM lab GROUP BY cluster)
       |SELECT l.id AS vec_id, l.cluster, CAST(s.n AS BIGINT) AS cluster_size
       |FROM lab l JOIN sz s USING (cluster)
       |ORDER BY vec_id NULLS FIRST""".stripMargin
      .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** Q169 — SemDeDup: SEMANTIC dedup of the embedding corpus
    * ([[graft.ops.Similarity.semanticDedup]], Abbas et al. 2023):
    * k-means cells (the q72 deterministic quantizer) scope the exact
    * cosine pair generation — the all-pairs work is Σ|cell|² with `k`
    * the scale knob, never corpus-quadratic — pairs ≥ 0.4 collapse into
    * duplicate groups (true components; within-cell edges only), and
    * each group keeps the member with the LOWEST cosine to its cell
    * centroid (the paper's least-redundant-survives rule, id
    * tie-break). q69/q125 found and clustered embedding near-dups by
    * LSH bands; this is the named cluster-scoped alternative a
    * curation pipeline ships when it already maintains a quantizer —
    * and the verdict (keep/drop per vector) is the APPLY input. The
    * oracle unrolls the identical k-means (q72's CTEs), replays the
    * within-cell pairs, closes them recursively (any diameter), and
    * re-ranks with the same 6dp/id rule.
    */
  def q169(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // same multi-pass right-sizing as q72: the fit + pair join make
    // several passes over this corpus
    val e = t(spark, dir, "embeddings").coalesce(8)
    Similarity.semanticDedup(e, "vec_id", "embedding", k = 8, iters = 2,
        minCos6 = 0.4)
      .orderBy($"vec_id".asc_nulls_first)
  }

  /** The SemDeDup CTE prefix (dedup kmeans → within-cell pairs →
    * recursive closure → keeper ranking, ending in `rankd`/`sz`) —
    * shared by q169's verdict listing and q175's pruned-index build so
    * the keep rule can never drift between them. Callers must
    * `replaceFirst("WITH ", "WITH RECURSIVE ")` on the composed string.
    */
  private[queries] val semanticDedupCtes: String =
    s"""${LlmOps.kmeansCtes("TRUE")},
       |c2c AS (
       |  SELECT a.vec_id, a.cell,
       |    ROUND(list_dot_product(a.v, c.centroid) / (a.nrm * SQRT(list_dot_product(c.centroid, c.centroid))), 6) AS c2c6
       |  FROM avx a JOIN cent2 c ON c.cell = a.cell),
       |spairs AS (
       |  SELECT x.vec_id AS d1, y.vec_id AS d2
       |  FROM avx x JOIN avx y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE ROUND(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= 0.4),
       |adj AS (SELECT d1 AS a, d2 AS b FROM spairs
       |        UNION ALL SELECT d2 AS a, d1 AS b FROM spairs),
       |reach(a, b) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN adj e2 ON e2.a = r.b),
       |lab AS (SELECT a AS id, MIN(b) AS grp FROM reach GROUP BY a),
       |sz AS (SELECT grp, COUNT(*) AS n FROM lab GROUP BY grp),
       |rankd AS (
       |  SELECT l.id, l.grp, c.cell, c.c2c6,
       |    ROW_NUMBER() OVER (PARTITION BY l.grp ORDER BY c.c2c6 ASC, l.id ASC) AS krn
       |  FROM lab l JOIN c2c c ON c.vec_id = l.id)""".stripMargin

  val q169Sql: String =
    s"""$semanticDedupCtes
       |SELECT r.id AS vec_id, r.cell, r.grp, CAST(s.n AS BIGINT) AS grp_size, r.c2c6,
       |  CASE WHEN r.krn = 1 THEN 'keep' ELSE 'drop' END AS action
       |FROM rankd r JOIN sz s ON s.grp = r.grp
       |ORDER BY vec_id NULLS FIRST""".stripMargin
      .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** Q175 — SEMDEDUP-PRUNED INDEX BUILD (the APPLY of q169's verdicts,
    * composed into serving): a curation pipeline doesn't stop at
    * keep/drop rows — the kept corpus feeds the serving index, so the
    * composition that matters is dedup → prune → build → serve. The
    * q169 verdict gates index CANDIDACY (drops never enter), the index
    * is the q142 persisted shape fitted ON THE KEPT CORPUS (its own
    * quantizer — pruning changes geometry, so refitting on survivors is
    * the correct build, unlike q156's delete-only semantics where the
    * quantizer must NOT move), and the probe wave serves nprobe=2 from
    * the pruned artifacts. Dropped ids can never be probes or
    * candidates. The oracle chains q169's keep rule into a SECOND
    * prefixed k-means unroll over exactly the kept vectors.
    */
  def q175(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = t(spark, dir, "embeddings").coalesce(8)
    val verdict = Similarity.semanticDedup(e, "vec_id", "embedding",
      k = 8, iters = 2, minCos6 = 0.4)
    val kept = e.join(
      verdict.filter($"action" === "keep").select($"vec_id"), Seq("vec_id"))
    val out = PipelineOps.layoutDir(spark, dir, "semdedupindex")
    // q142's persisted shape, built from the PRUNED corpus
    val (assignments, centroids) =
      Similarity.kmeansFit(kept, "vec_id", "embedding", k = 8, iters = 2,
        materialize = false, withVec = true)
    assignments.repartition(col("cell")).write.mode("overwrite")
      .partitionBy("cell").parquet(s"$out/assignments")
    centroids.write.mode("overwrite").parquet(s"$out/centroids")
    val idxAssign = spark.read.parquet(s"$out/assignments")
    val idxCent = spark.read.parquet(s"$out/centroids")
    val res = Similarity.ivfTopKServed(idxAssign, idxCent,
        "vec_id", "embedding", probeFilter = $"vec_id" < 20, k = 3, nprobe = 2)
      .orderBy($"probe_id".asc_nulls_first, $"rn".asc_nulls_first)
    // k-bounded result; materialise so nothing holds the index read open
    val rows = res.collect().toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), res.schema)
  }

  val q175Sql: String =
    LlmOps.probedTopKSql(
      s"""$semanticDedupCtes,
         |keeps AS (SELECT id AS vec_id FROM rankd WHERE krn = 1),
         |${LlmOps.kmeansCtes("TRUE",
             "SELECT k.vec_id, k.v FROM vecs k JOIN keeps USING (vec_id)",
             "ix_").stripPrefix("WITH ")}""".stripMargin,
      p = "ix_")
      .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** Q184 — INCREMENTAL SemDeDup: the continuous-ingestion variant of
    * q169 — q169 re-fits and re-pairs the WHOLE corpus per run, which is
    * the nightly-build shape; a pipeline ingesting a new slice needs the
    * q137 asymmetric shape on CELLS: place the incoming docs into the
    * EXISTING maintained quantizer ([[Similarity.assignToCentroids]] —
    * map-only, no refit), generate exact cosine pairs ONLY between the
    * incoming slice and the existing corpus within each cell
    * ([[Similarity.semanticCrossPairs]]), and verdict per incoming doc
    * (semantic-dup count, the MIN duplicate existing id — a stable
    * witness, not the cosine-nearest — and keep/drop). Per batch the
    * work is O(slice · cell occupancy) and the pair output is sized by
    * the slice's dup rate — never the corpus' internal near-dup mass,
    * never a whole-corpus re-pair. The oracle fits on the existing side
    * (q144's fit-on-base rule), assigns everyone, and keeps exactly the
    * cross-parity within-cell pairs.
    */
  def q184(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = t(spark, dir, "embeddings").coalesce(8)
    val existing = e.filter($"vec_id" % 10 =!= 0)
    val incoming = e.filter($"vec_id" % 10 === 0)
    // the maintained quantizer: fitted on the EXISTING corpus (the q142
    // nightly build); its assignment frame doubles as the existing side
    val (exAssign, cent) = Similarity.kmeansFit(existing, "vec_id",
      "embedding", k = 8, iters = 2, materialize = true, withVec = true)
    try {
      val incAssign = Similarity.assignToCentroids(incoming,
        Similarity.localize(cent), "vec_id", "embedding", withVec = true)
      val pairs = Similarity.semanticCrossPairs(incAssign, exAssign,
        "vec_id", "embedding", minCos6 = 0.4)
      val agg = pairs.groupBy($"in_id".as("vec_id"))
        .agg(count(lit(1)).as("n_dup_existing"),
          min($"ex_id").as("min_dup_existing"))
      incoming.select($"vec_id")
        .join(agg, Seq("vec_id"), "left")
        .select($"vec_id",
          coalesce($"n_dup_existing", lit(0L)).as("n_dup_existing"),
          $"min_dup_existing",
          when($"n_dup_existing".isNotNull, lit("drop"))
            .otherwise(lit("keep")).as("action"))
        .orderBy($"vec_id".asc_nulls_first)
    } finally exAssign.unpersist(): Unit
  }

  /** Fit-on-existing k-means (q144's rule), assignment covering
    * everyone, cross-parity within-cell cosine pairs at 0.4, verdict per
    * incoming vector.
    */
  val q184Sql: String =
    s"""${LlmOps.kmeansCtes("vec_id % 10 <> 0")},
       |xp AS (
       |  SELECT x.vec_id AS in_id, y.vec_id AS ex_id
       |  FROM avx x JOIN avx y
       |    ON x.cell = y.cell AND x.vec_id % 10 = 0 AND y.vec_id % 10 <> 0
       |  WHERE ROUND(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= 0.4),
       |ag AS (SELECT in_id, COUNT(*) AS n_dup_existing,
       |              MIN(ex_id) AS min_dup_existing
       |       FROM xp GROUP BY in_id)
       |SELECT e.vec_id,
       |  COALESCE(ag.n_dup_existing, 0) AS n_dup_existing,
       |  ag.min_dup_existing,
       |  CASE WHEN ag.n_dup_existing IS NOT NULL THEN 'drop' ELSE 'keep' END AS action
       |FROM embeddings e LEFT JOIN ag ON ag.in_id = e.vec_id
       |WHERE e.vec_id % 10 = 0
       |ORDER BY vec_id NULLS FIRST""".stripMargin

  /** Q95 — TF-IDF top-5 terms per document: tf from the token explode,
    * df from the distinct (doc, term) set, idf = ln(N/df), ranked on the
    * 6dp-rounded score with the term as tie-break. The inverted-index
    * shape: one explode → one (doc,term) agg → one slim per-term agg
    * joined back (Catalyst broadcasts the term side when it fits);
    * nothing quadratic, nothing driver-side.
    */
  def q95(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents")
    val tok = docs.select($"doc_id", explode(TextOps.tokens($"text")).as("term"))
    val tf = tok.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(df, "term").crossJoin(broadcast(total))
      .withColumn("score6",
        round($"tf" * log($"__n".cast(DoubleType) / $"df"), 6))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"score6".desc, $"term".asc)
    scored.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"doc_id", $"term", $"tf", $"df", $"score6", $"rn")
      .orderBy($"doc_id".asc_nulls_first, $"rn".asc_nulls_first)
  }

  val q95Sql: String =
    s"""${LlmOps.tokCte},
       |tfx AS (
       |  SELECT doc_id, t.tok AS term, COUNT(*) AS tf
       |  FROM tok, UNNEST(toks) AS t(tok) GROUP BY doc_id, t.tok),
       |dfx AS (SELECT term, COUNT(*) AS df FROM tfx GROUP BY term),
       |scored AS (
       |  SELECT f.doc_id, f.term, f.tf, d.df,
       |    ROUND(f.tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / d.df), 6) AS score6
       |  FROM tfx f JOIN dfx d ON d.term = f.term),
       |ranked AS (
       |  SELECT doc_id, term, tf, df, score6,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score6 DESC, term ASC) AS rn
       |  FROM scored)
       |SELECT doc_id, term, tf, df, score6, rn FROM ranked WHERE rn <= 5
       |ORDER BY doc_id NULLS FIRST, rn NULLS FIRST""".stripMargin

  /** Q96 — SEQUENCE PACKING: assign documents (in stable doc_id order,
    * per language) to fixed 2048-token training bins by running token
    * count — the greedy contiguous packing an LLM pre-tokenization
    * pipeline runs before batching. One window over (lang, doc_id): no
    * joins, no driver state; at 100 TB the window partitions by the
    * mixture stratum and streams.
    */
  def q96(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 2048.0
    val w = Window.partitionBy($"lang").orderBy($"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "documents")
      .select($"doc_id", $"lang",
        size(TextOps.tokens($"text")).cast(LongType).as("n_tok"))
      .withColumn("cum_tok", sum($"n_tok").over(w))
      .withColumn("bin",
        floor(($"cum_tok" - $"n_tok") / budget).cast(LongType))
      .orderBy($"doc_id".asc_nulls_first)
  }

  val q96Sql: String =
    s"""${LlmOps.tokCte},
       |n AS (
       |  SELECT d.doc_id, d.lang, CAST(len(t.toks) AS BIGINT) AS n_tok
       |  FROM documents d JOIN tok t ON t.doc_id = d.doc_id),
       |c AS (
       |  SELECT doc_id, lang, n_tok,
       |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
       |  FROM n)
       |SELECT doc_id, lang, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok,
       |  CAST(FLOOR((cum_tok - n_tok) / 2048.0) AS BIGINT) AS bin
       |FROM c ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Q97 — MIXTURE REBALANCING: deterministically sample each language
    * stratum toward a declared target share (en .35 / de .15 / es .15 /
    * fr .15 / zh .20). rate = min(1, target·N / count) — over-represented
    * strata are downsampled, the rest pass whole — applied with q80's
    * reproducible md5-bucket rule, so the same doc survives on every
    * run/engine. The whole op is two tiny aggregates broadcast onto one
    * corpus scan.
    */
  val q97Targets: Seq[(String, Double)] =
    Seq("en" -> 0.35, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.20)

  def q97(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents")
    val targets = q97Targets.toDF("lang", "target")
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("__n"))))
    val rates = counts.join(targets, "lang")
      .select($"lang",
        least(lit(1.0), $"target" * $"__n".cast(DoubleType) / $"cnt").as("rate"))
    val bucket = conv(substring(md5($"doc_id".cast(StringType)), 1, 8), 16, 10)
      .cast(LongType) % 1000000L
    docs.join(broadcast(rates), "lang")
      .filter(bucket < floor($"rate" * 1000000.0).cast(LongType))
      .select($"doc_id", $"lang", round($"rate", 6).as("rate6"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  val q97Sql: String = {
    val targetRows = q97Targets
      .map { case (l, t) => s"('$l', $t)" }.mkString(", ")
    s"""WITH tgt(lang, target) AS (VALUES $targetRows),
       |cnt AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
       |rates AS (
       |  SELECT c.lang,
       |    least(1.0, t.target * CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / c.cnt) AS rate
       |  FROM cnt c JOIN tgt t ON t.lang = c.lang)
       |SELECT d.doc_id, d.lang, ROUND(r.rate, 6) AS rate6
       |FROM documents d JOIN rates r ON r.lang = d.lang
       |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
       |      < CAST(FLOOR(r.rate * 1000000.0) AS BIGINT)
       |ORDER BY doc_id NULLS FIRST""".stripMargin
  }

  /** Q98 — INT8 EMBEDDING QUANTIZATION: per-vector symmetric scale
    * (max|v|/127), quantize with floor(x/scale + 0.5) (well-defined in
    * both engines, unlike round-half ties), then report reconstruction
    * quality — max absolute error and cosine(original, dequantized). The
    * 4× memory cut every 100 TB ANN index takes first; map-only per-row
    * array math, zero shuffles before the output sort.
    */
  def q98(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = transform($"embedding", x => x.cast(DoubleType))
    val base = t(spark, dir, "embeddings")
      .select($"vec_id", v.as("v"),
        (array_max(transform(v, abs(_))) / 127.0).as("scale"))
      .filter($"scale" > 0.0)
    val dq = transform($"v", x => floor(x / $"scale" + 0.5) * $"scale")
    base.withColumn("dq", dq)
      .select($"vec_id",
        round($"scale", 6).as("scale6"),
        round(array_max(zip_with($"v", $"dq", (a, b) => abs(a - b))), 6).as("err6"),
        round(Similarity.dot($"v", $"dq")
          / (Similarity.norm($"v") * Similarity.norm($"dq")), 6).as("cos6"))
      .orderBy($"vec_id".asc_nulls_first)
  }

  val q98Sql: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      |      FROM e),
      |d AS (SELECT vec_id, v, scale,
      |        list_transform(v, x -> floor(x / scale + 0.5) * scale) AS dq
      |      FROM s WHERE scale > 0)
      |SELECT vec_id, ROUND(scale, 6) AS scale6,
      |  ROUND(list_max(list_transform(range(1, len(v) + 1), i -> abs(v[i] - dq[i]))), 6) AS err6,
      |  ROUND(list_dot_product(v, dq)
      |    / (SQRT(list_dot_product(v, v)) * SQRT(list_dot_product(dq, dq))), 6) AS cos6
      |FROM d ORDER BY vec_id NULLS FIRST""".stripMargin

  /** Q99 — Z-ORDER LAYOUT KEY: interleave the low 8 bits of a customer
    * bucket and an order-date day bucket into one 16-bit Morton key, the
    * multi-dimensional clustering order that makes min/max file skipping
    * work on BOTH predicates at once. Writing 100 TB sorted by `zkey`
    * (`sortWithinPartitions` after a range partition on it) is the layout
    * this key exists for; here the key itself is the oracle-gated part —
    * pure integer bit arithmetic, identical in any engine.
    */
  /** The (xb, yb) bucket columns and their interleaved Morton key —
    * shared by q99 (the key itself) and q107 (the range-partitioned
    * layout write that uses it).
    */
  private[queries] def zBuckets(spark: SparkSession): (Column, Column) = {
    import spark.implicits._
    (($"o_custkey" % 256).cast(LongType),
      (datediff(to_date($"o_orderdate"), lit("1992-01-01")) % 256).cast(LongType))
  }

  private[queries] def zInterleave(xb: Column, yb: Column): Column =
    (0 until 8).map { i =>
      (shiftright(xb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))) +
        (shiftright(yb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
    }.reduce(_ + _)

  /** The identical interleave over SQL columns named xb/yb. */
  private[queries] val zInterleaveSql: String = (0 until 8).map { i =>
    s"((xb >> $i) & 1) * ${1L << (2 * i + 1)} + ((yb >> $i) & 1) * ${1L << (2 * i)}"
  }.mkString(" + ")

  private[queries] val zBucketsSqlCte: String =
    """b AS (
      |  SELECT o_orderkey,
      |    CAST(o_custkey % 256 AS BIGINT) AS xb,
      |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 256 AS BIGINT) AS yb
      |  FROM orders)""".stripMargin

  def q99(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (xb, yb) = zBuckets(spark)
    t(spark, dir, "orders")
      .select($"o_orderkey", xb.as("xb"), yb.as("yb"))
      .withColumn("zkey", zInterleave($"xb", $"yb"))
      .orderBy($"zkey".asc_nulls_first, $"o_orderkey".asc_nulls_first)
  }

  val q99Sql: String =
    s"""WITH $zBucketsSqlCte
       |SELECT o_orderkey, xb, yb, $zInterleaveSql AS zkey
       |FROM b ORDER BY zkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin

  /** Q127 — DEDUP APPLY: the step after q94's decision — materialise the
    * deduplicated corpus (keep each cluster's representative, the
    * cluster-minimum doc) to parquet, read it back, and report the
    * per-language shrink (docs and chars kept vs dropped). This is the
    * artifact a dedup pipeline actually ships: q86 finds pairs, q94
    * labels clusters, q127 WRITES the surviving corpus. The write is
    * application-scoped scratch ([[graft.core.Scratch]], JVM-exit
    * cleaned); layout must never change results — the oracle computes
    * the identical report from the raw table.
    */
  def q127(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents")
    val pairs = MinHashDedup.ngramJaccardPairs(docs, "doc_id", "text",
      gramN = 5, rowsPerBand = 2, minJaccard = 0.5)
    val cs = graft.core.CacheScope.adopt(Components.clustersWithSize(
      pairs.select($"d1".as("a"), $"d2".as("b")),
      docs.select($"doc_id".as("id"))))
    val slug = dir.replaceAll("[^A-Za-z0-9]", "_")
    val out = graft.core.Scratch.deleteOnExit(
      java.nio.file.Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
        "graft-dedup", s"docs_${slug}_${spark.sparkContext.applicationId}").toString)
    docs.join(cs, docs("doc_id") === cs("id"))
      .filter($"doc_id" === $"cluster") // the cluster representative survives
      .select(docs("doc_id"), $"lang", $"text", $"n_chars")
      .write.mode("overwrite").parquet(out)
    val kept = spark.read.parquet(out)
      .groupBy($"lang").agg(
        count(lit(1)).as("n_kept"),
        sum($"n_chars").as("chars_kept"))
    docs.groupBy($"lang").agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("chars_total"))
      .join(kept, Seq("lang"), "left")
      .select($"lang", $"n_docs",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        ($"n_docs" - coalesce($"n_kept", lit(0L))).as("n_dropped"),
        coalesce($"chars_kept", lit(0L)).as("chars_kept"),
        ($"chars_total" - coalesce($"chars_kept", lit(0L))).as("chars_dropped"))
      .orderBy($"lang".asc_nulls_first)
  }

  /** The oracle applies the identical keep rule (doc == its cluster min,
    * clusters from the same 3-round unrolling as q94 — valid per the
    * corpus convergence spec) without any layout write: layout
    * independence is exactly what the gate checks.
    */
  val q127Sql: String =
    s"""${LlmOps.ngramPairCtes},
       |e AS MATERIALIZED (SELECT d1 AS a, d2 AS b FROM pairs
       |      UNION ALL SELECT d2 AS a, d1 AS b FROM pairs),
       |lab0 AS (SELECT doc_id AS id, doc_id AS cluster FROM documents),
       |${labRound(1)},
       |${labRound(2)},
       |${labRound(3)},
       |k AS (
       |  SELECT d.lang, COUNT(*) AS n_kept,
       |    CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
       |  FROM documents d JOIN lab3 l ON l.id = d.doc_id
       |  WHERE d.doc_id = l.cluster GROUP BY d.lang),
       |tot AS (
       |  SELECT lang, COUNT(*) AS n_docs,
       |    CAST(SUM(n_chars) AS BIGINT) AS chars_total
       |  FROM documents GROUP BY lang)
       |SELECT t.lang, t.n_docs,
       |  COALESCE(k.n_kept, 0) AS n_kept,
       |  t.n_docs - COALESCE(k.n_kept, 0) AS n_dropped,
       |  COALESCE(k.chars_kept, 0) AS chars_kept,
       |  t.chars_total - COALESCE(k.chars_kept, 0) AS chars_dropped
       |FROM tot t LEFT JOIN k ON k.lang = t.lang
       |ORDER BY t.lang NULLS FIRST""".stripMargin

  /** Q129 — GRAPH CENTRALITY (integer-scaled PageRank, 5 damped rounds)
    * over the q86/q94 n-gram similarity graph: the representative-
    * selection signal a dedup pipeline uses when "lowest doc_id" is too
    * naive — the highest-rank member of a duplicate cluster is its most
    * central (best-connected) exemplar, and on a web-link graph the same
    * op is the classic source-quality weight for pretraining mixes.
    * All arithmetic is i64 ([[graft.ops.GraphRank]]: ranks in 1e-9
    * units, per-edge shares by integer floor division) so the
    * distributed sum is order-independent and the oracle can hash-match
    * exactly — the q101 fixed-point trick applied to an ITERATIVE
    * algorithm. One shuffle per round on the cached mirrored edge list;
    * plans stay constant-size via the [[graft.ops.Components.mat]]
    * rebase.
    */
  def q129(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents")
    val pairs = MinHashDedup.ngramJaccardPairs(docs, "doc_id", "text",
      gramN = 5, rowsPerBand = 2, minJaccard = 0.5)
    graft.core.CacheScope.adopt(
        graft.ops.GraphRank.pagerank(
          pairs.select($"d1".as("a"), $"d2".as("b")), rounds = 5))
      .select($"id".as("doc_id"), $"rank")
      .orderBy($"rank".desc, $"doc_id".asc_nulls_first)
  }

  /** One unrolled damped update over s = sum of neighbor in-shares
    * (rank(a) // deg(a)), all BIGINT: the overflow-safe decomposition
    * `(s // 100) * 85 + ((s % 100) * 85) // 100` — identical to
    * `(85 * s) // 100` for s >= 0 but the largest intermediate is
    * `85 * (s // 100)`, matching [[graft.ops.GraphRank]]'s i64 form
    * exactly (the SUM is cast down from DuckDB's HUGEINT first so every
    * intermediate stays i64).
    */
  private def rankRound(n: Int): String =
    s"""r$n AS (
       |  SELECT id,
       |         150000000 + (s // 100) * 85 + ((s % 100) * 85) // 100 AS rank
       |  FROM (SELECT e.b AS id, CAST(SUM(r.rank // d.deg) AS BIGINT) AS s
       |        FROM e JOIN r${n - 1} r ON r.id = e.a JOIN deg d ON d.id = e.a
       |        GROUP BY e.b))""".stripMargin

  val q129Sql: String =
    s"""${LlmOps.ngramPairCtes},
       |e AS MATERIALIZED (SELECT d1 AS a, d2 AS b FROM pairs
       |      UNION ALL SELECT d2 AS a, d1 AS b FROM pairs),
       |deg AS (SELECT a AS id, COUNT(*) AS deg FROM e GROUP BY a),
       |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS rank FROM deg),
       |${rankRound(1)},
       |${rankRound(2)},
       |${rankRound(3)},
       |${rankRound(4)},
       |${rankRound(5)}
       |SELECT id AS doc_id, rank FROM r5
       |ORDER BY rank DESC, doc_id ASC""".stripMargin

  /** Q137 — CROSS-CORPUS DEDUP: each incoming doc (odd ids — the
    * simulated new-crawl slice) deduped against the EXISTING corpus only
    * (even ids), via [[graft.ops.MinHashDedup.crossNgramPairs]]'s
    * asymmetric band join — no within-side pair is generated, so at
    * 100 TB the join output is sized by the incoming slice's dup rate,
    * not the corpus' internal near-dup mass. Verdict per incoming doc:
    * how many existing near-dups, and the smallest existing id (the doc
    * it would be deduped against); fresh docs report 0/NULL. The oracle
    * computes ALL pairs (the q86 CTE machinery) and keeps the
    * cross-parity ones — same set, quadratic-in-SQL vs sliced-in-Spark.
    */
  def q137(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents")
    val incoming = docs.filter($"doc_id" % 2 === 1)
    val existing = docs.filter($"doc_id" % 2 === 0)
    val pairs = MinHashDedup.crossNgramPairs(
      incoming, existing, "doc_id", "text",
      gramN = 5, rowsPerBand = 2, minJaccard = 0.5)
    val agg = pairs.groupBy($"in_id".as("doc_id"))
      .agg(count(lit(1)).as("n_dup_existing"),
        min($"ex_id").as("min_dup_existing"))
    incoming.select($"doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_dup_existing", lit(0L)).as("n_dup_existing"),
        $"min_dup_existing")
      .orderBy($"doc_id".asc_nulls_first)
  }

  val q137Sql: String =
    s"""${LlmOps.ngramPairCtes},
       |cp AS (
       |  SELECT CASE WHEN d1 % 2 = 1 THEN d1 ELSE d2 END AS in_id,
       |         CASE WHEN d1 % 2 = 1 THEN d2 ELSE d1 END AS ex_id
       |  FROM pairs WHERE (d1 % 2) <> (d2 % 2)),
       |ag AS (SELECT in_id, COUNT(*) AS n_dup_existing,
       |              MIN(ex_id) AS min_dup_existing
       |       FROM cp GROUP BY in_id)
       |SELECT d.doc_id,
       |  COALESCE(ag.n_dup_existing, 0) AS n_dup_existing,
       |  ag.min_dup_existing
       |FROM documents d LEFT JOIN ag ON ag.in_id = d.doc_id
       |WHERE d.doc_id % 2 = 1
       |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Q138 — TRAIN/VAL/TEST SPLIT LEAKAGE report: assign every doc a
    * deterministic hash split (md5-bucket ~80/10/10 — reproducible across
    * engines and runs, no rand(); the first-byte % 10 rule is ~0.5%
    * biased — buckets 0–5 occur 26/256, 6–9 occur 25/256, i.e.
    * 80.5/9.8/9.8 — fine for a leakage report where both engines apply
    * the identical rule; bucket on more hex digits if exact proportions
    * matter), then count the q86 near-dup pairs by
    * the (unordered) split-pair they straddle. Off-diagonal rows ARE the
    * leakage a training pipeline must catch before shipping the split: a
    * near-duplicate of a test doc sitting in train inflates eval. Scale
    * shape: split assignment is a map-only expression; the pair set is
    * the already-banded q86 generator; the report is a tiny grouped
    * count — nothing new shuffles beyond two slim id→split joins.
    */
  def q138(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents")
    val bucket =
      expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS INT) % 10")
    val splits = docs.select($"doc_id",
      when(bucket < 8, "train").when(bucket === 8, "val")
        .otherwise("test").as("split"))
    val pairs = MinHashDedup.ngramJaccardPairs(
      docs, "doc_id", "text", gramN = 5, rowsPerBand = 2, minJaccard = 0.5)
    pairs
      .join(splits.select($"doc_id".as("d1"), $"split".as("s1")), Seq("d1"))
      .join(splits.select($"doc_id".as("d2"), $"split".as("s2")), Seq("d2"))
      .select(least($"s1", $"s2").as("split_a"),
        greatest($"s1", $"s2").as("split_b"))
      .groupBy($"split_a", $"split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"split_a".asc_nulls_first, $"split_b".asc_nulls_first)
  }

  val q138Sql: String =
    s"""${LlmOps.ngramPairCtes},
       |sp AS (
       |  SELECT doc_id, CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
       |                      ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) % 10 AS b
       |        FROM documents)),
       |lk AS (
       |  SELECT LEAST(sa.split, sb.split) AS split_a,
       |         GREATEST(sa.split, sb.split) AS split_b
       |  FROM pairs p JOIN sp sa ON sa.doc_id = p.d1
       |               JOIN sp sb ON sb.doc_id = p.d2)
       |SELECT split_a, split_b, COUNT(*) AS n_pairs FROM lk
       |GROUP BY split_a, split_b
       |ORDER BY split_a NULLS FIRST, split_b NULLS FIRST""".stripMargin

  /** Q140 — EVAL DECONTAMINATION APPLY: q138 found the leakage; this is
    * the fix a pipeline ships. Using the same deterministic md5-bucket
    * split, every TRAIN doc that near-duplicates any val/test doc (q137's
    * asymmetric cross join, train side vs eval side — within-train dups
    * are q94's business, not contamination) is marked `drop`, with the
    * dup count and the smallest offending eval id as the audit trail.
    * Training on a near-copy of an eval doc inflates the eval; dropping
    * from TRAIN (never from eval) fixes it without changing the
    * benchmark. Scale shape: q137's — the cross join's output is sized
    * by the train↔eval dup rate only, and the verdict is one slim
    * aggregation plus a left join back to the train ids.
    */
  def q140(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket =
      expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS INT) % 10")
    val withSplit = t(spark, dir, "documents").select($"doc_id", $"text",
      when(bucket < 8, "train").when(bucket === 8, "val")
        .otherwise("test").as("split"))
    val train = withSplit.filter($"split" === "train")
    val eval = withSplit.filter($"split" =!= "train")
    val pairs = MinHashDedup.crossNgramPairs(
      train, eval, "doc_id", "text",
      gramN = 5, rowsPerBand = 2, minJaccard = 0.5)
    val agg = pairs.groupBy($"in_id".as("doc_id"))
      .agg(count(lit(1)).as("n_eval_dups"),
        min($"ex_id").as("worst_eval_dup"))
    train.select($"doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select($"doc_id",
        when($"n_eval_dups".isNotNull, lit("drop"))
          .otherwise(lit("keep")).as("action"),
        coalesce($"n_eval_dups", lit(0L)).as("n_eval_dups"),
        $"worst_eval_dup")
      .orderBy($"doc_id".asc_nulls_first)
  }

  val q140Sql: String =
    s"""${LlmOps.ngramPairCtes},
       |sp AS (
       |  SELECT doc_id, CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
       |                      ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) % 10 AS b
       |        FROM documents)),
       |cp AS (
       |  SELECT CASE WHEN sa.split = 'train' THEN p.d1 ELSE p.d2 END AS in_id,
       |         CASE WHEN sa.split = 'train' THEN p.d2 ELSE p.d1 END AS ex_id
       |  FROM pairs p JOIN sp sa ON sa.doc_id = p.d1
       |               JOIN sp sb ON sb.doc_id = p.d2
       |  WHERE (sa.split = 'train') <> (sb.split = 'train')),
       |ag AS (SELECT in_id, COUNT(*) AS n_eval_dups,
       |              MIN(ex_id) AS worst_eval_dup
       |       FROM cp GROUP BY in_id)
       |SELECT d.doc_id,
       |  CASE WHEN ag.in_id IS NOT NULL THEN 'drop' ELSE 'keep' END AS action,
       |  COALESCE(ag.n_eval_dups, 0) AS n_eval_dups,
       |  ag.worst_eval_dup
       |FROM sp d LEFT JOIN ag ON ag.in_id = d.doc_id
       |WHERE d.split = 'train'
       |ORDER BY doc_id NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q94_neardup_clusters" -> (q94 _),
    "q95_tfidf_terms" -> (q95 _),
    "q96_sequence_packing" -> (q96 _),
    "q97_mixture_rebalance" -> (q97 _),
    "q98_int8_quantize" -> (q98 _),
    "q99_zorder_key" -> (q99 _),
    "q125_embed_clusters" -> (q125 _),
    "q127_dedup_apply" -> (q127 _),
    "q129_pagerank" -> (q129 _),
    "q137_cross_corpus_dedup" -> (q137 _),
    "q138_split_leakage" -> (q138 _),
    "q140_decontaminate" -> (q140 _),
    "q169_semantic_dedup" -> (q169 _),
    "q175_semdedup_pruned_index" -> (q175 _),
    "q184_incremental_semdedup" -> (q184 _))

  def oracles: Map[String, String] = Map(
    "q94_neardup_clusters" -> q94Sql,
    "q95_tfidf_terms" -> q95Sql,
    "q96_sequence_packing" -> q96Sql,
    "q97_mixture_rebalance" -> q97Sql,
    "q98_int8_quantize" -> q98Sql,
    "q99_zorder_key" -> q99Sql,
    "q125_embed_clusters" -> q125Sql,
    "q127_dedup_apply" -> q127Sql,
    "q129_pagerank" -> q129Sql,
    "q137_cross_corpus_dedup" -> q137Sql,
    "q138_split_leakage" -> q138Sql,
    "q140_decontaminate" -> q140Sql,
    "q169_semantic_dedup" -> q169Sql,
    "q175_semdedup_pruned_index" -> q175Sql,
    "q184_incremental_semdedup" -> q184Sql)
}
