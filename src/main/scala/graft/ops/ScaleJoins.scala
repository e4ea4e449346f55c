package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for hostile data distributions at 100 TB —
  * SURVEY.md §7.4 "all ops keyed and shuffle-friendly".
  *
  * AQE's skew-join handling covers most cases at runtime; these are the
  * explicit tools for when the planner can't see the skew (e.g. a hot key
  * known from domain knowledge) or when a repeated join key deserves a
  * persistent co-located layout.
  */
object ScaleJoins {

  /** Inner equi-join with the skewed (left) side salted `salts` ways: the
    * hot key's rows spread over `salts` reducers; the right side is
    * replicated `salts`× (keep it the smaller side). Result is identical
    * to the plain join for any salt assignment — pmod over a row hash is
    * used only to spread load deterministically.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      salts: Int): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    // shuffled-hash: the replicated side is the SMALL side by this
    // operator's contract, so build a hash table per partition instead of
    // sorting both sides (SMJ would sort the big salted side — the exact
    // cost salting is trying to spread)
    l.join(r.hint("shuffle_hash"), Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** The q121 skew metric folded into a join-strategy DECISION: max over
    * keys of cnt·n_keys/total (how many times the hottest key exceeds
    * the mean) and the salt count to use. `salts == 1` means a plain
    * join. Mirrors the reference's measure-then-negotiate capacity shape
    * (`/root/reference/examples/example_etl.py:148-155`): measure first,
    * then pick the execution layout.
    */
  final case class SaltDecision(maxSkew: Double, salts: Int) {
    def salted: Boolean = salts > 1
  }

  /** Per-key occurrence counts — the measurement frame both
    * [[decideFromCounts]] and a caller's own key-derived artifacts (a
    * dim table, a q121-style report) read, so one shuffle serves all.
    */
  def keyCounts(left: DataFrame, key: String): DataFrame =
    left.groupBy(col(key)).agg(count(lit(1)).as("cnt"))

  /** The decision from an existing [[keyCounts]] frame (pass a cached
    * one to share the measurement pass with other consumers). */
  def decideFromCounts(counts: DataFrame, threshold: Double = 4.0,
                       maxSalts: Int = 16): SaltDecision = {
    require(threshold >= 1.0 && maxSalts >= 1)
    val row = counts.agg(max(col("cnt")), count(lit(1)), sum(col("cnt"))).head()
    if (row.isNullAt(0)) SaltDecision(0.0, 1) // empty left side
    else {
      val maxSkew = row.getLong(0).toDouble * row.getLong(1) / row.getLong(2)
      val salts =
        if (maxSkew >= threshold) math.min(maxSalts, math.ceil(maxSkew).toInt)
        else 1
      SaltDecision(maxSkew, salts)
    }
  }

  /** Decide whether `left`'s `key` distribution needs salting: one
    * column-pruned agg pass over the key (count per key → max/n/total).
    * The hot key is spread over ~maxSkew reducers, capped at `maxSalts`
    * (replication cost of the right side grows with the salt count). At
    * 100 TB the same decision runs on a TABLESAMPLE of the key column —
    * the result is correct for ANY decision, so estimation error only
    * moves the threshold, never the answer.
    */
  def decideSalts(left: DataFrame, key: String, threshold: Double = 4.0,
                  maxSalts: Int = 16): SaltDecision =
    decideFromCounts(keyCounts(left, key), threshold, maxSalts)

  /** Inner equi-join that measures the left side's key skew and picks
    * plain vs salted-k itself ([[decideSalts]]): the automated version
    * of the q84 decision a pipeline author otherwise hardcodes. Result
    * is identical to the plain join either way (OpsSpec proves both the
    * equivalence and that the decision flips on a hot key).
    */
  def autoSaltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                          threshold: Double = 4.0,
                          maxSalts: Int = 16): DataFrame = {
    val d = decideSalts(left, key, threshold, maxSalts)
    if (d.salted) saltedInnerJoin(left, right, key, d.salts)
    else left.join(right, Seq(key), "inner")
  }

  /** Two-stage SALTED AGGREGATION for a hot grouping key — the skew tool
    * AQE does NOT provide. The division of labour (ScaleJoinsSpec proves
    * both halves on one fixture; SURVEY §4.2 states the rule):
    *
    *   - JOIN-side skew: leave it to AQE. `skewJoin` observes the map
    *     output sizes at the shuffle boundary and SPLITS the skewed
    *     partition into per-split tasks at runtime — no replication cost,
    *     no salt column, works for skew nobody predicted.
    *   - AGGREGATION-side skew: AQE never splits a skewed AGGREGATE
    *     partition (splitting would break "all rows of a group on one
    *     reducer"). Algebraic aggs (sum/count/min/max) are already saved
    *     by map-side partial aggregation; what's left exposed is the
    *     NON-DECOMPOSABLE tail — collect_list/collect_set-style state
    *     that grows with the hot key's row count on ONE reducer. That is
    *     where salting stays necessary: stage 1 aggregates by
    *     (key, salt(value)) so the hot key's state builds on `salts`
    *     reducers, stage 2 merges the per-salt partials by key.
    *
    * This helper ships the collect_set instance (distinct values per
    * key): stage-1 partials are per-salt distinct sets (disjoint across
    * salts when salted by the VALUE hash), stage 2 flattens and sorts —
    * result provably equals the direct `collect_set` for any salt count.
    */
  def saltedDistinctValues(df: DataFrame, key: String, valueCol: String,
                           salts: Int): DataFrame = {
    require(salts > 0)
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_set(col(valueCol)).as("__part"))
      .groupBy(col(key))
      .agg(array_sort(flatten(collect_list(col("__part")))).as("values"))
  }

  /** Write a frame bucketed+sorted by `key` as a catalog table: repeated
    * equi-joins / aggregations on `key` across such tables plan with NO
    * shuffle (bucket-local sort-merge). This is the persistent co-location
    * layout for fact-fact joins at scale.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `${table.replace("`", "``")}`"): Unit
    // A PREVIOUS session's files at the managed location block CREATE
    // (LOCATION_ALREADY_EXISTS): with an in-memory catalog the table is
    // unknown but its directory survives, so clear the local leftover.
    // Only the unqualified-name default-database layout is handled here
    // (db.tbl lives under <db>.db/ and needs a metastore-aware drop); the
    // raw warehouse string is parsed leniently — spaces in the path must
    // not crash the write (URI would throw on them).
    if (!table.contains('.')) {
      val whRaw = spark.conf.get("spark.sql.warehouse.dir")
      val whPath =
        if (whRaw.startsWith("file:")) whRaw.stripPrefix("file:")
        else if (whRaw.contains(":")) "" // non-local scheme: not ours to clean
        else whRaw
      if (whPath.nonEmpty) {
        graft.ops.VersionedTarget.rmTree(new java.io.File(
          new java.io.File(whPath),
          table.toLowerCase(java.util.Locale.ROOT)))
      }
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Inner equi-join where the BIG side is first pruned by a Bloom filter
    * built (distributed, via `stat.bloomFilter`'s tree-aggregation) over
    * the small side's join keys. False positives survive the prune but
    * are removed by the exact join, so the result is identical to the
    * plain join for any fpp — the filter only cuts how much of the big
    * side reaches the shuffle. This is the manual form of Spark's
    * InjectRuntimeFilter for when the planner can't prove the pattern
    * (e.g. the small side is a subquery behind a non-pushable predicate):
    * at 100 TB a 2%-selective dimension predicate means the fact side
    * shuffles 2% of its rows instead of all of them.
    */
  def bloomPrunedInnerJoin(big: DataFrame, small: DataFrame,
                           bigKey: String, smallKey: String,
                           fpp: Double = 0.01): DataFrame = {
    val nKeys = math.max(small.count(), 1L)
    val bf = small.stat.bloomFilter(smallKey, nKeys, fpp)
    big.filter(graft.functions.BloomMightContain.mightContain(col(bigKey), bf))
      .join(small, col(bigKey) === col(smallKey), "inner")
  }

  /** Collect table + column statistics for a catalog table — the CBO
    * feed: row count/size replace raw-file-size guesses in broadcast
    * selection and join reordering; per-column min/max/NDV/null counts
    * drive filter-cardinality estimates. The 100 TB pattern is
    * stats-at-ingest: run right after [[writeBucketed]] so every
    * downstream plan sees real cardinalities (enable
    * `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled`).
    */
  def analyzeTable(spark: org.apache.spark.sql.SparkSession, table: String,
                   columns: Seq[String] = Nil): Unit = {
    // backtick-quote identifiers: names that need quoting (or arrive from
    // an external submitter) must not break or inject into the statement
    def q(ident: String) = "`" + ident.replace("`", "``") + "`"
    val qualified = table.split('.').map(q).mkString(".")
    spark.sql(s"ANALYZE TABLE $qualified COMPUTE STATISTICS"): Unit
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE $qualified COMPUTE STATISTICS FOR COLUMNS " +
        columns.map(q).mkString(", ")): Unit
  }
}
