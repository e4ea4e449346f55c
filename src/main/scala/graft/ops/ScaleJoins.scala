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
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(new java.io.File(whPath),
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
