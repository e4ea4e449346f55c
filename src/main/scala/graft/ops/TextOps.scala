package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for LLM training-data pipelines —
  * SURVEY.md §2B.11 (Q62) and the training-data additions (language-ID,
  * quality scoring, token counting, fingerprinting).
  *
  * All pure-`Column` expressions (codegen'd built-ins, no UDFs) so they
  * fuse into the scan's WholeStageCodegen — per-row cost only, no shuffle,
  * which is what makes them viable over 100 TB of documents.
  */
object TextOps {

  /** Lowercased alnum word tokens (order-preserving, may repeat) — the
    * native single-pass expression [[graft.functions.Tokens]]; identical
    * output to `filter(split(lower(text), "[^a-z0-9]+"), _ =!= "")`, but
    * without that HOF's interpreted per-element lambda in the hot loop.
    */
  def tokens(text: Column): Column = graft.functions.Tokens.tokens(text)

  /** Distinct token set. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Word `n`-gram shingles (empty when fewer than n tokens) — native
    * single-pass expression ([[graft.functions.WordShingles]]); the HOF
    * formulation evaluated an interpreted lambda per shingle and
    * dominated the dedup bench.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.WordShingles.shingles(text, n)

  /** Deterministic 32-bit token hash shared with the DuckDB oracle:
    * first 4 bytes of md5 read as a big-endian unsigned int
    * (`CAST('0x'||substr(md5(s),1,8) AS BIGINT)` on the oracle side).
    * Engine-portable, unlike Spark's Murmur3 `hash()`.
    */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast(LongType)

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs, digit runs, and single punctuation
    * marks each count as one token (a cheap proxy for byte-pair tokenizer
    * output size, rank-correlated with real BPE counts).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Punctuation/symbol character ratio (on the lowercased text). */
  def punctRatio(text: Column): Column = {
    val lo = lower(text)
    (length(lo) - length(regexp_replace(lo, "[a-z0-9 ]", "")))
      .cast(DoubleType) / length(lo)
  }

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Stopword-hit count for one language list (multiplicity-preserving;
    * native [[graft.functions.CountInList]] — no per-token interpreted
    * lambda).
    */
  def stopwordHits(toks: Column, lang: String): Column =
    graft.functions.CountInList.countIn(toks, stopwords(lang))

  /** n-gram-heuristic language ID: argmax of per-language stopword hits
    * with a fixed priority order (en > de > fr > es), "und" when no list
    * hits. Deterministic; mirrored 1:1 in oracle SQL.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val en = stopwordHits(toks, "en"); val de = stopwordHits(toks, "de")
    val fr = stopwordHits(toks, "fr"); val es = stopwordHits(toks, "es")
    when(en + de + fr + es === 0, "und")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Heuristic quality score in [0, ~1.5]: stopword density is good,
    * punctuation soup is bad, some length is good. Fixed expression order
    * both engines → bit-identical doubles.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks)
    val stopRatio = stopwordHits(toks, "en").cast(DoubleType) / greatest(nTok, lit(1))
    round(stopRatio - lit(0.5) * punctRatio(text) +
      least(nTok, lit(100)).cast(DoubleType) / 200.0, 6)
  }

  /** 16-bit SimHash over the distinct token set: bit i of the fingerprint
    * is the sign of Σ_tokens (±1 by bit i of the token hash). Near-dup
    * texts (high token overlap) land within small Hamming distance.
    * Pure integer arithmetic → engine-portable.
    *
    * Scalar form for composability — the same native
    * [[graft.functions.SimHashFp]] pass as [[simhashTable]] (1 md5 per
    * token; the former HOF fold hashed each token once PER BIT), with
    * tokenless text mapping to fingerprint 0 (the empty fold's value)
    * rather than the table form's dropped row.
    */
  def simhash16(text: Column): Column =
    coalesce(graft.functions.SimHashFp.fp(text, 16), lit(0L))

  /** Rabin–Karp rolling-hash fingerprint sketch (winnowing-style): hash
    * each ordered token once, slide a `k`-token polynomial rolling hash
    * over the sequence (base 257, mod 2^31−1 — all arithmetic exact in
    * long), and keep the `bottom` smallest window hashes as the document
    * sketch. Shared-substring documents share window hashes, so sketch
    * overlap ≈ local similarity (the MOSS fingerprinting idea). The
    * window pass is a per-document `lead` window — partition-local,
    * no cross-doc shuffle beyond the doc_id hash.
    */
  def rollingFingerprint(docs: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, k: Int = 3, bottom: Int = 4): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && bottom >= 1)
    // one map-only pass via the native expression (no per-token explode,
    // no per-doc window shuffle/sort — the sketch is a per-doc quantity)
    docs.select(col(idCol),
        graft.functions.RollingFp.fp(col(textCol), k, bottom).as("__r"))
      .filter(col("__r").isNotNull) // docs with < k tokens have no windows
      .select(col(idCol), col("__r.n_windows").as("n_windows"),
        col("__r.fp").as("fp"))
  }

  /** WINNOWED SUBSTRING near-dup PAIRS — exact-substring duplication
    * evidence (the phenomenon Lee et al. 2022 dedup on) via the MOSS
    * winnowing scheme ([[graft.functions.WinnowedFps]]): every doc emits
    * its winnowed fingerprint postings in ONE map-only pass (the O(n)
    * deque lives inside the expression — no per-doc window shuffle),
    * fingerprints present in more than `maxDf` docs are dropped as
    * STOP-FINGERPRINTS (boilerplate is not duplication evidence — and
    * the cap bounds the postings join at maxDf² pairs per fingerprint,
    * the skew guard that keeps a common template line from going
    * quadratic at 100 TB), the surviving postings equi-join on the
    * fingerprint, and pairs sharing ≥ `minShared` fingerprints ship with
    * a containment score (shared / smaller capped set, 6dp). Guarantee:
    * a shared verbatim normalised substring of length ≥ k + w - 1 yields
    * a shared fingerprint, so long-enough verbatim overlap ALWAYS
    * produces candidate evidence — the property bag-of-grams Jaccard
    * dilutes on long documents.
    */
  def winnowedPairs(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int = 20, w: Int = 8,
                    minShared: Long = 3,
                    maxDf: Long = 10): org.apache.spark.sql.DataFrame = {
    // the postings feed several consumer branches (df cap, both pair
    // sides, both set sizes) and are DELIBERATELY recomputed per branch
    // rather than cached (the q86-family convention for map-only
    // passes): the fingerprint pass is column-pruned streaming compute
    // with no materialisation, while caching 100 TB of postings trades
    // CPU for cluster memory/disk pressure — measured at fixture scale
    // the cache is a net LOSS (2.14 s vs 1.38 s). A deployment that
    // re-fingerprints the same corpus across many queries persists the
    // postings once as a table instead (the q135 persisted-partial
    // pattern).
    val post = docs.select(col(idCol),
      explode(graft.functions.WinnowedFps.fps(col(textCol), k, w)).as("fp"))
    val live = post.groupBy(col("fp"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("fp"))
    val kept = post.join(live, Seq("fp"))
    val sz = kept.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    val pairs = kept.select(col(idCol).as("d1"), col("fp"))
      .join(kept.select(col(idCol).as("d2"), col("fp")), Seq("fp"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(sz.select(col(idCol).as("d1"), col("__n").as("__n1")), Seq("d1"))
      .join(sz.select(col(idCol).as("d2"), col("__n").as("__n2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("n_shared"),
        round(col("n_shared").cast(DoubleType)
          / least(col("__n1"), col("__n2")), 6).as("cont6"))
  }

  /** CROSS-CORPUS winnowed-substring near-dup PAIRS — [[winnowedPairs]]
    * in the q137 asymmetric shape: each INCOMING doc's fingerprints
    * probe the EXISTING corpus' postings only, so no within-side pair
    * is ever generated and the join output is sized by the incoming
    * slice's duplication rate — never the corpus' internal near-dup
    * mass. The stop-fingerprint df cap reads the FULL corpus (both
    * sides): boilerplate is boilerplate wherever it appears, and a
    * fingerprint hot on either side would otherwise blow up the probe.
    * A doc present on BOTH sides (a redelivered id) counts toward df
    * ONCE — the existing side's copy wins, so the df rule equals
    * [[winnowedPairs]]'s over the distinct-doc union exactly (a naive
    * union would double-count the overlap's fingerprints and drop
    * near-threshold buckets early). Emits `(in_id, ex_id, n_shared,
    * cont6)` for incoming docs sharing ≥ `minShared` surviving
    * fingerprints with an existing doc.
    */
  def winnowedCrossPairs(incoming: org.apache.spark.sql.DataFrame,
                         existing: org.apache.spark.sql.DataFrame,
                         idCol: String, textCol: String, k: Int = 20,
                         w: Int = 8, minShared: Long = 3,
                         maxDf: Long = 10): org.apache.spark.sql.DataFrame = {
    def postings(df: org.apache.spark.sql.DataFrame, as: String) =
      df.select(col(idCol).as(as),
        explode(graft.functions.WinnowedFps.fps(col(textCol), k, w)).as("fp"))
    val postIn = postings(incoming, "in_id")
    val postEx = postings(existing, "ex_id")
    // df over the DISTINCT-doc union: ids already in the existing
    // corpus are anti-joined out of the incoming side's POSTINGS (an
    // id-only shuffle sized by the slice's postings, never the corpus'
    // text — and no second fingerprint pass: postIn already holds every
    // incoming posting, so the redelivered ids drop by anti-join)
    val inOnly = postIn.join(
      existing.select(col(idCol).as("in_id")), Seq("in_id"), "left_anti")
    val live = inOnly.select(col("fp")).unionAll(postEx.select(col("fp")))
      .groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("fp"))
    val kIn = postIn.join(live, Seq("fp"))
    val kEx = postEx.join(live, Seq("fp"))
    val szIn = kIn.groupBy(col("in_id")).agg(count(lit(1)).as("__n1"))
    val szEx = kEx.groupBy(col("ex_id")).agg(count(lit(1)).as("__n2"))
    kIn.join(kEx, Seq("fp"))
      .groupBy(col("in_id"), col("ex_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(szIn, Seq("in_id"))
      .join(szEx, Seq("ex_id"))
      .select(col("in_id"), col("ex_id"), col("n_shared"),
        round(col("n_shared").cast(DoubleType)
          / least(col("__n1"), col("__n2")), 6).as("cont6"))
  }

  /** SimHash near-duplicate PAIRS — the banded-fingerprint join that
    * completes the SimHash dedup pipeline: split a `bits`-wide
    * fingerprint into 4 bands; two fingerprints within Hamming distance
    * ≤ 3 must share at least one identical band (pigeonhole: ≤3
    * differing bits dirty at most 3 of the 4), so an equi-join on
    * (band, band-value) finds every candidate with no all-pairs blow-up,
    * and an exact `bit_count(xor)` post-filter keeps true near-dups.
    * Same shape as the MinHash band join.
    *
    * Fingerprint width is the scale knob: band-value cardinality is
    * 2^(bits/4), and candidate volume ~ Σ bucket². The 16-bit q67
    * fingerprint has 16-value bands — fine for fingerprinting, hopeless
    * for pairing beyond a few hundred docs (measured: 5 000 correlated
    * docs → ~all-pairs). Default 32 bits = 256-value bands keeps
    * buckets, and therefore candidates, bounded as the corpus grows.
    */
  def simhashNearDupPairs(docs: org.apache.spark.sql.DataFrame, idCol: String,
                          textCol: String, maxHamming: Int = 3,
                          bits: Int = 32): org.apache.spark.sql.DataFrame = {
    require(maxHamming < 4, "4 bands guarantee recall only for hamming <= 3")
    require(bits % 4 == 0 && bits <= 32, "bits must be a multiple of 4, <= 32")
    val bandBits = bits / 4
    val mask = (1L << bandBits) - 1
    val fp = simhashTable(docs, idCol, textCol, bits)
    val banded = fp
      .select(col(idCol).as("__id"), col("fp"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bv", expr(s"shiftright(fp, band * $bandBits) & $mask"))
    val a = banded.select(col("__id").as("d1"), col("fp").as("f1"),
      col("band"), col("bv"))
    val b = banded.select(col("__id").as("d2"), col("fp").as("f2"),
      col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("f1"), col("f2")).distinct()
      .withColumn("hamming", expr("bit_count(f1 ^ f2)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
  }

  /** CROSS-CORPUS SimHash near-dup PAIRS — [[simhashNearDupPairs]] in
    * the q137/q195 asymmetric shape: each INCOMING doc's 4 band values
    * probe the EXISTING corpus' banded fingerprint postings only, so no
    * within-side pair is ever generated and the output is sized by the
    * incoming slice's near-dup rate — never the corpus' internal
    * near-dup mass (the property that makes every dedup modality
    * O(slice) per batch). Identical band/Hamming rules to the symmetric
    * join (4 bands over a `bits`-wide fingerprint, pigeonhole-complete
    * at Hamming ≤ 3, exact `bit_count(xor)` post-filter); tokenless
    * docs carry no fingerprint and never pair (q81's contract). Emits
    * `(in_id, ex_id, hamming)`.
    */
  def simhashCrossPairs(incoming: org.apache.spark.sql.DataFrame,
                        existing: org.apache.spark.sql.DataFrame,
                        idCol: String, textCol: String,
                        maxHamming: Int = 3,
                        bits: Int = 32): org.apache.spark.sql.DataFrame = {
    require(maxHamming < 4, "4 bands guarantee recall only for hamming <= 3")
    require(bits % 4 == 0 && bits <= 32, "bits must be a multiple of 4, <= 32")
    val bandBits = bits / 4
    val mask = (1L << bandBits) - 1
    def banded(df: org.apache.spark.sql.DataFrame, as: String,
               fc: String): org.apache.spark.sql.DataFrame =
      simhashTable(df, idCol, textCol, bits)
        .select(col(idCol).as(as), col("fp").as(fc),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bv", expr(s"shiftright($fc, band * $bandBits) & $mask"))
    banded(incoming, "in_id", "f_in")
      .join(banded(existing, "ex_id", "f_ex"), Seq("band", "bv"))
      .select(col("in_id"), col("ex_id"), col("f_in"), col("f_ex")).distinct()
      .withColumn("hamming", expr("bit_count(f_in ^ f_ex)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("in_id"), col("ex_id"), col("hamming"))
  }

  /** Table-shaped SimHash — ONE map-only pass via the native
    * [[graft.functions.SimHashFp]] expression (1 md5 per distinct token,
    * no explode, no shuffle; the former explode → `bits`-way sum
    * aggregate shuffled a row per token to compute a per-document
    * value). Width 16 is the q67 fingerprint contract; pairing uses 32
    * (see [[simhashNearDupPairs]]). Docs with no tokens yield NULL and
    * drop out, matching the explode semantics.
    */
  def simhashTable(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, bits: Int = 16,
                   fpCol: String = "fp"): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol), graft.functions.SimHashFp.fp(col(textCol), bits).as(fpCol))
      .filter(col(fpCol).isNotNull)
}
