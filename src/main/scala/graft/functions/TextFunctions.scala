package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline operators
  * (language ID, quality scoring, token counting, fingerprinting, shingling).
  *
  * Everything here is pure `org.apache.spark.sql.functions` — codegen'd
  * column expressions, no UDFs — so the operators stay inside whole-stage
  * codegen and push down through Catalyst untouched.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def words(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenization: letter runs, digit runs, and punctuation
    * runs as separate tokens (the pre-tokenizer split BPE vocabularies
    * assume). Pattern kept to ASCII classes so every regex engine agrees.
    */
  // the ASCII whitespace set is spelled out instead of \s: excluding
  // ONLY the literal space would emit tab/newline/CR runs as punctuation
  // "tokens" (no BPE pre-tokenizer does that), and \s itself diverges
  // between engines — Java includes vertical tab \x0B, RE2 (DuckDB)
  // does not, so a \x0B between punctuation split the token in one
  // engine but not the other
  val bpeTokenPattern: String = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\t\\n\\x0B\\f\\r ]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeTokenPattern), lit(0))

  /** Word n-gram shingles (distinct), the unit of MinHash/Jaccard dedup.
    * Empty array for texts shorter than n words.
    *
    * Native codegen expression (plans/WordShingles) since r13: the
    * previous transform/sequence/element_at composition evaluated its
    * lambda INTERPRETED and — after projection collapse — re-evaluated
    * the caller's `split(text)` once per element_at per shingle position
    * (O(words²) splits per document; t40's plan carried five inlined
    * split() subtrees). The expression form evaluates `ws` exactly once
    * and loops natively; TextFunctionsSpec pins value equality against
    * the old composition.
    */
  def shingles(ws: Column, n: Int): Column =
    org.apache.spark.sql.graftx.GraftPlanBridge.columnOf(
      graft.plans.WordShingles(
        org.apache.spark.sql.graftx.GraftPlanBridge.expressionOf(ws), n))

  /** The pre-r13 Column composition of [[shingles]] — kept ONLY as the
    * equivalence-property reference for TextFunctionsSpec (one
    * definition of the semantics the native expression must match).
    */
  private[graft] def shinglesComposed(ws: Column, n: Int): Column = {
    val grams = transform(sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*))
    when(size(ws) >= n, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** POSITIONAL word k-grams — every k-word window in order, index i
    * holding the gram starting at word i (0-based once posexploded); the
    * non-distinct sibling of [[shingles]] and the anchor-gram unit of the
    * ExactSubstr span detector (t35/t36). Native codegen expression
    * (plans/WordGrams) since r14 for the same measured reasons as
    * shingles: the transform/sequence/slice composition evaluated
    * interpreted and re-split the document once per gram position after
    * projection collapse. Empty array for NULL or shorter-than-k inputs.
    */
  def grams(ws: Column, k: Int): Column =
    org.apache.spark.sql.graftx.GraftPlanBridge.columnOf(
      graft.plans.WordGrams(
        org.apache.spark.sql.graftx.GraftPlanBridge.expressionOf(ws), k))

  /** The pre-r14 composition of [[grams]] — the equivalence-property
    * reference for TextFunctionsSpec, exactly as [[shinglesComposed]] is
    * for shingles. (Callers always guarded with size(ws) >= k, so the
    * reference is only meaningful under that guard; the native form maps
    * shorter inputs to an empty array.)
    */
  private[graft] def gramsComposed(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      transform(sequence(lit(1), size(ws) - (k - 1)),
        i => array_join(slice(ws, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))

  /** One MinHash value: the lexicographic minimum of seeded md5 digests over
    * an exploded shingle column. Aggregate expression — use inside groupBy.
    * md5-as-string keeps the hash identical across engines (no integer
    * truncation games), and min() is a cheap partial-aggregable reduction.
    */
  def minhashAgg(shingle: Column, seed: Int): Column =
    min(md5(concat(lit(s"$seed|"), shingle).cast("binary")))

  /** SimHash bit contribution for bit position `b` (1-based): the parity of
    * the b-th hex *nibble* of an md5 digest, mapped to +1 / -1 per token
    * occurrence. Aggregate with sum() per doc; bit is 1 iff the sum is >= 0.
    * Pass the digest column (`md5(tok)`) computed ONCE — the 32 per-bit
    * terms are then just substring+parity on it, not 32 md5 evaluations.
    */
  def simhashBitTerm(digest: Column, b: Int): Column =
    when(conv(substring(digest, b, 1), 16, 10).cast("long") % 2 === 1, lit(1L))
      .otherwise(lit(-1L))

  /** All 32 nibble parities of a hex digest at once, as a '0'/'1' string:
    * one `translate` per digest instead of 32 conv/mod extractions (hex
    * digit parity = its low bit, so a 16-way character map computes it).
    * Feed to `simhashBitTermAt`.
    */
  def simhashParityBits(digest: Column): Column =
    translate(digest, "0123456789abcdef", "0101010101010101")

  /** ±1 term for bit `b` (1-based) over a `simhashParityBits` string. */
  def simhashBitTermAt(bits: Column, b: Int): Column =
    when(substring(bits, b, 1) === "1", lit(1L)).otherwise(lit(-1L))

  /** Assemble a simhash value from per-bit sums: bit b set iff sums(b) >= 0.
    * `sums` is 1-based-ordered (bit 1 → least significant).
    */
  def simhashFromSums(sums: Seq[Column]): Column =
    sums.zipWithIndex.map { case (sc, i) =>
      when(sc >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic per-word value used by the rolling fingerprint: cheap,
    * engine-portable (length and first-char code only).
    */
  def wordVal(w: Column): Column =
    length(w).cast("long") * 7L + ascii(substring(w, 1, 1)).cast("long")

  /** Position-weighted rolling fingerprint of a word array, mod a prime.
    * Order-sensitive (like a rolling hash) but expressible as one
    * fold — integer math only, so exact on every engine.
    */
  def fingerprint(ws: Column, mod: Long = 1000003L): Column =
    // guard: sequence(1,0) would auto-reverse to [1,0] on empty input and
    // null-pad the zip, propagating null through the fold
    when(size(ws) > 0,
      aggregate(
        zip_with(ws, sequence(lit(1L), size(ws).cast("long")),
          (w, i) => i * wordVal(w)),
        lit(0L), (acc, x) => acc + x) % mod)
      .otherwise(lit(0L))

  /** Marker-word count for the n-gram-heuristic language scorer.
    * array_intersect already de-duplicates its result, so no
    * array_distinct pre-pass — this runs once per (doc, language
    * profile) in the t1/t2/t4 hot path.
    */
  def markerHits(ws: Column, markers: Seq[String]): Column =
    size(array_intersect(ws, array(markers.map(lit): _*))).cast("long")

  /** Language ID: argmax of marker-hit counts with a fixed preference order
    * on ties. Marker lists are the heuristic's "n-gram profile" — swap per
    * corpus.
    */
  def langId(ws: Column, profiles: Seq[(String, Seq[String])]): Column = {
    // score each language, tie-break by list order (earlier wins ties)
    val scored = profiles.zipWithIndex.map { case ((lang, markers), i) =>
      struct(markerHits(ws, markers).as("hits"),
        lit(profiles.size - i).as("pref"), lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }
}
