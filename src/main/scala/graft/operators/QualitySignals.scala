package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Within-document repetition signals for training-data quality filtering
  * (the Gopher-rules family: excessively repetitive documents are boilerplate
  * or spam and get dropped or down-weighted before training).
  *
  * Emitted per document:
  *  - `ttr`             type-token ratio: distinct tokens / tokens
  *  - `top_bigram_frac` occurrences of the most frequent bigram / bigrams
  *  - `dup_bigram_frac` 1 - distinct bigrams / bigrams
  *
  * All three are ratios of small integers rounded to 6 decimals — the same
  * cross-engine-exact arithmetic the jaccard oracles rely on. Documents
  * with fewer than 2 tokens have no bigrams: the bigram fractions are null
  * (left join), and `ttr` uses a guarded denominator so an empty text
  * yields 0 rather than a divide-by-zero (Spark Infinity vs DuckDB NULL —
  * the one place the engines would disagree).
  *
  * Scale shape: one narrow projection computes tokens + distinct counts in
  * the scan; the bigram explode is a bounded fan-out (n_tok - 1 rows per
  * doc); the only shuffles are two map-side-combinable aggregations keyed
  * by (doc_id, gram) then doc_id, and the final equi-join on doc_id. No
  * global state, no skew beyond document length itself.
  */
object QualitySignals {

  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_dist", size(array_distinct(col("toks"))).cast("long"))
    // sequence(1, n-1) must be guarded: Spark generates DESCENDING
    // sequences when start > stop, so a 1-token doc would yield [1, 0]
    val bigrams = base.filter(col("n_tok") >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), col("n_tok") - 1),
          i => concat_ws(" ",
            element_at(col("toks"), i.cast("int")),
            element_at(col("toks"), (i + 1).cast("int"))))).as("g"))
    val agg = bigrams.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("total_bg"), max(col("c")).as("top_bg"),
        count(lit(1)).as("dist_bg"))
    base.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(col("n_dist").cast("double") / greatest(col("n_tok"), lit(1L)), 6).as("ttr"),
        round(col("top_bg").cast("double") / col("total_bg"), 6).as("top_bigram_frac"),
        round(lit(1.0) - col("dist_bg").cast("double") / col("total_bg"), 6).as("dup_bigram_frac"))
  }

  /** CROSS-document novelty: per document, the fraction of its distinct
    * word `n`-shingles that appear in NO other document (corpus document
    * frequency 1), plus the shingle count. Low novelty = the doc is mostly
    * assembled from text that exists elsewhere — the between-docs
    * complement of [[repetition]]'s within-doc signals, and a cheap
    * memorization-risk/boilerplate score that needs no pair generation.
    *
    * Scale shape: shingles travel as 64-bit hashes (the df shuffle and the
    * join back carry (hash, doc_id) rows, never shingle text); df is a
    * map-side-combinable count-distinct on the hash; per-doc aggregation
    * is a ratio of exact integers (IEEE-exact division, round 6 — the
    * cross-engine contract every ratio oracle here uses). Documents with
    * no shingles (< n tokens) are absent from the output by definition.
    */
  def noveltyByDf(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
    val df_ = sh.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    sh.join(df_, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(
        round(count(when(col("df") === 1, true)).cast("double") /
          count(lit(1)), 6).as("novelty"),
        count(lit(1)).as("n_shingles"))
  }

  /** Character-bigram SURPRISE score — the integer-exact stand-in for the
    * "perplexity filter" of LM-based data curation (CCNet/KenLM style:
    * score text against a language model trained on the corpus itself,
    * gate the improbable tail). The model here is the corpus's own
    * char-bigram occurrence counts, and a bigram's surprise is
    * `64 - length(bin(count))` = 63 - floor(log2(count)) — the integer
    * log-scale "bits of rarity" trick [[Quantiles]] uses for buckets, so
    * the score needs no float log and replays exactly in any engine's
    * SQL. A doc's score is the MEAN surprise of its bigram occurrences,
    * x100 integer (`sum * 100 div n`): high = the text's character
    * transitions are rare in this corpus (gibberish, binary spill, wrong
    * language), low = ordinary prose. Docs with < 2 chars have no bigrams
    * and are absent by definition.
    *
    * Scale shape: the per-doc explode is corpus-char-sized but NARROW
    * (doc_id, 64-bit hash) and never shuffles at that size — the count
    * aggregation is map-side-combinable down to the distinct-bigram
    * cardinality (bounded by the OBSERVED charset^2), and the count table
    * re-joins BROADCAST — size-gated at `broadcastMaxDistinct` so a
    * CJK-scale bigram vocabulary falls back to the shuffle join instead
    * of dying in the broadcast build — so per-doc scoring is map-side.
    * One corpus-scale shuffle total: the final per-doc aggregation,
    * already pre-combined. Probe
    * (Scratch, warm): 5k docs 2.8 s -> 50k docs 3.2 s — 10x the corpus
    * costs 1.1x, fixed overhead dominating while the data-dependent work
    * stays map-side.
    */
  def bigramSurprise(docs: DataFrame, idCol: String, textCol: String,
                     broadcastMaxDistinct: Long = 2000000L): DataFrame =
    bigramSurpriseAgainst(docs, idCol, textCol,
      bigramCounts(docs, textCol), broadcastMaxDistinct)

  /** (doc_id, 64-bit bigram hash) occurrences — the shared explode both
    * the count build and the scoring pass run. The explode is the plan's
    * expensive subtree; a narrow scan (one parquet row group) would
    * serialize it on one task — spread to full parallelism first, the
    * SpanDedup.winsOf treatment (per-byte compute here is heavy enough
    * to pay for the raw-byte shuffle; the one-pass sketch builders
    * measured the opposite).
    */
  private def bigramHashes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"),
      lower(trim(col(textCol))).as("__t"))
    // size-derived rescue spread (r15, see Spread's scaladoc); the bigram
    // explode is alloc-heavy per byte, so it keeps the default compute floor
    val spread = graft.operators.Spread.forCompute(t)
    // sequence(1, 0) would be the DESCENDING [1, 0], not empty — guard
    // short texts explicitly.
    spread
      .filter(length(col("__t")) >= 2)
      .select(col("doc_id"), explode(
        expr("transform(sequence(1, char_length(__t) - 1), i -> substring(__t, i, 2))")).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
  }

  /** Corpus bigram-occurrence counts (h, n) — the LM STATE of the
    * surprise workflow, and a state-family member like
    * [[graft.search.Lexical.termCounts]]: counts over disjoint doc sets
    * merge by per-hash ADDITION, exactly, so a bigram model accumulated
    * over daily increments equals the one-pass model. One map-side-
    * combinable shuffle at distinct-bigram cardinality.
    */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame =
    // counts ignore the doc identity — a constant id keeps the shared
    // explode's shape without requiring an id column on the input
    bigramHashes(docs.select(lit(0L).as("__cid"), col(textCol)), "__cid", textCol)
      .groupBy(col("h")).agg(count(lit(1)).as("n"))

  /** Merge persisted [[bigramCounts]] increments (disjoint doc sets) by
    * per-hash addition. */
  def mergeBigramCounts(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "mergeBigramCounts: no increments")
    parts.reduce(_ unionByName _).groupBy("h").agg(sum("n").as("n"))
  }

  /** Takedown: subtract removed documents' bigram counts from a
    * persisted LM state — equals [[bigramCounts]] over the survivors
    * exactly, re-reading only the removed docs ([[Retraction]]).
    */
  def retractBigramCounts(state: DataFrame, removedDocs: DataFrame,
                          textCol: String): DataFrame =
    Retraction.subtract(state, bigramCounts(removedDocs, textCol), Seq("h"), "n")

  /** Collect a [[bigramCounts]] state into the driver-side map the
    * streaming gate ([[graft.streaming.StreamingOps.surpriseGate]])
    * broadcasts. Bounded by construction at `maxRows` — a CJK-scale
    * state over the gate should stay DataFrame-side
    * ([[bigramSurpriseAgainst]]) instead of riding a driver collect.
    */
  def collectBigramCounts(counts: DataFrame, maxRows: Long = 5000000L): Map[Long, Long] = {
    val n = counts.count()
    require(n <= maxRows,
      s"collectBigramCounts: state has $n rows > maxRows=$maxRows — too large to broadcast as a map")
    counts.select(col("h"), col("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** [[bigramSurprise]] against a FIXED count state (from persisted/
    * merged [[bigramCounts]]) — the serving form: the model was trained
    * on yesterday's corpus, today's batch is scored against it. A bigram
    * ABSENT from the state scores surprise 64 (one more than the rarest
    * observed n=1's 63) — unseen transitions are the most surprising,
    * and the convention keeps the self-trained case identical to
    * [[bigramSurprise]] (every observed bigram has n >= 1 there).
    */
  def bigramSurpriseAgainst(docs: DataFrame, idCol: String, textCol: String,
                            counts: DataFrame,
                            broadcastMaxDistinct: Long = 2000000L): DataFrame = {
    val grams = bigramHashes(docs, idCol, textCol)
    // localCheckpoint (eager, distinct-bigram-sized) so sizing the count
    // table for the broadcast decision doesn't re-run its build
    val cnts = counts.localCheckpoint()
    // SIZE-GATED broadcast (the r5 incremental-dedup lesson): an
    // alphabetic corpus's bigram vocabulary is tiny, but a CJK-heavy one
    // can reach observed-charset^2 — forcing that through a broadcast
    // build is the plan that dies; past the gate, fall back to the
    // shuffle join Spark would plan anyway
    val countsSide =
      if (cnts.count() <= broadcastMaxDistinct) broadcast(cnts) else cnts
    grams.join(countsSide, Seq("h"), "left")
      .select(col("doc_id"),
        expr("CASE WHEN n IS NULL THEN 64 ELSE 64 - length(bin(n)) END").as("__sp"))
      .groupBy(col("doc_id"))
      .agg(expr("sum(__sp) * 100 div count(1)").as("surprise_x100"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Language-MIX profile: per document, segment the text into lines,
    * language-identify each non-empty segment
    * ([[graft.functions.TextFunctions.langId]], the native codegen
    * heuristic), and report
    *  - `n_segments`, `n_langs` (distinct predicted languages),
    *  - `majority_lang` (most segments; ties to the lexically smaller
    *    code — deterministic), and
    *  - `majority_permille` — the majority's integer share.
    *
    * The curation reading: document-level language ID (q22) happily
    * labels a half-English-half-German page "en" and a monolingual model
    * trains on the German half as noise; mixedness is ALSO a quality
    * signal in its own right (boilerplate/navigation froth is langId
    * 'und' segment spam). Low majority_permille or high n_langs → route
    * to the multilingual pile or drop.
    *
    * Scale shape: the explode is corpus-line-sized but immediately
    * reduces to (doc_id, lang) counts — map-side-combinable, nothing
    * wider than a language code shuffles — and the majority/total/
    * distinct readouts are windows sharing ONE doc_id partitioning.
    * Docs with no non-empty segments are absent by definition.
    */
  def langMixProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val segs = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "\n")).as("__ln"))
      .select(col("doc_id"), trim(col("__ln")).as("__seg"))
      .filter(col("__seg") =!= "")
      .select(col("doc_id"),
        graft.functions.TextFunctions.langId(col("__seg")).as("seg_lang"))
    val counts = segs.groupBy("doc_id", "seg_lang").agg(count(lit(1)).as("__c"))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val byShare = byDoc.orderBy(col("__c").desc, col("seg_lang").asc)
    counts
      .withColumn("__rn", row_number().over(byShare))
      .withColumn("n_segments", sum(col("__c")).over(byDoc))
      .withColumn("n_langs", count(lit(1)).over(byDoc))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("n_segments"), col("n_langs"),
        col("seg_lang").as("majority_lang"),
        expr("__c * 1000 div n_segments").as("majority_permille"))
  }

  /** Per-group exact-percentile gate: keep rows whose `scoreCol` sits at
    * or above the `minPercentile` of their group ("top quartile per
    * language"). Rank-based, not value-interpolated: the cutoff is
    * percent_rank (= (rank-1)/(n-1), exact integer ratio in double), so
    * the decision is deterministic and replayable in any engine —
    * interpolated quantiles (percentile_cont) differ across engines in
    * last-ulp arithmetic, rank arithmetic cannot.
    *
    * `tieCol` must make (scoreCol, tieCol) a total order within a group —
    * equal scores get distinct ranks deterministically.
    *
    * Scale note: one window shuffle keyed by `groupCols`. With
    * LOW-cardinality groups (languages) each group sorts within one task
    * chain — fine into the tens of millions of rows per group; past that,
    * compute per-group cutoff summaries on a sample or sketch and
    * broadcast them back instead of ranking every row.
    */
  def percentileGate(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                     tieCol: String, minPercentile: Double): DataFrame = {
    require(minPercentile >= 0.0 && minPercentile <= 1.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol), col(tieCol))
    df.withColumn("__pr", percent_rank().over(w))
      .filter(col("__pr") >= minPercentile)
      .drop("__pr")
  }

  /** The common-English stopwords the Gopher rule set checks for
    * presence (rule: a natural-language document contains at least 2 of
    * these; listings of codes/ids/URLs do not). Kept tiny and fixed so
    * the SQL oracle carries the identical literal list.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with", "a", "is")

  /** Gopher-style composite structural quality gate — the rule FAMILY
    * the big corpus pipelines (Gopher, MassiveText descendants, Dolma)
    * apply before any model-based scoring, as one deterministic
    * projection. Emits per document a violation BITMASK (`viol_mask`)
    * plus `keep = (viol_mask == 0)` — the mask tells a curation report
    * WHY documents die, not just how many:
    *
    *  - bit 0: token count outside `[minTokens, maxTokens]`
    *  - bit 1: mean token length outside [3, 10] chars — compared as
    *    `sumlen < 3n || sumlen > 10n`, integer-exact, no division
    *  - bit 2: fewer than 2 distinct [[GopherStopwords]] present
    *  - bit 3: more than 90% of nonblank lines start with a bullet
    *    (`-` or `*`) — compared as `10 * bullets > 9 * lines`
    *  - bit 4: more than 30% of nonblank lines end with an ellipsis
    *    (`...`) — compared as `10 * ellipsis > 3 * lines`
    *
    * Every rule is pure integer arithmetic over the house tokenization
    * ([[TextFunctions.tokens]]) and a `\n` line split, so the gate is
    * engine-replayable verbatim (q140's oracle). A null text
    * null-propagates to a null mask and a null keep — unknown is not
    * "clean". Scale shape: ONE narrow codegen'd projection — no
    * shuffle, no state, no join; this gate runs in the ingest scan.
    */
  def gopherGate(docs: DataFrame, idCol: String, textCol: String,
                 minTokens: Long = 50L, maxTokens: Long = 100000L): DataFrame = {
    require(minTokens >= 0 && maxTokens >= minTokens,
      s"gopherGate: need 0 <= minTokens <= maxTokens, got ($minTokens, $maxTokens)")
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks).cast("long")
    val sumlen = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val stop = size(array_intersect(array_distinct(toks),
      array(GopherStopwords.map(lit): _*)))
    val lines = filter(transform(split(col(textCol), "\n"), l => trim(l)),
      l => length(l) > 0)
    val nLines = size(lines).cast("long")
    val bullets = size(filter(lines,
      l => substring(l, 1, 1).isin("-", "*"))).cast("long")
    val ellipsis = size(filter(lines,
      l => l.endsWith("..."))).cast("long")
    def bit(i: Int, viol: org.apache.spark.sql.Column) =
      when(viol, lit(1L << i)).otherwise(lit(0L))
    val mask =
      bit(0, n < minTokens || n > maxTokens) +
        bit(1, sumlen < lit(3L) * n || sumlen > lit(10L) * n) +
        bit(2, stop < 2) +
        bit(3, lit(10L) * bullets > lit(9L) * nLines) +
        bit(4, lit(10L) * ellipsis > lit(3L) * nLines)
    docs.select(col(idCol), col(textCol))
      .withColumn("n_tokens", when(col(textCol).isNotNull, n))
      .withColumn("viol_mask", when(col(textCol).isNotNull, mask))
      .withColumn("keep", col("viol_mask") === 0L)
      .drop(textCol)
  }

  /** Tokenizer special-token markers that must NEVER appear in raw
    * pretraining text: a document carrying a literal `<|endoftext|>` or
    * `[INST]` teaches the model to emit its own control tokens (or is a
    * model-output echo that self-training should drop). Alternation of
    * escaped literals — identical pattern text in Java regex and RE2. */
  val SpecialTokenPattern: String =
    "<\\|endoftext\\|>|<\\|im_start\\|>|<\\|im_end\\|>|</s>|<s>|\\[INST\\]|<mask>|<pad>"

  /** MOJIBAKE signature: UTF-8 read as Latin-1/cp1252 puts a
    * U+00C2/U+00C3 lead byte IMMEDIATELY FOLLOWED by a continuation
    * byte into the text ("Ã©" for é = C3,A9), plus the U+00E2,U+20AC
    * pair ("â€™" family); U+FFFD is a decoder's explicit replacement.
    * The continuation-byte requirement is what separates corruption
    * from legitimate text: 'Âge' (C2 then 'g') and 'SÃO' (C3 then 'O')
    * are clean French/Portuguese and do NOT match, while every real
    * double-decode puts the lead byte before a continuation.
    *
    * The continuation class covers BOTH decodings of bytes 0x80-0xBF:
    * Latin-1 renders them U+0080-00BF, but cp1252 (the decoder crawls
    * actually hit — the E2+U+20AC alternation already assumes it) maps
    * 0x80-0x9F to punctuation/letter glyphs (€ ‚ ƒ „ † ‡ ˆ ‰ Š ‹ Œ Ž
    * ˜ ™ š › œ ž Ÿ •), without which UPPERCASE accents are invisible:
    * 'É' double-decodes to "Ã‰" (C3,89 → ‰ U+2030), which the bare
    * 0x80-0xBF class misses. Glyphs of that cp1252 row that normal
    * typography can glue DIRECTLY to a letter are DELIBERATELY
    * excluded — quote/dash/ellipsis (U+2018/2019/201C/201D/2013/2014/
    * 2026: word-final Ã/Â against a closing curly quote, "MANHÃ" +
    * U+201D, is plausible clean text) and the trademark sign U+2122
    * (brand™ with no intervening space is STANDARD typography, so an
    * all-caps Portuguese brand ending in Ã directly followed by ™ is
    * clean) — including them would re-open the false-positive class
    * the continuation requirement exists to close. The bullet U+2022
    * STAYS included: unlike ™, a bullet is a separator that clean text
    * sets off with whitespace or a line start, never glues to the
    * preceding letter, and it is the continuation for 0x95 — dropping
    * it would blind the audit to Õ-mojibake ("SÃ•O" for São), common
    * in Portuguese. The excluded continuations (Ñ/Ö/Ò/À/Ù-mojibake)
    * are accepted as the residual blind spot, documented here.
    * `\x{...}` escapes parse identically in Java regex and RE2. */
  val MojibakePattern: String =
    "[\\x{C2}\\x{C3}][\\x{80}-\\x{BF}\\x{20AC}\\x{201A}\\x{0192}\\x{201E}" +
      "\\x{2020}\\x{2021}\\x{02C6}\\x{2030}\\x{0160}\\x{2039}\\x{0152}" +
      "\\x{017D}\\x{2022}\\x{02DC}\\x{0161}\\x{203A}\\x{0153}" +
      "\\x{017E}\\x{0178}]|\\x{FFFD}|\\x{E2}\\x{20AC}"

  /** Control characters that legitimate text never carries (tab/LF/CR
    * excepted) — binary spill, broken extraction, or splitter artifacts. */
  val ControlCharPattern: String =
    "[\\x{0}-\\x{8}\\x{B}\\x{C}\\x{E}-\\x{1F}]"

  /** Pretraining-HYGIENE audit: per document, counts of (a) literal
    * tokenizer special tokens ([[SpecialTokenPattern]]), (b) mojibake /
    * encoding-corruption signatures ([[MojibakePattern]]), (c) stray
    * control characters ([[ControlCharPattern]]), and the combined
    * `clean` verdict — the three corpus-poisoning classes a crawl
    * pipeline must catch that CONTENT-quality gates (q140 Gopher, q143
    * classifier) do not look for: a fluent English paragraph ending in
    * `<|endoftext|>` sails through both. Three codegen'd `regexp_count`
    * passes, no shuffle, every pattern chosen to parse identically in
    * Java regex and RE2 so the audit replays verbatim in the oracle.
    * Null text is null counts with `clean` null — unknown, not clean.
    */
  def hygieneAudit(docs: DataFrame, idCol: String, textCol: String,
                   keep: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol) +: keep.map(col) ++: Seq(
        regexp_count(t, lit(SpecialTokenPattern)).cast("long").as("n_special"),
        regexp_count(t, lit(MojibakePattern)).cast("long").as("n_mojibake"),
        regexp_count(t, lit(ControlCharPattern)).cast("long").as("n_ctrl")): _*)
      .withColumn("clean",
        col("n_special") === 0L && col("n_mojibake") === 0L && col("n_ctrl") === 0L)
  }
}
