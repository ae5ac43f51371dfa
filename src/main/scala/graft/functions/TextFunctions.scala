package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions, composed from built-in (codegen'd)
  * functions wherever possible — no Scala UDFs in the hot path.
  *
  * Replaces the reference's spark-nlp pretrained pipelines
  * (`apps/process_reviews.py:125-135`: language detection + sentiment) with
  * deterministic, cluster-friendly equivalents, and adds the text-quality /
  * tokenization operators a large-scale training-data pipeline needs.
  */
object TextFunctions {

  /** Whitespace tokens, lowercased, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Dedup-grade text CANONICALIZATION: Unicode NFC (native
    * [[graft.functions.expr.NfcNormalize]] — precomposed vs decomposed
    * accents hash identically afterwards), zero-width characters
    * stripped (ZWSP/ZWNJ/ZWJ/BOM — invisible bytes that break exact and
    * shingle dedup), Unicode spaces (NBSP, figure, narrow NBSP,
    * ideographic) mapped to plain space, whitespace runs collapsed,
    * ends trimmed. Every step after NFC is an RE2-replayable
    * `regexp_replace`, so the whole chain cross-checks in SQL (q148).
    * Run this BEFORE any fingerprinting operator; it is idempotent.
    */
  def canonicalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          graft.functions.expr.NfcNormalize.nfc_normalize(text),
          "[\\u200B\\u200C\\u200D\\uFEFF]", ""),
        "[\\u00A0\\u2007\\u202F\\u3000]", " "),
      "\\s+", " "))

  /** HTML → text EXTRACTION — the step before every text operator when
    * the corpus is raw web crawl: script/style/comment blocks removed
    * whole, block-level tags (`p/div/br/li/h1-6/tr/td/...`) become
    * newlines (so line-based operators — C4 line dedup q61, line scrub
    * q141, Gopher line rules q140 — see real line structure), remaining
    * tags become spaces, the six standard entities decode once
    * (`&amp;` LAST, so `&amp;lt;` single-decodes to `&lt;`, never
    * double-decodes), horizontal whitespace collapses, newline runs
    * collapse to one, ends strip. Every step is a codegen'd
    * `regexp_replace`/`replace` in an RE2-compatible dialect (no
    * backreferences, no lookarounds, inline `(?is)` flags only), so the
    * WHOLE chain replays in the DuckDB oracle (q163) — a DOM parser
    * would extract marginally better text and be unreplayable and
    * un-codegen'd. Not idempotent (decoded entities could re-read as
    * markup); run it exactly once, before [[canonicalizeText]].
    * Probe-backed (Scratch, ~250-char docs): 0.94 s at 100k docs,
    * 2.98 s at 1M — ~330k docs/s through the whole chain on 32 cores,
    * linear in bytes.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote)[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    val ent = replace(replace(replace(replace(replace(replace(noTags,
      lit("&nbsp;"), lit(" ")), lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")), lit("&amp;"), lit("&"))
    regexp_replace(
      regexp_replace(
        regexp_replace(ent, "[ \\t\\r]+", " "),
        "\\s*\\n\\s*", "\n"),
      "^\\s+|\\s+$", "")
  }

  /** Sentence segmentation: split after terminal punctuation
    * (`[.!?]` + whitespace) by injecting a U+0001 separator and
    * splitting on it — the RE2-replayable formulation (a lookbehind
    * split would not replay; RE2 has no lookarounds). Terminal
    * punctuation stays WITH its sentence; a trailing fragment without
    * terminal punctuation is a sentence; whitespace-only fragments are
    * dropped. Deliberately simple (no abbreviation list — "Dr. Smith"
    * splits): the downstream contract is bounded, deterministic
    * chunking, not linguistic perfection, and every rule here replays
    * in the oracle.
    */
  def sentences(text: Column): Column =
    filter(split(regexp_replace(text, "([.!?])\\s+", "$1\u0001"), "\u0001"),
      s => length(trim(s)) > 0)

  /** Token count (whitespace tokenization) — native one-pass run counter
    * ([[graft.functions.expr.TokenCount]]; the composed `size(tokens(_))`
    * pays a lowercase copy, a regex split, and a token-array allocation
    * just to take a length).
    */
  def tokenCount(text: Column): Column =
    graft.functions.expr.TokenCount.token_count(text)

  /** BPE-ish pretoken count: GPT-2-style pretokenization approximated as
    * letter runs + single digits + single non-alnum marks (every BPE
    * merge happens inside one pretoken, so this upper-bounds and tracks
    * real BPE token counts). `regexp_count` is codegen'd, one pass, and
    * the RE2-compatible pattern is oracle-checkable cross-engine.
    */
  val subwordPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def subwordCount(text: Column): Column = regexp_count(text, lit(subwordPattern))

  /** Distinct character n-gram shingles of the normalized text (lowercase,
    * whitespace collapsed) — native one-pass expression
    * ([[graft.functions.expr.CharShingles]]; the composed
    * `transform(sequence(...), i => norm.substr(i, n))` re-evaluates the
    * normalization subtree per window).
    */
  def charShingles(text: Column, n: Int): Column =
    graft.functions.expr.CharShingles.char_shingles(text, n)

  /** Distinct word n-gram shingles joined by a space. Native one-pass
    * expression ([[graft.functions.expr.WordShingles]]) — the composed
    * `transform(sequence(...), i => concat_ws(" ", slice(toks, ...)))`
    * re-tokenizes per lambda iteration (see that class's scaladoc).
    */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.expr.WordShingles.word_shingles(text, n)

  /** Non-overlapping fixed-size token windows ("passages"), each re-joined
    * with single spaces — the passage definition for passage-level dedup
    * on corpora without explicit paragraph breaks (the common case after
    * HTML-to-text normalization flattens markup). Docs shorter than one
    * window yield a single passage; empty/whitespace-only text yields [].
    */
  def tokenWindows(text: Column, winSize: Int): Column = {
    require(winSize > 0, s"tokenWindows: winSize must be positive, got $winSize")
    val toks = tokens(text)
    val nWin = greatest(ceil(size(toks).cast("double") / winSize).cast("int"), lit(1))
    filter(
      transform(sequence(lit(0), nWin - 1),
        i => array_join(slice(toks, i * winSize + 1, lit(winSize)), " ")),
      p => length(p) > 0)
  }

  /** OVERLAPPING fixed-size token chunks — the retrieval/RAG chunking
    * primitive [[tokenWindows]] (stride = winSize) cannot express: chunk
    * i covers tokens [i*stride, i*stride + winSize), so consecutive
    * chunks share `winSize - stride` tokens of context and no boundary
    * sentence is ever split without a copy that sees both sides. The
    * last chunk starts at the final stride step below the token count
    * and may be short (the ragged tail is kept, same as tokenWindows);
    * docs shorter than one window yield a single chunk; empty text
    * yields []. One narrow projection per row — the explode fan-out is
    * ~n/stride chunks per doc, bounded and linear in document length.
    */
  def tokenChunks(text: Column, winSize: Int, stride: Int): Column = {
    require(winSize > 0, s"tokenChunks: winSize must be positive, got $winSize")
    require(stride > 0 && stride <= winSize,
      s"tokenChunks: need 0 < stride <= winSize, got stride=$stride win=$winSize")
    val toks = tokens(text)
    val n = size(toks)
    val nWin = when(n <= winSize, lit(1))
      .otherwise(ceil((n - lit(winSize)).cast("double") / stride).cast("int") + 1)
    filter(
      transform(sequence(lit(0), nWin - 1),
        i => array_join(slice(toks, i * stride + 1, lit(winSize)), " ")),
      p => length(p) > 0)
  }

  // ---- language identification (stopword-overlap heuristic) ----

  /** Tiny public stopword lists per language. Enough to reproduce the
    * reference's query semantics (grouping/filtering by language code,
    * `README.md:266`), not a general-purpose detector.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "you", "that", "was", "for", "on", "are", "with", "as", "this", "have", "not", "be"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "pour", "dans", "qui", "pas", "sur", "avec", "au", "du", "il", "nous"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "auf", "von", "zu", "den", "im", "für", "sich", "des", "auch", "war", "wir"),
    "nl" -> Seq("de", "het", "een", "en", "van", "is", "dat", "op", "te", "zijn", "met", "voor", "niet", "aan", "er", "maar", "om", "ook", "als", "bij"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es", "por", "con", "para", "no", "se", "su", "al", "lo", "como"),
    "it" -> Seq("il", "la", "di", "e", "che", "un", "una", "per", "in", "non", "con", "del", "si", "da", "come", "le", "dei", "più", "anche", "ma"),
    "pt" -> Seq("o", "a", "os", "as", "de", "e", "que", "em", "um", "uma", "para", "com", "não", "do", "da", "no", "na", "por", "mais", "se"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人", "都", "一", "也", "上", "中", "们", "来", "他", "这", "着"))

  /** ISO-639-1 code of the language whose stopword list overlaps the
    * distinct-token set most; "und" (undetermined) when nothing matches.
    * Native Catalyst expression ([[graft.functions.expr.LangId]]) — the
    * equivalent built-in composition (8 x array_intersect + an argmax fold
    * of `when`s) produced a plan tree with ~8 MiB task binaries.
    */
  def langId(text: Column): Column = graft.functions.expr.LangId.lang_id(text)

  // ---- sentiment (lexicon scorer, AFINN-style) ----

  val positiveWords: Seq[String] = Seq(
    "good", "great", "excellent", "amazing", "wonderful", "fantastic", "love",
    "loved", "perfect", "best", "nice", "clean", "comfortable", "friendly",
    "helpful", "beautiful", "awesome", "enjoyed", "recommend", "fast", "easy",
    "quiet", "spacious", "cozy", "convenient", "pleasant", "superb", "happy")

  val negativeWords: Seq[String] = Seq(
    "bad", "terrible", "awful", "horrible", "worst", "dirty", "noisy",
    "broken", "uncomfortable", "rude", "slow", "error", "poor", "disappointing",
    "disappointed", "smell", "smelly", "cold", "problem", "problems", "hate",
    "hated", "cancel", "cancelled", "unhelpful", "cramped", "overpriced")

  /** Sentiment label in {pos, neg, n/a}: lexicon distinct-hit-count
    * difference. `n/a` for null/empty text or a tie — matching the
    * reference's output domain (`README.md:259-260`). Native expression
    * ([[graft.functions.expr.Sentiment]]).
    */
  def sentiment(text: Column): Column =
    graft.functions.expr.Sentiment.sentiment_label(text)

  // ---- quality scoring ----

  /** Struct of document-quality signals: length, token stats, punctuation /
    * uppercase / digit / stopword ratios. All built-ins; one projection.
    */
  def qualitySignals(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text).cast("double")
    val nTok = size(toks).cast("double")
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double")
    val upper = length(regexp_replace(text, "[^A-Z]", "")).cast("double")
    val digits = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val enStop = array(stopwords("en").map(lit): _*)
    val stopHits = size(array_intersect(array_distinct(toks), enStop)).cast("double")
    struct(
      nChars.as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      round(nChars / greatest(nTok, lit(1.0)), 4).as("mean_token_len"),
      round(punct / greatest(nChars, lit(1.0)), 4).as("punct_ratio"),
      round(upper / greatest(nChars, lit(1.0)), 4).as("upper_ratio"),
      round(digits / greatest(nChars, lit(1.0)), 4).as("digit_ratio"),
      round(stopHits / greatest(nTok, lit(1.0)), 4).as("stopword_ratio"))
  }

  // ---- PII detection / redaction ----

  /** PII patterns, written in the regex subset Java and RE2 (DuckDB)
    * interpret identically — character classes, greedy quantifiers,
    * bounded repeats, ASCII `\b`; no backrefs or lookarounds — so the
    * oracle can replay detection byte-for-byte. Order of application
    * matters: URLs first (they may embed `@` or dotted quads), then
    * emails, then bare IPv4s.
    */
  val urlPattern = "https?://[^\\s]+"
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipPattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Per-kind PII match counts over the raw text (counted independently,
    * before any redaction): struct(n_urls, n_emails, n_ips). One codegen'd
    * projection — `regexp_count` is a single pass per pattern.
    */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(urlPattern)).as("n_urls"),
    regexp_count(text, lit(emailPattern)).as("n_emails"),
    regexp_count(text, lit(ipPattern)).as("n_ips"))

  /** Text with PII spans replaced by typed placeholders — the standard
    * pre-training scrub. Pure `regexp_replace` chain: stateless, codegen'd,
    * safe inside any projection at any scale.
    */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlPattern, "<URL>"),
        emailPattern, "<EMAIL>"),
      ipPattern, "<IP>")

  /** Composite quality score in [0,1]: heuristic linear blend of signals —
    * long-enough, low-punct, low-digit, some stopwords.
    */
  def qualityScore(text: Column): Column = {
    val s = qualitySignals(text)
    val lenScore = least(s.getField("n_chars") / 500.0, lit(1.0))
    val punctPen = greatest(lit(0.0), lit(1.0) - s.getField("punct_ratio") * 5.0)
    val digitPen = greatest(lit(0.0), lit(1.0) - s.getField("digit_ratio") * 5.0)
    val stopScore = least(s.getField("stopword_ratio") * 4.0, lit(1.0))
    round(lenScore * 0.3 + punctPen * 0.25 + digitPen * 0.2 + stopScore * 0.25, 4)
  }
}
