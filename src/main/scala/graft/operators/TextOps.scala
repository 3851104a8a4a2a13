package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ColumnFns._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting.
  *
  * All pure column expressions (no UDFs): embarrassingly parallel, no
  * shuffle at all until a downstream consumer groups — exactly what you
  * want for a 100 TB map-only curation pass.
  */
object TextOps {

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"),
    "it" -> Seq("il", "la", "di", "e", "che", "un", "per"),
    "pt" -> Seq("o", "a", "de", "e", "que", "do", "em"),
    "nl" -> Seq("de", "het", "een", "en", "van", "te", "dat"))

  /** Tie-break priority for [[predLangFromScores]] — mirrored by every
    * oracle CASE chain (generated from this list), so it is part of the
    * cross-engine contract. New languages append at the END: priority of
    * the original five is frozen, so historical predictions are stable
    * under coverage growth. */
  val langOrder: Seq[String] = Seq("en", "es", "de", "fr", "zh", "it", "pt", "nl")

  /** Stopword-overlap language ID with a fixed priority tie-break.
    * Tokens are materialized once per row before the per-language scans. */
  def langId(documents: DataFrame): DataFrame =
    langIdMetrics(documents).orderBy(col("doc_id"))

  /** Predicted language from ALREADY-PROJECTED per-language score columns.
    * The when-chain references each score several times (vs the max, then
    * as the winner), so callers must pass materialized attributes — never
    * the stopword-scan expressions themselves: conditional branches are
    * excluded from Spark's subexpression elimination, so inline score
    * expressions would re-run each stopword HOF per branch. */
  def predLangFromScores(scores: Seq[(String, Column)]): Column = {
    val best = greatest(scores.map(_._2): _*)
    // foldRight gives en-first priority: the first lang equal to max wins.
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Predicted language as a pure Column over a MATERIALIZED token array
    * — convenience form for one-off composition; evaluates each language
    * scan inside the when-chain, so SINGLE-use only. Hot paths project the
    * five scores once and use [[predLangFromScores]] (see
    * [[langIdMetrics]] / Curation.curationFunnel). */
  def predLangCol(toks: Column): Column =
    predLangFromScores(langOrder.map(l => l -> stopwordHits(toks, stopwords(l))))

  /** [[langId]] without the output ordering (see [[qualityMetrics]]).
    * Two stacked projections: scores once, then pred_lang over the score
    * ATTRIBUTES. CollapseProject keeps them stacked (a multi-referenced
    * non-cheap producer blocks the merge), so each stopword HOF runs
    * exactly once per row — LangPlanSpec asserts it. */
  def langIdMetrics(documents: DataFrame): DataFrame = {
    val withToks = documents.withColumn("_toks", tokens(col("text")))
    val scored = withToks.select(
      col("doc_id") +:
        langOrder.map(l => stopwordHits(col("_toks"), stopwords(l)).as(s"score_$l")): _*)
    scored.withColumn("pred_lang",
      predLangFromScores(langOrder.map(l => l -> col(s"score_$l"))))
  }

  /** Heuristic quality metrics + integer quality score.
    * All ratios are int/int divisions — exact in IEEE double. */
  def quality(documents: DataFrame): DataFrame =
    qualityMetrics(documents).orderBy(col("doc_id"))

  /** Quality score from its three pre-computed signal columns — for
    * pipelines that already project the inputs (the en stopword count
    * doubles as score_en in the funnel, so it is computed once there). */
  def qualityScoreFromParts(nWords: Column, punctRatio: Column,
                            stopRatio: Column): Column =
    when(nWords.between(5, 2000), 1).otherwise(0) +
      when(punctRatio < 0.1, 1).otherwise(0) +
      when(stopRatio > 0.05, 1).otherwise(0)

  /** Integer quality score as a pure Column over the text plus a
    * MATERIALIZED token array — composable into single-scan pipelines. */
  def qualityScoreCol(text: Column, toks: Column): Column = {
    val nWords = size(toks)
    val txtLen = length(text)
    val punctCnt = txtLen - length(regexp_replace(text, "[.,!?;:]", ""))
    val stopCnt = stopwordHits(toks, stopwords("en"))
    // nullif guards: empty/whitespace docs have 0 words / 0 chars and
    // must yield null ratios, not an ANSI divide-by-zero error
    qualityScoreFromParts(nWords,
      punctCnt.cast("double") / nullif(txtLen, lit(0)),
      stopCnt.cast("double") / nullif(nWords, lit(0)))
  }

  /** [[quality]] without the output ordering — for composition inside
    * other operators (a global sort below a join is wasted work). */
  def qualityMetrics(documents: DataFrame): DataFrame = {
    val withToks = documents.withColumn("_toks", tokens(col("text")))
    val toks = col("_toks")
    val nWords = size(toks)
    val txtLen = length(col("text"))
    val punctCnt = txtLen - length(regexp_replace(col("text"), "[.,!?;:]", ""))
    val stopCnt = stopwordHits(toks, stopwords("en"))
    val charSum = aggregate(toks, lit(0), (acc, t) => acc + length(t))
    val stopRatio = stopCnt.cast("double") / nullif(nWords, lit(0))
    withToks.select(
        col("doc_id"),
        nWords.as("n_words"),
        punctCnt.as("punct_cnt"),
        (charSum.cast("double") / nullif(nWords, lit(0))).as("avg_word_len"),
        stopRatio.as("stop_ratio"),
        qualityScoreCol(col("text"), toks).as("quality_score"))
  }

  /** Per-language top-k character n-gram profiles, learned from the
    * corpus's language-labeled slice — the model half of the
    * Cavnar–Trenkle rank-profile method (public: "N-Gram-Based Text
    * Categorization", 1994). Shape is bpeLearn's: the distributed part
    * touches only the (lang, gram, count) aggregate; the per-language
    * rank window partitions by lang (8 reducers of vocab-sized input,
    * never the corpus); only langs×topK tiny rows reach the driver as
    * the model artifact. Deterministic: count-desc, gram-asc tie-break. */
  def charNgramProfiles(documents: DataFrame, n: Int = 3,
                        topK: Int = 40): Map[String, Seq[String]] = {
    val t = lower(col("text"))
    val grams = documents
      .select(col("lang"), t.as("_t"))
      // guard: sequence(1, len-n+1) with len < n would COUNT DOWN
      // (Spark infers step -1), not return empty
      .withColumn("_g", when(length(col("_t")) >= n,
        transform(sequence(lit(1), length(col("_t")) - (n - 1)),
          i => col("_t").substr(i, lit(n))))
        .otherwise(array().cast("array<string>")))
      .select(col("lang"), explode(col("_g")).as("g"))
      .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("cnt").desc, col("g"))
    grams.withColumn("r", row_number().over(w)).filter(col("r") <= topK)
      .select(col("lang"), col("g"), col("r")).collect()
      .groupBy(_.getString(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(2)).map(_.getString(1)).toSeq }
  }

  /** Language ID by rank-weighted profile hits: each document's char
    * n-gram OCCURRENCES are scored against every language profile with
    * weight (topK + 1 − rank) — the standard simplification of
    * Cavnar–Trenkle's out-of-place distance that needs no per-document
    * ranking — and the best positive score wins with the same langOrder
    * priority tie-break as t1. Apply is MAP-ONLY: the profiles ship as
    * foldable map literals (constant-folded, like the BPE merge table),
    * the gram walk and lookups run per row, no shuffle. Integer
    * arithmetic end to end → full DuckDB oracle (the oracle replays the
    * learning AND the scoring). More robust than the stopword heuristic
    * on short documents: trigrams hit on morphology (suffixes,
    * digraphs), not just whole function words. */
  def langIdNgram(documents: DataFrame, profiles: Map[String, Seq[String]],
                  n: Int = 3, topK: Int = 40): DataFrame = {
    // profile table in NgramScores.parse format: header, then
    // "langIdx weight gram" rows; weight = topK − rank₀ even when the
    // learned profile is shorter than topK, so the oracle's
    // (topK + 1 − rank) is the same number regardless of profile length
    val entries: Seq[String] =
      s"${langOrder.length} $n" +:
        langOrder.zipWithIndex.flatMap { case (l, li) =>
          profiles.getOrElse(l, Seq.empty).zipWithIndex.map { case (g, r) =>
            s"$li ${topK - r} $g" }
        }
    // ONE compiled string walk per row scores all languages at once
    // (graft_ngram_score); the 8 aggregate-HOF-over-map-literal
    // formulation was 8 langs × topK linear key probes per gram —
    // measured 17.8 s for the key at sf0.1 vs < 1 s native
    val scored = documents
      .withColumn("_ng", call_function("graft_ngram_score",
        lower(col("text")), lit(entries.toArray)))
      .select(
        col("doc_id") +:
          langOrder.zipWithIndex.map { case (l, li) =>
            element_at(col("_ng"), li + 1).as(s"ng_score_$l") }: _*)
    scored.withColumn("pred_lang",
      predLangFromScores(langOrder.map(l => l -> col(s"ng_score_$l"))))
  }

  /** Learn-and-score in one call (the composable convenience; the t14
    * GATE instead goes through SparkEntry's per-dataset profile cache so
    * repeated gate invocations in a sweep share one fit — callers who
    * score many batches should do the same: fit once via
    * [[charNgramProfiles]], reuse the model). */
  def langIdNgramFit(documents: DataFrame, n: Int = 3, topK: Int = 40): DataFrame =
    langIdNgram(documents, charNgramProfiles(documents, n, topK), n, topK)

  /** Gopher/C4-style quality-rule breadth (the public production rule
    * set: Gopher's repetition-free document heuristics and C4's line
    * rules): word-count bounds, mean word length bounds, symbol-to-word
    * ratio, bullet-line and ellipsis-line fractions, alpha-word
    * fraction, and the composite keep/drop flag a curation funnel
    * gates on. Pure column algebra over ONE scan: the token and line
    * arrays materialize once and every signal derives from those two
    * attributes — map-only, no shuffle (plan spec-asserted). Every
    * ratio is an int/int single IEEE division, so the full DuckDB
    * oracle replays all eight columns exactly. */
  def gopherQuality(documents: DataFrame): DataFrame = {
    val base = documents
      .withColumn("_toks", tokens(col("text")))
      .withColumn("_lines", split(col("text"), "\n"))
    val toks = col("_toks")
    val lines = col("_lines")
    val nWords = size(toks)
    val nLines = size(lines)
    val charSum = aggregate(toks, lit(0), (a, t) => a + length(t))
    // Gopher counts hash and ellipsis symbols; non-overlapping leftmost
    // matching is identical in java.util.regex and RE2 for this pattern
    val nSym = size(regexp_extract_all(col("text"), lit("#|\\.\\.\\."), lit(0)))
    val nBullet = size(filter(lines, l =>
      ltrim(l).startsWith("- ") || ltrim(l).startsWith("* ") || ltrim(l).startsWith("• ")))
    val nEllipsis = size(filter(lines, l => rtrim(l).endsWith("...")))
    // tokens() lowercases, so [a-z] is the full letter test
    val nAlpha = size(filter(toks, t => t.rlike("[a-z]")))
    base.select(
        col("doc_id"),
        nWords.as("n_words"),
        (charSum.cast("double") / nullif(nWords, lit(0))).as("mean_word_len"),
        (nSym.cast("double") / nullif(nWords, lit(0))).as("symbol_ratio"),
        (nBullet.cast("double") / nullif(nLines, lit(0))).as("bullet_line_frac"),
        (nEllipsis.cast("double") / nullif(nLines, lit(0))).as("ellipsis_line_frac"),
        (nAlpha.cast("double") / nullif(nWords, lit(0))).as("alpha_word_frac"))
      // when/otherwise, not a boolean cast: an empty doc has null ratios
      // and must gate to 0 in BOTH engines (CASE ... ELSE 0 semantics)
      .withColumn("keep", when(
        col("n_words").between(50, 100000) &&
        col("mean_word_len").between(3, 10) &&
        col("symbol_ratio") < 0.1 &&
        col("bullet_line_frac") < 0.9 &&
        col("ellipsis_line_frac") < 0.3 &&
        col("alpha_word_frac") > 0.8, 1).otherwise(0))
  }

  /** Whitespace + BPE-ish regex token counts + the len/4 heuristic. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
        col("doc_id"),
        size(tokens(col("text"))).as("ws_tokens"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\\\s]', 0)"))
          .as("re_tokens"),
        ceil(length(col("text")).cast("double") / 4).cast("long").as("approx_bpe"))

  /** Per-document lexical diversity — the vocabulary-richness signals
    * quality pipelines read alongside the c24 rules (template spam and
    * keyword stuffing score low on type/token diversity even when the
    * c24 length/punct rules pass):
    *
    *  - `ttr` = distinct tokens / tokens (type-token ratio);
    *  - `hapax_ratio` = once-occurring tokens / distinct tokens
    *    (natural prose is hapax-heavy; generated boilerplate is not);
    *  - `top_ratio` = most-frequent token's share of the doc (the
    *    single-token concentration c7's shingle repetition misses).
    *
    * All three ratios are exact integer rationals rounded decimal-6 via
    * ratRound — never a double quotient through decRound, whose
    * shortest-repr-vs-binary half-tie is exactly where Spark and DuckDB
    * split (the round-10 driver FAIL on this key: counts like 1/80
    * produce true decimal halves at 1e-7). Zero-token docs have no
    * defined ratios and are absent (the t7 contract). Two shuffles —
    * (doc, token) then doc — both map-side combinable. */
  def lexicalDiversity(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        max(col("c")).as("_maxc"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        ratRound("n_types", "n_tokens", 6).as("ttr"),
        ratRound("n_hapax", "n_types", 6).as("hapax_ratio"),
        ratRound("_maxc", "n_tokens", 6).as("top_ratio"))

  /** Code-vs-prose detection — the routing signal a mixed crawl needs
    * before text curation (code documents fail every prose quality rule
    * yet are valuable training data; they must be ROUTED, not dropped):
    * structural-symbol density (`{}[]();=<>` per char — prose
    * punctuation barely touches this class), camelCase transitions, and
    * programming-keyword hits over the token stream. `is_code` fires on
    * symbol density ≥ threshold AND ≥ minKeywords keyword tokens — the
    * two-signal rule so a C-heavy math text (symbols, no keywords) or a
    * prose mention of "if" (keywords, no symbols) doesn't trip it.
    * Map-only column algebra; every count is exact and the one division
    * is decimal-6. */
  def codeDetect(documents: DataFrame, symbolThreshold: Double = 0.05,
                 minKeywords: Int = 2): DataFrame = {
    val keywords = Seq("int", "if", "for", "return", "var", "def",
      "function", "while", "else", "void")
    val n = length(col("text"))
    val sym = n - length(regexp_replace(col("text"), "[{}\\[\\]();=<>]", ""))
    val df = documents
      .withColumn("_toks", tokens(col("text")))
      .withColumn("n_chars", n.cast("int"))
      .withColumn("symbol_ratio",
        when(n > 0, decRound(sym.cast("double") / n, 6)).otherwise(lit(0.0)))
      .withColumn("camel_hits",
        size(expr("regexp_extract_all(text, '[a-z][A-Z]', 0)")).cast("int"))
      .withColumn("keyword_hits",
        stopwordHits(col("_toks"), keywords).cast("int"))
    df.select(col("doc_id"), col("n_chars"), col("symbol_ratio"),
      col("camel_hits"), col("keyword_hits"),
      (col("symbol_ratio") >= symbolThreshold &&
        col("keyword_hits") >= minKeywords).cast("int").as("is_code"))
  }

  /** Canonical text normalization: Unicode NFKC first (ligatures,
    * full-width forms, compatibility variants → canonical — the
    * graft_nfkc codegen expression), then lowercase, trim, strip
    * punctuation, collapse whitespace — the standard pre-tokenization
    * cleanup pass. Map-only, codegen'd. NFKC is the identity on ASCII,
    * so the DuckDB oracle (whose nfc_normalize covers only the NFC
    * subset) stays exact on any NFC-normalized corpus; the NFKC-visible
    * cases (ﬁ, ＡＢＣ, ²) are spec-gated in EdgeCaseSpec. */
  def normalize(documents: DataFrame): DataFrame = {
    val norm = regexp_replace(
      regexp_replace(lower(trim(call_function("graft_nfkc", col("text")))),
        "[.,!?;:]", ""), "\\s+", " ")
    documents.select(col("doc_id"), norm.as("norm_text"),
        length(col("text")).as("n_chars_raw"), length(norm).as("n_chars_norm"))
  }

  /** Pattern redaction (PII-scrub plumbing): every match of each
    * (pattern → tag) pair is replaced, and the total match count is
    * reported per row. Pure map-side regex — embarrassingly parallel,
    * codegen'd, no shuffle; swap in email/phone/SSN patterns for a real
    * PII pass (the synthetic corpus carries none, so the gated query
    * scrubs numeric ids out of the events props JSON instead). */
  def scrub(df: DataFrame, idCol: String, textCol: String,
            patterns: Seq[(String, String)]): DataFrame = {
    // patterns apply SEQUENTIALLY, each counting its matches against the
    // text it actually rewrites — so n_redactions always equals the number
    // of replacements performed. Replacement tags are visible to later
    // patterns; pick tags that no later pattern matches.
    val (scrubbed, total) = patterns.foldLeft((col(textCol), lit(0))) {
      case ((txt, cnt), (pat, tag)) =>
        (regexp_replace(txt, pat, tag),
          cnt + size(regexp_extract_all(txt, lit(pat), lit(0))))
    }
    df.select(col(idCol), scrubbed.as("scrubbed"), total.as("n_redactions"))
  }

  /** Gated scrub query: numeric-id redaction over events.props. */
  def scrubNumbers(events: DataFrame): DataFrame =
    scrub(events, "event_id", "props", Seq("-?\\d+" -> "<NUM>"))

  /** Sequential multi-pattern redaction with PER-PATTERN match counts —
    * the real-PII shape of [[scrub]] (which reports one total): a
    * curation pipeline audits email/phone/URL hits separately before
    * deciding a document's fate. Each (pattern, tag, countCol) counts
    * against the text the previous patterns already rewrote, so
    * Σ count columns == replacements performed; tags must not match any
    * later pattern. Pure map-side regex, codegen'd, no shuffle. */
  def scrubCounted(df: DataFrame, idCol: String, textCol: String,
                   patterns: Seq[(String, String, String)]): DataFrame = {
    val (scrubbed, counts) =
      patterns.foldLeft((col(textCol), Seq.empty[Column])) {
        case ((txt, cs), (pat, tag, cname)) =>
          (regexp_replace(txt, pat, tag),
            cs :+ size(regexp_extract_all(txt, lit(pat), lit(0))).as(cname))
      }
    df.select(col(idCol) +: scrubbed.as("scrubbed") +: counts: _*)
  }

  /** The standard PII trio, ordered so no tag is re-matched downstream:
    * emails first (most specific), then URLs, then NNN-NNNN phone stubs.
    * Mirrored verbatim by the t12 oracle SQL — RE2 (DuckDB) and
    * java.util.regex agree on this subset (classes, \b, \S, {m,}). */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>", "n_email"),
    ("https?://\\S+", "<URL>", "n_url"),
    ("\\b\\d{3}-\\d{4}\\b", "<PHONE>", "n_phone"))

  /** Gated PII scrub: email/URL/phone redaction with per-pattern counts. */
  def scrubPii(documents: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    scrubCounted(documents, idCol, textCol, piiPatterns)

  /** Payment-card PII scrub — the two-stage detect-then-VERIFY
    * redaction a regex alone cannot express: 13–19-digit candidates
    * (optional space/dash grouping) are matched by pattern, then only
    * those passing the Luhn checksum (the native `graft_luhn`
    * expression) are redacted — order ids and tracking numbers that
    * merely LOOK like cards survive, so the scrub destroys no training
    * signal it doesn't have to. Both counts are reported (candidates
    * vs verified) — the audit ratio a privacy review reads first.
    * Verified candidates are folded over the text as literal
    * replacements in SORTED DISTINCT order, so the rewrite is
    * deterministic on any engine and partitioning. Pure map, codegen'd,
    * no shuffle — the t12 scale posture. */
  val cardCandidatePattern = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  def scrubCards(documents: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    documents
      // lit() pattern, NOT an expr() SQL literal: the SQL parser's
      // escape handling would eat the \b/\d backslashes
      .withColumn("_cands",
        regexp_extract_all(col(textCol), lit(cardCandidatePattern), lit(0)))
      .withColumn("_ok",
        filter(col("_cands"), c => call_function("graft_luhn", c)))
      .select(col(idCol),
        aggregate(array_sort(array_distinct(col("_ok"))), col(textCol),
          (acc, c) => call_function("replace", acc, c, lit("<CARD>")))
          .as("scrubbed"),
        size(col("_cands")).as("n_candidates"),
        size(col("_ok")).as("n_cards"))

  /** Within-document repetition signals — the Gopher repetition-rule
    * family (Rae et al. 2021, Table A1), the standard published
    * complement to c7's corpus-shingle ratio and c38's corpus-level
    * line dedup: all four signals are WITHIN one document, so a page
    * that stutters its own content is caught even when that content is
    * globally unique. Per document:
    *
    *  - `dup_line_frac` — fraction of lines occurring ≥2× in the doc
    *    (lines = trimmed nonempty newline splits, the c38 convention);
    *  - `dup_line_char_frac` — character mass of those duplicated
    *    lines over all line characters;
    *  - `top2_char_frac` — the most frequent word 2-gram's occurrence
    *    count × its token character length, over total token
    *    characters (ties: lexicographically smallest 2-gram; null when
    *    the doc has <2 tokens);
    *  - `dup5_char_frac` — token character mass COVERED by at least
    *    one word 5-gram occurring ≥2× in the doc (interval UNION over
    *    positions — the d16/c35 coverage idiom, no double counting),
    *    over total token characters; 0 when nothing repeats.
    *
    * Character masses count token characters only (separators excluded
    * on both sides of every ratio — self-consistent, the convention
    * the oracle replays). All ratios are exact integer rationals via
    * ratRound. Zero-token docs are absent (t7 contract).
    *
    * Plan: three doc-keyed explode→aggregate passes (lines, 2-grams,
    * 5-grams), each map-side combinable, joined back on doc_id — the
    * d16 family's shape: linear in corpus size, no key hotter than one
    * document's own windows (the 5-gram repeat count partitions on
    * (doc_id, gram) — bounded by a single document, not a corpus hot
    * key). Top-2-gram selection is a two-phase min_by over
    * struct(−count, gram), never a corpus-keyed window. */
  def repetitionSignals(documents: DataFrame): DataFrame = {
    // tokenize ONCE: five branches (char mass, lines, 2-grams, 5-gram
    // coverage, the final frame) consume the token arrays, and without
    // materialization each branch re-scans and re-tokenizes the corpus
    // (measured 9.7 → ~4 s at sf0.1). At 100 TB the equivalent is
    // staging the tokenized table once per curation sweep — the
    // dupSpanShingles write-once posture.
    val base = documents
      .withColumn("_toks", tokens(col("text")))
      .select(col("doc_id"), col("text"), col("_toks"),
        size(col("_toks")).as("n"))
      .filter(col("n") > 0)
      .localCheckpoint()
    val tokChars = base.select(col("doc_id"),
        explode(col("_toks")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(length(col("tok")).cast("long")).as("tok_chars"))
    val lstat = base.select(col("doc_id"),
        explode(filter(transform(split(col("text"), "\n"), l => trim(l)),
          l => l =!= "")).as("line"))
      .groupBy(col("doc_id"), col("line"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_lines"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("n_dup_lines"),
        sum(length(col("line")).cast("long") * col("c")).as("line_chars"),
        sum(when(col("c") >= 2, length(col("line")).cast("long") * col("c"))
          .otherwise(0L)).as("dup_line_chars"))
    val top2 = base.filter(col("n") >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, n - 1), i -> struct(" +
          "concat_ws(' ', _toks[i-1], _toks[i]) AS g, " +
          "length(_toks[i-1]) + length(_toks[i]) AS chars))")).as("x"))
      .groupBy(col("doc_id"), col("x.g").as("g"))
      .agg(count(lit(1)).as("c"), max(col("x.chars")).cast("long").as("chars"))
      .groupBy(col("doc_id"))
      .agg(min_by(col("c") * col("chars"),
        struct(negate(col("c")), col("g"))).as("top2_chars"))
    val occ5 = base.filter(col("n") >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, n - 4), i -> struct(" +
          "i AS p, concat_ws(' ', slice(_toks, i, 5)) AS g))")).as("x"))
      .select(col("doc_id"), col("x.p").as("p"), col("x.g").as("g"))
    // repeat counts partition on (doc_id, gram) — bounded by ONE doc's
    // windows, so this window is not the d7 corpus-hot-key shape
    val cov5 = occ5
      .withColumn("c", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"), col("g"))))
      .filter(col("c") >= 2)
      .select(col("doc_id"), explode(sequence(col("p"), col("p") + 4)).as("cp"))
      .distinct()
    val dup5 = cov5
      .join(base.select(col("doc_id"),
          posexplode(col("_toks")).as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + 1).as("cp"),
          length(col("tok")).cast("long").as("len")),
        Seq("doc_id", "cp"))
      .groupBy(col("doc_id")).agg(sum(col("len")).as("dup5_chars"))
    base.select(col("doc_id"), col("n").cast("long").as("n_tokens"))
      .join(tokChars, "doc_id")
      .join(lstat, "doc_id")
      .join(top2, Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        col("n_lines").cast("int").as("n_lines"),
        ratRound("n_dup_lines", "n_lines", 6).as("dup_line_frac"),
        ratRound("dup_line_chars", "line_chars", 6).as("dup_line_char_frac"),
        when(col("top2_chars").isNotNull,
          ratRound("top2_chars", "tok_chars", 6)).as("top2_char_frac"),
        ratRound("coalesce(dup5_chars, 0)", "tok_chars", 6)
          .as("dup5_char_frac"))
  }

  /** Invisible-character scrub — the encoding-hygiene pass between
    * mojibake repair (t21, wrong bytes) and NFKC (t6, compatibility
    * variants): characters that RENDER as nothing but break every
    * downstream equality — zero-width space/joiners and bidi marks
    * (U+200B–U+200F), word joiner (U+2060), BOM-as-text (U+FEFF) and
    * soft hyphen (U+00AD) are REMOVED (spam wedges them inside
    * blockwords to evade filters, and they split tokens, poison
    * shingles and defeat exact dedup); non-breaking space (U+00A0) is
    * a different class — visible width, wrong identity — and maps to a
    * regular space. Both counts are reported (the evasion-rate signal:
    * a corpus slice with high invisible density is adversarial, not
    * accidental). Pure map, codegen regex, no shuffle; \x{...}
    * classes parse identically in java.util.regex and RE2, so the
    * oracle replays the same pattern text. */
  val invisiblePattern = "[\\x{200B}-\\x{200F}\\x{2060}\\x{FEFF}\\x{00AD}]"

  def scrubInvisible(documents: DataFrame): DataFrame =
    documents
      .withColumn("_inv",
        size(regexp_extract_all(col("text"), lit(invisiblePattern), lit(0))))
      .withColumn("_nb",
        size(regexp_extract_all(col("text"), lit("\\x{00A0}"), lit(0))))
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"), invisiblePattern, ""),
          "\\x{00A0}", " ").as("clean_text"),
        col("_inv").as("n_invisible"), col("_nb").as("n_nbsp"))

  /** Corpus-adaptive stopword stripping: the corpus's top-k most
    * frequent tokens are removed from every document, order preserved —
    * the vocabulary-driven rewrite used before indexing / n-gram
    * modelling (fixed stopword lists miss domain-specific filler).
    * Plan shape: the top-k vocabulary is a TakeOrdered over the term
    * aggregate, collapsed to ONE row carrying the list and broadcast;
    * the rewrite is then a pure per-row HOF filter over the materialized
    * token array — no explode, no shuffle on the rewrite path. */
  def stopStrip(documents: DataFrame, k: Int = 20): DataFrame = {
    val top = documents
      .withColumn("term", explode(tokens(col("text"))))
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term")).limit(k)
      .agg(collect_list(col("term")).as("topk"))
    documents
      .withColumn("_toks", tokens(col("text")))
      .crossJoin(broadcast(top))
      .select(col("doc_id"), size(col("_toks")).as("n_tokens_raw"),
        filter(col("_toks"), t => !array_contains(col("topk"), t)).as("_kept"))
      .select(col("doc_id"), col("n_tokens_raw"),
        size(col("_kept")).as("n_tokens_kept"),
        array_join(col("_kept"), " ").as("stripped_text"))
  }

  /** Corpus-learned BPE merge table (graft.functions.Bpe — the public
    * Sennrich algorithm). The fit only touches the (word, count)
    * aggregate: one distributed word count capped to the `maxVocab` most
    * frequent words (deterministic count-desc/word tie-break), then a
    * driver loop over that vocab-bounded dict — the corpus itself is
    * never collected, so the shape holds at 100 TB (k-means-centroid-
    * style model state). */
  def bpeLearn(documents: DataFrame, numMerges: Int = 40,
               maxVocab: Int = 100000): Seq[(String, String)] = {
    val wc = documents
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.functions.Bpe.learn(wc, numMerges)
  }

  /** Apply a learned merge table: map-only native codegen segmentation
    * per document (graft_bpe_segment), no shuffle. Emits the real-token
    * count a packing/budgeting pipeline needs plus the segmentation
    * itself (space-joined — subwords never contain whitespace). */
  def bpeTokenize(documents: DataFrame, merges: Seq[(String, String)]): DataFrame =
    documents
      .withColumn("_bpe", call_function("graft_bpe_segment", col("text"),
        lit(merges.map { case (a, b) => s"$a $b" }.toArray)))
      .select(col("doc_id"),
        size(tokens(col("text"))).as("n_words"),
        size(col("_bpe")).as("n_bpe_tokens"),
        array_join(col("_bpe"), " ").as("bpe_text"))

  /** Fit the unigram-LM (SentencePiece-family) piece table — [[bpeLearn]]'s
    * twin for the other production tokenizer family: same vocab-bounded
    * (word, count) aggregate feeds `Unigram.learn`'s hard-EM fit; the
    * corpus is never collected, so the shape holds at 100 TB. */
  def unigramLearn(documents: DataFrame, vocabSize: Int = 400,
                   maxVocab: Int = 100000): Seq[(String, Double)] = {
    val wc = documents
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.functions.Unigram.learn(wc, vocabSize)
  }

  /** Serialize a fitted piece table to the literal rows
    * graft_unigram_segment expects — raw log-prob bits, so the model
    * round-trips exactly. */
  def unigramModelRows(model: Seq[(String, Double)]): Array[String] =
    model.map { case (p, lp) =>
      s"$p ${java.lang.Double.doubleToLongBits(lp)}"
    }.toArray

  /** Apply a fitted unigram-LM model: map-only native codegen Viterbi
    * segmentation per document (graft_unigram_segment), no shuffle —
    * [[bpeTokenize]]'s column contract with the unigram names. */
  def unigramTokenize(documents: DataFrame,
                      model: Seq[(String, Double)]): DataFrame =
    documents
      .withColumn("_ug", call_function("graft_unigram_segment", col("text"),
        lit(unigramModelRows(model))))
      .select(col("doc_id"),
        size(tokens(col("text"))).as("n_words"),
        size(col("_ug")).as("n_unigram_tokens"),
        array_join(col("_ug"), " ").as("unigram_text"))

  /** Fit the WordPiece vocabulary — the THIRD tokenizer family
    * ([[bpeLearn]]/[[unigramLearn]]'s sibling, the BERT tokenizer):
    * same vocab-bounded (word, count) aggregate feeds
    * `Wordpiece.learn`'s likelihood-scored merge loop; the corpus is
    * never collected, so the shape holds at 100 TB. */
  def wordpieceLearn(documents: DataFrame, numMerges: Int = 200,
                     maxVocab: Int = 100000): Seq[String] = {
    val wc = documents
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.functions.Wordpiece.learn(wc, numMerges)
  }

  /** Apply a fitted WordPiece vocabulary: map-only native codegen
    * greedy longest-match segmentation per document
    * (graft_wordpiece_segment), no shuffle — [[bpeTokenize]]'s column
    * contract with the WordPiece names (plus the corpus [UNK] rate's
    * numerator, the coverage metric a tokenizer rollout watches). */
  def wordpieceTokenize(documents: DataFrame, vocab: Seq[String]): DataFrame =
    documents
      .withColumn("_wp", call_function("graft_wordpiece_segment", col("text"),
        lit(vocab.toArray)))
      .select(col("doc_id"),
        size(tokens(col("text"))).as("n_words"),
        size(col("_wp")).as("n_wp_tokens"),
        size(filter(col("_wp"), p => p === graft.functions.Wordpiece.Unk))
          .as("n_unk"),
        array_join(col("_wp"), " ").as("wp_text"))

  /** Head+tail token-budget truncation — the long-document policy
    * context-bounded training actually ships: keep the first
    * `headTokens` and last `tailTokens` tokens and drop the middle
    * (document leads carry topic/boilerplate signal, tails carry
    * conclusions/signatures; a head-only cut loses everything a tail
    * states — the shape behind "lost in the middle" dataset policies).
    * Within-budget docs pass through token-normalized (single-space
    * joined, same as every scrub in this repo); over-budget docs get
    * head + " ... " marker + tail, an exact dropped-token count and a
    * truncated flag. Pure array slicing over the shared token column —
    * map-only, no shuffle, composes anywhere in the funnel. */
  def truncateMiddle(documents: DataFrame, headTokens: Int = 64,
                     tailTokens: Int = 32): DataFrame = {
    require(headTokens > 0 && tailTokens > 0, "head and tail must be positive")
    val budget = headTokens + tailTokens
    documents
      .withColumn("_toks", tokens(col("text")))
      .withColumn("n", size(col("_toks")))
      .select(col("doc_id"), col("n").cast("int").as("n_tokens"),
        when(col("n") <= budget, array_join(col("_toks"), " "))
          .otherwise(concat(
            array_join(slice(col("_toks"), 1, headTokens), " "),
            lit(" ... "),
            array_join(slice(col("_toks"), -tailTokens, tailTokens), " ")))
          .as("truncated_text"),
        greatest(col("n") - budget, lit(0)).cast("int").as("n_dropped"),
        (col("n") > budget).cast("int").as("truncated"))
  }

  /** Per-language tokenizer fertility — the QA table every tokenizer
    * build is judged by: subword tokens per word (`fertility` — the
    * multilingual-equity number: a tokenizer trained on English spends
    * 2-4× the tokens per word on underrepresented scripts, silently
    * shrinking their effective context window and raising their serving
    * cost) and bytes per token (the compression view). Aggregated from
    * a per-doc BPE count frame ([[bpeTokenize]]'s output — persisted by
    * the gate so the ratios replay from staged data), byte counts from
    * the raw UTF-8 lengths, ratios via the exact-rational ratRound with
    * zero-denominator langs emitting null. One join + one combinable
    * aggregate over the language dimension. */
  def bpeFertility(documents: DataFrame, bpeCounts: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("lang"),
        octet_length(col("text")).cast("long").as("nb"))
      .join(bpeCounts.select(col("doc_id"), col("n_words"), col("n_bpe_tokens")),
        "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).cast("long").as("n_words"),
        sum(col("n_bpe_tokens")).cast("long").as("n_bpe_tokens"),
        sum(col("nb")).cast("long").as("n_bytes"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"), col("n_bytes"),
        when(col("n_words") > 0,
          ratRound("n_bpe_tokens", "n_words", 6)).as("fertility"),
        when(col("n_bpe_tokens") > 0,
          ratRound("n_bytes", "n_bpe_tokens", 6)).as("bytes_per_token"))

  /** Gated t11: learn on the corpus, segment the corpus. */
  def bpeTokens(documents: DataFrame, numMerges: Int = 40): DataFrame =
    bpeTokenize(documents, bpeLearn(documents, numMerges))

  /** Learned merges as a persistable model table (rank, first, second) —
    * the same artifact idiom as the k-means centroids and sketch tables:
    * fit once on the big corpus, save the (tiny) table, tokenize any
    * later batch with [[bpeTokenize]] after [[bpeMergesFrom]]. */
  def bpeMergesDF(spark: org.apache.spark.sql.SparkSession,
                  merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "first", "second")
  }

  /** Inverse of [[bpeMergesDF]]: rank order restored regardless of the
    * table's storage order. */
  def bpeMergesFrom(df: DataFrame): Seq[(String, String)] =
    df.select(col("rank"), col("first"), col("second"))
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Per-doc BPE counts keyed for budget accounting: (doc_id, source,
    * n_bpe_tokens). Same map-only graft_bpe_segment projection as
    * [[bpeTokenize]], keeping the source key a budget ledger groups by;
    * works unchanged on a streaming DataFrame (pure projection). */
  def bpeCounts(documents: DataFrame, merges: Seq[(String, String)]): DataFrame =
    documents
      .withColumn("_bpe", call_function("graft_bpe_segment", col("text"),
        lit(merges.map { case (a, b) => s"$a $b" }.toArray)))
      .select(col("doc_id"), col("source"), size(col("_bpe")).as("n_bpe_tokens"))

  /** Fixed-window document chunking with stride: every document becomes
    * ⌈len/stride⌉ overlapping windows of up to `window` tokens (the
    * context-window preprocessing step of training / retrieval
    * pipelines; stride < window gives the standard overlap). Map +
    * generate only — tokens materialize once, starts are a `sequence`,
    * the slice happens right after the posexplode so the full token
    * array is never carried per chunk row. No shuffle; row amplification
    * is the output's intrinsic ⌈len/stride⌉ factor. */
  def chunk(documents: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be >= 1")
    documents
      .withColumn("_toks", tokens(col("text")))
      .withColumn("_starts", when(size(col("_toks")) > 0,
        sequence(lit(1), size(col("_toks")), lit(stride)))
        .otherwise(array().cast("array<int>")))
      .select(col("doc_id"), col("_toks"),
        posexplode(col("_starts")).as(Seq("chunk_id", "_start")))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("_toks"), col("_start"), lit(window)).as("_chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("_chunk")).as("n_tokens"),
        array_join(col("_chunk"), " ").as("chunk_text"))
  }

  /** Sentence segmentation: extract maximal runs of non-terminator
    * characters with their trailing terminators — ASCII `.!?` plus the
    * CJK full-width `。！？` — via one `regexp_extract_all` pass (an
    * EXTRACTION, not a split: RE2 has no lookbehind, so a
    * keep-the-delimiter split cannot be replayed cross-engine; the
    * extraction form uses only literal char classes both dialects agree
    * on). Whitespace-only fragments are dropped after trimming; a doc
    * with no terminator is one sentence. LEADING terminator runs are
    * dropped by construction: the pattern requires a non-terminator
    * first, so `"...abc."` yields `"abc."` (the orphan `...` is lost)
    * and a terminators-only doc (`"!!!"`) emits no rows at all —
    * pinned by spec, identical in both engines (orphan leading
    * punctuation is markup noise, not sentence content; terminators
    * AFTER any non-terminator, including whitespace, survive as the
    * edge-case spec shows). Map-only — no shuffle; feeds chunking
    * (t13) and per-sentence scoring at any scale. */
  def sentences(documents: DataFrame): DataFrame =
    documents
      .withColumn("_raw", regexp_extract_all(col("text"),
        lit("[^.!?。！？]+[.!?。！？]*"), lit(0)))
      .withColumn("_sents",
        filter(transform(col("_raw"), s => trim(s)), s => s =!= ""))
      .select(col("doc_id"), posexplode(col("_sents")).as(Seq("sent_id", "sentence")))
      .withColumn("n_tokens", size(tokens(col("sentence"))))

  /** HTML→text extraction — the front door of a web-corpus funnel: real
    * crawls arrive as markup, and every downstream text operator assumes
    * extracted plain text. Naive-extractor semantics (the C4 starting
    * point, not a DOM parser): (1) `<script>`/`<style>` blocks drop WITH
    * their content (code/CSS is not prose — two lazy dot-all passes, so
    * a mismatched `<script>…</style>` pair cannot cross-swallow);
    * (2) every remaining tag is replaced by a space (content of title/
    * div/p survives — tag-boundary spacing keeps adjacent words from
    * fusing); (3) the five ubiquitous character entities + `&amp;`
    * decode via plain `replace`, ampersand LAST so `&amp;lt;` decodes to
    * the literal `&lt;` and not `<` (the standard single-pass order);
    * decoded angle brackets are NOT re-stripped — entity decode happens
    * after tag removal on purpose; (4) whitespace collapses to single
    * spaces and trims. All patterns are literal-class RE2-safe regexes
    * with lazy quantifiers both engines implement identically; map-only,
    * no shuffle — composes in front of t1/c24/c32 at any scale. */
  /** The t16 extraction chain as a reusable column: script/style drop,
    * tag strip, the six entity replaces (&amp; last), whitespace
    * collapse. Shared with the c55 WARC-ingest composition so the two
    * extraction surfaces cannot drift. */
  def cleanHtml(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "[\\s　]+", " "))
  }

  def htmlExtract(documents: DataFrame): DataFrame = {
    val clean = cleanHtml(col("text"))
    documents.select(col("doc_id"), clean.as("clean_text"),
      length(clean).cast("int").as("n_chars"))
  }

  /** Semi-structured XML extraction — the q19 (JSON) twin for the other
    * wire format a crawl/feed pipeline ingests (sitemaps, RSS/Atom,
    * OAI-PMH dumps, MediaWiki exports): Spark 4's NATIVE `from_xml`
    * parses each record string against a declared schema, exercising
    * the parser surfaces that matter — attributes (the `_`-prefixed
    * fields, here on the record root and on a self-closing child),
    * nested structs, REPEATED elements collected into an array, XML
    * entity decoding inside element text, and absent optional elements
    * surfacing as null. Typed columns come out relationally; map-only,
    * codegen-friendly, no shuffle — composes in front of any curation
    * pass at 100 TB exactly like q19's JSON path. */
  def xmlExtract(xmlDocs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("_id", LongType),
      StructField("meta", StructType(Seq(
        StructField("_lang", StringType),
        StructField("_score", DoubleType)))),
      StructField("body", StringType),
      StructField("tag", ArrayType(StringType)),
      StructField("note", StringType)))
    xmlDocs.select(from_xml(col("xml"), schema).as("x"))
      .select(
        col("x._id").as("doc_id"),
        col("x.meta._lang").as("lang"),
        col("x.meta._score").as("score"),
        col("x.body").as("body"),
        when(col("x.tag").isNull, lit(""))
          .otherwise(array_join(col("x.tag"), ",")).as("tags"),
        when(col("x.tag").isNull, lit(0))
          .otherwise(size(col("x.tag"))).as("n_tags"),
        coalesce(col("x.note"), lit("")).as("note"))
  }

  /** Rolling-hash winnowing fingerprint per document, via the one-pass
    * native graft_fingerprint expression (bit-identical to the composable
    * ColumnFns.fingerprintFromChars reference — spec-asserted — but one
    * string walk instead of a char-array with 4 lookups per window). */
  def fingerprints(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        call_function("graft_fingerprint", col("text")).as("fp"))

  /** The common UTF-8-decoded-as-Latin-1 mojibake digraphs: each target
    * char's UTF-8 bytes are 0xC3 followed by (codepoint − 0x40), so the
    * damage reads as Ã (U+00C3) + one Latin-1 symbol. PUBLIC so the
    * oracle builds its replace chain from the SAME table — the two
    * sides cannot drift. Pairs are (damaged digraph, repaired char). */
  val MojibakePairs: Seq[(String, String)] = Seq(
    "Ã©" -> "é", // é
    "Ã¨" -> "è", // è
    "Ãª" -> "ê", // ê
    "Ã§" -> "ç", // ç
    "Ã±" -> "ñ", // ñ
    "Ã¶" -> "ö", // ö
    "Ã¼" -> "ü", // ü
    "Ã¯" -> "ï", // ï
    "Ã¡" -> "á", // á
    "Ã³" -> "ó", // ó
    "Ãº" -> "ú", // ú
    "Ã¤" -> "ä") // ä

  /** Mojibake repair — the ftfy step every web-crawl pipeline runs:
    * text that went UTF-8 → bytes → wrongly-decoded-as-Latin-1 carries
    * the damage as two-char digraphs (Ã + symbol), and THIS is how it
    * arrives in real crawls (the original bytes are long gone). Each
    * [[MojibakePairs]] digraph collapses back to its character via a
    * literal `replace` chain (htmlExtract's entity idiom — RE2-free,
    * map-only, no shuffle); digraph second-chars are pairwise distinct
    * so the chain is order-independent, and correctly-encoded text
    * (including bare accented chars without the Ã prefix) passes
    * through untouched. `n_fixed` = codepoints removed = number of
    * repairs (each collapses 2 → 1). */
  def fixMojibake(documents: DataFrame): DataFrame = {
    val fixed = MojibakePairs.foldLeft(col("text")) {
      case (c, (bad, good)) => replace(c, lit(bad), lit(good))
    }
    documents.select(col("doc_id"), fixed.as("fixed_text"),
      (length(col("text")) - length(fixed)).cast("int").as("n_fixed"))
  }

  /** Readability scoring via the two standard SYLLABLE-FREE formulas —
    * Coleman-Liau (`0.0588·L − 0.296·S − 15.8`, L/S = letters/sentences
    * per 100 words) and the Automated Readability Index
    * (`4.71·chars/word + 0.5·words/sentence − 21.43`) — the grade-level
    * gate a curation funnel uses to target or exclude reading levels.
    * Syllable-based formulas (Flesch) need a hyphenation dictionary;
    * these two are pure counts, which is why they are the ones
    * large-scale pipelines actually compute. Counts: letters = ASCII
    * alphabetics (the formulas are calibrated for English; CJK docs get
    * near-zero letter counts and null-safe scores), chars = letters +
    * digits (ARI's definition), words = the shared token stream,
    * sentences = t15's extraction-regex runs. Scores only for docs with
    * ≥1 word AND ≥1 sentence (a formula without a denominator is null,
    * never a fabricated grade). Map-only, no shuffle. */
  def readability(documents: DataFrame): DataFrame = {
    val letters = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
    val chars = length(regexp_replace(col("text"), "[^A-Za-z0-9]", ""))
    val words = size(tokens(col("text")))
    val sents = size(filter(
      transform(regexp_extract_all(col("text"),
        lit("[^.!?。！？]+[.!?。！？]*"), lit(0)), s => trim(s)),
      s => s =!= ""))
    // Both scores are EXACT RATIONALS of the counts (each formula
    // multiplied through by its denominator: cli = (588L − 2960S −
    // 1580W)/100W, ari = (471C·S + 50W² − 2143W·S)/100W·S), rounded
    // half-away-from-zero at 1e-6 by integer arithmetic in
    // DECIMAL(38,0): 0.5·W/S lands on TRUE decimal halves constantly
    // (any W ≡ 2S·k/… pattern), exactly where double→decimal casts
    // disagree across engines (Spark rounds the shortest repr, DuckDB
    // the binary value — the decRound scaladoc's trap, hit 2/500 docs
    // on the first double-arithmetic cut). The single double op left is
    // the final scale-down of an exact integer.
    def ratScore(numSql: String, denSql: String): Column =
      ratRound(numSql, denSql, 6)
    documents
      .select(col("doc_id"),
        letters.cast("long").as("n_letters"),
        chars.cast("long").as("n_chars_an"),
        words.cast("long").as("n_words"),
        sents.cast("long").as("n_sentences"))
      .withColumn("cli", when(col("n_words") > 0 && col("n_sentences") > 0,
        ratScore("588 * n_letters - 2960 * n_sentences - 1580 * n_words",
          "100 * n_words")))
      .withColumn("ari", when(col("n_words") > 0 && col("n_sentences") > 0,
        ratScore(
          "471 * n_chars_an * n_sentences + 50 * n_words * n_words" +
            " - 2143 * n_words * n_sentences",
          "100 * n_words * n_sentences")))
  }

  /** Flesch Reading Ease + Flesch–Kincaid grade — the SYLLABLE-based
    * half of the readability family ([[readability]] ships the two
    * syllable-FREE formulas; these are the two everyone actually
    * quotes). Syllables use the standard public heuristic: count of
    * maximal [aeiouy]+ runs per word, one subtracted for a silent
    * final 'e' when more than one run exists, floor 1 — computed as a
    * HOF fold over the materialized token array (no explode, no
    * shuffle; the count is per-row arithmetic). Both scores multiply
    * through by 1000·S·W to EXACT integer rationals rounded at 1e-6 by
    * [[graft.functions.ColumnFns.ratRound]]'s integer arithmetic — the
    * t19 lesson (double formulas land on decimal halves where engines
    * round differently, measured 2/500 docs) applied from the start. */
  def flesch(documents: DataFrame): DataFrame = {
    val sents = size(filter(
      transform(regexp_extract_all(col("text"),
        lit("[^.!?。！？]+[.!?。！？]*"), lit(0)), s => trim(s)),
      s => s =!= ""))
    // the rule runs on the LETTERS of the token (tokens keep trailing
    // punctuation, which would stop the silent-e rule from ever firing
    // on sentence-final words — caught by the hand-checked spec)
    def sylOf(raw: Column): Column = {
      val w = regexp_replace(raw, "[^a-z]", "")
      val g = regexp_count(w, lit("[aeiouy]+"))
      greatest(lit(1L),
        (g - when(w.endsWith("e") && g > 1, 1).otherwise(0)).cast("long"))
    }
    documents
      .withColumn("_toks", tokens(col("text")))
      .select(col("doc_id"),
        size(col("_toks")).cast("long").as("n_words"),
        sents.cast("long").as("n_sentences"),
        aggregate(col("_toks"), lit(0L), (acc, w) => acc + sylOf(w))
          .as("n_syllables"))
      .withColumn("fre", when(col("n_words") > 0 && col("n_sentences") > 0,
        ratRound(
          "206835 * n_sentences * n_words - 1015 * n_words * n_words" +
            " - 84600 * n_syllables * n_sentences",
          "1000 * n_sentences * n_words", 6)))
      .withColumn("fk_grade", when(col("n_words") > 0 && col("n_sentences") > 0,
        ratRound(
          "390 * n_words * n_words + 11800 * n_syllables * n_sentences" +
            " - 15590 * n_sentences * n_words",
          "1000 * n_sentences * n_words", 6)))
  }

  /** Unicode-script classes for [[scriptMix]], name → character class,
    * names in ALPHABETICAL order (the dominant-script tie order).
    * FIXED codepoint ranges, not `\p{IsXxx}` script properties: ranges
    * are identical byte-for-byte in java.util.regex and RE2 and cannot
    * drift between the JVM's and the oracle engine's Unicode tables
    * (the [[graft.functions.ColumnFns.segmentScripts]] scaladoc's
    * post-Unicode-13 disagreement window does not exist here). The
    * Latin class is ASCII letters + Latin-1/Extended-A/B letters with
    * the two stray math signs in that block (× U+00D7, ÷ U+00F7)
    * excluded; CJK is Han + Hiragana + Katakana (one routing class —
    * they share a tokenizer path); Hangul is syllables + jamo.
    *
    * DELIBERATELY NARROW contract (fixed-range stability beats recall
    * here, and both sides of the oracle share the same boundary):
    * Latin ends at U+024F, so Latin Extended Additional letters
    * (U+1E00–U+1EFF, e.g. Vietnamese precomposed vowels) count as NO
    * script — a mostly-precomposed-Vietnamese doc can route to `none`
    * or a minority script; the CJK class also omits the ideographic
    * iteration mark U+3005 and Katakana Phonetic Extensions
    * (U+31F0–U+31FF), which the broader `\p{IsHan}`/`\p{IsKatakana}`
    * classes in [[graft.functions.ColumnFns.segmentScripts]] DO cover
    * — the two CJK notions intentionally differ (routing wants a
    * version-stable fixed range; segmentation wants per-char
    * property coverage). Widening any class must change this Seq and
    * the t25 oracle regex in the SAME commit. */
  val scriptClasses: Seq[(String, String)] = Seq(
    "arabic"   -> "[\\x{0600}-\\x{06FF}]",
    "cjk"      -> "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek"    -> "[\\x{0370}-\\x{03FF}]",
    "hangul"   -> "[\\x{AC00}-\\x{D7A3}\\x{1100}-\\x{11FF}]",
    "hebrew"   -> "[\\x{0590}-\\x{05FF}]",
    "latin"    -> ("[A-Za-z\\x{00C0}-\\x{00D6}\\x{00D8}-\\x{00F6}" +
      "\\x{00F8}-\\x{024F}]"))

  /** Unicode-script mix profile — the ROUTING layer ahead of language
    * ID: t1/t14 assume one writing system (stopword lists and trigram
    * profiles are per-language models), so a multilingual crawl slice
    * must be split by SCRIPT before any tokenizer or LM choice, and
    * mixed-script documents (spam wedging Cyrillic look-alikes into
    * Latin words, code-switched text) are a curation signal in their
    * own right. Per document: the seven [[scriptClasses]] counts,
    * their total `n_script`, the DOMINANT script (max count, ties to
    * the alphabetically first name — engine-deterministic; `"none"`
    * when no script letter occurs), and the Latin share as an exact
    * rational ([[graft.functions.ColumnFns.ratRound]] — integer-ratio
    * quotients through a double boundary are the banned half-tie
    * trap). Plan shape: pure map — seven codegen regex scans, no
    * shuffle, no UDF, no explode; the argmax is a `greatest()` over
    * (count, priority, name) structs evaluated per row. At 100 TB this
    * is a single embarrassingly-parallel pass fused into whatever scan
    * feeds it. */
  def scriptMix(documents: DataFrame): DataFrame = {
    val names = scriptClasses.map(_._1)
    val counted = scriptClasses.foldLeft(documents) { case (df, (nm, pat)) =>
      df.withColumn(s"n_$nm",
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long"))
    }
    val total = names.map(nm => col(s"n_$nm")).reduce(_ + _)
    // struct comparison is field-order lexicographic: max count first,
    // then max priority = alphabetically FIRST name (priority reverses
    // the alphabetical index); the name field is carried, never compared
    val dominant = greatest(names.zipWithIndex.map { case (nm, i) =>
      struct(col(s"n_$nm").as("cnt"),
        lit(names.size - 1 - i).as("pri"), lit(nm).as("name"))
    }: _*).getField("name")
    counted
      .withColumn("n_script", total)
      .select(col("doc_id") +: col("n_script") +:
        names.map(nm => col(s"n_$nm")) :+
        when(col("n_script") > 0, dominant).otherwise(lit("none"))
          .as("dominant_script") :+
        when(col("n_script") > 0, ratRound("n_latin", "n_script", 6))
          .as("latin_share"): _*)
  }

  /** Markdown→text extraction — t16's sibling for the OTHER big crawl
    * surface (READMEs, forums, docs sites — much of a code-adjacent
    * corpus arrives as markdown, and training on raw markup teaches
    * the model to emit stray `**` and fence lines): code fences
    * dropped whole (code belongs in a code corpus, not prose — the
    * count is reported so a code-routing layer like t18 can reclaim
    * them), inline code unwrapped, images → alt text, links → link
    * text, bold/italic markers stripped, ATX headers and blockquote
    * prefixes unwrapped, whitespace collapsed. Order is load-bearing
    * (fences before inline backticks, images before links — `![` is a
    * prefix of the link pattern) and every pattern is RE2-safe (no
    * lookbehind: image-vs-link counting is total-minus-image, not a
    * `(?<!!)` assertion), so the oracle replays the chain verbatim.
    * Pure map, codegen regex, no shuffle. */
  def markdownExtract(documents: DataFrame): DataFrame = {
    val fencePat = "(?s)```.*?```"
    val imgPat = "!\\[([^\\]]*)\\]\\(([^)]*)\\)"
    val linkPat = "\\[([^\\]]*)\\]\\(([^)]*)\\)"
    val noFence = regexp_replace(col("text"), fencePat, " ")
    val noInline = regexp_replace(noFence, "`([^`]*)`", "$1")
    val noImg = regexp_replace(noInline, imgPat, "$1")
    val noLink = regexp_replace(noImg, linkPat, "$1")
    val noEmph = regexp_replace(noLink, "(\\*\\*|__|\\*)", "")
    val noHead = regexp_replace(noEmph, "(?m)^#{1,6} ", "")
    val noQuote = regexp_replace(noHead, "(?m)^> ", "")
    val clean = trim(regexp_replace(noQuote, "[\\s　]+", " "))
    documents.select(col("doc_id"), clean.as("clean_text"),
      length(clean).cast("int").as("n_chars"),
      size(regexp_extract_all(col("text"), lit(fencePat), lit(0)))
        .as("n_code_blocks"),
      (size(regexp_extract_all(col("text"), lit(linkPat), lit(0))) -
        size(regexp_extract_all(col("text"), lit(imgPat), lit(0))))
        .as("n_links"))
  }

  /** Anchor/link extraction — the LINK layer of the web corpus (the
    * signal t16/c53 throw away): every `<a href>` yields one
    * (doc_id, link_idx, href, anchor_text) row, the raw material for
    * the two classic uses — anchor-text corpora (the link text
    * pointing AT a page describes it better than the page itself — the
    * original web-search insight, reused for page-quality signals in
    * crawl curation) and the hyperlink graph (URLs normalize via c33's
    * layer, then the s7/s8/s17/s21 graph family runs on the edges).
    * `is_absolute` separates graph-usable absolute links from
    * same-site relative ones. Pure map + explode — two codegen regex
    * scans zipped positionally, no shuffle; documents without anchors
    * emit no rows (link tables are sparse — the c55 ingest posture,
    * not the fallback-row media posture). */
  def linkGraph(documents: DataFrame, htmlCol: String = "html"): DataFrame = {
    val pat = "<a [^>]*href=\"([^\"]*)\"[^>]*>([^<]*)</a>"
    val pairs = zip_with(
      regexp_extract_all(col(htmlCol), lit(pat), lit(1)),
      regexp_extract_all(col(htmlCol), lit(pat), lit(2)),
      (h, a) => struct(h.as("href"), a.as("atext")))
    documents
      .select(col("doc_id"), posexplode(pairs).as(Seq("link_idx", "lk")))
      .select(col("doc_id"), col("link_idx").cast("int").as("link_idx"),
        col("lk.href").as("href"),
        trim(regexp_replace(col("lk.atext"), "[\\s　]+", " "))
          .as("anchor_text"),
        (col("lk.href").startsWith("http://") ||
          col("lk.href").startsWith("https://")).cast("int")
          .as("is_absolute"))
  }

  /** Distinct (word → Porter stem) vocabulary table — the persistable
    * model artifact of [[topStems]] and the unit the gate STAGES so the
    * relational oracle can replay stemmed aggregation without
    * reimplementing the five-step cascade in SQL (the t11 BPE staging
    * idiom: deterministic JVM-only computation → staged parquet →
    * oracle replays everything downstream relationally). Cost is one
    * distinct over the token vocabulary — bounded by vocabulary size,
    * not corpus size, which is why a 100 TB pipeline materializes
    * word→stem ONCE and joins, rather than stemming every token
    * occurrence in place. */
  def porterVocab(documents: DataFrame): DataFrame =
    documents.select(explode(tokens(col("text"))).as("word")).distinct()
      .withColumn("stem", call_function("graft_porter", col("word")))

  /** Stem-conflated corpus term statistics — the view stemming exists
    * for: per Porter stem, document frequency, the number of distinct
    * SURFACE FORMS the stem unified (`n_forms` > 1 is the conflation
    * payoff — process/processing/processed counting as one term for
    * BM25/TF-IDF-style retrieval), and total occurrences; top-k by
    * (df desc, stem) — a deterministic TakeOrdered, never a global
    * sort. Stemming itself is the native [[graft.functions.Porter]]
    * codegen expression fused into the token explode — one corpus
    * scan, one combinable aggregate, no joins (the staged-vocab join
    * shape in [[porterVocab]]'s scaladoc is the ORACLE's replay path,
    * not this operator's). */
  def topStems(documents: DataFrame, k: Int = 50): DataFrame =
    documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .withColumn("stem", call_function("graft_porter", col("word")))
      .groupBy(col("stem"))
      .agg(countDistinct(col("doc_id")).as("df"),
        countDistinct(col("word")).as("n_forms"),
        count(lit(1)).as("tf"))
      .orderBy(col("df").desc, col("stem"))
      .limit(k)

  /** Default entity gazetteer for [[gazetteerTag]] — a fixed
    * three-type dictionary (person/place/org) mixing one- and two-word
    * entries so both match tiers are exercised. Production swaps in a
    * real gazetteer table; the algebra is entry-count-independent. */
  val defaultGazetteer: Seq[(String, String)] = Seq(
    "alan turing" -> "person", "grace hopper" -> "person",
    "ada" -> "person",
    "london" -> "place", "paris" -> "place", "new york" -> "place",
    "acme corp" -> "org", "un" -> "org")

  /** Dictionary (gazetteer) entity tagging — the corpus-scale NER tier
    * every curation pipeline can actually afford at 100 TB (model NER
    * is GPU work; dictionary matching over tokens is a broadcast join):
    * per document, every gazetteer mention with its entity type and
    * occurrence count. Matching is over the SHARED lower-cased
    * script-segmented tokenizer — one-word entries match single
    * tokens, two-word entries match adjacent token BIGRAMS (positions
    * built array-side before the explode, so no self-join and no
    * doc-keyed window; an entry's constituent words are not themselves
    * entries, so tiers never double-count). Docs without mentions emit
    * no rows (the c55 sparse posture).
    *
    * Scale shape: the gazetteer is dictionary-sized and BROADCAST —
    * the corpus-side work is one token/bigram explode + broadcast
    * hash join + one map-side-combinable (doc, entity) count; nothing
    * data-sized ever shuffles on text except the matched mentions
    * themselves (work ∝ mention density, not corpus size). */
  def gazetteerTag(documents: DataFrame,
                   gazetteer: Seq[(String, String)] = defaultGazetteer): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val gaz = gazetteer.toDF("entity", "etype")
      .withColumn("n_words", size(split(col("entity"), " ")))
    val toksDf = documents
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), col("toks"))
    val grams = toksDf.select(col("doc_id"), explode(concat(
      col("toks"),
      when(size(col("toks")) >= 2, transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => concat(element_at(col("toks"), i + 1), lit(" "),
          element_at(col("toks"), i + 2))))
        .otherwise(array().cast("array<string>")))).as("gram"))
    grams
      .join(broadcast(gaz), col("gram") === col("entity"))
      .groupBy(col("doc_id"), col("entity"), col("etype"))
      .agg(count(lit(1)).as("n_mentions"))
  }

  /** The three date surface forms [[dateExtract]] recognizes. Shared
    * with the oracle replay; group numbers are part of the contract
    * (us: 1=month 2=day 3=year; mon: 1=name 2=day 3=year). Day-first
    * European forms are deliberately out of contract (ambiguous
    * against month-first without locale evidence). */
  private[operators] val isoDatePat =
    "\\b(19|20)\\d{2}-(0[1-9]|1[0-2])-(0[1-9]|[12]\\d|3[01])\\b"
  private[operators] val usDatePat =
    "\\b(0?[1-9]|1[0-2])/(0?[1-9]|[12]\\d|3[01])/((19|20)\\d{2})\\b"
  private[operators] val monDatePat =
    "(?i)\\b(january|february|march|april|may|june|july|august|" +
      "september|october|november|december) (0?[1-9]|[12]\\d|3[01])," +
      " ((19|20)\\d{2})\\b"
  private[operators] val monthNames = Seq("january", "february", "march",
    "april", "may", "june", "july", "august", "september", "october",
    "november", "december")

  /** Publication-date extraction — the temporal-metadata recovery step
    * every crawl pipeline runs (freshness gates, time-sliced training
    * cuts, and knowledge-cutoff-aware decontamination all need a
    * per-document date, and crawls rarely deliver one out of band):
    * three surface forms — ISO (2024-03-15), US slash (3/15/2024) and
    * English month-name (March 15, 2024, case-insensitive) — all
    * NORMALIZED to ISO strings, where lexicographic order IS
    * chronological order, so min/max give the document's date span
    * with no date type in the pipeline. Per doc: mention count, first
    * (earliest) and last (latest) date, null/0 when none. Pure map —
    * three codegen regex scans + per-match group rebuilds on
    * match-sized strings; no shuffle, no UDF. */
  def dateExtract(documents: DataFrame): DataFrame = {
    val iso = regexp_extract_all(col("text"), lit(isoDatePat), lit(0))
    val us = transform(
      regexp_extract_all(col("text"), lit(usDatePat), lit(0)),
      x => concat(regexp_extract(x, usDatePat, 3), lit("-"),
        lpad(regexp_extract(x, usDatePat, 1), 2, "0"), lit("-"),
        lpad(regexp_extract(x, usDatePat, 2), 2, "0")))
    val mon = transform(
      regexp_extract_all(col("text"), lit(monDatePat), lit(0)),
      x => concat(regexp_extract(x, monDatePat, 3), lit("-"),
        lpad(monthNames.zipWithIndex.foldLeft(lit("00")) {
          case (acc, (m, i)) =>
            when(lower(regexp_extract(x, monDatePat, 1)) === m,
              lit(f"${i + 1}%02d")).otherwise(acc)
        }, 2, "0"), lit("-"),
        lpad(regexp_extract(x, monDatePat, 2), 2, "0")))
    documents
      .withColumn("_dates", concat(iso, us, mon))
      .select(col("doc_id"),
        size(col("_dates")).as("n_dates"),
        array_min(col("_dates")).as("first_date"),
        array_max(col("_dates")).as("last_date"))
  }

  /** The two halves of the BGN/PCGN-style Cyrillic→Latin map
    * [[romanize]] applies: multi-character digraphs first (each source
    * char is distinct, so application order cannot interact), then the
    * 1:1 tail via one translate — with the two silent signs (ъ ь)
    * appended PAST the end of the `to` string so translate DROPS them
    * (the documented deletion semantics both engines share). Lowercase
    * only — the map feeds the lower-cased token pipeline. Exposed to
    * SparkEntry so the oracle SQL is GENERATED from the same tables
    * and the two engines cannot drift. */
  private[graft] val romanMulti: Seq[(String, String)] = Seq(
    "щ" -> "shch", "ж" -> "zh", "х" -> "kh", "ц" -> "ts",
    "ч" -> "ch", "ш" -> "sh", "ю" -> "yu", "я" -> "ya", "ё" -> "yo")
  private[graft] val romanFrom = "абвгдезийклмнопрстуфыэъь"
  private[graft] val romanTo = "abvgdeziyklmnoprstufye"

  /** Cyrillic→Latin romanization — the cross-script NORMALIZATION that
    * makes transliterated duplicates visible (the same article syndicated
    * in native script and in romanized form hashes identically after
    * this pass; borrowed Latin words inside Cyrillic text pass through
    * untouched, so mixed-script prose romanizes cleanly): the digraph
    * table first (zh/kh/ts/ch/sh/shch/yu/ya/yo), then one translate for
    * the 1:1 letters with the silent signs dropped. Reports the
    * romanized text and the Cyrillic codepoint count (0 = the doc was
    * already Latin and the pass was an identity). Pure map — nine
    * literal replaces + one translate, all codegen; composes in front
    * of [[graft.operators.Dedup.exact]] as the d29 cross-script dedup. */
  def romanize(documents: DataFrame): DataFrame = {
    val allCyr = romanMulti.map(_._1).mkString + romanFrom
    val chain = romanMulti.foldLeft(col("text")) {
      case (acc, (k, v)) => regexp_replace(acc, k, v)
    }
    documents.select(col("doc_id"),
      translate(chain, romanFrom, romanTo).as("roman_text"),
      (length(col("text")) -
        length(translate(col("text"), allCyr, ""))).cast("int").as("n_cyr"))
  }

  /** SRT subtitle-cue analysis — caption corpora (OpenSubtitles-class
    * data) are a major dialogue source, and their quality signal is
    * TEMPORAL: reading speed. Per document: cue count, the first/last
    * cue timestamps (milliseconds via pure group arithmetic — h/m/s/ms
    * fields extracted and combined, never a timestamp type), total
    * SPEECH span (Σ per-cue durations — pauses between cues do not
    * count as speech), and chars-per-second over that span as an exact
    * rational — machine-generated or mis-synced captions show up as
    * impossible reading speeds (>25 cps) long before any text signal
    * fires. Documents without cues emit 0/null (the audit-friendly
    * shape). Pure map — one timestamp-pair regex + element-wise
    * arithmetic; no shuffle, no UDF. */
  def subtitleCues(documents: DataFrame): DataFrame = {
    val cuePat = "(\\d{2}):(\\d{2}):(\\d{2}),(\\d{3}) --> " +
      "(\\d{2}):(\\d{2}):(\\d{2}),(\\d{3})"
    def ms(x: Column, hG: Int): Column =
      regexp_extract(x, cuePat, hG).cast("long") * 3600000L +
        regexp_extract(x, cuePat, hG + 1).cast("long") * 60000L +
        regexp_extract(x, cuePat, hG + 2).cast("long") * 1000L +
        regexp_extract(x, cuePat, hG + 3).cast("long")
    documents
      .withColumn("_cues", regexp_extract_all(col("text"), lit(cuePat), lit(0)))
      .withColumn("_starts", transform(col("_cues"), x => ms(x, 1)))
      .withColumn("_ends", transform(col("_cues"), x => ms(x, 5)))
      .withColumn("_speech", aggregate(
        zip_with(col("_ends"), col("_starts"), (e, s) => e - s),
        lit(0L), (acc, d) => acc + d))
      // caption text chars: everything that is not a cue line, index
      // line or newline — approximated as chars outside cue matches
      .withColumn("_cuechars", aggregate(
        transform(col("_cues"), x => length(x).cast("long")),
        lit(0L), (acc, d) => acc + d))
      .withColumn("_txtchars",
        (length(col("text")) - col("_cuechars")).cast("long"))
      .select(col("doc_id"),
        size(col("_cues")).as("n_cues"),
        when(size(col("_cues")) > 0, array_min(col("_starts")))
          .as("first_ms"),
        when(size(col("_cues")) > 0, array_max(col("_ends"))).as("last_ms"),
        when(size(col("_cues")) > 0, col("_speech")).as("speech_ms"),
        when(size(col("_cues")) > 0 && col("_speech") > 0,
          ratRound("_txtchars * 1000", "_speech", 2)).as("cps"))
  }

  /** OCR-artifact detection AND repair — the hygiene pass scanned-book
    * and PDF-extraction corpora need before any token-level operator
    * (OCR noise poisons the same downstream keys confusables do, at
    * far higher volume in digitized archives): (1) line-break
    * HYPHENATION REPAIR — `exam- ple` rejoins to `example` (lowercase
    * letter, hyphen, space, lowercase letter — the PDF-extraction
    * artifact; real compounds keep their hyphen because no space
    * follows it), with the join count reported; (2) single-character
    * token SPRAY share (broken-kerning OCR shatters words into letter
    * soup — a high share is the classic scan-garbage signal);
    * (3) digit-in-word tokens (`w0rd` — the O/0, l/1 confusion class).
    * `is_suspect` gates on INTEGER cross-multiplied thresholds (spray
    * share > 20%, ≥2 joins, or ≥3 mixed tokens — no float on the
    * decision path). Pure map over the shared tokenizer + one
    * codegen regex rewrite; no shuffle, no UDF; composes in front of
    * the dedup/token family like t6/t21/t24/t30. */
  def ocrRepair(documents: DataFrame): DataFrame = {
    val hyphPat = "([a-z])- ([a-z])"
    val mixedPat = "^[a-z]*[0-9][a-z]+$|^[a-z]+[0-9][a-z]*$"
    documents
      .withColumn("_nj", size(regexp_extract_all(col("text"), lit(hyphPat), lit(0))))
      .withColumn("clean_text", regexp_replace(col("text"), hyphPat, "$1$2"))
      .withColumn("_toks", tokens(col("clean_text")))
      .withColumn("_nt", size(col("_toks")))
      .withColumn("_nspray", size(filter(col("_toks"),
        t => length(t) === 1 && t.rlike("^[a-z]$"))))
      .withColumn("_nmixed", size(filter(col("_toks"), t => t.rlike(mixedPat))))
      .select(col("doc_id"), col("clean_text"),
        col("_nj").as("n_joins"),
        col("_nt").as("n_tokens"),
        col("_nspray").as("n_spray"),
        col("_nmixed").as("n_mixed"),
        when(col("_nt") > 0, ratRound("_nspray", "_nt", 6)).as("spray_share"),
        (col("_nspray") * 5 > col("_nt") || col("_nj") >= 2 ||
          col("_nmixed") >= 3).cast("int").as("is_suspect"))
  }

  /** Confusable map for [[confusableScrub]]: the high-frequency
    * IDN-spoofing homoglyphs — Cyrillic а е о р с х у і ѕ and Greek
    * ο ι mapped to their Latin skeletons (a deliberate lowercase-only
    * subset of UTS #39's confusables table; the full table is data,
    * not code — the c33 PSL posture). */
  private val confusableFrom = "аеорсхуіѕοι"
  private val confusableTo = "aeopcxyisoi"

  /** Homoglyph / confusable-character hygiene — the adversarial twin
    * of t24's invisible scrub (spam and filter-evasion text swaps
    * Latin letters for Cyrillic/Greek lookalikes; left in a corpus the
    * spoofed forms poison dedup keys, token counts and every
    * dictionary join): per document, the SKELETON text (confusables
    * folded to Latin via one translate pass), the confusable-char
    * count, and the count of MIXED-SCRIPT tokens (a token carrying
    * both a Latin letter and a confusable — the actual spoof signal:
    * genuinely-Cyrillic prose scores zero here because its words are
    * PURE Cyrillic, which is exactly the false-positive pure
    * skeleton-diffing would flag). `spoofed` gates on mixed tokens
    * only. Pure column map (translate + one filtered size over the
    * shared tokenizer) — no shuffle, no UDF; composes in front of the
    * dedup family the same way t6/t21/t24 do. */
  def confusableScrub(documents: DataFrame): DataFrame = {
    documents
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        translate(col("text"), confusableFrom, confusableTo).as("skeleton"),
        (length(col("text")) -
          length(translate(col("text"), confusableFrom, ""))).cast("int")
          .as("n_confusable"),
        size(filter(col("toks"), t =>
          t.rlike("[a-z]") && t.rlike(s"[$confusableFrom]")))
          .as("n_spoof_words"))
      .withColumn("spoofed", (col("n_spoof_words") > 0).cast("int"))
  }
}
