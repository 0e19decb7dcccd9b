package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-data-pipeline surface
  * (BASELINE.json north star): tokenization, shingling, quality signals,
  * language-ID, and fingerprints. Everything here is a pure Catalyst
  * `Column` expression — no UDFs — so it stays inside whole-stage codegen
  * and scales with the scan.
  */
object TextFunctions {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count (BIGINT for oracle parity). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword token count: runs of lowercase letters, runs of
    * digits, or single non-space symbols — a regex approximation of a
    * byte-pair tokenizer's pre-tokenization pass.
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long")

  /** Word n-gram shingles as an array column; rows with fewer than `n`
    * tokens yield an empty array. Runs as the native [[WordShingles]]
    * kernel (one byte pass + one bounded copy per shingle); semantics are
    * pinned equal to the declarative
    * `transform(sequence(1, size(t)-(n-1)), i -> concat_ws(" ", slice(t, i, n)))`
    * form by TextFunctionsSpec, which is what the DuckDB oracles compute.
    */
  def shingles(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.GraftShim.column(
      WordShingles(org.apache.spark.sql.GraftShim.expression(text), n))

  /** Character n-gram shingles (stride-1 code-point windows) as an array
    * column; rows with fewer than `n` characters yield an empty array.
    * Runs as the native [[CharShingles]] kernel (one byte pass for char
    * offsets + one bounded copy per window); semantics are pinned equal
    * to `substr(text, i, n)` character indexing by TextFunctionsSpec,
    * which is what the DuckDB oracles compute.
    */
  def charShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      CharShingles(org.apache.spark.sql.GraftShim.expression(text), n))

  /** Ratio of stopword tokens to all tokens (quality signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = Seq("the", "a")): Column = {
    val t = tokens(text)
    size(filter(t, x => x.isin(stopwords.map(lit): _*))).cast("double") /
      size(t).cast("double")
  }

  /** Mean token length in characters (quality signal). */
  def meanTokenLength(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0L), (acc, x) => acc + length(x).cast("long")).cast("double") /
      size(t).cast("double")
  }

  /** Unicode NFC canonical composition — the native [[NfcNormalize]]
    * kernel (ASCII rows short-circuit byte-scan-only). Run BEFORE exact
    * dedup and token statistics: decomposed and precomposed encodings of
    * the same text otherwise count as distinct documents.
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      NfcNormalize(org.apache.spark.sql.GraftShim.expression(text)))

  /** The standard pre-dedup text cleanup composition: strip C0/C1 control
    * characters (keeping \n and \t), collapse horizontal whitespace runs
    * to one space, trim, then NFC-normalize. Everything but the NFC step
    * is built-in regexp (codegen'd); the whole pipeline is scan-side.
    * Pattern notes: `\p{Cc}` covers C0+DEL+C1; the keep-set is subtracted
    * with character-class intersection available in both Java regex and
    * RE2-style engines via explicit ranges (no lookarounds).
    */
  def cleanText(text: Column): Column = {
    val noCtl = regexp_replace(text, CtlPattern, "")
    val oneSpace = regexp_replace(noCtl, HSpacePattern, " ")
    nfcNormalize(trim(oneSpace))
  }

  /** [[cleanText]]'s patterns, shared with the q62 oracle so both engines
    * run the identical regex (RE2-safe: ranges only, no lookarounds).
    * CtlPattern = C0 controls + DEL + C1 controls (U+0080–U+009F — NEL and
    * friends are common in scraped text), KEEPING \t (collapsed next) and
    * \n. \r is stripped, so CRLF and LF renderings of the same text
    * normalize to identical bytes — which is what lets exact dedup see
    * them as one document.
    */
  private[graft] val CtlPattern = "[\\x00-\\x08\\x0B-\\x1F\\x7F\\x80-\\x9F]"
  private[graft] val HSpacePattern = "[ \\t]+"

  /** MD5 content fingerprint (exact-dup key), lowercase hex. */
  def md5Fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Winnowing-style document fingerprint: the minimum 64-bit hash over the
    * document's word `n`-shingles — one stable representative per document
    * that near-identical documents share with high probability. Seeded
    * xxhash64; empty shingle sets yield null.
    */
  def minShingleFingerprint(text: Column, n: Int = 3, seed: Int = 42): Column =
    array_min(transform(shingles(text, n), s => xxhash64(s, lit(seed))))

  /** PII scrub patterns, applied in order: (regex, typed placeholder).
    * Deliberately the RE2-safe regex subset (no lookarounds) so the same
    * patterns run identically in Spark's Java regex and engines like
    * DuckDB/RE2 — which is what makes the scrub oracle-checkable. Order
    * matters: emails first (their local parts contain digits and dots that
    * later patterns would mangle), then IPs (dotted digit runs that the
    * phone pattern must not see), then phones, then card-like digit runs.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{13,19}\\b" -> "<CARD>")

  /** Scrub common PII shapes out of free text, replacing each with a typed
    * placeholder — the text-column counterpart of the structured-column
    * anonymization in [[graft.operators.Anonymize]], for training corpora
    * where documents embed contact details verbatim. Pattern-based by
    * design (deterministic, engine-portable, runs in the scan); it is NOT
    * an NER system — names and addresses need a model pass, which would
    * ride [[graft.operators.Multimodal.decodeBatched]]-style plumbing.
    */
  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pattern, placeholder)) =>
      regexp_replace(c, pattern, placeholder)
    }

  /** URL-piece regexes, shared by the Column helpers below and the SQL
    * registrations in [[graft.GraftExtensions]] (which build the catalyst
    * nodes directly — a registry builder can't return unresolved Column
    * compositions).
    */
  private[graft] val UrlDomainPattern = "https?://([^/?#]+)"
  private[graft] val UrlTldPattern = "\\.([A-Za-z]+)$"
  private[graft] val UrlPathPattern = "https?://[^/?#]+(/[^?#]*)"

  /** Host part of an http(s) URL (`https://HOST/...`), empty string when
    * the text is not URL-shaped — regexp-based (not `parse_url`) so the
    * identical pattern replays in DuckDB/RE2 for the oracle, and so it
    * stays a codegen'd scan-side expression. The web-corpus grouping key:
    * per-domain document counts drive source-mix curation.
    */
  def urlDomain(url: Column): Column =
    regexp_extract(url, UrlDomainPattern, 1)

  /** Registrable-suffix-ish TLD of a domain: the last dot-separated label.
    * (A public-suffix-list lookup is a broadcast-join against a suffix
    * table, not a regex — this is the cheap scan-side signal.)
    */
  def urlTld(domain: Column): Column =
    regexp_extract(domain, UrlTldPattern, 1)

  /** Path of an http(s) URL, without query/fragment; empty if none. */
  def urlPath(url: Column): Column =
    regexp_extract(url, UrlPathPattern, 1)

  /** Markup-strip passes, applied in order: script/style/comment BLOCKS
    * die whole (their text content is code, not prose — keeping it is the
    * classic boilerplate bug), then any remaining tag becomes a space.
    * RE2-safe by construction (non-greedy + `(?s)` only, no lookaround/
    * backrefs), so the identical patterns replay in DuckDB for the
    * oracle. Shared with [[markupOracleExpr]].
    */
  val MarkupPatterns: Seq[(String, String)] = Seq(
    "(?s)<script[^>]*>.*?</script>" -> " ",
    "(?s)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]+>" -> " ")

  /** Entity decodes, applied AFTER tag removal (a decoded `&lt;` must not
    * re-enter the tag stripper — single-pass, like real WET extractors)
    * and with `&amp;` LAST (else `&amp;lt;` double-decodes to `<`).
    */
  val EntityDecodes: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** HTML/markup → text extraction (the WET step of web-corpus curation,
    * upstream of every quality signal in this file): strip script/style/
    * comment blocks, flatten tags to spaces, decode the common entities,
    * collapse runs of `[ \t\n\r]` to one space, trim. Pure scan-side
    * regexp chain — codegen'd, zero shuffle, engine-portable. NOT a
    * parser: malformed nesting degrades to over-stripping a block, the
    * standard trade every regexp-based extractor makes.
    */
  def stripMarkup(html: Column): Column = {
    val noTags = MarkupPatterns.foldLeft(html) { case (c, (p, r)) =>
      regexp_replace(c, p, r) }
    val decoded = EntityDecodes.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(e), r) }
    trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
  }

  /** First `<title>` content, raw (entities left as written — titles feed
    * metadata, not the training text); empty string when absent.
    */
  def extractTitle(html: Column): Column =
    regexp_extract(html, "(?s)<title[^>]*>(.*?)</title>", 1)

  /** DuckDB replay of [[stripMarkup]] over `colSql` — the same pattern
    * lists folded in the same order (`regexp_replace(..., 'g')` for the
    * global semantics Spark applies by default; entities as plain
    * `replace`, which is what `Pattern.quote` reduces them to).
    */
  def markupOracleExpr(colSql: String): String = {
    def q(s: String) = s.replace("'", "''")
    val noTags = MarkupPatterns.foldLeft(colSql) { case (acc, (p, r)) =>
      s"regexp_replace($acc, '${q(p)}', '$r', 'g')" }
    val decoded = EntityDecodes.foldLeft(noTags) { case (acc, (e, r)) =>
      s"replace($acc, '${q(e)}', '${q(r)}')" }
    s"trim(regexp_replace($decoded, '[ \\t\\n\\r]+', ' ', 'g'))"
  }

  /** Character-trigram marker profiles for the language-ID heuristic.
    * Public-knowledge high-frequency trigrams per language; the score of a
    * language is how many of its markers occur in the lowercased text.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "ing", "and", "ion", "tio"),
    "de" -> Seq("der", "ein", "sch", "ich", "und"),
    "fr" -> Seq("les", "ent", "que", "des", "ait"),
    "es" -> Seq("que", "los", "ado", "ión", "nte"),
    "zh" -> Seq("的", "是", "了", "在", "不"))

  /** N-gram language-ID heuristic: argmax over marker-trigram hit counts,
    * ties broken by language code; "und" (undetermined) when nothing hits.
    * Pure expression: per-language `regexp_count` sums → array_max over
    * (score, lang) structs.
    */
  def langId(text: Column, profiles: Seq[(String, Seq[String])] = langProfiles): Column = {
    val low = lower(text)
    val scored = profiles.map { case (lang, markers) =>
      val score = markers.map(m =>
        regexp_count(low, lit(java.util.regex.Pattern.quote(m)))).reduce(_ + _)
      struct(score.as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Syllable count via the standard vowel-group heuristic (each maximal
    * run of `[aeiouy]` ≈ one syllable — the public approximation every
    * readability library uses when no pronunciation dictionary is loaded).
    * Computed as a length delta: collapsing each group to one char keeps
    * exactly one char per group, deleting the groups keeps zero, so
    * `len(collapsed) − len(deleted)` IS the group count — two regexp
    * passes, no explode, engine-portable (the DuckDB oracle runs the
    * identical algebra).
    */
  def syllableCount(text: Column): Column = {
    val low = lower(text)
    (length(regexp_replace(low, "[aeiouy]+", "V")) -
      length(regexp_replace(low, "[aeiouy]+", ""))).cast("long")
  }

  /** Sentence count: maximal `[.!?]+` runs, floored at 1 so fragment-only
    * documents (no terminal punctuation) count as one sentence instead of
    * dividing by zero downstream.
    */
  def sentenceCount(text: Column): Column =
    greatest(regexp_count(text, lit("[.!?]+")), lit(1)).cast("long")

  /** Flesch reading-ease score (Flesch 1948; public formula:
    * `206.835 − 1.015·words/sentences − 84.6·syllables/words`), with
    * [[syllableCount]]'s vowel-group heuristic and [[sentenceCount]]'s
    * punctuation-run sentences. Quantized to 4 decimals through the
    * engine-portable `round(x·10⁴)/10⁴` contract (the arithmetic is fixed
    * left-associated double IEEE — identical in any engine — and the
    * quantization keeps the printed value hash-stable). Higher = easier;
    * standard English prose lands ~30–70.
    */
  def fleschReadingEase(text: Column): Column = {
    val w = tokenCount(text).cast("double")
    val s = sentenceCount(text).cast("double")
    val syl = syllableCount(text).cast("double")
    round((lit(206.835) - lit(1.015) * w / s - lit(84.6) * syl / w) *
      lit(1e4)) / lit(1e4)
  }

  /** The 26 lowercase letters + space — [[charEntropy]]'s symbol classes
    * (everything else folds into one "other" class). Shared with the
    * DuckDB oracle generator so both engines count the same alphabet.
    */
  val EntropyClasses: Seq[String] = ('a' to 'z').map(_.toString) :+ " "

  /** Shannon entropy (nats) of the character-class distribution — the
    * classic gibberish/random-string detector: natural text lands ~2.4–3.0
    * nats over letters+space, uniform-random strings near ln(27) ≈ 3.3,
    * single-char spam near 0. All 28 class counts come from ONE native
    * code-point pass ([[CharClassCounts]], spec-pinned equal to the
    * declarative `len(s) − len(s minus the char)` delta per class).
    *
    * Float contract: each `ln(p)` is quantized to 1e-6 and weighted by the
    * INTEGER class count, so the sum is an exact long (order-free,
    * partitioning-invariant); only the final normalization divides in
    * doubles, then quantizes to 1e-6 — the discipline q48/q94/q98 pin for
    * cross-engine log replay.
    */
  def charEntropy(text: Column): Column = {
    val low = lower(text)
    val len = length(low).cast("long")
    // all 28 counts in ONE native code-point pass (spec-pinned equal to
    // the 27-translate length-delta form, which costs ~80 string passes
    // once the guard/weight/remainder references multiply it out)
    val cnts = org.apache.spark.sql.GraftShim.column(
      CharClassCounts(org.apache.spark.sql.GraftShim.expression(low)))
    val s6 = aggregate(
      transform(cnts, cnt =>
        when(cnt > 0,
          cnt * round(log(cnt.cast("double") / len.cast("double")) * 1e6)
            .cast("long"))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    when(len > 0, round(-s6.cast("double") / len.cast("double")) / 1e6)
      .otherwise(lit(0.0))
  }
}
