package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, portable hashing, language-ID heuristics, quality
  * scoring, fingerprinting. All are built from codegen'd built-in
  * functions (no UDFs), so they stay inside whole-stage codegen and
  * push down/prune like any other Catalyst expression.
  *
  * Portability contract: `hash60` is reproducible in any engine with
  * `md5()` (first 15 hex chars of the MD5 as a base-16 integer → fits a
  * signed 64-bit), which is what the DuckDB oracles use.
  */
object TextFunctions {

  /** 60-bit stable content hash: first 15 hex digits of md5, as long. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Same hash computed driver-side (for plan-time constants such as
    * LSH hyperplanes — guaranteed equal to [[hash60]] output). */
  def hash60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
    val hex = d.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Whitespace tokens of the lowercased text. Leading/trailing
    * whitespace is trimmed and empty tokens are dropped, so blank text
    * yields an empty array (not `[""]`) and `"  hello"` tokenizes the
    * same as `"hello"` — the bag-of-words identity dedup relies on. */
  def tokens(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)

  /** Word `n`-grams (shingles) of the token array; empty when there are
    * fewer than `n` tokens.
    *
    * Implementation note: built by zipping `n` shifted `slice`s of the
    * token array rather than indexing `element_at(toks, j+k)` inside a
    * `transform` lambda. Higher-order functions evaluate interpreted
    * (no codegen), and a lambda-body reference to `toks` re-evaluates
    * the whole upstream expression — for `toks = tokens(text)` that
    * meant one regex split PER ELEMENT (~3·|shingles| splits per row,
    * measured 13 s for 5k docs). The zip form evaluates each array
    * argument once per row: ~7 splits, >10× faster, identical output. */
  def shingles(toks: Column, n: Int): Column = {
    val m = size(toks) - (n - 1) // number of shingles
    val grams = (2 to n).foldLeft(slice(toks, lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), m), (a, b) => concat(a, lit(" "), b))
    }
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Number of whitespace-delimited tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword unit count: alpha runs, digit runs, and isolated
    * punctuation each count as one unit. */
  def bpeishCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Occurrences of `word` as a whole word. Plain alphanumeric words
    * use `\b` boundaries (kept RE2-compatible for the DuckDB oracles);
    * words containing metacharacters (e.g. "c++") are regex-quoted and
    * delimited by lookarounds, since a trailing `\b` after a non-word
    * character can never match. */
  def wordCount(text: Column, word: String): Column =
    if (word.matches("[A-Za-z0-9_]+"))
      regexp_count(lower(text), lit("\\b" + word + "\\b"))
    else
      regexp_count(lower(text), lit("(?<!\\w)\\Q" + word + "\\E(?!\\w)"))

  /** Language-marker scores → predicted language. The marker sets are a
    * classic stopword heuristic; deterministic and engine-portable. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "das"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "que"),
    "zh" -> Seq("de5", "shi4", "le5")) // romanized placeholders

  /** Total occurrences of any of `words` as whole words — ONE regex
    * alternation pass over the text, not one pass per word. Equal to
    * the sum of the individual [[wordCount]]s: `\b`-delimited plain
    * words cannot produce overlapping matches. */
  def wordsCount(text: Column, words: Seq[String]): Column = {
    require(words.nonEmpty && words.forall(_.matches("[A-Za-z0-9_]+")),
      s"alternation needs plain words, got: ${words.mkString(",")}")
    regexp_count(lower(text), lit("\\b(" + words.mkString("|") + ")\\b"))
  }

  def langScore(text: Column, markers: Seq[String]): Column =
    wordsCount(text, markers)

  /** argmax over language scores with first-listed tie-break.
    *
    * Built as `element_at(langs, array_position(scores, max(scores)))`
    * rather than a when-chain: steady-state cost is equivalent (A/B'd
    * on 5k real docs, identical output), but the flat form halves
    * codegen compile time (1.9 s vs 3.7 s first run) and mirrors into
    * a much smaller oracle. `array_position` takes the FIRST index on
    * ties — the same first-listed-language priority the fold had. */
  def predictedLang(text: Column): Column =
    langFromScores(array(langMarkers.map { case (_, ms) => langScore(text, ms) }: _*))

  /** argmax over a precomputed [[langScore]] array — callers that also
    * need the scores materialize them once and pass the attribute. */
  def langFromScores(scores: Column): Column = {
    val langs = array(langMarkers.map(m => lit(m._1)): _*)
    val best = array_max(scores)
    when(best > 0,
      element_at(langs, array_position(scores, best).cast("int")))
      .otherwise(lit("und"))
  }

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]"))

  /** Stopword ratio over a fixed small stopword list. */
  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** One alternation pass over the text (see [[wordsCount]]). */
  def stopwordCount(text: Column): Column = wordsCount(text, stopwords)

  /** Ratio from PRE-MATERIALIZED counts — the tokenize-once path:
    * pipelines computing several stats per document should compute
    * `tokenCount`/`stopwordCount` once in a projection and derive
    * every downstream stat from the attributes, instead of letting
    * each stat re-scan the text. */
  def stopwordRatioFrom(nStops: Column, nTokens: Column): Column =
    nStops.cast("double") / greatest(nTokens, lit(1)).cast("double")

  def stopwordRatio(text: Column): Column =
    stopwordRatioFrom(stopwordCount(text), tokenCount(text))

  /** Composite quality score in [0,1] from pre-materialized counts:
    * favors mid-length docs with sane punctuation density and some
    * stopwords (fluent prose proxy). `len` is `length(text)`. */
  def qualityScoreFrom(stopRatio: Column, nTokens: Column, nPunct: Column,
                       len: Column): Column = {
    val lenScore = least(nTokens.cast("double") / lit(100.0), lit(1.0))
    val punctRatio = nPunct.cast("double") / greatest(len, lit(1)).cast("double")
    val punctScore = lit(1.0) - least(punctRatio * 5.0, lit(1.0))
    lit(0.4) * stopRatio + lit(0.3) * lenScore + lit(0.3) * punctScore
  }

  def qualityScore(text: Column): Column =
    qualityScoreFrom(stopwordRatio(text), tokenCount(text), punctCount(text),
      length(text))

  /** PII patterns for redaction, ordered so earlier replacements cannot
    * create or destroy later matches (emails first — a domain that
    * embeds an IPv4 shape like `bob@1.2.3.4.com` must redact as ONE
    * email, not leak an ip match; then ips; phone separators can't
    * collide with either).
    * Kept RE2-compatible (no lookarounds/backreferences) so the DuckDB
    * oracles run the byte-identical pattern. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"))

  /** Text with every [[piiPatterns]] occurrence replaced by its typed
    * placeholder — the standard pretraining PII scrub. One
    * `regexp_replace` pass per pattern class, all codegen'd. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (_, pat, rep)) =>
      regexp_replace(acc, lit(pat), lit(rep))
    }

  /** Match counts per PII class, in [[piiPatterns]] order. Class k is
    * counted on the text with classes 0..k-1 already replaced, so the
    * counts agree with what [[redactPii]] actually redacts (an
    * IPv4-shaped email host counts as the email it was redacted as,
    * not also as an ip). */
  def piiCounts(text: Column): Seq[Column] =
    piiPatterns.indices.map { k =>
      val (name, pat, _) = piiPatterns(k)
      val seen = piiPatterns.take(k).foldLeft(text) { case (acc, (_, p, r)) =>
        regexp_replace(acc, lit(p), lit(r))
      }
      regexp_count(seen, lit(pat)).cast("long").as(s"n_${name}s")
    }

  /** Content fingerprint: md5 over the sorted distinct token set —
    * order- and duplication-invariant (bag-of-words identity).
    * `sort_array` (codegen'd), not `array_sort` (a higher-order
    * function that evaluates interpreted) — identical ordering for
    * non-null string arrays. */
  def contentFingerprint(text: Column): Column =
    md5(concat_ws(" ", sort_array(array_distinct(tokens(text)))).cast("binary"))

  /** Prefix fingerprint: md5 of the first 64 chars (cheap rolling-hash
    * stand-in for locality-sensitive prefix dedup). */
  def prefixFingerprint(text: Column): Column =
    md5(substring(lower(text), 1, 64).cast("binary"))

  // ===== BPE primitives (bpe_train_merges / bpe_encode_tokens) ========

  /** BPE symbol markers (chr(1)/chr(2) in the DuckDB mirrors) — as
    * escapes so the source diffs as text. A symbol sequence is stored
    * as the single string `⟨s1⟩⟨s2⟩…` with each symbol wrapped in
    * SOH…STX, so merge application is ONE non-regex `replace`:
    * left-to-right and non-overlapping in Spark and DuckDB alike,
    * which IS the greedy BPE rule, and marker-delimited boundaries
    * make cross-symbol false matches impossible — PROVIDED symbol
    * text never contains the markers themselves (the trainer excludes
    * such tokens from its vocabulary; merged symbols then can't
    * reintroduce them). */
  val BpeSoh = "\u0001"
  val BpeStx = "\u0002"

  /** A word as its marked single-character symbol sequence. */
  def bpeMarked(w: Column): Column =
    concat(lit(BpeSoh), concat_ws(BpeStx + BpeSoh,
      transform(sequence(lit(1), length(w)), i => substr(w, i, lit(1)))),
      lit(BpeStx))

  /** Marked sequence → symbol array. */
  def bpeSymbols(m: Column): Column =
    split(substr(m, lit(2), length(m) - 2), BpeStx + BpeSoh)

  /** Apply ONE merge rule (a, b) → ab greedily left-to-right. */
  def bpeApply(m: Column, a: String, b: String): Column =
    replace(m, lit(BpeSoh + a + BpeStx + BpeSoh + b + BpeStx),
      lit(BpeSoh + a + b + BpeStx))
}
