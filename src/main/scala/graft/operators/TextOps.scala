package graft.operators

import graft.CacheLedger.Tracked
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (driver north star;
  * SURVEY.md §7.4). All pure column expressions — codegen'd, no UDFs, no
  * shuffles except where aggregation is inherent, so they stream through
  * 100 TB of documents at scan speed.
  */
object TextOps {

  /** The whitespace class used by every tokenizer in the engine. This is
    * RE2's \s ([\t\n\f\r ]), NOT Java's \s: Java additionally counts
    * vertical tab (0x0B), and RE2-based engines (DuckDB, Go, Rust regex)
    * do not — spelling the class out keeps tokenization byte-identical
    * across engines on any input, not just VT-free corpora.
    */
  val wsClass = "[ \\t\\n\\f\\r]"

  /** Whitespace tokens, empties dropped (split+filter keeps the semantics
    * identical to DuckDB's string_split_regex + list_filter for oracles).
    */
  def tokens(text: Column): Column =
    filter(split(text, wsClass + "+"), t => t =!= "")

  /** Native codegen'd byte scan — equivalence-fuzzed against
    * [[tokenCountHof]], the composable split-based formulation.
    */
  def tokenCount(text: Column): Column =
    graft.functions.TextSignalExpressions.token_cnt(text)

  def tokenCountHof(text: Column): Column = size(tokens(text))

  /** A BPE-ish proxy token count: whitespace tokens plus an extra token per
    * 4 chars of long words (subword pieces), the standard cheap estimator
    * for transformer-token budgeting. Native char-aware byte scan;
    * [[tokenCountBpeishHof]] is the composable reference.
    */
  def tokenCountBpeish(text: Column): Column =
    graft.functions.TextSignalExpressions.bpeish_cnt(text)

  def tokenCountBpeishHof(text: Column): Column =
    aggregate(tokens(text), lit(0),
      (acc, t) => acc + greatest(lit(1), ceil(length(t) / 4.0).cast("int")))

  private val punctClass = "[.,!?;:]"

  /** Punctuation character count (fixed class, mirrorable in any engine). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, punctClass, ""))

  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that")

  /** Native: count of tokens whose lowercase form is a stopword —
    * equivalence-fuzzed against [[stopwordCountHof]].
    */
  def stopwordCount(text: Column, stopwords: Seq[String] = englishStopwords): Column =
    graft.functions.TextSignalExpressions.token_hit_cnt(text, stopwords)

  def stopwordCountHof(text: Column, stopwords: Seq[String] = englishStopwords): Column =
    // lowercase the lexicon too: the native path lowercases its word list
    // at construction, and the two formulations must agree for ANY caller
    size(filter(tokens(lower(text)), t => t.isin(stopwords.map(_.toLowerCase): _*)))

  /** Quality signals per document: char/token counts, mean token length,
    * punctuation + stopword ratios, and a composite [0,1] score.
    * Heuristics follow the C4/Gopher-style cheap filters from the public
    * literature; the composite is a deterministic affine mix so it can be
    * oracle-checked.
    *
    * Every signal is a NATIVE codegen'd byte scan (TextSignalExpressions)
    * — no token arrays, no interpreted per-token lambdas; at 100 TB this
    * pass is scan-bound and the old HOF chain (two materialized token
    * arrays + an interpreted `filter` per row) was the bottleneck.
    * `length(t) − ws_cnt(t)` equals the old
    * `length(regexp_replace(t, \s+, ''))` because the ws class is ASCII.
    */
  def quality(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import graft.functions.TextSignalExpressions._
    val t = col(textCol)
    val nToks = token_cnt(t)
    df.select(
      col(idCol),
      length(t).as("n_chars"),
      nToks.as("n_tokens"),
      round((length(t) - ws_cnt(t)).cast("double") /
        greatest(nToks, lit(1)), 4).as("mean_token_len"),
      round(punct_cnt(t).cast("double") / greatest(length(t), lit(1)), 6).as("punct_ratio"),
      round(token_hit_cnt(t, englishStopwords).cast("double") /
        greatest(nToks, lit(1)), 6).as("stopword_ratio"))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with a sane
    * stopword rate and low punctuation density.
    */
  def qualityScore(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val q = quality(df, textCol, idCol)
    q.select(col(idCol),
      round(
        least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.4 +
        least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.4 +
        (lit(1.0) - least(col("punct_ratio") * 10.0, lit(1.0))) * 0.2,
        6).as("quality"))
  }

  /** [[qualityScore]]'s composite as an APPENDED column, keeping every
    * input column — the shape a curation pipeline needs (score, then
    * filter, then keep using the text/metadata downstream) without a
    * self-join back onto the corpus. Same arithmetic as qualityScore
    * (ratios rounded to 6dp before the mix, composite rounded to 6dp),
    * so the two agree bit-for-bit. `tokenCountCol` additionally exposes
    * the token count the score already paid for — downstream consumers
    * that re-ran `tokenCount` were re-splitting every document (HOFs
    * don't CSE, and neither do separate projections).
    */
  def withQuality(df: DataFrame, textCol: String = "text",
                  outCol: String = "quality",
                  tokenCountCol: Option[String] = None): DataFrame = {
    import graft.functions.TextSignalExpressions._
    val t = col(textCol)
    val nToks = token_cnt(t)
    val punct = round(punct_cnt(t).cast("double") / greatest(length(t), lit(1)), 6)
    val stop = round(token_hit_cnt(t, englishStopwords).cast("double") /
      greatest(nToks, lit(1)), 6)
    val scored = df.withColumn(outCol, round(
        least(nToks.cast("double") / 100.0, lit(1.0)) * 0.4 +
        least(stop * 5.0, lit(1.0)) * 0.4 +
        (lit(1.0) - least(punct * 10.0, lit(1.0))) * 0.2, 6))
    tokenCountCol.fold(scored)(c => scored.withColumn(c, nToks))
  }

  /** Tiny stopword lexicons for the n-gram-free language-ID heuristic. */
  val langLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that", "for", "it"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ich", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "est", "que", "dans"),
    "es" -> Seq("el", "los", "las", "y", "que", "de", "un", "una", "es", "en"))

  /** Language ID: argmax of per-language stopword hits (ties and zero hits →
    * "unk"). A real system would use char n-gram profiles; the hit-count
    * heuristic is deterministic, SQL-expressible, and O(tokens).
    */
  def langId(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // one native byte pass per lexicon — no token-array materialization,
    // no interpreted per-token lambdas (4 lexicons × every token was the
    // old cost)
    val hits = langLexicons.map { case (lang, lex) =>
      graft.functions.TextSignalExpressions.token_hit_cnt(col(textCol), lex).as(s"h_$lang")
    }
    val withHits = df.select(col(idCol) +: hits: _*)
    val best = langLexicons.map { case (lang, _) => struct(col(s"h_$lang").as("h"), lit(lang).as("l")) }
    // argmax by (hits, then FIXED lexicon order en>de>fr>es via greatest's
    // left-bias? no — greatest on structs compares lexicographically, ties on
    // h fall to language string; deterministic either way)
    withHits.select(col(idCol),
      when(greatest(best: _*).getField("h") === 0, lit("unk"))
        .otherwise(greatest(best: _*).getField("l")).as("lang"))
  }

  /** Char-n-gram language ID — the REAL algorithm above the [[langId]]
    * stopword heuristic: Cavnar–Trenkle 1994 rank-profile classification.
    * Train: each language's top-`k` char n-grams ranked by
    * (count desc, gram asc) — a MODEL table, ≤ languages×k rows. Classify:
    * each doc's own top-`k` gram ranks compared against every profile by
    * out-of-place distance Σ|doc_rank − profile_rank|, a gram absent from
    * a profile costing the maximum `k`; least distance wins (ties: lang
    * asc). Everything is exact integer arithmetic over deterministic
    * ranks, so the DuckDB oracle matches bit-for-bit.
    *
    * Scale shape: the profile table broadcasts (bounded model parameters,
    * the quantizer/centroid precedent — NOT corpus-scale); doc grams are
    * one explode + a per-doc window (doc_id is high-cardinality, each
    * task ranks one doc's ≤ chars grams); per-(doc, lang) aggregates are
    * bounded by the language count. A language with ZERO gram overlap can
    * never beat one with any match (every unmatched gram costs exactly k,
    * every matched one < k), so the no-match fallback to 'unk' is exact,
    * not an approximation — no doc×language cross join exists anywhere.
    */
  def langIdNgram(docs: DataFrame, train: DataFrame, n: Int = 3, k: Int = 300,
                  textCol: String = "text", idCol: String = "doc_id",
                  langCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1 && k >= 1, s"langIdNgram needs n>=1, k>=1 (got n=$n k=$k)")
    // the lowered text is hoisted into its OWN projection before the
    // explode: inlining lower() into the transform lambda re-evaluates
    // it per GRAM (O(len²) per doc — measured 10.4s → 3.4s at sf0.1)
    def grams(s: Column): Column =
      // guard, not step: Spark's sequence THROWS on 1-to-0 boundaries
      // (it never returns empty), so sub-n texts short-circuit here
      when(length(s) >= n,
        transform(sequence(lit(1), length(s) - (n - 1)),
          i => substring(s, i, lit(n))))
        .otherwise(array().cast("array<string>"))
    val profile = train
      .select(col(langCol).as("lang"), lower(col(textCol)).as("__graft_s"))
      .select(col("lang"), explode(grams(col("__graft_s"))).as("g"))
      .groupBy("lang", "g").agg(count(lit(1)).as("c"))
      .withColumn("pr", row_number().over(
        Window.partitionBy("lang").orderBy(col("c").desc, col("g").asc)))
      .filter(col("pr") <= k).select(col("lang"), col("g"), col("pr"))
    // Doc side (r16): the per-doc top-k rank table is computed MAP-SIDE —
    // run-length-encode the SORTED gram array and keep the k best
    // (count desc, gram asc) entries per row, encoded as struct(nc=-count,
    // g) so array_sort's natural struct order IS the rank order. This
    // removes the corpus-side explode → hash shuffle → window sort (the
    // r15 bench's #1 cost: every doc's len×n-char gram strings shuffled
    // TWICE) and the kept-count aggregate + join (kept == size of the
    // sliced array). Ranks and tie order are bit-identical to the window
    // formulation — `get` is 0-based and null on out-of-bounds (ANSI-safe
    // at the run boundaries), and each array stages in its OWN projection
    // so nothing non-cheap is duplicated (the SitemapOps codegen lesson).
    val dg = docs
      .select(col(idCol), lower(col(textCol)).as("__graft_s"))
      .select(col(idCol), array_sort(grams(col("__graft_s"))).as("__graft_sorted"))
      .select(col(idCol), col("__graft_sorted"),
        when(size(col("__graft_sorted")) > 0,
          sequence(lit(0), size(col("__graft_sorted")) - 1))
          .otherwise(array().cast("array<int>")).as("__graft_idx"))
      .select(col(idCol), col("__graft_sorted"),
        filter(col("__graft_idx"), i => (i === 0) ||
          get(col("__graft_sorted"), i) =!= get(col("__graft_sorted"), i - 1))
          .as("__graft_starts"),
        filter(col("__graft_idx"), i => (i === size(col("__graft_sorted")) - 1) ||
          get(col("__graft_sorted"), i) =!= get(col("__graft_sorted"), i + 1))
          .as("__graft_ends"))
      .select(col(idCol),
        zip_with(col("__graft_starts"), col("__graft_ends"), (st, en) =>
          struct((st - en - 1).as("nc"), get(col("__graft_sorted"), st).as("g")))
          .as("__graft_entries"))
      .select(col(idCol), slice(array_sort(col("__graft_entries")), 1, k).as("__graft_tk"))
      .select(col(idCol), size(col("__graft_tk")).as("kept"),
        posexplode(col("__graft_tk")).as(Seq("__graft_p", "__graft_e")))
      .select(col(idCol), col("kept"),
        col("__graft_e").getField("g").as("g"), (col("__graft_p") + 1).as("dr"))
    val matched = dg.join(broadcast(profile), Seq("g"))
      .groupBy(idCol, "lang")
      .agg(sum(abs(col("dr") - col("pr"))).as("sum_abs"),
        count(lit(1)).as("n_match"), first(col("kept")).as("kept"))
    val dist = matched.select(col(idCol), col("lang"),
      (col("sum_abs") + (col("kept") - col("n_match")) * lit(k.toLong))
        .as("distance"))
    // best language per doc as a partial-aggregatable min_by (ties:
    // distance asc, lang asc — identical to the old rank-1 window)
    val best = dist.groupBy(idCol)
      .agg(min_by(struct(col("lang"), col("distance")),
        struct(col("distance"), col("lang"))).as("__graft_b"))
      .select(col(idCol), col("__graft_b").getField("lang").as("lang_pred"),
        col("__graft_b").getField("distance").as("distance"))
    docs.select(col(idCol))
      .join(best.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("lang_pred"), lit("unk")).as("lang_pred"),
        coalesce(col("distance"), lit(-1L)).as("distance"))
  }

  /** Default per-language sample corpus for [[langIdNgramDefault]] —
    * shipped as a resource (the PSL precedent) so the char-n-gram
    * classifier works out of the box. Samples are PUBLIC text: UDHR
    * Article 1 (public domain, the canonical language-ID sample) plus a
    * few everyday sentences per language. `(lang, sample)` rows; ~300
    * chars each — enough for distinctive trigram rank profiles, tiny
    * enough that the trained profile table stays a broadcast model.
    */
  lazy val defaultLangSamples: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft_lang_samples.tsv")
    require(in != null, "graft_lang_samples.tsv missing from resources")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val t = l.indexOf('\t')
        (l.substring(0, t), l.substring(t + 1))
      }.toVector
    finally in.close()
  }

  /** [[langIdNgram]] with the shipped [[defaultLangSamples]] profiles —
    * no caller-supplied training frame needed. The training side is a
    * LocalTableScan over the ≤10-row sample table; everything downstream
    * is the same exact-integer rank-profile pipeline.
    */
  def langIdNgramDefault(docs: DataFrame, n: Int = 3, k: Int = 300,
                         textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    langIdNgram(docs, defaultLangSamples.toDF("lang", "text"), n, k, textCol, idCol)
  }

  /** Document fingerprint: md5 of the normalized text (lowercase, strip
    * non-alphanumerics, collapse whitespace) — the exact-dedup key that is
    * robust to formatting noise. Portable across engines (md5 is md5).
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")))

  def fingerprints(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))

  /** Within-document repetition: 1 − distinct/total word n-grams — the
    * Gopher-style repetition filter (Rae et al. 2021, §A.1.1): template
    * and spam docs that survive exact dedup show up as high in-doc n-gram
    * repetition. Distinct count rides the native hashed-shingle set (same
    * hash-identity argument as the dedup family: a 64-bit collision
    * inside one doc is ~2⁻⁵⁷); total is arithmetic on the token count.
    * Pure column expressions — scan speed, no shuffle.
    */
  def repetitionRatio(df: DataFrame, n: Int = 3,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val total = greatest(tokenCount(col(textCol)) - (n - 1), lit(0))
    val nDistinct = size(graft.functions.SketchExpressions.hashed_shingles(col(textCol), n))
    df.select(col(idCol),
      total.cast("long").as("n_ngrams"),
      when(total > 0,
        round(lit(1.0) - nDistinct.cast("double") / total, 6)).otherwise(lit(0.0))
        .as("repetition"))
  }

  /** Corpus vocabulary head: the k most frequent lowercased tokens — the
    * seed of tokenizer/vocab construction and stopword mining. One explode
    * feeding one hash-shuffle aggregation of (token, count) pairs with
    * map-side partial aggregation; the top-k is a TakeOrdered, not a full
    * sort. At 100 TB this is the canonical word-count shape.
    */
  def vocabHead(df: DataFrame, k: Int = 20, textCol: String = "text"): DataFrame =
    df.select(explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Corpus bigram head — the k most frequent ADJACENT token pairs
    * (count desc, pair asc): the first iteration of BPE-style merge
    * ranking, whose inner loop is exactly a count-and-rank over adjacent
    * pair frequencies. Same scale shape as [[vocabHead]] — a windowed
    * pair fan-out at the scan stage, two-phase agg, TakeOrdered k — so
    * the only global work is the k-row final heap.
    */
  def bigramHead(df: DataFrame, k: Int = 20, textCol: String = "text"): DataFrame = {
    val t = col("__bg_toks")
    df.select(tokens(lower(col(textCol))).as("__bg_toks"))
      .filter(size(t) >= 2)
      .select(explode(transform(sequence(lit(0), size(t) - 2),
        i => concat_ws(" ", get(t, i), get(t, i + 1)))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(k)
  }

  /** Regex masks for the PII classes every public cleanup recipe strips
    * (C4/Dolma-style): emails, then IPv4 (before phone — digit runs with
    * separators overlap), then SSN-shaped ids, then NANP-ish phone
    * numbers. Masks are FIXED tokens so redacted text stays deterministic
    * — fingerprints and dedup keys computed after redaction are stable
    * across runs and engines.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("""\b(?:\d{1,3}\.){3}\d{1,3}\b""", "<IP>"),
    ("""\b\d{3}-\d{2}-\d{4}\b""", "<SSN>"),
    // the \b applies to the digit-led alternative only: a word boundary
    // can't sit between two non-word chars, so "(415)" needs its own arm
    ("""(?:\b(?:\+?\d{1,2}[ .-]?)?\d{3}|\(\d{3}\))[ .-]?\d{3}[ .-]?\d{4}\b""", "<PHONE>"))

  /** Apply every PII mask in order — pure column expression chain, scan
    * speed, no shuffle.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, m)) => regexp_replace(c, p, m) }

  /** Redacted corpus plus a per-class match count (the audit trail a
    * pipeline logs before dropping the originals).
    */
  def redact(df: DataFrame, textCol: String = "text"): DataFrame = {
    val withCounts = piiPatterns.foldLeft(df) { case (acc, (p, m)) =>
      acc.withColumn(s"n_${m.stripPrefix("<").stripSuffix(">").toLowerCase}",
        regexp_count(col(textCol), lit(p)))
    }
    withCounts.withColumn(textCol, redactPii(col(textCol)))
  }

  /** HTML → text (r13) — the step BEFORE everything else in a web-crawl
    * pipeline (the C4/Dolma extraction stage, simplified to a
    * deterministic contract both engines can mirror): script/style
    * blocks and comments are removed whole, block-level tags become
    * newlines (paragraph structure survives for the chunker), every
    * remaining tag becomes a space, the six universal entities decode
    * (&amp; LAST, so "&amp;lt;" correctly yields a literal "&lt;"), and
    * whitespace normalizes — runs of spaces collapse, newline runs
    * collapse to one, ends trim. Pure column expression chain: scan
    * speed, no shuffle, no UDF. Every pattern is RE2-compatible (no
    * backreferences or lookarounds) so a DuckDB oracle can replay the
    * chain op-for-op. Unclosed trailing tags (no '>') are text by this
    * contract; a literal '<' in well-formed HTML arrives as &lt; and
    * round-trips.
    */
  val htmlStripStages: Seq[(String, String)] = Seq(
    ("(?is)<script[^>]*>.*?</script>", " "),
    ("(?is)<style[^>]*>.*?</style>", " "),
    ("(?s)<!--.*?-->", " "),
    ("(?i)</?(p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|blockquote)(\\s[^>]*)?/?>", "\n"),
    ("<[^>]+>", " "),
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
    ("[ \\t\\x0B\\f\\r]+", " "),
    ("\\s*\\n\\s*", "\n"),
    // edge newlines: trim() (both engines) removes only spaces
    ("^\\n+|\\n+$", ""))

  def stripHtml(html: Column): Column =
    trim(htmlStripStages.foldLeft(html) {
      case (c, (p, r)) => regexp_replace(c, p, r) })

  /** Extracted text plus the audit statistics a crawl pipeline logs:
    * total tag count, anchor count (the link-density numerator
    * boilerplate heuristics run on) and script/style block count — all
    * counted on the RAW html before stripping.
    */
  def htmlToText(df: DataFrame, htmlCol: String = "html",
                 idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol),
      regexp_count(col(htmlCol), lit("<[^>]+>")).as("n_tags"),
      regexp_count(col(htmlCol), lit("(?i)<a[\\s>]")).as("n_links"),
      regexp_count(col(htmlCol), lit("(?is)<(script|style)[^>]*>")).as("n_blocks"),
      stripHtml(col(htmlCol)).as("text"))

  /** Unicode NFC — native codegen'd expression (UnicodeExpressions):
    * visually-identical strings with different codepoint sequences must
    * hash/dedup/tokenize identically before any content-addressed stage.
    */
  def nfc(text: Column): Column =
    graft.functions.UnicodeExpressions.unicode_normalize(text, "NFC")

  /** NFKC — compatibility form (ligatures/width folds too); the right
    * form before tokenization when lexical equivalence matters more than
    * round-trip fidelity.
    */
  def nfkc(text: Column): Column =
    graft.functions.UnicodeExpressions.unicode_normalize(text, "NFKC")

  /** The pre-tokenization cleanup chain applied AFTER NFC by
    * [[normalizeText]], published as (pattern, replacement) stages so an
    * oracle replays it verbatim (the htmlStripStages pattern): newline
    * canonicalization (CRLF/CR → LF), then C0-control + DEL strip — tab
    * and LF survive, they carry structure.
    */
  val cleanupStages: Seq[(String, String)] = Seq(
    ("\\r\\n?", "\n"),
    ("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""))

  /** Canonical text for content-addressed stages: NFC + the cleanup
    * chain, plus the audit columns a curation run logs (codepoint counts
    * in/out, changed flag). Scan-speed: the NFC expression takes its
    * ASCII/quick-check fast paths on the (typical) majority of rows.
    */
  def normalizeText(df: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val raw = col(textCol)
    val out = cleanupStages.foldLeft(nfc(raw)) {
      case (c, (p, r)) => regexp_replace(c, p, r) }
    df.select(col(idCol), out.as("text"),
      length(raw).as("n_chars_in"), length(out).as("n_chars_out"),
      (out =!= raw).as("changed"))
  }

  /** Fixed-size overlapping token chunks — the pre-packing step of a
    * training pipeline (long documents become maxTokens-token windows
    * overlapping by `overlap`). Chunk starts are 0, step, 2·step, … with
    * step = maxTokens − overlap, while start < n_tokens; the final chunk
    * may be short (no tail padding — packing handles that downstream).
    * Empty docs produce no chunks. One explode per row, no shuffle — the
    * canonical scan-stage fan-out; at 100 TB output row count is
    * ~n_tokens/step per doc and each chunk carries only its own text.
    */
  def chunks(df: DataFrame, maxTokens: Int = 32, overlap: Int = 8,
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxTokens > overlap && overlap >= 0,
      s"need maxTokens > overlap >= 0, got $maxTokens/$overlap")
    val step = maxTokens - overlap
    val t = col("__toks")
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(t) > 0)
      .select(col(idCol), t,
        posexplode(sequence(lit(0), size(t) - 1, lit(step))).as(Seq("chunk_id", "__start")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        slice(t, col("__start") + 1, lit(maxTokens)).as("__c"))
      .select(col(idCol), col("chunk_id"),
        size(col("__c")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__c")).as("chunk"))
  }

  /** Sequence packing — the pre-training step right after [[chunks]]:
    * assign chunks to fixed token-budget packs by CONTIGUOUS greedy fill
    * under a deterministic global order. pack_id of a chunk is
    * `(running_tokens_before_it) DIV capacity`: packs fill in order, a
    * chunk that straddles a boundary belongs to the pack it started in
    * (so a pack's total is < capacity + max_chunk_tokens), and the
    * assignment is a pure function of the order — engine-mirrorable and
    * oracle-exact.
    *
    * Scale shape: the running token count is a corpus-GLOBAL prefix sum
    * — computed with [[Windowing.withRankAndRunningSum]] (empty key
    * set), NOT an unpartitioned window: the naive formulation funnels
    * every chunk through one task (the `Exchange SinglePartition` shape
    * PlanAuditSpec bans); the two-pass path is one range shuffle plus
    * the broadcast per-partition offsets.
    */
  def packChunks(chunks: DataFrame, capacityTokens: Long,
                 orderCols: Seq[Column], tokenCol: String = "n_tokens"): DataFrame = {
    require(capacityTokens > 0, s"capacity must be positive, got $capacityTokens")
    def free(stem: String): String = Iterator.from(0).map(i => s"$stem$i")
      .find(n => !chunks.columns.contains(n)).get
    val rn = free("__graft_rn")
    val cum = free("__graft_cum")
    Windowing.withRankAndRunningSum(chunks, Nil, orderCols, col(tokenCol), rn, cum)
      .withColumn("pack_id", expr(s"($cum - $tokenCol) DIV $capacityTokens"))
      .drop(rn, cum)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS algorithm): hash every char k-gram of the normalized text, then
    * keep the minimum hash of each sliding window of `w` consecutive
    * k-grams. Guarantees a shared fingerprint for any match of length
    * >= w+k-1 while sampling ~2/(w+1) of positions — the rolling-hash
    * fingerprint family for partial-overlap detection (quotes, boilerplate)
    * that whole-document hashing misses.
    *
    * Stages materialize the hash array before the window fan-out (HOFs
    * re-evaluate argument subtrees; see Dedup).
    */
  def winnowingFingerprints(df: DataFrame, k: Int = 8, w: Int = 4,
                            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""))
    df.select(col(idCol),
      graft.functions.SketchExpressions.winnowing(norm, k, w).as("fingerprints"))
  }

  /** Docs sharing >= minShared winnowing fingerprints — partial-overlap
    * candidates (explode + self-join on fingerprint, like the shingle
    * index but over the sampled hash set).
    *
    * Fingerprints appearing in more than `maxDocFreq` docs are DROPPED
    * before the join — they are corpus boilerplate, carry no overlap
    * signal, and are what makes an unfiltered fingerprint self-join
    * quadratic in the hottest key (a fingerprint shared by f docs costs
    * f²/2 join rows). This is the fingerprint analog of stopword removal
    * and bounds the join at maxDocFreq²/2 per fingerprint.
    */
  def winnowingOverlapPairs(df: DataFrame, minShared: Int, k: Int = 8, w: Int = 4,
                            maxDocFreq: Int = 50,
                            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // the (id, fp) index feeds the doc-frequency agg AND both self-join
    // sides — cached, the per-doc winnowing pass runs once instead of 3×
    // (the cache materializes inside the first action and is shared by the
    // sibling branches; at 100 TB this is the "build the inverted index
    // once" materialization any fingerprint join does)
    val fps = winnowingFingerprints(df, k, w, textCol, idCol)
      .select(col(idCol).as("id"), explode(col("fingerprints")).as("fp"))
      .trackedCache
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
      .select("fp")
    // the rare-fp list and the pruned index are both corpus-scale (one
    // row per rare fingerprint / per doc-fp) — pin the spillable
    // sort-merge joins; statistics elect a full broadcast at bench scale
    val pruned = fps.join(rare.hint("merge"), Seq("fp"))
    pruned.select(col("id").as("id_a"), col("fp"))
      .hint("merge")
      .join(pruned.select(col("id").as("id_b"), col("fp").as("fp_b")),
        col("fp") === col("fp_b") && col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      // cache before the global sort: the range sort's sampling pass
      // otherwise re-executes the pair-count narrow stage a second time
      .trackedCache
      .orderBy("id_a", "id_b")
  }

  /** Corpus "commonness" score: the mean GLOBAL frequency of a document's
    * token occurrences. Rare-token documents are OCR noise / gibberish;
    * ultra-common-token documents are boilerplate — the unigram cousin of
    * a perplexity filter, in exact rational arithmetic (per-occurrence
    * counts are longs, the per-doc sum is order-independent, ONE double
    * division rounds once) so the DuckDB oracle matches bit-for-bit —
    * a log-prob formulation would hinge on cross-libm `log` ulps.
    * Documents with zero tokens produce no row (explode of empty).
    *
    * Scale: the count table is |vocab| rows — hapax-heavy corpora make
    * that corpus-scale, so the frequency join pins `shuffle_hash` (slim
    * (token, count) build rows; the TPC-H slim-build arithmetic) rather
    * than risking an AQE broadcast of an unbounded derived table. The
    * token-sets frame is cached (ledger-tracked) because the explode
    * feeds both the count agg and the probe side.
    */
  def commonness(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    // the fixed OUTPUT names need the same collision discipline as the
    // internal ones: an idCol named like an output would yield duplicate
    // (ambiguous) columns in the result
    require(!Set("n_tokens", "mean_token_freq").contains(idCol),
      s"idCol '$idCol' collides with a commonness output column")
    // internal names dodge the caller's id column (the one input column
    // that survives the first projection) — same collision class the
    // free-name sweep fixed in Curation/Sampling
    def free(stem: String): String = Iterator.from(0).map(i => s"$stem$i")
      .find(n => n != idCol).get
    val (toks, tok, tf, sumTf) = (free("__graft_toks"), free("__graft_tok"),
      free("__graft_tf"), free("__graft_sumtf"))
    val sets = df.select(col(idCol), tokens(col(textCol)).as(toks))
      .trackedCache
    val ex = sets.select(col(idCol), explode(col(toks)).as(tok))
    val counts = ex.groupBy(tok).agg(count(lit(1)).as(tf))
    ex.join(counts.hint("shuffle_hash"), Seq(tok))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum(tf).as(sumTf))
      .select(col(idCol), col("n_tokens"),
        round(col(sumTf).cast("double") / col("n_tokens"), 6)
          .as("mean_token_freq"))
  }

  /** CCNet-style language-model quality score: per-doc mean negative
    * log-likelihood under an add-one-smoothed BIGRAM model trained on a
    * reference corpus — the classic "wiki-LM perplexity" filter (CCNet,
    * Wenzek et al. 2020) that ranks fluent text above gibberish far
    * better than token-count heuristics. p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V)
    * with V = |reference vocab|+1 (the OOV mass), so unseen bigrams and
    * unseen prefixes both score finitely.
    *
    * Determinism discipline: the `ln` lands inside the drift-report
    * nano-unit trick — each token contributes round(−ln(p)·1e9) as a
    * LONG, the per-doc sum is order-independent exact integer math, and
    * the one final double division rounds at 4dp. Outputs: `n_bigrams`,
    * `nll_nano` (exact), `mean_nll` (nats/token, 4dp; perplexity =
    * e^mean_nll, monotone in it — filters threshold either).
    *
    * Scale shape: TWO corpus scans (reference → counts, docs → bigrams),
    * two shuffle-hash joins against slim (bigram, count)/(prefix, count)
    * build rows — never broadcast (a 100 TB reference's bigram table is
    * corpus-scale), one per-doc aggregate. V is the single
    * driver-collected model parameter (O(1) row).
    *
    * The V pass IS a second reference scan, and removing it has now
    * been measured twice and reverted twice: r16 cached the token
    * ARRAYS (curated med 2.12→2.52s); r17 fused V into the bigram feed
    * by exploding (w1, next-or-null) pairs once and ledger-caching the
    * slim pair rows so bigram counts, prefix counts and distinct-w1 all
    * derive from one frame (q_text_lmscore med 0.78→0.92s, curated
    * wash, 7-sample same-window A/Bs) — at bench scale the cache
    * materialization barrier costs more than the extra codegen'd scan.
    * At 100 TB the trade flips on paper (a full second reference pass),
    * but both measured shapes lost here, so the two-scan form stands;
    * a deployment at that scale would precompute the model counts once
    * rather than per-training anyway.
    *
    * CONTRACT: documents with fewer than 2 tokens have no bigrams and
    * produce NO output row — a thresholding pipeline must decide their
    * fate explicitly (left-join and treat null mean_nll as reject is the
    * usual CCNet choice; an inner join silently drops them).
    */
  def lmScore(docs: DataFrame, ref: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    require(!Set("n_bigrams", "nll_nano", "mean_nll",
        "__graft_bg", "__graft_w1").contains(idCol),
      s"idCol '$idCol' collides with an lmScore output or internal column")
    def bigrams(df: DataFrame, keep: Seq[Column]): DataFrame = {
      val t = tokens(col(textCol))
      val n = size(t)
      df.select(keep :+ explode(zip_with(
          slice(t, lit(1), greatest(n - 1, lit(0))),
          slice(t, lit(2), greatest(n - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("__graft_bg"): _*)
    }
    val refBg = bigrams(ref, Seq.empty).trackedCache
    val big = refBg.groupBy("__graft_bg").agg(count(lit(1)).as("__graft_c2"))
    val pfx = refBg
      .select(substring_index(col("__graft_bg"), " ", 1).as("__graft_w1"))
      .groupBy("__graft_w1").agg(count(lit(1)).as("__graft_c1"))
    val v = ref.select(explode(tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t"))).first().getLong(0) + 1L
    bigrams(docs, Seq(col(idCol)))
      .withColumn("__graft_w1", substring_index(col("__graft_bg"), " ", 1))
      .join(big.hint("shuffle_hash"), Seq("__graft_bg"), "left")
      .join(pfx.hint("shuffle_hash"), Seq("__graft_w1"), "left")
      .select(col(idCol),
        round(-log((coalesce(col("__graft_c2"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("__graft_c1"), lit(0L)) + v).cast("double")) * 1e9)
          .cast("long").as("__graft_nll"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("__graft_nll").as("nll_nano"))
      .select(col(idCol), col("n_bigrams"), col("nll_nano"),
        round(col("nll_nano").cast("double") / 1e9 / col("n_bigrams"), 4)
          .as("mean_nll"))
  }

  /** Top-k SALIENT terms per document — the tf-idf shape in exact
    * rational arithmetic: salience = tf / df (the document's term count
    * over the term's corpus document frequency), which ranks identically
    * to tf·(N/df) and, unlike the log-idf form, is ONE double division
    * both engines compute bit-identically (a `log` would hinge on
    * cross-libm ulps). Ties break on the term string, so the per-doc
    * ordering is total and oracle-exact. The canonical "what is this
    * document about" / keyword-extraction primitive of a corpus pipeline.
    *
    * Scale shape: tf is one doc-term aggregate; df REUSES tf (tf rows
    * are already (doc, term)-distinct, so df = per-term row count of tf —
    * no second pass over the corpus, and tf is ledger-cached for the agg
    * + probe fan-out). The frequency join pins `shuffle_hash` (slim
    * (term, df) build rows, the commonness discipline); the top-k is a
    * per-doc window — doc_id is maximal-cardinality, so the rank
    * parallelizes perfectly and the rk filter compiles to a map-side
    * WindowGroupLimit.
    */
  def salientTerms(df: DataFrame, k: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"top-k must be positive, got $k")
    require(!Set("term", "tf", "df", "salience", "rk").contains(idCol),
      s"idCol '$idCol' collides with a salientTerms output column")
    val tf = df
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .trackedCache // feeds the df aggregate AND the join probe side
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol)
      .orderBy((col("tf").cast("double") / col("df")).desc, col("term").asc)
    tf.join(dfreq.hint("shuffle_hash"), Seq("term"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        round(col("tf").cast("double") / col("df"), 6).as("salience"),
        col("rk").cast("long").as("rk"))
  }

  /** Corpus heavy hitters via the Misra-Gries sketch
    * ([[graft.functions.FreqExpressions.freq_sketch]]): top-k terms from a
    * FIXED-SIZE mergeable summary — each scan task forwards ≤ `capacity`
    * counters however many tokens it saw, so the shuffle is a constant
    * instead of the term universe (the exact `salientTerms` df table is
    * corpus-vocabulary-sized; this is the tier that replaces it when the
    * vocabulary itself is too big to shuffle).
    *
    * With `capacity` above the stream's distinct-term count the summary
    * is exact (no decrement ever fires) and the output equals the exact
    * top-k — the oracle regime; under-capacity guarantees (presence above
    * n/capacity, undercount ≤ n/capacity) are property-tested in
    * `TextOpsSpec`.
    */
  def heavyHitters(df: DataFrame, capacity: Int, k: Int,
                   textCol: String = "text"): DataFrame = {
    require(k >= 1 && capacity >= k, s"need capacity >= k >= 1, got ($capacity, $k)")
    df.select(explode(tokens(lower(col(textCol)))).as("term"))
      .agg(graft.functions.FreqExpressions.freq_sketch(col("term"), capacity).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.term").as("term"), col("e.est").as("est"))
      .orderBy(col("est").desc, col("term").asc)
      .limit(k)
  }

  /** Per-source distribution drift: KL(P_source ‖ P_corpus) over a CAPPED
    * reference vocabulary (top-`vocabSize` corpus terms by frequency) plus
    * one OOV bucket, add-one smoothed — the corpus-assembly diagnostic
    * that flags a source whose token mix diverges from the blend (new
    * crawl snapshot drifting, a source gone spammy) before it trains.
    *
    * Capping the vocabulary is what makes the shape scale: the
    * distribution support is `vocabSize + 1` buckets BY CONFIGURATION, so
    * the per-source matrix is `#sources × (V+1)` however large the corpus
    * term universe grows (full-vocab KL would cross sources with a
    * corpus-dependent universe). The matrix cross broadcasts the
    * driver-collected vocab (a LocalTableScan, never a scan-bearing
    * subtree) against the per-source totals — the one sanctioned
    * nested-loop join outside the similarity query batch
    * (see PlanAuditSpec's allowlist).
    *
    * Determinism discipline: each bucket's contribution `p·ln(p/q)` is
    * rounded to nano units and summed as LONGS, so the cross-engine
    * float-sum-order problem disappears; corpus totals ride as driver
    * literals (the BM25 stats pattern — two 1-row collects).
    */
  def driftReport(df: DataFrame, vocabSize: Int = 24,
                  textCol: String = "text", groupCol: String = "source"): DataFrame =
    driftReportMetric(df, "kl", vocabSize, textCol, groupCol)

  /** [[driftReport]] generalized over the divergence: the same capped-
    * vocab + OOV smoothed matrix, with the per-bucket contribution picked
    * by `metric` —
    *  - `kl`:  p·ln(p/q)            (asymmetric; the default report)
    *  - `psi`: (p−q)·ln(p/q)        (population stability index — the
    *           model-monitoring standard; symmetric in p,q)
    *  - `jsd`: ½·(p·ln(p/m)+q·ln(q/m)), m=(p+q)/2  (Jensen-Shannon;
    *           symmetric AND bounded by ln 2 — comparable across sources)
    * All three share the nano-unit LONG-sum determinism discipline, so
    * each sits under the same exact DuckDB oracle shape as `kl`.
    */
  def driftReportMetric(df: DataFrame, metric: String, vocabSize: Int = 24,
                        textCol: String = "text", groupCol: String = "source"): DataFrame =
    driftFromTermCounts(
      df.select(col(groupCol).as("src"), explode(tokens(lower(col(textCol)))).as("term"))
        .groupBy("src", "term").agg(count(lit(1)).as("c")),
      metric, vocabSize, groupCol)

  /** The drift matrix from an ALREADY-AGGREGATED `(src, term, c)` counts
    * frame — the entry point the STREAMING corpus monitor feeds (running
    * counts accumulated as streaming state land here at termination);
    * [[driftReportMetric]] is the batch wrapper that builds the counts
    * from raw text. Counts are exact integers however the stream batched
    * them, so the output is bit-identical to the batch path.
    */
  def driftFromTermCounts(counts: DataFrame, metric: String, vocabSize: Int = 24,
                          groupCol: String = "source"): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    require(Set("kl", "psi", "jsd").contains(metric),
      s"unknown drift metric '$metric' (kl | psi | jsd)")
    require(!Set("n_tokens", "oov_tokens", metric).contains(groupCol),
      s"groupCol '$groupCol' collides with a driftReport output column")
    // idempotent re-aggregation: (a) tolerates partial/duplicated count
    // rows, (b) normalizes ANY input (memory-sink table, parquet
    // read-back) to the Aggregate-topped shape the downstream self-joins
    // resolve against — a bare relation leaf here trips Spark's
    // conflicting-reference resolution in the matrix join
    val cnt = counts
      .groupBy("src", "term").agg(sum("c").as("c"))
      .trackedCache // feeds corpus agg, source totals AND the matrix probe
    // the reference vocabulary is a MODEL TABLE: <= vocabSize rows by
    // construction, collected to the driver so the matrix cross
    // broadcasts a LocalTableScan, never a scan-bearing subtree (the
    // k-means-centroid / BPE-merge-list precedent)
    val topRows = cnt.groupBy("term").agg(sum("c").as("ct"))
      .orderBy(col("ct").desc, col("term").asc).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // smoothing buckets = REALIZED vocab + OOV (a corpus smaller than the
    // cap must not smooth over phantom buckets — Σp has to be exactly 1)
    val b = topRows.size + 1
    val nTotal = cnt.agg(sum("c")).collect()(0).getLong(0) // 1-row collect
    val topSum = topRows.map(_._2).sum
    val session = counts.sparkSession
    import session.implicits._
    val top = topRows.toDF("term", "ct")
    val st = cnt.groupBy("src").agg(sum("c").as("ns"))
    // contribution of one bucket with source count sc out of ns vs corpus
    // count cc out of nTotal, in deterministic nano-units
    def nano(sc: Column, ns: Column, cc: Column): Column = {
      val p = (sc + lit(1L)).cast("double") / (ns + lit(b.toLong))
      val q = (cc + lit(1L)).cast("double") / lit((nTotal + b).toDouble)
      val contrib = metric match {
        case "kl"  => p * log(p / q)
        case "psi" => (p - q) * log(p / q)
        case "jsd" =>
          val m = (p + q) / lit(2.0)
          (p * log(p / m) + q * log(q / m)) / lit(2.0)
      }
      round(contrib * lit(1e9), 0).cast("long")
    }
    val matrix = st.crossJoin(top)
      .join(cnt.hint("shuffle_hash").withColumnRenamed("c", "cst"),
        Seq("src", "term"), "left")
      .na.fill(0L, Seq("cst"))
    matrix
      .groupBy("src", "ns")
      .agg(sum(nano(col("cst"), col("ns"), col("ct"))).as("in_nano"),
        sum("cst").as("intop"))
      .select(col("src").as(groupCol),
        col("ns").as("n_tokens"),
        (col("ns") - col("intop")).as("oov_tokens"),
        round((col("in_nano") +
          nano(col("ns") - col("intop"), col("ns"), lit(nTotal - topSum)))
          .cast("double") / lit(1e9), 6).as(metric))
      .orderBy(groupCol)
  }

  /** Per-document n-gram novelty: the fraction of a document's DISTINCT
    * word n-grams that appear in NO other document (corpus df = 1) —
    * the dedup-adjacent diagnostic (novelty ≈ 0 flags templated /
    * near-duplicate content BEFORE pair finding; novelty ≈ 1 certifies
    * unique text). Shares the dedup family's hashed-shingle machinery
    * (`SketchExpressions.hashed_shingles`, distinct per doc); integer
    * counts + one rounded division keep the oracle exact. Documents
    * with < n tokens have no shingles and produce no row.
    *
    * Scale: same shape as [[commonness]] — df table is shingle-count
    * scale, join pinned `shuffle_hash`, shingle-sets frame
    * ledger-cached for the agg + probe fan-out.
    */
  def ngramNovelty(df: DataFrame, n: Int = 3, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(!Set("n_shingles", "n_novel", "novelty").contains(idCol),
      s"idCol '$idCol' collides with an ngramNovelty output column")
    def free(stem: String): String = Iterator.from(0).map(i => s"$stem$i")
      .find(nm => nm != idCol).get
    val (sh, shingle, dfreq) =
      (free("__graft_sh"), free("__graft_shingle"), free("__graft_df"))
    val sets = df.select(col(idCol),
        graft.functions.SketchExpressions.hashed_shingles(col(textCol), n).as(sh))
      .trackedCache
    val ex = sets.select(col(idCol), explode(col(sh)).as(shingle))
    val freq = ex.groupBy(shingle).agg(count(lit(1)).as(dfreq))
    ex.join(freq.hint("shuffle_hash"), Seq(shingle))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col(dfreq) === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col(idCol), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles"), 6)
          .as("novelty"))
  }

  /** The 8-word presence lexicon from the Gopher rules (Rae et al. 2021
    * §A1.1: "contains at least 2 of the following English words").
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality rules (Rae et al. 2021 §A1.1 — public
    * heuristics, the standard LLM-corpus pre-filter): each published rule
    * as a flag plus the conjunction `keep`, so a pipeline can both filter
    * AND explain every rejection. Thresholds are the paper's: 50–100k
    * words, mean word length 3–10, hash / ellipsis symbol-to-word ratios
    * ≤ 0.1, ≥ 80% words with an alphabetic character, ≥ 2 presence hits
    * on the 8-word lexicon, ≤ 90% bullet-started lines, ≤ 30%
    * ellipsis-ended lines.
    *
    * Every signal derives from exact integer counts; flags compare the
    * UNROUNDED quotients (the rank-window precedent — rounding only on
    * output), so the decision is bit-reproducible in any engine. One
    * scan, no shuffle, no UDF: token/line arrays and higher-order
    * filters, all codegen-friendly; at 100 TB this is a map-stage over
    * the corpus scan, and `keep` is a plain conjunction Catalyst can
    * push into the scan filter when used inline.
    */
  def gopherRules(df: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val outputNames = Set("n_words", "mean_word_len", "hash_ratio",
      "ellipsis_ratio", "alpha_frac", "stop_hits", "bullet_frac",
      "ellipsis_line_frac", "r_word_count", "r_mean_word_len", "r_hash",
      "r_ellipsis", "r_alpha", "r_stop", "r_bullet", "r_ellipsis_lines",
      "keep")
    require(!outputNames.contains(idCol),
      s"idCol '$idCol' collides with a gopherRules output column")
    import graft.functions.TextSignalExpressions._
    val t = col(textCol)
    val nW = token_cnt(t)
    val den = greatest(nW, lit(1)).cast("double")
    // non-whitespace chars / words — identical to quality()'s
    // mean_token_len (ws class is ASCII, so length − ws_cnt ≡ the
    // regex-stripped length the oracle computes)
    val mwl = (length(t) - ws_cnt(t)).cast("double") / den
    val hashRatio =
      (length(t) - length(translate(t, "#", ""))).cast("double") / den
    // '…' is one char; '...' counts non-overlapping left-to-right (regex
    // and literal replace agree on that)
    val ellRatio =
      ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / lit(3) +
        (length(t) - length(translate(t, "…", "")))).cast("double") / den
    val alphaFrac =
      size(filter(tokens(t), w => w.rlike("[A-Za-z]"))).cast("double") / den
    val lt = tokens(lower(t))
    val stopHits = gopherStopwords
      .map(s => array_contains(lt, s).cast("int")).reduce(_ + _).cast("long")
    val lines = split(t, "\n", -1)
    val nL = greatest(size(lines), lit(1)).cast("double")
    val bulletFrac = size(filter(lines, l =>
      ltrim(l).startsWith("-") || ltrim(l).startsWith("*") ||
        ltrim(l).startsWith("•"))).cast("double") / nL
    val ellLineFrac = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
      .cast("double") / nL
    val rWords = nW >= 50 && nW <= 100000
    val rMwl = mwl >= 3.0 && mwl <= 10.0
    val rHash = hashRatio <= 0.1
    val rEll = ellRatio <= 0.1
    val rAlpha = alphaFrac >= 0.8
    val rStop = stopHits >= 2
    val rBullet = bulletFrac <= 0.9
    val rEllLines = ellLineFrac <= 0.3
    df.select(col(idCol),
      nW.cast("long").as("n_words"),
      round(mwl, 4).as("mean_word_len"),
      round(hashRatio, 6).as("hash_ratio"),
      round(ellRatio, 6).as("ellipsis_ratio"),
      round(alphaFrac, 6).as("alpha_frac"),
      stopHits.as("stop_hits"),
      round(bulletFrac, 6).as("bullet_frac"),
      round(ellLineFrac, 6).as("ellipsis_line_frac"),
      rWords.as("r_word_count"),
      rMwl.as("r_mean_word_len"),
      rHash.as("r_hash"),
      rEll.as("r_ellipsis"),
      rAlpha.as("r_alpha"),
      rStop.as("r_stop"),
      rBullet.as("r_bullet"),
      rEllLines.as("r_ellipsis_lines"),
      (rWords && rMwl && rHash && rEll && rAlpha && rStop && rBullet &&
        rEllLines).as("keep"))
  }

  /** BM25 ranked retrieval (Robertson & Zaragoza 2009, "The Probabilistic
    * Relevance Framework: BM25 and Beyond") over the corpus for a fixed
    * query-term list — the lexical half of a retrieval pipeline next to
    * the vector half ([[graft.operators.Similarity]]), and the standard
    * relevance filter for "keep documents related to X" curation sweeps.
    *
    * Shape: corpus statistics (N, Σdl, per-term df) reduce to ONE scalar
    * row collected to the driver (model parameters, the z-order bounds
    * precedent — at 100 TB these come from a term-statistics table
    * maintained at ingest); idf weights become plan literals; per-doc
    * scoring is then a single codegen'd map over the scan (tf via
    * higher-order filter on the token array — no explode, no shuffle),
    * and the global top-k runs as a rank window that WindowGroupLimit
    * executes with per-partition partial limits (the O3 early-termination
    * path: k rows per partition shuffle, not the corpus).
    *
    * Determinism: scoring is fixed-order IEEE arithmetic mirrored
    * operand-for-operand by the oracle; ranking orders by the ROUNDED
    * score with a doc_id tiebreak, so rank agreement needs only 6dp
    * score agreement (Java and DuckDB `ln` may differ in the last ulp;
    * at 6dp on this frozen corpus they agree — oracle-checked).
    */
  def bm25(df: DataFrame, terms: Seq[String], k: Int = 50,
           k1: Double = 1.2, b: Double = 0.75,
           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32, s"${terms.size} query terms")
    require(terms.forall(t => t.nonEmpty && t == t.toLowerCase),
      "terms must be non-empty lowercase")
    require(terms.distinct.size == terms.size, s"duplicate terms in $terms")
    val outputNames = Set("n_tokens", "score", "rank") ++ terms.map("tf_" + _)
    require(!outputNames.contains(idCol),
      s"idCol '$idCol' collides with a bm25 output column")
    val toks = tokens(lower(col(textCol)))
    // one tiny reduce: N, Σdl, df per term — model parameters
    val statsRow = df.select(
      count(lit(1)).as("n") +:
        sum(size(toks)).as("sumdl") +:
        terms.map(t => sum(array_contains(toks, t).cast("long")).as(s"df_$t")): _*)
      .head()
    val n = statsRow.getLong(0)
    if (n == 0) { // typed empty frame, same schema as the populated path
      import org.apache.spark.sql.types._
      val fields = df.schema(idCol) +: (StructField("n_tokens", LongType) +:
        StructField("score", DoubleType) +:
        terms.map(t => StructField(s"tf_$t", LongType))) :+
        StructField("rank", LongType)
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(fields.toArray))
    }
    val avgdl = statsRow.getLong(1).toDouble / n
    val idf = terms.zipWithIndex.map { case (t, i) =>
      val dfT = statsRow.getLong(2 + i)
      t -> math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
    }.toMap
    val dl = size(toks).cast("double")
    val tfCols = terms.map(t => t -> size(filter(toks, w => w === t)).cast("double"))
    // Lucene's BM25 formulation: the classic (k1+1) numerator factor is
    // rank-invariant, and dropping it keeps every constant here a plain
    // literal the oracle can repeat verbatim (k1+1.0 computed in IEEE
    // sits a rounding tie away from the SQL literal "2.2" — a real
    // cross-engine trap, sidestepped rather than threaded).
    // Fixed-order sum; operand order mirrored by the oracle SQL.
    val score = tfCols.map { case (t, tf) =>
      lit(idf(t)) * tf /
        (tf + lit(k1) * (lit(1.0 - b) + (lit(b) * dl) / lit(avgdl)))
    }.reduce(_ + _)
    val scored = df.select(
      col(idCol) +: size(toks).cast("long").as("n_tokens") +:
        round(score, 6).as("score") +:
        tfCols.map { case (t, tf) => tf.cast("long").as(s"tf_$t") }: _*)
    // global top-k as TakeOrderedAndProject (k rows per partition, no
    // full sort), then the rank column is a window over k rows only
    val top = scored.orderBy(col("score").desc, col(idCol).asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy("rank")
  }
}
