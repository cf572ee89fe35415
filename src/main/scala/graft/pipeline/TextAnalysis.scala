package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for corpus curation: language-ID scoring, quality
  * metrics, token counting, and document fingerprints. Pure column
  * expressions (codegen-friendly, no UDFs).
  */
object TextAnalysis {

  /** Tiny in-model stopword lists per language (n-gram/stopword
    * heuristic). Real deployments swap in fastText-style models behind
    * the same (text → lang, score) contract.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Per-language stopword hit count over a tokens DataFrame
    * (id, pos, token); winner = max (score, lang) with alphabetical
    * tiebreak. Output: (id, lang_pred, lang_score).
    */
  def languageId(toks: DataFrame, idCol: String): DataFrame = {
    val scores = Stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      sum(when(col("token").isInCollection(words), 1).otherwise(0))
        .cast("long").as(s"s_$lang")
    }
    val scored = toks.groupBy(col(idCol)).agg(scores.head, scores.tail: _*)
    val langs = Stopwords.keys.toSeq.sorted
    // greatest over (score, inv, lang) structs; `inv` ranks languages in
    // REVERSE alphabetical order so score-ties resolve to the
    // alphabetically-first language (matching the oracle's CASE chain)
    val bestStruct = greatest(langs.reverse.map(l =>
      struct(col(s"s_$l").as("score"),
        lit(langs.size - langs.indexOf(l)).as("inv"),
        lit(l).as("lang"))): _*)
    scored.select(col(idCol), bestStruct.getField("lang").as("lang_pred"),
      bestStruct.getField("score").as("lang_score"))
  }

  /** Quality metrics per document, all from one pass over the text. */
  /** Flesch-style readability scoring (Flesch 1948; the Flesch reading
    * -ease formula as used in corpus quality filters): words by the
    * corpus tokenizer, sentences as [.!?]+ runs (floored at 1), and a
    * vowel-group syllable proxy. Score = 206.835 - 1.015*(W/S)
    * - 84.6*(Y/W), an exact-rational output rounded with the tie-safe
    * *1e6 sequence on both engines. Single scan, pure column
    * expressions inside whole-stage codegen.
    */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nWords = size(split(col(textCol), " ")).cast("long")
    val nSents = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))).cast("long"),
      lit(1L))
    val nSyll = greatest(
      size(regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0)))
        .cast("long"),
      lit(1L))
    val flesch = lit(206.835) -
      lit(1.015) * (nWords.cast("double") / nSents) -
      lit(84.6) * (nSyll.cast("double") / nWords)
    docs.select(col(idCol),
      nWords.as("n_words"),
      nSents.as("n_sents"),
      nSyll.as("n_syllables"),
      (round(flesch * lit(1e6)) / lit(1e6)).as("flesch"),
      (flesch >= lit(60.0)).as("flag_easy"))
  }

  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val nTok = size(toks).cast("long")
    val nChar = length(col(textCol)).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    docs.select(col(idCol),
      nTok.as("n_tokens"),
      nChar.as("n_chars"),
      nDistinct.as("n_distinct"),
      // integer ratios are the ROUND tie class (Spark shortest-repr
      // HALF_UP vs DuckDB scaled-float): round via *1e6 on both engines
      (round(nDistinct.cast("double") / nTok * lit(1e6)) / lit(1e6))
        .as("distinct_ratio"),
      (round((nChar - (nTok - 1)).cast("double") / nTok * lit(1e6)) / lit(1e6))
        .as("avg_token_len"),
      // crude quality: repetition-penalized log-length
      round(log(nTok.cast("double") + 1) * (nDistinct.cast("double") / nTok), 6)
        .as("quality"))
  }

  /** Whitespace + byte-derived token-count estimates (BPE-ish ~4
    * bytes/token heuristic).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nChar = length(col(textCol)).cast("long")
    docs.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_ws_tokens"),
      nChar.as("n_chars"),
      ceil(nChar.cast("double") / 4.0).cast("long").as("est_bpe_tokens"))
  }

  /** Encoding-anomaly audit: per-doc counts of the three classic
    * ingestion-corruption signatures — U+FFFD replacement characters
    * (a decoder already gave up), C0 control characters outside
    * tab/LF/CR (binary bleed-through), and the UTF-8-read-as-latin1
    * mojibake signature (U+00C3 followed by a U+00A0..U+00BF
    * continuation-byte echo, the 'Ã©'-for-'é' family) — plus a
    * non-ASCII codepoint count and a clean verdict. Pure codegen'd
    * regexp counting, one scan, no shuffle before the caller's ORDER
    * BY; patterns use \x{...} escapes valid in both Java regex and
    * RE2 so the same strings drive the engine and the oracle.
    * (Counting is per BMP codepoint — the corpus is BMP-only; astral
    * chars would count 2 under Java's UTF-16 units vs RE2's runes.)
    */
  def encodingAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def n(pat: String) =
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long")
    val nRepl = n("\\x{FFFD}")
    val nCtrl = n("[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F]")
    val nMoji = n("\\x{C3}[\\x{A0}-\\x{BF}]")
    docs.select(col(idCol),
      nRepl.as("n_repl"),
      nCtrl.as("n_ctrl"),
      nMoji.as("n_moji"),
      n("[^\\x00-\\x7F]").as("n_nonascii"),
      (nRepl + nCtrl + nMoji === 0).as("is_clean"))
  }

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1's
    * duplicate-n-gram family, re-expressed over whitespace tokens):
    * duplicate-token ratio, most-common-token share, and duplicate-
    * bigram ratio, plus a curation flag. Two partial-aggregated
    * groupBys (token level, then doc level) — map-side combinable,
    * no window over the whole corpus, linear at any scale.
    *
    * Ratios are rounded to 6 decimals BEFORE the flag compare so the
    * threshold decision is cross-engine stable.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String,
                 topTokenMax: Double = 0.12,
                 dupBigramMax: Double = 0.25): DataFrame = {
    val toks = TextOps.tokens(docs, idCol, textCol)
    val tokCounts = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("c"))
    val tokStats = tokCounts.groupBy(col(idCol)).agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("top_c"))
    val bg = TextOps.shinglesOfText(docs, idCol, textCol, 2)
    val bgStats = bg.groupBy(col(idCol), col("shingle"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bg"))
    // tie-safe *1e6 rounding: these are exact integer ratios (the
    // cross-engine ROUND tie class), and the flags compare them
    val dupTok = round((col("n_tokens") - col("n_distinct"))
      .cast("double") / col("n_tokens") * lit(1e6)) / lit(1e6)
    val topTok = round(col("top_c").cast("double") / col("n_tokens")
      * lit(1e6)) / lit(1e6)
    // single-token docs have no bigram row: ratio 0 via coalesce
    val dupBg = coalesce(round((col("n_bigrams") - col("n_distinct_bg"))
      .cast("double") / col("n_bigrams") * lit(1e6)) / lit(1e6), lit(0.0))
    tokStats.join(bgStats, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        dupTok.as("dup_token_ratio"),
        topTok.as("top_token_ratio"),
        dupBg.as("dup_bigram_ratio"),
        (topTok > topTokenMax || dupBg > dupBigramMax).as("flag_repetitive"))
  }

  /** PII patterns shared by engine and oracle — restricted to the
    * regex subset where Java (Spark) and RE2 (DuckDB) semantics agree
    * (character classes + bounded repetition; no backrefs/lookaround).
    * Scrub order matters and is part of the contract: emails first
    * (their local parts may contain digits), then SSNs (whose 3-2-4
    * shape must not be half-eaten by the looser phone pattern), then
    * phones.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "[0-9]{3}-[0-9]{2}-[0-9]{4}" -> "[SSN]",
    "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}" -> "[PHONE]")

  /** Per-document PII detection + redaction: match counts per pattern
    * class and the scrubbed text. Pure `regexp_extract_all` /
    * `regexp_replace` column expressions — codegen'd, one pass per
    * pattern, embarrassingly parallel.
    */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = Seq(
      size(regexp_extract_all(col(textCol), lit(PiiPatterns(0)._1), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(PiiPatterns(1)._1), lit(0)))
        .cast("long").as("n_ssn"),
      size(regexp_extract_all(col(textCol), lit(PiiPatterns(2)._1), lit(0)))
        .cast("long").as("n_phones"))
    val scrubbed = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (pat, repl)) => regexp_replace(c, pat, repl)
    }
    docs.select(col(idCol) +: counts :+ scrubbed.as("scrubbed"): _*)
  }

  /** Hashed-n-gram linear quality classifier — the fastText-style
    * scoring shape (Joulin et al. 2016: bag of word uni+bigrams →
    * feature hashing → linear model) that production pipelines run as
    * their "quality classifier" pass. The weight table here is a
    * deterministic LCG stand-in (documented, same plumbing; a real
    * deployment broadcasts learned weights behind the identical
    * contract): bucket b = hash(feat) mod `buckets`, integer weight
    * w(b) = ((1103515245·b + 12345) mod 2048) − 1024 ∈ [−1024, 1024).
    *
    * The score stays in INTEGER arithmetic until one final division —
    * raw = Σ_occurrences w(b), score = raw / (2048·n_tokens) rounded
    * to 6 — so the result is bit-identical cross-engine (no exp/log
    * whose libm ulps could flip a rounded value). label = raw > 0.
    *
    * Scale shape: per-doc feature generation (tokens + per-doc-window
    * bigrams), one map-side-combinable groupBy; the "model" is O(1)
    * closed-form — nothing broadcast, nothing collected.
    */
  def hashedLinearScore(docs: DataFrame, idCol: String, textCol: String,
                        buckets: Int = 4096): DataFrame = {
    val toks = TextOps.tokens(docs, idCol, textCol)
    val feats = toks.select(col(idCol), col("token").as("feat"))
      .unionByName(TextOps.shinglesOfText(docs, idCol, textCol, 2)
        .select(col(idCol), col("shingle").as("feat")))
    val b = pmod(TextOps.hashId(col("feat")), lit(buckets.toLong))
    val w = pmod(lit(1103515245L) * b + 12345L, lit(2048L)) - 1024L
    val scored = feats.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(w).as("raw"))
    val nTok = toks.groupBy(col(idCol)).agg(count(lit(1)).as("n_tokens"))
    scored.join(nTok, idCol)
      .select(col(idCol), col("n_feats"),
        // tie-safe cross-engine rounding (see LanguageModel.avg_llp):
        // integer ratios hit exact .xxxxxx5 values routinely
        (round(col("raw").cast("double") / (lit(2048.0) * col("n_tokens"))
          * lit(1e6)) / lit(1e6)).as("quality_score"),
        (col("raw") > 0).as("label_keep"))
  }

  /** Cross-document duplicate-span detection — the bounded-span form
    * of substring-level exact dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": repeated ≥k-token
    * substrings across a corpus are memorization fuel even when whole
    * documents differ). A doc's k-token span is "duplicated" when the
    * identical span text occurs in at least one OTHER document.
    *
    * Per doc: distinct complete k-spans, how many of them are
    * cross-doc duplicated, the ratio, and a curation flag (the
    * observed ratio distribution is bimodal — near-0 for organic
    * overlap, near-1 for wholesale copying — so the 0.5 default splits
    * cleanly). Docs shorter than k tokens report 0/0/0.0/false.
    *
    * Scale shape: spans come from narrow array expressions (no
    * shuffle, no window); span ids are per-row hashes (`TextOps.hashId`),
    * so corpus-wide occurrence counting is one distinct + one groupBy
    * + one hash-key join back — map-side combinable, linear, no
    * driver state. The equivalent of Lee et al.'s suffix-array pass,
    * re-expressed as shuffle-bounded relational ops.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 5, flagMin: Double = 0.5): DataFrame = {
    val sp = TextOps.shinglesOfText(docs, idCol, textCol, k)
      .select(col(idCol), TextOps.hashId(col("shingle")).as("sid"))
      .distinct()
    val occ = sp.groupBy(col("sid")).agg(count(lit(1)).as("nd"))
    val per = sp.join(occ, "sid")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum((col("nd") > 1).cast("long")).as("n_dup_spans"))
    val ratio = coalesce(
      round(col("n_dup_spans").cast("double") / col("n_spans") * lit(1e6))
        / lit(1e6), lit(0.0))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        ratio.as("dup_span_ratio"),
        (ratio > flagMin).as("flag_contaminated"))
  }

  /** ExactSubstr-style duplicate-span REMOVAL (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" §3.1's
    * ExactSubstr, at fixed span length k instead of a suffix array):
    * every k-token span keeps only its globally-first occurrence
    * (smallest doc id, then position); all token positions covered by
    * a NON-first occurrence are removed and each document is rebuilt
    * from its surviving tokens in order. Overlapping duplicated spans
    * merge their coverage (the distinct on covered positions).
    *
    * Scale shape: positional span generation is narrow array
    * expressions over the scan (no token-stream shuffle). Keep-first
    * is deliberately NOT a span-hash window: a span duplicated a
    * million times (exactly what a dedup pass exists for) would make
    * one task sort the whole hot-key group. Instead the first
    * occurrence per span is a min(struct(id, p)) aggregate —
    * map-side-combinable, so the shuffle carries one row per (span,
    * mapper) however hot the span — and non-first occurrences are
    * identified by a streaming hash-join probe against that O(1
    * row/span) table, which accumulates nothing per key. Coverage is
    * one distinct + one per-doc array aggregate, and the rebuild is
    * pure per-row array expressions (index-filter inside codegen).
    * Linear at any corpus size; skew-robust; no global sort, no UDF,
    * no driver state.
    *
    * Output: (idCol, n_tokens, n_removed, dedup_text).
    */
  def substrDedup(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 8): DataFrame = {
    val arr = col("__arr")
    val spans = when(size(arr) >= k,
      transform(sequence(lit(1), size(arr) - (k - 1)),
        i => struct(i.as("p"),
          TextOps.hashId(concat_ws(" ", slice(arr, i, lit(k)))).as("sid"))))
      .otherwise(array().cast("array<struct<p:int,sid:long>>"))
    val sp = docs.select(col(idCol), split(col(textCol), " ").as("__arr"))
      .select(col(idCol), explode(spans).as("s"))
      .select(col(idCol), col("s.p").as("p"), col("s.sid").as("sid"))
    val firsts = sp.groupBy(col("sid"))
      .agg(min(struct(col(idCol), col("p"))).as("f"))
    val covered = sp.join(firsts, "sid")
      .where(col(idCol) =!= col(s"f.$idCol") || col("p") =!= col("f.p"))
      .select(col(idCol),
        explode(sequence(col("p"), col("p") + lit(k - 1))).as("cp"))
      .distinct()
    val covArr = covered.groupBy(col(idCol))
      .agg(collect_set(col("cp")).as("cov"))
    docs.join(covArr, Seq(idCol), "left")
      .select(col(idCol), split(col(textCol), " ").as("toks"),
        coalesce(col("cov"), array().cast("array<int>")).as("cov"))
      .select(col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("cov")).cast("long").as("n_removed"),
        concat_ws(" ",
          filter(col("toks"), (_, i) => !array_contains(col("cov"), i + 1)))
          .as("dedup_text"))
  }

  /** C4-style corpus-level line dedup (Raffel et al. 2020 §2.2's
    * keep-first rule, line = fixed `k`-token chunk since the fixtures
    * carry no newlines): every distinct line keeps only its
    * globally-first occurrence (smallest id, then position) and each
    * document is rebuilt from its surviving lines in order.
    *
    * Line extraction is narrow array expressions over the scan (the
    * shinglesOfText pattern — no token-stream shuffle). First-occurrence
    * selection is ONE shuffle keyed by the 60-bit line hash with tiny
    * per-key groups (same partitioned-window shape as exact dedup);
    * the rebuild is a per-doc partial aggregate. Linear at any corpus
    * size; no global sort, no UDF.
    *
    * Output: (idCol, n_lines, n_kept, dedup_text).
    */
  /** (idCol, li, line, lid): the k-token line chunks of each doc with
    * their 60-bit content hash — narrow array expressions over the
    * scan, shared by [[lineDedup]] (corpus keep-first) and
    * [[lineFilter]] (filter against a persisted index).
    */
  def linesOf(docs: DataFrame, idCol: String, textCol: String,
              k: Int): DataFrame = {
    val arr = col("__arr")
    val nChunks = floor((size(arr) - lit(1)) / lit(k)).cast("int")
    docs
      .select(col(idCol), split(col(textCol), " ").as("__arr"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks),
          i => concat_ws(" ", slice(arr, i * k + 1, lit(k)))))
          .as(Seq("li", "line")))
      .withColumn("lid", TextOps.hashId(col("line")))
  }

  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 8): DataFrame = {
    // keep-first as a map-side-combinable min(struct) aggregate + a
    // streaming join probe rather than a lid-partitioned window: a
    // boilerplate line duplicated across the whole corpus is the
    // expected input here, and a window would sort that hot key's
    // entire group in one task (see substrDedup's scale note)
    val lines = linesOf(docs, idCol, textCol, k)
    val firsts = lines.groupBy(col("lid"))
      .agg(min(struct(col(idCol), col("li"))).as("f"))
    lines.join(firsts, "lid")
      .withColumn("keep",
        col(idCol) === col(s"f.$idCol") && col("li") === col("f.li"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(transform(filter(
            array_sort(collect_list(
              struct(col("li"), col("keep"), col("line")))),
            x => x("keep")), x => x("line")), " ").as("dedup_text"))
  }

  /** Line filter against a persisted corpus index (`known`: one `lid`
    * column): a line is dropped when it already exists in the index
    * OR occurred earlier in the SAME document; docs are rebuilt from
    * surviving lines. Unlike [[lineDedup]]'s global keep-first, the
    * result is independent of how the input is batched — any
    * partition of the doc stream converges to the same answer, which
    * is what makes it the streaming-ingest form (s9): per-batch
    * foreachBatch filtering against the index needs no cross-batch
    * coordination. Within-doc keep-first is a (doc, lid)-partitioned
    * window (tiny groups); the index meets the line stream as a plain
    * lid equi-join (shuffle hash at corpus scale — never a per-batch
    * rebuild of the index).
    *
    * Output: (idCol, n_lines, n_kept, dedup_text).
    */
  def lineFilter(docs: DataFrame, idCol: String, textCol: String,
                 k: Int, known: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(idCol), col("lid")).orderBy(col("li"))
    linesOf(docs, idCol, textCol, k)
      .withColumn("rn", row_number().over(w))
      .join(known.select(col("lid"), lit(true).as("__known")),
        Seq("lid"), "left")
      .withColumn("keep", col("rn") === 1 && col("__known").isNull)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(transform(filter(
            array_sort(collect_list(
              struct(col("li"), col("keep"), col("line")))),
            x => x("keep")), x => x("line")), " ").as("dedup_text"))
  }

  /** Per-domain boilerplate strip (the CCNet/RefinedWeb rule family:
    * Wenzek 2020 §3.1 paragraph dedup, Penedo 2023 line-wise filters):
    * a line occurring in >= `minDocs` DISTINCT documents of the SAME
    * source is boilerplate (headers, footers, nav chrome — the text
    * that repeats across a domain) and is removed from every doc,
    * including the first; docs are rebuilt from surviving lines.
    * Differs from [[lineDedup]]'s global keep-first: boilerplate
    * removal keeps NO copy, and the scope is per-source.
    *
    * Scale shape: the doc-frequency is a (source, lid) partial
    * aggregate over distinct (source, lid, doc) triples — map-side
    * combinable, no windows, so a line repeated across a whole domain
    * costs one hot REDUCE key, not a single-task sort; the verdict
    * rejoins the line stream on (source, lid) as a plain equi-join.
    *
    * Output: (idCol, n_lines, n_boiler, clean_text).
    */
  def boilerplateStrip(docs: DataFrame, idCol: String, textCol: String,
                       srcCol: String, k: Int = 8,
                       minDocs: Int = 2): DataFrame = {
    val lines = linesOf(docs.select(col(idCol), col(textCol)), idCol,
        textCol, k)
      .join(docs.select(col(idCol), col(srcCol)), idCol)
    val docFreq = lines.select(col(srcCol), col("lid"), col(idCol))
      .distinct()
      .groupBy(col(srcCol), col("lid"))
      .agg(count(lit(1)).as("nd"))
      .where(col("nd") >= minDocs)
      .select(col(srcCol), col("lid"), lit(true).as("__boiler"))
    lines.join(docFreq, Seq(srcCol, "lid"), "left")
      .withColumn("keep", col("__boiler").isNull)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum((!col("keep")).cast("long")).as("n_boiler"),
        array_join(transform(filter(
            array_sort(collect_list(
              struct(col("li"), col("keep"), col("line")))),
            x => x("keep")), x => x("line")), " ").as("clean_text"))
  }

  /** Gopher's document-quality stopword list (Rae et al. 2021 §A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-rule heuristic document filter (Rae et al. 2021 §A1.1, the
    * rule family Dolma/RefinedWeb reuse): word-count bounds, mean word
    * length bounds, symbol-to-word ratio (# and … ), alphabetic-word
    * ratio, and the ≥2-stopwords rule, each reported as its own flag
    * plus the conjunction. All metrics are per-row array/regex
    * expressions over one text scan — integer counts and one rounded
    * division each, no shuffle, no UDF; ratios are rounded to 6
    * decimals BEFORE every threshold compare (cross-engine stable).
    *
    * Symbol counting uses the replace-length trick (occurrences =
    * (len(text) − len(replace(text, s, ''))) / len(s)) — identical
    * greedy non-overlapping semantics on both engines.
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Long = 50, maxWords: Long = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
                  minStopwords: Long = 2): DataFrame = {
    val base = docs.select(col(idCol), col(textCol).as("__t"),
      split(col(textCol), " ").as("__w"))
    val nWords = size(col("__w")).cast("long")
    val nHash = (length(col("__t")) -
      length(regexp_replace(col("__t"), "#", ""))).cast("long")
    val nEllipsis = ((length(col("__t")) -
      length(regexp_replace(col("__t"), "\\.\\.\\.", ""))) / lit(3)).cast("long")
    val metrics = base.select(col(idCol),
      nWords.as("n_words"),
      (round((length(col("__t")) - (nWords - 1)).cast("double") / nWords
        * lit(1e6)) / lit(1e6)).as("mean_word_len"),
      (round((nHash + nEllipsis).cast("double") / nWords * lit(1e6))
        / lit(1e6)).as("symbol_ratio"),
      (round(size(filter(col("__w"), w => w.rlike("[A-Za-z]")))
        .cast("double") / nWords * lit(1e6)) / lit(1e6)).as("alpha_ratio"),
      size(filter(col("__w"), w => w.isInCollection(GopherStopwords)))
        .cast("long").as("n_stopwords"))
    metrics.select(col(idCol), col("n_words"), col("mean_word_len"),
        col("symbol_ratio"), col("alpha_ratio"), col("n_stopwords"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("ok_word_count"),
        (col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen)
          .as("ok_mean_word_len"),
        (col("symbol_ratio") <= maxSymbolRatio).as("ok_symbol_ratio"),
        (col("alpha_ratio") >= minAlphaRatio).as("ok_alpha_ratio"),
        (col("n_stopwords") >= minStopwords).as("ok_stopwords"))
      .withColumn("keep",
        col("ok_word_count") && col("ok_mean_word_len") &&
          col("ok_symbol_ratio") && col("ok_alpha_ratio") && col("ok_stopwords"))
  }

  /** Position-weighted rolling fingerprint over hashed token ids:
    * fp = Σ ((vid mod P) · ((31·pos + 7) mod P)) mod P — order-sensitive
    * (a permuted document fingerprints differently), integer-exact; the
    * mod-P reduction of the 64-bit id keeps the multiply inside Long.
    */
  def fingerprints(tokenIds: DataFrame, idCol: String): DataFrame = {
    val P = 1000003L
    tokenIds.groupBy(col(idCol))
      .agg(pmod(sum(pmod(pmod(col("vid"), lit(P)) *
          pmod(col("pos") * 31 + 7, lit(P)), lit(P))),
        lit(P)).as("fingerprint"))
  }
}
