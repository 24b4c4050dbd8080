package graft.data

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, normalization, fingerprinting, quality scoring, language
  * identification, shingling, and SimHash. All but SimHash are pure Catalyst
  * expressions (codegen'd, no UDF): at 100 TB these run inside the scan
  * projection with zero extra passes.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text (empty text → empty array). */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast(ArrayType(StringType)))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count approximation: runs of letters, digits, or
    * single punctuation (a cheap stand-in for a real tokenizer's count). */
  def subwordCount(c: Column): Column =
    size(filter(split(c, "(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])"),
      t => length(t) > 0))

  /** Normalization for fingerprinting: lowercase, collapse whitespace.
    * collapse_ws ≡ regexp_replace(·, "\s+", " ") (bit-identical, proven in
    * NativeExprSpec) — one bytewise pass instead of a regex walk over every
    * document. */
  def normalize(c: Column): Column =
    lower(graft.exprs.NativeExpressions.collapseWs(trim(c)))

  /** Document fingerprint: md5 of the normalized text (exact-dup key). */
  def fingerprint(c: Column): Column = md5(normalize(c).cast(BinaryType))

  /** URLs in running text (http/https, up to the next whitespace) — the
    * extraction primitive behind URL blocklists and per-domain corpus
    * statistics (the C4-style curation step). Scan-local regex, engine-
    * portable (no lookarounds). */
  def extractUrls(c: Column): Column =
    regexp_extract_all(c, lit("https?://[^\\s]+"), lit(0))

  /** Host of a URL: the authority up to the first `/`, `?` or `#`. */
  def urlHost(u: Column): Column =
    regexp_extract(u, "^https?://([^/?#]+)", 1)

  /** Registered domain of a host: the last two dot labels, except under a
    * known multi-label public suffix ([[PublicSuffixes]] — `co.uk`,
    * `com.au`, …) where registration goes one label deeper. The suffix
    * membership test is a Catalyst `In` over literal strings — scan-local
    * and codegen'd, no lookup table shipped at runtime. A bare suffix host
    * (`co.uk` itself) and unknown multi-label suffixes fall back to the
    * two-label rule; wildcard city rules are out of scope (see
    * [[PublicSuffixes]] doc). */
  def registeredDomain(host: Column): Column = {
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last2.isin(PublicSuffixes.twoLabel: _*) && last3 =!= "", last3)
      .otherwise(last2)
  }

  /** Canonical form of a URL for URL-level dedup — the CommonCrawl-style
    * first dedup key, applied before any content hashing: strip fragment,
    * strip query string, strip one trailing slash, lowercase the
    * scheme+host (the case-insensitive part of a URL; paths stay
    * case-sensitive). Pure regexp/scan projections, engine-portable — the
    * oracle replays the identical regex sequence. */
  def canonicalUrl(u: Column): Column = {
    val stripped = regexp_replace(regexp_replace(
      regexp_replace(u, "#.*$", ""), "\\?.*$", ""), "/$", "")
    concat(lower(regexp_extract(stripped, "^(https?://[^/]*)", 1)),
      regexp_extract(stripped, "^https?://[^/]*(.*)$", 1))
  }

  /** Standard text-cleaning pass for a scraped corpus, case-preserving:
    * Unicode NFC (composed/decomposed forms of the same text unify — else
    * they defeat exact dedup and token matching), C0/DEL control characters
    * to spaces, whitespace runs collapsed, ends trimmed. All three stages
    * are codegen'd scan-stage projections (nfc_normalize and collapse_ws are
    * native expressions with bytewise ASCII fast paths), so cleaning rides
    * the parquet scan and adds no pass of its own at 100 TB. */
  def cleanText(c: Column): Column =
    trim(graft.exprs.NativeExpressions.collapseWs(
      regexp_replace(graft.exprs.NativeExpressions.nfcNormalize(c),
        "[\\x00-\\x1f\\x7f]", " ")))

  /** Winnowing document fingerprints (the MOSS local fingerprinting
    * scheme — Schleimer, Wilkerson, Aiken, SIGMOD'03): polynomial rolling
    * hash (base 257 mod 1e9+7, per-step mod) over character k-grams of
    * NORMALIZED text (pass [[normalize]] output in), then the minimum of
    * every window of w consecutive hashes, distinct and ascending. Any
    * substring match of length ≥ k+w−1 between two documents is
    * guaranteed to yield a shared fingerprint. Pure integer arithmetic,
    * so the values are reproducible in any engine. Scale shape: a
    * codegen-adjacent scan projection — one tight O(len) loop per doc,
    * no shuffle; fingerprints explode to (doc, fp) rows for joining.
    * Texts shorter than k+w−1 produce no fingerprints. */
  def winnowUdf(k: Int, w: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { t: String =>
      if (t == null || t.length < k + w - 1) Array.empty[Long]
      else {
        val P = 1000000007L
        val B = 257L
        var bk1 = 1L
        var i = 0
        while (i < k - 1) { bk1 = bk1 * B % P; i += 1 }
        val m = t.length - k + 1
        val hs = new Array[Long](m)
        var h = 0L
        i = 0
        while (i < k) { h = (h * B + t.charAt(i)) % P; i += 1 }
        hs(0) = h
        i = 1
        while (i < m) {
          h = ((h - t.charAt(i - 1) * bk1 % P + P) % P * B + t.charAt(i + k - 1)) % P
          hs(i) = h
          i += 1
        }
        val sel = new java.util.TreeSet[java.lang.Long]()
        i = 0
        while (i <= m - w) {
          var mn = hs(i)
          var j = i + 1
          while (j < i + w) { if (hs(j) < mn) mn = hs(j); j += 1 }
          sel.add(mn)
          i += 1
        }
        val out = new Array[Long](sel.size())
        val it = sel.iterator()
        i = 0
        while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
        out
      }
    }

  /** Shared-substring candidate pairs from winnowing fingerprints — the
    * corpus-level use of [[winnowUdf]] (MOSS does exactly this across
    * submissions): two documents sharing ≥ `minShared` fingerprints very
    * likely share substrings of length ≥ k+w−1 (boilerplate, templates,
    * copied passages). Shape is an inverted index: explode (doc, fp),
    * group to a posting list per fingerprint, emit in-list pairs, count
    * distinct shared fps per pair. The only shuffles are the two groupBys;
    * no all-pairs join ever forms. `maxDf` drops "stop fingerprints" —
    * substrings present in more than maxDf docs (ubiquitous boilerplate)
    * generate O(df²) pairs while carrying no dedup signal; capping df
    * bounds per-list work at scale exactly like df-capped posting lists in
    * text retrieval. Pair expansion is pure Catalyst (nested transform →
    * flatten), codegen'd, no UDF.
    *
    * Output: (id_a, id_b, shared) with id_a < id_b. */
  def winnowPairs(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, k: Int, w: Int, minShared: Int,
                  maxDf: Int): org.apache.spark.sql.DataFrame = {
    val fps = docs.select(col(idCol).cast(LongType).as("id"),
      explode(winnowUdf(k, w)(normalize(col(textCol)))).as("fp"))
    val lists = fps.groupBy(col("fp"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxDf))
    val pairs = lists.select(explode(flatten(transform(col("ids"),
      (a, i) => transform(slice(col("ids"), i + 2, size(col("ids"))),
        b => struct(a.as("id_a"), b.as("id_b")))))).as("p"))
    pairs.groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Word n-grams (space-joined) of the whitespace tokens; fewer than n
    * tokens → empty array. Pure Catalyst (sequence/slice/transform). */
  def wordGrams(c: Column, n: Int): Column = {
    val t = tokens(c)
    when(size(t) < n, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
  }

  private def fracMilli(num: Column, den: Column): Column =
    when(den === 0, lit(0))
      .otherwise(floor((num * 1000).cast(DoubleType) / den).cast(IntegerType))

  /** Repetition signals (Gopher-style quality rules — Rae et al. 2021,
    * "Scaling Language Models", Table A1): repeated-token fraction,
    * repeated-n-gram fraction, and the token share of the single most
    * frequent n-gram. Milli-fractions (ints) so results hash identically
    * across engines. All scan-local Catalyst expressions — at 100 TB these
    * annotate documents in the same pass as the rest of the quality
    * signals, no shuffle. */
  def dupTokenFracMilli(c: Column): Column = {
    val t = tokens(c)
    fracMilli(size(t) - size(array_distinct(t)), size(t))
  }

  /** Fraction (milli) of word n-grams that are repeats of an earlier one. */
  def dupNgramFracMilli(c: Column, n: Int): Column = {
    val g = wordGrams(c, n)
    fracMilli(size(g) - size(array_distinct(g)), size(g))
  }

  /** Token share (milli, capped at 1000) covered by occurrences of the most
    * frequent word n-gram. O(distinct·grams) per row — documents are short
    * relative to corpus size, and it stays inside the scan projection. */
  def topNgramFracMilli(c: Column, n: Int): Column = {
    val t = tokens(c)
    val g = wordGrams(c, n)
    val maxCnt = array_max(transform(array_distinct(g),
      x => size(filter(g, y => y === x))))
    when(size(g) === 0, lit(0))
      .otherwise(least(lit(1000), fracMilli(maxCnt * n, size(t))))
  }

  def avgWordLen(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast(DoubleType) / size(t))
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^\\p{Punct}]", "")).cast(DoubleType) / length(c))

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "von", "ist", "mit", "den", "ein"),
    "fr" -> Seq("le", "les", "des", "une", "du", "et", "est", "dans", "pour", "ce"))

  def stopwordHits(c: Column, lang: String): Column =
    size(filter(tokens(c), t => t.isInCollection(stopwords(lang))))

  def stopwordRatio(c: Column, lang: String = "en"): Column = {
    val t = tokens(c)
    when(size(t) === 0, lit(0.0))
      .otherwise(stopwordHits(c, lang).cast(DoubleType) / size(t))
  }

  /** Stopword-profile language ID: the language with the most stopword hits
    * wins; deterministic tie-break en > es > de > fr; no hits → "und". */
  def languageId(c: Column): Column = {
    val en = stopwordHits(c, "en"); val es = stopwordHits(c, "es")
    val de = stopwordHits(c, "de"); val fr = stopwordHits(c, "fr")
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Composite quality score in [0,1]: length sufficiency, low punctuation
    * noise, natural-language stopword presence. */
  def qualityScore(c: Column): Column =
    round(
      least(tokenCount(c).cast(DoubleType) / 100.0, lit(1.0)) * 0.4 +
        (lit(1.0) - least(punctRatio(c) * 5.0, lit(1.0))) * 0.3 +
        least(stopwordRatio(c) * 10.0, lit(1.0)) * 0.3,
      4)

  // ---- exact integer variants (for cross-engine comparison: ratios as
  // basis points / milli-units via integer division — no float rounding
  // boundary can flip the last digit) ----

  /** avg word length ×100, integer (`sum_len*100 div n_tokens`). Sum of
    * token lengths = length of all tokens concatenated — derived from the
    * SAME `tokens()` split as the count (a separate `\s` strip would use
    * Java's whitespace class, which differs from RE2's by `\x0B`), and
    * still codegen'd (no aggregate lambda). */
  def avgWordLenX100(c: Column): Column = {
    val t = tokens(c)
    val sumLen = length(array_join(t, "")).cast(LongType)
    when(size(t) === 0, lit(0L)).otherwise(expr2Div(sumLen * 100, size(t)))
  }

  /** punctuation chars per 10k chars, integer. */
  def punctRatioBp(c: Column): Column = {
    val punct = length(regexp_replace(c, "[^\\p{Punct}]", ""))
    when(length(c) === 0, lit(0L)).otherwise(expr2Div(punct.cast(LongType) * 10000, length(c)))
  }

  /** stopword hits per 10k tokens, integer. */
  def stopwordRatioBp(c: Column, lang: String = "en"): Column = {
    val t = tokens(c)
    when(size(t) === 0, lit(0L))
      .otherwise(expr2Div(stopwordHits(c, lang).cast(LongType) * 10000, size(t)))
  }

  /** quality in exact milli-units [0,1000]:
    * 400·min(tokens,100)/100 + (300 − min(punct·1500/len,300)) +
    * min(stops·3000/tokens,300), all integer division. */
  def qualityMilli(c: Column): Column = {
    val t = tokens(c)
    val term1 = least(size(t).cast(LongType), lit(100L)) * 4
    val punct = length(regexp_replace(c, "[^\\p{Punct}]", "")).cast(LongType)
    val term2 = lit(300L) - least(
      when(length(c) === 0, lit(0L)).otherwise(expr2Div(punct * 1500, length(c))), lit(300L))
    val term3 = least(
      when(size(t) === 0, lit(0L))
        .otherwise(expr2Div(stopwordHits(c, "en").cast(LongType) * 3000, size(t))), lit(300L))
    term1 + term2 + term3
  }

  /** Exact integer floor division for non-negative operands (decimal
    * division is exact at these magnitudes; floor then narrows). */
  private def expr2Div(a: Column, b: Column): Column =
    floor(a.cast(DecimalType(38, 0)) / b.cast(DecimalType(38, 0))).cast(LongType)

  /** Distinct word n-gram shingles (the MinHash input). */
  def shingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    when(size(t) < n, array().cast(ArrayType(StringType)))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n))))))
  }

  /** 64-bit SimHash over whitespace tokens — a native Catalyst expression
    * with codegen (graft.exprs.SimHash64Expr), not a UDF: no per-row
    * Seq[String] materialization. */
  def simhash64(tokens: Column): Column =
    graft.exprs.NativeExpressions.simhash64(tokens)

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Shannon entropy of the printable-ASCII character distribution, in
    * integer milli-bits (H·1000, rounded) — the low/high-entropy gate
    * (boilerplate and key-dump detection) from the C4/Gopher filter
    * family. Scan-local JVM function for the same reason as
    * [[curationGatesUdf]]: a histogram needs one tight pass, not a HOF
    * chain. Restricted to bytes 0x20–0x7e so the character unit is
    * unambiguous across engines (no grapheme/codepoint divergence);
    * entropy via `H = log2(len) - Σ c·log2(c) / len` over counts — one
    * transcendental call per DISTINCT character, ≤ 95 per row. */
  val charEntropyMilliUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { text: String =>
      if (text == null) 0L
      else {
        val counts = new Array[Long](95)
        var n = 0L
        var i = 0
        while (i < text.length) {
          val c = text.charAt(i)
          if (c >= 0x20 && c <= 0x7e) { counts(c - 0x20) += 1; n += 1 }
          i += 1
        }
        if (n == 0L) 0L
        else {
          val ln2 = math.log(2.0)
          var acc = 0.0
          var j = 0
          while (j < 95) {
            if (counts(j) > 0) acc += counts(j) * (math.log(counts(j).toDouble) / ln2)
            j += 1
          }
          val h = math.log(n.toDouble) / ln2 - acc / n
          math.round(h * 1000.0)
        }
      }
    }

  private val PunctSet: Set[Char] = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".toSet

  /** One-pass curation gates: (clean_text, lang_pred, quality_milli,
    * n_tokens) — semantically identical to `cleanText` + `languageId` +
    * `qualityMilli` + `tokenCount` composed (pinned by a spec), computed in
    * a single tokenization pass per row. The composed Catalyst form is the
    * oracle-matching reference, but when a FILTER over these columns gets
    * pushed below the projection, Catalyst re-inlines the whole chain per
    * predicate leaf, and the stopword `filter(...)` lambdas are interpreted
    * HOFs that codegen CSE cannot deduplicate — measured 26× the cost of
    * the plain projection. Same reasoning as the MinHash signature UDF:
    * Catalyst cannot hoist shared work out of HOF lambdas, so the
    * multi-sweep computation lives in one tight JVM function. */
  val curationGatesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { text: String =>
      // cleanText: NFC (ASCII fast path), C0/DEL → ' ', \s-run collapse, trim
      val nfc = {
        var ascii = true
        var i = 0
        while (ascii && i < text.length) { if (text.charAt(i) >= 0x80) ascii = false; i += 1 }
        if (ascii || java.text.Normalizer.isNormalized(text, java.text.Normalizer.Form.NFC))
          text
        else java.text.Normalizer.normalize(text, java.text.Normalizer.Form.NFC)
      }
      val sb = new java.lang.StringBuilder(nfc.length)
      var inRun = false
      var i = 0
      while (i < nfc.length) {
        val c0 = nfc.charAt(i)
        val c = if (c0 <= 0x1f || c0 == 0x7f) ' ' else c0
        val ws = c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'
        if (ws) { if (!inRun) { sb.append(' '); inRun = true } }
        else { sb.append(c); inRun = false }
        i += 1
      }
      var s = 0; var e = sb.length
      while (s < e && sb.charAt(s) == ' ') s += 1
      while (e > s && sb.charAt(e - 1) == ' ') e -= 1
      val cl = sb.substring(s, e)
      // one tokenization pass: counts for all four stopword profiles + punct
      val toks = if (cl.isEmpty) Array.empty[String] else cl.split(" ")
      val hits = new Array[Long](4)
      val langs = Array("en", "es", "de", "fr")
      toks.foreach { t =>
        var l = 0
        while (l < 4) { if (stopwords(langs(l)).contains(t)) hits(l) += 1; l += 1 }
      }
      var punct = 0L
      var j = 0
      while (j < cl.length) { if (PunctSet.contains(cl.charAt(j))) punct += 1; j += 1 }
      val Array(en, es, de, fr) = hits
      val lang =
        if (en >= es && en >= de && en >= fr && en > 0) "en"
        else if (es >= de && es >= fr && es > 0) "es"
        else if (de >= fr && de > 0) "de"
        else if (fr > 0) "fr"
        else "und"
      val nTok = toks.length.toLong
      val term1 = math.min(nTok, 100L) * 4
      val term2 = 300L - math.min(
        if (cl.isEmpty) 0L else punct * 1500 / cl.length, 300L)
      val term3 = math.min(if (nTok == 0) 0L else en * 3000 / nTok, 300L)
      (cl, lang, term1 + term2 + term3, nTok)
    }
}
