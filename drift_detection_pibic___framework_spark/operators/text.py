"""Text-analysis operators for training-data pipelines over the
``documents`` table: token counting, quality scoring, language-ID heuristic,
document fingerprinting.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs.  The reference has no text operators
(its strings are labels only, SURVEY §1.2); these are the north-rule
"large-scale training-data pipeline" extensions, applied to transcripts at
production scale (the ``documents`` driver table stands in here).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# tiny public stopword seeds per language for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour"],
    "pt": ["o", "a", "de", "que", "e", "em", "um", "para"],
}


def tokens(col: str = "text"):
    """Whitespace tokenization (the BPE-ish regex variant uses
    ``\\w+|[^\\w\\s]`` — see token_count_bpe).

    Collapses ``\\s+`` to single spaces BEFORE trimming — the exact
    pipeline of ``dedup.norm_text`` minus lowering — so the raw token
    stream aligns 1:1 with the normalized stream for ANY whitespace
    (``F.trim`` strips only ASCII spaces: trimming first would leave a
    leading/trailing tab or newline and emit a phantom empty token,
    shifting every downstream token offset by one)."""
    return F.split(F.trim(F.regexp_replace(F.col(col), r"\s+", " ")), " ")


def with_token_counts(docs: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subunit count (words and standalone
    punctuation as separate tokens)."""
    return docs.select(
        "doc_id",
        F.size(tokens(col)).alias("n_tokens"),
        F.size(F.split(F.trim(F.col(col)), r"\W+")).alias("n_word_units"),
        F.length(col).alias("n_chars_measured"))


def with_quality(docs: DataFrame, col: str = "text") -> DataFrame:
    """Quality-scoring features: length, alpha ratio, space ratio, mean word
    length, plus a composite [0,1] score (heuristics published in pipeline
    literature: length window + alpha density)."""
    text = F.col(col)
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    spaces = F.length(F.regexp_replace(text, r"[^ ]", ""))
    ntok = F.size(tokens(col))
    alpha_ratio = F.round(alpha / n, 6)
    mean_word_len = F.round((n - spaces) / ntok, 6)
    length_ok = (n >= 20) & (n <= 10000)
    score = F.round(
        (F.when(length_ok, 0.4).otherwise(0.0)) +
        0.4 * (alpha / n) +
        (F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 0.2)
         .otherwise(0.0)), 6)
    return docs.select("doc_id", n.alias("n_chars_measured"),
                       ntok.alias("n_tokens"),
                       alpha_ratio.alias("alpha_ratio"),
                       mean_word_len.alias("mean_word_len"),
                       score.alias("quality_score"))


def with_lang_scores(docs: DataFrame, col: str = "text") -> DataFrame:
    """Stopword-hit language-ID heuristic: per language, the fraction of
    tokens that are language stopwords; predicted = argmax (ties -> lexical
    order). Pure built-ins: array_intersect-free formulation via
    aggregate over the token array."""
    toks = tokens(col)
    cols = [F.col("doc_id")]
    for lang, sw in sorted(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in sw])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        cols.append(F.round(hits / F.size(toks), 6).alias(f"score_{lang}"))
    scored = docs.select(*cols)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lo}") for lo in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{lo}") == best, F.lit(lo)) for lo in langs])
    return scored.withColumn("predicted_lang", pred)


# PII classes for the standard curation scrub.  Patterns are kept to the
# regex subset with identical semantics in Java regex (Spark) and RE2
# (DuckDB oracle): no backreferences, no lookaround — so the whole scrub is
# cross-engine checkable.  Dict order = masking order (applied sequentially;
# counts are always measured on the ORIGINAL text per class).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_scrub(docs: DataFrame, col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """PII scrub — the curation step run alongside quality scoring before
    text enters a training mix: per-class hit counts on the original text
    plus a masked copy with every match replaced by ``<CLASS>``.

    All JVM-side built-ins (regexp_count / regexp_replace — whole-stage
    codegen, zero Python): one narrow projection, no shuffle, safe to run
    inline in any 100-TB scan.  Masking is sequential in PII_PATTERNS
    order; ``ssn`` runs after ``phone`` so a phone-masked region cannot be
    re-matched (the two patterns are mutually exclusive on raw text:
    3-3-4 vs 3-2-4 digit groups)."""
    out = docs
    masked = F.col(col)
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(col), F.lit(pat)))
        masked = F.regexp_replace(masked, pat, f"<{name.upper()}>")
    return out.withColumn("masked_text", masked).withColumn(
        "n_pii", sum(F.col(f"n_{n}") for n in PII_PATTERNS))


def with_fingerprints(docs: DataFrame, col: str = "text") -> DataFrame:
    """Document fingerprints: (a) md5 of the normalized text (exact-dup
    key), (b) a rolling-hash min-fingerprint — the minimum 64-bit hash over
    word 3-gram shingles (winnowing-style content signature)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " ")))
    toks = F.split(norm, " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0)))
    n3 = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)))
    min_rolling = F.array_min(F.transform(
        n3, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
        .cast("long")))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("md5_fingerprint"),
        min_rolling.alias("min_shingle_hash"))


def tfidf_top_terms(docs: DataFrame, k: int = 5,
                    col: str = "text") -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic keyword/
    retrieval weighting (smooth idf = ln((N+1)/(df+1)) + 1, tf = raw
    in-doc count over normalized whitespace tokens; ties broken by term
    ascending for determinism).

    Scale shape: one narrow explode; tf is a groupBy on (doc_id, term)
    (map-side combined); df is a groupBy on term over the DISTINCT
    (doc, term) pairs the tf aggregation already produced — no second
    corpus scan; N rides a broadcast 1-row literal; top-k per doc is one
    window shuffle on doc_id.  Returns (doc_id, term, tf, df,
    tfidf)."""
    from pyspark.sql import Window
    toks = F.split(F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+",
                                                   " "))), " ")
    ex = docs.select("doc_id", F.explode(toks).alias("term"))
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.col("term"))
    return (tf.join(df, "term")
            .crossJoin(F.broadcast(n))
            .withColumn("tfidf", F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1)
                                     / (F.col("df") + 1)) + 1), 6))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("doc_id", "term", "tf", "df", "tfidf"))


def word_ngrams(col: str = "text", k: int = 1):
    """ALL word k-grams of the normalized text, duplicates KEPT (the
    repetition metrics need multiplicities; dedup.word_shingles is the
    distinct twin).  Sub-k-token docs yield one truncated gram, matching
    word_shingles' slice behaviour."""
    toks = F.split(
        F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " "))), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))


# (k, metric) pairs for repetition_metrics; the published repetition
# filters (Gopher's quality rules) use the most-common-n-gram char
# fraction for small n and the duplicate-n-gram char fraction for large n.
REPETITION_KS = (1, 2, 5)


def repetition_metrics(docs: DataFrame, col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document — the standard
    filter for template/boilerplate/spam text in a training-data mix:

    - ``top_word_frac``: occurrences of the most frequent token / tokens.
    - ``top_2gram_char_frac``: characters covered by the most frequent
      word 2-gram / total 2-gram characters, where a gram "covers"
      count * length(gram) characters.  Ties on count break toward the
      larger coverage (max over the (count, chars) pair — deterministic
      and engine-portable, no arbitrary arg_max tie).
    - ``dup_5gram_char_frac``: characters in 5-grams occurring more than
      once / total 5-gram characters.

    Scale shape: ONE explode over a k-tagged union of the gram arrays,
    then two hash aggregations keyed on (doc_id, k, gram) and
    (doc_id, k) — fine-grained keys, map-side partial aggregation, no
    window, no skew hazard (a single doc's grams land in one task only
    during the second, already-reduced aggregation).  All built-ins."""
    def _tag(k):
        # ONE-arg lambda: a 2-arg lambda to F.transform would receive
        # (element, index) and silently tag grams with their position
        return lambda g: F.struct(F.lit(k).alias("k"), g.alias("gram"))

    tagged = F.concat(*[F.transform(word_ngrams(col, k), _tag(k))
                        for k in REPETITION_KS])
    grams = docs.select("doc_id", F.explode(tagged).alias("g")) \
                .select("doc_id", F.col("g.k").alias("k"),
                        F.col("g.gram").alias("gram"))
    cnt = (grams.groupBy("doc_id", "k", "gram")
           .agg(F.count(F.lit(1)).alias("cnt"))
           .withColumn("chars", F.col("cnt") * F.length("gram")))
    per_k = cnt.groupBy("doc_id", "k").agg(
        F.max("cnt").alias("top_cnt"),
        F.max(F.struct(F.col("cnt").alias("c"),
                       F.col("chars").alias("h")))["h"].alias("top_chars"),
        F.sum("cnt").alias("tot_cnt"),
        F.sum("chars").alias("tot_chars"),
        F.sum(F.when(F.col("cnt") > 1, F.col("chars"))
              .otherwise(F.lit(0))).alias("dup_chars"))

    def pick(k, expr):
        return F.max(F.when(F.col("k") == k, expr))

    return per_k.groupBy("doc_id").agg(
        F.round(pick(1, F.col("top_cnt") / F.col("tot_cnt")),
                6).alias("top_word_frac"),
        F.round(pick(2, F.col("top_chars") / F.col("tot_chars")),
                6).alias("top_2gram_char_frac"),
        F.round(pick(5, F.col("dup_chars") / F.col("tot_chars")),
                6).alias("dup_5gram_char_frac"))


# -------------------------------------------------------------------------
# markup strip — HTML/boilerplate extraction before curation
# -------------------------------------------------------------------------

# entity decode order: &amp; LAST so a literal "&amp;lt;" decodes to "&lt;"
# (one level), never to "<" (double decode) — the standard single-pass rule
HTML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def strip_markup(docs: DataFrame, col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Markup strip — the extraction step between raw crawl and every
    text screen (quality scoring on un-stripped HTML measures the
    boilerplate, not the prose): remove tags, decode the common HTML
    entities, collapse whitespace; report the tag count and the fraction
    of characters that were markup.

    Deliberately regex-simple (tags = ``<[^>]*>``; no script/style
    content removal, no DOM) so the whole step is JVM codegen
    (regexp_replace / replace — narrow, zero shuffle, runs inline in a
    100-TB scan) and byte-reproducible in the DuckDB oracle; a real
    crawl pipeline would put a trafilatura-class extractor behind the
    same column contract as an Arrow kernel.

    Returns (id_col, stripped_text, n_tags, markup_ratio)."""
    text = F.col(col)
    n = F.length(text)
    n_tags = F.regexp_count(text, F.lit(r"<[^>]*>"))
    stripped = F.regexp_replace(text, r"<[^>]*>", " ")
    for ent, rep in HTML_ENTITIES:
        stripped = F.replace(stripped, F.lit(ent), F.lit(rep))
    stripped = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return docs.select(
        F.col(id_col),
        stripped.alias("stripped_text"),
        n_tags.alias("n_tags"),
        F.round((n - F.length(stripped)) / F.greatest(n, F.lit(1)), 4)
        .alias("markup_ratio"))


# -------------------------------------------------------------------------
# bigram language-model scoring (the CCNet perplexity-filter analog)
# -------------------------------------------------------------------------

def _norm_tokens(col: str):
    """Normalized token array (lower, trim, whitespace collapse) — shared
    by the LM train and score paths so both sides tokenize identically."""
    return F.split(
        F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " "))), " ")


def _bigrams(col: str):
    """Adjacent token pairs as structs (w1, w2); docs with < 2 tokens
    yield an empty array (they carry no bigram evidence)."""
    toks = _norm_tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1)))
    return F.when(F.size(toks) >= 2, F.transform(
        idx, lambda i: F.struct(F.element_at(toks, i).alias("w1"),
                                F.element_at(toks, i + 1).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def train_bigram_lm(docs: DataFrame, col: str = "text",
                    min_count: int = 1) -> tuple:
    """Train an add-one-smoothed bigram LM on a corpus: returns
    ``(bigrams, contexts, vocab_size)`` — (w1, w2, c12) counts,
    (w1, c1) context counts, and the distinct-token vocabulary size.

    This is the quality-model side of a CCNet-style perplexity filter
    (Wenzek et al. 2020 train KenLM on a trusted corpus and drop
    high-perplexity docs); a bigram model keeps the whole pipeline inside
    DataFrame aggregations — no external LM artifact to ship.

    Scale shape: both count tables come off ONE bigram explode with
    map-side partial aggregation (narrow explode, two keyed shuffles);
    ``min_count`` prunes the long tail so the model broadcasts in the
    scoring join (the web-scale variant caps the model with a
    Misra-Gries top-K pass — functions/sketches.py — instead of a raw
    count threshold).  vocab_size is one bounded driver-side scalar."""
    bg = docs.select(F.explode(_bigrams(col)).alias("b")) \
             .select("b.w1", "b.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab_size = (docs.select(F.explode(_norm_tokens(col)).alias("tok"))
                  .agg(F.countDistinct("tok")).collect()[0][0])
    if min_count > 1:
        c12 = c12.filter(F.col("c12") >= min_count)
    return c12, c1, int(vocab_size)


def lm_score(docs: DataFrame, model: tuple, col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-document add-one-smoothed bigram log-probability:
    mean over a doc's bigrams of ln((c12 + 1) / (c1 + V)), plus the
    perplexity exp(-avg_logp).  Low avg_logp (high ppl) = text unlike
    the training corpus — the standard curation cut for gibberish,
    boilerplate, and wrong-language slices.

    Unseen bigrams/contexts fall back to the smoothed floor (c12=0 /
    c1=0), so held-out text scores without error.  Docs with < 2 tokens
    carry no evidence and are excluded.

    Cross-engine determinism: each bigram's logp is rounded onto a 1e-6
    integer grid BEFORE the per-doc sum (integer addition is
    order-independent; a raw double sum would hash-drift between
    engines), the same trick the windowed-metrics oracles use.

    Scale shape: the doc side is one narrow explode; both model joins
    broadcast (the model is count-pruned by contract); the only shuffle
    is the per-doc aggregation."""
    c12, c1, vocab_size = model
    bg = (docs.filter(F.size(_norm_tokens(col)) >= 2)
          .select(F.col(id_col), F.explode(_bigrams(col)).alias("b"))
          .select(id_col, "b.w1", "b.w2"))
    j = (bg.join(F.broadcast(c12), ["w1", "w2"], "left")
         .join(F.broadcast(c1), ["w1"], "left"))
    logp = F.log((F.coalesce(F.col("c12"), F.lit(0)) + 1.0) /
                 (F.coalesce(F.col("c1"), F.lit(0)) + float(vocab_size)))
    lpm = F.round(logp * 1e6).cast("bigint")
    out = (j.select(id_col, lpm.alias("lpm"))
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_bigrams"),
                F.round(F.sum("lpm") / 1e6 / F.count(F.lit(1)), 6)
                .alias("avg_logp")))
    return out.withColumn("ppl", F.round(F.exp(-F.col("avg_logp")), 4))


def charset_quality(docs: DataFrame, col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Encoding-health screen — the mojibake/binary-junk filter a curation
    pipeline runs before language-ID (broken decoding poisons every
    downstream heuristic): per-doc counts of non-ASCII characters, U+FFFD
    replacement characters (the tell of a wrong-charset decode) and C0
    control characters (tab/newline/CR excluded), plus the non-ASCII
    ratio.

    Counts are length-difference over regexp_replace (JVM codegen, narrow,
    zero shuffle).  Character classes are shared RE2/Java syntax so the
    same patterns drive the DuckDB oracle."""
    text = F.col(col)
    n = F.length(text)

    def n_matching(pat):
        return n - F.length(F.regexp_replace(text, pat, ""))

    non_ascii = n_matching(r"[^\x00-\x7F]")
    repl = n_matching("�")
    ctl = n_matching(r"[\x01-\x08\x0B\x0C\x0E-\x1F]")
    return docs.select(
        F.col(id_col),
        n.alias("n_chars"),
        non_ascii.alias("n_non_ascii"),
        repl.alias("n_replacement"),
        ctl.alias("n_control"),
        F.round(non_ascii / F.greatest(n, F.lit(1)), 4)
        .alias("non_ascii_ratio"))


def length_buckets(docs: DataFrame, col: str = "text",
                   probs=(0.25, 0.5, 0.75)) -> DataFrame:
    """Token-length quantile bucketing — group docs into len(probs)+1
    buckets cut at the corpus' own exact token-count quantiles, the
    batching prep that keeps padding waste low when packing sequences
    (short docs batch with short docs).

    The cut points come from operators/stats.exact_quantiles (EXACT
    percentile_cont over a value HISTOGRAM — scale-safe because token
    counts are a bounded integer domain, never a raw-value percentile
    buffer), ride back on a single-row broadcast (a 1-row nested-loop
    join is O(rows), not O(rows²)), and the bucket id is a pure
    comparison sum.  Output: doc_id, n_tokens, bucket in [0, len(probs)]."""
    from .stats import exact_quantiles

    toks = docs.select(
        "doc_id", F.size(tokens(col)).cast("bigint").alias("n_tokens"))
    cuts = exact_quantiles(
        toks.withColumn("_g", F.lit(1)), "_g", "n_tokens", list(probs))
    tags = [f"q{int(round(p * 100))}" for p in probs]
    bucket = None
    for t in tags:
        step = (F.col("n_tokens") > F.col(t)).cast("int")
        bucket = step if bucket is None else bucket + step
    return (toks.crossJoin(F.broadcast(cuts.drop("_g")))
            .select("doc_id", "n_tokens", bucket.alias("bucket")))


# -------------------------------------------------------------------------
# edit-distance metrics: CER / WER between two transcript columns
# -------------------------------------------------------------------------

# printable-ASCII codepoints 33..126 — 94 collision-free single-BYTE
# slots for the token -> char encoding below.  ASCII only, because
# DuckDB's levenshtein counts BYTES while Spark's counts codepoints:
# any multi-byte slot (e.g. Latin-1 161..255) would silently double its
# edit cost in the oracle.  Within ASCII the two engines agree exactly,
# so the encoded distance IS the token-level one in both
EDIT_MAX_VOCAB = 94


def _edit_norm(col):
    """lower + whitespace collapse + trim; NULL reads as '' (a missing
    transcript is maximally distant from any text, zero-distant from
    another missing one)."""
    return F.lower(F.trim(F.regexp_replace(
        F.coalesce(col, F.lit("")), r"\s+", " ")))


def edit_metrics(df: DataFrame, col_a: str, col_b: str,
                 max_vocab: int = EDIT_MAX_VOCAB) -> DataFrame:
    """Char- and token-level edit-distance metrics between two string
    columns — the ASR-corpus adjudication math (how BADLY do two
    transcripts of the same recording disagree): ``char_dist``/``cer``
    (character error rate) and ``tok_dist``/``wer`` (word error rate),
    with the a-side as the reference for both denominators.

    Pure built-in expressions (oracle-checkable): char distance is
    ``levenshtein`` over the normalized strings; TOKEN distance rides the
    same JVM levenshtein through an alphabet-renaming trick — each
    distinct token of the pair maps to one printable-ASCII char (the
    pair's own ``array_union`` vocabulary indexes into 94 single-byte
    slots), and edit distance is invariant under any bijective renaming,
    so the engines need not even agree on vocab ORDER, only on the
    (identical) token sets.  ASCII-only on purpose: DuckDB's levenshtein
    is byte-based, so multi-byte slots would break oracle parity (the
    same caveat applies to char_dist on non-ASCII transcript text).
    Pairs whose joint vocabulary exceeds ``max_vocab`` get NULL
    tok_dist/wer — real minutes-long transcripts overflow 94 distinct
    tokens, which is what the Arrow twin ``edit_metrics_kernel`` (no
    cap, same parity-pinned semantics) is for.

    Adds: char_dist, cer, tok_dist, wer.  cer = char_dist /
    max(len(norm_a), 1); wer = tok_dist / max(n_tokens_a, 1); both
    rounded to 6dp.  Empty/NULL a-side with non-empty b-side yields
    cer/wer > 1 by the insertion count — standard WER behavior."""
    na, nb = _edit_norm(F.col(col_a)), _edit_norm(F.col(col_b))

    def toks(n):
        return F.when(n == "", F.array().cast("array<string>")) \
            .otherwise(F.split(n, " "))

    d = (df.withColumn("_na", na).withColumn("_nb", nb)
         .withColumn("_ta", toks(F.col("_na")))
         .withColumn("_tb", toks(F.col("_nb")))
         .withColumn("_vocab", F.array_union("_ta", "_tb")))

    def enc(t):
        # 1-based array_position -> 0-based index -> printable ASCII
        return F.char(F.array_position(F.col("_vocab"), t) + 32)

    enc_a = F.concat_ws("", F.transform("_ta", enc))
    enc_b = F.concat_ws("", F.transform("_tb", enc))
    char_dist = F.levenshtein("_na", "_nb")
    tok_dist = F.when(F.size("_vocab") <= max_vocab,
                      F.levenshtein(enc_a, enc_b))
    return (d.withColumn("char_dist", char_dist)
            .withColumn("cer", F.round(
                F.col("char_dist") /
                F.greatest(F.length("_na"), F.lit(1)), 6))
            .withColumn("tok_dist", tok_dist)
            .withColumn("wer", F.round(
                F.col("tok_dist") /
                F.greatest(F.size("_ta"), F.lit(1)), 6))
            .drop("_na", "_nb", "_ta", "_tb", "_vocab"))


def edit_distance_reference(a: list, b: list) -> int:
    """Plain DP Levenshtein over two token (or char) sequences — the
    parity target for edit_metrics_kernel and, through the alphabet-
    renaming argument, for edit_metrics' encoded form."""
    import numpy as np
    prev = np.arange(len(b) + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    bb = np.asarray(b, dtype=object)
    for i, x in enumerate(a, 1):
        cur[0] = i
        sub = prev[:-1] + (bb != x)
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        for j in range(1, len(b) + 1):      # carry insertions left->right
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev, cur = cur, prev
    return int(prev[-1])


def edit_distance_banded(a, b, max_dist: int):
    """Ukkonen k-band Levenshtein: the EXACT distance when it is
    <= ``max_dist``, else ``None`` (explicit give-up) — O(k·max(n,m))
    time and O(k) space instead of full-DP O(n·m), which is what bounds
    WER/CER on pathological (minutes-long) transcript pairs.

    Correctness argument: any path of cost <= k in the edit lattice stays
    within |i-j| <= k of the diagonal, so restricting the DP to that band
    cannot change any value that ends up <= k; cells outside the band are
    pinned at k+1 and can only inflate values already > k.  The early
    exit (whole band row > k) is safe for the same reason — row minima
    are non-decreasing in Levenshtein DP."""
    import numpy as np
    k = int(max_dist)
    if k < 0:
        raise ValueError("max_dist must be >= 0")
    n, m = len(a), len(b)
    if abs(n - m) > k:
        return None
    if n == 0 or m == 0:
        d = max(n, m)
        return d if d <= k else None
    INF = k + 1
    width = 2 * k + 1
    # prev[t] = D[i-1][j] at band offset t = j - (i-1) + k
    prev = np.full(width, INF, dtype=np.int64)
    for j in range(0, min(k, m) + 1):       # row 0: D[0][j] = j
        prev[j + k] = j
    cur = np.empty(width, dtype=np.int64)
    bb = np.asarray(list(b), dtype=object)
    for i in range(1, n + 1):
        lo, hi = max(1, i - k), min(m, i + k)
        cur[:] = INF
        ts = np.arange(lo - i + k, hi - i + k + 1)
        # substitution: D[i-1][j-1] sits at the SAME offset t in prev
        sub = prev[ts] + (bb[lo - 1:hi] != a[i - 1])
        # deletion: D[i-1][j] sits at offset t+1 (INF past the band edge)
        dele = np.full_like(sub, INF)
        valid = ts + 1 < width
        dele[valid] = prev[ts[valid] + 1] + 1
        cur[ts] = np.minimum(np.minimum(sub, dele), INF)
        if i <= k:                           # j = 0 base: D[i][0] = i
            cur[k - i] = i
        # insertion carry (D[i][j-1] + 1), sequential over <= 2k+1 cells
        for t in range(int(ts[0]), int(ts[-1]) + 1):
            left = cur[t - 1] + 1 if t >= 1 else INF
            if left < cur[t]:
                cur[t] = left
        prev, cur = cur, prev
        if prev.min() > k:                   # row minima never decrease
            return None
    d = int(prev[m - n + k])
    return d if d <= k else None


def edit_metrics_kernel(df: DataFrame, col_a: str, col_b: str,
                        max_dist: int = None) -> DataFrame:
    """Arrow twin of ``edit_metrics`` with NO vocabulary cap — the scale
    path for real transcripts (hundreds of distinct tokens).  One
    vectorized pandas UDF computes char and token distance per pair;
    normalization, NULL handling and denominators are parity-pinned
    against the expression form (tests/test_pipeline_ops).  Cost is
    O(len_a·len_b) per pair — pairs feeding this are conflict candidates
    (tiny vs the corpus), never the full table.

    ``max_dist``: Ukkonen k-band cutoff (edit_distance_banded) bounding
    the per-pair cost at O(max_dist·len) — the guard for pathological
    (minutes-long) transcript pairs.  A distance that exceeds the bound
    comes back NULL in char_dist/tok_dist (and so in cer/wer): an
    EXPLICIT give-up verdict, distinguishable from a real small distance
    — adjudication callers treat NULL as 'disagree worse than the
    threshold' since any threshold of interest is below the bound."""
    import re

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _dists(a: pd.Series, b: pd.Series) -> pd.Series:
        # re.ASCII: Java/Spark \s is ASCII-only, and the expression form
        # is the semantics contract (same parity note as dedup.py's
        # simhash kernel) — without it unicode whitespace (NBSP) would
        # tokenize differently between the twins
        ws = re.compile(r"\s+", re.ASCII)
        if max_dist is None:
            def dist(u, v):
                return edit_distance_reference(u, v)
        else:
            def dist(u, v):
                return edit_distance_banded(u, v, max_dist)
        out = []
        for x, y in zip(a, b):
            nx = ws.sub(" ", x or "").strip(" ").lower()
            ny = ws.sub(" ", y or "").strip(" ").lower()
            out.append([
                dist(list(nx), list(ny)),
                dist(nx.split(" ") if nx else [],
                     ny.split(" ") if ny else [])])
        return pd.Series(out)

    na = _edit_norm(F.col(col_a))
    d = (df.withColumn("_d", _dists(F.col(col_a), F.col(col_b)))
         .withColumn("_na", na))
    n_tok_a = F.when(F.col("_na") == "", 0).otherwise(
        F.size(F.split(F.col("_na"), " ")))
    return (d.withColumn("char_dist", F.col("_d")[0])
            .withColumn("cer", F.round(
                F.col("char_dist") /
                F.greatest(F.length("_na"), F.lit(1)), 6))
            .withColumn("tok_dist", F.col("_d")[1])
            .withColumn("wer", F.round(
                F.col("tok_dist") / F.greatest(n_tok_a, F.lit(1)), 6))
            .drop("_d", "_na"))
