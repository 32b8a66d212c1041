"""Text analysis for large-scale corpus pipelines: tokenization, language ID,
quality scoring, fingerprinting.

Beyond-reference operators (SURVEY §7.6): the primitives a training-data
pipeline needs over a ``documents(doc_id, text, ...)`` table at 100TB. All
are pure column expressions / higher-order functions — JVM-side, codegen'd,
no Python in the hot path. Each is exercised by an oracle query pair in
``queries.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small multilingual stopword sets for the n-gram-free language heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "to", "in", "and", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que"],
}


def tokens(text: Column | str, pattern: str = " ") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, pattern)


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Approximate subword count: punctuation split off as separate tokens,
    then whitespace split — a cheap stand-in for BPE tokenizers when
    budgeting corpus size."""
    c = F.col(text) if isinstance(text, str) else text
    spaced = F.regexp_replace(c, r"([.,;:!?()])", r" $1 ")
    return F.size(F.filter(F.split(F.trim(spaced), r"\s+"),
                           lambda x: x != F.lit("")))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    toks = tokens(text)
    stop = STOPWORDS.get(lang, STOPWORDS["en"])
    return F.size(F.filter(toks, lambda x: x.isin(stop))) / F.size(toks)


# fixed tie priority: earlier languages win score ties (deterministic)
LANG_PRIORITY = ["en", "de", "es", "fr"]


def lang_score(text: Column | str, lang: str) -> Column:
    toks = tokens(text)
    stop = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda x: x.isin(stop)))


def predict_language(text: Column | str) -> Column:
    """Stopword-vote language ID: the language whose stopword set matches
    the most tokens wins; score ties resolve by LANG_PRIORITY order; zero
    matches everywhere -> 'unknown'. Pure expressions, one array pass per
    language."""
    scores = {lang: lang_score(text, lang) for lang in LANG_PRIORITY}
    best = None
    for lang in LANG_PRIORITY:
        cond = scores[lang] > 0
        for other in LANG_PRIORITY:
            if other != lang:
                op = (scores[lang] >= scores[other]
                      if LANG_PRIORITY.index(other) > LANG_PRIORITY.index(lang)
                      else scores[lang] > scores[other])
                cond = cond & op
        best = (F.when(cond, F.lit(lang)) if best is None
                else best.when(cond, F.lit(lang)))
    return best.otherwise(F.lit("unknown"))


def quality_features(
    docs: DataFrame, text_col: str = "text", lang: str = "en"
) -> DataFrame:
    """Per-document quality features (length, token stats, stopword ratio,
    alpha ratio, mean token length) — the filter basis for corpus curation."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    c = F.col(text_col)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    tok_len_sum = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    return docs.select(
        "*",
        F.length(c).alias("n_chars_q"),
        n_tok.alias("n_tokens"),
        (tok_len_sum / n_tok).alias("avg_token_len"),
        stopword_ratio(text_col, lang).alias("stop_ratio"),
        (alpha / F.length(c)).alias("alpha_ratio"),
    )


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted token
    multiset — catches shuffled-word duplicates exact hashing misses."""
    return F.md5(F.array_join(F.array_sort(tokens(text)), " "))


def rolling_hash_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing-style fingerprints: k-gram hashes, minimum per sliding
    window of ``window`` hashes — the classic local fingerprinting scheme for
    near-dup/plagiarism detection. Emits (doc_id, pos, fp) rows.

    Implementation: shingle explode (map-side), xxhash64 per shingle, then a
    per-doc sliding min via a window frame — one shuffle by doc_id."""
    from pyspark.sql import Window as W

    sh = docs.select(
        doc_id_col,
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length(text_col) - (k - 1), F.lit(1)))
        ).alias("pos"),
        F.col(text_col),
    ).select(
        doc_id_col, "pos",
        F.xxhash64(F.expr(f"substring({text_col}, pos, {k})")).alias("h"),
    )
    w = W.partitionBy(doc_id_col).orderBy("pos").rowsBetween(0, window - 1)
    fps = sh.withColumn("fp", F.min("h").over(w))
    # keep one row per distinct fingerprint value per doc (winnowing dedup)
    return fps.groupBy(doc_id_col, "fp").agg(F.min("pos").alias("pos"))
