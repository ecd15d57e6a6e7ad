"""Text analysis operators for the `documents` table — 100 TB-ready.

Beyond the reference's own surface (BASELINE.json north star): language-ID,
quality scoring, token counting, document fingerprinting. Everything here is
pure `pyspark.sql.functions` — JVM-side, whole-stage-codegen, no Python in
the hot path — so a 100 TB corpus scans at parquet speed with column pruning
(only `text` + projected columns are read).

Determinism note: each function has an exactly-equivalent ANSI-SQL form used
by the DuckDB oracle in __spark_entry__.py; elementwise double arithmetic is
IEEE-identical across engines, so outputs hash-match without tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small deterministic stopword sets for ratio + language-ID heuristics.
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
STOPWORDS_DE = ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "den", "von"]
STOPWORDS_ES = ["el", "la", "de", "y", "es", "un", "en", "que", "los", "por"]
STOPWORDS_FR = ["le", "la", "de", "et", "est", "un", "en", "que", "les", "pour"]

PUNCT_CLASS = "[.,;:!?]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the oracle uses the same split)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: word-chunks plus digit runs and punctuation
    marks each count as a token (regex segmentation, no model needed)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 0))


def punct_ratio(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PUNCT_CLASS)) / F.length(text)


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return hits / F.size(toks)


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length, punctuation balance,
    stopword presence (the standard LLM-corpus quality trio)."""
    n_tok = token_count(text).cast("double")
    len_component = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    punct_component = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * F.lit(10.0))
    sw_component = F.least(stopword_ratio(text) * F.lit(4.0), F.lit(1.0))
    return F.lit(0.4) * len_component + F.lit(0.3) * punct_component + F.lit(0.3) * sw_component


def fingerprint(text: Column) -> Column:
    """Whitespace-normalized md5 document fingerprint (rolling-hash class;
    md5 keeps Spark and the SQL oracle bit-identical)."""
    return F.md5(F.lower(F.regexp_replace(text, r"\s+", " ")))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(F.lower(text))
    return {
        "en": F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_EN))),
        "de": F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_DE))),
        "es": F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_ES))),
        "fr": F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_FR))),
    }


def _lang_case(scores: dict[str, Column]) -> Column:
    """Argmax with deterministic alphabetical tie-break; 'und' when no hits."""
    best = F.greatest(*scores.values())
    result = F.when(best <= 0, F.lit("und"))
    for code in sorted(scores):
        result = result.when(scores[code] == best, F.lit(code))
    return result.otherwise(F.lit("und"))


def lang_id(text: Column) -> Column:
    """Stopword-hit language ID as a single Column expression.

    NOTE: this duplicates the tokenization per language score inside one
    expression tree; prefer `with_lang_id` (materialized score columns) on
    large data."""
    return _lang_case(lang_scores(text))


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Language-ID with the token array and per-language scores materialized
    once (separate projections, so CollapseProject keeps single evaluation)."""
    df = df.withColumn("__toks", tokens(F.lower(F.col(text_col))))
    sets = {"en": STOPWORDS_EN, "de": STOPWORDS_DE, "es": STOPWORDS_ES, "fr": STOPWORDS_FR}

    def _hit_counter(sw: list[str]):
        # NB: the predicate must be a SINGLE-arg lambda — F.filter dispatches
        # on arity, and a defaulted second parameter would receive the index.
        return F.size(F.filter(F.col("__toks"), lambda t: t.isin(sw)))

    for code, sw in sets.items():
        df = df.withColumn(f"__s_{code}", _hit_counter(sw))
    scores = {code: F.col(f"__s_{code}") for code in sets}
    return df.withColumn(out_col, _lang_case(scores)).drop("__toks", *[f"__s_{c}" for c in sets])


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the standard text-analysis columns.

    Intermediates (token array, counts) are materialized as their own
    projections so each is computed once per row."""
    t = F.col(text_col)
    df = (
        df.withColumn("__toks", tokens(t))
        .withColumn("__toks_l", tokens(F.lower(t)))
        .withColumn("__punct", F.regexp_count(t, F.lit(PUNCT_CLASS)).cast("double"))
    )
    df = (
        df.withColumn("n_tokens", F.size(F.col("__toks")))
        .withColumn("n_subtokens", bpe_ish_token_count(t))
        .withColumn("punct_ratio", F.col("__punct") / F.length(t))
        .withColumn(
            "stopword_ratio",
            F.size(F.filter(F.col("__toks_l"), lambda x: x.isin(STOPWORDS_EN)))
            / F.size(F.col("__toks_l")),
        )
    )
    quality = (
        F.lit(0.4) * F.least(F.col("n_tokens").cast("double") / F.lit(64.0), F.lit(1.0))
        + F.lit(0.3) * F.greatest(F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * F.lit(10.0))
        + F.lit(0.3) * F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0))
    )
    df = df.withColumn("quality", quality).withColumn("fingerprint", fingerprint(t))
    df = with_lang_id(df, text_col)
    return df.drop("__toks", "__toks_l", "__punct")
