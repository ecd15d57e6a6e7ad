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


def _sql_str_list(words: list[str]) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in words)


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Language-ID with the token array and per-language scores materialized
    once (separate projections, so CollapseProject keeps single evaluation).

    Expressions are assembled as SQL strings and parsed with one F.expr
    each: composing them from Column objects + Python lambdas issued
    hundreds of py4j round-trips per build (guide §1.2 driver overhead,
    measured r13); the parsed plan is identical (normalized-plan diff)."""
    t = f"`{text_col}`"
    df = df.withColumn("__toks", F.expr(f"split(trim(lower({t})), '\\\\s+')"))
    sets = {"en": STOPWORDS_EN, "de": STOPWORDS_DE, "es": STOPWORDS_ES, "fr": STOPWORDS_FR}
    df = df.withColumns(
        {
            f"__s_{code}": F.expr(
                f"size(filter(__toks, t -> t in ({_sql_str_list(sw)})))"
            )
            for code, sw in sets.items()
        }
    )
    # argmax with deterministic alphabetical tie-break; 'und' when no hits
    # (same branch order as _lang_case: the und-guard first, then sorted
    # codes, each comparing against the full greatest(...) tree)
    best = "greatest(" + ", ".join(f"__s_{c}" for c in sets) + ")"
    case = f"case when {best} <= 0 then 'und' " + " ".join(
        f"when __s_{c} = {best} then '{c}'" for c in sorted(sets)
    ) + " else 'und' end"
    return df.withColumn(out_col, F.expr(case)).drop("__toks", *[f"__s_{c}" for c in sets])


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the standard text-analysis columns.

    Intermediates (token array, counts) are materialized as their own
    projections so each is computed once per row."""
    t = f"`{text_col}`"
    # SQL-string expression assembly (one F.expr per column) — the Column/
    # lambda composition issued ~900 py4j round-trips per build (~0.5 s of
    # driver wall, measured r13 — guide §1.2). The optimized plan keeps the
    # same values with slightly different projection-merge boundaries
    # (__toks/__punct stay materialized instead of CollapseProject inlining
    # a duplicate split into n_tokens); oracle hash-verified.
    df = df.withColumns(
        {
            "__toks": F.expr(f"split(trim({t}), '\\\\s+')"),
            "__toks_l": F.expr(f"split(trim(lower({t})), '\\\\s+')"),
            "__punct": F.expr(f"cast(regexp_count({t}, '{PUNCT_CLASS}') as double)"),
        }
    )
    df = df.withColumns(
        {
            "n_tokens": F.expr("size(__toks)"),
            "n_subtokens": F.expr(
                f"size(regexp_extract_all({t},"
                " '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s])', 0))"
            ),
            "punct_ratio": F.expr(f"__punct / length({t})"),
            "stopword_ratio": F.expr(
                f"size(filter(__toks_l, x -> x in ({_sql_str_list(STOPWORDS_EN)})))"
                " / size(__toks_l)"
            ),
        }
    )
    df = df.withColumns(
        {
            "quality": F.expr(
                "0.4D * least(cast(n_tokens as double) / 64.0D, 1.0D)"
                " + 0.3D * greatest(0.0D, 1.0D - punct_ratio * 10.0D)"
                " + 0.3D * least(stopword_ratio * 4.0D, 1.0D)"
            ),
            "fingerprint": F.expr(f"md5(lower(regexp_replace({t}, '\\\\s+', ' ')))"),
        }
    )
    df = with_lang_id(df, text_col)
    return df.drop("__toks", "__toks_l", "__punct")
