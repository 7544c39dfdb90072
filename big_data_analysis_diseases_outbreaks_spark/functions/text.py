"""Text-analysis column expressions for the training-data-pipeline surface.

Everything here is JVM-side (regexp/array higher-order functions) — no
Python UDFs — so a 100 TB documents scan stays inside whole-stage codegen
with Arrow never involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = r"\S+"

# Tiny per-language stopword marker sets for the n-gram-free language-ID
# heuristic. Order = tie-break priority.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "les", "et", "des", "est"],
}

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def tokens(col: Column) -> Column:
    return F.regexp_extract_all(col, F.lit(TOKEN_RE), 0)


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def _marker_count(col: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), 0)).cast("long")


def marker_count_sql(expr: str, words: list[str]) -> str:
    pat = r"\b(" + "|".join(words) + r")\b"
    return f"CAST(len(regexp_extract_all(lower({expr}), '{pat}')) AS BIGINT)"


def lang_id(col: Column) -> Column:
    """Argmax over language marker counts, ties broken in LANG_MARKERS
    order; 'und' when no marker hits."""
    counts = {lang: _marker_count(col, words) for lang, words in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    expr = F.lit("und")
    # Build the when-chain from lowest priority upwards so earlier langs win.
    chain = None
    for lang in langs:
        cond = counts[lang] > 0
        for other in langs:
            if other == lang:
                continue
            if langs.index(other) < langs.index(lang):
                cond = cond & (counts[lang] > counts[other])  # earlier wins ties
            else:
                cond = cond & (counts[lang] >= counts[other])
        branch = F.when(cond, F.lit(lang))
        chain = branch if chain is None else chain.when(cond, F.lit(lang))
    return chain.otherwise(expr)


def lang_id_sql(expr: str) -> str:
    langs = list(LANG_MARKERS)
    counts = {
        lang: marker_count_sql(expr, words) for lang, words in LANG_MARKERS.items()
    }
    branches = []
    for lang in langs:
        conds = [f"{counts[lang]} > 0"]
        for other in langs:
            if other == lang:
                continue
            op = ">" if langs.index(other) < langs.index(lang) else ">="
            conds.append(f"{counts[lang]} {op} {counts[other]}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


def quality_score(text_col: Column) -> Column:
    """Length/stopword-ratio quality heuristic, ∈ [0, 1]."""
    n_tok = token_count(text_col)
    stop = _marker_count(text_col, EN_STOPWORDS)
    stop_ratio = stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    len_component = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    return F.round(0.5 * len_component + 0.5 * F.least(stop_ratio * 5, F.lit(1.0)), 4)


def quality_score_sql(expr: str) -> str:
    n_tok = f"CAST(len(regexp_extract_all({expr}, '{TOKEN_RE}')) AS BIGINT)"
    stop = marker_count_sql(expr, EN_STOPWORDS)
    stop_ratio = f"(CAST({stop} AS DOUBLE) / GREATEST({n_tok}, 1))"
    len_component = f"LEAST(CAST({n_tok} AS DOUBLE) / 100.0, 1.0)"
    return (
        f"ROUND(0.5 * {len_component} + 0.5 * LEAST({stop_ratio} * 5, 1.0), 4)"
    )


def normalized_text(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercased text (matches DuckDB ``md5(...)`` hex output)."""
    return F.md5(F.encode(normalized_text(col), "UTF-8"))


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string>.

    PERF: pass a *materialized token-array column* (see
    :func:`with_shingles`), not a raw text column. Higher-order-function
    lambdas are interpreted (no codegen, no common-subexpression
    elimination), so an inline ``regexp_extract_all`` here would be
    re-tokenized on every ``element_at`` — O(tokens²) per document.
    """
    toks = col
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
    )
    return F.array_distinct(F.transform(idx, gram))


def hashed_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles hashed straight to int64:
    ``xxhash64(w_i, …, w_{i+n-1})`` — the n-word concat string is never
    materialized, and the per-shingle string→hash pass that used to
    follow is folded in. Set-equivalent to hashing the joined string
    (any injective-modulo-collisions encoding of the n-tuple preserves
    Jaccard), so exact-Jaccard verification keeps its oracle parity.

    Same calling contract as :func:`word_shingles`: pass a materialized
    token-array column (HOF lambdas are interpreted — an inline
    tokenizer would re-run per element_at).
    """
    toks = col
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.xxhash64(  # noqa: E731
        *[F.element_at(toks, i + j + 1) for j in range(n)]
    )
    return F.array_distinct(F.transform(idx, gram))


def with_shingles(df, text_col: str = "text", out: str = "sh", n: int = 3):
    """df + shingle column, tokenizing ONCE via an explicit projection
    boundary (CollapseProject keeps multi-referenced non-cheap aliases
    un-inlined, so the token array is computed once per row).

    The short-doc filter runs on the token count BEFORE shingling — an
    equivalent predicate (``size(sh) > 0 ⟺ size(toks) ≥ n``). Filtering
    on the shingle column itself makes predicate pushdown substitute the
    whole shingle expression into the condition, which re-inlines the
    tokenizer into every ``element_at`` → O(tokens²) regex work per row
    (measured 50× slowdown at sf0.1).
    """
    toked = df.withColumn("_toks", tokens(F.col(text_col))).where(
        F.size(F.col("_toks")) >= n
    )
    out_df = toked.withColumn(out, word_shingles(F.col("_toks"), n=n))
    return out_df.drop("_toks")


def with_hashed_shingles(df, text_col: str = "text", out: str = "shh", n: int = 3):
    """df + int64 shingle column (see :func:`hashed_shingles`); same
    tokenize-once / filter-before-shingle shape as :func:`with_shingles`."""
    toked = df.withColumn("_toks", tokens(F.col(text_col))).where(
        F.size(F.col("_toks")) >= n
    )
    out_df = toked.withColumn(out, hashed_shingles(F.col("_toks"), n=n))
    return out_df.drop("_toks")
