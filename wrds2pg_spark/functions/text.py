"""Text-analysis column builders for the documents pipeline: token
stats, quality scoring, language-ID heuristics, shingling, content
fingerprints.  Everything is built from JVM-side ``F.*`` / higher-order
functions (no Python UDFs), and every helper has a DuckDB-SQL twin
(``*_SQL``) so the north-star text operators stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from wrds2pg_spark.functions.expr import let_

__all__ = [
    "tokens", "token_count", "stopword_hits", "punct_ratio",
    "quality_score", "lang_scores", "shingles", "fingerprint",
    "char_entropy", "STOPWORDS",
]

# Tiny per-language stopword lists (public knowledge; the heuristic is
# n-gram/stopword-ratio language ID, cf. fastText/langid-style features).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "du", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "que"],
}


def tokens(text: Column) -> Column:
    """Lower-cased whitespace tokens."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def TOKENS_SQL(expr: str = "text") -> str:
    return f"string_split_regex(lower(trim({expr})), '\\s+')"


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def _contains_any(arr: Column, words: list[str]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(F.array_distinct(arr), lit_arr)).cast("long")


def stopword_hits(text: Column, lang: str = "en") -> Column:
    """Count of *distinct* stopwords present (set semantics keeps the
    SQL twin simple and order-independent)."""
    return _contains_any(tokens(text), STOPWORDS[lang])


def STOPWORD_HITS_SQL(expr: str = "text", lang: str = "en") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CAST(len(list_intersect(list_distinct({TOKENS_SQL(expr)}), "
        f"[{words}])) AS BIGINT)"
    )


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars, rounded for cross-engine hash."""
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return F.round(n_punct.cast("double") / F.length(text).cast("double"), 6)


def PUNCT_RATIO_SQL(expr: str = "text") -> str:
    return (
        f"ROUND(CAST(length(regexp_replace({expr}, '[^.,;:!?]', '', 'g')) "
        f"AS DOUBLE) / CAST(length({expr}) AS DOUBLE), 6)"
    )


def quality_score(text: Column) -> Column:
    """Heuristic doc-quality score in [0,1]: rewards stopword presence
    and mid-range length, penalizes punctuation soup.  Deterministic
    closed form — the exact formula is mirrored in QUALITY_SCORE_SQL."""
    n_tok = token_count(text).cast("double")
    sw = stopword_hits(text, "en").cast("double")
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(sw / F.lit(5.0), F.lit(1.0))
    punct_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - punct_ratio(text) * F.lit(4.0)
    )
    return F.round(
        length_term * F.lit(0.4) + stop_term * F.lit(0.4)
        + punct_term * F.lit(0.2),
        6,
    )


def QUALITY_SCORE_SQL(expr: str = "text") -> str:
    n_tok = f"CAST(len({TOKENS_SQL(expr)}) AS DOUBLE)"
    sw = f"CAST({STOPWORD_HITS_SQL(expr)} AS DOUBLE)"
    return (
        f"ROUND(least({n_tok} / 100.0, 1.0) * 0.4 "
        f"+ least({sw} / 5.0, 1.0) * 0.4 "
        f"+ greatest(0.0, 1.0 - {PUNCT_RATIO_SQL(expr)} * 4.0) * 0.2, 6)"
    )


def lang_scores(text: Column) -> Column:
    """Struct of per-language distinct-stopword hit counts."""
    toks = tokens(text)
    return F.struct(
        *[_contains_any(toks, STOPWORDS[lang]).alias(lang)
          for lang in STOPWORDS]
    )


def predicted_lang(text: Column) -> Column:
    """argmax over per-language stopword hits with deterministic
    smallest-lang tiebreak; 'und' (undetermined) when no stopwords hit.

    Single pass: the token array is let_-bound (tokenized once, not
    once per language) and the argmax is ``array_max`` over
    (score, neg_rank, lang) structs — struct comparison is score
    first, then neg_rank, so ties resolve to the lexicographically
    smallest language.  A chained when/otherwise fold would duplicate
    every score expression O(langs^2) times (the collapsed-projection
    trap, functions/expr.py)."""
    langs = sorted(STOPWORDS)

    def pick(toks: Column) -> Column:
        cands = F.array(*[
            F.struct(
                _contains_any(toks, STOPWORDS[lang]).alias("score"),
                F.lit(-i).alias("neg_rank"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ])
        best = F.array_max(cands)
        return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))

    return let_(tokens(text), pick)


def PREDICTED_LANG_SQL(expr: str = "text") -> str:
    """SQL twin of predicted_lang: same fold, same tiebreak order."""
    langs = sorted(STOPWORDS)
    score = {la: STOPWORD_HITS_SQL(expr, la) for la in langs}
    best, best_score = f"'{langs[0]}'", score[langs[0]]
    for la in langs[1:]:
        cond = f"({score[la]}) > ({best_score})"
        best = f"CASE WHEN {cond} THEN '{la}' ELSE {best} END"
        best_score = f"CASE WHEN {cond} THEN ({score[la]}) ELSE ({best_score}) END"
    return f"CASE WHEN ({best_score}) > 0 THEN {best} ELSE 'und' END"


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), the MinHash input unit.

    The token array is let_-bound so the regex split runs once per row;
    referencing ``tokens(text)`` directly inside the transform lambda
    would re-split the text for every ``element_at`` (40x slower on the
    sf0.1 documents table)."""

    def grams_of(toks: Column) -> Column:
        k = F.size(toks)
        idx = F.sequence(F.lit(0), k - n)
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)],
            ),
        )
        empty = F.array().cast("array<string>")
        return F.when(k >= n, grams).otherwise(empty)

    return F.array_distinct(let_(tokens(text), grams_of))


def fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set (md5 is identical in Spark and DuckDB)."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(text))), " ")
    return F.md5(canon)


def FINGERPRINT_SQL(expr: str = "text") -> str:
    return (
        f"md5(array_to_string(list_sort(list_distinct({TOKENS_SQL(expr)})), ' '))"
    )


def char_entropy(text: Column) -> Column:
    """Character-level Shannon entropy in bits — the classic gibberish
    / boilerplate signal for corpus quality gates (low entropy =
    repeated filler, high = random bytes).

    Map-only and fully codegen'd: per-row higher-order functions over
    the char array, no explode, no shuffle, no UDF — at 100 TB this is
    a pure scan-side column.  The distinct alphabet is SORTED before
    the fold so the float accumulation order is deterministic and
    identical to the SQL twin (list_sort there), keeping the 6-dp
    rounding oracle-stable.  Per-row cost is O(alphabet * len); for
    natural-language bytes the alphabet is ~30-100 symbols."""
    cs = F.split(text, "")
    n = F.size(cs).cast("double")
    probs = F.transform(
        F.array_sort(F.array_distinct(cs)),
        lambda c: F.size(F.filter(cs, lambda x: x == c)) / n,
    )
    h = -F.aggregate(
        probs, F.lit(0.0), lambda acc, p: acc + p * F.log2(p))
    return F.round(h, 6)


def CHAR_ENTROPY_SQL(expr: str = "text") -> str:
    return (
        f"round(-list_sum(list_transform("
        f"list_sort(list_distinct(string_split({expr}, ''))), "
        f"c -> (CAST(len(list_filter(string_split({expr}, ''), "
        f"x -> x = c)) AS DOUBLE) / len(string_split({expr}, ''))) "
        f"* log2(CAST(len(list_filter(string_split({expr}, ''), "
        f"x -> x = c)) AS DOUBLE) / len(string_split({expr}, '')))))"
        f", 6)"
    )
