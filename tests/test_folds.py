"""Reference-checked tests for the row-local sorted-run folds
(corpus.py max_run_expr / hapax_count_expr) — the codegen'd
aggregate() expressions behind text_repetition_topgram and
text_hapax_ratio.

Hypothesis-per-example would pay a Spark job per case; instead one
job evaluates the folds over a seeded random corpus PLUS pinned edge
cases, and every row is compared against a plain-Python Counter
reference.
"""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from wrds2pg_spark.corpus import hapax_count_expr, max_run_expr

VOCAB = ["a", "b", "bb", "x y", "", "Z", "0", "é"]

EDGE_CASES = [
    [],                         # empty array -> 0 / 0
    [""],                       # single empty string (sentinel clash)
    ["", ""],                   # repeated empty string
    ["", "a", ""],              # empty interleaved
    ["a"],                      # singleton
    ["a", "a", "a"],            # one run
    ["a", "b", "c"],            # all hapax
]


def _corpus():
    rng = random.Random(0xC0FFEE)
    rows = list(EDGE_CASES)
    for _ in range(200):
        n = rng.randint(0, 30)
        rows.append([rng.choice(VOCAB) for _ in range(n)])
    return rows


def _ref_max_run(toks):
    return max(Counter(toks).values(), default=0)


def _ref_hapax(toks):
    return sum(1 for c in Counter(toks).values() if c == 1)


def test_folds_match_counter_reference(spark):
    rows = _corpus()
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "i long, t array<string>"
    )
    got = {
        r["i"]: (r["mr"], r["hx"])
        for r in df.select(
            "i",
            max_run_expr("t").alias("mr"),
            hapax_count_expr("t").alias("hx"),
        ).collect()
    }
    for i, toks in enumerate(rows):
        assert got[i] == (_ref_max_run(toks), _ref_hapax(toks)), (
            i, toks, got[i])
