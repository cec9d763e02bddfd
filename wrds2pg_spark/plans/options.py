"""Parsers for the reference's SAS-style ingest option strings.

The reference pushes these options into SAS dataset options on the
generated ``data`` step (wrds2pg/sas/codegen.py:35-69); here they are
pure string->plan functions whose output feeds plain DataFrame
transforms, so Catalyst still sees a fully declarative plan (column
pruning / predicate pushdown intact).

Supported surface (kept deliberately equal to what the reference
accepts):

- ``keep`` / ``drop``: space-separated column names with SAS prefix
  wildcards ``name:`` (e.g. ``drop="prior: match: usdval"``,
  cf. wrds2pg/sas/codegen.py:52-60 and wrds_update_test.ipynb).
- ``rename``: SAS pair syntax ``old=new old2=new2``
  (wrds2pg/sas/codegen.py:35-38).
- ``where``: a small, explicit SAS-where -> Spark-SQL translation
  (``is [not] missing``, ``eq/ne/gt/lt/ge/le``, ``'01JAN2020'd`` date
  literals).  Unknown SAS-isms pass through verbatim — Spark's parser
  raises loudly on anything untranslatable, matching SURVEY §7's
  "fail loudly" decision.
"""

from __future__ import annotations

import re

__all__ = [
    "parse_col_list",
    "expand_col_spec",
    "parse_rename",
    "translate_where",
]


def parse_col_list(spec: str | None) -> list[str]:
    """``"a b c:"`` -> ``["a", "b", "c:"]`` (lower-cased, order kept)."""
    if not spec:
        return []
    return [tok.lower() for tok in spec.split()]


def expand_col_spec(spec: str | None, columns: list[str]) -> list[str]:
    """Expand a keep/drop spec against actual (lower-case) column names.

    SAS prefix wildcards ``p:`` match every column starting with ``p``
    (wrds2pg/sas/codegen.py:52-60 passes them through to SAS, which
    expands them; we expand ourselves).  Plain names are kept whether or
    not present — Spark's ``select`` will raise on a missing keep column,
    while ``drop`` silently ignores, matching SAS dataset-option behavior
    closely enough for the reference's observed usage.
    """
    cols_lower = [c.lower() for c in columns]
    out: list[str] = []
    for tok in parse_col_list(spec):
        if tok.endswith(":"):
            prefix = tok[:-1]
            out.extend(c for c in cols_lower if c.startswith(prefix))
        else:
            out.append(tok)
    # de-dup, preserve order
    seen: set[str] = set()
    return [c for c in out if not (c in seen or seen.add(c))]


def parse_rename(spec: str | None) -> dict[str, str]:
    """``"fee=mgt_fee a=b"`` -> ``{"fee": "mgt_fee", "a": "b"}``.

    Reference syntax: space-separated ``old=new`` pairs spliced into a
    SAS ``rename=(...)`` dataset option (wrds2pg/sas/codegen.py:35-38).
    """
    if not spec:
        return {}
    mapping: dict[str, str] = {}
    for pair in spec.split():
        if "=" not in pair:
            raise ValueError(f"bad rename pair (want old=new): {pair!r}")
        old, new = pair.split("=", 1)
        if not old or not new:
            raise ValueError(f"bad rename pair (want old=new): {pair!r}")
        mapping[old.lower()] = new.lower()
    return mapping


_MISSING_NOT = re.compile(r"(\b[\w.]+\b)\s+is\s+not\s+missing", re.IGNORECASE)
_MISSING = re.compile(r"(\b[\w.]+\b)\s+is\s+missing", re.IGNORECASE)
# SAS date literal '01JAN2020'd  -> DATE '2020-01-01'
_SAS_DATE = re.compile(r"'(\d{2})([A-Za-z]{3})(\d{4})'d", re.IGNORECASE)
_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}
# word-style comparison operators: eq ne gt lt ge le
_WORD_OPS = {
    "eq": "=", "ne": "<>", "gt": ">", "lt": "<", "ge": ">=", "le": "<=",
}
_WORD_OP_RE = re.compile(r"\b(eq|ne|gt|lt|ge|le)\b", re.IGNORECASE)


def translate_where(expr: str | None) -> str | None:
    """Translate the observed SAS ``where=`` dialect into Spark SQL.

    Coverage is intentionally the set of constructs the reference's
    notebooks actually use (tz_test.ipynb ``"event_start_date_utc is not
    missing"``; comparison ops; and/or/not pass through unchanged) plus
    SAS date literals.  Anything else passes through to Spark's SQL
    parser, which errors loudly rather than silently mis-filtering.
    """
    if not expr:
        return None
    out = _MISSING_NOT.sub(r"\1 IS NOT NULL", expr)
    out = _MISSING.sub(r"\1 IS NULL", out)

    def _date(m: re.Match[str]) -> str:
        day, mon, year = m.group(1), m.group(2).lower(), m.group(3)
        return f"DATE '{year}-{_MONTHS[mon]:02d}-{day}'"

    out = _SAS_DATE.sub(_date, out)
    out = _WORD_OP_RE.sub(lambda m: _WORD_OPS[m.group(1).lower()], out)
    # SAS not-equals spelled ^= or ~=
    out = out.replace("^=", "<>").replace("~=", "<>")
    return out
