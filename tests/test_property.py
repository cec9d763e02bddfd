"""Property-based tests (hypothesis) for the pure-Python layers:
SAS option parsers (A4-A8), the type-inference decision table (A15),
and the modified-stamp codec (A16/A24) — SURVEY §5 names these as the
directly property-testable ports."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from wrds2pg_spark.catalog import modified_decode, modified_encode
from wrds2pg_spark.plans.options import (
    expand_col_spec,
    parse_rename,
    translate_where,
)
from wrds2pg_spark.plans.types import pg_type_for_sas_row

_ident = st.text(
    alphabet=string.ascii_lowercase + "_", min_size=1, max_size=8
).filter(lambda s: not s.startswith("_"))


@given(st.lists(_ident, min_size=1, max_size=10, unique=True))
def test_expand_col_spec_plain_names_roundtrip(cols):
    # a spec listing every column verbatim selects exactly those
    assert expand_col_spec(" ".join(cols), cols) == cols


@given(st.lists(_ident, min_size=1, max_size=10, unique=True), st.data())
def test_expand_col_spec_prefix_wildcard(cols, data):
    prefix = data.draw(st.sampled_from(cols))[:2]
    out = expand_col_spec(f"{prefix}:", cols)
    # wildcard selects exactly the columns with that prefix, in order
    assert out == [c for c in cols if c.startswith(prefix)]


@given(st.lists(st.tuples(_ident, _ident), min_size=1, max_size=8))
def test_parse_rename_pairs(pairs):
    # later pairs win on duplicate keys, like SAS rename processing
    spec = " ".join(f"{a}={b}" for a, b in pairs)
    out = parse_rename(spec)
    want = {a: b for a, b in pairs}
    assert out == want


@given(
    st.integers(min_value=1, max_value=2),
    st.sampled_from([
        "", "BEST", "best", "BEST12.", "DATETIME20.", "TIME8.", "TOD",
        "YYMMDD10.", "MMDDYY8.", "DATE9.", "COMMA12.", "E8601DT19.",
    ]),
    st.integers(min_value=0, max_value=32),
    st.integers(min_value=0, max_value=8),
)
def test_type_inference_total_and_in_vocab(sas_type, fmt, formatl, formatd):
    """The decision table is total (never raises) and lands in the
    reference's output vocabulary; rule precedence holds."""
    out = pg_type_for_sas_row({
        "name": "v", "type": sas_type, "format": fmt,
        "formatl": formatl, "formatd": formatd, "length": 8,
    })
    assert out in {"text", "timestamp", "time", "date", "float8", "integer"}
    if sas_type == 2:
        assert out == "text"                    # char beats every format rule
    elif "DATETIME" in fmt:
        assert out == "timestamp"
    elif fmt == "E8601DT19.":
        # matches the reference: /datetime/i does NOT match E8601DT,
        # so the export format falls through to the numeric rules
        assert out in {"integer", "float8"}
    elif fmt in ("TIME8.", "TOD"):
        assert out == "time"
    elif fmt in ("YYMMDD10.", "MMDDYY8.", "DATE9."):
        assert out == "date"
    elif fmt.upper() == "BEST":
        # metadata.py:282 upper-cases before the exact match
        assert out == "float8"
    elif fmt == "BEST12.":
        # reference quirk: only bare BEST matches the float rule
        assert out in {"integer", "float8"}


@given(st.integers(min_value=0, max_value=4_102_444_800))  # 1970..2100
@settings(max_examples=300)
def test_modified_codec_roundtrip_epoch(epoch):
    """decode -> encode returns the original epoch except inside the
    fall-back DST hour, where the wall-time string is genuinely
    ambiguous and the codec may land one hour off (the reference
    shares this: csv.py renders wall time with no fold marker)."""
    s = modified_decode(float(epoch))
    back = modified_encode(s)
    assert abs(back - epoch) in (0.0, 3600.0)
    # the rendered string itself is stable
    assert modified_decode(back) == s


def test_translate_where_examples():
    # spot invariants the fuzz can't state: dialect keywords translate
    assert "IS NOT NULL" in translate_where("x is not missing")
    assert "IS NULL" in translate_where("x is missing")
    assert translate_where(None) is None


@given(
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=1, max_value=12),
    st.binary(min_size=0, max_size=120),
)
@settings(max_examples=200, deadline=None)
def test_png_filter_roundtrip_all_types(ftype, width, payload):
    """PNG scanline filters invert exactly for every filter type,
    width, and byte content (spec §9): filter(unfilter(x)) == x with
    an arbitrary previous scanline."""
    import numpy as np

    from wrds2pg_spark.operators.multimodal import (
        _png_filter_row, _png_unfilter_row,
    )

    rowlen = width * 3
    buf = (payload * (2 * rowlen // max(1, len(payload)) + 1)
           if payload else b"\x00" * 2 * rowlen)
    row = np.frombuffer(buf[:rowlen], dtype=np.uint8).copy()
    prev = np.frombuffer(buf[rowlen:2 * rowlen], dtype=np.uint8).copy()
    filtered = _png_filter_row(ftype, row, prev)
    back = _png_unfilter_row(ftype, filtered, prev.astype(np.int64))
    assert back.tobytes() == row.tobytes(), (ftype, width)


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6),
    min_size=0, max_size=200))
def test_chunk_overlap_covers_and_reconstructs(tokens):
    """Pure-Python model of text_chunk_overlap's contract (W=48,
    S=32): (1) chunk starts are exactly 0, S, 2S, ... while < n;
    (2) every token index is covered by >= 1 chunk; (3) concatenating
    each chunk's NON-overlapping prefix (first S tokens; the final
    chunk contributes everything past the previous coverage)
    reconstructs the document exactly; (4) every chunk is <= W tokens
    and only the tail chunks may be shorter."""
    W, S = 48, 32
    n = len(tokens)
    starts = list(range(0, n, S))
    chunks = [tokens[s:s + W] for s in starts]
    if n == 0:
        assert chunks == []
        return
    # coverage
    covered = set()
    for s, c in zip(starts, chunks):
        assert 1 <= len(c) <= W
        covered.update(range(s, s + len(c)))
    assert covered == set(range(n))
    # stride-prefix reconstruction
    rebuilt = []
    for i, (s, c) in enumerate(zip(starts, chunks)):
        take = c[:S] if i < len(chunks) - 1 else c[len(rebuilt) - s:]
        rebuilt.extend(take)
    assert rebuilt == tokens
    # every chunk except the tail ones (inside the last window) is
    # full-width
    for s, c in zip(starts, chunks):
        if s + W <= n:
            assert len(c) == W


@given(st.lists(st.integers(min_value=-(10 ** 14), max_value=10 ** 14),
                min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_split_sum_identity(products):
    """finance._split_sums contract, pure-Python replica: summing the
    arithmetic-shift hi terms and masked lo terms separately and
    recombining as hi*2^26 + lo reconstructs the exact integer sum
    for ANY int64 products, negatives included (two's-complement
    identity p == (p>>26)*2^26 + (p & (2^26-1)))."""
    from wrds2pg_spark.finance import _MASK, _SPLIT

    hi = sum(p >> _SPLIT for p in products)
    lo = sum(p & _MASK for p in products)
    assert hi * (1 << _SPLIT) + lo == sum(products)


# ---------------------------------------------------------------------------
# sas7bdat writer <-> pandas.read_sas round-trip (round 7)
# ---------------------------------------------------------------------------

_sas_name = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz_"),
    min_size=1, max_size=12)
# SAS char fields are space-padded and the reader right-strips, so
# trailing spaces/NULs are not representable — exclude them (the
# writer docstring records the same fixed-width contract)
_sas_str = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00"),
    min_size=0, max_size=24,
).map(lambda s: s.rstrip(" \x00"))
_sas_num = st.one_of(
    st.floats(allow_nan=False, allow_infinity=True, width=64),
    st.integers(-2**53, 2**53).map(float),
)


@settings(max_examples=25, deadline=None)
@given(
    names=st.lists(_sas_name, min_size=1, max_size=5, unique=True),
    data=st.data(),
)
def test_sas7bdat_roundtrip_property(tmp_path_factory, names, data):
    """Any frame of float64 / string columns survives the hand-built
    binary sas7bdat byte-for-byte: doubles exactly (they ARE the SAS
    representation), strings up to the fixed-width right-strip."""
    import numpy as np
    import pandas as pd

    from wrds2pg_spark.sinks.sas7bdat import write_sas7bdat

    n = data.draw(st.integers(0, 60))
    cols = {}
    for i, name in enumerate(names):
        if data.draw(st.booleans(), label=f"is_num_{i}"):
            cols[name] = pd.Series(
                data.draw(st.lists(_sas_num, min_size=n, max_size=n)),
                dtype="float64")
        else:
            cols[name] = pd.Series(
                data.draw(st.lists(_sas_str, min_size=n, max_size=n)),
                dtype=object)
    src = pd.DataFrame(cols, columns=list(cols))
    path = str(tmp_path_factory.mktemp("sasprop") / "t.sas7bdat")
    # tiny pages force the multi-page path whenever n is nontrivial
    write_sas7bdat(src, path, page_length=1024)
    if n == 0:
        out = pd.read_sas(path, format="sas7bdat")
        assert len(out) == 0
        return
    out = pd.read_sas(path, format="sas7bdat")
    assert list(out.columns) != [] and len(out) == n
    # reader emits doubles first (physical layout order)
    for name in src.columns:
        got = out[name]
        if src[name].dtype == "float64":
            assert np.array_equal(
                got.to_numpy(dtype="float64"),
                src[name].to_numpy(dtype="float64"),
                equal_nan=True), name
        else:
            # '' is indistinguishable from SAS missing-char (all
            # spaces) and reads back as NaN — real SAS semantics
            want = [v if v != "" else None for v in src[name]]
            dec = [v.decode("utf-8") if isinstance(v, bytes)
                   else (None if v is None or v != v else v)
                   for v in got]
            assert dec == want, name
