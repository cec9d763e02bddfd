from wrds2pg_spark.plans.options import (
    expand_col_spec,
    parse_col_list,
    parse_rename,
    translate_where,
)


def test_parse_col_list():
    assert parse_col_list("a B c:") == ["a", "b", "c:"]
    assert parse_col_list(None) == []
    assert parse_col_list("") == []


def test_expand_prefix_wildcards():
    cols = ["prior_a", "prior_b", "match_name", "usdval", "keepme"]
    # the reference's observed drop string shape (wrds_update_test.ipynb)
    assert expand_col_spec("prior: match: usdval", cols) == [
        "prior_a", "prior_b", "match_name", "usdval",
    ]
    assert expand_col_spec("keepme nosuch", cols) == ["keepme", "nosuch"]


def test_parse_rename():
    assert parse_rename("fee=mgt_fee A=b") == {"fee": "mgt_fee", "a": "b"}
    assert parse_rename(None) == {}


def test_parse_rename_bad():
    import pytest
    with pytest.raises(ValueError):
        parse_rename("feemgt_fee")


def test_translate_where_missing():
    assert (
        translate_where("event_start_date_utc is not missing")
        == "event_start_date_utc IS NOT NULL"
    )
    assert translate_where("x is missing") == "x IS NULL"


def test_translate_where_ops_and_dates():
    assert translate_where("a ge 5 and b ne 3") == "a >= 5 and b <> 3"
    assert translate_where("d le '02SEP1998'd") == "d <= DATE '1998-09-02'"
    assert translate_where("x ^= 1") == "x <> 1"
    assert translate_where(None) is None
