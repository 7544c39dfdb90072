"""General as-of join operator (operators/asof.py): all three
directions, tolerance, equal-ts inclusion, right-side tiebreak."""

from __future__ import annotations

import datetime

from big_data_analysis_diseases_outbreaks_spark.operators.asof import asof_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(30)), (3, "v", _ts(5))],
        "id BIGINT, k STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [("u", _ts(8), 100.0), ("u", _ts(29), 200.0), ("u", _ts(31), 300.0)],
        "k STRING, ts TIMESTAMP, px DOUBLE",
    )
    return left, right


def _collect(df):
    return {
        r["id"]: (
            None
            if r["asof"] is None
            else (r["asof"]["ts"], r["asof"]["px"])
        )
        for r in df.collect()
    }


def test_backward(spark):
    left, right = _frames(spark)
    got = _collect(asof_join(left, right, "k", "ts", "backward"))
    assert got == {
        1: (_ts(8), 100.0),
        2: (_ts(29), 200.0),
        3: None,  # key v has no reference rows
    }


def test_forward(spark):
    left, right = _frames(spark)
    got = _collect(asof_join(left, right, "k", "ts", "forward"))
    assert got == {1: (_ts(29), 200.0), 2: (_ts(31), 300.0), 3: None}


def test_nearest_prefers_smaller_gap_then_backward(spark):
    left, right = _frames(spark)
    got = _collect(asof_join(left, right, "k", "ts", "nearest"))
    # id 1: backward gap 2 < forward gap 19; id 2: backward gap 1 ==
    # forward gap 1 -> tie goes BACKWARD
    assert got == {1: (_ts(8), 100.0), 2: (_ts(29), 200.0), 3: None}


def test_equal_ts_matches_in_both_directions(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10))], "id BIGINT, k STRING, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [("u", _ts(10), 9.0)], "k STRING, ts TIMESTAMP, px DOUBLE"
    )
    for d in ("backward", "forward", "nearest"):
        got = _collect(asof_join(left, right, "k", "ts", d))
        assert got == {1: (_ts(10), 9.0)}, d


def test_tolerance_nulls_far_matches(spark):
    left, right = _frames(spark)
    got = _collect(
        asof_join(
            left, right, "k", "ts", "backward",
            tolerance_us=60_000_000,  # 1 minute
        )
    )
    # id 2's backward match at gap 60s passes; id 1's at 120s nulls out
    assert got == {1: None, 2: (_ts(29), 200.0), 3: None}


def test_right_tiebreak_greatest_wins(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10))], "id BIGINT, k STRING, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [("u", _ts(5), 1.0, 7), ("u", _ts(5), 2.0, 9)],
        "k STRING, ts TIMESTAMP, px DOUBLE, seq BIGINT",
    )
    got = asof_join(
        left, right, "k", "ts", "backward", tiebreak_col="seq"
    ).collect()
    assert len(got) == 1 and got[0]["asof"]["px"] == 2.0


def test_invalid_direction_raises(spark):
    left, right = _frames(spark)
    try:
        asof_join(left, right, "k", "ts", "sideways")
    except ValueError as exc:
        assert "direction" in str(exc)
    else:
        raise AssertionError("expected ValueError")
