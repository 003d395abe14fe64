"""Session-grain market-basket co-occurrence
(operators/relational.py:session_cooccurrence): planted-session semantics
(set-not-multiset, gap boundaries, tie determinism), the exact-integer
lift flag vs a float computation, validation, and the staged
q_session_pairs candidate's two-scale oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.relational import session_cooccurrence


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, f"2024-03-01 10:{m:02d}:00", t) for i, (u, m, t) in enumerate(rows)],
        "event_id long, user_id long, ts_s string, event_type string",
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"), "event_type")


def _run(spark, rows, **kw):
    df = _ev(spark, rows)
    out = session_cooccurrence(df, "user_id", "ts", "event_id", "event_type", **kw)
    return {(r.type_a, r.type_b): r for r in out.collect()}


def test_planted_sessions_sets_and_gaps(spark):
    """User 1: one session with a,b,b,c (b counted ONCE); a 40-min gap
    starts a second session with only d — d pairs with nothing. User 2:
    a,b again. So (a,b) co-occurs in 2 of 4 sessions, (a,c) in 1."""
    rows = [
        (1, 0, "a"), (1, 5, "b"), (1, 10, "b"), (1, 15, "c"),
        (1, 55, "d"),                      # new session (40-min gap)
        (2, 0, "a"), (2, 3, "b"),
        (3, 0, "e"),                       # singleton session, no pairs
    ]
    got = _run(spark, rows, gap_s=1800, min_support=1)
    assert got[("a", "b")].n_ab == 2 and got[("a", "c")].n_ab == 1
    assert got[("b", "c")].n_ab == 1
    assert not any("d" in p or "e" in p for p in got)
    r = got[("a", "b")]
    assert (r.n_a, r.n_b, r.n_sessions) == (2, 2, 4)
    # lift flag AND exact-ppm column == the float computation on every pair
    for (a, b), row in got.items():
        lift = (row.n_ab * row.n_sessions) / (row.n_a * row.n_b)
        assert row.lift_gt_1 == (lift > 1), (a, b)
        assert row.lift_ppm == (1_000_000 * row.n_ab * row.n_sessions) // (
            row.n_a * row.n_b
        ), (a, b)
    # (a,b): 2*4 > 2*2 -> positive association, lift 2.0 exactly
    assert got[("a", "b")].lift_gt_1 is True
    assert got[("a", "b")].lift_ppm == 2_000_000


def test_min_support_and_validation(spark):
    rows = [(1, 0, "a"), (1, 1, "b"), (2, 0, "a"), (2, 1, "c")]
    got = _run(spark, rows, min_support=1)
    assert set(got) == {("a", "b"), ("a", "c")}
    got2 = _run(spark, rows, min_support=2)
    assert set(got2) == set()
    df = _ev(spark, rows)
    with pytest.raises(ValueError, match="gap_s"):
        session_cooccurrence(df, "user_id", "ts", "event_id", "event_type", gap_s=0)
    with pytest.raises(ValueError, match="min_support"):
        session_cooccurrence(
            df, "user_id", "ts", "event_id", "event_type", min_support=0
        )


def test_tie_determinism(spark):
    """Same-instant events: the (ts, event_id) total order pins the
    running-sum session boundary — a run over a shuffled, repartitioned,
    REVERSED-row-order copy of the input agrees exactly with the
    original (re-running the identical plan would pass even without the
    tiebreaker; a different physical layout would not)."""
    rows = [(1, 0, "a"), (1, 0, "b"), (1, 0, "c")] * 3
    df = _ev(spark, rows)
    scrambled = (
        df.orderBy(F.col("event_id").desc()).repartition(7).sortWithinPartitions(
            F.col("event_type").desc()
        )
    )
    a = {
        (r.type_a, r.type_b): tuple(r)
        for r in session_cooccurrence(
            df, "user_id", "ts", "event_id", "event_type"
        ).collect()
    }
    b = {
        (r.type_a, r.type_b): tuple(r)
        for r in session_cooccurrence(
            scrambled, "user_id", "ts", "event_id", "event_type"
        ).collect()
    }
    assert a == b and len(a) > 0


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_session_pairs_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof: exact values, driver-safe types, both
    local scales; lift_ppm carries varied non-trivial values (the flag is
    honestly all-False on the independent synthetic types)."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import (
        SESSION_PAIRS_ORACLE,
        q_session_pairs,
    )

    sdf = q_session_pairs(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == [
        "string", "string", "bigint", "bigint", "bigint", "bigint",
        "bigint", "boolean",
    ]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    rel = con.sql(SESSION_PAIRS_ORACLE)
    assert all(
        str(t) in {"VARCHAR", "BIGINT", "BOOLEAN"} for t in rel.types
    ), [str(t) for t in rel.types]
    drows = sorted(tuple(r) for r in con.execute(SESSION_PAIRS_ORACLE).fetchall())
    con.close()
    assert len(srows) > 0
    # independent synthetic types: lift never exceeds 1 on this fixture
    # (the flag's exactness is pinned on planted sessions above); the
    # ppm column carries non-trivial varied values
    assert len({r[6] for r in srows}) > 1
    assert all(0 < r[6] <= 1_000_000 for r in srows)
    assert srows == drows


def test_event_transitions_planted(spark):
    """Ordered adjacency: a->b->b->c in one session plus a gap-isolated d;
    self-transition counted; session boundary produces NO transition;
    p_ppm rows sum to ~1e6 per type_from."""
    from chess_lakehouse_spark.operators.relational import event_transitions

    rows = [
        (1, 0, "a"), (1, 5, "b"), (1, 10, "b"), (1, 15, "c"),
        (1, 55, "d"),                       # new session: no c->d edge
        (2, 0, "a"), (2, 3, "b"),
    ]
    df = _ev(spark, rows)
    got = {
        (r.type_from, r.type_to): r
        for r in event_transitions(
            df, "user_id", "ts", "event_id", "event_type"
        ).collect()
    }
    assert got[("a", "b")].n_trans == 2
    assert got[("b", "b")].n_trans == 1 and got[("b", "c")].n_trans == 1
    assert ("c", "d") not in got
    assert got[("a", "b")].n_from == 2 and got[("a", "b")].p_ppm == 1_000_000
    assert got[("b", "b")].n_from == 2 and got[("b", "b")].p_ppm == 500_000
    by_from = {}
    for (f, _), r in got.items():
        by_from.setdefault(f, []).append(r.p_ppm)
    for f, ppms in by_from.items():
        assert 1_000_000 - len(ppms) < sum(ppms) <= 1_000_000, f
    with pytest.raises(ValueError, match="min_count"):
        event_transitions(
            df, "user_id", "ts", "event_id", "event_type", min_count=0
        )


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_event_transitions_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof for the transitions candidate."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import (
        EVENT_TRANSITIONS_ORACLE,
        q_event_transitions,
    )

    sdf = q_event_transitions(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == [
        "string", "string", "bigint", "bigint", "bigint",
    ]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    rel = con.sql(EVENT_TRANSITIONS_ORACLE)
    assert all(
        str(t) in {"VARCHAR", "BIGINT"} for t in rel.types
    ), [str(t) for t in rel.types]
    drows = sorted(
        tuple(r) for r in con.execute(EVENT_TRANSITIONS_ORACLE).fetchall()
    )
    con.close()
    assert len(srows) > 0
    assert len({r[4] for r in srows}) > 3  # varied exact probabilities
    assert srows == drows


def test_assign_sessions_contracts(spark):
    """The shared session assigner (review findings, fixed): NULL
    timestamps are dropped rather than silently glued to a neighbor
    session; pre-existing out_col/internal columns raise loudly."""
    from chess_lakehouse_spark.operators.relational import assign_sessions

    rows = [(1, 0, "a"), (1, 5, "b")]
    df = _ev(spark, rows)
    with_null = df.unionByName(
        spark.createDataFrame(
            [(99, 1, None, "z")],
            "event_id long, user_id long, ts timestamp, event_type string",
        )
    )
    out = assign_sessions(with_null, "user_id", "ts", "event_id")
    assert out.count() == 2 and out.where(F.col("event_id") == 99).count() == 0
    with pytest.raises(ValueError, match="sess"):
        assign_sessions(
            df.withColumn("sess", F.lit(1)), "user_id", "ts", "event_id"
        )
