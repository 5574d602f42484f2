"""Property tests for the event operators: random seeded event streams
checked against DuckDB (as-of) and a pure-Python oracle (funnel,
retention) — the example-based tests pin the boundary semantics, these
sweep the space."""

import datetime as dt
import random

import duckdb
import pytest

EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)
TYPES = ["signup", "view", "click", "purchase", "error"]


def _random_events(seed: int, n_users: int = 12, n_events: int = 300):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for eid in range(n_events):
        # coarse timestamps on purpose: collisions exercise ties
        ts = base + dt.timedelta(minutes=rng.randrange(0, 2000) * 7)
        rows.append(
            (eid, ts, rng.randrange(1, n_users + 1), rng.choice(TYPES),
             round(rng.uniform(0, 50), 2), "")
        )
    return rows


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_asof_join_matches_duckdb_asof(spark, tmp_path, seed):
    from jassjr_spark.operators.events import asof_join

    rows = _random_events(seed)
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    purch = ev.filter("event_type = 'purchase'")
    out = asof_join(clicks, purch, on="user_id", ts="ts", right_cols=("value",))
    got = {
        (r.event_id, r.asof.r_ts if r.asof else None,
         r.asof.value if r.asof else None)
        for r in out.collect()
    }

    p = str(tmp_path / f"ev{seed}.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = {
        (eid, rts, val)
        for eid, rts, val in con.execute("""
            WITH pd AS (
              SELECT user_id, ts, max(value) AS value
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
            ),
            c AS (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click')
            SELECT c.event_id, pd.ts, pd.value
            FROM c ASOF LEFT JOIN pd
              ON c.user_id = pd.user_id AND c.ts >= pd.ts
        """).fetchall()
    }
    assert got == want


def test_epoch_bucket_floors_pre_1970(spark):
    """Week/day bucketing must FLOOR for negative epochs: an event just
    before 1970 belongs to bucket -1, not bucket 0 (cast('long') after
    double division truncates toward zero and would merge them)."""
    import pyspark.sql.functions as F

    from jassjr_spark.operators.events import epoch_bucket

    DAY_US = 86_400_000_000
    rows = [
        (dt.datetime(1969, 12, 31, 23, 0), -1),
        (dt.datetime(1970, 1, 1, 1, 0), 0),
        (dt.datetime(1969, 12, 25, 0, 0), -7),
        (dt.datetime(1969, 12, 24, 23, 59, 59), -8),
        (dt.datetime(1970, 1, 2, 0, 0), 1),
    ]
    df = spark.createDataFrame(
        [(ts,) for ts, _ in rows], "ts timestamp_ntz"
    ).select(
        "ts",
        epoch_bucket(F.col("ts").cast("timestamp"), DAY_US).alias("day"),
    )
    got = {r.ts: r.day for r in df.collect()}
    for ts, want in rows:
        assert got[ts] == want, (ts, got[ts], want)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_asof_join_multicol_ties_row_consistent(spark, tmp_path, seed):
    """Multi-column right payloads with engineered (key, ts) ties: the
    tie winner must be ONE real row (lexicographic struct-max), never a
    per-column-max chimera. Checked against DuckDB's ASOF join over the
    same struct-max dedup."""
    from jassjr_spark.operators.events import asof_join

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    # few distinct timestamps -> many exact (user_id, ts) collisions;
    # label sorts OPPOSITE to value so per-column max() would mix rows
    right_rows, left_rows = [], []
    for i in range(200):
        ts = base + dt.timedelta(hours=rng.randrange(0, 24))
        v = float(rng.randrange(0, 9))
        right_rows.append(
            (rng.randrange(1, 6), ts, v, chr(ord("z") - int(v)))
        )
    for eid in range(120):
        ts = base + dt.timedelta(minutes=rng.randrange(0, 24 * 60))
        left_rows.append((eid, rng.randrange(1, 6), ts))
    right = spark.createDataFrame(
        right_rows, "user_id long, ts timestamp_ntz, value double,"
        " label string"
    )
    left = spark.createDataFrame(
        left_rows, "event_id long, user_id long, ts timestamp_ntz"
    )
    out = asof_join(left, right, right_cols=("value", "label"))
    got = {
        (r.event_id, r.asof.r_ts if r.asof else None,
         r.asof.value if r.asof else None,
         r.asof.label if r.asof else None)
        for r in out.collect()
    }
    # every non-null (value, label) pair must be a row that exists
    real = {(v, l) for _, _, v, l in right_rows}
    assert all(
        (v, l) in real for _, _, v, l in got if v is not None
    ), "asof tie-dedup synthesized a (value, label) pair from two rows"

    rp = str(tmp_path / "right.parquet")
    lp = str(tmp_path / "left.parquet")
    right.coalesce(1).write.mode("overwrite").parquet(rp)
    left.coalesce(1).write.mode("overwrite").parquet(lp)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT * FROM read_parquet('{rp}/*.parquet')")
    con.execute(f"CREATE VIEW l AS SELECT * FROM read_parquet('{lp}/*.parquet')")
    want = set(
        tuple(row) for row in con.execute("""
            WITH rd AS (
              SELECT user_id, ts,
                     max({'value': value, 'label': label}) AS w
              FROM r GROUP BY 1, 2
            )
            SELECT l.event_id, rd.ts, rd.w.value, rd.w.label
            FROM l ASOF LEFT JOIN rd
              ON l.user_id = rd.user_id AND l.ts >= rd.ts
        """).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed,within_days", [(11, 4), (12, 4), (13, 1), (14, 30)])
def test_funnel_matches_python_oracle(spark, seed, within_days):
    from jassjr_spark.operators.events import funnel

    steps = ("signup", "view", "click", "purchase")
    within = dt.timedelta(days=within_days)
    rows = _random_events(seed, n_users=20, n_events=400)
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r.step: r.n_users
           for r in funnel(ev, steps=steps,
                           within_us=within // dt.timedelta(microseconds=1))
           .collect()}
    assert set(got) == {1, 2, 3, 4}  # every step emits, even when empty

    # pure-Python greedy oracle
    by_user: dict = {}
    for _, ts, uid, et, _, _ in rows:
        by_user.setdefault(uid, []).append((ts, et))
    want = {i: 0 for i in range(1, len(steps) + 1)}
    for uid, evs in by_user.items():
        evs.sort()
        t_prev, t1 = None, None
        for i, step in enumerate(steps, start=1):
            cands = [
                t for t, et in evs
                if et == step
                and (t_prev is None or t >= t_prev)
                and (t1 is None or t <= t1 + within)
            ]
            if not cands:
                break
            t_prev = min(cands)
            if i == 1:
                t1 = t_prev
            want[i] += 1
    assert got == want


@pytest.mark.parametrize("seed", [21, 22])
def test_retention_matches_python_oracle(spark, seed):
    from jassjr_spark.operators.events import retention_cohorts

    rows = _random_events(seed, n_users=15, n_events=250)
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in retention_cohorts(ev).collect()}

    WEEK = 7 * 24 * 3600
    epoch = dt.datetime(1970, 1, 1)
    weekly = {(uid, int((ts - epoch).total_seconds()) // WEEK)
              for _, ts, uid, _, _, _ in rows}
    cohort = {}
    for uid, w in sorted(weekly):
        cohort.setdefault(uid, w)
    want: dict = {}
    for uid, w in weekly:
        key = (cohort[uid], w - cohort[uid])
        want[key] = want.get(key, 0) + 1
    assert got == want
