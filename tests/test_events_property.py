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
