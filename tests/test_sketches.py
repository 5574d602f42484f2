"""Sketch operators vs exact pure-Python references.

Every sketch is deterministic (md5-derived), so the tests assert the
EXACT register / counter / bit values a reference implementation
computes — not just statistical closeness — plus the structural
guarantees (CMS never under-counts; Bloom never false-negatives).
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from jassjr_spark.operators import sketches


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _ref_hll_registers(keys, p=8):
    regs = {}
    for key in set(keys):
        h = _md5(str(key))
        reg = int(h[: p // 4], 16)
        w = int(h[p // 4 : p // 4 + 13], 16)
        rho = 53 if w == 0 else 53 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _ref_hll_estimate(regs, p=8):
    m = 1 << p
    s = sum(
        (1 << (sketches.HLL_SCALE - rho)) if rho <= sketches.HLL_SCALE else 0
        for rho in regs.values()
    ) + (m - len(regs)) * (1 << sketches.HLL_SCALE)
    raw = sketches.hll_alpha(m) * float(m) * float(m) * float(
        2 ** sketches.HLL_SCALE
    ) / float(s)
    zeros = m - len(regs)
    if raw <= 2.5 * m and zeros > 0:
        return float(m) * math.log(float(m) / zeros)
    return raw


@pytest.fixture(scope="module")
def keys(spark):
    # 5000 distinct synthetic keys, with duplicates mixed in: HLL counts
    # distinct values, so duplicates must not move any register
    rows = [(f"key-{i % 5000}",) for i in range(8000)]
    return spark.createDataFrame(rows, "k string")


def test_hll_registers_bit_exact(spark, keys):
    got = {
        r.register: r.rho
        for r in sketches.hll_registers(keys, "k", p=8).collect()
    }
    want = _ref_hll_registers([f"key-{i}" for i in range(5000)], p=8)
    assert got == want


def test_hll_estimate_matches_reference_and_is_accurate(spark, keys):
    est = sketches.hll_count_distinct(keys, "k", p=8).first().est
    want = _ref_hll_estimate(
        _ref_hll_registers([f"key-{i}" for i in range(5000)], p=8)
    )
    assert est == want  # bitwise: integer sum + one shared IEEE division
    assert abs(est - 5000) / 5000 < 0.15  # ~1.04/sqrt(256) regime


def test_hll_linear_counting_small_cardinality(spark):
    # 40 distinct keys with m=256 registers: raw estimate <= 2.5m and
    # empty registers exist, so the linear-counting branch must fire
    df = spark.createDataFrame([(f"x{i}",) for i in range(40)], "k string")
    est = sketches.hll_count_distinct(df, "k", p=8).first().est
    want = _ref_hll_estimate(_ref_hll_registers([f"x{i}" for i in range(40)]))
    assert abs(est - want) < 1e-9  # ln(): JVM vs CPython may differ 1 ulp
    assert abs(est - 40) / 40 < 0.2


def _ref_cms(counts, depth, width):
    lattice = {}
    for key, n in counts.items():
        for i in range(depth):
            b = int(_md5(f"{i}:{key}")[:8], 16) % width
            lattice[(i, b)] = lattice.get((i, b), 0) + n
    return lattice


def test_cms_exact_lattice_and_overcount_guarantee(spark):
    counts = {f"t{i}": (i % 7) + 1 for i in range(200)}
    rows = [(k, n) for k, n in counts.items()]
    df = spark.createDataFrame(rows, "term string, cf long")
    sketch = sketches.cms_build(df, "term", "cf", depth=4, width=64)
    got = {(r.row, r.bucket): r.n for r in sketch.collect()}
    assert got == _ref_cms(counts, 4, 64)

    keys = spark.createDataFrame([(k,) for k in counts], "term string")
    est = {
        r.term: r.est
        for r in sketches.cms_query(sketch, keys, "term", 4, 64).collect()
    }
    lattice = _ref_cms(counts, 4, 64)
    for k, n in counts.items():
        assert est[k] >= n  # never under-counts
        want = min(
            lattice[(i, int(_md5(f"{i}:{k}")[:8], 16) % 64)] for i in range(4)
        )
        assert est[k] == want


def test_cms_unseen_key_estimates_from_collisions_only(spark):
    df = spark.createDataFrame([("a", 5), ("b", 7)], "term string, cf long")
    sketch = sketches.cms_build(df, "term", "cf", depth=4, width=64)
    keys = spark.createDataFrame([("zzz",)], "term string")
    est = sketches.cms_query(sketch, keys, "term", 4, 64).first().est
    # with 2 members in 64 buckets it is overwhelmingly likely at least
    # one of zzz's 4 rows hits an empty bucket; assert the reference min
    lattice = _ref_cms({"a": 5, "b": 7}, 4, 64)
    want = min(
        lattice.get((i, int(_md5(f"{i}:zzz")[:8], 16) % 64), 0)
        for i in range(4)
    )
    assert est == want


def test_bloom_no_false_negatives_and_exact_bitset(spark):
    members = [f"m{i}" for i in range(30)]
    probes = members + [f"p{i}" for i in range(400)]
    mdf = spark.createDataFrame([(m,) for m in members], "k string")
    pdf = spark.createDataFrame([(p,) for p in probes], "k string")

    bits = sketches.bloom_build(mdf, "k", m_bits=256, k=3)
    want_bits = {
        int(_md5(f"{j}:{m}")[:8], 16) % 256 for m in members for j in range(3)
    }
    assert {r.pos for r in bits.collect()} == want_bits

    out = sketches.bloom_probe(pdf, "k", bits, m_bits=256, k=3)
    flags = {r.k: r.candidate for r in out.collect()}
    for m in members:
        assert flags[m] == 1  # no false negatives, ever
    # candidate set == reference bloom semantics (false positives exact)
    for p in probes:
        want = int(
            all(
                int(_md5(f"{j}:{p}")[:8], 16) % 256 in want_bits
                for j in range(3)
            )
        )
        assert flags[p] == want


def test_bloom_probe_plan_broadcasts_bits(spark):
    mdf = spark.createDataFrame([(f"m{i}",) for i in range(10)], "k string")
    pdf = spark.createDataFrame([(f"p{i}",) for i in range(50)], "k string")
    bits = sketches.bloom_build(mdf, "k", m_bits=256, k=3)
    plan = (
        sketches.bloom_probe(pdf, "k", bits, 256, 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
