"""Source-code corpus (BASELINE.json input_hint shape): deterministic
synthesis, the per-row sha256 invariant through a storage roundtrip,
partition pruning on the lang-partitioned layout, metadata-scoped search
identity, and clone-pair detection."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import search, search_scoped
from jassjr_spark.sources.code_corpus import (
    clone_pairs,
    code_documents,
    synthesize_code_corpus,
    verify_content_sha,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return synthesize_code_corpus(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ).cache()


def test_synthesis_is_deterministic_and_unique(spark, corpus):
    again = synthesize_code_corpus(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    )
    assert sorted(map(tuple, corpus.collect())) == sorted(
        map(tuple, again.collect())
    )
    n = corpus.count()
    assert corpus.select("repo", "path", "commit").distinct().count() == n
    assert code_documents(corpus).select("docno").distinct().count() == n
    # the input_hint contract: exactly these columns
    assert corpus.columns == ["doc_id", "repo", "path", "commit", "lang",
                              "content"]


def test_docno_scheme(corpus):
    row = code_documents(corpus).filter(F.col("docid") == 3).first()
    assert row.docno == f"{row.repo}:src/m3/file_3.rs@" + row.docno.split("@")[1]
    assert len(row.docno.split("@")[1]) == 8


def test_sha_invariant_roundtrip(spark, corpus, tmp_path):
    """Write the corpus lang-partitioned, read it back, and prove every
    row's content survived byte-exactly (the north-rule invariant)."""
    dst = str(tmp_path / "code_corpus")
    corpus.write.partitionBy("lang").parquet(dst)
    back = spark.read.parquet(dst)
    bad = verify_content_sha(
        code_documents(back, id_col="doc_id"), code_documents(corpus)
    )
    assert bad.count() == 0
    # and the check actually detects corruption: flip one row's content
    corrupted = back.withColumn(
        "content",
        F.when(F.col("doc_id") == 7, F.lit("tampered")).otherwise(
            F.col("content")
        ),
    )
    bad2 = verify_content_sha(
        code_documents(corrupted, id_col="doc_id"), code_documents(corpus)
    )
    assert bad2.count() == 1 and bad2.first()[0].startswith("repo-7:")


def test_lang_partition_pruning(spark, corpus, tmp_path):
    """The 10^12-file layout: lang-partitioned parquet => a lang predicate
    must become a PartitionFilter (scan skips other langs entirely)."""
    dst = str(tmp_path / "by_lang")
    corpus.write.partitionBy("lang").parquet(dst)
    plan = (
        spark.read.parquet(dst)
        .filter(F.col("lang") == "python")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1][:200]


def test_scoped_search_identity(spark, corpus):
    """search_scoped == full search restricted to the scope and re-ranked
    (global idf/avgdl: a doc's score is identical scoped or not)."""
    cd = code_documents(corpus).select("docid", "docno", "content")
    idx = build_index(cd, prepend_docno=False).cache()
    allowed = (
        code_documents(corpus)
        .filter(F.col("repo") == "repo-3")
        .select("docid")
    )
    queries = spark.createDataFrame(
        [(1, 0, "hash"), (1, 1, "table"), (2, 0, "merge"), (2, 1, "sort")],
        "query_id long, pos int, term string",
    )
    scoped = search_scoped(idx, queries, allowed, k=1000).collect()
    full = (
        search(idx, queries, k=10**9)
        .join(
            allowed.join(cd.select("docid", "docno"), "docid").select("docno"),
            "docno",
        )
        .collect()
    )
    def key(rows):
        return sorted((r.query_id, r.docno, round(r.rsv, 9)) for r in rows)
    assert key(scoped) == key(full)
    # scores are the global ones, and ranks are dense 1..n per query
    by_q = {}
    for r in sorted(scoped, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(ranks == list(range(1, len(ranks) + 1))
               for ranks in by_q.values())


def test_collapsed_search_identity(spark, corpus):
    """search_collapsed == the per-(query, group) argmax of the full run,
    re-ranked; and at most ONE result per group per query."""
    from jassjr_spark.operators.search import search_collapsed

    cd = code_documents(corpus).select("docid", "docno", "content")
    idx = build_index(cd, prepend_docno=False).cache()
    groups = code_documents(corpus).select("docid", F.col("repo").alias("grp"))
    queries = spark.createDataFrame(
        [(1, 0, "hash"), (1, 1, "table"), (2, 0, "merge"), (2, 1, "sort")],
        "query_id long, pos int, term string",
    )
    got = search_collapsed(idx, queries, groups, k=1000).collect()

    # brute force: full run joined to groups, per-group argmax
    full = (
        search(idx, queries, k=10**9)
        .join(cd.select("docid", "docno"), "docno")
        .join(groups, "docid")
        .collect()
    )
    best = {}
    for r in full:
        cur = best.get((r.query_id, r.grp))
        if cur is None or (r.rsv, r.docid) > (cur.rsv, cur.docid):
            best[(r.query_id, r.grp)] = r
    want = sorted(
        ((q, b.docno, g, round(b.rsv, 9)) for (q, g), b in best.items())
    )
    assert sorted((r.query_id, r.docno, r.grp, round(r.rsv, 9))
                  for r in got) == want

    # collapse property: one row per (query, grp); dense ranks ordered by
    # (rsv desc, docid desc) among the survivors
    seen = set()
    for r in got:
        assert (r.query_id, r.grp) not in seen
        seen.add((r.query_id, r.grp))
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(ranks == list(range(1, len(ranks) + 1))
               for ranks in by_q.values())


def test_facet_counts_identity(spark, corpus):
    """facet_counts == counting the full run's matches per facet value;
    facets with zero matches are absent (UI renders them as 0)."""
    from jassjr_spark.operators.search import facet_counts

    cd = code_documents(corpus).select("docid", "docno", "content")
    idx = build_index(cd, prepend_docno=False).cache()
    facets = code_documents(corpus).select(
        "docid", F.col("lang").alias("facet")
    )
    queries = spark.createDataFrame(
        [(1, 0, "hash"), (1, 1, "table"), (2, 0, "zzzmissing")],
        "query_id long, pos int, term string",
    )
    got = {(r.query_id, r.facet): r.n_docs
           for r in facet_counts(idx, queries, facets).collect()}
    full = (
        search(idx, queries, k=10**9)
        .join(cd.select("docid", "docno"), "docno")
        .join(facets, "docid")
        .collect()
    )
    want = {}
    for r in full:
        want[(r.query_id, r.facet)] = want.get((r.query_id, r.facet), 0) + 1
    assert got == want
    assert all(q == 1 for q, _ in got)  # the all-OOV query contributes none


def test_clone_pairs_detects_planted_clone(spark):
    """Two same-lang files sharing a long token run must pair; the
    cross-lang copy must not; unrelated files must not."""
    shared = " ".join(f"tok{i}" for i in range(40))
    rows = [
        # doc_id % 5 picks lang: 0 and 5 are both python; 1 is java
        (0, shared + " left extra tail"),
        (5, "prefix " + shared),
        (1, shared),                       # java copy of the python text
        (10, "completely different words nothing in common here at all "
             "zebra yak xylophone wombat vulture unicorn tapir seal"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = synthesize_code_corpus(docs)
    got = {
        (r.docid_a, r.docid_b): (r.lang, r.shared_fps)
        for r in clone_pairs(corpus).collect()
    }
    assert (0, 5) in got and got[(0, 5)][0] == "python"
    assert got[(0, 5)][1] >= 2
    assert all(a == 0 and b == 5 for a, b in got)


def test_clone_pairs_stop_gram_cap(spark):
    """A gram present in EVERY file is a stop-gram: with max_fp_df below
    the corpus size it must not create all-pairs candidates."""
    boiler = " ".join(f"lic{i}" for i in range(10))
    rows = [(i * 5, boiler + f" unique{i} body{i}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = synthesize_code_corpus(docs)  # all doc_id % 5 == 0 -> python
    # max_fp_df=1 keeps only single-doc fingerprints: no pair can form
    assert clone_pairs(corpus, max_fp_df=1, min_shared=1).count() == 0
    # at cap c the per-fingerprint fan-out is <= c*(c-1)/2, so 12 files of
    # pure boilerplate cannot explode to all-pairs (66) under cap 5
    capped = clone_pairs(corpus, max_fp_df=5, min_shared=1).count()
    uncapped = clone_pairs(corpus, max_fp_df=50, min_shared=1).count()
    assert capped < uncapped == 66  # identical boiler => all-pairs uncapped


def test_hit_counts_identity(spark, corpus):
    """hit_counts == the full run's size at k=inf; an OOV-only query
    reports 0 instead of dropping out of the result."""
    from jassjr_spark.operators.search import hit_counts

    cd = code_documents(corpus).select("docid", "docno", "content")
    idx = build_index(cd, prepend_docno=False).cache()
    queries = spark.createDataFrame(
        [(1, 0, "hash"), (1, 1, "table"), (2, 0, "zzzmissing")],
        "query_id long, pos int, term string",
    )
    got = {r.query_id: r.n_hits for r in hit_counts(idx, queries).collect()}
    full = search(idx, queries, k=10**9).groupBy("query_id").count().collect()
    want = {r.query_id: r["count"] for r in full}
    assert got[1] == want[1] > 0
    assert got[2] == 0 and 2 not in want


def test_search_ordered(spark, corpus):
    """search_ordered lists the exact matched set ordered by the key,
    desc and asc, ties broken docid desc."""
    from jassjr_spark.operators.search import hit_counts, search_ordered

    cd = code_documents(corpus).select("docid", "docno", "content")
    idx = build_index(cd, prepend_docno=False).cache()
    keys = corpus.select(
        F.col("doc_id").cast("long").alias("docid"),
        F.length("content").cast("long").alias("sort_key"),
    )
    queries = spark.createDataFrame(
        [(1, 0, "hash"), (1, 1, "table")],
        "query_id long, pos int, term string",
    )
    n = hit_counts(idx, queries).collect()[0].n_hits
    got = search_ordered(idx, queries, keys, k=10**9).collect()
    assert len(got) == n
    seq = [(r.sort_key, r.docno) for r in sorted(got, key=lambda r: r.rank)]
    assert [s for s, _ in seq] == sorted([s for s, _ in seq], reverse=True)
    asc = search_ordered(idx, queries, keys, k=5, ascending=True).collect()
    asc_keys = [r.sort_key for r in sorted(asc, key=lambda r: r.rank)]
    assert asc_keys == sorted(asc_keys)
    assert len(asc) == min(5, n)


def test_facet_stats_identity(spark, corpus):
    """facet_stats == pandas aggregation of (matched run x facets)."""
    from jassjr_spark.operators.search import facet_stats

    cd = code_documents(corpus).select("docid", "docno", "content")
    idx = build_index(cd, prepend_docno=False).cache()
    facets = code_documents(corpus).select(
        "docid", F.col("lang").alias("facet"),
        F.length("content").cast("double").alias("val"),
    )
    queries = spark.createDataFrame(
        [(1, 0, "hash"), (1, 1, "table")],
        "query_id long, pos int, term string",
    )
    got = {(r.query_id, r.facet): (r.n_docs, r.min_val, r.max_val, r.avg_val)
           for r in facet_stats(idx, queries, facets).collect()}
    full = (
        search(idx, queries, k=10**9)
        .join(cd.select("docid", "docno"), "docno")
        .join(facets, "docid")
        .collect()
    )
    import collections
    vals = collections.defaultdict(list)
    for r in full:
        vals[(r.query_id, r.facet)].append(r.val)
    assert set(got) == set(vals) and got
    for key, vs in vals.items():
        n, mn, mx, avg = got[key]
        assert (n, mn, mx) == (len(vs), min(vs), max(vs))
        assert avg == pytest.approx(sum(vs) / len(vs), abs=1e-6)


def test_search_after_equals_offset_paging(spark, corpus):
    """Page 2 via the (rsv, docid) cursor == page 2 via offset, bitwise,
    with page-local ranks; no cursor == page 1; exhausted pages empty."""
    from jassjr_spark.operators.search import search_after

    cd = code_documents(corpus).select("docid", "docno", "content")
    idx = build_index(cd, prepend_docno=False).cache()
    queries = spark.createDataFrame(
        [(1, 0, "hash"), (1, 1, "table"), (2, 0, "merge")],
        "query_id long, pos int, term string",
    )
    page1 = search_after(idx, queries, k=5)
    assert {(r.query_id, r.docno, r.rank, r.rsv) for r in page1.collect()} \
        == {(r.query_id, r.docno, r.rank, r.rsv)
            for r in search(idx, queries, k=5).collect()}
    # cursors: last row of page 1 per query (need docid for the cursor)
    did = {r.docno: r.docid for r in cd.select("docid", "docno").collect()}
    cur = {}
    for r in page1.collect():
        if r.rank == 5:
            cur[r.query_id] = (r.rsv, did[r.docno])
    page2 = {(r.query_id, r.docno, r.rank, r.rsv)
             for r in search_after(idx, queries, k=5, after=cur).collect()}
    from jassjr_spark.operators.search import (
        accumulate, resolve_docnos, score_postings, top_k,
    )
    s = idx.scalar_stats()
    scored = score_postings(queries, idx.postings, idx.dictionary,
                            s["n_docs"], s["avgdl"])
    off = resolve_docnos(idx, top_k(accumulate(scored), k=5, offset=5),
                         s["n_docs"])
    want = {(r.query_id, r.docno, r.rank - 5, r.rsv) for r in off.collect()}
    assert page2 == want and page2
    # paging past the end returns nothing
    deep = {q: (0.0, -1) for q in (1, 2)}
    assert search_after(idx, queries, k=5, after=deep).collect() == []


def test_facet_histogram(spark, corpus):
    from jassjr_spark.operators.search import facet_histogram

    cd = code_documents(corpus).select("docid", "docno", "content")
    idx = build_index(cd, prepend_docno=False).cache()
    vals = corpus.select(
        F.col("doc_id").cast("long").alias("docid"),
        F.length("content").alias("val"),
    )
    queries = spark.createDataFrame(
        [(1, 0, "hash"), (1, 1, "table")],
        "query_id long, pos int, term string",
    )
    got = {(r.query_id, r.bucket): r.n_docs
           for r in facet_histogram(idx, queries, vals, 100.0).collect()}
    full = (
        search(idx, queries, k=10**9)
        .join(cd.select("docid", "docno"), "docno")
        .join(vals, "docid")
        .collect()
    )
    want = {}
    for r in full:
        b = (r.query_id, (r.val // 100) * 100.0)
        want[b] = want.get(b, 0) + 1
    assert got == want and got


def test_bm25_tuning_knobs(spark, corpus):
    """k1/b per call: defaults == the reference constants bitwise; a
    tuned call changes scores; b=0 removes length normalization."""
    from jassjr_spark.constants import B, K1

    cd = code_documents(corpus).select("docid", "docno", "content")
    idx = build_index(cd, prepend_docno=False).cache()
    queries = spark.createDataFrame(
        [(1, 0, "hash"), (1, 1, "table")],
        "query_id long, pos int, term string",
    )
    base = {(r.docno, r.rsv) for r in search(idx, queries).collect()}
    explicit = {(r.docno, r.rsv)
                for r in search(idx, queries, k1=K1, b=B).collect()}
    assert base == explicit and base
    tuned = {r.docno: r.rsv
             for r in search(idx, queries, k1=1.2, b=0.75).collect()}
    assert tuned and any(abs(tuned[d] - rsv) > 1e-9
                         for d, rsv in base if d in tuned)
    # b=0: two docs with identical tf sets score identically regardless
    # of length (no normalization) — check score is len-independent by
    # comparing against the closed form idf * tf(k1+1)/(tf+k1)
    import math
    flat = search(idx, queries, k1=1.2, b=0.0).collect()
    s = idx.scalar_stats()
    post = {(r.term, r.docid): r.tf
            for r in idx.postings.filter(
                F.col("term").isin(["hash", "table"])).collect()}
    dfs = {r.term: r.df for r in idx.dictionary.filter(
        F.col("term").isin(["hash", "table"])).collect()}
    did = {r.docno: r.docid for r in cd.select("docid", "docno").collect()}
    for r in flat[:10]:
        want = sum(
            math.log(s["n_docs"] / dfs[t]) * (post[(t, did[r.docno])] * 2.2)
            / (post[(t, did[r.docno])] + 1.2)
            for t in ("hash", "table") if (t, did[r.docno]) in post
        )
        assert r.rsv == pytest.approx(want, abs=1e-9)


def test_significant_terms(spark):
    """JLH scoring over the matched sample: the planted co-occurring
    term outranks corpus-common terms; query matching nothing -> empty;
    sample cap bounds the foreground."""
    from jassjr_spark.operators.search import significant_terms

    rows = []
    # 10 docs about 'needle' always co-occurring with 'gold'; 90 background
    for i in range(10):
        rows.append((i, f"n{i}", "needle gold common"))
    for i in range(10, 100):
        rows.append((i, f"b{i}", "common filler"))
    docs = spark.createDataFrame(
        rows, "docid long, docno string, content string")
    idx = build_index(docs, prepend_docno=False).cache()
    queries = spark.createDataFrame(
        [(1, 0, "needle"), (2, 0, "zzzmissing")],
        "query_id long, pos int, term string",
    )
    got = significant_terms(idx, docs, queries, sample=500, k=5).collect()
    assert {r.query_id for r in got} == {1}
    by_rank = sorted(got, key=lambda r: -r.score)
    # 'gold' and 'needle': fg_df 10/10, bg_df 10/100 -> top scores;
    # 'common' (bg_df 100 == N) has fgPct == bgPct and is excluded
    assert {by_rank[0].term, by_rank[1].term} == {"needle", "gold"}
    assert all(r.term != "common" for r in got)
    assert all(r.fg_df == 10 and r.bg_df == 10 for r in by_rank[:2])
    # sample cap: foreground limited to first 3 matched docids
    capped = significant_terms(idx, docs, queries, sample=3, k=5).collect()
    assert max(r.fg_df for r in capped) == 3
