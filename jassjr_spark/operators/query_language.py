"""A user-facing query syntax over the engine's search modes.

The reference reads bare disjunctive term lines (``JASSjr_search.py:
59-63``); every production engine fronts that with a tiny query
language. This one covers the standard operators and dispatches to the
already-oracled engine modes — the parser is driver-side string work,
the execution is entirely existing plans:

    hash table            -> disjunctive BM25             (search)
    +hash table           -> '+' terms REQUIRED, all score (search_mixed)
    hash -merge           -> '-' terms excluded            (search_negated)
    "hash table"          -> exact phrase                  (phrase_search)
    "hash table"~2        -> ordered span-near, slop 2     (span_near)
    lang:py hash          -> metadata scope                (search_scoped)
    n_chars:>=100 hash    -> numeric range scope            (search_scoped)
    hash^2.5 table        -> '^w' term boost               (weighted search)
    hsah~ table           -> '~d' fuzzy term (default d=1) (search_fuzzy)
    has* table            -> trailing-'*' prefix wildcard  (search_fuzzy)
    /ha.h/ table          -> /regex/ term (full match)      (search_fuzzy)

Terms are normalized with the INDEX tokenizer rules (lowercase,
255-char truncate, the reference's lexer alphabet), so a query spelled
with punctuation finds what indexing stored.

Composition matrix (anything else raises loudly rather than guessing):
plain terms compose with any ONE of {required, negated, scope};
required+negated compose (exclusion applied on a wide-margin mixed run);
phrases compose with plain (optionally boosted) terms — each phrase is
one synthetic scored clause in the same disjunctive sum (Lucene's
BooleanQuery-holding-a-PhraseQuery) — but not with boolean/scope
operators. Boosts ride the scored-term stream, so they compose with
plain, negated, scoped, and phrase-bearing queries; boosting a required
term raises. Fuzzy, wildcard, and regex terms compose with plain
(boosted or not) terms only.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassjr_spark.constants import MAX_TOKEN_LEN, TOKEN_RE
from jassjr_spark.operators.index_build import Index

_PHRASE_RE = re.compile(r'"([^"]*)"(?:~(\d+))?')
_FIELD_RE = re.compile(r"^(\w+):(.+)$")
_BOOST_RE = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$")
_FUZZY_RE = re.compile(r"^(.+)~(\d)?$")
_WILD_RE = re.compile(r"^([^*]+)\*$")
_RANGE_RE = re.compile(r"^(>=|<=|>|<)(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)$")

NEGATION_MARGIN = 400   # extra depth for post-cut exclusion in mixed mode


@dataclass
class ParsedQuery:
    positive: list[str] = field(default_factory=list)   # scored terms
    required: list[str] = field(default_factory=list)   # subset of positive
    negated: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)
    slops: list[int | None] = field(default_factory=list)  # 1:1 with phrases;
    # None = exact phrase, n = ordered span-near within n extra positions
    filters: dict[str, str] = field(default_factory=dict)
    ranges: list[tuple[str, str, float]] = field(default_factory=list)
    # (field, op, bound) from field:>x / >=x / <x / <=x
    weights: list[float] = field(default_factory=list)  # 1:1 with positive
    fuzzy: list[tuple[str, int]] = field(default_factory=list)  # (term, dist)
    prefixes: list[str] = field(default_factory=list)  # 'pfx*' wildcards
    patterns: list[str] = field(default_factory=list)  # '/regex/' terms

    @property
    def boosted(self) -> bool:
        return any(w != 1.0 for w in self.weights)


def _lex(text: str) -> list[str]:
    return [t.lower()[:MAX_TOKEN_LEN] for t in re.findall(TOKEN_RE, text)]


def parse_user_query(line: str) -> ParsedQuery:
    """One query line -> ParsedQuery. Operators: leading ``+`` (required),
    leading ``-`` (exclude), double quotes (phrase), ``field:value``
    (metadata filter). Everything else is a scored term; all term text
    runs through the index tokenizer rules."""
    out = ParsedQuery()

    def _take_phrase(m: re.Match) -> str:
        toks = _lex(m.group(1))
        if toks:
            out.phrases.append(toks)
            # "a b"~n = ordered span-near within n extra positions
            # (this engine's ~n is IN-ORDER, stricter than Lucene's
            # transposition-tolerant sloppy phrase)
            out.slops.append(int(m.group(2)) if m.group(2) else None)
        return " "

    rest = _PHRASE_RE.sub(_take_phrase, line)
    for raw in rest.split():
        neg = raw.startswith("-")
        req = raw.startswith("+")
        body = raw[1:] if (neg or req) else raw
        fm = _FIELD_RE.match(body) if not (neg or req) else None
        if fm:
            value = fm.group(2)
            rm = _RANGE_RE.match(value)
            if rm:
                out.ranges.append(
                    (fm.group(1).lower(), rm.group(1), float(rm.group(2)))
                )
            elif value[0] in "<>":
                # an operator that didn't parse as a range bound must not
                # degrade into a string-equality filter (it would match
                # nothing, silently)
                raise ValueError(
                    f"malformed range bound in {raw!r}: use "
                    "field:>x / >=x / <x / <=x with a numeric bound"
                )
            else:
                out.filters[fm.group(1).lower()] = value
            continue
        if body.startswith("/"):
            if not (body.endswith("/") and len(body) > 2) or neg or req:
                raise ValueError(
                    f"regex terms are plain /pattern/ tokens: {raw!r}"
                )
            out.patterns.append(body[1:-1])
            continue
        if "*" in body:
            wm = _WILD_RE.match(body)
            if not wm or neg or req:
                raise ValueError(
                    "wildcards are trailing-'*' prefixes on plain terms "
                    f"only: {raw!r}"
                )
            pfx = wm.group(1).lower()
            if _lex(pfx) != [pfx]:
                raise ValueError(f"invalid wildcard prefix: {raw!r}")
            out.prefixes.append(pfx)
            continue
        fz = _FUZZY_RE.match(body)
        if fz:
            if neg or req:
                raise ValueError(
                    f"fuzzy composes with plain terms only: {raw!r}"
                )
            fbody, fdist = fz.group(1), int(fz.group(2) or 1)
            if "^" in fbody:
                raise ValueError(
                    f"boost and fuzzy on one term is not supported: {raw!r}"
                )
            out.fuzzy.extend((t, fdist) for t in _lex(fbody))
            continue
        if "~" in body:
            # raise-loudly contract: 'term~12' (multi-digit distance) or
            # 'term~1^2' (fuzzy then boost) must not silently lex into
            # plain terms containing literal digits
            raise ValueError(
                f"malformed fuzzy term {raw!r}: use term~ or term~d with "
                "a single-digit distance; boost+fuzzy is not supported"
            )
        weight = 1.0
        bm = _BOOST_RE.match(body)
        if bm:
            body, weight = bm.group(1), float(bm.group(2))
            if neg:
                raise ValueError(
                    f"boost on an excluded term is meaningless: {raw!r}"
                )
        toks = _lex(body)
        if not toks:
            continue
        if neg:
            out.negated.extend(toks)
        else:
            out.positive.extend(toks)
            out.weights.extend([weight] * len(toks))
            if req:
                if weight != 1.0:
                    raise ValueError(
                        "boosting a required term is not supported: "
                        f"{raw!r} (required terms gate; drop the '+' to "
                        "boost, or the '^w' to require)"
                    )
                out.required.extend(toks)
    return out


def suggest_rewrite(index: Index, line: str, max_dist: int = 2) -> str | None:
    """Did-you-mean for a whole query line: every positive term absent
    from the dictionary is replaced by its best suggestion
    (tooling.suggest_terms ranking); operators and in-vocabulary terms
    pass through. Returns the rewritten line, or None when nothing
    needed fixing or any OOV term has no suggestion in range."""
    from jassjr_spark.operators.tooling import suggest_terms

    p = parse_user_query(line)
    uniq = list(dict.fromkeys(p.positive))
    vocab = {
        r.term for r in index.dictionary
        .filter(F.col("term").isin(uniq)).select("term").collect()
    }
    oov = [t for t in uniq if t not in vocab]
    if not oov:
        return None
    fixes = {}
    for t in oov:
        row = suggest_terms(index, t, max_dist=max_dist, k=1).first()
        if row is None:
            return None
        fixes[t] = row.term

    def _fix_token(raw: str) -> str:
        neg, req = raw.startswith("-"), raw.startswith("+")
        body = raw[1:] if (neg or req) else raw
        toks = _lex(body)
        if len(toks) == 1 and toks[0] in fixes and not _FIELD_RE.match(body):
            return ("-" if neg else "+" if req else "") + fixes[toks[0]]
        return raw

    rest = _PHRASE_RE.sub(lambda m: m.group(0), line)  # phrases untouched
    return " ".join(
        _fix_token(tok) if not tok.startswith('"') else tok
        for tok in rest.split()
    )


def _plain_frame(spark, p: ParsedQuery, query_id: int) -> DataFrame:
    """The (query_id, pos, term[, weight]) frame for p.positive; the
    weight column appears only when some boost != 1 (weight-1 rows are
    bit-identical to the unweighted kernel either way)."""
    if p.boosted:
        return spark.createDataFrame(
            [(query_id, i, t, w)
             for i, (t, w) in enumerate(zip(p.positive, p.weights))],
            "query_id long, pos int, term string, weight double",
        )
    return spark.createDataFrame(
        [(query_id, i, t) for i, t in enumerate(p.positive)],
        "query_id long, pos int, term string",
    )


def run_user_query(
    index: Index,
    line: str,
    k: int = 10,
    metadata: DataFrame | None = None,
    positions: DataFrame | None = None,
    query_id: int = 0,
) -> DataFrame:
    """Parse ``line`` and execute it -> (query_id, docno, rank, rsv)."""
    from jassjr_spark.operators.search import (
        search, search_mixed, search_negated, search_scoped,
    )

    p = parse_user_query(line)
    spark = index.dictionary.sparkSession

    if p.phrases:
        if (p.required or p.negated or p.filters or p.ranges or p.fuzzy
                or p.prefixes or p.patterns):
            raise ValueError(
                "phrases compose with plain (optionally boosted) terms "
                "only; combine results of separate queries for "
                "phrase+boolean needs"
            )
        if positions is None:
            raise ValueError("query quotes a phrase but no positional "
                             "table was provided")
        from jassjr_spark.operators.positional import search_with_phrases

        plain = _plain_frame(spark, p, query_id) if p.positive else None
        ph = [(query_id, slot, phr, slop)
              for slot, (phr, slop) in enumerate(zip(p.phrases, p.slops))]
        return search_with_phrases(index, plain, ph, positions, k=k,
                                   stats=index.scalar_stats())

    if (p.filters or p.ranges) and (p.required or p.negated):
        raise ValueError("field filters compose only with plain terms")

    if p.fuzzy or p.prefixes or p.patterns:
        if p.required or p.negated or p.filters or p.ranges:
            raise ValueError(
                "fuzzy/wildcard terms compose with plain (optionally "
                "boosted) terms only"
            )
        from jassjr_spark.operators.fuzzy import search_fuzzy

        plain = _plain_frame(spark, p, query_id) if p.positive else None
        fz = [(query_id, slot, t, d) for slot, (t, d) in enumerate(p.fuzzy)]
        pf = [(query_id, len(p.fuzzy) + slot, pfx)
              for slot, pfx in enumerate(p.prefixes)]
        rx = [(query_id, len(p.fuzzy) + len(p.prefixes) + slot, pat)
              for slot, pat in enumerate(p.patterns)]
        return search_fuzzy(index, plain, fz, k=k, prefixes=pf, patterns=rx)

    if not p.positive:
        return spark.createDataFrame(
            [], "query_id long, docno string, rank long, rsv double"
        )

    queries = _plain_frame(spark, p, query_id)

    if p.filters or p.ranges:
        if metadata is None:
            raise ValueError(f"query uses field filters {p.filters or p.ranges}"
                             " but no metadata frame was provided")
        allowed = metadata
        for f_name, value in p.filters.items():
            allowed = allowed.filter(F.col(f_name) == value)
        ops = {">": "__gt__", ">=": "__ge__", "<": "__lt__", "<=": "__le__"}
        for f_name, op, bound in p.ranges:
            allowed = allowed.filter(getattr(F.col(f_name), ops[op])(bound))
        return search_scoped(index, queries, allowed.select("docid"), k=k)

    if p.required:
        req = spark.createDataFrame(
            [(query_id, t) for t in p.required], "query_id long, term string"
        )
        depth = k + NEGATION_MARGIN if p.negated else k
        run = search_mixed(index, queries, req, k=depth)
        if p.negated:
            # exclusion on top of the wide-margin mixed run; exact unless
            # >NEGATION_MARGIN excluded docs outrank the k-th survivor
            excl = (
                index.docids.join(
                    index.postings.filter(F.col("term").isin(p.negated))
                    .select("docid").distinct(),
                    "docid",
                ).select("docno")
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("rsv").desc(), F.col("docno").desc()
            )
            run = (
                run.join(excl, "docno", "left_anti")
                .drop("rank")
                .withColumn("rank", F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= k)
                .select("query_id", "docno", "rank", "rsv")
            )
        return run

    if p.negated:
        neg = spark.createDataFrame(
            [(query_id, t) for t in p.negated], "query_id long, term string"
        )
        return search_negated(index, queries, neg, k=k)

    return search(index, queries, k=k, qterms=sorted(set(p.positive)))


def run_user_queries(
    index: Index,
    lines: list[str],
    k: int = 10,
    metadata: DataFrame | None = None,
    positions: DataFrame | None = None,
) -> DataFrame:
    """Batch front end: query_id = line index. Lines WITHOUT operators —
    the overwhelming majority of real traffic — share ONE search() call
    (the engine's job-count discipline: per-query scheduling, not data,
    bounds small-query latency); operator-bearing lines dispatch
    individually through run_user_query and the runs union."""
    from functools import reduce

    from jassjr_spark.operators.search import search

    spark = index.dictionary.sparkSession
    plain_rows, runs = [], []
    for qid, line in enumerate(lines):
        p = parse_user_query(line)
        if (p.positive and not p.required and not p.negated
                and not p.phrases and not p.filters and not p.ranges
                and not p.fuzzy and not p.prefixes and not p.patterns):
            # boosted-but-otherwise-plain lines still share the batched
            # plan: weight is just a column of the scored stream
            plain_rows += [
                (qid, i, t, w)
                for i, (t, w) in enumerate(zip(p.positive, p.weights))
            ]
        elif p.positive or p.phrases or p.fuzzy or p.prefixes \
                or p.patterns:
            runs.append(
                run_user_query(index, line, k=k, metadata=metadata,
                               positions=positions, query_id=qid)
            )
    if plain_rows:
        queries = spark.createDataFrame(
            plain_rows, "query_id long, pos int, term string, weight double"
        )
        # terms are driver-known — pass them so search() skips its own
        # distinct-terms job (the job-count discipline this batch exists for)
        runs.insert(0, search(index, queries, k=k,
                              qterms=sorted({t for _, _, t, _ in plain_rows})))
    if not runs:
        return spark.createDataFrame(
            [], "query_id long, docno string, rank long, rsv double"
        )
    return reduce(lambda a, b: a.unionByName(b), runs)
