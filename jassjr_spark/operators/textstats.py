"""Text-analysis operators for large-scale training-data pipelines.

These extend the reference's capabilities (SURVEY.md §2.4 lists them as
absent) with the operations a 100 TB corpus pipeline needs: token counting,
quality scoring, language-ID heuristics, and document fingerprinting. All
are pure Column expressions or Arrow-batched UDFs — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassjr_spark.constants import TOKEN_RE
from jassjr_spark.functions.tokenize import tokenize_udf

# A tiny embedded English stopword list for the language-ID heuristic and
# quality scoring; deterministic and shared with the DuckDB oracle SQL.
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]


# GPT-2-style pre-tokenizer approximation: letter runs, digit runs, and
# single non-space punctuation — the cheap proxy for BPE token counts that
# corpus-size estimation pipelines use before committing to a tokenizer.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WS_TOKEN_RE = r"\S+"


def token_counts(docs: DataFrame) -> DataFrame:
    """(docid, content) -> (docid, n_tokens, n_chars, n_ws_tokens,
    n_subwords).

    n_tokens = the engine's lexer tokens (TOKEN_RE); n_ws_tokens =
    whitespace-separated tokens; n_subwords = BPE-ish pre-tokenizer count
    (BPE_ISH_RE). All counted JVM-side with regexp_count — no Python in
    the plan at all.
    """
    return docs.select(
        F.col("docid"),
        F.regexp_count("content", F.lit(TOKEN_RE)).cast("long").alias("n_tokens"),
        F.length("content").cast("long").alias("n_chars"),
        F.regexp_count("content", F.lit(WS_TOKEN_RE)).cast("long")
        .alias("n_ws_tokens"),
        F.regexp_count("content", F.lit(BPE_ISH_RE)).cast("long")
        .alias("n_subwords"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(docid, content) -> per-doc quality features:

    n_tokens, mean_token_len, stopword_ratio (fraction of tokens in a fixed
    stopword list), distinct_ratio (type/token ratio). These are the
    standard cheap quality gates of web-corpus pipelines (length filters,
    stopword density, repetitiveness) computed as whole-stage-codegen
    Column math over a tokenized array.
    """
    toks = F.regexp_extract_all(F.lower("content"), F.lit(TOKEN_RE), 0)
    d = docs.select("docid", toks.alias("toks"))
    n = F.size("toks")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter("toks", lambda t: F.array_contains(stop_arr, t)))
    mean_len = F.when(
        n > 0,
        F.aggregate("toks", F.lit(0.0), lambda acc, t: acc + F.length(t))
        / n.cast("double"),
    ).otherwise(F.lit(0.0))
    return d.select(
        "docid",
        n.cast("long").alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(
            F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(0.0), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(n > 0, F.size(F.array_distinct("toks")).cast("double") / n.cast("double"))
            .otherwise(0.0),
            4,
        ).alias("distinct_ratio"),
    )


def langid_heuristic(docs: DataFrame, threshold: float = 0.08) -> DataFrame:
    """(docid, content) -> (docid, lang_guess): 'en' when the stopword
    density clears a threshold, else 'unk'. An n-gram/stopword-overlap
    heuristic — the real model call would slot into the same Column shape.
    """
    q = quality_scores(docs)
    return q.select(
        "docid",
        F.when(F.col("stopword_ratio") >= threshold, F.lit("en"))
        .otherwise(F.lit("unk"))
        .alias("lang_guess"),
    )


def repetition_stats(
    docs: DataFrame,
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5,),
    round_to: int = 6,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): per-doc
    fractions of character mass locked up in repeated word n-grams ->
    (docid, n_tokens, total_chars, top{n}gram_frac..., dup{n}gram_frac...).

    For each n in ``top_ns``: the character fraction of the MOST FREQUENT
    n-gram, ``count * chars(ngram) / total_chars`` (count ties broken by
    larger char mass; the fraction is tie-invariant beyond that). For each
    n in ``dup_ns``: the character fraction of ALL n-grams occurring more
    than once, ``sum(count * chars) / total_chars`` (overlap-agnostic, the
    standard cheap implementation — occurrences of overlapping n-grams
    count in full, so on degenerate repetition ("a b a b a b") a fraction
    can exceed 1.0; threshold filters like Gopher's 0.18/0.20 cut the
    same documents either way). chars(ngram) counts token characters only;
    total_chars is the doc's summed token lengths. Tokens follow the
    engine lexer contract (lowercase, TOKEN_RE, 255-char truncate), so
    the thresholds compose with quality_scores' features.

    Plan shape (the 100-TB path): one explode per n unioned with an ``n``
    tag (n=1 rides along to supply n_tokens/total_chars — no extra join),
    ONE groupBy (docid, n, ngram) with map-side combine (group size is
    bounded by one doc's length), one final per-doc hash agg. No UDF, no
    O(len^2) per-doc work, nothing driver-side. Docs with zero tokens
    produce no output row (they have no character mass to score)."""
    if any(n < 2 for n in (*top_ns, *dup_ns)):
        raise ValueError("repetition n-gram orders must be >= 2")
    toks = F.regexp_extract_all(F.lower("content"), F.lit(TOKEN_RE), 0)
    base = docs.select(
        "docid",
        F.transform(toks, lambda t: F.substring(t, 1, 255)).alias("toks"),
    )

    streams = []
    for n in sorted({1, *top_ns, *dup_ns}):
        grams = F.when(
            F.size("toks") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                lambda i: F.array_join(F.slice("toks", i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        streams.append(
            base.select(
                "docid", F.lit(n).alias("n"), F.explode(grams).alias("ngram")
            )
        )
    allgrams = streams[0]
    for s in streams[1:]:
        allgrams = allgrams.unionByName(s)

    counted = allgrams.groupBy("docid", "n", "ngram").agg(
        F.count(F.lit(1)).alias("cnt")
    ).withColumn(
        # token chars only: joined length minus the n-1 separators
        "mass",
        (F.length("ngram") - (F.col("n") - F.lit(1))).cast("long"),
    )

    aggs = [
        F.sum(F.when(F.col("n") == 1, F.col("cnt"))).alias("n_tokens"),
        F.sum(F.when(F.col("n") == 1, F.col("cnt") * F.col("mass")))
        .alias("total_chars"),
    ]
    for n in top_ns:
        top = F.max(
            F.when(F.col("n") == n, F.struct(F.col("cnt"), F.col("mass")))
        )
        aggs.append(
            (top.getField("cnt") * top.getField("mass")).alias(f"_top{n}")
        )
    for n in dup_ns:
        aggs.append(
            F.sum(
                F.when(
                    (F.col("n") == n) & (F.col("cnt") >= 2),
                    F.col("cnt") * F.col("mass"),
                )
            ).alias(f"_dup{n}")
        )
    per_doc = counted.groupBy("docid").agg(*aggs)

    out_cols = ["docid", "n_tokens", "total_chars"]
    sel = [F.col(c) for c in out_cols]
    tot = F.col("total_chars").cast("double")
    for n in top_ns:
        sel.append(
            F.round(F.coalesce(F.col(f"_top{n}"), F.lit(0)) / tot, round_to)
            .alias(f"top{n}gram_frac")
        )
    for n in dup_ns:
        sel.append(
            F.round(F.coalesce(F.col(f"_dup{n}"), F.lit(0)) / tot, round_to)
            .alias(f"dup{n}gram_frac")
        )
    return per_doc.select(*sel)


def fingerprints(docs: DataFrame) -> DataFrame:
    """(docid, content) -> (docid, sha, fp): exact-dup fingerprints.

    sha = sha256 of raw content (the BASELINE.json per-row invariant hash);
    fp = md5 of the *normalized* token stream (lowercased tokens joined by
    one space) — robust to whitespace/case-only edits. Both are JVM-side
    built-ins; md5/sha256 hex output is identical across Spark and DuckDB,
    which makes these oracle-checkable.
    """
    norm = F.array_join(
        F.regexp_extract_all(F.lower("content"), F.lit(TOKEN_RE), 0), " "
    )
    return docs.select(
        "docid",
        F.sha2("content", 256).alias("sha"),
        F.md5(norm).alias("fp"),
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 4, w: int = 5
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    rolling hash over k-token grams, minimum per sliding window of w
    hashes, distinct minima as the fingerprint set.

    -> (docid, fp long) exploded rows. Guarantees: any shared run of
    >= k + w - 1 tokens between two documents shares at least one
    fingerprint — the near-dup detection primitive plagiarism/clone
    pipelines use. All JVM Column math (HOF lambdas over per-doc arrays,
    bounded by doc length); hashes are md5-derived so the DuckDB oracle
    reproduces them exactly. Docs with fewer than k tokens emit nothing;
    docs with fewer than w grams emit their single overall minimum
    (standard short-doc degeneration).
    """
    toks = F.regexp_extract_all(F.lower("content"), F.lit(TOKEN_RE), 0)
    d = docs.select("docid", toks.alias("toks")).filter(F.size("toks") >= k)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - k),
        lambda i: F.array_join(F.slice("toks", i + 1, k), " "),
    )
    d = d.select("docid", grams.alias("grams"))
    hashes = F.transform(
        "grams",
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
    )
    d = d.select("docid", hashes.alias("hashes"))
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("hashes") - w, F.lit(0))),
        lambda i: F.array_min(F.slice("hashes", i + 1, w)),
    )
    return (
        d.select("docid", F.explode(F.array_distinct(wins)).alias("fp"))
        .distinct()
    )


def lm_scores(docs: DataFrame, round_to: int = 6) -> DataFrame:
    """Unigram language-model quality signals per document.

    (docid, content) -> (docid, dl, xent, ppl, kl):

    * ``xent``  — cross-entropy of the document under the *corpus* unigram
      model, ``-(1/dl) * sum_occurrences ln(cf_t / C)`` (nats/token).
    * ``ppl``   — ``exp(xent)``: corpus-model perplexity. The standard
      cheap "KenLM-style" quality gate of web-corpus pipelines: boilerplate
      and natural text score low, gibberish/encoded blobs score high.
    * ``kl``    — ``KL(doc || corpus) = sum_t p_dt ln(p_dt / q_t)`` with
      ``p_dt = tf/dl``, ``q_t = cf/C``: domain-shift / repetitiveness
      signal (how far the doc's term distribution sits from the corpus).

    Shape at scale: one (docid, term) partial-agg shuffle for tf, one
    vocab-sized shuffle for cf, one tf⋈cf shuffle join, one per-doc
    aggregation — no UDF, no driver data. The corpus total C rides as a
    one-row crossJoin (broadcast NL join), never a collected scalar.

    Float identity with the DuckDB oracle: per-doc sums are ORDERED folds
    (sort_array by term, then F.aggregate left-to-right — the exact
    association ``list_reduce(list(x ORDER BY term))`` reproduces); the
    only cross-engine drift source is ln() (JVM StrictMath vs libm, ≤1
    ulp per element), absorbed by ``round_to``. Docs with zero tokens
    emit no row (they have no distribution), matching the SQL's GROUP BY.
    """
    toks = F.explode(
        F.regexp_extract_all(F.lower("content"), F.lit(TOKEN_RE), 0)
    )
    tf = (
        docs.select("docid", toks.alias("term"))
        .groupBy("docid", "term")
        .agg(F.count("*").alias("tf"))
    )
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    c_tot = cf.agg(F.sum("cf").cast("double").alias("corpus_c"))
    entries = (
        tf.join(cf, "term")
        .groupBy("docid")
        .agg(
            F.sort_array(F.collect_list(F.struct("term", "tf", "cf")))
            .alias("entries")
        )
        .crossJoin(c_tot)
    )
    dl = F.aggregate(
        "entries", F.lit(0).cast("long"), lambda acc, e: acc + e.tf
    )
    d = entries.select("docid", "entries", "corpus_c", dl.alias("dl"))
    c = F.col("corpus_c")
    dl_d = F.col("dl").cast("double")
    sum_lp = F.aggregate(
        "entries",
        F.lit(0.0),
        lambda acc, e: acc
        + e.tf.cast("double") * F.log(e.cf.cast("double") / c),
    )
    kl = F.aggregate(
        "entries",
        F.lit(0.0),
        lambda acc, e: acc
        + (e.tf.cast("double") / dl_d)
        * F.log((e.tf.cast("double") / dl_d) / (e.cf.cast("double") / c)),
    )
    xent = -sum_lp / dl_d
    return d.select(
        "docid",
        F.col("dl"),
        F.round(xent, round_to).alias("xent"),
        F.round(F.exp(xent), round_to).alias("ppl"),
        F.round(kl, round_to).alias("kl"),
    )


def bigram_lm_scores(
    docs: DataFrame, lam: float = 0.75, round_to: int = 6
) -> DataFrame:
    """Interpolated bigram-LM perplexity per document — the 2-gram core
    of the KenLM-style fluency gate, trained on and applied to the corpus
    in one pass.

    (docid, content) -> (docid, dl, xent2, ppl2):

    Per token stream t_1..t_n the score is ``ln P_uni(t_1) +
    sum_{i>=2} ln(lam * P_bi(t_i|t_{i-1}) + (1-lam) * P_uni(t_i))`` with
    MLE estimates ``P_uni(t) = cf_t / C`` and ``P_bi(b|a) = c(a,b) /
    c(a,·)`` (c(a,·) = occurrences of ``a`` as a bigram left — so rows
    with an unseen-in-train bigram are impossible: the model trains on
    the same corpus it scores). Interpolation with the unigram floor is
    what makes the signal discriminative: rote/boilerplate text rides
    high-probability bigrams, shuffled or machine-garbled text falls to
    the unigram floor. xent2 = -score/dl (nats/token), ppl2 = exp(xent2).

    Shape at scale: two model aggregations (bigram counts, unigram cf —
    both vocab-ish sized), three shuffle joins of the exploded bigram
    stream against them, one per-doc ordered fold. No UDF, no driver
    data; C and the model tables stay distributed.

    Exactness: per-doc sums fold in POSITION order (sort_array on
    (pos, ...) structs) mirroring the oracle's
    ``list_reduce(list(x ORDER BY pos))``; ln drift absorbed by
    ``round_to``. Zero-token docs emit nothing.
    """
    toks = F.regexp_extract_all(F.lower("content"), F.lit(TOKEN_RE), 0)
    d = docs.select("docid", toks.alias("toks")).filter(F.size("toks") > 0)
    tok = d.select(
        "docid", F.posexplode("toks").alias("pos", "term")
    )
    cf = tok.groupBy("term").agg(F.count("*").alias("cf"))
    c_tot = cf.agg(F.sum("cf").cast("double").alias("corpus_c"))
    big = d.select(
        "docid",
        F.posexplode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("a"),
                        F.element_at("toks", i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast(
                "array<struct<a:string,b:string>>")),
        ).alias("pos", "p"),
    ).select("docid", "pos", "p.a", "p.b")
    bc = big.groupBy("a", "b").agg(F.count("*").alias("nab"))
    left_c = bc.groupBy("a").agg(F.sum("nab").alias("na"))
    scored = (
        big.join(bc, ["a", "b"])
        .join(left_c, "a")
        .join(cf.select(F.col("term").alias("b"), "cf"), "b")
        .select(
            "docid",
            "pos",
            (
                F.lit(lam)
                * (F.col("nab").cast("double") / F.col("na").cast("double"))
            ).alias("p_bi_part"),
            F.col("cf").cast("double").alias("cf_b"),
        )
    )
    # first token: unigram-only, folded as pos = -1 so it leads the chain
    first = (
        tok.filter(F.col("pos") == 0)
        .join(cf, "term")
        .crossJoin(c_tot)
        .select(
            "docid",
            F.lit(-1).alias("pos"),
            F.log(F.col("cf").cast("double") / F.col("corpus_c"))
            .alias("lp"),
        )
    )
    rest = scored.crossJoin(c_tot).select(
        "docid",
        "pos",
        F.log(
            F.col("p_bi_part")
            + F.lit(1.0 - lam) * (F.col("cf_b") / F.col("corpus_c"))
        ).alias("lp"),
    )
    per_doc = (
        first.unionByName(rest)
        .groupBy("docid")
        .agg(
            F.count("*").cast("long").alias("dl"),
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("pos", "lp"))),
                F.lit(0.0),
                lambda acc, e: acc + e.lp,
            ).alias("score"),
        )
    )
    xent2 = -F.col("score") / F.col("dl").cast("double")
    return per_doc.select(
        "docid",
        "dl",
        F.round(xent2, round_to).alias("xent2"),
        F.round(F.exp(xent2), round_to).alias("ppl2"),
    )


# ASCII-explicit so Java regex (Spark) and RE2 (DuckDB) agree exactly;
# \d and \w unicode semantics differ between engines
REDACT_PATTERNS = {
    "number": "[0-9]+",
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
}


def redact(docs: DataFrame, mask: str = "#") -> DataFrame:
    """PII-style scrubbing pass a training-data pipeline runs before a
    corpus ships: mask email-like spans then digit runs, count what was
    masked, and fingerprint the scrubbed text.

    -> (docid, n_email, n_number, clean_sha, clean): one row per doc;
    ``clean_sha`` is the cross-engine invariant (sha256 of the scrubbed
    bytes — the analogue of the corpus sha invariant, proving both
    engines scrubbed identically). Emails are replaced BEFORE numbers so
    digits inside an address are counted once, as part of the email.
    Pure JVM regexp Column ops — one projection, no UDF, no shuffle.
    """
    email, number = REDACT_PATTERNS["email"], REDACT_PATTERNS["number"]
    no_email = F.regexp_replace(F.col("content"), email, mask)
    clean = F.regexp_replace(no_email, number, mask)
    return docs.select(
        "docid",
        F.regexp_count(F.col("content"), F.lit(email)).cast("long")
        .alias("n_email"),
        F.regexp_count(no_email, F.lit(number)).cast("long")
        .alias("n_number"),
        F.sha2(clean, 256).alias("clean_sha"),
        clean.alias("clean"),
    )
