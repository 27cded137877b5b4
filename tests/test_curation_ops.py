"""Curation operators: decontamination, repetition signals, PII scrub.

Registry queries t9/t10/t11 pin these against DuckDB oracles at sf0.01;
these tests pin the micro-semantics the synthetic corpus can't isolate:
exact n-gram boundary behavior, tie-breaks, sequential PII redaction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_lakehouse_workshop_spark.operators.textstats import (
    ngram_contamination,
    pii_scrub,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_contamination_exact_boundary(spark):
    """A full 4-gram shared -> flagged; only a 3-gram shared -> clean."""
    bench = _docs(spark, [(1, "alpha beta gamma delta epsilon")])
    train = _docs(
        spark,
        [
            (10, "xx alpha beta gamma delta yy"),       # contains 4-gram
            (11, "xx alpha beta gamma zz"),              # only 3-gram
            (12, "unrelated words entirely here now"),   # clean
        ],
    )
    out = {r["train_id"]: r for r in ngram_contamination(train, bench, n=4).collect()}
    assert set(out) == {10}
    assert out[10]["n_shared_grams"] == 1
    assert out[10]["n_bench_docs"] == 1


def test_contamination_counts_distinct_grams_and_docs(spark):
    bench = _docs(
        spark,
        [(1, "one two three four"), (2, "two three four five")],
    )
    # contains "one two three four" (bench 1), "two three four" overlap
    # spans both bench docs' gram sets at n=3
    train = _docs(spark, [(10, "one two three four five")])
    out = ngram_contamination(train, bench, n=3).collect()[0]
    # train 3-grams: one-two-three, two-three-four, three-four-five
    # bench grams: {one-two-three, two-three-four} u {two-three-four, three-four-five}
    assert out["n_shared_grams"] == 3
    assert out["n_bench_docs"] == 2


def test_contamination_rejects_bad_n(spark):
    d = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        ngram_contamination(d, d, n=0)


def test_repetition_stats_micro(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            _docs(
                spark,
                [
                    (1, "a a a b"),       # dup 2/4; bigrams: aa aa ab -> top 'a a' 2/3
                    (2, "solo"),          # one token: no bigrams
                    (3, "x y x y"),       # bigrams: xy yx xy -> top 'x y' 2/3
                ],
            )
        ).collect()
    }
    r1 = out[1]
    assert r1["n_tokens"] == 4
    assert r1["dup_token_frac"] == 0.5
    assert r1["top_bigram"] == "a a"
    assert r1["top_bigram_frac"] == round(2 / 3, 6)
    assert out[2]["top_bigram"] is None
    assert out[2]["top_bigram_frac"] == 0.0
    assert out[3]["top_bigram"] == "x y"   # tie 2-vs-1 resolved by count


def test_repetition_tiebreak_lexicographic(spark):
    # 'b b' and 'a a' both appear once -> lexicographically smallest wins
    out = repetition_stats(_docs(spark, [(1, "b b c a a")])).collect()[0]
    assert out["top_bigram"] == "a a"


def test_pii_scrub_sequential_redaction(spark):
    rows = [
        (1, "mail jane.doe+x@host.example.com now"),
        (2, "ssn 123-45-6789 and phone (415) 555-0132 here"),
        (3, "clean text with no identifiers at all"),
    ]
    out = {r["doc_id"]: r for r in pii_scrub(_docs(spark, rows)).collect()}
    assert (out[1]["n_emails"], out[1]["n_ssns"], out[1]["n_phones"]) == (1, 0, 0)
    # the SSN must NOT also be counted by the looser phone pattern
    assert (out[2]["n_emails"], out[2]["n_ssns"], out[2]["n_phones"]) == (0, 1, 1)
    assert (out[3]["n_emails"], out[3]["n_ssns"], out[3]["n_phones"]) == (0, 0, 0)
    # clean text passes through byte-identical
    assert out[3]["clean_len"] == len(rows[2][1])


def test_pii_scrub_redacted_text_has_no_digits_left(spark):
    red = pii_scrub(
        _docs(spark, [(1, "a 123-45-6789 b 650 555 0199 c x@y.io")]),
    ).collect()[0]
    assert red["n_ssns"] == 1 and red["n_phones"] == 1 and red["n_emails"] == 1


def test_chunking_boundaries(spark):
    from apache_iceberg_lakehouse_workshop_spark.operators.textstats import (
        chunk_documents,
    )

    docs = _docs(
        spark,
        [
            (1, " ".join("w" + chr(97 + i) for i in range(20))),  # 2 chunks
            (2, " ".join("w" + chr(97 + i) for i in range(16))),  # one window
            (3, "a b c"),                               # shorter than window
            (4, ""),                                    # no tokens -> no chunks
        ],
    )
    out = {}
    for r in chunk_documents(docs, window=16, stride=12).collect():
        out.setdefault(r.doc_id, []).append((r.chunk_id, r.n_tokens, r.chunk_text))
    for v in out.values():
        v.sort()
    assert [c[:2] for c in out[1]] == [(0, 16), (1, 8)]
    assert out[1][1][2].startswith("wm ")           # overlap starts at token 12
    assert [c[:2] for c in out[2]] == [(0, 16)]     # NO redundant tail chunk
    assert [c[:2] for c in out[3]] == [(0, 3)]
    assert 4 not in out
    # every token of every doc is covered by at least one chunk
    assert out[1][0][2].split()[0] == "wa" and out[1][1][2].split()[-1] == "wt"


def test_chunking_rejects_bad_params(spark):
    from apache_iceberg_lakehouse_workshop_spark.operators.textstats import (
        chunk_documents,
    )

    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a b")]), window=0)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a b")]), stride=0)


def test_sequence_packing_invariants(spark, sf_dir):
    """pack_training_windows (T13): every bin except the last holds
    EXACTLY `window` tokens; per-doc assigned ranges tile the doc with no
    gap/overlap; bin contents are contiguous (offsets + lengths chain);
    and the output is independent of input partitioning (the parallel
    prefix sum is a pure function of the md5 total order)."""
    from apache_iceberg_lakehouse_workshop_spark.operators.textstats import (
        pack_training_windows,
        token_count,
    )
    from apache_iceberg_lakehouse_workshop_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    W = 32
    out = pack_training_windows(d, window=W).collect()

    by_bin, by_doc = {}, {}
    for r in out:
        by_bin.setdefault(r.bin_id, []).append(r)
        by_doc.setdefault(r.doc_id, []).append(r)

    total = sum(r.tok_end - r.tok_start for r in out)
    last_bin = max(by_bin)
    for b, rows in by_bin.items():
        n = sum(r.tok_end - r.tok_start for r in rows)
        if b != last_bin:
            assert n == W, f"bin {b} holds {n} tokens"
        else:
            assert 0 < n <= W
        # contiguity inside the bin: offsets + lengths chain to n
        rows.sort(key=lambda r: r.bin_offset)
        pos = 0
        for r in rows:
            assert r.bin_offset == pos
            pos += r.tok_end - r.tok_start
        assert pos == n
    assert set(by_bin) == set(range(last_bin + 1)), "bin ids are dense"

    # per-doc tiling: ranges partition [0, n_tokens) in order
    counts = {
        r.doc_id: r.n
        for r in d.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            token_count(F.col("text")).alias("n"),
        ).collect()
    }
    for doc, rows in by_doc.items():
        rows.sort(key=lambda r: r.tok_start)
        assert rows[0].tok_start == 0
        for a, b2 in zip(rows, rows[1:]):
            assert a.tok_end == b2.tok_start
        assert rows[-1].tok_end == counts[doc]
    assert total == sum(v for k, v in counts.items() if v > 0 and k in by_doc)

    # partitioning independence: a different input layout, same output
    out2 = pack_training_windows(d.repartition(17), window=W).collect()
    key = lambda r: (r.bin_id, r.doc_id, r.tok_start, r.tok_end, r.bin_offset)
    assert sorted(map(key, out)) == sorted(map(key, out2))


# ------------------------------------------------- boilerplate scrub (t14)


def test_boilerplate_scrub_micro(spark):
    """Hand-checkable corpus: a 3-gram shared by 3 docs is flagged at
    min_doc_freq=3 and every token it covers is removed; unique prose
    survives; docs without the gram are untouched."""
    from apache_iceberg_lakehouse_workshop_spark.operators.textstats import (
        boilerplate_ngram_scrub,
    )

    banner = "subscribe to our newsletter"
    rows = [
        (1, f"{banner} alpha beta gamma"),
        (2, f"delta {banner} epsilon"),
        (3, f"zeta eta {banner}"),
        (4, "totally unique text here"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {
        r.doc_id: r
        for r in boilerplate_ngram_scrub(df, n=3, min_doc_freq=3).collect()
    }
    # the banner is 4 tokens = two overlapping flagged 3-grams -> all 4 go
    assert out[1].scrubbed_text == "alpha beta gamma"
    assert out[1].n_removed == 4
    assert out[2].scrubbed_text == "delta epsilon"
    assert out[3].scrubbed_text == "zeta eta"
    assert out[4].scrubbed_text == "totally unique text here"
    assert out[4].n_removed == 0
    # token accounting: n_tokens counts the pre-scrub tokens
    assert out[1].n_tokens == 7


def test_boilerplate_scrub_threshold_boundary(spark):
    """df = min_doc_freq - 1 is NOT flagged (strict >= threshold)."""
    from apache_iceberg_lakehouse_workshop_spark.operators.textstats import (
        boilerplate_ngram_scrub,
    )

    rows = [(1, "shared phrase here one"), (2, "shared phrase here two")]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = boilerplate_ngram_scrub(df, n=3, min_doc_freq=3).collect()
    assert all(r.n_removed == 0 for r in out)
    out2 = boilerplate_ngram_scrub(df, n=3, min_doc_freq=2).collect()
    assert all(r.n_removed == 3 for r in out2)


def test_boilerplate_scrub_short_docs_pass_through(spark):
    """Docs shorter than n tokens produce no grams and survive whole."""
    from apache_iceberg_lakehouse_workshop_spark.operators.textstats import (
        boilerplate_ngram_scrub,
    )

    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "tiny doc")],
        "doc_id INT, text STRING",
    )
    out = boilerplate_ngram_scrub(df, n=5, min_doc_freq=2).collect()
    assert {r.doc_id: r.scrubbed_text for r in out} == {
        1: "tiny doc", 2: "tiny doc", 3: "tiny doc",
    }


# ---------------------------------------------------- domain caps (t15)


def test_cap_per_stratum_exact_counts_and_weights(spark):
    from apache_iceberg_lakehouse_workshop_spark.operators.sampling import (
        cap_per_stratum,
    )

    rows = [(i, "big" if i < 40 else "small") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING")
    out = cap_per_stratum(df, "source", {"big": 10}, ["doc_id"], default_cap=None)
    got = out.groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in got}
    assert counts == {"big": 10, "small": 10}  # small uncapped (10 rows)
    w = {r.source: r.mix_weight for r in out.select("source", "mix_weight").distinct().collect()}
    assert w["big"] == 4.0  # 40 total / 10 kept
    assert w["small"] == 1.0


def test_cap_per_stratum_stable_under_append_and_partitioning(spark):
    """The kept set at rank<=cap only shrinks-or-holds when data appends
    (new rows can displace the tail, never reshuffle selection order), and
    is independent of input partitioning."""
    from apache_iceberg_lakehouse_workshop_spark.operators.sampling import (
        cap_per_stratum,
    )

    rows = [(i, "s") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING")
    base = {r.doc_id: r.sample_rank for r in cap_per_stratum(
        df, "source", {"s": 8}, ["doc_id"]).collect()}
    # partitioning independence
    rep = {r.doc_id: r.sample_rank for r in cap_per_stratum(
        df.repartition(13), "source", {"s": 8}, ["doc_id"]).collect()}
    assert base == rep
    # append: selection order of surviving members is unchanged
    df2 = spark.createDataFrame([(i, "s") for i in range(60)], "doc_id INT, source STRING")
    after = {r.doc_id: r.sample_rank for r in cap_per_stratum(
        df2, "source", {"s": 8}, ["doc_id"]).collect()}
    shared = set(base) & set(after)
    ranks_base = sorted(base[d] for d in shared)
    ranks_after = sorted(after[d] for d in shared)
    # surviving members keep their relative coordinate order
    order_base = sorted(shared, key=lambda d: base[d])
    order_after = sorted(shared, key=lambda d: after[d])
    assert order_base == order_after
    assert len(ranks_base) == len(ranks_after)


def test_lm_perplexity_reference_and_partitioning(spark):
    """CCNet LM scoring: (a) self-trained scores are partitioning-
    independent (int64-quantized log-prob sums, parallel prefix rank);
    (b) with an external reference corpus, unseen contexts take the
    uniform 1/V branch and unseen continuations the (0+k) numerator —
    fluent-under-reference docs score lower than out-of-domain ones."""
    from apache_iceberg_lakehouse_workshop_spark.operators.textstats import (
        lm_perplexity,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat again"),
            (3, "zq xv qj zz vx jq"),          # out-of-domain gibberish
            (4, "the mat sat on the cat"),
            (5, "one"),                         # <2 tokens: excluded
        ],
        "doc_id INT, text STRING",
    )
    base = {r.doc_id: (r.n_bigrams, r.log_ppl, r.bucket)
            for r in lm_perplexity(docs).collect()}
    assert set(base) == {1, 2, 3, 4}
    rep = {r.doc_id: (r.n_bigrams, r.log_ppl, r.bucket)
           for r in lm_perplexity(docs.repartition(7)).collect()}
    assert base == rep

    ref = spark.createDataFrame(
        [(100, "the cat sat on the mat the cat sat on the mat")],
        "doc_id INT, text STRING",
    )
    scored = {r.doc_id: r.log_ppl for r in lm_perplexity(docs, reference=ref).collect()}
    # doc 1 is in-domain for the reference; doc 3 shares no vocabulary
    assert scored[1] < scored[3]
    # doc 4 reuses the vocab but with unseen transitions: worse than 1,
    # better than pure unseen-context gibberish
    assert scored[1] < scored[4] <= scored[3]


def test_bm25_ranks_term_dense_short_docs_first(spark):
    from apache_iceberg_lakehouse_workshop_spark.operators.textstats import bm25_topk

    rows = [
        (1, "spark spark spark"),                      # dense, short
        (2, "spark " + "filler " * 40),                # one hit, long
        (3, "spark spark " + "filler " * 40),          # two hits, long
        (4, "nothing relevant here"),
        (5, "vector stream spark"),                    # all three terms
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = bm25_topk(df, ["spark", "vector", "stream"], n=5).collect()
    ranked = [r.doc_id for r in out]
    assert 4 not in ranked  # no query term -> no row
    assert ranked[0] == 5  # matches every term
    # same term count, shorter doc wins; more hits beat fewer at equal dl
    assert ranked.index(1) < ranked.index(3) < ranked.index(2)
    assert [r.rank for r in out] == [1, 2, 3, 4]
    assert all(r.score_q6 > 0 for r in out)
    # a duplicated query term scores once, not twice (the exploded-tf
    # form deduped via groupBy; the wide-row form must match)
    dup = bm25_topk(df, ["spark", "vector", "stream", "spark"], n=5).collect()
    assert [(r.rank, r.doc_id, r.score_q6) for r in dup] == [
        (r.rank, r.doc_id, r.score_q6) for r in out
    ]


def test_dsir_selects_target_like_documents(spark):
    from apache_iceberg_lakehouse_workshop_spark.operators.textstats import dsir_topk

    rows = (
        # the target subset: distinct vocabulary
        [(i, "alpha beta gamma alpha beta", "tgt") for i in range(5)]
        # raw candidates: one target-like, one mixed, several off-target
        + [(10, "alpha beta alpha beta", "raw"),
           (11, "alpha zeta eta theta", "raw")]
        + [(20 + i, "zeta eta theta zeta eta", "raw") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, src STRING")
    out = dsir_topk(df, "src = 'tgt'", n=20).collect()
    w = {r.doc_id: r.weight_q6 for r in out}
    # target-like candidate outranks mixed outranks off-target
    assert w[10] > w[11] > w[20]
    assert all(w[20 + i] == w[20] for i in range(5))  # identical docs tie
    ranked = [r.doc_id for r in out]
    assert ranked.index(10) < ranked.index(11) < ranked.index(20)


def test_encode_token_ids_chain(spark):
    from apache_iceberg_lakehouse_workshop_spark.operators.textstats import (
        encode_token_ids,
    )

    df = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "bb zz"), (3, "")],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r for r in encode_token_ids(df, vocab_size=2).collect()}
    # vocab: aa (3) -> 1, bb (2) -> 2; cc/zz OOV -> 0
    import hashlib

    assert out[1].n_tokens == 4 and out[1].n_oov == 1
    assert out[1].ids_md5 == hashlib.md5(b"1,2,1,0").hexdigest()
    assert out[2].n_tokens == 2 and out[2].n_oov == 1
    assert out[2].ids_md5 == hashlib.md5(b"2,0").hexdigest()
    assert 3 not in out  # empty doc: no tokens, no row
