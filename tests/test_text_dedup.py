"""Golden-output tests for text analysis + dedup operators on literal rows —
the reference's dirty-data-spec idiom (SURVEY §5: semantics.sql:59-79
annotates duplicates/NULLs and silver must provably clean them)."""

from pyspark.sql import functions as F

from apache_iceberg_lakehouse_workshop_spark.operators import dedup as DD
from apache_iceberg_lakehouse_workshop_spark.operators import textstats as TS


def docs_df(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog!!"),  # same after norm
        (3, "El perro corre en el parque y no se detiene"),
        (4, "completely different content about spark engines"),
        (5, ""),
        (6, "short text"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_count(spark):
    df = docs_df(spark).select("doc_id", TS.token_count(F.col("text")).alias("n"))
    got = {r.doc_id: r.n for r in df.collect()}
    assert got == {1: 9, 2: 9, 3: 10, 4: 6, 5: 0, 6: 2}


def test_fingerprint_normalization_invariance(spark):
    df = docs_df(spark).select("doc_id", TS.fingerprint(F.col("text")).alias("fp"))
    got = {r.doc_id: r.fp for r in df.collect()}
    assert got[1] == got[2]  # case/punct-insensitive
    assert got[1] != got[4]


def test_lang_id(spark):
    df = docs_df(spark).select("doc_id", TS.lang_id(F.col("text")).alias("lang"))
    got = {r.doc_id: r.lang for r in df.collect()}
    assert got[1] == "en"
    assert got[3] == "es"
    assert got[5] == "und"


def test_exact_dedup_keeps_lowest_id(spark):
    out = DD.exact_dedup(docs_df(spark))
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 3, 4, 5, 6]  # doc 2 deduped against doc 1


def test_exact_dup_groups(spark):
    groups = DD.exact_dup_groups(docs_df(spark)).collect()
    assert len(groups) == 1
    assert groups[0].n_docs == 2 and groups[0].keep_id == 1 and groups[0].max_id == 2


def test_shingles_and_jaccard(spark):
    df = docs_df(spark).select("doc_id", DD.shingles(F.col("text"), 3).alias("sh"))
    got = {r.doc_id: r.sh for r in df.collect()}
    assert len(got[1]) == 7  # 9 tokens -> 7 trigrams, all distinct
    assert got[1] == got[2]
    assert got[5] == [] and got[6] == []  # < 3 tokens -> no shingles
    sim = (
        df.alias("a")
        .join(df.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            "a.doc_id", "b.doc_id", DD.jaccard(F.col("a.sh"), F.col("b.sh")).alias("j")
        )
        .collect()
    )
    by_pair = {(r[0], r[1]): r.j for r in sim}
    assert by_pair[(1, 2)] == 1.0
    assert by_pair[(1, 4)] == 0.0


def test_minhash_lsh_finds_normalized_duplicates(spark):
    pairs = DD.minhash_lsh_pairs(docs_df(spark), jaccard_threshold=0.5).collect()
    assert [(p.doc_a, p.doc_b, p.jaccard_sim) for p in pairs] == [(1, 2, 1.0)]


def test_simhash_identical_distance_zero(spark):
    sig = docs_df(spark).select(
        "doc_id", DD.simhash64(F.col("text")).alias("sig")
    ).collect()
    by_id = {r.doc_id: r.sig for r in sig}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[4]
    pairs = DD.simhash_neardup_pairs(docs_df(spark), max_hamming=3).collect()
    assert (1, 2) in {(p.doc_a, p.doc_b) for p in pairs}
    found = {(p.doc_a, p.doc_b): p.hamming for p in pairs}
    assert found[(1, 2)] == 0


def test_simhash_blocking_contract(spark):
    """Pigeonhole blocking guarantee: max_hamming beyond n_chunks-1 raises
    (it would silently drop pairs); 8x8-bit chunks extend recall to
    hamming<=7 and find at least everything the 4-chunk blocking finds."""
    import pytest

    with pytest.raises(ValueError, match="pigeonhole"):
        DD.simhash_neardup_pairs(docs_df(spark), max_hamming=8)
    with pytest.raises(ValueError, match="pigeonhole"):
        DD.simhash_neardup_pairs(docs_df(spark), max_hamming=4, n_chunks=4)
    narrow = {(r.doc_a, r.doc_b) for r in
              DD.simhash_neardup_pairs(docs_df(spark), max_hamming=3, n_chunks=4).collect()}
    wide = {(r.doc_a, r.doc_b) for r in
            DD.simhash_neardup_pairs(docs_df(spark), max_hamming=3, n_chunks=8).collect()}
    assert narrow <= wide or narrow == wide


def test_bpe_token_count(spark):
    """GPT-2-style pre-tokenizer segments: contraction suffixes split,
    letter/digit/punctuation runs each count once (with their leading
    space), matching the upper-bound-of-BPE contract."""
    rows = [
        ("don't stop", 3),        # don | 't | _stop
        ("hello world", 2),       # hello | _world
        ("abc123 x!", 4),         # abc | 123 | _x | !
        ("", 0),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    got = [r[0] for r in df.select(TS.bpe_token_count(F.col("text"))).collect()]
    # pin against hand counts AND a reference re.findall of the same pattern
    import re as _re
    for (text, hand), n in zip(rows, got):
        expect = len(_re.findall(TS.BPE_SPLIT_PATTERN, text))
        assert n == expect == hand, (text, n, expect, hand)


def _py_norm(text):
    import re as _re
    s = _re.sub(" +", " ", _re.sub("[^a-z ]", " ", text.lower())).strip()
    return " ".join(w for w in s.split(" ") if w)


def _py_poly(cps, base, mod):
    acc = 0
    for c in cps:
        acc = (acc * base + c) % mod
    return acc


def _py_rolling_fp(text):
    s = _py_norm(text)
    if not s:
        return 0
    cps = [ord(c) for c in s]
    return _py_poly(cps, 257, 2147483647) * 1073741824 + _py_poly(cps, 131, 1000000007)


def _py_winnow(text, k=5, w=4):
    cps = [ord(c) for c in _py_norm(text)]
    hashes = [_py_poly(cps[i:i + k], 257, 2147483647)
              for i in range(len(cps) - k + 1)]
    if not hashes:
        return []
    if len(hashes) < w:
        return sorted({min(hashes)})
    return sorted({min(hashes[j:j + w]) for j in range(len(hashes) - w + 1)})


def test_rolling_fingerprint_matches_python_reference(spark):
    df = docs_df(spark).select(
        "doc_id", "text", TS.rolling_fingerprint(F.col("text")).alias("fp"))
    for r in df.collect():
        assert r.fp == _py_rolling_fp(r.text), r.doc_id
    got = {r.doc_id: r.fp for r in df.collect()}
    assert got[1] == got[2] and got[5] == 0 and got[1] != got[4]


def test_winnow_fingerprints_match_python_reference(spark):
    df = docs_df(spark).select(
        "doc_id", "text", TS.winnow_fingerprints(F.col("text")).alias("fps"))
    for r in df.collect():
        assert list(r.fps) == _py_winnow(r.text), r.doc_id


def test_winnowing_shared_substring_guarantee(spark):
    """Docs sharing a substring of length >= k + w - 1 (normalized) must
    share >= 1 winnowing fingerprint; tiny docs degenerate gracefully."""
    k, w = 5, 4
    shared = "identical plagiarized passage inside"
    rows = [(1, "lead-in text then " + shared + " and a unique tail"),
            (2, shared + " wrapped by other words entirely"),
            (3, "nothing in common with those two documents"),
            (4, "tiny")]  # < k chars after norm -> min-of-all fallback
    df = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        "doc_id", TS.winnow_fingerprints(F.col("text"), k=k, w=w).alias("fps"))
    got = {r.doc_id: set(r.fps) for r in df.collect()}
    assert got[1] & got[2], "winnowing guarantee violated"
    assert not (got[1] & got[3]) and not (got[2] & got[3])
    assert got[4] == set(_py_winnow("tiny", k, w))


def test_duplicate_clusters_transitive(spark):
    """A~B, B~C, D~E: components must close transitively (A,B,C together
    even though (A,C) was never emitted), rep = min id, singleton-free
    (docs without pairs are not clustered)."""
    from apache_iceberg_lakehouse_workshop_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 7), (7, 3), (10, 12), (20, 2)], ["doc_a", "doc_b"]
    )
    out = {r["doc_id"]: r["cluster_rep"] for r in duplicate_clusters(pairs).collect()}
    assert out == {1: 1, 7: 1, 3: 1, 10: 10, 12: 10, 20: 2, 2: 2}


def test_duplicate_clusters_long_chain_converges(spark):
    """A 12-node path graph (worst-case diameter for label propagation)
    still converges inside the default round budget and labels every
    node with the chain head."""
    from apache_iceberg_lakehouse_workshop_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], ["doc_a", "doc_b"]
    )
    out = {r["doc_id"]: r["cluster_rep"] for r in duplicate_clusters(pairs).collect()}
    assert set(out) == set(range(100, 113))
    assert set(out.values()) == {100}


def test_duplicate_clusters_diameter_guard(spark):
    """max_iter smaller than the component diameter raises instead of
    silently returning partial clusters."""
    import pytest

    from apache_iceberg_lakehouse_workshop_spark.operators.dedup import duplicate_clusters

    import apache_iceberg_lakehouse_workshop_spark.operators.dedup as dedup_mod

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200, 210)], ["doc_a", "doc_b"]
    )
    # the driver union-find path always converges; the guard protects the
    # DISTRIBUTED loop — pin it by disabling the local path
    prev = dedup_mod._CC_LOCAL_MAX_EDGES
    dedup_mod._CC_LOCAL_MAX_EDGES = -1
    try:
        with pytest.raises(RuntimeError, match="did not converge"):
            duplicate_clusters(pairs, max_iter=2)
    finally:
        dedup_mod._CC_LOCAL_MAX_EDGES = prev


def test_winnow_rows_match_column_form(spark, sf_dir):
    """winnow_fingerprint_rows (relational scale form) selects EXACTLY the
    fingerprints of the array-lambda column form, per doc, on real docs
    and on degenerate short strings."""
    from apache_iceberg_lakehouse_workshop_spark.tables import load_table

    # truncate: the column form is O(n^2 k) interpreted (why the row form
    # exists) — 120 chars keeps the parity check meaningful and fast
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 12).select(
        "doc_id", F.substring("text", 1, 120).alias("text")
    )
    extra = spark.createDataFrame(
        [(9001, "tiny"), (9002, "ab"), (9003, "exactly five"), (9004, "")],
        ["doc_id", "text"],
    )
    corpus = docs.unionByName(extra)
    for k, w in ((5, 4), (12, 8)):
        col_form = corpus.select(
            "doc_id", F.explode(TS.winnow_fingerprints(F.col("text"), k=k, w=w)).alias("fp")
        )
        row_form = TS.winnow_fingerprint_rows(corpus, k=k, w=w)
        want = {(r["doc_id"], r["fp"]) for r in col_form.collect()}
        got = {(r["id"], r["fp"]) for r in row_form.collect()}
        assert got == want, (k, w)
