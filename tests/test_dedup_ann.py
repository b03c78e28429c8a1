"""Recall tests for the approximate dedup paths — the checks the oracle
can't do (LSH is allowed to miss pairs; here we pin down HOW MUCH, on
planted near-duplicates, so a recall regression fails loudly).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from large_csv_etl_spark.queries.dedup import (
    QUERIES as DEDUP_QUERIES,
    embedding_neardup_pairs,
)

from .conftest import SF_DIR


def test_embedding_lsh_recall_on_planted_neardups(spark):
    """Plant 60 pairs with cosine > 0.95; banded LSH (8 bands x 8 bits)
    must recover >= 90% of them (theoretical recall ~0.989)."""
    rng = np.random.default_rng(7)
    n_pairs, dim = 60, 64
    base = rng.standard_normal((n_pairs, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # noise norm ~ 0.015*sqrt(64) = 0.12 -> cos(base, near) ~ 0.993 >> 0.95
    near = base + 0.015 * rng.standard_normal((n_pairs, dim))
    rows = []
    for i in range(n_pairs):
        rows.append((i, [float(x) for x in base[i]]))
        rows.append((i + 1000, [float(x) for x in near[i]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_neardup_pairs(emb, threshold=0.95).collect()
    }
    planted = {(i, i + 1000) for i in range(n_pairs)}
    found = len(planted & got)
    assert found >= 0.9 * n_pairs, f"LSH recall too low: {found}/{n_pairs}"
    # verification step is exact, so no non-planted random pair may appear
    extras = got - planted
    assert not extras, f"false positives past exact verify: {extras}"


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """MinHash-LSH must recover the clearly-similar pairs that the exact
    n-gram Jaccard join finds (jaccard >= 0.3, comfortably above the 0.2
    approxSimilarityJoin threshold)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in DEDUP_QUERIES["dedup_ngram_jaccard"](spark, SF_DIR)
        .filter(F.col("jaccard") >= 0.3)
        .collect()
    }
    if not exact:
        pytest.skip("no high-jaccard pairs at this SF")
    got = {
        (r.doc_a, r.doc_b)
        for r in DEDUP_QUERIES["dedup_minhash_lsh"](spark, SF_DIR).collect()
    }
    missed = exact - got
    assert len(missed) <= 0.2 * len(exact), (
        f"MinHash missed {len(missed)}/{len(exact)} exact pairs: {missed}"
    )


def test_simhash_neardup_on_planted_dups(spark):
    """Docs differing in one token out of ~40 have near-identical SimHash;
    the exact pigeonhole banding must surface every pair with hamming<=3,
    and unrelated docs must not pair up."""
    import random

    from large_csv_etl_spark.queries.dedup import (
        SIMHASH_MAX_HAMMING,
        simhash_fingerprints,
        simhash_neardup_pairs,
    )

    rnd = random.Random(13)
    vocab = [f"w{i}" for i in range(5000)]
    rows = []
    for i in range(40):
        words = [rnd.choice(vocab) for _ in range(40)]
        rows.append((i, " ".join(words)))
        mutated = list(words)
        mutated[7] = rnd.choice(vocab)
        rows.append((i + 1000, " ".join(mutated)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    fp = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
    expected = {
        (i, i + 1000)
        for i in range(40)
        if bin(fp[i] ^ fp[i + 1000]).count("1") <= SIMHASH_MAX_HAMMING
    }
    # one-token edits at 40 tokens keep most planted pairs under the cutoff
    assert len(expected) >= 20, f"fixture too noisy: {len(expected)} pairs"

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_neardup_pairs(docs).collect()
    }
    assert expected <= set(got), f"missed: {expected - set(got)}"
    for (a, b), h in got.items():
        assert bin(fp[a] ^ fp[b]).count("1") == h


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF with nprobe=8 of 16 lists must recover most of the true top-10
    (exact overlap depends on how neighbors concentrate in the probed
    lists; planted-neighbor recovery is the hard guarantee checked via
    rank-1 agreement)."""
    from large_csv_etl_spark.queries.similarity import QUERIES as SIM_QUERIES

    brute = [r.vec_id for r in SIM_QUERIES["sim_cosine_topk"](spark, SF_DIR).collect()]
    ivf = [r.vec_id for r in SIM_QUERIES["sim_ivf_topk"](spark, SF_DIR).collect()]
    overlap = len(set(brute) & set(ivf))
    assert overlap >= 5, f"IVF recall too low: {overlap}/10 ({ivf} vs {brute})"
    # the single nearest neighbor concentrates in the query's own list —
    # rank-1 must always survive probing half the lists
    assert ivf[0] == brute[0]


def test_connected_components_transitive_chain(spark):
    from large_csv_etl_spark.graph import connected_components

    # chain 1-2-3-4 plus isolated pair 10-11: one 4-component, one 2-component
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    from large_csv_etl_spark.graph import connected_components

    # worst-case path graph: 0-1-2-...-12 (diameter > default star case)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == 13


def test_connected_components_random_graphs_match_union_find(spark):
    import random

    from large_csv_etl_spark.graph import connected_components

    rng = random.Random(7)
    for trial in range(3):
        nodes = list(range(30))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(25)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        # reference union-find
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {}
        for a, b in edges:
            for n in (a, b):
                expected[n] = find(n)
        # canonical: min node id per component
        comp_min = {}
        for n, r in expected.items():
            comp_min.setdefault(r, n)
            comp_min[r] = min(comp_min[r], n)
        expected = {n: comp_min[r] for n, r in expected.items()}

        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.component for r in connected_components(df).collect()}
        assert got == expected, f"trial {trial}"


def test_fastss_fuzzy_pairs_complete_vs_bruteforce(spark):
    """The deletion-neighborhood join must find EVERY vocab pair within
    edit distance 2 (FastSS guarantees a superset of candidates; the
    levenshtein verify makes it exact) — checked against an O(V^2)
    brute force over the actual corpus vocabulary."""
    from large_csv_etl_spark.queries.text import QUERIES as TEXT_QUERIES

    got = {
        (r.token_a, r.token_b, r.dist)
        for r in TEXT_QUERIES["text_fuzzy_token_pairs"](spark, SF_DIR).collect()
    }

    vocab = [
        r.token
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.trim("text") != "")
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"))
        .filter(F.length("token") >= 3)
        .distinct()
        .collect()
    ]

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    expected = set()
    for i, a in enumerate(vocab):
        for b in vocab[i + 1:]:
            lo, hi = sorted((a, b))
            d = lev(lo, hi)
            if d <= 2:
                expected.add((lo, hi, d))

    assert got == expected


def test_portable_minhash_recall_vs_exact_jaccard(spark):
    """The md5-slice portable MinHash twin obeys the same recall contract
    as the xxhash64 production variant: it must recover the clearly-similar
    pairs the exact n-gram Jaccard join finds."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in DEDUP_QUERIES["dedup_ngram_jaccard"](spark, SF_DIR)
        .filter(F.col("jaccard") >= 0.3)
        .collect()
    }
    if not exact:
        pytest.skip("no high-jaccard pairs at this SF")
    got = {
        (r.doc_a, r.doc_b)
        for r in DEDUP_QUERIES["dedup_minhash_portable"](spark, SF_DIR).collect()
    }
    missed = exact - got
    assert len(missed) <= 0.2 * len(exact), (
        f"portable MinHash missed {len(missed)}/{len(exact)}: {missed}"
    )


def test_portable_simhash_neardup_on_planted_dups(spark):
    """Portable 60-bit SimHash: the 4x15-bit pigeonhole banding must
    surface every planted pair with hamming<=3, fingerprints stay inside
    60 bits, and reported hamming distances are exact."""
    import random

    from large_csv_etl_spark.queries.dedup import (
        SIMHASH_MAX_HAMMING,
        simhash_portable_fingerprints,
    )

    rnd = random.Random(29)
    vocab = [f"w{i}" for i in range(5000)]
    rows = []
    for i in range(40):
        words = [rnd.choice(vocab) for _ in range(40)]
        rows.append((i, " ".join(words)))
        mutated = list(words)
        mutated[7] = rnd.choice(vocab)
        rows.append((i + 1000, " ".join(mutated)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    fp = {
        r.doc_id: r.simhash
        for r in simhash_portable_fingerprints(docs).collect()
    }
    assert all(0 <= v < (1 << 60) for v in fp.values())
    expected = {
        (i, i + 1000)
        for i in range(40)
        if bin(fp[i] ^ fp[i + 1000]).count("1") <= SIMHASH_MAX_HAMMING
    }
    assert len(expected) >= 20, f"fixture too noisy: {len(expected)} pairs"

    from large_csv_etl_spark.queries.dedup import (
        _PORTABLE_SIMHASH_BITS,
        _simhash_band_verify,
    )

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in _simhash_band_verify(
            simhash_portable_fingerprints(docs),
            bits=_PORTABLE_SIMHASH_BITS,
            hamming_type="bigint",
        ).collect()
    }
    assert expected <= set(got), f"missed: {expected - set(got)}"
    for (a, b), h in got.items():
        assert bin(fp[a] ^ fp[b]).count("1") == h
