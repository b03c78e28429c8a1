"""Deduplication suite (driver mandate): exact, n-gram Jaccard, MinHash-LSH,
SimHash, embedding-cosine near-dup — over ``documents`` / ``embeddings``.

Scale notes (the whole point of each design):
- exact: one hash-aggregate on a fingerprint — shuffles |corpus| keys of
  16 bytes, the cheapest possible dedup at 100 TB.
- n-gram Jaccard: candidates generated inside per-shingle posting lists
  (never an O(n^2) cross join); each shared shingle is an LSH band with
  band = one shingle. Hot shingles are DF-capped (stopword-shingle skew
  guard, MAX_SHINGLE_DF).
- MinHash-LSH: native expression MinHash (derived xxhash64 permutations,
  one map-side-combinable shuffle) + banded posting-list candidates +
  estimator scoring.
- SimHash: 64 bitplane sums per doc, all JVM-side expressions; near-dup =
  exact pigeonhole banding on 16-bit prefixes + bit_count Hamming verify.
- embedding near-dup: banded random-hyperplane LSH candidates (pandas_udf
  signature matmul) + exact cosine verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..io import load_table
from .helpers import (
    fp_sum,
    materialize_reduced,
    phash60,
    shard_assign,
    sql_phash60,
    sql_shard,
)

QUERIES = {}
ORACLES = {}


def _q(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _norm_text(c):
    return F.lower(F.trim(c))


@_q(
    "dedup_exact_groups",
    """
    SELECT fingerprint, COUNT(*) AS group_size, MIN(doc_id) AS canonical_doc_id
    FROM (SELECT doc_id, MD5(LOWER(TRIM(text))) AS fingerprint FROM documents)
    GROUP BY fingerprint
    HAVING COUNT(*) > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content fingerprint, surface duplicate groups
    with a deterministic canonical representative (min doc_id)."""
    df = load_table(spark, sf_dir, "documents")
    return (
        df.select("doc_id", F.md5(_norm_text(F.col("text"))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("group_size"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("group_size") > 1)
    )


@_q(
    "dedup_exact_survivors",
    """
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT MD5(LOWER(TRIM(text)))) AS n_unique,
           COUNT(*) - COUNT(DISTINCT MD5(LOWER(TRIM(text)))) AS n_removed
    FROM documents
    """,
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup accounting: corpus size vs unique-content size (A7-style row
    accounting, /root/reference/src/data_processor.py:188-210, applied to
    dedup instead of chunk transforms)."""
    df = load_table(spark, sf_dir, "documents")
    fp = F.md5(_norm_text(F.col("text")))
    return df.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
        (F.count("*") - F.countDistinct(fp)).alias("n_removed"),
    )


def _shingles(tokens_col, n: int = 3):
    """Word n-gram shingle array from a token array. Built as arrays_zip of
    n shifted slices + one transform — NOT per-index element_at lambdas:
    higher-order lambdas are interpreted (no codegen, no common-subexpr
    elimination), so an element_at(tokens, i+k) formulation re-evaluates
    the token split per gram and is ~20x slower. Returns distinct shingles.
    """
    tc = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    m = F.size(tc) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(tc, 1 + k, m) for k in range(n)])
    gram = lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
    return F.array_distinct(F.transform(zipped, gram))


def _posting_list_pairs(buckets: DataFrame) -> DataFrame:
    """(doc_a, doc_b) with doc_a < doc_b from a sorted ``docs`` array
    column — all i<j combinations generated in-place with nested array
    transforms, so candidate pairing never needs a corpus self-join (the
    bucket/posting-list size cap bounds the worst case)."""
    pair_structs = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return buckets.select(F.explode(pair_structs).alias("p")).select(
        "p.doc_a", "p.doc_b"
    )


def shingle_rows(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) rows for every document with >= n tokens.

    Tokenizes once into a column, then shingles. The repartition is gated
    on the scan's actual split count: the local fixture parquet is a single
    file (one input partition) and shingling is the CPU-heavy step, so an
    under-split scan gets one cheap up-front shuffle to use every core. A
    well-split scan (the cluster case) is left alone — an explicit
    repartition is not AQE-coalescible and would force a full shuffle of
    the corpus text for nothing.
    """
    sc = docs.sparkSession.sparkContext
    # project to the two consumed columns BEFORE the gated repartition:
    # the exchange otherwise carries (and the scan reads) every document
    # column — guide-§2.3 "project before the exchange" / scan pruning
    docs = docs.select("doc_id", "text")
    if docs.rdd.getNumPartitions() < sc.defaultParallelism // 2:
        docs = docs.repartition(sc.defaultParallelism)
    toks = F.split(_norm_text(F.col("text")), r"\s+")
    return (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= n)
        .select("doc_id", F.explode(_shingles("toks", n)).alias("shingle"))
    )


# A shingle occurring in more than MAX_SHINGLE_DF documents is a stopword
# phrase: it contributes df^2 candidate pairs to the self-join (the classic
# skew killer at scale) while carrying almost no dedup signal. Jaccard is
# therefore defined over the DF-capped shingle sets in BOTH engines.
MAX_SHINGLE_DF = 100


@_q(
    "dedup_ngram_jaccard",
    rf"""
    WITH sh0 AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
               range(1, GREATEST(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
            FROM documents WHERE TRIM(text) <> '') t
      WHERE len(toks) >= 3
    ), df AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ), sh AS (
      SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN df USING (shingle)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by word-trigram Jaccard >= 0.2 over
    DF-capped shingles.

    Candidates come from an equi-join on shared shingles (each shared
    shingle is a "band" hit), so cost is sum over shingles of freq^2 —
    not |docs|^2 — and the DF cap (<= MAX_SHINGLE_DF docs per shingle)
    bounds every freq, so the worst shingle contributes at most
    MAX_SHINGLE_DF^2 pairs regardless of corpus size. Jaccard is exact
    integer arithmetic until one final double division (deterministic
    cross-engine). The oracle applies the identical cap.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    return _ngram_jaccard_pairs_from_sh(shingle_rows(docs))


def _ngram_jaccard_pairs_from_sh(sh: DataFrame) -> DataFrame:
    """The exact-Jaccard pair pipeline over a prepared (doc_id, shingle)
    table. (Sharing one shingle table across estimator branches was
    tested in round 15 and rejected — materializing the shingle stream
    lost to recomputing it — so this split's only remaining value is
    keeping the pair pipeline separately readable/testable; every caller
    passes a fresh ``shingle_rows``.)"""
    # One shuffle groups each shingle's posting list; the DF cap and the
    # pair generation both happen on that list, and the materialization
    # makes "computed once" literally true — the posting-list table feeds
    # three branches below (sizes via sa and sb, pair generation), which
    # would otherwise each re-run the shingle explode + groupBy.
    buckets = materialize_reduced(
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") <= MAX_SHINGLE_DF)
    )
    sizes = buckets.select(F.explode("docs").alias("doc_id")).groupBy(
        "doc_id"
    ).agg(F.count("*").alias("n_sh"))
    pairs = (
        _posting_list_pairs(buckets.filter(F.size("docs") >= 2))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared")
    )
    # No broadcast hint: `pairs` is usually far smaller than `sizes`
    # (|docs| rows) at scale — AQE picks the right build side at runtime.
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.2)
    )


# MinHash-LSH tuning: 16 permutations, 8 bands of r=2. A j=0.8 true dup
# misses all 8 bands with prob (1-0.8^2)^8 ~ 3e-4; a j~0.02 random pair
# band-matches with prob ~3e-3, so candidates stay ~linear in |docs|.
MINHASH_PERMS = 16
MINHASH_BANDS = 8
MAX_BUCKET = 200  # LSH-bucket skew guard, same role as MAX_SHINGLE_DF


def _minhash_lsh_estimate(sigs: DataFrame, band_hash_for) -> DataFrame:
    """Shared post-signature MinHash-LSH pipeline, parameterized ONLY on
    the band-hash expression: band explode -> (band, bh) posting lists
    capped at MAX_BUCKET -> candidate pairs -> matches/MINHASH_PERMS
    estimator kept at est >= 0.5. Both the xxhash64 production variant
    and the portable-hash graded twin run THIS code, so a green verdict
    on the twin certifies the machinery (banding, cap, estimator), not a
    parallel reimplementation; retuning a cap or threshold here retunes
    both.

    ``sigs`` carries doc_id plus scalar minhash columns m0..m{P-1} and
    should already be materialized (it feeds three branches);
    ``band_hash_for(b)`` returns the band-hash Column for band ``b`` over
    those columns."""
    buckets = _minhash_buckets(_minhash_bands(sigs, band_hash_for))
    cand = _posting_list_pairs(buckets).dropDuplicates(["doc_a", "doc_b"])
    return _minhash_estimate_pairs(sigs, cand)


def _minhash_bands(sigs: DataFrame, band_hash_for) -> DataFrame:
    """(doc_id, band, bh) band-key rows for a signature table."""
    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_hash_for(b).alias("bh"))
            for b in range(MINHASH_BANDS)
        ]
    )
    return (
        sigs.select("doc_id", F.explode(band_structs).alias("s"))
        .select("doc_id", "s.band", "s.bh")
    )


def _minhash_buckets(bands: DataFrame) -> DataFrame:
    """Capped (band, bh) posting lists — the persisted-index shape an
    incremental deployment stores between corpus refreshes."""
    return (
        bands.groupBy("band", "bh")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= MAX_BUCKET))
    )


def _minhash_estimate_pairs(sigs: DataFrame, cand: DataFrame) -> DataFrame:
    """matches/MINHASH_PERMS estimator over candidate (doc_a, doc_b)
    pairs, kept at est >= 0.5 — the scoring tail shared by the full and
    incremental variants."""
    a = sigs.alias("a")
    b = sigs.alias("b")
    matches = None
    for i in range(MINHASH_PERMS):
        t = F.when(F.col(f"a.m{i}") == F.col(f"b.m{i}"), 1).otherwise(0)
        matches = t if matches is None else matches + t
    return (
        cand.join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(b, F.col("doc_b") == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(matches / F.lit(MINHASH_PERMS), 4).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= 0.5)
    )


@_q("dedup_minhash_lsh")  # estimated-jaccard output — rows-only check
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup join, native DataFrame expressions end-to-end.

    Signature: per doc, 16 minhashes — min over shingles of
    xxhash64(xxhash64(shingle), perm_index); one hash of the string, 16
    cheap derived hashes, one groupBy(doc_id) with 16 min aggregates (a
    single map-side-combinable shuffle). Banding: 8 band keys of r=2
    minhashes each; candidate pairs are generated inside each
    (band, band_hash) posting list (size-capped against degenerate
    buckets), never via a corpus self-join. Pairs are scored by the
    unbiased estimator matches/16 and kept at est >= 0.5 (true dups here
    have jaccard >= 0.8; P(miss) ~ 1.5e-3 at 16 perms — recall vs the
    exact n-gram join is asserted in tests). Shuffles carry only 16-byte
    band keys and 136-byte signatures — the 100 TB shape for MinHash.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    sh = shingle_rows(docs)
    h = F.xxhash64("shingle")
    sigs = (
        sh.select("doc_id", h.alias("h"))
        .groupBy("doc_id")
        .agg(
            *[
                F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"m{i}")
                for i in range(MINHASH_PERMS)
            ]
        )
    )
    # referenced by the band explode AND both estimator-join sides: one
    # materialization, or the shingle hash + 16-min aggregate runs 3x
    sigs = materialize_reduced(sigs)
    r = MINHASH_PERMS // MINHASH_BANDS

    def band_hash(b: int):
        return F.xxhash64(*[F.col(f"m{b * r + k}") for k in range(r)], F.lit(b))

    return _minhash_lsh_estimate(sigs, band_hash)


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash per document, all JVM
    expressions: xxhash64 each token, per-bitplane counts, majority -> bit.

    The 64 bitplane counters are packed 4-per-long into 16-bit lanes
    (count_i accumulates at bit 16*(i%4) of aggregate i//4), quartering
    the aggregation state and expression count vs one aggregate per bit —
    measured 2x faster at sf0.1 with bit-identical output. Lanes cannot
    carry into each other while every document has < 65,536 tokens (the
    chunking contract upstream guarantees far less; use 32-bit lanes if
    that ever changes). The majority test `2*count > n` is exactly the
    sign of the classic +/-1 sum, ties -> 0.
    """
    sc = docs.sparkSession.sparkContext
    # same split-count gate as shingle_rows: up-shuffle only an
    # under-split scan (single-file local fixture); leave a well-split
    # cluster scan alone. Projected to the two consumed columns first so
    # the exchange/scan never carry unused document columns.
    docs = docs.select("doc_id", "text")
    if docs.rdd.getNumPartitions() < sc.defaultParallelism // 2:
        docs = docs.repartition(sc.defaultParallelism)
    # project the 8-byte token hash BEFORE the bitplane aggregates so
    # xxhash64 is evaluated once per token, not once per plane, and the
    # aggregation input carries no strings
    hashed = (
        docs
        .select(
            "doc_id",
            F.explode(F.split(_norm_text(F.col("text")), r"\s+")).alias("token"),
        )
        .select("doc_id", F.xxhash64("token").alias("h"))
    )
    return _bitplane_majority_pack(hashed, bits=64)


def _bitplane_majority_pack(hashed: DataFrame, bits: int) -> DataFrame:
    """(doc_id, h) rows -> (doc_id, simhash): majority vote over the low
    ``bits`` bitplanes of ``h``, packed into one BIGINT (the lane-packed
    aggregation described in simhash_fingerprints). ``bits`` must be a
    multiple of 4 (the 4-lanes-per-long packing)."""
    assert bits % 4 == 0, bits
    groups = bits // 4
    aggs = [F.count("*").alias("n")]
    for g in range(groups):
        lanes = None
        for j in range(4):
            i = g * 4 + j
            t = F.shiftleft(
                F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)), 16 * j
            )
            lanes = t if lanes is None else lanes + t
        aggs.append(F.sum(lanes).alias(f"g{g}"))
    sums = hashed.groupBy("doc_id").agg(*aggs)
    simhash = None
    for g in range(groups):
        for j in range(4):
            i = g * 4 + j
            cnt = F.shiftright(F.col(f"g{g}"), 16 * j).bitwiseAND(F.lit(0xFFFF))
            bit = F.when(cnt * 2 > F.col("n"), F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            term = F.shiftleft(bit, i)
            simhash = term if simhash is None else simhash.bitwiseXOR(term)
    return sums.select("doc_id", simhash.alias("simhash"))


@_q("dedup_simhash")  # xxhash64-based — hash differs per engine; rows-only check
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprint per document (see simhash_fingerprints);
    ``dedup_simhash_neardup`` turns these into Hamming-distance pairs."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    return simhash_fingerprints(docs)


SIMHASH_MAX_HAMMING = 3
SIMHASH_BANDS = 4  # 16-bit bands; see exactness note below


def simhash_neardup_pairs(docs: DataFrame) -> DataFrame:
    """SimHash near-duplicate pairs: Hamming(simhash_a, simhash_b) <= 3.

    Banding is EXACT here, not probabilistic: split the 64-bit fingerprint
    into 4 disjoint 16-bit bands — a pair differing in <= 3 bits can touch
    at most 3 bands, so by pigeonhole it agrees exactly on at least one
    band and is guaranteed to surface as a candidate. Candidates are
    generated inside each (band, band_value) posting list (one shuffle of
    12-byte keys), then verified with bit_count(a XOR b) — O(1) per pair.
    This is the cheapest near-dup join in the suite at 100 TB: the only
    per-doc state is one BIGINT.
    """
    fp = simhash_fingerprints(docs)
    return _simhash_band_verify(fp, bits=64, hamming_type="int")


def _simhash_band_verify(fp: DataFrame, bits: int, hamming_type: str) -> DataFrame:
    """Banded candidate generation + Hamming verify over a (doc_id,
    simhash) fingerprint table — the pigeonhole plan from
    simhash_neardup_pairs, parameterized on fingerprint width (the
    portable 60-bit twin uses 4 x 15-bit bands, same exactness argument:
    <= 3 differing bits touch at most 3 of the 4 disjoint bands).

    The fingerprint table is referenced three times below (band explode,
    verify sides a and b), so it is materialized first — otherwise the
    token explode + bitplane aggregate upstream runs once per branch."""
    fp = materialize_reduced(fp)
    width = bits // SIMHASH_BANDS
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask))
            for b in range(SIMHASH_BANDS)
        ]
    )
    buckets = (
        fp.select("doc_id", "simhash", F.posexplode(bands).alias("band", "bv"))
        .groupBy("band", "bv")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= MAX_BUCKET))
    )
    cand = _posting_list_pairs(buckets).dropDuplicates(["doc_a", "doc_b"])
    a = fp.alias("a")
    b = fp.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        cand.join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(b, F.col("doc_b") == F.col("b.doc_id"))
        .select("doc_a", "doc_b", ham.cast(hamming_type).alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


@_q("dedup_simhash_neardup")  # xxhash64-based — rows-only check
def dedup_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-registry wrapper over simhash_neardup_pairs (see its docstring
    for the exact-banding design)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    return simhash_neardup_pairs(docs)


# --- portable (md5-derived) sketch twins --------------------------------
# The production MinHash/SimHash paths hash with xxhash64 — the right
# call at scale (one cheap JVM hash per token/shingle) but engine-specific,
# so the driver can only rows-check them. These twins swap in the portable
# 60-bit md5 slice hash (helpers.phash60), which BOTH engines evaluate
# identically, making the ENTIRE sketch->band->verify pipeline value-exact
# against the DuckDB oracle: the banding logic, bucket caps, estimator and
# thresholds are the same code paths the xxhash64 variants use, so a green
# verdict here certifies the shared machinery, not just the hash. Cost of
# portability: md5 is ~3-4x the CPU of xxhash64 per call (amortized to
# 8 digests per shingle for 16 perms by splitting each digest into two
# independent 60-bit halves) — at 100 TB you run the xxhash64 variant and
# keep this one as the cross-engine conformance check.

# DuckDB twin of queries/dedup.shingle_rows (same CTE as dedup_ngram_jaccard).
_SQL_SHINGLES = r"""
  SELECT doc_id, UNNEST(list_distinct(list_transform(
           range(1, GREATEST(len(toks) - 1, 1)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
        FROM documents WHERE TRIM(text) <> '') t
  WHERE len(toks) >= 3
"""


@_q(
    "dedup_minhash_portable",
    rf"""
    WITH sh AS ({_SQL_SHINGLES}
    ), hh AS (
      SELECT doc_id, j, md5(shingle || ':' || j) AS m
      FROM sh CROSS JOIN range(8) r(j)
    ), ph AS (
      SELECT doc_id, 2*j AS p, ('0x' || substr(m, 1, 15))::BIGINT AS h FROM hh
      UNION ALL
      SELECT doc_id, 2*j + 1 AS p, ('0x' || substr(m, 16, 15))::BIGINT AS h FROM hh
    ), sig AS (
      SELECT doc_id, p, MIN(h) AS mh FROM ph GROUP BY doc_id, p
    ), bands AS (
      SELECT s0.doc_id, b.band,
             {sql_phash60("s0.mh || ':' || s1.mh || ':' || b.band")} AS bh
      FROM range(8) b(band)
      JOIN sig s0 ON s0.p = 2 * b.band
      JOIN sig s1 ON s1.doc_id = s0.doc_id AND s1.p = 2 * b.band + 1
    ), bsz AS (
      SELECT band, bh FROM bands GROUP BY band, bh
      HAVING COUNT(*) BETWEEN 2 AND {{max_bucket}}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
      JOIN bsz ON bsz.band = a.band AND bsz.bh = a.bh
    ), est AS (
      SELECT p.doc_a, p.doc_b,
             SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS matches
      FROM pairs p
      JOIN sig sa ON sa.doc_id = p.doc_a
      JOIN sig sb ON sb.doc_id = p.doc_b AND sb.p = sa.p
      GROUP BY p.doc_a, p.doc_b
    )
    SELECT doc_a, doc_b, ROUND(matches / 16.0, 4) AS est_jaccard
    FROM est WHERE matches / 16.0 >= 0.5
    """,
)
def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup join with the portable 60-bit hash — the
    oracle-gradable twin of dedup_minhash_lsh (same 16 perms / 8 bands of
    r=2 / MAX_BUCKET cap / est >= 0.5 contract; see that docstring for the
    recall math). 16 permutation hashes cost 8 md5 digests per shingle
    (each digest yields two independent 60-bit slices); everything after
    the hash — one min-agg shuffle, capped posting-list pairing, 16-way
    match estimator — IS the production code path
    (:func:`_minhash_lsh_estimate`, shared with dedup_minhash_lsh and
    parameterized only on the band hash), so a green verdict certifies
    the shared machinery, not a twin reimplementation. The est_jaccard
    values k/16 are exact at 4 decimal places, so the final ROUND is
    engine-deterministic."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    return _minhash_lsh_estimate(_portable_minhash_sigs(docs), _portable_band_hash)


def _portable_minhash_sigs(docs: DataFrame) -> DataFrame:
    """Materialized portable-hash signature table (doc_id, m0..m15): 16
    permutation minhashes from 8 md5 digests per shingle (two independent
    60-bit slices each). This is the table an incremental deployment
    persists as the historical index. (A shared-shingle-table variant was
    tested in round 15 and REJECTED: materializing the ~3x-corpus-bytes
    shingle stream cost +15% busy-CPU vs recomputing the tokenize pass,
    so every consumer builds its own shingle rows.)"""
    sh = shingle_rows(docs)
    mins = []
    for j in range(8):
        m = F.md5(F.concat_ws(":", F.col("shingle"), F.lit(str(j))))
        lo = F.conv(F.substring(m, 1, 15), 16, 10).cast("bigint")
        hi = F.conv(F.substring(m, 16, 15), 16, 10).cast("bigint")
        mins.append(F.min(lo).alias(f"m{2 * j}"))
        mins.append(F.min(hi).alias(f"m{2 * j + 1}"))
    # same 3-branch reuse as dedup_minhash_lsh: materialize the reduced
    # signature table so the md5 shingle hashing runs once
    return materialize_reduced(sh.groupBy("doc_id").agg(*mins))


def _portable_band_hash(b: int):
    """Band-hash Column for band ``b`` of the portable signature table."""
    return phash60(
        F.concat_ws(":", F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}"), F.lit(str(b)))
    )


ORACLES["dedup_minhash_portable"] = ORACLES["dedup_minhash_portable"].format(
    max_bucket=MAX_BUCKET
)


# The 16-way shard contract marks bucket 'f' (1/16 of any corpus) as the
# simulated new-arrival delta; the other 15/16 play the historical corpus.
_DELTA_SHARD = "f"


@_q("dedup_incremental_minhash")
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: NEW documents probe the historical MinHash
    index instead of re-pairing the whole corpus — the refresh pattern
    that keeps a deduped 100 TB corpus deduped at O(|delta| x bucket)
    instead of O(|corpus| pairs) per ingest. The delta is the shard-'f'
    sixteenth of the corpus (helpers.shard_assign, the same deterministic
    contract the export shards use); only delta band keys join the capped
    posting lists, so history-history pairs are never formed — the
    concrete saving over dedup_minhash_portable's full pairing. Signature
    and banding code paths ARE the shared production machinery
    (_portable_minhash_sigs / _minhash_bands / _minhash_buckets /
    _minhash_estimate_pairs); a real deployment loads the persisted
    signature + posting-list index for the history side rather than
    recomputing it (the driver contract is stateless, so it is rebuilt
    from the fixture here).

    Output: one row per (new, existing) near-dup pair at est >= 0.5,
    oriented so new_doc_id is always the delta doc (for delta-delta
    pairs, the larger id — 'arrives later'); existing_is_history flags
    whether the match is against history (1) or an earlier delta doc (0).
    Graded value-exact against the full portable pair set filtered to
    delta-involving pairs — probe-join and filter-after-pairing must
    agree exactly, which is the correctness claim of the probe
    optimization."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    sigs = _portable_minhash_sigs(docs)
    bands = _minhash_bands(sigs, _portable_band_hash)
    buckets = _minhash_buckets(bands)
    is_delta = lambda c: shard_assign(c) == _DELTA_SHARD  # noqa: E731
    probe = (
        bands.filter(is_delta(F.col("doc_id")))
        .withColumnRenamed("doc_id", "new_id")
        .join(buckets, ["band", "bh"])
        .select("new_id", F.explode("docs").alias("existing_id"))
        .filter(F.col("existing_id") != F.col("new_id"))
        # delta-delta pairs orient toward the larger ("later") id; the
        # smaller one already probed history when IT was the delta
        .filter(
            (~is_delta(F.col("existing_id")))
            | (F.col("existing_id") < F.col("new_id"))
        )
    )
    cand = probe.select(
        F.col("new_id").alias("doc_a"), F.col("existing_id").alias("doc_b")
    ).dropDuplicates(["doc_a", "doc_b"])
    est = _minhash_estimate_pairs(sigs, cand)
    return est.select(
        F.col("doc_a").alias("new_doc_id"),
        F.col("doc_b").alias("existing_doc_id"),
        "est_jaccard",
        F.when(is_delta(F.col("doc_b")), 0).otherwise(1).alias("existing_is_history"),
    )


_SQL_IS_DELTA_A = f"{sql_shard('doc_a')} = '{_DELTA_SHARD}'"
_SQL_IS_DELTA_B = f"{sql_shard('doc_b')} = '{_DELTA_SHARD}'"
ORACLES["dedup_incremental_minhash"] = f"""
    WITH est AS ({ORACLES["dedup_minhash_portable"]}),
    oriented AS (
      SELECT CASE WHEN {_SQL_IS_DELTA_B} THEN doc_b ELSE doc_a END AS new_doc_id,
             CASE WHEN {_SQL_IS_DELTA_B} THEN doc_a ELSE doc_b END AS existing_doc_id,
             est_jaccard
      FROM est
      WHERE {_SQL_IS_DELTA_A} OR {_SQL_IS_DELTA_B}
    )
    SELECT new_doc_id, existing_doc_id, est_jaccard,
           CASE WHEN {sql_shard('existing_doc_id')} = '{_DELTA_SHARD}'
                THEN 0 ELSE 1 END AS existing_is_history
    FROM oriented
"""

_PORTABLE_SIMHASH_BITS = 60

# 60 per-bitplane SUM aggregates + the majority pack, generated once and
# spliced into both portable-simhash oracles below.
_SQL_SIMHASH_SUMS = ",\n             ".join(
    f"SUM((h >> {i}) & 1) AS c{i}" for i in range(_PORTABLE_SIMHASH_BITS)
)
_SQL_SIMHASH_PACK = " + ".join(
    f"(CASE WHEN 2*c{i} > n THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
    for i in range(_PORTABLE_SIMHASH_BITS)
)
_SQL_SIMHASH_FP = rf"""
    WITH tk AS (
      SELECT doc_id, UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS token
      FROM documents WHERE TRIM(text) <> ''
    ), h AS (
      SELECT doc_id, {sql_phash60("token")} AS h FROM tk
    ), s AS (
      SELECT doc_id, COUNT(*) AS n,
             {_SQL_SIMHASH_SUMS}
      FROM h GROUP BY doc_id
    ), fp AS (
      SELECT doc_id, {_SQL_SIMHASH_PACK} AS simhash FROM s
    )
"""


def simhash_portable_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 60-bit portable SimHash (phash60 token hash +
    the same lane-packed bitplane majority as simhash_fingerprints).
    60 bits so the fingerprint is one md5 slice wide; 4 x 15-bit bands
    preserve the Hamming<=3 pigeonhole exactness."""
    sc = docs.sparkSession.sparkContext
    # projected-then-gated like shingle_rows: no unused columns through
    # the repartition exchange or the scan
    docs = docs.select("doc_id", "text")
    if docs.rdd.getNumPartitions() < sc.defaultParallelism // 2:
        docs = docs.repartition(sc.defaultParallelism)
    hashed = (
        docs.select(
            "doc_id",
            F.explode(F.split(_norm_text(F.col("text")), r"\s+")).alias("token"),
        )
        .select("doc_id", phash60(F.col("token")).alias("h"))
    )
    return _bitplane_majority_pack(hashed, bits=_PORTABLE_SIMHASH_BITS)


@_q(
    "dedup_simhash_portable",
    _SQL_SIMHASH_FP + "\n    SELECT doc_id, simhash FROM fp",
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable 60-bit SimHash fingerprints, graded value-exact against
    the oracle's 60-aggregate bitplane unroll — certifies the bitplane
    majority/lane-packing machinery shared with the xxhash64 variant."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    return simhash_portable_fingerprints(docs)


@_q(
    "dedup_simhash_portable_neardup",
    _SQL_SIMHASH_FP
    + rf""", bands AS (
      SELECT doc_id, simhash, b.band,
             (simhash >> (15 * b.band::INT)) & 32767 AS bv
      FROM fp CROSS JOIN range(4) b(band)
    ), bsz AS (
      SELECT band, bv FROM bands GROUP BY band, bv
      HAVING COUNT(*) BETWEEN 2 AND {MAX_BUCKET}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    JOIN bsz ON bsz.band = a.band AND bsz.bv = a.bv
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """,
)
def dedup_simhash_portable_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming<=3 near-dup pairs over the portable 60-bit SimHash — the
    oracle-gradable twin of dedup_simhash_neardup (4 disjoint 15-bit bands;
    a pair differing in <= 3 bits agrees exactly on >= 1 band, so banding
    is exact, not probabilistic; MAX_BUCKET caps degenerate posting
    lists in both engines)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    fp = simhash_portable_fingerprints(docs)
    return _simhash_band_verify(
        fp, bits=_PORTABLE_SIMHASH_BITS, hamming_type="bigint"
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 64,
    n_bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Banded random-hyperplane LSH candidate join + exact cosine verify.

    The 100 TB path for embedding near-dup: never a cross join. Each vector
    gets ``n_planes`` sign bits (one numpy matmul per Arrow batch inside a
    pandas UDF — the one place Python beats JVM expressions, since 64 fold
    expressions per row would defeat codegen), grouped into ``n_bands``
    bands of ``n_planes/n_bands`` bits. Candidate pairs = pairs agreeing on
    at least one full band (equi-join on (band_id, band_hash) — shuffle
    carries 16 bytes/row, skew bounded by bucket sizes); each candidate is
    then verified with an exact double-precision cosine.

    Recall for cos > 0.95 (angle < 18.2 deg, bit-agree p ~ 0.9) with 8
    bands of 8 bits: 1 - (1 - 0.9^8)^8 ~ 0.989 — asserted on planted
    near-dups in tests. Random pairs (cos ~ 0) collide on a band with
    p ~ 0.5^8, cutting candidates ~30x vs brute force.
    """
    r = n_planes // n_bands
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((64, n_planes))
    weights = np.power(2.0, np.arange(r))  # bit weights within a band

    @pandas_udf("array<long>")
    def band_hashes(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (mat @ planes[: mat.shape[1]]) > 0  # (batch, n_planes)
        bands = bits.reshape(len(mat), n_bands, r) @ weights  # (batch, bands)
        return pd.Series(list(bands.astype(np.int64)))

    # materialized: the banded-signature table feeds both candidate-join
    # sides, which would otherwise each re-run the Arrow-batch matmul UDF
    sig = materialize_reduced(
        emb.select(
            "vec_id", "embedding", band_hashes(F.col("embedding")).alias("bands")
        )
    )
    exploded = sig.select(
        "vec_id",
        "embedding",
        F.posexplode("bands").alias("band_id", "band_hash"),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("a.embedding").alias("emb_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("b.embedding").alias("emb_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])  # pairs can agree on >1 band
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("emb_a"),
            F.col("emb_b"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.col(c),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    cos = dot / (norm("emb_a") * norm("emb_b"))
    return (
        cand.withColumn("cos", cos)
        .filter(F.col("cos") > threshold)
        .select("vec_a", "vec_b")
    )


@_q(
    "dedup_embedding_neardup",
    """
    WITH pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_cosine_similarity(a.embedding, b.embedding) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b FROM pairs WHERE cos > 0.95
    """,
)
def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine > 0.95) via banded LSH
    candidates + exact verification (see embedding_neardup_pairs).

    The oracle stays brute-force (the definition of correct), comparing
    pair IDs only; LSH recall ~0.989 at the 0.95 threshold is asserted on
    planted near-dups in tests. The driver data's max pairwise cosine is
    ~0.6 at every SF, so no boundary or recall flip is reachable here.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return embedding_neardup_pairs(emb)


@_q(
    "dedup_clusters",
    rf"""
    WITH RECURSIVE pairs AS (
      {{ngram}}
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ), reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), labels AS (
      SELECT a AS doc_id, LEAST(MIN(b), a) AS cluster_id
      FROM reach GROUP BY a
    )
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS cluster_size
    FROM labels
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the trigram-Jaccard
    candidate pairs (A~B and B~C put A,B,C in one cluster even though A,C
    never matched). This is the decision step of a dedup pipeline — keep
    min(doc_id) per cluster, drop the rest. Min-label propagation via
    ``graph.connected_components``; the oracle computes the same closure
    with a recursive CTE over the identical pair query."""
    from ..graph import connected_components

    pairs = dedup_ngram_jaccard(spark, sf_dir)
    comp = connected_components(pairs, "doc_a", "doc_b")
    w = Window.partitionBy("cluster_id")
    return (
        comp.select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
        )
        .withColumn("cluster_size", F.count("*").over(w))
    )


ORACLES["dedup_clusters"] = ORACLES["dedup_clusters"].format(
    ngram=ORACLES["dedup_ngram_jaccard"]
)


@_q(
    "dedup_incremental_exact",
    """
    WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
    hist AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 5 <> 0),
    batch AS (SELECT doc_id, fp FROM fp WHERE doc_id % 5 = 0)
    SELECT b.doc_id,
           CASE WHEN h.fp IS NOT NULL THEN 1 ELSE 0 END AS dup_vs_history,
           CASE WHEN ROW_NUMBER() OVER (PARTITION BY b.fp ORDER BY b.doc_id) > 1
                THEN 1 ELSE 0 END AS dup_in_batch
    FROM batch b LEFT JOIN hist h USING (fp)
    """,
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup — the production shape: a new batch (here
    doc_id % 5 = 0) is checked against the historical fingerprint index
    (distinct md5 of everything else) AND against itself (first-by-doc_id
    wins within the batch, via one window pass). Shuffles carry 16-byte
    fingerprints, never text; the history side is a semi-join-shaped
    left join that scales as the index, and at 100 TB the index would be
    a bucketed table so this join is shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", F.md5("text").alias("fp"))
    hist = (
        fp.filter(F.col("doc_id") % 5 != 0)
        .select("fp")
        .distinct()
        .withColumn("in_hist", F.lit(1))
    )
    batch = fp.filter(F.col("doc_id") % 5 == 0)
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        batch.join(hist, "fp", "left")
        .select(
            "doc_id",
            F.when(F.col("in_hist").isNotNull(), 1).otherwise(0).alias(
                "dup_vs_history"
            ),
            F.when(F.row_number().over(w) > 1, 1).otherwise(0).alias(
                "dup_in_batch"
            ),
        )
    )


@_q(
    "dedup_eval_decontamination",
    r"""
    WITH toked AS (
      SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS toks
      FROM documents WHERE TRIM(text) <> ''
    ), sh AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS sh
      FROM (
        SELECT doc_id, toks, UNNEST(generate_series(1, len(toks) - 7)) AS i
        FROM toked WHERE len(toks) >= 8
      )
    ), train AS (
      SELECT DISTINCT sh FROM sh WHERE doc_id % 10 <> 0
    ), eval_sh AS (
      SELECT DISTINCT doc_id, sh FROM sh WHERE doc_id % 10 = 0
    )
    SELECT e.doc_id, COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN t.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(SUM(CASE WHEN t.sh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS contamination_rate
    FROM eval_sh e LEFT JOIN train t USING (sh)
    GROUP BY e.doc_id
    """,
)
def dedup_eval_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: for each held-out document (doc_id % 10
    = 0), the fraction of its distinct 8-gram shingles that also occur
    anywhere in the training split — the standard benchmark-leakage gate
    run before training. Shingles travel as md5 fingerprints (the shuffle
    never carries text); the train side is a distinct fingerprint index
    (at 100 TB: pre-built, bucketed, and DF-capped like the ngram
    near-dup posting lists); the containment join is fingerprint-
    partitioned and the rate is exact-count division."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    toked = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= 8
    )
    sh = toked.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks") - 7)).alias("i"),
        "toks",
    ).select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), 8))).alias(
            "sh"
        ),
    )
    train = sh.filter(F.col("doc_id") % 10 != 0).select("sh").distinct()
    eval_sh = (
        sh.filter(F.col("doc_id") % 10 == 0).select("doc_id", "sh").distinct()
    )
    hit = F.sum(F.when(F.col("in_train").isNotNull(), 1).otherwise(0))
    return (
        eval_sh.join(train.withColumn("in_train", F.lit(1)), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            hit.alias("n_contaminated"),
            (hit.cast("double") / F.count("*")).alias("contamination_rate"),
        )
    )


@_q(
    "dedup_ngram_containment",
    rf"""
    WITH sh0 AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
               range(1, GREATEST(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
            FROM documents WHERE TRIM(text) <> '') t
      WHERE len(toks) >= 3
    ), df AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ), sh AS (
      SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN df USING (shingle)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_shared AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) AS containment
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_shared AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= 0.6
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: trigram CONTAINMENT >= 0.6 — the quote /
    subset-document detector. Jaccard misses a short document wholly
    embedded in a long one (the union term dilutes the score); containment
    |A intersect B| / min(|A|, |B|) is the standard curation metric for
    "one of these is inside the other" (quotes, boilerplate wrappers,
    excerpt pages). Same posting-list candidate generation and DF cap as
    dedup_ngram_jaccard — cost stays sum(freq^2) over capped shingles,
    never |docs|^2 — with one final exact integer ratio. The two metrics
    share everything up to the last expression, so at 100 TB both run off
    one shingle shuffle when composed."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    sh = shingle_rows(docs)
    # materialized for the same 3-branch reuse as dedup_ngram_jaccard
    buckets = materialize_reduced(
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") <= MAX_SHINGLE_DF)
    )
    sizes = buckets.select(F.explode("docs").alias("doc_id")).groupBy(
        "doc_id"
    ).agg(F.count("*").alias("n_sh"))
    pairs = (
        _posting_list_pairs(buckets.filter(F.size("docs") >= 2))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    cont = F.col("n_shared").cast("double") / F.least(
        F.col("sa.n_sh"), F.col("sb.n_sh")
    )
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", cont.alias("containment"))
        .filter(F.col("containment") >= 0.6)
    )


@_q(
    "dedup_survivor_weights",
    r"""
    WITH RECURSIVE pairs AS (
      {ngram}
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ), reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), labels AS (
      SELECT a AS doc_id, LEAST(MIN(b), a) AS cluster_id
      FROM reach GROUP BY a
    ), survivors AS (
      SELECT cluster_id AS doc_id, COUNT(*) AS weight
      FROM labels GROUP BY cluster_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.weight, 1) AS BIGINT) AS weight,
           CASE WHEN l.doc_id IS NULL THEN 0 ELSE 1 END AS was_clustered
    FROM documents d
    LEFT JOIN labels l ON d.doc_id = l.doc_id
    LEFT JOIN survivors s ON d.doc_id = s.doc_id
    WHERE TRIM(d.text) <> ''
      AND (l.doc_id IS NULL OR l.doc_id = l.cluster_id)
    """,
)
def dedup_survivor_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware sampling weights: the KEPT corpus after near-dup
    clustering, each survivor carrying its cluster size as a weight —
    the standard correction when a training mix should remember that a
    kept document stood for N near-copies (weight-aware samplers upweight
    it; naive dedup silently down-weights popular content). Survivors =
    min(doc_id) per trigram-Jaccard cluster; unclustered docs keep
    weight 1. One anti-join-shaped left join against the |clustered|
    label table — the corpus never reshuffles."""
    from ..graph import connected_components

    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    pairs = dedup_ngram_jaccard(spark, sf_dir)
    comp = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    weights = comp.groupBy("cluster_id").agg(F.count("*").alias("weight"))
    keep = comp.filter(F.col("doc_id") == F.col("cluster_id")).join(
        weights, "cluster_id"
    )
    return (
        docs.select("doc_id")
        .join(comp.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit(1).cast("bigint").alias("weight"),
            F.lit(0).alias("was_clustered"),
        )
        .unionByName(
            keep.select(
                "doc_id",
                F.col("weight").cast("bigint"),
                F.lit(1).alias("was_clustered"),
            )
        )
    )


ORACLES["dedup_survivor_weights"] = ORACLES["dedup_survivor_weights"].format(
    ngram=ORACLES["dedup_ngram_jaccard"]
)


ORACLES["dedup_minhash_calibration"] = f"""
    WITH est AS ({ORACLES["dedup_minhash_portable"]}),
         exact AS ({ORACLES["dedup_ngram_jaccard"]})
    SELECT CAST(round(est.est_jaccard * 16) AS BIGINT) AS est_16,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN exact.jaccard IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact_matched,
           CAST(SUM(CAST(round((COALESCE(exact.jaccard, 0.0)) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*)
             AS avg_exact_jaccard
    FROM est LEFT JOIN exact
      ON est.doc_a = exact.doc_a AND est.doc_b = exact.doc_b
    GROUP BY est_16
"""


def _overlapped_est_exact(spark, sf_dir):
    """Build the two graded calibration inputs (MinHash estimate, exact
    n-gram Jaccard) from a 2-thread pool so their EAGER materializations
    (signature table, posting-list buckets) overlap instead of running
    strictly sequentially at construction time (guide §2.6, the r15
    sweep pattern). Each branch's frame is byte-identical to the
    sequential form; only wall changes. Shared by
    dedup_minhash_calibration and dedup_minhash_calibration_curve."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_est = pool.submit(dedup_minhash_portable, spark, sf_dir)
        f_exact = pool.submit(dedup_ngram_jaccard, spark, sf_dir)
        est = f_est.result()
        exact = f_exact.result().withColumnsRenamed(
            {"doc_a": "e_doc_a", "doc_b": "e_doc_b"}
        )
    return est, exact


@_q("dedup_minhash_calibration")
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator calibration audit: MinHash's estimated Jaccard (portable
    twin, est >= 0.5) bucketed by signature-match count (est_16 = matches
    out of 16) and joined against the EXACT n-gram Jaccard for the same
    pairs — the measure-don't-guess report that tells you whether the
    16-perm estimator is biased before you trust its threshold at 100 TB.
    Pairs whose exact Jaccard fell below the exact join's 0.2 floor (or
    its stopword-DF cap) count as 0 in the average — false-positive
    penalty included, not hidden. The average is a tie-safe 1e-6
    fixed-point sum (round() agrees across engines even on dyadic ties
    like odd/32, where a double->DECIMAL cast would not). Both inputs are themselves graded
    queries; this composes their plans and adds one |pairs|-row join +
    a <= 9-row aggregate."""
    est, exact = _overlapped_est_exact(spark, sf_dir)
    j = est.join(
        exact,
        (est.doc_a == exact.e_doc_a) & (est.doc_b == exact.e_doc_b),
        "left",
    )
    return (
        j.groupBy(
            F.round(F.col("est_jaccard") * 16).cast("bigint").alias("est_16")
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.when(F.col("jaccard").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact_matched"),
            (
                fp_sum(F.coalesce(F.col("jaccard"), F.lit(0.0)), 1e6)
                .cast("double")
                / F.lit(1000000.0)
                / F.count("*")
            ).alias("avg_exact_jaccard"),
        )
    )


PREFIX_FP_TOKENS = 16  # lead-window length for the truncation-dup fingerprint


@_q(
    "dedup_prefix_truncation",
    rf"""
    WITH toked AS (
      SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
      FROM documents WHERE TRIM(text) <> ''
    ), p AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(toks, 1, {PREFIX_FP_TOKENS}), ' '))
               AS prefix_fp,
             len(toks) AS n_tokens
      FROM toked WHERE len(toks) >= {PREFIX_FP_TOKENS}
    )
    SELECT prefix_fp,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS survivor_doc_id,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM p
    GROUP BY prefix_fp
    HAVING COUNT(*) >= 2
    """,
)
def dedup_prefix_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation/extension duplicate groups: documents sharing their
    first PREFIX_FP_TOKENS-token window — the scrape-pipeline failure mode exact
    whole-text dedup misses (the same article captured at different cut
    points hashes differently end-to-end but identically on its lead
    window). One md5 per doc, one hash aggregate on the 16-byte
    fingerprint key; min_tokens vs max_tokens spread shows whether a
    group is true truncation (spread) or re-crawl (equal). Survivor =
    min doc_id, matching the exact-dedup survivor contract. Docs shorter
    than the window are out of scope (their whole text IS the prefix —
    exact dedup already covers them)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    toked = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks")
    ).filter(F.size("toks") >= PREFIX_FP_TOKENS)
    p = toked.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice(F.col("toks"), 1, PREFIX_FP_TOKENS))
        ).alias("prefix_fp"),
        F.size("toks").cast("bigint").alias("n_tokens"),
    )
    return (
        p.groupBy("prefix_fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("survivor_doc_id"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@_q(
    "dedup_source_contamination_matrix",
    r"""
    WITH toked AS (
      SELECT doc_id, source, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
      FROM documents WHERE TRIM(text) <> ''
    ), sh AS (
      SELECT DISTINCT source,
             md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS fp
      FROM (
        SELECT doc_id, source, toks,
               UNNEST(generate_series(1, len(toks) - 7)) AS i
        FROM toked WHERE len(toks) >= 8
      )
    ), totals AS (
      SELECT source, COUNT(*) AS n_fps FROM sh GROUP BY source
    ), pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.fp = b.fp AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT p.source_a, p.source_b, p.n_shared,
           ta.n_fps AS n_fps_a, tb.n_fps AS n_fps_b,
           CAST(p.n_shared AS DOUBLE) / LEAST(ta.n_fps, tb.n_fps)
             AS containment
    FROM pairs p
    JOIN totals ta ON ta.source = p.source_a
    JOIN totals tb ON tb.source = p.source_b
    """,
)
def dedup_source_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how many
    distinct 8-gram fingerprints they share, normalized by the smaller
    side's vocabulary (asymmetric containment) — the provenance audit
    that catches one feed re-publishing another's content BEFORE both
    copies enter the training mix (per-doc dedup sees the symptoms; this
    sees the relationship). The fingerprint self-join runs inside
    per-fingerprint posting lists whose size is bounded by |sources|
    (<= hundreds at any corpus scale, nothing like the per-doc case), so
    candidates are |shared fps| x O(|sources|^2) worst case and the
    output is <= C(|sources|, 2) rows; totals broadcast back for the
    ratio."""
    from .helpers import materialize_reduced

    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    toked = docs.select(
        "source",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
    ).filter(F.size("toks") >= 8)
    sh = materialize_reduced(
        toked.select(
            "source",
            F.explode(F.sequence(F.lit(1), F.size("toks") - 7)).alias("i"),
            "toks",
        )
        .select(
            "source",
            F.md5(F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), 8))).alias(
                "fp"
            ),
        )
        .distinct()
    )
    totals = sh.groupBy("source").agg(F.count("*").alias("n_fps"))
    a = sh.select(F.col("source").alias("source_a"), "fp")
    b = sh.select(F.col("source").alias("source_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    ta = totals.select(
        F.col("source").alias("source_a"), F.col("n_fps").alias("n_fps_a")
    )
    tb = totals.select(
        F.col("source").alias("source_b"), F.col("n_fps").alias("n_fps_b")
    )
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_fps_a",
            "n_fps_b",
            (
                F.col("n_shared").cast("double")
                / F.least(F.col("n_fps_a"), F.col("n_fps_b"))
            ).alias("containment"),
        )
    )


CDC_WINDOW = 8   # rolling window (chars)
CDC_MODULUS = 64  # boundary when window-hash % 64 == 0 -> ~64-char chunks


@_q(
    "dedup_cdc_chunk_potential",
    f"""
    WITH d AS (
      SELECT doc_id, text, LENGTH(text) AS n_chars
      FROM documents WHERE TRIM(text) <> ''
    ), pos AS (
      SELECT doc_id, n_chars, UNNEST(generate_series(1, n_chars - {CDC_WINDOW - 1})) AS i, text
      FROM d WHERE n_chars >= {CDC_WINDOW}
    ), b AS (
      SELECT doc_id, n_chars, i + {CDC_WINDOW - 1} AS cut
      FROM pos
      WHERE ('0x' || substr(md5(substring(text, i, {CDC_WINDOW})), 1, 15))::BIGINT
              % {CDC_MODULUS} = 0
        AND i + {CDC_WINDOW - 1} < n_chars
    ), starts AS (
      SELECT doc_id, n_chars, 1 AS start FROM d WHERE n_chars >= 1
      UNION ALL
      SELECT doc_id, n_chars, cut + 1 FROM b
    ), chunks AS (
      SELECT doc_id, start,
             COALESCE(LEAD(start) OVER (PARTITION BY doc_id ORDER BY start),
                      n_chars + 1) - start AS clen
      FROM starts
    )
    SELECT COUNT(*) AS total_chunks,
           COUNT(DISTINCT digest) AS distinct_digests,
           CASE WHEN COUNT(*) > 0
                THEN CAST(COUNT(*) - COUNT(DISTINCT digest) AS DOUBLE)
                     / COUNT(*) END AS dup_chunk_ratio
    FROM (
      SELECT md5(substring(d.text, c.start, c.clen)) AS digest
      FROM chunks c JOIN d USING (doc_id)
    )
    """,
)
def dedup_cdc_chunk_potential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup potential: cut every document into
    variable-size chunks at content-determined boundaries (window-hash
    % 64 == 0 over an 8-char rolling window — the restic/borg/LBFS
    technique), digest each chunk, and report how much chunk mass is
    duplicated corpus-wide. Unlike whole-doc or shingle dedup this
    detects SHARED SPANS at arbitrary offsets — insertions shift chunk
    positions but not chunk contents, which is exactly why storage
    systems dedup this way — so the ratio reads directly as 'a
    chunk-level store would save this fraction'. This graded form is
    the portable twin (per-position md5, the MinHash-twin pattern):
    boundaries and digests are plain string md5 so both engines compute
    them bit-identically; a production 100 TB pass would compute the
    same boundaries with a gear-hash table inside one mapInPandas over
    the byte stream (one scan, no position explode) and only digest at
    cut points. The position explode here shuffles nothing — boundary
    detection is row-local; the only aggregate is the final
    count/count-distinct over |chunks| digests."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    d = docs.select("doc_id", "text", F.length("text").alias("n_chars"))
    pos = d.filter(F.col("n_chars") >= CDC_WINDOW).select(
        "doc_id",
        "n_chars",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.col("n_chars") - (CDC_WINDOW - 1))
        ).alias("i"),
    )
    whash = F.conv(
        F.substring(F.md5(F.substring(F.col("text"), F.col("i"), CDC_WINDOW)), 1, 15),
        16,
        10,
    ).cast("bigint")
    b = pos.filter(
        (whash % CDC_MODULUS == 0)
        & (F.col("i") + (CDC_WINDOW - 1) < F.col("n_chars"))
    ).select("doc_id", "n_chars", (F.col("i") + (CDC_WINDOW - 1)).alias("cut"))
    starts = d.select(
        "doc_id", "n_chars", F.lit(1).alias("start")
    ).unionByName(
        b.select("doc_id", "n_chars", (F.col("cut") + 1).alias("start"))
    )
    w = Window.partitionBy("doc_id").orderBy("start")
    chunks = starts.select(
        "doc_id",
        "start",
        (
            F.coalesce(F.lead("start").over(w), F.col("n_chars") + 1)
            - F.col("start")
        ).alias("clen"),
    )
    digests = chunks.join(d, "doc_id").select(
        F.md5(F.expr("substring(text, start, clen)")).alias("digest")
    )
    return digests.agg(
        F.count("*").alias("total_chunks"),
        F.countDistinct("digest").alias("distinct_digests"),
        F.when(
            F.count("*") > 0,
            (F.count("*") - F.countDistinct("digest")).cast("double")
            / F.count("*"),
        ).alias("dup_chunk_ratio"),
    )


@_q("dedup_cdc_gearhash")  # engine-internal rolling hash; rows-only check
def dedup_cdc_gearhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-path content-defined chunking: the gear-hash rolling
    boundary detector (h = (h<<1) + gear[byte]; cut when h % 64 == 0,
    16-byte minimum / 256-byte maximum chunk guards) running inside ONE
    mapInPandas over the byte stream — no per-position explode, no
    per-position md5; this is the restic/FastCDC shape you run at
    100 TB, and `dedup_cdc_chunk_potential` is its graded portable twin
    (different hash -> different boundaries, same report semantics;
    the planted-duplication pytest pins that both detect the same
    duplicated mass). Gear table derived deterministically from md5 of
    the byte value, so the result is stable across runs and engines'
    Python workers. Same output schema as the twin:
    (total_chunks, distinct_digests, dup_chunk_ratio)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")

    def chunk_digests(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        # Vectorized boundary detection (guide §4.2: batch work goes to
        # native code, not a per-byte Python loop). The rolling hash
        # h = ((h << 1) + gear[byte]) mod 2^64 is tested only as
        # h % 64 == 0, i.e. on its LOW SIX BITS — and a byte's gear
        # contribution leaves those bits after 6 shifts, so
        # h_i mod 64 == (sum_{k=0..5} gear[b_{i-k}] << k) mod 64: six
        # shifted numpy adds replace the per-byte loop. The min-16 /
        # max-256 chunk-length walk then touches only the ~1/64 candidate
        # positions. Bit-identical to the scalar form (equivalence pinned
        # on 400 randomized payloads incl. every guard boundary).
        gear6 = np.array(
            [
                int.from_bytes(hashlib.md5(bytes([b])).digest()[:8], "big")
                & 63
                for b in range(256)
            ],
            dtype=np.uint32,
        )

        def cuts(data: bytes):
            # returns chunk digests for one payload
            n = len(data)
            if n == 0:
                return []
            g = gear6[np.frombuffer(data, dtype=np.uint8)]
            h = g.copy()
            for k in range(1, min(6, n)):
                h[k:] += g[:-k] << np.uint32(k)
            cand = np.nonzero((h & np.uint32(63)) == 0)[0]
            out = []
            start = 0
            while start < n:
                # next cut = min(first candidate at length >= 16,
                #                forced cut at length 256)
                ci = int(np.searchsorted(cand, start + 15))
                if ci < len(cand) and cand[ci] <= start + 255:
                    i = int(cand[ci])
                elif start + 255 <= n - 1:
                    i = start + 255
                else:
                    out.append(hashlib.md5(data[start:]).hexdigest())
                    break
                out.append(hashlib.md5(data[start : i + 1]).hexdigest())
                start = i + 1
            return out

        for pdf in batches:
            digests = []
            for text in pdf["text"]:
                digests.extend(cuts(text.encode("utf-8")))
            yield pd.DataFrame({"digest": pd.Series(digests, dtype="string")})

    digests = docs.select("text").mapInPandas(chunk_digests, "digest string")
    return digests.agg(
        F.count("*").alias("total_chunks"),
        F.countDistinct("digest").alias("distinct_digests"),
        F.when(
            F.count("*") > 0,
            (F.count("*") - F.countDistinct("digest")).cast("double")
            / F.count("*"),
        ).alias("dup_chunk_ratio"),
    )


BLOOM_M = 4096  # bits
BLOOM_K = 3  # hash functions


@_q(
    "dedup_bloom_prefilter_calibration",
    f"""
    WITH a AS (
      SELECT md5(text) AS fp FROM documents
      WHERE TRIM(text) <> '' AND doc_id % 2 = 0
    ), b AS (
      SELECT doc_id, md5(text) AS fp FROM documents
      WHERE TRIM(text) <> '' AND doc_id % 2 = 1
    ), ks AS (SELECT UNNEST(generate_series(1, {BLOOM_K})) AS i),
    bits AS (
      SELECT DISTINCT
             ('0x' || SUBSTR(md5(a.fp || ':' || CAST(ks.i AS VARCHAR)),
                             1, 8))::BIGINT % {BLOOM_M} AS bit
      FROM a CROSS JOIN ks
    ), probes AS (
      SELECT b.doc_id, b.fp,
             ('0x' || SUBSTR(md5(b.fp || ':' || CAST(ks.i AS VARCHAR)),
                             1, 8))::BIGINT % {BLOOM_M} AS bit
      FROM b CROSS JOIN ks
    ), verdicts AS (
      SELECT p.doc_id, p.fp,
             CAST(COUNT(bits.bit) AS BIGINT) = {BLOOM_K} AS maybe
      FROM probes p LEFT JOIN bits ON bits.bit = p.bit
      GROUP BY p.doc_id, p.fp
    ), truth AS (
      SELECT v.doc_id, v.maybe,
             EXISTS (SELECT 1 FROM a WHERE a.fp = v.fp) AS actual
      FROM verdicts v
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
           CAST(SUM(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT) AS n_actual,
           CAST(SUM(CASE WHEN maybe AND NOT actual THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positive,
           CAST(SUM(CASE WHEN NOT maybe AND actual THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_negative,
           CASE WHEN SUM(CASE WHEN NOT actual THEN 1 ELSE 0 END) > 0
                THEN CAST(SUM(CASE WHEN maybe AND NOT actual THEN 1 ELSE 0 END)
                          AS DOUBLE)
                     / SUM(CASE WHEN NOT actual THEN 1 ELSE 0 END) END
             AS false_positive_rate
    FROM truth
    """,
)
def dedup_bloom_prefilter_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-join calibration: build a deterministic
    4096-bit / 3-hash Bloom filter over one corpus half's content
    fingerprints, probe the other half, and report the MEASURED
    false-positive rate against exact membership — the evidence you
    collect before trusting a bloom pre-filter to prune a 100 TB
    dedup/anti join (Spark's own runtime bloom pushdown is graded in
    plans.py; this one is portable and auditable because every bit
    position is md5 arithmetic, not engine-internal hashing). The
    verdict must show n_false_negative = 0 ALWAYS (blooms never drop
    real members — that invariant is the whole point and is asserted
    in pytest) and an FPR consistent with (1 - e^(-kn/m))^k. Scale
    shape: the bit set is |m| = 4096 rows (broadcastable); build and
    probe are row-local hash expressions + one join on bit id; the
    whole audit never shuffles a corpus row."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    a = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.md5("text").alias("fp")
    )
    b = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.md5("text").alias("fp")
    )
    ks = spark.range(1, BLOOM_K + 1).select(F.col("id").alias("i"))

    def bit(fp_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", fp_col, F.col("i").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % BLOOM_M
        )

    bits = (
        a.crossJoin(F.broadcast(ks)).select(bit(F.col("fp")).alias("bit")).distinct()
    )
    probes = b.crossJoin(F.broadcast(ks)).select(
        "doc_id", "fp", bit(F.col("fp")).alias("bit")
    )
    verdicts = (
        probes.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "bit", "left")
        .groupBy("doc_id", "fp")
        .agg((F.count("hit") == BLOOM_K).alias("maybe"))
    )
    truth = verdicts.join(
        a.distinct().withColumn("actual_hit", F.lit(1)),
        verdicts.fp == a.fp,
        "left",
    ).select(
        "doc_id", "maybe", F.col("actual_hit").isNotNull().alias("actual")
    )
    n_not_actual = F.sum(F.when(~F.col("actual"), 1).otherwise(0))
    n_fp = F.sum(
        F.when(F.col("maybe") & ~F.col("actual"), 1).otherwise(0)
    )
    return truth.agg(
        F.count("*").alias("n_probes"),
        F.sum(F.when(F.col("maybe"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_maybe"),
        F.sum(F.when(F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_actual"),
        n_fp.cast("bigint").alias("n_false_positive"),
        F.sum(F.when(~F.col("maybe") & F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_negative"),
        F.when(
            n_not_actual > 0, n_fp.cast("double") / n_not_actual
        ).alias("false_positive_rate"),
    )


@_q(
    "dedup_survivor_policy_compare",
    rf"""
    WITH toked AS (
      SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
      FROM documents WHERE TRIM(text) <> ''
    ), p AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(toks, 1, {PREFIX_FP_TOKENS}), ' '))
               AS prefix_fp,
             CAST(len(toks) AS BIGINT) AS n_tokens
      FROM toked WHERE len(toks) >= {PREFIX_FP_TOKENS}
    ), dup_groups AS (
      SELECT prefix_fp FROM p GROUP BY prefix_fp HAVING COUNT(*) >= 2
    ), members AS (
      SELECT p.* FROM p JOIN dup_groups USING (prefix_fp)
    ), pick AS (
      SELECT prefix_fp,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS group_tokens,
             CAST(MAX(CASE WHEN rn_earliest = 1 THEN n_tokens END) AS BIGINT)
               AS kept_earliest,
             CAST(MAX(CASE WHEN rn_longest = 1 THEN n_tokens END) AS BIGINT)
               AS kept_longest
      FROM (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY prefix_fp ORDER BY doc_id)
                 AS rn_earliest,
               ROW_NUMBER() OVER (PARTITION BY prefix_fp
                                  ORDER BY n_tokens DESC, doc_id)
                 AS rn_longest
        FROM members
      ) GROUP BY prefix_fp
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dup_groups,
           CAST(SUM(n_docs) AS BIGINT) AS n_dup_docs,
           CAST(SUM(group_tokens) AS BIGINT) AS tokens_in_groups,
           CAST(SUM(kept_earliest) AS BIGINT) AS tokens_kept_earliest,
           CAST(SUM(kept_longest) AS BIGINT) AS tokens_kept_longest,
           CAST(SUM(kept_longest - kept_earliest) AS DOUBLE)
             / SUM(group_tokens) AS longest_policy_gain_share
    FROM pick
    """,
)
def dedup_survivor_policy_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor-policy comparison over truncation-duplicate groups: when
    near-dup groups contain DIFFERENT-length variants (shared 16-token
    prefix, divergent tails — the cut-point duplicate class), 'keep
    earliest' and 'keep longest' retain different token mass; this
    audit quantifies the gap BEFORE a curation run commits to a policy
    (keep-longest preserves strictly more trainable text; keep-earliest
    is stabler under incremental ingest — the number says what the
    trade costs on THIS corpus). Two ROW_NUMBER policies over the same
    grouped shuffle, then a single-row rollup; exact BIGINT token
    masses, one double share."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    p = docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                " ", F.slice(toks, 1, PREFIX_FP_TOKENS)
            )
        ).alias("prefix_fp"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    ).filter(F.size(toks) >= PREFIX_FP_TOKENS)
    dup_groups = (
        p.groupBy("prefix_fp")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("prefix_fp")
    )
    members = p.join(dup_groups, "prefix_fp")
    w_e = Window.partitionBy("prefix_fp").orderBy("doc_id")
    w_l = Window.partitionBy("prefix_fp").orderBy(
        F.col("n_tokens").desc(), "doc_id"
    )
    ranked = members.select(
        "prefix_fp",
        "n_tokens",
        F.row_number().over(w_e).alias("rn_earliest"),
        F.row_number().over(w_l).alias("rn_longest"),
    )
    pick = ranked.groupBy("prefix_fp").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("group_tokens"),
        F.max(F.when(F.col("rn_earliest") == 1, F.col("n_tokens")))
        .cast("bigint")
        .alias("kept_earliest"),
        F.max(F.when(F.col("rn_longest") == 1, F.col("n_tokens")))
        .cast("bigint")
        .alias("kept_longest"),
    )
    return pick.agg(
        F.count("*").cast("bigint").alias("n_dup_groups"),
        F.sum("n_docs").cast("bigint").alias("n_dup_docs"),
        F.sum("group_tokens").cast("bigint").alias("tokens_in_groups"),
        F.sum("kept_earliest").cast("bigint").alias("tokens_kept_earliest"),
        F.sum("kept_longest").cast("bigint").alias("tokens_kept_longest"),
        (
            F.sum(F.col("kept_longest") - F.col("kept_earliest")).cast("double")
            / F.sum("group_tokens")
        ).alias("longest_policy_gain_share"),
    )


@_q("dedup_cluster_size_histogram", None)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size distribution of the near-dup graph in power-of-2
    buckets: how much of the corpus sits in pairs vs giant blobs —
    THE sanity check on a dedup threshold, because a too-loose
    similarity cutoff announces itself as one huge cluster long before
    anyone inspects pairs (the classic MinHash-LSH failure mode), and
    the fix (tighter threshold / more bands) is chosen off this
    histogram. Composes the graded connected-components entry: cluster
    sizes reduce to one row per cluster, then the same pure-integer
    1 << bit_length(n-1) bucketing as the length/gap histograms. The
    oracle wraps the component query's recursive SQL verbatim."""
    clusters = QUERIES["dedup_clusters"](spark, sf_dir)
    per_cluster = clusters.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    bucket = F.when(
        F.col("n_docs") <= 1, F.lit(1).cast("bigint")
    ).otherwise(
        F.expr(
            "shiftleft(CAST(1 AS BIGINT),"
            " length(bin(CAST(n_docs - 1 AS BIGINT))))"
        )
    )
    return (
        per_cluster.select(bucket.alias("size_bucket"), "n_docs")
        .groupBy("size_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_clusters"),
            F.sum("n_docs").cast("bigint").alias("n_docs_total"),
        )
    )


ORACLES["dedup_cluster_size_histogram"] = f"""
    WITH clusters AS ({ORACLES["dedup_clusters"]}),
    per_cluster AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM clusters GROUP BY cluster_id
    )
    SELECT CASE WHEN n_docs <= 1 THEN CAST(1 AS BIGINT)
                ELSE (CAST(1 AS BIGINT)
                      << LENGTH(bin(CAST(n_docs - 1 AS BIGINT)))) END
             AS size_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs_total
    FROM per_cluster GROUP BY size_bucket
    """


# (bands, rows) sweep configs over the 16-value portable signature, with
# the S-curve threshold (1/b)^(1/r) as shared literals (fractional pow is
# libm-dependent — never computed at query time)
_SWEEP_CONFIGS = [
    (8, 2, 3.5355339059327373e-1),
    (4, 4, 7.0710678118654757e-1),
    (2, 8, 9.1700404320467122e-1),
]


def _band_sweep_oracle() -> str:
    shingles = ORACLES["dedup_minhash_portable"].split("), hh AS")[0]
    per_cfg = []
    for b, r, thr in _SWEEP_CONFIGS:
        per_cfg.append(f"""
      SELECT {b} AS n_bands, {r} AS rows_per_band,
             {thr:.17e} AS s_curve_threshold,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM (
                SELECT band, bh FROM (
                  SELECT doc_id, p // {r} AS band,
                         md5(string_agg(CAST(mh AS VARCHAR), ':'
                                        ORDER BY p)) AS bh
                  FROM sig GROUP BY doc_id, p // {r}
                ) GROUP BY band, bh HAVING COUNT(*) BETWEEN 2 AND 200
              )) AS n_candidate_buckets,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM (
                SELECT DISTINCT x.doc_id AS a, y.doc_id AS b2 FROM (
                  SELECT doc_id, p // {r} AS band,
                         md5(string_agg(CAST(mh AS VARCHAR), ':'
                                        ORDER BY p)) AS bh
                  FROM sig GROUP BY doc_id, p // {r}
                ) x JOIN (
                  SELECT doc_id, p // {r} AS band,
                         md5(string_agg(CAST(mh AS VARCHAR), ':'
                                        ORDER BY p)) AS bh
                  FROM sig GROUP BY doc_id, p // {r}
                ) y ON x.band = y.band AND x.bh = y.bh
                   AND x.doc_id < y.doc_id
              )) AS n_candidate_pairs""")
    union = "\n      UNION ALL\n".join(per_cfg)
    return f"""
    {shingles}
    ), hh AS (
      SELECT doc_id, j, md5(shingle || ':' || j) AS m
      FROM sh CROSS JOIN range(8) r(j)
    ), ph AS (
      SELECT doc_id, 2*j AS p, ('0x' || substr(m, 1, 15))::BIGINT AS h FROM hh
      UNION ALL
      SELECT doc_id, 2*j + 1 AS p,
             ('0x' || substr(m, 16, 15))::BIGINT AS h FROM hh
    ), sig AS (
      SELECT doc_id, p, MIN(h) AS mh FROM ph GROUP BY doc_id, p
    )
    {union}
    """


@_q("dedup_lsh_band_sweep", _band_sweep_oracle())
def dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding parameter sweep: for the SAME 16-value MinHash
    signature, report what each (bands x rows) split costs — candidate
    bucket and pair counts at 8x2, 4x4, and 2x8 — next to the S-curve
    threshold (1/b)^(1/r) each config targets. This is the tuning
    table you read BEFORE re-running a corpus-scale dedup with new
    parameters: more bands = lower threshold = more candidates
    (recall), fewer bands = precision; the pair counts make the cost
    side concrete on YOUR corpus instead of the textbook curve.
    Signature built once (the graded portable machinery), each config
    re-bands it with p div r — no re-hashing of shingles; candidate
    buckets capped at 200 members like the production entry."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    wide = _portable_minhash_sigs(docs)  # (doc_id, m0..m15)
    stack_expr = "stack(16, " + ", ".join(
        f"{p}, m{p}" for p in range(16)
    ) + ") AS (p, mh)"
    sig = wide.selectExpr("doc_id", stack_expr)

    # Same shape as dedup_band_sensitivity_curve: per config the band
    # table feeds three branches (bucket counts, both pair-join sides),
    # so it is materialized once instead of recomputed per branch, and
    # the three independent configs run from a thread pool so their
    # materializations overlap (guide §2.6).
    def _sweep_row(cfg):
        b, r, thr = cfg
        banded = materialize_reduced(
            sig.groupBy("doc_id", F.expr(f"p div {r}").alias("band"))
            .agg(
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("p", "mh"))
                            ),
                            lambda s: s["mh"].cast("string"),
                        ),
                        ":",
                    )
                ).alias("bh")
            )
        )
        buckets = (
            banded.groupBy("band", "bh")
            .agg(F.count("*").alias("c"))
            .filter((F.col("c") >= 2) & (F.col("c") <= 200))
        )
        x = banded.select("band", "bh", F.col("doc_id").alias("a"))
        y = banded.select("band", "bh", F.col("doc_id").alias("b2"))
        pairs = (
            x.join(y, ["band", "bh"])
            .filter(F.col("a") < F.col("b2"))
            .select("a", "b2")
            .distinct()
        )
        row = (
            buckets.agg(F.count("*").cast("bigint").alias("n_candidate_buckets"))
            .crossJoin(
                pairs.agg(
                    F.count("*").cast("bigint").alias("n_candidate_pairs")
                )
            )
            .select(
                F.lit(b).alias("n_bands"),
                F.lit(r).alias("rows_per_band"),
                F.lit(thr).alias("s_curve_threshold"),
                "n_candidate_buckets",
                "n_candidate_pairs",
            )
        )
        return row

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(_SWEEP_CONFIGS)) as pool:
        rows = list(pool.map(_sweep_row, _SWEEP_CONFIGS))
    out = rows[0]
    for row in rows[1:]:
        out = out.unionByName(row)
    return out


@_q(
    "dedup_normalization_gain",
    r"""
    WITH d AS (
      SELECT text FROM documents WHERE TRIM(text) <> ''
    ), fps AS (
      SELECT md5(text) AS raw_fp,
             md5(regexp_replace(TRIM(LOWER(text)), '\s+', ' ', 'g'))
               AS norm_fp
      FROM d
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT raw_fp) AS BIGINT) AS n_unique_raw,
           CAST(COUNT(DISTINCT norm_fp) AS BIGINT) AS n_unique_normalized,
           CAST(COUNT(DISTINCT raw_fp) - COUNT(DISTINCT norm_fp) AS BIGINT)
             AS n_dups_recovered,
           CASE WHEN COUNT(*) > 0
                THEN CAST(COUNT(*) - COUNT(DISTINCT raw_fp) AS DOUBLE)
                     / COUNT(*) END AS dup_ratio_raw,
           CASE WHEN COUNT(*) > 0
                THEN CAST(COUNT(*) - COUNT(DISTINCT norm_fp) AS DOUBLE)
                     / COUNT(*) END AS dup_ratio_normalized
    FROM fps
    """,
)
def dedup_normalization_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-vs-dedup interaction: how many MORE duplicates
    exact dedup finds once text is canonicalized (lowercase +
    whitespace collapse + trim) — the number that justifies running
    normalization BEFORE fingerprinting in a curation DAG, since every
    casing/spacing variant that slips past raw md5 is a duplicate the
    training run still pays for (and text_normalization_impact sizes
    the same transform's blast radius; this measures its dedup
    payoff). Two fingerprints per doc in one row-local pass, two
    distinct-counts — no joins, no shuffle beyond the aggregate."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    fps = docs.select(
        F.md5("text").alias("raw_fp"),
        F.md5(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        ).alias("norm_fp"),
    )
    return fps.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("raw_fp").cast("bigint").alias("n_unique_raw"),
        F.countDistinct("norm_fp")
        .cast("bigint")
        .alias("n_unique_normalized"),
        (F.countDistinct("raw_fp") - F.countDistinct("norm_fp"))
        .cast("bigint")
        .alias("n_dups_recovered"),
        F.when(
            F.count("*") > 0,
            (F.count("*") - F.countDistinct("raw_fp")).cast("double")
            / F.count("*"),
        ).alias("dup_ratio_raw"),
        F.when(
            F.count("*") > 0,
            (F.count("*") - F.countDistinct("norm_fp")).cast("double")
            / F.count("*"),
        ).alias("dup_ratio_normalized"),
    )


_WINNOW_W = 4  # winnowing window: one fingerprint selected per w positions
_WINNOW_DF_CAP = 50  # posting-list cap on fingerprint document frequency


@_q(
    "dedup_winnowing_overlap",
    rf"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS t
      FROM documents WHERE TRIM(text) <> ''
    ), grams AS (
      SELECT doc_id, i AS pos,
             {sql_phash60("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")} AS h
      FROM (SELECT doc_id, t, UNNEST(range(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 3)
    ), winnowed AS (
      SELECT DISTINCT doc_id, sel_h
      FROM (
        SELECT doc_id,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
                 AS sel_h,
               pos,
               COUNT(*) OVER (PARTITION BY doc_id) AS n_pos
        FROM grams
      ) WHERE pos <= n_pos - {_WINNOW_W - 1}
    ), df AS (
      SELECT sel_h FROM winnowed GROUP BY sel_h
      HAVING COUNT(*) BETWEEN 2 AND {_WINNOW_DF_CAP}
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared_fingerprints
      FROM winnowed a
      JOIN df USING (sel_h)
      JOIN winnowed b ON b.sel_h = a.sel_h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, shared_fingerprints
    FROM pairs
    ORDER BY shared_fingerprints DESC, doc_a, doc_b LIMIT 50
    """,
)
def dedup_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint overlap (the MOSS local-fingerprinting
    algorithm): every 3-token shingle gets the portable 60-bit hash, each
    sliding window of 4 consecutive positions selects its MINIMUM hash,
    and the distinct selected hashes form the document's fingerprint set
    — the guarantee (any shared run of >= w+k-1 tokens yields a shared
    fingerprint) that makes winnowing the standard for code-plagiarism /
    passage-copy detection, with a 1/(w+1)-ish density instead of
    all-positions. Pairing runs on capped posting lists (fingerprint DF
    in [2, 50] — the same hot-key bound as the shingle-DF caps), so
    candidate work is O(sum df^2) over rare fingerprints, never
    all-pairs. Complements MinHash (global similarity) and CDC (byte
    chunks) with ordered-passage overlap. Window note: the per-doc MIN
    window is position-ordered within doc_id — the partition key the
    gram explode already carries."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    ).filter(F.size("t") >= 3)
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(t) - 2),"
                " i -> concat(t[i-1], ' ', t[i], ' ', t[i+1]))"
            )
        ).alias("pos0", "gram"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        phash60(F.col("gram")).alias("h"),
    )
    wmin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        0, _WINNOW_W - 1
    )
    wcnt = Window.partitionBy("doc_id")
    winnowed = (
        grams.select(
            "doc_id",
            F.min("h").over(wmin).alias("sel_h"),
            "pos",
            F.count("*").over(wcnt).alias("n_pos"),
        )
        .filter(F.col("pos") <= F.col("n_pos") - (_WINNOW_W - 1))
        .select("doc_id", "sel_h")
        .distinct()
    )
    df_ok = (
        winnowed.groupBy("sel_h")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= _WINNOW_DF_CAP))
        .select("sel_h")
    )
    a, b = winnowed.alias("a"), winnowed.alias("b")
    pairs = (
        a.join(df_ok, "sel_h")
        .join(
            b,
            (F.col("b.sel_h") == F.col("a.sel_h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").cast("bigint").alias("shared_fingerprints"))
    )
    return pairs.orderBy(
        F.desc("shared_fingerprints"), "doc_a", "doc_b"
    ).limit(50)


# --- round-11 wave-3 additions (docs/ROADMAP_r11.md #27, #29, #30) ----------

# Fixed stopword list for the stopword-insensitive near-dup pass. A
# LITERAL list (not a corpus-derived one) keeps membership deterministic
# under any corpus drift; these are the glue words of the fixture's
# synthetic data-engineering vocabulary plus classic English stopwords.
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")


@_q(
    "dedup_stopword_insensitive",
    rf"""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
               t -> t NOT IN {STOPWORDS!r}) AS toks
      FROM documents WHERE TRIM(text) <> ''
    ), sh0 AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
               range(1, GREATEST(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
               AS shingle
      FROM toks WHERE len(toks) >= 3
    ), df AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ), sh AS (
      SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN df USING (shingle)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared)
             AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= 0.2
    """,
)
def dedup_stopword_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-insensitive near-dup pairs: word-trigram Jaccard >= 0.2
    computed AFTER removing a fixed stopword list — the robustness
    variant that catches near-dups differing only in boilerplate glue
    words, which shift every raw trigram and hide from the plain
    entry. Machinery is the graded dedup_ngram_jaccard shape (DF-capped
    posting lists bound the candidate join; exact integer Jaccard with
    one division); the only new step is the deterministic token filter,
    a JVM higher-order lambda on both engine sides. Unigram posting
    lists were deliberately NOT used: the fixture's ~31-word vocabulary
    makes every unigram a full-corpus stopword-phrase (df^2 blowup),
    while filtered trigrams keep the same bounded-candidate guarantee
    at any scale."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    raw = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    toks = F.filter(raw, lambda t: ~t.isin(*STOPWORDS))
    filtered = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= 3
    )
    from .helpers import materialize_reduced

    sh = filtered.select(
        "doc_id", F.explode(_shingles("toks", 3)).alias("shingle")
    )
    buckets = materialize_reduced(
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") <= MAX_SHINGLE_DF)
    )
    sizes = buckets.select(F.explode("docs").alias("doc_id")).groupBy(
        "doc_id"
    ).agg(F.count("*").alias("n_sh"))
    pairs = (
        _posting_list_pairs(buckets.filter(F.size("docs") >= 2))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared")
    )
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.2)
    )


@_q(
    "dedup_url_canonical",
    r"""
    WITH d AS (
      SELECT doc_id, source,
             ('0x' || substr(md5('urlc:' || CAST(doc_id AS VARCHAR)),
              1, 15))::BIGINT AS h
      FROM documents
    ), u AS (
      SELECT doc_id,
             CASE h % 3 WHEN 0 THEN 'https' ELSE 'http' END || '://'
             || source || '.example'
             || CASE (h // 3) % 3
                  WHEN 0 THEN CASE h % 3 WHEN 0 THEN ':443' ELSE ':80' END
                  WHEN 1 THEN ''
                  ELSE ':8080' END
             || '/p/' || CAST(doc_id % 20 AS VARCHAR)
             || CASE (h // 9) % 3
                  WHEN 0 THEN '?b=2&a=1'
                  WHEN 1 THEN '?a=1&b=2'
                  ELSE '?a=1&b=2&utm_source=x' END
             || CASE (h // 27) % 2 WHEN 0 THEN '#sec' ELSE '' END AS url
      FROM d
    ), canon AS (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(regexp_replace(
               url, '#.*$', '', 'g'),
               '&utm_[a-z_]+=[^&]*', '', 'g'),
               '^(https://[^/:?#]+):443|^(http://[^/:?#]+):80',
               '\1\2', 'g') AS stripped
      FROM u
    ), parts AS (
      SELECT doc_id, url,
             CASE WHEN POSITION('?' IN stripped) > 0
                  THEN SUBSTR(stripped, 1, POSITION('?' IN stripped) - 1)
                    || '?' || array_to_string(list_sort(
                         regexp_split_to_array(SUBSTR(stripped,
                           POSITION('?' IN stripped) + 1), '&')), '&')
                  ELSE stripped END AS canonical_url
      FROM canon
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants,
           CAST(MIN(doc_id) AS BIGINT) AS representative_doc
    FROM parts GROUP BY canonical_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the realest web-corpus dedup
    precursor: strip fragments, drop tracking parameters, remove
    scheme-default ports (:443/https, :80/http — non-default ports
    survive), sort query keys, then exact-group by the canonical form
    with group sizes, raw-variant counts, and a min-doc representative.
    Entirely row-local normalization (regexp chains + one split/sort/
    join, all JVM-side) followed by one exact groupBy — the 100 TB
    shape. The URL corpus is hash-derived from (source, doc_id) with
    colliding paths and permuted/noised query variants (the
    committed-synthesis pattern: canonicalization logic is what is
    graded), so the groups genuinely merge distinct raw spellings."""
    h = phash60(F.concat(F.lit("urlc:"), F.col("doc_id").cast("string")))
    hd = (
        "cast(conv(substr(md5('urlc:' || cast(doc_id as string)), 1, 15),"
        " 16, 10) as bigint)"
    )
    scheme = F.when(h % 3 == 0, F.lit("https")).otherwise(F.lit("http"))
    port = (
        F.when(
            F.expr(f"({hd} div 3) % 3 = 0"),
            F.when(h % 3 == 0, F.lit(":443")).otherwise(F.lit(":80")),
        )
        .when(F.expr(f"({hd} div 3) % 3 = 1"), F.lit(""))
        .otherwise(F.lit(":8080"))
    )
    query = (
        F.when(F.expr(f"({hd} div 9) % 3 = 0"), F.lit("?b=2&a=1"))
        .when(F.expr(f"({hd} div 9) % 3 = 1"), F.lit("?a=1&b=2"))
        .otherwise(F.lit("?a=1&b=2&utm_source=x"))
    )
    frag = F.when(F.expr(f"({hd} div 27) % 2 = 0"), F.lit("#sec")).otherwise(
        F.lit("")
    )
    url = F.concat(
        scheme,
        F.lit("://"),
        F.col("source"),
        F.lit(".example"),
        port,
        F.lit("/p/"),
        (F.col("doc_id") % 20).cast("string"),
        query,
        frag,
    )
    u = load_table(spark, sf_dir, "documents").select(
        "doc_id", url.alias("url")
    )
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("url"), r"#.*$", ""),
            r"&utm_[a-z_]+=[^&]*",
            "",
        ),
        r"^(https://[^/:?#]+):443|^(http://[^/:?#]+):80",
        r"$1$2",
    )
    canon = u.select("doc_id", "url", stripped.alias("stripped"))
    qpos = F.instr(F.col("stripped"), "?")
    canonical = F.when(
        qpos > 0,
        F.concat(
            F.col("stripped").substr(F.lit(1), qpos - 1),
            F.lit("?"),
            F.array_join(
                F.array_sort(
                    F.split(
                        F.col("stripped").substr(
                            qpos + 1, F.length("stripped")
                        ),
                        "&",
                    )
                ),
                "&",
            ),
        ),
    ).otherwise(F.col("stripped"))
    parts = canon.select(
        "doc_id", "url", canonical.alias("canonical_url")
    )
    return parts.groupBy("canonical_url").agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.countDistinct("url").cast("bigint").alias("n_raw_variants"),
        F.min("doc_id").cast("bigint").alias("representative_doc"),
    )


MAX_DISPERSION_CLUSTER = 50  # pairwise work cap per near-dup cluster


@_q(
    "dedup_cluster_embedding_dispersion",
    rf"""
    WITH RECURSIVE pairs AS (
      {{ngram}}
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ), reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), labels AS (
      SELECT a AS doc_id, LEAST(MIN(b), a) AS cluster_id
      FROM reach GROUP BY a
    ), sized AS (
      SELECT doc_id, cluster_id,
             COUNT(*) OVER (PARTITION BY cluster_id) AS csize
      FROM labels
    ), mem AS (
      SELECT doc_id, cluster_id FROM sized
      WHERE csize <= {MAX_DISPERSION_CLUSTER}
    ), pp AS (
      SELECT m1.cluster_id,
             CAST(round(CAST(list_cosine_similarity(
                 CAST(e1.embedding AS DOUBLE[]),
                 CAST(e2.embedding AS DOUBLE[])) AS DOUBLE)
               * 1000000.0) AS BIGINT) AS cos_fp
      FROM mem m1
      JOIN mem m2 ON m2.cluster_id = m1.cluster_id
                 AND m2.doc_id > m1.doc_id
      JOIN embeddings e1 ON e1.vec_id = m1.doc_id
      JOIN embeddings e2 ON e2.vec_id = m2.doc_id
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(cos_fp) AS DOUBLE) / COUNT(*) / 1000000.0
             AS mean_pairwise_cos,
           CAST(MIN(cos_fp) AS DOUBLE) / 1000000.0 AS min_pairwise_cos,
           CAST(MAX(cos_fp) AS DOUBLE) / 1000000.0 AS max_pairwise_cos
    FROM pp GROUP BY cluster_id
    """,
)
def dedup_cluster_embedding_dispersion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding dispersion inside each near-dup TEXT cluster — the
    dedup/similarity cross-check: if trigram-Jaccard clustering is
    right, within-cluster embedding cosine should be high and tight;
    a low-dispersion cluster whose mean cosine is ALSO low is a
    clustering false-merge. Clusters are the graded transitive closure
    (dedup_clusters machinery verbatim), capped at 50 members so the
    within-cluster pair enumeration is bounded (near-dup clusters are
    small by nature; the cap is graded semantics like the LSH bucket
    caps). Each pair's cosine uses the proven sequential-fold identity
    snapped to 1e-6 fixed point BEFORE the per-cluster mean, so the
    cross-pair sum is exact integer addition in both engines. vec_id
    keys embeddings 1:1 to doc_id at every SF (verified round 10)."""
    from ..graph import connected_components

    pairs = dedup_ngram_jaccard(spark, sf_dir)
    comp = connected_components(pairs, "doc_a", "doc_b")
    w = Window.partitionBy("cluster_id")
    mem = (
        comp.select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
        )
        .withColumn("csize", F.count("*").over(w))
        .filter(F.col("csize") <= MAX_DISPERSION_CLUSTER)
        .select("doc_id", "cluster_id")
    )
    mem = materialize_reduced(mem)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    m1 = mem.alias("m1")
    m2 = mem.alias("m2")
    pair_ids = m1.join(
        m2,
        (F.col("m2.cluster_id") == F.col("m1.cluster_id"))
        & (F.col("m2.doc_id") > F.col("m1.doc_id")),
    ).select(
        F.col("m1.cluster_id").alias("cluster_id"),
        F.col("m1.doc_id").alias("da"),
        F.col("m2.doc_id").alias("db"),
    )
    e1 = emb.select(
        F.col("vec_id").alias("da"), F.col("embedding").alias("ea")
    )
    e2 = emb.select(
        F.col("vec_id").alias("db"), F.col("embedding").alias("eb")
    )
    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cos = _dot(F.col("ea"), F.col("eb")) / (
        F.sqrt(_dot(F.col("ea"), F.col("ea")))
        * F.sqrt(_dot(F.col("eb"), F.col("eb")))
    )
    pp = (
        pair_ids.join(e1, "da")
        .join(e2, "db")
        .select(
            "cluster_id",
            F.round(cos * 1000000.0, 0).cast("bigint").alias("cos_fp"),
        )
    )
    return pp.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        (
            F.sum("cos_fp").cast("double") / F.count("*") / 1000000.0
        ).alias("mean_pairwise_cos"),
        (F.min("cos_fp").cast("double") / 1000000.0).alias(
            "min_pairwise_cos"
        ),
        (F.max("cos_fp").cast("double") / 1000000.0).alias(
            "max_pairwise_cos"
        ),
    )


ORACLES["dedup_cluster_embedding_dispersion"] = ORACLES[
    "dedup_cluster_embedding_dispersion"
].format(ngram=ORACLES["dedup_ngram_jaccard"])


@_q(
    "dedup_record_linkage_score",
    """
    WITH src AS (
      SELECT c_custkey, c_name, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
             c_mktsegment,
             ('0x' || substr(md5('link:' || CAST(c_custkey AS VARCHAR)),
              1, 15))::BIGINT AS h
      FROM customer
    ), incoming AS (
      SELECT c_custkey AS true_key,
             CASE h % 4
               WHEN 0 THEN SUBSTR(c_name, 1, LENGTH(c_name) - 1)
                 || CAST((CAST(SUBSTR(c_name, LENGTH(c_name), 1) AS INTEGER)
                          + 1) % 10 AS VARCHAR)
               WHEN 1 THEN SUBSTR(c_name, 1, LENGTH(c_name) - 1)
               ELSE c_name END AS name,
             CASE WHEN h % 5 = 0 THEN (c_nationkey + 1) % 25
                  ELSE c_nationkey END AS nationkey,
             bal_cents + (h % 201) - 100 AS bal_cents,
             CASE WHEN h % 7 = 0 THEN 'CORRUPTED' ELSE c_mktsegment END
               AS mktsegment
      FROM src
    ), cand AS (
      SELECT i.true_key, c.c_custkey AS cand_key,
             CASE WHEN i.name = c.c_name THEN 1 ELSE 0 END AS name_exact,
             CASE WHEN i.name <> c.c_name
                   AND SUBSTR(i.name, 1, 17) = SUBSTR(c.c_name, 1, 17)
                  THEN 1 ELSE 0 END AS name_prefix,
             CASE WHEN i.nationkey = c.c_nationkey THEN 1 ELSE 0 END
               AS nation_agree,
             CASE WHEN i.mktsegment = c.c_mktsegment THEN 1 ELSE 0 END
               AS segment_agree,
             CASE WHEN ABS(i.bal_cents
                           - CAST(round(c.c_acctbal * 100) AS BIGINT))
                       <= 10000 THEN 1 ELSE 0 END AS balance_band
      FROM incoming i
      JOIN customer c
        ON SUBSTR(i.name, 1, 16) = SUBSTR(c.c_name, 1, 16)
    ), scored AS (
      SELECT true_key, cand_key,
             CAST(8 * name_exact + 4 * name_prefix + 3 * nation_agree
                  + 2 * segment_agree + balance_band AS BIGINT) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY true_key
               ORDER BY 8 * name_exact + 4 * name_prefix + 3 * nation_agree
                        + 2 * segment_agree + balance_band DESC, cand_key
             ) AS rk
      FROM cand
    )
    SELECT true_key, cand_key AS matched_key, score,
           CASE WHEN cand_key = true_key THEN 1 ELSE 0 END AS is_true_match
    FROM scored WHERE rk = 1
    """,
)
def dedup_record_linkage_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter-style record linkage over customer records: a
    hash-corrupted 'incoming' copy of every customer (deterministic
    last-digit typos / truncations, nation and segment swaps, balance
    jitter — the committed dirty-fixture pattern; the fixture carries no
    address/phone, so the agreement vector is the roadmap-scoped one)
    is matched back against the clean table. Blocking on the 16-char
    name prefix keeps candidates to <=100 per record at any SF (the
    corruption classes all preserve the block). The agreement vector
    (name exact / near, nationkey, segment, balance within $100) folds
    into integer log-odds-style weights (8/4/3/2/1 literals), and the
    top-scoring candidate per record wins with a deterministic key
    tie-break; is_true_match makes the output self-evaluating. Exact
    integers end-to-end — no float anywhere."""
    src = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias(
            "bal_cents"
        ),
        "c_mktsegment",
        phash60(
            F.concat(F.lit("link:"), F.col("c_custkey").cast("string"))
        ).alias("h"),
    )
    nm = F.col("c_name")
    last_digit = F.substring(nm, -1, 1).cast("int")
    swapped = F.concat(
        F.expr("substr(c_name, 1, length(c_name) - 1)"),
        ((last_digit + 1) % 10).cast("string"),
    )
    truncated = F.expr("substr(c_name, 1, length(c_name) - 1)")
    incoming = src.select(
        F.col("c_custkey").alias("true_key"),
        F.when(F.col("h") % 4 == 0, swapped)
        .when(F.col("h") % 4 == 1, truncated)
        .otherwise(nm)
        .alias("name"),
        F.when(F.col("h") % 5 == 0, (F.col("c_nationkey") + 1) % 25)
        .otherwise(F.col("c_nationkey"))
        .alias("nationkey"),
        (F.col("bal_cents") + (F.col("h") % 201) - 100).alias("bal_cents"),
        F.when(F.col("h") % 7 == 0, F.lit("CORRUPTED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("mktsegment"),
    )
    clean = load_table(spark, sf_dir, "customer")
    cand = incoming.join(
        clean,
        F.substring(F.col("name"), 1, 16)
        == F.substring(F.col("c_name"), 1, 16),
    ).select(
        "true_key",
        F.col("c_custkey").alias("cand_key"),
        F.when(F.col("name") == F.col("c_name"), 1).otherwise(0).alias(
            "name_exact"
        ),
        F.when(
            (F.col("name") != F.col("c_name"))
            & (
                F.substring(F.col("name"), 1, 17)
                == F.substring(F.col("c_name"), 1, 17)
            ),
            1,
        )
        .otherwise(0)
        .alias("name_prefix"),
        F.when(F.col("nationkey") == F.col("c_nationkey"), 1)
        .otherwise(0)
        .alias("nation_agree"),
        F.when(F.col("mktsegment") == F.col("c_mktsegment"), 1)
        .otherwise(0)
        .alias("segment_agree"),
        F.when(
            F.abs(
                F.col("bal_cents")
                - F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
            )
            <= 10000,
            1,
        )
        .otherwise(0)
        .alias("balance_band"),
    )
    score = (
        8 * F.col("name_exact")
        + 4 * F.col("name_prefix")
        + 3 * F.col("nation_agree")
        + 2 * F.col("segment_agree")
        + F.col("balance_band")
    )
    w = Window.partitionBy("true_key").orderBy(
        score.desc(), "cand_key"
    )
    return (
        cand.withColumn("score", score.cast("bigint"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "true_key",
            F.col("cand_key").alias("matched_key"),
            "score",
            F.when(F.col("cand_key") == F.col("true_key"), 1)
            .otherwise(0)
            .alias("is_true_match"),
        )
    )


# --- round 12: multiset similarity, sentence containment, calibration curve


@_q(
    "dedup_bag_jaccard",
    rf"""
    WITH sh AS (
      SELECT doc_id, shingle, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT doc_id, UNNEST(list_transform(
                 range(1, GREATEST(len(toks) - 1, 1)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
               AS shingle
        FROM (SELECT doc_id,
                     regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
              FROM documents WHERE TRIM(text) <> '') t
        WHERE len(toks) >= 3
      ) GROUP BY doc_id, shingle
    ), df AS (
      SELECT shingle FROM sh GROUP BY shingle
      HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ), shc AS (
      SELECT sh.doc_id, sh.shingle, sh.cnt FROM sh JOIN df USING (shingle)
    ), sizes AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_sh
      FROM shc GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(LEAST(a.cnt, b.cnt)) AS BIGINT) AS n_shared
      FROM shc a JOIN shc b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_shared,
           CAST(n_shared AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - n_shared AS DOUBLE) AS bag_jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_shared AS DOUBLE)
          / CAST(sa.n_sh + sb.n_sh - n_shared AS DOUBLE) >= 0.2
    """,
)
def dedup_bag_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) trigram Jaccard near-dup pairs: intersection =
    sum of per-shingle MIN counts, union = n_a + n_b - intersection —
    the repetition-aware variant the set-Jaccard entries cannot see
    (a template stuffed with one repeated paragraph looks unique as a
    SET but duplicates as a BAG). Counts ride the same posting-list
    join as dedup_ngram_jaccard: the DF cap (distinct docs per shingle
    <= MAX_SHINGLE_DF) bounds every shingle's pair fan-out regardless
    of corpus size, and all arithmetic is exact BIGINT until the one
    threshold division. Same 0.2 floor as the set entry so the two
    outputs are directly comparable."""
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    sh = (
        load_table(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 3),"
                    " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
                )
            ).alias("shingle"),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    sh = materialize_reduced(sh)
    df_ok = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= MAX_SHINGLE_DF)
        .select("shingle")
    )
    shc = sh.join(df_ok, "shingle")
    shc = materialize_reduced(shc)
    sizes = shc.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_sh")
    )
    a = shc.alias("a")
    b = shc.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.sum(F.least(F.col("a.cnt"), F.col("b.cnt")))
            .cast("bigint")
            .alias("n_shared")
        )
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared")
    ).cast("double")
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", "n_shared", jac.alias("bag_jaccard"))
        .filter(F.col("bag_jaccard") >= 0.2)
    )


@_q(
    "dedup_sentence_containment",
    rf"""
    WITH d AS (
      SELECT doc_id,
             regexp_replace(TRIM(text),
               '(\S+\s+\S+\s+\S+\s+\S+\s+\S+)\s', '\1. ', 'g') AS t
      FROM documents WHERE TRIM(text) <> ''
    ), s AS (
      SELECT DISTINCT doc_id, md5(TRIM(sent)) AS h
      FROM (SELECT doc_id, UNNEST(regexp_split_to_array(t, '\. ')) AS sent
            FROM d)
      WHERE TRIM(sent) <> ''
    ), df AS (
      SELECT h FROM s GROUP BY h HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ), sc AS (SELECT s.doc_id, s.h FROM s JOIN df USING (h)),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sent
      FROM sc GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sc a JOIN sc b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_shared,
           CAST(n_shared AS DOUBLE) / CAST(sa.n_sent AS DOUBLE)
             AS containment_a_in_b,
           CAST(n_shared AS DOUBLE) / CAST(sb.n_sent AS DOUBLE)
             AS containment_b_in_a
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_shared AS DOUBLE) / CAST(sa.n_sent AS DOUBLE) >= 0.5
       OR CAST(n_shared AS DOUBLE) / CAST(sb.n_sent AS DOUBLE) >= 0.5
    """,
)
def dedup_sentence_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-level containment — the copy-paste detector at sentence
    grain: the share of doc A's DISTINCT sentences exactly contained in
    doc B (and vice versa; both directions reported for each unordered
    pair, flagged when either >= 0.5). Sentences come from the shared
    round-11 deterministic injection, fingerprinted by md5 and joined
    through DF-capped posting lists (a sentence appearing in more than
    MAX_SHINGLE_DF docs is boilerplate, not evidence of pairwise
    copying — the same cap rationale as the shingle entries). Exact
    integer counts; two divisions by structurally-positive sizes."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select(
            "doc_id",
            F.regexp_replace(
                F.trim(F.col("text")),
                r"(\S+\s+\S+\s+\S+\s+\S+\s+\S+)\s",
                "$1. ",
            ).alias("t"),
        )
    )
    s = (
        d.select(
            "doc_id", F.explode(F.split(F.col("t"), r"\. ")).alias("sent")
        )
        .filter(F.trim(F.col("sent")) != "")
        .select("doc_id", F.md5(F.trim(F.col("sent"))).alias("h"))
        .distinct()
    )
    s = materialize_reduced(s)
    df_ok = (
        s.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= MAX_SHINGLE_DF)
        .select("h")
    )
    sc = s.join(df_ok, "h")
    sc = materialize_reduced(sc)
    sizes = sc.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_sent")
    )
    a = sc.alias("a")
    b = sc.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    c_ab = F.col("n_shared").cast("double") / F.col("sa.n_sent").cast(
        "double"
    )
    c_ba = F.col("n_shared").cast("double") / F.col("sb.n_sent").cast(
        "double"
    )
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            c_ab.alias("containment_a_in_b"),
            c_ba.alias("containment_b_in_a"),
        )
        .filter(
            (F.col("containment_a_in_b") >= 0.5)
            | (F.col("containment_b_in_a") >= 0.5)
        )
    )


ORACLES["dedup_minhash_calibration_curve"] = f"""
    WITH est AS ({ORACLES["dedup_minhash_portable"]}),
         exact AS ({ORACLES["dedup_ngram_jaccard"]})
    SELECT LEAST(9, CAST(FLOOR(COALESCE(exact.jaccard, 0.0) * 10.0)
                    AS BIGINT)) AS exact_bin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(round(est.est_jaccard * 1000000.0) AS BIGINT))
                AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_est_jaccard,
           CAST(SUM(CAST(round(COALESCE(exact.jaccard, 0.0) * 1000000.0)
                AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*)
             AS mean_exact_jaccard
    FROM est LEFT JOIN exact
      ON est.doc_a = exact.doc_a AND est.doc_b = exact.doc_b
    GROUP BY exact_bin
"""


@_q("dedup_minhash_calibration_curve")
def dedup_minhash_calibration_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The inverse view of dedup_minhash_calibration: estimator error
    bucketed by the EXACT Jaccard decile (10 bins, pairs below the
    exact join's 0.2 floor land in their COALESCE-0 bin as explicit
    false positives) — the curve a threshold-tuner actually reads
    (given true similarity x, what does the 16-perm estimator say?),
    where the graded sibling buckets by the ESTIMATE. Composes the two
    graded inputs, adds one |pairs|-row left join and a <= 10-row
    rollup; means go through the shared 1e-6 fixed-point snap."""
    est, exact = _overlapped_est_exact(spark, sf_dir)
    j = est.join(
        exact,
        (est.doc_a == exact.e_doc_a) & (est.doc_b == exact.e_doc_b),
        "left",
    )
    ex = F.coalesce(F.col("jaccard"), F.lit(0.0))
    return (
        j.groupBy(
            F.least(
                F.lit(9).cast("bigint"),
                F.floor(ex * 10.0).cast("bigint"),
            ).alias("exact_bin")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            (
                fp_sum(F.col("est_jaccard"), 1e6).cast("double")
                / F.lit(1000000.0)
                / F.count("*")
            ).alias("mean_est_jaccard"),
            (
                fp_sum(ex, 1e6).cast("double")
                / F.lit(1000000.0)
                / F.count("*")
            ).alias("mean_exact_jaccard"),
        )
    )


@_q(
    "dedup_shingle_df_spectrum",
    rf"""
    WITH sh0 AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
               range(1, GREATEST(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
               AS shingle
      FROM (SELECT doc_id,
                   regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
            FROM documents WHERE TRIM(text) <> '') t
      WHERE len(toks) >= 3
    ), df AS (
      SELECT shingle, CAST(COUNT(*) AS BIGINT) AS doc_freq
      FROM sh0 GROUP BY shingle
    )
    SELECT doc_freq,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(doc_freq * COUNT(*) AS BIGINT) AS n_postings,
           CASE WHEN doc_freq <= {MAX_SHINGLE_DF} THEN 1 ELSE 0 END
             AS within_cap
    FROM df GROUP BY doc_freq
    """,
)
def dedup_shingle_df_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency spectrum of the trigram shingles feeding every
    set-similarity entry: how many shingles occur in exactly k docs,
    the posting mass at each frequency, and which frequencies the
    MAX_SHINGLE_DF cap excludes — the empirical pricing of the cap (the
    near-dup entries assert its NECESSITY; this measures what it
    actually removes, which is how the threshold gets retuned on a new
    corpus). Uses the SAME distinct-shingle construction as
    dedup_ngram_jaccard so the spectrum describes exactly the postings
    those entries join on. One shingle shuffle + one bounded
    (|distinct df| rows) rollup; exact integers only."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    sh = shingle_rows(docs)
    df = sh.groupBy("shingle").agg(
        F.count("*").cast("bigint").alias("doc_freq")
    )
    spectrum = df.groupBy("doc_freq").agg(
        F.count("*").cast("bigint").alias("n_shingles")
    )
    return spectrum.select(
        "doc_freq",
        "n_shingles",
        (F.col("doc_freq") * F.col("n_shingles"))
        .cast("bigint")
        .alias("n_postings"),
        F.when(F.col("doc_freq") <= MAX_SHINGLE_DF, 1)
        .otherwise(0)
        .alias("within_cap"),
    )


@_q(
    "dedup_transitivity_audit",
    rf"""
    WITH sh0 AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
               range(1, GREATEST(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
               AS shingle
      FROM (SELECT doc_id,
                   regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
            FROM documents WHERE TRIM(text) <> '') t
      WHERE len(toks) >= 3
    ), df AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ), sh AS (
      SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN df USING (shingle)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), full_pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS DOUBLE)
             / (sa.n_sh + sb.n_sh - COUNT(*)) AS jaccard
      FROM sh a
      JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      JOIN sizes sa ON sa.doc_id = a.doc_id
      JOIN sizes sb ON sb.doc_id = b.doc_id
      GROUP BY a.doc_id, b.doc_id, sa.n_sh, sb.n_sh
    ), strong AS (
      SELECT doc_a, doc_b FROM full_pairs WHERE jaccard >= 0.2
    ), triples AS (
      SELECT p.doc_a AS x, q.doc_b AS y FROM strong p
      JOIN strong q ON p.doc_b = q.doc_a
      UNION ALL
      SELECT p.doc_b AS x, q.doc_b AS y FROM strong p
      JOIN strong q ON p.doc_a = q.doc_a AND p.doc_b < q.doc_b
      UNION ALL
      SELECT p.doc_a AS x, q.doc_a AS y FROM strong p
      JOIN strong q ON p.doc_b = q.doc_b AND p.doc_a < q.doc_a
    ), judged AS (
      SELECT t.x, t.y, COALESCE(fp.jaccard, 0.0) AS j_xy
      FROM triples t
      LEFT JOIN full_pairs fp ON fp.doc_a = t.x AND fp.doc_b = t.y
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM strong)
             AS n_strong_pairs,
           CAST(COUNT(*) AS BIGINT) AS n_triples,
           CAST(COUNT(CASE WHEN j_xy < 0.1 THEN 1 END) AS BIGINT)
             AS n_violations,
           CASE WHEN COUNT(*) > 0 THEN
             CAST(COUNT(CASE WHEN j_xy < 0.1 THEN 1 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) END AS violation_share
    FROM judged
    """,
)
def dedup_transitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup transitivity audit: among connected triples of the
    trigram-Jaccard >= 0.2 pair graph (A~B and B~C through any shared
    endpoint), how many outer pairs (A, C) fall below threshold/2 =
    0.1? High violation share means the threshold is chaining
    unrelated docs through hubs and connected-component dedup will
    over-merge; near-zero means clusters are metrically tight. The
    un-thresholded pair table comes from the SAME DF-capped posting
    machinery as dedup_ngram_jaccard (so the two entries can never
    disagree on a jaccard); triples enumerate once each via the three
    shared-endpoint orientations with canonical x < y; outer pairs
    sharing NO shingle have jaccard 0 by the left-join COALESCE.
    Everything is bounded by the capped pair set (sum of df^2 over
    shingles), never |docs|^2. Single-row output."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    sh = shingle_rows(docs)
    buckets = materialize_reduced(
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") <= MAX_SHINGLE_DF)
    )
    sizes = (
        buckets.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_sh"))
    )
    shared = (
        _posting_list_pairs(buckets.filter(F.size("docs") >= 2))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared")
    )
    full_pairs = materialize_reduced(
        shared.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )
    strong = full_pairs.filter(F.col("jaccard") >= 0.2).select(
        "doc_a", "doc_b"
    )
    strong = materialize_reduced(strong)
    p, q = strong.alias("p"), strong.alias("q")
    t1 = p.join(q, F.col("p.doc_b") == F.col("q.doc_a")).select(
        F.col("p.doc_a").alias("x"), F.col("q.doc_b").alias("y")
    )
    t2 = p.join(
        q,
        (F.col("p.doc_a") == F.col("q.doc_a"))
        & (F.col("p.doc_b") < F.col("q.doc_b")),
    ).select(F.col("p.doc_b").alias("x"), F.col("q.doc_b").alias("y"))
    t3 = p.join(
        q,
        (F.col("p.doc_b") == F.col("q.doc_b"))
        & (F.col("p.doc_a") < F.col("q.doc_a")),
    ).select(F.col("p.doc_a").alias("x"), F.col("q.doc_a").alias("y"))
    triples = t1.unionAll(t2).unionAll(t3)
    judged = triples.join(
        full_pairs,
        (F.col("x") == F.col("doc_a")) & (F.col("y") == F.col("doc_b")),
        "left",
    ).select("x", "y", F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("j_xy"))
    n_strong = strong.agg(
        F.count("*").cast("bigint").alias("n_strong_pairs")
    )
    viol = F.count(F.when(F.col("j_xy") < 0.1, 1))
    agg = judged.agg(
        F.count("*").cast("bigint").alias("n_triples"),
        viol.cast("bigint").alias("n_violations"),
        F.when(
            F.count("*") > 0,
            viol.cast("double") / F.count("*").cast("double"),
        ).alias("violation_share"),
    )
    return n_strong.crossJoin(F.broadcast(agg)).select(
        "n_strong_pairs", "n_triples", "n_violations", "violation_share"
    )


@_q(
    "dedup_crosssource_dup_matrix",
    r"""
    WITH fp AS (
      SELECT source,
             md5(TRIM(LOWER(text))) AS h
      FROM documents WHERE TRIM(text) <> ''
    ), grp AS (
      SELECT h, source, CAST(COUNT(*) AS BIGINT) AS c
      FROM fp GROUP BY h, source
    ), dup AS (
      SELECT h FROM grp GROUP BY h
      HAVING SUM(c) >= 2 AND COUNT(*) <= 100
    ), pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CASE WHEN a.source = b.source
                  THEN a.c * (a.c - 1) / 2
                  ELSE a.c * b.c END AS n_pairs
      FROM grp a
      JOIN grp b ON a.h = b.h AND a.source <= b.source
      JOIN dup d ON d.h = a.h
      WHERE a.source < b.source OR (a.source = b.source AND a.c >= 2)
    )
    SELECT source_a, source_b,
           CAST(SUM(n_pairs) AS BIGINT) AS n_dup_pairs
    FROM pairs GROUP BY source_a, source_b
    """,
)
def dedup_crosssource_dup_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-duplicate pair counts per source pair — the syndication
    matrix at WHOLE-DOCUMENT grain (the lead-cluster entry sees only
    heads; this sees verbatim mirrors): md5 of the normalized text,
    per-(fingerprint, source) counts, then within-fingerprint pair
    arithmetic — same-source pairs c*(c-1)/2, cross-source pairs
    c_a*c_b — summed per source pair. The per-fingerprint source
    spread is capped at 100 (a fingerprint spanning more sources than
    that is generator boilerplate and would square; same role as
    MAX_SHINGLE_DF, documented). Exact integers, no division; output
    bounded by |sources|^2."""
    fp = (
        load_table(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("source", F.md5(F.trim(F.lower(F.col("text")))).alias("h"))
    )
    grp = fp.groupBy("h", "source").agg(
        F.count("*").cast("bigint").alias("c")
    )
    grp = materialize_reduced(grp)
    dup = (
        grp.groupBy("h")
        .agg(F.sum("c").alias("tot"), F.count("*").alias("nsrc"))
        .filter((F.col("tot") >= 2) & (F.col("nsrc") <= 100))
        .select("h")
    )
    a, b = grp.alias("a"), grp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") <= F.col("b.source")),
        )
        .join(
            dup.select(F.col("h").alias("dup_h")),
            F.col("a.h") == F.col("dup_h"),
        )
        .filter(
            (F.col("a.source") < F.col("b.source"))
            | (
                (F.col("a.source") == F.col("b.source"))
                & (F.col("a.c") >= 2)
            )
        )
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.when(
                F.col("a.source") == F.col("b.source"),
                F.expr("a.c * (a.c - 1) div 2"),
            )
            .otherwise(F.col("a.c") * F.col("b.c"))
            .alias("n_pairs"),
        )
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.sum("n_pairs").cast("bigint").alias("n_dup_pairs")
    )


# --- round 14: banding sensitivity, strong-pair component structure -------

_SENS_CONFIGS = [
    (16, 1, 6.25e-2),
    (8, 2, 3.5355339059327373e-1),
    (4, 4, 7.0710678118654757e-1),
]


def _band_sensitivity_oracle() -> str:
    shingles = ORACLES["dedup_minhash_portable"].split("), hh AS")[0]
    ctes, rows = [], []
    for b, r, thr in _SENS_CONFIGS:
        ctes.append(f"""
    b{b} AS MATERIALIZED (
      SELECT doc_id, p // {r} AS band,
             md5(string_agg(CAST(mh AS VARCHAR), ':' ORDER BY p)) AS bh
      FROM sig GROUP BY doc_id, p // {r}
    ), bz{b} AS MATERIALIZED (
      SELECT band, bh FROM b{b} GROUP BY band, bh
      HAVING COUNT(*) BETWEEN 2 AND {MAX_BUCKET}
    ), p{b} AS MATERIALIZED (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b2
      FROM b{b} x
      JOIN b{b} y ON x.band = y.band AND x.bh = y.bh
                 AND x.doc_id < y.doc_id
      JOIN bz{b} z ON z.band = x.band AND z.bh = x.bh
    )""")
        rows.append(f"""
    SELECT {b} AS n_bands, {r} AS rows_per_band,
           {thr:.17e} AS s_curve_threshold,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bz{b})
             AS n_candidate_buckets,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p{b})
             AS n_candidate_pairs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
             (SELECT a FROM p{b} UNION SELECT b2 FROM p{b}))
             AS n_docs_in_pairs""")
    return (
        shingles
        + """
    ), hh AS (
      SELECT doc_id, j, md5(shingle || ':' || j) AS m
      FROM sh CROSS JOIN range(8) r(j)
    ), ph AS (
      SELECT doc_id, 2*j AS p, ('0x' || substr(m, 1, 15))::BIGINT AS h
      FROM hh
      UNION ALL
      SELECT doc_id, 2*j + 1 AS p, ('0x' || substr(m, 16, 15))::BIGINT AS h
      FROM hh
    ), sig AS MATERIALIZED (
      SELECT doc_id, p, MIN(h) AS mh FROM ph GROUP BY doc_id, p
    ),"""
        + ",".join(ctes)
        + "\n    UNION ALL".join(rows)
    )


@_q("dedup_band_sensitivity_curve", _band_sensitivity_oracle())
def dedup_band_sensitivity_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Empirical LSH banding S-curve: realized candidate bucket/pair
    volumes AND doc coverage at band widths r = 1, 2, 4 over the SAME
    16-value portable MinHash signature (ROADMAP_r14 #30). The
    calibration entry reports collision PROBABILITIES and the band
    sweep reports uncapped wide-config costs; this entry walks the
    other side of the curve down to r = 1 (threshold 1/16 — the
    recall-at-any-cost setting) WITH the production MAX_BUCKET cap
    applied to pairing, plus n_docs_in_pairs — the fraction of the
    corpus the setting would drag into verification. Signature built
    once (graded machinery); each config re-bands with p div r; pair
    generation is the capped posting-list expansion, never a corpus
    self-join."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    wide = _portable_minhash_sigs(docs)
    stack_expr = (
        "stack(16, " + ", ".join(f"{p}, m{p}" for p in range(16))
        + ") AS (p, mh)"
    )
    sig = materialize_reduced(wide.selectExpr("doc_id", stack_expr))

    # The three band configs are independent pipelines over the
    # already-materialized signature table: run them from a small thread
    # pool so each config's eager materializations overlap (guide-§2.6
    # job overlap — a config's straggler tail backfills with the next
    # config's tasks). Results are unchanged; only wall-clock drops.
    def _config_row(cfg):
        b, r, thr = cfg
        banded = (
            sig.groupBy("doc_id", F.expr(f"p div {r}").alias("band"))
            .agg(
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("p", "mh"))
                            ),
                            lambda s: s["mh"].cast("string"),
                        ),
                        ":",
                    )
                ).alias("bh")
            )
        )
        buckets = (
            banded.groupBy("band", "bh")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
            .filter((F.size("docs") >= 2) & (F.size("docs") <= MAX_BUCKET))
        )
        buckets = materialize_reduced(buckets)
        pairs = _posting_list_pairs(buckets).distinct()
        pairs = materialize_reduced(pairs)
        coverage = (
            pairs.select(F.col("doc_a").alias("d"))
            .union(pairs.select(F.col("doc_b").alias("d")))
            .distinct()
        )
        row = (
            buckets.agg(
                F.count("*").cast("bigint").alias("n_candidate_buckets")
            )
            .crossJoin(
                pairs.agg(
                    F.count("*").cast("bigint").alias("n_candidate_pairs")
                )
            )
            .crossJoin(
                coverage.agg(
                    F.count("*").cast("bigint").alias("n_docs_in_pairs")
                )
            )
            .select(
                F.lit(b).alias("n_bands"),
                F.lit(r).alias("rows_per_band"),
                F.lit(thr).alias("s_curve_threshold"),
                "n_candidate_buckets",
                "n_candidate_pairs",
                "n_docs_in_pairs",
            )
        )
        return row

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(_SENS_CONFIGS)) as pool:
        rows = list(pool.map(_config_row, _SENS_CONFIGS))
    out = rows[0]
    for row in rows[1:]:
        out = out.unionByName(row)
    return out


@_q(
    "dedup_cluster_size_spectrum",
    rf"""
    WITH RECURSIVE pairs AS (
      {{ngram}}
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ), reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), labels AS (
      SELECT a AS doc_id, LEAST(MIN(b), a) AS cluster_id
      FROM reach GROUP BY a
    ), sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM labels GROUP BY cluster_id
    ), nondeg AS (
      SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
      FROM sizes GROUP BY cluster_size
    ), singles AS (
      SELECT CAST(1 AS BIGINT) AS cluster_size,
             (SELECT COUNT(*) FROM documents WHERE TRIM(text) <> '')
             - (SELECT COALESCE(CAST(SUM(cluster_size * n_clusters)
                                     AS BIGINT), 0) FROM nondeg)
               AS n_clusters
    )
    SELECT cluster_size, n_clusters,
           CAST(cluster_size * n_clusters AS BIGINT) AS n_docs
    FROM (SELECT * FROM nondeg UNION ALL
          SELECT cluster_size, CAST(n_clusters AS BIGINT) FROM singles
          WHERE n_clusters > 0)
    """,
)
def dedup_cluster_size_spectrum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Connected-component size histogram of the trigram-Jaccard >= 0.2
    strong-pair graph, WITH the singleton mass (docs in no strong pair
    — the graded dedup_clusters table only covers paired docs, so its
    histogram alone can't answer 'what fraction of the corpus
    dedupes') — the threshold-health spectrum: a healthy threshold
    reads as a long size-1 tail plus small tight clusters; a giant
    component means hub-chaining (ROADMAP_r14 #31). Components via the
    same bounded min-label propagation (graph.connected_components,
    localCheckpoint lineage cuts); the singleton row is exact
    arithmetic against the non-empty doc count."""
    from ..graph import connected_components

    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    pairs = dedup_ngram_jaccard(spark, sf_dir)
    comp = connected_components(pairs, "doc_a", "doc_b")
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    nondeg = sizes.groupBy("cluster_size").agg(
        F.count("*").cast("bigint").alias("n_clusters")
    )
    nondeg = materialize_reduced(nondeg)
    n_docs_total = docs.agg(F.count("*").cast("bigint").alias("n_total"))
    paired_mass = nondeg.agg(
        F.coalesce(
            F.sum(F.col("cluster_size") * F.col("n_clusters")), F.lit(0)
        )
        .cast("bigint")
        .alias("n_paired")
    )
    singles = (
        n_docs_total.crossJoin(F.broadcast(paired_mass))
        .select(
            F.lit(1).cast("bigint").alias("cluster_size"),
            (F.col("n_total") - F.col("n_paired"))
            .cast("bigint")
            .alias("n_clusters"),
        )
        .filter(F.col("n_clusters") > 0)
    )
    return (
        nondeg.unionByName(singles)
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
        )
    )


ORACLES["dedup_cluster_size_spectrum"] = ORACLES[
    "dedup_cluster_size_spectrum"
].format(ngram=ORACLES["dedup_ngram_jaccard"])


@_q(
    "graph_component_census_strongpairs",
    rf"""
    WITH RECURSIVE pairs AS (
      {{ngram}}
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ), reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), labels AS (
      SELECT a AS doc_id, LEAST(MIN(b), a) AS cluster_id
      FROM reach GROUP BY a
    ), nodes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM labels GROUP BY cluster_id
    ), edge_comp AS (
      SELECT l.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_edges
      FROM pairs p JOIN labels l ON l.doc_id = p.doc_a
      GROUP BY l.cluster_id
    )
    SELECT n.cluster_id AS component_id, n.n_nodes, e.n_edges,
           CAST(2 * e.n_edges AS DOUBLE)
             / (CAST(n.n_nodes AS DOUBLE) * (n.n_nodes - 1))
             AS density
    FROM nodes n JOIN edge_comp e USING (cluster_id)
    """,
)
def graph_component_census_strongpairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-component census of the strong-pair (trigram-Jaccard >= 0.2)
    graph: node count, edge count, and internal density 2E/(n(n-1)) —
    the structure table behind the size spectrum (density ~1 means a
    clique of true duplicates; a large sparse component means
    hub-chaining and over-merge risk; ROADMAP_r14 #47, sharing the
    spectrum's component machinery). Components >= 2 nodes always
    (every member has an edge), so the density division is
    structurally nonzero. Edges assign to their doc_a's component
    (endpoints agree by construction). Bounded label-propagation
    rounds; output bounded by |components|."""
    from ..graph import connected_components

    pairs = dedup_ngram_jaccard(spark, sf_dir)
    pairs = materialize_reduced(pairs)
    comp = connected_components(pairs, "doc_a", "doc_b")
    nodes = comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )
    lab = comp.select(
        F.col("node").alias("doc_a"), F.col("component").alias("cluster_id")
    )
    edge_comp = (
        pairs.join(lab, "doc_a")
        .groupBy("cluster_id")
        .agg(F.count("*").cast("bigint").alias("n_edges"))
    )
    return (
        nodes.join(edge_comp, "cluster_id")
        .select(
            F.col("cluster_id").alias("component_id"),
            "n_nodes",
            "n_edges",
            (
                (2 * F.col("n_edges")).cast("double")
                / (
                    F.col("n_nodes").cast("double")
                    * (F.col("n_nodes") - 1)
                )
            ).alias("density"),
        )
    )


ORACLES["graph_component_census_strongpairs"] = ORACLES[
    "graph_component_census_strongpairs"
].format(ngram=ORACLES["dedup_ngram_jaccard"])


# --- round 15 wave-2 pre-build: containment-vs-Jaccard disagreement --------


@_q(
    "dedup_containment_disagreement",
    rf"""
    WITH sh0 AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
               range(1, GREATEST(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
            FROM documents WHERE TRIM(text) <> '') t
      WHERE len(toks) >= 3
    ), df AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ), sh AS (
      SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN df USING (shingle)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), banded AS (
      SELECT CAST((10 * n_shared) // LEAST(sa.n_sh, sb.n_sh) AS BIGINT)
               AS cont_decile,
             CAST((10 * n_shared) // (sa.n_sh + sb.n_sh - n_shared)
               AS BIGINT) AS jac_decile
      FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    )
    SELECT cont_decile, jac_decile,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           cont_decile >= 6 AND jac_decile < 2 AS missed_by_jaccard
    FROM banded
    GROUP BY cont_decile, jac_decile
    """,
)
def dedup_containment_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-vs-containment disagreement census (ROADMAP_r15 #24):
    for every DF-capped posting-list candidate pair, band BOTH metrics
    into deciles and count the (containment_decile, jaccard_decile)
    grid — the off-diagonal mass IS the subset-duplicate population
    symmetric Jaccard under-scores (a short doc embedded in a long one
    dilutes the union but not the min), and missed_by_jaccard flags
    the operationally painful cell: containment >= 0.6 pairs a
    jaccard < 0.2 pipeline would never surface. Deciles are pure
    integer cross-multiplies ((10*n_shared) div size — positive, so
    DuckDB's flooring // and Spark's truncating div agree; never a
    float band edge). Same single shingle shuffle + capped pair
    generation as the graded jaccard/containment entries (cost is
    sum(freq^2) over capped shingles, never |docs|^2); output is the
    bounded <= 11x11 grid. Screened against dedup_ngram_containment:
    that entry LISTS the >= 0.6 pairs, this one grades the metric
    DISAGREEMENT surface the cutoff choice depends on."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    sh = shingle_rows(docs)
    buckets = materialize_reduced(
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") <= MAX_SHINGLE_DF)
    )
    sizes = buckets.select(F.explode("docs").alias("doc_id")).groupBy(
        "doc_id"
    ).agg(F.count("*").alias("n_sh"))
    pairs = (
        _posting_list_pairs(buckets.filter(F.size("docs") >= 2))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    banded = (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            F.expr(
                "CAST((10 * n_shared) div least(sa.n_sh, sb.n_sh)"
                " AS BIGINT)"
            ).alias("cont_decile"),
            F.expr(
                "CAST((10 * n_shared) div (sa.n_sh + sb.n_sh - n_shared)"
                " AS BIGINT)"
            ).alias("jac_decile"),
        )
    )
    return (
        banded.groupBy("cont_decile", "jac_decile")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .select(
            "cont_decile",
            "jac_decile",
            "n_pairs",
            (
                (F.col("cont_decile") >= 6) & (F.col("jac_decile") < 2)
            ).alias("missed_by_jaccard"),
        )
    )


# --- round 15 wave-3 pre-build: anchor pre-filter precision/recall ---------


@_q(
    "dedup_anchor_prefilter_audit",
    rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
      FROM documents WHERE TRIM(text) <> ''
    ), sh0 AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
               range(1, GREATEST(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
      FROM t WHERE len(toks) >= 3
    ), df AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ), sh AS (
      SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN df USING (shingle)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), truth AS (
      SELECT doc_a, doc_b
      FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= 0.2
    ), anch AS (
      SELECT doc_id,
             toks[1] || ' ' || toks[2] || ' ' || toks[3] AS f,
             toks[-3] || ' ' || toks[-2] || ' ' || toks[-1] AS l
      FROM t WHERE len(toks) >= 3
    ), keys AS (
      SELECT f, l FROM anch GROUP BY f, l
      HAVING COUNT(*) BETWEEN 2 AND {MAX_SHINGLE_DF}
    ), ap AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM anch a
      JOIN keys k ON k.f = a.f AND k.l = a.l
      JOIN anch b ON b.f = a.f AND b.l = a.l AND a.doc_id < b.doc_id
    ), hit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM ap JOIN truth USING (doc_a, doc_b)
    ), nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
    na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_anchor FROM ap)
    SELECT nt.n_truth, na.n_anchor, h.n_hit,
           CASE WHEN na.n_anchor > 0 THEN
             CAST(h.n_hit AS DOUBLE) / CAST(na.n_anchor AS DOUBLE)
           END AS precision,
           CASE WHEN nt.n_truth > 0 THEN
             CAST(h.n_hit AS DOUBLE) / CAST(nt.n_truth AS DOUBLE)
           END AS recall
    FROM nt, na, hit h
    """,
)
def dedup_anchor_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor pre-filter audit (ROADMAP_r15 #25): the O(1)-per-doc
    candidate generator — pair only documents sharing BOTH their first
    AND last trigram — graded as precision/recall against the graded
    truth scope (dedup_ngram_jaccard's DF-capped posting pairs at
    jaccard >= 0.2; defined FIRST, per the validate-first note). Each
    doc carries exactly one (first, last) anchor key, so the candidate
    join is a single groupBy on that key with the same
    {MAX_SHINGLE_DF}-cap skew guard as the posting lists (a boilerplate
    anchor shared by >cap docs is a stopword key, not dedup signal);
    cost is sum(freq^2) over capped anchor keys — two orders cheaper
    than the full posting join it pre-filters. High recall says the
    cheap pass can gate the expensive one; the census quantifies
    exactly what the shortcut trades. Exact counts, two guarded
    divisions, single-row output."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    # truth scope: the graded jaccard pipeline verbatim
    sh = shingle_rows(docs)
    buckets = materialize_reduced(
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") <= MAX_SHINGLE_DF)
    )
    sizes = buckets.select(F.explode("docs").alias("doc_id")).groupBy(
        "doc_id"
    ).agg(F.count("*").alias("n_sh"))
    pairs = (
        _posting_list_pairs(buckets.filter(F.size("docs") >= 2))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared")
    )
    truth = (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b")
    )
    # anchor candidates: one (first, last) trigram key per doc
    toks = F.split(_norm_text(F.col("text")), r"\s+")
    anch = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice(F.col("toks"), 1, 3)).alias("f"),
            F.concat_ws(" ", F.slice(F.col("toks"), -3, 3)).alias("l"),
        )
    )
    akeys = (
        anch.groupBy("f", "l")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(
            (F.size("docs") >= 2) & (F.size("docs") <= MAX_SHINGLE_DF)
        )
    )
    ap = _posting_list_pairs(akeys)
    n_hit = (
        ap.join(truth, ["doc_a", "doc_b"])
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    nt = truth.agg(F.count("*").cast("bigint").alias("n_truth"))
    na = ap.agg(F.count("*").cast("bigint").alias("n_anchor"))
    return (
        nt.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_truth",
            "n_anchor",
            "n_hit",
            F.when(
                F.col("n_anchor") > 0,
                F.col("n_hit").cast("double")
                / F.col("n_anchor").cast("double"),
            ).alias("precision"),
            F.when(
                F.col("n_truth") > 0,
                F.col("n_hit").cast("double")
                / F.col("n_truth").cast("double"),
            ).alias("recall"),
        )
    )
