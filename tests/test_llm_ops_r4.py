"""Round-4 LLM-pipeline operators: bigram surprisal, BPE pair counts,
embedding dimension stats, export sharding, behavioral diversity. The
oracle diff covers value parity; these pin the semantic invariants the
oracle can't express."""

from __future__ import annotations

from large_csv_etl_spark.queries.events import QUERIES as EVENT_QUERIES
from large_csv_etl_spark.queries.sampling import QUERIES as SAMPLING_QUERIES
from large_csv_etl_spark.queries.similarity import QUERIES as SIM_QUERIES
from large_csv_etl_spark.queries.text import QUERIES as TEXT_QUERIES

from .conftest import SF_DIR_MID


def test_bigram_surprisal_counts_align_with_tokens(spark):
    """A doc with n tokens has exactly n-1 bigrams; novelty is bounded by
    the bigram count; the fixed-point sum is at least novel * 1e12 (every
    corpus-unique bigram contributes the full 1e12)."""
    sur = {
        r.doc_id: r
        for r in TEXT_QUERIES["text_bigram_surprisal"](spark, SF_DIR_MID).collect()
    }
    toks = {
        r.doc_id: r.n_tokens
        for r in TEXT_QUERIES["text_token_counts"](spark, SF_DIR_MID).collect()
    }
    assert sur, "no documents scored"
    for doc_id, r in sur.items():
        assert r.n_bigrams == toks[doc_id] - 1
        assert 0 <= r.novel_bigrams <= r.n_bigrams
        assert r.surprisal_fp_sum >= r.novel_bigrams * 1_000_000_000_000


def test_bpe_pair_counts_shape(spark):
    """Top pairs are 2-char strings in non-increasing frequency order."""
    rows = TEXT_QUERIES["text_bpe_pair_counts"](spark, SF_DIR_MID).collect()
    assert len(rows) == 40
    assert all(len(r.pair) == 2 for r in rows)
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert freqs[-1] > 0


def test_embedding_dim_stats_invariants(spark):
    """Every dimension sees the whole corpus; moments are consistent."""
    rows = SIM_QUERIES["embedding_dim_stats"](spark, SF_DIR_MID).collect()
    n_vecs = spark.read.parquet(f"{SF_DIR_MID}/embeddings.parquet").count()
    dims = sorted(r.dim for r in rows)
    assert dims == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.n == n_vecs
        assert r.min_val <= r.mean_val <= r.max_val
        # sum-of-squares identity can go epsilon-negative, never materially
        assert r.var_val >= -1e-9
        assert r.var_val <= (r.max_val - r.min_val) ** 2


def test_export_shards_partition_the_corpus(spark):
    """16 hex shards, disjoint and exhaustive over documents; token mass
    matches the corpus total."""
    rows = SAMPLING_QUERIES["sample_export_shards"](spark, SF_DIR_MID).collect()
    assert sorted(r.shard for r in rows) == sorted("0123456789abcdef")
    n_docs = spark.read.parquet(f"{SF_DIR_MID}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    total_tokens = sum(r.total_tokens for r in rows)
    toks = TEXT_QUERIES["text_token_counts"](spark, SF_DIR_MID).collect()
    assert total_tokens == sum(r.n_tokens for r in toks)


def test_type_diversity_bounds(spark):
    """Simpson diversity lies in [0, 1); 0 iff single-type users; counts
    cover every user exactly once."""
    rows = EVENT_QUERIES["events_type_diversity"](spark, SF_DIR_MID).collect()
    from large_csv_etl_spark.io import load_table

    n_users = (
        load_table(spark, SF_DIR_MID, "events").select("user_id").distinct().count()
    )
    assert len(rows) == n_users
    for r in rows:
        assert 0 <= r.simpson_diversity < 1
        assert (r.n_types == 1) == (r.simpson_diversity == 0)
        assert r.sum_sq >= r.n_events  # sum cnt^2 >= sum cnt


def test_filtered_topk_respects_gate(spark):
    """Every returned neighbor passes the quality gate, and scores are a
    subset-consistent restriction of the unfiltered ranking (no filtered
    score can beat the unfiltered top score)."""
    rows = SIM_QUERIES["sim_filtered_topk"](spark, SF_DIR_MID).collect()
    assert len(rows) == 10
    from large_csv_etl_spark.io import load_table
    from pyspark.sql import functions as F

    ok_ids = {
        r.doc_id
        for r in load_table(spark, SF_DIR_MID, "documents")
        .filter((F.trim(F.col("text")) != "") & (F.col("n_chars") >= 200))
        .select("doc_id")
        .collect()
    }
    assert all(r.vec_id in ok_ids for r in rows)
    top_unfiltered = SIM_QUERIES["sim_cosine_topk"](spark, SF_DIR_MID).collect()
    assert rows[0].cos_sim <= top_unfiltered[0].cos_sim + 1e-9


def test_token_pagerank_is_a_distribution(spark):
    """Float rank vector sums to ~1; the graded fixed-point twin conserves
    mass up to integer floor losses and agrees with the float ranks to
    fixed-point resolution; top-50 output is rank-sorted and deterministic
    across runs (fixed iteration count, integer arithmetic)."""
    from large_csv_etl_spark.graph import pagerank, pagerank_fixed
    from large_csv_etl_spark.io import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR_MID, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    arr = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    pairs = F.expr(
        "zip_with(slice(tokens, 1, size(tokens) - 1),"
        "         slice(tokens, 2, size(tokens) - 1),"
        "         (a, b) -> struct(a as src, b as dst))"
    )
    edges = (
        docs.select(arr.alias("tokens"))
        .filter(F.size("tokens") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.src", "p.dst")
    )
    ranks = pagerank(edges, n_iter=10)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6

    scale = 10**12
    fixed = pagerank_fixed(edges, n_iter=10, scale=scale)
    n_nodes = fixed.count()
    n_edges = edges.distinct().count()
    total_fp = fixed.agg(F.sum("rank_fp")).collect()[0][0]
    # Per round, floor losses are bounded per DIVISION, and the contrib
    # site divides once per distinct edge (rank_fp div outdeg loses up to
    # outdeg-1 units per source node, i.e. <= |E| total), while the
    # dangling/damping/base sites lose at most 1 unit per node each.
    assert scale >= total_fp > scale - 10 * (n_edges + 3 * n_nodes)
    # Fixed-point ranks track the float ranks to fixed-point resolution
    # (floor drift accumulates well below 1e-6 of mass on this graph).
    joined = (
        fixed.join(ranks, "node")
        .select(F.max(F.abs(F.col("rank_fp") / scale - F.col("rank"))))
        .collect()[0][0]
    )
    assert joined < 1e-6

    top = TEXT_QUERIES["graph_token_pagerank"](spark, SF_DIR_MID).collect()
    assert len(top) == min(50, n_nodes)
    vals = [r.rank_fp for r in top]
    assert vals == sorted(vals, reverse=True)
    again = TEXT_QUERIES["graph_token_pagerank"](spark, SF_DIR_MID).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in again]


def test_survivor_weights_conserve_corpus_mass(spark):
    """Sum of survivor weights equals the non-empty corpus size: dedup
    reassigns multiplicity, never loses it. Clustered survivors carry
    weight = cluster size; unclustered docs weight 1."""
    from large_csv_etl_spark.io import load_table
    from large_csv_etl_spark.queries.dedup import QUERIES as DQ
    from pyspark.sql import functions as F

    rows = DQ["dedup_survivor_weights"](spark, SF_DIR_MID).collect()
    n_docs = (
        load_table(spark, SF_DIR_MID, "documents")
        .filter(F.trim(F.col("text")) != "")
        .count()
    )
    assert sum(r.weight for r in rows) == n_docs
    assert all(r.weight >= 1 for r in rows)
    assert all((r.weight > 1) <= bool(r.was_clustered) for r in rows)
