"""Declarative job runner: compose the engine's operators from a config
dict — the scaled analog of the reference's orchestration layer
(/root/reference/src/etl_manager.py:50-97 hard-wires one read ->
transform -> load sequence; here the sequence is data).

A job spec is JSON-serializable, so curation pipelines (filter -> dedupe
-> sample -> write) can be versioned, diffed, and replayed:

    spec = {
        "source": {"table": "documents"},          # or {"csv": path} etc.
        "steps": [
            {"op": "quality_gate", "min_tokens": 5},
            {"op": "sample_hash", "key": "doc_id", "rate_hex": "80"},
            {"op": "dedupe_exact", "fingerprint": "md5(lower(trim(text)))"},
            {"op": "dedupe_neardup"},              # SimHash clusters, keep min id
            {"op": "split", "key": "doc_id"},      # train/val/test 80/10/10
            {"op": "shard", "key": "doc_id"},      # 16-way export shard
        ],
        "sink": {"path": "/out/docs", "partition_by": ["split"]},
    }
    run_job(spark, spec, sf_dir)

Every step maps to a declarative DataFrame transformation (the whole job
stays ONE lazy Catalyst plan until the sink); no step ever collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table, read_json, read_transactions_csv, write_table_partitioned


def _apply_step(df: DataFrame, step: dict) -> DataFrame:
    op = step["op"]
    if op == "filter":
        return df.filter(F.expr(step["expr"]))
    if op == "select":
        return df.select(*step["cols"])
    if op == "with_column":
        return df.withColumn(step["name"], F.expr(step["expr"]))
    if op == "sample_hash":
        # deterministic md5-prefix sample (see queries/sampling.py).
        # md5 hex is lowercase: an uppercase spec value would silently
        # select a drastically different fraction (ASCII 'A'-'F' sort
        # below 'a'-'f' and the digits), so normalize and validate first.
        rate_hex = str(step["rate_hex"]).lower()
        if not rate_hex or any(c not in "0123456789abcdef" for c in rate_hex):
            raise ValueError(
                f"sample_hash rate_hex must be a non-empty hex string, "
                f"got {step['rate_hex']!r}"
            )
        key = F.col(step["key"]).cast("string")
        return df.filter(
            F.substring(F.md5(key), 1, len(rate_hex)) < rate_hex
        )
    if op == "dedupe_exact":
        # first-by-order_col wins per fingerprint (deterministic when
        # order_col is unique); plain dropDuplicates when no order given
        fp = F.expr(step["fingerprint"])
        order_col = step.get("order_col")
        if order_col is None:
            return df.withColumn("__fp", fp).dropDuplicates(["__fp"]).drop("__fp")
        from pyspark.sql import Window

        w = Window.partitionBy(fp).orderBy(F.col(order_col))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if op == "repartition":
        return df.repartition(int(step["n"]))
    if op == "quality_gate":
        # length gate on whitespace tokens; stamps n_tokens for downstream
        # steps (budgeting, packing) so the count is computed once
        text_col = step.get("text_col", "text")
        min_tokens = int(step.get("min_tokens", 1))
        n_tokens = F.when(F.trim(F.col(text_col)) == "", 0).otherwise(
            F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        )
        return df.withColumn("n_tokens", n_tokens).filter(
            F.col("n_tokens") >= min_tokens
        )
    if op == "dedupe_neardup":
        # SimHash near-dup clusters -> keep the minimum id per cluster.
        # Pairs come from the exact-banded posting-list join
        # (queries.dedup.simhash_neardup_pairs); transitive closure via
        # min-label propagation; survivors selected by ANTI join, so the
        # payload columns never ride through the dedup shuffles.
        from .graph import connected_components
        from .queries.dedup import simhash_neardup_pairs

        id_col = step.get("id_col", "doc_id")
        pairs = simhash_neardup_pairs(
            df.select(F.col(id_col).alias("doc_id"), F.col(step.get("text_col", "text")).alias("text"))
        )
        clusters = connected_components(pairs, "doc_a", "doc_b")
        losers = clusters.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col)
        )
        return df.join(losers, id_col, "anti")
    if op == "dedupe_prefix":
        # truncation/extension dups: same lead-window fingerprint as the
        # graded dedup_prefix_truncation query; keep the minimum id per
        # prefix group via ANTI join (payload never rides the shuffle).
        # Docs shorter than the window are out of scope and always kept.
        from pyspark.sql import Window

        id_col = step.get("id_col", "doc_id")
        text_col = step.get("text_col", "text")
        n = int(step.get("prefix_tokens", 16))
        toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        eligible = df.filter(F.size(toks) >= n).select(
            F.col(id_col).alias("__id"),
            F.md5(F.concat_ws(" ", F.slice(toks, 1, n))).alias("__pfp"),
        )
        w = Window.partitionBy("__pfp")
        losers = (
            eligible.withColumn("__keep", F.min("__id").over(w))
            .filter(F.col("__id") != F.col("__keep"))
            .select(F.col("__id").alias(id_col))
        )
        return df.join(losers, id_col, "anti")
    if op == "novelty_gate":
        # keep documents whose distinct-8-gram novelty (fraction first
        # seen in this doc, by id order — the graded text_ngram_novelty
        # contract) clears the threshold; docs too short to carry an
        # 8-gram have no signal and are kept.
        from pyspark.sql import Window

        id_col = step.get("id_col", "doc_id")
        text_col = step.get("text_col", "text")
        min_novelty = float(step.get("min_novelty", 0.5))
        toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        g = (
            df.filter(F.size(toks) >= 8)
            .select(
                F.col(id_col).alias("__id"),
                F.explode(F.sequence(F.lit(1), F.size(toks) - 7)).alias("__i"),
                toks.alias("__toks"),
            )
            .select(
                "__id",
                F.md5(F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__i"), 8))).alias("__fp"),
            )
            .distinct()
        )
        first = F.min("__id").over(Window.partitionBy("__fp"))
        novel = F.sum(F.when(F.col("__first") == F.col("__id"), 1).otherwise(0))
        stale = (
            g.withColumn("__first", first)
            .groupBy("__id")
            .agg((novel.cast("double") / F.count("*")).alias("__novelty"))
            .filter(F.col("__novelty") < min_novelty)
            .select(F.col("__id").alias(id_col))
        )
        return df.join(stale, id_col, "anti")
    if op == "split":
        # deterministic 80/10/10 train/val/test assignment (md5-prefix
        # thresholds — self-assigning on ingest, no re-deal on growth).
        # The thresholds live in queries/helpers.py as the ONE split
        # contract shared with the graded export queries.
        from .queries.helpers import split_assign

        return df.withColumn(
            step.get("col", "split"), split_assign(F.col(step["key"]))
        )
    if op == "shard":
        # 16-way deterministic export shard (same shared contract)
        from .queries.helpers import shard_assign

        return df.withColumn(
            step.get("col", "shard"), shard_assign(F.col(step["key"]))
        )
    if op == "route_lexicon":
        # lexicon-density routing stamp (the text_lexicon_router
        # contract): routed = 1e6 * hits >= threshold_ppm * tokens,
        # decided by integer cross-multiplication — row-local array
        # filter, no explode
        text_col = step.get("text_col", "text")
        lex = step.get(
            "lexicon",
            ["key", "hash", "table", "scan", "merge", "sort", "batch",
             "index", "query", "join"],
        )
        threshold_ppm = int(step.get("threshold_ppm", 250000))
        toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        lex_arr = F.array(*[F.lit(t) for t in lex])
        n_tok = F.size(toks).cast("bigint")
        n_hit = F.size(
            F.filter(toks, lambda t: F.array_contains(lex_arr, t))
        ).cast("bigint")
        return df.withColumn(
            step.get("col", "routed"),
            (F.lit(1000000) * n_hit >= F.lit(threshold_ppm) * n_tok)
            & (n_tok > 0),
        )
    if op == "compression_gate":
        # zlib redundancy gate (the text_compression_ratio contract):
        # keep docs whose level-6 compression ratio (1e6 lattice) lies
        # in [min_fp, max_fp] — drops pathological boilerplate (too
        # compressible) and binary junk (incompressible) in one pass
        text_col = step.get("text_col", "text")
        min_fp = int(step.get("min_fp", 100000))
        max_fp = int(step.get("max_fp", 900000))

        def _ratios(batches):
            import zlib

            import pandas as pd  # noqa: F811

            for pdf in batches:
                orig = pdf[text_col].str.len().astype("int64").clip(lower=1)
                comp = pdf[text_col].map(
                    lambda t: len(zlib.compress((t or "").encode("utf-8"), 6))
                ).astype("int64")
                out = pdf.copy()
                out["compression_fp"] = (1000000 * comp // orig).astype(
                    "int64"
                )
                yield out

        import pyspark.sql.types as T

        schema = T.StructType(
            df.schema.fields
            + [T.StructField("compression_fp", T.LongType())]
        )
        scored = df.mapInPandas(_ratios, schema)
        return scored.filter(
            (F.col("compression_fp") >= min_fp)
            & (F.col("compression_fp") <= max_fp)
        )
    raise ValueError(f"unknown job step op: {op!r}")


def run_job(
    spark: SparkSession, spec: dict, sf_dir: str | None = None
) -> DataFrame:
    """Build the job's DataFrame; write it if the spec has a sink.

    Returns the final DataFrame either way (callers/tests can inspect the
    plan before any write happens).
    """
    src = spec["source"]
    if "table" in src:
        if sf_dir is None:
            raise ValueError("source.table requires sf_dir")
        df = load_table(spark, sf_dir, src["table"])
    elif "csv" in src:
        df = read_transactions_csv(spark, src["csv"])
    elif "json" in src:
        df = read_json(spark, src["json"], src.get("schema"))
    elif "parquet" in src:
        df = spark.read.parquet(src["parquet"])
    else:
        raise ValueError(f"unknown source spec: {src!r}")

    for step in spec.get("steps", []):
        df = _apply_step(df, step)

    sink = spec.get("sink")
    if sink:
        if "path" not in sink:
            raise ValueError(f"sink spec requires 'path': {sink!r}")
        if sink.get("partition_by"):
            write_table_partitioned(
                df, sink["path"], sink["partition_by"], mode=sink.get("mode", "overwrite")
            )
        else:
            df.write.mode(sink.get("mode", "overwrite")).parquet(sink["path"])
    return df
