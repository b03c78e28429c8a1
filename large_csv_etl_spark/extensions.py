"""U1 chunk-map extension point (SURVEY.md §2a U1).

The reference's one plugin surface is ``transform_func: Callable[[pd.
DataFrame], Optional[pd.DataFrame]]`` applied per chunk with skip-bad-chunk
fault isolation (/root/reference/src/file_manager.py:70-103: any exception
-> log + drop that chunk, pipeline continues). The exact Spark analog is
``DataFrame.mapInPandas`` — the callable sees an iterator of pandas
DataFrames (Arrow batches = the chunks), and per-batch failure isolation is
reproduced by catching per-batch exceptions instead of failing the task.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)


def apply_chunk_transform(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame | None],
    schema: str,
    skip_bad_chunks: bool = True,
) -> DataFrame:
    """Apply an arbitrary pandas-DataFrame -> DataFrame plugin per Arrow
    batch (U1).

    ``fn`` returning None drops the batch (the reference's empty-chunk
    early-out). With ``skip_bad_chunks`` (the reference's E3 semantics) an
    exception in ``fn`` drops that batch and the job continues; with it
    off, the exception propagates and Spark's normal retry-then-fail task
    semantics apply.

    Arrow batch size (`spark.sql.execution.arrow.maxRecordsPerBatch`,
    default 10k) is the chunk_size analog.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # import inside the closure: referencing the module-level logger
        # would make cloudpickle serialize this function as a reference to
        # large_csv_etl_spark, which executor workers can't always import
        import logging as _logging

        for pdf in batches:
            try:
                out = fn(pdf)
            except Exception:
                if not skip_bad_chunks:
                    raise
                _logging.getLogger("large_csv_etl_spark.extensions").exception(
                    "chunk transform failed; dropping batch"
                )
                continue
            if out is not None and len(out):
                yield out

    return df.mapInPandas(run, schema)


def split_text_udtf():
    """A Python UDTF (Spark 4 ``udtf``) — the table-function flavor of the
    U1 extension point: one input row expands to N output rows, with the
    expansion logic in plain Python. Demonstrated as a whitespace
    chunker; register with ``spark.udtf.register("split_chunks", ...)``
    or call inline.

    UDTFs are the slow path (per-row Python), kept strictly as an
    extension surface — the equivalent hot-path plan is the
    sequence+explode+slice used by ``text_chunk_documents``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_start int, chunk_text string")
    class SplitChunks:
        def eval(self, text: str, size: int, stride: int):
            if text is None:
                return
            toks = text.split()
            if not toks:
                yield 0, ""
                return
            for start in range(0, len(toks), stride):
                yield start, " ".join(toks[start : start + size])

    return SplitChunks
