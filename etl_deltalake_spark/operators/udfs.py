"""Vectorized (Arrow-batched) pandas UDFs — the engine's sanctioned
Python escape hatch (SURVEY §2.6: replaces the reference's iterrows
loops, main.py:502, 537-539).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the eval type from REAL ``pd.Series`` annotations; stringified
hints break the inference.

Row-at-a-time ``F.udf`` is banned from hot paths; these run one
Python invocation per Arrow batch (~10-100× less crossing overhead),
pipeline scan-side, and need no shuffle.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("bigint")
def n_chars(s: pd.Series) -> pd.Series:
    """Character count via the vectorized pandas string kernel."""
    return s.str.len().astype("int64")


@pandas_udf("bigint")
def n_spaces(s: pd.Series) -> pd.Series:
    """Space count — stands in for any per-string Python metric."""
    return s.str.count(" ").astype("int64")


from etl_deltalake_spark.operators.text import (  # noqa: E402
    sentence_spans_py,  # re-export: the shared split lives in text.py
)


def sentence_spans_udtf():
    """Python UDTF (Spark 4 table-function surface): split a
    document into sentence spans with character offsets — one output
    row per sentence, lateral-joinable against the documents table.

    UDTFs complete the extension-surface triad (scalar pandas_udf,
    grouped applyInPandas/mapInPandas, and table functions). Like
    any Python UDF this is the slow path — one interpreter call per
    input row — so it belongs in enrichment stages, not hot scans;
    the sentence split itself is intentionally simple/deterministic
    (., !, ? terminators) so tests pin exact spans.

    Returned lazily from a factory because @udtf-decorated classes
    capture the active SparkSession at decoration time.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: bigint, start_pos: bigint, end_pos: bigint, sentence: string")
    class SentenceSpans:
        def eval(self, text: str):
            if text is None:
                return
            for idx, (start, end, seg) in enumerate(sentence_spans_py(text)):
                yield idx, start, end, seg

    return SentenceSpans
