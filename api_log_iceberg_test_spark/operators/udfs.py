"""The user-extensibility surface: vectorized (Arrow) Pandas UDFs.

The reference exposes no UDF hooks (SURVEY.md §2.5); this module defines the
engine's sanctioned extension points and demonstrates each kind:

- scalar Pandas UDF (`sigmoid_score`) — batch-vectorized numpy math;
- grouped-agg Pandas UDF (`median_udaf`) — custom aggregation;
- ``mapInPandas`` kernels live in :mod:`multimodal` (media decode).

Per the engine's performance stance, built-in Column expressions are always
preferred in hot paths; Pandas UDFs are the escape hatch when the logic
needs numpy/real Python — they move data via Arrow in columnar batches
(~10-100× faster than row-at-a-time Python UDFs, which this engine never
uses).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

# UDFs are constructed lazily: @pandas_udf at import time requires an active
# SparkSession (return-type DDL parsing), and this module must be importable
# before any session exists (driver contract).


def _sigmoid(v: pd.Series) -> pd.Series:
    return 1.0 / (1.0 + np.exp(-v / 100.0))


def sigmoid_score(col: Column) -> Column:
    """Vectorized logistic score: 1 / (1 + exp(-v/100)) as a scalar Pandas UDF.

    Deterministic per-row math → exactly replicable in the SQL oracle,
    which makes this a differential test of the whole Arrow round-trip.
    """
    return pandas_udf(_sigmoid, "double")(col)


def _median(v: pd.Series) -> float:
    return float(v.median())


def median_udaf(col: Column) -> Column:
    """Grouped-aggregate Pandas UDF: exact median of a group."""
    return pandas_udf(_median, "double")(col)


def token_stats_udtf():
    """Python UDTF (Spark 4 table function): explode a document into
    per-token rows with position and length — the lateral-join extension
    point for logic that yields a VARIABLE number of rows per input.

    Built-in alternative shown in :func:`tfidf.tfidf_top_terms` is
    posexplode; the UDTF form is the sanctioned hook when per-row Python is
    genuinely needed. ``useArrow=True`` keeps the per-row eval() authoring
    model but ships rows over Arrow batches instead of pickled rows
    (ArrowEvalPythonUDTF vs BatchEvalPythonUDTF in the plan) — the last
    row-at-a-time transfer in the registry. Returned lazily (class, not
    instance) so this module imports without an active SparkSession.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int, tok_len: int", useArrow=True)
    class TokenStats:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.strip().lower().split()):
                yield tok, i, len(tok)

    return TokenStats


def rolling_median(
    df,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int = 50,
):
    """Per-key trailing-``window`` rolling MEDIAN via ``applyInPandas``.

    The built-in route — an exact percentile aggregate over a ROWS frame —
    makes WindowExec recompute the full frame sort per row: O(rows ×
    window log window) per key, the quadratic-ish trap the rolling z-score
    rewrite already documented for mean/std. Those had an algebraic
    retraction fix (cumsum minus lag); ORDER STATISTICS don't retract
    algebraically, so the scale path is a per-key Arrow batch where
    pandas' rolling median maintains a sliding multiset in
    O(rows log window). Groups must fit an executor's memory — the
    per-key time series in a log pipeline does. If one doesn't, sub-split
    the key by time range WITH a ``window-1``-row overlap carried into
    each chunk (compute, then drop each chunk's first ``window-1``
    outputs): a plain time split would silently restart every frame at
    the chunk boundary.

    min_periods=1: warm-up rows get the median of what exists so far,
    matching the SQL frame spec exactly (``quantile_cont`` over ROWS
    window-1 PRECEDING..CURRENT). Output: key, order cols, value, and
    ``rolling_med`` rounded to 6dp.
    """
    import pandas as pd  # noqa: F401 — worker-side import

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(key_col, *order_cols, value_col).schema.fields
    )
    schema = f"{out_fields}, rolling_med double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        med = pdf[value_col].rolling(window, min_periods=1).median()
        pdf = pdf[[key_col, *order_cols, value_col]].copy()
        pdf["rolling_med"] = med.round(6).values
        return pdf

    return (
        df.select(key_col, *order_cols, value_col)
        .groupBy(key_col)
        .applyInPandas(fn, schema)
    )


def ks_two_sample_cogrouped(
    ref,
    cur,
    key_col: str,
    value_col: str,
):
    """Two-sample Kolmogorov–Smirnov statistic per key via
    ``groupBy().cogroup().applyInPandas`` — the Spark API for aligning TWO
    tables' groups in one Arrow-batched function, which fits KS exactly:
    the statistic needs both samples of a key side by side (max gap
    between their empirical CDFs), and neither a join nor a union
    expresses "give me both groups at once" as directly.

    KS = max_v |ECDF_ref(v) − ECDF_cur(v)| over the pooled values,
    evaluated with numpy searchsorted; keys missing one side yield NULL
    (no drift statement possible). Groups must fit executor memory —
    per-key samples of a drift check do; the SQL oracle states the same
    definition via windowed cumulative counts.
    """
    import numpy as np
    import pandas as pd

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        key = (left[key_col].iloc[0] if len(left) else right[key_col].iloc[0])
        # Catalyst prunes the cogroup inputs to the grouping key alone
        # when the UDF's OUTPUT values are unobservable (a bare count()
        # crashed here with KeyError — r08 vacuousness audit). The row
        # count per cogroup is 1 in every branch below, so emitting the
        # null-stat row for a pruned input is exact for such consumers.
        # Pruned-side contract (ADVICE r08): n_ref/n_cur are ALWAYS the
        # true group sizes — len() works on the key-only frame — so only
        # the statistic degrades to NULL; "pruned input" is never
        # conflated with "empty side". (Unobservable today: a consumer
        # that reads the counts forces the full input; the contract is
        # declared so any future pruning shape stays truthful.)
        a = (
            np.sort(left[value_col].to_numpy(dtype="float64"))
            if len(left) and value_col in left.columns
            else None
        )
        b = (
            np.sort(right[value_col].to_numpy(dtype="float64"))
            if len(right) and value_col in right.columns
            else None
        )
        if a is None or b is None or len(a) == 0 or len(b) == 0:
            return pd.DataFrame(
                {key_col: [key], "n_ref": [len(left)],
                 "n_cur": [len(right)], "ks": [None]}
            )
        pooled = np.concatenate([a, b])
        cdf_a = np.searchsorted(a, pooled, side="right") / len(a)
        cdf_b = np.searchsorted(b, pooled, side="right") / len(b)
        ks = round(float(np.max(np.abs(cdf_a - cdf_b))), 6)
        return pd.DataFrame(
            {key_col: [key], "n_ref": [len(a)], "n_cur": [len(b)], "ks": [ks]}
        )

    schema = f"{key_col} string, n_ref long, n_cur long, ks double"
    return (
        ref.groupBy(key_col)
        .cogroup(cur.groupBy(key_col))
        .applyInPandas(fn, schema)
    )
