"""Pandas UDF / UDAF / grouped-map surface (SURVEY §2.9).

The engine's hot paths are native expressions; these exist for the cases
that genuinely need Python semantics, in their Arrow-batched (never
row-at-a-time) forms:

- ``grouped_median_udaf``     : GROUPED_AGG pandas UDF (the evaluate()-
  shaped UDAF construct of SURVEY §2.9)
- ``standardize_per_group``   : grouped-map ``applyInPandas`` (per-group
  fit/transform, the sklearn-scaler-per-family pattern)

All closures are self-contained: workers need nothing on sys.path.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf reads
# the REAL type hints (pd.Series -> float) to infer the GROUPED_AGG
# eval type; stringified annotations break the inference.
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_median(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Median per group via a GROUPED_AGG pandas UDF (Arrow-batched)."""

    @F.pandas_udf("double")
    def _median(v: pd.Series) -> float:
        return float(v.median())

    return df.groupBy(group_col).agg(_median(F.col(value_col)).alias("median_value"))


def grouped_median_arrow(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Median per group via ``applyInArrow`` (Spark 4): the Python worker
    receives each group as a raw ``pyarrow.Table`` — no Arrow→pandas
    materialization at all, the cheapest possible Python boundary for
    grouped custom logic. Equivalence with the pandas GROUPED_AGG path is
    pytest-pinned; at 100 TB prefer this shape for wide groups (zero
    per-group pandas object overhead).

    Closure is self-contained (local imports only). The group column's
    output type is derived from the input schema (NOT hardcoded), so
    non-string keys — e.g. a long user_id — round-trip unchanged."""
    group_type = df.schema[group_col].dataType.simpleString()

    def _median(table):
        import numpy as _np
        import pyarrow as _pa

        vals = table.column(value_col).to_numpy(zero_copy_only=False)
        key_arr = table.column(group_col).slice(0, 1).combine_chunks()
        return _pa.table(
            {
                group_col: key_arr,
                "median_value": _pa.array(
                    [float(_np.median(vals[~_np.isnan(vals)]))], type=_pa.float64()
                ),
            }
        )

    return df.select(group_col, value_col).groupBy(group_col).applyInArrow(
        _median, schema=f"{group_col} {group_type}, median_value double"
    )


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints via a true ROLLING hash (the
    substring-level dedup primitive; md5 covers whole-document identity).

    Rabin-Karp polynomial hash over every k-char window, then the MIN
    hash per sliding window of ``window`` positions (winnowing) — two
    documents sharing a k-char substring share a fingerprint with
    guaranteed detection for matches >= k + window - 1 chars. Vectorized
    pandas UDF (numpy rolling-hash recurrence), self-contained closure.
    """

    @F.pandas_udf("array<long>")
    def _winnow(texts: pd.Series) -> pd.Series:
        import numpy as _np

        B, M = 257, (1 << 61) - 1

        def fp(s):
            if s is None or len(s) < k:
                return []
            codes = _np.frombuffer(s.encode("utf-8", "ignore"), dtype=_np.uint8)
            n = len(codes) - k + 1
            if n <= 0:
                return []
            # rolling recurrence: h[i+1] = (h[i] - c[i]*B^(k-1))*B + c[i+k]
            powk = pow(B, k - 1, M)
            hs = _np.empty(n, dtype=_np.int64)
            h = 0
            for c in codes[:k]:
                h = (h * B + int(c)) % M
            hs[0] = h
            for i in range(1, n):
                h = ((h - int(codes[i - 1]) * powk) * B + int(codes[i + k - 1])) % M
                hs[i] = h
            if n <= window:
                return [int(hs.min())]
            mins = {
                int(hs[i : i + window].min()) for i in range(n - window + 1)
            }
            return sorted(mins)

        return texts.map(fp)

    return df.select(id_col, _winnow(F.col(text_col)).alias("fingerprints"))


def standardize_per_group(
    df: DataFrame, group_col: str, value_cols: list[str]
) -> DataFrame:
    """Per-group z-score standardization via applyInPandas: each group's
    pandas frame is scaled with its own mean/std (ddof=0, sklearn
    semantics — the scaler the reference fits per feature family,
    modeling/modeling.ipynb:144). The group column's output type comes
    from the input schema, so non-string keys pass through unchanged."""
    out_schema = ", ".join(
        [f"{group_col} {df.schema[group_col].dataType.simpleString()}"]
        + [f"{c} double" for c in value_cols]
    )
    cols = list(value_cols)

    def scale(pdf):
        import pandas as _pd  # noqa: F401

        for c in cols:
            std = pdf[c].std(ddof=0)
            pdf[c] = 0.0 if std == 0 else (pdf[c] - pdf[c].mean()) / std
        return pdf

    return df.select(group_col, *value_cols).groupBy(group_col).applyInPandas(
        scale, schema=out_schema
    )


def arrow_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Ungrouped ``mapInArrow`` (Spark 4) — the remaining cell of the
    Arrow-boundary matrix (scalar pandas_udf / GROUPED_AGG / mapInPandas
    / applyInPandas / applyInArrow are covered elsewhere): each partition
    streams through the Python worker as raw ``pyarrow.RecordBatch``es,
    processed with vectorized ``pyarrow.compute`` kernels — no pandas
    objects anywhere on the path. Per doc: byte length, whitespace token
    count, distinct-token count.

    This is the template for C-speed Python transforms whose kernels
    exist in pyarrow.compute (tokenize-and-count here); equality with the
    native-expression counts is pytest-pinned, so the two paths can't
    drift."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            text = t.column(text_col)
            trimmed = pc.utf8_trim_whitespace(text)
            toks = pc.split_pattern_regex(trimmed, r"\s+")
            n_tok = pc.list_value_length(toks).cast(pa.int64())
            # single-space corpus: token chars = len(trimmed) − (n−1)
            mean_len = pc.divide(
                pc.cast(
                    pc.add(pc.subtract(pc.binary_length(trimmed), n_tok), 1),
                    pa.float64(),
                ),
                pc.cast(n_tok, pa.float64()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    t.column(id_col).combine_chunks(),
                    pc.binary_length(text).cast(pa.int64()).combine_chunks(),
                    n_tok.combine_chunks(),
                    mean_len.combine_chunks(),
                ],
                names=[id_col, "n_bytes", "n_tokens", "mean_token_len"],
            )

    return df.select(id_col, text_col).mapInArrow(
        stats, schema=f"{id_col} long, n_bytes long, n_tokens long, mean_token_len double"
    )


def compression_ratio(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc zlib compression ratio (compressed/raw bytes) — the
    RefinedWeb/Gopher-style repetition-and-boilerplate quality signal:
    highly repetitive or templated text compresses far below natural
    prose, random-unique noise barely compresses at all. Byte-level DEFLATE
    is genuinely Python (no Catalyst dual), so this is an Arrow-batched
    pandas UDF like the multimodal codecs — the batch crosses the
    boundary once, the loop is per-string zlib, and the result is a
    map-only column: scales as a narrow corpus pass.

    Closure is self-contained (imports inside) so it unpickles on
    executors without this repo on sys.path — the driver-contract
    lesson from operators/bloom.py."""

    @F.pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if not t:
                return 1.0  # empty string: nothing to compress, neutral
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        # null text stays NULL (na_action skips None AND the NaN
        # object-dtype fallback, which would otherwise hit t.encode()
        # and fail the whole Arrow batch): a missing document has no
        # repetition signal and must not masquerade as ratio=1.0 —
        # downstream quality gates decide how to treat it.
        return texts.map(one, na_action="ignore")

    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        _ratio(F.col(text_col)).alias("compression_ratio"),
    )
