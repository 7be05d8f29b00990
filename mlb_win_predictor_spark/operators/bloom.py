"""Distributed Bloom-filter build + vectorized probe.

The 100 TB decontamination pattern: the benchmark/eval gram set is tiny
by definition (an eval suite is MBs, the corpus is TBs), so it is
compressed into an ``m``-bit Bloom filter ONCE, broadcast to every
executor, and the corpus side is probed **map-only** — no join, no
shuffle — with an Arrow-batched pandas UDF doing numpy bit arithmetic.
Survivors (true overlaps + a ~2% false-positive tail) then flow into the
small exact re-check join, so end results are exactly the exact-join
answer while the heavy corpus scan never shuffles on gram.

Spark's own runtime-filter machinery uses the same shape
(``bloom_filter_agg`` + ``might_contain``), but those expressions are
not exposed as public SQL routines in PySpark 4.1, so the filter is
built here explicitly: Kirsch-Mitzenmacher double hashing derives the
``k`` probe positions from one xxhash64 value, identically at build and
probe time.

Reference parity: the reference pipeline has no decontamination step
(its corpus is API rows, ``src/function.py``); this extends the
driver-mandated LLM-pipeline surface (decontamination) with its
at-scale physical plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M = 1 << 17  # bits; 16 KiB — the MINIMUM broadcast size, not a cap
BLOOM_K = 5  # probe positions per key
BLOOM_BITS_PER_KEY = 10  # auto-sizing target: ~1% FPR at k=5
# design ceiling on per-probe fill: fill^k = FPR, 0.55^5 ~= 5% — past this
# the filter is under-sized for its key count and Bloom-only consumers
# (decontaminate_stream) would over-drop clean documents.
BLOOM_MAX_FILL = 0.55


def _positions(h: np.ndarray, i: int, m: int) -> np.ndarray:
    """Kirsch-Mitzenmacher: pos_i = (h1 + i*h2) mod m from one 64-bit
    hash (h1 = high 32 bits, h2 = low 32 bits forced odd). One formula,
    used verbatim by both build and probe."""
    h1 = h >> np.uint64(32)
    h2 = (h & np.uint64(0xFFFFFFFF)) | np.uint64(1)
    return (h1 + np.uint64(i) * h2) % np.uint64(m)


def bloom_build(keys: DataFrame, m: int | None = None, k: int = BLOOM_K) -> np.ndarray:
    """Build a Bloom bitset from a one-column DataFrame of xxhash64 longs.

    ``m`` defaults to AUTO: ~``BLOOM_BITS_PER_KEY`` bits per distinct key,
    rounded up to a power of two, floored at ``BLOOM_M`` — so a 25k-gram
    eval suite gets the classic 16 KiB filter while a 10M-gram suite gets
    a still-broadcastable ~16 MiB one instead of a saturated 16 KiB one
    whose FPR approaches 1 (which would make the Bloom-only streaming
    gate silently drop nearly everything). Probes never need to know
    ``m``: ``bloom_might_contain`` derives it from the bitset length, so
    build and probe cannot disagree.

    An explicitly passed ``m`` is honored but fill-checked: if the
    post-build fill factor exceeds ``BLOOM_MAX_FILL`` the build raises,
    because every downstream answer would be wrong-shaped (exact re-check
    paths merely lose pruning, but Bloom-only paths over-drop).

    The collect here is bounded by the FILTER side (the eval-suite gram
    set), never the corpus — same bounded-driver-state contract as
    ``operators/indexing.py`` (per-partition counts) and
    ``operators/similarity.py`` (n_cells centroids). At 100 TB the
    corpus never touches the driver; only the small set being compiled
    into the filter does.
    """
    col = keys.columns[0]
    hashes = np.array(
        [r[0] for r in keys.select(col).collect()], dtype=np.int64
    ).view(np.uint64)
    explicit_m = m is not None
    if m is None:
        target = max(BLOOM_M, BLOOM_BITS_PER_KEY * max(len(hashes), 1))
        m = 1 << (target - 1).bit_length()  # next power of two
    bits = np.zeros(m // 64, dtype=np.uint64)
    for i in range(k):
        pos = _positions(hashes, i, m)
        # repeated word indices must OR-accumulate, hence ufunc.at
        np.bitwise_or.at(bits, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))
    fill = float(np.unpackbits(bits.view(np.uint8)).sum()) / m
    if fill > BLOOM_MAX_FILL:
        hint = (
            "pass a larger m or let bloom_build auto-size"
            if explicit_m
            else "internal sizing bug"
        )
        raise ValueError(
            f"bloom filter saturated: fill={fill:.2f} > {BLOOM_MAX_FILL} "
            f"(m={m} bits for {len(hashes)} keys, FPR~{fill ** k:.1%}) — {hint}"
        )
    return bits


def bloom_might_contain(hash_col: str, bits_broadcast, k: int = BLOOM_K) -> Column:
    """Boolean probe column: True iff all k bit positions of
    ``hash_col`` are set in the broadcast bitset. Arrow-batched numpy —
    vectorized, map-only, no shuffle; ``bits_broadcast`` is a
    ``sc.broadcast`` of the ``bloom_build`` array so each executor
    deserializes the bitset once, not per task. ``m`` is derived from
    the bitset length (``len(bits) * 64``) so it always matches the
    build-time sizing, including auto-sized filters.

    Marked non-deterministic (r12 optimization, guide §4.4 pattern):
    the function IS deterministic, but a deterministic Python-UDF
    predicate gets copied around by the optimizer — in
    ``decontaminate_bloom``, InferFiltersFromConstraints propagated the
    probe across the gram equi-join onto the BENCH side, adding a whole
    ArrowEvalPython stage that probed every bench-doc gram row against
    the filter built FROM those grams (a guaranteed-True no-op by
    construction: Bloom filters have no false negatives). The flag
    pins the probe to exactly the one filter site each caller wrote;
    values are unchanged everywhere."""

    # deliberately self-contained (no module-level references): the UDF
    # body must unpickle on executors that never had this repo on
    # sys.path (the driver contract imports __spark_entry__ from a
    # foreign cwd) — a closure over module globals would make workers
    # try to import this package and die.
    @F.pandas_udf("boolean")
    def probe(h: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        bits = bits_broadcast.value
        m = bits.shape[0] * 64  # always the build-time m, auto-sized or not
        # HARD no-null contract: Spark evaluates pandas UDFs in their
        # own ArrowEvalPython node over EVERY row (an enclosing when()
        # can't shield them), and a batch containing a null arrives as
        # FLOAT64 — which silently rounds every int64 hash beyond 2^53
        # and would produce Bloom FALSE NEGATIVES for the whole batch
        # (contaminated docs passing the gate). There is no safe
        # recovery inside the UDF (the bits are already gone at the
        # Arrow→pandas boundary), so nulls fail loudly and callers
        # filter them out first (as decontaminate_stream does).
        if h.isna().any() or str(h.dtype) != "int64":
            raise ValueError(
                "bloom_might_contain requires a non-null bigint column: "
                f"got dtype={h.dtype} with {int(h.isna().sum())} nulls — "
                "filter nulls before the probe (float64 round-trip would "
                "corrupt hashes and yield false negatives)"
            )
        hv = h.to_numpy(dtype=_np.int64).view(_np.uint64)
        h1 = hv >> _np.uint64(32)
        h2 = (hv & _np.uint64(0xFFFFFFFF)) | _np.uint64(1)
        out = _np.ones(len(hv), dtype=bool)
        for i in range(k):
            pos = (h1 + _np.uint64(i) * h2) % _np.uint64(m)
            out &= (
                (bits[pos >> _np.uint64(6)] >> (pos & _np.uint64(63))) & _np.uint64(1)
            ).astype(bool)
        return _pd.Series(out)

    return probe.asNondeterministic()(F.col(hash_col))
