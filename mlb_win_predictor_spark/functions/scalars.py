"""Scalar column-expression library (SURVEY.md §2.3 D1-D11).

Every function here is a *native Catalyst expression builder* — no Python
UDFs — so whole-stage codegen applies and the expressions vectorize on the
executor. The reference implements each of these as a per-row Python
function with try/except->None error handling (reference src/function.py:58-346);
the Spark equivalents preserve the null-on-error semantics via explicit
``when`` guards (works under ANSI on or off).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def stable_round(col: Column | str, k: int) -> Column:
    """Cross-engine-stable rounding of a computed double.

    ``F.round(x, k)`` (exact-BigDecimal HALF_UP) and DuckDB ``ROUND(x, k)``
    (multiply-then-``std::round``) disagree when ``x*10^k`` lands on an
    exact .5 (common for small-denominator rationals like 27*er/outs).
    ``round(x*10^k)/10^k`` performs the identical IEEE ops on both engines
    — pair with the same idiom in oracle SQL (``queries.base.sround``).

    Domain: |x| < 2^52 / 10^k. Beyond that the scaled value's ulp
    exceeds 1, so the idiom is neither exact nor idempotent (it is
    still cross-engine IDENTICAL — the parity guarantee holds at any
    magnitude; only the mathematical rounding semantics degrade).
    Catalog uses are ratios, logs, and money magnitudes ≪ the bound.
    """
    scale = F.lit(float(10**k))
    return F.round(_c(col) * scale, 0) / scale


def md5_int32(col: Column | str) -> Column:
    """The repo's ENGINE-PORTABLE uniform integer hash: the first 8 hex
    digits of md5(col) as a long in [0, 2^32). Single-sourced here (r10
    review finding — the idiom was hand-rolled at five sites and each
    copy had to keep the substring length / base pair in sync with its
    DuckDB dual). SQL dual, verbatim:

        CAST(concat('0x', substr(md5(<same input>), 1, 8)) AS UBIGINT)

    The input is cast to STRING first (then binary), so any input type
    hashes its TEXT form — matching the documented VARCHAR contract
    (r10 advice: a raw numeric column cast straight to binary would
    hash big-endian bytes while the DuckDB dual hashes the decimal
    text, a silent cross-engine divergence). Callers no longer need to
    remember ``.cast("string")``; md5 hashes the UTF-8 bytes either
    way. Uniform enough for sampling gates, bucket hashes, and sketch
    rows; exact integer compares against thresholds avoid any float
    boundary (the ``balanced_mixture_sample`` discipline)."""
    return F.conv(
        F.substring(F.md5(_c(col).cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("long")


def md5_int60(col: Column | str) -> Column:
    """``md5_int32``'s wide sibling: the first 15 hex digits of md5(col)
    as a long in [0, 2^60) — the ENGINE-PORTABLE shingle/fingerprint
    hash (r11, the simhash / banded-minhash oracle promotions). 15 hex
    digits because the value must fit a SIGNED long on Spark and a
    BIGINT in DuckDB (16 digits can exceed 2^63); 60 bits keeps
    birthday collisions negligible at catalog scale (n²/2^61). SQL
    dual, verbatim:

        CAST(CAST(concat('0x', substr(md5(CAST(x AS VARCHAR)), 1, 15))
             AS UBIGINT) AS BIGINT)

    Same STRING-text contract as ``md5_int32``: the input is cast to
    string before binary, so both engines hash identical UTF-8 text."""
    return F.conv(
        F.substring(F.md5(_c(col).cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")


def guarded_div(num: Column | str, den: Column | str) -> Column:
    """D1 — NULL if denominator is 0 or NULL, else num/den.

    Parity with the reference's k_bb_ratio guard
    (modeling/eda.ipynb:451-465): ``NULL if bb_nine == 0 else k9/bb9``.
    Explicit ``when`` rather than relying on ANSI-off division.
    """
    num, den = _c(num), _c(den)
    return F.when((den.isNull()) | (den == 0), F.lit(None)).otherwise(num / den)


def k_bb_diff(strikeouts: Column | str, walks: Column | str, batters_faced: Column | str) -> Column:
    """D4 — K% − BB% = SO/BF − BB/BF (reference src/function.py:269-276)."""
    bf = _c(batters_faced)
    return guarded_div(_c(strikeouts), bf) - guarded_div(_c(walks), bf)


def babip(
    hits: Column | str,
    home_runs: Column | str,
    at_bats: Column | str,
    strikeouts: Column | str,
    sac_flies: Column | str,
) -> Column:
    """D5 — (H−HR)/(AB−SO−HR+SF) (reference src/function.py:335-337)."""
    h, hr, ab, so, sf = (_c(x) for x in (hits, home_runs, at_bats, strikeouts, sac_flies))
    return guarded_div(h - hr, ab - so - hr + sf)


def decode_ip_str(ip: Column | str) -> Column:
    """D6 — innings-pitched base-3 decode, string form.

    MLB IP strings use ``.1``/``.2`` to mean outs: ``"123.2"`` -> 123.6
    (the fractional out count × 3, as tenths). The reference does this with
    string surgery on the split decimal part (src/function.py:186-192).
    Native expression: split on '.', rebuild with outs*3 as the tenths digit.
    Invalid input -> NULL (try-cast semantics).
    """
    s = _c(ip).cast("string")
    parts = F.split(s, r"\.")
    whole = F.element_at(parts, 1).cast("long")
    outs = F.when(F.size(parts) >= 2, F.element_at(parts, 2).cast("long")).otherwise(F.lit(0))
    decoded = whole.cast("double") + (outs * 3).cast("double") / F.lit(10.0)
    return F.when(whole.isNull() | outs.isNull() | (outs > 2) | (outs < 0), F.lit(None)).otherwise(
        decoded
    )


def decode_ip(ip: Column | str) -> Column:
    """D6 — base-3 IP decode for a numeric column (frac ∈ {.0,.1,.2})."""
    x = _c(ip).cast("double")
    whole = F.floor(x)
    outs = F.round((x - whole) * 10, 0).cast("long")
    return F.when(x.isNull() | (outs > 2), F.lit(None)).otherwise(
        whole.cast("double") + (outs * 3).cast("double") / F.lit(10.0)
    )


def era_fmt(era: Column | str) -> Column:
    """D7 — ERA fixed to 2 decimals (reference src/function.py:87 formats
    ``format(float(x), '.2f')`` — decimal semantics by string formatting)."""
    return F.round(_c(era).cast("double"), 2)


def win_pct_fmt(wp: Column | str) -> Column:
    """D7 — win percentage fixed to 3 decimals (src/function.py:110)."""
    return F.round(_c(wp).cast("double"), 3)


def home_win_label(winning_team: Column | str, home_team_id: Column | str) -> Column:
    """D3 — binary label: 1 if home team won else 0
    (modeling/eda.ipynb:628, cell 27)."""
    return F.when(_c(winning_team) == _c(home_team_id), F.lit(1)).otherwise(F.lit(0))


def s3_log_key(ts: Column | str, suffix: str) -> Column:
    """D8 — timestamp -> S3-safe object key: 19-char truncation with
    ``' '``->``'_'``, ``':'``->``'-'`` then a suffix
    (reference src/function.py:42,529,638)."""
    t = _c(ts)
    base = F.date_format(t, "yyyy-MM-dd_HH-mm-ss")
    return F.concat(base, F.lit(suffix))


def html_li(item: Column | str) -> Column:
    """D10 — wrap a value in an HTML list item (src/function.py:371-375)."""
    return F.concat(F.lit("<li>"), _c(item).cast("string"), F.lit("</li>"))
