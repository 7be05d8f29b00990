"""Python UDTF surface (SURVEY §2.9 notes the reference has no UDTF; the
engine exposes explode/posexplode natively — this adds the *programmable*
table function path, Spark 4's Python UDTF API, for logic a lateral view
can't express).

``ShingleUDTF`` emits one row per word n-gram of an input text — the
Python-side dual of the native shingle expression in ``operators.dedup``
(which remains the hot path; a UDTF crosses the Python boundary per row
group and exists for extensibility, not throughput).
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="pos: int, shingle: string")
class ShingleUDTF:
    """eval() per input row, yield per output row — fully self-contained
    (no module-level references) so executors need nothing on sys.path."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n <= 0:
            return
        toks = text.strip().split()
        for i in range(max(len(toks) - n + 1, 0)):
            yield i + 1, " ".join(toks[i : i + n])


def shingles_via_udtf(spark, texts, n: int = 3):
    """Apply the UDTF laterally over a (doc_id, text) DataFrame."""
    texts.createOrReplaceTempView("_udtf_texts")
    spark.udtf.register("shingle_udtf", ShingleUDTF)
    _ = lit  # keep the import exercised for callers composing literals
    return spark.sql(
        f"""
        SELECT t.doc_id, s.pos, s.shingle
        FROM _udtf_texts t, LATERAL shingle_udtf(t.text, {int(n)}) s
        """
    )
