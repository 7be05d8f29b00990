"""mlb_win_predictor_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference repo (straslerj/mlb-win-predictor, surveyed in /root/repo/SURVEY.md),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
MLlib pipelines for the model workload, Structured Streaming for the
incremental semantics, plus large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Layout
------
- ``session``    : SparkSession factory + testdata table loaders
- ``functions``  : scalar column-expression library (SURVEY §2.3)
- ``operators``  : composed relational/dataflow operators (joins, as-of,
                   upsert, dedup, similarity, text analysis)
- ``queries``    : the oracle-checked query catalog exported through
                   ``__spark_entry__.py``
- ``pipeline``   : the games ETL/feature-build replica (SURVEY §3 E1/E2)
- ``ml``         : MLlib pipelines + custom estimators (SURVEY §2.8)
- ``streaming``  : Structured Streaming semantics (SURVEY §2.7)
- ``sources``    : source/sink helpers (SURVEY §2.1)
"""

__version__ = "0.1.0"
