"""Format readers/writers (SURVEY §2.1 S5-S7, S10).

Explicit-schema discipline throughout: ``inferSchema`` re-scans the data
and guesses types per run — at 100 TB that is both a second full pass and
a correctness hazard, so every reader takes a DDL/StructType schema.

The reference's PostgreSQL scan (S5) maps to ``spark.read.jdbc`` in
deployment; no database exists in this container, so ``read_jdbc`` builds
the reader config and is exercised only for its option plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(spark: SparkSession, path: str, schema: str, **options) -> DataFrame:
    opts = {"header": "true", "mode": "PERMISSIVE", **options}
    return spark.read.schema(schema).options(**opts).csv(path)


def read_json(spark: SparkSession, path: str, schema: str, **options) -> DataFrame:
    return spark.read.schema(schema).options(**options).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC source — same columnar pushdown/pruning contract as parquet
    (PushedFilters/ReadSchema), the common interchange format of
    Hive-era warehouses. Schema travels in the footer, so no DDL needed."""
    return spark.read.options(**options).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row", **options
) -> DataFrame:
    """XML source (native in Spark 4 — the merged spark-xml module): one
    row per ``row_tag`` element, schema inferred or supplied. The landing
    format of feed/sitemap/API-dump ingestion. Files split per-element,
    so a directory of XML dumps parallelizes like any other file source;
    prefer converting to parquet at the ingest boundary — XML has no
    column pruning or predicate pushdown."""
    return (
        spark.read.format("xml").option("rowTag", row_tag).options(**options).load(path)
    )


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    df.write.format("xml").option("rowTag", row_tag).option(
        "rootTag", root_tag
    ).mode(mode).save(path)


def read_text(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    """Raw text source: one row per line (or per file with
    ``wholetext``) in a single ``value`` column — the landing format of a
    web-crawl / log-scrape corpus before parsing."""
    return spark.read.option("wholetext", str(wholetext).lower()).text(path)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile source: (path, modificationTime, length, content) with
    the raw bytes in ``content`` — the ingestion path for image/audio
    media into the multimodal column (operators.multimodal
    ``to_media_column``). File listing parallelizes across executors;
    content is read lazily per task, so a 100 TB media lake streams
    without driver involvement."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options,
):
    """S5 — the ``select * from games`` scan as a parallel JDBC read.

    With (partition_column, bounds, num_partitions) Spark issues
    ``num_partitions`` range-sliced queries instead of one cursor — the
    fix for the reference's single-threaded fetchall
    (modeling/eda.ipynb:71). Returns the configured reader (unresolved —
    resolving requires a live database, absent in this container).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader
