"""Custom Python Data Source: the daily-schedule REST scan (SURVEY §2.1 S1).

The reference scans ``statsapi.schedule(date)`` over HTTP
(src/function.py:473,552). The production Spark analog is the Python Data
Source API (Spark 4): a partition-aware reader the planner can
parallelize and (at scale) push a date filter into. The container has no
network, so the fetch body is a deterministic synthetic generator keyed
by the requested date — the SOURCE PLUMBING (schema declaration,
partition planning, per-partition iteration) is the real thing; swap
``_fetch_games`` for an HTTP call in deployment.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEDULE_SCHEMA = StructType(
    [
        StructField("game_id", LongType()),
        StructField("game_date", StringType()),
        StructField("home_team_id", LongType()),
        StructField("away_team_id", LongType()),
        StructField("home_pitcher", StringType()),
        StructField("away_pitcher", StringType()),
        StructField("venue", StringType()),
    ]
)


def _fetch_games(date: str, shard: int, n_shards: int) -> list[tuple]:
    """Deterministic stand-in for the HTTP schedule fetch: ~15 games per
    date, sharded across partitions. Seeded by (date, game index) so every
    run and every engine sees identical rows."""
    digest = int(hashlib.md5(date.encode()).hexdigest()[:8], 16)
    games = []
    for i in range(15):
        if i % n_shards != shard:
            continue
        gid = 800000 + (digest % 10000) * 20 + i
        home = 108 + (digest + i) % 30
        away = 108 + (digest + i * 7 + 1) % 30
        if away == home:
            away = 108 + (away - 108 + 1) % 30
        games.append(
            (
                gid,
                date,
                home,
                away,
                f"Pitcher {(digest + i) % 120:03d}",
                f"Pitcher {(digest + i * 3 + 5) % 120:03d}",
                f"Stadium {(digest + i) % 28}",
            )
        )
    return games


class SchedulePartition(InputPartition):
    def __init__(self, shard: int, n_shards: int, date: str):
        self.shard = shard
        self.n_shards = n_shards
        self.date = date


class ScheduleReader(DataSourceReader):
    def __init__(self, options):
        self.date = options.get("date", "2023-08-25")
        self.n_shards = int(options.get("numPartitions", "4"))

    def partitions(self):
        return [
            SchedulePartition(i, self.n_shards, self.date) for i in range(self.n_shards)
        ]

    def read(self, partition: SchedulePartition):
        yield from _fetch_games(partition.date, partition.shard, partition.n_shards)


class ScheduleDataSource(DataSource):
    """spark.read.format("mlb_schedule").option("date", "8/25/2023")"""

    @classmethod
    def name(cls) -> str:
        return "mlb_schedule"

    def schema(self):
        return SCHEDULE_SCHEMA

    def reader(self, schema):
        return ScheduleReader(self.options)

    def streamReader(self, schema):
        return ScheduleStreamReader(self.options)


def register_schedule_source(spark) -> None:
    spark.dataSource.register(ScheduleDataSource)


class ScheduleStreamReader(DataSourceStreamReader):
    """Streaming flavor of the schedule scan — the production shape of
    the reference's daily 5:00 AM poll (src/function.py:15-21,652-687):
    each offset ordinal is one calendar day after ``startDate``; a
    micro-batch covers the (dates × shards) grid of its offset range, so
    the planner reads every day's shards in parallel and exactly-once
    tracking comes free from the offset log. ``maxDates`` bounds the
    synthetic feed so availableNow terminates in tests; in deployment
    ``latestOffset`` returns today's ordinal and the query just keeps
    tailing."""

    def __init__(self, options):
        self.start_date = options.get("startDate", "2023-08-25")
        self.n_shards = int(options.get("numPartitions", "4"))
        self.max_dates = int(options.get("maxDates", "3"))

    def _date_for(self, ordinal: int) -> str:
        from datetime import date, timedelta

        y, m, d = (int(x) for x in self.start_date.split("-"))
        return (date(y, m, d) + timedelta(days=ordinal)).isoformat()

    def initialOffset(self):
        return {"ordinal": 0}

    def latestOffset(self):
        return {"ordinal": self.max_dates}

    def partitions(self, start, end):
        return [
            SchedulePartition(shard, self.n_shards, self._date_for(o))
            for o in range(start["ordinal"], end["ordinal"])
            for shard in range(self.n_shards)
        ]

    def read(self, partition: SchedulePartition):
        yield from _fetch_games(partition.date, partition.shard, partition.n_shards)

    def commit(self, end):
        pass
