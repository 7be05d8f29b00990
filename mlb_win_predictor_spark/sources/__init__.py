from .schedule_source import ScheduleDataSource, register_schedule_source
from .sinks import email_digest, json_log_sink, write_sized_parquet

__all__ = [
    "ScheduleDataSource",
    "email_digest",
    "json_log_sink",
    "write_sized_parquet",
    "register_schedule_source",
]
