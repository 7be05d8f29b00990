from .readers import (
    read_binary_files,
    read_csv,
    read_jdbc,
    read_json,
    read_orc,
    read_text,
    write_csv,
    write_json,
    write_orc,
)
from .schedule_source import ScheduleDataSource, register_schedule_source
from .sinks import (
    email_digest,
    json_log_sink,
    write_sized_parquet,
    write_zorder_parquet,
    zorder_value,
)

__all__ = [
    "ScheduleDataSource",
    "email_digest",
    "json_log_sink",
    "read_binary_files",
    "read_csv",
    "read_jdbc",
    "read_json",
    "read_orc",
    "read_text",
    "write_csv",
    "write_json",
    "write_orc",
    "write_sized_parquet",
    "write_zorder_parquet",
    "zorder_value",
    "register_schedule_source",
]
