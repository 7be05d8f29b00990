from .scalars import (
    babip,
    decode_ip,
    decode_ip_str,
    era_fmt,
    guarded_div,
    home_win_label,
    html_li,
    k_bb_diff,
    s3_log_key,
    stable_round,
    win_pct_fmt,
)

__all__ = [
    "babip",
    "decode_ip",
    "decode_ip_str",
    "era_fmt",
    "guarded_div",
    "home_win_label",
    "html_li",
    "k_bb_diff",
    "s3_log_key",
    "stable_round",
    "win_pct_fmt",
]
