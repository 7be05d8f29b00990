"""Merge an incremental scale_ab.py output into BENCH_SF10.json (r12).

The r11 sweep measured 19 entries; the r11 verdict asked for the next
~8 costliest headline entries. scale_ab.py emits a full-schema report
for whatever --queries subset it ran; this script folds those rows into
the existing artifact and recomputes the aggregate fields, stamping a
per-row provenance note so same-artifact rows from different sessions
are distinguishable (between-session absolute times are not comparable
— the RATIOS are in-session interleaved and are the artifact's point).
"""

from __future__ import annotations

import argparse
import json
import statistics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--into", required=True)
    ap.add_argument("--add", required=True)
    ap.add_argument("--note", required=True, help="provenance tag for the new rows")
    a = ap.parse_args()

    with open(a.into) as f:
        base = json.load(f)
    with open(a.add) as f:
        inc = json.load(f)

    for name, row in inc["queries"].items():
        base["queries"][name] = row
    qs = base["queries"]
    ratios = [r["ratio"] for r in qs.values()]
    base["total_base_sec"] = round(sum(r["t_base"] for r in qs.values()), 4)
    base["total_scaled_sec"] = round(sum(r["t_scaled"] for r in qs.values()), 4)
    base["total_ratio"] = round(base["total_scaled_sec"] / base["total_base_sec"], 3)
    base["ratio_median"] = round(statistics.median(ratios), 3)
    base["ratio_max"] = round(max(ratios), 3)
    base["n_queries"] = len(qs)
    base["n_superlinear"] = sum(1 for r in ratios if r > 10.0)
    sessions = base.setdefault("sessions", {})
    sessions[a.note] = {
        "queries": sorted(inc["queries"]),
        "quiet_box": inc.get("quiet_box"),
        "loadavg": inc.get("loadavg"),
        "runs_per_point": inc.get("runs_per_point"),
    }
    with open(a.into, "w") as f:
        json.dump(base, f, indent=1)
    print(
        f"merged {len(inc['queries'])} rows -> {base['n_queries']} total, "
        f"median {base['ratio_median']}, max {base['ratio_max']}"
    )


if __name__ == "__main__":
    main()
