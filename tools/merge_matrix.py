"""Merge bench-matrix partials into one canonical audit record.

The canonical matrix is ONE serial pass over every row, but the remote-TPU
tunnel can wedge mid-run (r5: ``read body: response body closed`` after row
15). Rather than discard 1-2 h of serial evidence, the driver re-runs the
remaining rows (same chip, same serial convention, non-overlapping in time)
and this tool splices the partials, newest row per family, recording the
source run for every row so the audit trail stays honest.

Usage: python tools/merge_matrix.py OUT.json IN1.json IN2.json ...
(inputs in chronological order; later files win on family collisions).
"""
from __future__ import annotations

import json
import os
import sys


def main() -> None:
    out_path, in_paths = sys.argv[1], sys.argv[2:]
    rows: dict[str, dict] = {}
    meta = None
    for path in in_paths:
        with open(path) as f:
            doc = json.load(f)
        meta = meta or doc
        for key in ("device_kind", "precision"):
            if doc.get(key) != meta.get(key):
                raise SystemExit(f"{key} mismatch: {path}")
        src = os.path.basename(path)
        for rec in doc["results"]:
            rec = dict(rec, source_run=src)
            rows[rec["family"]] = rec
    merged = {
        "timestamp_utc": meta["timestamp_utc"],
        "device": meta["device"],
        "device_kind": meta["device_kind"],
        "precision": meta["precision"],
        "note": "spliced from serial partial runs (tunnel wedge mid-pass); "
                "each row records its source_run",
        "source_runs": [os.path.basename(p) for p in in_paths],
        "results": list(rows.values()),
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"wrote {out_path}: {len(rows)} rows from {len(in_paths)} runs")


if __name__ == "__main__":
    main()
