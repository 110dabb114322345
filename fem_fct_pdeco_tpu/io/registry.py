"""Append-only results-registry CSVs.

Same row format as the reference's per-problem simulation-results files
(Schnak_FCT_PDECO_refactored.py:277-299,
chemotaxis_FCT_PDECO_refactored.py:301-323,
nonlinear_FCT_PDECO_refactored.py:241-263): timestamp, wall-clock duration,
hyper-parameters, misfit norms, J(c_true), and the output folder.
"""

from __future__ import annotations

import csv
import os
from datetime import datetime


def append_results_row(csv_path: str, data: dict) -> None:
    """Append one row. If the file's header doesn't match the row's keys
    (e.g. a release added a telemetry column), the file is upgraded in
    place to the UNION header — old rows keep blanks for new columns —
    instead of silently appending misaligned fields."""
    data = {"timestamp": datetime.now().strftime("%Y-%m-%d %H:%M:%S"), **data}
    if not os.path.isfile(csv_path):
        with open(csv_path, mode="w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(data.keys()))
            writer.writeheader()
            writer.writerow(data)
        return
    with open(csv_path, newline="") as f:
        try:
            header = next(csv.reader(f))
        except StopIteration:
            header = []
    fieldnames = header or list(data.keys())
    if header and header != list(data.keys()):
        missing = [k for k in data if k not in header]
        if missing:
            fieldnames = header + missing
            with open(csv_path, newline="") as f:
                rows = list(csv.DictReader(f))
            with open(csv_path, mode="w", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=fieldnames)
                writer.writeheader()
                for r in rows:
                    r.pop(None, None)
                    writer.writerow({k: r.get(k, "") for k in fieldnames})
    with open(csv_path, mode="a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames,
                                extrasaction="ignore")
        writer.writerow({k: data.get(k, "") for k in fieldnames})
