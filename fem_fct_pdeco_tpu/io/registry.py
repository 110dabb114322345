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
    data = {"timestamp": datetime.now().strftime("%Y-%m-%d %H:%M:%S"), **data}
    exists = os.path.isfile(csv_path)
    with open(csv_path, mode="a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(data.keys()))
        if not exists:
            writer.writeheader()
        writer.writerow(data)
