"""Results aggregation: collect experiment CSVs into summary tables.

Re-design of the reference aggregator (reference: src/depth_correction/
results.py:50-598): glob ``loss_eval_*`` / ``slam_eval_*`` CSVs across
experiment directories, compute per-(config, subset) means, and render
plain-text / LaTeX tables. Dependency-light (numpy only).
"""
from __future__ import annotations

import glob
import os
import re
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "read_loss_eval_csv",
    "read_slam_eval_csv",
    "collect_results",
    "mean_loss_table",
    "format_table",
    "to_latex",
]


def read_loss_eval_csv(path: str) -> List[Tuple[str, float]]:
    """Rows ``"<names> <loss>"`` (reference schema, eval.py:184)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            out.append((parts[0], float(parts[1])))
    return out


def read_slam_eval_csv(path: str) -> List[Tuple[str, float, float, float, float]]:
    """Rows ``"<name> <r_angle> <t_norm> <rel_angle> <rel_offset>"``
    (reference schema, scripts/robot_data:186-187)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 5:
                continue
            out.append((parts[0],) + tuple(float(x) for x in parts[1:]))
    return out


def collect_results(root: str, pattern: str = "loss_eval_*.csv") -> Dict:
    """Glob CSVs under experiment directories.

    :return: {(exp_dir_relative, csv_name): rows}.
    """
    out = {}
    for path in sorted(glob.glob(os.path.join(root, "**", pattern), recursive=True)):
        rel = os.path.relpath(os.path.dirname(path), root)
        out[(rel, os.path.basename(path))] = read_loss_eval_csv(path)
    return out


def mean_loss_table(
    root: str, loss: str = "min_eigval_loss", subset: Optional[str] = None
):
    """Mean loss per experiment config (reference: results.py:318-...).

    :return: (header, rows) where rows are [config, subset, mean, count].
    """
    pattern = "loss_eval_%s%s.csv" % (loss, "_%s" % subset if subset else "*")
    table = defaultdict(list)
    for (exp, csv_name), rows in collect_results(root, pattern).items():
        m = re.search(r"loss_eval_%s_?(\w*)\.csv" % re.escape(loss), csv_name)
        sub = m.group(1) if m and m.group(1) else "all"
        for _, value in rows:
            table[(exp, sub)].append(value)
    header = ["config", "subset", "mean_%s" % loss, "n"]
    out_rows = [
        [exp, sub, float(np.mean(vals)), len(vals)]
        for (exp, sub), vals in sorted(table.items())
    ]
    return header, out_rows


def format_table(header, rows, float_fmt: str = "%.6g") -> str:
    """Plain-text aligned table."""
    def fmt(x):
        return float_fmt % x if isinstance(x, float) else str(x)

    cells = [header] + [[fmt(c) for c in row] for row in rows]
    widths = [max(len(r[i]) for r in cells) for i in range(len(header))]
    lines = [
        "  ".join(c.ljust(w) for c, w in zip(row, widths)).rstrip() for row in cells
    ]
    lines.insert(1, "  ".join("-" * w for w in widths))
    return "\n".join(lines)


def to_latex(header, rows, float_fmt: str = "%.6g") -> str:
    """LaTeX tabular (the reference renders result tables to LaTeX,
    results.py:50-598)."""
    def fmt(x):
        return float_fmt % x if isinstance(x, float) else str(x).replace("_", r"\_")

    lines = [r"\begin{tabular}{%s}" % ("l" * len(header))]
    lines.append(" & ".join(fmt(h) for h in header) + r" \\")
    lines.append(r"\hline")
    for row in rows:
        lines.append(" & ".join(fmt(c) for c in row) + r" \\")
    lines.append(r"\end{tabular}")
    return "\n".join(lines)
