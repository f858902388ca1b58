"""Metric-curve plotting.

Rebuild of /root/reference/training/plots.py:5-30: a grid of subplots, one
per metric, one line per learning rate (or run key), saved as PNG.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict

import numpy as np


def plot_metrics(metrics: Dict[str, Dict], file_path: str,
                 size: float = 8.0) -> None:
    """Args:
        metrics: {metric_name: {run_key: [values per epoch]}}
        file_path: output PNG path
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = int(np.round(np.sqrt(len(metrics))))
    cols = int(np.ceil(len(metrics) / rows))

    fig = plt.figure(figsize=(cols * size / 2, rows * size / 2))
    for i, (name, curves) in enumerate(metrics.items()):
        ax = fig.add_subplot(rows, cols, i + 1)
        for key, values in curves.items():
            ax.plot(values, label=str(key))
        ax.set_title(name)
        ax.legend(fontsize=6)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    directory = osp.dirname(osp.abspath(file_path))
    os.makedirs(directory, exist_ok=True)
    fig.savefig(file_path, dpi=120)
    plt.close(fig)
