"""Small metric/plot helpers (reference: pssgp/misc_utils.py).

Matplotlib is imported lazily so headless/benchmark environments never pay
for (or require) it.
"""
from __future__ import annotations

import numpy as np


def rmse(y_pred, y_true) -> float:
    """Root-mean-square error (reference: pssgp/misc_utils.py:10-15)."""
    y_pred = np.asarray(y_pred).reshape(-1)
    y_true = np.asarray(y_true).reshape(-1)
    return float(np.sqrt(np.mean((y_pred - y_true) ** 2)))


def error_shade(ax, t, mean, var, color="C0", alpha=0.25, label=None):
    """Shade the 95% credible interval mean ± 1.96·std on a matplotlib axis
    (reference: pssgp/misc_utils.py:18-27)."""
    t = np.asarray(t).reshape(-1)
    mean = np.asarray(mean).reshape(-1)
    std = np.sqrt(np.asarray(var).reshape(-1))
    lo, hi = mean - 1.96 * std, mean + 1.96 * std
    ax.fill_between(t, lo, hi, color=color, alpha=alpha, label=label)
    return ax
