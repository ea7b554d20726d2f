"""Synthetic test-function generators (reference: pssgp/toymodels/data_funcs.py).

Plain numpy on the host — these produce experiment data, not traced compute.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def sinu(t: np.ndarray) -> np.ndarray:
    """sin(πt) + sin(2πt) + cos(3πt) (reference: data_funcs.py:10-23)."""
    return (
        np.sin(np.pi * t) + np.sin(2 * np.pi * t) + np.cos(3 * np.pi * t)
    )


def comp_sinu(t: np.ndarray) -> np.ndarray:
    """Composite sinusoid, hard for stationary GPs
    (reference: data_funcs.py:26-42)."""
    return np.sin(7 * np.pi * np.cos(2 * np.pi * t**2)) ** 2 / (
        np.cos(5 * np.pi * t) + 2
    )


def rect(t: np.ndarray) -> np.ndarray:
    """Magnitude-varying rectangle wave (reference: data_funcs.py:45-72)."""
    tau = (t - np.min(t)) / (np.max(t) - np.min(t))
    p = np.linspace(1 / 6, 5 / 6, 5)
    y = np.zeros(t.shape)
    y[(tau >= p[0]) & (tau < p[1])] = 1.0
    y[(tau >= p[2]) & (tau < p[3])] = 0.6
    y[tau >= p[4]] = 0.4
    return y


def obs_noise(
    x: np.ndarray, r: float, seed: Optional[int] = None
) -> np.ndarray:
    """Additive Gaussian observation noise (reference: data_funcs.py:75-97).

    Note: reproduces the reference's exact sampling quirk — the noise is
    drawn as ``normal(loc=x, scale=sqrt(r))`` and then scaled by ``sqrt(r)``
    and added to x, matching data_funcs.py:97 so datasets are comparable.
    """
    rng = np.random.RandomState(seed)
    return x + np.sqrt(r) * rng.normal(x, np.sqrt(r), x.shape[0]).astype(
        x.dtype
    )
