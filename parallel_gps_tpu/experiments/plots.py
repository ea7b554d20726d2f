"""Figure regeneration for the experiment battery — the reference's ``--plot``
reload-and-figure paths, rebuilt on our ``.npz`` results format.

Reference figures reproduced:
  - ridgeline RMSE/time distributions of the speed & stability sweep
    (pssgp/experiments/toy_models/speed_and_stability.py:43-60,96-110);
  - sunspot MAP prediction with 95% CI shading (sunspot/map.py:90-117);
  - posterior-predictive spaghetti from MCMC hyperparameter samples
    (sunspot/mcmc.py:77-99), extended to the CO2 composite showcase.

Every experiment module's ``--plot`` flag calls into here with its own saved
``.npz`` — run and plot are decoupled exactly as in the reference
(``--run``/``--plot``).

Style: one fixed colorblind-safe (Okabe–Ito) color per model class across
every figure (identity never changes with figure contents); data points in
near-black; recessive grid; matplotlib's Agg backend so headless runs work.
"""
from __future__ import annotations

import os

import numpy as np

# Fixed categorical assignment: color follows the model class, everywhere.
# Okabe-Ito trio; all pairs pass CVD deltaE checks (blue/orange/green).
MODEL_COLORS = {
    "pssgp": "#0072B2",
    "ssgp": "#E69F00",
    "gp": "#009E73",
}
DATA_COLOR = "#333333"


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _style(ax):
    ax.grid(True, color="#dddddd", linewidth=0.6, zorder=0)
    ax.set_axisbelow(True)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)


def ridgeline(ax, rows, labels, color, overlap=0.4, n_points=150):
    """Stacked KDE curves, one per row (reference:
    toy_models/speed_and_stability.py:43-60).  NaN entries (failed sweep
    cells) are dropped per row; rows with < 2 finite values or zero spread
    are drawn as a vertical tick instead of a degenerate KDE."""
    from scipy.stats import gaussian_kde

    finite = [r[np.isfinite(r)] for r in rows]
    pooled = np.concatenate([f for f in finite if f.size] or [np.zeros(1)])
    if pooled.size == 0:
        return
    lo, hi = np.min(pooled), np.max(pooled)
    span = hi - lo if hi > lo else max(abs(hi), 1.0)
    xx = np.linspace(lo - 0.1 * span, hi + 0.1 * span, n_points)
    step = 1.0 - overlap
    for i, (r, label) in enumerate(zip(finite, labels)):
        y0 = i * step
        z = len(rows) - i + 1
        if r.size >= 2 and np.ptp(r) > 0:
            curve = gaussian_kde(r)(xx)
            curve = curve / np.max(curve) * 0.9  # normalized row height
            ax.fill_between(
                xx, y0, curve + y0, zorder=z, color=color, alpha=0.45
            )
            ax.plot(xx, curve + y0, zorder=z, color=color, linewidth=1.5)
        elif r.size:
            ax.plot(
                [r[0], r[0]], [y0, y0 + 0.9], zorder=z, color=color,
                linewidth=2.0,
            )
        ax.text(
            xx[0], y0 + 0.05, label, fontsize=8, color="#555555",
            ha="left", va="bottom", zorder=z + 100,
        )
    ax.set_yticks([])


def plot_speed_stability(npz_path: str, out_png: str | None = None) -> str:
    """Ridgeline RMSE + wall-time figure from a speed_and_stability result
    file.

    Diagonal sweeps store (sizes, seeds) matrices → one RMSE + one latency
    panel.  --full-mesh sweeps store (train, pred, seeds) → the reference's
    2×3 slice grid (toy_models/speed_and_stability.py:96-110): RMSE
    distributions at three fixed train sizes (top, over pred sizes) and at
    three fixed pred sizes (bottom, over train sizes)."""
    plt = _plt()
    with np.load(npz_path) as data:
        sizes, rmses, times = data["sizes"], data["rmses"], data["times"]
    name = os.path.basename(npz_path).replace(".npz", "")
    model = _model_from_name(name)
    color = MODEL_COLORS.get(model, DATA_COLOR)
    labels = [f"n={int(n):,}" for n in sizes]

    if rmses.ndim == 3:  # full (train × pred × seeds) mesh
        S = rmses.shape[0]
        picks = sorted({(k + 1) * S // 3 - 1 for k in range(3)})
        fig, axes = plt.subplots(
            ncols=len(picks), nrows=2, figsize=(4 * len(picks), 2.0 + 0.7 * S)
        )
        axes = np.atleast_2d(axes)
        for col, k in enumerate(picks):
            ridgeline(axes[0, col], list(rmses[k]), labels, color)
            axes[0, col].set_title(f"train n={int(sizes[k]):,}", fontsize=9)
            axes[0, col].set_xlabel("RMSE (rows: n_pred)")
            ridgeline(axes[1, col], list(rmses[:, k]), labels, color)
            axes[1, col].set_title(f"pred m={int(sizes[k]):,}", fontsize=9)
            axes[1, col].set_xlabel("RMSE (rows: n_train)")
        for ax in axes.flat:
            _style(ax)
    else:
        fig, axes = plt.subplots(ncols=2, figsize=(9, 1.2 + 0.7 * len(sizes)))
        ridgeline(axes[0], list(rmses), labels, color)
        axes[0].set_xlabel("RMSE")
        axes[0].set_title("prediction error over seeds")
        ridgeline(axes[1], list(times), labels, color)
        axes[1].set_xlabel("wall time per predict [s]")
        axes[1].set_title("latency over seeds")
        for ax in axes:
            _style(ax)
    fig.suptitle(name, fontsize=10)
    fig.tight_layout()
    out_png = out_png or npz_path.replace(".npz", ".png")
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
    print(f"saved {out_png}")
    return out_png


def plot_map_prediction(npz_path: str, out_png: str | None = None) -> str:
    """Scatter of the observations + posterior mean + 95% CI band from a
    sunspot MAP result file (keys: t, y, t_pred, mean, var) — reference
    figure at sunspot/map.py:90-117, using misc_utils.error_shade."""
    from parallel_gps_tpu.misc_utils import error_shade

    plt = _plt()
    with np.load(npz_path) as data:
        t, y = data["t"], data["y"]
        t_pred, mean, var = data["t_pred"], data["mean"], data["var"]
    name = os.path.basename(npz_path).replace(".npz", "")
    color = MODEL_COLORS.get(_model_from_name(name), MODEL_COLORS["pssgp"])

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.scatter(
        t.reshape(-1), y.reshape(-1), s=2, marker="x", color=DATA_COLOR,
        label="observations", zorder=3,
    )
    ax.plot(
        t_pred.reshape(-1), mean.reshape(-1), color=color, linewidth=1.0,
        label="posterior mean", zorder=4,
    )
    error_shade(ax, t_pred, mean, var, color=color, alpha=0.25, label="95% CI")
    ax.set_xlabel("time [years]")
    ax.set_ylabel("sunspot number")
    ax.legend(loc="upper right", frameon=False, fontsize=8)
    _style(ax)
    fig.suptitle(name, fontsize=10)
    fig.tight_layout()
    out_png = out_png or npz_path.replace(".npz", ".png")
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
    print(f"saved {out_png}")
    return out_png


def plot_posterior_predictive(
    model,
    samples,
    t,
    y,
    out_png: str,
    n_draws: int = 10,
    n_grid: int = 2000,
    seed: int = 0,
    trainable=None,
    y_offset: float = 0.0,
    title: str | None = None,
) -> str:
    """Posterior-predictive spaghetti: predictive means under ``n_draws``
    hyperparameter draws from an MCMC chain (reference:
    sunspot/mcmc.py:77-99).

    ``samples`` is the unconstrained-sample pytree returned by
    ``run_one_mcmc`` (leading axis = chain).  ``trainable`` (the same
    predicate passed to the sampler, if any) re-freezes non-trainable leaves
    at the model's current values, mirroring the target density's merge.
    """
    import jax

    from parallel_gps_tpu.models.params import (
        as_arrays,
        constrain,
        trainable_mask,
        unconstrain,
    )

    plt = _plt()
    rng = np.random.RandomState(seed)
    n_chain = int(jax.tree.leaves(samples)[0].shape[0])
    draws = rng.choice(n_chain, size=min(n_draws, n_chain), replace=False)

    hypers0 = as_arrays(
        unconstrain({"kernel": model.kernel, "noise_variance": model.noise_variance})
    )
    mask = trainable_mask(hypers0, trainable) if trainable is not None else None
    grid = np.linspace(float(np.min(t)), float(np.max(t)), n_grid)

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.scatter(
        np.reshape(t, -1), np.reshape(y, -1) + y_offset, s=2, marker="x",
        color=DATA_COLOR, label="observations", zorder=3,
    )
    # GPR (dense oracle) has no `parallel` field — fall through to its color.
    if getattr(model, "parallel", None) is True:
        color = MODEL_COLORS["pssgp"]
    elif getattr(model, "parallel", None) is False:
        color = MODEL_COLORS["ssgp"]
    else:
        color = MODEL_COLORS["gp"]
    for k, i in enumerate(draws):
        u = jax.tree.map(lambda s: s[i], samples)
        if mask is not None:
            u = jax.tree.map(lambda m, a, b: a if m else b, mask, u, hypers0)
        c = constrain(u)
        m_i = model.replace(kernel=c["kernel"], noise_variance=c["noise_variance"])
        mean, _ = m_i.predict_f(grid)
        ax.plot(
            grid, np.asarray(mean).reshape(-1) + y_offset, color=color,
            alpha=0.35, linewidth=0.8, zorder=4,
            label="posterior draws" if k == 0 else None,
        )
    ax.set_xlabel("time")
    ax.legend(loc="upper right", frameon=False, fontsize=8)
    _style(ax)
    if title:
        fig.suptitle(title, fontsize=10)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_png)), exist_ok=True)
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
    print(f"saved {out_png}")
    return out_png


def _model_from_name(name: str) -> str:
    for part in name.split("_"):
        if part in MODEL_COLORS:
            return part
    return ""
