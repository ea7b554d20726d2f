"""d=12 f32 TRAINING on TPU: standard engine vs the square-root stable path.

The d=12 envelope (results/envelope_d12.json) pinned the FORWARD: the
standard f32 engine loses definiteness from T≈16k and NaNs at T=131k,
while the square-root engine stays PSD and ~1e-3 accurate.  Round 5's
square-root Fisher-identity VJP (kalman/sqrt.py::sqrt_lml) makes the
stable path differentiable — this battery pins the TRAINING story:
value_and_grad of the LML w.r.t. (variance, lengthscale) at RBF order 12,
T ∈ {32768, 131072} f32 on TPU, vs CPU f64 truth.

Writes results/stable_train_d12.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ORDER = 12
SIZES = [1 << 15, 1 << 17]
RESULTS: list[dict] = []


def emit(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


def truth_file(T: int) -> str:
    return f"/tmp/scratch/stable_truth_{ORDER}_{T}.npz"


def compute_truth(T: int):
    code = r"""
import os
os.makedirs("/tmp/scratch", exist_ok=True)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp, sys
sys.path.insert(0, %r)
from parallel_gps_tpu.kalman.timelast import lml_tl
from parallel_gps_tpu.kernels import RBF
from parallel_gps_tpu.toymodels import obs_noise, sinu
T = %d
rng = np.random.RandomState(0)
t = np.sort(rng.rand(T)).astype(np.float64)
y = obs_noise(sinu(t), 0.1, 0).astype(np.float64)
ts = jnp.asarray(t).reshape(-1, 1)
R = jnp.asarray(0.1).reshape(1, 1)
ys = jnp.asarray(y).reshape(-1, 1)

def train(params):
    k = RBF(params[0], params[1], order=%d)
    return lml_tl(k.get_ssm_tl(ts, R), ys, False)

p0 = jnp.asarray([1.0, 0.5])
ell, g = jax.value_and_grad(train)(p0)
np.savez(%r, ell=float(ell), grad=np.asarray(g))
print("truth", T, float(ell), np.asarray(g))
""" % (
        os.path.join(os.path.dirname(__file__), ".."),
        T,
        ORDER,
        truth_file(T),
    )
    subprocess.run([sys.executable, "-c", code], check=True)


def main():
    for T in SIZES:
        if not os.path.exists(truth_file(T)):
            compute_truth(T)

    import jax
    import jax.numpy as jnp

    from parallel_gps_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from parallel_gps_tpu.kalman.sqrt import sqrt_lml_kernel
    from parallel_gps_tpu.kalman.timelast import lml_tl
    from parallel_gps_tpu.kernels import RBF
    from parallel_gps_tpu.toymodels import obs_noise, sinu

    emit(event="start", device=jax.devices()[0].platform, order=ORDER)

    for T in SIZES:
        tr = np.load(truth_file(T))
        g_true = np.asarray(tr["grad"])
        emit(event="truth", T=T, ell=float(tr["ell"]),
             grad=[float(x) for x in g_true])

        rng = np.random.RandomState(0)
        t = np.sort(rng.rand(T)).astype(np.float32)
        y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
        ts = jnp.asarray(t).reshape(-1, 1)
        R = jnp.asarray(0.1, jnp.float32).reshape(1, 1)
        ys = jnp.asarray(y).reshape(-1, 1)

        def train_std(p):
            k = RBF(p[0], p[1], order=ORDER)
            return lml_tl(k.get_ssm_tl(ts, R), ys, False)

        def train_stable(p):
            return sqrt_lml_kernel(
                RBF(p[0], p[1], order=ORDER), ts, R, ys
            )

        p0 = jnp.asarray([1.0, 0.5], jnp.float32)
        for name, fn in [("std", train_std), ("stable", train_stable)]:
            try:
                f = jax.jit(jax.value_and_grad(fn))
                ell, g = f(p0)
                jax.block_until_ready((ell, g))
                t0 = time.perf_counter()
                for _ in range(3):
                    ell, g = f(p0)
                float(jnp.sum(g))
                wall = (time.perf_counter() - t0) / 3
                g = np.asarray(jax.device_get(g), np.float64)
                rel = np.abs(g - g_true) / np.maximum(np.abs(g_true), 1e-30)
                emit(engine=name, T=T, ell=float(ell),
                     grad=[float(x) for x in g],
                     grad_rel_err=[float(x) for x in rel],
                     ell_rel=abs(float(ell) - float(tr["ell"]))
                     / abs(float(tr["ell"])),
                     finite=bool(np.isfinite(g).all()
                                 and np.isfinite(float(ell))),
                     wall_ms=round(wall * 1e3, 2))
            except Exception as e:  # noqa: BLE001 — record and continue
                emit(engine=name, T=T, error=str(e)[:300])

    os.makedirs("results", exist_ok=True)
    with open("results/stable_train_d12.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
