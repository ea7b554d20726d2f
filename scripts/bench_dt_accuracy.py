"""dt-engine vs plane-engine f32 accuracy triangulation vs CPU f64 truth.

The N=10M TPU parity probe (results/dt_10m.json) showed max|Δg|/max|g| ≈ 2e-2
between the dt-engine and plane-engine smoothed means at f32, and 3-6% between
their gradients.  Both engines run the same combine algebra; they differ only
in where A−I is computed (in-register rebuild vs HBM planes from get_ssm_tl),
so the question is which sits closer to the f64 truth — i.e. whether the delta
is one engine's error or both sitting at the f32 conditioning floor with
different roundoff.  Measures LML, smoothed moments, AND the training-step
gradient (value_and_grad of LML including discretization, w.r.t.
(variance, lengthscale)) at T = 65,536 and T = 2^20 (VERDICT r4 item 4).

Writes results/dt_accuracy.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SIZES = [1 << 16, 1 << 20]


def truth_file(T: int) -> str:
    return f"/tmp/scratch/dt_truth_{T}.npz"


def compute_truth(T: int):
    """CPU f64 truth in a subprocess (f64 + axon plugin don't mix)."""
    code = r"""
import os
os.makedirs("/tmp/scratch", exist_ok=True)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp, sys
sys.path.insert(0, %r)
from parallel_gps_tpu.kalman.timelast import pkfs_from_tl, lml_tl
from parallel_gps_tpu.kernels import Matern52
from parallel_gps_tpu.toymodels import obs_noise, sinu
T = %d
rng = np.random.RandomState(0)
t = np.sort(rng.rand(T)).astype(np.float64)
y = obs_noise(sinu(t), 0.1, 0).astype(np.float64)
kern = Matern52(0.8, 0.4)
ts = jnp.asarray(t).reshape(-1, 1)
R = jnp.asarray(0.1).reshape(1, 1)
ssm = kern.get_ssm_tl(ts, R)
ys = jnp.asarray(y).reshape(-1, 1)
ell = float(lml_tl(ssm, ys, False))
g, P = pkfs_from_tl(ssm, ys, pallas=False, time_first_out=False)

def train(params):
    k = Matern52(params[0], params[1])
    s = k.get_ssm_tl(ts, R)
    return lml_tl(s, ys, False)

grad = jax.grad(train)(jnp.asarray([0.8, 0.4], jnp.float64))
np.savez(%r, t=t, y=y, ell=ell, g=np.asarray(g), P=np.asarray(P),
         grad=np.asarray(grad))
print("truth done", T, ell, np.asarray(grad))
""" % (os.path.abspath(os.path.join(os.path.dirname(__file__), "..")),
       T, truth_file(T))
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    subprocess.run([sys.executable, "-c", code], env=env, check=True)


def main():
    for T in SIZES:
        if not os.path.exists(truth_file(T)):
            compute_truth(T)

    import jax
    import jax.numpy as jnp

    from parallel_gps_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from parallel_gps_tpu.kalman.pallas_dt import lml_dt, pkfs_dt
    from parallel_gps_tpu.kalman.timelast import lml_tl, pkfs_from_tl
    from parallel_gps_tpu.kernels import Matern52

    rows = []

    def emit(**kw):
        rows.append(kw)
        print(json.dumps(kw), flush=True)

    emit(event="start", device=jax.devices()[0].platform)

    for T in SIZES:
        z = np.load(truth_file(T))
        t, y = z["t"], z["y"]
        ell64, g64, P64, grad64 = (float(z["ell"]), z["g"], z["P"], z["grad"])
        emit(event="case", T=T, ell_f64=ell64,
             grad_f64=[float(x) for x in grad64])

        kern = Matern52(0.8, 0.4)
        ts = jnp.asarray(t, jnp.float32).reshape(-1, 1)
        R = jnp.asarray(0.1, jnp.float32).reshape(1, 1)
        ys = jnp.asarray(y, jnp.float32).reshape(-1, 1)
        ssm = jax.jit(kern.get_ssm_tl)(ts, R)
        jax.block_until_ready(ssm)

        ell_pl = float(jax.jit(lambda s, o: lml_tl(s, o, True))(ssm, ys))
        ell_dt = float(jax.jit(lambda tt, o: lml_dt(kern, tt, R, o))(ts, ys))
        emit(bench="lml_rel_err_vs_f64", T=T,
             plane=abs(ell_pl - ell64) / abs(ell64),
             dt=abs(ell_dt - ell64) / abs(ell64))

        g_pl, P_pl = jax.jit(
            lambda s, o: pkfs_from_tl(s, o, pallas=True, time_first_out=False)
        )(ssm, ys)
        g_dt, P_dt = jax.jit(lambda tt, o: pkfs_dt(kern, tt, R, o))(ts, ys)
        scale = np.max(np.abs(g64))

        def rel(a, b):
            return float(np.max(np.abs(np.asarray(a, np.float64) - b)) / scale)

        emit(bench="smoothed_mean_max_rel_err_vs_f64", T=T,
             plane=rel(g_pl, g64), dt=rel(g_dt, g64),
             plane_vs_dt=float(
                 np.max(np.abs(np.asarray(g_pl, np.float64)
                               - np.asarray(g_dt, np.float64))) / scale
             ))
        sP = np.max(np.abs(P64))
        emit(bench="smoothed_cov_max_rel_err_vs_f64", T=T,
             plane=float(
                 np.max(np.abs(np.asarray(P_pl, np.float64) - P64)) / sP),
             dt=float(
                 np.max(np.abs(np.asarray(P_dt, np.float64) - P64)) / sP))

        # Training-step gradient (LML + discretization) vs f64 truth.
        def train_plane(params):
            k = Matern52(params[0], params[1])
            s = k.get_ssm_tl(ts, R)
            return lml_tl(s, ys, True)

        def train_dt(params):
            k = Matern52(params[0], params[1])
            return lml_dt(k, ts, R, ys)

        p0 = jnp.asarray([0.8, 0.4], jnp.float32)
        grad_pl = np.asarray(jax.jit(jax.grad(train_plane))(p0), np.float64)
        grad_dt = np.asarray(jax.jit(jax.grad(train_dt))(p0), np.float64)
        gs = np.max(np.abs(grad64))
        emit(bench="train_grad_max_rel_err_vs_f64", T=T,
             plane=float(np.max(np.abs(grad_pl - grad64)) / gs),
             dt=float(np.max(np.abs(grad_dt - grad64)) / gs),
             grad_plane=[float(x) for x in grad_pl],
             grad_dt=[float(x) for x in grad_dt])

    os.makedirs("results", exist_ok=True)
    with open("results/dt_accuracy.json", "w") as fh:
        json.dump(rows, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
