"""RBF-6/8 dt-vs-plane gradient accuracy vs CPU f64 truth.

The RBF hardware rows (results/rbf_dt.json) show the two engines' f32
training gradients diverging hugely in the lengthscale component at
d=6/8 (e.g. d=6: plane −36268 vs dt −2633) while LML itself agrees to
1e-6.  Same question round 5 answered for Matern52 (results/
dt_accuracy.json): is one engine wrong, or are both at the f32
conditioning floor of a near-cancelling gradient?  Triangulate at
T=65,536 against a CPU f64 truth (value_and_grad of the XLA plane LML
w.r.t. (variance, lengthscale), includes discretization).

Writes results/rbf_grad_accuracy.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

T = 1 << 16
ORDERS = [6, 8]
RESULTS: list[dict] = []


def emit(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


def truth_file(order: int) -> str:
    return f"/tmp/scratch/rbf_truth_{order}_{T}.npz"


def compute_truth(order: int):
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
order = %d
rng = np.random.RandomState(0)
t = np.sort(rng.rand(T)).astype(np.float64)
y = obs_noise(sinu(t), 0.1, 0).astype(np.float64)
ts = jnp.asarray(t).reshape(-1, 1)
R = jnp.asarray(0.1).reshape(1, 1)
ys = jnp.asarray(y).reshape(-1, 1)

def train(params):
    k = RBF(params[0], params[1], order=order)
    return lml_tl(k.get_ssm_tl(ts, R), ys, False)

p0 = jnp.asarray([1.0, 0.5])
ell, g = jax.value_and_grad(train)(p0)
np.savez(%r, ell=float(ell), grad=np.asarray(g))
print("truth", order, float(ell), np.asarray(g))
""" % (
        os.path.join(os.path.dirname(__file__), ".."),
        T,
        order,
        truth_file(order),
    )
    subprocess.run([sys.executable, "-c", code], check=True)


def main():
    for order in ORDERS:
        if not os.path.exists(truth_file(order)):
            compute_truth(order)

    import jax
    import jax.numpy as jnp

    from parallel_gps_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from parallel_gps_tpu.kalman.pallas_dt import lml_dt
    from parallel_gps_tpu.kalman.timelast import lml_tl
    from parallel_gps_tpu.kernels import RBF
    from parallel_gps_tpu.toymodels import obs_noise, sinu

    emit(event="start", device=jax.devices()[0].platform, T=T)

    rng = np.random.RandomState(0)
    t = np.sort(rng.rand(T)).astype(np.float32)
    y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
    ts = jnp.asarray(t).reshape(-1, 1)
    R = jnp.asarray(0.1, jnp.float32).reshape(1, 1)
    ys = jnp.asarray(y).reshape(-1, 1)

    for order in ORDERS:
        tr = np.load(truth_file(order))
        g_true = tr["grad"]
        emit(event="truth", order=order, ell=float(tr["ell"]),
             grad=[float(x) for x in g_true])

        def train_plane(p):
            k = RBF(p[0], p[1], order=order)
            return lml_tl(k.get_ssm_tl(ts, R), ys, True)

        def train_dt(p):
            return lml_dt(RBF(p[0], p[1], order=order), ts, R, ys)

        p0 = jnp.asarray([1.0, 0.5], jnp.float32)
        for name, fn in [("plane", train_plane), ("dt", train_dt)]:
            ell, g = jax.jit(jax.value_and_grad(fn))(p0)
            g = np.asarray(jax.device_get(g), np.float64)
            rel = np.abs(g - g_true) / np.maximum(np.abs(g_true), 1e-30)
            emit(engine=name, order=order, ell=float(ell),
                 grad=[float(x) for x in g],
                 rel_err=[float(x) for x in rel],
                 ell_rel=abs(float(ell) - float(tr["ell"]))
                 / abs(float(tr["ell"])))

    os.makedirs("results", exist_ok=True)
    with open("results/rbf_grad_accuracy.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
