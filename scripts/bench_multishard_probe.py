"""Real-hardware probe of the pod kernel path (VERDICT r3 item 8).

A jax.sharding.Mesh needs ≥2 distinct devices and this environment has one
v5e core (no megacore), so `sharded_pkfs_tl(engine="pallas")` with
n_shards ≥ 2 cannot execute literally on this chip.  What CAN execute — and
what n_shards=1 never exercises — is the per-shard program with NONTRIVIAL
cross-shard prefixes: strip_filter_sharded_onechip /
strip_smoother_sharded_onechip run the exact per-shard kernels sequentially
with the collectives replaced by host-side stitching (pallas_scan.py).  The
collectives themselves are validated by the 8-virtual-device shard_map tests
(tests/test_sharded.py).

Parity target: the single-scan fused engine on the full series.  Writes
results/multishard_probe.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS: list[dict] = []


def emit(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from parallel_gps_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from parallel_gps_tpu.kalman import pallas_scan as ps
    from parallel_gps_tpu.kernels import Matern52
    from parallel_gps_tpu.toymodels import obs_noise, sinu

    emit(event="start", device=jax.devices()[0].platform)

    def med(f, *args, reps=5, outer=3):
        r = f(*args)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        ts = []
        for _ in range(outer):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = f(*args)
            float(jnp.sum(jax.tree.leaves(r)[0]))
            ts.append((time.perf_counter() - t0) / reps)
        return min(ts)

    kern = Matern52(0.8, 0.4)
    d = kern.state_dim
    block = ps.pick_strip_block(d, 4)
    align = ps.strip_align(d, 4)
    n_shards = 4
    T = ((1 << 21) // (align * n_shards)) * align * n_shards
    rng = np.random.RandomState(0)
    t = np.sort(rng.rand(T)).astype(np.float32)
    y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
    ssm = jax.jit(kern.get_ssm_tl)(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    jax.block_until_ready(ssm)
    ys = jnp.asarray(y).reshape(-1, 1)
    emit(event="setup", T=T, n_shards=n_shards, block=block)

    f_full = jax.jit(
        lambda s, o: ps.strip_filter(s.Fs, s.Qs, s.P0, s.H, s.R, o,
                                     block=block)
    )
    b0, C0, ell0 = f_full(ssm, ys)
    f_sh = jax.jit(
        lambda s, o: ps.strip_filter_sharded_onechip(
            s.Fs, s.Qs, s.P0, s.H, s.R, o, n_shards, block=block
        )
    )
    b1, C1, ell1 = f_sh(ssm, ys)
    sb = float(jnp.max(jnp.abs(b0)))
    emit(
        event="filter_parity",
        max_rel_b=float(jnp.max(jnp.abs(b1 - b0))) / sb,
        max_rel_C=float(jnp.max(jnp.abs(C1 - C0)))
        / float(jnp.max(jnp.abs(C0))),
        ell_rel=abs(float(ell1) - float(ell0)) / abs(float(ell0)),
    )

    g_full = jax.jit(lambda s, b, C: ps.strip_smoother(s.Fs, s.Qs, b, C,
                                                       block=block))
    g0, L0 = g_full(ssm, b0, C0)
    g_sh = jax.jit(
        lambda s, b, C: ps.strip_smoother_sharded_onechip(
            s.Fs, s.Qs, b, C, n_shards, block=block
        )
    )
    g1, L1 = g_sh(ssm, b0, C0)
    emit(
        event="smoother_parity",
        max_rel_g=float(jnp.max(jnp.abs(g1 - g0)))
        / float(jnp.max(jnp.abs(g0))),
        max_rel_L=float(jnp.max(jnp.abs(L1 - L0)))
        / float(jnp.max(jnp.abs(L0))),
    )

    emit(bench="filter_full", wall_ms=med(f_full, ssm, ys) * 1e3)
    emit(bench="filter_sharded4_onechip", wall_ms=med(f_sh, ssm, ys) * 1e3)
    emit(bench="smoother_full", wall_ms=med(g_full, ssm, b0, C0) * 1e3)
    emit(bench="smoother_sharded4_onechip",
         wall_ms=med(g_sh, ssm, b0, C0) * 1e3)

    os.makedirs("results", exist_ok=True)
    with open("results/multishard_probe.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
