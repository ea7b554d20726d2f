"""Round-4 attribution: where do the strip kernels' N=10M milliseconds go?

Round-3's scan_attrib showed combine arithmetic is ~12% of LML wall and
rolls/selects another ~8% — leaving most of the wall unexplained vs the
~7 ms ideal-traffic floor (results/dma_probe.json: ~220-230 GB/s effective).
This script splits the wall along a different axis:

  floor        — empty jitted program (today's tunnel dispatch floor).
  read_only    — pallas kernel streaming the SAME 22 input planes with a
                 trivial reduction output: the real DMA floor for a pass.
  pass1        — strip filter pass 1 alone (totals only).
  pass2        — strip filter pass 2 alone (prefixes precomputed).
  filter       — full strip_filter (pass1 + glue + pass2).
  lml / pkfs   — production entry points (aligned inputs).
  E_empty_scan — filter with the in-kernel scan replaced by identity
                 (keeps element construction, carry plumbing, outputs):
                 the irreducible non-scan kernel cost.

Timing-only variants compute garbage; nothing here is used for values.
Writes results/r4_attrib.json.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from functools import partial

    from parallel_gps_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from parallel_gps_tpu.kalman import pallas_scan as ps
    from parallel_gps_tpu.kalman.timelast import lml_tl, pkfs_from_tl
    from parallel_gps_tpu.kernels import Matern52
    from parallel_gps_tpu.toymodels import obs_noise, sinu

    emit(event="start", device=jax.devices()[0].platform)

    def med(f, *args, reps=3, outer=4):
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

    d = 3
    block = ps.pick_strip_block(d, 4)
    align = ps.strip_align(d, 4)
    T = (10_000_000 // align) * align
    rng = np.random.RandomState(0)
    t = np.sort(rng.rand(T)).astype(np.float32)
    y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
    kern = Matern52(0.8, 0.4)
    ssm = jax.jit(kern.get_ssm_tl)(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    jax.block_until_ready(ssm)
    ys = jnp.asarray(y).reshape(-1, 1)
    emit(event="setup", T=T, block=block, align=align)

    # Today's dispatch floor.
    f_empty = jax.jit(lambda x: x + 1.0)
    emit(bench="floor_empty", wall_ms=med(f_empty, ys[:8]) * 1e3)

    # Prepped strip inputs (shared by the pass-level timings).
    scal, F_st, Q_st, y_st, m_st, W, Tp = ps._strip_filter_prep(
        ssm.Fs, ssm.Qs, ssm.P0, ssm.H, ssm.R, ys, block, 1.0
    )
    F_st, Q_st, y_st, m_st = jax.device_put((F_st, Q_st, y_st, m_st))
    jax.block_until_ready((F_st, Q_st, y_st, m_st))

    # read_only: stream the same 22 planes, write one (n, S, 128) tile.
    def read_kernel(scal_ref, f_ref, q_ref, y_ref, mask_ref, out_ref):
        s = (
            jnp.sum(f_ref[:], axis=0)
            + jnp.sum(q_ref[:], axis=0)
            + y_ref[0]
            + mask_ref[0]
        )  # (S, block)
        out_ref[:] = jnp.broadcast_to(
            jnp.sum(s, axis=-1, keepdims=True)[None], out_ref.shape
        )

    d2 = d * d
    n = ps.filt_rows(d)
    S = ps.N_STRIPS
    B = W // block
    mk = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )

    def read_only(scal, F_st, Q_st, y_st, m_st):
        return pl.pallas_call(
            read_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                mk(d2), mk(d2), mk(1), mk(1),
            ],
            out_specs=pl.BlockSpec(
                (n, S, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, S, 128), jnp.float32),
        )(scal, F_st, Q_st, y_st, m_st)

    emit(
        bench="read_only_22planes",
        wall_ms=med(jax.jit(read_only), scal, F_st, Q_st, y_st, m_st) * 1e3,
    )

    # pass 1 alone.
    f_p1 = jax.jit(
        lambda *a: ps._strip_filter_pass1(*a, d=d, block=block, interpret=False)
    )
    emit(bench="pass1", wall_ms=med(f_p1, scal, F_st, Q_st, y_st, m_st) * 1e3)

    # pass 2 alone (prefixes fixed).
    totals = f_p1(scal, F_st, Q_st, y_st, m_st)
    ident_rows = tuple(k * d + k for k in range(d))
    prefixes = ps._strip_exclusive_prefixes(
        totals[:, :, 0], d, ps._filt_combine_rows, ident_rows, reverse=False
    )
    prefixes = jax.device_put(prefixes)
    f_p2 = jax.jit(
        lambda *a: ps._strip_filter_pass2(*a, d=d, block=block, interpret=False)
    )
    emit(
        bench="pass2",
        wall_ms=med(f_p2, scal, prefixes, F_st, Q_st, y_st, m_st) * 1e3,
    )

    # Production entry points.
    f_filt = jax.jit(
        lambda s, o: ps.strip_filter(
            s.Fs, s.Qs, s.P0, s.H, s.R, o, block=block
        )
    )
    emit(bench="strip_filter", wall_ms=med(f_filt, ssm, ys) * 1e3)
    f_lml = jax.jit(lambda s, o: lml_tl(s, o, True))
    emit(bench="lml", wall_ms=med(f_lml, ssm, ys) * 1e3)
    f_pkfs = jax.jit(lambda s, o: pkfs_from_tl(s, o, pallas=True))
    emit(bench="pkfs", wall_ms=med(f_pkfs, ssm, ys) * 1e3)

    # E_empty_scan: scan body replaced by identity (element construction,
    # carry plumbing, and outputs kept).  Garbage values, timing only.
    orig = ps._strip_chunked_scan

    def empty_scan(rows, combine_rows, dd, ident_rows, reverse, init):
        S_, Lb = rows[0].shape
        edge = [
            r[:, 0:1] if reverse else r[:, Lb - 1 : Lb] for r in rows
        ]
        return rows, edge

    try:
        ps._strip_chunked_scan = empty_scan
        f_lml_e = jax.jit(lambda s, o: lml_tl(s, o, True))
        emit(bench="E_lml_empty_scan", wall_ms=med(f_lml_e, ssm, ys) * 1e3)
    finally:
        ps._strip_chunked_scan = orig

    os.makedirs("results", exist_ok=True)
    with open("results/r4_attrib.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
