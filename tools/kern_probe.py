#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Latency decomposition of the fused MC kernel's step loop.

The roofline (BENCHMARKS.md) shows ~13 µs/step against ~2 µs of pure
VPU math at the headline shape (R=10, K=128, Nq=128) — this probe
builds a ladder of stripped-down Pallas kernels with the same loop
structure and measures where the other ~11 µs live:

  loop        — empty fori_loop (Mosaic loop overhead floor)
  prng        — + one hardware-PRNG draw (R, K) per iteration
  ff          — + sphere ff eval on (R, K, Nq) (2 transcendentals/elem)
  solve       — + the closed-form chi2 solve reductions
  solve_mom   — like solve, but chi2 via the moment identity
                (chi2 = s_uyy − 2a·s_xy + a²·s_xx from the sums already
                computed) instead of the residual pass: measures the
                ceiling of that optimization BEFORE committing to its
                f32-cancellation risk in production
  writes      — + the dynamic-slice state writes (the full step)

Each rung times `chunk_steps` iterations in one kernel launch, repeated
inside a jitted fori over launches so launch overhead amortizes.
Run on the chip, one TPU process at a time.  Prints one JSON line per
rung.
"""
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

R, K, NQ, N = 10, 128, 128, 300
CHUNK = 2048
LAUNCHES = 8


def build(level: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, y_ref, u_ref, seed_ref, ibank_in, ft_in,
               ibank_ref, ft_ref, out_ref):
        del ibank_in, ft_in, out_ref
        pltpu.prng_seed(seed_ref[0])
        q3 = q_ref[:].reshape(1, 1, NQ)
        y3 = y_ref[:].reshape(1, 1, NQ)
        u3 = u_ref[:].reshape(1, 1, NQ)
        kiota = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)

        def body(step, ri):
            if level != "loop":
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((R, K)), jnp.int32)
                u24 = jax.lax.shift_right_logical(bits, jnp.int32(8))
                urand = u24.astype(jnp.float32) * jnp.float32(2.0 ** -24)
            if level in ("ff", "solve", "solve_mom", "writes"):
                r_c = (1.0 + urand)[:, :, None] * jnp.float32(1e1)
                x = q3 * r_c                                  # (R,K,NQ)
                s, c = jnp.sin(x), jnp.cos(x)
                ffv = 3.0 * (s - x * c) / (x * x * x)
                rows = jnp.minimum(ffv * ffv, jnp.float32(1e30))
            if level in ("solve", "solve_mom", "writes"):
                old = ibank_ref[:, pl.ds(ri, 1), :]
                ft = ft_ref[:]
                xt = ft[:, None, :] - old + rows
                ux = u3 * xt
                s_x = jnp.sum(ux, axis=2)
                s_xx = jnp.sum(ux * xt, axis=2)
                s_xy = jnp.sum(ux * y3, axis=2)
                a = s_xy / jnp.maximum(s_xx, jnp.float32(1e-30))
                if level == "solve_mom":
                    # chi2 from the sums already in hand (s_uyy is a
                    # data constant, folded to 1.0 here): removes the
                    # residual pass and its (R, K, Nq) reduction
                    chi2 = jnp.float32(1.0) - 2.0 * a * s_xy + a * a * s_xx
                else:
                    res = y3 - a[:, :, None] * xt
                    chi2 = jnp.sum(u3 * res * res, axis=2)
                min_chi = jnp.min(chi2, axis=1, keepdims=True)
                onehot = (kiota == jnp.min(
                    jnp.where(chi2 <= min_chi, kiota, jnp.int32(K)),
                    axis=1, keepdims=True)).astype(jnp.float32)
            if level == "writes":
                oh3 = onehot[:, :, None]
                best_x = jnp.sum(xt * oh3, axis=1)
                best_rows = jnp.sum(rows * oh3, axis=1)
                accept = min_chi < jnp.float32(1e30)
                ibank_ref[:, pl.ds(ri, 1), :] = jnp.where(
                    accept[:, :, None], best_rows[:, None, :], old)
                ft_ref[:] = jnp.where(accept, best_x, ft)
            # consume each rung's product without the full write path
            # (vector stores only: Mosaic cannot store scalars to VMEM)
            if level == "loop":
                ft_ref[:] = ft_ref[:] + jnp.float32(1e-30)
            elif level == "prng":
                ft_ref[:, 0:K] = ft_ref[:, 0:K] + urand * jnp.float32(0.0)
            elif level == "ff":
                ft_ref[:] = (ft_ref[:]
                             + jnp.sum(rows, axis=1) * jnp.float32(1e-38))
            elif level in ("solve", "solve_mom"):
                ft_ref[:] = (ft_ref[:]
                             + jnp.sum(onehot, axis=1, keepdims=True)
                             * jnp.float32(1e-38))
            return jnp.where(ri + 1 >= jnp.int32(N), jnp.int32(0),
                             ri + jnp.int32(1))

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(CHUNK), body,
                          jnp.int32(0))

    smem = pltpu.SMEM

    def full(shape, space=pltpu.VMEM):
        nd = len(shape)
        return pl.BlockSpec(shape,
                            lambda: tuple(jnp.int32(0) for _ in range(nd)),
                            memory_space=space)

    fn = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, N, NQ), jnp.float32),   # ibank
            jax.ShapeDtypeStruct((R, NQ), jnp.float32),      # ft
            jax.ShapeDtypeStruct((1, 1), jnp.float32),       # scalar out
        ),
        in_specs=[
            full((1, NQ)), full((1, NQ)), full((1, NQ)),
            full((1,), smem),
            full((R, N, NQ)), full((R, NQ)),
        ],
        out_specs=(full((R, N, NQ)), full((R, NQ)), full((1, 1))),
        input_output_aliases={4: 0, 5: 1},
    )

    @jax.jit
    def launch(ibank, ft, seed):
        q = jnp.linspace(0.1, 2.0, NQ, dtype=jnp.float32).reshape(1, NQ)
        y = jnp.ones((1, NQ), jnp.float32)
        u = jnp.ones((1, NQ), jnp.float32)
        def body(i, carry):
            ib, f = carry
            ib, f, _ = fn(q, y, u, seed + i, ib, f)
            return ib, f
        return jax.lax.fori_loop(0, LAUNCHES, body, (ibank, ft))

    return launch


def main():
    import jax
    import jax.numpy as jnp
    for level in ("loop", "prng", "ff", "solve", "solve_mom", "writes"):
        launch = build(level)
        ibank = jnp.zeros((R, N, NQ), jnp.float32)
        ft = jnp.zeros((R, NQ), jnp.float32)
        seed = jnp.zeros((1,), jnp.int32)
        ib, f = launch(ibank, ft, seed)          # compile + warm
        np.asarray(f)
        t0 = time.perf_counter()
        ib, f = launch(ibank, ft, seed)
        np.asarray(f)
        wall = time.perf_counter() - t0
        us = wall / (LAUNCHES * CHUNK) * 1e6
        print(json.dumps({"level": level, "us_per_step": round(us, 3),
                          "wall_s": round(wall, 4)}), flush=True)


if __name__ == "__main__":
    main()
