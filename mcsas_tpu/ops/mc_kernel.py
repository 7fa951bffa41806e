# -*- coding: utf-8 -*-
"""Fused Pallas TPU kernel: an entire MC chunk in one kernel launch.

The XLA scan path (core/engine.py) pays a fixed ~20-25 µs per sequential
step in op-dispatch/pipeline overheads.  This kernel keeps the whole
ensemble state — the (R, N, Nq) intensity bank, contribution parameters and
fit scalars — resident in VMEM and executes ``chunk_steps`` accept/reject
moves in a single ``fori_loop``, with the TPU hardware PRNG generating
proposals in-kernel.  Math is identical to McSASEngine._step (same
closed-form solve, same best-of-K accept), so the XLA path remains the
semantics oracle; only the RNG stream differs (hardware PRNG vs threefry).

Eligibility: models whose form factor is purely elementwise in q
(``SASModel.elementwise_q``) without smearing: the candidate evaluation is
then a (R, K, Nq) broadcast — Sphere, LMADenseSphere, GaussianChain,
SphericalCoreShell.  Everything else uses the XLA scan path.

VMEM budget at the default benchmark shape (R=10, N=300, Nq=128, K=128):
bank 1.5 MB + parameters 1.5 MB + (R, K, Nq) temporaries ≈ 5 MB ≪ 16 MB.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = logging.getLogger(__name__)

_LANE = 128
_F32_INV24 = float(2.0 ** -24)
_DECADES = {"logdec1": 1.0, "logdec2": 2.0, "logdec3": 3.0}


def supports(engine) -> bool:
    """True when the fused kernel can run this engine's configuration."""
    bound, data, cfg = engine.bound, engine.data, engine.cfg
    return (bound.model.elementwise_q
            and not (data.uses_smearing and bound.model.can_smear)
            and jnp.dtype(cfg.dtype) == jnp.float32
            and bound.n_active >= 1)


# VMEM ceiling for 'auto' mode: the kernel holds the whole state plus the
# (R, K, Nq) candidate temporaries resident; above this budget 'auto'
# degrades to the XLA scan path instead of failing at compile/run time
# (use_pallas='on' stays a force-override).
_VMEM_BUDGET = 12 * 2 ** 20


def vmem_bytes(engine, n_reps=None) -> int:
    """Rough VMEM footprint of the fused kernel for this engine.

    *n_reps* overrides the repetition count (the sharded ensemble runs
    the kernel on a per-device rep shard).
    """
    cfg, bound = engine.cfg, engine.bound
    r = int(cfg.num_reps if n_reps is None else n_reps)
    # tuple-tolerant like _pad_fit_grid: smearing/table grids are tuples
    # (currently short-circuited by supports(), but eligibility ordering
    # must not be able to crash engine construction)
    main = engine.grid
    while isinstance(main, tuple):      # table/smeared grids nest tuples
        main = main[0]
    nq = pad_lanes(int(main.shape[0]))
    n = int(cfg.num_contribs)
    k = int(cfg.candidates_per_step)
    p = max(bound.n_active, 1)
    bank = r * n * nq * 4
    params = r * n * p * 4
    # ffv/rows/x/ux + residual + one slack copy for fusion temporaries
    temps = 6 * r * k * nq * 4
    fixed = 3 * nq * 4 + 2 * r * nq * 4
    return bank + params + temps + fixed


def fits_vmem(engine, n_reps=None) -> bool:
    return vmem_bytes(engine, n_reps) <= _VMEM_BUDGET


def pad_lanes(n: int) -> int:
    return ((n + _LANE - 1) // _LANE) * _LANE


def _hash_bits(seed, step, salt, shape):
    """Stateless 32-bit avalanche hash — interpret-mode stand-in for the
    TPU hardware PRNG (pltpu.prng_* has no CPU lowering).  Statistical
    quality is adequate for MC smoke validation."""
    r, k = shape
    idx = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * jnp.int32(k)
           + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    h = (seed ^ (step * jnp.int32(-1640531527))
         ^ (jnp.int32(salt) * jnp.int32(40503))) + idx * jnp.int32(-2048144789)
    for shift, mult in ((13, -1640531527), (11, -2048144789),
                        (15, -1028477387)):
        h = h ^ jax.lax.shift_right_logical(h, jnp.int32(shift))
        h = h * jnp.int32(mult)
    return h


def _candidate_solve(x, u3, y3, s_u, s_uy, find_bg, pos_bg, n_fit,
                     kiota, k_cand):
    """Closed-form per-candidate (scale, background) solve + first-match
    best pick, shared by both kernel variants (mirrors fitcore's
    degeneracy guards).  *x* is (R, K, nq); returns (min_chi (R,1),
    onehot (R,K), a (R,K), b (R,K))."""
    ux = u3 * x
    s_x = jnp.sum(ux, axis=2)                  # (R, K)
    s_xx = jnp.sum(ux * x, axis=2)
    s_xy = jnp.sum(ux * y3, axis=2)
    # scale-invariant degeneracy guards, mirroring fitcore
    rel_eps = jnp.float32(1e-6)
    xx_zero = s_xx <= 0.0
    a_nobg = jnp.where(
        xx_zero, jnp.zeros_like(s_xy),
        s_xy / jnp.where(xx_zero, jnp.ones_like(s_xx), s_xx))
    if find_bg:
        denom = s_u * s_xx
        det = denom - s_x * s_x
        degen = xx_zero | (det <= rel_eps * denom)
        safe = jnp.where(degen, jnp.ones_like(det), det)
        a = (s_u * s_xy - s_x * s_uy) / safe
        b = (s_uy - a * s_x) / s_u
        a = jnp.where(degen, a_nobg, a)
        b = jnp.where(degen, (s_uy - a_nobg * s_x) / s_u, b)
        if pos_bg:
            neg = b < 0.0
            a = jnp.where(neg, a_nobg, a)
            b = jnp.maximum(b, 0.0)
    else:
        a = a_nobg
        b = jnp.zeros_like(a)
    r = y3 - a[:, :, None] * x - b[:, :, None]
    chi2 = jnp.sum(u3 * r * r, axis=2) * jnp.float32(1.0 / n_fit)
    # best candidate per rep (first-match one-hot, no gather)
    min_chi = jnp.min(chi2, axis=1, keepdims=True)           # (R, 1)
    masked = jnp.where(chi2 <= min_chi, kiota, jnp.int32(k_cand))
    bidx = jnp.min(masked, axis=1, keepdims=True)            # (R, 1)
    onehot = (kiota == bidx).astype(jnp.float32)             # (R, K)
    return min_chi, onehot, a, b


def _onehot_rowsum(v, onehot):
    """One-hot-masked row sum (R, K) → (R, 1), lowered as a matmul.

    Bitwise-equal to ``jnp.sum(v * onehot, axis=1, keepdims=True)``
    (every non-selected term is exactly 0.0, so accumulation order
    cannot change the result), but avoids the 2D→column
    ``vector.multi_reduction`` that Mosaic cannot legalize at a
    single-repetition block ("Not implemented: Offset change", observed
    on v5e at num_reps=1 and on per-device rep shards of 1).

    precision=HIGHEST is LOAD-BEARING for the bitwise claim: the
    default matmul precision truncates f32 operands to bf16 on the MXU
    — measured 2.6e-3 rel deviation in scale/background on chip, and
    since cand_block routes through here it would round every ACCEPTED
    parameter (~0.2%).  The fp32 contraction keeps the selected value
    exact and still legalizes at a 1-rep block (verified on v5e;
    negative control: tests/test_tpu_pallas.py::
    test_hw_prefetch_matches_scan_numerics fails at default precision)."""
    k = v.shape[1]
    return jax.lax.dot_general(
        v * onehot, jnp.ones((k, 1), jnp.float32),
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def rep_block_size(engine) -> int:
    """Largest divisor of num_reps whose per-block state fits VMEM.

    The kernel grids over repetition blocks (sequential on the core), so
    the resident set per program is the BLOCK's bank + temporaries — the
    VMEM ceiling bounds the block, not the ensemble.  Returns 0 when even
    a single repetition does not fit."""
    r = int(engine.cfg.num_reps)
    for rb in range(r, 0, -1):
        if r % rb == 0 and fits_vmem(engine, n_reps=rb):
            return rb
    return 0


def build_chunk_fn(engine, interpret=None, rep_block=None):
    """Returns chunk_fn(state, ri) -> (state, ri) using the fused kernel.

    The engine's grid/consts must already be lane-padded (u = 0 on padded
    lanes so they are invisible to every reduction).  On a non-TPU compute
    device the kernel runs in interpreter mode (CI validation of the
    kernel logic without hardware).

    Large ensembles grid over repetition BLOCKS (*rep_block* reps per
    program, auto-sized to VMEM): each program runs the whole chunk for
    its block with the block's intensity bank resident — the ensemble
    size is no longer VMEM-bounded.
    """
    if interpret is None:
        interpret = engine._compute_device().platform != "tpu"
    bound = engine.bound
    cfg = engine.cfg
    n_reps = cfg.num_reps
    rb = rep_block if rep_block is not None else rep_block_size(engine)
    if not rb or n_reps % rb:
        raise ValueError(f"invalid rep_block {rb} for {n_reps} reps")
    n_blocks = n_reps // rb
    n = cfg.num_contribs
    k_cand = cfg.candidates_per_step
    n_p = bound.n_active
    nq = int(engine.grid.shape[0])
    assert nq % _LANE == 0, "grid must be lane-padded for the pallas path"
    comp2 = 2.0 * cfg.compensation_exponent
    v_ref = bound.reference_volume()
    # engine.w_ref = v_ref^2c · i_ref → recover the ff-magnitude norm so
    # kernel rows match the XLA intensity_row exactly
    inv_i_ref = (v_ref ** comp2) / engine.w_ref
    crit = float(cfg.convergence_criterion)
    max_iter = int(cfg.max_iterations)
    chunk = int(cfg.chunk_steps)
    find_bg = cfg.find_background
    pos_bg = cfg.positive_background
    n_fit = int(engine.consts.n)
    fixed = {name: float(v) for name, v in bound.fixed}
    generators = bound.generators
    k_local = engine._k_local()
    k_global = k_cand - k_local
    local_scale = float(cfg.local_scale)
    # same form-factor selection as make_intensity_kernels (the kernel is
    # float32 by eligibility): rows written by the kernel must be bitwise
    # consistent with the ibank rows written by engine._init_rep
    model_ff = bound.model.ff
    if bound.model.ff_fast is not None:
        model_ff = bound.model.ff_fast
    # identical float32 overflow guard as make_intensity_kernels
    # (incl. the num_contribs division of the clamp budget)
    sigma = np.asarray(engine.data.fu, np.float64).copy()
    sigma[sigma == 0.0] = 1.0
    row_clamp = float(max(
        (3e37 / (max(float(np.max(1.0 / sigma ** 2)), 1e-300)
                 * float(engine.data.count))) ** 0.5
        / max(float(n), 1.0), 1e3))

    def kernel(q_ref, y_ref, u_ref, sc_ref, ranges_ref, seed_ref, ri_ref,
               rset_in, ibank_in, ft_in, fstate_in, istate_in,
               rset_ref, ibank_ref, ft_ref, fstate_ref, istate_ref,
               ri_out_ref):
        # program b owns the repetition block [b*rb, (b+1)*rb): rset and
        # ibank arrive as per-block VMEM blocks; the small 2D state
        # (ft/fstate/istate) stays a full array (Mosaic tiling rules bar
        # blocking a small second-to-last dim) and is row-sliced here
        blk = pl.program_id(0)
        off = blk * jnp.int32(rb)
        if not interpret:
            pltpu.prng_seed(seed_ref[blk])
        # copy aliased inputs are the same buffers as outputs; the *_in
        # refs are unused but keep the alias bookkeeping explicit
        del rset_in, ibank_in, ft_in, fstate_in, istate_in

        q3 = q_ref[:].reshape(1, 1, nq)
        y3 = y_ref[:].reshape(1, 1, nq)
        u3 = u_ref[:].reshape(1, 1, nq)
        y2 = y_ref[:]                      # (1, nq)
        u2 = u_ref[:]
        s_u = sc_ref[0]
        s_uy = sc_ref[1]
        eps = jnp.float32(1e-30)

        # drift-free start: rebuild totals from the bank
        ft_ref[pl.ds(off, rb)] = jnp.sum(ibank_ref[:], axis=1)

        kiota = jax.lax.broadcasted_iota(jnp.int32, (rb, k_cand), 1)

        def body(step, ri):
            # ---- proposals: hardware PRNG, one (R, K) draw per parameter;
            # with local moves, candidate columns >= k_global perturb the
            # slot's current value log-uniformly (clipped to the range)
            pdict = dict(fixed)
            cands = []
            if k_local:
                cur_block = rset_ref[:, pl.ds(ri, 1), :]   # (R, 1, P)
            for ip, name in enumerate(bound.active):
                if interpret:
                    ibits = _hash_bits(seed_ref[blk], step, ip,
                                       (rb, k_cand))
                else:
                    ibits = pltpu.bitcast(
                        pltpu.prng_random_bits((rb, k_cand)),
                        jnp.int32)
                # top 24 bits → [0, 1); Mosaic lacks uint32→f32 casts, so
                # work in int32 with a logical shift before casting
                u24 = jax.lax.shift_right_logical(ibits, jnp.int32(8))
                u_raw = u24.astype(jnp.float32) * _F32_INV24
                u_gen = u_raw
                gen = generators[ip]
                if gen in _DECADES:
                    dec = _DECADES[gen]
                    u_gen = (jnp.exp2(u_raw * (dec * 3.321928094887362))
                             - 1.0) / (10.0 ** dec)
                lo = ranges_ref[2 * ip]
                hi = ranges_ref[2 * ip + 1]
                cand = lo + u_gen * (hi - lo)          # (R, K)
                if k_local:
                    # local columns use the untransformed uniform
                    cur_p = cur_block[:, :, ip]        # (R, 1)
                    local = jnp.clip(
                        cur_p * jnp.exp((2.0 * u_raw - 1.0)
                                        * jnp.float32(local_scale)),
                        lo, hi)
                    cand = jnp.where(kiota >= jnp.int32(k_global),
                                     local, cand)
                cands.append(cand)
                pdict[name] = cand[:, :, None]         # (R, K, 1)

            # ---- candidate intensity rows (model ff is elementwise in q)
            ffv = model_ff(q3, pdict)                  # (R, K, nq)
            vol = bound.model.volume(pdict)
            if not hasattr(vol, "ndim") or vol.ndim == 0:
                vol = jnp.full((rb, k_cand, 1), vol, jnp.float32)
            w = (vol / v_ref) ** comp2 * jnp.float32(inv_i_ref)
            rows = jnp.minimum(ffv * ffv * w,
                               jnp.float32(row_clamp))  # (R, K, nq)

            # ---- incremental totals and closed-form solve per candidate
            old_row = ibank_ref[:, pl.ds(ri, 1), :]    # (rb, 1, nq)
            ft = ft_ref[pl.ds(off, rb)]                # (rb, nq)
            x = ft[:, None, :] - old_row + rows        # (R, K, nq)
            min_chi, onehot, a, b = _candidate_solve(
                x, u3, y3, s_u, s_uy, find_bg, pos_bg, n_fit,
                kiota, k_cand)
            oh3 = onehot[:, :, None]
            best_x = jnp.sum(x * oh3, axis=1)                    # (R, nq)
            best_rows = jnp.sum(rows * oh3, axis=1)
            best_a = _onehot_rowsum(a, onehot)                   # (R, 1)
            best_b = _onehot_rowsum(b, onehot)

            # ---- accept/reject (vectorized across reps)
            conval = fstate_ref[pl.ds(off, rb), 2:3]             # (rb, 1)
            n_it = istate_ref[pl.ds(off, rb), 0:1]
            active = ((conval > jnp.float32(crit))
                      & (n_it < jnp.int32(max_iter)))
            accept = active & (min_chi < conval)
            acc3 = accept[:, :, None]                            # (R, 1, 1)

            ibank_ref[:, pl.ds(ri, 1), :] = jnp.where(
                acc3, best_rows[:, None, :], old_row)
            ft_ref[pl.ds(off, rb)] = jnp.where(accept, best_x, ft)
            old_p = rset_ref[:, pl.ds(ri, 1), :]                 # (R, 1, P)
            cand_block = jnp.concatenate(
                [_onehot_rowsum(c, onehot) for c in cands],
                axis=1)[:, None, :]                              # (R, 1, P)
            rset_ref[:, pl.ds(ri, 1), :] = jnp.where(
                acc3, cand_block, old_p)
            rows_b = pl.ds(off, rb)
            fstate_ref[rows_b, 0:1] = jnp.where(accept, best_a,
                                                fstate_ref[rows_b, 0:1])
            fstate_ref[rows_b, 1:2] = jnp.where(accept, best_b,
                                                fstate_ref[rows_b, 1:2])
            fstate_ref[rows_b, 2:3] = jnp.where(accept, min_chi, conval)
            istate_ref[rows_b, 0:1] = (n_it + jnp.int32(k_cand)
                                       * active.astype(jnp.int32))
            istate_ref[rows_b, 1:2] = (istate_ref[rows_b, 1:2]
                                       + accept.astype(jnp.int32))
            next_ri = ri + jnp.int32(1)
            return jnp.where(next_ri >= jnp.int32(n), jnp.int32(0), next_ri)

        # int32 bounds: under global x64 plain python bounds would make the
        # loop index int64, which Mosaic cannot cast back
        ri_final = jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk), body,
                                     ri_ref[0])
        ri_out_ref[0] = ri_final

    grid_1d = engine.grid.reshape(1, nq)
    y_1d = engine.consts.y.reshape(1, nq)
    u_1d = engine.consts.u.reshape(1, nq)
    sc = jnp.asarray([engine.consts.s_u, engine.consts.s_uy], jnp.float32)
    ranges = jnp.asarray(
        np.asarray(bound.ranges, np.float64).reshape(-1), jnp.float32)

    # One grid dimension over repetition blocks: program b owns reps
    # [b·rb, (b+1)·rb).  The big 3D arrays (rset, ibank) arrive as
    # per-block VMEM blocks — leading-axis blocking with full trailing
    # dims satisfies Mosaic's tiling rules; index-map components are
    # CAST TO int32 (under package-wide x64 the literals would become
    # i64, which Mosaic cannot legalize).  The small 2D state and the
    # constants stay FULL arrays (a blocked small second-to-last dim
    # violates the (8, 128) tiling rule); the kernel row-slices them by
    # program id, and sequential grid semantics make the disjoint-row
    # writes safe.
    # index maps are created INSIDE the lambdas with explicit int32
    # components: they may not capture constants, python literals would
    # promote to i64 under package-wide x64 (Mosaic cannot legalize i64
    # returns), and pallas SYNTHESIZES i64 maps for spec-less arrays
    # once a grid exists — so every spec is explicit
    def rep_blocked(*tail):
        nt = len(tail)
        return pl.BlockSpec(
            (rb,) + tail,
            lambda i: (jnp.int32(i),) + tuple(
                jnp.int32(0) for _ in range(nt)),
            memory_space=pltpu.VMEM)

    def full(shape, space=pltpu.VMEM):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i: tuple(jnp.int32(0) for _ in range(nd)),
            memory_space=space)

    smem = pltpu.SMEM
    pallas_fn = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((n_reps, n, n_p), jnp.float32),   # rset
            jax.ShapeDtypeStruct((n_reps, n, nq), jnp.float32),    # ibank
            jax.ShapeDtypeStruct((n_reps, nq), jnp.float32),       # ft
            jax.ShapeDtypeStruct((n_reps, 8), jnp.float32),        # fstate
            jax.ShapeDtypeStruct((n_reps, 8), jnp.int32),          # istate
            jax.ShapeDtypeStruct((1,), jnp.int32),                 # ri
        ),
        in_specs=[
            full((1, nq)),                           # q
            full((1, nq)),                           # y
            full((1, nq)),                           # u
            full((2,), smem),                        # sc
            full((2 * n_p,), smem),                  # ranges
            full((n_blocks,), smem),                 # seeds
            full((1,), smem),                        # ri0
            rep_blocked(n, n_p),                     # rset (blocked)
            rep_blocked(n, nq),                      # ibank (blocked)
            full((n_reps, nq)),                      # ft
            full((n_reps, 8)),                       # fstate
            full((n_reps, 8)),                       # istate
        ],
        out_specs=(
            rep_blocked(n, n_p),
            rep_blocked(n, nq),
            full((n_reps, nq)),
            full((n_reps, 8)),
            full((n_reps, 8)),
            full((1,), smem),
        ),
        input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3, 11: 4},
        interpret=interpret,
    )

    @jax.jit
    def chunk_fn(state, ri):
        # advance the per-rep threefry keys; each rep BLOCK seeds the
        # hardware PRNG from its first rep's fresh subkey  [fused kernel]
        keys = jax.vmap(jax.random.split)(state.key)
        new_key = keys[:, 0]
        seeds = keys[::rb, 1, 0].astype(jnp.int32)             # (blocks,)
        fstate = jnp.concatenate(
            [state.scale[:, None], state.background[:, None],
             state.conval[:, None],
             jnp.zeros((n_reps, 5), jnp.float32)], axis=1)
        istate = jnp.concatenate(
            [state.n_iter[:, None], state.n_moves[:, None],
             jnp.zeros((n_reps, 6), jnp.int32)], axis=1)
        rset, ibank, ft, fstate, istate, ri_out = pallas_fn(
            grid_1d, y_1d, u_1d, sc, ranges, seeds,
            ri.reshape(1).astype(jnp.int32),
            state.rset, state.ibank, state.ft, fstate, istate)
        new_state = state._replace(
            key=new_key, rset=rset, ibank=ibank, ft=ft,
            scale=fstate[:, 0], background=fstate[:, 1],
            conval=fstate[:, 2],
            n_iter=istate[:, 0], n_moves=istate[:, 1])
        return new_state, ri_out[0]

    return chunk_fn


# --------------------------------------------------------------------------
# Prefetched-proposal variant: models whose candidate rows cannot be
# evaluated in-kernel (param-table tier — Mosaic's dynamic_gather only
# spans 8 sublanes, measured; see docs/DESIGN.md) but whose proposals are
# state-independent (no local moves).  A whole segment of steps is drawn
# and row-evaluated in ONE batched XLA pass (efficient batched row
# gathers / smearing contraction), and the kernel streams the
# (S, R, K, nq) row bank from HBM block-by-block via the grid pipeline —
# no per-step scan dispatch, no in-kernel gathers, no in-kernel PRNG.
# Covers the reference hot loop for every table-tier model
# (/root/reference/src/mcsas/mcsas/mcsas.py:354-404).
# --------------------------------------------------------------------------

# HBM footprint cap for one segment's prefetched candidate rows
_PREFETCH_HBM_BUDGET = 64 * 2 ** 20


def supports_prefetch(engine) -> bool:
    """True when the prefetched-proposal kernel can run this engine.

    Requires the param-table tier (quadrature models prefetching raw
    quadrature would re-inflate compile times).  Local moves — which
    perturb the slot's CURRENT value — are supported too: a segment of
    ``seg <= num_contribs`` steps visits strictly distinct slots (the
    cursor cycles 0..N-1), so every slot's current value at its step
    equals its segment-start value and the whole local proposal stream
    is computable in XLA from the resident ``rset`` before the launch
    (``prefetch_seg_steps`` enforces the cap)."""
    cfg = engine.cfg
    if not (getattr(engine, "uses_table", False)
            and jnp.dtype(cfg.dtype) == jnp.float32
            and engine.bound.n_active >= 1):
        return False
    # lane padding must be possible: table rows whose width is not the
    # fit-grid length (e.g. Kholodenko's smeared flattened-locs rows,
    # contracted inside the lookup) cannot be zero-padded per column
    inner, values = engine.grid
    main = inner
    while isinstance(main, tuple):
        main = main[0]
    nq = int(main.shape[0])
    return nq % _LANE == 0 or int(values.shape[1]) == nq


def prefetch_vmem_bytes(engine, n_reps=None) -> int:
    """VMEM footprint of the prefetch kernel: the fused-kernel resident
    set plus the double-buffered streamed row block."""
    cfg = engine.cfg
    r = int(cfg.num_reps if n_reps is None else n_reps)
    k = int(cfg.candidates_per_step)
    nq = pad_lanes(int(engine.consts.y.shape[0]))
    return vmem_bytes(engine, n_reps) + 2 * r * k * nq * 4


def prefetch_fits_vmem(engine, n_reps=None) -> bool:
    return prefetch_vmem_bytes(engine, n_reps) <= _VMEM_BUDGET


def prefetch_rep_block(engine) -> int:
    """Largest divisor of num_reps whose prefetch-kernel state fits VMEM
    (0 when even one repetition does not fit)."""
    r = int(engine.cfg.num_reps)
    for rb in range(r, 0, -1):
        if r % rb == 0 and prefetch_vmem_bytes(engine, rb) <= _VMEM_BUDGET:
            return rb
    return 0


def prefetch_seg_steps(engine) -> int:
    """Steps per prefetch segment: bounded by the HBM budget for the
    (S, R, K, nq) row bank and by the configured chunk size.  With local
    moves the segment is additionally capped at ``num_contribs`` so the
    slots visited within one segment are strictly distinct — the
    precondition for precomputing local proposals from the segment-start
    ``rset`` (see supports_prefetch)."""
    cfg = engine.cfg
    nq = pad_lanes(int(engine.consts.y.shape[0]))
    per_step = int(cfg.num_reps) * int(cfg.candidates_per_step) * nq * 4
    cap = int(cfg.chunk_steps)
    if engine._k_local():
        cap = min(cap, int(cfg.num_contribs))
    return max(1, min(cap, _PREFETCH_HBM_BUDGET // max(per_step, 1)))


def build_prefetch_chunk_fn(engine, interpret=None, rep_block=None,
                            seg_steps=None, row_dtype=None):
    """Returns chunk_fn(state, ri) -> (state, ri) using the prefetch
    kernel: one call advances ``seg_steps`` MC steps in a single launch
    (proposal draw + batched row evaluation in XLA, solve/accept
    sequence in Pallas).

    The engine's grid/consts must already be lane-padded (u = 0 on
    padded lanes).  The proposal stream is IDENTICAL to the XLA scan
    path (same threefry draws via ``engine._draw_chunk_proposals``, same
    ``intensity_row`` evaluation); only the solve's reduction
    association differs.

    *row_dtype* is an A/B probe knob (tools/bf16_rows_probe.py): the
    streamed candidate-row tensor — the kernel's dominant HBM stream —
    is cast to this dtype in HBM and converted back to float32 at VMEM
    entry.  Production uses float32 (the measured bf16 verdict lives in
    BENCHMARKS.md); the solve/accept math is float32 either way.
    """
    row_dtype = jnp.float32 if row_dtype is None else jnp.dtype(row_dtype)
    if interpret is None:
        interpret = engine._compute_device().platform != "tpu"
    bound = engine.bound
    cfg = engine.cfg
    n_reps = cfg.num_reps
    rb = rep_block if rep_block is not None else prefetch_rep_block(engine)
    if not rb or n_reps % rb:
        raise ValueError(f"invalid rep_block {rb} for {n_reps} reps")
    n_blocks = n_reps // rb
    seg = seg_steps if seg_steps is not None else prefetch_seg_steps(engine)
    n = cfg.num_contribs
    k_cand = cfg.candidates_per_step
    n_p = bound.n_active
    nq = int(engine.consts.y.shape[0])
    assert nq % _LANE == 0, "grid must be lane-padded for the pallas path"
    crit = float(cfg.convergence_criterion)
    max_iter = int(cfg.max_iterations)
    find_bg = cfg.find_background
    pos_bg = cfg.positive_background
    n_fit = int(engine.consts.n)

    # With local moves the chunk_fn GATHERS state.rset in XLA (the
    # segment-start slot values the local proposals are centered on)
    # while the kernel's aliased output overwrites that same buffer
    # in place.  Inside the single-launch drive (a lax.while_loop over
    # chunk bodies on the real chip) this read-vs-donated-write pair
    # silently corrupts the trajectory: accepted improvements are
    # partially lost and repetitions grind 10-100x the proposals
    # (measured: Kholodenko 94.4M vs 2.2M total proposals, identical
    # seed; host-loop launches of the SAME chunk_fn are clean, and
    # interpret mode does not reproduce it — same family as the
    # init-fusion hazard in CLAUDE.md).  Fix: when a local-move gather
    # exists, rset is NOT aliased — it stays a read-only input and the
    # kernel copies it into the fresh output block at segment start
    # (one (R, N, P) VMEM copy per segment, ~36 KB at the bench shape).
    alias_rset = engine._k_local() == 0

    def kernel(y_ref, u_ref, sc_ref, slots_ref,
               rows_in, cands_in, rset_in, ibank_in, ft_in, fstate_in,
               istate_in,
               rset_ref, ibank_ref, ft_ref, fstate_ref, istate_ref):
        # program (b, s): one MC step for repetition block b.  rows/cands
        # arrive as per-(step, block) VMEM blocks streamed by the grid
        # pipeline; big 3D state (rset/ibank) as per-block VMEM blocks;
        # small 2D state stays full-array, row-sliced by program id
        # (sequential TPU grid semantics make disjoint-row writes safe).
        blk = pl.program_id(0)
        off = blk * jnp.int32(rb)
        s = pl.program_id(1)
        del ibank_in, ft_in, fstate_in, istate_in

        y3 = y_ref[:].reshape(1, 1, nq)
        u3 = u_ref[:].reshape(1, 1, nq)
        s_u = sc_ref[0]
        s_uy = sc_ref[1]
        ri = slots_ref[s]

        # drift-free segment start: rebuild totals from the bank; the
        # un-aliased rset output starts uninitialized and is seeded from
        # the read-only input block here
        @pl.when(s == jnp.int32(0))
        def _():
            ft_ref[pl.ds(off, rb)] = jnp.sum(ibank_ref[:], axis=1)
            if not alias_rset:
                rset_ref[:] = rset_in[:]
        if alias_rset:
            del rset_in

        kiota = jax.lax.broadcasted_iota(jnp.int32, (rb, k_cand), 1)
        rows = rows_in[0].astype(jnp.float32)          # (rb, K, nq)
        cand_p = cands_in[0]                           # (rb, K, P)

        # ---- incremental totals and closed-form solve per candidate
        old_row = ibank_ref[:, pl.ds(ri, 1), :]        # (rb, 1, nq)
        ft = ft_ref[pl.ds(off, rb)]                    # (rb, nq)
        x = ft[:, None, :] - old_row + rows            # (rb, K, nq)
        min_chi, onehot, a, b = _candidate_solve(
            x, u3, y3, s_u, s_uy, find_bg, pos_bg, n_fit, kiota, k_cand)
        oh3 = onehot[:, :, None]
        best_x = jnp.sum(x * oh3, axis=1)              # (rb, nq)
        best_rows = jnp.sum(rows * oh3, axis=1)
        best_a = _onehot_rowsum(a, onehot)
        best_b = _onehot_rowsum(b, onehot)

        # ---- accept/reject (vectorized across the block's reps)
        rows_b = pl.ds(off, rb)
        conval = fstate_ref[rows_b, 2:3]               # (rb, 1)
        n_it = istate_ref[rows_b, 0:1]
        active = ((conval > jnp.float32(crit))
                  & (n_it < jnp.int32(max_iter)))
        accept = active & (min_chi < conval)
        acc3 = accept[:, :, None]                      # (rb, 1, 1)

        ibank_ref[:, pl.ds(ri, 1), :] = jnp.where(
            acc3, best_rows[:, None, :], old_row)
        ft_ref[rows_b] = jnp.where(accept, best_x, ft)
        old_p = rset_ref[:, pl.ds(ri, 1), :]           # (rb, 1, P)
        cand_block = jnp.sum(cand_p * oh3, axis=1)[:, None, :]
        rset_ref[:, pl.ds(ri, 1), :] = jnp.where(acc3, cand_block, old_p)
        fstate_ref[rows_b, 0:1] = jnp.where(accept, best_a,
                                            fstate_ref[rows_b, 0:1])
        fstate_ref[rows_b, 1:2] = jnp.where(accept, best_b,
                                            fstate_ref[rows_b, 1:2])
        fstate_ref[rows_b, 2:3] = jnp.where(accept, min_chi, conval)
        istate_ref[rows_b, 0:1] = (n_it + jnp.int32(k_cand)
                                   * active.astype(jnp.int32))
        istate_ref[rows_b, 1:2] = (istate_ref[rows_b, 1:2]
                                   + accept.astype(jnp.int32))

    y_1d = engine.consts.y.reshape(1, nq)
    u_1d = engine.consts.u.reshape(1, nq)
    sc = jnp.asarray([engine.consts.s_u, engine.consts.s_uy], jnp.float32)
    grid_pytree = engine.grid

    # explicit int32 index maps (see build_chunk_fn: python literals
    # promote to i64 under package-wide x64, which Mosaic cannot
    # legalize, and spec-less arrays get SYNTHESIZED i64 maps)
    def rep_blocked(*tail):
        nt = len(tail)
        return pl.BlockSpec(
            (rb,) + tail,
            lambda b, s: (jnp.int32(b),) + tuple(
                jnp.int32(0) for _ in range(nt)),
            memory_space=pltpu.VMEM)

    def step_blocked(*tail):
        nt = len(tail)
        return pl.BlockSpec(
            (1, rb) + tail,
            lambda b, s: (jnp.int32(s), jnp.int32(b)) + tuple(
                jnp.int32(0) for _ in range(nt)),
            memory_space=pltpu.VMEM)

    def full(shape, space=pltpu.VMEM):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda b, s: tuple(jnp.int32(0) for _ in range(nd)),
            memory_space=space)

    smem = pltpu.SMEM
    pallas_fn = pl.pallas_call(
        kernel,
        grid=(n_blocks, seg),
        out_shape=(
            jax.ShapeDtypeStruct((n_reps, n, n_p), jnp.float32),   # rset
            jax.ShapeDtypeStruct((n_reps, n, nq), jnp.float32),    # ibank
            jax.ShapeDtypeStruct((n_reps, nq), jnp.float32),       # ft
            jax.ShapeDtypeStruct((n_reps, 8), jnp.float32),        # fstate
            jax.ShapeDtypeStruct((n_reps, 8), jnp.int32),          # istate
        ),
        in_specs=[
            full((1, nq)),                           # y
            full((1, nq)),                           # u
            full((2,), smem),                        # sc
            full((seg,), smem),                      # slots
            step_blocked(k_cand, nq),                # rows (streamed)
            step_blocked(k_cand, n_p),               # cands (streamed)
            rep_blocked(n, n_p),                     # rset (blocked)
            rep_blocked(n, nq),                      # ibank (blocked)
            full((n_reps, nq)),                      # ft
            full((n_reps, 8)),                       # fstate
            full((n_reps, 8)),                       # istate
        ],
        out_specs=(
            rep_blocked(n, n_p),
            rep_blocked(n, nq),
            full((n_reps, nq)),
            full((n_reps, 8)),
            full((n_reps, 8)),
        ),
        input_output_aliases=({6: 0, 7: 1, 8: 2, 9: 3, 10: 4}
                              if alias_rset
                              else {7: 1, 8: 2, 9: 3, 10: 4}),
        interpret=interpret,
    )

    row_eval = jax.vmap(
        lambda p: engine._intensity_row(grid_pytree, p))
    k_local = engine._k_local()
    k_global = k_cand - k_local
    if k_local:
        if seg > n:
            # correctness precondition, not a debug check (python -O
            # must not strip it): slots repeat within an over-long
            # segment and second visits would compute local proposals
            # from a stale segment-start rset
            raise ValueError(
                f"local moves need distinct slots per segment: "
                f"seg_steps={seg} > num_contribs={n}")
        lo_p, hi_p = engine._range_bounds()
        local_scale = cfg.local_scale

    @jax.jit
    def chunk_fn(state, ri):
        # identical proposal stream to the XLA scan path: advance the
        # per-rep threefry keys and pre-draw the whole segment
        keys = jax.vmap(jax.random.split)(state.key)
        new_key = keys[:, 0]
        proposals = engine._draw_chunk_proposals(
            keys[:, 1], n_steps=seg)                   # (S, R, K, P)
        ri0 = ri.astype(jnp.int32)
        slots = jnp.remainder(
            ri0 + jnp.arange(seg, dtype=jnp.int32), jnp.int32(n))
        if k_local:
            # slots are strictly distinct within the segment (seg <= n),
            # so each slot's current value at its step IS its
            # segment-start value: the local columns (unit uniforms from
            # _draw_chunk_proposals) run the SAME shared transform as
            # the scan path's _step — bitwise-identical stream
            from ..core.engine import local_candidates
            cur = jnp.swapaxes(jnp.take(state.rset, slots, axis=1),
                               0, 1)                   # (S, R, P)
            local_c = local_candidates(
                cur, proposals[:, :, k_global:, :], lo_p, hi_p,
                local_scale)
            proposals = jnp.concatenate(
                [proposals[:, :, :k_global, :], local_c], axis=2)
        rows = row_eval(
            proposals.reshape(seg * n_reps * k_cand, n_p)
        ).reshape(seg, n_reps, k_cand, nq).astype(row_dtype)
        fstate = jnp.concatenate(
            [state.scale[:, None], state.background[:, None],
             state.conval[:, None],
             jnp.zeros((n_reps, 5), jnp.float32)], axis=1)
        istate = jnp.concatenate(
            [state.n_iter[:, None], state.n_moves[:, None],
             jnp.zeros((n_reps, 6), jnp.int32)], axis=1)
        rset, ibank, ft, fstate, istate = pallas_fn(
            y_1d, u_1d, sc, slots, rows,
            proposals.astype(jnp.float32),
            state.rset, state.ibank, state.ft, fstate, istate)
        new_state = state._replace(
            key=new_key, rset=rset, ibank=ibank, ft=ft,
            scale=fstate[:, 0], background=fstate[:, 1],
            conval=fstate[:, 2],
            n_iter=istate[:, 0], n_moves=istate[:, 1])
        return new_state, jnp.remainder(ri0 + jnp.int32(seg),
                                        jnp.int32(n))

    return chunk_fn
