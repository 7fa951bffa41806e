# -*- coding: utf-8 -*-
"""SPMD ensemble execution: the MC engine over a ("rep", "q") device mesh.

The repetition ensemble shards over "rep" (pure data parallelism, no
communication); optionally the q grid shards over "q", in which case every
χ² reduction inside the hot loop completes with a ``psum`` riding ICI.
Because each accept/reject decision depends on psum-complete scalars, all
q-shards of a repetition stay in lockstep by construction — the per-rep
PRNG key is replicated across the "q" axis so every shard proposes the
same candidate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import McSASConfig
from ..core.engine import McSASEngine, RepState
from ..core.fitcore import FitConstants
from ..data import SASData
from ..models.base import BoundModel
from .mesh import make_mesh, pad_reps_for_mesh


def _state_specs() -> RepState:
    return RepState(
        key=P("rep"), rset=P("rep"), ibank=P("rep", None, "q"),
        ft=P("rep", "q"),
        scale=P("rep"), background=P("rep"), conval=P("rep"),
        n_iter=P("rep"), n_moves=P("rep"))


class ShardedEnsemble(McSASEngine):
    """McSASEngine whose ensemble runs SPMD over a device mesh."""

    # ParamTable rows are baked ONCE against the full (unsharded) fit
    # grid.  Values are one column per q point, so under q-axis sharding
    # each device simply takes its column shard — the row blend is
    # elementwise in q.  The only exclusion is tables whose rows are NOT
    # on the fit grid (Kholodenko's smeared flattened-locs layout,
    # contracted inside the lookup): a q shard cannot column-slice
    # those, so such models fall back to the quadrature kernel
    # (``table_grid_width_only`` in make_intensity_kernels).
    _allow_table = True

    def __init__(self, data: SASData, bound: BoundModel, cfg: McSASConfig,
                 mesh=None, mesh_shape=None):
        self.mesh = mesh if mesh is not None else make_mesh(mesh_shape)
        self._table_grid_width_only = self.mesh.shape["q"] > 1
        self._orig_reps = cfg.num_reps
        cfg = cfg.replace(num_reps=pad_reps_for_mesh(cfg.num_reps,
                                                     self.mesh))
        super().__init__(data, bound, cfg)
        self.sharding = None  # parent device_put hook unused

        # the Pallas kernels apply when the q axis is unsharded and the
        # model is eligible: each device runs a kernel on its local
        # repetition shard (pure data parallelism, no collectives).
        # Fully fused kernel first; table-tier models take the
        # prefetched-proposal kernel instead (local moves included).
        from ..ops import mc_kernel
        n_rep_axis = self.mesh.shape["rep"]
        # the kernels must target the MESH's platform, not the default
        # device: a CPU mesh while a TPU is attached (make_mesh's CPU
        # fallback, tests, demos) would otherwise dispatch a Mosaic
        # kernel on the CPU backend ("Only interpret mode is supported")
        mesh_platform = self.mesh.devices.flat[0].platform
        rep_layout = (cfg.use_pallas != "off"
                      and (mesh_platform == "tpu"
                           or cfg.use_pallas == "on")
                      and self.mesh.shape["q"] == 1
                      and cfg.num_reps % n_rep_axis == 0)
        fused_ok = rep_layout and mc_kernel.supports(self) and (
            cfg.use_pallas == "on"
            # the kernels grid over rep blocks, so per-device
            # eligibility only needs ONE rep to fit VMEM
            or mc_kernel.fits_vmem(self, n_reps=1))
        self._prefetch_shard = (rep_layout and not fused_ok
                                and mc_kernel.supports_prefetch(self)
                                and (cfg.use_pallas == "on"
                                     or mc_kernel.prefetch_fits_vmem(
                                         self, n_reps=1)))
        self._pallas_shard = fused_ok or self._prefetch_shard
        if self._pallas_shard:
            self._pad_fit_grid(128)

        # zero-weight padding points make the q length divisible by the
        # q-axis size (invisible to every reduction: u = 0)
        self._pad_fit_grid(self.mesh.shape["q"])

        mesh = self.mesh
        specs = _state_specs()
        if self.uses_table:
            # (inner grid, baked table values): values are one column
            # per q point and shard along q with the grid (replicating
            # trivially on rep-only meshes)
            inner = self.grid[0]
            inner_spec = ((P("q", None), P()) if isinstance(inner, tuple)
                          else P("q"))
            grid_spec = (inner_spec, P(None, "q"))
        elif isinstance(self.grid, tuple):
            # smearing: (locs (Nq, nSteps) sharded along q, contraction
            # vector replicated)
            grid_spec = (P("q", None), P())
        elif self.grid.ndim == 1:
            grid_spec = P("q")
        else:
            grid_spec = P("q", None)
        consts_spec = FitConstants(y=P("q"), u=P("q"), s_u=P(), s_uy=P(),
                                   n=P())
        # always psum over "q" (identity for a singleton axis): keeps the
        # replication of accept decisions statically inferable by shard_map
        axis = "q"

        def init_local(keys, grid, consts):
            return jax.vmap(
                lambda k: self._init_rep(k, grid, consts, axis))(keys)

        def chunk_local(state, ri0, grid, consts):
            return self._run_chunk_batched(state, ri0, grid, consts, axis)

        sm_init = jax.shard_map(init_local, mesh=mesh,
                                in_specs=(P("rep"), grid_spec, consts_spec),
                                out_specs=specs)
        sm_chunk = jax.shard_map(
            chunk_local, mesh=mesh,
            in_specs=(specs, P(), grid_spec, consts_spec),
            out_specs=(specs, P()))
        def put(g, sp):
            if isinstance(g, tuple):
                return tuple(put(gi, spi) for gi, spi in zip(g, sp))
            return jax.device_put(g, NamedSharding(mesh, sp))

        grid_sharded = put(self.grid, grid_spec)
        consts_sharded = jax.tree_util.tree_map(
            lambda leaf, sp: jax.device_put(jnp.asarray(leaf),
                                            NamedSharding(mesh, sp)),
            self.consts, consts_spec)

        # the prewarm plan re-registers against the SHARDED executables
        # (the parent's init/chunk/drive entries point at launch paths
        # this engine never runs); the pack entry carries over unchanged
        self._prewarm_plan = [e for e in self._prewarm_plan
                              if e[0] == "pack"]
        _sm_init_jit = jax.jit(lambda keys: sm_init(
            keys, grid_sharded, consts_sharded))
        self._init_batch = _sm_init_jit
        self._prewarm_plan.append(
            ("init", _sm_init_jit, lambda k, s, ri: (k,)))
        if self._pallas_shard:
            # a per-shard engine clone builds the kernel (fused or
            # prefetch) for the local repetition count; shard_map runs it
            # per device.  Pin the table decision to the parent's: the
            # auto gate thresholds on the TOTAL proposal budget, which
            # the smaller local rep count would misjudge.
            local = McSASEngine(
                data, bound,
                self.cfg.replace(num_reps=self.cfg.num_reps // n_rep_axis,
                                 use_pallas="on",
                                 table_ff="on" if self.uses_table
                                 else "off"))
            assert local.uses_prefetch == self._prefetch_shard
            # the TRUE per-device segment length: seg is computed from
            # the clone's LOCAL rep count (its HBM-budget term differs
            # from the parent's) — callers aligning an unsharded scan
            # baseline to the prefetch stream must chunk at this value
            self._prefetch_seg = (mc_kernel.prefetch_seg_steps(local)
                                  if self._prefetch_shard else 0)
            if mesh_platform != "tpu":
                # rebuild for the mesh's platform: the clone's default
                # build keyed interpret-mode off the DEFAULT device
                local_chunk = (
                    mc_kernel.build_prefetch_chunk_fn(local,
                                                      interpret=True)
                    if self._prefetch_shard
                    else mc_kernel.build_chunk_fn(local, interpret=True))
            else:
                local_chunk = local._chunk_batch

            sm_pallas = jax.shard_map(
                lambda st, ri0: local_chunk(st, ri0),
                mesh=mesh, in_specs=(specs, P()), out_specs=(specs, P()),
                check_vma=False)   # per-shard ri outputs are identical

            self._chunk_batch = jax.jit(sm_pallas)
        else:
            self._chunk_batch = jax.jit(lambda state, ri: sm_chunk(
                state, ri, grid_sharded, consts_sharded))
        self._prewarm_plan.append(
            ("chunk", self._chunk_batch, lambda k, s, ri: (s, ri)))
        self._reinit_merge = jax.jit(self._merge_reinit)

        # ---- single-launch drive (round-4): a device-side while_loop
        # AROUND the shard_map'd chunk body, so multi-chip fits stop
        # paying the per-chunk host RTT the engine prices at ~4 ms/launch
        # (core/engine.py drive docs).  The state stays sharded across
        # loop iterations; the `live` condition reduces the small (R,)
        # convergence scalars, for which XLA inserts the all-reduce.
        # Tiering and loop machinery come from the parent's shared
        # _build_drive (one audit surface for both execution layouts).
        # Initialization stays sharded by construction — it
        # goes through the same shard_map'd init (the round-3 OOM hazard
        # of the parent's unsharded fused init does not apply), and for
        # the Pallas shard it stays its OWN launch per the documented
        # input_output_aliases fusion hazard (CLAUDE.md).
        fast_body = (self._pallas_shard
                     or (bound.model.elementwise_q and not self.uses_table))
        # the jitted shard_map'd chunk inlines under the drive's jit
        drive = self._build_drive(self._chunk_batch, fast_body)
        if drive is not None:
            self._drive = jax.jit(drive)
            self._prewarm_plan.append(
                ("drive", self._drive, lambda k, s, ri: (s, ri)))

            def init_seeded(seed):
                keys = jax.random.split(jax.random.PRNGKey(seed),
                                        cfg.num_reps)
                return sm_init(keys, grid_sharded, consts_sharded)

            if self._pallas_shard:
                _init_jit = jax.jit(init_seeded)
                _ri0 = jnp.zeros((), jnp.int32)
                self._init_drive = lambda seed: self._drive(
                    _init_jit(seed), _ri0)
                self._prewarm_plan.append(
                    ("init-seed", _init_jit,
                     lambda k, s, ri: (cfg.seed,)))
            else:
                _fused = jax.jit(lambda seed: drive(
                    init_seeded(seed), jnp.zeros((), jnp.int32)))
                self._init_drive = _fused
                self._prewarm_plan.append(
                    ("init-drive", _fused, lambda k, s, ri: (cfg.seed,)))
        else:
            self._drive = None
            self._init_drive = None

    def _mosaic_fallback_engine(self) -> "ShardedEnsemble":
        # keep the mesh: the XLA shard path has identical semantics
        # (same threefry stream); un-pad reps so the rebuilt engine
        # re-derives its own padding and trimming
        return ShardedEnsemble(
            self.data, self.bound,
            self.cfg.replace(use_pallas="off",
                             num_reps=self._orig_reps),
            mesh=self.mesh)

    def run(self, **kw):
        res = super().run(**kw)
        if getattr(res, "reps_trimmed", False):
            # produced by a (Mosaic-fallback) ShardedEnsemble that already
            # trimmed its own padding — re-trimming against THIS engine's
            # padding would silently mis-slice if padding rules diverge
            return res
        r = self._orig_reps
        for f in ("contribs", "conval", "n_iter", "n_moves", "attempts",
                  "converged", "scaling", "background", "measval"):
            setattr(res, f, getattr(res, f)[:r])
        res.measval = res.measval[:, :self.data.count]  # drop q padding
        res.reps_trimmed = True
        return res
