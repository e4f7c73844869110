"""The GMMVI optimizer: one compiled training iteration over a pure state.

(reference: src/gmmvi/optimization/gmmvi.py)

The reference orchestrates stateful module objects; here the entire learner
state is a single pytree (:class:`TrainState`) and one training iteration is a
pure function ``state -> state`` assembled from the module functions chosen by
the configuration.  For jit-safe targets the whole iteration (including target
evaluation) is one XLA program; for host targets the iteration is split into a
compiled propose phase, eager target evaluation, and a compiled update phase —
mirroring the reference's two-path graph compilation (gmmvi.py:89-103).

Data parallelism: when a ``jax.sharding.Mesh`` is supplied, the per-iteration
sample batch is sharded over the mesh's ``"data"`` axis with sharding
constraints; XLA then partitions the target evaluation and density einsums and
inserts psum collectives for the per-component sufficient-statistic reductions
(ICI-resident, since all cross-device traffic is [K, D] / [K, D, D] moments).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from gmmvi_tpu.experiments.targets.lnpdf import LNPDF
from gmmvi_tpu.models import gmm as gmm_ops
from gmmvi_tpu.models import meta as meta_ops
from gmmvi_tpu.models.gmm import GmmState
from gmmvi_tpu.models.meta import MetaState
from gmmvi_tpu.optimization import component_adaptation as adapt_ops
from gmmvi_tpu.optimization import component_updaters as upd_ops
from gmmvi_tpu.optimization import ng_estimators as est_ops
from gmmvi_tpu.optimization import sample_db as db_ops
from gmmvi_tpu.optimization import sample_selectors as sel_ops
from gmmvi_tpu.optimization import stepsize_adapters as step_ops
from gmmvi_tpu.optimization import weight_updaters as w_ops
from gmmvi_tpu.optimization.component_adaptation import AdaptationState, VipsConfig
from gmmvi_tpu.optimization.sample_db import SampleDbState
from gmmvi_tpu.optimization.sample_selectors import SelectorConfig
from gmmvi_tpu.optimization.stepsize_adapters import WeightStepsizeState


@struct.dataclass
class TrainState:
    """The complete learner state: everything a training iteration reads or
    writes, checkpointable as one pytree."""

    model: GmmState
    meta: MetaState
    db: SampleDbState
    wstep: WeightStepsizeState
    adapt: AdaptationState
    num_updates: jnp.ndarray  # int32; reference gmmvi.py:87
    key: jnp.ndarray


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class GMMVI:
    """Host-side facade assembling the compiled training step from a config.

    (reference: gmmvi.py:16-174 — same build_from_config wiring, same module
    slots, but modules are pure functions and state is explicit.)
    """

    def __init__(
        self,
        target_distribution: LNPDF,
        initial_state: TrainState,
        temperature: float,
        selector_cfg: SelectorConfig,
        estimator_type: str,
        estimator_cfg: dict,
        updater_type: str,
        component_stepsize_type: str,
        component_stepsize_cfg: dict,
        weight_updater_type: str,
        weight_updater_cfg: dict,
        weight_stepsize_type: str,
        weight_stepsize_cfg: dict,
        vips_cfg: Optional[VipsConfig] = None,
        prior_mean: Optional[np.ndarray] = None,
        prior_cov_diag: Optional[np.ndarray] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        trust_region_search: str = "bracket",
        trust_region_grid_size: int = 32,
        compact_target_eval: str = "auto",
        shard_local_buckets: bool = False,
    ):
        self.target_distribution = target_distribution
        self.state = initial_state
        self.temperature = float(temperature)
        self.selector_cfg = selector_cfg
        self.estimator_type = estimator_type
        self.estimator_cfg = dict(estimator_cfg)
        self.updater_type = updater_type
        self.component_stepsize_type = component_stepsize_type
        self.component_stepsize_cfg = dict(component_stepsize_cfg)
        self.weight_updater_type = weight_updater_type
        self.weight_updater_cfg = dict(weight_updater_cfg)
        self.weight_stepsize_type = weight_stepsize_type
        self.weight_stepsize_cfg = dict(weight_stepsize_cfg)
        self.vips_cfg = vips_cfg
        self.prior_mean = None if prior_mean is None else jnp.asarray(prior_mean)
        self.prior_cov_diag = (
            None if prior_cov_diag is None else jnp.asarray(prior_cov_diag)
        )
        if mesh is not None and "data" not in mesh.axis_names:
            raise ValueError(
                f"mesh axes must include 'data' (got {mesh.axis_names}); "
                "use parallel.mesh.data_mesh or hybrid_mesh")
        self.mesh = mesh
        self.trust_region_search = trust_region_search
        self.trust_region_grid_size = int(trust_region_grid_size)
        self._steps_to_capacity_check = 1
        # >1: the bucketed target eval compacts per device shard (sharded
        # DB layout — a global argsort compaction would all-gather the batch)
        self._bucket_shards = 1
        if shard_local_buckets:
            if mesh is None or "data" not in mesh.axis_names:
                raise ValueError(
                    "shard_local_buckets requires a mesh with a 'data' axis")
            self._bucket_shards = int(mesh.shape["data"])

        self.requires_gradients = estimator_type == "Stein"

        # Bucketed target evaluation for the jit-safe VIPS path: with sample
        # reuse, steady state needs only max(1, n_des - n_eff) fresh samples
        # per component — close to K valid rows out of the static
        # [Kmax * n_des] proposal.  Rather than evaluate the target on every
        # padded row (the round-1 inefficiency), the step compacts valid rows
        # to the front and lax.switches between a power-of-two ladder of
        # statically-shaped target evaluations, so the target processes at
        # most 2x the valid rows.  (The reference evaluates exactly the drawn
        # samples, sample_selector.py:199-204.)
        self._eval_buckets = None
        if compact_target_eval == "on":
            enabled = True
        elif compact_target_eval == "off":
            enabled = False
        else:  # "auto": only where padding waste occurs in steady state
            enabled = (
                selector_cfg.is_vips
                and selector_cfg.reused_samples_per_component > 0
            )
        if enabled and self.target_distribution.safe_for_jit \
                and selector_cfg.is_vips:
            self._eval_buckets = self._make_eval_buckets(
                initial_state.model.max_components)

        if self.target_distribution.safe_for_jit:
            # donating the state lets XLA update the large ring buffers
            # (sample DB, histories) in place instead of copying them
            self._jitted_step = jax.jit(self._spmd_scoped(self._full_step),
                                        donate_argnums=0)
            self._multi_step_cache: dict = {}
        else:
            self._jitted_propose = jax.jit(
                self._spmd_scoped(self._propose_phase))
            self._jitted_update = jax.jit(
                self._spmd_scoped(self._update_phase), donate_argnums=0)

    def _make_eval_buckets(self, kmax: int):
        """Power-of-two ladder of target-eval sizes, [~batch/64, batch];
        None when the ladder degenerates (bucketing would not help).
        Shard-local mode ladders over PER-DEVICE sizes (the bucket is picked
        from the max per-shard valid count)."""
        p = self._bucket_shards
        batch = kmax * self.selector_cfg.desired_samples_per_component // p
        floor = max(-(-kmax // p), batch // 64)
        ladder, sz = [], batch
        while sz >= floor and sz > 0:
            ladder.append(sz)
            sz //= 2
        buckets = tuple(sorted(set(ladder)))
        return buckets if len(buckets) >= 2 else None

    def _spmd_scoped(self, fn):
        """Wrap a step function so tracing runs under the right SPMD kernel
        gate (see gmm.spmd_scope) — scoped per trace, so meshed and unmeshed
        instances coexist in one process without leaking the gate."""
        from gmmvi_tpu.models import gmm as _gmm_module

        def wrapped(*args):
            with _gmm_module.spmd_scope(self.mesh):
                return fn(*args)

        return wrapped

    # ------------------------------------------------------------------
    # Target evaluation
    # ------------------------------------------------------------------
    def _eval_target(self, samples: jnp.ndarray):
        """(lnpdfs, grads); grads are zeros when the estimator does not need
        them (the reference always differentiates, sample_selector.py:69-78 —
        skipping for MORE is a pure compute saving, numerics-identical)."""
        target = self.target_distribution
        if self.requires_gradients:
            if target.use_log_density_and_grad:
                lnpdfs, grads = target.log_density_and_grad(samples)
            else:
                lnpdfs, grads = jax.vmap(
                    jax.value_and_grad(lambda s: target.log_density(s[None])[0])
                )(samples)
        else:
            lnpdfs = target.log_density(samples)
            grads = jnp.zeros_like(samples)
        return lnpdfs, grads

    def _eval_target_bucketed(self, samples: jnp.ndarray, valid: jnp.ndarray):
        """Evaluate the target on (roughly) only the valid proposal rows.

        Compacts valid rows to the front (stable argsort keeps their order)
        and dispatches via ``lax.switch`` to the smallest power-of-two bucket
        holding them; results are scattered back to their original rows.
        Invalid rows receive zeros — every downstream consumer masks by
        validity, and the sample DB only stores valid rows.
        """
        if self._eval_buckets is None:
            return self._eval_target(samples)
        if self._bucket_shards > 1:
            return self._eval_target_bucketed_shardlocal(samples, valid)
        b, d = samples.shape
        order = jnp.argsort(jnp.logical_not(valid), stable=True)
        n_valid = jnp.sum(valid.astype(jnp.int32))
        sorted_samples = samples[order]

        def make_branch(size):
            def branch(_):
                ld, g = self._eval_target(
                    self._shard_batch(sorted_samples[:size])
                )
                rows = order[:size]
                ld_full = jnp.zeros((b,), jnp.float32).at[rows].set(
                    ld.astype(jnp.float32))
                g_full = jnp.zeros((b, d), jnp.float32).at[rows].set(
                    g.astype(jnp.float32))
                return ld_full, g_full
            return branch

        buckets = jnp.asarray(self._eval_buckets, jnp.int32)
        idx = jnp.searchsorted(buckets, n_valid, side="left")
        idx = jnp.minimum(idx, len(self._eval_buckets) - 1)
        return jax.lax.switch(
            idx, [make_branch(s) for s in self._eval_buckets], None
        )

    def _eval_target_bucketed_shardlocal(self, samples: jnp.ndarray,
                                         valid: jnp.ndarray):
        """Shard-local bucketed target evaluation (sharded DB layout).

        Each device compacts ITS slice of the proposal batch under
        ``shard_map`` (a global argsort compaction would re-introduce the
        batch all-gathers the sharded layout exists to remove); the bucket
        is the smallest ladder size holding the MAX per-shard valid count
        (one scalar all-reduce).  Per-device valid counts are unbalanced
        (proposal rows block-shard by component slot), so the reduction is
        bounded by the busiest shard — still ~2x the valid rows in steady
        state.  (The reference evaluates exactly the drawn samples,
        sample_selector.py:199-204.)"""
        from jax import shard_map

        mesh = self.mesh
        P = jax.sharding.PartitionSpec
        p = self._bucket_shards
        b, d = samples.shape
        b_l = b // p
        s2 = self._shard_batch(samples.reshape(p, b_l, d))
        v2 = self._shard_batch(valid.reshape(p, b_l))

        def compact_body(s_loc, v_loc):
            order = jnp.argsort(jnp.logical_not(v_loc), axis=1, stable=True)
            dev = jnp.arange(s_loc.shape[0])[:, None]
            return s_loc[dev, order], order, jnp.sum(
                v_loc.astype(jnp.int32), axis=1)

        sorted_s, order, n_valid_p = shard_map(
            compact_body, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=P("data"), check_vma=False,
        )(s2, v2)
        n_max = jnp.max(n_valid_p)

        def scatter_body(ld_loc, g_loc, order_loc):
            pl_, size = ld_loc.shape
            dev = jnp.arange(pl_)[:, None]
            rows = order_loc[:, :size]
            ld_full = jnp.zeros((pl_, b_l), jnp.float32).at[dev, rows].set(
                ld_loc)
            g_full = jnp.zeros((pl_, b_l, d), jnp.float32).at[dev, rows].set(
                g_loc)
            return ld_full, g_full

        def make_branch(size):
            def branch(_):
                flat = self._shard_batch(
                    sorted_s[:, :size].reshape(p * size, d))
                ld, g = self._eval_target(flat)
                ld_full, g_full = shard_map(
                    scatter_body, mesh=mesh,
                    in_specs=(P("data"), P("data"), P("data")),
                    out_specs=P("data"), check_vma=False,
                )(ld.astype(jnp.float32).reshape(p, size),
                  g.astype(jnp.float32).reshape(p, size, d), order)
                return ld_full.reshape(b), g_full.reshape(b, d)
            return branch

        buckets = jnp.asarray(self._eval_buckets, jnp.int32)
        idx = jnp.searchsorted(buckets, n_max, side="left")
        idx = jnp.minimum(idx, len(self._eval_buckets) - 1)
        return jax.lax.switch(
            idx, [make_branch(s) for s in self._eval_buckets], None
        )

    # ------------------------------------------------------------------
    # Phases
    # ------------------------------------------------------------------
    @property
    def _has_comp_axis(self) -> bool:
        return self.mesh is not None and "comp" in self.mesh.axis_names

    def _shard_batch(self, x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
        """Constrain ``axis`` of ``x`` to the mesh's data axis.  Pinning every
        major per-sample intermediate (not just the batch itself) keeps XLA's
        SPMD propagation from electing to all-gather the batch and compute
        replicated (its cost model prefers that surprisingly often).

        On a 2-D ``("data", "comp")`` mesh, component-major intermediates
        (``[Kmax, N(, D)]`` density/whitening chains, where the sample axis
        is not axis 0) are additionally pinned over ``comp`` so the K-vmapped
        work splits across the comp axis."""
        if self.mesh is None:
            return x
        dims = [None] * x.ndim
        dims[axis] = "data"
        if (
            self._has_comp_axis and axis != 0
            and x.shape[0] == self.state.model.max_components
        ):
            dims[0] = "comp"
        return jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(*dims))
        )

    def _shard_comp(self, x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
        """Constrain ``axis`` (the component axis) to the mesh's ``comp``
        axis; no-op on 1-D data meshes."""
        if not self._has_comp_axis:
            return x
        dims = [None] * x.ndim
        dims[axis] = "comp"
        return jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(*dims))
        )

    def _shard_model_comp(self, model: GmmState) -> GmmState:
        """Pin the model's per-component tensors over ``comp`` (the [K]
        weight vectors stay replicated — they feed tiny reductions where a
        collective would cost more than the compute)."""
        if not self._has_comp_axis:
            return model
        return model.replace(
            means=self._shard_comp(model.means),
            chols=self._shard_comp(model.chols),
            inv_chols=self._shard_comp(model.inv_chols),
        )

    def _propose_phase(self, state: TrainState):
        key, k_sel = jax.random.split(state.key)
        prop = sel_ops.propose(
            state.model, state.db, self.selector_cfg, k_sel,
            shard_fn=self._shard_batch if self.mesh is not None else None,
        )
        prop = prop._replace(samples=self._shard_batch(prop.samples))
        return state.replace(key=key), prop

    def _maybe_prior_samples(self, state: TrainState, key):
        """Draw prior samples for the add heuristic when configured
        (component_adaptation.py:246-248)."""
        cfg = self.vips_cfg
        if cfg is None or cfg.num_prior_samples <= 0 or self.prior_mean is None:
            return None
        d = self.prior_mean.shape[0]
        eps = jax.random.normal(key, (cfg.num_prior_samples, d))
        return self.prior_mean[None, :] + jnp.sqrt(self.prior_cov_diag)[None, :] * eps

    def _update_phase(
        self, state: TrainState, prop: sel_ops.Proposal,
        lnpdfs: jnp.ndarray, grads: jnp.ndarray,
        prior_samples=None, prior_lnpdfs=None,
    ) -> TrainState:
        key, k_db, k_adapt = jax.random.split(state.key, 3)
        iteration = state.num_updates

        db, window, pack = sel_ops.finalize_fused(
            state.model, state.db, self.selector_cfg, iteration, prop,
            lnpdfs, grads, k_db,
            shard_fn=self._shard_batch if self.mesh is not None else None,
        )

        model, meta, wstep = self._run_updates(state.model, state.meta,
                                               state.wstep, window, pack)
        num_updates = state.num_updates + 1

        adapt = state.adapt
        if self.vips_cfg is not None:
            model, meta, adapt, db = adapt_ops.adapt_number_of_components(
                model, meta, adapt, db, self.vips_cfg, num_updates, k_adapt,
                prior_samples, prior_lnpdfs,
            )

        return TrainState(
            model=model, meta=meta, db=db, wstep=wstep, adapt=adapt,
            num_updates=num_updates, key=key,
        )

    def _run_updates(self, model: GmmState, meta: MetaState,
                     wstep: WeightStepsizeState, window, pack=None):
        """Component + weight updates on the selected sample window
        (reference: gmmvi.py:163-174, same ordering).

        ``pack`` is the fused current-model density pass over the window
        (shared with the background computation); the weight update cannot
        reuse it because the reference evaluates log-ratios under the
        *updated* components (gmmvi.py:170-173 runs update_weights after
        apply_NG_update)."""
        # on a ("data", "comp") mesh, split the per-component chains
        # (estimator moments, trust-region bisection + Cholesky
        # reconstruction) over the comp axis
        model = self._shard_model_comp(model)
        # 1. component stepsize adaptation
        new_stepsizes = step_ops.COMPONENT_STEPSIZE_ADAPTERS[
            self.component_stepsize_type
        ](meta, self.component_stepsize_cfg)
        meta = meta.replace(
            stepsizes=jnp.where(model.mask, new_stepsizes, meta.stepsizes)
        )

        # 2. natural gradient estimation
        if self.estimator_type == "Stein":
            est = est_ops.stein_estimate(
                model, window.samples, window.valid, window.mapping,
                window.background_log_pdfs, window.target_lnpdfs,
                window.target_grads,
                use_self_normalized_importance_weights=self.estimator_cfg[
                    "use_self_normalized_importance_weights"
                ],
                only_use_own_samples=self.estimator_cfg["only_use_own_samples"],
                pack=pack,
                newest_mask=window.newest_mask,
            )
        elif self.estimator_type == "MORE":
            est = est_ops.more_estimate(
                model, window.samples, window.valid, window.mapping,
                window.background_log_pdfs, window.target_lnpdfs,
                meta.l2_regularizers,
                use_self_normalized_importance_weights=self.estimator_cfg[
                    "use_self_normalized_importance_weights"
                ],
                only_use_own_samples=self.estimator_cfg["only_use_own_samples"],
                pack=pack,
                newest_mask=window.newest_mask,
            )
        else:
            raise ValueError(f"unknown ng_estimator_type {self.estimator_type}")

        # 3. component update
        updater_kwargs = dict(temperature=self.temperature)
        if self.updater_type == "trust-region":
            updater_kwargs.update(
                search=self.trust_region_search,
                grid_size=self.trust_region_grid_size,
            )
        model, meta = upd_ops.UPDATERS[self.updater_type](
            model, meta,
            self._shard_comp(est.expected_hessians_neg),
            self._shard_comp(est.expected_gradients_neg),
            meta.stepsizes, **updater_kwargs,
        )
        model = self._shard_model_comp(model)

        # 4. weight stepsize adaptation
        wstep = step_ops.WEIGHT_STEPSIZE_ADAPTERS[self.weight_stepsize_type](
            wstep, model, meta, self.weight_stepsize_cfg
        )

        # 5. weight update (stores component rewards)
        elr, meta = w_ops.expected_log_ratios(
            model, meta, window.samples, window.valid,
            window.background_log_pdfs, window.target_lnpdfs,
            self.temperature,
            self.weight_updater_cfg["use_self_normalized_importance_weights"],
            shard_fn=self._shard_batch if self.mesh is not None else None,
        )
        if self.weight_updater_type == "direct":
            model, meta = w_ops.direct_weight_update(
                model, meta, elr, wstep.stepsize, self.temperature
            )
        elif self.weight_updater_type == "trust-region":
            model, meta = w_ops.trust_region_weight_update(
                model, meta, elr, wstep.stepsize, self.temperature
            )
        else:
            raise ValueError(
                f"unknown weight_updater_type {self.weight_updater_type}"
            )
        return model, meta, wstep

    def _full_step(self, state: TrainState) -> TrainState:
        """Whole iteration as one compiled program (jit-safe targets)."""
        state, prop = self._propose_phase(state)
        lnpdfs, grads = self._eval_target_bucketed(prop.samples, prop.valid)
        # pin target outputs per-sample so the target evaluates shardwise
        lnpdfs, grads = self._shard_batch(lnpdfs), self._shard_batch(grads)

        prior_samples = prior_lnpdfs = None
        if (
            self.vips_cfg is not None
            and self.vips_cfg.num_prior_samples > 0
            and self.prior_mean is not None
        ):
            key, k_prior = jax.random.split(state.key)
            state = state.replace(key=key)
            prior_samples = self._maybe_prior_samples(state, k_prior)
            prior_lnpdfs = self.target_distribution.log_density(prior_samples)

        return self._update_phase(state, prop, lnpdfs, grads,
                                  prior_samples, prior_lnpdfs)

    # ------------------------------------------------------------------
    # Capacity growth (VIPS can outgrow the initial padding)
    # ------------------------------------------------------------------
    def grow_capacity(self, new_max_components: int) -> None:
        """Grow the padded component capacity of the whole TrainState.

        The reference grows its variables unboundedly (gmm_wrapper.py:90-127);
        here capacity is static inside the compiled step, so growth happens
        host-side between steps — one recompile per growth event.  Window
        contents, meta-state, and feval accounting are preserved exactly.
        """
        state = self.state
        kmax = state.model.max_components
        if new_max_components <= kmax:
            return
        model = gmm_ops.repad(state.model, new_max_components)
        meta = meta_ops.repad_meta(state.meta, new_max_components)
        new_cap = sel_ops.total_window_size(self.selector_cfg,
                                            new_max_components)
        db = db_ops.repad_db(state.db, new_max_components, new_cap)
        self.state = TrainState(
            model=model, meta=meta, db=db, wstep=state.wstep,
            adapt=state.adapt, num_updates=state.num_updates, key=state.key,
        )
        # shape-keyed jit caches recompile themselves; rebuild derived sizes
        if self._eval_buckets is not None:
            self._eval_buckets = self._make_eval_buckets(new_max_components)
        if hasattr(self, "_multi_step_cache"):
            self._multi_step_cache.clear()

    def _has_growth_headroom(self) -> bool:
        cfg = self.vips_cfg
        return (cfg is not None
                and self.state.model.max_components < cfg.max_components)

    def _grow_if_full(self) -> None:
        """Unconditional capacity check: if VIPS has filled the padding but
        its configured ``max_components`` still has headroom, grow (loudly)
        instead of letting ``add_component`` silently no-op.  Forces a host
        sync of ``num_active`` — callers gate on :meth:`_has_growth_headroom`
        first."""
        if not self._has_growth_headroom():
            return
        cfg = self.vips_cfg
        kmax = self.state.model.max_components
        if int(self.state.model.num_active) >= kmax:
            import warnings

            new_kmax = min(cfg.max_components,
                           _round_up(max(2 * kmax, kmax + 8), 8))
            warnings.warn(
                f"component capacity {kmax} exhausted; repadding to "
                f"{new_kmax} (max_components={cfg.max_components}) — one "
                "recompile. Set tpu.max_components to preallocate."
            )
            self.grow_capacity(new_kmax)

    def _maybe_grow(self) -> None:
        """Rate-limited auto-repad for per-iteration stepping: checks every
        ``add_iters`` calls, which (with adds spaced ``add_iters`` apart)
        guarantees exactly one check between consecutive add events."""
        if not self._has_growth_headroom():
            return
        self._steps_to_capacity_check -= 1
        if self._steps_to_capacity_check > 0:
            return
        self._steps_to_capacity_check = max(1, self.vips_cfg.add_iters)
        self._grow_if_full()

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------
    def train_iter(self) -> None:
        """Advance one iteration (reference: gmmvi.py:146-161)."""
        self._maybe_grow()
        if self.target_distribution.safe_for_jit:
            self.state = self._jitted_step(self.state)
            return
        # host-target path: propose compiled, target eager, update compiled.
        # Only the valid rows of the statically-shaped proposal are evaluated
        # (padded to a power-of-two bucket to bound target-side recompiles) —
        # matching the reference's behavior of evaluating exactly the drawn
        # samples, which matters for expensive targets (BNNs, simulators).
        state, prop = self._jitted_propose(self.state)
        valid = np.asarray(prop.valid)
        samples_np = np.asarray(prop.samples)
        b, d = samples_np.shape
        idx = np.flatnonzero(valid)
        bucket = 1 << max(0, int(np.ceil(np.log2(max(len(idx), 1)))))
        bucket = min(bucket, b)
        padded_idx = np.zeros(bucket, np.int64)
        padded_idx[: len(idx)] = idx
        lnp_v, grads_v = self._eval_target(jnp.asarray(samples_np[padded_idx]))
        lnpdfs = jnp.zeros((b,), jnp.float32).at[padded_idx].set(
            jnp.asarray(lnp_v, jnp.float32)
        )
        grads = jnp.zeros((b, d), jnp.float32).at[padded_idx].set(
            jnp.asarray(grads_v, jnp.float32)
        )

        prior_samples = prior_lnpdfs = None
        if (
            self.vips_cfg is not None
            and self.vips_cfg.num_prior_samples > 0
            and self.prior_mean is not None
        ):
            key, k_prior = jax.random.split(state.key)
            state = state.replace(key=key)
            prior_samples = self._maybe_prior_samples(state, k_prior)
            prior_lnpdfs = jnp.asarray(
                self.target_distribution.log_density(prior_samples), jnp.float32
            )
        self.state = self._jitted_update(
            state, prop, lnpdfs, grads, prior_samples, prior_lnpdfs
        )

    def train_iters(self, n: int) -> None:
        """Advance ``n`` iterations in ONE device dispatch (jit-safe targets):
        a ``lax.scan`` over the full training step.

        TPU-idiomatic batched stepping: per-call dispatch latency (host Python
        + runtime enqueue — ~ms through a remote-device tunnel) is amortized
        over ``n`` steps, so the chip runs back-to-back iterations.  Host
        targets fall back to the per-iteration two-phase path."""
        if not self.target_distribution.safe_for_jit:
            for _ in range(n):
                self.train_iter()
            return
        # While VIPS still has growth headroom, chunk the scan at add_iters
        # boundaries with a capacity check between chunks: adds are spaced
        # add_iters apart, so each chunk holds at most one add event and the
        # check before it grows the padding first — train_iters(n) then
        # matches n x train_iter() across repad boundaries (the reference
        # grows unboundedly, gmm_wrapper.py:90-127).  Fully preallocated runs
        # (tpu.max_components == adapter max_components, or fixed adaptation)
        # keep the single n-step dispatch.
        self._grow_if_full()
        done = 0
        while done < n:
            if self._has_growth_headroom():
                block = min(max(1, self.vips_cfg.add_iters), n - done)
            else:
                block = n - done
            self._scan_steps(block)
            done += block
            if done < n:
                self._grow_if_full()

    def _scan_steps(self, n: int) -> None:
        """One device dispatch of ``n`` compiled steps via ``lax.scan``."""
        fn = self._multi_step_cache.get(n)
        if fn is None:
            def multi(state):
                def body(s, _):
                    return self._full_step(s), None
                return jax.lax.scan(body, state, None, length=n)[0]

            fn = jax.jit(self._spmd_scoped(multi), donate_argnums=0)
            self._multi_step_cache[n] = fn
        self.state = fn(self.state)

    @property
    def model(self) -> GmmState:
        return self.state.model

    @property
    def num_updates(self) -> int:
        return int(self.state.num_updates)

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    @staticmethod
    def build_from_config(config: dict, target_distribution: LNPDF,
                          model: GmmState, meta: Optional[MetaState] = None,
                          mesh: Optional[jax.sharding.Mesh] = None,
                          seed: Optional[int] = None) -> "GMMVI":
        """Assemble a GMMVI instance from a reference-schema config dict
        (reference: gmmvi.py:105-144).  ``model`` is a padded GmmState (see
        :func:`gmmvi_tpu.experiments.setup.construct_initial_mixture`)."""
        from gmmvi_tpu.configs.validate import validate_config

        validate_config(config)
        tpu_cfg = config.get("tpu", {}) or {}
        if tpu_cfg.get("debug_nans"):
            # numerical-sanitizer mode (SURVEY.md §5: optional NaN checks;
            # note the trust-region search intentionally produces NaN
            # choleskys as rejection signals, so this is for debugging only)
            jax.config.update("jax_debug_nans", True)
        temperature = config["temperature"]
        kmax = model.max_components
        d = model.num_dimensions

        # --- selector -------------------------------------------------
        sel_type = config["sample_selector_type"]
        sel_c = config["sample_selector_config"]
        n_des = int(sel_c["desired_samples_per_component"])
        reused = int(
            math.floor(sel_c["ratio_reused_samples_to_desired"] * n_des)
        )
        if reused > 0:
            default_bg = min(4 * kmax, 2048)
        else:
            default_bg = kmax
        selector_cfg = SelectorConfig(
            kind=sel_type,
            desired_samples_per_component=n_des,
            reused_samples_per_component=reused,
            max_background_dists=int(tpu_cfg.get("max_background_dists",
                                                 default_bg)),
        )

        # --- component adaptation ------------------------------------
        vips_cfg = None
        prior_mean = prior_cov_diag = None
        if config["num_component_adapter_type"] == "adaptive":
            ac = config["num_component_adapter_config"]
            mi = config.get("model_initialization", {})
            pm = mi.get("prior_mean", None)
            ic = mi.get("initial_cov", None)
            prior_entropy = None
            if pm is not None and ic is not None:
                pm_arr = np.asarray(pm, np.float32) * np.ones(d, np.float32)
                ic_arr = np.asarray(ic, np.float32) * np.ones(d, np.float32)
                prior_mean, prior_cov_diag = pm_arr, ic_arr
                prior_entropy = adapt_ops.diagonal_gaussian_entropy(ic_arr)
            vips_cfg = VipsConfig(
                del_iters=int(ac["del_iters"]),
                add_iters=int(ac["add_iters"]),
                max_components=int(ac["max_components"]),
                thresholds_for_add_heuristic=tuple(
                    float(t) for t in np.atleast_1d(
                        ac["thresholds_for_add_heuristic"]
                    )
                ),
                min_weight_for_del_heuristic=float(
                    ac["min_weight_for_del_heuristic"]
                ),
                num_database_samples=int(ac["num_database_samples"]),
                num_prior_samples=int(ac["num_prior_samples"]),
                prior_entropy=prior_entropy,
            )

        # --- sample database sizing -----------------------------------
        w_total = sel_ops.total_window_size(selector_cfg, kmax)
        if reused > 0:
            default_ring = min(reused + 4, int(tpu_cfg.get("max_dist_ring_iters", 64)))
        else:
            default_ring = 2
        num_db_cand = (
            vips_cfg.num_database_samples if vips_cfg is not None else 0
        )
        reservoir = int(
            tpu_cfg.get("reservoir_capacity",
                        max(1024, min(num_db_cand, 16384)))
        )
        if vips_cfg is not None and vips_cfg.num_database_samples > reservoir:
            vips_cfg = vips_cfg._replace(num_database_samples=reservoir)
        keep_samples = bool(config.get("use_sample_database", True))
        db_layout = str(tpu_cfg.get("db_layout", "auto"))
        db_eviction = str(tpu_cfg.get("db_eviction", "ring"))
        if db_layout == "auto":
            # The sharded layout removes the batch-sized ring-write
            # all-gathers — the only batch-sized collectives left in the
            # data-parallel step (2.53 -> 0.83 MB/step at the flagship
            # shape) — so it is the default wherever its preconditions
            # hold.  Explicit "global"/"sharded" always wins.
            db_layout = "global"
            if mesh is not None and "data" in mesh.axis_names:
                n_sh = int(mesh.shape["data"])
                batch = (kmax * n_des if sel_type == "component-based"
                         else n_des)
                if db_eviction == "decimate":
                    reason = ("tpu.db_eviction: decimate is a global store "
                              "by definition")
                elif batch % n_sh:
                    reason = (f"the proposal batch ({batch}) is not "
                              f"divisible by the data-axis size ({n_sh})")
                else:
                    reason = None
                if reason is None:
                    db_layout = "sharded"
                else:
                    import warnings

                    warnings.warn(
                        "tpu.db_layout: auto falls back to the global ring "
                        f"(per-step batch all-gathers) — {reason}")
        if db_layout == "sharded":
            # per-device ring shards: eliminates the batch-sized ring-write
            # all-gathers of the data-parallel step (see
            # optimization/sample_db_sharded.py for the semantics)
            from gmmvi_tpu.optimization import sample_db_sharded as shd

            if mesh is None or "data" not in mesh.axis_names:
                raise ValueError(
                    "tpu.db_layout: sharded requires a mesh with a 'data' "
                    "axis (set tpu.data_shards or pass mesh=)")
            if db_eviction == "decimate":
                raise ValueError(
                    "tpu.db_layout: sharded is incompatible with "
                    "tpu.db_eviction: decimate (the decimation parity mode "
                    "is a global store by definition)")
            n_sh = int(mesh.shape["data"])
            batch = (kmax * n_des if sel_type == "component-based"
                     else n_des)
            if batch % n_sh:
                raise ValueError(
                    f"tpu.db_layout: sharded needs the proposal batch "
                    f"({batch} = Kmax*n_des) divisible by the data-axis "
                    f"size ({n_sh}); adjust desired_samples_per_component "
                    f"or tpu.max_components")
            db = shd.create_sharded_db(
                dim=d,
                max_components=kmax,
                capacity=w_total,
                dist_ring_iters=int(tpu_cfg.get("dist_ring_iters",
                                                default_ring)),
                reservoir_capacity=reservoir,
                n_shards=n_sh,
                diagonal=model.diagonal,
                keep_samples=keep_samples,
            )
        elif db_eviction == "decimate":
            # parity mode: reproduce the reference's decimation-on-overflow
            # long-horizon reuse semantics (reference: sample_db.py:63-79)
            from gmmvi_tpu.optimization import sample_db_decimate as dec_ops

            cap = int(min(int(config.get("max_database_size", 10_000_000)),
                          int(tpu_cfg.get("decimate_capacity_cap", 262_144))))
            cap = max(cap, w_total)
            db = dec_ops.create_decimating_db(
                dim=d,
                max_components=kmax,
                capacity=cap,
                # every add appends <= num_active dists and >= num_active
                # samples, so capacity + kmax rows can never overflow
                dist_capacity=int(tpu_cfg.get("max_dists", cap + kmax)),
                diagonal=model.diagonal,
                keep_samples=keep_samples,
            )
        else:
            db = db_ops.create_sample_db(
                dim=d,
                max_components=kmax,
                capacity=w_total,
                dist_ring_iters=int(tpu_cfg.get("dist_ring_iters",
                                                default_ring)),
                reservoir_capacity=reservoir,
                diagonal=model.diagonal,
                keep_samples=keep_samples,
            )
        if not keep_samples:
            # no reuse: behaves like the reference's keep_samples=False
            selector_cfg = selector_cfg._replace(reused_samples_per_component=0)

        # --- meta state ------------------------------------------------
        if meta is None:
            initial_stepsize = config["component_stepsize_adapter_config"][
                "initial_stepsize"
            ]
            initial_reg = config.get("ng_estimator_config", {}).get(
                "initial_l2_regularizer", 1e-12
            )
            meta = meta_ops.create_meta_state(
                model, initial_stepsize, initial_reg,
                meta_ops.history_length_from_config(config),
            )

        wstep = step_ops.create_weight_stepsize_state(
            config["weight_stepsize_adapter_config"]["initial_stepsize"]
        )

        if seed is None:
            seed = int(config.get("seed", config.get("start_seed", 0)))
        state = TrainState(
            model=model,
            meta=meta,
            db=db,
            wstep=wstep,
            adapt=adapt_ops.create_adaptation_state(),
            num_updates=jnp.asarray(0, jnp.int32),
            key=jax.random.PRNGKey(seed),
        )

        est_cfg = dict(config.get("ng_estimator_config", {}))
        est_cfg.setdefault("only_use_own_samples", False)
        est_cfg.setdefault("use_self_normalized_importance_weights", True)
        est_cfg.pop("initial_l2_regularizer", None)

        compact = str(tpu_cfg.get("compact_target_eval", "auto"))
        # under the sharded layout, compaction runs SHARD-LOCALLY (each
        # device compacts its own slice under shard_map; bucket size from
        # an all-reduced scalar max) so bucketing no longer re-introduces
        # the batch gathers that previously forced it off here

        return GMMVI(
            target_distribution=target_distribution,
            initial_state=state,
            temperature=temperature,
            selector_cfg=selector_cfg,
            estimator_type=config["ng_estimator_type"],
            estimator_cfg=est_cfg,
            updater_type=config["ng_based_updater_type"],
            component_stepsize_type=config["component_stepsize_adapter_type"],
            component_stepsize_cfg=config["component_stepsize_adapter_config"],
            weight_updater_type=config["weight_updater_type"],
            weight_updater_cfg=config["weight_updater_config"],
            weight_stepsize_type=config["weight_stepsize_adapter_type"],
            weight_stepsize_cfg=config["weight_stepsize_adapter_config"],
            vips_cfg=vips_cfg,
            prior_mean=prior_mean,
            prior_cov_diag=prior_cov_diag,
            mesh=mesh,
            trust_region_search=str(tpu_cfg.get("trust_region_search",
                                                "bracket")),
            trust_region_grid_size=int(tpu_cfg.get("trust_region_grid_size",
                                                   32)),
            compact_target_eval=compact,
            shard_local_buckets=(db_layout == "sharded"),
        )
