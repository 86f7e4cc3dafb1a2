"""Training loop: jitted train step, metric accumulation, checkpoints.

Reference driver semantics: /root/reference/vae_train.py:60-111 (Adam +
exponential decay + grad-clip 20, print every ``print_iter``, checkpoint per
epoch/``save_iter``) and /root/reference/vae_fine_tune.py:76-152 (negative-
loss circuit breaker, periodic validation, early stopping).

TPU-first: the step is one jit (or pjit via ``ggpm_tpu.parallel``) with donated
params/opt-state; batches arrive as fixed-shape padded numpy so each bucket
signature compiles once.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import compact_plan_dict, to_model_batch
from . import checkpoint as ckpt


def make_train_step(model, optimizer, beta: float = 0.1,
                    perturb_z: bool = True,
                    beta_warmup_steps: int = 0) -> Callable:
    """Build a jitted (params, opt_state, batch, rng, step_idx) →
    (params, opt_state, metrics) step with donated state.

    ``beta_warmup_steps`` linearly anneals the KL weight from 0 to ``beta``
    (standard VAE warmup; the reference trains at fixed β, configs.json:27 —
    warmup is off by default for parity)."""

    def loss_fn(params, batch, rng, step_idx):
        if beta_warmup_steps > 0:
            b = beta * jnp.minimum(step_idx / beta_warmup_steps, 1.0)
        else:
            b = beta
        loss, metrics, aux = model.apply(
            params, batch, b, rng, perturb_z, False,
            rngs={'dropout': jax.random.fold_in(rng, 1)})
        return loss, (metrics, aux)

    @partial(jax.jit, donate_argnums=(0, 1, 3))
    def step(params, opt_state, batch, rng, step_idx=0):
        # the PRNG key is threaded THROUGH the step (split on device,
        # next key returned) — a host-side jax.random.split per step costs
        # an extra dispatch + two tiny buffer round-trips on the TPU relay
        step_rng, next_rng = jax.random.split(rng)
        (loss, (metrics, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, step_rng, step_idx)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        gnorm = optax_global_norm(grads)
        metrics = dict(metrics, GNorm=gnorm)
        return params, opt_state, metrics, aux, next_rng

    return step


def optax_global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(tree)))


def device_sync(tree) -> None:
    """True host synchronisation by fetching one (tiny) leaf value.

    ``jax.block_until_ready`` is NON-FUNCTIONAL in this environment — it
    returns immediately even for fresh non-donated outputs of undispatched
    computations (measured: 40 chained 2000² matmuls "block" in 3 ms and
    the subsequent value fetch takes 91 s).  Every pacing/timing sync must
    therefore fetch a value; call this with a small tree (e.g. the step's
    metrics), never with params."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[0])


def make_scan_train_step(model, optimizer, beta: float = 0.1,
                         perturb_z: bool = True,
                         beta_warmup_steps: int = 0) -> Callable:
    """K optimizer steps in ONE device call: ``lax.scan`` over a stacked
    [K, ...] batch pytree, carrying (params, opt_state, rng).

    Two wins over per-step dispatch on the single-chip TPU relay: the step
    rate is no longer bound by per-dispatch round-trip latency, and the
    relay message volume drops by K× (the relay's single multiplexed
    stream degrades under high message rates).  The PRNG/update sequence
    is IDENTICAL to K successive ``make_train_step`` calls (same split
    chain), so results match the per-step path exactly.

    Returns ``scan_step(params, opt_state, stacked_batch, rng, step0) →
    (params, opt_state, stacked_metrics, stacked_aux, next_rng)``.
    """

    def loss_fn(params, batch, rng, step_idx):
        if beta_warmup_steps > 0:
            b = beta * jnp.minimum(step_idx / beta_warmup_steps, 1.0)
        else:
            b = beta
        loss, metrics, aux = model.apply(
            params, batch, b, rng, perturb_z, False,
            rngs={'dropout': jax.random.fold_in(rng, 1)})
        return loss, (metrics, aux)

    @partial(jax.jit, donate_argnums=(0, 1, 3))
    def scan_step(params, opt_state, stacked_batch, rng, step0=0.0):
        def body(carry, batch):
            params, opt_state, rng, i = carry
            step_rng, next_rng = jax.random.split(rng)
            (loss, (metrics, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, step_rng, step0 + i)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            metrics = dict(metrics, GNorm=optax_global_norm(grads))
            return (params, opt_state, next_rng, i + 1.0), (metrics, aux)

        (params, opt_state, rng, _), (metrics, aux) = jax.lax.scan(
            body, (params, opt_state, rng, 0.0), stacked_batch)
        return params, opt_state, metrics, aux, rng

    return scan_step


def stack_batches(device_batches):
    """Stack same-signature device batches into one [K, ...] pytree for
    make_scan_train_step."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *device_batches)


def init_params_on_cpu(model, batch: Dict, rng, beta: float = 0.1,
                       perturb_z: bool = True):
    """Initialize flax params under jit.

    Calling ``model.init`` EAGERLY makes the decoder's lax.scan closure
    capture the concrete vocab mask as a trace-time constant, and
    tracing/lowering advanced indexing on large constants takes minutes
    (same pathology as MotifDecodeKernel's captured mask — measured 320s vs
    0.1s).  Under jit every input is a tracer: the trace is fast and the
    compile is an ordinary forward-sized compile (~15s)."""
    init_fn = jax.jit(lambda rngs, b, r: model.init(rngs, b, beta, r,
                                                    perturb_z, False))
    batch = jax.tree.map(jnp.asarray, batch)
    return init_fn({'params': rng, 'dropout': rng}, batch, rng)


def make_eval_step(model, beta: float = 0.1) -> Callable:
    @jax.jit
    def step(params, batch, rng):
        loss, metrics, _ = model.apply(params, batch, beta, rng,
                                       False, True)
        return loss, metrics
    return step


class MetricAccumulator:
    """Accumulates device metric trees without forcing a host sync per step
    (values are only materialised at ``mean()`` time, so the dispatch
    pipeline stays full)."""

    def __init__(self):
        self.pending = []

    def add(self, metrics: Dict[str, Any]) -> None:
        self.pending.append(metrics)

    def mean(self) -> Dict[str, float]:
        """Per-step mean; entries may be single-step scalar trees or
        [K]-stacked trees from a scanned multi-step call."""
        if not self.pending:
            return {}
        vals = jax.device_get(self.pending)
        out: Dict[str, float] = {}
        counts: Dict[str, float] = {}
        for m in vals:
            for k, v in m.items():
                a = np.asarray(v)
                out[k] = out.get(k, 0.0) + float(a.sum())
                counts[k] = counts.get(k, 0.0) + a.size
        return {k: v / max(counts[k], 1.0) for k, v in out.items()}

    def reset(self) -> None:
        self.pending = []


def prefetch_batches(iterator, convert, depth: int = 2):
    """Software pipeline: convert/upload ``depth`` batches ahead of the
    consumer so H2D transfer overlaps the device step."""
    import collections
    buf = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(depth):
            buf.append(convert(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(convert(next(it)))
        except StopIteration:
            pass
        yield out


class Trainer:
    """Orchestrates epochs over a DataFolder-style iterable of
    ``MolGraphBatch`` shards."""

    def __init__(self, model, optimizer, vocab_mask: np.ndarray,
                 beta: float = 0.1, print_iter: int = 50,
                 save_dir: Optional[str] = None, save_iter: int = -1,
                 clip_break_count: int = 5, seed: int = 1,
                 beta_warmup_steps: int = 0, mesh=None,
                 tp_min_dim: int = 256,
                 compact_plans: Optional[bool] = None):
        """``mesh``: a 1-D ``jax.sharding.Mesh`` over a ``data`` axis turns
        the Trainer data-parallel — each optimizer step consumes D
        same-shape batches sharded across the mesh with a gradient psum
        (ggpm_tpu.parallel.mesh.make_dp_train_step); params replicated.
        Build one with ``ggpm_tpu.parallel.mesh.make_mesh(n)``.

        ``compact_plans``: lane-pack decode plans before upload
        (batching.compact_plan_dict — same loss, ~2.5× fewer decoder-scan
        slots at large batch).  Default: on for the motif family, off for
        the hierarchical family (whose scan is not lane-agnostic)."""
        self.model = model
        self.optimizer = optimizer
        self.vocab_mask = np.asarray(vocab_mask)
        self.beta = beta
        self.print_iter = print_iter
        self.save_dir = save_dir
        self.save_iter = save_iter
        self.clip_break_count = clip_break_count
        self.rng = jax.random.PRNGKey(seed)
        self.beta_warmup_steps = beta_warmup_steps
        self.mesh = mesh
        self.tp_min_dim = tp_min_dim
        # batches consumed per parallel step = the DATA extent of the mesh
        # (a 2-D data × model mesh consumes dp batches, not dp·tp).  Under
        # multi-process (multi-host) the mesh is global and each process
        # feeds only its local slice of the data axis.
        if mesh is None:
            self.n_shards = 1
        elif 'data' in mesh.axis_names:
            self.n_shards = int(mesh.shape['data'])
        else:
            self.n_shards = int(np.prod(mesh.devices.shape))
        if mesh is not None and jax.process_count() > 1:
            assert 'model' not in mesh.axis_names, \
                'multi-process + TP is not supported (1-D data mesh only)'
            assert self.n_shards % jax.process_count() == 0, \
                (self.n_shards, jax.process_count())
            self.n_shards //= jax.process_count()
        if compact_plans is None:
            compact_plans = not getattr(model, 'is_hier', True)
        self.compact_plans = bool(compact_plans)
        self.step_fn = make_train_step(model, optimizer, beta,
                                       beta_warmup_steps=beta_warmup_steps)
        self.eval_fn = make_eval_step(model, beta)
        self.total_step = 0
        self.n_clipped = 0
        self.mols_seen = 0

    def init(self, sample_batch) -> Tuple[Any, Any]:
        self.rng, init_rng = jax.random.split(self.rng)
        params = init_params_on_cpu(
            self.model, sample_batch if isinstance(sample_batch, dict)
            else to_model_batch(sample_batch, self.vocab_mask, pad=False),
            init_rng, self.beta)
        opt_state = self.optimizer.init(params)
        return params, opt_state

    def train_step(self, params, opt_state, batch, step_idx=None):
        """One optimizer step with the PRNG key threaded on device (see
        make_train_step).  ``self.rng`` stays a device key throughout — no
        per-step host split.  Advances ``total_step`` (same contract as
        ``scan_steps``)."""
        idx = jnp.asarray(self.total_step if step_idx is None else step_idx,
                          dtype=jnp.float32)
        params, opt_state, metrics, aux, self.rng = self.step_fn(
            params, opt_state, batch, self.rng, idx)
        self.total_step += 1
        return params, opt_state, metrics, aux

    def dp_step(self, params, opt_state, db_list):
        """ONE data-parallel optimizer step over ``len(db_list) == D``
        same-shape host batches: stack on a leading device axis, shard over
        the mesh's ``data`` axis, gradient-psum inside
        (parallel.mesh.make_dp_train_step).  On a 2-D (data × model) mesh
        the step instead runs the GSPMD DP×TP formulation
        (parallel.mesh.make_gspmd_train_step): vocab-dimension parameters
        and their optimizer moments are sharded over the ``model`` axis
        (placed once, on the first step; donation keeps the shardings).
        These are the SAME code paths ``dryrun_multichip`` validates."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        assert self.mesh is not None, 'Trainer built without a mesh'
        is_2d = 'model' in self.mesh.axis_names
        if getattr(self, '_dp_fn', None) is None:
            if is_2d:
                from ..parallel.mesh import make_gspmd_train_step
                self._dp_fn, self._gspmd_place = make_gspmd_train_step(
                    self.model, self.optimizer, self.mesh, self.beta,
                    tp_min_dim=self.tp_min_dim)
            else:
                from ..parallel.mesh import make_dp_train_step
                self._dp_fn = make_dp_train_step(self.model, self.optimizer,
                                                 self.mesh, self.beta)
            if jax.process_count() > 1:
                from ..parallel.distributed import replicate_global
                self._mask_rep = replicate_global(self.vocab_mask, self.mesh)
            else:
                self._mask_rep = jax.device_put(
                    self.vocab_mask, NamedSharding(self.mesh, P()))
            self._placed = False
        if jax.process_count() > 1:
            # multi-host: this process holds n_shards of the global
            # data-axis extent; assemble the global sharded array from the
            # per-process local stacks (parallel.distributed)
            from ..parallel.distributed import global_device_batch
            stacked = global_device_batch(
                {k: jax.tree.map(lambda *xs: np.stack(xs),
                                 *[db[k] for db in db_list])
                 for k in db_list[0] if k != 'vocab_mask'}, self.mesh)
        else:
            dev_spec = NamedSharding(self.mesh, P('data'))
            stacked = {
                k: jax.tree.map(
                    lambda *xs: jax.device_put(np.stack(xs), dev_spec),
                    *[db[k] for db in db_list])
                for k in db_list[0] if k != 'vocab_mask'}
        stacked['vocab_mask'] = self._mask_rep
        if is_2d and not self._placed:
            params, opt_state, stacked = self._gspmd_place(params, opt_state,
                                                           stacked)
            self._placed = True
        self.rng, r = jax.random.split(self.rng)
        params, opt_state, metrics, aux = self._dp_fn(
            params, opt_state, stacked, r)
        self.total_step += 1
        return params, opt_state, metrics, aux

    def scan_steps(self, params, opt_state, stacked_batch):
        """K optimizer steps in one device call over a stacked batch pytree
        (see make_scan_train_step; build the stack with stack_batches).
        Returns stacked per-step metrics/aux (device-resident)."""
        if getattr(self, '_scan_fn', None) is None:
            self._scan_fn = make_scan_train_step(
                self.model, self.optimizer, self.beta,
                beta_warmup_steps=self.beta_warmup_steps)
        k = jax.tree.leaves(stacked_batch)[0].shape[0]
        params, opt_state, metrics, aux, self.rng = self._scan_fn(
            params, opt_state, stacked_batch, self.rng,
            float(self.total_step))
        self.total_step += k
        return params, opt_state, metrics, aux

    def _device_batch(self, mb) -> Dict:
        if not isinstance(mb, dict):
            mb = to_model_batch(mb, self.vocab_mask, pad=False)
        if self.compact_plans and 'mol_lane' not in mb['plan']:
            # lane-pack the decode plan on host before upload (numerically
            # identical loss with ~2.5× fewer decoder-scan slots at large
            # batch; see batching.compact_plan_dict)
            mb = dict(mb, plan=compact_plan_dict(
                {k: np.asarray(v) for k, v in mb['plan'].items()}))
        if self.mesh is not None:
            # data-parallel path: keep batches host-side; dp_step stacks D
            # of them and device_puts the stack with the mesh sharding
            return {k: v for k, v in mb.items() if k != 'vocab_mask'}
        # the vocab mask is large (hvocab × ivocab, ~84MB at full scale) and
        # constant: upload once and share the device buffer across steps
        if getattr(self, '_mask_dev', None) is None:
            self._mask_dev = jnp.asarray(mb['vocab_mask'])
        out = {k: jax.tree.map(jnp.asarray, v) for k, v in mb.items()
               if k != 'vocab_mask'}
        out['vocab_mask'] = self._mask_dev
        return out

    def train_epoch(self, params, opt_state, data: Iterable,
                    epoch: int = 0, log=print, scan_chunk: int = 8):
        """One epoch over streamed batches.

        Same-shape batches are buffered per signature and executed
        ``scan_chunk`` at a time as ONE lax.scan device call (bit-identical
        to sequential steps; see make_scan_train_step) — the dominant
        bucket runs with ~scan_chunk× fewer dispatches.  Oddly-shaped
        stragglers fall back to single steps."""
        from collections import defaultdict

        acc = MetricAccumulator()
        t0 = time.time()
        mols0 = self.mols_seen
        clipped_flags = []  # device values; materialised at print boundaries
        next_print = (self.total_step // self.print_iter + 1) * self.print_iter
        next_save = None
        if self.save_iter > 0:
            next_save = (self.total_step // self.save_iter + 1) * self.save_iter
        buckets = defaultdict(list)

        last_sync = self.total_step

        def run(params, opt_state, db_list):
            # a bucket flush carries up to scan_chunk batches; the DP step
            # consumes exactly n_shards per dispatch, so split the flush
            # into groups (slicing only the first n_shards would silently
            # drop the rest of the flush — up to 75% of the data at
            # n_shards=2, scan_chunk=8)
            if self.mesh is not None and len(db_list) > self.n_shards:
                for i in range(0, len(db_list), self.n_shards):
                    params, opt_state = run_one(
                        params, opt_state, db_list[i:i + self.n_shards])
                return params, opt_state
            return run_one(params, opt_state, db_list)

        def run_one(params, opt_state, db_list):
            nonlocal last_sync
            if self.mesh is not None:
                # fill a short final group by cycling (repeats get extra
                # gradient weight in that one step — standard last-batch fill)
                while len(db_list) < self.n_shards:
                    db_list = db_list + db_list[:self.n_shards - len(db_list)]
                params, opt_state, metrics, aux = self.dp_step(
                    params, opt_state, db_list)
            elif len(db_list) == 1:
                params, opt_state, metrics, aux = self.train_step(
                    params, opt_state, db_list[0])
            else:
                params, opt_state, metrics, aux = self.scan_steps(
                    params, opt_state, stack_batches(db_list))
            for db in db_list:
                self.mols_seen += len(db['plan']['root_clab'])
            acc.add(metrics)
            clipped_flags.append(aux.get('clipped', False))
            # bound the async dispatch backlog: donated outputs alias their
            # inputs, so blocking on params is a no-op — sync on the fresh
            # metrics tree every ~64 steps (an unsynced loop can queue
            # minutes of device work and starve everything behind it)
            if self.total_step - last_sync >= 64:
                device_sync(metrics)
                last_sync = self.total_step
            return params, opt_state

        def boundary(params, opt_state):
            nonlocal next_print, next_save
            if self.total_step >= next_print:
                next_print = (self.total_step // self.print_iter + 1) \
                    * self.print_iter
                self.n_clipped += int(np.sum([np.sum(np.asarray(x)) for x in
                                              jax.device_get(clipped_flags)]))
                clipped_flags.clear()
                if self.n_clipped >= self.clip_break_count:
                    log(f'[{self.total_step}] negative-loss clip count '
                        f'reached {self.n_clipped}; aborting run')
                    return True
                m = acc.mean()
                dt = time.time() - t0
                mps = (self.mols_seen - mols0) / max(dt, 1e-9)
                log(f'[{self.total_step}] Beta: {self.beta:.3f}, '
                    f'mols/s: {mps:.1f}, '
                    + ', '.join(f'{k}: {v:.3f}' for k, v in sorted(m.items())))
                acc.reset()
            if next_save is not None and self.total_step >= next_save:
                n_iter = self.total_step // self.save_iter - 1
                next_save = (self.total_step // self.save_iter + 1) \
                    * self.save_iter
                if self.save_dir:
                    ckpt.save_params(params, f'{self.save_dir}/model.{n_iter}')
            return False

        for batch in prefetch_batches(data, self._device_batch):
            sig = tuple(getattr(l, 'shape', ()) for l in jax.tree.leaves(batch))
            buckets[sig].append(batch)
            if len(buckets[sig]) >= scan_chunk:
                params, opt_state = run(params, opt_state, buckets.pop(sig))
                if boundary(params, opt_state):
                    return params, opt_state, True
        for db_list in buckets.values():
            params, opt_state = run(params, opt_state, db_list)
            if boundary(params, opt_state):
                return params, opt_state, True

        if clipped_flags:
            self.n_clipped += int(np.sum([np.sum(np.asarray(x)) for x in
                                          jax.device_get(clipped_flags)]))
            if self.n_clipped >= self.clip_break_count:
                return params, opt_state, True
        return params, opt_state, False

    def evaluate(self, params, data: Iterable) -> Dict[str, float]:
        acc = MetricAccumulator()
        for mb in data:
            batch = self._device_batch(mb)
            if 'vocab_mask' not in batch:
                # the mesh-path _device_batch strips the mask (dp_step
                # re-attaches it per shard); evaluation runs single-device,
                # so restore the shared device copy here
                if getattr(self, '_mask_dev', None) is None:
                    self._mask_dev = jnp.asarray(self.vocab_mask)
                batch = dict(batch, vocab_mask=self._mask_dev)
            self.rng, r = jax.random.split(self.rng)
            loss, metrics = self.eval_fn(params, batch, r)
            acc.add(metrics)
        return acc.mean()
