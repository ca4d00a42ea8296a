"""Jit-compiled training/evaluation loops.

Replaces the reference's Keras `model.compile(loss='binary_crossentropy',
optimizer='adam', metrics=[accuracy, ROC-AUC, PR-AUC]); model.fit(epochs=5)`
skeleton (`TFRecModel/.../EmbeddingMLP.py:87-98` and mirrors) with a
TPU-native loop:

- one jitted `train_step` (forward + BCE + Adam update + streaming-metric
  accumulation) — no host round-trip per step beyond feeding the batch;
- static shapes: the final partial batch is padded and masked, so one
  compilation serves the whole epoch;
- parity knobs: Adam eps defaults to Keras's 1e-7, batch=12 available as
  `TrainConfig.parity_batch_size`, 5 epochs;
- mesh-aware: params/batches are placed with `parallel.mesh` shardings, so
  the same step scales from 1 chip to a (data, model) mesh — XLA inserts
  the gradient all-reduce and embedding all-gathers.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.parallel.mesh import MeshPlan, shard_batch, shard_params


@dataclasses.dataclass
class TrainResult:
    params: Any
    history: list  # per-epoch dicts of train metrics
    eval_metrics: Optional[Dict[str, float]] = None
    examples_per_sec: float = 0.0


def hard_sync(tree) -> None:
    """Force completion of the computation producing `tree`.

    `jax.block_until_ready` returns early on some PJRT backends (observed
    on the remote-attached axon TPU client: it does not wait for enqueued
    executions). Reading output bytes device->host cannot lie — a
    one-element read of an output buffer completes only after the
    producing executable (and its dependency chain) has finished.
    """
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


def _default_loss(apply_fn, params, feats, labels, mask):
    logits = apply_fn({"params": params}, feats)
    bce = optax.sigmoid_binary_cross_entropy(logits, labels)
    loss = jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return loss, (logits, jnp.sum(bce * mask))


class Trainer:
    """Generic CTR trainer.

    model: a Flax module whose apply returns logits [B] (or (logits, aux)
    when `loss_fn` is supplied, e.g. DIEN's `dien_loss`).
    """

    def __init__(
        self,
        model,
        config: Optional[TrainConfig] = None,
        plan: Optional[MeshPlan] = None,
        loss_fn: Optional[Callable] = None,
        sparse_tables: Optional[Dict[str, tuple]] = None,
    ):
        self.model = model
        self.config = config or TrainConfig()
        self.plan = plan
        self.loss_fn = loss_fn
        #: Row-sparse (lazy) Adam for big embedding tables, OPT-IN:
        #: {param module name: (feature columns gathering from it, ...)},
        #: e.g. {"emb_userId": ("userId",)}. Those tables leave the dense
        #: optimizer entirely — only the step's touched rows stream
        #: moments (training/row_optim.py; dense moment traffic measured
        #: 5.7 ms/step on a 2^20 x 128 table, BASELINE.md round 4).
        #: LazyAdam semantics: untouched rows' moments freeze rather than
        #: decay — quality parity is the caller's to probe.
        self.sparse_tables = {
            k: tuple(v) if not isinstance(v, str) else (v,)
            for k, v in (sparse_tables or {}).items()
        }
        # Group-fused Adam: numerically identical to optax.adam (see
        # training/optim.py; asserted in tests), ~8% faster per step on
        # TPU by fusing the many tiny tensors' optimizer ops.
        from sparrowrecsys_tpu.training.optim import grouped_adam

        self.tx = grouped_adam(
            self.config.learning_rate,
            b1=self.config.adam_b1,
            b2=self.config.adam_b2,
            eps=self.config.adam_eps,
            big_moment_dtype=(
                None
                if self.config.big_moment_dtype == "float32"
                else jnp.dtype(self.config.big_moment_dtype)
            ),
            master_weights=self.config.bf16_table_params,
        )
        self._train_step = None
        self._train_step_indexed = None
        self._eval_step = None
        #: Datasets smaller than this live device-resident during fit();
        #: larger ones stream per-batch from host. ~2 GB leaves headroom on
        #: a 16 GB v5e for params/activations at these model sizes.
        self.device_resident_bytes = 2 << 30

    # ------------------------------------------------------------------
    def _dense_view(self, tree):
        """Replace sparse-table leaves with empty placeholders so the
        dense optimizer neither stores nor streams state for them."""
        out = dict(tree)
        for mod in self.sparse_tables:
            sub = dict(out[mod])
            sub["table"] = jnp.zeros((0,), jnp.float32)
            out[mod] = sub
        return out

    def init_opt_state(self, params):
        """Optimizer state: the dense transform's state, plus per-table
        FUSED row-Adam buffers when sparse_tables is configured — the
        table itself moves INTO the [V, 3D] buffer (table|mu|nu) so the
        whole lazy-Adam step is one row gather + one row scatter
        (tools/row_optim_probe.py attributed the 3-scatter layout
        scatter-bound). During fit() the param tree carries an empty
        placeholder for those tables; fit() re-materializes them on
        return. Use this (not tx.init) whenever sparse tables may be
        on."""
        if not self.sparse_tables:
            return self.tx.init(params)
        from sparrowrecsys_tpu.training.row_optim import init_fused_row_adam

        return {
            "dense": self.tx.init(self._dense_view(params)),
            "rows": {
                mod: init_fused_row_adam(params[mod]["table"])
                for mod in self.sparse_tables
            },
        }

    def _materialize_tables(self, params, opt_state):
        """Copy the param table out of each fused optimizer buffer back
        into the param tree (inverse of the fit()-time placeholdering)."""
        from sparrowrecsys_tpu.training.row_optim import fused_table

        out = dict(params)
        for mod in self.sparse_tables:
            sub = dict(out[mod])
            sub["table"] = fused_table(opt_state["rows"][mod])
            out[mod] = sub
        return out

    # ------------------------------------------------------------------
    def init_params(self, sample_feats: Dict[str, np.ndarray], seed: int = None):
        seed = self.config.seed if seed is None else seed
        feats = {k: jnp.asarray(v[:2]) for k, v in sample_feats.items()}
        prep = getattr(self.loss_fn, "prepare_init_features", None)
        if prep is not None:
            # rng-wanting losses that synthesize columns in-step (DIEN's
            # in-graph negatives) supply them for shape inference here.
            feats = prep(feats)
        params = self.model.init(jax.random.PRNGKey(seed), feats)["params"]
        if self.config.bf16_table_params:
            from sparrowrecsys_tpu.training.optim import SMALL_LEAF_MAX_ELEMS

            # Narrow STORAGE for the big tables; grouped_adam keeps an
            # fp32 master per narrowed leaf (master_weights=True below)
            # so update math never loses bits to the bf16 copy.
            params = jax.tree.map(
                lambda x: (
                    x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32
                    and x.size >= SMALL_LEAF_MAX_ELEMS else x
                ),
                params,
            )
        if self.plan is not None:
            params = shard_params(params, self.plan)
        return params

    # ------------------------------------------------------------------
    def _build_steps(self):
        apply_fn = self.model.apply
        loss_fn = self.loss_fn

        def train_epoch(
            params, opt_state, mstate, data, labels_all, key,
            *, n, batch_size, shuffle,
        ):
            """Device-resident whole-epoch step: shuffle + batch + train
            entirely on device via one `lax.scan` dispatch. Per-epoch
            host->device traffic is ONE PRNG key — dispatch/transfer
            latency (severe over remote-attached TPUs, real everywhere)
            amortizes to zero.

            Scalar feature columns are PACKED into dense [N, C] matrices
            (one int32, one float32; labels ride the float matrix) and
            the epoch permutation is applied ONCE to those matrices
            before the scan; the scan then consumes contiguous
            [steps, batch, C] xs slices. Batch composition is
            bit-identical to gathering `permutation(key, n)` rows per
            step, but the random row gather — which reads a whole
            (8, 128) tile per ~100 B row on TPU — leaves the step's
            critical path. Measured on v5e (tools/step_exp7.py, batch
            65536): 10.24 -> 11.86M ex/s (+16%) over the in-scan gather,
            itself worth +51% over per-column gathers (tools/step_exp3).
            `shuffle_mode="blocks"` additionally permutes fixed
            `shuffle_block`-row blocks instead of rows (contiguous
            gathers, zero tile waste, ~+6% more) at the cost of
            approximate shuffling — opt-in, reference's buffer shuffle
            is also approximate (`EmbeddingMLP.py:14-22`).

            Memory: packing + the permuted xs are ~2 transient dataset
            copies on top of the resident columns — size
            `device_resident_bytes` (and any override, see
            tools/scale_demo.py's 8 GB) to ~1/3 of free HBM."""
            steps = -(-n // batch_size)
            padded = steps * batch_size
            block = self.config.shuffle_block
            use_blocks = (
                shuffle
                and self.config.shuffle_mode == "blocks"
                and padded % block == 0
            )

            if use_blocks:
                nb = padded // block
                border = jax.random.permutation(key, nb).astype(jnp.int32)

                def perm(x):
                    pad = ((0, padded - n),) + ((0, 0),) * (x.ndim - 1)
                    xp = jnp.pad(x, pad)
                    xb = xp.reshape((nb, block) + x.shape[1:])
                    return jnp.take(xb, border, axis=0).reshape(
                        (padded,) + x.shape[1:]
                    )

                # Pad rows land inside permuted blocks — permute the mask
                # with the data (perm pads its n-length input) so it
                # stays row-aligned.
                mask_flat = perm(jnp.ones((n,), jnp.float32))
            else:
                order = (
                    jax.random.permutation(key, n) if shuffle else jnp.arange(n)
                ).astype(jnp.int32)
                order = jnp.pad(order, (0, padded - n))

                def perm(x):
                    return jnp.take(x, order, axis=0)

                # Pad positions sit at the tail of the (padded) order, so
                # the unpermuted tail mask stays aligned.
                mask_flat = (jnp.arange(padded) < n).astype(jnp.float32)

            # Pack scalar columns by dtype; rare non-1D columns ride along.
            int_cols = [
                k for k, v in data.items()
                if v.ndim == 1 and jnp.issubdtype(v.dtype, jnp.integer)
            ]
            flt_cols = [
                k for k, v in data.items()
                if v.ndim == 1 and not jnp.issubdtype(v.dtype, jnp.integer)
            ]
            other = {k: v for k, v in data.items() if v.ndim != 1}

            def col_stack(cols):
                # [N, C] column pack WITHOUT unit-dim intermediates:
                # concat the 1-D columns -> [C*N] -> reshape [C, N] ->
                # transpose. `jnp.stack(axis=1)` lowers each operand to an
                # [N, 1] reshape; past ~50 columns XLA stops fusing them
                # and materializes every [N, 1] temporary, whose unit lane
                # dim TILE-PADS to 128 (~146 MB apiece at N=300k) —
                # planned 8.5-71.5 GB of HBM and failed compile outright
                # at 64-length histories (tools/t64_oom_probe.py bisect,
                # 2026-08-19). The 1-D concat + one real transpose has no
                # unit dims anywhere and bounded (<=2x) tile waste.
                c = len(cols)
                return jnp.concatenate(cols).reshape(c, -1).T

            xs = {
                "f": perm(
                    col_stack(
                        [data[k].astype(jnp.float32) for k in flt_cols]
                        + [labels_all.astype(jnp.float32)]
                    )
                ).reshape(steps, batch_size, len(flt_cols) + 1),
                "m": mask_flat.reshape(steps, batch_size),
                "o": {
                    k: perm(v).reshape((steps, batch_size) + v.shape[1:])
                    for k, v in other.items()
                },
            }
            if int_cols:
                xs["i"] = perm(
                    col_stack([data[k].astype(jnp.int32) for k in int_cols])
                ).reshape(steps, batch_size, len(int_cols))

            if self.plan is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                def constrain(x):
                    spec = P(None, self.plan.data_axis, *((None,) * (x.ndim - 2)))
                    return jax.lax.with_sharding_constraint(
                        x, NamedSharding(self.plan.mesh, spec)
                    )

                xs = jax.tree.map(constrain, xs)

            if wants_rng:
                # Per-step PRNG keys for rng-wanting loss fns (e.g. DIEN's
                # in-graph negative sampling): derived from the epoch key
                # on a domain-separated stream so the shuffle permutation
                # is untouched.
                xs["k"] = jax.random.split(
                    jax.random.fold_in(key, 0x6E6567), steps  # "neg"
                )

            def body(carry, x):
                p, o, m = carry
                feats = {}
                if int_cols:
                    for j, k in enumerate(int_cols):
                        feats[k] = x["i"][:, j]
                for j, k in enumerate(flt_cols):
                    feats[k] = x["f"][:, j]
                labels = x["f"][:, -1]
                feats.update(x["o"])
                return train_step(
                    p, o, m, feats, labels, x["m"], x.get("k")
                ), None

            (params, opt_state, mstate), _ = jax.lax.scan(
                body, (params, opt_state, mstate), xs,
                unroll=self.config.epoch_unroll,
            )
            return params, opt_state, mstate

        wants_rng = bool(getattr(loss_fn, "wants_rng", False))

        def train_step(params, opt_state, mstate, feats, labels, mask,
                       step_key=None):
            if loss_fn is None:
                def base(pm):
                    return _default_loss(apply_fn, pm, feats, labels, mask)
            elif wants_rng:
                def base(pm):
                    return loss_fn(apply_fn, pm, feats, labels, mask,
                                   step_key)
            else:
                def base(pm):
                    return loss_fn(apply_fn, pm, feats, labels, mask)
            if self.sparse_tables:
                # The sparse tables live inside the fused [V, 3D] opt
                # buffers (params hold empty placeholders); slice the
                # table views out, differentiate w.r.t. them alongside
                # the rest of the params, then run one fused
                # gather+scatter lazy-Adam step per table.
                from sparrowrecsys_tpu.training.row_optim import (
                    fused_row_adam_update,
                    fused_table,
                )

                cfg = self.config
                rows_in = opt_state["rows"]
                tables = {
                    mod: fused_table(rows_in[mod])
                    for mod in self.sparse_tables
                }

                def with_tables(p, tbls):
                    pm = dict(p)
                    for mod, t in tbls.items():
                        sub = dict(pm[mod])
                        sub["table"] = t
                        pm[mod] = sub
                    return pm

                (loss, (logits, loss_sum)), (gp, gt) = jax.value_and_grad(
                    lambda p, tbls: base(with_tables(p, tbls)),
                    argnums=(0, 1), has_aux=True,
                )(params, tables)
                # gp's placeholder leaves are zeros((0,)) (unused diff
                # input) — exactly the dense view the dense transform
                # was initialized with.
                updates, dstate = self.tx.update(gp, opt_state["dense"],
                                                 params)
                params = optax.apply_updates(params, updates)
                rows = {}
                for mod, cols in self.sparse_tables.items():
                    ids = jnp.concatenate(
                        [feats[c].reshape(-1).astype(jnp.int32) for c in cols]
                    )
                    rows[mod] = fused_row_adam_update(
                        rows_in[mod], gt[mod], ids,
                        learning_rate=cfg.learning_rate, b1=cfg.adam_b1,
                        b2=cfg.adam_b2, eps=cfg.adam_eps,
                        rowio=cfg.sparse_rowio,
                    )
                opt_state = {"dense": dstate, "rows": rows}
            else:
                (loss, (logits, loss_sum)), grads = jax.value_and_grad(
                    base, has_aux=True,
                )(params)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            probs = jax.nn.sigmoid(logits)
            mstate = M.update_metrics(mstate, probs, labels, loss_sum, mask)
            return params, opt_state, mstate

        def eval_step(params, feats):
            out = apply_fn({"params": params}, feats)
            logits = out[0] if isinstance(out, tuple) else out
            return jax.nn.sigmoid(logits)

        donate = (0, 1, 2)
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._train_epoch = jax.jit(
            train_epoch,
            donate_argnums=donate,
            static_argnames=("n", "batch_size", "shuffle"),
        )
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    def _batches(self, ds: EncodedDataset, batch_size: int, shuffle: bool, seed: int):
        for feats, labels, mask in ds.batches(
            batch_size, shuffle=shuffle, seed=seed, pad_final=True
        ):
            m = np.ones(len(labels), np.float32) if mask is None else mask
            batch = (
                {k: jnp.asarray(v) for k, v in feats.items()},
                jnp.asarray(labels),
                jnp.asarray(m),
            )
            if self.plan is not None:
                batch = shard_batch(batch, self.plan)
            yield batch

    def fit(
        self,
        train: EncodedDataset,
        test: Optional[EncodedDataset] = None,
        params=None,
        epochs: Optional[int] = None,
        batch_size: Optional[int] = None,
        verbose: bool = True,
        state_dir: Optional[str] = None,
        checkpoint_every: int = 1,
        resume: bool = False,
    ) -> TrainResult:
        """Train; returns TrainResult with steady-state examples_per_sec.

        verbose=True prints per-epoch metrics, which costs one device->host
        read per epoch inside the timed window — benchmarks should pass
        verbose=False (bench.py does).

        state_dir enables full train-state checkpointing (params + Adam
        moments + epoch cursor) every `checkpoint_every` epochs; with
        resume=True the newest state under state_dir is restored and
        training continues from its epoch cursor. Because the per-epoch
        shuffle key is PRNGKey(seed + epoch), a resumed run replays the
        exact batch schedule of an uninterrupted one (bitwise — see
        tests/test_checkpoint.py)."""
        cfg = self.config
        epochs = cfg.epochs if epochs is None else epochs
        batch_size = cfg.batch_size if batch_size is None else batch_size
        if self._train_step is None:
            self._build_steps()
        if params is None:
            params = self.init_params(train.features)
        opt_state = self.init_opt_state(params)
        if self.sparse_tables:
            # The real tables now live inside the fused optimizer buffers
            # (init_opt_state embedded them); train with placeholders in
            # the param tree and re-materialize on return. Checkpoints
            # save this (placeholder + fused) form, so resume templates
            # match.
            params = self._dense_view(params)
        start_epoch = 0
        if resume and state_dir:
            from sparrowrecsys_tpu.training import checkpoint as ckpt

            try:
                params, opt_state, start_epoch, _ = (
                    ckpt.load_latest_train_state(state_dir, params, opt_state)
                )
                if verbose:
                    print(f"resumed train state at epoch {start_epoch}")
            except FileNotFoundError:
                # No version dirs at all: first run, cold start. A
                # params-only export raises NotATrainStateError instead
                # and propagates — resuming "from" one would silently
                # restart with fresh params.
                pass

        ds_bytes = sum(v.nbytes for v in train.features.values()) + train.labels.nbytes
        resident = ds_bytes <= self.device_resident_bytes
        data_dev = labels_dev = None
        if resident:
            # Upload the whole epoch once; batches become on-device gathers
            # driven by [B] index arrays (replicated data, data-sharded idx).
            if self.plan is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self.plan.mesh, P())
                data_dev = {
                    k: jax.device_put(v, rep) for k, v in train.features.items()
                }
                labels_dev = jax.device_put(train.labels, rep)
            else:
                data_dev = {k: jnp.asarray(v) for k, v in train.features.items()}
                labels_dev = jnp.asarray(train.labels)

        history = []
        total_examples = 0
        t0 = time.perf_counter()
        self._timed_examples = 0
        self._t_steady = None  # set after the first (compiling) step returns
        n = len(train)
        if cfg.shuffle_mode == "blocks":
            padded = -(-n // batch_size) * batch_size
            if padded % cfg.shuffle_block != 0:
                print(
                    f"shuffle_mode='blocks' requested but padded epoch size "
                    f"{padded} is not a multiple of shuffle_block="
                    f"{cfg.shuffle_block}; falling back to exact shuffle"
                )

        def maybe_checkpoint(epoch_done: int) -> None:
            if not state_dir:
                return
            last = epoch_done == epochs
            if last or (checkpoint_every and epoch_done % checkpoint_every == 0):
                from sparrowrecsys_tpu.training import checkpoint as ckpt

                ckpt.save_train_state(
                    params, opt_state, epoch_done, state_dir,
                    keep=cfg.checkpoint_keep,
                )

        for epoch in range(start_epoch, epochs):
            mstate = M.init_metrics()
            if resident:
                params, opt_state, mstate = self._train_epoch(
                    params, opt_state, mstate, data_dev, labels_dev,
                    jax.random.PRNGKey(cfg.seed + epoch),
                    n=n, batch_size=batch_size,
                    shuffle=cfg.shuffle_each_epoch,
                )
                total_examples += n
                if self._t_steady is None:
                    hard_sync(params)  # first epoch pays compile
                    self._t_steady = time.perf_counter()
                else:
                    self._timed_examples += n
                # Finalize asynchronously; host-side float() reads wait until
                # after training (each device->host read is a full round trip
                # on remote-attached TPUs).
                history.append(M.finalize_metrics(mstate))
                if verbose:
                    em = {k: float(v) for k, v in history[-1].items()}
                    print(
                        f"epoch {epoch + 1}/{epochs}: loss={em['loss']:.4f} "
                        f"acc={em['accuracy']:.4f} roc_auc={em['roc_auc']:.4f} "
                        f"pr_auc={em['pr_auc']:.4f}"
                    )
                maybe_checkpoint(epoch + 1)
                continue
            wants_rng = bool(getattr(self.loss_fn, "wants_rng", False))
            step_keys = None
            if wants_rng:
                step_keys = iter(
                    jax.random.split(
                        jax.random.fold_in(
                            jax.random.PRNGKey(cfg.seed + epoch), 0x6E6567
                        ),
                        -(-len(train) // batch_size),
                    )
                )
            for feats, labels, mask in self._batches(
                train, batch_size, cfg.shuffle_each_epoch, cfg.seed + epoch
            ):
                params, opt_state, mstate = self._train_step(
                    params, opt_state, mstate, feats, labels, mask,
                    *((next(step_keys),) if wants_rng else ()),
                )
                real = int(np.sum(np.asarray(mask) > 0)) if mask is not None else batch_size
                total_examples += real
                if self._t_steady is None:
                    hard_sync(params)  # first step pays compile
                    self._t_steady = time.perf_counter()
                else:
                    self._timed_examples += real
            history.append(M.finalize_metrics(mstate))
            if verbose:
                em = {k: float(v) for k, v in history[-1].items()}
                print(
                    f"epoch {epoch + 1}/{epochs}: loss={em['loss']:.4f} "
                    f"acc={em['accuracy']:.4f} roc_auc={em['roc_auc']:.4f} "
                    f"pr_auc={em['pr_auc']:.4f}"
                )
            maybe_checkpoint(epoch + 1)
        if self.sparse_tables:
            params = self._materialize_tables(params, opt_state)
        hard_sync(params)
        end = time.perf_counter()
        # Convert deferred per-epoch device metrics to floats (post-timing).
        history = [{k: float(v) for k, v in em.items()} for em in history]
        # Steady-state throughput: the first step carries jit compilation
        # (~30s on a cold TPU), so it is excluded from the rate.
        if self._t_steady is not None and self._timed_examples > 0:
            dt = end - self._t_steady
            total_examples = self._timed_examples
        else:
            dt = end - t0

        eval_metrics = None
        if test is not None:
            eval_metrics = self.evaluate(params, test, batch_size)
            if verbose:
                print(
                    "test: "
                    + " ".join(f"{k}={v:.4f}" for k, v in eval_metrics.items())
                )
        return TrainResult(
            params=params,
            history=history,
            eval_metrics=eval_metrics,
            examples_per_sec=total_examples / max(dt, 1e-9),
        )

    # ------------------------------------------------------------------
    def predict(
        self, params, ds: EncodedDataset, batch_size: Optional[int] = None
    ) -> np.ndarray:
        if self._eval_step is None:
            self._build_steps()
        # Inference batch need not match the training batch — default to a
        # large one so tiny-batch parity runs don't pay per-batch dispatch
        # costs. An explicit batch_size is respected (memory control).
        if batch_size is None:
            batch_size = max(self.config.batch_size, 4096)
        out = []
        for feats, labels, mask in self._batches(ds, batch_size, False, 0):
            probs = self._eval_step(params, feats)
            p = np.asarray(probs)
            if mask is not None:
                p = p[np.asarray(mask) > 0]
            out.append(p)
        return np.concatenate(out) if out else np.empty(0, np.float32)

    def evaluate(
        self, params, ds: EncodedDataset, batch_size: Optional[int] = None
    ) -> Dict[str, float]:
        """Exact (sort-based) eval metrics + mean BCE, like Keras `evaluate`."""
        probs = self.predict(params, ds, batch_size)
        labels = ds.labels[: len(probs)]
        eps = 1e-7
        p = np.clip(probs, eps, 1 - eps)
        bce = -(labels * np.log(p) + (1 - labels) * np.log(1 - p)).mean()
        acc = float(((probs > 0.5) == (labels > 0.5)).mean())
        aucs = M.exact_auc(probs, labels)
        return {"loss": float(bce), "accuracy": acc, **aucs}
