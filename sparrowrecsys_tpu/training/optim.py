"""Group-fused Adam: numerically identical to `optax.adam`, fewer ops.

Adam runs ~6-8 elementwise ops per parameter tensor per step. A CTR model
is many tiny tensors (DeepFM: ~20 leaves, most under 1e4 elements), so on
TPU the optimizer becomes op-dispatch-bound inside the scanned train step
— measured 0.08 ms/step of the ~1.0 ms DeepFM step (tools/step_exp5.py:
7.99 -> 8.63M ex/s at batch 8192). This transformation concatenates every
small float32 leaf into ONE vector (one set of Adam ops) and keeps large
tensors (embedding tables — whose ravel copy would cost more than it
saves, measured in tools/step_exp2.py) per-leaf.

Drop-in `optax.GradientTransformation`; bit-identical updates to
`optax.adam` (asserted in tests/test_optim.py) because Adam is
elementwise — concatenation changes layout, not math.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

#: Leaves with fewer elements ride the fused vector; larger ones (the
#: embedding tables) stay per-leaf.
SMALL_LEAF_MAX_ELEMS = 65536


class GroupedAdamState(NamedTuple):
    count: jnp.ndarray          # int32 step counter
    mu_vec: jnp.ndarray         # first moment, fused small leaves
    nu_vec: jnp.ndarray         # second moment, fused small leaves
    mu_big: Any                 # list of per-leaf first moments
    nu_big: Any                 # list of per-leaf second moments
    #: fp32 MASTER copies for narrow-float big leaves (bf16 table
    #: params, TrainConfig.bf16_table_params); () when master_weights
    #: is off, else a list aligned with the big leaves (None for leaves
    #: that are already fp32 / non-float).
    master_big: Any = ()


def grouped_adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    small_max_elems: int = SMALL_LEAF_MAX_ELEMS,
    big_moment_dtype=None,
    master_weights: bool = False,
) -> optax.GradientTransformation:
    """big_moment_dtype (e.g. jnp.bfloat16): storage dtype for the BIG
    leaves' mu/nu — the embedding tables, where the optimizer's HBM bytes
    live (moment streams measured 4.8 ms of the 262144-batch MFU step;
    bf16 moments saved 2.1 ms, tools/mfu_attrib.py). Update math stays
    fp32 (cast up, compute, cast back); params stay fp32 master weights.
    Small fused leaves always keep fp32 moments — they're dispatch-bound,
    not bytes-bound, so narrowing them risks quality for nothing.
    None (default) = fp32 everywhere; quality A/B in BASELINE.md
    (tools/moment_dtype_ab.py) before flipping any recipe to bf16.

    master_weights: for big leaves STORED narrow (bf16 table params —
    halves the dense update's param read+write streams AND the fwd
    gather/bwd scatter widths) keep an fp32 MASTER in the state; Adam
    updates the master, and the emitted update rebases the narrow param
    onto bf16(master) each step — p tracks bf16(master) to ~1 bf16 ulp
    of max(|p|, |step movement|), and the error does NOT compound
    because the target is recomputed from the exact fp32 master every
    step (asserted in tests/test_optim.py; the master trajectory itself
    is bitwise the fp32-Adam trajectory). The update math never reads
    the narrow copy. Quality A/B'd like every other narrowing option."""
    def _split_plan(params):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        small, big = [], []
        for i, leaf in enumerate(leaves):
            is_small = (
                int(np.prod(leaf.shape)) < small_max_elems
                and leaf.dtype == jnp.float32
            )
            (small if is_small else big).append(i)
        shapes = [leaves[i].shape for i in small]
        splits = np.cumsum(
            [int(np.prod(s)) for s in shapes]
        )[:-1].tolist()
        return treedef, leaves, small, big, shapes, splits

    def _to_groups(tree, small, big):
        ls = jax.tree_util.tree_leaves(tree)
        vec = (
            jnp.concatenate([ls[i].reshape(-1) for i in small])
            if small else jnp.zeros((0,), jnp.float32)
        )
        return vec, [ls[i] for i in big]

    def _needs_master(leaf):
        return (
            master_weights
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.dtype != jnp.float32
        )

    def init(params):
        _, leaves, small, big, _, _ = _split_plan(params)
        vec, bigs = _to_groups(params, small, big)
        z = lambda x: jnp.zeros_like(x)
        zb = (
            (lambda x: jnp.zeros(x.shape, big_moment_dtype))
            if big_moment_dtype is not None
            else (lambda x: jnp.zeros(x.shape, jnp.float32)
                  if _needs_master(x) else jnp.zeros_like(x))
        )
        masters = (
            [b.astype(jnp.float32) if _needs_master(b) else None
             for b in bigs]
            if master_weights else ()
        )
        return GroupedAdamState(
            count=jnp.zeros((), jnp.int32),
            mu_vec=z(vec), nu_vec=z(vec),
            mu_big=[zb(b) for b in bigs], nu_big=[zb(b) for b in bigs],
            master_big=masters,
        )

    def update(grads, state, params=None):
        treedef, leaves, small, big, shapes, splits = _split_plan(grads)
        gvec, gbig = _to_groups(grads, small, big)
        count = state.count + 1
        tf = count.astype(jnp.float32)
        c1 = 1 - b1 ** tf
        c2 = 1 - b2 ** tf

        def adam_one(mu, nu, g):
            mu = b1 * mu + (1 - b1) * g
            nu = b2 * nu + (1 - b2) * (g * g)
            upd = -learning_rate * (mu / c1) / (jnp.sqrt(nu / c2) + eps)
            return mu, nu, upd

        mu_vec, nu_vec, upd_vec = adam_one(state.mu_vec, state.nu_vec, gvec)
        mu_big, nu_big, upd_big = [], [], []
        masters = (
            list(state.master_big) if master_weights
            else [None] * len(gbig)
        )
        if master_weights and params is None and any(
            m is not None for m in masters
        ):
            raise ValueError(
                "grouped_adam(master_weights=True) needs params in "
                "update() to rebase the narrow copies (the Trainer "
                "passes them; bare optax-style update(grads, state) "
                "cannot)"
            )
        pbig = (
            _to_groups(params, small, big)[1]
            if master_weights and params is not None else [None] * len(gbig)
        )
        for k, (mu, nu, g) in enumerate(zip(state.mu_big, state.nu_big,
                                            gbig)):
            if masters[k] is not None:
                # Narrow-stored leaf: fp32 math against the master; the
                # emitted update REBASES the narrow param onto
                # bf16(master') (requires params in update(), which the
                # Trainer passes).
                g32 = g.astype(jnp.float32)
                m2, n2, u32 = adam_one(
                    mu.astype(jnp.float32), nu.astype(jnp.float32), g32
                )
                new_master = masters[k] + u32
                masters[k] = new_master
                p = pbig[k]
                u = (
                    new_master.astype(p.dtype).astype(jnp.float32)
                    - p.astype(jnp.float32)
                ).astype(p.dtype)
                if big_moment_dtype is not None:
                    m2 = m2.astype(big_moment_dtype)
                    n2 = n2.astype(big_moment_dtype)
                mu_big.append(m2)
                nu_big.append(n2)
                upd_big.append(u)
                continue
            m2, n2, u = adam_one(
                mu.astype(g.dtype), nu.astype(g.dtype), g
            )
            if big_moment_dtype is not None:
                m2 = m2.astype(big_moment_dtype)
                n2 = n2.astype(big_moment_dtype)
            mu_big.append(m2)
            nu_big.append(n2)
            upd_big.append(u)

        out = [None] * len(leaves)
        if small:
            parts = jnp.split(upd_vec, splits)
            for j, i in enumerate(small):
                parts_j = parts[j].reshape(shapes[j])
                out[i] = parts_j
        for j, i in enumerate(big):
            out[i] = upd_big[j]
        updates = jax.tree_util.tree_unflatten(treedef, out)
        return updates, GroupedAdamState(
            count, mu_vec, nu_vec, mu_big, nu_big,
            masters if master_weights else (),
        )

    return optax.GradientTransformation(init, update)
