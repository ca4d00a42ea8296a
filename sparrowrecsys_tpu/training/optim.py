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


def grouped_adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    small_max_elems: int = SMALL_LEAF_MAX_ELEMS,
    big_moment_dtype=None,
) -> optax.GradientTransformation:
    """big_moment_dtype (e.g. jnp.bfloat16): storage dtype for the BIG
    leaves' mu/nu — the embedding tables, where the optimizer's HBM bytes
    live (moment streams measured 4.8 ms of the 262144-batch MFU step;
    bf16 moments saved 2.1 ms, tools/mfu_attrib.py). Update math stays
    fp32 (cast up, compute, cast back); params stay fp32 master weights.
    Small fused leaves always keep fp32 moments — they're dispatch-bound,
    not bytes-bound, so narrowing them risks quality for nothing.
    None (default) = fp32 everywhere; quality A/B in BASELINE.md
    (tools/moment_dtype_ab.py) before flipping any recipe to bf16."""
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

    def init(params):
        _, leaves, small, big, _, _ = _split_plan(params)
        vec, bigs = _to_groups(params, small, big)
        z = lambda x: jnp.zeros_like(x)
        zb = (
            (lambda x: jnp.zeros(x.shape, big_moment_dtype))
            if big_moment_dtype is not None else z
        )
        return GroupedAdamState(
            count=jnp.zeros((), jnp.int32),
            mu_vec=z(vec), nu_vec=z(vec),
            mu_big=[zb(b) for b in bigs], nu_big=[zb(b) for b in bigs],
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
        for mu, nu, g in zip(state.mu_big, state.nu_big, gbig):
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
        return updates, GroupedAdamState(count, mu_vec, nu_vec, mu_big, nu_big)

    return optax.GradientTransformation(init, update)
