"""Retrieval training: two-tower with in-batch sampled-softmax negatives.

A first-class capability the reference lacks: its NeuralCF towers are
trained pointwise on CTR labels (`NeuralCF.py:83-93`), which ranks unseen
movies arbitrarily over the whole catalog (recall@10 ~ random — measured
in recall.json). This trainer optimizes the towers the retrieval way:
each batch of positive (user, movie) pairs forms a [B, B] logit matrix
(user i x item j dot products); the diagonal is the positive class of a
softmax cross-entropy — every other in-batch item is a negative.

Same TPU scheduling design as the CTR trainer: the positive-pair arrays
live on device and a whole epoch runs as one `lax.scan` dispatch.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparrowrecsys_tpu.data.dataset import EncodedDataset


@dataclasses.dataclass(frozen=True)
class RetrievalConfig:
    batch_size: int = 1024
    epochs: int = 20
    learning_rate: float = 1e-3
    seed: int = 0
    #: sampling-bias (logQ) correction for in-batch negatives: subtract
    #: log p(item) from every logit, where p is the empirical positive-
    #: pair frequency (Yi et al. 2019, sampling-bias-corrected two-tower).
    #: Without it, popular items double as frequent negatives and the
    #: model learns to DOWN-rank exactly the items test users pick —
    #: round-1's recall@10 = 0.022 pathology.
    logq: bool = True
    #: softmax temperature on the dot products (1/T scaling).
    temperature: float = 1.0
    #: L2-normalize tower outputs (cosine retrieval); pairs with a low
    #: temperature (0.1-0.3). Applied identically at train and inference.
    l2_normalize: bool = False
    #: AdamW weight decay (0 = plain Adam).
    weight_decay: float = 0.0


class RetrievalTrainer:
    """Trains a `NeuralCFTwoTower`-style model (must expose `user_tower`
    and `item_tower` methods) on positive pairs."""

    def __init__(self, model, config: RetrievalConfig = RetrievalConfig()):
        self.model = model
        self.config = config
        self.tx = (
            optax.adamw(config.learning_rate, weight_decay=config.weight_decay)
            if config.weight_decay
            else optax.adam(config.learning_rate)
        )

    def _norm(self, x):
        if self.config.l2_normalize:
            return x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9
            )
        return x

    def _loss(self, params, users, movies, log_q):
        uv = self._norm(
            self.model.apply({"params": params}, users, method=self.model.user_tower)
        )
        iv = self._norm(
            self.model.apply({"params": params}, movies, method=self.model.item_tower)
        )
        logits = jnp.dot(uv, iv.T, preferred_element_type=jnp.float32)
        logits = logits / self.config.temperature
        # log_q: [B] log-frequency of each in-batch item; 0 when disabled
        logits = logits - log_q[None, :]
        labels = jnp.arange(logits.shape[0])
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    def fit(self, ds: EncodedDataset, params=None):
        """Train on the positive rows of a CTR dataset. Returns params."""
        pos = ds.labels > 0.5
        return self.fit_pairs(
            ds.features["userId"][pos].astype(np.int32),
            ds.features["movieId"][pos].astype(np.int32),
            params=params,
        )

    def fit_pairs(self, users: np.ndarray, movies: np.ndarray, params=None):
        """Train on explicit positive (user, movie) id pairs — used by the
        leave-one-out recall protocol, which derives pairs from the raw
        ratings stream rather than the sampled CTR table."""
        cfg = self.config
        users = np.asarray(users, np.int32)
        movies = np.asarray(movies, np.int32)
        n = len(users)
        if n == 0:
            raise ValueError(
                "RetrievalTrainer.fit needs positive (label=1) pairs; "
                "the dataset has none"
            )
        bs = min(cfg.batch_size, n)
        steps = max(n // bs, 1)

        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(cfg.seed),
                {"movieId": jnp.zeros(2, jnp.int32), "userId": jnp.zeros(2, jnp.int32)},
            )["params"]
        opt_state = self.tx.init(params)
        users_d, movies_d = jnp.asarray(users), jnp.asarray(movies)

        # Empirical item sampling probability over the positive pairs
        # (what in-batch negative sampling actually draws from).
        if cfg.logq:
            counts = np.bincount(movies, minlength=1)
            with np.errstate(divide="ignore"):
                lq = np.log(counts / max(n, 1))
            lq[~np.isfinite(lq)] = 0.0
            log_q_all = jnp.asarray(lq, jnp.float32)
        else:
            log_q_all = None

        loss_fn = self._loss
        tx = self.tx

        @jax.jit
        def epoch(params, opt_state, users_all, movies_all, key):
            # Permute the pair arrays once and scan contiguous xs slices
            # (same restructuring as training.loop / tools/step_exp7.py:
            # random [B] gathers inside the scan are tile-amplified).
            perm = jax.random.permutation(key, n)[: steps * bs]
            u_all = jnp.take(users_all, perm).reshape(steps, bs)
            m_all = jnp.take(movies_all, perm).reshape(steps, bs)

            def body(carry, x):
                p, o = carry
                u_batch, m_batch = x
                lq = (
                    jnp.take(log_q_all, m_batch)
                    if log_q_all is not None
                    else jnp.zeros(m_batch.shape, jnp.float32)
                )
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, u_batch, m_batch, lq
                )
                updates, o = tx.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (u_all, m_all)
            )
            return params, opt_state, losses.mean()

        key = jax.random.PRNGKey(cfg.seed)
        last_loss = None
        for _ in range(cfg.epochs):
            key, sub = jax.random.split(key)
            params, opt_state, last_loss = epoch(
                params, opt_state, users_d, movies_d, sub
            )
        if last_loss is not None:
            from sparrowrecsys_tpu.training.loop import hard_sync

            hard_sync(last_loss)  # block_until_ready is unreliable here
        return params

    def item_matrix(self, params, n_items: int) -> jnp.ndarray:
        """Encode item ids 0..n_items-1 -> [n, H] for the retrieval index."""
        return self._norm(
            self.model.apply(
                {"params": params}, jnp.arange(n_items, dtype=jnp.int32),
                method=self.model.item_tower,
            )
        )

    def user_vectors(self, params, user_ids) -> jnp.ndarray:
        return self._norm(
            self.model.apply(
                {"params": params}, jnp.asarray(np.asarray(user_ids, np.int32)),
                method=self.model.user_tower,
            )
        )
