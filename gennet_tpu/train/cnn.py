"""Fused CNN point-estimator train step.

Replaces the reference's CNN loop body (ref: bbhMahoGANy.py:1144-1233):
random bank batch, noise augmentation of the first ``noise_frac`` of the
batch with N(0, U(0,5)) (ref: :1160-1161), multi-output MSE on (mc, q) — all
inside one jitted step with on-device RNG and optional psum data parallelism.
"""

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from gennet_tpu.train import losses as L


@dataclass(frozen=True)
class CNNConfig:
    n_pix: int = 1024
    batch_size: int = 8                 # per-device (ref pe_batch_size, :87)
    lr: float = 9e-5                    # (ref: :98)
    beta1: float = 0.5
    noise_frac: float = 1.0 / 8.0       # noisy fraction (ref: :113)
    noise_scale_max: float = 5.0        # N(0, U(0,5)) augmentation (ref: :1161)
    max_normalize: bool = False         # burst workload normalizes by batch max
                                        # (ref: burstMahoGANy.py:738)
    max_per_sample: bool = False        # normalize each sample by ITS max
                                        # instead of the batch max — removes
                                        # the batch-outlier coupling of the
                                        # reference's global-max convention
                                        # (every sample's scale depends on the
                                        # largest waveform in the batch)
    ema_decay: float = 0.0              # EMA of CNN params for evaluation
                                        # (0 = off). The r2 flagship's
                                        # CNN-sanity bound oscillated
                                        # 0.02–0.94 across late cadences at
                                        # batch 8 — evaluating an averaged
                                        # late-state instead of the last
                                        # SGD iterate stabilizes the quality
                                        # ceiling the GAN's β is read against
    lr_decay_steps: int = 0             # >0: cosine-decay the LR over this
                                        # many steps to lr·lr_min_frac
                                        # (the reference trains 500k steps at
                                        # constant 9e-5, ref :98 — measured
                                        # to leave the late-time estimate
                                        # bouncing at the SGD noise floor)
    lr_min_frac: float = 0.1
    npar: int = 2


def _adam(cfg: CNNConfig):
    if cfg.lr_decay_steps > 0:
        sched = optax.cosine_decay_schedule(cfg.lr, cfg.lr_decay_steps,
                                            alpha=cfg.lr_min_frac)
        return optax.adam(sched, b1=cfg.beta1)
    return optax.adam(cfg.lr, b1=cfg.beta1)


def normalize_max(x: jnp.ndarray, cfg: CNNConfig) -> jnp.ndarray:
    """The burst workload's max normalization (ref: burstMahoGANy.py:738):
    batch-global by default, per-sample when ``cfg.max_per_sample``,
    identity when ``cfg.max_normalize`` is off (whitened units are already
    physical — batch-max coupling biases τ low on noisy inputs)."""
    if not cfg.max_normalize:
        return x
    if cfg.max_per_sample:
        return x / (jnp.max(x, axis=tuple(range(1, x.ndim)), keepdims=True) + 1e-12)
    return x / jnp.max(x)


class CNNState(struct.PyTreeNode):
    params: Any
    stats: Any
    opt: Any
    ema: Any       # EMA of params (mirrors params when ema_decay == 0)
    step: jnp.ndarray


def init_cnn(key: jax.Array, model, cfg: CNNConfig) -> CNNState:
    x = jnp.zeros((1, cfg.n_pix, 1), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, x, train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", FrozenDict())
    return CNNState(
        params=params,
        stats=stats,
        opt=_adam(cfg).init(params),
        ema=params,
        step=jnp.zeros((), jnp.int32),
    )


def draw_cnn_batch(key: jax.Array, bank: jnp.ndarray, targets: jnp.ndarray,
                   cfg: CNNConfig):
    """Consume one iteration's randomness: gather batch → augment → normalize.

    Returns (x, y, dropout_key); concatenating per-device triples along the
    batch axis yields the global batch of the equivalent single-device step."""
    B = cfg.batch_size
    k_idx, k_scale, k_noise, k_drop = jax.random.split(key, 4)

    idx = jax.random.randint(k_idx, (B,), 0, bank.shape[0])
    x = bank[idx]
    y = targets[idx]

    # noise augmentation: one scale per batch, applied to the first
    # noise_frac of samples (ref: :1160-1161)
    n_noisy = int(B * cfg.noise_frac)
    if n_noisy > 0:
        scale = jax.random.uniform(k_scale, (), minval=0.0, maxval=cfg.noise_scale_max)
        noise = scale * jax.random.normal(k_noise, (B, x.shape[1]), x.dtype)
        mask = (jnp.arange(B) < n_noisy).astype(x.dtype)[:, None]
        x = x + mask * noise

    if cfg.max_normalize:
        x = normalize_max(x, cfg)

    return x[..., None], y, k_drop


def cnn_update(state: CNNState, x: jnp.ndarray, y: jnp.ndarray, k_drop: jax.Array,
               *, model, cfg: CNNConfig, axis_name: str | None = None):
    """Deterministic half: MSE update on a materialized batch."""
    psum = (lambda t: jax.lax.pmean(t, axis_name)) if axis_name else (lambda t: t)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.stats} if state.stats else {"params": params}
        if state.stats:
            pred, mut = model.apply(variables, x, train=True, rngs={"dropout": k_drop},
                                    mutable=["batch_stats"])
            new_stats = mut.get("batch_stats", state.stats)
        else:
            pred = model.apply(variables, x, train=True, rngs={"dropout": k_drop})
            new_stats = state.stats
        return L.mse_multi_output(pred, y), new_stats

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    grads = psum(grads)
    # keep replicated batch-norm stats consistent across the mesh
    new_stats = psum(new_stats) if new_stats else new_stats
    upd, opt = _adam(cfg).update(grads, state.opt, state.params)
    params = optax.apply_updates(state.params, upd)

    if cfg.ema_decay > 0.0:
        d = cfg.ema_decay
        ema = jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p,
                                     state.ema, params)
    else:
        ema = params

    new_state = CNNState(params=params, stats=new_stats, opt=opt, ema=ema,
                         step=state.step + 1)
    return new_state, {"pe_loss": psum(loss)}


def cnn_step(state: CNNState, bank: jnp.ndarray, targets: jnp.ndarray, key: jax.Array,
             *, model, cfg: CNNConfig, axis_name: str | None = None):
    """One CNN PE iteration: gather batch → augment → MSE update.

    bank: (N, n_pix) whitened templates; targets: (N, npar) = [mc, q].
    """
    x, y, k_drop = draw_cnn_batch(key, bank, targets, cfg)
    return cnn_update(state, x, y, k_drop, model=model, cfg=cfg, axis_name=axis_name)


def make_cnn_step(model, cfg: CNNConfig, mesh=None):
    """Jitted CNN step; with a mesh, shard_map data-parallel over 'data'."""
    if mesh is None:
        return jax.jit(partial(cnn_step, model=model, cfg=cfg))

    from jax.sharding import PartitionSpec as P

    def sharded(state, bank, targets, key):
        dev = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, dev)
        return cnn_step(state, bank, targets, key, model=model, cfg=cfg, axis_name="data")

    step = jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(step)


def make_cnn_step_scan(model, cfg: CNNConfig, n_steps: int, mesh=None):
    """``n_steps`` CNN iterations fused into one dispatched program via
    lax.scan (relay-latency amortization — see make_gan_step_scan)."""

    def many(state, bank, targets, key):
        keys = jax.random.split(key, n_steps)

        def body(st, k):
            return cnn_step(st, bank, targets, k, model=model, cfg=cfg,
                            axis_name="data" if mesh is not None else None)

        return jax.lax.scan(body, state, keys)

    if mesh is None:
        return jax.jit(many)

    from jax.sharding import PartitionSpec as P

    def sharded(state, bank, targets, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return many(state, bank, targets, key)

    return jax.jit(jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    ))


_PREDICT_FN_CACHE: dict = {}


def _predict_fn(model, with_rng: bool, has_stats: bool):
    """Cached jitted inference apply (unjitted flax apply dispatches per-op —
    pathological over a remote device link)."""
    key_ = (model, with_rng, has_stats)
    if key_ not in _PREDICT_FN_CACHE:
        if with_rng:
            def f(params, stats, xb, rng):
                v = {"params": params, "batch_stats": stats} if has_stats else {"params": params}
                return model.apply(v, xb, train=False, rngs={"dropout": rng})
        else:
            def f(params, stats, xb):
                v = {"params": params, "batch_stats": stats} if has_stats else {"params": params}
                return model.apply(v, xb, train=False)

        _PREDICT_FN_CACHE[key_] = jax.jit(f)
    return _PREDICT_FN_CACHE[key_]


def predict(model, state: CNNState, x: jnp.ndarray, key: jax.Array | None = None,
            chunk: int = 512, use_ema: bool = False):
    """Chunked, jitted inference pass (dropout off except PermaDropout
    models, which require a key). Chunking bounds activation memory for large
    evaluation sets (the PE nets carry 1024-channel conv activations).

    ``use_ema`` evaluates the EMA-averaged parameters (see
    CNNConfig.ema_decay) — the stabilized quality-ceiling estimator."""
    fn = _predict_fn(model, key is not None, bool(state.stats))
    params = state.ema if use_ema else state.params
    x = x[..., None] if x.ndim == 2 else x
    n = x.shape[0]
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
    outs = []
    for i in range(0, x.shape[0], chunk):
        xb = x[i : i + chunk]
        outs.append(fn(params, state.stats, xb, key) if key is not None
                    else fn(params, state.stats, xb))
    return jnp.concatenate(outs, axis=0)[:n]
