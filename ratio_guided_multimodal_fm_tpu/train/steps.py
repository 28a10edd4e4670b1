"""Jitted train steps (donated state, optax).

Parity targets:
* FM step = ref flow_utils.py:103-156 loop body (t~U, interpolate, MSE, Adam).
* Ratio step = ref trainer.py:26-56 (masked real/fake loss, Adam with
  clip-by-global-norm 1.0).
* Classifier step = ref train_classifiers_mnist_svhn.py:63-113 (CE + Adam).

TPU-first: each step is ONE jitted function with the state donated, so
optimizer updates happen in-place in HBM; batch comes in sharded over the
'data' mesh axis and XLA inserts the gradient all-reduce automatically when
params are replicated.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ratio_guided_multimodal_fm_tpu.core.guards import check_finite
from ratio_guided_multimodal_fm_tpu.flow.cfm import interpolate
from ratio_guided_multimodal_fm_tpu.flow.losses import get_ratio_loss


class FMTrainState(train_state.TrainState):
    # Optional EMA of params (Polyak averaging — standard for
    # diffusion/flow sample quality; the reference has no equivalent).
    # None = EMA disabled (the default, reference parity).
    ema_params: Any = None


class RatioTrainState(train_state.TrainState):
    batch_stats: Any = None
    # Optional EMA of params — same rationale as FMTrainState.ema_params.
    # For the ratio net specifically, the Polyak average is a saturation
    # hedge: the discriminator trained to the reference's 30-epoch budget
    # saturates (ROUND2.md §1) and its class-level r̂ bias drives both
    # guidance families' diversity collapse; the averaged weights lag the
    # saturation. None = disabled (reference parity).
    ema_params: Any = None


def _fm_substep(model, ema_decay: float | None):
    """Unjitted FM step body (state, x1, key) -> (state, loss): shared by
    the single-step builder and the fused multi-step scan."""

    def substep(state: FMTrainState, x1: jax.Array, key: jax.Array):
        kt, kn, kd = jax.random.split(key, 3)

        def loss_fn(params):
            t = jax.random.uniform(kt, (x1.shape[0],), jnp.float32)
            x_t, u = interpolate(kn, x1, t)
            v = model.apply({"params": params}, x_t, t,
                            deterministic=False, rngs={"dropout": kd})
            return jnp.mean((v.astype(jnp.float32) - u.astype(jnp.float32)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        check_finite(loss, "fm train loss")
        state = state.apply_gradients(grads=grads)
        if ema_decay is not None:
            d = jnp.float32(ema_decay)
            state = state.replace(ema_params=jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p,
                state.ema_params, state.params))
        return state, loss

    return substep


def make_fm_train_step(model, *, donate: bool = True,
                       ema_decay: float | None = None) -> Callable:
    """Build step(state, x1, key) -> (state, loss) for a velocity model.

    With `ema_decay` set (and state.ema_params initialized —
    create_fm_state(ema_decay=...)), the step also updates the Polyak
    average ema = d·ema + (1-d)·params after the optimizer step — one
    fused multiply-add per leaf inside the same jitted program.
    """
    step = _fm_substep(model, ema_decay)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_fm_train_multistep(model, *, donate: bool = True,
                            ema_decay: float | None = None) -> Callable:
    """Build a FUSED K-step trainer:
    step(state, dataset, idx[K,B], key) -> (state, mean_loss).

    TPU-first dispatch amortization (round-5 train-MFU item): at reference
    batch sizes a single FM optimizer step is 5–20 ms of compute, so on a
    tunneled backend per-step dispatch latency caps train MFU (~34%
    measured, bench_details.json r4). This runs K optimizer steps as ONE
    XLA program via `lax.scan`, with the device-resident dataset passed as
    a jit ARGUMENT (constant-embedding would 413 the remote compiler —
    CLAUDE.md) and each sub-batch gathered on-device from int32 indices:
    per dispatch, host↔device traffic is one [K,B] int32 array and one
    scalar loss.

    Key discipline: sub-step j uses fold_in(key, j) — deterministic in
    (key, j), so preemption resume at macro-step granularity reproduces
    the uninterrupted stream (the driver's key for a macro step is already
    fold_in(epoch_key, macro_i)). The randomness stream differs from a
    K=1 run of the same seed (documented in the --fused_steps help); the
    estimator is identical.

    Returns the MEAN loss over the K sub-steps so the epoch driver's
    averaging stays correct (each macro step contributes one scalar).
    """
    substep = _fm_substep(model, ema_decay)

    def step(state: FMTrainState, dataset: jax.Array, idx: jax.Array,
             key: jax.Array):
        def body(st, xs):
            idx_j, j = xs
            x1 = jnp.take(dataset, idx_j, axis=0)
            st, loss = substep(st, x1, jax.random.fold_in(key, j))
            return st, loss

        state, losses = jax.lax.scan(
            body, state, (idx, jnp.arange(idx.shape[0], dtype=jnp.uint32)))
        return state, jnp.mean(losses)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _ratio_substep(model, loss_type: str, has_batch_stats: bool,
                   ema_decay: float | None, **loss_kwargs):
    """Unjitted ratio step body (state, x, y, is_real, key) ->
    (state, metrics): shared by the single-step builder and the fused
    multi-step scan."""
    loss_fn_inner = get_ratio_loss(loss_type, **loss_kwargs)

    def step(state: RatioTrainState, x, y, is_real, key):
        def loss_fn(params):
            variables = {"params": params}
            kwargs = dict(deterministic=False)
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                scores, mutated = model.apply(
                    variables, x, y, train=True, mutable=["batch_stats"],
                    rngs={"dropout": key}, **kwargs)
                new_stats = mutated["batch_stats"]
            else:
                scores = model.apply(variables, x, y, rngs={"dropout": key},
                                     **kwargs)
                new_stats = None
            loss, metrics = loss_fn_inner(scores, is_real)
            return loss, (metrics, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        check_finite(loss, "ratio train loss")
        state = state.apply_gradients(grads=grads)
        if has_batch_stats:
            state = state.replace(batch_stats=new_stats)
        if ema_decay is not None:
            d = jnp.float32(ema_decay)
            state = state.replace(ema_params=jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p,
                state.ema_params, state.params))
        return state, metrics

    return step


def make_ratio_train_step(
    model,
    loss_type: str = "disc",
    has_batch_stats: bool = False,
    donate: bool = True,
    ema_decay: float | None = None,
    **loss_kwargs,
) -> Callable:
    """Build step(state, x, y, is_real, key) -> (state, metrics).

    `ema_decay` (with create_ratio_state(ema_decay=...)) maintains the
    Polyak average of the ratio params inside the jitted step, mirroring
    the FM step's EMA.
    """
    step = _ratio_substep(model, loss_type, has_batch_stats, ema_decay,
                          **loss_kwargs)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_ratio_train_multistep(
    model,
    loss_type: str = "disc",
    has_batch_stats: bool = False,
    donate: bool = True,
    ema_decay: float | None = None,
    **loss_kwargs,
) -> Callable:
    """FUSED K-step ratio trainer:
    step(state, x_all, y_all, xidx[K,B], yidx[K,B], is_real[K,B], key)
    -> (state, metrics) — the ratio twin of `make_fm_train_multistep`
    (same dispatch-amortization rationale and key discipline; see that
    docstring). The host still computes the label pairings (cheap numpy,
    data/mnist_dataset.py:get_ratio_index_loader); only the int32 index
    arrays + the f32 real/fake mask move per dispatch. Returns per-key
    MEAN metrics over the K sub-steps ([K]-mean of each metric scalar),
    so the epoch driver's averaging stays correct. BatchNorm stats and
    the EMA thread through the scan carry like any other state field."""
    substep = _ratio_substep(model, loss_type, has_batch_stats, ema_decay,
                             **loss_kwargs)

    def step(state: RatioTrainState, x_all, y_all, xidx, yidx, is_real,
             key):
        def body(st, xs):
            xi, yi, ir, j = xs
            x = jnp.take(x_all, xi, axis=0)
            y = jnp.take(y_all, yi, axis=0)
            st, metrics = substep(st, x, y, ir, jax.random.fold_in(key, j))
            return st, metrics

        ks = jnp.arange(xidx.shape[0], dtype=jnp.uint32)
        state, metrics = jax.lax.scan(body, state, (xidx, yidx, is_real, ks))
        return state, jax.tree_util.tree_map(jnp.mean, metrics)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_ratio_eval_step(model, loss_type: str = "disc",
                         has_batch_stats: bool = False, **loss_kwargs):
    """Eval twin of the ratio step (ref trainer.py:83-119): no grad/update."""
    loss_fn_inner = get_ratio_loss(loss_type, **loss_kwargs)

    def step(state: RatioTrainState, x, y, is_real):
        variables = {"params": state.params}
        if has_batch_stats:
            variables["batch_stats"] = state.batch_stats
            scores = model.apply(variables, x, y, train=False,
                                 deterministic=True)
        else:
            scores = model.apply(variables, x, y, deterministic=True)
        _, metrics = loss_fn_inner(scores, is_real)
        return metrics

    return jax.jit(step)


def make_classifier_train_step(model, has_batch_stats: bool = False,
                               donate: bool = True) -> Callable:
    """Build step(state, images, labels, key) -> (state, (loss, acc))."""

    def step(state, images, labels, key):
        def loss_fn(params):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                logits, mutated = model.apply(
                    variables, images, train=True, deterministic=False,
                    mutable=["batch_stats"], rngs={"dropout": key})
                new_stats = mutated["batch_stats"]
            else:
                logits = model.apply(variables, images, deterministic=False,
                                     rngs={"dropout": key})
                new_stats = None
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, (acc, new_stats)

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        if has_batch_stats and new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        return state, (loss, acc)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def create_fm_state(model, key, sample_shape, lr: float = 1e-4,
                    ema_decay: float | None = None) -> FMTrainState:
    """Init params + Adam (ref lr default 1e-4, train_flow.py:36-37).
    `ema_decay` non-None seeds ema_params = params (updated by the step
    built with the same ema_decay)."""
    x = jnp.zeros((1,) + tuple(sample_shape), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    variables = model.init(key, x, t)
    # ema starts as a COPY: aliasing the params buffers would make the
    # donated train step pass the same buffer twice (donation error —
    # caught by the CPU CLI drive).
    ema = (jax.tree_util.tree_map(jnp.copy, variables["params"])
           if ema_decay is not None else None)
    return FMTrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=optax.adam(lr),
        ema_params=ema)


def create_ratio_state(model, key, x_shape, y_shape, lr: float = 1e-4,
                       clip_norm: float = 1.0,
                       has_batch_stats: bool = False,
                       ema_decay: float | None = None) -> RatioTrainState:
    """Init params + clip(1.0)+Adam (ref trainer.py:53 grad clip).
    `ema_decay` non-None seeds ema_params = copy(params) (updated by the
    step built with the same ema_decay; a COPY for donation safety, same
    as create_fm_state)."""
    x = jnp.zeros((1,) + tuple(x_shape), jnp.float32)
    y = jnp.zeros((1,) + tuple(y_shape), jnp.float32)
    variables = model.init(key, x, y)
    tx = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr))
    ema = (jax.tree_util.tree_map(jnp.copy, variables["params"])
           if ema_decay is not None else None)
    return RatioTrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats"), ema_params=ema)


def create_classifier_state(model, key, sample_shape, lr: float = 1e-3):
    """Classifier lr default 1e-3 (ref train_classifier.py:77)."""
    x = jnp.zeros((1,) + tuple(sample_shape), jnp.float32)
    variables = model.init(key, x)
    return RatioTrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=optax.adam(lr),
        batch_stats=variables.get("batch_stats"))
