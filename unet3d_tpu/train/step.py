"""Jitted train/eval steps over a TrainState pytree.

The TPU-native core of the reference's hot loop
(`unet3d/train/training_utils.py:40-112`): one fused XLA program per step doing
NCDHW->NDHWC transpose, bf16-compute forward (the TPU analog of AMP — no loss
scaler needed, `training_utils.py:65-68`), loss, backward, and optimizer update,
with the state donated so parameters update in place in HBM.
"""
from __future__ import annotations


import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


def tpu_compiler_options() -> Optional[dict]:
    """Default XLA compiler options for TPU step compiles.

    Raising the scoped-VMEM fusion budget from the 16 MiB default to 32 MiB
    lets XLA build larger elementwise/norm fusions around the convs and saves
    a measured 3.3 ms/step (129.8 -> 126.5) on the BraTS 128^3 DynUNet train
    step (tools/flag_sweep.py; 64/96 MiB measure the same but compile slower).
    Override with UNET3D_TPU_SCOPED_VMEM_KIB; "0" disables. CPU compiles
    reject TPU options, so the CPU backend always gets None.
    """
    kib = os.environ.get("UNET3D_TPU_SCOPED_VMEM_KIB", "32768")
    try:
        backend = jax.default_backend()
    except Exception:
        return None
    if backend == "cpu" or not kib or kib == "0":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}


class TrainState(struct.PyTreeNode):
    params: Any
    extra_variables: Any  # non-param collections (batch_stats, codebook, ...); {} if none
    opt_state: Any
    rng: jax.Array
    step: jax.Array


def create_train_state(variables, tx: optax.GradientTransformation, seed: int = 0) -> TrainState:
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    return TrainState(params=params, extra_variables=extra,
                      opt_state=tx.init(params), rng=jax.random.PRNGKey(seed),
                      step=jnp.zeros((), jnp.int32))


def set_state_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Write the epoch's LR into the inject_hyperparams optimizer state."""
    opt_state = state.opt_state
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hyperparams))


def amp_cast(variables, x: Optional[jnp.ndarray] = None):
    """bf16 AMP cast shared by every inference-style forward (eval, sharded
    eval, predict): bf16 copies of f32 leaves (+ bf16 input when given);
    master params stay f32 wherever the caller keeps them."""
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    if x is None:
        return variables
    return variables, x.astype(jnp.bfloat16)


def to_ndhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, D, H, W) host layout -> (B, D, H, W, C) device layout."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def from_ndhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 4, 1, 2, 3))


def compute_criterion(criterion: Callable, output, target: jnp.ndarray) -> jnp.ndarray:
    """Apply a loss, handling VAE tuple outputs, deep-supervision stacks, and
    scalar auxiliary losses.

    Models may return ``(output, *extras)``. Extras are consumed by a
    ``wants_extras`` criterion (mu/logvar for VAELoss); otherwise any SCALAR
    extra is treated as an auxiliary loss term the model computed internally
    (VQ-VAE commitment ``diff``, SegResNetVAE's reconstruction+KL) and added to
    the criterion value. Non-scalar extras without a wants_extras criterion are
    ignored.
    """
    extras = ()
    if isinstance(output, tuple):
        output, *extras = output
    if getattr(criterion, "wants_extras", False):
        if len(extras) >= 2:
            return criterion(output, target, mu=extras[0], logvar=extras[1])
        return criterion(output, target)
    if output.ndim == target.ndim + 1:
        # deep supervision: heads stacked along axis 1, nnU-Net 1/2^i weighting
        n = output.shape[1]
        weights = jnp.asarray([0.5 ** i for i in range(n)])
        weights = weights / jnp.sum(weights)
        losses = jnp.stack([criterion(output[:, i], target) for i in range(n)])
        loss = jnp.sum(weights * losses)
    else:
        loss = criterion(output, target)
    for e in extras:
        if hasattr(e, "ndim") and e.ndim == 0:
            loss = loss + e.astype(loss.dtype)
    return loss


def train_step_body(model, criterion: Callable, tx: optax.GradientTransformation,
                    amp: bool = False, grad_accum: int = 1) -> Callable:
    """Un-jitted train-step body, shared by the single-device path (jitted below)
    and the mesh-sharded path (`parallel/mesh.py`).

    ``grad_accum`` > 1 (framework extension; config key
    ``training.gradient_accumulation_steps``) scans the batch in
    ``grad_accum`` equal microbatches, accumulating gradients in f32 and
    applying ONE optimizer update — activation memory scales with the
    microbatch, so effective batches that OOM a 16 GB chip train anyway.
    Per-microbatch losses/gradients are means over equally-sized slices, so
    the averaged result matches the full-batch step up to reduction order
    ONLY for mean-reduced, per-sample-decomposable criteria: batch=True
    Dice-family losses (joint intersection/union over the batch axis) and
    reduction="sum" change the objective under accumulation — the train CLI
    rejects/warns on those combinations (scripts/train.py).
    """

    def train_step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray):
        rng, dropout_rng, sample_rng = jax.random.split(state.rng, 3)
        x = to_ndhwc(images)
        y = to_ndhwc(labels) if labels.ndim == 5 else labels
        if y.dtype in (jnp.uint8, jnp.bfloat16):  # compact-transfer labels
            y = y.astype(jnp.float32)
        x = x.astype(jnp.bfloat16 if amp else jnp.float32)

        def loss_fn(params, extra_variables, xb, yb, d_rng, s_rng):
            p = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
                params) if amp else params
            variables = {"params": p, **extra_variables}
            mutable = list(extra_variables.keys())
            # `train` passed positionally: nn.remat-wrapped models declare it
            # static via static_argnums, which only covers positional args
            out = model.apply(variables, xb, True,
                              rngs={"dropout": d_rng, "sample": s_rng},
                              mutable=mutable)
            # apply() with a list `mutable` ALWAYS returns (out, updates) —
            # even an empty list — so unpack unconditionally
            out, updates = out
            new_stats = {**extra_variables, **dict(updates)}
            # losses handle mixed precision themselves (losses.py module note):
            # casting the full output volume to f32 here costs ~2.2 ms/step
            import os
            if os.environ.get("UNET3D_TPU_LOSS_F32") == "1":
                out = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float32), out)
            loss = compute_criterion(criterion, out, yb)
            return loss, new_stats

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum > 1:
            n = x.shape[0]
            if n % grad_accum:
                raise ValueError(f"batch size {n} is not divisible by "
                                 f"gradient_accumulation_steps={grad_accum}")
            xs = x.reshape(grad_accum, n // grad_accum, *x.shape[1:])
            ys = y.reshape(grad_accum, n // grad_accum, *y.shape[1:])
            d_keys = jax.random.split(dropout_rng, grad_accum)
            s_keys = jax.random.split(sample_rng, grad_accum)

            def micro(carry, inp):
                extra, gacc, lacc = carry
                xb, yb, dk, sk = inp
                (loss, new_extra), g = grad_fn(state.params, extra, xb, yb,
                                               dk, sk)
                gacc = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(jnp.float32), gacc, g)
                return (new_extra, gacc, lacc + loss.astype(jnp.float32)), None

            gacc0 = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (new_stats, gsum, lsum), _ = jax.lax.scan(
                micro, (state.extra_variables, gacc0, jnp.float32(0.0)),
                (xs, ys, d_keys, s_keys))
            grads = jax.tree_util.tree_map(
                lambda g, p: (g / grad_accum).astype(p.dtype), gsum,
                state.params)
            loss = lsum / grad_accum
        else:
            (loss, new_stats), grads = grad_fn(state.params,
                                               state.extra_variables, x, y,
                                               dropout_rng, sample_rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=new_params, extra_variables=new_stats,
                                  opt_state=new_opt_state, rng=rng,
                                  step=state.step + 1)
        return new_state, loss

    return train_step


def make_train_step(model, criterion: Callable, tx: optax.GradientTransformation,
                    amp: bool = False, grad_accum: int = 1) -> Callable:
    """Build the jitted train step. ``amp`` runs the forward/backward in bfloat16
    with fp32 master params (reference AMP flag, `train/train.py:33-37`)."""
    return jax.jit(train_step_body(model, criterion, tx, amp=amp,
                                   grad_accum=grad_accum),
                   donate_argnums=(0,), compiler_options=tpu_compiler_options())


def make_eval_step(model, criterion: Callable, inferer: Optional[Callable] = None,
                   amp: bool = False) -> Callable:
    """Validation step (no grad): optionally route the forward through an inferer
    (e.g. sliding window), parity with `training_utils.py:101-112`. ``amp``
    runs the forward in bfloat16 like the reference's autocast validation
    (`training_utils.py:93-98`); losses upcast as needed (losses.py)."""

    def forward(state: TrainState, x: jnp.ndarray):
        variables = {"params": state.params, **state.extra_variables}
        if amp:
            variables, x = amp_cast(variables, x)
        else:
            x = x.astype(jnp.float32)
        return model.apply(variables, x, False)  # positional: see train_step_body

    def _prep(images, labels):
        x = to_ndhwc(images)
        y = to_ndhwc(labels) if labels.ndim == 5 else labels
        if y.dtype in (jnp.uint8, jnp.bfloat16):  # compact-transfer labels
            y = y.astype(jnp.float32)
        return x, y

    def eval_step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray):
        x, y = _prep(images, labels)
        out = forward(state, x)
        return compute_criterion(criterion, out, y)

    if inferer is not None:
        def eval_step_inferer(state, images, labels):
            x, y = _prep(images, labels)
            out = inferer(x, lambda z: forward(state, z))
            return compute_criterion(criterion, out, y)
        return jax.jit(eval_step_inferer,
                       compiler_options=tpu_compiler_options())
    return jax.jit(eval_step, compiler_options=tpu_compiler_options())
