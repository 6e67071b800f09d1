"""Optimizers (optax, torch-named) and LR schedulers (host-side, torch-named).

Parity: the reference resolves optimizers from ``torch.optim``
(`unet3d/scripts/script_utils.py:80-81`) and schedulers from
``torch.optim.lr_scheduler`` (`script_utils.py:198-204`); the training driver
fast-forwards them on resume by replaying epochs (`unet3d/train/train.py:23-31`).

The optimizer is built with ``optax.inject_hyperparams`` so the learning rate is
part of the optimizer state; schedulers are small host-side state machines that
produce the epoch's LR, which the trainer writes into the state. This keeps
torch scheduler semantics (including ReduceLROnPlateau's patience/cooldown)
without forcing an optax schedule-by-step mapping.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import optax


class _NadamState(NamedTuple):
    count: "jax.Array"
    mu_product: "jax.Array"
    m: "optax.Updates"
    v: "optax.Updates"


def _torch_nadam(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                 momentum_decay=4e-3) -> optax.GradientTransformation:
    """torch.optim.NAdam exactly, including the psi momentum-decay schedule
    (mu_t = b1*(1 - 0.5*0.96^(t*psi))) that optax's Dozat-form nadam omits —
    verified step-for-step against torch (tests/test_optim.py)."""
    import jax
    import jax.numpy as jnp

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _NadamState(count=jnp.zeros([], jnp.int32),
                           mu_product=jnp.ones([], jnp.float32),
                           m=zeros, v=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        t = state.count + 1
        tf = t.astype(jnp.float32)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (tf * momentum_decay))
        mu_t1 = b1 * (1.0 - 0.5 * 0.96 ** ((tf + 1.0) * momentum_decay))
        mu_prod = state.mu_product * mu_t
        m = jax.tree_util.tree_map(lambda mm, g: b1 * mm + (1 - b1) * g,
                                   state.m, updates)
        v = jax.tree_util.tree_map(lambda vv, g: b2 * vv + (1 - b2) * g * g,
                                   state.v, updates)
        bias2 = 1.0 - b2 ** tf

        def leaf(mm, vv, g):
            m_hat = (mu_t1 * mm / (1.0 - mu_prod * mu_t1)
                     + (1.0 - mu_t) * g / (1.0 - mu_prod))
            return -learning_rate * m_hat / (jnp.sqrt(vv / bias2) + eps)

        out = jax.tree_util.tree_map(leaf, m, v, updates)
        return out, _NadamState(count=t, mu_product=mu_prod, m=m, v=v)

    return optax.GradientTransformation(init, update)


def build_optimizer(optimizer_name: str, lr: float = 1e-3, **kwargs) -> optax.GradientTransformation:
    """torch.optim names -> optax, with torch default hyperparameters."""
    name = optimizer_name.lower()
    if name == "adam":
        betas = kwargs.pop("betas", (0.9, 0.999))
        eps = kwargs.pop("eps", 1e-8)
        weight_decay = kwargs.pop("weight_decay", 0.0)
        if weight_decay:
            tx = lambda learning_rate: optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps))
        else:
            tx = lambda learning_rate: optax.adam(learning_rate, b1=betas[0],
                                                  b2=betas[1], eps=eps)
    elif name == "adamw":
        betas = kwargs.pop("betas", (0.9, 0.999))
        eps = kwargs.pop("eps", 1e-8)
        weight_decay = kwargs.pop("weight_decay", 1e-2)
        tx = lambda learning_rate: optax.adamw(learning_rate, b1=betas[0],
                                               b2=betas[1], eps=eps,
                                               weight_decay=weight_decay)
    elif name == "sgd":
        momentum = kwargs.pop("momentum", 0.0)
        nesterov = kwargs.pop("nesterov", False)
        weight_decay = kwargs.pop("weight_decay", 0.0)

        def tx(learning_rate):
            parts = []
            if weight_decay:
                parts.append(optax.add_decayed_weights(weight_decay))
            parts.append(optax.sgd(learning_rate, momentum=momentum or None,
                                   nesterov=nesterov))
            return optax.chain(*parts)
    elif name == "rmsprop":
        alpha = kwargs.pop("alpha", 0.99)
        eps = kwargs.pop("eps", 1e-8)
        momentum = kwargs.pop("momentum", 0.0)
        tx = lambda learning_rate: optax.rmsprop(learning_rate, decay=alpha, eps=eps,
                                                 momentum=momentum or None)
    elif name == "adagrad":
        # torch.optim.Adagrad defaults: initial_accumulator_value=0, eps=1e-10
        eps = kwargs.pop("eps", 1e-10)
        init_acc = kwargs.pop("initial_accumulator_value", 0.0)
        if kwargs.pop("lr_decay", 0.0):
            raise TypeError("Adagrad lr_decay is not supported on this backend")
        tx = lambda learning_rate: optax.adagrad(
            learning_rate, initial_accumulator_value=init_acc, eps=eps)
    elif name == "adadelta":
        rho = kwargs.pop("rho", 0.9)
        eps = kwargs.pop("eps", 1e-6)
        weight_decay = kwargs.pop("weight_decay", 0.0)
        tx = lambda learning_rate: optax.adadelta(learning_rate, rho=rho, eps=eps,
                                                  weight_decay=weight_decay)
    elif name == "adamax":
        betas = kwargs.pop("betas", (0.9, 0.999))
        eps = kwargs.pop("eps", 1e-8)
        weight_decay = kwargs.pop("weight_decay", 0.0)

        def tx(learning_rate):
            parts = []
            if weight_decay:
                parts.append(optax.add_decayed_weights(weight_decay))
            parts.append(optax.adamax(learning_rate, b1=betas[0], b2=betas[1], eps=eps))
            return optax.chain(*parts)
    elif name == "nadam":
        betas = kwargs.pop("betas", (0.9, 0.999))
        eps = kwargs.pop("eps", 1e-8)
        weight_decay = kwargs.pop("weight_decay", 0.0)
        momentum_decay = kwargs.pop("momentum_decay", 4e-3)

        def tx(learning_rate):
            parts = []
            if weight_decay:
                parts.append(optax.add_decayed_weights(weight_decay))
            parts.append(_torch_nadam(learning_rate, b1=betas[0], b2=betas[1],
                                      eps=eps, momentum_decay=momentum_decay))
            return optax.chain(*parts)
    elif name == "radam":
        betas = kwargs.pop("betas", (0.9, 0.999))
        eps = kwargs.pop("eps", 1e-8)
        weight_decay = kwargs.pop("weight_decay", 0.0)

        def tx(learning_rate):
            parts = []
            if weight_decay:
                parts.append(optax.add_decayed_weights(weight_decay))
            parts.append(optax.radam(learning_rate, b1=betas[0], b2=betas[1], eps=eps))
            return optax.chain(*parts)
    else:
        raise ValueError(f"Optimizer {optimizer_name} is not supported")
    if kwargs:
        raise TypeError(f"Unsupported kwargs for {optimizer_name}: {sorted(kwargs)}")
    return optax.inject_hyperparams(tx)(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    """Return a copy of an inject_hyperparams state with a new LR.

    Copy-on-write: mutating ``hyperparams`` in place would alias every
    TrainState sharing this opt_state (the trainer's
    `train.step.set_state_learning_rate` follows the same pattern)."""
    import jax.numpy as jnp

    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hyperparams)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class Scheduler:
    """Base: call ``step(metric)`` once per epoch AFTER the epoch (torch order);
    read ``.lr`` for the LR to use next epoch."""

    def __init__(self, base_lr: float):
        self.base_lr = base_lr
        self.lr = base_lr
        self.last_epoch = 0

    def step(self, metric: Optional[float] = None):
        self.last_epoch += 1
        self.lr = self._compute_lr()
        return self.lr

    def _compute_lr(self) -> float:
        return self.lr


class StepLR(Scheduler):
    def __init__(self, base_lr: float, step_size: int, gamma: float = 0.1):
        super().__init__(base_lr)
        self.step_size = step_size
        self.gamma = gamma

    def _compute_lr(self):
        return self.base_lr * (self.gamma ** (self.last_epoch // self.step_size))


class MultiStepLR(Scheduler):
    def __init__(self, base_lr: float, milestones, gamma: float = 0.1):
        super().__init__(base_lr)
        self.milestones = sorted(milestones)
        self.gamma = gamma

    def _compute_lr(self):
        n = sum(1 for m in self.milestones if m <= self.last_epoch)
        return self.base_lr * (self.gamma ** n)


class ExponentialLR(Scheduler):
    def __init__(self, base_lr: float, gamma: float):
        super().__init__(base_lr)
        self.gamma = gamma

    def _compute_lr(self):
        return self.base_lr * (self.gamma ** self.last_epoch)


class CosineAnnealingLR(Scheduler):
    def __init__(self, base_lr: float, T_max: int, eta_min: float = 0.0):
        super().__init__(base_lr)
        self.T_max = T_max
        self.eta_min = eta_min

    def _compute_lr(self):
        return (self.eta_min + (self.base_lr - self.eta_min)
                * (1 + math.cos(math.pi * self.last_epoch / self.T_max)) / 2)


class PolynomialLR(Scheduler):
    def __init__(self, base_lr: float, total_iters: int = 5, power: float = 1.0):
        super().__init__(base_lr)
        self.total_iters = total_iters
        self.power = power

    def _compute_lr(self):
        t = min(self.last_epoch, self.total_iters)
        return self.base_lr * (1 - t / self.total_iters) ** self.power


class ReduceLROnPlateau(Scheduler):
    """torch semantics: reduce LR by ``factor`` after ``patience`` epochs without
    improvement (rel threshold 1e-4), with cooldown and min_lr."""

    needs_metric = True

    def __init__(self, base_lr: float, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0, min_lr: float = 0.0,
                 eps: float = 1e-8):
        super().__init__(base_lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.eps = eps
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, metric):
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return metric < self.best * (1.0 - self.threshold)
            return metric < self.best - self.threshold
        if self.threshold_mode == "rel":
            return metric > self.best * (1.0 + self.threshold)
        return metric > self.best + self.threshold

    def step(self, metric: Optional[float] = None):
        self.last_epoch += 1
        if metric is None:
            return self.lr
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.lr - new_lr > self.eps:
                self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr


class LinearLR(Scheduler):
    """torch LinearLR: factor ramps start_factor -> end_factor over total_iters."""

    def __init__(self, base_lr: float, start_factor: float = 1.0 / 3,
                 end_factor: float = 1.0, total_iters: int = 5):
        super().__init__(base_lr)
        self.start_factor = start_factor
        self.end_factor = end_factor
        self.total_iters = total_iters
        self.lr = base_lr * start_factor

    def _compute_lr(self):
        t = min(self.last_epoch, self.total_iters)
        factor = (self.start_factor
                  + (self.end_factor - self.start_factor) * t / self.total_iters)
        return self.base_lr * factor


class ConstantLR(Scheduler):
    """torch ConstantLR: lr * factor until total_iters, then base lr."""

    def __init__(self, base_lr: float, factor: float = 1.0 / 3,
                 total_iters: int = 5):
        super().__init__(base_lr)
        self.factor = factor
        self.total_iters = total_iters
        self.lr = base_lr * factor

    def _compute_lr(self):
        return self.base_lr * (self.factor if self.last_epoch < self.total_iters
                               else 1.0)


class CosineAnnealingWarmRestarts(Scheduler):
    """torch semantics with whole-epoch steps: restart every T_i epochs where
    T_{i+1} = T_i * T_mult."""

    def __init__(self, base_lr: float, T_0: int, T_mult: int = 1,
                 eta_min: float = 0.0):
        super().__init__(base_lr)
        if T_0 <= 0 or T_mult < 1:
            raise ValueError("CosineAnnealingWarmRestarts requires T_0 > 0, T_mult >= 1")
        self.T_0 = T_0
        self.T_mult = T_mult
        self.eta_min = eta_min

    def _compute_lr(self):
        e = self.last_epoch
        if self.T_mult == 1:
            t_cur = e % self.T_0
            t_i = self.T_0
        else:
            n = int(math.log(e / self.T_0 * (self.T_mult - 1) + 1, self.T_mult))
            t_cur = e - self.T_0 * (self.T_mult ** n - 1) // (self.T_mult - 1)
            t_i = self.T_0 * self.T_mult ** n
        return (self.eta_min + (self.base_lr - self.eta_min)
                * (1 + math.cos(math.pi * t_cur / t_i)) / 2)


SCHEDULER_REGISTRY = {
    "StepLR": StepLR,
    "MultiStepLR": MultiStepLR,
    "ExponentialLR": ExponentialLR,
    "CosineAnnealingLR": CosineAnnealingLR,
    "PolynomialLR": PolynomialLR,
    "ReduceLROnPlateau": ReduceLROnPlateau,
    "LinearLR": LinearLR,
    "ConstantLR": ConstantLR,
    "CosineAnnealingWarmRestarts": CosineAnnealingWarmRestarts,
}


def build_scheduler(scheduler_name: str, base_lr: float, **kwargs) -> Scheduler:
    if scheduler_name not in SCHEDULER_REGISTRY:
        raise ValueError(f"Scheduler {scheduler_name} is not supported")
    return SCHEDULER_REGISTRY[scheduler_name](base_lr, **kwargs)
