"""Optimizer/scheduler semantics (torch parity, `script_utils.py:80-81,198-204`)."""
import numpy as np
import pytest

from unet3d_tpu.train.optim import (ReduceLROnPlateau, StepLR, CosineAnnealingLR,
                                    MultiStepLR, ExponentialLR, build_optimizer,
                                    build_scheduler)


def test_step_lr():
    s = StepLR(1.0, step_size=2, gamma=0.1)
    lrs = [s.step() for _ in range(5)]
    np.testing.assert_allclose(lrs, [1.0, 0.1, 0.1, 0.01, 0.01])


def test_multistep_lr():
    s = MultiStepLR(1.0, milestones=[2, 4], gamma=0.5)
    lrs = [s.step() for _ in range(5)]
    np.testing.assert_allclose(lrs, [1.0, 0.5, 0.5, 0.25, 0.25])


def test_exponential_lr():
    s = ExponentialLR(2.0, gamma=0.5)
    np.testing.assert_allclose([s.step(), s.step()], [1.0, 0.5])


def test_cosine_lr_endpoints():
    s = CosineAnnealingLR(1.0, T_max=10, eta_min=0.0)
    for _ in range(10):
        last = s.step()
    assert last == pytest.approx(0.0, abs=1e-9)


def test_plateau_reduces_after_patience():
    s = ReduceLROnPlateau(1.0, patience=2, factor=0.5)
    s.step(1.0)          # best=1.0
    assert s.lr == 1.0
    s.step(1.0)          # bad 1
    s.step(1.0)          # bad 2
    assert s.lr == 1.0
    s.step(1.0)          # bad 3 > patience -> reduce
    assert s.lr == 0.5


def test_plateau_improvement_resets():
    s = ReduceLROnPlateau(1.0, patience=1, factor=0.5)
    s.step(1.0)
    s.step(0.5)  # improvement
    s.step(0.6)  # bad 1
    assert s.lr == 1.0
    s.step(0.6)  # bad 2 -> reduce
    assert s.lr == 0.5


def test_plateau_min_lr():
    s = ReduceLROnPlateau(1e-3, patience=0, factor=0.1, min_lr=1e-4)
    s.step(1.0)
    s.step(2.0)
    s.step(2.0)
    s.step(2.0)
    assert s.lr >= 1e-4


def test_build_optimizer_names():
    for name in ("Adam", "AdamW", "SGD", "RMSprop"):
        tx = build_optimizer(name, lr=1e-3)
        assert tx is not None
    with pytest.raises(ValueError):
        build_optimizer("NoSuchOpt")
    with pytest.raises(TypeError):
        build_optimizer("Adam", lr=1e-3, bogus_kwarg=1)


def test_build_scheduler_error():
    with pytest.raises(ValueError):
        build_scheduler("NoSuchScheduler", 1.0)


def test_tpu_compiler_options_gated_off_on_cpu(monkeypatch):
    """The scoped-VMEM compiler option is TPU-only: CPU compiles reject TPU
    flags, so on the CPU backend (what this suite runs on) the helper must
    return None; "0" disables it everywhere."""
    from unet3d_tpu.train.step import tpu_compiler_options

    assert tpu_compiler_options() is None  # conftest forces the CPU backend
    monkeypatch.setenv("UNET3D_TPU_SCOPED_VMEM_KIB", "0")
    assert tpu_compiler_options() is None


def test_compile_cache_opt_in(monkeypatch, tmp_path):
    from unet3d_tpu.utils.compile_cache import maybe_enable_compile_cache

    monkeypatch.delenv("UNET3D_TPU_COMPILE_CACHE", raising=False)
    assert maybe_enable_compile_cache() is False
    cache = tmp_path / "jaxcache"
    monkeypatch.setenv("UNET3D_TPU_COMPILE_CACHE", str(cache))
    assert maybe_enable_compile_cache() is True
    assert cache.is_dir()
    import jax
    assert jax.config.jax_compilation_cache_dir == str(cache)
    # restore: don't leak the cache config into other tests
    jax.config.update("jax_compilation_cache_dir", None)


# ---- round-3 registry breadth: torch.optim trajectory parity ----------------

def _torch_vs_optax(name, torch_cls, steps=5, lr=1e-2, kwargs=None, tkwargs=None,
                    tol=1e-5):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    p0 = rng.randn(4, 3).astype(np.float32)
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(steps)]

    tp = torch.tensor(p0.copy(), requires_grad=True)
    topt = torch_cls([tp], lr=lr, **(tkwargs or {}))
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()

    import jax
    import jax.numpy as jnp
    params = {"w": jnp.asarray(p0)}
    tx = build_optimizer(name, lr=lr, **(kwargs or {}))
    state = tx.init(params)
    for g in grads:
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               atol=tol, rtol=tol)


def test_adagrad_matches_torch():
    import torch
    _torch_vs_optax("Adagrad", torch.optim.Adagrad)


def test_adadelta_matches_torch():
    import torch
    _torch_vs_optax("Adadelta", torch.optim.Adadelta)


def test_adamax_matches_torch_with_weight_decay():
    import torch
    _torch_vs_optax("Adamax", torch.optim.Adamax,
                    kwargs={"weight_decay": 0.01}, tkwargs={"weight_decay": 0.01})


def test_nadam_matches_torch_including_momentum_decay():
    import torch
    # the psi schedule is the part optax's nadam lacks; ours implements it
    _torch_vs_optax("NAdam", torch.optim.NAdam, steps=7, tol=1e-4)


def test_radam_matches_torch():
    import torch
    # first steps exercise the SGD-fallback region of RAdam's rectification
    _torch_vs_optax("RAdam", torch.optim.RAdam, steps=7)


def test_linear_lr_ramp():
    s = build_scheduler("LinearLR", 1.0, start_factor=0.5, total_iters=4)
    assert s.lr == pytest.approx(0.5)
    lrs = [s.step() for _ in range(5)]
    np.testing.assert_allclose(lrs, [0.625, 0.75, 0.875, 1.0, 1.0])


def test_constant_lr_releases_after_total_iters():
    s = build_scheduler("ConstantLR", 1.0, factor=0.25, total_iters=3)
    assert s.lr == pytest.approx(0.25)
    lrs = [s.step() for _ in range(4)]
    np.testing.assert_allclose(lrs, [0.25, 0.25, 1.0, 1.0])


def test_cosine_warm_restarts_matches_torch():
    torch = pytest.importorskip("torch")
    base = 1.0
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=3, T_mult=2, eta_min=0.1)
    ours = build_scheduler("CosineAnnealingWarmRestarts", base, T_0=3, T_mult=2,
                           eta_min=0.1)
    for _ in range(12):
        tsched.step()
        np.testing.assert_allclose(ours.step(), tsched.get_last_lr()[0],
                                   rtol=1e-6, err_msg=f"epoch {ours.last_epoch}")


# ---- session-3: trajectory parity for the four workhorse optimizers ---------


def test_adam_matches_torch_with_weight_decay():
    import torch
    # torch Adam weight_decay is L2-into-grad (NOT AdamW decoupled)
    _torch_vs_optax("Adam", torch.optim.Adam,
                    kwargs={"weight_decay": 0.01, "betas": (0.9, 0.995)},
                    tkwargs={"weight_decay": 0.01, "betas": (0.9, 0.995)})


def test_adamw_matches_torch():
    import torch
    _torch_vs_optax("AdamW", torch.optim.AdamW,
                    kwargs={"weight_decay": 0.05},
                    tkwargs={"weight_decay": 0.05})


def test_sgd_matches_torch_momentum_weight_decay_nesterov():
    import torch
    # pins torch's momentum conventions: wd folded into grad BEFORE the
    # momentum buffer, buffer = m*buf + grad (no dampening), nesterov lookahead
    _torch_vs_optax("SGD", torch.optim.SGD, steps=6,
                    kwargs={"momentum": 0.9, "weight_decay": 0.01,
                            "nesterov": True},
                    tkwargs={"momentum": 0.9, "weight_decay": 0.01,
                             "nesterov": True})


def test_rmsprop_matches_torch_with_momentum():
    import torch
    # pins eps OUTSIDE the sqrt (torch) vs optax's default eps placement
    _torch_vs_optax("RMSprop", torch.optim.RMSprop, steps=6,
                    kwargs={"momentum": 0.9, "alpha": 0.95},
                    tkwargs={"momentum": 0.9, "alpha": 0.95})
