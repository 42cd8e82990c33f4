"""Fused AdamW+EMA update (ops/pallas/fused_optim.py).

Parity vs the unfused optax.adamw → apply_updates → ema_update chain the
trainer runs by default — over multiple steps, mixed leaf shape classes
(Pallas-eligible 1024-multiples and ragged jnp-path leaves), with the
kernel path exercised in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sgdm_tpu.models.ema import ema_update
from sgdm_tpu.ops.pallas.fused_optim import make_fused_adamw_ema

HP = dict(b1=0.9, b2=0.98, eps=1e-8, weight_decay=0.03)
LR = lambda t: 1e-2 * (1.0 + 0.1 * jnp.asarray(t, jnp.float32))
EMA_DECAY = 0.9


def _params(rng):
    return {
        "conv": {"kernel": jnp.asarray(
            rng.standard_normal((3, 3, 128, 8)), jnp.float32)},  # 9216 % 1024 == 0
        "dense": {"kernel": jnp.asarray(
            rng.standard_normal((256, 128)), jnp.float32),       # 32768
                  "bias": jnp.asarray(rng.standard_normal(17), jnp.float32)},
        "scale": jnp.asarray(rng.standard_normal((5, 7)), jnp.float32),
    }


def _run_unfused(params, grads_seq, steps):
    tx = optax.adamw(LR, b1=HP["b1"], b2=HP["b2"], eps=HP["eps"],
                     weight_decay=HP["weight_decay"])
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.copy, params)
    for i in range(steps):
        updates, opt_state = tx.update(grads_seq[i], opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, jnp.asarray(i + 1), EMA_DECAY)
    return params, opt_state, ema


def _run_fused(params, grads_seq, steps, **kw):
    tx = optax.adamw(LR, b1=HP["b1"], b2=HP["b2"], eps=HP["eps"],
                     weight_decay=HP["weight_decay"])
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.copy, params)
    upd = make_fused_adamw_ema(LR, b1=HP["b1"], b2=HP["b2"], eps=HP["eps"],
                               weight_decay=HP["weight_decay"],
                               ema_decay=EMA_DECAY, **kw)
    n = jnp.zeros((), jnp.int32)
    for i in range(steps):
        params, opt_state, ema = upd(grads_seq[i], opt_state, params, ema, n)
        n = n + 1
    return params, opt_state, ema


def _assert_trees_close(a, b, rtol=2e-6, atol=1e-7):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=rtol, atol=atol), a, b)


@pytest.mark.parametrize("mode", ["jnp", "pallas_interpret"])
def test_multi_step_parity(mode):
    rng = np.random.default_rng(0)
    params = _params(rng)
    grads_seq = [jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape), jnp.float32) * 0.1,
        params) for _ in range(4)]
    want_p, want_s, want_e = _run_unfused(params, grads_seq, 4)
    kw = (dict(use_pallas=False) if mode == "jnp"
          else dict(use_pallas=True, interpret=True))
    # drop the size gate so the tiny test leaves hit the kernel
    if mode == "pallas_interpret":
        import sgdm_tpu.ops.pallas.fused_optim as fo
        old = fo._MIN_PALLAS
        fo._MIN_PALLAS = 1024
        try:
            got_p, got_s, got_e = _run_fused(params, grads_seq, 4, **kw)
        finally:
            fo._MIN_PALLAS = old
    else:
        got_p, got_s, got_e = _run_fused(params, grads_seq, 4, **kw)

    _assert_trees_close(got_p, want_p)
    _assert_trees_close(got_e, want_e)
    # opt_state structural + numerical parity (checkpoint interop)
    assert int(got_s[0].count) == int(want_s[0].count) == 4
    _assert_trees_close(got_s[0].mu, want_s[0].mu)
    _assert_trees_close(got_s[0].nu, want_s[0].nu)
    assert type(got_s[2]) is type(want_s[2])
    if hasattr(want_s[2], "count"):
        assert int(got_s[2].count) == int(want_s[2].count)


@pytest.mark.parametrize("mode", ["jnp", "pallas_interpret"])
def test_bf16_mu_dtype_composes(mode):
    """optim mu_dtype=bfloat16 composes with fused_optim: μ stays bf16
    (no silent f32 upcast → second-step retrace) and matches optax's
    compute-in-f32/store-bf16 semantics."""
    rng = np.random.default_rng(3)
    params = _params(rng)
    grads_seq = [jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape), jnp.float32) * 0.1,
        params) for _ in range(3)]

    tx = optax.adamw(LR, b1=HP["b1"], b2=HP["b2"], eps=HP["eps"],
                     weight_decay=HP["weight_decay"], mu_dtype=jnp.bfloat16)
    want_p = params
    want_s = tx.init(params)
    want_e = jax.tree.map(jnp.copy, params)
    for i in range(3):
        updates, want_s = tx.update(grads_seq[i], want_s, want_p)
        want_p = optax.apply_updates(want_p, updates)
        want_e = ema_update(want_e, want_p, jnp.asarray(i + 1), EMA_DECAY)

    kw = (dict(use_pallas=False) if mode == "jnp"
          else dict(use_pallas=True, interpret=True))
    upd = make_fused_adamw_ema(LR, b1=HP["b1"], b2=HP["b2"], eps=HP["eps"],
                               weight_decay=HP["weight_decay"],
                               ema_decay=EMA_DECAY, **kw)
    got_p, got_s = params, tx.init(params)
    got_e = jax.tree.map(jnp.copy, params)
    n = jnp.zeros((), jnp.int32)
    import sgdm_tpu.ops.pallas.fused_optim as fo
    old = fo._MIN_PALLAS
    if mode == "pallas_interpret":
        fo._MIN_PALLAS = 1024
    try:
        for i in range(3):
            got_p, got_s, got_e = upd(grads_seq[i], got_s, got_p, got_e, n)
            n = n + 1
    finally:
        fo._MIN_PALLAS = old

    for leaf in jax.tree.leaves(got_s[0].mu):
        assert leaf.dtype == jnp.bfloat16
    _assert_trees_close(got_s[0].mu, want_s[0].mu, rtol=0, atol=0)
    _assert_trees_close(got_s[0].nu, want_s[0].nu)
    # bf16 μ rounding feeds back into params — compare against the optax
    # chain (identical math), tight tolerance
    _assert_trees_close(got_p, want_p, rtol=1e-5, atol=1e-6)
    _assert_trees_close(got_e, want_e, rtol=1e-5, atol=1e-6)


def test_constant_lr_empty_sched_state():
    """A constant-lr adamw's schedule state is EmptyState — a namedtuple
    whose tuple.count METHOD used to fool the hasattr(count) probe and
    crash the fused update."""
    rng = np.random.default_rng(4)
    params = {"w": jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)}
    g = [{"w": jnp.full((16, 128), 0.25, jnp.float32)}]
    tx = optax.adamw(1e-3, b1=HP["b1"], b2=HP["b2"], eps=HP["eps"],
                     weight_decay=HP["weight_decay"])
    opt_state = tx.init(params)
    upd = make_fused_adamw_ema(lambda t: 1e-3, b1=HP["b1"], b2=HP["b2"],
                               eps=HP["eps"],
                               weight_decay=HP["weight_decay"],
                               ema_decay=EMA_DECAY, use_pallas=False)
    ema = jax.tree.map(jnp.copy, params)
    p2, s2, e2 = upd(g[0], opt_state, params, ema, jnp.zeros((), jnp.int32))
    updates, want_s = tx.update(g[0], opt_state, params)
    want_p = optax.apply_updates(params, updates)
    _assert_trees_close(p2, want_p)
    assert type(s2[2]) is type(want_s[2])


def test_warmup_ema_decay_and_no_ema():
    """Early steps use the (1+n)/(10+n) warmup decay; use_ema=False keeps
    ema ≡ params."""
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)}
    g = [{"w": jnp.full((16, 128), 0.5, jnp.float32)}]
    want_p, _, want_e = _run_unfused(params, g, 1)
    # step 1: d = min(0.9, 2/11) = 2/11 → ema visibly off params
    got_p, _, got_e = _run_fused(params, g, 1, use_pallas=False)
    _assert_trees_close(got_e, want_e)
    diff = float(jnp.abs(got_e["w"] - got_p["w"]).max())
    assert diff > 1e-4
    # use_ema=False
    p2, _, e2 = _run_fused(params, g, 1, use_pallas=False, use_ema=False)
    _assert_trees_close(p2, e2, rtol=0, atol=0)


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_train_step_flag_matches_default():
    """make_train_step(fused_optim=True) reproduces the default step."""
    import flax.linen as nn

    from sgdm_tpu.diffusion import GaussianDiffusion
    from sgdm_tpu.training.state import create_train_state, make_train_step

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, t, train=False, **kw):
            emb = t.astype(jnp.float32)[:, None, None, None] / 10.0
            h = nn.Conv(8, (3, 3), padding=1)(x + emb * 0.0)
            h = nn.silu(h)
            return nn.Conv(x.shape[-1], (3, 3), padding=1)(h)

    model = Tiny()
    diff = GaussianDiffusion(num_timesteps=10)
    lr = lambda t: 1e-3
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 8, 8, 3)),
                    jnp.float32)
    batch = {"image": x}
    rng = jax.random.PRNGKey(0)

    hp = dict(lr_schedule=lr, beta1=0.9, beta2=0.999, eps=1e-8,
              weight_decay=0.01)
    outs = {}
    for fused in (False, True):
        state = create_train_state(model, tx, jax.random.PRNGKey(1),
                                   {"image": x[:1]})
        step = make_train_step(model, diff, tx, ema_decay=0.9,
                               fast_dropout_rng=False, fused_optim=fused,
                               optim_hparams=hp)
        for _ in range(2):
            state, metrics = step(state, batch, rng)
        outs[fused] = (state, metrics)

    s0, s1 = outs[False][0], outs[True][0]
    _assert_trees_close(s1.params, s0.params)
    _assert_trees_close(s1.ema_params, s0.ema_params)
    assert int(s1.step) == int(s0.step) == 2
    assert int(s1.ema_updates) == int(s0.ema_updates) == 2
    np.testing.assert_allclose(float(outs[True][1]["loss"]),
                               float(outs[False][1]["loss"]), rtol=1e-6)
