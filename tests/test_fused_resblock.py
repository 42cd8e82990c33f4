"""Fused-ResBlock Pallas kernel: fwd + custom-VJP parity (CPU interpreter)
and the module-level `use_pallas="fused"` integration.

Parity target: the ResBlock chain of openaimodel.py:207-321 as composed by
models.layers.ResBlock; the kernel is `ops/pallas/resblock.py`.  The same
checks re-run compiled on real TPU hardware (TPU-gated test at the bottom;
also exercised by the bench).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdm_tpu.ops.pallas.resblock import fused_resblock, resblock_reference


def _mk(B=2, H=8, W=8, Cin=32, Cout=32, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    x = f(B, H, W, Cin)
    args = [
        f(Cin) + 1, f(Cin) * 0.1, f(3, 3, Cin, Cout) * 0.1, f(Cout) * 0.1,
        f(B, Cout) * 0.1, f(B, Cout) * 0.1, f(Cout) + 1, f(Cout) * 0.1,
        f(3, 3, Cout, Cout) * 0.1, f(Cout) * 0.1,
    ]
    skip = (None, None) if Cin == Cout else (
        f(1, 1, Cin, Cout) * 0.1, f(Cout) * 0.1)
    cot = f(B, H, W, Cout)
    return x, args, skip, cot


@pytest.mark.parametrize("cin,cout", [(32, 32), (32, 64)])
def test_forward_parity(cin, cout):
    x, args, (skw, skb), _ = _mk(Cin=cin, Cout=cout)
    out = fused_resblock(x, *args, skw, skb, interpret=True)
    ref = resblock_reference(x, *args, skw, skb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
@pytest.mark.parametrize("cin,cout", [(32, 32), (32, 64)])
def test_gradient_parity_all_params(cin, cout):
    x, args, (skw, skb), cot = _mk(Cin=cin, Cout=cout)
    extra = [] if skw is None else [skw, skb]

    def lf(x, *vals):
        return jnp.sum(fused_resblock(x, *vals, interpret=True) * cot)

    def lr(x, *vals):
        return jnp.sum(resblock_reference(x, *vals) * cot)

    n = 1 + len(args) + len(extra)
    gf = jax.grad(lf, argnums=tuple(range(n)))(x, *args, *extra)
    gr = jax.grad(lr, argnums=tuple(range(n)))(x, *args, *extra)
    for a, b in zip(gf, gr):
        # absolute tolerance matters: some true grads are ~0 (e.g. conv1
        # bias when group_size=1 — GN is shift-invariant per channel)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


def test_dropout_deterministic_and_rate():
    x, args, _, _ = _mk()
    seed = jnp.array([99], jnp.int32)
    o1 = fused_resblock(x, *args, seed=seed, dropout_rate=0.5, interpret=True)
    o2 = fused_resblock(x, *args, seed=seed, dropout_rate=0.5, interpret=True)
    o3 = fused_resblock(x, *args, seed=seed + 1, dropout_rate=0.5,
                        interpret=True)
    assert bool(jnp.all(o1 == o2))
    assert bool(jnp.any(o1 != o3))


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_dropout_gradient_finite_difference():
    x, args, _, cot = _mk(seed=3)
    seed = jnp.array([5], jnp.int32)

    def ld(x):
        return jnp.sum(
            fused_resblock(x, *args, seed=seed, dropout_rate=0.3,
                           interpret=True) * cot)

    g = jax.grad(ld)(x)
    eps = 1e-2
    for idx in [(0, 3, 4, 7), (1, 7, 7, 31)]:
        e = jnp.zeros_like(x).at[idx].set(eps)
        fd = (ld(x + e) - ld(x - e)) / (2 * eps)
        assert abs(float(g[idx]) - float(fd)) < 5e-2 * max(
            1.0, abs(float(fd)))


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_module_fused_matches_unfused_and_shares_tree(monkeypatch):
    """ResBlock(use_pallas='fused') must produce the same parameter tree as
    the unfused module and (given identical params) the same output."""
    from sgdm_tpu.models import layers

    # pretend we're on TPU for the pallas-availability gate (the kernel
    # itself auto-runs in interpret mode off-TPU) while still honoring the
    # per-module use_pallas flag
    monkeypatch.setattr(layers, "_pallas_ok", lambda v: bool(v))

    B, H, W, C = 2, 8, 8, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((B, 64)), jnp.float32)

    for cout in (C, 2 * C):
        fused = layers.ResBlock(out_channels=cout, use_pallas="fused")
        plain = layers.ResBlock(out_channels=cout, use_pallas=False)
        vf = fused.init(jax.random.PRNGKey(0), x, emb)
        vp = plain.init(jax.random.PRNGKey(0), x, emb)
        tf = jax.tree.structure(vf)
        tp = jax.tree.structure(vp)
        assert tf == tp, f"param tree diverged: {tf} vs {tp}"
        for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(vf),
            jax.tree_util.tree_leaves_with_path(vp),
        ):
            assert ka == kb and a.shape == b.shape, (ka, kb, a.shape, b.shape)
        of = fused.apply(vp, x, emb)
        op = plain.apply(vp, x, emb)
        np.testing.assert_allclose(np.asarray(of), np.asarray(op),
                                   rtol=2e-4, atol=2e-4)


def test_module_fused_train_dropout_runs(monkeypatch):
    from sgdm_tpu.models import layers

    # pretend we're on TPU for the pallas-availability gate (the kernel
    # itself auto-runs in interpret mode off-TPU) while still honoring the
    # per-module use_pallas flag
    monkeypatch.setattr(layers, "_pallas_ok", lambda v: bool(v))
    B, H, W, C = 2, 8, 8, 32
    x = jnp.ones((B, H, W, C), jnp.float32)
    emb = jnp.ones((B, 64), jnp.float32)
    blk = layers.ResBlock(out_channels=C, dropout=0.3, use_pallas="fused")
    v = blk.init(jax.random.PRNGKey(0), x, emb)
    out = blk.apply(v, x, emb, True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == (B, H, W, C)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.skipif(
    not __import__("sgdm_tpu.utils.tpu", fromlist=["on_tpu_target"]
                   ).on_tpu_target(),
    reason="needs real TPU",
)
def test_tpu_compiled_parity_bf16():
    x, args, _, cot = _mk(B=4, H=16, W=16, Cin=128, Cout=128)
    xb = x.astype(jnp.bfloat16)
    out = jax.jit(lambda x, *a: fused_resblock(x, *a))(xb, *args)
    ref = jax.jit(lambda x, *a: resblock_reference(x, *a))(xb, *args)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    assert err / scale < 0.02


@pytest.mark.parametrize("resample", ["up", "down"])
def test_resample_variant_forward_parity(resample):
    """resblock_updown variants (forward-only kernel, identity skip)."""
    B, H, W, C = 2, 16, 16, 32
    rng = np.random.default_rng(7)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    x = f(B, H, W, C)
    args = [f(C) + 1, f(C) * 0.1, f(3, 3, C, C) * 0.1, f(C) * 0.1,
            f(B, C) * 0.1, f(B, C) * 0.1, f(C) + 1, f(C) * 0.1,
            f(3, 3, C, C) * 0.1, f(C) * 0.1]
    out = fused_resblock(x, *args, resample=resample, interpret=True)
    ref = resblock_reference(x, *args, resample=resample)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("updown", ["up", "down"])
def test_module_resample_fused_matches_unfused(monkeypatch, updown):
    from sgdm_tpu.models import layers

    monkeypatch.setattr(layers, "_pallas_ok", lambda v: bool(v))
    B, H, W, C = 2, 16, 16, 32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((B, 64)), jnp.float32)
    kw = {"up": True} if updown == "up" else {"down": True}
    fused = layers.ResBlock(out_channels=C, use_pallas=True, **kw)
    plain = layers.ResBlock(out_channels=C, use_pallas=False, **kw)
    v = plain.init(jax.random.PRNGKey(0), x, emb)
    assert jax.tree.structure(
        fused.init(jax.random.PRNGKey(0), x, emb)
    ) == jax.tree.structure(v)
    of = fused.apply(v, x, emb)
    op = plain.apply(v, x, emb)
    assert of.shape == op.shape
    np.testing.assert_allclose(np.asarray(of), np.asarray(op),
                               rtol=2e-4, atol=2e-4)
