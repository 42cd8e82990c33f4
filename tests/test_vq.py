"""VectorQuantize (models/vq.py) vs dynamic/vq_lr.py semantics.

The reference vendors lucidrains vector-quantize-pytorch and
dead-imports it from the UNet (openaimodel.py:25) — zoo breadth.
Checks: gather correctness, straight-through gradients, EMA codebook
convergence (Euclidean + cosine), kmeans one-shot init, dead-code
expiry, multi-head merges, image-fmap path, losses.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sgdm_tpu.models.vq import VectorQuantize, kmeans, orthogonal_loss_fn

RNG = np.random.default_rng(0)


def _x(*shape):
    return jnp.asarray(RNG.standard_normal(shape), jnp.float32)


def test_eval_quantize_is_codebook_gather():
    m = VectorQuantize(dim=8, codebook_size=16)
    x = _x(2, 5, 8)
    v = m.init(jax.random.PRNGKey(0), x)
    q, ind, loss = m.apply(v, x)
    assert q.shape == (2, 5, 8) and ind.shape == (2, 5)
    assert int(ind.min()) >= 0 and int(ind.max()) < 16
    embed = np.asarray(v["vq"]["embed"][0])
    np.testing.assert_allclose(np.asarray(q), embed[np.asarray(ind)],
                               rtol=1e-6)
    assert float(loss) == 0.0  # no loss outside training


def test_straight_through_gradient():
    """∂quantize/∂x = identity through the STE (vq_lr.py:533-534)."""
    m = VectorQuantize(dim=4, codebook_size=8, commitment_weight=0.0)
    x = _x(1, 3, 4)
    v = m.init(jax.random.PRNGKey(0), x)

    def f(xx):
        q, _, _ = m.apply(v, xx, train=True, mutable=["vq"])[0]
        return jnp.sum(q)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 1.0, rtol=1e-6)


def test_ema_codebook_converges_to_cluster_means():
    """Feeding one fixed point repeatedly drags its code onto it
    (vq_lr.py:286-298 EMA + Laplace smoothing)."""
    m = VectorQuantize(dim=2, codebook_size=4, decay=0.5)
    x = jnp.tile(jnp.asarray([[3.0, -2.0]]), (1, 32, 1)).reshape(1, 32, 2)
    v = m.init(jax.random.PRNGKey(0), x)
    state = v
    for _ in range(30):
        (q, ind, loss), upd = m.apply(state, x, train=True, mutable=["vq"])
        state = {**state, "vq": upd["vq"]}
    hit = int(np.asarray(ind)[0, 0])
    code = np.asarray(state["vq"]["embed"])[0, hit]
    np.testing.assert_allclose(code, [3.0, -2.0], atol=1e-2)
    assert float(loss) > 0  # commitment loss active


def test_kmeans_init_one_shot():
    m = VectorQuantize(dim=2, codebook_size=4, kmeans_init=True,
                       kmeans_iters=5)
    x = _x(1, 64, 2)
    v = m.init(jax.random.PRNGKey(0), x)
    assert not bool(v["vq"]["initted"])
    assert float(jnp.abs(v["vq"]["embed"]).max()) == 0.0  # zeros pre-init
    _, upd = m.apply(v, x, train=True, mutable=["vq"],
                     rngs={"vq": jax.random.PRNGKey(1)})
    assert bool(upd["vq"]["initted"])
    emb1 = np.asarray(upd["vq"]["embed"])
    assert np.abs(emb1).max() > 0
    # second call must NOT re-run kmeans (embed changes only via EMA)
    state = {**v, "vq": upd["vq"]}
    _, upd2 = m.apply(state, x, train=True, mutable=["vq"],
                      rngs={"vq": jax.random.PRNGKey(2)})
    drift = np.abs(np.asarray(upd2["vq"]["embed"]) - emb1).max()
    assert drift < 1.0  # EMA-sized step, not a fresh kmeans


def test_cosine_codebook_stays_normalized():
    m = VectorQuantize(dim=6, codebook_size=8, use_cosine_sim=True,
                       decay=0.7)
    x = _x(2, 16, 6)
    v = m.init(jax.random.PRNGKey(0), x)
    (_, _, _), upd = m.apply(v, x, train=True, mutable=["vq"])
    emb = np.asarray(upd["vq"]["embed"][0])
    # EMA of two unit-norm tensors keeps norms ≤ 1 and near 1 for hit codes
    norms = np.linalg.norm(emb, axis=-1)
    assert norms.max() <= 1.0 + 1e-5


def test_dead_code_expiry_replaces_unused():
    m = VectorQuantize(dim=2, codebook_size=8, decay=0.1,
                       threshold_ema_dead_code=0.5)
    x = jnp.tile(jnp.asarray([[1.0, 1.0]]), (1, 16, 1)).reshape(1, 16, 2)
    v = m.init(jax.random.PRNGKey(0), x)
    before = np.asarray(v["vq"]["embed"]).copy()
    _, upd = m.apply(v, x, train=True, mutable=["vq"],
                     rngs={"vq": jax.random.PRNGKey(3)})
    after = np.asarray(upd["vq"]["embed"])
    # nearly all codes are below threshold → replaced by (l2-normed) batch
    # samples = [1,1]/√2; at least the clearly-dead ones moved
    changed = np.abs(after - before).max(axis=-1) > 1e-3
    assert changed[0].sum() >= 6


def test_multihead_shared_and_separate():
    for sep in (False, True):
        m = VectorQuantize(dim=8, codebook_size=8, heads=2,
                           codebook_dim=4, separate_codebook_per_head=sep)
        x = _x(2, 3, 8)
        v = m.init(jax.random.PRNGKey(0), x)
        q, ind, _ = m.apply(v, x)
        assert q.shape == (2, 3, 8)
        assert ind.shape == (2, 3, 2)
        ncb = 2 if sep else 1
        assert v["vq"]["embed"].shape == (ncb, 8, 4)


def test_image_fmap_and_channel_first():
    m = VectorQuantize(dim=4, codebook_size=8, accept_image_fmap=True)
    x = _x(2, 4, 4, 4)  # NHWC (torch takes NCHW, :518-520)
    v = m.init(jax.random.PRNGKey(0), x)
    q, ind, _ = m.apply(v, x)
    assert q.shape == (2, 4, 4, 4) and ind.shape == (2, 4, 4)
    m2 = VectorQuantize(dim=4, codebook_size=8, channel_last=False)
    x2 = _x(2, 4, 6)  # [B, D, N]
    v2 = m2.init(jax.random.PRNGKey(0), x2)
    q2, ind2, _ = m2.apply(v2, x2)
    assert q2.shape == (2, 4, 6) and ind2.shape == (2, 6)


def test_orthogonal_reg_learnable_codebook():
    m = VectorQuantize(dim=4, codebook_size=8, orthogonal_reg_weight=10.0)
    x = _x(1, 5, 4)
    v = m.init(jax.random.PRNGKey(0), x)
    assert "embed" in v["params"]  # learnable (vq_lr.py:483-500)

    def loss_fn(params):
        out, _ = m.apply({**v, "params": params}, x, train=True,
                         mutable=["vq"])
        return out[2]

    loss = loss_fn(v["params"])
    assert float(loss) > 0
    g = jax.grad(loss_fn)(v["params"])
    assert float(jnp.abs(g["embed"]).max()) > 0  # ortho grads reach codebook


def test_kmeans_function_assigns_all_points():
    x = _x(1, 50, 3)
    means, bins = kmeans(jax.random.PRNGKey(0), x, 4, num_iters=8)
    assert means.shape == (1, 4, 3)
    assert float(bins.sum()) == 50.0


def test_orthogonal_loss_zero_for_orthonormal():
    eye = jnp.eye(4)[None]
    assert float(orthogonal_loss_fn(eye)) < 1e-10
    ones = jnp.ones((1, 4, 4))
    assert float(orthogonal_loss_fn(ones)) > 0.1
