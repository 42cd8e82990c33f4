"""Papervis figure zoo + scoremix sampler tests.

Covers the reference's `eval/papervis_utils.py` grid helpers (stego/LOST/
chain/condscale/scoremix figures) and the working implementation of the
`exp.scoremix` test mode (reference run_exp.py:132-134; its sampler path
raises NotImplementedError upstream).
"""

import numpy as np
import pytest
from PIL import Image

from sgdm_tpu.eval import papervis as pv
from sgdm_tpu.utils.batch_ops import batch_to_samecondition_v2


def _imgs(n, size=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, size, size, c), dtype=np.uint8)


def _png_size(path):
    with Image.open(path) as im:
        return im.size  # (W, H)


def test_mask_to_ids_forms():
    ids = np.arange(16).reshape(4, 4) % 3
    onehot_hwk = np.eye(3)[ids]                 # [H,W,K]
    onehot_khw = np.moveaxis(onehot_hwk, -1, 0)  # [K,H,W]
    np.testing.assert_array_equal(pv.mask_to_ids(ids), ids)
    np.testing.assert_array_equal(pv.mask_to_ids(onehot_hwk), ids)
    np.testing.assert_array_equal(pv.mask_to_ids(onehot_khw), ids)


def test_extract_bboxes_matches_reference_semantics():
    # papervis_utils.py:42-67: box = (x1, y1, x2+1, y2+1); empty → zeros
    m = np.zeros((8, 8, 2), dtype=np.uint8)
    m[2:5, 3:7, 0] = 1
    boxes = pv.extract_bboxes(m)
    np.testing.assert_array_equal(boxes[0], [3, 2, 7, 5])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])


def test_stego_and_lost_grids(tmp_path):
    n = 4
    samples = _imgs(n)
    originals = _imgs(n, seed=1)
    stego = np.eye(5)[np.random.default_rng(2).integers(0, 5, (n, 16, 16))]
    lost = np.zeros((n, 16, 16, 1), dtype=np.float32)
    lost[:, 4:10, 6:12, 0] = 1.0

    p1 = pv.draw_grid_stego(samples, stego, originals,
                            tmp_path / "stego.png", up_size=32)
    p2 = pv.draw_grid_random_stego_with_mask(
        samples, stego, originals, tmp_path / "rsm.png", ncol=2, up_size=32)
    p3 = pv.draw_grid_lost_bbox(samples, lost, originals,
                                tmp_path / "lost.png", up_size=32)
    p4 = pv.draw_grid_random_lost_with_box(
        samples, lost, tmp_path / "rlb.png", ncol=2, up_size=32)
    for p in (p1, p2, p3, p4):
        assert p.exists()
    # stego grid: 1 original + 1 overlay + n samples in one row
    w, h = _png_size(p1)
    assert w > h  # single row
    # pair grid: 2*ncol columns
    assert _png_size(p2)[0] == 2 * 2 * 32 + 3 * 5  # 4 tiles, padding 5


def test_chainvis_grids(tmp_path):
    k, b = 3, 2
    chain = np.random.default_rng(0).uniform(-1, 1, (k, b, 16, 16, 3))
    originals = _imgs(b)
    stego = np.eye(4)[np.random.default_rng(1).integers(0, 4, (b, 16, 16))]
    lost = np.zeros((b, 16, 16, 1)); lost[:, 2:8, 2:8, 0] = 1
    p1 = pv.draw_grid_stego_chainvis(chain, stego, originals,
                                     tmp_path / "sc.png")
    p2 = pv.draw_grid_lost_chainvis(chain, lost, originals,
                                    tmp_path / "lc.png")
    # rows = b, cols = k+1 (overlay + chain frames)
    w, h = _png_size(p1)
    assert w == (k + 1) * 16 + k * 2 and h == b * 16 + (b - 1) * 2
    assert p2.exists()


def test_condscale_and_scoremix_grids(tmp_path):
    n_samples, n_scales = 2, 3
    flat = _imgs(n_samples * n_scales)
    p = pv.draw_grid_condscale(flat, tmp_path / "cs.png", n_samples)
    w, h = _png_size(p)
    assert w == n_scales * 16 + (n_scales - 1) * 2

    stego = np.eye(4)[np.random.default_rng(1).integers(0, 4, (n_samples, 16, 16))]
    outs = pv.draw_grid_condscale_stego(
        stego, _imgs(n_samples), flat, tmp_path / "css.png", n_samples,
        up_size=32)
    assert len(outs) == n_samples and all(o.exists() for o in outs)

    p = pv.draw_grid_scoremix(flat, tmp_path / "sm.png", ncol=3)
    assert p.exists()


def test_cluster_hist(tmp_path):
    p = pv.cluster_hist_vis_fn(np.random.default_rng(0).poisson(30, 100),
                               tmp_path / "hist.png")
    assert p.exists()


def test_batch_to_samecondition_v2():
    batch = {
        "cluster": np.arange(8)[:, None].repeat(3, 1),
        "lostbboxmask": np.arange(8)[:, None],
    }
    out = batch_to_samecondition_v2(batch, "lostbboxmask", 4)
    # cluster rows grouped by 4, lostbboxmask untouched
    np.testing.assert_array_equal(out["cluster"][:4], batch["cluster"][[0, 0, 0, 0]])
    np.testing.assert_array_equal(out["cluster"][4:], batch["cluster"][[1, 1, 1, 1]])
    np.testing.assert_array_equal(out["lostbboxmask"], batch["lostbboxmask"])


# ----------------------------------------------------------------------

@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_scoremix_sampler_endpoints():
    """w=0 reproduces guided(cond_a); w=1 reproduces guided(cond_b)."""
    import jax
    import jax.numpy as jnp

    from sgdm_tpu.diffusion import GaussianDiffusion
    from sgdm_tpu.models import UNetModel
    from sgdm_tpu.training.state import make_sample_fn, make_scoremix_sample_fn

    model = UNetModel(model_channels=16, out_channels=3, num_res_blocks=1,
                      channel_mult=(1, 2), attention_resolutions=(2,),
                      num_heads=2, cond_dim=6)
    diffusion = GaussianDiffusion(num_timesteps=20)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 8, 8, 3))
    ca = jax.random.normal(jax.random.PRNGKey(1), (2, 6))
    cb = jax.random.normal(jax.random.PRNGKey(2), (2, 6))
    params = model.init(rng, x, jnp.zeros((2,), jnp.int32), cond=ca)["params"]
    # fresh params zero-init the output conv (eps ≡ 0, cond-independent);
    # perturb every kernel so conditioning actually reaches the output
    keys = iter(jax.random.split(jax.random.PRNGKey(7),
                                 len(jax.tree.leaves(params))))
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(next(keys), p.shape, p.dtype),
        params)

    mixer = make_scoremix_sample_fn(
        model, diffusion, sampling_method="ddim", num_steps=5, cond_scale=2.0)
    plain = make_sample_fn(
        model, diffusion, sampling_method="ddim", num_steps=5, cond_scale=2.0,
        pallas_inference=False)

    x_T = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))
    w0 = jnp.zeros((2,))
    w1 = jnp.ones((2,))
    mixed_a, _ = mixer(params, rng, 2, 8, 3, ca, cb, w0, x_T=x_T)
    mixed_b, _ = mixer(params, rng, 2, 8, 3, ca, cb, w1, x_T=x_T)
    assert not np.allclose(np.asarray(mixed_a), np.asarray(mixed_b))

    # endpoint parity vs the plain guided sampler on the same noise — need
    # the plain path to accept x_T; compare via a second mixer call with
    # both conds equal instead (w irrelevant then)
    same_a, _ = mixer(params, rng, 2, 8, 3, ca, ca,
                      jnp.full((2,), 0.3), x_T=x_T)
    np.testing.assert_allclose(np.asarray(same_a), np.asarray(mixed_a),
                               atol=1e-2)


def test_scoremix_harness_batch_shapes():
    """The harness pairing: pairs × interp rows, same noise per pair."""
    interp, n = 3, 6
    cond = np.arange(n * 4, dtype=np.float32).reshape(n, 4)
    n_pairs = n // interp
    ca = np.repeat(cond[:n_pairs], interp, axis=0)
    cb = np.repeat(np.roll(cond, -1, axis=0)[:n_pairs], interp, axis=0)
    w = np.tile(np.linspace(0, 1, interp), n_pairs)
    assert ca.shape == (n_pairs * interp, 4)
    np.testing.assert_array_equal(ca[0], ca[interp - 1])  # same pair rows
    np.testing.assert_array_equal(cb[0], cond[1])
    assert w[0] == 0.0 and w[interp - 1] == 1.0
