"""Zoo long-tail loader shims (xcit/timm/vissl) + dataset-keyed vis params.

Parity targets: self_sl/ssl_backbone.py:129-171 (xcit), timm_backbone.py:14,
vissl_backbone.py:20; eval_fid.py:194-213 (samecondition_num / padding).
"""

import pytest

from sgdm_tpu.eval.harness import _ds_vis_params
from sgdm_tpu.selfsup.ssl_backbone import get_ssl_backbone


def test_unknown_backbone_names_error_informatively():
    # xcit/vissl are real ports now (models/xcit.py, models/resnet.py
    # load_vissl_torch_weights); unsupported VARIANTS must still fail with
    # the supported list rather than a bare KeyError
    with pytest.raises(ValueError, match="dino_xcit_m24_p8"):
        get_ssl_backbone("xcit_small_12_p16")
    with pytest.raises(ValueError, match="vissl_simclr"):
        get_ssl_backbone("vissl_resnet18")


def test_timm_shim_errors_without_timm():
    # `timm` is absent in this image: the shim must name the missing dep
    # and the remedy instead of crashing on an unknown-name KeyError
    try:
        import timm  # noqa: F401

        pytest.skip("timm installed: the shim would construct a real model")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="timm"):
        get_ssl_backbone("timm_resnet18")


def test_ds_vis_params_by_dataset_name():
    # eval_fid.py:194-213 name keying
    assert _ds_vis_params(64, "in64p") == (9, 2)
    assert _ds_vis_params(32, "in32p") == (18, 1)
    assert _ds_vis_params(64, "voc64") == (11, 5)
    assert _ds_vis_params(64, "cocostuff64") == (11, 5)
    assert _ds_vis_params(64, "coco64") == (11, 5)
    # unknown names fall back to size-keyed defaults
    assert _ds_vis_params(32, "mystery") == (18, 1)
    assert _ds_vis_params(64, "") == (9, 2)
    assert _ds_vis_params(128, "") == (11, 5)


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_feat_compute_dtype_knob():
    """compute_dtype override wins over the f32 default, and bf16 features
    stay cosine-close to f32 (softmax/LN are f32)."""
    import jax.numpy as jnp
    import numpy as np

    from sgdm_tpu.selfsup.ssl_backbone import get_ssl_backbone

    bk32 = get_ssl_backbone("dino_vits16", compute_dtype="float32", seed=1)
    bk16 = get_ssl_backbone("dino_vits16", compute_dtype="bfloat16", seed=1)
    assert bk32.model.dtype == jnp.float32
    assert bk16.model.dtype == jnp.bfloat16
    imgs = np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3), dtype=np.uint8)
    f32 = bk32.batch_encode_feat(bk32.transform_batch(imgs))
    f16 = bk16.batch_encode_feat(bk16.transform_batch(imgs))
    assert f16.dtype == np.float32  # features come back f32 either way
    cos = (f32 * f16).sum(-1) / (
        np.linalg.norm(f32, axis=-1) * np.linalg.norm(f16, axis=-1))
    assert cos.min() > 0.99, cos


def test_explicit_missing_ckpt_path_raises():
    """A user-supplied ckpt_path that doesn't exist must raise, not
    silently degrade to the seeded-random backbone."""
    import pytest

    from sgdm_tpu.selfsup.ssl_backbone import get_ssl_backbone

    with pytest.raises(FileNotFoundError, match="not found"):
        get_ssl_backbone("dino_vits16", ckpt_path="/nonexistent/dino.pth")
