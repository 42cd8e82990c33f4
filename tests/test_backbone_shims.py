"""Zoo long-tail loader shims (xcit/timm/vissl) + dataset-keyed vis params.

Parity targets: self_sl/ssl_backbone.py:129-171 (xcit), timm_backbone.py:14,
vissl_backbone.py:20; eval_fid.py:194-213 (samecondition_num / padding).
"""

import pytest

from sgdm_tpu.eval.harness import _ds_vis_params
from sgdm_tpu.selfsup.ssl_backbone import get_ssl_backbone


def test_xcit_shim_errors_informatively():
    with pytest.raises(NotImplementedError, match="XCiT"):
        get_ssl_backbone("xcit_small_12_p16")
    with pytest.raises(NotImplementedError, match="torch.hub"):
        get_ssl_backbone("dino_xcit_medium_24_p8")


def test_vissl_shim_errors_informatively():
    with pytest.raises(NotImplementedError, match="VISSL"):
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
