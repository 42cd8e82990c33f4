"""Config engine + CLI grammar tests against the real configs/ tree."""

from pathlib import Path

import pytest

from main import apply_debug_overrides
from sgdm_tpu.config.engine import compose, instantiate_from_config, to_container

CONFIG_DIR = Path(__file__).parent.parent / "configs"


class TestCompose:
    def test_defaults_compose(self):
        cfg = compose(CONFIG_DIR)
        assert cfg.data.name == "cifar10"
        assert cfg.model.params.beta_schedule == "linear"
        assert cfg.seed == 23

    def test_group_override(self):
        cfg = compose(CONFIG_DIR, overrides=["data=in64_pickle", "dynamic=unetca_fast"])
        assert cfg.data.image_size == 64
        assert cfg.dynamic.params.use_ca_block is True

    def test_dotted_and_interpolation(self):
        cfg = compose(CONFIG_DIR, overrides=[
            "sg.params.condition_method=cluster",
            "sg.params.cond_dim=5000",
            "sg.params.cond_drop_prob=0.1",
            "sg.params.cond_scale=2",
        ])
        # dynamic group interpolates the sg knobs (unet_fast.yaml:17-19 parity)
        assert cfg.dynamic.params.cond_dim == 5000
        assert cfg.dynamic.params.condition_method == "cluster"
        # batch_size interpolates through data.params
        assert cfg.batch_size == cfg.data.params.batch_size

    def test_add_and_delete(self):
        cfg = compose(CONFIG_DIR, overrides=["+vis.newflag=1", "~postfix"])
        assert cfg.vis.newflag == 1
        assert "postfix" not in cfg

    def test_typo_top_level_rejected(self):
        with pytest.raises(KeyError):
            compose(CONFIG_DIR, overrides=["sedd=42"])

    def test_every_dynamic_preset_composes(self):
        for d in ["unet", "unet_fast", "unet_fast_s64", "unetca",
                  "unetca_fast", "unetca_fast_s64"]:
            cfg = compose(CONFIG_DIR, overrides=[f"dynamic={d}"])
            assert cfg.dynamic.params.model_channels >= 128

    def test_every_data_preset_composes(self):
        for d in ["cifar10", "cifar100", "in32_pickle", "in64_pickle",
                  "in32_from224", "in64_from224", "voc64", "cocostuff64",
                  "coco64", "cs64", "ffhq64", "synthetic32"]:
            cfg = compose(CONFIG_DIR, overrides=[f"data={d}"])
            assert cfg.data.image_size in (16, 32, 64)


class TestDebugShrinkage:
    def test_debug_overrides(self):
        cfg = compose(CONFIG_DIR, overrides=["debug=1"])
        cfg = apply_debug_overrides(cfg)
        assert cfg.data.val_fid_num == 5
        assert cfg.pl.trainer.max_epochs == 3
        assert cfg.data.params.batch_size == 4

    def test_unittest_overrides(self):
        cfg = compose(CONFIG_DIR)
        cfg = apply_debug_overrides(cfg, run_unittest=True)
        assert cfg.pl.trainer.limit_train_batches == 32
        assert cfg.data.params.batch_size == 16
        assert cfg.data.fid_every_n_epoch == 1


class TestInstantiate:
    def test_dynamic_target_builds_model(self):
        cfg = compose(CONFIG_DIR, overrides=[
            "dynamic=unet_fast", "sg.params.cond_dim=10",
            "sg.params.condition_method=label",
            "sg.params.cond_drop_prob=0.1", "sg.params.cond_scale=2",
        ])
        model = instantiate_from_config(to_container(cfg.dynamic))
        from sgdm_tpu.models import UNetModel

        assert isinstance(model, UNetModel)
        assert model.cond_dim == 10
