"""InceptionV3 (FID variant) in Flax — the eval feature extractor.

The reference leans on three external FID stacks that all wrap the same
`pt_inception-2015-12-05` network (clean-fid / pytorch-fid / torch-fidelity;
reference `eval/eval_fid.py:47-191`).  This is that network as a Flax module
(NHWC, inference-only, BN folded at load time):

  * the FID-specific differences from torchvision InceptionV3 are kept:
    1008-way logits and the *max*-pooled branch-pool in the second
    InceptionE block,
  * `pool3` 2048-d features (FID/PRDC), `logits` (IS), and the 17×17×768
    Mixed_6e spatial tensor whose first 7 channels give the 2023-d sFID
    features (Nash et al., arXiv:2103.03841),
  * weights load from the standard `pt_inception-2015-12-05-6726825d.pth`
    torch state dict when a path is given (`load_torch_weights`); module
    names mirror the torch names so the mapping is mechanical.

No-egress fallback: `random_params(seed)` builds a deterministic random
network.  FID in a random-feature space is still a valid two-sample
discrepancy (useful for smoke tests and relative comparisons) but NOT
comparable to reference FID numbers — callers log a loud warning.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["FIDInceptionV3", "load_torch_weights", "random_params"]


class ConvBN(nn.Module):
    """Conv + folded BatchNorm + ReLU.  BN(eps=1e-3) is folded into a bias/
    scale pair at weight-load time, so inference is a single conv+affine."""

    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=pad,
            use_bias=False, name="conv", dtype=jnp.float32,
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        return nn.relu(x * scale + bias)


def _avg_pool_3x3_no_pad_count(x: jax.Array) -> jax.Array:
    """F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False).

    The FID network patches every InceptionA/C/E-1 branch_pool to
    count_include_pad=False (pytorch-fid inception.py FIDInceptionA/C/E_1;
    clean-fid inception_pytorch.py) — edge windows divide by the number of
    REAL elements, not 9.
    """
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), dtype=x.dtype)
    count = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / count


def _max_pool(x, k, s, p=0):
    return nn.max_pool(x, (k, k), strides=(s, s),
                       padding=[(p, p), (p, p)] if p else "VALID")


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # FID variant: second E block max-pools

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            ConvBN(384, (1, 3), padding=[(0, 0), (1, 1)], name="branch3x3_2a")(b3),
            ConvBN(384, (3, 1), padding=[(1, 1), (0, 0)], name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            ConvBN(384, (1, 3), padding=[(0, 0), (1, 1)], name="branch3x3dbl_3a")(bd),
            ConvBN(384, (3, 1), padding=[(1, 1), (0, 0)], name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.use_max_pool:
            bp = _max_pool(x, 3, 1, p=1)
        else:
            bp = _avg_pool_3x3_no_pad_count(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Returns dict(pool3 [B,2048], logits [B,1008], spatial [B,2023]).

    Input: [B, 299, 299, 3] float32 in [-1, 1].
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        # sFID spatial features: first 7 channels of the 17×17 map (2023-d)
        spatial = x[..., :7].reshape(x.shape[0], -1)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        pool3 = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(1008, name="fc")(pool3)
        return {"pool3": pool3, "logits": logits, "spatial": spatial}


# ----------------------------------------------------------------------
# weights
# ----------------------------------------------------------------------

def load_torch_weights(path: str | Path) -> dict:
    """Load `pt_inception-2015-12-05-*.pth` and fold BN.

    Returns a params dict for FIDInceptionV3 (pure inference constants).
    """
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    params: dict = {}

    def put(tree_path: list[str], leaf: str, value: np.ndarray) -> None:
        node = params
        for p in tree_path:
            node = node.setdefault(p, {})
        node[leaf] = jnp.asarray(value)

    # group keys by conv-bn module prefix; the training-time auxiliary
    # classifier head (AuxLogits.*) is present in the pth but unused at
    # inference by every FID stack — skip it
    prefixes = sorted({
        k.rsplit(".", 2)[0] for k in sd
        if ".conv.weight" in k and not k.startswith("AuxLogits.")
    })
    for prefix in prefixes:
        w = sd[f"{prefix}.conv.weight"].numpy()          # OIHW
        gamma = sd[f"{prefix}.bn.weight"].numpy()
        beta = sd[f"{prefix}.bn.bias"].numpy()
        mean = sd[f"{prefix}.bn.running_mean"].numpy()
        var = sd[f"{prefix}.bn.running_var"].numpy()
        eps = 1e-3
        scale = gamma / np.sqrt(var + eps)
        bias = beta - mean * scale
        flax_path = prefix.split(".")
        put(flax_path + ["conv"], "kernel", w.transpose(2, 3, 1, 0))  # HWIO
        put(flax_path, "bn_scale", scale)
        put(flax_path, "bn_bias", bias)

    put(["fc"], "kernel", sd["fc.weight"].numpy().T)
    put(["fc"], "bias", sd["fc.bias"].numpy())
    return params


def random_params(seed: int = 0) -> dict:
    """Deterministic random network (no-egress fallback; see module doc)."""
    model = FIDInceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    return model.init(jax.random.PRNGKey(seed), x)["params"]
