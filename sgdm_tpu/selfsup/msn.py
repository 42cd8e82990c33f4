"""MSN pre-training (Masked Siamese Networks, Assran et al. 2022) in JAX.

TPU-native rewrite of the vendored MSN stack (`self_sl/msn/msn_train.py:66` +
`src/losses.py`): an EMA target encoder embeds the full view, the anchor
encoder embeds a patch-masked view, both are soft-assigned to learnable
prototypes, and the anchor is trained with cross-entropy against the
sharpened target assignment plus the me-max entropy regularizer.

Compact but faithful to the loss structure; the random patch masking reuses
the MAE argsort trick.  The trained anchor encoder plugs into SSLBackbone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["msn_loss", "sharpen", "make_msn_train_step", "mask_patches"]


def sharpen(p: jax.Array, T: float = 0.25) -> jax.Array:
    """Target sharpening. Parity: msn losses sharpen(p, T)."""
    p = p ** (1.0 / T)
    return p / p.sum(-1, keepdims=True)


def msn_loss(
    anchor_emb: jax.Array,      # [B, D] anchor (masked view) embeddings
    target_emb: jax.Array,      # [B, D] EMA target (full view) embeddings
    prototypes: jax.Array,      # [K, D]
    *,
    temperature: float = 0.1,
    target_temperature: float = 0.25,
    me_max_weight: float = 1.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    def assign(z, tau):
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        pn = prototypes / jnp.maximum(
            jnp.linalg.norm(prototypes, axis=-1, keepdims=True), 1e-12
        )
        return jax.nn.softmax(z @ pn.T / tau, axis=-1)

    probs = assign(anchor_emb, temperature)
    # reference (losses.py:38-60): the target assignment uses the SAME
    # snn temperature tau as the anchors; ONLY the sharpening applies
    # target_temperature — assigning at 0.25 and sharpening at 0.25 would
    # double-apply temperature (effective logits/0.0625, much softer)
    targets = jax.lax.stop_gradient(
        sharpen(
            assign(jax.lax.stop_gradient(target_emb), temperature),
            T=target_temperature,
        )
    )

    ce = -(targets * jnp.log(probs + 1e-12)).sum(-1).mean()
    # me-max: maximize the entropy of the MEAN anchor assignment
    avg = probs.mean(0)
    me_max = (avg * jnp.log(avg + 1e-12)).sum()
    loss = ce + me_max_weight * me_max
    return loss, {"ce": ce, "me_max": me_max}


def mask_patches(rng: jax.Array, x: jax.Array, patch_size: int,
                 mask_ratio: float = 0.7) -> jax.Array:
    """Zero out a random subset of patches (anchor masking)."""
    b, h, w, c = x.shape
    gh, gw = h // patch_size, w // patch_size
    n = gh * gw
    noise = jax.random.uniform(rng, (b, n))
    keep = (jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
            >= int(n * mask_ratio)).astype(x.dtype)  # 1 = keep
    keep = keep.reshape(b, gh, gw, 1, 1, 1)
    xp = x.reshape(b, gh, patch_size, gw, patch_size, c).transpose(0, 1, 3, 2, 4, 5)
    xp = xp * keep
    return xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def make_msn_train_step(encoder, tx, patch_size: int, *,
                        ema_decay: float = 0.996, mask_ratio: float = 0.7):
    """encoder: VisionTransformer; trains (params, prototypes) with an EMA
    target encoder, exactly the MSN recipe."""
    import optax

    @jax.jit
    def step(params, target_params, prototypes, opt_state, x, rng):
        mask_rng, _ = jax.random.split(rng)

        def loss_fn(trainables):
            p, protos = trainables
            anchor = encoder.apply(
                {"params": p}, mask_patches(mask_rng, x, patch_size, mask_ratio),
                out="cls",
            )
            target = encoder.apply({"params": target_params}, x, out="cls")
            return msn_loss(anchor, target, protos)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (params, prototypes)
        )
        updates, opt_state = tx.update(grads, opt_state, (params, prototypes))
        params, prototypes = optax.apply_updates((params, prototypes), updates)
        target_params = jax.tree.map(
            lambda t, p: ema_decay * t + (1 - ema_decay) * p,
            target_params, params,
        )
        return params, target_params, prototypes, opt_state, loss, aux

    return step
