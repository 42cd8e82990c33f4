"""Train state and the jitted, mesh-sharded train/eval/sample steps.

TPU-native replacement for the Lightning orchestration layer
(`lightning_module.py:56-323 TaoDiffusion` + Lightning DDP):

  * `TrainState{step, params, ema_params, opt_state, ema_updates}` replaces
    the LightningModule's model + LitEma buffers + optimizer state,
  * `make_train_step` fuses loss, grad, optimizer update and the EMA update
    (`on_train_batch_end` → `model_ema(model)`, lightning_module.py:312-314)
    into ONE jitted program; under a Mesh the batch rides the 'data' axis and
    XLA inserts the gradient all-reduce — the DDP/NCCL replacement,
  * `make_eval_step` = the reference's val loss pass (both EMA and non-EMA
    weights, lightning_module.py:291-303) — pass whichever params you want,
  * `make_sample_fn` builds the guided-sampling program: conditioning baked
    into a closure + CFG fusion + sampler scan, all inside jit.

Everything is pure; RNG is threaded explicitly (seed discipline replacing
torch's global RNG, SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diffusion import GaussianDiffusion, make_guided_denoiser
from ..diffusion.guidance import guided_score
from ..models.ema import ema_update
from ..utils.fast_rng import fast_rng_key

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_eval_step", "make_sample_fn", "make_scoremix_sample_fn"]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any
    ema_updates: jax.Array  # LitEma num_updates counter (ema.py:13-14)


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    example_batch: Mapping[str, Any],
    cond_kwargs: Mapping[str, Any] | None = None,
) -> TrainState:
    """Initialize params (and the EMA copy) from an example batch."""
    cond_kwargs = {
        k: v for k, v in (cond_kwargs or {}).items()
        if k in ("cond", "layout", "image_batch_ids")
    }
    # cluster_lookup conditions on batch ids via a learned Embed table —
    # init MUST see ids or the lookup_table param is never created (and
    # the UNet asserts on them, models/unet.py:253-260)
    if "image_batch_ids" in cond_kwargs:
        cond_kwargs["image_batch_ids"] = jnp.asarray(
            cond_kwargs["image_batch_ids"], dtype=jnp.int32)
    x = jnp.asarray(example_batch["image"])
    t = jnp.zeros((x.shape[0],), dtype=jnp.int32)
    # jit the init: flax init is otherwise eager — hundreds of tiny
    # dispatches (each a round trip on a remote-TPU setup) instead of ONE
    # compiled program
    variables = jax.jit(partial(model.init, **cond_kwargs))(rng, x, t)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        # distinct buffers, not aliases: params and ema_params are both in a
        # donated argument, and aliased buffers cannot be donated twice
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
        ema_updates=jnp.zeros((), dtype=jnp.int32),
    )




def _apply_denoiser(model, params, dropout_rng=None, train=False):
    def apply_fn(x, t, cond_drop_mask=None, **cond_kwargs):
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        return model.apply(
            {"params": params}, x, t,
            cond_drop_mask=cond_drop_mask, train=train, rngs=rngs,
            **cond_kwargs,
        )

    return apply_fn


def make_train_step(
    model,
    diffusion: GaussianDiffusion,
    tx: optax.GradientTransformation,
    *,
    cond_drop_prob: float = 0.0,
    ema_decay: float = 0.9999,
    use_ema: bool = True,
    accumulate_grad_batches: int = 1,
    fast_dropout_rng: bool = True,
    compiler_options: Mapping[str, str] | None = None,
    mesh: Mesh | None = None,
    state_shardings: Any | None = None,
    fused_optim: bool = False,
    optim_hparams: Mapping[str, Any] | None = None,
) -> Callable[[TrainState, Mapping[str, Any], jax.Array], tuple[TrainState, dict]]:
    """Build the fused train step.  ``batch`` must contain 'image' (NHWC,
    [-1,1]) and any condition tensors under 'cond'/'layout' keys.

    ``accumulate_grad_batches`` > 1 scans over micro-batches inside the
    jitted step (`main.py:104-105` accumulate_grad_batches → lax.scan
    micro-batching, SURVEY.md §5.8): the global batch dim is split
    [accum, micro, ...] and gradients are averaged before one optimizer
    update, matching Lightning's semantics.

    ``state_shardings``: optional NamedSharding tree for the TrainState
    (same structure) — pass `parallel.tp.state_sharding(state, mesh)` to
    train tensor-parallel over a 2-D ('data','model') mesh; default is the
    1-D behavior (params/opt-state replicated, DDP-equivalent).
    """

    fused_update = None
    if fused_optim:
        # one Pallas pass for AdamW + EMA (exact optax/LitEma math; see
        # ops/pallas/fused_optim.py) — opt-in, measured in BASELINE.md.
        # Incompatible with tensor-parallel state shardings: pallas_call
        # is a per-device program GSPMD cannot partition.
        assert state_shardings is None, (
            "fused_optim cannot run under tensor-parallel shardings")
        from ..ops.pallas.fused_optim import make_fused_adamw_ema

        hp = dict(optim_hparams or {})
        fused_update = make_fused_adamw_ema(
            hp["lr_schedule"],
            b1=hp.get("beta1", 0.9), b2=hp.get("beta2", 0.999),
            eps=hp.get("eps", 1e-8),
            weight_decay=hp.get("weight_decay", 1e-2),
            ema_decay=ema_decay, use_ema=use_ema,
        )

    def _loss_and_grads(params, batch, loss_rng, dropout_rng):
        cond_kwargs = {
            k: batch[k]
            for k in ("cond", "layout", "image_batch_ids")
            if batch.get(k) is not None
        }

        def loss_fn(params):
            denoise = _apply_denoiser(model, params, dropout_rng, train=True)
            return diffusion.loss(
                denoise, loss_rng, batch["image"],
                cond_kwargs=cond_kwargs, cond_drop_prob=cond_drop_prob,
            )

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, batch, rng):
        if fast_dropout_rng:
            # convert BEFORE any fold/split so every in-step key op runs on
            # the hardware RNG (no rolled threefry scalar loops)
            rng = fast_rng_key(rng)
        rng = jax.random.fold_in(rng, state.step)
        loss_rng, dropout_rng = jax.random.split(rng)

        if accumulate_grad_batches <= 1:
            (loss, aux), grads = _loss_and_grads(
                state.params, batch, loss_rng, dropout_rng
            )
        else:
            k = accumulate_grad_batches

            def split(x):
                b = x.shape[0]
                assert b % k == 0, (b, k)
                return x.reshape(k, b // k, *x.shape[1:])

            micro = {kk: split(v) for kk, v in batch.items() if v is not None}

            def body(carry, inp):
                grads_acc, loss_acc = carry
                mb, i = inp
                (l, aux), g = _loss_and_grads(
                    state.params, mb,
                    jax.random.fold_in(loss_rng, i),
                    jax.random.fold_in(dropout_rng, i),
                )
                grads_acc = jax.tree.map(lambda a, b: a + b, grads_acc, g)
                return (grads_acc, loss_acc + l), aux

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss), auxs = jax.lax.scan(
                body, (zero_grads, jnp.zeros(())),
                ({kk: v for kk, v in micro.items()}, jnp.arange(k)),
            )
            grads = jax.tree.map(lambda g: g / k, grads)
            loss = loss / k
            aux = {
                "ddpm_loss": auxs["ddpm_loss"].mean(),
                "epoch_stats_x": auxs["epoch_stats_x"].reshape(-1),
                "epoch_stats_y": auxs["epoch_stats_y"].reshape(-1),
            }
        if fused_update is not None:
            params, opt_state, ema_params = fused_update(
                grads, state.opt_state, state.params, state.ema_params,
                state.ema_updates)
            n = state.ema_updates + 1 if use_ema else state.ema_updates
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)

            if use_ema:
                n = state.ema_updates + 1
                ema_params = ema_update(state.ema_params, params, n,
                                        ema_decay)
            else:
                n = state.ema_updates
                # distinct buffers: ema_params aliased to params inside a
                # donated TrainState would donate the same buffer twice on
                # the next step (create_train_state jnp.copy's at init for
                # the same reason)
                ema_params = jax.tree.map(jnp.copy, params)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
            ema_updates=n,
        )
        metrics = {
            "loss": loss,
            "ddpm_loss": aux["ddpm_loss"],
            "grad_norm": optax.global_norm(grads),
            "epoch_stats_x": aux["epoch_stats_x"],
            "epoch_stats_y": aux["epoch_stats_y"],
        }
        return new_state, metrics

    copts = ({k: str(v) for k, v in compiler_options.items()}
             if compiler_options else None)
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,),
                       compiler_options=copts)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state_sh = state_shardings if state_shardings is not None else repl
    return jax.jit(
        train_step,
        donate_argnums=(0,),
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        compiler_options=copts,
    )


def make_eval_step(
    model,
    diffusion: GaussianDiffusion,
    *,
    mesh: Mesh | None = None,
    params_sharding: Any | None = None,
) -> Callable:
    """Validation loss (no grad, cond never dropped at eval-loss time —
    parity with shared_step under `training=False` which forces drop=1.0 in
    the conditioning glue; the caller passes the drop prob it wants).

    ``params_sharding``: NamedSharding tree for the params argument
    (tensor-parallel runs pass their param shardings so eval reuses the
    sharded layout instead of all-gathering every call)."""

    def eval_step(params, batch, rng, cond_drop_prob=1.0):
        cond_kwargs = {
            k: batch[k]
            for k in ("cond", "layout", "image_batch_ids")
            if batch.get(k) is not None
        }
        denoise = _apply_denoiser(model, params, train=False)
        loss, aux = diffusion.loss(
            denoise, rng, batch["image"],
            cond_kwargs=cond_kwargs, cond_drop_prob=cond_drop_prob,
        )
        return {"loss": loss, "ddpm_loss": aux["ddpm_loss"]}

    if mesh is None:
        return jax.jit(eval_step, static_argnames=("cond_drop_prob",))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    p_sh = params_sharding if params_sharding is not None else repl
    return jax.jit(
        eval_step,
        static_argnames=("cond_drop_prob",),
        in_shardings=(p_sh, data, repl),
        out_shardings=repl,
    )


def make_sample_fn(
    model,
    diffusion: GaussianDiffusion,
    *,
    sampling_method: str = "ddim",
    num_steps: int = 50,
    cond_scale: float = 2.0,
    scale_type: str = "imagen",
    ddim_eta: float = 0.0,
    clip_denoised: bool = True,
    dtp: float = 1.0,
    temperature: float = 1.0,
    noise_dropout: float = 0.0,
    log_num_per_prog: int = 10,
    return_uint8: bool = True,
    pallas_inference: bool = True,
    param_dtype: Any | None = None,
    mesh: Mesh | None = None,
) -> Callable:
    """Build the jitted guided-sampling program.

    Returns ``sample(params, rng, shape_batch, cond=None, layout=None)`` →
    (images, intermediates).  This is the TPU equivalent of
    `sampling_progressive` (lightning_module.py:136-203): conditioning plus
    CFG is fused into the scanned denoise step.

    ``pallas_inference``: sampling has no backward pass, so the fused Pallas
    kernels are a pure win here (measured +4% DDIM steps/sec on v5e); the
    train step keeps the XLA path (measured faster there — custom-VJP
    boundaries block backward fusion).

    ``param_dtype``: cast the weight tree once inside the program (e.g.
    ``jnp.bfloat16`` halves per-step weight HBM reads — the compute policy
    casts f32 weights at use, so stored-f32 params stream at twice the
    bytes otherwise).  Inference-only knob; None keeps stored precision.
    """
    if pallas_inference and hasattr(model, "use_pallas") and not model.use_pallas:
        model = model.clone(use_pallas=True)

    def sample(params, rng, batch_size, image_size, channels,
               cond=None, layout=None, image_batch_ids=None):
        if param_dtype is not None:
            params = jax.tree.map(
                lambda p: p.astype(param_dtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                params,
            )
        apply_fn = _apply_denoiser(model, params, train=False)
        guided = make_guided_denoiser(apply_fn, scale_type=scale_type)
        cond_kwargs = {}
        if cond is not None:
            cond_kwargs["cond"] = cond
        if layout is not None:
            cond_kwargs["layout"] = layout
        if image_batch_ids is not None:
            cond_kwargs["image_batch_ids"] = image_batch_ids
        denoise = lambda x, t: guided(x, t, cond_scale=cond_scale, **cond_kwargs)
        shape = (batch_size, image_size, image_size, channels)
        return diffusion.sample(
            sampling_method, denoise, rng, shape,
            num_steps=num_steps, ddim_eta=ddim_eta,
            clip_denoised=clip_denoised, dtp=dtp,
            temperature=temperature, noise_dropout=noise_dropout,
            log_num_per_prog=log_num_per_prog, return_uint8=return_uint8,
        )

    # Shardings propagate from the inputs: device_put params replicated and
    # cond/layout batch-sharded (parallel.mesh.shard_batch) and XLA runs the
    # sampler data-parallel — per-rank sample dirs become per-shard outputs.
    del mesh
    return jax.jit(sample, static_argnames=("batch_size", "image_size", "channels"))


def make_scoremix_sample_fn(
    model,
    diffusion: GaussianDiffusion,
    *,
    sampling_method: str = "ddim",
    num_steps: int = 50,
    cond_scale: float = 2.0,
    scale_type: str = "imagen",
    clip_denoised: bool = True,
    dtp: float = 1.0,
    return_uint8: bool = True,
) -> Callable:
    """Score-mixing sampler: eps = (1-w)·eps_guided(c_a) + w·eps_guided(c_b).

    The reference's `exp.scoremix` test mode (run_exp.py:132-134 announces
    it; the sampler path `ddim_plms_sampler.py:218-245` raises
    NotImplementedError — this is a working implementation of that design:
    score-level interpolation between two conditions).

    The mixing weight ``w`` is PER-SAMPLE ([B], traced), so one jitted call
    covers a whole interpolation sweep: row i mixes cond_a[i] → cond_b[i]
    at weight w[i].  ``x_T`` supports the reference's `same_noise=true`
    (every row of a pair shares the initial noise).
    """

    def sample(params, rng, batch_size, image_size, channels,
               cond_a, cond_b, w, layout_a=None, layout_b=None, x_T=None):
        apply_fn = _apply_denoiser(model, params, train=False)
        guided = make_guided_denoiser(apply_fn, scale_type=scale_type)

        def denoise(x, t):
            kw_a = {"cond": cond_a}
            kw_b = {"cond": cond_b}
            if layout_a is not None:
                kw_a["layout"] = layout_a
                kw_b["layout"] = layout_b
            eps_a = guided(x, t, cond_scale=cond_scale, **kw_a)
            eps_b = guided(x, t, cond_scale=cond_scale, **kw_b)
            # reuse guided_score's per-sample broadcast: (1-w)·a + w·b
            return guided_score(z=eps_a, zc=eps_b, w=w, scale_type="imagen")

        shape = (batch_size, image_size, image_size, channels)
        return diffusion.sample(
            sampling_method, denoise, rng, shape,
            num_steps=num_steps, clip_denoised=clip_denoised, dtp=dtp,
            x_T=x_T, return_uint8=return_uint8,
        )

    return jax.jit(sample, static_argnames=("batch_size", "image_size", "channels"))
