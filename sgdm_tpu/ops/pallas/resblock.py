"""Fully-fused ResBlock (Pallas/TPU) — forward AND custom-VJP backward.

The ResBlock chain (openaimodel.py:207-321; models.layers.ResBlock)

    h1  = silu(GN(x) * g1 + b1)
    h2  = conv3x3(h1, W1) + c1
    h3  = silu((GN(h2) * g2 + b2) * (1 + film_scale) + film_shift)
    h3d = dropout(h3)
    out = skip(x) + conv3x3(h3d, W2) + c2

is the train step's dominant HBM traffic: unfused, every link writes and
re-reads a full [B,H,W,C] activation (≈10 HBM passes per block forward,
more in the backward).  This kernel processes one sample per grid step with
everything resident in VMEM.

Two forward flavors share one kernel body:
  * **inference** (primal call, sampling): reads x, writes out — 2 HBM
    passes total; the padded conv inputs live in persistent VMEM scratch.
  * **training** (under `jax.grad`, via custom_vjp f_fwd): additionally
    streams out the residuals the backward needs — the padded conv inputs
    h1p/h3dp, the pre-GN2 activation h2, and the four per-(sample,group)
    statistics — so the backward never re-runs conv1 or the GN stats.

The backward reads (x, dout, h1p, h2, stats, h3dp), recomputes only the
cheap pointwise pieces (xhat/pre chains, the dropout mask from the same
counter-based hash seed), runs the 4 gradient convs (2 transposed + 2
weight-grad) as shifted MXU matmuls, and accumulates all weight/affine
gradients into VMEM-resident output blocks across the sequential batch
grid.  dx / per-sample FiLM grads are per-grid-step outputs.

Layout/tiling notes (pallas_guide.md):
  * NHWC; C multiples of 128 are ideal (flagship: 128/256/512/768),
    other C work via Mosaic's internal lane padding.
  * The 3x3 conv is 9 shifted [HW, Cin] @ [Cin, Cout] MXU matmuls over a
    zero-padded [(H+2), (W+2), C] buffer.  dx-shifts cost one sublane
    relayout each (3 per conv); dy-shifts are free 8-aligned row slices of
    the [(H+2)*W, C] view (requires W % 8 == 0 — all shipped presets).
  * Group statistics ride tiny indicator-matrix matmuls ([1,C]@[C,G]).
  * Conv-transpose taps use pre-flipped weight stacks computed outside.

Precision: compute in f32, conv operands in the model dtype (bf16 on
TPU).  The saved h2 residual is stored in the model dtype, so backward
GN2 statistics see bf16-rounded h2 (≤1 ulp activation noise — same order
as the conv accumulation differences vs XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_resblock", "resblock_reference"]


# ---------------------------------------------------------------- helpers

def _group_matrix(c: int, groups: int) -> jax.Array:
    """[C, G] one-hot channel→group indicator (built in-kernel; tiny)."""
    gs = c // groups
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (c_idx // gs == g_idx).astype(jnp.float32)


def _dotf(a, b):
    return jax.lax.dot(a, b, preferred_element_type=jnp.float32)


def _group_stats(xf, m, n_per_group, eps):
    """xf [N, C] f32 → per-channel broadcast (mean_c, rstd_c) [1, C]."""
    s = _dotf(jnp.sum(xf, axis=0, keepdims=True), m)          # [1, G]
    q = _dotf(jnp.sum(xf * xf, axis=0, keepdims=True), m)
    mean = s / n_per_group
    var = q / n_per_group - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return _dotf(mean, m.T), _dotf(rstd, m.T)


def _group_mean(t, m, n_per_group):
    """Per-group mean of t [N, C], broadcast back per-channel [1, C]."""
    return _dotf(_dotf(jnp.sum(t, axis=0, keepdims=True), m) / n_per_group, m.T)


def _conv3x3(pad_ref, w_ref, h, w, cout):
    """pad_ref [(H+2),(W+2),Cin] (borders zero) ⊛ w_ref [9,Cin,Cout]."""
    hw = h * w
    acc = jnp.zeros((hw, cout), jnp.float32)
    for dx in range(3):
        sh = pad_ref[:, dx:dx + w, :].reshape((h + 2) * w, -1)
        for dy in range(3):
            acc += _dotf(sh[dy * w:dy * w + hw], w_ref[dy * 3 + dx])
    return acc


def _conv3x3_wgrad(pad_ref, g, h, w, dw_ref):
    """dW[k] += shifted-conv-input.T @ g for each of the 9 taps
    (pad_ref holds the padded conv INPUT; g [HW, Cout] output-grad)."""
    hw = h * w
    for dx in range(3):
        sh = pad_ref[:, dx:dx + w, :].reshape((h + 2) * w, -1)
        for dy in range(3):
            seg = sh[dy * w:dy * w + hw]
            k = dy * 3 + dx
            dw_ref[k] = dw_ref[k] + jax.lax.dot_general(
                seg, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _silu(z):
    return z * jax.nn.sigmoid(z)


def _dsilu(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


def _dropout_mask(seed_ref, hw, cout, rate):
    """Counter-based keep-mask/(1-rate), regenerated identically in the
    backward (same per-sample seed).  A murmur3-style integer finalizer —
    pure VPU arithmetic, portable to interpret mode (pltpu.prng_* has no
    CPU lowering).  Quality is ample for dropout keep-masks."""
    i = jax.lax.broadcasted_iota(jnp.uint32, (hw, cout), 0)
    j = jax.lax.broadcasted_iota(jnp.uint32, (hw, cout), 1)
    s = (seed_ref[0] + pl.program_id(0)).astype(jnp.uint32)
    z = (i * jnp.uint32(cout) + j) + s * jnp.uint32(2654435761)
    z = z ^ (z >> 16)
    z = z * jnp.uint32(0x7FEB352D)
    z = z ^ (z >> 15)
    z = z * jnp.uint32(0x846CA68B)
    z = z ^ (z >> 16)
    # top 24 bits → [0,1); via int32 (Mosaic has no uint32→f32 cast)
    u = (z >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32) * (1.0 / (1.0 - rate))


def _fill_padded(pad_ref, val, h, w):
    """val [H, W, C] → interior of the grid-persistent scratch pad_ref
    (borders zeroed once at step 0 and never overwritten)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        pad_ref[...] = jnp.zeros(pad_ref.shape, pad_ref.dtype)
    pad_ref[1:h + 1, 1:w + 1, :] = val


# ---------------------------------------------------------------- forward

def _fwd_kernel(seed_ref, x_ref, g1_ref, b1_ref, w1_ref, c1_ref,
                fs_ref, fsh_ref, g2_ref, b2_ref, w2_ref, c2_ref, skw_ref,
                out_ref, h1_ref, h3d_ref, h2_ref, st1m, st1r, st2m, st2r,
                pad1, pad2, *,
                h, w, g_in, g_out, eps, rate, skip_mode, cdtype,
                save_res: bool):
    hw = h * w
    cin = x_ref.shape[-1]
    cout = out_ref.shape[-1]
    m1 = _group_matrix(cin, g_in)
    m2 = _group_matrix(cout, g_out)

    xf = x_ref[0].reshape(hw, cin).astype(jnp.float32)
    mean1, rstd1 = _group_stats(xf, m1, hw * (cin // g_in), eps)
    h1 = _silu((xf - mean1) * rstd1 * g1_ref[...] + b1_ref[...]).astype(cdtype)
    _fill_padded(pad1, h1.reshape(h, w, cin), h, w)

    h2 = _conv3x3(pad1, w1_ref, h, w, cout) + c1_ref[...]
    mean2, rstd2 = _group_stats(h2, m2, hw * (cout // g_out), eps)
    pre = ((h2 - mean2) * rstd2 * g2_ref[...] + b2_ref[...])
    pre = pre * (1.0 + fs_ref[0].astype(jnp.float32)) \
        + fsh_ref[0].astype(jnp.float32)
    h3 = _silu(pre)
    if rate > 0.0:
        h3 = h3 * _dropout_mask(seed_ref, hw, cout, rate)
    h3d = h3.astype(cdtype)
    _fill_padded(pad2, h3d.reshape(h, w, cout), h, w)

    out = _conv3x3(pad2, w2_ref, h, w, cout) + c2_ref[...]
    if skip_mode == "identity":
        out = out + xf
    elif skip_mode == "proj":
        out = out + _dotf(xf.astype(cdtype), skw_ref[...])
    out_ref[0] = out.reshape(h, w, cout).astype(out_ref.dtype)

    if save_res:
        # residuals stream out FLAT ([HW, C] blocks tile cleanly; padded
        # 66-wide buffers as outputs trip Mosaic's sublane alignment) —
        # the backward re-pads them into its own scratch
        h1_ref[0] = h1
        h3d_ref[0] = h3d
        h2_ref[0] = h2.astype(h2_ref.dtype)
        st1m[0] = mean1
        st1r[0] = rstd1
        st2m[0] = mean2
        st2r[0] = rstd2


def _pool2(t, ho, wo, c):
    """[H,W,C] → 2x2 average pool [Ho,Wo,C] (avg_pool parity)."""
    return t.reshape(ho, 2, wo, 2, c).mean(axis=(1, 3))


def _up2(t):
    """[H,W,C] → 2x nearest upsample (broadcast parity)."""
    return jnp.repeat(jnp.repeat(t, 2, axis=0), 2, axis=1)


def _fwd_resample_kernel(seed_ref, x_ref, g1_ref, b1_ref, w1_ref, c1_ref,
                         fs_ref, fsh_ref, g2_ref, b2_ref, w2_ref, c2_ref,
                         out_ref, pad1, pad2, *,
                         hi, wi, resample, g_in, g_out, eps, rate, cdtype):
    """Forward for resblock_updown blocks (up/down=True, identity skip,
    Cin==Cout): GN1+SiLU at input res, nearest-up / avg-pool-down of both
    h and the skip IN-KERNEL, convs at the output resolution.
    Parity: models.layers.ResBlock up/down branches (openaimodel.py
    resblock_updown).  Forward-only — the sampling path; training keeps
    the XLA composition for these blocks (backward fuses better there).
    """
    c = x_ref.shape[-1]
    if resample == "down":
        ho, wo = hi // 2, wi // 2
    else:
        ho, wo = hi * 2, wi * 2
    hwi, hwo = hi * wi, ho * wo
    m1 = _group_matrix(c, g_in)
    m2 = _group_matrix(c, g_out)

    xf = x_ref[0].reshape(hwi, c).astype(jnp.float32)
    mean1, rstd1 = _group_stats(xf, m1, hwi * (c // g_in), eps)
    h1 = _silu((xf - mean1) * rstd1 * g1_ref[...] + b1_ref[...])
    h1g = h1.reshape(hi, wi, c)
    xg = xf.reshape(hi, wi, c)
    if resample == "down":
        h1r = _pool2(h1g, ho, wo, c)
        skip = _pool2(xg, ho, wo, c).reshape(hwo, c)
    else:
        h1r = _up2(h1g)
        skip = _up2(xg).reshape(hwo, c)
    _fill_padded(pad1, h1r.astype(cdtype), ho, wo)

    h2 = _conv3x3(pad1, w1_ref, ho, wo, c) + c1_ref[...]
    mean2, rstd2 = _group_stats(h2, m2, hwo * (c // g_out), eps)
    pre = ((h2 - mean2) * rstd2 * g2_ref[...] + b2_ref[...])
    pre = pre * (1.0 + fs_ref[0].astype(jnp.float32)) \
        + fsh_ref[0].astype(jnp.float32)
    h3 = _silu(pre)
    if rate > 0.0:
        h3 = h3 * _dropout_mask(seed_ref, hwo, c, rate)
    _fill_padded(pad2, h3.astype(cdtype).reshape(ho, wo, c), ho, wo)

    out = _conv3x3(pad2, w2_ref, ho, wo, c) + c2_ref[...] + skip
    out_ref[0] = out.reshape(ho, wo, c).astype(out_ref.dtype)


# ---------------------------------------------------------------- backward

def _bwd_kernel(seed_ref, x_ref, dout_ref, h1_ref, h2_ref,
                st1m, st1r, st2m, st2r,
                g1_ref, b1_ref, fs_ref, fsh_ref, g2_ref, b2_ref,
                h3d_ref, skw_ref, w1t_ref, w2t_ref,
                dx_ref, dg1_ref, db1_ref, dw1_ref, dc1_ref,
                dfs_ref, dfsh_ref, dg2_ref, db2_ref, dw2_ref, dc2_ref,
                dskw_ref, pad_in, padg, *,
                h, w, g_in, g_out, eps, rate, skip_mode, cdtype):
    hw = h * w
    cin = x_ref.shape[-1]
    cout = dout_ref.shape[-1]
    m1 = _group_matrix(cin, g_in)
    m2 = _group_matrix(cout, g_out)
    n1 = hw * (cin // g_in)
    n2 = hw * (cout // g_out)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dg1_ref, db1_ref, dw1_ref, dc1_ref, dg2_ref, db2_ref,
                  dw2_ref, dc2_ref, dskw_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    # ---- cheap pointwise recompute from saved residuals
    xf = x_ref[0].reshape(hw, cin).astype(jnp.float32)
    mean1, rstd1 = st1m[0], st1r[0]
    xhat1 = (xf - mean1) * rstd1
    pre1 = xhat1 * g1_ref[...] + b1_ref[...]
    h2 = h2_ref[0].astype(jnp.float32)
    mean2, rstd2 = st2m[0], st2r[0]
    xhat2 = (h2 - mean2) * rstd2
    gn2 = xhat2 * g2_ref[...] + b2_ref[...]
    fs = fs_ref[0].astype(jnp.float32)
    pre3 = gn2 * (1.0 + fs) + fsh_ref[0].astype(jnp.float32)

    # ---- conv2 backward (input was the saved h3d, re-padded to scratch)
    g = dout_ref[0].reshape(hw, cout).astype(jnp.float32)
    dc2_ref[...] = dc2_ref[...] + jnp.sum(g, axis=0, keepdims=True)
    _fill_padded(padg, h3d_ref[0].reshape(h, w, cout), h, w)
    _conv3x3_wgrad(padg, g, h, w, dw2_ref)
    _fill_padded(padg, g.reshape(h, w, cout).astype(cdtype), h, w)
    dh3d = _conv3x3(padg, w2t_ref, h, w, cout)

    # ---- dropout / SiLU / FiLM / GN2 backward
    if rate > 0.0:
        dh3 = dh3d * _dropout_mask(seed_ref, hw, cout, rate)
    else:
        dh3 = dh3d
    dpre3 = dh3 * _dsilu(pre3)
    dfs_ref[0] = jnp.sum(dpre3 * gn2, axis=0, keepdims=True).astype(
        dfs_ref.dtype)
    dfsh_ref[0] = jnp.sum(dpre3, axis=0, keepdims=True).astype(
        dfsh_ref.dtype)
    dgn2 = dpre3 * (1.0 + fs)
    dg2_ref[...] = dg2_ref[...] + jnp.sum(dgn2 * xhat2, axis=0, keepdims=True)
    db2_ref[...] = db2_ref[...] + jnp.sum(dgn2, axis=0, keepdims=True)
    dxhat2 = dgn2 * g2_ref[...]
    dh2 = rstd2 * (dxhat2 - _group_mean(dxhat2, m2, n2)
                   - xhat2 * _group_mean(dxhat2 * xhat2, m2, n2))

    # ---- conv1 backward (input was the saved h1, re-padded to scratch)
    dc1_ref[...] = dc1_ref[...] + jnp.sum(dh2, axis=0, keepdims=True)
    _fill_padded(pad_in, h1_ref[0].reshape(h, w, cin), h, w)
    _conv3x3_wgrad(pad_in, dh2, h, w, dw1_ref)
    _fill_padded(padg, dh2.reshape(h, w, cout).astype(cdtype), h, w)
    dh1 = _conv3x3(padg, w1t_ref, h, w, cin)

    # ---- SiLU / GN1 backward
    dpre1 = dh1 * _dsilu(pre1)
    dg1_ref[...] = dg1_ref[...] + jnp.sum(dpre1 * xhat1, axis=0, keepdims=True)
    db1_ref[...] = db1_ref[...] + jnp.sum(dpre1, axis=0, keepdims=True)
    dxhat1 = dpre1 * g1_ref[...]
    dx = rstd1 * (dxhat1 - _group_mean(dxhat1, m1, n1)
                  - xhat1 * _group_mean(dxhat1 * xhat1, m1, n1))

    # ---- skip path
    if skip_mode == "identity":
        dx = dx + g
    elif skip_mode == "proj":
        dskw_ref[...] = dskw_ref[...] + jax.lax.dot_general(
            xf.astype(cdtype), g.astype(cdtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx = dx + _dotf(g.astype(cdtype), skw_ref[...].T)
    dx_ref[0] = dx.reshape(h, w, cin).astype(dx_ref.dtype)


# ---------------------------------------------------------------- plumbing

def _vec(v, dtype=None):
    v = v.reshape(1, -1)
    return v if dtype is None else v.astype(dtype)


def _stack_w(w, dtype):
    """[3,3,Cin,Cout] → [9,Cin,Cout] tap stack."""
    return w.reshape(9, w.shape[2], w.shape[3]).astype(dtype)


def _stack_w_flip(w, dtype):
    """Conv-transpose tap stack: out[k=dy*3+dx] = W[2-dy, 2-dx].T
    ([3,3,Cin,Cout] → [9,Cout,Cin])."""
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2).reshape(
        9, w.shape[3], w.shape[2]).astype(dtype)


def _specs(h, w):
    row = lambda c: pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    # per-sample [B,1,C] carrier: the trailing two block dims must equal
    # the array's (Mosaic tiling requirement)
    per_b = lambda c: pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    padded = lambda c: pl.BlockSpec((1, h + 2, w + 2, c),
                                    lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    hwc = lambda c: pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return row, per_b, padded, hwc, full, smem


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),  # sequential: VMEM accumulators
        vmem_limit_bytes=100 * 1024 * 1024,
    )


@functools.lru_cache(maxsize=None)
def _build_resample(g_in, g_out, eps, rate, resample, interpret):
    """Forward-only resample-variant callable (sampling path; no VJP —
    training falls back to the XLA module composition for these blocks)."""

    def fn(x, g1, b1, w1, c1, fs, fsh, g2, b2, w2, c2, seed_f):
        seed = jax.lax.bitcast_convert_type(seed_f, jnp.int32)
        bsz, hi, wi, c = x.shape
        if resample == "down":
            ho, wo = hi // 2, wi // 2
        else:
            ho, wo = hi * 2, wi * 2
        cdtype = x.dtype
        _, per_b, _, _, full, smem = _specs(hi, wi)
        rowi = pl.BlockSpec((1, hi, wi, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        rowo = pl.BlockSpec((1, ho, wo, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        kern = functools.partial(
            _fwd_resample_kernel, hi=hi, wi=wi, resample=resample,
            g_in=g_in, g_out=g_out, eps=eps, rate=rate, cdtype=cdtype,
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((bsz, ho, wo, c), x.dtype),
            grid=(bsz,),
            in_specs=[smem, rowi] + [full] * 4 + [per_b(c)] * 2
            + [full] * 4,
            out_specs=rowo,
            scratch_shapes=[
                pltpu.VMEM((ho + 2, wo + 2, c), cdtype),
                pltpu.VMEM((ho + 2, wo + 2, c), cdtype),
            ],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(
            seed, x, _vec(g1), _vec(b1), _stack_w(w1, cdtype), _vec(c1),
            fs.reshape(bsz, 1, c), fsh.reshape(bsz, 1, c),
            _vec(g2), _vec(b2), _stack_w(w2, cdtype), _vec(c2),
        )

    return fn


@functools.lru_cache(maxsize=None)
def _build(g_in, g_out, eps, rate, skip_mode, interpret):
    """One custom-VJP callable per static config (cached)."""

    def fwd_impl(x, g1, b1, w1, c1, fs, fsh, g2, b2, w2, c2, skw, seed_f,
                 save_res: bool):
        # the dropout seed rides as float32 through custom_vjp (int leaves
        # cannot take a None cotangent) — bitcast back to int32 here
        seed = jax.lax.bitcast_convert_type(seed_f, jnp.int32)
        bsz, h, w, cin = x.shape
        cout = w1.shape[-1]
        cdtype = x.dtype
        row, per_b, padded, hwc, full, smem = _specs(h, w)
        kern = functools.partial(
            _fwd_kernel, h=h, w=w, g_in=g_in, g_out=g_out, eps=eps,
            rate=rate, skip_mode=skip_mode, cdtype=cdtype,
            save_res=save_res,
        )
        skw_in = (jnp.zeros((cin, cout), cdtype) if skip_mode != "proj"
                  else skw.reshape(cin, cout).astype(cdtype))
        f32 = jnp.float32
        if save_res:
            out_shape = (
                jax.ShapeDtypeStruct((bsz, h, w, cout), x.dtype),      # out
                jax.ShapeDtypeStruct((bsz, h * w, cin), cdtype),       # h1
                jax.ShapeDtypeStruct((bsz, h * w, cout), cdtype),      # h3d
                jax.ShapeDtypeStruct((bsz, h * w, cout), cdtype),      # h2
                jax.ShapeDtypeStruct((bsz, 1, cin), f32),              # m1
                jax.ShapeDtypeStruct((bsz, 1, cin), f32),              # r1
                jax.ShapeDtypeStruct((bsz, 1, cout), f32),             # m2
                jax.ShapeDtypeStruct((bsz, 1, cout), f32),             # r2
            )
            out_specs = (row(cout), hwc(cin), hwc(cout), hwc(cout),
                         per_b(cin), per_b(cin), per_b(cout), per_b(cout))
            kernel = kern
        else:
            out_shape = jax.ShapeDtypeStruct((bsz, h, w, cout), x.dtype)
            out_specs = row(cout)

            # map the scratch pads into the save_res=False arg layout
            def kernel(seed_r, x_r, g1_r, b1_r, w1_r, c1_r, fs_r, fsh_r,
                       g2_r, b2_r, w2_r, c2_r, skw_r, out_r, p1, p2):
                kern(seed_r, x_r, g1_r, b1_r, w1_r, c1_r, fs_r, fsh_r,
                     g2_r, b2_r, w2_r, c2_r, skw_r, out_r,
                     None, None, None, None, None, None, None, p1, p2)

        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(bsz,),
            in_specs=[smem, row(cin)] + [full] * 4 + [per_b(cout)] * 2
            + [full] * 4 + [full],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((h + 2, w + 2, cin), cdtype),
                pltpu.VMEM((h + 2, w + 2, cout), cdtype),
            ],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(
            seed, x, _vec(g1), _vec(b1), _stack_w(w1, cdtype), _vec(c1),
            fs.reshape(bsz, 1, cout), fsh.reshape(bsz, 1, cout),
            _vec(g2), _vec(b2), _stack_w(w2, cdtype), _vec(c2),
            skw_in,
        )

    def bwd_impl(res, gout):
        (x, g1, b1, fs, fsh, g2, b2, w1, w2, skw, seed_f,
         h1s, h3ds, h2s, m1s, r1s, m2s, r2s) = res
        seed = jax.lax.bitcast_convert_type(seed_f, jnp.int32)
        bsz, h, w, cin = x.shape
        cout = w1.shape[-1]
        cdtype = x.dtype
        row, per_b, padded, hwc, full, smem = _specs(h, w)
        kern = functools.partial(
            _bwd_kernel, h=h, w=w, g_in=g_in, g_out=g_out, eps=eps,
            rate=rate, skip_mode=skip_mode, cdtype=cdtype,
        )
        acc = lambda shape: pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
        skw_in = (jnp.zeros((cin, cout), cdtype) if skip_mode != "proj"
                  else skw.reshape(cin, cout).astype(cdtype))
        f32 = jnp.float32
        outs = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((bsz, h, w, cin), x.dtype),   # dx
                jax.ShapeDtypeStruct((1, cin), f32),               # dg1
                jax.ShapeDtypeStruct((1, cin), f32),               # db1
                jax.ShapeDtypeStruct((9, cin, cout), f32),         # dw1
                jax.ShapeDtypeStruct((1, cout), f32),              # dc1
                jax.ShapeDtypeStruct((bsz, 1, cout), f32),         # dfs
                jax.ShapeDtypeStruct((bsz, 1, cout), f32),         # dfsh
                jax.ShapeDtypeStruct((1, cout), f32),              # dg2
                jax.ShapeDtypeStruct((1, cout), f32),              # db2
                jax.ShapeDtypeStruct((9, cout, cout), f32),        # dw2
                jax.ShapeDtypeStruct((1, cout), f32),              # dc2
                jax.ShapeDtypeStruct((cin, cout), f32),            # dskw
            ),
            grid=(bsz,),
            in_specs=[smem, row(cin), row(cout), hwc(cin), hwc(cout),
                      per_b(cin), per_b(cin), per_b(cout), per_b(cout)]
            + [full] * 2 + [per_b(cout)] * 2 + [full] * 2
            + [hwc(cout)] + [full] * 3,
            out_specs=(
                row(cin), acc((1, cin)), acc((1, cin)),
                acc((9, cin, cout)), acc((1, cout)),
                per_b(cout), per_b(cout),
                acc((1, cout)), acc((1, cout)), acc((9, cout, cout)),
                acc((1, cout)), acc((cin, cout)),
            ),
            scratch_shapes=[
                pltpu.VMEM((h + 2, w + 2, cin), cdtype),           # pad_in
                pltpu.VMEM((h + 2, w + 2, cout), cdtype),          # padg
            ],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(
            seed, x, gout, h1s, h2s, m1s, r1s, m2s, r2s,
            _vec(g1), _vec(b1),
            fs.reshape(bsz, 1, cout), fsh.reshape(bsz, 1, cout),
            _vec(g2), _vec(b2),
            h3ds, skw_in,
            _stack_w_flip(w1, cdtype), _stack_w_flip(w2, cdtype),
        )
        (dx, dg1, db1, dw1, dc1, dfs, dfsh, dg2, db2, dw2, dc2, dskw) = outs
        dskw_out = (None if skip_mode != "proj"
                    else dskw.reshape(1, 1, cin, cout).astype(skw.dtype))
        dskb_out = None
        if skip_mode == "proj":
            # skip-bias grad = global sum of the cotangent (cheap XLA)
            dskb_out = jnp.sum(
                gout.astype(jnp.float32), axis=(0, 1, 2)).astype(b1.dtype)
        return (
            dx,
            dg1[0].astype(g1.dtype), db1[0].astype(b1.dtype),
            dw1.reshape(3, 3, cin, cout).astype(w1.dtype),
            dc1[0].astype(b1.dtype),
            dfs.reshape(bsz, cout).astype(fs.dtype),
            dfsh.reshape(bsz, cout).astype(fsh.dtype),
            dg2[0].astype(g2.dtype), db2[0].astype(b2.dtype),
            dw2.reshape(3, 3, cout, cout).astype(w2.dtype),
            dc2[0].astype(b1.dtype),
            dskw_out, dskb_out, jnp.zeros((1,), jnp.float32),
        )

    @jax.custom_vjp
    def f(x, g1, b1, w1, c1, fs, fsh, g2, b2, w2, c2, skw, skb, seed_f):
        # primal (inference/sampling) path: NO residual outputs — 2 HBM
        # passes total
        out = fwd_impl(x, g1, b1, w1, c1, fs, fsh, g2, b2, w2, c2, skw,
                       seed_f, save_res=False)
        if skip_mode == "proj" and skb is not None:
            out = out + skb.astype(out.dtype)
        return out

    def f_fwd(x, g1, b1, w1, c1, fs, fsh, g2, b2, w2, c2, skw, skb, seed_f):
        # training path: the same kernel additionally streams the backward
        # residuals to HBM
        (out, h1s, h3ds, h2s, m1s, r1s, m2s, r2s) = fwd_impl(
            x, g1, b1, w1, c1, fs, fsh, g2, b2, w2, c2, skw, seed_f,
            save_res=True,
        )
        if skip_mode == "proj" and skb is not None:
            out = out + skb.astype(out.dtype)
        return out, (x, g1, b1, fs, fsh, g2, b2, w1, w2, skw, seed_f,
                     h1s, h3ds, h2s, m1s, r1s, m2s, r2s)

    def f_bwd(res, gout):
        return bwd_impl(res, gout)

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_resblock(
    x, gn1_scale, gn1_bias, w1, b1, film_scale, film_shift,
    gn2_scale, gn2_bias, w2, b2, skip_w=None, skip_b=None, seed=None,
    *, num_groups: int = 32, eps: float = 1e-5, dropout_rate: float = 0.0,
    resample: str | None = None, interpret: bool | None = None,
):
    """out = skip(x) + conv2(dropout(silu(GN2(conv1(silu(GN1(x))))·FiLM)))

    x [B,H,W,Cin]; w1 [3,3,Cin,Cout]; w2 [3,3,Cout,Cout]; film_* [B,Cout];
    skip_w None (identity skip, Cin==Cout) or [1,1,Cin,Cout] projection.
    seed: int32 [1] dropout seed (required when dropout_rate>0 in training).
    resample 'up'/'down' selects the resblock_updown variant (identity
    skip only; FORWARD-ONLY — no VJP is defined, use for sampling/eval).
    Requires W % 8 == 0 at the conv resolution (dy-slices stay
    sublane-aligned).
    """
    if interpret is None:
        # auto: interpret when the target is not a TPU (CPU tests drive the
        # exact same code path through the Pallas interpreter)
        from ...utils.tpu import on_tpu_target

        interpret = not on_tpu_target()
    bsz, h, w, cin = x.shape
    cout = w1.shape[-1]
    assert film_scale.shape == (bsz, cout), film_scale.shape
    g_in = _gcd_groups(num_groups, cin)
    g_out = _gcd_groups(num_groups, cout)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed_f = jax.lax.bitcast_convert_type(
        jnp.asarray(seed, jnp.int32).reshape(1), jnp.float32)
    if resample is not None:
        assert resample in ("up", "down"), resample
        assert cin == cout and skip_w is None, "resample = identity skip"
        wo = w // 2 if resample == "down" else w * 2
        assert wo % 8 == 0, f"conv width {wo} must be 8-aligned"
        if resample == "down":
            assert h % 2 == 0 and w % 2 == 0, (h, w)
        fn = _build_resample(g_in, g_out, float(eps), float(dropout_rate),
                             resample, bool(interpret))
        return fn(x, gn1_scale, gn1_bias, w1, b1, film_scale, film_shift,
                  gn2_scale, gn2_bias, w2, b2, seed_f)
    assert w % 8 == 0, f"fused_resblock needs W % 8 == 0, got {w}"
    skip_mode = "identity" if skip_w is None else "proj"
    if skip_mode == "identity":
        assert cin == cout, (cin, cout)
    fn = _build(g_in, g_out, float(eps), float(dropout_rate), skip_mode,
                bool(interpret))
    return fn(x, gn1_scale, gn1_bias, w1, b1, film_scale, film_shift,
              gn2_scale, gn2_bias, w2, b2, skip_w, skip_b, seed_f)


def _gcd_groups(num_groups: int, c: int) -> int:
    import math

    return math.gcd(num_groups, c)


# ------------------------------------------------------- XLA reference

def resblock_reference(
    x, gn1_scale, gn1_bias, w1, b1, film_scale, film_shift,
    gn2_scale, gn2_bias, w2, b2, skip_w=None, skip_b=None,
    *, num_groups: int = 32, eps: float = 1e-5, resample: str | None = None,
):
    """Pure-XLA composition (no dropout) for parity tests: mirrors
    models.layers.ResBlock with use_scale_shift_norm, NHWC, f32 GN
    (+ the resblock_updown nearest-up / avg-pool-down variants)."""
    def gn(t, scale, bias, groups):
        b_, h_, w_, c_ = t.shape
        t32 = t.astype(jnp.float32).reshape(b_, h_ * w_, groups, c_ // groups)
        mean = t32.mean(axis=(1, 3), keepdims=True)
        var = t32.var(axis=(1, 3), keepdims=True)
        xn = ((t32 - mean) * jax.lax.rsqrt(var + eps)).reshape(t.shape)
        return xn * scale + bias

    def conv(t, kern, bias):
        # conv in the activation dtype (flax nn.Conv semantics: params cast
        # to the compute dtype; mixed-dtype convs also break the VJP)
        out = jax.lax.conv_general_dilated(
            t, kern.astype(t.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out.astype(jnp.float32) + bias

    cin, cout = w1.shape[2], w1.shape[3]
    g_in = _gcd_groups(num_groups, cin)
    g_out = _gcd_groups(num_groups, cout)
    h1 = jax.nn.silu(gn(x, gn1_scale, gn1_bias, g_in)).astype(x.dtype)
    if resample == "down":
        pool = lambda t: t.reshape(
            t.shape[0], t.shape[1] // 2, 2, t.shape[2] // 2, 2, t.shape[3]
        ).mean(axis=(2, 4)).astype(t.dtype)
        h1, x = pool(h1), pool(x)
    elif resample == "up":
        up = lambda t: jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
        h1, x = up(h1), up(x)
    h2 = conv(h1, w1, b1)
    pre = gn(h2, gn2_scale, gn2_bias, g_out)
    pre = pre * (1.0 + film_scale[:, None, None, :]) \
        + film_shift[:, None, None, :]
    h3 = jax.nn.silu(pre).astype(x.dtype)
    out = conv(h3, w2, b2)
    if skip_w is None:
        skip = x.astype(jnp.float32)
    else:
        skip = jax.lax.conv_general_dilated(
            x, skip_w.astype(x.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
        if skip_b is not None:
            skip = skip + skip_b
    return (skip + out).astype(x.dtype)
