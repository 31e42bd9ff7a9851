"""Fused GroupNorm + SiLU as a Pallas TPU kernel.

GroupNorm(32, eps) → SiLU opens every resnet block (gmdx/models/layers.py
ResnetBlock2D; reference pins GroupNorm(32, 1e-5) + SiLU, SURVEY.md §2.2).
The jnp path computes statistics in fp32 with separate normalize and
activation steps; this kernel does one read + one write per element with
the stats, affine, and SiLU fused, fp32 statistics regardless of input
dtype.

Layout: x is NHWC flattened to (B, HW, C); channels are contiguous in the
lane dimension so a (1, blk_hw, C) VMEM block sees every group. The grid is
(B, n_hw_blocks) with the HW dimension 'arbitrary' (sequential): pass 1
accumulates per-group sum/sumsq into SMEM scratch across HW blocks — but
that needs the stats BEFORE writing any output, so the kernel runs the grid
twice via two pallas_calls sharing one implementation:

  * stats kernel:  x -> (B, G, 2) group sums (fp32)
  * apply kernel:  (x, mean, rstd, scale, bias) -> silu(norm(x))

Two reads + one write total — the same HBM traffic as XLA's fused reduce +
elementwise, minus the intermediate materializations; the win is bounded
but real at VAE-decoder activation sizes (512×512×512 fp32 = 0.5 GB).

Falls back to None (caller uses jnp) for shapes that do not tile cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# One-hot group reductions/broadcasts are tiny row-vector matmuls; run
# them at exact fp32 MXU precision (default bf16 passes cost ~2.6e-3 rel
# error in the stats for zero measurable speed win at these shapes).
_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _group_onehot(c: int, num_groups: int) -> jnp.ndarray:
    """(C, G) one-hot channel->group matrix. Group reductions become MXU
    matmuls — Mosaic's vector layout inference rejects the (hw, G, gs) 3-D
    reshape for some channel counts, and the matmul is faster anyway."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    return (ch // (c // num_groups) == grp).astype(jnp.float32)


def _stats_kernel(x_ref, out_ref, acc_ref, *, num_groups: int, gsize: int):
    """Accumulate per-group (sum, sumsq) over sequential HW blocks."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)  # (blk_hw, C)
    onehot = _group_onehot(x.shape[1], num_groups)
    colsum = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    colsq = jnp.sum(x * x, axis=0, keepdims=True)
    acc_ref[0:1, :] += jnp.dot(
        colsum, onehot, preferred_element_type=jnp.float32, precision=_HI,
    )
    acc_ref[1:2, :] += jnp.dot(
        colsq, onehot, preferred_element_type=jnp.float32, precision=_HI
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _finish():
        out_ref[0] = acc_ref[:]


def _apply_kernel(
    x_ref, stats_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
    gsize: int, n_elems: int, eps: float, activate: bool
):
    x = x_ref[0].astype(jnp.float32)  # (blk_hw, C)
    blk_hw, c = x.shape
    s = stats_ref[0]  # (2, G) fp32
    mean = s[0:1] / n_elems  # (1, G)
    var = s[1:2] / n_elems - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    # Broadcast group stats to channels via the one-hot (G -> C) matmul.
    onehot_t = _group_onehot(c, mean.shape[-1]).T  # (G, C)
    mean_c = jnp.dot(mean, onehot_t, precision=_HI,
                     preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd, onehot_t, precision=_HI,
                     preferred_element_type=jnp.float32)
    y = (x - mean_c) * rstd_c
    y = y * scale_ref[0].astype(jnp.float32)[None, :] + (
        bias_ref[0].astype(jnp.float32)[None, :]
    )
    if activate:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_blk_hw(hw: int, c: int, itemsize: int) -> int:
    """Largest HW block (multiple of 8) whose VMEM working set stays small."""
    # Sized so the fp32 compute copies (x cast + y, ~4x a bf16 block) plus
    # double-buffered in/out blocks stay within the ~16 MB VMEM budget —
    # 4 MB blocks OOM'd at (8, 4096, 640) bf16 (19.98 MB scoped allocation).
    budget = 1024 * 1024  # bytes for the x block in its input dtype
    blk = max(8, min(hw, budget // max(c * itemsize, 1)))
    blk = (blk // 8) * 8
    while blk > 8 and hw % blk != 0:
        blk -= 8
    return blk


def _gn_silu_reference(x, scale, bias, num_groups, eps, activate):
    """jnp mirror (fp32 stats) — the backward-pass recompute target."""
    sh = x.shape
    c = sh[-1]
    xf = x.astype(jnp.float32)
    xg = xf.reshape(sh[:-1] + (num_groups, c // num_groups))
    ax = tuple(range(1, xf.ndim - 1)) + (xf.ndim,)
    mean = xg.mean(axis=ax, keepdims=True)
    var = xg.var(axis=ax, keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(sh)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if activate:
        y = jax.nn.silu(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _gn_silu_pallas(
    x, scale, bias, num_groups, eps, activate, interpret, pad_output=False
):
    out, _stats = _gn_forward(
        x, scale, bias, num_groups, eps, activate, interpret,
        pad_output=pad_output,
    )
    return out


def _gn_fwd(x, scale, bias, num_groups, eps, activate, interpret, pad_output):
    out, stats = _gn_forward(
        x, scale, bias, num_groups, eps, activate, interpret,
        pad_output=pad_output,
    )
    return out, (x, scale, bias, stats)


def _gn_bwd(num_groups, eps, activate, interpret, pad_output, res, g):
    x, scale, bias, stats = res
    import os

    if pad_output:
        # The padded border is constant zero: its cotangent does not flow.
        g = g[:, 1:-1, 1:-1, :]
    if os.environ.get("GMDX_FUSED_GN_BWD", "1") == "0":
        # XLA recompute fallback: differentiate the jnp mirror.
        _, vjp = jax.vjp(
            lambda x_, s_, b_: _gn_silu_reference(
                x_, s_, b_, num_groups, eps, activate
            ),
            x, scale, bias,
        )
        return vjp(g)
    return _gn_backward(
        x, scale, bias, stats, g, num_groups, eps, activate, interpret
    )


_gn_silu_pallas.defvjp(_gn_fwd, _gn_bwd)


def _gn_bwd_compute_dy(x, g, stats_ref, scale_ref, bias_ref, num_groups,
                       n_elems, eps, activate):
    """Shared bwd prologue: recompute xhat and dL/dy from the saved stats.

    Returns (xhat, dY, rstd_c) — all (blk_hw, C) fp32.
    """
    c = x.shape[1]
    s = stats_ref[0]  # (2, G) fp32 group (sum, sumsq)
    mean = s[0:1] / n_elems
    var = s[1:2] / n_elems - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    onehot_t = _group_onehot(c, mean.shape[-1]).T  # (G, C)
    mean_c = jnp.dot(mean, onehot_t, precision=_HI,
                     preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd, onehot_t, precision=_HI,
                     preferred_element_type=jnp.float32)
    xhat = (x - mean_c) * rstd_c
    if activate:
        y = xhat * scale_ref[0].astype(jnp.float32)[None, :] + (
            bias_ref[0].astype(jnp.float32)[None, :]
        )
        sig = jax.nn.sigmoid(y)
        dy = g * sig * (1.0 + y * (1.0 - sig))  # d silu(y) / dy
    else:
        dy = g
    return xhat, dy, rstd_c


def _gn_bwd_reduce_kernel(
    x_ref, g_ref, stats_ref, scale_ref, bias_ref,
    tg_ref,  # out (1, 2, G): per-group sums of dxhat, dxhat*xhat
    tc_ref,  # out (1, 2, C): per-batch dbeta / dgamma partials
    accg_scr, accc_scr,
    *, num_groups: int, n_elems: int, eps: float, activate: bool,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        accg_scr[:] = jnp.zeros_like(accg_scr)
        accc_scr[:] = jnp.zeros_like(accc_scr)

    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    xhat, dy, _rstd_c = _gn_bwd_compute_dy(
        x, g, stats_ref, scale_ref, bias_ref, num_groups, n_elems, eps,
        activate,
    )
    accc_scr[0:1, :] += jnp.sum(dy, axis=0, keepdims=True)  # dbeta
    accc_scr[1:2, :] += jnp.sum(dy * xhat, axis=0, keepdims=True)  # dgamma
    dxhat = dy * scale_ref[0].astype(jnp.float32)[None, :]
    onehot = _group_onehot(x.shape[1], num_groups)
    accg_scr[0:1, :] += jnp.dot(
        jnp.sum(dxhat, axis=0, keepdims=True), onehot,
        preferred_element_type=jnp.float32, precision=_HI,
    )
    accg_scr[1:2, :] += jnp.dot(
        jnp.sum(dxhat * xhat, axis=0, keepdims=True), onehot,
        preferred_element_type=jnp.float32, precision=_HI,
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _finish():
        tg_ref[0] = accg_scr[:]
        tc_ref[0] = accc_scr[:]


def _gn_bwd_apply_kernel(
    x_ref, g_ref, stats_ref, scale_ref, bias_ref, tg_ref, dx_ref,
    *, num_groups: int, n_elems: int, eps: float, activate: bool,
):
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    xhat, dy, rstd_c = _gn_bwd_compute_dy(
        x, g, stats_ref, scale_ref, bias_ref, num_groups, n_elems, eps,
        activate,
    )
    dxhat = dy * scale_ref[0].astype(jnp.float32)[None, :]
    t = tg_ref[0]  # (2, G)
    onehot_t = _group_onehot(x.shape[1], num_groups).T
    m1 = jnp.dot(t[0:1] / n_elems, onehot_t,
                 preferred_element_type=jnp.float32,
                 precision=_HI)  # mean(dxhat) per ch
    m2 = jnp.dot(t[1:2] / n_elems, onehot_t,
                 preferred_element_type=jnp.float32,
                 precision=_HI)  # mean(dxhat*xhat)
    dx = rstd_c * (dxhat - m1 - xhat * m2)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _gn_backward(x, scale, bias, stats, g, num_groups, eps, activate,
                 interpret):
    """Two-pass Pallas backward sharing the forward's saved group stats."""
    b, h, w, c = x.shape
    hw = h * w
    gsize = c // num_groups
    n_elems = hw * gsize
    blk_hw = _pick_blk_hw(hw, c, x.dtype.itemsize)
    n_blk = hw // blk_hw
    xf = x.reshape(b, hw, c)
    gf = g.reshape(b, hw, c)
    scale2 = scale.reshape(1, c)
    bias2 = bias.reshape(1, c)

    x_spec = pl.BlockSpec((1, blk_hw, c), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((1, 2, num_groups), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    ch_spec = pl.BlockSpec((1, c), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    common = dict(num_groups=num_groups, n_elems=n_elems, eps=eps,
                  activate=activate)

    tg, tc = pl.pallas_call(
        functools.partial(_gn_bwd_reduce_kernel, **common),
        grid=(b, n_blk),
        in_specs=[x_spec, x_spec, stats_spec, ch_spec, ch_spec],
        out_specs=[
            pl.BlockSpec((1, 2, num_groups), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2, num_groups), jnp.float32),
            jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, num_groups), jnp.float32),
            pltpu.VMEM((2, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xf, gf, stats, scale2, bias2)

    dx = pl.pallas_call(
        functools.partial(_gn_bwd_apply_kernel, **common),
        grid=(b, n_blk),
        in_specs=[x_spec, x_spec, stats_spec, ch_spec, ch_spec,
                  pl.BlockSpec((1, 2, num_groups), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xf, gf, stats, scale2, bias2, tg)

    dscale = jnp.sum(tc[:, 1, :], axis=0).astype(scale.dtype)
    dbias = jnp.sum(tc[:, 0, :], axis=0).astype(bias.dtype)
    return dx.reshape(b, h, w, c), dscale, dbias


def fused_group_norm_silu(
    x: Array,  # (B, H, W, C) NHWC
    scale: Array,  # (C,)
    bias: Array,  # (C,)
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    activate: bool = True,
    interpret: bool = False,
    pad_output: bool = False,
):
    """Fused GN(+SiLU) over NHWC. Returns None when the shape doesn't tile
    (caller falls back to the jnp path). Differentiable: forward runs the
    Pallas kernels, backward recomputes through the jnp mirror.

    ``pad_output=True`` writes the 1-px zero-padded image (B, H+2, W+2, C)
    — the exact input of a following 3x3 SAME conv (the Winograd kernel
    consumes it directly, skipping the XLA pad pass). Callers should gate
    on :func:`gn_onepass_eligible`."""
    if x.ndim != 4:
        return None
    b, h, w, c = x.shape
    hw = h * w
    # The channel axis always spans the full block (last block dim == array
    # dim is legal at any size — Mosaic lane-pads internally), so c needs no
    # 128 alignment; SD-1.5's 320-channel level matters (it covers the
    # largest 64x64 activations).
    if c % num_groups != 0 or hw % 8 != 0:
        return None
    return _gn_silu_pallas(
        x, scale, bias, num_groups, eps, activate, interpret, pad_output
    )


def _gn_onepass_kernel(
    x_ref,  # VMEM (1, hw, C) — one full image
    scale_ref,  # VMEM (1, C)
    bias_ref,  # VMEM (1, C)
    o_ref,  # VMEM (1, hw, C)
    stats_ref,  # VMEM (1, 2, G) group (sum, sumsq) — backward residual
    *,
    num_groups: int,
    n_elems: int,
    eps: float,
    activate: bool,
):
    """Single-pass GN(+SiLU) when a whole image's activations fit VMEM:
    one HBM read + one write, vs the blocked kernels' two reads + one write.
    All SD-1.5 UNet activation shapes qualify (64x64x320 bf16 = 2.6 MB)."""
    x = x_ref[0].astype(jnp.float32)  # (hw, C)
    y, stats = _gn_onepass_math(
        x, scale_ref, bias_ref, num_groups, n_elems, eps, activate
    )
    o_ref[0] = y.astype(o_ref.dtype)
    stats_ref[0] = stats


def _gn_onepass_math(x, scale_ref, bias_ref, num_groups, n_elems, eps,
                     activate):
    """Shared one-pass GN math over a flat (hw, C) fp32 image."""
    c = x.shape[1]
    onehot = _group_onehot(c, num_groups)
    colsum = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    colsq = jnp.sum(x * x, axis=0, keepdims=True)
    gsum = jnp.dot(colsum, onehot, precision=_HI,
                   preferred_element_type=jnp.float32)
    gsq = jnp.dot(colsq, onehot, precision=_HI,
                  preferred_element_type=jnp.float32)
    mean = gsum / n_elems  # (1, G)
    var = gsq / n_elems - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    onehot_t = onehot.T  # (G, C)
    mean_c = jnp.dot(mean, onehot_t, precision=_HI,
                     preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd, onehot_t, precision=_HI,
                     preferred_element_type=jnp.float32)
    y = (x - mean_c) * rstd_c
    y = y * scale_ref[0].astype(jnp.float32)[None, :] + (
        bias_ref[0].astype(jnp.float32)[None, :]
    )
    if activate:
        y = y * jax.nn.sigmoid(y)
    return y, jnp.concatenate([gsum, gsq], axis=0)


def _gn_onepass_pad_kernel(
    x_ref,  # VMEM (1, H, W, C) — one full image, 4D
    scale_ref,  # VMEM (1, C)
    bias_ref,  # VMEM (1, C)
    o_ref,  # VMEM (1, H+2, W+2, C) — zero-bordered padded output
    stats_ref,  # VMEM (1, 2, G)
    *,
    num_groups: int,
    n_elems: int,
    eps: float,
    activate: bool,
    h: int,
    w: int,
):
    """One-pass GN(+SiLU) that writes the 1-px ZERO-PADDED image — the
    exact input of a following 3x3 SAME conv. Feeding the Winograd conv
    kernel this way deletes the XLA pad pass between GN and conv (those
    pad/reshape materializations measured ~2.5% of the dual step,
    BENCHNOTES.md). The pad is VMEM concats: rows on the untiled dim,
    columns a sublane shift."""
    c = x_ref.shape[3]
    x = x_ref[0].reshape(h * w, c).astype(jnp.float32)  # free leading merge
    y, stats = _gn_onepass_math(
        x, scale_ref, bias_ref, num_groups, n_elems, eps, activate
    )
    y = y.astype(o_ref.dtype).reshape(h, w, c)
    zrow = jnp.zeros((1, w, c), o_ref.dtype)
    y = jnp.concatenate([zrow, y, zrow], axis=0)  # (h+2, w, c)
    zcol = jnp.zeros((h + 2, 1, c), o_ref.dtype)
    o_ref[0] = jnp.concatenate([zcol, y, zcol], axis=1)
    stats_ref[0] = stats


# Whole-image VMEM budget for the one-pass kernel: the input block in its
# own dtype. The fp32 compute copy and the output block roughly 5x this;
# 8 MB (~45 MB scoped incl. the raised vmem_limit) covers every SD-1.5
# UNet activation shape at 512^2 — including the 64x64x960 concat resnet
# inputs — plus the VAE's 64x64 mid blocks, while the VAE decode tail
# (128x128x512 = 16 MB and up) keeps the blocked path.
_ONEPASS_BUDGET = 8 * 1024 * 1024


def gn_onepass_eligible(shape, itemsize: int, num_groups: int = 32) -> bool:
    """Whether fused_group_norm_silu would take the one-pass path (and so
    supports ``pad_output``) for an NHWC shape."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    hw = h * w
    if c % num_groups or hw % 8:
        return False
    return hw * c * itemsize <= _ONEPASS_BUDGET


def _gn_forward(x, scale, bias, num_groups, eps, activate, interpret,
                pad_output=False):
    b, h, w, c = x.shape
    hw = h * w
    gsize = c // num_groups
    xf = x.reshape(b, hw, c)

    if pad_output:
        if not gn_onepass_eligible(x.shape, x.dtype.itemsize, num_groups):
            # Safety fallback (callers gate on gn_onepass_eligible): plain
            # GN + an XLA pad — the status-quo cost.
            out, stats = _gn_forward(
                x, scale, bias, num_groups, eps, activate, interpret
            )
            return jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0))), stats
        out, stats = pl.pallas_call(
            functools.partial(
                _gn_onepass_pad_kernel, num_groups=num_groups,
                n_elems=hw * gsize, eps=eps, activate=activate, h=h, w=w,
            ),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, h + 2, w + 2, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, num_groups), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h + 2, w + 2, c), x.dtype),
                jax.ShapeDtypeStruct((b, 2, num_groups), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(x, scale.reshape(1, c), bias.reshape(1, c))
        return out, stats

    if hw * c * x.dtype.itemsize <= _ONEPASS_BUDGET:
        out, stats = pl.pallas_call(
            functools.partial(
                _gn_onepass_kernel, num_groups=num_groups,
                n_elems=hw * gsize, eps=eps, activate=activate,
            ),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, num_groups), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, hw, c), x.dtype),
                jax.ShapeDtypeStruct((b, 2, num_groups), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                # The fp32 compute copies of a whole 4 MB image block (x
                # cast, x*x, y) put the transient stack past the 16 MB
                # default scoped limit (24 MB at the VAE's 64x64x512 bf16
                # mid blocks) but well within physical VMEM — same
                # rationale as the head-packed flash kernel.
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xf, scale.reshape(1, c), bias.reshape(1, c))
        return out.reshape(b, h, w, c), stats

    blk_hw = _pick_blk_hw(hw, c, x.dtype.itemsize)
    n_blk = hw // blk_hw

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, num_groups=num_groups, gsize=gsize),
        grid=(b, n_blk),
        in_specs=[
            pl.BlockSpec((1, blk_hw, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, num_groups), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, num_groups), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, num_groups), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xf)

    out = pl.pallas_call(
        functools.partial(
            _apply_kernel, num_groups=num_groups, gsize=gsize,
            n_elems=hw * gsize, eps=eps, activate=activate,
        ),
        grid=(b, n_blk),
        in_specs=[
            pl.BlockSpec((1, blk_hw, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, num_groups), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_hw, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xf, stats, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(b, h, w, c), stats


def _group_onehot_parity(c: int, num_groups: int) -> jnp.ndarray:
    """(2C, G) one-hot for the parity-in-lanes lane dim [q0 chans | q1
    chans]: lane q*C+ch belongs to ch's group."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (2 * c, num_groups), 0) % c
    grp = jax.lax.broadcasted_iota(jnp.int32, (2 * c, num_groups), 1)
    return (ch // (c // num_groups) == grp).astype(jnp.float32)


def _gn_parity_pad_kernel(
    x_ref,  # VMEM (1, T, 2, Tc, 2C) — one image, Winograd parity layout
    scale_ref,  # VMEM (1, 2C) — channel scale TILED x2 (parity lanes)
    bias_ref,  # VMEM (1, 2C)
    temb_ref,  # VMEM (1, 1, 2C) — per-image temb proj tiled x2 (or zeros)
    o_ref,  # VMEM (1, T+1, 2, Tc+1, 2C) — padded parity layout
    *,
    num_groups: int,
    n_elems: int,
    eps: float,
    activate: bool,
    t: int,
    tc: int,
    c: int,
    add_temb: bool,
):
    """One-pass GN(+SiLU) over the Winograd parity-in-lanes layout,
    emitting the 1-px zero-bordered PADDED parity layout the Winograd
    kernel's ``parity_in`` path consumes. With ``add_temb`` the resnet
    time-embedding bias is added BEFORE the statistics (the chain is
    conv1 -> +temb -> GN2 -> conv2), folding the elementwise temb pass
    into this kernel. The whole resnet tail then never leaves the parity
    layout — no XLA retile copies (those measured ~4.3% of the dual
    denoise step, BENCHNOTES.md round 2).

    Padded-parity construction: target phase (p', q') of the padded image
    maps to source phase (1-p', 1-q') shifted by one tile row/column —
    every write is a full-block store of VMEM concats (rows on an untiled
    dim, columns a sublane concat, channels a lane slice), no strided ops.
    """
    x = x_ref[0].astype(jnp.float32)  # (T, 2, Tc, 2C)
    if add_temb:
        x = x + temb_ref[0, 0].astype(jnp.float32)
    xf = x.reshape(t * 2 * tc, 2 * c)  # free: merges untiled/sublane dims

    onehot = _group_onehot_parity(c, num_groups)
    colsum = jnp.sum(xf, axis=0, keepdims=True)  # (1, 2C)
    colsq = jnp.sum(xf * xf, axis=0, keepdims=True)
    gsum = jnp.dot(colsum, onehot, precision=_HI,
                   preferred_element_type=jnp.float32)
    gsq = jnp.dot(colsq, onehot, precision=_HI,
                  preferred_element_type=jnp.float32)
    mean = gsum / n_elems  # (1, G)
    var = gsq / n_elems - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    onehot_t = onehot.T  # (G, 2C)
    mean_c = jnp.dot(mean, onehot_t, precision=_HI,
                     preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd, onehot_t, precision=_HI,
                     preferred_element_type=jnp.float32)
    y = (xf - mean_c) * rstd_c
    y = y * scale_ref[0].astype(jnp.float32)[None, :] + (
        bias_ref[0].astype(jnp.float32)[None, :]
    )
    if activate:
        y = y * jax.nn.sigmoid(y)
    y = y.reshape(t, 2, tc, 2 * c)  # fp32: tpu.dynamic_rotate is 32-bit-only

    # Padded write: o[a', p', b', q'*C+ch] = y[2a'+p'-1, 2b'+q'-1, ch]
    # (image coords), i.e. source parity (1-p', 1-q') with a leading zero
    # row/col for p'=0/q'=0 and a trailing one for p'=1/q'=1.
    #
    # Column construction stays FULL lane width throughout: a lane slice at
    # C (offset C mod 128, e.g. 64 for SD's 320-channel level) cannot feed
    # tpu.concatenate ("offset mismatch on non-concat dimension"). Instead
    # build lead = [0|y] and trail = [y|0] sublane concats (both offset-0),
    # pick trail for the q=0 lane half / lead for the q=1 half with a
    # lane-iota select, and swap the halves with one pltpu.roll(C): the
    # rolled lanes are exactly [q'=0 <- q1-led | q'=1 <- q0-trailed].
    zrow = jnp.zeros((1, tc + 1, 2 * c), o_ref.dtype)
    zcol = jnp.zeros((t, 1, 2 * c), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, tc + 1, 2 * c), 2)

    def _plane(src):  # (T, Tc, 2C) fp32 -> (T, Tc+1, 2C), target phase pair
        lead = jnp.concatenate([zcol, src], axis=1)
        trail = jnp.concatenate([src, zcol], axis=1)
        rolled = pltpu.roll(jnp.where(lane < c, trail, lead), c, axis=2)
        return rolled.astype(o_ref.dtype)

    # Source row parity 1 feeds target p'=0 (leading zero row) and parity 0
    # feeds p'=1 (trailing zero row); the row concat is on an untiled dim.
    o_ref[0, :, 0] = jnp.concatenate([zrow, _plane(y[:, 1])], axis=0)
    o_ref[0, :, 1] = jnp.concatenate([_plane(y[:, 0]), zrow], axis=0)


def _parity_gn_mirror(x5, scale, bias, temb, num_groups, eps, activate):
    """jnp twin of the parity GN kernel (backward recompute target): parity
    -> NHWC -> (+temb) -> GN(+SiLU) -> 1-px pad -> padded parity."""
    b, t, _, tc, c2 = x5.shape
    c = c2 // 2
    x = x5.reshape(b, 2 * t, 2 * tc, c)
    if temb is not None:
        x = x + temb[:, None, None, :].astype(x.dtype)
    y = _gn_silu_reference(x, scale, bias, num_groups, eps, activate)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return yp.reshape(b, t + 1, 2, tc + 1, 2 * c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _parity_gn_pallas(
    x5, scale, bias, temb, num_groups, eps, activate, interpret, add_temb
):
    b, t, _, tc, c2 = x5.shape
    c = c2 // 2
    n_elems = (2 * t) * (2 * tc) * (c // num_groups)
    scale2 = jnp.tile(scale, 2).reshape(1, 2 * c)
    bias2 = jnp.tile(bias, 2).reshape(1, 2 * c)
    if add_temb:
        temb2 = jnp.concatenate(
            [temb, temb], axis=-1
        ).astype(x5.dtype).reshape(b, 1, 2 * c)
    else:
        temb2 = jnp.zeros((b, 1, 2 * c), x5.dtype)
    out = pl.pallas_call(
        functools.partial(
            _gn_parity_pad_kernel, num_groups=num_groups, n_elems=n_elems,
            eps=eps, activate=activate, t=t, tc=tc, c=c, add_temb=add_temb,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, 2, tc, 2 * c), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t + 1, 2, tc + 1, 2 * c), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, t + 1, 2, tc + 1, 2 * c), x5.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x5, scale2, bias2, temb2)
    return out


def _parity_gn_fwd(
    x5, scale, bias, temb, num_groups, eps, activate, interpret, add_temb
):
    out = _parity_gn_pallas(
        x5, scale, bias, temb, num_groups, eps, activate, interpret,
        add_temb,
    )
    return out, (x5, scale, bias, temb)


def _parity_gn_bwd(num_groups, eps, activate, interpret, add_temb, res, g):
    x5, scale, bias, temb = res
    if add_temb:
        _, vjp = jax.vjp(
            lambda x_, s_, b_, t_: _parity_gn_mirror(
                x_, s_, b_, t_, num_groups, eps, activate
            ),
            x5, scale, bias, temb,
        )
        return vjp(g)
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _parity_gn_mirror(
            x_, s_, b_, None, num_groups, eps, activate
        ),
        x5, scale, bias,
    )
    dx, ds, db = vjp(g)
    return dx, ds, db, None


_parity_gn_pallas.defvjp(_parity_gn_fwd, _parity_gn_bwd)


def parity_gn_pad_silu(
    x5: Array,  # (B, T, 2, Tc, 2C) — Winograd parity-in-lanes layout
    scale: Array,  # (C,)
    bias: Array,  # (C,)
    temb: Array | None = None,  # (B, C) — added BEFORE the statistics
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    activate: bool = True,
    interpret: bool = False,
):
    """Fused (+temb) -> GroupNorm -> SiLU over the Winograd parity-5D
    layout, emitting the PADDED parity layout (B, T+1, 2, Tc+1, 2C) that
    ``winograd_conv3x3(parity_in=True)`` consumes. The resnet tail
    conv1 -> +temb -> GN2 -> conv2 stays in one physical layout end to
    end — no XLA retiles and no separate temb elementwise pass.

    Returns None when ineligible (caller falls back to the NHWC path).
    Differentiable: backward recomputes through the jnp mirror.
    """
    if x5.ndim != 5 or x5.shape[2] != 2:
        return None
    b, t, _, tc, c2 = x5.shape
    c = c2 // 2
    if c % num_groups:
        return None
    # Same whole-image VMEM budget as the one-pass NHWC kernel.
    if (2 * t) * (2 * tc) * c * x5.dtype.itemsize > _ONEPASS_BUDGET:
        return None
    if jax.default_backend() != "tpu" and not interpret:
        return None
    return _parity_gn_pallas(
        x5, scale, bias, temb, num_groups, eps, activate, interpret,
        temb is not None,
    )


__all__ = [
    "fused_group_norm_silu",
    "gn_onepass_eligible",
    "parity_gn_pad_silu",
]
