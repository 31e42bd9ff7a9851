"""Fused GEGLU feed-forward as a Pallas TPU kernel.

The transformer FF (LN -> proj_in -> GEGLU -> proj_out -> +residual,
BasicTransformerBlock in gmdx/models/layers.py) is HBM-bound under XLA at
SD-1.5's hot shapes: proj_in writes the (tokens, 8*dim) projection to HBM
(336 MB at 512^2 CFG batch 16), the GEGLU loop fusion reads it back and
writes the (tokens, 4*dim) product, and proj_out reads that again — a
device trace of the dual denoise step put the proj_out fusions alone at
1.4 ms/layer, flagged [HBM] (BENCHNOTES.md round 2). This kernel keeps the
whole chain in VMEM: one grid pass over token blocks with both weight
matrices resident, so HBM traffic drops to read-x + read-residual +
write-out.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * Grid (token_blocks,): x is flattened to (N, C). Weights use constant
    index maps, so Mosaic fetches them once and keeps them in VMEM across
    the sequential grid steps.
  * proj_in's kernel/bias are pre-split OUTSIDE the kernel into the hidden
    and gate halves (diffusers GEGLU column order: [hidden | gate]) — lane
    slicing inside the kernel would need 128-aligned offsets anyway, and
    the outside split is a one-time, fusible copy of <7 MB.
  * fp32 accumulation for both matmuls; the GEGLU product is computed in
    fp32 and cast to the compute dtype only for the second matmul.
  * Exact (erf) GELU, matching the jnp path and torch F.gelu's default —
    parity with diffusers is bit-for-bit in the math, not an approximation.
  * VMEM budget (~16 MB/core) caps the resident-weight design at dim 640:
    dim 320 -> w1 1.6 MB + w2 0.8 MB; dim 640 -> 6.6 + 3.3 MB (block 128
    rows keeps the fp32 intermediates ~1.3 MB each). The UNet's 1280-wide
    blocks (256/64-token grids, where XLA's fusions are compute-bound and
    the intermediates are small) fall back to the jnp path.
  * Training: custom VJP whose backward recomputes the FF through the jnp
    reference — same FLOPs as XLA's own VJP, and the forward stays fused.

Replaces nothing in the reference (its FF runs through torch/cuBLAS); this
is TPU-native performance work on the same math
(gm_diffusion/pipelines/stable_diffusion_gm.py UNet -> diffusers GEGLU).
"""

from __future__ import annotations

import functools
import math
import os

from gmdx.dist.tpctx import active as _tp_active

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SQRT_2 = math.sqrt(2.0)

# dim -> token block. 512 rows at dim 320 (~11.6 MB incl. weights), 128 at
# dim 640 (~14 MB). Dims absent here dispatch to the jnp fallback.
_TOKEN_BLOCK = {320: 512, 640: 128}


def _erf_f32(x: Array) -> Array:
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — below
    bf16 resolution): Mosaic has no erf primitive, but exp lowers natively
    to the VPU."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x: Array) -> Array:
    return 0.5 * x * (1.0 + _erf_f32(x / _SQRT_2))


def _ff_kernel(
    x_ref,  # VMEM (blk, C)
    res_ref,  # VMEM (blk, C)
    w1h_ref,  # VMEM (C, I) hidden half of proj_in
    w1g_ref,  # VMEM (C, I) gate half
    b1h_ref,  # VMEM (1, I)
    b1g_ref,  # VMEM (1, I)
    w2_ref,  # VMEM (I, C)
    b2_ref,  # VMEM (1, C)
    o_ref,  # VMEM (blk, C)
):
    x = x_ref[...]
    hidden = (
        jax.lax.dot_general(
            x, w1h_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1h_ref[...]
    )
    gate = (
        jax.lax.dot_general(
            x, w1g_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1g_ref[...]
    )
    act = (hidden * _gelu_exact(gate)).astype(x.dtype)
    out = (
        jax.lax.dot_general(
            act, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[...]
    )
    o_ref[...] = (res_ref[...].astype(jnp.float32) + out).astype(o_ref.dtype)


def _ff_reference(x, residual, w1, b1, w2, b2):
    """jnp reference: LN already applied by the caller; diffusers GEGLU."""
    proj = (
        jax.lax.dot_general(
            x, w1.astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        )
        + b1.astype(x.dtype)
    )
    hidden, gate = jnp.split(proj, 2, axis=-1)
    act = hidden * jax.nn.gelu(gate, approximate=False)
    out = (
        jax.lax.dot_general(
            act, w2.astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        )
        + b2.astype(x.dtype)
    )
    return residual + out


def _ff_pallas(x, residual, w1, b1, w2, b2, interpret):
    n, c = x.shape
    inner = w2.shape[0]
    blk = _TOKEN_BLOCK[c]
    n_pad = (n + blk - 1) // blk * blk
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        x = jnp.pad(x, pad)
        residual = jnp.pad(residual, pad)

    dtype = x.dtype
    w1h = w1[:, :inner].astype(dtype)
    w1g = w1[:, inner:].astype(dtype)
    b1h = b1[:inner].astype(jnp.float32).reshape(1, inner)
    b1g = b1[inner:].astype(jnp.float32).reshape(1, inner)
    w2c = w2.astype(dtype)
    b2c = b2.astype(jnp.float32).reshape(1, c)

    tok_spec = pl.BlockSpec((blk, c), lambda i: (i, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    out = pl.pallas_call(
        _ff_kernel,
        grid=(n_pad // blk,),
        in_specs=[
            tok_spec,
            tok_spec,
            const((c, inner)),
            const((c, inner)),
            const((1, inner)),
            const((1, inner)),
            const((inner, c)),
            const((1, c)),
        ],
        out_specs=tok_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), dtype),
        interpret=interpret,
    )(x, residual, w1h, w1g, b1h, b1g, w2c, b2c)
    return out[:n] if n_pad != n else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _ff_fused(x, residual, w1, b1, w2, b2, interpret=False):
    b, s, c = x.shape
    out = _ff_pallas(
        x.reshape(b * s, c), residual.reshape(b * s, c),
        w1, b1, w2, b2, interpret,
    )
    return out.reshape(b, s, c)


def _ff_fwd(x, residual, w1, b1, w2, b2, interpret):
    return _ff_fused(x, residual, w1, b1, w2, b2, interpret), (
        x, w1, b1, w2, b2,
    )


def _ff_bwd(interpret, res, g):
    x, w1, b1, w2, b2 = res
    # Recompute through the jnp reference — the FF output was never kept.
    _, vjp = jax.vjp(
        lambda x_, w1_, b1_, w2_, b2_: _ff_reference(
            x_, jnp.zeros((), x_.dtype), w1_, b1_, w2_, b2_
        ),
        x, w1, b1, w2, b2,
    )
    dx, dw1, db1, dw2, db2 = vjp(g)
    return dx, g, dw1, db1, dw2, db2


_ff_fused.defvjp(_ff_fwd, _ff_bwd)


def _ff_ln_kernel(
    x_ref,  # VMEM (blk, C) — PRE-norm input; also the residual
    g_ref,  # VMEM (1, C) LayerNorm scale
    be_ref,  # VMEM (1, C) LayerNorm bias
    w1h_ref,  # VMEM (C, I) hidden half of proj_in
    w1g_ref,  # VMEM (C, I) gate half
    b1h_ref,  # VMEM (1, I)
    b1g_ref,  # VMEM (1, I)
    w2_ref,  # VMEM (I, C)
    b2_ref,  # VMEM (1, C)
    o_ref,  # VMEM (blk, C)
    *,
    eps: float,
):
    """LN -> proj_in -> GEGLU -> proj_out -> +residual, all in VMEM.

    Relative to :func:`_ff_kernel` this also folds the preceding LayerNorm
    (norm3 in the transformer block) in: the normalized activations never
    round-trip HBM, and the residual is the raw input block itself, so the
    chain's HBM traffic is read-x + write-out. LN statistics in fp32 (the
    unfused flax LayerNorm ran them in the compute dtype — bf16 — so the
    kernel is strictly more accurate)."""
    xf = x_ref[...].astype(jnp.float32)
    _ff_ln_body(
        xf, g_ref, be_ref, w1h_ref, w1g_ref, b1h_ref, b1g_ref, w2_ref,
        b2_ref, o_ref, eps,
    )


def _ff_add_ln_kernel(
    x_ref,  # VMEM (blk, C) — transformer hidden state (pre-attn2-residual)
    a_ref,  # VMEM (blk, C) — attn2 output (the pending residual add)
    g_ref,
    be_ref,
    w1h_ref,
    w1g_ref,
    b1h_ref,
    b1g_ref,
    w2_ref,
    b2_ref,
    o_ref,
    *,
    eps: float,
):
    """:func:`_ff_ln_kernel` with the transformer block's attn2 residual
    add folded into the prologue: the summed hidden state (norm3's input
    AND the FF residual) is formed in VMEM and never touches HBM — the
    standalone XLA add pass (plus the layout copy it grew next to the
    attention custom calls, ~0.13 ms/step each in the round-3 trace)
    disappears. The sum is rounded to the compute dtype first, matching
    the unfused `x + attn2` bit-for-bit."""
    s = (
        x_ref[...].astype(jnp.float32) + a_ref[...].astype(jnp.float32)
    ).astype(x_ref.dtype)
    _ff_ln_body(
        s.astype(jnp.float32), g_ref, be_ref, w1h_ref, w1g_ref, b1h_ref,
        b1g_ref, w2_ref, b2_ref, o_ref, eps,
    )


def _ff_ln_body(
    xf, g_ref, be_ref, w1h_ref, w1g_ref, b1h_ref, b1g_ref, w2_ref, b2_ref,
    o_ref, eps,
):
    mean = jnp.mean(xf, axis=1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=1, keepdims=True)
    y = c * jax.lax.rsqrt(var + eps) * g_ref[...] + be_ref[...]
    y = y.astype(o_ref.dtype)
    hidden = (
        jax.lax.dot_general(
            y, w1h_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1h_ref[...]
    )
    gate = (
        jax.lax.dot_general(
            y, w1g_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1g_ref[...]
    )
    act = (hidden * _gelu_exact(gate)).astype(y.dtype)
    out = (
        jax.lax.dot_general(
            act, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[...]
    )
    o_ref[...] = (xf + out).astype(o_ref.dtype)


def _ln_f32(x, gamma, beta, eps):
    """fp32-stat LayerNorm matching the in-kernel math."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    y = c * jax.lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def _ff_ln_reference(x, gamma, beta, w1, b1, w2, b2, eps):
    return _ff_reference(
        _ln_f32(x, gamma, beta, eps), x, w1, b1, w2, b2
    )


def _ff_ln_pallas(x, gamma, beta, w1, b1, w2, b2, eps, interpret, a=None):
    n, c = x.shape
    inner = w2.shape[0]
    blk = _TOKEN_BLOCK[c]
    n_pad = (n + blk - 1) // blk * blk
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        if a is not None:
            a = jnp.pad(a, ((0, n_pad - n), (0, 0)))

    dtype = x.dtype
    w1h = w1[:, :inner].astype(dtype)
    w1g = w1[:, inner:].astype(dtype)
    b1h = b1[:inner].astype(jnp.float32).reshape(1, inner)
    b1g = b1[inner:].astype(jnp.float32).reshape(1, inner)
    w2c = w2.astype(dtype)
    b2c = b2.astype(jnp.float32).reshape(1, c)
    g32 = gamma.astype(jnp.float32).reshape(1, c)
    be32 = beta.astype(jnp.float32).reshape(1, c)

    tok_spec = pl.BlockSpec((blk, c), lambda i: (i, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    kern = _ff_ln_kernel if a is None else _ff_add_ln_kernel
    operands = (x,) if a is None else (x, a)
    out = pl.pallas_call(
        functools.partial(kern, eps=eps),
        grid=(n_pad // blk,),
        in_specs=[tok_spec] * len(operands)
        + [
            const((1, c)),
            const((1, c)),
            const((c, inner)),
            const((c, inner)),
            const((1, inner)),
            const((1, inner)),
            const((inner, c)),
            const((1, c)),
        ],
        out_specs=tok_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), dtype),
        interpret=interpret,
    )(*operands, g32, be32, w1h, w1g, b1h, b1g, w2c, b2c)
    return out[:n] if n_pad != n else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _ff_ln_fused(x, gamma, beta, w1, b1, w2, b2, eps, interpret=False):
    b, s, c = x.shape
    out = _ff_ln_pallas(
        x.reshape(b * s, c), gamma, beta, w1, b1, w2, b2, eps, interpret
    )
    return out.reshape(b, s, c)


def _ff_ln_fwd(x, gamma, beta, w1, b1, w2, b2, eps, interpret):
    return _ff_ln_fused(x, gamma, beta, w1, b1, w2, b2, eps, interpret), (
        x, gamma, beta, w1, b1, w2, b2,
    )


def _ff_ln_bwd(eps, interpret, res, g):
    x, gamma, beta, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda x_, g_, be_, w1_, b1_, w2_, b2_: _ff_ln_reference(
            x_, g_, be_, w1_, b1_, w2_, b2_, eps
        ),
        x, gamma, beta, w1, b1, w2, b2,
    )
    return vjp(g)


_ff_ln_fused.defvjp(_ff_ln_fwd, _ff_ln_bwd)


def _ff_add_ln_reference(x, a, gamma, beta, w1, b1, w2, b2, eps):
    s = (x.astype(jnp.float32) + a.astype(jnp.float32)).astype(x.dtype)
    return _ff_ln_reference(s, gamma, beta, w1, b1, w2, b2, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _ff_add_ln_fused(x, a, gamma, beta, w1, b1, w2, b2, eps, interpret=False):
    b, s, c = x.shape
    out = _ff_ln_pallas(
        x.reshape(b * s, c), gamma, beta, w1, b1, w2, b2, eps, interpret,
        a=a.reshape(b * s, c),
    )
    return out.reshape(b, s, c)


def _ff_add_ln_fwd(x, a, gamma, beta, w1, b1, w2, b2, eps, interpret):
    return _ff_add_ln_fused(
        x, a, gamma, beta, w1, b1, w2, b2, eps, interpret
    ), (x, a, gamma, beta, w1, b1, w2, b2)


def _ff_add_ln_bwd(eps, interpret, res, g):
    x, a, gamma, beta, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda x_, a_, g_, be_, w1_, b1_, w2_, b2_: _ff_add_ln_reference(
            x_, a_, g_, be_, w1_, b1_, w2_, b2_, eps
        ),
        x, a, gamma, beta, w1, b1, w2, b2,
    )
    return vjp(g)


_ff_add_ln_fused.defvjp(_ff_add_ln_fwd, _ff_add_ln_bwd)


def geglu_ff_ln(
    x: Array,
    gamma: Array,
    beta: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    *,
    add: Array | None = None,
    eps: float = 1e-5,
    interpret: bool = False,
) -> Array:
    """x + proj_out(geglu(proj_in(LayerNorm(x)))) over (B, S, C) sequences.

    The fully fused transformer-FF tail: LN, both matmuls, the GEGLU
    product, and the residual add in one VMEM pass — x is read once (it is
    its own residual). ``add`` folds a pending residual into the prologue
    (x := x + add, rounded to the compute dtype — bit-identical to summing
    outside): the transformer block passes attn2's output here so the
    post-attention hidden state never materializes in HBM. Same dispatch
    rules as :func:`geglu_ff`; ``GMDX_FUSED_FF=0`` disables the kernel
    globally."""
    c = x.shape[-1]
    use_pallas = (
        os.environ.get("GMDX_FUSED_FF", "1") == "1"
        and os.environ.get("GMDX_NO_PALLAS", "0") != "1"
        and _tp_active() is None
        and c in _TOKEN_BLOCK
        and w1.shape[1] % 256 == 0
        and (interpret or jax.default_backend() == "tpu")
    )
    if add is None:
        if use_pallas:
            return _ff_ln_fused(
                x, gamma, beta, w1, b1, w2, b2, eps, interpret
            )
        return _ff_ln_reference(x, gamma, beta, w1, b1, w2, b2, eps)
    if use_pallas:
        return _ff_add_ln_fused(
            x, add, gamma, beta, w1, b1, w2, b2, eps, interpret
        )
    return _ff_add_ln_reference(x, add, gamma, beta, w1, b1, w2, b2, eps)


# dim -> token block for the standalone add+LN kernel: no resident
# weights, so blocks are bounded only by the fp32 intermediates
# (~3 passes of blk*C*4 bytes).
_ADDLN_BLOCK = {320: 1024, 640: 512, 1280: 256}


def _add_ln_kernel(
    x_ref,  # VMEM (blk, C) — residual stream
    y_ref,  # VMEM (blk, C) — pending residual add (attn1 output)
    g_ref,  # VMEM (1, C) LayerNorm scale
    be_ref,  # VMEM (1, C) LayerNorm bias
    s_ref,  # VMEM (blk, C) out: x + y (the next residual stream)
    h_ref,  # VMEM (blk, C) out: LayerNorm(x + y)
    *,
    eps: float,
):
    """Fused residual-add + LayerNorm (norm2 in the transformer block).

    XLA keeps the add and the LN as two fusions with the sum round-tripping
    HBM between them (plus a layout copy next to the attention custom
    call); here the sum is formed once in VMEM and both results stream
    out. The sum is rounded to the compute dtype before the statistics —
    bit-identical to the unfused `LN(x + y)`, except the stats themselves
    run in fp32 (the flax LayerNorm ran them in bf16; same upgrade the
    norm3 fold made)."""
    s16 = (
        x_ref[...].astype(jnp.float32) + y_ref[...].astype(jnp.float32)
    ).astype(s_ref.dtype)
    s_ref[...] = s16
    sf = s16.astype(jnp.float32)
    mean = jnp.mean(sf, axis=1, keepdims=True)
    c = sf - mean
    var = jnp.mean(c * c, axis=1, keepdims=True)
    h = c * jax.lax.rsqrt(var + eps) * g_ref[...] + be_ref[...]
    h_ref[...] = h.astype(h_ref.dtype)


def _add_ln_reference(x, y, gamma, beta, eps):
    s = (x.astype(jnp.float32) + y.astype(jnp.float32)).astype(x.dtype)
    return s, _ln_f32(s, gamma, beta, eps)


def _add_ln_pallas(x, y, gamma, beta, eps, interpret):
    n, c = x.shape
    blk = min(_ADDLN_BLOCK[c], (n + 127) // 128 * 128)
    n_pad = (n + blk - 1) // blk * blk
    xp, yp = x, y
    if n_pad != n:
        xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        yp = jnp.pad(y, ((0, n_pad - n), (0, 0)))
    g32 = gamma.astype(jnp.float32).reshape(1, c)
    be32 = beta.astype(jnp.float32).reshape(1, c)
    tok_spec = pl.BlockSpec((blk, c), lambda i: (i, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    s, h = pl.pallas_call(
        functools.partial(_add_ln_kernel, eps=eps),
        grid=(n_pad // blk,),
        in_specs=[tok_spec, tok_spec, const((1, c)), const((1, c))],
        out_specs=[tok_spec, tok_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, c), x.dtype),
            jax.ShapeDtypeStruct((n_pad, c), x.dtype),
        ],
        interpret=interpret,
    )(xp, yp, g32, be32)
    if n_pad != n:
        s, h = s[:n], h[:n]
    return s, h


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _add_ln_fused(x, y, gamma, beta, eps, interpret=False):
    b, sq, c = x.shape
    s, h = _add_ln_pallas(
        x.reshape(b * sq, c), y.reshape(b * sq, c), gamma, beta, eps,
        interpret,
    )
    return s.reshape(b, sq, c), h.reshape(b, sq, c)


def _add_ln_fwd(x, y, gamma, beta, eps, interpret):
    return _add_ln_fused(x, y, gamma, beta, eps, interpret), (
        x, y, gamma, beta,
    )


def _add_ln_bwd(eps, interpret, res, g):
    x, y, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x_, y_, g_, b_: _add_ln_reference(x_, y_, g_, b_, eps),
        x, y, gamma, beta,
    )
    return vjp(g)


_add_ln_fused.defvjp(_add_ln_fwd, _add_ln_bwd)


def add_layer_norm(
    x: Array,
    y: Array,
    gamma: Array,
    beta: Array,
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """(x + y, LayerNorm(x + y)) over (B, S, C) — the attn1-residual /
    norm2 pair of the transformer block, one VMEM pass. Falls back to the
    jnp mirror off-TPU or at dims without a block entry."""
    c = x.shape[-1]
    use_pallas = (
        os.environ.get("GMDX_FUSED_FF", "1") == "1"
        and os.environ.get("GMDX_NO_PALLAS", "0") != "1"
        and _tp_active() is None
        and c in _ADDLN_BLOCK
        and (interpret or jax.default_backend() == "tpu")
    )
    if use_pallas:
        return _add_ln_fused(x, y, gamma, beta, eps, interpret)
    return _add_ln_reference(x, y, gamma, beta, eps)


def geglu_ff(
    x: Array,
    residual: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    *,
    interpret: bool = False,
) -> Array:
    """residual + proj_out(geglu(proj_in(x))) over (B, S, C) sequences.

    Dispatches to the fused Pallas kernel on TPU for the dims with a
    resident-weight VMEM budget (320/640); jnp otherwise.
    ``GMDX_FUSED_FF=0`` disables the kernel globally.
    """
    c = x.shape[-1]
    use_pallas = (
        os.environ.get("GMDX_FUSED_FF", "1") == "1"
        and os.environ.get("GMDX_NO_PALLAS", "0") != "1"
        and _tp_active() is None
        and c in _TOKEN_BLOCK
        and w1.shape[1] % 256 == 0  # even split into 128-aligned halves
        and (interpret or jax.default_backend() == "tpu")
    )
    if use_pallas:
        return _ff_fused(x, residual, w1, b1, w2, b2, interpret)
    return _ff_reference(x, residual, w1, b1, w2, b2)


__all__ = ["geglu_ff", "geglu_ff_ln"]
