"""Shared UNet/VAE building blocks (flax.linen, NHWC).

Architecture parity targets the SD-1.5 component zoo the reference pins
(reference scripts/inference/generate_hdr.py:115-135: GroupNorm(32, 1e-5),
SiLU, cross_attention_dim 768, attention_head_dim 8 == 8 heads) while the
implementation is TPU-idiomatic: NHWC convs, attention through the
gmdx.kernels dispatch (Pallas flash kernel on TPU), fp32 softmax/GroupNorm
statistics under bf16 compute.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gmdx.dist.tpctx import active as _tp_active
from gmdx.kernels import dot_product_attention
from gmdx.kernels.attention import attention_packed

Array = jax.Array


def timestep_embedding(
    timesteps: Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> Array:
    """Sinusoidal timestep embedding (diffusers convention for SD-1.5:
    flip_sin_to_cos=True, freq_shift=0)."""
    timesteps = jnp.atleast_1d(timesteps)
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP lifting the sinusoid to the UNet's temb width."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_sinusoid: Array) -> Array:
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(t_sinusoid)
        x = nn.silu(x)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)


class _GNScaleBias(nn.Module):
    """Param holder keeping the nn.GroupNorm tree layout (norm/scale|bias)."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics regardless of compute dtype.

    ``activate=True`` fuses the SiLU that always follows GroupNorm in the
    SD resnet blocks — dispatched to the Pallas fused kernel on TPU
    (gmdx/kernels/groupnorm.py), jnp math elsewhere.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        activate: bool = False,
        pad_output: bool = False,
        parity: bool = False,
        parity_temb: Optional[Array] = None,
    ) -> Array:
        """``pad_output=True`` (TPU fused path only — callers gate on
        :func:`_gn_pads_conv_ok`) emits the 1-px zero-padded image that a
        following Winograd 3x3 conv consumes directly, deleting the XLA
        pad pass between GN and conv.

        ``parity=True``: x is the Winograd parity-5D layout
        (B, T, 2, Tc, 2C) (a ``parity_out`` conv result); the kernel adds
        ``parity_temb`` (per-image channel bias, BEFORE the statistics),
        normalizes, activates, and emits the PADDED parity layout for a
        ``parity_in`` conv — the whole resnet tail stays in one physical
        layout (gmdx/kernels/groupnorm.py parity_gn_pad_silu)."""
        import os

        c = x.shape[-1] // 2 if parity else x.shape[-1]
        scale, bias = _GNScaleBias(c, name="norm")()
        orig_dtype = x.dtype

        if parity:
            from gmdx.kernels.groupnorm import parity_gn_pad_silu

            out = parity_gn_pad_silu(
                x, scale, bias, parity_temb,
                num_groups=self.num_groups, eps=self.epsilon,
                activate=activate,
            )
            if out is not None:
                return out
            # Safety fallback (callers gate on eligibility): the kernel's
            # jnp mirror — the single source of the chain's reference
            # semantics (also the backward recompute target).
            from gmdx.kernels.groupnorm import _parity_gn_mirror

            return _parity_gn_mirror(
                x, scale, bias, parity_temb, self.num_groups,
                self.epsilon, activate,
            )

        # Default-on: in-model the kernel beats XLA's GN lowering by ~9%
        # of a whole SD-1.5 UNet forward (72.9 -> 66.5 ms batch 8 bf16 —
        # XLA's convert+reduce stat passes ran ~9x off bandwidth roofline).
        # Standalone microbenches showed parity; trust the in-model trace.
        # GMDX_FUSED_GN=0 opts out. Falls back to jnp off-TPU or for
        # shapes that don't tile (fused_group_norm_silu returns None).
        if (
            x.ndim == 4
            and os.environ.get("GMDX_FUSED_GN", "1") != "0"
            and os.environ.get("GMDX_NO_PALLAS", "0") != "1"
            and _tp_active() is None
            and jax.default_backend() == "tpu"
        ):
            from gmdx.kernels.groupnorm import fused_group_norm_silu

            out = fused_group_norm_silu(
                x, scale, bias,
                num_groups=self.num_groups, eps=self.epsilon,
                activate=activate, pad_output=pad_output,
            )
            if out is not None:
                return out

        xf = x.astype(jnp.float32)
        shape = xf.shape
        g = self.num_groups
        xg = xf.reshape(shape[:-1] + (g, c // g))
        red_axes = tuple(range(1, xf.ndim - 1)) + (xf.ndim,)
        mean = xg.mean(axis=red_axes, keepdims=True)
        var = xg.var(axis=red_axes, keepdims=True)
        y = ((xg - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(shape)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        if activate:
            y = nn.silu(y)
        y = y.astype(orig_dtype)
        if pad_output:  # non-fused fallback: pad outside (status quo cost)
            y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return y


class _Kernel(nn.Module):
    """Bias-free projection kernel holder; keeps the ``<name>/kernel`` tree
    layout of nn.Dense so checkpoints are unchanged."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_dim, self.out_dim),
        )


class Attention(nn.Module):
    """Multi-head attention over (B, S, C) sequences; cross if context given.

    Matches the SD attention block: no-bias q/k/v projections, bias on the
    output projection, head count = query_dim // head_dim. The q/k/v params
    stay separate (diffusers checkpoint layout) but the projections execute
    as ONE fused matmul for self-attention (kernel concat is loop-invariant
    — XLA hoists it out of the denoise scan) and a fused k|v matmul for
    cross-attention: at SD-1.5's 320-wide blocks a lone 320-column matmul
    wastes 17% of the MXU's 128-lane tiling that the 960-column fused one
    doesn't.
    """

    query_dim: int
    heads: int
    head_dim: int
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        inner = self.heads * self.head_dim
        c_in = x.shape[-1]
        ctx_in = c_in if context is None else context.shape[-1]
        wq = _Kernel(c_in, inner, name="to_q")().astype(self.dtype)
        wk = _Kernel(ctx_in, inner, name="to_k")().astype(self.dtype)
        wv = _Kernel(ctx_in, inner, name="to_v")().astype(self.dtype)

        import os

        # Default OFF: measured -1.6% on the 512^2 dual-UNet bench (0.7586
        # -> 0.7466 img/s) — the kernel concat is evidently NOT hoisted out
        # of the denoise scan, and three matmuls with fused epilogues beat
        # one wider one. GMDX_FUSED_QKV=1 re-enables for future A/Bs.
        fused = os.environ.get("GMDX_FUSED_QKV", "0") == "1"
        if context is None:
            if fused:
                qkv = x @ jnp.concatenate([wq, wk, wv], axis=1)
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q, k, v = x @ wq, x @ wk, x @ wv
        else:
            q = x @ wq
            if fused:
                kv = context @ jnp.concatenate([wk, wv], axis=1)
                k, v = jnp.split(kv, 2, axis=-1)
            else:
                k, v = context @ wk, context @ wv

        # Head-packed dispatch: q/k/v stay (B, S, H*D) end to end — on the
        # TPU fast path the head axis is sliced inside the Pallas kernel
        # instead of via XLA transposes (gmdx/kernels/attention.py).
        out = attention_packed(q, k, v, self.heads)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class _DenseParams(nn.Module):
    """Kernel+bias holder keeping the nn.Dense tree layout
    (``<name>/kernel|bias``) so checkpoints are unchanged."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (self.in_dim, self.out_dim),
            ),
            self.param("bias", nn.initializers.zeros, (self.out_dim,)),
        )


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP: Dense -> split -> x * gelu(gate) -> Dense (mult=4).

    ``residual`` folds the transformer block's skip connection into the FF:
    on TPU the whole chain (both matmuls, the GEGLU product, and the
    residual add) runs as one Pallas kernel with the weights resident in
    VMEM (gmdx/kernels/geglu_ff.py) — under XLA the (tokens, 8*dim)
    projection round-trips HBM three times and the proj_out fusions profile
    HBM-bound (BENCHNOTES.md round 2).

    ``ln_scale``/``ln_bias`` additionally fold the PRECEDING LayerNorm into
    the same kernel (x is then the PRE-norm input and its own residual):
    the normalized activations never touch HBM and x is read once instead
    of three times (LN read, FF read, residual read).

    exact (erf) gelu: diffusers' GEGLU uses torch F.gelu's default erf
    form; the tanh approximation would cost ~1e-3 of systematic error
    per block in cross-framework parity for zero TPU speedup.
    """

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        residual: Optional[Array] = None,
        add: Optional[Array] = None,
        ln_scale: Optional[Array] = None,
        ln_bias: Optional[Array] = None,
        ln_eps: float = 1e-5,
    ) -> Array:
        inner = self.dim * self.mult
        w1, b1 = _DenseParams(self.dim, inner * 2, name="proj_in")()
        w2, b2 = _DenseParams(inner, self.dim, name="proj_out")()

        from gmdx.kernels.geglu_ff import geglu_ff, geglu_ff_ln

        if ln_scale is not None:
            return geglu_ff_ln(
                x,
                ln_scale,
                ln_bias,
                w1.astype(self.dtype),
                b1.astype(self.dtype),
                w2.astype(self.dtype),
                b2.astype(self.dtype),
                add=add,
                eps=ln_eps,
            )

        res = residual if residual is not None else jnp.zeros((), x.dtype)
        res = jnp.broadcast_to(res.astype(x.dtype), x.shape)
        out = geglu_ff(
            x,
            res,
            w1.astype(self.dtype),
            b1.astype(self.dtype),
            w2.astype(self.dtype),
            b2.astype(self.dtype),
        )
        return out


class _LNScaleBias(nn.Module):
    """LayerNorm scale/bias params in nn.LayerNorm's exact tree layout
    (``<name>/scale|bias``), for paths that fuse the normalization into a
    downstream kernel instead of calling nn.LayerNorm."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU FF (pre-norm).

    LayerNorm eps is 1e-5 (torch nn.LayerNorm default, which diffusers'
    BasicTransformerBlock inherits) — flax's 1e-6 default would be a small
    systematic parity error vs reference checkpoints. norm3 is not a module
    call: its params feed the fused LN+GEGLU kernel (gmdx/kernels/geglu_ff)
    with the identical ``norm3/scale|bias`` tree layout."""

    dim: int
    heads: int
    head_dim: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        from gmdx.kernels.geglu_ff import add_layer_norm

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        a1 = Attention(
            self.dim, self.heads, self.head_dim, dtype=self.dtype, name="attn1"
        )(h)
        # attn1-residual + norm2 fused add+LN kernel: measured -3.1% on
        # the dual bench (0.8934 -> 0.8661) — a NEW custom-call boundary
        # at a thin glue point grows layout copies on all four operand/
        # result edges that outweigh the fused arithmetic. Opt-in via
        # GMDX_FUSED_ADDLN=1; default keeps XLA's add/LN fusions. (The
        # attn2-side fold below is different: it adds an operand to an
        # EXISTING kernel — measured neutral, kept for the removed
        # materialization.)
        import os as _os

        if _os.environ.get("GMDX_FUSED_ADDLN", "0") == "1":
            ln2_scale, ln2_bias = _LNScaleBias(self.dim, name="norm2")()
            x, h = add_layer_norm(x, a1, ln2_scale, ln2_bias, eps=1e-5)
        else:
            x = x + a1
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        a2 = Attention(
            self.dim,
            self.heads,
            self.head_dim,
            context_dim=self.context_dim,
            dtype=self.dtype,
            name="attn2",
        )(h, context)
        ln_scale, ln_bias = _LNScaleBias(self.dim, name="norm3")()
        # attn2's residual folds into the FF kernel prologue (add=a2):
        # the post-attention hidden state never materializes in HBM.
        return GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(
            x, add=a2, ln_scale=ln_scale, ln_bias=ln_bias, ln_eps=1e-5
        )


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> 1x1 conv in -> blocks over flattened grid
    -> 1x1 conv out -> residual. (SD-1.5 uses conv projections.)"""

    channels: int
    heads: int
    head_dim: int
    context_dim: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(32, 1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, self.channels)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.channels,
                self.heads,
                self.head_dim,
                self.context_dim,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, context)
        x = x.reshape(b, h, w, self.channels)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class _Conv3x3Dispatch(nn.Module):
    """3x3 stride-1 SAME conv with nn.Conv's exact param tree, dispatched to
    the Winograd F(2x2, 3x3) Pallas kernel on TPU (gmdx/kernels/winograd.py
    — 2.25x fewer MACs, transform-domain matmuls contract over the full
    channel depth) with the direct XLA conv as fallback for unsupported
    shapes or off-TPU."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        pre_padded: bool = False,
        parity_in: bool = False,
        parity_out: bool = False,
    ) -> Array:
        """``parity_in``/``parity_out`` exchange the Winograd parity-5D
        layout with adjacent kernels (the parity-emitting GroupNorm / a
        downstream parity consumer) so the resnet tail never pays the XLA
        retile between layouts. Callers gate on winograd_parity_io."""
        in_ch = x.shape[-1] // 2 if parity_in else x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        x = x.astype(self.dtype)

        from gmdx.kernels.winograd import (
            nhwc_to_parity5,
            parity5_to_nhwc,
            winograd_conv3x3,
        )

        # The kernel/bias stay in the PARAM dtype: the Winograd weight
        # transform upcasts to fp32 in-kernel anyway, and a pre-cast would
        # materialize an unfused convert_element_type of every conv weight
        # on every denoise step (custom-call operands cannot fuse; ~2% of
        # the dual step at the 1280-channel levels, BENCHNOTES.md).
        out = winograd_conv3x3(
            x, kernel, bias, pre_padded=pre_padded, parity_in=parity_in,
            parity_out=parity_out,
        )
        if out is not None:
            return out
        if parity_in:
            x = parity5_to_nhwc(x)  # parity input carries the 1-px border
            pre_padded = True
        pad = "VALID" if pre_padded else ((1, 1), (1, 1))
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = out + bias.astype(self.dtype)
        return nhwc_to_parity5(out) if parity_out else out


class ResnetBlock2D(nn.Module):
    """GN -> SiLU -> conv -> (+temb proj) -> GN -> SiLU -> conv, residual."""

    out_channels: int
    use_temb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None) -> Array:
        import os

        in_channels = x.shape[-1]

        def _gn_pads_conv_ok(shape, out_ch):
            """Route GN output straight into the Winograd conv in the
            padded layout — requires BOTH the one-pass GN kernel (whole
            image in VMEM) and a Winograd dispatch for the conv."""
            from gmdx.kernels.groupnorm import gn_onepass_eligible
            from gmdx.kernels.winograd import winograd_eligible

            itemsize = jnp.dtype(self.dtype).itemsize
            return (
                os.environ.get("GMDX_FUSED_GN", "1") != "0"
                and os.environ.get("GMDX_NO_PALLAS", "0") != "1"
                and _tp_active() is None
                and jax.default_backend() == "tpu"
                and gn_onepass_eligible(shape, itemsize)
                and winograd_eligible(shape, out_ch, itemsize)
            )

        pad1 = _gn_pads_conv_ok(x.shape, self.out_channels)

        # Parity chain: when BOTH convs dispatch the unchunked F(2x2)
        # Winograd kernel and the mid activation fits the one-pass GN
        # budget, the tail conv1 -> (+temb) -> GN2 -> conv2 stays in the
        # parity-5D layout end to end: conv1 emits it, the parity GN kernel
        # folds the temb add and emits the padded form, conv2 consumes it.
        # Kills the XLA retile copies between the NHWC and parity layouts
        # (~4.3% of the dual denoise step, BENCHNOTES.md round 2).
        # GMDX_PARITY_CHAIN=0 opts out (trainers: the AD path pays layout
        # conversions in the VJP rules instead).
        def _parity_chain_ok():
            from gmdx.kernels.groupnorm import gn_onepass_eligible
            from gmdx.kernels.winograd import winograd_parity_io

            itemsize = jnp.dtype(self.dtype).itemsize
            mid = (x.shape[0], x.shape[1], x.shape[2], self.out_channels)
            return (
                pad1
                and os.environ.get("GMDX_PARITY_CHAIN", "1") == "1"
                # conv1 must EMIT parity (needs an unchunked output);
                # conv2 only CONSUMES it (io="in" — chunked output fine).
                and winograd_parity_io(x.shape, self.out_channels, itemsize)
                and winograd_parity_io(
                    mid, self.out_channels, itemsize, io="in"
                )
                and gn_onepass_eligible(mid, itemsize)
            )

        chain = _parity_chain_ok()
        h = GroupNorm(32, 1e-5, dtype=self.dtype, name="norm1")(
            x, activate=True, pad_output=pad1
        )
        h = _Conv3x3Dispatch(self.out_channels, dtype=self.dtype, name="conv1")(
            h, pre_padded=pad1, parity_out=chain
        )
        t = None
        if self.use_temb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            if not chain:
                h = h + t[:, None, None, :]
        if chain:
            h = GroupNorm(32, 1e-5, dtype=self.dtype, name="norm2")(
                h, activate=True, parity=True, parity_temb=t
            )
            h = _Conv3x3Dispatch(self.out_channels, dtype=self.dtype, name="conv2")(
                h, parity_in=True
            )
        else:
            pad2 = _gn_pads_conv_ok(h.shape, self.out_channels)
            h = GroupNorm(32, 1e-5, dtype=self.dtype, name="norm2")(
                h, activate=True, pad_output=pad2
            )
            h = _Conv3x3Dispatch(self.out_channels, dtype=self.dtype, name="conv2")(
                h, pre_padded=pad2
            )
        if in_channels != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class Downsample2D(nn.Module):
    """Strided 3x3 conv. The UNet uses symmetric pad 1; the VAE encoder pads
    (0,1)x(0,1) — ``asymmetric_pad`` selects that variant."""

    channels: int
    asymmetric_pad: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = ((0, 1), (0, 1)) if self.asymmetric_pad else ((1, 1), (1, 1))
        return nn.Conv(
            self.channels, (3, 3), strides=2, padding=pad, dtype=self.dtype, name="conv"
        )(x)


def _subpixel_phase_kernels(w: Array) -> Array:
    """Fold a 3x3 kernel into the four 2x2 phase kernels of the
    nearest-2x-then-conv3x3 composition.

    For output row 2i+p the conv taps hit source rows floor((2i+p+a-1)/2):
    p=0 reads {i-1 (w0), i (w1+w2)}, p=1 reads {i (w0+w1), i+1 (w2)} — and
    likewise per column. Tap-combination matrices M0/M1 encode those sums;
    the phase kernel is M_p w M_q^T per (in, out) channel pair. Combined in
    fp32 so weight addition doesn't lose bf16 bits."""
    m0 = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]], jnp.float32)
    m1 = jnp.array([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
    w32 = w.astype(jnp.float32)
    return jnp.concatenate(
        [
            jnp.einsum("da,eb,abio->deio", mp, mq, w32)
            for mp in (m0, m1)
            for mq in (m0, m1)
        ],
        axis=-1,
    )  # (2, 2, C, 4*O), phase order (p, q) = 00, 01, 10, 11


class _Conv3x3Params(nn.Module):
    """Bare 3x3-conv parameters in nn.Conv's exact tree/init (kernel HWIO +
    bias), for paths that consume the weights without calling nn.Conv."""

    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class Upsample2D(nn.Module):
    """Nearest 2x upsample + 3x3 conv.

    Default path computes the mathematically identical sub-pixel form: one
    2x2 conv over the LOW-res input producing the four output phases
    (interleaved back with a depth-to-space), instead of materializing the
    2x-upsampled tensor and convolving 3x3 over it. 16 low-res taps replace
    36 low-res-equivalent taps (2.25x fewer MACs) and the conv input is 4x
    smaller — profiling showed the naive lowering ran at ~10% MXU roofline
    (BENCHNOTES.md round 2). ``GMDX_SUBPIXEL_UPSAMPLE=0`` restores the
    naive composition (same params, same math)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import os

        b, h, w, c = x.shape
        if os.environ.get("GMDX_SUBPIXEL_UPSAMPLE", "1") == "0":
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            return nn.Conv(
                self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv"
            )(x)

        kernel, bias = _Conv3x3Params(self.channels, name="conv")(c)
        o = self.channels
        pk = _subpixel_phase_kernels(kernel).astype(self.dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(self.dtype)
        if os.environ.get("GMDX_SUBPIXEL_DOT", "0") == "1":
            # OPT-IN (measured slower): the same 2x2 conv expressed as 4
            # shifted matmuls, hoping to beat the conv_general lowering's
            # ~34% MXU on the 1280-channel upsamples. End-to-end dual bench
            # A/B: 0.8647 (conv) -> 0.8525 img/s/chip (dots) — the four
            # separate dot outputs cost more HBM traffic than the conv's
            # single fused write. Kept for re-evaluation at other shapes.
            z = None
            for a in (0, 1):
                for bb in (0, 1):
                    term = jnp.einsum(
                        "bhwc,co->bhwo",
                        jax.lax.slice_in_dim(
                            jax.lax.slice_in_dim(xp, a, a + h + 1, axis=1),
                            bb, bb + w + 1, axis=2,
                        ),
                        pk[a, bb],
                    )
                    z = term if z is None else z + term
        else:
            z = jax.lax.conv_general_dilated(
                xp, pk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # (B, H+1, W+1, 4*O)
        z = z + jnp.tile(bias, 4).astype(z.dtype)
        phases = [
            z[:, p : p + h, q : q + w, (2 * p + q) * o : (2 * p + q + 1) * o]
            for p in (0, 1)
            for q in (0, 1)
        ]
        y = jnp.stack(phases, axis=3).reshape(b, h, w, 2, 2, o)
        return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * h, 2 * w, o)


class VAEAttention(nn.Module):
    """Single-head spatial self-attention for the VAE mid block."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(32, 1e-6, dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        out = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return out.reshape(b, h, w, c) + residual


__all__ = [
    "timestep_embedding",
    "TimestepEmbedding",
    "GroupNorm",
    "Attention",
    "GEGLUFeedForward",
    "BasicTransformerBlock",
    "Transformer2D",
    "ResnetBlock2D",
    "Downsample2D",
    "Upsample2D",
    "VAEAttention",
]
