"""Attention dispatch: Pallas flash kernel on TPU, fused-softmax XLA fallback.

Replaces the reference's torch SDPA / xformers opt-in path
(train_vqgan_lora.py:864-866) with a TPU-first design: O(L) memory blockwise
attention for the UNet/VAE latent grids (4096 tokens at 512^2, 16384 at
1024^2 — SURVEY.md §5.7).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

Array = jax.Array


def _xla_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Reference attention: softmax in fp32, inputs (B, S, H, D)."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    scale: float | None = None,
    use_pallas: bool | None = None,
) -> Array:
    """Multi-head attention over (batch, seq, heads, head_dim) tensors.

    Self- and cross-attention (k/v seq may differ from q seq). No masking —
    the diffusion UNet/VAE attends densely over the latent grid and CLIP
    tokens (reference pipelines never pass attention masks to the UNet).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        # Measured on v5e at SD-1.5 shapes (see BENCHNOTES.md): the flash
        # kernel beats XLA whenever K is long — 1.7x at 4096 tokens (5.7 vs
        # 9.8 ms, B8H8D40), 1.2x at 1024 — while XLA wins for short-K
        # cross-attention (77 tokens: 1.1 vs 2.3 ms) and tiny grids where
        # kernel overhead dominates. Flash also removes the O(Sq*Sk) logits
        # materialization, which XLA cannot avoid at 1024^2+ resolutions.
        # Head-dim cap: at the VAE's single 512-wide head XLA's fused
        # attention edges out the kernel (3.2 vs 3.5 ms at 4096 tokens,
        # blk 512), so the UNet head dims (<=160) dispatch to Pallas —
        # EXCEPT that past 4096 keys the O(Sq*Sk) logits XLA materializes
        # dominate everything (1 GB fp32 at the VAE's 16384 tokens at
        # 1024^2), so long sequences always take the O(L) kernel.
        use_pallas = (
            os.environ.get("GMDX_NO_PALLAS", "0") != "1"
            and jax.default_backend() == "tpu"
            and k.shape[1] >= 1024
            and (q.shape[-1] <= 256 or k.shape[1] > 4096)
        )
    if use_pallas:
        from gmdx.kernels.flash_attention import flash_attention

        out = flash_attention(q, k, v, scale=scale)
        if out is not None:
            return out
    return _xla_attention(q, k, v, scale)


def attention_packed(
    q: Array,
    k: Array,
    v: Array,
    heads: int,
    *,
    scale: float | None = None,
) -> Array:
    """Attention over head-packed (B, S, H*D) operands — the layout the
    q/k/v projections produce and the output projection consumes.

    On TPU, long-K shapes take the head-packed Pallas kernel
    (flash_attention_bsc), which needs NO per-operand (B,S,H,D)->(BH,S,D)
    transpose — those transposes were ~6.7% of the dual denoise step as
    "data formatting" HBM traffic (BENCHNOTES.md round 2). Everything else
    falls back to the (B, S, H, D) dispatch above.
    """
    d = q.shape[-1] // heads
    if scale is None:
        scale = d**-0.5
    tp = _tp_route(q, k, v, heads)
    if tp is not None:
        ctx, batch_spec = tp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        spec = P(batch_spec, None, ctx.axis)
        local_heads = heads // ctx.size
        # Head-parallel: whole heads per model shard (column-parallel
        # to_q/k/v lay inner = H*D head-major, gmdx/dist/tp.py:18-20), so
        # each shard runs the SAME kernel dispatch over its head slice with
        # zero communication — the Pallas fast path survives the TP mesh
        # instead of falling back to XLA behind an all-gather
        # (VERDICT.md round-2 item 5).
        return shard_map(
            lambda ql, kl, vl: _attention_packed_local(
                ql, kl, vl, local_heads, scale
            ),
            mesh=ctx.mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
        )(q, k, v)
    return _attention_packed_local(q, k, v, heads, scale)


def _tp_route(q, k, v, heads):
    """(ctx, batch_spec) when a TP kernel context applies to this call."""
    from gmdx.dist.tpctx import active

    ctx = active()
    if ctx is None or ctx.size <= 1:
        return None
    if heads % ctx.size or q.shape[-1] % ctx.size:
        return None
    if k.shape[-1] != q.shape[-1] or v.shape[-1] != q.shape[-1]:
        return None
    batch_spec = None
    if ctx.data_axis is not None:
        if q.shape[0] % ctx.mesh.shape[ctx.data_axis]:
            return None
        batch_spec = ctx.data_axis
    return ctx, batch_spec


def _attention_packed_local(q, k, v, heads, scale):
    d = q.shape[-1] // heads
    # Long-KEY dispatch, same rule as the 4D path. A long-QUERY rule that
    # also sent 4096-query/77-key cross-attention through the ONLINE-softmax
    # BSC kernel measured 0.7676 vs 0.8311 img/s on the dual bench — the
    # per-head running-max/correction machinery at nk=1 loses badly to
    # XLA's fused short-K attention. Short-K shapes instead take the
    # dedicated single-k-block kernel below (exact softmax, K/V resident,
    # no transposes), which has none of that overhead.
    no_pallas = (
        os.environ.get("GMDX_NO_PALLAS", "0") == "1"
        or os.environ.get("GMDX_PACKED_ATTN", "1") != "1"
        or jax.default_backend() != "tpu"
    )
    # KV-resident exact-softmax kernel first: at the UNet self-attention
    # shapes (<=4096 keys) the whole K/V fits VMEM, and dropping flash's
    # online-softmax machinery recovers part of the d_head=40 shape-cap
    # gap (BENCHNOTES.md round 3). GMDX_ATTN_KVRES=0 reverts to flash.
    if (
        not no_pallas
        and os.environ.get("GMDX_ATTN_KVRES", "1") == "1"
        and k.shape[1] >= 256
        and k.shape[1] <= 4096
        and d <= 160
    ):
        from gmdx.kernels.flash_attention import attention_kv_resident

        out = attention_kv_resident(q, k, v, heads, scale=scale)
        if out is not None:
            return out
    if not no_pallas and k.shape[1] >= 1024 and d <= 160:
        from gmdx.kernels.flash_attention import flash_attention_bsc

        out = flash_attention_bsc(q, k, v, heads, scale=scale)
        if out is not None:
            return out
    # Default OFF: even the specialized single-k-block kernel (exact
    # softmax, no online corrections, K/V resident, zero transposes)
    # measured 0.819 vs 0.8426 img/s on the dual bench — at 77 keys the
    # score/PV matmuls are tiny and XLA's fused short-K attention keeps
    # them inside one fusion with the surrounding elementwise work, which
    # the pallas_call boundary forcibly breaks. GMDX_XATTN_KERNEL=1
    # re-enables for future A/Bs.
    if (
        not no_pallas
        and os.environ.get("GMDX_XATTN_KERNEL", "0") == "1"
        and k.shape[1] <= 128
        and q.shape[1] >= 1024
        and d <= 160
    ):
        from gmdx.kernels.flash_attention import cross_attention_shortk

        out = cross_attention_shortk(q, k, v, heads, scale=scale)
        if out is not None:
            return out
    b, sq, c = q.shape
    sk = k.shape[1]
    out = dot_product_attention(
        q.reshape(b, sq, heads, d),
        k.reshape(b, sk, heads, d),
        v.reshape(b, sk, heads, d),
        scale=scale,
    )
    return out.reshape(b, sq, c)


__all__ = ["dot_product_attention", "attention_packed"]
