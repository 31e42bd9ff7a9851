"""Blockwise (flash) attention as a Pallas TPU kernel.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * Grid (batch*heads, q_blocks, k_blocks); the k dimension is minor, so the
    online-softmax running state (row max, row sum, output accumulator) lives
    in VMEM scratch that persists across the sequential k iterations. Heads
    are folded into the leading dim by an XLA transpose (Mosaic requires the
    last two block dims to be tile-aligned or full, which rules out slicing
    the head axis of a (B, S, H, D) operand in the index map).
  * The head dim stays unpadded (40/80/160 in SD-1.5): a block whose last
    dim equals the full array dim is legal, and Mosaic lane-pads VMEM tiles
    internally at no cost — whereas explicit jnp.pad to 128 cost a full HBM
    round-trip per Q/K/V per call (~8% of a UNet forward, measured in a
    device trace).
  * fp32 accumulation regardless of input dtype (bf16 in the hot path).
  * O(L) memory: no (Sq, Sk) materialization, unlike the reference's opt-in
    xformers path (train_vqgan_lora.py:864-866) this is always-on.
  * Training: custom VJP — forward runs the Pallas kernel, backward
    recomputes attention with the XLA path (latent grids are <=16k tokens,
    so recompute beats storing the weight matrix).
"""

from __future__ import annotations

import functools

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30
_LOG2_E = math.log2(math.e)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_kernel(
    sk_ref,  # SMEM (1,): true (unpadded) key length
    q_ref,  # VMEM (1, blk_q, d) — pre-scaled by sm_scale*log2(e)
    k_ref,  # VMEM (1, blk_k, d)
    v_ref,  # VMEM (1, blk_k, d)
    o_ref,  # VMEM (1, blk_q, d)
    m_scr,  # VMEM (blk_q, 128) running row max (lane-broadcast)
    l_scr,  # VMEM (blk_q, 128) running row sum
    acc_scr,  # VMEM (blk_q, d) fp32 accumulator
    *,
    blk_k: int,
    needs_mask: bool,
):
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # Mask key positions past the true length — statically skipped when the
    # key length is already block-aligned (the hot self-attention case), which
    # saves an iota+compare+select per logit on the VPU.
    if needs_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kidx * blk_k
        s = jnp.where(col < sk_ref[0], s, _NEG_INF)

    # Base-2 softmax: log2(e) is folded into the Q pre-scale, so logits are
    # already in log2 space and the VPU runs the native exp2 without the
    # per-element base-change multiply. Numerator and denominator share the
    # base, so the normalized weights are unchanged.
    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    corr = jnp.exp2(m_prev - m_new)

    l_scr[:] = jnp.broadcast_to(
        corr * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    acc_scr[:] = corr * acc_scr[:] + jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kidx == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _flash_forward(
    q: Array, k: Array, v: Array, scale: float, interpret: bool = False
) -> Array:
    """q (BH, Sq, D), k/v (BH, Sk, D) -> (BH, Sq, D).

    The head dim stays unpadded (40/80/160 in SD-1.5): a block whose last
    dim equals the full array dim is legal, and Mosaic lane-pads the VMEM
    tiles internally at no cost — whereas an explicit jnp.pad to a 128
    multiple costs a full HBM round-trip per Q/K/V per call (~8% of a UNet
    forward, measured in a device trace). Sequence lengths are padded to
    the block size only when misaligned (q rows: garbage rows sliced off
    after; k rows: masked to -inf via the scalar-prefetched true length).
    """
    bh, sq, d = q.shape
    sk = k.shape[1]
    dtype = q.dtype

    # 1024-wide blocks fit comfortably in the ~16 MB of VMEM for the UNet
    # head dims (<=160), but at the VAE's single 512-wide head the fp32
    # logits block + accumulator + double-buffered operands exceed it —
    # halve the blocks there (s: 4 MB -> 1 MB, acc: 2 MB -> 1 MB).
    blk_cap = 1024 if d <= 256 else 512
    blk_q = min(blk_cap, _round_up(sq, 128))
    blk_k = min(blk_cap, _round_up(sk, 128))
    sq_p = _round_up(sq, blk_q)
    sk_p = _round_up(sk, blk_k)

    # Fold the softmax scale AND the exp->exp2 base change into Q once (a
    # fusible elementwise op) instead of touching every (Sq, Sk) logit.
    qp = (q.astype(jnp.float32) * (scale * _LOG2_E)).astype(dtype)
    if sq_p != sq:
        qp = jnp.pad(qp, ((0, 0), (0, sq_p - sq), (0, 0)))
    kp, vp = k, v
    if sk_p != sk:
        kp = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))
    sk_arr = jnp.array([sk], jnp.int32)
    needs_mask = sk_p != sk

    grid = (bh, sq_p // blk_q, sk_p // blk_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, blk_k=blk_k, needs_mask=needs_mask),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            # Index maps under PrefetchScalarGridSpec receive the scalar
            # prefetch refs as trailing args after the grid indices.
            in_specs=[
                pl.BlockSpec((1, blk_q, d), lambda b, i, j, sk: (b, i, 0)),
                pl.BlockSpec((1, blk_k, d), lambda b, i, j, sk: (b, j, 0)),
                pl.BlockSpec((1, blk_k, d), lambda b, i, j, sk: (b, j, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, blk_q, d), lambda b, i, j, sk: (b, i, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((blk_q, 128), jnp.float32),
                pltpu.VMEM((blk_q, 128), jnp.float32),
                pltpu.VMEM((blk_q, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_p * sk_p * d,
            bytes_accessed=2 * bh * (sq_p + 2 * sk_p) * d * q.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p,
        ),
        interpret=interpret,
    )(sk_arr, qp, kp, vp)
    return out[:, :sq] if sq_p != sq else out


def _xla_bshd(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_bshd(
    q: Array, k: Array, v: Array, scale: float, interpret: bool = False
) -> Array:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    of = _flash_forward(qf, kf, vf, scale, interpret)
    return of.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def _flash_fwd(q, k, v, scale, interpret):
    return _flash_bshd(q, k, v, scale, interpret), (q, k, v)


def _flash_bwd(scale, _interpret, res, g):
    # Backward = recompute with differentiable XLA ops; memory is fine at
    # latent-grid sequence lengths and it keeps one kernel to maintain.
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_bshd(q_, k_, v_, scale), q, k, v)
    return vjp(g)


_flash_bshd.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    scale: float | None = None,
    interpret: bool = False,
) -> Array | None:
    """Flash attention over (B, S, H, D); returns None if unsupported.

    The None return lets the dispatch wrapper fall back to XLA without this
    module needing to know about it. ``interpret=True`` runs the kernel in
    the Pallas interpreter (CPU CI).
    """
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        return None
    if jax.default_backend() != "tpu" and not interpret:
        return None
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_bshd(q, k, v, scale, interpret)


__all__ = ["flash_attention"]
