"""Blockwise (flash) attention as Pallas TPU kernels — forward and backward.

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
  * Training: custom VJP with Pallas backward kernels. The forward also
    emits the per-row base-2 logsumexp; the backward recomputes the
    probabilities blockwise from (Q, K, LSE) and accumulates dK/dV (k-major
    kernel) and dQ (q-major kernel) in VMEM scratch — still O(L) memory,
    where the XLA recompute fallback (GMDX_FLASH_BWD=0) materializes the
    (Sq, Sk) weights and their gradient.
  * Base-2 softmax: log2(e) and the 1/sqrt(d) scale are folded into the Q
    block as it is read from VMEM inside each kernel (blk_q*d VPU ops,
    amortized over blk_q*blk_k logits), so the VPU runs native exp2 with no
    per-logit multiply; numerator and denominator share the base, so the
    normalized weights are unchanged. The backward folds the matching
    constants into its epilogues (dK /= log2(e), dQ *= scale). Scaling used
    to happen OUTSIDE the kernels ("fold into Q once"), but custom-call
    operands cannot fuse, so that materialized a full HBM round trip of Q
    per call — visible as per-attention "convert_element_type" copies
    (~0.6% of the dual denoise step) in device traces.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30
_LOG2_E = math.log2(math.e)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _env_block(var: str, default: int) -> int:
    """Block-size cap from the environment, validated at the read site so a
    bad value fails with the variable's name instead of a Mosaic lowering
    error mid-training. Values are rounded down to a 128 multiple."""
    raw = os.environ.get(var)
    if raw is None:
        return default
    try:
        v = int(raw)
    except ValueError as e:
        raise ValueError(f"{var}={raw!r} is not an integer") from e
    if v < 128:
        raise ValueError(f"{var}={v} must be >= 128")
    return v // 128 * 128


def _flash_kernel(
    sk_ref,  # SMEM (1,): true (unpadded) key length
    q_ref,  # VMEM (1, blk_q, d)
    k_ref,  # VMEM (1, blk_k, d)
    v_ref,  # VMEM (1, blk_k, d)
    o_ref,  # VMEM (1, blk_q, d)
    lse_ref,  # VMEM (1, blk_q, 1) base-2 logsumexp (backward residual)
    m_scr,  # VMEM (blk_q, 128) running row max (lane-broadcast)
    l_scr,  # VMEM (blk_q, 128) running row sum
    acc_scr,  # VMEM (blk_q, d) fp32 accumulator
    *,
    blk_k: int,
    qscale: float,
    needs_mask: bool,
):
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Scale Q in-kernel (sm_scale and the exp->exp2 base change): the block
    # is VMEM-resident, so this costs blk_q*d VPU ops — while the former
    # out-of-kernel pre-scale materialized a full HBM round trip of Q per
    # call (custom-call operands cannot fuse; "convert_element_type" copies
    # were ~0.6% of the dual denoise step in device traces).
    q = (q_ref[0].astype(jnp.float32) * qscale).astype(q_ref.dtype)
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
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:, :1] + jnp.log2(l)


def _flash_forward(
    q: Array, k: Array, v: Array, scale: float, interpret: bool = False
):
    """q (BH, Sq, D), k/v (BH, Sk, D) -> ((BH, Sq, D), lse (BH, Sq, 1)).

    Sequence lengths are padded to the block size only when misaligned
    (q rows: garbage rows sliced off after; k rows: masked to -inf via the
    scalar-prefetched true length).
    """
    bh, sq, d = q.shape
    sk = k.shape[1]
    dtype = q.dtype

    # Block sizes from an on-device sweep at the SD hot shape (BH64/S4096/
    # D40, in-scan, BENCHNOTES.md): 1024q/2048k runs 2.71 ms vs 5.67 at
    # 1024/1024 — halving the k-grid halves the online-softmax correction
    # passes and k/v block swaps. The fp32 logits block is 8 MB; with bf16
    # operands and the UNet head dims (<=160) everything still fits VMEM,
    # but fp32 operands push the scoped allocation to 17.3 MB (> the 16 MB
    # limit — caught by the driver's fp32 entry() compile check), so wide-K
    # is bf16/fp16-only. At d=256 the k/v double buffers push past budget
    # (keep 1024k), and at the VAE's single 512-wide head even 1024-wide
    # blocks OOM (keep 512).
    if d <= 160 and q.dtype.itemsize <= 2:
        cap_q, cap_k = 1024, 2048
    elif d <= 256:
        cap_q, cap_k = 1024, 1024
    else:
        cap_q, cap_k = 512, 512
    blk_q = min(_env_block("GMDX_FLASH_BLKQ", cap_q), _round_up(sq, 128))
    blk_k = min(_env_block("GMDX_FLASH_BLKK", cap_k), _round_up(sk, 128))
    sq_p = _round_up(sq, blk_q)
    sk_p = _round_up(sk, blk_k)

    qp = q
    if sq_p != sq:
        qp = jnp.pad(qp, ((0, 0), (0, sq_p - sq), (0, 0)))
    kp, vp = k, v
    if sk_p != sk:
        kp = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))
    sk_arr = jnp.array([sk], jnp.int32)
    needs_mask = sk_p != sk

    grid = (bh, sq_p // blk_q, sk_p // blk_k)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel, blk_k=blk_k, qscale=scale * _LOG2_E,
            needs_mask=needs_mask,
        ),
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
            out_specs=[
                pl.BlockSpec((1, blk_q, d), lambda b, i, j, sk: (b, i, 0)),
                pl.BlockSpec((1, blk_q, 1), lambda b, i, j, sk: (b, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((blk_q, 128), jnp.float32),
                pltpu.VMEM((blk_q, 128), jnp.float32),
                pltpu.VMEM((blk_q, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq_p, d), dtype),
            jax.ShapeDtypeStruct((bh, sq_p, 1), jnp.float32),
        ],
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
    if sq_p != sq:
        out = out[:, :sq]
        lse = lse[:, :sq]
    return out, lse


def _flash_bwd_dkv_kernel(
    sk_ref,  # SMEM (1,): true key length
    qp_ref,  # VMEM (1, blk_q, d) — pre-scaled Q (same as forward)
    k_ref,  # VMEM (1, blk_k, d)
    v_ref,  # VMEM (1, blk_k, d)
    do_ref,  # VMEM (1, blk_q, d) output cotangent
    lse_ref,  # VMEM (1, blk_q, 1) forward base-2 logsumexp
    dd_ref,  # VMEM (1, blk_q, 1) rowsum(dO * O)
    dk_ref,  # VMEM (1, blk_k, d)
    dv_ref,  # VMEM (1, blk_k, d)
    dk_scr,  # VMEM (blk_k, d) fp32
    dv_scr,  # VMEM (blk_k, d) fp32
    *,
    blk_k: int,
    qscale: float,
    needs_mask: bool,
):
    """k-major pass: for one K/V block, iterate Q blocks, accumulate dK/dV."""
    kidx = pl.program_id(1)
    qidx = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qidx == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    # In-kernel Q scaling — same rationale as _flash_kernel.
    qp = (qp_ref[0].astype(jnp.float32) * qscale).astype(qp_ref.dtype)
    k = k_ref[0]
    do = do_ref[0]
    s2 = jax.lax.dot_general(  # base-2 logits, (blk_q, blk_k)
        qp, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if needs_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) + kidx * blk_k
        s2 = jnp.where(col < sk_ref[0], s2, _NEG_INF)
    p = jnp.exp2(s2 - lse_ref[0])  # exact softmax weights, fp32

    dv_scr[:] += jax.lax.dot_general(  # P^T dO -> (blk_k, d)
        p.astype(do.dtype), do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(  # dO V^T -> (blk_q, blk_k)
        do, v_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dd_ref[0])  # natural-log dSoftmax-input
    dk_scr[:] += jax.lax.dot_general(  # dS^T Qp -> (blk_k, d)
        ds.astype(qp.dtype), qp,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qidx == nq - 1)
    def _finish():
        # dK = scale * dS^T Q; Qp = Q*scale*log2(e), so divide log2(e) out.
        dk_ref[0] = (dk_scr[:] * (1.0 / _LOG2_E)).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    sk_ref,
    qp_ref,  # VMEM (1, blk_q, d)
    k_ref,  # VMEM (1, blk_k, d)
    v_ref,  # VMEM (1, blk_k, d)
    do_ref,  # VMEM (1, blk_q, d)
    lse_ref,  # VMEM (1, blk_q, 1)
    dd_ref,  # VMEM (1, blk_q, 1)
    dq_ref,  # VMEM (1, blk_q, d)
    dq_scr,  # VMEM (blk_q, d) fp32
    *,
    blk_k: int,
    scale: float,
    qscale: float,
    needs_mask: bool,
):
    """q-major pass: for one Q block, iterate K/V blocks, accumulate dQ."""
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    qp = (qp_ref[0].astype(jnp.float32) * qscale).astype(qp_ref.dtype)
    k = k_ref[0]
    do = do_ref[0]
    s2 = jax.lax.dot_general(
        qp, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if needs_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) + kidx * blk_k
        s2 = jnp.where(col < sk_ref[0], s2, _NEG_INF)
    p = jnp.exp2(s2 - lse_ref[0])
    dp = jax.lax.dot_general(
        do, v_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dd_ref[0])
    dq_scr[:] += jax.lax.dot_general(  # dS K -> (blk_q, d)
        ds.astype(k.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kidx == nk - 1)
    def _finish():
        dq_ref[0] = (dq_scr[:] * scale).astype(dq_ref.dtype)


def _flash_backward(
    qf: Array,
    kf: Array,
    vf: Array,
    of: Array,
    lse: Array,
    gf: Array,
    scale: float,
    interpret: bool = False,
):
    """Flat backward: all operands (BH, S, D); lse/dd (BH, Sq, 1)."""
    bh, sq, d = qf.shape
    sk = kf.shape[1]

    # The backward holds 4 operand blocks + 3 live fp32 (blk_q, blk_k)
    # intermediates + the dK/dV fp32 scratch accumulators in VMEM. Measured
    # on v5e at the SD hot shape (BH64/S4096/D40, in-scan): 512q/1024k
    # 9.5 ms vs 10.1 at 512/512 and 9.7 at 1024/1024 — wider K blocks halve
    # the Q re-reads in the dKV pass. At the VAE's 512-wide head the fp32
    # intermediates alone would be 3x2 MB/block-pair, so halve K there.
    cap_q = _env_block("GMDX_FLASH_BWD_BLKQ", 512)
    cap_k = _env_block("GMDX_FLASH_BWD_BLKK", 1024 if d <= 256 else 512)
    blk_q = min(cap_q, _round_up(sq, 128))
    blk_k = min(cap_k, _round_up(sk, 128))
    sq_p = _round_up(sq, blk_q)
    sk_p = _round_up(sk, blk_k)

    qp = qf  # scaled in-kernel (qscale) — see _flash_kernel
    dd = jnp.sum(
        gf.astype(jnp.float32) * of.astype(jnp.float32), axis=-1, keepdims=True
    )
    do = gf
    if sq_p != sq:
        pad = ((0, 0), (0, sq_p - sq), (0, 0))
        qp = jnp.pad(qp, pad)
        do = jnp.pad(do, pad)
        dd = jnp.pad(dd, pad)
        # Padded rows have dO = 0 so their dS/dV contributions vanish; any
        # finite LSE keeps exp2 from overflowing on those rows.
        lse = jnp.pad(lse, pad)
    kp, vp = kf, vf
    if sk_p != sk:
        pad = ((0, 0), (0, sk_p - sk), (0, 0))
        kp = jnp.pad(kf, pad)
        vp = jnp.pad(vf, pad)
    sk_arr = jnp.array([sk], jnp.int32)
    needs_mask = sk_p != sk
    dtype = qf.dtype

    q_spec = pl.BlockSpec((1, blk_q, d), lambda b, j, i, sk: (b, i, 0))
    k_spec = pl.BlockSpec((1, blk_k, d), lambda b, j, i, sk: (b, j, 0))
    row_spec = pl.BlockSpec((1, blk_q, 1), lambda b, j, i, sk: (b, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, blk_k=blk_k, qscale=scale * _LOG2_E,
            needs_mask=needs_mask,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, sk_p // blk_k, sq_p // blk_q),
            in_specs=[q_spec, k_spec, k_spec, q_spec, row_spec, row_spec],
            out_specs=[k_spec, k_spec],
            scratch_shapes=[
                pltpu.VMEM((blk_k, d), jnp.float32),
                pltpu.VMEM((blk_k, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk_p, d), dtype),
            jax.ShapeDtypeStruct((bh, sk_p, d), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * sq_p * sk_p * d,
            bytes_accessed=2 * bh * (2 * sq_p + 4 * sk_p) * d
            * qf.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p,
        ),
        interpret=interpret,
    )(sk_arr, qp, kp, vp, do, lse, dd)

    q_spec2 = pl.BlockSpec((1, blk_q, d), lambda b, i, j, sk: (b, i, 0))
    k_spec2 = pl.BlockSpec((1, blk_k, d), lambda b, i, j, sk: (b, j, 0))
    row_spec2 = pl.BlockSpec((1, blk_q, 1), lambda b, i, j, sk: (b, i, 0))
    (dq,) = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, blk_k=blk_k, scale=scale,
            qscale=scale * _LOG2_E, needs_mask=needs_mask,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, sq_p // blk_q, sk_p // blk_k),
            in_specs=[
                q_spec2, k_spec2, k_spec2, q_spec2, row_spec2, row_spec2
            ],
            out_specs=[q_spec2],
            scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, sq_p, d), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * sq_p * sk_p * d,
            bytes_accessed=2 * bh * (3 * sq_p + 2 * sk_p) * d
            * qf.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p,
        ),
        interpret=interpret,
    )(sk_arr, qp, kp, vp, do, lse, dd)

    if sq_p != sq:
        dq = dq[:, :sq]
    if sk_p != sk:
        dk = dk[:, :sk]
        dv = dv[:, :sk]
    return dq, dk, dv


def _flash_bsc_kernel(
    sk_ref,  # SMEM (1,): true (unpadded) key length
    q_ref,  # VMEM (1, blk_q, C)
    k_ref,  # VMEM (1, blk_k, C)
    v_ref,  # VMEM (1, blk_k, C)
    o_ref,  # VMEM (1, blk_q, C)
    m_scr,  # VMEM (H, blk_q, 128) per-head running row max
    l_scr,  # VMEM (H, blk_q, 128) per-head running row sum
    acc_scr,  # VMEM (H, blk_q, D) fp32 per-head accumulator
    *,
    blk_k: int,
    heads: int,
    head_dim: int,
    qscale: float,
    needs_mask: bool,
):
    """Head-packed flash forward: operands stay in the (tokens, H*D) layout
    the q/k/v projections produce, heads are static lane slices in-kernel.

    Rationale: the flattened-layout kernel needs a (B, S, H, D) ->
    (B*H, S, D) XLA transpose per operand per call, and those transposes
    are ~6.7% of the dual denoise step as standalone "data formatting" HBM
    round-trips (device trace, BENCHNOTES.md round 2). Lane-slicing the
    head axis inside the kernel replaces each HBM transpose with VPU
    shuffles on VMEM-resident blocks, amortized against the same matmuls.
    The slices are static (python-unrolled head loop), which Mosaic lowers
    without touching HBM.
    """
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # In-kernel Q scaling — same rationale as _flash_kernel.
    q = (q_ref[0].astype(jnp.float32) * qscale).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]

    col = None
    if needs_mask:
        col = (
            jax.lax.broadcasted_iota(
                jnp.int32, (q.shape[0], blk_k), 1
            )
            + kidx * blk_k
        )

    d = head_dim
    for h in range(heads):
        qh = jax.lax.slice_in_dim(q, h * d, (h + 1) * d, axis=1)
        kh = jax.lax.slice_in_dim(k, h * d, (h + 1) * d, axis=1)
        s = jax.lax.dot_general(
            qh,
            kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if needs_mask:
            s = jnp.where(col < sk_ref[0], s, _NEG_INF)

        m_prev = m_scr[h, :, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m_prev - m_new)

        l_scr[h] = jnp.broadcast_to(
            corr * l_scr[h, :, :1] + jnp.sum(p, axis=-1, keepdims=True),
            l_scr.shape[1:],
        )
        m_scr[h] = jnp.broadcast_to(m_new, m_scr.shape[1:])
        acc_scr[h] = corr * acc_scr[h] + jax.lax.dot_general(
            p.astype(v.dtype),
            jax.lax.slice_in_dim(v, h * d, (h + 1) * d, axis=1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kidx == nk - 1)
    def _finish():
        o_ref[0] = jnp.concatenate(
            [acc_scr[h] / l_scr[h, :, :1] for h in range(heads)], axis=-1
        ).astype(o_ref.dtype)


def _flash_forward_bsc(
    q: Array,
    k: Array,
    v: Array,
    heads: int,
    scale: float,
    interpret: bool = False,
) -> Array:
    """Inference forward over (B, S, H*D) operands; no LSE emitted."""
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // heads
    dtype = q.dtype

    # blk_q 512 (not the flattened kernel's 1024): the per-head m/l/acc
    # scratch is H-times replicated, 1024-row blocks would put the scratch
    # alone at ~10 MB of the ~16 MB VMEM.
    blk_q = min(_env_block("GMDX_FLASH_BLKQ_BSC", 512), _round_up(sq, 128))
    cap_k = 2048 if (d <= 160 and dtype.itemsize <= 2 and c <= 512) else 1024
    blk_k = min(_env_block("GMDX_FLASH_BLKK_BSC", cap_k), _round_up(sk, 128))
    sq_p = _round_up(sq, blk_q)
    sk_p = _round_up(sk, blk_k)

    qp = q
    if sq_p != sq:
        qp = jnp.pad(qp, ((0, 0), (0, sq_p - sq), (0, 0)))
    kp, vp = k, v
    if sk_p != sk:
        kp = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))
    sk_arr = jnp.array([sk], jnp.int32)
    needs_mask = sk_p != sk

    grid = (b, sq_p // blk_q, sk_p // blk_k)
    (out,) = pl.pallas_call(
        functools.partial(
            _flash_bsc_kernel,
            blk_k=blk_k,
            heads=heads,
            head_dim=d,
            qscale=scale * _LOG2_E,
            needs_mask=needs_mask,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, blk_q, c), lambda b, i, j, sk: (b, i, 0)),
                pl.BlockSpec((1, blk_k, c), lambda b, i, j, sk: (b, j, 0)),
                pl.BlockSpec((1, blk_k, c), lambda b, i, j, sk: (b, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, blk_q, c), lambda b, i, j, sk: (b, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((heads, blk_q, 128), jnp.float32),
                pltpu.VMEM((heads, blk_q, 128), jnp.float32),
                pltpu.VMEM((heads, blk_q, d), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, sq_p, c), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # The python-unrolled head loop keeps all H per-head score
            # buffers live (Mosaic schedules the independent head matmuls
            # together): H=8 fp32 (512, 2048) blocks = 32 MB of stack, past
            # the 16 MB default scoped limit but well within the physical
            # VMEM. Raising the cap preserves the wide k-blocks that the
            # block sweep showed dominate flash throughput (BENCHNOTES.md).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * sq_p * sk_p * d,
            bytes_accessed=2 * b * (sq_p + 2 * sk_p) * c * dtype.itemsize,
            transcendentals=b * heads * sq_p * sk_p,
        ),
        interpret=interpret,
    )(sk_arr, qp, kp, vp)
    return out[:, :sq] if sq_p != sq else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_bsc(
    q: Array, k: Array, v: Array, heads: int, scale: float,
    interpret: bool = False,
) -> Array:
    # Primal (inference) path: head-packed kernel, no transposes, no LSE.
    return _flash_forward_bsc(q, k, v, heads, scale, interpret)


def _bsc_to_bshd(x: Array, heads: int) -> Array:
    b, s, c = x.shape
    return x.reshape(b, s, heads, c // heads)


def _flash_bsc_vjp_fwd(q, k, v, heads, scale, interpret):
    # Differentiated path: reuse the flattened-layout forward (it emits the
    # LSE residual the backward kernels need) — training numerics and cost
    # are identical to the (B, S, H, D) entry point.
    out4, res = _flash_fwd(
        _bsc_to_bshd(q, heads), _bsc_to_bshd(k, heads),
        _bsc_to_bshd(v, heads), scale, interpret,
    )
    b, s, _, _ = out4.shape
    return out4.reshape(b, s, -1), res


def _flash_bsc_vjp_bwd(heads, scale, interpret, res, g):
    dq4, dk4, dv4 = _flash_bwd(scale, interpret, res, _bsc_to_bshd(g, heads))
    return tuple(x.reshape(x.shape[0], x.shape[1], -1) for x in (dq4, dk4, dv4))


_flash_bsc.defvjp(_flash_bsc_vjp_fwd, _flash_bsc_vjp_bwd)


def flash_attention_bsc(
    q: Array,
    k: Array,
    v: Array,
    heads: int,
    *,
    scale: float | None = None,
    interpret: bool = False,
) -> Array | None:
    """Flash attention over head-packed (B, S, H*D) operands.

    Same math as :func:`flash_attention`; the head axis never leaves the
    packed lane layout on the forward pass, so the projections' outputs
    feed the kernel with zero XLA transposes. Returns None if unsupported
    (dispatcher falls back). Differentiation routes through the flattened
    kernels, so training behavior matches :func:`flash_attention` exactly.
    """
    if q.ndim != 3 or k.ndim != 3 or v.ndim != 3:
        return None
    if q.shape[-1] % heads or k.shape[-1] != q.shape[-1]:
        return None
    d = q.shape[-1] // heads
    if d % 8:  # lane slices must stay sublane-aligned after relayout
        return None
    if jax.default_backend() != "tpu" and not interpret:
        return None
    if scale is None:
        scale = d**-0.5
    return _flash_bsc(q, k, v, heads, scale, interpret)


def _kvres_kernel(
    q_ref,  # VMEM (1, blk_q, C)
    k_ref,  # VMEM (1, skp, C) — whole (padded) key range, resident
    v_ref,  # VMEM (1, skp, C)
    o_ref,  # VMEM (1, blk_q, C)
    *,
    heads: int,
    head_dim: int,
    qscale: float,
    sk: int,
):
    """KV-resident exact-softmax attention (head-packed layout).

    At the UNet's self-attention shapes the whole K/V fits VMEM (<=10.5 MB
    at 4096x320), so flash attention's ONLINE softmax — the running
    max/sum scratch, the correction multiplies, the (H, blk_q, 128)
    broadcast writes, all paid per k-block per head — is pure overhead:
    with one resident k-range the row softmax is exact in one pass.
    Fewer VPU ops per logit also matters because at d_head=40 the kernel
    is shape-capped on the MXU (K=40 of 128 lanes, ~31% ceiling) and the
    measured flash kernel ran ~25% (7 ms vs 5.6 structural per CFG
    invocation, BENCHNOTES.md round-2 end note): the serialized softmax
    between the two matmuls is the gap. The per-head score buffer is a
    VMEM value (blk_q x skp fp32), never HBM."""
    q = (q_ref[0].astype(jnp.float32) * qscale).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    skp = k.shape[0]
    col = None
    if skp != sk:  # static shapes under jit — no scalar prefetch needed
        col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], skp), 1)
    d = head_dim
    outs = []
    for h in range(heads):
        qh = jax.lax.slice_in_dim(q, h * d, (h + 1) * d, axis=1)
        kh = jax.lax.slice_in_dim(k, h * d, (h + 1) * d, axis=1)
        s = jax.lax.dot_general(
            qh,
            kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_q, skp) fp32
        if col is not None:
            s = jnp.where(col < sk, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype),
            jax.lax.slice_in_dim(v, h * d, (h + 1) * d, axis=1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((o / l).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _kvres_pick_blkq(sq: int, sk_p: int, c: int, heads: int,
                     itemsize: int) -> int:
    """Largest q-block whose live set fits the VMEM budget. Mosaic's
    greedy scheduler keeps the python-unrolled heads' score buffers live
    together (cf. the bsc kernel note), so budget all H of them:
    k + v resident + H * blk_q * skp * (4 fp32 + itemsize bf16 p)."""
    want = _env_block("GMDX_ATTN_KVRES_BLKQ", 512)
    kv = 2 * sk_p * c * itemsize
    for blk in (512, 256, 128):
        if blk > want:
            continue
        live = kv + heads * blk * sk_p * (4 + itemsize)
        if live <= 80 * 1024 * 1024:
            return min(blk, _round_up(sq, 128))
    return 0


def _kvres_forward(q, k, v, heads, scale, interpret=False):
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // heads
    dtype = q.dtype
    sk_p = _round_up(sk, 128)
    blk_q = _kvres_pick_blkq(sq, sk_p, c, heads, dtype.itemsize)
    if blk_q == 0:
        return None
    sq_p = _round_up(sq, blk_q)
    qp = q
    if sq_p != sq:
        qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    kp, vp = k, v
    if sk_p != sk:
        kp = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))

    grid = (b, sq_p // blk_q)
    (out,) = pl.pallas_call(
        functools.partial(
            _kvres_kernel, heads=heads, head_dim=d,
            qscale=scale * _LOG2_E, sk=sk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, c), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, sk_p, c), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, sk_p, c), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, blk_q, c), lambda b, i: (b, i, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, sq_p, c), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * sq_p * sk_p * d,
            bytes_accessed=2 * b * (sq_p + 2 * sk_p) * c * dtype.itemsize,
            transcendentals=b * heads * sq_p * sk_p,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq] if sq_p != sq else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attn_kvres(q, k, v, heads, scale, interpret=False):
    return _kvres_forward(q, k, v, heads, scale, interpret)


def _attn_kvres_vjp_fwd(q, k, v, heads, scale, interpret):
    # Differentiated path: the flattened flash forward (emits the LSE the
    # backward kernels need) — training numerics/cost identical to
    # flash_attention_bsc's.
    out4, res = _flash_fwd(
        _bsc_to_bshd(q, heads), _bsc_to_bshd(k, heads),
        _bsc_to_bshd(v, heads), scale, interpret,
    )
    b, s, _, _ = out4.shape
    return out4.reshape(b, s, -1), res


def _attn_kvres_vjp_bwd(heads, scale, interpret, res, g):
    dq4, dk4, dv4 = _flash_bwd(scale, interpret, res, _bsc_to_bshd(g, heads))
    return tuple(
        x.reshape(x.shape[0], x.shape[1], -1) for x in (dq4, dk4, dv4)
    )


_attn_kvres.defvjp(_attn_kvres_vjp_fwd, _attn_kvres_vjp_bwd)


def attention_kv_resident(
    q: Array,
    k: Array,
    v: Array,
    heads: int,
    *,
    scale: float | None = None,
    interpret: bool = False,
) -> Array | None:
    """Exact-softmax attention with the whole K/V range VMEM-resident,
    over head-packed (B, S, H*D) operands. Returns None when the shape
    does not fit the budget (dispatcher falls back to flash)."""
    if q.ndim != 3 or k.ndim != 3 or v.ndim != 3:
        return None
    if q.shape[-1] % heads or k.shape[-1] != q.shape[-1]:
        return None
    d = q.shape[-1] // heads
    if d % 8:
        return None
    if jax.default_backend() != "tpu" and not interpret:
        return None
    if _kvres_pick_blkq(
        q.shape[1], _round_up(k.shape[1], 128), q.shape[-1], heads,
        q.dtype.itemsize,
    ) == 0:
        return None  # budget miss — checked HERE so the vjp fn never fails
    if scale is None:
        scale = d**-0.5
    return _attn_kvres(q, k, v, heads, scale, interpret)


def _xattn_kernel(
    q_ref,  # VMEM (1, blk_q, C)
    k_ref,  # VMEM (1, skp, C) — whole (padded) key range, resident
    v_ref,  # VMEM (1, skp, C)
    o_ref,  # VMEM (1, blk_q, C)
    *,
    heads: int,
    head_dim: int,
    sk: int,
    qscale: float,
    needs_mask: bool,
):
    """Short-K head-packed attention (cross-attention over text tokens).

    With the whole key range in one block (77 CLIP tokens pad to 128
    sublanes) there is nothing "online" about the softmax: per head it is
    one (blk_q, skp) score matmul, an exact row softmax, and one PV matmul
    — none of the running-max/correction machinery the long-K kernels need
    (which is exactly why routing these shapes to the BSC kernel measured
    0.7676 vs 0.8311, BENCHNOTES.md round 2). Operands stay head-packed, so
    the XLA path's per-operand (B,S,H,D)->(B,H,S,D) transposes disappear
    too. K/V use constant-over-q index maps: fetched once per batch row and
    kept in VMEM across the q blocks.
    """
    q = (q_ref[0].astype(jnp.float32) * qscale).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    col = None
    if needs_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], k.shape[0]), 1)

    d = head_dim
    outs = []
    for h in range(heads):
        qh = jax.lax.slice_in_dim(q, h * d, (h + 1) * d, axis=1)
        kh = jax.lax.slice_in_dim(k, h * d, (h + 1) * d, axis=1)
        s = jax.lax.dot_general(
            qh,
            kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if needs_mask:
            s = jnp.where(col < sk, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v.dtype),
            jax.lax.slice_in_dim(v, h * d, (h + 1) * d, axis=1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(acc / l)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _xattn_forward_bsc(
    q: Array,
    k: Array,
    v: Array,
    heads: int,
    scale: float,
    interpret: bool = False,
) -> Array:
    """Inference forward over (B, S, H*D) operands, Sk <= one block."""
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // heads
    dtype = q.dtype

    blk_q = min(_env_block("GMDX_XATTN_BLKQ", 1024), _round_up(sq, 128))
    skp = _round_up(sk, 128)
    sq_p = _round_up(sq, blk_q)

    qp = q
    if sq_p != sq:
        qp = jnp.pad(qp, ((0, 0), (0, sq_p - sq), (0, 0)))
    kp, vp = k, v
    if skp != sk:
        kp = jnp.pad(k, ((0, 0), (0, skp - sk), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, skp - sk), (0, 0)))

    grid = (b, sq_p // blk_q)
    (out,) = pl.pallas_call(
        functools.partial(
            _xattn_kernel,
            heads=heads,
            head_dim=d,
            sk=sk,
            qscale=scale * _LOG2_E,
            needs_mask=skp != sk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, c), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, skp, c), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, skp, c), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, blk_q, c), lambda b, i: (b, i, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, sq_p, c), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * sq_p * skp * d,
            bytes_accessed=2 * b * (sq_p + 2 * skp) * c * dtype.itemsize,
            transcendentals=b * heads * sq_p * skp,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq] if sq_p != sq else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _xattn_bsc(
    q: Array, k: Array, v: Array, heads: int, scale: float,
    interpret: bool = False,
) -> Array:
    return _xattn_forward_bsc(q, k, v, heads, scale, interpret)


def _xattn_bsc_vjp_fwd(q, k, v, heads, scale, interpret):
    # Differentiated path: identical strategy to _flash_bsc — the flattened
    # forward emits the LSE residual the backward kernels consume.
    out4, res = _flash_fwd(
        _bsc_to_bshd(q, heads), _bsc_to_bshd(k, heads),
        _bsc_to_bshd(v, heads), scale, interpret,
    )
    b, s, _, _ = out4.shape
    return out4.reshape(b, s, -1), res


def _xattn_bsc_vjp_bwd(heads, scale, interpret, res, g):
    dq4, dk4, dv4 = _flash_bwd(scale, interpret, res, _bsc_to_bshd(g, heads))
    return tuple(
        x.reshape(x.shape[0], x.shape[1], -1) for x in (dq4, dk4, dv4)
    )


_xattn_bsc.defvjp(_xattn_bsc_vjp_fwd, _xattn_bsc_vjp_bwd)


def cross_attention_shortk(
    q: Array,
    k: Array,
    v: Array,
    heads: int,
    *,
    scale: float | None = None,
    interpret: bool = False,
) -> Array | None:
    """Head-packed attention for short key ranges (<= 128 after padding).

    Same math as :func:`flash_attention_bsc`; specialized single-k-block
    softmax (no online corrections). Returns None if unsupported."""
    if q.ndim != 3 or k.ndim != 3 or v.ndim != 3:
        return None
    if q.shape[-1] % heads or k.shape[-1] != q.shape[-1]:
        return None
    if k.shape[1] > 128:
        return None
    d = q.shape[-1] // heads
    if d % 8:
        return None
    if jax.default_backend() != "tpu" and not interpret:
        return None
    if scale is None:
        scale = d**-0.5
    return _xattn_bsc(q, k, v, heads, scale, interpret)


def _xla_flat(q, k, v, scale):
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", w, v)


def _flatten(x: Array):
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _unflatten(x: Array, b: int, h: int):
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_bshd(
    q: Array, k: Array, v: Array, scale: float, interpret: bool = False
) -> Array:
    b, _, h, _ = q.shape
    of, _ = _flash_forward(
        _flatten(q), _flatten(k), _flatten(v), scale, interpret
    )
    return _unflatten(of, b, h)


def _flash_fwd(q, k, v, scale, interpret):
    b, _, h, _ = q.shape
    qf, kf, vf = _flatten(q), _flatten(k), _flatten(v)
    of, lse = _flash_forward(qf, kf, vf, scale, interpret)
    return _unflatten(of, b, h), (qf, kf, vf, of, lse)


def _flash_bwd(scale, interpret, res, g):
    qf, kf, vf, of, lse = res
    b, _, h, _ = g.shape  # cotangent carries the static (B, S, H, D) shape
    gf = _flatten(g)
    if os.environ.get("GMDX_FLASH_BWD", "1") == "0":
        # XLA recompute fallback: materializes the (Sq, Sk) weights.
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_flat(q_, k_, v_, scale), qf, kf, vf
        )
        dqf, dkf, dvf = vjp(gf)
    else:
        dqf, dkf, dvf = _flash_backward(
            qf, kf, vf, of, lse, gf, scale, interpret
        )
    return (
        _unflatten(dqf, b, h),
        _unflatten(dkf, b, h),
        _unflatten(dvf, b, h),
    )


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
