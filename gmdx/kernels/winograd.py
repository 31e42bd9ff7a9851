"""Winograd F(2x2, 3x3) and F(4x4, 3x3) convolution as Pallas TPU kernels.

The SD-1.5 UNet's 3x3 stride-1 resnet convolutions are ~48% of the dual
denoise step (BENCHNOTES.md round 2 trace), running at 73-97% MXU on XLA's
direct lowering — further direct-conv tuning is capped. Winograd changes
the arithmetic itself: with 2x2 output tiles, each tile costs 16 transform-
domain multiplies instead of 36 direct MACs (2.25x fewer; 4x with the 4x4
tiles of F(4x4, 3x3) — implemented and opt-in via GMDX_WINOGRAD_M=4, but
measured transform-bound and net-slower on TPU, see ``_select_tiling``),
and the transform-domain contraction is over the FULL channel depth
(C = 320-1280) instead of 9-tap patches, which is exactly the MXU's
preferred shape.

Math (Lavin & Gray, arXiv:1509.09308):
    Y = A^T [ (G g G^T) .* (B^T d B) ] A        per 4x4 input tile d,
with
    B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
    G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]
    A^T = [[1,1,1,0],[0,1,-1,-1]]
Summed over channels, the elementwise product becomes, for each of the 16
transform points, one (tiles, C) @ (C, O) matmul.

Kernel design (see /opt/skills/guides/pallas_guide.md):
  * Grid (B,) — one whole image per grid step, sequential ("arbitrary") so
    the weight transform runs ONCE into VMEM scratch at step 0 and is
    reused by every image (weights are loop-constants inside the denoise
    scan; transforming in-kernel avoids materializing the 16/9x-sized U in
    HBM every scan step — XLA does not hoist weight-expanding ops out of
    scans, cf. the fused-QKV A/B in BENCHNOTES.md).
  * The 16 shifted input planes d_ij are built in VMEM from a
    parity-in-lanes layout: the padded image is reshaped — FREE, row-major
    compatible, no copy — to (B, Tp, 2, Tp, 2C), so each phase plane is
    one untiled index plus one lane slice, then static unit-stride slices.
    Mosaic rejects stride-2 vector slices; an XLA-side 6D phase transpose
    measured ~10 ms/iter of formatting passes across the dual step, and an
    in-kernel sublane-split reshape (tiling as (2, C)) was catastrophically
    slower still (0.744 vs 0.843 img/s) — the lane-merge layout avoids
    both (BENCHNOTES.md).
  * Input/weight transforms and the output transform accumulate in fp32
    (entries of B/G/A are 0, +-1, +-0.5 — the sums are exact in fp32);
    the 16 matmuls run in the input dtype with fp32 accumulation.
  * VMEM pressure is managed by splitting tile ROWS across a second
    sequential grid dim (whole-image input block stays resident; compute
    and output slabs shrink 1/split).
  * Training: under AD the custom-VJP forward rule routes the PRIMAL
    through the direct XLA conv too by default (not just the backward) —
    custom-call boundaries pin conv inputs as opaque residuals and block
    XLA's pad-fusion/remat scheduling, which RESOURCE_EXHAUSTED the
    batch-8 512^2 Stage-2 step. GMDX_WINOGRAD_TRAIN=1 opts the kernel
    primal back in where memory allows (measured 6.9% faster at batch 4).
    Backward is always XLA's native conv gradients.

Replaces nothing in the reference (its convs run through cuDNN); this is
TPU-native performance work on the same math.
"""

from __future__ import annotations

import functools
import os

from gmdx.dist.tpctx import active as _tp_active

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# B^T, G, A^T for F(2x2, 3x3).
_BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
_G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
_AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)

# B^T, G, A^T for F(4x4, 3x3): 36 transform-domain multiplies per 4x4
# output tile — 2.25 MACs/output vs direct 9 (4x fewer) and 1.78x fewer
# than F(2x2, 3x3). Built by Cook-Toom over interpolation points
# {0, 1, -1, 2, -1/2} (+inf) instead of Lavin & Gray's classic
# {0, ±1, ±2}: the asymmetric set spreads the Vandermonde magnitudes, and
# the bf16 transform-domain error (input cast + V cast + output-transform
# cancellation, simulated end to end) drops 3x — mean max-rel-err 0.0144
# vs 0.0436 classic, against 0.0054 inherent to a direct bf16 conv (the
# same reason Barabasz & Gregg, arXiv:1803.10986, move off symmetric
# points for fp16). Verified exact (<1e-9) against the direct conv in
# fp64 at generation time.
_BT4 = np.array(
    [
        [1, 1.5, -2, -1.5, 1, 0],
        [0, -1, -2.5, -0.5, 1, 0],
        [0, 1, 0.5, -2.5, 1, 0],
        [0, -0.5, -1, 0.5, 1, 0],
        [0, 2, -1, -2, 1, 0],
        [0, 1, 1.5, -2, -1.5, 1],
    ],
    np.float32,
)
_G4 = np.array(
    [
        [1, 0, 0],
        [-1 / 3, -1 / 3, -1 / 3],
        [1 / 3, -1 / 3, 1 / 3],
        [1 / 15, 2 / 15, 4 / 15],
        [-16 / 15, 8 / 15, -4 / 15],
        [0, 0, 1],
    ],
    np.float32,
)
_AT4 = np.array(
    [
        [1, 1, 1, 1, 1, 0],
        [0, 1, -1, 2, -0.5, 0],
        [0, 1, 1, 4, 0.25, 0],
        [0, 1, -1, 8, -0.125, 1],
    ],
    np.float32,
)

# Fudged working-set budget (bytes): the pallas_call's vmem_limit_bytes is
# 110 MB; keep the estimate x fudge under 100 for headroom.
_VMEM_CAP = 100 * 1024 * 1024


def _vmem_estimate(
    h: int, w: int, c: int, o: int, itemsize: int, split: int,
    g_itemsize: int = 4,
) -> int:
    """Working-set estimate for one grid step processing 1/split of the
    tile rows and o output channels (the chunk width). Calibrated against
    Mosaic's scoped-vmem accounting (which keeps all 16 fp32 d-plane
    upcasts + double-buffered blocks live): the caller multiplies by
    _MOSAIC_FUDGE."""
    t = (h // 2) * (w // 2) // split
    trs = h // 2 // split
    x_blk = (h + 2) * (w + 2) * c * itemsize  # whole image stays resident
    slab = 3 * (2 * trs + 2) * (w + 2) * c * itemsize  # slab + phase copies
    d_planes = 16 * t * c * itemsize  # shifted planes, input dtype
    v_f32 = 5 * t * c * 4  # fp32 V-sum transients
    y_acc = 4 * t * o * 4  # fp32 output-transform accumulators
    m_tmp = 2 * t * o * 4  # one live matmul output + a scaled copy
    u_scr = 16 * c * o * itemsize  # transformed weights (scratch)
    g_in = 9 * c * o * g_itemsize  # raw weights, PARAM dtype (usually fp32)
    out_blk = 4 * t * o * itemsize
    return (
        x_blk + slab + d_planes + v_f32 + y_acc + m_tmp + u_scr + g_in
        + out_blk
    )


# Measured: Mosaic's scoped allocation ran ~1.7x this estimate (113.4 MB vs
# 67 estimated at 32x32x1280->640), so budget against cap/fudge.
_MOSAIC_FUDGE = 1.7


def _vmem_estimate_stream(
    h: int, w: int, c: int, o: int, itemsize: int, trs: int,
    g_itemsize: int = 4,
) -> int:
    """Working-set estimate for the STREAMING variant: the padded image
    stays in HBM and each grid step DMAs only its (trs+1)-row slab into a
    VMEM scratch — the x_blk term of :func:`_vmem_estimate` collapses from
    whole-image to slab-sized, which is what lets 128x128+ images (VAE
    decode, 1024^2 UNet levels) tile at all."""
    tc = w // 2
    t = trs * tc
    slab_scr = (trs + 1) * (w + 2) * 2 * c * itemsize  # DMA'd parity slab
    slab = 3 * (2 * trs + 2) * (w + 2) * c * itemsize  # phase copies
    d_planes = 16 * t * c * itemsize
    v_f32 = 5 * t * c * 4
    y_acc = 4 * t * o * 4
    m_tmp = 2 * t * o * 4
    u_scr = 16 * c * o * itemsize
    g_in = 9 * c * o * g_itemsize
    out_blk = 4 * t * o * itemsize
    return (
        slab_scr + slab + d_planes + v_f32 + y_acc + m_tmp + u_scr + g_in
        + out_blk
    )


def _pick_tiling_stream(
    h: int, w: int, c: int, o: int, itemsize: int, g_itemsize: int
) -> tuple[int, int, int]:
    """(slab count, o-chunks, tile rows per slab) for the streaming
    variant, or (0, 0, 0). Tried only after :func:`_pick_tiling` fails —
    whole-image residency lets Mosaic double-buffer the image DMA across
    batch steps, so it stays preferred where it fits. When trs does not
    divide the tile rows the wrapper pads bottom rows (sliced off after);
    candidate trs values keep that waste <= trs-1 rows."""
    # The slab DMA slices the HBM-resident parity image along its tiled
    # minor dims, so the LANE dim (2C) must be a 128 multiple — otherwise
    # Mosaic's memref padding makes the full-width copy an unaligned slice.
    # (The parity-column dim is padded to 8 by the wrapper.)
    if (2 * c) % 128:
        return 0, 0, 0
    t_rows = h // 2
    for ochunks in (1, 2, 4, 5, 8, 10):
        if o % ochunks:
            continue
        if ochunks > 1 and (o // ochunks) % 128:
            continue
        for trs in (64, 32, 16, 8, 4):
            if trs > t_rows:
                continue
            est = _vmem_estimate_stream(
                h, w, c, o // ochunks, itemsize, trs, g_itemsize
            )
            if est * _MOSAIC_FUDGE <= _VMEM_CAP:
                split = -(-t_rows // trs)
                return split, ochunks, trs
    return 0, 0, 0


def _pick_tiling(
    h: int, w: int, c: int, o: int, itemsize: int, g_itemsize: int
) -> tuple[int, int]:
    """(tile-row split, output-channel chunks) whose fudged working set
    fits VMEM, or (0, 0) for fallback. Output chunking pays a V-transform
    recompute per chunk, so prefer fewer chunks; the transformed weights
    (16*C*Ochunk) are the fixed cost that forces chunking at the
    1280-channel levels."""
    t_rows = h // 2
    for ochunks in (1, 2, 4, 5, 8):
        if o % ochunks:
            continue
        # Chunked blocks slice the lane dim: Mosaic requires the block's
        # last dim be a 128 multiple (or the full array dim, the
        # ochunks==1 case).
        if ochunks > 1 and (o // ochunks) % 128:
            continue
        for split in (1, 2, 4, 8):
            if t_rows % split:
                continue
            if t_rows // split < 4:
                break  # matmul rows too few to fill the MXU
            est = _vmem_estimate(
                h, w, c, o // ochunks, itemsize, split, g_itemsize
            )
            if est * _MOSAIC_FUDGE <= _VMEM_CAP:
                return split, ochunks
    return 0, 0


def _wino_kernel(
    x_ref,  # VMEM (1, Tp, 2, Tp, 2C) padded image, parity-in-lanes (whole)
    #          — or (1, Tp, 2, Wp, C) half-parity (rows split, cols NHWC)
    g_ref,  # VMEM (9*C, Oc) conv kernel chunk, (k*3+l) tap-major rows
    b_ref,  # VMEM (1, Oc) bias chunk
    o_ref,  # parity_out: VMEM (1, Trs, 2, Tc, 2*O) parity-in-lanes slab;
    #          else (1, 2, 2, Trs, Tc, Oc) phase-major slab/chunk
    u_scr,  # VMEM (16*C, Oc) transformed weight chunk, input dtype
    *stream_scr,  # streaming only: slab VMEM scratch + DMA semaphore
    trs: int,  # tile rows per grid step
    tc: int,  # tile columns
    c: int,
    o_ch: int,  # output-channel chunk width
    parity_out: bool,
    stream: bool = False,  # x_ref is the FULL HBM array; DMA slabs in
    halfparity: bool = False,  # column parity gathered in-kernel (one-hot MXU)
    halfparity_out: bool = False,  # column parity scattered in-kernel on store
):
    # Grid (ochunk, batch, row-slab), all sequential. The o-chunk axis is
    # OUTERMOST so the weight transform below runs once per chunk (the
    # (b, s) counters restart under each oc).
    b_idx = pl.program_id(1)
    s_idx = pl.program_id(2)

    @pl.when(jnp.logical_and(b_idx == 0, s_idx == 0))
    def _transform_weights():
        # U'[xi,nu] = s_xi s_nu sum_kl G[xi,k] G[nu,l] g[k,l] — fp32 sums,
        # stored in the matmul dtype. ~60 flops per (c,o) element, once per
        # call. s_2 = -1 (else +1) pre-applies the sign the factored input
        # transform drops by computing its xi==2/nu==2 row as d1-d2 instead
        # of -d1+d2 (see the apply loop below).
        # The upcast happens fused with each coef multiply: pre-upcasting
        # all 9 (C, O) planes kept ~30 MB of fp32 live in this branch at
        # the 1280->640 level and dominated the kernel's scoped-VMEM stack
        # (the apply path's slabs are split, this branch isn't).
        for xi in range(4):
            for nu in range(4):
                sign = (-1.0 if xi == 2 else 1.0) * (
                    -1.0 if nu == 2 else 1.0
                )
                acc = None
                for k in range(3):
                    gk = sign * _G[xi, k]
                    if gk == 0.0:
                        continue
                    for l in range(3):
                        coef = gk * _G[nu, l]
                        if coef == 0.0:
                            continue
                        plane = g_ref[
                            (k * 3 + l) * c : (k * 3 + l + 1) * c, :
                        ]
                        term = plane.astype(jnp.float32) * coef
                        acc = term if acc is None else acc + term
                p = xi * 4 + nu
                u_scr[p * c : (p + 1) * c, :] = acc.astype(u_scr.dtype)

    dtype = o_ref.dtype

    # Build the 16 shifted planes d_ij[ty,tx] = xpad[2ty+i, 2tx+j] from the
    # parity-in-lanes layout: xpad[2a+p, 2b+q, ch] lives at
    # x_ref[0, a, p, b, q*C+ch], so a phase plane is one untiled index (p)
    # plus one LANE slice (q*C) — no sublane reshapes (a sublane-split
    # (Tp, 2, C) intermediate tiles as (2, C) and measured catastrophically
    # slow) and no XLA phase transpose (the 6D HBM transpose cost
    # ~10 ms/iter). The row slab loads with a dynamic start on the untiled
    # dim; 2ty+i = 2(ty+i//2) + i%2 makes the remaining slices static and
    # unit-stride.
    tp = x_ref.shape[3] // 2 if halfparity else x_ref.shape[3]
    row0 = s_idx * trs
    if stream:
        # Large-image variant: the padded image lives in HBM (ANY space);
        # DMA this step's (trs+1)-row slab into VMEM scratch. Synchronous
        # copy — slab bytes are microseconds at HBM bandwidth vs the
        # milliseconds of transform+matmul work per slab.
        slab_scr, dma_sem = stream_scr
        cp = pltpu.make_async_copy(
            x_ref.at[b_idx, pl.ds(row0, trs + 1)], slab_scr, dma_sem
        )
        cp.start()
        cp.wait()
        slabs = [slab_scr[:, p_row] for p_row in range(2)]
    else:
        slabs = [
            x_ref[0, pl.ds(row0, trs + 1), p_row]  # (trs+1, Tp, 2C)
            for p_row in range(2)
        ]
    if halfparity:
        # Half-parity input: rows are parity-split (free reshape — minor
        # dims unchanged) but columns arrive in raw NHWC order, so the XLA
        # NHWC -> parity-5D retile (HBM round trip at ~65% bandwidth for
        # every non-parity-fed conv) never happens. The column-parity
        # deinterleave runs HERE: Mosaic rejects stride-2 vector slices
        # (probed — vector.extract_strided_slice wants strides in [1, 2)),
        # so phases are gathered with one-hot MXU matmuls, one per slab
        # row with both q-parities stacked in M: P[s, w] selects
        # w == 2s (q=0 rows, s < tp8) or w == 2(s - tp8) + 1 (q=1 rows).
        # One-hot selection through the MXU is exact in any dtype (single
        # nonzero per row; fp32 accumulate) and rides a unit the kernel's
        # VPU-heavy transform phase leaves mostly idle.
        wp = x_ref.shape[3]
        tp8 = -(-tp // 8) * 8  # 8-aligned q-block so the slices are free
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * tp8, wp), 0)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * tp8, wp), 1)
        odd = s_iota >= tp8
        target = 2 * jnp.where(odd, s_iota - tp8, s_iota) + odd.astype(
            jnp.int32
        )
        # Rows with s % tp8 >= tp have target >= 2*tp = wp: all-zero
        # automatically (w_iota < wp), so no explicit bounds mask.
        p_sel = (w_iota == target).astype(dtype)
        phases = []
        for p_row in range(2):
            rows = [
                jax.lax.dot_general(
                    p_sel,
                    slabs[p_row][a],  # (Wp, C)
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dtype)  # (2*tp8, C) — exact: one-hot selection
                for a in range(trs + 1)
            ]
            st = jnp.stack(rows, axis=0)  # (trs+1, 2*tp8, C)
            phases.append(
                [st[:, :tp], st[:, tp8 : tp8 + tp]]
            )
    else:
        phases = [
            [
                jax.lax.slice_in_dim(
                    slabs[p_row], q * c, (q + 1) * c, axis=2
                )
                for q in range(2)
            ]
            for p_row in range(2)
        ]
    d = [
        [
            jax.lax.slice(
                phases[i % 2][j % 2],
                (i // 2, j // 2, 0),
                (i // 2 + trs, j // 2 + tc, c),
            )
            for j in range(4)
        ]
        for i in range(4)
    ]

    bias = b_ref[...].astype(jnp.float32)  # (1, O)

    # V = B^T d B, FACTORED (rows then columns): every B^T row has exactly
    # two ±1 entries, so the factored form costs 16 row ops + 16 column
    # ops = 32 fp32 add/subs vs 48 for the unfactored double sum (4 terms
    # per point) — still exact (entries ±1). Rows stream per-xi (only the
    # 4 r-planes of one xi live at a time), keeping the unfactored form's
    # slab VMEM budget. The xi==2 / nu==2 row is the NEGATION of the
    # xi==1 / nu==1 index pair ((-d1+d2) vs (d1+d2)); computing it as
    # d1-d2 and folding the sign into the transformed weights (see
    # ``_transform_weights``) removes every explicit negate — exactly one
    # VPU add/sub per transform point. Then M = V @ U' and the output
    # transform Y[p,q] += AT[p,xi] AT[q,nu] M[xi,nu] accumulates on the
    # fly (already sign-corrected through U').
    bt_pairs = ((0, 2, False), (1, 2, True), (1, 2, False), (1, 3, False))

    def _combine(a, b, add):
        return a + b if add else a - b

    y = [[None, None], [None, None]]
    for xi in range(4):
        a_i, b_i, add_i = bt_pairs[xi]
        r = [
            _combine(
                d[a_i][j].astype(jnp.float32),
                d[b_i][j].astype(jnp.float32),
                add_i,
            )
            for j in range(4)
        ]
        for nu in range(4):
            a_j, b_j, add_j = bt_pairs[nu]
            acc = _combine(r[a_j], r[b_j], add_j)
            v = acc.astype(dtype).reshape(trs * tc, c)
            p_idx = xi * 4 + nu
            m = jax.lax.dot_general(
                v,
                u_scr[p_idx * c : (p_idx + 1) * c, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (t*t, O) fp32
            for p in range(2):
                ap = _AT[p, xi]
                if ap == 0.0:
                    continue
                for q in range(2):
                    coef = ap * _AT[q, nu]
                    if coef == 0.0:
                        continue
                    term = m * coef
                    y[p][q] = term if y[p][q] is None else y[p][q] + term

    if halfparity_out:
        # Half-parity write: the output array is (B, T, 2, W, Oc) — rows
        # parity-split (free reshape to NHWC for the caller: minor dims
        # unchanged), columns in raw NHWC order. The column-parity
        # INTERLEAVE happens here with one one-hot MXU matmul per tile
        # row (S (2tc, 2tc) scatter: out_w = 2b+q reads the q-stacked
        # sublane concat of the two phase rows — exact selection). Unlike
        # the parity-in-lanes write this composes with output CHUNKING
        # (the chunk slices the O lane dim, untouched here), so it also
        # replaces the phase-major + XLA depth-to-space path.
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * tc, 2 * tc), 0)
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * tc, 2 * tc), 1)
        s_sel = (
            j_iota == (w_iota % 2) * tc + w_iota // 2
        ).astype(o_ref.dtype)
        for p in range(2):
            y0 = (y[p][0] + bias).astype(o_ref.dtype).reshape(trs, tc, o_ch)
            y1 = (y[p][1] + bias).astype(o_ref.dtype).reshape(trs, tc, o_ch)
            rows = [
                jax.lax.dot_general(
                    s_sel,
                    jax.lax.concatenate([y0[ty], y1[ty]], 0),  # (2tc, Oc)
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(o_ref.dtype)
                for ty in range(trs)
            ]
            o_ref[0, :, p] = jnp.stack(rows, axis=0)  # (trs, 2tc, Oc)
    elif parity_out:
        # Parity-in-lanes write: the output array is (B, T, 2, Tc, 2*O),
        # which the caller reshapes to NHWC for FREE — no XLA
        # depth-to-space pass (those passes were ~8% of the dual step).
        # Each phase plane lands at one untiled index + one lane slice,
        # the mirror of the input layout.
        for p in range(2):
            for q in range(2):
                o_ref[0, :, p, :, q * o_ch : (q + 1) * o_ch] = (
                    (y[p][q] + bias)
                    .astype(o_ref.dtype)
                    .reshape(trs, tc, o_ch)
                )
    else:
        # Phase-major write + one XLA depth-to-space outside: required when
        # output chunking is active (a parity-in-lanes chunk would be two
        # disjoint lane ranges — not a contiguous block).
        for p in range(2):
            for q in range(2):
                o_ref[0, p, q] = (
                    (y[p][q] + bias)
                    .astype(o_ref.dtype)
                    .reshape(trs, tc, o_ch)
                )


def _vmem_estimate4(
    h: int, w: int, c: int, o: int, itemsize: int, split: int,
    g_itemsize: int = 4,
) -> int:
    """F(4x4,3x3) working-set estimate, same calibration approach as
    :func:`_vmem_estimate`. Tiles are 4x fewer than F(2x2) but each carries
    36 planes; the input transform is streamed per-xi (6 fp32 row-transform
    planes live at a time) and the output transform accumulates into 24
    z-planes instead of materializing all 36 matmul outputs."""
    t = (h // 4) * (w // 4) // split
    trs = h // 4 // split
    hp = h + 4
    x_blk = hp * hp * c * itemsize  # whole padded image stays resident
    slab = 5 * (trs + 1) * hp * c * itemsize  # slab rows + 4 phase copies
    d_planes = 36 * t * c * itemsize
    rowt_f32 = 8 * t * c * 4  # 6 streamed row-transform planes + transients
    z_acc = 24 * t * o * 4  # fp32 output-transform accumulators
    m_tmp = 2 * t * o * 4
    u_scr = 36 * c * o * itemsize
    g_in = 9 * c * o * g_itemsize
    out_blk = 16 * t * o * itemsize
    return (
        x_blk + slab + d_planes + rowt_f32 + z_acc + m_tmp + u_scr + g_in
        + out_blk
    )


def _pick_tiling4(
    h: int, w: int, c: int, o: int, itemsize: int, g_itemsize: int
) -> tuple[int, int]:
    """F(4x4) analog of :func:`_pick_tiling`: (tile-row split, o-chunks)
    or (0, 0) for fallback. The transformed weights are 36*C*Ochunk — 2.25x
    the F(2x2) fixed cost — so chunking kicks in earlier."""
    t_rows = h // 4
    for ochunks in (1, 2, 4, 5, 8, 10):
        if o % ochunks:
            continue
        if ochunks > 1 and (o // ochunks) % 128:
            continue
        for split in (1, 2, 4, 8):
            if t_rows % split:
                continue
            if t_rows // split < 4:
                break
            est = _vmem_estimate4(
                h, w, c, o // ochunks, itemsize, split, g_itemsize
            )
            if est * _MOSAIC_FUDGE <= _VMEM_CAP:
                return split, ochunks
    return 0, 0


def _wino4_kernel(
    x_ref,  # VMEM (1, TpR, 4, TpC, 4C) padded image, parity-in-lanes
    g_ref,  # VMEM (9*C, Oc) conv kernel chunk, (k*3+l) tap-major rows
    b_ref,  # VMEM (1, Oc) bias chunk
    o_ref,  # parity_out: VMEM (1, Trs, 4, Tc, 4*O);
    #          else (1, 4, 4, Trs, Tc, Oc) phase-major slab/chunk
    u_scr,  # VMEM (36*C, Oc) transformed weight chunk, input dtype
    *,
    trs: int,  # tile rows per grid step
    tc: int,  # tile columns
    c: int,
    o_ch: int,  # output-channel chunk width
    parity_out: bool,
):
    """F(4x4, 3x3): same design as :func:`_wino_kernel` with three
    m=4-specific choices (all VMEM/VPU driven):
      * the input transform is FACTORED (rows then columns) — B^T has ~4
        nonzeros per row, so the unfactored double sum would be ~14 VPU
        terms per transform point vs ~8 factored;
      * only one xi's 6 row-transform planes are live at a time;
      * the output transform accumulates M into 24 z[p][nu] planes as each
        matmul completes, then reduces over nu — never 36 M planes live.
    """
    b_idx = pl.program_id(1)
    s_idx = pl.program_id(2)

    @pl.when(jnp.logical_and(b_idx == 0, s_idx == 0))
    def _transform_weights():
        # U[xi,nu] = sum_kl G4[xi,k] G4[nu,l] g[k,l] — fp32 sums (per-term
        # upcast, cf. _wino_kernel), stored in the matmul dtype.
        for xi in range(6):
            for nu in range(6):
                acc = None
                for k in range(3):
                    gk = _G4[xi, k]
                    if gk == 0.0:
                        continue
                    for l in range(3):
                        coef = gk * _G4[nu, l]
                        if coef == 0.0:
                            continue
                        plane = g_ref[
                            (k * 3 + l) * c : (k * 3 + l + 1) * c, :
                        ]
                        term = plane.astype(jnp.float32) * coef
                        acc = term if acc is None else acc + term
                p = xi * 6 + nu
                u_scr[p * c : (p + 1) * c, :] = acc.astype(u_scr.dtype)

    dtype = o_ref.dtype

    # Shifted planes d_ij[ty,tx] = xpad[4ty+i, 4tx+j]: xpad[4a+p, 4b+q, ch]
    # lives at x_ref[0, a, p, b, q*C+ch] — untiled index (p) + lane slice
    # (q*C) + static unit-stride slices, exactly the F(2x2) layout with
    # parity mod 4.
    row0 = s_idx * trs
    slabs = [
        x_ref[0, pl.ds(row0, trs + 1), p_row]  # (trs+1, TpC, 4C)
        for p_row in range(4)
    ]
    phases = [
        [
            jax.lax.slice_in_dim(slabs[p_row], q * c, (q + 1) * c, axis=2)
            for q in range(4)
        ]
        for p_row in range(4)
    ]
    d = [
        [
            jax.lax.slice(
                phases[i % 4][j % 4],
                (i // 4, j // 4, 0),
                (i // 4 + trs, j // 4 + tc, c),
            )
            for j in range(6)
        ]
        for i in range(6)
    ]

    bias = b_ref[...].astype(jnp.float32)  # (1, O)

    # Factored input transform + on-the-fly output accumulation:
    #   rowt[xi][j] = sum_i BT4[xi,i] d[i][j]        (per xi, streamed)
    #   V[xi,nu]    = sum_j BT4[nu,j] rowt[xi][j]
    #   M           = V @ U[xi,nu]
    #   z[p][nu]   += AT4[p,xi] M                     (24 accumulators)
    #   y[p][q]     = sum_nu AT4[q,nu] z[p][nu]
    z = [[None] * 6 for _ in range(4)]
    for xi in range(6):
        rowt = []
        for j in range(6):
            acc = None
            for i in range(6):
                bi = _BT4[xi, i]
                if bi == 0.0:
                    continue
                term = d[i][j].astype(jnp.float32) * bi
                acc = term if acc is None else acc + term
            rowt.append(acc)
        for nu in range(6):
            acc = None
            for j in range(6):
                bj = _BT4[nu, j]
                if bj == 0.0:
                    continue
                term = rowt[j] * bj
                acc = term if acc is None else acc + term
            v = acc.astype(dtype).reshape(trs * tc, c)
            p_idx = xi * 6 + nu
            m = jax.lax.dot_general(
                v,
                u_scr[p_idx * c : (p_idx + 1) * c, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (t, Oc) fp32
            for p in range(4):
                ap = _AT4[p, xi]
                if ap == 0.0:
                    continue
                term = m * ap
                z[p][nu] = term if z[p][nu] is None else z[p][nu] + term

    for p in range(4):
        for q in range(4):
            acc = None
            for nu in range(6):
                aq = _AT4[q, nu]
                if aq == 0.0:
                    continue
                term = z[p][nu] * aq
                acc = term if acc is None else acc + term
            y_pq = (acc + bias).astype(o_ref.dtype).reshape(trs, tc, o_ch)
            if parity_out:
                o_ref[0, :, p, :, q * o_ch : (q + 1) * o_ch] = y_pq
            else:
                o_ref[0, p, q] = y_pq


def _wino4_forward(x, kernel, bias, split, ochunks, pre_padded, interpret):
    """F(4x4) twin of :func:`_wino_forward`. ``pre_padded`` here means the
    1-px border (the GN handoff layout); m=4 needs (1 top, 3 bottom) so the
    bottom/right get 2 more zero columns — tiles never read them as data
    (max input row = H+1) but the mod-4 parity reshape needs Hp % 4 == 0."""
    if pre_padded:
        xp = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
        b, hp, wp, c = xp.shape
        h, w = hp - 4, wp - 4
    else:
        b, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
    o_ch = kernel.shape[-1]
    t_rows = h // 4
    tc = w // 4
    trs = t_rows // split
    oc_w = o_ch // ochunks

    tp = (h + 4) // 4
    xl = xp.reshape(b, tp, 4, tp, 4 * c)  # FREE, row-major compatible
    g2 = kernel.reshape(9 * c, o_ch)
    b2 = bias.reshape(1, o_ch)

    parity_out = ochunks == 1
    if parity_out:
        out_spec = pl.BlockSpec(
            (1, trs, 4, tc, 4 * o_ch),
            lambda oc, i, s: (i, s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (b, t_rows, 4, tc, 4 * o_ch), x.dtype
        )
    else:
        out_spec = pl.BlockSpec(
            (1, 4, 4, trs, tc, oc_w),
            lambda oc, i, s: (i, 0, 0, s, 0, oc),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (b, 4, 4, t_rows, tc, o_ch), x.dtype
        )

    (out,) = pl.pallas_call(
        functools.partial(
            _wino4_kernel, trs=trs, tc=tc, c=c, o_ch=oc_w,
            parity_out=parity_out,
        ),
        grid=(ochunks, b, split),
        in_specs=[
            pl.BlockSpec(
                (1, tp, 4, tp, 4 * c), lambda oc, i, s: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9 * c, oc_w), lambda oc, i, s: (0, oc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc_w), lambda oc, i, s: (0, oc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec],
        out_shape=[out_shape],
        scratch_shapes=[pltpu.VMEM((36 * c, oc_w), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 36 * t_rows * tc * c * o_ch,
            bytes_accessed=(b * ochunks * (h + 4) * (w + 4) * c
                            + 9 * c * o_ch
                            + b * h * w * o_ch) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xl, g2, b2)
    if parity_out:
        # (B, T, 4, Tc, 4*O) -> (B, H, W, O): FREE, row-major compatible.
        return out.reshape(b, h, w, o_ch)
    # Phase-major (B, 4, 4, T, Tc, O) -> (B, H, W, O).
    return out.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, o_ch)


def _conv3x3_reference(x: Array, kernel: Array, bias: Array) -> Array:
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(out.dtype)


def _conv3x3_valid(xp: Array, kernel: Array, bias: Array) -> Array:
    """The pre-padded twin of :func:`_conv3x3_reference` (VALID over a
    1-px zero-bordered input is the same map as SAME over the raw one)."""
    out = jax.lax.conv_general_dilated(
        xp,
        kernel.astype(xp.dtype),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(out.dtype)


def nhwc_to_parity5(x: Array) -> Array:
    """(B, H, W, C) -> the Winograd parity-in-lanes layout
    (B, H//2, 2, W//2, 2C). One row-major-compatible reshape — logically
    free, but XLA retiles the physical (8, 128) layout, so crossing this
    boundary costs a real HBM copy. The parity-chain plumbing exists to
    NOT cross it (see ResnetBlock2D)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2 * c)


def parity5_to_nhwc(x5: Array) -> Array:
    """Inverse of :func:`nhwc_to_parity5` (same retile caveat)."""
    b, t, _, tc, c2 = x5.shape
    return x5.reshape(b, 2 * t, 2 * tc, c2 // 2)


def _wino_forward(x, kernel, bias, split, ochunks, pre_padded, interpret,
                  stream=False, trs=0, parity_in=False, parity_out_req=False):
    if parity_in:
        # x IS the padded parity-in-lanes array (B, Tp_r, 2, Tp, 2C) — e.g.
        # straight from the parity-emitting GroupNorm kernel. No pad, no
        # reshape, no retile.
        xl = x
        b, tp_r, _, tp, c2 = x.shape
        c = c2 // 2
        h, w = 2 * (tp_r - 1), 2 * (tp - 1)
    elif pre_padded:
        xp = x
        b, hp, wp, c = x.shape
        h, w = hp - 2, wp - 2
    else:
        b, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    o_ch = kernel.shape[-1]
    t_rows = h // 2
    tc = w // 2
    if stream:
        # trs is chosen by the picker; split * trs may overshoot t_rows —
        # pad the bottom with zero rows and slice the surplus output rows
        # off after (<= 2*(trs-1) wasted rows of compute).
        t_rows_p = split * trs
        extra = 2 * (t_rows_p - t_rows)
        if extra:
            xp = jnp.pad(xp, ((0, 0), (0, extra), (0, 0), (0, 0)))
    else:
        trs = t_rows // split
        t_rows_p = t_rows
    oc_w = o_ch // ochunks  # chunk width

    halfparity = False
    if not parity_in:
        tp_r = t_rows_p + 1  # parity row count of the (maybe row-padded) img
        tp = (w + 2) // 2
        if not stream and os.environ.get(
            "GMDX_WINOGRAD_HALFPARITY", "1"
        ) == "1":
            # Half-parity handoff: split ONLY the row parity — the minor
            # two dims (Wp, C) are untouched, so this reshape is free at
            # the physical-layout level (no XLA retile; the full parity
            # reshape below costs an HBM round trip at ~65% bandwidth).
            # The kernel deinterleaves column parity in-VMEM via one-hot
            # MXU matmuls (see _wino_kernel). DEFAULT ON: standalone the
            # gather ties the XLA retile (both ~10-12 us/image, the
            # transition's data-movement floor), but IN-MODEL the retiles
            # run at only 7-10% of HBM bandwidth (~0.5 ms each in the
            # device trace) and the in+out fold measured +2.2% on the
            # dual bench (0.8686 -> 0.8873 img/s, BENCHNOTES.md round 3).
            halfparity = True
            xl = xp.reshape(b, tp_r, 2, w + 2, c)
        else:
            # Row-major-compatible reshape: row parity splits into an
            # untiled dim, column parity merges into the LANE dim.
            # Logically free, but XLA retiles the physical layout — the
            # parity_in path exists to skip this copy.
            xl = xp.reshape(b, tp_r, 2, tp, 2 * c)
    if stream and tp % 8:
        # The slab DMA slices the tiled HBM memref; its second-minor dim
        # (parity columns) must be 8-aligned or Mosaic rejects the copy.
        # Zero columns on the right are outside every d-plane slice
        # (which stop at tc + 1 <= tp), so geometry is unchanged.
        tp_pad = (tp + 7) // 8 * 8
        xl = jnp.pad(xl, ((0, 0), (0, 0), (0, 0), (0, tp_pad - tp), (0, 0)))
        tp = tp_pad
    g2 = kernel.reshape(9 * c, o_ch)
    b2 = bias.reshape(1, o_ch)

    parity_out = ochunks == 1
    # Half-parity write (same env switch as the input side): unless the
    # caller asked for the parity-5D layout (the resnet chain), emit the
    # row-parity-split NHWC-column layout — a free reshape to NHWC for
    # the caller, replacing BOTH the parity5->NHWC retile (unchunked) and
    # the phase-major XLA depth-to-space (chunked).
    halfparity_out = (
        not stream
        and not parity_out_req
        and os.environ.get("GMDX_WINOGRAD_HALFPARITY", "1") == "1"
    )
    if halfparity_out:
        out_spec = pl.BlockSpec(
            (1, trs, 2, w, oc_w),
            lambda oc, i, s: (i, s, 0, 0, oc),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (b, t_rows_p, 2, w, o_ch), x.dtype
        )
    elif parity_out:
        out_spec = pl.BlockSpec(
            (1, trs, 2, tc, 2 * o_ch),
            lambda oc, i, s: (i, s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (b, t_rows_p, 2, tc, 2 * o_ch), x.dtype
        )
    else:
        out_spec = pl.BlockSpec(
            (1, 2, 2, trs, tc, oc_w),
            lambda oc, i, s: (i, 0, 0, s, 0, oc),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (b, 2, 2, t_rows_p, tc, o_ch), x.dtype
        )

    if stream:
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((16 * c, oc_w), x.dtype),
            pltpu.VMEM((trs + 1, 2, tp, 2 * c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        x_blk = (1, tp_r, 2, w + 2, c) if halfparity else (1, tp_r, 2, tp, 2 * c)
        x_spec = pl.BlockSpec(
            x_blk, lambda oc, i, s: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        scratch = [pltpu.VMEM((16 * c, oc_w), x.dtype)]

    (out,) = pl.pallas_call(
        functools.partial(
            _wino_kernel, trs=trs, tc=tc, c=c, o_ch=oc_w,
            parity_out=parity_out, stream=stream, halfparity=halfparity,
            halfparity_out=halfparity_out,
        ),
        grid=(ochunks, b, split),
        in_specs=[
            x_spec,
            pl.BlockSpec((9 * c, oc_w), lambda oc, i, s: (0, oc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc_w), lambda oc, i, s: (0, oc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec],
        out_shape=[out_shape],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # Sequential axes: the weight transform at grid step (oc, 0, 0)
            # must complete before later steps reuse the scratch.
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 16 * t_rows_p * tc * c * o_ch,
            bytes_accessed=(b * ochunks
                            * (2 * t_rows_p + 2) * (w + 2) * c
                            + 9 * c * o_ch
                            + b * h * w * o_ch) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xl, g2, b2)
    if halfparity_out:
        # (B, T, 2, W, O) -> (B, H, W, O): minor dims unchanged — free at
        # the physical-layout level (the whole point of the mode).
        out = out.reshape(b, 2 * t_rows_p, w, o_ch)
    elif parity_out:
        if parity_out_req:
            # Caller consumes the parity layout directly (the parity-GN
            # kernel / a parity_in conv downstream) — skip the reshape and
            # the XLA retile it implies. Gated on non-stream + ochunks==1
            # by winograd_parity_io, so t_rows_p == t_rows here.
            return out  # (B, T, 2, Tc, 2*O)
        # (B, Tp, 2, Tc, 2*O) -> (B, Hp, W, O): row-major compatible.
        out = out.reshape(b, 2 * t_rows_p, w, o_ch)
    else:
        # Phase-major (B, 2, 2, Tp, Tc, O) -> (B, Hp, W, O): same
        # depth-to-space pattern as the sub-pixel Upsample2D.
        out = out.transpose(0, 3, 1, 4, 2, 5).reshape(
            b, 2 * t_rows_p, w, o_ch
        )
    return out[:, :h] if t_rows_p != t_rows else out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11)
)
def _wino_conv(x, kernel, bias, split, ochunks=1, pre_padded=False,
               interpret=False, m=2, stream=False, trs=0, parity_in=False,
               parity_out=False):
    if m != 2:
        return _wino4_forward(
            x, kernel, bias, split, ochunks, pre_padded, interpret
        )
    return _wino_forward(
        x, kernel, bias, split, ochunks, pre_padded, interpret, stream, trs,
        parity_in, parity_out,
    )


def _ref_conv_layouts(pre_padded, parity_in, parity_out):
    """The direct-XLA-conv twin of the kernel dispatch at a given layout
    combination — the training primal/backward path (reshapes here are
    XLA retiles, paid only under AD)."""

    def ref(x, kernel, bias):
        if parity_in:
            x = parity5_to_nhwc(x)
            out = _conv3x3_valid(x, kernel, bias)
        elif pre_padded:
            out = _conv3x3_valid(x, kernel, bias)
        else:
            out = _conv3x3_reference(x, kernel, bias)
        return nhwc_to_parity5(out) if parity_out else out

    return ref


def _wino_fwd(x, kernel, bias, split, ochunks, pre_padded, interpret, m,
              stream=False, trs=0, parity_in=False, parity_out=False):
    # Under differentiation (training), the primal defaults to the DIRECT
    # XLA conv, not the Pallas kernel: custom-call boundaries pin every
    # conv input as an opaque residual and block XLA's pad-fusion/remat
    # scheduling — with the kernel in the differentiated path the batch-8
    # 512^2 Stage-2 step RESOURCE_EXHAUSTED where the direct path fits.
    # Measured at batch 4 (where both fit) the kernel primal is 6.9%
    # faster (260.2 vs 278.2 ms/step) — GMDX_WINOGRAD_TRAIN=1 opts in for
    # memory-headroom configs. Inference paths (no VJP rule engaged)
    # always use the kernel.
    if os.environ.get("GMDX_WINOGRAD_TRAIN", "0") == "1":
        out = _wino_conv(
            x, kernel, bias, split, ochunks, pre_padded, interpret, m,
            stream, trs, parity_in, parity_out,
        )
    else:
        out = _ref_conv_layouts(pre_padded, parity_in, parity_out)(
            x, kernel, bias
        )
    return out, (x, kernel, bias)


def _wino_bwd(split, ochunks, pre_padded, interpret, m, stream, trs,
              parity_in, parity_out, res, g):
    x, kernel, bias = res
    ref = _ref_conv_layouts(pre_padded, parity_in, parity_out)
    _, vjp = jax.vjp(ref, x, kernel, bias)
    return vjp(g)


_wino_conv.defvjp(_wino_fwd, _wino_bwd)


def _select_tiling(
    h: int, w: int, c: int, o_ch: int, itemsize: int, g_itemsize: int
) -> tuple[int, int, int, bool, int]:
    """(m, split, ochunks, stream, trs) for the best eligible Winograd
    variant, or (0, 0, 0, False, 0) for direct-conv fallback. ``stream``
    selects the HBM-resident-input variant (large images); ``trs`` is the
    tile rows per grid step (split * trs >= h // 2, the excess padded).

    ``GMDX_WINOGRAD_M``: "4" forces F(4x4) wherever it tiles (falling back
    to F(2x2) where it cannot); default is F(2x2) everywhere — the per-shape
    TPU A/B (BENCHNOTES.md round 2) measured F(4x4) SLOWER than F(2x2) on
    10 of 12 covered UNet conv shapes and the end-to-end dual bench
    regressed 7.3% under auto-m=4 dispatch: the 36-point factored input
    transform is ~3x the VPU work of F(2x2)'s 16 fused 4-term sums, and the
    kernel is transform-bound, not matmul-bound, at these channel depths.
    """
    mode = os.environ.get("GMDX_WINOGRAD_M", "2")
    if mode == "4" and h % 4 == 0 and h >= 16:
        split, ochunks = _pick_tiling4(h, w, c, o_ch, itemsize, g_itemsize)
        if split:
            return 4, split, ochunks, False, 0
    split, ochunks = _pick_tiling(h, w, c, o_ch, itemsize, g_itemsize)
    if split:
        return 2, split, ochunks, False, h // 2 // split
    # The streaming tier (HBM-resident input, per-slab DMA) is OPT-IN: it
    # extends coverage to 256^2+ images (VAE decode tail, >=2048^2 UNets)
    # but measured 2.1-2.4x SLOWER than the direct XLA conv there — the
    # synchronous slab copy serializes every grid step and the transform
    # is VPU-bound at those channel depths (BENCHNOTES.md round 2).
    if os.environ.get("GMDX_WINOGRAD_STREAM", "0") == "1":
        split, ochunks, trs = _pick_tiling_stream(
            h, w, c, o_ch, itemsize, g_itemsize
        )
        if split:
            return 2, split, ochunks, True, trs
    return 0, 0, 0, False, 0


def winograd_eligible(
    shape, out_ch: int, itemsize: int, interpret: bool = False
) -> bool:
    """Whether :func:`winograd_conv3x3` would dispatch the F(2x2) kernel
    for an UNPADDED NHWC input shape (trace-time; lets producers
    pre-arrange the 1-px zero-bordered layout that kernel consumes).
    F(4x4) dispatches need a (1, 3) border — a pre-arranged 1-px pad would
    cost an extra XLA pad copy, so they report False here and the kernel
    pads internally from the raw image instead."""
    if os.environ.get("GMDX_WINOGRAD", "1") != "1" or os.environ.get(
        "GMDX_NO_PALLAS", "0"
    ) == "1" or _tp_active() is not None:
        return False
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    if h != w or h % 2 or h < 16:
        return False
    if c % 8 or out_ch % 8:
        return False
    if _select_tiling(h, w, c, out_ch, itemsize, itemsize)[0] != 2:
        return False
    return interpret or jax.default_backend() == "tpu"


def winograd_parity_io(
    shape, out_ch: int, itemsize: int, interpret: bool = False,
    io: str = "out",
) -> bool:
    """Whether a conv at this UNPADDED NHWC shape dispatches the F(2x2)
    kernel with native parity-5D I/O, letting the resnet chain
    conv1 -> GN2 -> conv2 skip the XLA retiles entirely.

    ``io="in"``: the input side — needs only the F(2x2) non-streaming
    kernel (the input image block is never chunked). ``io="out"``: the
    output side additionally needs ochunks==1 (a chunked parity write
    would span two disjoint lane ranges)."""
    if not winograd_eligible(shape, out_ch, itemsize, interpret):
        return False
    b, h, w, c = shape
    m, _split, ochunks, stream, _trs = _select_tiling(
        h, w, c, out_ch, itemsize, itemsize
    )
    if m != 2 or stream:
        return False
    return ochunks == 1 or io == "in"


def winograd_conv3x3(
    x: Array,
    kernel: Array,
    bias: Array,
    *,
    pre_padded: bool = False,
    parity_in: bool = False,
    parity_out: bool = False,
    interpret: bool = False,
) -> Array | None:
    """3x3 stride-1 SAME conv over NHWC via Winograd — F(4x4, 3x3) where it
    tiles (2.25 transform-domain MACs per output vs direct 9), F(2x2, 3x3)
    otherwise (4 vs 9).

    ``pre_padded=True`` takes the 1-px zero-bordered image (B, H+2, W+2, C)
    — e.g. straight from the pad-emitting GroupNorm kernel — and skips the
    XLA pad pass (the F(4x4) path needs a (1, 3) border and re-pads, so
    producers should consult :func:`winograd_eligible` first).

    Returns None when the shape is unsupported (odd/non-square spatial,
    tiny grids where the matmuls cannot fill the MXU, or a working set past
    the VMEM budget) — callers fall back to the direct XLA conv.
    ``GMDX_WINOGRAD=0`` disables globally; ``GMDX_WINOGRAD_M`` forces a
    tile size (see :func:`_select_tiling`).
    """
    if os.environ.get("GMDX_WINOGRAD", "1") != "1" or os.environ.get(
        "GMDX_NO_PALLAS", "0"
    ) == "1" or _tp_active() is not None:
        return None
    if kernel.shape[:2] != (3, 3):
        return None
    if parity_in:
        # x is the PADDED parity-5D array (B, Tp_r, 2, Tp, 2C).
        if x.ndim != 5:
            return None
        b = x.shape[0]
        h, w = 2 * (x.shape[1] - 1), 2 * (x.shape[3] - 1)
        c = x.shape[4] // 2
    elif x.ndim != 4:
        return None
    else:
        b, h, w, c = x.shape
        if pre_padded:
            h, w = h - 2, w - 2
    o_ch = kernel.shape[-1]
    if h != w or h % 2 or h < 16:
        return None
    if c % 8 or o_ch % 8:
        return None
    # Prefer feeding weights in their PARAM dtype (usually fp32): a
    # pre-cast materializes an unfused convert_element_type per conv per
    # denoise step (custom-call operands cannot fuse). But an fp32 g block
    # costs 2x VMEM, and at the 1280-channel levels that forced a WORSE
    # tiling or a fallback — measured net -0.4% on the dual bench. So:
    # keep the param dtype only when the tiling decision is unchanged;
    # otherwise cast and accept the (smaller) convert cost.
    tiling_x = _select_tiling(
        h, w, c, o_ch, x.dtype.itemsize, x.dtype.itemsize
    )
    if kernel.dtype != x.dtype:
        tiling_g = _select_tiling(
            h, w, c, o_ch, x.dtype.itemsize, kernel.dtype.itemsize
        )
        if tiling_g != tiling_x:
            kernel = kernel.astype(x.dtype)
            bias = bias.astype(x.dtype)
    m, split, ochunks, stream, trs = tiling_x
    if m == 0:
        return None
    if jax.default_backend() != "tpu" and not interpret:
        return None
    # Parity I/O is only kernel-native for unchunked, non-streaming F(2x2)
    # (winograd_parity_io gates callers) — on a mismatched tiling convert
    # at the boundary so the call stays correct (status-quo retile cost).
    p_in = parity_in and m == 2 and not stream
    p_out = parity_out and m == 2 and ochunks == 1 and not stream
    if parity_in and not p_in:
        x = parity5_to_nhwc(x)  # parity input is always the padded image
        pre_padded = True
    out = _wino_conv(
        x, kernel, bias, split, ochunks, pre_padded, interpret, m,
        stream, trs, p_in, p_out,
    )
    if parity_out and not p_out:
        out = nhwc_to_parity5(out)
    return out


__all__ = [
    "winograd_conv3x3",
    "winograd_eligible",
    "winograd_parity_io",
    "nhwc_to_parity5",
    "parity5_to_nhwc",
]
