"""Winograd F(2x2, 3x3) convolution as a Pallas TPU kernel.

The SD-1.5 UNet's 3x3 stride-1 resnet convolutions are ~48% of the dual
denoise step (BENCHNOTES.md round 2 trace), running at 73-97% MXU on XLA's
direct lowering — further direct-conv tuning is capped. Winograd changes
the arithmetic itself: with 2x2 output tiles, each tile costs 16 transform-
domain multiplies instead of 36 direct MACs (2.25x fewer), and the
transform-domain contraction is over the FULL channel depth (C = 320-1280)
instead of 9-tap patches, which is exactly the MXU's preferred shape.

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
    g_ref,  # VMEM (9*C, Oc) conv kernel chunk, (k*3+l) tap-major rows
    b_ref,  # VMEM (1, Oc) bias chunk
    o_ref,  # parity_out: VMEM (1, Trs, 2, Tc, 2*O) parity-in-lanes slab;
    #          else (1, 2, 2, Trs, Tc, Oc) phase-major slab/chunk
    u_scr,  # VMEM (16*C, Oc) transformed weight chunk, input dtype
    *,
    trs: int,  # tile rows per grid step
    tc: int,  # tile columns
    c: int,
    o_ch: int,  # output-channel chunk width
    parity_out: bool,
):
    # Grid (ochunk, batch, row-slab), all sequential. The o-chunk axis is
    # OUTERMOST so the weight transform below runs once per chunk (the
    # (b, s) counters restart under each oc).
    b_idx = pl.program_id(1)
    s_idx = pl.program_id(2)

    @pl.when(jnp.logical_and(b_idx == 0, s_idx == 0))
    def _transform_weights():
        # U[xi,nu] = sum_kl G[xi,k] G[nu,l] g[k,l]  — fp32 sums, stored in
        # the matmul dtype. ~60 flops per (c,o) element, once per call.
        # The upcast happens fused with each coef multiply: pre-upcasting
        # all 9 (C, O) planes kept ~30 MB of fp32 live in this branch at
        # the 1280->640 level and dominated the kernel's scoped-VMEM stack
        # (the apply path's slabs are split, this branch isn't).
        for xi in range(4):
            for nu in range(4):
                acc = None
                for k in range(3):
                    gk = _G[xi, k]
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
    tp = x_ref.shape[3]
    row0 = s_idx * trs
    slabs = [
        x_ref[0, pl.ds(row0, trs + 1), p_row]  # (trs+1, Tp, 2C)
        for p_row in range(2)
    ]
    phases = [
        [
            jax.lax.slice_in_dim(slabs[p_row], q * c, (q + 1) * c, axis=2)
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

    # V[xi,nu] = sum_ij BT[xi,i] BT[nu,j] d_ij ; M = V @ U ; accumulate the
    # output transform on the fly: Y[p,q] += AT[p,xi] AT[nu->q] M[xi,nu].
    y = [[None, None], [None, None]]
    for xi in range(4):
        for nu in range(4):
            acc = None
            for i in range(4):
                bi = _BT[xi, i]
                if bi == 0.0:
                    continue
                for j in range(4):
                    coef = bi * _BT[nu, j]
                    if coef == 0.0:
                        continue
                    term = d[i][j].astype(jnp.float32) * coef
                    acc = term if acc is None else acc + term
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

    if parity_out:
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


def _wino_forward(x, kernel, bias, split, ochunks, pre_padded, interpret):
    if pre_padded:
        xp = x
        b, hp, wp, c = x.shape
        h, w = hp - 2, wp - 2
    else:
        b, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    o_ch = kernel.shape[-1]
    t_rows = h // 2
    tc = w // 2
    trs = t_rows // split
    oc_w = o_ch // ochunks  # chunk width

    tp = (h + 2) // 2
    # FREE reshape (row-major compatible, no copy): row parity splits into
    # an untiled dim, column parity merges into the LANE dim.
    xl = xp.reshape(b, tp, 2, tp, 2 * c)
    g2 = kernel.reshape(9 * c, o_ch)
    b2 = bias.reshape(1, o_ch)

    parity_out = ochunks == 1
    if parity_out:
        out_spec = pl.BlockSpec(
            (1, trs, 2, tc, 2 * o_ch),
            lambda oc, i, s: (i, s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (b, t_rows, 2, tc, 2 * o_ch), x.dtype
        )
    else:
        out_spec = pl.BlockSpec(
            (1, 2, 2, trs, tc, oc_w),
            lambda oc, i, s: (i, 0, 0, s, 0, oc),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (b, 2, 2, t_rows, tc, o_ch), x.dtype
        )

    (out,) = pl.pallas_call(
        functools.partial(
            _wino_kernel, trs=trs, tc=tc, c=c, o_ch=oc_w,
            parity_out=parity_out,
        ),
        grid=(ochunks, b, split),
        in_specs=[
            pl.BlockSpec(
                (1, tp, 2, tp, 2 * c), lambda oc, i, s: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9 * c, oc_w), lambda oc, i, s: (0, oc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc_w), lambda oc, i, s: (0, oc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec],
        out_shape=[out_shape],
        scratch_shapes=[pltpu.VMEM((16 * c, oc_w), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            # Sequential axes: the weight transform at grid step (oc, 0, 0)
            # must complete before later steps reuse the scratch.
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 16 * t_rows * tc * c * o_ch,
            bytes_accessed=(b * ochunks * (h + 2) * (w + 2) * c
                            + 9 * c * o_ch
                            + b * h * w * o_ch) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xl, g2, b2)
    if parity_out:
        # (B, T, 2, Tc, 2*O) -> (B, H, W, O): FREE, row-major compatible.
        return out.reshape(b, h, w, o_ch)
    # Phase-major (B, 2, 2, T, T, O) -> (B, H, W, O): same depth-to-space
    # pattern as the sub-pixel Upsample2D.
    return out.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, o_ch)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _wino_conv(x, kernel, bias, split, ochunks=1, pre_padded=False,
               interpret=False):
    return _wino_forward(
        x, kernel, bias, split, ochunks, pre_padded, interpret
    )


def _wino_fwd(x, kernel, bias, split, ochunks, pre_padded, interpret):
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
            x, kernel, bias, split, ochunks, pre_padded, interpret
        )
    else:
        ref = _conv3x3_valid if pre_padded else _conv3x3_reference
        out = ref(x, kernel, bias)
    return out, (x, kernel, bias)


def _wino_bwd(split, ochunks, pre_padded, interpret, res, g):
    x, kernel, bias = res
    ref = _conv3x3_valid if pre_padded else _conv3x3_reference
    _, vjp = jax.vjp(ref, x, kernel, bias)
    return vjp(g)


_wino_conv.defvjp(_wino_fwd, _wino_bwd)


def winograd_eligible(
    shape, out_ch: int, itemsize: int, interpret: bool = False
) -> bool:
    """Whether :func:`winograd_conv3x3` would dispatch for an UNPADDED
    NHWC input shape (trace-time; lets producers pre-arrange the padded
    layout the kernel consumes)."""
    if os.environ.get("GMDX_WINOGRAD", "1") != "1":
        return False
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    if h != w or h % 2 or h < 16:
        return False
    if c % 8 or out_ch % 8:
        return False
    if _pick_tiling(h, w, c, out_ch, itemsize, itemsize) == (0, 0):
        return False
    return interpret or jax.default_backend() == "tpu"


def winograd_conv3x3(
    x: Array,
    kernel: Array,
    bias: Array,
    *,
    pre_padded: bool = False,
    interpret: bool = False,
) -> Array | None:
    """3x3 stride-1 SAME conv over NHWC via Winograd F(2x2, 3x3).

    ``pre_padded=True`` takes the 1-px zero-bordered image (B, H+2, W+2, C)
    — e.g. straight from the pad-emitting GroupNorm kernel — and skips the
    XLA pad pass.

    Returns None when the shape is unsupported (odd/non-square spatial,
    tiny grids where the matmuls cannot fill the MXU, or a working set past
    the VMEM budget) — callers fall back to the direct XLA conv.
    ``GMDX_WINOGRAD=0`` disables globally.
    """
    if os.environ.get("GMDX_WINOGRAD", "1") != "1":
        return None
    if x.ndim != 4 or kernel.shape[:2] != (3, 3):
        return None
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
    tiling_x = _pick_tiling(h, w, c, o_ch, x.dtype.itemsize, x.dtype.itemsize)
    if kernel.dtype != x.dtype:
        tiling_g = _pick_tiling(
            h, w, c, o_ch, x.dtype.itemsize, kernel.dtype.itemsize
        )
        if tiling_g != tiling_x:
            kernel = kernel.astype(x.dtype)
            bias = bias.astype(x.dtype)
    split, ochunks = tiling_x
    if split == 0:
        return None
    if jax.default_backend() != "tpu" and not interpret:
        return None
    return _wino_conv(x, kernel, bias, split, ochunks, pre_padded, interpret)


__all__ = ["winograd_conv3x3", "winograd_eligible"]
