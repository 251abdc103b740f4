"""Fused per-frame distortion kernel (Pallas/TPU) — the SURVEY.md §7 north
star: the flagship 5-way attack pool (resize round-trip, 2× JPEG-pool draws,
median blur, gaussian blur, softmax-α mixture — models/IRNcrop_model.py:
350-373) as ONE kernel per frame.

STATUS: numerically correct (validated vs interpret mode and finite on
hardware) but currently ~5× slower than the tuned XLA pool (50 ms vs 9 ms per
64×256² frames on v5e): the per-frame grid serializes MXU work and the ±1-lane
shift ops in the blur/median branches are expensive in Mosaic. Kept as the
starting point for a tiled multi-frame version; production paths use
`attack_pool_video` (attacks/combined.py), which after the Paeth-median and
block-diagonal-DCT fixes is compute-dense enough that XLA's fusion wins.

Design notes (TPU):
  * Channel-separated planes (N, 3, H, W): the (H, W) plane maps onto
    (8, 128) f32 tiles; an (H, W, 3) layout would waste the lane dim.
  * Blockwise 8×8 DCT = dense matmul with the block-diagonal operator
    `D = I_{H/8} ⊗ C8` — 32× redundant FLOPs at 256² but perfect MXU shapes,
    and FLOPs are free here relative to bandwidth.
  * The random resize ratio indexes a stacked operator table in HBM; the
    per-frame operator is DMA'd into VMEM using scalar-prefetched indices
    (PrefetchScalarGridSpec) — randomness without recompilation.
  * JPEG quality/mode are scalar-prefetched per frame; the three rounding
    modes are VPU selects on the same DCT coefficients.
"""

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.dct import _dct_matrix
from ..ops.filters import gaussian_kernel_2d
from .jpeg import _Y_TABLE_NP, _C_TABLE_NP
from .spatial import make_resize_roundtrip_pool, DEFAULT_RATIOS

# color matrices (noise_layers/jpeg.py:147-163 set)
_RGB2YUV = np.array([[0.299, 0.587, 0.114],
                     [-0.1687, -0.3313, 0.5],
                     [0.5, -0.4187, -0.0813]], dtype=np.float32)
_YUV2RGB = np.array([[1.0, 0.0, 1.40198758],
                     [1.0, -0.344113281, -0.714103821],
                     [1.0, 1.77197812, 0.0]], dtype=np.float32)


@functools.lru_cache(maxsize=None)
def _blockdiag_dct(h: int) -> np.ndarray:
    return np.kron(np.eye(h // 8, dtype=np.float32),
                   _dct_matrix(8).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _tiled_tables(h: int, w: int):
    ty = np.tile(_Y_TABLE_NP, (h // 8, w // 8)).astype(np.float32)
    tc = np.tile(_C_TABLE_NP, (h // 8, w // 8)).astype(np.float32)
    my = np.tile((np.arange(8)[:, None] < 5) & (np.arange(8)[None, :] < 5),
                 (h // 8, w // 8)).astype(np.float32)
    mc = np.tile((np.arange(8)[:, None] < 3) & (np.arange(8)[None, :] < 3),
                 (h // 8, w // 8)).astype(np.float32)
    return ty, tc, my, mc


def _soft_round(x):
    return jnp.where(jnp.abs(x) < 0.5, x ** 3, x)


def _kernel(scalars_ref, ridx_ref,            # scalar prefetch
            frame_ref, dct_ref, qy_ref, qc_ref, my_ref, mc_ref,
            rops_hbm, out_ref, rop_vmem, sem):
    """One grid step = one frame. frame_ref: (1, 3, H, W) VMEM."""
    n = pl.program_id(0)
    # DMA this frame's resize operator from the HBM table
    ridx = ridx_ref[n]
    dma = pltpu.make_async_copy(rops_hbm.at[ridx], rop_vmem, sem)
    dma.start()

    r = frame_ref[0, 0, :, :] * 255.0
    g = frame_ref[0, 1, :, :] * 255.0
    b = frame_ref[0, 2, :, :] * 255.0

    y = _RGB2YUV[0, 0] * r + _RGB2YUV[0, 1] * g + _RGB2YUV[0, 2] * b
    u = _RGB2YUV[1, 0] * r + _RGB2YUV[1, 1] * g + _RGB2YUV[1, 2] * b
    v = _RGB2YUV[2, 0] * r + _RGB2YUV[2, 1] * g + _RGB2YUV[2, 2] * b

    d = dct_ref[:, :]

    def jpeg_branch(scale, mode, plane, qtbl, zmask):
        coeff = jnp.dot(jnp.dot(d, plane, preferred_element_type=jnp.float32),
                        d.T, preferred_element_type=jnp.float32)
        q = jnp.maximum(jnp.round(qtbl * scale), 1.0)
        scaled = coeff / q
        rounded = jnp.where(mode == 0, jnp.round(scaled), _soft_round(scaled))
        outc = jnp.where(mode == 2, coeff * zmask, rounded * q)
        return jnp.dot(jnp.dot(d.T, outc, preferred_element_type=jnp.float32),
                       d, preferred_element_type=jnp.float32)

    def jpeg_full(scale, mode):
        yy = jpeg_branch(scale, mode, y, qy_ref[:, :], my_ref[:, :])
        uu = jpeg_branch(scale, mode, u, qc_ref[:, :], mc_ref[:, :])
        vv = jpeg_branch(scale, mode, v, qc_ref[:, :], mc_ref[:, :])
        rr = yy + _YUV2RGB[0, 2] * vv
        gg = yy + _YUV2RGB[1, 1] * uu + _YUV2RGB[1, 2] * vv
        bb = yy + _YUV2RGB[2, 1] * uu
        return rr / 255.0, gg / 255.0, bb / 255.0

    s1 = scalars_ref[n, 0]
    m1 = scalars_ref[n, 1].astype(jnp.int32)
    s2 = scalars_ref[n, 2]
    m2 = scalars_ref[n, 3].astype(jnp.int32)
    # softmax alphas, loaded one scalar at a time (SMEM allows scalar loads only)
    a = [scalars_ref[n, 4 + i] for i in range(5)]

    j1 = jpeg_full(s1, m1)
    j2 = jpeg_full(s2, m2)

    # gaussian blur 3×3 σ=2 (zero padding) per channel — VPU shifts
    gk = gaussian_kernel_2d(3, 2.0)
    h_, w_ = r.shape

    def blur(p):
        pp = p / 255.0
        acc = jnp.zeros_like(pp)
        padded = jnp.pad(pp, ((1, 1), (1, 1)))
        for dy in range(3):
            for dx in range(3):  # static slices: offsets are Python ints
                acc = acc + float(gk[dy, dx]) * padded[dy:dy + h_, dx:dx + w_]
        return acc

    def median(p):
        pp = p / 255.0
        padded = jnp.pad(pp, ((1, 1), (1, 1)), mode="edge")
        v = [padded[dy:dy + h_, dx:dx + w_]
             for dy in range(3) for dx in range(3)]

        # Paeth median-of-9 min/max network (sort unsupported in Mosaic)
        def sw(i, j):
            lo = jnp.minimum(v[i], v[j])
            hi = jnp.maximum(v[i], v[j])
            v[i], v[j] = lo, hi

        for i, j in ((1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
                     (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                     (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)):
            sw(i, j)
        return v[4]

    dma.wait()
    rop = rop_vmem[:, :]  # read only after the operator DMA has landed

    def resize_rt(p):
        pp = p / 255.0
        t1 = jnp.dot(rop, pp, preferred_element_type=jnp.float32)
        return jnp.clip(jnp.dot(t1, rop.T, preferred_element_type=jnp.float32),
                        0.0, 1.0)

    for c, (plane, j1c, j2c) in enumerate(zip((r, g, b), j1, j2)):
        mixed = (a[0] * resize_rt(plane) + a[1] * j1c + a[2] * j2c
                 + a[3] * median(plane) + a[4] * blur(plane))
        out_ref[0, c, :, :] = mixed


def fused_attack_pool(key, video, ratios=DEFAULT_RATIOS,
                      qualities=(50, 60, 70, 80, 90), interpret: bool = False,
                      _debug_branch: int = None):
    """Drop-in fused replacement for `attack_pool_video`.

    video: (B, T, H, W, C) in [0,1]. Returns the same-shaped α-mixture of the
    five attacks with per-frame random draws.
    """
    b, t, h, w, c = video.shape
    n = b * t
    frames = jnp.moveaxis(video.reshape(n, h, w, c), -1, 1)  # (N, 3, H, W)

    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    qs = jnp.asarray(qualities, dtype=jnp.float32)
    q1 = qs[jax.random.randint(k1, (n,), 0, len(qualities))]
    q2 = qs[jax.random.randint(k2, (n,), 0, len(qualities))]
    scale1 = jnp.where(q1 >= 50, 2.0 - q1 * 0.02, 50.0 / q1)
    scale2 = jnp.where(q2 >= 50, 2.0 - q2 * 0.02, 50.0 / q2)
    mode1 = jax.random.randint(k3, (n,), 0, 3).astype(jnp.float32)
    mode2 = jax.random.randint(k4, (n,), 0, 3).astype(jnp.float32)
    alphas = jax.nn.softmax(jax.random.normal(k5, (n, 5)), axis=-1)
    if _debug_branch is not None:  # isolate one branch for numerics debugging
        alphas = jnp.tile(jax.nn.one_hot(_debug_branch, 5)[None], (n, 1))
    ridx = jax.random.randint(k6, (n,), 0, len(ratios)).astype(jnp.int32)

    scalars = jnp.concatenate(
        [scale1[:, None], mode1[:, None], scale2[:, None], mode2[:, None],
         alphas], axis=1)  # (N, 9)

    dctm = jnp.asarray(_blockdiag_dct(h))
    ty, tc_, my, mc = map(jnp.asarray, _tiled_tables(h, w))
    rops = jnp.asarray(make_resize_roundtrip_pool(h, tuple(ratios)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dct
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qy
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qc
            pl.BlockSpec(memory_space=pltpu.VMEM),   # my
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mc
            pl.BlockSpec(memory_space=pltpu.ANY),    # resize op table (HBM)
        ],
        out_specs=pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, h), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3, h, w), jnp.float32),
        interpret=interpret,
    )(scalars, ridx, frames, dctm, ty, tc_, my, mc, rops)

    return jnp.moveaxis(out, 1, -1).reshape(b, t, h, w, c)
