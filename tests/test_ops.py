"""Golden tests for vwfd_tpu.ops against independently-written oracles
(torch CPU / numpy direct formulas), mirroring SURVEY.md §7 step 1."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from vwfd_tpu import ops


def nhwc(x_nchw):
    return np.moveaxis(x_nchw, 1, -1)


# ---------------------------------------------------------------- color


def test_color_roundtrip_jpegbasic(rng):
    x = rng.random((2, 8, 8, 3), dtype=np.float32) * 255
    y = ops.yuv_to_rgb_jpegbasic(ops.rgb_to_yuv_jpegbasic(jnp.asarray(x)))
    # The reference's forward/inverse pair is only approximately inverse
    # (truncated coefficients, ~0.8% error) — match that tolerance, not exactness.
    np.testing.assert_allclose(np.asarray(y), x, atol=2.0)


def test_color_roundtrip_diffjpeg(rng):
    x = rng.random((2, 8, 8, 3), dtype=np.float32) * 255
    y = ops.ycbcr_to_rgb_diffjpeg(ops.rgb_to_ycbcr_diffjpeg(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=0.01)


def test_color_known_values():
    # Pure white stays white; Y of pure red is 0.299.
    white = jnp.ones((1, 1, 1, 3)) * 255.0
    y = ops.rgb_to_ycbcr_diffjpeg(white)
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0], [255.0, 128.0, 128.0], atol=1e-3)
    red = jnp.zeros((1, 1, 1, 3)).at[..., 0].set(1.0)
    np.testing.assert_allclose(
        float(ops.rgb_to_yuv_jpegbasic(red)[0, 0, 0, 0]), 0.299, atol=1e-6)


# ---------------------------------------------------------------- dct


def _numpy_dct2_block(b):
    """Direct orthonormal 2-D DCT-II of an 8x8 block (textbook formula)."""
    n = 8
    out = np.zeros_like(b)
    for u in range(n):
        for v in range(n):
            au = np.sqrt(1 / n) if u == 0 else np.sqrt(2 / n)
            av = np.sqrt(1 / n) if v == 0 else np.sqrt(2 / n)
            s = 0.0
            for x in range(n):
                for y in range(n):
                    s += b[x, y] * np.cos(np.pi * u * (2 * x + 1) / 16) * \
                         np.cos(np.pi * v * (2 * y + 1) / 16)
            out[u, v] = au * av * s
    return out


def test_dct8x8_matches_direct_formula(rng):
    b = rng.random((8, 8), dtype=np.float32)
    got = np.asarray(ops.dct8x8(jnp.asarray(b)[None]))[0]
    want = _numpy_dct2_block(b.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dct_idct_roundtrip(rng):
    x = rng.random((2, 32, 24), dtype=np.float32) * 255
    y = ops.idct8x8(ops.dct8x8(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)
    y2 = ops.idct8x8(ops.dct8x8(jnp.asarray(x), center=True), center=True)
    np.testing.assert_allclose(np.asarray(y2), x, atol=1e-3)


def test_blockwise_not_global(rng):
    # DC coefficient of each block equals 8 * block mean.
    x = rng.random((1, 16, 16), dtype=np.float32)
    d = np.asarray(ops.dct8x8(jnp.asarray(x)))
    blk = x[0, :8, 8:]
    np.testing.assert_allclose(d[0, 0, 8], 8 * blk.mean(), atol=1e-5)


# ---------------------------------------------------------------- quantize


def test_ste_quantize_value_and_grad():
    x = jnp.asarray([0.1234, 0.9999, 0.0])
    np.testing.assert_allclose(
        np.asarray(ops.ste_quantize_255(x)), np.round(np.asarray(x) * 255) / 255, atol=1e-7)
    g = jax.grad(lambda t: jnp.sum(ops.ste_quantize_255(t) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0)


def test_clamp_with_grad():
    x = jnp.asarray([-0.5, 0.5, 1.5])
    np.testing.assert_allclose(np.asarray(ops.clamp_with_grad(x)), [0.0, 0.5, 1.0])
    g = jax.grad(lambda t: jnp.sum(ops.clamp_with_grad(t)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)  # identity grad everywhere


def test_diff_round_matches_torch_semantics():
    x = jnp.asarray([0.2, 0.7, 1.5, -0.4])
    got = np.asarray(ops.diff_round(x))
    xr = np.round(np.asarray(x))
    np.testing.assert_allclose(got, xr + (np.asarray(x) - xr) ** 3, atol=1e-7)
    # grad: round() contributes zero grad, so d/dx = 3 (x - round x)^2
    g = jax.grad(lambda t: jnp.sum(ops.diff_round(t)))(x)
    np.testing.assert_allclose(np.asarray(g), 3 * (np.asarray(x) - xr) ** 2, atol=1e-6)


def test_scale_factor_mappings():
    assert ops.jpeg_scale_factor(50) == pytest.approx(1.0)
    assert ops.jpeg_scale_factor(90) == pytest.approx(0.2)
    assert ops.jpeg_scale_factor(10) == pytest.approx(5.0)
    assert ops.quality_to_factor(50) == pytest.approx(1.0)
    assert ops.quality_to_factor(90) == pytest.approx(0.2)
    assert ops.quality_to_factor(10) == pytest.approx(5.0)


# ---------------------------------------------------------------- haar


def test_haar_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    down = ops.haar_downsample(x)
    assert down.shape == (2, 8, 8, 12)
    up = ops.haar_upsample(down)
    np.testing.assert_allclose(np.asarray(up), np.asarray(x), atol=1e-6)


def test_haar_matches_torch_grouped_conv(rng):
    """Parity with the reference's fixed ±1 grouped conv (invertible_net.py:178-235)."""
    c = 3
    x = rng.random((2, c, 8, 8), dtype=np.float32)
    w = torch.ones(4, 1, 2, 2)
    w[1, 0, 0, 1] = -1; w[1, 0, 1, 1] = -1
    w[2, 0, 1, 0] = -1; w[2, 0, 1, 1] = -1
    w[3, 0, 1, 0] = -1; w[3, 0, 0, 1] = -1
    w = torch.cat([w] * c, 0)
    want = F.conv2d(torch.from_numpy(x), w, stride=2, groups=c).numpy() * 0.5
    got = np.asarray(ops.haar_downsample(jnp.asarray(nhwc(x))))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want, atol=1e-5)


def test_haar_conv_matches_lift(rng):
    """The conv-expressed Haar (layout-stable TPU path, ops/haar.py) is the
    SAME linear map as the lifting form, on 4-D and 5-D inputs and in both
    f32 and bf16."""
    from vwfd_tpu.ops import haar
    for shape in [(2, 16, 16, 3), (2, 3, 8, 8, 4)]:
        x = jnp.asarray(rng.random(shape, dtype=np.float32))
        d_lift, d_conv = haar.haar_downsample(x), haar.haar_downsample_conv(x)
        np.testing.assert_allclose(np.asarray(d_conv), np.asarray(d_lift),
                                   atol=1e-6)
        u_lift, u_conv = haar.haar_upsample(d_lift), haar.haar_upsample_conv(d_lift)
        np.testing.assert_allclose(np.asarray(u_conv), np.asarray(u_lift),
                                   atol=1e-6)
        rt = haar.haar_upsample_conv(haar.haar_downsample_conv(x))
        np.testing.assert_allclose(np.asarray(rt), np.asarray(x), atol=1e-6)
    xb = jnp.asarray(rng.random((2, 8, 8, 4), dtype=np.float32)).astype(
        jnp.bfloat16)
    db = haar.haar_downsample_conv(xb)
    assert db.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(db, np.float32),
        np.asarray(haar.haar_downsample(xb), np.float32), atol=2e-2)


@pytest.mark.parametrize("s", [2, 4])
def test_conv_squeeze_bit_exact(rng, s):
    """space/depth permutation convs (ops/squeeze.py) are BIT-exact vs the
    reshape spelling — they must be, since nets use them unconditionally."""
    from vwfd_tpu.ops.squeeze import depth_to_space_conv, space_to_depth_conv
    x = jnp.asarray(rng.random((2, 16, 16, 5), dtype=np.float32))
    z = x.reshape(2, 16 // s, s, 16 // s, s, 5)
    want = z.transpose(0, 1, 3, 2, 4, 5).reshape(2, 16 // s, 16 // s,
                                                 s * s * 5)
    got = space_to_depth_conv(x, s)
    assert float(jnp.abs(got - want).max()) == 0.0
    back = depth_to_space_conv(got, s)
    assert float(jnp.abs(back - x).max()) == 0.0
    # bf16 path stays exact too (0/1 weights, one contribution per output)
    xb = x.astype(jnp.bfloat16)
    assert float(jnp.abs(space_to_depth_conv(xb, s).astype(jnp.float32)
                         - want.astype(jnp.bfloat16).astype(jnp.float32)
                         ).max()) == 0.0


# ---------------------------------------------------------------- resize


@pytest.mark.parametrize("mode,sizes", [
    ("bilinear", (16, 31)), ("bilinear", (64, 20)),
    ("bicubic", (16, 31)), ("bicubic", (64, 20)),
])
def test_resize_matches_torch_interpolate(rng, mode, sizes):
    x = rng.random((2, 3, 32, 32), dtype=np.float32)
    want = F.interpolate(torch.from_numpy(x), size=list(sizes), mode=mode,
                         align_corners=False).numpy()
    fn = ops.resize_bilinear if mode == "bilinear" else ops.resize_bicubic
    got = np.asarray(fn(jnp.asarray(nhwc(x)), sizes))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want, atol=2e-4)


def test_crop_resize_matches_torch_crop_then_upscale(rng):
    x = rng.random((2, 3, 32, 32), dtype=np.float32)
    h0, h1, w0, w1 = 4, 24, 8, 30
    want = F.interpolate(torch.from_numpy(x[:, :, h0:h1, w0:w1]), size=[32, 32],
                         mode="bilinear", align_corners=False).numpy()
    got = np.asarray(ops.crop_resize(jnp.asarray(nhwc(x)), (h0, h1, w0, w1)))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want, atol=2e-4)


def test_crop_resize_jittable_with_traced_apex(rng):
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))

    @jax.jit
    def f(img, apex):
        return ops.crop_resize(img, tuple(apex))

    out = f(x, jnp.asarray([2.0, 14.0, 3.0, 13.0]))
    assert out.shape == x.shape


# ---------------------------------------------------------------- filters


def test_gaussian_blur_matches_torch_depthwise_conv(rng):
    x = rng.random((2, 3, 16, 16), dtype=np.float32)
    k = np.asarray(ops.gaussian_kernel_2d(3, 2.0))
    w = torch.from_numpy(np.tile(k[None, None], (3, 1, 1, 1)).astype(np.float32))
    want = F.conv2d(torch.from_numpy(x), w, padding=1, groups=3).numpy()
    got = np.asarray(ops.gaussian_blur(jnp.asarray(nhwc(x)), 3, 2.0))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want, atol=1e-5)


def test_median_blur_center(rng):
    x = rng.random((1, 5, 5, 1), dtype=np.float32)
    got = np.asarray(ops.median_blur(jnp.asarray(x), 3))
    want = np.median(np.asarray(x)[0, 1:4, 1:4, 0])
    np.testing.assert_allclose(got[0, 2, 2, 0], want, atol=1e-6)


def test_median_blur_custom_vjp(rng):
    """The custom backward (direct median-contributor routing) must equal
    autodiff of the plain sorting network on untied inputs, and keep the
    per-output gradient mass one-hot even under ties."""
    from vwfd_tpu.ops.filters import _median_views, _median3_net

    x = rng.random((2, 8, 8, 3), dtype=np.float32)  # distinct values w.p. 1
    g = rng.random((2, 8, 8, 3), dtype=np.float32)

    def net(y):  # same network, no custom_vjp
        return _median3_net(_median_views(y, 3))

    want = jax.vjp(net, jnp.asarray(x))[1](jnp.asarray(g))[0]
    got = jax.vjp(lambda y: ops.median_blur(y, 3), jnp.asarray(x))[1](
        jnp.asarray(g))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # ties (constant image): every output routes its cotangent to exactly one
    # input — total gradient mass is conserved
    xc = jnp.ones((1, 6, 6, 1), jnp.float32)
    gc = jnp.asarray(rng.random((1, 6, 6, 1), dtype=np.float32))
    gx = jax.vjp(lambda y: ops.median_blur(y, 3), xc)[1](gc)[0]
    np.testing.assert_allclose(float(gx.sum()), float(gc.sum()), rtol=1e-6)


def test_avg_pool(rng):
    x = rng.random((1, 4, 4, 2), dtype=np.float32)
    got = np.asarray(ops.avg_pool_2x2(jnp.asarray(x)))
    np.testing.assert_allclose(got[0, 0, 0], x[0, :2, :2].mean(axis=(0, 1)), atol=1e-6)


def test_srm_shapes(rng):
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    out = ops.srm_conv(x)
    assert out.shape == (2, 12, 12, 9)


def test_bayar_constraint(rng):
    w = jnp.asarray(rng.random((5, 5, 3, 3), dtype=np.float32)) + 0.1
    wc = np.asarray(ops.bayar_constrain(w))
    np.testing.assert_allclose(wc[2, 2], -1.0, atol=1e-6)
    np.testing.assert_allclose(wc.sum(axis=(0, 1)), 0.0, atol=1e-5)


def test_symm_pad_matches_torch_reflect_for_small_pad(rng):
    # For pad < size, half-sample symmetric padding == numpy 'symmetric'.
    x = rng.random((1, 6, 7, 1), dtype=np.float32)
    got = np.asarray(ops.symm_pad(jnp.asarray(x), (2, 2, 2, 2)))
    want = np.pad(x[0, :, :, 0], ((2, 2), (2, 2)), mode="symmetric")
    np.testing.assert_allclose(got[0, :, :, 0], want, atol=1e-6)


def test_flow_warp_matches_torch_grid_sample(rng):
    """flow_warp parity vs the reference's F.grid_sample formulation
    (models/modules/module_util.py:75-99), align_corners=True."""
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF
    from vwfd_tpu.ops.warp import flow_warp

    x = rng.random((2, 8, 10, 3)).astype(np.float32)
    flow = (rng.random((2, 8, 10, 2)).astype(np.float32) - 0.5) * 4

    got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tflow = torch.from_numpy(flow)
    h, w = 8, 10
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()[None] + tflow
    vx = 2.0 * grid[..., 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * grid[..., 1] / max(h - 1, 1) - 1.0
    vgrid = torch.stack((vx, vy), dim=3)
    ref = TF.grid_sample(tx, vgrid, mode="bilinear", padding_mode="zeros",
                         align_corners=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_flow_warp_zero_flow_identity(rng):
    from vwfd_tpu.ops.warp import flow_warp
    x = jnp.asarray(rng.random((1, 6, 6, 2)).astype(np.float32))
    out = flow_warp(x, jnp.zeros((1, 6, 6, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


# ---------------------------------------------------------------- morphology

def _np_morph(mask, op):
    """Numpy golden for the reference's 4-neighbor cross morphology
    (noise_layers/__init__.py:24-64: center-excluded MF, edge padding;
    we process the full image, not the reference's range(1,H) loop-bug)."""
    p = np.pad(mask, 1, mode="edge")
    neigh = np.stack([p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:]])
    if op == "dilate":
        return np.maximum(mask, neigh.max(0))
    return np.minimum(mask, neigh.min(0))


def test_morphology_vs_numpy_golden(rng):
    from vwfd_tpu.ops import dilate, erode, opening, closing
    m = (rng.random((13, 17)) > 0.6).astype(np.float32)

    np.testing.assert_array_equal(np.asarray(dilate(jnp.asarray(m))),
                                  _np_morph(m, "dilate"))
    np.testing.assert_array_equal(np.asarray(erode(jnp.asarray(m))),
                                  _np_morph(m, "erode"))
    # iterated
    ref2 = _np_morph(_np_morph(m, "dilate"), "dilate")
    np.testing.assert_array_equal(np.asarray(dilate(jnp.asarray(m), 2)), ref2)
    # open/close compositions
    np.testing.assert_array_equal(
        np.asarray(opening(jnp.asarray(m))),
        _np_morph(_np_morph(m, "erode"), "dilate"))
    np.testing.assert_array_equal(
        np.asarray(closing(jnp.asarray(m))),
        _np_morph(_np_morph(m, "dilate"), "erode"))


def test_morphology_batched_channel_shapes(rng):
    from vwfd_tpu.ops import dilate, erode
    m = (rng.random((2, 9, 9, 1)) > 0.5).astype(np.float32)
    out = dilate(jnp.asarray(m))
    assert out.shape == m.shape
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(out[b, ..., 0]),
                                      _np_morph(m[b, ..., 0], "dilate"))
    # erode(dilate) on an all-ones mask is identity
    ones = jnp.ones((1, 8, 8, 1))
    np.testing.assert_array_equal(np.asarray(erode(dilate(ones))),
                                  np.ones((1, 8, 8, 1), np.float32))
