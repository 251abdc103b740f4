"""Network tests: shapes, INN invertibility property (the reference's own
smoke check, invertible_net.py:534-562), gradient flow."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vwfd_tpu import nets


def test_inn_invertibility(rng):
    """‖G⁻¹(G(x)) − x‖ ≈ 0 — mirrors invertible_net.py:549-553."""
    model = nets.InvertibleNet(channels=4, down_num=2, block_num=(1, 1),
                               subnet="res")
    x = jnp.asarray(rng.random((1, 16, 16, 4), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == x.shape
    x_rec, mid = model.apply(params, y, rev=True)
    err = float(jnp.abs(x_rec - x).max())
    assert err < 1e-4, err
    assert mid.shape[-1] == 4 * (4 ** 2)


def test_inn_flagship_config(rng):
    """The IRNcrop netG config: channels=12, block_num=(1,1,1), res subnets
    (models/IRNcrop_model.py:132-134)."""
    model = nets.InvertibleNet(channels=12, down_num=3, block_num=(1, 1, 1),
                               subnet="res")
    x = jnp.asarray(rng.random((1, 32, 32, 12), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == x.shape
    # zero-init final convs → at init the coupling is ≈ identity-scaled;
    # output must stay finite and close in magnitude
    assert np.isfinite(np.asarray(y)).all()


def test_inn_conv_haar_equivalence(rng):
    """haar='conv' (layout-stable TPU path) computes the SAME network as the
    default lifting Haar — identical params, matching outputs, invertible."""
    kw = dict(channels=4, down_num=2, block_num=(1, 1), subnet="res_tpu2")
    lift = nets.InvertibleNet(haar="lift", **kw)
    conv = nets.InvertibleNet(haar="conv", **kw)
    x = jnp.asarray(rng.random((2, 16, 16, 4), dtype=np.float32))
    params = lift.init(jax.random.PRNGKey(0), x)
    y_lift = lift.apply(params, x)
    y_conv = conv.apply(params, x)  # same param tree: Haar has no params
    np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_lift),
                               atol=1e-5)
    x_rec, _ = conv.apply(params, y_conv, rev=True)
    assert float(jnp.abs(x_rec - x).max()) < 1e-4


def test_inn_mixed_haar_and_bf16_out(rng):
    """haar='mixed' (conv at narrow bands, lift at wide) matches 'lift' on the
    same params; out_f32=False returns the compute dtype and is value-identical
    after the cast the caller performs (bf16→f32 is exact)."""
    kw = dict(channels=4, down_num=2, block_num=(1, 1), subnet="res_tpu2")
    lift = nets.InvertibleNet(haar="lift", **kw)
    mixed = nets.InvertibleNet(haar="mixed", **kw)
    x = jnp.asarray(rng.random((2, 16, 16, 4), dtype=np.float32))
    params = lift.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(mixed.apply(params, x)),
                               np.asarray(lift.apply(params, x)), atol=1e-5)
    x_rec, _ = mixed.apply(params, mixed.apply(params, x), rev=True)
    assert float(jnp.abs(x_rec - x).max()) < 1e-4

    bf = nets.InvertibleNet(haar="lift", out_f32=False,
                            dtype=jnp.bfloat16, **kw)
    f32 = nets.InvertibleNet(haar="lift", out_f32=True,
                             dtype=jnp.bfloat16, **kw)
    y_bf = bf.apply(params, x)
    y_f32 = f32.apply(params, x)
    assert y_bf.dtype == jnp.bfloat16 and y_f32.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(y_bf.astype(jnp.float32)), np.asarray(y_f32))


def test_inn_dense_variant(rng):
    model = nets.InvertibleNet(channels=3, down_num=2, block_num=(2, 2),
                               subnet="dense", return_middle=False)
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    x_rec = model.apply(params, y, rev=True)
    assert float(jnp.abs(x_rec - x).max()) < 1e-4


def test_inn_gradients(rng):
    model = nets.InvertibleNet(channels=4, down_num=1, block_num=(1,))
    x = jnp.asarray(rng.random((1, 8, 8, 4), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(model.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_unet_mask_predictor(rng):
    model = nets.UNet(out_channels=1, init_features=8)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x, mutable=["batch_stats"])
    assert out.shape == (2, 32, 32, 1)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_unet_discriminator_localizer(rng):
    model = nets.UNetDiscriminator(dim=16, residual_blocks=2)
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    (out, feats), _ = model.apply(variables, x, mutable=["spectral"])
    assert out.shape == (1, 32, 32, 1)
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    assert len(feats) == 2


def test_discriminators(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    d = nets.Discriminator(dim=8)
    v = d.init(jax.random.PRNGKey(0), x)
    out, _ = d.apply(v, x, mutable=["spectral"])
    assert out.shape == (1, 2, 2, 1)

    dg = nets.DGDiscriminator(dim=16)
    v = dg.init(jax.random.PRNGKey(0), x)
    (out, feats), _ = dg.apply(v, x, mutable=["spectral"])
    assert len(feats) == 5


def test_hidden_pipeline(rng):
    model = nets.HiddenEncoderDecoder(message_length=30, encoder_blocks=2,
                                      decoder_blocks=3)
    img = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    msg = jnp.asarray((rng.random((2, 30)) > 0.5).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, msg)
    (enc, noised, dec), _ = model.apply(variables, img, msg,
                                        mutable=["batch_stats"])
    assert enc.shape == img.shape
    assert dec.shape == msg.shape


def test_unet_fast_upsample_matches_convtranspose(rng):
    """The 1×1-GEMM + depth-to-space upsample equals nn.ConvTranspose
    (2×2, stride 2) with the SAME param tree — checkpoints interchange."""
    from vwfd_tpu.nets.unet import UNet
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    slow = UNet(init_features=4, fast_upsample=False)
    fast = UNet(init_features=4, fast_upsample=True)
    v = slow.init(jax.random.PRNGKey(0), x, train=False)
    vf = fast.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(vf))
    ref = np.asarray(slow.apply(v, x, train=False))
    got = np.asarray(fast.apply(v, x, train=False))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_unet_tpu_shapes_and_grads(rng):
    """UNetTPU: output shape/range match UNet's contract; trains (finite
    grads through BN in train mode)."""
    import jax
    import optax
    from vwfd_tpu.nets import UNetTPU

    net = UNetTPU(out_channels=1, init_features=8)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    v = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(v, x, train=False)
    assert y.shape == (2, 32, 32, 1)
    assert y.dtype == jnp.float32
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0

    def loss(p):
        out, _ = net.apply({"params": p, **{k: val for k, val in v.items()
                                            if k != "params"}},
                           x, train=True, mutable=["batch_stats"])
        return jnp.mean((out - 0.5) ** 2)

    g = jax.grad(loss)(v["params"])
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))
    assert float(optax.global_norm(g)) > 0


def test_unet_tpu_conv_squeeze_bit_exact(rng):
    """UNetTPU's conv-expressed stem/head squeezes (the layout-stable TPU
    path) are bit-exact vs the reshape spelling, with identical params."""
    import jax
    from vwfd_tpu.nets import UNetTPU

    a = UNetTPU(out_channels=1, init_features=8, conv_squeeze=True)
    b = UNetTPU(out_channels=1, init_features=8, conv_squeeze=False)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    v = a.init(jax.random.PRNGKey(0), x)
    ya = a.apply(v, x, train=False)
    yb = b.apply(v, x, train=False)
    assert float(jnp.abs(ya - yb).max()) == 0.0


def test_unet_tpu_up_gemm_and_dec_split_exact(rng):
    """The "gemm" upsample lowering (1×1 GEMM + conv-d2s, ConvTranspose flip
    convention) and the "split" decoder-conv lowering (kernel-sliced convs,
    concat never materialized) are numerically identical to the default
    lowerings on the SAME param tree (nets/unet.py)."""
    import jax
    from vwfd_tpu.nets import UNetTPU

    a = UNetTPU(out_channels=1, init_features=8)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    v = a.init(jax.random.PRNGKey(0), x)
    ya = a.apply(v, x, train=False)
    for kw in ({"up_impl": "gemm"}, {"dec_impl": "split"},
               {"up_impl": "gemm", "dec_impl": "split"}):
        b = UNetTPU(out_channels=1, init_features=8, **kw)
        vb = b.init(jax.random.PRNGKey(1), x)
        assert (jax.tree_util.tree_structure(v) ==
                jax.tree_util.tree_structure(vb)), kw
        yb = b.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                                   rtol=1e-5, atol=1e-6, err_msg=str(kw))


def test_unet_tpu_per_level_enc_convs(rng):
    """A 5-tuple `enc_convs` gives a per-level encoder plan (enc1..enc4,
    bottleneck): levels with 1 conv declare only Conv_0/BatchNorm_0."""
    import jax
    from vwfd_tpu.nets import UNetTPU

    net = UNetTPU(out_channels=1, init_features=8,
                  enc_convs=(2, 1, 1, 1, 1))
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    v = net.init(jax.random.PRNGKey(0), x)
    p = v["params"]
    assert "Conv_1" in p["enc1"] and "Conv_1" not in p["enc2"]
    assert "Conv_1" not in p["bottleneck"]
    y = net.apply(v, x, train=False)
    assert y.shape == (1, 32, 32, 1)


def test_unet_tpu_head_convt_exact(rng):
    """The composed-transposed-conv head ("convt") is numerically identical
    to the 1×1-conv + depth-to-space spelling, with the SAME param tree —
    it is the head∘d2s affine map contracted at trace time (nets/unet.py)."""
    import jax
    from vwfd_tpu.nets import UNetTPU

    a = UNetTPU(out_channels=1, init_features=8, head_impl="d2s")
    b = UNetTPU(out_channels=1, init_features=8, head_impl="convt")
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    v = a.init(jax.random.PRNGKey(0), x)
    vb = b.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(vb))
    # non-trivial head bias so the per-subpixel bias tiling is exercised
    v = jax.tree_util.tree_map_with_path(
        lambda path, p: p + 0.3 if (path[0].key == "params"
                                    and path[1].key == "head"
                                    and path[-1].key == "bias") else p, v)
    ya = a.apply(v, x, train=False)
    yb = b.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               rtol=1e-6, atol=1e-6)


def test_inn_packed_executor_parity(rng):
    """The packed-space executor (nets/inn_packed.py) matches the module
    path on the SAME param tree: identical operations in a different
    association order (fixed orthogonal transition convs replace the
    s2d/d2s + Haar permutation chains). Forward is tight in f32; bf16
    tracks to bf16 rounding; the f32 inverse round-trips the bottleneck."""
    import jax
    from vwfd_tpu.nets import InvertibleNet, inn_packed

    def perturb(path, a):
        # coupling heads are zero-init (identity couplings) — give them
        # small random values so s/t are exercised
        if any(getattr(k, "key", "") == "Conv_2" for k in path):
            return a + jnp.asarray(0.05 * rng.standard_normal(a.shape),
                                   np.float32)
        return a

    x = jnp.asarray(rng.random((2, 32, 32, 12), dtype=np.float32))
    for dt, tol in [(None, 2e-5), (jnp.bfloat16, 3e-2)]:
        net = InvertibleNet(channels=12, down_num=3, block_num=(1, 1, 1),
                            subnet="res_tpu2", fused_st=True, dtype=dt)
        v = net.init(jax.random.PRNGKey(0), x)
        p = jax.tree_util.tree_map_with_path(perturb, v["params"])
        y_mod = net.apply({"params": p}, x).astype(jnp.float32)
        y_pk = inn_packed.forward(p, x, channels=12, down_num=3, dtype=dt)
        scale = float(jnp.abs(y_mod).max())
        assert float(jnp.abs(y_mod - y_pk).max()) / scale < tol
        if dt is None:  # inverse: divisions amplify — assert in f32 only
            inv_mod, mid_mod = net.apply({"params": p}, y_mod, rev=True)
            inv_pk, mid_pk = inn_packed.inverse(p, y_mod, channels=12,
                                                down_num=3, dtype=None)
            assert float(jnp.abs(inv_mod - inv_pk).max()) < 5e-4 * max(
                1.0, float(jnp.abs(inv_mod).max()))
            assert float(jnp.abs(mid_mod - mid_pk).max()) < 1e-4 * max(
                1.0, float(jnp.abs(mid_mod).max()))


def test_inn_int8_ptq(rng):
    """Int8 PTQ embed (nets/inn_int8.py): the f32 calibration walk matches
    the packed executor exactly on the same param tree, the quantized tree
    is int8-weighted, and the int8 forward tracks the f32 packed forward
    within PTQ error bounds (per-channel weights, calibrated per-tensor
    activations)."""
    import jax
    from vwfd_tpu.nets import InvertibleNet, inn_packed
    from vwfd_tpu.nets import inn_int8 as q8

    def perturb(path, a):
        if any(getattr(k, "key", "") == "Conv_2" for k in path):
            return a + jnp.asarray(0.05 * rng.standard_normal(a.shape),
                                   np.float32)
        return a

    x = jnp.asarray(rng.random((2, 16, 16, 12), dtype=np.float32))
    net = InvertibleNet(channels=12, down_num=3, block_num=(1, 1, 1),
                        subnet="res_tpu2", fused_st=True, dtype=None)
    v = net.init(jax.random.PRNGKey(0), x)
    p = jax.tree_util.tree_map_with_path(perturb, v["params"])
    y_ref = inn_packed.forward(p, x, channels=12, down_num=3, dtype=None)

    # the calibration walk IS the packed executor (exact, f32)
    y_col, amax = q8.collect_amax(p, x)
    scale = max(1.0, float(jnp.abs(y_ref).max()))
    assert float(jnp.abs(y_col - y_ref).max()) < 1e-4 * scale
    assert set(amax) == set(p) and all(set(d) == {"st1", "st2"}
                                       for d in amax.values())

    scales = q8.calibrate(p, [x], channels=12)
    q = q8.quantize(p, scales, channels=12)
    for blk in q.values():
        for st in blk.values():
            assert st["w0"].dtype == jnp.int8
            assert st["w2x"].dtype == st["w2h"].dtype == jnp.int8

    # PTQ error envelope (measured ~0.5% mean / 4% max on this family)
    y_i8 = q8.forward_int8(q, x, channels=12, dtype=None)
    err = jnp.abs(y_i8 - y_ref)
    assert float(err.max()) < 0.10 * scale, float(err.max()) / scale
    assert float(err.mean()) < 0.02 * scale, float(err.mean()) / scale


def test_inn_packed_model_wiring(rng):
    """`ModelConfig.inn_packed` routes VideoWatermarkModel.embed through the
    packed executor with unchanged outputs (f32 exercises the exact path)."""
    import jax
    from vwfd_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from vwfd_tpu.models import VideoWatermarkModel

    kw = dict(
        data=DataConfig(gt_size=32, frames=2, batch_size=1),
        train=TrainConfig(dtype="float32"))
    base = VideoWatermarkModel(Config(
        model=ModelConfig(inn_subnet="res_tpu2", inn_down_num=2,
                          inn_block_num=(1, 1), extractor="unet_tpu"), **kw))
    packed = VideoWatermarkModel(Config(
        model=ModelConfig(inn_subnet="res_tpu2", inn_down_num=2,
                          inn_block_num=(1, 1), extractor="unet_tpu",
                          inn_packed=True), **kw))
    states = base.init_states(jax.random.PRNGKey(0))
    video = jnp.asarray(rng.random((1, 2, 32, 32, 3), dtype=np.float32))
    a = base.embed(states, video)
    b = packed.embed(states, video)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError):
        VideoWatermarkModel(Config(
            model=ModelConfig(inn_subnet="res", inn_packed=True), **kw))


@pytest.mark.parametrize("subnet", ["res_tpu", "res_tpu2"])
def test_inn_invertibility_res_tpu(rng, subnet):
    """The MXU-shaped trunks keep exact invertibility (same coupling math,
    different subnet parameterization); res_tpu2 additionally computes the
    trunk at half spatial resolution (space-to-depth)."""
    model = nets.InvertibleNet(channels=4, down_num=2, block_num=(1, 1),
                               subnet=subnet)
    x = jnp.asarray(rng.random((1, 16, 16, 4), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == x.shape
    # zero-init head ⇒ near-identity at init (like the reference's zero-init
    # conv5; the affine ε=1e-4 makes each coupling scale by 1+1e-4, so the
    # chain deviates by ~4e-4, invertible_net.py:150-151 semantics)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-3)
    x_rec, _ = model.apply(params, y, rev=True)
    assert float(jnp.abs(x_rec - x).max()) < 1e-4

    # and with non-trivial (s, t): nudge every bias so the heads emit
    # non-zero couplings while activations stay bounded — inversion must
    # still reconstruct exactly
    params = jax.tree_util.tree_map_with_path(
        lambda path, a: a + (0.05 if path[-1].key == "bias" else 0.0),
        params)
    y = model.apply(params, x)
    assert float(jnp.abs(y - x).max()) > 1e-2  # genuinely non-identity now
    x_rec, _ = model.apply(params, y, rev=True)
    assert float(jnp.abs(x_rec - x).max()) < 1e-3


def test_unet_tpu_slim_skip(rng):
    """slim_skip variant: same output contract, skip projections present,
    decoder convs see 1.5c input channels (BASELINE.md r3 follow-up)."""
    import jax
    from vwfd_tpu.nets import UNetTPU

    net = UNetTPU(out_channels=1, init_features=8, slim_skip=True)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    v = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(v, x, train=False)
    assert y.shape == (2, 32, 32, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
    p = v["params"]
    assert "dec4_skipproj" in p, sorted(p)
    # dec4 conv input = up(f*8) + projected skip (f*8 // 2) = 1.5 * f * 8
    f = 8
    assert p["dec4_conv"]["kernel"].shape[2] == f * 8 + f * 8 // 2
