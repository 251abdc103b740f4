"""Serving runtime tests (vwfd_tpu/serving.py).

The reference has no serving stack (inference = trainer validation branches,
IRNcrop_model.py:520-607); these tests pin down the production properties the
TPU-native server adds: AOT compile-once, uint8 wire-format parity with the
trainer's own embed/detect math, exact tail padding, stream pipelining
ordering, and mesh-sharded serving equal to single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vwfd_tpu.config import Config, DataConfig, ModelConfig
from vwfd_tpu.models.video_model import VideoWatermarkModel
from vwfd_tpu.serving import WatermarkServer


def _cfg(batch=2, size=32, frames=2):
    return Config(
        data=DataConfig(gt_size=size, batch_size=batch, frames=frames),
        model=ModelConfig(inn_down_num=2, inn_block_num=(1, 1),
                          inn_subnet="res_tpu2", extractor="unet_tpu",
                          extractor_features=8))


@pytest.fixture(scope="module")
def server():
    return WatermarkServer(_cfg())


@pytest.fixture()
def clip(rng):
    return (rng.random((2, 2, 32, 32, 3)) * 255).astype(np.uint8)


def test_embed_matches_trainer_math(server, clip):
    """uint8 wire path == the trainer's embed() on the same floats, up to
    the one 8-bit level the bf16 trunk itself wobbles."""
    res = server.serve(clip, "embed")
    wm = res.watermarked
    assert wm.shape == clip.shape and wm.dtype == np.uint8

    model = VideoWatermarkModel(_cfg())
    states = model.init_states(jax.random.PRNGKey(0))  # same init seed
    fwd = model.embed(states, jnp.asarray(clip, jnp.float32) / 255.0)
    ref = np.round(np.clip(np.asarray(fwd, np.float32), 0, 1) * 255)
    assert np.max(np.abs(wm.astype(np.int32) - ref.astype(np.int32))) <= 1


def test_detect_shapes_threshold_and_verdict(server, clip):
    res = server.serve(clip, "detect")
    mask = res.mask
    assert mask.shape == (2, 2, 32, 32, 1) and mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 255}
    frac = res.tamper_fraction
    assert frac.shape == (2,)
    assert np.all((frac >= 0) & (frac <= 1))


def test_detect_matches_trainer_thresholding(server, clip):
    """Regression: `predict_mask` returns sigmoid PROBABILITIES (the
    extractor applies its own sigmoid, reference network/UNet.py:96) — the
    serving mask must be `probs > threshold` on exactly those values, and
    the verdict their mean. An earlier revision re-applied sigmoid and
    thresholded in logit space, flagging every pixel at threshold 0.5."""
    res = server.serve(clip, "detect")
    model = VideoWatermarkModel(_cfg())
    states = model.init_states(jax.random.PRNGKey(0))  # same init seed
    probs = np.asarray(model.predict_mask(
        states, jnp.asarray(clip, jnp.float32) / 255.0, train=False),
        np.float32)
    expect = (probs > 0.5).astype(np.uint8) * 255
    # bf16 trunk wobble can flip pixels sitting exactly at the threshold;
    # random-init probs hover near 0.5, so allow a small disagreement band
    assert np.mean(res.mask != expect) < 0.02
    np.testing.assert_allclose(res.tamper_fraction,
                               probs.mean(axis=(1, 2, 3, 4)), atol=0.02)
    # and the mask must not be the degenerate all-tampered plane
    assert res.mask.mean() < 255.0


def test_tail_padding_is_exact(server, clip):
    """A padded partial batch returns exactly the full batch's rows —
    per-sample independence of the eval-mode programs."""
    full = server.serve(clip, "embed").watermarked
    part = server.serve(clip[:1], "embed")
    assert part.watermarked.shape[0] == 1
    np.testing.assert_array_equal(part.watermarked[0], full[0])


def test_no_retrace_on_off_shapes(server, clip):
    """The server never silently recompiles: wrong spatial shape or dtype
    is rejected at the boundary."""
    with pytest.raises(ValueError):
        server.serve(clip[:, :, :16], "embed")
    with pytest.raises(TypeError):
        server.serve(clip.astype(np.float32), "embed")
    with pytest.raises(ValueError):
        server.serve(np.concatenate([clip, clip]), "embed")  # over batch


def test_stream_preserves_order_and_counts(server, rng):
    clips = [(rng.random((n, 2, 32, 32, 3)) * 255).astype(np.uint8)
             for n in (2, 1, 2)]
    outs = list(server.serve_stream(clips, "detect", window=2))
    assert [o.n for o in outs] == [2, 1, 2]
    # order: results correspond to inputs positionally
    solo = server.serve(clips[1], "detect")
    np.testing.assert_array_equal(outs[1].mask, solo.mask)


def test_stream_window4_matches_window1(server, rng):
    """A deep in-flight window (the throughput setting serve_video.py
    --stream measures) changes scheduling only: per-request results are
    identical to the fully synchronous window=1 path, in submission order."""
    clips = [(rng.random((2, 2, 32, 32, 3)) * 255).astype(np.uint8)
             for _ in range(6)]
    deep = list(server.serve_stream(iter(clips), "detect", window=4))
    sync = list(server.serve_stream(iter(clips), "detect", window=1))
    assert [o.n for o in deep] == [o.n for o in sync] == [2] * 6
    for d, s in zip(deep, sync):
        np.testing.assert_array_equal(d.mask, s.mask)
        np.testing.assert_array_equal(d.tamper_fraction, s.tamper_fraction)


def test_mask_bits_wire_format(server, clip):
    """The detect wire carries 1 bit/pixel (8× fewer device→host bytes);
    ServeResult.mask unpacks to the same uint8 {0,255} interface."""
    from vwfd_tpu.serving import unpack_mask_bits

    res = server.serve(clip, "detect")
    assert "mask_bits" in res.keys() and "mask" not in res.keys()
    packed = res.mask_bits
    assert packed.shape == (2, 2, 32, 4) and packed.dtype == np.uint8
    np.testing.assert_array_equal(unpack_mask_bits(packed), res.mask)
    # exactness: unpack∘pack is the identity on the thresholded logits
    assert set(np.unique(res.mask)) <= {0, 255}
    # (the size%8 fallback to a plain uint8 mask is unreachable in practice:
    # every extractor needs size divisible by 16 for its skip concats)


def test_fused_roundtrip_matches_two_stage(server, clip):
    """modes=('roundtrip',) compiles embed→detect as one program whose
    outputs are bit-identical to serving the two stages over the wire."""
    srv = WatermarkServer(_cfg(), modes=("roundtrip",))
    fused = srv.serve(clip, "roundtrip")
    wm = server.serve(clip, "embed").watermarked
    det = server.serve(wm, "detect")
    np.testing.assert_array_equal(fused.watermarked, wm)
    np.testing.assert_array_equal(fused.mask, det.mask)
    np.testing.assert_array_equal(fused.tamper_fraction, det.tamper_fraction)


def test_stream_prefetch_preserves_results(server, rng):
    """serve_stream's async device→host prefetch changes timing only —
    results equal the synchronous path."""
    clips = [(rng.random((2, 2, 32, 32, 3)) * 255).astype(np.uint8)
             for _ in range(3)]
    outs = list(server.serve_stream(clips, "detect", window=3))
    for c, o in zip(clips, outs):
        np.testing.assert_array_equal(o.mask, server.serve(c, "detect").mask)


def test_modes_gate_compilation(clip):
    srv = WatermarkServer(_cfg(), modes=("embed",))
    srv.serve(clip, "embed")
    with pytest.raises(KeyError):
        srv.serve(clip, "detect")


def test_cost_analysis_exposed(server):
    cost = server.cost_analysis("embed")
    assert cost and any("flops" in k for k in cost)


def test_mesh_sharded_serving_matches_single(rng):
    """Batch-sharded serving over the 4-device data mesh == single device,
    bit for bit (same params, same program semantics)."""
    from vwfd_tpu.parallel import make_mesh

    cfg = _cfg(batch=4)
    clip = (rng.random((4, 2, 32, 32, 3)) * 255).astype(np.uint8)
    sharded = WatermarkServer(cfg, mesh=make_mesh(4, axes=("data",)))
    single = WatermarkServer(cfg)
    for mode, field in (("embed", "watermarked"), ("detect", "mask")):
        a = getattr(sharded.serve(clip, mode), field)
        b = getattr(single.serve(clip, mode), field)
        np.testing.assert_array_equal(a, b)


def test_export_frozen_artifact_roundtrip(tmp_path, server, clip):
    """export_program freezes a self-contained StableHLO artifact whose
    outputs are bit-identical to the live server's — loadable with only
    jax (no model code)."""
    from vwfd_tpu.serving import load_exported

    from vwfd_tpu.serving import unpack_mask_bits

    path = str(tmp_path / "detect.vwfd")
    server.export_program("detect", path, platforms=("tpu", "cpu"))
    call = load_exported(path)
    out = call(clip)
    ref = server.serve(clip, "detect")
    # artifact emits the 1-bit wire format; unpack needs only numpy
    np.testing.assert_array_equal(unpack_mask_bits(out["mask_bits"]),
                                  ref.mask)
    np.testing.assert_allclose(np.asarray(out["tamper_fraction"]),
                               ref.tamper_fraction, rtol=1e-6)


def test_export_from_mesh_server_roundtrip(tmp_path, rng):
    """A mesh-backed server exports too: params are replicated over the data
    mesh so they gather losslessly, and the frozen single-device artifact's
    outputs match the sharded server's (VERDICT r3 #6 — limitation lifted)."""
    from vwfd_tpu.parallel import make_mesh
    from vwfd_tpu.serving import load_exported

    cfg = _cfg(batch=4)
    clip = (rng.random((4, 2, 32, 32, 3)) * 255).astype(np.uint8)
    srv = WatermarkServer(cfg, mesh=make_mesh(4, axes=("data",)),
                          modes=("embed",))
    path = str(tmp_path / "embed.vwfd")
    srv.export_program("embed", path, platforms=("cpu",))
    out = load_exported(path)(clip)
    np.testing.assert_array_equal(np.asarray(out["watermarked"]),
                                  srv.serve(clip, "embed").watermarked)


def test_checkpoint_restore_changes_outputs(tmp_path, clip):
    """Server restores trainer checkpoints: serve(ckpt) reflects trained
    params, not the init."""
    from vwfd_tpu.models.state import save_checkpoint

    cfg = _cfg()
    model = VideoWatermarkModel(cfg)
    states = model.init_states(jax.random.PRNGKey(7))  # different seed
    save_checkpoint(str(tmp_path / "ckpt"), 3, states)

    srv = WatermarkServer(cfg, ckpt_dir=str(tmp_path / "ckpt"))
    base = WatermarkServer(cfg)
    # embed is near-identity at ANY init (zero-init coupling heads), so the
    # restored-params signal lives in the detector's logits:
    a = srv.serve(clip, "detect").tamper_fraction
    b = base.serve(clip, "detect").tamper_fraction
    assert not np.allclose(a, b)

    with pytest.raises(FileNotFoundError):
        WatermarkServer(cfg, ckpt_dir=str(tmp_path / "nope"))


def test_int8_detect_matches_direct_quantized_forward(clip):
    """`int8_extract=True` routes detect through nets/unet_int8.py: the
    served mask must equal thresholding apply_int8's probabilities on the
    server's own qparams — exactly (int8 math is deterministic)."""
    from vwfd_tpu.nets import unet_int8 as q8
    from vwfd_tpu.serving import unpack_mask_bits

    srv = WatermarkServer(_cfg(), int8_extract=True)
    res = srv.serve(clip, "detect")

    flat = jnp.asarray(clip, jnp.float32).reshape(-1, 32, 32, 3) / 255.0
    probs = np.asarray(q8.apply_int8(srv._params["qext"], flat, s2d=2),
                       np.float32).reshape(2, 2, 32, 32, 1)
    expect = (probs > 0.5).astype(np.uint8) * 255
    np.testing.assert_array_equal(res.mask, expect)
    np.testing.assert_allclose(res.tamper_fraction,
                               probs.mean(axis=(1, 2, 3, 4)), atol=1e-5)


def test_int8_calib_clips_accepted(clip):
    """Caller-supplied calibration traffic (ndarray or iterable of uint8
    clips) drives the activation scales."""
    srv = WatermarkServer(_cfg(), modes=("detect",), int8_extract=True,
                          int8_calib=clip)
    res = srv.serve(clip, "detect")
    assert res.mask.shape == (2, 2, 32, 32, 1)
    # margin changes the scales, so qparams must differ
    srv2 = WatermarkServer(_cfg(), modes=("detect",), int8_extract=True,
                           int8_calib=[clip], int8_margin=2.0)
    m1 = np.asarray(srv._params["qext"]["enc"][0][0]["m"])
    m2 = np.asarray(srv2._params["qext"]["enc"][0][0]["m"])
    assert not np.allclose(m1, m2)


def test_int8_roundtrip_runs_fused(clip):
    """The fused roundtrip program composes the f32 embed with the int8
    detect; the detect half must equal serving the embed output."""
    srv = WatermarkServer(_cfg(), modes=("embed", "detect", "roundtrip"),
                          int8_extract=True)
    fused = srv.serve(clip, "roundtrip")
    wm = srv.serve(clip, "embed").watermarked
    two = srv.serve(wm, "detect")
    np.testing.assert_array_equal(fused.watermarked, wm)
    np.testing.assert_array_equal(fused.mask, two.mask)


def test_int8_rejects_unsupported_extractor():
    cfg = Config(
        data=DataConfig(gt_size=32, batch_size=2, frames=2),
        model=ModelConfig(inn_down_num=2, inn_block_num=(1, 1),
                          inn_subnet="res_tpu2", extractor="unet"))
    with pytest.raises(ValueError, match="int8_extract"):
        WatermarkServer(cfg, int8_extract=True)


def _cfg_packed(batch=2, size=32, frames=2):
    return Config(
        data=DataConfig(gt_size=size, batch_size=batch, frames=frames),
        model=ModelConfig(inn_down_num=2, inn_block_num=(1, 1),
                          inn_subnet="res_tpu2", extractor="unet_tpu",
                          extractor_features=8, inn_haar="conv",
                          inn_packed=True))


def test_int8_embed_serving_matches_bf16(clip):
    """`int8_embed=True` routes embed through nets/inn_int8.py. On the
    random-init net the PTQ path tracks the bf16 embed to within a couple
    of 8-bit levels, and the fused roundtrip compiles with the int8 embed
    inside it."""
    srv8 = WatermarkServer(_cfg_packed(), modes=("embed", "roundtrip"),
                           int8_embed=True)
    srv = WatermarkServer(_cfg_packed(), modes=("embed",))
    wm8 = srv8.serve(clip, "embed").watermarked
    wm = srv.serve(clip, "embed").watermarked
    assert wm8.dtype == np.uint8 and wm8.shape == clip.shape
    assert np.mean(np.abs(wm8.astype(int) - wm.astype(int))) < 2.0
    out = srv8.serve(clip, "roundtrip")
    assert out.watermarked.shape == clip.shape
    assert out.tamper_fraction.shape == (2,)


def test_int8_embed_requires_packed():
    with pytest.raises(ValueError, match="int8_embed"):
        WatermarkServer(_cfg(), modes=("embed",), int8_embed=True)


def test_int8_calib_oneshot_iterable_feeds_both_paths(clip):
    """ADVICE r4 (medium): a one-shot iterable passed as int8_calib must be
    materialized once so BOTH int8 paths calibrate from it (the embed
    branch's list() used to exhaust the iterator before the extract
    branch ran); per-path int8_calib_embed/int8_calib_detect also work."""
    oneshot = (c for c in [clip])  # generator: consumable exactly once
    srv = WatermarkServer(_cfg_packed(), modes=("roundtrip",),
                          int8_extract=True, int8_embed=True,
                          int8_calib=oneshot)
    out = srv.serve(clip, "roundtrip")
    assert out.watermarked.shape == clip.shape

    srv2 = WatermarkServer(_cfg_packed(), modes=("roundtrip",),
                           int8_extract=True, int8_embed=True,
                           int8_calib_embed=clip,
                           int8_calib_detect=(c for c in [clip]))
    out2 = srv2.serve(clip, "roundtrip")
    assert out2.tamper_fraction.shape == (2,)
