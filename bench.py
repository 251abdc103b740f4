"""Benchmark harness — frames/sec for embed→attack→extract at 256².

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "config",
"mfu_bf16", "hbm_bw_util", "flops_per_frame"}.

The estimate-free headline is `mfu_bf16` (VERDICT r4 #3): pipeline FLOPs are
read from XLA's own cost analysis of the measured program (one scan body,
lowered+compiled at the bench shapes — no hand math), multiplied by the
measured frames/s and divided by the v5e bf16 peak (197 TFLOP/s). The
`vs_baseline` ratio against the ESTIMATED reference GPU fps (BASELINE.md) is
kept for continuity, but the hardware-anchored claim needs no estimate:
`mfu_bf16` and `hbm_bw_util` (bytes-accessed/s over the 819 GB/s HBM peak)
state how close to this chip's own ceilings the pipeline runs.

The pipeline measured is the flagship inference path (the BASELINE.json
headline): INN watermark embed (12-ch, block_num (1,1,1), MXU-shaped
half-res res_tpu2 coupling trunks) → 5-way per-frame attack pool
(resize/JPEG×2/median/gauss) → UNetTPU tamper-mask extraction, at 256².
Reference-exact architectures remain selectable (--subnet res --extractor
unet).

`vs_baseline` divides by REFERENCE_GPU_FPS — the estimated reference
throughput of the same pipeline in the PyTorch repo on one A100-class GPU
(see BASELINE.md; the repo publishes no numbers, so this is an estimate
recorded there). Driver target: ≥10× (BASELINE.json).
"""

import argparse
import json
import time

import numpy as np

REFERENCE_GPU_FPS = 250.0  # estimated; see BASELINE.md "reference throughput"
V5E_BF16_PEAK = 197e12     # TPU v5e (v5 lite) bf16 peak, FLOP/s
V5E_HBM_BW = 819e9         # TPU v5e HBM bandwidth, bytes/s


def _cost_analysis(jitted_lowered):
    """flops / bytes-accessed from XLA's cost model; NaN-safe."""
    try:
        ca = jitted_lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return (float(ca.get("flops", float("nan"))),
                float(ca.get("bytes accessed", float("nan"))))
    except Exception:
        return float("nan"), float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke config")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=16,
                    help="pipeline steps fused per dispatch (lax.scan): the "
                    "tunnel/dispatch overhead (~12 ms measured) amortizes "
                    "over chunk×batch×frames frames")
    ap.add_argument("--breakdown", action="store_true",
                    help="also time embed/attack/extract separately (stderr)")
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    help="compute dtype: bfloat16 | float32")
    ap.add_argument("--subnet", type=str, default="res_tpu2",
                    help="INN coupling subnet: res_tpu2 (half-res MXU-shaped "
                         "trunk, flagship default — parity in BASELINE.md r3) "
                         "| res_tpu (full-res MXU-shaped) | res "
                         "(reference-exact)")
    ap.add_argument("--extractor", type=str, default="unet_tpu",
                    help="tamper-mask extractor: unet_tpu (MXU-shaped "
                         "redesign, flagship default — F1 parity shown in "
                         "BASELINE.md r3) | unet (reference-exact)")
    ap.add_argument("--s2d", type=int, default=2,
                    help="UNetTPU space-to-depth stem factor (2 flagship; "
                         "4 = coarser/faster experiment)")
    ap.add_argument("--efeatures", type=int, default=64,
                    help="UNetTPU channel base (extractor_features)")
    ap.add_argument("--ehead", type=str, default="d2s",
                    help="UNetTPU head lowering: d2s | convt (composed "
                         "transposed conv — same map, no 4-lane packed "
                         "intermediate)")
    ap.add_argument("--econvs", type=str, default="2,2,1,1,1",
                    help="UNetTPU per-level encoder-conv plan (enc1..enc4, "
                         "bottleneck). Flagship default 2,2,1,1,1: single "
                         "second conv dropped at the ≤64² levels — "
                         "convergence-validated (BASELINE.md r3, F1 0.962); "
                         "'2,2,2,2,2' = the full-quality plan (F1 0.965)")
    ap.add_argument("--eup", type=str, default="convt",
                    help="UNetTPU upsample lowering: convt | gemm (1×1 GEMM "
                         "+ conv-d2s — same params, identical map)")
    ap.add_argument("--edec", type=str, default="concat",
                    help="UNetTPU decoder-conv lowering: concat | split "
                         "(kernel-sliced convs, concat never materialized)")
    ap.add_argument("--packed", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="packed-space INN executor (nets/inn_packed.py): "
                         "<256-ch levels held s2d-packed at trunk "
                         "resolution; value-identical, same params "
                         "(flagship default — BASELINE.md r3 packed table; "
                         "--no-packed for the module path)")
    ap.add_argument("--block-num", type=str, default=None,
                    help="INN coupling schedule override, e.g. '0,2,1' "
                         "(default: reference 1,1,1)")
    ap.add_argument("--haar", type=str, default="conv",
                    help="INN Haar squeeze impl: lift (reshape+add) | conv "
                         "(fixed-weight stride-2 convs — layout-stable, "
                         "see ops/haar.py)")
    ap.add_argument("--int8-extract", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="run the extractor through the int8 PTQ path "
                         "(nets/unet_int8.py): BN-folded, per-channel int8 "
                         "weights, calibrated activation scales — the MXU's "
                         "int8 mode is ~2× its bf16 rate. DEFAULT ON for the "
                         "flagship inference pipeline since the 10k-step "
                         "quality gate measured ΔF1 = -0.0001 "
                         "(runs/int8_gate_r4_10k.txt, VERDICT r3 #3); "
                         "--no-int8-extract benches the bf16 extract")
    ap.add_argument("--int8-embed", action="store_true",
                    help="run the embed INN through the int8 PTQ path "
                         "(nets/inn_int8.py): per-channel int8 weights on "
                         "the packed executor's learned convs, calibrated "
                         "activation scales (quality gate: "
                         "tools/exp_int8_eval.py --int8-embed)")
    ap.add_argument("--train", action="store_true",
                    help="bench the full training step (fwd+attack+bwd+2×AdamW)"
                         " instead of the inference pipeline")
    args = ap.parse_args()
    if args.int8_extract is None:
        # promoted default: int8 extract on the flagship inference pipeline
        # (10k-step gate: ΔF1 -0.0001); training and non-UNetTPU extractors
        # stay bf16, as does --tiny (CPU smoke)
        args.int8_extract = (not args.tiny and not args.train
                             and args.extractor == "unet_tpu")
    if args.int8_extract and (args.tiny or args.extractor != "unet_tpu"
                              or args.train):
        ap.error("--int8-extract is the UNetTPU inference PTQ path "
                 "(not --tiny / --train / other extractors)")
    if args.int8_embed and (args.tiny or args.train
                            or args.subnet != "res_tpu2" or not args.packed):
        ap.error("--int8-embed is the packed flagship embed's inference PTQ "
                 "path (needs --subnet res_tpu2 with --packed, "
                 "not --tiny / --train)")

    import jax
    # persistent compile cache: repeat bench invocations skip the ~10-min
    # host-side XLA compile on this 1-core box
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from vwfd_tpu.config import Config, DataConfig, ModelConfig
    from vwfd_tpu.models import VideoWatermarkModel

    if args.tiny:
        size, frames, batch, steps, warmup = 32, 2, 2, 3, 1
        mc = ModelConfig(inn_down_num=2, inn_block_num=(1, 1), unet_features=4)
        ratios = (0.5, 1.0, 1.5)
    else:
        size, frames, batch, steps, warmup = 256, 4, args.batch or 32, args.steps or 10, 3
        # Flagship nets: MXU-shaped res_tpu coupling trunk + UNetTPU extractor
        # (BASELINE.md r3 — 2817 fps vs 1941 with the reference-shaped nets).
        # A fused Pallas coupling kernel was measured slower in-context and
        # retired after the r4 pipeline attempt — see RETIRED.md.
        mc = ModelConfig(inn_subnet=args.subnet, extractor=args.extractor,
                         extractor_s2d=args.s2d,
                         extractor_features=args.efeatures,
                         extractor_head=args.ehead,
                         extractor_up=args.eup,
                         extractor_dec=args.edec,
                         extractor_enc_convs=(tuple(
                             int(s) for s in args.econvs.split(","))
                             if args.econvs else None),
                         inn_haar=args.haar,
                         # the packed executor only exists for the flagship
                         # trunk — silently off for A/B subnets
                         inn_packed=args.packed and args.subnet == "res_tpu2",
                         **({"inn_block_num": tuple(
                             int(s) for s in args.block_num.split(","))}
                            if args.block_num else {}))
        ratios = None

    from vwfd_tpu.config import TrainConfig
    cfg = Config(data=DataConfig(gt_size=size, frames=frames, batch_size=batch),
                 model=mc, train=TrainConfig(dtype=args.dtype))
    model = VideoWatermarkModel(cfg, attack_ratios=ratios)
    states = model.init_states(jax.random.PRNGKey(0))

    if args.train:
        from vwfd_tpu.models import VideoBatch
        rng = np.random.default_rng(0)
        tb = (args.batch or 16) if not args.tiny else batch
        video = jnp.asarray(rng.random((tb, frames, size, size, 3), np.float32))
        mask = jnp.asarray((rng.random((tb, frames, size, size, 1)) > 0.9)
                           .astype(np.float32))
        tbatch = VideoBatch(video, mask)
        prev = jnp.clip(video + 0.05, 0, 1)
        key = jax.random.PRNGKey(1)
        states, logs = model.train_step(states, tbatch, prev, key)  # compile
        _ = float(logs["loss"])
        t0 = time.perf_counter()
        for i in range(steps):
            key, k = jax.random.split(key)
            states, logs = model.train_step(states, tbatch, prev, k)
        _ = float(logs["loss"])  # true sync (states chain serializes steps)
        dt = time.perf_counter() - t0
        fps = steps * tb * frames / dt
        print(json.dumps({
            "metric": "train_frames_per_sec_256",
            "value": round(fps, 2), "unit": "frames/s",
            "vs_baseline": round(fps / REFERENCE_GPU_FPS, 3),
            "config": {"batch": tb, "frames": frames, "size": size,
                       "dtype": args.dtype, "subnet": args.subnet,
                       "extractor": args.extractor, "train": True}}))
        return

    chunk = max(1, args.chunk)

    qp = None
    if args.int8_extract:
        # PTQ conversion: calibrate on one attacked batch of this very
        # traffic, then fold/quantize (nets/unet_int8.py). Conversion cost is
        # off the clock — it is a deploy-time step, not a serve-time one.
        from vwfd_tpu.attacks import attack_pool_video as _apv
        from vwfd_tpu.nets import unet_int8 as q8
        rng0 = np.random.default_rng(7)
        v0 = jnp.asarray(rng0.random((batch, frames, size, size, 3),
                                     np.float32))
        emb0 = jax.jit(lambda v: model.embed(states, v))(v0)
        att0 = jnp.clip(_apv(jax.random.PRNGKey(3), emb0, ratios=ratios),
                        0, 1)
        gvars = {"params": states["generator"].params,
                 **states["generator"].variables}
        plan = (tuple(int(s) for s in args.econvs.split(","))
                if args.econvs else (2, 2, 1, 1, 1))
        scales = q8.calibrate(gvars, [att0.reshape(-1, size, size, 3)],
                              enc_convs=plan, s2d=args.s2d)
        qp = q8.quantize(gvars, scales, enc_convs=plan)
        _apply_int8 = q8.apply_int8

    qe = None
    if args.int8_embed:
        # PTQ conversion of the packed embed (nets/inn_int8.py): calibrate
        # on clean clips — exactly what the embed sees. Deploy-time step,
        # off the serving clock.
        from vwfd_tpu.models.video_model import _to_channels, _to_frames
        from vwfd_tpu.nets import inn_int8 as q8e
        from vwfd_tpu.ops.quantize import clamp_with_grad, ste_quantize_255
        rng0 = np.random.default_rng(11)
        v0 = jnp.asarray(rng0.random((batch, frames, size, size, 3),
                                     np.float32))
        xc = np.asarray(jax.jit(
            lambda v: _to_channels(v).astype(jnp.float32))(v0))
        e_scales = q8e.calibrate(states["netG"].params, [xc],
                                 channels=3 * frames)
        qe = q8e.quantize(states["netG"].params, e_scales,
                          channels=3 * frames)

        def _embed_int8(qep, v):
            x = _to_channels(v.astype(jnp.bfloat16))
            out = q8e.forward_int8(qep, x, channels=3 * frames)
            return ste_quantize_255(clamp_with_grad(
                _to_frames(out.astype(jnp.bfloat16),
                           frames).astype(jnp.float32)))

    def _one_iter(s, video, v, k, qparams, qeparams):
        """One full embed→attack→extract step — the scan body, shared with
        the MFU cost analysis so the analyzed program IS the measured one."""
        from vwfd_tpu.attacks import attack_pool_video
        k, k_atk = jax.random.split(k)
        if args.int8_embed:
            fwd = _embed_int8(qeparams, v)
        else:
            fwd = model.embed(s, v)
        attacked = jnp.clip(attack_pool_video(k_atk, fwd, ratios=ratios),
                            0.0, 1.0)
        if args.int8_extract:
            b, t = attacked.shape[0], attacked.shape[1]
            flat = attacked.reshape(b * t, *attacked.shape[2:])
            mask = _apply_int8(qparams, flat, s2d=args.s2d)
        else:
            mask = model.predict_mask(s, attacked, train=False)
        v_next = jnp.clip(0.9 * video + 0.1 * attacked, 0.0, 1.0)
        return (k, v_next), (jnp.mean(fwd), jnp.mean(mask))

    @jax.jit
    def pipeline(netg_params, netg_vars, gen_params, gen_vars, video, key,
                 qparams, qeparams):
        """`chunk` full embed→attack→extract steps per dispatch. The next
        step's input video carries a dependency on the previous step's
        attacked output so XLA cannot hoist/CSE any stage out of the scan —
        every iteration embeds a genuinely different clip."""
        s = {"netG": states["netG"].replace(params=netg_params, variables=netg_vars),
             "generator": states["generator"].replace(params=gen_params,
                                                      variables=gen_vars)}
        from vwfd_tpu.attacks import attack_pool_video

        def body(carry, _):
            k, v = carry
            return _one_iter(s, video, v, k, qparams, qeparams)

        (_, _), outs = jax.lax.scan(body, (key, video), None, length=chunk)
        return outs

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.random((batch, frames, size, size, 3), np.float32))
    key = jax.random.PRNGKey(1)
    a = (states["netG"].params, states["netG"].variables,
         states["generator"].params, states["generator"].variables)

    if args.breakdown:
        import sys
        from vwfd_tpu.attacks import attack_pool_video

        def timed(name, fn, *fargs):
            f = jax.jit(fn)
            o = f(*fargs)
            jax.block_until_ready(o)
            t0 = time.perf_counter()
            for _ in range(steps):
                o = f(*fargs)
            jax.block_until_ready(o)
            dt = (time.perf_counter() - t0) / steps
            print(f"[breakdown] {name}: {dt*1e3:.1f} ms/step "
                  f"({batch*frames/dt:.0f} fps)", file=sys.stderr)
            return o

        emb = timed("embed", lambda v: model.embed(states, v), video)
        atk = timed("attack", lambda v, k: attack_pool_video(k, v, ratios=ratios),
                    emb, key)
        timed("extract", lambda v: model.predict_mask(states, v, train=False),
              jnp.clip(atk, 0, 1))
        if qp is not None:
            flat = jnp.clip(atk, 0, 1).reshape(-1, size, size, 3)
            timed("extract-int8",
                  lambda q, v: _apply_int8(q, v, s2d=args.s2d), qp, flat)
        if qe is not None:
            timed("embed-int8", _embed_int8, qe, video)

    for _ in range(warmup):
        out = pipeline(*a, video, key, qp if qp is not None else (),
                       qe if qe is not None else ())
    jax.block_until_ready(out)
    _ = np.asarray(out[0])  # true sync before starting the clock

    t0 = time.perf_counter()
    for i in range(steps):
        key = jax.random.fold_in(key, i)
        out = pipeline(*a, video, key, qp if qp is not None else (),
                       qe if qe is not None else ())
    jax.block_until_ready(out)
    # np.asarray forces a real device→host sync: block_until_ready through
    # the axon tunnel can return before execution completes (measured).
    _ = np.asarray(out[0])
    dt = time.perf_counter() - t0

    fps = steps * chunk * batch * frames / dt

    # ---- estimate-free utilization (VERDICT r4 #3): XLA cost analysis of
    # ONE scan-body iteration at the measured shapes. The analyzed program is
    # the same _one_iter the timed scan runs; flops include the int8 extract
    # GEMMs when enabled (counted as ops — mfu_bf16 stays normalized by the
    # bf16 peak, the conservative convention).
    @jax.jit
    def _iter_for_cost(netg_params, netg_vars, gen_params, gen_vars, video,
                       v, k, qparams, qeparams):
        s = {"netG": states["netG"].replace(params=netg_params,
                                            variables=netg_vars),
             "generator": states["generator"].replace(params=gen_params,
                                                      variables=gen_vars)}
        return _one_iter(s, video, v, k, qparams, qeparams)

    flops_it, bytes_it = _cost_analysis(_iter_for_cost.lower(
        *a, video, video, key, qp if qp is not None else (),
        qe if qe is not None else ()))
    frames_it = batch * frames
    flops_per_frame = flops_it / frames_it
    mfu = fps * flops_per_frame / V5E_BF16_PEAK
    hbm = fps * (bytes_it / frames_it) / V5E_HBM_BW

    rec = {
        "metric": "frames_per_sec_embed_attack_extract_256" if not args.tiny
                  else "frames_per_sec_tiny_smoke",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_GPU_FPS, 3),
        "config": {
            "batch": batch, "frames": frames, "size": size, "chunk": chunk,
            "dtype": args.dtype, "subnet": args.subnet,
            "extractor": args.extractor, "econvs": args.econvs,
            "s2d": args.s2d, "packed": bool(args.packed),
            "haar": args.haar, "int8_extract": bool(args.int8_extract),
            "int8_embed": bool(args.int8_embed),
        },
    }
    if np.isfinite(mfu):
        rec["flops_per_frame"] = round(flops_per_frame / 1e9, 3)  # GFLOP
        rec["mfu_bf16"] = round(mfu, 4)
        rec["hbm_bw_util"] = round(hbm, 4)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
