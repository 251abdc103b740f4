"""Quality gate for the int8 PTQ extractor: F1 bf16 vs int8 on a trained
flagship checkpoint, through the full embed → splice → attack → extract
pipeline (the same eval the trainer's eval_step runs).

Workflow:
  1. python tools/run_convergence.py --steps 2000 --criterion l1 \
       --subnet res_tpu2 --extractor unet_tpu --haar conv --packed \
       --econvs 2,2,1,1,1 --ckpt-dir /tmp/ckpt_flagship
  2. python tools/exp_int8_eval.py --ckpt-dir /tmp/ckpt_flagship

Calibrates the activation scales on `--calib-batches` attacked batches, then
evaluates `--eval-batches` fresh batches with both extractors and reports
mean/max F1 (sweep 0.1–0.9) and the per-batch deltas. Results → BASELINE.md.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--calib-batches", type=int, default=4)
    ap.add_argument("--eval-batches", type=int, default=16)
    ap.add_argument("--econvs", default="2,2,1,1,1")
    ap.add_argument("--s2d", type=int, default=2)
    ap.add_argument("--efeatures", type=int, default=64)
    ap.add_argument("--margin", type=float, default=1.0,
                    help="calibration amax head-room multiplier")
    ap.add_argument("--int8-embed", action="store_true",
                    help="also gate the int8 PTQ embed (nets/inn_int8.py): "
                         "embedded-image PSNR vs the bf16 embed, and "
                         "downstream F1 with the int8-embedded frames "
                         "through the full attack pipeline")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from vwfd_tpu.attacks import attack_pool_video
    from vwfd_tpu.attacks.spatial import rect_mask
    from vwfd_tpu.config import Config, DataConfig, ModelConfig
    from vwfd_tpu.metrics import f1_sweep, psnr255_int
    from vwfd_tpu.models import VideoWatermarkModel, VideoBatch
    from vwfd_tpu.models.state import latest_step, restore_checkpoint
    from vwfd_tpu.nets import unet_int8 as q8
    from vwfd_tpu.ops.resize import resize_bilinear

    econvs = tuple(int(s) for s in args.econvs.split(","))
    cfg = Config(
        data=DataConfig(gt_size=args.size, batch_size=args.batch,
                        frames=args.frames),
        model=ModelConfig(inn_subnet="res_tpu2", extractor="unet_tpu",
                          inn_haar="conv", inn_packed=True,
                          extractor_s2d=args.s2d,
                          extractor_features=args.efeatures,
                          extractor_enc_convs=econvs))
    model = VideoWatermarkModel(cfg)
    states = model.init_states(jax.random.PRNGKey(0))
    at = latest_step(args.ckpt_dir)
    if at is None:
        raise FileNotFoundError(args.ckpt_dir)
    states = restore_checkpoint(args.ckpt_dir, at, states)
    print(f"restored step {at} from {args.ckpt_dir}")

    s, t, b = args.size, args.frames, args.batch

    @jax.jit
    def gen(k):  # same synthetic clip family as tools/run_convergence.py
        k1, k2, k3, k4 = jax.random.split(k, 4)
        coarse = jax.random.uniform(k1, (b, 1, 16, 16, 3))
        drift = 0.05 * jax.random.normal(k2, (b, t, 1, 1, 3))
        video = jnp.clip(resize_bilinear(coarse, (s, s)) + drift, 0.0, 1.0)
        video = jnp.broadcast_to(video, (b, t, s, s, 3))
        h0 = jax.random.uniform(k3, (b, 2)) * (0.7 * s)
        sz = 0.15 * s + jax.random.uniform(k4, (b, 2)) * (0.25 * s)
        m = jax.vmap(lambda a, z: rect_mask(
            (s, s), (a[0], a[0] + z[0], a[1], a[1] + z[1])))(h0, sz)
        mask = jnp.broadcast_to(m[:, None, :, :, None], (b, t, s, s, 1))
        return video, mask

    @jax.jit
    def attacked_flat(k, video, mask, prev):
        fwd = model.embed(states, video)
        spliced = fwd * (1.0 - mask) + prev * mask
        att = jnp.clip(attack_pool_video(k, spliced,
                                         ratios=model.attack_ratios), 0, 1)
        return att, fwd

    gvars = {"params": states["generator"].params,
             **states["generator"].variables}

    # ---- calibrate on attacked traffic (what the extractor actually sees)
    key = jax.random.PRNGKey(123)
    calib = []
    prev_v = None
    for i in range(args.calib_batches + 1):
        key, kg, ka = jax.random.split(key, 3)
        video, mask = gen(kg)
        if prev_v is None:
            prev_v = video
            continue
        att, _ = attacked_flat(ka, video, mask, prev_v)
        calib.append(att.reshape(-1, s, s, 3))
        prev_v = video
    scales = q8.calibrate(gvars, calib, enc_convs=econvs, s2d=args.s2d,
                          margin=args.margin)
    qp = q8.quantize(gvars, scales, enc_convs=econvs)

    # ---- optional: int8 PTQ embed (nets/inn_int8.py) gated the same way
    eval_embed = None
    if args.int8_embed:
        from vwfd_tpu.models.video_model import _to_channels, _to_frames
        from vwfd_tpu.nets import inn_int8 as qe
        from vwfd_tpu.ops.quantize import clamp_with_grad, ste_quantize_255

        gp = states["netG"].params
        key_e, emb_calib = jax.random.PRNGKey(321), []
        to_ch = jax.jit(lambda v: _to_channels(v).astype(jnp.float32))
        for _ in range(args.calib_batches):
            key_e, kg = jax.random.split(key_e)
            video, _ = gen(kg)
            emb_calib.append(np.asarray(to_ch(video)))
        e_scales = qe.calibrate(gp, emb_calib, channels=3 * t)
        qemb = qe.quantize(gp, e_scales, channels=3 * t)

        def embed_i8(video):
            x = _to_channels(video.astype(jnp.bfloat16))
            fwd = qe.forward_int8(qemb, x, channels=3 * t)
            return ste_quantize_255(
                clamp_with_grad(_to_frames(fwd, t).astype(jnp.float32)))

        @jax.jit
        def eval_embed(k, video, mask, prev):
            fwd_bf = model.embed(states, video)
            fwd_i8 = embed_i8(video)
            spliced = fwd_i8 * (1.0 - mask) + prev * mask
            att = jnp.clip(attack_pool_video(k, spliced,
                                             ratios=model.attack_ratios),
                           0, 1)
            p_bf = model.predict_mask(states, att, train=False)
            p_i8 = q8.apply_int8(qp, att.reshape(-1, s, s, 3),
                                 s2d=args.s2d).reshape(mask.shape)
            _, f_bf = f1_sweep(p_bf, mask)
            _, f_i8 = f1_sweep(p_i8, mask)
            return (psnr255_int(video, fwd_bf), psnr255_int(video, fwd_i8),
                    psnr255_int(fwd_bf, fwd_i8),
                    jnp.max(f_bf), jnp.max(f_i8))

    @jax.jit
    def eval_both(k, video, mask, prev):
        att, fwd = attacked_flat(k, video, mask, prev)
        flat = att.reshape(-1, s, s, 3)
        p_bf = model.predict_mask(states, att, train=False)
        p_i8 = q8.apply_int8(qp, flat, s2d=args.s2d).reshape(mask.shape)
        _, f_bf = f1_sweep(p_bf, mask)
        _, f_i8 = f1_sweep(p_i8, mask)
        return (jnp.max(f_bf), jnp.max(f_i8), psnr255_int(video, fwd),
                jnp.mean(jnp.abs(p_i8 - p_bf.reshape(p_i8.shape))))

    rows, rows_e = [], []
    prev_v = None
    key = jax.random.PRNGKey(999)
    for i in range(args.eval_batches + 1):
        key, kg, ka = jax.random.split(key, 3)
        video, mask = gen(kg)
        if prev_v is None:
            prev_v = video
            continue
        f_bf, f_i8, pf, dm = (float(x) for x in
                              eval_both(ka, video, mask, prev_v))
        rows.append((f_bf, f_i8, pf, dm))
        print(f"batch {i}: F1 bf16 {f_bf:.4f}  int8 {f_i8:.4f}  "
              f"Δprob {dm:.4f}  PF {pf:.2f}")
        if eval_embed is not None:
            pf_bf, pf_i8, pfx, fe_bf, fe_i8 = (
                float(x) for x in eval_embed(ka, video, mask, prev_v))
            rows_e.append((pf_bf, pf_i8, pfx, fe_bf, fe_i8))
            print(f"  embed-int8: PF bf16 {pf_bf:.2f}  int8 {pf_i8:.2f}  "
                  f"PSNR(i8,bf16) {pfx:.2f}  "
                  f"F1 e8→x-bf16 {fe_bf:.4f}  e8→x-int8 {fe_i8:.4f}")
        prev_v = video
    arr = np.array(rows)
    print(f"\nmean over {len(rows)} batches: "
          f"F1 bf16 {arr[:,0].mean():.4f}  int8 {arr[:,1].mean():.4f}  "
          f"ΔF1 {arr[:,1].mean()-arr[:,0].mean():+.4f}  "
          f"mean|Δprob| {arr[:,3].mean():.4f}")
    if rows_e:
        ae = np.array(rows_e)
        print(f"embed-int8 mean: PF bf16 {ae[:,0].mean():.2f} dB  "
              f"int8 {ae[:,1].mean():.2f} dB  "
              f"ΔPF {ae[:,1].mean()-ae[:,0].mean():+.2f} dB  "
              f"PSNR(i8 vs bf16 embed) {ae[:,2].mean():.2f} dB  "
              f"F1 (int8 embed → bf16 extract) {ae[:,3].mean():.4f}  "
              f"(→ int8 extract) {ae[:,4].mean():.4f}  "
              f"[bf16-embed F1 baseline {arr[:,0].mean():.4f}]")


if __name__ == "__main__":
    main()
