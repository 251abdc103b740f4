"""Production video-watermark serving CLI over `vwfd_tpu.serving`.

The reference has no deployment entry point — inference lives inside the
trainers' validation branches (`models/IRNcrop_model.py:520-607`). This CLI
is the standalone serving path: AOT-compiled embed/detect programs, uint8
wire format, double-buffered request pipelining (see vwfd_tpu/serving.py).

Clip layout on disk = the DAVIS directory protocol the loaders use
(`<root>/<clip_name>/<frame>.png`, consecutive frames — Dataloader.py's
folder walk). Each clip directory yields ⌊n_frames/T⌋ requests of T frames.

Usage:
    # watermark every clip under data/clips, write frames + a throughput line
    python scripts/serve_video.py --mode embed --root data/clips \
        --ckpt runs/video/ckpt --out served/

    # tamper detection on served output; writes masks + verdicts.json
    python scripts/serve_video.py --mode detect --root served/ --out masks/

    # synthetic end-to-end throughput probe (no media needed)
    python scripts/serve_video.py --mode roundtrip --synthetic 32
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _iter_disk_clips(root, frames, size):
    """Yield (name, uint8 (1,T,H,W,3)) per T consecutive frames of each
    clip directory — one serving request per window."""
    import cv2

    for clip in sorted(os.listdir(root)):
        cdir = os.path.join(root, clip)
        if not os.path.isdir(cdir):
            continue
        paths = sorted(
            p for p in os.listdir(cdir)
            if p.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))
        window = []
        for p in paths:
            img = cv2.imread(os.path.join(cdir, p), cv2.IMREAD_COLOR)
            if img is None:
                continue
            img = cv2.resize(img[:, :, ::-1], (size, size))
            window.append((os.path.splitext(p)[0], img))
            if len(window) == frames:
                names = [n for n, _ in window]
                arr = np.stack([im for _, im in window])[None]
                yield f"{clip}/{names[0]}..{names[-1]}", arr.astype(np.uint8)
                window = []


def _iter_synthetic(n, frames, size, batch):
    rng = np.random.default_rng(0)
    base = (rng.random((batch, frames, size, size, 3)) * 255).astype(np.uint8)
    for i in range(n):
        yield f"synthetic/{i:04d}", base


def _batched(reqs, batch):
    """Group per-clip requests into server-sized batches (tail stays short)."""
    names, rows = [], []
    for name, arr in reqs:
        for row in arr:
            names.append(name)
            rows.append(row)
        while len(rows) >= batch:
            yield names[:batch], np.stack(rows[:batch])
            names, rows = names[batch:], rows[batch:]
    if rows:
        yield names, np.stack(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="roundtrip",
                    choices=["embed", "detect", "roundtrip"])
    ap.add_argument("--root", default=None,
                    help="clip root (DAVIS layout); omit with --synthetic")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="serve N synthetic request batches instead of media")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--out", default=None,
                    help="output dir (embed: frames; detect: masks+verdicts)")
    ap.add_argument("--config", default=None,
                    help="YAML config (defaults to packaged video.yaml)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--window", type=int, default=2,
                    help="in-flight request window (double-buffer = 2)")
    ap.add_argument("--s2d", type=int, default=None,
                    help="extractor_s2d override — 4 = the 15.4x coarse-mask "
                         "serving point (BASELINE.md frontier table)")
    ap.add_argument("--export-dir", default=None,
                    help="freeze the compiled program(s) as self-contained "
                         "StableHLO artifacts (<mode>.vwfd) and exit — "
                         "reload anywhere with serving.load_exported")
    ap.add_argument("--int8", action="store_true",
                    help="detect/roundtrip through the int8 PTQ extractor "
                         "(nets/unet_int8.py; F1-neutral on the flagship "
                         "checkpoint — BASELINE.md r3 quality gate)")
    ap.add_argument("--int8-embed", action="store_true",
                    help="embed/roundtrip through the int8 PTQ INN "
                         "(nets/inn_int8.py; quality gate: "
                         "tools/exp_int8_eval.py --int8-embed)")
    ap.add_argument("--int8-margin", type=float, default=1.0,
                    help="calibration amax head-room multiplier")
    ap.add_argument("--stream", type=int, default=0,
                    help="sustained streaming-throughput mode: push N "
                         "request batches through serve_stream at in-flight "
                         "windows 1/2/4 (same compiled program) and report "
                         "clips/s + frames/s per window — measures whether "
                         "the double-buffering actually overlaps host "
                         "transfer with compute (window 1 = fully "
                         "synchronous baseline)")
    ap.add_argument("--latency", type=int, default=0,
                    help="latency mode: serve N single synchronous requests "
                         "at the configured batch and report p50/p95/p99 ms "
                         "per request (the deployment-facing number; "
                         "throughput mode pipelines and hides latency)")
    args = ap.parse_args()

    import dataclasses

    import vwfd_tpu
    from vwfd_tpu.config import load_config
    from vwfd_tpu.serving import WatermarkServer

    # default = the packaged flagship config (res_tpu2 + unet_tpu)
    cfg_path = args.config or os.path.join(
        os.path.dirname(vwfd_tpu.__file__), "configs", "video.yaml")
    cfg = load_config(cfg_path)
    data = dict(batch_size=args.batch or cfg.data.batch_size,
                frames=args.frames or cfg.data.frames,
                gt_size=args.size or cfg.data.gt_size)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, **data))
    if args.s2d:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, extractor_s2d=args.s2d))

    # roundtrip = ONE fused device program (embed→detect, bit-identical to
    # two-stage serving) — the watermarked clip never round-trips the host.
    modes = (args.mode,)
    t0 = time.time()
    server = WatermarkServer(cfg, ckpt_dir=args.ckpt, step=args.step,
                             modes=modes, threshold=args.threshold,
                             int8_extract=args.int8,
                             int8_embed=args.int8_embed,
                             int8_margin=args.int8_margin)
    compile_s = time.time() - t0

    if args.export_dir:
        os.makedirs(args.export_dir, exist_ok=True)
        for m in modes:
            p = os.path.join(args.export_dir, f"{m}.vwfd")
            server.export_program(m, p)
            print(json.dumps({"exported": p,
                              "bytes": os.path.getsize(p)}))
        return

    if args.stream:
        # Sustained streaming throughput (VERDICT r4 #7): N fresh uint8
        # request batches per window setting, results fully materialized on
        # host (delivered results, not dispatches). Window 1 serializes
        # upload→compute→download; larger windows let serve_stream overlap
        # them — the measured gap IS the double-buffering win.
        rng = np.random.default_rng(0)
        b, t, s = cfg.data.batch_size, cfg.data.frames, cfg.data.gt_size
        clips = [(rng.random((b, t, s, s, 3)) * 255).astype(np.uint8)
                 for _ in range(min(args.stream, 8))]

        def reqs():
            for i in range(args.stream):
                yield clips[i % len(clips)]

        def block(res):
            for k in res.keys():
                np.asarray(getattr(res, "mask" if k == "mask_bits" else k))

        for res in server.serve_stream(iter(clips), args.mode, window=2):
            block(res)  # warmup: compile + settle the tunnel
        for window in (1, 2, 4):
            t0 = time.perf_counter()
            n = 0
            for res in server.serve_stream(reqs(), args.mode, window=window):
                block(res)
                n += res.n
            wall = time.perf_counter() - t0
            print(json.dumps({
                "mode": args.mode, "window": window, "requests": args.stream,
                "clips": n, "batch": b, "frames": t, "size": s,
                "int8": bool(args.int8), "wall_s": round(wall, 3),
                "clips_per_s": round(n / wall, 2),
                "frames_per_s": round(n * t / wall, 1),
            }))
        return

    if args.latency:
        # Per-request wall: upload → compute → download of every output,
        # fully synchronous (window=1, result materialized before the next
        # request is issued). This is what a caller waiting on one clip
        # sees; the throughput path overlaps these stages instead.
        rng = np.random.default_rng(0)
        clip = (rng.random((cfg.data.batch_size, cfg.data.frames,
                            cfg.data.gt_size, cfg.data.gt_size, 3))
                * 255).astype(np.uint8)

        def block(res):
            for k in res.keys():
                np.asarray(getattr(res, "mask" if k == "mask_bits" else k))

        for _ in range(5):  # warmup: compile already done; settle the tunnel
            block(server.serve(clip, args.mode))
        times = []
        for _ in range(args.latency):
            t = time.perf_counter()
            block(server.serve(clip, args.mode))
            times.append((time.perf_counter() - t) * 1e3)
        times = np.asarray(times)
        print(json.dumps({
            "mode": args.mode, "batch": cfg.data.batch_size,
            "frames": cfg.data.frames, "size": cfg.data.gt_size,
            "requests": args.latency, "int8": bool(args.int8),
            "p50_ms": round(float(np.percentile(times, 50)), 2),
            "p95_ms": round(float(np.percentile(times, 95)), 2),
            "p99_ms": round(float(np.percentile(times, 99)), 2),
            "mean_ms": round(float(times.mean()), 2),
            "compile_s": round(compile_s, 2),
        }))
        return

    if args.synthetic:
        reqs = _iter_synthetic(args.synthetic, cfg.data.frames,
                               cfg.data.gt_size, cfg.data.batch_size)
    elif args.root:
        reqs = _iter_disk_clips(args.root, cfg.data.frames, cfg.data.gt_size)
    else:
        ap.error("need --root or --synthetic")

    if args.out:
        os.makedirs(args.out, exist_ok=True)

    def run(mode, batches):
        """Stream batches through one compiled program; returns stats +
        (name, result) pairs."""
        pairs = list(batches)
        results = server.serve_stream((arr for _, arr in pairs), mode,
                                      window=args.window)
        return zip((n for n, _ in pairs), results)

    import cv2

    n_frames = n_clips = 0
    verdicts = {}
    t1 = time.time()
    batches = list(_batched(reqs, cfg.data.batch_size))
    for names, res in run(args.mode, batches):
        n_clips += res.n
        n_frames += res.n * cfg.data.frames
        # materialize the mode's wire products (the throughput line measures
        # delivered results, not dispatches): embed → watermarked frames;
        # detect/roundtrip → bit-packed masks + per-clip verdicts. In
        # roundtrip the watermarked clip stays on device unless written out
        # — that's the fused program's point.
        wm = res.watermarked if args.mode == "embed" or (
            args.out and args.mode == "roundtrip") else None
        mask = None
        if args.mode in ("detect", "roundtrip"):
            mask = res.mask  # host-unpacked from the 1-bit wire format
            frac = res.tamper_fraction
            for i, name in enumerate(names[: res.n]):
                verdicts[f"{name}#{i}"] = float(frac[i])
        if args.out:
            for i, name in enumerate(names[: res.n]):
                safe = name.replace("/", "_")
                for t in range(cfg.data.frames):
                    if wm is not None:
                        cv2.imwrite(os.path.join(args.out, f"{safe}_f{t}.png"),
                                    wm[i, t][:, :, ::-1])
                    if mask is not None:
                        cv2.imwrite(os.path.join(
                            args.out, f"{safe}_f{t}_mask.png"), mask[i, t])
    wall = time.time() - t1

    if args.out and verdicts:
        with open(os.path.join(args.out, "verdicts.json"), "w") as f:
            json.dump(verdicts, f, indent=1, sort_keys=True)
    print(json.dumps({
        "mode": args.mode, "clips": n_clips, "frames": n_frames,
        "wall_s": round(wall, 3), "compile_s": round(compile_s, 2),
        "frames_per_s": round(n_frames / max(wall, 1e-9), 1),
        "window": args.window, "batch": cfg.data.batch_size,
        "size": cfg.data.gt_size,
    }))


if __name__ == "__main__":
    main()
