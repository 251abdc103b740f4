"""Profile the bench pipeline on the real chip and print a per-op cost table.

Captures a jax.profiler perfetto trace of a few pipeline dispatches and
aggregates device-side event durations by op name — the ground truth for
where the 66 ms/step actually goes (per-stage micro-benches through the axon
tunnel carry ~12 ms dispatch noise; see BASELINE.md r2 caveats).

Usage: python tools/exp_profile_pipeline.py [--mode pipeline|train]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="pipeline")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--tracedir", default="/tmp/vwfd_trace")
    ap.add_argument("--extractor", default="unet_tpu")
    ap.add_argument("--subnet", default="res_tpu2")
    ap.add_argument("--haar", default="conv",
                    help="INN Haar impl: lift | conv | mixed (ops/haar.py)")
    ap.add_argument("--scope", default=None,
                    help="print top ops inside one named scope "
                         "(Sembed|Sattack|Sextract|(unattributed))")
    ap.add_argument("--packed", action="store_true",
                    help="packed-space INN executor (nets/inn_packed.py)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np
    from vwfd_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from vwfd_tpu.models import VideoWatermarkModel
    from vwfd_tpu.attacks import attack_pool_video

    size, frames, batch = 256, 4, args.batch
    cfg = Config(data=DataConfig(gt_size=size, frames=frames, batch_size=batch),
                 model=ModelConfig(extractor=args.extractor,
                                   inn_subnet=args.subnet,
                                   inn_haar=args.haar,
                                   inn_packed=(args.packed and
                                               args.subnet == "res_tpu2")),
                 train=TrainConfig(dtype="bfloat16"))
    model = VideoWatermarkModel(cfg)
    states = model.init_states(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.random((batch, frames, size, size, 3), np.float32))
    key = jax.random.PRNGKey(1)

    if args.mode == "train":
        # full training step: fwd + attack + bwd + 2×AdamW. _loss carries the
        # same Sembed/Sattack/Sextract named scopes; their transposes inherit
        # the scope in the op metadata, so the table below attributes forward
        # AND backward device time per stage.
        from vwfd_tpu.models import VideoBatch
        tb = args.batch
        mask = jnp.asarray((rng.random((tb, frames, size, size, 1)) > 0.9)
                           .astype(np.float32))
        batch_ = VideoBatch(video, mask)
        prev = jnp.clip(video + 0.05, 0, 1)
        states, logs = model.train_step(states, batch_, prev, key)  # compile
        _ = float(logs["loss"])

        os.makedirs(args.tracedir, exist_ok=True)
        jax.profiler.start_trace(args.tracedir, create_perfetto_trace=True)
        for i in range(args.steps):
            states, logs = model.train_step(states, batch_, prev,
                                            jax.random.fold_in(key, i))
        _ = float(logs["loss"])  # true sync: logs depend on the whole step
        jax.profiler.stop_trace()
    else:
        @jax.jit
        def pipeline(v, k):
            k, k_atk = jax.random.split(k)
            with jax.named_scope("Sembed"):
                fwd = model.embed(states, v)
            with jax.named_scope("Sattack"):
                attacked = jnp.clip(attack_pool_video(k_atk, fwd), 0.0, 1.0)
            with jax.named_scope("Sextract"):
                mask = model.predict_mask(states, attacked, train=False)
            return jnp.mean(fwd), jnp.mean(mask), attacked

        # warm up / compile
        out = pipeline(video, key)
        jax.block_until_ready(out)
        _ = np.asarray(out[0])

        os.makedirs(args.tracedir, exist_ok=True)
        jax.profiler.start_trace(args.tracedir, create_perfetto_trace=True)
        for i in range(args.steps):
            out = pipeline(video, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        _ = np.asarray(out[0])
        jax.profiler.stop_trace()

    # ---- parse the perfetto trace
    paths = sorted(glob.glob(os.path.join(
        args.tracedir, "**", "*.json.gz"), recursive=True), key=os.path.getmtime)
    if not paths:
        print("no perfetto trace found under", args.tracedir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace

    # device-side threads: identify pids whose process name mentions TPU/device
    proc_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    device_pids = {pid for pid, n in proc_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    stage = defaultdict(float)  # named_scope (Sembed/Sattack/Sextract) → ms
    scope_ops = defaultdict(lambda: defaultdict(float))  # scope → op → ms
    scope_meta = {}  # op name → one long_name sample (for --scope listings)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        if device_pids and pid not in device_pids:
            continue
        tname = thread_names.get((pid, e.get("tid")), "")
        if "step" in tname.lower():
            continue  # step-marker lane, not ops
        dur = e.get("dur", 0) / 1e3  # us → ms
        name = e.get("name", "?")
        agg[name] += dur
        cnt[name] += 1
        total += dur
        # stage attribution: XLA keeps the jax named_scope in the op metadata
        # (args.long_name / args.tf_op); a fused op may span scopes — credit
        # the first one mentioned
        meta = " ".join(str(v) for v in (e.get("args") or {}).values())
        if name.startswith("jit_"):
            continue  # whole-module event: not an op
        for s in ("Sembed", "Sattack", "Sextract"):
            if s in meta:
                stage[s] += dur
                scope_ops[s][name] += dur
                scope_meta.setdefault(name, meta[:300])
                break
        else:
            stage["(unattributed)"] += dur
            scope_ops["(unattributed)"][name] += dur
            scope_meta.setdefault(name, meta[:300])
    if not agg:
        print("no device events matched; process names:",
              sorted(set(proc_names.values())))
        return
    print(f"total device op time: {total:.1f} ms over {args.steps} steps "
          f"({total/args.steps:.1f} ms/step)")
    if stage:
        parts = ", ".join(f"{k}={v/args.steps:.1f} ms" for k, v in
                          sorted(stage.items(), key=lambda kv: -kv[1]))
        print(f"per-stage (named_scope): {parts}")
    if args.scope:
        rows = sorted(scope_ops[args.scope].items(),
                      key=lambda kv: -kv[1])[:args.top]
        print(f"top ops inside scope {args.scope}:")
        for name, ms in rows:
            print(f"{ms/args.steps:9.3f} ms/step  ×{cnt[name]//args.steps:<4d} "
                  f"{name[:48]:48s} {scope_meta.get(name, '')[:160]}")
        return
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]
    for name, ms in rows:
        print(f"{ms/args.steps:9.3f} ms/step  ×{cnt[name]//args.steps:<4d} "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
