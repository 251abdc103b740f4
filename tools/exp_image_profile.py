"""Profile the still-image family's train step on the real chip.

Per-stage device-time attribution for ImageImmunizationModel.train_step at
the reference's 512² geometry (train_IRNclr_x4.yml:38-39) via the
Iembed/Iattack/Ilocalize/Iapex/Icanny/Ireverse/Iperceptual named scopes in
models/image_model.py::_loss — backward ops inherit the scope through the
op metadata, so each stage's number is forward + backward + its optimizer
slice. Ground truth for where the PAMI/CLR ms/step goes.

Usage: python tools/exp_image_profile.py [pami|clr] [--subnet res] [--size 512]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCOPES = ("Iembed", "Iattack", "Ilocalize", "Iapex", "Icanny", "Ireverse",
          "Iperceptual")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("task", nargs="?", default="clr", choices=["pami", "clr"])
    ap.add_argument("--subnet", default="res")
    ap.add_argument("--haar", default="lift",
                    help="INN Haar impl: lift | conv | mixed (ops/haar.py)")
    ap.add_argument("--localizer-dim", type=int, default=0,
                    help="override ModelConfig.localizer_dim (0 = config)")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--reverse-k", type=int, default=3)
    ap.add_argument("--tracedir", default="/tmp/vwfd_img_trace")
    ap.add_argument("--scope", default=None,
                    help="print top ops inside one named scope")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from vwfd_tpu.config import Config, DataConfig, ModelConfig
    from vwfd_tpu.models.image_model import ImageImmunizationModel, ImageBatch

    b, s = args.batch, args.size
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((b, s, s, 3), np.float32))
    canny = jnp.asarray((rng.random((b, s, s, 1)) > 0.92).astype(np.float32))
    m = np.zeros((b, s, s, 1), np.float32)
    m[:, s // 4: s // 2, s // 4: s // 2] = 1.0
    batch = ImageBatch(img, canny, jnp.asarray(m))
    prev = jnp.clip(img + 0.03, 0, 1)

    mc = {"inn_subnet": args.subnet, "inn_haar": args.haar}
    if args.localizer_dim:
        mc["localizer_dim"] = args.localizer_dim
    model = ImageImmunizationModel(
        Config(data=DataConfig(gt_size=s, batch_size=b),
               model=ModelConfig(**mc)),
        task=args.task, reverse_k=args.reverse_k)
    states = model.init_states(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    states, logs = model.train_step(states, batch, prev, key)  # compile
    _ = float(logs["loss"])

    os.makedirs(args.tracedir, exist_ok=True)
    jax.profiler.start_trace(args.tracedir, create_perfetto_trace=True)
    for i in range(args.steps):
        states, logs = model.train_step(states, batch, prev,
                                        jax.random.fold_in(key, i))
    _ = float(logs["loss"])  # true sync
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(
        args.tracedir, "**", "*.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print("no perfetto trace found under", args.tracedir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace

    proc_names, thread_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {pid for pid, n in proc_names.items()
                   if "TPU" in n or "/device" in n.lower()}

    agg, cnt = defaultdict(float), defaultdict(int)
    stage = defaultdict(float)
    scope_ops = defaultdict(lambda: defaultdict(float))
    scope_meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        if device_pids and pid not in device_pids:
            continue
        if "step" in thread_names.get((pid, e.get("tid")), "").lower():
            continue
        dur = e.get("dur", 0) / 1e3
        name = e.get("name", "?")
        if name.startswith("jit_"):
            continue
        agg[name] += dur
        cnt[name] += 1
        total += dur
        meta = " ".join(str(v) for v in (e.get("args") or {}).values())
        for sc in SCOPES:
            if sc in meta:
                stage[sc] += dur
                scope_ops[sc][name] += dur
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
    print(f"{args.task}@{s}² b{b} subnet={args.subnet} "
          f"reverse_k={args.reverse_k}: total device op time "
          f"{total:.1f} ms over {args.steps} steps "
          f"({total / args.steps:.1f} ms/step)")
    parts = ", ".join(f"{k}={v / args.steps:.1f}" for k, v in
                      sorted(stage.items(), key=lambda kv: -kv[1]))
    print(f"per-stage ms/step: {parts}")
    if args.scope:
        rows = sorted(scope_ops[args.scope].items(),
                      key=lambda kv: -kv[1])[:args.top]
        print(f"top ops inside scope {args.scope}:")
        for name, ms in rows:
            print(f"{ms / args.steps:9.3f} ms/step "
                  f"×{cnt[name] // args.steps:<4d} {name[:48]:48s} "
                  f"{scope_meta.get(name, '')[:160]}")
        return
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]
    for name, ms in rows:
        print(f"{ms / args.steps:9.3f} ms/step ×{cnt[name] // args.steps:<4d} "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
