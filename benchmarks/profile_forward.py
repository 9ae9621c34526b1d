"""Device-profile attribution for the dla_34 forward (+decode) and train
step (VERDICT round-2 item 1a: "capture a device profile ... instead of
declaring the tunnel can't").

jax.profiler.trace DOES work through the axon tunnel (round 3): the
gzipped Chrome trace contains a /device:TPU:0 process with one X event
per executed fusion, including device wall duration. This script runs one
profiled step and aggregates device time by fusion, classifying fusions
into buckets (DCN selection einsums, convolutions, elementwise, copies)
by name + the HLO op inside.

Run: python benchmarks/profile_forward.py [--arch dla_34] [--size 512]
     [--batch 8] [--train] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def classify(name: str) -> str:
    n = name.lower()
    if "convolution" in n or "conv" in n:
        return "conv"
    if "dot" in n or "einsum" in n or "matmul" in n:
        return "dot"
    if "dynamic-update-slice" in n or "dynamic_update" in n:
        return "dus"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "reduce" in n:
        return "reduce"
    if "scatter" in n:
        return "scatter"
    if "gather" in n:
        return "gather"
    if "fusion" in n or "loop" in n:
        return "elementwise-fusion"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="dla_34")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--hlo-map", action="store_true",
                    help="also dump compiled HLO and attribute device time "
                    "per model-module path (joins trace fusion names with "
                    "HLO metadata op_name)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/centernet_tpu_jax_cache_bench"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from centernet_tpu import CenterNetDetection
    from centernet_tpu.ops.decode import ctdet_decode

    task = CenterNetDetection(args.arch, dtype=jnp.bfloat16)
    variables = task.init_variables(
        jax.random.PRNGKey(0), (args.size, args.size)
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.random((args.batch, args.size, args.size, 3), np.float32)
    )

    if args.train:
        from centernet_tpu.parallel.trainer import TrainState, make_train_step

        tx = task.configure_optimizer(1)
        state = TrainState.create(variables, tx)
        step = jax.jit(make_train_step(task, tx))
        n = 128
        boxes = np.zeros((args.batch, n, 4), np.float32)
        boxes[:, :8] = rng.uniform(10, 200, (args.batch, 8, 4))
        target = {
            "boxes": jnp.asarray(boxes),
            "classes": jnp.asarray(
                rng.integers(0, 80, (args.batch, n)).astype(np.int32)
            ),
            "keypoints_raw": jnp.zeros((args.batch, n, 17, 3), jnp.float32),
            "valid": jnp.asarray((np.arange(n) < 8)[None].repeat(args.batch, 0)),
        }

        def run():
            st, stats = step(state, (images, target))
            np.asarray(stats["loss"])
    else:
        @jax.jit
        def fwd(variables, images):
            out = task.model.apply(variables, images, False)[-1]
            return ctdet_decode(
                jax.nn.sigmoid(out["heatmap"]),
                out["width_height"],
                out["regression"],
                k=100,
            )

        def run():
            np.asarray(fwd(variables, images)[0, 0, 0])

    run()  # compile + warm
    tdir = tempfile.mkdtemp(prefix="centernet_prof_")
    with jax.profiler.trace(tdir):
        run()

    paths = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace produced", file=sys.stderr)
        sys.exit(1)
    d = json.load(gzip.open(sorted(paths)[-1]))
    evs = d.get("traceEvents", [])
    # find the device pid(s)
    dev_pids = {
        e["pid"] for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    xevs = [
        e for e in evs
        if e.get("ph") == "X" and e.get("pid") in dev_pids
    ]
    total = sum(e.get("dur", 0.0) for e in xevs)
    per_name = collections.Counter()
    per_bucket = collections.Counter()
    calls = collections.Counter()
    for e in xevs:
        name = e.get("name", "?")
        # jit_<fn> umbrella events double-count their children; skip them
        if re.match(r"^jit_", name) or name.startswith("Pjit"):
            total -= e.get("dur", 0.0)
            continue
        per_name[name] += e.get("dur", 0.0)
        per_bucket[classify(name)] += e.get("dur", 0.0)
        calls[name] += 1

    b = args.batch
    print(f"\ndevice total: {total/1e3:.3f} ms ({total/1e3/b:.3f} ms/img) "
          f"over {len(xevs)} events\n")
    print("=== by bucket ===")
    for k, v in per_bucket.most_common():
        print(f"{v/1e3:9.3f} ms  {100*v/max(total,1):5.1f}%  {k}")
    print(f"\n=== top {args.top} fusions ===")
    for k, v in per_name.most_common(args.top):
        print(f"{v/1e3:9.3f} ms  x{calls[k]:<4d} {k[:100]}")

    if args.hlo_map:
        if args.train:
            txt = step.lower(state, (images, target)).compile().as_text()
        else:
            txt = jax.jit(fwd).lower(variables, images).compile().as_text()
        # map every HLO instruction name -> metadata op_name
        meta = {}
        for m in re.finditer(
            r"%([\w.\-]+) = .*?metadata=\{op_name=\"([^\"]*)\"", txt
        ):
            meta[m.group(1)] = m.group(2)

        def module_of(op_name: str) -> str:
            # "jit(fwd)/CenterNetModel/backbone/dla_up/ida_2/proj_1/..." ->
            # "backbone/dla_up/ida_2/proj_1"
            parts = op_name.split("/")
            parts = [p for p in parts if not p.startswith("jit(")]
            if parts and parts[0].startswith("CenterNet"):
                parts = parts[1:]
            # trim below the DCN/conv module level
            keep = []
            for p in parts:
                keep.append(p)
                if p in ("conv", "conv_offset_mask") or len(keep) >= 4:
                    break
            return "/".join(keep) or op_name[:60]

        per_mod = collections.Counter()
        unmapped = 0.0
        for name, dur in per_name.items():
            op = meta.get(name) or meta.get(name.split(" ")[0], "")
            if op:
                per_mod[module_of(op)] += dur
            else:
                per_mod[f"<unmapped:{name[:40]}>"] += dur
                unmapped += dur
        print(f"\n=== by module (HLO metadata join; "
              f"{100*unmapped/max(total,1):.1f}% unmapped) ===")
        for k, v in per_mod.most_common(args.top):
            print(f"{v/1e3:9.3f} ms  {100*v/max(total,1):5.1f}%  {k}")


if __name__ == "__main__":
    main()
