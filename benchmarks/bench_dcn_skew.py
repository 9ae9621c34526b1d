"""Quantify the stencil/banded (clamped-offset) vs exact-gather DCN skew
(VERDICT round-1 item 8).

Protocol: briefly train dla_34 on the fake-COCO fixture so the offset convs
learn non-zero offsets, then on identical inputs compare, per DCN
implementation and radius, (a) the distribution of learned offsets against
the clamp radius and (b) the decoded detections (box/score deltas) against
the exact unbounded gather path.

Run on TPU: python benchmarks/bench_dcn_skew.py [--steps 150] [--size 128]
Numbers land in BENCHMARKS.md ("DCN clamp skew").
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from centernet_tpu import CenterNetDetection
    from centernet_tpu.data import (
        CategoryIdToClass,
        ComposeSample,
        ImageAugmentation,
        Identity,
        Normalize,
        PaddedAnnotationSample,
    )
    from centernet_tpu.data.loader import DataLoader
    from centernet_tpu.parallel.mesh import make_mesh
    from centernet_tpu.parallel.trainer import Trainer
    from tests.utilities import CocoFakeDataset

    size = args.size
    task = CenterNetDetection("dla_34", learning_rate=5e-4, dtype=jnp.bfloat16)
    pipe = ComposeSample(
        [
            ImageAugmentation(Identity(), Normalize(task.mean, task.std)),
            CategoryIdToClass(task.valid_ids),
            PaddedAnnotationSample(),
        ]
    )
    ds = CocoFakeDataset(transforms=pipe, length=args.batch, size=size)
    loader = DataLoader(ds, batch_size=args.batch, num_workers=0,
                        shuffle=False)

    os.environ["CENTERNET_TPU_DCN_IMPL"] = "banded"
    trainer = Trainer(
        task, mesh=make_mesh(n_data=1), max_epochs=args.steps,
        limit_train_batches=1, log_every_n_steps=50,
    )
    trainer.init_state(input_hw=(size, size))
    state = trainer.fit(loader)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # ---- offset distribution: forward once, capture offset-conv outputs ---
    img = next(iter(loader))[0][:1]
    img_j = jnp.asarray(img)

    _, inter = task.model.apply(
        variables, img_j, False, capture_intermediates=True
    )
    offs_list = []
    offs_by_scale = {}

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "conv_offset_mask":
                    out = v["__call__"][0]
                    kk9 = out.shape[-1] // 3
                    arr = np.asarray(out[..., : 2 * kk9], np.float32).ravel()
                    offs_list.append(arr)
                    offs_by_scale.setdefault(out.shape[1], []).append(arr)
                else:
                    walk(v)

    walk(inter["intermediates"])
    offs = np.concatenate(offs_list)
    qs = np.percentile(np.abs(offs), [50, 90, 99, 99.9, 100])
    print(f"offsets after {args.steps} steps: |off| p50={qs[0]:.4f} "
          f"p90={qs[1]:.4f} p99={qs[2]:.4f} p99.9={qs[3]:.4f} "
          f"max={qs[4]:.4f} px")
    for r in (1, 2, 3, 4):
        frac = float((np.abs(offs) > r).mean())
        print(f"  fraction |off| > {r}: {frac:.6f}")
    # per-map-size: fine maps run 60% of DCN wall time; a smaller clamp
    # there is only safe if their offsets are small IN CELLS
    for hsz in sorted(offs_by_scale, reverse=True):
        a = np.abs(np.concatenate(offs_by_scale[hsz]))
        q = np.percentile(a, [50, 99, 100])
        print(f"  map {hsz}px: p50={q[0]:.3f} p99={q[1]:.3f} "
              f"max={q[2]:.3f} cells, frac>2: {(a > 2).mean():.5f}")

    # ---- decode deltas vs exact gather -------------------------------------
    from centernet_tpu.ops.decode import ctdet_decode
    from centernet_tpu.ops.losses import sigmoid_clamped

    def decode_with(impl, radius, fine=None):
        os.environ["CENTERNET_TPU_DCN_IMPL"] = impl
        os.environ["CENTERNET_TPU_DCN_RADIUS"] = str(radius)
        if fine is None:
            os.environ.pop("CENTERNET_TPU_DCN_RADIUS_FINE", None)
        else:
            os.environ["CENTERNET_TPU_DCN_RADIUS_FINE"] = str(fine)

        # fresh function object per call -> fresh trace, so the env-selected
        # impl is baked into its own compiled graph
        @jax.jit
        def run(v, im):
            o = task.model.apply(v, im, False)[-1]
            hm = sigmoid_clamped(o["heatmap"].astype(jnp.float32))
            wh = o["width_height"].astype(jnp.float32)
            rg = o["regression"].astype(jnp.float32)
            return ctdet_decode(hm, wh, rg, k=100), {
                "heatmap": hm, "width_height": wh, "regression": rg,
            }

        dets, o = run(variables, img_j)
        return np.asarray(dets[0], np.float32), {
            k: np.asarray(v, np.float32) for k, v in o.items()
        }

    ref, ref_maps = decode_with("gather", 4)
    topk = min(20, ref.shape[0])
    print(f"comparing top-{topk} decoded detections + raw output maps "
          f"(ref = exact gather); ref top score {ref[0, 4]:.4f}")
    for impl, r, fine in (("banded", 4, None), ("stencil", 4, None),
                          ("banded", 2, None), ("stencil", 2, None),
                          ("banded", 1, None), ("banded", 4, 2),
                          ("banded", 4, 1)):
        d, maps = decode_with(impl, r, fine)
        tag = f"{impl} r={r}" + (f" fine={fine}" if fine else "")
        # raw-map deltas (decode-input level)
        map_d = {
            k: float(np.abs(maps[k] - ref_maps[k]).max()) for k in maps
        }
        # rank-free: match each ref top-k det to the nearest center in d
        rc = (ref[:topk, :2] + ref[:topk, 2:4]) / 2.0
        dc = (d[:, :2] + d[:, 2:4]) / 2.0
        dist = np.linalg.norm(rc[:, None] - dc[None], axis=-1)
        j = dist.argmin(axis=1)
        box_delta = np.abs(d[j, :4] - ref[:topk, :4])
        score_delta = np.abs(d[j, 4] - ref[:topk, 4])
        print(f"{tag}: box max {box_delta.max():.4f} px mean "
              f"{box_delta.mean():.5f} | score max {score_delta.max():.5f} "
              f"| map deltas {map_d}")


if __name__ == "__main__":
    main()
