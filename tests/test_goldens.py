"""Golden regression tests: encoder and decoder outputs captured once (CPU,
f32) and pinned — catches silent numerics drift across refactors. Regenerate
deliberately with the snippet in the goldens' git history if semantics are
meant to change."""

import json
import os

import numpy as np
import jax.numpy as jnp

from centernet_tpu.data.sample import (
    encode_detection,
    encode_multi_pose,
    pad_annotations,
)
from centernet_tpu.ops.decode import ctdet_decode, multi_pose_decode

DATA = os.path.join(os.path.dirname(__file__), "data")


def _load():
    with np.load(os.path.join(DATA, "goldens.npz")) as z:
        return dict(z)


def _anns():
    with open(os.path.join(DATA, "coco_annotation.json")) as f:
        anns = json.load(f)
    for a in anns:
        a["class_id"] = 0
    return anns


def test_encoder_goldens():
    g = _load()
    boxes, classes, kps, valid = pad_annotations(_anns(), 128)
    det = encode_detection(boxes, classes, valid, (512, 512), 80)
    for k, v in det.items():
        np.testing.assert_allclose(
            np.asarray(v), g[f"det_{k}"], rtol=1e-5, atol=1e-6, err_msg=k
        )
    pose = encode_multi_pose(boxes, kps, valid, (512, 512))
    for k, v in pose.items():
        np.testing.assert_allclose(
            np.asarray(v), g[f"pose_{k}"], rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_decode_goldens():
    g = _load()
    dec = np.asarray(
        ctdet_decode(
            jnp.asarray(g["dec_inputs_heat"]),
            g["dec_inputs_wh"],
            g["dec_inputs_reg"],
            k=20,
        )
    )
    np.testing.assert_allclose(dec, g["dec_out"], rtol=1e-5, atol=1e-5)

    pdec = np.asarray(
        multi_pose_decode(
            jnp.asarray(g["pdec_hm"]),
            g["dec_inputs_wh"],
            g["pdec_kps"],
            reg=g["dec_inputs_reg"],
            hm_hp=g["pdec_hmhp"],
            hp_offset=g["pdec_hpo"],
            k=10,
        )
    )
    np.testing.assert_allclose(pdec, g["pdec_out"], rtol=1e-5, atol=1e-5)
