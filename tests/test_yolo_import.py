"""Ultralytics-layout YOLO checkpoint mapping tests.

No real ultralytics checkpoints ship in this environment, so validation
is structural: the mapping must (a) cover the full flax parameter tree of
the native graph — every leaf written exactly once with the right shape —
and (b) round-trip values exactly.  The synthetic state dict is generated
from the mapping's own source-key list with shapes taken from the flax
tree (inverse transforms applied), which pins the module-index layout
against models/yolo.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adas_tpu.models.yolo import YoloSpec, build_yolo
from adas_tpu.tools.yolo_import import (
    yolo_variables,
    yolov5_mapping,
    yolov6_mapping,
    yolov7_mapping,
    yolov8_mapping,
    yolov9_mapping,
    yolov10_mapping,
    yolov5lite_mapping,
)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _inverse_transform(dst_path, value):
    """Undo the flax-side layout to synthesize a torch-shaped tensor."""
    if dst_path[-1] == "kernel":
        # HWIO -> OIHW; also covers upsample_transpose, whose
        # transpose_kernel=True layout (kh,kw,out,in) inverts to torch
        # ConvTranspose2d (in,out,kh,kw) with the same permutation
        if value.ndim == 4:
            return np.transpose(value, (3, 2, 0, 1))
        return value.T
    if dst_path[-1].endswith("_implicit"):  # (1,1,1,C) -> (1,C,1,1)
        return np.transpose(value, (0, 3, 1, 2))
    return value


@pytest.mark.parametrize(
    "family,scale",
    [
        ("v8", "n"), ("v5", "n"), ("v10", "n"), pytest.param("v10", "s", marks=pytest.mark.slow),
        # big scales compile for minutes on the CPU test backend: slow
        # tier only (the n/s scales keep the mapping machinery covered)
        pytest.param("v10", "m", marks=pytest.mark.slow),
        pytest.param("v10", "x", marks=pytest.mark.slow),
        pytest.param("v6", "n", marks=pytest.mark.slow),
        pytest.param("v6", "s", marks=pytest.mark.slow),
        pytest.param("v6", "m", marks=pytest.mark.slow),
        pytest.param("v6", "l", marks=pytest.mark.slow),
        pytest.param("v7", "l", marks=pytest.mark.slow), pytest.param("v9", "c", marks=pytest.mark.slow),
        pytest.param("v5lite", "e", marks=pytest.mark.slow), pytest.param("v5lite", "s", marks=pytest.mark.slow),
        # g round-trips the deploy-form (.fused.*) keys directly; the
        # train-form fusion itself is proven in test_detect_parity
        pytest.param("v5lite", "g", marks=pytest.mark.slow),
    ],
)
def test_mapping_covers_full_tree_and_roundtrips(family, scale):
    spec = YoloSpec(
        family=family, scale=scale, num_classes=80, input_size=(64, 64)
    )
    net = build_yolo(spec)
    if family == "v10":
        ref = net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            method=net.both,
        )
    else:
        ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    mapping = {
        "v8": yolov8_mapping, "v5": yolov5_mapping, "v10": yolov10_mapping,
        "v6": yolov6_mapping, "v7": yolov7_mapping, "v9": yolov9_mapping,
        "v5lite": yolov5lite_mapping,
    }[family](spec)
    flat_ref = {
        coll: _flatten(ref[coll]) for coll in ("params", "batch_stats")
    }

    # destination coverage: every mapping target exists in the real tree,
    # and every real leaf is targeted exactly once
    targets = {}
    for src, coll, dst, _ in mapping:
        assert dst in flat_ref[coll], f"mapping target missing: {coll}/{dst}"
        assert (coll, dst) not in targets, f"duplicate target {dst}"
        targets[(coll, dst)] = src
    for coll in ("params", "batch_stats"):
        for leaf in flat_ref[coll]:
            assert (coll, leaf) in targets, f"unmapped flax leaf {coll}/{leaf}"

    # synthesize a torch-style state dict with the reference values
    rng = np.random.default_rng(0)
    state = {}
    for src, coll, dst, _ in mapping:
        state[src] = _inverse_transform(dst, flat_ref[coll][dst])
    buffer_key = {
        "v8": "model.22.dfl.conv.weight",
        "v5": "model.24.anchors",
        "v10": "model.23.dfl.conv.weight",
        "v6": "detect.proj",
        "v7": "model.105.anchors",
        "v9": "model.22.dfl.conv.weight",
        "v5lite": "model.21.anchors",
    }[family]
    state[buffer_key] = rng.normal(size=(3,)).astype(np.float32)
    # skipped buffers must be tolerated

    got = yolo_variables(state, spec)
    flat_got = {
        coll: _flatten(got[coll]) for coll in ("params", "batch_stats")
    }
    for coll in ("params", "batch_stats"):
        assert set(flat_got[coll]) == set(flat_ref[coll])
        for k in flat_ref[coll]:
            np.testing.assert_array_equal(flat_got[coll][k], flat_ref[coll][k])

    # and the imported tree actually runs
    out = net.apply(got, jnp.zeros((1, 64, 64, 3)))
    ref_out = net.apply(ref, jnp.zeros((1, 64, 64, 3)))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=1e-6
    )


def test_missing_tensor_raises():
    spec = YoloSpec(family="v8", scale="n", num_classes=80, input_size=(64, 64))
    with pytest.raises(KeyError):
        yolo_variables({}, spec)
