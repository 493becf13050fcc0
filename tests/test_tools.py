"""L5 toolchain tests: config system, quantization, engine artifacts."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------- config ----------------

def test_config_fromfile_and_inheritance(tmp_path):
    from adas_tpu.utils.config import Config

    base = tmp_path / "base.py"
    base.write_text("lr = 0.1\nmodel = dict(depth=18, width=1.0)\n")
    child = tmp_path / "child.py"
    child.write_text(
        "_base_ = './base.py'\nmodel = dict(depth=34)\nepochs = 5\n"
    )
    cfg = Config.fromfile(str(child))
    assert cfg.lr == 0.1
    assert cfg.model.depth == 34      # overridden
    assert cfg.model.width == 1.0     # inherited
    assert cfg.epochs == 5


def test_config_delete_key(tmp_path):
    from adas_tpu.utils.config import Config

    (tmp_path / "base.py").write_text("opt = dict(name='sgd', momentum=0.9)\n")
    (tmp_path / "child.py").write_text(
        "_base_ = './base.py'\nopt = dict(_delete_=True, name='adam')\n"
    )
    cfg = Config.fromfile(str(tmp_path / "child.py"))
    assert cfg.opt.name == "adam"
    assert "momentum" not in cfg.opt


def test_config_merge_from_dict_and_dictaction():
    import argparse

    from adas_tpu.utils.config import Config, DictAction

    cfg = Config({"model": {"depth": 18}, "lr": 0.1})
    cfg.merge_from_dict({"model.depth": 50, "new_key": True})
    assert cfg.model.depth == 50 and cfg.new_key is True

    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg-options", nargs="+", action=DictAction)
    ns = ap.parse_args(["--cfg-options", "a.b=3", "c=hello", "d=[1,2]"])
    assert ns.cfg_options == {"a.b": 3, "c": "hello", "d": [1, 2]}


def test_shipped_ufldv2_configs_load():
    from adas_tpu.utils.config import Config

    root = os.path.join(
        os.path.dirname(__file__), "..", "adas_tpu", "configs", "ufldv2"
    )
    cfg = Config.fromfile(os.path.join(root, "culane_res34.py"))
    assert cfg.backbone == "34"
    assert cfg.num_cell_row == 200 and cfg.crop_ratio == 0.6
    assert cfg.learning_rate == 0.05  # from base
    cfg_t = Config.fromfile(os.path.join(root, "tusimple_res18.py"))
    assert cfg_t.fc_norm is False and cfg_t.train_width == 800


# ---------------- quantize ----------------

def _toy_variables(rng):
    return {
        "params": {
            "dense": {
                "kernel": rng.normal(size=(64, 32)).astype(np.float32),
                "bias": rng.normal(size=(32,)).astype(np.float32),
            }
        }
    }


def test_cast_params_fp16_bf16(rng):
    from adas_tpu.tools.quantize import cast_params

    v = _toy_variables(rng)
    fp16 = cast_params(v, "fp16")
    assert fp16["params"]["dense"]["kernel"].dtype == np.float16
    bf16 = cast_params(v, "bf16")
    assert str(bf16["params"]["dense"]["kernel"].dtype) == "bfloat16"


def test_int8_roundtrip_error_small(rng):
    from adas_tpu.tools.quantize import dequantize_int8, quantize_int8

    v = _toy_variables(rng)
    q, scales = quantize_int8(v, min_size=128)
    assert q["params::dense::kernel"].dtype == np.int8
    assert q["params::dense::bias"].dtype == np.float32  # too small, kept
    back = dequantize_int8(q, scales)
    k0 = v["params"]["dense"]["kernel"]
    k1 = back["params"]["dense"]["kernel"]
    # per-channel symmetric int8: max error bounded by scale/2 ≈ absmax/254
    err = np.abs(k0 - k1).max()
    assert err <= np.abs(k0).max() / 127
    assert np.corrcoef(k0.ravel(), k1.ravel())[0, 1] > 0.999


def test_int8_save_load(tmp_path, rng):
    from adas_tpu.tools.quantize import load_int8, save_int8

    v = _toy_variables(rng)
    path = str(tmp_path / "w_int8.npz")
    save_int8(path, v)
    back = load_int8(path)
    assert back["params"]["dense"]["kernel"].shape == (64, 32)


# ---------------- engine artifact ----------------

def test_artifact_roundtrip(tmp_path):
    import flax.linen as nn

    from adas_tpu.engine.artifact import CompiledEngine, build_artifact

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(8, (3, 3), name="c")(x)
            return nn.relu(h)

    net = Tiny()
    x = jnp.ones((1, 16, 16, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    path = str(tmp_path / "tiny.adas")
    meta = build_artifact(
        lambda v, t: net.apply(v, t), variables, (1, 3, 16, 16), path,
        platforms=["cpu"], meta={"model": "tiny"},
    )
    assert meta["output_shapes"] == [[1, 16, 16, 8]]

    eng = CompiledEngine(path)
    assert list(eng.get_engine_input_shape()) == [1, 3, 16, 16]
    nchw = np.random.default_rng(0).normal(size=(1, 3, 16, 16)).astype(
        np.float32
    )
    outs = eng.engine_inference(nchw)
    ref = net.apply(variables, jnp.asarray(np.transpose(nchw, (0, 2, 3, 1))))
    np.testing.assert_allclose(outs[0], np.asarray(ref), rtol=1e-6)


@pytest.mark.slow
def test_yolo_detector_loads_adas_artifact(tmp_path):
    from adas_tpu.engine.artifact import build_artifact
    from adas_tpu.models.yolo import YoloSpec, build_yolo
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.utils.types import ObjectModelType

    spec = YoloSpec(family="v8", scale="n", num_classes=80,
                    input_size=(160, 160))
    net = build_yolo(spec)
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3))
    )
    path = str(tmp_path / "y8n.adas")
    build_artifact(
        lambda v, t: net.apply(v, t), variables, (1, 3, 160, 160), path,
        platforms=["cpu"],
    )
    det = YoloDetector(
        model_path=path, model_type=ObjectModelType.YOLOV8,
        input_size=(160, 160), box_score=0.2,
    )
    frame = np.random.default_rng(0).integers(
        0, 255, (120, 160, 3), dtype=np.uint8
    )
    det.DetectFrame(frame)
    assert isinstance(det.object_info, list)


@pytest.mark.slow
def test_detector_loads_int8_weights(tmp_path):
    import jax

    from adas_tpu.models.yolo import YoloSpec, build_yolo
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.tools.quantize import save_int8
    from adas_tpu.utils.types import ObjectModelType

    spec = YoloSpec(family="v8", scale="n", num_classes=80,
                    input_size=(96, 96))
    net = build_yolo(spec)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    path = str(tmp_path / "w_int8.npz")
    save_int8(path, jax.device_get(variables))

    det = YoloDetector(
        model_path=path, model_type=ObjectModelType.YOLOV8,
        input_size=(96, 96), box_score=0.2,
    )
    frame = np.random.default_rng(0).integers(
        0, 255, (72, 96, 3), dtype=np.uint8
    )
    det.DetectFrame(frame)
    assert isinstance(det.object_info, list)
