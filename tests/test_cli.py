"""CLI smoke tests: the L5 toolchain entry points run end-to-end."""
import sys

import numpy as np
import pytest


def _run_main(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    module.main()


@pytest.mark.slow
def test_build_engine_cli(tmp_path, monkeypatch, capsys):
    from adas_tpu.tools import build_engine

    out = str(tmp_path / "y8.adas")
    _run_main(
        build_engine,
        ["-t", "YOLOV8", "--scale", "n", "--height", "64", "--width", "64",
         "-o", out, "--platforms", "cpu"],
        monkeypatch,
    )
    printed = capsys.readouterr().out
    assert "input  [1, 3, 64, 64]" in printed

    from adas_tpu.engine.artifact import CompiledEngine

    eng = CompiledEngine(out)
    outs = eng.engine_inference(
        np.zeros((1, 3, 64, 64), dtype=np.float32)
    )
    assert outs[0].shape[0] == 1


def test_quantize_cli_roundtrip(tmp_path, monkeypatch):
    from adas_tpu.tools import quantize
    from adas_tpu.tools.params_io import load_params, save_params

    src = str(tmp_path / "w.npz")
    save_params(src, {
        "params": {"d": {"kernel": np.ones((32, 64), np.float32)}}
    })
    _run_main(quantize, ["-i", src, "--mode", "fp16"], monkeypatch)
    fp16 = load_params(str(tmp_path / "w_fp16.npz"))
    assert fp16["params"]["d"]["kernel"].dtype == np.float16

    _run_main(quantize, ["-i", src, "--mode", "int8"], monkeypatch)
    from adas_tpu.tools.quantize import load_int8

    back = load_int8(str(tmp_path / "w_int8.npz"))
    np.testing.assert_allclose(
        back["params"]["d"]["kernel"], np.ones((32, 64)), atol=1e-2
    )


def test_torch_import_cli(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(tmp_path.parent))

    from tests.torch_nets import TorchUFLDv2
    from adas_tpu.tools import torch_import

    net = TorchUFLDv2(
        input_h=64, input_w=128, dims=(16 * 8 * 4, 16 * 8 * 4, 2 * 8 * 4,
                                       2 * 8 * 4), fc_norm=True,
    )
    pth = str(tmp_path / "lane.pth")
    torch.save(net.state_dict(), pth)
    out = str(tmp_path / "lane.npz")
    _run_main(
        torch_import, ["-i", pth, "-o", out, "--arch", "ufldv2"], monkeypatch
    )
    from adas_tpu.tools.params_io import load_params

    variables = load_params(out)
    assert "cls_fc1" in variables["params"]


@pytest.mark.slow
def test_quantize_cli_calibrate(tmp_path, monkeypatch):
    """--calibrate MODEL bakes static act_scales into the int8 store."""
    import jax
    import jax.numpy as jnp

    from adas_tpu.engine.registry import build
    from adas_tpu.tools import quantize
    from adas_tpu.tools.params_io import save_params
    from adas_tpu.tools.quantize import load_int8

    entry = build("YOLOV8", scale="n", height=64, width=64)
    variables = entry.net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    src = str(tmp_path / "y8.npz")
    save_params(src, variables)
    _run_main(
        quantize,
        ["-i", src, "--mode", "int8", "--calibrate", "YOLOV8",
         "--scale", "n", "--calib-frames", "1"],
        monkeypatch,
    )
    back = load_int8(str(tmp_path / "y8_int8.npz"))
    assert "act_scales" in back
    leaves = jax.tree_util.tree_leaves(back["act_scales"])
    assert leaves and all(float(v) > 0 for v in leaves)


@pytest.mark.slow
def test_build_engine_cli_multistream(tmp_path, monkeypatch, capsys):
    """--multistream N exports the whole pipeline as one engine and the
    artifact serves through MultiStreamADAS(step_artifact=...)."""
    from adas_tpu.tools import build_engine

    out = str(tmp_path / "pipe.adas")
    _run_main(
        build_engine,
        ["-t", "YOLOV8", "--scale", "n", "--height", "160",
         "--width", "160", "-o", out, "--platforms", "cpu",
         "--multistream", "2", "--lane-type", "UFLDV2_TUSIMPLE",
         "--frame-height", "180", "--frame-width", "320",
         "--downscale", "88", "160"],
        monkeypatch,
    )
    printed = capsys.readouterr().out
    assert "multistream pipeline engine" in printed
    assert "(2 streams, i420)" in printed

    from adas_tpu.engine.artifact import CompiledEngine

    eng = CompiledEngine(out)
    assert eng.meta["kind"] == "multistream"
    assert tuple(eng.meta["frame_shape"]) == (2, 132, 160)  # 88*3/2 rows
