import numpy as np
import jax.numpy as jnp
import pytest

from adas_tpu.engine.base import EngineBase
from adas_tpu.engine.xla_engine import FakeEngine, XLAEngine
from adas_tpu.tools.params_io import (
    flatten_variables,
    load_params,
    save_params,
    unflatten_variables,
)


def test_fake_engine_contract():
    eng = FakeEngine(
        (1, 3, 32, 32), {"out_a": np.zeros((1, 8)), "out_b": np.ones((1, 4))}
    )
    assert isinstance(eng, EngineBase)
    assert eng.get_engine_input_shape() == (1, 3, 32, 32)
    shapes, names = eng.get_engine_output_shape()
    assert names == ["out_a", "out_b"]
    outs = eng.engine_inference(np.zeros((1, 3, 32, 32)))
    assert outs[1].sum() == 4
    assert len(eng.calls) == 1


class TestXLAEngine:
    def _make(self, aot=False):
        def apply_fn(variables, x):  # NHWC in
            return {"sum": x.sum(axis=(1, 2)) + variables["b"]}

        return XLAEngine(
            apply_fn, {"b": jnp.asarray([1.0])}, (1, 3, 4, 4), ["sum"], aot=aot
        )

    def test_inference_transposes_nchw(self):
        eng = self._make()
        x = np.arange(48, dtype=np.float32).reshape(1, 3, 4, 4)
        out = eng.engine_inference(x)[0]
        np.testing.assert_allclose(out[0], x.sum(axis=(2, 3))[0] + 1.0)

    def test_output_shapes(self):
        eng = self._make()
        shapes, names = eng.get_engine_output_shape()
        assert shapes == [(1, 3)] and names == ["sum"]

    def test_aot_compile(self):
        eng = self._make(aot=True)
        out = eng.engine_inference(np.ones((1, 3, 4, 4), np.float32))[0]
        np.testing.assert_allclose(out, np.full((1, 3), 17.0))


class TestParamsIO:
    def test_roundtrip(self, tmp_path, rng):
        variables = {
            "params": {
                "conv": {"kernel": rng.normal(size=(3, 3, 4, 8))},
                "dense": {"bias": np.zeros(5)},
            },
            "batch_stats": {"bn": {"mean": np.ones(8)}},
        }
        path = str(tmp_path / "w.npz")
        save_params(path, variables)
        loaded = load_params(path)
        np.testing.assert_array_equal(
            loaded["params"]["conv"]["kernel"],
            variables["params"]["conv"]["kernel"],
        )
        np.testing.assert_array_equal(
            loaded["batch_stats"]["bn"]["mean"], np.ones(8)
        )

    def test_flatten_unflatten_inverse(self):
        tree = {"a": {"b": np.array([1.0]), "c": {"d": np.array([2.0])}}}
        flat = flatten_variables(tree)
        assert set(flat) == {"a::b", "a::c::d"}
        back = unflatten_variables(flat)
        np.testing.assert_array_equal(back["a"]["c"]["d"], np.array([2.0]))


@pytest.mark.slow
def test_registry_builds_all_names():
    import jax
    import jax.numpy as jnp

    from adas_tpu.engine.registry import available, build

    names = available()
    assert {"YOLOV8", "YOLOV10", "UFLDV2_CULANE", "EFFICIENTDET"} <= set(names)
    entry = build("yolov8", scale="n", height=64, width=64, num_classes=4)
    n, c, h, w = entry.input_shape_nchw
    variables = entry.net.init(
        jax.random.PRNGKey(0), jnp.zeros((n, h, w, c))
    )
    out = entry.net.apply(variables, jnp.zeros((n, h, w, c)))
    assert out.shape[0] == 1

    import pytest

    with pytest.raises(KeyError):
        build("nope")
