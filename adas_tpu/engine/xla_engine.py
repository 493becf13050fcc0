"""XLA engine: jit/AOT-compiled JAX model graphs as inference engines.

The TPU-native replacement for the reference's TensorRT/ONNXRuntime
executors (coreEngine.py:41-186).  The "engine artifact" is a jitted (or
ahead-of-time compiled) XLA executable plus a weight pytree; a persistent
compilation cache directory plays the role of the serialized ``.trt`` file
(SURVEY.md §3.5).
"""
from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import EngineBase


def enable_persistent_cache(path: str = "~/.cache/adas_tpu_xla") -> str:
    """Point XLA's persistent compilation cache at ``path`` so model
    compiles survive process restarts (the ``.trt``-artifact equivalent)."""
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path


class XLAEngine(EngineBase):
    """Wraps ``apply_fn(variables, nhwc_batch) -> output(s)`` as an engine.

    ``engine_inference`` accepts the reference's NCHW blob layout and
    transposes at the boundary; internal pipelines should instead call
    ``run_device`` with NHWC device arrays to stay in HBM.
    """

    framework_type = "xla"

    def __init__(
        self,
        apply_fn: Callable,
        variables,
        input_shape_nchw: Sequence[int],
        output_names: Sequence[str],
        dtype=np.float32,
        aot: bool = False,
    ):
        self._apply = jax.jit(apply_fn)
        self.variables = variables
        self._input_shape = tuple(input_shape_nchw)
        self._output_names = list(output_names)
        self._dtype = dtype
        self.providers = jax.devices()[0].platform
        self._output_shapes: Optional[List[Tuple[int, ...]]] = None
        if aot:
            n, c, h, w = self._input_shape
            dummy = jax.ShapeDtypeStruct((n, h, w, c), jnp.dtype(dtype))
            self._apply = (
                jax.jit(apply_fn).lower(self.variables, dummy).compile()
            )
            self._trace_output_shapes()

    def _trace_output_shapes(self) -> None:
        n, c, h, w = self._input_shape
        x = jnp.zeros((n, h, w, c), self._dtype)
        outs = self._apply(self.variables, x)
        outs = self._as_list(outs)
        self._output_shapes = [tuple(np.asarray(o).shape) for o in outs]

    def _as_list(self, outs) -> List:
        if isinstance(outs, dict):
            return [outs[name] for name in self._output_names]
        if isinstance(outs, (list, tuple)):
            return list(outs)
        return [outs]

    def get_engine_input_shape(self) -> Sequence[int]:
        return self._input_shape

    def get_engine_output_shape(self):
        if self._output_shapes is None:
            self._trace_output_shapes()
        return self._output_shapes, list(self._output_names)

    @property
    def engine_dtype(self):
        return self._dtype

    def engine_inference(self, input_tensor: np.ndarray) -> List[np.ndarray]:
        x = jnp.asarray(np.transpose(input_tensor, (0, 2, 3, 1)), self._dtype)
        outs = self._as_list(self._apply(self.variables, x))
        return [np.asarray(o) for o in outs]

    def run_device(self, nhwc_batch: jnp.ndarray):
        """Device-to-device execution path (no host copies)."""
        return self._apply(self.variables, nhwc_batch)


class FakeEngine(EngineBase):
    """Canned-tensor engine for tests (the mock seam the reference's ABC
    implies, SURVEY.md §4)."""

    framework_type = "fake"

    def __init__(self, input_shape_nchw, outputs: dict):
        self._input_shape = tuple(input_shape_nchw)
        self._outputs = outputs
        self.calls: List[np.ndarray] = []

    def get_engine_input_shape(self):
        return self._input_shape

    def get_engine_output_shape(self):
        return (
            [tuple(np.asarray(v).shape) for v in self._outputs.values()],
            list(self._outputs.keys()),
        )

    def engine_inference(self, input_tensor):
        self.calls.append(np.asarray(input_tensor))
        return [np.asarray(v) for v in self._outputs.values()]
