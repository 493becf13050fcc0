"""Engine abstraction: the seam between model graphs and their executor.

Mirrors the reference ``EngineBase`` contract (coreEngine.py:7-39) —
``get_engine_input_shape`` / ``get_engine_output_shape`` /
``engine_inference`` — so detector facades are engine-agnostic and tests
can inject fakes.  Concrete engines here execute jit-compiled XLA graphs
instead of TensorRT/ONNXRuntime.
"""
from __future__ import annotations

import abc
from typing import List, Sequence, Tuple

import numpy as np


class EngineBase(abc.ABC):
    """Executor interface: NCHW tensors in, list of numpy tensors out."""

    framework_type: str = "base"
    providers: str = ""

    @abc.abstractmethod
    def get_engine_input_shape(self) -> Sequence[int]:
        """Input shape, NCHW (API parity with the reference engines)."""

    @abc.abstractmethod
    def get_engine_output_shape(self) -> Tuple[List[Sequence[int]], List[str]]:
        """(output shapes, output names)."""

    @abc.abstractmethod
    def engine_inference(self, input_tensor: np.ndarray) -> List[np.ndarray]:
        """Run the graph on one NCHW tensor; returns outputs in name order."""

    @property
    def engine_dtype(self):
        return np.float32
