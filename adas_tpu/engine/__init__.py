"""L0 engine layer: executor protocol, XLA engines, serialized artifacts,
model registry, persistent compile cache."""
from .base import EngineBase
from .xla_engine import FakeEngine, XLAEngine, enable_persistent_cache

__all__ = [
    "EngineBase",
    "XLAEngine",
    "FakeEngine",
    "enable_persistent_cache",
    "CompiledEngine",
    "build_artifact",
    "registry",
]


def __getattr__(name):
    # artifact/registry import jax.export lazily to keep `import adas_tpu`
    # light
    if name in ("CompiledEngine", "build_artifact"):
        from . import artifact

        return getattr(artifact, name)
    if name == "registry":
        from . import registry

        return registry
    raise AttributeError(name)
