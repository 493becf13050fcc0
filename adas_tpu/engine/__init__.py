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
    # light.  importlib, not `from . import x`: the from-import form calls
    # hasattr(package, x) first, which re-enters this __getattr__ and
    # recurses forever.
    import importlib

    if name in ("CompiledEngine", "build_artifact"):
        artifact = importlib.import_module(".artifact", __name__)
        return getattr(artifact, name)
    if name == "registry":
        return importlib.import_module(".registry", __name__)
    raise AttributeError(name)
