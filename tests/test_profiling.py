"""Observability utilities: FPS window, stage timers, trace hooks."""
import time

from adas_tpu.utils.profiling import FPSCounter, StageTimers, device_trace


def test_fps_counter_window():
    c = FPSCounter(window=5)
    for _ in range(4):
        assert c.tick() == 0.0  # not yet a full window
    fps = c.tick()
    assert fps > 0


def test_stage_timers_summary():
    t = StageTimers()
    for _ in range(3):
        with t.stage("fast"):
            pass
        with t.stage("slow"):
            time.sleep(0.01)
    s = t.summary()
    assert s["fast"]["n"] == 3 and s["slow"]["n"] == 3
    assert s["slow"]["p50_ms"] > s["fast"]["p50_ms"]
    assert t.last("slow") >= 0.01


def test_device_trace_noop():
    with device_trace(None):  # hook left in place, disabled
        pass


def test_device_trace_writes(tmp_path):
    import jax.numpy as jnp

    with device_trace(str(tmp_path)):
        (jnp.ones(8) * 2).block_until_ready()
    assert any(tmp_path.iterdir())
