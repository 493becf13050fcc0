"""Explicit backend drain for process teardown (VERDICT r4 #7).

The recurring CPU-collective teardown family (sporadic faulthandler
dump / SIGABRT at interpreter exit after mesh-sharded runs, round 1-4)
is PJRT client destructor order racing (a) dispatches still in flight
and (b) live sharded arrays referenced from module globals and jit
caches.  ``drain_backend()`` makes the quiesce explicit instead of
relying on sync-dispatch side effects: barrier on pending effects,
block on EVERY live jax.Array the process still holds, then drop the
executable caches so buffer destructors run while the runtime is fully
alive.  Registered in tests/conftest.py sessionfinish and at the end of
``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

import gc


def drain_backend() -> int:
    """Quiesce JAX before interpreter exit; returns #arrays blocked on."""
    import jax

    try:
        jax.effects_barrier()
    except Exception:
        pass
    # Block on every live array: an async-dispatched computation whose
    # output nobody awaited (a dropped collective result, a donated
    # buffer) is exactly the teardown race — make its completion a
    # precondition of exiting.
    blocked = 0
    for obj in gc.get_objects():
        if isinstance(obj, jax.Array):
            try:
                obj.block_until_ready()
                blocked += 1
            except Exception:
                # deleted/donated buffers raise; they hold no pending work
                pass
    try:
        jax.clear_caches()
    except Exception:
        pass
    gc.collect()
    return blocked
