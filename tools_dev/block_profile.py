"""Profile the int8 lane trunk with the fused block kernel off/on and
diff the per-op self-times — attributes the in-situ delta to kernel
compute vs relayout transposes vs broken fusions.

    timeout 3600 python tools_dev/block_profile.py [xla|blocks]
"""
import glob
import os
import sys

import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

MODE = sys.argv[1] if len(sys.argv) > 1 else "blocks"
if MODE == "xla":
    os.environ["ADAS_PALLAS_BLOCK"] = "0"
else:
    os.environ.pop("ADAS_PALLAS_BLOCK", None)

import jax
import jax.numpy as jnp

from adas_tpu.models import layers as L
from adas_tpu.models.layers import quantized

ITERS = 10


def main():
    from adas_tpu.models.resnet import ResNetFeatures
    from adas_tpu.tools.quantize import (
        calibrate_act_scales,
        pack_int8_weights,
    )

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 320, 1600, 3)),
        jnp.float32,
    )
    net = ResNetFeatures(depth="18")
    v = net.init(jax.random.PRNGKey(0), x[:1])
    v = calibrate_act_scales(
        lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]), v, [x[:1]]
    )
    v = pack_int8_weights(
        lambda vv: net.apply(vv, x[:1], mutable=["wscales"]), v
    )
    v = jax.device_put(v)

    def probe(vv, x0):
        def body(i, s):
            with quantized("int8"):
                out = net.apply(vv, x0 + i.astype(x0.dtype))
            return s + sum(
                jnp.sum(t).astype(jnp.float32)
                for t in jax.tree_util.tree_leaves(out)
            )

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    L.reset_trace_stats()
    p = jax.jit(probe)
    float(p(v, x))
    print("mode", MODE, "stats", L.trace_stats(), flush=True)
    outdir = f"/tmp/block_trace_{MODE}"
    with jax.profiler.trace(outdir):
        float(p(v, x))
    import json

    from xprof.convert import raw_to_tool_data

    xplanes = glob.glob(outdir + "/plugins/profile/*/*.xplane.pb")
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "hlo_stats", {"tqx": "out:json;"}
    )
    text = data.decode() if isinstance(data, bytes) else str(data)
    tbl = json.loads(text)
    cols = [c["label"] for c in tbl["cols"]]
    i_time = cols.index("Total self time (us)")
    i_cat = cols.index("HLO op category")
    i_name = (
        cols.index("HLO op text")
        if "HLO op text" in cols
        else cols.index("HLO op name")
    )
    agg = {}
    tops = []
    for row in tbl["rows"]:
        c = [cell.get("v") if cell else None for cell in row["c"]]
        try:
            t = float(c[i_time])
        except Exception:
            continue
        agg[c[i_cat]] = agg.get(c[i_cat], 0.0) + t
        tops.append((t, str(c[i_cat]), str(c[i_name])[:110]))
    print("== category totals (us, /%d iters) ==" % ITERS)
    for k, t in sorted(agg.items(), key=lambda kv: -kv[1])[:14]:
        print(f"{t/ITERS:9.1f}  {k}")
    print("== top ops ==")
    for t, c, n in sorted(tops, reverse=True)[:18]:
        print(f"{t/ITERS:9.1f}  {c:24s} {n}")


if __name__ == "__main__":
    main()
