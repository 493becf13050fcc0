"""A/B the W-phase channel-merge down-conv rewrite on the REAL serving
path (TPU): bench.py's own compute probe (8-stream fused YOLOv8l-640 +
UFLDv2-CULane calibrated int8, planes stem, blocks default-on) with
`ADAS_W2C_DOWN` off/on in ONE tunnel window.

Context: r05 attribution chased v8l's `down1` (s8 3x3 s2 64->128
@320^2) to an XLA `{3,0,2,1}` layout + in-fusion 52 MB relayout copy —
39.7 TF/s in situ, ~765 us of the 15.18 ms tick; the ufldv2 resnet18
layer2 down conv is the same family.  The rewrite
(models/layers._maybe_w2c_down_conv) should return ~500 us/tick.

    timeout 3600 python tools_dev/serving_w2c_ab.py [l|s]
"""
import os
import sys

import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

import jax

from serving_block_ab import build, compute_fps  # noqa: E402

# mode -> (ADAS_W2C_DOWN, ADAS_W2C_MINDIM)
MODES = {
    "off": ("0", None),
    "on_all": ("1", "1"),     # every eligible Cin<=64 conv (incl. lane)
    "on_gated": ("1", None),  # shipping default: min(H, W) >= 160
}


def main():
    rng = np.random.default_rng(0)
    names = sys.argv[2:] or list(MODES)
    for mode in names:
        env, mindim = MODES[mode]
        os.environ["ADAS_W2C_DOWN"] = env
        if mindim is None:
            os.environ.pop("ADAS_W2C_MINDIM", None)
        else:
            os.environ["ADAS_W2C_MINDIM"] = mindim
        jax.clear_caches()
        ms, batch = build(rng)
        fps, stats = compute_fps(ms, batch)
        print(
            f"serving compute_fps [{mode:8s}] {fps:8.2f}  "
            f"w2c_downs={stats['w2c_downs']}  "
            f"pallas_blocks={stats['pallas_blocks']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
