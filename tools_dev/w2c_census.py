"""Dev census: how many convs `layers._maybe_w2c_down_conv` captures
per int8 model family (abstract trace on CPU — counters tick at trace
time, nothing executes).

    JAX_PLATFORMS=cpu python tools_dev/w2c_census.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

import jax._src.xla_bridge as xb

xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")

from adas_tpu.models.layers import _TRACE_STATS, quantized


def census(name, net, shape):
    v = jax.eval_shape(
        lambda k: net.init(k, jnp.zeros(shape, jnp.float32)),
        jax.random.PRNGKey(0),
    )
    before = dict(_TRACE_STATS)

    def fwd(vv, x):
        with quantized("int8"):
            return net.apply(vv, x)

    jax.eval_shape(
        fwd, v, jax.ShapeDtypeStruct(shape, jnp.float32)
    )
    got = _TRACE_STATS["w2c_downs"] - before["w2c_downs"]
    print(f"{name:28s} w2c_downs={got}")


def main():
    from adas_tpu.models.efficientdet import EfficientNetFeatures
    from adas_tpu.models.resnet import ResNetFeatures
    from adas_tpu.models.yolo import YoloSpec, YoloV8, YoloV10
    from adas_tpu.models.yolov5lite import YoloV5Lite
    from adas_tpu.models.yolov6 import YoloV6
    from adas_tpu.models.yolov7 import YoloV7
    from adas_tpu.models.yolov9 import YoloV9

    census("yolov8l 640",
           YoloV8(spec=YoloSpec("v8", "l")), (1, 640, 640, 3))
    census("yolov8n 640",
           YoloV8(spec=YoloSpec("v8", "n")), (1, 640, 640, 3))
    census("yolov10l 640",
           YoloV10(spec=YoloSpec("v10", "l")), (1, 640, 640, 3))
    census("yolov5lite-g 640",
           YoloV5Lite(spec=YoloSpec("v5", "g")), (1, 640, 640, 3))
    census("yolov6m 640",
           YoloV6(spec=YoloSpec("v6", "m")), (1, 640, 640, 3))
    census("yolov7 640",
           YoloV7(spec=YoloSpec("v7", "base")), (1, 640, 640, 3))
    census("yolov9c 640",
           YoloV9(spec=YoloSpec("v9", "c"), variant="c"),
           (1, 640, 640, 3))
    census("resnet18 320x1600 (ufldv2)",
           ResNetFeatures(depth="18"), (1, 320, 1600, 3))
    census("effnet b0 512 (effdet d0)",
           EfficientNetFeatures(), (1, 512, 512, 3))


if __name__ == "__main__":
    main()
