"""Dev probe: does XLA:TPU fuse the NEXT conv's activation quantize
(round/clip/convert-to-s8) into the PRODUCER conv's output fusion?

Decides whether an explicit s8-chained epilogue (emit int8 activations
between convs) can save HBM traffic, or whether the bf16 intermediate
already never materializes.  Compiles a minimal calibrated int8
conv->conv chain for the attached TPU and inspects the optimized HLO:

    timeout 3600 python tools_dev/hlo_dump.py [--full]

Prints, per convolution fusion, whether the s8 re-quantize ops
(round-nearest-even / clamp / convert s8) are inside the same fusion
computation, plus every fusion whose root is a plain elementwise chain
touching bf16->s8 (the "standalone quantize pass" signature).
"""
import os
import re
import sys

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # keep the tunneled-TPU plugin from initializing in-process (it can
    # hang when the tunnel is down and destabilizes the CPU backend —
    # same workaround as __graft_entry__.py / tests/conftest.py)
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

from adas_tpu.models.layers import ConvBN, quantized  # noqa: E402
import flax.linen as nn  # noqa: E402


class TwoConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ConvBN(64, (3, 3), name="c1")(x)
        x = ConvBN(64, (3, 3), name="c2")(x)
        x = ConvBN(64, (3, 3), name="c3")(x)
        return x


def main():
    net = TwoConv()
    x = jnp.zeros((1, 80, 80, 32), jnp.bfloat16)
    with quantized("int8"):
        variables = net.init(jax.random.PRNGKey(0), x)
    # calibrate: record act absmax so serving uses static scales
    with quantized("int8_calib"):
        _, upd = net.apply(
            variables, jnp.ones_like(x), mutable=["act_scales"]
        )
    variables = {**variables, **upd}

    def step(v, x):
        with quantized("int8"):
            return net.apply(v, x)

    lowered = jax.jit(step).lower(variables, x)
    hlo = lowered.compile().as_text()

    if "--full" in sys.argv:
        print(hlo)
        return

    # per computation (header "name (sig) -> type {" at col 0, body
    # until the col-0 closing brace): does it contain a convolution AND
    # the quantize signature (round-nearest-even/clamp/convert to s8)?
    blocks = re.findall(
        r"^(%?[\w.-]+) \([^\n]*\{\n(.*?)\n\}", hlo, re.M | re.S
    )
    n_conv_fused_q = n_conv_plain = n_standalone_q = 0
    for name, body in blocks:
        has_conv = "convolution" in body
        has_q = ("round-nearest-even" in body or "round(" in body) and (
            "s8" in body or "s32" in body
        )
        if has_conv and has_q:
            n_conv_fused_q += 1
            print(f"[conv+quant IN ONE FUSION] {name}")
        elif has_conv:
            n_conv_plain += 1
            print(f"[conv without quantize]    {name}")
        elif has_q and "clamp" in body:
            n_standalone_q += 1
            print(f"[STANDALONE quantize pass] {name}")
    print(
        f"\nconv fusions with s8 quantize inside: {n_conv_fused_q}\n"
        f"conv fusions without:                 {n_conv_plain}\n"
        f"standalone s8 quantize fusions:       {n_standalone_q}"
    )
    print(
        "\nverdict: "
        + (
            "quantize already rides the producer conv fusion — "
            "s8-chaining would buy ~nothing on straight chains"
            if n_conv_fused_q and not n_standalone_q
            else "standalone quantize passes exist — s8-chaining can "
            "remove them"
        )
    )


if __name__ == "__main__":
    main()
