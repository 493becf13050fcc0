"""UFLD v1/v2 lane decode as fused fixed-shape device ops.

The reference decodes with per-lane/per-anchor Python loops on host
(ultrafastLaneDetectorV2.py:114-181, ultrafastLaneDetector.py:97-136).  Here
the whole decode is a vectorized XLA computation over all (anchor, lane)
cells at once; only a compact (coords, validity) tensor crosses back to
host, where the final thresholded point lists are assembled.

Exactness notes:
* v2 uses a softmax *expectation over a ±``local_width`` window around the
  argmax*.  At the grid edges the reference window shrinks (2 entries);
  we reproduce that with an additive -inf mask over out-of-range window
  slots rather than clamping (clamping would double-count the edge cell).
* v1 flips the row axis, takes the softmax expectation over all cells with
  1-based indices, and zeroes cells whose argmax hits the background bin.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("local_width",))
def ufld_v2_decode(
    outputs: Dict[str, jnp.ndarray], local_width: int = 1
) -> Dict[str, jnp.ndarray]:
    """Decode UFLDv2 head outputs to normalized lane coordinates.

    Args:
        outputs: dict with ``loc_row`` (B, G_r, R, L), ``loc_col``
            (B, G_c, C, L), ``exist_row`` (B, 2, R, L), ``exist_col``
            (B, 2, C, L).
        local_width: window half-size around the argmax cell.

    Returns dict with
        ``row_x``   (B, R, L) x position in [0, 1] units of image width,
        ``row_valid`` (B, R, L) bool existence per anchor,
        ``col_y``   (B, C, L) y position in [0, 1] units of image height,
        ``col_valid`` (B, C, L) bool.
    """
    row_x, row_valid = _axis_decode(
        outputs["loc_row"], outputs["exist_row"], local_width
    )
    col_y, col_valid = _axis_decode(
        outputs["loc_col"], outputs["exist_col"], local_width
    )
    return {
        "row_x": row_x,
        "row_valid": row_valid,
        "col_y": col_y,
        "col_valid": col_valid,
    }


def _axis_decode(
    loc: jnp.ndarray, exist: jnp.ndarray, local_width: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared row/col decode: (B, G, A, L) logits -> (B, A, L) coords."""
    num_grid = loc.shape[1]
    valid = jnp.argmax(exist, axis=1) == 1  # (B, A, L)
    max_idx = jnp.argmax(loc, axis=1)  # (B, A, L)

    # window of 2*local_width+1 cells around argmax, -inf where out of range
    offsets = jnp.arange(-local_width, local_width + 1)  # (W,)
    idx = max_idx[..., None] + offsets  # (B, A, L, W)
    in_range = (idx >= 0) & (idx <= num_grid - 1)
    gather_idx = jnp.clip(idx, 0, num_grid - 1)
    # gather loc values: loc is (B, G, A, L) -> take along axis 1
    loc_balw = jnp.moveaxis(loc, 1, -1)  # (B, A, L, G)
    vals = jnp.take_along_axis(loc_balw, gather_idx, axis=-1)  # (B, A, L, W)
    vals = jnp.where(in_range, vals, NEG_INF)
    probs = jax.nn.softmax(vals, axis=-1)
    expectation = jnp.sum(
        probs * jnp.where(in_range, idx, 0).astype(probs.dtype), axis=-1
    )
    coord = (expectation + 0.5) / (num_grid - 1)
    return coord, valid


@jax.jit
def ufld_v1_decode(output: jnp.ndarray) -> jnp.ndarray:
    """Decode UFLD v1 logits (B, G+1, R, L) -> grid locations (B, R, L).

    Semantics of reference ultrafastLaneDetector.py:97-110: rows flipped,
    softmax expectation over the G non-background cells with 1-based
    indices, zero where the hard argmax selects the background bin.
    Output is in units of grid cells (0 = no lane).
    """
    griding_num = output.shape[1] - 1
    flipped = output[:, :, ::-1, :]
    prob = jax.nn.softmax(flipped[:, :-1, :, :], axis=1)
    idx = jnp.arange(1, griding_num + 1, dtype=prob.dtype).reshape(1, -1, 1, 1)
    loc = jnp.sum(prob * idx, axis=1)  # (B, R, L)
    background = jnp.argmax(flipped, axis=1) == griding_num
    return jnp.where(background, 0.0, loc)
