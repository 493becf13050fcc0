"""UFLD decode parity vs a numpy oracle implementing the reference
per-point loop semantics (ultrafastLaneDetectorV2.py:146-180,
ultrafastLaneDetector.py:97-110)."""
import numpy as np
import jax.numpy as jnp
from scipy.special import softmax as sp_softmax

from adas_tpu.ops.ufld_decode import ufld_v1_decode, ufld_v2_decode


def oracle_v2_axis(loc, exist, local_width=1):
    """Per-cell loop decode for one axis, normalized coords."""
    _, num_grid, num_anchor, num_lane = loc.shape
    valid = exist.argmax(1)  # (1, A, L)
    max_idx = loc.argmax(1)  # (1, A, L)
    coords = np.zeros((num_anchor, num_lane))
    for i in range(num_lane):
        for k in range(num_anchor):
            m = max_idx[0, k, i]
            all_ind = list(
                range(max(0, m - local_width), min(num_grid - 1, m + local_width) + 1)
            )
            out = (sp_softmax(loc[0, all_ind, k, i]) * np.array(all_ind, float)).sum() + 0.5
            coords[k, i] = out / (num_grid - 1)
    return coords, valid[0].astype(bool)


class TestV2Decode:
    def test_matches_oracle(self, rng):
        G_r, R, G_c, C, L = 20, 9, 16, 7, 4
        outputs = {
            "loc_row": rng.normal(size=(1, G_r, R, L)).astype(np.float32),
            "exist_row": rng.normal(size=(1, 2, R, L)).astype(np.float32),
            "loc_col": rng.normal(size=(1, G_c, C, L)).astype(np.float32),
            "exist_col": rng.normal(size=(1, 2, C, L)).astype(np.float32),
        }
        got = ufld_v2_decode({k: jnp.asarray(v) for k, v in outputs.items()})
        want_x, want_vr = oracle_v2_axis(outputs["loc_row"], outputs["exist_row"])
        want_y, want_vc = oracle_v2_axis(outputs["loc_col"], outputs["exist_col"])
        np.testing.assert_allclose(np.array(got["row_x"][0]), want_x, atol=1e-5)
        np.testing.assert_allclose(np.array(got["col_y"][0]), want_y, atol=1e-5)
        np.testing.assert_array_equal(np.array(got["row_valid"][0]), want_vr)
        np.testing.assert_array_equal(np.array(got["col_valid"][0]), want_vc)

    def test_edge_argmax_window_shrinks(self):
        """At grid edges the window must have 2 entries, not a clamped
        duplicate of the edge cell."""
        G, R, L = 6, 1, 1
        loc = np.full((1, G, R, L), -5.0, np.float32)
        loc[0, 0, 0, 0] = 3.0  # argmax at edge 0
        loc[0, 1, 0, 0] = 1.0
        exist = np.zeros((1, 2, R, L), np.float32)
        exist[0, 1] = 1.0
        got = ufld_v2_decode(
            {
                "loc_row": jnp.asarray(loc),
                "exist_row": jnp.asarray(exist),
                "loc_col": jnp.asarray(loc),
                "exist_col": jnp.asarray(exist),
            }
        )
        want, _ = oracle_v2_axis(loc, exist)
        np.testing.assert_allclose(np.array(got["row_x"][0]), want, atol=1e-6)

    def test_wider_window(self, rng):
        G, R, L = 12, 3, 2
        loc = rng.normal(size=(1, G, R, L)).astype(np.float32)
        exist = rng.normal(size=(1, 2, R, L)).astype(np.float32)
        got = ufld_v2_decode(
            {
                "loc_row": jnp.asarray(loc),
                "exist_row": jnp.asarray(exist),
                "loc_col": jnp.asarray(loc),
                "exist_col": jnp.asarray(exist),
            },
            local_width=2,
        )
        want, _ = oracle_v2_axis(loc, exist, local_width=2)
        np.testing.assert_allclose(np.array(got["row_x"][0]), want, atol=1e-5)


class TestV1Decode:
    def oracle(self, output):
        """Reference ultrafastLaneDetector.__process_output math."""
        processed = np.squeeze(output, 0)[:, ::-1, :]
        prob = sp_softmax(processed[:-1, :, :], axis=0)
        idx = (np.arange(processed.shape[0] - 1) + 1).reshape(-1, 1, 1)
        loc = np.sum(prob * idx, axis=0)
        argmax = np.argmax(processed, axis=0)
        loc[argmax == processed.shape[0] - 1] = 0
        return loc

    def test_matches_oracle(self, rng):
        out = rng.normal(size=(1, 11, 8, 4)).astype(np.float32) * 3
        got = np.array(ufld_v1_decode(jnp.asarray(out))[0])
        np.testing.assert_allclose(got, self.oracle(out), atol=1e-4)

    def test_background_zeroed(self):
        out = np.zeros((1, 5, 2, 1), np.float32)
        out[0, 4, 0, 0] = 10.0  # background wins at anchor 0
        out[0, 1, 1, 0] = 10.0  # cell 1 wins at anchor 1
        got = np.array(ufld_v1_decode(jnp.asarray(out))[0])
        # rows are flipped: anchor 0 output corresponds to input anchor 1
        assert got[0, 0] > 0
        assert got[1, 0] == 0
