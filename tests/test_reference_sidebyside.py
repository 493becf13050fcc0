"""Side-by-side EXECUTABLE parity for L2/L3: the reference's own
BYTETracker, TaskConditions and PerspectiveTransformation run unmodified
in a subprocess (tests/ref_sidebyside_gen.py) on seeded synthetic
streams, and our implementations must produce the same frame-by-frame
trace — track IDs, state transitions, FCWS/LDWS/LKAS messages, BEV
toggle sequences and geometry — modulo the two documented divergences,
which are asserted explicitly.

Complements tests/test_reference_golden.py (which covers the L1 decode
paths the same way): after this module, every branchy host-side layer of
the rebuild has been checked against the reference PROGRAM, not just
against hand-derived expectations.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.ref_sidebyside_gen import (
    condition_stream,
    detection_stream,
    lane_scenario,
    run_conditions_trace,
    run_perspective_trace,
    run_tracker_trace,
)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not available"
)


@pytest.fixture(scope="module")
def ref_trace(tmp_path_factory):
    out = tmp_path_factory.mktemp("sbs") / "trace.json"
    gen = os.path.join(os.path.dirname(__file__), "ref_sidebyside_gen.py")
    subprocess.run(
        [sys.executable, gen, str(out)], check=True, timeout=600
    )
    with open(out) as f:
        return json.load(f)


class TestTrackerSideBySide:
    @pytest.fixture(scope="class")
    def ours(self):
        from adas_tpu.tracking import BYTETracker
        from adas_tpu.tracking.base_track import BaseTrack

        BaseTrack.reset_counter()
        tracker = BYTETracker(names={"car": (0, 0, 255)})
        return run_tracker_trace(tracker, detection_stream())

    def test_tracked_identities_and_boxes(self, ref_trace, ours):
        """Track IDs, class labels, activation flags and KF box state of
        the ACTIVE set match the reference on every one of 130 frames."""
        assert len(ours) == len(ref_trace["tracker"]) == 130
        for f, (ref_fr, our_fr) in enumerate(
            zip(ref_trace["tracker"], ours)
        ):
            ref_t, our_t = ref_fr["tracked"], our_fr["tracked"]
            assert [(t[0], t[1], t[2]) for t in ref_t] == [
                (t[0], t[1], t[2]) for t in our_t
            ], f"frame {f}: tracked identity mismatch"
            for rt, ot in zip(ref_t, our_t):
                # KF boxes: reference solves via scipy cho_factor, ours
                # via batched einsum — same math, fp-level drift only
                np.testing.assert_allclose(
                    ot[3], rt[3], atol=2e-2,
                    err_msg=f"frame {f} track {rt[0]} tlwh",
                )

    def test_lost_set_matches_modulo_removed_linger(self, ref_trace, ours):
        """Lost sets match, EXCEPT the reference's expired tracks linger
        in lost_stracks one extra frame with state=Removed
        (byteTracker.py:180-182; divergence documented at
        tracking/byte_tracker.py:183).  Filtering the reference's lost
        list to state==Lost must yield exactly our lost list — and the
        linger must actually occur somewhere, or the scenario stopped
        covering the divergence."""
        from adas_tpu.tracking.base_track import TrackState

        linger_seen = False
        for f, (ref_fr, our_fr) in enumerate(
            zip(ref_trace["tracker"], ours)
        ):
            ref_lost_live = [
                tid for tid, st in ref_fr["lost"]
                if st == int(TrackState.Lost)
            ]
            our_lost_live = [
                tid for tid, st in our_fr["lost"]
                if st == int(TrackState.Lost)
            ]
            assert our_lost_live == ref_lost_live, f"frame {f}"
            # ours never keeps removed tracks in the lost list
            assert all(
                st == int(TrackState.Lost) for _, st in our_fr["lost"]
            ), f"frame {f}"
            if any(
                st == int(TrackState.Removed) for _, st in ref_fr["lost"]
            ):
                linger_seen = True
        assert linger_seen, "scenario no longer exercises the divergence"

    def test_removed_set_matches_modulo_duplication(self, ref_trace, ours):
        """Removed-track IDs agree as SETS every frame; the reference
        additionally re-expires lingering tracks, so its removed list
        must contain a duplicate at least once while ours never does
        (the second documented divergence)."""
        for f, (ref_fr, our_fr) in enumerate(
            zip(ref_trace["tracker"], ours)
        ):
            assert set(our_fr["removed"]) == set(ref_fr["removed"]), (
                f"frame {f}"
            )
            assert len(our_fr["removed"]) == len(set(our_fr["removed"]))
        ref_final = ref_trace["tracker"][-1]["removed"]
        assert len(ref_final) > len(set(ref_final)), (
            "scenario no longer triggers the reference's re-expiry "
            "duplication"
        )


class TestConditionsSideBySide:
    @pytest.fixture(scope="class")
    def ours(self):
        from adas_tpu.analytics import TaskConditions

        return run_conditions_trace(TaskConditions(), condition_stream())

    def test_full_trace_identical(self, ref_trace, ours):
        """CheckStatus gating, transform/toggle strings and all three
        message streams are bit-identical to the reference state machine
        over 176 frames covering WARNING/PROMPT/NORMAL/UNKNOWN collision,
        LEFT/RIGHT/CENTER offset, HARD/EASY/STRAIGHT curvature and the
        Top/Bottom/Default recalibration toggles."""
        ref = ref_trace["conditions"]
        assert len(ours) == len(ref) == 176
        for f, (r, o) in enumerate(zip(ref, ours)):
            assert o == r, f"frame {f}: {o} != {r}"

    def test_all_states_traversed(self, ref_trace):
        """The scenario genuinely visits every signal state (otherwise
        the identical-trace assertion proves less than it claims)."""
        ref = ref_trace["conditions"]
        assert {fr["collision"] for fr in ref} >= {
            "UNKNOWN", "NORMAL", "PROMPT", "WARNING",
        }
        assert {fr["offset"] for fr in ref} >= {
            "UNKNOWN", "CENTER", "LEFT", "RIGHT",
        }
        assert {fr["curvature"] for fr in ref} >= {
            "UNKNOWN", "STRAIGHT", "HARD_LEFT", "EASY_RIGHT", "EASY_LEFT",
        }
        fired = [fr["transform"] for fr in ref if fr["check"]]
        assert {"Top", "Bottom", "Default"} <= set(
            t for t in fired if t
        )

    def test_direction_mode_quirk_documented(self, ref_trace):
        """taskConditions.py:259 counts [dir, curv] LIST elements, so the
        count of any direction string is always 0 and the 'mode' is an
        arbitrary set element.  Assert the quirk exists in the reference
        (count == 0) and that ours computes the true mode; the scenarios
        keep curvature windows single-direction so traces stay equal."""
        assert ref_trace["mode_quirk"]["list_count_of_L"] == 0
        assert ref_trace["mode_quirk"]["true_mode"] == "L"
        from adas_tpu.analytics import TaskConditions
        from adas_tpu.utils.types import CurvatureType, OffsetType

        tc = TaskConditions()
        tc.offset_msg = OffsetType.CENTER
        for d in ["L"] * 6 + ["R", "R", "R", "L"]:
            tc.UpdateRouteStatus(d, 300.0)
            tc.offset_msg = OffsetType.CENTER
        assert tc.curvature_msg == CurvatureType.HARD_LEFT  # true mode L


class TestPerspectiveSideBySide:
    @pytest.fixture(scope="class")
    def ours(self):
        from adas_tpu.analytics import PerspectiveTransformation

        return run_perspective_trace(
            PerspectiveTransformation((1280, 720)), lane_scenario()
        )

    def test_full_geometry_trace(self, ref_trace, ours):
        """Source trapezoid evolution (all three toggle modes + the
        unknown-mode no-op), homography, projected bird-view points,
        direction and curvature/offset match step for step.  720p frames
        so the reference's hard-coded row 719 equals our bottom-row
        sampling (divergence documented at analytics/perspective.py:122)."""
        ref = ref_trace["perspective"]
        assert len(ours) == len(ref) == 24
        for s, (r, o) in enumerate(zip(ref, ours)):
            np.testing.assert_allclose(
                o["src"], r["src"], atol=1e-3, err_msg=f"step {s} src"
            )
            np.testing.assert_allclose(
                o["M"], r["M"], rtol=1e-6, atol=1e-9,
                err_msg=f"step {s} homography",
            )
            for side in ("bird_left", "bird_right"):
                d = np.abs(
                    np.asarray(o[side]) - np.asarray(r[side])
                ).max()
                # int truncation of fp-identical projections: any
                # disagreement beyond +-1px is a real geometry bug
                assert d <= 1, f"step {s} {side} max |d|={d}"
            assert o["direction"] == r["direction"], f"step {s}"
            if r["curvature"] is not None:
                # curvature's radius form is ill-conditioned when nearly
                # straight (1/|2a| with a ~ 0): compare tightly in the
                # curved regime, only the magnitude class when straight
                if r["curvature"] < 2e4:
                    np.testing.assert_allclose(
                        o["curvature"], r["curvature"], rtol=2e-2,
                        err_msg=f"step {s} curvature",
                    )
                else:
                    assert o["curvature"] >= 1e4
                np.testing.assert_allclose(
                    o["offset"], r["offset"], atol=2e-3,
                    err_msg=f"step {s} offset",
                )

    def test_directions_traversed(self, ref_trace):
        assert {fr["direction"] for fr in ref_trace["perspective"]} == {
            "L", "R", "F",
        }
