import numpy as np

from adas_tpu.utils import (
    LimitedList,
    LaneInfo,
    RectInfo,
    hex_to_rgb,
)


class TestLimitedList:
    def test_eviction_and_full(self):
        ll = LimitedList(3)
        assert not ll.full()
        ll.extend([1, 2])
        assert not ll.full()
        ll.append(3)
        assert ll.full()
        ll.append(4)
        assert list(ll) == [2, 3, 4]
        assert ll.full()
        ll.clear()
        assert len(ll) == 0 and not ll.full()

    def test_indexing_and_count(self):
        ll = LimitedList(5)
        ll.extend(["L", "R", "L"])
        assert ll[-1] == "L"
        assert ll.count("L") == 2
        assert ll[0:2] == ["L", "R"]

    def test_count_with_arrays(self):
        ll = LimitedList(4)
        ll.append(["L", 100])
        ll.append(["L", 100])
        ll.append(["R", 50])
        assert ll.count(["L", 100]) == 2


class TestRectInfo:
    def test_tolist_formats(self):
        r = RectInfo(10.2, 20.7, 30.0, 40.0, conf=0.9, label="car")
        assert r.tolist() == [10, 20, 40, 60]
        assert r.tolist(format_type="xywh") == [10, 20, 30, 40]
        assert r.tolist(dtype=float) == [10.2, 20.7, 40.2, 60.7]

    def test_pad(self):
        r = RectInfo(10, 20, 30, 40, conf=0.5, label="bus").pad(5)
        assert (r.x, r.y, r.width, r.height) == (5, 15, 40, 50)


class TestLaneInfo:
    def test_area_requires_both_ego_lanes(self):
        info = LaneInfo()
        info.lanes_points = np.array(
            [[], [(1, 1), (2, 2), (3, 3)], [(5, 1), (6, 2), (7, 3)], []],
            dtype=object,
        )
        info.lanes_status = [False, True, True, False]
        info.update_status()
        assert info.area_status
        info.update_area(img_height=100)
        # polygon = left lane followed by reversed right lane
        assert info.area_points.shape == (6, 2)
        assert tuple(info.area_points[0]) == (1, 1)
        assert tuple(info.area_points[3]) == (7, 3)

    def test_no_area_when_one_ego_missing(self):
        info = LaneInfo()
        info.lanes_points = np.array([[], [(1, 1)], [], []], dtype=object)
        info.lanes_status = [False, True, False, False]
        info.update_status()
        assert not info.area_status
        info.update_area(img_height=100)
        assert info.area_points.size == 0


def test_hex_to_rgb():
    assert hex_to_rgb("#ff0080") == (255, 0, 128)
    assert hex_to_rgb("102030") == (16, 32, 48)
