"""DA3 visualization + layout + memory utils.

Covers the reference's ``utils/visualize.py`` (depth colormap — parity
against the vendored reference when present), ``utils/layout_helpers.py``
(cat/hcat/vcat/add_border) and ``utils/memory.py`` (device memory
introspection policy surface, TPU-native via JAX allocator stats).
"""

import os

import numpy as np
import pytest

from videogpa_tpu.models.da3.visualize import (
    add_border,
    apply_color_map,
    apply_color_map_to_image,
    hcat,
    vcat,
    visualize_depth,
)

REF = "/root/reference"


class TestVisualizeDepth:
    def test_shapes_types_and_minmax(self):
        rng = np.random.default_rng(0)
        d = rng.uniform(0.5, 10.0, (17, 23))
        d[rng.random(d.shape) < 0.1] = 0  # invalid pixels
        out = visualize_depth(d)
        assert out.shape == (17, 23, 3) and out.dtype == np.uint8
        outf, mn, mx = visualize_depth(d, ret_minmax=True, ret_type=np.float32)
        assert outf.dtype == np.float32 and 0 <= outf.min() <= outf.max() <= 1
        assert 0 < mn < mx  # percentile range over disparities
        with pytest.raises(ValueError):
            visualize_depth(d, ret_type=np.int16)

    def test_near_is_warm_far_is_cool(self):
        # Spectral flipped: near (large disparity) -> red end, far -> blue
        d = np.array([[1.0, 100.0]] * 8).repeat(8, axis=0)
        out = visualize_depth(d, depth_min=0.01, depth_max=1.0)
        near, far = out[0, 0].astype(int), out[0, -1].astype(int)
        assert near[0] > near[2]  # near pixel: red > blue
        assert far[2] > far[0]  # far pixel: blue > red

    @pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "depth_anything_3")),
        reason="reference checkout absent",
    )
    def test_matches_reference_bit_exact(self):
        import sys

        if REF not in sys.path:
            sys.path.insert(0, REF)
        from depth_anything_3.utils.visualize import visualize_depth as ref_vis

        rng = np.random.default_rng(1)
        d = rng.uniform(0.3, 20.0, (37, 53))
        d[rng.random(d.shape) < 0.15] = 0
        ours, mn, mx = visualize_depth(d.copy(), ret_minmax=True)
        ref, rmn, rmx = ref_vis(d.copy(), ret_minmax=True)
        np.testing.assert_array_equal(ours, ref)
        assert mn == rmn and mx == rmx


class TestColorMaps:
    def test_apply_color_map(self):
        x = np.linspace(0, 1, 12).reshape(3, 4)
        out = apply_color_map(x)
        assert out.shape == (3, 4, 3) and out.dtype == np.float32
        img = apply_color_map_to_image(x[None])
        assert img.shape == (1, 3, 3, 4)  # (*batch, 3, H, W)


class TestLayout:
    def test_hcat_align_and_gap(self):
        a = np.zeros((3, 4, 6), np.float32)
        b = np.full((3, 2, 3), 0.5, np.float32)
        out = hcat(a, b, align="top", gap=2, gap_color=1)
        assert out.shape == (3, 4, 6 + 2 + 3)
        assert (out[:, :, 6:8] == 1).all()  # separator column
        assert (out[:, :2, 8:] == 0.5).all()  # b aligned to top
        assert (out[:, 2:, 8:] == 1).all()  # pad below b

    def test_vcat_center(self):
        a = np.zeros((1, 2, 4), np.float32)
        b = np.full((1, 3, 2), 0.25, np.float32)
        out = vcat(a, b, align="center", gap=0)
        assert out.shape == (1, 5, 4)
        assert (out[:, 2:, 1:3] == 0.25).all()  # b centered in width
        assert (out[:, 2:, 0] == 1).all() and (out[:, 2:, 3] == 1).all()

    def test_add_border(self):
        img = np.zeros((3, 2, 2), np.float32)
        out = add_border(img, border=3, color=(1.0, 0.0, 0.5))
        assert out.shape == (3, 8, 8)
        assert tuple(out[:, 0, 0]) == (1.0, 0.0, 0.5)
        assert (out[:, 3:5, 3:5] == 0).all()


class TestDeviceMemory:
    def test_info_and_policy(self):
        from videogpa_tpu.utils.memory import (
            check_memory_availability,
            estimate_memory_requirement,
            get_device_memory_info,
        )

        info = get_device_memory_info()
        # CPU backend exposes no allocator stats -> None is a valid answer
        if info is not None:
            assert info["total_gb"] > 0
            assert 0 <= info["utilization"] <= 100
            assert info["free_gb"] <= info["total_gb"]

        ok, msg = check_memory_availability(required_gb=0.0)
        assert isinstance(ok, bool) and isinstance(msg, str)

        # reference policy shape: base 2GB, quadratic in resolution
        lo = estimate_memory_requirement(10, 252)
        hi = estimate_memory_requirement(10, 504)
        assert 2.0 < lo < hi
        assert np.isclose(hi - 2.0, (lo - 2.0) * 4)

    def test_cleanup_runs(self, capsys):
        from videogpa_tpu.utils.memory import cleanup_device_memory

        cleanup_device_memory()
        assert "cleanup" in capsys.readouterr().out
