"""Golden-array tests for the grid builders vs a literal scalar oracle."""

import math

import numpy as np
import pytest

from evolutionary_illusion_generator_tpu.ops.grids import (
    create_grid,
    enhanced_image_grid,
    fill_circle,
)
from evolutionary_illusion_generator_tpu.structure import StructureType


def fill_circle_scalar(x, y, max_radius, direction, structure=StructureType.Circles):
    """Scalar transcription of the reference ring mapper (oracle)."""
    r_total = math.sqrt(x * x + y * y)
    n_ratios = 10
    r_ratios = np.zeros(n_ratios)
    r_ratios[n_ratios - 1] = 1
    for i in range(2, n_ratios + 1):
        r_ratios[n_ratios - i] = r_ratios[n_ratios - i + 1] * 1.5
    r_ratios = r_ratios / r_ratios[0]

    theta = 0.0
    r = -1.0
    if r_total <= max_radius / 2:
        radius = min(1, r_total / (max_radius / 2))
        radius_index = 0
        for i in range(1, n_ratios - 1):
            if radius > r_ratios[i]:
                r = (radius - r_ratios[i]) / (r_ratios[i - 1] - r_ratios[i])
                if direction < 0:
                    r = 1 - r
                radius_index = n_ratios - i - 1
                break
        if structure == StructureType.Circles:
            if x == 0:
                theta = math.pi / 2.0
            else:
                theta = np.arctan(y * 1.0 / x)
            if x < 0:
                theta = theta + math.pi
            if radius_index % 2 == 1:
                theta = theta + math.pi / 4.0
            theta = theta % (math.pi / 6.0)
            if direction < 0:
                theta = (math.pi / 6.0) - theta
        elif structure == StructureType.CirclesFree:
            if x == 0:
                theta = math.pi / 2.0
            else:
                theta = np.arctan(y * 1.0 / x)
            if x < 0:
                theta = theta + math.pi
            if radius_index % 2 == 1:
                theta = theta + math.pi / 4.0
            if direction < 0:
                theta = (math.pi / 6.0) - theta
        if (r > 0.9) or (r < 0.1):
            r = -1
            theta = 0
        else:
            r = r / 0.8
    return r, theta


def circles_grid_oracle(x_res, y_res, structure=StructureType.Circles):
    x_mat = np.zeros((y_res, x_res))
    y_mat = np.zeros((y_res, x_res))
    for xx in range(x_res):
        x = xx - (x_res / 2)
        for yy in range(y_res):
            y = yy - (y_res / 2)
            r, theta = fill_circle_scalar(x, y, y_res, 1, structure)
            x_mat[yy, xx] = r
            y_mat[yy, xx] = theta
    return x_mat, y_mat


class TestFillCircle:
    @pytest.mark.parametrize("direction", [1, -1])
    @pytest.mark.parametrize(
        "structure", [StructureType.Circles, StructureType.CirclesFree]
    )
    def test_vs_scalar_oracle(self, direction, structure):
        rng = np.random.default_rng(0)
        xs = rng.uniform(-80, 80, 300)
        ys = rng.uniform(-80, 80, 300)
        r_vec, t_vec = fill_circle(xs, ys, None, None, 120, direction, structure)
        for i in range(len(xs)):
            r, t = fill_circle_scalar(xs[i], ys[i], 120, direction, structure)
            assert r_vec[i] == pytest.approx(r, abs=1e-12), (xs[i], ys[i])
            assert t_vec[i] == pytest.approx(t, abs=1e-12), (xs[i], ys[i])

    def test_whitespace_sentinels(self):
        # outside the circle and in the innermost core -> r = -1
        r, t = fill_circle(100.0, 100.0, None, None, 120, 1)
        assert r == -1.0 and t == 0.0
        r, t = fill_circle(0.5, 0.5, None, None, 120, 1)
        assert r == -1.0 and t == 0.0


class TestCreateGrid:
    def test_circles_vs_oracle(self):
        g = create_grid(StructureType.Circles, 160, 120, 10)
        ox, oy = circles_grid_oracle(160, 120)
        np.testing.assert_allclose(g["x_mat"], ox, atol=1e-12)
        np.testing.assert_allclose(g["y_mat"], oy, atol=1e-12)

    def test_free_is_meshgrid(self):
        g = create_grid(StructureType.Free, 16, 12, 10)
        assert g["x_mat"].shape == (12, 16)
        assert g["x_mat"][0, 0] == -10 and g["x_mat"][0, -1] == 10
        assert g["y_mat"][0, 0] == -10 and g["y_mat"][-1, 0] == 10
        # x constant along rows, y constant along cols
        assert np.all(g["x_mat"][0] == g["x_mat"][5])
        assert np.all(g["y_mat"][:, 0] == g["y_mat"][:, 7])

    def test_bands_structure(self):
        h, w = 120, 160
        g = create_grid(StructureType.Bands, w, h, 10)
        x_mat, y_mat = g["x_mat"], g["y_mat"]
        assert x_mat.shape == (h, w)
        # padding rows are zeroed: rows 20:30, 50:60, 80:90, 110:120
        for r0, r1 in [(20, 30), (50, 60), (80, 90), (110, 120)]:
            assert np.all(x_mat[r0:r1] == 0)
        # alternating bands flip the x sign
        assert np.all(x_mat[5] == -x_mat[35])
        assert np.all(x_mat[5] == x_mat[65])
        # x tiles 10 times
        assert np.allclose(x_mat[5, :16], x_mat[5, 16:32])
        # y ramps within a band: linspace(-2.5, 2.5, 20) then 10 zeros
        assert y_mat[0, 0] == pytest.approx(-2.5)
        assert y_mat[19, 0] == pytest.approx(2.5)
        assert np.all(y_mat[20:30] == 0)

    def test_circles_free_vs_oracle(self):
        h, w = 60, 60
        g = create_grid(StructureType.CirclesFree, w, h, 10)
        r_len = int(h / 6)
        for xx in [0, 10, 29, 30, 31, 45]:
            for yy in [0, 15, 30, 44]:
                x = xx - w / 2
                y = yy - h / 2
                r_total = math.sqrt(x * x + y * y)
                r = min(r_total, h / 2) % r_len / r_len
                theta = 0.0
                if r_total < h / 2:
                    theta = math.pi / 2 if x == 0 else np.arctan(y / x)
                    if x < 0:
                        theta += math.pi
                    if int(r_total / r_len) % 2 == 1:
                        theta += math.pi / 4
                assert g["x_mat"][yy, xx] == pytest.approx(r, abs=1e-12)
                assert g["y_mat"][yy, xx] == pytest.approx(theta, abs=1e-12)


class TestEnhancedGrid:
    def test_vs_scalar_oracle(self):
        res = 120
        g = enhanced_image_grid(res, res, StructureType.Circles)
        # oracle: literal transcription of the reference double loop
        c_rows = c_cols = 3
        y_step = x_step = int(res / 3)
        sub_rows = sub_cols = 2
        centers = [None] * (c_rows * c_cols + sub_rows * sub_cols)
        for y in range(c_rows):
            for x in range(c_cols):
                centers[y * c_cols + x] = [
                    x_step * x + x_step / 2,
                    y_step * y + y_step / 2,
                ]
        for y in range(sub_rows):
            for x in range(sub_cols):
                centers[c_rows * c_cols + y * sub_cols + x] = [
                    x_step * x + x_step,
                    y_step * y + x_step,
                ]
        x_mat = np.ones((res, res)) * -1
        y_mat = np.ones((res, res)) * -1
        for row in range(c_rows):
            for col in range(c_cols):
                index = row * c_cols + col
                direction = -1 if index % 2 == 0 else 1
                for xx in range(x_step):
                    real_x = col * x_step + xx
                    x = real_x - centers[index][0]
                    for yy in range(y_step):
                        real_y = row * y_step + yy
                        y = real_y - centers[index][1]
                        r, theta = fill_circle_scalar(
                            x, y, y_step, direction, StructureType.Circles
                        )
                        x_mat[real_y, real_x] = r
                        y_mat[real_y, real_x] = theta
        for row in range(sub_rows):
            for col in range(sub_cols):
                index = c_rows * c_cols + row * sub_rows + col
                direction = -1 if index % 2 == 0 else 1
                for xx in range(x_step):
                    real_x = (col * x_step + xx) + int(x_step / 2)
                    x = real_x - centers[index][0]
                    for yy in range(y_step):
                        real_y = (row * y_step + yy) + int(y_step / 2)
                        y = real_y - centers[index][1]
                        if math.sqrt(x * x + y * y) < x_step / 2:
                            r, theta = fill_circle_scalar(
                                x, y, y_step, direction, StructureType.Circles
                            )
                            x_mat[real_y, real_x] = r
                            y_mat[real_y, real_x] = theta

        np.testing.assert_allclose(g["x_mat"], x_mat, atol=1e-12)
        np.testing.assert_allclose(g["y_mat"], y_mat, atol=1e-12)
