"""Run-preset tests (the BASELINE config points)."""

import pytest

from evolutionary_illusion_generator_tpu.configs import (
    RUN_PRESET_NAMES,
    run_preset,
)
from evolutionary_illusion_generator_tpu.structure import StructureType


def test_all_five_baseline_points_exist():
    assert set(RUN_PRESET_NAMES) == {
        "circles_bw_small",
        "default_color",
        "bands",
        "free_big",
        "pop256_v5e8",
    }


def test_preset_shapes():
    p = run_preset("circles_bw_small")
    assert (p.w, p.h, p.c_dim) == (160, 120, 1)
    assert p.neat.pop_size == 24
    assert p.channels == (1, 16, 32, 64)

    p = run_preset("default_color")
    assert (p.w, p.h) == (320, 240) and p.repeat == 5
    assert p.neat.pop_size == 40

    p = run_preset("bands")
    assert p.structure == StructureType.Bands

    p = run_preset("free_big")
    assert (p.w, p.h) == (640, 480) and p.neat.pop_size == 100

    p = run_preset("pop256_v5e8")
    assert p.n_devices == 8 and p.neat.pop_size == 256
    assert (p.w, p.h) == (1280, 960)
    assert p.checkpoint_every == 1


def test_driver_kwargs_roundtrip():
    import inspect

    from evolutionary_illusion_generator_tpu.evolution.driver import neat_illusion

    sig = inspect.signature(neat_illusion)
    for name in RUN_PRESET_NAMES:
        kwargs = run_preset(name).driver_kwargs()
        for k in kwargs:
            assert k in sig.parameters, (name, k)


def test_unknown_preset():
    with pytest.raises(ValueError):
        run_preset("nope")
