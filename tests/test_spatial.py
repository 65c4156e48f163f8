"""Spatial (height) sharding of the PredNet rollout on the virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evolutionary_illusion_generator_tpu.models.prednet import (
    init_params,
    rollout_flow_frames,
)
from evolutionary_illusion_generator_tpu.parallel.spatial import (
    make_mesh_2d,
    make_spatial_rollout,
)


@pytest.mark.parametrize("pop_sp", [(2, 4), (1, 8), (4, 2)])
def test_spatial_rollout_matches_unsharded(pop_sp):
    n_pop, n_sp = pop_sp
    mesh = make_mesh_2d(n_pop, n_sp)
    params = init_params(jax.random.PRNGKey(0), (1, 4, 8))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 1))

    f = make_spatial_rollout(mesh, repeat=5, extension=2)
    from jax.sharding import NamedSharding, PartitionSpec as P

    a, b = f(params, jax.device_put(imgs, NamedSharding(mesh, P("pop", "sp"))))

    a0, b0 = rollout_flow_frames(params, imgs, repeat=5, extension=2,
                                 pair="population")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(b0))
    assert "sp" in str(a.sharding.spec)


def test_mesh_2d_shape():
    mesh = make_mesh_2d(2, 4)
    assert mesh.shape == {"pop": 2, "sp": 4}
    with pytest.raises(ValueError):
        make_mesh_2d(4, 4)
