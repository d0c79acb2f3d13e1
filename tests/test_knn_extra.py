"""Coords-emitting association parity with the index-based formulation."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.ops import knn


def test_coords_assoc_matches_indexed(rng):
    R, B = 16, 32
    c = rng.normal(size=(R * B, 3)).astype(np.float32) * 8
    cm = rng.uniform(size=R * B) > 0.2
    q = rng.normal(size=(64, 3)).astype(np.float32) * 8
    qm = np.ones(64, bool)
    cb = jnp.asarray(c.reshape(R, B, 3))
    mb = jnp.asarray(cm.reshape(R, B))

    ea_i = knn.associate_edges_ringblocked(jnp.asarray(q), jnp.asarray(qm), cb, mb)
    ea_c = knn.associate_edges_coords(jnp.asarray(q), jnp.asarray(qm), cb, mb)
    np.testing.assert_array_equal(np.asarray(ea_i.valid), np.asarray(ea_c.valid))
    v = np.asarray(ea_i.valid)
    np.testing.assert_allclose(c[np.asarray(ea_i.j0)][v], np.asarray(ea_c.a)[v], atol=0)
    np.testing.assert_allclose(c[np.asarray(ea_i.j2)][v], np.asarray(ea_c.b)[v], atol=0)

    pa_i = knn.associate_planes_ringblocked(jnp.asarray(q), jnp.asarray(qm), cb, mb)
    pa_c = knn.associate_planes_coords(jnp.asarray(q), jnp.asarray(qm), cb, mb)
    np.testing.assert_array_equal(np.asarray(pa_i.valid), np.asarray(pa_c.valid))
    v = np.asarray(pa_i.valid)
    for idx, coord in ((pa_i.j0, pa_c.j), (pa_i.j2, pa_c.l), (pa_i.j3, pa_c.m)):
        np.testing.assert_allclose(c[np.asarray(idx)][v], np.asarray(coord)[v], atol=0)
