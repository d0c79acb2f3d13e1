"""Fused Pallas GN kernel vs the XLA reference implementation (interpret mode
on CPU; the TPU path is exercised by the bench/pipeline)."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.ops import gn, lidar_factors as lf, pallas_gn, se3


def make_problem(rng, ne=128, npl=256):
    true = se3.se3_exp(
        jnp.asarray([0.3, -0.15, 0.1, 0.02, -0.03, 0.04], jnp.float32)
    )
    # edge correspondences: current points whose transforms lie on lines
    a = rng.uniform(-10, 10, (ne, 3)).astype(np.float32)
    dirs = rng.normal(size=(ne, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    b = a + dirs
    lam = rng.uniform(-0.5, 1.5, (ne, 1)).astype(np.float32)
    on_line = a + lam * dirs
    p_edge = np.asarray(se3.se3_apply(se3.se3_inverse(true), jnp.asarray(on_line)))

    # plane correspondences
    j = rng.uniform(-10, 10, (npl, 3)).astype(np.float32)
    n = rng.normal(size=(npl, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    # tangent vectors
    t1 = np.cross(n, [0.3, 0.7, 0.64])
    t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
    t2 = np.cross(n, t1)
    l = j + t1.astype(np.float32)
    m = j + t2.astype(np.float32)
    on_plane = j + 0.3 * t1 + 0.2 * t2
    p_plane = np.asarray(
        se3.se3_apply(se3.se3_inverse(true), jnp.asarray(on_plane.astype(np.float32)))
    )
    return true, (p_edge, a, b), (p_plane, j, l, m)


def xla_gn(pose, edge, plane, n_iters=8, delta=0.1):
    ec = lf.EdgeCorr(
        jnp.asarray(edge[0]), jnp.asarray(edge[1]), jnp.asarray(edge[2]),
        jnp.ones(edge[0].shape[0]), jnp.ones(edge[0].shape[0], bool),
    )
    pc_ = lf.PlaneCorr(
        jnp.asarray(plane[0]), jnp.asarray(plane[1]), jnp.asarray(plane[2]),
        jnp.asarray(plane[3]), jnp.ones(plane[0].shape[0]),
        jnp.ones(plane[0].shape[0], bool),
    )
    for _ in range(n_iters):
        re, Je = lf.edge_residuals(pose, ec)
        rp, Jp = lf.plane_residuals(pose, pc_)
        we = gn.huber_weight(jnp.linalg.norm(re, axis=-1), delta)
        wp = gn.huber_weight(jnp.abs(rp[..., 0]), delta)
        He, ge = gn.accumulate(re, Je, we, ec.mask)
        Hp, gp = gn.accumulate(rp, Jp, wp, pc_.mask)
        pose = gn.gn_update_pose(pose, gn.solve_damped(He + Hp, ge + gp))
    return pose


def to_rows(x, n_pad):
    out = np.zeros((3, n_pad), np.float32)
    out[:, : x.shape[0]] = x.T
    return jnp.asarray(out)


def test_pallas_matches_xla_and_recovers_pose(rng):
    true, edge, plane = make_problem(rng)
    ne, npl = edge[0].shape[0], plane[0].shape[0]

    pose_xla = xla_gn(se3.identity_pose(), edge, plane)

    w_e = np.zeros((1, 128), np.float32)
    w_e[0, :ne] = 1.0
    w_p = np.zeros((1, 256), np.float32)
    w_p[0, :npl] = 1.0
    q, t = pallas_gn.gn_inner_loop(
        jnp.asarray([1.0, 0, 0, 0], jnp.float32), jnp.zeros(3, jnp.float32),
        to_rows(edge[0], 128), to_rows(edge[1], 128), to_rows(edge[2], 128),
        jnp.asarray(w_e),
        to_rows(plane[0], 256), to_rows(plane[1], 256), to_rows(plane[2], 256),
        to_rows(plane[3], 256), jnp.asarray(w_p),
        n_iters=8, interpret=True,
    )

    # both recover the true pose
    for name, (pq, pt) in (("xla", (pose_xla.q, pose_xla.t)), ("pallas", (q, t))):
        err = se3.se3_log(
            se3.se3_compose(se3.se3_inverse(true), se3.Pose(pq, pt))
        )
        assert float(jnp.abs(err).max()) < 2e-3, (name, np.asarray(err))

    # and agree with each other tightly
    np.testing.assert_allclose(np.asarray(t), np.asarray(pose_xla.t), atol=1e-3)
    qd = abs(float(jnp.sum(q * pose_xla.q)))
    assert qd > 1 - 1e-5


def test_block_topk_coords_matches_bruteforce(rng):
    from lidar_visual_odometry_tpu.ops import pallas_nn

    Q, C, K = 256, 1024, 5
    q = rng.normal(size=(Q, 3)).astype(np.float32) * 10
    c = rng.normal(size=(C, 3)).astype(np.float32) * 10
    mask = rng.uniform(size=C) > 0.3
    baked = pallas_nn.bake_mask(jnp.asarray(c), jnp.asarray(mask))
    d, coords = pallas_nn.block_topk_coords(
        jnp.asarray(q), baked, k=K, q_tile=128, c_tile=256, interpret=True
    )
    D = np.linalg.norm(q[:, None] - c[None], axis=-1) ** 2
    D[:, ~mask] = np.inf
    order = np.argsort(D, axis=1)[:, :K]
    want_d = np.take_along_axis(D, order, axis=1)
    np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-3, atol=1e-3)
    want_c = c[order]
    np.testing.assert_allclose(np.asarray(coords), want_c, atol=1e-5)


def test_block_topk_idx_matches_bruteforce(rng):
    """The index-carrying variant (the scan-to-map fast path): distances and
    gathered coordinates must match brute force."""
    from lidar_visual_odometry_tpu.ops import pallas_nn

    Q, C, K = 256, 1024, 5
    q = rng.normal(size=(Q, 3)).astype(np.float32) * 10
    c = rng.normal(size=(C, 3)).astype(np.float32) * 10
    mask = rng.uniform(size=C) > 0.3
    baked = pallas_nn.bake_mask(jnp.asarray(c), jnp.asarray(mask))
    d, idx = pallas_nn.block_topk(
        jnp.asarray(q), baked, k=K, q_tile=128, c_tile=256, interpret=True
    )
    D = np.linalg.norm(q[:, None] - c[None], axis=-1) ** 2
    D[:, ~mask] = np.inf
    order = np.argsort(D, axis=1)[:, :K]
    want_d = np.take_along_axis(D, order, axis=1)
    np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(baked)[np.asarray(idx)], c[order], atol=1e-5
    )


def test_associate_kernel_matches_reference(rng):
    """The one-launch association kernel (interpret) vs the XLA coords path."""
    from lidar_visual_odometry_tpu.ops import knn, pallas_nn

    R, B, Q = 16, 128, 128
    c = rng.normal(size=(R, B, 3)).astype(np.float32) * 8
    cm = rng.uniform(size=(R, B)) > 0.2
    q = rng.normal(size=(Q, 3)).astype(np.float32) * 8
    baked = pallas_nn.bake_mask(jnp.asarray(c), jnp.asarray(cm))

    out = pallas_nn.associate_kernel(
        jnp.asarray(q), baked, q_tile=64, interpret=True
    )
    out = np.asarray(out)

    ea = knn.associate_edges_coords(
        jnp.asarray(q), jnp.ones(Q, bool), jnp.asarray(c), jnp.asarray(cm)
    )
    pa = knn.associate_planes_coords(
        jnp.asarray(q), jnp.ones(Q, bool), jnp.asarray(c), jnp.asarray(cm)
    )
    v = np.asarray(ea.valid)
    np.testing.assert_allclose(out[v, 0:3], np.asarray(ea.a)[v], atol=1e-5)
    np.testing.assert_allclose(out[v, 6:9], np.asarray(ea.b)[v], atol=1e-5)
    v = np.asarray(pa.valid)
    np.testing.assert_allclose(out[v, 0:3], np.asarray(pa.j)[v], atol=1e-5)
    np.testing.assert_allclose(out[v, 3:6], np.asarray(pa.l)[v], atol=1e-5)
    np.testing.assert_allclose(out[v, 6:9], np.asarray(pa.m)[v], atol=1e-5)
    # gates reproduce validity
    d0, d2s, dw = out[:, 9], out[:, 10], out[:, 11]
    valid_edge = (d0 < 25.0) & (dw < 25.0)
    np.testing.assert_array_equal(valid_edge, np.asarray(ea.valid))
    valid_plane = (d0 < 25.0) & (d2s < 25.0) & (dw < 25.0)
    np.testing.assert_array_equal(valid_plane, np.asarray(pa.valid))


def test_segment_sum_batched_matches_scatter(rng):
    """Pallas one-hot segment-sum (interpret) vs a numpy scatter reference."""
    from lidar_visual_odometry_tpu.ops import pallas_segsum

    R, W, S = 6, 256, 130
    seg = rng.integers(0, S, (R, W)).astype(np.int32)
    vals = rng.normal(size=(R, 4, W)).astype(np.float32)
    got = pallas_segsum.segment_sum_batched(
        jnp.asarray(seg), jnp.asarray(vals), n_segments=S, interpret=True
    )
    want = np.zeros((R, 4, S), np.float32)
    for r in range(R):
        np.add.at(want[r].T, seg[r], vals[r].T)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_block_topk_packed_matches_bruteforce(rng):
    """The packed (distance|index) int32 variant: indices exact, distances
    within the documented 2^-8 relative quantization."""
    from lidar_visual_odometry_tpu.ops import pallas_nn

    Q, C, K = 256, 1024, 5
    q = rng.normal(size=(Q, 3)).astype(np.float32) * 10
    c = rng.normal(size=(C, 3)).astype(np.float32) * 10
    mask = rng.uniform(size=C) > 0.3
    baked = pallas_nn.bake_mask(jnp.asarray(c), jnp.asarray(mask))
    d, idx = pallas_nn.block_topk(
        jnp.asarray(q), baked, k=K, q_tile=128, c_tile=256,
        interpret=True, packed=True,
    )
    D = np.linalg.norm(q[:, None] - c[None], axis=-1) ** 2
    D[:, ~mask] = np.inf
    order = np.argsort(D, axis=1)[:, :K]
    want_d = np.take_along_axis(D, order, axis=1)
    got_d = np.sort(np.asarray(d), axis=1)
    np.testing.assert_allclose(got_d, want_d, rtol=2**-7, atol=1e-3)
    # indices: allow near-tie swaps from the quantized ordering
    got_set = np.sort(np.asarray(idx), axis=1)
    want_set = np.sort(order, axis=1)
    agree = (got_set == want_set).mean()
    assert agree > 0.97, agree


def test_block_topk_windowed_matches_bruteforce_within_cell(rng):
    """Cell-windowed variant: every neighbor within one cell (2 m) of a query
    must be found exactly; farther slots may carry the 1e30 sentinel. This is
    the exactness contract solve_map_pose relies on (its gates are 1 m)."""
    from lidar_visual_odometry_tpu.ops import pallas_nn

    Q, C, K, CELL, GW = 256, 1024, 5, 2.0, 64
    # clustered points so cells are meaningfully occupied
    centers = rng.normal(size=(12, 3)).astype(np.float32) * 20
    q = (centers[rng.integers(0, 12, Q)]
         + rng.normal(size=(Q, 3)).astype(np.float32))
    c = (centers[rng.integers(0, 12, C)]
         + rng.normal(size=(C, 3)).astype(np.float32) * 1.5)
    mask = rng.uniform(size=C) > 0.3
    origin = jnp.asarray(
        np.min(np.concatenate([q, c]), axis=0)[:2] - 3.0, jnp.float32
    )

    c_sorted, c_keys = pallas_nn.sort_by_cell(
        jnp.asarray(c), jnp.asarray(mask), origin, cell=CELL, grid_w=GW
    )
    qk = pallas_nn.cell_keys(jnp.asarray(q), origin, cell=CELL, grid_w=GW)
    d, idx = pallas_nn.block_topk_windowed(
        jnp.asarray(q), qk, c_sorted, c_keys,
        k=K, q_tile=64, c_tile=128, grid_w=GW, interpret=True,
    )
    d = np.asarray(d)
    got_coords = np.asarray(c_sorted)[np.asarray(idx)]

    D = np.linalg.norm(q[:, None] - c[None], axis=-1) ** 2
    D[:, ~mask] = np.inf
    order = np.argsort(D, axis=1)[:, :K]
    want_d = np.take_along_axis(D, order, axis=1)
    want_c = c[order]
    within = want_d < CELL * CELL
    # inside the cell radius: exact distances AND coordinates
    np.testing.assert_allclose(d[within], want_d[within], rtol=1e-4)
    np.testing.assert_allclose(got_coords[within], want_c[within], atol=1e-5)
    # outside: never closer than the true distance (no fabricated neighbors)
    assert np.all(d[~within] >= want_d[~within] - 1e-3)
    # slot ordering is ascending (consumers index the k-th NN)
    assert np.all(np.diff(d, axis=1) >= -1e-6)


def test_block_topk_windowed_query_sorted_unaffected(rng):
    """Query order must not change results (sorting queries is an efficiency
    choice; ranges are recomputed per call)."""
    from lidar_visual_odometry_tpu.ops import pallas_nn

    Q, C, K, CELL, GW = 128, 512, 3, 2.0, 32
    q = rng.normal(size=(Q, 3)).astype(np.float32) * 10
    c = rng.normal(size=(C, 3)).astype(np.float32) * 10
    mask = np.ones(C, bool)
    origin = jnp.asarray(np.array([-32.0, -32.0], np.float32))
    c_sorted, c_keys = pallas_nn.sort_by_cell(
        jnp.asarray(c), jnp.asarray(mask), origin, cell=CELL, grid_w=GW
    )

    def run(qq):
        qk = pallas_nn.cell_keys(jnp.asarray(qq), origin, cell=CELL, grid_w=GW)
        d, i = pallas_nn.block_topk_windowed(
            jnp.asarray(qq), qk, c_sorted, c_keys,
            k=K, q_tile=32, c_tile=128, grid_w=GW, interpret=True,
        )
        return np.asarray(d), np.asarray(i)

    d1, i1 = run(q)
    perm = rng.permutation(Q)
    d2, i2 = run(q[perm])
    np.testing.assert_allclose(d2, d1[perm], atol=0)
    np.testing.assert_array_equal(i2, i1[perm])
