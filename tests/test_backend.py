"""IMU preintegration + sliding-window fusion backend tests."""

import jax.numpy as jnp
import numpy as np

from lidar_visual_odometry_tpu.models import backend
from lidar_visual_odometry_tpu.ops import se3


def simulate_imu(n_steps=50, dt=0.01, accel_w=(1.0, 0.0, 0.0), omega=(0.0, 0.0, 0.2)):
    """Constant world acceleration + constant body rate; returns samples and
    the exact end state (no gravity in this synthetic world — it is added to
    the measurements the way an ideal accelerometer would report it)."""
    g_w = np.array([0.0, 0.0, -backend.GRAVITY])
    q = np.array([1.0, 0, 0, 0], np.float32)
    p = np.zeros(3)
    v = np.zeros(3)
    accels, gyros, dts = [], [], []
    aw = np.asarray(accel_w, np.float64)
    om = np.asarray(omega, np.float64)
    for _ in range(n_steps):
        R = np.asarray(se3.quat_to_matrix(jnp.asarray(q, jnp.float32)))
        # accelerometer senses specific force f = Rᵀ(a_world − g)
        accels.append(R.T @ (aw - g_w))
        gyros.append(om)
        dts.append(dt)
        # integrate truth (midpoint-free, small dt)
        p = p + v * dt + 0.5 * aw * dt * dt
        v = v + aw * dt
        dq = np.asarray(se3.so3_exp(jnp.asarray(om * dt, jnp.float32)))
        q = np.asarray(se3.quat_mul(jnp.asarray(q), jnp.asarray(dq)))
    return (
        np.asarray(accels, np.float32),
        np.asarray(gyros, np.float32),
        np.asarray(dts, np.float32),
        (q.astype(np.float32), p.astype(np.float32), v.astype(np.float32)),
    )


class TestPreintegration:
    def test_straight_line_no_rotation(self):
        accels, gyros, dts, (q, p, v) = simulate_imu(omega=(0, 0, 0))
        d = backend.preintegrate(
            jnp.asarray(accels), jnp.asarray(gyros), jnp.asarray(dts)
        )
        # delta contains gravity (preintegration is in the body frame):
        # dp = p_true + 0.5·g·t², dv = v_true + g·t with g pointing up in
        # measurements (specific force)
        t = float(dts.sum())
        g = np.array([0.0, 0.0, backend.GRAVITY])
        np.testing.assert_allclose(
            np.asarray(d.dv), v + g * t, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(d.dp), p + 0.5 * g * t * t, atol=1e-3
        )

    def test_rotation_delta(self):
        accels, gyros, dts, (q, p, v) = simulate_imu()
        d = backend.preintegrate(
            jnp.asarray(accels), jnp.asarray(gyros), jnp.asarray(dts)
        )
        sign = np.sign(np.dot(np.asarray(d.dq), q))
        np.testing.assert_allclose(np.asarray(d.dq), sign * q, atol=1e-4)


class TestGravityAlign:
    def test_aligns_tilted_accel(self):
        # body tilted: accel measured along a tilted direction
        tilt = se3.so3_exp(jnp.asarray([0.3, -0.2, 0.0], jnp.float32))
        a_body = se3.quat_rotate(
            se3.quat_conj(tilt), jnp.asarray([0.0, 0.0, 9.81], jnp.float32)
        )
        q = backend.gravity_align_init(a_body)
        a_world = se3.quat_rotate(q, a_body)
        np.testing.assert_allclose(
            np.asarray(a_world) / 9.81, [0, 0, 1], atol=1e-5
        )


class TestSolveWindow:
    def test_fuses_imu_and_odometry(self):
        """3 states on a straight constant-velocity path; noisy initial
        states must converge to the consistent trajectory."""
        dt = 0.1
        n = 10
        v_true = np.array([1.0, 0, 0], np.float32)
        # zero world acceleration: accelerometer senses −g only
        accels = np.tile([0.0, 0.0, backend.GRAVITY], (n, 1)).astype(np.float32)
        gyros = np.zeros((n, 3), np.float32)
        dts = np.full((n,), dt / n, np.float32)
        delta = backend.preintegrate(
            jnp.asarray(accels), jnp.asarray(gyros), jnp.asarray(dts)
        )
        deltas = backend.ImuDelta(
            dq=jnp.stack([delta.dq] * 2),
            dv=jnp.stack([delta.dv] * 2),
            dp=jnp.stack([delta.dp] * 2),
            dt=jnp.stack([delta.dt] * 2),
        )
        rel = se3.Pose(
            jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (2, 1)),
            jnp.tile(jnp.asarray(v_true * dt), (2, 1)),
        )
        truth_p = np.stack([v_true * dt * k for k in range(3)])
        noisy = backend.WindowState(
            q=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (3, 1)),
            p=jnp.asarray(
                truth_p + np.array(
                    [[0, 0, 0], [0.05, -0.04, 0.03], [-0.06, 0.05, -0.04]],
                    np.float32,
                )
            ),
            v=jnp.tile(jnp.asarray(v_true), (3, 1)),
        )
        solved = backend.solve_window(noisy, deltas, rel)
        np.testing.assert_allclose(np.asarray(solved.p), truth_p, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(solved.v), np.tile(v_true, (3, 1)), atol=0.05
        )
