"""Multirotor dynamics + simulate loop tests.

Oracles: physical invariants (hover equilibrium, free-fall, quaternion
norm) and closed-loop behavior with the SE3 controller on a MinSnap
trajectory — the same stack rotorpy wires together (simulate.py:18-140).
"""

import numpy as np

from apnerf_tpu.planning.minsnap import MinSnap
from apnerf_tpu.planning.multirotor import (
    ExitStatus,
    Multirotor,
    merge_dicts,
    quat_dot,
    sanitize_control_dic,
    simulate,
    time_exit,
)
from apnerf_tpu.planning.se3_control import SE3Control


def hover_speed(vehicle: Multirotor) -> float:
    # k_eta * n * w^2 = m g
    return np.sqrt(
        vehicle.mass * vehicle.g / (vehicle.num_rotors * vehicle.k_eta)
    )


def hover_state(vehicle):
    s = {k: np.array(v, dtype=float) for k, v in vehicle.initial_state.items()}
    s["rotor_speeds"] = np.full(vehicle.num_rotors, hover_speed(vehicle))
    return s


def test_quat_dot_zero_omega_unit_quat():
    q = np.array([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(quat_dot(q, np.zeros(3)), np.zeros(4))


def test_hover_equilibrium():
    """At hover rotor speed, vdot == wdot == 0 and the state is a fixed
    point of the integrator (up to motor-speed relaxation)."""
    veh = Multirotor()
    s = hover_state(veh)
    w_h = hover_speed(veh)
    sd = veh.statedot(s, np.full(4, w_h))
    np.testing.assert_allclose(sd["vdot"], np.zeros(3), atol=1e-9)
    np.testing.assert_allclose(sd["wdot"], np.zeros(3), atol=1e-9)
    s2 = veh.step(s, np.full(4, w_h), 1 / 500)
    np.testing.assert_allclose(s2["x"], s["x"], atol=1e-8)
    np.testing.assert_allclose(s2["v"], s["v"], atol=1e-8)
    np.testing.assert_allclose(np.linalg.norm(s2["q"]), 1.0, atol=1e-9)


def test_free_fall_acceleration():
    veh = Multirotor()
    s = hover_state(veh)
    s["rotor_speeds"] = np.zeros(4)
    sd = veh.statedot(s, np.zeros(4))
    np.testing.assert_allclose(sd["vdot"], [0, 0, -veh.g], atol=1e-9)


def test_rotor_speed_clipping():
    veh = Multirotor()
    s = hover_state(veh)
    s2 = veh.step(s, np.full(4, 1e9), 0.01)
    # commanded speeds clip at rotor_speed_max; motor first-order lag keeps
    # actual speeds at or below the max
    assert np.all(s2["rotor_speeds"] <= veh.rotor_speed_max + 1e-6)


def test_yaw_moment_direction():
    """Spinning all rotors the same way yields a net yaw moment with the
    rotor_directions sign convention."""
    veh = Multirotor()
    F, M = veh.compute_body_wrench(
        np.zeros(3), np.full(4, 1000.0), np.zeros(3)
    )
    # alternating directions (1,-1,1,-1) cancel at equal speeds
    np.testing.assert_allclose(M[2], 0.0, atol=1e-12)
    F2, M2 = veh.compute_body_wrench(
        np.zeros(3), np.array([1200.0, 1000, 1200, 1000]), np.zeros(3)
    )
    assert abs(M2[2]) > 0


def test_simulate_closed_loop_tracks_minsnap():
    """Full rotorpy-style rollout: MinSnap trajectory + SE3 feedback +
    6-DoF dynamics reaches the goal (COMPLETE or close at TIMEOUT)."""
    points = np.array([[0.0, 0, 0], [0.4, 0.2, 0.1], [0.8, 0.0, 0.2]])
    traj = MinSnap(points, v_avg=0.5)
    assert traj.initialize()
    veh = Multirotor()
    ctrl = SE3Control()
    s0 = hover_state(veh)
    t, state, control, flat, status = simulate(
        s0, veh, ctrl, traj, t_final=8.0, t_step=1 / 500
    )
    assert status in (ExitStatus.COMPLETE, ExitStatus.TIMEOUT), status
    err = np.linalg.norm(state["x"][-1] - points[-1])
    assert err < 0.1, f"final position error {err}"
    assert state["x"].shape[0] == len(t)
    # merged dict shapes
    assert control["cmd_motor_speeds"].shape == (len(t), 4)


def test_merge_and_exit_helpers():
    dicts = [{"a": np.arange(3)}, {"a": np.arange(3) + 1}]
    merged = merge_dicts(dicts)
    assert merged["a"].shape == (2, 3)
    assert time_exit(5.0, 4.0) is ExitStatus.TIMEOUT
    assert time_exit(3.0, 4.0) is None
    c = sanitize_control_dic(
        {"cmd_motor_speeds": [[1.0, 2], [3, 4]], "cmd_q": [[0, 0, 0, 1]]}
    )
    assert c["cmd_motor_speeds"].shape == (4,)
