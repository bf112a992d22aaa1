"""Habitat-sim 0.2.5 API contract tests (mock-based).

habitat-sim cannot be installed in this environment, so these tests pin
the exact API surface ``apnerf_tpu/sim/habitat.py`` touches — the same
surface the reference wrapper uses (``/root/reference/simulator/sim.py:15-200``):
constructor config fields, sensor uuids/types, two-agent setup, AgentState
position/rotation/sensor_states, navmesh calls, ShortestPath fields,
observation dict keys. If the facade drifts from the 0.2.5 names, these
fail without needing a habitat install (VERDICT r2 next-round #10).
"""

import sys
import types

import numpy as np
import pytest


# --------------------------------------------------------------------------
# a minimal habitat_sim 0.2.5 stand-in that RECORDS what the facade touches
# --------------------------------------------------------------------------


class _SensorType:
    COLOR = "color"
    DEPTH = "depth"
    SEMANTIC = "semantic"


class _CameraSensorSpec:
    def __init__(self):
        self.uuid = None
        self.sensor_type = None
        self.resolution = None
        self.position = [0, 0, 0]
        self.orientation = [0, 0, 0]


class _AgentConfiguration:
    def __init__(self):
        self.sensor_specifications = []


class _SimulatorConfiguration:
    def __init__(self):
        self.scene_id = ""
        self.scene_dataset_config_file = ""
        self.pbr_image_based_lighting = False


class _Configuration:
    def __init__(self, sim_cfg, agent_cfgs):
        self.sim_cfg = sim_cfg
        self.agent_cfgs = agent_cfgs


class _NavMeshSettings:
    pass


class _Quat:
    def __init__(self, w=1.0, x=0.0, y=0.0, z=0.0):
        self.w, self.x, self.y, self.z = w, x, y, z


class _SensorState:
    def __init__(self):
        self.position = np.zeros(3)
        self.rotation = _Quat()


class _AgentState:
    def __init__(self):
        self.position = np.zeros(3)
        self.rotation = _Quat()
        self.sensor_states = {
            "third_person_view": _SensorState(),
            "color_sensor": _SensorState(),
        }


class _Agent:
    def __init__(self):
        self._state = _AgentState()
        self.set_state_calls = []

    def set_state(self, state, infer_sensor_states=True):
        self.set_state_calls.append((state, infer_sensor_states))
        self._state = state

    def get_state(self):
        return self._state


class _PathFinder:
    def __init__(self):
        self.is_navigable_calls = []

    def is_navigable(self, loc):
        self.is_navigable_calls.append(np.asarray(loc))
        return True

    def get_random_navigable_point(self):
        return np.array([1.0, 0.5, 2.0])

    def find_path(self, path):
        path.points = [np.asarray(path.requested_start),
                       np.asarray(path.requested_end)]
        return True


class _ShortestPath:
    def __init__(self):
        self.requested_start = None
        self.requested_end = None
        self.points = []


class _TemplateMgr:
    def load_configs(self, path):
        raise RuntimeError("no assets in test env")  # facade must tolerate


class _Simulator:
    def __init__(self, configuration):
        self.configuration = configuration
        self.pathfinder = _PathFinder()
        self.agents = [_Agent(), _Agent()]
        self.recompute_navmesh_calls = []
        self.get_obs_calls = []
        self.trajectory_objects = []
        h, w = configuration.agent_cfgs[0].sensor_specifications[0].resolution

        self._obs = {
            0: {
                "color_sensor": np.zeros((h, w, 4), np.uint8),
                "third_person_view": np.zeros((h, w, 4), np.uint8),
            },
            1: {
                "sample_rgb_sensor": np.zeros((h, w, 4), np.uint8),
                "sample_depth_sensor": np.ones((h, w), np.float32),
                "sample_sem_sensor": np.zeros((h, w), np.int32),
            },
        }

    def initialize_agent(self, idx):
        return self.agents[idx]

    def recompute_navmesh(self, pathfinder, settings):
        self.recompute_navmesh_calls.append((pathfinder, settings))

    def get_rigid_object_manager(self):
        return types.SimpleNamespace()

    def get_object_template_manager(self):
        return _TemplateMgr()

    def get_sensor_observations(self, agent_idx):
        self.get_obs_calls.append(agent_idx)
        return self._obs[agent_idx]

    def add_trajectory_object(self, name, locations, radius=0.001):
        self.trajectory_objects.append((name, np.asarray(locations), radius))


def _install_fake_habitat(monkeypatch):
    hs = types.ModuleType("habitat_sim")
    hs.SimulatorConfiguration = _SimulatorConfiguration
    hs.CameraSensorSpec = _CameraSensorSpec
    hs.SensorType = _SensorType
    hs.Configuration = _Configuration
    hs.Simulator = _Simulator
    hs.AgentState = _AgentState
    hs.NavMeshSettings = _NavMeshSettings
    hs.ShortestPath = _ShortestPath
    hs.agent = types.SimpleNamespace(AgentConfiguration=_AgentConfiguration)

    quat_mod = types.ModuleType("quaternion")
    quat_mod.quaternion = _Quat

    monkeypatch.setitem(sys.modules, "habitat_sim", hs)
    monkeypatch.setitem(sys.modules, "quaternion", quat_mod)
    # np.quaternion is registered by numpy-quaternion on import
    monkeypatch.setattr(np, "quaternion", _Quat, raising=False)
    return hs


@pytest.fixture
def sim(monkeypatch):
    _install_fake_habitat(monkeypatch)
    from apnerf_tpu.sim.habitat import HabitatSim

    return HabitatSim("102344250", "cfg.json", 64, 48)


def test_constructor_contract(sim):
    cfg = sim._sim.configuration
    # SimulatorConfiguration fields the reference sets (sim.py:61-67)
    assert cfg.sim_cfg.scene_id == "102344250"
    assert cfg.sim_cfg.scene_dataset_config_file == "cfg.json"
    assert cfg.sim_cfg.pbr_image_based_lighting is True
    # two agents: quad (rgb + chase cam) and sampler (rgb/depth/sem)
    quad, sample = cfg.agent_cfgs
    assert [s.uuid for s in quad.sensor_specifications] == [
        "color_sensor", "third_person_view",
    ]
    assert [s.uuid for s in sample.sensor_specifications] == [
        "sample_rgb_sensor", "sample_depth_sensor", "sample_sem_sensor",
    ]
    assert [s.sensor_type for s in sample.sensor_specifications] == [
        _SensorType.COLOR, _SensorType.DEPTH, _SensorType.SEMANTIC,
    ]
    # resolution is [H, W] in habitat order
    assert quad.sensor_specifications[0].resolution == [48, 64]
    # navmesh recomputed at startup (sim.py:39-43)
    assert len(sim._sim.recompute_navmesh_calls) == 1
    # quad asset load failure tolerated (no assets here)
    assert sim.quad_obj is None


def test_sample_images_from_poses_contract(sim):
    poses = [np.array([1.0, 1.5, 2.0, 0, 0, 0, 1.0]),
             np.array([0.0, 1.5, 0.0, 0, 0.707, 0, 0.707])]
    rgbs, deps, sems = sim.sample_images_from_poses(poses)
    assert rgbs.shape == (2, 48, 64, 4) and rgbs.dtype == np.uint8
    assert deps.shape == (2, 48, 64) and deps.dtype == np.float32
    assert sems.shape == (2, 48, 64)
    # observations come from the SAMPLE agent (index 1, sim.py:186-195)
    assert sim._sim.get_obs_calls == [1, 1]
    # the quad is parked far away first (sim.py:180-181)
    quad_states = [s.position for s, _ in sim._sim.agents[0].set_state_calls]
    assert any(np.allclose(p, [999, 999, 999]) for p in quad_states)
    # sampler got normalized (w,x,y,z) rotations
    st, _ = sim._sim.agents[1].set_state_calls[-1]
    q = st.rotation
    norm = np.sqrt(q.w**2 + q.x**2 + q.y**2 + q.z**2)
    assert abs(norm - 1.0) < 1e-9


def test_navmesh_contract(sim):
    assert sim.check_navigability([np.array([1.0, 0.5, 2.0])])
    path = sim.sample_path(np.array([0.0, 1.5, 0.0]))
    # ShortestPath.requested_start/end used; points returned as array
    assert path.shape[1] == 3
    sim.add_visited_location(np.zeros((3, 3)))
    assert sim._sim.trajectory_objects[0][0] == "final1"


def test_agent_state_roundtrip(sim):
    pose = np.array([1.0, 2.0, 3.0, 0, 0.6, 0, 0.8])
    sim.set_quad_state(pose)
    out = sim.get_quad_state()
    np.testing.assert_allclose(out[:3], pose[:3])
    np.testing.assert_allclose(out[3:], pose[3:], atol=1e-9)
