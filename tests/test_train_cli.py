"""CLI parity tests: INI driver, CSV output, reference-cfg compatibility."""

import subprocess
import sys

import pytest

TINY = """
[DEFAULT]
alg = dagger
env = FlockingRelative-v0
seed = 3
debug = False
header = reward
dt = 0.01
batch_size = 8
buffer_size = 200
updates_per_step = 10
actor_lr = 1e-4
n_train_episodes = 2
beta_coeff = 0.993
test_interval = 2
n_test_episodes = 2
k = 2
hidden_size = 8
gamma = 0.99
tau = 0.5
v_max = 3.0
comm_radius = 1.0
n_agents = 10
n_actions = 2
n_states = 6
episode_steps = 20

[run1]
seed = 4
"""


def run_cli(cfg_text, tmp_path, extra=()):
    cfg = tmp_path / "exp.cfg"
    cfg.write_text(cfg_text)
    out = subprocess.run(
        [sys.executable, "train.py", str(cfg), *extra],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root",
             "PYTHONPATH": "/root/repo"},
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_dagger_tiny_csv_output(tmp_path):
    stdout = run_cli(TINY, tmp_path)
    lines = [l for l in stdout.strip().splitlines() if l]
    assert lines[0] == "reward"
    name, mean, std = [p.strip() for p in lines[1].split(",")]
    assert name == "run1"
    float(mean), float(std)


def test_baseline_all_algs(tmp_path):
    cfg_text = TINY.replace("alg = dagger", "alg = baseline") + "\ncentralized = True\n"
    stdout = run_cli(cfg_text, tmp_path)
    assert "run1" in stdout


def test_reference_cfg_files_parse():
    """Every INI in the reference's cfg/ must parse into an ExperimentConfig."""
    import glob
    from multiagent_gnn_policies_tpu.utils.config import ExperimentConfig, load_ini

    files = glob.glob("/root/reference/cfg/*.cfg")
    if not files:
        pytest.skip("reference cfgs unavailable")
    assert len(files) >= 20
    for path in files:
        cp = load_ini(path)
        sections = cp.sections() or [cp.default_section]
        for s in sections:
            cfg = ExperimentConfig.from_section(cp[s])
            assert cfg.n_agents > 0 and cfg.k >= 1


def test_invalid_alg_fails_cleanly(tmp_path):
    cfg = tmp_path / "bad.cfg"
    cfg.write_text(TINY.replace("alg = dagger", "alg = nonsense"))
    out = subprocess.run(
        [sys.executable, "train.py", str(cfg)],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "PYTHONPATH": "/root/repo"},
        timeout=300,
    )
    assert out.returncode != 0
    assert "Invalid algorithm" in out.stderr


def test_large_trainer_routing(tmp_path):
    """trainer = large routes dagger sections through the large-N trainer
    (blocked path at tiny N on CPU); same CSV contract."""
    cfg_text = TINY.replace("n_agents = 10", "n_agents = 64") \
                   .replace("[run1]", "trainer = large\nstore_agents = 16\n\n[run1]") \
                   .replace("episode_steps = 20", "episode_steps = 8") \
                   .replace("n_test_episodes = 2", "n_test_episodes = 1") \
                   .replace("k = 2", "k = 3")
    stdout = run_cli(cfg_text, tmp_path)
    lines = [l for l in stdout.strip().splitlines() if l]
    assert lines[0] == "reward"
    name, mean, std = [p.strip() for p in lines[1].split(",")]
    assert name == "run1"
    float(mean), float(std)
