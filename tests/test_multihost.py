"""Multi-process mesh bootstrap (parallel/distributed.py): a 2-process CPU
run must form one 8-device global mesh and execute the sharded rollout and
training round unchanged — the CI-runnable form of the SURVEY §2.11
multi-host (DCN) commitment."""

import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_demo():
    port = _free_port()
    env = {
        "PATH": "/usr/bin:/bin", "HOME": "/root", "PYTHONPATH": REPO,
        "MAGNN_PLATFORM": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts", "multihost_demo.py"),
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--n-agents", "256"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    oks = [re.search(r"MULTIHOST_OK (.*)", o) for o in outs]
    assert all(oks), outs
    # both ranks must report the same global numbers over 8 devices
    fields = [dict(kv.split("=") for kv in m.group(1).split()) for m in oks]
    assert fields[0]["devices"] == fields[1]["devices"] == "8"
    assert fields[0]["psum"] == fields[1]["psum"] == "36.0"
    assert fields[0]["rollout"] == fields[1]["rollout"]
    assert fields[0]["round_reward"] == fields[1]["round_reward"]


def test_maybe_initialize_noop_without_env(monkeypatch):
    from multiagent_gnn_policies_tpu.parallel import distributed

    for var in ("MAGNN_COORDINATOR", "MAGNN_NUM_PROCESSES",
                "MAGNN_PROCESS_ID", "MAGNN_AUTO_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.maybe_initialize_distributed() is False
