"""Two-process `jax.distributed` smoke (SURVEY §2.2 / VERDICT round-1 #7).

Spawns two real processes over a shared CPU coordinator and runs
`scripts/multihost_smoke.py` in each: EpochLoader process sharding,
global-array batch staging, the sharded train step (cross-host gradient
all-reduce emitted by XLA), multihost Orbax save, and resume.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_smoke.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER,
             "--process-id", str(i), "--num-processes", "2",
             "--coordinator", f"localhost:{port}",
             "--output", str(tmp_path / "mh")],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
    assert "MULTIHOST_OK" in outs[0]
    # step-4 + step-6 checkpoints from train + resumed run
    assert (tmp_path / "mh" / "model").is_dir()
    assert (tmp_path / "mh_resumed" / "model").is_dir()
    # the validation path ran and drove a best-GED multihost save
    assert (tmp_path / "mh" / "best_ged").is_dir()
