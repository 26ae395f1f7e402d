"""Real multi-host training: two OS processes under jax.distributed (CPU
Gloo backend), each with 2 virtual devices, training the CLI end-to-end on a
global data=4 mesh with per-process data shards, globally-reduced display
metrics, rank-0 checkpointing, and cross-host-synced validation
(reference train.py:34-35,55-59,119-121,145-146,230-255)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(rank: int, port: int, save_dir: str, extra=()):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [
        sys.executable, "-m", "lanegcn_tpu.cli", "train",
        "--platform", "cpu",
        "--dist-coordinator", f"localhost:{port}",
        "--dist-nproc", "2", "--dist-procid", str(rank),
        "--mesh", "4",
        "--data", "synthetic:16:1:4", "--val-data", "synthetic:4:1:4",
        "--epochs", "1", "--batch-size", "2",
        "--save-dir", save_dir, "--display-every", "1",
        "--val-every", "1.0", "--seed", "7",
        *extra,
    ]
    return subprocess.Popen(
        cmd, env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    save_dir = str(tmp_path / "run")
    port = _free_port()
    procs = [_spawn(r, port, save_dir) for r in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), outs[0][-3000:] + outs[1][-3000:]

    log0 = open(os.path.join(save_dir, "log")).read()
    log1_path = os.path.join(save_dir, "log.1")
    assert os.path.isfile(log1_path)  # rank 1 logs separately

    # Rank 0 announces the global mesh + both processes.
    assert "data=4 x graph=1" in log0 and "2 process(es)" in log0

    # Display metrics print on rank 0 only (globally psum-reduced).
    assert "epoch" in log0 and "loss" in log0
    assert "loss" not in open(log1_path).read().split("exiting")[0].split("validation")[0]

    # Validation counts EVERY scenario across both hosts: 4 globally.
    assert "validation: 4 scenarios" in log0

    # Rank 0 wrote the final checkpoint; rank 1 wrote none.
    cks = [f for f in os.listdir(save_dir) if f.endswith(".ckpt")]
    assert cks == ["1.000.ckpt"], cks

    # Provenance snapshot exists exactly once (rank 0).
    assert os.path.isdir(os.path.join(save_dir, "files", "lanegcn_tpu"))


def test_initialize_distributed_forwards_manual_kwargs(monkeypatch):
    """Explicit coordinator kwargs must reach jax.distributed.initialize
    (round-1 bug: an early return made every manual setup a silent no-op),
    and explicit-setup failures must raise rather than be swallowed."""
    import jax

    from lanegcn_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    multihost.initialize_distributed(
        coordinator_address="host:1234", num_processes=2, process_id=1
    )
    assert calls == [
        {"coordinator_address": "host:1234", "num_processes": 2, "process_id": 1}
    ]

    def boom(**kw):
        raise RuntimeError("unreachable coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="unreachable"):
        multihost.initialize_distributed(
            coordinator_address="host:1234", num_processes=2, process_id=1
        )
    # ...but auto-discovery failure on a single process is the normal case.
    multihost.initialize_distributed()


def test_initialize_distributed_idempotent(monkeypatch):
    import jax

    from lanegcn_tpu.parallel import multihost

    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)

    def fail(**kw):
        raise AssertionError("must not re-initialize")

    monkeypatch.setattr(jax.distributed, "initialize", fail)
    multihost.initialize_distributed(coordinator_address="host:1", num_processes=2)
