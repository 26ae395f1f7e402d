"""CLI driver regression: the train subcommand's reference-recipe knobs
(fractional save_freq checkpoints, periodic + final validation, seed,
provenance snapshot — reference train.py:71-115,189-207) on a tiny
synthetic run."""

import pytest
import json
import os
import signal
import sys
import threading


@pytest.mark.slow
def test_cli_train_driver_features(tmp_path, capsys):
    from lanegcn_tpu.cli import main

    save_dir = str(tmp_path / "run")
    stdout = sys.stdout
    try:
        main([
            "train", "--model", "lanegcn", "--data", "synthetic:8:1:4",
            "--val-data", "synthetic:4:1:4", "--epochs", "1",
            "--batch-size", "2", "--save-dir", save_dir,
            "--display-every", "2", "--seed", "3",
            "--save-freq", "0.5", "--val-every", "0.5",
        ])
    finally:
        sys.stdout = stdout  # undo the TeeLogger

    # fractional-epoch checkpoints at every save_freq boundary
    cks = sorted(f for f in os.listdir(save_dir) if f.endswith(".ckpt"))
    assert cks == ["0.500.ckpt", "1.000.ckpt"], cks

    # provenance snapshot: package source + resolved run metadata
    run = json.load(open(os.path.join(save_dir, "files", "run.json")))
    assert run["config"]["train"]["seed"] == 3
    assert os.path.isfile(
        os.path.join(save_dir, "files", "lanegcn_tpu", "cli.py")
    )

    # periodic validation at 0.5 and 1.0 epochs; no duplicate final pass
    log = open(os.path.join(save_dir, "log")).read()
    assert log.count("minADE_6") == 2, log


def test_preemption_guard_latches_and_restores():
    from lanegcn_tpu.train.preempt import PreemptionGuard

    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard(signals=(signal.SIGTERM,)) as g:
        assert not g.triggered
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.triggered
        assert g.signal_name == "SIGTERM"
    assert signal.getsignal(signal.SIGTERM) is before


@pytest.mark.slow
def test_cli_train_preempt_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-run → the driver finishes the in-flight step, writes a
    resumable checkpoint, and exits cleanly; --resume then continues from the
    fractional epoch (preemption-safety the reference lacks, SURVEY.md §5)."""
    from lanegcn_tpu.cli import main

    save_dir = str(tmp_path / "run")
    # Safety net: any SIGTERM landing outside the guard's lifetime hits this
    # no-op instead of killing the pytest process.
    prev = signal.signal(signal.SIGTERM, lambda *_: None)
    stop = threading.Event()

    def pinger():
        while not stop.wait(1.0):
            os.kill(os.getpid(), signal.SIGTERM)

    thread = threading.Thread(target=pinger, daemon=True)
    stdout = sys.stdout
    try:
        thread.start()
        # Plenty of epochs: a ping is guaranteed to land while the guard is
        # active, stopping the run long before it completes.
        main(["train", "--model", "lanegcn", "--data", "synthetic:8:1:4",
              "--epochs", "50", "--batch-size", "2", "--save-dir", save_dir,
              "--display-every", "1000"])
    finally:
        stop.set()
        thread.join()
        sys.stdout = stdout
        signal.signal(signal.SIGTERM, prev)

    cks = sorted(f for f in os.listdir(save_dir) if f.endswith(".ckpt"))
    assert cks, os.listdir(save_dir)
    log = open(os.path.join(save_dir, "log")).read()
    assert "SIGTERM: saved" in log, log
    # Far from run completion: it really was cut short.
    assert "12.000.ckpt" not in cks

    prev = signal.signal(signal.SIGTERM, lambda *_: None)
    try:
        main(["train", "--model", "lanegcn", "--data", "synthetic:8:1:4",
              "--epochs", "1", "--batch-size", "2", "--save-dir", save_dir,
              "--display-every", "1000",
              "--resume", os.path.join(save_dir, cks[-1])])
    finally:
        sys.stdout = stdout
        signal.signal(signal.SIGTERM, prev)
    assert "1.000.ckpt" in os.listdir(save_dir)


@pytest.mark.slow
def test_cli_train_resume(tmp_path):
    from lanegcn_tpu.cli import main

    save_dir = str(tmp_path / "run")
    args = ["train", "--model", "lanegcn", "--data", "synthetic:8:1:4",
            "--epochs", "1", "--batch-size", "2", "--save-dir", save_dir,
            "--display-every", "100"]
    stdout = sys.stdout
    try:
        main(args)
        args2 = list(args)
        args2[args2.index("--epochs") + 1] = "2"
        main(args2 + ["--resume", os.path.join(save_dir, "1.000.ckpt")])
    finally:
        sys.stdout = stdout
    cks = sorted(f for f in os.listdir(save_dir) if f.endswith(".ckpt"))
    assert "2.000.ckpt" in cks, cks
