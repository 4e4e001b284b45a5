"""End-to-end train/evaluate CLI smoke tests on synthetic data (CPU, tiny)."""

import os

import numpy as np
import pytest

from efficientat_tpu.train.cli import run_evaluate, run_train


def test_train_esc50_synthetic_roundtrip(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    weights = str(tmp_path / "w.msgpack")
    argv = ["--synthetic", "6", "--batch_size", "3", "--n_epochs", "1",
            "--model_width", "0.1", "--num_workers", "2",
            "--ckpt_dir", ckpt, "--export", weights]
    state = run_train("esc50", argv)
    assert int(state.step) == 2  # 6 clips / batch 3 = 2 steps
    assert os.path.exists(weights)

    # resume continues the epoch counter
    state2 = run_train("esc50", argv[:-2] + ["--resume", "--n_epochs", "2"])
    assert int(state2.step) == 4

    metrics = run_evaluate("esc50", ["--synthetic", "6", "--batch_size", "3",
                                     "--model_width", "0.1", "--num_workers", "2",
                                     "--weights", weights])
    assert "accuracy" in metrics and np.isfinite(metrics["val_loss"])


def test_train_openmic_masked_synthetic(tmp_path):
    metrics_state = run_train(
        "openmic", ["--synthetic", "4", "--batch_size", "2", "--n_epochs", "1",
                    "--model_width", "0.1", "--num_workers", "1",
                    "--ckpt_dir", str(tmp_path / "c")])
    assert int(metrics_state.step) == 2


def test_train_dcase_mixstyle_synthetic(tmp_path):
    state = run_train(
        "dcase20", ["--synthetic", "4", "--batch_size", "2", "--n_epochs", "1",
                    "--model_width", "0.1", "--num_workers", "1",
                    "--mixstyle_p", "0.5",
                    "--ckpt_dir", str(tmp_path / "c")])
    assert int(state.step) == 2
