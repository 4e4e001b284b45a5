"""JSONL metrics logging (utils/logging.py) — the air-gapped history path."""

import json
import os

import numpy as np

from efficientat_tpu.utils.logging import MetricsLogger


def test_jsonl_history_and_config(tmp_path, capsys):
    run = str(tmp_path / "run")
    lg = MetricsLogger("proj", config={"lr": 1e-3, "model": "mn10_as"},
                       run_dir=run, use_wandb="no")
    lg.log({"loss": np.float32(0.5), "mAP": 0.25}, step=0)
    lg.log({"loss": 0.4}, step=1)
    lg.close()

    lines = [json.loads(l) for l in open(os.path.join(run, "metrics.jsonl"))]
    assert [l["_step"] for l in lines] == [0, 1]
    assert abs(lines[0]["loss"] - 0.5) < 1e-6  # numpy scalars coerced
    cfg = json.load(open(os.path.join(run, "config.json")))
    assert cfg["model"] == "mn10_as"
    out = capsys.readouterr().out
    assert "loss=0.5000" in out and "[1]" in out


def test_append_across_sessions(tmp_path):
    run = str(tmp_path / "run")
    for i in range(2):  # resume appends, never truncates
        lg = MetricsLogger("p", run_dir=run, use_wandb="no")
        lg.log({"epoch": i})
        lg.close()
    lines = open(os.path.join(run, "metrics.jsonl")).readlines()
    assert len(lines) == 2


def test_profiling_trace_and_time_fn(tmp_path):
    """utils/profiling smoke: trace writes files; time_fn returns sane time."""
    import glob

    import jax
    import jax.numpy as jnp

    from efficientat_tpu.utils.profiling import time_fn, trace

    f = jax.jit(lambda x: jnp.sum(x * x))
    x = jnp.ones((256, 256))
    with trace(str(tmp_path / "tr")):
        float(f(x))
    assert glob.glob(str(tmp_path / "tr" / "**" / "*"), recursive=True)

    dt = time_fn(f, x, iters=3)
    assert 0 < dt < 5.0
