"""Config tree + logging utilities."""

import json
import os

from egoego_release_tpu.utils.config import (
    ExperimentConfig,
    load_config,
    save_yaml,
    to_dict,
)
from egoego_release_tpu.utils.logging import MetricLogger, profile_trace, save_run_config


def test_defaults_match_reference_run_config():
    cfg = ExperimentConfig()
    # the released stage-2 config (trainer:399-403, scripts/*.sh)
    assert cfg.stage2.d_model == 512 and cfg.stage2.n_dec_layers == 4
    assert cfg.stage2.d_k == cfg.stage2.d_v == 256
    assert cfg.stage2.timesteps == 1000 and cfg.stage2.objective == "pred_x0"
    assert cfg.headnet.window == 60 and cfg.gravitynet.window == 120
    assert cfg.train.grad_accum == 2 and cfg.train.ema_decay == 0.995


def test_load_with_overrides(tmp_path):
    cfg = load_config({"stage2": {"d_model": 64}}, overrides=[
        "train.learning_rate=0.001", "data.window=32", "logging.use_wandb=true",
    ])
    assert cfg.stage2.d_model == 64
    assert cfg.train.learning_rate == 0.001
    assert cfg.data.window == 32
    assert cfg.logging.use_wandb is True

    # yaml roundtrip
    path = os.path.join(tmp_path, "cfg.yaml")
    save_yaml(cfg, path)
    cfg2 = load_config(path)
    assert to_dict(cfg2) == to_dict(cfg)


def test_metric_logger(tmp_path):
    lg = MetricLogger(str(tmp_path))
    lg.log(1, loss=0.5)
    lg.log(2, loss=0.25, lr=1e-4)
    lg.close()
    lines = [json.loads(l) for l in open(lg.path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["lr"] == 1e-4


def test_profile_trace_noop():
    with profile_trace(""):
        pass


def test_save_run_config(tmp_path):
    path = save_run_config(ExperimentConfig(), str(tmp_path))
    assert os.path.exists(path)
    cfg = load_config(path)
    assert cfg.stage2.d_model == 512
