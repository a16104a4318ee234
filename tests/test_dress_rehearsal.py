"""Day-1 real-data dress rehearsal (VERDICT r4 next #6): the full
train -> checkpoint -> decode -> sub.txt chain through the PUBLIC CLIs in
FRESH processes, against a directory of synthetic .mat sessions laid out
exactly like competitionData (train/ + test/ of per-session .mat files,
reference:utils/data_utils.py:190-199 + notebooks/submit_data.ipynb) — so
pointing the framework at the real dataset is turnkey, not a first run.

Covers both ingest routes (numpy and FK_NATIVE_PREPROC=1 when the C++ lib
is built). Subprocesses force CPU via FK_PLATFORM=cpu (the axon plugin
overrides JAX_PLATFORMS)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from tests.test_data import _write_synthetic_mat

REPO = Path(__file__).resolve().parents[1]

TINY_YAML = """\
model: franky
model_config:
  brain:
    encoder:
      window_size: 768
      n_electrodes: 256
      patch_size: 192
      dim: 16
      n_layers: 1
      head_dim: 8
      hidden_dim: 32
      n_heads: 2
      n_kv_heads: 2
      n_dec_layers: 1
      decoder_dim: 16
    n_output_tokens: 4
    output_dim: 16
    dim: 16
    n_layers: 1
    head_dim: 8
    hidden_dim: 32
    n_heads: 2
    n_kv_heads: 2
  gpt:
    block_size: 64
    vocab_size: 50304
    n_layer: 1
    n_head: 2
    n_embd: 16
train:
  batch_size: 4
  max_steps: 3
  eval_interval: 2
  warmup_iters: 0
  use_scheduler: false
  log_interval: 1
"""


def _run(cmd, cwd, env_extra=None, timeout=600):
    env = dict(os.environ)
    env["FK_PLATFORM"] = "cpu"
    # drop conftest's forced 8-device CPU topology: the rehearsal runs the
    # CLIs the way a user would on one host device (batch 4 % 8 != 0)
    flags = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        # a whitespace-only XLA_FLAGS hard-aborts XLA (F-level, CLAUDE.md)
        env.pop("XLA_FLAGS", None)
    env.update(env_extra or {})
    p = subprocess.run([sys.executable] + cmd, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert p.returncode == 0, (
        f"{' '.join(cmd)} rc={p.returncode}\n--- stdout\n{p.stdout[-3000:]}"
        f"\n--- stderr\n{p.stderr[-3000:]}")
    return p


@pytest.mark.slow          # fresh-process compiles; ~4 min per variant
@pytest.mark.parametrize("native", ["0", "1"])
def test_train_then_submit_on_competition_layout(tmp_path, native):
    if native == "1":
        from frankenstein_tpu.data import native as native_lib
        if not native_lib.available():
            pytest.skip("native preprocess lib not built")

    # competitionData layout: per-session .mat under train/ and test/
    data = tmp_path / "competitionData"
    (data / "train").mkdir(parents=True)
    (data / "test").mkdir()
    _write_synthetic_mat(data / "train" / "t12.2022.04.28.mat", n_trials=6,
                         seed=41)
    _write_synthetic_mat(data / "train" / "t12.2022.05.05.mat", n_trials=5,
                         seed=42)
    _write_synthetic_mat(data / "test" / "t12.2022.05.18.mat", n_trials=4,
                         seed=43)

    cfg_path = tmp_path / "tiny_franky.yaml"
    cfg_path.write_text(TINY_YAML)
    logs = tmp_path / "logs"
    env = {"FK_NATIVE_PREPROC": native}

    _run(["train.py", "--config", str(cfg_path), "--data", str(data),
          "--exp-name", "dress", "--save-folder", str(logs)],
         cwd=REPO, env_extra=env)

    run_dir = logs / "dress"
    # run artifacts: model config + metrics + a restorable best checkpoint
    doc = json.loads((run_dir / "model_config.json").read_text())
    assert doc["model"] == "franky"
    assert (run_dir / "metrics.jsonl").exists()
    assert any(run_dir.glob("step_*_loss_*")), "no checkpoint saved"

    sub = tmp_path / "sub.txt"
    _run(["examples/submit_data.py", "--data", str(data), "--split", "test",
          "--run-dir", str(run_dir), "--out", str(sub),
          "--beam-width", "2", "--batch-size", "4"],
         cwd=REPO, env_extra=env)

    lines = sub.read_text().splitlines()
    assert len(lines) == 4            # one prediction per held-out trial
