"""Config serialization: nested from_dict round-trips, YAML files parse to
the intended model configs, hashability (jit statics) survives."""

from pathlib import Path

import pytest

from frankenstein_tpu import config as cfg_lib

CONFIGS = Path(__file__).resolve().parents[1] / "configs"


def test_nested_round_trip():
    c = cfg_lib.FrankyConfig()
    r = cfg_lib.FrankyConfig.from_dict(c.to_dict())
    assert isinstance(r.brain, cfg_lib.PerceiverConfig)
    assert isinstance(r.brain.encoder, cfg_lib.MAEConfig)
    assert isinstance(r.gpt, cfg_lib.GPTConfig)
    assert r == c
    assert hash(r) == hash(c)          # jit-static safe


def test_json_round_trip_tuples():
    c = cfg_lib.VQVAEConfig(strides=(2, 2))
    r = cfg_lib.VQVAEConfig.from_json(c.to_json())
    assert r.strides == (2, 2) and isinstance(r.strides, tuple)
    assert hash(r) == hash(c)


@pytest.mark.parametrize("name", ["franky", "mae", "vqvae", "simple_mae"])
def test_yaml_configs_parse(name):
    import yaml

    import train as train_cli
    doc = yaml.safe_load((CONFIGS / f"{name}.yaml").read_text())
    model, cfg = train_cli.config_from_yaml(doc)
    assert model == name
    assert "train" in doc
    tc = cfg_lib.TrainConfig.from_dict(doc["train"])
    assert tc.batch_size == 256


def test_franky_llama_yaml_parses():
    import yaml

    import train as train_cli
    from frankenstein_tpu.models.franky import FrankyLlamaConfig
    doc = yaml.safe_load((CONFIGS / "franky_llama.yaml").read_text())
    model, cfg = train_cli.config_from_yaml(doc)
    assert model == "franky-llama"
    assert isinstance(cfg, FrankyLlamaConfig)
    assert cfg.brain.output_dim == cfg.lm.dim == 1024
    r = FrankyLlamaConfig.from_dict(cfg.to_dict())
    assert r == cfg and hash(r) == hash(cfg)


def test_franky_yaml_is_the_flagship():
    """configs/franky.yaml reproduces the flagship geometry exactly
    (reference:franky_baseline_gpt2.ipynb cell 5)."""
    import yaml

    import train as train_cli
    doc = yaml.safe_load((CONFIGS / "franky.yaml").read_text())
    _, cfg = train_cli.config_from_yaml(doc)
    flagship = cfg_lib.FrankyConfig(
        brain=cfg_lib.PerceiverConfig(
            encoder=cfg_lib.MAEConfig(window_size=768, patch_size=32),
            n_output_tokens=32, output_dim=768),
        gpt=cfg_lib.GPTConfig())
    assert cfg == flagship
    assert cfg.brain.encoder.block_size == 6144
