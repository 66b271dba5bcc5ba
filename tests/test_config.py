"""Config system: YAML loading, strictness, round-trip."""

import json

import pytest

from leccr_tpu.config import LECCRConfig, load_config, tiny_test_config


def test_production_configs_load():
    for name in ("multi30k_fr", "coco_zh", "coco_ja", "msrvtt", "vatex",
                 "multi30k_all", "multi30k_en_xlmr", "scale_vitl_32k"):
        cfg = load_config(f"configs/{name}.yaml")
        assert isinstance(cfg, LECCRConfig)
        assert cfg.model.embed_dim == 256
        assert cfg.model.temp == pytest.approx(0.07)
    video = load_config("configs/msrvtt.yaml")
    assert video.model.vision.kind == "temporal"
    assert video.model.num_queries == 2  # reference msrvtt config
    scale = load_config("configs/scale_vitl_32k.yaml")
    assert scale.parallel.negatives == "ring_fused"
    assert scale.train.batch_size_train == 32768


def test_unknown_keys_rejected():
    with pytest.raises(ValueError, match="unknown config keys"):
        LECCRConfig.from_dict({"model": {"not_a_key": 1}})


def test_json_round_trip(tmp_path):
    cfg = tiny_test_config()
    cfg.model.weight_dstl_loss = 0.25
    path = tmp_path / "cfg.json"
    cfg.save(str(path))
    back = load_config(str(path))
    assert back.model.weight_dstl_loss == 0.25
    assert json.loads(back.to_json()) == json.loads(cfg.to_json())


def test_tiny_config_overrides():
    cfg = tiny_test_config(**{"model.embed_dim": 48, "train.seed": 7})
    assert cfg.model.embed_dim == 48
    assert cfg.train.seed == 7


def test_run_cli_config_optional_for_training_tasks():
    """--config falls back to a per-task default for the training tasks
    (the reference's --model default-config resolution, run.py:125) and
    stays required for the serving/index tasks."""
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, "run.py", "--task", "serve",
         "--output_dir", "/tmp/x"],
        cwd=str(repo), capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
    assert "--config is required for --task serve" in (r.stderr + r.stdout)
