import pytest

from vgqa_tpu.config import build_default_cfg


def test_defaults_match_reference_knobs():
    cfg = build_default_cfg()
    assert cfg.INPUT.MAX_QUERY_LEN == 26
    assert cfg.INPUT.TRAIN_SAMPLE_NUM == 64
    assert cfg.MODEL.VSTG.HIDDEN == 256
    assert cfg.MODEL.VSTG.ENC_LAYERS == 6
    assert cfg.SOLVER.BBOX_COEF == 5
    assert cfg.SOLVER.EOS_COEF == 0.1


def test_merge_reference_yaml(tmp_path):
    """The reference's shipped YAML schema must merge cleanly."""
    yaml_text = """
OUTPUT_DIR: out/
INPUT:
  RESOLUTION: 420
  TRAIN_SAMPLE_NUM: 64
MODEL:
  VSTG:
    FROM_SCRATCH: True
SOLVER:
  BASE_LR: 2e-4
  SCHEDULE:
    TYPE: multistep_with_warmup_all
    DROP_STEP: [9, 11]
"""
    p = tmp_path / "c.yaml"
    p.write_text(yaml_text)
    cfg = build_default_cfg()
    cfg.merge_from_file(str(p))
    assert cfg.INPUT.RESOLUTION == 420
    assert cfg.SOLVER.BASE_LR == 2e-4
    assert cfg.SOLVER.SCHEDULE.DROP_STEP == [9, 11]


def test_merge_from_list_and_freeze():
    cfg = build_default_cfg()
    cfg.merge_from_list(["SOLVER.BASE_LR", "1e-4", "INPUT.RESOLUTION", "224"])
    assert cfg.SOLVER.BASE_LR == 1e-4
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    clone = cfg.clone()
    clone.defrost()
    clone.SOLVER.BASE_LR = 5e-5
    assert cfg.SOLVER.BASE_LR == 1e-4


def test_unknown_key_rejected():
    cfg = build_default_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["SOLVER.NOT_A_KEY", "1"])


def test_dump_roundtrip(tmp_path):
    cfg = build_default_cfg()
    p = tmp_path / "dump.yaml"
    p.write_text(cfg.dump())
    cfg2 = build_default_cfg()
    cfg2.merge_from_file(str(p))
    assert cfg2.to_dict() == cfg.to_dict()
