import pytest

from demo2_tpu.config import get_cfg_defaults


def test_defaults_match_reference_knobs():
    cfg = get_cfg_defaults()
    assert cfg.MODEL.ARCH == "DeMo"
    assert cfg.MODEL.USE_FRCA is None  # tri-state default
    assert cfg.MODEL.SDTPS_LOSS_WEIGHT == 2.0
    assert cfg.SOLVER.STEPS == (40, 70)
    assert cfg.TEST.MISS == "None"
    assert cfg.INPUT.SIZE_TRAIN == (256, 128)


def test_merge_from_list_and_freeze():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["MODEL.USE_SDTPS", "True", "SOLVER.BASE_LR", "0.00035"])
    assert cfg.MODEL.USE_SDTPS is True
    assert cfg.SOLVER.BASE_LR == 0.00035
    cfg.merge_from_list(["MODEL.USE_FRCA", "False"])
    assert cfg.MODEL.USE_FRCA is False
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.USE_SDTPS = False


def test_merge_reference_yaml(tmp_path):
    # A reference-style YAML (subset of configs/RGBNT201/DeMo.yml knobs).
    y = tmp_path / "demo.yml"
    y.write_text(
        """
MODEL:
  TRANSFORMER_TYPE: 'ViT-B-16'
  STRIDE_SIZE: [16, 16]
  SIE_CAMERA: True
  DIRECT: 1
  HDM: True
  ATM: True
  USE_SDTPS: False
INPUT:
  SIZE_TRAIN: [256, 128]
SOLVER:
  OPTIMIZER_NAME: 'Adam'
  BASE_LR: 0.00035
  IMS_PER_BATCH: 64
"""
    )
    cfg = get_cfg_defaults()
    cfg.merge_from_file(str(y))
    assert cfg.MODEL.TRANSFORMER_TYPE == "ViT-B-16"
    assert cfg.MODEL.STRIDE_SIZE == (16, 16)
    assert cfg.MODEL.HDM and cfg.MODEL.ATM
    assert cfg.SOLVER.IMS_PER_BATCH == 64


def test_unknown_key_raises(tmp_path):
    y = tmp_path / "bad.yml"
    y.write_text("MODEL:\n  NOT_A_KEY: 1\n")
    cfg = get_cfg_defaults()
    with pytest.raises(KeyError):
        cfg.merge_from_file(str(y))


def test_coerce_strictness_and_str_verbatim():
    """Review round 4: type-mismatched overrides must raise at merge time
    (yacs semantics), and str knobs keep their strings VERBATIM ('None',
    '0' are values, not literals)."""
    import pytest

    from demo2_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.merge_from_list(["TEST.MISS", "None", "MODEL.DEVICE_ID", "0"])
    assert cfg.TEST.MISS == "None" and isinstance(cfg.TEST.MISS, str)
    assert cfg.MODEL.DEVICE_ID == "0" and isinstance(cfg.MODEL.DEVICE_ID, str)

    with pytest.raises(TypeError):  # non-integral float into an int knob
        get_cfg_defaults().merge_from_list(["SOLVER.MAX_EPOCHS", "2.5"])
    with pytest.raises(TypeError):  # scalar into a tuple knob
        get_cfg_defaults().merge_from_list(["INPUT.SIZE_TRAIN", "256"])
    # Integral float -> int still coerces (yacs-style).
    cfg2 = get_cfg_defaults()
    cfg2.merge_from_list(["SOLVER.MAX_EPOCHS", "4.0"])
    assert cfg2.SOLVER.MAX_EPOCHS == 4 and isinstance(cfg2.SOLVER.MAX_EPOCHS, int)


def test_yaml_bool_into_str_knob_raises(tmp_path):
    """Review round 4: YAML 1.1 parses unquoted on/off/yes/no as booleans.
    Storing the bool into a str-enum knob silently flips its meaning
    (`TPU.INT8_MLP: off` -> False would ENABLE int8), so merge must raise
    with a quote-the-value hint — except DATALOADER.NATIVE_DECODE, whose
    consumer documents and normalizes bool input."""
    import pytest

    from demo2_tpu.config import get_cfg_defaults

    y = tmp_path / "unquoted.yml"
    y.write_text("TPU:\n  INT8_MLP: off\n")
    with pytest.raises(TypeError, match="quote"):
        get_cfg_defaults().merge_from_file(str(y))

    y2 = tmp_path / "smooth.yml"
    y2.write_text("MODEL:\n  IF_LABELSMOOTH: on\n")
    with pytest.raises(TypeError, match="quote"):
        get_cfg_defaults().merge_from_file(str(y2))

    # Quoted spelling works, and the whitelisted knob accepts bools.
    y3 = tmp_path / "ok.yml"
    y3.write_text(
        "MODEL:\n  IF_LABELSMOOTH: 'on'\nDATALOADER:\n  NATIVE_DECODE: on\n"
    )
    cfg = get_cfg_defaults()
    cfg.merge_from_file(str(y3))
    assert cfg.MODEL.IF_LABELSMOOTH == "on"
    assert cfg.DATALOADER.NATIVE_DECODE is True  # loader normalizes to 'on'


def test_apply_overrides_type_coercion():
    """Shared --set parser (bench.py / tools/quality_gate.py)."""
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.config.presets import apply_overrides

    cfg = get_cfg_defaults()
    seen = []
    apply_overrides(
        cfg,
        ["TPU.BF16_SECOND_MOMENT=true", "SOLVER.BASE_LR=0.001",
         "SOLVER.IMS_PER_BATCH=32", "MODEL.DGAF_VERSION=v4",
         "TPU.USE_FLASH_ATTENTION=off"],
        log=seen.append,
    )
    assert cfg.TPU.BF16_SECOND_MOMENT is True
    assert cfg.SOLVER.BASE_LR == 0.001
    assert cfg.SOLVER.IMS_PER_BATCH == 32
    assert cfg.MODEL.DGAF_VERSION == "v4"
    assert cfg.TPU.USE_FLASH_ATTENTION is False
    assert len(seen) == 5
