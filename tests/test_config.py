"""Config system semantics tests (``_base_`` merge, ``_delete_``, dotted
overrides) — reference mmcv Config behaviours."""
import os

import pytest

from boosting_rcnn_tpu.config import Config, load_config, merge_dict


def test_merge_nested():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    ov = {"a": {"y": 5}, "c": 7}
    out = merge_dict(base, ov)
    assert out == {"a": {"x": 1, "y": 5}, "b": 3, "c": 7}


def test_delete_replaces():
    base = {"a": {"x": 1, "y": 2}}
    ov = {"a": {"_delete_": True, "z": 9}}
    out = merge_dict(base, ov)
    assert out == {"a": {"z": 9}}


def test_base_inheritance(tmp_path):
    (tmp_path / "base.py").write_text("a = dict(x=1, y=2)\nlr = 0.1\n")
    (tmp_path / "child.py").write_text(
        "_base_ = ['./base.py']\na = dict(y=3)\nextra = 'hi'\n"
    )
    cfg = load_config(str(tmp_path / "child.py"))
    assert cfg.a.x == 1 and cfg.a.y == 3
    assert cfg.lr == 0.1 and cfg.extra == "hi"


def test_multi_base_order(tmp_path):
    (tmp_path / "b1.py").write_text("v = dict(a=1, b=1)\n")
    (tmp_path / "b2.py").write_text("v = dict(b=2, c=2)\n")
    (tmp_path / "c.py").write_text("_base_ = ['./b1.py', './b2.py']\nv = dict(c=3)\n")
    cfg = load_config(str(tmp_path / "c.py"))
    assert cfg.v.to_dict() == {"a": 1, "b": 2, "c": 3}


def test_cfg_options_types():
    cfg = Config({"m": {"lr": 0.1, "name": "x", "flag": True}})
    cfg.merge_from_options(
        {"m.lr": "0.5", "m.name": "hello", "m.flag": "false", "m.steps": "[8, 11]"}
    )
    assert cfg.m.lr == 0.5
    assert cfg.m.name == "hello"
    assert cfg.m.flag is False
    assert cfg.m.steps == [8, 11]


def test_dump_round_trip(tmp_path):
    cfg = Config({"model": {"type": "FasterRCNN", "depth": 50}})
    p = tmp_path / "dump.py"
    cfg.dump(str(p))
    cfg2 = load_config(str(p))
    assert cfg2.model.to_dict() == cfg.model.to_dict()
