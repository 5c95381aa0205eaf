"""End-to-end CLI integration: real files on disk -> train 2 iters -> test
CLI eval (the reference's workflow 'train.py then test.py').  Uses a tiny
generated COCO dataset with actual jpg images so the full loader path
(cv2/native preprocess, bucketing, padded GT) is exercised."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("tinycoco")
    img_dir = root / "imgs"
    img_dir.mkdir()
    rs = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(6):
        h, w = 120, 160
        img = (rs.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"img_{i}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})
        for _ in range(rs.randint(1, 4)):
            x, y = rs.randint(0, 100), rs.randint(0, 70)
            bw, bh = rs.randint(20, 50), rs.randint(20, 40)
            annotations.append(
                {
                    "id": aid,
                    "image_id": i + 1,
                    "category_id": rs.randint(1, 5),
                    "bbox": [int(x), int(y), int(bw), int(bh)],
                    "area": int(bw * bh),
                    "iscrowd": 0,
                }
            )
            aid += 1
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": c + 1, "name": n}
            for c, n in enumerate(["echinus", "holothurian", "scallop", "starfish"])
        ],
    }
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(img_dir) + "/"


@pytest.fixture(scope="module")
def tiny_config(tiny_dataset, tmp_path_factory):
    ann, imgs = tiny_dataset
    cfg_dir = tmp_path_factory.mktemp("cfg")
    cfg = cfg_dir / "tiny.py"
    base = os.path.join(REPO, "configs/boosting_rcnn/boosting_rcnn_r50_pafpn_1x_utdac.py")
    cfg.write_text(
        f"""
_base_ = [{base!r}]
data = dict(
    samples_per_gpu=2,
    train=dict(ann_file={ann!r}, img_prefix={imgs!r},
               pipeline=dict(scale=(160, 128), keep_ratio=True, flip_prob=0.5,
                             canvas=(128, 160), max_gt=10)),
    val=dict(ann_file={ann!r}, img_prefix={imgs!r},
             pipeline=dict(scale=(160, 128), keep_ratio=True, canvas=(128, 160))),
    test=dict(ann_file={ann!r}, img_prefix={imgs!r},
              pipeline=dict(scale=(160, 128), keep_ratio=True, canvas=(128, 160))),
)
runner = dict(max_epochs=1)
"""
    )
    return str(cfg)


def _run(cmd, timeout=600):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    return subprocess.run(
        [sys.executable] + cmd, cwd=REPO, capture_output=True, text=True,
        timeout=timeout, env=env,
    )


@pytest.mark.slow
def test_train_then_test_cli(tiny_config, tmp_path):
    wd = str(tmp_path / "wd")
    r = _run(
        ["tools/train.py", tiny_config, "--tiny", "--iters", "2",
         "--work-dir", wd, "--no-validate"]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(wd, "train.log.json"))
    assert os.path.exists(os.path.join(wd, "config_dump.py"))

    r2 = _run(["tools/test.py", tiny_config, "--tiny", "--eval", "bbox"])
    assert r2.returncode == 0, r2.stderr[-3000:]
    line = [l for l in r2.stdout.strip().splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert "bbox_mAP" in metrics
