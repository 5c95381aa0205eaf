

def test_wider_face_dataset(tmp_path):
    """WIDERFaceDataset (reference mmdet/datasets/wider_face.py): XML-style
    single-class face annotations, difficult tag optional."""
    import os

    from boosting_rcnn_tpu.data.voc import WIDERFaceDataset

    root = tmp_path / "WIDER"
    os.makedirs(root / "Annotations")
    os.makedirs(root / "JPEGImages")
    xml = """<annotation><folder>0--Parade</folder><filename>im1.jpg</filename>
    <size><width>100</width><height>80</height><depth>3</depth></size>
    <object><name>face</name>
    <bndbox><xmin>10</xmin><ymin>10</ymin><xmax>50</xmax><ymax>60</ymax></bndbox>
    </object></annotation>"""
    (root / "Annotations" / "im1.xml").write_text(xml)
    (root / "ids.txt").write_text("im1\n")
    ds = WIDERFaceDataset(str(root / "ids.txt"), str(root))
    assert ds.CLASSES == ("face",)
    assert len(ds.data_infos) == 1
    assert ds.data_infos[0]["bboxes"].shape == (1, 4)
    assert ds.data_infos[0]["labels"][0] == 0


def test_suodac_domain_map(tmp_path):
    """SUO-DAC loader (reference loading.py:87): per-domain txt name lists
    -> one-hot domain label; unknown stems default to domain 0."""
    import numpy as np

    from boosting_rcnn_tpu.data.suodac import DomainMap

    d = tmp_path / "domains"
    d.mkdir()
    (d / "type1.txt").write_text("img_a\nimg_b\n")
    (d / "type2.txt").write_text("img_c\n")
    m = DomainMap(str(d))
    assert m.num_domains == 2
    assert m.domain_of("/data/img_c.jpg") == 1
    assert m.domain_of("/data/img_a.png") == 0
    assert m.domain_of("/data/unknown.jpg") == 0
    np.testing.assert_array_equal(m.one_hot("x/img_c.jpg"), [0.0, 1.0])


def test_suodac_domain_map_json(tmp_path):
    """DomainMap also accepts the json layout the dataset base config
    declares (configs/_base_/datasets/suodac_detection.py:
    annotations/domains.json) — both {"domain": [stems]} and
    {"stem": domain_id} shapes."""
    import json

    import numpy as np

    from boosting_rcnn_tpu.data.suodac import DomainMap

    by_domain = tmp_path / "domains_lists.json"
    by_domain.write_text(json.dumps(
        {"type1": ["img_a", "img_b"], "type2": ["img_c"]}))
    m = DomainMap(str(by_domain))
    assert m.num_domains == 2
    assert m.domain_of("x/img_c.jpg") == 1
    np.testing.assert_array_equal(m.one_hot("x/img_a.png"), [1.0, 0.0])

    by_stem = tmp_path / "domains_map.json"
    by_stem.write_text(json.dumps({"img_a": 0, "img_b": 0, "img_c": 1}))
    m2 = DomainMap(str(by_stem))
    assert m2.num_domains == 2
    assert m2.domain_of("x/img_c.jpg") == 1
    assert m2.domain_of("x/unknown.jpg") == 0


def test_cityscapes_dataset_and_protocol(tmp_path):
    """Cityscapes dataset (reference datasets/cityscapes.py): 8 thing
    classes, official instance dump format, cityscapes metric."""
    import json

    import numpy as np

    from boosting_rcnn_tpu.data.cityscapes import CityscapesDataset

    ann = dict(
        images=[dict(id=1, file_name="munich_000001.png", width=64,
                     height=48)],
        annotations=[dict(
            id=1, image_id=1, category_id=1, bbox=[10, 10, 20, 16],
            area=320, iscrowd=0,
            segmentation=[[10, 10, 30, 10, 30, 26, 10, 26]])],
        categories=[dict(id=1, name="person"), dict(id=2, name="car")],
    )
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    ds = CityscapesDataset(str(p), classes=("person", "car"))
    assert len(ds.data_infos) == 1

    dets = np.array([[10.0, 10.0, 30.0, 26.0, 0.9]], np.float32)
    labels = np.array([0], np.int64)
    masks = np.ones((1, 28, 28), np.float32)
    results = [(dets, labels, masks)]
    out = ds.evaluate(results, metric="cityscapes",
                      outfile_prefix=str(tmp_path / "dump"))
    assert out["cityscapes_mAP"] > 0.5
    txt = tmp_path / "dump" / "munich_000001_pred.txt"
    assert txt.exists()
    line = txt.read_text().strip().split()
    assert line[1] == "24" and float(line[2]) == 0.9  # person -> labelId 24
    import cv2

    png = cv2.imread(str(tmp_path / "dump" / line[0]), 0)
    assert png.shape == (48, 64) and (png > 0).sum() > 200


def test_cityscapes_converter(tmp_path):
    """tools/dataset_converters/cityscapes.py: polygons json -> COCO json
    with group->iscrowd handling."""
    import json
    import subprocess
    import sys

    root = tmp_path / "cs"
    d = root / "gtFine" / "val" / "munich"
    d.mkdir(parents=True)
    ann = dict(
        imgWidth=100, imgHeight=80,
        objects=[
            dict(label="car", polygon=[[10, 10], [40, 10], [40, 30],
                                       [10, 30]]),
            dict(label="persongroup", polygon=[[50, 50], [70, 50],
                                               [70, 70]]),
            dict(label="sky", polygon=[[0, 0], [100, 0], [100, 10]]),
        ])
    (d / "munich_000000_000019_gtFine_polygons.json").write_text(
        json.dumps(ann))
    out = tmp_path / "ann"
    r = subprocess.run(
        [sys.executable, "tools/dataset_converters/cityscapes.py",
         str(root), "--out-dir", str(out), "--splits", "val"],
        capture_output=True, text=True, cwd=REPO if 'REPO' in dir() else '.')
    assert r.returncode == 0, r.stderr
    data = json.loads(
        (out / "instancesonly_filtered_gtFine_val.json").read_text())
    assert len(data["images"]) == 1
    assert len(data["annotations"]) == 2  # sky skipped
    car = data["annotations"][0]
    assert car["bbox"] == [10, 10, 30, 20]
    assert abs(car["area"] - 600.0) < 1e-6
    grp = data["annotations"][1]
    assert grp["iscrowd"] == 1
