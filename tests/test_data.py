

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
