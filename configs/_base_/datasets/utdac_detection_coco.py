# Reference configs/_base_/datasets/utdac_detection_coco.py — the
# canonical reference name for the UTDAC2020 COCO-json pipeline; the
# actual settings live in utdac.py (same file, historical local name).
_base_ = "./utdac.py"
