# Polygon-mask multi-scale 3x instance recipe (reference configs/common/
# mstrain-poly_3x_coco_instance.py).  This framework always loads masks as
# polygon-rasterised box-relative crops, so the poly variant coincides
# with mstrain_3x_coco_instance.
_base_ = "./mstrain_3x_coco_instance.py"
