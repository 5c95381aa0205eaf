# Reference configs/solo/decoupled_solo_r50_fpn_1x_coco (separate x/y mask branches).
_base_ = "./solo_r50_fpn_1x_coco.py"
model = dict(mask_head=dict(type="DecoupledSOLOHead"))
