# RetinaNet + NAS-FPN (reference configs/nas_fpn/
# retinanet_r50_nasfpn_crop640_50e_coco.py): NASFPN neck + SepBN head.
_base_ = "../retinanet/retinanet_r50_fpn_1x_coco.py"
model = dict(
    neck=dict(
        _delete_=True,
        type='NASFPN', stack_times=7, in_channels=[512, 1024, 2048],
        out_channels=256, start_level=1, num_outs=5),
    bbox_head=dict(type='RetinaSepBNHead', num_ins=5, norm_cfg=dict(
        type='BN', requires_grad=True)))
