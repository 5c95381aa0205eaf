# Reference configs/ld/ld_r101_gflv1_r101dcn_fpn_coco_2x: R101 student
# distilled from an R101-DCN GFL teacher, 2x schedule, mstrain.
_base_ = "./ld_r18_gflv1_r101_fpn_coco_1x.py"

teacher_cfg = "configs/gfl/gfl_r101_fpn_dconv_c3-c5_mstrain_2x_coco.py"

model = dict(
    teacher_config=teacher_cfg,
    backbone=dict(
        type="ResNet",
        depth=101,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
    neck=dict(
        type="FPN",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        start_level=1,
        add_extra_convs="on_output",
        num_outs=5,
    ),
)
data = dict(train=dict(pipeline=dict(mstrain_range=(480, 800))))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
