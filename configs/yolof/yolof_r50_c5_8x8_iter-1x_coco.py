# Reference configs/yolof/yolof_r50_c5_8x8_iter-1x_coco (iteration-based 1x: 90k steps at the same lr milestones).
_base_ = "./yolof_r50_c5_8x8_1x_coco.py"
lr_config = dict(step=[60000, 80000], by_epoch=False)
runner = dict(_delete_=True, type="IterBasedRunner", max_iters=90000)
