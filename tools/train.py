#!/usr/bin/env python
"""Training CLI — mirrors the reference's ``tools/train.py`` surface:

    python tools/train.py <config> [--work-dir D] [--resume-from CKPT]
        [--seed N] [--cfg-options k=v ...]

plus TPU-native extras: ``--fake-data`` (synthetic batches for smoke),
``--iters N`` (cap steps), ``--tiny`` (shrunken model for CPU dev).

The mmcv Runner/hook machinery collapses into a plain epoch loop around one
jitted train step on a data mesh (SURVEY.md §7 design stance).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument(
        "--cfg-options", nargs="*", default=[], help="override config, key=val"
    )
    p.add_argument("--fake-data", action="store_true")
    p.add_argument("--iters", type=int, default=None, help="cap total steps")
    p.add_argument("--tiny", action="store_true", help="shrink model (dev)")
    p.add_argument(
        "--steps-per-dispatch", type=int, default=1,
        help="optimizer steps per device dispatch (lax.scan over stacked "
        "batches; amortizes host dispatch overhead — see "
        "engine.train.make_multi_step_train)")
    p.add_argument("--no-validate", action="store_true")
    return p.parse_args()


def shrink_model(mc):
    if mc["backbone"].get("type") in (None, "ResNet", "ResNeXt", "Res2Net"):
        mc["backbone"].update(type="ResNet", depth=18, base_channels=8)
    if mc.get("type") == "YOLOX":
        mc["backbone"].update(widen_factor=0.125)
        mc["neck"].update(out_channels=32)
        mc["bbox_head"].update(feat_channels=32)
        return mc
    if isinstance(mc.get("neck"), list):  # stacked necks (e.g. FPN + BFP)
        mc["neck"][0].update(in_channels=[8, 16, 32, 64], out_channels=32)
        if "rpn_head" in mc:
            mc["rpn_head"].update(feat_channels=32)
        bh = mc["roi_head"]["bbox_head"]
        for h in bh if isinstance(bh, list) else [bh]:
            h["fc_out_channels"] = 64
        mc["train_cfg"]["rpn_proposal"].update(nms_pre=200, max_per_img=64)
        rcnn = mc["train_cfg"]["rcnn"]
        for rc in rcnn if isinstance(rcnn, list) else [rcnn]:
            rc.setdefault("sampler", {})["num"] = 32
        mc["test_cfg"]["rpn"].update(nms_pre=100, max_per_img=32)
        return mc
    if mc.get("neck", {}).get("type") == "CTResNetNeck":  # CenterNet
        mc["neck"]["num_deconv_filters"] = (16, 16, 16)
        mc["bbox_head"].update(feat_channel=16)
        return mc
    if "neck" in mc:
        mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=32)
    if mc.get("type") == "SparseRCNN":
        mc["rpn_head"].update(num_proposals=20, proposal_feature_channel=16)
        mc["roi_head"].update(num_stages=2, proposal_feature_channel=16)
        mc["neck"]["out_channels"] = 16
        for h in mc["roi_head"]["bbox_head"]:
            h.update(in_channels=16, feedforward_channels=32)
        return mc
    if "rpn_head" in mc:
        mc["rpn_head"].update(feat_channels=32, stacked_convs=2)
    elif "bbox_head" in mc:
        mc["bbox_head"].update(feat_channels=32)
        if "stacked_convs" in mc["bbox_head"]:
            mc["bbox_head"]["stacked_convs"] = 2
    if "roi_head" in mc:
        bh = mc["roi_head"]["bbox_head"]
        for h in bh if isinstance(bh, list) else [bh]:
            h["fc_out_channels"] = 64
        mc["train_cfg"]["rpn_proposal"].update(nms_pre=200, max_per_img=64)
        rcnn = mc["train_cfg"]["rcnn"]
        for rc in rcnn if isinstance(rcnn, list) else [rcnn]:
            rc["sampler"]["num"] = 32
        mc["test_cfg"]["rpn"].update(nms_pre=100, max_per_img=32)
    elif "nms_pre" in (mc.get("test_cfg") or {}):
        mc["test_cfg"]["nms_pre"] = 100
    return mc


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.builder import build_dataset
    from boosting_rcnn_tpu.data.loader import DetDataLoader, FakeDetLoader
    from boosting_rcnn_tpu.engine.checkpoint import restore_checkpoint, save_checkpoint
    from boosting_rcnn_tpu.engine.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
        step_lr_schedule,
    )
    from boosting_rcnn_tpu.parallel.mesh import (
        batch_sharding,
        create_mesh,
        init_distributed,
        replicated,
        shard_batch,
    )
    from boosting_rcnn_tpu.utils.logging import (
        JsonLogWriter,
        collect_env,
        get_root_logger,
    )

    from boosting_rcnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    init_distributed()
    cfg = load_config(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    # plugin modules (reference ``custom_imports`` + ``tools/train.py:94-96``)
    ci = cfg.get("custom_imports")
    if ci:
        import importlib

        for mod in ci.get("imports", []):
            importlib.import_module(mod)

    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0]
    )
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(os.path.join(work_dir, "train.log"))
    jlog = JsonLogWriter(os.path.join(work_dir, "train.log.json"))
    logger.info(f"env: {collect_env()}")
    cfg.dump(os.path.join(work_dir, "config_dump.py"))

    dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else jnp.float32
    mc = cfg.model.to_dict()
    if args.tiny:
        mc = shrink_model(mc)
        # shrunk dev models default to f32, but an EXPLICIT compute_dtype
        # must stick (the bf16 e2e acceptance runs the tiny graph in bf16)
        if cfg.get("compute_dtype") is None:
            dtype = jnp.float32
    det = build_detector(mc, dtype=dtype)

    data_cfg = cfg.data.to_dict()
    pipeline = data_cfg["train"].get("pipeline", {})
    canvas = tuple(pipeline.get("canvas", (800, 1344)))
    if args.tiny:
        canvas = (128, 160)
    batch_per_host = data_cfg.get("samples_per_gpu", 2) * jax.local_device_count()

    if "roi_head" in mc:
        bh = mc["roi_head"]["bbox_head"]
        num_classes = (bh[0] if isinstance(bh, list) else bh)["num_classes"]
    elif "bbox_head" in mc:
        num_classes = mc["bbox_head"]["num_classes"]
    else:
        num_classes = 1  # RPN-only: class-agnostic proposals
    # HTC's fused semantic branch / PanopticFPN's stuff head train against
    # per-pixel rasters — thread them through the loader when configured
    with_semantic = bool(
        mc.get("roi_head", {}).get("semantic_head")
        or mc.get("semantic_head")
    )
    if args.fake_data:
        loader = FakeDetLoader(
            batch_size=batch_per_host,
            canvas=canvas,
            num_classes=num_classes,
            num_batches=args.iters or 10,
            seed=args.seed,
            with_masks=bool(mc.get("roi_head", {}).get("mask_head")),
            with_semantic=with_semantic,
            num_domains=(mc.get("num_domains", 2)
                         if mc.get("type") == "DGFasterRCNN" else 0),
            jigsaw=(mc.get("jig_classes", 31)
                    if mc.get("type") == "JiGENFasterRCNN" else 0),
        )
        steps_per_epoch = len(loader)
        val_ds = None
    else:
        train_ds = build_dataset(data_cfg["train"])
        loader = DetDataLoader(
            train_ds,
            batch_size=batch_per_host,
            canvas=canvas,
            train=True,
            flip_prob=pipeline.get("flip_prob", 0.5),
            max_gt=pipeline.get("max_gt", 100),
            seed=args.seed,
            num_shards=jax.process_count(),
            shard_id=jax.process_index(),
            mstrain_range=pipeline.get("mstrain_range"),
            with_masks=bool(mc["roi_head"].get("mask_head"))
            if "roi_head" in mc
            else False,
            mosaic_prob=pipeline.get("mosaic_prob", 0.0),
            mixup_prob=pipeline.get("mixup_prob", 0.0),
            autoaugment=pipeline.get("autoaugment", False),
            lsj_range=pipeline.get("lsj_range"),
            ssd_aug=pipeline.get("ssd_aug", False),
            albu=pipeline.get("albu"),
            instaboost=pipeline.get("instaboost"),
            img_norm=pipeline.get("img_norm"),
            # domain labels: pipeline key, falling back to the dataset-level
            # key (configs/_base_/datasets/suodac_detection.py declares it
            # at data.train.domain_file)
            domain_file=(pipeline.get("domain_file")
                         or data_cfg["train"].get("domain_file")),
            jigsaw=pipeline.get("jigsaw"),
            dgaug=pipeline.get("dgaug", False),
            with_semantic=with_semantic,
            semantic_stride=pipeline.get("semantic_stride", 8),
        )
        steps_per_epoch = max(len(loader), 1)
        val_ds = None
        if not args.no_validate:
            val_ds = build_dataset(data_cfg["val"], test_mode=True)
        logger.info(f"train dataset: {len(train_ds)} imgs, {steps_per_epoch} steps/epoch")

    max_epochs = cfg.get("runner", {}).get("max_epochs", 12)
    opt = cfg.optimizer.to_dict()
    lrc = cfg.lr_config.to_dict()
    grad_clip = (cfg.get("optimizer_config", {}) or {}).get("grad_clip") or {}

    variables = det.init(jax.random.PRNGKey(args.seed), canvas)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    logger.info(f"model params: {n_params/1e6:.2f}M, canvas {canvas}")
    anchors, nla = det.anchors_for(canvas)

    # custom hooks (reference custom_hooks list).  Known-supported hooks
    # are wired below; hooks whose semantics are inherent to this runtime
    # (deterministic loader seeding / global batch stats under pjit) are
    # accepted as no-ops; anything else raises (repo convention).
    ema_momentum_fn = None
    mode_switch_epochs = 0
    inherent = {"SyncRandomSizeHook", "SyncNormHook", "NumClassCheckHook",
                "CheckInvalidLossHook"}
    for hook in cfg.get("custom_hooks", []) or []:
        ht = hook.get("type")
        if ht == "ExpMomentumEMAHook":
            from boosting_rcnn_tpu.engine.hooks import exp_momentum_schedule

            ema_momentum_fn = exp_momentum_schedule(
                total_iter=hook.get("total_iter", 2000),
                momentum=hook.get("momentum", 0.0002),
            )
        elif ht == "EMAHook":
            m = hook.get("momentum", 0.0002)
            ema_momentum_fn = lambda step, _m=m: _m
        elif ht == "YOLOXModeSwitchHook":
            mode_switch_epochs = hook.get("num_last_epochs", 15)
        elif ht in inherent:
            logger.info(f"custom hook {ht}: inherent to this runtime (no-op)")
        else:
            raise NotImplementedError(f"unsupported custom hook {ht!r}")

    if lrc.get("policy") == "YOLOX":
        from boosting_rcnn_tpu.engine.train import yolox_lr_schedule

        sched = yolox_lr_schedule(
            opt.get("lr", 0.01),
            steps_per_epoch,
            max_epochs,
            num_last_epochs=lrc.get("num_last_epochs", 15),
            min_lr_ratio=lrc.get("min_lr_ratio", 0.05),
            warmup_epochs=lrc.get("warmup_iters", 5)
            if lrc.get("warmup_by_epoch", True) else 1,
            warmup_ratio=lrc.get("warmup_ratio", 1.0),
        )
    else:
        sched = step_lr_schedule(
            opt.get("lr", 0.02),
            steps_per_epoch,
            decay_epochs=lrc.get("step", [8, 11]),
            warmup_iters=lrc.get("warmup_iters", 500),
            warmup_ratio=lrc.get("warmup_ratio", 0.001),
        )
    tx = make_optimizer(
        sched,
        momentum=opt.get("momentum", 0.9),
        weight_decay=opt.get("weight_decay", 1e-4),
        grad_clip_norm=grad_clip.get("max_norm"),
        params=variables["params"],
        frozen_stages=mc["backbone"].get("frozen_stages", -1),
        nesterov=opt.get("nesterov", False),
    )
    state = create_train_state(variables, tx)

    init_cfg = mc["backbone"].get("init_cfg") or {}
    if init_cfg.get("type") == "Pretrained" and not args.tiny:
        ckpt = init_cfg.get("checkpoint", "")
        try:
            from tools.convert_torch_weights import load_pretrained_backbone

            new_p, new_s = load_pretrained_backbone(
                ckpt, state.params, state.batch_stats)
            state = state.replace(
                params=new_p,
                batch_stats=(new_s if new_s is not None
                             else state.batch_stats),
            )
            logger.info(f"loaded pretrained backbone: {ckpt}")
        except Exception as e:  # zero-egress envs have no torchvision zoo
            logger.warning(f"pretrained backbone unavailable ({e}); random init")

    start_epoch = 0
    if args.resume_from:
        state, meta = restore_checkpoint(args.resume_from, state)
        start_epoch = int(meta.get("epoch", 0))
        logger.info(f"resumed from {args.resume_from} at epoch {start_epoch}")

    mesh = create_mesh()
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    spd = max(int(args.steps_per_dispatch), 1)
    if spd > 1:
        from boosting_rcnn_tpu.engine.train import make_multi_step_train
        from boosting_rcnn_tpu.parallel.mesh import stacked_batch_sharding

        bsh = stacked_batch_sharding(mesh)
        step_fn = make_multi_step_train(det, anchors, nla)
        if ema_momentum_fn is not None:
            raise NotImplementedError(
                "--steps-per-dispatch > 1 with an EMA hook would apply the "
                "EMA once per dispatch instead of once per step (a silent "
                "numeric deviation); run with --steps-per-dispatch 1")
    else:
        step_fn = make_train_step(det, anchors, nla)
    state = jax.device_put(state, rep)
    train_step = jax.jit(
        step_fn,
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
    )
    rng = jax.device_put(jax.random.PRNGKey(args.seed + 1), rep)

    log_interval = cfg.get("log_config", {}).get("interval", 50)
    total_steps = 0
    t_start = time.time()
    nan_guard_interval = 50  # CheckInvalidLossHook equivalent
    ema_params = None
    if ema_momentum_fn is not None:
        from boosting_rcnn_tpu.engine.hooks import ema_init, ema_update

        ema_params = jax.device_put(ema_init(state.params), rep)
        ema_step = jax.jit(ema_update)
    mode_switched = False
    for epoch in range(start_epoch, max_epochs):
        if (mode_switch_epochs and not mode_switched
                and epoch >= max_epochs - mode_switch_epochs):
            # YOLOXModeSwitchHook (yolox_mode_switch_hook.py:7): kill
            # mosaic/mixup and enable the raw-regression L1 term for the
            # final epochs; the flipped flag re-jits the train step
            mode_switched = True
            for attr in ("mosaic_prob", "mixup_prob"):
                if hasattr(loader, attr):
                    setattr(loader, attr, 0.0)
            if hasattr(det, "use_l1"):
                det.use_l1 = True
            train_step = jax.jit(
                make_train_step(det, anchors, nla) if spd == 1
                else make_multi_step_train(det, anchors, nla),
                in_shardings=(rep, bsh, rep),
                out_shardings=(rep, rep),
            )
            logger.info(
                f"YOLOX mode switch at epoch {epoch}: mosaic/mixup off, "
                f"L1 loss on")
        t_epoch = time.time()
        t_data = 0.0
        t_last = time.time()

        def _dispatch_iter(ep):
            # spd>1: stack spd consecutive batches on a leading steps axis
            # for one multi-step dispatch (a final partial group is dropped,
            # like a drop_last batch).
            if spd == 1:
                yield from loader.epoch_iter(ep)
                return
            group = []
            for b in loader.epoch_iter(ep):
                b.pop("ori_shape", None)
                group.append(b)
                if len(group) == spd:
                    yield {
                        k: np.stack([np.asarray(g[k]) for g in group])
                        for k in group[0]
                    }
                    group = []

        for it, batch in enumerate(_dispatch_iter(epoch)):
            batch.pop("ori_shape", None)
            t_data += time.time() - t_last
            if spd == 1:
                sb = shard_batch(mesh, batch)
            else:
                from boosting_rcnn_tpu.utils.transfer import chunked_device_put

                sb = {k: chunked_device_put(v, sharding=bsh)
                      for k, v in batch.items()}
            state, metrics = train_step(state, sb, rng)
            if spd > 1:  # metrics come back stacked (spd,); log the last step
                metrics = {k: v[-1] for k, v in metrics.items()}
            if ema_params is not None:
                ema_params = ema_step(
                    ema_params, state.params, ema_momentum_fn(total_steps))
            total_steps += spd
            if total_steps % log_interval == 0 or it == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(
                    epoch=epoch,
                    iter=it,
                    lr=float(sched(total_steps)),
                    time=(time.time() - t_epoch) / (it + 1),
                    data_time=t_data / (it + 1),
                )
                logger.info(
                    f"Epoch [{epoch}][{it}/{steps_per_epoch}] "
                    + " ".join(f"{k}: {v:.4f}" for k, v in m.items() if k not in ("epoch", "iter"))
                )
                jlog.write({"mode": "train", **m})
            if total_steps % nan_guard_interval == 0:
                assert np.isfinite(float(metrics["loss"])), (
                    f"non-finite loss at step {total_steps}"
                )
            t_last = time.time()
            if args.iters and total_steps >= args.iters:
                break
        if jax.process_index() == 0:
            save_checkpoint(
                os.path.join(work_dir, f"epoch_{epoch+1}"),
                jax.device_get(state),
                meta={
                    "epoch": epoch + 1,
                    "step": int(state.step),
                    "classes": list(
                        data_cfg["train"].get("classes") or []
                    ),
                },
            )
            if ema_params is not None:
                # EMA weights shadow-checkpoint (reference EMA hook swaps
                # them in at eval; kept as a sibling checkpoint here)
                save_checkpoint(
                    os.path.join(work_dir, f"epoch_{epoch+1}_ema"),
                    jax.device_get(state.replace(params=ema_params)),
                    meta={"epoch": epoch + 1, "ema": True},
                )
        if val_ds is not None:
            from boosting_rcnn_tpu.data.loader import DetDataLoader as DL
            from boosting_rcnn_tpu.engine.eval import run_eval

            vloader = DL(
                val_ds, batch_size=batch_per_host, canvas=canvas, train=False
            )
            results = run_eval(
                det,
                {"params": state.params, "batch_stats": state.batch_stats},
                vloader,
                anchors,
                nla,
                logger=logger,
            )
            metrics = val_ds.evaluate(results)
            logger.info(f"Epoch [{epoch}] eval: {metrics}")
            jlog.write({"mode": "val", "epoch": epoch, **metrics})
        if args.iters and total_steps >= args.iters:
            break
    logger.info(f"done: {total_steps} steps in {time.time()-t_start:.1f}s")


if __name__ == "__main__":
    main()
