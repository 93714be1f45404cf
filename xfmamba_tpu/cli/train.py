"""Training CLI — the TPU counterpart of ``/root/reference/1_train_model.py``.

Every reference flag is kept (`1_train_model.py:29-55`); the hard-coded
cluster data paths (`:89-118`) become explicit ``--data_*`` flags.

Usage (MURA):
    python -m xfmamba_tpu.cli.train --dataset mura \
        --model_name twoviewxfmamba --num_classes 2 \
        --data_root /data/MURA-v1.1 \
        --train_image_csv train_image_paths.csv \
        --train_label_csv train_labeled_studies.csv \
        --valid_image_csv valid_image_paths.csv \
        --valid_label_csv valid_labeled_studies.csv \
        --savemodel_path runs/mura_small
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import jax.numpy as jnp

from xfmamba_tpu.cli import build_model_by_name, load_variables
from xfmamba_tpu.train.config import TrainConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="XFMamba TPU training")
    # reference flags (1_train_model.py:29-55)
    p.add_argument("--dataset", default="mura",
                   choices=["mura", "chexpert", "ddsmxray", "hipxray"])
    p.add_argument("--model_name", default="twoviewxfmamba")
    p.add_argument("--num_tasks", type=int, default=1)
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--view_num", type=int, default=2)
    p.add_argument("--view_sel", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--wandb", type=int, default=0)
    p.add_argument("--pretrained_model_path", default=None)
    p.add_argument("--savemodel_path", default="runs")
    # optimizer/scheduler (libs/utils.py:83-134; defaults 1_train_model.py)
    p.add_argument("--optimizer", default="adam",
                   choices=["adam", "sgd", "adamw"])
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--scheduler", default="step",
                   choices=["step", "cos", "reduce", "none"])
    p.add_argument("--step_size", type=int, default=10)
    p.add_argument("--gamma", type=float, default=0.1)
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--image_size", type=int, default=224)
    # data paths (replace the reference's hard-coded cluster paths :89-118)
    p.add_argument("--data_root", default="")
    p.add_argument("--train_image_csv", default=None)
    p.add_argument("--train_label_csv", default=None)
    p.add_argument("--valid_image_csv", default=None)
    p.add_argument("--valid_label_csv", default=None)
    p.add_argument("--chexpert_csv", default=None)
    p.add_argument("--ddsm_metadata_csv", default=None)
    p.add_argument("--ddsm_case_csvs", nargs="*", default=None)
    p.add_argument("--hip_images_dir", default=None)
    p.add_argument("--hip_csv", default=None)
    # TPU execution
    p.add_argument("--bf16", type=int, default=0,
                   help="bfloat16 compute (fp32 scan state regardless)")
    p.add_argument("--use_checkpoint", type=int, default=0,
                   help="activation rematerialization")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard the batch over all local devices")
    p.add_argument("--device_preprocess", type=int, default=0,
                   help="stage u8 on host; run resize/crop/flip/rotate/"
                        "normalize on-device inside the jitted step")
    p.add_argument("--loader_processes", type=int, default=0,
                   help="decode/transform in worker PROCESSES instead of "
                        "threads (GIL-free scaling across host cores)")
    return p.parse_args(argv)


def build_loaders(args, cfg_dict):
    if args.dataset == "mura":
        from xfmamba_tpu.data.mura import create_data_loaders
        return create_data_loaders(
            args.train_image_csv, args.train_label_csv,
            args.valid_image_csv, args.valid_label_csv, cfg_dict)
    if args.dataset == "chexpert":
        from xfmamba_tpu.data.chexpert import (
            create_train_val_test_data_loaders)
        return create_train_val_test_data_loaders(
            [args.data_root], [args.chexpert_csv], cfg_dict)
    if args.dataset == "ddsmxray":
        from xfmamba_tpu.data.ddsm import create_data_loaders
        tr, va = create_data_loaders(args.ddsm_case_csvs,
                                     args.ddsm_metadata_csv,
                                     args.data_root, cfg_dict)
        return tr, va, va
    if args.dataset == "hipxray":
        from xfmamba_tpu.data.hipxray import create_data_loaders
        tr, va, _ = create_data_loaders(args.hip_images_dir, args.hip_csv,
                                        cfg_dict)
        return tr, va, va
    raise ValueError(args.dataset)


def main(argv=None):
    args = parse_args(argv)
    cfg = TrainConfig(
        dataset=args.dataset, data_root=args.data_root,
        image_size=(args.image_size, args.image_size),
        batch_size=args.batch_size, eval_batch_size=args.batch_size,
        num_workers=args.num_workers, seed=args.seed,
        model_name=args.model_name, num_tasks=args.num_tasks,
        num_classes=args.num_classes, view_num=args.view_num,
        view_sel=args.view_sel,
        pretrained_model_path=args.pretrained_model_path,
        savemodel_path=args.savemodel_path, optimizer=args.optimizer,
        lr=args.lr, weight_decay=args.weight_decay,
        scheduler=args.scheduler, step_size=args.step_size,
        gamma=args.gamma, epochs=args.epochs, patience=args.patience,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        use_checkpoint=bool(args.use_checkpoint),
        data_parallel=bool(args.data_parallel), wandb=bool(args.wandb))
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["root_dir"] = cfg.data_root  # mura loader's key
    cfg_dict["device_preprocess"] = bool(args.device_preprocess)
    cfg_dict["loader_processes"] = bool(args.loader_processes)

    if cfg.wandb:
        try:
            import wandb as _wandb
            _wandb.init(project=f"xfmamba-{cfg.dataset}",
                        config=cfg_dict)
        except Exception as e:  # keep training if wandb is unavailable
            print(f"wandb disabled: {e}")
            cfg = dataclasses.replace(cfg, wandb=False)

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model, two_view = build_model_by_name(cfg.model_name, cfg.num_classes,
                                          dtype)

    train_loader, val_loader, _ = build_loaders(args, cfg_dict)

    preprocess = None
    if args.device_preprocess:
        if args.dataset == "chexpert":
            from xfmamba_tpu.data.device_pipeline import (
                chexpert_device_preprocess)
            preprocess = chexpert_device_preprocess(cfg.image_size)
        elif args.dataset == "ddsmxray":
            from xfmamba_tpu.data.device_pipeline import (
                ddsm_device_preprocess)
            preprocess = ddsm_device_preprocess(cfg.image_size)
        else:
            from xfmamba_tpu.data.device_pipeline import (
                mura_device_preprocess)
            preprocess = mura_device_preprocess(cfg.image_size)

    from xfmamba_tpu.train.driver import fit
    os.makedirs(cfg.savemodel_path, exist_ok=True)
    print(f"devices: {jax.devices()}")
    state, history = fit(model, cfg, train_loader, val_loader,
                         out_dir=cfg.savemodel_path, preprocess=preprocess)
    print(f"done; best val loss "
          f"{min(h['val']['loss'] for h in history):.4f}")
    return state, history


if __name__ == "__main__":
    main()
