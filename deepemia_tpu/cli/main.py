"""Direct CLI orchestrator: ``python main.py --task {...}``.

Parity surface: reference ``main.py`` — the argparse flag set (:241-344),
interactive first-run setup (:39-170), accelerator preflight (:357-372),
dataset_info download (:384-394), task dispatch (:409-528), selective result
upload + local cleanup (:533-564), ETA updates (:566-572). The destructive
local cleanups are retained but routed through the path-guarded safe_ops
layer (reference Q9: it deleted with raw glob/rm).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time
from pathlib import Path
from typing import Optional

from deepemia_tpu.config import get_config, get_store
from deepemia_tpu.utils.device import check_accelerator_availability
from deepemia_tpu.utils.eta import estimate_eta, update_eta_data
from deepemia_tpu.utils.logging_utils import setup_logging, system_logger
from deepemia_tpu.utils.storage import storage_from_config

log = logging.getLogger("deepemia_tpu.cli")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="deepemia",
        description=(
            "deepEMIA-TPU: TPU-native electron microscopy image analysis"
        ),
        formatter_class=argparse.RawTextHelpFormatter,
    )
    p.add_argument(
        "--task",
        required=True,
        choices=["prepare", "train", "evaluate", "inference", "setup"],
        help=(
            "prepare: split dataset and register\n"
            "train: train segmentation models (R50/R101/combo)\n"
            "evaluate: COCO metrics on the test split\n"
            "inference: tile-based inference + measurements\n"
            "setup: first-time configuration"
        ),
    )
    p.add_argument("--dataset_name", help="Dataset name from dataset_info.json")
    p.add_argument(
        "--threshold",
        type=float,
        default=0.65,
        help="Detection confidence threshold for inference [default 0.65]",
    )
    p.add_argument(
        "--dataset_format", default="json", choices=["json", "coco"]
    )
    p.add_argument("--visualize", action="store_true", default=False)
    p.add_argument(
        "--download",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="Sync data from the artifact store before the task",
    )
    p.add_argument(
        "--upload",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="Upload results to the artifact store after the task",
    )
    p.add_argument("--id", dest="draw_id", action="store_true", default=False)
    p.add_argument("--rcnn", default="101", choices=["50", "101", "combo"])
    p.add_argument("--augment", action="store_true")
    p.add_argument("--optimize", action="store_true", help="Run HPO search")
    p.add_argument("--n-trials", type=int, default=10)
    p.add_argument(
        "--hpo-strategy",
        default="halving",
        choices=["halving", "random"],
        help="successive halving (default) or flat random search",
    )
    p.add_argument(
        "--max-iter",
        type=int,
        default=None,
        help="Override auto training schedule length",
    )
    p.add_argument(
        "--pretrained-weights",
        default=None,
        metavar="PATH",
        help=(
            "Fine-tune from a zoo/pretrained checkpoint (Detectron2 "
            ".pth/.pkl or Caffe2 backbone pickle); heads are re-initialized "
            "on class-count mismatch. Defaults to "
            "train.pretrained_weights.<backbone> from config"
        ),
    )
    p.add_argument(
        "--verbosity",
        default="info",
        choices=["debug", "info", "warning", "error"],
    )
    p.add_argument(
        "--no-gpu-check",
        action="store_true",
        help="Skip accelerator preflight (automated runs)",
    )
    p.add_argument("--draw-scalebar", action="store_true", default=False)
    p.add_argument(
        "--cleanup",
        action="store_true",
        help=(
            "Delete local datasets/results after a successful upload "
            "(the reference does this unconditionally; here it is opt-in "
            "and path-guarded)"
        ),
    )
    p.add_argument(
        "--profile",
        metavar="DIR",
        default=None,
        help="Capture a jax profiler trace of the task into DIR",
    )
    p.add_argument(
        "--chips",
        type=int,
        default=None,
        help=(
            "Devices for tile-sharded inference "
            "(default: config performance.inference_chips; 0 = all local)"
        ),
    )
    p.add_argument(
        "--quantized",
        choices=["none", "trunk", "full"],
        default=None,
        help=(
            "Int8 MXU backbone serving (default: config "
            "performance.quantized_inference; same float checkpoint)"
        ),
    )
    return p


def setup_config_interactive() -> None:
    """First-run interactive setup (reference main.py:39-170)."""
    store = get_store()
    path = store.config_path
    print("=== deepEMIA-TPU Setup ===")
    if path.exists():
        if input(f"Config exists at {path}. Overwrite? (y/n): ").strip().lower() != "y":
            print("Setup cancelled.")
            return
        path.unlink()
    store.invalidate()
    cfg = store.load()  # writes defaults
    bucket = input("Artifact bucket name (empty = local store): ").strip()
    cfg["bucket"] = bucket

    print("\nScale bar ROI (Enter for defaults):")
    roi = cfg["scale_bar_rois"]["default"]
    for key, default in (
        ("x_start_factor", 0.7),
        ("y_start_factor", 0.05),
        ("width_factor", 1.0),
        ("height_factor", 0.05),
    ):
        val = input(f"  {key} [{default}]: ").strip()
        roi[key] = float(val) if val else default

    print("\nScale bar thresholds:")
    thr = cfg["scalebar_thresholds"]
    for key in ("intensity", "proximity"):
        val = input(f"  {key} [{thr[key]}]: ").strip()
        if val:
            thr[key] = float(val)

    mc = input("\nmeasure_contrast_distribution [false]: ").strip().lower()
    cfg["measure_contrast_distribution"] = mc == "true"
    store.save(cfg)
    print(f"Configuration written to {path}")


def _dataset_root(cfg) -> Path:
    return Path(os.path.expanduser(cfg["paths"].get("local_dataset_root", "~")))


def _honor_platform_env() -> None:
    """Make JAX_PLATFORMS authoritative: some site configurations register a
    remote accelerator backend that overrides the env var; re-assert the
    user's choice before any backend initializes."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            import jax

            jax.config.update("jax_platforms", want)
        except Exception:  # noqa: BLE001 - backend already up; leave it
            pass


def run_task(args) -> int:
    _honor_platform_env()
    setup_logging(None, args.verbosity)
    from deepemia_tpu.utils.device import maybe_init_distributed

    maybe_init_distributed()  # multi-host (DCN) when configured via env

    if args.task == "setup":
        setup_config_interactive()
        return 0

    if not args.dataset_name:
        print("--dataset_name is required for this task", file=sys.stderr)
        return 2

    cfg = get_config(args.dataset_name)
    setup_logging(cfg["paths"].get("logs_dir"), args.verbosity)
    paths = cfg["paths"]
    storage = storage_from_config(cfg)
    eta_file = paths["eta_file"]

    if not args.no_gpu_check:
        check_accelerator_availability(
            require_accelerator=False, interactive=True
        )

    # dataset_info.json sync (reference main.py:384-394)
    category_json = Path(os.path.expanduser(paths["category_json"]))
    if args.download:
        try:
            storage.download_file("dataset_info.json", category_json)
        except Exception as e:  # noqa: BLE001
            if not category_json.exists():
                log.error("dataset_info.json unavailable: %s", e)
                return 1
            log.warning("Using local dataset_info.json (sync failed: %s)", e)

    ds_root = _dataset_root(cfg)
    dataset_dir = ds_root / "DATASET" / args.dataset_name
    split_dir = os.path.expanduser(paths["split_dir"])
    t_start = time.time()
    rc = 0

    if args.task == "prepare":
        if args.download:
            _try_download(storage, args.dataset_name, dataset_dir)
        from deepemia_tpu.data.datasets import read_dataset_info, split_dataset

        info = read_dataset_info(paths["category_json"])
        if args.dataset_name not in info:
            log.error("Dataset %s not in dataset_info.json", args.dataset_name)
            return 1
        img_dir, label_dir, _ = info[args.dataset_name]
        split_dataset(
            label_dir if os.path.isdir(os.path.expanduser(label_dir)) else img_dir,
            args.dataset_name,
            split_dir,
        )
        update_eta_data(eta_file, "prepare", time.time() - t_start)

    elif args.task == "train":
        if args.download:
            _try_download(storage, args.dataset_name, dataset_dir)
        from deepemia_tpu.train.workflow import train_on_dataset

        rcnn = {"combo": 0, "50": 50, "101": 101}[args.rcnn]
        results = train_on_dataset(
            args.dataset_name,
            split_dir,
            rcnn=rcnn,
            augment=args.augment,
            optimize=args.optimize,
            n_trials=args.n_trials,
            config=cfg,
            max_steps_override=args.max_iter,
            init_checkpoint=args.pretrained_weights,
            hpo_strategy=args.hpo_strategy,
        )
        for backbone, metrics in results.items():
            system_logger.info(
                "%s: segm AP %.2f bbox AP %.2f",
                backbone,
                metrics.get("segm/AP", float("nan")),
                metrics.get("bbox/AP", float("nan")),
            )
        if args.cleanup:
            from deepemia_tpu.utils.safe_ops import safe_remove_files

            safe_remove_files(
                [str(dataset_dir)], allowed_bases=[str(ds_root / "DATASET")]
            )
            log.info("Deleted local dataset after training (--cleanup)")
        update_eta_data(eta_file, "train", time.time() - t_start)

    elif args.task == "evaluate":
        from deepemia_tpu.train.workflow import evaluate_model

        rcnn = 101 if args.rcnn in ("101", "combo") else 50
        evaluate_model(
            args.dataset_name,
            split_dir,
            rcnn=rcnn,
            threshold=0.45,
            config=cfg,
            visualize=args.visualize,
        )
        update_eta_data(eta_file, "evaluate", time.time() - t_start)

    elif args.task == "inference":
        from deepemia_tpu.inference.pipeline import InferencePipeline

        inference_dir = ds_root / "DATASET" / "INFERENCE"
        if args.download:
            _try_download(storage, "INFERENCE", inference_dir)
        n_images = (
            len(list(inference_dir.glob("*"))) if inference_dir.exists() else 0
        )
        system_logger.info(
            "ETA: ~%.0fs for %d images",
            estimate_eta(eta_file, "inference", max(n_images, 1)),
            n_images,
        )
        from deepemia_tpu.utils.profiling import trace

        if args.chips is not None:
            cfg.setdefault("performance", {})["inference_chips"] = args.chips
        if args.quantized is not None:
            cfg.setdefault("performance", {})[
                "quantized_inference"
            ] = args.quantized
        pipe = InferencePipeline(
            args.dataset_name, split_dir, config=cfg,
            default_threshold=args.threshold,
        )
        with trace(args.profile):
            result = pipe.run(
                str(inference_dir),
                visualize=args.visualize,
                eta_file=eta_file,
                draw_ids=args.draw_id,
                draw_scalebar=args.draw_scalebar,
            )
        if args.upload:
            try:
                storage.upload_inference_results(Path(result["output_dir"]))
                if args.cleanup:
                    from deepemia_tpu.utils.safe_ops import safe_remove_files

                    removed = safe_remove_files(
                        [result["output_dir"], str(inference_dir)],
                        allowed_bases=[
                            paths["output_dir"],
                            str(ds_root / "DATASET"),
                        ],
                    )
                    log.info("Cleaned up %d local paths after upload", len(removed))
            except Exception as e:  # noqa: BLE001
                log.error("Result upload failed: %s", e)
        rc = 0 if not result["failed"] else 1

    system_logger.info("Task %s finished in %.1fs", args.task, time.time() - t_start)
    return rc


def _try_download(storage, name: str, target: Path) -> None:
    try:
        storage.download_dataset(name, target)
    except Exception as e:  # noqa: BLE001
        if target.exists():
            log.warning("Using local copy of %s (download failed: %s)", name, e)
        else:
            log.warning("No data for %s (download failed: %s)", name, e)


def cli_entry(argv: Optional[list] = None) -> None:
    args = build_parser().parse_args(argv)
    from deepemia_tpu.utils.exceptions import PipelineError

    try:
        rc = run_task(args)
    except PipelineError as e:
        print(f"error: {e}", file=sys.stderr)
        rc = 1
    except KeyboardInterrupt:
        print("interrupted", file=sys.stderr)
        rc = 130
    raise SystemExit(rc)


if __name__ == "__main__":
    cli_entry()
