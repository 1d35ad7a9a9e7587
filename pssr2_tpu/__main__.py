"""CLI entry point (reference: pssr/__main__.py): ``python -m pssr2_tpu`` or
the ``pssr2-tpu`` console script.  Same flag surface and constructor-string
syntax as the reference CLI, evaluated through a restricted AST parser
instead of bare ``eval`` (pssr2_tpu.declaration).
"""

import argparse
import sys
import warnings

from . import __version__

IS_GUI = False


def parse():
    parser = argparse.ArgumentParser(
        prog="pssr2-tpu",
        description=f"PSSR2-TPU CLI for basic usage (v{__version__})",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )

    parser.add_argument("-v", "--version", action="version", version=f"pssr2-tpu {__version__}")
    parser.add_argument("-t", "--train", action="store_true", help="enable train mode")

    parser.add_argument("-dp", "--data-path", type=str, help="specify dataset path")
    parser.add_argument("-dt", "--data-type", type=str, default="ImageDataset", help="specify dataset type")
    parser.add_argument("-mt", "--model-type", type=str, default="ResUNet", help="specify model type")
    parser.add_argument("-mp", "--model-path", type=str, help="specify model path")

    parser.add_argument("-e", "--epochs", type=int, default=10, help="specify number of training epochs")
    parser.add_argument("-b", "--batch-size", type=int, default=16, help="specify training batch size")
    parser.add_argument("-lr", "--lr", type=float, default=1e-3, help="specify initial training learning rate")
    parser.add_argument("-g", "--gamma", type=float, default=0.7, help="specify learning rate decay factor")
    parser.add_argument("-mix", "--mix", type=float, default=0.8, help="specify MS-SSIM loss mix factor")
    parser.add_argument("-mse", "--mse", action="store_true", help="use MSE loss instead of MS-SSIM loss")

    parser.add_argument("-cp", "--checkpoint", action="store_true", help="save model checkpoints during training")
    parser.add_argument("-sl", "--save-losses", action="store_true", help="save training losses")

    parser.add_argument("-dtype", "--dtype", type=str, default=None, choices=[None, "float32", "bfloat16"], help="model compute dtype")
    parser.add_argument("-nd", "--n-devices", type=int, default=None, help="number of devices for the data mesh (default: all)")
    parser.add_argument("-dpsm", "--dp-shard-map", action="store_true", help="data-parallel stepping as an explicit shard_map program (fused Pallas kernels stay eligible per shard; see train_paired dp_shard_map)")
    parser.add_argument("-spd", "--steps-per-dispatch", type=int, default=1, help="train steps fused per dispatch (nnx.scan trainer)")
    parser.add_argument("-ex", "--export", type=str, default=None, metavar="OUT.shlo", help="export the loaded model's eval forward as a serialized StableHLO serving artifact (requires -mp, ignores data args; see docs/guide/serving.md)")
    parser.add_argument("-lres", "--lr-res", type=int, default=128, help="LR input resolution baked into the --export artifact")
    parser.add_argument("-q8", "--int8", action="store_true", help="quantize the loaded model to int8 (W8A8) before predict/export; calibrates activation scales on dataset LR batches. Measured v5e speedups vs bf16: ResUNet 1.32x, RDResUNet hybrid 1.11x, atrous ResUNetA 0.777x (SLOWER — a warning is printed); see docs/guide/serving.md")

    return parser


def _setup_compile_cache():
    """Enable the persistent XLA compilation cache (cross-process reuse
    verified on this stack — CLAUDE.md cache_probe_r3): repeat CLI runs
    with unchanged programs skip recompilation.  JAX_CACHE_DIR overrides
    the location; set it empty to disable."""
    import os

    cache_dir = os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.cache/pssr2_tpu_xla"))
    if not cache_dir:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main():
    parser = parse()
    if len(sys.argv) == 1:
        parser.print_help(sys.stderr)
        return
    args = parser.parse_args()
    _setup_compile_cache()

    if args.int8 and args.train:
        print("--int8(-q8) is a serving-path flag; it cannot be combined with --train")
        return
    if args.int8 and args.data_path is None:
        print("--data-path(-dp) must be provided with --int8 (calibration batches)")
        return

    if args.export is not None:
        if args.model_path is None:
            print("--model-path(-mp) must be provided with --export")
            return
    elif args.data_path is None:
        print("--data-path(-dp) must be provided")
        return
    elif args.model_path is None and not args.train:
        print("--model-path(-mp) must be provided in predict mode")
        return

    from .declaration import handle_declaration

    model_type = args.model_type
    if args.dtype == "bfloat16":
        # inject compute-dtype kwarg into the constructor declaration
        model_type = (
            model_type + "(dtype='bfloat16')"
            if "(" not in model_type
            else model_type.replace("(", "(dtype='bfloat16', ", 1).replace(", )", ")")
        )

    try:
        model = handle_declaration(model_type, ["ResUNet", "ResUNetA", "RDResUNet", "RDResUNetA", "SwinIR"])
    except (ValueError, SyntaxError, TypeError) as err:
        print(f"Invalid --model-type declaration {args.model_type!r}: {err}")
        return

    def parse_dataset():
        try:
            return handle_declaration(
                args.data_type,
                ["ImageDataset", "SlidingDataset", "PairedImageDataset", "PairedSlidingDataset"],
                req=[f"'{item.strip()}'" for item in args.data_path.split(",")] + (["val_split=1"] if not args.train else []),
            )
        except (ValueError, SyntaxError, TypeError, FileNotFoundError) as err:
            print(f"Invalid --data-type/--data-path declaration: {err}")
            return None

    if args.export is not None:
        from .checkpoint import load_weights
        from .export import export_model

        print(f"Loading {type(model).__name__} model from {args.model_path}")
        load_weights(model, args.model_path)
        model.eval()
        if args.int8:
            dataset = parse_dataset()
            if dataset is None:
                return
            model = _quantize_int8(model, dataset)
            if model is None:
                return
        export_model(model, args.export, lr_res=args.lr_res)
        print(f"Exported serving artifact to {args.export}")
        return

    dataset = parse_dataset()
    if dataset is None:
        return

    pssr_head(
        args.train,
        model,
        dataset,
        None,
        args.epochs,
        args.batch_size,
        args.lr,
        args.gamma,
        args.mse,
        args.checkpoint,
        args.save_losses,
        args.model_path,
        mix=args.mix,
        n_devices=args.n_devices,
        steps_per_dispatch=args.steps_per_dispatch,
        dp_shard_map=args.dp_shard_map,
        int8=args.int8,
    )
    print("\n")


def _quantize_int8(model, dataset):
    """CLI int8 step: calibrate on dataset LR batches, quantize, or print
    the actionable error and return None."""
    from .models.rdresunet import RDResUNet
    from .quant import calibrate_from_dataset, quantize_rdresunet, quantize_resunet

    quantize = quantize_rdresunet if isinstance(model, RDResUNet) else quantize_resunet
    model.eval()
    from .models.blocks import ResBlockA

    blocks = list(getattr(model, "encoder", [])) + list(getattr(model, "decoder", []))
    if not isinstance(model, RDResUNet) and any(isinstance(b, ResBlockA) for b in blocks):
        # Measured on v5e (experiments/int8_family.json): atrous ResUNetA
        # int8 serves at 0.777x the bf16 path — the pre-conv BN affines
        # cannot fold through the ReLU, and the extra glue outweighs the
        # MXU int8 rate win at these channel widths.  Honest flag, not a
        # silent regression.
        print(
            "--int8 WARNING: atrous ResUNetA measured SLOWER than bf16 "
            "(0.777x, experiments/int8_family.json) — consider serving "
            "bf16 for this family (see docs/guide/serving.md)."
        )
    try:
        qmodel = quantize(model, calibrate_from_dataset(dataset))
    except (NotImplementedError, ValueError) as err:
        print(f"--int8: {err}")
        return None
    print("Quantized model to int8 (W8A8) for serving")
    return qmodel


def pssr_head(
    train,
    model,
    dataset,
    device,
    epochs,
    batch_size,
    lr,
    gamma,
    loss_fn,
    checkpoint,
    losses,
    model_path,
    callbacks=None,
    stage=None,
    metrics=None,
    mix=None,
    n_devices=None,
    dp_shard_map=False,
    steps_per_dispatch=1,
    int8=False,
):
    """Shared train/predict orchestrator, also used by the napari plugin
    (reference: pssr/__main__.py:69-115)."""
    global IS_GUI
    if stage is not None:
        IS_GUI = True
        from .napari.widgets import Status

        stage.emit(Status.LOADING.value)
        from .declaration import parse_declaration

        model = parse_declaration(model)
        dataset = parse_declaration(dataset)

    from .util import _tab_string

    print(f"\nModel:\n{_tab_string(model.extra_repr())}")
    print(f"\nDataset:\n{_tab_string(str(dataset))}")

    import jax

    devices = jax.devices()
    print(f"\nRunning on {len(devices)} {devices[0].platform.upper()} device(s).")

    if model_path:
        if str(model_path) == ".":
            raise ValueError("Attempted to load model from checkpoint, but path is not provided")
        from .checkpoint import load_weights

        print(f"Loading {type(model).__name__} model from {model_path}")
        load_weights(model, model_path)

    if int8 and not train:
        model = _quantize_int8(model, dataset)
        if model is None:
            return

    mesh = None
    if len(devices) > 1:
        from .parallel import data_mesh

        mesh = data_mesh(n_devices)
        if train and batch_size % mesh.devices.size != 0:
            print(
                f"Batch size {batch_size} is not divisible by the {mesh.devices.size}-device "
                "mesh; running single-device. Pass a divisible batch size to scale."
            )
            mesh = None

    if train:
        func = lambda: _train_meta(
            model, dataset, device, epochs, batch_size, lr, gamma, loss_fn, checkpoint, losses,
            callbacks, stage, mix=mix, mesh=mesh, steps_per_dispatch=steps_per_dispatch,
            dp_shard_map=dp_shard_map,
        )
    else:
        func = lambda: _predict_meta(model, dataset, device, callbacks, stage, metrics)
    func()


def _train_meta(model, dataset, device, epochs, batch_size, lr, gamma, loss_fn, checkpoint, losses, callbacks=None, stage=None, mix=None, mesh=None, steps_per_dispatch=1, dp_shard_map=False):
    """(reference: pssr/__main__.py:117-162)"""
    from .checkpoint import save_weights
    from .optim import AdamW, ExponentialLR
    from .train import train_paired
    from .util import MSELoss, SSIMLoss

    if not IS_GUI or not callable(loss_fn):
        loss_fn = (
            MSELoss()
            if loss_fn
            else SSIMLoss(
                channels=1 if dataset.n_frames is None else dataset.n_frames[-1],
                mix=mix if mix is not None else 0.8,
                win_size=min(_max_ssim_win(dataset.hr_res), 11),
            )
        )
    optim = AdamW(lr=lr)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        scheduler = ExponentialLR(optim, gamma, verbose=True)
    checkpoint_dir = "checkpoints" if checkpoint else None
    collage_dir = "collages" if losses else None

    if IS_GUI and stage is not None:
        from .napari.widgets import Status

        stage.emit(Status.PROGRESS_TRAIN.value)

    print("\nTraining model...")
    train_losses, val_losses = train_paired(
        model=model,
        dataset=dataset,
        batch_size=batch_size,
        loss_fn=loss_fn,
        optim=optim,
        epochs=epochs,
        device=device,
        scheduler=scheduler,
        checkpoint_dir=checkpoint_dir,
        collage_dir=collage_dir,
        dataloader_kwargs=dict(num_workers=4),
        callbacks=callbacks,
        mesh=mesh,
        steps_per_dispatch=steps_per_dispatch,
        dp_shard_map=dp_shard_map and mesh is not None,
    )
    print("\nTraining complete!")

    save_path = f"{type(model).__name__}_{dataset.hr_res // dataset.lr_scale}-{dataset.hr_res}_{val_losses[-1]:.4f}.npz"
    save_weights(model, save_path)
    print(f"Saved trained model to {save_path}")

    if losses:
        with open(f"{type(model).__name__}_train_losses_{val_losses[-1]:.4f}.txt", "w") as file:
            for loss in train_losses:
                file.write(f"{loss:.6f}\n")
        with open(f"{type(model).__name__}_val_losses_{val_losses[-1]:.4f}.txt", "w") as file:
            for loss in val_losses:
                file.write(f"{loss:.6f}\n")


def _predict_meta(model, dataset, device, callbacks=None, stage=None, plotter=None):
    """(reference: pssr/__main__.py:164-181)"""
    from .predict import predict_images, test_metrics

    if IS_GUI and stage is not None:
        from .napari.widgets import Status

        stage.emit(Status.PROGRESS_PREDICT.value)

    print("\nPredicting images from low resolution...")
    predict_images(model, dataset, device, norm=not dataset.is_lr, out_dir="preds", callbacks=callbacks)

    if not dataset.is_lr:
        print("\nCalculating metrics...")
        metrics = test_metrics(model, dataset, device, avg=not IS_GUI, callbacks=callbacks)

        if IS_GUI and plotter is not None:
            plotter.emit([metrics["psnr"], metrics["ssim"]])
            metrics = {metric: (sum(values) / len(values)) for metric, values in metrics.items()}

        print("\nMetrics:")
        for metric in metrics:
            print(f"{metric}: {metrics[metric]}")


def _max_ssim_win(hr_res: int):
    """(reference: pssr/__main__.py:192-196)"""
    size = (hr_res - 1) // 16
    if size % 2 == 0:
        size += 1
    return size


if __name__ == "__main__":
    main()
