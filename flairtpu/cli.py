"""Console entry points: ``flair`` and ``flair-detect``.

Same flags, YAML surface and output conventions as the reference
(src/flair/main.py:206-243, src/zone_detect/main.py:37-48, 501-515):

- ``flair --conf=<yaml>``: out dir = out_folder/out_model_name, stdout teed to
  flair-compute.log, CSV+conf copied to used_csv_and_config/, stages
  train -> predict (predictions_<name>/) -> metrics per task flags.
- ``flair-detect --conf=<yaml> [-c|--compare] [-m|--metrics] [-b|--batch_mode]``.
"""

from __future__ import annotations

import argparse
import datetime
import shutil
import sys
from pathlib import Path

from flairtpu import config as cfgmod
from flairtpu.parallel.mesh import initialize_distributed, is_main_process
from flairtpu.utils.compile_cache import enable_compile_cache
from flairtpu.utils.logger import tee_stdout, untee_stdout
from flairtpu.utils.recap import print_recap


# ---------------------------------------------------------------------------
# flair (patch train / predict / metrics)
# ---------------------------------------------------------------------------

def flair_main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="flair")
    parser.add_argument("--conf", help="Path to the .yaml config file", required=True)
    args = parser.parse_args(argv)

    initialize_distributed()
    enable_compile_cache()
    config = cfgmod.validate_train_config(cfgmod.read_config(args.conf))
    if config.get("accelerator") == "cpu":  # honor the reference's knob
        import jax

        jax.config.update("jax_platforms", "cpu")
    out_dir = Path(config["paths"]["out_folder"], config["paths"]["out_model_name"])
    out_dir.mkdir(parents=True, exist_ok=True)
    if is_main_process():
        tee_stdout(str(out_dir / "flair-compute.log"))
    print(datetime.datetime.now().strftime("Starting : %Y-%m-%d  %H:%M") + "\n")

    try:
        _flair_run(config, out_dir, args.conf)
    finally:
        untee_stdout()


def _flair_run(config: dict, out_dir: Path, conf_path: str) -> None:
    from flairtpu.data.manifest import gather_paths
    from flairtpu.eval.metrics import metrics
    from flairtpu.predict.runner import predict
    from flairtpu.train import checkpoints as ckpt_lib
    from flairtpu.train.loop import SegmentationTrainer, fit

    tasks = config["tasks"]
    dict_train = dict_val = dict_test = None
    if tasks["train"]:
        dict_train = gather_paths(config, "train")
        dict_val = gather_paths(config, "val")
    if tasks["predict"]:
        dict_test = gather_paths(config, "test")
    print_recap(config, dict_train, dict_val, dict_test)

    if config.get("cp_csv_and_conf_to_output", True) and is_main_process():
        copy_dir = out_dir / "used_csv_and_config"
        copy_dir.mkdir(parents=True, exist_ok=True)
        for key in ("train_csv", "val_csv") if tasks["train"] else ():
            shutil.copy(config["paths"][key], copy_dir)
        if tasks["predict"]:
            shutil.copy(config["paths"]["test_csv"], copy_dir)
        shutil.copy(conf_path, copy_dir)

    trainer = None
    if tasks["train"]:
        trainer, info = fit(config, dict_train, dict_val, out_dir)
        print(f"\n[Training finished in "
              f"{datetime.timedelta(seconds=int(info['seconds']))} HH:MM:SS]")
        print(f"Model path : {info['best_path']}\n")

    if tasks["predict"]:
        if trainer is None:
            trainer = SegmentationTrainer(config)
            ckpt_path = config["paths"].get("ckpt_model_path") or ""
            if not ckpt_path:
                raise SystemExit(
                    "predict without train requires paths.ckpt_model_path")
            variables = ckpt_lib.init_weights_with_surgery(
                ckpt_path,
                {"params": trainer.params, "batch_stats": trainer.batch_stats})
            trainer.load_state(variables)
            trainer.replicate_to_mesh()
        out_dir_predict = out_dir / ("predictions_" + config["paths"]["out_model_name"])
        predict(config, dict_test, out_dir_predict, trainer)

        if tasks["metrics"]:
            metrics(config, out_dir_predict,
                    remove_preds=bool(tasks.get("delete_preds", False)))


# ---------------------------------------------------------------------------
# flair-detect (zone inference)
# ---------------------------------------------------------------------------

def detect_main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="flair-detect")
    parser.add_argument("--conf", help="path to the .yaml config file", required=True)
    parser.add_argument("-c", "--compare", action="store_true",
                        help="compare different methods")
    parser.add_argument("-m", "--metrics", action="store_true",
                        help="compute metrics")
    parser.add_argument("-b", "--batch_mode", action="store_true",
                        help="run on a batch of input images")
    args = parser.parse_args(argv)

    enable_compile_cache()
    config = cfgmod.read_config(args.conf)
    config["metrics"] = args.metrics
    config["batch_mode"] = args.batch_mode
    config["compare"] = args.compare
    config = cfgmod.validate_detect_config(config)

    if not config.get("use_gpu", True):
        # the reference runs zone detection on CPU when use_gpu is false
        # (src/zone_detect/main.py:239 setup_device); map it to the JAX CPU
        # backend (must happen before any device use)
        import jax

        jax.config.update("jax_platforms", "cpu")

    from flairtpu.zone.engine import run_pipeline
    from flairtpu.zone.batch import batch_metrics_pipeline

    if args.batch_mode:
        batch_metrics_pipeline(config)
    else:
        run_pipeline(config)


def _module_main() -> None:
    """python -m flairtpu.cli {flair|flair-detect} <args...>"""
    if len(sys.argv) > 1 and sys.argv[1] in ("flair", "flair-detect"):
        sub, rest = sys.argv[1], sys.argv[2:]
    elif sys.argv[0].endswith("flair-detect"):
        sub, rest = "flair-detect", sys.argv[1:]
    else:
        sub, rest = "flair", sys.argv[1:]
    (detect_main if sub == "flair-detect" else flair_main)(rest)


if __name__ == "__main__":
    _module_main()
