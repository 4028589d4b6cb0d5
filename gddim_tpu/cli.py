"""CLI entry point.

Mirrors the reference's surface (cld_jax/main.py:33-43):

    python -m gddim_tpu.cli --config cld/accr_dcifar10 \
        --mode {train,eval,sampling,fid,check,fid_stats} \
        --workdir logs/run1 --ckpt 15 --result_folder out \
        --config.sampling.nfe=50 --config.sampling.deis_order=2

`--config.<path>=<value>` overrides any config leaf (ml_collections-style).
The reference's mode dispatch bug (main.py:114-117: `if`/`else` instead of
`elif`, so every non-fid_stats mode raised after finishing) is fixed here.
"""

from __future__ import annotations

import argparse
import ast
import logging
import sys
from pathlib import Path

from gddim_tpu.configs import available_configs, get_config


def _apply_overrides(config, overrides: list[str]):
    for item in overrides:
        assert item.startswith("--config."), item
        path, _, raw = item[len("--config.") :].partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        node = config
        *parents, leaf = path.split(".")
        for p in parents:
            node = getattr(node, p)
        setattr(node, leaf, value)
    return config


def resolve_result_folder(config, base: str | None, ckpt: str) -> str:
    """Sampler-parameter-derived folder naming (reference main.py:45-75)."""
    if base:
        return base
    s = config.sampling
    name = f"ckpt{Path(str(ckpt)).name}_{s.method}_nfe{s.nfe}"
    if s.method in ("deis", "hybdeis", "mldeis", "ldeis", "sdeis"):
        name += f"_order{s.deis_order}_ts{s.ts_order}"
    if s.method in ("sdeis", "em"):
        name += f"_lam{s.lambda_coef}"
    if s.noise_removal:
        name += "_denoise"
    return str(Path("results") / name)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    overrides = [a for a in argv if a.startswith("--config.")]
    rest = [a for a in argv if not a.startswith("--config.")]

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True,
                        help=f"named config, one of {available_configs()}, or a module path")
    parser.add_argument("--mode", required=True,
                        choices=["train", "eval", "sampling", "fid", "check", "fid_stats"])
    parser.add_argument("--workdir", default="logs/default")
    parser.add_argument("--ckpt", default=None,
                        help="snapshot id (with --workdir) or path to a legacy checkpoint file")
    parser.add_argument("--result_folder", default=None)
    parser.add_argument("--eval_folder", default="eval")
    parser.add_argument("--wandb", action="store_true")
    args = parser.parse_args(rest)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )

    import os

    # GDDIM_PLATFORM=cpu|tpu forces the JAX platform through the config API
    # (this environment's TPU plugin overrides the JAX_PLATFORMS env var).
    platform = os.environ.get("GDDIM_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    # multi-host (pod) initialization via environment, before touching devices:
    #   GDDIM_NUM_PROCESSES, GDDIM_PROCESS_ID, GDDIM_COORDINATOR
    n_proc = int(os.environ.get("GDDIM_NUM_PROCESSES", "1"))
    if n_proc > 1:
        from gddim_tpu.parallel.multihost import initialize_distributed

        initialize_distributed(
            coordinator=os.environ.get("GDDIM_COORDINATOR"),
            num_processes=n_proc,
            process_id=int(os.environ.get("GDDIM_PROCESS_ID", "0")),
        )
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    fh = logging.FileHandler(workdir / "stdout.txt")
    logging.getLogger().addHandler(fh)

    config = _apply_overrides(get_config(args.config), overrides)
    config.log_wandb = bool(args.wandb)

    from gddim_tpu import run_lib

    if args.mode == "train":
        run_lib.train(config, args.workdir)
    elif args.mode == "eval":
        run_lib.evaluate(config, args.workdir, args.eval_folder)
    elif args.mode == "sampling":
        folder = resolve_result_folder(config, args.result_folder, args.ckpt)
        run_lib.sample_data(config, args.ckpt, folder, workdir=args.workdir)
    elif args.mode == "fid":
        folder = resolve_result_folder(config, args.result_folder, args.ckpt)
        run_lib.check_fid(config, folder)
    elif args.mode == "check":
        folder = resolve_result_folder(config, args.result_folder, args.ckpt)
        run_lib.sample_data(config, args.ckpt, folder, workdir=args.workdir)
        run_lib.check_fid(config, folder)
    elif args.mode == "fid_stats":
        run_lib.fid_stats(config)
    else:  # pragma: no cover
        raise ValueError(f"mode {args.mode} not recognized")


if __name__ == "__main__":
    main()
