"""NFE x order sweep driver (BASELINE.json config #3).

Runs sampling + FID for NFE in {10, 20, 50} x deis_order in {0, 1, 2, 3}
against one checkpoint and writes a results table (JSONL + stdout).

    python scripts/sweep.py --config cld/accr_dcifar10 --ckpt 15 \
        --workdir logs/cld --out sweep_results
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

# GDDIM_PLATFORM=cpu|tpu pins the JAX platform through the config API (the
# axon TPU plugin overrides the JAX_PLATFORMS env var; same hook as cli.py)
_platform = os.environ.get("GDDIM_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="cld/accr_dcifar10")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--out", default="sweep_results")
    parser.add_argument("--nfes", type=int, nargs="+", default=[10, 20, 50])
    parser.add_argument("--orders", type=int, nargs="+", default=[0, 1, 2, 3])
    parser.add_argument("--method", default="deis")
    parser.add_argument("--num_samples", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    args = parser.parse_args()

    from gddim_tpu import run_lib
    from gddim_tpu.configs import get_config

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    results_path = out_dir / "sweep.jsonl"

    for nfe in args.nfes:
        for order in args.orders:
            config = get_config(args.config)
            config.sampling.method = args.method
            config.sampling.nfe = nfe
            config.sampling.deis_order = order
            if args.num_samples:
                config.eval.num_samples = args.num_samples
            if args.batch_size:
                config.eval.batch_size = args.batch_size
            folder = out_dir / f"{args.method}_nfe{nfe}_order{order}"
            run_lib.sample_data(
                config, args.ckpt, str(folder), workdir=args.workdir
            )
            report = run_lib.check_fid(config, str(folder))
            rec = {"method": args.method, "nfe": nfe, "order": order, **report}
            with open(results_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
