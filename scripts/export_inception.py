"""Export torchvision InceptionV3 weights to the .npz layout the JAX port
loads (gddim_tpu/evals/inception.py). Run on any machine with torchvision +
network access, then copy the file and set config.eval.inception_weights."""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="inception_v3.npz")
    args = parser.parse_args()
    import numpy as np
    import torchvision

    m = torchvision.models.inception_v3(weights="IMAGENET1K_V1")
    m.eval()
    np.savez(args.out, **{k: v.numpy() for k, v in m.state_dict().items()})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
