"""Export Inception weights to the npz layout gddim_tpu/evals/inception.py loads.

Two sources (run on a machine with network access, copy the npz over):

1. The tfgan/2015 FID graph (REQUIRED for FIDs comparable to the reference's
   published numbers, cld_jax/evaluation.py:27-42) via pytorch-fid's port:

       pip install pytorch-fid
       python scripts/convert_inception.py fid2015 /path/out/inception_fid2015.npz

   (downloads pt_inception-2015-12-05-6726825d.pth on first use; 1008-way
   head -> the loader auto-selects fid2015 mode.)

2. torchvision IMAGENET1K_V1 (pytorch-FID-style scores, NOT reference-
   comparable):

       python scripts/convert_inception.py torchvision /path/out/inception_v3.npz

Then set config.eval.inception_weights=/path/out/<file>.npz.
"""

import sys

import numpy as np


def export_torchvision(out_path: str):
    import torchvision

    m = torchvision.models.inception_v3(weights="IMAGENET1K_V1")
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    np.savez(out_path, **sd)


def export_fid2015(out_path: str):
    from pytorch_fid.inception import InceptionV3

    # block_idx up to the logits; pytorch-fid's model wraps the converted
    # 2015 graph weights with torchvision-compatible parameter names
    m = InceptionV3(output_blocks=[3], use_fid_inception=True)
    inner = m.blocks  # sequential wrappers around the fid inception modules
    # walk the underlying torchvision-style module to collect the state dict
    import torch

    full = torch.hub.load_state_dict_from_url(
        "https://github.com/mseitzer/pytorch-fid/releases/download/"
        "fid_weights/pt_inception-2015-12-05-6726825d.pth",
        progress=True,
    )
    sd = {k: v.numpy() for k, v in full.items()}
    np.savez(out_path, **sd)


def main():
    if len(sys.argv) != 3 or sys.argv[1] not in ("torchvision", "fid2015"):
        print(__doc__)
        sys.exit(2)
    mode, out = sys.argv[1], sys.argv[2]
    if mode == "torchvision":
        export_torchvision(out)
    else:
        export_fid2015(out)
    with np.load(out) as z:
        n = len(z.files)
        head = z["fc.weight"].shape
    print(f"wrote {out}: {n} arrays, head {head}")


if __name__ == "__main__":
    main()
