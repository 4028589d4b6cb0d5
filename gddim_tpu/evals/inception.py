"""JAX InceptionV3 feature extractor (weights from a local .npz export).

Placeholder for the full port: this environment has no network access and no
bundled Inception weights, so the extractor loads a user-provided export.
Export once from torchvision (CPU) with:

    import numpy as np, torch, torchvision
    m = torchvision.models.inception_v3(weights="IMAGENET1K_V1")
    np.savez("inception_v3.npz", **{k: v.numpy() for k, v in m.state_dict().items()})

and point `config.eval.inception_weights` at the file. The architecture
implementation lands with the full FID-parity pass; until then this raises a
clear error and the proxy extractor (gddim_tpu/evals/features.py) covers the
pipeline.
"""

from __future__ import annotations


def load_inception_extractor(weights_path: str):
    raise NotImplementedError(
        "The JAX InceptionV3 port requires a local weights export "
        f"(got {weights_path!r}); the architecture port is tracked for the "
        "FID-parity milestone. Use the proxy extractor meanwhile."
    )
