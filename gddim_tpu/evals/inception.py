"""JAX InceptionV3 feature extractor (torchvision weight layout).

Replaces the reference's TF-Hub inception graph (cld_jax/evaluation.py:37-42)
with a pure-JAX functional InceptionV3 that loads a locally exported
torchvision state_dict (this environment has no network egress). Export once:

    import numpy as np, torch, torchvision
    m = torchvision.models.inception_v3(weights="IMAGENET1K_V1")
    np.savez("inception_v3.npz", **{k: v.numpy() for k, v in m.state_dict().items()})

then set `config.eval.inception_weights=/path/to/inception_v3.npz`.

Output dict matches the FID pipeline convention: `pool_3` = 2048-d global
average pool (pytorch-FID standard), `logits` = 1000-d fc output. BatchNorm is
folded into per-channel scale/shift at load time; convs run in NHWC.

Structural correctness (branch widths, strides, padding, concat order) is
unit-tested against randomly generated state dicts of the exact torchvision
shapes (tests/test_inception.py); numerical parity additionally requires the
real weight export.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm eps


def _fold_bn(sd: dict, prefix: str):
    """Fold conv + BN into (HWIO kernel, scale, shift)."""
    w = np.asarray(sd[f"{prefix}.conv.weight"])  # OIHW
    gamma = np.asarray(sd[f"{prefix}.bn.weight"])
    beta = np.asarray(sd[f"{prefix}.bn.bias"])
    mean = np.asarray(sd[f"{prefix}.bn.running_mean"])
    var = np.asarray(sd[f"{prefix}.bn.running_var"])
    scale = gamma / np.sqrt(var + _BN_EPS)
    shift = beta - mean * scale
    kernel = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    return (
        jnp.asarray(kernel, jnp.float32),
        jnp.asarray(scale, jnp.float32),
        jnp.asarray(shift, jnp.float32),
    )


def _conv_bn_relu(x, folded, stride=1, padding=((0, 0), (0, 0))):
    kernel, scale, shift = folded
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        (stride, stride),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y * scale + shift)


def _avgpool3(x):
    """3x3 stride-1 pad-1 average pool, torchvision semantics: the branch
    pools use F.avg_pool2d(..., count_include_pad=True default), i.e. always
    divide by 9 (zeros included at the borders)."""
    y = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return y / 9.0


def _avgpool3_excl(x):
    """3x3 stride-1 pad-1 average pool EXCLUDING padding from the divisor
    (count_include_pad=False) — the tfgan/2015 FID graph's branch-pool
    semantics (reference scores against this graph, evaluation.py:27-42)."""
    y = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    count = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return y / count


def _maxpool3s1(x):
    """3x3 stride-1 pad-1 max pool: the 2015 graph's Mixed_7c pool branch
    (reproduced bug-for-bug by pytorch-fid's FIDInceptionE_2)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _tf1_resize_bilinear(x, size: int):
    """TF1 ResizeBilinear with align_corners=False: source coordinate is
    i * (in/out) (asymmetric transform, no half-pixel offset) — what the
    tfgan inception module applies internally. jax.image.resize uses
    half-pixel sampling, which scores measurably different FIDs."""
    b, h, w, c = x.shape

    def axis_weights(n_in, n_out):
        src = np.arange(n_out, dtype=np.float64) * (n_in / n_out)
        i0 = np.floor(src).astype(np.int64)
        i0 = np.clip(i0, 0, n_in - 1)
        i1 = np.minimum(i0 + 1, n_in - 1)
        frac = (src - i0).astype(np.float32)
        return jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(frac)

    r0, r1, rf = axis_weights(h, size)
    c0, c1, cf = axis_weights(w, size)
    top = x[:, r0]
    bot = x[:, r1]
    rows = top + rf[None, :, None, None] * (bot - top)
    left = rows[:, :, c0]
    right = rows[:, :, c1]
    return left + cf[None, None, :, None] * (right - left)


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


class InceptionV3:
    """mode='torchvision': the modern IMAGENET1K_V1 network (1000 logits).
    mode='fid2015': the tfgan/2015 frozen FID graph the reference scores with
    (cld_jax/evaluation.py:27-42) — exclusive-pad branch avg-pools, a MAX
    pool branch in Mixed_7c, 1008 logits, TF1 asymmetric bilinear resize.
    Weights: pytorch-fid's pt_inception-2015-12-05 state dict exported to
    npz (same key layout as torchvision)."""

    def __init__(self, state_dict: dict, mode: str = "torchvision"):
        assert mode in ("torchvision", "fid2015"), mode
        self.sd = state_dict
        self.mode = mode
        self._folded = {}

    def _branch_avgpool(self, x):
        return _avgpool3_excl(x) if self.mode == "fid2015" else _avgpool3(x)

    def _f(self, prefix):
        if prefix not in self._folded:
            self._folded[prefix] = _fold_bn(self.sd, prefix)
        return self._folded[prefix]

    # --- blocks ------------------------------------------------------------
    def _inception_a(self, x, name):
        b1 = _conv_bn_relu(x, self._f(f"{name}.branch1x1"))
        b5 = _conv_bn_relu(x, self._f(f"{name}.branch5x5_1"))
        b5 = _conv_bn_relu(b5, self._f(f"{name}.branch5x5_2"), padding=_pad(2))
        b3 = _conv_bn_relu(x, self._f(f"{name}.branch3x3dbl_1"))
        b3 = _conv_bn_relu(b3, self._f(f"{name}.branch3x3dbl_2"), padding=_pad(1))
        b3 = _conv_bn_relu(b3, self._f(f"{name}.branch3x3dbl_3"), padding=_pad(1))
        bp = self._branch_avgpool(x)
        bp = _conv_bn_relu(bp, self._f(f"{name}.branch_pool"))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)

    def _inception_b(self, x, name):
        b3 = _conv_bn_relu(x, self._f(f"{name}.branch3x3"), stride=2)
        bd = _conv_bn_relu(x, self._f(f"{name}.branch3x3dbl_1"))
        bd = _conv_bn_relu(bd, self._f(f"{name}.branch3x3dbl_2"), padding=_pad(1))
        bd = _conv_bn_relu(bd, self._f(f"{name}.branch3x3dbl_3"), stride=2)
        bp = _maxpool3s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)

    def _inception_c(self, x, name):
        b1 = _conv_bn_relu(x, self._f(f"{name}.branch1x1"))
        b7 = _conv_bn_relu(x, self._f(f"{name}.branch7x7_1"))
        b7 = _conv_bn_relu(b7, self._f(f"{name}.branch7x7_2"), padding=_pad((0, 3)))
        b7 = _conv_bn_relu(b7, self._f(f"{name}.branch7x7_3"), padding=_pad((3, 0)))
        bd = _conv_bn_relu(x, self._f(f"{name}.branch7x7dbl_1"))
        bd = _conv_bn_relu(bd, self._f(f"{name}.branch7x7dbl_2"), padding=_pad((3, 0)))
        bd = _conv_bn_relu(bd, self._f(f"{name}.branch7x7dbl_3"), padding=_pad((0, 3)))
        bd = _conv_bn_relu(bd, self._f(f"{name}.branch7x7dbl_4"), padding=_pad((3, 0)))
        bd = _conv_bn_relu(bd, self._f(f"{name}.branch7x7dbl_5"), padding=_pad((0, 3)))
        bp = self._branch_avgpool(x)
        bp = _conv_bn_relu(bp, self._f(f"{name}.branch_pool"))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)

    def _inception_d(self, x, name):
        b3 = _conv_bn_relu(x, self._f(f"{name}.branch3x3_1"))
        b3 = _conv_bn_relu(b3, self._f(f"{name}.branch3x3_2"), stride=2)
        b7 = _conv_bn_relu(x, self._f(f"{name}.branch7x7x3_1"))
        b7 = _conv_bn_relu(b7, self._f(f"{name}.branch7x7x3_2"), padding=_pad((0, 3)))
        b7 = _conv_bn_relu(b7, self._f(f"{name}.branch7x7x3_3"), padding=_pad((3, 0)))
        b7 = _conv_bn_relu(b7, self._f(f"{name}.branch7x7x3_4"), stride=2)
        bp = _maxpool3s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)

    def _inception_e(self, x, name, pool_branch="avg"):
        b1 = _conv_bn_relu(x, self._f(f"{name}.branch1x1"))
        b3 = _conv_bn_relu(x, self._f(f"{name}.branch3x3_1"))
        b3a = _conv_bn_relu(b3, self._f(f"{name}.branch3x3_2a"), padding=_pad((0, 1)))
        b3b = _conv_bn_relu(b3, self._f(f"{name}.branch3x3_2b"), padding=_pad((1, 0)))
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = _conv_bn_relu(x, self._f(f"{name}.branch3x3dbl_1"))
        bd = _conv_bn_relu(bd, self._f(f"{name}.branch3x3dbl_2"), padding=_pad(1))
        bda = _conv_bn_relu(bd, self._f(f"{name}.branch3x3dbl_3a"), padding=_pad((0, 1)))
        bdb = _conv_bn_relu(bd, self._f(f"{name}.branch3x3dbl_3b"), padding=_pad((1, 0)))
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = (
            _maxpool3s1(x) if pool_branch == "max" else self._branch_avgpool(x)
        )
        bp = _conv_bn_relu(bp, self._f(f"{name}.branch_pool"))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)

    # --- full network --------------------------------------------------------
    def __call__(self, images):
        """images: (B, H, W, 3) float/uint8 in [0, 255]. Returns pool_3/logits."""
        if self.mode == "fid2015":
            # tfgan pipeline: (x - 127.5) / 127.5 then the module's internal
            # TF1 asymmetric bilinear resize (evaluation.py:100-102)
            x = (images.astype(jnp.float32) - 127.5) / 127.5
            x = _tf1_resize_bilinear(x, 299)
        else:
            x = images.astype(jnp.float32) / 255.0
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, 3), "bilinear", antialias=False
            )
            x = (x - 0.5) / 0.5  # pytorch-FID convention: [-1, 1]

        x = _conv_bn_relu(x, self._f("Conv2d_1a_3x3"), stride=2)
        x = _conv_bn_relu(x, self._f("Conv2d_2a_3x3"))
        x = _conv_bn_relu(x, self._f("Conv2d_2b_3x3"), padding=_pad(1))
        x = _maxpool3s2(x)
        x = _conv_bn_relu(x, self._f("Conv2d_3b_1x1"))
        x = _conv_bn_relu(x, self._f("Conv2d_4a_3x3"))
        x = _maxpool3s2(x)
        x = self._inception_a(x, "Mixed_5b")
        x = self._inception_a(x, "Mixed_5c")
        x = self._inception_a(x, "Mixed_5d")
        x = self._inception_b(x, "Mixed_6a")
        for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = self._inception_c(x, n)
        x = self._inception_d(x, "Mixed_7a")
        x = self._inception_e(x, "Mixed_7b")
        x = self._inception_e(
            x, "Mixed_7c", pool_branch="max" if self.mode == "fid2015" else "avg"
        )

        pool = jnp.mean(x, axis=(1, 2))  # (B, 2048)
        w = jnp.asarray(np.asarray(self.sd["fc.weight"]), jnp.float32)  # (n_cls, 2048)
        b = jnp.asarray(np.asarray(self.sd["fc.bias"]), jnp.float32)
        logits = pool @ w.T + b
        return {"pool_3": pool, "logits": logits}


def load_inception_extractor(weights_path: str):
    """Build the FID feature extractor from a local weights npz.

    The network variant is inferred from the classifier head: 1008 classes =
    the tfgan/2015 FID graph (export pytorch-fid's pt_inception-2015-12-05
    state dict — reports are then comparable to the reference's published
    FIDs); 1000 classes = torchvision IMAGENET1K_V1.
    """
    from gddim_tpu.evals.features import FeatureExtractor

    path = Path(weights_path)
    if not path.exists():
        raise FileNotFoundError(
            f"inception weights not found at {weights_path}; export them from "
            "torchvision or pytorch-fid (see gddim_tpu/evals/inception.py)"
        )
    with np.load(path) as z:
        sd = {k: z[k] for k in z.files}
    n_classes = int(np.asarray(sd["fc.weight"]).shape[0])
    mode = "fid2015" if n_classes == 1008 else "torchvision"
    net = InceptionV3(sd, mode=mode)
    apply_fn = jax.jit(net.__call__)
    name = "inception_fid2015" if mode == "fid2015" else "inception_v3"
    return FeatureExtractor(name, apply_fn, 2048, n_classes)


def random_state_dict(rng: np.random.Generator | None = None,
                      n_classes: int = 1000) -> dict:
    """Random torchvision/fid2015-shaped state dict (for structural tests)."""
    rng = rng or np.random.default_rng(0)
    sd = {}

    def conv(prefix, cin, cout, kh, kw):
        sd[f"{prefix}.conv.weight"] = rng.normal(
            size=(cout, cin, kh, kw)
        ).astype(np.float32) * 0.05
        for name, val in [
            ("bn.weight", np.ones(cout)),
            ("bn.bias", np.zeros(cout)),
            ("bn.running_mean", np.zeros(cout)),
            ("bn.running_var", np.ones(cout)),
        ]:
            sd[f"{prefix}.{name}"] = val.astype(np.float32)
        return cout

    conv("Conv2d_1a_3x3", 3, 32, 3, 3)
    conv("Conv2d_2a_3x3", 32, 32, 3, 3)
    conv("Conv2d_2b_3x3", 32, 64, 3, 3)
    conv("Conv2d_3b_1x1", 64, 80, 1, 1)
    conv("Conv2d_4a_3x3", 80, 192, 3, 3)

    def inception_a(name, cin, pool_features):
        conv(f"{name}.branch1x1", cin, 64, 1, 1)
        conv(f"{name}.branch5x5_1", cin, 48, 1, 1)
        conv(f"{name}.branch5x5_2", 48, 64, 5, 5)
        conv(f"{name}.branch3x3dbl_1", cin, 64, 1, 1)
        conv(f"{name}.branch3x3dbl_2", 64, 96, 3, 3)
        conv(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        conv(f"{name}.branch_pool", cin, pool_features, 1, 1)
        return 64 + 64 + 96 + pool_features

    def inception_b(name, cin):
        conv(f"{name}.branch3x3", cin, 384, 3, 3)
        conv(f"{name}.branch3x3dbl_1", cin, 64, 1, 1)
        conv(f"{name}.branch3x3dbl_2", 64, 96, 3, 3)
        conv(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        return 384 + 96 + cin

    def inception_c(name, cin, c7):
        conv(f"{name}.branch1x1", cin, 192, 1, 1)
        conv(f"{name}.branch7x7_1", cin, c7, 1, 1)
        conv(f"{name}.branch7x7_2", c7, c7, 1, 7)
        conv(f"{name}.branch7x7_3", c7, 192, 7, 1)
        conv(f"{name}.branch7x7dbl_1", cin, c7, 1, 1)
        conv(f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
        conv(f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
        conv(f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
        conv(f"{name}.branch7x7dbl_5", c7, 192, 1, 7)
        conv(f"{name}.branch_pool", cin, 192, 1, 1)
        return 192 * 4

    def inception_d(name, cin):
        conv(f"{name}.branch3x3_1", cin, 192, 1, 1)
        conv(f"{name}.branch3x3_2", 192, 320, 3, 3)
        conv(f"{name}.branch7x7x3_1", cin, 192, 1, 1)
        conv(f"{name}.branch7x7x3_2", 192, 192, 1, 7)
        conv(f"{name}.branch7x7x3_3", 192, 192, 7, 1)
        conv(f"{name}.branch7x7x3_4", 192, 192, 3, 3)
        return 320 + 192 + cin

    def inception_e(name, cin):
        conv(f"{name}.branch1x1", cin, 320, 1, 1)
        conv(f"{name}.branch3x3_1", cin, 384, 1, 1)
        conv(f"{name}.branch3x3_2a", 384, 384, 1, 3)
        conv(f"{name}.branch3x3_2b", 384, 384, 3, 1)
        conv(f"{name}.branch3x3dbl_1", cin, 448, 1, 1)
        conv(f"{name}.branch3x3dbl_2", 448, 384, 3, 3)
        conv(f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
        conv(f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
        conv(f"{name}.branch_pool", cin, 192, 1, 1)
        return 320 + 768 + 768 + 192

    c = 192
    c = inception_a("Mixed_5b", c, 32)
    c = inception_a("Mixed_5c", c, 64)
    c = inception_a("Mixed_5d", c, 64)
    c = inception_b("Mixed_6a", c)
    for n, c7 in [("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160), ("Mixed_6e", 192)]:
        c = inception_c(n, c, c7)
    c = inception_d("Mixed_7a", c)
    c = inception_e("Mixed_7b", c)
    c = inception_e("Mixed_7c", c)
    assert c == 2048, c
    sd["fc.weight"] = rng.normal(size=(n_classes, 2048)).astype(np.float32) * 0.02
    sd["fc.bias"] = np.zeros(n_classes, dtype=np.float32)
    return sd
