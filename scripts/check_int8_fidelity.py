"""Sampling fidelity of the quantized path: fused bf16 vs fused int8.

Same seed, same weights, full NFE sampling on both paths; reports per-pixel
agreement AND the proxy-FID of each sample set against a held-out corpus
(so the int8 claim is a distribution-level delta, not just pixel
correlation). With --workdir/--ckpt the weights are a TRAINED checkpoint
(EMA params) — the distribution-dependent quantization error then reflects
real activations, not random init.

    # trained-weights run (after training cld/simple_cifar10 on the chip):
    PYTHONPATH=. python scripts/check_int8_fidelity.py \
        --config cld/simple_cifar10 --workdir /tmp/fid_run --ckpt 2 \
        --nfe 50 --batch 64 --rounds 4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_sampler(config, conv_impl, workdir, ckpt, static=False):
    from gddim_tpu import run_lib
    from gddim_tpu.math.cld import CLD
    from gddim_tpu.models import calibrate as cal
    from gddim_tpu.models import init_model, make_cld_eps_fn
    from gddim_tpu.samplers.factory import build_cld_sampler

    config.model.conv_impl = conv_impl
    if workdir:
        model, state = run_lib.restore_state(config, ckpt, workdir)
        variables = run_lib._ema_variables(state)
    else:
        model, model_state, params = init_model(jax.random.PRNGKey(0), config)
        variables = {"params": params, **model_state}
    sde = CLD.from_config(config)
    if static:
        qs = cal.calibrate_cld_qscales(
            config, model, variables, sde, batch=8, nfe=12
        )
        variables = dict(variables, qscales=qs)
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 and a.ndim >= 2
        else a,
        variables,
    )
    eps_apply = make_cld_eps_fn(sde, model, train=False)
    s = config.data.image_size
    sampler = build_cld_sampler(
        config, sde, eps_apply, (s, s, 3), inverse_scaler=lambda x: (x + 1) / 2
    )
    return sampler, variables


def proxy_fid(config, samples_uint8, ref_images_uint8):
    from gddim_tpu.evals.features import get_feature_extractor, run_features_sharded
    from gddim_tpu.evals.fid import frechet_distance

    ext = get_feature_extractor(config)
    fa, _ = run_features_sharded(ext, samples_uint8)
    fb, _ = run_features_sharded(ext, ref_images_uint8)
    mu_a, s_a = fa.mean(0), np.cov(fa, rowvar=False)
    mu_b, s_b = fb.mean(0), np.cov(fb, rowvar=False)
    return frechet_distance(mu_a, s_a, mu_b, s_b)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="cld/accr_dcifar10")
    p.add_argument("--workdir", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--nfe", type=int, default=50)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--rounds", type=int, default=1)
    args = p.parse_args()

    from gddim_tpu.configs import get_config
    from gddim_tpu.data.pipelines import _synthetic_images

    variants = [
        ("bf16_fused", "fused", False),
        ("int8_dynamic", "fused_int8", False),
        ("int8_static", "fused_int8", True),
    ]
    stats = {}
    for name, conv, static in variants:
        config = get_config(args.config)
        config.model.dtype = "bfloat16"
        config.model.attention_impl = "auto"
        config.sampling.method = "deis"
        config.sampling.nfe = args.nfe
        config.sampling.deis_order = 2
        config.sampling.ts_order = 2
        config.sampling.noise_removal = True
        sampler, variables = build_sampler(
            config, conv, args.workdir, args.ckpt, static=static
        )
        rounds = []
        for r in range(args.rounds):
            x, v, nfe = sampler(jax.random.PRNGKey(7 + r), variables, args.batch)
            rounds.append(np.asarray(x, np.float32))
        stats[name] = np.concatenate(rounds, 0)
        print(f"{name}: {stats[name].shape[0]} samples", flush=True)

    a = stats["bf16_fused"]
    n_ref = max(256, a.shape[0])
    u8 = lambda z: np.clip(z * 255.0, 0, 255).astype(np.uint8)
    ref = _synthetic_images(config, n_ref, seed=config.seed + 1)
    fid_a = proxy_fid(config, u8(a), ref)
    print(f"bf16_fused proxy-FID: {fid_a:.4f}")
    for name in ("int8_dynamic", "int8_static"):
        b = stats[name]
        assert np.isfinite(b).all()
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        # distribution-level delta: proxy-FID vs a held-out synthetic corpus
        # (train corpus uses seed=config.seed; held-out = offset seed)
        fid_b = proxy_fid(config, u8(b), ref)
        print(
            f"{name}: pixel corr {corr:.5f}  max|dx| {np.abs(a-b).max():.4f}  "
            f"mean {b.mean():.4f} (bf16 {a.mean():.4f})  "
            f"proxy-FID {fid_b:.4f} (delta {fid_b - fid_a:+.4f}, "
            f"{(fid_b-fid_a)/max(fid_a,1e-9)*100:+.2f}%)"
        )


if __name__ == "__main__":
    main()
