"""Run orchestration: train / evaluate / sampling / fid modes.

Mirrors the reference surface (cld_jax/run_lib.py: train :76, evaluate :278,
sample_data :674, check_fid :735, fid_stats :796) on the TPU-native stack:
one jitted train step over a `Mesh` instead of pmap, orbax two-tier
checkpoints instead of flax.training.checkpoints, JSONL metrics instead of a
mandatory wandb, and a JAX feature extractor for FID instead of TF-Hub.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gddim_tpu import checkpoints as ckpt_lib
from gddim_tpu.configs import get_config  # noqa: F401  (re-export convenience)
from gddim_tpu.data import (
    get_data_inverse_scaler,
    get_data_scaler,
    get_data_shape,
    get_dataset,
)
from gddim_tpu.evals import (
    activation_stats,
    frechet_distance,
    get_feature_extractor,
    inception_score,
    kernel_distance,
    load_dataset_stats,
    run_features_sharded,
)
from gddim_tpu.math.blur import from_config as blur_from_config
from gddim_tpu.math.cld import CLD
from gddim_tpu.models import init_model, make_blur_yeps_fn, make_cld_eps_fn
from gddim_tpu.parallel import make_mesh, replicate_to_mesh
from gddim_tpu.samplers.blur import build_blur_sampler_from_config
from gddim_tpu.samplers.factory import build_cld_sampler
from gddim_tpu.train import (
    create_train_state,
    make_blur_loss_fn,
    make_cld_loss_fn,
    make_eval_step,
    make_train_step,
)
from gddim_tpu.utils.images import save_image, save_pointset
from gddim_tpu.utils.logging import MetricsLogger

logger = logging.getLogger("gddim_tpu")


def is_cld(config) -> bool:
    return str(getattr(config, "sde", "cld")).lower() == "cld"


def build_sde(config):
    if is_cld(config):
        return CLD.from_config(config)
    return blur_from_config(config)


def build_sampling_fn(config, sde, model, inverse_scaler, mesh=None):
    """sample_fn(rng, variables, batch_size) -> (x, [v,] nfe).

    With `mesh`, sample generation runs data-parallel across the mesh
    (sharded-batch replacement for the reference's pmapped samplers)."""
    data_shape = get_data_shape(config)
    if is_cld(config):
        eps_apply = make_cld_eps_fn(sde, model, train=False)
        return build_cld_sampler(
            config, sde, eps_apply, data_shape, inverse_scaler, mesh=mesh
        )
    yeps_apply = make_blur_yeps_fn(sde, model, train=False)
    return build_blur_sampler_from_config(
        config, sde, yeps_apply, data_shape, inverse_scaler, mesh=mesh
    )


def _ema_variables(state):
    ms = state.model_state if isinstance(state.model_state, dict) else dict(state.model_state)
    return {"params": state.params_ema, **ms}


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------


def _place_train_state(config, state):
    """Build the training mesh from config.mesh and place the state on it.

    config.mesh knobs (all optional): `fsdp_axis` — ZeRO-3-shard the large
    parameter/optimizer leaves over that many devices; `tp_axis` —
    Megatron-style channel tensor parallelism over that many devices
    (parallel/mesh.py:tp_shard_params); the rest of the devices form the
    'data' axis. Default (both 1): 1-D data-parallel mesh, state replicated —
    the TPU-native equivalent of the reference's pmap layout
    (cld_jax/run_lib.py:144-157).
    """
    from gddim_tpu.parallel.mesh import (
        fsdp_shard_params,
        make_mesh_2d,
        make_mesh_3d,
        tp_shard_params,
    )

    mesh_cfg = getattr(config, "mesh", None)
    n_fsdp = max(1, int(getattr(mesh_cfg, "fsdp_axis", 1) or 1))
    n_tp = max(1, int(getattr(mesh_cfg, "tp_axis", 1) or 1))
    n_dev = jax.device_count()
    assert n_dev % (n_fsdp * n_tp) == 0, (n_dev, n_fsdp, n_tp)
    n_data = n_dev // (n_fsdp * n_tp)

    if n_fsdp == 1 and n_tp == 1:
        mesh = make_mesh()
        return mesh, replicate_to_mesh(state, mesh), (
            lambda s: replicate_to_mesh(s, mesh)
        )
    if n_tp == 1:
        mesh = make_mesh_2d(n_data, n_fsdp)
        shard = lambda tree: fsdp_shard_params(tree, mesh, axis="model")
    elif n_fsdp == 1:
        mesh = make_mesh_2d(n_data, n_tp)
        shard = lambda tree: tp_shard_params(tree, mesh, axis="model")
    else:
        mesh = make_mesh_3d(n_data, n_fsdp, n_tp)
        shard = lambda tree: tp_shard_params(
            tree, mesh, axis="model", fsdp_axis="fsdp"
        )

    def place(s):
        # optimizer moments follow the param shardings (ZeRO's point);
        # scalar leaves (step counts) fall under the min-size cutoff and
        # replicate
        s = replicate_to_mesh(s, mesh)
        return s.replace(
            params=shard(s.params),
            params_ema=shard(s.params_ema),
            opt_state=shard(s.opt_state),
        )

    return mesh, place(state), place


def train(config, workdir: str):
    # TPU-native hardware PRNG for the training streams (dropout masks,
    # t-draws, perturbation noise): threefry mask generation costs ~19% of a
    # flagship step on TPU; rbg is the on-chip generator (measured +12%
    # throughput, PERF.md). 'threefry' remains available where bit-exact
    # invariance of the RNG stream across mesh shardings matters. The global
    # default is restored on exit so embedding callers (tests) are
    # unaffected; note a run's meta-checkpoints carry its impl's key shape,
    # so resume with the same training.prng_impl.
    prng_impl = str(getattr(config.training, "prng_impl", "rbg"))
    prev_impl = jax.config.jax_default_prng_impl
    jax.config.update("jax_default_prng_impl", prng_impl)
    try:
        return _train(config, workdir)
    finally:
        jax.config.update("jax_default_prng_impl", prev_impl)


def _train(config, workdir: str):
    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    sample_dir = workdir / "samples"
    is_host0 = jax.process_index() == 0  # host-0 exclusivity for logging/IO
    metrics = (
        MetricsLogger(
            workdir,
            enable_wandb=bool(getattr(config, "log_wandb", False)),
            project=f"gddim_tpu_{getattr(config, 'sde', 'cld')}",
            config=config,
        )
        if is_host0
        else None
    )

    rng = jax.random.PRNGKey(config.seed)
    rng, init_rng, state_rng = jax.random.split(rng, 3)
    model, model_state, params = init_model(init_rng, config)
    state = create_train_state(state_rng, config, params, model_state)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.info("model %s: %.2fM params", config.model.name, n_params / 1e6)

    mgr = ckpt_lib.CheckpointManager(workdir)
    state, initial_step = mgr.restore_latest_meta(state)
    initial_step = int(np.asarray(state.step))

    mesh, state, place_state = _place_train_state(config, state)

    n_jitted = int(config.training.n_jitted_steps)
    train_iter, _ = get_dataset(
        config,
        additional_dim=n_jitted,
        uniform_dequantization=config.data.uniform_dequantization,
    )
    # eval batches have no scan axis (single eval step per eval_freq)
    _, eval_iter = get_dataset(
        config,
        additional_dim=None,
        uniform_dequantization=config.data.uniform_dequantization,
    )
    scaler = get_data_scaler(config)
    inverse_scaler = get_data_inverse_scaler(config)

    sde = build_sde(config)
    if is_cld(config):
        loss_fn = make_cld_loss_fn(
            sde, model, train=True, reduce_mean=config.training.reduce_mean,
            likelihood_weighting=config.training.likelihood_weighting,
        )
        eval_loss_fn = make_cld_loss_fn(
            sde, model, train=False, reduce_mean=config.training.reduce_mean
        )
    else:
        loss_fn = make_blur_loss_fn(
            sde, model, train=True, reduce_mean=config.training.reduce_mean
        )
        eval_loss_fn = make_blur_loss_fn(
            sde, model, train=False, reduce_mean=config.training.reduce_mean
        )
    train_step = make_train_step(config, loss_fn, mesh=mesh)
    eval_step = make_eval_step(config, eval_loss_fn)

    sampling_fn = None
    if config.training.snapshot_sampling:
        sampling_fn = build_sampling_fn(config, sde, model, inverse_scaler)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from gddim_tpu.parallel.mesh import put_local_shard

    batch_sharding = NamedSharding(mesh, P(None, "data"))

    def put_batch(batch):
        return jax.tree.map(
            lambda x: put_local_shard(scaler(np.asarray(x)), batch_sharding), batch
        )

    n_iters = int(config.training.n_iters)
    log_freq = int(config.training.log_freq)
    eval_freq = int(config.training.eval_freq)
    snapshot_freq = int(config.training.snapshot_freq)
    preempt_freq = int(config.training.snapshot_freq_for_preemption)
    ema_update_freq = int(getattr(config.training, "ema_update_freq", 10**9))
    sampling_freq = int(
        getattr(config.training, "snapshot_freq_for_sampling", snapshot_freq)
    )

    # profiling hooks (the reference has none, SURVEY.md section 5): set
    # training.profile_start/profile_steps to capture an XLA trace.
    profile_start = int(getattr(config.training, "profile_start", -1))
    profile_steps = int(getattr(config.training, "profile_steps", 5))
    profiling = False

    logger.info("starting training at step %d", initial_step)
    t_last = time.time()
    for step in range(initial_step, n_iters, n_jitted):
        if profile_start >= 0 and not profiling and step >= profile_start:
            jax.profiler.start_trace(str(workdir / "profile"))
            profiling = True
        batch = put_batch(next(train_iter))
        state, info = train_step(state, batch)
        cur = step + n_jitted
        if profiling and step >= profile_start + profile_steps:
            jax.tree.map(
                lambda x: x.block_until_ready(), jax.tree.leaves(info)
            )
            jax.profiler.stop_trace()
            profiling = False
            profile_start = -1

        if cur % log_freq < n_jitted:
            loss = float(np.asarray(info["score_loss"]))
            dt = time.time() - t_last
            t_last = time.time()
            ips = config.training.batch_size * log_freq / max(dt, 1e-9)
            logger.info("step %d loss %.5f (%.1f img/s)", cur, loss, ips)
            if metrics:
                metrics.log(
                    {"train/score_loss": loss, "train/imgs_per_sec": ips}, cur
                )

        if cur % preempt_freq < n_jitted:
            mgr.save_meta(cur, jax.device_get(state))

        # occasional params <- params_ema swap with a fresh optimizer
        # (reference run_lib.py:203-209; inert at the default freq of 1e9)
        if step != initial_step and cur % ema_update_freq < n_jitted:
            from gddim_tpu.train.state import swap_params_from_ema

            state = place_state(
                swap_params_from_ema(jax.device_get(state), config)
            )
            logger.info("step %d: update params from ema", cur)

        if cur % eval_freq < n_jitted:
            eval_batch = jax.tree.map(
                lambda x: jnp.asarray(scaler(x)), next(eval_iter)
            )
            rng, eval_rng = jax.random.split(rng)
            einfo = eval_step(state, eval_batch, eval_rng)
            if metrics:
                metrics.log(
                    {"eval/score_loss": float(np.asarray(einfo["score_loss"]))}, cur
                )

        if cur % snapshot_freq < n_jitted:
            mgr.save_snapshot(cur // snapshot_freq, jax.device_get(state))

        if sampling_fn is not None and cur % sampling_freq < n_jitted:
            rng, sample_rng = jax.random.split(rng)
            out = sampling_fn(
                sample_rng,
                _ema_variables(state),
                int(config.training.snapshot_sampling_batch),
            )
            if is_host0:
                x = np.asarray(out[0])
                this_dir = sample_dir / f"iter_{cur}"
                this_dir.mkdir(parents=True, exist_ok=True)
                if x.ndim == 4:
                    save_image(x[:64], this_dir / "sample.png")
                else:
                    save_pointset(x, this_dir / "sample.png")
                if metrics:
                    metrics.log_image("samples", this_dir / "sample.png", cur)

    mgr.save_meta(n_iters, jax.device_get(state))
    mgr.wait()
    if metrics:
        metrics.close()
    return state


# ---------------------------------------------------------------------------
# sampling / FID
# ---------------------------------------------------------------------------


def restore_state(config, ckpt: str | int, workdir: str | None = None):
    """Restore a TrainState from an orbax snapshot id or a legacy msgpack file."""
    # the stored state.rng was created under training.prng_impl (train()
    # pins it): the restore template must match, or orbax rejects the key
    # shape (rbg keys are (4,) uint32, threefry (2,)) in any fresh process
    # that restores without training first (sample/eval/fid modes)
    jax.config.update(
        "jax_default_prng_impl",
        str(getattr(config.training, "prng_impl", "rbg")),
    )
    rng = jax.random.PRNGKey(config.seed)
    model, model_state, params = init_model(rng, config)
    state = create_train_state(jax.random.PRNGKey(0), config, params, model_state)
    ckpt_path = Path(str(ckpt))
    if ckpt_path.exists() and ckpt_path.is_file():
        legacy = ckpt_lib.load_legacy_checkpoint(ckpt_path)
        state = ckpt_lib.legacy.into_train_state(legacy, state)
        return model, state
    if workdir is None:
        raise ValueError("numeric checkpoint id requires --workdir")
    mgr = ckpt_lib.CheckpointManager(workdir)
    state = mgr.restore_snapshot(int(ckpt), state)
    return model, state


def sampling_from_fn(config, sampling_fn, state, result_folder: Path,
                     num_samples: int, batch_size: int, seed: int = 0,
                     is_continue: bool = True):
    """Round loop writing samples_<r>.npz (reference run_lib.py:646-731).

    Multi-process runs shard rounds across hosts (round r belongs to process
    r % nproc) and synchronize with a collective barrier afterwards —
    replacing the reference's per-host sample dirs + filesystem polling
    (run_lib.py:511-513,560-617). All hosts write distinct files into the
    shared result folder, so the aggregation step can read them uniformly.
    """
    from gddim_tpu.parallel import barrier

    result_folder.mkdir(parents=True, exist_ok=True)
    variables = _ema_variables(state)
    rng = jax.random.PRNGKey(seed)
    n_rounds = int(np.ceil(num_samples / batch_size))
    nproc, pidx = jax.process_count(), jax.process_index()
    for r in range(n_rounds):
        out_path = result_folder / f"samples_{r}.npz"
        rng, sample_rng = jax.random.split(rng)
        if r % nproc != pidx:
            continue
        if is_continue and out_path.exists():
            continue
        t0 = time.time()
        out = sampling_fn(sample_rng, variables, batch_size)
        if len(out) == 3:
            x, v, nfe = out
            extra = {"v": np.asarray(v)}
        else:
            x, nfe = out
            extra = {}
        x = np.asarray(x)
        if not np.isfinite(x).all():
            # the uint8 cast below would silently swallow NaN/inf (e.g. the
            # reference_exact hybdeis grid at small NFE, whose duplicated
            # support points NaN the Lagrange weights — a reference bug we
            # reproduce under that flag)
            logger.warning(
                "round %d: %d non-finite sample values before uint8 cast",
                r + 1, int((~np.isfinite(x)).sum()),
            )
        x8 = np.clip(x * 255.0, 0, 255).astype(np.uint8)
        np.savez_compressed(out_path, samples=x8, nfe=nfe, **extra)
        logger.info(
            "round %d/%d: %d samples in %.1fs (nfe=%s)",
            r + 1, n_rounds, batch_size, time.time() - t0, nfe,
        )
    barrier("sampling_rounds_done")
    return n_rounds


def sample_data(config, ckpt: str, result_folder: str, workdir: str | None = None):
    """Generate config.eval.num_samples samples (reference run_lib.py:674-731)."""
    result_folder = Path(result_folder)
    model, state = restore_state(config, ckpt, workdir)
    inverse_scaler = get_data_inverse_scaler(config)
    sde = build_sde(config)
    # sampling rounds are independent: each host runs its rounds on a mesh of
    # its LOCAL devices (the reference's per-host pmap layout), while round
    # ownership is sharded across processes inside sampling_from_fn
    mesh = make_mesh(devices=jax.local_devices())
    state = replicate_to_mesh(state, mesh)
    sampling_fn = build_sampling_fn(config, sde, model, inverse_scaler, mesh=mesh)
    return sampling_from_fn(
        config,
        sampling_fn,
        state,
        result_folder,
        int(config.eval.num_samples),
        int(config.eval.batch_size),
        seed=config.seed,
    )


def _load_samples(result_folder: Path):
    files = sorted(
        result_folder.glob("samples_*.npz"),
        key=lambda p: int(p.stem.split("_")[1]),
    )
    if not files:
        raise FileNotFoundError(f"no samples_*.npz under {result_folder}")
    arrays, nfe = [], 0
    for f in files:
        with np.load(f) as z:
            arrays.append(z["samples"])
            nfe = int(np.asarray(z["nfe"]))
    return np.concatenate(arrays), nfe


def check_fid(config, result_folder: str):
    """Score generated samples: IS + FID (+KID when raw reference pools are
    available) vs dataset stats (reference run_lib.py:735-791, 596-603).
    Writes report.npz.

    Guard against incomparable numbers: with the `proxy` extractor (no
    Inception weights configured) the distance is reported under
    `fid_proxy`/`kid_proxy`/`IS_proxy` keys — a proxy-FID is NOT comparable
    to published FID values and must not be read as one.
    """
    result_folder = Path(result_folder)
    samples, nfe = _load_samples(result_folder)
    samples = samples[: int(config.eval.num_samples)]
    extractor = get_feature_extractor(config)
    # local mesh: check_fid may run on the coordinator only (evaluate()'s
    # multi-host path), so a global mesh would dead-lock/shard-error here
    mesh = make_mesh(devices=jax.local_devices())
    pools, logits = run_features_sharded(extractor, samples, mesh=mesh)

    ref_pools = None
    stats_path = str(getattr(config.eval, "stats_path", "") or "")
    if stats_path and Path(stats_path).exists():
        mu_ref, sigma_ref = load_dataset_stats(stats_path)
        with np.load(stats_path) as z:  # tfgan-era files keep raw activations
            if "pool_3" in z:
                ref_pools = z["pool_3"]
        if mu_ref.shape[0] != extractor.feature_dim:
            raise ValueError(
                f"stats file {stats_path} has {mu_ref.shape[0]}-d features but "
                f"extractor '{extractor.name}' emits {extractor.feature_dim}-d "
                "— stats and extractor must match"
            )
    else:
        logger.warning("no stats file; computing dataset stats on the fly")
        mu_ref, sigma_ref, ref_pools = _dataset_stats(
            config, extractor, mesh, return_pools=True
        )

    mu, sigma = activation_stats(pools)
    fid = frechet_distance(mu, sigma, mu_ref, sigma_ref)
    is_score = inception_score(logits)
    suffix = "_proxy" if extractor.name == "proxy" else ""
    if suffix:
        logger.warning(
            "scoring with the PROXY extractor: fid_proxy is not comparable to "
            "published FID numbers (set eval.inception_weights for real FID)"
        )
    report = {
        f"IS{suffix}": is_score,
        f"fid{suffix}": fid,
        "nfe": nfe,
        "extractor": extractor.name,
        "n": len(samples),
    }
    if ref_pools is not None:
        report[f"kid{suffix}"] = kernel_distance(ref_pools, pools)
    np.savez(result_folder / "report.npz", **report)
    logger.info("FID report: %s", report)
    return report


def _dataset_stats(config, extractor, mesh, return_pools: bool = False):
    """Activation stats over ONE full epoch of the train split — the
    reference's fid_stats protocol (run_lib.py:806-836: train_ds with
    evaluation=True, every batch)."""
    train_iter, _ = get_dataset(config, evaluation=True)
    imgs = []
    for batch in train_iter:
        imgs.append((batch["image"] * 255).astype(np.uint8))
    images = np.concatenate(imgs)
    pools, _ = run_features_sharded(extractor, images, mesh=mesh)
    mu, sigma = activation_stats(pools)
    if return_pools:
        return mu, sigma, pools
    return mu, sigma


def fid_stats(config, out_path: str | None = None):
    """Precompute dataset activation stats (reference run_lib.py:796-844).

    Saves raw pool_3 activations (the reference's format, enabling KID) plus
    precomputed mu/sigma; the extractor name is kept in the default filename
    so proxy-extractor stats can never be mistaken for Inception stats.
    """
    from gddim_tpu.evals.fid import save_dataset_stats

    extractor = get_feature_extractor(config)
    mesh = make_mesh(devices=jax.local_devices())
    mu, sigma, pools = _dataset_stats(config, extractor, mesh, return_pools=True)
    out = Path(
        out_path
        or (
            Path("assets/stats")
            / f"{config.data.dataset.lower()}_{config.data.image_size}_{extractor.name}_stats.npz"
        )
    )
    save_dataset_stats(out, mu, sigma, pools=pools)
    logger.info("wrote dataset stats to %s", out)
    return str(out)


# ---------------------------------------------------------------------------
# evaluate (loss + FID over a checkpoint range, preemption-resumable)
# ---------------------------------------------------------------------------


def evaluate(config, workdir: str, eval_folder: str = "eval"):
    """Evaluate checkpoints begin_ckpt..end_ckpt (reference run_lib.py:278-671).

    Loss over the eval split and (optionally) sampling + FID per checkpoint,
    with a JSON meta file making the loop resumable after preemption
    (replacing the reference's EvalMeta flax checkpoint, run_lib.py:373-404).
    """
    import json

    workdir = Path(workdir)
    eval_dir = workdir / eval_folder
    eval_dir.mkdir(parents=True, exist_ok=True)
    meta_path = eval_dir / "eval_meta.json"
    done = json.loads(meta_path.read_text()) if meta_path.exists() else {}

    sde = build_sde(config)
    inverse_scaler = get_data_inverse_scaler(config)
    scaler = get_data_scaler(config)
    mgr = ckpt_lib.CheckpointManager(workdir)
    available = mgr.snapshot_steps()
    results = {}
    for ckpt_id in range(int(config.eval.begin_ckpt), int(config.eval.end_ckpt) + 1):
        if ckpt_id not in available:
            continue
        key = str(ckpt_id)
        if key in done:
            results[key] = done[key]
            continue
        model, state = restore_state(config, ckpt_id, workdir)
        entry = {}
        if config.eval.enable_loss:
            # full pass over the held-out split (the reference iterates the
            # whole 1-epoch eval_ds, run_lib.py:420-447), mean-reduced across
            # hosts via a DCN collective instead of per-host files
            from gddim_tpu.parallel import allgather_metrics

            loss_builder = make_cld_loss_fn if is_cld(config) else make_blur_loss_fn
            eval_loss_fn = loss_builder(sde, model, train=False)
            eval_step = make_eval_step(config, eval_loss_fn)
            _, eval_iter = get_dataset(config, evaluation=True)
            # full pass by default; eval.max_eval_batches > 0 truncates (an
            # extension for smoke runs — the reference always does the full
            # epoch)
            max_batches = int(getattr(config.eval, "max_eval_batches", 0) or 0)
            losses = []
            rng = jax.random.PRNGKey(config.seed)
            for i, batch in enumerate(eval_iter):
                if max_batches and i >= max_batches:
                    break
                batch = jax.tree.map(lambda x: jnp.asarray(scaler(x)), batch)
                rng, sub = jax.random.split(rng)
                info = eval_step(state, batch, sub)
                losses.append(float(np.asarray(info["score_loss"])))
            local = {"eval_loss": float(np.mean(losses))}
            entry.update(allgather_metrics(local))
        if config.eval.enable_sampling:
            mesh = make_mesh(devices=jax.local_devices())
            state_m = replicate_to_mesh(state, mesh)
            sampling_fn = build_sampling_fn(
                config, sde, model, inverse_scaler, mesh=mesh
            )
            folder = eval_dir / f"ckpt_{ckpt_id}"
            sampling_from_fn(
                config, sampling_fn, state_m, folder,
                int(config.eval.num_samples), int(config.eval.batch_size),
                seed=config.seed,
            )
            # all rounds exist after the barrier inside sampling_from_fn;
            # host 0 scores, others wait at the next barrier
            from gddim_tpu.parallel import barrier, is_coordinator

            if is_coordinator():
                entry.update(
                    {k: v for k, v in check_fid(config, folder).items()
                     if np.isscalar(v) or isinstance(v, (int, float, str))}
                )
            barrier("fid_scored")
        results[key] = entry
        done[key] = entry
        if jax.process_index() == 0:
            meta_path.write_text(json.dumps(done, indent=2))
        logger.info("ckpt %d: %s", ckpt_id, entry)
    return results
