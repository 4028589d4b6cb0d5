"""Worker entry for the 2-process multi-host integration test.

Launched as `python multihost_worker.py <pid> <nproc> <port> <workdir>` by
tests/test_parallel.py. Exercises the real multi-host code paths the
reference runs on pods (cld_jax/run_lib.py:511-617) on a 2-process gloo/CPU
cluster: jax.distributed init, global-mesh training with per-host data
shards, DCN metric collectives, and round-sharded sampling into a shared
folder with a collective barrier (replacing the reference's filesystem
polling).
"""

import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, workdir = sys.argv[3], sys.argv[4]
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * jax.local_device_count()

    import numpy as np

    from gddim_tpu import run_lib
    from gddim_tpu.configs import get_config
    from gddim_tpu.data import get_data_inverse_scaler
    from gddim_tpu.models import init_model
    from gddim_tpu.parallel import allgather_metrics, barrier, make_mesh
    from gddim_tpu.parallel.mesh import replicate_to_mesh

    cfg = get_config("cld/points")
    cfg.model.nf = 16
    cfg.model.num_layers = 1
    cfg.training.batch_size = 8 * jax.device_count()
    cfg.training.n_jitted_steps = 2
    cfg.training.n_iters = 4
    cfg.training.log_freq = 2
    cfg.training.eval_freq = 1000
    cfg.training.snapshot_freq = 10000
    cfg.training.snapshot_freq_for_preemption = 10000
    cfg.training.snapshot_sampling = False
    cfg.sampling.nfe = 4
    cfg.sampling.deis_order = 1

    # global-mesh training: per-host data shards, gradient all-reduce over DCN
    state = run_lib.train(cfg, os.path.join(workdir, "train"))
    assert int(np.asarray(state.step)) == 4

    # cross-host metric reduction
    m = allgather_metrics({"pid": float(pid)})
    assert abs(m["pid"] - (nproc - 1) / 2) < 1e-6, m

    # round-sharded sampling into the shared folder (4 rounds over 2 hosts)
    sde = run_lib.build_sde(cfg)
    inverse_scaler = get_data_inverse_scaler(cfg)
    model, _, _ = init_model(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(devices=jax.local_devices())
    host_state = jax.device_get(state)
    local_state = replicate_to_mesh(host_state, mesh)
    sampling_fn = run_lib.build_sampling_fn(
        cfg, sde, model, inverse_scaler, mesh=mesh
    )
    folder = os.path.join(workdir, "samples")
    batch = 4 * jax.local_device_count()
    run_lib.sampling_from_fn(
        cfg, sampling_fn, local_state, __import__("pathlib").Path(folder),
        num_samples=4 * batch, batch_size=batch, seed=0,
    )
    # the barrier inside sampling_from_fn guarantees every round exists now
    files = sorted(os.listdir(folder))
    assert len(files) == 4, files
    barrier("done")
    print(f"worker {pid}: OK")


if __name__ == "__main__":
    main()
