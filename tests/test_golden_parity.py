"""Golden parity of the coefficient engine against the reference pipeline.

VERDICT.md round-1 item 4: the only offline way to de-risk checkpoint-load day
is to show our host coefficient engine reproduces the reference's numerics.
tests/refshim_cld.py re-runs the reference's exact discretization (fixed-step
R scan, subsample+searchsorted interp, 10k-point left-endpoint quadrature,
recursive AB warm-up); here we assert gddim_tpu.math.{cld_host,deis} matches
it on the headline NFE=50 / deis_order=2 / ts_order=2 / denoising grid.
"""

import numpy as np
import pytest

from gddim_tpu.math.cld_host import CLDParams, HostCLD
from gddim_tpu.math.deis import deis_coef_stack, order0_eps_coef
from gddim_tpu.samplers.timegrid import rev_time_grid

from refshim_cld import RefCLDShim, ref_deis_coef, ref_rev_ts


HEADLINE_NFE = 50  # README.md:52 — nfe=50, deis_order=2, ts_order=2, denoising
HEADLINE_STEPS = HEADLINE_NFE - 1  # denoising consumes one NFE (sampling.py:157)


def test_rev_ts_grid_matches_reference():
    ours = rev_time_grid(1.0, 1e-3, HEADLINE_STEPS, ts_order=2.0)
    ref = ref_rev_ts(1.0, 1e-3, 2, HEADLINE_STEPS)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


@pytest.fixture(scope="module")
def rev_ts():
    return rev_time_grid(1.0, 1e-3, HEADLINE_STEPS, ts_order=2.0)


@pytest.fixture(scope="module")
def host():
    return HostCLD(CLDParams())


def _max_rel(a, b):
    scale = np.abs(b).max()
    return np.abs(a - b).max() / scale


def test_deis_coef_parity_release_config(rev_ts, host):
    """Release path: accr_dcifar10 uses x64 + RK4 R_dt=1e-6 (config:15-17)."""
    shim = RefCLDShim(is_R_rk=True, R_dt=1e-6, x64=True)
    ref = ref_deis_coef(shim, 2, rev_ts)
    ours = deis_coef_stack(host, rev_ts, 2)
    assert ours.shape == ref.shape == (HEADLINE_STEPS, 5, 2, 2)
    rel = _max_rel(ours, ref)
    assert rel < 1e-4, f"max rel diff vs reference release pipeline: {rel:.2e}"


def test_deis_coef_parity_default_config(rev_ts, host):
    """Default path: x32 Euler-midpoint R_dt=1e-5 (default_cifar10_config).

    The x32 scan accumulates in float32, so the tolerance is looser; this
    bounds how far the reference's own default numerics sit from the exact
    solution our engine computes.
    """
    shim = RefCLDShim(is_R_rk=False, R_dt=1e-5, x64=False)
    ref = ref_deis_coef(shim, 2, rev_ts)
    ours = deis_coef_stack(host, rev_ts, 2)
    rel = _max_rel(ours, ref)
    assert rel < 4e-3, f"max rel diff vs reference default pipeline: {rel:.2e}"


@pytest.mark.slow
def test_order0_coef_parity(rev_ts, host):
    """prepare_order0_coef's 1000-point rule (sde_lib.py:289-306)."""
    shim = RefCLDShim(is_R_rk=True, R_dt=1e-6, x64=True)
    n = 12
    ts = rev_ts[:: len(rev_ts) // n][: n + 1]
    ours = order0_eps_coef(host, ts, n_quad=1000)
    ref = np.zeros_like(ours)
    for i in range(len(ts) - 1):
        taus = np.linspace(ts[i], ts[i + 1], 1000, endpoint=False)
        dt = (ts[i + 1] - ts[i]) / 1000
        core = np.einsum(
            "nij,njk->nik", shim.vs_psi(taus, ts[i + 1]), shim.v_eps_integrand(taus)
        )
        ref[i] = core.sum(0) * dt
    assert _max_rel(ours, ref) < 1e-4


@pytest.mark.slow
def test_mldeis_coef_parity(rev_ts, host):
    """mldeis golden parity (VERDICT weak #7): our rotated y-space stack
    matches the reference MLCLD pipeline (sampling.py:272-352), including its
    RK4-tabulated psi2 and the psi1-rotated eps integrand."""
    from gddim_tpu.math.variants import HostMLCLD

    from refshim_cld import RefMLShim, ref_mldeis_coef

    shim = RefMLShim(RefCLDShim(is_R_rk=True, R_dt=1e-6, x64=True))
    n = 10  # a subsampled grid keeps the 10k-point quadrature affordable
    ts = rev_ts[:: len(rev_ts) // n][: n + 1]
    ref = ref_mldeis_coef(shim, 2, ts)
    ours = HostMLCLD(host).deis_coef(np.asarray(ts), 2)
    assert ours.shape == ref.shape
    rel = _max_rel(ours, ref)
    assert rel < 1e-4, f"max rel diff vs reference mldeis pipeline: {rel:.2e}"
