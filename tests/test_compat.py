"""Reference-API compatibility shims behave like the originals."""

import jax
import jax.numpy as jnp
import numpy as np


def test_compat_surface():
    from gddim_tpu import compat

    for name in [
        "register_model", "get_model", "init_model", "get_eps_fn",
        "get_score_fn", "State", "CLD", "LambdaSDE", "LSDE", "from_config",
        "to_flattened_numpy", "from_flattened_numpy", "bmm", "sbmm",
        "inv_2x2", "aug_batch", "create_classifier", "get_logit_fn",
        "get_classifier_grad_fn", "get_data_shape",
    ]:
        assert hasattr(compat, name), name


def test_compat_eps_and_score_fns():
    from gddim_tpu import compat
    from gddim_tpu.configs import get_config
    from gddim_tpu.math.cld import CLD
    from gddim_tpu.math.cld_host import CLDParams

    cfg = get_config("cld/points")
    model, states, params = compat.init_model(jax.random.PRNGKey(0), cfg)
    sde = CLD.create(CLDParams())
    eps_fn = compat.get_eps_fn(sde, model, params, states, train=False)
    u = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 2))
    t = jnp.asarray([0.2, 0.4, 0.6, 0.8])
    eps = eps_fn(u, t)
    assert eps.shape == u.shape
    score_fn = compat.get_score_fn(sde, model, params, states, train=False)
    score = score_fn(u, t)
    # score == eps2score(eps)
    np.testing.assert_allclose(
        np.asarray(score), np.asarray(sde.eps2score(eps, t)), rtol=1e-5, atol=1e-6
    )


def test_compat_helpers():
    from gddim_tpu import compat

    x = jnp.arange(6.0).reshape(2, 3)
    flat = compat.to_flattened_numpy(x)
    assert flat.shape == (6,)
    back = compat.from_flattened_numpy(flat, (2, 3))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
    aug = compat.aug_batch(jnp.ones((2, 3)))
    assert aug.shape == (2, 3, 2)
    np.testing.assert_allclose(np.asarray(aug[..., 1]), 0.0)
    m = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    np.testing.assert_allclose(
        np.asarray(compat.inv_2x2(m) @ m), np.eye(2), atol=1e-6
    )
