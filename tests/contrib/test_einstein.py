"""SteinVI/SVGD tests (pattern: reference test/contrib/einstein/)."""

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.einstein import (
    ASVGD,
    SVGD,
    IMQKernel,
    LinearKernel,
    RandomFeatureKernel,
    RBFKernel,
    SteinVI,
)
from numpyro_tpu.infer.autoguide import AutoNormal
from numpyro_tpu.optim import Adagrad, Adam


def gaussian_model():
    numpyro_tpu.sample(
        "x",
        dist.Normal(jnp.array([1.0, -1.0]), jnp.array([1.0, 0.5])).to_event(1),
    )


def test_svgd_matches_gaussian_moments():
    svgd = SVGD(gaussian_model, Adagrad(0.5), RBFKernel(), num_stein_particles=100)
    res = svgd.run(random.PRNGKey(0), 300)
    xs = np.asarray(res.params["auto_x_loc"])
    np.testing.assert_allclose(xs.mean(0), [1.0, -1.0], atol=0.25)
    np.testing.assert_allclose(xs.std(0), [1.0, 0.5], atol=0.25)


def test_asvgd_runs_and_centers():
    asvgd = ASVGD(
        gaussian_model, Adagrad(0.5), RBFKernel(), num_stein_particles=50, num_cycles=3
    )
    res = asvgd.run(random.PRNGKey(1), 200)
    xs = np.asarray(res.params["auto_x_loc"])
    np.testing.assert_allclose(xs.mean(0), [1.0, -1.0], atol=0.35)


def test_steinvi_mixture_guide():
    def model(y):
        x = numpyro_tpu.sample("x", dist.Normal(0.0, 2.0))
        numpyro_tpu.sample("y", dist.Normal(x, 0.5), obs=y)

    stein = SteinVI(
        model,
        AutoNormal(model),
        Adam(0.1),
        IMQKernel(),
        num_stein_particles=5,
        num_elbo_particles=3,
    )
    res = stein.run(random.PRNGKey(2), 300, 1.5)
    locs = np.asarray(res.params["auto_x_loc"])
    assert abs(locs.mean() - 1.5 * (4 / 4.25)) < 0.35
    assert np.isfinite(np.asarray(res.losses)).all()


def test_kernel_variants_run():
    for kf in (LinearKernel(), RandomFeatureKernel(), IMQKernel()):
        svgd = SVGD(gaussian_model, Adagrad(0.3), kf, num_stein_particles=20)
        res = svgd.run(random.PRNGKey(3), 50)
        assert np.isfinite(np.asarray(res.losses)).all()


def test_remaining_kernel_variants_run():
    from numpyro_tpu.contrib.einstein.stein_kernels import (
        GraphicalKernel,
        MixtureKernel,
        ProbabilityProductKernel,
        RadialGaussNewtonKernel,
        RBFKernel,
    )

    kernels = [
        MixtureKernel([0.5, 0.5], [RBFKernel(), IMQKernel()]),
        GraphicalKernel(),
        RadialGaussNewtonKernel(),
    ]
    for kf in kernels:
        svgd = SVGD(gaussian_model, Adagrad(0.3), kf, num_stein_particles=12)
        res = svgd.run(random.PRNGKey(4), 40)
        assert np.isfinite(np.asarray(res.losses)).all(), type(kf).__name__

    # ProbabilityProductKernel needs the fitted guide it measures against
    from numpyro_tpu.contrib.einstein import SteinVI
    from numpyro_tpu.infer.autoguide import AutoNormal

    guide = AutoNormal(gaussian_model)
    stein = SteinVI(
        gaussian_model,
        guide,
        Adagrad(0.3),
        ProbabilityProductKernel(guide=guide),
        num_stein_particles=6,
    )
    res = stein.run(random.PRNGKey(5), 40)
    assert np.isfinite(np.asarray(res.losses)).all()
