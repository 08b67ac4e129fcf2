"""Reparameterizer correctness: each reparam must leave the posterior
invariant (same moments through MCMC/SVI) while changing the latent
geometry.  Mirrors the strategy of reference test/infer/test_reparam.py."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu import handlers
from numpyro_tpu.distributions.transforms import AffineTransform, ExpTransform
from numpyro_tpu.infer import MCMC, NUTS, SVI, Trace_ELBO
from numpyro_tpu.infer.autoguide import AutoDiagonalNormal
from numpyro_tpu.infer.reparam import (
    CircularReparam,
    ExplicitReparam,
    LocScaleReparam,
    NeuTraReparam,
    ProjectedNormalReparam,
    TransformReparam,
)


def _run_mcmc(model, *args, key=0, warmup=300, samples=600):
    m = MCMC(NUTS(model), num_warmup=warmup, num_samples=samples,
             progress_bar=False)
    m.run(random.PRNGKey(key), *args)
    return m.get_samples()


def test_loc_scale_reparam_centered_equivalence():
    y = 2.5

    def model():
        mu = numpyro_tpu.sample("mu", dist.Normal(0.0, 3.0))
        numpyro_tpu.sample("obs", dist.Normal(mu, 1.0), obs=y)

    plain = _run_mcmc(model)
    with_rp = handlers.reparam(model, config={"mu": LocScaleReparam(0.0)})
    rp = _run_mcmc(with_rp, key=1)
    # posterior: N(y*9/10, sqrt(9/10))
    for s in (plain, rp):
        assert abs(float(s["mu"].mean()) - y * 0.9) < 0.15
        assert abs(float(s["mu"].std()) - np.sqrt(0.9)) < 0.12
    # decentered latent exists in the reparamed chain
    assert "mu_decentered" in rp


def test_transform_reparam_lognormal():
    def model():
        with handlers.reparam(config={"x": TransformReparam()}):
            numpyro_tpu.sample(
                "x",
                dist.TransformedDistribution(
                    dist.Normal(0.0, 1.0), ExpTransform()
                ),
            )

    s = _run_mcmc(model)
    lx = np.log(np.asarray(s["x"]))
    assert abs(lx.mean()) < 0.15 and abs(lx.std() - 1.0) < 0.15


def test_explicit_reparam_matches_transform():
    e = ExplicitReparam(AffineTransform(1.0, 2.0).inv)

    def model():
        with handlers.reparam(config={"x": e}):
            numpyro_tpu.sample("x", dist.Normal(1.0, 2.0))

    s = _run_mcmc(model)
    assert abs(float(s["x"].mean()) - 1.0) < 0.25
    assert abs(float(s["x"].std()) - 2.0) < 0.25


def test_projected_normal_reparam_samples_on_sphere():
    def model():
        with handlers.reparam(config={"d": ProjectedNormalReparam()}):
            numpyro_tpu.sample("d", dist.ProjectedNormal(jnp.array([2.0, 0.0, 0.0])))

    s = _run_mcmc(model)
    norms = np.linalg.norm(np.asarray(s["d"]), axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    # concentration towards +x
    assert float(s["d"][:, 0].mean()) > 0.5


def test_circular_reparam_vonmises():
    def model():
        with handlers.reparam(config={"phi": CircularReparam()}):
            numpyro_tpu.sample("phi", dist.VonMises(0.5, 3.0))

    s = _run_mcmc(model)
    phi = np.asarray(s["phi"])
    assert (phi >= -np.pi - 1e-6).all() and (phi <= np.pi + 1e-6).all()
    # circular mean near 0.5
    ang = np.angle(np.exp(1j * phi).mean())
    assert abs(ang - 0.5) < 0.15


@pytest.mark.filterwarnings("ignore::UserWarning")
def test_neutra_reparam_funnel():
    def funnel():
        y = numpyro_tpu.sample("y", dist.Normal(0.0, 3.0))
        numpyro_tpu.sample("x", dist.Normal(0.0, jnp.exp(y / 2)))

    guide = AutoDiagonalNormal(funnel)
    svi = SVI(funnel, guide, numpyro_tpu.optim.Adam(1e-2), Trace_ELBO())
    res = svi.run(random.PRNGKey(0), 800, progress_bar=False)
    neutra = NeuTraReparam(guide, res.params)
    reparamed = neutra.reparam(funnel)
    s = _run_mcmc(reparamed, key=3)
    # shared latent exists and transform_sample reconstructs both sites
    shared = [k for k in s if k.endswith("_shared_latent")]
    assert shared, list(s)
    z = neutra.transform_sample(s[shared[0]])
    assert set(z) >= {"x", "y"}
    assert abs(float(jnp.mean(z["y"]))) < 1.0
