"""Exercise the TFP bridges against a minimal in-repo stub of the
tensorflow_probability JAX-substrate interface.

tensorflow_probability is not installable in this environment (zero
egress), but the bridge code paths (wrapper generation, support/bijector
mapping, kernel adaptation, vectorized chains) are OUR code — this suite
runs them for real against a stub that implements exactly the tfp surface
the bridges consume (documented interface: tfd.Distribution sample/log_prob
/event_shape/default event-space bijector; tfp.mcmc TransitionKernel
bootstrap_results/one_step).  When real tfp is present the stub steps
aside and the same tests run against it.
"""

import sys
import types
from collections import namedtuple

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random


def _install_tfp_stub():
    """Create tensorflow_probability.substrates.jax.{distributions,
    bijectors,mcmc} stub modules if real tfp is unavailable."""
    try:
        import tensorflow_probability.substrates.jax  # noqa: F401

        return False  # real tfp present
    except ImportError:
        pass
    if "tensorflow_probability.substrates.jax.distributions" in sys.modules:
        return True

    tfb = types.ModuleType("tensorflow_probability.substrates.jax.bijectors")

    class Identity:
        forward_min_event_ndims = 0

        def forward(self, x):
            return x

        def inverse(self, y):
            return y

        def forward_log_det_jacobian(self, x, event_ndims):
            return jnp.zeros(jnp.shape(x))

        def forward_event_shape(self, shape):
            return tuple(shape)

        def inverse_event_shape(self, shape):
            return tuple(shape)

    class Softplus(Identity):
        def forward(self, x):
            return jax.nn.softplus(x)

        def inverse(self, y):
            return y + jnp.log(-jnp.expm1(-y))

        def forward_log_det_jacobian(self, x, event_ndims):
            return -jax.nn.softplus(-x)

    class Chain:
        def __init__(self, bijectors):
            self.bijectors = bijectors

    tfb.Identity, tfb.Softplus, tfb.Chain = Identity, Softplus, Chain

    tfd = types.ModuleType(
        "tensorflow_probability.substrates.jax.distributions"
    )
    tfd.FULLY_REPARAMETERIZED = "FULLY_REPARAMETERIZED"
    tfd.NOT_REPARAMETERIZED = "NOT_REPARAMETERIZED"

    class Normal:
        reparameterization_type = tfd.FULLY_REPARAMETERIZED

        def __init__(self, loc, scale, **kw):
            self.loc = jnp.asarray(loc)
            self.scale = jnp.asarray(scale)
            self.parameters = dict(loc=loc, scale=scale)

        @property
        def batch_shape(self):
            return jnp.broadcast_shapes(
                jnp.shape(self.loc), jnp.shape(self.scale)
            )

        @property
        def event_shape(self):
            return ()

        def sample(self, sample_shape=(), seed=None):
            shape = tuple(sample_shape) + tuple(self.batch_shape)
            return self.loc + self.scale * random.normal(seed, shape)

        def log_prob(self, x):
            z = (x - self.loc) / self.scale
            return -0.5 * z**2 - jnp.log(self.scale) - 0.5 * jnp.log(2 * jnp.pi)

        def mean(self):
            return jnp.broadcast_to(self.loc, self.batch_shape)

        def variance(self):
            return jnp.broadcast_to(self.scale**2, self.batch_shape)

        def cdf(self, x):
            return jax.scipy.stats.norm.cdf(x, self.loc, self.scale)

        def quantile(self, q):
            return self.loc + self.scale * jax.scipy.special.ndtri(q)

        def experimental_default_event_space_bijector(self):
            return tfb.Identity()

    class HalfNormal:
        reparameterization_type = tfd.FULLY_REPARAMETERIZED

        def __init__(self, scale, **kw):
            self.scale = jnp.asarray(scale)
            self.parameters = dict(scale=scale)

        @property
        def batch_shape(self):
            return jnp.shape(self.scale)

        @property
        def event_shape(self):
            return ()

        def sample(self, sample_shape=(), seed=None):
            shape = tuple(sample_shape) + tuple(self.batch_shape)
            return jnp.abs(self.scale * random.normal(seed, shape))

        def log_prob(self, x):
            z = x / self.scale
            return (
                0.5 * jnp.log(2.0 / jnp.pi) - jnp.log(self.scale) - 0.5 * z**2
            )

        def mean(self):
            return self.scale * jnp.sqrt(2.0 / jnp.pi)

        def variance(self):
            return self.scale**2 * (1 - 2.0 / jnp.pi)

        def experimental_default_event_space_bijector(self):
            return tfb.Softplus()

    class Bernoulli:
        reparameterization_type = tfd.NOT_REPARAMETERIZED

        def __init__(self, probs=None, logits=None, **kw):
            self.probs = (
                jnp.asarray(probs) if probs is not None
                else jax.nn.sigmoid(jnp.asarray(logits))
            )
            self.parameters = dict(probs=probs, logits=logits)

        @property
        def batch_shape(self):
            return jnp.shape(self.probs)

        @property
        def event_shape(self):
            return ()

        def sample(self, sample_shape=(), seed=None):
            shape = tuple(sample_shape) + tuple(self.batch_shape)
            return (random.uniform(seed, shape) < self.probs).astype(jnp.int32)

        def log_prob(self, x):
            return x * jnp.log(self.probs) + (1 - x) * jnp.log1p(-self.probs)

        def mean(self):
            return self.probs

        def variance(self):
            return self.probs * (1 - self.probs)

        def experimental_default_event_space_bijector(self):
            return None

    class Categorical:  # referenced by enumerate_support isinstance checks
        pass

    class OneHotCategorical:
        pass

    tfd.Normal = Normal
    tfd.HalfNormal = HalfNormal
    tfd.Bernoulli = Bernoulli
    tfd.Categorical = Categorical
    tfd.OneHotCategorical = OneHotCategorical

    mcmc_mod = types.ModuleType("tensorflow_probability.substrates.jax.mcmc")
    RWResults = namedtuple("RWResults", ["target_log_prob"])

    class RandomWalkMetropolis:
        """Minimal tfp.mcmc.TransitionKernel: Gaussian RW proposal + MH."""

        def __init__(self, target_log_prob_fn, step_size=0.5):
            self._tlp = target_log_prob_fn
            self._step = step_size

        def bootstrap_results(self, z):
            return RWResults(self._tlp(z))

        def one_step(self, z, results, seed=None):
            k1, k2 = random.split(seed)
            prop = z + self._step * random.normal(k1, jnp.shape(z))
            tlp_prop = self._tlp(prop)
            accept = (
                jnp.log(random.uniform(k2, ()))
                < tlp_prop - results.target_log_prob
            )
            z_new = jnp.where(accept, prop, z)
            tlp_new = jnp.where(accept, tlp_prop, results.target_log_prob)
            return z_new, RWResults(tlp_new)

    class MetropolisHastings:
        def __init__(self, inner):
            self.inner = inner

    mcmc_mod.RandomWalkMetropolis = RandomWalkMetropolis
    mcmc_mod.MetropolisHastings = MetropolisHastings

    tfp = types.ModuleType("tensorflow_probability")
    substrates = types.ModuleType("tensorflow_probability.substrates")
    tfp_jax = types.ModuleType("tensorflow_probability.substrates.jax")
    tfp_jax.distributions = tfd
    tfp_jax.bijectors = tfb
    tfp_jax.mcmc = mcmc_mod
    substrates.jax = tfp_jax
    tfp.substrates = substrates
    sys.modules["tensorflow_probability"] = tfp
    sys.modules["tensorflow_probability.substrates"] = substrates
    sys.modules["tensorflow_probability.substrates.jax"] = tfp_jax
    sys.modules["tensorflow_probability.substrates.jax.distributions"] = tfd
    sys.modules["tensorflow_probability.substrates.jax.bijectors"] = tfb
    sys.modules["tensorflow_probability.substrates.jax.mcmc"] = mcmc_mod
    return True


_install_tfp_stub()

import numpyro_tpu  # noqa: E402
import numpyro_tpu.distributions as dist  # noqa: E402
from numpyro_tpu.contrib.tfp.distributions import (  # noqa: E402
    TFPDistribution,
)
from numpyro_tpu.contrib.tfp.mcmc import TFPKernel  # noqa: E402
from numpyro_tpu.infer import MCMC, NUTS  # noqa: E402

from tensorflow_probability.substrates.jax import (  # noqa: E402
    distributions as tfd,
    mcmc as tfp_mcmc,
)


def test_tfp_distribution_wrapper_basics():
    d = TFPDistribution[tfd.Normal](1.0, 2.0)
    s = d.sample(random.PRNGKey(0), (1000,))
    assert s.shape == (1000,)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(s)),
        np.asarray(dist.Normal(1.0, 2.0).log_prob(s)),
        rtol=1e-5, atol=1e-6,
    )
    assert abs(float(d.mean) - 1.0) < 1e-6
    assert abs(float(d.variance) - 4.0) < 1e-6
    assert d.has_rsample
    # support of the identity event-space bijector maps to real
    from numpyro_tpu.distributions import constraints

    assert d.support is constraints.real


def test_tfp_distribution_lazy_name_wrapper():
    from numpyro_tpu.contrib.tfp import distributions as tfp_dists

    Normal = tfp_dists.Normal  # generated on attribute access
    d = Normal(0.0, 1.0)
    assert isinstance(d, TFPDistribution)


def test_tfp_distribution_pytree_roundtrip():
    d = TFPDistribution[tfd.Normal](jnp.array([0.0, 1.0]), 1.0)
    leaves, treedef = jax.tree.flatten(d)
    rebuilt = jax.tree.unflatten(treedef, leaves)
    x = jnp.zeros(2)
    np.testing.assert_allclose(
        np.asarray(rebuilt.log_prob(x)), np.asarray(d.log_prob(x)), rtol=1e-6
    )


def test_tfp_distribution_enumerate_support_bernoulli():
    d = TFPDistribution[tfd.Bernoulli](probs=0.3)
    assert d.is_discrete
    vals = d.enumerate_support()
    np.testing.assert_array_equal(np.asarray(vals), [0, 1])


@pytest.mark.slow
def test_nuts_over_tfp_distributions():
    """NUTS samples a model whose sites are all TFP-wrapped (incl. a
    positive-support site through the bijector->constraint mapping)."""
    x = jnp.linspace(-2, 2, 100)
    y_obs = 1.2 * x + 0.25 * random.normal(random.PRNGKey(0), x.shape)

    def model(x, y):
        w = numpyro_tpu.sample("w", TFPDistribution[tfd.Normal](0.0, 2.0))
        s = numpyro_tpu.sample("s", TFPDistribution[tfd.HalfNormal](1.0))
        with numpyro_tpu.plate("N", x.shape[0]):
            numpyro_tpu.sample(
                "y", TFPDistribution[tfd.Normal](w * x, s), obs=y
            )

    m = MCMC(
        NUTS(model), num_warmup=400, num_samples=600, num_chains=2,
        chain_method="vectorized", progress_bar=False,
    )
    m.run(random.PRNGKey(1), x, y_obs)
    s = m.get_samples()
    assert abs(float(s["w"].mean()) - 1.2) < 0.1
    assert abs(float(s["s"].mean()) - 0.25) < 0.1
    assert bool((np.asarray(s["s"]) > 0).all())


@pytest.mark.parametrize("num_chains", [1, 4])
def test_tfp_kernel_random_walk(num_chains):
    """TFPKernel adapts a tfp TransitionKernel to the MCMC driver (single
    and vectorized chains) and recovers a known Gaussian target."""
    true_mean, true_std = 1.5, 0.8

    def model():
        numpyro_tpu.sample(
            "z", numpyro_tpu.distributions.Normal(true_mean, true_std)
        )

    kernel = TFPKernel[tfp_mcmc.RandomWalkMetropolis](model, step_size=0.7)
    m = MCMC(
        kernel, num_warmup=500, num_samples=4000, num_chains=num_chains,
        chain_method="vectorized", progress_bar=False,
    )
    m.run(random.PRNGKey(0))
    z = np.asarray(m.get_samples()["z"])
    assert z.shape[0] == 4000 * num_chains
    assert abs(z.mean() - true_mean) < 0.1
    assert abs(z.std() - true_std) < 0.1
