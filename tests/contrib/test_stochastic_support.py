"""DCC/SDVI stochastic-support tests (reference: test/contrib/test_stochastic_support.py)."""

import pytest
import jax
import numpy as np, jax.numpy as jnp
from jax import random
import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.stochastic_support import DCC, SDVI
from numpyro_tpu.optim import Adam

def model():
    m = numpyro_tpu.sample("m", dist.Bernoulli(0.5), infer={"branching": True})
    if m == 0:
        mean = numpyro_tpu.sample("a1", dist.Normal(0.0, 1.0))
    else:
        mean = numpyro_tpu.sample("a2", dist.Normal(1.0, 1.0))
    numpyro_tpu.sample("obs", dist.Normal(mean, 1.0), obs=0.2)

@pytest.mark.slow
def test_dcc_and_sdvi():
    import scipy.stats as st
    dcc = DCC(model, mcmc_kwargs=dict(num_warmup=300, num_samples=300, progress_bar=False),
          num_slp_samples=50)
    res = dcc.run(random.PRNGKey(0))
    assert abs(sum(float(v) for v in res.slp_weights.values()) - 1) < 1e-4
    # analytically, branch 2 (prior mean 1) fits obs 0.2... compute exact:
    import scipy.stats as st
    z0 = st.norm(0, np.sqrt(2)).pdf(0.2)
    z1 = st.norm(1, np.sqrt(2)).pdf(0.2)
    w = list(res.slp_weights.values())
    assert abs(float(w[0]) - z0/(z0+z1)) < 0.1

    sdvi = SDVI(model, Adam(0.01), svi_num_steps=500, num_slp_samples=50, combine_elbo_particles=200)
    res = sdvi.run(random.PRNGKey(1))
    w = list(res.slp_weights.values())
    assert abs(float(w[0]) - z0/(z0+z1)) < 0.1
