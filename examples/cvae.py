"""Conditional VAE: predict the bottom half of an MNIST digit from its top
half (role parity: reference examples/cvae-flax/, condensed to one file).

Two stages, as in the reference:
1. a deterministic baseline net top->bottom trained with SVI on a Delta
   guide (pure regression) — its output feeds the CVAE prior;
2. the CVAE proper: prior p(z | top, baseline(top)) and decoder
   p(bottom | z), with an amortized recognition net q(z | top, bottom).

Everything is flax.linen through ``flax_module``; batches ride a leading
plate so the whole step is one fused XLA program.
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.module import flax_module
from numpyro_tpu.examples.datasets import MNIST, load_dataset
from numpyro_tpu.infer import SVI, Trace_ELBO
from numpyro_tpu.optim import Adam

from flax import linen as nn

TOP, BOTTOM = 14 * 28, 14 * 28


class MLP(nn.Module):
    sizes: tuple
    final_sigmoid: bool = False

    @nn.compact
    def __call__(self, x):
        for s in self.sizes[:-1]:
            x = nn.relu(nn.Dense(s)(x))
        x = nn.Dense(self.sizes[-1])(x)
        return nn.sigmoid(x) if self.final_sigmoid else x


class CVAEPrior(nn.Module):
    hidden: int
    z_dim: int

    @nn.compact
    def __call__(self, top, baseline_bottom):
        h = nn.relu(nn.Dense(self.hidden)(jnp.concatenate([top, baseline_bottom], -1)))
        return nn.Dense(self.z_dim)(h), jnp.exp(nn.Dense(self.z_dim)(h))


class CVAERecognition(nn.Module):
    hidden: int
    z_dim: int

    @nn.compact
    def __call__(self, top, bottom):
        h = nn.relu(nn.Dense(self.hidden)(jnp.concatenate([top, bottom], -1)))
        return nn.Dense(self.z_dim)(h), jnp.exp(nn.Dense(self.z_dim)(h))


# ---- stage 1: deterministic baseline --------------------------------------


def baseline_model(top, bottom=None, hidden=256):
    net = flax_module(
        "baseline", MLP((hidden, BOTTOM), final_sigmoid=True),
        input_shape=(1, TOP),
    )
    probs = jnp.clip(net(top), 1e-6, 1 - 1e-6)
    with numpyro_tpu.plate("batch", top.shape[0]):
        numpyro_tpu.sample(
            "bottom", dist.Bernoulli(probs).to_event(1), obs=bottom
        )


def baseline_guide(top, bottom=None, hidden=256):
    pass  # fully deterministic: params only


# ---- stage 2: the CVAE ------------------------------------------------------


def cvae_model(top, bottom=None, baseline_probs=None, hidden=256, z_dim=32):
    prior_net = flax_module(
        "prior_net", CVAEPrior(hidden, z_dim),
        top[:1], baseline_probs[:1],
    )
    decoder = flax_module(
        "decoder", MLP((hidden, BOTTOM), final_sigmoid=True),
        input_shape=(1, z_dim),
    )
    loc, scale = prior_net(top, baseline_probs)
    with numpyro_tpu.plate("batch", top.shape[0]):
        z = numpyro_tpu.sample("z", dist.Normal(loc, scale).to_event(1))
        probs = jnp.clip(decoder(z), 1e-6, 1 - 1e-6)
        numpyro_tpu.sample(
            "bottom", dist.Bernoulli(probs).to_event(1), obs=bottom
        )


def cvae_guide(top, bottom=None, baseline_probs=None, hidden=256, z_dim=32):
    recog = flax_module(
        "recognition", CVAERecognition(hidden, z_dim),
        top[:1], (bottom if bottom is not None else top)[:1],
    )
    loc, scale = recog(top, bottom)
    with numpyro_tpu.plate("batch", top.shape[0]):
        numpyro_tpu.sample("z", dist.Normal(loc, scale).to_event(1))


def binarize(imgs):
    flat = imgs.reshape(imgs.shape[0], -1) > 0.5
    return flat[:, :TOP].astype(jnp.float32), flat[:, TOP:].astype(jnp.float32)


def main(args):
    init, get_batch = load_dataset(
        MNIST, batch_size=args.batch_size, split="train"
    )
    num_batches, idx = init()
    top, bottom = binarize(jnp.asarray(get_batch(0, idx)[0]))

    # stage 1
    svi1 = SVI(baseline_model, baseline_guide, Adam(1e-3), Trace_ELBO())
    state1 = svi1.init(random.PRNGKey(0), top, bottom)
    for i in range(args.num_iters):
        b = jnp.asarray(get_batch(i % num_batches, idx)[0])
        t, btm = binarize(b)
        state1, loss = svi1.update(state1, t, btm)
    params1 = svi1.get_params(state1)
    baseline_probs = jnp.clip(
        MLP((256, BOTTOM), final_sigmoid=True).apply(
            {"params": params1["baseline$params"]}, top
        ),
        1e-6, 1 - 1e-6,
    )
    base_loss = float(loss) / top.shape[0]
    print(f"baseline trained: per-image NLL {base_loss:.2f}")

    # stage 2
    svi2 = SVI(cvae_model, cvae_guide, Adam(1e-3), Trace_ELBO())
    state2 = svi2.init(random.PRNGKey(1), top, bottom, baseline_probs)
    for i in range(args.num_iters):
        b = jnp.asarray(get_batch(i % num_batches, idx)[0])
        t, btm = binarize(b)
        bp = jnp.clip(
            MLP((256, BOTTOM), final_sigmoid=True).apply(
                {"params": params1["baseline$params"]}, t
            ),
            1e-6, 1 - 1e-6,
        )
        state2, loss = svi2.update(state2, t, btm, bp)
    cvae_loss = float(loss) / top.shape[0]
    print(f"cvae trained: per-image ELBO loss {cvae_loss:.2f}")
    assert np.isfinite(cvae_loss)
    return base_loss, cvae_loss


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="conditional VAE on MNIST halves")
    parser.add_argument("--num-iters", type=int, default=500)
    parser.add_argument("--batch-size", type=int, default=128)
    args = parser.parse_args()
    main(args)
