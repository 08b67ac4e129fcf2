"""Variational autoencoder: flax encoder/decoder as numpyro modules,
amortized SVI (reference: examples/vae.py)."""

import argparse

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.module import flax_module
from numpyro_tpu.examples.datasets import MNIST, load_dataset
from numpyro_tpu.infer import SVI, Trace_ELBO
from numpyro_tpu.optim import Adam

try:
    from flax import linen as nn
except ImportError:
    nn = None


if nn is not None:

    class Encoder(nn.Module):
        hidden: int
        z_dim: int

        @nn.compact
        def __call__(self, x):
            h = nn.softplus(nn.Dense(self.hidden)(x))
            loc = nn.Dense(self.z_dim)(h)
            scale = jnp.exp(nn.Dense(self.z_dim)(h))
            return loc, scale

    class Decoder(nn.Module):
        hidden: int
        out: int

        @nn.compact
        def __call__(self, z):
            h = nn.softplus(nn.Dense(self.hidden)(z))
            return nn.sigmoid(nn.Dense(self.out)(h))


def model(batch, hidden=64, z_dim=16):
    decoder = flax_module(
        "decoder", Decoder(hidden, batch.shape[1]), input_shape=(1, z_dim)
    )
    with numpyro_tpu.plate("batch", batch.shape[0]):
        z = numpyro_tpu.sample(
            "z", dist.Normal(jnp.zeros(z_dim), 1.0).to_event(1)
        )
        probs = jnp.clip(decoder(z), 1e-6, 1 - 1e-6)
        numpyro_tpu.sample("obs", dist.Bernoulli(probs).to_event(1), obs=batch)


def guide(batch, hidden=64, z_dim=16):
    encoder = flax_module(
        "encoder", Encoder(hidden, z_dim), input_shape=(1, batch.shape[1])
    )
    with numpyro_tpu.plate("batch", batch.shape[0]):
        loc, scale = encoder(batch)
        numpyro_tpu.sample("z", dist.Normal(loc, scale).to_event(1))


def main(args):
    if nn is None:
        print("flax not available; skipping")
        return
    init, get_batch = load_dataset(
        MNIST, batch_size=args.batch_size, split="train", shuffle=False
    )
    num_batches, idxs = init()
    batch = jnp.asarray((get_batch(0, idxs)[0] > 0.5).astype(np.float32))

    svi = SVI(model, guide, Adam(1e-3), Trace_ELBO())
    state = svi.init(random.PRNGKey(0), batch)
    update = jax.jit(svi.update)
    losses = []
    for i in range(args.num_iters):
        b = jnp.asarray((get_batch(i % num_batches, idxs)[0] > 0.5).astype(np.float32))
        state, loss = update(state, b)
        losses.append(float(loss))
    print(f"ELBO loss: {losses[0]:.1f} -> {np.mean(losses[-10:]):.1f}")
    assert np.isfinite(losses[-1])


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--num-iters", type=int, default=300)
    main(p.parse_args())
