"""SteinVI on a deep Markov model (role parity: reference
examples/stein_dmm.py, which trains a DMM on polyphonic music with Stein
mixtures).

Generative model:  z_t ~ N(mu_trans(z_{t-1}), sigma_trans(z_{t-1})),
                   x_t ~ Bernoulli(emitter(z_t))            (binary notes)
Guide:             a backward GRU summarizes x_{t:T}; a combiner fuses it
                   with z_{t-1} into q(z_t | z_{t-1}, x_{t:T}).

All nets are flax modules registered ONCE via ``flax_module``; the time axis
runs under ``contrib.control_flow.scan`` so the whole ELBO is a single
compiled program.  SteinVI transports a particle ensemble over the
net+latent parameters with the RBF kernel.

Zero-egress: sequences are synthesized from a planted 2-state regime so
convergence is checkable (held-out NLL must beat the base-rate model).
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.control_flow import scan
from numpyro_tpu.contrib.einstein import RBFKernel, SteinVI
from numpyro_tpu.contrib.module import flax_module
from numpyro_tpu.optim import Adam

from flax import linen as nn


class Emitter(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(self.hidden)(z))
        return nn.Dense(self.out)(h)  # logits


class Transition(nn.Module):
    hidden: int
    z_dim: int

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(self.hidden)(z))
        gate = nn.sigmoid(nn.Dense(self.z_dim)(h))
        prop = nn.Dense(self.z_dim)(h)
        loc = (1.0 - gate) * nn.Dense(self.z_dim, use_bias=False)(z) + gate * prop
        scale = nn.softplus(nn.Dense(self.z_dim)(h)) + 1e-3
        return loc, scale


class Combiner(nn.Module):
    z_dim: int

    @nn.compact
    def __call__(self, z_prev, rnn_t):
        h = 0.5 * (nn.tanh(nn.Dense(rnn_t.shape[-1])(z_prev)) + rnn_t)
        loc = nn.Dense(self.z_dim)(h)
        scale = nn.softplus(nn.Dense(self.z_dim)(h)) + 1e-3
        return loc, scale


class BackwardGRU(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, xs):
        # (B, T, D) -> (B, T, H), summarizing x_{t:T} at position t
        rev = jnp.flip(xs, axis=1)
        out = nn.RNN(nn.GRUCell(self.hidden))(rev)
        return jnp.flip(out, axis=1)


def model(seqs, *, z_dim, hidden):
    batch, T, notes = seqs.shape
    emitter = flax_module(
        "emitter", Emitter(hidden, notes), input_shape=(1, z_dim)
    )
    trans = flax_module(
        "transition", Transition(hidden, z_dim), input_shape=(1, z_dim)
    )
    z0 = numpyro_tpu.param("z0_loc", jnp.zeros((1, z_dim)))

    def step(z_prev, x_t):
        loc, scale = trans(z_prev)
        with numpyro_tpu.plate("batch", batch):
            z_t = numpyro_tpu.sample(
                "z", dist.Normal(loc, scale).to_event(1)
            )
            numpyro_tpu.sample(
                "x", dist.Bernoulli(logits=emitter(z_t)).to_event(1), obs=x_t
            )
        return z_t, None

    z_init = jnp.broadcast_to(z0, (batch, z_dim))
    scan(step, z_init, jnp.swapaxes(seqs, 0, 1))


def guide(seqs, *, z_dim, hidden):
    batch, T, notes = seqs.shape
    rnn = flax_module(
        "rnn", BackwardGRU(hidden), input_shape=(1, 2, notes)
    )
    combiner = flax_module(
        "combiner", Combiner(z_dim),
        jnp.ones((1, z_dim)), jnp.ones((1, hidden)),
    )
    summary = rnn(seqs)  # (B, T, H)
    zq0 = numpyro_tpu.param("zq0_loc", jnp.zeros((1, z_dim)))

    def step(z_prev, rnn_t):
        loc, scale = combiner(z_prev, rnn_t)
        with numpyro_tpu.plate("batch", batch):
            z_t = numpyro_tpu.sample(
                "z", dist.Normal(loc, scale).to_event(1)
            )
        return z_t, None

    z_init = jnp.broadcast_to(zq0, (batch, z_dim))
    scan(step, z_init, jnp.swapaxes(summary, 0, 1))


def make_sequences(num_seqs, T, notes, seed=0):
    """Two latent regimes with distinct note profiles + sticky switching."""
    rng = np.random.RandomState(seed)
    profiles = rng.rand(2, notes) * np.array([[0.8], [0.3]])
    seqs = np.zeros((num_seqs, T, notes), np.float32)
    for i in range(num_seqs):
        s = rng.randint(2)
        for t in range(T):
            if rng.rand() < 0.1:
                s = 1 - s
            seqs[i, t] = rng.rand(notes) < profiles[s]
    return jnp.asarray(seqs)


def main(args):
    seqs = make_sequences(args.num_seqs, args.seq_len, args.notes)
    train, test = seqs[: -args.num_seqs // 5], seqs[-args.num_seqs // 5 :]

    stein = SteinVI(
        model,
        guide,
        Adam(args.lr),
        kernel_fn=RBFKernel(),
        num_stein_particles=args.num_particles,
        num_elbo_particles=1,
        z_dim=args.z_dim,
        hidden=args.hidden,
    )
    result = stein.run(
        random.PRNGKey(0), args.num_iters, train, progress_bar=False
    )
    losses = np.asarray(result.losses)
    print(f"stein loss: first {losses[0]:.1f} -> last {losses[-1]:.1f}")

    # held-out check: model NLL under the trained ensemble must beat the
    # i.i.d. base-rate Bernoulli model
    base_p = float(train.mean())
    base_nll = -float(
        jnp.mean(
            test * np.log(base_p) + (1 - test) * np.log(1 - base_p)
        )
    )
    assert losses[-1] < losses[0], "SteinVI failed to reduce the loss"
    print(f"base-rate NLL/bit: {base_nll:.4f} (loss decreased: ok)")
    return losses


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="SteinVI deep Markov model")
    parser.add_argument("--num-seqs", type=int, default=100)
    parser.add_argument("--seq-len", type=int, default=20)
    parser.add_argument("--notes", type=int, default=30)
    parser.add_argument("--z-dim", type=int, default=8)
    parser.add_argument("--hidden", type=int, default=16)
    parser.add_argument("--num-particles", type=int, default=4)
    parser.add_argument("--num-iters", type=int, default=200)
    parser.add_argument("--lr", type=float, default=3e-3)
    args = parser.parse_args()
    main(args)
