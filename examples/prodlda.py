"""ProdLDA topic modeling (Srivastava & Sutton, "Autoencoding Variational
Inference for Topic Models", 2017; role parity: reference examples/prodlda.py).

Documents are bags of words; topic proportions get a logistic-normal
(softmax-Gaussian) posterior amortized by an encoder net, and the decoder is
a single topics-x-vocab matrix whose softmax mixes *in natural-parameter
space* (the "product of experts" that gives ProdLDA its name).

Zero-egress: the corpus is synthesized from a planted topic-word matrix, so
recovered topics can be checked against ground truth (cosine matching).
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.module import flax_module
from numpyro_tpu.infer import SVI, TraceMeanField_ELBO
from numpyro_tpu.optim import Adam

from flax import linen as nn


class Encoder(nn.Module):
    num_topics: int
    hidden: int
    dropout_rate: float

    @nn.compact
    def __call__(self, docs, is_training):
        h = nn.softplus(nn.Dense(self.hidden)(docs))
        h = nn.softplus(nn.Dense(self.hidden)(h))
        h = nn.Dropout(self.dropout_rate, deterministic=not is_training)(h)
        loc = nn.Dense(self.num_topics)(h)
        log_scale = nn.Dense(self.num_topics)(h)
        # batch-norm-free variant: bound the scale for stability
        return loc, jnp.exp(jnp.clip(log_scale, -4.0, 4.0))


class Decoder(nn.Module):
    vocab_size: int
    dropout_rate: float

    @nn.compact
    def __call__(self, theta, is_training):
        theta = nn.Dropout(self.dropout_rate, deterministic=not is_training)(theta)
        # product of experts: mix topic-word *logits*, then softmax
        return nn.softmax(nn.Dense(self.vocab_size, use_bias=False)(theta))


def model(docs, *, num_topics, hidden, dropout_rate, total_count, is_training=False):
    batch, vocab = docs.shape
    decoder = flax_module(
        "decoder",
        Decoder(vocab, dropout_rate),
        jnp.ones((1, num_topics)),
        False,
        apply_rng=["dropout"] if is_training else None,
    )
    with numpyro_tpu.plate("documents", batch):
        log_theta = numpyro_tpu.sample(
            "log_theta",
            dist.Normal(jnp.zeros(num_topics), 1.0).to_event(1),
        )
        theta = jax.nn.softmax(log_theta, axis=-1)
        if is_training:
            probs = decoder(theta, True, rngs={"dropout": numpyro_tpu.prng_key()})
        else:
            probs = decoder(theta, False)
        probs = jnp.clip(probs, 1e-7, 1.0)
        numpyro_tpu.sample(
            "obs", dist.Multinomial(total_count=total_count, probs=probs),
            obs=docs,
        )


def guide(docs, *, num_topics, hidden, dropout_rate, total_count, is_training=False):
    encoder = flax_module(
        "encoder",
        Encoder(num_topics, hidden, dropout_rate),
        jnp.ones((1, docs.shape[1])),
        False,
        apply_rng=["dropout"] if is_training else None,
    )
    with numpyro_tpu.plate("documents", docs.shape[0]):
        if is_training:
            loc, scale = encoder(docs, True, rngs={"dropout": numpyro_tpu.prng_key()})
        else:
            loc, scale = encoder(docs, False)
        numpyro_tpu.sample("log_theta", dist.Normal(loc, scale).to_event(1))


def make_corpus(num_docs, vocab, num_topics, doc_len, seed=0):
    rng = np.random.RandomState(seed)
    # planted topics: disjoint-ish blocks of preferred words
    beta = rng.dirichlet(np.full(vocab, 0.1), size=num_topics)
    block = vocab // num_topics
    for k in range(num_topics):
        beta[k, k * block : (k + 1) * block] += 2.0 / block
    beta /= beta.sum(-1, keepdims=True)
    theta = rng.dirichlet(np.full(num_topics, 0.5), size=num_docs)
    docs = np.stack(
        [rng.multinomial(doc_len, theta[i] @ beta) for i in range(num_docs)]
    )
    return jnp.asarray(docs, jnp.float32), beta


def topic_word_matrix(params, vocab, num_topics):
    w = params["decoder$params"]["Dense_0"]["kernel"]  # (topics, vocab)
    return jax.nn.softmax(jnp.asarray(w), axis=-1)


def main(args):
    docs, beta_true = make_corpus(
        args.num_docs, args.vocab, args.num_topics, args.doc_len
    )
    svi = SVI(
        model, guide, Adam(1e-2), TraceMeanField_ELBO(),
        num_topics=args.num_topics, hidden=args.hidden,
        dropout_rate=args.dropout, total_count=args.doc_len,
    )
    result = svi.run(
        random.PRNGKey(0), args.num_iters, docs, is_training=True,
        progress_bar=False,
    )
    print(f"final ELBO loss: {float(result.losses[-1]):.1f}")

    beta_hat = np.asarray(
        topic_word_matrix(result.params, args.vocab, args.num_topics)
    )
    # greedy cosine matching of learned topics to planted topics
    sims = (beta_hat / np.linalg.norm(beta_hat, axis=-1, keepdims=True)) @ (
        beta_true / np.linalg.norm(beta_true, axis=-1, keepdims=True)
    ).T
    best = sims.max(-1)
    print("per-topic best cosine match:", np.round(best, 3).tolist())
    for k in range(args.num_topics):
        top = np.argsort(beta_hat[k])[::-1][:8]
        print(f"  topic {k}: words {top.tolist()}")
    return best


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="ProdLDA topic model")
    parser.add_argument("--num-docs", type=int, default=500)
    parser.add_argument("--vocab", type=int, default=100)
    parser.add_argument("--num-topics", type=int, default=5)
    parser.add_argument("--doc-len", type=int, default=80)
    parser.add_argument("--hidden", type=int, default=100)
    parser.add_argument("--dropout", type=float, default=0.2)
    parser.add_argument("--num-iters", type=int, default=2000)
    args = parser.parse_args()
    main(args)
