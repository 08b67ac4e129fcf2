"""Effect handlers.

Implementation of the handler suite of NumPyro (reference:
numpyro/handlers.py:118-1006): trace, replay, block, condition, do,
infer_config, lift, mask, reparam, scale, scope, seed, substitute.  Handlers
are trace-time-only Python; the compiled program sees only the resulting
jnp ops.

Organisation: ``condition`` and ``substitute`` share one value-binding base
(they differ only in which site types they touch and whether the bound site
counts as observed); selector construction for ``block`` lives in a factory.
"""

from __future__ import annotations

import warnings
from collections import OrderedDict

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu.distributions as dist
from numpyro_tpu.primitives import (
    Messenger,
    _PYRO_STACK,
    apply_stack,
    plate,
)
from numpyro_tpu.util import find_stack_level, not_jax_tracer

__all__ = [
    "block",
    "collapse",
    "condition",
    "do",
    "infer_config",
    "lift",
    "mask",
    "reparam",
    "replay",
    "scale",
    "scope",
    "seed",
    "substitute",
    "trace",
]


class trace(Messenger):
    """Record every site into an OrderedDict keyed by name."""

    def __enter__(self):
        super().__enter__()
        self.trace = OrderedDict()
        return self.trace

    def postprocess_message(self, msg):
        if msg["type"] == "inspect" or msg.get("name") is None:
            return
        name = msg["name"]
        if msg["type"] in ("sample", "deterministic") and name in self.trace:
            raise AssertionError(
                f"all sites must have unique names but got `{name}` duplicated"
            )
        self.trace[name] = msg.copy()

    def get_trace(self, *args, **kwargs):
        self(*args, **kwargs)
        return self.trace


class replay(Messenger):
    """Replay values from a recorded trace at matching sample/param sites."""

    def __init__(self, fn=None, trace=None):
        assert trace is not None
        self.trace = trace
        super().__init__(fn)

    def process_message(self, msg):
        kind = msg["type"]
        if kind == "control_flow":
            msg["kwargs"]["substitute_stack"].append(("replay", self.trace))
            return
        if kind not in ("sample", "param"):
            return
        recorded = self.trace.get(msg["name"])
        if recorded is None:
            return
        if recorded["type"] != kind:
            raise RuntimeError(f"site {msg['name']} must be {kind} in trace")
        # NB: intermediates belong to the recorded fn, not the replayed one
        msg["value"] = recorded["value"]


def _site_selector(hide_fn, hide, expose_types, expose):
    """Build the predicate deciding which messages a `block` hides."""
    if hide_fn is not None:
        return hide_fn
    if hide is not None:
        return lambda msg: msg.get("name") in hide
    if expose_types is not None:
        return lambda msg: msg.get("type") not in expose_types
    if expose is not None:
        return lambda msg: msg.get("name") not in expose
    return lambda msg: True


class block(Messenger):
    """Hide selected sites from handlers above this one."""

    def __init__(self, fn=None, hide_fn=None, hide=None, expose_types=None, expose=None):
        self.hide_fn = _site_selector(hide_fn, hide, expose_types, expose)
        super().__init__(fn)

    def process_message(self, msg):
        # prng_key messages always propagate so hidden sites can still draw
        # keys from an outer seed (reference: handlers.py:313-328)
        if msg["type"] == "prng_key" or not self.hide_fn(msg):
            return
        msg["stop"] = True
        needs_key = (
            msg["type"] in ("sample", "plate", "control_flow")
            and msg.get("value") is None
            and msg.get("kwargs", {}).get("rng_key") is None
        )
        if needs_key:
            import numpyro_tpu

            msg["kwargs"]["rng_key"] = numpyro_tpu.prng_key()


class collapse(Messenger):
    """Analytically collapse conjugate prior/likelihood pairs
    (reference: handlers.py:331 — there funsor-lazy; here direct conjugacy
    rules, so the collapsed density is plain XLA with no extra dependency).

    The prior site inside the context is removed; it yields a lazy
    placeholder which must be consumed *unchanged* as the parameter of
    exactly one downstream likelihood site, which is rewritten to the
    compound marginal:

    - ``Beta`` + ``Bernoulli/Binomial(probs)`` → ``BetaBinomial``
    - ``Gamma`` + ``Poisson(rate)`` → ``GammaPoisson``
    - ``Dirichlet`` + ``Multinomial/Categorical(probs)`` →
      ``DirichletMultinomial``
    - ``Normal`` + ``Normal(loc)`` → marginal ``Normal``

    Each prior instance may serve one likelihood draw (elementwise batching
    is fine; sharing one prior across a plate of draws needs the joint
    compound — use the explicit conjugate distributions for that).
    """

    def __enter__(self):
        # id(placeholder) -> {"placeholder", "name", "fn", "used"}; the
        # record keeps the placeholder array itself alive so its id cannot
        # be recycled onto an unrelated array, and lookups verify identity
        # with `is` before matching
        self._lazy = {}
        return super().__enter__()

    def __exit__(self, exc_type, exc_value, tb):
        if exc_type is None:
            unused = [
                rec["name"] for rec in self._lazy.values() if not rec["used"]
            ]
            if unused:
                raise RuntimeError(
                    f"collapse: sites {unused} were collapsed but never "
                    "consumed by a downstream conjugate likelihood"
                )
        return super().__exit__(exc_type, exc_value, tb)

    _COLLAPSIBLE_PRIORS = ("Beta", "Gamma", "Dirichlet", "Normal")

    def _find_placeholder(self, value):
        rec = self._lazy.get(id(value))
        if rec is not None and rec["placeholder"] is value:
            return rec
        return None

    def process_message(self, msg):
        if msg["type"] != "sample":
            return
        fn = msg["fn"]
        base = fn
        # unwrap ExpandedDistribution/Independent for rule matching
        while isinstance(base, (dist.ExpandedDistribution, dist.Independent)):
            base = base.base_dist

        if not msg["is_observed"] and msg["value"] is None:
            if type(base).__name__ in self._COLLAPSIBLE_PRIORS:
                placeholder = jnp.full(fn.shape(), jnp.nan)
                self._lazy[id(placeholder)] = {
                    "placeholder": placeholder,
                    "name": msg["name"],
                    "fn": base,
                    "used": False,
                }
                msg["value"] = placeholder
                msg["stop"] = True
                msg["type"] = "collapsed"
            return

        # likelihood site: does a distribution parameter match a placeholder?
        rewritten = self._rewrite(base)
        if rewritten is not None:
            msg["fn"] = rewritten

    def _claim(self, rec, expected_prior):
        if type(rec["fn"]).__name__ != expected_prior:
            raise NotImplementedError(
                f"collapse: no conjugacy rule for prior "
                f"{type(rec['fn']).__name__} at site {rec['name']}"
            )
        if rec["used"]:
            raise NotImplementedError(
                f"collapse: site {rec['name']} consumed by more than one "
                "likelihood draw; a shared collapsed prior needs the joint "
                "compound — use BetaBinomial/GammaPoisson/"
                "DirichletMultinomial explicitly"
            )
        rec["used"] = True
        return rec["fn"]

    def _rewrite(self, base):
        kind = type(base).__name__
        if kind in ("Bernoulli", "BernoulliProbs", "Binomial", "BinomialProbs"):
            rec = self._find_placeholder(getattr(base, "probs", None))
            if rec is None:
                return None
            prior = self._claim(rec, "Beta")
            return dist.BetaBinomial(
                prior.concentration1,
                prior.concentration0,
                getattr(base, "total_count", 1),
            )
        if kind == "Poisson":
            rec = self._find_placeholder(base.rate)
            if rec is None:
                return None
            prior = self._claim(rec, "Gamma")
            return dist.GammaPoisson(prior.concentration, prior.rate)
        if kind in (
            "Multinomial", "MultinomialProbs", "Categorical", "CategoricalProbs",
        ):
            rec = self._find_placeholder(getattr(base, "probs", None))
            if rec is None:
                return None
            conc = self._claim(rec, "Dirichlet").concentration
            if kind in ("Categorical", "CategoricalProbs"):
                return dist.Categorical(probs=conc / conc.sum(-1, keepdims=True))
            return dist.DirichletMultinomial(conc, base.total_count)
        if kind == "Normal":
            rec = self._find_placeholder(base.loc)
            if rec is None:
                return None
            prior = self._claim(rec, "Normal")
            pooled_sd = jnp.sqrt(jnp.square(prior.scale) + jnp.square(base.scale))
            return dist.Normal(prior.loc, pooled_sd)
        return None


class _ValueBinder(Messenger):
    """Shared machinery of ``condition`` and ``substitute``: look up a value
    for a site (from a dict or a callable) and bind it, forwarding the
    lookup into control-flow bodies via the substitute stack."""

    # subclass knobs
    _tag = None  # name pushed onto control_flow substitute stacks
    _site_types = ()  # message types eligible for binding

    def __init__(self, fn=None, data=None, lookup_fn=None):
        if (data is None) == (lookup_fn is None):
            raise ValueError(self._both_error)
        self.data = data
        self._lookup_fn = lookup_fn
        super().__init__(fn)

    def _lookup(self, msg):
        if self.data is not None:
            return self.data.get(msg["name"])
        return self._lookup_fn(msg)

    def process_message(self, msg):
        eligible = msg["type"] in self._site_types and not msg.get(
            "_control_flow_done", False
        )
        if not eligible:
            if msg["type"] == "control_flow":
                source = self.data if self.data is not None else self._lookup_fn
                msg["kwargs"]["substitute_stack"].append((self._tag, source))
            return
        bound = self._lookup(msg)
        if bound is not None:
            self._bind(msg, bound)

    def _bind(self, msg, value):
        raise NotImplementedError


class condition(_ValueBinder):
    """Fix the value of sample sites (they become 'observed')."""

    _tag = "condition"
    _site_types = ("sample",)
    _both_error = "Only one of `data` or `condition_fn` should be provided."

    def __init__(self, fn=None, data=None, condition_fn=None):
        super().__init__(fn, data=data, lookup_fn=condition_fn)
        self.condition_fn = condition_fn

    def _bind(self, msg, value):
        msg["value"] = value
        msg["is_observed"] = True


class substitute(_ValueBinder):
    """Fix latent values (sites stay latent, unlike ``condition``)."""

    _tag = "substitute"
    _site_types = ("sample", "param", "mutable", "plate")
    _both_error = "Only one of `data` or `substitute_fn` should be provided."

    def __init__(self, fn=None, data=None, substitute_fn=None):
        super().__init__(fn, data=data, lookup_fn=substitute_fn)
        self.substitute_fn = substitute_fn

    def _bind(self, msg, value):
        msg["value"] = value
        if msg["type"] == "plate":
            # pre-specified subsample indices
            msg["args"] = (msg["args"][0], value.shape[0])


class infer_config(Messenger):
    """Update the ``infer`` dict of matching sites."""

    def __init__(self, fn=None, config_fn=None):
        super().__init__(fn)
        self.config_fn = config_fn

    def process_message(self, msg):
        if msg["type"] in ("sample", "param"):
            msg["infer"] = {**msg.get("infer", {}), **self.config_fn(msg)}


class lift(Messenger):
    """Lift param sites to sample sites with given priors."""

    def __init__(self, fn=None, prior=None):
        assert prior is not None
        self.prior = prior
        self._samples_cache = {}
        super().__init__(fn)

    def __enter__(self):
        self._samples_cache = {}
        return super().__enter__()

    def __exit__(self, *args, **kwargs):
        self._samples_cache = {}
        return super().__exit__(*args, **kwargs)

    def _prior_for(self, name):
        if isinstance(self.prior, dict):
            return self.prior.get(name)
        if isinstance(self.prior, dist.Distribution):
            return self.prior
        return self.prior(name) if callable(self.prior) else None

    def process_message(self, msg):
        if msg["type"] != "param":
            return
        name = msg["name"]
        prior = self._prior_for(name)
        if prior is None:
            return
        cached = self._samples_cache.get(name)
        msg.update(
            type="sample",
            fn=prior,
            intermediates=[],
            is_observed=False,
            infer=msg.get("infer", {}),
            kwargs={"rng_key": None, "sample_shape": ()},
            args=(),
            # repeated params share one draw per run (the cached msg dict is
            # mutated in place by apply_stack once the value is drawn)
            value=cached["value"] if cached is not None else None,
        )
        if cached is None:
            self._samples_cache[name] = msg


class mask(Messenger):
    """Multiply downstream sample-site masks with ``mask``."""

    def __init__(self, fn=None, mask=True):
        if jnp.result_type(mask) != "bool":
            raise ValueError("`mask` should be a bool array.")
        self.mask = mask
        super().__init__(fn)

    def process_message(self, msg):
        if msg["type"] == "inspect":
            prior_mask = msg["mask"]
            msg["mask"] = (
                self.mask if prior_mask is None else self.mask & prior_mask
            )
        elif msg["type"] == "sample":
            msg["fn"] = msg["fn"].mask(self.mask)


class reparam(Messenger):
    """Apply reparameterizers to matching sites (see infer/reparam.py)."""

    def __init__(self, fn=None, config=None):
        assert isinstance(config, dict) or callable(config)
        self.config = config
        super().__init__(fn)

    def process_message(self, msg):
        if msg["type"] != "sample":
            return
        chosen = (
            self.config.get(msg["name"])
            if isinstance(self.config, dict)
            else self.config(msg)
        )
        if chosen is None:
            return
        new_fn, value = chosen(msg["name"], msg["fn"], msg["value"])

        if value is not None:
            if msg["value"] is None:
                msg["is_observed"] = True
            msg["value"] = value
        if new_fn is None:
            # the reparameterizer consumed the site entirely: it becomes a
            # deterministic record of the recomposed value
            msg["type"] = "deterministic"
            keep = ("type", "name", "value", "cond_indep_stack")
            for key in [k for k in msg if k not in keep]:
                del msg[key]
        else:
            msg["fn"] = new_fn


class scale(Messenger):
    """Rescale downstream log-probs (likelihood tempering, subsampling)."""

    def __init__(self, fn=None, scale=1.0):
        if not_jax_tracer(scale):
            if jnp.any(jnp.less_equal(scale, 0)):
                raise ValueError("'scale' argument should be positive.")
        self.scale = scale
        super().__init__(fn)

    def process_message(self, msg):
        if msg["type"] not in ("param", "sample", "plate"):
            return
        existing = msg.get("scale")
        msg["scale"] = self.scale if existing is None else self.scale * existing


class scope(Messenger):
    """Prefix site names with ``prefix + divider``."""

    def __init__(self, fn=None, prefix="", divider="/", *, hide_types=None):
        self.prefix = prefix
        self.divider = divider
        self.hide_types = [] if hide_types is None else hide_types
        super().__init__(fn)

    def _rename(self, name):
        return f"{self.prefix}{self.divider}{name}"

    def process_message(self, msg):
        if not msg.get("name") or msg["type"] in self.hide_types:
            return
        if "cond_indep_stack" in msg:
            msg["cond_indep_stack"] = [
                frame._replace(name=self._rename(frame.name))
                for frame in msg["cond_indep_stack"]
            ]
        msg["name"] = self._rename(msg["name"])


def _as_prng_key(rng_seed):
    """Normalize an int (or scalar uint) seed to a PRNG key; reject others."""
    is_scalar_int = isinstance(rng_seed, int) or (
        hasattr(rng_seed, "dtype")
        and not jax.dtypes.issubdtype(rng_seed.dtype, jax.dtypes.prng_key)
        and jnp.ndim(rng_seed) == 0
    )
    if is_scalar_int:
        rng_seed = random.PRNGKey(rng_seed)
    is_key = hasattr(rng_seed, "dtype") and (
        jax.dtypes.issubdtype(rng_seed.dtype, jax.dtypes.prng_key)
        or (rng_seed.shape == (2,) and rng_seed.dtype == jnp.uint32)
    )
    if not is_key:
        raise TypeError(
            "Incorrect type for rng_seed: expected int or PRNG key, got "
            f"{type(rng_seed)}"
        )
    return rng_seed


class seed(Messenger):
    """Thread a PRNG key: split a fresh subkey per stochastic site — the
    threefry counter-based scheme that keeps draws identical across chain
    layouts (reference: handlers.py:752-847)."""

    def __init__(self, fn=None, rng_seed=None, hide_types=None):
        self.rng_key = _as_prng_key(rng_seed)
        self.hide_types = [] if hide_types is None else hide_types
        super().__init__(fn)

    def process_message(self, msg):
        if msg["type"] in self.hide_types:
            return
        latent_sample = (
            msg["type"] == "sample"
            and not msg["is_observed"]
            and msg["kwargs"]["rng_key"] is None
        )
        if latent_sample or msg["type"] in ("prng_key", "plate", "control_flow"):
            if msg["value"] is not None:
                # no need to create a new key when value is available
                return
            self.rng_key, site_key = random.split(self.rng_key)
            msg["kwargs"]["rng_key"] = site_key


class do(Messenger):
    """Causal intervention: replace the site with a Delta at the given value
    without recording it in the trace (reference: handlers.py:928-1006)."""

    def __init__(self, fn=None, data=None):
        self.data = data
        self._intervener_id = str(id(self))
        super().__init__(fn)

    def process_message(self, msg):
        if msg["type"] != "sample":
            return
        already_mine = msg.get("_intervener_id", None) == self._intervener_id
        if msg.get("_do_counterfactual", False):
            # counterfactual re-dispatches are never re-intervened: without
            # this guard two `do` handlers naming the same site ping-pong
            # counterfactual messages forever (the reference recurses
            # unboundedly here) — but a second intervener seeing another's
            # counterfactual is exactly the double-intervention case, so the
            # diagnostic still fires
            if not already_mine and self.data.get(msg["name"]) is not None:
                warnings.warn(
                    "Attempting to intervene on variable {} multiple times,"
                    " this is almost certainly incorrect behavior".format(
                        msg["name"]
                    ),
                    RuntimeWarning,
                    stacklevel=find_stack_level(),
                )
            return
        if already_mine or self.data.get(msg["name"]) is None:
            return
        msg["_intervener_id"] = self._intervener_id

        # split node, avoid reapplying self recursively to new node
        counterfactual = msg.copy()
        counterfactual["_do_counterfactual"] = True
        counterfactual["cond_indep_stack"] = list(
            counterfactual["cond_indep_stack"]
        )
        apply_stack(counterfactual)

        # apply intervention
        intervention = self.data[msg["name"]]
        msg["name"] = msg["name"] + "__CF"  # mangle old name
        msg["value"] = intervention
        msg["is_observed"] = True
        msg["stop"] = True
