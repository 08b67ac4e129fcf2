"""Effect handlers.

Fresh implementation of the handler suite of NumPyro (reference:
numpyro/handlers.py:118-1006): trace, replay, block, condition, do,
infer_config, lift, mask, reparam, scale, scope, seed, substitute.  Handlers
are trace-time-only Python; the compiled program sees only the resulting
jnp ops.
"""

from __future__ import annotations

import warnings
from collections import OrderedDict

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu.distributions as dist
from numpyro_tpu.distributions.distribution import COERCIONS
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
        assert not (
            msg["type"] in ("sample", "deterministic") and msg["name"] in self.trace
        ), f"all sites must have unique names but got `{msg['name']}` duplicated"
        self.trace[msg["name"]] = msg.copy()

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
        if msg["type"] == "control_flow":
            msg["kwargs"]["substitute_stack"].append(("replay", self.trace))
            return
        if msg["type"] in ("sample", "param") and msg["name"] in self.trace:
            name = msg["name"]
            guide_msg = self.trace[name]
            if msg["type"] == "sample":
                if guide_msg["type"] != "sample":
                    raise RuntimeError(f"site {name} must be sample in trace")
                # NB: intermediates belong to the guide's fn, not the model's
                msg["value"] = guide_msg["value"]
            else:
                if guide_msg["type"] != "param":
                    raise RuntimeError(f"site {name} must be param in trace")
                msg["value"] = guide_msg["value"]


class block(Messenger):
    """Hide selected sites from handlers above this one."""

    def __init__(self, fn=None, hide_fn=None, hide=None, expose_types=None, expose=None):
        if hide_fn is not None:
            self.hide_fn = hide_fn
        elif hide is not None:
            self.hide_fn = lambda msg: msg.get("name") in hide
        elif expose_types is not None:
            self.hide_fn = lambda msg: msg.get("type") not in expose_types
        elif expose is not None:
            self.hide_fn = lambda msg: msg.get("name") not in expose
        else:
            self.hide_fn = lambda msg: True
        super().__init__(fn)

    def process_message(self, msg):
        # prng_key messages always propagate so hidden sites can still draw
        # keys from an outer seed (reference: handlers.py:313-328)
        if not self.hide_fn(msg) or msg["type"] == "prng_key":
            return
        msg["stop"] = True
        if (
            msg["type"] in ("sample", "plate", "control_flow")
            and msg.get("value") is None
            and msg.get("kwargs", {}).get("rng_key") is None
        ):
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
        import numpyro_tpu.distributions as dist

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
            return

        # likelihood site: does a distribution parameter match a placeholder?
        rewritten = self._rewrite(base)
        if rewritten is not None:
            msg["fn"] = rewritten

    def _rewrite(self, base):
        import numpyro_tpu.distributions as dist

        name = type(base).__name__
        if name in ("Bernoulli", "BernoulliProbs", "Binomial", "BinomialProbs"):
            rec = self._find_placeholder(getattr(base, "probs", None))
            if rec is None:
                return None
            self._check_prior(rec, "Beta")
            rec["used"] = True
            total = getattr(base, "total_count", 1)
            return dist.BetaBinomial(
                rec["fn"].concentration1, rec["fn"].concentration0, total
            )
        if name in ("Poisson",):
            rec = self._find_placeholder(base.rate)
            if rec is None:
                return None
            self._check_prior(rec, "Gamma")
            rec["used"] = True
            return dist.GammaPoisson(rec["fn"].concentration, rec["fn"].rate)
        if name in ("Multinomial", "MultinomialProbs", "Categorical", "CategoricalProbs"):
            rec = self._find_placeholder(getattr(base, "probs", None))
            if rec is None:
                return None
            self._check_prior(rec, "Dirichlet")
            rec["used"] = True
            conc = rec["fn"].concentration
            if name in ("Categorical", "CategoricalProbs"):
                return dist.Categorical(probs=conc / conc.sum(-1, keepdims=True))
            return dist.DirichletMultinomial(conc, base.total_count)
        if name == "Normal":
            rec = self._find_placeholder(base.loc)
            if rec is None:
                return None
            self._check_prior(rec, "Normal")
            rec["used"] = True
            prior = rec["fn"]
            return dist.Normal(
                prior.loc, jnp.sqrt(prior.scale**2 + base.scale**2)
            )
        return None

    @staticmethod
    def _check_prior(rec, expected):
        if type(rec["fn"]).__name__ != expected:
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


class condition(Messenger):
    """Fix the value of sample sites (they remain 'observed')."""

    def __init__(self, fn=None, data=None, condition_fn=None):
        self.condition_fn = condition_fn
        self.data = data
        if sum((x is not None for x in (data, condition_fn))) != 1:
            raise ValueError(
                "Only one of `data` or `condition_fn` should be provided."
            )
        super().__init__(fn)

    def process_message(self, msg):
        if (msg["type"] != "sample") or msg.get("_control_flow_done", False):
            if msg["type"] == "control_flow":
                if self.data is not None:
                    msg["kwargs"]["substitute_stack"].append(("condition", self.data))
                if self.condition_fn is not None:
                    msg["kwargs"]["substitute_stack"].append(
                        ("condition", self.condition_fn)
                    )
            return

        if self.data is not None:
            value = self.data.get(msg["name"])
        else:
            value = self.condition_fn(msg)

        if value is not None:
            msg["value"] = value
            msg["is_observed"] = True


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

    def process_message(self, msg):
        if msg["type"] != "param":
            return
        name = msg["name"]
        if isinstance(self.prior, dict):
            prior = self.prior.get(name)
        elif isinstance(self.prior, dist.Distribution):
            prior = self.prior
        else:
            prior = self.prior(name) if callable(self.prior) else None
        if prior is None:
            return
        if name in self._samples_cache:
            msg["value"] = self._samples_cache[name]["value"]
            msg["type"] = "sample"
            return
        msg["type"] = "sample"
        msg["fn"] = prior
        msg["intermediates"] = []
        msg["is_observed"] = False
        msg["infer"] = msg.get("infer", {})
        msg["kwargs"] = {"rng_key": None, "sample_shape": ()}
        msg["args"] = ()
        msg["value"] = None
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
            msg["mask"] = (
                self.mask
                if msg["mask"] is None
                else (self.mask & msg["mask"])
            )
            return
        if msg["type"] != "sample":
            return
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
        if isinstance(self.config, dict):
            reparam_ = self.config.get(msg["name"])
        else:
            reparam_ = self.config(msg)
        if reparam_ is None:
            return
        new_fn, value = reparam_(msg["name"], msg["fn"], msg["value"])

        if value is not None:
            if msg["value"] is None:
                msg["is_observed"] = True
            msg["value"] = value
        if new_fn is None:
            # the reparameterizer consumed the site entirely: it becomes a
            # deterministic record of the recomposed value
            msg["type"] = "deterministic"
            for key in list(msg.keys()):
                if key not in ("type", "name", "value", "cond_indep_stack"):
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
        msg["scale"] = (
            self.scale if msg.get("scale") is None else self.scale * msg["scale"]
        )


class scope(Messenger):
    """Prefix site names with ``prefix + divider``."""

    def __init__(self, fn=None, prefix="", divider="/", *, hide_types=None):
        self.prefix = prefix
        self.divider = divider
        self.hide_types = [] if hide_types is None else hide_types
        super().__init__(fn)

    def process_message(self, msg):
        if msg.get("name") and msg["type"] not in self.hide_types:
            if "cond_indep_stack" in msg:
                msg["cond_indep_stack"] = [
                    frame._replace(name=f"{self.prefix}{self.divider}{frame.name}")
                    for frame in msg["cond_indep_stack"]
                ]
            msg["name"] = f"{self.prefix}{self.divider}{msg['name']}"


class seed(Messenger):
    """Thread a PRNG key: split a fresh subkey per stochastic site — the
    threefry counter-based scheme that keeps draws identical across chain
    layouts (reference: handlers.py:752-847)."""

    def __init__(self, fn=None, rng_seed=None, hide_types=None):
        if isinstance(rng_seed, int) or (
            hasattr(rng_seed, "dtype")
            and not jax.dtypes.issubdtype(rng_seed.dtype, jax.dtypes.prng_key)
            and jnp.ndim(rng_seed) == 0
        ):
            rng_seed = random.PRNGKey(rng_seed)
        if not (
            hasattr(rng_seed, "dtype")
            and (
                jax.dtypes.issubdtype(rng_seed.dtype, jax.dtypes.prng_key)
                or (rng_seed.shape == (2,) and rng_seed.dtype == jnp.uint32)
            )
        ):
            raise TypeError(
                "Incorrect type for rng_seed: expected int or PRNG key, got "
                f"{type(rng_seed)}"
            )
        self.rng_key = rng_seed
        self.hide_types = [] if hide_types is None else hide_types
        super().__init__(fn)

    def process_message(self, msg):
        if msg["type"] in self.hide_types:
            return
        if (
            msg["type"] == "sample"
            and not msg["is_observed"]
            and msg["kwargs"]["rng_key"] is None
        ) or msg["type"] in ("prng_key", "plate", "control_flow"):
            if msg["value"] is not None:
                # no need to create a new key when value is available
                return
            self.rng_key, rng_key_sample = random.split(self.rng_key)
            msg["kwargs"]["rng_key"] = rng_key_sample


class substitute(Messenger):
    """Fix latent values (sites stay latent, unlike ``condition``)."""

    def __init__(self, fn=None, data=None, substitute_fn=None):
        self.substitute_fn = substitute_fn
        self.data = data
        if sum((x is not None for x in (data, substitute_fn))) != 1:
            raise ValueError(
                "Only one of `data` or `substitute_fn` should be provided."
            )
        super().__init__(fn)

    def process_message(self, msg):
        if (msg["type"] not in ("sample", "param", "mutable", "plate")) or msg.get(
            "_control_flow_done", False
        ):
            if msg["type"] == "control_flow":
                if self.data is not None:
                    msg["kwargs"]["substitute_stack"].append(("substitute", self.data))
                if self.substitute_fn is not None:
                    msg["kwargs"]["substitute_stack"].append(
                        ("substitute", self.substitute_fn)
                    )
            return

        if self.data is not None:
            value = self.data.get(msg["name"])
        else:
            value = self.substitute_fn(msg)

        if value is not None:
            msg["value"] = value
            if msg["type"] == "plate":
                # pre-specified subsample indices
                msg["args"] = (msg["args"][0], value.shape[0])


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
        if (
            msg.get("_intervener_id", None) != self._intervener_id
            and self.data.get(msg["name"]) is not None
        ):
            if msg.get("_intervener_id", None) is not None:
                warnings.warn(
                    "Attempting to intervene on variable {} multiple times,"
                    "this is almost certainly incorrect behavior".format(msg["name"]),
                    RuntimeWarning,
                    stacklevel=find_stack_level(),
                )
            msg["_intervener_id"] = self._intervener_id

            # split node, avoid reapplying self recursively to new node
            new_msg = msg.copy()
            new_msg["cond_indep_stack"] = list(new_msg["cond_indep_stack"])
            apply_stack(new_msg)

            # apply intervention
            intervention = self.data[msg["name"]]
            msg["name"] = msg["name"] + "__CF"  # mangle old name
            msg["value"] = intervention
            msg["is_observed"] = True
            msg["stop"] = True
