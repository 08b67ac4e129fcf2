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
        if self.hide_fn(msg):
            msg["stop"] = True


class collapse(trace):
    """Collapse conjugate sample sites into a compound site.

    Not yet implemented — use the explicit conjugate distributions
    (BetaBinomial, GammaPoisson, DirichletMultinomial) instead; the funsor
    dependency of the reference is deliberately replaced by direct
    conjugacy in this engine.
    """

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "collapse is not implemented yet; use explicit conjugate "
            "distributions (BetaBinomial, GammaPoisson) instead"
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
