"""Pyro-flavoured inference constructors.

Pyro's classes take a wider (torch-specific) keyword surface than ours;
rather than hand-writing one shim per class (the reference approach,
``numpyro/compat/infer.py:13-177``), each shim here is generated from a
declarative spec: which pyro keywords map onto which native keywords, and
which are torch-only noise to swallow.
"""

import math

from numpyro_tpu.infer import elbo as _elbo
from numpyro_tpu.infer import hmc as _hmc
from numpyro_tpu.infer import mcmc as _mcmc
from numpyro_tpu.infer import svi as _svi

# pyro keyword -> native keyword (None: accepted and discarded)
_TORCH_ONLY = (
    "use_multinomial_sampling",
    "transforms",
    "max_plate_nesting",
    "jit_compile",
    "jit_options",
    "ignore_jit_warnings",
)


def _shim(native_cls, renames, swallow, defaults):
    """Build an ``__init__`` that renames/filters pyro kwargs then defers
    to ``native_cls``."""

    def __init__(self, *args, **kwargs):
        merged = dict(defaults)
        merged.update(kwargs)
        native = {}
        for key, val in merged.items():
            if key in swallow:
                continue
            native[renames.get(key, key)] = val
        native_cls.__init__(self, *args, **native)

    return __init__


class HMC(_hmc.HMC):
    __init__ = _shim(
        _hmc.HMC,
        renames={"full_mass": "dense_mass"},
        swallow=_TORCH_ONLY,
        defaults={"step_size": 1, "trajectory_length": 2 * math.pi},
    )


class NUTS(_hmc.NUTS):
    __init__ = _shim(
        _hmc.NUTS,
        renames={"full_mass": "dense_mass"},
        swallow=_TORCH_ONLY + ("trajectory_length",),
        defaults={"step_size": 1},
    )


class MCMC:
    """Pyro-shaped driver facade over :class:`numpyro_tpu.infer.MCMC`."""

    def __init__(self, kernel, num_samples, warmup_steps=None, **kwargs):
        self._initial_params = kwargs.pop("initial_params", None)
        progbar = not kwargs.pop("disable_progbar", False)
        self._mcmc = _mcmc.MCMC(
            kernel,
            num_warmup=num_samples if warmup_steps is None else warmup_steps,
            num_samples=num_samples,
            num_chains=kwargs.pop("num_chains", 1),
            progress_bar=progbar,
        )

    def run(self, rng_key, *args, **kwargs):
        kwargs.setdefault("init_params", self._initial_params)
        self._mcmc.run(rng_key, *args, **kwargs)

    def get_samples(self, num_samples=None, group_by_chain=False):
        if num_samples is not None:
            raise ValueError("subsetting draws is a torch-pyro feature")
        return self._mcmc.get_samples(group_by_chain=group_by_chain)

    def summary(self, prob=0.9):
        self._mcmc.print_summary(prob=prob)


class SVI(_svi.SVI):
    """Stateful (pyro-style) facade over the functional SVI: the state
    lives on the object and ``step`` threads it implicitly."""

    def __init__(self, model, guide, optim, loss, **_ignored):
        super().__init__(model=model, guide=guide, optim=optim, loss=loss)
        self.svi_state = None

    def step(self, *args, rng_key=None, **kwargs):
        if self.svi_state is None:
            if rng_key is None:
                raise ValueError("the first step() needs an rng_key")
            self.svi_state = self.init(rng_key, *args, **kwargs)
        self.svi_state, loss = self.update(self.svi_state, *args, **kwargs)
        return loss

    def evaluate_loss(self, *args, **kwargs):
        return self.evaluate(self.svi_state, *args, **kwargs)

    def get_params(self):
        return super().get_params(self.svi_state)


class Trace_ELBO(_elbo.Trace_ELBO):
    __init__ = _shim(
        _elbo.Trace_ELBO,
        renames={},
        swallow=_TORCH_ONLY
        + (
            "max_iarange_nesting",
            "vectorize_particles",
            "strict_enumeration_warning",
            "retain_graph",
            "tail_adaptive_beta",
        ),
        defaults={},
    )


# numpyro jit-compiles regardless; the Jit* distinction is torch-only
JitTrace_ELBO = Trace_ELBO
