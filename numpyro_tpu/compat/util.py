"""Compat utilities (reference: numpyro/compat/util.py)."""


class UnsupportedAPIWarning(Warning):
    pass
