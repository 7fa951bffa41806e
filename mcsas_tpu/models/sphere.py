# -*- coding: utf-8 -*-
"""Sphere and LMA dense-sphere (hard-sphere structure factor) models.

Reference math: src/mcsas/models/sphere.py:12-65 and
src/mcsas/models/lmadensesphere.py:13-102.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..ops.special import py_G_over_A, sphere_ff
from ..utils.units import ANGSTROM_SLD, Fraction, NM, NoUnit
from .base import ParamSpec, SASModel

_PI43 = 4.0 * math.pi / 3.0


def _sphere_volume(p):
    return _PI43 * p["radius"] ** 3


def _sphere_absvolume(p):
    return _sphere_volume(p) * p["sld"] ** 2


def _sphere_surface(p):
    return 4.0 * math.pi * p["radius"] * p["radius"]


def _sphere_formfactor(q, p):
    return sphere_ff(q * p["radius"])



Sphere = SASModel(
    name="Sphere",
    elementwise_q=True,
    doc="Rayleigh sphere form factor F = 3(sin qr − qr cos qr)/(qr)³",
    can_smear=True,
    params=(
        ParamSpec("radius", NM.to_si(10.0), NM, (0.0, float("inf")),
                  active_range=NM.to_si((1.0, 1000.0)), generator="uniform",
                  is_fit=True, display_name="Sphere radius"),
        ParamSpec("sld", ANGSTROM_SLD.to_si(1e-6), ANGSTROM_SLD,
                  (0.0, float("inf")),
                  display_name="scattering length density difference"),
    ),
    ff=_sphere_formfactor,
    volume=_sphere_volume,
    absvolume=_sphere_absvolume,
    surface=_sphere_surface,
    default_active=("radius",),
)


def _lma_formfactor(q, p, _ff=sphere_ff):
    """Sphere form factor with the LMA-PY hard-sphere structure factor
    folded in as FF·√S (reference: models/lmadensesphere.py:68-102)."""
    r, mu = p["radius"], p["volFrac"]
    mf = p["mf"]
    mf = jnp.where(mf == -1.0, (0.634 / mu) ** (1.0 / 3.0), mf)
    ff = _ff(q * r)
    alpha = (1.0 + 2.0 * mu) ** 2 / (1.0 - mu) ** 4
    beta = -6.0 * mu * (1.0 + mu / 2.0) ** 2 / (1.0 - mu) ** 4
    gamma = mu * alpha / 2.0
    A = 2.0 * q * (mf * r)
    g_over_a = py_G_over_A(A, alpha, beta, gamma)
    S = 1.0 / (1.0 + 24.0 * mu * g_over_a)
    return jnp.sqrt(jnp.maximum(ff * ff * S, 0.0))


LMADenseSphere = SASModel(
    name="LMADenseSphere",
    elementwise_q=True,
    doc="Sphere with local-monodisperse-approximation Percus-Yevick "
        "hard-sphere structure factor (Pedersen 1994 eqs. 15-17)",
    can_smear=True,
    params=(
        ParamSpec("radius", NM.to_si(1.0), NM, (0.0, float("inf")),
                  generator="uniform", is_fit=True,
                  display_name="Sphere radius"),
        ParamSpec("volFrac", Fraction("%").to_si(10.0), Fraction("%"),
                  (Fraction("%").to_si(0.001), Fraction("%").to_si(100.0)),
                  generator="uniform", is_fit=True,
                  display_name="Volume fraction of spheres"),
        ParamSpec("mf", -1.0, NoUnit, (-1.0, 1e6),
                  display_name="standoff multiplier (-1 = auto)"),
        ParamSpec("sld", ANGSTROM_SLD.to_si(1e-6), ANGSTROM_SLD,
                  (0.0, float("inf")),
                  display_name="scattering length density difference"),
    ),
    ff=_lma_formfactor,
    volume=_sphere_volume,
    absvolume=_sphere_absvolume,
    surface=_sphere_surface,
    default_active=("radius",),
)
