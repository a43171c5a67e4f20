"""Optical-property extraction (refractive index, absorption, extinction).

Vectorized equivalent of ``calculate_optical_properties``
(``/root/reference/src/math_tools.rs:665-701``), formulas documented in the
reference's JOSS paper (``paper/paper.md:81-95``):

    n(f)     = 1 + c * dphi / (omega * d)
    alpha(f) = -(2/d) * ln( ((n+1)^2 / (4 n)) * A_s / A_ref )
    kappa(f) = alpha * c / (4 pi f)

with the reference's numerical clamps: amplitudes >= 1e-12, n >= 1e-6.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C = 2.99792458e8  # speed of light, m/s (math_tools.rs:663)


@jax.jit
def calculate_optical_properties(
    sample_amplitude: jnp.ndarray,
    sample_phase: jnp.ndarray,
    reference_amplitude: jnp.ndarray,
    reference_phase: jnp.ndarray,
    frequencies: jnp.ndarray,
    sample_thickness,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-frequency-bin optical properties.

    ``frequencies`` in THz, ``sample_thickness`` in metres (traced scalar so
    the thickness slider never recompiles).
    """
    frequency_hz = frequencies * 1.0e12
    delta_phi = sample_phase - reference_phase
    omega = 2.0 * jnp.pi * frequency_hz
    n = 1.0 + C * delta_phi / (omega * sample_thickness)

    amp = jnp.maximum(sample_amplitude, 1e-12)
    amp_ref = jnp.maximum(reference_amplitude, 1e-12)
    n_safe = jnp.maximum(n, 1e-6)

    alpha = (
        -2.0
        / sample_thickness
        * jnp.log((n_safe + 1.0) ** 2 / (4.0 * n_safe) * amp / amp_ref)
    )
    kappa = alpha * C / (4.0 * jnp.pi * frequency_hz)
    return n, alpha, kappa
