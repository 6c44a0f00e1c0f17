"""Noise schedules for categorical diffusion.

Behavioural parity with the reference schedules
(`ddpm/models/diffusion_denoising.py:18-39`): linear betas over
`[start, end]`, and the Nichol-Dhariwal cosine schedule with the reference's
quirk that the `s` argument is overridden to 0.008 inside the function
(`diffusion_denoising.py:27`) and betas are clipped at 0.999.

Schedules are tiny host-side constants; they are computed in float64 NumPy
and stored as float32 device constants inside a `Schedule` pytree. The
`alphas_eff` / `cumalphas_prev` fields pre-bake the reference's t==1 boundary
overrides (`diffusion_denoising.py:93-94,112-113`: `alphas_t[t==0] = 0`,
`cumalphas_tm1[t==0] = 1`) so the hot path gathers instead of masking.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class Schedule(NamedTuple):
    """Diffusion schedule constants, all shape `[T]` float32.

    Indexing convention: position `i` holds the value for timestep `t = i+1`
    (timesteps are 1-based, `t in {1..T}`).
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    cumalphas: jnp.ndarray
    # alphas with the t==1 boundary override baked in: alphas_eff[0] == 0.
    alphas_eff: jnp.ndarray
    # cumalphas shifted one step back with cumalphas_prev[0] == 1, i.e. the
    # value of cumalpha_{t-1} used by the posterior at timestep t.
    cumalphas_prev: jnp.ndarray

    @property
    def time_steps(self) -> int:
        return self.betas.shape[0]


def _finalize(betas: np.ndarray, cumalphas: np.ndarray) -> Schedule:
    alphas = 1.0 - betas
    alphas_eff = alphas.copy()
    alphas_eff[0] = 0.0
    cumalphas_prev = np.concatenate([[1.0], cumalphas[:-1]])
    return Schedule(
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas=jnp.asarray(alphas, dtype=jnp.float32),
        cumalphas=jnp.asarray(cumalphas, dtype=jnp.float32),
        alphas_eff=jnp.asarray(alphas_eff, dtype=jnp.float32),
        cumalphas_prev=jnp.asarray(cumalphas_prev, dtype=jnp.float32),
    )


def linear_schedule(time_steps: int, start: float = 1e-2, end: float = 0.2) -> Schedule:
    """Linear beta schedule (`diffusion_denoising.py:18-22`)."""
    betas = np.linspace(start, end, time_steps, dtype=np.float64)
    alphas = 1.0 - betas
    cumalphas = np.cumprod(alphas)
    return _finalize(betas, cumalphas)


def cosine_schedule(time_steps: int, s: float = 8e-3) -> Schedule:
    """Cosine schedule (`diffusion_denoising.py:25-39`).

    Note: the reference ignores the `s` argument and hard-codes 0.008
    (`diffusion_denoising.py:27`); we reproduce that for parity.
    """
    del s
    s = 0.008
    t = np.arange(time_steps, dtype=np.float64)
    cumalphas = np.cos(((t / time_steps + s) / (1 + s)) * (math.pi / 2)) ** 2

    def f(u: float) -> float:
        return math.cos((u + s) / (1.0 + s) * math.pi / 2) ** 2

    betas = np.array(
        [
            min(1.0 - f((i + 1) / time_steps) / f(i / time_steps), 0.999)
            for i in range(time_steps)
        ],
        dtype=np.float64,
    )
    return _finalize(betas, cumalphas)


_SCHEDULES = {
    "linear": linear_schedule,
    "cosine": cosine_schedule,
}


def make_schedule(name: str, time_steps: int, params: Optional[dict] = None) -> Schedule:
    """Build a schedule by name, mirroring `DiffusionModel.__init__`
    (`diffusion_denoising.py:50-60`)."""
    try:
        fn = _SCHEDULES[name]
    except KeyError as e:
        raise ValueError(f"unknown beta schedule {name!r}; options: {sorted(_SCHEDULES)}") from e
    if params:
        return fn(time_steps, **params)
    return fn(time_steps)
