"""Rule-based controller (RBC) baseline as a vectorized, jittable policy.

Re-expresses the reference RBC (solvers/RBC/rbc.py:6-29) — written there as a
Python loop over 8 chargers against a hardcoded observation layout — as a pure
``jnp`` function over any charger count and any config's observation layout:

per charger c (normalized departure d = departure/24, solar radiation r(t),
one-hour-ahead prediction r(t+1)):

- d == 0                → action 0 (no vehicle)
- 0 < d < 0.16667       → action 1 (≤ 4 h to departure: charge at full power)
- otherwise             → (r(t) + r(t+1)) / 2  (scenario 2 of the reference)

The reference indexes ``states[16+c]`` for departures and ``states[0]``/
``states[2]`` for radiation, valid only for its 8-charger PV-on battery-off
layout (SURVEY.md §2.2); here the offsets are derived from the config.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import NanogridConfig

DEPARTURE_SOON_THRESHOLD = 0.16667  # 4h/24 (reference solvers/RBC/rbc.py:14)


def rbc_policy(config: NanogridConfig, obs: jnp.ndarray) -> jnp.ndarray:
    """Compute RBC actions for a single observation vector (vmap for batches).

    Returns ``(num_actions,)`` actions; when a battery is present the battery
    action is 0 (the reference RBC predates the BESS and never controls it).
    """
    n = config.num_chargers
    head = (1 + int(config.pv_system)) * (1 + config.lookahead)
    soc_offset = head
    dep_offset = head + n

    departures = jnp.asarray(obs)[dep_offset : dep_offset + n]
    if config.pv_system:
        radiation_now = obs[0]
        radiation_next = obs[2]  # first radiation prediction (t+1)
        fallback = (radiation_now + radiation_next) / 2.0
    else:
        fallback = jnp.asarray(0.0, obs.dtype)

    charge_full = departures < DEPARTURE_SOON_THRESHOLD
    actions = jnp.where(
        departures == 0,
        0.0,
        jnp.where(charge_full, 1.0, fallback),
    ).astype(obs.dtype)

    if config.battery_system:
        actions = jnp.concatenate([actions, jnp.zeros((1,), obs.dtype)])
    return actions


def make_rbc_policy_fn(config: NanogridConfig):
    """Policy callable ``(obs, key) -> actions`` for rollout loops; obs may be
    batched with a leading env axis."""

    def policy(obs, key=None):
        if obs.ndim == 1:
            return rbc_policy(config, obs)
        import jax

        return jax.vmap(lambda o: rbc_policy(config, o))(obs)

    return policy
