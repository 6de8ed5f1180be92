"""Trace-time guard for constants baked into the Pallas fast paths.

The XLA engine reads every physics constant from :class:`..core.params.
NanogridParams` (so heterogeneous batches can vary them under vmap), but the
Pallas kernels bake the reference defaults (charger.py:20-23,
central_management_system.py:35, penaliser.py:7,79,177-181, accountant.py:6,35,
charging_station.py:214,257-269) as compile-time scalars — that is what makes
them fast.  Without a check, a user who varies ``batt_capacity`` (or any other
param) would get silently wrong results from ``bench.py`` /
``evaluate_policy_at_scale``.  Every Pallas entry point therefore calls
:func:`check_baked_params` first: it fails loudly at trace time when any param
differs from the kernel's baked value, pointing the user at the XLA engine
(which supports arbitrary params).
"""

from __future__ import annotations

import jax
import numpy as np

from ..core.config import NanogridConfig
from ..core.params import NanogridParams

# field name -> value every Pallas kernel bakes (reference defaults)
PHYSICS_CONSTANTS = {
    "charger_max_power": 22.0,
    "charger_efficiency": 0.95,
    "charger_mask": 1.0,  # kernels assume every charger is active
    "soc_margin_ratio": 0.05,
    "penalty_gain": 10.0,
    "w_battery_penalty": 0.8,
    "w_vehicle_penalty": 1.0,
    "grid_cost_weight": 0.75,
    "sell_coefficient": 0.8,
}

BATTERY_CONSTANTS = {
    "batt_dod": 0.15,
    "batt_capacity": 80.0,
    "batt_max_power": 44.0,
    "batt_efficiency": 0.95,
}

GENERATION_CONSTANTS = {
    "arrival_threshold": 0.6,
    "soc_low": 0.1,
    "soc_span": 0.8,
    "cap_low": 15.0,
    "cap_span": 105.0,
    "default_capacity": 40.0,
}


def check_baked_params(
    config: NanogridConfig,
    params: NanogridParams,
    kernel: str,
    *,
    generation: bool = False,
    battery_init: bool = False,
) -> None:
    """Assert every param the ``kernel`` bakes matches its compile-time value.

    ``generation``: the kernel also bakes the schedule-generation constants.
    ``battery_init``: the kernel resets the BESS to the baked 0.5 every day
    (multiday kernels), so ``batt_init_soc`` must match too.

    Raises ``ValueError`` on any mismatch (including batched params where any
    env in the batch differs) and ``TypeError`` when params are traced values
    whose contents cannot be checked.
    """
    expected = dict(PHYSICS_CONSTANTS)
    if config.battery_system:
        expected.update(BATTERY_CONSTANTS)
        if battery_init:
            expected["batt_init_soc"] = 0.5
    if generation:
        expected.update(GENERATION_CONSTANTS)

    for name, want in expected.items():
        leaf = getattr(params, name)
        if isinstance(leaf, jax.core.Tracer):
            raise TypeError(
                f"{kernel}: params.{name} is a traced value — the Pallas fast "
                f"path bakes it as the compile-time constant {want} and needs "
                f"concrete params to verify the match (close over params or "
                f"mark them static); use the XLA engine for traced params"
            )
        vals = np.asarray(leaf)
        if not np.all(vals == want):
            got = np.unique(vals)
            raise ValueError(
                f"{kernel} bakes params.{name}={want} as a compile-time "
                f"constant but these params carry {got[:8].tolist()} — the "
                f"Pallas fast path only supports the reference defaults; use "
                f"the XLA engine (core.rollout / core.transition) for "
                f"non-default or heterogeneous params"
            )
