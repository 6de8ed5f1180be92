"""Array-valued environment parameters (a vmappable pytree).

Everything the reference hardcodes as object attributes — tariff tables
(utils/accountant.py), solar traces (utils/pv_system_manager.py), EV charger
constants (utils/charger.py:20-23), BESS constants
(utils/central_management_system.py:35), penalty constants (utils/penaliser.py)
— becomes one ``NanogridParams`` pytree here.  Because these are *arrays*, a
heterogeneous batch of envs (BASELINE config 3: varied charger counts, battery
capacities, price/PV traces) is just a vmapped axis over ``NanogridParams``; the
step function never recompiles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import prices, solar
from .config import NanogridConfig


class NanogridParams(NamedTuple):
    """Per-env parameters.  All leaves are jnp arrays of a common dtype."""

    # -- pricing (reference utils/accountant.py) --
    price: jnp.ndarray        # (price_table_len,) duplicated-day energy price
    price_norm: jnp.ndarray   # price / price_max (accountant.py:42-46)
    # -- solar (reference utils/pv_system_manager.py) --
    rad_norm: jnp.ndarray     # (solar_table_len,) irradiance / max_radiation
    solar_power: jnp.ndarray  # (solar_table_len,) available produced power [kW]
    # -- EV chargers (reference utils/charger.py:20-23) --
    charger_max_power: jnp.ndarray  # 22 kW
    charger_efficiency: jnp.ndarray  # 0.95 (charging == discharging in reference)
    charger_mask: jnp.ndarray  # (N,) 1.0 for active chargers (heterogeneous batches)
    # -- BESS (reference utils/central_management_system.py:35) --
    batt_capacity: jnp.ndarray      # 80 kWh
    batt_init_soc: jnp.ndarray      # 0.5
    batt_max_power: jnp.ndarray     # 44 kW (charging == discharging)
    batt_efficiency: jnp.ndarray    # 0.95
    batt_dod: jnp.ndarray           # 0.15 depth of discharge
    # -- schedule generation (reference utils/charging_station.py:200-279) --
    arrival_threshold: jnp.ndarray  # P(arrival)=0.4: arrival iff u > 0.6
    soc_low: jnp.ndarray            # uniform(0.1, 0.9) arrival SoC
    soc_span: jnp.ndarray
    cap_low: jnp.ndarray            # randint(15, 120) battery capacity
    cap_span: jnp.ndarray
    default_capacity: jnp.ndarray   # 40 kWh when capacities are uniform
    # -- penalties / accounting (reference utils/penaliser.py, utils/accountant.py) --
    soc_margin_ratio: jnp.ndarray   # 0.05 (penaliser.py:7)
    penalty_gain: jnp.ndarray       # the ·10 inside ((Δ)·10)² (penaliser.py:79,106)
    w_battery_penalty: jnp.ndarray  # 0.8 (penaliser.py:181)
    w_vehicle_penalty: jnp.ndarray  # 1.0 (penaliser.py:181)
    grid_cost_weight: jnp.ndarray   # 0.75 (accountant.py:35)
    sell_coefficient: jnp.ndarray   # 0.8 (accountant.py:6)
    nonexistent_marker: jnp.ndarray  # 100 (charger.py:154)

    @property
    def dtype(self):
        return self.price.dtype


def make_params(
    config: NanogridConfig,
    dtype=jnp.float32,
    irradiance_path: str | None = None,
) -> NanogridParams:
    """Build default parameters matching the reference constants exactly."""
    price_table, price_max = prices.build_price_table(config.price_model, config.price_table_len)
    if config.pv_system:
        irr, solar_power, max_rad = solar.build_solar_tables(
            config.time_interval, config.steps_per_day, irradiance_path
        )
        rad_norm = irr / max_rad
    else:
        solar_power = np.zeros(config.solar_table_len, dtype=np.float64)
        rad_norm = np.zeros(config.solar_table_len, dtype=np.float64)

    def arr(x):
        return jnp.asarray(x, dtype=dtype)

    return NanogridParams(
        price=arr(price_table),
        price_norm=arr(price_table / price_max),
        rad_norm=arr(rad_norm),
        solar_power=arr(solar_power),
        charger_max_power=arr(22.0),
        charger_efficiency=arr(0.95),
        charger_mask=arr(np.ones(config.num_chargers)),
        batt_capacity=arr(80.0),
        batt_init_soc=arr(0.5),
        batt_max_power=arr(44.0),
        batt_efficiency=arr(0.95),
        batt_dod=arr(0.15),
        arrival_threshold=arr(0.6),
        soc_low=arr(0.1),
        soc_span=arr(0.8),
        cap_low=arr(15.0),
        cap_span=arr(105.0),
        default_capacity=arr(40.0),
        soc_margin_ratio=arr(0.05),
        penalty_gain=arr(10.0),
        w_battery_penalty=arr(0.8),
        w_vehicle_penalty=arr(1.0),
        grid_cost_weight=arr(prices.GRID_COST_WEIGHT),
        sell_coefficient=arr(prices.SELLING_PRICE_COEFFICIENT),
        nonexistent_marker=arr(100.0),
    )
