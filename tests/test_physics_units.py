"""Focused unit tests of the branch-free physics against hand-computed values
from the reference formulas (utils/charger.py, utils/battery_energy_storage_system.py,
utils/penaliser.py, utils/accountant.py)."""

import numpy as np
import jax.numpy as jnp

from smart_nanogrid_gym_tpu.core import physics


def _charger(actions, occupied, soc, cap, mask=None, dt=1.0):
    n = len(actions)
    return physics.charger_step(
        jnp.asarray(actions, jnp.float64),
        jnp.asarray(occupied, bool),
        jnp.asarray(soc, jnp.float64),
        jnp.asarray(cap, jnp.float64),
        jnp.asarray(mask if mask is not None else [1.0] * n, jnp.float64),
        jnp.asarray(22.0, jnp.float64),
        jnp.asarray(0.95, jnp.float64),
        jnp.asarray(100.0, jnp.float64),
        dt,
    )


def test_charger_charge_and_clamp():
    # action 1.0 on 40 kWh at soc 0.5: P = 20.9, dSoC = 0.5225 -> clamped at 1.0
    r = _charger([1.0], [True], [0.5], [40.0])
    assert np.isclose(float(r.power[0]), 20.9)
    assert float(r.soc_new[0]) == 1.0
    assert float(r.overcharging[0]) == 22.0  # calc 1.0225 > 1 -> flag * max_power
    # small action, no clamp
    r = _charger([0.1], [True], [0.5], [40.0])
    assert np.isclose(float(r.soc_new[0]), 0.5 + 2.09 / 40)
    assert float(r.overcharging[0]) == 0.0


def test_charger_discharge_full_drain_quirk():
    # ANY normal discharge (calc >= 0) reports the full drain -(soc*cap/dt)
    # while SoC follows the action (reference charger.py:122-132).
    r = _charger([-0.1], [True], [0.5], [40.0])
    assert np.isclose(float(r.power[0]), -(0.5 * 40.0) / 1.0)  # -20, not -2.09
    assert np.isclose(float(r.soc_new[0]), 0.5 - 2.09 / 40)
    assert float(r.over_discharging[0]) == 22.0
    # true over-discharge (calc < 0) keeps the raw power and clamps SoC to 0
    r = _charger([-1.0], [True], [0.1], [15.0])
    assert np.isclose(float(r.power[0]), -20.9)
    assert float(r.soc_new[0]) == 0.0
    assert float(r.over_discharging[0]) == 0.0  # flag fires only when calc >= 0


def test_charger_empty_and_masked():
    r = _charger([0.5, 0.0, 0.5], [False, False, False], [0.0] * 3, [0.0] * 3,
                 mask=[1.0, 1.0, 0.0])
    # acting on an empty real charger -> 100 marker; idle or masked -> 0
    assert list(np.asarray(r.nonexistent)) == [100.0, 0.0, 0.0]
    assert list(np.asarray(r.power)) == [0.0, 0.0, 0.0]


def test_battery_charge_offsets_demand_even_when_full():
    # overcharge: P still offsets demand, soc clamps (bess.py:46-72)
    r = physics.battery_step(
        jnp.asarray(1.0), jnp.asarray(10.0), jnp.asarray(0.99),
        jnp.asarray(80.0), jnp.asarray(44.0), jnp.asarray(0.95), 1.0,
    )
    assert np.isclose(float(r.power_used), 41.8)
    assert float(r.soc_new) == 1.0
    assert np.isclose(float(r.remaining_demand), 51.8)
    assert float(r.overcharging) == 44.0


def test_battery_discharge_clamps_to_available():
    # over-discharge clamps power to soc*cap/dt (bess.py:86-94)
    r = physics.battery_step(
        jnp.asarray(-1.0), jnp.asarray(50.0), jnp.asarray(0.2),
        jnp.asarray(80.0), jnp.asarray(44.0), jnp.asarray(0.95), 1.0,
    )
    # calc = 0.2 - 41.8/80 < 0 -> power = -(0.2*80) = -16
    assert np.isclose(float(r.power_used), -16.0)
    assert float(r.soc_new) == 0.0
    assert np.isclose(float(r.remaining_demand), 34.0)
    assert float(r.over_discharging) == 44.0
    # calculated power keeps the raw value (telemetry)
    assert np.isclose(float(r.power_calculated), -41.8)


def test_insufficiency_penalty_margins():
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    soc = jnp.asarray([0.5, 0.96, 1.0, 0.1])
    req = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    pen = physics.vehicle_insufficiency_penalty(
        mask, soc, req, jnp.asarray(0.05), jnp.asarray(10.0)
    )
    # charger0: 0.5 < 0.95 -> ((0.5)*10)^2 = 25; charger1 within margin; charger2 at
    # target; charger3 masked out
    assert np.isclose(float(pen), 25.0)


def test_dod_penalty_and_grid_cost():
    pen = physics.battery_dod_penalty(jnp.asarray(0.10), jnp.asarray(0.15), jnp.asarray(10.0))
    assert np.isclose(float(pen), 0.25)
    assert float(physics.battery_dod_penalty(jnp.asarray(0.15), jnp.asarray(0.15), jnp.asarray(10.0))) == 0.0
    # selling is priced at 0.8x (accountant.py:26-32)
    buy = physics.grid_energy_cost(jnp.asarray(10.0), jnp.asarray(0.1), jnp.asarray(0.8))
    sell = physics.grid_energy_cost(jnp.asarray(-10.0), jnp.asarray(0.1), jnp.asarray(0.8))
    assert np.isclose(float(buy), 1.0)
    assert np.isclose(float(sell), -0.8)
